"""Edge canonicalization, symmetrization, relabeling, degrees.

Reference semantics being reproduced:
- Upper-triangle canonical form ``src < dst`` for undirected edges
  (reference ``backends/embedder_pytorch.py:220-245``, mask at ``:239``).
- Symmetrize + binarize: ``A + A.T`` then 0/1
  (``embedder_pytorch.py:350-352``); dataset loaders mirror+dedupe
  directed edge files (``datasets.py:339-352``) — i.e. UNION ALL →
  DISTINCT in relational terms (SURVEY.md §2.6).
- Node relabel to contiguous ints (``datasets.py:148-166, 761-782``).
- Vertex degrees (``generators.py:52-64``).

Scale notes: every function here is a single shuffle (distinct or
groupBy) on the edge key — the minimal possible. ``relabel_contiguous``
builds the dense id map with the range-partitioned prefix-sum of
``scale.py`` (no single-partition row_number funnel — a ~1e9-row
vertex table stays distributed); the subsequent remap joins broadcast
when the map is small or shuffle-join on id otherwise (Catalyst/AQE
decides).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonicalize_edges(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Undirected canonical form: reorder each pair to (min,max), drop
    self-loops and duplicates. Output columns (src, dst), src < dst.

    Relational form of reference ``embedder_pytorch.py:220-245``.
    """
    lo = F.least(F.col(src), F.col(dst)).cast("long").alias("src")
    hi = F.greatest(F.col(src), F.col(dst)).cast("long").alias("dst")
    return (
        edges.select(lo, hi)
        .filter(F.col("src") < F.col("dst"))
        .distinct()
    )


def symmetrize_edges(edges: DataFrame) -> DataFrame:
    """Both directions of each canonical edge (A + A.T of the
    reference, ``embedder_pytorch.py:350-352``). Input must be
    canonical; output has 2·|E| rows."""
    return edges.select("src", "dst").unionAll(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def vertices_from_edges(edges: DataFrame) -> DataFrame:
    """Distinct endpoint ids (reference ``datasets.py:355-356``)."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionAll(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def relabel_contiguous(
    edges: DataFrame, canonical: bool = False
) -> tuple[DataFrame, DataFrame]:
    """Relabel vertex ids to dense 0..n-1 (order = ascending old id).

    Returns (relabeled_edges, mapping) where mapping is
    (old_id, new_id). Reference: networkx
    ``convert_node_labels_to_integers`` (``datasets.py:148-166``).
    """
    from graphem_rapids_spark.scale import global_dense_index

    verts = vertices_from_edges(edges)
    # Fast path: ids already contiguous (min..min+n-1, e.g. TPC-H part
    # keys 1..n) → the relabel is the affine shift id-min, which needs
    # ZERO joins (the general path pays a dense-index computation plus
    # two edge-sized remap joins). One tiny aggregate decides.
    stats = verts.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi"), F.count("*").alias("n")
    ).first()
    if stats["n"] > 0 and stats["hi"] - stats["lo"] + 1 == stats["n"]:
        lo = int(stats["lo"])
        mapping = verts.select(
            F.col("id").alias("old_id"), (F.col("id") - lo).alias("new_id")
        )
        out = edges.select(
            (F.col("src") - lo).alias("src"), (F.col("dst") - lo).alias("dst")
        )
        # the shift preserves canonical form — skip the re-canonical
        # distinct shuffle when the caller vouches for its input
        return (out if canonical else canonicalize_edges(out)), mapping
    mapping = global_dense_index(verts, "id", "new_id").withColumnRenamed(
        "id", "old_id"
    )
    # no forced broadcast: the mapping is O(n) vertices — at 10⁹ ids a
    # broadcast hint is an executor-memory scale-killer. AQE broadcasts
    # it automatically whenever it measures under the threshold.
    m = mapping
    out = (
        edges.join(m, edges.src == m.old_id)
        .select(F.col("new_id").alias("src"), "dst")
        .join(m, F.col("dst") == m.old_id)
        .select("src", F.col("new_id").alias("dst"))
    )
    return canonicalize_edges(out), mapping


def vertex_degrees(edges: DataFrame, vertices: DataFrame | None = None) -> DataFrame:
    """Per-vertex degree of a canonical undirected edge list.

    Reference ``generators.py:52-64`` (adjacency row-sum). Spark: one
    explode + one hash aggregate (map-side partial agg is automatic).
    When ``vertices`` is given, isolated vertices appear with degree 0.
    """
    deg = (
        edges.select(F.explode(F.array("src", "dst")).alias("id"))
        .groupBy("id")
        .agg(F.count("*").alias("degree"))
    )
    if vertices is not None:
        deg = (
            vertices.join(deg, "id", "left")
            .select("id", F.coalesce("degree", F.lit(0)).alias("degree"))
        )
    return deg
