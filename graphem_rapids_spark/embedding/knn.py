"""kNN joins — reference E5/E6/E7
(``embedder_pytorch.py:426-593``, ``embedder_cuvs.py:255-430``).

Strategies, auto-selected by reference-set size exactly in the spirit
of the reference's brute_force / ivf_flat / ivf_pq ladder
(``embedder_cuvs.py:264-272``):

- **exact** (< EXACT_KNN_MAX_ROWS references): broadcast the (small)
  query side against the reference set, squared-euclidean distance in
  whole-stage codegen, per-query top-k via ``row_number`` window with
  deterministic (dist, ref_id) tie-break. The reference's chunking
  (``_compute_knn_chunked``) is Spark partitioning — free.
- **lsh** (larger): random-hyperplane bucket join — each vector is
  signed against ``n_planes`` hash-seeded hyperplanes per band;
  candidates = pairs sharing any band signature; exact re-rank on
  candidates. Recall is tunable via (n_bands, n_planes); candidates
  per band-bucket stay shuffle-local.

All distances are **squared euclidean** (reference metric,
``embedder_cuvs.py:283``: 'sqeuclidean').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from graphem_rapids_spark.session import EXACT_KNN_MAX_ROWS


def _sqdist(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def knn_join_exact(
    queries: DataFrame,
    references: DataFrame,
    k: int,
    query_id: str = "qid",
    ref_id: str = "rid",
    vec_col: str = "vec",
    exclude_self: bool = False,
    broadcast_queries: bool = True,
) -> DataFrame:
    """(query_id, ref_id, dist, rank) — rank 1..k per query by squared
    euclidean distance, ties broken by ref_id (deterministic, unlike
    the reference's unspecified topk tie order)."""
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    r = references.select(F.col(ref_id), F.col(vec_col).alias("_rv"))
    if broadcast_queries:
        q = F.broadcast(q)
    j = r.crossJoin(q)
    if exclude_self:
        j = j.filter(F.col(query_id) != F.col(ref_id))
    j = j.select(query_id, ref_id, _sqdist(F.col("_qv"), F.col("_rv")).alias("dist"))
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(ref_id).asc())
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _band_signatures(df: DataFrame, id_col: str, vec_col: str, dim: int,
                     n_bands: int, n_planes: int, seed: int) -> DataFrame:
    """One row per (id, band, signature). Hyperplane h for (band b,
    plane p, dim d) is a deterministic hash-derived pseudo-gaussian
    (sum of 4 hash-uniforms - 2, CLT-ish) — partition-independent."""
    out = df.select(F.col(id_col), F.col(vec_col).alias("_v"))
    sigs = []
    for b in range(n_bands):
        bits = []
        for p in range(n_planes):
            dot = F.lit(0.0)
            for d in range(dim):
                base = seed * 1_000_003 + b * 10_007 + p * 101 + d
                u = sum(
                    (
                        F.pmod(F.xxhash64(F.lit(base * 4 + i)), F.lit(1 << 20)).cast("double")
                        / F.lit(float(1 << 20))
                        for i in range(4)
                    ),
                    F.lit(0.0),
                ) - F.lit(2.0)
                dot = dot + F.col("_v").getItem(d) * u
            bits.append(F.when(dot >= 0, F.lit(1)).otherwise(F.lit(0)))
        sig = F.lit(0)
        for bit in bits:
            sig = sig * 2 + bit
        sigs.append(F.struct(F.lit(b).alias("band"), sig.alias("sig")))
    return out.select(
        id_col, F.explode(F.array(*sigs)).alias("bs")
    ).select(id_col, F.col("bs.band").alias("band"), F.col("bs.sig").alias("sig"))


def knn_join_lsh(
    queries: DataFrame,
    references: DataFrame,
    k: int,
    dim: int,
    query_id: str = "qid",
    ref_id: str = "rid",
    vec_col: str = "vec",
    n_bands: int = 8,
    n_planes: int = 12,
    seed: int = 0,
    exclude_self: bool = False,
) -> DataFrame:
    """Approximate kNN: hyperplane-LSH candidate generation + exact
    re-rank. May return fewer than k neighbors for out-of-bucket
    queries (the accepted ANN trade, reference ivf_* regimes)."""
    qs = _band_signatures(queries, query_id, vec_col, dim, n_bands, n_planes, seed)
    rs = _band_signatures(references, ref_id, vec_col, dim, n_bands, n_planes, seed)
    cand = (
        qs.join(rs, ["band", "sig"])
        .select(query_id, ref_id)
        .distinct()
    )
    if exclude_self:
        cand = cand.filter(F.col(query_id) != F.col(ref_id))
    q = queries.select(F.col(query_id), F.col(vec_col).alias("_qv"))
    r = references.select(F.col(ref_id), F.col(vec_col).alias("_rv"))
    j = (
        cand.join(q, query_id)
        .join(r, ref_id)
        .select(query_id, ref_id, _sqdist(F.col("_qv"), F.col("_rv")).alias("dist"))
    )
    w = Window.partitionBy(query_id).orderBy(F.col("dist").asc(), F.col(ref_id).asc())
    return j.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def knn_join(
    queries: DataFrame,
    references: DataFrame,
    k: int,
    dim: int,
    method: str = "auto",
    n_references: int | None = None,
    **kw,
) -> DataFrame:
    """Auto strategy switch by reference count (the E7 analog of the
    reference's index-type selection, ``embedder_cuvs.py:255-272``)."""
    if method == "auto":
        n = n_references if n_references is not None else references.count()
        method = "exact" if n <= EXACT_KNN_MAX_ROWS else "lsh"
    if method == "exact":
        kw.pop("n_bands", None), kw.pop("n_planes", None), kw.pop("seed", None)
        return knn_join_exact(queries, references, k, **kw)
    return knn_join_lsh(queries, references, k, dim=dim, **kw)
