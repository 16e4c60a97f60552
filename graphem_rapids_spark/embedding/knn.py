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

import numpy as np
import pandas as pd
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
    """One row per (id, band, signature). Hyperplanes are a fixed
    seeded gaussian matrix (numpy PRNG — deterministic and partition-
    independent); signatures come from ONE vectorized matmul per Arrow
    batch inside a Pandas UDF: V(batch×dim) @ W(dim×bands·planes) →
    sign bits → per-band integer signatures.

    (A previous revision unrolled the projection into a
    bands×planes×dim expression tree — 6 400+ nodes blew past codegen
    limits into interpreted eval and took minutes at 500 rows; the
    matmul is the hot loop BLAS was built for, and the only Python
    cost is one Arrow batch hop.)"""
    from pyspark.sql.types import ArrayType, IntegerType

    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_bands * n_planes))
    pow2 = (1 << np.arange(n_planes - 1, -1, -1)).astype(np.int64)

    @F.pandas_udf(ArrayType(IntegerType()))
    def band_sigs(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy())  # batch × dim (float64 upcast)
        bits = (V @ planes) >= 0.0  # batch × bands·planes
        sigs = (bits.reshape(len(V), n_bands, n_planes) * pow2).sum(axis=2)
        return pd.Series(list(sigs.astype(np.int32)))

    return (
        df.select(F.col(id_col), band_sigs(F.col(vec_col)).alias("_sigs"))
        .select(id_col, F.posexplode("_sigs"))
        .withColumnRenamed("pos", "band")
        .withColumnRenamed("col", "sig")
    )


def knn_join_lsh(
    queries: DataFrame,
    references: DataFrame,
    k: int,
    dim: int,
    query_id: str = "qid",
    ref_id: str = "rid",
    vec_col: str = "vec",
    n_bands: int | None = None,
    n_planes: int | None = None,
    seed: int = 0,
    exclude_self: bool = False,
    n_references: int | None = None,
) -> DataFrame:
    """Approximate kNN: hyperplane-LSH candidate generation + exact
    re-rank. May return fewer than k neighbors for out-of-bucket
    queries (the accepted ANN trade, reference ivf_* regimes).

    Geometry defaults to the size-aware planner (plan_lsh_geometry at
    a cos≈0.9 nearest-neighbor proxy): a fixed bands×planes grid that
    works at 10⁵ references makes 2^planes-row buckets explode at 10⁹
    — planes must grow with n to bound Σ bucket²."""
    if n_bands is None or n_planes is None:
        from graphem_rapids_spark.pipeline.similarity import plan_lsh_geometry

        n = n_references if n_references is not None else references.count()
        auto_bands, auto_planes = plan_lsh_geometry(n, 0.9)
        n_bands = n_bands or auto_bands
        n_planes = n_planes or auto_planes
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
        if n_references is None:
            n_references = references.count()
        method = "exact" if n_references <= EXACT_KNN_MAX_ROWS else "lsh"
    if method == "exact":
        kw.pop("n_bands", None), kw.pop("n_planes", None), kw.pop("seed", None)
        return knn_join_exact(queries, references, k, **kw)
    return knn_join_lsh(
        queries, references, k, dim=dim, n_references=n_references, **kw
    )
