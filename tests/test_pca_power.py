"""Distributed integer power-iteration PCA: direction agreement with
a numpy eigendecomposition of the same int8 lattice, plus invariants
(unit micro-norm, deterministic reruns). Cross-engine hash parity is
covered by tests/test_oracle_parity.py and the driver gate."""

import numpy as np

from graphem_rapids_spark.pipeline.similarity import pca_power_int8
from graphem_rapids_spark.queries import embedding_pca_power

SF = "/root/testdata/sf0.001"


def _numpy_reference(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    X = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    # same int8 grid as quantize_int8: per-vector amax/127 scale
    amax = np.abs(X).max(axis=1, keepdims=True)
    scale = np.where(amax > 0, amax / 127.0, 1.0)
    Q = np.round(X / scale)
    n = Q.shape[0]
    C = n * (Q.T @ Q) - np.outer(Q.sum(axis=0), Q.sum(axis=0))
    B = np.floor_divide(C.astype(np.int64), n)
    w, v = np.linalg.eigh(B)
    return B, w[-1], v[:, -1]


def test_pca_direction_matches_numpy(spark):
    rows = embedding_pca_power(spark, SF).collect()
    assert len(rows) == 64
    got = np.zeros(64)
    for r in rows:
        got[r["dim"]] = r["v_micro"] / 1e6
    lam = rows[0]["lam"]
    B, w_top, v_top = _numpy_reference(spark)
    cos = abs(got @ v_top) / (np.linalg.norm(got) * np.linalg.norm(v_top))
    assert cos > 0.99, f"direction cosine {cos}"
    assert abs(lam - w_top) / abs(w_top) < 0.02, (lam, w_top)


def test_pca_unit_micro_norm_and_deterministic(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    r1 = sorted(tuple(r) for r in pca_power_int8(emb).collect())
    r2 = sorted(tuple(r) for r in pca_power_int8(emb).collect())
    assert r1 == r2
    norm = sum(v * v for _, v, _ in r1) ** 0.5
    # re-quantized unit vector: micro-norm within rounding of 1e6
    assert abs(norm - 1e6) < 100, norm
