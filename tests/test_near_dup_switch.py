"""cosine_near_dup auto strategy: exact below EXACT_ALLPAIRS_MAX_ROWS,
banded-LSH candidates + exact verify above. The LSH path must (a) be
a subset of the exact pairs (verify step guarantees no false
positives), (b) reach high recall at the default band geometry, and
(c) never plan a crossJoin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark import session
from graphem_rapids_spark.pipeline.similarity import (
    cosine_near_dup_join,
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_lsh,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _pairs(df):
    return {(r.vec_a, r.vec_b) for r in df.collect()}


def test_lsh_near_dup_subset_and_recall(emb):
    exact = _pairs(cosine_near_dup_pairs(emb, threshold=0.4))
    approx = _pairs(
        cosine_near_dup_pairs_lsh(emb, threshold=0.4, dim=64, n_bands=20, n_planes=5)
    )
    assert approx <= exact  # exact verify ⇒ no false positives
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.8, f"LSH recall {recall:.2f} below floor"


def test_auto_switch_picks_lsh_above_threshold(emb, monkeypatch):
    monkeypatch.setattr(session, "EXACT_ALLPAIRS_MAX_ROWS", 0)
    df = cosine_near_dup_join(emb, threshold=0.4, dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_auto_switch_exact_matches_direct(emb):
    auto = _pairs(cosine_near_dup_join(emb, threshold=0.4))
    direct = _pairs(cosine_near_dup_pairs(emb, threshold=0.4))
    assert auto == direct


def test_plan_lsh_geometry_bounds():
    from graphem_rapids_spark.pipeline.similarity import plan_lsh_geometry

    # planes grow with n (bounded buckets), bands stay clamped
    for n, threshold in [(500, 0.4), (10**5, 0.9), (10**9, 0.95)]:
        bands, planes = plan_lsh_geometry(n, threshold)
        assert 8 <= bands <= 64 and 4 <= planes <= 24
    # bucket-size invariant: buckets per band ≈ n / 2^planes ≤ ~256
    _, planes9 = plan_lsh_geometry(10**9, 0.95)
    assert 10**9 / (1 << planes9) <= 256
    # more selective threshold → fewer bands needed at same n
    b_loose, _ = plan_lsh_geometry(10**6, 0.5)
    b_tight, _ = plan_lsh_geometry(10**6, 0.95)
    assert b_tight <= b_loose


def test_auto_geometry_recall(emb, monkeypatch):
    """Auto-planned geometry must hit the target recall on real data
    when the LSH path is forced."""
    monkeypatch.setattr(session, "EXACT_ALLPAIRS_MAX_ROWS", 0)
    exact = _pairs(cosine_near_dup_pairs(emb, threshold=0.4))
    approx = _pairs(cosine_near_dup_join(emb, threshold=0.4, dim=64))
    assert approx <= exact
    if exact:
        recall = len(approx & exact) / len(exact)
        assert recall >= 0.8, f"auto-geometry recall {recall:.2f}"
