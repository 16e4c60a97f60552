"""cosine_near_dup auto strategy: exact below EXACT_KNN_MAX_ROWS,
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
    monkeypatch.setattr(session, "EXACT_KNN_MAX_ROWS", 0)
    df = cosine_near_dup_join(emb, threshold=0.4, dim=64)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_auto_switch_exact_matches_direct(emb):
    auto = _pairs(cosine_near_dup_join(emb, threshold=0.4))
    direct = _pairs(cosine_near_dup_pairs(emb, threshold=0.4))
    assert auto == direct
