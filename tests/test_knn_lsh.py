"""knn_join auto path: the LSH branch must use size-aware geometry and
keep useful top-k recall vs the exact join on real embeddings."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphem_rapids_spark.embedding.knn import knn_join, knn_join_exact, knn_join_lsh

SF_DIR = "/root/testdata/sf0.001"


def _load(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id"), F.transform("embedding", lambda v: v.cast("double")).alias("vec")
    )
    queries = emb.limit(20).select(F.col("vec_id").alias("qid"), "vec")
    refs = emb.select(F.col("vec_id").alias("rid"), "vec")
    return queries, refs


def test_lsh_knn_recall_vs_exact(spark):
    q, r = _load(spark)
    exact = {
        (row.qid, row.rid)
        for row in knn_join_exact(q, r, k=5, exclude_self=True).collect()
    }
    approx = {
        (row.qid, row.rid)
        for row in knn_join_lsh(q, r, k=5, dim=64, exclude_self=True).collect()
    }
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.5, f"auto-geometry kNN-LSH recall {recall:.2f}"


def test_knn_join_auto_switches(spark, monkeypatch):
    from graphem_rapids_spark.embedding import knn as knn_mod

    q, r = _load(spark)
    monkeypatch.setattr(knn_mod, "EXACT_KNN_MAX_ROWS", 0)
    out = knn_join(q, r, k=3, dim=64, exclude_self=True)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    assert out.count() > 0
