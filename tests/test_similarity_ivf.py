"""IVF ANN quality: recall@k vs brute-force cosine on the embeddings
table — mirrors the reference's ANN-vs-exact consistency checks
(tests/test_cuvs_backend.py ethos; index regimes embedder_cuvs.py:255-272)."""

from pyspark.sql import functions as F

from graphem_rapids_spark.pipeline.similarity import cosine_topk, ivf_cosine_topk


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 10)
    exact = cosine_topk(emb, q, k=5)
    approx = ivf_cosine_topk(emb, q, k=5, n_cells=8, n_probe=4)
    e = {(r.qid, r.rid) for r in exact.collect()}
    a = {(r.qid, r.rid) for r in approx.collect()}
    assert len(e) == 50
    recall = len(e & a) / len(e)
    # probing half the cells must recover most true neighbors
    assert recall >= 0.6, f"recall={recall}"


def test_ivf_deterministic(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    r1 = sorted(tuple(r) for r in ivf_cosine_topk(emb, q, k=3, n_cells=8, n_probe=2).collect())
    r2 = sorted(tuple(r) for r in ivf_cosine_topk(emb, q, k=3, n_cells=8, n_probe=2).collect())
    assert r1 == r2
