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


def test_ivfpq_deterministic_and_shaped(spark, sf_dir):
    from graphem_rapids_spark.pipeline.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    q = emb.filter(F.col("vec_id") < 5)
    r1 = sorted(tuple(r) for r in ivfpq_topk(emb, q, k=3).collect())
    r2 = sorted(tuple(r) for r in ivfpq_topk(emb, q, k=3).collect())
    assert r1 == r2
    assert len(r1) == 5 * 3
    by_q = {}
    for qid, rid, d2, rank in r1:
        assert qid != rid and d2 >= 0
        by_q.setdefault(qid, []).append((rank, d2))
    for ranks in by_q.values():
        ranks.sort()
        assert [r for r, _ in ranks] == [1, 2, 3]
        # distances non-decreasing with rank
        assert all(ranks[i][1] <= ranks[i + 1][1] for i in range(len(ranks) - 1))


def test_ivfpq_recall_vs_exact(spark, sf_dir):
    """ADC distance is approximate, but the PQ top-5 must overlap
    the exact Euclidean top-20 substantially (the quantized-residual
    code keeps ~8x compression while staying usable)."""
    from graphem_rapids_spark.pipeline.similarity import ivfpq_topk

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    q = emb.filter(F.col("vec_id") < 5)
    got = ivfpq_topk(emb, q, k=5, n_probe=8).collect()
    hits = total = 0
    for qid in range(5):
        qv = vecs[qid]
        d2 = {
            rid: sum((a - b) ** 2 for a, b in zip(qv, rv))
            for rid, rv in vecs.items()
            if rid != qid
        }
        exact20 = {r for r, _ in sorted(d2.items(), key=lambda kv: (kv[1], kv[0]))[:20]}
        pq5 = [r["rid"] for r in got if r["qid"] == qid]
        assert len(pq5) == 5
        hits += sum(1 for r in pq5 if r in exact20)
        total += 5
    assert hits / total >= 0.5, f"recall@(5 in exact-20) = {hits}/{total}"
