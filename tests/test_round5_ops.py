"""Round-5 additions: quantile-histogram sketch, priority sampling,
EWMA burst detection, FastSS typo join, audio frame energy, join
advisor, keep-best survivor pick, label silhouette — structural
invariants on the shared test data (cross-engine hash parity for all
eight is covered by tests/test_oracle_parity.py and the driver gate)."""

from graphem_rapids_spark.queries import (
    _ADVISOR_SKEW_PCT,
    _AUDIO_FRAMES,
    _PRIO_K,
    dedup_cluster_keep_best,
    dedup_typo_fastss,
    embedding_label_silhouette,
    events_ewma_burst,
    join_strategy_advisor,
    multimodal_audio_energy,
    sample_priority_weighted,
    sketch_quantile_hist,
)

SF = "/root/testdata/sf0.001"


def test_quantile_hist_brackets_exact(spark):
    rows = {r["p"]: r for r in sketch_quantile_hist(spark, SF).collect()}
    assert set(rows) == {0.5, 0.9, 0.99}
    for p, r in rows.items():
        # a log2 bucket spans [2^b, 2^{b+1}) so the estimate can miss
        # by at most the bucket width: rel err < 1 by construction
        assert 0.0 <= r["rel_err"] < 1.0
        lo, hi = 2.0 ** r["bucket"], 2.0 ** (r["bucket"] + 1)
        assert lo <= r["exact_q"] <= hi  # exact lands in the hit bucket
        assert lo <= r["hist_q"] <= hi


def test_priority_sample_unbiased_estimator_shape(spark):
    out = sample_priority_weighted(spark, SF).collect()
    assert len(out) == _PRIO_K
    tau = out[0]["tau_cents"]
    est, true = out[0]["est_total_cents"], out[0]["true_total_cents"]
    for r in out:
        # every sampled priority strictly beats the (k+1)-th
        assert r["priority"] >= tau - 1  # floor'd priority vs ceil'd tau
        assert r["weight_cents"] > 0
    # DLT estimator concentrates: the k=64 sample estimates the total
    # of ~1.5k orders within a loose factor-2 band
    assert 0.5 * true < est < 2.0 * true


def test_ewma_burst_exceeds_baseline(spark):
    for r in events_ewma_burst(spark, SF).collect():
        # flagged minutes genuinely exceed 1.5x the decayed baseline
        assert r["c"] > 1.5 * r["ewma"]
        assert r["ewma"] > 0.0


def test_fastss_recovers_every_corruption(spark):
    rows = {r["d"]: r for r in dedup_typo_fastss(spark, SF).collect()}
    assert set(rows) <= {0, 1}
    # every dirty row must recover its own origin (recall 1 for d<=1
    # substitutions is the deletion-neighborhood pigeonhole guarantee)
    n_dirty = sum(r["n_dirty"] for r in rows.values())
    n_self = sum(r["n_self"] for r in rows.values())
    assert n_self >= n_dirty > 0


def test_audio_energy_bounds(spark):
    out = multimodal_audio_energy(spark, SF).collect()
    assert out and all(r["doc_id"] % 2 == 1 for r in out)
    for r in out:
        assert 0 <= r["peak_energy"] <= r["total_energy"]
        # peak is one of _AUDIO_FRAMES frames of the total
        assert r["total_energy"] <= _AUDIO_FRAMES * r["peak_energy"]
        assert 0 <= r["n_silent"] <= _AUDIO_FRAMES


def test_join_advisor_cardinalities(spark):
    rows = {r["join_name"]: r for r in join_strategy_advisor(spark, SF).collect()}
    assert len(rows) == 3
    lo = rows["lineitem_x_orders"]
    # orderkey is a foreign key: every lineitem joins exactly one order
    assert lo["est_output"] == lo["n_left"]
    for r in rows.values():
        assert r["advice"] in {"broadcast_right", "salt_hot_keys", "shuffle_hash"}
        assert 0.0 < r["skew_pct"] <= 100.0
        if r["advice"] == "salt_hot_keys":
            assert r["skew_pct"] > _ADVISOR_SKEW_PCT


def test_keep_best_picks_longest(spark):
    out = dedup_cluster_keep_best(spark, SF).collect()
    assert out
    for r in out:
        assert r["n_members"] >= 2  # only multi-member clusters listed
        assert r["keep_doc"] >= r["cluster_rep"]  # rep is the min id
        assert r["best_len"] > 0


def test_silhouette_range(spark):
    out = embedding_label_silhouette(spark, SF).collect()
    assert len(out) == 10
    for r in out:
        assert -1.0 <= r["mean_silhouette"] <= 1.0
        assert -1_000_000 <= r["min_s_scaled"] <= r["max_s_scaled"] <= 1_000_000
        assert r["n_members"] > 0


def test_prefix_jaccard_decile_bounds(spark):
    from graphem_rapids_spark.queries import dedup_prefix_jaccard

    out = dedup_prefix_jaccard(spark, SF).collect()
    assert out
    for r in out:
        assert 8 <= r["decile"] <= 10  # threshold 0.8 admits only these
        assert 0 < r["min_common"] <= r["max_common"]
        assert 0 < r["n_left_docs"] <= r["n_pairs"]


def test_rrf_fusion_rank_math(spark):
    from graphem_rapids_spark.queries import retrieval_rrf_fusion

    out = retrieval_rrf_fusion(spark, SF).collect()
    assert len(out) == 10
    for r in out:
        assert 0 <= r["bm_rank"] <= 10 and 0 <= r["emb_rank"] <= 10
        assert r["bm_rank"] > 0 or r["emb_rank"] > 0
        expect = (1.0 / (60 + r["bm_rank"]) if r["bm_rank"] else 0.0) + (
            1.0 / (60 + r["emb_rank"]) if r["emb_rank"] else 0.0
        )
        assert abs(r["rrf_score"] - expect) < 1e-6
    # docs ranked by BOTH lists must fuse above single-list docs of
    # equal best rank
    scores = [r["rrf_score"] for r in out]
    assert scores == sorted(scores, reverse=True)


def test_kmv_setops_estimates(spark):
    from graphem_rapids_spark.queries import sketch_kmv_setops

    r = sketch_kmv_setops(spark, SF).first()
    assert r["exact_inter"] <= r["exact_union"]
    # k=256 bottom-k over a few hundred users: estimates land well
    # inside a factor-2 band of truth
    assert 0.5 * r["exact_union"] < r["est_union"] < 2.0 * r["exact_union"]
    assert 0.0 <= r["est_jaccard"] <= 1.0
    assert abs(r["est_jaccard"] - r["exact_jaccard"]) < 0.3


def test_merge_upsert_accounting(spark):
    from graphem_rapids_spark.queries import orders_merge_upsert

    r = orders_merge_upsert(spark, SF).first()
    # merged = unchanged base rows + the whole delta
    assert r["n_merged"] == r["n_unchanged"] + r["n_delta"]
    assert r["n_delta"] == r["n_inserted"] + r["n_updated"]
    assert r["n_inserted"] > 0 and r["n_updated"] > 0
    assert r["merged_cents"] > 0


def test_stream_value_hist_matches_batch_buckets(spark):
    from graphem_rapids_spark.queries import events_stream_value_hist

    out = events_stream_value_hist(spark, SF).collect()
    # 5 event types x 3 quantiles, each estimate inside its bucket
    assert len(out) == 15
    for r in out:
        lo, hi = 2.0 ** r["bucket"], 2.0 ** (r["bucket"] + 1)
        assert lo <= r["hist_q"] <= hi


def test_heaps_law_monotone_vocab_growth(spark):
    import math

    from graphem_rapids_spark.queries import doc_heaps_law

    rows = sorted(doc_heaps_law(spark, SF).collect(), key=lambda r: r["cp"])
    assert len(rows) == 10
    for a, b in zip(rows, rows[1:]):
        # cumulative counts never decrease; TTR never increases
        assert a["docs_cum"] <= b["docs_cum"]
        assert a["tokens_cum"] <= b["tokens_cum"]
        assert a["vocab_cum"] <= b["vocab_cum"]
    # Heaps exponent from the first/last checkpoint: sublinear
    # (beta < 1); the templated corpus has a fixed 31-token
    # vocabulary, so it saturates at the first checkpoint (beta = 0)
    n0, v0 = rows[0]["tokens_cum"], rows[0]["vocab_cum"]
    n9, v9 = rows[-1]["tokens_cum"], rows[-1]["vocab_cum"]
    beta = math.log(v9 / v0) / math.log(n9 / n0)
    assert 0.0 <= beta < 1.0
