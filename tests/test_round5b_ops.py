"""Round-5 second batch: BPE merge round, DSIR weights, Wilson
source gate, HyperBall, PassJoin, budget waterfill, SCD2 intervals,
Z-order layout, Theil-Sen trend, streaming late-drop — structural
invariants on the shared test data (cross-engine hash parity for all
ten is covered by tests/test_oracle_parity.py and the driver gate)."""

from graphem_rapids_spark.queries import (
    _APRIORI_MIN_SUPPORT,
    _PJ_TAU,
    ann_ivf_probe_curve,
    graph_degree_hill_tail,
    market_basket_triples,
    _WF_EPOCH_DEN,
    _WF_EPOCH_NUM,
    _WILSON_GATE,
    dedup_passjoin,
    doc_dsir_weights,
    embedding_int8_rank_fidelity,
    doc_source_kl,
    doc_train_val_test_split,
    events_cusum_changepoint,
    events_scd2_intervals,
    events_stream_late_drop,
    events_theil_sen,
    graph_hyperball,
    lang_budget_waterfill,
    lineitem_zorder_layout,
    source_wilson_gate,
    tokenizer_bpe_merge_topk,
    _t,
)

SF = "/root/testdata/sf0.001"


def test_bpe_merge_topk_shape(spark):
    out = tokenizer_bpe_merge_topk(spark, SF).collect()
    assert 0 < len(out) <= 20
    counts = [r["pair_count"] for r in out]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["pair"]) == 2 for r in out)
    assert all(c > 0 for c in counts)


def test_dsir_weights_favor_target_language(spark):
    docs = {
        r["doc_id"]: r["lang"]
        for r in _t(spark, SF, "documents").select("doc_id", "lang").collect()
    }
    out = doc_dsir_weights(spark, SF).collect()
    assert len(out) == len([d for d in docs])
    en = [r["dsir_logw"] for r in out if docs[r["doc_id"]] == "en"]
    other = [r["dsir_logw"] for r in out if docs[r["doc_id"]] != "en"]
    # the importance weight targets the en slice: its mean log-weight
    # must exceed the off-target mean
    assert sum(en) / len(en) > sum(other) / len(other)
    assert all(r["n_feats"] > 0 for r in out)


def test_wilson_bound_below_point_rate(spark):
    out = source_wilson_gate(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert 0.0 <= r["wilson_lb"] <= r["pass_rate"] <= 1.0
        assert r["admitted"] == (r["wilson_lb"] >= _WILSON_GATE)
        assert 0 <= r["n_pass"] <= r["n_docs"]


def test_hyperball_estimates_bracket_exact(spark):
    out = graph_hyperball(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        # balls grow with radius and include the vertex itself
        assert r["exact_r2"] >= r["exact_r1"] >= 2
        # m=64 registers: raw HLL std err ~13%, linear counting tighter;
        # a generous band still catches sign/scale regressions
        assert 0.4 * r["exact_r1"] <= r["est_r1"] <= 2.5 * r["exact_r1"]
        assert 0.4 * r["exact_r2"] <= r["est_r2"] <= 2.5 * r["exact_r2"]


def test_passjoin_recovers_every_double_corruption(spark):
    rows = {r["d"]: r for r in dedup_passjoin(spark, SF).collect()}
    assert set(rows) <= set(range(_PJ_TAU + 1))
    n_dirty_total = (
        _t(spark, SF, "part").filter("p_partkey % 3 = 0").count()
    )
    # every dirty row recovers its own origin — the PassJoin
    # pigeonhole guarantee (segments untouched by <=2 edits)
    assert sum(r["n_self"] for r in rows.values()) == n_dirty_total


def test_waterfill_respects_caps_and_budget(spark):
    out = lang_budget_waterfill(spark, SF).collect()
    budget = sum(r["tokens"] for r in out)
    alloc = sum(r["allocated"] for r in out)
    # full budget is spent (up to the level's 1e-4 rounding x #langs)
    assert abs(alloc - budget) < 1.0
    cap_ratio = _WF_EPOCH_NUM / _WF_EPOCH_DEN
    for r in out:
        assert r["epochs"] <= cap_ratio + 1e-6
        if r["capped"]:
            assert r["allocated"] == float(r["cap"])
        else:
            assert r["allocated"] <= r["cap"]


def test_scd2_intervals_tile_per_user(spark):
    out = events_scd2_intervals(spark, SF).collect()
    by_user: dict = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for rows in by_user.values():
        assert sum(1 for r in rows if r["is_current"]) == 1
        assert rows[-1]["is_current"] and rows[-1]["valid_to_ns"] == -1
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to_ns"] == b["valid_from_ns"]  # contiguous
            assert a["status"] != b["status"]  # runs collapsed
            assert not a["is_current"]


def test_zorder_prunes_naive_does_not(spark):
    out = {r["layout"]: r for r in lineitem_zorder_layout(spark, SF).collect()}
    assert set(out) == {"naive", "zorder"}
    for r in out.values():
        assert 0 <= r["read_pairs"] <= r["total_pairs"]
    assert out["zorder"]["pruned_frac"] > out["naive"]["pruned_frac"]
    # the point of the layout: Z-order skips the large majority
    assert out["zorder"]["pruned_frac"] >= 0.5


def test_theil_sen_pair_counts(spark):
    out = events_theil_sen(spark, SF).collect()
    assert len(out) > 0
    for r in out:
        assert r["n_pairs"] == r["n_days"] * (r["n_days"] - 1) // 2
        assert r["ts_slope_cents"] is not None
        assert r["ols_slope_cents"] is not None


def test_source_kl_nonnegative(spark):
    out = doc_source_kl(spark, SF).collect()
    assert len(out) > 0
    total = sum(r["n_tokens"] for r in out)
    for r in out:
        # Gibbs: KL >= 0, up to the 1e-9 fixed-point ln quantization
        assert r["kl_nats"] >= -1e-6
        assert 0 < r["n_tokens"] < total


def test_cusum_changepoint_in_range(spark):
    out = events_cusum_changepoint(spark, SF).collect()
    assert len(out) > 0
    types = {r["event_type"] for r in out}
    assert len(types) == len(out)  # one changepoint per type
    for r in out:
        assert r["cusum_dollars"] >= 0.0
        assert r["n_days"] >= 2
        assert r["cp_day"] >= 0


def test_split_partitions_and_leak_bounds(spark):
    out = doc_train_val_test_split(spark, SF).collect()
    assert {r["split"] for r in out} <= {"train", "val", "test"}
    n_total = sum(r["n_docs"] for r in out)
    assert n_total == _t(spark, SF, "documents").count()  # a partition
    for r in out:
        assert 0 <= r["n_leaked"] <= r["n_docs"]
    # the 80/10/10 hash split: train holds the large majority
    by = {r["split"]: r["n_docs"] for r in out}
    assert by.get("train", 0) > 0.6 * n_total


def test_probe_curve_monotone(spark):
    out = sorted(
        ann_ivf_probe_curve(spark, SF).collect(), key=lambda r: r["n_probe"]
    )
    assert [r["n_probe"] for r in out] == [1, 2, 4]
    recalls = [r["recall_at_5"] for r in out]
    assert all(0.0 <= x <= 1.0 for x in recalls)
    # more probed cells can only add candidates -> recall monotone
    assert recalls == sorted(recalls)


def test_basket_triples_ordered_and_supported(spark):
    out = market_basket_triples(spark, SF).collect()
    for r in out:
        assert r["p_a"] < r["p_b"] < r["p_c"]
        assert r["support"] >= _APRIORI_MIN_SUPPORT


def test_hill_tail_positive_and_cut_monotone(spark):
    out = sorted(
        graph_degree_hill_tail(spark, SF).collect(), key=lambda r: r["k"]
    )
    assert [r["k"] for r in out] == [25, 50, 100]
    cuts = [r["d_cut"] for r in out]
    assert cuts == sorted(cuts, reverse=True)  # deeper k cuts lower
    for r in out:
        assert r["hill_gamma"] > 0.0
        assert r["alpha_hat"] > 0.0


def test_int8_fidelity_bounds(spark):
    r = embedding_int8_rank_fidelity(spark, SF).first()
    assert r["n_queries"] > 0
    assert 0.0 <= r["mean_overlap_at_5"] <= 1.0
    assert 0 <= r["min_overlap"] <= 5
    # int8 keeps most of the float ranking on real embeddings
    assert r["mean_overlap_at_5"] >= 0.6


def test_late_drop_accounting_balances(spark):
    out = events_stream_late_drop(spark, SF).collect()
    assert len(out) > 0
    dropped = 0
    for r in out:
        assert r["n_total"] == r["n_accepted"] + r["n_late_dropped"]
        assert r["n_late_dropped"] >= 0
        dropped += r["n_late_dropped"]
    # the staged out-of-order backfill spans days against a 45-minute
    # watermark: most of batches 1-2 must be shed
    assert dropped > 0
