"""Physical-plan regression tests — pin the scale-critical plan
properties so a refactor can't silently lose predicate pushdown,
column pruning, or dimension broadcasting (the ".explain and iterate"
contract; see scripts/plan_audit.py)."""

from __future__ import annotations

import sys

import pytest

sys.path.insert(0, "/root/repo")

from scripts.plan_audit import audit_plan  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


@pytest.fixture(scope="module")
def queries():
    return entry.queries()


def test_q6_filters_reach_scan(spark, sf_dir, queries):
    info = audit_plan(queries["q6_forecast_revenue"](spark, sf_dir))
    [scan] = info["scans"]
    # only the 4 referenced columns are read from a 11-column table
    assert scan["n_columns"] == 4
    # all three filter families pushed into the parquet reader
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in scan["pushed_filters"]
    assert info["exchanges"] == 1  # the single final aggregate


def test_q1_column_pruning(spark, sf_dir, queries):
    info = audit_plan(queries["q1_pricing_summary"](spark, sf_dir))
    [scan] = info["scans"]
    assert scan["n_columns"] == 7  # of 11 lineitem columns
    assert "l_shipdate" in scan["pushed_filters"]
    assert info["exchanges"] == 1  # one groupBy shuffle, nothing else


def test_q5_dims_broadcast(spark, sf_dir, queries):
    info = audit_plan(queries["q5_nation_revenue"](spark, sf_dir))
    # 5-table join: every join is broadcast (dims are small), the only
    # shuffle is the final aggregation
    assert info["broadcast_joins"] == 4
    assert info["sortmerge_joins"] == 0
    assert info["exchanges"] == 1
    assert all(s["n_columns"] <= 3 for s in info["scans"])


def test_anti_join_pushdown(spark, sf_dir, queries):
    info = audit_plan(queries["customers_without_orders"](spark, sf_dir))
    # the date filter must hit the orders scan, not run post-join
    orders_scan = [s for s in info["scans"] if "o_orderdate" in s["pushed_filters"]]
    assert orders_scan, f"date filter not pushed: {info['scans']}"
    assert info["broadcast_joins"] >= 1  # nation dim broadcasts


def test_embeddings_prune_to_two_columns(spark, sf_dir, queries):
    info = audit_plan(queries["ann_cosine_topk"](spark, sf_dir))
    # embeddings table: only (vec_id, emb) read on both sides
    assert all(s["n_columns"] == 2 for s in info["scans"])


def test_q7_all_dims_broadcast(spark, sf_dir, queries):
    info = audit_plan(queries["q7_nation_volume"](spark, sf_dir))
    # 6-table join; supplier + both nation roles (and at test scale the
    # other sides too) broadcast — never a sort-merge, one final agg
    assert info["broadcast_joins"] >= 3
    assert info["sortmerge_joins"] == 0
    assert info["exchanges"] == 1


def test_q18_aggregates_before_joining(spark, sf_dir, queries):
    info = audit_plan(queries["q18_large_volume_orders"](spark, sf_dir))
    # the lineitem agg runs first, so the only fact-sized shuffle is
    # that one groupBy; the surviving handful of orderkeys join onward
    assert info["exchanges"] <= 2
    li_scan = [s for s in info["scans"] if s["n_columns"] == 2]
    assert li_scan, "lineitem scan should read only (l_orderkey, l_quantity)"


def test_q19_or_brackets_stay_pushed(spark, sf_dir, queries):
    info = audit_plan(queries["q19_bracketed_revenue"](spark, sf_dir))
    assert info["broadcast_joins"] >= 1  # part dim broadcasts
    assert info["exchanges"] == 1  # scalar agg only
    # lineitem reads at most 4 of 11 columns despite the OR-predicate
    assert min(s["n_columns"] for s in info["scans"]) <= 4


def test_asof_join_single_shuffle(spark, sf_dir, queries):
    info = audit_plan(queries["events_asof_join"](spark, sf_dir))
    # the as-of join is ONE window pass: exactly one exchange on
    # user_id, event-type filter pushed into the events scan
    assert info["exchanges"] == 1
    [scan] = info["scans"]
    assert "event_type" in scan["pushed_filters"]
    assert scan["n_columns"] == 4


def test_q16_excludes_before_distinct_agg(spark, sf_dir, queries):
    info = audit_plan(queries["q16_supplier_count"](spark, sf_dir))
    # bad suppliers anti-join and the part dim both broadcast — the
    # countDistinct shuffle is the only fact-sized exchange family
    assert info["broadcast_joins"] >= 2
    assert info["sortmerge_joins"] == 0
    li_scan = [s for s in info["scans"] if s["n_columns"] == 2]
    assert li_scan, "lineitem must read only (l_partkey, l_suppkey)"


def test_q21_single_fact_shuffle(spark, sf_dir, queries):
    info = audit_plan(queries["q21_waiting_suppliers"](spark, sf_dir))
    # the exists/not-exists pair collapses to ONE groupBy(orderkey) —
    # no self-joins of lineitem, supplier broadcasts
    assert info["exchanges"] <= 3
    assert info["broadcast_joins"] >= 1
    assert info["sortmerge_joins"] == 0
    li_scan = [s for s in info["scans"] if s["n_columns"] == 3]
    assert li_scan, "lineitem must read only (orderkey, suppkey, returnflag)"


def test_q2_window_over_preagg(spark, sf_dir, queries):
    info = audit_plan(queries["q2_min_cost_supplier"](spark, sf_dir))
    # supplier/nation/part all broadcast; the per-part min window
    # rides on the (partkey,suppkey) agg's shuffle
    assert info["broadcast_joins"] >= 3
    assert info["sortmerge_joins"] == 0
    assert info["exchanges"] <= 2


def test_q11_semi_join_broadcast(spark, sf_dir, queries):
    info = audit_plan(queries["q11_important_stock"](spark, sf_dir))
    # nation-filtered supplier set broadcasts into the semi-join; the
    # grand-total reuses the per-part aggregate, not a second scan
    assert info["broadcast_joins"] >= 2
    assert info["sortmerge_joins"] == 0


def test_tfidf_no_global_window_and_no_forced_vocab_broadcast(spark, sf_dir, queries):
    info = audit_plan(queries["doc_tfidf_topk"](spark, sf_dir))
    # the top-3 cut is per-doc, never a partition-less window
    assert info["global_windows"] == 0
    # the count-star N scalar broadcast is the only hinted broadcast —
    # the vocabulary (df) join must stay AQE-decided (≤2 total here
    # since AQE may elect to broadcast the small local vocab)
    assert info["exchanges"] >= 2


def test_running_spend_candidates_broadcast(spark, sf_dir, queries):
    info = audit_plan(queries["customer_running_spend"](spark, sf_dir))
    # top-50 candidate list joins broadcast; windows are per-customer
    assert info["broadcast_joins"] >= 1
    assert info["global_windows"] == 0


def test_recovery_pairs_bin_join_not_theta(spark, sf_dir, queries):
    info = audit_plan(queries["events_recovery_pairs"](spark, sf_dir))
    # the interval join must plan as an equi-join on (user, bin) —
    # a naive theta join would appear as a nested-loop/cartesian
    assert "CartesianProduct" not in info["plan"]
    assert "BroadcastNestedLoopJoin" not in info["plan"]


def test_market_basket_pair_generation_is_mapside(spark, sf_dir, queries):
    info = audit_plan(queries["market_basket_pairs"](spark, sf_dir))
    # pairs come from per-order collected sets (explode), not an
    # op×op self-join: no sort-merge join of two fact-sized sides
    assert info["global_windows"] == 0
    assert "CartesianProduct" not in info["plan"]


def test_active_users_bounded_fanout(spark, sf_dir, queries):
    info = audit_plan(queries["events_active_users"](spark, sf_dir))
    assert info["global_windows"] == 0
