"""Round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
``{"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}``

Each query is a full action (count + collect-free) timed wall-clock,
run on local[$SPARK_GRAFT_CPUS]. The metric value is the sum of
per-query times — lower is better.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Breadth over the operator families: TPC-H-style aggs/joins, event
# analytics, graph (degree/pagerank/stats), embeddings (kNN/ANN),
# dedup (exact + MinHash-LSH), text stats, layout+influence pipeline.
HEADLINE = [
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_nation_revenue",
    "events_hourly",
    "events_sessionize",
    "graph_degree",
    "graph_stats",
    "pagerank_copurchase",
    "knn_exact",
    "ann_cosine_topk",
    "dedup_exact",
    "dedup_minhash_lsh",
    "doc_token_stats",
    "layout_seed_selection",
    "influence_ic",
    "q6_forecast_revenue",
    "eigenvector_copurchase",
    "closeness_sampled",
    "multimodal_features",
    "events_stream_hourly",
    "q7_nation_volume",
    "q9_product_profit",
    "q10_returned_items",
    "q13_order_distribution",
    "q18_large_volume_orders",
    "events_asof_join",
    "graph_triangles",
    "q2_min_cost_supplier",
    "q21_waiting_suppliers",
    "events_stream_sliding",
    "doc_pipeline_funnel",
    # r8 additions (VERDICT r7 stretch 9): one post-r6 operator from
    # each of the community and text-quality families, re-banded in
    # BASELINE.md before landing
    "community_louvain_move",
    "doc_perplexity_tiers_hist",
]


def main() -> int:
    import __spark_entry__ as entry
    from graphem_rapids_spark.session import get_spark

    spark = get_spark(app_name="graphem-bench")
    queries = entry.queries()

    # warm the JVM/session so q1 doesn't pay startup cost, and spin up
    # the Arrow/pandas worker pool (local[32] forks 32 Python workers,
    # each importing pandas — ~15-25s if paid inside the first
    # mapInPandas query instead of here)
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(batches):
        for b in batches:
            yield b

    (
        spark.range(256, numPartitions=64)
        .mapInPandas(_ident, "id long")
        .selectExpr("sum(id)")
        .collect()
    )

    # UNTIMED warm pass (round-7, VERDICT r6 item 4): run every
    # headline query once at sf0.001 first. Same logical plans → the
    # same whole-stage-codegen classes get JIT-compiled before the
    # timed loop, so the gate measures plans, not JVM tiering — the
    # r5/r6 sessions' 110–180 s spread was dominated by
    # layout_seed_selection (19→63 s) and the first timed queries
    # paying C2 compilation. Costs ~20 s; skip with
    # SPARK_GRAFT_NO_WARM=1.
    if os.environ.get("SPARK_GRAFT_NO_WARM", "0") != "1":
        warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
        if not os.path.isdir(warm_dir):
            warm_dir = SF_DIR
        for name in HEADLINE:
            try:
                queries[name](spark, warm_dir).count()
            except Exception as exc:  # noqa: BLE001 — warm-up must not fail the bench
                print(f"# warm {name}: {exc}", file=sys.stderr)

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {n} rows in {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
