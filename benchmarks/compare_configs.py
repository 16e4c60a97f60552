"""Config-comparison CLI — the Spark-engine analog of the reference's
backend comparison (``benchmarks/compare_backends.py:296-311`` CLI over
torch/cuVS backends): one engine, re-timed under different runtime
knobs (shuffle partitions, AQE, broadcast threshold) via
benchmark.compare_configs.

Usage:
    python benchmarks/compare_configs.py                 # default grid
    python benchmarks/compare_configs.py --small-test
    python benchmarks/compare_configs.py --repeats 3 --output-dir /tmp/cmp
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphem_rapids_spark import erdos_renyi_graph, get_spark  # noqa: E402
from graphem_rapids_spark.analytics import pagerank  # noqa: E402
from graphem_rapids_spark.benchmark import compare_configs  # noqa: E402
from graphem_rapids_spark.reports import save_results  # noqa: E402

CONFIG_GRID = {
    "baseline": {},
    "no_aqe": {"spark.sql.adaptive.enabled": "false"},
    "shuffle_8": {"spark.sql.shuffle.partitions": "8"},
    "shuffle_64": {"spark.sql.shuffle.partitions": "64"},
    "no_broadcast": {"spark.sql.autoBroadcastJoinThreshold": "-1"},
}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--small-test", action="store_true")
    ap.add_argument("--repeats", type=int, default=1)
    ap.add_argument("--output-dir", default="benchmark_results")
    args = ap.parse_args()

    spark = get_spark(app_name="graphem-compare-configs")
    n = 200 if args.small_test else 1000
    g = erdos_renyi_graph(n=n, p=0.02, seed=42, spark=spark)
    g.edges.persist().count()

    def workload():
        pagerank(g.edges, g.n_vertices, max_iter=5, tol=0).count()

    results = compare_configs(workload, CONFIG_GRID, repeats=args.repeats)
    rows = [
        {
            "config": label,
            "best_sec": round(r["best"], 3),
            "mean_sec": round(r["mean"], 3),
            "speedup_vs_first": round(r["speedup_vs_first"], 3),
        }
        for label, r in results.items()
    ]
    for r in rows:
        print(r)
    out = os.path.join(
        args.output_dir, f"compare_configs_{time.strftime('%Y%m%d_%H%M%S')}.csv"
    )
    save_results(rows, out)
    print("saved:", out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
