"""Benchmark-suite CLI — the reference's standalone harness
(``benchmarks/run_benchmarks.py:87-133`` run_all fan-out over 9
generator configs + influence benchmarks + timestamped report dir),
driving this engine's library equivalents (benchmark.run_benchmark /
run_influence_benchmark) on Spark local mode.

Usage:
    python benchmarks/run_benchmarks.py                   # full suite
    python benchmarks/run_benchmarks.py --suite generators
    python benchmarks/run_benchmarks.py --suite influence --small
    python benchmarks/run_benchmarks.py --output-dir /tmp/bench_out
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from graphem_rapids_spark import (  # noqa: E402
    erdos_renyi_graph,
    generate_ba,
    generate_caveman,
    generate_geometric,
    generate_random_regular,
    generate_sbm,
    generate_scale_free,
    generate_ws,
    get_spark,
)
from graphem_rapids_spark.benchmark import (  # noqa: E402
    run_benchmark,
    run_influence_benchmark,
)
from graphem_rapids_spark.reports import (  # noqa: E402
    display_benchmark_results,
    save_results,
)

# The reference's 9-config generator fan-out
# (``benchmarks/run_benchmarks.py:118-133``), same shapes and seeds.
GENERATOR_CONFIGS = [
    (erdos_renyi_graph, {"n": 500, "p": 0.03, "seed": 42}, "Erdős–Rényi"),
    (generate_random_regular, {"n": 500, "d": 3, "seed": 42}, "Random Regular (d=3)"),
    (generate_random_regular, {"n": 500, "d": 5, "seed": 42}, "Random Regular (d=5)"),
    (generate_ws, {"n": 500, "k": 4, "p": 0.1, "seed": 42}, "Watts-Strogatz"),
    (generate_ba, {"n": 500, "m": 2, "seed": 42}, "Barabási-Albert"),
    (
        generate_sbm,
        {"n_per_block": 125, "num_blocks": 4, "p_in": 0.3, "p_out": 0.01, "seed": 42},
        "Stochastic Block Model",
    ),
    (generate_scale_free, {"n": 500, "seed": 42}, "Scale-Free"),
    (generate_geometric, {"n": 500, "radius": 0.15, "seed": 42}, "Random Geometric"),
    (generate_caveman, {"l": 20, "k": 25}, "Caveman"),
]

SMALL_CONFIGS = [
    (erdos_renyi_graph, {"n": 100, "p": 0.05, "seed": 42}, "Erdős–Rényi (n=100)"),
    (generate_random_regular, {"n": 100, "d": 4, "seed": 42}, "Random Regular (n=100)"),
    (generate_ba, {"n": 100, "m": 2, "seed": 42}, "Barabási-Albert (n=100)"),
]


def _spawn(gen, params, spark):
    if "spark" in gen.__code__.co_varnames[: gen.__code__.co_argcount]:
        return gen(spark=spark, **params)
    return gen(**params)


def run_generator_suite(spark, configs, iterations: int) -> list[dict]:
    results = []
    for gen, params, name in configs:
        print(f"\n--- {name} ---")
        g = _spawn(gen, params, spark)
        r = run_benchmark(g, num_iterations=iterations)
        r["graph"] = name
        print(display_benchmark_results(r))
        results.append(r)
    return results


def run_influence_suite(spark, configs, iterations: int) -> list[dict]:
    results = []
    for gen, params, name in configs:
        print(f"\n--- influence: {name} ---")
        g = _spawn(gen, params, spark)
        r = run_influence_benchmark(
            g, k=5, p=0.1, trials=10, num_iterations=iterations,
            include_greedy=False,
        )
        r["graph"] = name
        print(json.dumps({k: v for k, v in r.items() if k != "graphem"}, default=str))
        print("  graphem:", {k: v for k, v in r["graphem"].items() if k != "seeds"})
        results.append(r)
    return results


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--suite", choices=["all", "generators", "influence"], default="all")
    ap.add_argument("--small", action="store_true", help="3-config quick pass")
    ap.add_argument("--iterations", type=int, default=10, help="layout iterations")
    ap.add_argument("--output-dir", default="benchmark_results")
    args = ap.parse_args()

    spark = get_spark(app_name="graphem-benchmarks")
    configs = SMALL_CONFIGS if args.small else GENERATOR_CONFIGS
    run_dir = os.path.join(args.output_dir, f"run_{time.strftime('%Y%m%d_%H%M%S')}")
    t0 = time.time()
    summary: dict = {}

    if args.suite in ("all", "generators"):
        res = run_generator_suite(spark, configs, args.iterations)
        save_results(res, os.path.join(run_dir, "generator_benchmarks.json"))
        save_results(
            [
                {
                    "graph": r["graph"],
                    "n_vertices": r["n_vertices"],
                    "n_edges": r["n_edges"],
                    "layout_time": round(r["layout_time"], 3),
                    "total_time": round(r["total_time"], 3),
                }
                for r in res
            ],
            os.path.join(run_dir, "generator_benchmarks.csv"),
        )
        summary["generators"] = len(res)
    if args.suite in ("all", "influence"):
        res = run_influence_suite(spark, configs[:3], args.iterations)
        save_results(res, os.path.join(run_dir, "influence_benchmarks.json"))
        summary["influence"] = len(res)

    summary["total_sec"] = round(time.time() - t0, 1)
    save_results(summary, os.path.join(run_dir, "summary.json"))
    print(f"\nSuite done in {summary['total_sec']}s — reports in {run_dir}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
