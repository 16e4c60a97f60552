"""Influence-maximization benchmark on a random-regular graph — the
reference's ``examples/random_regular_example.py`` workflow: embed,
pick radial seeds, and compare GraphEm seeds vs greedy vs random
baselines on Independent-Cascade spread (efficiency = influence per
selection-second, the reference's headline metric).

Usage: python examples/influence_benchmark.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark import generate_random_regular, get_spark  # noqa: E402
from graphem_rapids_spark.benchmark import run_influence_benchmark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="graphem-influence-example")
    g = generate_random_regular(n=300, d=4, seed=42, spark=spark)
    result = run_influence_benchmark(
        g, k=5, p=0.1, trials=10, num_iterations=10, include_greedy=True
    )
    for method in ("graphem", "greedy", "random"):
        if method not in result:
            continue
        r = result[method]
        if "time" in r:
            print(f"{method:8s} influence={r['influence']:.1f} "
                  f"time={r['time']:.1f}s efficiency={r['efficiency']:.2f}")
        else:
            print(f"{method:8s} influence={r['influence']:.1f} (baseline)")


if __name__ == "__main__":
    main()
