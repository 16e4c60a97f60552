"""Dump `.explain("formatted")` for named queries to files.

Usage: python scripts/dump_plans.py OUTDIR SUFFIX [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt. For queries whose result is a
driver-composed local relation (e.g. community_louvain_move returns a
1-row createDataFrame), the final plan is a LocalTableScan; the file
still records it, with the wall time, so plan claims stay auditable
via the per-operator code and PLANS.md.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    outdir, suffix, *names = sys.argv[1:]
    os.makedirs(outdir, exist_ok=True)
    import __spark_entry__ as entry
    from graphem_rapids_spark.session import get_spark

    spark = get_spark(app_name="plan-dump")
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    (
        spark.range(256, numPartitions=64)
        .mapInPandas(_ident, "id long")
        .selectExpr("sum(id)")
        .collect()
    )
    queries = entry.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    for name in names:
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        build_s = time.time() - t0
        plan = df._jdf.queryExecution().explainString(mode)
        t0 = time.time()
        n = df.count()
        run_s = time.time() - t0
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(
                f"# {name} @ {SF_DIR} — build {build_s:.2f}s, "
                f"count() {run_s:.2f}s, {n} rows\n"
            )
            f.write(plan)
        print(f"# wrote {path} (build {build_s:.2f}s run {run_s:.2f}s)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
