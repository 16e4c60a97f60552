"""Physical-plan audit for the headline queries.

Prints, per query: shuffle (Exchange) count, broadcast-join count,
whole-stage-codegen span count, parquet scans with their pushed
filters and read-schema width. This is the ".explain and iterate"
feedback loop demanded by the scale brief: a scan that reads all
columns for a 2-column projection, or a filter that didn't reach the
scan, shows up here immediately.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def audit_plan(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    scans = []
    # formatted mode = numbered tree + per-operator detail blocks; count
    # the numbered detail headers so tree lines don't double-count
    for m in re.finditer(r"\(\d+\) Scan parquet[^\n]*\n((?:[^\n]+\n)*)", plan):
        block = m.group(0)
        pushed = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        schema = re.search(r"ReadSchema: struct<([^>]*)>", block)
        if schema is None:
            continue
        scans.append(
            {
                "pushed_filters": (pushed.group(1) if pushed else "").strip(),
                "n_columns": len(schema.group(1).split(",")) if schema.group(1) else 0,
            }
        )
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange", plan)),
        "broadcast_joins": len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)),
        "sortmerge_joins": len(re.findall(r"\(\d+\) SortMergeJoin", plan)),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "scans": scans,
        "plan": plan,
    }


def main() -> None:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]
    spark = get_spark()
    queries = entry.queries()
    for name in names or sorted(queries):
        try:
            info = audit_plan(queries[name](spark, sf_dir))
        except Exception as exc:  # iterative queries may need actions to plan
            print(f"{name}: unplannable statically ({type(exc).__name__})")
            continue
        scans = "; ".join(
            f"cols={s['n_columns']} pushed=[{s['pushed_filters'][:60]}]"
            for s in info["scans"]
        )
        print(
            f"{name}: exchanges={info['exchanges']} "
            f"bcast={info['broadcast_joins']} smj={info['sortmerge_joins']} "
            f"codegen={info['codegen_spans']} scans({len(info['scans'])}): {scans}"
        )


if __name__ == "__main__":
    main()
