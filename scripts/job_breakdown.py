"""Per-JOB wall/gap decomposition for one query (guide §1.5/§7.3).

profile_bench.py reports the aggregate driver floor (wall −
executorRunTime/cores); this tool shows WHERE it goes: every Spark job
the timed action triggered, its submission→completion wall time, and —
the driver-floor signature — the GAP between the previous job's
completion and this job's submission (planning, analysis, py4j
round-trips, collect processing all live in the gaps).

Usage: python scripts/job_breakdown.py <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _scala_seq(seq):
    return [seq.apply(i) for i in range(seq.size())]


def _empty_jlist(spark):
    return spark.sparkContext._jvm.java.util.ArrayList()


def _jobs(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    out = []
    for j in _scala_seq(store.jobsList(_empty_jlist(spark))):
        sub = j.submissionTime()
        comp = j.completionTime()
        out.append(
            (
                j.jobId(),
                sub.get().getTime() if sub.isDefined() else None,
                comp.get().getTime() if comp.isDefined() else None,
                j.numTasks(),
                (j.description().get() if j.description().isDefined() else j.name())[
                    :90
                ],
            )
        )
    return sorted(out, key=lambda r: r[0])


def main() -> int:
    import __spark_entry__ as entry
    from graphem_rapids_spark.session import get_spark

    names = sys.argv[1:]
    spark = get_spark(app_name="graphem-jobs")
    queries = entry.queries()
    spark.range(1000).selectExpr("sum(id)").collect()

    def _ident(batches):
        yield from batches

    (
        spark.range(256, numPartitions=64)
        .mapInPandas(_ident, "id long")
        .selectExpr("sum(id)")
        .collect()
    )

    warm_dir = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.001")
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR

    for name in names:
        try:
            queries[name](spark, warm_dir).count()
        except Exception as exc:  # noqa: BLE001
            print(f"# warm {name}: {exc}", file=sys.stderr)

    for name in names:
        before_ids = {j[0] for j in _jobs(spark)}
        t0 = time.time()
        queries[name](spark, SF_DIR).count()
        wall = time.time() - t0
        jobs = [j for j in _jobs(spark) if j[0] not in before_ids]
        print(f"\n## {name}: wall {wall:.2f}s, {len(jobs)} jobs")
        prev_end = None
        gap_total = 0.0
        run_total = 0.0
        for jid, sub, comp, ntasks, desc in jobs:
            if sub is None or comp is None:
                continue
            gap = (sub - prev_end) / 1000.0 if prev_end is not None else 0.0
            dur = (comp - sub) / 1000.0
            gap_total += max(gap, 0.0)
            run_total += dur
            prev_end = comp
            print(f"  job {jid:>5}  gap {gap:6.3f}s  run {dur:6.3f}s  tasks {ntasks:>4}  {desc}")
        print(
            f"  == gaps {gap_total:.2f}s + in-job {run_total:.2f}s"
            f" (wall {wall:.2f}s; pre-first-job+post-last"
            f" {wall - gap_total - run_total:.2f}s)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
