"""Per-query wall-clock decomposition for the bench headline.

For each named query (default: the heavy ones), runs the same
warm-then-time protocol as bench.py and reports, from the engine's own
AppStatusStore (guide §1.5/§7.1 — the UI's data source, readable with
the UI disabled):

- wall seconds for the timed action
- number of Spark jobs / stages / tasks the action triggered
- summed executorRunTime and executorCpuTime across those stages
- shuffle read/write bytes

``wall − executorRunTime/32`` bounds the driver-side share (planning,
codegen, scheduling, collect round-trips) — when that dominates, the
fix is fewer jobs / smaller plans, not faster tasks (guide §1.2 order:
algorithm → per-task work → config).

Usage: python scripts/profile_bench.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

DEFAULT = [
    "layout_seed_selection",
    "community_louvain_move",
    "dedup_minhash_lsh",
    "influence_ic",
    "doc_pipeline_funnel",
    "closeness_sampled",
    "eigenvector_copurchase",
    "pagerank_copurchase",
    "graph_triangles",
    "graph_degree",
    "q21_waiting_suppliers",
    "events_stream_hourly",
    "events_stream_sliding",
]


def _scala_seq(seq):
    return [seq.apply(i) for i in range(seq.size())]


def _empty_jlist(spark):
    return spark.sparkContext._jvm.java.util.ArrayList()


def _stage_snapshot(spark):
    """{stage_id: (run_ms, cpu_ns, tasks, shuf_r, shuf_w, name)}"""
    store = spark.sparkContext._jsc.sc().statusStore()
    out = {}
    gw = spark.sparkContext._gateway
    empty_doubles = gw.new_array(gw.jvm.double, 0)
    for s in _scala_seq(
        store.stageList(
            _empty_jlist(spark), False, False, empty_doubles, _empty_jlist(spark)
        )
    ):
        out[(s.stageId(), s.attemptId())] = (
            s.executorRunTime(),
            s.executorCpuTime(),
            s.numCompleteTasks() + s.numFailedTasks(),
            s.shuffleReadBytes(),
            s.shuffleWriteBytes(),
            s.name(),
        )
    return out


def _job_count(spark):
    store = spark.sparkContext._jsc.sc().statusStore()
    return sum(1 for _ in _scala_seq(store.jobsList(_empty_jlist(spark))))


def _codegen_metrics(spark):
    """(n_compiles, total_compile_ms) from the JVM-wide CodegenMetrics
    source — counts actual Janino compilations (codegen cache misses)."""
    try:
        jvm = spark.sparkContext._jvm
        obj = (
            jvm.java.lang.Class.forName(
                "org.apache.spark.metrics.source.CodegenMetrics$"
            )
            .getField("MODULE$")
            .get(None)
        )
        h = obj.METRIC_COMPILATION_TIME()
        n = h.getCount()
        mean = h.getSnapshot().getMean()
        return int(n), float(n * mean)
    except Exception:
        return 0, 0.0


def main() -> int:
    import __spark_entry__ as entry
    from graphem_rapids_spark.session import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark(app_name="graphem-profile")
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

    results = {}
    for name in names:
        fn = queries[name]
        spark.sparkContext.setJobDescription(f"profile:{name}")
        jobs0 = _job_count(spark)
        st0 = _stage_snapshot(spark)
        cg_n0, cg_ms0 = _codegen_metrics(spark)
        t0 = time.time()
        df = fn(spark, SF_DIR)
        n = df.count()
        wall = time.time() - t0
        try:
            spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
        except Exception:
            pass
        st1 = _stage_snapshot(spark)
        jobs1 = _job_count(spark)
        cg_n1, cg_ms1 = _codegen_metrics(spark)
        new = {k: v for k, v in st1.items() if k not in st0}
        run_ms = sum(v[0] for v in new.values())
        cpu_ms = sum(v[1] for v in new.values()) / 1e6
        tasks = sum(v[2] for v in new.values())
        shr = sum(v[3] for v in new.values())
        shw = sum(v[4] for v in new.values())
        results[name] = {
            "wall_s": round(wall, 3),
            "rows": n,
            "jobs": jobs1 - jobs0,
            "stages": len(new),
            "tasks": tasks,
            "exec_run_s": round(run_ms / 1e3, 3),
            "exec_cpu_s": round(cpu_ms / 1e3, 3),
            "shuffle_read_mb": round(shr / 1e6, 2),
            "shuffle_write_mb": round(shw / 1e6, 2),
            "codegen_compiles": cg_n1 - cg_n0,
            "codegen_ms": round(cg_ms1 - cg_ms0, 1),
            # lower bound on driver-side share: wall minus perfectly
            # parallel task time over 32 cores
            "driver_floor_s": round(max(0.0, wall - run_ms / 1e3 / 32), 3),
        }
        print(f"# {name}: {json.dumps(results[name])}", file=sys.stderr)
        if os.environ.get("PROFILE_STAGES", "0") == "1":
            for k, v in sorted(new.items(), key=lambda kv: -kv[1][0])[:8]:
                print(
                    f"#   stage {k[0]}: run={v[0]/1e3:.2f}s cpu={v[1]/1e6/1e3:.2f}s"
                    f" tasks={v[2]} {v[5][:90]}",
                    file=sys.stderr,
                )
        spark.sparkContext.setJobDescription(None)
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
