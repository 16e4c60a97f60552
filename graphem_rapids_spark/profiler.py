"""Query profiler — the Spark-native analog of the reference's
profiling hooks (``benchmarks/run_benchmarks.py:1018-1065``: cProfile /
line_profiler / torch-profiler around ``run_all_benchmarks``).

A JVM execution engine has nothing for cProfile to see — the hot path
is whole-stage-codegen'd Java, not Python bytecode — so the faithful
analog is the engine's own instrumentation: every SQL execution Spark
runs is recorded in the shared-state status store (the same data the
Spark UI renders) with per-operator metrics (output rows, shuffle
bytes read/written, spill, peak memory, scan time). ``profile_query``
wraps an action, diffs the store before/after, and returns those
metrics aggregated per metric name plus the post-AQE physical plan of
every execution the action triggered — the numbers a performance
investigation actually needs (where did bytes shuffle, did anything
spill), where cProfile would only show ``socket.recv``.

Driver-side Python (the thin coordination layer) stays profilable
with stdlib cProfile via ``profile_python``, mirroring the
reference's ``--profile`` flag 1:1.
"""

from __future__ import annotations

import cProfile
import io
import pstats
import re
import time
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

__all__ = ["profile_query", "profile_python", "format_profile"]

# metric-value strings come back UI-formatted: "total (min, med, max
# (stageId: taskId))\n64.0 KiB (32.0 KiB, 32.0 KiB, 32.0 KiB ...)" or
# plain "1,234". The leading scalar before any parenthesis is the
# total; sizes carry a binary-unit suffix, durations a time suffix.
_UNIT = {
    "B": 1,
    "KiB": 1 << 10,
    "MiB": 1 << 20,
    "GiB": 1 << 30,
    "TiB": 1 << 40,
    "ms": 1e-3,
    "s": 1.0,
    "m": 60.0,
    "h": 3600.0,
}
_NUM_RE = re.compile(r"(-?[\d.,]+)\s*(B|KiB|MiB|GiB|TiB|ms|s|m|h)?\b")


def _parse_metric_total(text: str) -> float | None:
    """Best-effort numeric total of a UI-formatted metric string —
    the first number (with optional size/time unit) on the first
    line, which the UI renders as the across-tasks total."""
    first = text.strip().splitlines()[0] if text.strip() else ""
    m = _NUM_RE.search(first)
    if not m:
        return None
    try:
        val = float(m.group(1).replace(",", ""))
    except ValueError:
        return None
    return val * _UNIT.get(m.group(2) or "B", 1) if m.group(2) else val


def _scala_seq(seq) -> list:
    return [seq.apply(i) for i in range(seq.size())]


def _scala_map_items(m) -> list[tuple[Any, Any]]:
    it, out = m.iterator(), []
    while it.hasNext():
        kv = it.next()
        out.append((kv._1(), kv._2()))
    return out


def profile_query(
    action: Callable[[], Any] | DataFrame,
    spark: SparkSession | None = None,
) -> dict:
    """Run ``action`` (a thunk, or a DataFrame whose ``count()``
    becomes the action) and return its engine-side profile::

        {"wall_sec": float, "result": <action's return>,
         "executions": [{"plan": str,
                         "metrics": {name: {"total": float|None,
                                            "raw": [str, ...],
                                            "nodes": int}}}]}

    ``metrics`` aggregates the per-operator SQL metrics of one
    execution by metric name — ``nodes`` counts how many plan
    operators reported the metric, ``total`` sums their UI totals
    (rows for counters, bytes for sizes, seconds for times). Typical
    keys: ``number of output rows``, ``shuffle bytes written``,
    ``spill size``, ``peak memory``. Reference parity: the
    ``--profile`` hook of ``run_benchmarks.py:1018-1029`` re-expressed
    against the engine that actually does the work."""
    if isinstance(action, DataFrame):
        df = action
        spark = spark or df.sparkSession
        action = df.count
    if spark is None:
        raise ValueError("pass spark= when action is a thunk")
    store = spark._jsparkSession.sharedState().statusStore()

    def _max_exec_id() -> int:
        lst = store.executionsList()
        mx = -1
        for i in range(lst.size()):
            mx = max(mx, lst.apply(i).executionId())
        return mx

    # select new executions by executionId, NOT by list position: the
    # store retains only spark.sql.ui.retainedExecutions entries, so
    # in a long session size() pins at the cap and positional slicing
    # silently finds nothing
    id0 = _max_exec_id()
    t0 = time.perf_counter()
    result = action()
    wall = time.perf_counter() - t0
    # the SQL status store is fed by the ASYNC listener bus — under
    # load the execution entry/metrics land after the action returns;
    # drain the bus (private[spark] compiles to public bytecode) and
    # poll briefly so concurrent-suite runs don't read an empty store
    try:
        spark.sparkContext._jsc.sc().listenerBus().waitUntilEmpty(10_000)
    except Exception:
        pass
    deadline = time.perf_counter() + 10.0
    while _max_exec_id() <= id0 and time.perf_counter() < deadline:
        time.sleep(0.05)
    execs = []
    lst = store.executionsList()
    new = [
        lst.apply(i)
        for i in range(lst.size())
        if lst.apply(i).executionId() > id0
    ]
    for e in sorted(new, key=lambda x: x.executionId()):
        values = dict(_scala_map_items(store.executionMetrics(e.executionId())))
        per_name: dict[str, dict] = {}
        for pm in _scala_seq(e.metrics()):
            raw = values.get(pm.accumulatorId())
            if raw is None:
                continue
            slot = per_name.setdefault(
                pm.name(), {"total": None, "raw": [], "nodes": 0}
            )
            slot["nodes"] += 1
            slot["raw"].append(raw)
            num = _parse_metric_total(raw)
            if num is not None:
                slot["total"] = (slot["total"] or 0.0) + num
        execs.append(
            {"plan": e.physicalPlanDescription(), "metrics": per_name}
        )
    return {"wall_sec": wall, "result": result, "executions": execs}


def profile_python(action: Callable[[], Any], top: int = 25) -> dict:
    """cProfile the DRIVER-side Python of ``action`` — the 1:1 analog
    of the reference's ``--profile`` flag (``run_benchmarks.py:
    1018-1029``), useful for the coordination layer (plan
    construction, driver-side numpy in the layout seed path). Returns
    ``{"result", "stats_text", "wall_sec"}``."""
    prof = cProfile.Profile()
    t0 = time.perf_counter()
    result = prof.runcall(action)
    wall = time.perf_counter() - t0
    buf = io.StringIO()
    pstats.Stats(prof, stream=buf).sort_stats("cumulative").print_stats(top)
    return {"result": result, "stats_text": buf.getvalue(), "wall_sec": wall}


def format_profile(profile: dict, top: int = 12) -> str:
    """Human-readable summary of a ``profile_query`` result: wall
    time, then per execution the heaviest metrics by total."""
    lines = [f"wall: {profile['wall_sec']:.3f}s"]
    for i, e in enumerate(profile["executions"]):
        lines.append(f"execution {i}:")
        named = sorted(
            e["metrics"].items(),
            key=lambda kv: -(kv[1]["total"] or 0.0),
        )[:top]
        for name, slot in named:
            lines.append(
                f"  {name}: total={slot['total']} over {slot['nodes']} nodes"
            )
    return "\n".join(lines)
