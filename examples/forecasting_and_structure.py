"""Round-7 operator tour: the forecasting/survival library
(pipeline.timeseries), multi-level Louvain with community
coarsening, two-level k-center, histogram perplexity tiering, and
changepoint segmentation — the library APIs behind the newest
registry queries.

Usage: python examples/forecasting_and_structure.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark.session import get_spark  # noqa: E402
from graphem_rapids_spark.analytics import louvain  # noqa: E402
from graphem_rapids_spark.pipeline import timeseries as TS  # noqa: E402
from graphem_rapids_spark.pipeline.similarity import (  # noqa: E402
    kcenter_two_level,
)
from graphem_rapids_spark.pipeline.text import perplexity_tiers  # noqa: E402
from graphem_rapids_spark import queries as Q  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graphem-r7-tour")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")

    # --- forecasting / survival library over any DataFrame
    acf = TS.acf(events, lags=(1, 24)).collect()
    print("hourly ACF:", {r["lag"]: r["acf"] for r in acf})
    hw = Q.events_forecast_hw(spark, sf_dir).collect()
    fut = [r for r in hw if r["is_future"] == 1]
    print("Holt-Winters next-7-day forecasts:",
          [round(r["forecast"], 1) for r in fut])
    km = Q.customer_survival_km(spark, sf_dir).collect()
    print(f"Kaplan-Meier: survival at the median gap = "
          f"{km[len(km) // 2]['survival']:.3f} ({len(km)} steps)")
    segs = Q.events_changepoint_opt(spark, sf_dir).collect()
    print("optimal-partitioning segments:",
          [(r["start_day"], r["end_day"], r["seg_mean"]) for r in segs])

    # --- multi-level Louvain: move phase + community coarsening
    edges = Q.copurchase_edges(spark, sf_dir)
    labels, traj = louvain(edges, levels=2, move_rounds=4)
    print("Louvain Q trajectory (level, communities, Q):", traj)

    # --- two-level k-center: 2 corpus passes regardless of k
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sel = kcenter_two_level(emb, k=4, n_cells=8)
    print("two-level k-center (round, id, sel_dist, radius):")
    for row in sel:
        print("  ", row)

    # --- histogram perplexity tiering (no per-lang sort of raw docs)
    x = Q._doc_xent(spark, sf_dir).localCheckpoint(eager=True)
    tiers = perplexity_tiers(x, mode="histogram")
    counts = tiers.groupBy("lang", "tier").count().orderBy("lang", "tier")
    print("CCNet tiers per lang (histogram mode):")
    for r in counts.collect():
        print(f"  {r['lang']} tier {r['tier']}: {r['count']} docs")

    spark.stop()


if __name__ == "__main__":
    main()
