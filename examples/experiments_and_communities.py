"""Round-8 operator tour: the experimentation guardrail/readout
library (pipeline.experiments — SRM, CUPED, Qini), keyphrase
extraction (pipeline.text.keyphrases — RAKE / TextRank), changepoint
segmentation as a library call, Leiden-refined Louvain, iterated
Girvan-Newman, and the hub-capped motif census.

Usage: python examples/experiments_and_communities.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark.session import get_spark  # noqa: E402
from graphem_rapids_spark.analytics import louvain, motif_census  # noqa: E402
from graphem_rapids_spark.pipeline import experiments as X  # noqa: E402
from graphem_rapids_spark.pipeline import timeseries as TS  # noqa: E402
from graphem_rapids_spark.pipeline.text import keyphrases  # noqa: E402
from graphem_rapids_spark import queries as Q  # noqa: E402

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graphem-r8-tour")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # --- experimentation: guardrail FIRST, then the readouts
    arms = events.select("user_id").distinct().select(
        (F.col("user_id") % 2 == 1).alias("treated")
    )
    srm = X.srm_check(arms).collect()[0]
    print(
        f"SRM guardrail: chi2={srm['chi2']} flag={srm['srm_flag']} "
        f"({srm['n_control']} control / {srm['n_treated']} treated)"
    )
    pu = X.per_user_pre_post(events, split_days=15)
    cu = X.cuped(pu).collect()[0]
    print(
        f"CUPED: naive={cu['naive_diff']} adjusted={cu['cuped_diff']} "
        f"theta={cu['theta']} rho2={cu['rho2']}"
    )
    qini = X.uplift_qini(pu).collect()
    print("Qini by decile:", [r["qini"] for r in qini])

    # --- keyphrases: RAKE and TextRank off the same corpus
    rake = keyphrases(docs, method="rake", topk=5).collect()
    print("RAKE top-5:", [r["phrase"] for r in rake])
    tr = keyphrases(docs, method="textrank", topk=5).collect()
    print("TextRank top-5:", [r["word"] for r in tr])

    # --- changepoints as a library call over any dense series
    segs = TS.changepoints(
        TS.dense_counts(events, grain="day"), method="opt"
    ).collect()
    print(
        "changepoint segments:",
        [(r["start_day"], r["end_day"], r["seg_mean"]) for r in segs],
    )

    # --- communities: Leiden-refined Louvain vs plain
    edges = Q.copurchase_edges(spark, sf_dir)
    _lab, traj = louvain(edges, levels=2, move_rounds=4, refine=True)
    print("refined Louvain (level, communities, Q, n_split):", traj)

    # --- iterated Girvan-Newman: the modularity trajectory
    gn = Q.community_girvan_newman_iter(spark, sf_dir).collect()
    print(
        "Girvan-Newman trajectory:",
        [(r["n_cut_total"], r["n_components"], r["modularity"]) for r in gn],
    )

    # --- motif census: exact vs hub-capped
    exact = motif_census(edges, cap=0).collect()[0]
    capped = motif_census(edges, cap=16).collect()[0]
    print(
        f"motif census exact: wedges={exact['n_wedges']} "
        f"triangles={exact['n_triangles']} squares={exact['n_squares']}"
    )
    print(
        f"motif census capped(16): squares>={capped['n_squares']} "
        f"dropped={capped['n_wedges_dropped']} wedge pairs (reported, "
        f"never silent)"
    )

    spark.stop()


if __name__ == "__main__":
    main()
