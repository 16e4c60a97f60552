"""Eval-and-drift tour: the round-6 session-2 operator families —
retrieval evals (JL MRR), classifier calibration (Brier, kappa,
conformal gate), distribution drift (PSI, KS), time-series
diagnostics and forecasting (ACF, Mann-Kendall, Holt-Winters), the
behavior-chain stationary distribution, clustering agreement
(purity/NMI), coreset selection, and boilerplate removal.

Usage: python examples/eval_and_drift.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark.session import get_spark  # noqa: E402
from graphem_rapids_spark.pipeline.similarity import kcenter_select  # noqa: E402
from graphem_rapids_spark import queries as Q  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graphem-eval-drift-tour")

    # --- retrieval eval: does a 64->16 JL projection keep the exact
    # nearest neighbor findable?
    mrr = Q.retrieval_mrr_jl(spark, sf_dir).collect()[0]
    print(f"JL retrieval MRR@10: {mrr['mrr_at_10']}"
          f" (hits {mrr['n_hits_at_10']}/{mrr['n_queries']})")

    # --- classifier calibration: cheap quality score vs the Gopher
    # structural gate
    print("quality-score calibration (bin, mean_pred, frac_pass, brier):")
    for r in Q.quality_brier_calibration(spark, sf_dir).collect():
        print(f"  bin {r['bin']:2d}: {r['mean_pred']:.3f}"
              f" -> pass {r['frac_pass']:.3f} (brier {r['brier']:.3f})")
    kap = Q.rater_agreement_kappa(spark, sf_dir).collect()[0]
    print(f"two-gate Cohen's kappa: {kap['kappa']} (po {kap['po']},"
          f" pe {kap['pe']})")
    conf = Q.quality_conformal_gate(spark, sf_dir).collect()[0]
    print(f"conformal gate: tau={conf['tau']} keeps"
          f" {conf['coverage']:.3f} of held-out docs (target 0.9)")

    # --- drift: PSI (binned) and KS (bin-free) between half-months
    psi = [r for r in Q.events_psi_drift(spark, sf_dir).collect()
           if r["bin"] == -1][0]
    ks = Q.events_ks_test(spark, sf_dir).collect()[0]
    print(f"value drift: PSI={psi['psi_term']} KS D={ks['ks_d']}"
          f" (at value {ks['at_value']})")

    # --- time series: ACF diagnostic, Mann-Kendall significance,
    # Holt-Winters forecast
    acf24 = [r for r in Q.events_acf(spark, sf_dir).collect()
             if r["lag"] == 24][0]
    print(f"hourly ACF at lag 24h: {acf24['acf']}")
    print("Mann-Kendall trend z per type:")
    for r in Q.events_mann_kendall(spark, sf_dir).collect():
        print(f"  {r['event_type']}: z={r['z']}")
    fut = [r for r in Q.events_forecast_hw(spark, sf_dir).collect()
           if r["is_future"] == 1]
    print(f"Holt-Winters 7-day forecast: {[r['forecast'] for r in fut]}")

    # --- behavior chain: stationary distribution of event types
    print("Markov stationary distribution:")
    for r in Q.events_markov_stationary(spark, sf_dir).collect():
        print(f"  {r['event_type']}: pi={r['pi']}")

    # --- clustering agreement + coreset selection over embeddings
    pur = Q.embedding_cluster_purity(spark, sf_dir).collect()[0]
    print(f"cell-vs-label purity={pur['purity']} NMI={pur['nmi']}")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    sel = kcenter_select(emb, k=4)
    print("k-center coreset (round, id, covering radius):",
          [(r, i, round(d, 2)) for r, i, d in sel])

    # --- boilerplate removal accounting
    bp = Q.doc_boilerplate_lines(spark, sf_dir)
    from pyspark.sql import functions as F
    agg = bp.agg(F.sum("n_boiler").alias("b"),
                 F.sum("n_segments").alias("s")).collect()[0]
    print(f"boilerplate segments dropped: {agg['b']}/{agg['s']}")

    # --- experimentation: CUPED readout + sizing table
    cu = Q.events_cuped_adjustment(spark, sf_dir).collect()[0]
    print(f"A/B readout: naive={cu['naive_diff']}"
          f" CUPED={cu['cuped_diff']} (rho2={cu['rho2']})")
    for r in Q.events_power_analysis(spark, sf_dir).collect():
        print(f"  MDE {r['mde_pct']}%: n_per_arm={r['n_per_arm']}")

    # --- privacy audit before shipping
    ka = Q.privacy_k_anonymity(spark, sf_dir).collect()[0]
    print(f"k-anonymity: min class {ka['min_class']},"
          f" {ka['frac_below_k']:.3f} of rows below k=5,"
          f" l-diversity floor {ka['min_l_diversity']}")

    # --- layout physics: what file skipping buys
    for r in Q.lineitem_skipping_probe(spark, sf_dir).collect():
        print(f"skipping[{r['layout']}]: scan x{r['scan_amplification']}"
              f" (skips {r['skip_ratio']:.3f} of files)")

    spark.stop()


if __name__ == "__main__":
    main()
