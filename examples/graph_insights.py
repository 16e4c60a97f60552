"""Graph-topology and behavioral analytics over the co-purchase
graph and TPC-H-ish tables: clustering coefficient, assortativity,
Adamic-Adar link prediction, core decomposition, RFM segmentation,
market-basket affinity, and event-sequence transitions.

Usage: python examples/graph_insights.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark.session import get_spark  # noqa: E402
from graphem_rapids_spark import queries as Q  # noqa: E402
from graphem_rapids_spark.analytics import coreness  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="graphem-graph-insights")

    top_cc = Q.graph_clustering_coeff(spark, sf_dir)
    print("most clustered parts (top 5):")
    for r in top_cc.limit(5).collect():
        print(f"  part {r.id}: C={r.clustering} (deg {r.deg}, {r.n_tri} triangles)")

    rho = Q.graph_assortativity(spark, sf_dir).first()["assortativity"]
    print(f"degree assortativity: {rho}")

    aa = Q.link_adamic_adar(spark, sf_dir)
    print("top predicted links (Adamic-Adar):")
    for r in aa.limit(5).collect():
        print(f"  ({r.u}, {r.v}): score={r.aa_score} over {r.n_common} common neighbors")

    core = coreness(Q.copurchase_edges(spark, sf_dir))
    hist = core.groupBy("core").count().orderBy("core").collect()
    print("core-number histogram:", {r.core: r["count"] for r in hist})

    rfm = Q.customer_rfm(spark, sf_dir)
    print("largest RFM segments:")
    for r in rfm.orderBy(rfm.n_customers.desc()).limit(3).collect():
        print(
            f"  R{r.r_score}F{r.f_score}M{r.m_score}: "
            f"{r.n_customers} customers, avg spend {r.avg_monetary}"
        )

    basket = Q.market_basket_pairs(spark, sf_dir)
    print("strongest part affinities:")
    for r in basket.limit(3).collect():
        print(f"  parts ({r.a}, {r.b}): support={r.support} lift={r.lift}")

    trans = Q.events_transition_topk(spark, sf_dir)
    print("top event transitions:")
    for r in trans.limit(3).collect():
        print(f"  {r.from_type} -> {r.to_type}: {r.n_transitions}")

    fit = Q.graph_degree_powerlaw_fit(spark, sf_dir).first()
    print(f"degree distribution log-log fit: slope={fit.slope} r2={fit.r2}")

    far = Q.graph_weighted_sssp(spark, sf_dir)
    print("weighted-SSSP reach:", far.count(), "parts from the min-id source")

    # O(log d) star-contraction CC — the 100 TB path (identical labels
    # to min-label propagation; auto-selected above GRAPHEM_CC_STAR_MIN)
    from graphem_rapids_spark.analytics import connected_components
    from graphem_rapids_spark.graph.canon import relabel_contiguous

    e, mapping = relabel_contiguous(Q.copurchase_edges(spark, sf_dir), canonical=True)
    n = mapping.count()
    comp = connected_components(e, n, algorithm="star")
    sizes = comp.groupBy("component").count().orderBy(comp.component)
    print("components (star contraction):", sizes.count(), "largest:",
          sizes.orderBy(sizes["count"].desc()).first()["count"])

    # weighted force layout: order multiplicity pulls co-bought parts
    wl = Q.graph_weighted_layout(spark, sf_dir)
    print("weighted-layout radial seeds:")
    for r in wl.limit(3).collect():
        print(f"  part {r.part_id}: radius={r.radius}")

    lpa = Q.community_lpa(spark, sf_dir)
    print("label-propagation communities:", lpa.count())

    kt = Q.ktruss_copurchase(spark, sf_dir).first()
    print(f"4-truss core: {kt.n_edges} edges over {kt.n_vertices} parts")

    ppr = Q.ppr_copurchase(spark, sf_dir)
    print("personalized-PageRank top parts (seeded by the 5 smallest ids):")
    for r in ppr.orderBy(ppr.ppr.desc()).limit(3).collect():
        print(f"  part {r.id}: ppr={r.ppr}")

    ecc = Q.graph_eccentricity_sampled(spark, sf_dir)
    print("sampled diameter lower bound:",
          ecc.agg({"eccentricity": "max"}).first()[0])

    mst = Q.graph_mst(spark, sf_dir).first()
    print(
        f"minimum spanning forest: {mst.mst_edges} edges / "
        f"{mst.n_components} components, total weight {mst.mst_weight}"
    )

    walks = Q.graph_node2vec_walks(spark, sf_dir)
    print("node2vec most-visited parts:")
    for r in walks.limit(3).collect():
        print(f"  part {r.id}: {r.visits} visits")

    spark.stop()


if __name__ == "__main__":
    main()
