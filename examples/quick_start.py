"""Quick start — the reference's headline workflow
(``examples/quick_start_rapids.py`` ethos, README.md:170-189):
generate a graph, embed it, pick influence seeds, evaluate the spread,
and report centrality correlations. Runs in ~1 min on local mode.

Usage: python examples/quick_start.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark import (  # noqa: E402
    create_graphem,
    erdos_renyi_graph,
    estimated_influence,
    get_backend_info,
    get_spark,
    graphem_seed_selection,
    random_seed_baseline,
)


def main() -> None:
    spark = get_spark(app_name="graphem-quick-start")
    print("engine:", get_backend_info(spark)["spark_version"])

    # 1. a 500-vertex random graph (distributed generator, seeded)
    g = erdos_renyi_graph(n=500, p=0.03, seed=42, spark=spark)
    print("edges:", g.edges.count())

    # 2. spectral init + force-directed layout
    emb = create_graphem(g, n_components=2, seed=42, sample_size=128)

    # 3. influence seeds = radial top-k after layout
    seeds = graphem_seed_selection(emb, k=10, num_iterations=5)
    seed_ids = [r.id for r in seeds.collect()]
    print("seeds:", seed_ids)

    # 4. evaluate with Independent Cascade vs a random baseline
    inf = estimated_influence(g.edges, seed_ids, p=0.1, trials=10, seed=7)
    rnd = random_seed_baseline(g.edges, g.n_vertices, k=10, p=0.1, trials=10, seed=7)
    print(f"graphem influence: {inf:.1f}   random baseline: {rnd:.1f}")

    # 5. does radial distance track centrality? (the reference's core
    # claim) — distributed Brandes betweenness + Spearman rank corr
    from graphem_rapids_spark import betweenness_sampled, spearman_correlation

    radii = emb.radial_distances()
    bc = betweenness_sampled(g.edges, g.n_vertices)
    joined = radii.join(bc.withColumnRenamed("value", "betweenness"), "id")
    rho = spearman_correlation(joined, "radius", "betweenness")
    print(f"spearman(radius, betweenness) = {rho:.3f}")

    spark.stop()


if __name__ == "__main__":
    main()
