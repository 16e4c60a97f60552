"""Tour of the synthetic graph generators — the reference's
``examples/graph_generator_example.py`` analog: generate each family,
print basic stats, and embed one of them.

Distributed generators (ER / SBM / bipartite / geometric / grid /
tree / caveman) scale to billions of edges (hash-Bernoulli /
closed-form edge enumeration — no driver materialization); the
networkx-backed ones (BA / WS / powerlaw / regular / scale-free)
keep the reference's own driver-side semantics, guarded by size.

Usage: python examples/graph_generators.py
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from graphem_rapids_spark import (  # noqa: E402
    create_graphem,
    erdos_renyi_graph,
    generate_ba,
    generate_bipartite_graph,
    generate_caveman,
    generate_geometric,
    generate_random_regular,
    generate_sbm,
    generate_ws,
    get_spark,
)
from graphem_rapids_spark.analytics import graph_stats  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="graphem-generators-tour")

    generators = [
        ("Erdős–Rényi", lambda: erdos_renyi_graph(n=400, p=0.03, seed=42, spark=spark)),
        ("SBM (4×100)", lambda: generate_sbm(n_per_block=100, num_blocks=4,
                                             p_in=0.3, p_out=0.01, seed=42, spark=spark)),
        ("bipartite", lambda: generate_bipartite_graph(n_top=200, n_bottom=200,
                                                       p=0.05, seed=42, spark=spark)),
        ("geometric", lambda: generate_geometric(n=400, radius=0.12, seed=42,
                                                 spark=spark)),
        ("caveman (16×25)", lambda: generate_caveman(l=16, k=25, spark=spark)),
        ("Barabási-Albert", lambda: generate_ba(n=400, m=2, seed=42, spark=spark)),
        ("Watts-Strogatz", lambda: generate_ws(n=400, k=4, p=0.1, seed=42, spark=spark)),
        ("random regular", lambda: generate_random_regular(n=400, d=4, seed=42,
                                                           spark=spark)),
    ]
    for name, make in generators:
        g = make()
        s = graph_stats(g.edges, g.n_vertices)
        print(f"{name:18s} n={s['n_vertices']:5d} m={s['n_edges']:6d} "
              f"avg_deg={s['avg_degree']:.2f} density={s['density']:.4f}")

    # embed one family end-to-end (spectral init + a few force steps)
    g = generate_sbm(n_per_block=100, num_blocks=4, p_in=0.3, p_out=0.01,
                     seed=42, spark=spark)
    emb = create_graphem(g, n_components=2, seed=42, sample_size=128)
    emb.run_layout(num_iterations=5)
    pos = emb.positions
    print("embedded:", pos.count(), "positions; schema:", pos.schema.simpleString())


if __name__ == "__main__":
    main()
