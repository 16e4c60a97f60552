"""Connected components: alternating large-star/small-star (O(log d)
rounds) vs min-label propagation (O(d)) — identical labels on graphs
with very different diameters, and networkx ground-truth parity.
Reference relies on CC for LCC extraction
(benchmarks/run_benchmarks.py:256-270)."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.analytics import (
    connected_components,
    largest_connected_component,
)


def _spark_edges(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


def _nx_components(g, n):
    lab = {}
    for comp in nx.connected_components(g):
        m = min(comp)
        for v in comp:
            lab[v] = m
    for v in range(n):
        lab.setdefault(v, v)
    return lab


@pytest.mark.parametrize(
    "gen,n",
    [
        # long diameter: the case min-label is O(n) rounds on and the
        # star algorithm collapses in O(log n)
        (lambda: nx.path_graph(200), 200),
        # SBM-ish: two dense blocks plus a bridge
        (
            lambda: nx.stochastic_block_model(
                [40, 40], [[0.3, 0.01], [0.01, 0.3]], seed=5
            ),
            80,
        ),
        # disconnected + isolated vertices (n exceeds max edge id)
        (lambda: nx.erdos_renyi_graph(60, 0.03, seed=9), 70),
        (lambda: nx.caveman_graph(6, 8), 48),
    ],
)
def test_star_cc_matches_minlabel_and_networkx(spark, gen, n):
    g = gen()
    g = nx.convert_node_labels_to_integers(g)
    edges = [(min(u, v), max(u, v)) for u, v in g.edges() if u != v]
    e = _spark_edges(spark, edges)
    want = _nx_components(g, n)
    # path_graph(200) with max_iter=50: min-label would NOT converge in
    # 50 rounds, star must — use it as the log-round evidence
    star = {
        r.id: r.component
        for r in connected_components(e, n, max_iter=20, algorithm="star").collect()
    }
    assert star == want
    minlabel = {
        r.id: r.component
        for r in connected_components(e, n, max_iter=250, algorithm="minlabel").collect()
    }
    assert minlabel == want


def test_cc_auto_switch_respects_threshold(spark, monkeypatch):
    from graphem_rapids_spark import session

    g = nx.caveman_graph(4, 5)
    edges = [(min(u, v), max(u, v)) for u, v in g.edges()]
    e = _spark_edges(spark, edges)
    want = _nx_components(g, 20)
    monkeypatch.setattr(session, "CC_STAR_MIN_VERTICES", 0)  # force star
    got = {r.id: r.component for r in connected_components(e, 20).collect()}
    assert got == want
    monkeypatch.setattr(session, "CC_STAR_MIN_VERTICES", 10**9)  # force minlabel
    got = {r.id: r.component for r in connected_components(e, 20).collect()}
    assert got == want
    with pytest.raises(ValueError):
        connected_components(e, 20, algorithm="bogus")


def test_lcc_extraction_unchanged(spark):
    # two components, sizes 5 (cycle) and 3 (triangle): LCC = the cycle
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4), (10, 11), (11, 12), (10, 12)]
    e = _spark_edges(spark, edges)
    lcc = largest_connected_component(e, 13)
    got = {(r.src, r.dst) for r in lcc.collect()}
    assert got == {(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)}


def test_label_propagation_caveman_cliques(spark):
    """LPA on disjoint 6-cliques: each clique collapses to one
    community labeled by its minimum id (deterministic min tie-break),
    and communities never span components."""
    from graphem_rapids_spark.analytics import label_propagation

    g = nx.caveman_graph(5, 6)
    edges = [(min(u, v), max(u, v)) for u, v in g.edges()]
    e = _spark_edges(spark, edges)
    got = {r.id: r.label for r in label_propagation(e, max_rounds=10).collect()}
    for c in range(5):
        members = set(range(c * 6, (c + 1) * 6))
        assert {got[v] for v in members} == {min(members)}


@pytest.mark.parametrize("k", [3, 4, 5])
def test_k_truss_matches_networkx(spark, k):
    from graphem_rapids_spark.analytics import k_truss

    for g in [nx.karate_club_graph(), nx.erdos_renyi_graph(60, 0.15, seed=4)]:
        g = nx.convert_node_labels_to_integers(g)
        edges = [(min(u, v), max(u, v)) for u, v in g.edges() if u != v]
        e = _spark_edges(spark, edges)
        want = {(min(u, v), max(u, v)) for u, v in nx.k_truss(g, k).edges()}
        got = {(r.src, r.dst) for r in k_truss(e, k).collect()}
        assert got == want


def test_harmonic_centrality_matches_networkx(spark):
    from graphem_rapids_spark.analytics import harmonic_centrality

    g = nx.karate_club_graph()
    edges = [(min(u, v), max(u, v)) for u, v in g.edges()]
    e = _spark_edges(spark, edges)
    got = {
        r.id: round(r.value, 9)
        for r in harmonic_centrality(e, n_vertices=34, max_depth=20).collect()
    }
    want = {v: round(x, 9) for v, x in nx.harmonic_centrality(g).items()}
    assert got == want
