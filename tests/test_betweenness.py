"""Distributed Brandes betweenness vs networkx exact (the reference's
own betweenness kernel, ``graphem_rapids/benchmark.py:77-80``).

The oracle-parity tree check pins the σ=1 case; here an Erdős–Rényi
graph exercises multi-path σ propagation and the backward σ_v/σ_w
ratios, and a sampled-source run checks the n/k rescale wiring.
"""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.analytics import betweenness_sampled


@pytest.fixture(scope="module")
def er_graph(spark):
    G = nx.gnp_random_graph(40, 0.12, seed=7)
    edges = spark.createDataFrame(
        [(int(min(u, v)), int(max(u, v))) for u, v in G.edges()], "src long, dst long"
    )
    return G, edges


def test_exact_matches_networkx(spark, er_graph):
    G, edges = er_graph
    got = {
        r.id: r.value for r in betweenness_sampled(edges, 40, normalized=True).collect()
    }
    want = nx.betweenness_centrality(G, normalized=True)
    assert set(got) == set(range(40))
    for i in range(40):
        assert got[i] == pytest.approx(want[i], abs=1e-9), f"vertex {i}"


def test_sampled_rescale_is_unbiased_shape(spark, er_graph):
    G, edges = er_graph
    sources = spark.range(40).filter(F.col("id") % 2 == 0).select(F.col("id").cast("long"))
    got = {
        r.id: r.value
        for r in betweenness_sampled(edges, 40, sources=sources, normalized=True).collect()
    }
    # k=20 of 40 sources, rescaled ×2: exact on vertex-transitive pairs
    # isn't guaranteed, but values must be finite, non-negative, and
    # correlate strongly with the exact ranking
    want = nx.betweenness_centrality(G, normalized=True)
    assert all(v >= 0 for v in got.values())
    top_exact = sorted(want, key=want.get, reverse=True)[:5]
    top_sampled = sorted(got, key=got.get, reverse=True)[:10]
    assert len(set(top_exact) & set(top_sampled)) >= 3


def test_load_sampled_matches_networkx(spark, er_graph):
    """analytics.load_sampled vs nx.load_centrality — the A6 scale
    graduation (VERDICT r5 item 8): equal-split accumulation, no /2
    for undirected, exact to 1e-9 via the 2^-40 fixed point."""
    from graphem_rapids_spark.analytics import load_sampled

    G, edges = er_graph
    got = {r.id: r.value for r in load_sampled(edges, 40, normalized=True).collect()}
    want = nx.load_centrality(G, normalized=True)
    assert set(got) == set(range(40))
    for i in range(40):
        assert got[i] == pytest.approx(want[i], abs=1e-9), f"vertex {i}"


def test_load_sampled_tree_closed_form(spark):
    """On a tree normalized load == normalized betweenness exactly
    (single shortest paths: every npred = 1 and every sigma ratio =
    1, and BOTH normalized conventions are delta_sum/((n-1)(n-2)) —
    nx only halves betweenness in the UNnormalized branch)."""
    from graphem_rapids_spark.analytics import betweenness_sampled, load_sampled

    n = 31
    edges = spark.createDataFrame(
        [(int((i - 1) // 2), i) for i in range(1, n)], "src long, dst long"
    )
    lc = {r.id: r.value for r in load_sampled(edges, n, normalized=True).collect()}
    bc = {r.id: r.value for r in betweenness_sampled(edges, n, normalized=True).collect()}
    for i in range(n):
        assert lc[i] == pytest.approx(bc[i], abs=1e-9), f"vertex {i}"
