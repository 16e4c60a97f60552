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
