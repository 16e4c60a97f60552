"""Coreness (full k-core decomposition) via synchronous h-index
iteration: networkx core_number parity + invariants."""

from __future__ import annotations

import networkx as nx
import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.analytics import coreness, k_core


def _spark_edges(spark, edges):
    return spark.createDataFrame(edges, "src long, dst long")


@pytest.mark.parametrize(
    "gen",
    [
        lambda: nx.karate_club_graph(),
        lambda: nx.random_regular_graph(4, 50, seed=42),
        lambda: nx.erdos_renyi_graph(120, 0.06, seed=7),
        lambda: nx.balanced_tree(2, 6),
    ],
)
def test_coreness_matches_networkx(spark, gen):
    g = gen()
    g = nx.convert_node_labels_to_integers(g)
    edges = [(min(u, v), max(u, v)) for u, v in g.edges() if u != v]
    out = {r.id: r.core for r in coreness(_spark_edges(spark, edges)).collect()}
    assert out == nx.core_number(g)


def test_coreness_consistent_with_k_core(spark):
    g = nx.erdos_renyi_graph(80, 0.1, seed=3)
    edges = [(min(u, v), max(u, v)) for u, v in g.edges() if u != v]
    e = _spark_edges(spark, edges)
    cn = {r.id: r.core for r in coreness(e).collect()}
    k = 3
    members = {r.id for r in k_core(e, k).collect()}
    # the k-core members are exactly the vertices with core number >= k
    assert members == {v for v, c in cn.items() if c >= k}
