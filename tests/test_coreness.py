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


def test_weighted_sssp_matches_dijkstra(spark):
    # the fixed-round Bellman-Ford query equals true shortest paths
    # once converged — verify against networkx dijkstra at sf0.001
    import duckdb

    from graphem_rapids_spark.queries import graph_weighted_sssp

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{sf}/lineitem.parquet')")
    rows = con.execute("""
        WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem)
        SELECT a.l_partkey, b.l_partkey, count(*) FROM op a JOIN op b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey GROUP BY 1, 2
    """).fetchall()
    mx = max(w for _, _, w in rows)
    g = nx.Graph()
    for u, v, w in rows:
        g.add_edge(u, v, weight=mx + 1 - w)
    src = min(min(u, v) for u, v, _ in rows)
    want = nx.single_source_dijkstra_path_length(g, src)
    got = {r.id: r.dist for r in graph_weighted_sssp(spark, sf).collect()}
    assert got == want


def test_coreness_warns_when_not_converged(spark):
    import warnings as _w

    g = nx.erdos_renyi_graph(60, 0.1, seed=11)
    edges = [(min(u, v), max(u, v)) for u, v in g.edges() if u != v]
    e = _spark_edges(spark, edges)
    with _w.catch_warnings(record=True) as rec:
        _w.simplefilter("always")
        coreness(e, max_rounds=1).collect()
    assert any("not converged" in str(r.message) for r in rec)
