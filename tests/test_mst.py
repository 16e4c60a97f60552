"""Borůvka minimum spanning forest: exact-MST agreement with a
driver-side Kruskal oracle on small deterministic graphs, spanning
invariants at sf0.001, and the multi-component case (cross-engine hash
parity for graph_mst is covered by tests/test_oracle_parity.py and the
driver gate)."""

from pyspark.sql import functions as F

from graphem_rapids_spark.analytics import minimum_spanning_forest
from graphem_rapids_spark.queries import graph_mst

SF = "/root/testdata/sf0.001"


def _kruskal(edges):
    """Driver-side exact MST via Kruskal with the same strict total
    order (w, src, dst). Returns (forest edge set, n_components)."""
    verts = {v for s, d, _ in edges for v in (s, d)}
    parent = {v: v for v in verts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for s, d, w in sorted(edges, key=lambda e: (e[2], e[0], e[1])):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            forest.add((s, d, w))
    ncomp = len({find(v) for v in verts})
    return forest, ncomp


def _run(spark, edges, rounds=5, jumps=8):
    wedges = spark.createDataFrame(edges, "src long, dst long, weight long")
    comp, mst = minimum_spanning_forest(wedges, rounds=rounds, jumps=jumps)
    got = {(r["esrc"], r["edst"], r["w"]) for r in mst.collect()}
    ncomp = comp.select("lbl").distinct().count()
    return got, ncomp


def test_mst_matches_kruskal_path(spark):
    edges = [(i, i + 1, 10 - i) for i in range(9)]  # path, decreasing w
    want, wc = _kruskal(edges)
    got, gc = _run(spark, edges)
    assert got == want and gc == wc == 1


def test_mst_matches_kruskal_cycle_plus_chord(spark):
    edges = [(0, 1, 5), (1, 2, 3), (2, 3, 4), (0, 3, 2), (0, 2, 7), (1, 3, 6)]
    want, wc = _kruskal(edges)
    got, gc = _run(spark, edges)
    assert got == want and gc == wc == 1
    assert len(got) == 3  # spanning tree of 4 vertices


def test_mst_two_components(spark):
    edges = [(0, 1, 1), (1, 2, 2), (0, 2, 3), (10, 11, 1), (11, 12, 5), (10, 12, 4)]
    want, wc = _kruskal(edges)
    got, gc = _run(spark, edges)
    assert got == want and gc == wc == 2
    assert len(got) == 4  # 6 vertices - 2 components


def test_mst_duplicate_weights_unique_by_id_order(spark):
    # all weights equal: the (src, dst) tie-break must still produce
    # the unique Kruskal forest under the same total order
    edges = [(0, 1, 7), (1, 2, 7), (0, 2, 7), (2, 3, 7), (1, 3, 7)]
    want, wc = _kruskal(edges)
    got, gc = _run(spark, edges)
    assert got == want and gc == wc == 1


def test_graph_mst_spanning_invariant_sf(spark):
    row = graph_mst(spark, SF).collect()[0]
    # converged Borůvka forest: |E| = |V| - |components|
    assert row["mst_edges"] == row["n_vertices"] - row["n_components"]
    assert row["n_vertices"] > 0 and row["mst_weight"] > 0
