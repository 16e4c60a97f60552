"""Luby MIS: agreement with the sequential greedy MIS under the same
priority order, independence + maximality invariants, and convergence
of the registry query (cross-engine hash parity is covered by
tests/test_oracle_parity.py and the driver gate)."""

from graphem_rapids_spark.analytics import maximal_independent_set
from graphem_rapids_spark.functions import mix_py, MIX_M
from graphem_rapids_spark.queries import graph_mis_luby

SF = "/root/testdata/sf0.001"
SEED = 17


def _greedy_mis(edges):
    """Sequential greedy over vertices sorted by the same integer
    priority key — the lexicographically-first MIS Luby converges to."""
    verts = sorted({v for e in edges for v in e})
    adj = {v: set() for v in verts}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    key = lambda v: round(mix_py(v, SEED) * MIX_M) * 2_147_483_648 + v  # noqa: E731
    mis = set()
    for v in sorted(verts, key=key):
        if not (adj[v] & mis):
            mis.add(v)
    return mis, adj


def _run(spark, edges, rounds=8):
    df = spark.createDataFrame(edges, "src long, dst long")
    mis, und = maximal_independent_set(df, rounds=rounds, seed=SEED)
    return {r["id"] for r in mis.collect()}, und.count()


def test_mis_matches_greedy_small_graphs(spark):
    cases = [
        [(0, 1), (1, 2), (2, 3), (3, 4)],                       # path
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)],       # 2 triangles
        [(i, j) for i in range(6) for j in range(i + 1, 6)],    # K6
        [(0, i) for i in range(1, 8)],                          # star
    ]
    for edges in cases:
        want, adj = _greedy_mis(edges)
        got, undecided = _run(spark, edges)
        assert undecided == 0, edges
        assert got == want, (edges, got, want)
        # independence
        for a, b in edges:
            assert not (a in got and b in got)
        # maximality
        for v in adj:
            assert v in got or (adj[v] & got)


def test_graph_mis_luby_converges_sf(spark):
    row = graph_mis_luby(spark, SF).collect()[0]
    assert row["undecided"] == 0
    assert 0 < row["mis_size"] < row["n_vertices"]
