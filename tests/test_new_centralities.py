"""Round-4 kernels: Katz, HITS, deterministic random walks.

Each is registry-oracled end-to-end (test_oracle_parity); these tests
pin the ALGORITHMS on small graphs with independent references —
driver-side numpy fixed-point for Katz/HITS, direct trajectory
validation for walks.
"""

from __future__ import annotations

import numpy as np
import pytest

from graphem_rapids_spark.analytics import hits, katz_centrality, random_walks


@pytest.fixture(scope="module")
def path_graph(spark):
    # path 0-1-2-3-4
    return spark.createDataFrame(
        [(i, i + 1) for i in range(4)], "src long, dst long"
    )


def test_katz_matches_numpy_fixed_point(spark, path_graph):
    n, alpha, iters = 5, 0.05, 8
    A = np.zeros((n, n))
    for i in range(4):
        A[i, i + 1] = A[i + 1, i] = 1.0
    x = np.ones(n)
    for _ in range(iters):
        x = 1.0 + alpha * A @ x
    got = {
        r.id: r.value
        for r in katz_centrality(path_graph, alpha=alpha, max_iter=iters).collect()
    }
    for i in range(n):
        assert got[i] == pytest.approx(x[i], rel=1e-12)
    # symmetry of the path
    assert got[0] == pytest.approx(got[4])
    assert got[1] == pytest.approx(got[3])
    # interior vertices more central
    assert got[2] > got[1] > got[0]


def test_hits_matches_numpy_power_iteration(spark):
    # bipartite: customers {0,1,2} → parts {10, 11}; 0 buys both
    edges = spark.createDataFrame(
        [(0, 10), (0, 11), (1, 10), (2, 11)], "src long, dst long"
    )
    rows = hits(edges, max_iter=4).collect()
    got = {(r.role, r.id): r.score for r in rows}
    hubs = np.array([1.0, 1.0, 1.0])  # customers 0,1,2
    M = np.array([[1.0, 1.0], [1.0, 0.0], [0.0, 1.0]])  # customer×part
    a = None
    for _ in range(4):
        a = M.T @ hubs
        hubs = M @ a
    a = a / a.max()
    hubs = hubs / hubs.max()
    assert got[("hub", 0)] == pytest.approx(hubs[0])
    assert got[("hub", 1)] == pytest.approx(hubs[1])
    assert got[("authority", 10)] == pytest.approx(a[0])
    assert got[("authority", 11)] == pytest.approx(a[1])
    # the two-part buyer is the best hub; symmetric parts tie
    assert got[("hub", 0)] == 1.0
    assert got[("authority", 10)] == got[("authority", 11)] == 1.0


def test_random_walks_trajectories_are_valid_and_deterministic(spark, path_graph):
    seeds = spark.createDataFrame([(0,), (2,)], "id long")
    out = random_walks(path_graph, seeds, steps=5, reps=3, seed=7)
    rows = [(r.walker, r.step, r.id) for r in out.collect()]
    # every walker visits exactly steps+1 positions
    by_walker: dict = {}
    for w, s, v in rows:
        by_walker.setdefault(w, {})[s] = v
    assert len(by_walker) == 6  # 2 seeds × 3 reps
    adj = {(i, i + 1) for i in range(4)} | {(i + 1, i) for i in range(4)}
    for w, path in by_walker.items():
        assert sorted(path) == list(range(6))
        for s in range(5):
            assert (path[s], path[s + 1]) in adj, f"walker {w} broke an edge"
    # bit-determinism across reruns
    again = [
        (r.walker, r.step, r.id)
        for r in random_walks(path_graph, seeds, steps=5, reps=3, seed=7).collect()
    ]
    assert sorted(again) == sorted(rows)
    # different seed → different trajectories (with overwhelming odds)
    other = [
        (r.walker, r.step, r.id)
        for r in random_walks(path_graph, seeds, steps=5, reps=3, seed=8).collect()
    ]
    assert sorted(other) != sorted(rows)
