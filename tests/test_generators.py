"""Generator invariants (reference tests/test_generators.py:22-189 via
SURVEY.md §5 / FIXTURES.md): canonical form, symmetry-by-construction,
zero diagonal, seed determinism, structural properties."""

import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.graph import generators as G


def _edge_set(g):
    return sorted(tuple(r) for r in g.edges.collect())


def _assert_canonical(g):
    e = g.edges
    assert e.filter(F.col("src") >= F.col("dst")).count() == 0
    assert e.count() == e.distinct().count()
    mx = e.agg(F.max(F.greatest("src", "dst"))).first()[0]
    if mx is not None:
        assert mx < g.n_vertices


def test_erdos_renyi_deterministic(spark):
    g1 = G.erdos_renyi_graph(50, 0.1, seed=42, spark=spark)
    g2 = G.erdos_renyi_graph(50, 0.1, seed=42, spark=spark)
    g3 = G.erdos_renyi_graph(50, 0.1, seed=7, spark=spark)
    _assert_canonical(g1)
    assert _edge_set(g1) == _edge_set(g2)
    assert _edge_set(g1) != _edge_set(g3)


def test_erdos_renyi_density(spark):
    g = G.erdos_renyi_graph(200, 0.05, seed=1, spark=spark)
    m = g.edges.count()
    expected = 0.05 * 200 * 199 / 2
    assert 0.6 * expected < m < 1.4 * expected


def test_pair_decode_exhaustive(spark):
    # pair index decode must enumerate exactly C(n,2) distinct (i<j)
    for n in (2, 3, 7, 20):
        rows = sorted(tuple(r)[1:] for r in G._pairs(spark, n).collect())
        want = sorted((i, j) for i in range(n) for j in range(i + 1, n))
        assert rows == want, f"n={n}"


def test_sbm_labels_and_density(spark):
    g = G.generate_sbm(n_per_block=15, num_blocks=3, p_in=0.8, p_out=0.05, labels=True, seed=42, spark=spark)
    assert g.n_vertices == 45
    labels = {r.id: r.label for r in g.labels.collect()}
    assert sorted(set(labels.values())) == [0, 1, 2]
    within = g.edges.filter((F.col("src") / 15).cast("long") == (F.col("dst") / 15).cast("long")).count()
    between = g.edges.count() - within
    # 3 blocks: 315 within-pairs at 0.8, 675 between-pairs at 0.05
    assert within > 5 * between


def test_road_network(spark):
    g = G.generate_road_network(5, 4, spark=spark)
    assert g.n_vertices == 20
    assert g.edges.count() == 4 * 4 + 5 * 3  # right + down edges
    deg = (
        g.edges.select(F.explode(F.array("src", "dst")).alias("id"))
        .groupBy("id").count().collect()
    )
    degs = {r.id: r["count"] for r in deg}
    assert degs[0] == 2 and degs[6] == 4  # corner 2, interior 4


def test_balanced_tree(spark):
    g = G.generate_balanced_tree(2, 4, spark=spark)
    assert g.n_vertices == 31 and g.edges.count() == 30
    _assert_canonical(g)


def test_caveman(spark):
    g = G.generate_caveman(5, 4, spark=spark)
    assert g.n_vertices == 20 and g.edges.count() == 5 * 6
    _assert_canonical(g)


def test_bipartite_no_within_side(spark):
    g = G.generate_bipartite_graph(10, 20, seed=3, spark=spark)
    assert g.n_vertices == 30
    bad = g.edges.filter(
        ((F.col("src") < 10) & (F.col("dst") < 10))
        | ((F.col("src") >= 10) & (F.col("dst") >= 10))
    ).count()
    assert bad == 0


def test_geometric_matches_bruteforce(spark):
    g = G.generate_geometric(40, radius=0.3, dim=2, seed=42, spark=spark)
    _assert_canonical(g)
    # brute-force oracle from the same hash-coordinates
    pts = {
        r.id: (r.x0, r.x1)
        for r in spark.range(40)
        .select(
            "id",
            G._hash_uniform(F.col("id"), 42000).alias("x0"),
            G._hash_uniform(F.col("id"), 42001).alias("x1"),
        )
        .collect()
    }
    want = sorted(
        (i, j)
        for i in range(40)
        for j in range(i + 1, 40)
        if (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2 <= 0.3**2
    )
    assert _edge_set(g) == want


@pytest.mark.parametrize(
    "fn,kwargs,n",
    [
        (G.generate_ba, dict(n=30, m=3, seed=42), 30),
        (G.generate_ws, dict(n=20, k=4, p=0.3, seed=42), 20),
        (G.generate_power_cluster, dict(n=30, m=3, p=0.5, seed=42), 30),
        (G.generate_random_regular, dict(n=50, d=4, seed=42), 50),
        (G.generate_scale_free, dict(n=50, seed=42), 50),
        (G.generate_relaxed_caveman, dict(l=5, k=4, p=0.1, seed=42), 20),
    ],
)
def test_driver_generators(spark, fn, kwargs, n):
    g = fn(spark=spark, **kwargs)
    assert g.n_vertices == n
    _assert_canonical(g)
    g2 = fn(spark=spark, **kwargs)
    assert _edge_set(g) == _edge_set(g2)


def test_random_regular_degree(spark):
    g = G.generate_random_regular(n=50, d=4, seed=42, spark=spark)
    deg = (
        g.edges.select(F.explode(F.array("src", "dst")).alias("id"))
        .groupBy("id").count().collect()
    )
    assert all(r["count"] == 4 for r in deg) and len(deg) == 50
