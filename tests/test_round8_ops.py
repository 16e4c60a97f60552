"""Round-8 tests: the hub-capped motif census (exact/capped split —
VERDICT r7 item 2), its mode consistency invariants, and the ADVICE r7
low-severity guards (GN convergence, retention-halflife empty input)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR as SF


def _k4_plus_star(spark, hub_deg=20):
    """K4 on {0,1,2,3} plus a hub vertex 100 adjacent to 20 spokes
    200..219 — a closed-form graph where the cap must drop wedges at
    the hub and nowhere else."""
    import pyspark.sql.functions as F

    k4 = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (1, 3)]
    star = [(100, 200 + i) for i in range(hub_deg)]
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in k4 + star], "src long, dst long"
    )


def test_motif_census_exact_k4(spark):
    """Closed form on K4: 12 wedges, all closed (4 triangles),
    3 squares, nothing dropped."""
    from graphem_rapids_spark.analytics import motif_census

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (1, 3)], "src long, dst long"
    )
    row = motif_census(e, cap=0).collect()[0]
    assert (
        row["n_wedges"],
        row["n_closed"],
        row["n_triangles"],
        row["n_squares"],
        row["n_wedges_dropped"],
    ) == (12, 12, 4, 3, 0)


def test_motif_census_capped_closed_form(spark):
    """Cap=8 on K4+star(20): wedges/triangles stay EXACT (12 + C(20,2)
    = 202 wedges, 4 triangles), the hub keeps its 8 lowest-id spokes
    (C(8,2)=28 wedge pairs kept, C(20,2)-C(8,2)=162 dropped), and
    squares stay 3 (the star closes none)."""
    from graphem_rapids_spark.analytics import motif_census

    row = motif_census(_k4_plus_star(spark), cap=8).collect()[0]
    assert row["n_wedges"] == 12 + 190
    assert row["n_triangles"] == 4
    assert row["n_closed"] == 12
    assert row["n_squares"] == 3
    assert row["n_wedges_dropped"] == 190 - 28


def test_motif_census_mode_consistency(spark):
    """On the sf0.001 co-purchase graph: exact and capped modes must
    agree on the exact columns (wedges, closed, triangles); capped
    squares are a lower bound; dropped + enumerated == total wedge
    pairs is NOT an identity (kept pairs at capped centers still pair
    kept neighbors), but dropped must be positive once any degree
    exceeds the cap and zero when none does."""
    from graphem_rapids_spark.analytics import motif_census
    from graphem_rapids_spark.queries import copurchase_edges

    e = copurchase_edges(spark, SF)
    exact = motif_census(e, cap=0).collect()[0]
    capped = motif_census(e, cap=4).collect()[0]
    assert capped["n_wedges"] == exact["n_wedges"]
    assert capped["n_closed"] == exact["n_closed"]
    assert capped["n_triangles"] == exact["n_triangles"]
    assert capped["n_squares"] <= exact["n_squares"]
    max_deg = (
        e.selectExpr("src AS v")
        .unionAll(e.selectExpr("dst AS v"))
        .groupBy("v")
        .count()
        .agg({"count": "max"})
        .collect()[0][0]
    )
    if max_deg > 4:
        assert capped["n_wedges_dropped"] > 0
    else:
        assert capped["n_wedges_dropped"] == 0
    # a cap above the max degree is the exact census
    wide = motif_census(e, cap=int(max_deg)).collect()[0]
    assert tuple(wide) == tuple(exact)


def test_motif_census_auto_threshold(spark):
    """Auto mode on a tiny graph stays exact (dropped == 0)."""
    from graphem_rapids_spark.analytics import motif_census

    row = motif_census(_k4_plus_star(spark), cap=None).collect()[0]
    assert row["n_wedges_dropped"] == 0


def test_hub_fixture_is_skewed(spark):
    """The capped-census oracle fixture must actually be hub-heavy:
    its wedge-pair volume must dwarf the co-purchase graph's and the
    forced cap must drop most of it."""
    from graphem_rapids_spark.queries import (
        _MOTIF_CAP,
        graph_motif_census_capped,
    )

    row = graph_motif_census_capped(spark, SF).collect()[0]
    assert row["n_wedges_dropped"] > 0
    assert row["n_wedges_dropped"] < row["n_wedges"]
    assert row["n_triangles"] > 0  # supplier triangles close
    assert _MOTIF_CAP >= 2


def test_retention_halflife_empty_events(spark):
    """ADVICE r7: an empty events table must yield the oracle's
    (0, 0.0, 0.0, 0.0) row, not TypeError(int(None))."""
    import pyspark.sql.functions as F

    from graphem_rapids_spark import queries as Q

    empty = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )
    orig = Q._events
    Q._events = lambda spark, sf_dir: empty.withColumn(
        "ts", F.lit(0).cast("long")
    ).select("event_id", "user_id", "ts", "event_type")
    try:
        rows = Q.events_retention_halflife(spark, SF).collect()
    finally:
        Q._events = orig
    assert len(rows) == 1
    assert tuple(rows[0]) == (0, 0.0, 0.0, 0.0)


def test_gn_rounds_derived():
    """ADVICE r7: the GN unroll constant must derive from _CC_ROUNDS,
    not restate it."""
    from graphem_rapids_spark import queries as Q

    assert Q._GN_CC_ROUNDS == Q._CC_ROUNDS + 8
