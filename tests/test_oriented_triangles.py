"""Degree-oriented triangle enumeration (compact-forward) must agree
with the id-canonical 3-join on every graph — it is a pure physical
optimization — and k_truss must pick it automatically on skewed
graphs while keeping identical results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.analytics import (
    TRIANGLE_SKEW_RATIO,
    k_truss,
    oriented_triangles,
)


def _canonical_triangles(edges):
    e1 = edges.select(F.col("src").alias("a"), F.col("dst").alias("b"))
    e2 = edges.select(F.col("src").alias("b"), F.col("dst").alias("c"))
    e3 = edges.select(F.col("src").alias("a"), F.col("dst").alias("c"))
    return e1.join(e2, "b").join(e3, ["a", "c"])


def _tri_set(df):
    return {tuple(sorted((r[0], r[1], r[2]))) for r in df.collect()}


@pytest.fixture(scope="module")
def skewed_graph(spark):
    """Hub 0 connected to 1..30; triangles (0,i,i+1) for odd i ≤ 11;
    bare spokes 13..30 (in no triangle); an off-hub triangle
    (40,41,42). Hub degree 30 vs avg ≈ 2.3 → max/avg ≈ 13, above
    TRIANGLE_SKEW_RATIO."""
    edges = [(0, i) for i in range(1, 31)]
    edges += [(i, i + 1) for i in range(1, 12, 2)]
    edges += [(40, 41), (41, 42), (40, 42)]
    return spark.createDataFrame(edges, "src long, dst long")


def test_oriented_matches_canonical_on_skewed(spark, skewed_graph):
    got = _tri_set(oriented_triangles(skewed_graph))
    want = _tri_set(_canonical_triangles(skewed_graph))
    assert got == want and len(want) == 7  # 6 hub triangles + 1 off-hub


def test_oriented_matches_canonical_on_regular(spark):
    # 3-regular prism graph: two triangles + a matching
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (0, 3), (1, 4), (2, 5)]
    df = spark.createDataFrame(edges, "src long, dst long")
    assert _tri_set(oriented_triangles(df)) == _tri_set(_canonical_triangles(df))


def test_ktruss_same_result_on_skewed_graph(spark, skewed_graph):
    # skew probe fires (hub factor >= ratio) AND result equals the
    # truss semantics: 3-truss = every edge in >= 1 triangle
    deg = (
        skewed_graph.select(F.col("src").alias("v"))
        .unionAll(skewed_graph.select(F.col("dst").alias("v")))
        .groupBy("v").agg(F.count("*").alias("d"))
        .agg(F.max("d").alias("mx"), F.avg("d").alias("av")).first()
    )
    assert deg["mx"] / deg["av"] >= TRIANGLE_SKEW_RATIO
    t3 = {(r.src, r.dst) for r in k_truss(skewed_graph, k=3).collect()}
    tri_edges = set()
    for a, b, c in _tri_set(_canonical_triangles(skewed_graph)):
        tri_edges |= {(a, b), (b, c), (a, c)}
    assert t3 == tri_edges
