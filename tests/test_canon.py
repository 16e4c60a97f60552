"""Canonicalization / symmetrize / relabel / degree — exact oracles.

Mirrors reference invariants: upper-triangle canon
(embedder_pytorch.py:220-245), mirror+dedup (datasets.py:339-352),
contiguous relabel (datasets.py:148-166), degrees (generators.py:52-64).
"""

from pyspark.sql import functions as F

from graphem_rapids_spark.graph.canon import (
    canonicalize_edges,
    relabel_contiguous,
    symmetrize_edges,
    vertex_degrees,
    vertices_from_edges,
)


def test_canonicalize_dedup_selfloop_reverse(spark):
    raw = spark.createDataFrame(
        [(1, 0), (0, 1), (2, 2), (3, 1), (1, 3), (1, 3)], "src long, dst long"
    )
    got = sorted(tuple(r) for r in canonicalize_edges(raw).collect())
    assert got == [(0, 1), (1, 3)]


def test_symmetrize_doubles(k4):
    sym = symmetrize_edges(canonicalize_edges(k4))
    assert sym.count() == 12
    # symmetric: (a,b) present iff (b,a) present
    s = {tuple(r) for r in sym.collect()}
    assert all((b, a) in s for a, b in s)


def test_vertices_from_edges(k4):
    ids = sorted(r.id for r in vertices_from_edges(k4).collect())
    assert ids == [0, 1, 2, 3]


def test_relabel_contiguous(spark):
    raw = spark.createDataFrame([(10, 30), (30, 70), (10, 70)], "src long, dst long")
    edges, mapping = relabel_contiguous(raw)
    got = sorted(tuple(r) for r in edges.collect())
    assert got == [(0, 1), (0, 2), (1, 2)]
    m = {r.old_id: r.new_id for r in mapping.collect()}
    assert m == {10: 0, 30: 1, 70: 2}


def test_degrees_k4(k4):
    deg = {r.id: r.degree for r in vertex_degrees(canonicalize_edges(k4)).collect()}
    assert deg == {0: 3, 1: 3, 2: 3, 3: 3}


def test_degrees_with_isolated(spark, path10):
    verts = spark.range(12).select(F.col("id").cast("long"))
    deg = {r.id: r.degree for r in vertex_degrees(path10, verts).collect()}
    assert deg[0] == 1 and deg[5] == 2 and deg[10] == 0 and deg[11] == 0
