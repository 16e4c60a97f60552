"""Embedding transform ops: int8 scalar quantization (reconstruction
bound) and Johnson–Lindenstrauss Rademacher projection (distance
preservation in expectation)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.pipeline.similarity import (
    jl_sign_matrix,
    project_jl,
    quantize_int8,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_quantize_int8_codes_and_reconstruction(emb):
    rows = quantize_int8(emb).join(emb, "vec_id").limit(50).collect()
    for r in rows:
        assert len(r.q) == len(r.embedding)
        assert all(-127 <= c <= 127 for c in r.q)
        # reconstruction error per element ≤ scale/2 (+ rounding of the
        # reported scale itself)
        for c, x in zip(r.q, r.embedding):
            assert abs(c * r.scale - x) <= r.scale / 2 + 1e-6


def test_quantize_int8_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.0] * 4), (2, [0.0, 2.0, -4.0, 1.0])],
        "vec_id long, embedding array<double>",
    )
    out = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert out[1].q == [0, 0, 0, 0]
    assert out[2].q == [0, 64, -127, 32]  # scale = 4/127


def test_jl_sign_matrix_deterministic_and_balanced():
    m = jl_sign_matrix(16, 64, seed=5)
    assert m == jl_sign_matrix(16, 64, seed=5)
    flat = [s for row in m for s in row]
    assert set(flat) == {1.0, -1.0}
    # mixer signs should be roughly balanced
    assert 0.4 < flat.count(1.0) / len(flat) < 0.6


def test_jl_projection_preserves_distances_on_average(emb):
    k, dim = 16, 64
    pairs = (
        project_jl(emb, k=k, dim=dim)
        .join(emb, "vec_id")
        .limit(40)
        .collect()
    )
    ratios = []
    for a in pairs[:20]:
        for b in pairs[20:]:
            d_orig = sum((x - y) ** 2 for x, y in zip(a.embedding, b.embedding))
            d_proj = sum((x - y) ** 2 for x, y in zip(a.proj, b.proj))
            if d_orig > 0:
                ratios.append(d_proj / d_orig)
    mean = sum(ratios) / len(ratios)
    # E[|proj diff|²] = |diff|²; k=16 gives wide per-pair variance but
    # the mean over 400 pairs concentrates
    assert 0.7 < mean < 1.3, mean
    # and individual pairs stay within a loose JL band
    assert sum(1 for r in ratios if 0.2 < r < 2.5) / len(ratios) > 0.9


def test_kmeans_int8_invariants(emb):
    from graphem_rapids_spark.pipeline.similarity import kmeans_int8

    out = kmeans_int8(emb, k=4, iters=2).collect()
    n_total = emb.count()
    assert 1 <= len(out) <= 4
    assert sum(r.n_members for r in out) == n_total
    assert all(r.inertia >= 0 for r in out)
    # centroids are valid int8-lattice points
    for r in out:
        assert all(-127 <= c <= 127 for c in r.centroid)
    # deterministic: a second run is bit-identical
    again = kmeans_int8(emb, k=4, iters=2).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_kmeans_int8_more_iters_not_worse(emb):
    from graphem_rapids_spark.pipeline.similarity import kmeans_int8

    i1 = sum(r.inertia for r in kmeans_int8(emb, k=4, iters=1).collect())
    i3 = sum(r.inertia for r in kmeans_int8(emb, k=4, iters=3).collect())
    # Lloyd on the integer lattice is monotone up to floor-rounding
    # noise; allow a 1% slack for the floor-mean quantization
    assert i3 <= i1 * 1.01


def test_kmeans_int8_empty_and_small_inputs(spark):
    from graphem_rapids_spark.pipeline.similarity import kmeans_int8

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="empty"):
        kmeans_int8(empty, k=4)
    # fewer rows than k: k clamps to n, every point its own cluster
    tiny = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vec_id long, embedding array<double>"
    )
    out = kmeans_int8(tiny, k=8, iters=1).collect()
    assert len(out) == 2
    assert sum(r.n_members for r in out) == 2
    assert all(r.inertia == 0 for r in out)
