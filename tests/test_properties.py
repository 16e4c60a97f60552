"""Property-based invariants (hypothesis) for the pure kernels and —
with a small example budget — the core Spark canonicalization.

Pure targets run hundreds of cases for free; Spark targets are capped
(max_examples small, no deadline) because each example is a job."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from graphem_rapids_spark.pipeline.similarity import plan_lsh_geometry


# ------------------------------------------------------------- pure
@given(
    n=st.integers(min_value=1, max_value=10**12),
    threshold=st.floats(min_value=0.05, max_value=0.999),
)
def test_lsh_geometry_always_bounded(n, threshold):
    bands, planes = plan_lsh_geometry(n, threshold)
    assert 8 <= bands <= 64
    assert 4 <= planes <= 24
    # expected bucket population stays bounded once planes saturate:
    # below the 24-plane cap, buckets ≈ n/2^planes ≤ 256
    if planes < 24:
        assert n / (1 << planes) <= 256


@given(
    n=st.integers(min_value=100, max_value=10**9),
    t1=st.floats(min_value=0.1, max_value=0.5),
    t2=st.floats(min_value=0.6, max_value=0.99),
)
def test_lsh_geometry_monotone_in_threshold(n, t1, t2):
    """A more selective (higher-cosine) threshold never needs more
    bands at the same n — collisions get more likely, not less."""
    b_loose, p1 = plan_lsh_geometry(n, t1)
    b_tight, p2 = plan_lsh_geometry(n, t2)
    assert p1 == p2  # planes depend only on n
    assert b_tight <= b_loose


@given(seed=st.integers(min_value=0, max_value=2**31 - 1))
def test_minhash_params_deterministic_and_valid(seed):
    from graphem_rapids_spark.pipeline.dedup import _MERSENNE31, _minhash_params

    p1 = _minhash_params(16, seed)
    p2 = _minhash_params(16, seed)
    assert p1 == p2
    assert all(1 <= a < _MERSENNE31 and 0 <= b < _MERSENNE31 for a, b in p1)


@given(
    vals=st.lists(
        st.one_of(
            st.none(),
            st.integers(min_value=-(2**62), max_value=2**62),
            st.floats(allow_infinity=False),
            st.text(max_size=20),
        ),
        max_size=6,
    )
)
def test_oracle_canon_total_and_stable(vals):
    """The harness canon must accept any cell value and be a pure
    function (same input → same string) — a canon that throws or
    wobbles corrupts the correctness gate."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from oracle_check import canon

    a = canon(tuple(vals))
    b = canon(tuple(vals))
    assert isinstance(a, str) and a == b


# ------------------------------------------------------------ spark
edge_lists = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)
    ),
    min_size=1,
    max_size=20,
)


@settings(
    max_examples=8, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(pairs=edge_lists)
def test_canonicalize_idempotent_and_invariant(spark, pairs):
    from graphem_rapids_spark.graph.canon import canonicalize_edges

    df = spark.createDataFrame(pairs, "src long, dst long")
    once = canonicalize_edges(df)
    rows = {(r.src, r.dst) for r in once.collect()}
    # canonical: src < dst, no self loops, closed under reordering
    assert all(s < d for s, d in rows)
    twice = {(r.src, r.dst) for r in canonicalize_edges(once).collect()}
    assert twice == rows
    # orientation-insensitive: the mirrored input canonicalizes the same
    mirrored = spark.createDataFrame([(b, a) for a, b in pairs], "src long, dst long")
    assert {(r.src, r.dst) for r in canonicalize_edges(mirrored).collect()} == rows


@settings(
    max_examples=6, deadline=None, suppress_health_check=list(HealthCheck)
)
@given(pairs=edge_lists)
def test_degrees_sum_to_twice_edges(spark, pairs):
    from graphem_rapids_spark.graph.canon import canonicalize_edges, vertex_degrees

    e = canonicalize_edges(spark.createDataFrame(pairs, "src long, dst long"))
    m = e.count()
    total = vertex_degrees(e).agg({"degree": "sum"}).first()[0]
    # all-self-loop inputs canonicalize to zero edges → sum is NULL
    assert (total or 0) == 2 * m
