"""scale.py — distributed global rank / dense index must be
bit-identical to the single-partition window formulation it replaces
(Spearman and relabel feed hash-gated oracles, so exactness is the
contract, not approximation)."""

import random

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from graphem_rapids_spark.analytics import rank_column, spearman_correlation
from graphem_rapids_spark.graph.canon import relabel_contiguous
from graphem_rapids_spark.scale import global_dense_index, global_mean_rank


def _window_mean_rank(df, col, out):
    w = Window.orderBy(F.col(col).asc())
    wt = Window.partitionBy(col)
    return df.withColumn(out, F.rank().over(w) + (F.count("*").over(wt) - 1) / 2.0)


@pytest.fixture(scope="module")
def tie_heavy(spark):
    # many ties, spread across partitions; values straddle range-partition
    # boundaries by construction (only 7 distinct values over 2000 rows)
    rng = random.Random(7)
    rows = [(i, rng.choice([0.5, 1.0, 1.0, 2.5, 2.5, 2.5, -3.0, 7.0])) for i in range(2000)]
    return spark.createDataFrame(rows, "id long, v double").repartition(8)


def test_global_mean_rank_matches_window(tie_heavy):
    got = {r.id: r.rk for r in global_mean_rank(tie_heavy, "v", "rk").collect()}
    want = {r.id: r.rk for r in _window_mean_rank(tie_heavy, "v", "rk").collect()}
    assert got == want


def test_rank_column_global_path_matches_window(tie_heavy):
    got = {r.id: r.rk for r in rank_column(tie_heavy, "v", "rk").collect()}
    want = {r.id: r.rk for r in _window_mean_rank(tie_heavy, "v", "rk").collect()}
    assert got == want


def test_all_equal_column(spark):
    df = spark.createDataFrame([(i, 4.0) for i in range(100)], "id long, v double")
    out = global_mean_rank(df, "v", "rk").select("rk").distinct().collect()
    assert [r.rk for r in out] == [(1 + 100) / 2.0]  # mean of 1..100


def test_dense_index_matches_row_number(spark):
    vals = [("n%04d" % i,) for i in range(0, 500, 3)]
    random.Random(3).shuffle(vals)
    df = spark.createDataFrame(vals, "orig string").repartition(8)
    got = {
        r.orig: r.idx for r in global_dense_index(df, "orig", "idx").collect()
    }
    want = {
        r.orig: r.idx
        for r in df.select(
            "orig",
            (F.row_number().over(Window.orderBy("orig")) - 1).cast("long").alias("idx"),
        ).collect()
    }
    assert got == want


def test_relabel_contiguous_still_dense_and_ordered(spark):
    edges = spark.createDataFrame(
        [(10, 70), (70, 30), (30, 10), (99, 10)], "src long, dst long"
    )
    relabeled, mapping = relabel_contiguous(edges)
    m = {r.old_id: r.new_id for r in mapping.collect()}
    # ascending old id -> 0..n-1
    assert m == {10: 0, 30: 1, 70: 2, 99: 3}
    pairs = {(r.src, r.dst) for r in relabeled.collect()}
    assert pairs == {(0, 1), (0, 2), (1, 2), (0, 3)}


def test_spearman_unchanged(spark):
    # perfect monotone relation with ties -> rho == 1 exactly
    df = spark.createDataFrame(
        [(float(i // 3), float((i // 3) ** 2)) for i in range(99)], "a double, b double"
    )
    assert spearman_correlation(df, "a", "b") == pytest.approx(1.0, abs=1e-12)
