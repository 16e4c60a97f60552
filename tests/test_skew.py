"""Salted-join / salted-collect correctness: identical results to the
unsalted forms on a deliberately skewed (zipf-ish) key distribution."""

from __future__ import annotations

from pyspark.sql import functions as F

from graphem_rapids_spark.skew import salted_collect_list, salted_join


def _skewed(spark, n=20000):
    # ~half the rows land on key 0 (the hot key), rest spread over 100
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, 0)
        .otherwise(F.pmod(F.col("id"), F.lit(100)))
        .alias("k"),
        F.col("id").alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    plain = big.join(small, "k").select("k", "v", "w")
    salted = salted_join(big, small, "k", n_salts=8).select("k", "v", "w")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).isEmpty()
    assert plain.exceptAll(salted).isEmpty()


def test_salted_join_left_outer(spark):
    big = _skewed(spark, 1000)
    small = spark.range(3).select(F.col("id").alias("k"), F.lit("x").alias("w"))
    plain = big.join(small, "k", "left").select("k", "v", "w")
    salted = salted_join(big, small, "k", n_salts=4, how="left").select("k", "v", "w")
    assert salted.exceptAll(plain).isEmpty() and plain.exceptAll(salted).isEmpty()


def test_salted_collect_list_same_multiset(spark):
    df = _skewed(spark, 5000)
    got = salted_collect_list(df, "k", "v", n_salts=16).collect()
    want = df.groupBy("k").agg(F.collect_list("v").alias("values")).collect()
    g = {r.k: sorted(r.values) for r in got}
    w = {r.k: sorted(r.values) for r in want}
    assert g == w
