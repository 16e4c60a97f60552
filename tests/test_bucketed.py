"""Bucketed edge tables eliminate the per-query shuffle — the plan
property that makes repeated graph analytics viable at 100 TB.

Pins: groupBy(bucket key) over the bucketed table has NO Exchange;
the identical aggregate over the same data as plain parquet has one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.graph.bucketed import (
    bucketed_degrees,
    write_bucketed_edges,
)

TABLE = "test_edges_bucketed"


def _n_exchanges(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


@pytest.fixture(scope="module")
def bucketed_table(spark, tmp_path_factory):
    edges = spark.range(20_000).select(
        (F.col("id") % 500).alias("src"), ((F.col("id") * 7 + 3) % 500).alias("dst")
    )
    write_bucketed_edges(edges, TABLE, buckets=8)
    yield TABLE
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")


def test_bucketed_agg_has_no_shuffle(spark, bucketed_table):
    deg = bucketed_degrees(spark, bucketed_table)
    assert _n_exchanges(deg) == 0, deg._jdf.queryExecution().executedPlan().toString()
    assert deg.count() == 500


def test_plain_parquet_agg_needs_shuffle(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("plain") / "edges.parquet")
    edges = spark.range(20_000).select(
        (F.col("id") % 500).alias("src"), ((F.col("id") * 7 + 3) % 500).alias("dst")
    )
    edges.write.mode("overwrite").parquet(path)
    deg = (
        spark.read.parquet(path)
        .groupBy(F.col("src").alias("id"))
        .agg(F.count("*").alias("out_degree"))
    )
    assert _n_exchanges(deg) >= 1


def test_bucketed_results_match_plain(spark, bucketed_table):
    deg = {r.id: r.out_degree for r in bucketed_degrees(spark, bucketed_table).collect()}
    edges = spark.range(20_000).select(
        (F.col("id") % 500).alias("src"), ((F.col("id") * 7 + 3) % 500).alias("dst")
    )
    want = {
        r.src: r.n
        for r in edges.groupBy("src").agg(F.count("*").alias("n")).collect()
    }
    assert deg == want
