"""Bucketed edge-table materialization — the 100 TB deployment
pattern the memoized in-session graph build stands in for locally.

On a real cluster the co-purchase (or any) edge table is built ONCE
and written bucketed by the join/aggregation key; every subsequent
graph query (degree, PageRank matvec, BFS message generation,
triangle counting's first hop) then reads pre-partitioned data and
the per-query Exchange disappears — Spark's bucketing contract
guarantees partitioning-by-bucket-key at scan time.

``tests/test_bucketed.py`` pins the physical plan: the groupBy(src)
aggregate over the bucketed table must contain NO shuffle exchange,
while the same aggregate over plain parquet must contain one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed_edges(
    edges: DataFrame,
    table: str,
    buckets: int = 32,
    key: str = "src",
) -> None:
    """Materialize an edge DataFrame as a bucketed+sorted managed
    table. ``buckets`` should track cluster parallelism (e.g. 2–4×
    executor cores on a real deployment)."""
    (
        edges.write.bucketBy(buckets, key)
        .sortBy(key)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_degrees(spark: SparkSession, table: str) -> DataFrame:
    """Degree over the bucketed table — shuffle-free: the scan is
    already hash-partitioned on the bucket key, so the aggregate is
    map-side only (no Exchange in the physical plan)."""
    e = spark.table(table)
    out_deg = e.groupBy(F.col("src").alias("id")).agg(F.count("*").alias("out_degree"))
    return out_deg


def bucketed_self_join_count(spark: SparkSession, table: str) -> int:
    """Two-hop path count via a self-join on the bucket key — both
    sides read pre-partitioned, so the join needs no shuffle of
    either side (SortMergeJoin over bucketed scans)."""
    e = spark.table(table)
    a = e.select(F.col("src").alias("k"), F.col("dst").alias("a_dst"))
    b = e.select(F.col("src").alias("k"), F.col("dst").alias("b_dst"))
    return a.join(b, "k").count()
