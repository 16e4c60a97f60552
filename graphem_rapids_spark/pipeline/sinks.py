"""Curated-corpus output: how a 100 TB training-data pipeline ships
its result set.

A curated corpus is consumed by data loaders that want (a) partition
pruning on coarse keys (language, source, quality bucket), (b)
bounded shard sizes (a 100 GB parquet file stalls a loader; thousands
of 1 KB files stall the namenode), and (c) stable intra-shard order
(reproducible epoch iteration). ``write_training_shards`` expresses
all three declaratively — hive-style ``partitionBy``, Spark's
``maxRecordsPerFile`` split, and ``sortWithinPartitions`` — so the
writer parallelizes like any other job: no driver-side sharding loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    partition_by: str | list[str] | None = None,
    shard_records: int | None = None,
    sort_within: str | list[str] | None = None,
    num_shards: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Write a curated DataFrame as hive-partitioned, size-bounded,
    internally-sorted parquet shards.

    - ``partition_by``: coarse pruning keys → one directory level per
      value (keep cardinality low; high-cardinality keys belong in the
      data, not the layout).
    - ``num_shards``: target file count per partition value — a
      repartition on the partition keys with a controlled factor.
    - ``shard_records``: hard cap per file (maxRecordsPerFile), the
      loader-friendly bound that holds even under skew.
    - ``sort_within``: intra-shard sort for reproducible iteration
      order (and better column compression on sorted keys).
    """
    parts = [partition_by] if isinstance(partition_by, str) else (partition_by or [])
    sorts = [sort_within] if isinstance(sort_within, str) else (sort_within or [])
    out = df
    if num_shards:
        out = out.repartition(num_shards, *[F.col(c) for c in parts]) if parts else out.repartition(num_shards)
    if sorts:
        out = out.sortWithinPartitions(*sorts)
    writer = out.write.mode(mode)
    if parts:
        writer = writer.partitionBy(*parts)
    if shard_records:
        writer = writer.option("maxRecordsPerFile", shard_records)
    writer.parquet(path)


def read_training_shards(
    spark: SparkSession, path: str, partition_filter: str | None = None
) -> DataFrame:
    """Read a sharded corpus back; ``partition_filter`` (e.g.
    ``"pred_lang = 'en'"``) prunes whole directories at planning time
    — the scan never touches excluded partitions (PLANS.md-style
    PartitionFilters, the point of the hive layout)."""
    df = spark.read.parquet(path)
    return df.filter(partition_filter) if partition_filter else df
