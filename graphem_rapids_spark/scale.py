"""Scalable replacements for global (partition-less) window operations.

A ``Window.orderBy(...)`` with no ``partitionBy`` moves EVERY row into
one partition (Spark logs ``WindowExec: No Partition Defined``) — fine
at sf0.1, fatal at 100 TB. The two global-window shapes the engine
needs are mean-tie ranking (Spearman, reference ``benchmark.py:217-238``
via scipy ``rankdata``) and dense 0..n-1 re-indexing (node relabel,
reference ``datasets.py:148-166``). Both are re-expressed here as:

1. ``groupBy(value)`` — collapse rows to (value, tie_count); one
   shuffle, map-side combined.
2. ``repartitionByRange(value)`` — order-preserving partitioning
   (partition i holds values below partition i+1's); persisted so the
   sampled range boundaries are computed once and shared by every
   consumer (re-sampling on recompute could re-bucket rows).
3. per-partition running sums via a window PARTITIONED by
   ``spark_partition_id()`` — bounded partitions, no funnel.
4. partition-boundary offsets: one tiny aggregate (≤ #partitions rows)
   prefix-summed and broadcast back.

mean_rank(v) = (# rows < v) + 1 + (tie_count(v) − 1)/2 — arithmetic
identical to ``rank() + (count(*) over (partition by v) − 1)/2.0``, so
results are bit-equal to the window formulation (and to the DuckDB
oracles) while every stage stays distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _prefix_counts(df: DataFrame, col: str) -> DataFrame:
    """(col, _c, _less) — per distinct value: tie count and the number
    of rows with a strictly smaller value (nulls first, as in Spark's
    ascending sort). All stages distributed; the only single-partition
    work is the prefix sum over per-partition totals (≤ shuffle
    partition count rows)."""
    spark = df.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    cnt = df.groupBy(col).agg(F.count("*").alias("_c"))
    part = (
        cnt.repartitionByRange(npart, F.col(col).asc())
        .sortWithinPartitions(F.col(col).asc())
        .withColumn("_pid", F.spark_partition_id())
        # persisted: range boundaries come from a sample of the input;
        # recomputing the exchange per consumer could draw a different
        # sample and disagree with the collected offsets
        .persist()
    )
    tot = part.groupBy("_pid").agg(F.sum("_c").alias("_t"))
    # INTENTIONAL bounded single-partition window: Catalyst folds the
    # constant partitionBy(lit(0)) into an empty partition spec, so
    # executing plans show one SinglePartition WindowExec and Spark
    # logs "No Partition Defined" — expected and safe here, because
    # the input is the per-partition totals table (≤ shuffle-partition
    # count rows, i.e. ≤ npart regardless of data scale), never the
    # data itself.
    w_off = (
        Window.partitionBy(F.lit(0))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = tot.withColumn(
        "_off", F.coalesce(F.sum("_t").over(w_off), F.lit(0))
    ).select("_pid", "_off")
    w_local = Window.partitionBy("_pid").orderBy(F.col(col).asc())
    return (
        part.join(F.broadcast(offsets), "_pid")
        .withColumn("_cum", F.sum("_c").over(w_local))
        .select(
            col,
            "_c",
            (F.col("_off") + F.col("_cum") - F.col("_c")).alias("_less"),
        )
    )


def global_mean_rank(df: DataFrame, col: str, out: str) -> DataFrame:
    """Append mean-tie (scipy ``rankdata``-style) global ranks of
    ``col`` as ``out`` without a partition-less window: rank table via
    :func:`_prefix_counts`, then an equi-join back on the value (hash
    partitionable; null-safe so null rows keep their rank like the
    window formulation)."""
    ranks = _prefix_counts(df, col).select(
        F.col(col).alias("_rank_key"),
        (F.col("_less") + 1 + (F.col("_c") - 1) / 2.0).alias(out),
    )
    joined = df.join(
        ranks, F.col(col).eqNullSafe(F.col("_rank_key")), "left"
    ).drop("_rank_key")
    return joined


def global_dense_index(df: DataFrame, col: str, out: str) -> DataFrame:
    """(col, out) — dense 0..n-1 index of the DISTINCT values of
    ``col`` in ascending order (``row_number() over (order by col) - 1``
    without the single-partition funnel)."""
    return _prefix_counts(df.select(col).distinct(), col).select(
        col, F.col("_less").cast("long").alias(out)
    )


def global_strict_prefix_max(df: DataFrame, key: str, val: str, out: str) -> DataFrame:
    """Append ``out`` = max of ``val`` over all rows with a STRICTLY
    smaller ``key`` (the ``max(val) OVER (ORDER BY key RANGE BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING)`` window, without the
    single-partition funnel). ``df`` must have one row per distinct
    ``key`` (pre-aggregate first). Same discipline as
    :func:`_prefix_counts`: range-repartition on the key, running max
    within each ordered partition, per-partition totals (≤ shuffle
    partition count rows) prefix-maxed in one bounded window and
    broadcast back. ``out`` is null when no smaller key exists."""
    spark = df.sparkSession
    npart = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    part = (
        df.repartitionByRange(npart, F.col(key).asc())
        .sortWithinPartitions(F.col(key).asc())
        .withColumn("_pid", F.spark_partition_id())
        # persisted for the same reason as _prefix_counts: the range
        # exchange samples the input; a per-consumer recompute could
        # re-bucket rows and disagree with the collected offsets
        .persist()
    )
    tot = part.groupBy("_pid").agg(F.max(val).alias("_t"))
    # bounded single-partition window over ≤ npart per-partition maxima
    # (see the _prefix_counts comment — intentional and scale-safe)
    w_off = (
        Window.partitionBy(F.lit(0))
        .orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = tot.withColumn("_off", F.max("_t").over(w_off)).select("_pid", "_off")
    w_local = Window.partitionBy("_pid").orderBy(F.col(key).asc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    return (
        part.join(F.broadcast(offsets), "_pid")
        .withColumn("_run", F.max(val).over(w_local))
        .withColumn(out, F.greatest(F.coalesce("_run", "_off"), F.coalesce("_off", "_run")))
        .drop("_pid", "_off", "_run")
    )
