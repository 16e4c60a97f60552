"""Streaming corpus ingestion: continuous curation monitoring over a
document stream.

The batch curation signals (pipeline/text.py) are narrow column
expressions, so they lift onto Structured Streaming unchanged — this
module wires them to a file-source document stream and a per-language
aggregate: the monitor a continuous 100 TB ingest runs beside its
sink. File streams process each arriving shard exactly once (with
checkpointing); aggregate state is bounded by language cardinality,
not corpus size. Formulas are the exact batch definitions
(quality_score / repetition dup-2-gram), so the batch SQL oracle
hash-matches the drained stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from graphem_rapids_spark.pipeline.text import dup2_col, quality_col
from graphem_rapids_spark.streaming.events import run_available_now, stream_table


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_table(spark, sf_dir, "documents")


def curation_monitor_stream(docs: DataFrame, quality_min: float = 0.45) -> DataFrame:
    """(lang, n_docs, n_quality_pass, sum_quality, max_dup2) — per-
    language ingest monitor: document counts, quality-floor pass
    counts, quality mass, and the worst repetition fraction seen."""
    sig = docs.select(
        "lang",
        quality_col("text").alias("quality"),
        dup2_col("text").alias("dup2"),
    )
    return sig.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum((F.col("quality") >= quality_min).cast("long")).alias("n_quality_pass"),
        F.round(F.sum("quality"), 4).alias("sum_quality"),
        F.round(F.max("dup2"), 6).alias("max_dup2"),
    )


def run_curation_monitor(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_available_now(curation_monitor_stream(stream_documents(spark, sf_dir)))
