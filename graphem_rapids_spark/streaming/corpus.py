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

from graphem_rapids_spark.pipeline import text as T
from graphem_rapids_spark.streaming.events import run_available_now, stream_table


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stream_table(spark, sf_dir, "documents")


def quality_col(text_col: str = "text"):
    """Column twin of text.quality_score's ``quality`` output."""
    t = T.tokens_col(text_col)
    sw = F.array([F.lit(s) for s in T.EN_STOPWORDS])
    nt = F.size(t)
    ttr = F.round(F.size(F.array_distinct(t)) / nt, 6)
    swr = F.round(F.size(F.filter(t, lambda x: F.array_contains(sw, x))) / nt, 6)
    return F.round(
        F.least(nt / 100.0, F.lit(1.0)) * 0.4
        + ttr * 0.4
        + F.least(swr * 4.0, F.lit(1.0)) * 0.2,
        6,
    )


def dup2_col(text_col: str = "text"):
    """Column twin of text repetition stats' ``dup_2gram_frac``."""
    g2 = T.word_ngrams_col(T.tokens_col(text_col), 2)
    n2 = F.size(g2)
    return F.when(
        n2 > 0, F.round(1.0 - F.size(F.array_distinct(g2)) / n2, 6)
    ).otherwise(F.lit(0.0))


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
