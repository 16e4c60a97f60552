"""Structured Streaming: stream/batch parity on identical input
(availableNow drain → memory sink) and session-window sanity."""

from pyspark.sql import functions as F

from graphem_rapids_spark.queries import events_hourly
from graphem_rapids_spark.streaming.dedup import first_seen_stream
from graphem_rapids_spark.streaming.events import (
    hourly_counts_stream,
    run_available_now,
    sessionize_stream,
    stream_events,
    stream_table,
)


def test_stream_hourly_matches_batch(spark, sf_dir):
    batch = events_hourly(spark, sf_dir)
    out = run_available_now(hourly_counts_stream(stream_events(spark, sf_dir)))
    b = {tuple(r) for r in batch.collect()}
    s = {tuple(r) for r in out.collect()}
    assert b == s and len(b) > 0


def test_stream_sessionize_bounds(spark, sf_dir):
    out = run_available_now(sessionize_stream(stream_events(spark, sf_dir)))
    rows = out.collect()
    assert len(rows) > 0
    # every session has ≥1 event; per-user session events sum to the
    # user's total event count
    assert all(r.n_events >= 1 for r in rows)
    per_user = out.groupBy("user_id").agg(F.sum("n_events").alias("n"))
    evs = stream_events(spark, sf_dir)  # streaming DF; recount via batch
    batch_counts = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.count("*").alias("n"))
    )
    got = {r.user_id: r.n for r in per_user.collect()}
    want = {r.user_id: r.n for r in batch_counts.collect()}
    assert got == want


def test_stream_dedup_first_seen(spark, sf_dir):
    # stateful applyInPandasWithState dedup: one output row per
    # distinct text, carrying the smallest doc_id of its group —
    # matches the batch exact-dedup keep_id contract
    docs = stream_table(spark, sf_dir, "documents")
    out = run_available_now(
        first_seen_stream(docs), output_mode="append"
    )
    got = {(r.text_hash, r.doc_id) for r in out.collect()}
    from graphem_rapids_spark.pipeline.dedup import exact_duplicates

    batch = exact_duplicates(spark.read.parquet(f"{sf_dir}/documents.parquet"))
    want = {(r.text_hash, r.keep_id) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_curation_monitor_matches_batch(spark, sf_dir):
    # per-language curation monitor drained with availableNow equals
    # the same aggregate computed over the batch read
    from graphem_rapids_spark.streaming.corpus import (
        curation_monitor_stream,
        run_curation_monitor,
    )

    out = run_curation_monitor(spark, sf_dir)
    batch = curation_monitor_stream(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, batch.collect()))
    assert got == want and len(got) > 0
