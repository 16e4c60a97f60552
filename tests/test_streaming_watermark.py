"""Watermark late-data semantics — the behavior the availableNow
batch-replay oracles can't see (one micro-batch processes everything,
so nothing is ever late). Three micro-batches (maxFilesPerTrigger=1,
file order pinned by mtime): batch 0 advances the watermark past the
10:00 window, batch 1 finalizes+emits that window, and batch 2's
late row for it must be DROPPED — bounded state at 100 TB depends on
exactly this contract (finalized windows never reopen).
"""

from __future__ import annotations

import os
import shutil
import uuid
from datetime import datetime

import pytest
from pyspark.sql import functions as F


def _t(s: str) -> datetime:
    return datetime.strptime(s, "%Y-%m-%d %H:%M:%S")


@pytest.fixture()
def three_file_stream_dir(spark, tmp_path):
    watch = tmp_path / "watch"
    watch.mkdir()

    def write_one(rows, name, mtime):
        staging = tmp_path / f"stage_{uuid.uuid4().hex[:6]}"
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(p for p in staging.iterdir() if p.name.endswith(".parquet"))
        dest = watch / name
        shutil.move(str(part), str(dest))
        # file-stream batch order is by modification time — pin it
        os.utime(dest, (mtime, mtime))

    # batch 0: three on-time rows in the 10:00 window + a 13:00 row
    # that advances the watermark to 12:30 (> window end 11:00)
    write_one(
        [
            (1, _t("2024-01-01 10:00:00"), 1.0),
            (1, _t("2024-01-01 10:20:00"), 1.0),
            (1, _t("2024-01-01 10:40:00"), 1.0),
            (1, _t("2024-01-01 13:00:00"), 1.0),
        ],
        "f1.parquet",
        mtime=1_700_000_000,
    )
    # batch 1: on-time row; the 10:00 window finalizes + emits here
    write_one(
        [(1, _t("2024-01-01 13:05:00"), 1.0)], "f2.parquet", mtime=1_700_000_300
    )
    # batch 2: LATE row for the already-finalized 10:00 window
    write_one(
        [(1, _t("2024-01-01 10:30:00"), 99.0)], "f3.parquet", mtime=1_700_000_600
    )
    return str(watch)


def test_late_rows_dropped_after_window_finalized(spark, three_file_stream_dir):
    schema = "user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(three_file_stream_dir)
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .select(F.col("w.start").cast("string").alias("win"), "n", "total")
    )
    name = f"wm_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {r.win: (r.n, r.total) for r in spark.table(name).collect()}

    # the finalized 10:00 window contains ONLY the on-time rows; the
    # batch-2 late row (value 99) was dropped, not re-emitted
    assert out["2024-01-01 10:00:00"] == (3, 3.0), out
    # and the memory sink got exactly one emission for that window
    n_emissions = sum(1 for w in out if w == "2024-01-01 10:00:00")
    assert n_emissions == 1

    # batch processing of the same files WOULD count the late row —
    # proving the watermark (not the data) excluded it
    batch = (
        spark.read.schema(schema)
        .parquet(three_file_stream_dir)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
    )
    batch_counts = {str(r.w.start): r.n for r in batch.collect()}
    assert batch_counts["2024-01-01 10:00:00"] == 4
