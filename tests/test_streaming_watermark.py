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


def test_watermark_propagation_offset(spark, tmp_path):
    """Empirically DERIVE the microbatch watermark-propagation offset
    the `events_stream_late_drop` oracle replays (queries.py
    `_LATE_WM_OFFSET`): the watermark applied during batch k derives
    from max-event-time over batches <= k - offset.

    Probe construction: every batch carries one row in the 00:00
    window W0 plus a 10:00+k row that keeps max-event-time far past
    W0's end + delay. The probe in batch k is accepted iff the
    effective watermark at k still predates W0's end — i.e. iff
    k < offset. In update mode the state count for W0 therefore
    equals the offset. A Spark upgrade that changes the protocol
    fails HERE instead of silently hash-mismatching at the driver."""
    watch = tmp_path / "watch_off"
    watch.mkdir()
    for k in range(4):
        staging = tmp_path / f"st_{k}"
        rows = [
            (1, _t("2024-01-01 00:30:00"), 1.0),  # probe in W0
            (1, _t(f"2024-01-01 {10 + k}:00:00"), 1.0),  # wm driver
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(p for p in staging.iterdir() if p.name.endswith(".parquet"))
        dest = watch / f"b{k}.parquet"
        shutil.move(str(part), str(dest))
        os.utime(dest, (1_700_000_000 + 300 * k,) * 2)

    schema = "user_id long, ts timestamp, value double"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(watch))
    )
    agg = (
        stream.withWatermark("ts", "30 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").cast("string").alias("win"), "n")
    )
    name = f"wmoff_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    emitted = spark.table(name).collect()
    derived_offset = max(
        (r.n for r in emitted if r.win == "2024-01-01 00:00:00"), default=0
    )

    from graphem_rapids_spark.queries import (
        _LATE_WM_MEASURED_VERSIONS,
        _LATE_WM_OFFSET,
    )

    assert derived_offset == _LATE_WM_OFFSET, (
        f"Spark {spark.version} propagates watermarks with offset "
        f"{derived_offset}, but the events_stream_late_drop oracle "
        f"replays offset {_LATE_WM_OFFSET} — update _LATE_WM_OFFSET "
        "and _LATE_WM_MEASURED_VERSIONS in queries.py"
    )
    assert ".".join(spark.version.split(".")[:2]) in _LATE_WM_MEASURED_VERSIONS
