"""Curated-corpus shard writer: hive partitioning, shard-size caps,
intra-shard order, and partition pruning on read-back."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from graphem_rapids_spark.pipeline.sinks import (
    read_training_shards,
    write_training_shards,
)
from graphem_rapids_spark.pipeline.text import language_id

SF_DIR = "/root/testdata/sf0.001"


def test_write_and_read_training_shards(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    lang = language_id(docs).select("doc_id", "pred_lang")
    curated = docs.join(lang, "doc_id")
    out = str(tmp_path / "shards")
    write_training_shards(
        curated,
        out,
        partition_by="pred_lang",
        shard_records=100,
        sort_within="doc_id",
        num_shards=2,
    )
    # hive layout: one directory per pred_lang value
    dirs = sorted(
        os.path.basename(d) for d in glob.glob(f"{out}/pred_lang=*") if os.path.isdir(d)
    )
    assert dirs == ["pred_lang=en", "pred_lang=other"]
    # shard-size cap: no file holds more than shard_records rows
    for f in glob.glob(f"{out}/pred_lang=*/*.parquet"):
        assert spark.read.parquet(f).count() <= 100
    # round-trip: nothing lost
    back = read_training_shards(spark, out)
    assert back.count() == curated.count()
    assert set(back.columns) == set(curated.columns)
    # partition pruning reaches the scan as a PartitionFilters entry
    en = read_training_shards(spark, out, "pred_lang = 'en'")
    plan = en._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert en.count() == curated.filter(F.col("pred_lang") == "en").count()


def test_intra_shard_sort_order(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    out = str(tmp_path / "sorted")
    write_training_shards(docs, out, shard_records=200, sort_within="doc_id", num_shards=2)
    for f in glob.glob(f"{out}/*.parquet"):
        ids = [r.doc_id for r in spark.read.parquet(f).collect()]
        assert ids == sorted(ids)
