"""JSONL corpus source/sink: round-trip, corrupt-record capture,
shard bounding."""

from __future__ import annotations

import glob
import gzip
import os
import tempfile

from graphem_rapids_spark.pipeline.corpus_io import (
    corrupt_record_count,
    read_jsonl_corpus,
    write_jsonl_corpus,
)

SF_DIR = "/root/testdata/sf0.001"


def test_jsonl_round_trip(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = str(tmp_path / "corpus")
    write_jsonl_corpus(docs, out, max_records_per_file=20)
    back = read_jsonl_corpus(spark, out)
    assert corrupt_record_count(back) == 0
    a = sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in docs.collect())
    b = sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in back.collect())
    assert a == b
    # shard bounding: >1 gzip part at 20 records/file for 50 docs
    parts = glob.glob(os.path.join(out, "part-*.json.gz"))
    assert len(parts) >= 3


def test_jsonl_corrupt_lines_are_captured_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "THIS IS NOT JSON\n"
        '{"doc_id": 2, "text": "fine", "lang": "en", "source": "s", "n_chars": 4}\n'
    )
    df = read_jsonl_corpus(spark, str(p))
    assert df.count() == 3
    assert corrupt_record_count(df) == 1
    good = df.filter(df["_corrupt_record"].isNull())
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    dropped = read_jsonl_corpus(spark, str(p), keep_corrupt=False)
    assert sorted(r.doc_id for r in dropped.collect()) == [1, 2]


def test_jsonl_gzip_input(spark, tmp_path):
    p = tmp_path / "c.jsonl.gz"
    with gzip.open(p, "wt") as f:
        for i in range(5):
            f.write(
                '{"doc_id": %d, "text": "t%d", "lang": "en", "source": "x", "n_chars": 2}\n'
                % (i, i)
            )
    df = read_jsonl_corpus(spark, str(p))
    assert df.count() == 5
    assert corrupt_record_count(df) == 0


def test_sql_interface_matches_dataframe(spark):
    from graphem_rapids_spark.sql import run_sql

    df = run_sql(
        spark,
        SF_DIR,
        """
        SELECT l_returnflag, count(*) AS n, round(sum(l_quantity), 4) AS qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
        """,
    )
    rows = df.collect()
    assert [r.l_returnflag for r in rows] == sorted({r.l_returnflag for r in rows})
    import pyspark.sql.functions as F

    want = (
        spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"), F.round(F.sum("l_quantity"), 4).alias("qty"))
        .orderBy("l_returnflag")
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in want]


def test_sql_interface_pushdown(spark):
    from graphem_rapids_spark.sql import run_sql

    df = run_sql(spark, SF_DIR, "SELECT o_orderkey FROM orders WHERE o_custkey = 7")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "o_custkey" in plan


def test_end_to_end_jsonl_curate_shard_roundtrip(spark, tmp_path):
    """Integration: JSONL ingest → quality/lang curation → hive-
    partitioned parquet shards → pruned read-back. The full ingest
    path a training-data pipeline runs, on real operators end to end."""
    import pyspark.sql.functions as F

    from graphem_rapids_spark.pipeline.sinks import (
        read_training_shards,
        write_training_shards,
    )
    from graphem_rapids_spark.pipeline.text import quality_col

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    jsonl_dir = str(tmp_path / "incoming")
    write_jsonl_corpus(docs, jsonl_dir, max_records_per_file=25)

    ingested = read_jsonl_corpus(spark, jsonl_dir)
    assert corrupt_record_count(ingested) == 0
    curated = (
        ingested.drop("_corrupt_record")
        .withColumn("quality", quality_col("text"))
        .filter(F.col("quality") >= 0.3)
    )
    n_curated = curated.count()
    assert 0 < n_curated <= docs.count()

    shard_dir = str(tmp_path / "shards")
    write_training_shards(
        curated, shard_dir, partition_by="lang", shard_records=40, sort_within="doc_id"
    )
    back = read_training_shards(spark, shard_dir)
    assert back.count() == n_curated
    # partition pruning: a lang filter reads only that directory
    en = read_training_shards(spark, shard_dir, "lang = 'en'")
    assert en.count() == curated.filter("lang = 'en'").count()
    plan = en._sc._jvm.PythonSQLUtils.explainString(en._jdf.queryExecution(), "formatted")
    assert "PartitionFilters" in plan
