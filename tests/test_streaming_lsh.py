"""Cross-micro-batch semantics of the streaming LSH index — the part
the single-availableNow-batch oracle can't exercise: a bucket claimed
in batch 1 must be REMEMBERED (state) so a near-duplicate arriving in
batch 2 claims nothing, and the claim stream never re-emits a
bucket."""

from __future__ import annotations

import os
import shutil
import uuid

import pytest

from graphem_rapids_spark.pipeline.dedup import _minhash_params
from graphem_rapids_spark.streaming.lsh import (
    doc_band_buckets,
    lsh_bucket_claims_stream,
)

BASE = (
    "the quick brown fox jumps over the lazy dog near the river bank "
    "while seven wizards brew strong potions under a full moon tonight"
)


@pytest.fixture()
def two_batch_docs(spark, tmp_path):
    watch = tmp_path / "docs"
    watch.mkdir()

    def write_one(rows, name, mtime):
        staging = tmp_path / f"st_{uuid.uuid4().hex[:6]}"
        df = spark.createDataFrame(rows, "doc_id long, text string")
        df.coalesce(1).write.mode("overwrite").parquet(str(staging))
        part = next(p for p in staging.iterdir() if p.name.endswith(".parquet"))
        dest = watch / name
        shutil.move(str(part), str(dest))
        os.utime(dest, (mtime, mtime))

    # batch 1: the original + an unrelated doc
    write_one(
        [(1, BASE), (2, "completely different words about spark shuffles "
                        "partitions exchanges codegen and broadcast joins "
                        "living in the catalyst optimizer all day long")],
        "b1.parquet",
        1_700_000_000,
    )
    # batch 2: a verbatim copy of doc 1 (every bucket collides) and a
    # fresh novel doc
    write_one(
        [(10, BASE), (11, "entirely novel third document with its own "
                          "vocabulary of telescopes nebulae quasars and "
                          "galaxies drifting through the dark sky")],
        "b2.parquet",
        1_700_000_300,
    )
    return str(watch)


def test_cross_batch_claims(spark, two_batch_docs):
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(two_batch_docs)
    )
    claims = lsh_bucket_claims_stream(stream, num_perm=32, bands=8, seed=7)
    name = f"lsh_{uuid.uuid4().hex[:8]}"
    q = (
        claims.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(name).collect()
    owners = {(r.band, r.bucket): r.doc_id for r in out}
    # no bucket emitted twice
    assert len(out) == len(owners)

    params = _minhash_params(32, 7)
    b1 = {(b, k) for b, k, _ in doc_band_buckets([BASE], [1], params, 8)}
    # doc 10 (verbatim copy, batch 2) hashes to exactly doc 1's buckets
    b10 = {(b, k) for b, k, _ in doc_band_buckets([BASE], [10], params, 8)}
    assert b1 == b10
    # every one of those buckets is owned by doc 1 — the batch-2 copy
    # claimed NOTHING because state remembered batch 1
    for key in b1:
        assert owners[key] == 1, key
    # the novel batch-2 doc claimed all 8 of its own buckets
    b11 = {
        (b, k)
        for b, k, _ in doc_band_buckets(
            ["entirely novel third document with its own vocabulary of "
             "telescopes nebulae quasars and galaxies drifting through "
             "the dark sky"],
            [11],
            params,
            8,
        )
    }
    for key in b11:
        assert owners[key] == 11, key
