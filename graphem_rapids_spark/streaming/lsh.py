"""Custom stateful streaming operator: MinHash-LSH bucket claims —
the streaming half of near-duplicate dedup.

``pipeline/dedup.py::minhash_lsh_pairs`` assumes the corpus is at
rest; a continuously-ingesting pipeline instead maintains an LSH
INDEX: every arriving document hashes into ``bands`` bucket keys, and
a bucket's FIRST claimant is the canonical owner — later documents
landing in an already-claimed bucket are near-duplicate candidates
(collision probability 1-(1-J^rows)^bands, the same geometry as the
batch join). Spark's built-in aggregations can't express "emit only
the first claimant", so the claim step is ``applyInPandasWithState``
(the :mod:`streaming.dedup` pattern) keyed by (band, bucket): state
per bucket is one boolean, partitioned by bucket hash across
executors — bounded, mergeable, TTL-evictable.

The per-document signature is computed map-side in an Arrow
``mapInPandas`` batch (a signature is a pure function of the
document — no shuffle before the claim step). Hashing is the
engine-replayable md5 path of ``dedup_minhash_calibration`` (NOT
xxhash64, which has no DuckDB twin), so the whole operator replays
exactly in the batch oracle.
"""

from __future__ import annotations

import hashlib
import re
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from graphem_rapids_spark.pipeline.dedup import _MERSENNE31, _minhash_params


def doc_band_buckets(
    texts: "pd.Series",
    doc_ids: "pd.Series",
    params: list[tuple[int, int]],
    bands: int,
) -> Iterator[tuple[int, str, int]]:
    """(band, bucket, doc_id) triples for a batch of documents —
    4-token shingles, md5 31-bit hashes, k-min signature, md5 band
    keys. Pure function; shared by the streaming path and tests."""
    rows_per_band = len(params) // bands
    for text, did in zip(texts, doc_ids):
        toks = re.split(r"\s+", str(text).lower().strip())
        shingles = {
            " ".join(toks[i : i + 4]) for i in range(max(len(toks) - 3, 1))
        }
        hs = [
            int(hashlib.md5(s.encode()).hexdigest()[:8], 16) % _MERSENNE31
            for s in shingles
        ]
        sig = [min((h * a + b) % _MERSENNE31 for h in hs) for a, b in params]
        for j in range(bands):
            key = ",".join(
                str(x) for x in sig[rows_per_band * j : rows_per_band * (j + 1)]
            )
            yield j, hashlib.md5(key.encode()).hexdigest(), int(did)


def lsh_bucket_claims_stream(
    docs: DataFrame,
    num_perm: int = 32,
    bands: int = 8,
    seed: int = 7,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """(band, bucket, doc_id) — one row per LSH bucket, carrying the
    FIRST document that claimed it (min id within a micro-batch —
    deterministic under availableNow replay). ``docs`` must be a
    streaming DataFrame."""
    params = _minhash_params(num_perm, seed)

    def expand(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = list(
                doc_band_buckets(pdf[text_col], pdf[id_col], params, bands)
            )
            yield pd.DataFrame(rows, columns=["band", "bucket", "doc_id"])

    expanded = docs.mapInPandas(expand, "band int, bucket string, doc_id long")

    def claim_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            if state_ttl_ms is not None:
                state.setTimeoutDuration(state_ttl_ms)
            return
        best = None
        for pdf in pdfs:
            if len(pdf):
                m = int(pdf["doc_id"].min())
                best = m if best is None else min(best, m)
        if best is None:
            return
        state.update((True,))
        if state_ttl_ms is not None:
            state.setTimeoutDuration(state_ttl_ms)
        yield pd.DataFrame(
            {"band": [key[0]], "bucket": [key[1]], "doc_id": [best]}
        )

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return expanded.groupBy("band", "bucket").applyInPandasWithState(
        claim_fn,
        outputStructType="band int, bucket string, doc_id long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )
