"""Custom stateful streaming operator: first-occurrence exact dedup.

The batch dedup operators (``pipeline/dedup.py``) assume the corpus is
at rest; a continuously-ingesting training-data pipeline needs the
streaming form — "emit a document only the first time its content
hash is seen" — which Spark's built-in aggregations cannot express
(they re-emit groups). This is the ``applyInPandasWithState`` pattern
from the brief: per-group user state (has this hash been emitted?)
with watermark-bounded state growth.

State design for 100 TB: grouping key = content hash → state per
distinct document is a single boolean; Spark partitions state by hash
across executors, and a processing-time timeout (``state_ttl``) evicts
entries so state doesn't grow unboundedly on endless streams.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_stream(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    state_ttl_ms: int | None = None,
) -> DataFrame:
    """Streaming exact dedup: (text_hash, doc_id) — one output row per
    distinct text, carrying the FIRST document id that arrived with it
    (within a micro-batch, the smallest id — deterministic for tests).

    ``docs`` must be a streaming DataFrame with (id_col, text_col).
    """
    hashed = docs.select(
        F.md5(F.col(text_col)).alias("text_hash"), F.col(id_col).alias("doc_id")
    )

    def dedup_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            # hash already emitted in an earlier micro-batch: drop all
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
        yield pd.DataFrame({"text_hash": [key[0]], "doc_id": [best]})

    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if state_ttl_ms is not None
        else GroupStateTimeout.NoTimeout
    )
    return hashed.groupBy("text_hash").applyInPandasWithState(
        dedup_fn,
        outputStructType="text_hash string, doc_id long",
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=timeout,
    )
