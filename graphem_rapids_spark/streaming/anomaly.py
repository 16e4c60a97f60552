"""Custom stateful streaming operator: incremental per-minute anomaly
scoring against a trailing mean.

The batch twin (``queries.events_minute_anomaly``) scores each
(event_type, minute) count with a Poisson z-score against the mean of
the trailing 60 OBSERVED minutes. A continuously-ingesting pipeline
wants that incrementally: per event_type, carry the last 60 minute
counts as group state and score each newly-completed minute on
arrival — a rolling statistic Spark's built-in streaming aggregations
cannot express (window functions are unsupported on streams). This is
the ``applyInPandasWithState`` pattern from the brief: per-group user
state with bounded size.

State design for 100 TB: grouping key = event_type (or any bounded
entity key); state per group is exactly ``window`` (minute, count)
pairs — O(groups · window) total, independent of event volume. Counts
aggregate map-side inside the Arrow batch (pandas groupby), so state
updates see per-minute partials, not raw events.

Parity contract: with an ``availableNow`` single-batch drain the
emitted scores replay the batch query bit-for-bit — integer sums are
exact in double, the divide/sqrt are single IEEE ops, and rounding is
half-away-from-zero exactly like both engines' ``round(x, 6)``.
"""

from __future__ import annotations

import math
from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def _round6(x: float) -> float:
    # half-away-from-zero at 6 decimals — matches Spark's F.round and
    # DuckDB's round (Python's built-in round is banker's and would
    # diverge on exact .5 boundaries)
    return math.copysign(math.floor(abs(x) * 1e6 + 0.5), x) / 1e6


def anomaly_stream(
    events: DataFrame,
    window: int = 60,
    min_history: int = 30,
) -> DataFrame:
    """(event_type, minute_us, n_events, trailing_mean, z_score) —
    one row per observed (event_type, minute), scored against the
    trailing ``window`` observed minutes once ``min_history`` of them
    exist. ``events`` must be a streaming DataFrame carrying ``ts`` as
    long nanoseconds (see ``stream_events``)."""
    e = events.select(
        F.col("event_type"),
        F.expr("(ts div 60000000000) * 60000000").alias("minute_us"),
    )

    def score_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        hist: dict[int, int] = {}
        if state.exists:
            mins, cnts = state.get
            hist = dict(zip(mins, cnts))
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        new_counts = batch.groupby("minute_us").size()
        for m, c in new_counts.items():
            hist[int(m)] = hist.get(int(m), 0) + int(c)
        items = sorted(hist.items())
        new_minutes = {int(m) for m in new_counts.index}
        rows = []
        for idx, (m, c) in enumerate(items):
            if m not in new_minutes:
                continue
            prev = items[max(0, idx - window) : idx]
            tc = len(prev)
            if tc < min_history:
                continue
            mean = sum(p[1] for p in prev) / tc
            rows.append(
                (
                    key[0],
                    m,
                    c,
                    _round6(mean),
                    _round6((c - mean) / math.sqrt(mean)),
                )
            )
        # bounded state: future minutes only ever look back `window`
        # observed minutes
        keep = items[-window:]
        state.update(([m for m, _ in keep], [c for _, c in keep]))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=[
                    "event_type",
                    "minute_us",
                    "n_events",
                    "trailing_mean",
                    "z_score",
                ],
            )

    return e.groupBy("event_type").applyInPandasWithState(
        score_fn,
        outputStructType=(
            "event_type string, minute_us long, n_events long, "
            "trailing_mean double, z_score double"
        ),
        stateStructType="minutes array<long>, counts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def ewma_stream(events: DataFrame, lags: int = 8) -> DataFrame:
    """(event_type, minute_us, n_events, num, den) — per-minute counts
    with the dyadic-weighted trailing sums of the EWMA burst detector
    (batch twin: ``queries.events_ewma_burst``). State per event_type
    is the last ``lags`` observed (minute, count) pairs — O(groups ·
    lags) total regardless of event volume, the O(1)-state shape that
    makes the detector deployable on an unbounded stream. num/den are
    exact BIGINT (weights 2^(lags-j) over the j-th most recent
    OBSERVED minute), so the availableNow drain replays the batch
    lag-window query bit-for-bit and the batch SQL oracle applies.
    The burst decision itself (2*c*den > 3*num) is left to the sink
    so thresholds can change without touching state."""
    e = events.select(
        F.col("event_type"),
        F.expr("(ts div 60000000000) * 60000000").alias("minute_us"),
    )

    def score_fn(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:  # pragma: no cover - no timeout configured
            state.remove()
            return
        hist: dict[int, int] = {}
        if state.exists:
            mins, cnts = state.get
            hist = dict(zip(mins, cnts))
        batch = pd.concat(list(pdfs), ignore_index=True)
        if not len(batch):
            return
        new_counts = batch.groupby("minute_us").size()
        for m, c in new_counts.items():
            hist[int(m)] = hist.get(int(m), 0) + int(c)
        items = sorted(hist.items())
        new_minutes = {int(m) for m in new_counts.index}
        rows = []
        for idx, (m, c) in enumerate(items):
            if m not in new_minutes:
                continue
            num = 0
            den = 0
            for j in range(1, lags + 1):
                if idx - j >= 0:
                    w = 1 << (lags - j)
                    num += items[idx - j][1] * w
                    den += w
            rows.append((key[0], m, c, num, den))
        keep = items[-lags:]
        state.update(([m for m, _ in keep], [c for _, c in keep]))
        if rows:
            yield pd.DataFrame(
                rows,
                columns=["event_type", "minute_us", "n_events", "num", "den"],
            )

    return e.groupBy("event_type").applyInPandasWithState(
        score_fn,
        outputStructType=(
            "event_type string, minute_us long, n_events long, "
            "num long, den long"
        ),
        stateStructType="minutes array<long>, counts array<long>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
