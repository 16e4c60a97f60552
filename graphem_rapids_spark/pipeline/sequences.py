"""Sequential-pattern mining over per-entity ordered event streams
(library lift, r8 session 2 — the same discipline the timeseries /
experiments / keyphrase families follow: the registry queries in
``queries.py`` are thin wrappers that stage the events table and
rename columns; any pipeline can call these over its own frames).

Two support semantics, both from PrefixSpan (Pei et al. 2001):

- :func:`ngram_support` — CONTIGUOUS n-grams: the pattern's events
  are adjacent in the entity's stream. One n-fold ``lead`` over the
  entity-partitioned window (never a global window), then one
  taxonomy-bounded groupBy. Support = distinct entities (a bot
  replaying one loop cannot dominate) with raw occurrence counts as
  the diagnostic tie-break.
- :func:`subsequence_support` — GAPPED subsequences: the pattern's
  events appear in order anywhere in the stream. Uses the greedy
  earliest-occurrence witness, which is exact for subsequence
  existence: m1 = min ts(a); m2 = min ts(b) with ts > m1; the
  pattern is supported iff any ts(c) > m2. Every stage is a join
  whose fanout is the TOKEN TAXONOMY (≤ |tokens| per event row,
  ≤ |tokens|^(k-1) prefix rows per entity — never a per-entity list
  collect, so a million-event entity costs the same per-row work as
  anyone else).

Both order ties by strictly-increasing timestamps (plus an explicit
tiebreak column for the contiguous walk), so a DuckDB oracle replays
the counts exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ngram_support(
    events: DataFrame,
    n: int = 3,
    entity_col: str = "user_id",
    token_col: str = "event_type",
    order_cols: tuple[str, ...] = ("ts",),
    top_k: int | None = None,
) -> DataFrame:
    """Contiguous n-gram pattern support. ``order_cols`` must totally
    order each entity's stream (pass a tiebreak id column alongside a
    coarse timestamp). Output: t1..tn, n_entities, n_occurrences,
    ordered by (n_entities desc, n_occurrences desc, t1..tn asc),
    optionally cut to ``top_k`` (a TakeOrdered — never a global
    window)."""
    if n < 2:
        raise ValueError("ngram_support needs n >= 2")
    w = Window.partitionBy(entity_col).orderBy(*order_cols)
    cols = [F.col(token_col).alias("t1")] + [
        F.lead(token_col, i).over(w).alias(f"t{i + 1}") for i in range(1, n)
    ]
    names = [f"t{i + 1}" for i in range(n)]
    grams = events.select(F.col(entity_col).alias("_e"), *cols).filter(
        F.col(names[-1]).isNotNull()
    )
    out = (
        grams.groupBy(*names)
        .agg(
            F.countDistinct("_e").alias("n_entities"),
            F.count("*").alias("n_occurrences"),
        )
        .orderBy(
            F.desc("n_entities"),
            F.desc("n_occurrences"),
            *[F.asc(c) for c in names],
        )
    )
    return out.limit(top_k) if top_k is not None else out


def subsequence_support(
    events: DataFrame,
    n: int = 3,
    entity_col: str = "user_id",
    token_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Gapped length-``n`` subsequence support by the exact greedy
    earliest-witness chain (ties at equal timestamps are NOT ordered —
    the chain requires strictly increasing ``ts_col``). Output:
    t1..tn, n_entities, ordered by (n_entities desc, t1..tn asc)."""
    if n < 2:
        raise ValueError("subsequence_support needs n >= 2")
    e = events.select(
        F.col(entity_col).alias("_e"),
        F.col(token_col).alias("_t"),
        F.col(ts_col).alias("_s"),
    )
    names = [f"t{i + 1}" for i in range(n)]
    cur = e.groupBy("_e", F.col("_t").alias(names[0])).agg(
        F.min("_s").alias("_m")
    )
    for i in range(1, n - 1):
        cur = (
            cur.join(e, "_e")
            .filter(F.col("_s") > F.col("_m"))
            .groupBy("_e", *names[: i], F.col("_t").alias(names[i]))
            .agg(F.min("_s").alias("_m"))
        )
    hit = (
        cur.join(e, "_e")
        .filter(F.col("_s") > F.col("_m"))
        .select("_e", *names[: n - 1], F.col("_t").alias(names[-1]))
        .distinct()
    )
    return (
        hit.groupBy(*names)
        .agg(F.count("*").alias("n_entities"))
        .orderBy(F.desc("n_entities"), *[F.asc(c) for c in names])
    )
