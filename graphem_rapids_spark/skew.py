"""Skew-mitigation utilities.

What Spark already gives (and this engine enables in ``session.py``):
- **algebraic aggregates** (count/sum/min/max/avg): map-side partial
  aggregation makes groupBy skew a non-issue — hot keys combine
  before the shuffle.
- **sort-merge joins**: AQE's skew-join splitting
  (``spark.sql.adaptive.skewJoin.enabled``) splits oversized
  partitions at runtime.

What still needs manual salting:
- **shuffled hash / broadcast-ineligible equi-joins with a hot key**
  where one side is small-ish but above the broadcast threshold;
- **holistic aggregates** (collect_list, exact distinct) on hot keys.

``salted_join`` implements the classic replicate-small/salt-big
scheme: the big side gets a deterministic salt in [0, n_salts), the
small side is exploded n_salts times, and the join keys on
(key, salt) — a hot key's rows spread over n_salts reducers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on column ``on`` with the big side
    salted across ``n_salts`` sub-keys. Output columns = big's columns
    + small's non-key columns (like ``big.join(small, on)``).

    Use when the small side exceeds the broadcast threshold AND the
    big side's key distribution is heavy-tailed (power-law graphs,
    zipfian event streams). Cost: small side is replicated ×n_salts —
    keep n_salts modest (8–32).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts))
    b = big.withColumn("_salt", salt.cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")


def salted_collect_list(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
) -> DataFrame:
    """(key, values: array) — two-stage collect_list: first within
    (key, salt) partitions, then a flatten-merge of at most n_salts
    partial arrays per key. Hot keys never funnel all their rows
    through one reducer. Order within the array is not defined (same
    as plain collect_list)."""
    salt = F.pmod(F.xxhash64(F.col(value).cast("string")), F.lit(n_salts))
    partial = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(F.collect_list(value).alias("_part"))
    )
    return (
        partial.groupBy(key)
        .agg(F.flatten(F.collect_list("_part")).alias("values"))
    )
