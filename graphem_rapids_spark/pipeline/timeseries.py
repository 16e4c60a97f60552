"""Time-series diagnostics over event streams — the library APIs
behind the ``events_*`` time-series registry queries (ACF,
Mann-Kendall), generalized to any (timestamp, …) DataFrame.

Shared scale shape: the input stream collapses FIRST to a zero-filled
calendar grid at the chosen grain (one map-side-combinable aggregate —
the only stage that sees the raw table); every statistic then runs on
that bounded grid with cross-multiplied integer arithmetic, so results
are exact and engine-portable (see queries.events_acf /
queries.events_mann_kendall for the DuckDB-oracled instantiations)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_GRAIN_SECONDS = {"hour": 3600, "day": 86400}


def dense_counts(
    df: DataFrame,
    ts_col: str = "ts",
    grain: str = "hour",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group_cols…, i, y) — per-grain event counts over the DENSE
    calendar grid spanning [min, max] of ``ts_col`` (silent periods
    zero-filled, so lag arithmetic never misaligns). ``i`` is the
    integer grid index from the first period. One aggregate over the
    stream; the grid itself is calendar-bounded."""
    if grain not in _GRAIN_SECONDS:
        raise ValueError(f"grain must be one of {sorted(_GRAIN_SECONDS)}")
    sec = _GRAIN_SECONDS[grain]
    per = (
        df.select(
            *group_cols, F.date_trunc(grain, F.col(ts_col)).alias("_g")
        )
        .groupBy(*group_cols, "_g")
        .agg(F.count("*").alias("y"))
    )
    b = per.agg(F.min("_g").alias("_g0"), F.max("_g").alias("_g1"))
    grid = b.select(
        F.explode(
            F.sequence("_g0", "_g1", F.expr(f"INTERVAL 1 {grain.upper()}"))
        ).alias("_g")
    )
    if group_cols:
        keys = per.select(*group_cols).distinct()
        grid = grid.crossJoin(keys)
    join_cols = list(group_cols) + ["_g"]
    return (
        grid.join(per, join_cols, "left")
        .crossJoin(F.broadcast(b))
        .select(
            *group_cols,
            ((F.col("_g").cast("long") - F.col("_g0").cast("long")) / sec)
            .cast("long")
            .alias("i"),
            F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y"),
        )
    )


def acf(
    df: DataFrame,
    lags: tuple[int, ...] = (1, 2, 3, 6, 12, 24, 48, 168),
    ts_col: str = "ts",
    grain: str = "hour",
) -> DataFrame:
    """(lag, n_pairs, acf) — autocorrelation of the per-grain count
    series at the given lags. Deviations are cross-multiplied
    integers (n·y_t − S): every numerator and the shared denominator
    are exact integer sums, ACF is one division. The lag align is an
    equi-join on the grid index fanned out by the lags — no global
    window. (Integer bound: n·max|dev|²·n must fit int64 — holds
    through ~1e5 events/grain on a decade grid; beyond that switch
    the dev columns to DECIMAL(38,0).)"""
    ys = dense_counts(df, ts_col=ts_col, grain=grain)
    st = ys.agg(F.count("*").alias("n"), F.sum("y").alias("s"))
    d = ys.crossJoin(F.broadcast(st)).select(
        "i", (F.col("n") * F.col("y") - F.col("s")).alias("dv")
    )
    den = d.agg(F.sum(F.col("dv") * F.col("dv")).alias("den"))
    lag_df = df.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(k).cast("long") for k in lags])).alias(
            "lag"
        )
    )
    a = d.select(F.col("i").alias("ai"), F.col("dv").alias("adv"))
    b2 = d.select(F.col("i").alias("bi"), F.col("dv").alias("bdv"))
    nums = (
        a.crossJoin(F.broadcast(lag_df))
        .join(b2, F.col("bi") == F.col("ai") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count("*").alias("n_pairs"),
            F.sum(F.col("adv") * F.col("bdv")).alias("num"),
        )
    )
    return (
        nums.crossJoin(F.broadcast(den))
        .select(
            "lag",
            "n_pairs",
            F.round(F.col("num").cast("double") / F.col("den"), 6).alias(
                "acf"
            ),
        )
        .orderBy("lag")
    )


def mann_kendall(
    df: DataFrame,
    ts_col: str = "ts",
    grain: str = "day",
    group_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(group_cols…, n, s_stat, var18, z) — Mann–Kendall monotone
    trend test of the per-grain count series, optionally per group.
    S = Σ_{i<j} sign(y_j − y_i) over the dense grid (the i<j pair
    join is grid², calendar-bounded); the tie-corrected variance
    numerator 18·Var(S) is pure integer arithmetic; z is one float
    expression."""
    ys = dense_counts(df, ts_col=ts_col, grain=grain, group_cols=group_cols)
    gl = list(group_cols)
    a = ys.select(*gl, F.col("i").alias("ai"), F.col("y").alias("ay"))
    b2 = ys.select(*gl, F.col("i").alias("bi"), F.col("y").alias("by"))
    s = (
        (a.join(b2, gl) if gl else a.crossJoin(b2))
        .filter(F.col("bi") > F.col("ai"))
        .groupBy(*gl)
        .agg(
            F.sum(F.signum(F.col("by") - F.col("ay")).cast("long")).alias(
                "s_stat"
            )
        )
    )
    nn = ys.groupBy(*gl).agg(F.count("*").alias("n"))
    ties = (
        ys.groupBy(*gl, "y")
        .agg(F.count("*").alias("t"))
        .groupBy(*gl)
        .agg(
            F.sum(
                F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)
            ).alias("tie_sum")
        )
    )
    var18 = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
        - F.col("tie_sum")
    )
    zc = (
        F.when(F.col("s_stat") > 0, F.col("s_stat") - 1)
        .when(F.col("s_stat") < 0, F.col("s_stat") + 1)
        .otherwise(0)
    )
    joined = (
        s.join(F.broadcast(nn), gl) if gl else s.crossJoin(F.broadcast(nn))
    )
    joined = (
        joined.join(F.broadcast(ties), gl)
        if gl
        else joined.crossJoin(F.broadcast(ties))
    )
    return joined.select(
        *gl,
        "n",
        "s_stat",
        var18.alias("var18"),
        F.round(
            zc.cast("double") / F.sqrt(var18.cast("double") / 18.0), 6
        ).alias("z"),
    ).orderBy(*gl) if gl else joined.select(
        "n",
        "s_stat",
        var18.alias("var18"),
        F.round(
            zc.cast("double") / F.sqrt(var18.cast("double") / 18.0), 6
        ).alias("z"),
    )
