"""Influence maximization — reference ``graphem_rapids/influence.py``.

- I1 radial top-k seed selection (``influence.py:10-37``)
- I2 Independent Cascade estimation (``influence.py:40-84``, NDlib
  semantics: every active node gets exactly one chance to activate
  each neighbor with probability p; cascade until quiescence)
- I3 greedy baseline (``influence.py:87-128``) — all candidates of a
  round evaluated **in one Spark job** by batching candidate_id as an
  extra key column (SURVEY.md §2.4)
- I4 random baseline (``benchmark.py:344-349``)

IC as dataflow: iterated frontier expansion — frontier ⋈ edges →
Bernoulli(p) hash filter → anti-join against the activated set. Monte
Carlo trials are an extra ``trial`` key column, so all trials run in
the same shuffles (no driver loop over trials).

Determinism: per-(trial, src→dst) coin flips come from the shared
cross-engine mixer (``functions.mix_uniform`` on a collision-free
(src, dst, trial) key) — partition-independent, each directed edge
fires at most once per trial (IC semantics) by construction, and —
because each directed edge gets exactly ONE coin — the cascade equals
**reachability over the live-edge subgraph**, which is what the
DuckDB oracle replays (unrolled frontier CTEs in queries.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from graphem_rapids_spark.checkpoint import (
    checkpoint_count,
    eager_materialize,
)

from graphem_rapids_spark.functions import edge_coin_key, mix_uniform
from graphem_rapids_spark.graph.canon import symmetrize_edges


def _coin(cols, seed: int):
    if len(cols) == 3:  # per-(directed-edge, trial) cascade coin
        u, v, trial = cols
        return mix_uniform(edge_coin_key(u, v, trial), seed)
    key = cols[0]
    for c in cols[1:]:  # generic sampling uniform (no oracle replay)
        key = key * F.lit(1048576) + (c % F.lit(1048576))
    return mix_uniform(key, seed)


def graphem_seed_selection(embedder, k: int, num_iterations: int = 20) -> DataFrame:
    """Run layout, rank by radial distance, take top-k
    (reference ``influence.py:10-37``). Returns (rank, id, radius)."""
    embedder.run_layout(num_iterations)
    r = embedder.radial_distances()
    top = r.orderBy(F.col("radius").desc(), F.col("id").asc()).limit(k)
    # global top-k: Spark does per-partition partial top-k + merge
    rows = top.collect()
    spark = r.sparkSession
    return spark.createDataFrame(
        [(i + 1, int(row.id), float(row.radius)) for i, row in enumerate(rows)],
        "rank int, id long, radius double",
    )


def independent_cascade(
    edges: DataFrame,
    seeds: DataFrame,
    p: float = 0.1,
    trials: int = 10,
    seed: int = 0,
    max_iter: int = 200,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Run IC; returns activated set (trial, [*key_cols], id).

    ``seeds`` must have column ``id`` (+ any ``key_cols`` for batched
    evaluation, e.g. greedy's candidate_id). All trials/keys share the
    same iteration loop — one Spark job per cascade step.
    """
    spark = edges.sparkSession
    trials_df = spark.range(trials).select(F.col("id").cast("int").alias("trial"))
    keys = ["trial", *key_cols]
    from graphem_rapids_spark import session

    broadcast_max = session.BROADCAST_POSITIONS_MAX
    # live-edge subgraph ONCE (row checkpoint): each directed edge's
    # per-trial coin is round-independent, so the cascade equals
    # reachability over the live edges — the exact formulation the
    # DuckDB oracle replays. Evaluating every coin in one pass over
    # the edge stream means each cascade round joins the frontier
    # against only the ~p·trials·|E| surviving edges, instead of
    # hash-probing all |E|·(rounds) edge rows and re-flipping coins
    # per round (measured: the probe+coin work dominated the kernel's
    # 60+ CPU-seconds at sf0.1). Same coin expression → same live set
    # → identical activated sets.
    live = eager_materialize(
        symmetrize_edges(edges)
        .crossJoin(trials_df)
        .filter(_coin([F.col("src"), F.col("dst"), F.col("trial")], seed) < p)
        .select("trial", "src", "dst")
    )
    # localCheckpoint each round: the activated set is a union chain
    # that is ALSO nested inside every anti-join — without plan
    # truncation the logical plan doubles per iteration (the classic
    # iterative-dataflow pitfall; persist() caches data but keeps the
    # plan). Checkpointing makes each round's plan O(1).
    # checkpoint_count: materialize + row count in ONE job per round
    # (the count drove a second job that re-scanned the blocks the
    # checkpoint had just written — see checkpoint.checkpoint_count)
    activated, frontier_n = checkpoint_count(
        seeds.crossJoin(trials_df).select(*keys, "id")
    )
    frontier = activated
    for _ in range(max_iter):
        # a cascade frontier is O(n·trials) mid-epidemic — broadcast
        # only while it is provably small (count is free: the frontier
        # is an eagerly-checkpointed table), else shuffle-join against
        # the live-edge table
        fr = F.broadcast(frontier) if frontier_n <= broadcast_max else frontier
        msgs = live.withColumnRenamed("src", "id").join(fr, ["trial", "id"])
        succ = msgs.select(*keys, F.col("dst").alias("id")).distinct()
        new_active, frontier_n = checkpoint_count(
            succ.join(activated, [*keys, "id"], "left_anti")
        )
        if frontier_n == 0:
            break
        # flat union of checkpointed per-round tables — no lineage
        # growth, so no extra checkpoint job per cascade round
        activated = activated.unionAll(new_active)
        frontier = new_active
    live.unpersist()
    return activated


def estimated_influence(
    edges: DataFrame,
    seeds: list[int] | DataFrame,
    p: float = 0.1,
    trials: int = 10,
    seed: int = 0,
    max_iter: int = 200,
) -> float:
    """Mean influenced-node count over Monte-Carlo trials (reference
    ``ndlib_estimated_influence``, ``influence.py:40-84``)."""
    spark = edges.sparkSession
    if not isinstance(seeds, DataFrame):
        if len(seeds) == 0:
            return 0.0
        seeds = spark.createDataFrame([(int(s),) for s in seeds], "id long")
    act = independent_cascade(edges, seeds, p, trials, seed, max_iter)
    per_trial = act.groupBy("trial").agg(F.count("*").alias("n"))
    out = per_trial.agg(F.avg("n")).first()[0]
    act.unpersist()
    return float(out or 0.0)


# exact-name alias so reference call sites (``ndlib_estimated_influence``,
# reference influence.py:40) translate 1:1
ndlib_estimated_influence = estimated_influence


def greedy_seed_selection(
    edges: DataFrame,
    n_vertices: int,
    k: int,
    p: float = 0.1,
    trials: int = 10,
    seed: int = 0,
    candidates: DataFrame | None = None,
) -> list[int]:
    """Greedy marginal-gain selection (reference ``influence.py:87-128``,
    O(k·n) simulations) — each round evaluates ALL candidates in one
    batched IC job via a ``cand`` key column."""
    spark = edges.sparkSession
    if candidates is None:
        candidates = spark.range(n_vertices).select(F.col("id").cast("long"))
    chosen: list[int] = []
    for round_i in range(k):
        cand = candidates.filter(~F.col("id").isin(chosen)).select(
            F.col("id").alias("cand")
        )
        # seed set for candidate c = chosen ∪ {c}
        if chosen:
            chosen_df = spark.createDataFrame([(int(c),) for c in chosen], "id long")
            seeds = cand.crossJoin(chosen_df).select("cand", "id").unionAll(
                cand.select("cand", F.col("cand").alias("id"))
            )
        else:
            seeds = cand.select("cand", F.col("cand").alias("id"))
        act = independent_cascade(
            edges, seeds, p, trials, seed + round_i, key_cols=("cand",)
        )
        best = (
            act.groupBy("cand", "trial")
            .agg(F.count("*").alias("n"))
            .groupBy("cand")
            .agg(F.avg("n").alias("mean_influence"))
            .orderBy(F.col("mean_influence").desc(), F.col("cand").asc())
            .first()
        )
        act.unpersist()
        chosen.append(int(best["cand"]))
    return chosen


def random_seed_baseline(
    edges: DataFrame,
    n_vertices: int,
    k: int,
    p: float = 0.1,
    trials: int = 10,
    n_sets: int = 10,
    seed: int = 0,
) -> float:
    """Mean influence of ``n_sets`` random seed sets (reference
    ``benchmark.py:344-349``) — all sets batched via a ``cand`` key."""
    spark = edges.sparkSession
    sets = spark.range(n_sets).select(F.col("id").cast("int").alias("cand"))
    verts = spark.range(n_vertices).select(F.col("id").cast("long"))
    ranked = sets.crossJoin(verts).select(
        "cand", "id", _coin([F.col("cand"), F.col("id")], seed).alias("u")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("cand").orderBy("u")
    seeds = ranked.withColumn("rk", F.row_number().over(w)).filter(
        F.col("rk") <= k
    ).select("cand", "id")
    act = independent_cascade(edges, seeds, p, trials, seed, key_cols=("cand",))
    out = (
        act.groupBy("cand", "trial")
        .agg(F.count("*").alias("n"))
        .agg(F.avg("n"))
        .first()[0]
    )
    act.unpersist()
    return float(out or 0.0)
