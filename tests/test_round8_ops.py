"""Round-8 tests: the hub-capped motif census (exact/capped split —
VERDICT r7 item 2), its mode consistency invariants, and the ADVICE r7
low-severity guards (GN convergence, retention-halflife empty input)."""

from __future__ import annotations

import pytest

from tests.conftest import SF_DIR as SF


def _k4_plus_star(spark, hub_deg=20):
    """K4 on {0,1,2,3} plus a hub vertex 100 adjacent to 20 spokes
    200..219 — a closed-form graph where the cap must drop wedges at
    the hub and nowhere else."""
    import pyspark.sql.functions as F

    k4 = [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (1, 3)]
    star = [(100, 200 + i) for i in range(hub_deg)]
    return spark.createDataFrame(
        [(min(a, b), max(a, b)) for a, b in k4 + star], "src long, dst long"
    )


def test_motif_census_exact_k4(spark):
    """Closed form on K4: 12 wedges, all closed (4 triangles),
    3 squares, nothing dropped."""
    from graphem_rapids_spark.analytics import motif_census

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (1, 3)], "src long, dst long"
    )
    row = motif_census(e, cap=0).collect()[0]
    assert (
        row["n_wedges"],
        row["n_closed"],
        row["n_triangles"],
        row["n_squares"],
        row["n_wedges_dropped"],
    ) == (12, 12, 4, 3, 0)


def test_motif_census_capped_closed_form(spark):
    """Cap=8 on K4+star(20): wedges/triangles stay EXACT (12 + C(20,2)
    = 202 wedges, 4 triangles), the hub keeps its 8 lowest-id spokes
    (C(8,2)=28 wedge pairs kept, C(20,2)-C(8,2)=162 dropped), and
    squares stay 3 (the star closes none)."""
    from graphem_rapids_spark.analytics import motif_census

    row = motif_census(_k4_plus_star(spark), cap=8).collect()[0]
    assert row["n_wedges"] == 12 + 190
    assert row["n_triangles"] == 4
    assert row["n_closed"] == 12
    assert row["n_squares"] == 3
    assert row["n_wedges_dropped"] == 190 - 28


def test_motif_census_mode_consistency(spark):
    """On the sf0.001 co-purchase graph: exact and capped modes must
    agree on the exact columns (wedges, closed, triangles); capped
    squares are a lower bound; dropped + enumerated == total wedge
    pairs is NOT an identity (kept pairs at capped centers still pair
    kept neighbors), but dropped must be positive once any degree
    exceeds the cap and zero when none does."""
    from graphem_rapids_spark.analytics import motif_census
    from graphem_rapids_spark.queries import copurchase_edges

    e = copurchase_edges(spark, SF)
    exact = motif_census(e, cap=0).collect()[0]
    capped = motif_census(e, cap=4).collect()[0]
    assert capped["n_wedges"] == exact["n_wedges"]
    assert capped["n_closed"] == exact["n_closed"]
    assert capped["n_triangles"] == exact["n_triangles"]
    assert capped["n_squares"] <= exact["n_squares"]
    max_deg = (
        e.selectExpr("src AS v")
        .unionAll(e.selectExpr("dst AS v"))
        .groupBy("v")
        .count()
        .agg({"count": "max"})
        .collect()[0][0]
    )
    if max_deg > 4:
        assert capped["n_wedges_dropped"] > 0
    else:
        assert capped["n_wedges_dropped"] == 0
    # a cap above the max degree is the exact census
    wide = motif_census(e, cap=int(max_deg)).collect()[0]
    assert tuple(wide) == tuple(exact)


def test_motif_census_auto_threshold(spark):
    """Auto mode on a tiny graph stays exact (dropped == 0)."""
    from graphem_rapids_spark.analytics import motif_census

    row = motif_census(_k4_plus_star(spark), cap=None).collect()[0]
    assert row["n_wedges_dropped"] == 0


def test_hub_fixture_is_skewed(spark):
    """The capped-census oracle fixture must actually be hub-heavy:
    its wedge-pair volume must dwarf the co-purchase graph's and the
    forced cap must drop most of it."""
    from graphem_rapids_spark.queries import (
        _MOTIF_CAP,
        graph_motif_census_capped,
    )

    row = graph_motif_census_capped(spark, SF).collect()[0]
    assert row["n_wedges_dropped"] > 0
    assert row["n_wedges_dropped"] < row["n_wedges"]
    assert row["n_triangles"] > 0  # supplier triangles close
    assert _MOTIF_CAP >= 2


def test_retention_halflife_empty_events(spark):
    """ADVICE r7: an empty events table must yield the oracle's
    (0, 0.0, 0.0, 0.0) row, not TypeError(int(None))."""
    import pyspark.sql.functions as F

    from graphem_rapids_spark import queries as Q

    empty = spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp, event_type string"
    )
    orig = Q._events
    Q._events = lambda spark, sf_dir: empty.withColumn(
        "ts", F.lit(0).cast("long")
    ).select("event_id", "user_id", "ts", "event_type")
    try:
        rows = Q.events_retention_halflife(spark, SF).collect()
    finally:
        Q._events = orig
    assert len(rows) == 1
    assert tuple(rows[0]) == (0, 0.0, 0.0, 0.0)


def test_gn_rounds_derived():
    """ADVICE r7: the GN unroll constant must derive from _CC_ROUNDS,
    not restate it."""
    from graphem_rapids_spark import queries as Q

    assert Q._GN_CC_ROUNDS == Q._CC_ROUNDS + 8


# --------------------------------------------------- r8 library lifts
def test_experiments_cuped_closed_form(spark):
    """Hand-computable CUPED: pre perfectly predicts post (post =
    2*pre) => theta = 2, rho2 = 1, cuped_diff = 0."""
    from graphem_rapids_spark.pipeline.experiments import cuped

    rows = [(p, 2 * p, t) for p, t in
            [(100, True), (200, True), (300, False), (400, False)]]
    df = spark.createDataFrame(rows, "pre long, post long, treated boolean")
    r = cuped(df).collect()[0]
    assert r["n_users"] == 4
    assert r["theta"] == 2.0
    assert r["rho2"] == 1.0
    assert r["cuped_diff"] == 0.0
    # naive diff = (2*150 - 2*350)/100 dollars = -4.0
    assert r["naive_diff"] == -4.0


def test_experiments_neyman_budget_conservation(spark):
    """Largest-remainder apportionment: Σ alloc == budget exactly,
    and a zero-variance stratum gets weight 0."""
    from graphem_rapids_spark.pipeline.experiments import neyman_allocation

    rows = (
        [("flat", 500)] * 10
        + [("wild", 0), ("wild", 1000), ("wild", 0), ("wild", 1000)]
        + [("mid", 400), ("mid", 600)] * 3
    )
    df = spark.createDataFrame(rows, "g string, c long")
    out = neyman_allocation(df, stratum_col="g", budget=97).collect()
    assert sum(r["alloc"] for r in out) == 97
    flat = next(r for r in out if r["g"] == "flat")
    assert flat["sd"] == 0.0 and flat["w6"] == 0 and flat["alloc"] == 0


def test_experiments_qini_partition_accounting(spark):
    """Decile counts partition the population; qini at the last
    decile equals total R_t - R_c * N_t/N_c."""
    from graphem_rapids_spark.pipeline.experiments import uplift_qini

    rows = [(i * 7 % 50, (i * 13) % 400, i % 2 == 0) for i in range(200)]
    df = spark.createDataFrame(rows, "pre long, post long, treated boolean")
    out = uplift_qini(df).collect()
    assert sum(r["n_treated"] + r["n_control"] for r in out) == 200
    st = sum(r[1] for r in rows if r[2])
    sc = sum(r[1] for r in rows if not r[2])
    nt = sum(1 for r in rows if r[2])
    nc = 200 - nt
    expected = round((st - sc * nt / nc) / 100.0, 6)
    assert abs(out[-1]["qini"] - expected) < 1e-9


def test_timeseries_changepoints_three_levels(spark):
    """A clean 3-level series segments into exactly 3 segments with
    the right means."""
    from graphem_rapids_spark.pipeline.timeseries import changepoints

    ys = [10] * 20 + [100] * 20 + [40] * 20
    df = spark.createDataFrame(
        [(i, y) for i, y in enumerate(ys)], "i long, y long"
    )
    segs = changepoints(df, method="opt").collect()
    assert [(s["start_day"], s["end_day"]) for s in segs] == [
        (0, 19), (20, 39), (40, 59)
    ]
    assert [s["seg_mean"] for s in segs] == [10.0, 100.0, 40.0]


def test_timeseries_cusum_level_shift(spark):
    """CUSUM peaks at the step day of a clean level shift."""
    from graphem_rapids_spark.pipeline.timeseries import cusum_changepoint

    rows = [("a", d, 1000 if d < 10 else 5000) for d in range(20)]
    daily = spark.createDataFrame(rows, "g string, d long, y long")
    out = cusum_changepoint(daily, group_cols=("g",)).collect()
    assert len(out) == 1
    assert out[0]["cp_day"] == 9  # deviation sum peaks at the last low day
    assert out[0]["n_days"] == 20


def test_keyphrases_rake_closed_form(spark):
    """Hand-computed RAKE: runs are 'machine learning' ×3 and 'new
    machine learning' ×1, so machine/learning score (2+2+2+3)/4 =
    2.25 and new scores 3/1 — the longer phrase wins (7.5 vs 4.5),
    the textbook RAKE behavior."""
    from graphem_rapids_spark.pipeline.text import keyphrases

    docs = spark.createDataFrame(
        [
            (1, "machine learning is the new machine learning"),
            (2, "machine learning is machine learning"),
        ],
        "doc_id long, text string",
    )
    out = keyphrases(docs, method="rake").collect()
    assert out[0]["phrase"] == "new machine learning"
    assert out[0]["score"] == 7.5
    ml = next(r for r in out if r["phrase"] == "machine learning")
    assert ml["n_occurrences"] == 3
    assert ml["n_words"] == 2
    assert ml["score"] == 4.5


def test_keyphrases_textrank_scores_sum_to_one(spark):
    """PageRank invariant: Σ scores == 1 (teleport-conserving) and
    the hub word of a star co-occurrence graph ranks first."""
    from graphem_rapids_spark.pipeline.text import keyphrases

    docs = spark.createDataFrame(
        [(i, f"hub spoke{i}") for i in range(6)],
        "doc_id long, text string",
    )
    out = keyphrases(docs, method="textrank", topk=100).collect()
    assert out[0]["word"] == "hub"
    assert abs(sum(r["score"] for r in out) - 1.0) < 1e-6


def test_keyphrases_unknown_method(spark):
    from graphem_rapids_spark.pipeline.text import keyphrases

    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        keyphrases(docs, method="yake")


def test_cc_vertices_universe_and_strictness(spark):
    """connected_components with a non-contiguous vertex universe
    (VERDICT r7 item 5): a 40-deep path of sparse ids labels as one
    component on BOTH algorithms; require_convergence raises when the
    minlabel budget is smaller than the diameter."""
    from graphem_rapids_spark.analytics import connected_components

    ids = [i * 977 + 13 for i in range(41)]
    edges = spark.createDataFrame(
        [(ids[i], ids[i + 1]) for i in range(40)], "src long, dst long"
    )
    verts = spark.createDataFrame([(i,) for i in ids], "id long")
    for algo in ("minlabel", "star"):
        out = connected_components(
            edges, len(ids), algorithm=algo, vertices=verts,
            require_convergence=True,
        ).collect()
        assert len(out) == 41
        assert {r["component"] for r in out} == {min(ids)}
    with pytest.raises(RuntimeError):
        connected_components(
            edges, len(ids), max_iter=5, algorithm="minlabel",
            vertices=verts, require_convergence=True,
        )


def test_unigram_prune_trajectory(spark):
    """Prune bookkeeping: each round's vocab equals the previous
    round's vocab minus its pruned count, losses are positive, and
    single characters are never pruned (the floor vocab is the
    alphabet + the surviving multi-char pieces)."""
    from graphem_rapids_spark.queries import (
        _UPRUNE_ROUNDS,
        tokenizer_unigram_prune,
    )

    rows = tokenizer_unigram_prune(spark, SF).collect()
    assert len(rows) == _UPRUNE_ROUNDS
    for a, b in zip(rows, rows[1:]):
        assert b["vocab_size"] == a["vocab_size"] - a["n_pruned"]
    assert all(r["total_loss"] > 0 for r in rows)
    assert all(r["n_pruned"] >= 0 for r in rows)


def test_gn_iter_trajectory(spark):
    """Iterated GN: cuts accumulate by _GN_CUT per round, components
    never merge back (cutting only disconnects), the largest
    component never grows, and round 1 must equal the single-step
    query's post-cut state."""
    from graphem_rapids_spark.queries import (
        _GN_CUT,
        community_girvan_newman_iter,
        community_girvan_newman_step,
    )

    rows = community_girvan_newman_iter(spark, SF).collect()
    assert [r["n_cut_total"] for r in rows] == [
        _GN_CUT * (i + 1) for i in range(len(rows))
    ]
    for a, b in zip(rows, rows[1:]):
        assert b["n_components"] >= a["n_components"]
        assert b["largest"] <= a["largest"]
    step = community_girvan_newman_step(spark, SF).collect()[0]
    assert rows[0]["n_components"] == step["n_components_after"]
    assert rows[0]["largest"] == step["largest_after"]
    assert rows[0]["modularity"] == step["modularity_after"]


def test_louvain_refined_splits_disconnected_init(spark):
    """The Leiden artifact fixture: two far-apart triangles forced
    into ONE community by init_labels. Local moves see only
    same-community neighbors (no candidate c != own), so plain
    Louvain ships the disconnected community forever; refine must
    split it and modularity must rise."""
    from graphem_rapids_spark.analytics import louvain

    tri = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    e = spark.createDataFrame(tri, "src long, dst long")
    init = spark.createDataFrame(
        [(i, 0) for i in [0, 1, 2, 10, 11, 12]], "id long, label long"
    )
    _lab_p, traj_p = louvain(e, levels=1, move_rounds=2, init_labels=init)
    _lab_r, traj_r = louvain(
        e, levels=1, move_rounds=2, init_labels=init, refine=True
    )
    assert traj_p[0][1] == 1  # plain ships ONE disconnected community
    assert traj_r[0][1] == 2  # refine splits the INIT partition
    assert traj_r[0][3] == 1  # n_split at level 0
    assert traj_r[0][2] > traj_p[0][2]  # Q strictly rises (0.5 vs 0)
    assert traj_r[-1][1] == 2  # and the final partition stays split
    lr = {r["id"]: r["community"] for r in _lab_r.collect()}
    assert lr[0] == lr[1] == lr[2]
    assert lr[10] == lr[11] == lr[12]
    assert lr[0] != lr[10]


def test_louvain_refined_connectivity_and_q(spark):
    """On the sf0.001 co-purchase graph: every refined community is
    internally CONNECTED (checked with networkx on the collected
    final labels — communities are small at this scale), and the
    refined trajectory's Q is >= the plain trajectory's at every
    level (splitting never lowers Q; relabeling only changes the
    parity phases)."""
    import networkx as nx

    from graphem_rapids_spark.analytics import louvain
    from graphem_rapids_spark.queries import copurchase_edges

    e = copurchase_edges(spark, SF)
    lab_r, traj_r = louvain(e, levels=2, move_rounds=4, refine=True)
    _lab_p, traj_p = louvain(e, levels=2, move_rounds=4, refine=False)
    for (lv_r, _nc, q_r, _ns), (lv_p, _np, q_p) in zip(traj_r, traj_p):
        assert lv_r == lv_p
        assert q_r >= q_p
    g = nx.Graph()
    g.add_edges_from((r["src"], r["dst"]) for r in e.collect())
    comm = {}
    for r in lab_r.collect():
        comm.setdefault(r["community"], set()).add(r["id"])
    for members in comm.values():
        sub = g.subgraph(members)
        assert nx.is_connected(sub), "refined community is disconnected"


def test_srm_check_closed_form(spark):
    """60/40 of 100 gives chi2 = 20^2/100 = 4.0 > 3.841 (flag);
    52/48 gives 0.16 (no flag)."""
    from graphem_rapids_spark.pipeline.experiments import srm_check

    bad = spark.createDataFrame(
        [(i < 60,) for i in range(100)], "treated boolean"
    )
    r = srm_check(bad).collect()[0]
    assert (r["n_units"], r["n_treated"], r["chi2"], r["srm_flag"]) == (
        100, 60, 4.0, 1,
    )
    ok = spark.createDataFrame(
        [(i < 52,) for i in range(100)], "treated boolean"
    )
    r = srm_check(ok).collect()[0]
    assert (r["chi2"], r["srm_flag"]) == (0.16, 0)


def test_unigram_encode_invariants(spark):
    """Apply-pass sanity: tokens per word >= 1 piece and <= chars
    (pieces are >= 1 char), so 1 <= chars_per_token <= max word
    length; languages match the documents table."""
    from graphem_rapids_spark.queries import _t, tokenizer_unigram_encode

    rows = tokenizer_unigram_encode(spark, SF).collect()
    langs = {
        r["lang"]
        for r in _t(spark, SF, "documents").select("lang").distinct().collect()
    }
    assert {r["lang"] for r in rows} == langs
    for r in rows:
        assert r["n_unigram_tokens"] >= r["n_words"]
        assert r["n_unigram_tokens"] <= r["n_chars"]
        assert 1.0 <= r["chars_per_token"]


def test_msprt_always_valid_p_monotone(spark):
    """The always-valid p-value must be monotone non-increasing in
    time, in [0, 1], and the cumulative counts must partition the
    assignment universe by the last day."""
    from graphem_rapids_spark.queries import events_always_valid_p

    rows = events_always_valid_p(spark, SF).collect()
    assert len(rows) >= 2
    ps = [r["p_always_valid"] for r in rows]
    assert all(0.0 <= p <= 1.0 for p in ps)
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    for a, b in zip(rows, rows[1:]):  # cumulative counts never shrink
        assert b["n_treated"] >= a["n_treated"]
        assert b["n_control"] >= a["n_control"]


def test_sequence_topk_invariants(spark):
    """Trigram support facts: user support never exceeds occurrence
    count, patterns draw from the 5-type taxonomy, the ranking is
    non-increasing in (n_users, n_occurrences), and every trigram's
    user support is bounded by the bigram support of its prefix."""
    from graphem_rapids_spark import queries as Q

    rows = Q.events_sequence_topk(spark, SF).collect()
    assert 0 < len(rows) <= Q._SEQ_TOPK
    types = {
        r["event_type"]
        for r in Q._events(spark, SF).select("event_type").distinct().collect()
    }
    prev = None
    for r in rows:
        assert r["n_users"] <= r["n_occurrences"]
        assert {r["t1"], r["t2"], r["t3"]} <= types
        key = (-r["n_users"], -r["n_occurrences"])
        assert prev is None or prev <= key
        prev = key


def test_subsequence_support_dominates_contiguous(spark):
    """Gapped subsequence support must dominate contiguous-trigram
    user support for every pattern (a contiguous occurrence IS a
    subsequence witness), and a pattern's support can never exceed
    the user count of its first type."""
    from graphem_rapids_spark import queries as Q

    gapped = {
        (r["t1"], r["t2"], r["t3"]): r["n_users"]
        for r in Q.events_subsequence_support(spark, SF).collect()
    }
    contiguous = Q.events_sequence_topk(spark, SF).collect()
    for r in contiguous:
        key = (r["t1"], r["t2"], r["t3"])
        assert gapped.get(key, 0) >= r["n_users"], key
    per_type = {
        r["t1"]: r["n"]
        for r in Q._events(spark, SF)
        .selectExpr("event_type as t1", "user_id")
        .distinct()
        .groupBy("t1")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for (t1, _t2, _t3), n in gapped.items():
        assert n <= per_type[t1]


def test_checkpoint_release_frees_blocks(spark):
    """DataFrame.unpersist is a cache-manager lookup and silently
    no-ops on localCheckpoint blocks; eager_checkpoint must rebind
    unpersist/release to the LogicalRDD's owning RDD so per-round
    iterative state is actually freed (storage-info entry count drops
    by one per release)."""
    from graphem_rapids_spark.checkpoint import eager_checkpoint, release

    sc = spark.sparkContext

    def ids():
        return {r.id() for r in sc._jsc.sc().getRDDStorageInfo()}

    base = ids()
    a = eager_checkpoint(spark.range(1000).selectExpr("id", "id * 2 AS y"))
    b = eager_checkpoint(spark.range(1000).selectExpr("id + 1 AS z"))
    mine = ids() - base
    assert len(mine) == 2
    assert a.count() == 1000  # readable before release
    a.unpersist()
    assert len(mine & ids()) == 1
    release(b)
    assert not (mine & ids())


def test_sequences_library_generic_n(spark):
    """pipeline.sequences must honor generic n: the n=2 contiguous
    path reproduces the transition-matrix occurrence counts, and the
    n=2 gapped path on a hand fixture enforces STRICT ts ordering
    (same-timestamp pairs are not ordered)."""
    import pyspark.sql.functions as F

    from graphem_rapids_spark import queries as Q
    from graphem_rapids_spark.pipeline import sequences as S

    e = Q._events(spark, SF).select(
        "user_id",
        F.expr("ts div 1000").alias("us"),
        "event_id",
        "event_type",
    )
    bigrams = {
        (r["t1"], r["t2"]): r["n_occurrences"]
        for r in S.ngram_support(
            e, n=2, order_cols=("us", "event_id"), token_col="event_type"
        ).collect()
    }
    trans = {
        (r["from_type"], r["to_type"]): r["n_transitions"]
        for r in Q.events_transition_topk(spark, SF).collect()
    }
    assert bigrams == trans

    fix = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 10), (2, "a", 10), (2, "b", 11)],
        "user_id long, event_type string, ts long",
    )
    got = {
        (r["t1"], r["t2"]): r["n_entities"]
        for r in S.subsequence_support(fix, n=2, ts_col="ts").collect()
    }
    assert got.get(("a", "b")) == 1  # only entity 2: strict ts order
