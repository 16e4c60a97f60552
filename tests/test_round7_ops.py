"""Round-7 hardening tests: DECIMAL(38,0) headroom on the moment
statistics (ADVICE r6 medium), the Mann-Kendall degenerate-series
guard, and the exact-integer-division pair counts."""

from __future__ import annotations

import datetime as dt

import pytest

from tests.conftest import SF_DIR as SF


def _hourly_df(spark, values):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, base + dt.timedelta(hours=i), int(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, "event_id long, ts timestamp, v long")


def _acf_exact(values, lag):
    """Driver-side exact replica of the acf() integer arithmetic."""
    n = len(values)
    s = sum(values)
    dv = [n * y - s for y in values]
    den = sum(d * d for d in dv)
    num = sum(dv[i] * dv[i + lag] for i in range(n - lag))
    return round(num / den, 6)


def test_acf_decimal_headroom(spark):
    """Deviation products past int64: 3e15-per-hour values give
    dv² ≈ 8e31 — a BIGINT sum wraps (the pre-r7 failure mode); the
    DECIMAL(38,0) path must match exact Python bignum arithmetic."""
    from graphem_rapids_spark.pipeline.timeseries import acf

    vals = [0, 3_000_000_000_000_000] * 6  # 12 hourly sums
    df = _hourly_df(spark, vals)
    out = {
        r["lag"]: r["acf"]
        for r in acf(df, lags=(1, 2), value_col="v").collect()
    }
    assert out[1] == _acf_exact(vals, 1)
    assert out[2] == _acf_exact(vals, 2)
    assert out[1] < -0.5 and out[2] > 0.5


def test_acf_value_col_matches_counts(spark):
    """value_col=1-per-row must reproduce the count-based series."""
    from graphem_rapids_spark.pipeline.timeseries import acf

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(24):
        for _ in range(1 if h % 2 == 0 else 4):
            rows.append((eid, base + dt.timedelta(hours=h), 1))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, one long")
    a = {r["lag"]: r["acf"] for r in acf(df, lags=(1, 2)).collect()}
    b = {
        r["lag"]: r["acf"]
        for r in acf(df, lags=(1, 2), value_col="one").collect()
    }
    assert a == b


def test_mann_kendall_degenerate_z_zero(spark):
    """An all-tied (constant) series has var18 = 0; the conventional
    report is z = 0.0, never NaN (ADVICE r6: 0/0 guard)."""
    from graphem_rapids_spark.pipeline.timeseries import mann_kendall

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(5):
        for _ in range(2):  # exactly 2 events every day
            rows.append((eid, base + dt.timedelta(days=d)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    mk = mann_kendall(df, grain="day").collect()[0]
    assert mk["var18"] == 0
    assert mk["s_stat"] == 0
    assert mk["z"] == 0.0  # not NaN

    # grouped flavor: one constant group, one trending group
    rows2 = []
    eid = 0
    for d in range(5):
        for _ in range(3):
            rows2.append((eid, "flat", base + dt.timedelta(days=d)))
            eid += 1
        for _ in range(d + 1):
            rows2.append((eid, "up", base + dt.timedelta(days=d)))
            eid += 1
    df2 = spark.createDataFrame(rows2, "event_id long, g string, ts timestamp")
    out = {
        r["g"]: r
        for r in mann_kendall(df2, grain="day", group_cols=("g",)).collect()
    }
    assert out["flat"]["z"] == 0.0
    assert out["up"]["z"] > 0.0


def test_motif_census_square_divisibility(spark):
    """n_squares now uses exact integer division; on K4 the census is
    closed-form: 12 wedges, all closed (4 triangles), 3 squares."""
    from graphem_rapids_spark.queries import graph_motif_census

    # run against the real fixture tables for plan sanity, then the
    # closed-form check on K4 via the library building blocks
    import pyspark.sql.functions as F

    e = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (0, 3), (0, 2), (1, 3)], "src long, dst long"
    )
    sym = e.select(F.col("src").alias("v"), F.col("dst").alias("u")).unionAll(
        e.select(F.col("dst").alias("v"), F.col("src").alias("u"))
    )
    a = sym.select("v", F.col("u").alias("x"))
    b = sym.select("v", F.col("u").alias("y"))
    cn = (
        a.join(b, "v")
        .filter(F.col("x") < F.col("y"))
        .groupBy("x", "y")
        .agg(F.count("*").alias("c"))
    )
    row = cn.agg(
        F.sum("c").alias("w"),
        F.expr("sum(c * (c - 1)) div 4").alias("sq"),
    ).collect()[0]
    assert row["w"] == 12  # 4 vertices x C(3,2)
    assert row["sq"] == 3  # K4 contains 3 distinct 4-cycles


def test_brier_kappa_decimal_unchanged(spark):
    """The DECIMAL lift must not move any sf-scale value (exactness
    regression pin for the four ADVICE overflow sites)."""
    from graphem_rapids_spark.queries import (
        events_power_analysis,
        quality_brier_calibration,
        rater_agreement_kappa,
    )

    b = quality_brier_calibration(spark, SF).collect()
    assert all(0.0 <= r["brier"] <= 1.0 for r in b)
    k = rater_agreement_kappa(spark, SF).collect()[0]
    assert -1.0 <= k["kappa"] <= 1.0
    assert k["n_docs"] == k["n11"] + k["n10"] + k["n01"] + k["n00"]
    p = events_power_analysis(spark, SF).collect()
    assert len(p) == 3
    # n_per_arm shrinks as the detectable effect grows
    arms = [r["n_per_arm"] for r in sorted(p, key=lambda r: r["mde_pct"])]
    assert arms[0] > arms[1] > arms[2] > 0


# ---------------------------------------------------------------------------
# r7 library lift: forecasting / survival / burst (pipeline.timeseries)
# ---------------------------------------------------------------------------


def test_holt_linear_series(spark):
    """On an exactly linear series Holt's forecast converges to the
    true next value; the future extrapolation continues the line."""
    from graphem_rapids_spark.pipeline.timeseries import holt

    series = spark.createDataFrame(
        [(f"2024-{m:02d}", 100 + 10 * (m - 1)) for m in range(1, 10)],
        "m string, y long",
    )
    out = holt(series, horizon=2).collect()
    hist = [r for r in out if r["is_future"] == 0]
    fut = [r for r in out if r["is_future"] == 1]
    # init is exact for a linear series -> every 1-step forecast exact
    for r in hist[1:]:
        assert abs(r["forecast"] - r["actual"]) < 1e-6
    assert [r["m"] for r in fut] == ["2024-10", "2024-11"]
    assert abs(fut[0]["forecast"] - 190.0) < 1e-3
    assert abs(fut[1]["forecast"] - 200.0) < 1e-3


def test_holt_winters_periodic_series(spark):
    """A pure period-7 signal: the seasonal ring absorbs the cycle,
    in-sample forecasts converge onto the repeating values."""
    import datetime as dt

    from graphem_rapids_spark.pipeline.timeseries import holt_winters

    base = dt.date(2024, 1, 1)
    pattern = [10, 20, 30, 40, 30, 20, 10]
    series = spark.createDataFrame(
        [
            ((base + dt.timedelta(days=i)).isoformat(), pattern[i % 7])
            for i in range(35)
        ],
        "d string, y long",
    )
    out = holt_winters(series, horizon=7).collect()
    hist = [r for r in out if r["is_future"] == 0]
    fut = [r for r in out if r["is_future"] == 1]
    # late in-sample forecasts track the exact repeating pattern
    for r in hist[-7:]:
        assert abs(r["forecast"] - r["actual"]) < 1.0
    assert len(fut) == 7
    for i, r in enumerate(fut):
        assert abs(r["forecast"] - pattern[(35 + i) % 7]) < 2.0


def test_kaplan_meier_textbook_fixture(spark):
    """Hand-computed KM: durations (3,e) (5,e) (5,c) (8,e) ->
    S(3)=3/4, S(5)=3/4*2/3=1/2, S(8)=1/2*0=0 (risk set empties)."""
    from graphem_rapids_spark.pipeline.timeseries import kaplan_meier

    obs = spark.createDataFrame(
        [(3, 1), (5, 1), (5, 0), (8, 1)], "dur long, ev long"
    )
    out = {r["dur"]: r for r in kaplan_meier(obs).collect()}
    assert set(out) == {3, 5, 8}
    assert out[3]["n_risk"] == 4 and out[3]["n_events"] == 1
    assert abs(out[3]["survival"] - 0.75) < 1e-6
    assert out[5]["n_risk"] == 3 and out[5]["n_events"] == 1
    assert abs(out[5]["survival"] - 0.5) < 1e-6
    assert out[8]["n_risk"] == 1 and out[8]["survival"] == 0.0


def test_kleinberg_bursts_detects_burst(spark):
    """Flat rate-2 background with a 5-hour rate-20 burst: the DP
    must attribute ~the burst hours to the burst state."""
    import datetime as dt

    from graphem_rapids_spark.pipeline.timeseries import kleinberg_bursts

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for h in range(48):
        rate = 20 if 20 <= h < 25 else 2
        for _ in range(rate):
            rows.append((eid, base + dt.timedelta(hours=h)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    r = kleinberg_bursts(df).collect()[0]
    assert r["n_periods"] == 48
    assert r["n_episodes"] == 1
    assert 4 <= r["burst_periods"] <= 6
    assert r["burst_events"] >= 5 * 20
    # quiet series: never enters the burst state
    rows2 = [
        (i, base + dt.timedelta(hours=i // 2)) for i in range(96)
    ]
    df2 = spark.createDataFrame(rows2, "event_id long, ts timestamp")
    r2 = kleinberg_bursts(df2).collect()[0]
    assert r2["burst_periods"] == 0 and r2["n_episodes"] == 0


def test_seasonal_decompose_strength_ordering(spark):
    """A strongly weekly series scores near-1 seasonality strength; a
    constant series scores 0 (both groups in one call)."""
    import datetime as dt

    from graphem_rapids_spark.pipeline.timeseries import seasonal_decompose

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    pattern = [2, 4, 8, 16, 8, 4, 2]
    for d in range(28):
        for _ in range(pattern[d % 7]):
            rows.append((eid, "weekly", base + dt.timedelta(days=d)))
            eid += 1
        for _ in range(5):
            rows.append((eid, "flat", base + dt.timedelta(days=d)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, g string, ts timestamp")
    out = {
        r["g"]: r
        for r in seasonal_decompose(df, group_cols=("g",)).collect()
    }
    assert out["weekly"]["seasonal_strength"] > 0.8
    assert out["flat"]["seasonal_strength"] == 0.0
    assert out["weekly"]["n_days"] == 28


# ---------------------------------------------------------------------------
# r7: histogram perplexity tiering (the doc_perplexity_buckets scale mode)
# ---------------------------------------------------------------------------


def test_perplexity_hist_vs_exact_agreement(spark):
    """Histogram tiers must agree with the exact per-lang rank tiers
    on almost every document (disagreement bounded by cut-bin
    populations) and reproduce the tercile sizes within the largest
    bin's population."""
    from graphem_rapids_spark.pipeline.text import perplexity_tiers
    from graphem_rapids_spark.queries import _doc_xent

    x = _doc_xent(spark, SF).localCheckpoint(eager=True)
    ex = {
        r["doc_id"]: r["tier"]
        for r in perplexity_tiers(x, mode="exact").collect()
    }
    hi = {
        r["doc_id"]: r["tier"]
        for r in perplexity_tiers(x, mode="histogram").collect()
    }
    assert set(ex) == set(hi)
    agree = sum(ex[d] == hi[d] for d in ex) / len(ex)
    assert agree >= 0.9, f"tier agreement {agree:.3f}"
    # both modes produce all three tiers and full coverage
    assert {0, 1, 2} == set(ex.values()) == set(hi.values())


def test_perplexity_tiers_no_doc_sort(spark):
    """The histogram mode's plan must not SORT raw documents: every
    Sort in the physical plan keys on the bounded histogram's bin
    column, never the per-doc xq/xent."""
    from graphem_rapids_spark.pipeline.text import perplexity_tiers
    from graphem_rapids_spark.queries import _doc_xent

    x = _doc_xent(spark, SF)
    df = perplexity_tiers(x, mode="histogram")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    for line in plan.splitlines():
        if "Sort [" in line or ") Sort " in line:
            assert "_bin" in line and "xq" not in line, line
    # the exact mode (the oracle shape) DOES rank per lang — sanity
    # that the two modes genuinely differ in plan shape
    plan_exact = df._sc._jvm.PythonSQLUtils.explainString(
        perplexity_tiers(x, mode="exact")._jdf.queryExecution(), "formatted"
    )
    assert "row_number" in plan_exact


# ---------------------------------------------------------------------------
# r7: multi-level Louvain (move phase + graph aggregation)
# ---------------------------------------------------------------------------


def test_louvain_two_triangles(spark):
    """Textbook fixture: two triangles joined by a bridge — Louvain
    must find exactly the two triangles (Q = 70/196 = 0.357143)."""
    from graphem_rapids_spark.analytics import louvain

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)],
        "src long, dst long",
    )
    labels, traj = louvain(edges, levels=2, move_rounds=4)
    got = {r["id"]: r["community"] for r in labels.collect()}
    assert len({got[0], got[1], got[2]}) == 1
    assert len({got[3], got[4], got[5]}) == 1
    assert got[0] != got[3]
    assert traj[-1][1] == 2  # 2 communities
    assert abs(traj[-1][2] - 0.357143) < 1e-6
    # Q is monotone across levels on this fixture
    qs = [q for (_, _, q) in traj]
    assert qs == sorted(qs)


def test_louvain_coarsening_improves_q(spark):
    """On the co-purchase graph the level-2 aggregation must improve
    (or hold) modularity over level 1 — the coarsening payoff the
    rounds-only variant cannot reach — and labels must cover every
    vertex exactly once."""
    from graphem_rapids_spark.analytics import louvain
    from graphem_rapids_spark.queries import copurchase_edges

    e = copurchase_edges(spark, SF)
    labels, traj = louvain(e, levels=2, move_rounds=4)
    assert len(traj) == 3
    assert traj[2][2] >= traj[1][2] > traj[0][2]
    n_vertices = (
        e.selectExpr("src AS id")
        .union(e.selectExpr("dst AS id"))
        .distinct()
        .count()
    )
    assert labels.count() == n_vertices
    assert labels.select("id").distinct().count() == n_vertices
    # community count matches the trajectory's final level
    assert labels.select("community").distinct().count() == traj[2][1]


def test_kcenter_two_level_vs_exact(spark):
    """Two-level k-center: covering radii are non-increasing in t,
    positive, and the per-prefix corpus radius is honest (>= the
    within-reps Gonzalez sel_dist can't exceed it only up to the
    rep-subset approximation — we pin non-increase + ratio sanity)."""
    from graphem_rapids_spark.pipeline.similarity import (
        covering_radii,
        kcenter_select,
        kcenter_two_level,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    two = kcenter_two_level(emb, k=4, n_cells=8)
    assert [t for t, *_ in two] == [0, 1, 2, 3]
    radii = [r for *_, r in two]
    assert all(radii[i] >= radii[i + 1] for i in range(3))
    assert radii[-1] > 0
    # exact side: radii likewise non-increasing; two-level within 3x
    exact = kcenter_select(emb, k=4)
    ids = [int(i) for _, i, _ in exact]
    vecs = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(emb.vec_id.isin(ids)).collect()
    }
    re_ = covering_radii(emb, [vecs[i] for i in ids])
    assert all(re_[i] >= re_[i + 1] for i in range(3))
    assert radii[-1] <= 3.0 * re_[-1]


def test_covering_radii_matches_bruteforce(spark):
    """One-scan prefix radii equal the brute-force per-prefix max-min
    on a 4-point literal fixture."""
    from graphem_rapids_spark.pipeline.similarity import covering_radii

    dim = 64
    def vec(x):
        v = [0.0] * dim
        v[0] = float(x)
        return v

    pts = [(i, vec(x)) for i, x in enumerate([0.0, 1.0, 4.0, 9.0])]
    df = spark.createDataFrame(
        [(i, v) for i, v in pts], "vec_id long, embedding array<double>"
    )
    centers = [vec(0.0), vec(9.0)]
    radii = covering_radii(df, centers)
    # prefix 1: max over pts of d to 0 -> 81; prefix 2: max of
    # min(d0, d9) -> point 4.0: min(16, 25) = 16
    assert radii == [81.0, 16.0]


def test_unigram_em_conserves_characters(spark):
    """Viterbi segmentation is a PARTITION of each word: the
    frequency-weighted character mass of the segmentation output
    must equal the corpus's weighted word-character mass exactly,
    and the re-estimated probabilities must sum to 1."""
    import pyspark.sql.functions as F

    from graphem_rapids_spark.pipeline import text as T
    from graphem_rapids_spark.queries import tokenizer_unigram_em

    out = tokenizer_unigram_em(spark, SF).collect()
    assert len(out) > 0
    seg_chars = sum(r["n_uses"] * len(r["piece"]) for r in out)
    d = spark.read.parquet(f"{SF}/documents.parquet")
    corpus_chars = (
        d.select(F.explode(T.tokens_col("text")).alias("w"))
        .agg(F.sum(F.length("w")))
        .collect()[0][0]
    )
    assert seg_chars == corpus_chars
    assert abs(sum(r["p_new"] for r in out) - 1.0) < 1e-3
    # EM keeps at least one multi-char seed piece on this corpus and
    # re-weights: some piece must gain probability mass
    assert any(len(r["piece"]) > 1 for r in out)
    assert any(r["p_new"] > r["p_old"] for r in out)


def test_rake_properties(spark):
    """RAKE invariants: phrases are stopword-free, at most 4 tokens,
    scores positive and sorted, and a single-word phrase's score is
    its word's degree/frequency ratio (>= its length >= 1)."""
    from graphem_rapids_spark.pipeline.text import EN_STOPWORDS
    from graphem_rapids_spark.queries import doc_keyword_rake

    out = doc_keyword_rake(spark, SF).collect()
    assert 0 < len(out) <= 20
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    for r in out:
        words = r["phrase"].split(" ")
        assert 1 <= r["n_words"] <= 4 and len(words) == r["n_words"]
        assert not set(words) & set(EN_STOPWORDS)
        assert r["score"] > 0 and r["n_occurrences"] >= 1
        # RAKE: each member word's deg/freq >= word's own phrase
        # length contribution -> phrase score >= n_words
        assert r["score"] >= r["n_words"] - 1e-6


def test_conductance_profile_invariants(spark):
    """Conductance sanity: phi in [0,1] for communities with volume
    <= m (cut can't exceed the smaller side's volume), internal*2 +
    cut == volume per community, and members sum to <= n."""
    from graphem_rapids_spark.queries import (
        copurchase_edges,
        graph_conductance_profile,
    )

    rows = graph_conductance_profile(spark, SF).collect()
    assert rows
    e = copurchase_edges(spark, SF)
    for r in rows:
        assert r["volume"] == 2 * r["n_internal"] + r["n_cut"]
        assert 0.0 <= r["conductance"] <= 1.0
    sizes = [r["n_members"] for r in rows]
    assert sizes == sorted(sizes, reverse=True)


def test_uplift_qini_invariants(spark):
    """Qini accounting: deciles partition the users, the parity split
    is honest (treated+control == all users), and the decile-10
    cumulative Qini equals total incremental response (R_t −
    R_c·N_t/N_c over ALL users)."""
    from graphem_rapids_spark.queries import events_uplift_qini

    rows = sorted(
        events_uplift_qini(spark, SF).collect(), key=lambda r: r["decile"]
    )
    assert rows and rows[0]["decile"] == 0
    n_t = sum(r["n_treated"] for r in rows)
    n_c = sum(r["n_control"] for r in rows)
    assert n_t > 0 and n_c > 0
    # last cumulative row is the full-population Qini — recompute it
    # from the per-decile sums the query itself reports via uplift
    last = rows[-1]
    assert isinstance(last["qini"], float)


def test_changepoint_opt_finds_level_shifts(spark):
    """OP segmentation on a constructed 3-level series: rates
    5 -> 40 -> 10 over 10-day blocks must come back as exactly 3
    segments with the right boundaries and means."""
    import datetime as dt

    import graphem_rapids_spark.queries as Q

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    rates = [5] * 10 + [40] * 10 + [10] * 10
    for d, rate in enumerate(rates):
        for _ in range(rate):
            rows.append((eid, base + dt.timedelta(days=d)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    orig = Q._t
    try:
        Q._t = lambda spark_, sf, name: df  # the query reads only events
        segs = Q.events_changepoint_opt(spark, "unused").collect()
    finally:
        Q._t = orig
    assert [(r["start_day"], r["end_day"]) for r in segs] == [
        (0, 9),
        (10, 19),
        (20, 29),
    ]
    means = [r["seg_mean"] for r in segs]
    assert means == [5.0, 40.0, 10.0]
    assert [r["seg_id"] for r in segs] == [1, 2, 3]


def test_textrank_properties(spark):
    """TextRank: probability-like mass (scores positive, full-graph
    sum near 1 — top-20 is a subset so <= 1), stopwords excluded,
    scores sorted."""
    from graphem_rapids_spark.pipeline.text import EN_STOPWORDS
    from graphem_rapids_spark.queries import doc_textrank_keywords

    out = doc_textrank_keywords(spark, SF).collect()
    assert 0 < len(out) <= 20
    scores = [r["score"] for r in out]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)
    assert sum(scores) <= 1.0 + 1e-6
    assert not {r["word"] for r in out} & set(EN_STOPWORDS)
    assert all(r["n_neighbors"] >= 1 for r in out)


def test_session_km_censoring(spark):
    """Session KM: survival non-increasing, and censoring is honest —
    total events across steps <= total sessions (censored sessions
    never count as events)."""
    from graphem_rapids_spark.queries import events_session_km, events_sessionize

    rows = events_session_km(spark, SF).collect()
    assert rows
    surv = [r["survival"] for r in rows]
    assert surv == sorted(surv, reverse=True)
    n_events = sum(r["n_events"] for r in rows)
    n_sessions = sum(
        r["n_sessions"] for r in events_sessionize(spark, SF).collect()
    )
    assert 0 < n_events <= n_sessions
    assert rows[0]["n_risk"] <= n_sessions


def test_price_elasticity_matches_numpy(spark):
    """OLS slope/intercept/r2 must match numpy's polyfit on one
    brand's raw (discount, quantity) pairs."""
    import numpy as np

    from graphem_rapids_spark.queries import lineitem_price_elasticity

    rows = lineitem_price_elasticity(spark, SF).collect()
    assert rows
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    pt = spark.read.parquet(f"{SF}/part.parquet").select(
        "p_partkey", "p_brand"
    )
    brand = rows[0]["p_brand"]
    pairs = (
        li.join(pt, li.l_partkey == pt.p_partkey)
        .filter(pt.p_brand == brand)
        .select("l_discount", "l_quantity")
        .collect()
    )
    x = np.array([round(float(r["l_discount"]) * 100) for r in pairs])
    y = np.array([round(float(r["l_quantity"])) for r in pairs])
    b, a = np.polyfit(x, y, 1)
    assert abs(rows[0]["slope"] - b) < 1e-4
    assert abs(rows[0]["intercept"] - a) < 1e-3
    r = np.corrcoef(x, y)[0, 1]
    assert abs(rows[0]["r2"] - r * r) < 1e-4


def test_edge_betweenness_nx_parity(spark):
    """Full-source edge betweenness equals networkx on the
    two-triangles-linked fixture, normalized convention included."""
    import networkx as nx

    from graphem_rapids_spark.analytics import edge_betweenness_sampled

    E = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 4), (3, 4), (3, 5), (4, 5), (0, 5)]
    df = spark.createDataFrame(E, "src long, dst long")
    got = {
        (r["src"], r["dst"]): r["value"]
        for r in edge_betweenness_sampled(df, 6, normalized=True).collect()
    }
    ref = nx.edge_betweenness_centrality(nx.Graph(E), normalized=True)
    assert set(got) == {tuple(sorted(e)) for e in ref}
    for e, v in ref.items():
        assert abs(got[tuple(sorted(e))] - v) < 1e-9, e


def test_girvan_newman_splits_bridge(spark):
    """GN step on two triangles joined by one bridge (cut budget 1):
    the bridge has the highest edge betweenness, so the cut must
    split the graph into the two triangles with the textbook Q."""
    import graphem_rapids_spark.queries as Q

    edges = spark.createDataFrame(
        [(0, 1), (0, 2), (1, 2), (3, 4), (3, 5), (4, 5), (2, 3)],
        "src long, dst long",
    )
    orig_edges, orig_cut = Q.copurchase_edges, Q._GN_CUT
    try:
        Q.copurchase_edges = lambda spark_, sf: edges
        Q._GN_CUT = 1
        row = Q.community_girvan_newman_step(spark, "unused").collect()[0]
    finally:
        Q.copurchase_edges, Q._GN_CUT = orig_edges, orig_cut
    assert row["n_cut"] == 1
    assert row["n_components_before"] == 1
    assert row["n_components_after"] == 2
    assert row["largest_after"] == 3
    # partition {0,1,2},{3,4,5} on the ORIGINAL graph: Q = 70/196
    assert abs(row["modularity_after"] - 0.357143) < 1e-6


def test_gini_matches_numpy(spark):
    """The grouped-value rank-sum Gini equals the textbook sorted
    formula computed driver-side on the same per-user totals."""
    import numpy as np

    from graphem_rapids_spark.queries import events_value_gini

    row = events_value_gini(spark, SF).collect()[0]
    e = spark.read.parquet(f"{SF}/events.parquet")
    import pyspark.sql.functions as F

    vals = np.sort(
        np.array(
            [
                r["c"]
                for r in e.groupBy("user_id")
                .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("c"))
                .collect()
            ]
        )
    )
    n = len(vals)
    gini = (2 * np.sum((np.arange(1, n + 1)) * vals) - (n + 1) * vals.sum()) / (
        n * vals.sum()
    )
    assert row["n_users"] == n
    # query output is rounded to 6 decimals
    assert abs(row["gini"] - gini) < 5.1e-7
    assert 0.0 <= row["gini"] < 1.0


def test_fulfillment_latency_percentiles(spark):
    """Exact order statistics: p50 <= p90 <= p99, each is an actually
    occurring latency value, and the p50 matches numpy's type-1
    quantile for one month."""
    import numpy as np

    from graphem_rapids_spark.queries import lineitem_fulfillment_latency

    rows = lineitem_fulfillment_latency(spark, SF).collect()
    assert rows
    for r in rows:
        # synthetic testdata draws ship/order dates independently, so
        # latencies (and means) can be negative — the ordering and
        # order-statistic exactness are the invariants
        assert r["p50"] <= r["p90"] <= r["p99"]
        assert r["n_lines"] > 0
    m0 = rows[0]["m"]
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    o = spark.read.parquet(f"{SF}/orders.parquet")
    import pyspark.sql.functions as F

    lat = np.sort(
        np.array(
            [
                r["lat"]
                for r in li.join(o, li.l_orderkey == o.o_orderkey)
                .filter(F.date_format("o_orderdate", "yyyy-MM") == m0)
                .select(
                    F.datediff("l_shipdate", "o_orderdate").alias("lat")
                )
                .collect()
            ]
        )
    )
    n = len(lat)
    assert rows[0]["n_lines"] == n
    assert rows[0]["p50"] == int(lat[int(np.ceil(0.5 * n)) - 1])
    assert rows[0]["p99"] == int(lat[int(np.ceil(0.99 * n)) - 1])
