"""Text analysis operators over a documents table — language-ID
heuristic, quality scoring, token counting, fingerprinting.

All pure built-in ``pyspark.sql.functions`` (JVM-side, whole-stage
codegen) — no Python UDFs anywhere. Every operator has an exact ANSI
SQL twin (see queries.py oracles), so outputs are deterministic and
oracle-checkable.

Scale notes: everything here is embarrassingly parallel per document
(narrow transformations — zero shuffles except final aggregates);
at 100 TB these run at scan speed with full column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window

from graphem_rapids_spark.checkpoint import eager_checkpoint as _eager_ckpt
from pyspark.sql import functions as F

# tiny English stopword list for the language-ID heuristic; keep in
# sync with the SQL oracle (queries.py)
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def tokens_col(text_col="text"):
    return F.split(F.trim(F.lower(F.col(text_col))), r"\s+")


def token_stats(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_unique_tokens, avg_token_len)"""
    t = docs.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    return t.select(
        id_col,
        F.size("_t").alias("n_tokens"),
        F.size(F.array_distinct("_t")).alias("n_unique_tokens"),
        F.round(
            F.aggregate("_t", F.lit(0), lambda a, x: a + F.length(x)).cast("double")
            / F.size("_t"),
            6,
        ).alias("avg_token_len"),
    )


def quality_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: dict | None = None,
) -> DataFrame:
    """(doc_id, n_chars, n_tokens, type_token_ratio, stopword_ratio,
    quality) — the standard cheap quality heuristics (length, lexical
    diversity, stopword density).

    ``carry``: extra ``{name: Column}`` expressions evaluated in the
    SAME corpus scan and carried through the output — a fusion hook so
    a pipeline needing e.g. the exact-dedup md5 alongside the quality
    signals pays ONE pass over the raw text instead of two (at corpus
    scale a full extra read)."""
    carry = carry or {}
    t = docs.select(
        F.col(id_col),
        F.length(F.col(text_col)).alias("n_chars"),
        tokens_col(text_col).alias("_t"),
        *[c.alias(n) for n, c in carry.items()],
    )
    sw = F.array([F.lit(s) for s in EN_STOPWORDS])
    t = t.select(
        id_col,
        "n_chars",
        F.size("_t").alias("n_tokens"),
        F.round(F.size(F.array_distinct("_t")) / F.size("_t"), 6).alias("type_token_ratio"),
        F.round(
            F.size(F.filter("_t", lambda x: F.array_contains(sw, x))) / F.size("_t"), 6
        ).alias("stopword_ratio"),
        *carry.keys(),
    )
    quality = F.round(
        F.least(F.col("n_tokens") / 100.0, F.lit(1.0)) * 0.4
        + F.col("type_token_ratio") * 0.4
        + F.least(F.col("stopword_ratio") * 4.0, F.lit(1.0)) * 0.2,
        6,
    )
    return t.withColumn("quality", quality)


def language_id(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, en_stopword_ratio, pred_lang) — n-gram/stopword
    heuristic: share of tokens that are common-English stopwords."""
    t = docs.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    sw = F.array([F.lit(s) for s in EN_STOPWORDS])
    ratio = F.round(
        F.size(F.filter("_t", lambda x: F.array_contains(sw, x))) / F.size("_t"), 6
    )
    return t.select(
        id_col,
        ratio.alias("en_stopword_ratio"),
        F.when(ratio >= 0.08, F.lit("en")).otherwise(F.lit("other")).alias("pred_lang"),
    )


ROLLING_BASE = 31
ROLLING_MOD = 1_000_000_007  # prime < 2^31: h*B + c < 2^62, exact BIGINT


def rolling_fingerprint(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, rolling_fp) — Rabin–Karp polynomial rolling hash of the
    normalized text: h ← (h·B + code(cᵢ)) mod M folded left-to-right,
    all in exact BIGINT arithmetic, so the fingerprint is bit-identical
    across engines (the SQL oracle folds with list_reduce, whose
    first-element seeding equals a zero-init fold's first step).
    Complements :func:`fingerprint` (shingle min-hash, robust to local
    edits) with the incremental whole-content hash the brief's
    'rolling hash' names. ASCII/codepoint semantics match on both
    engines for the corpus alphabet."""
    fp = F.expr(
        f"aggregate(transform(sequence(1, length(lower(trim({text_col})))), "
        f"i -> CAST(ascii(substring(lower(trim({text_col})), i, 1)) AS BIGINT)), "
        f"0L, (h, c) -> (h * {ROLLING_BASE} + c) % {ROLLING_MOD})"
    )
    return docs.select(F.col(id_col), fp.alias("rolling_fp"))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    strata_col: str,
    id_col: str = "doc_id",
    seed: int = 7,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sample — the curation
    primitive that rebalances a corpus (e.g. per-language quotas)
    WITHOUT a shuffle: keep row ⇔ mixer_uniform(id, seed) < fraction
    of its stratum. The mixer (functions.mix_uniform) is exact integer
    arithmetic on both engines, so the sample — not just its size — is
    oracle-reproducible, and re-runs are stable (adding data never
    flips earlier keep decisions, the property a training-data
    pipeline needs for incremental curation). Strata missing from
    ``fractions`` are dropped (fraction 0)."""
    from graphem_rapids_spark.functions import mix_uniform

    u = mix_uniform(F.col(id_col), seed)
    frac = F.lit(0.0)
    for value, f in fractions.items():
        frac = F.when(F.col(strata_col) == value, F.lit(float(f))).otherwise(frac)
    return docs.filter(u < frac)


def pack_token_chunks(
    doc_tokens: DataFrame,
    budget: int,
    part_col: str,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """(part, chunk_id, n_docs, chunk_tokens) — greedy sequence
    packing: within each partition (e.g. language), documents in
    ``id_col`` order are packed into consecutive chunks of at most
    ``budget`` tokens (a document starts a new chunk when its
    exclusive prefix sum crosses the budget boundary — the standard
    approximation of context-window packing that needs ONE window
    pass, no sequential driver loop). Per-partition window only —
    no global sort."""
    w = (
        Window.partitionBy(part_col)
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum0 = (F.sum(tokens_col).over(w) - F.col(tokens_col)).alias("_cum0")
    staged = doc_tokens.select(
        F.col(part_col), F.col(id_col), F.col(tokens_col), cum0
    ).withColumn("chunk_id", F.expr(f"_cum0 div {int(budget)}"))
    return staged.groupBy(part_col, "chunk_id").agg(
        F.count("*").alias("n_docs"),
        F.sum(tokens_col).cast("long").alias("chunk_tokens"),
    )


# GPT-2-pretokenizer-lite word-piece pattern: alpha runs, single
# digits, punctuation runs. Deliberately engine-portable — identical
# semantics under Java regex (Spark) and RE2 (DuckDB); a real BPE
# merge table would sit on top of these pieces.
BPE_ISH_PATTERN = r"[a-z]+|[0-9]|[^a-z0-9\s]+"


def bpe_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_pieces, n_unique_pieces, n_alpha_pieces) — token
    counting under a BPE-ish regex pretokenizer (vs the whitespace
    counter in :func:`token_stats`): the unit a subword tokenizer
    would see, the standard cost estimate for LLM training data.
    One regexp_extract_all per row, all JVM-side."""
    # Spark SQL string literals process backslash escapes ('\s' → 's',
    # silently breaking the character class); DuckDB's do not — so the
    # shared pattern is escaped here and used verbatim in the oracle
    sql_pat = BPE_ISH_PATTERN.replace("\\", "\\\\")
    pieces = F.expr(
        f"regexp_extract_all(lower(trim({text_col})), '{sql_pat}', 0)"
    )
    d = docs.select(F.col(id_col), pieces.alias("_p"))
    return d.select(
        id_col,
        F.size("_p").alias("n_pieces"),
        F.size(F.array_distinct("_p")).alias("n_unique_pieces"),
        F.size(F.filter("_p", lambda x: x.rlike("^[a-z]+$"))).alias("n_alpha_pieces"),
    )


def word_ngrams_col(tokens, n: int):
    """Array column of word n-grams (space-joined) over a token array.

    Guarded so that a document with fewer than ``n`` tokens yields an
    empty array (Spark's ``sequence(1, 0)`` would DESCEND, not stop):
    ``slice`` past the end returns a short array, filtered out by the
    exact-size check. Narrow transformation — no shuffle."""
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(tokens) - (n - 1), F.lit(1))),
        lambda i: F.slice(tokens, i, n),
    )
    return F.transform(
        F.filter(grams, lambda g: F.size(g) == n), lambda g: F.array_join(g, " ")
    )


def repetition_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_2grams, dup_2gram_frac, top_2gram_frac,
    dup_3gram_frac) — Gopher-style repetition quality signals: the
    fraction of repeated word 2-/3-grams and the share of the single
    most frequent 2-gram. Documents dominated by boilerplate or
    looping generations score high and get filtered before training.

    Entirely narrow (per-row higher-order functions, zero shuffles —
    the top-gram mode is computed with an in-array count, O(d·n) per
    row on ~10²-token documents): at 100 TB this runs at scan speed.
    Mirrors the repetition-removal rules of Rae et al. (Gopher, 2021)
    §A1.1 on public record."""
    t = docs.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    g2 = word_ngrams_col(F.col("_t"), 2)
    g3 = word_ngrams_col(F.col("_t"), 3)
    d = t.select(id_col, g2.alias("_g2"), g3.alias("_g3"))
    n2 = F.size("_g2")
    n3 = F.size("_g3")
    top2 = F.array_max(
        F.transform(
            F.array_distinct("_g2"),
            lambda dg: F.size(F.filter("_g2", lambda x: x == dg)),
        )
    )
    return d.select(
        id_col,
        n2.alias("n_2grams"),
        F.when(n2 > 0, F.round(1.0 - F.size(F.array_distinct("_g2")) / n2, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
        F.when(n2 > 0, F.round(top2 / n2, 6)).otherwise(F.lit(0.0)).alias("top_2gram_frac"),
        F.when(n3 > 0, F.round(1.0 - F.size(F.array_distinct("_g3")) / n3, 6))
        .otherwise(F.lit(0.0))
        .alias("dup_3gram_frac"),
    )


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_shared) — benchmark decontamination: training
    documents that share at least one word ``n``-gram with any
    benchmark/eval document, with the count of distinct shared grams.
    The standard leakage guard before an LLM training run (GPT-3
    appendix C / PaLM-style n-gram overlap on public record).

    Scale shape: the benchmark side is the SMALL side by construction
    (eval suites are ~10⁶ grams vs a 100 TB corpus) — its distinct
    grams are broadcast, so the corpus side stays a narrow
    explode + broadcast-hash-join + per-doc aggregate; no corpus-wide
    shuffle on the gram key."""
    tg = train.select(
        F.col(id_col), F.explode(word_ngrams_col(tokens_col(text_col), n)).alias("gram")
    )
    bg = (
        benchmark.select(
            F.explode(word_ngrams_col(tokens_col(text_col), n)).alias("gram")
        )
        .distinct()
    )
    return (
        tg.join(F.broadcast(bg), "gram")
        .groupBy(id_col)
        .agg(F.count_distinct("gram").alias("n_shared"))
    )


# PII patterns — deliberately written in the common subset of Java
# regex (Spark) and RE2 (DuckDB): no backrefs, no lookaround.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\+?[0-9][0-9() .-]{6,}[0-9]"
PII_IPV4 = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_emails, n_phones, n_ips, clean_text) — PII
    redaction: emails, phone-like digit runs, and IPv4 literals are
    replaced with typed placeholder tokens, with per-document match
    counts for audit. Pure JVM-side regexes (no Python), narrow —
    scan-speed at 100 TB. Phones are redacted first so an IP-like
    digit run inside a phone match cannot double-count."""
    # F.lit patterns sidestep SQL string-literal backslash processing
    email_n = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_EMAIL), F.lit(0)))
    phone_n = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_PHONE), F.lit(0)))
    ip_n = F.size(F.regexp_extract_all(F.col(text_col), F.lit(PII_IPV4), F.lit(0)))
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col(text_col), PII_EMAIL, "<EMAIL>"),
            PII_IPV4,
            "<IP>",
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return docs.select(
        F.col(id_col),
        email_n.alias("n_emails"),
        phone_n.alias("n_phones"),
        ip_n.alias("n_ips"),
        clean.alias("clean_text"),
    )


def sliding_chunks(
    docs: DataFrame,
    size: int = 32,
    stride: int = 24,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, chunk_idx, n_chunk_tokens, head_token) — RAG-style
    sliding-window chunking: token windows of ``size`` starting every
    ``stride`` tokens (overlap = size-stride), last window may be
    short. One narrow explode per document — chunking a 100 TB corpus
    is a map-only job."""
    t = docs.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    n = F.size("_t")
    starts = F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride))
    chunks = F.transform(starts, lambda s: F.slice(F.col("_t"), s + 1, size))
    d = t.select(id_col, F.posexplode(chunks).alias("chunk_idx", "_c"))
    return d.select(
        id_col,
        "chunk_idx",
        F.size("_c").alias("n_chunk_tokens"),
        F.element_at("_c", 1).alias("head_token"),
    )


def inverted_index(
    docs: DataFrame,
    min_df: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(term, df, postings) — inverted index over whitespace tokens:
    document frequency and the sorted posting list per term (terms
    below ``min_df`` dropped). One explode + one groupBy — a single
    shuffle partitioned by term; posting lists sort inside the
    aggregate (sort_array over collect_list), so no extra window. At
    retrieval scale, postings for stopword-grade terms are the skew
    bombs — cap them upstream with ``min_df``'s dual (a max-df cut,
    cf. the MinHash shingle df-cap) or store tiered postings."""
    t = docs.select(
        F.col(id_col), F.explode(F.array_distinct(tokens_col(text_col))).alias("term")
    )
    return (
        t.groupBy("term")
        .agg(
            F.count("*").alias("df"),
            F.sort_array(F.collect_list(id_col)).alias("postings"),
        )
        .filter(F.col("df") >= min_df)
    )


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, score) — BM25 ranking of documents against a bag of
    query terms (Robertson–Spärck Jones, public record):
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1-b+b·len/avglen)),
    idf = ln((N-df+0.5)/(df+0.5) + 1).

    Scale shape: per-doc term frequencies come from one narrow pass
    (in-array counts for the handful of query terms — no corpus-wide
    term explode); the df/N/avglen statistics are scalar aggregates
    broadcast into the scoring expression; top-k is TakeOrdered on
    the ROUNDED score (deterministic cut). Only documents containing
    ≥1 query term are scored."""
    qt = [t.lower() for t in query_terms]
    t = docs.select(F.col(id_col), tokens_col(text_col).alias("_t"))
    stats = t.agg(
        F.count("*").alias("_n"),
        F.avg(F.size("_t")).alias("_avglen"),
        *[
            F.count_if(F.array_contains("_t", qt_i)).alias(f"_df{i}")
            for i, qt_i in enumerate(qt)
        ],
    )
    scored = t.crossJoin(F.broadcast(stats))

    def _tf(term):
        # NB: a two-arg lambda would be read as the (element, index)
        # HOF signature — bind the term via an enclosing scope instead
        return F.size(F.filter("_t", lambda x: x == F.lit(term)))

    score = F.lit(0.0)
    for i, term in enumerate(qt):
        tf = _tf(term)
        idf = F.log(
            (F.col("_n") - F.col(f"_df{i}") + 0.5) / (F.col(f"_df{i}") + 0.5) + 1.0
        )
        denom = tf + BM25_K1 * (1.0 - BM25_B + BM25_B * F.size("_t") / F.col("_avglen"))
        score = score + idf * (tf * (BM25_K1 + 1.0)) / denom
    out = scored.select(
        F.col(id_col),
        F.round(score, 6).alias("score"),
        F.size(
            F.filter("_t", lambda x: F.array_contains(F.array(*[F.lit(q) for q in qt]), x))
        ).alias("_hits"),
    )
    return (
        out.filter(F.col("_hits") > 0)
        .select(id_col, "score")
        .orderBy(F.col("score").desc(), F.col(id_col))
        .limit(k)
    )


def curation_signals(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fp_md5, quality, dup_2gram_frac) — the per-document
    signals a curation funnel filters on, FUSED into one narrow select
    (one pass over the text, zero shuffles) instead of three separate
    operators joined on doc_id: at 100 TB, three per-doc signal joins
    would be three co-partitioned shuffles for no reason."""
    t = docs.select(
        F.col(id_col),
        F.md5(F.col(text_col)).alias("fp_md5"),
        F.length(F.col(text_col)).alias("_nc"),
        tokens_col(text_col).alias("_t"),
    )
    sw = F.array([F.lit(s) for s in EN_STOPWORDS])
    nt = F.size("_t")
    ttr = F.round(F.size(F.array_distinct("_t")) / nt, 6)
    swr = F.round(F.size(F.filter("_t", lambda x: F.array_contains(sw, x))) / nt, 6)
    quality = F.round(
        F.least(nt / 100.0, F.lit(1.0)) * 0.4 + ttr * 0.4 + F.least(swr * 4.0, F.lit(1.0)) * 0.2,
        6,
    )
    g2 = word_ngrams_col(F.col("_t"), 2)
    d = t.withColumn("_g2", g2)
    n2 = F.size("_g2")
    dup2 = F.when(n2 > 0, F.round(1.0 - F.size(F.array_distinct("_g2")) / n2, 6)).otherwise(
        F.lit(0.0)
    )
    return d.select(id_col, "fp_md5", quality.alias("quality"), dup2.alias("dup_2gram_frac"))


def char_shingles(
    docs: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, shingle) — distinct character n-grams."""
    d = docs.select(F.col(id_col), F.lower(F.trim(F.col(text_col))).alias("_s"))
    sh = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length("_s") - (n - 1), F.lit(1))),
        lambda i: F.col("_s").substr(i, F.lit(n)),
    )
    return (
        d.select(id_col, F.explode(F.array_distinct(sh)).alias("shingle"))
        .filter(F.length("shingle") == n)
        .distinct()
    )


def fingerprint(
    docs: DataFrame, n: int = 5, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, fingerprint) — min-hash-style document fingerprint:
    lexicographic min of md5 over character n-gram shingles (a
    1-permutation MinHash; md5 is available verbatim in the SQL
    oracle, so the fingerprint is engine-portable)."""
    sh = char_shingles(docs, n, id_col, text_col)
    return sh.groupBy(id_col).agg(F.min(F.md5(F.col("shingle"))).alias("fingerprint"))


def quality_col(text_col: str = "text"):
    """Column twin of :func:`quality_score`'s ``quality`` output —
    for callers that need the score inline (streaming monitor,
    grouped statistics) without the full per-doc projection."""
    t = tokens_col(text_col)
    sw = F.array([F.lit(s) for s in EN_STOPWORDS])
    nt = F.size(t)
    ttr = F.round(F.size(F.array_distinct(t)) / nt, 6)
    swr = F.round(F.size(F.filter(t, lambda x: F.array_contains(sw, x))) / nt, 6)
    return F.round(
        F.least(nt / 100.0, F.lit(1.0)) * 0.4
        + ttr * 0.4
        + F.least(swr * 4.0, F.lit(1.0)) * 0.2,
        6,
    )


def dup2_col(text_col: str = "text"):
    """Column twin of the repetition stats' ``dup_2gram_frac``."""
    g2 = word_ngrams_col(tokens_col(text_col), 2)
    n2 = F.size(g2)
    return F.when(
        n2 > 0, F.round(1.0 - F.size(F.array_distinct(g2)) / n2, 6)
    ).otherwise(F.lit(0.0))


def perplexity_tiers(
    xent: DataFrame,
    lang_col: str = "lang",
    xent_col: str = "xent",
    id_col: str = "doc_id",
    mode: str = "exact",
    bins: int = 4096,
) -> DataFrame:
    """Per-doc CCNet head/middle/tail tier (Wenzek et al. 2020) of LM
    cross-entropy per language — (id_col, lang_col, tier) with tier
    0 = head (most fluent third), 1 = middle, 2 = tail.

    ``mode="exact"``: per-lang rank window, tier = 3·(rn−1) div
    n_lang — the exact tercile the sf-small oracle replays
    (queries.doc_perplexity_buckets), at the cost of a per-lang SORT
    of every document.

    ``mode="histogram"``: the 100 TB path — xent quantizes to a 1e6
    fixed-point integer, bins into ``bins`` equal-width integer bins
    between the per-lang min/max, and the tercile CUTS are read off
    the cumulative histogram (bounded: #langs × bins rows — the
    sketch_quantile_hist discipline; the only window runs over that
    bounded table, partitioned per lang). Docs then map to tiers via
    one broadcast join of the 2 cut bins per lang — the plan contains
    NO per-lang sort of raw documents (pinned by
    test_perplexity_tiers_no_doc_sort). A cut bin's whole population
    lands in the lower tier together, so tier sizes deviate from
    exact terciles by at most the largest bin's population; all
    arithmetic is exact integers, so the assignment is deterministic
    and engine-replayable."""
    lc, xc, ic = lang_col, xent_col, id_col
    base = xent.select(
        F.col(ic), F.col(lc),
        F.round(F.col(xc) * F.lit(1e6)).cast("long").alias("xq"),
    )
    if mode == "exact":
        w = Window.partitionBy(lc).orderBy("xq", ic)
        wl = Window.partitionBy(lc)
        return base.select(
            ic,
            lc,
            F.expr(
                f"(3 * (row_number() OVER (PARTITION BY {lc} ORDER BY xq, {ic}) - 1))"
            ).alias("_r3"),
            F.count("*").over(wl).alias("_n"),
        ).select(
            ic, lc, F.expr("_r3 div _n").cast("int").alias("tier")
        )
    if mode != "histogram":
        raise ValueError(f"mode must be 'exact' or 'histogram', got {mode!r}")
    # base fans out to THREE consumers (bounds, the bin projection,
    # and through it the histogram + final assignment) — materialize
    # the narrow (id, lang, xq) projection ONCE or every consumer
    # re-derives the caller's upstream xent chain (the
    # ReuseExchange column-pruning trap; 46→~8 exchanges on the
    # registry instantiation)
    base = base.transform(_eager_ckpt)
    bounds = base.groupBy(lc).agg(
        F.min("xq").alias("_lo"),
        F.max("xq").alias("_hi"),
        F.count("*").alias("_n"),
    )
    binned = base.join(F.broadcast(bounds), lc).select(
        ic,
        lc,
        # exact integer division — a double quotient can round up
        # across a bin boundary and disagree with the SQL replay
        F.least(
            F.lit(bins - 1).cast("long"),
            F.expr(f"((xq - _lo) * {bins}) div (_hi - _lo + 1)"),
        ).alias("_bin"),
    )
    hist = binned.groupBy(lc, "_bin").agg(F.count("*").alias("_c"))
    wc = (
        Window.partitionBy(lc)
        .orderBy("_bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.select(
        lc, "_bin", F.sum("_c").over(wc).alias("_cum")
    ).join(F.broadcast(bounds.select(lc, "_n")), lc)
    # exact-tercile targets: tier 0 holds ceil(n/3) docs, tiers 0+1
    # hold ceil(2n/3) (the 3·(rn−1) div n boundary counts) — pure
    # integer ceil so the SQL replay agrees at any n
    t1 = F.expr("(_n + 2) div 3")
    t2 = F.expr("(2 * _n + 2) div 3")
    cuts = cum.groupBy(lc).agg(
        F.min(F.when(F.col("_cum") >= t1, F.col("_bin"))).alias("_c1"),
        F.min(F.when(F.col("_cum") >= t2, F.col("_bin"))).alias("_c2"),
    )
    return binned.join(F.broadcast(cuts), lc).select(
        ic,
        lc,
        F.when(F.col("_bin") <= F.col("_c1"), F.lit(0))
        .when(F.col("_bin") <= F.col("_c2"), F.lit(1))
        .otherwise(F.lit(2))
        .cast("int")
        .alias("tier"),
    )


# ------------------------------------------------------------ keyphrases
def keyphrases(
    docs: DataFrame,
    method: str = "rake",
    id_col: str = "doc_id",
    text_col: str = "text",
    topk: int = 20,
    max_words: int = 4,
    damping: float = 0.85,
    iters: int = 12,
    stopwords=None,
) -> DataFrame:
    """Corpus keyphrase extraction (library lift r8): ``method="rake"``
    (Rose et al. 2010 — degree/frequency word scores summed over
    stopword-free phrase runs) or ``method="textrank"`` (Mihalcea &
    Tarau 2004 — weighted PageRank over the window-2 word
    co-occurrence graph). Both collapse the corpus in ONE
    doc-partitioned pass (running-stopword-count run ids / a lead
    window — never a global window); everything after is
    vocabulary-sized. RAKE output: (phrase, n_occurrences, n_words,
    score); TextRank output: (word, n_neighbors, score) — both top-k
    by (score desc, key asc), deterministic TakeOrdered."""
    if stopwords is None:
        stopwords = EN_STOPWORDS
    if method == "rake":
        return _rake(docs, id_col, text_col, topk, max_words, stopwords)
    if method == "textrank":
        return _textrank(docs, id_col, text_col, topk, damping, iters, stopwords)
    raise ValueError(f"unknown keyphrase method {method!r}")


def _rake(docs, id_col, text_col, topk, max_words, stopwords):
    """Word scores quantize to integer 1e6 fixed point via integer
    division BEFORE the per-phrase sum, so every phrase score is an
    exact integer and the cut is deterministic on any engine."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "tok"),
    ).filter(F.col("tok") != "")
    flagged = toks.select(
        "_id",
        "pos",
        "tok",
        F.col("tok").isin(list(stopwords)).alias("is_stop"),
    )
    w = (
        Window.partitionBy("_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    runs = flagged.select(
        "_id",
        "pos",
        "tok",
        "is_stop",
        F.sum(F.col("is_stop").cast("long")).over(w).alias("run"),
    )
    ph = (
        runs.filter(~F.col("is_stop"))
        .groupBy("_id", "run")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s["tok"],
                ),
                " ",
            ).alias("phrase"),
            F.count("*").alias("plen"),
        )
    )
    ph = ph.filter(F.col("plen") <= max_words)
    ws = (
        ph.select("plen", F.explode(F.split("phrase", " ")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("freq"), F.sum("plen").alias("deg"))
        .select("w", F.expr("deg * 1000000 div freq").alias("s6"))
    )
    dph = ph.groupBy("phrase").agg(
        F.count("*").alias("n_occurrences"),
        F.min("plen").alias("n_words"),
    )
    scored = (
        dph.select(
            "phrase",
            "n_occurrences",
            "n_words",
            F.explode(F.split("phrase", " ")).alias("w"),
        )
        .join(F.broadcast(ws), "w")
        .groupBy("phrase", "n_occurrences", "n_words")
        .agg(F.sum("s6").alias("score6"))
    )
    return (
        scored.orderBy(F.col("score6").desc(), F.col("phrase").asc())
        .limit(topk)
        .select(
            "phrase",
            F.col("n_occurrences").cast("long").alias("n_occurrences"),
            F.col("n_words").cast("long").alias("n_words"),
            F.round(F.col("score6").cast("double") / 1e6, 6).alias("score"),
        )
    )


def _textrank(docs, id_col, text_col, topk, damping, iters, stopwords):
    """The PageRank one-small-shuffle-per-round loop over the
    VOCABULARY-sized word graph (never the corpus); per-iteration sums
    of identical doubles rounded at 1e-9 — far above accumulated ulp
    error (the _pagerank_sql discipline)."""
    toks = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens_col(text_col)).alias("pos", "tok"),
    ).filter((F.col("tok") != "") & ~F.col("tok").isin(list(stopwords)))
    wd = Window.partitionBy("_id").orderBy("pos")
    pairs = (
        toks.select(F.col("tok").alias("a"), F.lead("tok").over(wd).alias("b"))
        .filter(F.col("b").isNotNull() & (F.col("a") != F.col("b")))
        .select(
            F.least("a", "b").alias("w1"), F.greatest("a", "b").alias("w2")
        )
        .groupBy("w1", "w2")
        .agg(F.count("*").alias("wgt"))
    )
    sym = (
        pairs.select(F.col("w1").alias("w"), F.col("w2").alias("nb"), "wgt")
        .unionAll(
            pairs.select(
                F.col("w2").alias("w"), F.col("w1").alias("nb"), "wgt"
            )
        )
        .transform(_eager_ckpt)
    )
    wsum = sym.groupBy("w").agg(
        F.sum("wgt").alias("ws"), F.count("*").alias("n_neighbors")
    ).transform(_eager_ckpt)
    n = wsum.count()
    v = wsum.select("w", (F.lit(1.0) / F.lit(float(n))).alias("v"))
    teleport = (1.0 - damping) / n
    for _ in range(iters):
        msg = (
            sym.join(wsum.select("w", "ws"), "w")
            .join(v, "w")
            .select(
                F.col("nb").alias("w"),
                (F.col("wgt") / F.col("ws") * F.col("v")).alias("m"),
            )
            .groupBy("w")
            .agg(F.sum("m").alias("s"))
        )
        v = (
            wsum.select("w")
            .join(msg, "w", "left")
            .select(
                "w",
                (
                    F.lit(teleport)
                    + F.lit(damping) * F.coalesce("s", F.lit(0.0))
                ).alias("v"),
            )
            .transform(_eager_ckpt)
        )
    return (
        v.join(wsum.select("w", "n_neighbors"), "w")
        .select(
            F.col("w").alias("word"),
            F.col("n_neighbors").cast("long").alias("n_neighbors"),
            F.round("v", 9).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("word").asc())
        .limit(topk)
    )
