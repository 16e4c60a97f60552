"""Training-data curation operators: repetition stats (Gopher-style),
n-gram decontamination, PII scrubbing, sliding-window chunking, and
SemDeDup. Crafted rows pin exact semantics; the registry oracles
cover corpus-scale parity."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from graphem_rapids_spark.pipeline.similarity import semdedup
from graphem_rapids_spark.pipeline.text import (
    decontaminate,
    pii_scrub,
    repetition_stats,
    sliding_chunks,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_stats_uniform_doc(spark):
    # "a b c d" — all 2-/3-grams distinct
    out = repetition_stats(_docs(spark, [(1, "a b c d")])).collect()[0]
    assert out.n_2grams == 3
    assert out.dup_2gram_frac == 0.0
    assert out.top_2gram_frac == pytest.approx(1 / 3, abs=1e-6)
    assert out.dup_3gram_frac == 0.0


def test_repetition_stats_looping_doc(spark):
    # "x y x y x y" → 2-grams: [x y, y x, x y, y x, x y] — 5 total,
    # 2 distinct, top (x y) appears 3 times
    out = repetition_stats(_docs(spark, [(1, "x y x y x y")])).collect()[0]
    assert out.n_2grams == 5
    assert out.dup_2gram_frac == pytest.approx(1 - 2 / 5, abs=1e-6)
    assert out.top_2gram_frac == pytest.approx(3 / 5, abs=1e-6)
    assert out.dup_3gram_frac == pytest.approx(1 - 2 / 4, abs=1e-6)


def test_repetition_stats_short_doc(spark):
    # single token: no 2-grams at all → fractions 0, not null/error
    out = repetition_stats(_docs(spark, [(1, "solo")])).collect()[0]
    assert out.n_2grams == 0
    assert out.dup_2gram_frac == 0.0
    assert out.top_2gram_frac == 0.0


def test_decontaminate_flags_shared_ngram(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps")])
    train = _docs(
        spark,
        [
            (1, "something else entirely here today"),  # clean
            (2, "saw the quick brown fox yesterday"),  # shares a 4-gram
        ],
    )
    out = {r.doc_id: r.n_shared for r in decontaminate(train, bench, n=4).collect()}
    assert out == {2: 1}


def test_pii_scrub_counts_and_redacts(spark):
    rows = [
        (1, "contact john.doe@example.com or +1 (555) 123-4567 now"),
        (2, "server at 10.0.0.1 responded"),
        (3, "no pii here at all"),
    ]
    out = {r.doc_id: r for r in pii_scrub(_docs(spark, rows)).collect()}
    assert (out[1].n_emails, out[1].n_phones, out[1].n_ips) == (1, 1, 0)
    assert "<EMAIL>" in out[1].clean_text and "<PHONE>" in out[1].clean_text
    assert "example.com" not in out[1].clean_text
    assert out[2].n_ips == 1 and "<IP>" in out[2].clean_text
    assert (out[3].n_emails, out[3].n_phones, out[3].n_ips) == (0, 0, 0)
    assert out[3].clean_text == "no pii here at all"


def test_sliding_chunks_overlap_and_tail(spark):
    # 10 tokens, size 4, stride 3 → starts 0,3,6,9; last chunk short
    text = " ".join(f"t{i}" for i in range(10))
    out = sorted(
        sliding_chunks(_docs(spark, [(1, text)]), size=4, stride=3).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [r.chunk_idx for r in out] == [0, 1, 2, 3]
    assert [r.n_chunk_tokens for r in out] == [4, 4, 4, 1]
    assert [r.head_token for r in out] == ["t0", "t3", "t6", "t9"]


def test_semdedup_drops_only_smaller_id_neighbors(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    out = semdedup(emb, threshold=0.4, n_cells=8).collect()
    assert len(out) == emb.count()
    kept = {r.vec_id for r in out if r.keep}
    dropped = {r.vec_id for r in out if not r.keep}
    # survivor rule: the smallest id of any near-dup group is kept, so
    # the globally smallest id can never be dropped
    assert min(kept | dropped) in kept
    # every cell retains at least one vector
    cells_all = {r.cell for r in out}
    cells_kept = {r.cell for r in out if r.keep}
    assert cells_all == cells_kept


def test_quality_score_carry_columns(spark):
    """The carry fusion hook evaluates extra expressions in the same
    corpus scan and must not perturb the quality columns."""
    from graphem_rapids_spark.pipeline.text import quality_score

    docs = _docs(
        spark,
        [(1, "the quick brown fox and the lazy dog"), (2, "alpha beta alpha")],
    )
    base = {r["doc_id"]: r.asDict() for r in quality_score(docs).collect()}
    carried = quality_score(
        docs, carry={"text_hash": F.md5(F.col("text"))}
    ).collect()
    expect_md5 = {
        r["doc_id"]: r["h"]
        for r in docs.select("doc_id", F.md5("text").alias("h")).collect()
    }
    assert len(carried) == len(base)
    for r in carried:
        d = r.asDict()
        assert d.pop("text_hash") == expect_md5[r["doc_id"]]
        assert d == base[r["doc_id"]]
