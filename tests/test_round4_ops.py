"""Round-4 additions: CMS / Bloom sketches, substring-span dedup,
containment join, LPA modularity — structural invariants on small
synthetic inputs (cross-engine hash parity is covered for all five by
tests/test_oracle_parity.py and the driver gate)."""

from pyspark.sql import functions as F

from graphem_rapids_spark.pipeline.dedup import (
    containment_pairs,
    substring_span_dedup,
)
from graphem_rapids_spark.queries import (
    community_modularity,
    sketch_bloom_join,
    sketch_cms_heavy_hitters,
)

SF = "/root/testdata/sf0.001"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_cms_overcount_one_sided(spark):
    out = sketch_cms_heavy_hitters(spark, SF).collect()
    assert 1 <= len(out) <= 10
    for r in out:
        # CMS never underestimates; estimate >= exact is the
        # sketch's defining guarantee
        assert r["overcount"] >= 0
        assert r["cms_est"] >= r["exact_cnt"] >= 1


def test_bloom_no_false_negatives(spark):
    row = sketch_bloom_join(spark, SF).first()
    # one-sided: every true match passes the filter
    assert row["bloom_pass"] >= row["exact_matches"]
    assert row["false_positives"] == row["bloom_pass"] - row["exact_matches"]
    assert 0.0 <= row["fp_rate"] <= 1.0
    assert 0 < row["n_bits_set"] <= 4096


def test_substring_span_dedup_flags_copied_span(spark):
    span = "a b c d e f g h"  # 8 tokens, shared verbatim
    docs = _docs(
        spark,
        [
            (1, span + " unique tail one"),
            (2, "fresh lead in then " + span),
            (3, "totally different words with no overlap at all here"),
        ],
    )
    out = {r["doc_id"]: r for r in substring_span_dedup(docs, n=8).collect()}
    assert set(out) == {2}  # doc 2 repeats a span owned by doc 1
    assert out[2]["first_owner"] == 1
    assert out[2]["n_dup_spans"] >= 1


def test_containment_catches_excerpt_jaccard_misses(spark):
    excerpt = "the quick brown fox jumps over the lazy dog today"
    long_doc = (
        "lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
        + excerpt
        + " eiusmod tempor incididunt ut labore et dolore magna aliqua "
        "ut enim ad minim veniam quis nostrud exercitation ullamco"
    )
    docs = _docs(spark, [(1, excerpt), (2, long_doc)])
    got = containment_pairs(docs, n=4, threshold=0.8).collect()
    assert len(got) == 1
    r = got[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["containment"] >= 0.8
    # the same pair fails a 0.5 Jaccard test — containment is the
    # only family that sees it
    jac = r["n_common"] / (r["n_a"] + r["n_b"] - r["n_common"])
    assert jac < 0.5


def test_modularity_bounds_and_consistency(spark):
    row = community_modularity(spark, SF).first()
    assert row["n_communities"] >= 1
    assert -0.5 <= row["modularity"] <= 1.0
    # q_num / 4m^2 must reproduce the rounded modularity
    q = row["q_num"] / (4.0 * row["m_edges"] * row["m_edges"])
    assert abs(q - row["modularity"]) < 5e-7
