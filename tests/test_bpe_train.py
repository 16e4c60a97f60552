"""tokenizer_bpe_train_rounds / tokenizer_bpe_encode vs an
INDEPENDENT pure-Python classic BPE implementation over the same
corpus — the DuckDB oracle proves engine parity; this proves the
shared algorithm is actually Sennrich-style BPE (pair recount on the
current segmentation, argmax merge, left-to-right non-overlapping
rewrite)."""

from __future__ import annotations

from collections import Counter

import duckdb

from graphem_rapids_spark.queries import (
    _BPE_TRAIN_ROUNDS,
    tokenizer_bpe_encode,
    tokenizer_bpe_train_rounds,
)

SF = "/root/testdata/sf0.001"


def _python_bpe(rounds: int):
    con = duckdb.connect()
    words = con.execute(
        f"""SELECT w, count(*) c FROM (
              SELECT unnest(string_split_regex(lower(text), '\\s+')) AS w
              FROM read_parquet('{SF}/documents.parquet'))
            WHERE w <> '' GROUP BY 1"""
    ).fetchall()
    state = {w: tuple(w) for w, _ in words}
    freq = {w: c for w, c in words}
    merges = []
    for r in range(1, rounds + 1):
        pc = Counter()
        for w, syms in state.items():
            c = freq[w]
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((r, a, b, a + b, cnt))
        new_state = {}
        for w, syms in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[w] = tuple(out)
        state = new_state
    return merges, state, freq


def test_train_rounds_match_reference_bpe(spark):
    got = [
        (r["round"], r["sym_a"], r["sym_b"], r["merged"], r["pair_count"])
        for r in tokenizer_bpe_train_rounds(spark, SF).collect()
    ]
    want, _, _ = _python_bpe(_BPE_TRAIN_ROUNDS)
    assert got == want


def test_encode_token_totals_match_reference(spark):
    _, state, freq = _python_bpe(_BPE_TRAIN_ROUNDS)
    total_tokens_py = sum(len(syms) * freq[w] for w, syms in state.items())
    rows = tokenizer_bpe_encode(spark, SF).collect()
    total_tokens_spark = sum(r["n_bpe_tokens"] for r in rows)
    assert total_tokens_spark == total_tokens_py
    for r in rows:
        assert r["n_bpe_tokens"] <= r["n_chars"]
        assert r["chars_per_token"] >= 1.0
