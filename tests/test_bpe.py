"""BPE trainer gates: the distributed fit must reproduce an independent
pure-Python BPE (same pair counting, lexicographic tie-break, greedy
non-overlapping merge), and the tokenizer must apply the merge table
consistently."""

from __future__ import annotations

import collections

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.bpe import (
    bpe_tokenize,
    fit_bpe_merges,
    word_freq_table,
)
from odbc2deltalake_spark.queries.registry import load_table

SF_DIR = "/root/testdata/sf0.001"
N_MERGES = 10


def _py_merge(syms: list[str], a: str, b: str) -> list[str]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe(word_counts: dict[str, int], n_merges: int):
    vocab = {w: list(w) for w in word_counts}
    merges = []
    for _ in range(n_merges):
        pairs: collections.Counter = collections.Counter()
        for w, syms in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += word_counts[w]
        if not pairs:
            break
        # highest freq, tie-break to the lexicographically SMALLEST pair
        freq = max(pairs.values())
        a, b = min(p for p, f in pairs.items() if f == freq)
        merges.append((a, b, freq))
        vocab = {w: _py_merge(s, a, b) for w, s in vocab.items()}
    return merges, vocab


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


@pytest.fixture(scope="module")
def py_word_counts(docs):
    wc: collections.Counter = collections.Counter()
    for r in docs.collect():
        for w in r["text"].strip().split():
            wc[w] += 1
    return dict(wc)


def test_bpe_merges_match_python_reference(spark, docs, py_word_counts):
    ref_merges, ref_vocab = _py_bpe(py_word_counts, N_MERGES)
    got = fit_bpe_merges(docs, N_MERGES)
    assert got == ref_merges

    # the trained vocab's symbol arrays match too (spot the whole table)
    vocab = word_freq_table(docs)
    from odbc2deltalake_spark.operators.bpe import merge_pair_expr

    col = F.col("syms")
    for a, b, _ in got:
        col = merge_pair_expr(col, a, b)
    final = {r["word"]: list(r["s"]) for r in vocab.select("word", col.alias("s")).collect()}
    assert final == ref_vocab


def test_bpe_tokenize_compresses_and_matches(spark, docs, py_word_counts):
    merges, ref_vocab = _py_bpe(py_word_counts, N_MERGES)
    toked = bpe_tokenize(docs, merges)
    rows = toked.collect()
    assert rows
    # token count strictly below character count (merges fired) and at
    # least the word count (merges never cross words)
    raw = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in rows[:50]:
        text = raw[r["doc_id"]]
        n_chars = sum(len(w) for w in text.strip().split())
        n_words = len(text.strip().split())
        assert n_words <= r["n_tokens"] < n_chars
        # tokens agree with applying the reference vocab word-wise
        expect = [t for w in text.strip().split() for t in ref_vocab[w]]
        assert list(r["tokens"]) == expect


def test_bpe_word_freq_weighting(spark):
    """Pair counts weight by word frequency: a corpus where 'ab' occurs
    3x and 'cd' 2x must merge (a,b) first."""
    df = spark.createDataFrame(
        [(1, "ab ab ab cd cd")], ["doc_id", "text"]
    )
    merges = fit_bpe_merges(df, 2)
    assert merges[0][:2] == ("a", "b") and merges[0][2] == 3
    assert merges[1][:2] == ("c", "d") and merges[1][2] == 2


def test_merge_fold_matches_python_on_random_sequences(spark):
    """The fold-based merge expr must agree with the reference greedy
    merge on adversarial sequences (overlaps like 'aaa', pair at start/
    end, no-op words) — 200 seeded-random cases in one job."""
    import random

    from odbc2deltalake_spark.operators.bpe import merge_pair_expr

    rng = random.Random(42)
    alphabet = ["a", "b", "c"]
    cases = [
        [rng.choice(alphabet) for _ in range(rng.randint(0, 12))]
        for _ in range(200)
    ]
    cases += [["a"], [], ["a", "a", "a", "a"], ["b", "a", "b", "a", "b"]]
    df = spark.createDataFrame(
        [(i, syms) for i, syms in enumerate(cases)], "i INT, syms ARRAY<STRING>"
    )
    for a, b in [("a", "a"), ("a", "b"), ("b", "a"), ("c", "c")]:
        got = {
            r["i"]: list(r["m"])
            for r in df.select("i", merge_pair_expr(F.col("syms"), a, b).alias("m")).collect()
        }
        for i, syms in enumerate(cases):
            assert got[i] == _py_merge(syms, a, b), (a, b, syms)


def test_batched_merges_exactly_match_sequential(spark, docs, py_word_counts):
    """VERDICT r7 #7: fit_bpe_merges_batched must produce the IDENTICAL
    merge table (pairs, order, frequencies) as the one-merge-per-round
    reference — on the corpus and on an adversarial vocab where the
    top pairs share symbols (batching must degenerate to size 1, not
    go wrong)."""
    from odbc2deltalake_spark.operators.bpe import fit_bpe_merges_batched

    ref_merges, _ = _py_bpe(py_word_counts, 25)
    got = fit_bpe_merges_batched(docs, 25)
    assert got == ref_merges

    # adversarial: 'aaaa...' makes every top pair share the symbol 'a';
    # interacting merges (a,a) -> (aa,aa) must stay strictly sequential
    rows = [(1, "aaaa aaaa aaaa"), (2, "abab abab"), (3, "aaaa abab")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    wc = {}
    for _, t in rows:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    ref, _ = _py_bpe(wc, 6)
    assert fit_bpe_merges_batched(df, 6) == ref


def test_batched_merges_use_fewer_rounds(spark, docs):
    """The point of batching: fewer count-collect rounds than merges on
    a natural corpus (tie-heavy adversarial inputs may degenerate)."""
    from odbc2deltalake_spark.operators import bpe as bpe_mod

    calls = {"n": 0}
    orig = bpe_mod._per_symbol_top2

    def counting(pc):
        calls["n"] += 1
        return orig(pc)

    bpe_mod._per_symbol_top2 = counting
    try:
        merges = bpe_mod.fit_bpe_merges_batched(docs, 20)
    finally:
        bpe_mod._per_symbol_top2 = orig
    assert len(merges) == 20
    assert calls["n"] < 20, f"batching never batched: {calls['n']} rounds"
