"""Distributed BPE (byte-pair-encoding) vocabulary training — the
tokenizer-fitting stage of a training-data pipeline, run over the corpus
the engine just cleaned.

Classic BPE (Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units"): start from characters, repeatedly merge the most
frequent adjacent symbol pair. Deterministic here: ties break
lexicographically on the pair, so the merge table is reproducible and
testable against an independent pure-Python reference.

Scale shape: training operates on the WORD-FREQUENCY table, not the raw
token stream — the standard trick, and the reason this distributes: a
100 TB corpus has a Zipf-bounded distinct-word set orders of magnitude
smaller than its token count. Per merge round:
- pair counting is map-side pair generation over each word's symbol
  array (transform over ``sequence``) + one hash-groupBy on the pair,
  weighted by word frequency;
- the winning pair is a 1-row TakeOrdered collect (control plane);
- the merge application is a pure map: a left-to-right greedy fold
  (``F.aggregate`` with a (out, prev) struct accumulator) over each
  word's symbols — no shuffle, no Python in the row path.
The vocab table is localCheckpoint'ed per round so lineage stays flat
across the merge loop (same pattern as dedup_cluster / k-means).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def word_freq_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt, syms): distinct words with corpus frequencies and
    their initial character-symbol arrays. One shuffle (word groupBy)."""
    words = docs.select(
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
    ).filter(F.length("word") > 0)
    return words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt")).select(
        "word", "cnt", F.split("word", "").alias("syms")
    )


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """(a, b, freq): adjacent symbol pairs weighted by word frequency.
    Overlapping occurrences all count ("aaa" → (a,a) twice), matching
    the reference implementation."""
    pairs = F.transform(
        F.sequence(F.lit(1), F.size("syms") - 1),
        lambda i: F.struct(
            F.element_at("syms", i).alias("a"),
            F.element_at("syms", i + 1).alias("b"),
        ),
    )
    return (
        vocab.filter(F.size("syms") >= 2)
        .select("cnt", F.explode(pairs).alias("p"))
        .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .agg(F.sum("cnt").alias("freq"))
    )


def merge_pair_expr(syms, a: str, b: str):
    """Column expr: greedy left-to-right non-overlapping replacement of
    adjacent (a, b) with the merged symbol a+b — "aaa" under (a,a)
    becomes ["aa", "a"]. Pure fold, no UDF."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"),
    )

    def step(acc, x):
        is_merge = (
            acc["prev"].isNotNull()
            & (acc["prev"] == F.lit(a))
            & (x == F.lit(b))
        )
        out = F.when(
            is_merge, F.concat(acc["out"], F.array(F.lit(a + b)))
        ).otherwise(
            F.when(
                acc["prev"].isNotNull(),
                F.concat(acc["out"], F.array(acc["prev"])),
            ).otherwise(acc["out"])
        )
        prev = F.when(is_merge, F.lit(None).cast("string")).otherwise(x)
        return F.struct(out.alias("out"), prev.alias("prev"))

    def finish(acc):
        return F.when(
            acc["prev"].isNotNull(), F.concat(acc["out"], F.array(acc["prev"]))
        ).otherwise(acc["out"])

    return F.aggregate(syms, init, step, finish)


def fit_bpe_merges(
    docs: DataFrame, n_merges: int = 10, text_col: str = "text"
) -> list[tuple[str, str, int]]:
    """Learn ``n_merges`` BPE merges; returns [(left, right, freq), ...]
    in rank order. The driver holds only the merge table (control
    plane); the vocab stays distributed."""
    vocab = word_freq_table(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(vocab)
            .orderBy(F.col("freq").desc(), "a", "b")
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, freq = top[0]["a"], top[0]["b"], int(top[0]["freq"])
        merges.append((a, b, freq))
        vocab = vocab.withColumn(
            "syms", merge_pair_expr(F.col("syms"), a, b)
        ).localCheckpoint(eager=True)
    return merges


def _per_symbol_top2(pc: DataFrame) -> DataFrame:
    """(s, a, b, freq, rn<=2): each symbol's two highest-frequency
    adjacent pairs (global order: freq desc, then lexicographic pair).
    The window partitions by SYMBOL — thousands of partitions, never the
    banned single-partition global sort."""
    from pyspark.sql import Window as W

    sym = pc.select(F.col("a").alias("s"), "a", "b", "freq").unionAll(
        pc.select(F.col("b").alias("s"), "a", "b", "freq")
    )
    w = W.partitionBy("s").orderBy(F.col("freq").desc(), "a", "b")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
    )


def _select_exact_batch(
    top2_rows, max_batch: int
) -> list[tuple[str, str, int]]:
    """Walk the global ranking prefix and accept merges that are provably
    order-equivalent to one-merge-at-a-time:

    - **prefix**: candidates are taken strictly in global (freq desc, a,
      b) order and the batch STOPS at the first rejection — accepted
      pairs are exactly the global top-m. Old pairs ranked below the
      batch can only lose count under earlier merges, so they can never
      overtake.
    - **disjoint symbols**: merging (a1,b1) cannot change the count of
      (a2,b2) when {a1,b1} ∩ {a2,b2} = ∅ (occurrences of the second pair
      never contain a merged symbol), so each accepted pair's count at
      its sequential turn equals its batch-time count.
    - **cap rule**: every pair CREATED by merge j — (x, a_jb_j) or
      (a_jb_j, y) — comes from an occurrence of an EXISTING pair (x,a_j)
      / (b_j,y), so its count is bounded by cap_j = the highest count
      among pairs sharing a symbol with p_j (p_j itself excluded).
      Requiring freq_i > cap_j strictly for all accepted j<i means no
      created pair can win turn i (not even on a tie).

    The per-symbol top-2 table is sufficient: an accepted pair is top-1
    on both its symbols (anything above it sharing a symbol would be an
    earlier accepted pair, contradicting disjointness), the stopping
    pair has at most one accepted pair above it per symbol (rank <= 2),
    and cap_j reads the runner-up entries of p_j's own symbols. Absent
    pairs are rank >= 3 on both symbols — two pairs above them on one
    symbol cannot both be accepted, so the walk never needed them.
    Worst case the batch degenerates to size 1, which IS the reference
    algorithm."""
    pairs: dict[tuple[str, str], int] = {}
    by_symbol: dict[str, list[tuple[int, str, str]]] = {}
    for r in top2_rows:
        pairs[(r["a"], r["b"])] = int(r["freq"])
        by_symbol.setdefault(r["s"], []).append(
            (int(r["freq"]), r["a"], r["b"])
        )
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    accepted: list[tuple[str, str, int]] = []
    used_symbols: set[str] = set()
    caps: list[int] = []
    for (a, b), freq in ranked:
        if len(accepted) >= max_batch:
            break
        if accepted:
            if a in used_symbols or b in used_symbols:
                break  # prefix rule: stop at the first rejection
            if any(freq <= c for c in caps):
                break
        cap = 0
        for s in (a, b):
            for f2, a2, b2 in by_symbol.get(s, ()):
                if (a2, b2) != (a, b):
                    cap = max(cap, f2)
        accepted.append((a, b, freq))
        used_symbols.update((a, b))
        caps.append(cap)
    return accepted


def fit_bpe_merges_batched(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    max_batch: int = 16,
) -> list[tuple[str, str, int]]:
    """Exactly the merges of :func:`fit_bpe_merges`, in the same order,
    with FEWER jobs: per round, one pair-count job collects the
    per-symbol top-2 table (2 x |symbols| rows — alphabet-plus-learned-
    vocab sized, a control-plane collect), the driver accepts a provably
    order-equivalent PREFIX of merges (see :func:`_select_exact_batch`),
    and one map pass applies them all. Round count drops from
    ``n_merges`` to ``n_merges / avg_batch`` — the production fix for
    the one-collect-per-merge trade-off recorded in SCALE.md, exactness
    cross-checked in tests/test_bpe.py."""
    vocab = word_freq_table(docs, text_col).localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    while len(merges) < n_merges:
        top2 = _per_symbol_top2(_pair_counts(vocab)).collect()
        batch = _select_exact_batch(top2, n_merges - len(merges))
        if not batch:
            break
        merges.extend(batch)
        col = F.col("syms")
        for a, b, _ in batch:
            col = merge_pair_expr(col, a, b)
        vocab = vocab.withColumn("syms", col).localCheckpoint(eager=True)
    return merges


def bpe_tokenize(
    docs: DataFrame, merges: list[tuple[str, str, int]], text_col: str = "text"
) -> DataFrame:
    """Apply a learned merge table to a corpus: (doc_id, tokens,
    n_tokens). Each merge is one map pass (the fold above); the whole
    tokenizer is ``len(merges)`` narrow stages over one scan — no
    shuffle at all."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    # per-word symbol arrays, merged word-wise then flattened — merges
    # never cross word boundaries
    out = docs.select(
        "doc_id", F.transform(toks, lambda w: F.split(w, "")).alias("words")
    )
    col = F.col("words")
    for a, b, _ in merges:
        col = F.transform(col, lambda w: merge_pair_expr(w, a, b))
    flat = F.flatten(col)
    return out.select(
        "doc_id", flat.alias("tokens"), F.size(flat).alias("n_tokens")
    )
