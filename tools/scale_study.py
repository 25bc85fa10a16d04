"""Measured-scaling study for the documents-based operators.

Replicates sf0.1's documents table 10x/30x and times the headline
dedup/text/corpus operators at each size (min-of-2, same local[32]
session) — the evidence behind SCALE.md's claims that these plans are
linear-or-better in corpus size.

Replication strategy: replica k shifts doc_id by k*10^7 AND suffixes
every word with `_k`. The word rewrite keeps each replica's INTERNAL
near-dup/vocab structure identical to the original while making
replicas lexically disjoint — replicating verbatim would create a
10-deep exact-duplicate group per document, and dedup candidate volume
would then grow quadratically in the replica count, measuring the
corpus's duplication rate rather than the operator (a duplication-heavy
corpus is a real regime, but it is not the scaling question this study
answers). Vocabulary grows with the replica count as a side effect;
the affected operators (unigram LM, BM25 df) broadcast their vocab
tables, so the study also exercises that claim.

    python tools/scale_study.py [sf_dir] [factors...]   # default 1 10 30
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from odbc2deltalake_spark.queries.registry import (  # noqa: E402
    TABLE_NAMES,
    load_table,
)
from odbc2deltalake_spark.session import get_spark  # noqa: E402

QUERIES = [
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_substring_spans",
    "dedup_substring_strip",
    "corpus_decontaminate",
    "corpus_dsir_sample",
    "text_unigram_logprob",
    "text_quality_score",
    "bm25_search",
    # r7 additions: budget selection (distributed prefix sum) and
    # bigram LM (pair-count join growth)
    "corpus_token_budget_select",
    "text_bigram_logprob",
]


def build_replica_dir(spark, sf_dir: str, factor: int, out_root: str) -> str:
    """Materialize a dir usable as sf_dir with documents replicated
    ``factor``x; every other table symlinks to the original."""
    from pyspark.sql import functions as F

    out = Path(out_root) / f"x{factor}"
    out.mkdir(parents=True, exist_ok=True)
    for t in TABLE_NAMES:
        dst = out / f"{t}.parquet"
        if t == "documents":
            continue
        if not dst.exists():
            os.symlink(f"{sf_dir}/{t}.parquet", dst)
    dst = out / "documents.parquet"
    if not dst.exists():
        docs = load_table(spark, sf_dir, "documents")
        parts = []
        for k in range(factor):
            if k == 0:
                parts.append(docs)
                continue
            suffixed = F.array_join(
                F.transform(
                    F.split(F.trim(F.col("text")), r"\s+"),
                    lambda w: F.concat(w, F.lit(f"_{k}")),
                ),
                " ",
            )
            parts.append(
                docs.select(
                    (F.col("doc_id") + k * 10_000_000).alias("doc_id"),
                    suffixed.alias("text"),
                    "lang",
                    "source",
                    "n_chars",
                )
            )
        rep = parts[0]
        for p in parts[1:]:
            rep = rep.unionByName(p)
        rep.write.mode("overwrite").parquet(str(dst))
    return str(out)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    factors = [int(x) for x in sys.argv[2:]] or [1, 10, 30]
    spark = get_spark("scale_study")
    qs = entrymod.queries()
    root = tempfile.mkdtemp(prefix="scale_study_")
    results: dict[str, dict[int, float]] = {q: {} for q in QUERIES}
    try:
        for factor in factors:
            d = sf_dir if factor == 1 else build_replica_dir(
                spark, sf_dir, factor, root
            )
            load_table(spark, d, "documents").count()  # warm scan
            for q in QUERIES:
                best = None
                for _ in range(2):
                    t0 = time.time()
                    qs[q](spark, d).collect()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
                results[q][factor] = round(best, 2)
                print(f"x{factor} {q}: {results[q][factor]}s", flush=True)
        print("\n| query | " + " | ".join(f"{f}x" for f in factors) + " |")
        print("|---|" + "---|" * len(factors))
        for q in QUERIES:
            cells = " | ".join(f"{results[q][f]}s" for f in factors)
            print(f"| {q} | {cells} |")
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
