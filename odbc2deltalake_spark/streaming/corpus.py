"""Streaming corpus ingestion: the training-data preparation pipeline
(`operators/corpus.py`) re-expressed for continuously-arriving documents.

A pretraining corpus at 100 TB is not built in one batch — crawl shards
land continuously, and the cleaning stages must run as they arrive. The
mapping onto Structured Streaming:

- PII scrub + quality gate are **stateless per-row maps** — identical
  code runs on stream and batch frames (unified DataFrame API).
- Exact dedup becomes **watermarked dropDuplicates** on the normalized
  content hash: state for a hash is held only within the event-time
  watermark, so state size is bounded by arrival-window volume, not by
  corpus history. (Cross-window dedup belongs to the batch compaction
  pass — the standard lambda split for dedup at scale.)
- Decontamination runs **inside foreachBatch**: the doc-level
  "any shared gram" check needs explode → semi-join → doc distinct →
  anti-join, a composition that derives a second frame from the same
  stream (unsupported as a continuous plan in append mode) but is plain
  batch algebra on each micro-batch. The eval gram table is
  benchmark-sized and broadcasts into every batch; no streaming state.

Near-dup (MinHash/CC) stays batch-side by design: label propagation is
iterative and needs the global pair graph — streaming it would mean
unbounded state for no recall gain over the nightly compaction.

The reference has no streaming surface (SURVEY.md §2.9); this extends
the engine the same way `streaming/events.py` does for event analytics.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from odbc2deltalake_spark.operators.corpus import quality_gate, scrub_pii

_GRAM_N = 8


def content_hash(col: str = "text") -> F.Column:
    """Normalized-content hash — the same normalization the batch
    `drop_exact_duplicates` uses, so stream- and batch-deduped corpora
    agree on what "identical" means."""
    return F.md5(F.lower(F.regexp_replace(F.col(col), "[^a-zA-Z0-9]", "")))


def word_ngrams(col: str = "text", n: int = _GRAM_N) -> F.Column:
    """Word n-grams as an array column (JVM split/sequence/slice — no
    Python). Empty array for docs shorter than n words."""
    w = F.split(F.trim(F.col(col)), " ")
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(w) - n),
            lambda i: F.array_join(F.slice(w, i + 1, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def eval_gram_table(eval_docs: DataFrame) -> DataFrame:
    """Distinct word n-grams of the held-out eval set — the static side
    of the per-batch decontamination join. Benchmark-sized, so Spark
    broadcasts it."""
    return eval_docs.select(F.explode(word_ngrams()).alias("g")).distinct()


def decontaminate(docs: DataFrame, eval_grams: DataFrame) -> DataFrame:
    """Drop documents sharing any word n-gram with the eval set (batch
    algebra — called per micro-batch from `start_corpus_ingest`, or
    directly on a batch frame). Same candidate shape as the
    `corpus_decontaminate` registry query: explode is linear, the
    semi join is broadcast, the doc-id distinct is the only shuffle."""
    contaminated = (
        docs.select("doc_id", F.explode(word_ngrams()).alias("g"))
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
    )
    return docs.join(contaminated, "doc_id", "left_anti")


def corpus_ingest_stream(
    docs: DataFrame,
    min_tokens: int = 10,
    watermark_delay: str = "2 hours",
    ts_col: str = "ingest_ts",
) -> DataFrame:
    """The streaming-safe prefix of the preparation flow:

        PII scrub → quality gate → watermarked exact dedup

    (scrub BEFORE gate, matching batch `prepare_training_corpus` — the
    gate counts tokens of the scrubbed text, so a doc whose only length
    came from a multi-token phone number gates identically on both
    paths and the emitted n_tokens column agrees.)

    On a streaming frame, dropDuplicates state is bounded by the
    event-time watermark on ``ts_col``; on a batch frame the identical
    code is a plain dedup. Column contract: (doc_id, text, ts_col, ...).
    """
    out = scrub_pii(docs)
    out = quality_gate(out, min_tokens)
    out = out.withColumn("__h", content_hash())
    if out.isStreaming:
        # dropDuplicatesWithinWatermark, not dropDuplicates: with the
        # event-time column absent from the subset, plain dropDuplicates
        # holds every hash ever seen — unbounded state. The
        # WithinWatermark variant expires a hash once the watermark
        # passes its arrival time (duplicates farther apart than the
        # delay re-emit; the batch compaction pass catches those).
        out = out.withWatermark(ts_col, watermark_delay)
        return out.dropDuplicatesWithinWatermark(["__h"]).drop("__h")
    return out.dropDuplicates(["__h"]).drop("__h")


def start_corpus_ingest(
    prepared: DataFrame,
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
    eval_grams: Optional[DataFrame] = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Attach the per-batch tail (decontamination, then the caller's
    sink) to a `corpus_ingest_stream` frame and start it.

    foreachBatch hands each micro-batch over as a batch DataFrame, so
    the decontamination anti join — inexpressible as a continuous
    append-mode plan — runs with full batch semantics per batch, and the
    sink callable can write transactionally (batch_id gives exactly-once
    idempotence keys, same pattern as `streaming/driver.py`)."""

    def _process(bdf: DataFrame, batch_id: int) -> None:
        out = decontaminate(bdf, eval_grams) if eval_grams is not None else bdf
        sink(out, batch_id)

    writer = prepared.writeStream.foreachBatch(_process).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
