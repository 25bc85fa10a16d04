"""Streaming corpus ingestion vs its batch twin.

The stream (file source, one file per micro-batch) must produce the same
prepared corpus as running the batch pipeline over all documents at once.
Comparison is at content-hash granularity: exact-dedup keeps an arbitrary
representative per hash group (both engines' semantics), so surviving
doc_ids may differ between runs while the surviving *content* set is
deterministic — identical text implies identical grams and therefore
identical contamination status.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from odbc2deltalake_spark.queries.registry import load_table
from odbc2deltalake_spark.streaming import (
    corpus_ingest_stream,
    decontaminate,
    eval_gram_table,
    start_corpus_ingest,
)
from odbc2deltalake_spark.streaming.corpus import content_hash

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    """Fixture docs + a synthetic event-time column and injected exact
    duplicates that straddle the later file split (doc_id < 20 cloned at
    +1000000, landing in the other half when split on doc_id parity)."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    clones = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )
    return docs.unionByName(clones).withColumn(
        "ingest_ts", F.timestamp_micros(F.lit(1_700_000_000_000_000) + F.col("doc_id"))
    )


def _hashes(df):
    return sorted(
        r["h"] for r in df.select(content_hash().alias("h")).distinct().collect()
    )


def test_corpus_ingest_stream_matches_batch(spark, tmp_path):
    all_docs = _docs(spark)
    eval_docs = all_docs.filter(F.col("doc_id") % 17 == 0)
    train_docs = all_docs.filter(F.col("doc_id") % 17 != 0)
    eval_grams = eval_gram_table(eval_docs)

    batch_out = decontaminate(corpus_ingest_stream(train_docs), eval_grams)
    batch_hashes = _hashes(batch_out)
    # the fixture must exercise the dedup and decontamination stages
    assert 0 < len(batch_hashes) < train_docs.count()

    # stream the same docs as two parquet files, one per micro-batch, so
    # dedup state must carry across batches
    src = tmp_path / "src"
    train_docs.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))
    train_docs.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append"
    ).parquet(str(src))

    stream = (
        spark.readStream.schema(train_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    seen: list = []
    q = start_corpus_ingest(
        corpus_ingest_stream(stream),
        sink=lambda bdf, bid: seen.extend(
            r["h"] for r in bdf.select(content_hash().alias("h")).collect()
        ),
        checkpoint_dir=str(tmp_path / "ckpt"),
        eval_grams=eval_grams,
    )
    q.awaitTermination(180)
    assert sorted(set(seen)) == batch_hashes


def test_streaming_dedup_carries_state_across_batches(spark, tmp_path):
    """A duplicate arriving in a LATER micro-batch (within the watermark)
    must be dropped by the carried dropDuplicates state."""
    all_docs = _docs(spark)
    # clone pairs straddle the parity split: original doc_id d (even, say)
    # and clone d+1000000 (same parity!) — so force the split by id range
    first = all_docs.filter(F.col("doc_id") < 1_000_000)
    second = all_docs.filter(F.col("doc_id") >= 1_000_000)  # pure clones
    src = tmp_path / "src"
    first.coalesce(1).write.mode("append").parquet(str(src))
    second.coalesce(1).write.mode("append").parquet(str(src))

    stream = (
        spark.readStream.schema(all_docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    seen: list = []
    q = start_corpus_ingest(
        corpus_ingest_stream(stream),
        sink=lambda bdf, bid: seen.extend(
            r["doc_id"] for r in bdf.select("doc_id").collect()
        ),
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    q.awaitTermination(180)
    # every clone's content already arrived in batch 1 → no clone survives
    assert all(d < 1_000_000 for d in seen)
    assert len(seen) == len(set(seen))
