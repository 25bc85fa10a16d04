"""End-to-end training-corpus preparation pipeline over the documents
fixture with injected exact dups, near-dup pairs, PII, and junk docs."""

from __future__ import annotations

from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.corpus import (
    drop_exact_duplicates,
    drop_near_duplicates,
    prepare_training_corpus,
    quality_gate,
    scrub_pii,
)
from odbc2deltalake_spark.queries.registry import load_table

SF_DIR = "/root/testdata/sf0.001"


def _docs(spark):
    return load_table(spark, SF_DIR, "documents").select("doc_id", "text")


def test_drop_exact_duplicates(spark):
    docs = _docs(spark)
    n = docs.count()
    # inject whitespace/punct variants of the first 20 docs
    dups = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 500000).alias("doc_id"),
        F.concat(F.lit("  "), F.col("text"), F.lit(" !!")).alias("text"),
    )
    out = drop_exact_duplicates(docs.unionByName(dups))
    assert out.count() == n  # every injected dup dropped
    assert out.filter(F.col("doc_id") >= 500000).count() == 0  # originals kept


def test_drop_near_duplicates_keeps_canonicals(spark):
    docs = _docs(spark)
    # synthetic pair graph: 1-2, 2-3 (one cluster), 7-9 (another)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long"
    )
    out = drop_near_duplicates(docs, pairs)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 1 in kept and 7 in kept  # canonicals survive
    assert {2, 3, 9}.isdisjoint(kept)  # cluster losers dropped
    assert 4 in kept  # untouched docs survive


def test_scrub_pii(spark):
    docs = _docs(spark).limit(5).withColumn(
        "text", F.concat(F.col("text"), F.lit(" mail a.b@c.org or 555-123"))
    )
    out = scrub_pii(docs)
    rows = out.collect()
    assert all(r["n_redactions"] == 2 for r in rows)
    assert all("<EMAIL>" in r["text"] and "<PHONE>" in r["text"] for r in rows)
    assert not any("a.b@c.org" in r["text"] for r in rows)


def test_quality_gate(spark):
    docs = _docs(spark)
    junk = spark.createDataFrame([(900001, "too short")], "doc_id long, text string")
    out = quality_gate(docs.unionByName(junk), min_tokens=10)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 900001 not in kept
    assert out.count() > 0
    assert all(r["n_tokens"] >= 10 for r in out.collect())


def test_full_pipeline(spark):
    docs = _docs(spark)
    n = docs.count()
    dirty = (
        docs.unionByName(  # exact dups
            docs.filter(F.col("doc_id") < 10).select(
                (F.col("doc_id") + 500000).alias("doc_id"),
                F.concat(F.col("text"), F.lit("  ")).alias("text"),
            )
        )
        .unionByName(  # junk
            spark.createDataFrame([(900001, "tiny")], "doc_id long, text string")
        )
        .withColumn(  # PII on a slice of untouched originals only — a
            # doc and its exact dup must keep identical normalized text
            "text",
            F.when(
                (F.col("doc_id") % 7 == 0)
                & (F.col("doc_id") >= 20)
                & (F.col("doc_id") < 500000),
                F.concat(F.col("text"), F.lit(" contact x@y.io")),
            ).otherwise(F.col("text")),
        )
    )
    pairs = spark.createDataFrame([(11, 13), (13, 17)], "doc_a long, doc_b long")
    out = prepare_training_corpus(dirty, near_dup_pairs=pairs, min_tokens=5)
    kept = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 900001 not in kept  # junk gated
    assert kept.isdisjoint({13, 17})  # near-dup losers gone
    assert 11 in kept  # canonical kept
    assert max(kept) < 500000  # exact dups gone
    assert out.count() == n - 2  # all originals except near-dup losers 13, 17
    assert out.filter(F.col("text").contains("x@y.io")).count() == 0
    assert out.filter(F.col("text").contains("<EMAIL>")).count() > 0
