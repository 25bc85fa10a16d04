"""Incremental dedup index gates: batch-split invariance (append in any
split == bulk build), estimator consistency with the batch operator's
banding, and batch-local processing (pairs discovered as docs arrive)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.dedup_index import (
    DedupIndex,
    band_df,
    signature_df,
)
from odbc2deltalake_spark.queries.registry import load_table

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    """Fixture corpus plus the same deterministic near-copies the batch
    operators inject (doc_id+1000000 = first 30 words of doc_id < 50) so
    near-dup pairs are guaranteed to exist."""
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    clones = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 30)
        ).alias("text"),
    )
    return base.unionByName(clones).localCheckpoint(eager=True)


def test_signatures_match_batch_operator_family(spark, docs):
    """signature_df must produce the same h0..h7 the batch operator's
    aggregation computes (same md5-derived family) — spot-checked by
    recomputing one doc's signature from its shingles in python."""
    import hashlib

    row = docs.filter(F.col("doc_id") == 3).first()
    words = row["text"].strip().split()
    shingles = {
        " ".join(words[i : i + 3]) for i in range(len(words) - 2)
    }
    expect = []
    for i in range(8):
        vals = []
        for sh in shingles:
            d = hashlib.md5(sh.encode()).hexdigest()
            v = int(d[:15], 16)
            w = int(d[16:31], 16)
            vals.append(v ^ (w >> i))
        expect.append(min(vals))
    got = signature_df(docs.filter(F.col("doc_id") == 3)).first()
    assert [got[f"h{i}"] for i in range(8)] == expect


def test_append_split_invariance(spark, docs, tmp_path):
    """Index(docs) built in one shot == built as three appends; and the
    union of per-batch pair discoveries == the bulk all_pairs result."""
    bulk = DedupIndex(tmp_path / "bulk")
    bulk.build(docs)
    bulk_pairs = {tuple(r) for r in bulk.all_pairs(spark).collect()}
    assert bulk_pairs, "clone corpus must contain near-dup pairs"

    inc = DedupIndex(tmp_path / "inc")
    inc.build(docs.filter(F.col("doc_id") % 3 == 0))
    seen = set()
    for m in (1, 2):
        batch = docs.filter(F.col("doc_id") % 3 == m)
        seen |= {
            tuple(r) for r in inc.append_and_find_pairs(batch).collect()
        }

    # stored tables identical
    for tbl in ("sigs", "bands"):
        a = {tuple(r) for r in getattr(bulk, tbl).read(spark).collect()}
        b = {tuple(r) for r in getattr(inc, tbl).read(spark).collect()}
        assert a == b, tbl

    # incremental discoveries: every pair involving at least one
    # non-seed-batch doc appears exactly when its second member arrives;
    # pairs fully inside the seed batch are the only ones not emitted
    seed = {r["doc_id"] for r in docs.filter(F.col("doc_id") % 3 == 0).collect()}
    expected_incremental = {
        p for p in bulk_pairs if not (p[0] in seed and p[1] in seed)
    }
    assert seen == expected_incremental


def test_estimator_detects_clones_and_orders_sanely(spark, docs, tmp_path):
    idx = DedupIndex(tmp_path / "est")
    idx.build(docs)
    pairs = idx.all_pairs(spark, threshold=0.5).collect()
    by_pair = {(r["doc_a"], r["doc_b"]): r["est_jaccard"] for r in pairs}
    # prefix clones share their whole (short) shingle set's minima often;
    # at least some clone pairs must surface with a high estimate
    clone_pairs = [
        v for (a, b), v in by_pair.items() if b == a + 1000000
    ]
    assert clone_pairs, "clone pairs must be detected"
    assert all(0.5 <= v <= 1.0 for v in by_pair.values())


def test_check_consistent_detects_partial_commit(spark, docs, tmp_path):
    idx = DedupIndex(tmp_path / "c")
    idx.build(docs)
    assert idx.check_consistent(spark)
    # simulate a crash between the two appends: sigs written, bands not
    extra = signature_df(
        docs.limit(0).sparkSession.createDataFrame(
            [(999999, "brand new words never seen")], ["doc_id", "text"]
        )
    )
    idx.sigs.write(extra, mode="append")
    assert not idx.check_consistent(spark)
    # re-appending the batch's bands repairs the invariant
    idx.bands.write(band_df(extra), mode="append", partition_by=["band"])
    assert idx.check_consistent(spark)


def test_documented_reappend_recovery_restores_consistency(spark, docs, tmp_path):
    """The crash remedy the docstring prescribes (re-append the whole
    batch) must leave check_consistent True — duplicate identical rows
    are tolerated by the distinct-counted invariant."""
    idx = DedupIndex(tmp_path / "r")
    idx.build(docs)
    batch = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 7000000).alias("doc_id"), "text"
    )
    # crash after sigs, before bands
    idx.sigs.write(signature_df(batch), mode="append")
    assert not idx.check_consistent(spark)
    # remedy: re-run the full append (duplicates both tables' rows)
    sigs2 = signature_df(batch)
    idx.sigs.write(sigs2, mode="append")
    idx.bands.write(band_df(sigs2), mode="append", partition_by=["band"])
    assert idx.check_consistent(spark)
