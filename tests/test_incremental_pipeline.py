"""End-to-end continuous-dedup pipeline: documents land in a versioned
table commit by commit, TableTailer delivers each commit exactly once,
and DedupIndex grows incrementally — the composition a production
ingest-and-dedup loop runs. The invariant: after any sequence of
batches, the incrementally-built index and the union of per-batch pair
discoveries equal a one-shot bulk build over everything."""

from __future__ import annotations

from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.dedup_index import DedupIndex
from odbc2deltalake_spark.queries.registry import load_table
from odbc2deltalake_spark.streaming import TableTailer
from odbc2deltalake_spark.tablestore import VersionedParquetTable

SF_DIR = "/root/testdata/sf0.001"


def test_tailer_driven_incremental_dedup_matches_bulk(spark, tmp_path):
    base = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    clones = base.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 30)
        ).alias("text"),
    )
    docs = base.unionByName(clones).localCheckpoint(eager=True)

    # landing table: three commits of interleaved docs
    landing = VersionedParquetTable(tmp_path / "landing")
    for m in range(3):
        landing.write(docs.filter(F.col("doc_id") % 3 == m), mode="append")

    idx = DedupIndex(tmp_path / "idx")
    idx.build(docs.limit(0))  # empty seed index
    tail = TableTailer(landing)
    discovered: set[tuple] = set()

    def consume(batch, from_v, to_v):
        discovered.update(
            tuple(r)
            for r in idx.append_and_find_pairs(
                batch.select("doc_id", "text")
            ).collect()
        )

    # first call delivers all three existing commits as one batch;
    # subsequent landings arrive incrementally
    assert tail.process_available(spark, consume) == (-1, 2)
    late = docs.filter(F.col("doc_id") % 3 == 0).select(
        (F.col("doc_id") + 5000000).alias("doc_id"), "text"
    )
    landing.write(late, mode="append")
    assert tail.process_available(spark, consume) == (2, 3)
    assert tail.process_available(spark, consume) is None

    # bulk reference over the full landed corpus
    bulk = DedupIndex(tmp_path / "bulk")
    bulk.build(landing.read(spark).select("doc_id", "text"))
    bulk_pairs = {tuple(r) for r in bulk.all_pairs(spark).collect()}
    assert bulk_pairs

    # stored index state identical to the bulk build
    for tbl in ("sigs", "bands"):
        a = {tuple(r) for r in getattr(idx, tbl).read(spark).collect()}
        b = {tuple(r) for r in getattr(bulk, tbl).read(spark).collect()}
        assert a == b, tbl
    # every bulk pair was discovered incrementally (seed index is empty,
    # so no pair predates the tailer)
    assert discovered == bulk_pairs
    assert idx.check_consistent(spark)
