"""End-to-end continuous ANN-index maintenance: embedding batches land
in a versioned table commit by commit, TableTailer delivers each commit
exactly once, and IvfIndex grows by partition-local appends against the
pinned coarse quantizer — the streaming twin of the tailer-driven dedup
pipeline (tests/test_incremental_pipeline.py). Invariants:

- incremental (build-then-append per tailed commit) == one-shot bulk
  build over everything, given the same pinned centroids — cells table
  AND probe results identical;
- a skew-concentrated late batch trips the staleness monitor, and
  rebuild() restores balance without losing vectors."""

from __future__ import annotations

from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.ann_index import IvfIndex
from odbc2deltalake_spark.queries.registry import load_table
from odbc2deltalake_spark.streaming import TableTailer
from odbc2deltalake_spark.tablestore import VersionedParquetTable

SF_DIR = "/root/testdata/sf0.001"


def _vectors(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select("vec_id", "label", dbl.alias("v"))


def test_tailer_driven_incremental_ann_matches_bulk(spark, tmp_path):
    vectors = _vectors(spark).localCheckpoint(eager=True)

    landing = VersionedParquetTable(tmp_path / "landing")
    for m in range(3):
        landing.write(vectors.filter(F.col("vec_id") % 3 == m), mode="append")

    idx = IvfIndex(tmp_path / "idx")
    tail = TableTailer(landing)
    deliveries = []

    def consume(batch, from_v, to_v):
        deliveries.append((from_v, to_v))
        batch = batch.select("vec_id", "label", "v")
        if from_v == -1:
            idx.build(batch)
        else:
            idx.append(batch)

    # first call delivers the three existing commits as one batch
    assert tail.process_available(spark, consume) == (-1, 2)
    late = vectors.filter(F.col("vec_id") % 3 == 0).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "label", "v"
    )
    landing.write(late, mode="append")
    assert tail.process_available(spark, consume) == (2, 3)
    assert tail.process_available(spark, consume) is None
    assert deliveries == [(-1, 2), (2, 3)]

    # bulk reference over the full landed corpus, pinned to the SAME
    # quantizer the incremental index fitted on its first delivery
    bulk = IvfIndex(tmp_path / "bulk")
    bulk.build(
        landing.read(spark).select("vec_id", "label", "v"),
        centroids=idx.centroids.read(spark),
    )

    a = {
        (r["vec_id"], r["cid"]) for r in idx.cells.read(spark).collect()
    }
    b = {
        (r["vec_id"], r["cid"]) for r in bulk.cells.read(spark).collect()
    }
    assert a == b and len(a) == vectors.count() + late.count()

    q = vectors.filter(F.col("vec_id") == 0).first()["v"]
    got = [tuple(r) for r in idx.probe(spark, q, nprobe=4, k=10).collect()]
    want = [tuple(r) for r in bulk.probe(spark, q, nprobe=4, k=10).collect()]
    assert got == want
    # the planted clone of vec 0 (vec_id 100000, identical vector) must
    # surface at the top alongside the original
    assert {r[0] for r in got[:2]} == {0, 100000}


def test_skewed_appends_trip_staleness_and_rebuild_recovers(spark, tmp_path):
    vectors = _vectors(spark).localCheckpoint(eager=True)
    idx = IvfIndex(tmp_path / "idx")
    idx.build(vectors)
    assert not idx.is_stale(spark)

    # pile 3x the corpus onto ONE point in space: clones of vec 7
    clone_src = vectors.filter(F.col("vec_id") == 7).first()["v"]
    n = vectors.count()
    spam = spark.range(3 * n).select(
        (F.col("id") + 200000).alias("vec_id"),
        F.lit(99).alias("label"),
        F.array(*[F.lit(float(x)) for x in clone_src]).alias("v"),
    )
    idx.append(spam)
    s = idx.staleness(spark)
    assert s["growth"] > IvfIndex.GROWTH_BOUND
    assert idx.is_stale(spark)

    before = idx.cells.read(spark).count()
    idx.rebuild(spark)
    after = idx.cells.read(spark)
    assert after.count() == before  # no vectors lost
    # post-rebuild, the index answers correctly: probing at the spam
    # point returns clones with cosine 1.0
    top = idx.probe(spark, clone_src, nprobe=4, k=5).collect()
    assert all(r["cosine"] == 1.0 for r in top)
    assert not idx.staleness(spark)["growth"] > IvfIndex.GROWTH_BOUND
