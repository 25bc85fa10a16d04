"""Change-data-feed (`read_changes`) and `history()` on the versioned
store: incremental consumers read exactly the rows added after their
checkpointed version, and rewrite commits refuse to masquerade as
deltas."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable


def test_read_changes_returns_only_new_commits(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    for i in range(4):
        t.write(
            spark.range(i * 10, (i + 1) * 10).select(
                F.col("id"), F.lit(i).alias("batch")
            ),
            mode="append" if i else "overwrite",
        )
    # consumer checkpointed at version 1 → sees batches 2 and 3 only
    ch = t.read_changes(spark, from_version=1)
    rows = ch.collect()
    assert {r["batch"] for r in rows} == {2, 3}
    assert {r["_commit_version"] for r in rows} == {2, 3}
    assert len(rows) == 20
    # bounded range
    ch12 = t.read_changes(spark, from_version=1, to_version=2)
    assert {r["batch"] for r in ch12.collect()} == {2}
    # empty range → empty frame with the right schema
    none = t.read_changes(spark, from_version=t.version())
    assert none.count() == 0
    assert "_commit_version" in none.columns


def test_read_changes_projects_to_table_schema(spark, tmp_path):
    """A consumer reading across a schema-widening boundary sees every
    change projected to the final table schema (missing columns NULL)."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 5).select(F.col("id")), mode="overwrite")
    t.write(spark.range(5, 10).select(F.col("id")), mode="append")
    t.write(
        spark.range(10, 15).select(F.col("id"), F.lit("x").alias("tag")),
        mode="append",
        merge_schema=True,
    )
    ch = t.read_changes(spark, from_version=0)
    assert set(ch.columns) == {"id", "tag", "_commit_version"}
    got = {(r["id"], r["tag"]) for r in ch.collect()}
    assert got == {(i, None) for i in range(5, 10)} | {(i, "x") for i in range(10, 15)}


def test_read_changes_refuses_rewrites(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 5).select(F.col("id")), mode="overwrite")
    t.write(spark.range(5, 10).select(F.col("id")), mode="append")
    t.restore(0)  # a genuine row-set rewrite
    with pytest.raises(ValueError, match="not representable"):
        t.read_changes(spark, from_version=0)
    # but a range that stops before the rewrite still works
    assert t.read_changes(spark, from_version=0, to_version=1).count() == 5
    # r7: compaction is rows-preserving and passes through silently
    # (see test_compaction_is_transparent_to_change_feed)


def test_history_surfaces_audit_fields(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(0, 5).select(F.col("id")), mode="overwrite")
    t.write(spark.range(5, 10).select(F.col("id")), mode="append")
    t.compact(spark, out_partitions=1)
    h = t.history()
    assert [c["version"] for c in h] == [2, 1, 0]
    assert h[0]["mode"] == "overwrite"
    assert h[0]["compacted_from"] == 1
    assert all("schema" not in c for c in h)


def test_compaction_is_transparent_to_change_feed(spark, tmp_path):
    """OPTIMIZE (full or partial) is a rows-preserving rewrite: the feed
    skips it (zero change rows) instead of forcing a re-baseline —
    Delta CDF's behavior for OPTIMIZE. Deletes still re-baseline."""
    from pyspark.sql import functions as F

    from odbc2deltalake_spark.streaming import (
        MaterializedAggregate,
        TableTailer,
    )
    from odbc2deltalake_spark.tablestore import VersionedParquetTable

    t = VersionedParquetTable(tmp_path / "t")

    def _load(lo, hi):
        return spark.range(lo, hi).select(
            (F.col("id") % 3).alias("g"), F.col("id").alias("v")
        )

    t.write(_load(0, 50), mode="append", stats_cols=["v"])
    t.write(_load(50, 100), mode="append", stats_cols=["v"])
    tail = TableTailer(t)
    tail.process_available(spark, lambda df, a, b: None)  # current at v1
    mv = MaterializedAggregate(
        t, tmp_path / "mv", group_cols=["g"],
        aggs={"n": ("count", None), "total": ("sum", "v")},
    )
    mv.refresh(spark)

    t.compact(spark, out_partitions=1)  # full OPTIMIZE (overwrite commit)
    t.write(_load(100, 120), mode="append", stats_cols=["v"])
    seen = []
    tail.process_available(spark, lambda df, a, b: seen.append(df.count()))
    assert seen == [20], "feed must deliver only the append, skip OPTIMIZE"
    assert tail.last_processed() == t.version()

    rng = mv.refresh(spark)  # incremental, NOT a re-baseline recompute
    assert rng is not None
    assert sorted(tuple(r) for r in mv.read(spark).collect()) == sorted(
        tuple(r) for r in mv.recompute(spark).collect()
    )

    t.compact(spark, where=("v", ">=", 100), out_partitions=1)  # partial
    t.write(_load(120, 130), mode="append", stats_cols=["v"])
    seen2 = []
    tail.process_available(spark, lambda df, a, b: seen2.append(df.count()))
    assert seen2 == [10]
    assert mv.refresh(spark) is not None
    assert sorted(tuple(r) for r in mv.read(spark).collect()) == sorted(
        tuple(r) for r in mv.recompute(spark).collect()
    )

    # a DML rewrite is NOT rows-preserving: feed still raises
    t.delete_where(spark, ("v", ">=", 125))
    import pytest

    with pytest.raises(ValueError):
        tail.process_available(spark, lambda df, a, b: None)


# ----------------------- r8: CDF with DML pre/post images -----------------


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_cdf_synthesizes_dml_changes(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.createDataFrame(
            [(k, k * 10) for k in range(1, 5)], "k long, v long"
        ),
        stats_cols=["k"],
    )  # v0
    t.write(
        spark.createDataFrame([(5, 50), (6, 60)], "k long, v long"),
        stats_cols=["k"],
    )  # v1
    t.update_where(spark, {"v": "v * 2"}, ("k", "<=", 2))  # v2
    t.delete_where(spark, ("k", "=", 5))  # v3

    cdf = t.read_changes_cdf(spark, -1)
    by_type = {
        ct: _rows(
            cdf.filter(F.col("_change_type") == ct).select("k", "v")
        )
        for ct in (
            "insert", "update_preimage", "update_postimage", "delete"
        )
    }
    assert by_type["insert"] == [(k, k * 10) for k in range(1, 7)]
    assert by_type["update_preimage"] == [(1, 10), (2, 20)]
    assert by_type["update_postimage"] == [(1, 20), (2, 40)]
    assert by_type["delete"] == [(5, 50)]

    # tail-only read: just the DML rounds
    tail = t.read_changes_cdf(spark, 1)
    assert tail.filter("_change_type = 'insert'").count() == 0
    assert tail.count() == 5

    # folding the full CDF reproduces the live table: inserts + posts
    # minus deletes + pres
    adds = cdf.filter(
        F.col("_change_type").isin("insert", "update_postimage")
    ).select("k", "v")
    subs = cdf.filter(
        F.col("_change_type").isin("delete", "update_preimage")
    ).select("k", "v")
    folded = _rows(adds.exceptAll(subs))
    assert folded == _rows(t.read(spark))


def test_cdf_update_changing_predicate_column(spark, tmp_path):
    """The post-image can STOP matching the predicate (v < 0 set to 0) —
    synthesis applies the recorded SET to the pre-images, never
    re-filters the new dirs, so this case is exact."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.createDataFrame([(1, -5), (2, 3)], "k long, v long"),
        stats_cols=["v"],
    )
    t.update_where(spark, {"v": "0"}, ("v", "<", 0))
    cdf = t.read_changes_cdf(spark, 0)
    assert _rows(cdf.select("k", "v", "_change_type")) == [
        (1, -5, "update_preimage"),
        (1, 0, "update_postimage"),
    ]


def test_cdf_column_set_exprs_not_representable(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.createDataFrame([(1, 5)], "k long, v long"),
            stats_cols=["k"])
    t.update_where(spark, {"v": F.col("v") + 1}, ("k", "=", 1))
    assert t.read(spark).first()["v"] == 6  # the update itself works
    with pytest.raises(ValueError, match="not\\s+CDF-representable"):
        t.read_changes_cdf(spark, 0).count()


def test_cdf_on_bucketized_dml(spark, tmp_path):
    """Per-bucket DML rewrites synthesize the same pre/post images."""
    t = VersionedParquetTable(tmp_path / "t")
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(k, k * 10) for k in range(20)], "k long, v long"
        ),
        key_cols=["k"],
        num_buckets=4,
    )
    base_v = t.version()
    t.delete_where(spark, ("k", "=", 7))
    cdf = t.read_changes_cdf(spark, base_v)
    assert _rows(cdf.select("k", "v", "_change_type")) == [
        (7, 70, "delete")
    ]


# ----------------------- r8: CDF across MERGE commits ----------------------


def test_cdf_on_merge_commit(spark, tmp_path):
    """A merge emits insert for new keys, pre/post for changed payloads,
    and NOTHING for matched-but-identical rows or rows that merely rode
    along in a rewritten bucket."""
    t = VersionedParquetTable(tmp_path / "t")
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(k, k * 10) for k in range(8)], "k long, v long"
        ),
        key_cols=["k"],
        num_buckets=4,
    )
    base = t.version()
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(100, 1000), (2, 999), (3, 30)], "k long, v long"
        ),
        key_cols=["k"],
    )
    cdf = t.read_changes_cdf(spark, base)
    assert _rows(cdf.select("k", "v", "_change_type")) == sorted(
        [
            (100, 1000, "insert"),
            (2, 20, "update_preimage"),
            (2, 999, "update_postimage"),
        ]
    )
    # folding the changes onto the base snapshot reproduces the live table
    folded = _rows(
        t.read(spark, version=base)
        .unionByName(
            cdf.filter(
                F.col("_change_type").isin("insert", "update_postimage")
            ).select("k", "v")
        )
        .exceptAll(
            cdf.filter(
                F.col("_change_type").isin("delete", "update_preimage")
            ).select("k", "v")
        )
    )
    assert folded == _rows(t.read(spark))


def test_cdf_merge_composite_keys(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(1, "a", 10), (1, "b", 20), (2, "a", 30)],
            "k1 long, k2 string, v long",
        ),
        key_cols=["k1", "k2"],
        num_buckets=2,
    )
    base = t.version()
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(1, "b", 25), (3, "c", 99)], "k1 long, k2 string, v long"
        ),
        key_cols=["k1", "k2"],
    )
    cdf = t.read_changes_cdf(spark, base)
    assert _rows(cdf.select("k1", "k2", "v", "_change_type")) == sorted(
        [
            (1, "b", 20, "update_preimage"),
            (1, "b", 25, "update_postimage"),
            (3, "c", 99, "insert"),
        ]
    )


def test_cdf_merge_keys_only_table(spark, tmp_path):
    """Keys-only index (no payload columns): matched keys can never
    change, so a merge's CDF is pure inserts."""
    t = VersionedParquetTable(tmp_path / "t")
    t.merge_upsert(
        spark,
        spark.createDataFrame([(k,) for k in range(5)], "k long"),
        key_cols=["k"],
        num_buckets=2,
    )
    base = t.version()
    t.merge_upsert(
        spark,
        spark.createDataFrame([(3,), (9,)], "k long"),
        key_cols=["k"],
    )
    cdf = t.read_changes_cdf(spark, base)
    assert _rows(cdf.select("k", "_change_type")) == [(9, "insert")]


def test_cdf_merge_vacuumed_preimage_truncates(spark, tmp_path):
    from odbc2deltalake_spark.tablestore import ChangeFeedTruncatedError

    t = VersionedParquetTable(tmp_path / "t")
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(k, k * 10) for k in range(8)], "k long, v long"
        ),
        key_cols=["k"],
        num_buckets=4,
    )
    base = t.version()
    t.merge_upsert(
        spark,
        spark.createDataFrame([(2, 999)], "k long, v long"),
        key_cols=["k"],
    )
    t.checkpoint(full=True)
    t.vacuum(retain_versions=1)
    with pytest.raises(ChangeFeedTruncatedError):
        t.read_changes_cdf(spark, base).count()
