"""Crash injection for the MERGE path (VERDICT r10 #8).

``test_tablestore.py::test_aborted_write_invisible_and_vacuumed`` pins
data-then-commit for plain writes; ``_write_bucketized`` has more
intermediate state between the parquet write and the commit publish —
partition dirs, per-bucket row counts, footer-stats read-back, bloom
collection. A writer killed ANYWHERE in that window must leave the
table exactly at its old version: readers see the old rows, the orphan
bucket-dir tree is vacuum fodder (after the age floor that protects a
possibly in-flight writer), and a retried merge lands cleanly — the
commit-format.md data-then-commit contract, now proven on the widest
write path.
"""

from __future__ import annotations

import uuid

import pytest

from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, v long")


class _SimulatedKill(RuntimeError):
    pass


def _bloomed_bucketized(spark, root) -> VersionedParquetTable:
    """A table whose merge path exercises EVERY preservation step:
    prior dirs carry per-file stats AND bloom bitmaps, so
    _write_bucketized re-collects both before publishing."""
    t = VersionedParquetTable(root)
    t.write(
        _df(spark, [(i, 10 * i) for i in range(40)]).repartition(4, "id"),
        mode="append",
        stats_cols=["id"],
        per_file_stats=True,
        bloom_cols=["id"],
    )
    t.merge_upsert(
        spark, _df(spark, [(i, 10 * i) for i in range(40)]), ["id"],
        num_buckets=4,
    )
    return t


# every distinct failure window between the bucket-dir parquet write
# and the commit publish: the stats read-back, the bloom collection,
# and the publish itself
CRASH_POINTS = ["footer_stats", "bloom_collect", "commit_publish"]


@pytest.mark.parametrize("crash_at", CRASH_POINTS)
def test_merge_killed_mid_flight_is_invisible_and_recoverable(
    spark, tmp_path, monkeypatch, crash_at
):
    t = _bloomed_bucketized(spark, tmp_path / f"t{uuid.uuid4().hex[:6]}")
    v0 = t.version()
    rows0 = sorted(tuple(r) for r in t.read(spark).collect())
    dirs_before = set(t.backend.list_dir(str(t.root)))

    if crash_at == "footer_stats":
        def boom(*a, **k):
            raise _SimulatedKill("killed during footer-stats read-back")
        monkeypatch.setattr(VersionedParquetTable, "_footer_file_stats", boom)
    elif crash_at == "bloom_collect":
        def boom(*a, **k):
            raise _SimulatedKill("killed during bloom collection")
        monkeypatch.setattr(
            VersionedParquetTable, "_collect_file_blooms", boom
        )
    else:
        def boom(self, commit):
            raise _SimulatedKill("killed before commit publish")
        monkeypatch.setattr(VersionedParquetTable, "_write_commit", boom)

    with pytest.raises(_SimulatedKill):
        t.merge_upsert(
            spark, _df(spark, [(1, 999), (100, 1)]), ["id"]
        )
    monkeypatch.undo()

    # 1. invisible: a fresh reader replays to the OLD version and rows
    t2 = VersionedParquetTable(t.root)
    assert t2.version() == v0
    assert sorted(tuple(r) for r in t2.read(spark).collect()) == rows0

    # the kill really left intermediate state behind (otherwise this
    # test proves nothing): at least one un-referenced dir exists
    orphans = {
        d
        for d in t2.backend.list_dir(str(t.root))
        if d.startswith("d") and d not in dirs_before
    }
    assert orphans, "simulated kill left no orphan dir — wrong hook?"

    # 2. the age floor protects a possibly in-flight writer ...
    fresh = t2.vacuum()
    assert not (orphans & set(fresh))
    # ... and past it, the whole orphan bucket-dir tree is reclaimed
    removed = t2.vacuum(orphan_min_age_seconds=0.0)
    assert orphans <= {d.split("/", 1)[0] for d in removed} | set(removed)
    assert sorted(tuple(r) for r in t2.read(spark).collect()) == rows0

    # 3. the retried merge lands cleanly on the next version
    v1 = t2.merge_upsert(
        spark, _df(spark, [(1, 999), (100, 1)]), ["id"]
    )
    assert v1 == v0 + 1
    got = dict(
        (r["id"], r["v"]) for r in t2.read(spark).collect()
    )
    assert got[1] == 999 and got[100] == 1 and len(got) == 41
    # and the skipping metadata survived the retry (preservation rule)
    st = t2._state_at()
    touched = [d for d in st["dirs"] if d.get("stats") or d.get("bloom")]
    assert touched, "retried merge dropped all skipping metadata"
