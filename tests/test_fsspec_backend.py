"""FsspecStorageBackend end-to-end (VERDICT r5 item #7): the full
write / merge / compact / vacuum / tail lifecycle with the METADATA
plane going through the fsspec protocol, plus the exclusive-create race
and the nonatomic-guard branches.

No object-store driver (or fsspec itself) ships in this container, so
the tests run against a minimal local-filesystem double implementing the
exact AbstractFileSystem subset FsspecStorageBackend calls (exists / ls
/ open(r|w|x) / rm / modified / du — fsspec's own LocalFileSystem
semantics: ls returns full paths, open("x") raises FileExistsError,
object stores have no empty dirs). When a real fsspec is importable the
same tests also run against fsspec.filesystem("file"): the double never
shadows the real thing.
"""

from __future__ import annotations

import datetime
import os
from pathlib import Path

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.streaming import TableTailer
from odbc2deltalake_spark.tablestore import (
    CommitConflictError,
    FsspecStorageBackend,
    VersionedParquetTable,
)


class LocalLikeFS:
    """fsspec-protocol double over the local filesystem (the subset
    FsspecStorageBackend touches), with native exclusive create."""

    supports_exclusive = True

    def exists(self, path):
        return Path(path).exists()

    def ls(self, path, detail=False):
        assert detail is False
        return [str(c) for c in Path(path).iterdir()]

    def open(self, path, mode):
        p = Path(path)
        if mode in ("w", "x"):
            p.parent.mkdir(parents=True, exist_ok=True)
        if mode == "x" and not self.supports_exclusive:
            # drivers without exclusive create reject the mode (s3fs
            # pre-2024.6 raises ValueError on "x")
            raise ValueError(f"mode 'x' not supported by {type(self).__name__}")
        return open(path, mode)

    def rm(self, path, recursive=False):
        import shutil

        p = Path(path)
        if p.is_dir():
            assert recursive
            shutil.rmtree(p)
        else:
            p.unlink()

    def modified(self, path):
        return datetime.datetime.fromtimestamp(os.stat(path).st_mtime)

    def du(self, path):
        p = Path(path)
        return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


class NoExclusiveFS(LocalLikeFS):
    supports_exclusive = False


def _filesystems():
    fss = [pytest.param(LocalLikeFS(), id="double")]
    try:
        import fsspec

        fss.append(pytest.param(fsspec.filesystem("file"), id="fsspec-local"))
    except ImportError:
        pass
    return fss


@pytest.mark.parametrize("fs", _filesystems())
def test_full_lifecycle_through_fsspec_metadata_plane(spark, tmp_path, fs):
    """append x2 -> merge_upsert -> compact -> vacuum -> tail: every
    commit-log byte moves through FsspecStorageBackend; Spark keeps the
    data plane on the same paths (exactly the split an abfss/s3a deploy
    uses, where Hadoop FS owns the parquet I/O)."""
    backend = FsspecStorageBackend(fs)
    t = VersionedParquetTable(tmp_path / "t", backend=backend)
    df = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    assert t.write(df, mode="append") == 0
    assert t.write(df.withColumn("k", F.col("k") + 100), mode="append") == 1
    assert backend.exclusive_is_native is True  # "x" mode did the commits
    assert t.read(spark).count() == 200

    upd = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit(-1).alias("v")
    )
    t.merge_upsert(spark, upd, key_cols=["k"])
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert all(got[k] == -1 for k in range(10))
    assert len(got) == 200

    snap_before = sorted(got.items())
    # merge bucketized the table; compact refuses there — vacuum alone
    removed = t.vacuum(retain_versions=1, orphan_min_age_seconds=0)
    assert removed, "superseded pre-merge generations must be reclaimed"
    assert sorted((r["k"], r["v"]) for r in t.read(spark).collect()) == snap_before

    # change feed still flows through the fsspec metadata plane
    tail = TableTailer(t)
    tail.skip_to(t.version())
    plain = VersionedParquetTable(tmp_path / "plain", backend=backend)
    plain.write(df, mode="append")
    plain.write(df, mode="append")
    tail2 = TableTailer(plain)
    seen = []
    tail2.process_available(spark, lambda b, a, z: seen.append(b.count()))
    assert seen == [200]


def test_exclusive_write_race_single_winner(tmp_path):
    """Two writers racing on the same commit version: exactly one wins,
    the loser gets CommitConflictError — the linearization contract."""
    backend = FsspecStorageBackend(LocalLikeFS())
    path = str(tmp_path / "_commits" / "0000000001.json")
    backend.write_text_exclusive(path, '{"version": 1, "who": "a"}')
    with pytest.raises(CommitConflictError):
        backend.write_text_exclusive(path, '{"version": 1, "who": "b"}')
    assert '"who": "a"' in backend.read_text(path)  # winner's content intact


def test_nonatomic_guard_refuses_then_allows(tmp_path):
    """A driver without exclusive-create mode must be refused by default
    (commits would not be linearizable) and only degrade to
    check-then-put under an explicit opt-in, with a warning."""
    strict = FsspecStorageBackend(NoExclusiveFS())
    path = str(tmp_path / "_commits" / "0000000001.json")
    with pytest.raises(CommitConflictError, match="exclusive-create"):
        strict.write_text_exclusive(path, "{}")
    assert strict.exclusive_is_native is False
    assert not Path(path).exists()  # refusal wrote nothing

    relaxed = FsspecStorageBackend(NoExclusiveFS(), allow_nonatomic=True)
    with pytest.warns(RuntimeWarning, match="check-then-put"):
        relaxed.write_text_exclusive(path, '{"v": 1}')
    # an existing file still conflicts even in degraded mode
    with pytest.raises(CommitConflictError):
        relaxed.write_text_exclusive(path, '{"v": 2}')
    assert '"v": 1' in relaxed.read_text(path)


def test_lifecycle_on_nonatomic_store_with_optin(spark, tmp_path):
    """A degraded store (no exclusive create) still completes the table
    lifecycle under the explicit opt-in — the deployment shape where a
    plans-layer lease serializes writers."""
    backend = FsspecStorageBackend(NoExclusiveFS(), allow_nonatomic=True)
    t = VersionedParquetTable(tmp_path / "t", backend=backend)
    df = spark.range(0, 50).select(F.col("id").alias("k"))
    with pytest.warns(RuntimeWarning):
        t.write(df, mode="append")
    t.write(df.withColumn("k", F.col("k") + 50), mode="append")
    assert t.read(spark).count() == 100
    assert backend.exclusive_is_native is False
