"""Versioned Parquet table store — the engine's Delta-Lake stand-in.

delta-spark is not available in this environment, so the engine ships its
own minimal transactional table layer with the Delta features the reference
relies on (reference:odbc2deltalake/reader/reader.py:13-32 ``DeltaOps``):

- append / overwrite writes with schema evolution ("new_only" union)
- version history + time travel (``versionAsOf``)
- ``restore(version)`` (reference uses Delta RESTORE on failure,
  reference:odbc2deltalake/db_to_delta.py:269-276)
- table properties
- MERGE upsert on key equality
  (reference:odbc2deltalake/reader/spark_reader.py:329-350) — hash-bucketed
  so a merge rewrites only the buckets containing changed keys
- vacuum of unreferenced files

Layout::

    <root>/_commits/<version 10d>.json   -- commit log (atomic create)
    <root>/d<version>-<uuid>/part-*.parquet  -- one data dir per write
    <root>/d<version>-<uuid>/__bucket=<i>/   -- per-bucket subdirs (merged tables)

A read at version v replays the log: an ``overwrite`` commit resets the
live-dir set, an ``append`` adds to it, a ``merge`` replaces only the dirs
of the buckets it touched. Reads group live dirs by their written schema
(one scan per schema generation, casts unioned) so type widening on append
works without rewriting history.

Scale note: this mirrors Delta's design — metadata lists files, reads scan
only live files, and Spark still gets parquet predicate pushdown + column
pruning per scan. The data plane is whatever Spark's Hadoop FS supports;
the metadata plane (commit log) goes through a pluggable
:class:`StorageBackend` (local filesystem here; an object-store
implementation maps the atomic-create to a conditional PUT — the same
split as reference:odbc2deltalake/destination/destination.py:11-53 with
its local/Azure implementations).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from abc import ABC, abstractmethod
from pathlib import Path
from typing import Any, Iterable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TableNotFoundError(Exception):
    pass


class SchemaDriftError(Exception):
    """Incompatible source schema change (e.g. string→binary,
    timestamp→int). Widening changes flow through; incompatible ones must
    fail the load rather than corrupt history — matches the reference,
    which raises on a col→xml change while int→long continues
    (reference:tests/test_11_schema_drift.py:71-102)."""


# ------------------------------------------------------------------------
# storage backend (metadata plane)
# ------------------------------------------------------------------------


class StorageBackend(ABC):
    """Commit-log I/O for :class:`VersionedParquetTable`.

    Only the metadata plane goes through this interface — parquet data is
    written/read by Spark through Hadoop FS, which already speaks s3a/abfss/
    gs URIs. An object-store backend therefore only needs small-file ops;
    ``write_text_exclusive`` must be *atomic create-if-absent* (local:
    O_CREAT|O_EXCL rename; S3: If-None-Match PUT; ABFS/GCS: etag-conditional
    create) — that single primitive makes commits linearizable, exactly the
    trick Delta Lake's LogStore uses.
    (Shape mirrors reference:odbc2deltalake/destination/destination.py:11-53,
    with local + Azure implementations behind one interface.)
    """

    sep = "/"

    def join(self, *parts: str) -> str:
        return self.sep.join(str(p).rstrip(self.sep) for p in parts)

    @abstractmethod
    def list_dir(self, path: str) -> list[str]:
        """Child names (not paths) of a directory; [] when absent."""

    @abstractmethod
    def read_text(self, path: str) -> str: ...

    @abstractmethod
    def write_text_atomic(self, path: str, text: str) -> None:
        """Write with all-or-nothing visibility (readers never observe a
        partial file). Creates parent dirs as needed."""

    @abstractmethod
    def exists(self, path: str) -> bool: ...

    @abstractmethod
    def remove_recursive(self, path: str) -> None: ...


class LocalStorageBackend(StorageBackend):
    """POSIX filesystem metadata plane: atomicity via same-dir rename."""

    def list_dir(self, path: str) -> list[str]:
        p = Path(path)
        if not p.exists():
            return []
        return [c.name for c in p.iterdir()]

    def read_text(self, path: str) -> str:
        return Path(path).read_text()

    def write_text_atomic(self, path: str, text: str) -> None:
        p = Path(path)
        p.parent.mkdir(parents=True, exist_ok=True)
        tmp = p.parent / f".{p.name}.tmp{uuid.uuid4().hex[:8]}"
        tmp.write_text(text)
        os.rename(tmp, p)

    def exists(self, path: str) -> bool:
        return Path(path).exists()

    def remove_recursive(self, path: str) -> None:
        p = Path(path)
        if p.is_dir():
            shutil.rmtree(p)
        elif p.exists():
            p.unlink()


class FsspecStorageBackend(StorageBackend):
    """Object-store metadata plane via an fsspec filesystem (adlfs for
    abfss://, s3fs for s3://, gcsfs for gs://) — import-gated; the
    container for this build has no object-store driver, so this class is
    exercised only through the interface tests with a memory filesystem.

    NOTE on atomicity: plain object PUT is last-writer-wins. For a
    multi-writer deployment, pair this backend with the table-level lease
    lock (plans/destination.py) or swap ``write_text_atomic`` for a
    conditional PUT (S3 ``If-None-Match: *``; ABFS etag preconditions).
    """

    def __init__(self, fs: Any):  # fs: fsspec.AbstractFileSystem
        self.fs = fs

    def list_dir(self, path: str) -> list[str]:
        if not self.fs.exists(path):
            return []
        return [p.rstrip("/").rsplit("/", 1)[-1] for p in self.fs.ls(path, detail=False)]

    def read_text(self, path: str) -> str:
        with self.fs.open(path, "r") as fh:
            return fh.read()

    def write_text_atomic(self, path: str, text: str) -> None:
        # single-request PUT: readers see the old object or the new one,
        # never a torn write (multi-writer races need the lease lock — see
        # class docstring)
        with self.fs.open(path, "w") as fh:
            fh.write(text)

    def exists(self, path: str) -> bool:
        return bool(self.fs.exists(path))

    def remove_recursive(self, path: str) -> None:
        if self.fs.exists(path):
            self.fs.rm(path, recursive=True)


# ------------------------------------------------------------------------
# schema drift
# ------------------------------------------------------------------------

_INT_RANK = {
    T.ByteType(): 1,
    T.ShortType(): 2,
    T.IntegerType(): 3,
    T.LongType(): 4,
}
# digits needed to hold each integer width inside a decimal
_INT_DECIMAL_DIGITS = {T.ByteType(): 3, T.ShortType(): 5, T.IntegerType(): 10, T.LongType(): 19}


def is_type_widening(old: T.DataType, new: T.DataType) -> bool:
    """True when ``old → new`` is a lossless widening — the set Delta Lake's
    type-widening feature accepts (byte→short→int→long, int-family→double
    for ≤int, decimal precision/scale growth, int-family→decimal with
    enough digits, float→double, date→timestamp)."""
    if old == new:
        return True
    if old in _INT_RANK and new in _INT_RANK:
        return _INT_RANK[new] > _INT_RANK[old]
    if isinstance(new, T.DoubleType):
        # double has a 53-bit significand: exact for ≤int and float
        return old in (T.ByteType(), T.ShortType(), T.IntegerType(), T.FloatType())
    if isinstance(new, T.DecimalType):
        if isinstance(old, T.DecimalType):
            return (
                new.precision >= old.precision
                and new.scale >= old.scale
                and (new.precision - new.scale) >= (old.precision - old.scale)
            )
        if old in _INT_DECIMAL_DIGITS:
            return (new.precision - new.scale) >= _INT_DECIMAL_DIGITS[old]
        return False
    if isinstance(new, (T.TimestampType, T.TimestampNTZType)):
        return isinstance(old, T.DateType)
    return False


def _merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Union of columns: old columns keep their (widened) new type when the
    change is a lossless widening; new columns are appended — the
    'new_only' drift mode
    (reference:odbc2deltalake/reader/spark_reader.py:284-305). An
    incompatible type change raises :class:`SchemaDriftError` instead of
    silently swapping the type (reference:tests/test_11_schema_drift.py:71-102
    raises on col→xml while int widening continues)."""
    fields: dict[str, T.StructField] = {f.name: f for f in old.fields}
    order = [f.name for f in old.fields]
    for f in new.fields:
        if f.name in fields:
            cur = fields[f.name].dataType
            if cur != f.dataType:
                if is_type_widening(cur, f.dataType):
                    fields[f.name] = T.StructField(f.name, f.dataType, True)
                elif is_type_widening(f.dataType, cur):
                    # source narrowed (long data still fits); keep the wide
                    # historical type — values cast up on write alignment
                    pass
                else:
                    raise SchemaDriftError(
                        f"incompatible type change for column {f.name!r}: "
                        f"{cur.simpleString()} -> {f.dataType.simpleString()}"
                    )
        else:
            fields[f.name] = f
            order.append(f.name)
    return T.StructType([fields[n] for n in order])


# ------------------------------------------------------------------------
# table
# ------------------------------------------------------------------------

_BUCKET_COL = "__bucket"


class VersionedParquetTable:
    def __init__(self, root: str | Path, backend: Optional[StorageBackend] = None):
        self.root = Path(root) if not isinstance(root, Path) else root
        self._root_str = str(root)
        self.backend = backend or LocalStorageBackend()

    def _path(self, *parts: str) -> str:
        return self.backend.join(self._root_str, *parts)

    # ---------- commit log ----------

    @property
    def _commits_dir(self) -> str:
        return self._path("_commits")

    def _commit_names(self) -> list[str]:
        return sorted(
            n for n in self.backend.list_dir(self._commits_dir)
            if n.endswith(".json") and not n.startswith(".")
        )

    def exists(self) -> bool:
        return len(self._commit_names()) > 0

    def version(self) -> int:
        """Latest version number (reference:odbc2deltalake/reader/spark_reader.py:21-22)."""
        names = self._commit_names()
        if not names:
            raise TableNotFoundError(self._root_str)
        return int(names[-1].split(".")[0])

    def _read_commit(self, version: int) -> dict[str, Any]:
        return json.loads(
            self.backend.read_text(self.backend.join(self._commits_dir, f"{version:010d}.json"))
        )

    def _write_commit(self, commit: dict[str, Any]) -> None:
        version = commit["version"]
        self.backend.write_text_atomic(
            self.backend.join(self._commits_dir, f"{version:010d}.json"),
            json.dumps(commit),
        )

    def _state_at(self, version: Optional[int] = None) -> dict[str, Any]:
        """Replay the log up to ``version`` → {dirs, schema, props, ...}.

        Each live-dir entry is {dir, schema, bucket?}; ``bucket`` is set
        for per-bucket dirs written by merges."""
        names = self._commit_names()
        if not names:
            raise TableNotFoundError(self._root_str)
        live: list[dict[str, Any]] = []
        schema_json: str | None = None
        props: dict[str, str] = {}
        num_buckets: Optional[int] = None
        last = -1
        for name in names:
            v = int(name.split(".")[0])
            if version is not None and v > version:
                break
            c = json.loads(self.backend.read_text(self.backend.join(self._commits_dir, name)))
            last = v
            mode = c["mode"]
            if mode == "overwrite":
                live = []
            if mode == "restore":
                live = list(c["dirs"])
            elif mode == "merge":
                replaced = set(c.get("buckets_replaced") or [])
                live = [d for d in live if d.get("bucket") not in replaced]
                live.extend(c.get("dirs_added") or [])
            elif c.get("dirs_added"):
                live.extend(c["dirs_added"])
            elif c.get("dir"):
                live.append({"dir": c["dir"], "schema": c["schema"]})
            if c.get("schema"):
                schema_json = c["schema"]
            if c.get("num_buckets"):
                num_buckets = c["num_buckets"]
            props.update(c.get("set_props", {}))
        if version is not None and last < version:
            raise ValueError(f"version {version} does not exist for {self._root_str}")
        return {
            "dirs": live,
            "schema": schema_json,
            "props": props,
            "version": last,
            "num_buckets": num_buckets,
        }

    # ---------- reads ----------

    def schema(self, version: Optional[int] = None) -> T.StructType:
        st = self._state_at(version)
        return T.StructType.fromJson(json.loads(st["schema"]))

    def read(
        self,
        spark: SparkSession,
        version: Optional[int] = None,
        buckets: Optional[Iterable[int]] = None,
    ) -> DataFrame:
        """Time-travel read (reference:odbc2deltalake/reader/spark_reader.py:123-133).

        Live dirs are grouped by written schema; each group is one parquet
        scan (pushdown + pruning intact), then cast-unioned to the table's
        final schema — this is how append-time type widening / added
        columns read back without rewriting old files.

        ``buckets`` prunes per-bucket dirs (merged tables): only the named
        buckets are scanned — file-level pruning, the point of hash
        bucketing. Untagged dirs are always scanned.
        """
        st = self._state_at(version)
        target = T.StructType.fromJson(json.loads(st["schema"]))
        dirs = st["dirs"]
        if buckets is not None:
            bset = set(buckets)
            dirs = [d for d in dirs if d.get("bucket") is None or d["bucket"] in bset]
        if not dirs:
            return spark.createDataFrame([], target)
        groups: dict[str, list[str]] = {}
        for d in dirs:
            groups.setdefault(d["schema"], []).append(self._path(d["dir"]))
        parts: list[DataFrame] = []
        for schema_json, paths in groups.items():
            written = T.StructType.fromJson(json.loads(schema_json))
            df = spark.read.schema(written).parquet(*paths)
            written_names = set(written.fieldNames())
            df = df.select(
                *[
                    (
                        F.col(f.name).cast(f.dataType)
                        if f.name in written_names
                        else F.lit(None).cast(f.dataType)
                    ).alias(f.name)
                    for f in target.fields
                ]
            )
            parts.append(df)
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    # ---------- writes ----------

    def write(
        self,
        df: DataFrame,
        mode: str = "append",
        merge_schema: bool = False,
        overwrite_schema: bool = False,
        partition_by: Optional[list[str]] = None,
    ) -> int:
        """Write a DataFrame as one commit; returns the new version
        (reference:odbc2deltalake/reader/spark_reader.py:144-162 Delta sink)."""
        assert mode in ("append", "overwrite"), mode
        new_version = (self.version() + 1) if self.exists() else 0
        new_schema = df.schema
        if self.exists() and mode == "append":
            old_schema = self.schema()
            if overwrite_schema:
                pass
            elif merge_schema:
                merged = _merge_schemas(old_schema, new_schema)
                new_schema = merged
            else:
                # align to existing schema (missing cols -> null)
                have = set(df.columns)
                df = df.select(
                    *[
                        (
                            F.col(f.name).cast(f.dataType)
                            if f.name in have
                            else F.lit(None).cast(f.dataType)
                        ).alias(f.name)
                        for f in old_schema.fields
                    ]
                )
                new_schema = old_schema
        dir_name = f"d{new_version:010d}-{uuid.uuid4().hex[:8]}"
        writer = df.write.mode("overwrite")
        if partition_by:
            # hive-style subdirs inside this commit's dir; reads prune on
            # the partition column (each commit is already one load, so the
            # history table is implicitly load-partitioned on top of this)
            writer = writer.partitionBy(*partition_by)
        writer.parquet(self._path(dir_name))
        self._write_commit(
            {
                "version": new_version,
                "mode": mode,
                "dir": dir_name,
                "schema": df.schema.json() if mode == "overwrite" else new_schema.json(),
                "written_schema": df.schema.json(),
            }
        )
        return new_version

    def write_counted(
        self,
        df: DataFrame,
        mode: str = "append",
        merge_schema: bool = False,
    ) -> tuple[int, int]:
        """Write and return (version, rows_written) in ONE pass: an
        Observation on the write plan counts rows as they stream to
        parquet — no separate isEmpty/count job over the written table."""
        from pyspark.sql import Observation

        obs = Observation()
        df = df.observe(obs, F.count(F.lit(1)).alias("rows"))
        v = self.write(df, mode=mode, merge_schema=merge_schema)
        return v, int(obs.get["rows"])

    def write_empty(self, spark: SparkSession, schema: T.StructType) -> int:
        """Create a 0-row table (reference:odbc2deltalake/reader/odbc_reader.py:306-322)."""
        return self.write(spark.createDataFrame([], schema), mode="overwrite")

    def restore(self, version: int) -> int:
        """Point the table back at an old version's file set as a NEW commit
        (like Delta RESTORE; reference:odbc2deltalake/db_to_delta.py:269-276)."""
        st = self._state_at(version)
        new_version = self.version() + 1
        self._write_commit(
            {
                "version": new_version,
                "mode": "restore",
                "dirs": st["dirs"],
                "schema": st["schema"],
                "num_buckets": st["num_buckets"],
                "restored_from": version,
            }
        )
        return new_version

    def set_properties(self, props: dict[str, str]) -> int:
        st = self._state_at()
        new_version = st["version"] + 1
        self._write_commit(
            {
                "version": new_version,
                "mode": "append",
                "dir": None,
                "schema": st["schema"],
                "set_props": props,
            }
        )
        return new_version

    def get_property(self, name: str) -> Optional[str]:
        return self._state_at()["props"].get(name)

    def vacuum(self, retain_versions: int = 1) -> list[str]:
        """Delete data dirs unreferenced by the latest state
        (reference:odbc2deltalake/db_to_delta.py:261-267 vacuums side tables)."""
        if not self.exists():
            return []
        # per-bucket dirs live inside a commit's top-level dir — keep any
        # top-level dir with at least one live child
        live_top = {d["dir"].split("/", 1)[0] for d in self._state_at()["dirs"]}
        removed = []
        for name in self.backend.list_dir(self._root_str):
            if name.startswith("d") and name != "_commits" and name not in live_top:
                self.backend.remove_recursive(self._path(name))
                removed.append(name)
        return removed

    def delete_table(self) -> None:
        self.backend.remove_recursive(self._root_str)

    # ---------- merge ----------

    def merge_upsert(
        self,
        spark: SparkSession,
        source: DataFrame,
        key_cols: list[str],
        num_buckets: int = 16,
    ) -> int:
        """MERGE on key equality: whenMatchedUpdateAll /
        whenNotMatchedInsertAll (reference:odbc2deltalake/reader/spark_reader.py:329-350).

        Hash-bucketed: rows are stored in ``pmod(xxhash64(keys), NB)``
        buckets (one parquet dir each), and a merge rewrites ONLY the
        buckets that contain changed keys — same asymptotics as Delta
        MERGE's matched-file rewrite. Round 1 rewrote the whole table per
        merge, which at 100 TB turns every small delta load into a
        full-index rewrite; now a delta touching k of NB buckets rewrites
        k/NB of the index.

        The first merge after a (full-load) overwrite converts the table
        to bucketed layout in one rewrite; subsequent merges are partial.
        Used on the keys-only ``latest_pk_version`` index; the SCD2
        history table is append-only.
        """
        if not self.exists():
            return self._write_bucketized(source, key_cols, num_buckets, replace=None)
        st = self._state_at()
        nb = st["num_buckets"] or num_buckets
        tagged = bool(st["dirs"]) and all(
            d.get("bucket") is not None for d in st["dirs"]
        )
        if not tagged:
            # one-time conversion: full merge, written bucketized so every
            # later merge is partial
            target = self.read(spark)
            keep = target.join(source.select(*key_cols), on=key_cols, how="left_anti")
            merged = source.unionByName(keep, allowMissingColumns=True)
            return self._write_bucketized(merged, key_cols, nb, replace=None)
        bexpr = F.pmod(F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(nb)).cast("int")
        touched = sorted(
            r[0]
            for r in source.select(bexpr.alias(_BUCKET_COL)).distinct().collect()
        )
        # scan ONLY touched-bucket dirs (file-level pruning via the log)
        target_touched = self.read(spark, buckets=touched)
        keep = target_touched.join(
            source.select(*key_cols), on=key_cols, how="left_anti"
        )
        merged = source.unionByName(keep, allowMissingColumns=True)
        return self._write_bucketized(merged, key_cols, nb, replace=touched)

    def _write_bucketized(
        self,
        df: DataFrame,
        key_cols: list[str],
        num_buckets: int,
        replace: Optional[list[int]],
    ) -> int:
        """Write ``df`` partitioned into hash buckets; commit either as a
        full overwrite (``replace=None``) or as a merge replacing only the
        named buckets."""
        new_version = (self.version() + 1) if self.exists() else 0
        dir_name = f"d{new_version:010d}-{uuid.uuid4().hex[:8]}"
        bexpr = F.pmod(
            F.xxhash64(*[F.col(c) for c in key_cols]), F.lit(num_buckets)
        ).cast("int")
        schema_json = df.schema.json()  # without the bucket col
        out_path = self._path(dir_name)
        df.withColumn(_BUCKET_COL, bexpr).write.mode("overwrite").partitionBy(
            _BUCKET_COL
        ).parquet(out_path)
        dirs_added = []
        for child in sorted(self.backend.list_dir(out_path)):
            if child.startswith(f"{_BUCKET_COL}="):
                dirs_added.append(
                    {
                        "dir": f"{dir_name}/{child}",
                        "schema": schema_json,
                        "bucket": int(child.split("=", 1)[1]),
                    }
                )
        self._write_commit(
            {
                "version": new_version,
                "mode": "merge" if replace is not None else "overwrite",
                "dirs_added": dirs_added,
                "buckets_replaced": replace,
                "schema": schema_json,
                "written_schema": schema_json,
                "num_buckets": num_buckets,
                "bucket_cols": key_cols,
            }
        )
        return new_version
