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
  (reference:odbc2deltalake/reader/spark_reader.py:329-350)
- vacuum of unreferenced files

Layout::

    <root>/_commits/<version 10d>.json   -- commit log (atomic rename)
    <root>/d<version>-<uuid>/part-*.parquet  -- one data dir per write

A read at version v replays the log: an ``overwrite`` commit resets the
live-dir set, an ``append`` adds to it. Reads group live dirs by their
written schema (one scan per schema generation, casts unioned) so type
widening on append works without rewriting history.

Scale note: this mirrors Delta's design — metadata lists files, reads scan
only live files, and Spark still gets parquet predicate pushdown + column
pruning per scan. Any path accepted by Hadoop FS works in principle; local
paths are used in tests.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path
from typing import Any, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class TableNotFoundError(Exception):
    pass


def _merge_schemas(old: T.StructType, new: T.StructType) -> T.StructType:
    """Union of columns: old columns keep their (possibly widened) new type
    when compatible; new columns are appended — the 'new_only' drift mode
    (reference:odbc2deltalake/reader/spark_reader.py:284-305)."""
    fields: dict[str, T.StructField] = {f.name: f for f in old.fields}
    order = [f.name for f in old.fields]
    for f in new.fields:
        if f.name in fields:
            # widen in place (e.g. decimal(15,3) -> decimal(20,3)); trust the
            # caller to have validated compatibility
            if fields[f.name].dataType != f.dataType:
                fields[f.name] = T.StructField(f.name, f.dataType, True)
        else:
            fields[f.name] = f
            order.append(f.name)
    return T.StructType([fields[n] for n in order])


class VersionedParquetTable:
    def __init__(self, root: str | Path):
        self.root = Path(root)

    # ---------- commit log ----------

    @property
    def _commits_dir(self) -> Path:
        return self.root / "_commits"

    def _commit_files(self) -> list[Path]:
        if not self._commits_dir.exists():
            return []
        return sorted(self._commits_dir.glob("*.json"))

    def exists(self) -> bool:
        return len(self._commit_files()) > 0

    def version(self) -> int:
        """Latest version number (reference:odbc2deltalake/reader/spark_reader.py:21-22)."""
        files = self._commit_files()
        if not files:
            raise TableNotFoundError(str(self.root))
        return int(files[-1].stem)

    def _read_commit(self, version: int) -> dict[str, Any]:
        with open(self._commits_dir / f"{version:010d}.json") as fh:
            return json.load(fh)

    def _write_commit(self, commit: dict[str, Any]) -> None:
        self._commits_dir.mkdir(parents=True, exist_ok=True)
        version = commit["version"]
        tmp = self._commits_dir / f".{version:010d}.json.tmp{uuid.uuid4().hex[:8]}"
        tmp.write_text(json.dumps(commit))
        os.rename(tmp, self._commits_dir / f"{version:010d}.json")

    def _state_at(self, version: Optional[int] = None) -> dict[str, Any]:
        """Replay the log up to ``version`` → {dirs, schema, props}."""
        files = self._commit_files()
        if not files:
            raise TableNotFoundError(str(self.root))
        live: list[dict[str, Any]] = []  # [{dir, schema_json}]
        schema_json: str | None = None
        props: dict[str, str] = {}
        last = -1
        for f in files:
            v = int(f.stem)
            if version is not None and v > version:
                break
            c = json.loads(f.read_text())
            last = v
            if c["mode"] == "overwrite":
                live = []
            if c["mode"] == "restore":
                live = list(c["dirs"])
            elif c.get("dir"):
                live.append({"dir": c["dir"], "schema": c["schema"]})
            if c.get("schema"):
                schema_json = c["schema"]
            props.update(c.get("set_props", {}))
        if version is not None and last < version:
            raise ValueError(f"version {version} does not exist for {self.root}")
        return {"dirs": live, "schema": schema_json, "props": props, "version": last}

    # ---------- reads ----------

    def schema(self, version: Optional[int] = None) -> T.StructType:
        st = self._state_at(version)
        return T.StructType.fromJson(json.loads(st["schema"]))

    def read(self, spark: SparkSession, version: Optional[int] = None) -> DataFrame:
        """Time-travel read (reference:odbc2deltalake/reader/spark_reader.py:123-133).

        Live dirs are grouped by written schema; each group is one parquet
        scan (pushdown + pruning intact), then cast-unioned to the table's
        final schema — this is how append-time type widening / added
        columns read back without rewriting old files.
        """
        st = self._state_at(version)
        target = T.StructType.fromJson(json.loads(st["schema"]))
        if not st["dirs"]:
            return spark.createDataFrame([], target)
        groups: dict[str, list[str]] = {}
        for d in st["dirs"]:
            groups.setdefault(d["schema"], []).append(str(self.root / d["dir"]))
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
        writer.parquet(str(self.root / dir_name))
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
        live = {d["dir"] for d in self._state_at()["dirs"]}
        removed = []
        for p in self.root.iterdir():
            if p.is_dir() and p.name.startswith("d") and p.name not in live:
                shutil.rmtree(p)
                removed.append(p.name)
        return removed

    def delete_table(self) -> None:
        if self.root.exists():
            shutil.rmtree(self.root)

    # ---------- merge ----------

    def merge_upsert(
        self, spark: SparkSession, source: DataFrame, key_cols: list[str]
    ) -> int:
        """MERGE on key equality: whenMatchedUpdateAll /
        whenNotMatchedInsertAll (reference:odbc2deltalake/reader/spark_reader.py:329-350).

        Implemented as ``source ∪ (target ∖ source.keys)`` + overwrite —
        the same result Delta's MERGE produces for update-all/insert-all.
        Used only on the (small) ``latest_pk_version`` index; the SCD2
        history table is append-only. The anti join broadcasts the source
        key set when small; at 100 TB scale this table is keys-only and
        orders of magnitude smaller than the history table.
        """
        if not self.exists():
            return self.write(source, mode="overwrite")
        target = self.read(spark)
        keep = target.join(source.select(*key_cols), on=key_cols, how="left_anti")
        merged = source.unionByName(keep, allowMissingColumns=True)
        return self.write(merged, mode="overwrite")
