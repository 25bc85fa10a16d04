"""Measured bloom-filter-skipping study: point lookups on a uniformly
distributed key.

The scenario the bloom field exists for: a table whose lookup key is
hash-spread (UUIDs, content hashes, uniform ids) across many files, so
every file's [min, max] interval spans every key and interval skipping
keeps EVERYTHING. Measures, on the same table:

- write overhead of collecting the bitmaps (write with vs without
  ``bloom_cols`` — the one extra distributed pass);
- point-lookup wall time and files scanned, stats-only vs bloom
  (``skip_where=("key", "=", k)``);
- a 100-id ``in``-list lookup, stats-only vs bloom (the batched-probe
  hashing path).

    python tools/bloom_study.py [rows] [files] [probes]
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import pyspark.sql.functions as F  # noqa: E402

from odbc2deltalake_spark.session import get_spark  # noqa: E402
from odbc2deltalake_spark.tablestore import VersionedParquetTable  # noqa: E402


def _mk_table(spark, root, rows, files, bloom):
    t = VersionedParquetTable(root)
    df = spark.range(rows).select(
        F.col("id").alias("key"),
        (F.col("id") % 97).alias("shard"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    ).repartition(files, "key")
    t0 = time.time()
    t.write(
        df,
        mode="append",
        stats_cols=["key"],
        per_file_stats=True,
        bloom_cols=["key"] if bloom else None,  # m auto-sized: ~12 bits/row
    )
    return t, time.time() - t0


def _probe(spark, t, keys):
    pred = ("key", "=", keys[0]) if len(keys) == 1 else ("key", "in", keys)
    t0 = time.time()
    df = t.read(spark, skip_where=pred)
    n = df.count()
    wall = time.time() - t0
    return wall, n, len(set(df.inputFiles()))


def run(rows: int, files: int, probes: int) -> dict:
    spark = get_spark("bloom_study")
    out: dict = {"rows": rows, "files": files, "probes": probes}
    with tempfile.TemporaryDirectory(prefix="bloom_study_") as tmp:
        t_plain, w_plain = _mk_table(spark, f"{tmp}/plain", rows, files, False)
        t_bloom, w_bloom = _mk_table(spark, f"{tmp}/bloom", rows, files, True)
        out["write_sec_stats_only"] = round(w_plain, 3)
        out["write_sec_with_bloom"] = round(w_bloom, 3)
        ks = [int(rows * (i + 0.5) / probes) for i in range(probes)]
        for label, t in (("stats_only", t_plain), ("bloom", t_bloom)):
            walls, fcounts = [], []
            for k in ks:
                w, n, nf = _probe(spark, t, [k])
                assert n == 1, (label, k, n)
                walls.append(w)
                fcounts.append(nf)
            out[f"point_sec_{label}"] = round(sum(walls) / len(walls), 4)
            out[f"point_files_{label}"] = round(
                sum(fcounts) / len(fcounts), 2
            )
        id_list = [int(rows * (i + 0.5) / 100) for i in range(100)]
        for label, t in (("stats_only", t_plain), ("bloom", t_bloom)):
            w, n, nf = _probe(spark, t, id_list)
            assert n == 100, (label, n)
            out[f"inlist100_sec_{label}"] = round(w, 3)
            out[f"inlist100_files_{label}"] = nf
    return out


if __name__ == "__main__":
    rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    files = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    probes = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    print(json.dumps(run(rows, files, probes)))
