"""Encoding-proof gate for the events fixture loader.

The driver regenerated ``events.parquet`` with a different parquet
timestamp encoding between rounds (TIMESTAMP(NANOS) in r1-r3,
timestamp[us]/TIMESTAMP_NTZ from r4), which broke every ``unix_micros``
consumer. A real lake contains all three physical encodings:

- TIMESTAMP(NANOS)            -> bigint under nanosAsLong
- TIMESTAMP(MICROS), no tz    -> TIMESTAMP_NTZ
- TIMESTAMP(MICROS), tz=UTC   -> TIMESTAMP (session-local)

This test writes the SAME logical events rows in each encoding via
pyarrow and asserts ``load_table`` canonicalizes every one to identical
TIMESTAMP rows, so the next fixture regeneration cannot silently
reintroduce the r4 regression. Mirrors the reference's per-dialect type
maps (reference:odbc2deltalake/write_init.py:29-38,
reference:read_utils/delta_rs.py:22-57) on the read side.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.queries.registry import load_table

# 2024-01-01T00:00:00.123456Z and a few offsets, all micro-precise so the
# value survives every encoding exactly.
_BASE_US = 1_704_067_200_123_456
_ROWS = [
    (1, _BASE_US, 10, "view", 1.5, "{}"),
    (2, _BASE_US + 7_000_000, 10, "click", 2.5, "{}"),
    (3, _BASE_US + 86_400_000_000, 11, "purchase", 9.9, "{}"),
]


def _write_events(path, ts_type) -> None:
    # int64 -> timestamp casts interpret the integer in the TARGET unit, so
    # anchor the logical instant at micros first, then re-encode.
    ts = (
        pa.array([r[1] for r in _ROWS], type=pa.int64())
        .cast(pa.timestamp("us"))
        .cast(ts_type)
    )
    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in _ROWS], pa.int64()),
            "ts": ts,
            "user_id": pa.array([r[2] for r in _ROWS], pa.int64()),
            "event_type": pa.array([r[3] for r in _ROWS], pa.string()),
            "value": pa.array([r[4] for r in _ROWS], pa.float64()),
            "props": pa.array([r[5] for r in _ROWS], pa.string()),
        }
    )
    # version=2.6 is required for parquet nanos; harmless for the others
    pq.write_table(table, path, version="2.6")


ENCODINGS = {
    "nanos": pa.timestamp("ns"),
    "micros_ntz": pa.timestamp("us"),
    "micros_utc": pa.timestamp("us", tz="UTC"),
}


@pytest.fixture(scope="module")
def encoded_dirs(tmp_path_factory):
    dirs = {}
    for name, ts_type in ENCODINGS.items():
        d = tmp_path_factory.mktemp(f"enc_{name}")
        _write_events(str(d / "events.parquet"), ts_type)
        dirs[name] = str(d)
    return dirs


@pytest.mark.parametrize("encoding", list(ENCODINGS))
def test_load_table_canonicalizes_every_encoding(spark, encoded_dirs, encoding):
    df = load_table(spark, encoded_dirs[encoding], "events")
    assert dict(df.dtypes)["ts"] == "timestamp", encoding
    got = sorted(
        (r.event_id, r.us) for r in df.select("event_id", F.unix_micros("ts").alias("us")).collect()
    )
    want = sorted((r[0], r[1]) for r in _ROWS)
    assert got == want, encoding


def test_all_encodings_yield_identical_rows(spark, encoded_dirs):
    collected = {
        name: sorted(tuple(r) for r in load_table(spark, d, "events").collect())
        for name, d in encoded_dirs.items()
    }
    base = collected["micros_ntz"]
    assert base[0][1] == datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)
    for name, rows in collected.items():
        assert rows == base, name


def test_driver_testdata_loads_canonically(spark):
    """Whatever encoding the driver ships NOW must load as TIMESTAMP."""
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # unix_micros must resolve (this exact call threw on r4's NTZ files)
    assert df.select(F.unix_micros("ts")).first()[0] is not None
