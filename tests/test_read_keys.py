"""read_keys (r9): driver-side bucket routing for keyed point lookups.
The bucket of each key is computed with the pure-Python xxhash64 chain
(same function merges route with), so the scan opens only the buckets
that can hold the keys — wrong routing would MISS rows, so every test
is an exact-result test by construction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _merged(spark, tmp_path, n=4000, nb=8):
    t = VersionedParquetTable(tmp_path / "t")
    df = spark.range(n).select(
        F.col("id").alias("pk"),
        (F.col("id") * 3).alias("v"),
        F.concat(F.lit("r"), F.col("id")).alias("tag"),
    )
    t.merge_upsert(spark, df, key_cols=["pk"], num_buckets=nb)
    return t


def test_single_key_lookup_prunes_buckets(spark, tmp_path):
    t = _merged(spark, tmp_path)
    full_files = set(t.read(spark).inputFiles())
    got = t.read_keys(spark, [7, 1234, 3999]).collect()
    assert sorted(r["pk"] for r in got) == [7, 1234, 3999]
    assert {r["pk"]: r["tag"] for r in got}[1234] == "r1234"
    # the scan opened a strict subset of buckets
    probe_files = set(
        t.read_keys(spark, [7, 1234, 3999]).inputFiles()
    )
    assert probe_files < full_files
    # absent keys return empty; NULLs match nothing
    assert t.read_keys(spark, [10**9]).count() == 0
    assert t.read_keys(spark, [None]).count() == 0


def test_lookup_sees_patches_and_masks(spark, tmp_path):
    t = _merged(spark, tmp_path, n=1000)
    up = spark.createDataFrame([(77, 999999, "patched")], "pk long, v long, tag string")
    t.merge_upsert(spark, up, ["pk"], strategy="patch")
    assert len(t._state_at()["patches"]) == 1  # chain outstanding
    got = {r["pk"]: r["tag"] for r in t.read_keys(spark, [77, 78]).collect()}
    assert got == {77: "patched", 78: "r78"}


def test_composite_key_lookup(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    df = spark.range(2000).select(
        (F.col("id") % 50).alias("a"),
        F.concat(F.lit("g"), (F.col("id") / 50).cast("long")).alias("b"),
        F.col("id").alias("payload"),
    )
    t.merge_upsert(spark, df, key_cols=["a", "b"], num_buckets=8)
    want = sorted(
        tuple(r)
        for r in t.read(spark)
        .filter(
            ((F.col("a") == 3) & (F.col("b") == "g4"))
            | ((F.col("a") == 10) & (F.col("b") == "g0"))
        )
        .collect()
    )
    got = sorted(
        tuple(r) for r in t.read_keys(spark, [(3, "g4"), (10, "g0")]).collect()
    )
    assert got == want and len(got) == 2
    # wrong arity keys are dropped (match nothing), not mis-hashed
    assert t.read_keys(spark, [(3,)]).count() == 0


def test_unsupported_key_type_falls_back_exact(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    df = spark.range(500).select(
        (F.col("id") * 0.5).alias("fk"), F.col("id").alias("v")
    )
    t.merge_upsert(spark, df, key_cols=["fk"], num_buckets=4)
    got = t.read_keys(spark, [7.5]).collect()
    assert [r["v"] for r in got] == [15]


def test_non_bucketized_raises(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(10).select(F.col("id").alias("k")), mode="append")
    with pytest.raises(ValueError, match="bucket"):
        t.read_keys(spark, [1])
