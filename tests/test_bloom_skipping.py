"""Bloom-filter data skipping (r9): per-file bloom bitmaps written with
``write(bloom_cols=[...])`` cut files on `=` probes that [min, max]
intervals cannot — point lookups on uniformly distributed keys (UUIDs,
hashes), where every file's interval spans every value. The contract:
pruning NEVER drops a matching row (no false negatives — bloom math),
and the result always equals the unpruned filter."""

from __future__ import annotations

import uuid

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _t(spark, tmp_path, n=4000, files=8):
    """One commit of `files` files; `key` is uniformly spread so every
    file's [min, max] interval covers ~the full range (stats useless),
    while each file holds a DISJOINT residue class (bloom decisive)."""
    t = VersionedParquetTable(tmp_path / f"t{uuid.uuid4().hex[:8]}")
    df = (
        spark.range(n)
        .select(
            F.col("id").alias("key"),
            (F.col("id") % files).cast("int").alias("part"),
            F.concat(F.lit("u"), F.col("id")).alias("tag"),
        )
        .repartition(files, "part")
    )
    t.write(
        df,
        mode="append",
        stats_cols=["key"],
        per_file_stats=True,
        bloom_cols=["key", "tag"],
    )
    return t


def test_point_lookup_cuts_files_and_stays_exact(spark, tmp_path):
    t = _t(spark, tmp_path)
    full = t.read(spark)
    all_files = set(full.inputFiles())
    assert len(all_files) >= 4
    # every file's key interval spans the probe, so stats alone keep
    # all files; the bloom must cut to ~the one residue-class file
    probe = t.read(spark, skip_where=("key", "=", 1234))
    assert set(probe.inputFiles()) < all_files
    assert len(set(probe.inputFiles())) <= 2
    assert [r["tag"] for r in probe.collect()] == ["u1234"]
    # string column probe too
    sprobe = t.read(spark, skip_where=("tag", "=", "u777"))
    assert len(set(sprobe.inputFiles())) <= 2
    assert [r["key"] for r in sprobe.collect()] == [777]


def test_in_list_probe_unions_bloom_survivors(spark, tmp_path):
    """`in` probes test each listed value: survivors are the UNION of
    per-value bloom survivors, so a two-id lookup opens ~two files of
    eight while staying exact — the 'fetch these ids' path a 100 TB
    GDPR/debugging workload needs."""
    t = _t(spark, tmp_path)
    full = t.read(spark)
    all_files = set(full.inputFiles())
    probe = t.read(spark, skip_where=("key", "in", [100, 3001]))
    assert set(probe.inputFiles()) < all_files
    assert len(set(probe.inputFiles())) <= 4
    assert sorted(r["key"] for r in probe.collect()) == [100, 3001]
    # absent ids drop the whole commit; NULL-only / empty lists too
    assert t.read(spark, skip_where=("key", "in", [10**9, 10**9 + 1])).count() == 0
    assert t.read(spark, skip_where=("key", "in", [])).count() == 0
    assert t.read(spark, skip_where=("key", "in", [None])).count() == 0
    # mixed present/absent: exact single-row result
    mixed = t.read(spark, skip_where=("key", "in", [42, 10**9, None]))
    assert [r["key"] for r in mixed.collect()] == [42]


def test_absent_value_drops_the_whole_commit(spark, tmp_path):
    t = _t(spark, tmp_path, n=1000)
    gone = t.read(spark, skip_where=("key", "=", 10_000_000))
    assert gone.count() == 0
    assert set(gone.inputFiles()) == set()


def test_composes_with_interval_stats_and_other_ops(spark, tmp_path):
    t = _t(spark, tmp_path)
    # range op on the same read: bloom applies to the `=` conjunct,
    # intervals to the range; result equals the plain filter
    got = t.read(
        spark, skip_where=[("key", "=", 500), ("part", ">=", 0)]
    ).collect()
    want = (
        t.read(spark)
        .filter((F.col("key") == 500) & (F.col("part") >= 0))
        .collect()
    )
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_update_mask_invalidates_bloom(spark, tmp_path):
    # a lazy UPDATE rewrites values at read time: the bloom (built on
    # written values) must be ignored for the SET column on masked dirs
    t = _t(spark, tmp_path, n=200, files=4)
    t.update_where(spark, {"key": "key + 1000000"}, ("part", "=", 2), lazy=True)
    moved = t.read(spark, skip_where=("key", "=", 1000002)).collect()
    assert len(moved) == 1 and moved[0]["tag"] == "u2"


def test_bloom_survives_restore_and_checkpoint(spark, tmp_path):
    t = _t(spark, tmp_path, n=500, files=4)
    v = t.version()
    t.write(
        spark.createDataFrame([(10**7, 0, "x")], "key long, part int, tag string"),
        mode="append",
    )
    t.restore(v)
    t.checkpoint()
    probe = t.read(spark, skip_where=("key", "=", 123))
    assert len(set(probe.inputFiles())) <= 2
    assert [r["tag"] for r in probe.collect()] == ["u123"]


def test_widened_append_hashes_with_its_own_type(spark, tmp_path):
    # first commit writes key as INT, second as LONG (widening): each
    # dir's bloom records its written type, so probes hash per dir
    t = VersionedParquetTable(tmp_path / f"t{uuid.uuid4().hex[:8]}")
    a = spark.range(100).select(
        F.col("id").cast("int").alias("key"), F.lit("a").alias("src")
    )
    t.write(a, mode="append", bloom_cols=["key"])
    b = spark.range(100, 200).select(
        F.col("id").cast("long").alias("key"), F.lit("b").alias("src")
    )
    t.write(b, mode="append", merge_schema=True, bloom_cols=["key"])
    for probe, src in ((50, "a"), (150, "b")):
        got = t.read(spark, skip_where=("key", "=", probe)).collect()
        assert len(got) == 1 and got[0]["src"] == src


def test_engine_python_hash_matches_spark(spark):
    """The driver-side XXH64 the read path uses must equal Spark's
    xxhash64 for every type it claims (probe hashing must not need a
    Spark job, but it must hash IDENTICALLY)."""
    import json as _json

    from odbc2deltalake_spark.functions.xxh64 import spark_xxhash64

    for tname, vals in [
        ("long", [0, 1, -1, 2**62, -(2**62), 99887766554433]),
        ("integer", [0, -1, 2**31 - 1, -(2**31)]),
        ("string", ["", "a", "käse-🧀", "x" * 33]),
    ]:
        import pyspark.sql.types as T

        dt = T._parse_datatype_json_string(_json.dumps(tname))
        df = spark.createDataFrame(
            [(v,) for v in vals],
            T.StructType([T.StructField("v", dt, True)]),
        )
        want = [
            int(r["h"])
            for r in df.select(F.xxhash64("v").alias("h")).collect()
        ]
        got = [spark_xxhash64(v, _json.dumps(tname)) for v in vals]
        assert got == want, tname
    # multi-column chaining (bucket routing): each column's hash seeds
    # the next, NULL columns leave the hash unchanged
    from odbc2deltalake_spark.functions.xxh64 import spark_xxhash64_chain

    df = spark.createDataFrame([(5, "abc", None)], "a long, b string, c long")
    row = df.select(
        F.xxhash64("a", "b", "c").alias("h3"),
        F.xxhash64("c").alias("hnull"),
    ).first()
    tj = ['"long"', '"string"', '"long"']
    assert spark_xxhash64_chain([5, "abc", None], tj) == int(row["h3"])
    assert spark_xxhash64_chain([None], ['"long"']) == int(row["hnull"]) == 42


def test_auto_sized_bits_scale_with_rows(spark, tmp_path):
    # 100k rows over 4 files = 25k rows/file -> 12 bits/row rounds up
    # to 2^19; a tiny table stays at the 4096 floor
    from odbc2deltalake_spark.tablestore import VersionedParquetTable as V

    big = V(tmp_path / "big")
    big.write(
        spark.range(100_000).select(F.col("id").alias("key")).repartition(4),
        mode="append",
        bloom_cols=["key"],
    )
    assert big._read_commit(0)["bloom"]["m"] == 1 << 19
    small = V(tmp_path / "small")
    small.write(
        spark.range(100).select(F.col("id").alias("key")),
        mode="append",
        bloom_cols=["key"],
    )
    assert small._read_commit(0)["bloom"]["m"] == 4096
    # and the auto-sized bloom still prunes exactly
    probe = big.read(spark, skip_where=("key", "=", 54321))
    assert [r["key"] for r in probe.collect()] == [54321]
    assert len(set(probe.inputFiles())) <= 2


def test_sidecar_blooms_roundtrip(spark, tmp_path, monkeypatch):
    """Bitmaps above the inline cap land in <dir>/_bloom.json: the
    commit carries only {m,k,types,ref}; engine reads, the external
    reader, restore/checkpoint, and fold all keep working."""
    from odbc2deltalake_spark.tablestore import VersionedParquetTable as V

    from tools.external_reader import read_table

    monkeypatch.setattr(V, "BLOOM_INLINE_MAX_B64", 64)  # force sidecar
    t = _t(spark, tmp_path, n=800, files=4)
    c = t._read_commit(0)
    assert "files" not in c["bloom"] and c["bloom"]["ref"].endswith("_bloom.json")
    probe = t.read(spark, skip_where=("key", "=", 123))
    assert [r["tag"] for r in probe.collect()] == ["u123"]
    assert len(set(probe.inputFiles())) <= 2
    # external reader resolves the sidecar
    ext = read_table(t.root, skip_where=("key", "=", 123))
    assert [d["tag"] for d in ext.to_pylist()] == ["u123"]
    # survives checkpoint + restore, and a fold re-collects (sidecar or
    # inline per the rewritten dir's size — probe must stay exact)
    v = t.version()
    t.checkpoint()
    t.write(
        spark.createDataFrame([(10**7, 0, "x")], "key long, part int, tag string"),
        mode="append",
    )
    t.restore(v)
    assert [r["tag"] for r in t.read(spark, skip_where=("key", "=", 123)).collect()] == ["u123"]
    t.delete_where(spark, ("part", "=", 2), lazy=True)
    t.fold_masks(spark)
    assert [r["tag"] for r in t.read(spark, skip_where=("key", "=", 123)).collect()] == ["u123"]
    assert t.read(spark, skip_where=("key", "=", 2)).count() == 0
    # a vandalized sidecar degrades to a full scan, never a wrong answer
    for p in (tmp_path / f"{t.root.name}").rglob("_bloom.json"):
        p.write_text("{corrupt")
    t2 = V(t.root)  # fresh instance: no memoized sidecar cache
    assert [r["tag"] for r in t2.read(spark, skip_where=("key", "=", 123)).collect()] == ["u123"]


def test_compact_preserves_bloom_index(spark, tmp_path):
    """OPTIMIZE must not degrade point lookups: a full compact
    re-collects bitmaps for every previously-bloomed column by
    default."""
    t = _t(spark, tmp_path, n=2000, files=8)
    t.compact(spark, out_partitions=6)
    full = t.read(spark)
    n_files = len(set(full.inputFiles()))
    assert n_files >= 4
    probe = t.read(spark, skip_where=("key", "=", 1234))
    assert len(set(probe.inputFiles())) < n_files
    assert [r["tag"] for r in probe.collect()] == ["u1234"]


def test_partial_compact_preserves_bloom_index(spark, tmp_path):
    t = _t(spark, tmp_path, n=1000, files=4)
    t.write(
        spark.range(10**6, 10**6 + 1000)
        .select(
            F.col("id").alias("key"),
            (F.col("id") % 4).cast("int").alias("part"),
            F.concat(F.lit("u"), F.col("id")).alias("tag"),
        )
        .repartition(4, "part"),
        mode="append",
        stats_cols=["key"],
        per_file_stats=True,
        bloom_cols=["key", "tag"],
    )
    # rewrite only the second commit; the first keeps its own bloom
    t.compact(spark, where=("key", ">=", 10**6), out_partitions=3)
    for probe_key in (123, 10**6 + 77):
        probe = t.read(spark, skip_where=("key", "=", probe_key))
        assert [r["key"] for r in probe.collect()] == [probe_key]
        assert len(set(probe.inputFiles())) <= 2
    # and an absent id still refutes everything
    assert t.read(spark, skip_where=("key", "=", 5_000_000)).count() == 0


def test_fold_masks_recollects_blooms(spark, tmp_path):
    """A fold rewrites masked dirs into new files: the bloom must be
    re-collected (old file names are gone), and a lazy UPDATE's folded
    values must probe at their NEW values."""
    t = _t(spark, tmp_path, n=400, files=4)
    t.delete_where(spark, ("part", "=", 3), lazy=True)
    t.update_where(spark, {"key": "key + 1000000"}, ("part", "=", 1), lazy=True)
    t.fold_masks(spark)
    full = t.read(spark)
    n_files = len(set(full.inputFiles()))
    # moved key found at its new value, pruned below a full scan
    moved = t.read(spark, skip_where=("key", "=", 1000001))
    assert [r["tag"] for r in moved.collect()] == ["u1"]
    assert len(set(moved.inputFiles())) < n_files
    # deleted partition's keys are gone; old pre-update key refuted
    assert t.read(spark, skip_where=("key", "=", 3)).count() == 0
    assert t.read(spark, skip_where=("key", "=", 1)).count() == 0


@settings(
    max_examples=15,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    keys=st.lists(
        st.integers(min_value=-(2**40), max_value=2**40),
        min_size=1,
        max_size=30,
        unique=True,
    ),
    probe_idx=st.integers(0, 29),
)
def test_no_false_negatives_property(spark, tmp_path_factory, keys, probe_idx):
    # every present value MUST be found through the pruned read
    root = tmp_path_factory.mktemp("bloomprop") / f"t{uuid.uuid4().hex[:8]}"
    t = VersionedParquetTable(root)
    df = spark.createDataFrame([(k,) for k in keys], "key long").repartition(3)
    t.write(df, mode="append", bloom_cols=["key"])
    probe = keys[probe_idx % len(keys)]
    got = t.read(spark, skip_where=("key", "=", probe)).collect()
    assert [r["key"] for r in got] == [probe]
    # and an absent probe returns empty (exactness, not just pruning)
    absent = max(keys) + 1
    assert t.read(spark, skip_where=("key", "=", absent)).count() == 0


def test_null_probe_and_null_values_are_safe(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / f"t{uuid.uuid4().hex[:8]}")
    df = spark.createDataFrame(
        [(1, "a"), (None, "b"), (3, None)], "key long, tag string"
    )
    t.write(df, mode="append", bloom_cols=["key", "tag"])
    # = NULL matches nothing in SQL; the bloom path must not crash and
    # the residual filter returns the SQL-correct empty result
    assert t.read(spark, skip_where=("key", "=", None)).count() == 0
    assert [r["tag"] for r in t.read(spark, skip_where=("key", "=", 3)).collect()] == [None]


def test_merge_preserves_bloom_index(spark, tmp_path):
    """r10: EVERY bucket rewrite re-collects the table's bloom index for
    the dirs it writes — bucketization, partial merges, and keyed
    deletes included — so point lookups keep their file cut after each
    CDC cycle instead of silently degrading (the preservation rule
    compact/fold_masks already follow)."""
    t = _t(spark, tmp_path)
    # full conversion to bucketed layout: new bucket dirs carry blooms
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(99999, 7, "u99999")], "key long, part int, tag string"
        ),
        ["key"],
        num_buckets=4,
    )
    st = t._state_at()
    assert st["dirs"] and all(d.get("bucket") is not None for d in st["dirs"])
    bloomed = [d for d in st["dirs"] if d.get("bloom")]
    assert bloomed, "bucketization dropped the bloom index"
    assert all(
        set(d["bloom"]["types"]) == {"key", "tag"} for d in bloomed
    )
    # the bloom still cuts: a one-key probe opens a file subset
    all_files = set(t.read(spark).inputFiles())
    probe = t.read(spark, skip_where=("key", "=", 1234))
    assert set(probe.inputFiles()) < all_files
    assert [r["tag"] for r in probe.collect()] == ["u1234"]

    # partial merge: the rewritten buckets' NEW dirs re-collect blooms
    dirs_before = {d["dir"] for d in st["dirs"]}
    t.merge_upsert(
        spark,
        spark.createDataFrame(
            [(1234, 2, "u1234x")], "key long, part int, tag string"
        ),
        ["key"],
    )
    st2 = t._state_at()
    new_dirs = [d for d in st2["dirs"] if d["dir"] not in dirs_before]
    assert new_dirs, "partial merge rewrote nothing"
    assert all(d.get("bloom") for d in new_dirs)
    # probe reflects the upsert and still prunes
    probe2 = t.read(spark, skip_where=("tag", "=", "u1234x"))
    assert [r["key"] for r in probe2.collect()] == [1234]
    assert set(probe2.inputFiles()) < set(t.read(spark).inputFiles())
    # absent-value probe is refuted by the fresh bitmaps
    assert t.read(spark, skip_where=("tag", "=", "u1234")).count() == 0


def test_merge_without_bloom_index_collects_nothing(spark, tmp_path):
    """No index, no pass: a table written without bloom_cols must not
    pay the collection scan on merges (entries carry no bloom field)."""
    t = VersionedParquetTable(tmp_path / "plain")
    t.write(
        spark.range(100).select(
            F.col("id").alias("key"), F.lit("x").alias("tag")
        ),
        mode="append",
    )
    t.merge_upsert(
        spark,
        spark.createDataFrame([(5, "y")], "key long, tag string"),
        ["key"],
        num_buckets=2,
    )
    assert all(not d.get("bloom") for d in t._state_at()["dirs"])
