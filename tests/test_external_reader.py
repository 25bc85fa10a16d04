"""External-reader proof of docs/commit-format.md.

tools/external_reader.py implements the commit-log spec with pyarrow
only (zero imports from the engine). Pinning its row sets against
``VersionedParquetTable.read`` across the full lifecycle — plain write,
append, schema evolution, bucketized conversion, partial merge,
rebucket, restore, vacuum — proves the documented format is what the
writer actually produces, the way the reference proves its Delta output
with an external duckdb read (reference:tests/test_03_delta.py:101-112).
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
if str(REPO) not in sys.path:
    sys.path.insert(0, str(REPO))

from tools.external_reader import read_table, snapshot  # noqa: E402

from odbc2deltalake_spark.tablestore import VersionedParquetTable  # noqa: E402


def _spark_rows(t, spark, version=None):
    df = t.read(spark, version=version)
    cols = df.columns
    return cols, sorted(tuple(r) for r in df.collect())


def _external_rows(root, version=None):
    tbl = read_table(root, version)
    cols = tbl.schema.names
    return cols, sorted(tuple(d[c] for c in cols) for d in tbl.to_pylist())


def _assert_match(t, root, spark, version=None):
    scols, srows = _spark_rows(t, spark, version)
    ecols, erows = _external_rows(root, version)
    assert ecols == scols
    assert erows == srows


def test_external_reader_full_lifecycle(spark, tmp_path):
    root = tmp_path / "t"
    t = VersionedParquetTable(root)

    # v0: plain overwrite
    t.write(
        spark.createDataFrame([(i, f"v{i}", float(i)) for i in range(40)],
                              "id long, v string, x double"),
        mode="overwrite",
    )
    # v1: plain append
    t.write(
        spark.createDataFrame([(i, f"v{i}", float(i)) for i in range(40, 60)],
                              "id long, v string, x double"),
        mode="append",
    )
    # v2: schema evolution — appended files are narrower than the table
    t.write(
        spark.createDataFrame([(i, f"v{i}", float(i), i % 3) for i in range(60, 70)],
                              "id long, v string, x double, grp int"),
        mode="append",
        merge_schema=True,
    )
    # v3: bucketized conversion (merge_upsert on an unbucketed table)
    t.merge_upsert(
        spark,
        spark.createDataFrame([(0, "V0", 0.0, 0)], "id long, v string, x double, grp int"),
        ["id"],
        num_buckets=4,
    )
    # v4: partial merge (replaces only touched buckets)
    t.merge_upsert(
        spark,
        spark.createDataFrame([(1, "V1", 1.0, 1), (70, "n70", 70.0, 1)],
                              "id long, v string, x double, grp int"),
        ["id"],
    )
    # v5: rebucket — tiny target rows forces oversize -> doubled NB rewrite
    t.merge_upsert(
        spark,
        spark.createDataFrame([(2, "V2", 2.0, 2)], "id long, v string, x double, grp int"),
        ["id"],
        target_bucket_rows=4,
    )
    for v in (None, 0, 1, 2, 3, 4, 5):
        _assert_match(t, root, spark, version=v)

    # v6: restore back to the pre-merge snapshot
    t.restore(2)
    _assert_match(t, root, spark)
    # v7: merge again on top of the restore (re-bucketizes)
    t.merge_upsert(
        spark,
        spark.createDataFrame([(3, "V3", 3.0, 0)], "id long, v string, x double, grp int"),
        ["id"],
        num_buckets=4,
    )
    _assert_match(t, root, spark)

    # vacuum keeps the last 3 versions readable — externally too
    t.vacuum(retain_versions=3)
    for v in (None, 7, 6, 5):
        _assert_match(t, root, spark, version=v)


def test_external_reader_hive_partitioned_write(spark, tmp_path):
    root = tmp_path / "p"
    t = VersionedParquetTable(root)
    t.write(
        spark.createDataFrame(
            [(i, i % 3, f"r{i}") for i in range(30)], "id long, part int, v string"
        ),
        mode="overwrite",
        partition_by=["part"],
    )
    _assert_match(t, root, spark)


def test_external_reader_props_and_version(spark, tmp_path):
    root = tmp_path / "q"
    t = VersionedParquetTable(root)
    t.write(spark.createDataFrame([(1, "a")], "id long, v string"), mode="overwrite")
    t.set_properties({"owner": "pipeline", "tier": "gold"})
    st = snapshot(root)
    assert st["version"] == t.version() == 1
    assert st["props"] == {"owner": "pipeline", "tier": "gold"}
    # the metadata-only commit (dir: null) must not add a scan entry
    _assert_match(t, root, spark)


def test_conjunctive_skip_prunes_same_files_as_engine(spark, tmp_path):
    """VERDICT r6 #5: the spec's reader algorithm supports the list form
    of ``skip_where`` (implicit AND). On a Z-ordered commit with
    per-file stats on two columns, the external reader must (a) return
    exactly the rows of an unpruned filter and (b) OPEN the same file
    set the engine opens — conjunctive pruning is part of the public
    format contract, not an engine-private optimization."""
    from pyspark.sql import functions as F

    df = spark.range(4000).select(
        (F.col("id") % 100).alias("a"),
        (F.col("id") / 100).cast("long").alias("b"),
        F.col("id").alias("payload"),
    )
    t = VersionedParquetTable(tmp_path / "t")
    t.write(df, mode="append")
    t.compact(spark, zorder_by=["a", "b"], out_partitions=8)
    pred = [("a", ">=", 50), ("b", "<", 10)]

    # value parity: pruned conjunctive read == unpruned filter, both sides
    want = sorted(
        (r["a"], r["b"], r["payload"])
        for r in t.read(spark).collect()
        if r["a"] >= 50 and r["b"] < 10
    )
    eng = t.read(spark, skip_where=pred)
    assert sorted(tuple(r) for r in eng.select("a", "b", "payload").collect()) == want
    ext = read_table(tmp_path / "t", skip_where=pred)
    assert sorted(
        (d["a"], d["b"], d["payload"]) for d in ext.to_pylist()
    ) == want

    # file parity: same survivors, from the engine scan and the spec algo
    eng_files = {f.rsplit("/", 1)[-1] for f in eng.inputFiles()}
    st = snapshot(tmp_path / "t")
    from tools.external_reader import _conjuncts, _may_match, _stat_deser

    ext_files = set()
    for e in st["entries"]:
        stats = e.get("stats") or {}
        files_all = {f for f in stats if f != ""}
        keep = None
        drop = False
        for scol, sop, sval in _conjuncts(pred):
            per_file = {f: s for f, s in stats.items() if f != "" and scol in s}
            if not per_file:
                continue
            k = {
                f
                for f, s in per_file.items()
                if _may_match(
                    _stat_deser(s[scol][0]), _stat_deser(s[scol][1]), sop, sval
                )
            }
            k |= files_all - set(per_file)
            keep = k if keep is None else keep & k
        if drop or keep == set():
            continue
        ext_files |= keep if keep is not None else files_all
    assert ext_files == eng_files
    # the AND prunes at least as hard as either conjunct alone
    for single in pred:
        single_files = {
            f.rsplit("/", 1)[-1]
            for f in t.read(spark, skip_where=single).inputFiles()
        }
        assert ext_files <= single_files
    # and strictly harder than no predicate
    assert len(ext_files) < len({f.rsplit("/", 1)[-1] for f in t.read(spark).inputFiles()})


def test_external_reader_sees_update_where(spark, tmp_path):
    """update_where's restore commit reads back identically through the
    spec reader (delete is covered by the conjunctive-skip test)."""
    from pyspark.sql import functions as F

    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.range(10).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        mode="append",
    )
    t.update_where(spark, {"v": "v + 100"}, ("k", ">=", 5))
    eng = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    ext = sorted((d["k"], d["v"]) for d in read_table(tmp_path / "t").to_pylist())
    assert ext == eng
    assert ext[9] == (9, 118)


def test_external_reader_reconciles_patch_chain(spark, tmp_path):
    """Merge-on-read patch commits read back identically through the
    spec reader with the chain OUTSTANDING: latest-commit-wins per key,
    tombstones drop, inserted keys appear (docs/commit-format.md r8)."""
    from pyspark.sql import functions as F

    t = VersionedParquetTable(tmp_path / "t")
    t.merge_upsert(
        spark,
        spark.range(50).select(F.col("id").alias("k"), (F.col("id") * 2).alias("v")),
        ["k"],
    )
    t.merge_upsert(
        spark,
        spark.createDataFrame([(3, 333), (100, 1)], "k long, v long"),
        ["k"],
        strategy="patch",
    )
    t.merge_delete_keys(
        spark, spark.createDataFrame([(7,), (9999,)], "k long"), ["k"],
        strategy="patch",
    )
    t.merge_upsert(
        spark,
        spark.createDataFrame([(3, 444), (7, 777)], "k long, v long"),
        ["k"],
        strategy="patch",
    )
    assert len(t._state_at()["patches"]) == 3  # chain outstanding
    eng = sorted((r["k"], r["v"]) for r in t.read(spark).collect())
    ext = sorted((d["k"], d["v"]) for d in read_table(tmp_path / "t").to_pylist())
    assert ext == eng
    got = dict(ext)
    assert got[3] == 444 and got[7] == 777 and got[100] == 1


def test_external_reader_applies_tombstone_masks(spark, tmp_path):
    """Lazy-delete mask commits: the spec reader filters exactly the
    masked dirs in version order, keeps NULL-predicate rows, leaves
    post-mask appends untouched, and REFUSES update masks (the
    mask-update reader feature it does not implement)."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.createDataFrame(
            [(i, i * 2 if i % 10 else None) for i in range(40)],
            "k long, v long",
        ),
        mode="append",
        stats_cols=["k"],
    )
    t.delete_where(spark, ("k", "<", 10), lazy=True)
    t.delete_where(spark, ("v", ">", 60), lazy=True)  # NULL v rows kept
    t.write(
        spark.createDataFrame([(5, 10)], "k long, v long"), mode="append"
    )  # appended after the masks: not masked
    eng = sorted(
        ((r["k"], r["v"]) for r in t.read(spark).collect()),
        key=lambda r: (r[0], r[1] is None, r[1]),
    )
    ext = sorted(
        ((d["k"], d["v"]) for d in read_table(tmp_path / "t").to_pylist()),
        key=lambda r: (r[0], r[1] is None, r[1]),
    )
    assert ext == eng
    assert (5, 10) in ext and (30, None) in ext
    # fold, then the reader sees the same rows with no masks in play
    t.fold_masks(spark)
    ext2 = sorted(
        ((d["k"], d["v"]) for d in read_table(tmp_path / "t").to_pylist()),
        key=lambda r: (r[0], r[1] is None, r[1]),
    )
    assert ext2 == eng
    # update masks within the PORTABLE grammar now evaluate (r9,
    # VERDICT r8 #5): values must match the engine exactly
    t.update_where(spark, {"v": "v + 1"}, ("k", ">=", 20), lazy=True)
    eng3 = sorted(
        ((r["k"], r["v"]) for r in t.read(spark).collect()),
        key=lambda r: (r[0], r[1] is None, r[1]),
    )
    ext3 = sorted(
        ((d["k"], d["v"]) for d in read_table(tmp_path / "t").to_pylist()),
        key=lambda r: (r[0], r[1] is None, r[1]),
    )
    assert ext3 == eng3
    _ = _pytest  # refusal path covered in its own test below


def test_external_reader_in_and_ne_predicates_match_engine(spark, tmp_path):
    """`in` / `!=` are part of the public predicate grammar (r9): the
    spec reader must evaluate them in skip probes AND in serialized mask
    predicates with the engine's SQL three-valued semantics (NULL row
    values match nothing; in-lists with NULLs ignore them)."""
    from pyspark.sql import functions as F

    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.createDataFrame(
            [(i, i * 2 if i % 7 else None) for i in range(60)],
            "k long, v long",
        ),
        mode="append",
        stats_cols=["k"],
    )
    # lazy GDPR erasure by id-list + a != tombstone on a nullable col
    t.delete_where(spark, ("k", "in", [3, 11, 42]), lazy=True)
    t.delete_where(spark, ("v", "!=", 20), lazy=True)  # NULL v rows kept

    def _norm(rows):
        return sorted(rows, key=lambda r: (r[0], r[1] is None, r[1]))

    eng = _norm((r["k"], r["v"]) for r in t.read(spark).collect())
    ext = _norm(
        (d["k"], d["v"]) for d in read_table(tmp_path / "t").to_pylist()
    )
    assert ext == eng
    # NULL-v rows and k=10 (v=20) survived; the erased ids did not
    assert (7, None) in ext and (10, 20) in ext
    assert not {3, 11, 42} & {k for k, _ in ext}

    # skip-probe parity for in / != on the reader side
    for pred in (("k", "in", [10, 14, None]), ("k", "!=", 10)):
        want = _norm(
            tuple(r)
            for r in t.read(spark, skip_where=pred).select("k", "v").collect()
        )
        got = _norm(
            (d["k"], d["v"])
            for d in read_table(tmp_path / "t", skip_where=pred).to_pylist()
        )
        assert got == want, pred


def test_reader_xxh64_matches_spark(spark):
    """The reader's pure-Python XXH64 must equal Spark's xxhash64 for
    every type encoding it claims (the spec's `h`): long, int, short,
    byte, boolean, date, string — signed 64-bit values included."""
    import datetime

    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from tools.external_reader import _spark_xxhash64

    cases = [
        ("long", [0, 1, -1, 42, 2**62, -(2**62), 123456789012345]),
        ("integer", [0, 1, -1, 2**31 - 1, -(2**31), 777]),
        ("short", [0, -5, 32767, -32768]),
        ("byte", [0, 1, -128, 127]),
        ("boolean", [True, False]),
        ("date", [datetime.date(1970, 1, 1), datetime.date(2026, 8, 15),
                  datetime.date(1901, 2, 3)]),
        ("string", ["", "a", "hello world", "ü¶é-unicode", "x" * 7,
                    "y" * 8, "z" * 31, "w" * 32, "v" * 100]),
    ]
    for tname, vals in cases:
        dt = T._parse_datatype_json_string(json.dumps(tname))
        df = spark.createDataFrame(
            [(v,) for v in vals],
            T.StructType([T.StructField("v", dt, True)]),
        )
        want = [int(r["h"]) for r in df.select(F.xxhash64("v").alias("h")).collect()]
        got = [_spark_xxhash64(v, json.dumps(tname)) for v in vals]
        assert got == want, tname


def test_reader_prunes_via_bloom_same_files_as_engine(spark, tmp_path):
    """Bloom probes are part of the public format: the reader must open
    ONLY the engine's bloom-surviving files. Proven destructively — every
    file the engine's pruned read does NOT open is deleted from disk, so
    a reader that ignores (or mis-hashes) the bitmaps crashes instead of
    silently scanning more."""
    import uuid as _uuid

    from pyspark.sql import functions as F

    t = VersionedParquetTable(tmp_path / f"t{_uuid.uuid4().hex[:8]}")
    df = (
        spark.range(2000)
        .select(
            F.col("id").alias("key"),
            (F.col("id") % 8).cast("int").alias("part"),
            F.concat(F.lit("u"), F.col("id")).alias("tag"),
        )
        .repartition(8, "part")
    )
    t.write(df, mode="append", stats_cols=["key"], per_file_stats=True,
            bloom_cols=["key", "tag"])
    pred = [("key", "in", [77, 1503]), ("tag", "=", "u77")]
    eng = t.read(spark, skip_where=pred)
    want = sorted((r["key"], r["tag"]) for r in eng.collect())
    assert want == [(77, "u77")]
    survivors = {f.rsplit("/", 1)[-1] for f in eng.inputFiles()}
    root = Path(t.root)
    vandalized = 0
    for p in root.rglob("*.parquet"):
        if p.name not in survivors:
            # truncate, don't delete: a deleted file silently vanishes
            # from whole-dir dataset discovery (a reader that skipped
            # pruning would still pass), but an empty .parquet CRASHES
            # any scan that touches it — only exact pruning survives
            p.write_bytes(b"")
            vandalized += 1
    assert vandalized >= 4
    ext = read_table(root, skip_where=pred)
    assert sorted((d["key"], d["tag"]) for d in ext.to_pylist()) == want


def test_reader_skips_bloom_for_unsupported_types(spark, tmp_path):
    # a double-typed bloom column: the engine prunes with it (hashing
    # via Spark), the reader has no double encoding and must fall back
    # to scanning — returning exactly the same rows
    from pyspark.sql import functions as F

    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.range(100).select(
            (F.col("id") * 1.5).alias("score"), F.col("id").alias("k")
        ).repartition(4),
        mode="append",
        bloom_cols=["score"],
    )
    want = sorted(
        r["k"] for r in t.read(spark, skip_where=("score", "=", 7.5)).collect()
    )
    got = sorted(
        d["k"]
        for d in read_table(tmp_path / "t", skip_where=("score", "=", 7.5)).to_pylist()
    )
    assert got == want == [5]


def test_external_reader_update_masks_match_engine(spark, tmp_path):
    """Mask-update feature (r9): the portable SET grammar — arithmetic
    over column refs and literals, string literals, precedence,
    division-as-double — evaluates bit-identically to the engine,
    composing with tombstone masks, later patches, and stats pruning
    (SET columns lose their stats for pruning on masked dirs)."""
    from tools.external_reader import read_table

    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.createDataFrame(
            [(i, i * 2 if i % 7 else None, f"s{i}") for i in range(60)],
            "k long, v long, name string",
        ),
        mode="append",
        stats_cols=["k", "v"],
    )
    # arithmetic with precedence + NULL-predicate rows untouched
    t.update_where(spark, {"v": "v * 2 + 1"}, ("v", ">=", 40), lazy=True)
    # string literal SET, second mask composes over the first's output
    t.update_where(spark, {"name": "'masked'"}, ("v", ">=", 100), lazy=True)
    # later tombstone sees transformed values
    t.delete_where(spark, ("v", ">=", 200), lazy=True)
    eng = sorted(
        map(tuple, ((r["k"], r["v"], r["name"]) for r in t.read(spark).collect())),
        key=lambda r: (r[0], r[1] is None, r[1] or 0),
    )
    ext = sorted(
        ((d["k"], d["v"], d["name"]) for d in read_table(tmp_path / "t").to_pylist()),
        key=lambda r: (r[0], r[1] is None, r[1] or 0),
    )
    assert ext == eng
    assert any(n == "masked" for _, _, n in ext)
    # skip_where parity: the SET column's stats are invalid on masked
    # dirs — the reader must return the same rows as the engine for a
    # predicate on the UPDATED column
    eng_f = sorted(
        (r["k"], r["v"])
        for r in t.read(spark, skip_where=("v", ">=", 100)).collect()
    )
    ext_f = sorted(
        (d["k"], d["v"])
        for d in read_table(
            tmp_path / "t", skip_where=("v", ">=", 100)
        ).to_pylist()
    )
    assert ext_f == eng_f and eng_f


def test_external_reader_refuses_exotic_set_text(spark, tmp_path):
    """SET text outside the portable grammar (function calls, CASE, ...)
    still REFUSES at plan time — never mis-evaluates."""
    import pytest as _pytest
    from tools.external_reader import read_table

    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        spark.createDataFrame([(i, i) for i in range(30)], "k long, v long"),
        mode="append",
    )
    t.update_where(spark, {"v": "greatest(v, 5)"}, ("k", "<", 10), lazy=True)
    with _pytest.raises(ValueError, match="portable grammar"):
        read_table(tmp_path / "t")
    # the engine itself still reads it fine
    assert t.read(spark).count() == 30


def test_external_reader_sees_absorbed_mask_and_patch_key_stats(spark, tmp_path):
    """r11 commit shapes through the standalone reader: a mask that
    auto-rebased over a racing append carries ABSORBED dirs in
    dirs_masked (the racer's matching rows must be masked externally
    too), and a patch commit now records patch_key_stats — an unknown
    field an older-format reader must ignore, not choke on."""
    from pyspark.sql import functions as F  # noqa: F401

    root = tmp_path / "t"
    t = VersionedParquetTable(root)
    t.write(
        spark.createDataFrame([(1, 10), (2, 20)], "id long, v long"),
        mode="append",
    )

    # deterministic mask-over-append race (same harness as
    # tests/test_occ_rebase.py): the rival's matching row lands mid-mask
    rival = VersionedParquetTable(root)
    orig = t.backend.write_text_exclusive
    fired = {"done": False}

    def hook(path: str, text: str):
        if not fired["done"] and "_commits" in path:
            fired["done"] = True
            rival.write(
                spark.createDataFrame([(1, 111)], "id long, v long")
            )
        return orig(path, text)

    t.backend.write_text_exclusive = hook
    out = t.delete_where(spark, ("id", "=", 1), lazy=True)
    t.backend.write_text_exclusive = orig
    assert out["dirs_masked"] == 2  # base dir + the absorbed rival dir

    ext = sorted(
        (d["id"], d["v"]) for d in read_table(root).to_pylist()
    )
    assert ext == [(2, 20)]  # the absorbed dir's (1,111) masked too

    # patch commit with patch_key_stats: reader reconciles and ignores
    # the extra metadata field
    t2 = VersionedParquetTable(tmp_path / "p")
    t2.merge_upsert(
        spark,
        spark.createDataFrame([(i, 0) for i in range(8)], "id long, v long"),
        ["id"],
        target_bucket_rows=4,
    )
    import pytest as _p

    _p.MonkeyPatch().setattr(
        VersionedParquetTable, "PATCH_MIN_TABLE_ROWS", 1
    )
    try:
        t2.merge_upsert(
            spark,
            spark.createDataFrame([(3, 99)], "id long, v long"),
            ["id"],
            strategy="patch",
        )
    finally:
        VersionedParquetTable.PATCH_MIN_TABLE_ROWS = 1_000_000
    import json as _json

    last = max(
        int(p.name.split(".")[0])
        for p in (tmp_path / "p" / "_commits").glob("*.json")
    )
    commit = _json.loads(
        (tmp_path / "p" / "_commits" / f"{last:010d}.json").read_text()
    )
    assert commit["mode"] == "patch" and "patch_key_stats" in commit
    ext2 = {d["id"]: d["v"] for d in read_table(tmp_path / "p").to_pylist()}
    assert ext2[3] == 99 and len(ext2) == 8
