"""Merge-on-read patch commits: write-side delta commits (upserts +
tombstones) reconciled at read time — the Delta deletion-vector /
Iceberg merge-on-read shape (strategy="patch"/"auto" on merge_upsert /
merge_delete_keys). The reference relies on Delta MERGE semantics
(reference:odbc2deltalake/reader/spark_reader.py:329-350); this suite
pins that the patch path is observationally identical to the rewrite
path: same rows, same CDF, same lifecycle under fold / DML / append /
restore / vacuum / time travel."""

from __future__ import annotations

import uuid

import pytest

from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _table(spark, tmp_path, n=100):
    t = VersionedParquetTable(tmp_path / f"t{uuid.uuid4().hex[:8]}")
    df = spark.createDataFrame(
        [(i, f"v{i}", i % 3) for i in range(n)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, df, ["id"])
    return t


def _rows(spark, t, version=None):
    return {
        r["id"]: (r["val"], r["grp"])
        for r in t.read(spark, version=version).collect()
    }


def test_patch_upsert_and_insert(spark, tmp_path):
    t = _table(spark, tmp_path)
    up = spark.createDataFrame(
        [(i, f"N{i}", 9) for i in [0, 7, 100, 101]],
        "id int, val string, grp int",
    )
    v = t.merge_upsert(spark, up, ["id"], strategy="patch")
    st = t._state_at()
    assert len(st["patches"]) == 1 and st["version"] == v
    got = _rows(spark, t)
    assert len(got) == 102
    assert got[0] == ("N0", 9) and got[7] == ("N7", 9)
    assert got[100] == ("N100", 9) and got[1] == ("v1", 1)


def test_patch_delete_tombstones(spark, tmp_path):
    t = _table(spark, tmp_path)
    dk = spark.createDataFrame([(i,) for i in range(10, 20)], "id int")
    t.merge_delete_keys(spark, dk, ["id"], strategy="patch")
    got = _rows(spark, t)
    assert len(got) == 90 and 10 not in got and 19 not in got
    # absent-key tombstone is a silent no-op, like whenMatchedDelete
    dk2 = spark.createDataFrame([(9999,)], "id int")
    t.merge_delete_keys(spark, dk2, ["id"], strategy="patch")
    assert t.read(spark).count() == 90


def test_patch_chain_latest_commit_wins(spark, tmp_path):
    t = _table(spark, tmp_path)
    for gen in range(3):
        up = spark.createDataFrame(
            [(5, f"gen{gen}", gen)], "id int, val string, grp int"
        )
        t.merge_upsert(spark, up, ["id"], strategy="patch")
    assert _rows(spark, t)[5] == ("gen2", 2)
    # delete then re-upsert across commits: newest commit wins
    dk = spark.createDataFrame([(5,)], "id int")
    t.merge_delete_keys(spark, dk, ["id"], strategy="patch")
    assert 5 not in _rows(spark, t)
    up = spark.createDataFrame([(5, "back", 0)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    assert _rows(spark, t)[5] == ("back", 0)


def test_patch_same_commit_upsert_beats_tombstone(spark, tmp_path):
    # delete_keys + source in ONE commit: a key in both is an upsert
    # (the tombstone is suppressed), matching the rewrite path's
    # delete-then-union-source order
    t = _table(spark, tmp_path)
    up = spark.createDataFrame([(3, "kept", 0)], "id int, val string, grp int")
    dk = spark.createDataFrame([(3,), (4,)], "id int")
    t.merge_upsert(spark, up, ["id"], strategy="patch", delete_keys=dk)
    got = _rows(spark, t)
    assert got[3] == ("kept", 0) and 4 not in got


def test_patch_matches_rewrite_path_exactly(spark, tmp_path):
    ops = [
        ("up", [(i, f"a{i}", 1) for i in range(0, 30, 3)]),
        ("del", [(i,) for i in range(5, 15)]),
        ("up", [(i, f"b{i}", 2) for i in range(10, 40, 7)]),
        ("del", [(2,), (200,)]),
    ]
    tp = _table(spark, tmp_path)
    tr = _table(spark, tmp_path)
    for kind, rows in ops:
        if kind == "up":
            df = spark.createDataFrame(rows, "id int, val string, grp int")
            tp.merge_upsert(spark, df, ["id"], strategy="patch")
            tr.merge_upsert(spark, df, ["id"])
        else:
            dk = spark.createDataFrame(rows, "id int")
            tp.merge_delete_keys(spark, dk, ["id"], strategy="patch")
            tr.merge_delete_keys(spark, dk, ["id"])
    assert _rows(spark, tp) == _rows(spark, tr)
    assert len(tp._state_at()["patches"]) == len(ops)
    assert not tr._state_at()["patches"]


def test_patch_cdf_matches_rewrite_cdf(spark, tmp_path):
    # CDF synthesized from patch commits == CDF from the same ops run
    # through bucket rewrites, row for row
    def changes(t, strategy):
        base = t.version()
        up = spark.createDataFrame(
            [(0, "X", 9), (500, "Y", 9)], "id int, val string, grp int"
        )
        t.merge_upsert(spark, up, ["id"], strategy=strategy)
        dk = spark.createDataFrame([(1,), (7777,)], "id int")
        t.merge_delete_keys(spark, dk, ["id"], strategy=strategy)
        rows = t.read_changes_cdf(spark, from_version=base).collect()
        return sorted(
            (
                r["_commit_version"] - base,
                r["_change_type"],
                r["id"],
                r["val"],
                r["grp"],
            )
            for r in rows
        )

    tp, tr = _table(spark, tmp_path), _table(spark, tmp_path)
    got = changes(tp, "patch")
    assert got == changes(tr, "rewrite")
    # exact classification: update pre+post for id 0, insert for 500,
    # delete for 1; the absent key 7777 emits NOTHING
    kinds = sorted((ct, i) for _, ct, i, _, _ in got)
    assert kinds == [
        ("delete", 1),
        ("insert", 500),
        ("update_postimage", 0),
        ("update_preimage", 0),
    ]


def test_fold_patches_amortizes_chain(spark, tmp_path):
    t = _table(spark, tmp_path)
    up = spark.createDataFrame([(4, "p", 0)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    dk = spark.createDataFrame([(8,)], "id int")
    t.merge_delete_keys(spark, dk, ["id"], strategy="patch")
    before = _rows(spark, t)
    v = t.fold_patches(spark)
    st = t._state_at()
    assert st["version"] == v and not st["patches"]
    assert _rows(spark, t) == before
    assert t.fold_patches(spark) == v  # no-op on an empty chain


def test_rewrite_merge_folds_chain_through(spark, tmp_path):
    # a rewrite merge whose keys DON'T overlap the patch keys must still
    # fold the whole chain (the merge commit clears it in replay)
    t = _table(spark, tmp_path)
    up = spark.createDataFrame([(4, "p", 0)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    other = spark.createDataFrame(
        [(90, "r", 1)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, other, ["id"], strategy="rewrite")
    st = t._state_at()
    assert not st["patches"]
    got = _rows(spark, t)
    assert got[4] == ("p", 0) and got[90] == ("r", 1)


def test_rewrite_delete_folds_chain_through(spark, tmp_path):
    t = _table(spark, tmp_path)
    up = spark.createDataFrame([(4, "p", 0)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    dk = spark.createDataFrame([(90,)], "id int")
    t.merge_delete_keys(spark, dk, ["id"], strategy="rewrite")
    st = t._state_at()
    assert not st["patches"]
    got = _rows(spark, t)
    assert got[4] == ("p", 0) and 90 not in got


def test_dml_folds_chain_first(spark, tmp_path):
    t = _table(spark, tmp_path)
    up = spark.createDataFrame([(4, "p", 77)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    t.delete_where(spark, ("grp", "=", 77))
    st = t._state_at()
    assert not st["patches"]
    assert 4 not in _rows(spark, t)  # DML saw the patched row


def test_auto_strategy_routes_and_bounds(spark, tmp_path, monkeypatch):
    # the min-table-rows gate is sized for production indexes; the
    # fixtures here are tiny, so lower it to exercise the routing
    monkeypatch.setattr(VersionedParquetTable, "PATCH_MIN_TABLE_ROWS", 10)
    t = _table(spark, tmp_path, n=100)
    small = spark.createDataFrame(
        [(0, "auto", 0)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, small, ["id"], strategy="auto")
    assert len(t._state_at()["patches"]) == 1  # small batch → patch
    # a batch over PATCH_MAX_FRACTION of the table → rewrite (fold)
    big = spark.createDataFrame(
        [(i, "big", 1) for i in range(40)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, big, ["id"], strategy="auto")
    assert not t._state_at()["patches"]
    assert _rows(spark, t)[39] == ("big", 1)


def test_auto_strategy_chain_cap(spark, tmp_path, monkeypatch):
    monkeypatch.setattr(VersionedParquetTable, "PATCH_MIN_TABLE_ROWS", 10)
    t = _table(spark, tmp_path, n=2000)
    cap = VersionedParquetTable.PATCH_MAX_CHAIN
    for i in range(cap + 1):
        up = spark.createDataFrame(
            [(i, f"c{i}", 0)], "id int, val string, grp int"
        )
        t.merge_upsert(spark, up, ["id"], strategy="auto")
    st = t._state_at()
    assert not st["patches"]  # commit cap+1 rewrote and folded
    got = _rows(spark, t)
    assert all(got[i] == (f"c{i}", 0) for i in range(cap + 1))


def test_patch_strategy_validation(spark, tmp_path):
    t = _table(spark, tmp_path)
    up = spark.createDataFrame(
        [(0, "x", 0, "extra")], "id int, val string, grp int, other string"
    )
    with pytest.raises(ValueError, match="evolve schema"):
        t.merge_upsert(spark, up, ["id"], strategy="patch")
    ok = spark.createDataFrame([(0, "x", 0)], "id int, val string, grp int")
    with pytest.raises(ValueError, match="bucket keys"):
        t.merge_upsert(spark, ok, ["id", "grp"], strategy="patch")
    with pytest.raises(ValueError, match="unknown merge strategy"):
        t.merge_upsert(spark, ok, ["id"], strategy="bogus")


def test_append_folds_before_write(spark, tmp_path):
    # an append-mode write to a patched table folds first — otherwise
    # the older patch would override the appended rows at read time
    t = _table(spark, tmp_path)
    up = spark.createDataFrame([(3, "p", 0)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    app = spark.createDataFrame(
        [(3, "appended", 5)], "id int, val string, grp int"
    )
    t.write(app, mode="append")
    assert not t._state_at()["patches"]
    vals = sorted(
        r["val"] for r in t.read(spark).filter("id = 3").collect()
    )
    assert vals == ["appended", "p"]  # both visible, append-only semantics


def test_time_travel_and_restore_through_patches(spark, tmp_path):
    t = _table(spark, tmp_path)
    v0 = t.version()
    up = spark.createDataFrame([(0, "p1", 0)], "id int, val string, grp int")
    v1 = t.merge_upsert(spark, up, ["id"], strategy="patch")
    up2 = spark.createDataFrame([(0, "p2", 0)], "id int, val string, grp int")
    v2 = t.merge_upsert(spark, up2, ["id"], strategy="patch")
    assert _rows(spark, t, version=v0)[0] == ("v0", 0)
    assert _rows(spark, t, version=v1)[0] == ("p1", 0)
    assert _rows(spark, t, version=v2)[0] == ("p2", 0)
    t.restore(v1)
    assert _rows(spark, t)[0] == ("p1", 0)
    assert len(t._state_at()["patches"]) == 1  # chain restored with state


def test_vacuum_keeps_live_patch_dirs(spark, tmp_path):
    t = _table(spark, tmp_path)
    up = spark.createDataFrame([(0, "p", 0)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    before = _rows(spark, t)
    # head references the patch dir: vacuum at ANY retention must keep it
    t.vacuum(retain_versions=1, orphan_min_age_seconds=0.0)
    assert _rows(spark, t) == before
    # after a fold, retention=1 reclaims the superseded patch dir
    t.fold_patches(spark)
    removed = t.vacuum(retain_versions=1, orphan_min_age_seconds=0.0)
    st = t._state_at()
    assert not st["patches"] and _rows(spark, t) == before
    assert removed  # the patch dir (and replaced buckets) were reclaimed


def test_checkpoint_carries_patch_chain(spark, tmp_path):
    t = _table(spark, tmp_path)
    up = spark.createDataFrame([(0, "p", 0)], "id int, val string, grp int")
    v = t.merge_upsert(spark, up, ["id"], strategy="patch")
    t.checkpoint(v)
    # replay THROUGH the checkpoint (incremental base) keeps the chain
    st = t._state_at(use_checkpoint=True)
    assert len(st["patches"]) == 1
    assert _rows(spark, t)[0] == ("p", 0)


def test_patch_bucket_pruned_read(spark, tmp_path):
    # read(buckets=...) filters patch rows by the same hash routing as
    # the base dirs — a pruned read over a patched table stays exact
    t = _table(spark, tmp_path)
    up = spark.createDataFrame(
        [(i, "p", 0) for i in range(5)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    st = t._state_at()
    nb = st["num_buckets"]
    whole = t.read(spark)
    pruned = t.read(spark, buckets=list(range(nb)))
    assert sorted(whole.collect()) == sorted(pruned.collect())
    one = t.read(spark, buckets=[0])
    assert one.count() < whole.count()

def test_count_rows_partial_scan_on_patched_table(spark, tmp_path):
    # metadata count stays exact through a patch chain: untouched
    # buckets answer from commit metadata, only patch-touched buckets
    # are count-read (patch-aware)
    t = _table(spark, tmp_path)
    assert t.count_rows(spark) == 100
    up = spark.createDataFrame(
        [(0, "u", 0), (300, "i", 0)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    assert t.count_rows(spark) == 101  # one update + one insert
    dk = spark.createDataFrame([(1,), (2,), (4000,)], "id int")
    t.merge_delete_keys(spark, dk, ["id"], strategy="patch")
    assert t.count_rows(spark) == 99  # two real deletes, one absent key
    t.fold_patches(spark)
    assert t.count_rows(spark) == 99  # metadata-only again

def test_read_changes_fold_over_patch_commits(spark, tmp_path):
    # coarse retraction feed: folding partial(adds) - partial(subs) from
    # patch commits into a sum/count view == recomputing from the final
    # snapshot (the IVM contract MaterializedAggregate relies on)
    import pyspark.sql.functions as F

    t = _table(spark, tmp_path)
    v0 = t.version()
    up = spark.createDataFrame(
        [(0, "u", 7), (500, "i", 7)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    dk = spark.createDataFrame([(1,), (2,)], "id int")
    t.merge_delete_keys(spark, dk, ["id"], strategy="patch")
    adds, subs, cost = t.read_changes_fold(spark, from_version=v0)

    def agg(df, sign):
        return df.groupBy("grp").agg(
            (F.count(F.lit(1)) * sign).alias("n"),
            (F.coalesce(F.sum("id"), F.lit(0)) * sign).alias("s"),
        )

    base = agg(t.read(spark, version=v0), 1)
    folded = (
        base.unionByName(agg(adds, 1))
        .unionByName(agg(subs, -1))
        .groupBy("grp")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .filter(F.col("n") > 0)
    )
    recomputed = agg(t.read(spark), 1)
    got = {r["grp"]: (r["n"], r["s"]) for r in folded.collect()}
    want = {r["grp"]: (r["n"], r["s"]) for r in recomputed.collect()}
    assert got == want
    assert cost["fold_rows"] > 0 and cost["table_rows"] is not None

def test_auto_strategy_small_table_stays_rewrite(spark, tmp_path):
    # below PATCH_MIN_TABLE_ROWS the bucket rewrite is latency-bound and
    # cheaper than patch-write + reconciling reads — auto must not patch
    t = _table(spark, tmp_path, n=100)
    up = spark.createDataFrame([(0, "x", 0)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="auto")
    assert not t._state_at()["patches"]
    assert _rows(spark, t)[0] == ("x", 0)


def _cdf_kinds(spark, t, v0):
    rows = t.read_changes_cdf(spark, from_version=v0).collect()
    return sorted((r["_change_type"], r["id"]) for r in rows)


def test_fold_after_patch_emits_no_duplicate_cdf(spark, tmp_path):
    # ADVICE r8 (high): a patch commit followed by a chain-folding merge
    # emitted every patch change TWICE — once from _patch_cdf and again
    # from the merge commit, whose pre-images read the raw (pre-patch)
    # base dirs. A pure fold_patches is rows-preserving by construction
    # and must contribute ZERO change rows, like OPTIMIZE / masks_folded.
    t = _table(spark, tmp_path)
    v0 = t.version()
    up = spark.createDataFrame(
        [(0, "X", 9), (500, "Y", 9)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    t.fold_patches(spark)
    assert _cdf_kinds(spark, t, v0) == [
        ("insert", 500),
        ("update_postimage", 0),
        ("update_preimage", 0),
    ]


def test_fold_after_patch_tombstone_single_delete(spark, tmp_path):
    t = _table(spark, tmp_path)
    v0 = t.version()
    dk = spark.createDataFrame([(3,)], "id int")
    t.merge_delete_keys(spark, dk, ["id"], strategy="patch")
    t.fold_patches(spark)
    assert _cdf_kinds(spark, t, v0) == [("delete", 3)]


def test_rewrite_merge_over_patch_chain_cdf_exact(spark, tmp_path):
    # non-pure fold: a rewrite merge with its OWN batch lands while a
    # patch chain is outstanding. The merge's pre-images must be the
    # PATCH-RECONCILED prior state, so the patch's changes appear once
    # (at the patch commit) and the merge contributes only its own batch.
    t = _table(spark, tmp_path)
    v0 = t.version()
    up = spark.createDataFrame([(0, "X", 9)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    other = spark.createDataFrame(
        [(1, "R", 8)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, other, ["id"], strategy="rewrite")
    kinds = _cdf_kinds(spark, t, v0)
    assert kinds == [
        ("update_postimage", 0),
        ("update_postimage", 1),
        ("update_preimage", 0),
        ("update_preimage", 1),
    ]
    # and the pre-image VALUE for id 0 at the merge... there is none:
    # id 0's only change pair comes from the patch commit
    rows = t.read_changes_cdf(spark, from_version=v0).collect()
    pre0 = [r for r in rows if r["id"] == 0 and r["_change_type"] == "update_preimage"]
    assert len(pre0) == 1 and pre0[0]["val"] == "v0"


def test_rewrite_merge_overlapping_patch_key_cdf(spark, tmp_path):
    # the merge's own batch REWRITES a key the patch already changed:
    # patch emits v0->X at the patch commit, merge emits X->Z (pre-image
    # is the patch-applied value X, not the base value v0)
    t = _table(spark, tmp_path)
    v0 = t.version()
    up = spark.createDataFrame([(0, "X", 9)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    vp = t.version()
    z = spark.createDataFrame([(0, "Z", 7)], "id int, val string, grp int")
    t.merge_upsert(spark, z, ["id"], strategy="rewrite")
    rows = t.read_changes_cdf(spark, from_version=v0).collect()
    by_commit = sorted(
        (r["_commit_version"], r["_change_type"], r["val"]) for r in rows
    )
    assert by_commit == [
        (vp, "update_postimage", "X"),
        (vp, "update_preimage", "v0"),
        (vp + 1, "update_postimage", "Z"),
        (vp + 1, "update_preimage", "X"),
    ]


def test_read_changes_fold_after_patch_fold_exact(spark, tmp_path):
    # the advisor's repro: patch upsert + fold_patches made
    # read_changes_fold double-apply the patch delta (sum drifted)
    import pyspark.sql.functions as F

    t = _table(spark, tmp_path)
    v0 = t.version()
    up = spark.createDataFrame(
        [(0, "u", 7), (500, "i", 7)], "id int, val string, grp int"
    )
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    dk = spark.createDataFrame([(1,), (2,)], "id int")
    t.merge_delete_keys(spark, dk, ["id"], strategy="patch")
    t.fold_patches(spark)

    adds, subs, _cost = t.read_changes_fold(spark, from_version=v0)

    def agg(df, sign):
        return df.groupBy("grp").agg(
            (F.count(F.lit(1)) * sign).alias("n"),
            (F.coalesce(F.sum("id"), F.lit(0)) * sign).alias("s"),
        )

    base = agg(t.read(spark, version=v0), 1)
    folded = (
        base.unionByName(agg(adds, 1))
        .unionByName(agg(subs, -1))
        .groupBy("grp")
        .agg(F.sum("n").alias("n"), F.sum("s").alias("s"))
        .filter(F.col("n") > 0)
    )
    got = {r["grp"]: (r["n"], r["s"]) for r in folded.collect()}
    want = {
        r["grp"]: (r["n"], r["s"])
        for r in agg(t.read(spark), 1).collect()
    }
    assert got == want


def test_append_only_tailer_survives_pure_fold(spark, tmp_path):
    # read_changes (the append-only feed) must skip a pure fold commit
    # like compacted_from/masks_folded instead of raising re-baseline
    t = _table(spark, tmp_path)
    up = spark.createDataFrame([(0, "X", 9)], "id int, val string, grp int")
    t.merge_upsert(spark, up, ["id"], strategy="patch")
    v_before = t.version()
    t.fold_patches(spark)
    out = t.read_changes(spark, from_version=v_before)
    assert out.count() == 0
