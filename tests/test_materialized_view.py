"""MaterializedAggregate (streaming/materialized.py): incrementally-
maintained rollup over a versioned source. The invariant throughout:
after ANY sequence of refreshes, `read` equals `recompute` (the view's
defining query run from scratch); plus the exactly-once contract — a
replayed delivery (crash between view commit and cursor write) must not
double-count, and a source rewrite re-baselines instead of corrupting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.queries.registry import load_table
from odbc2deltalake_spark.streaming import MaterializedAggregate
from odbc2deltalake_spark.tablestore import VersionedParquetTable

SF_DIR = "/root/testdata/sf0.001"


def _rows(df):
    out = []
    for r in df.collect():
        vals = []
        for v in r:
            vals.append(round(v, 6) if isinstance(v, float) else v)
        out.append(tuple(vals))
    return sorted(out)


@pytest.fixture()
def source(spark, tmp_path):
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = VersionedParquetTable(tmp_path / "events_landing")
    for m in range(3):
        t.write(ev.filter(F.col("event_id") % 3 == m), mode="append")
    return ev, t


def _mv(t, tmp_path):
    return MaterializedAggregate(
        t,
        tmp_path / "mv_type_rollup",
        group_cols=["event_type"],
        aggs={
            "n_events": ("count", None),
            "total_value": ("sum", "value"),
            "avg_value": ("avg", "value"),
            "min_value": ("min", "value"),
            "max_value": ("max", "value"),
        },
    )


def test_incremental_equals_recompute(spark, source, tmp_path):
    ev, t = source
    mv = _mv(t, tmp_path)
    assert mv.refresh(spark) == (-1, 2)  # first delivery: all 3 commits
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))

    # two more commits folded in one refresh
    t.write(ev.limit(100).select(
        (F.col("event_id") + 1_000_000).alias("event_id"),
        "user_id", "event_type", "value",
    ), mode="append")
    t.write(ev.limit(50).select(
        (F.col("event_id") + 2_000_000).alias("event_id"),
        "user_id", "event_type", "value",
    ), mode="append")
    assert mv.refresh(spark) == (2, 4)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    # caught up: no-op
    assert mv.refresh(spark) is None


def test_replayed_delivery_is_idempotent(spark, source, tmp_path):
    _ev, t = source
    mv = _mv(t, tmp_path)
    mv.refresh(spark)
    before = _rows(mv.read(spark))

    # simulate the crash window: the view committed (marker = 2) but the
    # tailer checkpoint write was lost — rewind the cursor and redeliver
    t.backend.write_text_atomic(mv.tailer._ckpt, '{"version": -1}')
    assert mv.tailer.last_processed() == -1
    assert mv.refresh(spark) == (-1, 2)  # redelivers, but _apply skips
    assert _rows(mv.read(spark)) == before
    assert mv.applied_to() == 2


def test_source_rewrite_rebaselines(spark, source, tmp_path):
    ev, t = source
    mv = _mv(t, tmp_path)
    mv.refresh(spark)

    # an overwrite is not delta-expressible: refresh must fall back to a
    # full recompute at the rewritten snapshot, not corrupt the counters
    t.write(ev.filter(F.col("event_type") != "click"), mode="overwrite")
    got = mv.refresh(spark)
    assert got == (2, 3)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    assert "click" not in {r["event_type"] for r in mv.read(spark).collect()}
    # and the cursor moved past the rewrite
    assert mv.refresh(spark) is None


def test_two_views_tail_one_source(spark, source, tmp_path):
    _ev, t = source
    mv1 = _mv(t, tmp_path)
    mv2 = MaterializedAggregate(
        t,
        tmp_path / "mv_user_count",
        group_cols=["user_id"],
        aggs={"n": ("count", None)},
    )
    mv1.refresh(spark)
    mv2.refresh(spark)  # distinct cursor: must still see every commit
    assert _rows(mv2.read(spark)) == _rows(mv2.recompute(spark))
    assert _rows(mv1.read(spark)) == _rows(mv1.recompute(spark))


def test_skip_to_refuses_rewind(spark, source, tmp_path):
    _ev, t = source
    mv = _mv(t, tmp_path)
    mv.refresh(spark)
    with pytest.raises(ValueError, match="rewind"):
        mv.tailer.skip_to(0)


def test_bad_agg_spec_rejected(spark, source, tmp_path):
    _ev, t = source
    with pytest.raises(ValueError, match="unsupported aggregate"):
        MaterializedAggregate(t, tmp_path / "x", ["event_type"],
                              {"o": ("median", "value")})
    with pytest.raises(ValueError, match="needs a source column"):
        MaterializedAggregate(t, tmp_path / "y", ["event_type"],
                              {"o": ("sum", None)})


def _mv_merge(t, tmp_path):
    return MaterializedAggregate(
        t,
        tmp_path / "mv_user_merge",
        group_cols=["user_id"],
        aggs={
            "n": ("count", None),
            "total": ("sum", "value"),
            "avg_v": ("avg", "value"),
            "mx": ("max", "value"),
        },
        strategy="merge",
    )


def test_merge_strategy_incremental_equals_recompute(spark, source, tmp_path):
    ev, t = source
    mv = _mv_merge(t, tmp_path)
    assert mv.refresh(spark) == (-1, 2)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))

    # incremental commits fold through partial MERGEs (touched buckets)
    t.write(ev.limit(200).select(
        (F.col("event_id") + 1_000_000).alias("event_id"),
        "user_id", "event_type", "value",
    ), mode="append")
    assert mv.refresh(spark) == (2, 3)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    # the view table really is bucketized (merge path, not overwrites)
    assert mv.view._state_at()["num_buckets"] is not None


def test_merge_strategy_marker_is_atomic_with_merge_commit(
    spark, source, tmp_path
):
    _ev, t = source
    mv = _mv_merge(t, tmp_path)
    mv.refresh(spark)
    v = mv.view.version()
    # the marker is visible AT the merge commit's version — no follow-up
    # property commit exists (atomicity is what closes the crash window)
    assert mv.view.get_property(MaterializedAggregate.APPLIED_PROP) == "2"
    assert int(mv.view._state_at(v)["props"]["mv.applied_to"]) == 2


def test_merge_strategy_replay_is_idempotent(spark, source, tmp_path):
    _ev, t = source
    mv = _mv_merge(t, tmp_path)
    mv.refresh(spark)
    before = _rows(mv.read(spark))
    t.backend.write_text_atomic(mv.tailer._ckpt, '{"version": -1}')
    assert mv.refresh(spark) == (-1, 2)
    assert _rows(mv.read(spark)) == before


def test_empty_commit_is_a_safe_noop(spark, source, tmp_path):
    """A commit that lands zero rows (e.g. an upstream no-op load) must
    fold cleanly through BOTH strategies: marker advances, counters
    unchanged."""
    ev, t = source
    for mv in (_mv(t, tmp_path), _mv_merge(t, tmp_path)):
        mv.refresh(spark)
        before = _rows(mv.read(spark))
        t.write(ev.limit(0), mode="append")
        assert mv.refresh(spark) is not None
        assert _rows(mv.read(spark)) == before
        assert mv.applied_to() == t.version()


def test_partial_replay_folds_only_the_unapplied_tail(spark, source, tmp_path):
    """Crash after the view commit, before the cursor write, WITH new
    commits landing before the next refresh: the redelivered batch spans
    applied and unapplied commits — only the unapplied tail may fold."""
    ev, t = source
    for mk in (_mv, _mv_merge):
        mv = mk(t, tmp_path)
        mv.refresh(spark)  # folds (-1, 2], marker = 2
        saved_cursor = mv.tailer.last_processed()
        # crash: cursor lost (rewound to -1), then commit 3 lands
        t.backend.write_text_atomic(mv.tailer._ckpt, '{"version": -1}')
        t.write(ev.limit(100).select(
            (F.col("event_id") + 9_000_000).alias("event_id"),
            "user_id", "event_type", "value",
        ), mode="append")
        assert mv.refresh(spark) == (-1, t.version())
        # commits 0-2 must NOT have double-folded; commit 3 folded once
        assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
        assert saved_cursor < mv.tailer.last_processed()


def test_distinct_cursors_for_same_basename_roots(spark, source, tmp_path):
    _ev, t = source
    a = MaterializedAggregate(t, tmp_path / "a" / "view", ["event_type"],
                              {"n": ("count", None)})
    b = MaterializedAggregate(t, tmp_path / "b" / "view", ["event_type"],
                              {"n": ("count", None)})
    assert a.tailer._ckpt != b.tailer._ckpt
    a.refresh(spark)
    assert b.refresh(spark) is not None  # b still sees every commit
    assert _rows(b.read(spark)) == _rows(b.recompute(spark))


def test_fold_errors_are_not_mistaken_for_rewrites(spark, source, tmp_path):
    """A ValueError raised by the fold itself must propagate, not be
    answered with a silent full recompute."""
    _ev, t = source
    mv = _mv(t, tmp_path)
    mv.refresh(spark)
    t.write(_ev.limit(10), mode="append")
    # corrupt the marker so applied_to()'s int() raises ValueError
    mv.view.set_properties({MaterializedAggregate.APPLIED_PROP: "bogus"})
    with pytest.raises(ValueError):
        mv.refresh(spark)


def test_mv_recovers_from_vacuum_truncated_feed(spark, tmp_path):
    """A MaterializedAggregate whose cursor lagged past the vacuum
    retention window must re-baseline by recompute (same path as a
    source rewrite), ending with read == recompute — never an executor
    FileNotFound, never double-folded state."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = VersionedParquetTable(tmp_path / "events_landing")
    t.write(ev.filter(F.col("event_id") % 3 == 0), mode="append")   # v0
    mv = MaterializedAggregate(
        t, tmp_path / "view", ["event_type"],
        {"n": ("count", None), "total": ("sum", "value")},
    )
    assert mv.refresh(spark) == (-1, 0)
    t.write(ev.filter(F.col("event_id") % 3 == 1), mode="append")   # v1
    t.write(ev.filter(F.col("event_id") % 3 == 2), mode="append")   # v2
    t.compact(spark)                                                # v3
    assert t.vacuum(retain_versions=1)
    t.write(ev.limit(0), mode="append")                             # v4
    rng = mv.refresh(spark)   # truncated feed -> recompute fallback
    assert rng == (0, t.version())
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    assert mv.refresh(spark) is None  # caught up


def test_mv_refuses_markerless_existing_view(spark, tmp_path):
    """ADVICE r5: a view that exists WITHOUT the mv.applied_to marker
    (out-of-band creation / cleared property) must raise, not silently
    overwrite previously folded counters."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    t = VersionedParquetTable(tmp_path / "landing")
    t.write(ev, mode="append")
    mv = MaterializedAggregate(
        t, tmp_path / "view", ["event_type"], {"n": ("count", None)},
    )
    # out-of-band view: state-shaped table at the view root, no marker
    VersionedParquetTable(tmp_path / "view").write(
        ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("__c_n")),
        mode="overwrite",
    )
    with pytest.raises(RuntimeError, match="mv.applied_to"):
        mv.refresh(spark)


def test_mv_chunked_refresh_equals_recompute(spark, tmp_path):
    """refresh(max_commits=2) over a 7-commit backlog: multiple folded
    chunks, each with its own marker, ending with read == recompute; a
    rewrite in a LATER chunk still re-baselines (earlier chunks' folds
    must not be mistaken for corruption)."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "event_type", "value"
    )
    t = VersionedParquetTable(tmp_path / "landing")
    for m in range(7):
        t.write(ev.filter(F.col("event_id") % 7 == m), mode="append")
    mv = MaterializedAggregate(
        t, tmp_path / "view", ["event_type"],
        {"n": ("count", None), "total": ("sum", "value")},
    )
    assert mv.refresh(spark, max_commits=2) == (-1, 6)
    assert mv.applied_to() == 6
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    # backlog: two clean appends then a rewrite, capped chunks
    t.write(ev.limit(50), mode="append")                       # v7
    t.write(ev.limit(30), mode="append")                       # v8
    t.write(ev.limit(10), mode="overwrite")                    # v9 rewrite
    rng = mv.refresh(spark, max_commits=2)
    assert rng == (6, t.version())
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    assert mv.refresh(spark, max_commits=2) is None


# ------------------- r8: DML folds through the CDF, no recompute ----------


def _retractable_mv(t, tmp_path):
    return MaterializedAggregate(
        t,
        tmp_path / "mv_retractable",
        group_cols=["event_type"],
        aggs={
            "n_events": ("count", None),
            "total_value": ("sum", "value"),
            "avg_value": ("avg", "value"),
        },
    )


def _no_snapshot(t):
    """Fail the test if anyone re-baselines via a full source read."""
    orig = t.read

    def guarded(spark_, version=None, buckets=None, skip_where=None):
        raise AssertionError("full source re-baseline — CDF fold expected")

    t.read = guarded
    return orig


def test_source_dml_folds_without_recompute(spark, source, tmp_path):
    """delete_where / update_where on the source maintain a
    count/sum/avg view through CDF retraction — the source is never
    re-scanned."""
    ev, t = source
    mv = _retractable_mv(t, tmp_path)
    mv.refresh(spark)
    expected_before = _rows(mv.read(spark))

    t.update_where(spark, {"value": "value * 2"}, ("event_id", "<=", 40))
    t.delete_where(spark, ("event_type", "=", "error"))
    orig = _no_snapshot(t)
    try:
        rng = mv.refresh(spark)
    finally:
        t.read = orig
    assert rng is not None
    got = _rows(mv.read(spark))
    assert got == _rows(mv.recompute(spark))
    assert got != expected_before  # the DML really changed the rollup
    # the emptied group is GONE, exactly like a recompute
    assert not any(r[0] == "error" for r in got)
    # and the next refresh is a clean no-op
    assert mv.refresh(spark) is None


def test_minmax_view_rebaselines_on_dml(spark, source, tmp_path):
    """min/max cannot retract: DML must fall back to the snapshot
    recompute (and still be exact)."""
    ev, t = source
    mv = _mv(t, tmp_path)
    mv.refresh(spark)
    t.delete_where(spark, ("event_type", "=", "error"))
    reads = {"n": 0}
    orig = t.read

    def counting(spark_, version=None, buckets=None, skip_where=None):
        reads["n"] += 1
        return orig(spark_, version=version, buckets=buckets,
                    skip_where=skip_where)

    t.read = counting
    try:
        mv.refresh(spark)
    finally:
        t.read = orig
    assert reads["n"] >= 1  # snapshot path taken
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))


def test_sum_only_view_rebaselines_on_dml(spark, source, tmp_path):
    """Without a count aggregate, an emptied group is indistinguishable
    from sum==0 — the fold refuses and the recompute stays exact."""
    ev, t = source
    mv = MaterializedAggregate(
        t,
        tmp_path / "mv_sum_only",
        group_cols=["event_type"],
        aggs={"total_value": ("sum", "value")},
    )
    mv.refresh(spark)
    t.delete_where(spark, ("event_type", "=", "error"))
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    assert not any(r[0] == "error" for r in _rows(mv.read(spark)))


def test_cdf_fold_after_column_set_exprs_falls_back(spark, source, tmp_path):
    """An UPDATE whose SET was a Column object is not CDF-representable:
    the fold declines and the recompute keeps the invariant."""
    ev, t = source
    mv = _retractable_mv(t, tmp_path)
    mv.refresh(spark)
    t.update_where(
        spark, {"value": F.col("value") + 1}, ("event_id", "<=", 10)
    )
    mv.refresh(spark)
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))


def test_merge_source_folds_without_recompute(spark, tmp_path):
    """The CDC hot path maintains its tables via merge_upsert; a
    retractable view over such a source folds each merge through the
    coarse retraction feed (replaced buckets subtract, replacements
    add) — never a full source re-scan. The cost guard is pinned open
    because this small fixture's batch hashes into most of its 8
    buckets; the guard's own behavior has a dedicated test below."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = VersionedParquetTable(tmp_path / "cdc_index")
    t.merge_upsert(spark, ev, key_cols=["event_id"], num_buckets=8)
    mv = _retractable_mv(t, tmp_path)
    mv.FOLD_COST_FACTOR = 100.0
    mv.refresh(spark)  # initial baseline (overwrite commit)
    before = _rows(mv.read(spark))

    # CDC batch: updated values for some existing keys + brand-new keys
    batch = ev.filter(F.col("event_id") % 7 == 0).withColumn(
        "value", F.col("value") * 3
    ).unionByName(
        ev.limit(0)
        .unionByName(
            spark.createDataFrame(
                [(10_000_001, 1, "merge_new", 5.0),
                 (10_000_002, 2, "merge_new", 7.0)],
                "event_id long, user_id long, event_type string, value double",
            ),
            allowMissingColumns=True,
        )
    )
    t.merge_upsert(spark, batch, key_cols=["event_id"])
    orig = _no_snapshot(t)
    try:
        rng = mv.refresh(spark)
    finally:
        t.read = orig
    assert rng is not None
    got = _rows(mv.read(spark))
    assert got == _rows(mv.recompute(spark))
    assert got != before
    assert any(r[0] == "merge_new" for r in got)
    assert mv.refresh(spark) is None


def test_fold_cost_guard_prefers_recompute(spark, tmp_path):
    """A merge batch whose keys hash into every bucket makes the fold
    scan ~2x the table; the metadata cost estimate must route the
    refresh to one recompute scan instead (still exact)."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = VersionedParquetTable(tmp_path / "cdc_index")
    t.merge_upsert(spark, ev, key_cols=["event_id"], num_buckets=4)
    mv = _retractable_mv(t, tmp_path)
    mv.refresh(spark)
    t.merge_upsert(
        spark,
        ev.withColumn("value", F.col("value") * 2),  # every key, every bucket
        key_cols=["event_id"],
    )
    calls = {"fold_feed": 0, "snapshot": 0}
    orig_fold, orig_read = t.read_changes_fold, t.read

    def counting_fold(*a, **k):
        calls["fold_feed"] += 1
        return orig_fold(*a, **k)

    def counting_read(*a, **k):
        calls["snapshot"] += 1
        return orig_read(*a, **k)

    t.read_changes_fold, t.read = counting_fold, counting_read
    try:
        assert mv.refresh(spark) is not None
    finally:
        t.read_changes_fold, t.read = orig_fold, orig_read
    # the feed was consulted (metadata only), but the data path was the
    # single snapshot scan
    assert calls["fold_feed"] == 1 and calls["snapshot"] >= 1
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))


def test_patched_source_folds_exactly(spark, tmp_path):
    """ADVICE r8 end-to-end regression: a merge-on-read PATCH commit on
    the source followed by a chain-folding merge (fold_patches or a
    rewrite merge) double-applied the patch delta through the retraction
    feed, silently corrupting incremental views. The view must stay
    equal to recompute across patch -> fold, refreshing incrementally."""
    ev = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    t = VersionedParquetTable(tmp_path / "cdc_index")
    t.merge_upsert(spark, ev, key_cols=["event_id"], num_buckets=8)
    mv = _retractable_mv(t, tmp_path)
    mv.FOLD_COST_FACTOR = 100.0
    mv.refresh(spark)

    # allow the feed's bucket-pruned pre-image reads (delta-sized by
    # design) but fail on a FULL snapshot read = re-baseline
    orig = t.read

    def no_full_read(spark_, version=None, buckets=None, skip_where=None):
        assert buckets is not None, "full source re-baseline — fold expected"
        return orig(spark_, version=version, buckets=buckets,
                    skip_where=skip_where)

    batch = ev.filter(F.col("event_id") % 11 == 0).withColumn(
        "value", F.col("value") * 5
    )
    t.merge_upsert(spark, batch, key_cols=["event_id"], strategy="patch")
    t.read = no_full_read
    try:
        mv.refresh(spark)
    finally:
        t.read = orig
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
    t.fold_patches(spark)  # pure fold: zero change rows for the feed
    t.read = no_full_read
    try:
        mv.refresh(spark)
    finally:
        t.read = orig
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))

    # patch then NON-pure rewrite merge (own batch, chain outstanding)
    batch2 = ev.filter(F.col("event_id") % 13 == 0).withColumn(
        "value", F.col("value") + 1
    )
    t.merge_upsert(spark, batch2, key_cols=["event_id"], strategy="patch")
    batch3 = ev.filter(F.col("event_id") % 17 == 0).withColumn(
        "value", F.col("value") - 2
    )
    t.merge_upsert(spark, batch3, key_cols=["event_id"], strategy="rewrite")
    t.read = no_full_read
    try:
        mv.refresh(spark)
    finally:
        t.read = orig
    assert _rows(mv.read(spark)) == _rows(mv.recompute(spark))
