"""Commit-log data skipping: write(stats_cols=...) records per-file
[min, max]; read(skip_where=...) must prune provably-unmatching files
from the scan while returning exactly the rows an unpruned filter
yields."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _mk(spark, lo, hi, parts=2):
    return (
        spark.range(lo, hi)
        .repartitionByRange(parts, "id")
        .select(
            F.col("id").alias("k"),
            (F.col("id") * 2).alias("v"),
            F.concat(F.lit("s"), F.format_string("%05d", F.col("id"))).alias(
                "name"
            ),
            F.timestamp_micros(F.col("id") * 1_000_000).alias("ts"),
        )
    )


def test_skip_prunes_files_and_matches_full_filter(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    # three loads with disjoint key slices — the SCD2 load pattern
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        t.write(_mk(spark, lo, hi), mode="append", stats_cols=["k", "ts"])

    full = t.read(spark)
    all_files = set(full.inputFiles())
    assert len(all_files) >= 6  # ~2 files per load

    pruned = t.read(spark, skip_where=("k", ">", 199))
    pruned_files = set(pruned.inputFiles())
    assert pruned_files and pruned_files < all_files
    # only the third load's files survive
    assert len(pruned_files) <= len(all_files) // 3 + 1

    expect = {tuple(r) for r in full.filter(F.col("k") > 199).collect()}
    assert {tuple(r) for r in pruned.collect()} == expect


def test_skip_ops_and_types(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    for lo, hi in ((0, 100), (100, 200)):
        t.write(_mk(spark, lo, hi), mode="append", stats_cols=["k", "name", "ts"])
    full = t.read(spark)

    for skip, pyfilter in [
        (("k", "<", 50), lambda r: r[0] < 50),
        (("k", ">=", 150), lambda r: r[0] >= 150),
        (("k", "<=", 99), lambda r: r[0] <= 99),
        (("name", "=", "s00150"), lambda r: r[2] == "s00150"),
        (
            ("ts", ">", datetime.datetime(1970, 1, 1, 0, 2, 30)),
            lambda r: r[3] > datetime.datetime(1970, 1, 1, 0, 2, 30),
        ),
    ]:
        got = {tuple(r) for r in t.read(spark, skip_where=skip).collect()}
        expect = {tuple(r) for r in full.collect() if pyfilter(r)}
        assert got == expect, skip
    # the equality probe reads a strict file subset
    eq = t.read(spark, skip_where=("name", "=", "s00150"))
    assert set(eq.inputFiles()) < set(full.inputFiles())


def test_statless_commits_never_skipped(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_mk(spark, 0, 100), mode="append")  # no stats recorded
    t.write(_mk(spark, 100, 200), mode="append", stats_cols=["k"])
    got = {
        r["k"] for r in t.read(spark, skip_where=("k", "<", 10)).collect()
    }
    assert got == set(range(10))
    # and a skip that excludes the stats'd commit still scans the
    # stat-less one (conservative superset)
    none_from_second = t.read(spark, skip_where=("k", ">", 500))
    assert none_from_second.count() == 0


def test_stats_survive_restore_and_time_travel(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_mk(spark, 0, 100), mode="append", stats_cols=["k"])
    t.write(_mk(spark, 100, 200), mode="append", stats_cols=["k"])
    v1 = t.version()
    t.write(_mk(spark, 200, 300), mode="append", stats_cols=["k"])
    t.restore(v1)
    pruned = t.read(spark, skip_where=("k", ">=", 100))
    assert {r["k"] for r in pruned.collect()} == set(range(100, 200))
    assert len(set(pruned.inputFiles())) < len(
        set(t.read(spark).inputFiles())
    )
    # time travel with skipping
    old = t.read(spark, version=v1, skip_where=("k", "<", 50))
    assert {r["k"] for r in old.collect()} == set(range(50))


def test_per_file_stats_prune_within_one_commit(spark, tmp_path):
    """per_file_stats=True records file-granular intervals: a range-laid
    single commit (the Z-order/compact shape) prunes files INSIDE the
    dir, where dir-level stats could not."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        _mk(spark, 0, 400, parts=4),
        mode="append",
        stats_cols=["k"],
        per_file_stats=True,
    )
    full = t.read(spark)
    all_files = set(full.inputFiles())
    assert len(all_files) == 4
    narrow = t.read(spark, skip_where=("k", "=", 250))
    assert len(set(narrow.inputFiles())) == 1
    assert [r["k"] for r in narrow.collect()] == [250]


def test_dir_level_stats_cost_free_and_prune_dirs(spark, tmp_path):
    """Default (Observation) stats: commit carries one interval under the
    '' key and whole-dir skipping works."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_mk(spark, 0, 100), mode="append", stats_cols=["k"])
    c = t._read_commit(0)
    assert set(c["stats"].keys()) == {""}
    assert c["stats"][""]["k"] == [0, 99]
    t.write(_mk(spark, 100, 200), mode="append", stats_cols=["k"])
    pruned = t.read(spark, skip_where=("k", ">=", 150))
    assert {r["k"] for r in pruned.collect()} == set(range(150, 200))
    assert len(set(pruned.inputFiles())) < len(set(t.read(spark).inputFiles()))


def test_known_stats_recorded_without_any_job(spark, tmp_path):
    """known_stats stores caller-supplied intervals verbatim — the
    zero-cost path the SCD2 engine uses for the per-load-constant
    __timestamp."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(
        _mk(spark, 0, 100),
        mode="append",
        known_stats={"k": (0, 99)},
    )
    t.write(
        _mk(spark, 100, 200),
        mode="append",
        known_stats={"k": (100, 199)},
    )
    assert t._read_commit(0)["stats"][""]["k"] == [0, 99]
    pruned = t.read(spark, skip_where=("k", "=", 150))
    assert {r["k"] for r in pruned.collect()} == {150}
    assert len(set(pruned.inputFiles())) < len(set(t.read(spark).inputFiles()))


def test_engine_history_commits_carry_timestamp_stats(spark, tmp_path):
    """Every SCD2 history commit records its load __timestamp interval,
    so latest-load / watermark reads skip older loads at the commit log."""
    from tests.cdc_utils import make_source, run_load

    src = make_source(spark)
    run_load(spark, src, tmp_path / "dest")
    hist = VersionedParquetTable(tmp_path / "dest" / "delta")
    found = False
    for v in range(hist.version() + 1):
        c = hist._read_commit(v)
        if c.get("dir"):
            assert "__timestamp" in (c.get("stats") or {}).get("", {}), c["version"]
            found = True
    assert found


def test_external_reader_honors_stats(spark, tmp_path):
    """The standalone pyarrow reader implements the same skipping rules
    from the spec alone — third-party readers get the pruning too."""
    from tools.external_reader import read_table

    t = VersionedParquetTable(tmp_path / "t")
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        t.write(_mk(spark, lo, hi), mode="append", known_stats={"k": (lo, hi - 1)})
    tbl = read_table(tmp_path / "t", skip_where=("k", ">=", 200))
    assert sorted(tbl.column("k").to_pylist()) == list(range(200, 300))
    # per-file variant
    t2 = VersionedParquetTable(tmp_path / "t2")
    t2.write(
        _mk(spark, 0, 400, parts=4), mode="append",
        stats_cols=["k"], per_file_stats=True,
    )
    tbl2 = read_table(tmp_path / "t2", skip_where=("k", "=", 42))
    assert tbl2.column("k").to_pylist() == [42]
    # engine agreement on the pruned read
    got = {
        tuple(r)
        for r in t.read(spark, skip_where=("k", ">=", 200))
        .select("k", "v", "name")
        .collect()
    }
    ext = {
        (a, b, c)
        for a, b, c in zip(
            tbl.column("k").to_pylist(),
            tbl.column("v").to_pylist(),
            tbl.column("name").to_pylist(),
        )
    }
    assert got == ext


def test_conservative_wide_intervals_stay_exact(spark, tmp_path):
    """Spec property: recorded intervals may be WIDER than the data
    (known_stats from an upper bound) — results must still equal the
    unpruned filter, just with less pruning."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_mk(spark, 0, 100), mode="append", known_stats={"k": (-1000, 5000)})
    t.write(_mk(spark, 100, 200), mode="append", known_stats={"k": (50, 250)})
    for skip in (("k", ">", 150), ("k", "<", 20), ("k", "=", 120)):
        full = t.read(spark)
        got = {tuple(r) for r in t.read(spark, skip_where=skip).collect()}
        col, op, v = skip
        pyop = {">": lambda a: a > v, "<": lambda a: a < v, "=": lambda a: a == v}[op]
        expect = {tuple(r) for r in full.collect() if pyop(r["k"])}
        assert got == expect, skip


def test_zorder_compact_records_tight_per_file_stats(spark, tmp_path):
    """OPTIMIZE-ZORDER synergy: compacting with zorder_by records
    per-file intervals on the cluster key, so a point read inside the
    single compacted commit opens a strict subset of its files."""
    t = VersionedParquetTable(tmp_path / "t")
    for lo, hi in ((0, 150), (150, 300), (300, 450)):
        t.write(_mk(spark, lo, hi), mode="append")
    t.compact(spark, zorder_by=["k"], out_partitions=6)
    full = t.read(spark)
    all_files = set(full.inputFiles())
    assert len(all_files) >= 4
    probe = t.read(spark, skip_where=("k", "=", 222))
    assert len(set(probe.inputFiles())) < len(all_files)
    assert [r["k"] for r in probe.collect()] == [222]
    # range read stays exact
    rng = t.read(spark, skip_where=("k", ">=", 400))
    assert {r["k"] for r in rng.collect()} == set(range(400, 450))


def test_in_and_ne_ops_prune_and_stay_exact(spark, tmp_path):
    """`in` (keyed lookup — the GDPR id-set shape) and `!=` skip probes:
    pruning composes with per-load interval stats and results equal the
    unpruned filter."""
    t = VersionedParquetTable(tmp_path / "t")
    for lo, hi in ((0, 100), (100, 200), (200, 300)):
        t.write(_mk(spark, lo, hi), mode="append", stats_cols=["k", "name"])
    full = t.read(spark)
    all_files = set(full.inputFiles())

    # an id-set entirely inside one load prunes to that load's files
    probe = t.read(spark, skip_where=("k", "in", [210, 250, 299]))
    assert set(probe.inputFiles()) < all_files
    assert sorted(r["k"] for r in probe.collect()) == [210, 250, 299]
    # ids spanning two loads keep both, still exact
    span = t.read(spark, skip_where=("k", "in", [5, 205]))
    assert sorted(r["k"] for r in span.collect()) == [5, 205]
    # NULLs in the list and an empty list match nothing (SQL IN)
    assert t.read(spark, skip_where=("k", "in", [None])).count() == 0
    assert t.read(spark, skip_where=("k", "in", [])).count() == 0
    # string-typed in-list rides the same stats
    nm = t.read(spark, skip_where=("name", "in", ["s00007", "s00123"]))
    assert sorted(r["k"] for r in nm.collect()) == [7, 123]

    # != : never prunes a multi-value file, result exact
    ne = t.read(spark, skip_where=("k", "!=", 150))
    assert ne.count() == 299
    assert 150 not in {r["k"] for r in ne.collect()}
    # != on a single-value commit is refutable at the dir level
    t2 = VersionedParquetTable(tmp_path / "t2")
    t2.write(
        spark.range(10).select(F.lit(7).alias("k")),
        mode="append",
        stats_cols=["k"],
    )
    gone = t2.read(spark, skip_where=("k", "!=", 7))
    assert gone.count() == 0 and set(gone.inputFiles()) == set()


def test_keyed_dml_with_in_predicate(spark, tmp_path):
    """DML predicates share the op surface: delete_where / update_where
    with an `in` id-list — eager and lazy — match SQL row-for-row (the
    'erase these user ids' workload)."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_mk(spark, 0, 200), mode="append", stats_cols=["k"])
    t.delete_where(spark, ("k", "in", [3, 77, 150]))
    assert t.read(spark).count() == 197
    assert t.read(spark).filter(F.col("k").isin([3, 77, 150])).count() == 0

    # lazy mask with an id-list: metadata-only commit, read-time filter
    t.delete_where(spark, ("k", "in", [10, 11]), lazy=True)
    assert t.read(spark).count() == 195
    # CDF sees the two lazy-deleted rows ((from, to] window)
    ch = t.read_changes_cdf(spark, t.version() - 1, t.version())
    assert (
        ch.filter(F.col("_change_type") == "delete").count() == 2
    )
    # lazy update via in-list, then fold — values land physically
    t.update_where(spark, {"v": "v + 1000"}, ("k", "in", [20, 21]), lazy=True)
    got = {
        r["k"]: r["v"]
        for r in t.read(spark).filter(F.col("k").isin([20, 21])).collect()
    }
    assert got == {20: 1040, 21: 1042}
    t.fold_masks(spark)
    got2 = {
        r["k"]: r["v"]
        for r in t.read(spark).filter(F.col("k").isin([20, 21])).collect()
    }
    assert got2 == got and t.read(spark).count() == 195


def test_interval_may_match_is_sound_property():
    """Soundness of the pruning predicate (pure python, hypothesis):
    whenever _interval_may_match returns False, NO value inside
    [mn, mx] can satisfy `x <op> value` — a False negative here would
    silently drop matching files."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    nums = st.one_of(
        st.integers(min_value=-10**6, max_value=10**6),
        st.floats(allow_nan=False, allow_infinity=False, width=32),
    )

    @settings(max_examples=500, deadline=None)
    @given(a=nums, b=nums, v=nums,
           vs=st.lists(st.one_of(nums, st.none()), max_size=5),
           op=st.sampled_from([">", ">=", "<", "<=", "=", "!=", "in"]),
           probe=st.floats(min_value=0.0, max_value=1.0))
    def run(a, b, v, vs, op, probe):
        mn, mx = min(a, b), max(a, b)
        val = vs if op == "in" else v
        if not VersionedParquetTable._interval_may_match(mn, mx, op, val):
            # sample a point inside the interval; it must NOT satisfy op.
            # clamp: the affine sample can land a hair OUTSIDE [mn, mx]
            # under float rounding (mn + (mx-mn)*1.0 != mx in general),
            # which once produced a spurious falsifying example
            x = min(max(mn + (mx - mn) * probe, mn), mx)
            sat = {
                ">": x > v, ">=": x >= v, "<": x < v, "<=": x <= v, "=": x == v,
                "!=": x != v,
                "in": x in [e for e in vs if e is not None],
            }[op]
            assert not sat, (mn, mx, op, val, x)
        # and None stats never skip
        assert VersionedParquetTable._interval_may_match(None, mx, op, val)
        assert VersionedParquetTable._interval_may_match(mn, None, op, val)

    run()


def test_bisected_in_refutation_equals_linear_property():
    """The _SortedInList fast path must be REFUTATION-EQUIVALENT to the
    linear scan — a bisect off-by-one would silently drop matching
    files at exactly the interval boundaries."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from odbc2deltalake_spark.tablestore import _SortedInList

    nums = st.integers(min_value=-50, max_value=50)

    @settings(max_examples=500, deadline=None)
    @given(
        a=nums,
        b=nums,
        vals=st.lists(st.one_of(nums, st.none()), max_size=8),
    )
    def run(a, b, vals):
        mn, mx = min(a, b), max(a, b)
        fast = VersionedParquetTable._interval_may_match(
            mn, mx, "in", _SortedInList(vals)
        )
        slow = any(mn <= v <= mx for v in vals if v is not None)
        assert fast == slow, (mn, mx, vals)

    run()


def test_current_rows_join_prunes_superseded_loads(spark, tmp_path):
    """VERDICT r5 item #4 — the J2 hot path: read_current_rows must
    scan only the commits that can still hold a current row, using the
    delta-col bounds the loads record for free (write_counted_minmax ->
    known_stats), and return exactly the unpruned result."""
    from odbc2deltalake_spark.plans.db_to_delta import read_current_rows
    from tests.cdc_utils import USER_SCHEMA, make_source, run_load

    dest = tmp_path / "dest"
    n_loads = 6
    base = [
        (i, f"fn{i}", f"ln{i}", float(20 + i), "c1", 1000 + i)
        for i in range(8)
    ]
    run_load(spark, make_source(spark, base), dest)  # full load
    rv = 2000
    for _ in range(n_loads):
        # full churn: every pk gets a new version each load
        rv += 100
        base = [
            (pk, fn, ln, age + 1.0, co, rv + pk)
            for (pk, fn, ln, age, co, _ts) in base
        ]
        run_load(spark, make_source(spark, base), dest)

    pruned = read_current_rows(spark, dest, ["User_-_iD"], "time_stamp")
    full = read_current_rows(
        spark, dest, ["User_-_iD"], "time_stamp", prune=False
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, full.collect())
    )
    # isolate the HISTORY side (inputFiles() of the join also counts the
    # latest_pk scan): replicate the prune predicate read_current_rows
    # derives, then compare history scans
    from odbc2deltalake_spark.plans.destination import DeltaDestination

    d = DeltaDestination(dest)
    min_ts = (
        d.latest_pk_version.read(spark).agg(F.min("time_stamp").alias("m"))
        .first()["m"]
    )
    n_pruned = len(
        d.delta.read(spark, skip_where=("time_stamp", ">=", min_ts)).inputFiles()
    )
    n_full = len(d.delta.read(spark).inputFiles())
    assert n_pruned < n_full, "pruning must drop superseded load commits"
    # every current row lives in the final load: survivors are that
    # commit plus the statless full-load base — 2 of n_loads+1 commits
    assert n_pruned <= 2 * (n_full / (n_loads + 1)) + 1


def test_current_rows_prune_keeps_statless_history(spark, tmp_path):
    """Pre-r6 history (appends without delta-col bounds) must be
    conservatively scanned, never pruned."""
    from odbc2deltalake_spark.metadata import SYS
    from odbc2deltalake_spark.plans.db_to_delta import read_current_rows
    from odbc2deltalake_spark.plans.destination import DeltaDestination

    d = DeltaDestination(tmp_path / "dest")
    hist = spark.createDataFrame(
        [(1, 10, False), (2, 20, False)],
        "pk long, ts long, x boolean",
    ).select(
        "pk",
        "ts",
        F.lit(False).alias(SYS.is_deleted),
        F.lit(True).alias(SYS.is_full_load),
        F.current_timestamp().alias(SYS.timestamp),
    )
    d.delta.write(hist, mode="append")  # NO delta-col stats recorded
    d.latest_pk_version.write(
        spark.createDataFrame([(1, 10), (2, 20)], "pk long, ts long"),
        mode="overwrite",
    )
    cur = read_current_rows(spark, d, ["pk"], "ts")
    assert sorted(r["pk"] for r in cur.collect()) == [1, 2]


def test_footer_stats_match_scan_collected(spark, tmp_path):
    """Parquet-footer per-file stats must produce the same pruning
    intervals as the aggregation-scan collector (ints, strings,
    timestamps), and plug into write(per_file_stats=True) with zero
    Spark jobs."""
    t = VersionedParquetTable(tmp_path / "t")
    df = (
        spark.range(0, 400)
        .select(
            F.col("id").alias("k"),
            F.format_string("s%05d", F.col("id")).alias("name"),
            F.timestamp_micros(F.col("id") * 1000000).alias("ts"),
        )
        .repartitionByRange(4, "k")
    )
    t.write(df, mode="append", stats_cols=["k", "name", "ts"], per_file_stats=True)
    dir_path = t._path(t._state_at()["dirs"][0]["dir"])
    foot = t._footer_file_stats(dir_path, ["k", "name", "ts"])
    scan = t._collect_file_stats(spark, dir_path, ["k", "name", "ts"])
    assert foot is not None and set(foot) == set(scan)
    for f in scan:
        for c in ("k", "name", "ts"):
            assert foot[f][c] == scan[f][c], (f, c)
    # pruning through the commit behaves identically
    pruned = t.read(spark, skip_where=("k", ">=", 300))
    assert len(pruned.inputFiles()) < len(t.read(spark).inputFiles())
    assert sorted(r["k"] for r in pruned.collect()) == list(range(300, 400))


def test_conjunctive_skip_multiplies_zorder_prune(spark, tmp_path):
    """skip_where as a LIST of predicates (ANDed): on a Z-ordered
    commit with per-file stats on both columns, the conjunction must
    prune at least as hard as the best single predicate, and the result
    must equal the fully-filtered unpruned read."""
    from odbc2deltalake_spark.operators.zorder import zorder_layout

    t = VersionedParquetTable(tmp_path / "t")
    n = 4096
    df = spark.range(n).select(
        (F.col("id") % 64).alias("x"),
        F.floor(F.col("id") / 64).alias("y"),
        F.col("id").alias("payload"),
    )
    t.write(
        zorder_layout(df, ["x", "y"], out_partitions=16),
        mode="append",
        stats_cols=["x", "y"],
        per_file_stats=True,
    )
    full = t.read(spark)
    both = t.read(spark, skip_where=[("x", "<", 8), ("y", "<", 8)])
    only_x = t.read(spark, skip_where=("x", "<", 8))
    only_y = t.read(spark, skip_where=("y", "<", 8))
    expect = sorted(
        tuple(r)
        for r in full.filter((F.col("x") < 8) & (F.col("y") < 8)).collect()
    )
    assert sorted(map(tuple, both.collect())) == expect
    nb = len(both.inputFiles())
    assert nb <= min(len(only_x.inputFiles()), len(only_y.inputFiles()))
    assert nb < len(full.inputFiles())


def test_conjunct_on_statless_column_is_neutral(spark, tmp_path):
    """A conjunct whose column has no recorded stats must not prune
    anything (conservative), while still filtering rows exactly."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_mk(spark, 0, 100), mode="append", stats_cols=["k"])
    t.write(_mk(spark, 100, 200), mode="append", stats_cols=["k"])
    got = t.read(spark, skip_where=[("k", ">=", 150), ("v", "<", 320)])
    assert sorted(r["k"] for r in got.collect()) == list(range(150, 160))
    # the k-conjunct still pruned the first commit
    assert len(got.inputFiles()) < len(t.read(spark).inputFiles())


def test_conjunction_can_drop_dir_on_commit_interval(spark, tmp_path):
    """Dir-level ('') intervals participate per conjunct: a commit
    excluded by ANY conjunct disappears entirely."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(_mk(spark, 0, 100), mode="append", known_stats={"k": (0, 99)})
    t.write(_mk(spark, 100, 200), mode="append", known_stats={"k": (100, 199)})
    got = t.read(spark, skip_where=[("k", ">", 150), ("k", "<", 160)])
    assert sorted(r["k"] for r in got.collect()) == list(range(151, 160))
    assert len(got.inputFiles()) < len(t.read(spark).inputFiles())


def test_skip_where_empty_list_is_no_predicate(spark, tmp_path):
    """ADVICE r6: read(skip_where=[]) must behave like no predicate,
    not IndexError."""
    from odbc2deltalake_spark.tablestore import VersionedParquetTable

    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(10).selectExpr("id as k"), mode="append")
    assert t.read(spark, skip_where=[]).count() == 10


def test_merge_bucket_dirs_carry_footer_stats(spark, tmp_path):
    """r10: bucket rewrites record per-file [min, max] for the bucket
    keys (plus any column a replaced dir had stats for) straight from
    the just-written parquet footers — so skip_where range reads and
    read_keys' in-probe keep pruning files INSIDE surviving buckets
    after every merge, instead of degrading to whole-bucket scans."""
    from odbc2deltalake_spark.tablestore import VersionedParquetTable
    from pyspark.sql import functions as F

    t = VersionedParquetTable(tmp_path / "t")
    df = spark.range(2000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    # the pre-merge table carries per-file stats on v; the conversion
    # must preserve v AND add the bucket key k
    t.write(df, mode="append", stats_cols=["v"], per_file_stats=True)
    t.merge_upsert(spark, df, ["k"], num_buckets=4)
    st = t._state_at()
    assert all(d.get("bucket") is not None for d in st["dirs"])
    for d in st["dirs"]:
        stats = d.get("stats") or {}
        files = [f for f in stats if f != ""]
        assert files, f"bucket dir {d['dir']} carries no per-file stats"
        assert all("k" in stats[f] for f in files)
    # the stats actually cut: an out-of-range probe drops every dir
    assert (
        t.read(spark, skip_where=("k", ">", 10_000_000)).inputFiles() == []
    )
    # a partial merge's NEW dirs carry stats too — including columns
    # the replaced dirs had (v came from the conversion's stat set)
    before = {d["dir"] for d in st["dirs"]}
    t.merge_upsert(
        spark,
        spark.createDataFrame([(7, 777)], "k long, v long"),
        ["k"],
    )
    new = [d for d in t._state_at()["dirs"] if d["dir"] not in before]
    assert new and all(d.get("stats") for d in new)
    assert all(
        {"k", "v"} <= set(next(iter((d["stats"]).values())))
        for d in new
    )
