"""MaterializedJoin: incremental equi-join maintenance (delta-join IVM).
Soundness invariant everywhere: after any refresh sequence, `read` ==
`recompute` as a multiset — checked over hand-built schedules, the
re-baseline paths, compaction transparency, bucket pruning, and a
hypothesis-explored random schedule against a dict model."""

from __future__ import annotations

import collections

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from odbc2deltalake_spark.streaming import MaterializedJoin
from odbc2deltalake_spark.tablestore import VersionedParquetTable


def _mk(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.collect())


def _mvj(tmp_path, tag=""):
    a = VersionedParquetTable(tmp_path / f"a{tag}")
    b = VersionedParquetTable(tmp_path / f"b{tag}")
    mv = MaterializedJoin(
        a, b, tmp_path / f"view{tag}", on=["k"],
        left_cols=["la"], right_cols=["rb"],
    )
    return a, b, mv


def _check(spark, mv):
    assert _sorted_rows(mv.read(spark)) == _sorted_rows(mv.recompute(spark))


def test_interleaved_appends_match_recompute(spark, tmp_path):
    a, b, mv = _mvj(tmp_path)
    a.write(_mk(spark, [(1, "a1"), (2, "a2")], "k long, la string"))
    b.write(_mk(spark, [(1, "b1")], "k long, rb string"))
    assert mv.refresh(spark) == (0, 0)  # baseline
    _check(spark, mv)
    assert mv.refresh(spark) is None  # current

    # left-only delta: joins against pinned old right
    a.write(_mk(spark, [(1, "a3"), (3, "a4")], "k long, la string"))
    assert mv.refresh(spark) == (1, 0)
    _check(spark, mv)

    # right-only delta: joins against the new left (k=3 now matches)
    b.write(_mk(spark, [(3, "b2"), (2, "b3")], "k long, rb string"))
    assert mv.refresh(spark) == (1, 1)
    _check(spark, mv)

    # both sides at once: dA x dB must land exactly once
    a.write(_mk(spark, [(2, "a5")], "k long, la string"))
    b.write(_mk(spark, [(2, "b4")], "k long, rb string"))
    assert mv.refresh(spark) == (2, 2)
    _check(spark, mv)
    # duplicate-free on the overlap: (2,a5,b4) appears exactly once
    n = mv.read(spark).filter("la = 'a5' and rb = 'b4'").count()
    assert n == 1


def test_incremental_refresh_appends_not_overwrites(spark, tmp_path):
    """The delta path must append — an overwrite per refresh would be a
    hidden recompute. Commit modes distinguish the two."""
    a, b, mv = _mvj(tmp_path)
    a.write(_mk(spark, [(1, "x")], "k long, la string"))
    b.write(_mk(spark, [(1, "y")], "k long, rb string"))
    mv.refresh(spark)
    a.write(_mk(spark, [(1, "x2")], "k long, la string"))
    mv.refresh(spark)
    modes = [
        __import__("json").loads(
            mv.view.backend.read_text(
                mv.view.backend.join(mv.view._commits_dir, n)
            )
        )["mode"]
        for n in mv.view._commit_names()
    ]
    assert modes == ["overwrite", "append"]
    _check(spark, mv)


def test_source_rewrite_rebaselines(spark, tmp_path):
    a, b, mv = _mvj(tmp_path)
    a.write(_mk(spark, [(1, "x"), (2, "y")], "k long, la string"))
    b.write(_mk(spark, [(1, "p"), (2, "q")], "k long, rb string"))
    mv.refresh(spark)
    # DML on a source is a restore-mode commit — not an append delta
    a.delete_where(spark, ("k", "=", 1))
    assert mv.refresh(spark) == (a.version(), b.version())
    _check(spark, mv)
    assert mv.read(spark).filter("k = 1").count() == 0
    # an overwrite re-baselines too
    b.write(_mk(spark, [(2, "q2")], "k long, rb string"), mode="overwrite")
    mv.refresh(spark)
    _check(spark, mv)


def test_compaction_is_transparent(spark, tmp_path):
    """Rows-preserving OPTIMIZE on a source yields zero change rows —
    the view must NOT re-baseline (its next commit stays an append)."""
    a, b, mv = _mvj(tmp_path)
    for i in range(3):
        a.write(_mk(spark, [(i, f"x{i}")], "k long, la string"))
    b.write(_mk(spark, [(0, "p"), (1, "q"), (2, "r")], "k long, rb string"))
    mv.refresh(spark)
    a.compact(spark, out_partitions=1)
    a.write(_mk(spark, [(0, "x9")], "k long, la string"))
    mv.refresh(spark)
    _check(spark, mv)
    import json

    last = json.loads(
        mv.view.backend.read_text(
            mv.view.backend.join(
                mv.view._commits_dir, mv.view._commit_names()[-1]
            )
        )
    )
    assert last["mode"] == "append"


def test_pinned_side_bucket_pruned(spark, tmp_path):
    """Quiescent bucketized dimension + appending fact: the delta join
    must read only the buckets holding the delta's keys."""
    a, b, mv = _mvj(tmp_path)
    a.write(_mk(spark, [(1, "x")], "k long, la string"))
    dim = _mk(
        spark, [(i, f"d{i}") for i in range(40)], "k long, rb string"
    )
    b.merge_upsert(spark, dim, key_cols=["k"], num_buckets=8)
    mv.refresh(spark)  # merge commit -> baseline covers it
    _check(spark, mv)

    captured = {}
    orig = b.read

    def spying(spark_, version=None, buckets=None, skip_where=None):
        captured["buckets"] = buckets
        return orig(spark_, version=version, buckets=buckets,
                    skip_where=skip_where)

    b.read = spying
    try:
        a.write(_mk(spark, [(7, "x7"), (7, "x7b")], "k long, la string"))
        mv.refresh(spark)
    finally:
        b.read = orig
    assert captured["buckets"] is not None
    assert len(captured["buckets"]) <= 2  # only the delta keys' buckets
    _check(spark, mv)


def test_crash_between_steps_resumes_exactly_once(spark, tmp_path):
    """Marker rides each step's commit: a crash after step L (left
    folded, right not) must resume with ONLY step R — no duplicates."""
    a, b, mv = _mvj(tmp_path)
    a.write(_mk(spark, [(1, "x")], "k long, la string"))
    b.write(_mk(spark, [(1, "p")], "k long, rb string"))
    mv.refresh(spark)
    a.write(_mk(spark, [(1, "x2")], "k long, la string"))
    b.write(_mk(spark, [(1, "p2")], "k long, rb string"))

    # simulate the crash: run step L only, by making step R's write blow
    # up after step L committed
    orig_changes = b.read_changes
    calls = {"n": 0}

    def boom(*args, **kwargs):
        calls["n"] += 1
        raise RuntimeError("crash before step R")

    b.read_changes = boom
    try:
        try:
            mv.refresh(spark)
        except RuntimeError:
            pass
    finally:
        b.read_changes = orig_changes
    assert calls["n"] == 1
    assert mv._applied(mv.APPLIED_LEFT) == a.version()
    assert mv._applied(mv.APPLIED_RIGHT) == 0  # right not folded yet

    mv.refresh(spark)  # resumes with step R only
    _check(spark, mv)


_rows_a = st.lists(
    st.tuples(st.integers(0, 4), st.integers(0, 99)), min_size=1, max_size=4
)
_rows_b = st.lists(
    st.tuples(st.integers(0, 4), st.integers(100, 199)), min_size=1, max_size=4
)
# each step: (side, batch, refresh?) — arbitrary interleavings and
# refresh cadence, including several commits per side between refreshes
_schedule = st.lists(
    st.tuples(st.booleans(), _rows_a | _rows_b, st.booleans()),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(schedule=_schedule)
def test_random_schedules_match_model(spark, tmp_path_factory, schedule):
    import uuid

    tmp = tmp_path_factory.mktemp(f"mvj_{uuid.uuid4().hex[:8]}")
    a, b, mv = _mvj(tmp)
    landed_a: list[tuple[int, int]] = []
    landed_b: list[tuple[int, int]] = []
    a.write(_mk(spark, [(0, 0)], "k long, la long"))
    b.write(_mk(spark, [(0, 100)], "k long, rb long"))
    landed_a.append((0, 0))
    landed_b.append((0, 100))
    mv.refresh(spark)
    for to_a, batch, do_refresh in schedule:
        if to_a:
            rows = [(k, v) for k, v in batch]
            a.write(_mk(spark, rows, "k long, la long"))
            landed_a.extend(rows)
        else:
            rows = [(k, v) for k, v in batch]
            b.write(_mk(spark, rows, "k long, rb long"))
            landed_b.extend(rows)
        if do_refresh:
            mv.refresh(spark)
    mv.refresh(spark)

    model = collections.Counter()
    for k, la in landed_a:
        for k2, rb in landed_b:
            if k == k2:
                model[(k, la, rb)] += 1
    got = collections.Counter(tuple(r) for r in mv.read(spark).collect())
    assert got == model


def test_chained_ivm_join_then_aggregate(spark, tmp_path):
    """Composition: a MaterializedAggregate TAILING the join view gives a
    maintained join-then-aggregate (the star-schema rollup) with no new
    machinery — the join view's append commits flow through the change
    feed; its re-baseline overwrites trigger the aggregate's own
    snapshot recovery."""
    from odbc2deltalake_spark.streaming import MaterializedAggregate

    a, b, mv = _mvj(tmp_path)
    a.write(_mk(spark, [(1, 10), (2, 20)], "k long, la long"))
    b.write(_mk(spark, [(1, 100), (2, 200)], "k long, rb long"))
    mv.refresh(spark)
    agg = MaterializedAggregate(
        mv.view,
        tmp_path / "rollup",
        group_cols=["rb"],
        aggs={"n": ("count", None), "s": ("sum", "la")},
    )
    agg.refresh(spark)

    def expect():
        model = {}
        for r in mv.recompute(spark).collect():
            key = r["rb"]
            n, s = model.get(key, (0, 0))
            model[key] = (n + 1, s + r["la"])
        return {(k, n, s) for k, (n, s) in model.items()}

    def got():
        return {tuple(r) for r in agg.read(spark).select("rb", "n", "s").collect()}

    assert got() == expect()

    # incremental flow: appends on both base tables -> join appends ->
    # aggregate folds only the join's delta
    a.write(_mk(spark, [(1, 11), (3, 30)], "k long, la long"))
    b.write(_mk(spark, [(3, 300)], "k long, rb long"))
    mv.refresh(spark)
    agg.refresh(spark)
    assert got() == expect()

    # DML on a base table: join re-baselines (overwrite commit) -> the
    # aggregate's tailer hits a non-delta range and snapshot-recovers
    a.delete_where(spark, ("k", "=", 2))
    mv.refresh(spark)
    agg.refresh(spark)
    assert got() == expect()


def test_composite_keys_and_null_keys(spark, tmp_path):
    """Multi-column equi-join keys, and SQL null semantics: a NULL in
    any key column never matches (both incrementally and in the
    recompute), so the invariant holds with nulls present."""
    a = VersionedParquetTable(tmp_path / "a")
    b = VersionedParquetTable(tmp_path / "b")
    mv = MaterializedJoin(
        a, b, tmp_path / "view", on=["k1", "k2"],
        left_cols=["la"], right_cols=["rb"],
    )
    a.write(_mk(spark, [(1, "x", "a1"), (None, "x", "a2")],
                "k1 long, k2 string, la string"))
    b.write(_mk(spark, [(1, "x", "b1"), (None, "x", "b2")],
                "k1 long, k2 string, rb string"))
    mv.refresh(spark)
    _check(spark, mv)
    assert _sorted_rows(mv.read(spark)) == [(1, "x", "a1", "b1")]

    # delta with a null key joins nothing; delta with both keys matches
    a.write(_mk(spark, [(1, "x", "a3"), (2, None, "a4")],
                "k1 long, k2 string, la string"))
    mv.refresh(spark)
    _check(spark, mv)
    b.write(_mk(spark, [(2, "y", "b3")], "k1 long, k2 string, rb string"))
    a.write(_mk(spark, [(2, "y", "a5")], "k1 long, k2 string, la string"))
    mv.refresh(spark)
    _check(spark, mv)
    assert (2, "y", "a5", "b3") in _sorted_rows(mv.read(spark))


# ------------------- r8: retraction mode (left_key) -----------------------


def _commit_modes(t, since=0):
    import json as _json

    out = []
    for name in t._commit_names():
        v = int(name.split(".")[0])
        if v >= since:
            out.append(
                _json.loads(
                    t.backend.read_text(t.backend.join(t._commits_dir, name))
                )["mode"]
            )
    return out


def _mvj_keyed(tmp_path, tag=""):
    a = VersionedParquetTable(tmp_path / f"ka{tag}")
    b = VersionedParquetTable(tmp_path / f"kb{tag}")
    mv = MaterializedJoin(
        a, b, tmp_path / f"kview{tag}", on=["ck"],
        left_cols=["ok", "price"], right_cols=["seg"],
        left_key=["ok"],
    )
    return a, b, mv


def test_left_key_rejects_unknown_columns(tmp_path):
    import pytest

    a = VersionedParquetTable(tmp_path / "a")
    b = VersionedParquetTable(tmp_path / "b")
    with pytest.raises(ValueError, match="left_key"):
        MaterializedJoin(a, b, tmp_path / "v", on=["ck"],
                         left_cols=["ok"], right_cols=["seg"],
                         left_key=["nope"])


def test_keyed_view_folds_left_dml(spark, tmp_path):
    """Fact UPDATE/DELETE/keyed-delete fold through the change feed —
    no overwrite commit lands on the view after the baseline, and the
    fact table itself is never snapshot-read."""
    a, b, mv = _mvj_keyed(tmp_path)
    a.write(_mk(spark, [(o, o % 4, float(o)) for o in range(20)],
                "ok long, ck long, price double"))
    b.write(_mk(spark, [(c, f"s{c}") for c in range(4)], "ck long, seg string"))
    mv.refresh(spark)
    _check(spark, mv)
    base_view_v = mv.view.version()

    a.update_where(spark, {"price": "price * 10"}, ("ok", "<=", 5))
    a.delete_where(spark, ("ok", "=", 11))
    orig = a.read
    a.read = lambda *x, **k: (_ for _ in ()).throw(
        AssertionError("fact snapshot read — fold expected")
    )
    try:
        assert mv.refresh(spark) is not None
    finally:
        a.read = orig
    _check(spark, mv)
    assert mv.read(spark).filter("ok = 11").count() == 0
    assert mv.read(spark).filter("ok = 2").first()["price"] == 20.0
    assert "overwrite" not in _commit_modes(mv.view, since=base_view_v + 1)
    assert mv.refresh(spark) is None


def test_keyed_view_folds_fact_join_key_move(spark, tmp_path):
    """A fact UPDATE that MOVES the join key re-homes the view row to
    the new dim (or drops it when the new key has no dim)."""
    a, b, mv = _mvj_keyed(tmp_path)
    a.write(_mk(spark, [(1, 0, 5.0), (2, 1, 7.0)],
                "ok long, ck long, price double"))
    b.write(_mk(spark, [(0, "s0"), (1, "s1")], "ck long, seg string"))
    mv.refresh(spark)
    a.update_where(spark, {"ck": "1"}, ("ok", "=", 1))   # 0 -> 1 (has dim)
    a.update_where(spark, {"ck": "9"}, ("ok", "=", 2))   # 1 -> 9 (no dim)
    assert mv.refresh(spark) is not None
    _check(spark, mv)
    got = {r["ok"]: r["seg"] for r in mv.read(spark).collect()}
    assert got == {1: "s1"}  # ok=1 re-homed, ok=2 dropped


def test_keyed_view_folds_right_dml(spark, tmp_path):
    """Dim UPDATE rewrites the affected orders' rows; dim DELETE drops
    them — incrementally (no overwrite commit on the view)."""
    a, b, mv = _mvj_keyed(tmp_path)
    a.write(_mk(spark, [(o, o % 4, float(o)) for o in range(20)],
                "ok long, ck long, price double"))
    b.write(_mk(spark, [(c, f"s{c}") for c in range(4)], "ck long, seg string"))
    mv.refresh(spark)
    base_view_v = mv.view.version()

    b.update_where(spark, {"seg": "'gold'"}, ("ck", "=", 1))
    b.delete_where(spark, ("ck", "=", 3))
    assert mv.refresh(spark) is not None
    _check(spark, mv)
    segs = {r["ok"]: r["seg"] for r in mv.read(spark).collect()}
    assert segs[1] == "gold" and segs[5] == "gold"
    assert all(ok % 4 != 3 for ok in segs)  # ck=3 orders gone
    assert "overwrite" not in _commit_modes(mv.view, since=base_view_v + 1)


def test_keyed_view_folds_merge_sources(spark, tmp_path):
    """Both sides maintained by merge_upsert (the CDC layout): upsert
    batches fold; a keyed delete on the fact retracts its view row."""
    a, b, mv = _mvj_keyed(tmp_path)
    a.merge_upsert(spark, _mk(spark, [(o, o % 4, float(o)) for o in range(20)],
                              "ok long, ck long, price double"),
                   key_cols=["ok"], num_buckets=4)
    b.merge_upsert(spark, _mk(spark, [(c, f"s{c}") for c in range(4)],
                              "ck long, seg string"),
                   key_cols=["ck"], num_buckets=2)
    mv.refresh(spark)
    _check(spark, mv)

    a.merge_upsert(spark, _mk(spark, [(2, 2, 99.0), (100, 1, 1.0)],
                              "ok long, ck long, price double"),
                   key_cols=["ok"])
    b.merge_upsert(spark, _mk(spark, [(2, "platinum")], "ck long, seg string"),
                   key_cols=["ck"])
    assert mv.refresh(spark) is not None
    _check(spark, mv)
    a.merge_delete_keys(spark, _mk(spark, [(7,)], "ok long"), ["ok"])
    assert mv.refresh(spark) is not None
    _check(spark, mv)
    assert mv.read(spark).filter("ok = 7").count() == 0


def test_keyed_view_unmatched_insert_then_dim_arrives(spark, tmp_path):
    """A fact row landing before its dim is invisible; when the dim
    arrives the right-side fold surfaces it."""
    a, b, mv = _mvj_keyed(tmp_path)
    a.write(_mk(spark, [(1, 0, 5.0)], "ok long, ck long, price double"))
    b.write(_mk(spark, [(0, "s0")], "ck long, seg string"))
    mv.refresh(spark)
    a.write(_mk(spark, [(2, 8, 6.0)], "ok long, ck long, price double"))
    mv.refresh(spark)
    assert mv.read(spark).filter("ok = 2").count() == 0
    b.write(_mk(spark, [(8, "s8")], "ck long, seg string"))
    mv.refresh(spark)
    _check(spark, mv)
    assert mv.read(spark).filter("ok = 2").first()["seg"] == "s8"


def test_keyed_view_overwrite_still_rebaselines(spark, tmp_path):
    """A source overwrite is not fold-representable even in retraction
    mode — one re-baseline, then incremental again."""
    a, b, mv = _mvj_keyed(tmp_path)
    a.write(_mk(spark, [(1, 0, 5.0), (2, 0, 6.0)],
                "ok long, ck long, price double"))
    b.write(_mk(spark, [(0, "s0")], "ck long, seg string"))
    mv.refresh(spark)
    a.write(_mk(spark, [(3, 0, 9.0)], "ok long, ck long, price double"),
            mode="overwrite")
    assert mv.refresh(spark) is not None
    _check(spark, mv)
    assert {r["ok"] for r in mv.read(spark).collect()} == {3}
