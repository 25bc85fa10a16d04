"""Commit-log checkpoints (tablestore.py:checkpoint / _state_at): state
replay cost is O(commits since checkpoint), the Delta _last_checkpoint
design. Invariant everywhere: checkpointed replay == full replay, for
the head and for every time-travel version."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import (
    LocalStorageBackend,
    VersionedParquetTable,
)


class CountingBackend(LocalStorageBackend):
    def __init__(self):
        self.reads = 0

    def read_text(self, path: str) -> str:
        self.reads += 1
        return super().read_text(path)


def _states_equal(t: VersionedParquetTable, version=None):
    a = t._state_at(version, use_checkpoint=True)
    b = t._state_at(version, use_checkpoint=False)
    assert a == b, f"checkpointed replay diverged at version={version}"
    return a


def test_auto_checkpoint_and_equivalence(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(5).select(F.col("id").alias("k")), mode="append")
    # metadata commits are cheap — drive the version counter across two
    # checkpoint intervals
    for i in range(1, 45):
        t.set_properties({"tick": str(i)})
    assert t._checkpoint_versions() == [20, 40]
    for v in (None, 0, 19, 20, 21, 40, 44):
        _states_equal(t, v)
    # data reads unaffected
    assert t.read(spark).count() == 5
    assert t.get_property("tick") == "44"


def test_replay_cost_is_bounded_by_interval(spark, tmp_path):
    """Head-state resolution must read ~interval commit JSONs + one
    checkpoint, not the whole log."""
    backend = CountingBackend()
    t = VersionedParquetTable(tmp_path / "t", backend=backend)
    t.write(spark.range(3).select(F.col("id").alias("k")), mode="append")
    for i in range(1, 50):
        t.set_properties({"tick": str(i)})
    backend.reads = 0
    st = t._state_at()
    assert st["version"] == 49
    # checkpoint at 40 + commits 41..49 + the checkpoint file = 10 reads
    assert backend.reads <= 12, f"{backend.reads} reads — checkpoint unused?"
    backend.reads = 0
    t._state_at(use_checkpoint=False)
    assert backend.reads >= 50  # the full-replay baseline really is O(n)


def test_unreadable_checkpoint_falls_back(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(4).select(F.col("id").alias("k")), mode="append")
    for i in range(1, 45):
        t.set_properties({"tick": str(i)})
    # corrupt the newest checkpoint: replay must fall back to the older
    # one (v20), then the log tail — same state
    p = t._path("_checkpoints", f"{40:010d}.json")
    t.backend.write_text_atomic(p, "not json {")
    st = _states_equal(t)
    assert st["version"] == 44
    # corrupt both: full-replay fallback
    t.backend.write_text_atomic(t._path("_checkpoints", f"{20:010d}.json"), "x")
    st = _states_equal(t)
    assert st["version"] == 44


def test_checkpoint_preserves_bucketized_merge_state(spark, tmp_path):
    """bucket layout, per-bucket row counts and key types must survive a
    checkpoint boundary — merges after it keep routing correctly."""
    t = VersionedParquetTable(tmp_path / "t")
    t.checkpoint_interval = 3  # cross several boundaries with real merges
    df = spark.range(0, 200).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("v")
    )
    t.merge_upsert(spark, df, key_cols=["k"])
    for step in range(5):
        upd = spark.range(step * 20, step * 20 + 30).select(
            F.col("id").alias("k"), F.lit(-step - 1).alias("v")
        )
        t.merge_upsert(spark, upd, key_cols=["k"])
    assert t._checkpoint_versions(), "merges must trigger checkpoints"
    _states_equal(t)
    got = {r["k"]: r["v"] for r in t.read(spark).collect()}
    assert len(got) == 200
    assert got[85] == -5  # last merge (step 4) covered 80..109
    assert t.count_rows(spark) == 200  # metadata-backed count path


def test_time_travel_below_oldest_checkpoint(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.checkpoint_interval = 5
    for i in range(12):
        t.write(
            spark.range(i, i + 1).select(F.col("id").alias("k")),
            mode="append",
        )
    for v in range(12):
        assert t.read(spark, version=v).count() == v + 1
        _states_equal(t, v)
    with pytest.raises(ValueError):
        t._state_at(99)


def test_checkpoint_content_is_deterministic(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(6).select(F.col("id").alias("k")), mode="append")
    for i in range(1, 25):
        t.set_properties({"tick": str(i)})
    p = t._path("_checkpoints", f"{20:010d}.json")
    first = t.backend.read_text(p)
    t.checkpoint(20, full=True)  # explicit from-scratch rebuild
    assert json.loads(t.backend.read_text(p)) == json.loads(first)


# ----------------------------------------------------- property gate ----

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_rows = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 9)),
    min_size=1,
    max_size=5,
    unique_by=lambda t: t[0],
)
_ops = st.lists(
    st.tuples(
        st.sampled_from(["append", "overwrite", "merge", "props", "restore"]),
        _rows,
    ),
    min_size=2,
    max_size=7,
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(ops=_ops)
def test_checkpointed_replay_equals_full_under_any_schedule(
    spark, tmp_path_factory, ops
):
    """For ANY commit schedule (appends, overwrites, bucketizing merges,
    property sets, restores) with an aggressive checkpoint interval, the
    checkpointed state must equal the full-log replay at the head and at
    every historical version, and reads must agree."""
    root = tmp_path_factory.mktemp("ckpt_prop") / f"t{uuid.uuid4().hex[:8]}"
    t = VersionedParquetTable(root)
    t.checkpoint_interval = 2
    merged = False
    for i, (kind, rows) in enumerate(ops):
        df = spark.createDataFrame(list(rows), "id long, v long")
        if not t.exists():
            t.write(df, mode="overwrite")
            continue
        if kind == "append" and not merged:
            t.write(df, mode="append")
        elif kind == "overwrite":
            t.write(df, mode="overwrite")
            merged = False
        elif kind == "merge":
            t.merge_upsert(spark, df, key_cols=["id"])
            merged = True
        elif kind == "props":
            t.set_properties({"k": str(i)})
        elif kind == "restore":
            t.restore(max(0, t.version() - 1))
    head = t.version()
    for v in [None, head] + list(range(0, head + 1, 2)):
        a = t._state_at(v, use_checkpoint=True)
        b = t._state_at(v, use_checkpoint=False)
        assert a == b, f"divergence at version {v}"
    got = sorted(map(tuple, t.read(spark).collect()))
    t2 = VersionedParquetTable(root)  # fresh instance, same log
    assert sorted(map(tuple, t2.read(spark).collect())) == got


def test_wrong_shape_checkpoint_falls_back(spark, tmp_path):
    """A checkpoint that parses as JSON but lacks the state keys (format
    evolution / damage) must fall back exactly like an unreadable one —
    never a KeyError out of every state resolution."""
    t = VersionedParquetTable(tmp_path / "t")
    t.write(spark.range(4).select(F.col("id").alias("k")), mode="append")
    for i in range(1, 25):
        t.set_properties({"tick": str(i)})
    t.backend.write_text_atomic(
        t._path("_checkpoints", f"{20:010d}.json"), '{"not": "state"}'
    )
    st = _states_equal(t)
    assert st["version"] == 24
    assert t.read(spark).count() == 4


def test_truncate_log_caps_control_plane(spark, tmp_path):
    """Log retention (Delta logRetentionDuration analog): commits below
    a checkpointed version can be deleted; head state, recent time
    travel, reads and writes keep working; state below the cut raises
    instead of silently mis-answering; a lagging change-feed cursor gets
    the named truncation error and the snapshot policy recovers."""
    from odbc2deltalake_spark.streaming import TableTailer
    from odbc2deltalake_spark.tablestore import ChangeFeedTruncatedError

    t = VersionedParquetTable(tmp_path / "t")
    t.checkpoint_interval = 5
    for i in range(12):
        t.write(
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("k")),
            mode="append",
        )
    # no covering checkpoint at v6/v7 -> refuse
    with pytest.raises(ValueError, match="checkpoint"):
        t.truncate_log(before_version=7)
    t.checkpoint(6)
    removed = t.truncate_log(before_version=7)
    assert [int(n.split(".")[0]) for n in removed] == list(range(7))

    assert t.version() == 11
    assert t.read(spark).count() == 120
    assert t.read(spark, version=8).count() == 90  # above the cut: fine
    with pytest.raises(Exception):
        t.read(spark, version=3)  # below the cut: loud, not wrong
    t.write(spark.range(120, 125).select(F.col("id").alias("k")), mode="append")
    assert t.read(spark).count() == 125

    # lagging cursor across the truncation point
    tail = TableTailer(t)
    with pytest.raises(ChangeFeedTruncatedError, match="log truncation"):
        tail.process_available(spark, lambda df, a, b: None)
    snaps = []
    tail.process_available(
        spark, lambda df, a, b: snaps.append(df.count()),
        on_rewrite="snapshot",
    )
    assert snaps == [125]
    # caught up: deltas flow again
    t.write(spark.range(125, 130).select(F.col("id").alias("k")), mode="append")
    got = []
    tail.process_available(spark, lambda df, a, b: got.append(df.count()))
    assert got == [5]


def test_truncate_log_never_removes_head(spark, tmp_path):
    t = VersionedParquetTable(tmp_path / "t")
    t.checkpoint_interval = 2
    for i in range(5):
        t.write(spark.range(3).select(F.col("id").alias("k")), mode="append")
    t.checkpoint()  # at head (v4)
    removed = t.truncate_log(before_version=99)
    assert "0000000004.json" not in removed
    assert t.version() == 4
    assert t.read(spark).count() == 3 * 5


def test_truncated_log_without_checkpoint_raises_not_corrupts(spark, tmp_path):
    """ADVICE r6: after truncate_log, a replay that cannot use a covering
    checkpoint (use_checkpoint=False, or every checkpoint unreadable)
    must raise TruncatedLogError — NOT silently start from the oldest
    surviving commit. The silent path would let checkpoint(full=True)
    persist incomplete state and vacuum delete live data dirs."""
    from odbc2deltalake_spark.tablestore import TruncatedLogError

    t = VersionedParquetTable(tmp_path / "t")
    t.checkpoint_interval = 5
    for i in range(12):
        t.write(
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("k")),
            mode="append",
        )
    t.checkpoint(6)
    t.truncate_log(before_version=7)

    # checkpointed replay still fine
    assert t._state_at()["version"] == 11
    # full replay of a truncated log: loud, not wrong
    with pytest.raises(TruncatedLogError, match="truncated"):
        t._state_at(use_checkpoint=False)
    # the documented recovery path checkpoint(full=True) fails loudly
    # instead of persisting a wrong base
    with pytest.raises(TruncatedLogError):
        t.checkpoint(full=True)

    # damage EVERY checkpoint -> head replay must also refuse (it would
    # otherwise fold only surviving commits into empty state)
    for cv in t._checkpoint_versions():
        t.backend.write_text_atomic(
            t._path("_checkpoints", f"{cv:010d}.json"), "{broken"
        )
    with pytest.raises(TruncatedLogError):
        t._state_at()
    # non-truncated tables are unaffected by the guard
    t2 = VersionedParquetTable(tmp_path / "t2")
    t2.write(spark.range(3).select(F.col("id").alias("k")), mode="append")
    assert t2._state_at(use_checkpoint=False)["version"] == 0

def test_stale_checkpoint_below_truncation_cut_raises(spark, tmp_path):
    """ADVICE r7: checkpoints at v4 and v8, log truncated below v9, v8
    checkpoint corrupted. Falling back to the READABLE-but-STALE v4 base
    and folding the surviving v9+ commits would silently lose v5-v8 —
    the guard must treat a gap between the replay base and the oldest
    surviving commit exactly like the no-checkpoint case."""
    from odbc2deltalake_spark.tablestore import TruncatedLogError

    t = VersionedParquetTable(tmp_path / "t")
    t.checkpoint_interval = 0  # manual checkpoints only
    for i in range(12):
        t.write(
            spark.range(i * 10, i * 10 + 10).select(F.col("id").alias("k")),
            mode="append",
        )
    t.checkpoint(4)
    t.checkpoint(8)
    t.truncate_log(before_version=9)
    assert t._state_at()["version"] == 11  # healthy: v8 base + v9..v11

    t.backend.write_text_atomic(
        t._path("_checkpoints", f"{8:010d}.json"), "{broken"
    )
    with pytest.raises(TruncatedLogError, match="v5-v8"):
        t._state_at()
    with pytest.raises(TruncatedLogError):
        t.checkpoint(full=True)  # must not persist the incomplete base
    # time travel AT the stale base itself is complete state — allowed
    assert t._state_at(4)["version"] == 4
    assert t.read(spark, version=4).count() == 50
