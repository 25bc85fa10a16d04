"""Property test: random interleavings of merge strategies — rewrite /
patch / auto upserts, keyed deletes (both strategies), same-commit
upsert+delete, and fold_patches — against a plain dict model.

The patch engine is the most stateful new machinery in the store
(chain ordering, tombstone suppression, fold-through on rewrites), so
the model is deliberately dumb: a dict of key -> value updated in op
order. Every end state must match it, both with the chain outstanding
and after a final fold."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odbc2deltalake_spark.tablestore import VersionedParquetTable

_rows = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 9)),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)
_keys = st.lists(st.integers(0, 30), min_size=1, max_size=5, unique=True)
_strategy = st.sampled_from(["rewrite", "patch", "auto"])
_op = st.one_of(
    st.tuples(st.just("upsert"), st.tuples(_rows, _strategy)),
    st.tuples(st.just("delete"), st.tuples(_keys, _strategy)),
    st.tuples(st.just("upsert_del"), st.tuples(_rows, _keys, _strategy)),
    st.tuples(st.just("fold"), st.none()),
)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(first=_rows, ops=st.lists(_op, min_size=1, max_size=6))
def test_merge_strategies_match_dict_model(
    spark, tmp_path_factory, first, ops, monkeypatch
):
    # let "auto" actually route to patches on the tiny fixtures
    monkeypatch.setattr(VersionedParquetTable, "PATCH_MIN_TABLE_ROWS", 1)
    monkeypatch.setattr(VersionedParquetTable, "PATCH_MAX_CHAIN", 3)
    root = tmp_path_factory.mktemp("patchprop") / f"t{uuid.uuid4().hex[:8]}"
    t = VersionedParquetTable(root)
    t.merge_upsert(
        spark,
        spark.createDataFrame(first, "id long, v long"),
        ["id"],
        target_bucket_rows=4,
    )
    model = dict(first)
    for kind, arg in ops:
        if kind == "upsert":
            rows, strat = arg
            t.merge_upsert(
                spark,
                spark.createDataFrame(rows, "id long, v long"),
                ["id"],
                strategy=strat,
                target_bucket_rows=4,
            )
            model.update(dict(rows))
        elif kind == "delete":
            keys, strat = arg
            t.merge_delete_keys(
                spark,
                spark.createDataFrame([(k,) for k in keys], "id long"),
                ["id"],
                strategy=strat,
            )
            for k in keys:
                model.pop(k, None)
        elif kind == "upsert_del":
            rows, keys, strat = arg
            t.merge_upsert(
                spark,
                spark.createDataFrame(rows, "id long, v long"),
                ["id"],
                strategy=strat,
                target_bucket_rows=4,
                delete_keys=spark.createDataFrame(
                    [(k,) for k in keys], "id long"
                ),
            )
            # one commit: deletes land first, the upsert rows win ties
            for k in keys:
                model.pop(k, None)
            model.update(dict(rows))
        elif kind == "fold":
            t.fold_patches(spark)
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert got == model
    assert t.count_rows(spark) == len(model)
    t.fold_patches(spark)
    st_ = t._state_at()
    assert not st_["patches"]
    assert {r["id"]: r["v"] for r in t.read(spark).collect()} == model


def test_racing_patch_writers_conflict_cleanly(spark, tmp_path):
    """Two writers claiming the same version: the commit log's atomic
    create-if-absent lets exactly one commit win. Since r11 a patch
    auto-rebases over PROVABLY-commuting racers (key-disjoint appends,
    disjoint props — see test_occ_rebase), so the racer here is a
    NON-commuting merge: the losing patch gets CommitConflictError and
    its data dir stays un-referenced (vacuum fodder), never silently
    merged."""
    import pytest

    from odbc2deltalake_spark.tablestore import CommitConflictError

    t = VersionedParquetTable(tmp_path / "race")
    t.merge_upsert(
        spark,
        spark.createDataFrame([(i, 0) for i in range(20)], "id long, v long"),
        ["id"],
    )
    v = t.version()
    # simulate the race: the OTHER writer's commit lands after this
    # writer read its state but before it publishes — inject it right
    # under _write_commit so the atomic create-if-absent is what decides
    import json as _json

    real = t._write_commit

    def _racing_write(commit):
        racer = {
            "version": commit["version"], "mode": "merge",
            "schema": t._state_at()["schema"],
            "buckets_replaced": [], "dirs_added": [],
        }
        t.backend.write_text_exclusive(
            t.backend.join(t._commits_dir, f"{commit['version']:010d}.json"),
            _json.dumps(racer),
        )
        return real(commit)

    t._write_commit = _racing_write
    try:
        with pytest.raises(CommitConflictError):
            t.merge_upsert(
                spark,
                spark.createDataFrame([(1, 99)], "id long, v long"),
                ["id"],
                strategy="patch",
            )
    finally:
        t._write_commit = real
    # the loser's rows never became visible; a retry lands at v+2
    assert t.read(spark).filter("id = 1 and v = 99").count() == 0
    t.merge_upsert(
        spark,
        spark.createDataFrame([(1, 99)], "id long, v long"),
        ["id"],
        strategy="patch",
    )
    assert t.version() == v + 2
    assert t.read(spark).filter("id = 1 and v = 99").count() == 1
