"""Property test: random INTERLEAVINGS of all three mutation planes —
merge-on-write / merge-on-read patches, lazy masks, eager DML — plus the
lifecycle ops (fold_patches, fold_masks, checkpoint, restore, vacuum)
against one dict model (VERDICT r8 #7).

Each plane has its own model-based property test
(test_patch_properties / test_mask_properties / test_dml_properties),
but the bugs that survive single-plane tests live in the SEAMS — e.g.
the r8 `_lazy_mask` force-fold of outstanding patch chains, or the r9
CDF double-emission when a merge folds a patch chain. This test drives
the seams directly: a patch chain can be outstanding when a mask lands
(folds first), a mask can be outstanding when a patch lands (no fold),
eager DML materializes both, restore rewinds across all of it, and
checkpoint/vacuum must never change what a reader sees.

The model is a dict id -> v with per-version snapshots for restore;
every end state must equal it, both as-is and after folding everything.
"""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odbc2deltalake_spark.tablestore import VersionedParquetTable

_OPS = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "in": lambda a, b: a in [v for v in b if v is not None],
}

_rows = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 40)),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)
_keys = st.lists(st.integers(0, 30), min_size=1, max_size=5, unique=True)
_strategy = st.sampled_from(["rewrite", "patch", "auto"])
_pred = st.one_of(
    st.tuples(
        st.sampled_from(["id", "v"]),
        st.sampled_from([">", ">=", "<", "<=", "=", "!="]),
        st.integers(0, 30),
    ),
    st.tuples(
        st.sampled_from(["id", "v"]),
        st.just("in"),
        st.lists(st.integers(0, 30), max_size=3),
    ),
)
_op = st.one_of(
    st.tuples(st.just("upsert"), st.tuples(_rows, _strategy)),
    st.tuples(st.just("del_keys"), st.tuples(_keys, _strategy)),
    st.tuples(st.just("del_where"), st.tuples(_pred, st.booleans())),
    st.tuples(st.just("upd_where"), st.tuples(_pred, st.booleans())),
    st.tuples(st.just("fold_patches"), st.none()),
    st.tuples(st.just("fold_masks"), st.none()),
    st.tuples(st.just("checkpoint"), st.none()),
    st.tuples(st.just("restore"), st.integers(0, 2)),
    st.tuples(st.just("vacuum"), st.none()),
)


def _matches(row_id: int, v: int, pred) -> bool:
    col, op, val = pred
    x = row_id if col == "id" else v
    return _OPS[op](x, val)


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(first=_rows, ops=st.lists(_op, min_size=2, max_size=8))
def test_three_plane_interleavings_match_dict_model(
    spark, tmp_path_factory, first, ops, monkeypatch
):
    # let "auto" actually route to patches on the tiny fixtures, and
    # keep the chains short enough that implicit folds fire
    monkeypatch.setattr(VersionedParquetTable, "PATCH_MIN_TABLE_ROWS", 1)
    monkeypatch.setattr(VersionedParquetTable, "PATCH_MAX_CHAIN", 3)
    monkeypatch.setattr(VersionedParquetTable, "MASK_MAX_CHAIN", 3)
    root = tmp_path_factory.mktemp("threeplane") / f"t{uuid.uuid4().hex[:8]}"
    t = VersionedParquetTable(root)
    v0 = t.merge_upsert(
        spark,
        spark.createDataFrame(first, "id long, v long"),
        ["id"],
        target_bucket_rows=4,
    )
    model = dict(first)
    history: list[tuple[int, dict]] = [(v0, dict(model))]
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
        elif kind == "del_keys":
            keys, strat = arg
            t.merge_delete_keys(
                spark,
                spark.createDataFrame([(k,) for k in keys], "id long"),
                ["id"],
                strategy=strat,
            )
            for k in keys:
                model.pop(k, None)
        elif kind == "del_where":
            pred, lazy = arg
            t.delete_where(spark, pred, lazy=lazy)
            model = {
                k: v for k, v in model.items() if not _matches(k, v, pred)
            }
        elif kind == "upd_where":
            pred, lazy = arg
            # lazy update refuses Column SETs and bucket-key columns;
            # "v * 2 + 1" is the shared portable shape
            t.update_where(spark, {"v": "v * 2 + 1"}, pred, lazy=lazy)
            model = {
                k: (v * 2 + 1 if _matches(k, v, pred) else v)
                for k, v in model.items()
            }
        elif kind == "fold_patches":
            t.fold_patches(spark)
        elif kind == "fold_masks":
            t.fold_masks(spark)
        elif kind == "checkpoint":
            t.checkpoint()
        elif kind == "restore":
            # rewind to one of the LAST three op-level snapshots (stays
            # inside the vacuum retention window below)
            ver, snap = history[max(0, len(history) - 1 - arg)]
            t.restore(ver)
            model = dict(snap)
        elif kind == "vacuum":
            t.vacuum(retain_versions=12)
        history.append((t.version(), dict(model)))

    def _read():
        return {r["id"]: r["v"] for r in t.read(spark).collect()}

    assert _read() == model
    assert t.count_rows(spark) == len(model)
    # materializing both planes never changes what a reader sees
    t.fold_patches(spark)
    t.fold_masks(spark)
    st_final = t._state_at()
    assert not st_final["patches"] and not st_final["masks"]
    assert _read() == model
    # and a checkpointed replay resolves to the same state
    t.checkpoint()
    assert _read() == model
