"""Property test: random interleavings of lazy DELETE / lazy UPDATE /
eager DELETE / append / fold_masks against a pure-Python row model.

The mask engine is order-sensitive state (masks compose sequentially,
apply per dir, interact with stats pruning and folds), so the model
tracks rows per commit "generation": a mask only affects rows that were
live when it landed, an append after a mask is untouched, an eager DML
or fold materializes everything. SQL semantics throughout (NULL never
matches a predicate)."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odbc2deltalake_spark.tablestore import VersionedParquetTable

_vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=15))
_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=60), _vals),
    min_size=1,
    max_size=10,
    unique_by=lambda r: r[0],
)
_pred = st.one_of(
    st.tuples(
        st.sampled_from(["k", "v"]),
        st.sampled_from([">", ">=", "<", "<=", "=", "!="]),
        st.integers(min_value=-3, max_value=12),
    ),
    st.tuples(
        st.sampled_from(["k", "v"]),
        st.just("in"),
        st.lists(
            st.one_of(
                st.none(), st.integers(min_value=-3, max_value=12)
            ),
            max_size=4,
        ),
    ),
)
_op = st.one_of(
    st.tuples(st.just("append"), _rows),
    st.tuples(st.just("lazy_del"), _pred),
    st.tuples(st.just("lazy_upd"), _pred),
    st.tuples(st.just("eager_del"), _pred),
    st.tuples(st.just("fold"), st.none()),
)

_OPS = {
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    "=": lambda a, b: a == b,
    "!=": lambda a, b: a != b,
    "in": lambda a, b: a in [v for v in b if v is not None],
}


def _key(r):
    return (r[0], r[1] is None, r[1])


def _matches(row, conj):
    if isinstance(conj, tuple):
        conj = [conj]
    for col, op, val in conj:
        x = row[0] if col == "k" else row[1]
        if x is None or not _OPS[op](x, val):
            return False
    return True


@settings(
    max_examples=12,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(
    first=_rows,
    ops=st.lists(_op, min_size=1, max_size=6),
    stats=st.sampled_from([None, ["k"], ["k", "v"]]),
)
def test_mask_lifecycle_matches_row_model(
    spark, tmp_path_factory, first, ops, stats
):
    root = tmp_path_factory.mktemp("maskprop") / f"t{uuid.uuid4().hex[:8]}"
    t = VersionedParquetTable(root)
    t.write(
        spark.createDataFrame(first, "k long, v long"),
        mode="append",
        stats_cols=stats,
        per_file_stats=bool(stats),
        bloom_cols=["k"],  # bloom pruning rides every random probe below
    )
    # the model: a flat multiset of (k, v) rows — every mutation applies
    # to rows live AT ITS COMMIT, which for this op set equals applying
    # mutations in order to the flat state (appends add fresh rows that
    # later masks DO affect only if the masks come later — guaranteed by
    # sequential application)
    model: list[tuple] = list(first)
    for kind, arg in ops:
        if kind == "append":
            # re-key appended rows so duplicates with live rows are
            # allowed (append-only table, no key semantics)
            t.write(
                spark.createDataFrame(arg, "k long, v long"),
                mode="append",
                stats_cols=stats,
                per_file_stats=bool(stats),
                bloom_cols=["k"],
            )
            model.extend(arg)
        elif kind == "lazy_del":
            t.delete_where(spark, arg, lazy=True)
            model = [r for r in model if not _matches(r, arg)]
        elif kind == "lazy_upd":
            t.update_where(spark, {"v": "v * 2 + 1"}, arg, lazy=True)
            model = [
                (
                    (k, (v * 2 + 1) if v is not None else None)
                    if _matches((k, v), arg)
                    else (k, v)
                )
                for k, v in model
            ]
        elif kind == "eager_del":
            t.delete_where(spark, arg)
            model = [r for r in model if not _matches(r, arg)]
        elif kind == "fold":
            t.fold_masks(spark)
    got = sorted(((r["k"], r["v"]) for r in t.read(spark).collect()), key=_key)
    assert got == sorted(model, key=_key)
    # bloom-pruned point probes through the live mask chain: every
    # model key must be found, an absent key must return empty — the
    # bloom x mask x append seam under random interleavings
    probe_keys = sorted({k for k, _ in model})[:2] + [10**9]
    for pk in probe_keys:
        want = sorted((r for r in model if r[0] == pk), key=_key)
        pr = sorted(
            ((r["k"], r["v"]) for r in t.read(
                spark, skip_where=("k", "=", pk)
            ).collect()),
            key=_key,
        )
        assert pr == want, ("probe", pk)
    # folding at the end never changes what a reader sees
    t.fold_masks(spark)
    assert not t._state_at()["masks"]
    assert sorted(
        ((r["k"], r["v"]) for r in t.read(spark).collect()), key=_key
    ) == sorted(model, key=_key)
    assert t.count_rows(spark) == len(model)
