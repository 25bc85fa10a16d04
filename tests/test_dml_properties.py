"""Property test: delete_where / update_where against a pure-Python row
model, over random data (with NULLs), random conjunctive predicates and
random stats configurations — SQL match semantics (NULL never matches),
pruning never changes results, zero-match never commits."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odbc2deltalake_spark.tablestore import VersionedParquetTable

_vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=15))
_rows = st.lists(
    st.tuples(st.integers(min_value=0, max_value=30), _vals),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)
_pred = st.lists(
    st.tuples(
        st.sampled_from(["k", "v"]),
        st.sampled_from([">", ">=", "<", "<=", "=", "!="]),
        st.integers(min_value=-3, max_value=12),
    ),
    min_size=1,
    max_size=2,
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


def _matches(row, conj):
    for col, op, val in conj:
        x = row[0] if col == "k" else row[1]
        if x is None or not _OPS[op](x, val):
            return False
    return True


@settings(
    max_examples=10,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(rows=_rows, pred=_pred, stats=st.sampled_from([None, ["k"], ["k", "v"]]))
def test_delete_and_update_match_row_model(
    spark, tmp_path_factory, rows, pred, stats
):
    root = tmp_path_factory.mktemp("dmlprop") / f"t{uuid.uuid4().hex[:8]}"
    t = VersionedParquetTable(root)
    df = spark.createDataFrame(rows, "k long, v long")
    t.write(df, mode="append", stats_cols=stats, per_file_stats=bool(stats))

    # DELETE
    expect_kept = [r for r in rows if not _matches(r, pred)]
    n_del = len(rows) - len(expect_kept)
    v0 = t.version()
    out = t.delete_where(spark, pred)
    assert out["rows_deleted"] == n_del
    assert sorted((r["k"], r["v"]) for r in t.read(spark).collect()) == sorted(
        expect_kept
    )
    assert t.version() == (v0 + 1 if n_del else v0)  # zero-match: no commit

    # UPDATE on the survivors: v -> v * 10 where pred matches on k only
    kpred = [c for c in pred if c[0] == "k"] or [("k", ">=", 0)]
    expect = [
        (k, (v * 10 if _matches((k, v), kpred) and v is not None else v)
         if _matches((k, v), kpred) else v)
        for k, v in expect_kept
    ]
    n_upd = sum(1 for k, v in expect_kept if _matches((k, v), kpred))
    v1 = t.version()
    out = t.update_where(spark, {"v": "v * 10"}, kpred)
    assert out["rows_updated"] == n_upd
    assert sorted((r["k"], r["v"]) for r in t.read(spark).collect()) == sorted(
        expect
    )
    assert t.version() == (v1 + 1 if n_upd else v1)
