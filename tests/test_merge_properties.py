"""Property-based check of merge_upsert against a reference model.

Any sequence of overwrite / merge operations on the bucketized store must
leave exactly the rows a plain dict model predicts — across layout
conversion, adaptive bucket counts, partial merges, and growth-triggered
rebucketing (target_bucket_rows is tiny here so sequences cross the
rebucket threshold constantly)."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odbc2deltalake_spark.tablestore import VersionedParquetTable

_rows = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 9)),
    min_size=1,
    max_size=6,
    unique_by=lambda t: t[0],
)
_ops = st.lists(
    st.tuples(st.sampled_from(["merge", "overwrite"]), _rows),
    min_size=1,
    max_size=5,
)


@settings(
    max_examples=8,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(ops=_ops)
def test_merge_upsert_matches_dict_model(spark, tmp_path_factory, ops):
    root = tmp_path_factory.mktemp("prop") / f"t{uuid.uuid4().hex[:8]}"
    t = VersionedParquetTable(root)
    model: dict[int, int] = {}
    for kind, rows in ops:
        df = spark.createDataFrame([(k, v) for k, v in rows], "id long, v long")
        if kind == "overwrite" or not t.exists():
            if kind == "overwrite":
                t.write(df, mode="overwrite")
                model = dict(rows)
                continue
        t.merge_upsert(spark, df, ["id"], target_bucket_rows=4)
        model.update(dict(rows))
    got = {r["id"]: r["v"] for r in t.read(spark).collect()}
    assert got == model
    assert t.read(spark).count() == len(model)  # no duplicate keys ever
    assert t.count_rows(spark) == len(model)
