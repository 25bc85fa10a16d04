"""Property-based check of MaterializedAggregate against a dict model.

Any sequence of appended batches (arbitrary key/value rows, arbitrary
commit boundaries, arbitrary refresh cadence — including refreshes that
see several commits at once and refreshes that see none) must leave the
view exactly equal to a plain-Python aggregation of everything landed,
for BOTH update strategies. This is the IVM soundness property the unit
tests spot-check, explored over random schedules."""

from __future__ import annotations

import uuid

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from odbc2deltalake_spark.streaming import MaterializedAggregate
from odbc2deltalake_spark.tablestore import VersionedParquetTable

_batch = st.lists(
    st.tuples(st.integers(0, 5), st.integers(-50, 50)),
    min_size=1,
    max_size=8,
)
# each step: land a batch, then maybe refresh (False models several
# commits accumulating before one refresh sees them all)
_schedule = st.lists(
    st.tuples(_batch, st.booleans()), min_size=1, max_size=5
)


def _model_agg(rows):
    out = {}
    for k, v in rows:
        if k not in out:
            out[k] = [0, 0, v, v]  # n, total, mn, mx
        s = out[k]
        s[0] += 1
        s[1] += v
        s[2] = min(s[2], v)
        s[3] = max(s[3], v)
    return {
        k: (s[0], s[1], s[1] / s[0], s[2], s[3]) for k, s in out.items()
    }


@settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)
@given(schedule=_schedule, strategy=st.sampled_from(["overwrite", "merge"]))
def test_view_equals_model_under_any_schedule(
    spark, tmp_path_factory, schedule, strategy
):
    root = tmp_path_factory.mktemp("mvprop") / f"t{uuid.uuid4().hex[:8]}"
    landing = VersionedParquetTable(root / "landing")
    mv = MaterializedAggregate(
        landing,
        root / "view",
        group_cols=["k"],
        aggs={
            "n": ("count", None),
            "total": ("sum", "v"),
            "avg_v": ("avg", "v"),
            "mn": ("min", "v"),
            "mx": ("max", "v"),
        },
        strategy=strategy,
    )
    landed: list[tuple[int, int]] = []
    for rows, do_refresh in schedule:
        landing.write(
            spark.createDataFrame(rows, "k long, v long"), mode="append"
        )
        landed.extend(rows)
        if do_refresh:
            mv.refresh(spark)
    mv.refresh(spark)  # drain whatever the schedule left pending

    got = {
        r["k"]: (r["n"], r["total"], r["avg_v"], r["mn"], r["mx"])
        for r in mv.read(spark).collect()
    }
    want = _model_agg(landed)
    assert set(got) == set(want)
    for k in want:
        gn, gt, ga, gmn, gmx = got[k]
        wn, wt, wa, wmn, wmx = want[k]
        assert (gn, gt, gmn, gmx) == (wn, wt, wmn, wmx), k
        assert abs(ga - wa) < 1e-9, k
