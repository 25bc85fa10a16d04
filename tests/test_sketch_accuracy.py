"""Accuracy gates for the sketch operators: each approximate result must
sit within the sketch's published error bound of the exact computation —
the meaningful correctness statement for operators that have no
cross-engine oracle (different engines' sketches legitimately disagree)."""

from __future__ import annotations

from pyspark.sql import functions as F

from odbc2deltalake_spark.queries.registry import load_table
from odbc2deltalake_spark.queries.sketch_ops import (
    approx_user_cardinality,
    approx_value_percentiles,
)

SF_DIR = "/root/testdata/sf0.01"


def test_hll_cardinality_within_rsd_bound(spark):
    approx = {
        r["event_type"]: r["approx_users"]
        for r in approx_user_cardinality(spark, SF_DIR).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for et, n in exact.items():
        # rsd=0.02 → 5 sigma gives a deterministic-in-practice envelope
        assert abs(approx[et] - n) <= max(2, 0.10 * n), (et, approx[et], n)


def test_percentiles_within_rank_error(spark):
    got = {
        r["event_type"]: (r["p50"], r["p90"], r["p99"])
        for r in approx_value_percentiles(spark, SF_DIR).collect()
    }
    ev = load_table(spark, SF_DIR, "events")
    for et, (p50, p90, p99) in got.items():
        vals = sorted(
            r["value"] for r in ev.filter(F.col("event_type") == et).collect()
        )
        n = len(vals)
        for q, approx_v in ((0.5, p50), (0.9, p90), (0.99, p99)):
            # rank error bound: the approx value's rank must be within
            # n/accuracy (+1 for rounding slack) of the target rank
            target = q * (n - 1)
            import bisect

            lo = bisect.bisect_left(vals, approx_v - 0.005)
            hi = bisect.bisect_right(vals, approx_v + 0.005)
            tol = n / 10_000 + 1
            assert lo - tol <= target <= hi + tol, (et, q, approx_v, lo, hi, target)


def test_sketch_queries_are_deterministic(spark):
    """Same session, same input → identical output (sketches are
    deterministic functions of the data; only cross-engine layouts
    differ). This is what makes the rows-only driver check stable."""
    a = sorted(map(tuple, approx_user_cardinality(spark, SF_DIR).collect()))
    b = sorted(map(tuple, approx_user_cardinality(spark, SF_DIR).collect()))
    assert a == b
    c = sorted(map(tuple, approx_value_percentiles(spark, SF_DIR).collect()))
    d = sorted(map(tuple, approx_value_percentiles(spark, SF_DIR).collect()))
    assert c == d
