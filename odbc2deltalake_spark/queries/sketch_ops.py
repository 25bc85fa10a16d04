"""Sketch-based approximate aggregation — the scale substitutes for
exact distinct-count and percentile shuffles.

At 100 TB, `countDistinct` is a full shuffle of every distinct key and
an exact percentile is a global sort; the sketch versions are map-side
combinable (HyperLogLog++ registers / KLL-style quantile summaries merge
associatively), so the shuffle moves kilobytes per partition instead of
the column. Spark ships both as built-in JVM aggregates —
`approx_count_distinct` and `percentile_approx` — no UDFs involved.

No DuckDB oracle: DuckDB's HLL/quantile sketches use different register
layouts, so cross-engine values differ by design. These register as
rows-only driver entries (the documented weaker check); the REAL gate is
tests/test_sketch_accuracy.py, which pins each sketch against the exact
computation within the sketch's published error bound — a stronger
statement about approximation quality than value equality with another
engine's sketch would be.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2deltalake_spark.queries.registry import load_table, register

_RSD = 0.02  # target relative standard deviation for HLL++
_PERC_ACC = 10_000  # percentile_approx accuracy knob (1/accuracy rank error)


@register("approx_user_cardinality", None, tags=("sketch",), priority=100)
def approx_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HyperLogLog++ (rsd=2%).
    Partial aggregation merges HLL registers map-side; the shuffle
    carries one sketch per (partition, event_type) — constant size
    regardless of user cardinality."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", rsd=_RSD).alias("approx_users"))
        .orderBy("event_type")
    )


@register("approx_value_percentiles", None, tags=("sketch",), priority=100)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per event type via the built-in
    approximate percentile aggregate (rank error <= 1/accuracy). The
    exact twin (`q_price_percentiles`) sorts per group; this one merges
    bounded summaries — the only option when a group's values exceed
    executor memory."""
    ev = load_table(spark, sf_dir, "events")
    p = F.percentile_approx("value", [0.5, 0.9, 0.99], _PERC_ACC)
    return (
        ev.groupBy("event_type")
        .agg(
            F.round(p[0], 2).alias("p50"),
            F.round(p[1], 2).alias("p90"),
            F.round(p[2], 2).alias("p99"),
        )
        .orderBy("event_type")
    )
