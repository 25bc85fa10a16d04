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


# ------------------------------------------------- count-min heavy hitters ----

_CMS_DEPTH = 4
_CMS_WIDTH = 1 << 12  # 4096 counters per row; eps = e/width ~ 0.07%


def count_min_sketch(items: DataFrame, item_col: str) -> DataFrame:
    """Build a count-min sketch as a DataFrame: (row, col, cnt) with
    depth x width counters. Each item maps to one counter per hash row
    (xxhash64 with the row index as seed-mix); building is one
    hash-groupBy whose key space is AT MOST depth*width — constant —
    so the shuffle is bounded regardless of corpus size, and two
    sketches built this way merge by unioning and re-summing (the CMS
    mergeability property)."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])
    ).alias("row")
    keyed = items.select(F.col(item_col).alias("it")).select("it", rows)
    col = F.pmod(F.xxhash64(F.col("it"), F.col("row")), F.lit(_CMS_WIDTH))
    return (
        keyed.select("row", col.alias("col"))
        .groupBy("row", "col")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(sketch: DataFrame, probes: DataFrame, item_col: str) -> DataFrame:
    """Point-estimate item counts from a sketch: min over the depth
    counters (the CMS estimator — overcounts only, never under). The
    probe side joins the (small, bounded) sketch broadcast."""
    rows = F.explode(
        F.array(*[F.lit(i) for i in range(_CMS_DEPTH)])
    ).alias("row")
    keyed = probes.select(F.col(item_col).alias("it")).distinct().select("it", rows)
    col = F.pmod(F.xxhash64(F.col("it"), F.col("row")), F.lit(_CMS_WIDTH))
    return (
        keyed.select("it", "row", col.alias("col"))
        .join(F.broadcast(sketch), ["row", "col"], "left")
        .groupBy("it")
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("est"))
        .select(F.col("it").alias(item_col), F.col("est"))
    )


@register("approx_heavy_hitters", None, tags=("sketch",), priority=100)
def approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 words of the documents corpus with their count-min
    estimated frequencies: build the bounded sketch (one constant-size
    shuffle), then probe the candidate set. Accuracy gate
    (tests/test_sketch_accuracy.py): est >= true always, and
    est <= true + eps*N with eps = depth-min over 4096-wide rows."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    )
    sketch = count_min_sketch(toks, "w").localCheckpoint(eager=False)
    # candidate probes: every distinct word (bounded vocab)
    probes = toks.distinct()
    est = cms_estimate(sketch, probes, "w")
    return est.orderBy(F.col("est").desc(), "w").limit(20)
