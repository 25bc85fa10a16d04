"""Event-stream analytics extensions: grouping sets (ROLLUP), analytic
window functions (lag), and interpolated percentiles — operator shapes the
base inventory lacks, each pinned against a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from odbc2deltalake_spark.queries.registry import load_table, register

# ----------------------------------------------------- ROLLUP aggregation --

_ROLLUP_ORACLE = """
SELECT event_type,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY ROLLUP(event_type, CAST(date_trunc('day', ts) AS DATE))
"""


@register("ev_rollup", _ROLLUP_ORACLE, tags=("events", "agg", "groupingsets"))
def ev_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP(event_type, day): hierarchical totals (per type+day, per
    type, grand total) in ONE pass — Spark expands grouping sets in the
    partial aggregate, so the fact table is still scanned once and the
    shuffle carries |types|x|days| + |types| + 1 groups."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    return (
        ev.select(F.col("event_type"), day, F.col("value"))
        .rollup("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# -------------------------------------------------- lag: inter-event gaps --

_GAPS_ORACLE = """
SELECT user_id,
       count(*) AS n_gaps,
       round(avg(gap_us), 4) AS avg_gap_us,
       max(gap_us) AS max_gap_us
FROM (
  SELECT user_id,
         epoch_us(ts - lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id)) AS gap_us
  FROM events
)
WHERE gap_us IS NOT NULL
GROUP BY user_id
"""


@register("ev_interevent_gaps", _GAPS_ORACLE, tags=("events", "window"))
def ev_interevent_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAG analytic: per-user inter-event gap statistics. One shuffle on
    user_id serves both the window and the subsequent groupBy (Catalyst
    reuses the partitioning — no second exchange).

    Gaps are exact integer microseconds (unix_micros / epoch_us) so the
    sums are integer-exact in both engines; only the final avg division
    is floating point, which both compute identically."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = (us - F.lag(us).over(w)).alias("gap_us")
    return (
        ev.select("user_id", gap)
        .filter(F.col("gap_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.round(F.avg("gap_us"), 4).alias("avg_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
    )


# ------------------------------------- interpolated percentiles (exact) ----

_PCT_ORACLE = """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
       round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
       round(quantile_cont(o_totalprice, 0.99), 4) AS p99
FROM orders
GROUP BY o_orderpriority
"""


@register("q_price_percentiles", _PCT_ORACLE, tags=("bench", "agg"), priority=100)
def q_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark `percentile` ==
    DuckDB `quantile_cont`, both linear interpolation). Exact percentile
    is a sort-based aggregate; at 100 TB swap in `approx_percentile`
    (t-digest, mergeable sketch) when 0.1% error is acceptable — the
    correctness gate pins the exact form."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 4).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.9)"), 4).alias("p90"),
        F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
    )
