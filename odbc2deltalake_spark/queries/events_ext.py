"""Event-stream analytics extensions: grouping sets (ROLLUP), analytic
window functions (lag), and interpolated percentiles — operator shapes the
base inventory lacks, each pinned against a DuckDB oracle.
"""

from __future__ import annotations

from typing import Optional

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


@register("ev_rollup", _ROLLUP_ORACLE, tags=("events", "agg", "groupingsets"),
          priority=100)
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


# r4 rotation: driver enumerates only the first 50 queries(); this
# shape is redundant there (lag window pinned by ev_sessionize) and stays oracle-gated via
# tests/test_correctness_extras.py at priority 100.
@register("ev_interevent_gaps", _GAPS_ORACLE, tags=("events", "window"), priority=100)
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


# ------------------------------------------------------------ as-of join --

_ASOF_ORACLE = """
WITH clicks AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
), purch AS (
  SELECT user_id, ts, round(max(value), 2) AS ref_value
  FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts
)
SELECT c.event_id, c.user_id, epoch_us(c.ts) AS ts_us,
       epoch_us(p.ts) AS ref_ts_us, p.ref_value
FROM clicks c ASOF JOIN purch p
  ON c.user_id = p.user_id AND c.ts >= p.ts
"""


@register("ev_asof_join", _ASOF_ORACLE, tags=("events", "join"))
def ev_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join — an operator Spark lacks natively (DuckDB: ASOF JOIN):
    each 'click' gets the most recent same-user 'purchase' at or before
    its timestamp.

    Implemented as the SCALABLE union-and-carry pattern, not an
    inequality join: tag both streams, sort each user's merged timeline
    once (ts, then reference-before-probe so equal timestamps are
    inclusive), and carry the last seen reference values forward with
    last(ignorenulls) — ONE shuffle on user_id, O(n log n) per user,
    where a naive `a.ts >= b.ts` theta-join explodes quadratically and a
    per-probe subquery never distributes. The reference stream is deduped
    per (user, ts) first so ties are deterministic in both engines."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    clicks = ev.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", us.alias("ts_us"),
        F.lit(None).cast("long").alias("p_ts_us"),
        F.lit(None).cast("double").alias("p_value"),
        F.lit(1).alias("kind"),
    )
    purch = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", us.alias("ts_us"))
        .agg(F.round(F.max("value"), 2).alias("p_value"))
        .select(
            F.lit(None).cast("long").alias("event_id"),
            "user_id", "ts_us",
            F.col("ts_us").alias("p_ts_us"),
            "p_value",
            F.lit(0).alias("kind"),
        )
    )
    merged = clicks.unionByName(purch)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts_us", "kind")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        merged.withColumn("ref_ts_us", F.last("p_ts_us", ignorenulls=True).over(w))
        .withColumn("ref_value", F.last("p_value", ignorenulls=True).over(w))
        .filter((F.col("kind") == 1) & F.col("ref_ts_us").isNotNull())
        .select("event_id", "user_id", "ts_us", "ref_ts_us", "ref_value")
    )


# ------------------------------------------------------------ range join --

_RANGE_WINDOW_US = 5 * 60 * 1_000_000  # ±5 minutes

_RANGE_ORACLE = f"""
WITH err AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
), clk AS (
  SELECT user_id, ts, value FROM events WHERE event_type = 'click'
)
SELECT e.event_id, e.user_id, epoch_us(e.ts) AS ts_us,
       count(c.ts) AS n_nearby,
       round(coalesce(sum(c.value), 0), 2) AS sum_nearby_value
FROM err e LEFT JOIN clk c
  ON e.user_id = c.user_id
 AND abs(epoch_us(e.ts) - epoch_us(c.ts)) <= {_RANGE_WINDOW_US}
GROUP BY e.event_id, e.user_id, epoch_us(e.ts)
"""


@register("ev_range_join", _RANGE_ORACLE, tags=("events", "join"),
          priority=100)  # r12: rotated out (ev_asof_join pins the harder interval mechanics; green r5-r11)
def ev_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: per 'error' event, count/sum same-user
    'click' events within ±5 minutes.

    A raw `abs(a.ts - b.ts) <= w` predicate gives Spark no equi-key and
    degenerates to a broadcast-nested-loop; the scalable form buckets
    time at the window width and probes the 3 adjacent buckets — the
    equi-join on (user_id, bucket) hash-partitions, every true match is
    within one bucket of the probe, and the exact |dt| filter runs only
    on bucket-local candidates. Errors with no nearby click are restored
    by a left join against the probe side (LEFT-join semantics)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    err = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", us.alias("ts_us")
    )
    clk = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        us.alias("c_ts_us"),
        "value",
        F.floor(us / _RANGE_WINDOW_US).alias("bucket"),
    )
    probes = err.select(
        "event_id", "user_id", "ts_us",
        F.explode(
            F.array(
                F.floor(F.col("ts_us") / _RANGE_WINDOW_US) - 1,
                F.floor(F.col("ts_us") / _RANGE_WINDOW_US),
                F.floor(F.col("ts_us") / _RANGE_WINDOW_US) + 1,
            )
        ).alias("bucket"),
    )
    matched = (
        probes.join(
            clk,
            (probes.user_id == clk.c_user) & (probes.bucket == clk.bucket),
        )
        .filter(F.abs(F.col("ts_us") - F.col("c_ts_us")) <= _RANGE_WINDOW_US)
        .groupBy("event_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("s"),
        )
    )
    return err.join(matched, "event_id", "left").select(
        "event_id", "user_id", "ts_us",
        F.coalesce(F.col("n"), F.lit(0)).alias("n_nearby"),
        F.round(F.coalesce(F.col("s"), F.lit(0.0)), 2).alias("sum_nearby_value"),
    )


# -------------------------------------------------- salted aggregation ----

_SALTED_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events
GROUP BY event_type
"""


@register("ev_salted_agg", _SALTED_ORACLE, tags=("events", "agg"), priority=100)
def ev_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation: `event_type` has ~5 distinct values over
    the whole stream — the canonical hot-key case where a single-stage
    groupBy lands each key's entire volume on one reducer. Two-stage
    salted form: stage 1 partially aggregates on (key, salt) — 16-way
    fan-out of each hot key — stage 2 combines the 5x16 partials. Spark's
    own partial aggregation usually covers this; explicit salting is the
    pattern for when it can't (e.g. count-distinct-style aggregates or
    skewed join keys). Sums run in the integer domain (floor to cents) so
    the re-association is exact and the result matches the plain
    single-stage oracle bit-for-bit."""
    ev = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100).cast("long")
    salt = F.pmod(F.xxhash64(F.col("event_id")), F.lit(16))
    partial = (
        ev.select("event_type", salt.alias("__salt"), cents.alias("cents"))
        .groupBy("event_type", "__salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.sum("cents").alias("pc"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.sum("pc").alias("value_cents"),
    )


# ------------------------------------------------------ funnel analysis ----
# Ordered conversion funnel view -> click -> purchase: a user counts at a
# step only if that step's event happens AT OR AFTER their entry into the
# previous step (min-timestamp semantics). The product-analytics shape the
# base inventory lacks: per-step conditional min-aggregations chained by
# per-user joins.

_FUNNEL_ORACLE = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 ON e.user_id = s1.user_id AND e.ts >= s1.t1
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s2 ON e.user_id = s2.user_id AND e.ts >= s2.t2
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name, count(*) AS n_users FROM s1
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', count(*) FROM s2
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', count(*) FROM s3
"""


@register("ev_funnel", _FUNNEL_ORACLE, tags=("events", "funnel"),
          priority=100)  # r8: rotated out (ev_rfm_segments keeps the family in-window; green r5-r7)
def ev_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-step ordered funnel with min-timestamp entry semantics. Each
    stage is one groupBy(user_id) over a type-filtered scan joined to the
    (strictly shrinking) previous stage — 3 shuffles on the same uniform
    key, and every stage's filter (`event_type = X`) is pushed to the
    scan. At 100 TB the stage joins co-partition on user_id, so only the
    first shuffle moves full data."""
    ev = load_table(spark, sf_dir, "events")

    def stage(etype: str, prev: DataFrame | None, tcol: str) -> DataFrame:
        e = ev.filter(F.col("event_type") == etype).select("user_id", "ts")
        if prev is not None:
            pcol = prev.columns[1]
            e = e.join(prev, "user_id").filter(F.col("ts") >= F.col(pcol))
        return e.groupBy("user_id").agg(F.min("ts").alias(tcol))

    s1 = stage("view", None, "t1")
    s2 = stage("click", s1, "t2")
    s3 = stage("purchase", s2, "t3")

    def level(n: int, name: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.lit(n).cast("long").alias("step"),
            F.lit(name).alias("step_name"),
            F.count(F.lit(1)).alias("n_users"),
        )

    return (
        level(1, "view", s1)
        .unionByName(level(2, "click", s2))
        .unionByName(level(3, "purchase", s3))
    )


# ---------------------------------------------------- cohort retention ----
# Day-0 cohorts by first-ever event date; retention = share of the cohort
# active exactly 1 / 7 days later. One distinct-activity table reused for
# both offsets.

_RETENTION_ORACLE = """
WITH f AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS d0 FROM events GROUP BY user_id
),
act AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
)
SELECT f.d0 AS cohort_day,
       count(*) AS n_users,
       count(a1.user_id) AS n_d1,
       count(a7.user_id) AS n_d7
FROM f
LEFT JOIN act a1 ON a1.user_id = f.user_id AND a1.d = f.d0 + 1
LEFT JOIN act a7 ON a7.user_id = f.user_id AND a7.d = f.d0 + 7
GROUP BY f.d0
"""


@register("ev_retention", _RETENTION_ORACLE, tags=("events", "retention"),
          priority=100)
def ev_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic D1/D7 cohort retention. The first-event and activity
    tables both come from one events scan lineage; the two offset joins
    are per-user equi-joins on (user_id, date) — distinct-activity keys,
    at most one row per side, no fanout. All keys uniform (user_id), so
    the three shuffles stay balanced at any scale."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(F.min("ts").cast("date").alias("d0"))
    act = ev.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    a1 = act.select(F.col("user_id").alias("u1"), F.col("d").alias("d1"))
    a7 = act.select(F.col("user_id").alias("u7"), F.col("d").alias("d7"))
    return (
        f.join(
            a1,
            (F.col("user_id") == F.col("u1"))
            & (F.col("d1") == F.date_add(F.col("d0"), 1)),
            "left",
        )
        .join(
            a7,
            (F.col("user_id") == F.col("u7"))
            & (F.col("d7") == F.date_add(F.col("d0"), 7)),
            "left",
        )
        .groupBy(F.col("d0").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.count(F.col("u1")).alias("n_d1"),
            F.count(F.col("u7")).alias("n_d7"),
        )
    )


# ---------------------------------------------------- cohort LTV curve ----
# Month-0 cohorts by first-ever event month; lifetime value = revenue and
# active-user counts per (cohort, months-since-acquisition). month_k is
# integer calendar arithmetic (year*12+month), bit-identical across
# engines — no months_between float semantics.

_COHORT_LTV_ORACLE = """
WITH f AS (
  SELECT user_id, CAST(date_trunc('month', min(ts)) AS DATE) AS m0
  FROM events GROUP BY user_id
)
SELECT f.m0 AS cohort_month,
       (year(e.ts) * 12 + month(e.ts))
         - (year(f.m0) * 12 + month(f.m0)) AS month_k,
       CAST(count(DISTINCT e.user_id) AS BIGINT) AS n_active,
       round(sum(e.value), 2) AS revenue
FROM events e JOIN f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


@register("ev_cohort_ltv", _COHORT_LTV_ORACLE, tags=("events", "retention"),
          priority=100)
def ev_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curves == the same cohort join in SQL.

    The acquisition table is one user_id agg; the fact join is an
    equi-join on user_id — both sides shuffle on the SAME key, so AQE
    reuses the agg's partitioning and the join adds no extra exchange
    at scale. The final rollup is tiny (|months|²). NULL user_ids drop
    out of the inner join on both engines (SQL equality); month
    arithmetic is integer calendar math, identical cross-engine."""
    ev = load_table(spark, sf_dir, "events")
    f = ev.groupBy("user_id").agg(
        F.date_trunc("month", F.min("ts")).cast("date").alias("m0")
    )
    j = ev.join(f, "user_id")
    month_k = (F.year("ts") * 12 + F.month("ts")) - (
        F.year("m0") * 12 + F.month("m0")
    )
    return (
        j.groupBy(
            F.col("m0").alias("cohort_month"),
            month_k.cast("long").alias("month_k"),
        )
        .agg(
            F.countDistinct("user_id").alias("n_active"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
    )


# ------------------------------------------------------------- pivot ----

_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]

_PIVOT_ORACLE = f"""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       {", ".join(f"coalesce(count(*) FILTER (WHERE event_type = '{t}'), 0) AS n_{t}" for t in _EVENT_TYPES)},
       count(*) AS n_total
FROM events
GROUP BY 1
"""


@register("ev_pivot_daily", _PIVOT_ORACLE, tags=("events", "pivot"),
          priority=100)
def ev_pivot_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: day × event_type counts as columns (explicit value list —
    an open-ended pivot would need a discovery pass; pinning the values
    keeps it ONE aggregation with |days| × |types| grouped cells, the
    same single shuffle as a plain groupBy). Missing combinations
    surface as 0, not null, on both engines."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    pivoted = (
        ev.select(day, "event_type")
        .groupBy("day")
        .pivot("event_type", _EVENT_TYPES)
        .count()
    )
    out = pivoted.select(
        "day",
        *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in _EVENT_TYPES],
    )
    total = None
    for t in _EVENT_TYPES:
        c = F.col(f"n_{t}")
        total = c if total is None else total + c
    return out.withColumn("n_total", total)


# ----------------------------------------------------- JSON extraction ----

_JSON_ORACLE = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
       CAST(min(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
       CAST(max(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
FROM events
GROUP BY event_type
"""


@register("ev_json_extract", _JSON_ORACLE, tags=("events", "json"),
          priority=100)
def ev_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column processing: extract a typed field from the
    JSON ``props`` column (get_json_object — JVM-side Jackson path
    eval, no UDF) and aggregate it per event type. The parse is
    map-side inside the scan projection; the aggregation is the usual
    single shuffle. At 100 TB prefer `from_json` with an explicit
    schema once the shape is known — Spark then prunes unread JSON
    fields instead of re-tokenizing per path."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


# -------------------------------------------- frame-spec moving average ----

_MAVG_ORACLE = """
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         round(sum(value), 2) AS day_value,
         count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT day, day_value,
       round(avg(day_value) OVER (
         ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
       ), 4) AS ma7,
       CAST(sum(n_events) OVER (
         ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS BIGINT) AS cum_events
FROM daily
"""


@register("ev_moving_avg", _MAVG_ORACLE, tags=("events", "window", "frame"),
          priority=100)
def ev_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAME specs: 7-row trailing moving average and a running
    cumulative sum over the daily rollup. The frame windows run over the
    |days|-sized aggregate — a deliberate single-partition window on a
    control-plane-sized frame (the daily rollup), not the raw events; at
    100 TB the heavy lifting stays in the day aggregation's one
    shuffle."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    ).agg(
        F.round(F.sum("value"), 2).alias("day_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w7 = W.orderBy("day").rowsBetween(-6, 0)
    wcum = W.orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    return daily.select(
        "day",
        "day_value",
        F.round(F.avg("day_value").over(w7), 4).alias("ma7"),
        F.sum("n_events").over(wcum).cast("long").alias("cum_events"),
    )


# ------------------------------------------------------------- unpivot ----

_UNPIVOT_ORACLE = f"""
WITH p AS ({_PIVOT_ORACLE})
SELECT day, t.event_type, t.n
FROM p, LATERAL (VALUES
  {", ".join(f"('{t}', n_{t})" for t in _EVENT_TYPES)}
) AS t(event_type, n)
WHERE t.n > 0
"""


@register("ev_unpivot", _UNPIVOT_ORACLE, tags=("events", "pivot"),
          priority=100)
def ev_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): the day × type count matrix back to long form via
    ``stack`` — a generator expression in the projection, no shuffle
    beyond the pivot's own. Zero-count cells are dropped so the
    round-trip equals the original grouped counts."""
    wide = ev_pivot_daily(spark, sf_dir)
    stack_args = ", ".join(f"'{t}', n_{t}" for t in _EVENT_TYPES)
    return (
        wide.selectExpr(
            "day",
            f"stack({len(_EVENT_TYPES)}, {stack_args}) AS (event_type, n)",
        )
        .filter(F.col("n") > 0)
    )


# ------------------------------------------------ statistical aggregates ----

_STATS_ORACLE = """
SELECT l_returnflag,
       count(*) AS n,
       round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price,
       round(covar_samp(l_quantity, l_extendedprice), 2) AS covar_qty_price,
       round(stddev_samp(l_extendedprice), 2) AS std_price,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 2) AS intercept
FROM lineitem
GROUP BY l_returnflag
"""


@register("q_stat_aggregates", _STATS_ORACLE, tags=("bench", "stats"),
          priority=100)
def q_stat_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregate family: Pearson correlation, sample
    covariance/stddev, and least-squares slope/intercept per group —
    all single-pass JVM aggregates (each keeps O(1) moments per group,
    merged associatively map-side), so the shuffle carries a handful of
    doubles per group at any scale."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias(
            "corr_qty_price"
        ),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
        F.round(
            F.expr("regr_slope(l_extendedprice, l_quantity)"), 4
        ).alias("slope"),
        F.round(
            F.expr("regr_intercept(l_extendedprice, l_quantity)"), 2
        ).alias("intercept"),
    )


# ------------------------------------------------- ranking function family ----

_RANKS_ORACLE = """
WITH per_user AS (
  SELECT event_type, user_id, round(sum(value), 2) AS total_value
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id, total_value,
       CAST(rank() OVER w AS BIGINT) AS rnk,
       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
       round(percent_rank() OVER w, 4) AS pct_rank,
       round(cume_dist() OVER w, 4) AS cume
FROM per_user
WINDOW w AS (PARTITION BY event_type ORDER BY total_value DESC, user_id)
"""


@register("ev_value_ranks", _RANKS_ORACLE, tags=("events", "window"),
          priority=100)
def ev_value_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-function family (rank / dense_rank / ntile /
    percent_rank / cume_dist) over per-user value totals — one
    aggregation shuffle, then one window shuffle on the group key; the
    deterministic (total_value, user_id) order makes every rank
    reproducible across engines."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("event_type", "user_id").agg(
        F.round(F.sum("value"), 2).alias("total_value")
    )
    w = W.partitionBy("event_type").orderBy(
        F.col("total_value").desc(), "user_id"
    )
    return per_user.select(
        "event_type",
        "user_id",
        "total_value",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 4).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 4).alias("cume"),
    )


# -------------------------------------------------- volume anomaly scan ----
# Ingest monitoring: flag (event_type, day) cells whose daily volume
# deviates from that type's own daily distribution — the data-quality
# check a pipeline runs after every load to catch broken producers
# (silent drops) and runaway duplication (spikes) before training data
# is built on the batch.

_ANOMALY_Z = 1.5  # |z| above this flags the day

_ANOMALY_ORACLE = f"""
WITH daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
),
stats AS (
  SELECT event_type, avg(cnt) AS mu, stddev_samp(cnt) AS sigma
  FROM daily GROUP BY event_type
)
SELECT d.event_type, d.day, d.cnt,
       round((d.cnt - s.mu) / s.sigma, 4) AS zscore
FROM daily d JOIN stats s USING (event_type)
-- sigma > 0 guard: on a type whose daily counts are all equal,
-- stddev_samp = 0 and the engines diverge (Spark: x/0.0 -> NaN, which
-- sorts above every threshold; DuckDB: double/0 -> NULL, dropped) —
-- and a zero-variance series has no z-score anomaly by definition
WHERE s.sigma > 0 AND abs((d.cnt - s.mu) / s.sigma) > {_ANOMALY_Z}
"""


@register("ev_volume_anomaly", _ANOMALY_ORACLE, tags=("events", "quality"),
          priority=100)
def ev_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-volume z-score anomalies per event type.

    Scale shape: the corpus-wide work is ONE aggregation to the
    (type, day) rollup — output-sized (|types| x |days|), tiny at any
    corpus scale. Per-type mean/stddev aggregate that rollup again and
    join back as a BROADCAST (|types| rows), so no window over an
    unpartitioned frame and no second pass over raw events. At 100 TB
    the plan is: one shuffle keyed (type, day), then control-plane-sized
    arithmetic."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    stats = daily.groupBy("event_type").agg(
        F.avg("cnt").alias("mu"),
        F.stddev_samp("cnt").alias("sigma"),
        F.count(F.lit(1)).alias("n_days"),
    )
    z = (F.col("cnt") - F.col("mu")) / F.col("sigma")
    return (
        daily.join(F.broadcast(stats), "event_type")
        # n_days >= 2 makes the guard independent of how the engine
        # encodes a single-sample stddev (NULL on modern Spark/DuckDB,
        # NaN under spark.sql.legacy.statisticalAggregate — and NaN
        # orders ABOVE every value in Spark, so `sigma > 0` alone would
        # pass it)
        .filter(
            (F.col("n_days") >= 2)
            & (F.col("sigma") > 0)
            & (F.abs(z) > _ANOMALY_Z)
        )
        .select(
            "event_type", "day", "cnt", F.round(z, 4).alias("zscore")
        )
    )


# ---------------------------------------------- path transition matrix ----
# Session-path mining: the first-order Markov transition counts between
# consecutive event types per user — the behavioral-analytics shape
# behind "what do users do after X" and the input to path-frequency /
# next-event-prediction models.

_TRANSITIONS_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
),
pairs AS (
  SELECT prev_type, event_type AS next_type, count(*) AS n
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
),
tot AS (SELECT prev_type, sum(n) AS t FROM pairs GROUP BY prev_type)
SELECT p.prev_type, p.next_type, p.n,
       round(p.n * 1.0 / t.t, 4) AS p_next
FROM pairs p JOIN tot t USING (prev_type)
"""


@register("ev_path_transitions", _TRANSITIONS_ORACLE,
          tags=("events", "window"), priority=100)  # r7: rotated out (ev_funnel keeps the family in-window)
def ev_path_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-type transition matrix with row-normalized
    probabilities.

    One shuffle on user_id feeds the LAG window; the pair counts then
    aggregate to a |types|^2-sized table, and the row totals join back
    as a BROADCAST — everything after the per-user window is
    output-sized, so the plan is one corpus shuffle regardless of
    event volume. Ordering inside a user is (ts, event_id) — the same
    deterministic tiebreak every other event window uses."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    pairs = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = pairs.groupBy("prev_type").agg(F.sum("n").alias("t"))
    return (
        pairs.join(F.broadcast(tot), "prev_type")
        .select(
            "prev_type",
            "next_type",
            "n",
            F.round(F.col("n") * F.lit(1.0) / F.col("t"), 4).alias("p_next"),
        )
    )


# ----------------------------------------------------- RFM segmentation ----
#
# Recency / Frequency / Monetary user segmentation — the classic
# behavioral-cohort operator. Metrics aggregate per user (one shuffle on
# user_id); quintile scores are DISTRIBUTED ntiles (exact ntile(5)
# semantics, no single-partition window — see _dist_ntile) with
# fully-deterministic orderings (metric + user_id tiebreak — bare ntile
# over ties diverges between engines).


def _dist_ntile(df: DataFrame, order_cols, out_col: str, n: int = 5,
                buckets: Optional[int] = None) -> DataFrame:
    """Exact ``ntile(n) OVER (ORDER BY order_cols)`` without the global
    sort through one task that an unpartitioned Window costs (the r6
    scale-killer in this file): (1) ``repartitionByRange`` on the
    ordering — partition i's keys all sort before partition i+1's;
    (2) ``row_number`` WITHIN each range partition — parallel windows;
    (3) global position = local position + the partition's starting
    offset, from a ≤``buckets``-row histogram; (4) ntile arithmetic
    from (position, N): the first N%n tiles get ⌈N/n⌉ rows, the rest
    ⌊N/n⌋ — bit-identical to the engines' ntile.

    r14 wave 12 shape (guide §2.4 — fewer passes, §5 — bounded driver
    work): the range-partitioned frame is EAGERLY localCheckpoint-ed —
    mandatory for correctness, not a tuning choice: the histogram and
    the returned plan must observe the SAME materialized partition
    boundaries (each re-execution of a ``repartitionByRange`` re-draws
    its sampling and may place boundaries differently), and it also
    truncates lineage so chained ntile passes (ev_rfm_segments runs
    three) stop re-executing every earlier pass inside their sampling
    and broadcast-build jobs — the job-count blowup measured at 48
    jobs for 3 logical passes. The histogram itself is a ≤``buckets``-
    row collect (control-plane bounded, the same budget class as the
    repo's centroid/bucket-id collects; ``buckets`` is the session's
    shuffle parallelism, i.e. cluster-sized, never data-sized), and
    the partition offsets enter the plan as ONE parsed map literal
    (litarray pattern) — replacing the former broadcast self-join +
    crossJoin(N) subtree and its three broadcast-build jobs per pass.
    Measured (same-session interleaved A/B, sf0.1, results identical):
    ev_rfm_segments 48 jobs / 5.5-5.8 s → 23 jobs / 2.4-3.4 s.

    ``order_cols`` must be a total order (include a unique tiebreak):
    equal keys land in one range partition, so ordering is well-defined
    regardless of where sampling places the range boundaries. ``buckets``
    defaults to the session's shuffle parallelism so per-task slices
    shrink with the cluster (a fixed constant would cap parallelism)."""
    if buckets is None:
        from odbc2deltalake_spark.session import shuffle_parallelism

        buckets = shuffle_parallelism(df.sparkSession)
    part = df.repartitionByRange(buckets, *order_cols)
    keyed = part.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    local = keyed.withColumn(
        "_rn", F.row_number().over(W.partitionBy("_pid").orderBy(*order_cols))
    )
    # ≤ buckets rows: every non-empty partition id with its row count.
    # Range partition ids are assigned in key-range order, so sorted-pid
    # prefix sums ARE the global starting offsets (empty partitions
    # contribute no rows and need no entry).
    hist = {
        row["_pid"]: row["_c"]
        for row in keyed.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_c"))
        .collect()
    }
    total = sum(hist.values())
    offs: dict[int, int] = {}
    running = 0
    for pid in sorted(hist):
        offs[pid] = running
        running += hist[pid]
    if offs:
        pairs = ", ".join(f"{pid}, {off}L" for pid, off in sorted(offs.items()))
        off_expr = F.expr(f"element_at(map({pairs}), _pid)")
    else:  # empty input: no rows evaluate this, but the expr must parse
        off_expr = F.lit(0).cast("long")
    pos = off_expr + F.col("_rn")
    q = total // n
    r = total % n
    head = r * (q + 1)  # rows covered by the first r (larger) tiles
    tile = (
        F.when(pos <= F.lit(head), F.floor((pos - 1) / F.lit(q + 1)))
        # max(q,1): q=0 only when N<n, where every row is in `head`
        # and this branch is never taken — guard keeps ANSI div happy
        .otherwise(r + F.floor((pos - F.lit(head) - 1) / F.lit(max(q, 1))))
        + 1
    )
    return local.withColumn(out_col, tile.cast("int")).drop("_pid", "_rn")

_RFM_ORACLE = """
WITH mx AS (SELECT max(ts) AS mts FROM events),
per_user AS (
  SELECT user_id,
         date_diff('second', max(ts), (SELECT mts FROM mx)) AS recency_s,
         count(*) AS frequency,
         round(sum(value), 4) AS monetary
  FROM events GROUP BY user_id
),
scored AS (
  SELECT user_id, recency_s, frequency, monetary,
         ntile(5) OVER (ORDER BY recency_s, user_id) AS r_score,
         ntile(5) OVER (ORDER BY frequency DESC, user_id) AS f_score,
         ntile(5) OVER (ORDER BY monetary DESC, user_id) AS m_score
  FROM per_user
)
SELECT user_id, CAST(recency_s AS BIGINT) AS recency_s, frequency, monetary,
       r_score, f_score, m_score,
       CASE WHEN r_score <= 2 AND f_score <= 2 THEN 'champion'
            WHEN r_score <= 2 THEN 'recent'
            WHEN f_score <= 2 THEN 'loyal_lapsing'
            WHEN r_score >= 4 AND f_score >= 4 THEN 'at_risk'
            ELSE 'regular' END AS segment
FROM scored
"""


@register("ev_rfm_segments", _RFM_ORACLE, tags=("events", "window"))  # r7: promoted post-dist-ntile fix
def ev_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per-user recency (seconds before the corpus's
    last event), frequency and monetary value, quintile-scored and
    bucketed into named segments.

    Scale shape: the only corpus-wide work is ONE user_id aggregation
    (map-side combined). Quintiles over the |users|-sized aggregate use
    ``_dist_ntile`` — exact ntile(5) output via range-partitioned local
    ranks + broadcast offsets, because |users| is NOT constant-sized (at
    100 TB of events it is billions of rows; an unpartitioned ntile
    window there would be a global sort through one task — flagged by
    the r6 review). Ordering is total (metric, user_id) so both engines
    tile identically."""
    ev = load_table(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mts"))
    per_user = (
        ev.crossJoin(F.broadcast(mx))  # packed single-row scalar
        .groupBy("user_id")
        .agg(
            F.min(
                F.unix_timestamp(F.col("mts")) - F.unix_timestamp(F.col("ts"))
            ).alias("recency_s"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(F.sum("value"), 4).alias("monetary"),
        )
        .select(
            "user_id",
            F.col("recency_s").cast("long").alias("recency_s"),
            "frequency",
            "monetary",
        )
        # each _dist_ntile's repartitionByRange SAMPLES its input (a
        # RangePartitioner job), so without truncation the events
        # aggregation lineage would re-execute for every sampling pass +
        # every scoring pass. Persisting the |users|-sized aggregate once
        # (lazy local checkpoint, same device as dedup_cluster's rounds)
        # makes the three ntile passes operate on the small frame only.
        .localCheckpoint(eager=False)
    )
    scored = _dist_ntile(per_user, ["recency_s", "user_id"], "r_score")
    scored = _dist_ntile(
        scored, [F.col("frequency").desc(), F.col("user_id").asc()], "f_score"
    )
    scored = _dist_ntile(
        scored, [F.col("monetary").desc(), F.col("user_id").asc()], "m_score"
    )
    seg = (
        F.when((F.col("r_score") <= 2) & (F.col("f_score") <= 2), "champion")
        .when(F.col("r_score") <= 2, "recent")
        .when(F.col("f_score") <= 2, "loyal_lapsing")
        .when((F.col("r_score") >= 4) & (F.col("f_score") >= 4), "at_risk")
        .otherwise("regular")
    )
    return scored.withColumn("segment", seg)


# ----------------------------------------------- calendar gap filling ----
#
# Time-series gap fill + forward fill — an operator Spark has no native
# construct for (DuckDB/Postgres: generate_series + IGNORE NULLS window;
# Flink: temporal fill). Every user's activity span is densified to one
# row per calendar day; days with no events carry n_events=0 and the
# last prior day's value forward.

_GAP_FILL_ORACLE = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n_events, round(sum(value), 4) AS day_value
  FROM events GROUP BY 1, 2
),
spans AS (
  SELECT user_id, min(day) AS d0, max(day) AS d1 FROM daily GROUP BY user_id
),
cal AS (
  SELECT user_id,
         unnest(generate_series(d0, d1, INTERVAL 1 DAY))::DATE AS day
  FROM spans
)
SELECT c.user_id, c.day,
       coalesce(d.n_events, 0) AS n_events,
       d.day_value,
       last_value(d.day_value IGNORE NULLS) OVER (
         PARTITION BY c.user_id ORDER BY c.day
       ) AS filled_value
FROM cal c LEFT JOIN daily d ON d.user_id = c.user_id AND d.day = c.day
"""


@register("ev_gap_fill_daily", _GAP_FILL_ORACLE, tags=("events", "window"),
          priority=100)
def ev_gap_fill_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Densify each user's daily activity to a full calendar (SQL
    generate_series analog: `sequence` + `explode`) and forward-fill the
    last known day_value across the gaps (`last(ignorenulls)` — Spark's
    IGNORE NULLS form).

    Scale shape: the calendar explode multiplies rows by span length but
    stays partition-local (explode is a narrow transform); the daily
    rollup is one shuffle on (user, day); the fill window partitions by
    user_id — per-user spans are calendar-bounded, so no skewed or
    global window. At 100 TB the dominant cost is the rollup shuffle,
    identical to ev_hourly_rollup's."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "user_id", F.date_trunc("day", F.col("ts")).cast("date").alias("day")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("day_value"),
        )
    )
    cal = (
        daily.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(
                F.sequence(F.col("d0"), F.col("d1"), F.expr("INTERVAL 1 DAY"))
            ).alias("day"),
        )
    )
    w = W.partitionBy("user_id").orderBy("day")
    return (
        cal.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            "day_value",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
        )
    )


# ------------------------------------------------------ CUBE aggregation --

_CUBE_ORACLE = """
SELECT event_type,
       CAST(date_trunc('day', ts) AS DATE) AS day,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY CUBE(event_type, CAST(date_trunc('day', ts) AS DATE))
"""


@register("ev_cube", _CUBE_ORACLE, tags=("events", "agg", "groupingsets"),
          priority=100)
def ev_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(event_type, day): all four grouping sets (type+day, type,
    day, grand total) in one pass — same single-scan grouping-set
    expansion as ev_rollup, completing the GROUPING SETS family."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    return (
        ev.select(F.col("event_type"), day, F.col("value"))
        .cube("event_type", "day")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


# ------------------------------------ stream == batch driver row ----
# r11: the §2.9 streaming surface as an ORACLED row, not just a pytest
# pin — the hourly rollup runs THROUGH Structured Streaming (file
# source -> watermarked tumbling window -> availableNow -> memory sink)
# and must hash to the plain batch GROUP BY. Complete output mode makes
# the final emission the full aggregate, so stream == batch exactly;
# count(DISTINCT) is structurally unsupported in streaming aggs, hence
# the count+sum shape (ev_hourly_rollup keeps the distinct-user batch
# form in the window).

_STREAM_ROLLUP_ORACLE = """
SELECT date_trunc('hour', ts) AS window_start, event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


@register(
    "stream_hourly_rollup",
    _STREAM_ROLLUP_ORACLE,
    tags=("events", "streaming", "flagship"),
    priority=100,
)
def stream_hourly_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming hourly rollup == the batch GROUP BY.

    Stages the canonicalized events as a file-source dir, runs the
    SAME windowed_rollup_stream the streaming module ships
    (streaming/events.py) under Trigger.AvailableNow with a memory
    sink, and returns the final complete-mode table. At scale this is
    the production shape: file-source backfill + watermarked tumbling
    windows, state bounded by the watermark delay; the memory sink is
    only the test harness' collector (production lands in the
    exactly-once table sink, streaming/driver.py)."""
    import shutil
    import tempfile
    import uuid as _uuid

    from odbc2deltalake_spark.streaming.events import windowed_rollup_stream

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value", "ts"
    )
    stage = tempfile.mkdtemp(prefix="stream_rollup_")
    name = f"stream_rollup_{_uuid.uuid4().hex[:8]}"
    try:
        ev.write.mode("overwrite").parquet(f"{stage}/events")
        stream = spark.readStream.schema(ev.schema).parquet(f"{stage}/events")
        rolled = windowed_rollup_stream(stream).withColumnRenamed(
            "total_value", "__tv"
        )
        q = (
            rolled.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()
        out = spark.table(name).select(
            "window_start",
            "event_type",
            "n_events",
            F.col("__tv").alias("total_value"),
        )
        return out.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(stage, ignore_errors=True)
