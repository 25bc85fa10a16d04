"""Sketch-based approximate aggregation — the scale substitutes for
exact distinct-count and percentile shuffles.

At 100 TB, `countDistinct` is a full shuffle of every distinct key and
an exact percentile is a global sort; the sketch versions are map-side
combinable (HyperLogLog++ registers / KLL-style quantile summaries merge
associatively), so the shuffle moves kilobytes per partition instead of
the column. Spark ships both as built-in JVM aggregates —
`approx_count_distinct` and `percentile_approx` — no UDFs involved.

DuckDB's HLL/quantile/CMS layouts differ from Spark's, so raw sketch
outputs can't be cross-engine hashed. All three rows are oracled anyway
(r12): each emits EXACT companion columns (percentiles / countDistinct
/ top-20 true counts — DuckDB recomputes those) and folds the sketch's
published error-bound check into the hashed output as a boolean — the
sketch runs, the exact math is hashed, and the error contract is part
of the hash. The corpus-wide quantitative gate stays
tests/test_sketch_accuracy.py, which pins each sketch against the exact
computation within its published error bound. (The exact companions
are themselves full shuffles — at 100 TB the production call is the
sketch alone; these rows are its verification harness.)

PROBABILISTIC-BOUND CAVEAT (ADVICE r12): HLL's 2% band and CMS's
eps/delta guarantee hold only with high probability — the booleans are
deterministic TODAY because the fixtures, seeds, and sketch widths are
pinned (HLL rsd=0.02 over these corpora measures <=0.7% error in
tests/test_sketch_accuracy.py; the CMS check uses the one-sided
overcount bound with eps sized ~10x the observed error). If a FUTURE
fixture/seed/width change flips one of these booleans, read it as the
sketch landing in its published low-probability tail — re-derive the
bound or widen the sketch — NOT as an engine correctness regression;
the exact companion columns in the same row tell the two apart
immediately (they hash independently of the boolean).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2deltalake_spark.queries.registry import load_table, register

_RSD = 0.02  # target relative standard deviation for HLL++
_PERC_ACC = 10_000  # percentile_approx accuracy knob (1/accuracy rank error)


_APPROX_CARD_ORACLE = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       TRUE AS sketch_within_bound
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("approx_user_cardinality", _APPROX_CARD_ORACLE, tags=("sketch",),
          priority=100)
def approx_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via HyperLogLog++ (rsd=2%), ORACLED
    (r12, the approx_value_percentiles recipe): the HLL sketch runs —
    partial aggregation merges registers map-side, the shuffle carries
    one sketch per (partition, event_type) regardless of user
    cardinality — and the SAME aggregation computes the exact
    countDistinct companion; the emitted row carries the exact count
    plus an in-frame boolean asserting |est − exact| within the
    deterministic-in-practice 10% / ±2 envelope
    tests/test_sketch_accuracy.py pins. A hash mismatch means either
    the exact math or the sketch's error contract broke. (The exact
    companion is itself a full distinct shuffle — at 100 TB the
    production call is the sketch alone; this row is its verification
    harness.)"""
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=_RSD).alias("est"),
        F.countDistinct("user_id").alias("exact_users"),
    )
    bound = F.greatest(F.lit(2.0), 0.10 * F.col("exact_users"))
    return agg.select(
        "event_type",
        "exact_users",
        (F.abs(F.col("est") - F.col("exact_users")) <= bound).alias(
            "sketch_within_bound"
        ),
    ).orderBy("event_type")


_APPROX_PCT_ORACLE = """
SELECT event_type,
       count(*) AS n_values,
       round(quantile_cont(value, 0.5), 4) AS p50_exact,
       round(quantile_cont(value, 0.9), 4) AS p90_exact,
       round(quantile_cont(value, 0.99), 4) AS p99_exact,
       TRUE AS sketch_within_rank_error
FROM events
GROUP BY event_type
ORDER BY event_type
"""


@register("approx_value_percentiles", _APPROX_PCT_ORACLE, tags=("sketch",),
          priority=100)
def approx_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 of event value per event type via the built-in
    approximate percentile aggregate (rank error <= 1/accuracy), now
    ORACLED (r12, VERDICT r11 #3) via exact companion columns: the
    sketch runs, its estimates are verified IN-FRAME to sit within the
    published rank-error bound of the true distribution (count of
    values <= estimate vs p*n, slack eps*n+1), and the emitted row
    carries the EXACT interpolated percentiles (deterministic, so
    DuckDB's quantile_cont recomputes them) plus the per-group
    bound-check boolean — a hash mismatch now means either the exact
    math or the sketch's error contract broke. The exact twin sorts per
    group; the sketch merges bounded summaries — the only option when a
    group's values exceed executor memory."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")
    p = F.percentile_approx("value", [0.5, 0.9, 0.99], _PERC_ACC)
    approx = ev.groupBy("event_type").agg(
        p[0].alias("a50"), p[1].alias("a90"), p[2].alias("a99")
    )
    # one pass over events with the (tiny: one row per event type)
    # sketch results broadcast: exact percentiles + the rank of each
    # sketch estimate, in the same aggregation
    joined = ev.join(F.broadcast(approx), "event_type")
    exact = F.percentile("value", F.array(F.lit(0.5), F.lit(0.9), F.lit(0.99)))
    agg = joined.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_values"),
        exact.alias("ex"),
        F.sum((F.col("value") <= F.col("a50")).cast("long")).alias("le50"),
        F.sum((F.col("value") < F.col("a50")).cast("long")).alias("lt50"),
        F.sum((F.col("value") <= F.col("a90")).cast("long")).alias("le90"),
        F.sum((F.col("value") < F.col("a90")).cast("long")).alias("lt90"),
        F.sum((F.col("value") <= F.col("a99")).cast("long")).alias("le99"),
        F.sum((F.col("value") < F.col("a99")).cast("long")).alias("lt99"),
    )

    def _ok(pq: float, le: str, lt: str):
        # percentile_approx guarantees an element whose rank r satisfies
        # |r - p*n| <= eps*n; the estimate's rank interval is
        # [lt+1, le], so the bound holds iff that interval intersects
        # [p*n - eps*n - 1, p*n + eps*n + 1] (unit slack for the
        # floor/ceil of fractional target ranks)
        slack = F.col("n_values") / _PERC_ACC + F.lit(1.0)
        target = F.lit(pq) * F.col("n_values")
        return (F.col(lt) + 1 <= target + slack) & (
            F.col(le) >= target - slack
        )

    return agg.select(
        "event_type",
        "n_values",
        F.round(F.col("ex")[0], 4).alias("p50_exact"),
        F.round(F.col("ex")[1], 4).alias("p90_exact"),
        F.round(F.col("ex")[2], 4).alias("p99_exact"),
        (
            _ok(0.5, "le50", "lt50")
            & _ok(0.9, "le90", "lt90")
            & _ok(0.99, "le99", "lt99")
        ).alias("sketch_within_rank_error"),
    ).orderBy("event_type")


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


_HEAVY_ORACLE = """
WITH c AS (
  SELECT w, count(*) AS cnt
  FROM (SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
        FROM documents)
  GROUP BY w
)
SELECT w, cnt, TRUE AS cms_within_bound
FROM c
ORDER BY cnt DESC, w
LIMIT 20
"""


@register("approx_heavy_hitters", _HEAVY_ORACLE, tags=("sketch",),
          priority=100)
def approx_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 words of the documents corpus, ORACLED (r12, the
    approx_value_percentiles recipe): the count-min sketch builds (one
    constant-size shuffle — at most depth*width counters regardless of
    corpus size) and probes every candidate; the emitted rows are the
    EXACT top-20 (deterministic count + word tiebreak, DuckDB
    recomputes them) carrying an in-frame boolean that each word's CMS
    estimate satisfied the published contract — never undercounts,
    overcount <= eps*N with eps = e/width (the bound
    tests/test_sketch_accuracy.py pins corpus-wide)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).localCheckpoint(eager=False)
    n_total = toks.count()
    sketch = count_min_sketch(toks, "w").localCheckpoint(eager=False)
    true_counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    est = cms_estimate(sketch, true_counts.select("w"), "w")
    eps_n = 2.72 / _CMS_WIDTH * n_total
    ok = (F.col("est") >= F.col("cnt")) & (
        F.col("est") <= F.col("cnt") + F.lit(eps_n)
    )
    return (
        true_counts.join(est, "w")
        .select("w", "cnt", ok.alias("cms_within_bound"))
        .orderBy(F.col("cnt").desc(), "w")
        .limit(20)
    )
