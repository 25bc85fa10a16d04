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
    """r12 oracled shape: the row emits the EXACT countDistinct (pinned
    here against an independent aggregation) plus the in-frame verdict
    that the HLL estimate sat within the 10% / ±2 envelope."""
    rows = approx_user_cardinality(spark, SF_DIR).collect()
    assert rows
    got = {r["event_type"]: r["exact_users"] for r in rows}
    for r in rows:
        assert r["sketch_within_bound"] is True, r
    exact = {
        r["event_type"]: r["n"]
        for r in load_table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert got == exact


def test_percentiles_within_rank_error(spark):
    """r12 oracled shape: the query emits EXACT interpolated percentiles
    (pinned here against a local numpy-free exact computation) plus the
    in-frame verdict that the sketch estimates sat within the published
    rank-error bound — which must be true for every group."""
    rows = approx_value_percentiles(spark, SF_DIR).collect()
    assert rows, "no groups"
    for r in rows:
        assert r["sketch_within_rank_error"] is True, r

    ev = load_table(spark, SF_DIR, "events")
    for r in rows:
        vals = sorted(
            x["value"]
            for x in ev.filter(F.col("event_type") == r["event_type"]).collect()
        )
        n = len(vals)
        assert r["n_values"] == n
        for q, got in (
            (0.5, r["p50_exact"]),
            (0.9, r["p90_exact"]),
            (0.99, r["p99_exact"]),
        ):
            pos = q * (n - 1)
            lo = vals[int(pos)]
            hi = vals[min(int(pos) + 1, n - 1)]
            want = lo + (pos - int(pos)) * (hi - lo)
            assert abs(got - want) < 1e-3, (r["event_type"], q, got, want)


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


def test_count_min_bounds_and_merge(spark):
    """CMS invariants: estimates never undercount; overcount bounded by
    eps*N (eps = e/width, here with a generous safety factor since N is
    small); and two half-corpus sketches merged equal the full sketch."""
    from pyspark.sql import functions as F

    from odbc2deltalake_spark.queries.registry import load_table
    from odbc2deltalake_spark.queries.sketch_ops import (
        _CMS_WIDTH,
        cms_estimate,
        count_min_sketch,
    )

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).localCheckpoint(eager=True)
    n_total = toks.count()
    true = {
        r["w"]: r["c"]
        for r in toks.groupBy("w").agg(F.count(F.lit(1)).alias("c")).collect()
    }

    sketch = count_min_sketch(toks, "w").localCheckpoint(eager=True)
    est = {
        r["w"]: r["est"]
        for r in cms_estimate(sketch, toks.select("w"), "w").collect()
    }
    assert set(est) == set(true)
    eps = 2.72 / _CMS_WIDTH
    for w, t in true.items():
        assert est[w] >= t, w  # never undercounts
        assert est[w] <= t + eps * n_total * 3, w  # bounded overcount

    # mergeability: sketch(half1) + sketch(half2) == sketch(all)
    h1 = count_min_sketch(toks.filter(F.col("doc_id") % 2 == 0), "w")
    h2 = count_min_sketch(toks.filter(F.col("doc_id") % 2 == 1), "w")
    merged = (
        h1.unionByName(h2)
        .groupBy("row", "col")
        .agg(F.sum("cnt").alias("cnt"))
    )
    a = {(r["row"], r["col"]): r["cnt"] for r in merged.collect()}
    b = {(r["row"], r["col"]): r["cnt"] for r in sketch.collect()}
    assert a == b
