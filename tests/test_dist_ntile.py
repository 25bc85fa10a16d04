"""_dist_ntile (events_ext.py): exact ntile(n) parity without the
single-partition Window — bit-identical tile assignment for every N
(even/uneven division), tie-heavy keys, descending orders, and N < n."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from odbc2deltalake_spark.queries.events_ext import _dist_ntile


def _parity(spark, rows, order_cols, n):
    df = spark.createDataFrame(rows, "k long, v long").repartition(8)
    want = df.select(
        "k", F.ntile(n).over(W.orderBy(*order_cols)).alias("t")
    )
    got = _dist_ntile(df, order_cols, "t", n=n, buckets=5).select("k", "t")
    assert sorted(got.collect()) == sorted(want.collect())


@pytest.mark.parametrize("N", [1, 2, 4, 5, 7, 23, 100, 101, 104])
def test_ntile_parity_uneven_sizes(spark, N):
    rows = [(i, i * 7 % 13) for i in range(N)]
    _parity(spark, rows, [F.col("v").asc(), F.col("k").asc()], 5)


def test_ntile_parity_desc_and_ties(spark):
    # heavy ties on v — total order restored by the k tiebreak
    rows = [(i, i % 3) for i in range(37)]
    _parity(spark, rows, [F.col("v").desc(), F.col("k").asc()], 5)


def test_ntile_parity_other_n(spark):
    rows = [(i, (i * 31) % 17) for i in range(50)]
    _parity(spark, rows, [F.col("v").asc(), F.col("k").asc()], 4)
    _parity(spark, rows, [F.col("v").asc(), F.col("k").asc()], 7)


def test_dist_helpers_empty_input(spark):
    """Empty frames flow through the distributed ntile / prefix-sum
    machinery (empty histogram -> empty offsets -> empty join)."""
    from odbc2deltalake_spark.queries.corpus_ops import _dist_exclusive_prefix

    df = spark.createDataFrame([], "k long, v long")
    assert _dist_ntile(df, [F.col("v").asc(), F.col("k").asc()], "t").count() == 0
    assert (
        _dist_exclusive_prefix(
            df, [F.col("k").asc()], "v", "off"
        ).count() == 0
    )
