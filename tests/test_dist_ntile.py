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


def test_ntile_offsets_match_frozen_partitioning(spark):
    """r14 wave 12 internals pin: the driver-computed offsets describe
    the SAME materialized range partitioning the returned plan reads
    (the eager localCheckpoint guarantee). Two independent collects of
    one _dist_ntile frame must agree exactly — if the returned plan
    re-drew the range shuffle's sampling instead of reading the frozen
    checkpoint, per-partition local ranks would pair with stale offsets
    and tiles would drift between collects. Also pins completeness:
    every input row gets a tile in 1..n."""
    rows = [(i, (i * 17) % 7) for i in range(83)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(6)
    out = _dist_ntile(df, [F.col("v").asc(), F.col("k").asc()], "t", buckets=5)
    first = sorted(out.collect())
    second = sorted(out.collect())
    assert first == second
    assert len(first) == 83
    assert {r["t"] for r in first} == {1, 2, 3, 4, 5}
    # exact ntile sizes: the first N%n tiles carry one extra row
    from collections import Counter

    sizes = Counter(r["t"] for r in first)
    assert sorted(sizes.values(), reverse=True) == [17, 17, 17, 16, 16]


def test_shuffle_parallelism_non_numeric_conf_falls_back():
    """ADVICE r7: platforms where spark.sql.shuffle.partitions is 'auto'
    (AQE-managed) must not crash the bucket-count default — fall back to
    defaultParallelism, then to the hard default."""
    from odbc2deltalake_spark.session import shuffle_parallelism

    class _Conf:
        def __init__(self, val):
            self._val = val

        def get(self, key, default=None):
            return self._val if self._val is not None else default

    class _Ctx:
        defaultParallelism = 7

    class _Spark:
        def __init__(self, val, ctx=True):
            self.conf = _Conf(val)
            if ctx:
                self.sparkContext = _Ctx()

    assert shuffle_parallelism(_Spark("48")) == 48
    assert shuffle_parallelism(_Spark("auto")) == 7
    assert shuffle_parallelism(_Spark(None)) == 32  # conf default path
    assert shuffle_parallelism(_Spark("auto", ctx=False)) == 32


def test_dist_helpers_survive_auto_shuffle_conf(spark):
    """The live helpers route through shuffle_parallelism — exercised
    with an explicit bucket count since the real conf rejects 'auto'
    locally; parity with the fixed-32 behavior is pinned above."""
    rows = [(i, (i * 13) % 11) for i in range(40)]
    df = spark.createDataFrame(rows, "k long, v long")
    out = _dist_ntile(df, [F.col("v").asc(), F.col("k").asc()], "t", buckets=5)
    assert out.count() == 40
