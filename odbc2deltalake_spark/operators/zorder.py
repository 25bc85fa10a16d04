"""Z-order (Morton-curve) data layout for multi-dimensional scan pruning.

Parquet pruning is one-dimensional: row-group min/max stats only help on
columns the file happens to be sorted by. A lakehouse table queried on
BOTH `user_id` and `ts` (point lookups + time ranges) can't serve both
from a single-column sort. Z-ordering interleaves the bits of
range-bucketed column values into one clustering key; sorting files by
that key gives every participating column locally-narrow min/max spans,
so predicates on ANY of them prune row groups (the same layout contract
as Delta Lake's OPTIMIZE ZORDER BY).

Mechanics, all scale-clean:

1. Per column, compute `buckets` range boundaries with `approxQuantile`
   — a sampled, driver-side-tiny control read (this is exactly how
   Spark's own RangePartitioning sizes its ranges). Quantile boundaries,
   not (min,max) splits, so skewed distributions still fill buckets
   uniformly.
2. Map each value to its bucket with a fold over the broadcast boundary
   array (`F.aggregate` over ≤64 literals — JVM, no Python, no shuffle).
3. Interleave the bucket bits into the Morton key with shift/or
   expressions.
4. `repartitionByRange(zkey).sortWithinPartitions(zkey)` — one range
   shuffle, each output file covers a compact Z-curve segment.

The result is a plain DataFrame: feed it to `VersionedParquetTable.write`
(or any sink) with the sort order intact. Rewriting cold data into
Z-order is the compaction-time analog of OPTIMIZE — pair with
`vacuum` to retire the unclustered predecessors.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from odbc2deltalake_spark.functions.litarray import double_array_lit

_DEFAULT_BUCKETS = 64  # 6 bits per dimension


def _numeric_proxy(df: DataFrame, col: str) -> Column:
    """Order-preserving numeric proxy for any column type. Numeric and
    timestamp types cast to double directly; dates go through epoch
    days. String/binary/other types hash (xxhash64 → double): equal
    values still cluster — point-lookup pruning on that dimension works
    — but RANGE predicates on a hashed dimension cannot prune, which is
    exactly Delta's behavior for Z-order over strings. The old code
    cast strings to double, silently producing all-NULLs and collapsing
    the dimension to bucket 0 with no clustering at all."""
    from pyspark.sql import types as T

    dt = df.schema[col].dataType
    if isinstance(dt, (T.NumericType, T.BooleanType)):
        return F.col(col).cast("double")
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return F.col(col).cast("double")
    if isinstance(dt, T.DateType):
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    return F.xxhash64(F.col(col)).cast("double")


def _bucket_expr(c: Column, boundaries: list[float]) -> Column:
    """Bucket index of the proxy value in the sorted ``boundaries``
    list: the count of boundaries <= value — a fold over a literal
    array, evaluated JVM-side per row. NULLs sort to bucket 0 (first,
    like NULLS FIRST)."""
    arr = double_array_lit(boundaries)
    return F.when(c.isNull(), F.lit(0)).otherwise(
        F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(c >= b, 1).otherwise(0),
        )
    )


def _interleave_bits(bucket_cols: list[Column], bits: int) -> Column:
    """Morton interleave: output bit (i*k + j) = bit i of column j."""
    k = len(bucket_cols)
    pieces = []
    for j, bc in enumerate(bucket_cols):
        b = bc.cast("long")
        for i in range(bits):
            pieces.append(
                F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), i * k + j)
            )
    return reduce(lambda a, x: a.bitwiseOR(x), pieces)


def zorder_layout(
    df: DataFrame,
    cols: list[str],
    buckets: int = _DEFAULT_BUCKETS,
    relative_error: float = 0.01,
    out_partitions: int | None = None,
) -> DataFrame:
    """Cluster ``df`` on the Z-curve over ``cols``.

    Returns the frame range-partitioned and sorted by the Morton key of
    the columns' quantile buckets (key column dropped — layout is carried
    by the partitioning/sort, exactly what parquet writers persist into
    row-group stats). One sampled quantile pass + one range shuffle.
    """
    if not cols:
        raise ValueError("zorder_layout requires at least one column")
    bits = max(1, (buckets - 1).bit_length())
    # interior quantile boundaries (exclude the 0-quantile so the lowest
    # values land in bucket 0)
    probs = [i / buckets for i in range(1, buckets)]
    proxies = {c: _numeric_proxy(df, c) for c in cols}
    numeric = df.select(*[proxies[c].alias(c) for c in cols])
    all_bounds = numeric.stat.approxQuantile(cols, probs, relative_error)
    bucket_exprs = []
    for c, bounds in zip(cols, all_bounds):
        uniq = sorted(set(bounds))
        if not uniq:
            bucket_exprs.append(F.lit(0))
            continue
        # Scale each dimension's bucket rank to the FULL bit width: a
        # low-cardinality column yields fewer distinct boundaries, and
        # without rescaling its permanently-zero high bits would demote
        # it below every full-width dimension in the interleaved key
        # (degenerating the Z-curve into a single-column sort).
        nb = len(uniq) + 1
        raw = _bucket_expr(proxies[c], uniq)
        bucket_exprs.append(
            F.floor((raw.cast("long") * F.lit(1 << bits)) / F.lit(nb)).cast("long")
        )
    zkey = _interleave_bits(bucket_exprs, bits).alias("__zkey")
    keyed = df.withColumn("__zkey", zkey)
    n = out_partitions or df.sparkSession.sparkContext.defaultParallelism
    return (
        keyed.repartitionByRange(n, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
    )
