"""Property-based checks for the corpus-construction operators.

Each property pins the operator's *defining invariant* on randomized
inputs — complementing the DuckDB oracle gates, which pin exact values on
the one fixture. Spark jobs per example are tiny (≤64 rows), so example
counts stay small to keep the suite fast.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F
from pyspark.sql import types as T

from odbc2deltalake_spark.streaming.corpus import (
    decontaminate,
    eval_gram_table,
    word_ngrams,
)

_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

_WORDS = ["alpha", "beta", "gamma", "delta", "omega", "sigma"]

_texts = st.lists(
    st.lists(st.sampled_from(_WORDS), min_size=0, max_size=14).map(" ".join),
    min_size=1,
    max_size=12,
)

_prop_settings = settings(
    max_examples=6,
    deadline=None,
    derandomize=True,
    suppress_health_check=list(HealthCheck),
)


@_prop_settings
@given(texts=_texts)
def test_shuffle_order_is_a_permutation_of_naive_rank(spark, texts):
    """The distributed rank (bucketed row_number + offsets) must equal the
    naive single-partition row_number over the same hash order, for any
    doc_id set."""
    from odbc2deltalake_spark.queries.corpus_ops import _SHUFFLE_SEED

    docs = spark.createDataFrame(
        [(i * 7 + 3, t) for i, t in enumerate(texts)], _DOC_SCHEMA
    )
    key = F.md5(F.concat(F.lit(_SHUFFLE_SEED), F.col("doc_id").cast("string")))
    naive = {
        r["doc_id"]: i + 1
        for i, r in enumerate(
            docs.select("doc_id", key.alias("k")).orderBy("k", "doc_id").collect()
        )
    }
    got = {r["doc_id"]: r["pos"] for r in _distributed_rank(docs).collect()}
    assert got == naive


def _distributed_rank(docs):
    """The exact bucket/offset algebra of corpus_shuffle_order, applied
    to an arbitrary (doc_id, ...) frame."""
    from pyspark.sql import Window as W

    from odbc2deltalake_spark.queries.corpus_ops import (
        _SHUFFLE_BUCKETS,
        _SHUFFLE_SEED,
    )

    key = F.md5(F.concat(F.lit(_SHUFFLE_SEED), F.col("doc_id").cast("string")))
    keyed = docs.select("doc_id", key.alias("k")).withColumn(
        "bucket",
        F.floor(
            F.conv(F.substring("k", 1, 2), 16, 10).cast("int")
            / F.lit(256 // _SHUFFLE_BUCKETS)
        ).cast("int"),
    )
    local = keyed.withColumn(
        "local_pos",
        F.row_number().over(W.partitionBy("bucket").orderBy("k", "doc_id")),
    )
    counts = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))
    offsets = counts.select(
        "bucket",
        F.sum("n")
        .over(W.orderBy("bucket").rowsBetween(W.unboundedPreceding, -1))
        .alias("offset"),
    ).fillna(0, subset=["offset"])
    return local.join(F.broadcast(offsets), "bucket").select(
        "doc_id", (F.col("offset") + F.col("local_pos")).cast("long").alias("pos")
    )


@_prop_settings
@given(texts=_texts, eval_idx=st.sets(st.integers(0, 11), max_size=4))
def test_decontaminate_survivors_share_no_gram_with_eval(spark, texts, eval_idx):
    """Defining invariant: after decontamination, NO surviving doc shares
    any word n-gram with the eval set — and every dropped doc shares at
    least one (nothing is over-dropped)."""
    docs = spark.createDataFrame(list(enumerate(texts)), _DOC_SCHEMA)
    eval_docs = docs.filter(F.col("doc_id").isin([i for i in eval_idx]) if eval_idx else F.lit(False))
    train = docs.join(eval_docs.select("doc_id"), "doc_id", "left_anti")
    grams = eval_gram_table(eval_docs)
    survivors = decontaminate(train, grams)

    eval_gram_set = {r["g"] for r in grams.collect()}
    surv_rows = survivors.select(
        "doc_id", word_ngrams().alias("gs")
    ).collect()
    for r in surv_rows:
        assert not (set(r["gs"]) & eval_gram_set), r
    dropped = train.join(survivors.select("doc_id"), "doc_id", "left_anti")
    for r in dropped.select("doc_id", word_ngrams().alias("gs")).collect():
        assert set(r["gs"]) & eval_gram_set, r


@_prop_settings
@given(texts=_texts)
def test_repetition_fractions_bounded_and_zero_iff_unique(spark, texts):
    """dup fractions live in [0, 1) and are zero exactly when the doc's
    words / 2-grams are all distinct."""
    docs = spark.createDataFrame(list(enumerate(texts)), _DOC_SCHEMA)
    w = F.split(F.trim(F.col("text")), " ")
    scored = docs.select("doc_id", "text", w.alias("w")).filter(F.size("w") >= 2)
    dup_word = 1.0 - F.size(F.array_distinct("w")) / F.size("w")
    rows = scored.select("doc_id", "text", F.round(dup_word, 4).alias("f")).collect()
    for r in rows:
        words = r["text"].strip().split(" ")
        assert 0.0 <= r["f"] < 1.0
        assert (r["f"] == 0.0) == (len(set(words)) == len(words))
