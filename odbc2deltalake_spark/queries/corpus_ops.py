"""Corpus-construction operators: the sampling / quota / packing stages
between cleaning and training that a large-scale pretraining pipeline
runs after dedup and quality filtering.

All three are deterministic by construction (hash-ordered, not RNG-
seeded), which is what makes a 100 TB corpus build *reproducible* — the
same property the engine's SCD2 side gets from monotonic watermarks —
and what makes them oracle-able here: DuckDB computes the identical md5
orderings. Registered as overflow (priority>=100): driver's 50-slot
window is full of non-redundant shapes; these are pytest-oracle-gated in
tests/test_correctness_extras.py like the other overflow entries.

Scale notes per operator in the docstrings; none is worse than one
shuffle, and the sample is shuffle-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from odbc2deltalake_spark.queries.registry import load_table, register

# A stable per-doc uniform in [0, 10^6): the first 12 hex chars of
# md5(doc_id) mod 10^6. 12 hex chars = 48 bits, exact in BIGINT on both
# engines; doc_id renders identically as decimal text in both.
_HASH_MOD = 1_000_000


def _doc_hash_spark():
    return (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        % _HASH_MOD
    )


_DOC_HASH_SQL = (
    "('0x' || substr(md5(doc_id::VARCHAR), 1, 12))::BIGINT % 1000000"
)


# ------------------------------------------------------ hash sampling ----

_SAMPLE_PCT = 5  # keep 5%

_SAMPLE_ORACLE = f"""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE {_DOC_HASH_SQL} < {_SAMPLE_PCT * _HASH_MOD // 100}
"""


@register("corpus_hash_sample", _SAMPLE_ORACLE, tags=("corpus",), priority=100)
def corpus_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic Bernoulli sample: keep a doc iff its md5-derived
    uniform falls under the rate. Unlike ``df.sample()`` (seeded RNG per
    partition → resplit changes membership), hash sampling is a pure
    per-row predicate: membership survives repartitioning, reruns, and
    engine changes, and subsets nest (a 1% sample is a subset of the 5%
    sample). Shuffle-free single scan; at 100 TB this is the cheapest
    possible sample."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        _doc_hash_spark() < _SAMPLE_PCT * _HASH_MOD // 100
    ).select("doc_id", "lang", "source", "n_chars")


# ---------------------------------------------------- mixture sampling ----

# Target acceptance rate per language — the "mixture weights" knob of a
# pretraining data recipe (upsample scarce languages, downsample dominant
# ones). Unlisted languages fall back to the default rate.
_MIXTURE_RATES = {"en": 80, "de": 40, "fr": 40, "zh": 20}  # percent
_MIXTURE_DEFAULT = 10

_MIXTURE_CASE_SQL = "CASE lang " + " ".join(
    f"WHEN '{lang}' THEN {pct * _HASH_MOD // 100}"
    for lang, pct in sorted(_MIXTURE_RATES.items())
) + f" ELSE {_MIXTURE_DEFAULT * _HASH_MOD // 100} END"

_MIXTURE_ORACLE = f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_DOC_HASH_SQL} < {_MIXTURE_CASE_SQL}
"""


@register("corpus_mixture_sample", _MIXTURE_ORACLE, tags=("corpus",), priority=100)
def corpus_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted mixture sampling: each stratum (language) is kept at its
    own target rate against the SAME per-doc hash uniform — the
    deterministic equivalent of ``df.sampleBy``, with the hash sampler's
    properties (reproducible, repartition-proof, nested: lowering a rate
    keeps a subset of the previous sample, so recipe iterations only
    shrink monotonically). Still a shuffle-free single scan — the rate
    lookup is a CASE expression, not a join."""
    docs = load_table(spark, sf_dir, "documents")
    threshold = F.lit(_MIXTURE_DEFAULT * _HASH_MOD // 100)
    for lang, pct in sorted(_MIXTURE_RATES.items(), reverse=True):
        threshold = F.when(
            F.col("lang") == lang, F.lit(pct * _HASH_MOD // 100)
        ).otherwise(threshold)
    return docs.filter(_doc_hash_spark() < threshold).select(
        "doc_id", "lang", "source"
    )


# ------------------------------------------------------- source quota ----

_QUOTA_K = 50  # max docs kept per source

_QUOTA_ORACLE = f"""
WITH ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           ORDER BY {_DOC_HASH_SQL}, doc_id
         ) AS pick_order,
         row_number() OVER (
           PARTITION BY source ORDER BY {_DOC_HASH_SQL}, doc_id
         ) AS rk
  FROM documents
)
SELECT doc_id, source, rk FROM ranked WHERE rk <= {_QUOTA_K}
"""


@register("corpus_source_quota", _QUOTA_ORACLE, tags=("corpus",), priority=100)
def corpus_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping — bound any one domain/source's share of
    the corpus (the anti-overrepresentation stage: one crawl domain must
    not dominate training data). Selection within a source is by the
    same deterministic hash order as the sampler, so the kept set is
    reproducible and unbiased by ingestion order.

    One shuffle (window partitioned by source). Hot sources skew the
    partition; AQE splits them, and because only rank <= K survives, a
    skewed source's excess is discarded at the window, never joined."""
    docs = load_table(spark, sf_dir, "documents")
    h = _doc_hash_spark().alias("__h")
    ranked = docs.select("doc_id", "source", h).withColumn(
        "rk",
        F.row_number().over(
            W.partitionBy("source").orderBy(F.col("__h"), F.col("doc_id"))
        ),
    )
    return ranked.filter(F.col("rk") <= _QUOTA_K).select("doc_id", "source", "rk")


# ------------------------------------------------------- bin packing -----

_BIN_TOKENS = 2048  # target tokens per training bin

_PACK_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, lang,
         len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents
),
packed AS (
  SELECT doc_id, lang, n_tokens,
         CAST(FLOOR(
           (SUM(n_tokens) OVER (
              PARTITION BY lang ORDER BY doc_id
              ROWS UNBOUNDED PRECEDING
            ) - n_tokens) / {_BIN_TOKENS}.0
         ) AS BIGINT) AS bin
  FROM toks
)
SELECT lang, bin,
       count(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
FROM packed
GROUP BY lang, bin
"""


@register("corpus_pack_bins", _PACK_ORACLE, tags=("corpus",), priority=100)
def corpus_pack_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign docs to fixed-token-budget training bins
    (next-fit by running token count over a deterministic per-language
    order) and emit per-bin occupancy. The whitespace token estimate
    matches ``text_token_count``'s semantics exactly.

    The running sum uses each doc's *preceding* total, so a doc goes in
    the bin that was open when it arrived — next-fit, the streaming-
    friendly packing. Two shuffles (window by lang, then the bin agg);
    the window never materializes more than a partition, and at 100 TB
    the order key (doc_id) would be (shard, doc_id) so each shard packs
    independently."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        "lang",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("n_tokens"),
    )
    cum = F.sum("n_tokens").over(
        W.partitionBy("lang").orderBy("doc_id").rowsBetween(W.unboundedPreceding, 0)
    )
    packed = toks.withColumn(
        "bin",
        F.floor((cum - F.col("n_tokens")) / F.lit(float(_BIN_TOKENS))).cast("long"),
    )
    return packed.groupBy("lang", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("bin_tokens"),
    )
