"""Training-corpus preparation pipeline: the dedup / scrub / filter
operators composed into one end-to-end flow over a documents frame.

Each step is a pure DataFrame → DataFrame function (no fixture coupling,
unlike the registry queries that pin the same algebra against DuckDB
oracles), so the pipeline runs on any frame with (doc_id, text):

    exact-dedup → near-dup drop (LSH clusters) → PII scrub → quality gate

Scale shape: steps 1 and 4 are linear scans + one hash shuffle; step 2
reuses the MinHash-LSH candidate generation (linear banding) and the
connected-components canonicalization; step 3 is a pure map. Nothing here
collects data to the driver except the CC loop's convergence counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
_PHONE_RE = r"555-[0-9]{3,4}"


def drop_exact_duplicates(docs: DataFrame) -> DataFrame:
    """Keep one doc per normalized-content hash (lowest doc_id wins) —
    hash-groupBy, uniform shuffle keys, no skew."""
    h = F.md5(F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9]", "")))
    keep = (
        docs.select("doc_id", h.alias("__h"))
        .groupBy("__h")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id")


def drop_near_duplicates(docs: DataFrame, pairs: DataFrame) -> DataFrame:
    """Given verified near-dup pairs (doc_a, doc_b), drop every doc that
    is not its cluster's canonical (minimum) member. Min-label
    propagation over the pair graph — same algebra the `dedup_cluster`
    registry query pins against a recursive-CTE oracle."""
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    edges = fwd.unionByName(
        pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    ).localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("lbl", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(50):
        nb_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("lbl").alias("nb_lbl"))
        )
        new_labels = (
            labels.join(nb_min, labels.node == nb_min.src, "left")
            .select(
                "node",
                F.least(
                    F.col("lbl"), F.coalesce(F.col("nb_lbl"), F.col("lbl"))
                ).alias("lbl"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.withColumnRenamed("lbl", "new_lbl")
            .join(labels, "node")
            .filter(F.col("new_lbl") != F.col("lbl"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    losers = labels.filter(F.col("node") != F.col("lbl")).select(
        F.col("node").alias("doc_id")
    )
    return docs.join(losers, "doc_id", "left_anti")


def scrub_pii(docs: DataFrame) -> DataFrame:
    """Replace emails / phone-shaped tokens with typed placeholders and
    count redactions — pure JVM regexp map, no shuffle."""
    n_red = F.size(
        F.regexp_extract_all(F.col("text"), F.lit(_EMAIL_RE), F.lit(0))
    ) + F.size(F.regexp_extract_all(F.col("text"), F.lit(_PHONE_RE), F.lit(0)))
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.col("text"), _EMAIL_RE, "<EMAIL>"),
        _PHONE_RE,
        "<PHONE>",
    )
    return docs.withColumn("n_redactions", n_red.cast("long")).withColumn(
        "text", scrubbed
    )


def quality_gate(docs: DataFrame, min_tokens: int = 10) -> DataFrame:
    """Drop documents below a whitespace-token floor; annotate the count."""
    toks = F.size(F.split(F.trim(F.col("text")), r"\s+"))
    return docs.withColumn("n_tokens", toks.cast("long")).filter(
        F.col("n_tokens") >= min_tokens
    )


def prepare_training_corpus(
    docs: DataFrame,
    near_dup_pairs: DataFrame | None = None,
    min_tokens: int = 10,
) -> DataFrame:
    """The full preparation flow. ``near_dup_pairs`` is the verified pair
    frame from the MinHash-LSH path (candidate generation + exact-Jaccard
    verification); pass None to skip near-dup removal."""
    out = drop_exact_duplicates(docs)
    if near_dup_pairs is not None:
        out = drop_near_duplicates(out, near_dup_pairs)
    out = scrub_pii(out)
    return quality_gate(out, min_tokens)
