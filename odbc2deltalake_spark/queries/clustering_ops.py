"""Embedding-clustering registry entries (distributed k-means).

Registered rows-only (no cross-engine SQL oracle): k-means is iterative
and its fixed-point depends on float summation order, so a DuckDB
recursive-CTE twin would pin brittle last-ulp behavior instead of the
algorithm. The quantitative gates live in tests/test_clustering.py: an
independent numpy implementation must reproduce the assignments and
centroids, and inertia must improve monotonically over iterations —
a stronger check than a value-hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.clustering import (
    fit_kmeans_centroids,
    kmeans_summary,
)
from odbc2deltalake_spark.queries.registry import load_table, register

_K = 8
_ITERS = 3


def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select("vec_id", dbl.alias("v"))


@register("emb_kmeans", None, tags=("clustering", "similarity"), priority=100)
def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means cluster summary over the embeddings table: (cid,
    n_members, avg_cos) after 3 deterministic Lloyd's iterations with
    k=8 lowest-id seeds. See operators/clustering.py for the scale
    shape (zero-shuffle assignment, one N*D shuffle per update)."""
    vectors = _corpus(spark, sf_dir)
    cent = fit_kmeans_centroids(vectors, _K, _ITERS)
    return kmeans_summary(vectors, cent)
