"""Distributed k-means over embedding columns — the clustering stage a
training-data pipeline uses for topic balancing, semantic dedup blocking,
and IVF coarse-quantizer fitting (`IvfIndex.build(centroids=...)`).

Deterministic by construction (no RNG): init = the k lowest vec_ids,
assignment = argmax cosine with ties to the lowest centroid id, update =
element-wise mean. Determinism is what makes the result reproducible
across reruns and testable against an independent numpy reference.

Scale shape (per iteration, corpus of N vectors x D dims):
- assignment is a PURE MAP: the k centroids are packed into a one-row
  array and broadcast; each vector takes its argmax via ``array_sort``
  over (-cos, cid) structs — zero shuffle of the corpus (same kernel as
  `IvfIndex._assign`, operators/ann_index.py:81-104).
- update is one shuffle of N*D (cid, dim, x) rows into k*D means, then a
  k-row regroup to rebuild the centroid arrays — partial aggregation
  makes the map-side combine absorb most of the N*D volume.
- the driver never holds the corpus; only the k x D centroid table moves
  between iterations (localCheckpoint per round keeps lineage flat, the
  same pattern as dedup_cluster's label propagation).

The reference has no clustering surface; this extends the engine's ANN
family (SURVEY.md §2-extensions) the same way IvfIndex does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(_dot(a, a))


def assign_cosine(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Nearest-centroid (max cosine) assignment as a zero-shuffle map.

    ``vectors``: (vec_id, v: array<double>); ``centroids``: (cid, cv).
    Returns (vec_id, v, cid). Ties break to the lowest cid via the
    struct sort order of (-cos, cid).

    r14 (guide §1.2 per-task work): the centroid norm is computed once
    per CENTROID inside the packed broadcast and the vector norm once
    per ROW before the score loop — the previous form re-evaluated both
    inside the per-centroid lambda, tripling the interpreted
    higher-order-function work per row (k*(dot+2 norms) -> k*dot +
    1 norm). Bit-identical scores: the retained expressions evaluate
    the same operations on the same values in the same order, only
    their (deterministic) results are reused instead of recomputed.
    """
    packed = centroids.agg(
        F.collect_list(
            F.struct(F.col("cid"), F.col("cv"), _norm(F.col("cv")).alias("nrm"))
        ).alias("cents")
    )

    def score(c):
        neg = -(_dot(F.col("v"), c["cv"]) / (F.col("_vn") * c["nrm"]))
        return F.struct(neg.alias("neg"), c["cid"].alias("cid"))

    best = F.element_at(F.array_sort(F.transform(F.col("cents"), score)), 1)
    return (
        vectors.withColumn("_vn", _norm(F.col("v")))
        .crossJoin(F.broadcast(packed))
        .select("vec_id", "v", best["cid"].alias("cid"))
    )


def fit_kmeans_centroids(
    vectors: DataFrame, k: int, iterations: int = 3
) -> DataFrame:
    """Lloyd's iterations with cosine assignment; returns (cid, cv).

    Init: the ``k`` lowest vec_ids (cid keeps that seed id — stable
    labels across iterations). A cell that loses all members drops out
    (its cid disappears), matching the numpy reference in tests.
    ``iterations`` is fixed rather than convergence-tested: each extra
    round costs one corpus pass, and coarse quantizers (the IVF use
    case) need few rounds — callers wanting convergence can compare
    successive centroid tables themselves.

    Measured alternative (kept for the record): computing the mean as D
    per-dimension ``sum(element_at(v, i))`` COLUMNS of one groupBy(cid)
    benchmarked ~60% slower at sf0.1 than this posexplode form — the
    65-expression aggregate pays more in codegen/eval than the explode
    costs, and the explode's (cid, d) hash aggregate already collapses
    to k*D rows per partition map-side, so the exchange volume is the
    same either way.
    """
    cent = (
        vectors.orderBy("vec_id")
        .limit(k)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        assigned = assign_cosine(vectors.select("vec_id", "v"), cent)
        dims = assigned.select("cid", F.posexplode("v").alias("d", "x"))
        cent = (
            dims.groupBy("cid", "d")
            .agg(F.avg("x").alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "m"))),
                    lambda s: s["m"],
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    return cent


def kmeans_summary(vectors: DataFrame, centroids: DataFrame) -> DataFrame:
    """Final cluster summary: (cid, n_members, avg_cos) — membership
    counts and mean member-to-centroid cosine (rounded for cross-run
    stability). One map (assignment) + one shuffle (per-cid agg)."""
    assigned = assign_cosine(vectors.select("vec_id", "v"), centroids)
    # r14: same norm hoisting as assign_cosine — the centroid norm rides
    # the broadcast join row (one eval per centroid), the vector norm is
    # projected once per row; identical doubles, ~3x less HOF work
    cents_n = centroids.withColumn("_cn", _norm(F.col("cv")))
    cos = (
        assigned.withColumn("_vn", _norm(F.col("v")))
        .join(F.broadcast(cents_n), "cid")
        .select(
            "cid",
            (_dot(F.col("v"), F.col("cv")) / (F.col("_vn") * F.col("_cn"))).alias("c"),
        )
    )
    return cos.groupBy("cid").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.round(F.avg("c"), 3).alias("avg_cos"),
    )


def semantic_dedup(
    vectors: DataFrame,
    k: int,
    threshold: float = 0.97,
    iterations: int = 2,
) -> DataFrame:
    """SemDeDup (Abbas et al.): drop near-identical embeddings WITHIN
    k-means clusters. Returns (vec_id, cid, keep) — ``keep`` is false
    for every vector whose cluster contains a kept vector with cosine
    >= threshold and a lower vec_id (greedy lowest-id-first, the
    deterministic variant of the paper's random keeper).

    Scale shape: clustering makes the quadratic part tractable — the
    pairwise cosine check runs per CLUSTER inside applyInPandas (one
    Arrow-batched numpy kernel per cluster, one shuffle on cid), so
    cost is sum over clusters of |cluster|^2 instead of N^2. Cluster
    sizes are bounded by choosing k ~ N/target_cluster_size; skewed
    clusters are the operator's known failure mode (same mitigation as
    IVF: re-fit with more centroids when staleness/skew bounds trip)."""
    import pandas as pd  # noqa: F401 (applyInPandas contract)

    cent = fit_kmeans_centroids(vectors, k, iterations)
    assigned = assign_cosine(vectors.select("vec_id", "v"), cent)

    def prune(pdf):
        import numpy as np

        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        X = np.array(list(pdf["v"]), dtype=np.float64)
        Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
        n = len(pdf)
        keep = [True] * n
        for i in range(n):
            if not keep[i]:
                continue
            if i + 1 < n:
                sims = Xn[i + 1 :] @ Xn[i]
                for j, s in enumerate(sims, start=i + 1):
                    if keep[j] and s >= threshold:
                        keep[j] = False
        return pdf.assign(keep=keep)[["vec_id", "cid", "keep"]]

    return assigned.groupBy("cid").applyInPandas(
        prune, "vec_id long, cid long, keep boolean"
    )
