"""Distributed k-means gates: the Spark implementation must reproduce an
independent numpy reference exactly (same deterministic init / cosine
argmax / mean update), improve inertia monotonically, and plug into
IvfIndex as a fitted coarse quantizer."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.clustering import (
    assign_cosine,
    fit_kmeans_centroids,
    kmeans_summary,
)
from odbc2deltalake_spark.queries.registry import load_table

SF_DIR = "/root/testdata/sf0.001"
K = 8


@pytest.fixture(scope="module")
def corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select("vec_id", dbl.alias("v")).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def np_corpus(corpus):
    rows = sorted(corpus.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["v"] for r in rows], dtype=np.float64)
    return ids, X


def _np_kmeans(ids, X, k, iterations):
    """Independent reference: lowest-id init, argmax cosine with ties to
    the lowest cid, element-wise mean update, empty cells dropped."""
    order = np.argsort(ids)
    cids = ids[order[:k]]
    C = X[order[:k]].copy()
    Xn = X / np.linalg.norm(X, axis=1, keepdims=True)
    for _ in range(iterations):
        Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
        cos = Xn @ Cn.T
        # argmax with ties to lowest cid: sort keys (-cos, cid)
        best = np.lexsort((cids[None, :].repeat(len(X), 0), -cos), axis=1)[:, 0]
        assign = cids[best]
        keep, C_new = [], []
        for i, c in enumerate(cids):
            members = X[assign == c]
            if len(members):
                keep.append(i)
                C_new.append(members.mean(axis=0))
        cids = cids[keep]
        C = np.array(C_new)
    Cn = C / np.linalg.norm(C, axis=1, keepdims=True)
    assign = cids[np.lexsort((cids[None, :].repeat(len(X), 0), -(Xn @ Cn.T)), axis=1)[:, 0]]
    return cids, C, dict(zip(ids.tolist(), assign.tolist()))


def test_kmeans_matches_numpy_reference(spark, corpus, np_corpus):
    ids, X = np_corpus
    ref_cids, ref_C, ref_assign = _np_kmeans(ids, X, K, 3)

    cent = fit_kmeans_centroids(corpus, K, 3)
    got = {r["cid"]: np.array(r["cv"]) for r in cent.collect()}
    assert sorted(got) == sorted(ref_cids.tolist())
    for cid, refv in zip(ref_cids.tolist(), ref_C):
        np.testing.assert_allclose(got[cid], refv, rtol=1e-9, atol=1e-12)

    assigned = {
        r["vec_id"]: r["cid"]
        for r in assign_cosine(corpus, cent).collect()
    }
    assert assigned == ref_assign


def test_kmeans_inertia_improves(spark, corpus, np_corpus):
    """Mean member→centroid cosine must not degrade with iterations
    (Lloyd's monotonicity, up to the cosine/Euclidean objective gap —
    on unit-ish random embeddings it is monotone in practice)."""

    def mean_cos(iters):
        cent = fit_kmeans_centroids(corpus, K, iters)
        s = kmeans_summary(corpus, cent)
        row = s.agg(
            (F.sum(F.col("avg_cos") * F.col("n_members")) / F.sum("n_members")).alias(
                "m"
            )
        ).first()
        return row["m"]

    m1, m3 = mean_cos(1), mean_cos(3)
    assert m3 >= m1 - 1e-9


def test_kmeans_centroids_train_ivf_index(spark, corpus, tmp_path):
    """The fitted centroids plug into IvfIndex.build(centroids=...) and
    the stored index's cell partition sizes match a direct assignment."""
    from odbc2deltalake_spark.operators.ann_index import IvfIndex
    from odbc2deltalake_spark.queries.registry import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    vectors = emb.select("vec_id", "label", dbl.alias("v"))

    cent = fit_kmeans_centroids(corpus, K, 2)
    idx = IvfIndex(tmp_path / "ivf")
    idx.build(vectors, centroids=cent)

    direct = {
        (r["vec_id"], r["cid"])
        for r in assign_cosine(corpus, cent).collect()
    }
    stored = {
        (r["vec_id"], r["cid"])
        for r in idx.cells.read(spark).select("vec_id", "cid").collect()
    }
    assert stored == direct


def test_emb_kmeans_query_stable(spark):
    from odbc2deltalake_spark.queries.clustering_ops import emb_kmeans

    a = sorted(map(tuple, emb_kmeans(spark, SF_DIR).collect()))
    b = sorted(map(tuple, emb_kmeans(spark, SF_DIR).collect()))
    assert a and a == b
    # every corpus vector lands in exactly one cluster
    assert sum(r[1] for r in a) == 500


def test_semantic_dedup_matches_numpy_and_keeps_clones_out(spark, corpus, np_corpus):
    """semantic_dedup must reproduce a numpy recomputation (same
    clusters, same greedy lowest-id pruning), and planted near-identical
    clones must be dropped while their originals are kept."""
    from odbc2deltalake_spark.operators.clustering import semantic_dedup

    ids, X = np_corpus
    # plant clones: vec_id+10000 = same vector + tiny noise-free copy
    clones = corpus.filter(F.col("vec_id") < 20).select(
        (F.col("vec_id") + 10000).alias("vec_id"), "v"
    )
    ext = corpus.unionByName(clones).localCheckpoint(eager=True)

    got = {
        r["vec_id"]: (r["cid"], r["keep"])
        for r in semantic_dedup(ext, K, threshold=0.97, iterations=2).collect()
    }
    assert len(got) == len(ids) + 20
    # every planted clone is dropped (cosine 1.0 to its kept original)
    for vid in range(20):
        assert got[vid][1] is True or got[vid][1] == True  # original kept unless itself a dup
        assert got[vid + 10000][1] == False, vid
        assert got[vid][0] == got[vid + 10000][0]  # same cluster

    # numpy recomputation of the full pruning
    import numpy as np

    ext_rows = sorted(ext.collect(), key=lambda r: r["vec_id"])
    eids = np.array([r["vec_id"] for r in ext_rows])
    EX = np.array([r["v"] for r in ext_rows], dtype=np.float64)
    ref_cids, ref_C, ref_assign = _np_kmeans(eids, EX, K, 2)
    EXn = EX / np.linalg.norm(EX, axis=1, keepdims=True)
    ref_keep = {}
    for c in set(ref_assign.values()):
        members = [i for i, vid in enumerate(eids) if ref_assign[vid] == c]
        kept = []
        for i in members:
            dup = any(EXn[i] @ EXn[j] >= 0.97 for j in kept)
            ref_keep[int(eids[i])] = not dup
            if not dup:
                kept.append(i)
    for vid, (cid, keep) in got.items():
        assert ref_assign[vid] == cid, vid
        assert ref_keep[vid] == keep, vid
