"""Product-quantization gates: the Spark fit/encode/ADC pipeline must
reproduce an independent numpy PQ implementation exactly (same
deterministic init / L2 argmin / mean update), and the compressed search
must actually approximate the exact search (recall floor)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.pq import (
    adc_topk,
    encode_pq,
    fit_pq_codebooks,
)
from odbc2deltalake_spark.queries.registry import load_table

SF_DIR = "/root/testdata/sf0.001"
DIM, M, K, ITERS = 64, 8, 16, 2


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


def _np_pq(ids, X, dim, m, k, iterations):
    """Reference: per-subspace Lloyd's, seeds = subvectors of the k
    lowest vec_ids (cid = seed rank), argmin L2 ties to lowest cid."""
    d = dim // m
    order = np.argsort(ids)
    books = []  # list of (k, d) arrays per subspace
    for s in range(m):
        sub = X[:, s * d : (s + 1) * d]
        C = sub[order[:k]].copy()
        for _ in range(iterations):
            dist = ((sub[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = dist.argmin(axis=1)  # ties -> lowest index = lowest cid
            C = np.array(
                [
                    sub[assign == c].mean(axis=0) if (assign == c).any() else C[c]
                    for c in range(len(C))
                ]
            )
            # cells that lose all members keep their centroid in numpy;
            # the Spark fit DROPS them — the fixture never empties a cell
            # at these settings, asserted below
            assert all((assign == c).any() for c in range(len(C)))
        books.append(C)
    codes = np.zeros((len(X), m), dtype=int)
    for s in range(m):
        sub = X[:, s * d : (s + 1) * d]
        dist = ((sub[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
        codes[:, s] = dist.argmin(axis=1)
    return books, dict(zip(ids.tolist(), map(tuple, codes)))


def test_pq_matches_numpy_reference(spark, corpus, np_corpus):
    ids, X = np_corpus
    ref_books, ref_codes = _np_pq(ids, X, DIM, M, K, ITERS)

    books = fit_pq_codebooks(corpus, DIM, M, K, ITERS)
    got = {(r["sub"], r["cid"]): np.array(r["cv"]) for r in books.collect()}
    assert len(got) == M * K
    for s in range(M):
        for c in range(K):
            np.testing.assert_allclose(
                got[(s, c)], ref_books[s][c], rtol=1e-9, atol=1e-12
            )

    codes = {
        r["vec_id"]: tuple(r["codes"])
        for r in encode_pq(corpus, DIM, M, books).collect()
    }
    assert codes == ref_codes


def test_pq_adc_rerank_recall_against_exact(spark, corpus, np_corpus):
    """The production shape (ADC prefilter → exact rerank of 64
    candidates) must recover a solid fraction of the exact-L2 top-10.
    Plain ADC@10 on these weakly-clustered synthetic embeddings sits at
    ~0.1 recall (verified against the numpy reference — quantization
    error dominates neighbor gaps, the standard failure PQ rerank
    exists to fix); the reranked floor asserted here is 0.4, well above
    chance (10/499) and stable because the whole pipeline is
    deterministic."""
    ids, X = np_corpus
    q = X[ids.tolist().index(0)]
    exact = ((X - q) ** 2).sum(axis=1)
    exact_top = set(
        ids[np.lexsort((ids, exact))][1:11].tolist()  # skip the query itself
    )

    books = fit_pq_codebooks(corpus, DIM, M, K, ITERS)
    codes = encode_pq(corpus, DIM, M, books)
    got = adc_topk(
        list(q),
        codes.filter(F.col("vec_id") != 0),
        books,
        DIM,
        M,
        10,
        rerank_vectors=corpus,
    ).collect()
    assert len(got) == 10
    dists = [r["exact_dist"] for r in got]
    assert dists == sorted(dists)
    # reranked distances are EXACT L2 — each must match numpy to rounding
    for r in got:
        i = ids.tolist().index(r["vec_id"])
        assert abs(exact[i] - r["exact_dist"]) < 1e-6
    recall = len({r["vec_id"] for r in got} & exact_top) / 10
    assert recall >= 0.4


def test_sim_ann_pq_query_stable(spark):
    from odbc2deltalake_spark.queries.clustering_ops import sim_ann_pq

    a = [tuple(r) for r in sim_ann_pq(spark, SF_DIR).collect()]
    b = [tuple(r) for r in sim_ann_pq(spark, SF_DIR).collect()]
    assert a and a == b
