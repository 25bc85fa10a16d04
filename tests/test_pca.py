"""PCA operator gates (operators/pca.py): the distributed sufficient-
statistics fit must equal a full-data numpy reference, and the
projection must satisfy the PCA invariants — orthonormal components,
descending eigenvalues, per-component projection variance equal to its
eigenvalue. The driver row (emb_pca_project) is rows-only, so THESE
asserts are the correctness gate."""

from __future__ import annotations

import numpy as np
import pytest

from odbc2deltalake_spark.operators.pca import fit_pca, project_pca

DIM = 16
N = 400
K = 4


@pytest.fixture(scope="module")
def corpus(spark):
    # anisotropic gaussian with a known rotation: distinct eigenvalues so
    # the component order (and the numpy comparison) is unambiguous
    rng = np.random.RandomState(7)
    scales = np.linspace(5.0, 0.2, DIM)
    q, _ = np.linalg.qr(rng.randn(DIM, DIM))
    x = (rng.randn(N, DIM) * scales) @ q.T + rng.randn(DIM)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, v array<double>",
    ).repartition(8)
    return x, df


def _numpy_reference(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / x.shape[0]
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    for i in range(k):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order]


def test_fit_matches_numpy_reference(spark, corpus):
    x, df = corpus
    mean, comps, vals = fit_pca(df, "v", DIM, K)
    rmean, rcomps, rvals = _numpy_reference(x, K)
    np.testing.assert_allclose(mean, rmean, atol=1e-9)
    np.testing.assert_allclose(vals, rvals, rtol=1e-9)
    np.testing.assert_allclose(comps, rcomps, atol=1e-8)


def test_pca_invariants_and_projection(spark, corpus):
    x, df = corpus
    mean, comps, vals = fit_pca(df, "v", DIM, K)
    # orthonormal components, eigenvalues strictly descending
    np.testing.assert_allclose(comps @ comps.T, np.eye(K), atol=1e-9)
    assert all(vals[i] > vals[i + 1] for i in range(K - 1))
    out = project_pca(df, "v", mean, comps)
    got = np.array(
        [
            [r[f"pc{i + 1}"] for i in range(K)]
            for r in out.orderBy("vec_id").collect()
        ]
    )
    # the JVM zip_with projection equals the numpy projection ...
    np.testing.assert_allclose(got, (x - mean) @ comps.T, atol=1e-6)
    # ... and each component's variance is its eigenvalue (biased, /n)
    np.testing.assert_allclose(got.var(axis=0), vals, rtol=1e-6)


def test_fit_rejects_empty_and_wrong_dim(spark):
    df = spark.createDataFrame([], "vec_id long, v array<double>")
    with pytest.raises(ValueError, match="empty"):
        fit_pca(df, "v", DIM, K)
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0])], "vec_id long, v array<double>"
    )
    with pytest.raises(Exception, match="dim"):
        fit_pca(bad, "v", DIM, K)


def test_driver_row_shape(spark):
    """The registry entry runs end-to-end at sf0.001 with a stable
    schema — what the rows-only driver check sees."""
    from odbc2deltalake_spark.queries import registry

    registry.load_all()
    out = registry.QUERIES["emb_pca_project"].fn(
        spark, "/root/testdata/sf0.001"
    )
    assert out.columns == ["vec_id", "label", "pc1", "pc2", "pc3", "pc4"]
    rows = out.collect()
    assert len(rows) > 0
    # projections are centered: column means ~ 0
    m = np.array([[r[f"pc{i}"] for i in (1, 2, 3, 4)] for r in rows]).mean(0)
    np.testing.assert_allclose(m, 0, atol=1e-3)


def test_opq_rotation_balances_and_preserves_distance(spark, corpus):
    """The OPQ rotation is orthonormal (L2-preserving) and deals the
    variance round-robin: each PQ subspace's variance share is far more
    balanced than the plain-PCA ordering would give."""
    x, df = corpus
    from odbc2deltalake_spark.operators.pca import (
        opq_rotation,
        rotate_vectors,
    )

    m = 4
    r = opq_rotation(df, "v", DIM, m)
    np.testing.assert_allclose(r @ r.T, np.eye(DIM), atol=1e-9)
    y = np.array(
        [row["v"] for row in rotate_vectors(df, "v", r)
         .orderBy("vec_id").collect()]
    )
    np.testing.assert_allclose(y, x @ r.T, atol=1e-9)
    # pairwise distance preserved (spot pair)
    d0 = np.linalg.norm(x[0] - x[1])
    np.testing.assert_allclose(np.linalg.norm(y[0] - y[1]), d0, rtol=1e-9)
    # balance: per-subspace variance shares under the round-robin deal
    # vs the unbalanced contiguous-PCA deal
    yc = y - y.mean(0)
    d_sub = DIM // m
    shares = [
        yc[:, s * d_sub:(s + 1) * d_sub].var(axis=0).sum()
        for s in range(m)
    ]
    _, comps, vals = __import__(
        "odbc2deltalake_spark.operators.pca", fromlist=["fit_pca"]
    ).fit_pca(df, "v", DIM, DIM)
    contiguous = [
        vals[s * d_sub:(s + 1) * d_sub].sum() for s in range(m)
    ]
    spread = max(shares) / min(shares)
    spread_contiguous = max(contiguous) / min(contiguous)
    assert spread < spread_contiguous / 3, (spread, spread_contiguous)


def test_opq_reduces_quantization_error_vs_plain_pq(spark):
    """On the real embeddings fixture: PQ codebooks fit in OPQ-rotated
    space reconstruct with LOWER total squared error than plain PQ —
    the point of balancing the subspace variance. (Rotation preserves
    L2, so the errors are directly comparable.)"""
    from odbc2deltalake_spark.operators.pca import (
        opq_rotation,
        rotate_vectors,
    )
    from odbc2deltalake_spark.operators.pq import (
        encode_pq,
        fit_pq_codebooks,
    )
    from odbc2deltalake_spark.queries.registry import load_table
    from pyspark.sql import functions as F

    spark_df = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    vectors = spark_df.select(
        "vec_id",
        F.transform("embedding", lambda v: v.cast("double")).alias("v"),
    )

    def total_sq_err(vecs):
        books = fit_pq_codebooks(vecs, 64, 8, 16, 2)
        codes = encode_pq(vecs, 64, 8, books)
        cb = {
            (r["sub"], r["cid"]): np.array(r["cv"])
            for r in books.collect()
        }
        xs = {r["vec_id"]: np.array(r["v"]) for r in vecs.collect()}
        cs = {r["vec_id"]: r["codes"] for r in codes.collect()}
        err = 0.0
        for vid, v in xs.items():
            rec = np.concatenate([cb[(s, c)] for s, c in enumerate(cs[vid])])
            err += float(((v - rec) ** 2).sum())
        return err

    plain = total_sq_err(vectors)
    r = opq_rotation(vectors, "v", 64, 8)
    rotated = rotate_vectors(vectors, "v", r)
    opq = total_sq_err(rotated)
    assert opq < plain, (opq, plain)


def test_sim_ann_opq_bounded_candidate_recall(spark):
    """The PRODUCTION configuration (64-candidate ADC prefilter in
    rotated space + original-space exact rerank): top-10 recall against
    brute force must clear plain PQ's own floor with margin. (The
    registry row runs the exact-equivalence configuration — full slice,
    SQL-oracled — so the bounded-budget behavior is gated here.)"""
    from pyspark.sql import functions as F

    from odbc2deltalake_spark.operators.pca import (
        opq_rotation,
        rotate_vectors,
    )
    from odbc2deltalake_spark.operators.pq import (
        adc_topk,
        encode_pq,
        fit_pq_codebooks,
    )
    from odbc2deltalake_spark.queries import registry

    registry.load_all()
    emb = registry.load_table(spark, "/root/testdata/sf0.001", "embeddings")
    vectors = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    ).localCheckpoint(eager=True)
    r = opq_rotation(vectors, "v", 64, 8)
    rot = rotate_vectors(vectors, "v", r)
    books = fit_pq_codebooks(rot, 64, 8, 16, 2)
    codes = encode_pq(rot, 64, 8, books)
    rows = {
        row["vec_id"]: np.array(row["v"]) for row in vectors.collect()
    }
    q = rows[0]
    q_rot = [float(x) for x in (r @ q)]
    out = adc_topk(
        q_rot,
        codes.filter(F.col("vec_id") != 0),
        books,
        64, 8, 10,
        rerank_vectors=vectors.filter(F.col("vec_id") != 0),
        candidates=64,
        rerank_query=[float(x) for x in q],
    )
    got = {row["vec_id"] for row in out.collect()}
    truth = {
        vid
        for vid, _ in sorted(
            ((vid, float(((v - q) ** 2).sum())) for vid, v in rows.items()
             if vid != 0),
            key=lambda t: (t[1], t[0]),
        )[:10]
    }
    recall = len(truth & got) / 10
    # plain PQ's own gate is 0.4 on this fixture (tests/test_pq.py:124)
    # — OPQ must clear it with margin (measured 0.6)
    assert recall >= 0.5, (recall, sorted(got), sorted(truth))
