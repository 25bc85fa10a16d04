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
