"""Distributed PCA over embedding columns — the whitening / dimension-
reduction stage a training-data pipeline runs before clustering,
semantic dedup, or index building (IVF coarse quantizers and PQ
codebooks both train better on decorrelated inputs).

Scale shape (corpus of N vectors × D dims, k components):

- the ONLY distributed work is one pass computing sufficient statistics
  (n, Σx, ΣxxT) as per-Arrow-batch partials inside ``mapInPandas`` —
  each partial is D(D+1)+1 doubles REGARDLESS of N, so the driver
  collect is ``num_partitions × D²`` (4 KB per partition at D=64), a
  control-plane payload at any corpus size;
- the eigendecomposition runs driver-side on the D×D covariance
  (numpy ``eigh`` — D is the embedding dim, never the corpus size);
- projection is a PURE MAP: each component is a broadcast literal
  array, pc_j = dot(x, c_j) − dot(mean, c_j) via ``zip_with`` +
  ``aggregate`` entirely inside whole-stage codegen — zero shuffle,
  zero Python in the hot path.

Determinism: ``eigh`` on a fixed covariance is deterministic; the
remaining eigenvector SIGN ambiguity is pinned by making each
component's largest-|coordinate| entry positive — the same convention
the numpy reference test applies, so results are bit-stable across
runs and machines with the same BLAS.

The reference has no PCA surface; this extends the engine's embedding
family (SURVEY.md §2-extensions) alongside emb_kmeans / sim_ann_pq.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from odbc2deltalake_spark.functions.litarray import double_array_lit

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("xtx", T.ArrayType(T.DoubleType())),
    ]
)


def _moment_partials(vectors: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """(n, Σx, flattened ΣxxT) per Arrow batch — mergeable sufficient
    statistics for mean and covariance, the map-side-combine shape."""

    def part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            if x.shape[1] != dim:
                raise ValueError(
                    f"expected dim {dim}, got {x.shape[1]}"
                )
            yield pd.DataFrame(
                {
                    "n": [x.shape[0]],
                    "s": [x.sum(axis=0).tolist()],
                    "xtx": [(x.T @ x).ravel().tolist()],
                }
            )

    return vectors.select(vec_col).mapInPandas(part, _PARTIAL_SCHEMA)


def fit_pca(
    vectors: DataFrame, vec_col: str, dim: int, k: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(mean[D], components[k, D], eigvals[k]) — components are the top-k
    eigenvectors of the biased covariance (ΣxxT/n − μμT), eigenvalues
    descending, sign-pinned."""
    rows = _moment_partials(vectors, vec_col, dim).collect()
    if not rows:
        raise ValueError("fit_pca: empty input")
    n = sum(r["n"] for r in rows)
    s = np.zeros(dim)
    xtx = np.zeros((dim, dim))
    for r in rows:
        s += np.asarray(r["s"])
        xtx += np.asarray(r["xtx"]).reshape(dim, dim)
    mean = s / n
    cov = xtx / n - np.outer(mean, mean)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T.copy()
    # sign pin: the largest-|coordinate| entry of each component positive
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    return mean, comps, vals[order]


def project_pca(
    vectors: DataFrame,
    vec_col: str,
    mean: np.ndarray,
    components: np.ndarray,
    out_prefix: str = "pc",
) -> DataFrame:
    """Append pc1..pck columns — a zero-shuffle JVM map: each component
    is a broadcast literal array; centering folds into a scalar constant
    per component (dot(x−μ, c) = dot(x, c) − dot(μ, c))."""
    out = vectors
    for i, comp in enumerate(components):
        carr = double_array_lit(comp)
        const = float(np.dot(mean, comp))
        dot = F.aggregate(
            F.zip_with(F.col(vec_col), carr, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        out = out.withColumn(f"{out_prefix}{i + 1}", dot - F.lit(const))
    return out


def opq_rotation(
    vectors: DataFrame, vec_col: str, dim: int, m: int
) -> np.ndarray:
    """OPQ-style rotation matrix R[D, D] for product quantization: the
    full PCA basis with its dimensions dealt ROUND-ROBIN (by descending
    eigenvalue) across the ``m`` PQ subspaces, so each subspace receives
    a balanced share of the variance — the parametric OPQ
    initialization (Ge et al., CVPR 2013: decorrelate, then balance).
    Unbalanced subspaces are the standard PQ failure mode: one codebook
    quantizes almost all the energy while the rest encode noise.

    Rotation is orthonormal, so L2 distances are PRESERVED — ADC scores
    and exact reranks in rotated space equal the originals.
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    _, comps, _ = fit_pca(vectors, vec_col, dim, dim)
    d_sub = dim // m
    # eigen-order index e goes to subspace e % m, slot e // m
    order = [0] * dim
    for e in range(dim):
        order[(e % m) * d_sub + (e // m)] = e
    return comps[order]


def rotate_vectors(
    vectors: DataFrame, vec_col: str, rotation: np.ndarray,
    out_col: str = "v",
) -> DataFrame:
    """x -> R·x as ONE Arrow-batched matmul per partition (the JVM
    zip_with form would be D aggregate expressions per row; a numpy
    GEMM over the whole batch is the right kernel for a dense D×D
    rotation). Pure map, zero shuffle."""
    r = np.asarray(rotation, dtype=np.float64)
    other = [c for c in vectors.columns if c != vec_col]
    out_schema = T.StructType(
        [vectors.schema[c] for c in other]
        + [T.StructField(out_col, T.ArrayType(T.DoubleType()))]
    )

    def kern(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            if not len(b):
                continue
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            y = x @ r.T
            out = b[other].copy()
            out[out_col] = list(y)
            yield out

    return vectors.mapInPandas(kern, out_schema)
