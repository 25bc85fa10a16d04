"""IVF-PQ index gates: build/append lifecycle, partition-pruned probes,
recall with rerank, and agreement with a numpy recomputation of the
residual-ADC distances."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.clustering import fit_kmeans_centroids
from odbc2deltalake_spark.operators.ivfpq import IvfPqIndex
from odbc2deltalake_spark.queries.registry import load_table

SF_DIR = "/root/testdata/sf0.001"
DIM, M, K = 64, 8, 16
NCENT = 8


@pytest.fixture(scope="module")
def corpus(spark):
    emb = load_table(spark, SF_DIR, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select("vec_id", dbl.alias("v")).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def built(spark, corpus, tmp_path_factory):
    root = tmp_path_factory.mktemp("ivfpq")
    idx = IvfPqIndex(root, DIM, M, K)
    cent = fit_kmeans_centroids(corpus, NCENT, 2)
    idx.build(corpus, cent)
    return idx


def test_build_stores_all_rows_partitioned(spark, corpus, built):
    cells = built.cells.read(spark)
    assert cells.count() == corpus.count()
    assert set(cells.columns) == {"vec_id", "cid", "codes"}
    # every row carries m codes in [0, k)
    bad = cells.filter(
        (F.size("codes") != M)
        | F.exists("codes", lambda c: (c < 0) | (c >= K))
    ).count()
    assert bad == 0


def test_probe_prunes_unprobed_cell_files(spark, corpus, built):
    """The cid filter must reach the scan as a PARTITION filter (file
    pruning), not a post-scan row filter."""
    import io
    from contextlib import redirect_stdout

    q = corpus.filter(F.col("vec_id") == 0).first()["v"]
    probed = built.search(spark, q, nprobe=1, k=5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        probed.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "cid" in plan
    assert probed.count() == 5


def test_search_distances_match_numpy(spark, corpus, built):
    """The ADC distances on probed rows must equal a from-scratch numpy
    recomputation from the STORED tables (centroids, codebooks, codes) —
    the LUT/keying logic is the part a pure-recall test would miss."""
    rows = sorted(corpus.collect(), key=lambda r: r["vec_id"])
    X = {r["vec_id"]: np.array(r["v"]) for r in rows}
    q = X[0]

    cent = {r["cid"]: np.array(r["cv"]) for r in built.centroids.read(spark).collect()}
    books = {}
    for r in built.codebooks.read(spark).collect():
        books[(r["sub"], r["cid"])] = np.array(r["cv"])
    codes = {
        r["vec_id"]: (r["cid"], list(r["codes"]))
        for r in built.cells.read(spark).collect()
    }

    def cos(a, b):
        return a @ b / (np.linalg.norm(a) * np.linalg.norm(b))

    ranked = sorted(cent, key=lambda c: (-cos(cent[c], q), c))
    probe_cids = set(ranked[:2])
    d = DIM // M

    got = {
        r["vec_id"]: r["approx_dist"]
        for r in built.search(spark, q, nprobe=2, k=10**6).collect()
    }
    assert set(got) == {v for v, (c, _) in codes.items() if c in probe_cids}
    for vid, dist in got.items():
        cid, cd = codes[vid]
        qr = q - cent[cid]
        expect = sum(
            ((qr[s * d : (s + 1) * d] - books[(s, cd[s])]) ** 2).sum()
            for s in range(M)
        )
        assert abs(dist - round(expect, 6)) < 1e-5


def test_search_rerank_recall(spark, corpus, built):
    rows = sorted(corpus.collect(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in rows])
    X = np.array([r["v"] for r in rows])
    q = X[ids.tolist().index(0)]
    exact = ((X - q) ** 2).sum(axis=1)
    exact_top = set(ids[np.lexsort((ids, exact))][1:11].tolist())

    got = built.search(
        spark,
        q,
        nprobe=4,
        k=11,
        candidates=96,
        rerank_vectors=corpus,
    ).collect()
    hits = {r["vec_id"] for r in got if r["vec_id"] != 0}
    recall = len(hits & exact_top) / 10
    # 4 of 8 cells probed + rerank: same floor as the flat-PQ gate
    assert recall >= 0.4


def test_append_matches_fresh_build(spark, corpus, tmp_path):
    """Pinned-quantizer property: append(rest) after build(half) must
    store exactly the rows a fresh encode of the union would."""
    half = corpus.filter(F.col("vec_id") < 250)
    rest = corpus.filter(F.col("vec_id") >= 250)
    cent = fit_kmeans_centroids(corpus, NCENT, 2)

    a = IvfPqIndex(tmp_path / "a", DIM, M, K)
    a.build(half, cent)
    a.append(rest)
    b = IvfPqIndex(tmp_path / "b", DIM, M, K)
    # pin b's quantizers to a's (build refits PQ books on its input —
    # pinning means copying the stored tables)
    b.centroids.write(a.centroids.read(spark), mode="overwrite")
    b.codebooks.write(a.codebooks.read(spark), mode="overwrite")
    b.cells.write(
        spark.createDataFrame([], a.cells.read(spark).schema),
        mode="overwrite",
        partition_by=["cid"],
    )
    b.append(corpus)

    rows_a = {
        (r["vec_id"], r["cid"], tuple(r["codes"]))
        for r in a.cells.read(spark).collect()
    }
    rows_b = {
        (r["vec_id"], r["cid"], tuple(r["codes"]))
        for r in b.cells.read(spark).collect()
    }
    assert rows_a == rows_b


def test_search_correct_with_large_centroid_ids(spark, corpus, tmp_path):
    """Regression: LUT keys must be long-typed — centroid ids are seed
    vec_ids, and cid * 2^20 overflows int32 for cid >= 2048. A corpus
    whose lowest ids are 5,000,000+ must still rank correctly."""
    import numpy as np

    from odbc2deltalake_spark.operators.clustering import fit_kmeans_centroids

    shifted = corpus.select(
        (F.col("vec_id") + 5_000_000).alias("vec_id"), "v"
    ).localCheckpoint(eager=True)
    idx = IvfPqIndex(tmp_path / "big", DIM, M, K)
    cent = fit_kmeans_centroids(shifted, NCENT, 2)
    assert all(r["cid"] >= 5_000_000 for r in cent.collect())
    idx.build(shifted, cent)

    rows = sorted(shifted.collect(), key=lambda r: r["vec_id"])
    X = np.array([r["v"] for r in rows])
    q = X[0]
    got = idx.search(spark, q, nprobe=NCENT, k=20).collect()
    assert len(got) == 20
    assert all(r["approx_dist"] is not None for r in got)
    # probing ALL cells makes ADC == flat PQ: distances must be finite
    # and ascending, and the query's own vector must rank first
    dists = [r["approx_dist"] for r in got]
    assert dists == sorted(dists)
    assert got[0]["vec_id"] == 5_000_000


def test_recall_floor_at_30x_scale(spark, tmp_path):
    """VERDICT r7 #6: recall@10 floor at the largest in-sandbox corpus —
    sf0.1 embeddings replicated 30x (60k vectors, matching the SCALE.md
    scale-study factor) as 2000 clusters of noisy clones, the realistic
    clustered regime IVF is built for. Index built with the engine's own
    quantizer derivation (~sqrt(n) centroids) and searched at the
    DEFAULT nprobe; measured recall@10 = 0.99 (SCALE.md), gated at 0.9
    so a regression in the coarse quantizer, residual encoding, or ADC
    path cannot land silently."""
    import numpy as np

    from odbc2deltalake_spark.operators.clustering import (
        fit_kmeans_centroids,
    )

    base_rows = sorted(
        load_table(spark, "/root/testdata/sf0.1", "embeddings")
        .select("vec_id", "embedding")
        .collect(),
        key=lambda r: r["vec_id"],
    )
    ids0 = np.array([r["vec_id"] for r in base_rows])
    X0 = np.array([r["embedding"] for r in base_rows], dtype=np.float64)
    n0, d = X0.shape

    factor = 30
    rng = np.random.RandomState(7)
    sigma = 0.02 * X0.std()
    X = np.vstack(
        [X0] + [X0 + rng.normal(0, sigma, X0.shape) for _ in range(1, factor)]
    )
    ids = np.concatenate([ids0 + k * 100000 for k in range(factor)])

    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in zip(ids, X)],
        "vec_id long, v array<double>",
    ).localCheckpoint(eager=True)

    ncent = max(4, int(np.sqrt(len(ids))))  # engine derivation: ~sqrt(n)
    idx = IvfPqIndex(tmp_path / "ivfpq30x", d, M, K)
    idx.build(df, fit_kmeans_centroids(df, ncent, 1))

    hits = tot = 0
    for qi in range(5):
        q = X0[qi]
        order = np.lexsort((ids, ((X - q) ** 2).sum(axis=1)))
        true_top = []
        for j in order:
            if int(ids[j]) == int(ids0[qi]):
                continue
            true_top.append(int(ids[j]))
            if len(true_top) == 10:
                break
        got = idx.search(
            spark, q, k=11, candidates=96, rerank_vectors=df
        ).collect()
        got_ids = [r["vec_id"] for r in got if r["vec_id"] != int(ids0[qi])][:10]
        hits += len(set(got_ids) & set(true_top))
        tot += 10
    assert hits / tot >= 0.9, f"recall@10 collapsed to {hits / tot:.2f}"


def test_opq_rotated_index_round_trips_and_recalls(spark, corpus, tmp_path):
    """rotate=True persists the OPQ pre-transform with the index: a
    FRESH handle re-opened from disk rotates queries and appends with
    the stored matrix; cell assignments equal the unrotated build's
    (orthonormal rotation preserves cosine); search+rerank stays in the
    original metric and clears the plain index's recall floor."""
    cent = fit_kmeans_centroids(corpus, NCENT, 2)
    plain = IvfPqIndex(tmp_path / "plain", DIM, M, K)
    plain.build(corpus, cent)
    rot = IvfPqIndex(tmp_path / "rot", DIM, M, K)
    rot.build(corpus, cent, rotate=True)

    # identical coarse assignments — rotation is invisible to the IVF
    a = {
        r["vec_id"]: r["cid"]
        for r in plain.cells.read(spark).select("vec_id", "cid").collect()
    }
    b = {
        r["vec_id"]: r["cid"]
        for r in rot.cells.read(spark).select("vec_id", "cid").collect()
    }
    assert a == b

    # fresh handle: the rotation must come off DISK, not object state
    reopened = IvfPqIndex(tmp_path / "rot", DIM, M, K)
    r_mat = reopened._load_rotation(spark)
    assert r_mat is not None
    np.testing.assert_allclose(r_mat @ r_mat.T, np.eye(DIM), atol=1e-9)

    rows = {
        r["vec_id"]: np.array(r["v"]) for r in corpus.collect()
    }
    q = rows[0]
    truth = {
        vid
        for vid, _ in sorted(
            ((vid, float(((v - q) ** 2).sum())) for vid, v in rows.items()
             if vid != 0),
            key=lambda t: (t[1], t[0]),
        )[:10]
    }
    got = reopened.search(
        spark, list(q), nprobe=NCENT, k=10, candidates=64,
        rerank_vectors=corpus.filter(F.col("vec_id") != 0),
    )
    ids = [r["vec_id"] for r in got.collect()]
    assert 0 not in ids
    recall = len(set(ids) & truth) / 10
    assert recall >= 0.4, recall  # the plain index's own floor

    # exact_dist is the ORIGINAL-metric distance (rerank unrotated)
    d = {r["vec_id"]: r["exact_dist"] for r in got.collect()}
    for vid, dist in d.items():
        np.testing.assert_allclose(
            dist, float(((rows[vid] - q) ** 2).sum()), rtol=1e-4
        )

    # append through the reopened handle: encoded in rotated space,
    # searchable, original rows untouched
    clone = corpus.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100000).alias("vec_id"), "v"
    )
    reopened.append(clone)
    assert (
        reopened.cells.read(spark).filter("vec_id >= 100000").count() == 5
    )
    # the planted clone of the query's nearest neighbor surfaces
    got2 = reopened.search(spark, list(rows[0]), nprobe=NCENT, k=10)
    ids2 = {r["vec_id"] for r in got2.collect()}
    assert 100000 in ids2  # vec_id 0's clone has distance ~0


def test_ivfpq_maintenance_advisor_and_compact(spark, tmp_path):
    """VERDICT r12 #7: appends accumulate one dir each; the advisor
    recommends the cell-partition-preserving compact(); after it,
    search results are identical and probe-time partition pruning
    still holds (unprobed cells' files stay unopened)."""
    import pandas as pd

    from odbc2deltalake_spark.operators.clustering import (
        fit_kmeans_centroids,
    )
    from odbc2deltalake_spark.operators.ivfpq import IvfPqIndex

    rng = __import__("numpy").random.default_rng(7)
    dim = 16
    vecs = [(i, [float(x) for x in rng.normal(size=dim)]) for i in range(256)]
    df = spark.createDataFrame(pd.DataFrame(vecs, columns=["vec_id", "v"]))
    base = df.filter(F.col("vec_id") < 128)
    idx = IvfPqIndex(tmp_path / "i", dim, 4, 8)
    idx.build(base, fit_kmeans_centroids(base, 4, 2))
    for k in range(8):
        idx.append(df.filter((F.col("vec_id") >= 128)
                             & (F.col("vec_id") % 8 == k)))

    rep = idx.maintenance_report(batch_threshold=8)
    assert rep["n_append_batches"] >= 8
    assert rep["advise_compact"] is True
    assert "per cid partition" in rep["recommended_action"]

    q = vecs[3][1]
    before = [tuple(r) for r in idx.search(
        spark, q, nprobe=2, k=5, candidates=32, rerank_vectors=df
    ).collect()]
    idx.compact(spark, out_partitions=1)
    after = [tuple(r) for r in idx.search(
        spark, q, nprobe=2, k=5, candidates=32, rerank_vectors=df
    ).collect()]
    assert after == before

    rep2 = idx.maintenance_report(batch_threshold=8)
    assert rep2["advise_compact"] is False

    # partition pruning survives the rewrite: a 1-cell probe READS
    # strictly fewer files than the whole index holds (input_file_name
    # at execution time observes the hive-partition pruning;
    # inputFiles() is pre-pushdown and would not)
    from pyspark.sql import functions as FF
    cent = idx.centroids.read(spark).collect()

    def files_read(df):
        return {
            r[0]
            for r in df.select(FF.input_file_name()).distinct().collect()
        }

    one_cell = idx.cells.read(spark).filter(
        FF.col("cid") == cent[0]["cid"])
    all_cells = idx.cells.read(spark)
    assert len(files_read(one_cell)) < len(files_read(all_cells))
