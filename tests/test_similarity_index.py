"""Persisted ANN index lifecycle: the similarity operators' scale story
("probe reads only its cells' partitions") exercised through the table
store, not just claimed in docstrings.

Build the IVF cell assignment once, store it hive-partitioned by cell id,
then answer a query by reading ONLY the probe cells — results must equal
the direct (unstored) IVF query."""

from __future__ import annotations

from pyspark.sql import functions as F

from odbc2deltalake_spark.tablestore import VersionedParquetTable

SF_DIR = "/root/testdata/sf0.001"


def test_stored_ivf_index_probe_matches_direct(spark, tmp_path):
    from odbc2deltalake_spark.queries import similarity_ops as S
    from odbc2deltalake_spark.queries.registry import load_table

    # direct (unstored) result
    direct = {tuple(r) for r in S.sim_ann_ivf(spark, SF_DIR).collect()}
    assert direct

    # build + store the index: corpus with its assigned cell, partitioned
    # by cell so cell filters prune at file level
    emb = load_table(spark, SF_DIR, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    corpus = emb.select("vec_id", "label", dbl.alias("v"))
    cent = corpus.filter(F.col("vec_id") < S._IVF_CENTROIDS).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    cos_c = S._dot(F.col("v"), F.col("cv")) / (
        S._norm(F.col("v")) * S._norm(F.col("cv"))
    )
    from pyspark.sql import Window as W

    scored = corpus.crossJoin(F.broadcast(cent)).select(
        "vec_id", "label", "v", "cid", cos_c.alias("cos")
    )
    rn = F.row_number().over(
        W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cid"))
    )
    assigned = (
        scored.withColumn("rn", rn).filter(F.col("rn") == 1)
        .select("vec_id", "label", "v", "cid")
    )
    index = VersionedParquetTable(tmp_path / "ivf_index")
    index.write(assigned, mode="overwrite", partition_by=["cid"])

    # probe cells for the fixed query vector
    probe_cids = [
        r["cid"]
        for r in scored.filter(F.col("vec_id") == S._QUERY_VEC_ID)
        .orderBy(F.col("cos").desc(), "cid")
        .limit(S._IVF_NPROBE)
        .collect()
    ]
    q = corpus.filter(F.col("vec_id") == S._QUERY_VEC_ID).select(
        F.col("v").alias("qv")
    )
    stored = index.read(spark).filter(F.col("cid").isin(probe_cids))
    # partition pruning: the cid filter must reach the scan as a
    # partition filter, not a post-scan predicate
    plan = stored._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan

    cos_q = S._dot(F.col("v"), F.col("qv")) / (
        S._norm(F.col("v")) * S._norm(F.col("qv"))
    )
    got = {
        tuple(r)
        for r in (
            stored.filter(F.col("vec_id") != S._QUERY_VEC_ID)
            .crossJoin(F.broadcast(q))
            .select("vec_id", "label", cos_q.alias("cos_raw"))
            .orderBy(F.col("cos_raw").desc(), "vec_id")
            .limit(S._TOP_K)
            .select("vec_id", "label", F.round("cos_raw", 4).alias("cosine"))
        ).collect()
    }
    assert got == direct


# ---------------------------------------------------------------------------
# IvfIndex lifecycle: incremental append + staleness-triggered rebuild
# ---------------------------------------------------------------------------


def _corpus(spark):
    from odbc2deltalake_spark.queries.registry import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return emb.select("vec_id", "label", dbl.alias("v"))


def test_ivf_append_matches_fresh_rebuild(spark, tmp_path):
    """Pinned-quantizer property: appending new vectors to an existing
    index yields the SAME index (cells and probe results) as rebuilding
    from scratch over the union, as long as the centroid set is
    unchanged — so incremental maintenance loses no recall."""
    from odbc2deltalake_spark.operators.ann_index import IvfIndex

    corpus = _corpus(spark)
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    extra = corpus.filter(F.col("vec_id") % 2 == 1)

    inc = IvfIndex(tmp_path / "inc")
    inc.build(base, num_centroids=8)
    inc.append(extra)

    # fresh build over the SAME quantizer (pinned centroids): cells and
    # probe results must be identical — incremental append loses nothing
    fresh = IvfIndex(tmp_path / "fresh")
    fresh.build(corpus, centroids=inc.centroids.read(spark))

    inc_cells = {(r["vec_id"], r["cid"]) for r in inc.cells.read(spark).collect()}
    fresh_cells = {(r["vec_id"], r["cid"]) for r in fresh.cells.read(spark).collect()}
    assert inc_cells == fresh_cells

    qvec = [r["v"] for r in corpus.filter(F.col("vec_id") == 7).collect()][0]
    got_inc = [tuple(r) for r in inc.probe(spark, qvec, nprobe=3, k=5).collect()]
    got_fresh = [tuple(r) for r in fresh.probe(spark, qvec, nprobe=3, k=5).collect()]
    assert got_inc == got_fresh
    assert len(got_inc) == 5


def test_ivf_staleness_triggers_and_rebuild_clears(spark, tmp_path):
    """Growth past GROWTH_BOUND flags the index stale; rebuild()
    re-clusters at a size-derived centroid count and clears the flag."""
    from odbc2deltalake_spark.operators.ann_index import IvfIndex

    corpus = _corpus(spark)
    base = corpus.filter(F.col("vec_id") < 100)
    idx = IvfIndex(tmp_path / "ivf")
    idx.build(base, num_centroids=8)
    assert not idx.is_stale(spark)

    # triple the corpus: growth = 3x > GROWTH_BOUND (2x)
    idx.append(corpus.filter((F.col("vec_id") >= 100) & (F.col("vec_id") < 300)))
    s = idx.staleness(spark)
    assert s["growth"] > IvfIndex.GROWTH_BOUND
    assert idx.is_stale(spark)

    idx.rebuild(spark)
    s2 = idx.staleness(spark)
    assert s2["growth"] == 1.0
    assert not idx.is_stale(spark)
    # all 300 vectors survived the rebuild
    assert idx.cells.read(spark).count() == 300


def test_ivf_probe_prunes_partitions(spark, tmp_path):
    """The probe's cid filter must reach the scan as a partition filter —
    unprobed cells are never read (the point of the stored layout)."""
    from odbc2deltalake_spark.operators.ann_index import IvfIndex

    corpus = _corpus(spark)
    idx = IvfIndex(tmp_path / "ivf")
    idx.build(corpus, num_centroids=8)
    qvec = [r["v"] for r in corpus.filter(F.col("vec_id") == 7).collect()][0]
    probed = idx.probe(spark, qvec, nprobe=2, k=5)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan
    assert len(probed.collect()) == 5


def test_ivf_assign_is_map_side(spark, tmp_path):
    """The nearest-centroid assignment must be a pure map over the corpus:
    no Window (the old row_number-per-vec_id formulation) and no
    hash-partitioned Exchange — the only allowed Exchanges are the
    broadcast itself and the SinglePartition centroid packing (control
    plane, ~sqrt(N) rows). A corpus-wide shuffle here was the only
    full-corpus Exchange in index build/append."""
    import io
    from contextlib import redirect_stdout

    from odbc2deltalake_spark.operators.ann_index import IvfIndex

    corpus = _corpus(spark)
    cent = corpus.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("cv")
    )
    idx = IvfIndex(tmp_path / "ivf")
    assigned = idx._assign(corpus, cent)

    buf = io.StringIO()
    with redirect_stdout(buf):
        assigned.explain("formatted")
    plan = buf.getvalue()
    assert "Window" not in plan
    assert "hashpartitioning" not in plan

    # and it computes the same assignment as the reference row_number form
    from pyspark.sql import Window as W
    from odbc2deltalake_spark.operators.ann_index import _dot, _norm

    cos = _dot(F.col("v"), F.col("cv")) / (_norm(F.col("v")) * _norm(F.col("cv")))
    rn = F.row_number().over(
        W.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("cid"))
    )
    want = {
        (r["vec_id"], r["cid"])
        for r in corpus.crossJoin(F.broadcast(cent))
        .select("vec_id", "cid", cos.alias("cos"))
        .withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .collect()
    }
    got = {(r["vec_id"], r["cid"]) for r in assigned.collect()}
    assert got == want
