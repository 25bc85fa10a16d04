"""Product quantization (PQ) for embedding columns — the compressed-ANN
companion to `IvfIndex` (IVF-PQ is the standard 100 TB-scale ANN layout:
IVF cells prune the corpus, PQ codes shrink each cell's residents from
D floats to M bytes, and queries scan codes with an asymmetric distance
table instead of raw vectors).

Deterministic like `operators/clustering.py` (lowest-id init, argmin L2
with ties to the lowest code id, mean update — no RNG), which makes the
codes reproducible and testable against a numpy reference.

Scale shape:
- fit: each Lloyd's round is a zero-shuffle assignment map (all M
  codebooks packed into ONE broadcast array; each row scores its M
  subvectors against its own subspace's centroids) plus one shuffle of
  N*D (sub, cid, dim, x) rows into M*K*D' means. One corpus pass per
  round regardless of M.
- encode: pure map against the broadcast codebooks — each vector becomes
  an array<int> of M code ids (stored M bytes/vector at rest).
- query (ADC): the query's M*K distance table is computed driver-side
  (tiny), broadcast, and each encoded row sums M lookups — no float
  vector is read at query time.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F
from odbc2deltalake_spark.functions.litarray import double_array_lit


def _sub_slices(dim: int, m: int) -> list[tuple[int, int]]:
    """1-based (start, length) slices splitting `dim` into `m` equal
    subvectors. dim must divide evenly — PQ's usual contract."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d = dim // m
    return [(s * d + 1, d) for s in range(m)]


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _subvectors(vectors: DataFrame, dim: int, m: int) -> DataFrame:
    """(vec_id, sub, sv): explode each vector into its m subvectors —
    map-side (slice + inline), no shuffle."""
    slices = _sub_slices(dim, m)
    parts = F.array(
        *[
            F.struct(
                F.lit(s).alias("sub"), F.slice("v", start, ln).alias("sv")
            )
            for s, (start, ln) in enumerate(slices)
        ]
    )
    return vectors.select("vec_id", F.inline(parts))


def _pack_books_by_sub(codebooks: DataFrame) -> DataFrame:
    """One-row broadcast frame: ``books`` = array (indexed by sub) of
    arrays of (cid, cv), each inner list sorted by cid.

    r14 (guide §1.2 per-task work): the former flat (sub, cid, cv) pack
    made every row FILTER all M*K structs to find its subspace's K; the
    by-sub nesting makes that an O(1) ``element_at``. Values unchanged —
    the same (cid, cv) pairs reach the same argmin, and the (d, cid)
    struct sort is total, so inner list order cannot affect the pick."""
    per_sub = codebooks.groupBy("sub").agg(
        F.array_sort(F.collect_list(F.struct("cid", "cv"))).alias("bk")
    )
    return per_sub.agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("sub", "bk"))),
            lambda s: s["bk"],
        ).alias("books")
    )


def _assign_codes(
    subs: DataFrame, codebooks: DataFrame, keep_sv: bool = False
) -> DataFrame:
    """(vec_id, sub, cid[, sv]): argmin L2 of each subvector against ITS
    subspace's centroids. All M codebooks ride in one broadcast row,
    nested by sub (``_pack_books_by_sub``) so the per-row lookup is an
    ``element_at``, not an M*K filter — still a pure map over the
    corpus. ``keep_sv`` carries the subvector through so the k-means
    update can aggregate directly — without it the fit paid a
    (vec_id, sub)-keyed shuffle join per iteration just to re-attach
    the sv it had projected away (guide §2.4)."""
    packed = _pack_books_by_sub(codebooks)
    mine = F.element_at(F.col("books"), F.col("sub").cast("int") + 1)

    def score(c):
        return F.struct(
            _sq_l2(F.col("sv"), c["cv"]).alias("d"), c["cid"].alias("cid")
        )

    best = F.element_at(F.array_sort(F.transform(mine, score)), 1)
    cols = ["vec_id", "sub", best["cid"].alias("cid")]
    if keep_sv:
        cols.append(F.col("sv"))
    return subs.crossJoin(F.broadcast(packed)).select(*cols)


def fit_pq_codebooks(
    vectors: DataFrame, dim: int, m: int = 8, k: int = 16, iterations: int = 2
) -> DataFrame:
    """Fit M codebooks of K centroids each; returns (sub, cid, cv).

    Init: subvectors of the k lowest vec_ids (cid = 0..k-1 by seed
    rank). All M subspaces train TOGETHER — each Lloyd's round is one
    assignment map + one mean shuffle over (sub, cid, dim) keys, not M
    separate jobs."""
    subs = _subvectors(vectors, dim, m).localCheckpoint(eager=True)
    # k seed rows only — the single-partition window is control-plane
    seed_ids = (
        vectors.select("vec_id").orderBy("vec_id").limit(k)
        .withColumn("cid", F.row_number().over(W.orderBy("vec_id")) - 1)
    )
    books = (
        subs.join(seed_ids, "vec_id")
        .select("sub", "cid", F.col("sv").alias("cv"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        # keep_sv: the assignment map carries its input subvector, so the
        # update aggregates straight off the scan — one Exchange per
        # round (the mean shuffle), no re-attach join
        assigned = _assign_codes(subs, books, keep_sv=True)
        dims = assigned.select(
            "sub", "cid", F.posexplode("sv").alias("d", "x")
        )
        books = (
            dims.groupBy("sub", "cid", "d")
            .agg(F.avg("x").alias("mu"))
            .groupBy("sub", "cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("d", "mu"))),
                    lambda s: s["mu"],
                ).alias("cv")
            )
            .localCheckpoint(eager=True)
        )
    return books


def encode_pq(
    vectors: DataFrame,
    dim: int,
    m: int,
    codebooks: DataFrame,
    carry: list[str] | None = None,
) -> DataFrame:
    """(vec_id[, *carry], codes: array<int> of length m) — each vector
    compressed to its per-subspace nearest-centroid ids. ``carry`` names
    extra input columns to pass through (IvfPqIndex carries ``cid`` so
    it never has to join codes back to assignments).

    A genuinely pure map (r14): all m per-subspace argmins are computed
    inside ONE projection over the vector row — the former
    explode-to-m-rows + groupBy(vec_id) + collect_list shape shuffled
    the whole corpus just to reassemble rows it had itself split
    (guide §2.4: remove shuffles outright). Each subspace's argmin uses
    the same _sq_l2 + array_sort((d, cid)) expression as _assign_codes,
    so the codes are identical."""
    packed = _pack_books_by_sub(codebooks)
    slices = _sub_slices(dim, m)

    def code_for(s: int, start: int, ln: int):
        # by-sub nested pack: O(1) element_at, not an M*K filter per
        # subspace per row (values identical — see _pack_books_by_sub)
        mine = F.element_at(F.col("books"), s + 1)
        sv = F.slice("v", start, ln)

        def score(c):
            return F.struct(
                _sq_l2(sv, c["cv"]).alias("d"), c["cid"].alias("cid")
            )

        return F.element_at(F.array_sort(F.transform(mine, score)), 1)["cid"]

    codes = F.array(
        *[code_for(s, start, ln) for s, (start, ln) in enumerate(slices)]
    )
    return vectors.crossJoin(F.broadcast(packed)).select(
        "vec_id", *(carry or []), codes.alias("codes")
    )


def adc_topk(
    query: list[float],
    codes: DataFrame,
    codebooks: DataFrame,
    dim: int,
    m: int,
    k: int = 10,
    rerank_vectors: DataFrame | None = None,
    candidates: int = 64,
    rerank_query: list[float] | None = None,
) -> DataFrame:
    """Asymmetric-distance top-k: distance(query, x) ≈ Σ_sub
    ||q_sub − centroid(code_sub)||². The M*K lookup table is built from
    the collected codebooks (tiny control plane) and broadcast as a
    literal map; each encoded row sums M lookups — the corpus scan never
    touches a float vector. Returns (vec_id, approx_dist) ascending.

    With ``rerank_vectors`` (vec_id, v) the standard production shape
    applies: ADC prefilters to ``candidates`` ids (TakeOrdered — no
    global sort), then ONLY those rows' raw vectors are fetched via a
    broadcast semi-join and scored with exact L2. Quantization error
    then only has to keep true neighbors inside the candidate set, not
    rank them — recall jumps accordingly while the corpus scan still
    reads codes, not floats."""
    slices = _sub_slices(dim, m)
    rows = codebooks.collect()  # M*K rows — control plane by design
    table: dict[int, float] = {}
    for r in rows:
        start, ln = slices[r["sub"]]
        q_sub = query[start - 1 : start - 1 + ln]
        d = sum((a - b) * (a - b) for a, b in zip(q_sub, r["cv"]))
        table[r["sub"] * 1024 + r["cid"]] = d
    lut = F.create_map(
        *[x for kk, vv in sorted(table.items()) for x in (F.lit(kk), F.lit(vv))]
    )
    dist = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, s: F.element_at(lut, (s * 1024 + c).cast("int")),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    scored = codes.select("vec_id", F.round(dist, 6).alias("approx_dist"))
    if rerank_vectors is None:
        return scored.orderBy("approx_dist", "vec_id").limit(k)
    cand = scored.orderBy("approx_dist", "vec_id").limit(candidates).select(
        "vec_id"
    )
    # under a pre-transform (OPQ) the ADC ranking runs in rotated space
    # while rerank_vectors may be ORIGINAL-space rows — rerank_query
    # carries the matching-space query (defaults to the ADC query)
    qlit = double_array_lit(rerank_query or query)
    exact = _sq_l2(F.col("v"), qlit)
    return (
        rerank_vectors.join(F.broadcast(cand), "vec_id")
        .select("vec_id", F.round(exact, 6).alias("exact_dist"))
        .orderBy("exact_dist", "vec_id")
        .limit(k)
    )
