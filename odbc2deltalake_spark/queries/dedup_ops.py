r"""Deduplication operators over `documents` — exact, n-gram Jaccard,
MinHash+LSH, and SimHash.

Shared building block: 3-word shingles, built portably (posexplode + lead
window in Spark; parallel unnest + lead in the DuckDB oracle) so both
engines see byte-identical shingle sets. All hashes are md5-hex (identical
across engines); min/lexicographic comparisons on hex strings stand in for
integer minhash values.

Scale notes:
- Exact dedup is a hash-groupBy: one shuffle on the 128-bit digest, no
  skew (uniform hash keys).
- MinHash LSH: signature build is a per-doc aggregation (shuffle on
  doc_id), banding re-keys by (band, band_key) — candidate generation
  never goes quadratic; only same-bucket docs meet. That is the 100 TB
  path: bucket sizes stay bounded because identical band keys mean
  near-identical content.
- The brute-force n-gram Jaccard pair join is the *verification* step;
  it runs only on LSH candidates at scale (here also standalone, to pin
  its algebra on the small oracle set).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from odbc2deltalake_spark.queries.registry import load_table, register

# --------------------------------------------------------- exact dedup ----

# The fixture has no exact duplicates, so both engines extend the corpus
# with deterministic near-copies (doc_id < 50 re-inserted at doc_id+1000000
# with extra whitespace/punctuation that normalization strips) — the check
# matches on a NON-EMPTY group set and can actually fail on a wrong
# normalization or grouping.
_EXACT_ORACLE = r"""
WITH ext AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, '  ' || text || ' !!' FROM documents WHERE doc_id < 50
)
SELECT md5(lower(regexp_replace(text, '[^a-zA-Z0-9]', '', 'g'))) AS content_hash,
       min(doc_id) AS canonical_doc_id,
       count(*) AS n_copies
FROM ext
GROUP BY 1
HAVING count(*) > 1
"""


@register("dedup_exact", _EXACT_ORACLE, tags=("dedup",))
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by normalized-content hash; keeps the lowest
    doc_id as canonical. Hash-groupBy → uniformly distributed shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ext = docs.unionByName(
        docs.filter(F.col("doc_id") < 50).select(
            (F.col("doc_id") + 1000000).alias("doc_id"),
            F.concat(F.lit("  "), F.col("text"), F.lit(" !!")).alias("text"),
        )
    )
    h = F.md5(F.lower(F.regexp_replace(F.col("text"), "[^a-zA-Z0-9]", "")))
    return (
        ext.groupBy(h.alias("content_hash"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .filter(F.col("n_copies") > 1)
    )


# ------------------------------------------------------------ shingles ----

# DuckDB shingle CTE (3-word shingles, DISTINCT per doc)
_SHINGLE_CTE = r"""
words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
         unnest(generate_series(1, len(regexp_split_to_array(trim(text), '\s+')))) AS pos
  FROM documents
),
shingles AS (
  SELECT DISTINCT doc_id,
         w || ' ' || lead(w, 1) OVER (PARTITION BY doc_id ORDER BY pos)
           || ' ' || lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS shingle
  FROM words
  QUALIFY lead(w, 2) OVER (PARTITION BY doc_id ORDER BY pos) IS NOT NULL
)
"""


def shingle_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct 3-word shingles per document: (doc_id, shingle).

    Spark-side: split → posexplode → lead window. The window shuffles on
    doc_id once; everything after stays partitioned by doc_id.

    Measured alternative (kept for the record): a fully map-side build —
    words array + ``transform(sequence(...))`` 3-gram slide +
    ``array_distinct`` + explode — removes both shuffles, but benchmarked
    *slower* at sf0.1 (array/lambda eval overhead dominates on these
    ~55-word docs; and NB: referencing the split expr inside the lambda
    re-evaluates it per gram, 5x worse — materialize the array first).
    For long-document corpora where the word-stream shuffle dominates,
    the array-side form is the right swap."""
    # r15: spreading the 1-partition fixture scan before the explode was
    # measured (interleaved on/off x3, warm): dedup_minhash_lsh 2.4 off
    # vs 2.5 on, corpus_decontaminate_fuzzy ~5.0 both — FLAT, so the
    # site stays unspread (the window shuffle dominates, not the
    # pre-shuffle explode; cf. functions/spread.py for the sites where
    # the same device measurably wins).
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "w")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    return (
        words.withColumn("w1", F.lead("w", 1).over(w))
        .withColumn("w2", F.lead("w", 2).over(w))
        .filter(F.col("w2").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", "w", "w1", "w2").alias("shingle"),
        )
        .distinct()
    )


# ------------------------------------------------- n-gram Jaccard pairs ----

_JACCARD_THRESHOLD = 0.4

_NGRAM_ORACLE = f"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingles a
  JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       round(n_common * 1.0 / (sa.n + sb.n - n_common), 4) AS jaccard
FROM pairs
JOIN sizes sa ON doc_a = sa.doc_id
JOIN sizes sb ON doc_b = sb.doc_id
WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {_JACCARD_THRESHOLD}
"""


@register("dedup_ngram_jaccard", _NGRAM_ORACLE, tags=("dedup",),
          priority=100)  # r10: rotated out (dedup_minhash_lsh/dedup_cluster/corpus_decontaminate_fuzzy hold fuzzy dedup; green r1-r9)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate pairs by exact 3-gram Jaccard ≥ 0.4: join docs on
    shared shingles, count common, divide by union size. The shingle join
    is the candidate generator; at 100 TB this exact step runs only on
    LSH candidates (see dedup_minhash_lsh)."""
    # localCheckpoint: shingles feed the self-join twice plus sizes
    sh = shingle_df(spark, sf_dir).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = sh.alias("a")
    b = sh.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") * F.lit(1.0) / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        pairs.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# --------------------------------------------------------- MinHash LSH ----

_N_HASHES = 8
_BAND_SIZE = 2  # => 4 bands; P(candidate) ≈ 1-(1-j^2)^4


def _minhash_cols_sql() -> str:
    # ONE md5 per shingle; the 8 hash functions are xor/shift mixes of the
    # two 60-bit halves of the digest. JVM MessageDigest.getInstance runs
    # per md5() call, so 8 seeded digests per shingle was 8x the cost for
    # no extra independence a min-sketch needs.
    return ", ".join(
        f"min(xor(('0x' || substr(md5(shingle), 1, 15))::BIGINT, "
        f"('0x' || substr(md5(shingle), 17, 15))::BIGINT >> {i})) AS h{i}"
        for i in range(_N_HASHES)
    )


def _band_rows_sql() -> str:
    rows = []
    for b in range(_N_HASHES // _BAND_SIZE):
        cols = " || '|' || ".join(
            f"h{b * _BAND_SIZE + i}::VARCHAR" for i in range(_BAND_SIZE)
        )
        rows.append(f"SELECT doc_id, {b} AS band, md5({cols}) AS band_key FROM sigs")
    return " UNION ALL ".join(rows)


_MINHASH_ORACLE = f"""
WITH {_SHINGLE_CTE},
sigs AS (
  SELECT doc_id, {_minhash_cols_sql()}
  FROM shingles GROUP BY doc_id
),
bands AS ({_band_rows_sql()}),
candidates AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
verified AS (
  SELECT c.doc_a, c.doc_b, count(*) AS n_common
  FROM candidates c
  JOIN shingles a ON a.doc_id = c.doc_a
  JOIN shingles b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY 1, 2
)
SELECT v.doc_a, v.doc_b,
       round(v.n_common * 1.0 / (sa.n + sb.n - v.n_common), 4) AS jaccard
FROM verified v
JOIN sizes sa ON v.doc_a = sa.doc_id
JOIN sizes sb ON v.doc_b = sb.doc_id
WHERE v.n_common * 1.0 / (sa.n + sb.n - v.n_common) >= {_JACCARD_THRESHOLD}
"""


def _minhash_bands(spark: SparkSession, sf_dir: str):
    """Shared MinHash machinery: (sh, sigs, bands).

    - ``sh``: checkpointed distinct shingles (the lineage is otherwise
      recomputed 4x: signatures, both verify sides, sizes);
    - ``sigs``: per-doc signatures h0..h{N-1} plus the shingle-set size
      ``n`` riding the SAME aggregation (no separate sizes shuffle; the
      final size joins broadcast a docs-sized frame). Minhash values are
      60-bit bigints (md5-prefix halves xor/shift-mixed) so the 8-way
      min() aggregation stays fixed-width hash aggregation, not a sort;
      checkpointed so the band projections don't recompute it once each;
    - ``bands``: the (doc_id, band, band_key) projection, 4 bands of 2.

    Used by dedup_minhash_lsh (all-pairs near-dup) and
    corpus_decontaminate_fuzzy (train-vs-eval matching) — one
    implementation so the hashing/banding/checkpoint strategy cannot
    silently diverge between them."""
    sh = shingle_df(spark, sf_dir).localCheckpoint(eager=False)
    dig = F.md5(F.col("shingle"))
    v = F.conv(F.substring(dig, 1, 15), 16, 10).cast("long")
    w = F.conv(F.substring(dig, 17, 15), 16, 10).cast("long")
    hashed = sh.select("doc_id", v.alias("__v"), w.alias("__w"))
    mh = [
        F.min(F.col("__v").bitwiseXOR(F.shiftright(F.col("__w"), i))).alias(f"h{i}")
        for i in range(_N_HASHES)
    ]
    mh.append(F.count(F.lit(1)).alias("n"))
    sigs = hashed.groupBy("doc_id").agg(*mh).localCheckpoint(eager=False)
    band_parts = []
    for b in range(_N_HASHES // _BAND_SIZE):
        cols = [
            F.col(f"h{b * _BAND_SIZE + i}").cast("string")
            for i in range(_BAND_SIZE)
        ]
        band_parts.append(
            sigs.select(
                "doc_id",
                F.lit(b).alias("band"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    bands = band_parts[0]
    for p in band_parts[1:]:
        bands = bands.unionByName(p)
    return sh, sigs, bands


@register("dedup_minhash_lsh", _MINHASH_ORACLE, tags=("dedup",))
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + LSH near-dup detection: 8 minhashes per doc (min of
    seeded md5 over shingles), 4 bands of 2, candidate pairs share a band
    key, then exact-Jaccard verification of candidates only.

    This is the scale path: candidate generation is groupBy(band_key) —
    linear in corpus size — instead of the quadratic shingle self-join.

    Perf: shingles are localCheckpoint'ed (the lineage is otherwise
    recomputed 4x: signatures, both verify sides, sizes); minhash values
    are 60-bit bigints (md5-prefix) so the 8-way min() aggregation stays
    fixed-width and uses hash aggregation, not a sort."""
    sh, sigs, bands = _minhash_bands(spark, sf_dir)
    a = bands.alias("a")
    b = bands.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    sha = sh.alias("sha")
    shb = sh.alias("shb")
    verified = (
        candidates.join(sha, F.col("doc_a") == F.col("sha.doc_id"))
        .join(
            shb,
            (F.col("doc_b") == F.col("shb.doc_id"))
            & (F.col("shb.shingle") == F.col("sha.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sigs.select("doc_id", "n")
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") * F.lit(1.0) / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    return (
        verified.join(F.broadcast(sa), F.col("doc_a") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("doc_b") == F.col("sb.doc_id"))
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", F.round(jac, 4).alias("jaccard"))
    )


# ------------------------------------------------------------- SimHash ----

_SIMHASH_BITS = 60  # 15 hex chars of md5 → fits a signed 64-bit int


def _simhash_bitsum_sql() -> str:
    # per-word 60-bit hash; bit j contributes +1/-1 to bit-sum j
    return ", ".join(
        f"sum(CASE WHEN (wh // {1 << j}) % 2 = 1 THEN 1 ELSE -1 END) AS bs{j}"
        for j in range(_SIMHASH_BITS)
    )


_SIMHASH_ORACLE = rf"""
WITH words AS (
  SELECT DISTINCT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS w
  FROM documents
),
hashed AS (
  SELECT doc_id, ('0x' || substr(md5(w), 1, 15))::BIGINT AS wh FROM words
),
bitsums AS (
  SELECT doc_id, {_simhash_bitsum_sql()}
  FROM hashed GROUP BY doc_id
)
SELECT doc_id,
       CAST({" + ".join(f"(CASE WHEN bs{j} > 0 THEN {1 << j} ELSE 0 END)" for j in range(_SIMHASH_BITS))} AS BIGINT) AS simhash
FROM bitsums
"""


@register("dedup_simhash", _SIMHASH_ORACLE, tags=("dedup",),
          priority=100)  # r8: rotated out (minhash_lsh keeps fuzzy-dedup in-window; green r2-r7)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash document fingerprint: 60-bit hash per distinct word
    (md5-hex → bigint), each bit votes +1/-1, fingerprint bit = sign of
    the vote sum. Near-dups then differ in few bits (hamming); pairing is
    a 4-chunk LSH regroup, linear like MinHash banding."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w")
    ).distinct()
    wh = F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10).cast("long")
    hashed = words.select("doc_id", wh.alias("wh"))
    bitsums = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when((F.col("wh").bitwiseAND(F.lit(1 << j))) != 0, 1).otherwise(-1)
            ).alias(f"bs{j}")
            for j in range(_SIMHASH_BITS)
        ]
    )
    fingerprint = None
    for j in range(_SIMHASH_BITS):
        term = F.when(F.col(f"bs{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        fingerprint = term if fingerprint is None else fingerprint + term
    return bitsums.select("doc_id", fingerprint.cast("long").alias("simhash"))


# ------------------------------------------------ dedup clustering (CC) ----
# The step after pair detection in a real dedup pipeline: group near-dup
# pairs into connected components and elect a canonical doc per component
# (keep-one-drop-rest). Iterative min-label propagation in Spark — the
# Pregel pattern expressed in DataFrame algebra — pinned against a
# recursive-CTE transitive closure in DuckDB.

_CLUSTER_ORACLE = f"""
WITH RECURSIVE pairs AS ({_MINHASH_ORACLE}),
und AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
walk(u, v) AS (
  SELECT u, v FROM und
  UNION
  SELECT w.u, e.v FROM walk w JOIN und e ON w.v = e.u
)
SELECT u AS doc_id, min(v) AS canonical_id,
       count(DISTINCT v) AS cluster_size
FROM walk GROUP BY u
"""
# (walk reaches u itself via the 2-cycle every undirected edge forms, so
# v ranges over the FULL component including u: min(v) is the canonical
# id and count(DISTINCT v) the component size.)


@register("dedup_cluster", _CLUSTER_ORACLE, tags=("dedup",))
def dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH verified near-dup pairs:
    every clustered doc with its canonical (minimum) doc_id and component
    size.

    Iterative min-label propagation: each round every node takes the min
    of its own and its neighbors' labels; converged when no label
    changes. Rounds = component diameter (near-dup clusters are shallow —
    a handful of rounds in practice). Each round is one shuffle of the
    label table on node id; labels are localCheckpoint'ed per round so
    the lineage (and its recomputation) does not grow with iteration
    count — the standard driver-coordinated iterative pattern (the loop
    moves no data through the driver; the convergence check is a count).

    (r14 note: an earlier draft memoized the converged labels per
    (session, sf_dir); removed — the optimization round's contract is
    that every invocation computes from the parquet inputs, and a result
    memo would make the bench's min-of-2 time a cache read.)
    """
    # both directions of every undirected edge in ONE pass over the pair
    # list (explode of a 2-struct array), so a single eager checkpoint
    # materializes the symmetric edge list — the former
    # checkpoint(pairs) + union-of-two-projections + checkpoint(edges)
    # shape paid an extra materialization job and a second pairs scan
    # for the same rows (guide §1.2: remove passes before tuning tasks)
    edges = (
        dedup_minhash_lsh(spark, sf_dir)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
                    ),
                    F.struct(
                        F.col("doc_b").alias("src"), F.col("doc_a").alias("dst")
                    ),
                )
            ).alias("e")
        )
        .select("e.src", "e.dst")
        .localCheckpoint(eager=True)
    )
    # r14: the loop lives in operators/components.py (min_label_
    # propagation) so the scale study drives the PRODUCTION loop — see
    # tests/test_components.py for the mega-component/hub-skew pins
    from odbc2deltalake_spark.operators.components import (
        min_label_propagation,
    )

    labels, _rounds = min_label_propagation(edges, max_rounds=50)
    sizes = labels.groupBy("lbl").agg(F.count(F.lit(1)).alias("cluster_size"))
    return labels.join(sizes, "lbl").select(
        F.col("node").alias("doc_id"),
        F.col("lbl").alias("canonical_id"),
        F.col("cluster_size"),
    )


# ------------------------------------- cross-doc duplicated substrings ----
# Substring-level dedup (the "exact substring dedup" of Lee et al.,
# "Deduplicating Training Data Makes Language Models Better"): find the
# maximal word spans that occur verbatim in MORE THAN ONE document. The
# suffix-array formulation is inherently sequential; the distributed
# equivalent is positional k-gram hashing — a gram is "duplicated" iff
# its hash occurs in >1 distinct doc, and runs of consecutive duplicated
# gram positions merge into maximal spans (pos - row_number islands).
# Linear in corpus size: one shuffle on the gram hash, one window per doc.

_SPAN_K = 8  # words per gram; spans shorter than K words are not flagged

# The fixture corpus is near-dup-rich but shares few verbatim 8-grams, so
# both engines extend it with deterministic PREFIX CLONES (first 30 words
# of each doc_id < 50 re-inserted at doc_id+1000000): every clone gram
# also occurs in its source doc, giving each source a known duplicated
# span over words 1..30 — the check fails on any off-by-one in gram
# positions, island merging, or span arithmetic.
_SPAN_CLONE_WORDS = 30

_SPAN_ORACLE = rf"""
WITH ext AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         array_to_string(regexp_split_to_array(trim(text), '\s+')[1:{_SPAN_CLONE_WORDS}], ' ')
  FROM documents WHERE doc_id < 50
),
words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
         unnest(generate_series(1, len(regexp_split_to_array(trim(text), '\s+')))) AS pos
  FROM ext
),
grams AS (
  SELECT doc_id, pos,
         md5({" || ' ' || ".join(["w"] + [f"lead(w, {i}) OVER win" for i in range(1, _SPAN_K)])}) AS gk
  FROM words
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(w, {_SPAN_K - 1}) OVER win IS NOT NULL
),
dup AS (
  SELECT gk FROM grams GROUP BY gk HAVING count(DISTINCT doc_id) > 1
),
hits AS (
  SELECT g.doc_id, g.pos,
         g.pos - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS island
  FROM grams g JOIN dup USING (gk)
)
SELECT doc_id, min(pos) AS span_start, max(pos) + {_SPAN_K - 1} AS span_end,
       count(*) AS n_grams
FROM hits GROUP BY doc_id, island
"""


def _span_clones(docs: DataFrame) -> DataFrame:
    """The deterministic prefix clones both engines plant (see the
    _SPAN_ORACLE comment): first _SPAN_CLONE_WORDS words of each
    doc_id < 50, re-inserted at doc_id + 1000000."""
    return docs.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, _SPAN_CLONE_WORDS)
        ).alias("text"),
    )


def _positional_grams(ext: DataFrame, k: int) -> DataFrame:
    """(doc_id, text) -> (doc_id, pos, gk) — canonical implementation
    lives in operators/substring_index.py (r14: the persisted
    incremental index shares the exact gram builder with the batch
    operator, so the two cannot drift; docstring and the zero-shuffle /
    xxhash64 scale rationale live there)."""
    from odbc2deltalake_spark.operators.substring_index import (
        positional_grams,
    )

    return positional_grams(ext, k)


@register("dedup_substring_spans", _SPAN_ORACLE, tags=("dedup",),
          priority=100)  # r12: rotated out (dedup_exact/minhash/cluster/keep_best hold the family; green r5-r11)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal word spans duplicated across documents (cross-doc verbatim
    8-grams, adjacent positions merged): per doc, the 1-based word range
    [span_start, span_end] and how many duplicated grams it merged.

    Scale shape: gram build is map-side array arithmetic (zero shuffle —
    see _positional_grams), duplicate detection is a hash-groupBy on the
    gram digest (uniform keys), and the island merge is a per-doc window
    over only the DUPLICATED grams — everything linear, no self-join.
    The dup-key set is only as large as actually-duplicated content, so
    the grams⨝dup join broadcasts on clean corpora and AQE picks the
    shuffle join when duplication is rampant."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ext = docs.unionByName(_span_clones(docs))
    grams = _positional_grams(ext, _SPAN_K)
    win = W.partitionBy("doc_id").orderBy("pos")
    dup = (
        grams.groupBy("gk")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") > 1)
        .select("gk")
    )
    hits = grams.join(dup, "gk").withColumn(
        "island", F.col("pos") - F.row_number().over(win)
    )
    return hits.groupBy("doc_id", "island").agg(
        F.min("pos").alias("span_start"),
        (F.max("pos") + F.lit(_SPAN_K - 1)).alias("span_end"),
        F.count(F.lit(1)).alias("n_grams"),
    ).select("doc_id", "span_start", "span_end", "n_grams")


# ------------------------- incremental substring index (persisted) ----


@register("dedup_substring_incremental", _SPAN_ORACLE,
          tags=("dedup", "index", "flagship"), priority=100)
def dedup_substring_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Persisted incremental substring-dedup index == the one-shot batch
    operator (r14, VERDICT r13 #8 — the DedupIndex/Bm25Index/IvfPq
    incremental-oracle pattern applied to substring dedup).

    Build the SubstringIndex on the ORIGINAL docs, then append() the
    prefix clones as a second batch — so every duplicated gram is
    CROSS-BATCH (the new batch's grams must pair against the stored
    counts partials, the hardest incremental case). In-query asserts:
    the append added commits without rewriting the build version (time
    travel reads the original gram count), and the summed per-batch
    distinct-doc partials drive span detection. The final spans() must
    hash-equal the same one-shot SQL the batch row uses — proving the
    split-build is invisible to consumers. Per-update cost is O(batch):
    one gram scan, two appends; see operators/substring_index.py for
    the 100 TB shape."""
    import shutil
    import tempfile

    from odbc2deltalake_spark.operators.substring_index import SubstringIndex

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    root = tempfile.mkdtemp(prefix="substr_idx_")
    try:
        idx = SubstringIndex(root, k=_SPAN_K)
        idx.build(docs)
        v_build = idx.grams.version()
        n_build = idx.grams.read(spark).count()
        idx.append(_span_clones(docs))
        assert idx.grams.version() > v_build, "append added no commit"
        assert (
            idx.grams.read(spark, version=v_build).count() == n_build
        ), "append rewrote the build version"
        return idx.spans(spark).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


# ------------------------------------- duplicated-substring STRIP apply ----
# The apply side of substring dedup (detection above in
# dedup_substring_spans): every duplicated gram occurrence in a
# NON-canonical doc (canonical = lowest doc_id containing that gram) is
# merged into spans and those word ranges are removed from the doc —
# canonical occurrences survive, so each duplicated substring remains in
# the corpus exactly once. Per-doc output pins word counts, removal
# counts, and the md5 of the rebuilt text in both engines.

_STRIP_ORACLE = rf"""
WITH ext AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000,
         array_to_string(regexp_split_to_array(trim(text), '\s+')[1:{_SPAN_CLONE_WORDS}], ' ')
  FROM documents WHERE doc_id < 50
),
words AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
         unnest(generate_series(1, len(regexp_split_to_array(trim(text), '\s+')))) AS pos
  FROM ext
),
grams AS (
  SELECT doc_id, pos,
         md5({" || ' ' || ".join(["w"] + [f"lead(w, {i}) OVER win" for i in range(1, _SPAN_K)])}) AS gk
  FROM words
  WINDOW win AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY lead(w, {_SPAN_K - 1}) OVER win IS NOT NULL
),
gkinfo AS (
  SELECT gk, min(doc_id) AS cdoc
  FROM grams GROUP BY gk HAVING count(DISTINCT doc_id) > 1
),
hits AS (
  SELECT g.doc_id, g.pos,
         g.pos - row_number() OVER (PARTITION BY g.doc_id ORDER BY g.pos) AS island
  FROM grams g JOIN gkinfo USING (gk)
  WHERE g.doc_id <> gkinfo.cdoc
),
spans AS (
  SELECT doc_id, min(pos) AS lo, max(pos) + {_SPAN_K - 1} AS hi
  FROM hits GROUP BY doc_id, island
),
rm AS (
  SELECT DISTINCT w.doc_id, w.pos
  FROM words w JOIN spans s ON w.doc_id = s.doc_id AND w.pos BETWEEN s.lo AND s.hi
)
SELECT w.doc_id,
       count(*) AS n_words,
       count(*) FILTER (WHERE rm.pos IS NOT NULL) AS n_removed,
       md5(coalesce(string_agg(CASE WHEN rm.pos IS NULL THEN w.w END, ' ' ORDER BY w.pos), '')) AS stripped_hash
FROM words w LEFT JOIN rm ON w.doc_id = rm.doc_id AND w.pos = rm.pos
GROUP BY w.doc_id
"""


@register("dedup_substring_strip", _STRIP_ORACLE, tags=("dedup",), priority=100)  # r7: rotated out (dedup_substring_spans keeps the family in-window)
def dedup_substring_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strip cross-doc duplicated spans from non-canonical documents:
    per doc, the original word count, how many words were removed, and
    the md5 of the text rebuilt from surviving words.

    Same linear skeleton as dedup_substring_spans (map-side gram build →
    hash-groupBy → island window over duplicated grams only) plus one
    per-doc rebuild aggregation; the only new shuffle is the
    removal-position join, keyed (doc_id, pos) — uniform."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ext = docs.unionByName(_span_clones(docs))
    words = ext.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos0", "w"),
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "w")
    win = W.partitionBy("doc_id").orderBy("pos")
    grams = _positional_grams(ext, _SPAN_K)
    gkinfo = (
        grams.groupBy("gk")
        .agg(
            F.countDistinct("doc_id").alias("nd"),
            F.min("doc_id").alias("cdoc"),
        )
        .filter(F.col("nd") > 1)
        .select("gk", "cdoc")
    )
    hits = (
        grams.join(gkinfo, "gk")
        .filter(F.col("doc_id") != F.col("cdoc"))
        .withColumn("island", F.col("pos") - F.row_number().over(win))
    )
    spans = hits.groupBy("doc_id", "island").agg(
        F.min("pos").alias("lo"), (F.max("pos") + F.lit(_SPAN_K - 1)).alias("hi")
    )
    rm = (
        words.join(spans, "doc_id")
        .filter(F.col("pos").between(F.col("lo"), F.col("hi")))
        .select("doc_id", "pos")
        .distinct()
        .withColumn("rm", F.lit(True))
    )
    marked = words.join(rm, ["doc_id", "pos"], "left")
    kept_in_order = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(F.col("rm").isNull(), F.struct("pos", "w"))
            )
        ),
        lambda s: s["w"],
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_words"),
        F.count(F.col("rm")).alias("n_removed"),
        F.md5(F.concat_ws(" ", kept_in_order)).alias("stripped_hash"),
    )


# ------------------------------------------- fuzzy decontamination ----
# corpus_decontaminate (queries/corpus_ops.py) catches VERBATIM eval
# overlap (shared word 8-grams). Paraphrased or lightly-edited benchmark
# leakage slips through exact grams — the published mitigation is
# near-duplicate matching between corpus and eval set (Llama/PaLM-style
# fuzzy decontamination). Same MinHash-LSH machinery as dedup_minhash_lsh,
# restricted to TRAIN x EVAL candidates: linear banding, no all-pairs.

_FUZZY_EVAL_CUT = 950_000  # same md5 split rule as corpus_decontaminate


def _fuzzy_decon_oracle() -> str:
    return f"""
WITH {_SHINGLE_CTE},
sigs AS (
  SELECT doc_id, {_minhash_cols_sql()}
  FROM shingles GROUP BY doc_id
),
bands AS ({_band_rows_sql()}),
flagged AS (
  SELECT b.doc_id, b.band, b.band_key,
         ('0x' || substr(md5(b.doc_id::VARCHAR), 1, 12))::BIGINT % 1000000
           >= {_FUZZY_EVAL_CUT} AS is_eval
  FROM bands b
),
candidates AS (
  SELECT DISTINCT t.doc_id AS tdoc, e.doc_id AS edoc
  FROM flagged t JOIN flagged e
    ON t.band = e.band AND t.band_key = e.band_key
   AND NOT t.is_eval AND e.is_eval
),
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
verified AS (
  SELECT c.tdoc, c.edoc, count(*) AS n_common
  FROM candidates c
  JOIN shingles a ON a.doc_id = c.tdoc
  JOIN shingles b ON b.doc_id = c.edoc AND b.shingle = a.shingle
  GROUP BY 1, 2
),
scored AS (
  SELECT v.tdoc, v.edoc,
         v.n_common * 1.0 / (sa.n + sb.n - v.n_common) AS j
  FROM verified v
  JOIN sizes sa ON v.tdoc = sa.doc_id
  JOIN sizes sb ON v.edoc = sb.doc_id
  WHERE v.n_common * 1.0 / (sa.n + sb.n - v.n_common) >= {_JACCARD_THRESHOLD}
)
SELECT tdoc AS doc_id, edoc AS eval_doc_id, round(j, 4) AS jaccard
FROM (
  SELECT *, row_number() OVER (PARTITION BY tdoc ORDER BY j DESC, edoc) AS rn
  FROM scored
) WHERE rn = 1
"""


@register("corpus_decontaminate_fuzzy", None, tags=("corpus", "dedup"))
def corpus_decontaminate_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate contamination between training corpus and eval
    split: training docs whose MinHash-verified Jaccard to ANY eval doc
    clears the near-dup threshold, each with its best-matching eval doc.

    Scale shape — identical to dedup_minhash_lsh up to the band join,
    then strictly cheaper: the candidate join is TRAIN x EVAL within a
    band bucket (the eval side is benchmark-sized), so candidate volume
    is bounded by eval-side bucket membership; verification touches only
    candidate shingle pairs. The argmax per training doc is a window
    over the (tiny) verified-candidate table."""
    sh, sigs, bands = _minhash_bands(spark, sf_dir)
    is_eval = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 12), 16, 10)
        .cast("long")
        % 1_000_000
        >= _FUZZY_EVAL_CUT
    )
    flagged = bands.withColumn("is_eval", is_eval)
    t = flagged.filter(~F.col("is_eval")).alias("t")
    e = flagged.filter(F.col("is_eval")).alias("e")
    candidates = (
        t.join(
            e,
            (F.col("t.band") == F.col("e.band"))
            & (F.col("t.band_key") == F.col("e.band_key")),
        )
        .select(F.col("t.doc_id").alias("tdoc"), F.col("e.doc_id").alias("edoc"))
        .distinct()
    )
    sha = sh.alias("sha")
    shb = sh.alias("shb")
    verified = (
        candidates.join(sha, F.col("tdoc") == F.col("sha.doc_id"))
        .join(
            shb,
            (F.col("edoc") == F.col("shb.doc_id"))
            & (F.col("shb.shingle") == F.col("sha.shingle")),
        )
        .groupBy("tdoc", "edoc")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sizes = sigs.select("doc_id", "n")
    sa = sizes.alias("sa")
    sb = sizes.alias("sb")
    jac = F.col("n_common") * F.lit(1.0) / (
        F.col("sa.n") + F.col("sb.n") - F.col("n_common")
    )
    scored = (
        verified.join(F.broadcast(sa), F.col("tdoc") == F.col("sa.doc_id"))
        .join(F.broadcast(sb), F.col("edoc") == F.col("sb.doc_id"))
        .filter(jac >= _JACCARD_THRESHOLD)
        .select("tdoc", "edoc", jac.alias("j"))
    )
    win = W.partitionBy("tdoc").orderBy(F.col("j").desc(), "edoc")
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select(
            F.col("tdoc").alias("doc_id"),
            F.col("edoc").alias("eval_doc_id"),
            F.round("j", 4).alias("jaccard"),
        )
    )


from odbc2deltalake_spark.queries.registry import QUERIES as _QUERIES  # noqa: E402

_QUERIES["corpus_decontaminate_fuzzy"].oracle = _fuzzy_decon_oracle()


# ----------------------------------------- keep-best dedup retention ----
#
# The retention POLICY on top of near-dup clustering: real pipelines do
# not keep an arbitrary cluster member — they keep the "best" one
# (longest, or highest quality score; Lee et al. keep one canonical
# copy). One row per SURVIVING document: singletons survive as
# themselves, each near-dup cluster contributes exactly its best member
# (longest text, doc_id tiebreak).

_KEEP_BEST_ORACLE = f"""
WITH RECURSIVE pairs AS ({_MINHASH_ORACLE}),
und AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b AS u, doc_a AS v FROM pairs
),
walk(u, v) AS (
  SELECT u, v FROM und
  UNION
  SELECT w.u, e.v FROM walk w JOIN und e ON w.v = e.u
),
clus AS (
  SELECT u AS doc_id, min(v) AS cluster_id,
         count(DISTINCT v) AS cluster_size
  FROM walk GROUP BY u
),
everyone AS (
  SELECT d.doc_id,
         coalesce(c.cluster_id, d.doc_id) AS cluster_id,
         coalesce(c.cluster_size, 1) AS cluster_size,
         d.n_chars
  FROM documents d LEFT JOIN clus c USING (doc_id)
)
SELECT doc_id, cluster_id, cluster_size, n_chars
FROM everyone
QUALIFY row_number() OVER (PARTITION BY cluster_id
                           ORDER BY n_chars DESC, doc_id) = 1
"""


@register("dedup_keep_best", _KEEP_BEST_ORACLE, tags=("dedup",))  # r8: rotated into the driver window
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-aware dedup retention: from each near-dup cluster keep
    the best member (longest text, deterministic doc_id tiebreak);
    unclustered docs survive as their own singleton cluster.

    Scale shape: rides dedup_cluster's label propagation (per-round
    checkpointed, rounds = cluster diameter), then one broadcast-safe
    left join of clusters onto the corpus and a PARTIAL-AGGREGABLE
    argmax per cluster — ``max(struct(n_chars, -doc_id, ...))`` instead
    of a row_number window, because an adversarial corpus (millions of
    identical docs) makes one cluster arbitrarily large: a window
    partition skews onto one task, while the struct-max combines
    map-side and never materializes a cluster in one place. The struct
    ordering is lexicographic, so (n_chars, -doc_id) reproduces the
    policy's exact tie-break (longest, then smallest doc_id). No
    reference analogue (the reference has no corpus surface)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    clus = dedup_cluster(spark, sf_dir)
    everyone = (
        docs.join(clus, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("canonical_id"), F.col("doc_id")).alias(
                "cluster_id"
            ),
            F.coalesce(F.col("cluster_size"), F.lit(1)).alias("cluster_size"),
            "n_chars",
        )
    )
    best = F.max(
        F.struct(
            F.col("n_chars"),
            (-F.col("doc_id")).alias("neg_id"),
            F.col("cluster_size"),
        )
    ).alias("b")
    return (
        everyone.groupBy("cluster_id")
        .agg(best)
        .select(
            (-F.col("b.neg_id")).alias("doc_id"),
            "cluster_id",
            F.col("b.cluster_size").alias("cluster_size"),
            F.col("b.n_chars").alias("n_chars"),
        )
    )


# --------------------------------------------- source overlap matrix ----
#
# Contamination accounting: which SOURCES near-duplicate each other, and
# how much. The per-pair jaccard stream (dedup_ngram_jaccard) is labeled
# with each doc's source and collapsed to a (source_a, source_b) matrix
# — the report a corpus owner reads to decide which crawl feeds to drop
# or dedup against each other (cross-source mass) and which are
# internally redundant (diagonal mass).

_OVERLAP_ORACLE = f"""
WITH {_SHINGLE_CTE},
sizes AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
  FROM shingles a
  JOIN shingles b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
jacc AS (
  SELECT doc_a, doc_b
  FROM pairs
  JOIN sizes sa ON doc_a = sa.doc_id
  JOIN sizes sb ON doc_b = sb.doc_id
  WHERE n_common * 1.0 / (sa.n + sb.n - n_common) >= {_JACCARD_THRESHOLD}
)
SELECT least(da.source, db.source) AS source_a,
       greatest(da.source, db.source) AS source_b,
       count(*) AS n_pairs,
       CAST(count(DISTINCT j.doc_a) + count(DISTINCT j.doc_b) AS BIGINT)
         AS n_docs_involved
FROM jacc j
JOIN documents da ON j.doc_a = da.doc_id
JOIN documents db ON j.doc_b = db.doc_id
GROUP BY 1, 2
"""


@register(
    "dedup_source_overlap", _OVERLAP_ORACLE, tags=("dedup", "corpus"),
    priority=100,
)
def dedup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate mass between sources: the jaccard pair stream
    labeled by source and collapsed to a symmetric (source_a <=
    source_b) matrix with pair and doc counts. Output is bounded by
    #sources^2 — an aggregate report, not a pair dump.

    Scale shape: rides dedup_ngram_jaccard's candidate generator (at
    100 TB that step runs on LSH candidates only — see
    dedup_minhash_lsh); the source labels join on doc_id (keys-only
    projection, AQE picks broadcast vs shuffle-hash) and the matrix
    aggregation is a tiny hash agg."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    pairs = dedup_ngram_jaccard(spark, sf_dir).select("doc_a", "doc_b")
    a = src.alias("da")
    b = src.alias("db")
    lab = (
        pairs.join(a, F.col("doc_a") == F.col("da.doc_id"))
        .join(b, F.col("doc_b") == F.col("db.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            F.least("da.source", "db.source").alias("source_a"),
            F.greatest("da.source", "db.source").alias("source_b"),
        )
    )
    return lab.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (
            F.countDistinct("doc_a") + F.countDistinct("doc_b")
        ).cast("long").alias("n_docs_involved"),
    )
