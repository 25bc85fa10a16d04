"""Multimodal-column operators over a deterministic fake media table
(documents → FK-stub-header + UTF-8 payload bytes; see
odbc2deltalake_spark/operators/multimodal.py).

The payload construction is JVM-side expressions, so DuckDB reproduces it
bit-for-bit (from_hex / encode) — the oracles pin byte-exact plumbing:
header arithmetic, binary concat, digest. The decode/feature kernels are
Arrow-batched mapInPandas; the general codec swap point stays a
try-import stub (Pillow/soundfile/av in production), but PNG is
genuinely DECODED here — operators/png.py is a pure-stdlib codec (zlib
+ all five row filters), exercised end-to-end by mm_png_pixel_stats'
analytic oracle; WAV headers likewise parse for real (mm_audio_meta).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


from odbc2deltalake_spark.operators.multimodal import (
    decode_images,
    extract_features,
    make_fake_media,
    sample_frames,
)
from odbc2deltalake_spark.queries.registry import load_table, register


def _round_half_away(x: float, nd: int = 4) -> float:
    """Round half-away-from-zero, matching DuckDB's round() on DOUBLE.

    Python's round() is banker's (half-to-even); ADVICE r13: a pixel
    mean that is an exactly-representable tie at the 4th decimal
    (sum/len = k/2^m) would hash-mismatch against the oracle. Pixel
    sums are non-negative dyadic rationals, so normalize the kernel to
    DuckDB's convention explicitly rather than relying on fixtures
    never producing a tie."""
    import math

    scaled = x * 10 ** nd
    if x >= 0:
        return math.floor(scaled + 0.5) / 10 ** nd
    return math.ceil(scaled - 0.5) / 10 ** nd

# payload blob in DuckDB: 'FK' + 2 BE bytes width + 2 BE bytes height + text
_PAYLOAD_SQL = """
(from_hex('464b'
   || lpad(to_hex((doc_id % 640 + 16) // 256), 2, '0')
   || lpad(to_hex((doc_id % 640 + 16) % 256), 2, '0')
   || lpad(to_hex((doc_id % 480 + 16) // 256), 2, '0')
   || lpad(to_hex((doc_id % 480 + 16) % 256), 2, '0'))
 || encode(text))
"""

_DECODE_ORACLE = f"""
SELECT doc_id AS media_id,
       (doc_id % 640 + 16)::INT AS width,
       (doc_id % 480 + 16)::INT AS height,
       'STUB' AS mode,
       octet_length({_PAYLOAD_SQL})::INT AS n_bytes
FROM documents
"""


@register("mm_decode_meta", _DECODE_ORACLE, tags=("multimodal",),
          priority=100)  # r14: rotated out (mm_png_pixel_stats + mm_jpeg_pixel_stats pin strictly harder decode paths; green r1-r13)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image decode (stub codec) over binary payloads via mapInPandas —
    the oracle pins the header arithmetic and byte counts the kernel must
    reproduce."""
    media = make_fake_media(load_table(spark, sf_dir, "documents"))
    return decode_images(media)


_DIGEST_ORACLE = f"""
SELECT doc_id AS media_id,
       sha256(lower(hex({_PAYLOAD_SQL}))) AS payload_sha256
FROM documents
"""


@register("mm_payload_digest", _DIGEST_ORACLE, tags=("multimodal",),
          priority=100)  # r8: rotated out (4 mm_* kernels stay in-window; green r3-r7)
def mm_payload_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact payload check: both engines hash the lowercase hex of
    the constructed payload (DuckDB's sha256 is VARCHAR-only) — proves the
    binary plumbing (header bytes + encode concat) is engine-identical."""
    media = make_fake_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.sha2(F.lower(F.hex(F.col("payload"))), 256).alias("payload_sha256"),
    )


# feature expansion in DuckDB: seed = sha256 of payload hex string; the
# 16 uint32s are the 64-byte (seed||seed) stream read big-endian
_FEATURE_ORACLE = f"""
WITH s AS (
  SELECT doc_id AS media_id,
         sha256(lower(hex({_PAYLOAD_SQL}))) AS hx
  FROM documents
)
SELECT media_id,
       16 AS dim,
       md5(array_to_string(list_transform(generate_series(0, 15),
           i -> CAST(('0x' || substr(hx || hx, i*8 + 1, 8))::UBIGINT AS VARCHAR)
       ), ',')) AS feature_digest
FROM s
"""


@register("mm_feature_vectors", _FEATURE_ORACLE, tags=("multimodal", "similarity"),
          priority=100)  # r10: rotated out (mm_decode_meta/mm_audio_meta hold the kernel shape; green r1-r9)
def mm_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction (deterministic sha-seeded stand-in for an
    embedding model). The kernel emits (media_id, feature array<float>,
    feature_digest); downstream ANN consumes `feature`, while the
    correctness gate compares the scalar digest — the oracle reproduces
    the sha-seed → uint32 expansion exactly, so a wrong kernel fails."""
    media = make_fake_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select(
        "media_id", F.size("feature").cast("int").alias("dim"), "feature_digest"
    )


_FRAME_ORACLE = f"""
WITH p AS (
  SELECT doc_id AS media_id,
         lower(hex(encode(text))) AS body_hex,
         octet_length(encode(text)) // 32 AS n_frames
  FROM documents
)
SELECT media_id,
       CAST(i AS INT) AS frame_index,
       md5(substr(body_hex, i*64 + 1, 64)) AS frame_md5
FROM p, unnest(generate_series(0, n_frames - 1, 10)) AS t(i)
WHERE n_frames > 0
"""


@register("mm_frame_sample", _FRAME_ORACLE, tags=("multimodal",),
          priority=100)  # r9: rotated out (mm_decode_meta holds the header-parse shape; green r4-r8)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling (stub): one input row → many frame rows
    through mapInPandas; the oracle re-derives every sampled frame's
    byte-range digest, pinning the fan-out AND the chunk boundaries."""
    media = make_fake_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, every_n=10)


# stub resize: header rewritten to 64x48, body truncated to 384 bytes;
# oracle reproduces the same bytes in the hex domain (no BLOB substring
# in DuckDB 1.0: skip 12 hex chars of header, keep 768 hex chars)
_RESIZE_ORACLE = f"""
WITH p AS (SELECT doc_id, {_PAYLOAD_SQL} AS payload FROM documents)
SELECT doc_id AS media_id, 64 AS width, 48 AS height,
       (6 + least(octet_length(payload) - 6, 384))::INT AS n_bytes,
       md5('464b00400030' || substr(lower(hex(payload)), 13, 768)) AS resized_md5
FROM p
"""


@register("mm_resize", _RESIZE_ORACLE, tags=("multimodal",), priority=100)  # r7: rotated out (mm_frame_sample keeps the kernel family in-window)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stub-codec resize over binary payloads (mapInPandas) — completes
    the decode / feature-extract / resize / frame-sample kernel set. The
    oracle pins the resized payload bytes (header + truncated body)
    digest-exactly."""
    from odbc2deltalake_spark.operators.multimodal import resize_images

    media = make_fake_media(load_table(spark, sf_dir, "documents"))
    return resize_images(media)


# ------------------------------------------------------ audio metadata ----
#
# mm_audio_meta builds GENUINE RIFF/WAVE payloads JVM-side (make_fake_wav:
# correct little-endian chunk structure + silence samples, every field a
# deterministic function of doc_id) and decodes them back through the
# Arrow-batched header parser. The oracle recomputes the metadata from
# doc_id directly — matching outputs prove the byte ENCODER and the byte
# PARSER agree on the WAV spec, a two-sided check no byte-free oracle
# could give.

_AUDIO_ORACLE = """
SELECT doc_id AS media_id,
       CAST(8000 + (doc_id % 8) * 1000 AS INTEGER) AS sample_rate,
       CAST(1 + doc_id % 2 AS INTEGER) AS channels,
       CAST(16 AS INTEGER) AS bits,
       CAST(100 + doc_id % 400 AS BIGINT) AS n_frames,
       CAST(((100 + doc_id % 400) * 1000) // (8000 + (doc_id % 8) * 1000)
            AS BIGINT) AS duration_ms,
       CAST(44 + (100 + doc_id % 400) * (1 + doc_id % 2) * 2
            AS INTEGER) AS n_bytes
FROM documents
"""


@register("mm_audio_meta", _AUDIO_ORACLE, tags=("multimodal",),
          priority=100)  # r7: promoted (r6 flagship); r11: rotated out (mm_decode_meta pins the same binary-kernel family; green r7-r10)
def mm_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WAV metadata extraction over a synthesized-but-genuine audio
    corpus: rate/channels/bits/frames/duration from RIFF headers, one
    linear Arrow-batched pass, samples never read."""
    from odbc2deltalake_spark.operators.multimodal import (
        decode_audio_meta,
        make_fake_wav,
    )

    docs = load_table(spark, sf_dir, "documents")
    return decode_audio_meta(make_fake_wav(docs))


# ------------------------------- REAL PNG decode, oracled ----
# r11: the decode step UN-STUBBED for PNG — a pure-stdlib codec
# (operators/png.py: zlib + all five row filters) runs inside the Arrow
# kernel, so the engine decodes real compressed image bytes without
# Pillow. Each doc synthesizes a deterministic greyscale image
# (pixel(x,y) = (doc_id + 3x + 7y) mod 256, ≥5 rows so every filter
# type None/Sub/Up/Average/Paeth is exercised per image), encodes it to
# a genuine PNG, decodes it back, and emits pixel statistics — which
# the oracle recomputes ANALYTICALLY from the pattern. A decoder bug on
# any filter branch shifts the stats and fails the value hash.

_PNG_STATS_ORACLE = """
WITH g AS (
  SELECT d.doc_id, (d.doc_id % 16 + 5) AS w, (d.doc_id % 12 + 5) AS h,
         (d.doc_id + 3 * x.range + 7 * y.range) % 256 AS v
  FROM documents d, range(0, 21) x, range(0, 17) y
  WHERE x.range < d.doc_id % 16 + 5 AND y.range < d.doc_id % 12 + 5
),
p AS (
  SELECT doc_id, w, h,
         CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 1 END AS channels,
         CASE WHEN doc_id % 3 = 0
              THEN v + (2 * v) % 256 + (3 * v) % 256 ELSE v END AS s,
         CASE WHEN doc_id % 3 = 0
              THEN least(v, (2 * v) % 256, (3 * v) % 256) ELSE v END AS mn,
         CASE WHEN doc_id % 3 = 0
              THEN greatest(v, (2 * v) % 256, (3 * v) % 256) ELSE v END AS mx
  FROM g
)
SELECT doc_id AS media_id, w::INT AS width, h::INT AS height,
       max(channels)::INT AS channels,
       round(sum(s)::DOUBLE / (max(channels) * count(*)), 4) AS px_mean,
       min(mn)::INT AS px_min,
       max(mx)::INT AS px_max
FROM p
GROUP BY doc_id, w, h
"""


@register("mm_png_pixel_stats", _PNG_STATS_ORACLE,
          tags=("multimodal", "flagship"))  # r12: promoted to the driver window (tenth-wave rotation)
def mm_png_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real PNG encode -> decode -> pixel stats == the analytic pattern.

    The round trip happens through genuine zlib-compressed PNG bytes
    inside one mapInPandas kernel (per-row, no shuffle); stats come
    from the DECODED buffer only, so the oracle's analytic recomputation
    certifies every unfilter branch. r12 (VERDICT r11 #6): docs with
    doc_id % 3 == 0 round-trip as INDEXED-COLOR PNGs (PLTE, palette
    entry i = (i, 2i%256, 3i%256)) — the decoder expands indices to RGB
    and the stats run over the expanded buffer, so a palette-expansion
    bug shifts the hash; the rest stay greyscale."""
    import pandas as pd

    from odbc2deltalake_spark.operators.png import (
        decode_png,
        encode_png,
        encode_png_palette,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pal = [(i, (2 * i) % 256, (3 * i) % 256) for i in range(256)]

    def kern(batches):
        for b in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [],
                   "px_mean": [], "px_min": [], "px_max": []}
            for doc_id in b["doc_id"]:
                doc_id = int(doc_id)
                w, h = doc_id % 16 + 5, doc_id % 12 + 5
                px = bytes(
                    (doc_id + 3 * x + 7 * y) % 256
                    for y in range(h)
                    for x in range(w)
                )
                if doc_id % 3 == 0:
                    data = encode_png_palette(px, w, h, pal)
                    want_c = 3
                else:
                    data = encode_png(px, w, h, 1)
                    want_c = 1
                w2, h2, c2, decoded = decode_png(data)
                assert (w2, h2, c2) == (w, h, want_c)
                out["media_id"].append(doc_id)
                out["width"].append(w2)
                out["height"].append(h2)
                out["channels"].append(c2)
                out["px_mean"].append(
                    _round_half_away(sum(decoded) / len(decoded)))
                out["px_min"].append(min(decoded))
                out["px_max"].append(max(decoded))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kern,
        "media_id long, width int, height int, channels int, "
        "px_mean double, px_min int, px_max int",
    )


# ------------------------------------------------- JPEG pixel stats ----
# r13 (VERDICT r12 #6): JPEG is the most common scraped format; this row
# drives the from-scratch baseline Huffman+IDCT decoder
# (operators/jpeg.py) end-to-end inside the same Arrow-batched
# mapInPandas shape as the PNG row. Fixtures are FLAT-8x8-BLOCK images:
# a flat block's DCT is DC-only and integer (DC = 8*(v-128)), so with
# unit quant tables the decode is EXACTLY lossless and a pure-SQL
# oracle can recompute every pixel — while the decode side still runs
# the full marker-parse -> Huffman -> dequant -> IDCT -> color-convert
# pipeline. Color docs (doc_id % 3 == 0) pin the YCbCr->RGB constants
# bit-for-bit (floor(x+0.5) in both engines); dims are deliberately
# non-multiples of 8 so the block-crop path is part of the hash.

_JPEG_STATS_ORACLE = """
WITH g AS (
  SELECT d.doc_id, (d.doc_id % 21 + 4) AS w, (d.doc_id % 13 + 4) AS h,
         (d.doc_id + 5 * (x.range // 8) + 11 * (y.range // 8)) % 256 AS v,
         (d.doc_id + 3 * (x.range // 8) + 7 * (y.range // 8)) % 13 - 6
           AS acv,
         (x.range % 8) AS xb,
         (2 * d.doc_id + 7 * (x.range // 16) + 3 * (y.range // 16)) % 256
           AS cb420,
         (3 * d.doc_id + 11 * (x.range // 16) + 5 * (y.range // 16)) % 256
           AS cr420
  FROM documents d, range(0, 25) x, range(0, 17) y
  WHERE x.range < d.doc_id % 21 + 4 AND y.range < d.doc_id % 13 + 4
),
c AS (
  SELECT doc_id, w, h,
         CASE WHEN doc_id % 3 = 0 THEN 3
              WHEN doc_id % 5 = 0 THEN 3 ELSE 1 END AS channels,
         -- grayscale pixel: the doc_id%7 gradient class carries DC +
         -- one horizontal AC (u=1) per block; its decoded value is the
         -- codec's separable IDCT replayed closed-form (bit-exact: same
         -- libm cos/sqrt, same float op order as _idct_block). ac = 0
         -- blocks take the codec's exact DC fast path (== v).
         CASE WHEN doc_id % 3 <> 0 AND doc_id % 5 <> 0 AND doc_id % 7 = 0
                   AND acv <> 0
           THEN least(255, greatest(0, floor(
             ((1.0 / sqrt(2.0)) * (((1.0 / sqrt(2.0)) * (8 * (v - 128))
                 + acv * cos((2 * xb + 1) * pi() / 16)) / 2)) / 2
             + 128 + 0.5)))
           ELSE v END AS gv,
         v AS yy,
         CASE WHEN doc_id % 3 = 0 THEN (2 * v) % 256 ELSE cb420 END AS cb,
         CASE WHEN doc_id % 3 = 0 THEN (3 * v) % 256 ELSE cr420 END AS cr
  FROM g
),
p AS (
  SELECT doc_id, w, h, channels,
         CASE WHEN channels = 3 THEN
           least(255, greatest(0, floor(yy + 1.402 * (cr - 128) + 0.5)))
           + least(255, greatest(0, floor(yy - 0.344136 * (cb - 128)
                                             - 0.714136 * (cr - 128) + 0.5)))
           + least(255, greatest(0, floor(yy + 1.772 * (cb - 128) + 0.5)))
         ELSE gv END AS s,
         CASE WHEN channels = 3 THEN least(
           least(255, greatest(0, floor(yy + 1.402 * (cr - 128) + 0.5))),
           least(255, greatest(0, floor(yy - 0.344136 * (cb - 128)
                                           - 0.714136 * (cr - 128) + 0.5))),
           least(255, greatest(0, floor(yy + 1.772 * (cb - 128) + 0.5))))
         ELSE gv END AS mn,
         CASE WHEN channels = 3 THEN greatest(
           least(255, greatest(0, floor(yy + 1.402 * (cr - 128) + 0.5))),
           least(255, greatest(0, floor(yy - 0.344136 * (cb - 128)
                                           - 0.714136 * (cr - 128) + 0.5))),
           least(255, greatest(0, floor(yy + 1.772 * (cb - 128) + 0.5))))
         ELSE gv END AS mx
  FROM c
)
SELECT doc_id AS media_id, w::INT AS width, h::INT AS height,
       max(channels)::INT AS channels,
       round(sum(s)::DOUBLE / (max(channels) * count(*)), 4) AS px_mean,
       min(mn)::INT AS px_min,
       max(mx)::INT AS px_max
FROM p
GROUP BY doc_id, w, h
"""


@register("mm_jpeg_pixel_stats", _JPEG_STATS_ORACLE,
          tags=("multimodal", "flagship"))  # r14: promoted (r13 flagship — the JPEG codec's first driver window)
def mm_jpeg_pixel_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real baseline JPEG encode -> Huffman+IDCT decode -> pixel stats.

    Per doc: flat-block image, w = doc_id%21+4, h = doc_id%13+4 (block
    crop exercised), Y block (bx,by) value = (doc_id + 5bx + 11by) % 256.
    Three fixture classes: doc_id % 3 == 0 round-trips as YCbCr 4:4:4
    (Cb = 2Y % 256, Cr = 3Y % 256); doc_id % 5 == 0 (and % 3 != 0) as
    4:2:0 — chroma one flat block per 16x16 macroblock (Cb = (2*doc_id
    + 7mx + 3my) % 256, Cr = (3*doc_id + 11mx + 5my) % 256), so the
    subsampled MCU interleave + nearest upsample is part of the hash
    (r13); the rest grayscale. Stats come from the DECODED buffer only;
    the oracle recomputes every pixel analytically (flat blocks make
    the codec exactly lossless)."""
    import pandas as pd

    from odbc2deltalake_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg_coeffs,
        encode_jpeg_flatblocks,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")

    def kern(batches):
        for b in batches:
            out = {"media_id": [], "width": [], "height": [], "channels": [],
                   "px_mean": [], "px_min": [], "px_max": []}
            for doc_id in b["doc_id"]:
                doc_id = int(doc_id)
                w, h = doc_id % 21 + 4, doc_id % 13 + 4
                if doc_id % 3 == 0:
                    bw, bh = (w + 7) // 8, (h + 7) // 8
                    gy = [[(doc_id + 5 * bx + 11 * by) % 256
                           for bx in range(bw)] for by in range(bh)]
                    gcb = [[(2 * v) % 256 for v in row] for row in gy]
                    gcr = [[(3 * v) % 256 for v in row] for row in gy]
                    data = encode_jpeg_flatblocks([gy, gcb, gcr], w, h)
                    want_c = 3
                elif doc_id % 5 == 0:
                    # 4:2:0: Y per 8x8 over the padded macroblock grid,
                    # chroma one flat block per 16x16 macroblock
                    mcux, mcuy = (w + 15) // 16, (h + 15) // 16
                    gy = [[(doc_id + 5 * bx + 11 * by) % 256
                           for bx in range(mcux * 2)]
                          for by in range(mcuy * 2)]
                    gcb = [[(2 * doc_id + 7 * mx + 3 * my) % 256
                            for mx in range(mcux)] for my in range(mcuy)]
                    gcr = [[(3 * doc_id + 11 * mx + 5 * my) % 256
                            for mx in range(mcux)] for my in range(mcuy)]
                    data = encode_jpeg_flatblocks(
                        [gy, gcb, gcr], w, h,
                        sampling=[(2, 2), (1, 1), (1, 1)],
                    )
                    want_c = 3
                elif doc_id % 7 == 0:
                    # r14 (VERDICT r13 #5): NON-FLAT content — each 8x8
                    # block carries DC + one horizontal AC (u=1), so the
                    # decoder runs the real separable float IDCT, not
                    # the DC fast path; the oracle replays the same
                    # closed-form IDCT bit-exactly (same libm cos/sqrt,
                    # same op order)
                    bw, bh = (w + 7) // 8, (h + 7) // 8
                    blocks = []
                    for by in range(bh):
                        for bx in range(bw):
                            vflat = (doc_id + 5 * bx + 11 * by) % 256
                            ac = (doc_id + 3 * bx + 7 * by) % 13 - 6
                            coef = [0] * 64
                            coef[0] = 8 * (vflat - 128)
                            coef[1] = ac
                            blocks.append(coef)
                    data = encode_jpeg_coeffs([blocks], w, h)
                    want_c = 1
                else:
                    bw, bh = (w + 7) // 8, (h + 7) // 8
                    gy = [[(doc_id + 5 * bx + 11 * by) % 256
                           for bx in range(bw)] for by in range(bh)]
                    data = encode_jpeg_flatblocks([gy], w, h)
                    want_c = 1
                w2, h2, c2, decoded = decode_jpeg(data)
                assert (w2, h2, c2) == (w, h, want_c)
                out["media_id"].append(doc_id)
                out["width"].append(w2)
                out["height"].append(h2)
                out["channels"].append(c2)
                out["px_mean"].append(
                    _round_half_away(sum(decoded) / len(decoded)))
                out["px_min"].append(min(decoded))
                out["px_max"].append(max(decoded))
            yield pd.DataFrame(out)

    return docs.mapInPandas(
        kern,
        "media_id long, width int, height int, channels int, "
        "px_mean double, px_min int, px_max int",
    )
