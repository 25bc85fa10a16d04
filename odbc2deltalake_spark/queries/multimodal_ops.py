"""Multimodal-column operators over a deterministic fake media table
(documents → FK-stub-header + UTF-8 payload bytes; see
odbc2deltalake_spark/operators/multimodal.py).

The payload construction is JVM-side expressions, so DuckDB reproduces it
bit-for-bit (from_hex / encode) — the oracles pin byte-exact plumbing:
header arithmetic, binary concat, digest. The decode/feature kernels are
Arrow-batched mapInPandas; the codec itself is stubbed (no image libs in
this container) behind a try-import, which is exactly the swap point for
Pillow/soundfile/av in production.
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


@register("mm_decode_meta", _DECODE_ORACLE, tags=("multimodal",))
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
