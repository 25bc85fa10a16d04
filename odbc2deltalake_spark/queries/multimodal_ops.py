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


@register("mm_payload_digest", _DIGEST_ORACLE, tags=("multimodal",))
def mm_payload_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-exact payload check: both engines hash the lowercase hex of
    the constructed payload (DuckDB's sha256 is VARCHAR-only) — proves the
    binary plumbing (header bytes + encode concat) is engine-identical."""
    media = make_fake_media(load_table(spark, sf_dir, "documents"))
    return media.select(
        "media_id",
        F.sha2(F.lower(F.hex(F.col("payload"))), 256).alias("payload_sha256"),
    )


@register("mm_feature_vectors", None, tags=("multimodal", "similarity"))
def mm_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction (deterministic sha-seeded stand-in for an
    embedding model) — returns (media_id, array<float>); feeds the same
    ANN operators as the embeddings table. Rows-only check: the float
    construction is non-SQL-expressible bit-exactly."""
    media = make_fake_media(load_table(spark, sf_dir, "documents"))
    feats = extract_features(media)
    return feats.select("media_id", F.size("feature").alias("dim")).join(
        feats.select("media_id", "feature"), on="media_id"
    ).select("media_id", "dim", "feature")


@register("mm_frame_sample", None, tags=("multimodal",))
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling (stub): one input row → many frame rows
    through mapInPandas; rows-only check pins the fan-out plumbing."""
    media = make_fake_media(load_table(spark, sf_dir, "documents"))
    return sample_frames(media, every_n=10)
