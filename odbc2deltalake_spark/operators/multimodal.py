"""Multimodal (image/audio/video) column handling for training-data
pipelines.

Design: media payloads are opaque ``binary`` columns plus typed metadata;
all per-item compute (decode, feature extraction, resize, frame sampling)
runs as Arrow-batched ``mapInPandas`` kernels so the Spark-side plumbing —
schema, partitioning, batch shape — is identical whether the kernel is a
real codec or a stub. The decode libraries (Pillow / soundfile / av) are
not in this container, so the codec step is gated behind a try-import with
a deterministic fake fallback; swapping in the real library changes ONE
function, not the plan.

Scale: kernels are per-row independent → linear scans, no shuffle; media
tables should be written with payloads in their own parquet column so
metadata-only queries never read the bytes (column pruning), and
``spark.sql.files.maxPartitionBytes`` sized so one task's batch of
payloads fits executor memory.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame

from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)


_PIL_IMAGE = None  # resolved once per worker: False = absent


def _try_real_image_decode(payload: bytes):
    """Real decode path — active when Pillow is installed. The import is
    probed once per interpreter (failed imports are not cached by
    Python, so an unguarded per-row try/except would re-walk sys.path
    for every payload)."""
    global _PIL_IMAGE
    if _PIL_IMAGE is None:
        try:
            from PIL import Image  # type: ignore[import-not-found]

            _PIL_IMAGE = Image
        except ImportError:
            _PIL_IMAGE = False
    if _PIL_IMAGE is False:
        return None
    import io

    im = _PIL_IMAGE.open(io.BytesIO(payload))
    return {"width": im.width, "height": im.height, "mode": im.mode}


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> Pillow mode name (8-bit depth; 16-bit uses the same
# letters via Pillow's I;16 promotion, which metadata-only callers don't
# need to distinguish)
_PNG_MODES = {0: "L", 2: "RGB", 3: "P", 4: "LA", 6: "RGBA"}
# JPEG SOFn markers that carry frame dimensions — every 0xC0..0xCF
# except DHT (C4), JPG (C8) and DAC (CC), per ITU T.81 table B.1
_JPEG_SOF = {
    m for m in range(0xC0, 0xD0) if m not in (0xC4, 0xC8, 0xCC)
}
_JPEG_MODES = {1: "L", 3: "RGB", 4: "CMYK"}


def _parse_image_header(payload: bytes) -> Optional[dict]:
    """Pure-stdlib PNG IHDR / JPEG SOFn header parse — the real-bytes
    path when Pillow is absent (this container). Returns None for
    formats it doesn't recognize so the caller can fall through to the
    synthetic-fixture stub.

    PNG (RFC 2083): 8-byte signature, then chunks as
    [len u32][type 4B][data][crc u32]; IHDR is mandatory-first with
    width/height as big-endian u32 and color type at data offset 9.
    JPEG (ITU T.81): 0xFFD8 SOI, then marker segments
    [0xFF marker][len u16 incl. itself]; the first SOFn segment carries
    [precision u8][height u16][width u16][n_components u8]. Both reads
    touch only the first few hundred bytes — the kernel stays linear in
    row count, not payload size."""
    if payload[:8] == _PNG_SIG and len(payload) >= 33:
        length, ctype = struct.unpack(">I4s", payload[8:16])
        if ctype != b"IHDR" or length < 13:
            return None  # corrupt: IHDR must be the first chunk
        w, h = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        return {
            "width": w,
            "height": h,
            "mode": _PNG_MODES.get(color_type, f"PNG#{color_type}"),
        }
    if payload[:2] == b"\xff\xd8":
        i = 2
        n = len(payload)
        while i + 4 <= n:
            if payload[i] != 0xFF:
                return None  # lost marker sync
            marker = payload[i + 1]
            if marker == 0xFF:  # fill byte padding before a marker
                i += 1
                continue
            if marker in (0x01, *range(0xD0, 0xD8)):  # TEM/RSTn: no length
                i += 2
                continue
            if i + 4 > n:
                return None
            (seglen,) = struct.unpack(">H", payload[i + 2 : i + 4])
            if marker in _JPEG_SOF:
                if i + 4 + 6 > n:
                    return None
                h, w, ncomp = struct.unpack(
                    ">HHB", payload[i + 5 : i + 10]
                )
                return {
                    "width": w,
                    "height": h,
                    "mode": _JPEG_MODES.get(ncomp, f"JPEG#{ncomp}"),
                }
            if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before SOF
                return None
            i += 2 + seglen
        return None
    return None


def _stub_image_decode(payload: bytes) -> dict:
    """Deterministic fake decode: reads a tiny fake header (two uint16 at
    offset 0) exactly as the synthetic test fixtures write it. Clearly a
    STUB — raises on payloads without the fake magic."""
    if len(payload) < 6 or payload[:2] != b"FK":
        raise NotImplementedError(
            "real image decoding requires Pillow; payload lacks the FK stub header"
        )
    w, h = struct.unpack(">HH", payload[2:6])
    return {"width": w, "height": h, "mode": "STUB"}


DECODE_RESULT_SCHEMA = "media_id long, width int, height int, mode string, n_bytes int"


def decode_images(df: DataFrame) -> DataFrame:
    """Decode → (media_id, width, height, mode, n_bytes), Arrow-batched."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                d = (
                    _try_real_image_decode(b)
                    or _parse_image_header(b)
                    or _stub_image_decode(b)
                )
                out.append((mid, d["width"], d["height"], d["mode"], len(b)))
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mode", "n_bytes"]
            )

    return df.select("media_id", "payload").mapInPandas(kernel, DECODE_RESULT_SCHEMA)


def _parse_audio_header(payload: bytes) -> Optional[dict]:
    """Pure-stdlib RIFF/WAVE header parse: sample rate, channels, bit
    depth and frame count from the fmt/data chunks (little-endian; RIFF
    spec chunks are [id 4B][size u32 LE][data], word-aligned). Returns
    None for non-WAV payloads. Only the first few hundred bytes are
    touched — the data chunk's SIZE field suffices for duration, its
    samples are never read."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    i, n = 12, len(payload)
    fmt: Optional[tuple] = None
    data_size: Optional[int] = None
    while i + 8 <= n:
        cid = payload[i : i + 4]
        (size,) = struct.unpack("<I", payload[i + 4 : i + 8])
        if cid == b"fmt " and i + 8 + 16 <= n:
            fmt = struct.unpack("<HHIIHH", payload[i + 8 : i + 24])
        elif cid == b"data":
            data_size = size
        if fmt is not None and data_size is not None:
            break
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None:
        return None
    _audio_format, channels, rate, _byte_rate, block_align, bits = fmt
    if channels == 0 or rate == 0:
        return None
    frames = (
        data_size // block_align
        if data_size is not None and block_align
        else None
    )
    return {
        "sample_rate": rate,
        "channels": channels,
        "bits": bits,
        "n_frames": frames,
        "duration_ms": (
            int(frames * 1000 / rate) if frames is not None else None
        ),
    }


AUDIO_META_SCHEMA = (
    "media_id long, sample_rate int, channels int, bits int, "
    "n_frames long, duration_ms long, n_bytes int"
)


def decode_audio_meta(df: DataFrame) -> DataFrame:
    """Audio metadata → (media_id, sample_rate, channels, bits,
    n_frames, duration_ms, n_bytes), Arrow-batched like decode_images.
    Non-WAV payloads raise (loud, like the image stub gate) — route
    mixed media by mime before decoding."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                d = _parse_audio_header(b)
                if d is None:
                    raise NotImplementedError(
                        "payload is not RIFF/WAVE; non-WAV audio needs a "
                        "codec library (soundfile/av) not present here"
                    )
                out.append(
                    (
                        mid,
                        d["sample_rate"],
                        d["channels"],
                        d["bits"],
                        d["n_frames"],
                        d["duration_ms"],
                        len(b),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[
                    "media_id", "sample_rate", "channels", "bits",
                    "n_frames", "duration_ms", "n_bytes",
                ],
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, AUDIO_META_SCHEMA
    )


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Deterministic byte-level feature vector (stand-in for an embedding
    model): sha256-seeded floats in [0,1). The vector column has the same
    array<float> shape the similarity operators consume, so the ANN path
    (sim_ann_topk / sim_lsh_buckets) runs unchanged on media features.

    The seed hashes the payload's lowercase-hex string (not the raw
    bytes): DuckDB's sha256/md5 are VARCHAR-only, and seeding in the hex
    domain lets the oracle reproduce the whole expansion bit-for-bit.
    ``feature_digest`` (md5 over the comma-joined uint32 expansion) is the
    scalar the correctness harness canonicalizes — bare array<float>
    columns are unhashable in the driver's pandas-based comparator."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            ids, vecs, digs = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                h = hashlib.sha256(bytes(payload).hex().encode()).digest()
                # expand digest deterministically to `dim` uint32s
                raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
                u = np.frombuffer(raw, dtype=">u4")
                v = u.astype("float64") / 2**32
                ids.append(mid)
                vecs.append(v.astype("float32").tolist())
                digs.append(
                    hashlib.md5(",".join(str(int(x)) for x in u).encode()).hexdigest()
                )
            yield pd.DataFrame(
                {"media_id": ids, "feature": vecs, "feature_digest": digs}
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, "media_id long, feature array<float>, feature_digest string"
    )


def sample_frames(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling (stub): the fake payload is a sequence of
    fixed-size 'frames' after the header; emit every Nth frame's offset +
    digest. Plumbing (one input row → many output rows via mapInPandas)
    matches what a real ffmpeg/av kernel produces. Frame digests hash the
    frame's lowercase-hex string (DuckDB md5 is VARCHAR-only — keeps the
    oracle byte-exact)."""
    FRAME = 32

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, idxs, digests = [], [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)[6:]  # skip stub header
                for i in range(0, len(b) // FRAME, every_n):
                    frame = b[i * FRAME : (i + 1) * FRAME]
                    mids.append(mid)
                    idxs.append(i)
                    digests.append(hashlib.md5(frame.hex().encode()).hexdigest())
            yield pd.DataFrame(
                {"media_id": mids, "frame_index": idxs, "frame_md5": digests}
            )

    return df.select("media_id", "payload").mapInPandas(
        kernel, "media_id long, frame_index int, frame_md5 string"
    )


def make_fake_media(docs: DataFrame) -> DataFrame:
    """Build a deterministic media table from the documents fixture: the
    payload is the FK stub header (width/height derived from doc_id) plus
    the UTF-8 text bytes — JVM-side expressions only, so both engines can
    reproduce it bit-for-bit."""
    w = (F.col("doc_id") % 640 + 16).cast("int")
    h = (F.col("doc_id") % 480 + 16).cast("int")
    header = F.concat(
        F.lit(b"FK"),
        _be16(w),
        _be16(h),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.concat(header, F.encode(F.col("text"), "UTF-8")).alias("payload"),
        F.lit("image/x-stub").alias("mime"),
        F.create_map(F.lit("lang"), F.col("lang")).alias("meta"),
    )


def _be16(col):
    """Two big-endian bytes from an int column (JVM-side)."""
    hi = F.floor(col / 256).cast("int")
    lo = (col % 256).cast("int")
    return F.concat(_byte(hi), _byte(lo))


def _byte(col):
    return F.unhex(F.lpad(F.hex(col), 2, "0"))


def _le16(col):
    """Two little-endian bytes from an int column (JVM-side)."""
    hi = F.floor(col / 256).cast("int")
    lo = (col % 256).cast("int")
    return F.concat(_byte(lo), _byte(hi))


def _le32(col):
    lo = (col % 65536).cast("int")
    hi = F.floor(col / 65536).cast("int")
    return F.concat(_le16(lo), _le16(hi))


def make_fake_wav(docs: DataFrame) -> DataFrame:
    """Deterministic GENUINE WAV payloads from the documents fixture:
    a structurally-valid RIFF/WAVE header (fmt + data chunks, correct
    little-endian sizes) with rate/channels/frames derived from doc_id
    and silence for samples — JVM-side byte concat only, so an oracle
    recomputes every metadata field from doc_id without parsing bytes."""
    rate = (F.lit(8000) + (F.col("doc_id") % 8) * 1000).cast("int")
    channels = (F.lit(1) + F.col("doc_id") % 2).cast("int")
    bits = F.lit(16)
    n_frames = (F.lit(100) + F.col("doc_id") % 400).cast("int")
    block_align = (channels * 2).cast("int")
    data_size = (n_frames * block_align).cast("int")
    byte_rate = (rate * block_align).cast("int")
    fmt_chunk = F.concat(
        F.lit(b"fmt "), _le32(F.lit(16)),
        _le16(F.lit(1)), _le16(channels), _le32(rate), _le32(byte_rate),
        _le16(block_align), _le16(bits),
    )
    # silence samples: data_size zero bytes. Spark's repeat() returns
    # STRING even for binary input (and would poison the whole concat
    # into a non-UTF8 string); NUL is a 1-byte UTF-8 codepoint, so the
    # string→binary cast restores exact zero bytes
    silence = F.expr("cast(repeat(x'00', __ds) as binary)")
    data_chunk = F.concat(F.lit(b"data"), _le32(data_size), silence)
    riff_size = (F.lit(4 + 24 + 8) + data_size).cast("int")
    payload = F.concat(
        F.lit(b"RIFF"), _le32(riff_size), F.lit(b"WAVE"), fmt_chunk, data_chunk
    )
    return (
        docs.withColumn("__ds", data_size)
        .select(
            F.col("doc_id").alias("media_id"),
            payload.alias("payload"),
            F.lit("audio/wav").alias("mime"),
            F.create_map().cast("map<string,string>").alias("meta"),
        )
    )


RESIZE_RESULT_SCHEMA = (
    "media_id long, width int, height int, n_bytes int, resized_md5 string"
)


def resize_images(df: DataFrame, width: int = 64, height: int = 48) -> DataFrame:
    """Resize (stub codec): emit the resized payload's metadata + digest.

    The stub 'resize' rewrites the FK header to the target dims and keeps
    a proportional byte budget of the body (``width*height // 8`` bytes)
    — obviously not a real resample, but the plumbing is exactly what a
    Pillow ``Image.resize`` kernel produces: per-row payload in, per-row
    smaller payload out, Arrow-batched, no shuffle. Swapping in the real
    codec changes only the bytes computed here; digests hash the payload's
    lowercase-hex (DuckDB md5 is VARCHAR-only) so the oracle stays
    byte-exact."""
    budget = (width * height) // 8

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload)
                if len(b) < 6 or b[:2] != b"FK":
                    raise NotImplementedError(
                        "real image resizing requires Pillow; payload lacks the FK stub header"
                    )
                body = b[6 : 6 + budget]
                resized = b"FK" + struct.pack(">HH", width, height) + body
                out.append(
                    (
                        mid,
                        width,
                        height,
                        len(resized),
                        hashlib.md5(resized.hex().encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "width", "height", "n_bytes", "resized_md5"],
            )

    return df.select("media_id", "payload").mapInPandas(kernel, RESIZE_RESULT_SCHEMA)
