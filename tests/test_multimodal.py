"""Multimodal operator tests: stub-codec gating and kernel batch shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from odbc2deltalake_spark.operators.multimodal import (
    decode_images,
    extract_features,
    make_fake_media,
    sample_frames,
)
from odbc2deltalake_spark.queries.registry import load_table


def test_decode_rejects_unknown_payload(spark):
    df = spark.createDataFrame(
        [(1, bytearray(b"NOTANIMAGE"), "image/png", {})],
        "media_id long, payload binary, mime string, meta map<string,string>",
    )
    with pytest.raises(Exception, match="NotImplementedError|Pillow|FK stub"):
        decode_images(df).collect()


def test_feature_vectors_deterministic(spark):
    media = make_fake_media(load_table(spark, "/root/testdata/sf0.001", "documents"))
    f1 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    f2 = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert f1 == f2
    assert all(len(v) == 16 for v in f1.values())
    assert all(0.0 <= x < 1.0 for v in f1.values() for x in v)


def test_frame_sample_fanout(spark):
    media = make_fake_media(load_table(spark, "/root/testdata/sf0.001", "documents"))
    frames = sample_frames(media, every_n=5)
    per_doc = frames.groupBy("media_id").count().collect()
    assert per_doc  # one input row -> many frame rows
    # frame count derives from payload length
    payload_len = media.select(
        "media_id", F.length("payload").alias("n")
    ).collect()
    ln = {r["media_id"]: r["n"] for r in payload_len}
    for r in per_doc:
        expected = len(range(0, (ln[r["media_id"]] - 6) // 32, 5))
        assert r["count"] == expected


def test_resize_budget_and_header(spark):
    """Stub resize: rewritten header dims, proportional byte budget, and
    the no-stub-header payload raises the documented codec gate."""
    import pytest

    from odbc2deltalake_spark.operators.multimodal import make_fake_media, resize_images
    from odbc2deltalake_spark.queries.registry import load_table

    media = make_fake_media(load_table(spark, "/root/testdata/sf0.001", "documents"))
    out = resize_images(media, width=64, height=48).collect()
    assert out
    for r in out:
        assert r["width"] == 64 and r["height"] == 48
        assert r["n_bytes"] <= 6 + (64 * 48) // 8

    bad = spark.createDataFrame([(1, bytearray(b"NOTFK123"))], "media_id long, payload binary")
    with pytest.raises(Exception):
        resize_images(bad).collect()
