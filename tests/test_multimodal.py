"""Multimodal plumbing: schema, Arrow batch shape, stubbed decode, frame
sampling. The decode itself is a deterministic fake (no codecs in this
container) — the Spark-side contract is what these tests pin."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from asctb_ct_label_mapper_spark.operators.multimodal import (
    FEATURE_DIM,
    decode_features,
    decode_frame_pixels,
    frame_sample,
    synthesize_media,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "another doc"), (3, "x")], "doc_id long, text string"
    )
    return synthesize_media(docs, "doc_id", "text")


def test_media_schema(media):
    fields = dict(media.dtypes)
    assert fields["payload"] == "binary"
    assert fields["kind"] == "string"
    assert media.count() == 3


def test_decode_features_shape_and_determinism(media):
    out = {r["media_id"]: r for r in decode_features(media).collect()}
    assert set(out) == {1, 2, 3}
    for r in out.values():
        assert len(r["features"]) == FEATURE_DIM
        assert r["payload_bytes"] > 0
    again = {r["media_id"]: r for r in decode_features(media).collect()}
    assert out[1]["features"] == again[1]["features"]  # deterministic stub


def test_decode_respects_batch_cap(media):
    # cap of 1 row per inner batch still yields every row exactly once
    out = decode_features(media, max_rows_per_batch=1).collect()
    assert sorted(r["media_id"] for r in out) == [1, 2, 3]


def test_frame_sample_explodes_video_rows(spark):
    rows = [(1, "video", "v/mp4", 0, 0, 3500, bytearray(b"x")),
            (2, "image", "i/png", 1, 1, 0, bytearray(b"y"))]
    media = spark.createDataFrame(
        rows,
        "media_id long, kind string, mime string, width int, height int,"
        " duration_ms int, payload binary",
    )
    frames = frame_sample(media, every_ms=1000).collect()
    # video of 3500ms at 1000ms stride -> ts 0,1000,2000,3000; image excluded
    assert sorted(r["frame_ts_ms"] for r in frames) == [0, 1000, 2000, 3000]
    assert {r["media_id"] for r in frames} == {1}


def test_real_decode_is_explicit_extension_point():
    with pytest.raises(NotImplementedError):
        decode_frame_pixels(b"payload", 0)
