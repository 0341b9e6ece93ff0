"""Multimodal binary-column plumbing tests (SURVEY.md §2.4).

The codec is stubbed (no image libs in this environment); the Spark
plumbing — binary columns, metadata struct, mapInPandas batching,
pandas-UDF feature extraction — is real and exercised here.
"""

import pytest
from pyspark.sql import functions as F

from pandance_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_binary_payload,
    byte_histogram_features,
    decode_image,
    fake_decode_meta,
    pack_fake_image,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, pack_fake_image(64, 48, seed=1), "image/fake", (64, 48, None)),
        (2, pack_fake_image(128, 96, seed=2), "image/fake", (128, 96, None)),
        (3, b"not an image", "application/octet-stream", (None, None, 12)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def test_decode_image_is_marked_stub(media):
    with pytest.raises(NotImplementedError):
        decode_image(media)


def test_fake_decode_meta_roundtrip(media):
    out = fake_decode_meta(media).orderBy("media_id").collect()
    assert (out[0]["decoded_width"], out[0]["decoded_height"], out[0]["ok"]) == (64, 48, True)
    assert (out[1]["decoded_width"], out[1]["decoded_height"], out[1]["ok"]) == (128, 96, True)
    assert (out[2]["decoded_width"], out[2]["ok"]) == (None, False)


def test_byte_histogram_features(media):
    out = byte_histogram_features(media).orderBy("media_id").collect()
    for r in out:
        assert len(r["features"]) == 16
        assert sum(r["features"]) == pytest.approx(1.0)
    # determinism: same payload -> same features
    again = byte_histogram_features(media).orderBy("media_id").collect()
    assert [r["features"] for r in out] == [r["features"] for r in again]


def test_attach_binary_payload_from_documents(spark, sf_dir):
    from pandance_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = attach_binary_payload(docs, "doc_id", "text")
    rows = media.collect()
    assert len(rows) == 50
    for r in rows:
        assert r["meta"]["n_bytes"] == len(bytes(r["payload"]))
        assert r["media_type"] == "text/plain"
    # metadata filters don't touch payload bytes (column pruning):
    n = media.filter(F.col("meta.n_bytes") > 100).count()
    assert 0 < n <= 50


def test_fake_resize_rewrites_dims(spark, media):
    from pandance_spark.operators.multimodal import fake_resize

    resized = fake_resize(media, 32, 24)
    out = fake_decode_meta(resized).orderBy("media_id").collect()
    assert (out[0]["decoded_width"], out[0]["decoded_height"]) == (32, 24)
    assert (out[1]["decoded_width"], out[1]["decoded_height"]) == (32, 24)
    assert out[2]["ok"] is False  # non-image payload passes through untouched
    with pytest.raises(NotImplementedError):
        from pandance_spark.operators.multimodal import resize_image

        resize_image(media, 32, 24)


def test_sample_frames(spark):
    from pandance_spark.operators.multimodal import pack_fake_video, sample_frames

    rows = [
        (1, pack_fake_video(10, 8, 8, seed=3), "video/fake", (None, None, None)),
        (2, b"junk", "application/octet-stream", (None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_frames(media, every_k=3).orderBy("media_id", "frame_index")
    got = frames.collect()
    assert [(r["media_id"], r["frame_index"]) for r in got] == [
        (1, 0), (1, 3), (1, 6), (1, 9)
    ]
    # each frame round-trips through the fake image decoder
    one = spark.createDataFrame(
        [(100, bytes(got[0]["frame"]), "image/fake", (None, None, None))],
        MEDIA_SCHEMA,
    )
    dec = fake_decode_meta(one).first()
    assert (dec["decoded_width"], dec["decoded_height"], dec["ok"]) == (8, 8, True)
    with pytest.raises(ValueError):
        sample_frames(media, every_k=0)
