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
