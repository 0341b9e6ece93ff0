"""Multimodal binary-column tests (SURVEY.md §2.4).

The Spark plumbing — binary columns, metadata struct, mapInPandas
batching, pandas-UDF feature extraction — AND the PPM/BMP codec are
real and exercised here (pure Python + numpy; no image libs needed).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pandance_spark.operators.multimodal import (
    MEDIA_SCHEMA,
    attach_binary_payload,
    byte_histogram_features,
    decode_image,
    fake_decode_meta,
    pack_bmp_image,
    pack_fake_image,
    pack_ppm_image,
    resize_image,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, pack_fake_image(64, 48, seed=1), "image/fake", (64, 48, None)),
        (2, pack_fake_image(128, 96, seed=2), "image/fake", (128, 96, None)),
        (3, b"not an image", "application/octet-stream", (None, None, 12)),
    ]
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _ref_pixels(width, height, seed):
    n = width * height * 3
    return (
        ((seed + 7 * np.arange(n, dtype=np.int64)) % 256)
        .astype(np.uint8)
        .reshape(height, width, 3)
    )


def test_decode_image_ppm_and_bmp(spark):
    # same (w, h, seed) -> identical pixels in either container
    rows = [
        (1, pack_ppm_image(13, 7, seed=42), "image/x-ppm", (13, 7, None)),
        (2, pack_bmp_image(13, 7, seed=42), "image/bmp", (13, 7, None)),
        (3, b"neither", "application/octet-stream", (None, None, 7)),
        (4, b"P6\n13 7\n255\nshort", "image/x-ppm", (None, None, None)),
        (5, None, "image/x-ppm", (None, None, None)),
    ]
    out = {
        r["media_id"]: r
        for r in decode_image(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    ref = _ref_pixels(13, 7, 42).reshape(-1, 3).sum(axis=0, dtype=np.int64)
    for mid, fmt in [(1, "ppm"), (2, "bmp")]:
        r = out[mid]
        assert (r["decoded_width"], r["decoded_height"], r["decoded_format"]) == (
            13, 7, fmt,
        )
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(x) for x in ref)
        assert r["ok"] is True
    for mid in (3, 4, 5):  # corrupt/foreign payloads degrade, never fail
        assert out[mid]["ok"] is False and out[mid]["sum_r"] is None


def test_decode_image_ppm_comment_header(spark):
    # Netpbm allows '#' comments inside the header
    raw = pack_ppm_image(4, 3, seed=9)
    commented = b"P6\n# a comment\n4 3\n255\n" + raw.split(b"255\n", 1)[1]
    r = decode_image(
        spark.createDataFrame([(1, commented, "image/x-ppm", (4, 3, None))], MEDIA_SCHEMA)
    ).first()
    assert (r["decoded_width"], r["decoded_height"], r["ok"]) == (4, 3, True)


def test_resize_image_nearest_neighbor(spark):
    w, h, seed = 16, 10, 5
    rows = [
        (1, pack_ppm_image(w, h, seed), "image/x-ppm", (w, h, None)),
        (2, pack_bmp_image(w, h, seed), "image/bmp", (w, h, None)),
        (3, b"junk", "application/octet-stream", (None, None, 4)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {
        r["media_id"]: r
        for r in decode_image(resize_image(media, 5, 4)).collect()
    }
    img = _ref_pixels(w, h, seed)
    ys = (np.arange(4, dtype=np.int64) * h) // 4
    xs = (np.arange(5, dtype=np.int64) * w) // 5
    ref = img[ys][:, xs].reshape(-1, 3).sum(axis=0, dtype=np.int64)
    for mid in (1, 2):  # BMP input re-encodes as PPM on output
        r = out[mid]
        assert (r["decoded_width"], r["decoded_height"], r["decoded_format"]) == (
            5, 4, "ppm",
        )
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(x) for x in ref)
    assert out[3]["ok"] is False  # non-image passes through unchanged
    assert bytes(out[3]["payload"]) == b"junk"
    with pytest.raises(ValueError):
        resize_image(media, 0, 4)


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


def test_decode_audio_wav_roundtrip(spark):
    from pandance_spark.operators.multimodal import decode_audio, pack_wav_audio

    rows = [
        (1, pack_wav_audio(100, 16000, seed=7), "audio/wav", (None, None, None)),
        (2, pack_wav_audio(50, 8000, seed=3, n_channels=2), "audio/wav", (None, None, None)),
        (3, b"RIFFjunk", "audio/wav", (None, None, None)),
        (4, None, "audio/wav", (None, None, None)),
    ]
    out = {
        r["media_id"]: r
        for r in decode_audio(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    ref1 = np.abs(((7 + 11 * np.arange(100, dtype=np.int64)) % 65536) - 32768)
    r = out[1]
    assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (16000, 1, 100)
    assert r["sum_abs"] == int(ref1.sum()) and r["peak"] == int(ref1.max())
    ref2 = np.abs(((3 + 11 * np.arange(100, dtype=np.int64)) % 65536) - 32768)
    r = out[2]  # stereo: 50 frames, 100 interleaved samples
    assert (r["sample_rate"], r["n_channels"], r["n_samples"]) == (8000, 2, 50)
    assert r["sum_abs"] == int(ref2.sum())
    assert out[3]["ok"] is False and out[4]["ok"] is False


def test_decode_image_ppm_bad_maxval_separator(spark):
    # review fix: the byte after maxval must be whitespace — a comment
    # there would shift the raster; must degrade to ok=false, not
    # decode garbage
    raw = pack_ppm_image(4, 3, seed=9)
    bad = b"P6\n4 3\n255# junk\n" + raw.split(b"255\n", 1)[1]
    r = decode_image(
        spark.createDataFrame([(1, bad, "image/x-ppm", (4, 3, None))], MEDIA_SCHEMA)
    ).first()
    assert r["ok"] is False and r["sum_r"] is None


def test_sample_frames_video_avi_roundtrip(spark):
    from pandance_spark.operators.multimodal import (
        pack_avi_video, sample_frames_video,
    )

    rows = [
        (1, pack_avi_video(5, 6, 4, seed=20), "video/avi", (6, 4, None)),
        (2, b"RIFFxxxxJUNK", "video/avi", (None, None, None)),
        (3, None, "video/avi", (None, None, None)),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    frames = sample_frames_video(media, every_k=2)
    got = frames.orderBy("media_id", "frame_index").collect()
    assert [(r["media_id"], r["frame_index"]) for r in got] == [
        (1, 0), (1, 2), (1, 4)
    ]
    # each demuxed frame decodes as BMP with the per-frame closed form
    dec = decode_image(
        spark.createDataFrame(
            [(r["frame_index"], bytes(r["frame"]), "image/bmp",
              (None, None, None)) for r in got],
            MEDIA_SCHEMA,
        ),
        "payload",
    ).collect()
    for r in dec:
        f = r["media_id"]  # frame_index smuggled as id
        ref = _ref_pixels(6, 4, 20 + 131 * f).reshape(-1, 3).sum(
            axis=0, dtype="int64"
        )
        assert (r["decoded_width"], r["decoded_height"], r["ok"]) == (6, 4, True)
        assert (r["sum_r"], r["sum_g"], r["sum_b"]) == tuple(int(x) for x in ref)
    with pytest.raises(ValueError):
        sample_frames_video(media, every_k=0)


def _chunk(cid, body):
    import struct as _s
    pad = b"\x00" if len(body) % 2 else b""
    return cid + _s.pack("<I", len(body)) + body + pad


def _lst(ltype, body):
    return _chunk(b"LIST", ltype + body)


def test_sample_frames_video_multistream_and_bomb(spark):
    """Review fixes: an audio stream's strf must not shadow the video
    header (audio-first AVI still demuxes); only the video stream's
    frames are taken; a deep-nested LIST bomb degrades to zero rows
    instead of RecursionError-ing the task."""
    import struct as _s

    from pandance_spark.operators.multimodal import (
        pack_avi_video, sample_frames_video,
    )

    good = pack_avi_video(3, 6, 4, seed=20)
    # splice an AUDIO strl list after the video strl inside hdrl
    # (video stays stream 00; audio becomes stream 01)
    auds_strh = b"auds\x00\x00\x00\x00" + b"\x00" * 48
    auds_strf = _s.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)  # WAVEFORMATEX
    audio_strl = _lst(b"strl", _chunk(b"strh", auds_strh) + _chunk(b"strf", auds_strf))
    # rebuild: RIFF(AVI  hdrl(avih + audio_strl + video_strl) movi)
    body = good[12:]
    # locate the original hdrl list and inject the audio strl after avih
    assert body[:4] == b"LIST"
    hdrl_size = _s.unpack_from("<I", body, 4)[0]
    hdrl_body = body[12 : 8 + hdrl_size]  # after 'hdrl' fourcc
    avih_size = _s.unpack_from("<I", hdrl_body, 4)[0]
    avih_chunk = hdrl_body[: 8 + avih_size + (avih_size & 1)]
    video_strl = hdrl_body[len(avih_chunk):]
    # add a stream-01 '01db' RED HERRING frame in movi that must NOT
    # be returned (the video stream is 00; 01 is the audio stream)
    movi = body[8 + hdrl_size + (hdrl_size & 1):]
    herring = _chunk(b"01db", b"\xff" * 76)
    assert movi[:4] == b"LIST"
    movi_size = _s.unpack_from("<I", movi, 4)[0]
    movi_body = movi[12 : 8 + movi_size]
    new_avi = (
        b"RIFF" + b"\x00\x00\x00\x00" + b"AVI "
        + _lst(b"hdrl", avih_chunk + video_strl + audio_strl)
        + _lst(b"movi", movi_body + herring)
    )
    bomb = b"RIFF" + b"\x00\x00\x00\x00" + b"AVI "
    nest = _chunk(b"00db", b"x" * 4)
    for _ in range(2000):
        nest = _lst(b"hdrl", nest)
    bomb = bomb + nest

    media = spark.createDataFrame(
        [
            (1, new_avi, "video/avi", (None, None, None)),
            (2, bomb, "video/avi", (None, None, None)),
        ],
        MEDIA_SCHEMA,
    )
    got = sample_frames_video(media, every_k=1).collect()
    assert {r["media_id"] for r in got} == {1}
    assert len(got) == 3  # only the 00-stream frames, herring excluded
    dec = decode_image(
        spark.createDataFrame(
            [(1, bytes(got[0]["frame"]), "image/bmp", (None, None, None))],
            MEDIA_SCHEMA,
        )
    ).first()
    assert (dec["decoded_width"], dec["decoded_height"], dec["ok"]) == (6, 4, True)


def test_decode_image_png_roundtrip(spark):
    # PNG encodes scanline y with filter type y % 5: any height >= 5
    # exercises every PNG filter (None/Sub/Up/Average/Paeth) on decode.
    # Same (w, h, seed) must yield identical pixels to the PPM path.
    from pandance_spark.operators.multimodal import pack_png_image

    rows = [
        (1, pack_png_image(13, 7, seed=42), "image/png", (13, 7, None)),
        (2, pack_ppm_image(13, 7, seed=42), "image/x-ppm", (13, 7, None)),
    ]
    out = {
        r["media_id"]: r
        for r in decode_image(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert out[1]["decoded_format"] == "png" and out[1]["ok"] is True
    assert (out[1]["decoded_width"], out[1]["decoded_height"]) == (13, 7)
    for c in ("sum_r", "sum_g", "sum_b"):
        assert out[1][c] == out[2][c]


def test_decode_image_png_corrupt_degrades(spark):
    from pandance_spark.operators.multimodal import pack_png_image

    good = pack_png_image(6, 6, seed=9)
    bad_crc = bytearray(good)
    bad_crc[-5] ^= 0xFF  # flip a byte of IEND's CRC
    bad_idat = bytearray(good)
    bad_idat[good.index(b"IDAT") + 6] ^= 0xFF  # corrupt compressed data
    rows = [
        (1, bytes(bad_crc), "image/png", (None, None, None)),
        (2, good[:40], "image/png", (None, None, None)),  # truncated
        (3, bytes(bad_idat), "image/png", (None, None, None)),
        (4, good, "image/png", (6, 6, None)),
    ]
    out = {
        r["media_id"]: r
        for r in decode_image(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    for mid in (1, 2, 3):
        assert out[mid]["ok"] is False and out[mid]["sum_r"] is None
    assert out[4]["ok"] is True


def test_decode_image_png_gray_and_rgba(spark):
    # hand-built color-type 0 (gray -> replicated RGB) and 6 (RGBA ->
    # alpha dropped) payloads through the public decode path
    import struct as _s
    import zlib as _z

    from pandance_spark.operators.multimodal import _PNG_SIG, _png_chunk

    def build(color_type, channels, w, h):
        stride = w * channels
        body = (np.arange(h * stride, dtype=np.int64) % 256).astype(np.uint8)
        lines = b"".join(
            b"\x00" + body[y * stride : (y + 1) * stride].tobytes()
            for y in range(h)
        )
        ihdr = _s.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
        return (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", _z.compress(lines))
            + _png_chunk(b"IEND", b"")
        )

    rows = [
        (1, build(0, 1, 3, 2), "image/png", (3, 2, None)),
        (2, build(6, 4, 3, 2), "image/png", (3, 2, None)),
    ]
    out = {
        r["media_id"]: r
        for r in decode_image(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    # gray values 0..5 replicated across channels: each channel sums 15
    assert (out[1]["sum_r"], out[1]["sum_g"], out[1]["sum_b"]) == (15, 15, 15)
    assert out[1]["ok"] is True and out[1]["decoded_format"] == "png"
    # RGBA bytes 0..23: R bytes are 0,4,8,12,16,20 -> 60; G -> 66; B -> 72
    assert (out[2]["sum_r"], out[2]["sum_g"], out[2]["sum_b"]) == (60, 66, 72)


def test_resize_image_png_input(spark):
    # resize accepts PNG input (decode -> NN resample -> re-encode P6)
    # and matches the PPM input pixel-for-pixel
    from pandance_spark.operators.multimodal import pack_png_image

    w, h, seed = 8, 6, 3
    media = spark.createDataFrame(
        [
            (1, pack_png_image(w, h, seed), "image/png", (w, h, None)),
            (2, pack_ppm_image(w, h, seed), "image/x-ppm", (w, h, None)),
        ],
        MEDIA_SCHEMA,
    )
    out = {
        r["media_id"]: r
        for r in decode_image(resize_image(media, 4, 3)).collect()
    }
    assert out[1]["ok"] is True and out[1]["decoded_format"] == "ppm"
    assert (out[1]["decoded_width"], out[1]["decoded_height"]) == (4, 3)
    for c in ("sum_r", "sum_g", "sum_b"):
        assert out[1][c] == out[2][c]


def test_decode_image_jpeg_dc_exact_roundtrip(spark):
    # constant-8x8-block payloads round-trip EXACTLY through the lossy
    # pipeline (DC-only blocks, flat quant table) — decoded sums match
    # the packer's closed form
    from pandance_spark.operators.multimodal import pack_jpeg_image

    w, h, seed = 19, 14, 123  # non-multiple-of-8 dims: partial edge blocks
    bx = (w + 7) // 8
    exp = 0
    for y in range(h):
        for x in range(w):
            exp += (seed + 17 * ((y // 8) * bx + x // 8)) % 256
    r = decode_image(
        spark.createDataFrame(
            [(1, pack_jpeg_image(w, h, seed), "image/jpeg", (w, h, None))],
            MEDIA_SCHEMA,
        )
    ).first()
    assert (r["decoded_width"], r["decoded_height"], r["decoded_format"]) == (
        w, h, "jpeg",
    )
    assert r["ok"] is True
    assert r["sum_r"] == r["sum_g"] == r["sum_b"] == exp


def test_decode_image_jpeg_general_ac_blocks(spark):
    # decoder generality: a block with real AC coefficients decodes to
    # exactly dequantize+IDCT of the quantized spectrum (within the
    # +-1 lossy rounding of the original pixels)
    import struct as _s

    import pandance_spark.operators.multimodal as mm

    rng = np.random.default_rng(7)
    block = rng.integers(0, 256, size=(8, 8)).astype(np.float64)
    C = mm._JPG_DCT_C
    coefs = C @ (block - 128.0) @ C.T
    zz = np.rint(coefs).astype(np.int64).reshape(64)[mm._JPG_ZIGZAG]
    dcc = mm._jpg_huff_codes(mm._JPG_DC_BITS, mm._JPG_DC_VALS)
    acc = mm._jpg_huff_codes(mm._JPG_AC_BITS, mm._JPG_AC_VALS)
    wtr = mm._JpgBitWriter()
    diff = int(zz[0])
    cat = abs(diff).bit_length()
    code, ln = dcc[cat]
    wtr.write(code, ln)
    if cat:
        bits = diff if diff >= 0 else diff + (1 << cat) - 1
        wtr.write(bits & ((1 << cat) - 1), cat)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            c2, l2 = acc[0x00]
            wtr.write(c2, l2)
            break
        while run > 15:
            c2, l2 = acc[0xF0]
            wtr.write(c2, l2)
            run -= 16
        v = int(zz[k])
        size = abs(v).bit_length()
        c2, l2 = acc[(run << 4) | size]
        wtr.write(c2, l2)
        bits = v if v >= 0 else v + (1 << size) - 1
        wtr.write(bits & ((1 << size) - 1), size)
        k += 1
    scan = wtr.flush()

    def seg(m, p):
        return bytes([0xFF, m]) + _s.pack(">H", len(p) + 2) + p

    raw = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes([1] * 64))
        + seg(0xC0, _s.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0]))
        + seg(0xC4, bytes([0x00]) + bytes(mm._JPG_DC_BITS[1:])
              + bytes(mm._JPG_DC_VALS) + bytes([0x10])
              + bytes(mm._JPG_AC_BITS[1:]) + bytes(mm._JPG_AC_VALS))
        + seg(0xDA, bytes([1, 1, 0, 0, 63, 0]))
        + scan + b"\xff\xd9"
    )
    img = mm._parse_jpeg(raw)
    rec = C.T @ np.rint(coefs) @ C
    ref = np.clip(np.rint(rec + 128.0), 0, 255).astype(np.uint8)
    assert img is not None and np.array_equal(img[:, :, 0], ref)
    assert np.abs(img[:, :, 0].astype(int) - block.astype(int)).max() <= 1


def test_decode_image_jpeg_corrupt_and_progressive_degrade(spark):
    from pandance_spark.operators.multimodal import pack_jpeg_image

    good = pack_jpeg_image(16, 16, 9)
    progressive = bytearray(good)
    sof = progressive.index(b"\xff\xc0")
    progressive[sof + 1] = 0xC2  # mark as progressive -> unsupported
    rows = [
        (1, good[:20], "image/jpeg", (None, None, None)),  # truncated
        (2, bytes(progressive), "image/jpeg", (None, None, None)),
        (3, good, "image/jpeg", (16, 16, None)),
    ]
    out = {
        r["media_id"]: r
        for r in decode_image(
            spark.createDataFrame(rows, MEDIA_SCHEMA)
        ).collect()
    }
    assert out[1]["ok"] is False and out[2]["ok"] is False
    assert out[3]["ok"] is True and out[3]["decoded_format"] == "jpeg"


def test_parse_jpeg_foreign_libjpeg_420_pinned():
    """Decode a FOREIGN-encoded baseline 4:2:0 JPEG (libjpeg-produced
    photo shipped with Apache Spark's MLlib test data — public,
    Apache-2.0) so `_parse_jpeg` correctness doesn't rest on
    round-tripping its own packer (which is DC-only, 1x1-sampled).
    This exercises real Annex-K-divergent Huffman tables, AC runs,
    APP/EXIF segment skipping and 2x2 chroma subsampling.  Pins are
    total AND center-crop per-channel sums (total sums alone could
    mask spatially-compensating errors)."""
    import os

    from pandance_spark.operators.multimodal import _parse_jpeg

    path = os.path.join(os.path.dirname(__file__), "data",
                        "foreign_libjpeg_420.jpg")
    img = _parse_jpeg(open(path, "rb").read())
    assert img is not None and img.shape == (200, 300, 3)
    assert [int(img[:, :, c].sum()) for c in range(3)] == [
        7946201, 7759297, 7408465,
    ]
    crop = img[75:125, 125:175]
    assert [int(crop[:, :, c].sum()) for c in range(3)] == [
        180578, 162914, 144023,
    ]
    # plausibility of the color transform: a daylight photo decodes to
    # mid-range means on every channel, not saturated or inverted
    means = img.reshape(-1, 3).mean(axis=0)
    assert all(80 < m < 180 for m in means)


def test_decode_image_bomb_headers_degrade(spark):
    # attacker-controlled headers declaring huge dims must degrade to
    # ok=false, never allocate (decode-side _MAX_DECODE_PIXELS cap)
    import struct as _s
    import zlib as _z

    from pandance_spark.operators.multimodal import (
        _PNG_SIG,
        _png_chunk,
        pack_jpeg_image,
    )

    ihdr = _s.pack(">IIBBBBB", 20000, 20000, 8, 2, 0, 0, 0)
    png_bomb = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"\x00" * 1000))
        + _png_chunk(b"IEND", b"")
    )
    # deflate stream longer than the declared dims allow -> malformed
    ihdr2 = _s.pack(">IIBBBBB", 4, 2, 8, 2, 0, 0, 0)
    png_over = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr2)
        + _png_chunk(b"IDAT", _z.compress(b"\x00" * 10000))
        + _png_chunk(b"IEND", b"")
    )
    jpg_bomb = bytearray(pack_jpeg_image(8, 8, 1))
    sof = jpg_bomb.index(b"\xff\xc0")
    _s.pack_into(">HH", jpg_bomb, sof + 5, 65535, 65535)
    rows = [
        (1, png_bomb, "image/png", (None, None, None)),
        (2, png_over, "image/png", (None, None, None)),
        (3, bytes(jpg_bomb), "image/jpeg", (None, None, None)),
    ]
    out = decode_image(spark.createDataFrame(rows, MEDIA_SCHEMA)).collect()
    assert all(r["ok"] is False for r in out)


def test_lzw_roundtrip_properties():
    import numpy as np
    from pandance_spark.operators.multimodal import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(42)
    cases = [
        b"",
        b"\x00",
        b"abababababab",
        rng.integers(0, 256, 70000).astype(np.uint8).tobytes(),  # resets
        rng.integers(0, 2, 120000).astype(np.uint8).tobytes(),
    ]
    for data in cases:
        enc = _lzw_encode(data, 8)
        assert _lzw_decode(enc, 8, len(data) + 16) == data
    # max_out hard cap: decoder stops at the declared raster size
    big = _lzw_encode(b"\x01" * 10000, 8)
    assert len(_lzw_decode(big, 8, 100)) == 100


def test_parse_gif_foreign_bytes_and_interlace():
    import base64
    import numpy as np
    from pandance_spark.operators.multimodal import (
        _lzw_encode,
        _parse_gif,
        pack_gif_image,
    )

    # foreign-encoded ground truth (classic 1x1 black pixel GIF):
    # proves the decoder is spec-conformant, not just the inverse of
    # our own encoder
    tiny = base64.b64decode(
        "R0lGODlhAQABAIAAAAAAAP///yH5BAEAAAAALAAAAAABAAEAAAIBRAA7"
    )
    img = _parse_gif(tiny)
    assert img is not None and img.shape == (1, 1, 3)
    assert img.tolist() == [[[0, 0, 0]]]

    # interlaced variant: rows are stored by pass (0,8..|4,8..|2,4..|
    # 1,2..); build one by permuting the packer's rows and setting the
    # interlace flag, then assert the decoder restores display order
    w, h, seed = 9, 11, 5
    plain = _parse_gif(pack_gif_image(w, h, seed))
    idx = ((seed + 7 * np.arange(w * h, dtype=np.int64)) % 256).astype(
        np.uint8
    ).reshape(h, w)
    order = [r for s, st in ((0, 8), (4, 8), (2, 4), (1, 2))
             for r in range(s, h, st)]
    stored = idx[order]  # what an interlaced file stores sequentially
    import struct as _s
    j = np.arange(256, dtype=np.int64)
    palette = np.stack([j, (2 * j) % 256, (3 * j) % 256], axis=1).astype(
        np.uint8
    )
    lzw = _lzw_encode(stored.tobytes(), 8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        c = lzw[i:i + 255]
        blocks.append(len(c))
        blocks.extend(c)
    blocks.append(0)
    gif = (b"GIF89a" + _s.pack("<HHBBB", w, h, 0xF7, 0, 0)
           + palette.tobytes() + b"\x2c"
           + _s.pack("<HHHHB", 0, 0, w, h, 0x40)  # interlace flag
           + bytes([8]) + bytes(blocks) + b"\x3b")
    inter = _parse_gif(gif)
    assert inter is not None and (inter == plain).all()


def test_parse_gif_corrupt_and_bomb_degrade():
    from pandance_spark.operators.multimodal import _parse_gif, pack_gif_image

    good = pack_gif_image(8, 8, 1)
    assert _parse_gif(good) is not None
    assert _parse_gif(b"GIF89a") is None                  # truncated
    assert _parse_gif(good[:20]) is None                  # mid-palette
    assert _parse_gif(b"NOPE" + good[4:]) is None         # bad magic
    # 65535x65535 declared dims in a tiny payload: capped, not OOM
    import struct as _s
    bomb = b"GIF89a" + _s.pack("<HHBBB", 65535, 65535, 0xF7, 0, 0)
    assert _parse_gif(bomb + b"\x00" * 768) is None
    # truncated LZW stream (EOI never arrives)
    assert _parse_gif(good[:-10] + b"\x00") is None


def test_decode_image_gif_matches_closed_form(spark):
    import numpy as np
    from pandance_spark.operators.multimodal import decode_image, pack_gif_image

    rows = [(i, pack_gif_image(4 + i % 5, 3 + i % 4, i * 13 % 251))
            for i in range(12)]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    out = {r["media_id"]: r for r in decode_image(df).collect()}
    for i in range(12):
        w, h, seed = 4 + i % 5, 3 + i % 4, i * 13 % 251
        p = (seed + 7 * np.arange(w * h, dtype=np.int64)) % 256
        r = out[i]
        assert r["ok"] and r["decoded_format"] == "gif"
        assert (r["decoded_width"], r["decoded_height"]) == (w, h)
        assert r["sum_r"] == int(p.sum())
        assert r["sum_g"] == int(((2 * p) % 256).sum())
        assert r["sum_b"] == int(((3 * p) % 256).sum())


def test_mp3_meta_roundtrip_and_guards():
    from pandance_spark.operators.multimodal import (
        _parse_mp3_meta,
        pack_mp3_audio,
    )

    tab = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
           320, 0]
    for n, bi in ((10, 9), (1, 1), (100, 14)):
        fc, dur, br, sr = _parse_mp3_meta(pack_mp3_audio(n, bi, seed=5))
        assert (fc, sr, br) == (n, 44100, tab[bi])
        assert dur == n * 1152 * 1000 // 44100
    assert _parse_mp3_meta(b"") is None
    assert _parse_mp3_meta(b"ID3" + bytes(7)) is None          # truncated tag
    assert _parse_mp3_meta(b"\xff\xfb\x00\x00") is None        # free bitrate
    # partial trailing frame is dropped, not an error
    assert _parse_mp3_meta(pack_mp3_audio(5, 9)[:-30])[0] == 4
    with pytest.raises(ValueError):
        pack_mp3_audio(1, 0)


def test_mp4_meta_roundtrip_and_guards():
    from pandance_spark.operators.multimodal import (
        _parse_mp4_meta,
        pack_mp4_video,
    )

    raw = pack_mp4_video(640, 360, 12345, n_bytes=100, seed=3)
    assert _parse_mp4_meta(raw) == (12345, 640, 360, 100)
    assert _parse_mp4_meta(raw[:20]) is None          # truncated box
    assert _parse_mp4_meta(b"\x00\x00\x00\x01ftyp") is None  # size < 8
    # declared box size beyond the buffer: reject, no overread
    bad = bytearray(raw)
    bad[0:4] = (1 << 30).to_bytes(4, "big")
    assert _parse_mp4_meta(bytes(bad)) is None


def test_media_metadata_mixed_batch(spark):
    from pandance_spark.operators.multimodal import (
        media_metadata,
        pack_mp3_audio,
        pack_mp4_video,
    )

    rows = [
        (1, pack_mp3_audio(7, 9)),
        (2, pack_mp4_video(320, 240, 2500, n_bytes=40)),
        (3, b"not media at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, ["media_id", "payload"])
    out = {r["media_id"]: r for r in media_metadata(df).collect()}
    assert out[1]["media_format"] == "mp3" and out[1]["frame_count"] == 7
    assert out[1]["duration_ms"] == 7 * 1152 * 1000 // 44100
    assert out[2]["media_format"] == "mp4" and out[2]["width"] == 320
    assert out[2]["payload_bytes"] == 40
    assert not out[3]["ok"] and not out[4]["ok"]


def test_gif_animation_frames_and_sampler(spark):
    import numpy as np
    from pandance_spark.operators.multimodal import (
        _gif_frames,
        decode_image,
        pack_gif_animation,
        sample_frames_gif,
    )

    raw = pack_gif_animation(5, 7, 4, seed=11)
    frames = list(_gif_frames(raw))
    assert [f for f, _ in frames] == [0, 1, 2, 3, 4]
    n = 28
    for f, img in frames:
        p = (11 + 31 * f + 7 * np.arange(n)) % 256
        exp = np.stack(
            [p, (2 * p) % 256, (3 * p) % 256], axis=1
        ).reshape(4, 7, 3)
        assert (img == exp).all()

    df = spark.createDataFrame(
        [(1, raw), (2, b"junk"), (3, None)], ["media_id", "payload"]
    )
    out = sample_frames_gif(df, every_k=2)
    rows = decode_image(out, payload_col="frame").collect()
    assert sorted(r["frame_index"] for r in rows) == [0, 2, 4]
    assert all(r["ok"] and r["decoded_width"] == 7 for r in rows)
    with pytest.raises(ValueError):
        sample_frames_gif(df, every_k=0)
    with pytest.raises(ValueError):
        pack_gif_animation(0, 4, 4, 1)


def test_image_hashes_format_independent(spark):
    from pandance_spark.operators.multimodal import (
        image_hashes,
        pack_bmp_image,
        pack_png_image,
        pack_ppm_image,
    )

    rows = [
        (0, pack_ppm_image(24, 16, 5)),
        (1, pack_bmp_image(24, 16, 5)),
        (2, pack_png_image(24, 16, 5)),
        (3, pack_ppm_image(24, 16, 9)),
        (4, b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = {r["media_id"]: (r["ahash"], r["dhash"], r["ok"])
           for r in image_hashes(df).collect()}
    # same pixels, three containers -> identical perceptual hashes
    assert got[0] == got[1] == got[2]
    assert got[0][2] is True
    # different raster -> different hash (64-bit collision ~ impossible)
    assert got[3][1] != got[0][1]
    assert got[4] == (None, None, False)


def test_image_hash_bit_math(spark):
    from pandance_spark.operators.multimodal import _perceptual_hashes
    import numpy as np

    # left half black, right half white, 16x16
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:, :] = 255
    a, d = _perceptual_hashes(img)
    # aHash: right-half blocks (cols 4..7 of the 8x8 grid) above mean
    want_a = 0
    for r in range(8):
        for c in range(4, 8):
            want_a |= 1 << (r * 8 + c)
    assert a == (want_a - (1 << 64) if want_a >= (1 << 63) else want_a)
    # dHash: monotone non-decreasing rows -> no bit set
    assert d == 0
    # decreasing gradient -> every dhash bit set -> all-ones (== -1)
    grad = np.repeat(
        np.linspace(255, 0, 18, dtype=np.uint8)[None, :, None], 16, axis=0
    ).repeat(3, axis=2)
    _, d2 = _perceptual_hashes(grad)
    assert d2 == -1


def test_image_near_dup_cross_format_and_perturbed(spark):
    from pandance_spark.operators.multimodal import (
        image_near_dup,
        pack_png_image,
        pack_ppm_image,
    )

    base = pack_ppm_image(32, 32, 7)
    # perturb a few raster bytes (+1 mod 256) well past the header
    perturbed = bytearray(base)
    for off in range(200, 210):
        perturbed[off] = (perturbed[off] + 1) % 256
    rows = [
        (0, base),
        (1, pack_png_image(32, 32, 7)),   # same pixels, other codec
        (2, bytes(perturbed)),            # near-dup
        (3, pack_ppm_image(32, 32, 8)),   # unrelated
        (4, b"\x00garbage"),              # undecodable -> skipped
    ]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    out = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in image_near_dup(df, max_hamming=4).collect()}
    assert out[(0, 1)] == 0
    assert (0, 2) in out and out[(0, 2)] <= 4
    assert not any(3 in p or 4 in p for p in out)


def test_audio_segments_gated_pattern(spark):
    import numpy as np
    from pandance_spark.operators.multimodal import (
        audio_segments,
        pack_wav_gated,
    )

    # 1600 mono samples, gate 400: [sil 400][act 400][sil 400][act 400]
    # frame 400 -> frames 0,2 silent; 1,3 active
    wav = pack_wav_gated(1600, 16000, seed=5, gate_period=400)
    df = spark.createDataFrame([(1, wav)], "media_id long, payload binary")
    segs = sorted(
        (r["seg_idx"], r["start_frame"], r["n_frames"], r["energy"])
        for r in audio_segments(
            df, frame_samples=400, threshold=1000
        ).collect()
    )
    i = np.arange(1600, dtype=np.int64)
    base = np.abs(((5 + 11 * i) % 65536) - 32768)
    act = np.where((i // 400) % 2 == 1, base, 0)
    e1, e3 = int(act[400:800].sum()), int(act[1200:1600].sum())
    assert segs == [(0, 1, 1, e1), (1, 3, 1, e3)]
    # min_frames=2 filters the single-frame runs out
    assert (
        audio_segments(df, frame_samples=400, threshold=1000, min_frames=2)
        .count()
        == 0
    )
    # frame 200 merges each active block into a 2-frame run
    segs2 = sorted(
        (r["seg_idx"], r["start_frame"], r["n_frames"])
        for r in audio_segments(
            df, frame_samples=200, threshold=1000, min_frames=2
        ).collect()
    )
    assert segs2 == [(0, 2, 2), (1, 6, 2)]


def test_audio_segments_partial_frame_and_corrupt(spark):
    from pandance_spark.operators.multimodal import (
        audio_segments,
        pack_wav_gated,
    )

    # 1000 samples, gate 400: f0 sil, f1 act, f2 (200 samples) sil
    wav = pack_wav_gated(1000, 8000, seed=9, gate_period=400)
    rows = [(1, wav), (2, b"not audio")]
    df = spark.createDataFrame(rows, "media_id long, payload binary")
    got = audio_segments(df, frame_samples=400, threshold=1000).collect()
    assert [(r["media_id"], r["seg_idx"], r["start_frame"], r["n_frames"])
            for r in got] == [(1, 0, 1, 1)]


def test_audio_segments_stereo(spark):
    from pandance_spark.operators.multimodal import (
        audio_segments,
        pack_wav_gated,
    )

    # stereo: gate on the interleaved index, 800 per-channel samples
    wav = pack_wav_gated(800, 16000, seed=3, gate_period=400, n_channels=2)
    df = spark.createDataFrame([(7, wav)], "media_id long, payload binary")
    got = audio_segments(df, frame_samples=200, threshold=1000).collect()
    # interleaved 1600 values: [sil 400][act 400][sil 400][act 400]
    # = per-channel rows [sil 200][act 200][sil 200][act 200]
    assert sorted((r["seg_idx"], r["start_frame"], r["n_frames"])
                  for r in got) == [(0, 1, 1), (1, 3, 1)]


def test_image_metadata_headers_agree_with_decoders(spark):
    """Header-only dims must equal the full decoders' output for every
    packed format, WebP (VP8X and VP8L) must parse, and corrupt /
    unknown payloads must degrade to ok=false."""
    from pandance_spark.operators.multimodal import (
        image_metadata,
        pack_bmp_image,
        pack_gif_image,
        pack_jpeg_image,
        pack_png_image,
        pack_ppm_image,
        pack_webp_meta,
    )

    rows = [
        (1, pack_png_image(12, 7, 3), "png", 12, 7),
        (2, pack_jpeg_image(16, 8, 5), "jpeg", 16, 8),
        (3, pack_gif_image(9, 11, 1), "gif", 9, 11),
        (4, pack_bmp_image(6, 5, 2), "bmp", 6, 5),
        (5, pack_ppm_image(4, 9, 0), "ppm", 4, 9),
        (6, pack_webp_meta(640, 480), "webp", 640, 480),
        (7, pack_webp_meta(31, 17, lossless=True), "webp", 31, 17),
        (8, b"\x00\x01garbage", None, None, None),
        (9, b"RIFF\x04\x00\x00\x00WAVE", None, None, None),
    ]
    df = spark.createDataFrame(
        [(i, p) for i, p, *_ in rows], "media_id long, payload binary"
    )
    out = {r["media_id"]: r for r in image_metadata(df).collect()}
    for i, payload, fmt, w, h in rows:
        r = out[i]
        assert r["img_format"] == fmt, (i, r["img_format"])
        assert r["width"] == w and r["height"] == h, (i, r)
        assert r["ok"] is (fmt is not None)
        assert r["payload_bytes"] == len(payload)

    # foreign libjpeg 4:2:0 photo: header walk must see SOF0 dims
    import os

    from pandance_spark.operators.multimodal import _image_header_meta

    path = os.path.join(os.path.dirname(__file__), "data",
                        "foreign_libjpeg_420.jpg")
    assert _image_header_meta(open(path, "rb").read()) == ("jpeg", 300, 200)


def test_image_header_meta_edge_contracts():
    """r8 advice pins: (1) JPEG 0xFF fill-byte padding before a marker
    is legal (T.81 B.1.1.2) and must not derail the walk; (2) a BMP
    header with a negative/zero width degrades to None (ok=false),
    never a negative dimension; (3) pack_webp_meta's VP8X flags byte
    is 0x00 — no feature bit (Alpha et al.) may be set when no
    feature chunk follows."""
    import struct

    from pandance_spark.operators.multimodal import (
        _image_header_meta,
        pack_jpeg_image,
        pack_webp_meta,
    )

    # (1) inject fill bytes between SOI and the first marker, and
    # again before the next one — dims must still parse
    raw = pack_jpeg_image(16, 8, 5)
    assert raw[:2] == b"\xff\xd8"
    padded = raw[:2] + b"\xff\xff\xff" + raw[2:]
    assert _image_header_meta(padded) == ("jpeg", 16, 8)

    # (2) malformed BMP widths/heights → None, matching the fuzz
    # invariant meta[1] >= 0
    def bmp(w, h):
        hdr = bytearray(26)
        hdr[:2] = b"BM"
        struct.pack_into("<ii", hdr, 18, w, h)
        return bytes(hdr)

    assert _image_header_meta(bmp(-3, 5)) is None
    assert _image_header_meta(bmp(0, 5)) is None
    assert _image_header_meta(bmp(6, 0)) is None
    assert _image_header_meta(bmp(6, -5)) == ("bmp", 6, 5)  # top-down

    # (3) VP8X flags byte: Rsv(2)|ICC|Alpha|EXIF|XMP|Anim|Rsv
    payload = pack_webp_meta(640, 480)
    vp8x = payload.index(b"VP8X")
    assert payload[vp8x + 8] == 0x00
