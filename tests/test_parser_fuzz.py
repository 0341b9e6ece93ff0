"""Parser robustness fuzzing (Hypothesis, pure functions — no Spark).

Every byte-level parser in the multimodal/WARC stack must be total:
arbitrary bytes and bit-flipped valid files either parse or return
None/empty — never raise.  This is the `ok=false`-not-task-failure
contract at its root: one crafted object in a 100 TB scan must not
kill an executor.  Pure-Python targets, so example counts are high.
"""

import struct

from hypothesis import given, settings, strategies as st

from pandance_spark.operators.multimodal import (
    _decode_any,
    _image_header_meta,
    pack_bmp_image,
    pack_gif_image,
    pack_jpeg_image,
    pack_png_image,
    pack_ppm_image,
    pack_webp_meta,
)

_FAST = dict(max_examples=200, deadline=None, derandomize=True)


@settings(**_FAST)
@given(raw=st.binary(min_size=0, max_size=400))
def test_random_bytes_never_raise(raw):
    img, fmt = _decode_any(raw)
    assert img is None or img.ndim == 3
    meta = _image_header_meta(raw)
    assert meta is None or (len(meta) == 3 and meta[1] >= 0)


@settings(**_FAST)
@given(
    fmt=st.sampled_from(["png", "jpeg", "gif", "bmp", "ppm", "webp"]),
    seed=st.integers(0, 240),
    pos=st.integers(0, 10_000),
    bit=st.integers(0, 7),
    data=st.data(),
)
def test_bitflipped_valid_files_never_raise(fmt, seed, pos, bit, data):
    """Bit-flip corruption reaches DEEP parser paths (valid magic,
    valid early headers, garbage later) that pure-random bytes almost
    never exercise."""
    packers = {
        "png": lambda: pack_png_image(6, 7, seed),
        "jpeg": lambda: pack_jpeg_image(8, 8, seed),
        "gif": lambda: pack_gif_image(6, 7, seed),
        "bmp": lambda: pack_bmp_image(6, 7, seed),
        "ppm": lambda: pack_ppm_image(6, 7, seed),
        "webp": lambda: pack_webp_meta(40 + seed, 30 + seed % 20),
    }
    raw = bytearray(packers[fmt]())
    p = pos % len(raw)
    raw[p] ^= 1 << bit
    raw = bytes(raw)
    img, _ = _decode_any(raw)            # may be None or a valid array
    assert img is None or img.ndim == 3
    meta = _image_header_meta(raw)
    assert meta is None or len(meta) == 3
    # truncation at an arbitrary point must also be safe
    cut = data.draw(st.integers(0, len(raw)))
    img2, _ = _decode_any(raw[:cut])
    assert img2 is None or img2.ndim == 3
    assert _image_header_meta(raw[:cut]) is None or True


@settings(**_FAST)
@given(raw=st.binary(min_size=0, max_size=300))
def test_warc_parser_total(raw):
    from pandance_spark.sources.warc import (
        _gunzip_members,
        parse_warc,
    )

    out = parse_warc(raw)
    assert out is None or isinstance(out, list)
    gz = _gunzip_members(raw)
    assert gz is None or isinstance(gz, bytes)


@settings(**_FAST)
@given(
    seed=st.integers(0, 100),
    pos=st.integers(0, 10_000),
    bit=st.integers(0, 7),
)
def test_warc_bitflip_total(seed, pos, bit):
    from pandance_spark.sources.warc import pack_warc, parse_warc

    raw = bytearray(pack_warc([
        {"uri": f"http://example.com/{seed}",
         "body": f"<html>hi {seed}</html>",
         "ctype": "text/html"},
    ]))
    p = pos % len(raw)
    raw[p] ^= 1 << bit
    out = parse_warc(bytes(raw))
    assert out is None or isinstance(out, list)
