"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Engine extension beyond the reference (SURVEY.md §2.4).  The Spark-side
plumbing — schemas, ``mapInPandas`` batch shape, partitioning — is real
and tested, and so is the image codec for the two formats a pure
Python + numpy stack can handle without native libraries:

- ``decode_image`` is a REAL decoder for binary PPM (``P6``),
  uncompressed 24-bit BMP, PNG (8-bit gray/RGB/RGBA, non-interlaced —
  stdlib ``zlib`` inflate + numpy scanline unfiltering incl.
  Sub/Up/Average/Paeth, CRC-verified chunks), and baseline JPEG
  (ITU-T T.81: canonical Huffman entropy decode with restart support,
  dequantize, orthonormal IDCT; grayscale + 4:4:4 YCbCr;
  progressive/subsampled degrade to ``ok=false``), and GIF87a/89a
  (pure-Python LZW with variable code width + table reset, global/
  local palettes, interlace reorder; first frame of animations);
  unrecognized/corrupt payloads yield ``ok = false`` rows, never a
  task failure.  Swap in PIL/libvips inside the same ``mapInPandas``
  stage for subsampled/progressive JPEG and multi-frame animation
  sampling;
- ``resize_image`` is a REAL nearest-neighbor resampler over the same
  two formats (decode → numpy index-select → re-encode as P6);
- ``fake_decode_meta`` remains as the stand-in for *opaque* formats
  (parses the ``FIMG`` fake header) so pipelines can be exercised with
  payloads no pure-Python codec exists for;
- ``byte_histogram_features`` is a REAL feature extractor (16-bin byte
  histogram) — a cheap content fingerprint for any binary payload.

Design for scale: payloads stay in executor memory only for the batch
being processed (``mapInPandas`` streams Arrow batches); metadata
columns are plain columns so filters on them prune parquet row groups
without touching payload bytes; per-channel pixel statistics are
emitted as exact integer sums (not float means) so results compare
bit-for-bit across engines and partitionings.
"""

from __future__ import annotations

import os as _os
import struct
import zlib
from typing import Iterator, Optional, Tuple

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "pack_fake_image",
    "pack_fake_video",
    "pack_ppm_image",
    "pack_bmp_image",
    "pack_png_image",
    "pack_gif_image",
    "pack_gif_animation",
    "sample_frames_gif",
    "pack_jpeg_image",
    "pack_wav_audio",
    "pack_mp3_audio",
    "pack_mp4_video",
    "media_metadata",
    "image_metadata",
    "pack_webp_meta",
    "decode_audio",
    "pack_wav_gated",
    "audio_segments",
    "pack_avi_video",
    "sample_frames_video",
    "attach_binary_payload",
    "fake_decode_meta",
    "decode_image",
    "image_hashes",
    "image_near_dup",
    "resize_image",
    "fake_resize",
    "sample_frames",
    "byte_histogram_features",
]

# canonical multimodal column bundle: payload + typed metadata
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("media_type", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("n_bytes", T.LongType(), True),
                ]
            ),
            True,
        ),
    ]
)

_MAGIC = b"FIMG"


def pack_fake_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic fake image payload: magic + dims + seeded bytes."""
    body_len = min(width * height, 4096)
    body = bytes((seed * 31 + i * 7) % 256 for i in range(body_len))
    return _MAGIC + struct.pack("<II", width, height) + body


def attach_binary_payload(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Demo plumbing: derive a binary payload column from a text column
    (utf-8 encode) with metadata — the shape a real ingest produces."""
    payload = F.encode(F.col(text_col), "utf-8")
    return df.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("text/plain").alias("media_type"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
        ).alias("meta"),
    )


def pack_ppm_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic binary-PPM (``P6``) payload: standard header plus
    RGB raster where byte ``i`` is ``(seed + 7*i) % 256`` — a closed
    form an independent engine can recompute without a codec, which is
    what the driver oracle does."""
    n = width * height * 3
    body = ((seed + 7 * np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)
    return b"P6\n%d %d\n255\n" % (width, height) + body.tobytes()


def pack_bmp_image(width: int, height: int, seed: int) -> bytes:
    """Same deterministic raster as :func:`pack_ppm_image`, encoded as
    an uncompressed bottom-up 24-bit BMP (BGR rows padded to 4 bytes)
    — decoding either format for the same (width, height, seed) yields
    identical pixels, which the tests assert."""
    return _bmp_wrap(width, height, _dib_frame_bytes(width, height, seed))


_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# decode-side allocation cap: headers are attacker-controlled, and a
# few-hundred-byte payload declaring 65535x65535 dims must degrade to
# ok=false, not OOM the executor ("one bad object cannot kill a 100 TB
# scan").  16M pixels covers any sane in-pipeline image; raise it
# deliberately if a corpus genuinely carries larger frames.
_MAX_DECODE_PIXELS = 16_000_000


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def pack_png_image(width: int, height: int, seed: int) -> bytes:
    """Same deterministic raster as :func:`pack_ppm_image`, encoded as
    a REAL spec-conformant PNG (8-bit RGB, zlib-deflated IDAT, CRC'd
    chunks).  Scanline ``y`` uses filter type ``y % 5``, so a payload
    taller than 4 rows exercises every PNG filter (None/Sub/Up/
    Average/Paeth) on decode — round-tripping through
    :func:`decode_image` must reproduce the exact closed-form pixels,
    which is what the driver oracle recomputes independently."""
    stride = width * 3
    n = stride * height
    body = (
        ((seed + 7 * np.arange(n, dtype=np.int64)) % 256)
        .reshape(height, stride)
    )
    # Filtering (the ENCODE direction) reads only original pixel values
    # — no serial dependency — so all five filter types are computed
    # for the whole image in one vectorized pass and selected per row.
    # The old per-row loop was ~8 numpy dispatches per scanline, pure
    # overhead at fixture size (rows of 12-36 bytes).
    left = np.zeros_like(body)
    left[:, 3:] = body[:, :-3]
    up = np.zeros_like(body)
    up[1:] = body[:-1]
    # per-filter-type prediction via strided row assignment (row y uses
    # filter y % 5); np.select would evaluate every branch over every
    # row and broadcast five full-image temporaries — measured as 45%
    # of pack time at fixture size
    pred = np.zeros_like(body)
    pred[1::5] = left[1::5]
    pred[2::5] = up[2::5]
    pred[3::5] = (left[3::5] + up[3::5]) // 2
    l4, u4 = left[4::5], up[4::5]
    ul4 = np.zeros_like(l4)
    ul4[:, 3:] = up[4::5][:, :-3]
    p = l4 + u4 - ul4
    pa, pb, pc = np.abs(p - l4), np.abs(p - u4), np.abs(p - ul4)
    pred[4::5] = np.where(
        (pa <= pb) & (pa <= pc), l4, np.where(pb <= pc, u4, ul4)
    )
    lines = np.empty((height, stride + 1), dtype=np.uint8)
    lines[:, 0] = np.arange(height) % 5
    lines[:, 1:] = (body - pred) % 256
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(lines.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _parse_ppm(raw: bytes) -> Optional[np.ndarray]:
    """Binary-PPM (P6) parse per the Netpbm spec: ASCII header of three
    integers separated by whitespace/comments, maxval 255, then one
    whitespace byte and the raw RGB raster.  Returns (h, w, 3) uint8
    or None on any malformation."""
    if raw[:2] != b"P6":
        return None
    pos, vals = 2, []
    while len(vals) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if pos < len(raw) and raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(raw) and raw[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        vals.append(int(raw[start:pos]))
    w, h, maxval = vals
    if maxval != 255 or w <= 0 or h <= 0:
        return None
    # exactly ONE whitespace byte must separate maxval from the raster
    # (Netpbm spec); anything else is a malformed header and decoding
    # from a guessed offset would return garbage with ok=true
    if not raw[pos : pos + 1].isspace():
        return None
    pos += 1
    need = w * h * 3
    if len(raw) - pos < need:
        return None
    return np.frombuffer(raw, dtype=np.uint8, count=need, offset=pos).reshape(
        h, w, 3
    )


def _parse_bmp(raw: bytes) -> Optional[np.ndarray]:
    """Uncompressed 24-bit BMP parse (BITMAPINFOHEADER, BI_RGB): rows
    padded to 4 bytes, bottom-up unless height is negative, BGR order.
    Returns (h, w, 3) uint8 RGB or None on any malformation."""
    if raw[:2] != b"BM" or len(raw) < 54:
        return None
    data_off = struct.unpack_from("<I", raw, 10)[0]
    w = struct.unpack_from("<i", raw, 18)[0]
    h = struct.unpack_from("<i", raw, 22)[0]
    bpp = struct.unpack_from("<H", raw, 28)[0]
    comp = struct.unpack_from("<I", raw, 30)[0]
    if bpp != 24 or comp != 0 or w <= 0 or h == 0:
        return None
    top_down, H = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    if len(raw) < data_off + stride * H:
        return None
    rows = np.frombuffer(
        raw, dtype=np.uint8, count=stride * H, offset=data_off
    ).reshape(H, stride)
    img = rows[:, : w * 3].reshape(H, w, 3)[:, :, ::-1]
    return img if top_down else img[::-1]


def _unfilter_row_py(rec, prior, f, bpp, stride):
    """Reverse one Average (f=3) or Paeth (f=4) scanline in place over
    Python lists — the serial left-pixel recurrence both _png_unfilter
    regimes share (ONE implementation so the two regimes can never
    disagree at the size threshold)."""
    if f == 3:
        for x in range(stride):
            a = rec[x - bpp] if x >= bpp else 0
            rec[x] = (rec[x] + ((a + prior[x]) >> 1)) & 255
    else:
        for x in range(stride):
            a = rec[x - bpp] if x >= bpp else 0
            b = prior[x]
            c = prior[x - bpp] if x >= bpp else 0
            p = a + b - c
            pa = p - a if p >= a else a - p
            pb = p - b if p >= b else b - p
            pc = p - c if p >= c else c - p
            pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            rec[x] = (rec[x] + pred) & 255


def _png_unfilter(
    stream: bytes, h: int, stride: int, bpp: int
) -> Optional[bytes]:
    """Reverse PNG scanline filtering (None/Sub/Up/Average/Paeth) on a
    raw inflated stream of ``h`` rows of ``1 + stride`` bytes.

    Two regimes, both far from the naive per-byte numpy scalar loop
    (the r6 bench's top line item at 1.81 s / sf0.1):

    - small images (< 64 KiB of pixels): pure-Python byte loops on
      lists.  At fixture scale (<= 12x11 px) every numpy call is pure
      overhead — list arithmetic decodes the whole image in the time
      one np.cumsum takes to dispatch.
    - large images: a row loop where None/Up rows are single uint8
      vector ops (uint8 addition wraps, which IS the mod-256 the spec
      asks for), Sub rows are one per-lane cumsum, and only
      Average/Paeth rows fall back to a Python list scan — O(stride)
      with ~0.1 us/byte instead of ~1 us/byte numpy scalar indexing.

    Returns the unfiltered pixel bytes (h * stride) or None on an
    unknown filter type.
    """
    if h * stride < 65536:
        out = bytearray(h * stride)
        prior = [0] * stride
        for y in range(h):
            base = y * (stride + 1)
            f = stream[base]
            rec = list(stream[base + 1 : base + 1 + stride])
            if f == 0:
                pass
            elif f == 1:
                for x in range(bpp, stride):
                    rec[x] = (rec[x] + rec[x - bpp]) & 255
            elif f == 2:
                rec = [(c + p) & 255 for c, p in zip(rec, prior)]
            elif f in (3, 4):
                _unfilter_row_py(rec, prior, f, bpp, stride)
            else:
                return None
            out[y * stride : (y + 1) * stride] = bytes(rec)
            prior = rec
        return bytes(out)

    arr = np.frombuffer(stream, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = arr[:, 0]
    rows = arr[:, 1:]
    out = np.empty((h, stride), dtype=np.uint8)
    prior_np = np.zeros(stride, dtype=np.uint8)
    prior_list = None  # lazily materialized for Average/Paeth rows
    w = stride // bpp
    for y in range(h):
        f = int(ftypes[y])
        if f == 0:
            rec_np = rows[y]
            rec_list = None
        elif f == 1:
            # per-lane running sum; uint8 wraparound == mod 256
            lanes = rows[y].reshape(w, bpp).astype(np.int32)
            rec_np = (
                np.cumsum(lanes, axis=0, dtype=np.int32) % 256
            ).astype(np.uint8).reshape(stride)
            rec_list = None
        elif f == 2:
            rec_np = rows[y] + prior_np  # uint8 add wraps mod 256
            rec_list = None
        elif f in (3, 4):
            if prior_list is None:
                prior_list = prior_np.tolist()
            rec_list = rows[y].tolist()
            _unfilter_row_py(rec_list, prior_list, f, bpp, stride)
            rec_np = np.array(rec_list, dtype=np.uint8)
        else:
            return None
        out[y] = rec_np
        prior_np = out[y]
        prior_list = rec_list
    return out.tobytes()


def _parse_png(raw: bytes) -> Optional[np.ndarray]:
    """PNG parse without native libraries: chunk walk with CRC
    verification, stdlib ``zlib`` inflate of the concatenated IDAT
    stream, and per-scanline numpy unfiltering (None/Sub/Up/Average/
    Paeth).  Supports 8-bit depth, color types 0 (grayscale —
    replicated to RGB), 2 (RGB) and 6 (RGBA — alpha dropped),
    non-interlaced.  Returns (h, w, 3) uint8 RGB or None on any
    malformation (bad CRC, short chunk, inflate error, wrong stream
    length, Adam7 interlace, unsupported depth/type).

    Unfiltering is delegated to ``_png_unfilter`` — pure-Python byte
    loops for small images (numpy dispatch overhead dominates there),
    vectorized uint8 row ops for large ones with a Python list scan
    only on Average/Paeth rows (left-pixel serial dependency).
    """
    if raw[:8] != _PNG_SIG:
        return None
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        ctype = raw[pos + 4 : pos + 8]
        data_end = pos + 8 + length
        if data_end + 4 > len(raw):
            return None
        data = raw[pos + 8 : data_end]
        (crc,) = struct.unpack_from(">I", raw, data_end)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            return None
        pos = data_end + 4
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or len(ihdr) < 13 or not idat:
        return None
    w, h = struct.unpack_from(">II", ihdr, 0)
    depth, color_type, comp, filt_method, interlace = ihdr[8:13]
    channels = {0: 1, 2: 3, 6: 4}.get(color_type)
    if (
        depth != 8
        or comp != 0
        or filt_method != 0
        or interlace != 0
        or channels is None
        or w <= 0
        or h <= 0
        or w * h > _MAX_DECODE_PIXELS
    ):
        return None
    stride = w * channels
    expected = h * (stride + 1)
    try:
        # bounded inflate: cap at the exact expected stream size so a
        # crafted deflate bomb cannot expand past the declared dims
        d = zlib.decompressobj()
        stream = d.decompress(b"".join(idat), expected)
        if len(stream) != expected or d.unconsumed_tail or d.flush(8):
            return None  # short stream, or more data than the dims allow
    except zlib.error:
        return None
    unfiltered = _png_unfilter(stream, h, stride, channels)
    if unfiltered is None:
        return None
    img = np.frombuffer(unfiltered, dtype=np.uint8).reshape(h, w, channels)
    if channels == 1:
        return np.repeat(img, 3, axis=2)
    if channels == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img


# --------------------------------------------------------------------------
# baseline JPEG (pure Python + numpy): spec-conformant encoder for
# DC-only payloads and a general baseline decoder (ITU-T T.81, JFIF).
# The PACKER emits images that are grids of CONSTANT 8x8 blocks with a
# flat quantization table of 1s: a constant block's DCT is DC-only and
# an integer DC coefficient survives quantize -> entropy-code ->
# dequantize -> IDCT EXACTLY, so the lossy format round-trips these
# payloads losslessly and an independent engine can recompute the
# decoded pixels in closed form (which the driver oracle does).  The
# DECODER is general baseline: any DQT, DC+AC Huffman, restart
# markers, grayscale or 4:4:4 YCbCr; progressive/subsampled -> None.
# --------------------------------------------------------------------------

# standard Annex K luminance Huffman tables (ITU-T T.81 K.3.1)
_JPG_DC_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_JPG_DC_VALS = list(range(12))
_JPG_AC_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_JPG_AC_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_JPG_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal 8-point DCT-II basis: IDCT(coefs) = C.T @ coefs @ C
_JPG_DCT_C = np.array([
    [
        (np.sqrt(1.0 / 8.0) if k == 0 else np.sqrt(2.0 / 8.0))
        * np.cos((2 * n + 1) * k * np.pi / 16.0)
        for n in range(8)
    ]
    for k in range(8)
])


# ---------------------------------------------------------------------------
# GIF — the third of the web's big-three image formats.  Pure-Python
# LZW (GIF's only compression) + container walk; like the PNG/JPEG
# codecs above, headers are treated as attacker-controlled: pixel
# counts capped at _MAX_DECODE_PIXELS, LZW output capped at the
# declared raster size, sub-block walks bounds-checked, and anything
# malformed degrades to ``ok=false`` instead of a task failure.


def _lzw_encode(data: bytes, min_code_size: int = 8) -> bytes:
    """GIF-flavor LZW: variable code width (min+1 .. 12 bits),
    LSB-first packing, CLEAR emitted up front and again whenever the
    table fills at 4096 entries.  Widens the code size right after
    the just-added entry's value reaches ``1 << code_size`` so the
    next emitted code — which may reference it — still fits (GIF's
    non-early-change convention; the decoder below and tests against
    a known foreign GIF pin the other side)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, size: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += size
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    code_size = min_code_size + 1
    emit(clear, code_size)
    w = b""
    for byte in data:
        c = bytes([byte])
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], code_size)
        table[wc] = next_code
        if next_code == (1 << code_size) and code_size < 12:
            code_size += 1
        next_code += 1
        if next_code == 4096:  # full: reset before any 13-bit need
            emit(clear, code_size)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            code_size = min_code_size + 1
        w = c
    if w:
        emit(table[w], code_size)
    emit(eoi, code_size)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(
    data: bytes, min_code_size: int, max_out: int
) -> Optional[bytes]:
    """Inverse of :func:`_lzw_encode` (standard GIF LZW decoder).
    ``max_out`` hard-caps the emitted byte count — the compressed
    stream is attacker-controlled and a few bytes can legally expand
    to ~4096x, so decoding stops as soon as the declared raster is
    full.  Returns ``None`` on any malformed stream."""
    if not 2 <= min_code_size <= 11:
        return None
    clear = 1 << min_code_size
    eoi = clear + 1
    table = [bytes([i]) for i in range(clear)] + [b"", b""]
    code_size = min_code_size + 1
    out = bytearray()
    prev: Optional[bytes] = None
    acc = 0
    nbits = 0
    pos = 0
    n = len(data)
    while True:
        while nbits < code_size:
            if pos >= n:
                return None  # ran out before EOI
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << code_size) - 1)
        acc >>= code_size
        nbits -= code_size
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            return bytes(out)
        if prev is None:
            if code >= len(table):
                return None
            entry = table[code]
        else:
            if code < len(table):
                entry = table[code]
            elif code == len(table):
                entry = prev + prev[:1]
            else:
                return None
            if len(table) < 4096:
                table.append(prev + entry[:1])
                if len(table) == (1 << code_size) and code_size < 12:
                    code_size += 1
        out.extend(entry)
        if len(out) >= max_out:
            return bytes(out[:max_out])
        prev = entry


def pack_gif_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic GIF89a payload: 256-entry global palette with the
    closed form ``palette[j] = (j, (2j) % 256, (3j) % 256)`` and pixel
    index ``i`` equal to ``(seed + 7i) % 256`` — so after the LOSSLESS
    LZW round trip the decoded RGB channel sums are closed-form
    recomputable by an independent engine (what the driver oracle
    does), exactly like the PPM/BMP/PNG packers above."""
    n = width * height
    idx = ((seed + 7 * np.arange(n, dtype=np.int64)) % 256).astype(np.uint8)
    j = np.arange(256, dtype=np.int64)
    palette = np.stack([j, (2 * j) % 256, (3 * j) % 256], axis=1).astype(
        np.uint8
    )
    lzw = _lzw_encode(idx.tobytes(), 8)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)  # block terminator
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)  # GCT, 256
        + palette.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, width, height, 0)
        + bytes([8])  # LZW minimum code size
        + bytes(blocks)
        + b"\x3b"
    )


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _gif_frames(raw: bytes):
    """Generator over a GIF's image blocks: yields ``(index, h x w x 3
    uint8)`` per frame.  Frames are decoded STANDALONE against their
    own (or the global) palette — no canvas compositing or disposal-
    method replay, so partial-rectangle animation frames come back as
    their stored sub-image (documented; full compositing belongs to a
    native decoder plugged into the same stage).  Malformed content
    stops the walk (yields what was decodable)."""
    if len(raw) < 13 or raw[:6] not in (b"GIF87a", b"GIF89a"):
        return
    try:
        packed = raw[10]
        pos = 13
        g_palette = None
        if packed & 0x80:
            size = 3 * (2 << (packed & 0x07))
            if pos + size > len(raw):
                return
            g_palette = np.frombuffer(raw, np.uint8, size, pos).reshape(-1, 3)
            pos += size
        idx_out = 0
        while pos < len(raw):
            block = raw[pos]
            if block == 0x21:  # extension: label + sub-blocks
                pos += 2
                while pos < len(raw) and raw[pos] != 0:
                    pos += 1 + raw[pos]
                pos += 1
            elif block == 0x2C:  # image descriptor
                if pos + 10 > len(raw):
                    return
                _, _, iw, ih, ipacked = struct.unpack_from(
                    "<HHHHB", raw, pos + 1
                )
                pos += 10
                if iw == 0 or ih == 0 or iw * ih > _MAX_DECODE_PIXELS:
                    return
                palette = g_palette
                if ipacked & 0x80:  # local color table wins
                    size = 3 * (2 << (ipacked & 0x07))
                    if pos + size > len(raw):
                        return
                    palette = np.frombuffer(
                        raw, np.uint8, size, pos
                    ).reshape(-1, 3)
                    pos += size
                if palette is None or pos >= len(raw):
                    return
                min_code = raw[pos]
                pos += 1
                data = bytearray()
                while pos < len(raw) and raw[pos] != 0:
                    ln = raw[pos]
                    if pos + 1 + ln > len(raw):
                        return
                    data += raw[pos + 1 : pos + 1 + ln]
                    pos += 1 + ln
                pos += 1  # sub-block terminator
                idx_bytes = _lzw_decode(bytes(data), min_code, iw * ih)
                if idx_bytes is None or len(idx_bytes) < iw * ih:
                    return
                idx = np.frombuffer(idx_bytes, np.uint8, iw * ih)
                if int(idx.max()) >= len(palette):
                    return
                img = palette[idx].reshape(ih, iw, 3)
                if ipacked & 0x40:  # interlaced: rows arrive by pass
                    order = [
                        r
                        for start, step in _GIF_INTERLACE_PASSES
                        for r in range(start, ih, step)
                    ]
                    out = np.empty_like(img)
                    out[order] = img
                    img = out
                yield idx_out, img
                idx_out += 1
            elif block == 0x3B:  # trailer
                return
            else:
                return
    except (ValueError, struct.error, IndexError, MemoryError):
        return


def _parse_gif(raw: bytes) -> Optional[np.ndarray]:
    """First frame of a GIF87a/89a payload (see :func:`_gif_frames`
    for the walk/caps/interlace details), or ``None``."""
    for _, img in _gif_frames(raw):
        return img
    return None


def pack_gif_animation(
    n_frames: int, width: int, height: int, seed: int
) -> bytes:
    """Deterministic multi-frame GIF89a: ``n_frames`` full-canvas
    image blocks (each preceded by a graphic-control extension, as
    real encoders emit), same closed-form palette as
    :func:`pack_gif_image`; frame ``f`` pixel ``i`` has index
    ``(seed + 31*f + 7*i) % 256`` — so every sampled frame's channel
    sums are closed-form recomputable."""
    if n_frames < 1:
        raise ValueError("n_frames must be >= 1")
    n = width * height
    j = np.arange(256, dtype=np.int64)
    palette = np.stack([j, (2 * j) % 256, (3 * j) % 256], axis=1).astype(
        np.uint8
    )
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HHBBB", width, height, 0xF7, 0, 0)
    out += palette.tobytes()
    # netscape loop extension (app extension), as real animations carry
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in range(n_frames):
        out += b"\x21\xf9\x04\x00\x04\x00\x00\x00"  # GCE, 4cs delay
        idx = (
            (seed + 31 * f + 7 * np.arange(n, dtype=np.int64)) % 256
        ).astype(np.uint8)
        lzw = _lzw_encode(idx.tobytes(), 8)
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([8])
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def _frame_sample_stage(df, payload_col, every_k, frames_of):
    """Shared ``mapInPandas`` skeleton for container frame samplers:
    ``frames_of(raw) -> iterable of (frame_index, frame_bytes)``.
    Keeps every ``every_k``-th frame; unparseable payloads yield no
    rows.  One place owns the schema/dtype handling for every sampler
    (GIF, AVI, future codecs plugged into the same stage)."""
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                try:
                    it = frames_of(raw)
                except Exception:
                    continue  # degrade, never kill the task
                for i, frame in it:
                    if i % every_k:
                        continue
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(frame)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(ids, dtype="Int64"),
                    "frame_index": pd.array(idxs, dtype="Int32"),
                    "frame": frames,
                }
            )

    return df.mapInPandas(_sample, out_schema)


def sample_frames_gif(
    df: DataFrame, every_k: int = 2, payload_col: str = "payload"
) -> DataFrame:
    """Frame sampling over animated GIFs — the sibling of
    :func:`sample_frames_video` for the web's native animation
    format: walk the image blocks (:func:`_gif_frames`), keep every
    k-th frame, emit each as a standalone binary-PPM payload that
    :func:`decode_image` consumes directly.  One row per kept frame:
    ``(media_id, frame_index, frame)``; unparseable payloads produce
    no rows (same contract as the AVI sampler — both share
    :func:`_frame_sample_stage`).
    """

    def frames_of(raw):
        for i, img in _gif_frames(raw):
            h, w = img.shape[:2]
            yield i, b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()

    return _frame_sample_stage(df, payload_col, every_k, frames_of)


def _jpg_huff_codes(bits, vals):
    """Canonical Huffman codes: {symbol: (code, length)}."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[vals[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


def _jpg_huff_decode_table(bits, vals):
    """Canonical Huffman decode map: {(length, code): symbol}."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[(length, code)] = vals[i]
            code += 1
            i += 1
        code <<= 1
    return out


class _JpgBitWriter:
    def __init__(self):
        self.bytes_ = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value, length):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.bytes_.append(self.acc)
                if self.acc == 0xFF:  # byte stuffing
                    self.bytes_.append(0x00)
                self.acc, self.nbits = 0, 0

    def flush(self):
        while self.nbits:  # pad with 1s per spec
            self.write(1, 1)
        return bytes(self.bytes_)


def pack_jpeg_image(width: int, height: int, seed: int) -> bytes:
    """Deterministic baseline-JFIF grayscale payload whose lossy round
    trip is EXACT: the image is a grid of constant 8x8 blocks (pixel
    (x, y) has value ``(seed + 17 * ((y//8) * ceil(w/8) + x//8)) %
    256``), the quantization table is all 1s, and a constant block's
    DCT is a single integer DC coefficient — quantize, Huffman-code,
    dequantize and IDCT reproduce it bit-exactly, so the driver oracle
    recomputes the decoded pixel sums in closed form.  Standard Annex
    K Huffman tables; edge blocks are constant too, so non-multiple-
    of-8 dims round-trip exactly as well."""
    if width < 1 or height < 1:
        raise ValueError("width/height must be >= 1")
    bx = (width + 7) // 8
    by = (height + 7) // 8
    dc_codes = _jpg_huff_codes(_JPG_DC_BITS, _JPG_DC_VALS)
    ac_codes = _jpg_huff_codes(_JPG_AC_BITS, _JPG_AC_VALS)
    eob_code, eob_len = ac_codes[0x00]
    w = _JpgBitWriter()
    prev_dc = 0
    for b in range(bx * by):
        v = (seed + 17 * b) % 256
        dc = 8 * (v - 128)  # DC coefficient of a constant block
        diff = dc - prev_dc
        prev_dc = dc
        mag = abs(diff)
        cat = mag.bit_length()
        code, length = dc_codes[cat]
        w.write(code, length)
        if cat:
            bits = diff if diff >= 0 else diff + (1 << cat) - 1
            w.write(bits & ((1 << cat) - 1), cat)
        w.write(eob_code, eob_len)  # all AC coefficients are zero
    scan = w.flush()

    def seg(marker, payload):
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app0 = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    dqt = seg(0xDB, bytes([0x00]) + bytes([1] * 64))  # table 0, all 1s
    sof0 = seg(
        0xC0,
        struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0]),
    )
    dht = seg(
        0xC4,
        bytes([0x00]) + bytes(_JPG_DC_BITS[1:]) + bytes(_JPG_DC_VALS)
        + bytes([0x10]) + bytes(_JPG_AC_BITS[1:]) + bytes(_JPG_AC_VALS),
    )
    sos = seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    return (
        b"\xff\xd8" + app0 + dqt + sof0 + dht + sos + scan + b"\xff\xd9"
    )


class _JpgBitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; RST markers are consumed by the caller."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            else:
                raise EOFError("marker in scan")  # RST/EOI handled above
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self):
        self.nbits = 0
        self.acc = 0


def _jpg_extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _jpg_decode_symbol(reader, table) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _parse_jpeg(raw: bytes) -> Optional[np.ndarray]:
    """Baseline JPEG decode (ITU-T T.81): marker walk, DQT/DHT/SOF0/
    SOS/DRI parsing, canonical Huffman entropy decode with restart
    support, dequantize, orthonormal IDCT, level shift.  Supports
    8-bit baseline with arbitrary 1/2/4 sampling factors — 4:4:4,
    4:2:2 and the dominant camera/libjpeg 4:2:0 layout — with
    nearest-neighbor chroma upsampling (grayscale replicated to RGB;
    3-component scans converted JFIF YCbCr -> RGB).  Progressive
    (SOF2), arithmetic or 12-bit streams return None, as does any
    malformed structure.  Pinned against a FOREIGN libjpeg-encoded
    4:2:0 photo in tests (not merely round-tripping our own packer)."""
    try:
        if raw[:2] != b"\xff\xd8":
            return None
        pos = 2
        qt = {}
        huff_dc, huff_ac = {}, {}
        comps = None
        w = h = 0
        restart_interval = 0
        while pos + 4 <= len(raw):
            if raw[pos] != 0xFF:
                return None
            marker = raw[pos + 1]
            if marker == 0xD9:  # EOI without SOS
                return None
            (seg_len,) = struct.unpack_from(">H", raw, pos + 2)
            body = raw[pos + 4 : pos + 2 + seg_len]
            pos += 2 + seg_len
            if marker == 0xDB:  # DQT (possibly several tables)
                i = 0
                while i < len(body):
                    prec, tid = body[i] >> 4, body[i] & 0xF
                    i += 1
                    if prec == 0:
                        qt[tid] = np.frombuffer(
                            body, np.uint8, 64, i
                        ).astype(np.int64)
                        i += 64
                    else:
                        qt[tid] = np.frombuffer(
                            body[i : i + 128], ">u2"
                        ).astype(np.int64)
                        i += 128
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(body):
                    tc, th = body[i] >> 4, body[i] & 0xF
                    bits = [0] + list(body[i + 1 : i + 17])
                    n = sum(bits)
                    vals = list(body[i + 17 : i + 17 + n])
                    table = _jpg_huff_decode_table(bits, vals)
                    (huff_dc if tc == 0 else huff_ac)[th] = table
                    i += 17 + n
            elif marker == 0xC0 or marker == 0xC1:  # baseline SOF
                prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
                if (
                    prec != 8
                    or w < 1
                    or h < 1
                    or nc not in (1, 3)
                    or w * h > _MAX_DECODE_PIXELS
                ):
                    return None
                comps = []
                for c in range(nc):
                    cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                    hi, vi = samp >> 4, samp & 0xF
                    if hi not in (1, 2, 4) or vi not in (1, 2, 4):
                        return None
                    if nc == 1:
                        # single-component scans are NON-INTERLEAVED
                        # (T.81 A.2.2): one data unit per MCU in raster
                        # order, whatever factors the SOF declares —
                        # decoding them with interleaved 2x2 MCU tiling
                        # would silently block-scramble the image
                        hi = vi = 1
                    comps.append({"id": cid, "tq": tq, "h": hi, "v": vi})
            elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                            0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", body, 0)
            elif marker == 0xDA:  # SOS -> entropy-coded data follows
                if comps is None:
                    return None
                ns = body[0]
                if ns != len(comps):
                    return None
                for c in range(ns):
                    cs, tables = body[1 + 2 * c], body[2 + 2 * c]
                    for comp in comps:
                        if comp["id"] == cs:
                            comp["td"] = tables >> 4
                            comp["ta"] = tables & 0xF
                break
            # APPn/COM/others: skipped via seg_len
        else:
            return None

        # MCU geometry from the per-component sampling factors: an MCU
        # covers 8*hmax x 8*vmax image pixels and carries hi*vi data
        # units of each component (T.81 A.2.3).  1x1-everything (our
        # packer, 4:4:4 encoders) reduces to one block per component.
        hmax = max(c["h"] for c in comps)
        vmax = max(c["v"] for c in comps)
        if any(hmax % c["h"] or vmax % c["v"] for c in comps):
            return None  # non-integer chroma upsampling ratio
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        planes = [
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
            for c in comps
        ]
        reader = _JpgBitReader(raw, pos)
        preds = [0] * len(comps)
        mcu = 0
        for yb in range(mcuy):
            for xb in range(mcux):
                if restart_interval and mcu and mcu % restart_interval == 0:
                    # align and consume the RST marker
                    reader.align()
                    p = reader.pos
                    if raw[p] == 0xFF and 0xD0 <= raw[p + 1] <= 0xD7:
                        reader.pos = p + 2
                        preds = [0] * len(comps)
                    else:
                        return None
                mcu += 1
                for ci, comp in enumerate(comps):
                    dct = huff_dc.get(comp.get("td", 0))
                    act = huff_ac.get(comp.get("ta", 0))
                    q = qt.get(comp["tq"])
                    if dct is None or act is None or q is None:
                        return None
                    for vv in range(comp["v"]):
                        for hh in range(comp["h"]):
                            cat = _jpg_decode_symbol(reader, dct)
                            diff = _jpg_extend(reader.read_bits(cat), cat)
                            preds[ci] += diff
                            coefs = np.zeros(64, dtype=np.int64)
                            coefs[0] = preds[ci]
                            k = 1
                            while k < 64:
                                sym = _jpg_decode_symbol(reader, act)
                                if sym == 0x00:  # EOB
                                    break
                                if sym == 0xF0:  # ZRL
                                    k += 16
                                    continue
                                run, size = sym >> 4, sym & 0xF
                                k += run
                                if k > 63 or size == 0:
                                    return None
                                coefs[k] = _jpg_extend(
                                    reader.read_bits(size), size
                                )
                                k += 1
                            block = np.zeros(64, dtype=np.float64)
                            block[_JPG_ZIGZAG] = (coefs * q).astype(np.float64)
                            pix = (
                                _JPG_DCT_C.T @ block.reshape(8, 8) @ _JPG_DCT_C
                            )
                            py = (yb * comp["v"] + vv) * 8
                            px = (xb * comp["h"] + hh) * 8
                            planes[ci][py : py + 8, px : px + 8] = pix
        out = []
        for ci, comp in enumerate(comps):
            # crop to the component's own sample dims, then replicate
            # (nearest-neighbor chroma upsampling) back to image dims
            cw = (w * comp["h"] + hmax - 1) // hmax
            ch = (h * comp["v"] + vmax - 1) // vmax
            plane = np.clip(
                np.rint(planes[ci][:ch, :cw] + 128.0), 0, 255
            ).astype(np.uint8)
            fy, fx = vmax // comp["v"], hmax // comp["h"]
            if fy > 1 or fx > 1:
                plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
            out.append(plane[:h, :w])
        if len(out) == 1:
            return np.repeat(out[0][:, :, None], 3, axis=2)
        yy, cb, cr = (o.astype(np.float64) for o in out)
        r = yy + 1.402 * (cr - 128.0)
        g = yy - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        b = yy + 1.772 * (cb - 128.0)
        return np.stack(
            [np.clip(np.rint(c), 0, 255).astype(np.uint8) for c in (r, g, b)],
            axis=2,
        )
    except (IndexError, ValueError, EOFError, MemoryError, struct.error):
        if _os.environ.get("PDX_JPG_DEBUG"):  # pragma: no cover
            raise
        return None


def _decode_any(raw: bytes) -> Tuple[Optional[np.ndarray], Optional[str]]:
    if raw[:2] == b"P6":
        return _parse_ppm(raw), "ppm"
    if raw[:2] == b"BM":
        return _parse_bmp(raw), "bmp"
    if raw[:8] == _PNG_SIG:
        return _parse_png(raw), "png"
    if raw[:2] == b"\xff\xd8":
        return _parse_jpeg(raw), "jpeg"
    if raw[:6] in (b"GIF87a", b"GIF89a"):
        return _parse_gif(raw), "gif"
    return None, None


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL image decode for binary PPM (P6), uncompressed 24-bit BMP,
    and PNG payloads (8-bit, non-interlaced; zlib inflate + scanline
    unfilter) — pure Python + numpy inside a ``mapInPandas`` stage
    (Arrow-batched; payloads for one batch only are ever resident).
    Appends::

        decoded_width, decoded_height : int   (NULL when not decodable)
        decoded_format                : 'ppm'|'bmp'|'png'|'jpeg'|'gif'|NULL
        sum_r, sum_g, sum_b           : long  per-channel pixel sums
        ok                            : boolean

    Per-channel statistics are exact integer SUMS rather than float
    means so results are bit-identical across engines, partitionings
    and row orders (mean = sum / (width*height) when needed).
    Unrecognized or corrupt payloads produce ``ok = false`` rows —
    never a task failure, so one bad object cannot kill a 100 TB scan.
    For JPEG plug PIL/libvips into this same stage in production.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("decoded_width", T.IntegerType(), True),
            T.StructField("decoded_height", T.IntegerType(), True),
            T.StructField("decoded_format", T.StringType(), True),
            T.StructField("sum_r", T.LongType(), True),
            T.StructField("sum_g", T.LongType(), True),
            T.StructField("sum_b", T.LongType(), True),
            T.StructField("ok", T.BooleanType(), False),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ws, hs, fmts, srs, sgs, sbs, oks = [], [], [], [], [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                img, fmt = _decode_any(raw)
                if img is None:
                    ws.append(None), hs.append(None), fmts.append(None)
                    srs.append(None), sgs.append(None), sbs.append(None)
                    oks.append(False)
                    continue
                h, w = img.shape[:2]
                s = img.reshape(-1, 3).sum(axis=0, dtype=np.int64)
                ws.append(w), hs.append(h), fmts.append(fmt)
                srs.append(int(s[0])), sgs.append(int(s[1])), sbs.append(int(s[2]))
                oks.append(True)
            yield pdf.assign(
                decoded_width=pd.array(ws, dtype="Int32"),
                decoded_height=pd.array(hs, dtype="Int32"),
                decoded_format=fmts,
                sum_r=pd.array(srs, dtype="Int64"),
                sum_g=pd.array(sgs, dtype="Int64"),
                sum_b=pd.array(sbs, dtype="Int64"),
                ok=oks,
            )

    return df.mapInPandas(_decode, out_schema)


def _grid_sums(gray: np.ndarray, rows: int, cols: int):
    """Exact integer block sums + pixel counts over a rows x cols grid.

    Boundaries are ``floor(i * dim / n)`` and sums come off an integral
    image — all int64, so downstream comparisons are bit-identical
    across platforms (no float resampling anywhere)."""
    h, w = gray.shape
    rb = (np.arange(rows + 1, dtype=np.int64) * h) // rows
    cb = (np.arange(cols + 1, dtype=np.int64) * w) // cols
    ii = np.zeros((h + 1, w + 1), dtype=np.int64)
    ii[1:, 1:] = gray.cumsum(0).cumsum(1)
    s = (
        ii[rb[1:][:, None], cb[1:][None, :]]
        - ii[rb[:-1][:, None], cb[1:][None, :]]
        - ii[rb[1:][:, None], cb[:-1][None, :]]
        + ii[rb[:-1][:, None], cb[:-1][None, :]]
    )
    npix = (rb[1:] - rb[:-1])[:, None] * (cb[1:] - cb[:-1])[None, :]
    return s, npix


def _pack_bits(bits: np.ndarray) -> int:
    """Row-major bool grid -> signed 64-bit int (two's complement)."""
    v = 0
    for i in np.flatnonzero(bits.ravel()):
        v |= 1 << int(i)
    return v - (1 << 64) if v >= (1 << 63) else v


def _perceptual_hashes(img: np.ndarray):
    """(ahash, dhash) for an RGB uint8 array — integer-exact.

    aHash: 8x8 block means thresholded against the global mean.
    dHash: 8 rows x 9 cols block means, bit = mean[r,c] > mean[r,c+1].
    All comparisons are cross-multiplied integer sums (never divided),
    so the hashes are identical for identical PIXELS regardless of the
    container format, platform, or partitioning — which is exactly
    what makes them usable as dedup keys."""
    gray = img.astype(np.int64).sum(axis=2)  # r+g+b: monotone in luma
    s8, n8 = _grid_sums(gray, 8, 8)
    tot_s, tot_n = int(gray.sum()), gray.size
    abits = s8 * tot_n > tot_s * n8
    s9, n9 = _grid_sums(gray, 8, 9)
    dbits = s9[:, :8] * n9[:, 1:] > s9[:, 1:] * n9[:, :8]
    return _pack_bits(abits), _pack_bits(dbits)


def image_hashes(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Append 64-bit perceptual hashes to an image table: ``ahash``,
    ``dhash`` (long, NULL when the payload doesn't decode) and ``ok``.

    Runs inside the same ``mapInPandas`` Arrow stage as
    :func:`decode_image` (PPM/BMP/PNG/GIF/baseline-JPEG via
    ``_decode_any``), so only one batch of payloads is ever resident
    per task.  The hashes are integer-exact functions of the PIXELS —
    the same picture stored as PNG and as BMP gets the same hash, the
    property byte-level hashing fundamentally cannot give.  Corrupt
    payloads degrade to ``ok = false``, never a task failure.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("ahash", T.LongType(), True),
            T.StructField("dhash", T.LongType(), True),
            T.StructField("ok", T.BooleanType(), False),
        ]
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ah, dh, oks = [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                img, _fmt = _decode_any(raw)
                if img is None or img.size == 0:
                    ah.append(None), dh.append(None), oks.append(False)
                    continue
                a, d = _perceptual_hashes(img)
                ah.append(a), dh.append(d), oks.append(True)
            yield pdf.assign(
                ahash=pd.array(ah, dtype="Int64"),
                dhash=pd.array(dh, dtype="Int64"),
                ok=oks,
            )

    return df.mapInPandas(_hash, out_schema)


def image_near_dup(
    df: DataFrame,
    id_col: str = "media_id",
    payload_col: str = "payload",
    max_hamming: int = 2,
    hash_col: str = "dhash",
) -> DataFrame:
    """Near-duplicate IMAGE pairs: perceptual hash + pigeonhole-banded
    Hamming join (``dedup.hamming_candidates`` — the same sub-quadratic
    candidate machinery as SimHash text dedup, fed 64-bit image codes).

    Returns ``(id_a, id_b, hamming)`` with ``id_a < id_b``.  Catches
    what exact dedup cannot: the same picture re-encoded in a
    different container (PNG vs BMP vs JPEG of identical pixels) or
    perturbed by a few pixels.  Undecodable payloads are skipped.

    The decode+hash stage is checkpointed before the banding self-join
    so every payload is decoded exactly ONCE — decode is the expensive
    part at 100 TB, the joins move only (id, 64-bit) rows.
    """
    hashes = (
        image_hashes(df.select(id_col, payload_col), payload_col)
        .filter(F.col("ok"))
        .select(id_col, hash_col)
        .localCheckpoint(eager=True)
    )
    from pandance_spark.operators.dedup import hamming_candidates

    return hamming_candidates(hashes, id_col, hash_col, max_hamming)


def fake_decode_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Deterministic stand-in decoder: parses the fake header written by
    :func:`pack_fake_image` via ``mapInPandas`` (real batch plumbing,
    fake codec).  Adds ``decoded_width``/``decoded_height``/``ok``."""
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("decoded_width", T.IntegerType(), True),
            T.StructField("decoded_height", T.IntegerType(), True),
            T.StructField("ok", T.BooleanType(), False),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            widths, heights, oks = [], [], []
            for payload in pdf[payload_col]:
                if payload is not None and bytes(payload[:4]) == _MAGIC:
                    w, h = struct.unpack("<II", bytes(payload[4:12]))
                    widths.append(w)
                    heights.append(h)
                    oks.append(True)
                else:
                    widths.append(None)
                    heights.append(None)
                    oks.append(False)
            yield pdf.assign(
                decoded_width=pd.array(widths, dtype="Int32"),
                decoded_height=pd.array(heights, dtype="Int32"),
                ok=oks,
            )

    return df.mapInPandas(_decode, out_schema)


def resize_image(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """REAL nearest-neighbor resample over PPM/BMP payloads: decode
    (see :func:`decode_image`), numpy index-select with the standard
    ``src = floor(dst * src_dim / dst_dim)`` mapping, re-encode as
    binary PPM (output normalizes to P6 regardless of input format).
    Payloads that don't decode pass through unchanged.  Arrow-batched
    ``mapInPandas``; swap the resampler for PIL/libvips in production
    for filtered (bilinear/Lanczos) kernels.
    """
    if width < 1 or height < 1:
        raise ValueError("target width/height must be >= 1")
    out_schema = df.schema

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ys_cache: dict = {}
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                img, _ = _decode_any(raw)
                if img is None:
                    out.append(payload)
                    continue
                h, w = img.shape[:2]
                key = (h, w)
                if key not in ys_cache:
                    ys_cache[key] = (
                        (np.arange(height, dtype=np.int64) * h) // height,
                        (np.arange(width, dtype=np.int64) * w) // width,
                    )
                ys, xs = ys_cache[key]
                res = np.ascontiguousarray(img[ys][:, xs])
                out.append(b"P6\n%d %d\n255\n" % (width, height) + res.tobytes())
            pdf = pdf.copy()
            pdf[payload_col] = out
            yield pdf

    return df.mapInPandas(_resize, out_schema)


def fake_resize(
    df: DataFrame, width: int, height: int, payload_col: str = "payload"
) -> DataFrame:
    """Deterministic stand-in resize: rewrites the fake header to the
    target dims and truncates/tiles the body to width*height bytes
    (capped like :func:`pack_fake_image`).  Real ``mapInPandas``
    batching; fake resampling math."""
    out_schema = df.schema

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        body_len = min(width * height, 4096)
        for pdf in batches:
            out = []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                if raw[:4] != _MAGIC:
                    out.append(payload)
                    continue
                body = raw[12:]
                body = (body * (body_len // max(len(body), 1) + 1))[:body_len]
                out.append(_MAGIC + struct.pack("<II", width, height) + body)
            pdf = pdf.copy()
            pdf[payload_col] = out
            yield pdf

    return df.mapInPandas(_resize, out_schema)


def pack_fake_video(n_frames: int, width: int, height: int, seed: int) -> bytes:
    """Deterministic fake video: frame-count header + concatenated
    fixed-size fake frames."""
    frames = b"".join(
        pack_fake_image(width, height, seed * 131 + i) for i in range(n_frames)
    )
    return b"FVID" + struct.pack("<I", n_frames) + frames


def sample_frames(
    df: DataFrame, every_k: int = 2, payload_col: str = "payload"
) -> DataFrame:
    """Frame sampling over fake-video payloads: explode every k-th frame
    to its own row (``media_id``, ``frame_index``, ``frame`` binary).

    The plumbing is the real thing — per-batch binary slicing in
    ``mapInPandas``, one output row per kept frame; swap the slicing
    for a container demuxer (pyav/ffmpeg) in production.
    """
    if every_k < 1:
        raise ValueError("every_k must be >= 1")
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_index", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for media_id, payload in zip(pdf["media_id"], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                if raw[:4] != b"FVID":
                    continue
                n_frames = struct.unpack("<I", raw[4:8])[0]
                body = raw[8:]
                if n_frames == 0 or len(body) % max(n_frames, 1) != 0:
                    continue
                frame_size = len(body) // n_frames
                for i in range(0, n_frames, every_k):
                    ids.append(media_id)
                    idxs.append(i)
                    frames.append(body[i * frame_size : (i + 1) * frame_size])
            yield pd.DataFrame(
                {"media_id": pd.array(ids, dtype="Int64"),
                 "frame_index": pd.array(idxs, dtype="Int32"),
                 "frame": frames}
            )

    return df.mapInPandas(_sample, out_schema)


def byte_histogram_features(
    df: DataFrame, payload_col: str = "payload", bins: int = 16
) -> DataFrame:
    """REAL feature extraction: normalized ``bins``-bin byte histogram of
    the payload as ``array<double>`` (cheap content fingerprint usable
    with operators/similarity.py).  Arrow-batched pandas UDF."""
    if 256 % bins != 0:
        raise ValueError("bins must divide 256")

    shift = 8 - int(bins).bit_length() + 1  # byte >> shift -> bin index

    @F.pandas_udf(T.ArrayType(T.DoubleType()))
    def _hist(payloads: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for payload in payloads:
            if payload is None or len(payload) == 0:
                out.append([0.0] * bins)
                continue
            arr = np.frombuffer(bytes(payload), dtype=np.uint8)
            hist = np.bincount(arr >> shift, minlength=bins)[:bins]
            out.append((hist / hist.sum()).tolist())
        return pd.Series(out)

    return df.withColumn("features", _hist(F.col(payload_col)))


# ---------------------------------------------------------------------------
# Native-format METADATA extraction: MP3 (MPEG-1 Layer III) frame-header
# walk and MP4 (ISO BMFF) box walk.  A corpus pipeline rarely needs the
# decoded samples/frames to filter and route media — it needs duration,
# bitrate, dims, codec class — and the container/frame headers give all
# of that in pure Python with bounded walks.  The entropy decode itself
# (Huffman+IMDCT for MP3, H.264 NAL for MP4 video) stays the documented
# native-lib plug-in point.

# MPEG-1 Layer III bitrate (kbps) and sample-rate tables, header index
# -> value; index 0 ("free") and 15 ("bad") are rejected
_MP3_BITRATES = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                 224, 256, 320, 0]
_MP3_RATES = [44100, 48000, 32000, 0]
_MP3_MAX_FRAMES = 1_000_000  # walk cap: headers are attacker-controlled


def pack_mp3_audio(n_frames: int, bitrate_idx: int = 9, seed: int = 0) -> bytes:
    """Deterministic MPEG-1 Layer III stream: ``n_frames`` valid frame
    headers (44.1 kHz, bitrate from ``bitrate_idx``) whose payloads are
    the closed-form byte pattern ``(seed + 7i) % 256`` — parseable by
    any MP3 tool's header walk; the audio content is noise by design
    (the metadata probe never decodes it).  Prepends a minimal ID3v2
    tag so the skip path is exercised."""
    if not 1 <= bitrate_idx <= 14:
        raise ValueError("bitrate_idx must be in [1, 14]")
    br = _MP3_BITRATES[bitrate_idx] * 1000
    sr = 44100
    flen = (144 * br) // sr  # padding bit 0
    out = bytearray()
    # ID3v2.3 header, empty 16-byte tag body (synchsafe size)
    out += b"ID3" + bytes([3, 0, 0, 0, 0, 0, 16]) + b"\x00" * 16
    hdr = bytes([0xFF, 0xFB, (bitrate_idx << 4) | 0x00, 0x00])
    body = ((seed + 7 * np.arange(flen - 4, dtype=np.int64)) % 256).astype(
        np.uint8
    ).tobytes()
    for _ in range(n_frames):
        out += hdr + body
    return bytes(out)


def _parse_mp3_meta(raw: bytes):
    """(n_frames, duration_ms, mean_bitrate_kbps, sample_rate) or
    ``None`` — a frame-header walk (ID3v2 skipped, free/bad bitrate
    rejected, walk capped).  MPEG-1 Layer III only; anything else
    degrades to ``None``."""
    try:
        pos = 0
        n = len(raw)
        if raw[:3] == b"ID3" and n >= 10:
            size = 0
            for b in raw[6:10]:
                if b & 0x80:
                    return None  # not synchsafe
                size = (size << 7) | b
            pos = 10 + size
        frames = 0
        br_sum = 0
        sr_seen = None
        while pos + 4 <= n and frames < _MP3_MAX_FRAMES:
            h0, h1, h2 = raw[pos], raw[pos + 1], raw[pos + 2]
            if h0 != 0xFF or (h1 & 0xFE) != 0xFA:  # MPEG-1 Layer III
                break
            br_idx = (h2 >> 4) & 0x0F
            sr_idx = (h2 >> 2) & 0x03
            pad = (h2 >> 1) & 0x01
            br = _MP3_BITRATES[br_idx] * 1000
            sr = _MP3_RATES[sr_idx]
            if br == 0 or sr == 0:
                return None
            if sr_seen is None:
                sr_seen = sr
            elif sr != sr_seen:
                return None
            flen = (144 * br) // sr + pad
            if flen < 4 or pos + flen > n:
                break
            frames += 1
            br_sum += br
            pos += flen
        if frames == 0:
            return None
        duration_ms = frames * 1152 * 1000 // sr_seen
        return frames, duration_ms, br_sum // frames // 1000, sr_seen
    except (IndexError, ValueError):
        return None


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def pack_mp4_video(
    width: int, height: int, duration_ms: int, n_bytes: int = 64, seed: int = 0
) -> bytes:
    """Deterministic minimal ISO BMFF (MP4): ftyp + moov(mvhd with a
    1000 Hz timescale + trak(tkhd with 16.16 fixed-point dims)) + an
    ``mdat`` whose bytes follow the closed form ``(seed + 7i) % 256``.
    Spec-shaped enough for any box walker; carries no codec stream —
    the metadata probe is the point."""
    mvhd = (
        bytes(4) + bytes(8)                    # version/flags, c/m time
        + struct.pack(">II", 1000, duration_ms)  # timescale, duration
        + bytes(80)
    )
    tkhd = (
        bytes(4) + bytes(8) + struct.pack(">I", 1) + bytes(4)
        + struct.pack(">I", duration_ms) + bytes(52)
        + struct.pack(">II", width << 16, height << 16)
    )
    trak = _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd))
    moov = _mp4_box(b"moov", _mp4_box(b"mvhd", mvhd) + trak)
    mdat = _mp4_box(
        b"mdat",
        ((seed + 7 * np.arange(n_bytes, dtype=np.int64)) % 256)
        .astype(np.uint8)
        .tobytes(),
    )
    return _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + moov + mdat


_MP4_MAX_BOXES = 10_000


def _parse_mp4_meta(raw: bytes):
    """(duration_ms, width, height, n_mdat_bytes) or ``None`` — an ISO
    BMFF box walk (bounded count/depth, size-validated): mvhd gives
    timescale+duration, first tkhd the 16.16 track dims, mdat the
    payload size.  No codec decode — H.264/AAC stay the documented
    plug-in point."""
    try:
        dur = tsc = w = h = None
        mdat = 0
        boxes = 0
        stack = [(0, len(raw))]
        while stack:
            pos, end = stack.pop()
            while pos + 8 <= end:
                boxes += 1
                if boxes > _MP4_MAX_BOXES:
                    return None
                size = struct.unpack_from(">I", raw, pos)[0]
                btype = raw[pos + 4 : pos + 8]
                if size < 8 or pos + size > end:
                    return None
                body = pos + 8
                if btype in (b"moov", b"trak"):
                    stack.append((body, pos + size))
                elif btype == b"mvhd" and size >= 8 + 20:
                    if raw[body] == 0:  # version 0 only
                        tsc, dur = struct.unpack_from(">II", raw, body + 12)
                elif btype == b"tkhd" and size >= 8 + 84 and w is None:
                    if raw[body] == 0:
                        w_fx, h_fx = struct.unpack_from(
                            ">II", raw, body + 76
                        )
                        w, h = w_fx >> 16, h_fx >> 16
                elif btype == b"mdat":
                    mdat += size - 8
                pos += size
        if dur is None or tsc in (None, 0):
            return None
        return dur * 1000 // tsc, w, h, mdat
    except (struct.error, IndexError):
        return None


def pack_webp_meta(width: int, height: int, lossless: bool = False) -> bytes:
    """Spec-conformant WebP CONTAINER carrying the image dimensions:
    RIFF/WEBP with either a VP8X extended-header chunk (canvas size as
    24-bit little-endian minus-one fields) or a VP8L chunk whose
    5-byte bitstream header encodes (width-1, height-1) in 14-bit
    fields.  The pixel payload is a placeholder (this repo ships no
    VP8 entropy codec — decode is a documented plug-in point); the
    container structure and dimension encodings are real, which is
    all :func:`image_metadata`'s header walk reads."""
    if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
        raise ValueError("webp dims must be in [1, 16384]")
    if lossless:
        # VP8L: sig 0x2F then 14b (w-1) | 14b (h-1) | 1b alpha | 3b ver
        bits = (width - 1) | ((height - 1) << 14)
        body = bytes([0x2F]) + bits.to_bytes(4, "little")
        chunk = b"VP8L" + struct.pack("<I", len(body)) + body
        if len(body) % 2:
            chunk += b"\x00"
    else:
        body = (
            # flags byte layout (MSB first): Rsv(2)|ICC|Alpha|EXIF|XMP|
            # Anim|Rsv — 0x00 = featureless canvas (no ALPH/ANIM/ICCP
            # chunks follow, so no feature bit may be set)
            bytes([0x00, 0, 0, 0])
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        chunk = b"VP8X" + struct.pack("<I", len(body)) + body
    riff_body = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def _image_header_meta(raw: bytes):
    """(format, width, height) from FILE HEADERS ONLY — no inflate, no
    entropy decode, no CRC walk; reads at most a few hundred bytes.
    Returns None on any unrecognized or malformed header."""
    try:
        if raw[:8] == _PNG_SIG:
            # first chunk must be IHDR per spec
            if raw[12:16] != b"IHDR" or len(raw) < 24:
                return None
            w, h = struct.unpack_from(">II", raw, 16)
            return ("png", w, h)
        if raw[:2] == b"\xff\xd8":
            pos = 2
            while pos + 4 <= len(raw):
                if raw[pos] != 0xFF:
                    return None
                # T.81 B.1.1.2: any number of 0xFF fill bytes may pad
                # before a marker id — skip them or the walk misreads
                # the fill byte as a marker and a bogus length after it
                while pos + 4 <= len(raw) and raw[pos + 1] == 0xFF:
                    pos += 1
                if pos + 4 > len(raw):
                    return None
                m = raw[pos + 1]
                if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
                    pos += 2
                    continue
                if m == 0xD9 or m == 0xDA:  # EOI / scan before SOF
                    return None
                (ln,) = struct.unpack_from(">H", raw, pos + 2)
                if m in (0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                         0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                    h, w = struct.unpack_from(">HH", raw, pos + 5)
                    return ("jpeg", w, h)
                pos += 2 + ln
            return None
        if raw[:6] in (b"GIF87a", b"GIF89a"):
            if len(raw) < 10:
                return None
            w, h = struct.unpack_from("<HH", raw, 6)
            return ("gif", w, h)
        if raw[:2] == b"BM":
            if len(raw) < 26:
                return None
            w, h = struct.unpack_from("<ii", raw, 18)
            # negative h = top-down DIB (legal); negative/zero width or
            # zero height is malformed — degrade to ok=false, never
            # emit a negative dimension
            if w <= 0 or h == 0:
                return None
            return ("bmp", w, abs(h))
        if raw[:2] == b"P6":
            meta = _parse_ppm_header(raw)
            if meta is None:
                return None
            return ("ppm", meta[0], meta[1])
        if raw[:4] == b"RIFF" and raw[8:12] == b"WEBP":
            pos = 12
            while pos + 8 <= len(raw):
                tag = raw[pos : pos + 4]
                (ln,) = struct.unpack_from("<I", raw, pos + 4)
                body = raw[pos + 8 : pos + 8 + ln]
                if tag == b"VP8X" and len(body) >= 10:
                    w = int.from_bytes(body[4:7], "little") + 1
                    h = int.from_bytes(body[7:10], "little") + 1
                    return ("webp", w, h)
                if tag == b"VP8L" and len(body) >= 5 and body[0] == 0x2F:
                    bits = int.from_bytes(body[1:5], "little")
                    return ("webp", (bits & 0x3FFF) + 1,
                            ((bits >> 14) & 0x3FFF) + 1)
                if tag == b"VP8 " and len(body) >= 10:
                    # key frame: 3-byte frame tag, sync 9D 01 2A, dims
                    if body[3:6] != b"\x9d\x01\x2a":
                        return None
                    w = int.from_bytes(body[6:8], "little") & 0x3FFF
                    h = int.from_bytes(body[8:10], "little") & 0x3FFF
                    return ("webp", w, h)
                pos += 8 + ln + (ln & 1)
            return None
    except (struct.error, IndexError):
        return None
    return None


def _parse_ppm_header(raw: bytes):
    """(w, h) from a P6 header without touching the raster."""
    pos, vals = 2, []
    while len(vals) < 3 and pos < min(len(raw), 512):
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if pos < len(raw) and raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] not in (10, 13):
                pos += 1
            continue
        start = pos
        while pos < len(raw) and raw[pos : pos + 1].isdigit():
            pos += 1
        if pos == start:
            return None
        vals.append(int(raw[start:pos]))
    if len(vals) < 3 or vals[2] != 255 or vals[0] < 1 or vals[1] < 1:
        return None
    return vals[0], vals[1]


def image_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Image triage WITHOUT decoding: format and dimensions from file
    HEADERS only (PNG IHDR, JPEG SOF marker walk, GIF logical screen,
    BMP info header, PPM ASCII header, WebP VP8X/VP8L/VP8 chunks) —
    at most a few hundred bytes examined per object.  Appends::

        img_format    : 'png'|'jpeg'|'gif'|'bmp'|'ppm'|'webp'|NULL
        width, height : int   (NULL when not recognized)
        payload_bytes : long
        ok            : boolean

    This is the pass a 100 TB crawl runs FIRST: dedup/size/aspect
    routing needs dims and format, not pixels — a header walk is
    ~1000x cheaper than :func:`decode_image`'s inflate+unfilter and
    covers formats whose full decode is a plug-in (WebP).  Corrupt
    or unknown payloads degrade to ``ok=false`` rows, never task
    failures.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("img_format", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("payload_bytes", T.LongType(), True),
            T.StructField("ok", T.BooleanType(), False),
        ]
    )

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            fmts, ws, hs, szs, oks = [], [], [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                szs.append(len(raw))
                meta = _image_header_meta(raw)
                if meta is None:
                    fmts.append(None), ws.append(None), hs.append(None)
                    oks.append(False)
                else:
                    fmt, w, h = meta
                    fmts.append(fmt), ws.append(int(w)), hs.append(int(h))
                    oks.append(True)
            yield pdf.assign(
                img_format=fmts,
                width=pd.array(ws, dtype="Int32"),
                height=pd.array(hs, dtype="Int32"),
                payload_bytes=pd.array(szs, dtype="Int64"),
                ok=oks,
            )

    return df.mapInPandas(_probe, out_schema)


def media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Route-and-describe for NATIVE media formats without decoding:
    MP3 frame-header walk and MP4 box walk inside one ``mapInPandas``
    Arrow stage.  Appends::

        media_format : 'mp3' | 'mp4' | NULL
        duration_ms  : long   (NULL when unknown)
        sample_rate  : int    (mp3)
        bitrate_kbps : int    (mp3, mean over frames)
        frame_count  : long   (mp3 frames)
        width, height: int    (mp4 track dims)
        payload_bytes: long   (mp4 mdat size)
        ok           : boolean

    The filter/route decisions of a media corpus build (keep 10-60 s
    clips, drop > 4k frames, balance per codec) need exactly these
    columns; corrupt or foreign payloads degrade to ``ok=false`` rows.
    Like every stage here, statistics are integers — bit-identical
    across engines and partitionings.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("media_format", T.StringType(), True),
            T.StructField("duration_ms", T.LongType(), True),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("bitrate_kbps", T.IntegerType(), True),
            T.StructField("frame_count", T.LongType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("payload_bytes", T.LongType(), True),
            T.StructField("ok", T.BooleanType(), False),
        ]
    )

    def _probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols = {k: [] for k in ("fmt", "dur", "sr", "br", "fc", "w",
                                    "h", "pb", "ok")}

            def push(fmt=None, dur=None, sr=None, br=None, fc=None,
                     w=None, h=None, pb=None, ok=False):
                cols["fmt"].append(fmt), cols["dur"].append(dur)
                cols["sr"].append(sr), cols["br"].append(br)
                cols["fc"].append(fc), cols["w"].append(w)
                cols["h"].append(h), cols["pb"].append(pb)
                cols["ok"].append(ok)

            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                if raw[:3] == b"ID3" or raw[:2] in (b"\xff\xfb", b"\xff\xfa"):
                    meta = _parse_mp3_meta(raw)
                    if meta is None:
                        push()
                    else:
                        fc, dur, br, sr = meta
                        push("mp3", dur, sr, br, fc, ok=True)
                elif len(raw) >= 12 and raw[4:8] == b"ftyp":
                    meta = _parse_mp4_meta(raw)
                    if meta is None:
                        push()
                    else:
                        dur, w, h, pb = meta
                        push("mp4", dur, w=w, h=h, pb=pb, ok=True)
                else:
                    push()
            yield pdf.assign(
                media_format=cols["fmt"],
                duration_ms=pd.array(cols["dur"], dtype="Int64"),
                sample_rate=pd.array(cols["sr"], dtype="Int32"),
                bitrate_kbps=pd.array(cols["br"], dtype="Int32"),
                frame_count=pd.array(cols["fc"], dtype="Int64"),
                width=pd.array(cols["w"], dtype="Int32"),
                height=pd.array(cols["h"], dtype="Int32"),
                payload_bytes=pd.array(cols["pb"], dtype="Int64"),
                ok=cols["ok"],
            )

    return df.mapInPandas(_probe, out_schema)


def _wav_sawtooth(total: int, seed: int) -> np.ndarray:
    """The packers' shared closed-form signal: interleaved sample i is
    ((seed + 11*i) % 65536) - 32768."""
    return ((seed + 11 * np.arange(total, dtype=np.int64)) % 65536) - 32768


def _wav_wrap(pcm: np.ndarray, sample_rate: int, n_channels: int) -> bytes:
    """Standard 44-byte RIFF/WAVE header around int16 PCM."""
    data = pcm.astype("<i2").tobytes()
    byte_rate = sample_rate * n_channels * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack(
            "<IHHIIHH", 16, 1, n_channels, sample_rate, byte_rate,
            n_channels * 2, 16,
        )
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def pack_wav_audio(
    n_samples: int, sample_rate: int, seed: int, n_channels: int = 1
) -> bytes:
    """Deterministic 16-bit PCM WAV payload (standard 44-byte RIFF
    header): sample ``i`` (interleaved across channels) is
    ``((seed + 11*i) % 65536) - 32768`` — a closed form an independent
    engine can recompute without a codec, mirroring
    :func:`pack_ppm_image`."""
    return _wav_wrap(
        _wav_sawtooth(n_samples * n_channels, seed), sample_rate, n_channels
    )


def pack_wav_gated(
    n_samples: int,
    sample_rate: int,
    seed: int,
    gate_period: int,
    n_channels: int = 1,
) -> bytes:
    """Deterministic WAV with alternating SILENCE / ACTIVITY blocks:
    interleaved sample ``i`` is 0 when ``(i // gate_period) % 2 == 0``,
    else the :func:`pack_wav_audio` sawtooth ``((seed + 11*i) % 65536)
    - 32768``.  The closed form lets an independent engine recompute
    per-frame energies and the segmentation itself — the fixture for
    :func:`audio_segments`' driver oracle."""
    total = n_samples * n_channels
    i = np.arange(total, dtype=np.int64)
    pcm = np.where(
        (i // gate_period) % 2 == 0, 0, _wav_sawtooth(total, seed)
    )
    return _wav_wrap(pcm, sample_rate, n_channels)


def audio_segments(
    df: DataFrame,
    payload_col: str = "payload",
    frame_samples: int = 400,
    threshold: int = 1000,
    min_frames: int = 1,
) -> DataFrame:
    """Energy-based activity segmentation over PCM WAV payloads — the
    VAD-shaped pass an audio corpus pipeline runs before transcription
    or silence trimming: split each clip into frames of
    ``frame_samples`` per-channel samples, mark a frame ACTIVE when
    its mean |sample| exceeds ``threshold`` (integer cross-multiplied:
    ``sum|s| > threshold * values_in_frame`` — no float anywhere, so
    results are bit-identical across engines), and emit one row per
    maximal run of >= ``min_frames`` active frames.

    Output: the input columns minus the payload, plus
    ``(seg_idx, start_frame, n_frames, energy)`` — ``energy`` the
    exact integer sum of |sample| over the segment, ``seg_idx``
    0-based per clip in time order.  Undecodable payloads emit no
    rows (filter them upstream with ``decode_audio``'s ``ok`` if the
    distinction matters).

    Scale shape: MAP-ONLY — framing, thresholding and the
    gaps-and-islands run detection all happen in numpy inside the
    same ``mapInPandas`` Arrow stage that decodes the payload, so a
    100 TB audio corpus segments with zero shuffles and only
    segment-sized rows (never frames, never samples) leave the stage.
    The last partial frame uses its true sample count in the
    threshold comparison.
    """
    if frame_samples < 1:
        raise ValueError("frame_samples must be >= 1")
    if min_frames < 1:
        raise ValueError("min_frames must be >= 1")
    keep = [f for f in df.schema.fields if f.name != payload_col]
    out_schema = T.StructType(
        list(keep)
        + [
            T.StructField("seg_idx", T.IntegerType(), False),
            T.StructField("start_frame", T.LongType(), False),
            T.StructField("n_frames", T.LongType(), False),
            T.StructField("energy", T.LongType(), False),
        ]
    )
    keep_names = [f.name for f in keep]

    def _segment(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            # column-wise zip, not iterrows: no per-row object-dtype
            # Series in the hot decode loop (same idiom as the sibling
            # decoders in this file)
            keep_vals = [pdf[c] for c in keep_names]
            for payload, *kept in zip(pdf[payload_col], *keep_vals):
                raw = bytes(payload) if payload is not None else b""
                parsed = _parse_wav(raw)
                if parsed is None:
                    continue
                _rate, n_ch, samples = parsed
                if samples.size == 0:
                    continue
                absS = np.abs(samples.astype(np.int64)).sum(axis=1)
                n = len(absS)
                n_frames = (n + frame_samples - 1) // frame_samples
                pad = n_frames * frame_samples - n
                padded = np.pad(absS, (0, pad))
                fsum = padded.reshape(n_frames, frame_samples).sum(axis=1)
                fcount = np.full(n_frames, frame_samples, dtype=np.int64)
                if pad:
                    fcount[-1] = frame_samples - pad
                active = fsum > threshold * fcount * n_ch
                if not active.any():
                    continue
                # islands: starts where active rises, ends where it falls
                d = np.diff(active.astype(np.int8), prepend=0, append=0)
                starts = np.flatnonzero(d == 1)
                ends = np.flatnonzero(d == -1)  # exclusive
                csum = np.concatenate(([0], np.cumsum(fsum)))
                seg_idx = 0
                for s, e in zip(starts, ends):
                    if e - s < min_frames:
                        continue
                    out_rows.append(
                        tuple(kept)
                        + (
                            seg_idx,
                            int(s),
                            int(e - s),
                            int(csum[e] - csum[s]),
                        )
                    )
                    seg_idx += 1
            yield pd.DataFrame(
                out_rows,
                columns=keep_names
                + ["seg_idx", "start_frame", "n_frames", "energy"],
            )

    return df.mapInPandas(_segment, out_schema)


def _parse_wav(raw: bytes):
    """RIFF/WAVE chunk walk for 16-bit integer PCM: returns
    ``(sample_rate, n_channels, samples[(n, ch) int16])`` or None on
    any malformation (wrong magic, compressed format, truncated
    chunks).  Chunks pad to even length per the RIFF spec."""
    if raw[:4] != b"RIFF" or len(raw) < 44 or raw[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(raw):
        cid = raw[pos : pos + 4]
        size = struct.unpack_from("<I", raw, pos + 4)[0]
        if pos + 8 + size > len(raw):
            return None
        body = raw[pos + 8 : pos + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)
    if fmt is None or data is None or len(fmt) < 16:
        return None
    audio_fmt, n_ch, rate = struct.unpack_from("<HHI", fmt, 0)
    bits = struct.unpack_from("<H", fmt, 14)[0]
    if audio_fmt != 1 or bits != 16 or n_ch < 1:
        return None
    usable = len(data) // (2 * n_ch) * (2 * n_ch)
    samples = np.frombuffer(data, dtype="<i2", count=usable // 2).reshape(
        -1, n_ch
    )
    return int(rate), int(n_ch), samples


def decode_audio(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """REAL audio decode for 16-bit PCM WAV payloads — the audio
    sibling of :func:`decode_image` (same ``mapInPandas`` Arrow
    batching, same degrade-don't-fail contract).  Appends::

        sample_rate, n_channels : int   (NULL when not decodable)
        n_samples               : long  frames per channel
        sum_abs                 : long  sum of |sample| over all channels
        peak                    : int   max |sample|
        ok                      : boolean

    Statistics are exact integers (bit-stable across engines and
    partitionings).  Compressed formats (MP3/AAC/FLAC) need native
    codecs — plug them into this same stage in production.
    """
    out_schema = T.StructType(
        list(df.schema.fields)
        + [
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("sum_abs", T.LongType(), True),
            T.StructField("peak", T.IntegerType(), True),
            T.StructField("ok", T.BooleanType(), False),
        ]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rates, chs, ns, sums, peaks, oks = [], [], [], [], [], []
            for payload in pdf[payload_col]:
                raw = bytes(payload) if payload is not None else b""
                parsed = _parse_wav(raw)
                if parsed is None:
                    rates.append(None), chs.append(None), ns.append(None)
                    sums.append(None), peaks.append(None), oks.append(False)
                    continue
                rate, n_ch, samples = parsed
                a = np.abs(samples.astype(np.int64))
                rates.append(rate), chs.append(n_ch)
                ns.append(samples.shape[0])
                sums.append(int(a.sum()))
                peaks.append(int(a.max()) if a.size else 0)
                oks.append(True)
            yield pdf.assign(
                sample_rate=pd.array(rates, dtype="Int32"),
                n_channels=pd.array(chs, dtype="Int32"),
                n_samples=pd.array(ns, dtype="Int64"),
                sum_abs=pd.array(sums, dtype="Int64"),
                peak=pd.array(peaks, dtype="Int32"),
                ok=oks,
            )

    return df.mapInPandas(_decode, out_schema)


def _dib_frame_bytes(width: int, height: int, frame_seed: int) -> bytes:
    """One uncompressed 24-bit DIB frame (bottom-up BGR, 4-byte row
    padding) with the :func:`pack_ppm_image` pixel formula — the
    shared raster builder behind :func:`pack_bmp_image` and
    :func:`pack_avi_video`."""
    n = width * height * 3
    rgb = (
        ((frame_seed + 7 * np.arange(n, dtype=np.int64)) % 256)
        .astype(np.uint8)
        .reshape(height, width, 3)
    )
    bgr_bottom_up = rgb[::-1, :, ::-1]
    stride = (width * 3 + 3) & ~3
    rows = np.zeros((height, stride), dtype=np.uint8)
    rows[:, : width * 3] = bgr_bottom_up.reshape(height, width * 3)
    return rows.tobytes()


def _bmp_wrap(width: int, height: int, dib_data: bytes) -> bytes:
    """Prepend BITMAPFILEHEADER + BITMAPINFOHEADER to raw bottom-up
    24-bit DIB data — shared by :func:`pack_bmp_image` and the AVI
    frame re-emit in :func:`sample_frames_video`."""
    data_off = 14 + 40
    return (
        b"BM"
        + struct.pack("<IHHI", data_off + len(dib_data), 0, 0, data_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(dib_data),
            2835, 2835, 0, 0,
        )
        + dib_data
    )


def pack_avi_video(
    n_frames: int, width: int, height: int, seed: int, fps: int = 10
) -> bytes:
    """Minimal VALID uncompressed AVI (RIFF ``AVI ``): ``hdrl`` list
    (``avih`` + one ``vids/DIB `` stream with a BITMAPINFOHEADER
    ``strf``) and a ``movi`` list of ``00db`` DIB frames.  Frame ``f``
    uses pixel seed ``seed + 131*f`` — closed form for the oracle,
    like the image/audio packers."""

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    frame_size = ((width * 3 + 3) & ~3) * height
    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        1_000_000 // fps, frame_size * fps, 0, 0x10, n_frames, 0, 1,
        frame_size, width, height, 0, 0, 0, 0,
    )
    # AVISTREAMHEADER: flags, wPriority+wLanguage, initial_frames,
    # scale, rate, start, length, suggested_bufsize, quality,
    # sample_size, then rcFrame — 56 bytes exactly
    strh = (
        b"vidsDIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, n_frames,
                      frame_size, 0, 0)
        + struct.pack("<HHHH", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_size,
        2835, 2835, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(
        b"movi",
        b"".join(
            chunk(b"00db", _dib_frame_bytes(width, height, seed + 131 * f))
            for f in range(n_frames)
        ),
    )
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _parse_avi(raw: bytes):
    """Walk a RIFF AVI iteratively (explicit stack, bounded depth and
    chunk count — a crafted deep-nest payload must degrade, never
    RecursionError a Spark task).  Returns ``(width, height,
    [frame DIB bytes])`` for the FIRST uncompressed 24-bit ``vids``
    stream; frames from other streams (audio, second video) are
    ignored rather than mixed in, and an audio stream's WAVEFORMATEX
    ``strf`` cannot shadow the video BITMAPINFOHEADER.  None on any
    malformation."""
    if raw[:4] != b"RIFF" or len(raw) < 12 or raw[8:12] != b"AVI ":
        return None
    strf, frames = None, []
    stream_idx, video_idx, last_strh_type = 0, None, None
    stack = [(raw, 12)]  # (buffer, pos)
    seen_chunks = 0
    while stack:
        buf, pos = stack.pop()
        while pos + 8 <= len(buf):
            seen_chunks += 1
            if len(stack) > 32 or seen_chunks > 100_000:
                return None  # adversarial nesting / chunk bomb
            cid = buf[pos : pos + 4]
            size = struct.unpack_from("<I", buf, pos + 4)[0]
            if pos + 8 + size > len(buf):
                return None
            body = buf[pos + 8 : pos + 8 + size]
            next_pos = pos + 8 + size + (size & 1)
            if cid == b"LIST":
                # resume the current buffer later; descend into the
                # list body (skipping its 4-byte list-type fourcc)
                stack.append((buf, next_pos))
                buf, pos = body, 4
                continue
            if cid == b"strh":
                last_strh_type = body[:4]
                if last_strh_type == b"vids" and video_idx is None:
                    video_idx = stream_idx
                stream_idx += 1
            elif cid == b"strf":
                if (
                    strf is None
                    and last_strh_type == b"vids"
                    and len(body) >= 40
                ):
                    strf = body
                last_strh_type = None
            elif (
                cid[2:4] in (b"db", b"dc")
                and video_idx is not None
                and cid[:2] == b"%02d" % video_idx
            ):
                frames.append(body)
            pos = next_pos
    if strf is None:
        return None
    w = struct.unpack_from("<i", strf, 4)[0]
    h = struct.unpack_from("<i", strf, 8)[0]
    bpp = struct.unpack_from("<H", strf, 14)[0]
    comp = struct.unpack_from("<I", strf, 16)[0]
    if w <= 0 or h == 0 or bpp != 24 or comp != 0:
        return None
    return w, h, frames


def sample_frames_video(
    df: DataFrame, every_k: int = 2, payload_col: str = "payload"
) -> DataFrame:
    """REAL video frame sampling over uncompressed AVI payloads — the
    container-demux sibling of :func:`sample_frames` (which handles
    the fake ``FVID`` format): walk the RIFF structure, keep every
    k-th ``00db`` frame, and emit each as a standalone BMP so
    :func:`decode_image` decodes it directly.  One output row per
    kept frame: ``(media_id, frame_index, frame)``.  Payloads that
    don't parse produce no rows (same contract as the GIF sampler —
    both share :func:`_frame_sample_stage`).  Swap pyav/ffmpeg into
    this stage for compressed codecs.
    """

    def frames_of(raw):
        parsed = _parse_avi(raw)
        if parsed is None:
            return
        w, h, fr = parsed
        for i in range(len(fr)):
            yield i, _bmp_wrap(w, h, fr[i])

    return _frame_sample_stage(df, payload_col, every_k, frames_of)

