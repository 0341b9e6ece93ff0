"""Multimodal column handling: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs.

Engine extension beyond the reference (SURVEY.md §2.4).  The Spark-side
plumbing — schemas, ``mapInPandas`` batch shape, partitioning — is real
and tested; the *codec* step is stubbed because image/audio libraries
are not available in this environment:

- ``decode_image`` raises ``NotImplementedError`` (clearly marked stub —
  plug in PIL/libvips per-batch in production);
- ``fake_decode_meta`` is a deterministic stand-in that parses a tiny
  fake header (magic + width + height) so the pipeline shape can be
  exercised end-to-end;
- ``byte_histogram_features`` is a REAL feature extractor (16-bin byte
  histogram) — genuinely computed, deterministic, useful as a
  cheap content fingerprint for binary payloads.

Design for scale: payloads stay in executor memory only for the batch
being processed (``mapInPandas`` streams Arrow batches); metadata
columns are plain columns so filters on them prune parquet row groups
without touching payload bytes.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "pack_fake_image",
    "pack_fake_video",
    "attach_binary_payload",
    "fake_decode_meta",
    "decode_image",
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


def decode_image(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """STUB — real image decode requires PIL/libvips, not present in
    this environment.  In production, replace the body with a
    ``mapInPandas`` over Arrow batches calling the codec per payload."""
    raise NotImplementedError(
        "image codec not available in this environment; use fake_decode_meta "
        "for pipeline testing or plug a codec into a mapInPandas stage"
    )


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


def resize_image(df: DataFrame, width: int, height: int, payload_col: str = "payload") -> DataFrame:
    """STUB — real resampling needs an image codec (PIL/libvips), absent
    here.  Production shape: a ``mapInPandas`` stage decoding, resizing
    and re-encoding per Arrow batch (see :func:`fake_resize` for the
    exercised plumbing)."""
    raise NotImplementedError(
        "image codec not available in this environment; use fake_resize "
        "for pipeline testing or plug a codec into a mapInPandas stage"
    )


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
