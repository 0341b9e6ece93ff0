"""WARC (Web ARChive, ISO 28500) record handling — the container
format of Common Crawl and most web-scale text corpora, i.e. the
actual input of a 100 TB LLM-data pipeline.

Engine extension beyond the reference (SURVEY.md §2.4; the reference
has no source formats at all).  Same design rules as the multimodal
codecs (``operators/multimodal.py``):

- pure Python + stdlib ``zlib`` — no native warcio/fastwarc needed;
- payload bytes live only for the Arrow batch being processed
  (``warc_records`` is a ``mapInPandas`` stage, one row per record);
- headers are ATTACKER-CONTROLLED: record counts, header sizes, body
  lengths and gzip expansion are all hard-capped, and any
  malformation degrades to an ``ok = false`` row — one bad crawl
  object cannot kill the scan;
- both on-disk layouts are supported: plain concatenated records and
  Common Crawl's member-per-record gzip (a ``.warc.gz`` is a stream
  of independent gzip members, so a split-per-record reader can seek;
  we inflate members sequentially with a bounded budget).

``pack_warc`` / ``pack_warc_gz`` build spec-conformant WARC/1.0
payloads deterministically so correctness oracles can recompute every
parsed field in closed form (the driver query does exactly that).
"""

from __future__ import annotations

import zlib
from typing import Iterator, List, Optional, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

__all__ = ["pack_warc", "pack_wet", "pack_warc_gz", "parse_warc",
           "warc_records"]

# hard caps — a crafted payload must degrade, never allocate
_MAX_RECORDS = 10_000
_MAX_HEADER_BYTES = 64 * 1024
_MAX_INFLATED_BYTES = 64 * 1024 * 1024


def pack_warc(records) -> bytes:
    """Serialize ``records`` (dicts with ``uri``, ``body`` (str or
    bytes), optional ``warc_type``/``date``/``status``/``ctype``) as
    concatenated WARC/1.0 response records wrapping an HTTP/1.1
    response block."""
    out = bytearray()
    for i, r in enumerate(records):
        body = r["body"]
        if isinstance(body, str):
            body = body.encode("utf-8")
        status = int(r.get("status", 200))
        ctype = r.get("ctype", "text/plain")
        # utf-8, not ascii: WARC 1.0 headers are utf-8 and crawl-data
        # target URIs are routinely IRIs — a non-ascii uri must encode,
        # not crash the packer
        http = (
            f"HTTP/1.1 {status} OK\r\n"
            f"Content-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("utf-8") + body
        header = (
            "WARC/1.0\r\n"
            f"WARC-Type: {r.get('warc_type', 'response')}\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:08d}>\r\n"
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Target-URI: {r['uri']}\r\n"
            "Content-Type: application/http; msgtype=response\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("utf-8")
        out += header + http + b"\r\n\r\n"
    return bytes(out)


def pack_wet(records) -> bytes:
    """Serialize ``records`` (dicts with ``uri``, ``body``, optional
    ``date``) as WARC/1.0 CONVERSION records — the WET layout Common
    Crawl ships extracted text in (no HTTP wrapper, ``Content-Type:
    text/plain``).  ``warc_records`` parses these with ``http_status``
    / ``http_content_type`` NULL and the body returned whole, so a
    text pipeline consumes WET and WARC through the same stage."""
    out = bytearray()
    for i, r in enumerate(records):
        body = r["body"]
        if isinstance(body, str):
            body = body.encode("utf-8")
        header = (
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Record-ID: <urn:uuid:{i:08d}>\r\n"
            f"WARC-Date: {r.get('date', '2024-01-01T00:00:00Z')}\r\n"
            f"WARC-Target-URI: {r['uri']}\r\n"
            "Content-Type: text/plain\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode("utf-8")
        out += header + body + b"\r\n\r\n"
    return bytes(out)


def pack_warc_gz(records) -> bytes:
    """Common Crawl layout: one independent gzip MEMBER per record
    (lets a reader split the file at member boundaries)."""
    out = bytearray()
    for r in records:
        member = pack_warc([r])
        co = zlib.compressobj(6, zlib.DEFLATED, 31)  # wbits 31 = gzip
        out += co.compress(member) + co.flush()
    return bytes(out)


def _gunzip_members(raw: bytes) -> Optional[bytes]:
    """Inflate a stream of concatenated gzip members with a hard
    output budget; None on corruption, truncation or budget blowout."""
    out, pos, budget = [], 0, _MAX_INFLATED_BYTES
    try:
        while pos < len(raw):
            if budget <= 0:
                # more compressed input but no budget left — and
                # max_length=0 would mean UNBOUNDED to zlib, so the
                # check must come before the decompress call
                return None
            d = zlib.decompressobj(31)
            chunk = d.decompress(raw[pos:], budget)
            if not d.eof:  # member didn't finish inside the budget
                return None
            out.append(chunk)
            budget -= len(chunk)  # >= 0: chunk is capped by max_length
            consumed = len(raw) - pos - len(d.unused_data)
            if consumed <= 0:
                return None
            pos += consumed
    except zlib.error:
        return None
    return b"".join(out)


def _parse_http_response(block: bytes):
    """(status, content_type, body) from an HTTP response block; a
    block without an HTTP head is returned whole as the body."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0 or not block.startswith(b"HTTP/"):
        return None, None, block
    head = block[:sep].decode("iso-8859-1", "replace")
    lines = head.split("\r\n")
    status = None
    parts = lines[0].split()
    if len(parts) >= 2 and parts[1].isdigit():
        status = int(parts[1])
    ctype = None
    for ln in lines[1:]:
        k, _, v = ln.partition(":")
        if k.strip().lower() == "content-type":
            ctype = v.strip()
    return status, ctype, block[sep + 4 :]


def parse_warc(raw: bytes) -> Optional[List[Tuple[dict, bytes]]]:
    """Parse a plain or gzip'd WARC payload into
    ``[(warc_fields, block_bytes), ...]`` or None on malformation.
    Iterative walk, every length bounded by the remaining buffer."""
    if raw[:2] == b"\x1f\x8b":
        raw = _gunzip_members(raw)
        if raw is None:
            return None
    records: List[Tuple[dict, bytes]] = []
    pos = 0
    while pos < len(raw):
        while raw[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= len(raw):
            break
        if len(records) >= _MAX_RECORDS:
            return None
        if not raw.startswith(b"WARC/", pos):
            return None
        hdr_end = raw.find(b"\r\n\r\n", pos, pos + _MAX_HEADER_BYTES)
        if hdr_end < 0:
            return None
        fields = {}
        for ln in raw[pos:hdr_end].decode("utf-8", "replace").split("\r\n")[1:]:
            k, _, v = ln.partition(":")
            fields[k.strip().lower()] = v.strip()
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            return None
        body_start = hdr_end + 4
        if clen < 0 or body_start + clen > len(raw):
            return None
        records.append((fields, raw[body_start : body_start + clen]))
        pos = body_start + clen
    return records


_WARC_SCHEMA_TAIL = [
    T.StructField("record_index", T.IntegerType(), True),
    T.StructField("record_type", T.StringType(), True),
    T.StructField("target_uri", T.StringType(), True),
    T.StructField("warc_date", T.StringType(), True),
    T.StructField("http_status", T.IntegerType(), True),
    T.StructField("http_content_type", T.StringType(), True),
    T.StructField("body_text", T.StringType(), True),
    T.StructField("n_body_bytes", T.LongType(), True),
    T.StructField("ok", T.BooleanType(), False),
]


def warc_records(
    df: DataFrame, id_col: str, payload_col: str = "payload"
) -> DataFrame:
    """Explode binary WARC payloads into one row per record — the
    ingest front door of a crawl-based corpus: read ``.warc``/
    ``.warc.gz`` objects as ``binary`` (``spark.read.format
    ("binaryFile")`` at scale), then this stage parses records and
    extracts HTTP response bodies, all inside Arrow-batched
    ``mapInPandas`` (payloads for one batch only are ever resident;
    the downstream columns are plain strings that parquet can prune).

    Output: ``(id_col, record_index, record_type, target_uri,
    warc_date, http_status, http_content_type, body_text,
    n_body_bytes, ok)``.  A malformed payload yields ONE ``ok=false``
    row for its id; malformation never fails the task.  ``body_text``
    is utf-8 with replacement — raw bytes survive in
    ``n_body_bytes``-faithful form upstream if needed.
    """
    out_schema = T.StructType(
        [T.StructField(id_col, df.schema[id_col].dataType, True)]
        + _WARC_SCHEMA_TAIL
    )

    def _explode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                recs = parse_warc(raw) if raw else None
                if not recs:
                    # None (malformed) AND [] (whitespace-only payload,
                    # zero records) both mark the id with ok=false —
                    # every input id must appear in the output exactly
                    # so completeness audits can catch silent loss
                    rows.append(
                        (rid, None, None, None, None, None, None, None,
                         None, False)
                    )
                    continue
                for i, (fields, block) in enumerate(recs):
                    # HTTP-parse only records DECLARED as HTTP by
                    # their WARC Content-Type (plus a sniff fallback
                    # for header-less records).  A WET conversion
                    # record whose extracted TEXT happens to start
                    # with 'HTTP/' must come back whole with NULL
                    # status, not truncated at a CRLFCRLF inside the
                    # page text (review fix; pinned by test)
                    rec_ct = fields.get("content-type", "")
                    if rec_ct.lower().startswith("application/http") or (
                        "content-type" not in fields
                        and block.startswith(b"HTTP/")
                    ):
                        status, ctype, body = _parse_http_response(block)
                    else:
                        status, ctype, body = None, None, block
                    rows.append(
                        (
                            rid,
                            i,
                            fields.get("warc-type"),
                            fields.get("warc-target-uri"),
                            fields.get("warc-date"),
                            status,
                            ctype,
                            body.decode("utf-8", "replace"),
                            len(body),
                            True,
                        )
                    )
            yield pd.DataFrame(
                rows, columns=[id_col] + [f.name for f in _WARC_SCHEMA_TAIL]
            ).astype(
                {
                    "record_index": "Int32",
                    "http_status": "Int32",
                    "n_body_bytes": "Int64",
                }
            )

    return df.mapInPandas(_explode, out_schema)
