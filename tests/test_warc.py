"""WARC source tests (sources/warc.py — SURVEY.md §2.4 extension;
Common Crawl's container format, parsed pure-Python with the same
hardening rules as the multimodal codecs)."""

import zlib

import pytest
from pyspark.sql import types as T

from pandance_spark.sources.warc import (
    pack_warc,
    pack_warc_gz,
    parse_warc,
    warc_records,
)

_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def _recs(n, tag):
    return [
        {"uri": f"http://t.test/{tag}/{j}", "body": f"body {tag} {j} " * (j + 1)}
        for j in range(n)
    ]


def test_warc_records_explodes_plain_and_gzip(spark):
    rows = [
        (1, pack_warc(_recs(2, "a"))),
        (2, pack_warc_gz(_recs(3, "b"))),  # Common Crawl member-per-record
        (3, b"not a warc"),
        (4, None),
    ]
    out = warc_records(
        spark.createDataFrame(rows, _SCHEMA), "doc_id"
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 3
    r0 = sorted(by_doc[1], key=lambda r: r["record_index"])[0]
    assert r0["target_uri"] == "http://t.test/a/0"
    assert r0["record_type"] == "response"
    assert r0["http_status"] == 200
    assert r0["http_content_type"] == "text/plain"
    assert r0["body_text"] == "body a 0 "
    assert r0["n_body_bytes"] == len("body a 0 ")
    assert r0["ok"] is True
    for doc in (3, 4):  # malformed payloads degrade to one ok=false row
        assert len(by_doc[doc]) == 1 and by_doc[doc][0]["ok"] is False


def test_warc_parse_guards():
    raw = pack_warc(_recs(2, "x"))
    assert parse_warc(raw[:-40]) is None  # truncated body
    assert parse_warc(b"WARC/1.0\r\nContent-Length: -5\r\n\r\n") is None
    # gzip member expanding past the inflate budget degrades, never
    # allocates unbounded
    co = zlib.compressobj(9, zlib.DEFLATED, 31)
    bomb = co.compress(b"\x00" * (70 * 1024 * 1024)) + co.flush()
    assert parse_warc(bomb) is None


def test_warc_status_and_ctype_surfaced(spark):
    payload = pack_warc(
        [{"uri": "http://t.test/e", "body": "<html/>", "status": 404,
          "ctype": "text/html; charset=utf-8"}]
    )
    r = warc_records(
        spark.createDataFrame([(9, payload)], _SCHEMA), "doc_id"
    ).first()
    assert (r["http_status"], r["http_content_type"]) == (
        404, "text/html; charset=utf-8",
    )


def test_warc_whitespace_only_payload_marks_ok_false(spark):
    # r6 review fix: zero-record payloads must still emit the id with
    # ok=false — a vanished id is silent data loss
    out = warc_records(
        spark.createDataFrame(
            [(7, b"\r\n\r\n")], _SCHEMA
        ),
        "doc_id",
    ).collect()
    assert len(out) == 1 and out[0]["ok"] is False


def test_warc_gunzip_exact_budget_boundary():
    # a member inflating to EXACTLY the budget is within the cap
    import pandance_spark.sources.warc as w

    saved = w._MAX_INFLATED_BYTES
    try:
        w._MAX_INFLATED_BYTES = 1000
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        exact = co.compress(b"a" * 1000) + co.flush()
        got = w._gunzip_members(exact)
        assert got == b"a" * 1000
        co = zlib.compressobj(6, zlib.DEFLATED, 31)
        over = co.compress(b"a" * 1001) + co.flush()
        assert w._gunzip_members(over) is None
    finally:
        w._MAX_INFLATED_BYTES = saved


def test_warc_non_ascii_uri_round_trips():
    raw = pack_warc([{"uri": "http://ex.test/café", "body": "x"}])
    recs = parse_warc(raw)
    assert recs is not None
    assert recs[0][0]["warc-target-uri"] == "http://ex.test/café"


def test_pack_wet_roundtrip(spark):
    from pandance_spark.sources.warc import pack_wet, parse_warc, warc_records

    raw = pack_wet(
        [
            {"uri": "http://a.example/x", "body": "hello text"},
            {"uri": "http://b.example/y", "body": "more words"},
        ]
    )
    recs = parse_warc(raw)
    assert [f.get("warc-type") for f, _ in recs] == ["conversion"] * 2
    assert recs[0][1] == b"hello text"

    df = spark.createDataFrame([(1, raw)], ["doc_id", "payload"])
    out = sorted(
        (r["record_index"], r["record_type"], r["target_uri"],
         r["http_status"], r["body_text"])
        for r in warc_records(df, "doc_id").collect()
    )
    # conversion records: no HTTP head -> status NULL, body whole
    assert out == [
        (0, "conversion", "http://a.example/x", None, "hello text"),
        (1, "conversion", "http://b.example/y", None, "more words"),
    ]


def test_wet_body_starting_with_http_not_sniffed(spark):
    # review fix: a conversion record whose TEXT begins with 'HTTP/'
    # must come back whole (NULL status), not truncated at the first
    # CRLFCRLF inside the page text
    from pandance_spark.sources.warc import pack_wet, warc_records

    tricky = "HTTP/1.1 200 OK\r\nSome-Header: x\r\n\r\nactual page text"
    raw = pack_wet([{"uri": "http://t.example/h", "body": tricky}])
    df = spark.createDataFrame([(1, raw)], ["doc_id", "payload"])
    r = warc_records(df, "doc_id").first()
    assert r["http_status"] is None
    assert r["body_text"] == tricky
    assert r["n_body_bytes"] == len(tricky.encode())
