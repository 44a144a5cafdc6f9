"""Common Crawl derivative formats: WET (extracted-text ``conversion``
records) and WAT (per-page metadata JSON records), as pure Column
expressions over the SAME segment / in-segment-order machinery as the
WARC response segments (sources/warc.py).

Common Crawl ships three parallel file sets per crawl — warc.gz (raw
responses), wet.gz (extracted text), wat.gz (metadata JSON with the
outlink list) — with records in the same order, so a consumer can walk
all three in lockstep. The reference persists its extraction to SQL
rows (/root/reference/src/models/outputs.py) and reads hrefs for the
next fetch (/root/reference/src/processors/listing/parser.py); at
web scale those two products ARE the WET and WAT sidecars.

Layout contract (the part that matters at 100 TB): a page's WET and
WAT records are assigned to the page's RESPONSE segment and ordered by
the RESPONSE record's ORDER_COLS keys (surt, ts, url, response length,
response digest) — NOT by the derivative record's own length — so the
i-th record of segment k's WET file describes the i-th record of
segment k's WARC file even when two derivative records tie on every
other key. Offsets are the running sum of the derivative's own record
lengths: one window per segment, no driver work, exactly like
``warc.locate_records``.

Record grammar (deliberately minimal, byte-deterministic, and inside
the DuckDB-expressible subset so the full record TEXT is oracle-check
able — see ``oracle_sql()["wet_wat_records"]``):

- WET: ``WARC/1.0`` / ``WARC-Type: conversion`` / ``WARC-Target-URI``
  / ``WARC-Date`` (UTC instant) / ``WARC-Block-Digest: md5:<md5 of the
  text payload>`` / ``Content-Length`` + blank line + the page's
  ``text`` in UTF-8 + trailing blank line.
- WAT: ``WARC-Type: metadata`` with a JSON payload carrying the fetch
  metadata the downstream graph/rollup operators consume: url, date,
  response payload digest + length, lang, and the in-document-order
  outlink hrefs (ANCHOR_RE — the one href grammar shared with
  functions/anchors.py, so the WAT link list provably equals what
  ``extract_anchors`` / the link graph see). JSON is assembled by
  concat with explicit backslash/quote escaping — engine-independent,
  no ``to_json`` serializer variance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.anchors import ANCHOR_RE
from ..functions.surt import surt_key
from .warc import ORDER_COLS, _warc_date, segment_expr, warc_record_length

_CRLF = "\r\n"


def _json_escape(s: Column) -> Column:
    """Minimal JSON string escaping: backslash first, then quote.
    Control characters inside URLs/lang tags are out of scope
    (documented); text bodies are never embedded in WAT JSON."""
    return F.regexp_replace(
        F.regexp_replace(s, r"\\", r"\\\\"), '"', '\\\\"'
    )


# ---------------------------------------------------------------------------
# WET — extracted-text conversion records
# ---------------------------------------------------------------------------


def _wet_text(text: Column) -> Column:
    # Extraction-miss pages (NULL text) yield an EMPTY conversion record,
    # not a missing one — the 1:1 record-lockstep contract with the WARC
    # segment is what downstream lockstep readers rely on. (Common Crawl
    # instead omits unconverted pages from WET; this module trades that
    # for the stronger alignment invariant, documented here.)
    return F.coalesce(text, F.lit(""))


def _wet_header(url: Column, ts: Column, text: Column) -> Column:
    plen = F.octet_length(text).cast("long")
    return F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: conversion" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), _warc_date(ts), F.lit(_CRLF),
        F.lit("WARC-Block-Digest: md5:"), F.md5(F.encode(text, "UTF-8")),
        F.lit(_CRLF),
        F.lit("Content-Length: "), plen.cast("string"),
        F.lit(_CRLF + _CRLF),
    )


def wet_record(url: Column, ts: Column, text: Column) -> Column:
    """Binary WET conversion record for one capture's extracted text
    (NULL text → empty record body, see ``_wet_text``)."""
    t = _wet_text(text)
    return F.concat(
        F.encode(_wet_header(url, ts, t), "UTF-8"),
        F.encode(t, "UTF-8"),
        F.encode(F.lit(_CRLF + _CRLF), "UTF-8"),
    )


def wet_record_length(url: Column, ts: Column, text: Column) -> Column:
    """Exact byte length of ``wet_record`` without building the bytes."""
    t = _wet_text(text)
    return (
        F.octet_length(_wet_header(url, ts, t)).cast("long")
        + F.octet_length(t).cast("long")
        + F.lit(4).cast("long")
    )


# ---------------------------------------------------------------------------
# WAT — metadata JSON records
# ---------------------------------------------------------------------------


def page_outlinks(html: Column) -> Column:
    """In-document-order href list (array<string>) — the one anchor
    grammar (functions/anchors.py ANCHOR_RE) so WAT links ≡ what the
    link graph and anchor rollup extract. Narrow, codegen, no shuffle."""
    return F.regexp_extract_all(
        html.cast("string"), F.lit(ANCHOR_RE), 1
    )


def wat_payload(
    url: Column, ts: Column, html: Column, lang: Column
) -> Column:
    """The WAT JSON payload STRING, assembled by concat (field order and
    escaping are part of the format contract, not a serializer detail):

    ``{"url":…,"date":…,"digest":"md5:…","length":N,"lang":…,
       "n_links":N,"links":[…]}``

    digest/length describe the RESPONSE payload (the html bytes), which
    is what makes a WAT file a usable index of its WARC file."""
    links = page_outlinks(html)
    quoted = F.transform(
        links, lambda x: F.concat(F.lit('"'), _json_escape(x), F.lit('"'))
    )
    return F.concat(
        F.lit('{"url":"'), _json_escape(url),
        F.lit('","date":"'), _warc_date(ts),
        F.lit('","digest":"md5:'), F.md5(html),
        F.lit('","length":'), F.octet_length(html).cast("string"),
        F.lit(',"lang":"'), _json_escape(lang),
        F.lit('","n_links":'), F.size(links).cast("string"),
        F.lit(',"links":['), F.array_join(quoted, ","), F.lit("]}"),
    )


def _wat_header(url: Column, ts: Column, payload_json: Column) -> Column:
    return F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: metadata" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), _warc_date(ts), F.lit(_CRLF),
        F.lit("Content-Length: "),
        F.octet_length(payload_json).cast("string"),
        F.lit(_CRLF + _CRLF),
    )


def wat_record(url: Column, ts: Column, payload_json: Column) -> Column:
    """Binary WAT metadata record wrapping an already-built JSON payload."""
    return F.concat(
        F.encode(_wat_header(url, ts, payload_json), "UTF-8"),
        F.encode(payload_json, "UTF-8"),
        F.encode(F.lit(_CRLF + _CRLF), "UTF-8"),
    )


def wat_record_length(
    url: Column, ts: Column, payload_json: Column
) -> Column:
    """Exact byte length of ``wat_record`` without building the bytes."""
    return (
        F.octet_length(_wat_header(url, ts, payload_json)).cast("long")
        + F.octet_length(payload_json).cast("long")
        + F.lit(4).cast("long")
    )


# ---------------------------------------------------------------------------
# Segment layout — response-keyed order, derivative-length offsets
# ---------------------------------------------------------------------------


def locate_derivatives(
    pages: DataFrame,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    text_col: str = "text",
    lang_col: str = "lang",
    segment_col: str | None = None,
) -> DataFrame:
    """Per capture: (surt, url, ts, segment) + lockstep pointers into
    all three files — (warc_offset, warc_length), (wet_offset,
    wet_length), (wat_offset, wat_length) — in ONE pass: ordering is
    the response record's ORDER_COLS (so all three files agree on row
    i), offsets are three running sums over the same window. One
    shuffle (the segment exchange), one sort, no driver work."""
    u, ts = F.col(url_col), F.col(ts_col)
    pl, tx = F.col(payload_col), F.col(text_col)
    lang = F.col(lang_col)
    seg = (
        F.col(segment_col).cast("int")
        if segment_col
        else segment_expr(u, n_segments)
    )
    wat_json = wat_payload(u, ts, pl, lang)
    base = pages.select(
        surt_key(u).alias("surt"),
        u.alias("url"),
        ts.alias("ts"),
        seg.alias("segment"),
        warc_record_length(u, ts, pl).alias("length"),
        F.md5(pl).alias("pdigest"),
        wet_record_length(u, ts, tx).alias("wet_length"),
        wat_record_length(u, ts, wat_json).alias("wat_length"),
    )
    w = (
        W.partitionBy("segment")
        .orderBy(*ORDER_COLS)
        .rowsBetween(W.unboundedPreceding, -1)
    )

    def run(col: str) -> Column:
        return F.coalesce(F.sum(col).over(w), F.lit(0))

    return base.select(
        "surt",
        "url",
        "ts",
        "segment",
        F.col("pdigest").alias("digest"),
        run("length").alias("warc_offset"),
        F.col("length").alias("warc_length"),
        run("wet_length").alias("wet_offset"),
        "wet_length",
        run("wat_length").alias("wat_offset"),
        "wat_length",
    )


def _ordered_records(
    pages: DataFrame,
    record: Column,
    segment: int,
    n_segments: int,
    url_col: str,
    ts_col: str,
    payload_col: str,
) -> bytes:
    u, ts, pl = F.col(url_col), F.col(ts_col), F.col(payload_col)
    rows = (
        pages.select(
            surt_key(u).alias("surt"),
            ts.alias("ts"),
            u.alias("url"),
            segment_expr(u, n_segments).alias("segment"),
            warc_record_length(u, ts, pl).alias("length"),
            F.md5(pl).alias("pdigest"),
            record.alias("rec"),
        )
        .filter(F.col("segment") == segment)
        .orderBy(*ORDER_COLS)
        .select("rec")
        .collect()
    )
    return b"".join(bytes(r["rec"]) for r in rows)


def render_wet_segment(
    pages: DataFrame,
    segment: int,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    text_col: str = "text",
) -> bytes:
    """Materialize ONE WET segment's bytes (tests / small exports); the
    (wet_offset, wet_length) pointers slice exactly these bytes."""
    return _ordered_records(
        pages,
        wet_record(F.col(url_col), F.col(ts_col), F.col(text_col)),
        segment, n_segments, url_col, ts_col, payload_col,
    )


def render_wat_segment(
    pages: DataFrame,
    segment: int,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    lang_col: str = "lang",
) -> bytes:
    """Materialize ONE WAT segment's bytes; (wat_offset, wat_length)
    pointers slice exactly these bytes."""
    u, ts = F.col(url_col), F.col(ts_col)
    rec = wat_record(
        u, ts, wat_payload(u, ts, F.col(payload_col), F.col(lang_col))
    )
    return _ordered_records(
        pages, rec, segment, n_segments, url_col, ts_col, payload_col
    )
