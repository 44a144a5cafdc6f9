"""WARC record rendering + parsing (ISO 28500, the Common Crawl
interchange format) and the cdxj location index over it.

The reference stores fetched listings in a SQL table; a web-scale crawl
ships its raw captures as WARC segments and serves lookups through a CDX
index of (surt, segment, offset, length) pointers — exactly how Common
Crawl's cdxj files reference its warc.gz segments. This module renders
the record BYTES and computes the pointers; both are pure Column
expressions, so the cdxj pointer table is oracle-checkable and the
record layout is engine-independent:

- ``warc_record``: the response record as binary — ``WARC/1.0`` header
  block (Target-URI, Date, Content-Length) + CRLF CRLF + payload +
  CRLF CRLF. Header fields are plain octets; the payload is the stored
  ``html`` bytes verbatim (arbitrary bytes, never re-encoded).
- ``warc_locations``: assign each capture to a segment (uniform
  url-hash split, the Common Crawl "1 of N segments" layout), order
  records within a segment by SURT (so a segment IS a sorted CDX run),
  and compute each record's byte offset as the running sum of record
  lengths — ONE window per segment, no driver work. The concatenation
  of a segment's records in offset order is the segment file.
- ``parse_warc_record``: recover (url, ts, payload) from record bytes
  using the Content-Length framing (payload bytes are untouched even if
  they contain CRLF or header-lookalike bytes).

Scale: segments are the unit of parallelism (Common Crawl uses 100
segments/crawl at ~1 TB each); the offset window partitions by segment
and the sort key is the SURT the CDX index already materializes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.surt import surt_key

_CRLF = "\r\n"


def _warc_date(ts: Column) -> Column:
    """ISO 28500 WARC-Date: render the INSTANT in UTC regardless of
    session timezone (the 'Z' suffix must not label local wall time):
    to_utc_timestamp against the session zone cancels date_format's
    session-zone rendering. ONE definition for every record type —
    response and revisit dates in a segment cannot drift apart
    (pinned by test_warc_date_is_utc_regardless_of_session_timezone)."""
    return F.date_format(
        F.to_utc_timestamp(ts, F.current_timezone()),
        "yyyy-MM-dd'T'HH:mm:ss'Z'",
    )


def _warc_header(url: Column, ts: Column, payload_len: Column) -> Column:
    """The header block as a STRING (headers are ASCII; the payload is
    appended as raw bytes by warc_record)."""
    return F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: response" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "),
        _warc_date(ts),
        F.lit(_CRLF),
        F.lit("Content-Length: "),
        payload_len.cast("string"),
        F.lit(_CRLF + _CRLF),
    )


def warc_record(url: Column, ts: Column, payload: Column) -> Column:
    """Binary WARC response record for one capture."""
    plen = F.length(payload).cast("long")
    return F.concat(
        F.encode(_warc_header(url, ts, plen), "UTF-8"),
        payload,
        F.encode(F.lit(_CRLF + _CRLF), "UTF-8"),
    )


def warc_record_length(url: Column, ts: Column, payload: Column) -> Column:
    """Exact byte length of ``warc_record`` WITHOUT building the bytes —
    the offset math runs on lengths only (headers are ASCII, 1 byte per
    char; the payload contributes its octet length)."""
    plen = F.length(payload).cast("long")
    return (
        # octet_length: headers are UTF-8 encoded, a non-ASCII URL makes
        # byte length exceed char length
        F.octet_length(_warc_header(url, ts, plen)).cast("long")
        + plen
        + F.lit(4).cast("long")  # trailing CRLF CRLF
    )


# In-segment record order — ONE definition shared by the pointer table,
# the segment renderer, and the cdxj composer (sources/cdx.py), so the
# byte layout cannot drift between them. The payload digest is the last
# key: two captures identical in (surt, ts, url) with different
# same-length payloads still get a deterministic record↔pointer pairing.
ORDER_COLS = ["surt", "ts", "url", "length", "pdigest"]


def segment_expr(url: Column, n_segments: int) -> Column:
    """Uniform url-hash segment split (Common Crawl's 1-of-N layout)."""
    return F.pmod(F.xxhash64(url), F.lit(n_segments)).cast("int")


def locate_records(
    pages: DataFrame,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    segment_col: str | None = None,
    extra: dict | None = None,
) -> DataFrame:
    """The layout engine behind every WARC/cdxj surface: per record —
    (surt, url, ts, segment, digest, offset, length [, extras]) with
    ``offset`` the running byte position inside the segment file (ONE
    window per segment, ORDER_COLS order).

    ``segment_col``: use a precomputed segment assignment instead of the
    url-hash split (per-crawl-wave segments, or an engine-portable
    expression for differential testing). ``extra``: {name: Column}
    passthroughs evaluated on the input row (e.g. lang, url_canon)."""
    u, ts, pl = F.col(url_col), F.col(ts_col), F.col(payload_col)
    seg = (
        F.col(segment_col).cast("int")
        if segment_col
        else segment_expr(u, n_segments)
    )
    base = pages.select(
        surt_key(u).alias("surt"),
        u.alias("url"),
        ts.alias("ts"),
        seg.alias("segment"),
        warc_record_length(u, ts, pl).alias("length"),
        F.md5(pl).alias("pdigest"),
        *[v.alias(k) for k, v in (extra or {}).items()],
    )
    w = (
        W.partitionBy("segment")
        .orderBy(*ORDER_COLS)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return base.select(
        "surt",
        "url",
        "ts",
        "segment",
        F.col("pdigest").alias("digest"),
        F.coalesce(F.sum("length").over(w), F.lit(0)).alias("offset"),
        "length",
        *(extra or {}).keys(),
    )


def warc_locations(
    pages: DataFrame,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
    segment_col: str | None = None,
) -> DataFrame:
    """The cdxj pointer table: (surt, url, segment, offset, length) —
    records within a segment are SURT-ordered (each segment is a sorted
    CDX run) and ``offset`` is the running byte position of the record
    in the concatenated segment file."""
    return locate_records(
        pages, n_segments, url_col, ts_col, payload_col, segment_col
    ).select("surt", "url", "segment", "offset", "length")


def render_segment(
    pages: DataFrame,
    segment: int,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> bytes:
    """Materialize ONE segment's file bytes (tests / small exports): the
    ORDER_COLS-ordered concatenation of its records. The pointer table's
    (offset, length) slices index into exactly these bytes."""
    u, ts, pl = F.col(url_col), F.col(ts_col), F.col(payload_col)
    rows = (
        pages.select(
            surt_key(u).alias("surt"),
            ts.alias("ts"),
            u.alias("url"),
            segment_expr(u, n_segments).alias("segment"),
            warc_record_length(u, ts, pl).alias("length"),
            F.md5(pl).alias("pdigest"),
            warc_record(u, ts, pl).alias("rec"),
        )
        .filter(F.col("segment") == segment)
        .orderBy(*ORDER_COLS)
        .select("rec")
        .collect()
    )
    return b"".join(bytes(r["rec"]) for r in rows)


def parse_warc_record(record: Column) -> Column:
    """struct(url, date, payload) from record bytes. The bytes round-trip
    through ISO-8859-1 (a 1:1 byte↔char mapping, so arbitrary payload
    bytes survive); the payload is sliced by Content-Length, so CRLFs or
    header-lookalike bytes inside it are returned verbatim."""
    s = F.decode(record, "ISO-8859-1")
    sep = F.instr(s, _CRLF + _CRLF)  # 1-based start of the blank line
    head = F.substr(s, F.lit(1), sep - 1)
    url = F.regexp_extract(head, "WARC-Target-URI: ([^\r]*)", 1)
    date = F.regexp_extract(head, "WARC-Date: ([^\r]*)", 1)
    clen = F.regexp_extract(head, "Content-Length: ([0-9]+)", 1).cast(
        "long"
    )
    payload = F.encode(F.substr(s, sep + 4, clen), "ISO-8859-1")
    return F.struct(
        url.alias("url"), date.alias("date"), payload.alias("payload")
    )


def classify_revisits(
    pages: DataFrame,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """ISO 28500 dedup storage: per (url, payload-digest), the FIRST
    capture is a full ``response`` record; every later capture with the
    same digest becomes a ``revisit`` record (identical-payload-digest
    profile) that stores a back-reference instead of the payload — the
    web-archive storage saver (recrawled-but-unchanged pages are the
    common case, and they cost ~0 bytes instead of the full body).

    Output per capture: (url, ts, digest, record_type,
    refers_to_ts, stored_length) where ``refers_to_ts`` is the referent
    capture's timestamp (NULL for responses) and ``stored_length`` is
    the record's byte cost under the policy (full record for responses,
    header-only for revisits).

    ONE exchange on (url, digest) — the window that ranks captures and
    the first-capture lookup share the same partitioning. Deterministic
    ties: equal-ts duplicates order by the full ORDER_COLS discipline's
    spirit (ts alone suffices here; equal-ts equal-digest captures are
    interchangeable referents)."""
    return _classify_core(
        pages, url_col, ts_col, payload_col, extra={}
    ).select(
        "url",
        "ts",
        "digest",
        "record_type",
        "refers_to_ts",
        F.col("length").alias("stored_length"),
    )


def _classify_core(
    pages: DataFrame,
    url_col: str,
    ts_col: str,
    payload_col: str,
    extra: dict,
) -> DataFrame:
    """THE revisit policy, defined once (the ORDER_COLS discipline
    applied to classification): per (url, payload-digest) ranked by ts,
    rank 1 is a response, the rest are revisits referring to the first
    capture, and ``length`` is the record's per-type byte cost. Both
    ``classify_revisits`` and the dedup-aware layout/renderer consume
    this frame, so a policy change (tie-break key, digest algorithm)
    cannot desynchronize index from bytes. ``extra``: {name: Column}
    passthroughs evaluated on the input row (segment, surt, payload)."""
    u, ts, pl = F.col(url_col), F.col(ts_col), F.col(payload_col)
    base = pages.select(
        u.alias("url"),
        ts.alias("ts"),
        F.md5(pl).alias("digest"),
        warc_record_length(u, ts, pl).alias("full_length"),
        # referent placeholders (u, ts) are length-exact: the referent
        # URI is the same url by construction and WARC-Date renders
        # fixed-width, so the true first-capture referent yields the
        # same byte count — letting the length ride the pre-window row
        _revisit_record_length(u, ts, u, ts).alias("revisit_length"),
        *[v.alias(k) for k, v in extra.items()],
    )
    w = W.partitionBy("url", "digest").orderBy("ts")
    rn = F.row_number().over(w)
    first_ts = F.first("ts").over(w)
    return base.select(
        "url",
        "ts",
        "digest",
        F.when(rn == 1, F.lit("response"))
        .otherwise(F.lit("revisit"))
        .alias("record_type"),
        F.when(rn > 1, first_ts).alias("refers_to_ts"),
        F.when(rn == 1, F.col("full_length"))
        .otherwise(F.col("revisit_length"))
        .alias("length"),
        *extra.keys(),
    )


def _revisit_header(
    url: Column, ts: Column, refers_url: Column, refers_ts: Column
) -> Column:
    return F.concat(
        F.lit("WARC/1.0" + _CRLF),
        F.lit("WARC-Type: revisit" + _CRLF),
        F.lit("WARC-Target-URI: "), url, F.lit(_CRLF),
        F.lit("WARC-Date: "), _warc_date(ts), F.lit(_CRLF),
        F.lit("WARC-Refers-To-Target-URI: "), refers_url, F.lit(_CRLF),
        F.lit("WARC-Refers-To-Date: "), _warc_date(refers_ts),
        F.lit(_CRLF),
        F.lit("Content-Length: 0" + _CRLF + _CRLF),
    )


def revisit_record(
    url: Column, ts: Column, refers_url: Column, refers_ts: Column
) -> Column:
    """Binary WARC revisit record (identical-payload-digest profile):
    header block only, Content-Length 0, trailing CRLF CRLF — same
    framing grammar as ``warc_record`` so ``parse_warc_record``'s
    Content-Length walk skips it correctly inside a segment."""
    return F.concat(
        F.encode(
            _revisit_header(url, ts, refers_url, refers_ts), "UTF-8"
        ),
        F.encode(F.lit(_CRLF + _CRLF), "UTF-8"),
    )


def _revisit_record_length(
    url: Column, ts: Column, refers_url: Column, refers_ts: Column
) -> Column:
    return (
        F.octet_length(
            _revisit_header(url, ts, refers_url, refers_ts)
        ).cast("long")
        + F.lit(4).cast("long")
    )


def revisit_storage_report(classified: DataFrame) -> DataFrame:
    """One-row audit of the dedup policy over a ``classify_revisits``
    frame: capture counts by type and total bytes stored vs the
    store-everything baseline. Single partial aggregate."""
    return classified.agg(
        F.count(F.lit(1)).alias("n_captures"),
        F.sum(
            (F.col("record_type") == "response").cast("long")
        ).alias("n_responses"),
        F.sum(
            (F.col("record_type") == "revisit").cast("long")
        ).alias("n_revisits"),
        F.sum("stored_length").alias("bytes_stored"),
    )


def _classified_layout(
    pages: DataFrame,
    n_segments: int,
    url_col: str,
    ts_col: str,
    payload_col: str,
    keep_payload: bool,
) -> DataFrame:
    """The dedup-aware layout rows: ``_classify_core`` (THE policy) +
    surt/segment riding through as extras, renamed into the ORDER_COLS
    vocabulary. Two exchanges: (url, digest) for the revisit ranking,
    then the per-segment offset window downstream."""
    u, pl = F.col(url_col), F.col(payload_col)
    extra = {
        "surt": surt_key(u),
        "segment": segment_expr(u, n_segments),
        **({"payload": pl} if keep_payload else {}),
    }
    return _classify_core(
        pages, url_col, ts_col, payload_col, extra
    ).withColumnRenamed("digest", "pdigest")


def locate_records_deduped(
    pages: DataFrame,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> DataFrame:
    """Revisit-aware cdxj pointer table: per capture — (surt, url, ts,
    segment, digest, record_type, refers_to_ts, offset, length), where
    repeat captures of an unchanged payload are laid out as header-only
    revisit records (``classify_revisits`` policy) and ``offset`` is
    the running byte position under the SHRUNKEN per-type lengths. The
    archive's index and its storage bill agree by construction."""
    rows = _classified_layout(
        pages, n_segments, url_col, ts_col, payload_col, keep_payload=False
    )
    w = (
        W.partitionBy("segment")
        .orderBy(*ORDER_COLS)
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return rows.select(
        "surt",
        "url",
        "ts",
        "segment",
        F.col("pdigest").alias("digest"),
        "record_type",
        "refers_to_ts",
        F.coalesce(F.sum("length").over(w), F.lit(0)).alias("offset"),
        "length",
    )


def render_segment_deduped(
    pages: DataFrame,
    segment: int,
    n_segments: int = 16,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    payload_col: str = "html",
) -> bytes:
    """One segment's bytes under the revisit policy — the ORDER_COLS-
    ordered concatenation of full responses and header-only revisits.
    ``locate_records_deduped``'s (offset, length) slices index exactly
    these bytes (tests cut records back out and re-parse them).

    The segment filter is applied to the INPUT, not the classified
    frame: segment is a pure function of url and the revisit window
    partitions by (url, digest), so every url's captures share a
    segment and classifying the filtered subset is identical — without
    this, rendering each of N segments would re-shuffle and re-window
    the whole corpus N times (the window is not a partition column, so
    Catalyst cannot push the predicate below it)."""
    rows = (
        _classified_layout(
            pages.filter(
                segment_expr(F.col(url_col), n_segments) == segment
            ),
            n_segments, url_col, ts_col, payload_col,
            keep_payload=True,
        )
        .select(
            *ORDER_COLS,
            F.when(
                F.col("record_type") == "response",
                warc_record(F.col("url"), F.col("ts"), F.col("payload")),
            )
            .otherwise(
                revisit_record(
                    F.col("url"),
                    F.col("ts"),
                    F.col("url"),
                    F.col("refers_to_ts"),
                )
            )
            .alias("rec"),
        )
        .orderBy(*ORDER_COLS)
        .select("rec")
        .collect()
    )
    return b"".join(bytes(r["rec"]) for r in rows)
