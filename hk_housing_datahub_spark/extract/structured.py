"""Structured-data extraction from HTML: JSON-LD (schema.org) blocks
and OpenGraph/meta tags — pure Columns, no UDF.

Real listing sites ship the SAME fields the reference scrapes out of
markup spans (price, address, floor area — /root/reference/src/
processors/listing/parser.py) a second time as machine-readable
schema.org JSON-LD (`<script type="application/ld+json">`) and
OpenGraph `<meta property=… content=…>` tags. A crawl-scale extractor
prefers the structured channel when present (it is versioned, typed
and far more stable than CSS-class regexes) and falls back to the span
extractor (extract/vectorized.py) when not. This module is that
structured channel:

- :func:`extract_jsonld` — one row per ld+json block, document order,
  raw JSON + the schema.org listing projection (type, name, price,
  currency, address). Malformed JSON yields NULL fields, never an
  error (`get_json_object` returns NULL; the DuckDB twin guards with
  `json_valid` for identical semantics).
- :func:`extract_meta_tags` — one row per `<meta property content>`
  pair, document order (the OpenGraph table).
- :func:`listing_from_structured` — the per-URL fallback chain:
  first parseable JSON-LD block's field, else the matching OpenGraph
  property, else NULL; one row per page.

Everything is `regexp_extract_all` + `arrays_zip`/`posexplode` +
`get_json_object` — JVM codegen end to end, riding the html scan with
zero shuffles until the caller aggregates. The block regex uses the
``[^<]*`` body class (not a lazy dot) so the Java and RE2 engines'
match spans are provably identical — the same contract as
functions/anchors.py. Real-world JSON-LD may contain ``<`` inside
strings; such blocks simply don't match and fall through to the span
extractor — a documented conservative miss, never a wrong parse.

Scale shape (10^10 pages): narrow map-only projections; the html
column is read once and never shuffled. The fallback chain is a
groupBy(url) min-struct over block position — one compact-key
aggregate whose payload is the few extracted fields, not the page.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

JSONLD_RE = r'<script type="application/ld\+json">([^<]*)</script>'
META_RE = r'<meta property="([^"]*)" content="([^"]*)"\s*/?>'

# schema.org listing projection: JSONPath → output column
JSONLD_FIELDS = {
    "ld_type": "$['@type']",
    "name": "$.name",
    "price": "$.offers.price",
    "currency": "$.offers.priceCurrency",
    "address": "$.address.streetAddress",
}

# OpenGraph fallbacks for the same fields (product:* is the OG
# commerce vocabulary)
OG_FALLBACKS = {
    "name": "og:title",
    "price": "product:price:amount",
    "currency": "product:price:currency",
    "address": "og:street-address",
}


def extract_jsonld(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
) -> DataFrame:
    """pages → one row per ld+json block:
    (url, pos, json_raw, ld_type, name, price, currency, address).

    ``pos`` is the 0-based document-order block index. A page with no
    blocks emits no rows; a malformed block emits its row with NULL
    extracted fields (the raw text is kept for audit)."""
    html = F.col(html_col).cast("string")
    rows = pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(
            F.regexp_extract_all(html, F.lit(JSONLD_RE), 1)
        ).alias("pos", "json_raw"),
    )
    return rows.select(
        "url",
        "pos",
        "json_raw",
        *[
            F.get_json_object("json_raw", path).alias(out)
            for out, path in JSONLD_FIELDS.items()
        ],
    )


def extract_meta_tags(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
) -> DataFrame:
    """pages → one row per meta tag: (url, pos, property, content) in
    document order — the raw OpenGraph table."""
    html = F.col(html_col).cast("string")
    pairs = F.arrays_zip(
        F.regexp_extract_all(html, F.lit(META_RE), 1).alias("p"),
        F.regexp_extract_all(html, F.lit(META_RE), 2).alias("c"),
    )
    return pages.select(
        F.col(url_col).alias("url"),
        F.posexplode(pairs).alias("pos", "m"),
    ).select(
        "url",
        "pos",
        F.col("m.p").alias("property"),
        F.col("m.c").alias("content"),
    )


def _first_by_pos(col: str) -> Column:
    """First non-NULL value in document order as one aggregate:
    min(struct(pos, v)) over rows where v is non-NULL."""
    return F.min(
        F.when(
            F.col(col).isNotNull(),
            F.struct(F.col("pos"), F.col(col).alias("v")),
        )
    ).getField("v")


def listing_from_structured(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
) -> DataFrame:
    """One row per page: the structured listing fields with the
    JSON-LD-first / OpenGraph-fallback chain applied per FIELD (a page
    whose JSON-LD block parses but lacks a price still takes the price
    from its meta tags). ``price`` is surfaced both raw (string, as
    published) and as ``price_num`` (try_cast to double — ANSI-safe on
    junk). ``src_jsonld`` flags whether ANY JSON-LD field won."""
    ld = (
        extract_jsonld(pages, html_col, url_col)
        .groupBy("url")
        .agg(
            *[
                _first_by_pos(out).alias(f"ld_{out}")
                for out in ("name", "price", "currency", "address")
            ]
        )
    )
    og_rows = extract_meta_tags(pages, html_col, url_col)
    og = (
        og_rows.filter(
            F.col("property").isin(list(OG_FALLBACKS.values()))
        )
        .groupBy("url")
        .pivot("property", list(OG_FALLBACKS.values()))
        .agg(F.min(F.struct("pos", "content")).getField("content"))
    )
    base = pages.select(F.col(url_col).alias("url"))
    out = base.join(ld, "url", "left").join(og, "url", "left")
    fields = {
        out_col: F.coalesce(
            F.col(f"ld_{out_col}"), F.col(f"`{og_prop}`")
        )
        for out_col, og_prop in OG_FALLBACKS.items()
    }
    return out.select(
        "url",
        fields["name"].alias("name"),
        fields["price"].alias("price"),
        fields["price"].try_cast("double").alias("price_num"),
        fields["currency"].alias("currency"),
        fields["address"].alias("address"),
        (
            F.col("ld_name").isNotNull()
            | F.col("ld_price").isNotNull()
            | F.col("ld_currency").isNotNull()
            | F.col("ld_address").isNotNull()
        ).alias("src_jsonld"),
    )
