"""Publish-date extraction from web pages — the htmldate/trafilatura
recipe as pure Columns.

Corpus curation and recrawl scheduling both need a per-page publication
date (freshness-weighted sampling, date-partitioned corpora, the
Cho/Garcia-Molina change-rate prior in operators/recrawl.py). Real
pages expose it through several channels of decreasing trust; the
standard extractor (htmldate, trafilatura, dateparser pipelines) walks
a fallback chain:

1. ``jsonld`` — schema.org ``"datePublished"`` in an ld+json block;
2. ``meta``   — ``<meta property="article:published_time" …>``;
3. ``url``    — a ``/YYYY/MM[/DD]/`` path segment (day defaults to 01);
4. ``text``   — the first ISO date in the visible text.

Every candidate is validated with ``try_to_date`` BEFORE the coalesce,
so a malformed or impossible date (``2021-02-30``) falls through to the
next channel instead of poisoning the chain — the same
conservative-miss contract as extract/structured.py.

Reference semantic target: the reference parses listing transaction
dates out of scraped markup with pandas ``to_datetime`` fallbacks
(/root/reference/src/processors/listing/parser.py); this is that
parse re-expressed as a crawl-scale channel chain.

Scale shape (10^10 pages): one map-only codegen projection — html is
read once, nothing shuffles, no UDFs. All regexes use the shared
RE2-safe subset (``\\d``, character classes, optional groups) so a
DuckDB twin replays them byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# years are sanity-bounded to 19xx/20xx — a "/1234/56/" path segment is
# an id, not a date
YEAR = r"((?:19|20)\d{2})"
JSONLD_DATE_RE = r'"datePublished"\s*:\s*"((?:19|20)\d{2}-\d{2}-\d{2})'
META_DATE_RE = (
    r'<meta property="article:published_time" '
    r'content="((?:19|20)\d{2}-\d{2}-\d{2})'
)
URL_DATE_RE = r"/((?:19|20)\d{2})/(\d{2})(?:/(\d{2}))?/"
TEXT_DATE_RE = r"((?:19|20)\d{2}-\d{2}-\d{2})"


def _validated(candidate: Column) -> Column:
    """'' (regex miss) and impossible dates both become NULL."""
    return F.try_to_date(F.nullif(candidate, F.lit("")))


def extract_publish_date(
    pages: DataFrame,
    html_col: str = "html",
    url_col: str = "url_canon",
    text_col: str | None = "text",
) -> DataFrame:
    """pages → (url, publish_date DATE, date_source) — one row per page.

    ``date_source`` names the channel that won (``jsonld`` > ``meta`` >
    ``url`` > ``text``); both are NULL when no channel yields a valid
    date. Pass ``text_col=None`` to skip the visible-text channel (WAT
    pipelines that never materialize text)."""
    html = F.col(html_col).cast("string")
    c_jsonld = _validated(F.regexp_extract(html, JSONLD_DATE_RE, 1))
    c_meta = _validated(F.regexp_extract(html, META_DATE_RE, 1))
    y = F.regexp_extract(F.col(url_col), URL_DATE_RE, 1)
    m = F.regexp_extract(F.col(url_col), URL_DATE_RE, 2)
    dd = F.regexp_extract(F.col(url_col), URL_DATE_RE, 3)
    c_url = _validated(
        F.when(
            y != "",
            F.concat_ws(
                "-", y, m, F.when(dd == "", F.lit("01")).otherwise(dd)
            ),
        ).otherwise(F.lit(""))
    )
    chain = [("jsonld", c_jsonld), ("meta", c_meta), ("url", c_url)]
    if text_col is not None:
        chain.append(
            ("text", _validated(F.regexp_extract(F.col(text_col), TEXT_DATE_RE, 1)))
        )
    date = F.coalesce(*[c for _, c in chain])
    source = F.coalesce(
        *[F.when(c.isNotNull(), F.lit(name)) for name, c in chain]
    )
    return pages.select(
        F.col(url_col).alias("url"),
        date.alias("publish_date"),
        source.alias("date_source"),
    )
