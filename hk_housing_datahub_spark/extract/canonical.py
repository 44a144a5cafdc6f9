"""rel=canonical extraction and application — URL-space folding by the
page's OWN declaration.

DUST rules (operators/dust.py) infer alias patterns from observed
duplicate content; redirects (operators/redirects.py) fold what the
server declares at fetch time. The third dedup channel on the real web
is the page declaring its canonical URL in markup:
``<link rel="canonical" href="...">``. Honoring it folds session-id /
tracking-param / pagination variants onto one representative BEFORE
content hashing ever runs, and search-engine-grade crawlers treat it as
a strong hint.

Everything is codegen ``regexp_extract`` with RE2-safe patterns (no
backreferences, no lookarounds), so the DuckDB oracle replays the exact
extraction byte-for-byte. Both attribute orders and both quote styles
are matched; resolution handles absolute, scheme-relative,
path-absolute and plain directory-relative hrefs (``..`` traversal and
other exotica resolve to NULL — a crawler treats an unresolvable
canonical as absent, never as a guess).

Chains (A declares B canonical, B declares C) and cross-declarations
compose through the EXISTING redirect machinery: ``canonical_aliases``
emits (src, dst) edges in ``resolve_redirects``'s contract, pointer
doubling finds terminals, cycles (A↔B mutual canonicals — common in the
wild) come back flagged and keep their own URL via ``apply_aliases``.

Reference semantic target: the reference crawls a curated catalog where
URL identity is by construction (/root/reference/src/crawlers/); the
open web needs declared-canonical folding before any seen-set or dedup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.urls import canonicalize_url, url_host, url_scheme

# RE2-safe: [^>]* never crosses the tag, [^"'>]+ never crosses the quote
_REL_HREF = (
    "(?i)<link[^>]*rel\\s*=\\s*[\"']canonical[\"']"
    "[^>]*href\\s*=\\s*[\"']([^\"'>]+)[\"']"
)
_HREF_REL = (
    "(?i)<link[^>]*href\\s*=\\s*[\"']([^\"'>]+)[\"']"
    "[^>]*rel\\s*=\\s*[\"']canonical[\"']"
)


def canonical_href(html: Column) -> Column:
    """The raw declared href (first match, either attribute order),
    NULL when the page declares none."""
    a = F.nullif(F.regexp_extract(html, _REL_HREF, 1), F.lit(""))
    b = F.nullif(F.regexp_extract(html, _HREF_REL, 1), F.lit(""))
    return F.coalesce(a, b)


def resolve_href(href: Column, base_url: Column) -> Column:
    """href -> absolute URL against the page URL: absolute http(s) pass
    through, ``//host/...`` takes the base scheme, ``/path`` takes the
    base origin, a plain relative joins the base directory; anything
    else (``..``, other schemes, empty) is NULL."""
    scheme = url_scheme(base_url)
    origin = F.concat(scheme, F.lit("://"), url_host(base_url))
    base_dir = F.regexp_replace(base_url, "[^/]*$", "")
    return (
        F.when(href.isNull(), F.lit(None).cast("string"))
        .when(href.rlike("(?i)^https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, F.lit(":"), href))
        .when(href.startswith("/"), F.concat(origin, href))
        .when(
            href.rlike("^[A-Za-z0-9]") & ~href.contains("..")
            & ~href.contains(":"),
            F.concat(base_dir, href),
        )
        .otherwise(F.lit(None).cast("string"))
    )


def canonical_target(html: Column, base_url: Column) -> Column:
    """Canonicalized absolute canonical URL, NULL when absent or
    unresolvable."""
    resolved = resolve_href(canonical_href(html), base_url)
    return F.when(
        resolved.isNotNull(), canonicalize_url(resolved)
    )


def canonical_aliases(
    pages: DataFrame,
    url_col: str = "url_canon",
    html_col: str = "html",
) -> DataFrame:
    """(src_url, dst_url) edges for pages declaring a canonical other
    than themselves — ``resolve_redirects``'s input contract, so chains
    and cycles resolve with the same pointer doubling as server
    redirects. One codegen projection + a filter; nothing shuffles."""
    tgt = canonical_target(
        F.col(html_col).cast("string"), F.col(url_col)
    )
    return (
        pages.select(
            F.col(url_col).alias("src_url"), tgt.alias("dst_url")
        )
        .filter(
            F.col("dst_url").isNotNull()
            & (F.col("dst_url") != F.col("src_url"))
        )
    )


def fold_canonicals(
    df: DataFrame,
    pages: DataFrame,
    url_col: str = "url_canon",
    html_col: str = "html",
    max_rounds: int = 6,
) -> DataFrame:
    """Rewrite ``df``'s URLs through the pages' declared canonicals
    (chains resolved, cycles kept as-is) — compose before seen-set or
    content dedup."""
    from ..operators.redirects import apply_aliases, resolve_redirects

    resolved = resolve_redirects(
        canonical_aliases(pages, url_col, html_col),
        max_rounds=max_rounds,
    )
    return apply_aliases(df, resolved, url_col=url_col)
