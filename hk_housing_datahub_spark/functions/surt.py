"""SURT keys — Sort-friendly URI Reordering Transform (Common Crawl CDX).

The index key convention of web archives (IA/Common Crawl cdxj): host
labels reversed and comma-joined, scheme dropped, then ``)`` + lowercased
path + canonical query —

    https://WWW.Example.com:443/A/B?b=2&a=1#f  →  com,example)/a/b?a=1&b=2

so one sorted order clusters every page of a registered domain and all of
its subdomains contiguously (``com,example)…`` < ``com,example,sub)…`` <
``com,exampleX…``), which is what makes prefix scans answer host- and
domain-scoped queries without a shuffle. Composes with
``canonicalize_url``'s contract (functions/urls.py): fragment dropped,
default port dropped, query params sorted, empty path → ``/``.

Pure Column expressions (codegen, SQL-expressible — the DuckDB twin in
__spark_entry__ mirrors it for the hash-checked oracle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .urls import url_host, url_path, url_query_canon


def surt_host(url: Column) -> Column:
    """Reversed, comma-joined host labels; a leading ``www.`` is dropped
    (the archive convention: www and bare host interleave in one run)."""
    host = F.regexp_replace(url_host(url), "^www\\.", "")
    return F.array_join(F.reverse(F.split(host, "\\.")), ",")


def surt_key(url: Column) -> Column:
    """Full SURT: ``rev-host[:port])path[?canonical-query]``, lowercased.

    - The query is canonicalized over the LOWERCASED url so the sort
      order is applied after case folding (sorting first would leave
      ``?a=1&B=2`` and ``?A=1&b=2`` with different keys).
    - A non-default port stays in the key (IA SURT convention:
      ``com,example:8080)`` — a distinct origin must not collide with
      the default-port one)."""
    from .urls import nondefault_port

    # lowering the whole url first: host/path/query all fold together,
    # and parsing is case-structure-independent
    lurl = F.lower(url)
    q = url_query_canon(lurl)
    port = nondefault_port(lurl)  # shared default-port table (urls.py)
    return F.concat(
        surt_host(url),
        F.when(port != "", F.concat(F.lit(":"), port)).otherwise(
            F.lit("")
        ),
        F.lit(")"),
        url_path(lurl),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


# Multi-label public suffixes under which registrations happen one label
# deeper (the publicsuffix.org two-level entries this engine ships with).
# SEAM: this is a representative subset chosen for determinism and
# SQL-twin parity — a deployment swaps in the full Mozilla PSL snapshot
# (same shape: a literal list of suffix strings; wildcard/exception
# rules of the full PSL would extend the CASE below the same way).
MULTI_LABEL_SUFFIXES = [
    "co.uk", "org.uk", "gov.uk", "ac.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn",
    "com.hk", "org.hk", "edu.hk", "gov.hk", "net.hk",
    "com.tw", "org.tw", "edu.tw",
    "com.br", "net.br", "org.br",
    "co.kr", "or.kr", "ac.kr",
    "com.sg", "edu.sg", "gov.sg",
    "co.in", "net.in", "org.in", "ac.in", "gov.in",
    "com.mx", "org.mx", "edu.mx",
    "co.za", "org.za", "ac.za",
    "co.nz", "net.nz", "org.nz",
]


def registrable_domain(url: Column) -> Column:
    """eTLD+1 of the url's host — the unit "one registrant controls".

    Per-domain policies (dominance caps, politeness budgets, mirror
    suppression) grouped by raw host over-split: ``a.example.co.uk``
    and ``b.example.co.uk`` are one registrant, and grouping by the
    last two labels alone would merge EVERY ``*.co.uk`` site into one
    group. Rule: if the last two labels form a known multi-label public
    suffix, the registrable domain is the last THREE labels, else the
    last two; hosts at or below the needed label count (bare suffixes,
    single-label intranet names, IPs-as-hosts) pass through unchanged —
    grouping by a too-coarse key is the conservative failure.

    Pure codegen Columns (split/slice/array_join + one literal IN
    list), SQL-expressible — the oracle twin regenerates the identical
    CASE from ``MULTI_LABEL_SUFFIXES`` so list and twin cannot drift.
    """
    host = F.lower(url_host(url))
    labels = F.split(host, "\\.")
    n = F.size(labels)
    # greatest(…, 1): slice is 1-based and CASE *conditions* evaluate
    # for every row — a single-label host would otherwise feed slice a
    # 0 start and throw under ANSI before the n >= 2 guard is consulted
    last2 = F.array_join(
        F.slice(labels, F.greatest(n - 1, F.lit(1)), 2), "."
    )
    # an IPv4 host has no registrant hierarchy — folding 10.0.0.1 and
    # 172.16.0.1 to a shared '0.1' would merge unrelated servers into
    # one cap/budget group; dotted-quads pass through whole (bracketed
    # IPv6 has no dots, so it already falls through the n >= 2 guard)
    is_ipv4 = host.rlike(r"^[0-9]+(\.[0-9]+){3}$")
    return (
        F.when(is_ipv4, host)
        .when(
            (n >= 3) & last2.isin(*MULTI_LABEL_SUFFIXES),
            F.array_join(F.slice(labels, n - 2, 3), "."),
        )
        .when(n >= 2, last2)
        .otherwise(host)
    )
