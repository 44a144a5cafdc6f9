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
    """Full SURT: ``rev-host)path[?canonical-query]``, lowercased."""
    q = url_query_canon(url)
    return F.concat(
        surt_host(url),
        F.lit(")"),
        F.lower(url_path(url)),
        F.when(q != "", F.concat(F.lit("?"), F.lower(q))).otherwise(
            F.lit("")
        ),
    )
