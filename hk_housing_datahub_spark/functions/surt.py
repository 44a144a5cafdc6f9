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
