"""URL canonicalization & partitioning — all JVM-side Column expressions.

The canonicalization contract (mirrors the dedup discipline of the
reference's PK-seen-sets, /root/reference/src/processors/agency/estates.py:87-93,
generalized to URLs per BASELINE.json north_rule):

1. trim surrounding whitespace
2. drop the fragment (first ``#`` onward)
3. lowercase scheme and host
4. drop the default port (``:80`` for http, ``:443`` for https)
5. empty path → ``/``
6. query string: split on ``&``, drop empty params, sort lexicographically,
   rejoin; an empty canonical query drops the ``?``

Everything here is built from ``pyspark.sql.functions`` so Catalyst keeps it
inside whole-stage codegen — no Python in the hot path. The same spec is
implementable in ANSI SQL (see ``__spark_entry__.oracle_sql``), which is how
the driver's DuckDB oracle verifies it.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Number of buckets for the salted seen-set state. At 10^10 URLs with ~64 KiB
# bloom slices per bucket row this is sized so each bucket holds ~1.25M keys;
# raise for a real cluster (config, not code).
DEFAULT_SEEN_BUCKETS = 8192


def _base(url: Column) -> Column:
    return F.regexp_replace(F.trim(url), "#.*$", "")


def url_scheme(url: Column) -> Column:
    return F.lower(F.regexp_extract(_base(url), "^([A-Za-z][A-Za-z0-9+.-]*)://", 1))


def _rest(url: Column) -> Column:
    return F.regexp_replace(_base(url), "^[A-Za-z][A-Za-z0-9+.-]*://", "")


def _hostport(url: Column) -> Column:
    return F.regexp_extract(_rest(url), "^([^/?]*)", 1)


def url_host(url: Column) -> Column:
    """Lowercased host without port — the politeness-budget grouping key."""
    return F.lower(F.regexp_replace(_hostport(url), ":[0-9]+$", ""))


def url_port(url: Column) -> Column:
    return F.regexp_extract(_hostport(url), ":([0-9]+)$", 1)


def url_path(url: Column) -> Column:
    pathq = F.regexp_replace(_rest(url), "^[^/?]*", "")
    path = F.regexp_extract(pathq, "^([^?]*)", 1)
    return F.when(path == "", F.lit("/")).otherwise(path)


def url_query_canon(url: Column) -> Column:
    pathq = F.regexp_replace(_rest(url), "^[^/?]*", "")
    query = F.when(
        pathq.contains("?"), F.regexp_replace(pathq, "^[^?]*\\?", "")
    ).otherwise(F.lit(""))
    parts = F.filter(F.split(query, "&"), lambda x: x != "")
    return F.array_join(F.array_sort(parts), "&")


def nondefault_port(url: Column) -> Column:
    """The port string when it is NOT the scheme default, else '' — THE
    single definition of the default-port table (canonicalize_url and
    functions/surt.py both key origin identity on it)."""
    scheme = url_scheme(url)
    port = url_port(url)
    return F.when(
        (port != "")
        & ~(
            ((scheme == "http") & (port == "80"))
            | ((scheme == "https") & (port == "443"))
        ),
        port,
    ).otherwise(F.lit(""))


def canonicalize_url(url: Column) -> Column:
    """Full canonical form per the module contract."""
    scheme = url_scheme(url)
    host = url_host(url)
    port = nondefault_port(url)
    keep_port = port != ""
    q = url_query_canon(url)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        url_path(url),
        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(F.lit("")),
    )


def url_hash(url_canon: Column) -> Column:
    """64-bit key for the seen-set; xxhash64 is Spark-native and stable."""
    return F.xxhash64(url_canon)


def seen_bucket(url_hash_col: Column, n_buckets: int = DEFAULT_SEEN_BUCKETS) -> Column:
    """Bucket id for the partitioned seen-set state.

    Keyed by url hash, NOT host, so one hot host spreads across all buckets —
    this is the salted-hash partitioning that breaks host skew at the
    seen-set shuffle (the politeness window still groups by host).
    """
    return F.pmod(url_hash_col, F.lit(n_buckets)).cast("int")


def host_salt(url_hash_col: Column, salt_mod: int = 64) -> Column:
    """Extra salt column for shuffles that would otherwise key on a Zipf host."""
    return F.pmod(url_hash_col, F.lit(salt_mod)).cast("int")


def with_url_columns(df, url_col: str = "url", n_buckets: int = DEFAULT_SEEN_BUCKETS):
    """Standard derived columns: url_canon, host, url_hash, bucket."""
    c = F.col(url_col)
    canon = canonicalize_url(c)
    return (
        df.withColumn("url_canon", canon)
        .withColumn("host", url_host(c))
        .withColumn("url_hash", url_hash(F.col("url_canon")))
        .withColumn("bucket", seen_bucket(F.col("url_hash"), n_buckets))
    )
