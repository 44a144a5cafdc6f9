"""CDX-style URL index over the pages corpus (Common Crawl cdx/cluster.idx).

Common Crawl serves URL lookups from sharded, SORTED cdx files plus a tiny
``cluster.idx`` that maps key ranges to shards; a prefix query touches only
the covering shards. The Spark-native equivalent:

- ``build_cdx_index``: one range-partitioning shuffle on ``surt`` (the
  global sort order), records sorted within each output file, so every
  parquet file covers a contiguous SURT range and its min/max column
  stats ARE the cluster.idx — no side file needed.
- ``cdx_prefix_query`` / ``cdx_domain_query``: a ``startsWith`` predicate
  on the index. Catalyst pushes ``StringStartsWith`` to the parquet scan
  (plan-pinned), and because the files are range-clustered the row-group
  min/max stats skip every non-covering file — the 10^10-row index
  answers a domain query by reading ~one shard, no shuffle, no driver
  metadata beyond the file listing.

Domain semantics come from the SURT order itself: pages of
``example.com`` AND all subdomains are the two contiguous runs
``com,example)…`` and ``com,example,…`` (functions/surt.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.surt import surt_key
from ..functions.urls import canonicalize_url

CDX_COLUMNS = ["surt", "url_canon", "warc_ts", "lang", "digest", "length"]


def cdx_records(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """CDX record per page: SURT key + canonical url + capture metadata.

    ``digest``/``length`` mirror the cdxj payload fields (content digest,
    record size) — computed from the stored body, JVM-side."""
    u = F.col(url_col)
    return pages.select(
        surt_key(u).alias("surt"),
        canonicalize_url(u).alias("url_canon"),
        F.col("warc_ts"),
        F.col("lang"),
        F.md5(F.col("html")).alias("digest"),
        F.length(F.col("html")).cast("long").alias("length"),
    )


def build_cdx_index(
    pages: DataFrame,
    out_path: str,
    n_shards: int = 64,
    url_col: str = "url",
) -> None:
    """Write the sorted, sharded index: ONE range shuffle, files are
    non-overlapping SURT ranges, rows sorted by (surt, warc_ts) within
    each file (captures of one URL stay adjacent and time-ordered)."""
    (
        cdx_records(pages, url_col)
        .repartitionByRange(n_shards, "surt", "warc_ts")
        .sortWithinPartitions("surt", "warc_ts")
        .write.mode("overwrite")
        .parquet(out_path)
    )


def cdx_prefix_query(
    spark: SparkSession, index_path: str, prefix: str
) -> DataFrame:
    """All captures whose SURT starts with ``prefix`` — a pushed-down
    StringStartsWith over range-clustered files (stats skip the rest)."""
    return spark.read.parquet(index_path).filter(
        F.col("surt").startswith(prefix)
    )


def _surt_host_prefix(host: str) -> str:
    labels = host.lower().removeprefix("www.").split(".")
    return ",".join(reversed(labels))


def cdx_domain_query(
    spark: SparkSession,
    index_path: str,
    host: str,
    subdomains: bool = True,
) -> DataFrame:
    """Captures of ``host`` (exact) or of the whole registered domain
    (``subdomains=True``): the two contiguous SURT runs ``h)…`` and
    ``h,…`` — still a pair of pushed-down prefix predicates."""
    p = _surt_host_prefix(host)
    idx = spark.read.parquet(index_path)
    cond = F.col("surt").startswith(p + ")")
    if subdomains:
        cond = cond | F.col("surt").startswith(p + ",")
    return idx.filter(cond)
