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

    ``digest`` is the content digest of the stored body; ``length`` is
    the PAYLOAD byte count (octet_length — correct for string bodies
    too). The cdxj "record length" — the full WARC record's bytes, what
    a segment slice needs — is what ``cdx_records_with_locations``
    emits; don't mix the two when accounting storage."""
    u = F.col(url_col)
    return pages.select(
        surt_key(u).alias("surt"),
        canonicalize_url(u).alias("url_canon"),
        F.col("warc_ts"),
        F.col("lang"),
        F.md5(F.col("html")).alias("digest"),
        F.octet_length(F.col("html")).cast("long").alias("length"),
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
    (``subdomains=True``): the contiguous SURT runs ``h)…`` and ``h:…``
    (non-default-port origins of the same host — surt_key keeps the
    port) and, with subdomains, ``h,…`` — all pushed-down prefixes."""
    p = _surt_host_prefix(host)
    idx = spark.read.parquet(index_path)
    cond = F.col("surt").startswith(p + ")") | F.col("surt").startswith(
        p + ":"
    )
    if subdomains:
        cond = cond | F.col("surt").startswith(p + ",")
    return idx.filter(cond)


def _ts_lit(t) -> F.Column:
    """Timestamp literal from an epoch-seconds int (timezone-proof — the
    constructed histories use epochs) or an ISO string (session-tz cast)."""
    if isinstance(t, (int, float)):
        return F.timestamp_seconds(F.lit(int(t)))
    return F.lit(t).cast("timestamp")


def cdx_snapshot_diff(
    captures: DataFrame,
    t0,
    t1,
    url_col: str = "url_canon",
    ts_col: str = "warc_ts",
    digest_col: str = "digest",
) -> DataFrame:
    """Crawl-to-crawl change classification from capture history.

    The standard consumer question over a CDX index ("what changed between
    the May and June crawls?"): compare, per URL, the latest capture at or
    before ``t0`` against the latest at or before ``t1`` (timestamp
    literals, ``t0 < t1``) and classify:

    - ``new``       — first capture falls in (t0, t1];
    - ``changed``   — captured in the window and the latest content digest
                      differs from the t0 snapshot's;
    - ``refreshed`` — captured in the window, digest identical (the
                      recrawl confirmed freshness; Cho/GM "no change"
                      observation, operators/recrawl.py feeds on these);
    - ``stale``     — known at t0 but not re-captured in the window.

    URLs first captured after ``t1`` don't exist in either snapshot and
    are excluded. Output: url, status, digest_t0, digest_t1,
    captures_in_window.

    Scale: ONE groupBy on the url — per-URL state is two (ts, digest)
    structs and a count, so 10^10 URLs is a routine compact-key agg;
    ``max(when(...))`` keeps the snapshot selection inside the partial
    aggregate (struct max orders by ts first). Over the sorted CDX index
    (build_cdx_index) AQE sees near-sorted input; no window function is
    needed. SQL-expressible — the ``cdx_snapshot_diff`` oracle twin
    mirrors it with two arg-max CTEs.
    """
    u, ts, dg = F.col(url_col), F.col(ts_col), F.col(digest_col)
    lt0, lt1 = _ts_lit(t0), _ts_lit(t1)
    cap = F.struct(ts.alias("ts"), dg.alias("digest"))
    per = (
        captures.filter(ts <= lt1)
        .groupBy(u.alias("url"))
        .agg(
            F.max(F.when(ts <= lt0, cap)).alias("s0"),
            F.max(cap).alias("s1"),
            F.sum(F.when(ts > lt0, 1).otherwise(0)).alias(
                "captures_in_window"
            ),
        )
    )
    d0 = F.col("s0.digest")
    d1 = F.col("s1.digest")
    status = (
        # the STRUCT is null iff no pre-t0 capture exists — testing the
        # digest would misread a known capture with a NULL digest (e.g.
        # md5 of a NULL body) as "new"; eqNullSafe keeps NULL↔non-NULL
        # digest transitions classified as changes
        F.when(F.col("s0").isNull(), F.lit("new"))
        .when(F.col("captures_in_window") == 0, F.lit("stale"))
        .when(~d0.eqNullSafe(d1), F.lit("changed"))
        .otherwise(F.lit("refreshed"))
    )
    return per.select(
        "url",
        status.alias("status"),
        d0.alias("digest_t0"),
        d1.alias("digest_t1"),
        F.col("captures_in_window").cast("long").alias(
            "captures_in_window"
        ),
    )


def cdx_records_with_locations(
    pages: DataFrame,
    n_segments: int = 16,
    url_col: str = "url",
) -> DataFrame:
    """Full cdxj rows: the CDX payload fields of ``cdx_records`` plus the
    WARC pointer columns (segment, offset, length — ``length`` here is
    the RECORD length, the cdxj meaning). Composes ``warc.locate_records``
    — the ONE definition of segment assignment, in-segment order and
    offsets — so these pointers always address the bytes
    ``warc.render_segment`` produces."""
    from .warc import locate_records

    u = F.col(url_col)
    return locate_records(
        pages,
        n_segments=n_segments,
        url_col=url_col,
        extra={
            "url_canon": canonicalize_url(u),
            "lang": F.col("lang"),
        },
    ).select(
        "surt",
        "url_canon",
        F.col("ts").alias("warc_ts"),
        "lang",
        "digest",
        "segment",
        "offset",
        "length",
    )


def cdx_latest(
    captures: DataFrame,
    url_col: str = "url_canon",
    ts_col: str = "warc_ts",
) -> DataFrame:
    """The "latest index" view (Common Crawl's collapsed cdx): one row
    per URL — its most recent capture, all columns carried. ONE
    compact-key aggregate: max_by over the full row struct keyed by
    (ts, row) keeps selection inside the partial aggregate (same shape
    as cdx_snapshot_diff, no window). Ties on ts break by the row
    struct's remaining fields, deterministically."""
    cols = captures.columns
    row = F.struct(
        F.col(ts_col).alias("_ts"),
        *[F.col(c) for c in cols if c != ts_col],
    )
    latest = (
        captures.groupBy(F.col(url_col).alias("_u"))
        .agg(F.max(row).alias("r"))
    )
    return latest.select(
        *[
            (
                F.col("r._ts") if c == ts_col else F.col(f"r.{c}")
            ).alias(c)
            for c in cols
        ]
    )
