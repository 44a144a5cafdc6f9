"""Soft-404 detection: 200-OK pages that are really error pages.

"Sic transit gloria telae" (Bar-Yossef/Broder/Kumar/Tomkins, WWW 2004):
a large share of the web's "found" pages are soft errors — the server
answers 200 with a "page not found" body — and a crawler that can't
tell loses budget refetching them, pollutes its dedup state with one
giant duplicate class per host, and ships garbage into the corpus. The
reference never meets this (its API either answers or errors,
/root/reference/src/orchestrators/agency.py:139-171); a web-scale
frontier meets it on a double-digit share of hosts.

Two complementary detectors, both pure DataFrame ops:

1. **Probe method** (the paper's): fetch a URL that CANNOT exist
   (``probe_urls`` derives one deterministic random path per host); if
   the host answers with content, that content digest IS the host's
   error signature, and every captured page matching it is a soft-404.
   Precise, costs one fetch per host — schedule the probes as ordinary
   frontier rows.
2. **Log-only heuristics** for hosts without a probe capture: a digest
   behind ≥ ``min_dup_urls`` distinct URLs on one host whose body also
   matches error vocabulary (``DEFAULT_ERROR_REGEX``) — the shape of a
   soft-404 class (many URLs, one short apologetic body) without the
   probe's certainty.

Scale shape (10^10 captures): one (host, digest)-keyed aggregate for
the dominance counts, one broadcast-sized join against the per-host
probe signatures, everything else codegen Columns — no UDF, no
collect. The flag column composes with the trap/mirror/DUST guards'
shared capture log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.urls import url_host

# Java/RE2-portable subset (same discipline as operators/redact.py);
# case-folded by the caller via lower()
DEFAULT_ERROR_REGEX = (
    "(page not found|not be found|404|does not exist"
    "|no longer available|page unavailable)"
)


def probe_urls(
    hosts: DataFrame,
    salt: int = 0,
    host_col: str = "host",
    scheme_col: str | None = None,
) -> DataFrame:
    """(host, probe_url): one deterministically-random path per host
    that no real site plausibly serves — md5(host || salt) under
    ``/__s404_probe__/``. Schedule these as ordinary frontier rows;
    the capture log then carries each answering host's error signature.
    Pure codegen; re-runs with a different ``salt`` give independent
    probes (the paper uses two to confirm).

    ``scheme_col``: optional per-host scheme the host was actually
    discovered under — a probe must be issued on the scheme the host
    serves, or an https-only host never answers it and the guard is
    silently inert for that host. Mixed-scheme hosts fold to one probe
    via max() (prefers https); absent/NULL schemes default to http."""
    h = F.col(host_col)
    if scheme_col is not None:
        keyed = (
            hosts.select(h.alias("host"), F.col(scheme_col).alias("_sch"))
            .groupBy("host")
            .agg(F.max("_sch").alias("_sch"))
        )
        scheme = F.when(
            F.col("_sch").isNull() | (F.col("_sch") == ""), F.lit("http")
        ).otherwise(F.col("_sch"))
    else:
        keyed = hosts.select(h.alias("host")).distinct()
        scheme = F.lit("http")
    return keyed.select(
        "host",
        F.concat(
            scheme,
            F.lit("://"),
            F.col("host"),
            F.lit("/__s404_probe__/"),
            F.md5(F.concat(F.col("host"), F.lit(f":{salt}"))),
        ).alias("probe_url"),
    )


def soft404_signatures(
    captures: DataFrame,
    probes: DataFrame,
    url_col: str = "url",
    digest_col: str = "digest",
) -> DataFrame:
    """(host, digest) error signatures: the digests the probe URLs came
    back with. A host absent here either wasn't probed or (correctly)
    refused the probe — hard-404 hosts need no soft-404 handling."""
    caps = captures.select(
        F.col(url_col).alias("probe_url"),
        F.col(digest_col).alias("digest"),
    )
    return (
        probes.join(caps, "probe_url")
        .select("host", "digest")
        .distinct()
    )


def flag_soft404(
    captures: DataFrame,
    signatures: DataFrame | None = None,
    min_dup_urls: int = 5,
    error_regex: str = DEFAULT_ERROR_REGEX,
    url_col: str = "url",
    digest_col: str = "digest",
    text_col: str = "text",
) -> DataFrame:
    """Input rows plus (host, probe_match, error_text, dominant_dup,
    is_soft404). ``is_soft404`` = probe_match OR (error_text AND
    dominant_dup): the probe alone convicts (it is ground truth for its
    host); the heuristics convict only together — error vocabulary
    appears in real pages ABOUT errors, and legitimate boilerplate
    (cookie walls) duplicates across URLs, but both at once on ≥
    ``min_dup_urls`` distinct URLs is the soft-404 shape. Probe rows
    themselves are flagged too (they are, by construction, soft-404
    captures) — drop them by URL prefix downstream if undesired."""
    host = url_host(F.col(url_col))
    c = captures.withColumn("host", host)
    dom = (
        c.groupBy("host", F.col(digest_col).alias("_dg"))
        .agg(F.countDistinct(url_col).alias("_n_urls"))
        .withColumnRenamed("_dg", digest_col)
    )
    out = c.join(dom, ["host", digest_col], "left").withColumn(
        "dominant_dup", F.coalesce(F.col("_n_urls"), F.lit(0)) >= min_dup_urls
    ).drop("_n_urls")
    out = out.withColumn(
        "error_text",
        F.coalesce(
            F.lower(F.col(text_col)).rlike(error_regex), F.lit(False)
        ),
    )
    if signatures is not None:
        sig = signatures.select(
            "host", F.col("digest").alias(digest_col), F.lit(True).alias("_pm")
        ).distinct()
        # NO broadcast hint: one signature row per answering host is
        # corpus-dependent (10^7 hosts → a forced broadcast OOM); AQE
        # picks broadcast while small, compact-key shuffle when not
        out = out.join(
            sig, ["host", digest_col], "left"
        ).withColumn("probe_match", F.coalesce(F.col("_pm"), F.lit(False))).drop("_pm")
    else:
        out = out.withColumn("probe_match", F.lit(False))
    return out.withColumn(
        "is_soft404",
        F.col("probe_match")
        | (F.col("error_text") & F.col("dominant_dup")),
    )
