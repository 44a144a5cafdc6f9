"""Mirror-host detection: site-level dedup via shared content digests.

Web corpora carry whole mirrored SITES — the same content republished
under many hostnames (regional mirrors, parked duplicates, scraper
farms). Page-level dedup removes the copies one by one but never learns
the site-level fact; crawl schedulers want the fact itself, so the
frontier can stop spending politeness budget on a host whose content is
already covered by another. The reference crawls one fixed portal and
cannot meet this problem (/root/reference/src/orchestrators/agency.py
fetches a single catalog); a Common-Crawl-scale frontier meets it on
day one.

Mechanism — the same inverted-index discipline as
``dedup.ngram_jaccard_pairs``, one level up the hierarchy:

- the posting list is (digest → hosts) over DISTINCT (host, digest)
  pairs — how often a host re-captures a page is irrelevant to whether
  the SITE is a copy;
- a hot digest (the empty page, a shared error body, a CMS default —
  content appearing on thousands of hosts) contributes k² join rows and
  carries no mirroring signal; ``max_digest_df`` drops those postings
  BEFORE per-host set sizes are counted, so overlap is measured over
  the informative-digest universe on both sides (identical convention
  to ``dedup._capped_shingles`` — evidence lives in the rare items);
- host pair scores: ``containment`` = shared / min(|A|, |B|) (catches a
  small mirror of a big site) and ``jaccard`` = shared / |A ∪ B| (the
  symmetric score).

Scale shape (10^10 captures, 10^7 hosts): one distinct-pair shuffle on
(host, digest), one digest-keyed self-join whose per-key fan-out is
bounded by ``max_digest_df`` (so worst-case join rows ≤ postings ×
cap), one pair aggregate. Skewed digests are gone by construction; AQE
handles residual host skew like every other host-keyed agg here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def host_digest_sets(
    captures: DataFrame,
    host_col: str = "host",
    digest_col: str = "digest",
    max_digest_df: int | None = None,
) -> DataFrame:
    """(host, digest, sz): the distinct DF-capped posting rows with each
    host's informative-set size riding along as a window count (size is
    functionally dependent on host, so no sizes join-back later)."""
    hd = (
        captures.select(
            F.col(host_col).alias("host"), F.col(digest_col).alias("digest")
        )
        .filter(F.col("digest").isNotNull())
        .distinct()
    )
    if max_digest_df is not None:
        hd = (
            hd.withColumn(
                "_df", F.count(F.lit(1)).over(W.partitionBy("digest"))
            )
            .filter(F.col("_df") <= max_digest_df)
            .drop("_df")
        )
    return hd.withColumn("sz", F.count(F.lit(1)).over(W.partitionBy("host")))


def mirror_host_pairs(
    captures: DataFrame,
    host_col: str = "host",
    digest_col: str = "digest",
    min_shared: int = 5,
    min_containment: float = 0.5,
    max_digest_df: int | None = None,
) -> DataFrame:
    """(host_a, host_b, shared, size_a, size_b, containment, jaccard)
    for every host pair sharing ≥ ``min_shared`` informative digests at
    containment ≥ ``min_containment``; host_a < host_b.

    ``min_shared`` is the noise floor (two hosts coinciding on a couple
    of pages is chance, not mirroring); ``min_containment`` is the
    policy threshold — 0.5 flags half-covered hosts for review, ~0.9
    flags outright mirrors for frontier suppression."""
    hd = host_digest_sets(captures, host_col, digest_col, max_digest_df)
    pairs = (
        hd.alias("l")
        .join(hd.alias("r"), "digest")
        .filter(F.col("l.host") < F.col("r.host"))
        .groupBy(
            F.col("l.host").alias("host_a"),
            F.col("r.host").alias("host_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("shared"),
            F.first("l.sz").alias("size_a"),
            F.first("r.sz").alias("size_b"),
        )
    )
    shared = F.col("shared").cast("double")
    return (
        pairs.withColumn(
            "containment", shared / F.least("size_a", "size_b")
        )
        .withColumn(
            "jaccard",
            shared / (F.col("size_a") + F.col("size_b") - F.col("shared")),
        )
        .filter(
            (F.col("shared") >= min_shared)
            & (F.col("containment") >= min_containment)
        )
    )


def suppressed_hosts(mirror_pairs: DataFrame) -> DataFrame:
    """(host,) — the frontier-suppression set: from each flagged pair,
    keep crawling the LARGER informative set and suppress the smaller
    (ties break to the lexicographically larger name, so exactly one
    side of an equal-size mirror pair survives). One projection + one
    distinct on the compact pairs frame."""
    loser = F.when(
        F.col("size_a") < F.col("size_b"), F.col("host_a")
    ).when(
        F.col("size_b") < F.col("size_a"), F.col("host_b")
    ).otherwise(F.greatest("host_a", "host_b"))
    return mirror_pairs.select(loser.alias("host")).distinct()


def canonical_urls(
    captures: DataFrame,
    url_col: str = "url_canon",
    digest_col: str = "digest",
) -> DataFrame:
    """(digest, canonical_url, n_urls): one representative URL per
    content digest — the URL-level companion to the host-level pair
    table above. When the same bytes live behind many URLs (tracking
    params, mirrors, print views), downstream consumers (CDX lookups,
    training corpora, link rewrites) want ONE address per content;
    the archive convention prefers the simplest stable one.

    Preference order: shortest URL, then fewest query parameters, then
    lexicographic — all deterministic, no fetch-order dependence. ONE
    aggregate on digest via min(struct(...)) — no window, no second
    shuffle; ties cannot survive the final lexicographic key."""
    u = F.col(url_col)
    # the query string is everything after the FIRST '?' (a '?' inside a
    # query value belongs to the query, not to a second one); empty
    # segments from trailing '&' don't count as parameters
    query = F.when(
        F.instr(u, "?") > 0, F.substr(u, F.instr(u, "?") + F.lit(1))
    ).otherwise(F.lit(""))
    n_params = F.size(F.filter(F.split(query, "&"), lambda x: x != ""))
    pick = F.struct(
        F.length(u).alias("len"),
        n_params.alias("np"),
        u.alias("url"),
    )
    return (
        # NULL urls must not win min(struct): a null len field sorts
        # first, yielding canonical_url=NULL for a digest with real URLs
        captures.filter(F.col(digest_col).isNotNull() & u.isNotNull())
        .groupBy(F.col(digest_col).alias("digest"))
        .agg(
            F.min(pick).getField("url").alias("canonical_url"),
            F.countDistinct(url_col).alias("n_urls"),
        )
    )
