"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Shape is the authoritative `input_hint` from BASELINE.json:
``(url:string, warc_ts:timestamp, html:binary, text:string, lang:string)``.

Design constraints:
- **Deterministic**: every value is a pure function of the row id via
  ``xxhash64`` — no RNG, no wall-clock; same output at any parallelism.
- **Spark-native**: built from ``spark.range(n)`` + Column expressions only,
  so generating a 10^10-row corpus is a linear, fully partitioned job (no
  driver-side loops, no Python UDFs).
- **Zipf host skew**: host_id = floor(n_hosts * u^4) concentrates pages on a
  few hot hosts — deliberately exercises the salted-hash seen-set
  partitioning and AQE skew handling.
- **Messy URL forms**: a slice of rows stores its url with uppercase host,
  explicit ``:443``, a fragment, and unsorted query params — canonicalization
  must collapse them (the stored page is still unique per canonical url).
- **Adversarial text**: CJK for zh rows, control characters on a slice,
  malformed/truncated html on ``id % 37 == 0`` rows (expected text NULL) —
  the byte-identical-extraction invariant is tested against all of these.

Each page embeds listing fields mirroring the reference star schema
(/root/reference/src/models/agency/sql_db.py:129-158 — price, address, area,
tx_date) with "absent/unparseable → NULL, never fail" semantics
(/root/reference/src/models/agency/outputs.py:47-55), plus two outlinks for
frontier discovery (analog of the building-id harvest,
/root/reference/src/processors/agency/estates.py:195-204).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

EPOCH0 = 1_700_000_000  # fixed corpus epoch (no wall-clock anywhere)


def _u(idc: Column, salt: str, mod: int = 1_000_000) -> Column:
    """Deterministic uniform-ish value in [0, 1) derived from (id, salt)."""
    return F.pmod(F.xxhash64(idc, F.lit(salt)), F.lit(mod)) / float(mod)


def _pm(idc: Column, salt: str, mod: int) -> Column:
    """Deterministic integer in [0, mod)."""
    return F.pmod(F.xxhash64(idc, F.lit(salt)), F.lit(mod))


def _host_id(idc: Column, n_hosts: int) -> Column:
    # u^4 → Zipf-ish: ~40% of pages land on the first ~2% of hosts.
    return F.floor(F.lit(n_hosts) * F.pow(_u(idc, "host"), F.lit(4.0))).cast("long")


def _lid(idc: Column) -> Column:
    """Listing id: each listing has a zh-hk page (even id) and an en page (odd)."""
    return F.floor(idc / 2).cast("long")


def _lang(idc: Column) -> Column:
    return F.when(F.pmod(idc, F.lit(2)) == 0, F.lit("zh-hk")).otherwise(F.lit("en"))


def url_for_page(idc: Column, n_hosts: int) -> Column:
    """Clean canonical-form url of page `idc` (used for outlink targets)."""
    return F.format_string(
        "https://h%d.example.com/listing/%d?lang=%s",
        _host_id(idc, n_hosts),
        _lid(idc),
        _lang(idc),
    )


def _stored_url(idc: Column, n_hosts: int) -> Column:
    """Stored url: usually clean, but on id%17==3 a messy-but-equivalent form
    (uppercase host, :443, fragment, query unchanged single-param)."""
    messy = F.format_string(
        "HTTPS://H%d.EXAMPLE.COM:443/listing/%d?lang=%s#top",
        _host_id(idc, n_hosts),
        _lid(idc),
        _lang(idc),
    )
    # Uppercasing the path would change canon; keep path/query case intact.
    messy = F.concat(
        F.lit("https://"),
        F.upper(F.format_string("h%d.example.com", _host_id(idc, n_hosts))),
        F.lit(":443"),
        F.format_string("/listing/%d?lang=%s#top", _lid(idc), _lang(idc)),
    )
    return F.when(F.pmod(idc, F.lit(17)) == 3, messy).otherwise(
        url_for_page(idc, n_hosts)
    )


def generate_pages(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 50,
    partitions: int | None = None,
    filler_listings: int = 0,
    dead_link_every: int = 0,
) -> DataFrame:
    """Build the pages corpus as a lazy DataFrame of exactly `input_hint` shape.

    ``filler_listings`` appends that many extra listing rows (price/address/
    area spans, no anchors) after the content div — modeling the reference's
    real listing-index pages, which carry up to 1000 listings each
    (/root/reference/src/crawlers/agency/estates.py:44 limit=1000). Extraction
    semantics are unchanged (fields = first match, text div unique, outlink
    set unchanged); page bytes and regex-scan work grow ~150 B per filler row,
    which is what makes the scale bench extraction-compute-bound like a real
    Common-Crawl corpus (average page ≈ tens of KB, not 600 B).
    """
    idc = F.col("id")
    df = spark.range(0, n_pages, 1, partitions or spark.sparkContext.defaultParallelism)

    lid = _lid(idc)
    lang = _lang(idc)
    street_no = (F.pmod(lid, F.lit(999)) + 1).cast("long")
    address = F.when(
        lang == "zh-hk", F.format_string("九龍彌敦道%d號", street_no)
    ).otherwise(F.format_string("No. %d Nathan Road, Kowloon", street_no))

    price_num = (F.lit(1_000_000) + _pm(lid, "price", 9_000_000)).cast("long")
    price_cell = F.when(
        F.pmod(lid, F.lit(23)) == 11, F.lit("HK$ 面議")  # "negotiable" → NULL
    ).otherwise(F.format_string("HK$ %,d", price_num))

    area_num = (F.lit(200) + _pm(lid, "area", 1800)).cast("long") + F.lit(0.5)
    area_cell = F.when(F.pmod(lid, F.lit(31)) == 7, F.lit("N/A sq.ft")).otherwise(
        F.format_string("%.1f sq.ft", area_num)
    )

    tx_date = F.date_format(
        F.timestamp_seconds(F.lit(EPOCH0) + _pm(lid, "txd", 2000) * 86400),
        "yyyy-MM-dd",
    )
    date_cell = F.when(F.pmod(lid, F.lit(29)) == 13, F.lit("TBC")).otherwise(tx_date)

    # Body text — the byte-identical extraction target. CJK for zh pages,
    # control chars on a slice (the extractor must pass them through verbatim).
    filler = F.when(
        lang == "zh-hk",
        F.format_string(
            "樓盤編號%d。位於%s，實用面積約%s。近期成交價%s。",
            lid, address, area_cell, price_cell,
        ),
    ).otherwise(
        F.format_string(
            "Listing %d at %s. Saleable area %s. Latest transaction %s on %s.",
            lid, address, area_cell, price_cell, date_cell,
        )
    )
    ctrl = F.when(
        F.pmod(idc, F.lit(101)) == 7, F.lit("\t\x01\x02")
    ).otherwise(F.lit(""))
    body_text = F.when(F.pmod(idc, F.lit(97)) == 5, F.lit("")).otherwise(
        F.concat(filler, ctrl)
    )

    # Outlinks: two deterministic targets (clean form) → frontier discovery.
    t1 = F.pmod(idc * 31 + 7, F.lit(n_pages))
    t2 = F.pmod(idc * 131 + 3, F.lit(n_pages))
    if dead_link_every > 0:
        # A slice of second links points past the corpus — a deterministic
        # "404" population for fetch-retry semantics (reference retries 3×,
        # /root/reference/src/crawlers/base.py:16-45). Trigger residue is
        # min(2, every-1) so every=1 means "every page" and every=2 "every
        # other page" rather than silently never firing.
        residue = min(2, dead_link_every - 1)
        t2 = F.when(
            F.pmod(idc, F.lit(dead_link_every)) == residue, idc + F.lit(n_pages)
        ).otherwise(t2)
    link1 = url_for_page(t1, n_hosts)
    link2 = url_for_page(t2, n_hosts)

    filler = F.lit("")
    if filler_listings > 0:
        # Deterministic extra rows; one format_string then repeat — all
        # JVM-side, no UDFs. Values vary per page via the row hash.
        row_tpl = F.format_string(
            '<div class="listing"><span class="price">HK$ %,d</span>'
            '<span class="address">No. %d Queen\'s Road</span>'
            '<span class="area">%d.0 sq.ft</span>'
            "<time class=\"txdate\">2020-01-01</time></div>",
            (F.lit(2_000_000) + _pm(idc, "fprice", 7_000_000)).cast("long"),
            (_pm(idc, "fno", 999) + 1).cast("long"),
            (_pm(idc, "farea", 1500) + 150).cast("long"),
        )
        filler = F.repeat(row_tpl, filler_listings)

    html_str = F.format_string(
        '<html><head><title>%s</title></head><body>'
        '<div class="listing"><span class="price">%s</span>'
        '<span class="address">%s</span><span class="area">%s</span>'
        '<time class="txdate">%s</time></div>'
        '<div id="content">%s</div>'
        '<a href="%s">n</a><a href="%s">m</a>'
        "%s</body></html>",
        address, price_cell, address, area_cell, date_cell, body_text,
        link1, link2, filler,
    )
    malformed = F.pmod(idc, F.lit(37)) == 0
    html_str = F.when(malformed, F.lit("<html><bo")).otherwise(html_str)
    expected_text = F.when(malformed, F.lit(None).cast("string")).otherwise(body_text)

    warc_ts = F.timestamp_seconds(F.lit(EPOCH0) + _pm(idc, "ts", 10_000_000))

    return df.select(
        _stored_url(idc, n_hosts).alias("url"),
        warc_ts.alias("warc_ts"),
        F.encode(html_str, "UTF-8").alias("html"),
        expected_text.alias("text"),
        lang.alias("lang"),
    )


def generate_seeds(
    spark: SparkSession, n_seeds: int, n_pages: int, n_hosts: int = 50
) -> DataFrame:
    """Wave-0 seed list `(url, priority)` — the first n_seeds even page ids
    (zh pages), priority cycling 0..2 (0 = highest)."""
    idc = F.col("id") * 2  # even ids only
    return (
        spark.range(0, n_seeds)
        .select(
            url_for_page(idc, n_hosts).alias("url"),
            F.pmod(F.col("id"), F.lit(3)).cast("int").alias("priority"),
        )
    )


def generate_robots(spark: SparkSession, n_hosts: int = 50) -> DataFrame:
    """Per-host robots/politeness rules table.

    ``(host, allow, path_prefix, crawl_delay_ms)``; host h{n_hosts-1} is fully
    disallowed; hot host h0 gets a long crawl delay (small per-wave budget).
    """
    hid = F.col("id")
    return spark.range(0, n_hosts).select(
        F.format_string("h%d.example.com", hid).alias("host"),
        (hid != n_hosts - 1).alias("allow"),
        F.lit("/listing/").alias("path_prefix"),
        F.when(hid == 0, F.lit(1000)).otherwise(F.lit(100)).cast("int")
        .alias("crawl_delay_ms"),
    )
