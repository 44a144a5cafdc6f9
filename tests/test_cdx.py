from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from hk_housing_datahub_spark.functions.surt import surt_host, surt_key
from hk_housing_datahub_spark.functions.urls import url_host
from hk_housing_datahub_spark.sources.cdx import (
    build_cdx_index,
    cdx_domain_query,
    cdx_prefix_query,
)


def test_surt_key_examples(spark):
    cases = [
        ("https://WWW.Example.COM:443/A/B?b=2&a=1#f", "com,example)/a/b?a=1&b=2"),
        ("http://example.com", "com,example)/"),
        ("https://sub.host3.Example.com/X", "com,example,host3,sub)/x"),
        # "x=" is a named-but-empty param: the canonicalization contract
        # (functions/urls.py) drops only fully-empty params, so it stays
        ("http://www.a.b.c:80/p?x=&", "c,b,a)/p?x="),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r["s"] for r in df.select(surt_key(F.col("url")).alias("s")).collect()]
    assert got == [e for _, e in cases]


def test_cdx_index_build_and_domain_query(spark, tmp_path):
    from hk_housing_datahub_spark.datagen import generate_pages

    pages = generate_pages(spark, 1200, n_hosts=10).cache()
    idx_path = str(tmp_path / "cdx")
    build_cdx_index(pages, idx_path, n_shards=8)

    idx = spark.read.parquet(idx_path)
    assert idx.count() == pages.count()

    # exact-host query == direct predicate on the raw corpus
    expect = sorted(
        r["u"]
        for r in pages.filter(url_host(F.col("url")) == "h3.example.com")
        .select(surt_key(F.col("url")).alias("u"))
        .collect()
    )
    got = sorted(
        r["surt"]
        for r in cdx_domain_query(
            spark, idx_path, "h3.example.com", subdomains=False
        ).collect()
    )
    assert got == expect and len(got) > 0

    # registered-domain query covers the whole corpus (every host is a
    # subdomain of example.com)
    assert cdx_domain_query(spark, idx_path, "example.com").count() == (
        pages.count()
    )
    assert (
        cdx_domain_query(spark, idx_path, "example.com", subdomains=False)
        .count()
        == 0
    )

    # files are sorted runs over non-overlapping SURT ranges: the
    # cluster.idx property that lets stats skip non-covering shards
    ranges = []
    for f in sorted(glob.glob(os.path.join(idx_path, "part-*.parquet"))):
        rows = [r["surt"] for r in spark.read.parquet(f).collect()]
        if not rows:
            continue
        assert rows == sorted(rows), f
        ranges.append((rows[0], rows[-1]))
    ranges.sort()
    for (_, hi), (lo, _) in zip(ranges, ranges[1:]):
        assert hi <= lo

    # the prefix predicate reaches the parquet scan
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cdx_prefix_query(spark, idx_path, "com,example,h3)").explain(True)
    plan = buf.getvalue()
    assert "StartsWith" in plan, plan
