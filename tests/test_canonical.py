"""rel=canonical extraction, resolution and chain/cycle folding."""

from __future__ import annotations

from pyspark.sql import functions as F

from hk_housing_datahub_spark.extract.canonical import (
    canonical_aliases,
    canonical_href,
    canonical_target,
    fold_canonicals,
)


def test_extraction_variants_and_resolution(spark):
    rows = [
        (1, "https://a.com/x/y",
         '<link rel="canonical" href="https://b.com/z">'),
        (2, "https://a.com/x/y",
         "<link href='/root' rel='canonical'>"),
        (3, "https://a.com/x/y",
         '<LINK REL="canonical" HREF="//cdn.com/c">'),
        (4, "https://a.com/x/y", '<link rel="canonical" href="sib.html">'),
        (5, "https://a.com/x/y", "<p>none</p>"),
        (6, "https://a.com/x/y", '<link rel="canonical" href="../up">'),
        (7, "https://a.com/x/y",
         '<link rel="canonical" href="mailto:x@y.z">'),
        (8, "https://a.com/x/y",
         '<link rel="stylesheet" href="https://no.com/css">'),
    ]
    df = spark.createDataFrame(rows, ["id", "url", "html"])
    got = {
        r.id: r.c
        for r in df.select(
            "id",
            canonical_target(F.col("html"), F.col("url")).alias("c"),
        ).collect()
    }
    assert got == {
        1: "https://b.com/z",
        2: "https://a.com/root",
        3: "https://cdn.com/c",
        4: "https://a.com/x/sib.html",
        5: None,
        6: None,
        7: None,
        8: None,
    }


def test_fold_resolves_chains_and_keeps_cycles(spark):
    pages = spark.createDataFrame(
        [
            ("https://s.com/a",
             b'<link rel="canonical" href="https://s.com/b">'),
            ("https://s.com/b",
             b'<link rel="canonical" href="https://s.com/c">'),
            ("https://s.com/c", b"<p>terminal</p>"),
            # mutual canonicals: a real-web cycle — both keep their URL
            ("https://s.com/m1",
             b'<link rel="canonical" href="https://s.com/m2">'),
            ("https://s.com/m2",
             b'<link rel="canonical" href="https://s.com/m1">'),
        ],
        ["url_canon", "html"],
    )
    frontier = pages.select("url_canon")
    out = {
        r.url_canon
        for r in fold_canonicals(frontier, pages).collect()
    }
    assert out == {"https://s.com/c", "https://s.com/m1", "https://s.com/m2"}
    # alias edges exclude self-canonical and undeclared pages
    edges = canonical_aliases(pages).collect()
    assert len(edges) == 4


def test_first_declaration_wins_and_bytes_html(spark):
    df = spark.createDataFrame(
        [(1,
          b'<link rel="canonical" href="https://one.com/">'
          b'<link rel="canonical" href="https://two.com/">')],
        ["id", "html"],
    )
    [r] = df.select(
        canonical_href(F.col("html").cast("string")).alias("h")
    ).collect()
    assert r.h == "https://one.com/"
