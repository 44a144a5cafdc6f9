"""EP2 end-to-end: estate titles → wiki documents, one composed operator.

The reference's ``run_estate_wiki_data_pipeline``
(/root/reference/src/orchestrators/wiki.py:188-208) chains: fuzzy
title-variant page lookup (crawlers/wiki/wiki.py:59-92) → disambiguation
/ relevance page gating (:70-78) → section + subsection text
concatenation (processors/wiki/wiki.py:193-200) → wikitable expansion to
CSV (:114-156) → the RAG chunker consumes the result
(processors/rag/embedding.py:95-140). Each stage exists here as an
independently oracle-checked operator; this module is the composed
pipeline a real user runs — titles in, chunked wiki documents out.

Plan shape: the page corpus is the big side; the title dimension is
small and rides broadcast joins (variant explode ≤6× the titles). The
only Python stages are the two pandas UDFs the stages already own
(wikitable 2-D expansion, sentence-aware chunking); lookup, gating and
section concat stay JVM Column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from ..functions.chunking import chunk_documents
from ..functions.variants import title_variants_basic
from ..functions.wikitables import expand_wikitables, gate_wiki_pages


def estate_wiki_pipeline(
    titles: DataFrame,
    pages: DataFrame,
    title_col: str = "title",
    page_title_col: str = "page_title",
    variants=title_variants_basic,
) -> DataFrame:
    """titles (one column ``title_col``) × pages (``page_title_col``,
    ``categories`` array, ``sections`` array<struct<title,text>>,
    ``wikitext``) → (title, page_title, chunk_index, chunk, chunk_id).

    Stages: first-existing-variant lookup (rank-1 per title, misses drop
    — the reference returns None and skips the estate), page gate,
    section concat, wikitable→CSV expansion appended to the text, chunk.
    """
    exploded = titles.select(
        F.col(title_col),
        F.posexplode(variants(F.col(title_col))).alias(
            "variant_rank", "variant"
        ),
    )
    hits = exploded.join(
        pages, exploded.variant == pages[page_title_col], "inner"
    )
    w = W.partitionBy(title_col).orderBy("variant_rank")
    matched = (
        hits.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "variant_rank", "variant")
    )
    # F15 section concat: main text + subsection texts, newline-joined
    full_body = F.array_join(
        F.transform(F.col("sections"), lambda s: s["text"]), "\n"
    )
    gated = gate_wiki_pages(
        matched.withColumn("body", full_body)
    )
    # F8/F9: expand every wikitable to CSV, deterministic per-doc order
    ex = expand_wikitables(
        gated.select(title_col, "wikitext"), id_col=title_col
    )
    csvs = ex.groupBy(title_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("table_index", "csv"))),
                lambda s: s["csv"],
            ),
            "\n",
        ).alias("_tables_csv")
    )
    docs = gated.join(csvs, title_col, "left").select(
        title_col,
        page_title_col,
        F.concat_ws("\n", F.col("body"), F.col("_tables_csv")).alias("_doc"),
    )
    chunks = chunk_documents(docs, text_col="_doc", id_col=title_col)
    return chunks.join(
        docs.select(title_col, page_title_col), title_col
    ).select(title_col, page_title_col, "chunk_index", "chunk", "chunk_id")
