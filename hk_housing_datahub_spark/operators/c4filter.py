"""C4 cleaning rules (Raffel et al. 2020, "Exploring the Limits of
Transfer Learning with a Unified Text-to-Text Transformer", §2.2).

The C4 recipe's heuristic cleanup, re-expressed as pure codegen
Columns (zero shuffles — every rule is a per-row projection):

- **Line policy**: keep only lines that end in a terminal punctuation
  mark, have at least ``min_words`` words, and do not contain the word
  "javascript".
- **Page policy** (on the RAW page, before line filtering): drop pages
  containing any word from a bad-words lexicon, the phrase
  "lorem ipsum", or a curly brace (code marker); after line filtering,
  drop pages with fewer than ``min_sentences`` sentences.

The reference engine has no corpus-cleaning surface — the semantic
target is the published recipe, sitting alongside the Gopher gates
(``textops.gopher_quality_flags``) and the CCNet line-DF boilerplate
removal (``textops.drop_boilerplate_lines``) as the third classic
web-text cleaning policy.

Scale design: the literal-lexicon path compiles the bad-words check
into a word-boundary regex (fine for the C4 lexicon's ~2k words split
across a few alternation groups; whole-stage codegen, map-only). For
lexicons too large to inline (RefinedWeb's 4.6M blocked domains),
``badword_hits_join`` is the join path: tokens explode into a
broadcast (or shuffle, if the lexicon outgrows broadcast) semi-join
and fold back to one row per document — one compact-key exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# terminal punctuation per C4: period, exclamation, question, quote
_TERMINAL = ('.', '!', '?', '"')


def c4_clean_lines(text: Column, min_words: int = 5) -> Column:
    """The kept lines of ``text`` re-joined with newlines: a line
    survives iff it ends in terminal punctuation, has >= min_words
    whitespace words, and does not contain the word ``javascript``."""
    lines = F.split(text, "\n")
    kept = F.filter(
        lines,
        lambda l: (
            F.trim(l).rlike(r'[.!?"]$')
            & (F.size(F.filter(F.split(F.trim(l), r"\s+"), lambda w: w != F.lit(""))) >= min_words)
            & ~F.lower(l).rlike(r"(^|[^a-z])javascript([^a-z]|$)")
        ),
    )
    return F.array_join(kept, "\n")


def _badword_regex(badwords: tuple[str, ...] | list[str]) -> str:
    """Word-boundary alternation over the lexicon. C4 matches WORDS, not
    substrings — 'dup' must not convict 'duplicate'."""
    alts = "|".join(sorted(badwords))
    return rf"(^|[^a-z0-9])({alts})([^a-z0-9]|$)"


def c4_page_flags(
    docs: DataFrame,
    badwords: tuple[str, ...] | list[str] = (),
    text_col: str = "text",
    min_words: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """Input rows + the C4 verdict columns:

    ``cleaned_text`` (line policy applied), ``n_sentences`` (terminal
    punctuation marks in the cleaned text), ``has_badword`` /
    ``has_lorem`` / ``has_brace`` (raw-page gates), and ``kept``.
    Map-only: one codegen projection, no exchange (plan-pinned)."""
    raw = F.col(text_col)
    low = F.lower(raw)
    cleaned = c4_clean_lines(raw, min_words)
    has_bad = (
        low.rlike(_badword_regex(badwords)) if badwords else F.lit(False)
    )
    out = docs.withColumns(
        {
            "cleaned_text": cleaned,
            "n_sentences": F.regexp_count(cleaned, F.lit(r'[.!?"]')),
            "has_badword": has_bad,
            "has_lorem": low.contains("lorem ipsum"),
            "has_brace": raw.contains("{"),
        }
    )
    return out.withColumn(
        "kept",
        (F.col("n_sentences") >= min_sentences)
        & ~F.col("has_badword")
        & ~F.col("has_lorem")
        & ~F.col("has_brace"),
    )


def badword_hits_join(
    docs: DataFrame,
    lexicon: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    word_col: str = "word",
) -> DataFrame:
    """(id, badword_hits) for every input row — the large-lexicon path.
    Tokens explode once, join the lexicon (broadcast when small; Spark
    falls back to a shuffle join when the lexicon side outgrows the
    broadcast threshold — no forced hint, the lexicon is caller data),
    and fold back per document. Docs with zero hits keep a 0 row."""
    toks = docs.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"[^a-z0-9]+"),
                lambda t: t != F.lit(""),
            )
        ).alias("_t"),
    )
    lex = lexicon.select(F.lower(F.col(word_col)).alias("_t")).distinct()
    hits = (
        toks.join(lex, "_t")
        .groupBy(id_col)
        .agg(F.count("*").alias("badword_hits"))
    )
    return (
        docs.select(id_col)
        .join(hits, id_col, "left")
        .withColumn("badword_hits", F.coalesce("badword_hits", F.lit(0)))
    )
