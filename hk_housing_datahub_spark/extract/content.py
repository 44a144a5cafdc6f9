"""Main-content extraction — block-level boilerplate removal (jusText /
trafilatura family), fully JVM-side.

The reference extracts FIELDS from known page shapes
(/root/reference/src/processors/agency/transactions.py); a web-scale
corpus also needs the generic step every LLM data pipeline runs first:
keep a page's *content* blocks (paragraphs of prose) and drop its
*boilerplate* blocks (nav bars, link farms, footers). This is the
block-classification heuristic of jusText (Pomikálek 2011) in its
deterministic core: split the page into block-level segments, score each
block's text length, word count and LINK DENSITY (chars of anchor text /
chars of text — nav and footer blocks are mostly links), and keep blocks
that read like prose.

Scale shape: one whole-stage-codegen projection — regexp split into a
block array, `transform()` computes per-block metrics, `filter()` +
`array_join` assemble the content. No UDF, no shuffle, no explode (the
block array never leaves its row). Every expression is RE2-safe (no
backreferences) so the DuckDB twin runs the same regexes byte-for-byte
— classification is pinned hash-exact by the driver oracle.

Thresholds follow jusText's defaults in spirit (length-gate ~ its
``length_low``, link-density gate ~ its ``max_link_density``) but are
deliberately plain: a block is CONTENT iff its tag-stripped text has
``>= min_chars`` chars AND ``>= min_words`` words AND anchor-text chars
``<= max_link_density`` of its chars. Deterministic by construction —
no language models, no context rules — so distributed and single-node
runs agree on every byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Block-level boundaries: opening OR closing forms of the usual block
# tags plus <br>. Non-capturing group keeps split() from interleaving
# capture groups into the result (Java and RE2 agree on this).
BLOCK_SPLIT_RE = (
    "(?i)</?(?:p|div|h[1-6]|li|ul|ol|dl|dt|dd|table|thead|tbody|tr|td|th|"
    "section|article|aside|header|footer|nav|blockquote|pre|figure|"
    "fieldset|form|main|br)(?:\\s[^>]*)?/?>"
)
ANCHOR_TEXT_RE = "(?is)<a[^>]*>(.*?)</a>"
TAG_RE = "<[^>]*>"


def _block_text(b: Column) -> Column:
    """Tag-stripped, whitespace-collapsed text of one block segment."""
    return F.trim(F.regexp_replace(F.regexp_replace(b, TAG_RE, " "), "\\s+", " "))


def _anchor_chars(b: Column) -> Column:
    """Chars of human-visible anchor text in the block (inner tags like
    <b> stripped before counting)."""
    joined = F.array_join(F.regexp_extract_all(b, F.lit(ANCHOR_TEXT_RE), 1), " ")
    return F.length(_block_text(joined))


def content_blocks(html: Column) -> Column:
    """Array of per-block structs (text, chars, words, link_chars,
    is_content) — the scored segmentation, for inspection/tuning."""
    # script/style bodies are never content and their text would poison
    # the metrics; two passes because RE2 (the oracle engine) has no
    # backreferences for a combined <(script|style)>...</\\1>
    clean = F.regexp_replace(
        F.regexp_replace(html, "(?is)<script[^>]*>.*?</script>", " "),
        "(?is)<style[^>]*>.*?</style>",
        " ",
    )
    return F.transform(
        F.split(clean, BLOCK_SPLIT_RE),
        lambda b: _scored(b),
    )


def _scored(b: Column) -> Column:
    t = _block_text(b)
    chars = F.length(t)
    words = F.when(chars == 0, F.lit(0)).otherwise(
        F.size(F.split(t, " "))
    )
    link_chars = F.least(_anchor_chars(b), chars)
    return F.struct(
        t.alias("text"),
        chars.alias("chars"),
        words.alias("words"),
        link_chars.alias("link_chars"),
        (
            (chars >= F.lit(25))
            & (words >= F.lit(5))
            & (link_chars.cast("double") <= 0.4 * chars.cast("double"))
        ).alias("is_content"),
    )


def main_content(html: Column) -> Column:
    """The extracted content: text of the content blocks, newline-joined
    (empty string for a page with no content block)."""
    return F.array_join(
        F.transform(
            F.filter(content_blocks(html), lambda s: s["is_content"]),
            lambda s: s["text"],
        ),
        "\n",
    )


def extract_main_content(
    pages: DataFrame, html_col: str = "html", key_cols: tuple = ("url_canon",)
) -> DataFrame:
    """Per page: the content text plus the block-accounting columns a
    quality dashboard wants. One codegen projection over the scan."""
    blocks = content_blocks(F.col(html_col))
    kept = F.filter(blocks, lambda s: s["is_content"])
    return pages.select(
        *key_cols,
        main_content(F.col(html_col)).alias("content"),
        F.size(blocks).alias("n_blocks"),
        F.size(kept).alias("n_content_blocks"),
        F.aggregate(
            kept, F.lit(0), lambda acc, s: acc + s["chars"]
        ).alias("content_chars"),
        F.aggregate(
            blocks, F.lit(0), lambda acc, s: acc + s["link_chars"]
        ).alias("link_chars_total"),
    )
