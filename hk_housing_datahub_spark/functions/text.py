"""Text-analysis column functions (JVM-side, codegen-friendly).

These are the training-data-pipeline primitives (lang-id, quality scoring,
token counting, fingerprinting, shingling) plus the reference's text
cleaners (whitespace collapse /root/reference/src/processors/rag/embedding.py:82-93,
wiki-markup strip /root/reference/src/processors/wiki/wiki.py:66-77).

Every function is expressible in ANSI SQL with the same semantics so the
DuckDB oracle can verify it; keep the two in lockstep when editing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic language-ID heuristic. Not a real classifier — a fixed,
# documented rule so distributed and oracle runs agree byte-for-byte.
CJK_RE = "[\\u4e00-\\u9fff]"
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "for")


# Sentence terminators: ASCII + CJK full-width (。！？) — a web corpus
# is multilingual, and zh/ja prose never uses ASCII periods. One shared
# constant so the readability battery, the sentence splitter and their
# DuckDB twins can never drift apart.
SENT_BOUNDARY_RE = "[.!?。！？]+"


def normalize_text(text: Column) -> Column:
    """Lowercase, collapse all whitespace runs to one space, trim.

    Mirrors the reference's preprocess step (embedding.py:82-93).
    """
    return F.trim(F.regexp_replace(F.lower(text), "\\s+", " "))


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text."""
    return F.md5(normalize_text(text))


def tokens(text: Column) -> Column:
    """Whitespace tokenization of the normalized text; empty text → []."""
    t = normalize_text(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(
        F.split(t, " ")
    )


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def _count_matches(text: Column, char_class_re: str) -> Column:
    """Number of characters matching a regex class (length-difference trick)."""
    return F.length(text) - F.length(F.regexp_replace(text, char_class_re, ""))


def lang_id(text: Column) -> Column:
    """Deterministic n-gram/char-class language guess.

    Rule (fixed): CJK ratio > 0.05 → 'zh'; else presence of umlauts → 'de';
    French accents → 'fr'; Spanish marks → 'es'; else 'en'.
    """
    t = F.lower(text)
    n = F.greatest(F.length(t), F.lit(1))
    cjk_ratio = _count_matches(t, CJK_RE) / n
    return (
        F.when(cjk_ratio > 0.05, F.lit("zh"))
        .when(_count_matches(t, "[äöüß]") > 0, F.lit("de"))
        .when(_count_matches(t, "[éèêëàâçù]") > 0, F.lit("fr"))
        .when(_count_matches(t, "[ñ¡¿áíóú]") > 0, F.lit("es"))
        .otherwise(F.lit("en"))
    )


def stopword_count(text: Column) -> Column:
    toks = tokens(text)
    in_list = F.filter(toks, lambda x: x.isin(*STOPWORDS))
    return F.size(in_list).cast("long")


def punct_count(text: Column) -> Column:
    return _count_matches(text, "[.,;:!?'\"()-]").cast("long")


def quality_score(text: Column) -> Column:
    """Fixed quality formula over length / punctuation / stopword ratios.

    score = 0.4 * min(n_tokens/100, 1)
          + 0.3 * min(stopword_ratio * 5, 1)
          + 0.3 * (1 - min(punct_ratio * 10, 1))
    rounded to 6 decimals (stable under double arithmetic on both engines).
    """
    n_tok = token_count(text)
    n_tok_safe = F.greatest(n_tok, F.lit(1))
    n_chars = F.greatest(F.length(text), F.lit(1))
    sw_ratio = stopword_count(text) / n_tok_safe
    punct_ratio = punct_count(text) / n_chars
    score = (
        0.4 * F.least(n_tok / F.lit(100.0), F.lit(1.0))
        + 0.3 * F.least(sw_ratio * 5.0, F.lit(1.0))
        + 0.3 * (1.0 - F.least(punct_ratio * 10.0, F.lit(1.0)))
    )
    return F.round(score, 6)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Ordered array of word n-gram shingles of the normalized text.

    Documents shorter than ``n`` tokens yield an empty array.

    The token array is bound through a lambda variable before the per-shingle
    transform. Referencing ``tokens(text)`` directly inside the inner lambda
    would re-run the regex tokenizer once PER SHINGLE (higher-order functions
    are interpreted — no common-subexpression elimination), which measured
    ~4× slower end-to-end on the dedup suite.
    """

    def mk(toks: Column) -> Column:
        k = F.size(toks) - (n - 1)
        return F.when(k <= 0, F.array().cast("array<string>")).otherwise(
            F.transform(
                F.sequence(F.lit(1), k),
                lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
            )
        )

    return F.element_at(F.transform(F.array(tokens(text)), mk), 1)


# wiki-markup cleaning lives in functions/wikitables.py (clean_wiki_markup),
# next to the table parser that consumes it — one copy, one contract.


# Unicode confusables (Cyrillic/Greek lookalikes of Latin letters) — the
# characters spam uses to slip duplicates past exact-hash dedup. A fixed,
# documented subset of UTS #39; ``translate`` maps 1:1 so the fold is a
# single codegen pass and is replayable by any engine with translate().
CONFUSABLE_SRC = "аеорсухіАВЕКМНОРСТХαοεΑΒΕΖΗΙΚΜΝΟΡΤΥΧ"
CONFUSABLE_DST = "aeopcyxiABEKMHOPCTXaoeABEZHIKMNOPTYX"


def fold_confusables(text: Column) -> Column:
    """Fold common Cyrillic/Greek homoglyphs onto their Latin
    lookalikes — run BEFORE normalize/fingerprint when dedup must be
    robust to visual-spoof duplicates ("аbс" vs "abc"). Deliberately
    NOT part of ``normalize_text``: language-ID and tokenizer training
    need the real scripts; only adversarial-dedup keys want the fold."""
    return F.translate(text, CONFUSABLE_SRC, CONFUSABLE_DST)
