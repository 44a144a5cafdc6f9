"""Document profiling operators over the `documents` table.

The text-analysis battery a training-data pipeline runs before filtering:
language-ID, quality scoring, token counting, fingerprinting — all thin
compositions of functions/text.py Column expressions (JVM-side), each with a
DuckDB oracle in __spark_entry__.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import (
    SENT_BOUNDARY_RE,
    fingerprint,
    lang_id,
    punct_count,
    quality_score,
    stopword_count,
    token_count,
)


def profile_documents(
    docs: DataFrame, passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document profile row: id, predicted lang, tokens, quality, fp.

    ``passthrough`` carries extra input columns into the profile in the same
    scan — callers must not join the profile back to the corpus to recover a
    column that was already in hand (that is a second full-corpus shuffle at
    scale).
    """
    t = F.col("text")
    return docs.select(
        "doc_id",
        "lang",
        *passthrough,
        lang_id(t).alias("pred_lang"),
        token_count(t).alias("n_tokens"),
        stopword_count(t).alias("n_stopwords"),
        punct_count(t).alias("n_punct"),
        quality_score(t).alias("quality"),
        fingerprint(t).alias("fp"),
    )


def quality_by_source(docs: DataFrame) -> DataFrame:
    """Corpus-health rollup: per source, doc count + rounded mean quality and
    token stats (the filter-threshold dashboard query)."""
    p = profile_documents(docs, passthrough=("source",))
    return p.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
        F.sum("n_tokens").alias("total_tokens"),
    )


def lang_confusion(docs: DataFrame) -> DataFrame:
    """(actual lang, predicted lang) counts — the lang-ID evaluation query."""
    return (
        docs.select("lang", lang_id(F.col("text")).alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def gopher_quality_flags(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-rules-style document filters (Rae et al. 2021, §A1.1) as one
    codegen projection — the standard web-corpus gate battery. Each flag
    is True when the document VIOLATES the rule; ``gopher_pass`` ANDs the
    negations. Pure Column expressions over one scan: at 100 TB this adds
    zero shuffles to a corpus pipeline.

    Rules (fixed, documented thresholds — determinism over tunability):
    - word count outside [50, 100000]
    - mean word length outside [3, 10] chars
    - symbol-to-word ratio > 0.1  (# and … stand in for the symbol class)
    - > 90% of lines start with a bullet character
    - duplicate 3-gram fraction > 0.3 (within-document repetition)
    """
    from ..functions.text import tokens, word_shingles

    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks)
    n_words_safe = F.greatest(n_words, F.lit(1))
    mean_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    ) / n_words_safe
    symbols = F.length(t) - F.length(F.regexp_replace(t, "[#…]", ""))
    lines = F.split(t, "\n")
    bullet_lines = F.size(
        F.filter(lines, lambda l: F.ltrim(l).rlike("^[-*•]"))
    )
    n_lines_safe = F.greatest(F.size(lines), F.lit(1))
    sh = word_shingles(t, 3)
    n_sh = F.size(sh)
    dup_frac = F.when(n_sh <= 0, F.lit(0.0)).otherwise(
        (n_sh - F.size(F.array_distinct(sh))) / n_sh
    )
    out = docs.select(
        "*",
        (n_words < 50) | (n_words > 100_000),
        (mean_len < 3) | (mean_len > 10),
        (symbols / n_words_safe > 0.1),
        (bullet_lines / n_lines_safe > 0.9),
        (dup_frac > 0.3),
    )
    names = [
        "flag_word_count",
        "flag_mean_word_len",
        "flag_symbol_ratio",
        "flag_bullet_lines",
        "flag_repetition",
    ]
    base = docs.columns
    out = out.toDF(*base, *names)
    gate = None
    for n in names:
        c = ~F.col(n)
        gate = c if gate is None else gate & c
    return out.withColumn("gopher_pass", gate)


def drop_boilerplate_lines(
    docs: DataFrame,
    max_line_df: int = 5,
    min_line_chars: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    per_col: str | None = None,
) -> DataFrame:
    """CCNet-style line-level dedup: a line appearing (normalized) in more
    than ``max_line_df`` documents is boilerplate — navigation, footers,
    cookie banners — and is dropped from EVERY document; remaining lines
    are rejoined in their original order. Lines shorter than
    ``min_line_chars`` are kept unconditionally (hubs like '-' or blank
    separators are structure, not boilerplate; counting them would also
    make the DF side needlessly hot).

    Shape at 100 TB: posexplode lines → hash → one aggregate for the
    document-frequency per line-hash (map-side combined; only 8-byte
    hashes shuffle, never text) → anti-join the hot-hash set back →
    group back by doc with order restored via the kept positions.

    The hot-set join carries NO broadcast hint on purpose: with a small
    ``max_line_df`` at web scale the set of lines appearing in more than
    a handful of documents is every common sentence on the web — far too
    large to pin to the driver. AQE decides at runtime from the hot
    set's ACTUAL size: a genuinely tiny boilerplate set converts to a
    broadcast join for free, a huge one falls back to one compact-key
    shuffle on ``lhash`` (8-byte key; the line text rides the exchange
    exactly once, into the same partitioning the regroup reuses).

    ``per_col`` scopes the whole mechanism to a grouping column (host,
    source): document frequency is counted WITHIN the group and a hot
    line drops only from that group's documents — the site-template
    semantics (trafilatura's per-site dedup; CCNet dedups per shard for
    the same reason). The distinction matters in both directions: a
    navigation line on one 10k-page site is template noise there but
    must not be stripped from a blog that quotes it once, and a
    sentence that is common ACROSS the web while rare on each single
    site is content, not template. Cost is identical — the DF aggregate
    and the hot join just carry the group key alongside the 8-byte line
    hash.
    """
    group = [per_col] if per_col else []
    lines = docs.select(
        F.col(id_col),
        *group,
        F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line"),
    ).withColumn("lhash", F.xxhash64(F.trim(F.lower(F.col("line")))))
    countable = lines.filter(F.length(F.trim("line")) >= min_line_chars)
    hot = (
        countable.groupBy(*group, "lhash")
        .agg(F.countDistinct(id_col).alias("df"))
        .filter(F.col("df") > max_line_df)
        .select(*group, "lhash")
    )
    kept = lines.join(
        hot.withColumn("_hot", F.lit(True)), group + ["lhash"], "left"
    ).filter(
        F.col("_hot").isNull()
        | (F.length(F.trim("line")) < min_line_chars)
    )
    rebuilt = kept.groupBy(id_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("pos", "line"))
                ),
                lambda s: s["line"],
            ),
        ).alias(text_col)
    )
    # LEFT join + coalesce: a doc whose every line was boilerplate keeps
    # its row with EMPTY text (the quality gate downstream drops it with
    # honest funnel accounting) — this operator drops lines, never docs
    return docs.drop(text_col).join(rebuilt, id_col, "left").withColumn(
        text_col, F.coalesce(F.col(text_col), F.lit(""))
    )


def dedup_paragraphs(
    docs: DataFrame,
    keep: str = "first",
    min_chars: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style CROSS-CORPUS exact paragraph dedup (Wenzek et al.
    2020 §3.1; the stage before line-DF boilerplate removal): a
    paragraph whose normalized form appears at more than one
    ``(doc, position)`` in the corpus is a duplicate. ``keep="first"``
    keeps only the globally-first occurrence (min ``(doc_id, pos)`` —
    deterministic under any partitioning); ``keep="none"`` drops every
    copy. Normalization mirrors CCNet's hash key: lowercase, collapsed
    whitespace, digits squashed to ``0``. Paragraphs shorter than
    ``min_chars`` are structure, not content — kept unconditionally and
    never counted. Paragraph = a ``\\n\\n``-separated span; the rebuild
    normalizes separators to ``\\n\\n``.

    Differs from :func:`drop_boilerplate_lines` (DF-threshold LINE
    removal, drops from every doc including the first) — this is the
    exact-duplicate stage: content seen once survives exactly once.

    Shape at 100 TB: posexplode → xxhash64 over the normalized span (the
    8-byte hash is the only wide-exchange key) → one map-combined
    aggregate per hash carrying ``count`` + ``min_by struct(doc_id,
    pos)`` → equi-join the verdict back on hash → regroup by doc with
    order restored. Two text exchanges total (hash join, doc regroup),
    identical to the boilerplate pass it composes with. Collision note:
    a 64-bit hash over 10^12 paragraphs expects ~0.03 false merges —
    the standard CCNet trade (their sha1[:8] is the same 64 bits).

    Funnel accounting: adds ``n_paras`` / ``n_dropped_paras`` columns
    (docs whose every paragraph was dropped keep their row with empty
    text, same contract as the boilerplate pass).
    """
    if keep not in ("first", "none"):
        raise ValueError(f"keep must be 'first' or 'none', got {keep!r}")
    norm = F.regexp_replace(
        F.regexp_replace(F.trim(F.lower(F.col("para"))), r"\s+", " "),
        r"[0-9]",
        "0",
    )
    paras = docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), "\n\n")).alias("pos", "para"),
    ).withColumn("phash", F.xxhash64(norm))
    countable = paras.filter(F.length(F.trim("para")) >= min_chars)
    verdict = countable.groupBy("phash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.min(F.struct(F.col(id_col).alias("d"), F.col("pos").alias("p"))).alias(
            "winner"
        ),
    )
    joined = paras.join(verdict, "phash", "left")
    short = F.length(F.trim("para")) < min_chars
    if keep == "first":
        keep_cond = short | (
            (F.col(f"winner.d") == F.col(id_col))
            & (F.col("winner.p") == F.col("pos"))
        )
    else:
        keep_cond = short | (F.col("n_copies") == 1)
    flagged = joined.withColumn("_keep", keep_cond)
    rebuilt = flagged.groupBy(id_col).agg(
        F.concat_ws(
            "\n\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_keep"), F.struct("pos", "para")
                        )
                    )
                ),
                lambda s: s["para"],
            ),
        ).alias(text_col),
        F.count(F.lit(1)).alias("n_paras"),
        F.sum(F.when(~F.col("_keep"), 1).otherwise(0)).alias(
            "n_dropped_paras"
        ),
    )
    return docs.drop(text_col).join(rebuilt, id_col, "left").select(
        *[c for c in docs.columns if c != text_col],
        F.coalesce(F.col(text_col), F.lit("")).alias(text_col),
        F.coalesce("n_paras", F.lit(0)).alias("n_paras"),
        F.coalesce("n_dropped_paras", F.lit(0)).alias("n_dropped_paras"),
    )


def _bound(col, fn):
    """Bind ``col`` through a lambda variable so ``fn``'s body evaluates it
    ONCE. Referencing an outer expression inside a higher-order-function
    lambda re-evaluates it per element (HOFs are interpreted, no CSE) —
    for a sorted array that would re-sort per access, O(n^2 log n)."""
    return F.element_at(F.transform(F.array(col), fn), 1)


def _dup_run_stats(arr):
    """struct(els, chars): occurrences BEYOND THE FIRST of each distinct
    value in ``arr`` (count, and their total char length), computed by
    sorting the array once and counting adjacent equal runs — the
    per-document equivalent of ``GROUP BY value → sum(cnt-1),
    sum((cnt-1)*len)`` without leaving the row. Integer arithmetic
    throughout, so the DuckDB group-by twin is bit-identical."""
    return _bound(
        F.array_sort(arr),
        lambda srt: _bound(
            F.size(srt),
            lambda n: F.aggregate(
                F.when(n >= 2, F.sequence(F.lit(2), n)).otherwise(
                    F.array().cast("array<int>")
                ),
                F.struct(
                    F.lit(0).cast("long").alias("els"),
                    F.lit(0).cast("long").alias("chars"),
                ),
                lambda acc, i: F.struct(
                    (
                        acc["els"]
                        + F.when(
                            F.element_at(srt, i) == F.element_at(srt, i - 1), 1
                        ).otherwise(0)
                    ).alias("els"),
                    (
                        acc["chars"]
                        + F.when(
                            F.element_at(srt, i) == F.element_at(srt, i - 1),
                            F.length(F.element_at(srt, i)).cast("long"),
                        ).otherwise(0)
                    ).alias("chars"),
                ),
            ),
        ),
    )


def _top_run_chars(arr):
    """max over distinct values of ``count * char_length`` — the Gopher
    "top n-gram" mass — via one sort + one linear run-scan (struct
    accumulator carries the previous element and current run length).
    A value occurring once still scores ``1 * length`` (Gopher counts the
    most common n-gram regardless of multiplicity)."""
    return _bound(
        F.array_sort(arr),
        lambda srt: F.aggregate(
            srt,
            F.struct(
                F.lit(None).cast("string").alias("prev"),
                F.lit(0).cast("long").alias("run"),
                F.lit(0).cast("long").alias("best"),
            ),
            lambda acc, x: _bound(
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(
                    F.lit(1).cast("long")
                ),
                lambda run: F.struct(
                    x.alias("prev"),
                    run.alias("run"),
                    F.greatest(acc["best"], run * F.length(x)).alias("best"),
                ),
            ),
            lambda acc: acc["best"],
        ),
    )


# (name, threshold) in Gopher Table A1 order. Thresholds are the paper's.
GOPHER_REPETITION_RULES = [
    ("dup_line_frac", 0.30),
    ("dup_para_frac", 0.30),
    ("dup_line_char_frac", 0.20),
    ("dup_para_char_frac", 0.20),
    ("top_2gram_char_frac", 0.20),
    ("top_3gram_char_frac", 0.18),
    ("top_4gram_char_frac", 0.16),
    ("dup_5gram_char_frac", 0.15),
    ("dup_6gram_char_frac", 0.14),
    ("dup_7gram_char_frac", 0.13),
    ("dup_8gram_char_frac", 0.12),
    ("dup_9gram_char_frac", 0.11),
    ("dup_10gram_char_frac", 0.10),
]


def gopher_repetition_flags(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The FULL Gopher within-document repetition battery (Rae et al. 2021,
    Table A1) as one codegen projection — the half of the Gopher gate that
    ``gopher_quality_flags``'s single 3-gram rule approximates. Zero
    shuffles, zero UDFs: every metric is a per-row sort + linear run-scan
    over arrays already in the row, so at 100 TB this is a map-only pass.

    Thirteen metrics (fraction columns) + one boolean per rule
    (True = violates) + ``rep_pass`` (ANDed negations):

    - duplicate line / paragraph fraction: repeated occurrences beyond
      the first over total elements. Lines = trimmed non-empty splits on
      ``\\n``; paragraphs on 2+ newlines.
    - duplicate line / paragraph CHARACTER fraction: chars of those
      repeated occurrences over total element chars.
    - top {2,3,4}-gram character fraction: most-common word n-gram's
      ``count * chars`` over normalized-text chars (counted even when the
      top n-gram occurs once, matching the reference implementations).
    - duplicate {5..10}-gram character fraction: chars of repeated n-gram
      occurrences over normalized-text chars. (The paper's non-overlap
      skip is sequential state; we count every repeated shingle — a
      documented, deterministic superset that flags strictly more.)

    n-grams are ``functions/text.py::word_shingles`` strings (normalized,
    single-space joined); every numerator/denominator is an integer sum
    or max, so the DuckDB ``GROUP BY`` twin hashes bit-identically.
    Thresholds are the paper's (``GOPHER_REPETITION_RULES``).
    """
    from ..functions.text import normalize_text, word_shingles

    t = F.col(text_col)

    def clean_split(pattern):
        return F.filter(
            F.transform(F.split(t, pattern), F.trim), lambda x: x != ""
        )

    def el_frac(stats_and_arr):
        stats, arr = stats_and_arr
        n = F.size(arr)
        return F.when(n <= 0, F.lit(0.0)).otherwise(stats["els"] / n)

    def char_frac(stats_and_arr):
        stats, arr = stats_and_arr
        total = F.aggregate(
            arr, F.lit(0).cast("long"), lambda a, x: a + F.length(x)
        )
        return F.when(total <= 0, F.lit(0.0)).otherwise(
            stats["chars"] / total
        )

    lines = clean_split("\n")
    paras = clean_split("\n{2,}")
    line_stats = _dup_run_stats(lines)
    para_stats = _dup_run_stats(paras)
    norm_chars = F.length(normalize_text(t))

    def over_norm(numer):
        return F.when(norm_chars <= 0, F.lit(0.0)).otherwise(
            numer / norm_chars
        )

    metrics = {
        "dup_line_frac": el_frac((line_stats, lines)),
        "dup_para_frac": el_frac((para_stats, paras)),
        "dup_line_char_frac": char_frac((line_stats, lines)),
        "dup_para_char_frac": char_frac((para_stats, paras)),
    }
    for n in (2, 3, 4):
        metrics[f"top_{n}gram_char_frac"] = over_norm(
            _top_run_chars(word_shingles(t, n))
        )
    for n in range(5, 11):
        metrics[f"dup_{n}gram_char_frac"] = over_norm(
            _dup_run_stats(word_shingles(t, n))["chars"]
        )

    out = docs.select(
        "*", *[metrics[name].alias(name) for name, _ in GOPHER_REPETITION_RULES]
    )
    gate = None
    for name, thr in GOPHER_REPETITION_RULES:
        out = out.withColumn(f"flag_{name}", F.col(name) > thr)
        c = ~F.col(f"flag_{name}")
        gate = c if gate is None else gate & c
    return out.withColumn("rep_pass", gate)


_SCRIPTS = [
    # (name, Java-regex class, RE2/DuckDB class) — Unicode Script
    # properties, identical membership in both engines (probed in
    # test_textops_scripts.py); ORDER is the deterministic dominant-
    # script tie-break.
    ("latin", r"\p{IsLatin}"),
    ("cyrillic", r"\p{IsCyrillic}"),
    ("greek", r"\p{IsGreek}"),
    ("arabic", r"\p{IsArabic}"),
    ("han", r"\p{IsHan}"),
    ("hangul", r"\p{IsHangul}"),
    ("hiragana", r"\p{IsHiragana}"),
    ("katakana", r"\p{IsKatakana}"),
]


def script_profile(
    docs: DataFrame, text_col: str = "text", id_cols: tuple[str, ...] = ()
) -> DataFrame:
    """Per-document Unicode-script mix: counts and fractions per script
    plus the dominant script — the cheap signal behind garbage/mixed-
    script filtering (CCNet drops pages whose script disagrees with the
    predicted language; mojibake and binary-spill pages show up as
    script soup with a low dominant fraction).

    Everything is the length-difference regex trick (one codegen
    projection, zero shuffles, zero UDFs). ``dominant_script`` is the
    FIRST script in the fixed ``_SCRIPTS`` order reaching the max count
    ('none' when no script char occurs); ``dominant_frac`` is its share
    of all script characters (not of raw length, so punctuation/digits
    don't dilute it).
    """
    t = F.col(text_col)
    counts = {
        name: (
            F.length(t) - F.length(F.regexp_replace(t, cls, ""))
        ).cast("long")
        for name, cls in _SCRIPTS
    }
    total = None
    for c in counts.values():
        total = c if total is None else total + c
    mx = F.greatest(*counts.values())
    dom = F.lit("none")
    for name, _ in reversed(_SCRIPTS):
        dom = F.when((mx > 0) & (counts[name] == mx), F.lit(name)).otherwise(
            dom
        )
    out = docs.select(
        *(id_cols or ("doc_id",)),
        F.length(t).cast("long").alias("n_chars"),
        *(counts[name].alias(f"n_{name}") for name, _ in _SCRIPTS),
        total.cast("long").alias("n_script_chars"),
        dom.alias("dominant_script"),
    )
    return out.withColumn(
        "dominant_frac",
        F.when(F.col("n_script_chars") <= 0, F.lit(0.0)).otherwise(
            F.round(
                F.greatest(
                    *(F.col(f"n_{name}") for name, _ in _SCRIPTS)
                )
                / F.col("n_script_chars"),
                6,
            )
        ),
    )


def readability_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document readability battery — Flesch reading ease,
    Flesch–Kincaid grade, and type–token ratio — the curation signals a
    corpus dashboard reports next to the Gopher gates.

    Counting rules (fixed, regex-portable so the DuckDB twin is exact):
    words = whitespace tokens of the normalized text; sentences =
    maximal runs of sentence terminators (ASCII ``[.!?]`` plus the CJK
    full-width 。！？; floored at 1 — headline-style fragments
    count as one sentence); syllables = maximal vowel-group runs
    ``[aeiouy]+`` over the lowercased text (vowel runs never span the
    spaces between words, so one whole-text count equals the per-word
    sum); TTR = |distinct tokens| / |tokens|.

    One codegen projection over the corpus scan — no shuffle, no UDF,
    no join; at 100 TB this is a map-only pass that AQE never has to
    think about. Docs with zero tokens score NULL (no evidence).
    """
    from ..functions.text import normalize_text, tokens

    t = normalize_text(F.col(text_col))
    toks = tokens(F.col(text_col))
    n_words = F.size(toks)
    n_sent = F.greatest(
        F.size(
            F.regexp_extract_all(t, F.lit(SENT_BOUNDARY_RE), F.lit(0))
        ),
        F.lit(1),
    )
    n_syll = F.size(F.regexp_extract_all(t, F.lit("[aeiouy]+"), F.lit(0)))
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (n_words / n_sent)
        - F.lit(84.6) * (n_syll / n_words)
    )
    fk = (
        F.lit(0.39) * (n_words / n_sent)
        + F.lit(11.8) * (n_syll / n_words)
        - F.lit(15.59)
    )
    ttr = F.size(F.array_distinct(toks)) / n_words
    guard = n_words > 0
    return docs.select(
        id_col,
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syll.alias("n_syllables"),
        F.when(guard, F.round(flesch, 6)).alias("flesch"),
        F.when(guard, F.round(fk, 6)).alias("fk_grade"),
        F.when(guard, F.round(ttr, 6)).alias("ttr"),
    )


def badwords_filter(
    docs: DataFrame,
    badwords: DataFrame,
    text_col: str = "text",
    max_hits: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """C4's bad-words gate, relationally: drop documents containing
    more than ``max_hits`` occurrences of any term from a blocklist
    (the "List of Dirty, Naughty, Obscene..." role). ``badwords`` is a
    one-column DataFrame ``term`` of lowercase single words.

    Tokenization and counting delegate to
    :func:`..c4filter.badword_hits_join` — the C4 word rule (split on
    ``[^a-z0-9]+``), so punctuation-adjacent occurrences ("spam." /
    "spam,") count, exactly as the regex path does. Spark-first shape:
    NOT a giant regex alternation (which would be a per-row scan whose
    cost grows with the list) — the corpus explodes once and joins the
    term table (no forced broadcast — AQE decides; cost independent of
    list size). Returns the surviving docs with an
    ``n_badword_hits`` column (0 for clean docs)."""
    from .c4filter import badword_hits_join

    hits = badword_hits_join(
        docs,
        badwords.select(F.col("term").alias("word")),
        id_col=id_col,
        text_col=text_col,
    ).withColumnRenamed("badword_hits", "n_badword_hits")
    out = docs.join(hits, id_col)
    return out.filter(F.col("n_badword_hits") <= max_hits)


def quality_threshold_sweep(
    docs: DataFrame, n_buckets: int = 20, text_col: str = "text"
) -> DataFrame:
    """The quality-vs-quantity tradeoff curve in ONE pass: bucket the
    quality score into ``n_buckets`` equal-width bins, then report per
    threshold (bucket lower edge) how many documents and tokens SURVIVE
    a ``quality >= threshold`` gate and their mean quality — the curve
    a curation run reads before choosing its cutoff.

    Plan: one projection + one tiny groupBy(bucket), then the
    descending cumsum runs as an in-row ordered array fold over the
    ≤ ``n_buckets`` bucket rows (collect_list → reverse-sorted array →
    per-threshold slice fold) — bit-identical to the former
    unpartitioned running-sum window (same left-to-right addition
    order for the float q sums) without ever moving rows through a
    single-partition WindowExec. The one-row array aggregate is the
    ordinary partial→final scalar agg, bounded at n_buckets structs."""
    from ..functions.text import quality_score, token_count

    q = quality_score(F.col(text_col))
    b = F.least(
        F.floor(q * n_buckets).cast("int"), F.lit(n_buckets - 1)
    )
    per = (
        docs.select(
            b.alias("bucket"),
            q.alias("q"),
            token_count(F.col(text_col)).alias("n_tokens"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("q").alias("q_sum"),
        )
    )
    s = F.struct(
        F.col("bucket").alias("b"),
        F.col("n_docs").alias("d"),
        F.col("n_tokens").alias("t"),
        F.col("q_sum").alias("q"),
    )
    packed = per.agg(
        F.reverse(F.array_sort(F.collect_list(s))).alias("rs")
    )
    # guard the empty corpus: sequence(1, 0) DESCENDS in Spark, so an
    # empty bucket array would explode [1, 0] and element_at would
    # throw — emit no rows instead (the pre-rewrite behavior)
    idx = F.when(
        F.size("rs") >= 1, F.sequence(F.lit(1), F.size("rs"))
    ).otherwise(F.array().cast("array<int>"))
    ex = packed.select("rs", F.explode(idx).alias("i"))
    pre = F.slice(F.col("rs"), F.lit(1), F.col("i"))
    dsum = F.aggregate(
        pre, F.lit(0).cast("long"), lambda a, x: a + x["d"]
    )
    tsum = F.aggregate(
        pre, F.lit(0).cast("long"), lambda a, x: a + x["t"]
    )
    qsum = F.aggregate(pre, F.lit(0.0), lambda a, x: a + x["q"])
    cur = F.element_at(F.col("rs"), F.col("i"))
    return ex.select(
        F.round(cur["b"] / F.lit(float(n_buckets)), 6).alias("threshold"),
        dsum.alias("surviving_docs"),
        tsum.alias("surviving_tokens"),
        F.round(qsum / dsum, 6).alias("mean_quality"),
    )


def format_profile(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document format-shape profile: the fraction of lines that
    look like code, tables, or bullet lists — the signals RefinedWeb /
    Gopher use to drop pages that are markup rather than prose (and
    that a code-corpus recipe uses with the OPPOSITE sign).

    Fixed line classifiers (documented, regex-portable):
      code:   contains ``{``, ``}``, ``;`` or ``=>``, or a ``def``/
              ``void`` keyword token
      table:  ≥ 2 ``|`` delimiters or ≥ 2 tab characters
      bullet: starts (after indent) with ``-``, ``*``, ``•`` or a
              number + ``.``/``)`` followed by a space

    Lines are raw ``\\n`` splits of the UNnormalized text (format lives
    in the line structure normalization destroys); blank lines drop
    from the denominator. One codegen projection — no shuffle, no UDF.
    Zero-line docs profile NULL fractions."""
    lines = F.filter(
        F.transform(F.split(F.col(text_col), "\n"), lambda l: F.trim(l)),
        lambda l: l != "",
    )

    def frac(pred) -> Column:
        return F.size(F.filter(lines, pred)) / F.size(lines)

    n = F.size(lines)
    code = frac(lambda l: l.rlike("[{};]|=>|\\bdef\\b|\\bvoid\\b"))
    table = frac(
        lambda l: (
            F.length(l) - F.length(F.regexp_replace(l, "[|]", "")) >= 2
        )
        | (F.length(l) - F.length(F.regexp_replace(l, "\t", "")) >= 2)
    )
    bullet = frac(lambda l: l.rlike("^([-*•]|[0-9]+[.)]) "))
    guard = n > 0
    return docs.select(
        id_col,
        n.alias("n_lines"),
        F.when(guard, F.round(code, 6)).alias("code_frac"),
        F.when(guard, F.round(table, 6)).alias("table_frac"),
        F.when(guard, F.round(bullet, 6)).alias("bullet_frac"),
    )


def coherence_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document lexical coherence: mean and minimum Jaccard overlap
    of adjacent sentences' distinct token sets — prose flows (adjacent
    sentences share referents), while stitched scraper fragments,
    keyword-stuffed spam and shuffled boilerplate score near zero
    between every pair. The complement of the repetition gates: those
    catch TOO MUCH overlap, this catches none at all.

    Sentence boundaries are the shared ``SENT_BOUNDARY_RE`` (ASCII +
    CJK); tokens are whitespace splits of the already-normalized
    sentence. Everything is in-row array algebra (split → distinct →
    intersect/union sizes per adjacent pair) — one codegen projection,
    no shuffle, no UDF. Docs with <2 sentences score NULL (no pairs)."""
    from ..functions.text import SENT_BOUNDARY_RE, normalize_text

    sents = F.filter(
        F.transform(
            F.split(normalize_text(F.col(text_col)), SENT_BOUNDARY_RE),
            lambda s: F.trim(s),
        ),
        lambda s: s != "",
    )

    def pair_jaccards(ss: Column) -> Column:
        toksets = F.transform(ss, lambda s: F.array_distinct(F.split(s, " ")))
        n = F.size(toksets)
        return F.when(
            n < 2, F.array().cast("array<double>")
        ).otherwise(
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.size(
                    F.array_intersect(
                        F.element_at(toksets, i), F.element_at(toksets, i + 1)
                    )
                ).cast("double")
                / F.size(
                    F.array_union(
                        F.element_at(toksets, i), F.element_at(toksets, i + 1)
                    )
                ),
            )
        )

    js = F.element_at(F.transform(F.array(sents), pair_jaccards), 1)
    has = F.size(js) > 0
    mean = F.aggregate(js, F.lit(0.0), lambda a, v: a + v) / F.size(js)
    return docs.select(
        id_col,
        F.size(sents).alias("n_sentences"),
        F.when(has, F.round(mean, 6)).alias("mean_coherence"),
        F.when(has, F.round(F.array_min(js), 6)).alias("min_coherence"),
    )
