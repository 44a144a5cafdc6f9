"""Training-corpus preparation — the whole battery composed end to end.

What a user actually runs to turn raw crawled documents into a training
corpus: dedup → quality gate → PII scrub → (optionally mixture-)sample →
pack into token-budget bins. Each stage is an already-tested operator;
this module is the canonical composition and the per-stage accounting.

    docs ──drop exact dups──► uniq
         ──drop near dups (LSH at scale / exact verifier)──► canon
         ──quality_score >= min_quality──► kept
         ──DSIR top-k toward a target corpus (optional)──► selected
         ──redact_pii (scrubbed text becomes THE text)──► clean
         ──deterministic hash sample (plain / stratified / mixture)──► samp
         ──pack_greedy(token budget)──► corpus (bucket, bin_id columns)

Scale shape: dedup is the dominant cost (banded LSH, sub-quadratic);
quality + redaction are codegen scan projections; sampling is a scan
predicate; packing is one bucket-keyed shuffle. No stage collects to the
driver. Every stage is deterministic, so two runs (or two engines) build
byte-identical corpora — which is the audit story: a training run's
input is reproducible from (corpus snapshot, recipe parameters).

``corpus_stats`` reports the funnel (rows in/out per stage) the way a
data-quality dashboard wants it.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import quality_score, token_count
from ..operators.dedup import drop_exact_dups, drop_near_dups, minhash_lsh_dedup
from ..operators.packing import pack_greedy
from ..operators.redact import redact_pii
from ..operators.sampling import hash_sample, mixture_sample


@dataclass
class CorpusRecipe:
    """The reproducibility unit: same recipe + same input snapshot =
    byte-identical corpus."""

    dedup: str = "lsh"  # "lsh" (100-TB path) | "exact" (verifier path)
    cc_method: str = "label"  # transitive closure: "label" (rounds =
    # cluster diameter — near-dup graphs are clique-ish) | "star"
    # (large-star/small-star, O(log^2 n) rounds — the safe choice when
    # template families make the pair graph chain-like)
    dedup_threshold: float = 0.5
    max_shingle_df: int | None = 50
    min_quality: float = 0.0
    gopher: bool = False  # apply the Gopher-rules gate (drops flag cols)
    gopher_repetition: bool = False  # full Table-A1 repetition battery
    boilerplate_max_df: int | None = None  # line-DF cap (CCNet line dedup)
    paragraph_dedup: str | None = None  # CCNet exact cross-corpus
    # paragraph dedup: "first" keeps the globally-first copy, "none"
    # drops every copy of a duplicated paragraph
    paragraph_min_chars: int = 10  # shorter paragraphs are structure
    sample_rate: float = 1.0
    mixture: dict[str, float] | None = None  # source -> target weight
    mixture_total: int | None = None
    pack_budget: int = 4096  # tokens per bin
    decontaminate_n: int = 13  # n-gram length for the benchmark screen
    max_dup_span_frac: float | None = None  # substring-dedup doc gate
    span_k: int = 15  # duplicated-span window (tokens, Lee et al. use 50)
    max_perplexity: float | None = None  # LM gate (needs lm_reference)
    lm: str = "bigram"  # perplexity model: "bigram" (add-k) | "kn"
    # (interpolated Kneser-Ney bigram) | "kn3" (trigram KN chain)
    lm_k: float = 0.5  # add-k / continuation-floor mass for the LM gate
    max_bullet_frac: float | None = None  # RefinedWeb list-page drop
    max_code_frac: float | None = None  # prose recipes drop code-shaped docs
    min_coherence: float | None = None  # adjacent-sentence Jaccard
    # floor (stitched-fragment / keyword-stuffing drop; NULL-coherence
    # single-sentence docs pass)
    min_novelty: float | None = None  # n-gram novelty floor vs
    # novelty_reference (positive selection: keep docs that ADD
    # information; NULL-novelty short docs pass)
    novelty_n: int = 8  # n-gram length for the novelty screen
    dsir_top_k: int | None = None  # DSIR selection size (needs dsir_reference)
    dsir_dim: int = 4096  # hashed n-gram buckets for the DSIR model
    dsir_seed: int = 0  # Gumbel resampling seed
    dsir_temperature: float = 1.0  # ->0: deterministic top-k by weight
    clf_threshold: float | None = None  # quality-clf gate (needs clf_positive)
    clf_dim: int = 4096  # hashed buckets for the classifier
    clf_iterations: int = 40  # fixed GD rounds (determinism contract)
    clf_negative_rate: float = 0.25  # hash-sampled raw slice used as the
    # fit's negative class — the fit must cost iterations x 2 shuffles
    # over a LABELED SAMPLE, not the corpus (set so rate x |corpus| is
    # on the order of |clf_positive|); scoring still covers every doc
    fold_confusables: bool = False  # homoglyph-robust exact-dedup keys
    cap_per_source: int | None = None  # RefinedWeb/C4 per-domain cap
    cap_group_col: str = "source"  # the domain/host column to cap on
    badwords: tuple[str, ...] | None = None  # C4 page-drop lexicon
    salt: str = ""


def pages_to_documents(
    pages: DataFrame,
    url_col: str = "url_canon",
    html_col: str = "html",
    lang_col: str = "lang",
    ts_col: str = "warc_ts",
    min_chars: int = 25,
) -> DataFrame:
    """The glue between the engine's two halves: crawled PAGES (the
    input_hint shape — url, warc_ts, html, lang) become corpus-funnel
    DOCUMENTS (doc_id, text, lang, source, url, warc_ts).

    - ``text`` is the page's main content (extract/content.py jusText
      block classification) — nav/footer/link-farm boilerplate never
      enters the corpus, so dedup/quality stages score prose, not chrome;
    - ``doc_id`` = md5(url): stable across runs and engines, uniformly
      distributed (the dedup shuffle key), lexicographic keep-lowest
      determinism;
    - ``source`` = the URL's host — the column the per-source cap and
      mixture sampling stages key on;
    - pages whose extracted content is under ``min_chars`` drop here
      (nothing downstream wants an empty document).

    One codegen projection + one filter over the page scan — composes
    with ``prepare_training_corpus`` for the crawl-to-training-corpus
    path end to end. Scale: no shuffle, no UDF; html bytes are read
    once and never move."""
    from ..extract.content import main_content
    from ..functions.urls import url_host

    out = pages.select(
        F.md5(F.col(url_col)).alias("doc_id"),
        main_content(F.col(html_col)).alias("text"),
        F.col(lang_col).alias("lang"),
        url_host(F.col(url_col)).alias("source"),
        F.col(url_col).alias("url"),
        F.col(ts_col).alias("warc_ts"),
    )
    return out.filter(F.length("text") >= F.lit(min_chars))


def prepare_training_corpus(
    docs: DataFrame,
    recipe: CorpusRecipe | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    benchmark: DataFrame | None = None,
    lm_reference: DataFrame | None = None,
    novelty_reference: DataFrame | None = None,
    dsir_reference: DataFrame | None = None,
    clf_positive: DataFrame | None = None,
) -> DataFrame:
    """Run the full preparation funnel; returns the packed corpus with
    ``text`` already scrubbed, plus ``n_tokens``, ``pii_total``,
    ``quality``, ``bucket`` and ``bin_id`` columns.

    ``benchmark`` (optional): an eval-set DataFrame with a ``text``
    column; docs sharing a ``recipe.decontaminate_n``-gram with it are
    dropped FIRST (cheapest gate — a broadcast semi-join — and removing
    leaks before dedup keeps a contaminated doc from surviving as its
    cluster's canonical).

    ``lm_reference`` (optional, with ``recipe.max_perplexity``): a
    reference corpus (the CCNet recipe uses Wikipedia) to fit the bigram
    LM on; documents scoring above the perplexity cap after the heuristic
    quality gate are dropped (operators/lm_quality.py). Short documents
    with no bigram evidence score NULL and are KEPT — the heuristic gate
    already owns the too-short case.

    ``dsir_reference`` (optional, with ``recipe.dsir_top_k``): a target
    corpus to select TOWARD (operators/importance.py) — after the
    negative gates remove junk, DSIR's Gumbel top-k keeps the
    ``dsir_top_k`` surviving docs whose hashed-n-gram distribution best
    matches the reference, deterministic under ``recipe.dsir_seed``."""
    r = recipe or CorpusRecipe()
    out = docs
    if r.badwords:
        # C4's page-level lexicon drop, cheapest gate of all (map-only
        # codegen regex), so it runs first — a convicted page never
        # reaches the shuffling stages
        from ..operators.c4filter import _badword_regex

        out = out.filter(
            ~F.lower(F.col(text_col)).rlike(_badword_regex(r.badwords))
        )
    if benchmark is not None:
        from ..operators.decontaminate import drop_contaminated

        out = drop_contaminated(
            out, benchmark, n=r.decontaminate_n, id_col=id_col,
            text_col=text_col,
        )
    if r.paragraph_dedup is not None:
        # exact cross-corpus paragraph dedup (CCNet §3.1) runs before
        # the line-DF pass: a paragraph that survives here exactly once
        # can still be convicted as boilerplate by document frequency
        from ..operators.textops import dedup_paragraphs

        out = dedup_paragraphs(
            out, keep=r.paragraph_dedup, min_chars=r.paragraph_min_chars,
            id_col=id_col, text_col=text_col,
        ).drop("n_paras", "n_dropped_paras")
    if r.boilerplate_max_df is not None:
        # line-level cleanup BEFORE doc-level dedup (the CCNet order):
        # shared footers otherwise make distinct docs look like near-dups
        from ..operators.textops import drop_boilerplate_lines

        out = drop_boilerplate_lines(
            out, max_line_df=r.boilerplate_max_df,
            id_col=id_col, text_col=text_col,
        )
    out = drop_exact_dups(
        out, id_col, text_col, fold_spoofs=r.fold_confusables
    )
    if r.dedup == "lsh":
        out = minhash_lsh_dedup(
            out, id_col, text_col,
            threshold=r.dedup_threshold, max_shingle_df=r.max_shingle_df,
            cc_method=r.cc_method,
        )
    elif r.dedup == "exact":
        out = drop_near_dups(
            out, id_col, text_col,
            threshold=r.dedup_threshold, max_shingle_df=r.max_shingle_df,
            cc_method=r.cc_method,
        )
    else:
        raise ValueError(f"unknown dedup mode {r.dedup!r}")
    if r.max_dup_span_frac is not None:
        # substring-level pass AFTER doc-level dedup (Lee et al. 2022):
        # doc dedup removes whole-copy mass first, so the k-gram counts
        # here flag only genuinely shared spans between surviving docs
        from ..operators.spandedup import drop_duplicated_span_docs

        out = drop_duplicated_span_docs(
            out, id_col, text_col,
            k=r.span_k, max_dup_frac=r.max_dup_span_frac,
        )
    out = out.withColumn("quality", quality_score(F.col(text_col))).filter(
        F.col("quality") >= r.min_quality
    )
    if r.gopher:
        from ..operators.textops import gopher_quality_flags

        flagged = gopher_quality_flags(out, text_col)
        out = flagged.filter(F.col("gopher_pass")).select(*out.columns)
    if r.gopher_repetition:
        from ..operators.textops import gopher_repetition_flags

        flagged = gopher_repetition_flags(out, text_col)
        out = flagged.filter(F.col("rep_pass")).select(*out.columns)
    if r.max_bullet_frac is not None or r.max_code_frac is not None:
        # format-shape gate (RefinedWeb): line-structure fractions are a
        # map-only projection; NULL fractions (no lines) pass — absence
        # of structure is not evidence of markup
        from ..operators.textops import format_profile

        cols = out.columns
        prof = format_profile(out, text_col=text_col, id_col=id_col)
        out = out.join(prof, id_col)
        if r.max_bullet_frac is not None:
            out = out.filter(
                F.col("bullet_frac").isNull()
                | (F.col("bullet_frac") <= r.max_bullet_frac)
            )
        if r.max_code_frac is not None:
            out = out.filter(
                F.col("code_frac").isNull()
                | (F.col("code_frac") <= r.max_code_frac)
            )
        out = out.select(*cols)
    if r.max_perplexity is not None:
        if lm_reference is None:
            raise ValueError("max_perplexity needs lm_reference")
        from ..operators.lm_quality import (
            fit_bigram_lm,
            fit_kneser_ney,
            fit_kneser_ney3,
            kn3_perplexity_score,
            kn_perplexity_score,
            perplexity_score,
        )

        cols = out.columns
        # the model tables feed every downstream action of the returned
        # corpus — persist them or each count()/write re-aggregates the
        # whole reference corpus
        if r.lm == "bigram":
            model = fit_bigram_lm(
                lm_reference, text_col=text_col, k=r.lm_k
            ).persist()
            scorer = perplexity_score
        elif r.lm == "kn":
            model = fit_kneser_ney(
                lm_reference, text_col=text_col, k=r.lm_k
            ).persist()
            scorer = kn_perplexity_score
        elif r.lm == "kn3":
            model = fit_kneser_ney3(
                lm_reference, text_col=text_col, k=r.lm_k
            ).persist()
            scorer = kn3_perplexity_score
        else:
            raise ValueError(f"unknown lm family {r.lm!r}")
        out = (
            scorer(out, model, id_col=id_col, text_col=text_col)
            .filter(
                F.col("perplexity").isNull()
                | (F.col("perplexity") <= r.max_perplexity)
            )
            .select(*cols)
        )
    if r.clf_threshold is not None:
        if clf_positive is None:
            raise ValueError("clf_threshold needs clf_positive")
        from ..operators.quality_clf import (
            fit_quality_classifier,
            quality_gate,
            score_quality,
        )

        # discriminative positive gate BEFORE the DSIR budget (same
        # rationale: junk must not crowd the selection). Negatives are a
        # bounded hash-slice of the funnel survivors (the FineWeb-Edu
        # framing — label noise from true positives in the raw slice is
        # expected): the fit costs iterations x 2 compact shuffles over
        # the SAMPLE, never the corpus. Survivor features are computed
        # once and persisted — the fit's negative side and the full
        # scoring pass both read the same frame, so the upstream funnel
        # (dedup, gates) is not re-embedded in the output plan.
        from ..operators.importance import hashed_ngram_features as _hnf

        def _pfx(feats, tag):
            return feats.withColumn(
                "id", F.concat(F.lit(tag), F.col("id").cast("string"))
            )

        feats = _hnf(
            out, id_col=id_col, text_col=text_col, dim=r.clf_dim
        ).persist()
        neg = feats
        if r.clf_negative_rate < 1.0:
            neg = hash_sample(
                feats, ["id"], r.clf_negative_rate, salt=r.salt
            )
        model = fit_quality_classifier(
            _pfx(
                _hnf(
                    clf_positive, id_col=id_col, text_col=text_col,
                    dim=r.clf_dim,
                ),
                "pos:",
            ),
            _pfx(neg, "raw:"),
            iterations=r.clf_iterations,
        )
        scores = score_quality(feats, model)
        out = quality_gate(out, scores, r.clf_threshold, id_col=id_col)

    if r.min_coherence is not None:
        from ..operators.textops import coherence_scores

        cols = out.columns
        coh = coherence_scores(out, text_col=text_col, id_col=id_col)
        out = (
            out.join(coh.select(id_col, "mean_coherence"), id_col)
            .filter(
                F.col("mean_coherence").isNull()
                | (F.col("mean_coherence") >= r.min_coherence)
            )
            .select(*cols)
        )
    if r.min_novelty is not None:
        if novelty_reference is None:
            raise ValueError("min_novelty needs novelty_reference")
        from ..operators.decontaminate import novelty_scores

        cols = out.columns
        nov = novelty_scores(
            out, novelty_reference, n=r.novelty_n,
            id_col=id_col, text_col=text_col,
        )
        out = (
            out.join(nov.select(id_col, "novelty"), id_col)
            .filter(
                F.col("novelty").isNull()
                | (F.col("novelty") >= r.min_novelty)
            )
            .select(*cols)
        )
    if r.dsir_top_k is not None:
        if dsir_reference is None:
            raise ValueError("dsir_top_k needs dsir_reference")
        from ..operators.importance import (
            dsir_select,
            fit_logratio,
            hashed_ngram_features,
            importance_weights,
        )

        # positive selection AFTER the negative gates (junk that merely
        # shares vocabulary with the target must not crowd the k budget);
        # survivor features feed both the raw side of the model fit and
        # the scoring pass, so persist them across the two consumptions
        feats = hashed_ngram_features(
            out, id_col=id_col, text_col=text_col, dim=r.dsir_dim
        ).persist()
        lr = fit_logratio(
            hashed_ngram_features(
                dsir_reference, id_col=id_col, text_col=text_col,
                dim=r.dsir_dim,
            ),
            feats,
            dim=r.dsir_dim,
        )
        out = dsir_select(
            out,
            importance_weights(feats, lr),
            k=r.dsir_top_k,
            id_col=id_col,
            seed=r.dsir_seed,
            temperature=r.dsir_temperature,
        )
    out = redact_pii(out, text_col)
    # the scrubbed text IS the corpus text from here on
    out = out.drop(text_col).withColumnRenamed(f"{text_col}_redacted", text_col)
    if r.cap_per_source is not None:
        # per-domain dominance cap BEFORE the global sample: a mega-host
        # must not eat the sample budget (RefinedWeb's per-domain rule)
        from ..operators.sampling import cap_per_group

        out = cap_per_group(
            out, [r.cap_group_col], [id_col], r.cap_per_source,
            salt=r.salt,
        )
    if r.mixture:
        if not r.mixture_total:
            raise ValueError("mixture needs mixture_total")
        out = mixture_sample(
            out, "source", r.mixture, r.mixture_total,
            key_cols=[id_col], salt=r.salt,
        )
    elif r.sample_rate < 1.0:
        out = hash_sample(out, [id_col], r.sample_rate, salt=r.salt)
    out = out.withColumn("n_tokens", token_count(F.col(text_col)))
    return pack_greedy(out, id_col, "n_tokens", r.pack_budget)


def corpus_stats(docs: DataFrame, corpus: DataFrame) -> DataFrame:
    """The funnel report: one row — input size, survivors, PII hits
    removed, bins produced, mean fill. A single aggregate job."""
    n_in = docs.count()
    agg = corpus.agg(
        F.count(F.lit(1)).alias("docs_out"),
        F.sum("pii_total").alias("pii_spans_scrubbed"),
        F.countDistinct("bucket", "bin_id").alias("bins"),
        F.sum("n_tokens").alias("tokens"),
    ).first()
    spark = docs.sparkSession
    return spark.createDataFrame(
        [
            (
                n_in,
                agg["docs_out"],
                int(agg["pii_spans_scrubbed"] or 0),
                agg["bins"],
                int(agg["tokens"] or 0),
            )
        ],
        "docs_in long, docs_out long, pii_spans_scrubbed long, "
        "bins long, tokens long",
    )
