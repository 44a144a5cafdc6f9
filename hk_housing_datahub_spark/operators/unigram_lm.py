"""Distributed unigram-LM (SentencePiece) tokenizer training — EM over
word lattices, Spark-shaped.

Kudo 2018 ("Subword Regularization"): model a word as the most likely
segmentation under a unigram distribution over subword pieces; train by
EM (E-step: forward–backward expected piece counts over every word's
segmentation lattice; M-step: renormalize), shrinking an over-complete
seed vocabulary down to the target size. This is the tokenizer behind
SentencePiece's default model — the BPE module (operators/bpe.py) is
the merge-based sibling.

Scale shape — why this is tractable at 100 TB:

- The corpus is touched ONCE (vocab.token_vocabulary's explode+groupBy,
  the same pass BPE uses). Everything after runs over the Heaps'-law
  word-frequency table (10^7..10^9 rows at 100 TB), never the corpus.
- Seed selection is one substring-explode + map-side-combined groupBy
  over the word table, then TakeOrdered for the top ``seed_size``
  (per-partition top-k; driver traffic = the model itself, which EM
  must hold anyway — exactly SentencePiece's own memory model).
- Each EM iteration is ONE Arrow-batched pass over the word table (the
  forward–backward lattice DP is per-word dynamic programming — genuinely
  imperative, the documented case for a pandas UDF) followed by ONE
  map-side-combined piece-keyed aggregate. Expected counts accumulate in
  exact decimal(38,18) (order-independent addition), so the fit is
  BIT-DETERMINISTIC under any partitioning — the same discipline as
  operators/quality_clf.py.
- The piece table returns to the driver once per iteration (it is the
  model — bounded by ``seed_size``, shipped back out in the next UDF's
  closure), giving O(vocab) driver traffic per round, never O(corpus).
- Pruning is SentencePiece's approximation: keep the highest-probability
  ``shrink`` fraction, never dropping single characters (so every word
  stays representable).

Viterbi encoding (``encode_unigram``) is the same lattice DP taking max
instead of sum — one Arrow-batched pandas UDF, with ties broken by
FEWER PIECES then lexicographically-greatest first piece (a total,
engine-portable order used by the tests' brute-force twin).

Reference semantic target: /root/reference has no tokenizer; this is
the training-data battery's second tokenizer family, sharing
vocab.token_vocabulary with BPE.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    StringType,
    StructField,
    StructType,
)

from .quality_clf import _exact_sum


# --------------------------------------------------------------------------
# Pure-Python lattice kernels (shared by the distributed UDF and the
# sequential reference the tests compare against)
# --------------------------------------------------------------------------


def _forward_backward(word: str, logp: dict, max_len: int):
    """Expected piece counts for one word under the current model.
    Returns (dict piece -> expected count, total log-likelihood) or
    (None, None) if the word has no segmentation (cannot happen while
    single characters stay in the vocabulary)."""
    n = len(word)
    neg = float("-inf")
    alpha = [neg] * (n + 1)
    alpha[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is not None and alpha[j] != neg:
                a = alpha[j] + lp
                alpha[i] = a if alpha[i] == neg else _logadd(alpha[i], a)
    if alpha[n] == neg:
        return None, None
    beta = [neg] * (n + 1)
    beta[n] = 0.0
    for i in range(n - 1, -1, -1):
        for j in range(i + 1, min(n, i + max_len) + 1):
            lp = logp.get(word[i:j])
            if lp is not None and beta[j] != neg:
                b = beta[j] + lp
                beta[i] = b if beta[i] == neg else _logadd(beta[i], b)
    z = alpha[n]
    exp: dict = {}
    for i in range(n):
        if alpha[i] == neg:
            continue
        for j in range(i + 1, min(n, i + max_len) + 1):
            piece = word[i:j]
            lp = logp.get(piece)
            if lp is not None and beta[j] != neg:
                e = math.exp(alpha[i] + lp + beta[j] - z)
                exp[piece] = exp.get(piece, 0.0) + e
    return exp, z


def _logadd(a: float, b: float) -> float:
    if a < b:
        a, b = b, a
    return a + math.log1p(math.exp(b - a))


def _viterbi(word: str, logp: dict, max_len: int):
    """Best segmentation: max total logp; ties → fewer pieces; ties →
    lexicographically GREATEST piece at the earliest divergence (prefers
    longer/later alphabet pieces deterministically). Returns list of
    pieces or None."""
    n = len(word)
    neg = float("-inf")
    # state: (score, -n_pieces, path-as-tuple) maximized lexicographically
    best = [None] * (n + 1)
    best[0] = (0.0, 0, ())
    for i in range(1, n + 1):
        cand = None
        for j in range(max(0, i - max_len), i):
            lp = logp.get(word[j:i])
            if lp is None or best[j] is None:
                continue
            s, np_, path = best[j]
            c = (s + lp, np_ - 1, path + (word[j:i],))
            if cand is None or (c[0], c[1], c[2]) > (cand[0], cand[1], cand[2]):
                cand = c
        best[i] = cand
    if best[n] is None:
        return None
    return list(best[n][2])


def _seed_pieces(wf: DataFrame, max_piece_len: int, seed_size: int):
    """Over-complete seed: every substring of length ≤ max_piece_len of
    every vocabulary word, weighted by word frequency × occurrences;
    keep the top ``seed_size`` by weight (ties → piece ASC) plus ALL
    single characters. One explode + combined groupBy over the word
    table; TakeOrdered for the top slice."""
    w = F.col("token")
    subs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.length(w)),
            lambda i: F.transform(
                F.sequence(
                    F.lit(1),
                    F.least(F.lit(max_piece_len), F.length(w) - i + 1),
                ),
                lambda l: F.substr(w, i, l),
            ),
        )
    )
    weighted = (
        wf.select(F.explode(subs).alias("piece"), F.col("cnt"))
        .groupBy("piece")
        .agg(F.sum("cnt").alias("w"))
    )
    top = weighted.where(F.length("piece") > 1).orderBy(
        F.desc("w"), F.asc("piece")
    ).limit(seed_size)
    chars = weighted.where(F.length("piece") == 1)
    return [
        (r["piece"], float(r["w"]))
        for r in top.unionByName(chars).collect()
    ]


def learn_unigram_lm(
    docs: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    min_count: int = 1,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> list:
    """Fit a unigram-LM piece vocabulary; returns a sorted
    ``[(piece, logp)]`` list (logp base e, normalized).

    Loop: seed (``seed_factor × vocab_size`` pieces + all chars) →
    repeat { ``em_iters`` EM rounds; prune to ``shrink`` of current,
    keeping chars } until ≤ ``vocab_size`` → final EM round. Fixed
    iteration counts and total tie-break orders make the whole fit a
    pure function of the corpus."""
    from .vocab import token_vocabulary

    wf = (
        token_vocabulary(docs, text_col=text_col, min_count=min_count)
        .select("token", F.col("count").alias("cnt"))
        .persist()
    )
    spark = docs.sparkSession
    seed = sorted(_seed_pieces(wf, max_piece_len, seed_factor * vocab_size))
    tot = sum(w for _, w in seed)
    model = {p: math.log(w / tot) for p, w in seed}

    def em_round(model: dict) -> dict:
        counts = _expected_counts(spark, wf, model, max_piece_len)
        return _m_step(model, counts)

    while True:
        for _ in range(em_iters):
            model = em_round(model)
        if len(model) <= vocab_size:
            break
        keep = max(int(len(model) * shrink), vocab_size)
        ranked = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = dict(ranked[:keep])
        for p, lp in model.items():  # chars always survive
            if len(p) == 1:
                kept[p] = lp
        if len(kept) == len(model):  # nothing prunable beyond chars
            break
        model = kept
    model = em_round(model)
    return sorted(model.items())


# Expected-count quantum: the E-step accumulates in decimal(38,18), so
# per-word contributions below 10^-18 vanish; the sequential reference
# applies the same per-addend quantization so both paths drop the same
# negligible pieces. Single-character pieces NEVER leave the model
# (SentencePiece's required-char rule — every word must stay
# segmentable); a char whose expected count quantized to zero re-enters
# at the fixed floor mass below.
_E_QUANTUM_DIGITS = 18
_MIN_CHAR_E = 1e-12


def _m_step(model: dict, counts: dict) -> dict:
    """Shared M-step + survival rule: multi-char pieces with zero
    (quantized) expected count drop; single-char pieces survive at the
    ``_MIN_CHAR_E`` floor; everything renormalizes in log space. The
    normalizer sums in sorted-piece order — collect()/dict order is
    partition-dependent, and float addition is not associative."""
    z = sum(c for _, c in sorted(counts.items()))
    if z <= 0.0:
        return dict(model)
    out = {p: math.log(c / z) for p, c in counts.items() if c > 0.0}
    floor = math.log(_MIN_CHAR_E / z)
    for p in model:
        if len(p) == 1 and p not in out:
            out[p] = floor
    return out


def _expected_counts(spark, wf: DataFrame, model: dict, max_piece_len: int):
    """ONE distributed E-step: Arrow-batched forward–backward over the
    word table, then one piece-keyed exact-decimal aggregate; the
    resulting piece table (== the model) is collected back. Words with
    no segmentation under the current model contribute nothing (cannot
    occur while chars remain)."""
    out_schema = ArrayType(
        StructType(
            [
                StructField("piece", StringType()),
                StructField("e", DoubleType()),
            ]
        )
    )
    logp = dict(model)

    @F.pandas_udf(out_schema)
    def estep(words, cnts):  # two pd.Series -> pd.Series of struct lists
        res = []
        for w, c in zip(words, cnts):
            exp, _ = _forward_backward(w, logp, max_piece_len)
            if exp is None:
                res.append([])
            else:
                res.append([(p, e * float(c)) for p, e in exp.items()])
        import pandas as pd

        return pd.Series(res)

    agg = (
        wf.select(F.explode(estep("token", "cnt")).alias("pe"))
        .groupBy(F.col("pe.piece").alias("piece"))
        .agg(_exact_sum(F.col("pe.e")).alias("e"))
        .collect()
    )
    return {r["piece"]: float(r["e"]) for r in agg}


def encode_unigram(
    docs: DataFrame,
    model,
    text_col: str = "text",
    out_col: str = "pieces",
    max_piece_len: int = 8,
) -> DataFrame:
    """``docs`` + array<string> Viterbi segmentation of each whitespace
    token under the model (tokens with no segmentation — characters
    outside the training alphabet — fall back to single characters with
    an OOV floor below every real piece). One Arrow-batched pandas UDF;
    no shuffle."""
    logp = dict(model)
    floor = (min(logp.values()) if logp else 0.0) - 20.0

    @F.pandas_udf(ArrayType(StringType()))
    def enc(texts):
        import pandas as pd

        res = []
        for t in texts:
            pieces = []
            for w in (t or "").split():
                seg = _viterbi(w, logp, max_piece_len)
                if seg is None:
                    aug = dict(logp)
                    for ch in set(w):
                        aug.setdefault(ch, floor)
                    seg = _viterbi(w, aug, max_piece_len) or list(w)
                pieces.extend(seg)
            res.append(pieces)
        return pd.Series(res)

    from ..functions.text import normalize_text

    return docs.withColumn(out_col, enc(normalize_text(F.col(text_col))))


# --------------------------------------------------------------------------
# Sequential reference (tests only): same math, no Spark
# --------------------------------------------------------------------------


def learn_unigram_lm_sequential(
    word_counts: dict,
    vocab_size: int = 512,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 2,
    shrink: float = 0.75,
) -> list:
    """Driver-only twin of ``learn_unigram_lm`` over a {word: count}
    dict — identical seed/EM/prune/tie-break rules, plain float sums."""
    weights: dict = {}
    for w, c in word_counts.items():
        for i in range(len(w)):
            for l in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + l]
                weights[p] = weights.get(p, 0) + c
    multi = sorted(
        ((p, wt) for p, wt in weights.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: seed_factor * vocab_size]
    seed = sorted(
        multi + [(p, wt) for p, wt in weights.items() if len(p) == 1]
    )
    tot = sum(wt for _, wt in seed)
    model = {p: math.log(wt / tot) for p, wt in seed}

    def em(model):
        counts: dict = {}
        for w, c in word_counts.items():
            exp, _ = _forward_backward(w, model, max_piece_len)
            if exp:
                for p, e in exp.items():
                    counts[p] = counts.get(p, 0.0) + round(
                        e * c, _E_QUANTUM_DIGITS
                    )
        return _m_step(model, counts)

    while True:
        for _ in range(em_iters):
            model = em(model)
        if len(model) <= vocab_size:
            break
        keep = max(int(len(model) * shrink), vocab_size)
        ranked = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))
        kept = dict(ranked[:keep])
        for p, lp in model.items():
            if len(p) == 1:
                kept[p] = lp
        if len(kept) == len(model):
            break
        model = kept
    return sorted(em(model).items())
