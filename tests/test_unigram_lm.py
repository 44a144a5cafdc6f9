"""Unigram-LM (SentencePiece) tokenizer training (operators/unigram_lm.py):
lattice kernels against brute enumeration, distributed fit against the
sequential reference, Viterbi optimality, and partition invariance."""

from __future__ import annotations

import itertools
import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.unigram_lm import (
    _forward_backward,
    _viterbi,
    encode_unigram,
    learn_unigram_lm,
    learn_unigram_lm_sequential,
)


def _brute_segmentations(word, vocab, max_len):
    """All segmentations of word into vocab pieces (pieces ≤ max_len)."""
    n = len(word)
    outs = []

    def rec(i, path):
        if i == n:
            outs.append(tuple(path))
            return
        for j in range(i + 1, min(n, i + max_len) + 1):
            if word[i:j] in vocab:
                rec(j, path + [word[i:j]])

    rec(0, [])
    return outs


def _model(pieces):
    tot = sum(pieces.values())
    return {p: math.log(w / tot) for p, w in pieces.items()}


def test_forward_backward_matches_brute_enumeration():
    model = _model({"a": 4, "b": 3, "ab": 2, "ba": 1, "aba": 1})
    for word in ["ab", "aba", "abab", "bbaab"]:
        exp, z = _forward_backward(word, model, 3)
        segs = _brute_segmentations(word, model, 3)
        probs = [math.exp(sum(model[p] for p in s)) for s in segs]
        zz = sum(probs)
        assert z == pytest.approx(math.log(zz), rel=1e-12)
        want: dict = {}
        for s, pr in zip(segs, probs):
            for p in s:
                want[p] = want.get(p, 0.0) + pr / zz
        assert set(exp) == set(want)
        for p in want:
            assert exp[p] == pytest.approx(want[p], rel=1e-9), (word, p)


def test_forward_backward_unsegmentable():
    exp, z = _forward_backward("xyz", _model({"a": 1}), 3)
    assert exp is None and z is None


@settings(max_examples=60, deadline=None)
@given(st.text(alphabet="ab", min_size=1, max_size=7))
def test_viterbi_is_optimal_and_tie_stable(word):
    model = _model({"a": 5, "b": 3, "ab": 3, "ba": 2, "bb": 1, "aab": 1})
    got = _viterbi(word, model, 3)
    segs = _brute_segmentations(word, model, 3)
    if not segs:
        assert got is None
        return
    # the documented total order: score desc, fewer pieces, lexicographically
    # greatest path
    best = max(
        segs,
        key=lambda s: (sum(model[p] for p in s), -len(s), s),
    )
    assert tuple(got) == best


def test_distributed_fit_matches_sequential(spark):
    rows = [
        (i, t)
        for i, t in enumerate(
            ["low lower lowest", "new newer newest", "wide wider widest"] * 4
        )
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = learn_unigram_lm(
        docs, vocab_size=24, max_piece_len=4, em_iters=2, shrink=0.75
    )
    wc: dict = {}
    for _, t in rows:
        for w in t.split():
            wc[w] = wc.get(w, 0) + 1
    want = learn_unigram_lm_sequential(
        wc, vocab_size=24, max_piece_len=4, em_iters=2, shrink=0.75
    )
    assert [p for p, _ in got] == [p for p, _ in want]
    for (p, lp), (_, wlp) in zip(got, want):
        assert lp == pytest.approx(wlp, rel=1e-9), p


def test_fit_is_partition_invariant_bitwise(spark):
    rows = [(i, "banana band ban anna nab") for i in range(24)]
    d1 = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(1)
    d8 = spark.createDataFrame(rows, ["doc_id", "text"]).repartition(8)
    a = learn_unigram_lm(d1, vocab_size=16, max_piece_len=3)
    b = learn_unigram_lm(d8, vocab_size=16, max_piece_len=3)
    assert a == b  # exact-decimal E-step sums ⇒ bit-identical fits


def test_encode_unigram_and_oov_fallback(spark):
    model = learn_unigram_lm(
        spark.createDataFrame(
            [(0, "banana band ban"), (1, "banana banana band")],
            ["doc_id", "text"],
        ),
        vocab_size=12,
        max_piece_len=4,
    )
    logp = dict(model)
    out = {
        r.doc_id: r.pieces
        for r in encode_unigram(
            spark.createDataFrame(
                [(0, "banana ban"), (1, "band xyzzy")], ["doc_id", "text"]
            ),
            model,
            max_piece_len=4,
        ).collect()
    }
    # every emitted known piece is in the model; concatenation rebuilds text
    assert "".join(out[0]) == "bananaban"
    assert all(p in logp or len(p) == 1 for p in out[0])
    joined = "".join(out[1])
    assert joined == "bandxyzzy"  # OOV word still segments (char fallback)


def test_vocab_size_reached_and_chars_survive(spark):
    docs = spark.createDataFrame(
        [(i, "abcdefg abcdefg abcd efg") for i in range(6)],
        ["doc_id", "text"],
    )
    model = learn_unigram_lm(docs, vocab_size=10, max_piece_len=5)
    pieces = {p for p, _ in model}
    assert len(model) <= 10 + 7  # target + protected single chars
    for ch in "abcdefg":
        assert ch in pieces
