"""BPE trainer/encoder vs an independent sequential reference.

The reference below is a direct transcription of the Sennrich et al.
2016 algorithm (learn_bpe's get_stats / merge loop) operating on plain
Python dicts — no Spark, no SQL — with the repo's deterministic
tie-break (count desc, then lexicographic pair). The distributed
trainer must reproduce it exactly: ranks, pairs, frequencies, and the
final per-word symbolization."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hk_housing_datahub_spark.operators.bpe import (
    encode_bpe,
    learn_bpe,
    merge_pair,
    word_symbols,
)


def _ref_tokenize(text: str) -> list[str]:
    return [t for t in text.lower().split() if t]


def _ref_learn(corpus, num_merges, min_word_count=2, min_pair_count=2):
    freq: dict[str, int] = {}
    for text in corpus:
        for w in _ref_tokenize(text):
            freq[w] = freq.get(w, 0) + 1
    words = {
        w: list(w) + ["</w>"]
        for w, c in freq.items()
        if c >= min_word_count and "\x1f" not in w
    }
    merges = []
    for rank in range(num_merges):
        stats: dict[tuple[str, str], int] = {}
        for w, syms in words.items():
            for p in zip(syms, syms[1:]):
                stats[p] = stats.get(p, 0) + freq[w]
        cands = [(c, p) for p, c in stats.items() if c >= min_pair_count]
        if not cands:
            break
        best = min(cands, key=lambda t: (-t[0], t[1]))
        (c, (l, r)) = best
        merges.append((rank, l, r, c))
        for w, syms in words.items():
            words[w] = _ref_merge_pass(syms, l, r)
    return merges, words


def _ref_merge_pass(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "low lower newest widest new",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], ["doc_id", "text"]
    )


def test_learn_matches_sequential_reference(spark, docs):
    got = learn_bpe(docs, num_merges=8)
    want, _ = _ref_learn(CORPUS, 8)
    assert got == want
    assert len(got) == 8  # this corpus supports all 8 merges


def test_learn_final_vocab_matches_reference(spark, docs):
    got_m, wf = learn_bpe(docs, num_merges=8, return_vocab=True)
    want_m, want_words = _ref_learn(CORPUS, 8)
    got_words = {
        r["token"]: list(r["syms"])
        for r in wf.select("token", "syms").collect()
    }
    assert got_words == want_words


def test_overlapping_pair_merges_greedily_left_to_right(spark):
    # 'aaaa' under merge (a,a): greedy non-overlap -> [aa, aa, </w>]
    df = spark.createDataFrame([(0, "aaaa aaaa aaaa")], ["doc_id", "text"])
    merges, wf = learn_bpe(
        df, num_merges=1, min_word_count=2, min_pair_count=2,
        return_vocab=True,
    )
    assert merges == [(0, "a", "a", 9)]  # 3 adjacent pairs x freq 3
    [row] = wf.collect()
    assert list(row["syms"]) == ["aa", "aa", "</w>"]
    # odd length: trailing single 'a' survives
    out = spark.range(1).select(
        merge_pair(word_symbols(F.lit("aaa")), "a", "a").alias("s")
    ).collect()
    assert list(out[0]["s"]) == ["aa", "a", "</w>"]


def test_learn_stops_early_when_no_pair_reaches_min_count(spark):
    df = spark.createDataFrame(
        [(0, "ab ab cd cd")], ["doc_id", "text"]
    )
    merges = learn_bpe(df, num_merges=50, min_pair_count=2)
    want, _ = _ref_learn(["ab ab cd cd"], 50)
    assert merges == want
    assert 0 < len(merges) < 50  # ran dry before the budget


def test_encode_expr_and_pandas_paths_are_bit_identical(spark, docs):
    merges = learn_bpe(docs, num_merges=8)
    e1 = (
        encode_bpe(docs, merges, mode="expr")
        .select("doc_id", "bpe_tokens")
        .collect()
    )
    e2 = (
        encode_bpe(docs, merges, mode="pandas")
        .select("doc_id", "bpe_tokens")
        .collect()
    )
    assert sorted((r.doc_id, list(r.bpe_tokens)) for r in e1) == sorted(
        (r.doc_id, list(r.bpe_tokens)) for r in e2
    )
    # every doc's stream == per-word sequential encode; in-vocab words
    # land exactly on their learn-time symbolization
    _, wf = learn_bpe(docs, num_merges=8, return_vocab=True)
    sym_of = {r["token"]: list(r["syms"]) for r in wf.collect()}
    for r in e1:
        want = [
            s
            for w in _ref_tokenize(CORPUS[r.doc_id])
            for s in sym_of.get(w, _encode_seq(w, merges))
        ]
        assert list(r.bpe_tokens) == want


def _per_word(flat):
    """Split a flattened token stream back into words at </w> marks."""
    out, cur = [], []
    for s in flat:
        cur.append(s)
        if s.endswith("</w>"):
            out.append(cur)
            cur = []
    if cur:
        out.append(cur)
    return out


def _encode_seq(w, merges):
    syms = list(w) + ["</w>"]
    for _, l, r, _ in merges:
        syms = _ref_merge_pass(syms, l, r)
    return syms


def test_pandas_encoder_honors_duplicate_pair_ranks(spark):
    # A pair can reappear at a later rank (a later merge recreates the
    # adjacency). Sequential semantics: rank 0 merges what exists, the
    # later duplicate rank catches recreations — and a pair recreated
    # AFTER its only rank stays unmerged. Both paths must agree.
    merges = [(0, "a", "b", 9), (1, "c", "d", 8), (2, "a", "b", 7)]
    df = spark.createDataFrame(
        [(0, "abab acdb zzz")], ["doc_id", "text"]
    )
    e1 = encode_bpe(df, merges, mode="expr").collect()[0]
    e2 = encode_bpe(df, merges, mode="pandas").collect()[0]
    assert list(e1.bpe_tokens) == list(e2.bpe_tokens)
    for w in ["abab", "acdb", "zzz"]:
        assert _encode_seq(w, merges) == _per_word(list(e1.bpe_tokens))[
            ["abab", "acdb", "zzz"].index(w)
        ]


def test_learn_is_partition_invariant(spark, docs):
    m1 = learn_bpe(docs, num_merges=5)
    m2 = learn_bpe(docs.repartition(7), num_merges=5)
    assert m1 == m2


def test_learn_on_documents_table_checkpoints_stay_bounded(spark, sf_small):
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    merges = learn_bpe(docs, num_merges=6, checkpoint_every=2)
    assert len(merges) == 6
    assert [m[0] for m in merges] == list(range(6))
    # frequencies are non-increasing in rank... not guaranteed in BPE
    # generally (merges change counts), but each freq is >= min_pair
    assert all(m[3] >= 2 for m in merges)


def test_skip_list_encoder_equals_brute_sequential_hypothesis():
    """Pure-Python sweep (no Spark): the skip-listed sequential encoder
    must equal brute one-pass-per-rank application for arbitrary words
    and merge tables — including duplicate pairs at multiple ranks and
    merged symbols whose strings collide with later pairs' parts."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hk_housing_datahub_spark.operators.bpe import (
        _merge_index,
        encode_word_sequential,
    )

    sym = st.text(alphabet="ab", min_size=1, max_size=2)
    merge_tables = st.lists(
        st.tuples(sym, sym), min_size=0, max_size=12
    ).map(
        lambda ps: [(i, l, r, 1) for i, (l, r) in enumerate(ps)]
    )
    words = st.text(alphabet="ab", min_size=0, max_size=14)

    @settings(max_examples=300, deadline=None)
    @given(words, merge_tables)
    def check(w, merges):
        ranks_of, pair_by_rank = _merge_index(merges)
        got = encode_word_sequential(w, ranks_of, pair_by_rank)
        want = _encode_seq(w, merges)
        assert got == want, (w, merges)
        assert "".join(got) == w + "</w>"  # lossless

    check()


def test_local_merge_loop_identical_to_distributed(spark, docs):
    for k in (3, 8):
        dist = learn_bpe(docs, num_merges=k)
        loc = learn_bpe(docs, num_merges=k, local_threshold=1_000_000)
        assert dist == loc
    # final vocab identical too
    _, wf_d = learn_bpe(docs, num_merges=8, return_vocab=True)
    _, wf_l = learn_bpe(
        docs, num_merges=8, return_vocab=True, local_threshold=1_000_000
    )
    d = {r["token"]: (r["cnt"], list(r["syms"])) for r in wf_d.collect()}
    l = {r["token"]: (r["cnt"], list(r["syms"])) for r in wf_l.collect()}
    assert d == l
    # threshold smaller than the vocab: falls back to distributed
    small = learn_bpe(docs, num_merges=3, local_threshold=2)
    assert small == learn_bpe(docs, num_merges=3)


def test_local_merge_loop_deep_table_on_real_corpus(spark, sf_small):
    # 64 merges driver-local in one collect — vs 64 distributed rounds;
    # spot-check the shared prefix against a 6-merge distributed run
    docs = spark.read.parquet(f"{sf_small}/documents.parquet")
    loc = learn_bpe(docs, num_merges=64, local_threshold=1_000_000)
    dist6 = learn_bpe(docs, num_merges=6)
    assert loc[:6] == dist6
    assert len(loc) == 64
    assert [m[0] for m in loc] == list(range(64))


def test_local_incremental_stats_equal_brute_recount_hypothesis():
    """The incremental pair-count maintenance (delta subtract/add with a
    lazy index) must match brute per-round recounting for arbitrary
    corpora — pure Python on both sides, no Spark."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from hk_housing_datahub_spark.operators.bpe import _local_merge_loop

    corpora = st.lists(
        st.text(alphabet="abc ", min_size=0, max_size=30),
        min_size=1,
        max_size=8,
    )

    @settings(max_examples=200, deadline=None)
    @given(corpora, st.integers(min_value=1, max_value=12))
    def check(corpus, k):
        want_m, want_words = _ref_learn(corpus, k, min_word_count=1)
        freqs = {}
        for t in corpus:
            for w in _ref_tokenize(t):
                freqs[w] = freqs.get(w, 0) + 1
        got_m, got_words = _local_merge_loop(freqs, k, 2, "</w>")
        assert got_m == want_m, (corpus, k)
        assert {w: list(s) for w, s in got_words.items()} == want_words

    check()
