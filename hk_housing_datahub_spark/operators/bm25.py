"""BM25 lexical search over a document corpus.

The reference's retrieval surface is embedding-only ChromaDB top-k
(/root/reference/src/processors/rag/embedding.py:290-307) — `search_similar`
in operators/similarity.py re-expresses that half. This module adds the
lexical half every production retrieval stack pairs with it: an inverted
term index + Okapi BM25 ranking (Robertson & Zaragoza 2009, the
"+0.5 log" IDF variant that never goes negative), so a query can be
answered by terms the encoder never saw.

Plan shape at 100 TB:

- **Index build** (`bm25_postings`): one explode over tokens, then ONE
  compact-key shuffle keyed (doc, term) with map-side combine for term
  frequencies; doc length rides the same aggregate (dl = sum tf). The
  term document-frequency table is a second compact aggregate keyed by
  term. Both outputs are columnar-friendly and incrementally mergeable
  (tf and df are sums).
- **Query scoring** (`bm25_search`): the query-term list is broadcast
  (bounded by the QUERY, not the corpus) and semi-restricts the postings
  scan, so only postings of queried terms leave the scan; the per-term df
  rows for those terms are likewise bounded by |query terms| and are
  broadcast after restriction. Scoring is one (qid, doc) compact-key
  shuffle; top-k is TWO-PHASE (rank inside a doc-hash salt band, then
  rank the ≤ salts×k survivors) so one hot query term cannot funnel the
  whole candidate set through a single partition.

Oracle determinism: tf, df, dl and N are integers (exact on both
engines), avgdl is exact-int-sum / count, the per-term score is one fixed
double expression tree, and the per-document score is a LEFT FOLD over
terms in sorted term order (Spark `aggregate` over `array_sort`, DuckDB
`list_reduce` over `list(... ORDER BY term)`) — bit-identical totals, so
ranks and top-k membership agree exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

TOKEN_SPLIT = "[^a-z0-9]+"


def tokenize(text: Column) -> Column:
    """Lowercase alnum tokens, empties dropped (split artifacts)."""
    return F.filter(F.split(F.lower(text), TOKEN_SPLIT), lambda t: t != "")


def bm25_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """Build the inverted index: (postings, term_df).

    postings: (doc_id, term, tf, dl) — dl repeated per posting so scoring
    never re-joins the doc table. term_df: (term, df).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    postings = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    dl = postings.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    postings = postings.join(dl, "doc_id")
    term_df = postings.groupBy("term").agg(
        F.count(F.lit(1)).alias("df")
    )
    return postings, term_df


def _idf(df: Column, n_docs: Column) -> Column:
    # Robertson/Sparck-Jones with the +1 floor: ln(1 + (N-df+.5)/(df+.5)).
    return F.log(
        F.lit(1.0)
        + (n_docs.cast("double") - df.cast("double") + F.lit(0.5))
        / (df.cast("double") + F.lit(0.5))
    )


def bm25_search(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
    salts: int = 64,
) -> DataFrame:
    """Top-k documents per query by BM25; (qid, doc_id, score, rank).

    Ties broken by doc_id ascending. ``queries`` is expected to be small
    (a literal or driver-provided set) — its exploded term list is
    broadcast into the postings scan.
    """
    postings, term_df = bm25_postings(docs, id_col, text_col)

    # corpus stats: N and avgdl from integer-exact sums
    stats = postings.groupBy("doc_id").agg(F.first("dl").alias("dl")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("dl").alias("tot_dl"),
    )

    qterms = (
        queries.select(
            F.col(qid_col).alias("qid"),
            F.explode(tokenize(F.col(qtext_col))).alias("term"),
        )
        .distinct()
    )
    # df rows restricted to queried terms: bounded by |query terms|,
    # broadcastable by construction (query-bounded, not corpus-bounded).
    q_with_df = F.broadcast(
        qterms.join(term_df, "term").crossJoin(F.broadcast(stats))
    )

    per_term = postings.join(q_with_df, "term").select(
        "qid",
        "doc_id",
        "term",
        (
            _idf(F.col("df"), F.col("n_docs"))
            * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
            / (
                F.col("tf").cast("double")
                + F.lit(k1)
                * (
                    F.lit(1.0 - b)
                    + F.lit(b)
                    * F.col("dl").cast("double")
                    / (
                        F.col("tot_dl").cast("double")
                        / F.col("n_docs").cast("double")
                    )
                )
            )
        ).alias("s"),
    )

    return _fold_and_topk(per_term, k, salts)


def _fold_and_topk(per_term: DataFrame, k: int, salts: int) -> DataFrame:
    """Shared ranking tail: deterministic left-fold of per-term scores
    in sorted term order (bit-stable totals on both engines), then
    two-phase top-k — local rank inside a doc-hash salt band first, so
    a stop-word-hot query never funnels every candidate into one
    task. Ties break on doc_id ascending."""
    scored = (
        per_term.groupBy("qid", "doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("term", "s"))).alias("ts"))
        .select(
            "qid",
            "doc_id",
            F.aggregate(
                F.transform("ts", lambda x: x["s"]),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("score"),
        )
    )
    order = [F.col("score").desc(), F.col("doc_id").asc()]
    banded = W.partitionBy("qid", F.pmod(F.col("doc_id"), F.lit(salts))).orderBy(
        *order
    )
    final = W.partitionBy("qid").orderBy(*order)
    return (
        scored.withColumn("r0", F.row_number().over(banded))
        .where(F.col("r0") <= k)
        .withColumn("rank", F.row_number().over(final))
        .where(F.col("rank") <= k)
        .drop("r0")
    )


def positional_postings(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(doc_id, term, pos): the positional inverted index — what turns
    the bag-of-words index above into a PHRASE-capable one (Lucene's
    proximity data, re-expressed). One posexplode projection; the index
    is written partitioned/sorted by term so a phrase query's scan
    prunes to exactly its terms."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(tokenize(F.col(text_col))).alias("pos", "term"),
    ).select("doc_id", "term", "pos")


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase matching: (doc_id, n_hits, first_pos) for documents
    containing the token sequence of ``phrase`` contiguously
    (overlapping occurrences each count — 'x x x' contains 'x x'
    twice).

    The classic positional-index algorithm, relationally: a posting of
    the i-th phrase term at position p votes for anchor p - i; an
    anchor collecting ALL m distinct phrase offsets is a hit. The
    (term, i) phrase table is a literal — it BROADCASTS and restricts
    the postings scan to the queried terms (predicate pushdown on the
    term column), so corpus cost is the postings of the phrase's terms
    only, then ONE compact (doc, anchor) shuffle. A phrase with
    repeated terms simply contributes several offsets per term — the
    distinct-offset count handles it with no special case."""
    post = positional_postings(docs, id_col, text_col)
    return phrase_search_postings(post, phrase)


def phrase_terms(phrase: str) -> list[str]:
    """The phrase's token sequence under the index tokenization."""
    import re as _re

    terms = [t for t in _re.split("[^a-z0-9]+", phrase.lower()) if t]
    if not terms:
        raise ValueError("empty phrase")
    return terms


def phrase_search_postings(post: DataFrame, phrase: str) -> DataFrame:
    """Phrase matching over a PREBUILT positional index — the production
    path: ``positional_postings`` is written once (partitioned/sorted
    by term), and each query's term-list filter pushes down to the
    parquet scan (``PushedFilters: In(term, ...)`` — plan-pinned in
    test_plans.py), so a query reads the postings of ITS terms only,
    never the index. Same votes/anchor algebra as :func:`phrase_search`.
    """
    terms = phrase_terms(phrase)
    m = len(terms)
    spark = post.sparkSession
    offsets = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], "term string, i int"
    )
    votes = (
        post.where(F.col("term").isin(terms))
        .join(F.broadcast(offsets), "term")
        .select(
            "doc_id", (F.col("pos") - F.col("i")).alias("anchor"), "i"
        )
        .where(F.col("anchor") >= 0)
    )
    hits = (
        votes.groupBy("doc_id", "anchor")
        .agg(F.countDistinct("i").alias("got"))
        .where(F.col("got") == m)
    )
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("anchor").alias("first_pos"),
    )


def bm25f_search(
    fields: DataFrame,
    queries: DataFrame,
    weights: dict,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    field_col: str = "field",
    text_col: str = "text",
    qid_col: str = "qid",
    qtext_col: str = "qtext",
    salts: int = 64,
) -> DataFrame:
    """BM25F fielded ranking (Robertson & Zaragoza 2009 §7): a term hit
    in the TITLE outweighs one in the body by combining per-field term
    frequencies BEFORE saturation —

        tf̃(t,d) = Σ_f w_f · tf_f / (1 − b + b · dl_f / avgdl_f)
        score    = Σ_t idf(t) · tf̃ / (k1 + tf̃)

    (the simple-BM25F form; saturating the weighted sum rather than
    each field separately is the whole point — two weak field hits
    don't double-count like two independent BM25 scores would).

    ``fields`` is long-format (id, field, text); ``weights`` maps field
    name → w_f and FIXES the field set (sorted order makes the combine
    expression deterministic on both engines). Plan shape mirrors
    bm25_search: one (doc, term) aggregate with per-field conditional
    counts (no per-field shuffle), per-doc field lengths ride a doc-
    keyed rollup, avgdl_f are two integer scalars, the query side
    broadcasts, and the ranking tail is the shared sorted-term fold +
    salt-banded top-k."""
    fnames = sorted(weights)
    # fields outside the weighted set carry w_f = 0 by definition — drop
    # them BEFORE tokenizing: their tokens must not inflate term df
    # (skewing idf) or emit zero-score (doc, term) rows that occupy
    # top-k slots, and the filter also prunes their tokenize cost
    toks = fields.filter(F.col(field_col).isin(fnames)).select(
        F.col(id_col).alias("doc_id"),
        F.col(field_col).alias("f"),
        F.explode(tokenize(F.col(text_col))).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(
        *[
            F.sum((F.col("f") == fn).cast("long")).alias(f"tf_{i}")
            for i, fn in enumerate(fnames)
        ]
    )
    dld = toks.groupBy("doc_id").agg(
        *[
            F.sum((F.col("f") == fn).cast("long")).alias(f"dl_{i}")
            for i, fn in enumerate(fnames)
        ]
    )
    stats = dld.agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[F.sum(f"dl_{i}").alias(f"tot_{i}") for i in range(len(fnames))],
    ).collect()[0]
    n_docs = int(stats["n_docs"])
    avg = [
        (int(stats[f"tot_{i}"] or 0) / max(n_docs, 1)) or 1.0
        for i in range(len(fnames))
    ]
    term_df = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    qterms = (
        queries.select(
            F.col(qid_col).alias("qid"),
            F.explode(tokenize(F.col(qtext_col))).alias("term"),
        )
        .distinct()
    )
    q_with_df = F.broadcast(qterms.join(term_df, "term"))

    joined = tf.join(dld, "doc_id").join(q_with_df, "term")
    tfw = None
    for i, fn in enumerate(fnames):
        part = (
            F.lit(float(weights[fn]))
            * F.col(f"tf_{i}").cast("double")
            / (
                F.lit(1.0 - b)
                + F.lit(b) * F.col(f"dl_{i}").cast("double") / F.lit(avg[i])
            )
        )
        tfw = part if tfw is None else tfw + part
    per_term = joined.select(
        "qid",
        "doc_id",
        "term",
        (
            _idf(F.col("df"), F.lit(n_docs)) * tfw / (F.lit(k1) + tfw)
        ).alias("s"),
    )
    return _fold_and_topk(per_term, k, salts)
