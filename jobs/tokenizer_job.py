"""Cluster entry point for tokenizer training — BPE merges + corpus
tokenization stats from a document corpus (parquet dir or catalog table).

    spark-submit --master <cluster> --py-files <pkg.zip> jobs/tokenizer_job.py \
        --input /data/docs.parquet --output /models/tok \
        --merges 32000 --min-word-count 2 --local-threshold 5000000

Writes under --output:
  merges.parquet    (merge_rank, lhs, rhs, freq) — the tokenizer
  merges.txt        one 'lhs rhs' per line in rank order (the
                    subword-nmt/HF interchange format)
  fertility.parquet per-language tokens-per-char of the trained
                    tokenizer over the input corpus (--fertility)

Execution model: the corpus is touched ONCE (the distributed
word-frequency aggregate); the merge loop then runs driver-local with
incremental pair statistics when the vocabulary fits under
--local-threshold rows (the subword-nmt/HF model — 32k merges in
seconds), else as distributed per-merge rounds over the Heaps'-law-small
word table. Both paths are bit-identical (tests/test_bpe.py).
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="", help="parquet path of documents")
    ap.add_argument(
        "--input-table", default="",
        help="read documents from this catalog table instead of --input",
    )
    ap.add_argument("--catalog", default="", help="table-catalog root")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument(
        "--family", default="bpe", choices=["bpe", "unigram"],
        help="tokenizer model family: BPE merge loop or unigram-LM EM",
    )
    ap.add_argument("--merges", type=int, default=1000)
    ap.add_argument(
        "--vocab-size", type=int, default=8000,
        help="unigram family: target piece-vocabulary size",
    )
    ap.add_argument(
        "--max-piece-len", type=int, default=8,
        help="unigram family: maximum piece length in characters",
    )
    ap.add_argument("--min-word-count", type=int, default=2)
    ap.add_argument("--min-pair-count", type=int, default=2)
    ap.add_argument(
        "--local-threshold", type=int, default=5_000_000,
        help="collect the word table and run the merge loop driver-local "
        "when it has at most this many rows; 0 forces distributed rounds",
    )
    ap.add_argument(
        "--fertility", action="store_true",
        help="also tokenize the corpus and write per-language "
        "tokens-per-char stats",
    )
    ap.add_argument("--text-col", default="text")
    args = ap.parse_args()
    if bool(args.input) == bool(args.input_table):
        ap.error("pass exactly one of --input / --input-table")
    if args.input_table and not args.catalog:
        ap.error("--input-table needs --catalog")

    os.environ.setdefault("SPARK_SUBMIT_MODE", "1")
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.operators.bpe import (
        encode_bpe,
        learn_bpe,
        merges_to_df,
    )
    from hk_housing_datahub_spark.session import get_spark

    spark = get_spark(app_name="hk_tokenizer_job")
    if args.input_table:
        from hk_housing_datahub_spark.sources import TableCatalog

        docs = TableCatalog(spark, args.catalog).read(args.input_table)
    else:
        docs = spark.read.parquet(args.input)

    if args.family == "unigram":
        from hk_housing_datahub_spark.operators.unigram_lm import (
            learn_unigram_lm,
        )

        model = learn_unigram_lm(
            docs,
            vocab_size=args.vocab_size,
            text_col=args.text_col,
            min_count=args.min_word_count,
            max_piece_len=args.max_piece_len,
        )
        os.makedirs(args.output, exist_ok=True)
        spark.createDataFrame(model, ["piece", "logp"]).coalesce(
            1
        ).write.mode("overwrite").parquet(
            os.path.join(args.output, "unigram.parquet")
        )
        txt = os.path.join(args.output, "unigram_vocab.txt")
        with open(txt + ".tmp", "w") as f:
            for piece, logp in model:  # SentencePiece .vocab format
                f.write(f"{piece}\t{logp:.6f}\n")
        os.replace(txt + ".tmp", txt)
        print(json.dumps({
            "family": "unigram",
            "pieces": len(model),
            "requested": args.vocab_size,
        }))
        return

    merges = learn_bpe(
        docs,
        num_merges=args.merges,
        text_col=args.text_col,
        min_word_count=args.min_word_count,
        min_pair_count=args.min_pair_count,
        local_threshold=args.local_threshold,
    )
    os.makedirs(args.output, exist_ok=True)
    merges_to_df(spark, merges).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(args.output, "merges.parquet")
    )
    txt = os.path.join(args.output, "merges.txt")
    with open(txt + ".tmp", "w") as f:
        for _, l, r, _ in merges:
            f.write(f"{l} {r}\n")
    os.replace(txt + ".tmp", txt)

    summary = {"merges": len(merges), "requested": args.merges}
    if args.fertility:
        enc = encode_bpe(
            docs, merges, text_col=args.text_col, mode="pandas"
        )
        fert = enc.groupBy("lang" if "lang" in docs.columns else F.lit("all").alias("lang")).agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_bpe_tokens").alias("total_tokens"),
            F.sum(F.length(args.text_col)).alias("total_chars"),
            F.round(
                F.sum("n_bpe_tokens") / F.sum(F.length(args.text_col)), 6
            ).alias("tokens_per_char"),
        )
        fert.coalesce(1).write.mode("overwrite").parquet(
            os.path.join(args.output, "fertility.parquet")
        )
        summary["fertility_rows"] = spark.read.parquet(
            os.path.join(args.output, "fertility.parquet")
        ).count()
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
