"""Cluster entry point for the RAG pipeline — the spark-submit deployment
path for the reference's EP3 flow (orchestrators/rag.py:15-29 →
processors/rag/embedding.py:264-307):

    spark-submit --master <cluster> \
        --py-files "$(python -c 'from hk_housing_datahub_spark.session import package_zip; print(package_zip())')" \
        jobs/rag_job.py --tables-dir <sf_dir> --out <dir> --k 5

Chunks the document corpus (sentence-aware pandas UDF), writes the
vector-store table (iterator-UDF encoder — swap in a real model inside
functions/embedding.py's ``_make_encoder``), and answers a batch of
text queries with the sparse inverted-index ``search_similar`` top-k.
Same script on local[N], local-cluster[W,C,M], or a real master.
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tables-dir", default="/root/testdata/sf0.001",
                    help="dir with documents.parquet")
    ap.add_argument("--out", required=True, help="output dir")
    ap.add_argument("--query-every", type=int, default=101,
                    help="every Nth document's text becomes a query")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument(
        "--semdedup-tau", type=float, default=None,
        help="if set, SemDeDup the chunk vectors at this cosine "
        "threshold before writing the vector store (drops semantically "
        "near-identical chunks so the index never serves duplicates)",
    )
    ap.add_argument("--semdedup-k", type=int, default=8,
                    help="k-means clusters for the SemDeDup pass")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_SUBMIT_MODE", "1")
    from pyspark.sql import functions as F

    from hk_housing_datahub_spark.functions.chunking import chunk_documents
    from hk_housing_datahub_spark.functions.embedding import embed_documents
    from hk_housing_datahub_spark.operators.similarity import search_similar
    from hk_housing_datahub_spark.session import get_spark

    spark = get_spark(app_name="hk_rag_job")
    docs = spark.read.parquet(os.path.join(args.tables_dir, "documents.parquet"))

    chunks = chunk_documents(docs)
    # K5 vector-store sink: (chunk_id, embedding, embedding_norm)
    vectors = embed_documents(chunks)
    semdedup_stats = None
    if args.semdedup_tau is not None:
        # SemDeDup pass (operators/semdedup.py): cluster the chunk
        # embeddings, drop all-but-the-least-typical of every
        # within-tau group; the surviving id set filters BOTH the
        # vector store and the chunks the search index is built from
        from hk_housing_datahub_spark.operators.semdedup import semdedup

        tagged = semdedup(
            vectors, k=args.semdedup_k, tau=args.semdedup_tau,
            id_col="chunk_id",
        ).cache()
        keep = tagged.filter(F.col("kept")).select("chunk_id")
        semdedup_stats = {
            "chunks_in": tagged.count(),
            "chunks_kept": keep.count(),
        }
        vectors = vectors.join(keep, "chunk_id", "left_semi")
        chunks = chunks.join(keep, "chunk_id", "left_semi")
    vectors.write.mode("overwrite").parquet(os.path.join(args.out, "chunk_vectors"))

    queries = docs.filter(
        F.pmod("doc_id", F.lit(args.query_every)) == 0
    ).select(F.col("doc_id").alias("qid"), F.col("text").alias("qtext"))
    neighbors = search_similar(chunks, queries, k=args.k)
    neighbors.write.mode("overwrite").parquet(os.path.join(args.out, "neighbors"))

    out = spark.read.parquet(os.path.join(args.out, "neighbors"))
    summary = {
        "chunks": chunks.count(),
        "queries": queries.count(),
        "neighbor_rows": out.count(),
        "k": args.k,
    }
    if semdedup_stats is not None:
        summary["semdedup"] = semdedup_stats
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
