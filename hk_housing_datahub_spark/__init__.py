"""hk_housing_datahub_spark — a PySpark-native crawl-frontier + ETL analytics engine.

A from-scratch rebuild of the dataflow semantics of
monitus2022/HK_Housing_Datahub (studied read-only at /root/reference) as an
idiomatic, distributed PySpark engine:

- ``datagen``    — deterministic synthetic Common-Crawl-style ``pages`` corpus
                   (url, warc_ts, html, text, lang) with Zipf host skew.
- ``functions``  — URL canonicalization, text analysis (lang-id, quality,
                   tokens, fingerprints), title-variant generation.
- ``extract``    — reference single-row HTML extractor + its vectorized
                   pandas-UDF twin (byte-identical per url).
- ``frontier``   — URL-seen set (exact anti-join + salted-bucket bloom state),
                   per-host politeness scheduler, resumable wave-loop crawler
                   with checkpoint manifests and per-partition lineage.
- ``operators``  — relational parity operators (rollups, windows, joins,
                   dedup incl. MinHash-LSH/SimHash, ANN similarity search).
- ``streaming``  — Structured Streaming variants (watermarked windowed aggs).
- ``multimodal`` — binary-column plumbing for image/audio payloads (decode
                   stubbed; Spark-side schema/batching real).

Everything is DataFrame/Catalyst-first; Python only appears inside
Arrow-vectorized pandas UDFs (never per-row UDFs).
"""

__version__ = "0.1.0"
