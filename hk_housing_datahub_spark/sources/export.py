"""Debug/object-store export sinks (reference K4/K6 parity).

- ``export_debug_json``: the reference's ad-hoc debug dump of fetched
  responses (/root/reference/src/crawlers/wiki/wiki.py writes raw JSON docs
  for inspection) as a declarative sink: newline-delimited JSON, optional
  row cap, single file for eyeballing or sharded for scale.
- Object-store note (K6): every writer here takes any Hadoop FileSystem
  URI — ``s3a://bucket/path`` works unchanged when the cluster ships
  ``hadoop-aws``; this sandbox has no S3 jar, so the scheme passthrough is
  exercised with ``file:`` URIs in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def export_debug_json(
    df: DataFrame, path: str, limit: int | None = None, single_file: bool = True
) -> int:
    """Write ``df`` as newline-delimited JSON for debugging. Returns the
    row count written. ``single_file=True`` coalesces to one shard (debug
    dumps are small by contract — pass False for large exports so the
    write stays partition-parallel)."""
    out = df.limit(limit) if limit is not None else df
    writer = out.coalesce(1) if single_file else out
    writer.write.mode("overwrite").json(path)
    # Count what actually landed (one write job, one cheap re-read): with a
    # limit on a nondeterministic source, counting the input lineage could
    # describe a different sample than the files on disk.
    try:
        return df.sparkSession.read.json(path).count()
    except Exception:  # empty export: nothing but _SUCCESS → no schema
        return 0
