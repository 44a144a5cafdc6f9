"""Iceberg-style table catalog over partitioned Parquet + JSON manifests.

No Iceberg runtime jar ships in this sandbox (verified), so this module
provides the same operational contract behind a small abstraction — swap in
a real Iceberg catalog by replacing these four methods with
``spark.read.format("iceberg")`` / ``df.writeTo(...)`` calls:

- **append** (reference K1 bulk insert,
  /root/reference/src/processors/agency/agency_base.py:80-100): write new
  parquet files, then commit a new manifest snapshot (tmp+rename, atomic).
- **replace** (reference K7 drop_all+create_all,
  /root/reference/src/processors/agency/agency_base.py:108-115).
- **read**: loads only files listed in the current manifest — readers never
  see half-committed appends (snapshot isolation, Iceberg's core property).
  ``read(table, snapshot=N)`` time-travels to any retained snapshot, and
  ``read_changes(table, since)`` is the incremental scan (only the files
  appended after ``since``) — both resolved purely from manifest history,
  no data listing.
- per-snapshot lineage: row counts and added-file list per commit.
- **schema evolution** (add-column): every commit records its write schema in
  the manifest; ``read`` projects the metadata-resolved schema onto the files
  (older files return NULL for later-added columns) instead of
  ``mergeSchema``, which at 100 TB would read every parquet footer at plan
  time. Time travel reads the schema *as of* that snapshot.

Layout:  <root>/<table>/data/<snapshot>-<uuid>/part-*.parquet
         <root>/<table>/manifest.json   (current snapshot, committed last)
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class TableCatalog:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    # ------------------------------------------------------------ internals
    def _tdir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _manifest_path(self, table: str) -> str:
        return os.path.join(self._tdir(table), "manifest.json")

    def _load_manifest(self, table: str) -> dict:
        p = self._manifest_path(table)
        if not os.path.exists(p):
            return {"snapshot": 0, "files": [], "history": []}
        with open(p) as f:
            return json.load(f)

    def _commit(self, table: str, manifest: dict) -> None:
        os.makedirs(self._tdir(table), exist_ok=True)
        tmp = self._manifest_path(table) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f, indent=1)
        os.replace(tmp, self._manifest_path(table))

    def _write_data(
        self, table: str, df: DataFrame, snapshot: int, rows: int | None = None
    ) -> tuple[list[str], int]:
        dirname = f"{snapshot:06d}-{uuid.uuid4().hex[:8]}"
        out = os.path.join(self._tdir(table), "data", dirname)
        df.write.mode("overwrite").parquet(out)
        # callers that already know the row count (e.g. they just counted
        # the frame) skip the verification re-read — one job per commit
        n = self.spark.read.parquet(out).count() if rows is None else rows
        return [os.path.join("data", dirname)], n

    # ------------------------------------------------------------------ api
    def create(self, table: str, schema) -> bool:
        """CREATE TABLE IF NOT EXISTS with a declared StructType — the
        reference's ``Base.metadata.create_all`` DDL
        (/root/reference/src/processors/agency/buildings.py:51-52). Returns
        True if the table was created, False if it already existed. A
        declared schema makes ``read`` of an empty table return an empty
        DataFrame of that schema instead of raising."""
        m = self._load_manifest(table)
        if m.get("ddl") is not None or m["files"]:
            return False
        m["ddl"] = schema.json()
        m["history"].append({"snapshot": m["snapshot"], "op": "create"})
        self._commit(table, m)
        return True

    def schema_of(self, table: str, snapshot: int | None = None):
        """Table schema resolved purely from manifest metadata — the Iceberg
        contract (schema travels with snapshots, never parquet-footer
        merging, which at 100 TB means listing+reading every file footer).
        ``snapshot=N`` returns the schema as of that snapshot, so time travel
        reads pre-evolution data with its pre-evolution shape."""
        m = self._load_manifest(table)
        return self._schema_as_of(m, snapshot)

    def _schema_as_of(self, m: dict, snapshot: int | None = None):
        """Fold the per-commit write schemas into the table schema: columns
        union in first-seen order; a column added by a later append is
        nullable (older files lack it and read back as NULL — Iceberg's
        add-column rule). Type conflicts were rejected at write time."""
        from pyspark.sql import types as T

        fields: dict[str, T.StructField] = {}
        if m.get("ddl"):
            for f in T.StructType.fromJson(json.loads(m["ddl"])).fields:
                fields[f.name] = f
        for h in m["history"]:
            if snapshot is not None and h["snapshot"] > snapshot:
                break
            if "schema" not in h:
                continue
            if h["op"] == "replace":
                fields = {}  # REPLACE TABLE may redefine the schema outright
            for f in T.StructType.fromJson(json.loads(h["schema"])).fields:
                if f.name not in fields:
                    # added after table creation → some files miss it → must
                    # be readable as NULL
                    nullable = f.nullable or bool(fields)
                    fields[f.name] = T.StructField(f.name, f.dataType, nullable)
                elif fields[f.name].nullable != f.nullable:
                    old = fields[f.name]
                    fields[f.name] = T.StructField(old.name, old.dataType, True)
        return T.StructType(list(fields.values())) if fields else None

    def _check_write_schema(self, m: dict, df: DataFrame, table: str) -> None:
        """Add-column evolution only: a written column that already exists
        must keep its exact dataType (Iceberg would also allow widening
        promotions; we keep the stricter rule so every file in a table is
        bit-compatible with the resolved read schema)."""
        cur = self._schema_as_of(m)
        if cur is None:
            return
        have = {f.name: f.dataType for f in cur.fields}
        for f in df.schema.fields:
            if f.name in have and f.dataType != have[f.name]:
                raise ValueError(
                    f"schema evolution on table {table!r} rejected: column "
                    f"{f.name!r} is {have[f.name].simpleString()} but the "
                    f"write has {f.dataType.simpleString()} — only adding "
                    "new columns is supported"
                )

    def append(self, table: str, df: DataFrame, rows: int | None = None) -> int:
        """Append rows as a new snapshot; readers see them only after the
        manifest commit. Returns the new snapshot id.

        ``rows`` contract: pass it ONLY when it is the exact count of this
        ``df`` as written — i.e. ``df`` is persisted (or deterministic) and
        ``rows`` came from counting it, with no transformation in between.
        It is recorded verbatim into the snapshot lineage; a stale or
        recomputed-lineage count would silently corrupt the history the
        catalog exists to provide. Omit it to have the catalog verify by
        re-reading what was written."""
        m = self._load_manifest(table)
        self._check_write_schema(m, df, table)
        snap = m["snapshot"] + 1
        new_files, n = self._write_data(table, df, snap, rows)
        m["snapshot"] = snap
        m["files"] = m["files"] + new_files
        m["history"].append(
            {
                "snapshot": snap,
                "op": "append",
                "rows": n,
                "added": new_files,
                "schema": df.schema.json(),
            }
        )
        self._commit(table, m)
        return snap

    def replace(self, table: str, df: DataFrame) -> int:
        """REPLACE TABLE semantics: new snapshot referencing only new files
        (old files stay on disk for time travel until vacuumed)."""
        m = self._load_manifest(table)
        snap = m["snapshot"] + 1
        new_files, n = self._write_data(table, df, snap)
        m["snapshot"] = snap
        m["files"] = new_files
        m["history"].append(
            {
                "snapshot": snap,
                "op": "replace",
                "rows": n,
                "added": new_files,
                "schema": df.schema.json(),
            }
        )
        self._commit(table, m)
        return snap

    def compact(self, table: str, partitions: int | None = None) -> int:
        """Rewrite the table's current files into ``partitions`` coalesced
        files as a new snapshot — Iceberg's ``rewrite_data_files``. The
        small-file antidote for append-heavy tables (every crawl wave /
        pipeline batch adds a file set; scan-planning cost grows with file
        count). Data-equivalent by construction: time travel to older
        snapshots still works (until vacuum) and ``read_changes`` skips
        compact entries — a consumer's delta is unaffected because row
        content never changed. Returns the new snapshot id."""
        m = self._load_manifest(table)
        cur = self.read(table)
        if partitions:
            cur = cur.coalesce(partitions)
        snap = m["snapshot"] + 1
        new_files, n = self._write_data(table, cur, snap)
        m["snapshot"] = snap
        m["files"] = new_files
        m["history"].append(
            {
                "snapshot": snap,
                "op": "compact",
                "rows": n,
                "added": new_files,
                "schema": cur.schema.json(),
            }
        )
        self._commit(table, m)
        return snap

    def _files_at(self, m: dict, snapshot: int) -> list[str]:
        """File list as of ``snapshot``, replayed from manifest history.

        Pure driver-side metadata fold over O(history) entries — the same way
        Iceberg resolves a snapshot's manifest list; never lists data dirs."""
        files: list[str] = []
        for h in m["history"]:
            if h["snapshot"] > snapshot:
                break
            op = h["op"]
            if op == "append":
                files = files + h.get("added", [])
            elif op in ("replace", "compact"):
                files = list(h.get("added", []))
        return files

    def read(self, table: str, snapshot: int | None = None) -> DataFrame:
        """Current-snapshot read, or time travel with ``snapshot=N`` (the
        Iceberg ``VERSION AS OF`` contract). Time travel only sees snapshots
        whose files survive — ``vacuum`` expires non-current ones."""
        m = self._load_manifest(table)
        files = m["files"] if snapshot is None else self._files_at(m, snapshot)
        schema = self._schema_as_of(m, snapshot)
        if not files:
            if schema is not None:
                return self.spark.createDataFrame([], schema)
            raise FileNotFoundError(
                f"table {table} has no committed snapshot"
                + (f" at version {snapshot}" if snapshot is not None else "")
            )
        paths = [os.path.join(self._tdir(table), f) for f in files]
        if schema is not None:
            # metadata-resolved schema projection: files written before an
            # add-column read the new column as NULL; files written after a
            # time-travel target drop columns the target never had. No
            # mergeSchema footer listing — O(1) planning, not O(files).
            return self.spark.read.schema(schema).parquet(*paths)
        return self.spark.read.parquet(*paths)  # pre-evolution manifests

    def read_changes(
        self, table: str, since: int, until: int | None = None
    ) -> DataFrame:
        """Incremental scan: rows appended in snapshots (since, until].

        The CDC-style downstream contract (Iceberg's incremental read): a
        consumer that has processed up to snapshot S re-reads only the files
        added after S — O(delta), not O(table). A ``replace`` inside the
        range invalidates append-only semantics and raises; a ``compact``
        is data-equivalent (same rows, fewer files) and is skipped — its
        pre-compaction append files remain readable until ``vacuum``."""
        m = self._load_manifest(table)
        hi = m["snapshot"] if until is None else until
        added: list[str] = []
        for h in m["history"]:
            if since < h["snapshot"] <= hi:
                if h["op"] == "replace":
                    raise ValueError(
                        f"table {table} was replaced at snapshot "
                        f"{h['snapshot']}; incremental read since {since} "
                        "is not append-only — restart from a full read"
                    )
                if h["op"] == "compact":
                    continue
                added += h.get("added", [])
        schema = self._schema_as_of(m, hi)
        if not added:
            if schema is not None:
                return self.spark.createDataFrame([], schema)
            return self.read(table).limit(0)
        paths = [os.path.join(self._tdir(table), f) for f in added]
        if schema is not None:
            return self.spark.read.schema(schema).parquet(*paths)
        return self.spark.read.parquet(*paths)

    def history(self, table: str) -> list[dict]:
        return self._load_manifest(table)["history"]

    def current_snapshot(self, table: str) -> int:
        return self._load_manifest(table)["snapshot"]

    def vacuum(self, table: str) -> int:
        """Delete data dirs not referenced by the current snapshot — the
        Iceberg ``expire_snapshots`` trade: reclaims space, expires time
        travel to the removed snapshots."""
        import shutil

        m = self._load_manifest(table)
        keep = {os.path.basename(f) for f in m["files"]}
        data_root = os.path.join(self._tdir(table), "data")
        removed = 0
        if os.path.isdir(data_root):
            for d in os.listdir(data_root):
                if d not in keep:
                    shutil.rmtree(os.path.join(data_root, d))
                    removed += 1
        return removed


class IncrementalConsumer:
    """Durable CDC-style consumer over a catalog table's append stream.

    The downstream half of ``TableCatalog.read_changes``: a named consumer
    polls the delta since its committed cursor, processes it, then commits
    the new cursor. Until ``commit`` the cursor does not move, so a consumer
    that crashes mid-processing re-polls the same delta (at-least-once; pair
    with an idempotent sink — e.g. the star pipeline's PK anti-join — for
    exactly-once effect). Cursors are one JSON file per consumer inside the
    catalog root, committed tmp+rename like the table manifests.

    Scale: each poll reads only the files appended after the cursor —
    O(delta), never O(table) — so a consumer lagging N snapshots behind
    catches up by reading exactly those N snapshots' files.
    """

    def __init__(self, catalog: TableCatalog, name: str):
        self.catalog = catalog
        self.path = os.path.join(catalog.root, f"_consumer_{name}.json")

    def _cursors(self) -> dict:
        if not os.path.exists(self.path):
            return {}
        with open(self.path) as f:
            return json.load(f)

    def cursor(self, table: str) -> int:
        return int(self._cursors().get(table, 0))

    def poll(self, table: str) -> tuple[DataFrame, int]:
        """(delta rows since the committed cursor, head snapshot to commit
        after processing). The head is pinned at poll time: appends landing
        while the delta is processed stay for the next poll."""
        head = self.catalog.current_snapshot(table)
        return (
            self.catalog.read_changes(table, since=self.cursor(table), until=head),
            head,
        )

    def commit(self, table: str, snapshot: int) -> None:
        cur = self._cursors()
        cur[table] = int(snapshot)
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(cur, f, indent=1)
        os.replace(tmp, self.path)
