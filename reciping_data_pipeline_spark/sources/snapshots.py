"""Manifest-committed snapshot table format (Iceberg-style, pure parquet).

A second :class:`~reciping_data_pipeline_spark.sources.writers.TableFormat`
behind the ``sources.writers`` seam giving the reference's Iceberg
story (``/root/reference/docs/adr/002-apache-iceberg.md``,
``README.md:231-237`` — snapshot isolation, time travel, rollback,
binpack compaction, snapshot expiry) a real implementation built only
on parquet plus atomic manifest commits — no extra jars, public Spark
APIs only.

Layout::

    table/
      data/<partition dirs>/<txn>-<file>.parquet   immutable data files
      _snapshots/v00000001.json                    one manifest per version

A manifest is the COMPLETE file list of one table version plus the
schema and commit metadata. Readers resolve a manifest first and read
exactly its files; writers never delete or rewrite a committed file
(append / overwrite / compact all stage NEW files and commit a NEW
manifest). Hence a reader planning against version N is isolated from
every concurrent writer (snapshot isolation), and any historical
version stays readable until explicitly expired (time travel).

Commit protocol — optimistic concurrency: stage data files under
``data/`` (invisible until referenced), then publish ``v{N+1}.json``
by writing it to a scratch name and hard-linking to the version path
— the link is the exclusive-create arbiter AND makes the full content
visible atomically (no created-but-empty window for readers); losing
the race re-reads the winner's manifest as the new parent and
re-merges. On an object store this one point is replaced by a
compare-and-swap catalog entry (exactly the role Iceberg gives its
catalog) and the rest of the protocol is unchanged.

Scale notes: the manifest lists files, not rows — O(files) JSON, kept
small by compaction. Reads hand Spark an explicit file list with
``basePath`` so partition columns (and partition pruning) work exactly
as for a directory-addressed parquet table; predicate pushdown, column
pruning and AQE are untouched because the physical format is parquet.
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from datetime import datetime, timezone

import pyspark.sql.functions as F
from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from reciping_data_pipeline_spark.sources.writers import TableFormat

_SNAP_DIR = "_snapshots"
_DATA_DIR = "data"


def _snap_dir(path: str) -> str:
    return os.path.join(path, _SNAP_DIR)


def _manifest_path(path: str, version: int) -> str:
    return os.path.join(_snap_dir(path), f"v{version:08d}.json")


def versions(path: str) -> list[int]:
    """All committed versions, ascending."""
    d = _snap_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def load_manifest(path: str, version: int | None = None) -> dict:
    """Manifest of ``version`` (default: latest). Raises
    ``AnalysisException`` when the table (or version) does not exist,
    matching ``spark.read.parquet`` on a missing path so callers can
    treat both formats uniformly (e.g. the streaming ingest probe)."""
    vs = versions(path)
    if not vs:
        raise AnalysisException(f"[PATH_NOT_FOUND] No snapshot table at {path}")
    v = vs[-1] if version is None else version
    if v not in vs:
        raise AnalysisException(f"[VERSION_NOT_FOUND] No version {v} at {path} (have {vs})")
    with open(_manifest_path(path, v), encoding="utf-8") as fh:
        return json.load(fh)


def table_history(path: str) -> list[dict]:
    """Commit log, oldest first: version, operation, timestamp, file
    count — the reference inspects the same via Iceberg's
    ``table.history()``."""
    out = []
    for v in versions(path):
        m = load_manifest(path, v)
        out.append(
            {
                "version": m["version"],
                "parent": m["parent"],
                "operation": m["operation"],
                "committed_at": m["committed_at"],
                "n_files": len(m["files"]),
            }
        )
    return out


def _stage_files(df: DataFrame, path: str, partition_cols: list[str] | None) -> list[dict]:
    """Write ``df`` as immutable data files under ``data/`` and return
    their manifest entries. Files are written to a scratch dir then
    moved into the shared partition layout under a transaction-unique
    name — unreferenced until a manifest commit points at them.

    Column min/max bounds are captured HERE, at write time, from the
    just-written footers (page-cache hot, O(new files) per batch) —
    the Iceberg discipline: stats ride along with the commit, so
    ``read_where`` skipping works on fresh appends without a separate
    ANALYZE pass. ``collect_stats`` remains only as a backfill for
    tables written before this."""
    txn = uuid.uuid4().hex[:12]
    tmp = os.path.join(path, f"_txn-{txn}")
    writer = df.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(tmp)
    stat_cols = [f.name for f in df.schema.fields if f.name not in (partition_cols or [])]
    entries: list[dict] = []
    for dirpath, _, filenames in os.walk(tmp):
        for fname in filenames:
            if not fname.endswith(".parquet"):
                continue
            rel = os.path.relpath(dirpath, tmp)
            partition = "" if rel == "." else rel
            dest_dir = os.path.join(path, _DATA_DIR, partition) if partition else os.path.join(
                path, _DATA_DIR
            )
            os.makedirs(dest_dir, exist_ok=True)
            dest_name = f"{txn}-{fname}"
            dest = os.path.join(dest_dir, dest_name)
            os.rename(os.path.join(dirpath, fname), dest)
            rel_path = "/".join(p for p in (_DATA_DIR, partition, dest_name) if p)
            entries.append(
                {
                    "path": rel_path,
                    "partition": partition,
                    "stats": _file_column_stats(dest, stat_cols),
                }
            )
    shutil.rmtree(tmp, ignore_errors=True)
    return entries


def _evolved_schema_json(parent_schema_json: str | None, df_schema: StructType) -> str:
    """Additive schema evolution: the committed schema is the parent's
    columns (order preserved) plus any NEW columns the incoming frame
    introduces. A column present in both with a different type is a
    contract violation and raises — silent type widening is how
    warehouse tables rot."""
    if parent_schema_json is None:
        return df_schema.json()
    parent = StructType.fromJson(json.loads(parent_schema_json))
    by_name = {f.name: f for f in df_schema.fields}
    for f in parent.fields:
        if f.name in by_name and by_name[f.name].dataType != f.dataType:
            raise ValueError(
                f"schema evolution type conflict on {f.name!r}: "
                f"{f.dataType.simpleString()} -> {by_name[f.name].dataType.simpleString()}"
            )
    merged = list(parent.fields) + [
        f for f in df_schema.fields if f.name not in {p.name for p in parent.fields}
    ]
    return StructType(merged).json()


def _commit(
    path: str,
    merge,
    operation: str,
    schema_json: str,
    evolve: bool = False,
    extra: dict | None = None,
) -> dict:
    """Optimistic manifest commit. ``merge(parent_files) -> files``
    computes the new complete file list from the parent's; on an
    exclusive-create race the loop re-reads the winner and re-merges,
    so concurrent appends both land (serialized, neither lost). With
    ``evolve`` the committed schema is the additive union of the
    parent's and ``schema_json`` (append/merge paths); without it the
    incoming schema replaces wholesale (full overwrite).
    ``schema_json=None`` means "carry the parent's schema" — resolved
    INSIDE the retry loop, so a metadata-only commit (stats backfill)
    that loses the race to a schema-evolving append re-reads and
    carries the EVOLVED schema, never a stale caller-captured one."""
    while True:
        try:
            parent = load_manifest(path)
        except AnalysisException:
            parent = None
        version = (parent["version"] + 1) if parent else 1
        if schema_json is None:
            if parent is None:
                raise AnalysisException(
                    f"[PATH_NOT_FOUND] schema-carrying commit on missing table {path}"
                )
            committed_schema = parent["schema"]
        else:
            committed_schema = schema_json
        if evolve:
            committed_schema = _evolved_schema_json(
                parent["schema"] if parent else None,
                StructType.fromJson(json.loads(schema_json)),
            )
        manifest = {
            "version": version,
            "parent": parent["version"] if parent else None,
            "operation": operation,
            "committed_at": datetime.now(timezone.utc).isoformat(),
            "schema": committed_schema,
            "files": merge(parent["files"] if parent else []),
            **(extra or {}),
        }
        # Partition-spec consistency: a version whose files mix
        # partition layouts (e.g. unpartitioned base + partitioned
        # append) reads WRONG — Spark's basePath partition recovery
        # silently drops rows for the minority layout. Reject at
        # commit time; changing the spec requires overwrite_table
        # (which replaces the file set wholesale).
        specs = {
            tuple(kv.split("=", 1)[0] for kv in f["partition"].split("/"))
            if f["partition"]
            else ()
            for f in manifest["files"]
        }
        if len(specs) > 1:
            raise ValueError(
                f"partition spec conflict in commit to {path}: {sorted(specs)} — "
                "append/merge must match the table's existing partitioning; "
                "use overwrite_table to change the spec"
            )
        os.makedirs(_snap_dir(path), exist_ok=True)
        # Publish atomically: write the FULL manifest to a scratch name,
        # then hard-link it to the version path. link(2) fails with
        # FileExistsError if the version was taken (the exclusive-create
        # race arbiter), and the manifest appears with its complete
        # content in one step — a concurrent reader can never observe a
        # created-but-empty manifest (plain O_CREAT|O_EXCL + write has
        # exactly that window; it flaked the threaded race test).
        tmp = _manifest_path(path, version) + f".tmp-{uuid.uuid4().hex[:8]}"
        with open(tmp, "w", encoding="utf-8") as fh:
            json.dump(manifest, fh)
        try:
            os.link(tmp, _manifest_path(path, version))
        except FileExistsError:
            os.remove(tmp)
            COMMIT_RETRIES["count"] += 1
            continue
        os.remove(tmp)
        return manifest


# Observability: commit-race retries since process start (bench reads
# this to report optimistic-concurrency contention; a plain dict slot
# is atomic enough under the GIL for a monotonically growing counter).
COMMIT_RETRIES = {"count": 0}


def _manifest_partition_cols(manifest: dict) -> list[str]:
    """The table's current partition-key spec, recovered from any file
    entry's partition path ("year=2025/month=09" -> [year, month]).
    Empty for unpartitioned / empty tables. Used as the default spec
    for maintenance writes (compact/delete/merge) so they can never
    stage a conflicting layout."""
    for f in manifest["files"]:
        if f["partition"]:
            return [kv.split("=", 1)[0] for kv in f["partition"].split("/")]
    return []


def read_version(spark: SparkSession, path: str, version: int | None = None) -> DataFrame:
    """Read a table version (default latest) — the time-travel entry
    point. The file list comes from the manifest; ``basePath`` makes
    Spark recover partition columns from the directory fragments, so
    partition pruning and pushdown behave exactly as a directory scan."""
    m = load_manifest(path, version)
    schema = StructType.fromJson(json.loads(m["schema"]))
    if not m["files"]:
        return spark.createDataFrame([], schema)
    files = [os.path.join(path, f["path"]) for f in m["files"]]
    # The manifest schema is authoritative (not footer inference): files
    # written before an additive schema evolution simply lack the new
    # columns and surface them as NULL — no mergeSchema footer sweep.
    reader = spark.read.schema(schema)
    if any(f["partition"] for f in m["files"]):
        reader = reader.option("basePath", os.path.join(path, _DATA_DIR))
    return reader.parquet(*files)


class SnapshotFormat(TableFormat):
    """Drop-in ``TableFormat`` with snapshot semantics (see module
    docstring). Activate with ``writers.set_table_format(SnapshotFormat())``
    — zero pipeline-code changes, as required by the seam contract."""

    name = "snapshot"

    def overwrite_partitions(self, df: DataFrame, path: str, partition_cols: list[str]) -> None:
        new = _stage_files(df, path, partition_cols)
        replaced = {f["partition"] for f in new}

        def merge(parent_files: list[dict]) -> list[dict]:
            kept = [f for f in parent_files if f["partition"] not in replaced]
            return kept + new

        _commit(path, merge, "overwrite_partitions", df.schema.json(), evolve=True)

    def overwrite_table(
        self, df: DataFrame, path: str, partition_cols: list[str] | None = None
    ) -> None:
        new = _stage_files(df, path, partition_cols)
        _commit(path, lambda parent: new, "overwrite_table", df.schema.json())

    def append(self, df: DataFrame, path: str, partition_cols: list[str] | None = None) -> None:
        new = _stage_files(df, path, partition_cols)
        _commit(path, lambda parent: parent + new, "append", df.schema.json(), evolve=True)

    def read_table(self, spark: SparkSession, path: str) -> DataFrame:
        return read_version(spark, path, None)

    def table_exists(self, spark: SparkSession, path: str) -> bool:
        return bool(versions(path))


def rollback(path: str, version: int) -> dict:
    """Restore the table to an earlier version by committing a NEW
    manifest that references the old file list (Iceberg's
    ``rollback_to_snapshot``): history moves forward, nothing is
    deleted, and the bad version remains inspectable."""
    target = load_manifest(path, version)
    return _commit(
        path, lambda parent: list(target["files"]), f"rollback_to_v{version}", target["schema"]
    )


def compact(
    spark: SparkSession,
    path: str,
    partition_cols: list[str] | None = None,
    target_file_bytes: int = 128 * 1024 * 1024,
    conflict_retries: int = 2,
) -> dict:
    """Snapshot-preserving binpack compaction (the reference's Iceberg
    maintenance job, README.md:222-237): rewrite the CURRENT version's
    rows into ~``target_file_bytes`` files and commit them as a new
    version. Unlike the parquet-format ``compact_partitions`` this
    never rewrites in place — prior versions stay readable until
    expired, and a concurrent reader is never broken.

    Concurrency: the commit replaces exactly the file set this
    compaction READ (not the whole list), so an append landing
    mid-compaction carries through instead of being discarded; a
    concurrent rewrite of a compacted file (another compaction / a
    merge) raises through the conflict path and the compaction re-runs
    against the fresh snapshot."""
    current = load_manifest(path)
    df = read_version(spark, path, current["version"])
    if not current["files"]:
        return current
    if partition_cols is None:
        partition_cols = _manifest_partition_cols(current) or None
    total_bytes = sum(
        os.path.getsize(os.path.join(path, f["path"])) for f in current["files"]
    )
    # Bin count from observed bytes, not row counts: parquet encoding
    # decides bytes/row, so sizing off the files themselves is what
    # converges on the target (same approach as the parquet-format
    # compactor, but committed as a snapshot instead of in place).
    n_files = max(1, -(-total_bytes // target_file_bytes))
    staged = _stage_files(df.repartition(n_files), path, partition_cols)
    compacted = {f["path"] for f in current["files"]}

    def merge_files(parent_files: list[dict]) -> list[dict]:
        parent_paths = {f["path"] for f in parent_files}
        gone = [p for p in compacted if p not in parent_paths]
        if gone:
            raise ConcurrentMergeConflictError(
                f"files this compaction rewrote were rewritten concurrently: {gone[:3]}"
            )
        return [f for f in parent_files if f["path"] not in compacted] + staged

    try:
        return _commit(path, merge_files, "compact", df.schema.json())
    except ConcurrentMergeConflictError:
        if conflict_retries <= 0:
            raise
        return compact(
            spark, path, partition_cols, target_file_bytes,
            conflict_retries=conflict_retries - 1,
        )


def expire_snapshots(path: str, keep_last: int = 1) -> list[int]:
    """Garbage-collect history: drop all but the newest ``keep_last``
    manifests and delete data files no surviving manifest references
    (Iceberg's ``expire_snapshots``). Returns the expired versions.

    Concurrency guard: deletion candidates are collected first, then
    the CURRENT manifest set is re-read and anything referenced by a
    commit that landed mid-expiry (a rollback re-referencing old
    files, an append) is dropped from the candidate list — the same
    re-check discipline as ``remove_orphans``. Manifests for expired
    versions are removed only after their data-file sweep."""
    vs = versions(path)
    if len(vs) <= keep_last:
        return []
    expired, kept = vs[:-keep_last], vs[-keep_last:]
    referenced = {
        f["path"] for v in kept for f in load_manifest(path, v)["files"]
    }
    candidates: set[str] = set()
    for v in expired:
        for f in load_manifest(path, v)["files"]:
            if f["path"] not in referenced:
                candidates.add(f["path"])
    # Re-read EVERYTHING still committed (new commits included) before
    # deleting: a rollback that landed mid-expiry may reference these.
    referenced_now = {
        f["path"]
        for v in versions(path)
        if v not in expired
        for f in load_manifest(path, v)["files"]
    }
    for rel in candidates - referenced_now:
        full = os.path.join(path, rel)
        if os.path.isfile(full):
            os.remove(full)
    for v in expired:
        os.remove(_manifest_path(path, v))
    return expired


class ConcurrentMergeConflictError(RuntimeError):
    """A concurrent commit changed rows this merge read: files added
    since the merge's base snapshot contain merge keys, or a file the
    merge planned to rewrite was rewritten by someone else. Committing
    anyway would duplicate or lose rows; the merge must be re-run
    against the new snapshot."""


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: list[str],
    partition_cols: list[str] | None = None,
    conflict_retries: int = 2,
    _between_stage_and_commit=None,
) -> dict:
    """MERGE INTO (upsert) with file-granular copy-on-write — the
    Iceberg COW write path the reference's ADR relies on for dimension
    upserts. Matched keys take the update row, unmatched update rows
    insert, and ONLY data files that actually contain a matched key
    are rewritten; every other file carries over into the new manifest
    untouched (at 100 TB the rewrite cost is proportional to the
    touched files, not the table).

    Mechanics: tag current rows with ``input_file_name()``, semi-join
    against the distinct update keys to find the affected files
    (an O(files) driver list — same order as the manifest itself),
    anti-join those files' rows against the keys to keep the
    unmatched remainder, union the updates, stage, and commit
    ``parent - affected + staged``.

    Serializable-isolation validation (Iceberg's
    ``validateNoConflictingData`` analog, file-granular): the commit
    remembers the base snapshot's file set, and inside the optimistic
    retry loop a changed parent is checked for (a) disappearance of
    any file this merge planned to rewrite — its replacement holds
    rows this merge ALSO carries in its kept-remainder — and (b) any
    file added since the base containing one of the merge keys (a
    distributed semi-join over just the added files, O(new files)).
    Either raises :class:`ConcurrentMergeConflictError`; the merge is
    then re-run from the fresh snapshot up to ``conflict_retries``
    times (each abandoned attempt's staged files are crash debris for
    ``remove_orphans``). Disjoint merges — different files, different
    keys — still commit concurrently without conflict.

    ``_between_stage_and_commit`` is a deterministic-interleave test
    seam (runs after staging, before the commit attempt).
    """
    base = load_manifest(path)  # raise early when the table is missing
    if partition_cols is None:
        partition_cols = _manifest_partition_cols(base) or None
    base_paths = {f["path"] for f in base["files"]}
    cur = read_version(spark, path, base["version"]).withColumn(
        "_sg_file", F.input_file_name()
    )
    keys = updates.select(*key_cols).distinct()
    affected = {
        r["_sg_file"]
        for r in cur.join(keys, key_cols, "leftsemi").select("_sg_file").distinct().collect()
    }

    def _abs(rel: str) -> str:
        return "file://" + os.path.abspath(os.path.join(path, rel))

    def _is_affected(entry: dict) -> bool:
        a = _abs(entry["path"])
        return a in affected or a.removeprefix("file://") in affected

    if affected:
        kept = (
            cur.where(F.col("_sg_file").isin(*affected))
            .drop("_sg_file")
            .join(keys, key_cols, "left_anti")
        )
        merged = kept.unionByName(updates, allowMissingColumns=True)
    else:
        merged = updates
    staged = _stage_files(merged, path, partition_cols)
    staged_paths = {f["path"] for f in staged}

    def merge_files(parent_files: list[dict]) -> list[dict]:
        parent_paths = {f["path"] for f in parent_files}
        if parent_paths != base_paths:
            # A concurrent commit landed after our snapshot read.
            gone = [
                f["path"]
                for f in base["files"]
                if _is_affected(f) and f["path"] not in parent_paths
            ]
            if gone:
                raise ConcurrentMergeConflictError(
                    f"files this merge rewrites were rewritten concurrently: {gone[:3]}"
                )
            added = [
                f
                for f in parent_files
                if f["path"] not in base_paths and f["path"] not in staged_paths
            ]
            if added:
                schema = StructType.fromJson(json.loads(load_manifest(path)["schema"]))
                reader = spark.read.schema(schema)
                if any(f["partition"] for f in added):
                    reader = reader.option("basePath", os.path.join(path, _DATA_DIR))
                added_df = reader.parquet(
                    *[os.path.join(path, f["path"]) for f in added]
                )
                if not added_df.join(keys, key_cols, "leftsemi").isEmpty():
                    raise ConcurrentMergeConflictError(
                        "a concurrent commit added rows for keys this merge touches"
                    )
        return [f for f in parent_files if not _is_affected(f)] + staged

    if _between_stage_and_commit is not None:
        _between_stage_and_commit()
    try:
        return _commit(path, merge_files, "merge", updates.schema.json(), evolve=True)
    except ConcurrentMergeConflictError:
        if conflict_retries <= 0:
            raise
        return merge_upsert(
            spark,
            path,
            updates,
            key_cols,
            partition_cols,
            conflict_retries=conflict_retries - 1,
        )


def delete_where(
    spark: SparkSession,
    path: str,
    predicate,
    partition_cols: list[str] | None = None,
    conflict_retries: int = 2,
) -> dict | None:
    """Row-level DELETE with file-granular copy-on-write — the
    right-to-be-forgotten primitive a training-data warehouse cannot
    ship without. ONLY files containing a matching row are rewritten
    (without the matching rows); every other file carries over, so
    cost is proportional to the touched files, not the table. Returns
    the committed manifest, or ``None`` when nothing matched (no new
    version is created for a no-op delete).

    Concurrency mirrors :func:`merge_upsert`'s serializable check: a
    concurrent rewrite of a to-be-deleted file, or a concurrent commit
    ADDING rows that match the predicate (they would silently survive
    the delete), raises :class:`ConcurrentMergeConflictError` and the
    delete re-runs from the fresh snapshot (bounded retries)."""
    base = load_manifest(path)
    if partition_cols is None:
        partition_cols = _manifest_partition_cols(base) or None
    base_paths = {f["path"] for f in base["files"]}
    cur = read_version(spark, path, base["version"]).withColumn(
        "_sg_file", F.input_file_name()
    )
    affected = {
        r["_sg_file"]
        for r in cur.where(predicate).select("_sg_file").distinct().collect()
    }
    if not affected:
        return None

    def _abs(rel: str) -> str:
        return "file://" + os.path.abspath(os.path.join(path, rel))

    def _is_affected(entry: dict) -> bool:
        a = _abs(entry["path"])
        return a in affected or a.removeprefix("file://") in affected

    # SQL DELETE removes only rows where the predicate is TRUE. A bare
    # ~predicate evaluates NULL for rows where the predicate is NULL
    # (e.g. a NULL in the filtered column) and where() drops them — the
    # row is neither matched nor kept: silent data loss in the
    # right-to-be-forgotten primitive. Coalesce pins NULL to "not
    # deleted, so kept".
    kept = (
        cur.where(F.col("_sg_file").isin(*affected))
        .where(~F.coalesce(predicate, F.lit(False)))
        .drop("_sg_file")
    )
    staged = _stage_files(kept, path, partition_cols)
    staged_paths = {f["path"] for f in staged}

    def merge_files(parent_files: list[dict]) -> list[dict]:
        parent_paths = {f["path"] for f in parent_files}
        if parent_paths != base_paths:
            gone = [
                f["path"]
                for f in base["files"]
                if _is_affected(f) and f["path"] not in parent_paths
            ]
            if gone:
                raise ConcurrentMergeConflictError(
                    f"files this delete rewrites were rewritten concurrently: {gone[:3]}"
                )
            added = [
                f
                for f in parent_files
                if f["path"] not in base_paths and f["path"] not in staged_paths
            ]
            if added:
                schema = StructType.fromJson(json.loads(load_manifest(path)["schema"]))
                reader = spark.read.schema(schema)
                if any(f["partition"] for f in added):
                    reader = reader.option("basePath", os.path.join(path, _DATA_DIR))
                added_df = reader.parquet(
                    *[os.path.join(path, f["path"]) for f in added]
                )
                # mirror the TRUE-only match semantics of the delete
                if not added_df.where(F.coalesce(predicate, F.lit(False))).isEmpty():
                    raise ConcurrentMergeConflictError(
                        "a concurrent commit added rows matching this delete's predicate"
                    )
        return [f for f in parent_files if not _is_affected(f)] + staged

    try:
        return _commit(path, merge_files, "delete", None)
    except ConcurrentMergeConflictError:
        if conflict_retries <= 0:
            raise
        return delete_where(
            spark, path, predicate, partition_cols, conflict_retries=conflict_retries - 1
        )


class AuditFailedError(RuntimeError):
    """The write-audit-publish audit rejected the staged batch; the
    table is unchanged and the staged files are unreferenced debris
    for ``remove_orphans``."""


def wap_append(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    audit,
    partition_cols: list[str] | None = None,
) -> dict:
    """Write-Audit-Publish (Iceberg's WAP pattern): stage the batch's
    files (invisible — no manifest references them), run ``audit``
    against the WOULD-BE table state (current files ∪ staged files,
    exactly what readers would see post-publish), and only then commit.
    A failing audit raises :class:`AuditFailedError` with the table
    untouched — bad data never becomes readable, which is the entire
    point: quality gates run BETWEEN write and visibility, not after.

    ``audit(candidate_df) -> bool | None`` — return False (or raise)
    to reject. The publish itself follows the format's optimistic
    commit, so concurrent appends still serialize normally."""
    staged = _stage_files(df, path, partition_cols)
    try:
        current_files = load_manifest(path)["files"]
    except AnalysisException:
        current_files = []
    cand_entries = current_files + staged
    schema = _evolved_schema_json(
        load_manifest(path)["schema"] if current_files else None, df.schema
    )
    schema_t = StructType.fromJson(json.loads(schema))
    if cand_entries:
        reader = spark.read.schema(schema_t)
        if any(f["partition"] for f in cand_entries):
            reader = reader.option("basePath", os.path.join(path, _DATA_DIR))
        candidate = reader.parquet(
            *[os.path.join(path, f["path"]) for f in cand_entries]
        )
    else:
        candidate = spark.createDataFrame([], schema_t)
    ok = audit(candidate)
    if ok is False:
        raise AuditFailedError(
            f"audit rejected staged batch of {len(staged)} file(s) for {path}"
        )
    audited_paths = {f["path"] for f in current_files}

    def merge_files(parent_files: list[dict]) -> list[dict]:
        # A concurrent commit landing between audit and publish would be
        # merged in UN-audited (the audit ran against a stale candidate)
        # — the published whole-table state might never have passed the
        # audit. Detect the parent change inside the optimistic retry
        # loop and re-run the audit against the fresh candidate before
        # publishing; a now-failing audit aborts the publish.
        parent_paths = {f["path"] for f in parent_files}
        if parent_paths != audited_paths:
            cand = parent_files + staged
            reader = spark.read.schema(schema_t)
            if any(f["partition"] for f in cand):
                reader = reader.option("basePath", os.path.join(path, _DATA_DIR))
            fresh = reader.parquet(*[os.path.join(path, f["path"]) for f in cand])
            if audit(fresh) is False:
                raise AuditFailedError(
                    f"audit rejected post-concurrent-commit candidate for {path}"
                )
            audited_paths.clear()
            audited_paths.update(parent_paths)
        return parent_files + staged

    return _commit(path, merge_files, "wap-append", df.schema.json(), evolve=True)


def snapshot_diff(
    spark: SparkSession, path: str, version_from: int, version_to: int
) -> DataFrame:
    """Row-level change feed between two committed versions (CDC):
    rows only in ``version_to`` come back as ``_change_type='insert'``,
    rows only in ``version_from`` as ``'delete'`` (an update is a
    delete + insert pair). Multiset semantics via ``exceptAll``.

    File-pruned: manifests are compared first and ONLY files appearing
    in exactly one version are read — rows in carried-over files cannot
    differ (files are immutable), so a compaction that rewrites
    identical rows diffs to empty and an upsert reads just the touched
    files. Both sides are read with the ``version_to`` schema; a row
    whose only change is a NULL in a newly added column therefore
    reports as unchanged (additive evolution is not a row change)."""
    mf = load_manifest(path, version_from)
    mt = load_manifest(path, version_to)
    pf = {f["path"]: f for f in mf["files"]}
    pt = {f["path"]: f for f in mt["files"]}
    only_old = [pf[p] for p in sorted(pf.keys() - pt.keys())]
    only_new = [pt[p] for p in sorted(pt.keys() - pf.keys())]
    schema = StructType.fromJson(json.loads(mt["schema"]))

    def _read(entries: list[dict]) -> DataFrame:
        if not entries:
            return spark.createDataFrame([], schema)
        reader = spark.read.schema(schema)
        if any(e["partition"] for e in entries):
            reader = reader.option("basePath", os.path.join(path, _DATA_DIR))
        return reader.parquet(*[os.path.join(path, e["path"]) for e in entries])

    old_df, new_df = _read(only_old), _read(only_new)
    return (
        new_df.exceptAll(old_df)
        .withColumn("_change_type", F.lit("insert"))
        .unionByName(old_df.exceptAll(new_df).withColumn("_change_type", F.lit("delete")))
    )


def apply_changes(
    spark: SparkSession,
    path: str,
    changes: DataFrame,
    partition_cols: list[str] | None = None,
) -> dict | None:
    """Apply a :func:`snapshot_diff` change feed to ANOTHER snapshot
    table in ONE commit — the consumer half of the CDC story (mirror /
    downstream-replica maintenance): ``delete`` rows are removed with
    multiset semantics (``exceptAll``, matching how the diff was
    computed), ``insert`` rows are appended, and only files actually
    holding deleted rows are rewritten. Returns ``None`` for an empty
    feed. The round-trip law — applying ``snapshot_diff(A, v1, v2)``
    to a replica of ``A@v1`` yields exactly ``A@v2`` — is test-pinned.

    Follows the format's optimistic commit with the rewritten-file
    disappearance check; concurrent writers racing inserts against the
    feed are NOT key-validated (a replication target is single-writer
    by contract — use :func:`merge_upsert` for multi-writer upserts)."""
    base = load_manifest(path)
    if partition_cols is None:
        partition_cols = _manifest_partition_cols(base) or None
    data_cols = [c for c in changes.columns if c != "_change_type"]
    dels = changes.where(F.col("_change_type") == "delete").select(*data_cols)
    ins = changes.where(F.col("_change_type") == "insert").select(*data_cols)
    if changes.isEmpty():
        return None
    base_paths = {f["path"] for f in base["files"]}
    cur = read_version(spark, path, base["version"]).withColumn(
        "_sg_file", F.input_file_name()
    )
    affected = {
        r["_sg_file"]
        for r in cur.join(dels, data_cols, "leftsemi").select("_sg_file").distinct().collect()
    }

    def _abs(rel: str) -> str:
        return "file://" + os.path.abspath(os.path.join(path, rel))

    def _is_affected(entry: dict) -> bool:
        a = _abs(entry["path"])
        return a in affected or a.removeprefix("file://") in affected

    if affected:
        kept = (
            cur.where(F.col("_sg_file").isin(*affected))
            .drop("_sg_file")
            .exceptAll(dels)
        )
        merged = kept.unionByName(ins, allowMissingColumns=True)
    else:
        merged = ins
    staged = _stage_files(merged, path, partition_cols)

    def merge_files(parent_files: list[dict]) -> list[dict]:
        parent_paths = {f["path"] for f in parent_files}
        gone = [
            f["path"]
            for f in base["files"]
            if _is_affected(f) and f["path"] not in parent_paths
        ]
        if gone:
            raise ConcurrentMergeConflictError(
                f"files this change-apply rewrites were rewritten concurrently: {gone[:3]}"
            )
        return [f for f in parent_files if not _is_affected(f)] + staged

    return _commit(path, merge_files, "apply_changes", changes.drop("_change_type").schema.json(), evolve=True)


def append_stream_batch(
    df: DataFrame,
    path: str,
    batch_id: int,
    partition_cols: list[str] | None = None,
    audit=None,
) -> dict | None:
    """Transactional micro-batch append for ``foreachBatch`` sinks:
    the committing manifest records ``batch_id``, and a replayed batch
    (Structured Streaming re-offers the last uncommitted-at-crash
    batch after restart) finds its id already committed and becomes a
    no-op — exactly-once table growth WITHOUT relying on the payload
    being dedupable (the generic version of the corpus stream's
    fingerprint anti-join).

    ``audit(batch_df) -> bool | None`` turns the sink into a streaming
    quality circuit breaker (the WAP discipline per micro-batch): a
    False return raises :class:`AuditFailedError` BEFORE any file is
    staged, the foreachBatch call fails, the engine does not advance
    the checkpoint, and the batch is re-offered after the fix — a
    poisoned batch can never become readable.

    The replay check scans committed manifests (O(versions), bounded
    by ``expire_snapshots``); a catalog-backed deployment would keep
    the last batch id per stream in the table's CAS metadata instead.
    Returns the committed manifest, or ``None`` when the batch was
    already committed."""
    try:
        committed = any(
            load_manifest(path, v).get("batch_id") == batch_id for v in versions(path)
        )
    except AnalysisException:
        committed = False
    if committed:
        return None
    if audit is not None and audit(df) is False:
        raise AuditFailedError(
            f"audit rejected stream batch {batch_id} for {path}; "
            "checkpoint not advanced, batch will be re-offered"
        )
    new = _stage_files(df, path, partition_cols)
    return _commit(
        path,
        lambda parent: parent + new,
        "stream-append",
        df.schema.json(),
        evolve=True,
        extra={"batch_id": batch_id},
    )


def _file_column_stats(abs_path: str, stats_cols: list[str]) -> dict:
    """Per-file min/max for ``stats_cols`` from the parquet FOOTER
    (pyarrow metadata — no data pages read). Only bool/int/float/str
    bounds are recorded: those JSON round-trip AND compare correctly
    against query bounds of the same Python type. Temporal/decimal/
    binary stats are skipped entirely (their files are conservatively
    kept by ``read_where``) — a stringified fallback would compare
    lexicographically against typed bounds and could WRONGLY prune
    files that contain matching rows."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(abs_path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict = {}
    for col in stats_cols:
        if col not in idx:
            continue
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        if (
            lo is not None
            and type(lo) in (bool, int, float, str)
            and type(hi) in (bool, int, float, str)
        ):
            out[col] = [lo, hi]
    return out


def collect_stats(path: str, stats_cols: list[str], spark: SparkSession | None = None) -> dict:
    """Stats BACKFILL for files committed without bounds (pre-write-time
    -stats tables; ``_stage_files`` now records min/max at write time, so
    fresh commits never need this). Footer-only reads, no data scan;
    entries that already carry bounds for ``stats_cols`` are untouched,
    so re-analyze is incremental.

    With ``spark`` the footer reads fan out over the executors
    (``parallelize(paths).mapPartitions`` — at 100 TB / ~800k files a
    serial driver loop is hours; distributed it is one short metadata
    job returning O(files) small dicts). Without ``spark`` a driver
    loop handles small tables. The commit carries ``schema_json=None``
    so a lost optimistic race re-reads the winner's (possibly evolved)
    schema instead of clobbering it with a stale snapshot."""
    current = load_manifest(path)
    todo = [
        f["path"]
        for f in current["files"]
        if any(c not in f.get("stats", {}) for c in stats_cols)
    ]
    if spark is not None and todo:
        root = os.path.abspath(path)
        cols = list(stats_cols)
        n_slices = max(1, min(len(todo), spark.sparkContext.defaultParallelism))

        def _scan(paths):
            for rel in paths:
                yield rel, _file_column_stats(os.path.join(root, rel), cols)

        computed = dict(
            spark.sparkContext.parallelize(todo, n_slices).mapPartitions(_scan).collect()
        )
    else:
        computed = {
            rel: _file_column_stats(os.path.join(path, rel), stats_cols) for rel in todo
        }

    def merge(parent_files: list[dict]) -> list[dict]:
        out = []
        for f in parent_files:
            entry = dict(f)
            if entry["path"] in computed:
                entry["stats"] = {**computed[entry["path"]], **entry.get("stats", {})}
            out.append(entry)
        return out

    return _commit(path, merge, "collect_stats", None)


def read_where(
    spark: SparkSession,
    path: str,
    col: str,
    lo,
    hi,
    version: int | None = None,
) -> DataFrame:
    """Stats-pruned scan: read only the manifest files whose [min, max]
    for ``col`` intersects [lo, hi], then apply the residual filter.
    Files without stats are conservatively kept. This is manifest-level
    skipping — pruned files are never OPENED, one level above parquet's
    own row-group skipping (which still applies inside the survivors),
    and it composes with partition pruning because the surviving list
    keeps its directory fragments."""
    m = load_manifest(path, version)
    schema = StructType.fromJson(json.loads(m["schema"]))
    keep = []
    for f in m["files"]:
        st = f.get("stats", {}).get(col)
        if st is None or not (hi < st[0] or lo > st[1]):
            keep.append(f)
    if not keep:
        return spark.createDataFrame([], schema).where(F.col(col).between(lo, hi))
    reader = spark.read.schema(schema)
    if any(f["partition"] for f in keep):
        reader = reader.option("basePath", os.path.join(path, _DATA_DIR))
    df = reader.parquet(*[os.path.join(path, f["path"]) for f in keep])
    return df.where(F.col(col).between(lo, hi))


def pruned_file_count(path: str, col: str, lo, hi, version: int | None = None) -> tuple[int, int]:
    """(files kept, files total) for a [lo, hi] range on ``col`` — the
    observability hook for the skipping ratio (the reference tracks the
    same number as its partition-scan SLO)."""
    m = load_manifest(path, version)
    kept = 0
    for f in m["files"]:
        st = f.get("stats", {}).get(col)
        if st is None or not (hi < st[0] or lo > st[1]):
            kept += 1
    return kept, len(m["files"])


def remove_orphans(path: str, older_than_seconds: float = 3 * 86400.0) -> list[str]:
    """Delete data files no committed manifest references — the debris
    of writers that staged files but crashed before their manifest
    commit (Iceberg's ``remove_orphan_files``). Returns the removed
    relative paths.

    NOT safe against arbitrary in-flight writers by construction alone:
    ``_stage_files`` moves files into ``data/`` BEFORE the manifest
    commit, so a freshly staged file is indistinguishable from a crash
    orphan. Two guards make the sweep safe under the format's
    concurrent-writer contract:

    - an mtime age threshold (``older_than_seconds``, default 3 days —
      Iceberg's default for the same knob): anything younger than the
      cutoff, including ``_txn-*`` scratch dirs, is left alone, so a
      writer between staging and commit keeps its files as long as its
      stage-to-commit gap is under the threshold;
    - candidates are collected first and the referenced set is
      RE-READ after the walk — a commit that landed mid-walk gets its
      just-referenced files dropped from the candidate list before
      anything is deleted."""
    cutoff = time.time() - older_than_seconds
    referenced = {
        f["path"] for v in versions(path) for f in load_manifest(path, v)["files"]
    }
    candidates: list[str] = []
    data_root = os.path.join(path, _DATA_DIR)
    if os.path.isdir(data_root):
        for dirpath, _, filenames in os.walk(data_root):
            for fname in filenames:
                full = os.path.join(dirpath, fname)
                try:
                    young = os.path.getmtime(full) > cutoff
                except OSError:
                    continue
                rel = os.path.relpath(full, path)
                if rel not in referenced and not young:
                    candidates.append(rel)
    # Second look: drop anything a commit referenced while we walked.
    referenced_now = {
        f["path"] for v in versions(path) for f in load_manifest(path, v)["files"]
    }
    removed: list[str] = []
    for rel in candidates:
        if rel in referenced_now:
            continue
        try:
            os.remove(os.path.join(path, rel))
        except FileNotFoundError:
            continue
        removed.append(rel)
    for entry in os.listdir(path):
        if entry.startswith("_txn-"):
            full = os.path.join(path, entry)
            try:
                if os.path.getmtime(full) > cutoff:
                    continue
            except OSError:
                continue
            shutil.rmtree(full, ignore_errors=True)
            removed.append(entry)
    return removed
