"""Driver-checkable catalog entry for Z-order layout + stats skipping.

``sources/layout.zorder_frame`` clusters rows on a Morton curve over
quantile-bucket indexes; the snapshot format records per-file min/max
at write time; ``snapshots.read_where`` prunes manifest files whose
bounds miss the predicate. This query exercises the full chain as a
driver row, mirroring the reference's partition-scan-ratio SLO
(``/root/reference/README.md`` scan-ratio requirement): lay the
``documents`` table out Z-ordered on ``(doc_id, n_chars)``, probe a
narrow range on EACH dimension, and report per probe the row count,
a content checksum (sum of n_chars), and whether manifest-level file
skipping actually engaged.

The DuckDB oracle recomputes rows/checksums straight from the raw
``documents`` view with the same integer-derived bounds — any drift in
the pruned scan's ROWS breaks the hash — and pins ``files_pruned`` to
TRUE: a layout that stops skipping (every file overlapping every
range) fails the driver check, which is precisely the point of
Z-order over a single-column sort (the second dimension would prune
nothing there).

The Z-ordered snapshot table is a per-SF cached fixture built with the
sentinel + atomic-rename discipline (a partial build can never poison
the comparison).
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.queries import query
from reciping_data_pipeline_spark.sources import snapshots
from reciping_data_pipeline_spark.sources.layout import zorder_frame
from reciping_data_pipeline_spark.tables import load_table

_SENTINEL = "_FIXTURE_COMPLETE"
_N_FILES = 8


def _sf_tag(sf_dir: str) -> str:
    """Cache tag tied to the SOURCE data's identity (mtime+size of
    documents.parquet), not just the SF name: testdata regenerated
    between rounds must invalidate cached fixtures, or a stale layout
    silently diverges from the oracle's fresh reads."""
    tag = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    src = os.path.join(sf_dir, "documents.parquet")
    try:
        st = os.stat(src)
        stamp = f"{int(st.st_mtime)}_{st.st_size}"
    except OSError:
        stamp = "nosrc"
    return f"{tag}_{stamp}"


def _fixture_dir(sf_dir: str) -> str:
    return os.path.join(
        tempfile.gettempdir(), f"zorder_skip_fixture_{_sf_tag(sf_dir)}_v1"
    )


def _ensure_layout(spark: SparkSession, sf_dir: str) -> str:
    """Build (once per SF) a snapshot table of ``documents`` Z-ordered
    on (doc_id, n_chars). Built into a scratch dir, sentinel-marked,
    atomically renamed — same discipline as the medallion fixture."""
    root = _fixture_dir(sf_dir)
    table = os.path.join(root, "documents_z")
    if os.path.isfile(os.path.join(root, _SENTINEL)):
        return table
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "source")
    tmp = f"{root}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    snapshots.SnapshotFormat().overwrite_table(
        zorder_frame(docs, ["doc_id", "n_chars"], n_files=_N_FILES),
        os.path.join(tmp, "documents_z"),
    )
    with open(os.path.join(tmp, _SENTINEL), "w", encoding="utf-8"):
        pass
    if os.path.isdir(root) and not os.path.isfile(os.path.join(root, _SENTINEL)):
        shutil.rmtree(root, ignore_errors=True)
    try:
        os.rename(tmp, root)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isfile(os.path.join(root, _SENTINEL)):
            raise
    return table


@query(
    "doc_zorder_skipping",
    oracle="""
    WITH b AS (
        SELECT CAST(floor(max(doc_id) / 16) AS BIGINT) AS id_hi,
               min(n_chars) AS c_lo,
               CAST(min(n_chars)
                    + floor((max(n_chars) - min(n_chars)) / 16) AS BIGINT) AS c_hi
        FROM documents
    )
    SELECT 'doc_id' AS probe,
           count(*) AS n_rows,
           CAST(coalesce(sum(n_chars), 0) AS BIGINT) AS sum_chars,
           true AS files_pruned
    FROM documents, b
    WHERE doc_id BETWEEN 0 AND b.id_hi
    UNION ALL
    SELECT 'n_chars',
           count(*),
           CAST(coalesce(sum(n_chars), 0) AS BIGINT),
           true
    FROM documents, b
    WHERE n_chars BETWEEN b.c_lo AND b.c_hi
    """,
    doc="Z-order layout + manifest min/max skipping, end to end: a "
    "1/16-of-the-value-space range on EITHER layout dimension must "
    "read a strict subset of the table's files (files_pruned) while "
    "returning exactly the directory-scan rows (n_rows + checksum vs "
    "the raw table). At 100 TB this chain — write-time stats, "
    "manifest pruning before any file opens, parquet row-group "
    "skipping inside survivors — is the difference between a full "
    "scan and a bounded one on multi-dimensional predicates.",
    tags=("layout", "zorder", "skipping", "snapshot", "bench"),
)
def doc_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    table = _ensure_layout(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    b = docs.agg(
        F.floor(F.max("doc_id") / 16).cast("long").alias("id_hi"),
        F.min("n_chars").alias("c_lo"),
        (F.min("n_chars") + F.floor((F.max("n_chars") - F.min("n_chars")) / 16))
        .cast("long")
        .alias("c_hi"),
    ).collect()[0]

    # ^ driver-side collect of ONE aggregate row (probe bounds): file
    # pruning is metadata-driven, so the bounds must be literals at
    # plan time — O(1) control plane, not a data collect.

    def _probe(name: str, col: str, lo: int, hi: int) -> DataFrame:
        kept, total = snapshots.pruned_file_count(table, col, lo, hi)
        scan = snapshots.read_where(spark, table, col, lo, hi)
        return scan.agg(
            F.lit(name).alias("probe"),
            F.count("*").alias("n_rows"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).cast("long").alias("sum_chars"),
            F.lit(bool(kept < total)).alias("files_pruned"),
        )

    return _probe("doc_id", "doc_id", 0, b["id_hi"]).unionByName(
        _probe("n_chars", "n_chars", b["c_lo"], b["c_hi"])
    )


def _ensure_token_index(spark: SparkSession, sf_dir: str) -> str:
    """Per-SF snapshot table of documents (8 files) WITH a built
    file-level inverted token index — sentinel + atomic-rename, same
    discipline as the Z-order fixture."""
    from reciping_data_pipeline_spark.sources import textindex

    root = os.path.join(
        tempfile.gettempdir(), f"token_index_fixture_{_sf_tag(sf_dir)}_v1"
    )
    table = os.path.join(root, "documents_tok")
    if os.path.isfile(os.path.join(root, _SENTINEL)):
        return table
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    tmp = f"{root}.tmp.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    t = os.path.join(tmp, "documents_tok")
    snapshots.SnapshotFormat().overwrite_table(
        docs.repartitionByRange(_N_FILES, "doc_id"), t
    )
    textindex.build_token_index(spark, t)
    with open(os.path.join(tmp, _SENTINEL), "w", encoding="utf-8"):
        pass
    if os.path.isdir(root) and not os.path.isfile(os.path.join(root, _SENTINEL)):
        shutil.rmtree(root, ignore_errors=True)
    try:
        os.rename(tmp, root)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)
        if not os.path.isfile(os.path.join(root, _SENTINEL)):
            raise
    return table


@query(
    "doc_token_index_needle",
    oracle=r"""
    WITH needle AS (
        SELECT (regexp_split_to_array(trim(text), '\s+'))[-1] AS tok
        FROM documents WHERE doc_id = 0
    )
    SELECT doc_id, lang, source
    FROM documents, needle
    WHERE list_contains(regexp_split_to_array(trim(text), '\s+'), needle.tok)
    """,
    doc="Needle-in-haystack text search THROUGH the file-level "
    "inverted token index (sources/textindex.py): the needle (the "
    "last token of doc 0) resolves to posted files via a pushed-down "
    "postings lookup, only those files are opened, and the exact "
    "whitespace-token containment predicate runs as the residual. "
    "The oracle recomputes the answer with a FULL scan — a false "
    "negative anywhere in the index chain breaks the hash. At 100 TB "
    "this is the difference between a corpus scan and a bounded read "
    "for every 'find documents mentioning X' curation query.",
    tags=("layout", "index", "text", "bench"),
)
def doc_token_index_needle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from reciping_data_pipeline_spark.sources import textindex

    table = _ensure_token_index(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    # one-row collect: the probe token must be a literal for the index
    # manifest's posting lookup (metadata pruning) — O(1) control plane
    needle = (
        docs.where(F.col("doc_id") == 0)
        .select(F.element_at(F.split(F.trim("text"), r"\s+"), -1).alias("tok"))
        .collect()[0]["tok"]
    )
    return textindex.read_with_token(spark, table, needle).select(
        "doc_id", "lang", "source"
    )
