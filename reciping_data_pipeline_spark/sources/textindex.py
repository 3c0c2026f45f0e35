"""File-level inverted token index for snapshot tables.

Needle-in-haystack text queries ("every document mentioning X") on a
100 TB corpus cannot afford a full scan, and column min/max stats are
useless for containment predicates. The standard warehouse answer is
a FILE-GRANULAR inverted index (the same role Iceberg's Puffin blobs
or DataFusion's file indexes play): a small postings table mapping
token → data files that contain it. A needle query then:

1. looks up the token in the postings table — itself a parquet table
   range-laid-out on ``token``, so the lookup is a pushed-down
   predicate reading ~one row group, NOT a scan of the index;
2. opens exactly the posted files (∩ the current manifest, so files
   deleted/compacted since the index build drop out);
3. applies the exact containment predicate as a residual filter —
   the index can only FALSE-POSITIVE at file granularity, never
   change results.

Files committed AFTER the index build are conservatively always read
(the index records which table version it covers), so the index can
lag the table without ever being wrong — rebuilds are incremental
background work, exactly like stats backfill.

The index build is one distributed pass: tokenize, per-file distinct,
write. Postings are bounded by Σ_file |distinct tokens in file| —
vocabulary-sized per file, orders of magnitude below the data.
"""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.sources import snapshots

_INDEX_DIR = "_index"


def _index_root(path: str, version: int) -> str:
    return os.path.join(path, _INDEX_DIR, f"tokens-v{version:08d}")


def _latest_index_version(path: str) -> int | None:
    d = os.path.join(path, _INDEX_DIR)
    if not os.path.isdir(d):
        return None
    vs = []
    for name in os.listdir(d):
        if name.startswith("tokens-v") and os.path.isfile(
            os.path.join(d, name, "_INDEX_COMPLETE")
        ):
            try:
                vs.append(int(name[len("tokens-v"):]))
            except ValueError:
                continue
    return max(vs) if vs else None


def build_token_index(
    spark: SparkSession,
    path: str,
    text_col: str = "text",
    min_token_len: int = 3,
    n_buckets: int = 8,
) -> str:
    """Build (or rebuild) the postings table for the CURRENT table
    version. One distributed pass: tokenize → per-file distinct →
    range-layout on token (so lookups push down into ~one row group).
    The build is atomic: postings land under a version-named dir and
    a completion marker makes them visible."""
    m = snapshots.load_manifest(path)
    df = snapshots.read_version(spark, path, m["version"]).withColumn(
        "_file", F.input_file_name()
    )
    root = os.path.abspath(path)
    postings = (
        df.select(
            F.regexp_replace(F.col("_file"), "^file:(//)?", "").alias("_file"),
            F.explode(
                F.array_distinct(F.split(F.trim(F.col(text_col)), r"\s+"))
            ).alias("token"),
        )
        .where(F.length("token") >= min_token_len)
        # relative path = drop "<abs table root>/" prefix — positional
        # substring, not a regex (tmp paths may contain regex chars)
        .select(
            "token",
            F.col("_file").substr(F.lit(len(root) + 2), F.lit(1 << 20)).alias("file"),
        )
        .distinct()
        .repartitionByRange(n_buckets, "token")
        .sortWithinPartitions("token")
    )
    out = _index_root(path, m["version"])
    postings.write.mode("overwrite").parquet(out)
    with open(os.path.join(out, "_INDEX_META.json"), "w", encoding="utf-8") as fh:
        json.dump({"version": m["version"], "text_col": text_col,
                   "min_token_len": min_token_len}, fh)
    with open(os.path.join(out, "_INDEX_COMPLETE"), "w", encoding="utf-8"):
        pass
    return out


def token_file_stats(
    spark: SparkSession, path: str, token: str
) -> tuple[int, int]:
    """(files to open for ``token``, files in current manifest) — the
    observability hook, same shape as ``snapshots.pruned_file_count``."""
    files = _resolve_files(spark, path, token)
    total = len(snapshots.load_manifest(path)["files"])
    return len(files), total


def _resolve_files(spark: SparkSession, path: str, token: str) -> list[str]:
    m = snapshots.load_manifest(path)
    current = {f["path"] for f in m["files"]}
    iv = _latest_index_version(path)
    if iv is None:
        return sorted(current)  # no index: read everything (correct, slow)
    with open(
        os.path.join(_index_root(path, iv), "_INDEX_META.json"), encoding="utf-8"
    ) as fh:
        meta = json.load(fh)
    if len(token) < meta["min_token_len"]:
        # The index never recorded tokens this short — an empty
        # postings hit means NOTHING here; pruning on it would be a
        # false negative. Full scan (still exact via the residual).
        return sorted(current)
    idx = spark.read.parquet(_index_root(path, iv))
    posted = {
        r["file"] for r in idx.where(F.col("token") == token).select("file").collect()
    }
    indexed_version = meta["version"]
    indexed_files = {
        f["path"] for f in snapshots.load_manifest(path, indexed_version)["files"]
    } if indexed_version in snapshots.versions(path) else set()
    keep = set()
    for p in current:
        if p in indexed_files:
            if p in posted:
                keep.add(p)  # indexed and posted
        else:
            keep.add(p)  # committed after (or outside) the index: conservative
    return sorted(keep)


def read_with_token(
    spark: SparkSession, path: str, token: str, text_col: str = "text"
) -> DataFrame:
    """Rows of the CURRENT version whose ``text_col`` contains
    ``token`` as a whitespace token — index-pruned at file
    granularity, exact via the residual predicate."""
    import json as _json

    from pyspark.sql.types import StructType

    m = snapshots.load_manifest(path)
    schema = StructType.fromJson(_json.loads(m["schema"]))
    residual = F.array_contains(F.split(F.trim(F.col(text_col)), r"\s+"), token)
    files = _resolve_files(spark, path, token)
    if not files:
        return spark.createDataFrame([], schema).where(residual)
    reader = spark.read.schema(schema)
    by_path = {f["path"]: f for f in m["files"]}
    if any(by_path[p]["partition"] for p in files if p in by_path):
        reader = reader.option("basePath", os.path.join(path, snapshots._DATA_DIR))
    df = reader.parquet(*[os.path.join(path, p) for p in files])
    return df.where(residual)
