"""File-level inverted token index: needle queries must open a strict
subset of files while returning exactly the full-scan answer, stay
correct with a STALE index (post-build appends conservatively read),
and fall back to a full scan when no index exists."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from reciping_data_pipeline_spark.sources import snapshots, textindex, writers
from reciping_data_pipeline_spark.sources.snapshots import SnapshotFormat


def _mk_table(spark, path):
    fmt = SnapshotFormat()
    rows = []
    for i in range(80):
        word = "zebrafish" if i == 37 else f"word{i % 7}"
        rows.append((i, f"common filler {word} tail{i}"))
    df = spark.createDataFrame(rows, "doc_id INT, text STRING").repartitionByRange(
        8, "doc_id"
    )
    fmt.overwrite_table(df, path)
    return fmt


def test_needle_query_prunes_files_and_matches_full_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    textindex.build_token_index(spark, path)
    kept, total = textindex.token_file_stats(spark, path, "zebrafish")
    assert total == 8 and kept == 1, (kept, total)
    got = [
        (r["doc_id"], r["text"])
        for r in textindex.read_with_token(spark, path, "zebrafish").collect()
    ]
    full = [
        (r["doc_id"], r["text"])
        for r in snapshots.read_version(spark, path)
        .where(F.array_contains(F.split(F.trim("text"), r"\s+"), "zebrafish"))
        .collect()
    ]
    assert got == full and len(got) == 1
    # a common token posts to every file — prune nothing, still exact
    kept2, _ = textindex.token_file_stats(spark, path, "filler")
    assert kept2 == 8
    assert textindex.read_with_token(spark, path, "filler").count() == 80


def test_stale_index_stays_correct_for_post_build_appends(spark, tmp_path):
    path = str(tmp_path / "t")
    fmt = _mk_table(spark, path)
    textindex.build_token_index(spark, path)
    # append AFTER the index build: a new needle the index never saw
    fmt.append(
        spark.createDataFrame(
            [(1000, "late arrival zebrafish sighting")], "doc_id INT, text STRING"
        ).coalesce(1),
        path,
    )
    kept, total = textindex.token_file_stats(spark, path, "zebrafish")
    assert total == 9
    assert kept == 2  # the posted file + the conservatively-kept new file
    ids = sorted(
        r["doc_id"] for r in textindex.read_with_token(spark, path, "zebrafish").collect()
    )
    assert ids == [37, 1000]  # stale index, exact answer
    # token only in the NEW file: still found
    ids = [r["doc_id"] for r in textindex.read_with_token(spark, path, "sighting").collect()]
    assert ids == [1000]
    # rebuild: pruning re-tightens
    textindex.build_token_index(spark, path)
    kept, total = textindex.token_file_stats(spark, path, "sighting")
    assert (kept, total) == (1, 9)


def test_missing_or_incomplete_index_falls_back_to_full_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    _mk_table(spark, path)
    kept, total = textindex.token_file_stats(spark, path, "zebrafish")
    assert kept == total == 8  # no index: every file read, correct
    assert textindex.read_with_token(spark, path, "zebrafish").count() == 1
    # a crashed build (no completion marker) must be ignored
    os.makedirs(os.path.join(path, "_index", "tokens-v00000099"), exist_ok=True)
    assert textindex._latest_index_version(path) is None


def test_short_needle_below_index_min_len_falls_back_to_full_scan(spark, tmp_path):
    """A needle SHORTER than the index's min_token_len was never
    posted — an empty postings hit means nothing, and pruning on it
    would silently return zero rows. The resolver must fall back to a
    full scan (still exact via the residual predicate)."""
    path = str(tmp_path / "t")
    fmt = SnapshotFormat()
    rows = [(i, f"xx filler word{i % 7}") for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id INT, text STRING").repartitionByRange(4, "doc_id")
    fmt.overwrite_table(df, path)
    textindex.build_token_index(spark, path, min_token_len=3)
    kept, total = textindex.token_file_stats(spark, path, "xx")
    assert kept == total == 4  # short needle: no pruning claimed
    assert textindex.read_with_token(spark, path, "xx").count() == 40
