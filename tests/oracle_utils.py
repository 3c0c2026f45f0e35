"""Spark-vs-DuckDB comparison mirroring the driver's correctness gate:
row count, column-name set, and order-insensitive value equality on
column-name-sorted, row-sorted frames."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
from pyspark.sql import DataFrame


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        # Driver-faithfulness guard: the driver's canonicalizer sorts
        # the RAW frame and crashes on list/array-typed cells
        # (`TypeError: unhashable type: 'list'` — CORRECTNESS_r04
        # embed_label_centroids). Reject them here too so the local
        # gate can never pass a result shape the driver cannot hash;
        # queries must serialize arrays (CSV string or long format).
        if df[c].map(lambda v: isinstance(v, (list, tuple, dict, set))).any() or str(
            df[c].dtype
        ).startswith("object") and df[c].map(
            lambda v: hasattr(v, "__array__") and not isinstance(v, str)
        ).any():
            raise AssertionError(
                f"column {c!r} holds list/array-typed values — the driver's "
                "comparison harness cannot sort these; emit long format or a "
                "fixed-decimal serialized string instead"
            )
        # Normalize date/timestamp-ish columns to ISO strings so
        # datetime.date vs pandas.Timestamp compare equal.
        if df[c].dtype == object or "datetime" in str(df[c].dtype):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare_to_oracle(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, oracle_sql: str, name: str = "query"
) -> None:
    got = _canon(spark_df.toPandas())
    want = _canon(con.execute(oracle_sql).fetchdf())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for col in got.columns:
        ga, wa = got[col].tolist(), want[col].tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, wa)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}: column {col!r} first mismatches {bad[:5]}"
