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


def _type_family(t: str) -> str:
    """Collapse an engine type name to the family the driver's typed
    value-hash distinguishes: 85 (int) vs 85.0 (float) vs 85.00
    (decimal) format differently even when numerically equal, and
    DuckDB's HUGEINT (windowed sum(BIGINT), count products) is NOT
    hash-equal to Spark's BIGINT. The r04-r06 `signup_conversion_
    survival` / r06 `dish_interactions_grouping_sets` driver reds were
    exactly this class — values equal, type tag different — and cost
    three rounds of misdirected floating-point work."""
    t = t.lower().strip()
    if t.endswith("[]") or t.startswith(("array", "list")):
        return "array"
    if t.startswith("decimal"):
        return "decimal"
    if t.startswith(("char", "varchar")) or t in ("string", "text"):
        return "str"
    if t.startswith("timestamp"):
        return "timestamp"
    if t.startswith(("struct", "row")):
        return "struct"
    if t.startswith("map"):
        return "map"
    if t in ("tinyint", "smallint", "int", "integer", "bigint",
             "utinyint", "usmallint", "uinteger", "ubigint"):
        return "int"
    if t in ("hugeint", "uhugeint"):
        return "hugeint"
    if t in ("float", "double", "real"):
        return "float"
    if t in ("bool", "boolean"):
        return "bool"
    if t in ("binary", "blob", "bytea", "varbinary"):
        return "binary"
    return t


def assert_dtype_parity(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, oracle_sql: str, name: str = "query"
) -> None:
    """Bind (not execute) the oracle in DuckDB and assert each output
    column's type FAMILY matches the Spark schema. HUGEINT and DECIMAL
    deliberately mismatch against int/float: the driver hashes typed/
    formatted values, so `85` vs `85.0` vs `85.00` all hash apart."""
    rel = con.sql(oracle_sql)
    duck_types = {c: _type_family(str(t)) for c, t in zip(rel.columns, rel.types)}
    spark_types = {
        f.name: _type_family(f.dataType.simpleString()) for f in spark_df.schema.fields
    }
    mismatches = {
        c: (spark_types.get(c), duck_types.get(c))
        for c in sorted(set(duck_types) | set(spark_types))
        if spark_types.get(c) != duck_types.get(c)
    }
    assert not mismatches, (
        f"{name}: oracle/Spark output dtype-family mismatch (spark, duckdb): "
        f"{mismatches} — equal values with different type tags still fail the "
        "driver's typed hash; CAST the oracle (or the Spark side) so families agree"
    )


def _values_equal(a, b) -> bool:
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def compare_to_oracle(
    spark_df: DataFrame, con: duckdb.DuckDBPyConnection, oracle_sql: str, name: str = "query"
) -> None:
    assert_dtype_parity(spark_df, con, oracle_sql, name)
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
