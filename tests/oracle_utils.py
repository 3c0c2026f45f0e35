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
    import os
    import sys
    import time

    trace = os.environ.get("SPARK_GRAFT_COMPARE_TRACE") == "1"

    def _t(label: str, t0: float) -> float:
        if trace:
            print(f"    [{name}] {label}: {time.perf_counter() - t0:.1f}s",
                  file=sys.stderr, flush=True)
        return time.perf_counter()

    t = time.perf_counter()
    assert_dtype_parity(spark_df, con, oracle_sql, name)
    t = _t("dtype_parity", t)
    got = spark_df.toPandas()
    t = _t(f"spark toPandas ({len(got)} rows)", t)
    got = _canon(got)
    t = _t("canon(spark)", t)
    # Materialize via CTAS, then fetch from the temp table: DuckDB's
    # python execute() returns a STREAMING result whose fetchdf runs
    # effectively single-threaded — on the x100 embed_near_dup_blocked
    # oracle (2B pairs scanned, 54M rows out) the direct fetchdf ran
    # >30 min where CTAS (parallel sink) + table fetch is ~38 s.
    con.execute("CREATE OR REPLACE TEMP TABLE __oracle_result AS " + oracle_sql)
    want = con.execute("SELECT * FROM __oracle_result").fetchdf()
    con.execute("DROP TABLE __oracle_result")
    t = _t(f"oracle fetchdf ({len(want)} rows)", t)
    want = _canon(want)
    t = _t("canon(oracle)", t)
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    import numpy as np

    for col in got.columns:
        gs, ws = got[col], want[col]
        # Vectorized fast path for machine-numeric columns — exact ==
        # plus NaN==NaN, identical semantics to _values_equal but ~100x
        # faster (the r12 x100 embed_near_dup_blocked compare is 54M
        # rows x 3 cols x 2 engines; the row-at-a-time loop alone took
        # ~30 min). Object/string columns keep the python loop.
        # Gate on ACTUAL numpy dtypes: pandas nullable extension dtypes
        # (Int64/boolean/Float64) are "numeric" but .to_numpy() yields
        # object arrays holding pd.NA, where == propagates NA and
        # np.all can raise/misreport — those take the python loop,
        # which handles NA via _values_equal (ADVICE r12).
        if (
            isinstance(gs.dtype, np.dtype)
            and isinstance(ws.dtype, np.dtype)
            and pd.api.types.is_numeric_dtype(gs)
            and pd.api.types.is_numeric_dtype(ws)
            and not pd.api.types.is_object_dtype(gs)
            and not pd.api.types.is_object_dtype(ws)
        ):
            ga = gs.to_numpy()
            wa = ws.to_numpy()
            if pd.api.types.is_float_dtype(gs) and pd.api.types.is_float_dtype(ws):
                ok = (ga == wa) | (np.isnan(ga) & np.isnan(wa))
            else:
                ok = ga == wa
            if not bool(np.all(ok)):
                idx = np.nonzero(~np.asarray(ok))[0][:5]
                bad = [(int(i), ga[i], wa[i]) for i in idx]
                raise AssertionError(
                    f"{name}: column {col!r} first mismatches {bad}"
                )
            continue
        ga, wa = gs.tolist(), ws.tolist()
        bad = [
            (i, x, y) for i, (x, y) in enumerate(zip(ga, wa)) if not _values_equal(x, y)
        ]
        assert not bad, f"{name}: column {col!r} first mismatches {bad[:5]}"
