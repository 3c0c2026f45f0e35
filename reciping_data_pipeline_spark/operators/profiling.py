"""One-pass multi-column table profiler.

Data-quality profiling at warehouse scale must not scan the table once
per column (a 100 TB fact × 40 columns = 40 full scans). This profiler
computes (rows, non-null count, exact NDV, min, max) for EVERY listed
column in a SINGLE aggregation pass: Spark plans the N distinct
aggregates with one Expand over one scan — the same
one-scan-multiplied-rows tradeoff as GROUPING SETS (BENCH_NOTES.md
"GROUPING SETS vs UNION ALL": the rewrite pays off exactly when scans
dominate, i.e. the cold-storage 100 TB regime).

Cross-engine representation contract (mirrored in the
``orders_profile`` DuckDB oracle): min/max are emitted as strings;
DOUBLE columns are first quantized to integer cents
(``floor(x*100+0.5)``) because float-to-string formatting differs
between engines (Spark prints 1.23456789E7 above 1e7) while BIGINT,
DATE and VARCHAR casts are byte-identical. NDV of a quantized double
column is NDV on the cents grid — a profiling answer, not a float
identity claim.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


def _repr_col(col_name: str, kind: str) -> Column:
    if kind == "double":
        return F.floor(F.col(col_name) * 100 + F.lit(0.5)).cast("long")
    if kind == "timestamp":
        # midnight-stamped date columns: profile on the DATE grid —
        # timestamp-to-string formatting is engine-specific, the ISO
        # date cast is byte-identical (verify-skill DATE contract)
        return F.col(col_name).cast("date")
    return F.col(col_name)


def profile_columns(df: DataFrame, specs: list[tuple[str, str]]) -> DataFrame:
    """Profile the listed ``(column, kind)`` pairs in one aggregation.

    ``kind`` is ``"double"`` for float columns (quantized to cents for
    the string representation) and anything else for columns whose
    native string cast is engine-stable (ints, strings, dates).

    Returns one row per column:
    ``(col_name, n_rows, non_null, ndv, min_repr, max_repr)``.

    Plan shape: ONE scan -> Expand(N+1 projections) -> partial + final
    aggregate -> a 1-row result exploded driver-side-free into N rows.
    No per-column rescans, no joins, no window.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n_rows")]
    for name, kind in specs:
        v = _repr_col(name, kind)
        aggs.append(F.count(v).alias(f"_nn_{name}"))
        aggs.append(F.count_distinct(v).alias(f"_ndv_{name}"))
        aggs.append(F.min(v).cast("string").alias(f"_min_{name}"))
        aggs.append(F.max(v).cast("string").alias(f"_max_{name}"))
    row = df.agg(*aggs)
    per_col = F.array(
        *[
            F.struct(
                F.lit(name).alias("col_name"),
                F.col("_n_rows").alias("n_rows"),
                F.col(f"_nn_{name}").alias("non_null"),
                F.col(f"_ndv_{name}").alias("ndv"),
                F.col(f"_min_{name}").alias("min_repr"),
                F.col(f"_max_{name}").alias("max_repr"),
            )
            for name, _ in specs
        ]
    )
    return row.select(F.explode(per_col).alias("p")).select("p.*")
