"""Named query catalog with DuckDB oracle SQL.

Each query is registered with:
- ``fn(spark, sf_dir) -> DataFrame`` — the Spark-first implementation
  (DataFrame API or Spark SQL; Catalyst picks the physical plan).
- ``oracle`` — equivalent ANSI SQL the driver runs in DuckDB over the
  same parquet tables, or ``None`` for non-SQL-expressible operators
  (those get a rows-only check).

Conventions that make the cross-engine value-hash comparison stable:
- every computed column is explicitly aliased, identically on both
  sides (the driver sorts columns by name before hashing);
- every floating-point aggregate is ``round(x, N)`` with the same N on
  both sides (double summation order differs between engines; rounding
  absorbs the last-ulp noise);
- integer sums are cast to BIGINT on the DuckDB side (DuckDB promotes
  SUM(int) to HUGEINT, Spark keeps BIGINT);
- ties in top-k / ranking are always broken by a unique key column.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

REGISTRY: dict[str, "Query"] = {}


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


def query(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator registering a catalog query."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


def all_queries() -> dict[str, Query]:
    """Import every query module (side-effect: registration) and return
    the full registry."""
    from reciping_data_pipeline_spark.queries import (  # noqa: F401
        clickstream,
        corpusops,
        medallionops,
        multimodalops,
        relational_ext,
        subqueries,
        textops,
        tpch,
        vectorops,
    )

    return dict(REGISTRY)
