"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship star-join query at sf0.001; ``queries``
exposes the full named catalog (one entry per implemented operator
family from SURVEY.md §2 plus the scale-out extension operators);
``oracle_sql`` returns the DuckDB-equivalent SQL for every
SQL-expressible query. Since r06 the MinHash-LSH / SimHash / HLL
rollup rows carry REAL hash oracles (exact-Jaccard pair set, planted
exact-copy recall set, exact-uniques accuracy contract); the few
remaining no-oracle rows (approx percentiles/top-k, ANN variants) are
estimator-contract-gated in ``tests/``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from reciping_data_pipeline_spark.queries import all_queries

SF0001_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    registry = all_queries()
    return registry["revenue_by_nation"].fn(spark, SF0001_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: q.fn for name, q in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each SQL-expressible query."""
    return {name: q.oracle for name, q in all_queries().items() if q.oracle is not None}
