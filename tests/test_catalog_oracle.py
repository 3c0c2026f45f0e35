"""Every SQL-expressible catalog query must hash-match its DuckDB
oracle at sf0.001 (fast) — the same comparison the driver runs at
sf0.01. Non-oracle (sketch) queries are smoke-run for schema sanity."""

from __future__ import annotations

import pytest

from reciping_data_pipeline_spark.queries import all_queries

from .conftest import SF_SMOKE, register_duck_views
from .oracle_utils import compare_to_oracle

REGISTRY = all_queries()
WITH_ORACLE = sorted(n for n, q in REGISTRY.items() if q.oracle)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_query_matches_oracle(spark, duck, name):
    register_duck_views(duck, SF_SMOKE)
    q = REGISTRY[name]
    compare_to_oracle(q.fn(spark, SF_SMOKE), duck, q.oracle, name)


def test_catalog_has_no_rows_only_queries():
    """Since r06 EVERY catalog query carries a DuckDB hash oracle
    (approx/sketch/ANN queries via exact-control, planted-needle, or
    rank-error contracts) — the rows-only check class is retired. A
    new oracle-less registration must consciously revert this."""
    assert NO_ORACLE == [], NO_ORACLE


@pytest.mark.parametrize("name", NO_ORACLE)
def test_no_oracle_query_runs(spark, name):
    q = REGISTRY[name]
    df = q.fn(spark, SF_SMOKE)
    assert df.columns  # stable schema
    assert df.count() >= 0
