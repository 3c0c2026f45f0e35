"""Physical-plan inspection helpers.

The scale contract of this engine ("would the plan survive 100 TB?")
is enforced as TESTS, not prose: each helper extracts a property from
``df.explain`` output so plan regressions — a lost filter pushdown, a
broadcast join degrading to shuffle, a projection reading extra
columns — fail CI instead of surfacing as cluster bills. (SURVEY §4:
the reference checks its 3.16% partition-scan SLO by hand in Trino
EXPLAIN; this is the automated equivalent.)
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")


def simple_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "simple")


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def partition_filters(df: DataFrame) -> list[str]:
    """PartitionFilters entries across the plan's scans — non-empty
    means Catalyst will prune Hive-style partition directories before
    listing files (the reference's SLO-3 mechanism)."""
    out: list[str] = []
    for m in re.finditer(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df)):
        out.extend(s.strip() for s in m.group(1).split(",") if s.strip())
    return out


def read_schemas(df: DataFrame) -> list[str]:
    """ReadSchema struct strings per scan — what actually hits parquet."""
    return re.findall(r"ReadSchema: (struct<[^\n]*)", formatted_plan(df))


def scan_columns(df: DataFrame) -> set[str]:
    cols: set[str] = set()
    for schema in read_schemas(df):
        cols.update(re.findall(r"(\w+):", schema))
    return cols


def count_broadcast_joins(df: DataFrame) -> int:
    return simple_plan(df).count("BroadcastHashJoin")


def count_shuffle_joins(df: DataFrame) -> int:
    p = simple_plan(df)
    return p.count("SortMergeJoin") + p.count("ShuffledHashJoin")


def count_exchanges(df: DataFrame) -> int:
    """Shuffle exchanges in the plan (each is a full data movement)."""
    return simple_plan(df).count("Exchange hashpartitioning") + simple_plan(df).count(
        "Exchange rangepartitioning"
    )


def has_whole_stage_codegen(df: DataFrame) -> bool:
    # AQE's pre-execution "simple" plan hides codegen wrapping; the
    # codegen explain mode reports "Found N WholeStageCodegen subtrees".
    text = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "codegen")
    m = re.search(r"Found (\d+) WholeStageCodegen subtrees", text)
    return bool(m and int(m.group(1)) > 0)


def assert_no_cartesian(df: DataFrame) -> None:
    plan = simple_plan(df)
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan, (
        "plan contains a cartesian/nested-loop join:\n" + plan
    )


def has_runtime_bloom_filter(df: DataFrame) -> bool:
    """True when Catalyst injected a runtime bloom-filter (a
    ``bloom_filter_agg`` built on the selective join side, applied as
    ``might_contain`` on the big side's scan) — the Spark 3.3+ runtime
    row-level filter that cuts shuffle traffic on selective non-
    broadcast joins. At 100 TB this fires by default (the application
    side must exceed ``...bloomFilter.applicationSideScanSizeThreshold``,
    10 GB); tests lower the threshold to pin the capability at test SF."""
    return "bloom_filter_agg" in simple_plan(df)
