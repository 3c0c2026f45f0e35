"""Declarative data-quality expectations, evaluated in ONE pass.

The reference checks quality operationally — paired COUNT(*) scalar
subqueries for retention (`README.md:126-138`), per-run join-success
log lines (`replay_silver_to_gold.py:386-396`), a dim-uniqueness
warning (`create_dims.py:92-97`) — each costing its own job. Here the
same contracts are declared as expectations and compiled into a
single ``agg()`` over the frame: one scan, map-side partial
aggregation, no matter how many checks are attached (the Deequ-style
formulation, minus the dependency).

Uniqueness is the one check that can't ride the same scan (it needs a
distinct count, i.e. its own shuffle); it's still folded into the
same job via ``count_distinct`` in the same agg — Spark plans the
expand + two-phase aggregate in one pass over the input.

Usage::

    report = check(
        silver_df,
        non_null("event_id"),
        unique("event_id"),
        accepted_values("day_of_week", ["Mon", ..., "Sun"]),
        in_range("hour", 0, 23),
        row_count_min(1),
    )
    report.raise_on_failure()   # or inspect report.results
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame


@dataclass(frozen=True)
class Expectation:
    """One named check: ``violations`` counts offending rows (0 = pass);
    ``distinct_of`` marks uniqueness checks handled via count_distinct."""

    name: str
    violations: Column | None = None
    distinct_of: str | None = None
    min_rows: int | None = None


def non_null(col: str) -> Expectation:
    return Expectation(
        name=f"non_null({col})",
        violations=F.sum(F.when(F.col(col).isNull(), 1).otherwise(0)),
    )


def unique(col: str) -> Expectation:
    """Pass iff the column has no duplicate values (nulls ignored —
    combine with non_null for NOT-NULL-unique key semantics)."""
    return Expectation(name=f"unique({col})", distinct_of=col)


def accepted_values(col: str, values: list) -> Expectation:
    return Expectation(
        name=f"accepted_values({col})",
        violations=F.sum(
            F.when(F.col(col).isNotNull() & ~F.col(col).isin(values), 1).otherwise(0)
        ),
    )


def in_range(col: str, lo, hi) -> Expectation:
    return Expectation(
        name=f"in_range({col},{lo},{hi})",
        violations=F.sum(
            F.when(F.col(col).isNotNull() & ~F.col(col).between(lo, hi), 1).otherwise(0)
        ),
    )


def satisfies(name: str, predicate: Column) -> Expectation:
    """Arbitrary row-level predicate that every row must satisfy."""
    return Expectation(
        name=name,
        violations=F.sum(F.when(~predicate, 1).otherwise(0)),
    )


def row_count_min(n: int) -> Expectation:
    return Expectation(name=f"row_count_min({n})", min_rows=n)


def key_injective(key_col: str, *natural_cols: str) -> Expectation:
    """Pass iff ``key_col`` is injective over the natural key tuple —
    the surrogate-key collision audit. xxhash64 SKs are collision-free
    in practice at reference scale (2k users), but a 64-bit birthday
    bound reaches ~50% at ~5e9 keys, which a 100 TB corpus can hit;
    this turns that silent row-merging hazard into a loud contract
    failure at dim-build time (violations = distinct natural keys that
    lost their own surrogate). Costs one count_distinct in the same
    single-pass agg as the other expectations."""
    nat = F.count_distinct(F.struct(*[F.col(c) for c in natural_cols]))
    return Expectation(
        name=f"key_injective({key_col}<-{','.join(natural_cols)})",
        violations=nat - F.count_distinct(F.col(key_col)),
    )


@dataclass
class QualityReport:
    total_rows: int
    results: dict[str, tuple[bool, int]] = field(default_factory=dict)
    # name -> (passed, violation_count); for uniqueness the count is
    # total - distinct (number of extra duplicate rows).

    @property
    def passed(self) -> bool:
        return all(ok for ok, _ in self.results.values())

    def raise_on_failure(self) -> None:
        if not self.passed:
            failing = {n: v for n, (ok, v) in self.results.items() if not ok}
            raise AssertionError(f"data-quality failures: {failing}")


def check(df: DataFrame, *expectations: Expectation) -> QualityReport:
    """Evaluate every expectation in one aggregation over ``df``."""
    aggs = [F.count(F.lit(1)).alias("__total")]
    for i, e in enumerate(expectations):
        if e.violations is not None:
            aggs.append(e.violations.alias(f"__v{i}"))
        elif e.distinct_of is not None:
            aggs.append(F.count_distinct(F.col(e.distinct_of)).alias(f"__d{i}"))
            aggs.append(
                F.sum(F.when(F.col(e.distinct_of).isNotNull(), 1).otherwise(0)).alias(
                    f"__n{i}"
                )
            )
    row = df.agg(*aggs).collect()[0]
    total = row["__total"]
    report = QualityReport(total_rows=total)
    for i, e in enumerate(expectations):
        if e.violations is not None:
            v = int(row[f"__v{i}"] or 0)
            report.results[e.name] = (v == 0, v)
        elif e.distinct_of is not None:
            extra = int(row[f"__n{i}"] or 0) - int(row[f"__d{i}"] or 0)
            report.results[e.name] = (extra == 0, extra)
        elif e.min_rows is not None:
            report.results[e.name] = (total >= e.min_rows, max(0, e.min_rows - total))
    return report


def silver_contract(df: DataFrame) -> QualityReport:
    """The reference's operational SLOs as a declarative contract on
    Silver (`README.md` SLO 2 mechanisms + dim-uniqueness warning)."""
    return check(
        df,
        non_null("event_id"),
        unique("event_id"),
        non_null("kst_timestamp"),
        in_range("hour", 0, 23),
        accepted_values("day_of_week", ["Mon", "Tue", "Wed", "Thu", "Fri", "Sat", "Sun"]),
        row_count_min(1),
    )
