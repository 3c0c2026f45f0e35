"""Unit tests for the PII redaction functions (functions/text.py
PII_PATTERNS / redact_pii / pii_counts) and the one-pass profiler
(operators/profiling.py) — contract tests independent of the
cross-engine oracle rows in test_catalog_oracle.py."""

from __future__ import annotations

import pyspark.sql.functions as F

from reciping_data_pipeline_spark.functions import text as T
from reciping_data_pipeline_spark.operators.profiling import profile_columns


def _redact_one(spark, s: str) -> tuple:
    row = (
        spark.createDataFrame([(s,)], "t string")
        .select(
            T.redact_pii("t").alias("r"),
            *[c.alias(n) for n, c in T.pii_counts("t").items()],
        )
        .first()
    )
    return row


class TestPIIRedaction:
    def test_each_type_redacts_and_counts(self, spark):
        row = _redact_one(
            spark,
            "mail a.b+c@ex-1.org card 4111-1111-1111-2222 ssn 123-45-6789 "
            "tel +1 202-555-0100 ip 10.0.200.7 done",
        )
        assert row["r"] == (
            "mail <EMAIL> card <CARD> ssn <SSN> tel <PHONE> ip <IP> done"
        )
        assert (row["emails"], row["cards"], row["ssns"], row["phones"], row["ips"]) == (
            1, 1, 1, 1, 1,
        )

    def test_clean_text_untouched(self, spark):
        row = _redact_one(spark, "no pii here, just words and the number 42.")
        assert row["r"] == "no pii here, just words and the number 42."
        assert sum(row[n] for n, _, _ in T.PII_PATTERNS) == 0

    def test_card_not_double_counted_as_ssn_or_phone(self, spark):
        # 4-4-4-4 digit groups must bind to CARD only: the SSN (3-2-4)
        # and PHONE shapes are blocked by the \b anchors.
        row = _redact_one(spark, "pay 4111-1111-1111-2222 now")
        assert row["r"] == "pay <CARD> now"
        assert row["cards"] == 1 and row["ssns"] == 0 and row["phones"] == 0

    def test_multiple_matches_all_replaced(self, spark):
        row = _redact_one(spark, "a@b.co c@d.io 1.2.3.4 5.6.7.8")
        assert row["r"] == "<EMAIL> <EMAIL> <IP> <IP>"
        assert row["emails"] == 2 and row["ips"] == 2

    def test_tokens_not_rematched(self, spark):
        # Replacement tokens contain no digits or '@', so a later
        # pattern can never consume an earlier pattern's token.
        row = _redact_one(spark, "x user@10.0.0.1.example.com y")
        assert "<EMAIL>" in row["r"] and "<IP>" not in row["r"]


class TestProfileColumns:
    def test_values_with_nulls(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 1.25), (2, "b", 2.0), (3, None, None), (4, "a", 2.0)],
            "k long, s string, v double",
        )
        out = {
            r["col_name"]: r
            for r in profile_columns(
                df, [("k", "bigint"), ("s", "varchar"), ("v", "double")]
            ).collect()
        }
        assert all(r["n_rows"] == 4 for r in out.values())
        assert (out["k"]["non_null"], out["k"]["ndv"]) == (4, 4)
        assert (out["s"]["non_null"], out["s"]["ndv"]) == (3, 2)
        assert out["s"]["min_repr"] == "a" and out["s"]["max_repr"] == "b"
        # doubles profile on the cents grid: 1.25 -> 125, 2.0 -> 200
        # (grid is floor(x*100+0.5) in IEEE doubles on BOTH engines —
        # 1.005 would give 100, not 101, because 1.005*100 is
        # 100.4999...; consistency, not decimal rounding, is the claim)
        assert (out["v"]["non_null"], out["v"]["ndv"]) == (3, 2)
        assert out["v"]["min_repr"] == "125" and out["v"]["max_repr"] == "200"

    def test_single_scan_plan(self, spark):
        df = spark.range(100).select(
            F.col("id").alias("a"), (F.col("id") % 3).alias("b")
        )
        plan = (
            profile_columns(df, [("a", "bigint"), ("b", "bigint")])
            ._jdf.queryExecution()
            .explainString(
                df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "simple"
                )
            )
        )
        # one-pass contract: the N distinct aggregates ride ONE Expand
        # over ONE source scan — never a per-column rescan union.
        assert plan.count("Expand") == 1
        assert "Union" not in plan
        assert plan.count("Range") == 1
