"""Pipeline runners: bulk backfill + 15-minute incremental loop.

Replaces the reference's Airflow DAG (``dags/
replay_september_15min_dag.py``) and ``bulk_runner.py`` subprocess
chain with in-process calls — no spark-submit fork per stage, one
SparkSession, one Catalyst context. The incremental loop honors
logical data intervals exactly like Airflow's ``data_interval_start/
end`` with ``catchup=True, max_active_runs=1`` (ordered replay).

Session: Asia/Seoul timezone (reference semantics — every timestamp
column is KST wall-clock; stored as NTZ so readers in any zone agree).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

from pyspark.sql import SparkSession

from reciping_data_pipeline_spark.pipeline import bronze, dims, gold, silver
from reciping_data_pipeline_spark.session import get_spark


def pipeline_session(app_name: str = "medallion") -> SparkSession:
    return get_spark(app_name=app_name, timezone="Asia/Seoul")


@dataclass
class RunReport:
    bronze_rows: int
    silver_rows: int
    fact_rows: int
    join_success: dict[str, float]
    quality: dict[str, tuple[bool, int]] | None = None  # silver contract results

    @property
    def retention(self) -> float:
        """Bronze→Silver row retention — the reference's SLO 2 requires
        ≥95% (README.md:126-138; loss = removed duplicates + unparseable
        rows)."""
        return self.silver_rows / self.bronze_rows if self.bronze_rows else 1.0


def bulk_backfill(
    spark: SparkSession,
    staging_dir: str,
    warehouse: str,
    recipe_master_path: str,
    batch_ts: datetime,
    time_dim_range: tuple[str, str] = ("2025-01-01 00:00:00", "2026-12-31 23:00:00"),
    validate: bool = False,
) -> RunReport:
    """staging → bronze → silver → dims → gold, full rebuild
    (bulk_runner.py:86-108 equivalent). ``validate=True`` additionally
    evaluates the declarative Silver SLO contract (quality.py — one
    extra aggregation job) and attaches it to the report."""
    # Every report number rides its stage's write action as an
    # observation metric (guide §1.2): the report previously re-read
    # bronze/silver/fact for three count() jobs plus a full-scan
    # join-success aggregation over the fact — four extra jobs per
    # bulk build, all answerable from rows the writes already stream.
    bronze_rows = bronze.ingest_bulk(spark, staging_dir, warehouse, batch_ts)
    silver_metrics: dict = {}
    silver_df = silver.run_batch(spark, warehouse, batch_ts, metrics=silver_metrics)
    silver_df = silver.read_silver(spark, warehouse)
    dims.build_all(spark, silver_df, warehouse, recipe_master_path, *time_dim_range)
    gold_metrics: dict = {}
    gold.run_bulk(spark, silver_df, warehouse, metrics=gold_metrics)
    q = None
    if validate:
        from reciping_data_pipeline_spark.pipeline import quality

        q = quality.silver_contract(silver_df).results
    total = gold_metrics["fact_rows"] or 1
    return RunReport(
        bronze_rows=bronze_rows,
        silver_rows=silver_metrics["silver_rows"],
        fact_rows=gold_metrics["fact_rows"],
        join_success={k: gold_metrics[k] / total for k in gold.FK_KEYS},
        quality=q,
    )


def incremental_run(
    spark: SparkSession,
    staging_dir: str,
    warehouse: str,
    interval_start: datetime,
    interval_end: datetime,
) -> bool:
    """One 15-minute micro-batch: staging interval → bronze → silver →
    gold (incremental, idempotent). Returns False on an empty interval.
    Dims except dim_user must exist (bootstrap via bulk_backfill or
    dims.build_all)."""
    loaded = bronze.ingest_interval(spark, staging_dir, warehouse, interval_start, interval_end)
    if not loaded:
        return False
    # run_batch(incremental=True) returns a PERSISTED frame (the batch
    # parse feeds its two append actions plus gold's dim upsert + fact
    # build); release it deterministically once the gold write is done.
    silver_df = silver.run_batch(
        spark,
        warehouse,
        batch_ts=interval_start,
        ingestion_date=interval_start.date().isoformat(),
        incremental=True,
    )
    try:
        gold.run_incremental(spark, silver_df, warehouse)
    finally:
        silver_df.unpersist()
    return True


def replay_loop(
    spark: SparkSession,
    staging_dir: str,
    warehouse: str,
    start: datetime,
    end: datetime,
    step: timedelta = timedelta(minutes=15),
) -> int:
    """Ordered catch-up replay of [start, end) in 15-min intervals."""
    n = 0
    t = start
    while t < end:
        if incremental_run(spark, staging_dir, warehouse, t, t + step):
            n += 1
        t += step
    return n


def main(argv: list[str] | None = None) -> None:
    """CLI — replaces the reference's Airflow DAG + bulk_runner:

    python -m reciping_data_pipeline_spark.pipeline.runner bulk \
        --staging ./staging --warehouse ./wh --recipe-master ./recipes.parquet
    python -m reciping_data_pipeline_spark.pipeline.runner replay \
        --staging ./staging --warehouse ./wh \
        --start 2025-09-01T00:00 --end 2025-09-02T00:00
    python -m reciping_data_pipeline_spark.pipeline.runner query --warehouse ./wh --name dau
    """
    import argparse

    p = argparse.ArgumentParser(prog="medallion-runner")
    sub = p.add_subparsers(dest="cmd", required=True)

    bulk = sub.add_parser("bulk", help="full staging -> gold rebuild")
    bulk.add_argument("--staging", required=True)
    bulk.add_argument("--warehouse", required=True)
    bulk.add_argument("--recipe-master", required=True)
    bulk.add_argument("--batch-ts", default=None, help="ISO logical batch time (default: now)")

    rep = sub.add_parser("replay", help="ordered 15-min incremental replay")
    rep.add_argument("--staging", required=True)
    rep.add_argument("--warehouse", required=True)
    rep.add_argument("--start", required=True, help="ISO interval start")
    rep.add_argument("--end", required=True, help="ISO interval end")

    qry = sub.add_parser("query", help="run one of the 21 analytics queries")
    qry.add_argument("--warehouse", required=True)
    qry.add_argument("--name", required=True)
    qry.add_argument("--limit", type=int, default=50)

    args = p.parse_args(argv)
    spark = pipeline_session()
    if args.cmd == "bulk":
        ts = datetime.fromisoformat(args.batch_ts) if args.batch_ts else datetime.now()
        report = bulk_backfill(spark, args.staging, args.warehouse, args.recipe_master, ts)
        print(
            f"bulk done: bronze={report.bronze_rows} silver={report.silver_rows} "
            f"fact={report.fact_rows} retention={report.retention:.4f} "
            f"join_success={report.join_success}"
        )
    elif args.cmd == "replay":
        n = replay_loop(
            spark, args.staging, args.warehouse,
            datetime.fromisoformat(args.start), datetime.fromisoformat(args.end),
        )
        print(f"replay done: {n} non-empty intervals loaded")
    elif args.cmd == "query":
        from reciping_data_pipeline_spark.pipeline import analytics

        analytics.register_gold_views(spark, args.warehouse)
        analytics.run(spark, args.name).show(args.limit, truncate=False)


if __name__ == "__main__":
    main()
