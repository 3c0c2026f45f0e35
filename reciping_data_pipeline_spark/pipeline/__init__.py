"""Medallion pipeline: JSONL staging → Bronze → Silver → Gold star schema.

Re-expresses the reference's batch lineage (``spark/replay_jobs/*``,
``spark/bulk_insert_jobs/*``) as a single-process PySpark engine:
plain partitioned-parquet tables in a local warehouse directory,
idempotent dynamic-partition-overwrite writers, deterministic
surrogate keys, and the 21-query analytics catalog over the Gold
layer (``pipeline.analytics``).
"""
