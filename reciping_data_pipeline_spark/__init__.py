"""reciping_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch reimplementation of the query and data-processing
capabilities of the reference clickstream analytics pipeline
(``Reciping/reciping-data-pipeline``), re-expressed Spark-first:

- DataFrame / Spark SQL logical plans, Catalyst + AQE for physical
  planning (no hand-scheduled execution).
- Medallion pipeline (bronze -> silver -> gold star schema) as plain
  DataFrame transforms over partitioned Parquet tables.
- The reference's 21 analytics queries as a named Spark SQL catalog.
- Scale-out extension operators a training-data pipeline needs:
  exact/near dedup (MinHash-LSH, SimHash, n-gram Jaccard), embedding
  similarity search, text analysis — all partition-parallel.

Package layout:
    session.py    SparkSession factory (AQE, shuffle sizing, UTC)
    tables.py     testdata table loading / view registration
    functions/    column-expression libraries (text, vectors, hashing)
    operators/    dedup, similarity, top-k, sessionize, asof
    queries/      the named query catalog w/ DuckDB oracle SQL
    pipeline/     the medallion clickstream pipeline (bronze..gold)
    streaming/    Structured Streaming variants
"""

__version__ = "0.1.0"
