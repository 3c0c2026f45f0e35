"""Column-expression libraries (all JVM-side ``pyspark.sql.functions``
compositions — no Python UDFs in hot paths)."""
