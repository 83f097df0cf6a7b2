"""b3_analytics_engine_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query / data-processing capabilities of
the reference B3 (Brazilian stock exchange) analytics pipeline
(RyanRibeiroM/b3-analytics-engine), re-expressed Spark-first:

- batch AND streaming unified on ``pyspark.sql.DataFrame``;
- every reference operator (SURVEY.md §2) as a composable function over
  DataFrames, planned by Catalyst (predicate pushdown, column pruning,
  broadcast join selection, AQE) instead of single-process pandas;
- external systems (Kafka / object store / JDBC) behind thin
  source/sink adapters so every operator is testable on Parquet
  fixtures;
- LLM-training-data extensions (dedup, similarity search, text
  analysis, multimodal column plumbing) designed for 100 TB scale.

Layout:
    session     SparkSession factory with scale-aware defaults
    schemas     explicit StructTypes for every record family
    tables      fixture loaders + temp-view registration
    functions   scalar-expression helpers (pure Column → Column)
    operators   row ops, joins, aggregates, windows, dedup, similarity,
                text analysis, multimodal plumbing
    sources     batch/stream readers (parquet/csv/json/kafka/jdbc/rest)
    sinks       writers (parquet/json/kafka/jdbc-style upsert)
    streaming   foreachBatch pipelines, triggers, snapshot join
    plans       physical-plan introspection helpers (pushdown asserts)
    queries     the registry consumed by __spark_entry__ (queries() +
                oracle_sql())
"""

__version__ = "0.1.0"
