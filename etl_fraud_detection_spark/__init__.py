"""etl_fraud_detection_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query and data-processing capabilities of
the NinoVinoDomino/ETL-fraud-detection reference (a metadata-driven
incremental ETL + fraud-reporting mart on PostgreSQL), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, SCD1/SCD2
merges as whole-DataFrame recomputes, the four fraud rules as window/join
pipelines, plus large-scale training-data-pipeline extensions
(dedup, similarity search, text analysis, multimodal plumbing).

Layout (SURVEY.md §7):
  session.py    SparkSession factory
  catalog.py    test-table loader (nanos-ts handling, view registration)
  schemas.py    fraud-domain StructTypes (reference main.ddl:30-229)
  mapping.py    TableMapping registry (reference main.ddl:271-347)
  state.py      watermark store + run log (reference etl.py:17-130)
  sources/      file ingestion: delimited text, xlsx, globs, archive
  operators/    scd, temporal join, dedup, similarity, text, multimodal
  functions/    column-expression helpers (null-safe diff, intervals)
  plans/        the 4 fraud rules + the driver-contract query catalog
  streaming/    Structured Streaming variants of the rules
"""

__version__ = "0.1.0"
