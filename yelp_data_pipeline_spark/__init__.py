"""yelp_data_pipeline_spark — a PySpark-native analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
reference lakehouse pipeline (HIEUDENHI/yelp-data-pipeline, surveyed in
/root/repo/SURVEY.md), re-expressed as a reusable, scale-first PySpark
operator library:

- ``session``    — SparkSession factory tuned for AQE / broadcast / Arrow.
- ``tables``     — parquet source layer for the synthetic star schema.
- ``operators``  — the operator inventory (SURVEY.md §2): cleaning,
  dimension builders, fact builders, joins, aggregations, windows,
  set ops, upsert, plus LLM-data-pipeline extensions (dedup, similarity
  search, text analysis, multimodal plumbing).
- ``streaming``  — Structured Streaming equivalents (tumbling/sliding/
  session windows, stateful ops).
- ``queries``    — the registry exported through /root/repo/__spark_entry__.py
  (each query paired with an ANSI-SQL DuckDB oracle).

Design rules (100 TB posture):
- DataFrame/SQL only; no RDDs; no row-at-a-time Python UDFs in hot paths.
- Dims are broadcast; big joins shuffle on explicit keys; AQE cleans up skew.
- Filters target partition columns; projections are minimal so parquet
  scans prune columns and push predicates.
- Float aggregates go through exact DECIMAL accumulation then cast back to
  DOUBLE so results are bit-stable across engines and partitionings.
"""

__version__ = "0.1.0"

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)
