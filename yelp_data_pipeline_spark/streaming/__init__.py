"""Structured Streaming layer.

The reference has no streaming (SURVEY.md §2.10) — incrementality is
monthly Airflow batches + dynamic partition overwrite + MERGE. This
package provides the streaming-native equivalents: event-time windowed
aggregation with watermarks and gap-based sessionization. Every
transform is defined once over a DataFrame, so the same function serves
``read.parquet`` (batch/backfill) and ``readStream`` (online) — the
classic kappa pattern.
"""
