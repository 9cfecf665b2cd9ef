"""Driver contract for the spark-graft builder (PySpark target).

Backed by the yelp_data_pipeline_spark package: ``queries()`` /
``oracle_sql()`` come from its registry (yelp_data_pipeline_spark/
queries.py), one entry per implemented operator from SURVEY.md §2 plus
the north-star extensions (dedup / similarity / text / multimodal /
streaming semantics).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")

from yelp_data_pipeline_spark import queries as _registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Top-regions-by-orders: scan → broadcast dim chain → groupBy → top-k
    (the dashboard's Top Regions by Check-ins shape, SURVEY.md §2.4 A4).
    """
    return _registry.queries()["top_regions_by_orders"](
        spark, "/root/testdata/sf0.001"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    return _registry.oracle_sql()


def scale_notes() -> dict[str, str]:
    """Registry rows that are RECALL/PARITY BASELINES rather than
    scale-safe defaults (deliberately superlinear; kept for
    verification next to their production twins). Each note names the
    scale-safe query to use instead. Rows absent from this dict are
    scale-safe as registered."""
    return {
        spec.name: spec.scale_note
        for spec in _registry.registry()
        if spec.scale_note is not None
    }
