"""Dimension builders (SURVEY.md §2.5 W1-W2, §1.1 Gold dims).

Surrogate-key assignment in the reference uses an *unpartitioned*
``row_number() OVER (ORDER BY ...)`` (silver_to_gold_on_minio.py:25-28,
72-78) — a single-task global sort. Both call sites have tiny domains
(≤31 dates/month, ~1.3k categories) so we keep the same primitive for
parity, but expose a deterministic arithmetic key
(``year*10000+month*100+day``) as the scale path: it needs no sort, no
shuffle, and is stable across runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def build_dim_time(dates: DataFrame, date_col: str = "date") -> DataFrame:
    """dim_time (S2G:18-35): date_id, date, year, month, day, weekday,
    quarter, is_weekend.

    ``dates`` must carry one distinct ``date_col`` per row. date_id is
    row_number over the date order — deterministic because dates are
    unique. The global window is safe only because the distinct-date
    domain is tiny relative to the fact tables; for large domains use
    :func:`deterministic_date_key`.
    """
    d = F.col(date_col)
    w = Window.orderBy(date_col)
    return dates.select(
        F.row_number().over(w).alias("date_id"),
        d.alias("date"),
        F.year(d).alias("year"),
        F.month(d).alias("month"),
        F.dayofmonth(d).alias("day"),
        F.date_format(d, "E").alias("weekday"),
        F.quarter(d).alias("quarter"),
        F.date_format(d, "E").isin("Sat", "Sun").alias("is_weekend"),
    )


def deterministic_date_key(date_col):
    """Scale-safe surrogate date key: ``y*10000 + m*100 + d``. Pure
    map-side arithmetic — no global sort, stable across runs/partitions."""
    d = F.col(date_col) if isinstance(date_col, str) else date_col
    return (F.year(d) * 10000 + F.month(d) * 100 + F.dayofmonth(d)).alias("date_key")


def dictionary_encode(
    df: DataFrame, value_col: str, id_col: str, keep_cols: tuple[str, ...] = ()
) -> DataFrame:
    """W2 — dictionary encoding (S2G:72-78): distinct values ordered,
    row_number → id. IDs are ordering-assigned (stable only while the
    value set is stable) — correctness tests must compare on the natural
    key, per SURVEY.md §5."""
    w = Window.orderBy(value_col)
    return (
        df.select(value_col, *keep_cols)
        .distinct()
        .withColumn(id_col, F.row_number().over(w))
    )


def project_dim(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P1 — dim projection with renames (build_dim_business, S2G:37-52;
    dim_user fills the schema.png gap — SURVEY.md §1.1 discrepancy)."""
    return df.select(*[F.col(src).alias(dst) for src, dst in mapping.items()])
