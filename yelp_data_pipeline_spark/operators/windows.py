"""Window operators (SURVEY.md §2.5).

The reference uses only unpartitioned row_number (W1/W2 — see dims.py).
rank / lag / lead / frames are the "expose for completeness" rows; all
are partitioned windows here, so they scale: each partition key's rows
sort locally after one hash shuffle, no global order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def top_n_per_group(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    n: int = 1,
    rank_alias: str = "rn",
) -> DataFrame:
    """row_number per group → keep first n. The classic top-k-per-key:
    one shuffle on the partition keys, local sort, early filter."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return (
        df.withColumn(rank_alias, F.row_number().over(w))
        .filter(F.col(rank_alias) <= n)
    )


def with_lag(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    col: str,
    alias: str,
    offset: int = 1,
) -> DataFrame:
    """lag over a partitioned window (sessionization building block)."""
    w = Window.partitionBy(*partition_by).orderBy(*order_by)
    return df.withColumn(alias, F.lag(F.col(col), offset).over(w))


def running_agg(
    df: DataFrame,
    partition_by: list[str],
    order_by: list,
    agg_col: str,
    alias: str,
) -> DataFrame:
    """Cumulative sum frame (rowsBetween unboundedPreceding..current)."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(alias, F.sum(F.col(agg_col)).over(w))


def rolling_range_avg(
    df: DataFrame,
    partition_by: list[str],
    day_col: str,
    value_col: str,
    days: int = 7,
    alias: str = "rolling_avg",
    round_to: int = 6,
) -> DataFrame:
    """Trailing N-day moving average with a RANGE frame over day
    numbers — unlike a ROWS frame, missing days genuinely shrink the
    window (the frame is value-based, so a gap contributes nothing
    rather than pulling older rows in).

    One shuffle on the partition keys; the average is an exact integer
    (or decimal) sum / count per frame, rounded so it replays
    identically in a sequential oracle.
    """
    day_num = F.datediff(F.col(day_col), F.lit("1970-01-01"))
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(day_num)
        .rangeBetween(-(days - 1), 0)
    )
    return df.withColumn(
        alias,
        F.round(
            F.sum(value_col).over(w) / F.count(F.lit(1)).over(w), round_to
        ),
    )
