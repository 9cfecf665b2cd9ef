"""Fact builders (SURVEY.md §2.3 J2-J3, §2.4 A1).

The reference builds fact_review / fact_checkin by left-joining measures
to dim_time on the calendar date (silver_to_gold_on_minio.py:87-124).
dim_time is tiny → we broadcast it explicitly; at 100 TB the fact side
streams through a broadcast-hash join with zero shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_date_dim(
    fact: DataFrame,
    dim_time: DataFrame,
    fact_date_expr,
    dim_cols: tuple[str, ...] = ("date_id",),
    how: str = "left",
) -> DataFrame:
    """J2/J3 — fact ⋈ dim_time on to_date(fact ts) == dim.date
    (S2G:93, 116). Broadcast-hash: dim_time ≤ a few thousand rows."""
    f = fact.withColumn("__join_date", fact_date_expr)
    d = F.broadcast(dim_time.select("date", *dim_cols))
    return (
        f.join(d, f["__join_date"] == d["date"], how)
        .drop("__join_date", "date")
    )


def daily_counts(
    df: DataFrame, keys: list[str], ts_col: str, count_alias: str = "cnt"
) -> DataFrame:
    """A1 — per-key daily counts (fact_checkin core, S2G:107-112).
    groupBy gets a map-side partial aggregate from Catalyst; the shuffle
    moves only (key, date, partial_count) pairs."""
    return (
        df.withColumn("date", F.to_date(F.col(ts_col)))
        .groupBy(*keys, "date")
        .agg(F.count(F.lit(1)).alias(count_alias))
    )
