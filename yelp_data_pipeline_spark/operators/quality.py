"""Data-quality summary operator — a declarative expectations mini.

One pass over the table computes every configured check as a
conditional count; the output is a single wide row (check → violation
count). At scale this is the cheapest possible audit: one scan, one
1-row aggregate, no shuffle of data rows, and Catalyst prunes the
scan to exactly the columns the checks reference.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def violation_count(cond: Column) -> Column:
    """Count of rows violating a boolean expectation (cond = the
    VIOLATION predicate). NULL predicate results count as violations —
    an unevaluable check is a failing check."""
    return F.sum(
        F.when(F.coalesce(cond, F.lit(True)), F.lit(1)).otherwise(F.lit(0))
    )


def dq_summary(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """One-row summary: n_rows plus one violation count per named
    check. ``checks`` maps output column name → violation predicate."""
    aggs = [F.count(F.lit(1)).alias("n_rows")] + [
        violation_count(cond).cast("long").alias(name)
        for name, cond in checks.items()
    ]
    return df.agg(*aggs)


def duplicate_key_count(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """(n_keys, n_dup_keys, n_dup_rows) for a candidate primary key —
    the uniqueness expectation, as one groupBy over the key only."""
    per_key = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("c"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).cast("long").alias("n_dup_keys"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0))
        .cast("long")
        .alias("n_dup_rows"),
    )
