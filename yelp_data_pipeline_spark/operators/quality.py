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


def dq_quarantine(
    df: DataFrame, checks: dict[str, Column], id_cols: list[str]
) -> DataFrame:
    """Row-level routing — the dead-letter-queue half of the
    expectations mini: every row failing ≥1 check is emitted with the
    semicolon-joined (sorted) list of violated rule names, ready to
    land in a quarantine table while the clean rows flow on. One scan,
    no shuffle: each check evaluates as a codegen'd boolean per row and
    the name list is a literal-array filter. NULL check results count
    as violations, mirroring :func:`violation_count`."""
    flags = F.array(
        *[
            F.when(F.coalesce(cond, F.lit(True)), F.lit(name)).otherwise(
                F.lit(None).cast("string")
            )
            for name, cond in sorted(checks.items())
        ]
    )
    failed = F.array_compact(flags)
    return (
        df.withColumn("__failed", failed)
        .where(F.size("__failed") > 0)
        .select(
            *id_cols,
            F.array_join("__failed", ";").alias("violations"),
        )
    )
