"""Aggregation operators (SURVEY.md §2.4, §2.6 O3).

Cross-engine float determinism: a parallel SUM over doubles is
order-dependent, so Spark and the DuckDB oracle can disagree in the last
ULP. Every float aggregate here accumulates in DECIMAL (exact, orderless)
and casts the final value back to DOUBLE — bit-identical across engines,
partitionings, and retries. That property matters beyond testing: at
100 TB it makes aggregates stable under AQE re-partitioning and task
retries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DECIMAL = "decimal(27,4)"


def exact_sum(col, alias: str) -> Column:
    """Order-independent SUM for double columns."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DECIMAL)).cast("double").alias(alias)


def exact_avg(col, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum / count, then one
    double division (deterministic)."""
    c = F.col(col) if isinstance(col, str) else col
    return (
        F.sum(c.cast(DECIMAL)).cast("double") / F.count(c)
    ).alias(alias)


def group_count(df: DataFrame, keys: list[str], alias: str = "cnt") -> DataFrame:
    """A1 — groupBy count (S2G:107-112): partial+final hash aggregate."""
    return df.groupBy(*keys).agg(F.count(F.lit(1)).alias(alias))


def salted_group_count(
    df: DataFrame, keys: list[str], alias: str = "cnt", salt_buckets: int = 16
) -> DataFrame:
    """Two-stage aggregation for SKEWED keys: stage 1 groups by
    (keys + salt) so a hot key's rows spread over ``salt_buckets``
    reducers; stage 2 sums the partials per key. The salt derives from
    ``monotonically_increasing_id`` — value-irrelevant, it only has to
    spread rows; the final counts are salt-invariant.

    Use when one key holds a scale-breaking share of rows and AQE's
    skew-join splitting doesn't apply (it handles joins, not
    aggregations). For mild skew, plain groupBy + map-side partial
    aggregation is already enough.
    """
    salt = F.pmod(F.monotonically_increasing_id(), F.lit(salt_buckets)).alias("__salt")
    partial = (
        df.select(*keys, salt)
        .groupBy(*keys, "__salt")
        .agg(F.count(F.lit(1)).alias("__pc"))
    )
    return partial.groupBy(*keys).agg(F.sum("__pc").alias(alias))


def top_k(
    df: DataFrame, order_col: str, k: int, tiebreak: list[str] | None = None
) -> DataFrame:
    """O3 — dashboard top-k (`assets/dashboard.jpg` "Top 10 Businesses
    by 5-Star Reviews"). Spark plans this as TakeOrderedAndProject:
    each partition keeps a k-heap, the driver merges — no global sort.
    ``tiebreak`` columns make the cut deterministic when measures tie.
    """
    order = [F.col(order_col).desc()] + [F.col(c).asc() for c in (tiebreak or [])]
    return df.orderBy(*order).limit(k)
