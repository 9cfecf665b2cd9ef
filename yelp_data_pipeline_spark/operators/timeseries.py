"""Time-series operators: date-spine gap filling and value histograms.

Dashboards and training-cadence monitors both break on missing
buckets (a day with zero events simply vanishes from a groupBy); the
gap-fill joins a generated date spine so every period is present.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_counts_gapfilled(df: DataFrame, ts_col: str) -> DataFrame:
    """Per-day counts with zero-filled gaps over [min(date), max(date)].

    The spine comes from sequence() over the observed span — computed
    with a 1-row aggregate CROSS JOINed back (broadcast of one row),
    not a driver collect; the whole thing stays one distributed plan.
    """
    counts = (
        df.select(F.to_date(ts_col).alias("date"))
        .groupBy("date")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    span = counts.agg(
        F.min("date").alias("lo"), F.max("date").alias("hi")
    )
    spine = span.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 DAY"))).alias("date")
    )
    return spine.join(counts, "date", "left").select(
        "date", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )


def value_histogram(
    df: DataFrame, value_col: str, bin_width: float = 10.0
) -> DataFrame:
    """Fixed-width histogram: one row per occupied bin with its bounds
    and count. floor(value/width) keys the single shuffle; empty bins
    are omitted (compose with a spine join to densify)."""
    b = F.floor(F.col(value_col) / F.lit(bin_width)).cast("long")
    return (
        df.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin",
            F.round(F.col("bin") * bin_width, 6).alias("bin_lo"),
            F.round((F.col("bin") + 1) * bin_width, 6).alias("bin_hi"),
            "cnt",
        )
    )


def daily_count_zscores(
    df: DataFrame, ts_col: str, group_col: str, round_to: int = 6
) -> DataFrame:
    """Per-group z-scores of daily counts — the basic volume-anomaly
    monitor (a day whose event count sits far from its type's mean).

    Mean and variance come from exact integer sums (Σx, Σx², n) rather
    than float accumulators, so they are order-independent and replay
    bit-identically in any engine; population variance keeps the
    formula closed-form. Two shuffles: (group, day) count, then the
    tiny per-group moment reduce joined back. Output: (group, date,
    cnt, z rounded).
    """
    daily = (
        df.select(F.col(group_col).alias("grp"), F.to_date(ts_col).alias("date"))
        .groupBy("grp", "date")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    mom = daily.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cnt").alias("s1"),
        F.sum(F.col("cnt") * F.col("cnt")).alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    var = F.col("s2") / F.col("n") - mean * mean
    z = F.when(var > 0, F.round((F.col("cnt") - mean) / F.sqrt(var), round_to))
    return daily.join(mom, "grp").select(
        F.col("grp").alias(group_col), "date", "cnt", z.alias("z")
    )
