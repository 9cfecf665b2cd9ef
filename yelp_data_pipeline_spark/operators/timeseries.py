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


def grouped_ols_trend(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    round_to: int = 6,
) -> DataFrame:
    """Per-group ordinary-least-squares trend line (slope + intercept)
    via the closed-form sufficient statistics — the distributed way to
    fit millions of tiny regressions (one per key) in ONE aggregate
    pass, no per-group iteration, no driver loop.

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²)

    Cross-engine exactness: naive float Σxy differs across partition
    orders (FP addition is not associative), so x must be integral
    (e.g. an epoch-day index) and y is accumulated as DECIMAL — all
    five sufficient statistics are then EXACT, order-independent
    integers/decimals. The closed-form combination happens ONLY after
    the aggregate, in doubles of those exact operands (decimal products
    would hit the 38-digit precision cap): identical IEEE ops on
    identical inputs are bit-identical in any engine. The integer-only
    denominator stays in exact int64; a degenerate x range (den = 0)
    yields NULL slope — guarded, never divided.

    Scale: one groupBy with map-side partials; output is |groups| rows.
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("decimal(18,2)")
    stats = df.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(F.col(x_col).cast("decimal(18,0)") * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    num = nd * F.col("sxy").cast("double") - sxd * syd
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    dend = den.cast("double")
    slope = F.when(den != 0, F.round(num / dend, round_to))
    intercept = F.when(
        den != 0, F.round((syd - num / dend * sxd) / nd, round_to)
    )
    return stats.select(
        F.col(group_col),
        F.col("n").alias("n_points"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )
