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


def histogram_drift(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    group_col: str,
    split: str,
    bin_width: float = 25.0,
    n_bins: int = 20,
) -> DataFrame:
    """Distribution-drift monitor: per group, compare the value
    distribution BEFORE ``split`` (reference period A) against AFTER
    (current period B) over a fixed ``n_bins``-bin histogram, and
    report total-variation distance plus the worst single bin's
    deviation — the drift gate a feature-store / training-data
    pipeline runs before trusting a new batch.

    Laplace-smoothed proportions p_i=(a_i+1)/(n_a+B), q_i=(b_i+1)/
    (n_b+B) keep empty bins defined. The metrics deliberately avoid
    transcendental functions (PSI/KL need ln, which is not
    correctly-rounded-guaranteed across libms): TV and max-dev are
    rational, and both reduce to EXACT integer arithmetic over a
    per-group common denominator D=(n_a+B)(n_b+B):

        p_i − q_i = [(a_i+1)(n_b+B) − (b_i+1)(n_a+B)] / D = num_i / D
        tv        = (Σ|num_i|) / (2D)
        max_dev   = (max|num_i|) / D

    Integer sums/maxes are shuffle-order-free; the ONE double division
    per metric happens at the end (6dp-rounded) — deterministic across
    engines, partition counts, and AQE re-plans. Accumulation is
    DECIMAL(38,0): at 10^12-row groups num_i reaches ~10^24, past
    int64 (the DuckDB oracle mirrors with HUGEINT).

    Values clamp into the edge bins ([0, n_bins-1]); empty bins enter
    via the closed-form correction (B − occupied) · |num_empty| rather
    than a densifying spine join — same exact result, no extra join.
    Plan: ONE (group, bin) shuffle with conditional partial counts +
    ONE group rollup.

    Returns (group, n_a, n_b, tv, max_dev), 6dp.
    """
    b = F.greatest(
        F.lit(0),
        F.least(
            F.lit(n_bins - 1),
            F.floor(F.col(value_col) / F.lit(bin_width)),
        ),
    ).cast("int")
    in_a = F.col(ts_col) < F.lit(split).cast("timestamp")
    binned = (
        df.select(F.col(group_col).alias("grp"), b.alias("bin"), in_a.alias("ia"))
        .groupBy("grp", "bin")
        .agg(
            F.sum(F.when(F.col("ia"), 1).otherwise(0)).alias("a"),
            F.sum(F.when(~F.col("ia"), 1).otherwise(0)).alias("bb"),
        )
    )
    # Referenced twice (totals + per-bin join): persist, or the whole
    # scan+shuffle above runs twice (the round-5 LSH lesson).
    from ..session import track_persist

    binned = track_persist(binned)
    dec = "decimal(38,0)"
    # Two-stage: group totals first (tiny — one row per group), then
    # broadcast back so the per-bin |num_i| terms are computable in a
    # second exact-integer rollup.
    totals = binned.groupBy("grp").agg(
        F.sum("a").alias("n_a"),
        F.sum("bb").alias("n_b"),
        F.count(F.lit(1)).alias("occ"),
    )
    B = F.lit(n_bins)
    j = binned.join(F.broadcast(totals), "grp")
    num = (
        (F.col("a") + 1).cast(dec) * (F.col("n_b") + B).cast(dec)
        - (F.col("bb") + 1).cast(dec) * (F.col("n_a") + B).cast(dec)
    )
    # A bin empty in BOTH periods has num = (n_b+B) − (n_a+B) = n_b − n_a.
    empty_num = (F.col("n_b").cast(dec) - F.col("n_a").cast(dec))
    out = (
        j.groupBy("grp", "n_a", "n_b", "occ")
        .agg(
            F.sum(F.abs(num)).alias("s_num"),
            F.max(F.abs(num)).alias("m_num"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_a",
            "n_b",
            F.round(
                (
                    F.col("s_num") + (B - F.col("occ")).cast(dec) * F.abs(empty_num)
                ).cast("double")
                / (
                    (F.col("n_a") + B).cast(dec) * (F.col("n_b") + B).cast(dec)
                ).cast("double")
                / 2.0,
                6,
            ).alias("tv"),
            F.round(
                F.greatest(
                    F.col("m_num"),
                    F.when(F.col("occ") < B, F.abs(empty_num)).otherwise(
                        F.lit(0).cast(dec)
                    ),
                ).cast("double")
                / (
                    (F.col("n_a") + B).cast(dec) * (F.col("n_b") + B).cast(dec)
                ).cast("double"),
                6,
            ).alias("max_dev"),
        )
    )
    return out
