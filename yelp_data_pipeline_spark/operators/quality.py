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


def column_profile(
    df: DataFrame,
    num_cols: list[str] | None = None,
    str_cols: list[str] | None = None,
    date_cols: list[str] | None = None,
    exact_ndv: bool = True,
) -> DataFrame:
    """ANALYZE-style per-column statistics profile in ONE pass (the
    stats a cost-based optimizer, a data-catalog crawler, or a
    pre-training corpus audit wants): row count, null count, distinct
    count, min and max — emitted LONG (one row per column) so the
    schema is stable no matter which columns are profiled.

    Numeric min/max surface as micro-unit integers rendered to text
    (``floor(v·10⁶ + 0.5)`` as BIGINT → string), never raw floats or
    decimal casts: float→string renderings differ across
    engines/drivers on precision edges, and even double→DECIMAL cast
    semantics (shortest-repr HALF_UP vs binary-value nearest) diverge
    between engine versions on values not exactly k-decimal-
    representable. The micro rendering uses only IEEE single-op
    arithmetic — one multiply, one add, one floor, each correctly
    rounded and bit-identical on every engine — applied AFTER the
    min/max over the raw double (so both engines select the same
    value first). String/date min/max pass through as strings; each
    type family leaves the other family's columns NULL.

    Scale posture: a single aggregate over the table — Catalyst prunes
    the scan to exactly the profiled columns, and every statistic is
    map-side partial-aggregable EXCEPT exact NDV, which Spark computes
    via one expand (rows × profiled-columns) feeding per-key partial
    distincts: parallel, but the expand multiplies scan output. At
    100 TB set ``exact_ndv=False`` to swap in HLL++
    (``approx_count_distinct``, fully map-side combinable, ~2% err) —
    exact is the default here because the DuckDB oracle must replay the
    numbers bit-for-bit.
    """
    num_cols = num_cols or []
    str_cols = str_cols or []
    date_cols = date_cols or []
    ndv = (
        (lambda c: F.count_distinct(F.col(c)))
        if exact_ndv
        else (lambda c: F.approx_count_distinct(c))
    )
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    rows = []
    for c in num_cols + str_cols + date_cols:
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .alias(f"__nn_{c}")
        )
        aggs.append(ndv(c).cast("long").alias(f"__nd_{c}"))
    # Min/max over the RAW double (same selected value on every
    # engine); the lossless micro-unit rendering happens post-agg.
    for c in num_cols:
        aggs.append(F.min(F.col(c).cast("double")).alias(f"__mn_{c}"))
        aggs.append(F.max(F.col(c).cast("double")).alias(f"__mx_{c}"))
    for c in str_cols + date_cols:
        aggs.append(F.min(F.col(c)).cast("string").alias(f"__mns_{c}"))
        aggs.append(F.max(F.col(c)).cast("string").alias(f"__mxs_{c}"))
    wide = df.agg(*aggs)

    def micro(col: Column) -> Column:
        # IEEE-pure: multiply, add, floor — each a single correctly-
        # rounded op; floor yields an integral double exact in int64
        # range, so the long cast is value-preserving.
        return (
            F.floor(col * F.lit(1000000.0) + F.lit(0.5))
            .cast("long")
            .cast("string")
        )

    for c in num_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                micro(F.col(f"__mn_{c}")).alias("min_num"),
                micro(F.col(f"__mx_{c}")).alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in str_cols + date_cols:
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nn_{c}").alias("n_nulls"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.lit(None).cast("string").alias("min_num"),
                F.lit(None).cast("string").alias("max_num"),
                F.col(f"__mns_{c}").alias("min_str"),
                F.col(f"__mxs_{c}").alias("max_str"),
            )
        )
    return wide.select(
        F.explode(F.array(*rows)).alias("p")
    ).select("p.*")


def benford_first_digit(df: DataFrame, value_col: str) -> DataFrame:
    """Benford's-law first-significant-digit audit of a positive
    monetary column — the classic forensic screen for fabricated or
    truncated numeric data (Benford 1938; Nigrini's fraud-audit
    staple): naturally occurring multi-magnitude amounts put digit d
    first with probability log10(1 + 1/d); a synthetic or clipped
    column deviates visibly.

    Determinism across engines: the first digit is NEVER taken from a
    float's string rendering (engines disagree on double formatting).
    The value is converted to exact integer cents first
    (``floor(v·100 + 0.5)`` — single IEEE multiply/add/floor on a
    2-decimal-representable monetary double), and the digit is the
    first character of the INTEGER's decimal string, which is
    bit-identical everywhere. ``log10`` is one libm call per output
    row, rounded to 6dp (the repo's single-transcendental rule);
    shares are exact-integer divisions in double, rounded 6dp.

    Plan: one pruned scan → map-side digit extraction → 9-cell
    combinable groupBy; the total re-derives from the 9-row cell
    relation via a broadcast 1-row aggregate (no second scan). At
    100 TB this is scan-bound with a ≤9-row shuffle.

    Returns (digit, n_obs, obs_share, benford_share, abs_dev)
    ordered by digit.
    """
    cents = F.floor(F.col(value_col).cast("double") * F.lit(100.0) + F.lit(0.5)).cast(
        "long"
    )
    per = (
        df.where(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .select(F.substring(cents.cast("string"), 1, 1).cast("int").alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    tot = per.agg(F.sum("n_obs").cast("long").alias("__n_total"))
    d = F.col("digit").cast("double")
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "digit",
            "n_obs",
            F.round(
                F.col("n_obs").cast("double") / F.col("__n_total").cast("double"), 6
            ).alias("obs_share"),
            F.round(F.log10(F.lit(1.0) + F.lit(1.0) / d), 6).alias("benford_share"),
        )
        .withColumn(
            "abs_dev", F.round(F.abs(F.col("obs_share") - F.col("benford_share")), 6)
        )
        .orderBy("digit")
    )


def mad_outliers(
    df: DataFrame,
    id_col: str,
    value_col: str,
    z_threshold: float = 3.5,
) -> DataFrame:
    """Robust outlier screen via the median / median-absolute-deviation
    (Hampel's rule): flag rows whose value sits more than
    ``z_threshold`` robust z-units from the median, where
    robust_z = 0.6745 · (x − median) / MAD. Unlike the mean/stddev
    z-score (timeseries.daily_count_zscores, similarity.
    embedding_norm_outliers), median and MAD have a 50% breakdown
    point — the outliers being hunted cannot drag the yardstick, which
    is exactly what heavy-tailed price/length/count columns do to a
    stddev screen.

    Plan: two 1-row exact-median aggregates (percentile ==
    quantile_cont cross-engine), each broadcast back as a literal
    cross join; the flagging pass is map-side. At true scale swap
    percentile for percentile_approx (mergeable sketch, no per-group
    sort) — the screen is a triage, not an exactness contract.

    ``MAD == 0`` (> 50% of values identical) means the screen is
    degenerate: z is NULL-guarded (no ANSI divide-by-zero) and the
    result is empty rather than "everything differing is an outlier".

    Returns (id, value, robust_z) for outliers only, z rounded 6dp.
    """
    base = df.select(F.col(id_col), F.col(value_col).cast("double").alias("v"))
    med = base.agg(F.expr("percentile(v, 0.5)").alias("med"))
    dev = base.crossJoin(F.broadcast(med)).select(
        F.col(id_col), F.col("v"), F.col("med"),
        F.abs(F.col("v") - F.col("med")).alias("ad"),
    )
    mad = dev.agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    z = F.when(
        F.col("mad") > 0,
        F.round(
            F.lit(0.6745) * (F.col("v") - F.col("med")) / F.col("mad"), 6
        ),
    )
    return (
        dev.crossJoin(F.broadcast(mad))
        .select(
            F.col(id_col),
            F.col("v").alias(value_col),
            z.alias("robust_z"),
        )
        .where(F.abs(F.col("robust_z")) > z_threshold)
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a set of quasi-identifier columns: every
    equivalence class (unique quasi-identifier combination) with fewer
    than ``k`` members is a re-identification risk — the check run
    before releasing or training on tabular data containing
    person-adjacent attributes (Sweeney 2002). This AUDITS; the
    mitigation (generalize, suppress, or drop the class) is the
    caller's policy decision.

    Plan: ONE map-side-combinable groupBy over the quasi-identifier
    tuple + a count filter — the same cost as any distinct-count
    audit; no row payloads move, only the quasi columns. Output is
    ordered by severity (smallest classes first) with a full-column
    tiebreak so the result set is deterministic.

    Returns quasi_cols + (class_size,) for violating classes only.
    """
    return (
        df.groupBy(*quasi_cols)
        .agg(F.count(F.lit(1)).alias("class_size"))
        .where(F.col("class_size") < k)
        .orderBy(F.asc("class_size"), *[F.asc(c) for c in quasi_cols])
    )


def referential_integrity_audit(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Two-way referential-integrity audit between related tables
    (documents ↔ embeddings, facts ↔ dims): distinct-key counts on
    each side, how many match, and the orphan count in each direction
    — the check that catches a failed encoder batch (docs without
    embeddings) or a stale index (embeddings whose doc was deleted)
    before training consumes the join.

    Plan: ONE key-shuffled full outer join of the two DISTINCT key
    relations (each side pre-shrunk map-side to its distinct keys —
    no row payloads move), then a single combinable aggregate over
    the presence flags. Cheaper than the two anti-joins it replaces
    and produces all five counts in one pass.

    Returns one row: (n_left_keys, n_right_keys, n_matched,
    n_left_orphans, n_right_orphans).
    """
    lk = left.select(F.col(left_key).alias("__lk")).distinct()
    rk = right.select(F.col(right_key).alias("__rk")).distinct()
    j = lk.join(rk, F.col("__lk") == F.col("__rk"), "full_outer")
    return j.agg(
        F.sum(F.when(F.col("__lk").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_left_keys"),
        F.sum(F.when(F.col("__rk").isNotNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_right_keys"),
        F.sum(
            F.when(
                F.col("__lk").isNotNull() & F.col("__rk").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_matched"),
        F.sum(
            F.when(
                F.col("__lk").isNotNull() & F.col("__rk").isNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_left_orphans"),
        F.sum(
            F.when(
                F.col("__lk").isNull() & F.col("__rk").isNotNull(), 1
            ).otherwise(0)
        )
        .cast("long")
        .alias("n_right_orphans"),
    )


def key_skew_report(df: DataFrame, key_col: str) -> DataFrame:
    """Join/shuffle-key skew diagnostic: the numbers an engineer reads
    BEFORE choosing a join strategy (plain shuffle vs broadcast vs
    salting vs AQE skew-split) — rows, distinct keys, mean rows/key,
    exact p50/p90/p99/max of the per-key count distribution, and the
    hottest key with its share of all rows. A top key holding >1% of
    a 100 TB fact means one reducer owns >1 TB: this report is how
    that's caught in planning rather than at hour three of the job.

    Plan: one map-side-combinable groupBy(key) count, then a 1-row
    aggregate over the per-key relation (percentile == quantile_cont
    cross-engine); the hottest key via max_by with a key tiebreak.
    Every emitted float is a single division or an exact percentile —
    deterministic on both engines.

    Returns ONE row: (n_rows, n_keys, mean_rows_per_key, p50_cnt,
    p90_cnt, p99_cnt, max_cnt, top_key, top_share).
    """
    per_key = df.groupBy(F.col(key_col).cast("string").alias("k")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_key.agg(
        F.sum("c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("c").cast("long").alias("max_cnt"),
        F.expr("percentile(c, 0.5)").alias("__p50"),
        F.expr("percentile(c, 0.9)").alias("__p90"),
        F.expr("percentile(c, 0.99)").alias("__p99"),
        F.max(F.struct(F.col("c"), F.col("k"))).alias("__top"),
    ).select(
        "n_rows",
        "n_keys",
        F.round(
            F.col("n_rows").cast("double") / F.col("n_keys").cast("double"), 6
        ).alias("mean_rows_per_key"),
        F.round(F.col("__p50"), 6).alias("p50_cnt"),
        F.round(F.col("__p90"), 6).alias("p90_cnt"),
        F.round(F.col("__p99"), 6).alias("p99_cnt"),
        "max_cnt",
        F.col("__top.k").alias("top_key"),
        F.round(
            F.col("max_cnt").cast("double") / F.col("n_rows").cast("double"), 6
        ).alias("top_share"),
    )


def rate_confidence_by_group(
    df: DataFrame,
    group_col: str,
    pass_col: Column,
    z: float = 1.96,
) -> DataFrame:
    """Wilson score 95% confidence interval for a per-group pass rate
    (Wilson 1927) — the number that turns "source X passes the quality
    gate 62% of the time" into "62% ± how much": before down-weighting
    or dropping a source over its gate rate, the interval says whether
    the observed gap is evidence or small-n noise. Wilson rather than
    the naive normal interval because it stays inside [0,1] and
    behaves at extreme rates/small groups — the regime long-tail
    sources actually occupy.

    One combinable groupBy over (group, passes, total) — counts are
    exact int64; every interval term is a fixed sequence of IEEE ops
    on the exact counts (z² kept as the PRODUCT z*z so both engines
    compute the identical double), sqrt correctly rounded, results
    6dp. At 100 TB: one scan, one tiny shuffle.

    Returns (group, n_docs, n_pass, rate, ci_low, ci_high) ordered by
    group.
    """
    per = df.groupBy(F.col(group_col).alias("g")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(pass_col, 1).otherwise(0)).cast("long").alias("k"),
    )
    zc = F.lit(z)
    z2 = zc * zc
    n = F.col("n").cast("double")
    p = F.col("k").cast("double") / n
    denom = F.lit(1.0) + z2 / n
    center = p + z2 / (F.lit(2.0) * n)
    margin = zc * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    return per.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_docs"),
        F.col("k").alias("n_pass"),
        F.round(p, 6).alias("rate"),
        F.round((center - margin) / denom, 6).alias("ci_low"),
        F.round((center + margin) / denom, 6).alias("ci_high"),
    ).orderBy(group_col)


def gate_agreement_kappa(
    df: DataFrame, pred_a, pred_b
) -> DataFrame:
    """Cohen's kappa between two boolean quality gates — the
    chance-corrected agreement number that answers "does the cheap
    gate reproduce the expensive one?" before swapping a heuristic
    filter for a learned one (e.g. the Gopher-style rule flags vs the
    distilled perceptron gate): raw accuracy flatters any pair of
    gates that both pass almost everything; kappa subtracts the
    agreement their marginal rates alone would produce (Cohen 1960;
    the standard reading: > 0.8 near-interchangeable, < 0.4 the
    gates disagree on what quality means).

    kappa = (p_o - p_e)/(1 - p_e) with p_o the observed agreement
    rate and p_e = pa*pb + (1-pa)*(1-pb) from the marginals — every
    input an exact int64 count from ONE combinable aggregate over the
    predicate pair, every float step a fixed IEEE sequence on exact
    integers, 6dp. Degenerate marginals (p_e = 1: both gates
    constant) yield NULL kappa. NULL predicate values count as False
    (a gate that cannot evaluate a row does not pass it).

    Plan: one scan, one 1-row aggregate — scan-bound at any scale.
    Returns ONE row: (n_rows, n_both, n_only_a, n_only_b, n_neither,
    p_observed, p_expected, kappa).
    """
    a = F.coalesce(pred_a.cast("boolean"), F.lit(False))
    b = F.coalesce(pred_b.cast("boolean"), F.lit(False))
    m = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((a & b).cast("int")).cast("long").alias("n_both"),
        F.sum((a & ~b).cast("int")).cast("long").alias("n_only_a"),
        F.sum((~a & b).cast("int")).cast("long").alias("n_only_b"),
        F.sum((~a & ~b).cast("int")).cast("long").alias("n_neither"),
    )
    n = F.col("n_rows").cast("double")
    po = (F.col("n_both") + F.col("n_neither")).cast("double") / n
    pa = (F.col("n_both") + F.col("n_only_a")).cast("double") / n
    pb = (F.col("n_both") + F.col("n_only_b")).cast("double") / n
    pe = pa * pb + (F.lit(1.0) - pa) * (F.lit(1.0) - pb)
    return m.select(
        "n_rows",
        "n_both",
        "n_only_a",
        "n_only_b",
        "n_neither",
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.when(
            pe < F.lit(1.0), F.round((po - pe) / (F.lit(1.0) - pe), 6)
        ).alias("kappa"),
    )


def benford_conformity(df: DataFrame, value_col: str) -> DataFrame:
    """Benford conformity statistics — the one-row verdict over
    benford_first_digit's 9-row table: the chi-square goodness-of-fit
    against the Benford expectation and Nigrini's Mean Absolute
    Deviation (the audit-practice thresholds read MAD < 0.006 close
    conformity, 0.006-0.012 acceptable, 0.012-0.015 marginal, > 0.015
    nonconformity). The digit screen shows WHERE the distribution
    deviates; this says WHETHER the column passes at all.

    The digit spine is the literal 1..9 Range — a digit absent from
    the data still contributes its full expected mass to chi-square
    and its deviation to MAD (observed-only would understate both).
    Expected shares are one log10 per digit rounded 6dp (the same
    literal sequence as the screen); each chi2 term
    (o - n*p)^2/(n*p) and each |share - p| is a fixed IEEE sequence
    rounded 6dp then DECIMAL(27,6)-summed (order-free); MAD is the
    sum divided by 9. Plan: the screen's 9-cell groupBy + bounded
    spine arithmetic — scan-bound.

    Returns ONE row: (n_obs, chi2, mad).
    """
    cents = F.floor(
        F.col(value_col).cast("double") * F.lit(100.0) + F.lit(0.5)
    ).cast("long")
    per = (
        df.where(F.col(value_col).isNotNull() & (F.col(value_col) > 0))
        .select(
            F.substring(cents.cast("string"), 1, 1).cast("int").alias(
                "digit"
            )
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("n_obs"))
    )
    spine = df.sparkSession.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    cells = spine.join(per, "digit", "left").select(
        "digit", F.coalesce("n_obs", F.lit(0)).cast("long").alias("o")
    )
    tot = cells.agg(F.sum("o").cast("long").alias("n"))
    j = cells.crossJoin(F.broadcast(tot))
    d = F.col("digit").cast("double")
    p = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / d), 6)
    e = F.col("n").cast("double") * p
    # n = 0 (empty relation) ⇒ NULL terms, NULL chi2/mad — SQL division
    # semantics, not an ANSI crash; matches the oracle bit for bit.
    chi_term = F.when(
        F.col("n") > 0,
        F.round(
            (F.col("o").cast("double") - e)
            * (F.col("o").cast("double") - e)
            / e,
            6,
        ),
    )
    dev_term = F.when(
        F.col("n") > 0,
        F.round(
            F.abs(F.col("o").cast("double") / F.col("n").cast("double") - p),
            6,
        ),
    )
    dec6 = lambda c: c.cast("decimal(27,6)")  # noqa: E731
    m = j.groupBy("n").agg(
        F.sum(dec6(chi_term)).alias("__chi"),
        F.sum(dec6(dev_term)).alias("__dev"),
    )
    return m.select(
        F.col("n").alias("n_obs"),
        F.round(F.col("__chi").cast("double"), 6).alias("chi2"),
        F.round(
            F.col("__dev").cast("double") / F.lit(9.0), 6
        ).alias("mad"),
    )


def score_label_auc(df: DataFrame, score_col: str, label_col) -> DataFrame:
    """ROC-AUC (and the accuracy-ratio Gini 2*AUC-1) of a continuous
    score against a boolean label — the ranking-power member of the
    classifier-eval battery: kappa (gate_agreement_kappa) asks
    whether two HARD gates agree; AUC asks whether the SOFT score
    orders positives above negatives at any threshold (0.5 = no
    signal), i.e. whether thresholding the score can ever reproduce
    the gate. AUC IS the Mann-Whitney probability of superiority, so
    the construction is the drift tier's rank-sum machinery aimed at
    labels instead of time windows.

    Exact: scores are 6dp-rounded producers, so the distinct-score
    relation is domain-bounded (<= 10^6+1 cells for a [0,1] score);
    tie handling is the average-rank convention in exact
    DECIMAL(38,0) integers over that relation (ties between a
    positive and negative count half — the trapezoidal ROC rule);
    AUC is ONE double division. NULL labels count as negatives;
    degenerate inputs (single class) yield NULL.

    Returns ONE row: (n_pos, n_neg, auc, gini).
    """
    from pyspark.sql import Window

    lab = F.coalesce(label_col.cast("boolean"), F.lit(False)).cast("int")
    cells = (
        df.where(F.col(score_col).isNotNull())
        .select(F.col(score_col).alias("s"), lab.alias("y"))
        .groupBy("s")
        .agg(
            F.count(F.lit(1)).alias("t"),
            F.sum("y").cast("long").alias("t_pos"),
        )
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = cells.withColumn(
        "cb",
        F.coalesce(
            F.sum(F.col("t") - F.col("t_pos")).over(w), F.lit(0)
        ).cast("long"),
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = ranked.agg(
        F.sum("t_pos").cast("long").alias("n_pos"),
        (F.sum("t") - F.sum("t_pos")).cast("long").alias("n_neg"),
        F.sum(
            dec(F.col("t_pos"))
            * (
                F.lit(2) * dec(F.col("cb"))
                + dec(F.col("t") - F.col("t_pos"))
            )
        ).alias("__u2"),
    )
    np_, nn = F.col("n_pos").cast("double"), F.col("n_neg").cast("double")
    auc = F.col("__u2").cast("double") / F.lit(2.0) / (np_ * nn)
    ok = (F.col("n_pos") > 0) & (F.col("n_neg") > 0)
    return m.select(
        "n_pos",
        "n_neg",
        F.when(ok, F.round(auc, 6)).alias("auc"),
        F.when(ok, F.round(F.lit(2.0) * auc - F.lit(1.0), 6)).alias(
            "gini"
        ),
    )


def score_lift_table(
    df: DataFrame, id_col: str, score_col: str, label_col
) -> DataFrame:
    """Decile gains/lift table of a score against a boolean label —
    the operational reading next to AUC: AUC summarizes ranking power
    in one number; the lift table says what a CAPACITY-constrained
    consumer gets ('review the top 10% by score → catch X% of
    positives at Y× the base rate') — the standard model-adoption
    artifact for a curation or fraud queue.

    Deterministic deciles: rows order by (score desc, id asc) — a
    total order — and the decile is the INTEGER floor((rn-1)*10/n)+1
    (no float ntile); per-decile positives are exact counts; rate,
    cumulative recall, and lift-vs-base-rate are fixed IEEE
    sequences, 6dp. The global row_number runs over the scored
    relation — swap in windows.scalable_ranks' range-partitioned
    ranks past single-window scale (the documented unbounded-order
    path). NULL labels count as negatives; a label-free corpus
    yields NULL rates.

    Returns (decile, n_rows, n_pos, pos_rate, cum_recall, lift)
    ordered by decile.
    """
    from pyspark.sql import Window

    lab = F.coalesce(label_col.cast("boolean"), F.lit(False)).cast("int")
    # NaN scores are EXCLUDED (not ranked): NaN sorts greatest in both
    # ascending and descending Spark sorts, so the negated-key scale
    # twin (score_lift_table_scalable) would bin a NaN differently —
    # dropping them here keeps the two bit-identical for any input.
    scored = df.where(
        F.col(score_col).isNotNull()
        & ~F.isnan(F.col(score_col).cast("double"))
    ).select(
        F.col(id_col).alias("__id"),
        F.col(score_col).alias("s"),
        lab.alias("y"),
    )
    w = Window.orderBy(F.desc("s"), F.asc("__id"))
    wall = Window.partitionBy()
    ranked = scored.withColumn(
        "rn", F.row_number().over(w).cast("long")
    ).withColumn("n", F.count(F.lit(1)).over(wall).cast("long"))
    binned = ranked.withColumn(
        "decile",
        (
            F.floor(
                (F.col("rn") - 1) * F.lit(10) / F.col("n")
            )
            + F.lit(1)
        ).cast("int"),
    )
    return _lift_tail(binned)


def _lift_tail(binned: DataFrame) -> DataFrame:
    """Shared lift-table tail: (decile, y) rows → the per-decile
    gains table. Windows run over the ≤10-row decile relation only."""
    from pyspark.sql import Window

    per = binned.groupBy("decile").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n_rows").cast("long").alias("__n"),
        F.sum("n_pos").cast("long").alias("__p"),
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    j = per.crossJoin(F.broadcast(tot)).withColumn(
        "cum_pos", F.sum("n_pos").over(wcum).cast("long")
    )
    rate = F.col("n_pos").cast("double") / F.col("n_rows").cast("double")
    base = F.col("__p").cast("double") / F.col("__n").cast("double")
    return j.select(
        "decile",
        "n_rows",
        "n_pos",
        F.round(rate, 6).alias("pos_rate"),
        F.when(
            F.col("__p") > 0,
            F.round(
                F.col("cum_pos").cast("double") / F.col("__p").cast("double"),
                6,
            ),
        ).alias("cum_recall"),
        F.when(F.col("__p") > 0, F.round(rate / base, 6)).alias("lift"),
    ).orderBy("decile")


def score_lift_table_scalable(
    df: DataFrame, id_col: str, score_col: str, label_col
) -> DataFrame:
    """score_lift_table WITHOUT the global row_number window — the
    scale path its docstring promises, built on
    windows.scalable_unique_ranks (per-value hash-agg → range
    partition → local cumulative counts → bounded subtotal collect →
    broadcast offsets): no stage ever funnels the scored relation
    through one reducer. Descending score order is obtained by
    negating the score (exact for IEEE doubles). Output is
    bit-identical to score_lift_table — both registry rows share one
    oracle, which PROVES the equivalence on every sweep.
    """
    from .windows import scalable_unique_ranks

    lab = F.coalesce(label_col.cast("boolean"), F.lit(False)).cast("int")
    # Same NaN exclusion as score_lift_table: IEEE negation reverses
    # order EXCEPT for NaN (greatest in both sort directions), so a
    # NaN would land in decile 10 here but decile 1 there — filtering
    # it in both preserves the documented bit-identical equivalence.
    scored = df.where(
        F.col(score_col).isNotNull()
        & ~F.isnan(F.col(score_col).cast("double"))
    ).select(
        F.col(id_col).alias("__id"),
        (-F.col(score_col)).alias("__neg_s"),
        lab.alias("y"),
    )
    # The scored relation is typically EXPENSIVE to produce (regex
    # feature passes); the rank machinery consumes it three times
    # (per-value aggregate, rank join-back, total count) — persist it
    # once or the scan cost triples (measured 33.7s -> ~14s at 25x).
    from ..session import track_persist

    scored = track_persist(scored)
    ranked = scalable_unique_ranks(
        scored, "__neg_s", "__id", attach_total_col="__n_rows_total"
    ).join(scored.select("__id", "y"), "__id")
    binned = ranked.withColumn(
        "decile",
        (
            F.floor(
                (F.col("rn") - 1) * F.lit(10) / F.col("__n_rows_total")
            )
            + F.lit(1)
        ).cast("int"),
    )
    return _lift_tail(binned.select("decile", "y"))


def score_calibration_table(
    df: DataFrame, score_col: str, label_col
) -> DataFrame:
    """Reliability (calibration) table of a [0,1] score against a
    boolean label over 10 fixed-width score bins — the third member
    of the classifier-eval battery: AUC (score_label_auc) measures
    RANKING power, the lift table (score_lift_table) measures
    capacity-constrained yield, and calibration asks whether the
    score's VALUE means what it says (a 0.7-scored doc should pass
    the gate ~70% of the time) — the property a curation pipeline
    needs before using the score as a sampling weight or threshold
    probability rather than a mere ranker.

    Exact: scores are 6dp-rounded producers, so k = round(s*1e6) is
    an exact integer in [0, 1e6] on both engines; bins are integer
    floor(k/1e5) (fixed width 0.1, half-open, top-closed); per-bin
    sums of k and y accumulate in DECIMAL(38,0) (no float-sum order
    dependence at any row count); mean_score, pos_rate and the
    signed gap (mean_score - pos_rate, its numerator the exact
    integer sk - 1e6*n_pos) are each ONE double division of exact
    integers. NULL labels count as negatives.

    Returns (bin, n_rows, n_pos, mean_score, pos_rate, gap) ordered
    by bin; bins with no rows are absent (the oracle replays the
    same grouping).
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lab = F.coalesce(label_col.cast("boolean"), F.lit(False)).cast("int")
    kk = df.where(F.col(score_col).isNotNull()).select(
        F.round(F.col(score_col) * F.lit(1000000.0), 0)
        .cast("long")
        .alias("k"),
        lab.alias("y"),
    )
    binned = kk.withColumn(
        "bin",
        (
            F.least(
                F.floor(F.col("k").cast("double") / F.lit(100000.0)).cast(
                    "int"
                ),
                F.lit(9),
            )
            + F.lit(1)
        ).cast("int"),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("y").cast("long").alias("n_pos"),
        F.sum(dec(F.col("k"))).alias("sk"),
    )
    nr = F.col("n_rows").cast("double")
    return per.select(
        "bin",
        "n_rows",
        "n_pos",
        F.round(
            F.col("sk").cast("double") / (nr * F.lit(1000000.0)), 6
        ).alias("mean_score"),
        F.round(F.col("n_pos").cast("double") / nr, 6).alias("pos_rate"),
        F.round(
            (F.col("sk") - dec(F.col("n_pos")) * F.lit(1000000)).cast(
                "double"
            )
            / (nr * F.lit(1000000.0)),
            6,
        ).alias("gap"),
    ).orderBy("bin")


def score_brier(df: DataFrame, score_col: str, label_col) -> DataFrame:
    """Brier score, Brier skill vs the base-rate forecast, and
    expected calibration error of a [0,1] score against a boolean
    label — the one-row summary over score_calibration_table's bins:
    Brier = mean((s-y)^2) is the proper scoring rule (rewards
    calibration AND sharpness together); skill = 1 - BS/BS_ref with
    BS_ref = p(1-p) the constant-base-rate forecast (positive skill
    = the score beats knowing only the prevalence); ECE is the
    bin-weighted |mean_score - pos_rate| over the same 10 fixed
    bins.

    ONE combinable pass: with k = round(s*1e6) integer, the Brier
    numerator expands to sum k^2 - 2e6*sum(k*y) + 1e12*sum(y), and
    the ECE numerator telescopes to sum_b |sk_b - 1e6*pos_b| (the
    n_b/n weight cancels each bin's denominator) — so ALL outputs
    derive from one per-bin groupBy of exact DECIMAL(38,0) integer
    sums (n, pos, sum k, sum k^2, sum k*y) folded by a <=10-row
    aggregate; each output is ONE double division, order-free on
    both engines. (The naive two-aggregate form re-scanned the
    scored relation twice — measured 2x the single-pass cost at 25x
    docs.) NULL labels count as negatives; a single-class corpus
    yields NULL skill.

    Returns ONE row: (n, n_pos, brier, brier_skill, ece).
    """
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    lab = F.coalesce(label_col.cast("boolean"), F.lit(False)).cast("int")
    kk = df.where(F.col(score_col).isNotNull()).select(
        F.round(F.col(score_col) * F.lit(1000000.0), 0)
        .cast("long")
        .alias("k"),
        lab.alias("y"),
    )
    binned = kk.withColumn(
        "bin",
        (
            F.least(
                F.floor(F.col("k").cast("double") / F.lit(100000.0)).cast(
                    "int"
                ),
                F.lit(9),
            )
            + F.lit(1)
        ).cast("int"),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("y").cast("long").alias("n_pos_b"),
        F.sum(dec(F.col("k"))).alias("sk"),
        F.sum(dec(F.col("k")) * dec(F.col("k"))).alias("sk2"),
        F.sum(dec(F.col("k") * F.col("y"))).alias("sky"),
    )
    m = per.agg(
        F.sum("n_rows").cast("long").alias("n"),
        F.sum("n_pos_b").cast("long").alias("n_pos"),
        (
            F.sum("sk2")
            - F.lit(2000000).cast("decimal(38,0)") * F.sum("sky")
            + F.lit(1000000000000).cast("decimal(38,0)")
            * F.sum(dec(F.col("n_pos_b")))
        ).alias("sd2"),
        F.sum(
            F.abs(F.col("sk") - dec(F.col("n_pos_b")) * F.lit(1000000))
        ).alias("enum_"),
    )
    n_d = F.col("n").cast("double")
    brier = F.col("sd2").cast("double") / (n_d * F.lit(1000000000000.0))
    ref = (
        dec(F.col("n_pos")) * dec(F.col("n") - F.col("n_pos"))
    ).cast("double") / (n_d * n_d)
    ok = (F.col("n_pos") > 0) & (F.col("n_pos") < F.col("n"))
    return m.select(
        "n",
        "n_pos",
        F.round(brier, 6).alias("brier"),
        F.when(ok, F.round(F.lit(1.0) - brier / ref, 6)).alias(
            "brier_skill"
        ),
        F.round(
            F.col("enum_").cast("double") / (n_d * F.lit(1000000.0)), 6
        ).alias("ece"),
    )


def fd_audit(
    df: DataFrame, table_name: str, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency audit over candidate (determinant ->
    dependent) column pairs — the schema-profiling classic next to
    column_profile and k_anonymity_audit: an FD that HOLDS is a
    candidate key fragment / normalization opportunity / join-safety
    guarantee ("joining on lhs cannot fan out rhs"); a near-FD's
    violation count is a data-quality signal (entity resolution
    candidates, corrupted dimension rows).

    One combinable pass per pair: groupBy(lhs) -> count_distinct(rhs)
    (map-side partial aggregation collapses duplicates before the
    shuffle), then a 1-row fold counting violating determinant values
    and surplus dependent values. Pairs are unioned — each arm is an
    independent scan-bound aggregate; Catalyst prunes each scan to
    exactly its two columns.

    Returns one row per pair: (tbl, lhs, rhs, n_lhs, violating_lhs,
    surplus_rhs, holds) ordered by (tbl, lhs, rhs).
    """
    arms = []
    for lhs, rhs in pairs:
        g = (
            df.where(F.col(lhs).isNotNull())
            .groupBy(lhs)
            .agg(F.countDistinct(rhs).alias("__d"))
        )
        arms.append(
            g.agg(
                F.lit(table_name).alias("tbl"),
                F.lit(lhs).alias("lhs"),
                F.lit(rhs).alias("rhs"),
                F.count(F.lit(1)).cast("long").alias("n_lhs"),
                F.sum((F.col("__d") > 1).cast("int"))
                .cast("long")
                .alias("violating_lhs"),
                (F.sum("__d") - F.count(F.lit(1)))
                .cast("long")
                .alias("surplus_rhs"),
            ).withColumn("holds", F.col("violating_lhs") == 0)
        )
    out = arms[0]
    for a in arms[1:]:
        out = out.unionByName(a)
    return out.orderBy("tbl", "lhs", "rhs")


def conformal_calibrate(
    calib: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Calibration half of the split-conformal recipe: per group, the
    mean predictor and qhat = the ceil((n+1)(1−α))-th smallest
    absolute residual (pure-integer rank arithmetic, capped at n).
    Returns (group, n_calib, mean_v, qhat) — the FROZEN artifact both
    the batch eval (conformal_intervals) and the streaming coverage
    monitor (streaming/sinks.py:conformal_monitor_sink) consume."""
    cov_num = alpha_den - alpha_num
    stats = calib.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_calib"),
        F.sum(F.col(value_col).cast("long")).alias("sum_v"),
    ).withColumn(
        "mean_v",
        F.col("sum_v").cast("double") / F.col("n_calib").cast("double"),
    ).withColumn(
        "r_rank",
        F.least(
            F.expr(
                f"((n_calib + 1) * {cov_num} + {alpha_den} - 1) "
                f"div {alpha_den}"
            ),
            F.col("n_calib"),
        ),
    )
    from pyspark.sql import Window

    res = calib.join(
        F.broadcast(stats.select(group_col, "mean_v", "r_rank")), group_col
    ).withColumn(
        "resid",
        F.abs(F.col(value_col).cast("double") - F.col("mean_v")),
    )
    w = Window.partitionBy(group_col).orderBy("resid", id_col)
    q = (
        res.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == F.col("r_rank"))
        .select(group_col, F.col("resid").alias("qhat"))
    )
    return stats.select(group_col, "n_calib", "mean_v").join(q, group_col)


def conformal_intervals(
    df: DataFrame,
    group_col: str,
    value_col: str,
    calib_col: str,
    id_col: str,
    alpha_num: int = 1,
    alpha_den: int = 10,
) -> DataFrame:
    """Split-conformal prediction intervals (Vovk et al. 2005; Lei et
    al. 2018) per group, with measured held-out coverage — the
    distribution-free uncertainty wrapper a data pipeline puts around
    ANY point predictor. Here the predictor is the per-group
    calibration mean; the nonconformity score is the absolute
    residual; the interval is mean ± qhat where qhat is the
    ceil((n+1)(1−α))-th smallest calibration residual — guaranteeing
    ≥ 1−α coverage on exchangeable test rows regardless of the value
    distribution.

    Exactness contract: ``value_col`` must be an exact integer (cents),
    ``calib_col`` a deterministic hash-split flag (rand() resamples per
    partition layout). The calibration mean is ONE division of exact
    int64 operands; residuals, the quantile pick and the coverage test
    are then fixed IEEE expressions on it — bit-identical on any
    engine. α is a rational (num/den), so the rank
    ceil((n+1)·(den−num)/den) is computed in pure integer arithmetic
    (floor((x·(den−num)+den−1)/den), exact while x·den < 2⁵³ — i.e.
    up to ~10¹² calibration rows; past that, swap the long for a
    DECIMAL, nothing else changes).

    Scale: one combinable aggregate for the means, one per-group
    window sort over CALIBRATION rows only (the half you deliberately
    keep small), one broadcast join of the |groups|-row (mean, qhat)
    frame back onto the test half. Output is |groups| rows.
    """
    gq = conformal_calibrate(
        df.where(F.col(calib_col)),
        group_col,
        value_col,
        id_col,
        alpha_num=alpha_num,
        alpha_den=alpha_den,
    )
    test = df.where(~F.col(calib_col)).join(F.broadcast(gq), group_col)
    out = test.groupBy(group_col, "n_calib", "qhat").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(
            F.when(
                F.abs(F.col(value_col).cast("double") - F.col("mean_v"))
                <= F.col("qhat"),
                1,
            ).otherwise(0)
        ).cast("long").alias("n_covered"),
    )
    return out.select(
        group_col,
        "n_calib",
        "n_test",
        F.round(F.col("qhat") / F.lit(100.0), 6).alias("qhat"),
        F.round(
            F.col("n_covered").cast("double")
            / F.col("n_test").cast("double"),
            6,
        ).alias("coverage"),
    ).orderBy(group_col)


def quantile_normalize(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group quantile normalization onto the POOLED distribution
    (the microarray-era classic — Bolstad et al. 2003 — and the
    cross-source score-calibration move in data curation): each row's
    value is replaced by the pooled-distribution order statistic at
    the same within-group quantile, so every group ends up with an
    identical value distribution while preserving within-group rank.

        p = ceil(rank_g · N / n_g)     (type-1 / inverse-CDF position)
        normalized = pooled value at global position p

    Exact-integer contract: values must be integers; ranks are unique
    (value, id) orderings; the position arithmetic is pure integer
    floor-div (exact while rank·N < 2⁵³ — swap to DECIMAL past ~10²⁶
    row-pairs). No floats anywhere, so any engine agrees exactly.

    Scale: the within-group rank is a per-group window (parallel
    across groups). The pooled CDF is NOT a global row sort — it is a
    value-cells relation (groupBy value → counts → running sum over
    the BOUNDED distinct-value domain), broadcast and range-joined
    (p ∈ (cum−cnt, cum]) back onto the rows. A 100 TB corpus with a
    bounded measurement domain (doc lengths, scores) keeps cells tiny
    while rows stay distributed.
    """
    from pyspark.sql import Window

    v = F.col(value_col).cast("long")
    cells = (
        df.groupBy(v.alias("__v"))
        .agg(F.count(F.lit(1)).cast("long").alias("__cnt"))
    )
    wc = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, 0)
    cells = cells.withColumn("__cum", F.sum("__cnt").over(wc).cast("long"))
    total = df.agg(F.count(F.lit(1)).cast("long").alias("__n_total"))
    wg = Window.partitionBy(group_col).orderBy(value_col, id_col)
    ranked = (
        df.select(group_col, value_col, id_col)
        .withColumn("__rank", F.row_number().over(wg).cast("long"))
        .withColumn(
            "__n_g",
            F.count(F.lit(1))
            .over(Window.partitionBy(group_col))
            .cast("long"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "__p",
            F.expr("(__rank * __n_total + __n_g - 1) div __n_g"),
        )
    )
    out = ranked.join(
        F.broadcast(cells),
        (F.col("__p") > F.col("__cum") - F.col("__cnt"))
        & (F.col("__p") <= F.col("__cum")),
    )
    return out.select(
        id_col,
        group_col,
        F.col(value_col).cast("long").alias(value_col),
        F.col("__v").alias(f"norm_{value_col}"),
    )
