"""User-behavior analytics: funnels, cohort retention, transition
matrices, and recency-decayed scoring over the events stream.

These are the product-analytics counterparts of the reference's
dashboard tier (weekday activity, region top-k — see
silver_to_gold_on_minio.py:118-161): the same events table, but
sequenced per user instead of rolled up per day. All four operators
are pure Catalyst — no UDFs, no collects — and every shuffle is keyed
on ``user_id`` (or a tiny derived key), so they scale to the events
volume the groupBy dashboards already handle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from pyspark.storagelevel import StorageLevel


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered-funnel conversion: how many users reached step k having
    gone through steps 1..k-1 *in timestamp order*.

    Step k's entry time for a user is min(ts of step-k events at or
    after their step-(k-1) entry time). One pass per step, but each
    pass filters to a single event type *before* the per-user
    aggregate, so the type predicate reaches the scan (partition /
    row-group pruning on a type-partitioned layout) and each shuffle
    carries only the users still alive in the funnel — the classic
    narrowing-funnel shape. Each level is persisted (two consumers:
    the next level's join and its own count) and counted EAGERLY, so
    level k-1's cache is released the moment level k has materialized
    — peak executor storage is two levels, not len(steps), and no
    cached relation outlives the call. The per-level count is the one
    action the operator exists to produce (a single scalar), so eager
    evaluation costs nothing extra. Output: (step_idx, step, users) as
    a len(steps)-row local relation.
    """
    rows = []
    reached = None
    prev = None
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if reached is None:
            cur = ev.groupBy("u").agg(F.min("t").alias("entry"))
        else:
            cur = (
                ev.join(reached, "u")
                .filter(F.col("t") >= F.col("entry"))
                .groupBy("u")
                .agg(F.min("t").alias("entry"))
            )
        reached = cur.persist(StorageLevel.MEMORY_AND_DISK)
        rows.append((i + 1, step, reached.count()))
        if prev is not None:
            prev.unpersist()
        prev = reached
    if prev is not None:
        prev.unpersist()
    return events.sparkSession.createDataFrame(
        rows, schema="step_idx int, step string, users bigint"
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-seen
    week, counted distinct in each later week they return.

    Two shuffles — per-user min (map-side combinable) and the final
    (cohort, offset) distinct-count — joined on ``user_id`` so AQE can
    pick the strategy. Output: (cohort_week, week_offset, users).
    """
    wk = lambda c: F.date_trunc("week", c).cast("date")  # noqa: E731
    firsts = events.groupBy(F.col(user_col).alias("u")).agg(
        F.min(ts_col).alias("first_ts")
    )
    active = events.select(
        F.col(user_col).alias("u"), wk(F.col(ts_col)).alias("week")
    ).distinct()
    return (
        active.join(firsts, "u")
        .select(
            "u",
            wk(F.col("first_ts")).alias("cohort_week"),
            (F.datediff("week", wk(F.col("first_ts"))) / 7).cast("int").alias(
                "week_offset"
            ),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("u").alias("users"))
    )


def event_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """First-order Markov transition counts: (previous event type →
    event type) per user in timestamp order, ties broken by a unique
    id so the sequence — and thus the counts — are deterministic.

    lag() needs one shuffle on user_id (window partition); the
    transition groupBy then reduces on a tiny (from, to) key with full
    map-side combine. Output: (from_type, to_type, cnt).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col)
    return (
        events.select(
            F.lag(type_col).over(w).alias("from_type"),
            F.col(type_col).alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def decayed_user_score(
    events: DataFrame,
    halflife_days: float = 7.0,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Recency-weighted engagement score: sum(value · 0.5^(age/halflife))
    per user, aged against the corpus max timestamp.

    The "now" anchor is a 1-row aggregate CROSS JOINed back (broadcast
    of one row — same spine idiom as timeseries.daily_counts_gapfilled),
    never a driver collect. Ages are exact integer microseconds
    (unix_micros — unix_timestamp would floor to seconds and diverge
    from the oracle's epoch_us); each term is rounded to 6dp and
    accumulated in DECIMAL so the sum is order-independent under AQE
    partitioning and the ≤1-ulp pow() spread between libm
    implementations vanishes under the rounding. Output: (user_id,
    score rounded to 6dp).
    """
    now = events.agg(F.max(ts_col).alias("now_ts"))
    age_days = (
        F.unix_micros(F.col("now_ts")) - F.unix_micros(F.col(ts_col))
    ) / F.lit(86400e6)
    term = F.round(
        F.col(value_col) * F.pow(F.lit(0.5), age_days / F.lit(halflife_days)), 6
    ).cast("decimal(38,10)")
    return (
        events.crossJoin(F.broadcast(now))
        .select(F.col(user_col), term.alias("term"))
        .groupBy(user_col)
        .agg(F.round(F.sum("term"), 6).cast("double").alias("score"))
    )


def sequence_motifs(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    type_col: str,
    order_tiebreak: str,
    top: int = 100,
) -> DataFrame:
    """Contiguous 3-step behavior motifs: for every user's event
    stream ordered by (ts, tiebreak), count each consecutive
    (e₁ → e₂ → e₃) type trigram across the population, top-``top``
    overall — the exploratory flip side of funnel_counts (which
    verifies ONE hypothesized path; this surfaces which paths exist,
    e.g. the browse→add→abandon loops worth a funnel of their own).

    Plan: ONE per-user window pass (two lead()s — the same shuffle a
    sessionizer already pays, no self-joins), then a map-side-
    combinable motif count and a TakeOrderedAndProject top-k with
    lexicographic tiebreak. The window's partition key is the user:
    maximally spread, never needs salting. The ordering includes a
    unique tiebreak column so ties at equal timestamps are
    deterministic across engines.

    Returns (motif, cnt), 'a>b>c'-formatted.
    """
    from pyspark.sql import Window

    # NULL event types are dropped BEFORE the window: concat_ws would
    # silently skip them ('a>c' from a 3-step with a NULL middle),
    # while SQL '||' propagates NULL and drops the row — filtering up
    # front gives both engines the same well-defined stream semantics
    # (a NULL type is an unusable step, not a joinable one).
    df = df.where(F.col(type_col).isNotNull())
    w = Window.partitionBy(user_col).orderBy(ts_col, order_tiebreak)
    steps = df.select(
        F.col(type_col).alias("t1"),
        F.lead(type_col, 1).over(w).alias("t2"),
        F.lead(type_col, 2).over(w).alias("t3"),
    ).where(F.col("t3").isNotNull())
    return (
        steps.select(
            F.concat_ws(">", "t1", "t2", "t3").alias("motif")
        )
        .groupBy("motif")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("motif"))
        .limit(top)
    )


def transition_entropy(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Entropy rate of the first-order event-type Markov chain — the
    one-number predictability summary of the event_transitions
    matrix: H = -sum_ij (c_ij/N) ln(c_ij/c_i.) in nats, the expected
    per-step surprise under the empirical transition model. Near 0:
    journeys are deterministic (each type has one dominant
    successor); near ln(k): the next event is anyone's guess — the
    number a sessionization or next-event-prediction effort reads
    FIRST, since it upper-bounds how predictable the stream can be.

    Built on the same deterministic transition counts as
    event_transitions ((ts, id)-ordered lag per user); row marginals
    are a window sum over the tiny (from, to) cell relation. Each
    cell's term has ONE ln on a ratio of exact integers, rounded 6dp
    then DECIMAL(27,6)-summed (order-free); H is exact decimal cast
    once. Plan: one user-keyed window shuffle, one tiny cell reduce,
    then small-relation arithmetic.

    Returns ONE row: (n_transitions, n_states, entropy_rate,
    max_entropy) — max_entropy = ln(n_states) for the uniform-chain
    ceiling, one libm call.
    """
    from pyspark.sql import Window

    cells = event_transitions(
        events, user_col, type_col, ts_col, tiebreak_col
    )
    wrow = Window.partitionBy("from_type")
    wall = Window.partitionBy()
    sized = cells.withColumn(
        "row_tot", F.sum("cnt").over(wrow).cast("long")
    ).withColumn("n", F.sum("cnt").over(wall).cast("long"))
    term = F.round(
        (F.col("cnt").cast("double") / F.col("n").cast("double"))
        * F.log(
            F.col("row_tot").cast("double") / F.col("cnt").cast("double")
        ),
        6,
    )
    m = sized.groupBy("n").agg(
        F.count_distinct("from_type").cast("long").alias("n_states"),
        F.sum(term.cast("decimal(27,6)")).alias("__h"),
    )
    return m.select(
        F.col("n").alias("n_transitions"),
        "n_states",
        F.round(F.col("__h").cast("double"), 6).alias("entropy_rate"),
        F.round(F.log(F.col("n_states").cast("double")), 6).alias(
            "max_entropy"
        ),
    )


def interarrival_burstiness(
    events: DataFrame,
    group_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
) -> DataFrame:
    """Goh-Barabási burstiness B = (sigma - mu)/(sigma + mu) of
    per-user inter-arrival times, per event type — the gap-level
    companion to the Fano factor on daily counts
    (timeseries.burstiness_by_group): Fano reads clumping of VOLUME
    into days; B reads the shape of the gap distribution itself
    (B = -1 periodic heartbeat, B ~ 0 Poisson, B -> 1 extreme
    bursts), the standard human-dynamics diagnostic (Goh & Barabási
    2008) for retry storms vs organic traffic.

    Per-USER gaps by design: gaps within (type, user) sequences in
    (ts, id) order — the behaviorally meaningful cadence AND the
    scale-safe window (partitioned by fine-grained (type, user)
    keys, never a per-type global sort). Gaps are exact integer
    MICROseconds (unix_micros — second-floor truncation would alias
    sub-second bursts); moments (n, S, Q) are exact
    DECIMAL(38,0)/HUGEINT; B simplifies to
    (sqrt(n*Q - S^2) - S)/(sqrt(n*Q - S^2) + S) — the n cancels —
    ONE sqrt on an exact integer, a fixed IEEE tail, 6dp.
    Degenerate groups (< 1 gap, or zero mean) yield NULL.

    Returns (group, n_gaps, mean_gap_s, burstiness) ordered by group.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(group_col, user_col).orderBy(
        ts_col, tiebreak_col
    )
    micros = F.unix_micros(F.col(ts_col))
    gaps = (
        events.select(
            F.col(group_col).alias("g"),
            F.col(user_col).alias("u"),
            (micros - F.lag(micros).over(w)).alias("gap"),
        )
        .where(F.col("gap").isNotNull())
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = gaps.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.sum("gap").cast("long").alias("s"),
        F.sum(dec(F.col("gap")) * dec(F.col("gap"))).alias("q"),
    )
    disc = (
        dec(F.col("n_gaps")) * F.col("q") - dec(F.col("s")) * dec(F.col("s"))
    ).cast("double")
    sd = F.sqrt(disc)
    sdbl = F.col("s").cast("double")
    return m.select(
        F.col("g").alias(group_col),
        "n_gaps",
        F.round(
            sdbl / F.col("n_gaps").cast("double") / F.lit(1000000.0), 6
        ).alias("mean_gap_s"),
        F.when(
            (F.col("s") > 0) & (disc >= 0),
            F.round((sd - sdbl) / (sd + sdbl), 6),
        ).alias("burstiness"),
    ).orderBy(group_col)
