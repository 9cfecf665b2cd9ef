"""Deterministic sampling operators (north-star extension).

Training-data curation needs *reproducible* samples: `df.sample()` is
seed-and-partitioning dependent (a repartition changes the sample), so
pipelines that must be re-runnable key the sample on a content hash
instead — every engine, every partitioning, every rerun selects the
same rows. The md5-derived bucket is uniform, and the operators stay
pure Catalyst (map-side, zero shuffle, pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

# Hash buckets per key. 10_000 gives 0.01% rate granularity.
BUCKETS = 10_000


def hash_bucket(col, salt: str = "") -> F.Column:
    """Uniform bucket in [0, BUCKETS) keyed on md5(salt|key) — the
    deterministic stand-in for rand(). Changing ``salt`` draws an
    independent sample."""
    keyed = F.concat_ws("|", F.lit(salt), col.cast("string"))
    return F.pmod(md5_long(keyed), F.lit(BUCKETS)).cast("int")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash of
    ``key_col``. Deterministic across reruns/engines/partitionings."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(fraction * BUCKETS))


def weighted_hash_sample(
    df: DataFrame, key_col: str, weight_col: str, salt: str = ""
) -> DataFrame:
    """Per-row keep probability = ``weight_col`` (clamped to [0, 1]) —
    quality-score-proportional sampling, the standard soft filter for
    pretraining mixes (keep great docs always, mediocre ones
    sometimes). Same content-hash determinism as :func:`hash_sample`,
    with the threshold a column instead of a constant; still pure
    map-side."""
    w = F.least(F.greatest(F.col(weight_col), F.lit(0.0)), F.lit(1.0))
    return df.filter(
        hash_bucket(F.col(key_col), salt) < F.floor(w * F.lit(BUCKETS))
    )


def resample_to_mixture(
    df: DataFrame,
    key_col: str,
    source_col: str,
    targets: dict[str, float],
    salt: str = "mix",
) -> DataFrame:
    """Downsample sources so the surviving corpus matches ``targets``
    (weights summing to 1) — the data-mixing step of a pretraining
    pipeline ("20% code, 30% web, ...").

    The largest achievable corpus keeps T = min_s(count_s / w_s) total
    rows, i.e. the scarcest source relative to its target share is
    kept whole and every other source is hash-downsampled to rate_s =
    w_s·T / count_s. Everything is computed IN the plan: one hash
    aggregate for per-source counts (a handful of rows, broadcast
    back), a 1-row min for T, no driver round-trip. Rates use IEEE
    double division + floor to a bucket threshold, so a sequential
    engine replays the identical keep set. Sources absent from
    ``targets`` are dropped.

    A targeted source with ZERO corpus rows contributes count 0 to the
    min (the targets relation is a literal left-joined against the
    observed counts), so T = 0 and the result is EMPTY — the only
    corpus that honors the requested mixture — rather than silently
    renormalizing over the sources that happen to be present. Callers
    that prefer best-effort proportions should drop missing keys from
    ``targets`` first.
    """
    if not targets:
        raise ValueError("resample_to_mixture: targets must be non-empty")
    if any(w <= 0 for w in targets.values()):
        raise ValueError(
            "resample_to_mixture: every target weight must be > 0 "
            "(drop a source from targets to exclude it)"
        )
    tgt = df.sparkSession.createDataFrame(
        [(k, float(w)) for k, w in sorted(targets.items())],
        [source_col, "__w"],
    )
    observed = (
        df.filter(F.col(source_col).isin(*targets.keys()))
        .groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    counts = tgt.join(observed, source_col, "left").select(
        source_col, "__w", F.coalesce("__cnt", F.lit(0)).alias("__cnt")
    )
    t = counts.agg(
        F.min(F.col("__cnt") / F.col("__w")).alias("__t")
    )
    # A zero-count targeted source drives T to 0 (documented: the only
    # corpus honoring the mixture is empty) — but its OWN rate row
    # would then be 0/0, an ANSI crash; guard it to threshold 0.
    rates = counts.crossJoin(F.broadcast(t)).select(
        source_col,
        F.when(
            F.col("__cnt") > 0,
            F.floor(
                (F.col("__w") * F.col("__t") / F.col("__cnt")) * F.lit(BUCKETS)
            ),
        ).otherwise(F.lit(0)).alias("__thresh"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hash_bucket(F.col(key_col), salt) < F.col("__thresh"))
        .drop("__thresh")
    )


def temperature_weights(
    df: DataFrame,
    source_col: str,
    size_col,
) -> DataFrame:
    """Temperature-scaled (T = 2, i.e. weight ∝ size^(1/2)) mixture
    weights per source — the multilingual/multi-source rebalancing rule
    (raise rare sources, damp dominant ones) from the mT5/XLM-R
    pretraining recipes, computed over corpus *sizes* (token counts,
    not row counts).

    One hash aggregate to per-source totals (|sources| rows), then two
    unpartitioned windows over that tiny frame for the normalizing
    sums — at 100 TB the wide work is the first groupBy (map-side
    combinable, keyed on source); the window stage sees only the
    handful of aggregate rows.

    Determinism: the exponent is fixed at 1/2 so the transform is
    ``sqrt`` (correctly-rounded IEEE, identical in both engines —
    libm ``pow`` is NOT), rounded to 6 dp and summed as DECIMAL for an
    order-independent normalizer. Output: (source, n_units, raw_share,
    temp_share, rate_mult) — rate_mult > 1 ⇒ upsample.
    """
    from pyspark.sql import Window

    per = df.groupBy(source_col).agg(
        F.sum(size_col).alias("n_units")
    )
    w = Window.partitionBy()
    sq = F.round(F.sqrt(F.col("n_units").cast("double")), 6)
    shares = per.select(
        source_col,
        "n_units",
        (
            F.col("n_units").cast("double")
            / F.sum("n_units").over(w).cast("double")
        ).alias("__raw"),
        (
            sq
            / F.sum(sq.cast("decimal(27,6)")).over(w).cast("double")
        ).alias("__temp"),
    )
    return shares.select(
        source_col,
        "n_units",
        F.round("__raw", 6).alias("raw_share"),
        F.round("__temp", 6).alias("temp_share"),
        F.round(F.col("__temp") / F.col("__raw"), 6).alias("rate_mult"),
    )


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample dominant languages,
    keep all of rare ones) — the standard corpus-rebalancing move.
    Rows in strata absent from ``fractions`` get ``default_fraction``."""
    threshold = F.lit(int(default_fraction * BUCKETS))
    for value, frac in sorted(fractions.items()):
        threshold = (
            F.when(F.col(stratum_col) == value, F.lit(int(frac * BUCKETS)))
            .otherwise(threshold)
        )
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)


def curriculum_order(
    df: DataFrame,
    id_col: str,
    score_col: str,
    stages: int = 4,
    salt: str = "curr",
) -> DataFrame:
    """Curriculum staging for training: rank documents into
    ``stages`` quality tiers (ntile over score, best first) and give
    each doc a deterministic *shuffled* position inside its stage —
    easy-to-hard across stages, decorrelated within a stage (feeding
    quality-sorted data verbatim teaches the schedule, not the data).

    Two window shuffles: the global ntile (one sort — acceptable
    because the output IS a total ordering; at 100 TB swap ntile for a
    quantile-boundary broadcast like order_price_rank_scalable does)
    and the per-stage row_number keyed on the content hash, which is
    both deterministic and uniformly spread. Output: (id, stage,
    stage_pos).
    """
    from pyspark.sql import Window

    w_stage = Window.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    h = md5_long(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    staged = df.select(
        F.col(id_col),
        F.ntile(stages).over(w_stage).alias("stage"),
        h.alias("h"),
    )
    w_pos = Window.partitionBy("stage").orderBy(
        F.col("h").asc(), F.col(id_col).asc()
    )
    return staged.select(
        id_col,
        "stage",
        F.row_number().over(w_pos).alias("stage_pos"),
    )


def global_shuffle_shards(
    df: DataFrame,
    id_col: str,
    n_shards: int = 8,
    salt: str = "shuf",
) -> DataFrame:
    """Deterministic global shuffle + sharding — the last step before
    training serialization: every row gets a content-hash shard in
    [0, n_shards) and a position within its shard, so any engine (or
    rerun, or partitioning) materializes byte-identical shards, and
    downstream loaders stream shard files independently.

    The shard assignment is map-side; the only shuffle is the
    per-shard row_number window, whose key (the 60-bit content hash)
    is uniform — no skew, no global sort. At 100 TB the write is
    ``partitionBy(shard)`` and each shard sorts locally
    (sortWithinPartitions), never a total order. Output: (id, shard,
    shard_pos).
    """
    h = md5_long(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string")))
    from pyspark.sql import Window

    base = df.select(
        F.col(id_col),
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("h"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("h").asc(), F.col(id_col).asc())
    return base.select(
        id_col, "shard", F.row_number().over(w).alias("shard_pos")
    )


HASH_SPACE_D = float(1 << 60)  # md5_long's range, exact in double


def priority_sample(
    df: DataFrame,
    id_col: str,
    weight_col,
    k: int = 64,
) -> DataFrame:
    """Fixed-size weighted sample WITHOUT replacement via PRIORITY
    SAMPLING (Duffield, Lund & Thorup 2007) — the deterministic
    replacement for `rand()`-keyed weighted reservoirs: priority
    q = w / u with u = (md5(id)+1)/2^60 ∈ (0,1], keep the k largest
    priorities, and estimate each kept row's weight as
    ŵ = max(w, τ) where τ is the (k+1)-th priority. Subset-sum
    estimates over ŵ are UNBIASED for any fixed subset — the property
    that makes a tiny weighted sample answer "how many training
    tokens does slice X contribute" questions at 100 TB.

    Determinism: u is a content hash (reruns, retries, partitionings,
    and the DuckDB oracle agree row-for-row); q is ONE double division
    of deterministic operands; ranking ties break on id. Rows with
    weight ≤ 0 or NULL are excluded (they cannot be sampled and would
    poison τ).

    Plan: map-side priority, ONE TakeOrdered-style global top-(k+1)
    (limit k+1 after an orderBy — a k-heap per partition, driver
    merges), τ peeled from row k+1, broadcast back over the k kept
    rows. No shuffle of the table, no rand().

    Returns (id, weight, est_weight) for the k sampled rows (fewer if
    the table has < k positive-weight rows), est_weight = ŵ rounded
    6dp.
    """
    from pyspark.sql import Window

    w = (weight_col if not isinstance(weight_col, str) else F.col(weight_col)).cast(
        "double"
    )
    u = (md5_long(F.col(id_col).cast("string")) + F.lit(1)).cast("double") / F.lit(
        HASH_SPACE_D
    )
    scored = (
        df.select(F.col(id_col), w.alias("w"))
        .where(F.col("w") > 0)
        .select(id_col, "w", (F.col("w") / u).alias("q"))
        .orderBy(F.desc("q"), F.asc(id_col))
        .limit(k + 1)
    )
    rw = Window.orderBy(F.desc("q"), F.asc(id_col))
    ranked = scored.withColumn("rn", F.row_number().over(rw))
    # τ is absent when the table has ≤ k positive-weight rows (every
    # row sampled ⇒ ŵ = w): LEFT join on a literal key so an empty τ
    # frame degrades to NULL instead of emptying the result.
    tau = ranked.where(F.col("rn") == k + 1).select(
        F.lit(1).alias("__one"), F.col("q").alias("tau")
    )
    kept = ranked.where(F.col("rn") <= k).withColumn("__one", F.lit(1))
    return (
        kept.join(F.broadcast(tau), "__one", "left")
        .select(
            id_col,
            F.round("w", 6).alias("weight"),
            F.round(
                F.greatest(F.col("w"), F.coalesce(F.col("tau"), F.col("w"))), 6
            ).alias("est_weight"),
        )
    )


def token_budget_allocation(
    stats: DataFrame,
    key_col: str,
    tokens_col: str,
    weight_col: str,
    budget_num: int = 3,
    budget_den: int = 2,
    repeat_cap: int = 2,
    rounds: int = 3,
) -> DataFrame:
    """Token-budget allocation across sources under a repeat cap — the
    data-constrained-scaling planning step (Muennighoff et al. 2023,
    "Scaling Data-Constrained Language Models"; the C4/Pile-style
    mixture move): given per-source available tokens T_s, integer
    mixture weights w_s, a total training budget B =
    (budget_num/budget_den)·ΣT and a maximum of ``repeat_cap`` epochs
    per source, WATER-FILL the budget proportionally to the weights
    with capped sources' surplus redistributed:

        repeat: alloc_s = floor(B_rem · w_s / W_uncapped)
                cap any source where alloc_s ≥ repeat_cap·T_s

    ``rounds`` capping iterations then one final allocation pass — an
    anytime contract like the registry's other fixed-iteration
    operators (each round caps every currently-over source at once;
    |sources| rounds is exact, 3 is converged in practice).

    Exactness: all arithmetic is integer (floor-div of int64 products;
    B_rem·w_s exits int64 around 10¹⁸ token-weight mass — swap the
    longs for DECIMAL(38,0) past that, nothing else changes). Floor
    rounding leaves < |uncapped| tokens unassigned — reported in the
    ``epochs`` ratio, never silently re-added.

    Scale: the heavy input (per-source token totals) arrives
    PRE-AGGREGATED (one combinable groupBy over the corpus); this
    operator runs entirely on the |sources|-row stats relation with
    unpartitioned windows over that bounded frame.
    """
    from pyspark.sql import Window

    w_all = Window.partitionBy()
    df = stats.select(
        F.col(key_col).alias("__k"),
        F.col(tokens_col).cast("long").alias("t"),
        F.col(weight_col).cast("long").alias("w"),
    ).withColumn("cap", F.lit(repeat_cap) * F.col("t"))
    df = df.withColumn("__sum_t", F.sum("t").over(w_all)).withColumn(
        "B", F.expr(f"({budget_num} * __sum_t) div {budget_den}")
    )
    df = df.withColumn("capped0", F.lit(False))
    prev = "capped0"
    for r in range(1, rounds + 1):
        df = (
            df.withColumn(
                f"W{r}",
                F.coalesce(
                    F.sum(F.when(~F.col(prev), F.col("w"))).over(w_all),
                    F.lit(0),
                ),
            )
            .withColumn(
                f"Beff{r}",
                F.col("B")
                - F.coalesce(
                    F.sum(F.when(F.col(prev), F.col("cap"))).over(w_all),
                    F.lit(0),
                ),
            )
            .withColumn(
                f"prov{r}",
                F.expr(
                    f"CASE WHEN W{r} > 0 THEN (Beff{r} * w) div W{r} "
                    f"ELSE 0 END"
                ),
            )
            .withColumn(
                f"capped{r}",
                F.col(prev) | (F.col(f"prov{r}") >= F.col("cap")),
            )
        )
        prev = f"capped{r}"
    fr = rounds + 1
    df = (
        df.withColumn(
            f"W{fr}",
            F.coalesce(
                F.sum(F.when(~F.col(prev), F.col("w"))).over(w_all),
                F.lit(0),
            ),
        )
        .withColumn(
            f"Beff{fr}",
            F.col("B")
            - F.coalesce(
                F.sum(F.when(F.col(prev), F.col("cap"))).over(w_all),
                F.lit(0),
            ),
        )
        .withColumn(
            # The final pass CLAMPS at the cap: with fewer capping
            # rounds than the input needs, the redistributed share can
            # cross a cap that a later round would have caught — the
            # cap is a hard constraint, so the residual budget is left
            # unallocated (visible in epochs), never over-assigned.
            "alloc",
            F.when(F.col(prev), F.col("cap")).otherwise(
                F.least(
                    F.col("cap"),
                    F.expr(
                        f"CASE WHEN W{fr} > 0 THEN (Beff{fr} * w) div W{fr} "
                        f"ELSE 0 END"
                    ),
                )
            ),
        )
    )
    return df.select(
        F.col("__k").alias(key_col),
        F.col("t").alias("tokens_available"),
        F.col("w").alias("weight"),
        F.col("cap").alias("cap_tokens"),
        F.col("alloc").alias("alloc_tokens"),
        F.round(
            F.col("alloc").cast("double") / F.col("t").cast("double"), 6
        ).alias("epochs"),
        F.col(prev).alias("capped"),
    ).orderBy(key_col)
