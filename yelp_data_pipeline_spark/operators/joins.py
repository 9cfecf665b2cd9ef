"""Join operators (SURVEY.md §2.3).

The reference's joins are all equi-joins against tiny dimensions
(silver_to_gold_on_minio.py:79-84, 93, 116); strategy was left to
Catalyst. Here dims get explicit broadcast hints (AQE still demotes if
an estimate is wrong), and the semi/anti variants the reference lacks
are exposed for API completeness (SURVEY.md §2.3 last row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_broadcast_dim(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """J1/J2 — fact ⋈ small dim. Broadcast-hash join: the dim ships to
    every executor once; the fact side never shuffles."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """EXISTS semantics — returns left rows with ≥1 match, left columns
    only. Spark plans a broadcast/shuffled hash semi-join (no row
    multiplication, no payload from the right side)."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """NOT EXISTS semantics."""
    return df.join(other, on, "left_anti")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
) -> DataFrame:
    """As-of join: for every left row, attach ``value_cols`` from the
    most recent right row with ``right_ts`` ≤ ``left_ts`` on the same
    key (inclusive at equality — DuckDB ``ASOF JOIN`` semantics).
    Left rows with no earlier right row keep NULLs (left-join flavor).

    Plan: tag both sides, unionByName, then one per-key window pass
    taking the last *right-row marker struct* (ignorenulls on the
    struct, not the values) over rows sorted by (timestamp, tag) —
    right rows sort before left rows at equal timestamps, so equality
    matches. The struct wrapper means a right row whose value column
    is genuinely NULL still wins as "most recent" and attaches its
    NULL (DuckDB ASOF JOIN semantics), instead of silently falling
    back to an older non-null value. ONE shuffle + per-key sort total;
    never the key-equi-join-then-filter shape, whose row blowup is the
    product of per-key cardinalities.

    Ties among right rows on (key, ts) are resolved by sort order —
    keep (key, ts) unique on the right, or pick value_cols for which
    ties are harmless (e.g. the timestamp itself).
    """
    from pyspark.sql import Window

    # Right rows carry a NEVER-NULL struct of the value columns; left
    # rows carry NULL. last(ignorenulls) then means "most recent right
    # row", regardless of the values inside the struct.
    l = left.withColumn("__t", F.col(left_ts)).withColumn(
        "__vals",
        F.lit(None).cast(
            "struct<"
            + ",".join(f"{c}:{dict(right.dtypes)[c]}" for c in value_cols)
            + ">"
        ),
    ).withColumn("__tag", F.lit(1))
    r = right.select(
        F.col(right_on).alias(left_on),
        F.col(right_ts).alias("__t"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__vals"),
    ).withColumn("__tag", F.lit(0))
    for c in l.columns:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(l.dtypes)[c]))
    merged = l.unionByName(r.select(*l.columns))
    w = (
        Window.partitionBy(left_on)
        .orderBy("__t", "__tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = merged.withColumn(
        "__last", F.last("__vals", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__tag") == 1)
    for c in value_cols:
        out = out.withColumn(c, F.col("__last").getField(c))
    return out.drop("__t", "__tag", "__vals", "__last")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Explicit salt-replication equi-join for extreme key skew.

    AQE's skew-join split handles most skew at runtime, but it only
    splits partitions it can measure post-shuffle; a single pathological
    key that dwarfs every split threshold (the classic null-user /
    celebrity-entity key) still lands on one reducer. Salting bounds it
    by construction: the big side gets a row-local salt in [0, salts),
    the small side is replicated once per salt (explode(sequence)), and
    the join key becomes (key, salt) — the hot key's rows spread over
    ``salts`` reducers. The salt values come from
    ``monotonically_increasing_id`` so they are partition-local and
    cheap; the join RESULT is salt-invariant, so the choice affects
    distribution only.

    Cost: the small side is materialized ``salts`` times — size it like
    a broadcast decision. Supports ``inner`` and ``left`` (each left
    row carries exactly one salt, so multiplicities are preserved);
    right/full would duplicate unmatched right rows per salt and are
    rejected.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    sl = left.withColumn(
        "__salt_l",
        F.pmod(F.monotonically_increasing_id(), F.lit(salts)).cast("int"),
    )
    sr = right.withColumn(
        "__salt_r", F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    )
    joined = sl.join(
        sr,
        (sl[left_on] == sr[right_on]) & (sl["__salt_l"] == sr["__salt_r"]),
        how,
    )
    return joined.drop("__salt_l", "__salt_r")


def range_join_binned(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    tolerance_sec: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Range join — all (left, right) pairs with |left_ts − right_ts| ≤
    tolerance — WITHOUT a nested-loop plan.

    Spark has no native range-join strategy (a bare inequality
    condition plans as BroadcastNestedLoopJoin/cartesian). The binned
    rewrite makes it an equi-join: bucket both sides by
    floor(epoch / tolerance), explode the LEFT side to its bucket and
    both neighbors, equi-join on the bucket, then apply the exact
    range filter. A qualifying pair lands in exactly one (left-copy,
    right) bucket match, so no dedup pass is needed. Shuffle key is
    the bucket: candidates are bounded by per-bucket density, not n².
    """
    tol_us = tolerance_sec * 1_000_000
    lb = F.floor(F.unix_micros(F.col(left_ts)) / tol_us)
    l = left.select(
        *left_cols,
        F.col(left_ts).alias("__lt"),
        F.explode(F.array(lb - 1, lb, lb + 1)).alias("__bucket"),
    )
    r = right.select(
        *right_cols,
        F.col(right_ts).alias("__rt"),
        F.floor(F.unix_micros(F.col(right_ts)) / tol_us).alias("__bucket"),
    )
    joined = l.join(r, "__bucket")
    dt = F.unix_micros(F.col("__rt")) - F.unix_micros(F.col("__lt"))
    return (
        joined.filter(F.abs(dt) <= tol_us)
        .select(*left_cols, *right_cols, dt.alias("dt_us"))
    )


def bloom_prefilter_semi_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 1 << 17,
    k: int = 2,
) -> DataFrame:
    """Semi-join with an explicit Bloom-filter pre-filter.

    The scale problem: ``big LEFTSEMI small`` shuffles EVERY big row to
    the join even when only a sliver survives. Spark's own runtime
    row-level filtering (``spark.sql.optimizer.runtime.bloomFilter.
    enabled``) injects exactly this structure when statistics allow;
    this operator is the explicit, always-on form — useful when the
    small side's key set is too large to broadcast as a hash relation
    but its ``m_bits``-bit Bloom image fits in a single broadcast row.

    Build: each small key hashes to ``k`` bit positions via the
    Kirsch-Mitzenmacher double-hash family (one md5 per key —
    functions/hashing.py); positions fold into 64-bit words with a
    ``bit_or`` aggregate, and the words ship as ONE broadcast
    map<word_idx, word> row. Probe: pure-codegen bit tests on the big
    side BEFORE any shuffle — false positives pass, negatives (the
    bulk) never enter the exchange. A final exact ``left_semi`` join
    removes false positives, so the RESULT is identical to the plain
    semi-join: the Bloom stage affects volume only, never semantics.

    With k=2 and m=131072 bits (16 KiB), ~5k keys give a false-positive
    rate of ~(2·5k/131072)² ≈ 0.6 %; size ``m_bits`` ≈ 10–20 bits/key.
    """
    from ..functions.hashing import md5_pair

    # NULL build keys can never match an equi-join, but md5(NULL) would
    # propagate a NULL word_idx that map_from_entries rejects — drop
    # them up front (the plain left-semi this mirrors drops them too).
    small = small.where(F.col(small_key).isNotNull())

    h1, h2 = md5_pair(F.md5(F.col(small_key).cast("string")))
    positions = small.select(
        F.explode(
            F.array(*[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)])
        ).alias("pos")
    )
    words = positions.select(
        (F.col("pos") / 64).cast("int").alias("word_idx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pmod(pos, 64) AS INT))").alias("bit"),
    ).groupBy("word_idx").agg(F.bit_or("bit").alias("word"))
    bloom = words.agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))
        ).alias("__bloom")
    )

    bh1, bh2 = md5_pair(F.md5(F.col(big_key).cast("string")))
    probed = big.crossJoin(F.broadcast(bloom))
    pos_cols = []
    for i in range(k):
        probed = probed.withColumn(
            f"__pos{i}", F.pmod(bh1 + F.lit(i) * bh2, F.lit(m_bits))
        )
        pos_cols.append(f"__pos{i}")
    cond = F.lit(True)
    for i in range(k):
        word = F.element_at(
            F.col("__bloom"), (F.col(f"__pos{i}") / 64).cast("int")
        )
        bit = F.expr(
            f"shiftleft(CAST(1 AS BIGINT), CAST(pmod(__pos{i}, 64) AS INT))"
        )
        cond = cond & (F.coalesce(word, F.lit(0)).bitwiseAND(bit) != 0)
    candidates = probed.filter(cond).drop("__bloom", *pos_cols)

    keys = small.select(F.col(small_key).alias("__bk")).distinct()
    return candidates.join(
        keys, F.col(big_key) == F.col("__bk"), "left_semi"
    )


def star_join(fact: DataFrame, dims: list[tuple]) -> DataFrame:
    """Chain fact ⋈ dim1 ⋈ dim2 ⋈ ... — the dashboard's fact_review ⋈
    bridge ⋈ dim pattern (SURVEY.md §2.4 A4).

    Each dims entry is ``(dim, on)`` or ``(dim, on, broadcast)``.
    Broadcast defaults to True — right for fixed-cardinality dims
    (region, nation, dim_time) — but MUST be False for dims that scale
    with the data (e.g. customer): a forced broadcast hint bypasses
    AQE's demotion and OOMs at large SF. Un-hinted joins are left to
    Catalyst/AQE, which still picks broadcast-hash when the runtime
    size is small.
    """
    out = fact
    for entry in dims:
        dim, on, bcast = entry if len(entry) == 3 else (*entry, True)
        out = out.join(F.broadcast(dim) if bcast else dim, on)
    return out


def hot_cold_split_join(
    big: DataFrame,
    dim: DataFrame,
    big_key: str,
    dim_key: str,
    n_hot: int = 16,
) -> DataFrame:
    """Two-path skew join: route the ``n_hot`` most frequent big-side
    keys through a broadcast join and everything else through the
    normal shuffle join, then union.

    The alternative to salting when skew is concentrated in a FEW
    identifiable keys (celebrity users, null-ish defaults, bot
    traffic): salting rewrites the whole key space and multiplies the
    dim ``salt`` times, while the two-path split leaves the cold 99.9%
    untouched and moves only the hot keys' dim rows (≤ n_hot of them)
    to the map side — no shuffle partition ever receives a hot key.
    AQE's skew-join split solves overflow-sized partitions reactively;
    this is the declarative form that also documents WHICH keys are
    hot (the frequency top-k is computed in-plan via a
    TakeOrderedAndProject, never a driver collect).

    Result equals ``big ⋈ dim`` exactly: the two paths partition the
    big side by hot-key membership (semi/anti on the same top-k
    relation), and each path joins the full dim restricted to its key
    range.
    """
    freq = (
        big.groupBy(F.col(big_key).alias("__hk"))
        .agg(F.count(F.lit(1)).alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__hk").asc())
        .limit(n_hot)
        .select("__hk")
    )
    big_hot = big.join(
        F.broadcast(freq), F.col(big_key) == F.col("__hk"), "left_semi"
    )
    big_cold = big.join(
        F.broadcast(freq), F.col(big_key) == F.col("__hk"), "left_anti"
    )
    dim_hot = dim.join(
        F.broadcast(freq), F.col(dim_key) == F.col("__hk"), "left_semi"
    )
    hot = big_hot.join(F.broadcast(dim_hot), F.col(big_key) == F.col(dim_key))
    cold = big_cold.join(dim, F.col(big_key) == F.col(dim_key))
    return hot.unionByName(cold)


def bloom_prefilter_fpr_stats(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    m_bits: int = 2048,
    k: int = 2,
) -> DataFrame:
    """Measured accuracy eval for the Bloom prefilter — the sketch
    tier's rule that no sketch ships without an error report (KMV
    rel_err, CMS overcount, HLL small-range bias, histogram
    within-bucket bound) applied to bloom_prefilter_semi_join: replay
    the SAME Kirsch-Mitzenmacher position family over the distinct
    probe keys and report, in one row,

      n_pass          keys the Bloom stage lets into the shuffle
      n_false_pos     non-members among them (the wasted volume)
      n_missed_members members that failed the filter — structurally
                       ZERO (no false negatives); emitted so the
                       oracle PROVES it instead of the docstring
                       asserting it
      fpr             n_false_pos / non-member probe keys
      load_factor     k·n_build/m_bits
      fp_bound        (k·n/m)^k — the rule-of-thumb ESTIMATE the
                      sizing heuristic uses, not a hard bound (it
                      ignores position collisions among the build
                      keys, so the measured fpr can sit slightly
                      above it at high load; at fixture load 0.29 it
                      measures 0.097 vs estimate 0.085) — reported
                      so the sizing error is visible, which is the
                      point of the eval

    The default m_bits here is deliberately SMALL (2 Kibit, vs the
    production 128 Ki default) so the false-positive regime is
    actually exercised and measurable at fixture scale — the eval is
    about the error curve, not about hiding it.

    Scale: two distinct-key aggregates, a ≤ 2n-row position relation
    broadcast against the probe keys, one global fold. All flag logic
    is broadcast joins; nothing is quadratic.
    """
    from ..functions.hashing import md5_pair

    build = (
        small.where(F.col(small_key).isNotNull())
        .select(F.col(small_key).cast("long").alias("key"))
        .distinct()
    )
    h1, h2 = md5_pair(F.md5(F.col("key").cast("string")))
    bpos = (
        build.select(
            F.explode(
                F.array(
                    *[
                        F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits))
                        for i in range(k)
                    ]
                )
            ).alias("pos")
        )
        .distinct()
    )
    probe = (
        big.where(F.col(big_key).isNotNull())
        .select(F.col(big_key).cast("long").alias("key"))
        .distinct()
    )
    ph = probe.select(
        "key",
        *[
            F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)).alias(f"p{i}")
            for i in range(k)
        ],
    )
    flags = ph
    for i in range(k):
        hit = bpos.select(F.col("pos").alias(f"__hit{i}"))
        flags = flags.join(
            F.broadcast(hit),
            F.col(f"p{i}") == F.col(f"__hit{i}"),
            "left",
        ).withColumn(f"ok{i}", F.col(f"__hit{i}").isNotNull())
    passes = flags.withColumn(
        "passes",
        F.expr(" AND ".join(f"ok{i}" for i in range(k))),
    ).join(
        F.broadcast(build.select(F.col("key").alias("__mk"))),
        F.col("key") == F.col("__mk"),
        "left",
    ).withColumn("is_member", F.col("__mk").isNotNull())
    nb = build.agg(F.count(F.lit(1)).cast("long").alias("n_build_keys"))
    agg = passes.agg(
        F.count(F.lit(1)).cast("long").alias("n_probe_keys"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0))
        .cast("long")
        .alias("n_pass"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0))
        .cast("long")
        .alias("n_members"),
        F.sum(
            F.when(F.col("passes") & ~F.col("is_member"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_false_pos"),
        F.sum(
            F.when(F.col("is_member") & ~F.col("passes"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_missed_members"),
    )
    load = (
        F.lit(float(k)) * F.col("n_build_keys").cast("double")
        / F.lit(float(m_bits))
    )
    bound = load
    for _ in range(k - 1):
        bound = bound * load
    return nb.crossJoin(F.broadcast(agg)).select(
        "n_build_keys",
        "n_probe_keys",
        "n_pass",
        "n_members",
        "n_false_pos",
        "n_missed_members",
        F.round(
            F.col("n_false_pos").cast("double")
            / (F.col("n_probe_keys") - F.col("n_members")).cast("double"),
            6,
        ).alias("fpr"),
        F.round(load, 6).alias("load_factor"),
        F.round(bound, 6).alias("fp_bound"),
    )
