"""SURVEY §2.4 — aggregation suite.

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import F, _q, _t, agg, dd, joins, md5_long_sql, smp, tx, up  # noqa: F401

# --------------------------------------------------------------------------
# §2.4 — aggregation suite
# --------------------------------------------------------------------------


@_q(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape — bench headline. Partial (map-side) aggregation "
    "+ one shuffle on the 2-column group key; decimal-exact sums.",
)
def q_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-01")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        agg.exact_sum("l_quantity", "sum_qty"),
        agg.exact_sum("l_extendedprice", "sum_base_price"),
        agg.exact_sum(disc_price, "sum_disc_price"),
        agg.exact_avg("l_quantity", "avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_q(
    "nation_market_share_by_year",
    """
SELECT o_year,
       round(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                          AS DECIMAL(27,4))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(27,4))) AS DOUBLE), 6) AS mkt_share,
       CAST(SUM(CAST(volume AS DECIMAL(27,4))) AS DOUBLE) AS total_volume
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
    doc="TPC-H Q8 shape — national market share: the 8-table star "
    "(part/supplier/lineitem/orders/customer/nation×2/region) with a "
    "conditional-share aggregate (one nation's volume over all "
    "nations' volume per year). Every dimension broadcasts; the "
    "part-type and region filters prune fact rows during their "
    "joins; both sums accumulate in DECIMAL and the share is ONE "
    "double division of the exact operands (deterministic "
    "cross-engine, no float accumulation).",
)
def q_nation_market_share_by_year(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    ).select("r_regionkey")
    j = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = j.select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        vol.alias("volume"),
        "nation",
    )
    tgt = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(tgt.cast(agg.DECIMAL)).cast("double")
            / F.sum(F.col("volume").cast(agg.DECIMAL)).cast("double"),
            6,
        ).alias("mkt_share"),
        agg.exact_sum("volume", "total_volume"),
    )


@_q(
    "avg_balance_by_segment",
    """
SELECT c_mktsegment,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) / count(c_acctbal) AS avg_bal,
       count(*) AS cnt
FROM customer GROUP BY c_mktsegment
""",
    doc="A4 — groupBy average (decimal-exact) + count.",
)
def q_avg_balance_by_segment(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        agg.exact_avg("c_acctbal", "avg_bal"), F.count(F.lit(1)).alias("cnt")
    )


@_q(
    "count_distinct_users",
    """
SELECT count(DISTINCT user_id) AS distinct_users,
       count(*) AS total_events
FROM events
""",
    doc="Distinct aggregate (SURVEY §2.4): exact COUNT(DISTINCT) — "
    "two-phase partial dedup then merge under AQE.",
)
def q_count_distinct_users(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("total_events"),
    )


@_q(
    "priority_status_cube",
    """
SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
    doc="Cube (SURVEY §2.4 'built-in if needed'): all 2^k grouping "
    "sets in one pass. Empty-input () grand-total row restored via "
    "the self-gated fallback union (aggregates.empty_grand_total) — "
    "ReusedExchange keeps the nonempty plan single-scan.",
)
def q_priority_status_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cube = o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"), agg.exact_sum("o_totalprice", "sum_price")
    )
    return agg.empty_grand_total(cube, o, {"cnt": F.lit(0)})


@_q(
    "scd2_order_status_history",
    """
WITH flags AS (
  SELECT o_custkey, o_orderdate, o_orderstatus, o_orderkey,
         CASE WHEN lag(1) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) IS NULL
                OR o_orderstatus IS DISTINCT FROM
                   lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey)
              THEN 1 ELSE 0 END AS chg
  FROM orders
),
runs AS (
  SELECT o_custkey, o_orderdate, o_orderstatus,
         CAST(SUM(chg) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING) AS INT) AS version_seq
  FROM flags
),
versions AS (
  SELECT o_custkey, version_seq,
         min(o_orderdate) AS valid_from,
         min(o_orderstatus) AS o_orderstatus
  FROM runs GROUP BY 1, 2
)
SELECT o_custkey, version_seq, valid_from, o_orderstatus,
       lead(valid_from) OVER (PARTITION BY o_custkey
                              ORDER BY version_seq) AS valid_to,
       lead(valid_from) OVER (PARTITION BY o_custkey
                              ORDER BY version_seq) IS NULL AS is_current
FROM versions
""",
    doc="SCD type-2 version history (the warehouse pattern the "
    "reference's latest-row MERGE discards): NULL-safe lag-compare "
    "flags → running-sum version ids → per-version validity intervals "
    "via lead(). version_seq (not valid_from) orders the intervals so "
    "same-day status flips stay deterministic.",
)
def q_scd2_order_status_history(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderstatus", "o_orderkey"
    )
    return up.scd2_versions(
        o,
        ["o_custkey"],
        "o_orderdate",
        ["o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    ).select(
        "o_custkey", "version_seq", "valid_from", "o_orderstatus",
        "valid_to", "is_current",
    )


@_q(
    "fuzzy_dup_pairs",
    """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, text,
         CASE WHEN len(toks) >= 3 THEN
           list_sort(list_distinct(list_transform(
             generate_series(1, len(toks) - 2),
             i -> array_to_string(toks[i:i+2], ' '))))
         ELSE [] END AS sorted_shingles
  FROM t
),
ex AS (
  SELECT doc_id, text, unnest(sorted_shingles[1:2]) AS s FROM sh
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.text AS ta, b.text AS tb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(levenshtein(ta, tb) AS INT) AS distance
FROM cand WHERE levenshtein(ta, tb) <= 8
""",
    doc="Fuzzy-duplicate pairs by EXACT edit distance with min-shingle "
    "blocking: docs sharing either of their two lexicographically "
    "smallest word shingles become candidates (min-wise sampling, no "
    "extra hashing), then JVM-codegen levenshtein verifies ≤ 8 — the "
    "O(len²) compare never runs all-pairs.",
)
def q_fuzzy_dup_pairs(spark, sf_dir):
    return dd.edit_distance_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        max_distance=8, n=3, band_shingles=2,
    )


@_q(
    "bigram_logprob_scores",
    """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
big AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> array_to_string(t[i:i+1], ' '))) AS bg
  FROM base WHERE len(t) >= 2
),
bw AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM big),
c12 AS (SELECT bg, count(*) AS c12 FROM bw GROUP BY bg),
c1 AS (SELECT w1, count(*) AS c1 FROM bw GROUP BY w1)
SELECT doc_id, count(*) AS n_bigrams,
       round(CAST(SUM(CAST(round(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)), 6)
                           AS DECIMAL(27,6))) AS DOUBLE) / count(*), 6) AS mean_logprob
FROM bw JOIN c12 USING (bg) JOIN c1 USING (w1)
GROUP BY doc_id
""",
    doc="Perplexity-style fluency scoring: mean bigram log-probability "
    "under the corpus's own bigram model (CCNet-style quality signal). "
    "Each libm log term is rounded to 6dp then DECIMAL-summed so the "
    "mean replays identically on a sequential engine.",
)
def q_bigram_logprob_scores(spark, sf_dir):
    return tx.bigram_logprob_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )


_WQ_KEY_SQL = md5_long_sql("concat_ws('|', 'wq', CAST(doc_id AS VARCHAR))")
_MIX_KEY_SQL = md5_long_sql("concat_ws('|', 'mix', CAST(d.doc_id AS VARCHAR))")


@_q(
    "weighted_quality_sample",
    f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS INT) AS n_stop
  FROM documents
),
q AS (
  SELECT doc_id,
         round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
               + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
               6) AS quality_score
  FROM base
)
SELECT doc_id, quality_score FROM q
WHERE {_WQ_KEY_SQL} % 10000 < floor(quality_score * 10000)
""",
    doc="Quality-weighted sampling: per-row keep probability = the "
    "composite quality score (soft filter — great docs always survive, "
    "mediocre ones proportionally), decided by content hash so the "
    "kept set is identical on every rerun, engine, and partitioning.",
)
def q_weighted_quality_sample(spark, sf_dir):
    q = tx.quality_features(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    ).select("doc_id", "quality_score")
    return smp.weighted_hash_sample(q, "doc_id", "quality_score", salt="wq")


@_q(
    "mixture_resampled_docs",
    f"""
WITH tgt(source, w) AS (
  VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)
),
obs AS (
  SELECT source, count(*) AS c
  FROM documents WHERE source IN ('src0', 'src1', 'src2')
  GROUP BY source
),
-- LEFT JOIN from the target list: a targeted source with ZERO corpus
-- rows contributes count 0, driving T to 0 and the result to empty —
-- the operator's strict-mixture contract (sampling.py), not a silent
-- renormalization over whichever sources happen to exist.
cnt AS (
  SELECT t.source, coalesce(o.c, 0) AS c, t.w
  FROM tgt t LEFT JOIN obs o ON t.source = o.source
),
t AS (SELECT min(c / w) AS t FROM cnt),
rates AS (
  SELECT source,
         CASE WHEN c > 0
              THEN CAST(floor(w * t.t / c * 10000) AS BIGINT)
              ELSE 0 END AS thresh
  FROM cnt, t
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON d.source = r.source
WHERE {_MIX_KEY_SQL} % 10000 < r.thresh
""",
    doc="Data mixing: downsample sources so the surviving corpus "
    "matches target proportions (50/30/20 here). The scarcest source "
    "relative to its share is kept whole (T = min count/weight), the "
    "rest hash-downsample to weight·T/count — all computed in-plan "
    "(per-source counts broadcast back, 1-row min for T, no driver "
    "round-trip), deterministic via IEEE division + floor bucketing.",
)
def q_mixture_resampled_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    out = smp.resample_to_mixture(
        d, "doc_id", "source",
        {"src0": 0.5, "src1": 0.3, "src2": 0.2}, salt="mix",
    )
    return out.select("doc_id", "source")


# Shared quality-score SQL fragment (must stay in sync with
# textops.quality_score_col — the 6dp-before-combine rounding contract).
_QSCORE_CTE = f"""qbase AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS INT) AS n_stop
  FROM documents
),
qscore AS (
  SELECT doc_id,
         round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
               + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
               6) AS quality_score
  FROM qbase
)"""


@_q(
    "dedup_keep_best_docs",
    f"""
WITH {_QSCORE_CTE},
g AS (
  SELECT d.doc_id,
         md5(trim(regexp_replace(lower(d.text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
         q.quality_score
  FROM documents d JOIN qscore q ON d.doc_id = q.doc_id
)
SELECT fingerprint, doc_id, quality_score, group_size FROM (
  SELECT fingerprint, doc_id, quality_score,
         count(*) OVER (PARTITION BY fingerprint) AS group_size,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY quality_score DESC, doc_id ASC) AS rn
  FROM g
) WHERE rn = 1
""",
    doc="Quality-keeping exact dedup: one survivor per normalized-text "
    "fingerprint group — the best-scoring copy, not an arbitrary "
    "minimal id. Spark side is a single map-side-combinable struct-"
    "argmax groupBy (no window shuffle of the full corpus); the "
    "row_number oracle realizes the same (max score, min id) order.",
)
def q_dedup_keep_best_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.md5(dd.normalize_text(F.col("text"))).alias("fingerprint"),
        tx.quality_score_col(F.col("text")).alias("quality_score"),
    )
    return dd.dedup_keep_best(
        scored, "fingerprint", "quality_score", "doc_id"
    )


@_q(
    "temperature_mixture_weights",
    """
WITH per AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_units
  FROM documents GROUP BY source
),
s AS (
  SELECT source, n_units,
         CAST(n_units AS DOUBLE) / CAST(SUM(n_units) OVER () AS DOUBLE) AS raw,
         round(sqrt(CAST(n_units AS DOUBLE)), 6) AS sq
  FROM per
),
s2 AS (
  SELECT source, n_units, raw,
         sq / CAST(SUM(CAST(sq AS DECIMAL(27,6))) OVER () AS DOUBLE) AS temp
  FROM s
)
SELECT source, n_units,
       round(raw, 6) AS raw_share,
       round(temp, 6) AS temp_share,
       round(temp / raw, 6) AS rate_mult
FROM s2
""",
    doc="Temperature-scaled (T=2) mixture weights per source over "
    "corpus sizes — the multilingual rebalancing rule (upsample rare "
    "sources). sqrt is correctly-rounded IEEE (unlike pow), rounded "
    "6dp and DECIMAL-summed for an order-independent normalizer.",
)
def q_temperature_mixture_weights(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return smp.temperature_weights(d, "source", F.col("n_chars"))


_BM25_TERMS = ("spark", "vector", "merge", "window")


@_q(
    "bm25_doc_scores",
    f"""
WITH dl AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(27,4))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
idf AS (
  SELECT term,
         round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS idf,
         avgdl
  FROM dfreq, stats
),
part AS (
  SELECT doc_id,
         round(idf * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
               6) AS s
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
)
SELECT doc_id, CAST(count(*) AS INT) AS n_terms_hit,
       round(CAST(SUM(CAST(s AS DECIMAL(20,6))) AS DOUBLE), 6) AS bm25
FROM part GROUP BY doc_id
""",
    doc="Okapi BM25 of every document against a fixed query-term set "
    "(k1=1.2, b=0.75) — retrieval scoring for corpus search / RAG "
    "curation. Token filter lands before the shuffle; corpus stats "
    "broadcast; idf rounded 6dp before the product (libm ln is the "
    "one non-correctly-rounded term); DECIMAL per-doc sum.",
)
def q_bm25_doc_scores(spark, sf_dir):
    return tx.bm25_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text", _BM25_TERMS
    )


@_q(
    "price_quantity_corr",
    """
WITH m AS (
  SELECT count(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(27,4))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS sy,
         SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS sxy,
         SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS sxx,
         SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS syy
  FROM lineitem
)
SELECT round(
  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
FROM m
""",
    doc="Pearson correlation from EXACT decimal moments (n, Σx, Σy, "
    "Σxy, Σx², Σy²) — never F.corr/corr(), whose float accumulation "
    "is partition-order-dependent; the moment sums are orderless "
    "decimals, so one map-side-combined pass replays identically on "
    "any engine or partitioning.",
)
def q_price_quantity_corr(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    m = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(27,4)")).alias("sx"),
        F.sum(y.cast("decimal(27,4)")).alias("sy"),
        F.sum((x * y).cast("decimal(38,8)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,8)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,8)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    # NULL when either column has zero variance (e.g. a single row) —
    # SQL 0/0 semantics, never an ANSI crash.
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    return m.select(
        F.when(
            (denx > 0) & (deny > 0),
            F.round(
                (n * sxy - sx * sy) / (F.sqrt(denx) * F.sqrt(deny)), 6
            ),
        ).alias("corr")
    )


@_q(
    "scaled_prices_by_priority",
    """
WITH b AS (
  SELECT o_orderpriority,
         min(o_totalprice) AS lo, max(o_totalprice) AS hi
  FROM orders GROUP BY 1
)
SELECT o_orderkey, o_orderpriority,
       round(CASE WHEN hi = lo THEN 0.0
                  ELSE (o_totalprice - lo) / (hi - lo) END, 6) AS scaled
FROM orders JOIN b USING (o_orderpriority)
""",
    doc="Group-wise min-max feature scaling: per-group bounds from one "
    "hash aggregate broadcast back onto the fact rows (never a global "
    "window). Constant groups scale to 0 instead of dividing by zero. "
    "The min/max + subtract/divide are exact IEEE ops, so no decimal "
    "detour is needed for cross-engine equality.",
)
def q_scaled_prices_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    b = o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    j = o.join(F.broadcast(b), "o_orderpriority")
    scaled = F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
        (F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    return j.select(
        "o_orderkey", "o_orderpriority", F.round(scaled, 6).alias("scaled")
    )


def _approx_event_stats_oracle() -> str:
    from ..operators.aggregates import hll_oracle_sql

    sample_pred = (
        "CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) "
        "AS BIGINT) % 10 = 0"
    )
    return f"""
WITH sk AS MATERIALIZED ({hll_oracle_sql("events", "user_id", m=64)}),
q AS (
  SELECT count(*) AS sample_n,
         round(quantile_cont(value, 0.5), 6) AS value_p50,
         round(quantile_cont(value, 0.95), 6) AS value_p95,
         round(quantile_cont(value, 0.99), 6) AS value_p99
  FROM events
  WHERE {sample_pred}
)
SELECT sk.*, q.* FROM sk, q
"""


@_q(
    "approx_event_stats",
    _approx_event_stats_oracle(),
    doc="The approximate tier a 100 TB deployment actually uses, in "
    "DETERMINISTIC form so the driver can verify it (the engine-native "
    "approx_count_distinct/percentile_approx sketches are "
    "engine-private — rows-only checkable, never driver-green; this "
    "was the registry's one structurally unverifiable row through r6): "
    "(1) md5-register HyperLogLog distinct users "
    "(operators/aggregates.py:hll_distinct, Flajolet 2007) — register "
    "max-fold is fully map-side combinable, harmonic sum assembled "
    "from an EXACT DECIMAL integer so the estimate is bit-identical "
    "across engines/partitionings/retries; registers_hit + rho_sum "
    "pin the full register state. (2) Exact p50/p95/p99 over a "
    "DETERMINISTIC 10% md5-hash sample of `value` — the hash-sample "
    "quantile pattern (sample is reproducible, unlike Bernoulli "
    "rand()), one sorted-agg over ~10% of rows. Both halves are "
    "1-row aggregates crossed via broadcast.",
)
def q_approx_event_stats(spark, sf_dir):
    from ..functions.hashing import md5_long
    from ..operators import aggregates as agg_ops

    e = _t(spark, sf_dir, "events")
    sk = agg_ops.hll_distinct(e, "user_id", m=64)
    sample = e.where(md5_long(F.col("event_id").cast("string")) % 10 == 0)
    q = sample.agg(
        F.count(F.lit(1)).alias("sample_n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("value_p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("value_p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("value_p99"),
    )
    return sk.crossJoin(F.broadcast(q))


@_q(
    "salted_segment_event_counts",
    """
SELECT c_mktsegment, count(*) AS n_events
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
    doc="Skew-proof JOIN via explicit salting (the join twin of "
    "salted_event_type_counts' agg salting): big side salted per row, "
    "small side replicated per salt, equi-join on (key, salt) — a "
    "pathological hot key spreads over `salts` reducers even when it "
    "defeats AQE's post-shuffle split thresholds. Result is "
    "salt-invariant, so the oracle is the plain join.",
)
def q_salted_segment_event_counts(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("user_id")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = joins.salted_join(e, c, "user_id", "c_custkey", salts=8)
    return j.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_events"))


@_q(
    "priority_status_grouping_sets",
    """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       count(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus))
""",
    doc="Arbitrary GROUPING SETS (beyond cube/rollup's fixed lattices): "
    "the three user-chosen sets in ONE pass via Expand, with GROUPING() "
    "flags disambiguating a rolled-up NULL from a genuine NULL key.",
)
def q_priority_status_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"],
         ["o_orderstatus"]],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("cnt"),
        agg.exact_sum("o_totalprice", "sum_price"),
    )


@_q(
    "asof_latest_order",
    """
SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS last_order_date
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    doc="As-of join (custom operator — Spark lacks one): most recent "
    "order at or before each event, via tag+union+per-key window "
    "last(ignorenulls) — one shuffle, no key-equi-then-filter blowup. "
    "Oracle is DuckDB's native ASOF JOIN.",
)
def q_asof_latest_order(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").alias("last_order_date")
    )
    joined = joins.asof_join(
        e, o, "user_id", "o_custkey", "ts", "last_order_date", ["last_order_date"]
    )
    return joined.select("event_id", "user_id", "ts", "last_order_date")


@_q(
    "salted_event_type_counts",
    """
SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
""",
    doc="Skew-safe two-stage aggregation: (key, salt) partial counts → "
    "per-key sum. Salt-invariant result; the pattern that keeps one "
    "hot key from pinning a single reducer (AQE splits skewed JOINS, "
    "not aggregations).",
)
def q_salted_event_type_counts(spark, sf_dir):
    return agg.salted_group_count(
        _t(spark, sf_dir, "events"), ["event_type"], salt_buckets=16
    )


@_q(
    "event_pairs_within_5s",
    """
SELECT a.event_id AS id_a, b.event_id AS id_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
FROM events a JOIN events b
  ON b.ts >= a.ts - INTERVAL 5 SECOND
 AND b.ts <= a.ts + INTERVAL 5 SECOND
 AND a.event_id < b.event_id
""",
    doc="Range join (custom operator — Spark plans bare inequality "
    "joins as nested loops): event pairs within ±5s via bucket-binned "
    "equi-join + exact filter; each pair matches exactly once, no "
    "dedup pass.",
)
def q_event_pairs_within_5s(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    a = e.select(F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = e.select(F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"))
    return joins.range_join_binned(a, b, "ts_a", "ts_b", 5, ["id_a"], ["id_b"]).filter(
        F.col("id_a") < F.col("id_b")
    )


@_q(
    "median_price_by_priority",
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       count(*) AS cnt
FROM orders GROUP BY o_orderpriority
""",
    doc="Exact median (linear-interpolated) per group — Spark "
    "percentile vs DuckDB quantile_cont, rounded to 6dp.",
)
def q_median_price_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.count(F.lit(1)).alias("cnt"),
    )


@_q(
    "priority_status_rollup",
    """
SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
    doc="Rollup (SURVEY §2.4 'built-in if needed'): hierarchical "
    "subtotals in one pass. Empty-input () grand-total row restored "
    "via the self-gated fallback union (aggregates.empty_grand_total).",
)
def q_priority_status_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    rolled = o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"), agg.exact_sum("o_totalprice", "sum_price")
    )
    return agg.empty_grand_total(rolled, o, {"cnt": F.lit(0)})


