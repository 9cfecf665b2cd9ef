"""North-star: text analysis (lang-ID, quality, tokens, TF-IDF, BPE).

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import F, _q, _t, agg, cl, dq, md5_long_sql, sw, ts_ops, tx, win  # noqa: F401
from .similarity import _EMB_DIM  # noqa: F401

# --------------------------------------------------------------------------
# North-star: text analysis
# --------------------------------------------------------------------------


def _langid_oracle() -> str:
    langs = list(tx.LANG_STOPWORDS)
    score_cols = []
    for lang, sw in tx.LANG_STOPWORDS.items():
        inlist = ", ".join(f"'{w}'" for w in sw)
        score_cols.append(
            f"CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
            f" t -> t IN ({inlist}))) AS INT) AS s_{lang}"
        )
    cases = []
    for i, lang in enumerate(langs):
        others = langs[i + 1 :]
        if others:
            cond = " AND ".join(f"s_{lang} >= s_{o}" for o in others)
            cases.append(f"WHEN {cond} THEN '{lang}'")
        else:
            cases.append(f"ELSE '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " END"
    scores = ",\n       ".join(score_cols)
    sel = ", ".join(f"s_{lang}" for lang in langs)
    return f"""
WITH scored AS (
  SELECT doc_id,
       {scores}
  FROM documents
)
SELECT doc_id, {sel}, {case_sql} AS lang_pred FROM scored
"""


@_q(
    "lang_id_docs",
    _langid_oracle(),
    doc="Stopword-overlap language ID (deterministic CASE argmax).",
)
def q_lang_id_docs(spark, sf_dir):
    return tx.lang_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "quality_scores",
    f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS INT) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS punct_ratio,
       round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
       round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS mean_token_len,
       round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
             + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
             + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
             6) AS quality_score
FROM base
""",
    doc="Heuristic quality features + composite score (length/punct/"
    "stopword ratios).",
)
def q_quality_scores(spark, sf_dir):
    return tx.quality_features(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "adaptive_quality_survivors",
    f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS INT) AS n_stop
  FROM documents
),
scored AS (
  SELECT doc_id, source,
         round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
               + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
               6) AS quality_score
  FROM base
),
thr AS (
  SELECT source, quantile_cont(quality_score, 0.25) AS t
  FROM scored GROUP BY source
)
SELECT s.doc_id, s.source, s.quality_score
FROM scored s JOIN thr ON s.source = thr.source
WHERE s.quality_score >= thr.t
""",
    doc="Per-source adaptive quality gate (operators/textops.py:"
    "adaptive_quality_filter): keep docs at or above their OWN "
    "source's p25 composite quality — a global cutoff either guts "
    "clean sources or waves noisy ones through, since quality "
    "distributions differ per crawl/dump. Scored relation persisted "
    "(feeds threshold agg AND final join — one regex scan, not two); "
    "thresholds are one bounded row per source, broadcast back; "
    "filter map-side. Exact per-source percentile here for the "
    "oracle; percentile_approx is the 100 TB path.",
)
def q_adaptive_quality_survivors(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return tx.adaptive_quality_filter(d, "doc_id", "source", "text", p=0.25)


@_q(
    "token_stats",
    f"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{tx.BPE_ISH_PATTERN}')) AS INT) AS bpe_ish_tokens
FROM documents
""",
    doc="Token counting: whitespace + BPE-ish regex proxy, one "
    "vectorized pass.",
)
def q_token_stats(spark, sf_dir):
    return tx.token_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "tokenizer_fertility_by_source",
    f"""
WITH t AS (
  SELECT source,
         strlen(text) AS n_chars,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS ws,
         len(regexp_extract_all(lower(text), '{tx.BPE_ISH_PATTERN}')) AS bp
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(ws) AS BIGINT) AS ws_tokens,
       CAST(sum(bp) AS BIGINT) AS bpe_ish_tokens,
       round(CAST(sum(n_chars) AS DOUBLE) / CAST(sum(bp) AS DOUBLE), 6)
         AS chars_per_token,
       round(CAST(sum(bp) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6)
         AS fertility
FROM t GROUP BY source ORDER BY source
""",
    doc="Tokenizer fertility / compression audit per source — the two "
    "numbers a tokenizer review reads per corpus slice: compression "
    "(chars per subword token; low = the tokenizer fragments this "
    "source, e.g. code or non-Latin text under an English-heavy "
    "vocab) and fertility (subword tokens per whitespace word; high "
    "= words split into many pieces, inflating sequence length and "
    "training cost for the same content). Uses the BPE-ish regex "
    "proxy (alpha runs + digits + punctuation marks) as the subword "
    "stand-in over the per-doc relation — one map-side-combinable "
    "groupBy over a two-column projection, linear at any corpus "
    "size. The per-source fertility gap is the data-mixture cost "
    "adjustment (tokens-per-byte varies by source; budgeting in "
    "bytes alone misallocates).",
)
def q_tokenizer_fertility_by_source(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.length("text").alias("n_chars"),
        tx.token_count(F.col("text")).alias("ws"),
        tx.bpe_ish_count(F.col("text")).alias("bp"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("bp").cast("long").alias("bpe_ish_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            "ws_tokens",
            "bpe_ish_tokens",
            F.round(
                F.col("total_chars").cast("double")
                / F.col("bpe_ish_tokens").cast("double"),
                6,
            ).alias("chars_per_token"),
            F.round(
                F.col("bpe_ish_tokens").cast("double")
                / F.col("ws_tokens").cast("double"),
                6,
            ).alias("fertility"),
        )
        .orderBy("source")
    )


@_q(
    "winnowing_fingerprints",
    f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> array_to_string(toks[i:i+2], ' '))
         ELSE [] END AS grams
  FROM t
),
h AS (
  SELECT doc_id, list_transform(grams, s -> {md5_long_sql('s')}) AS hs FROM g
)
SELECT doc_id,
       COALESCE(array_to_string(
         CASE WHEN len(hs) >= 4 THEN
                list_sort(list_distinct(list_transform(
                  generate_series(1, len(hs) - 3), i -> list_min(hs[i:i+3]))))
              WHEN len(hs) > 0 THEN [list_min(hs)]
              ELSE [] END, ','), '') AS fingerprints
FROM h
""",
    doc="Winnowing (rolling-hash) document fingerprints — SIGMOD'03 "
    "scheme: ordered k-gram hashes, per-window minima; shared "
    "substrings ≥ w+k-1 tokens always share a fingerprint. The "
    "already-sorted list is serialized to a CSV string so the "
    "harness canonicalizer can hash the row (arrays are unhashable "
    "in its pandas sort); `tx.winnow_fingerprints` itself keeps the "
    "typed array<long> for API users.",
)
def q_winnowing_fingerprints(spark, sf_dir):
    out = tx.winnow_fingerprints(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select("doc_id", F.array_join("fingerprints", ",").alias("fingerprints"))


@_q(
    "top_words",
    """
SELECT w AS word, count(*) AS cnt
FROM (SELECT trim(unnest(string_split_regex(trim(lower(text)), '\\s+'))) AS w
      FROM documents)
WHERE w <> ''
GROUP BY w
ORDER BY cnt DESC, word
LIMIT 20
""",
    doc="Category-popularity word cloud shape (A4): explode tokens → "
    "count → top-k.",
)
def q_top_words(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        F.trim(F.lower(F.col("text"))).alias("text")
    )
    ex = cl.explode_csv(d, "text", "word", pattern=r"\s+")
    counts = agg.group_count(ex.select("word"), ["word"])
    return agg.top_k(counts, "cnt", 20, tiebreak=["word"])


@_q(
    "daily_events_gapfilled",
    """
WITH c AS (
  SELECT CAST(ts AS DATE) AS date, count(*) AS cnt FROM events GROUP BY 1
),
span AS (SELECT min(date) AS lo, max(date) AS hi FROM c),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS date
  FROM span
)
SELECT spine.date, coalesce(c.cnt, 0) AS cnt
FROM spine LEFT JOIN c ON spine.date = c.date
""",
    doc="Date-spine gap fill: days with zero events appear as 0 rows "
    "(a bare groupBy silently drops them) — spine generated "
    "distributedly from a 1-row span aggregate, no driver collect.",
)
def q_daily_events_gapfilled(spark, sf_dir):
    return ts_ops.daily_counts_gapfilled(_t(spark, sf_dir, "events"), "ts")


@_q(
    "event_value_histogram",
    """
SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
       round(floor(value / 10.0) * 10.0, 6) AS bin_lo,
       round((floor(value / 10.0) + 1) * 10.0, 6) AS bin_hi,
       count(*) AS cnt
FROM events GROUP BY 1, 2, 3
""",
    doc="Fixed-width histogram over event values: floor-keyed single "
    "shuffle, occupied bins only.",
)
def q_event_value_histogram(spark, sf_dir):
    return ts_ops.value_histogram(_t(spark, sf_dir, "events"), "value", 10.0)


@_q(
    "price_quantiles_by_priority",
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p5,
       round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
       round(quantile_cont(o_totalprice, 0.95), 6) AS p95
FROM orders GROUP BY 1
""",
    doc="Exact interpolated quantiles per group (percentile == "
    "quantile_cont, rounded 6dp); at true scale swap to "
    "percentile_approx (mergeable t-digest, no per-group sort).",
)
def q_price_quantiles_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *agg.exact_quantiles("o_totalprice", [0.25, 0.5, 0.75, 0.95])
    )


@_q(
    "order_price_percent_rank",
    """
SELECT o_orderkey,
       round(percent_rank() OVER (ORDER BY o_totalprice), 6) AS pr,
       round(cume_dist() OVER (ORDER BY o_totalprice), 6) AS cd
FROM orders
""",
    doc="Global percent_rank / cume_dist — rank values are "
    "tie-invariant (equal prices share a value), so the output is "
    "deterministic without a unique-key tiebreak. An unpartitioned "
    "window funnels through ONE reducer: this query is the exactness "
    "baseline; `order_price_rank_scalable` computes the identical "
    "numbers with the distributed count-below algorithm "
    "(windows.scalable_ranks) and is the 100 TB path.",
)
def q_order_price_percent_rank(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.orderBy("o_totalprice")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@_q(
    "order_price_rank_scalable",
    """
SELECT o_orderkey, o_totalprice,
       round(percent_rank() OVER (ORDER BY o_totalprice), 6) AS pr,
       round(cume_dist() OVER (ORDER BY o_totalprice), 6) AS cd,
       CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
FROM orders
""",
    doc="Scale path for global ranking: exact percent_rank / cume_dist "
    "/ ntile WITHOUT an unpartitioned window (the oracle uses one — "
    "DuckDB is the sequential yardstick). Distributed count-below: "
    "per-value hash agg → repartitionByRange over distinct values → "
    "per-range-partition cumulative (window PARTITIONED by pid) → "
    "bounded per-partition offset collect → broadcast join back. "
    "Every WindowExec in the plan is partitioned.",
)
def q_order_price_rank_scalable(spark, sf_dir):
    return win.scalable_ranks(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderkey", n_tiles=4
    )


@_q(
    "dq_orders_summary",
    """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') OR o_orderstatus IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
       CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
       CAST(sum(CASE WHEN o_orderdate < DATE '1990-01-01'
                       OR o_orderdate > DATE '2000-01-01'
                       OR o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS date_out_of_range
FROM orders
""",
    doc="Declarative data-quality audit: every expectation a "
    "conditional count in ONE scan/one 1-row aggregate; scan pruned "
    "to the checked columns. NULL check results count as violations.",
)
def q_dq_orders_summary(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return dq.dq_summary(
        o,
        {
            "null_custkey": F.col("o_custkey").isNull(),
            "bad_status": ~F.col("o_orderstatus").isin("F", "O", "P"),
            "nonpositive_price": F.col("o_totalprice") <= 0,
            "date_out_of_range": (F.col("o_orderdate") < F.lit("1990-01-01").cast("date"))
            | (F.col("o_orderdate") > F.lit("2000-01-01").cast("date")),
        },
    )


_STATUSES = ["F", "O", "P"]

_PIVOT_WIDE_CTE = """wide AS (
  SELECT o_orderpriority,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p
  FROM orders GROUP BY 1
)"""


@_q(
    "orders_status_pivot",
    f"""
WITH {_PIVOT_WIDE_CTE}
SELECT o_orderpriority, cnt_f, cnt_o, cnt_p FROM wide
""",
    doc="Pivot: priority × status count matrix. Values list passed "
    "explicitly — implicit pivot runs a distinct-collect discovery "
    "scan before the real plan (a full extra pass at 100 TB).",
)
def q_orders_status_pivot(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    return agg.pivot_counts(o, "o_orderpriority", "o_orderstatus", _STATUSES)


@_q(
    "orders_status_unpivot",
    f"""
WITH {_PIVOT_WIDE_CTE}
SELECT o_orderpriority, 'F' AS status, cnt_f AS cnt FROM wide
UNION ALL SELECT o_orderpriority, 'O', cnt_o FROM wide
UNION ALL SELECT o_orderpriority, 'P', cnt_p FROM wide
""",
    doc="Unpivot/melt: the wide matrix back to long (priority, status, "
    "cnt) — round-trips pivot_counts through DataFrame.unpivot.",
)
def q_orders_status_unpivot(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    wide = agg.pivot_counts(o, "o_orderpriority", "o_orderstatus", _STATUSES)
    return agg.unpivot_counts(wide, "o_orderpriority", _STATUSES)


@_q(
    "embedding_centroids",
    f"""
SELECT label AS cell, CAST(i - 1 AS INT) AS pos,
       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
FROM embeddings, (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
GROUP BY 1, 2
""",
    doc="Per-label mean vectors (the IVF/k-means trainer output, "
    "flattened to (cell, pos, component)): posexplode → one shuffle of "
    "n·dim scalars → 6dp-rounded means reproducible across engines.",
)
def q_embedding_centroids(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    pos = emb.select(
        F.col("label").alias("cell"), F.posexplode("embedding").alias("pos", "x")
    )
    return pos.groupBy("cell", "pos").agg(
        F.round(F.avg(F.col("x").cast("double")), 6).alias("m")
    )


