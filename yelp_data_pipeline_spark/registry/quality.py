"""Pretraining-corpus quality gates + corpus-level sentence dedup.

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import F, _q, _t, agg, cosine_sql, dd, sim, smp, tx  # noqa: F401
from .similarity import _EMB_DIM  # noqa: F401

# --------------------------------------------------------------------------
# Round 5: pretraining-corpus quality gates + corpus-level sentence dedup
# --------------------------------------------------------------------------

_EN_STOPS_SQL = ", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS["en"])


@_q(
    "gopher_quality_flags",
    f"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS toks,
         string_split(text, chr(10)) AS lines,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(regexp_extract_all(text, '#')) AS INT)
           + CAST(len(regexp_extract_all(text, '(\\.\\.\\.|…)')) AS INT) AS n_sym
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_tokens,
         round(CAST(n_chars - (len(toks) - 1) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
         round(CAST(n_sym AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
         round(CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
               / CAST(len(lines) AS DOUBLE), 6) AS bullet_ratio,
         round(CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS DOUBLE)
               / CAST(len(lines) AS DOUBLE), 6) AS ellipsis_ratio,
         round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 6) AS alpha_word_ratio,
         CAST(len(list_filter(toks, t -> t IN ({_EN_STOPS_SQL}))) AS INT) AS stop_hits
  FROM base
)
SELECT *,
       (n_tokens BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3.0 AND 10.0
        AND symbol_ratio <= 0.1
        AND bullet_ratio <= 0.9
        AND ellipsis_ratio <= 0.3
        AND alpha_word_ratio >= 0.8
        AND stop_hits >= 2) AS passes_gopher
FROM m
""",
    doc="Gopher rule filters (word count, mean word length, symbol/"
    "bullet/ellipsis ratios, alpha-word fraction, stopword floor) as "
    "one map-only boolean gate — the cheapest pretraining pre-filter, "
    "zero shuffle at any scale.",
)
def q_gopher_quality_flags(spark, sf_dir):
    return tx.gopher_quality_flags(_t(spark, sf_dir, "documents"))


@_q(
    "script_char_ratios",
    """
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS INT) AS a,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS d,
         CAST(len(regexp_extract_all(text, '\\s')) AS INT) AS s,
         CAST(len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS INT) AS na
  FROM documents
)
SELECT doc_id, n AS n_chars,
       CASE WHEN n > 0 THEN round(CAST(a AS DOUBLE) / n, 6) END AS alpha_ratio,
       CASE WHEN n > 0 THEN round(CAST(d AS DOUBLE) / n, 6) END AS digit_ratio,
       CASE WHEN n > 0 THEN round(CAST(s AS DOUBLE) / n, 6) END AS space_ratio,
       CASE WHEN n > 0 THEN round(CAST(n - a - d - s AS DOUBLE) / n, 6) END AS other_ratio,
       CASE WHEN n > 0 THEN round(CAST(na AS DOUBLE) / n, 6) END AS non_ascii_ratio
FROM base
""",
    doc="Character-class composition (alpha/digit/space/other + "
    "non-ASCII fractions): the cheap script and mojibake gate, four "
    "vectorized regexp passes, map-only.",
)
def q_script_char_ratios(spark, sf_dir):
    return tx.script_char_ratios(_t(spark, sf_dir, "documents"))


@_q(
    "duplicate_sentence_stats",
    r"""
WITH punct AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\S+ ){7}\S+) ', '\1. ', 'g') AS text
  FROM documents
),
ex AS (
  SELECT doc_id AS doc,
         unnest(string_split_regex(text, '[.!?]\s+')) AS s
  FROM punct
),
kept AS (
  SELECT doc, regexp_replace(trim(lower(s)), '\s+', ' ', 'g') AS sent
  FROM ex
  WHERE length(regexp_replace(trim(lower(s)), '\s+', ' ', 'g')) >= 20
)
SELECT md5(sent) AS sentence_hash,
       count(DISTINCT doc) AS n_docs,
       count(*) AS n_total,
       min(sent) AS sentence
FROM kept
GROUP BY 1
HAVING count(DISTINCT doc) >= 2
""",
    doc="C4-style corpus-level duplicate-sentence list: explode "
    "sentences map-side, one shuffle keyed on the md5 of the "
    "normalized sentence (maximally spread — never needs salting), "
    "map-side partial aggregation; the output is the anti-join "
    "removal list for boilerplate stripping. The fixture's documents "
    "carry no sentence punctuation (the query returned 0 rows through "
    "round 5 — structurally degenerate), so a deterministic "
    "segmentation inserts a period every 8 words first, mirrored in "
    "both engines; near-dup docs then share exact sentences (135 at "
    "sf0.01).",
)
def q_duplicate_sentence_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    punct = d.withColumn(
        "text",
        F.regexp_replace("text", r"((?:\S+ ){7}\S+) ", "$1. "),
    )
    return tx.duplicate_sentence_stats(punct)


@_q(
    "duplicate_span_stats",
    """
WITH toks AS (
  SELECT doc_id AS doc, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
spans AS (
  SELECT doc,
         unnest(list_transform(generate_series(1, len(t) // 10),
                               i -> array_to_string(t[(i-1)*10+1:i*10], ' '))) AS span
  FROM toks
)
SELECT md5(span) AS span_hash,
       count(DISTINCT doc) AS n_docs,
       count(*) AS n_total,
       min(span) AS span
FROM spans
GROUP BY 1
HAVING count(DISTINCT doc) >= 2
""",
    doc="Fixed-window approximation of suffix-array substring dedup "
    "(Lee et al. 2021): tile docs into non-overlapping 10-token "
    "spans map-side, one md5-keyed shuffle, report spans shared by "
    ">=2 documents — catches boilerplate that has no sentence "
    "punctuation.",
)
def q_duplicate_span_stats(spark, sf_dir):
    return tx.duplicate_span_stats(_t(spark, sf_dir, "documents"))


@_q(
    "normalized_embeddings",
    """
WITH base AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT vec_id,
       CASE WHEN nrm > 0 THEN round(nrm, 6) END AS norm,
       CASE WHEN nrm > 0 THEN
         array_to_string(
           list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) / nrm * 100000) AS INT)),
           ',')
       END AS unit_q5
FROM base
""",
    doc="L2 unit-normalization (the prep every cosine index wants; "
    "after it cosine = dot). Map-only, zero shuffle; unit vector "
    "emitted as fixed-point int CSV per the cross-engine float-"
    "formatting convention.",
)
def q_normalized_embeddings(spark, sf_dir):
    return sim.l2_normalize_embeddings(_t(spark, sf_dir, "embeddings"))


@_q(
    "ann_recall_eval",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
cent AS (
  SELECT label AS cell, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
  GROUP BY 1, 2
),
cvec AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM cent GROUP BY cell
),
route AS (
  SELECT qid, qv, cell FROM (
    SELECT q.qid, q.qv, c.cell,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({cosine_sql('c.centroid', 'q.qv', _EMB_DIM)}, 6) DESC,
                      c.cell ASC) AS rn
    FROM q, cvec c
  ) WHERE rn <= 1
),
ivf AS (
  SELECT qid, vec_id FROM (
    SELECT r.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY r.qid
             ORDER BY round({cosine_sql('e.embedding', 'r.qv', _EMB_DIM)}, 6) DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e JOIN route r ON e.label = r.cell
  ) WHERE rn <= 10
),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({cosine_sql('e.embedding', 'q.qv', _EMB_DIM)}, 6) DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e, q
  ) WHERE rn <= 10
),
h AS (
  SELECT b.qid, count(*) AS n
  FROM brute b JOIN ivf i ON b.qid = i.qid AND b.vec_id = i.vec_id
  GROUP BY 1
)
SELECT q.qid,
       CAST(coalesce(h.n, 0) AS INT) AS n_hits,
       round(CAST(coalesce(h.n, 0) AS DOUBLE) / 10, 6) AS recall_at_10
FROM q LEFT JOIN h ON q.qid = h.qid
""",
    doc="Recall@10 of IVF (label centroids, nprobe=1) vs exact brute "
    "force, per query — the eval that sizes nprobe/ncells before an "
    "approximate index is trusted. Both arms are one corpus scan; "
    "ties break on (rounded score, id) so the top-k set is "
    "deterministic cross-engine.",
)
def q_ann_recall_eval(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.withColumnRenamed("label", "cell")
    cents = sim.train_centroids_by_label(emb)
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return sim.ann_recall_eval(corpus, cents, qs, k=10, nprobe=1)


def _ivf_nprobe_curve_sql(nps=(1, 2, 4), k: int = 10) -> str:
    arms = []
    for np_ in nps:
        arms.append(
            f"""ivf{np_} AS (
  SELECT CAST({np_} AS INT) AS nprobe, qid, vec_id FROM (
    SELECT r.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY r.qid
             ORDER BY round({cosine_sql('e.embedding', 'r.qv', _EMB_DIM)}, 6)
                        DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e
    JOIN (SELECT qid, qv, cell FROM rt WHERE rn <= {np_}) r
      ON e.label = r.cell
  ) WHERE rn <= {k}
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM ivf{np_}" for np_ in nps)
    return ",\n".join(arms) + f",\nivf AS ({union})"


@_q(
    "ivf_nprobe_recall_curve",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
cent AS (
  SELECT label AS cell, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
  GROUP BY 1, 2
),
cvec AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM cent GROUP BY cell
),
rt AS (
  SELECT q.qid, q.qv, c.cell,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY round({cosine_sql('c.centroid', 'q.qv', _EMB_DIM)}, 6)
                      DESC,
                    c.cell ASC) AS rn
  FROM q, cvec c
),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({cosine_sql('e.embedding', 'q.qv', _EMB_DIM)}, 6)
                        DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e, q
  ) WHERE rn <= 10
),
{_ivf_nprobe_curve_sql(nps=(1, 2, 4), k=10)},
h AS (
  SELECT i.nprobe, CAST(count(*) AS BIGINT) AS total_hits
  FROM brute b JOIN ivf i ON b.qid = i.qid AND b.vec_id = i.vec_id
  GROUP BY 1
),
nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q),
nc AS (SELECT CAST(count(DISTINCT label) AS BIGINT) AS n_cells
       FROM embeddings)
SELECT s.nprobe, nq.n_queries, nc.n_cells,
       CAST(coalesce(h.total_hits, 0) AS BIGINT) AS total_hits,
       round(CAST(coalesce(h.total_hits, 0) AS DOUBLE)
             / (CAST(nq.n_queries AS DOUBLE) * 10.0), 6)
         AS mean_recall_at_10
FROM (VALUES (CAST(1 AS INT)), (CAST(2 AS INT)), (CAST(4 AS INT)))
       AS s(nprobe)
LEFT JOIN h ON s.nprobe = h.nprobe
CROSS JOIN nq CROSS JOIN nc
ORDER BY s.nprobe
""",
    doc="IVF nprobe tuning curve (operators/similarity.py:"
    "ivf_topk_batch): mean recall@10 vs exact brute force at "
    "nprobe = 1/2/4 probed cells — the serving-side twin of the "
    "banding S-curve: ann_recall_eval grades the shipped nprobe=1, "
    "this measures what each extra probed cell buys (recall) and "
    "costs (scan fraction ~ nprobe/n_cells, reported via n_cells). "
    "Cell ranking computed ONCE and prefix-sliced per arm; the brute "
    "truth arm runs once and joins each arm's bounded top-k "
    "relation.",
)
def q_ivf_nprobe_recall_curve(spark, sf_dir):
    from ..session import cut_lineage, track_persist

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.withColumnRenamed("label", "cell")
    # The trained-centroid relation is label-count × dim tiny but its
    # TRAINING subtree (posexplode + two shuffles over the corpus) was
    # re-embedded by every nprobe arm's routing crossJoin — 3× the
    # training cost and ~12 extra Exchanges in the composed plan. One
    # eager lineage cut trains once and feeds all arms a LogicalRDD
    # (r18, guide §2.4 shared-subtree dedup; same values, arms
    # unchanged).
    cents = cut_lineage(sim.train_centroids_by_label(emb))
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    brute = track_persist(
        sim.cosine_topk_batch(emb, qs, k=10).select("qid", "vec_id")
    )
    per = None
    for np_ in (1, 2, 4):
        approx = sim.ivf_topk_batch(
            corpus, cents, qs, k=10, nprobe=np_
        ).select("qid", "vec_id")
        arm = (
            brute.join(approx, ["qid", "vec_id"])
            .agg(F.count(F.lit(1)).cast("long").alias("total_hits"))
            .select(F.lit(np_).cast("int").alias("nprobe"), "total_hits")
        )
        per = arm if per is None else per.unionByName(arm)
    nq = qs.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    nc = emb.agg(
        F.countDistinct("label").cast("long").alias("n_cells")
    )
    return (
        per.crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(nc))
        .select(
            "nprobe",
            "n_queries",
            "n_cells",
            F.coalesce("total_hits", F.lit(0))
            .cast("long")
            .alias("total_hits"),
            # NULL recall when there are no queries (empty relation)
            # — SQL division semantics, not an ANSI crash.
            F.when(
                F.col("n_queries") > 0,
                F.round(
                    F.coalesce("total_hits", F.lit(0)).cast("double")
                    / (F.col("n_queries").cast("double") * F.lit(10.0)),
                    6,
                ),
            ).alias("mean_recall_at_10"),
        )
        .orderBy("nprobe")
    )


@_q(
    "local_supplier_volume",
    """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
    doc="TPC-H Q5 shape: 6-way join with the dim chain (region → "
    "nation → supplier) collapsed into one broadcast before touching "
    "the fact tables, date filter pushed to the orders scan, and the "
    "only real shuffles the lineitem⋈orders and orders⋈customer "
    "equi-joins (AQE-planned); decimal-exact revenue.",
)
def q_local_supplier_volume(spark, sf_dir):
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    j = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("n_name").agg(agg.exact_sum(disc_price, "revenue"))


@_q(
    "returned_items_top_customers",
    """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    doc="TPC-H Q10 shape: returned-item revenue per customer over one "
    "quarter, top-20. Filters pushed to both fact scans, group on the "
    "customer key, TakeOrderedAndProject for the limit (per-partition "
    "heaps, no global sort); decimal-exact revenue makes the ordering "
    "and the selected set engine-independent, custkey breaks ties.",
)
def q_returned_items_top_customers(spark, sf_dir):
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-10-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            agg.exact_sum(disc_price, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@_q(
    "sole_late_suppliers",
    """
WITH ll AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
os AS (
  SELECT l_orderkey, l_suppkey, max(late) AS sup_late
  FROM ll GROUP BY l_orderkey, l_suppkey
),
od AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(sup_late) AS n_late
  FROM os GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM os
JOIN od USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE os.sup_late = 1 AND od.n_supp > 1 AND od.n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
""",
    doc="TPC-H Q21 shape, SCALABLE REFORMULATION — the deliberate "
    "pair of sole_late_supplier_waits (which keeps the textbook "
    "EXISTS/NOT-EXISTS semi+anti plan, the way the repo pairs "
    "Theil-Sen with OLS and MAD with stddev): the correlated pair is "
    "collapsed into grouped counts — per-(order, supplier) lateness, "
    "then per-order n_supp / n_late, predicate sup_late = 1 AND "
    "n_supp > 1 AND n_late = 1. ONE shuffle on orderkey reused by "
    "both aggregates and the rejoin (co-partitioned) replaces the "
    "textbook plan's two extra lineitem self-joins; "
    "tests/test_invariants.py pins the equivalence against the "
    "EXISTS form run via spark.sql. Lateness adapted to this schema "
    "(shipped > 90 days after order date; no commit/receipt "
    "columns). Supplier dim broadcast; top-20 via per-partition "
    "heaps.",
)
def q_sole_late_suppliers(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    ll = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    os_ = ll.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("sup_late")
    )
    od = os_.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("sup_late").alias("n_late")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        os_.join(od, "l_orderkey")
        .where(
            (F.col("sup_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


_CURR_HASH = (
    "CAST('0x' || substr(md5(concat_ws('|', 'curr', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)"
)
_SHUF_HASH = (
    "CAST('0x' || substr(md5(concat_ws('|', 'shuf', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)"
)


@_q(
    "curriculum_order_docs",
    f"""
WITH staged AS (
  SELECT doc_id,
         CAST(ntile(4) OVER (ORDER BY n_chars DESC, doc_id ASC) AS INT) AS stage,
         {_CURR_HASH} AS h
  FROM documents
)
SELECT doc_id, stage,
       CAST(row_number() OVER (PARTITION BY stage ORDER BY h ASC, doc_id ASC) AS INT)
         AS stage_pos
FROM staged
""",
    doc="Curriculum staging: ntile quality tiers (best first) + "
    "content-hash shuffled position within each stage — easy-to-hard "
    "across stages, decorrelated inside one. The global ntile is the "
    "one total sort; at 100 TB swap it for quantile-boundary "
    "broadcast (order_price_rank_scalable's trick).",
)
def q_curriculum_order_docs(spark, sf_dir):
    return smp.curriculum_order(
        _t(spark, sf_dir, "documents"), "doc_id", "n_chars", stages=4
    )


@_q(
    "shuffled_doc_shards",
    f"""
WITH base AS (
  SELECT doc_id,
         CAST({_SHUF_HASH} % 8 AS INT) AS shard,
         {_SHUF_HASH} AS h
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS INT)
         AS shard_pos
FROM base
""",
    doc="Deterministic global shuffle + sharding before training "
    "serialization: content-hash shard + within-shard position, "
    "byte-identical across engines/reruns/partitionings; the only "
    "shuffle keys on the uniform 60-bit hash (no skew, no global "
    "sort) and the write is partitionBy(shard).",
)
def q_shuffled_doc_shards(spark, sf_dir):
    return smp.global_shuffle_shards(
        _t(spark, sf_dir, "documents"), "doc_id", n_shards=8
    )


@_q(
    "corpus_trigram_topk",
    """
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
grams AS (
  SELECT unnest(CASE WHEN len(t) >= 3 THEN
    list_transform(generate_series(1, len(t) - 2),
                   i -> array_to_string(t[i:i+2], ' '))
  ELSE [] END) AS gram
  FROM toks
)
SELECT gram, count(*) AS cnt
FROM grams
GROUP BY gram
ORDER BY cnt DESC, gram ASC
LIMIT 100
""",
    doc="Corpus top-100 trigram table (contamination screens, "
    "boilerplate discovery): map-side gram build, one groupBy with "
    "partial agg, TakeOrderedAndProject top-k with lexicographic "
    "tiebreak.",
)
def q_corpus_trigram_topk(spark, sf_dir):
    return tx.corpus_ngram_topk(_t(spark, sf_dir, "documents"), n=3, top=100)


@_q(
    "cross_dup_rate_by_source",
    """
WITH fp AS (
  SELECT source AS src,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM documents
),
spanning AS (
  SELECT fp FROM fp GROUP BY fp HAVING count(DISTINCT src) >= 2
),
totals AS (SELECT src, count(*) AS n_docs FROM fp GROUP BY 1),
dups AS (
  SELECT src, count(*) AS n_cross_dup
  FROM fp WHERE fp.fp IN (SELECT fp FROM spanning)
  GROUP BY 1
)
SELECT t.src AS source, t.n_docs,
       coalesce(d.n_cross_dup, 0) AS n_cross_dup,
       round(CAST(coalesce(d.n_cross_dup, 0) AS DOUBLE) / t.n_docs, 6)
         AS cross_dup_rate
FROM totals t LEFT JOIN dups d ON t.src = d.src
""",
    doc="Cross-source exact-dup contamination matrix: fingerprints "
    "spanning >= 2 sources, semi-joined back per source. Both "
    "shuffles key on the uniform md5 fingerprint; the spanning set "
    "broadcasts.",
)
def q_cross_dup_rate_by_source(spark, sf_dir):
    return dd.cross_dup_rate_by_source(_t(spark, sf_dir, "documents"))


@_q(
    "pii_summary_by_source",
    f"""
WITH per AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '{tx.EMAIL_PATTERN}')) AS INT) AS e,
         CAST(len(regexp_extract_all(text, '{tx.URL_PATTERN}')) AS INT) AS u,
         CAST(len(regexp_extract_all(text, '{tx.PHONE_PATTERN}')) AS INT) AS p
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(e) AS BIGINT) AS n_emails,
       CAST(sum(u) AS BIGINT) AS n_urls,
       CAST(sum(p) AS BIGINT) AS n_phones,
       CAST(sum(CASE WHEN e + u + p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       round(CAST(sum(CASE WHEN e + u + p > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS pii_doc_rate
FROM per
GROUP BY source
""",
    doc="Per-source PII exposure dashboard over the scrub patterns: "
    "map-side regexp counts, one tiny groupBy on source.",
)
def q_pii_summary_by_source(spark, sf_dir):
    return tx.pii_summary(_t(spark, sf_dir, "documents"))


@_q(
    "quality_by_source_summary",
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
q AS (
  SELECT source,
         round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
               + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
               6) AS qs,
         n_tokens
  FROM base
)
SELECT source,
       count(*) AS n_docs,
       CAST(SUM(CAST(qs AS DECIMAL(27,6))) AS DOUBLE) / count(*) AS avg_quality,
       min(qs) AS min_quality,
       max(qs) AS max_quality,
       CAST(SUM(CAST(n_tokens AS DECIMAL(27,4))) AS DOUBLE) / count(*) AS avg_tokens
FROM q
GROUP BY source
""",
    doc="Per-source corpus quality report: the composite heuristic "
    "score aggregated by source (decimal-exact means) — the mix-"
    "design dashboard that decides per-source sampling weights.",
)
def q_quality_by_source_summary(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    qf = tx.quality_features(d, "doc_id", "text").select(
        "doc_id", "quality_score", "n_tokens"
    )
    j = qf.join(d.select("doc_id", "source"), "doc_id")
    # exact_avg's decimal(27,4) would truncate the 6dp scores — sum at
    # the scores' own scale so the decimal accumulation is lossless.
    avg_q = (
        F.sum(F.col("quality_score").cast("decimal(27,6)")).cast("double")
        / F.count(F.lit(1))
    ).alias("avg_quality")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        avg_q,
        F.min("quality_score").alias("min_quality"),
        F.max("quality_score").alias("max_quality"),
        agg.exact_avg("n_tokens", "avg_tokens"),
    )


@_q(
    "embedding_norm_outliers",
    """
WITH base AS (
  SELECT vec_id,
         round(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * (CASE WHEN vec_id % 97 = 0 THEN 8.0
                       ELSE 1.0 + (vec_id % 7) * 0.01 END), 6) AS nr
  FROM embeddings
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(nr AS DECIMAL(27,6))) AS s1,
         sum(CAST(nr AS DECIMAL(18,6)) * CAST(nr AS DECIMAL(18,6))) AS s2
  FROM base
),
m AS (
  SELECT CAST(s1 AS DOUBLE) / n AS mu,
         sqrt(CAST(s2 AS DOUBLE) / n
              - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sd
  FROM stats
)
SELECT vec_id, nr AS norm,
       CASE WHEN sd > 0 THEN round((nr - mu) / sd, 6) END AS z
FROM base, m
WHERE sd > 0 AND abs(round((nr - mu) / sd, 6)) > 2.0
""",
    doc="Norm z-score outlier screen (broken encoders / truncated "
    "rows): ONE decimal-exact moments aggregate broadcast back as a "
    "1-row join; scan stays map-side, no sort anywhere. The fixture's "
    "embeddings are unit-normalized (every L2 norm is exactly 1.0), so "
    "the screen reconstructs raw magnitudes with a deterministic "
    "per-row weight — vec_id % 97 == 0 rows simulate broken-encoder "
    "blow-ups (8x), the rest get a small id-derived spread — making "
    "sd > 0 and the outlier set non-empty. z is sd>0-guarded (lazy "
    "CASE WHEN) so an all-uniform corpus yields 0 rows, not an ANSI "
    "divide-by-zero.",
)
def q_embedding_norm_outliers(spark, sf_dir):
    raw_weight = F.when(
        F.col("vec_id") % 97 == 0, F.lit(8.0)
    ).otherwise(F.lit(1.0) + (F.col("vec_id") % 7).cast("double") * 0.01)
    return sim.embedding_norm_outliers(
        _t(spark, sf_dir, "embeddings"), weight=raw_weight
    )


@_q(
    "orders_yoy_growth",
    """
WITH y AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         count(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT yr, n_orders, revenue,
       lag(n_orders) OVER (ORDER BY yr) AS prev_orders,
       round(CAST(n_orders - lag(n_orders) OVER (ORDER BY yr) AS DOUBLE)
             / lag(n_orders) OVER (ORDER BY yr), 6) AS orders_growth
FROM y
""",
    doc="Year-over-year growth: tiny post-aggregate lag window over "
    "per-year rows (the window runs on |years| rows, never the fact "
    "table); decimal-exact revenue.",
)
def q_orders_yoy_growth(spark, sf_dir):
    from pyspark.sql import Window

    y = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            agg.exact_sum("o_totalprice", "revenue"),
        )
    )
    w = Window.orderBy("yr")
    prev = F.lag("n_orders").over(w)
    return y.select(
        "yr",
        "n_orders",
        "revenue",
        prev.alias("prev_orders"),
        F.round((F.col("n_orders") - prev).cast("double") / prev, 6).alias(
            "orders_growth"
        ),
    )


