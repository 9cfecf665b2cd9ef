"""North-star: deduplication (exact / fingerprint / n-gram Jaccard / MinHash-LSH / SimHash).

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import (
    F,
    _q,
    _t,
    agg,
    dd,
    dq,
    md5_family_sql,
    md5_long_sql,
    ts_ops,
    tx,
)  # noqa: F401

# --------------------------------------------------------------------------
# North-star: deduplication (BASELINE.json)
# --------------------------------------------------------------------------

# DuckDB twins of the shingling pipeline (dedup.py). Both engines build
# distinct lowercase word 3-grams, hash with the portable md5-60bit mix.
_SHINGLES_CTE = """
toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(t) - 2),
                                        i -> array_to_string(t[i:i+2], ' ')))
         ELSE [] END AS shingles
  FROM toks
)"""


def _minhash_oracle(
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.8,
    pair_pred: str = "a.doc_id < b.doc_id",
) -> str:
    """``pair_pred`` restricts the candidate self-join (default: the
    batch dedup orientation; the gate twin passes the cross-half
    incoming-vs-index predicate)."""
    rows = k // bands
    mh_cols = ",\n         ".join(
        f"list_min(list_transform(shingles, s -> {md5_family_sql('s', i)})) AS mh{i}"
        for i in range(k)
    )
    band_cols = ",\n         ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        + f")) AS band{b}"
        for b in range(bands)
    )
    band_union = "\nUNION ALL\n".join(
        f"SELECT doc_id, n_sh, shingles, {b} AS band_id, band{b} AS key FROM banded"
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLES_CTE},
sig AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, shingles,
         {mh_cols}
  FROM sh
),
banded AS (
  SELECT doc_id, n_sh, shingles,
         {band_cols}
  FROM sig
),
bl AS ({band_union}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.shingles AS sh_a, b.shingles AS sh_b,
                  a.n_sh AS na, b.n_sh AS nb
  FROM bl a JOIN bl b
    ON a.band_id = b.band_id AND a.key = b.key AND ({pair_pred})
),
verified AS (
  SELECT doc_a, doc_b,
         round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
               / CAST(na + nb - len(list_intersect(sh_a, sh_b)) AS DOUBLE), 6) AS jaccard
  FROM cand
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {threshold}
"""


def _simhash_sig_sql(bits: int = dd.SIMHASH_BITS, src: str = "documents") -> str:
    """CTEs doc_id → simhash, mirroring dedup.simhash exactly."""
    votes = ",\n         ".join(
        f"list_sum(list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1)) AS v{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    return f"""
toks AS (
  SELECT doc_id,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS t
  FROM {src}
),
hashed AS (
  SELECT doc_id, list_transform(t, s -> {md5_long_sql('s')}) AS hs FROM toks
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hashed
),
sig AS (
  SELECT doc_id, {sig} AS simhash FROM votes
)"""


@_q(
    "dedup_exact_docs",
    """
SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text
""",
    doc="Exact dedup — hash groupBy keeping the minimal id "
    "(deterministic survivor).",
)
def q_dedup_exact_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dd.dedup_exact(d, ["text"], "doc_id")


@_q(
    "doc_fingerprints",
    """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
       CAST(length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS INT) AS norm_len
FROM documents
""",
    doc="Fingerprint dedup key: md5 over normalized (case/punct/ws-"
    "invariant) text.",
)
def q_doc_fingerprints(spark, sf_dir):
    return tx.doc_fingerprints(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "dedup_ngram_pairs",
    f"""
WITH {_SHINGLES_CTE},
ex0 AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s FROM sh
),
hot AS (
  SELECT s FROM (
    SELECT s, count(DISTINCT doc_id) AS df FROM ex0 GROUP BY s
  ) t WHERE df > 5
),
ex AS (SELECT * FROM ex0 WHERE s NOT IN (SELECT s FROM hot)),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM c
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) >= 0.8
""",
    doc="N-gram Jaccard near-dup pairs — THE DEFAULT VARIANT runs with "
    "the stop-shingle cap ON (max_doc_freq=5, the operator default "
    "since round 6): shingles in >5 docs are excluded before the "
    "self-join via a broadcast anti-join, bounding per-shingle join "
    "fan-out (d·(d-1)/2 candidate rows per shingle in d docs). The "
    "25× doc scale point measured exact at 12.3× vs capped at 2.7× — "
    "the default must be the variant that survives shared-shingle "
    "density growth. Jaccard is conservative under the cap: common "
    "counts only surviving shingles against full set sizes.",
)
def q_dedup_ngram_pairs(spark, sf_dir):
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.8
    )


@_q(
    "ngram_jaccard_exact",
    f"""
WITH {_SHINGLES_CTE},
ex AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s FROM sh
),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM c
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) >= 0.8
""",
    doc="EXACT n-gram Jaccard (max_doc_freq=None): the bit-parity / "
    "recall baseline the capped default is judged against — "
    "deliberately NOT the default (12.3× time at 25× docs vs 2.7× "
    "capped; same default-vs-baseline split as embedding_neardup_"
    "pairs vs embedding_neardup_fine). Shingle-explode + bucket join: "
    "docs only meet on shared shingles, never a cross join.",
    scale_note="recall/parity baseline — superlinear on hot shingles "
    "(13.5× at 25× docs); at scale use dedup_ngram_pairs (capped "
    "max_doc_freq) instead",
)
def q_ngram_jaccard_exact(spark, sf_dir):
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold=0.8, max_doc_freq=None,
    )


@_q(
    "doc_novelty_scores",
    f"""
WITH {_SHINGLES_CTE},
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
first AS (SELECT s, min(doc_id) AS fd FROM ex GROUP BY s),
per AS (
  SELECT e.doc_id,
         count(*) AS n_shingles,
         CAST(sum(CASE WHEN f.fd = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM ex e JOIN first f ON e.s = f.s
  GROUP BY e.doc_id
)
SELECT doc_id, n_shingles, n_novel,
       round(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS novelty
FROM per
""",
    doc="Per-document novelty / contribution score (operators/"
    "dedup.py:doc_novelty_scores): fraction of a doc's distinct word "
    "3-gram shingles FIRST seen in that doc (min-doc_id attribution) "
    "— ranks near-boilerplate docs that evade every pairwise near-dup "
    "threshold yet contribute almost nothing new; novelty → 0 as "
    "content is already covered by earlier corpus. Same shingle-keyed "
    "shuffle the n-gram dedup family pays, map-side-combinable min "
    "attribution, exploded relation persisted (feeds the first-seen "
    "aggregate AND the per-doc rollup). Deterministic: min/integer "
    "counts, one final division.",
)
def q_doc_novelty_scores(spark, sf_dir):
    return dd.doc_novelty_scores(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "priority_loo_target_encoding",
    """
WITH stats AS (
  SELECT o_orderpriority,
         SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS s,
         count(*) AS n
  FROM orders GROUP BY 1
)
SELECT o_orderkey, o.o_orderpriority, o_totalprice,
       CASE WHEN n > 1 THEN
         round(CAST(s - CAST(o_totalprice AS DECIMAL(27,4)) AS DOUBLE)
               / CAST(n - 1 AS DOUBLE), 6)
       END AS loo_mean
FROM orders o JOIN stats USING (o_orderpriority)
""",
    doc="Leave-one-out target encoding of order priority by mean "
    "total price (operators/aggregates.py:loo_target_encoding) — the "
    "standard high-cardinality categorical encoder in its "
    "leakage-safe form: each row gets the category mean over all "
    "OTHER rows, (S−x)/(n−1), so its own label never leaks into the "
    "feature. DECIMAL-exact sums (order-free under AQE), one double "
    "division per row; singleton categories NULL. ONE map-side-"
    "combinable groupBy + broadcast-back — never a per-row window "
    "over the category (the naive shape funnels every hot category "
    "through one reducer).",
)
def q_priority_loo_target_encoding(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return agg.loo_target_encoding(
        o, ["o_orderkey"], "o_orderpriority", "o_totalprice"
    )


@_q(
    "order_price_decile_bins",
    """
WITH b AS (
  SELECT list_transform(
           quantile_cont(o_totalprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           x -> round(x, 6)) AS bounds
  FROM orders
)
SELECT o_orderkey, o_totalprice,
       CASE WHEN o_totalprice IS NOT NULL THEN
         CAST(1 + len(list_filter(bounds, x -> x <= round(o_totalprice, 6))) AS INT)
       END AS bin
FROM orders, b
""",
    doc="Equi-depth decile binning of order prices (operators/"
    "aggregates.py:quantile_bins — the QuantileDiscretizer shape as "
    "plain DataFrame ops): bin = 1 + #bounds ≤ value over exact "
    "10-quantile bounds, 6dp-rounded before comparison. Unlike "
    "ntile(), which buckets ROW RANKS and splits ties arbitrarily, "
    "value-bound binning is deterministic and inference-stable (equal "
    "values always share a bin). One 1-row percentile aggregate "
    "broadcast back; assignment is a map-side array fold; "
    "percentile_approx is the 100 TB drop-in.",
)
def q_order_price_decile_bins(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return agg.quantile_bins(o, ["o_orderkey"], "o_totalprice", n_bins=10)


@_q(
    "hourly_value_isotonic_fit",
    """
WITH base AS (
  SELECT event_type AS g, CAST(hour(ts) AS INT) AS x,
         count(*) AS w, SUM(CAST(value AS DECIMAL(27,6))) AS wy
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT g, x, w, wy,
         SUM(w)  OVER (PARTITION BY g ORDER BY x ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(wy) OVER (PARTITION BY g ORDER BY x ROWS UNBOUNDED PRECEDING) AS cwy
  FROM base
),
cum2 AS (
  SELECT g, x, w, wy, cw, cwy, cw - w AS pcw, cwy - wy AS pcwy FROM cum
),
pairs AS (
  SELECT j.g, j.x AS xj, k.x AS xk,
         CAST(k.cwy - j.pcwy AS DOUBLE) / CAST(k.cw - j.pcw AS DOUBLE) AS iavg
  FROM cum2 j JOIN cum2 k ON j.g = k.g AND j.x <= k.x
),
smin AS (
  SELECT g, xj, xk,
         min(iavg) OVER (PARTITION BY g, xj ORDER BY xk DESC
                         ROWS UNBOUNDED PRECEDING) AS sm
  FROM pairs
),
iso AS (SELECT g, xk AS x, round(max(sm), 6) AS y_iso FROM smin GROUP BY g, xk),
means AS (
  SELECT g, x, w AS n,
         round(CAST(wy AS DOUBLE) / CAST(w AS DOUBLE), 6) AS y_mean
  FROM cum2
)
SELECT m.g AS event_type, m.x AS hour, n, y_mean, y_iso
FROM means m JOIN iso ON m.g = iso.g AND m.x = iso.x
""",
    doc="Per-type isotonic (monotone non-decreasing) fit of mean event "
    "value against hour of day (operators/timeseries.py:"
    "isotonic_fit_by_group) — the calibration-curve fit in its closed "
    "MINIMAX form ŷᵢ = max_{j≤i} min_{k≥i} avg(j..k) (Barlow et al. "
    "1972), which equals pool-adjacent-violators exactly but is "
    "expressible as joins + two running-extreme windows — fully "
    "distributed AND hash-checkable in SQL. Ties collapse first "
    "(per-(type, hour) DECIMAL-exact sums), so the O(d²) pair join is "
    "over d = 24 distinct hours, not data rows; interval averages "
    "are single double divisions of exact decimal prefix sums. "
    "isotonic_fit_pandas (applyInPandas PAVA, O(d)) is the large-d "
    "path, pinned against this one in tests.",
)
def q_hourly_value_isotonic_fit(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hour"), "value"
    )
    return ts_ops.isotonic_fit_by_group(e, "event_type", "hour", "value")


@_q(
    "customer_k_anonymity_audit",
    """
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / 5000) AS INT) AS acctbal_band,
       count(*) AS class_size
FROM customer
GROUP BY 1, 2, 3
HAVING count(*) < 5
ORDER BY class_size, c_nationkey, c_mktsegment, acctbal_band
""",
    doc="k-anonymity audit (Sweeney 2002; operators/quality.py:"
    "k_anonymity_audit) over the (nation, segment, balance-band) "
    "quasi-identifier tuple: every equivalence class with < 5 members "
    "is a re-identification risk — the release gate run before "
    "person-adjacent tabular data enters a training corpus. ONE "
    "map-side-combinable groupBy + count filter; only quasi columns "
    "move, no payloads; smallest (riskiest) classes first with a "
    "deterministic full-column tiebreak. Mitigation (generalize / "
    "suppress / drop) is the caller's policy step.",
)
def q_customer_k_anonymity_audit(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 5000).cast("int").alias("acctbal_band"),
    )
    return dq.k_anonymity_audit(
        c, ["c_nationkey", "c_mktsegment", "acctbal_band"], k=5
    )


@_q(
    "vocab_coverage_curve",
    r"""
WITH counts AS (
  SELECT w, count(*) AS cnt FROM (
    SELECT trim(unnest(string_split_regex(trim(lower(text)), '\s+'))) AS w
    FROM documents
  ) WHERE w <> '' GROUP BY w
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rn FROM counts
),
cps AS (SELECT unnest([100, 500, 1000, 5000]) AS vocab_size)
SELECT CAST(vocab_size AS INT) AS vocab_size,
       CAST(sum(CASE WHEN rn <= vocab_size THEN cnt ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       CAST(sum(cnt) AS BIGINT) AS total_tokens,
       round(CAST(sum(CASE WHEN rn <= vocab_size THEN cnt ELSE 0 END) AS DOUBLE)
             / CAST(sum(cnt) AS DOUBLE), 6) AS coverage
FROM ranked, cps
GROUP BY vocab_size
""",
    doc="Vocabulary coverage curve (operators/textops.py:"
    "vocab_coverage_curve): fraction of all token occurrences covered "
    "by the N most frequent words at N ∈ {100, 500, 1000, 5000} — the "
    "diagnostic that decides tokenizer vocab size (coverage "
    "saturation) and flags noise/OCR-heavy corpora (flat curves). "
    "Frequency ranks come from the distributed global row-number "
    "(range-partitioned + broadcast prefix offsets — never the "
    "single-reducer global window; vocabulary reaches 100M+ types at "
    "web scale), coverage sums are one conditional-aggregate pass.",
)
def q_vocab_coverage_curve(spark, sf_dir):
    return tx.vocab_coverage_curve(_t(spark, sf_dir, "documents"), "text")


@_q(
    "cdc_chunked_documents",
    rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
),
b AS (
  SELECT doc_id, t, len(t) AS L,
         CASE WHEN len(t) >= 3 THEN
           list_filter(generate_series(3, len(t)),
                       i -> ({md5_long_sql("array_to_string(t[i-2:i], ' ')")}) % 16 = 0)
         ELSE [] END AS bp
  FROM toks
),
b2 AS (
  SELECT doc_id, t,
         CASE WHEN len(bp) > 0 AND bp[-1] = L THEN bp
              ELSE list_append(bp, L) END AS bounds
  FROM b
),
c AS (
  SELECT doc_id, t,
         unnest(list_transform(generate_series(1, len(bounds)),
                i -> struct_pack(ci := i - 1,
                                 s := CASE WHEN i = 1 THEN 1 ELSE bounds[i-1] + 1 END,
                                 e := bounds[i]))) AS ch
  FROM b2
)
SELECT doc_id,
       CAST(ch.ci AS INT) AS chunk_idx,
       CAST(ch.s AS INT) AS start_tok,
       CAST(ch.e AS INT) AS end_tok,
       CAST(ch.e - ch.s + 1 AS INT) AS n_tokens,
       md5(array_to_string(t[CAST(ch.s AS INT):CAST(ch.e AS INT)], ' ')) AS chunk_hash
FROM c
""",
    doc="Content-defined chunking (FastCDC/LBFS principle at token "
    "level; operators/textops.py:cdc_chunk_documents): boundaries "
    "where the rolling md5 of the trailing 3-gram ≡ 0 mod 16 — "
    "anchored to CONTENT, so one inserted token re-synchronizes "
    "within ~one chunk instead of shifting every later chunk "
    "(fixed-width chunking defeats chunk-level dedup/caching on any "
    "edit; chunked_documents is that baseline). Expected chunk ≈ 16 "
    "tokens, final boundary forced at doc end. Entirely map-side "
    "nested array transforms — ZERO shuffles, a pure scan→write at "
    "100 TB; per-chunk md5 makes the chunk relation directly "
    "exact-dedupable.",
)
def q_cdc_chunked_documents(spark, sf_dir):
    return tx.cdc_chunk_documents(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "prefix_jaccard_pairs",
    f"""
WITH {_SHINGLES_CTE},
ex AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s FROM sh
),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM c
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) >= 0.8
""",
    doc="EXACT Jaccard ≥ 0.8 via PREFIX FILTERING (PPJoin family, "
    "operators/dedup.py:prefix_filtered_jaccard_pairs): tokens "
    "globally ordered rarest-first; only each doc's first "
    "n−⌈t·n⌉+1 tokens (~20% at t=0.8) enter the self-join, and the "
    "hot boilerplate shingles that blow up the full shingle join sit "
    "at the END of every ordering — never join keys. LOSSLESS "
    "(oracle = the full exact-pairs SQL, identical output to "
    "ngram_jaccard_exact) with capped-variant-like candidate counts; "
    "prefix length and the t·max≤min length filter use exact integer "
    "arithmetic (a float ⌈0.8·n⌉ mis-rounds for some n and silently "
    "drops qualifying pairs). Exact array_intersect verify per "
    "candidate; slim prefix rows generate, arrays travel "
    "per-candidate only.",
)
def q_prefix_jaccard_pairs(spark, sf_dir):
    return dd.prefix_filtered_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold_num=4, threshold_den=5,
    )


@_q(
    "dedup_minhash_pairs",
    _minhash_oracle(k=12, bands=4, threshold=0.8),
    doc="MinHash(12) + LSH(4 bands × 3 rows) + exact-Jaccard verify — "
    "the scale path for near-dedup: candidates bounded by band "
    "collisions, not n².",
)
def q_dedup_minhash_pairs(spark, sf_dir):
    return dd.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=12, bands=4, threshold=0.8
    )


@_q(
    "simhash_signatures",
    f"WITH {_simhash_sig_sql()} SELECT doc_id, simhash FROM sig",
    doc=f"SimHash-{dd.SIMHASH_BITS} signatures: per-token md5 votes, map-side only.",
)
def q_simhash_signatures(spark, sf_dir):
    return dd.simhash(_t(spark, sf_dir, "documents"), "doc_id", "text").select(
        F.col("doc").alias("doc_id"), "simhash"
    )


@_q(
    "simhash_near_pairs",
    f"""
WITH {_simhash_sig_sql()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
""",
    doc="SimHash near-dup pairs via 7-band LSH with CORPUS-ADAPTIVE "
    "band width (round 6: fixed 256-bucket bands measured 25.3× time "
    "at 25× docs — adaptive_simhash_band_bits grows buckets/band with "
    "n, same integer rule as the embedding family's adaptive_lsh_"
    "bits; band COUNT stays 7 so the pigeonhole losslessness at "
    "hamming ≤ 6 is width-independent). At the fixtures' corpus sizes "
    "the rule instantiates 8-bit bands = the original 56-bit "
    "signature, which is exactly what this oracle unrolls; wider "
    "instantiations are pinned by tests/test_dedup.py's banded-vs-"
    "all-pairs equality and the 25× bench. The oracle is the *exact "
    "all-pairs* hamming query — the check covers recall, not just "
    "the banding replay.",
)
def q_simhash_near_pairs(spark, sf_dir):
    return dd.simhash_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text", 6)


