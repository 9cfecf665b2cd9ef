"""North-star: similarity search (ANN / IVF / LSH / quantization).

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import DataFrame, F, _q, _t, cosine_sql, md5_long_sql, sim  # noqa: F401

# --------------------------------------------------------------------------
# North-star: similarity search
# --------------------------------------------------------------------------

_EMB_DIM = 64


def _query_vec(spark, sf_dir) -> list[float] | None:
    """The fixture query vector (vec_id = 0), or None when it does not
    exist — the SQL oracles all derive the query via ``WITH q AS
    (SELECT ... WHERE vec_id = 0)`` and cross join it, so a missing
    query row means an EMPTY result in every consumer, never a crash
    (see _empty_if_no_query)."""
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return None if row is None else [float(x) for x in row[0]]


def _empty_if_no_query(emb: DataFrame, qv: list[float] | None):
    """Mirror the oracles' cross-join-with-q semantics when the query
    vector is absent: keep the relation's schema, drop every row, and
    substitute a harmless zero vector (never evaluated — no rows
    reach it)."""
    if qv is None:
        return emb.where(F.lit(False)), [0.0] * _EMB_DIM
    return emb, qv


@_q(
    "ann_topk_cosine",
    f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round({cosine_sql('embedding', 'qv', _EMB_DIM)}, 6) AS score
FROM embeddings, q
ORDER BY score DESC, vec_id
LIMIT 10
""",
    doc="Brute-force exact ANN baseline: map-side cosine vs a constant "
    "query vector + TakeOrderedAndProject (k-heap per partition, no "
    "global sort, no shuffle).",
)
def q_ann_topk_cosine(spark, sf_dir):
    emb, qv = _empty_if_no_query(
        _t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir)
    )
    return sim.cosine_topk(emb, qv, k=10)


def _signlsh_adaptive_oracle(
    threshold: float,
    dim: int = _EMB_DIM,
    bands: int = 8,
    emb_rel: str = "embeddings",
    prelude: str = "",
) -> str:
    """DuckDB twin of similarity.cosine_neardup_pairs with the DEFAULT
    corpus-adaptive banding: bits-per-band is derived from count(*)
    with the same integer rule as similarity.adaptive_lsh_bits
    (smallest b in [2,12] with 128·2^b ≥ n), so both engines size the
    identical banding at any SF. Planes are emitted for the max width
    (bands·12) and sliced to the active prefix — hyperplanes() is
    prefix-stable, so the slice matches Spark's plane family exactly."""
    from ..operators.similarity import LSH_MAX_BITS, LSH_TARGET_BUCKET

    max_planes = bands * LSH_MAX_BITS
    planes = sim.hyperplanes(max_planes, dim)
    planes_lit = ",\n    ".join(
        "[" + ", ".join(str(x) for x in pl) + "]" for pl in planes
    )
    bits_case = (
        "CASE "
        + " ".join(
            f"WHEN n <= {LSH_TARGET_BUCKET << b} THEN {b}"
            for b in range(2, LSH_MAX_BITS)
        )
        + f" ELSE {LSH_MAX_BITS} END"
    )
    cos = cosine_sql("ua", "ub", dim)
    return f"""
WITH {prelude}params AS (
  SELECT {bits_case} AS bits
  FROM (SELECT count(*) AS n FROM {emb_rel})
),
planes AS (SELECT [
    {planes_lit}
  ] AS P),
sgn AS (
  SELECT vec_id,
         list_transform(P[1 : {bands} * bits],
           pl -> CASE WHEN list_sum(list_transform(generate_series(1, {dim}),
                        i -> CAST(embedding[i] AS DOUBLE) * pl[i])) > 0
                 THEN 1 ELSE 0 END) AS sbits
  FROM {emb_rel}, planes, params
),
banded AS (
  SELECT vec_id, band_id,
         list_sum(list_transform(generate_series(1, bits),
           r -> sbits[band_id * bits + r] * (1 << (r - 1)))) AS bucket
  FROM sgn, params,
       (SELECT unnest(generate_series(0, {bands - 1})) AS band_id) bnd
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT id_a, id_b, ea.embedding AS ua, eb.embedding AS ub
  FROM cand
  JOIN {emb_rel} ea ON ea.vec_id = cand.id_a
  JOIN {emb_rel} eb ON eb.vec_id = cand.id_b
)
SELECT id_a, id_b, round({cos}, 6) AS score
FROM pairs WHERE round({cos}, 6) >= {threshold}
"""


def _signlsh_oracle(
    threshold: float, dim: int = _EMB_DIM, n_planes: int = 16, bands: int = 8
) -> str:
    """DuckDB twin of similarity.cosine_neardup_pairs — identical
    md5-derived hyperplanes, banding, and exact-cosine verify."""
    rows = n_planes // bands
    planes = sim.hyperplanes(n_planes, dim)
    bit_cols = ",\n         ".join(
        "CASE WHEN list_sum(list_transform(generate_series(1, %d), "
        "i -> CAST(embedding[i] AS DOUBLE) * ([%s])[i])) > 0 THEN 1 ELSE 0 END AS bit%d"
        % (dim, ", ".join(str(x) for x in planes[p]), p)
        for p in range(n_planes)
    )
    band_union = "\nUNION ALL\n".join(
        f"SELECT vec_id, embedding, {b} AS band_id, "
        + " + ".join(f"bit{b * rows + r} * {1 << r}" for r in range(rows))
        + " AS bucket FROM sgn"
        for b in range(bands)
    )
    cos = cosine_sql("ua", "ub", dim)
    return f"""
WITH sgn AS (
  SELECT vec_id, embedding,
         {bit_cols}
  FROM embeddings
),
banded AS ({band_union}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                  a.embedding AS ua, b.embedding AS ub
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round({cos}, 6) AS score
FROM cand WHERE round({cos}, 6) >= {threshold}
"""


@_q(
    "embedding_neardup_pairs",
    _signlsh_adaptive_oracle(threshold=0.42),
    doc="Embedding-cosine near-dup pairs above threshold via sign-LSH "
    "bucketing + exact cosine verify — no cartesian/nested-loop join "
    "in the plan. Banding is CORPUS-ADAPTIVE (bits = smallest b with "
    "128·2^b ≥ n, 8 bands), so buckets per band grow with the corpus "
    "and candidate pairs stay ~O(n·128) instead of the fixed-width "
    "O(n²/2^bits); the oracle derives the identical bits from "
    "count(*) and replays identical md5 planes and banding.",
)
def q_embedding_neardup_pairs(spark, sf_dir):
    return sim.cosine_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.42)


@_q(
    "embedding_neardup_fine",
    _signlsh_oracle(threshold=0.42, n_planes=32, bands=8),
    doc="Sign-LSH near-dup pairs with FINE banding (32 planes, 8 bands "
    "× 4 bits → 16 buckets/band vs the default's 4): bucket count per "
    "band is 2^bits and FIXED, so candidate pairs grow O(n²/2^bits) — "
    "the 5× scale bench measured the 2-bit default at 12.5× cost for "
    "5× vectors. Four bits cut per-bucket occupancy 4× (16× fewer "
    "candidate pairs) at the price of banding recall at low cosine "
    "(0.77 at 0.42; 0.98 at the ≥0.8 regime real dedup targets). "
    "Size bits ≈ log2(n/target_bucket_size) as the corpus grows.",
    scale_note="recall/parity baseline — fixed band width is "
    "superlinear (16.3× at 10× vectors); at scale use "
    "embedding_neardup_pairs (corpus-adaptive LSH bits) instead",
)
def q_embedding_neardup_fine(spark, sf_dir):
    return sim.cosine_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.42, n_planes=32, bands=8
    )


# Shared PQ oracle CTE prefix (DuckDB): md5-seeded 16-entry codebook
# over 8 subspaces, per-(vector, subspace) nearest codeword. cb is
# MATERIALIZED — the ADC query references it twice and DuckDB inlines
# plain CTEs at every reference (the kcore lesson).
_PQ_CTES = f"""h AS (
  SELECT vec_id, embedding,
         {md5_long_sql("CAST(vec_id AS VARCHAR)")} AS hh
  FROM embeddings
),
seeds AS (
  SELECT embedding, CAST(row_number() OVER (ORDER BY hh, vec_id) - 1 AS INT) AS c
  FROM (SELECT * FROM h ORDER BY hh, vec_id LIMIT 16)
),
cb AS MATERIALIZED (
  SELECT c, j,
         list_transform(generate_series(j*8+1, j*8+8),
                        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS csv
  FROM seeds, (SELECT unnest(generate_series(0, 7)) AS j) g
),
vs AS (
  SELECT vec_id, j,
         list_transform(generate_series(j*8+1, j*8+8),
                        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS vsv
  FROM embeddings, (SELECT unnest(generate_series(0, 7)) AS j) g
),
d AS (
  SELECT vs.vec_id, vs.j, cb.c,
         list_sum(list_transform(generate_series(1, 8),
                  i -> (vsv[CAST(i AS INT)] - csv[CAST(i AS INT)])
                     * (vsv[CAST(i AS INT)] - csv[CAST(i AS INT)]))) AS d2
  FROM vs JOIN cb ON vs.j = cb.j
),
best AS (
  SELECT vec_id, j, c, d2,
         row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
  FROM d
)"""


@_q(
    "pq_encoded_embeddings",
    f"""
WITH {_PQ_CTES}
SELECT vec_id,
       string_agg(CAST(c AS VARCHAR), ',' ORDER BY j) AS codes,
       round(sqrt(list_sum(list(d2 ORDER BY j))), 6) AS recon_err
FROM best WHERE rn = 1
GROUP BY vec_id
""",
    doc="Product-quantization encode (Jégou et al. PAMI'11; operators/"
    "similarity.py:pq_encode): 8 subspaces × 16-codeword codebooks → "
    "4-bit codes, a 64× memory shrink for billion-scale ANN. Codebook "
    "= the 16 smallest-md5(vec_id) corpus vectors (the deterministic "
    "uniform sample a per-subspace k-means would start from; "
    "kmeans_centroids is the refinement path). Distances fold "
    "left-to-right over fixed component order and per-id errors over "
    "a j-sorted array — never a shuffle-ordered float sum, so "
    "recon_err is bit-stable across engines/partitionings. Plan: m·k "
    "codebook rows broadcast onto the n·m exploded subvectors (n·m·k "
    "distance rows is PQ's inherent encode cost), ONE groupBy fold.",
)
def q_pq_encoded_embeddings(spark, sf_dir):
    return sim.pq_encode(_t(spark, sf_dir, "embeddings"))


@_q(
    "pq_adc_topk",
    f"""
WITH {_PQ_CTES},
qs AS (
  SELECT j,
         list_transform(generate_series(j*8+1, j*8+8),
                        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS qsv
  FROM embeddings, (SELECT unnest(generate_series(0, 7)) AS j) g
  WHERE vec_id = 0
),
lut AS (
  SELECT cb.j, cb.c,
         list_sum(list_transform(generate_series(1, 8),
                  i -> (qsv[CAST(i AS INT)] - csv[CAST(i AS INT)])
                     * (qsv[CAST(i AS INT)] - csv[CAST(i AS INT)]))) AS qd2
  FROM qs JOIN cb ON qs.j = cb.j
),
codes AS (SELECT vec_id, j, c FROM best WHERE rn = 1)
SELECT vec_id,
       round(list_sum(list(qd2 ORDER BY codes.j)), 6) AS adc_d2
FROM codes JOIN lut ON codes.j = lut.j AND codes.c = lut.c
GROUP BY vec_id
ORDER BY adc_d2, vec_id
LIMIT 10
""",
    doc="PQ asymmetric-distance top-k (Jégou et al. PAMI'11 §IV; "
    "operators/similarity.py:pq_adc_topk) — the serving scan product "
    "quantization exists for: query at full precision, corpus as "
    "m-byte codes, each candidate scored by summing m lookup-table "
    "entries (128-row LUT broadcast; the (j, code) equi-join + fold "
    "does NO per-candidate vector arithmetic). Distance folds over "
    "j-sorted arrays, top-k via TakeOrderedAndProject with id "
    "tiebreak; query row ranks first at ≈ its recon error — the "
    "compute-side 64× shrink that pairs with pq_encoded_embeddings' "
    "memory shrink.",
)
def q_pq_adc_topk(spark, sf_dir):
    return sim.pq_adc_topk(_t(spark, sf_dir, "embeddings"), query_id=0)


@_q(
    "pq_recall_eval",
    f"""
WITH {_PQ_CTES},
qs AS (
  SELECT vec_id AS qid, j,
         list_transform(generate_series(j*8+1, j*8+8),
                        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS qsv
  FROM embeddings, (SELECT unnest(generate_series(0, 7)) AS j) g
  WHERE vec_id IN (0, 1, 2)
),
lut AS (
  SELECT qid, cb.j, cb.c,
         list_sum(list_transform(generate_series(1, 8),
                  i -> (qsv[CAST(i AS INT)] - csv[CAST(i AS INT)])
                     * (qsv[CAST(i AS INT)] - csv[CAST(i AS INT)]))) AS qd2
  FROM qs JOIN cb ON qs.j = cb.j
),
codes AS (SELECT vec_id, j, c FROM best WHERE rn = 1),
adc AS (
  SELECT qid, vec_id,
         round(list_sum(list(qd2 ORDER BY codes.j)), 6) AS adc_d2
  FROM codes JOIN lut ON codes.j = lut.j AND codes.c = lut.c
  GROUP BY qid, vec_id
),
atop AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY adc_d2, vec_id) AS arn
    FROM adc
  ) WHERE arn <= 10
),
qv AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id IN (0, 1, 2)
),
exd AS (
  SELECT q.qid, e.vec_id,
         round(list_sum(list_transform(generate_series(1, 64),
               i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                     - CAST(q.qvec[CAST(i AS INT)] AS DOUBLE))
                  * (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                     - CAST(q.qvec[CAST(i AS INT)] AS DOUBLE)))), 6) AS d2
  FROM embeddings e, qv q
),
ex AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS ern
    FROM exd
  ) WHERE ern <= 10
),
hits AS (
  SELECT a.qid, count(*) AS n
  FROM atop a JOIN ex ON a.qid = ex.qid AND a.vec_id = ex.vec_id
  GROUP BY a.qid
)
SELECT q.qid, CAST(coalesce(n, 0) AS INT) AS n_hits,
       round(coalesce(n, 0) / 10.0, 6) AS recall_at_10
FROM qv q LEFT JOIN hits ON q.qid = hits.qid
""",
    doc="Recall@10 of PQ/ADC search vs the exact-L2 ground truth for "
    "3 query vectors (operators/similarity.py:pq_recall_eval) — the "
    "number an index owner tunes m/k_codes against; ann_recall_eval's "
    "PQ twin (on this unit-normalized corpus exact-L2 and "
    "exact-cosine rankings coincide). Batch ADC: |Q|·128-row LUT "
    "broadcast, ONE code-relation join, per-query row_number heap; "
    "ground truth one broadcast corpus pass; intersection a (qid, id) "
    "equi-join. Distance folds left-to-right over fixed component "
    "order on both engines.",
)
def q_pq_recall_eval(spark, sf_dir):
    return sim.pq_recall_eval(_t(spark, sf_dir, "embeddings"), [0, 1, 2])


@_q(
    "ann_topk_batch",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)
),
scored AS (
  SELECT q.qid, e.vec_id,
         round({cosine_sql('e.embedding', 'q.qv', _EMB_DIM)}, 6) AS score
  FROM embeddings e, q
)
SELECT qid, vec_id, score FROM (
  SELECT qid, vec_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 5
""",
    doc="Batch ANN serving: top-5 neighbors for every query vector in "
    "one corpus pass — broadcast query set + per-query row_number "
    "window (the queries ≪ corpus serving shape).",
)
def q_ann_topk_batch(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return sim.cosine_topk_batch(emb, qset, k=5)


@_q(
    "ann_ivf_topk",
    f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cent AS (
  SELECT label AS cell, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
  GROUP BY 1, 2
),
cvec AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM cent GROUP BY cell
),
probe AS (
  SELECT cell FROM cvec, q
  ORDER BY {cosine_sql('centroid', 'qv', _EMB_DIM)} DESC, cell
  LIMIT 2
)
SELECT vec_id, round({cosine_sql('embedding', 'qv', _EMB_DIM)}, 6) AS score
FROM embeddings, probe, q
WHERE label = probe.cell
ORDER BY score DESC, vec_id
LIMIT 10
""",
    doc="IVF-style ANN: label-coarse centroids (means rounded to 6dp "
    "so both engines train identical centroids), probe the 2 nearest "
    "cells, exact cosine rerank inside — the pruned-scan scale path.",
)
def q_ann_ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumnRenamed("label", "cell")
    cents = sim.train_centroids_by_label(
        _t(spark, sf_dir, "embeddings"), "label", "embedding"
    )
    emb, qv = _empty_if_no_query(emb, _query_vec(spark, sf_dir))
    return sim.ivf_topk(emb, cents, qv, k=10, nprobe=2)


