"""Empty-input contract (round 13).

At 100 TB an upstream filter can legitimately drop EVERY row before
any operator runs; a stage that crashes on an empty relation (ANSI
0/0, driver-side .first()[0] on None, seed/query lookups) takes the
whole pipeline down. The contract, pinned here on an all-empty
fixture with the production schemas:

- Pure-relational pipelines return EMPTY or NULL-padded results with
  their normal schema — never raise (SQL division semantics: 0/0 is
  NULL, sum over nothing is NULL, count is 0).
- Data-derived-parameter lookups (ANN query ids, kmeans seeds,
  personalized-pagerank seeds) return empty results when the CORPUS
  is empty; their informative errors are reserved for nonempty inputs
  that genuinely mis-reference (typo'd id ≠ empty table).

The full 341-query empty sweep ran green in round 13 except the two
cube/rollup () grand-total rows — CLOSED in round 14 by
aggregates.empty_grand_total (a limit(1)-gated fallback union, so the
empty sweep now has zero residuals); this file keeps the fixed crash
classes from regressing without re-running the whole sweep.
"""

import duckdb
import pytest

from conftest import SF_DIR  # noqa: F401  (sys.path side effect)

from yelp_data_pipeline_spark import TABLES

# One representative per fixed crash class (18 crashes fixed in r13).
REPRESENTATIVES = [
    "kmv_distinct_events",          # rel_err 0/0 under ANSI
    "pagerank_supplier_graph",      # scale // 0 nodes on driver
    "personalized_pagerank_nation", # seed-vs-empty-graph distinction
    "pq_adc_topk",                  # query ids vs empty corpus
    "ann_topk_cosine",              # .first() query vector on None
    "kmeans_assignments",           # seed init on empty input
    "detect_parse_json_props",      # detector sample on empty
    "corpus_health_report",         # per-count pane ratios
    "dedup_threshold_curve",        # rate spine over empty corpus
    "benford_price_conformity",     # chi/dev terms at n = 0
    "event_changepoint_cusum",      # spurious all-NULL global-agg row
    "event_value_ks_drift",         # same class, KS statistic
    "simhash_recall_eval",          # NULL counts vs COUNT-like 0s
    "embedding_principal_component",# 0.0-vs-NULL spectrum fold
    "pretraining_data_report",      # every pane ratio guarded
    "priority_status_cube",         # () grand-total row on empty (r14)
    "priority_status_rollup",       # () grand-total row on empty (r14)
]


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{SF_DIR}/{t}.parquet' LIMIT 0) "
            f"TO '{d}/{t}.parquet' (FORMAT parquet)"
        )
    return str(d)


@pytest.mark.parametrize("name", REPRESENTATIVES)
def test_empty_input_never_crashes(spark, empty_sf_dir, name):
    from yelp_data_pipeline_spark import queries as Q

    fn = {s.name: s.fn for s in Q.registry()}[name]
    rows = fn(spark, empty_sf_dir).collect()  # must not raise
    assert isinstance(rows, list)


def test_missing_query_id_still_raises_on_nonempty(spark):
    """The empty-corpus path must NOT have swallowed the informative
    mis-reference errors: a nonempty corpus that lacks the requested
    query id still raises."""
    from yelp_data_pipeline_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(5, [float(i) for i in range(64)])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="not present in the corpus"):
        sim.pq_adc_topk_batch(emb, query_ids=[999]).collect()


def test_mis_keyed_kmeans_still_raises_on_nonempty(spark):
    from yelp_data_pipeline_spark.operators import similarity as sim

    emb = spark.createDataFrame(
        [(100, [float(i) for i in range(64)])],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="seed vectors"):
        sim.kmeans_centroids(emb, k=4).collect()


# ---- single-row (degenerate-statistics) contract, round 13 ----------------

SINGLE_ROW_REPRESENTATIVES = [
    "price_quantity_corr",        # zero variance -> NULL corr
    "price_quantity_spearman",    # zero rank variance -> NULL rho
    "dedup_cluster_rand_index",   # n*(n-1) = 0 pairs -> NULL indices
    "zorder_file_stats",          # degenerate min==max bounds
    "event_value_ranksum_drift",  # one-sided cutoff -> NULL auc/z
    "event_value_ks_drift",       # one-sided cutoff -> NULL d
    "event_value_cohens_d",       # empty side -> NULL mean/effect
    "cross_source_dup_matrix",    # single-doc source: 0 possible pairs
    "mixture_resampled_docs",     # absent targeted source -> empty (strict)
]


@pytest.fixture(scope="module")
def single_row_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_one")
    for t in TABLES:
        duckdb.sql(
            f"COPY (SELECT * FROM '{SF_DIR}/{t}.parquet' ORDER BY 1 LIMIT 1) "
            f"TO '{d}/{t}.parquet' (FORMAT parquet)"
        )
    return str(d)


@pytest.mark.parametrize("name", SINGLE_ROW_REPRESENTATIVES)
def test_single_row_never_crashes(spark, single_row_sf_dir, name):
    """One row is the degenerate-statistics regime (zero variance,
    zero pairs, one-sided cutoffs, min == max bounds) — a real shape
    for a tiny source or a heavily filtered slice; the contract is
    NULL statistics via SQL 0/0 semantics, never an ANSI crash."""
    from yelp_data_pipeline_spark import queries as Q

    fn = {s.name: s.fn for s in Q.registry()}[name]
    rows = fn(spark, single_row_sf_dir).collect()  # must not raise
    assert isinstance(rows, list)


def test_cube_rollup_emit_grand_total_row_on_empty(spark, empty_sf_dir):
    """SQL semantics for CUBE/ROLLUP over an EMPTY relation: exactly
    the () grand-total grouping-set row (keys NULL, COUNT 0, SUM
    NULL). Spark's cube/rollup emit nothing; the r14
    aggregates.empty_grand_total fallback restores the row."""
    from yelp_data_pipeline_spark import queries as Q

    fns = {s.name: s.fn for s in Q.registry()}
    for name in ("priority_status_cube", "priority_status_rollup"):
        rows = fns[name](spark, empty_sf_dir).collect()
        assert [tuple(r) for r in rows] == [(None, None, 0, None)], name


# ---- all-ties (degenerate-VALUE) contract, round 14 -----------------------

TIES_REPRESENTATIVES = [
    "packed_boundary_loss_stats",  # 0 causal pairs -> fraction 0, not ANSI 0/0
    "corpus_zipf_fit",             # one-distinct-word OLS denominator 0 -> NULL
    "corpus_health_report",        # same class via its zipf pane
    "detect_parse_json_props",     # detector finds nothing on valueless corpus
    "json_extract_props",          # '' props -> NULL k (oracle NULLIF twin)
    "winnowing_fingerprints",      # unshingleable doc -> '' serialization
    "bpe_encoded_token_counts",    # fewer-than-`merges` learnable rules
]


@pytest.fixture(scope="module")
def ties_sf_dir(tmp_path_factory):
    """Two rows per table: DISTINCT keys (leading column +1), identical
    values otherwise — zero variance at n > 1, exact-dup content,
    single-token text, empty JSON props. Built by the same helper the
    degenerate gate sweeps (tools/check_degenerate.py)."""
    import os
    import sys

    sys.path.insert(
        0,
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "tools"),
    )
    from check_degenerate import _build_fixture

    d = tmp_path_factory.mktemp("sf_ties")
    _build_fixture(SF_DIR, str(d), "ties")
    return str(d)


@pytest.mark.parametrize("name", TIES_REPRESENTATIVES)
def test_all_ties_never_crashes(spark, ties_sf_dir, name):
    """Degenerate VALUES (not row counts) are the third contract shape
    — the regime that hid the packing ANSI 0/0 from the r13 gate."""
    from yelp_data_pipeline_spark import queries as Q

    fn = {s.name: s.fn for s in Q.registry()}[name]
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = fn(spark, ties_sf_dir).collect()  # must not raise
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert isinstance(rows, list)
