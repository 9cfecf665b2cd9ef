"""Benchmark harness — driver contract.

Runs the headline queries at ``$SPARK_GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE
machine-parseable JSON line:

    {"metric": "headline_total", "value": <sum sec>, "unit": "sec",
     "queries": {"q": sec, ...}, "sf": 0.1}

Each query is materialized with the no-op sink (full execution, every
row produced, nothing collected to the driver) — the closest local
proxy for cluster throughput. A JIT warm-up pass runs first so timings
measure the plan, not JVM/codegen warm-up.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from yelp_data_pipeline_spark.queries import queries  # noqa: E402
from yelp_data_pipeline_spark.session import get_spark, release_tracked  # noqa: E402

# Headline set: the most expensive representative per operator family
# (agg, star join, LSH dedup, shingle join, sessionization, ANN).
HEADLINE = [
    "pricing_summary",
    "top_regions_by_orders",
    "dedup_minhash_pairs",
    "dedup_ngram_pairs",
    "user_sessions",
    "simhash_near_pairs",
    "ann_topk_cosine",
    "embedding_neardup_pairs",
    "asof_latest_order",
    "event_pairs_within_5s",
]

# Timed and reported alongside, but EXCLUDED from headline_total so the
# 2×-gate series stays comparable with the round-2 standing numbers.
EXTRAS = [
    "doc_repetition_stats",
    "chunked_documents",
    "packed_sequences",
    "decontaminated_docs",
    "curated_documents",
    "winnowing_fingerprints",
    "order_price_rank_scalable",
    "scd2_order_status_history",
    "kmeans_assignments",
    "fuzzy_dup_pairs",
    # round 6
    "bpe_merged_vocab",
    "nation_market_share",
    "min_cost_part_supplier",
    "multimodal_decode_meta",
    "supplier_knn_triangles",
    "frequent_part_pairs",
    "cms_heavy_user_hitters",
    "nation_revenue_trend",
    "supplier_kcore",
    "pq_encoded_embeddings",
    "customer_linkage_scores",
    "event_value_drift",
    "adaptive_quality_survivors",
    "corpus_diversity_by_source",
    "doc_novelty_scores",
    "cdc_chunked_documents",
    "hourly_value_isotonic_fit",
    # round 7
    "duplicate_substring_spans",
    "unigram_lm_piece_scores",
    "nation_theil_sen_trend",
    "perceptron_quality_gate",
    "embedding_principal_component",
    "hll_users_by_event_type",
    # round 8
    "contamination_spans",
    "canonical_url_dedup",
    "domain_mixture_stats",
    "domain_capped_docs",
    "price_histogram_quantiles",
    "kmv_daily_user_merge",
    "jl_distortion_pairs",
    "dedup_corpus_lines",
    "hard_negative_pairs",
    "daily_seasonal_decomposition",
    "event_changepoint_cusum",
    "docs_embeddings_integrity",
    "local_supplier_volume",
    "returned_items_top_customers",
    "whitened_embedding_sample",
    "event_user_skew_report",
    "nation_market_share_by_year",
    "simhash_recall_eval",
    "sole_late_suppliers",
    "incremental_event_state_merge",
    "curation_funnel_by_source",
    "event_value_histogram_merge",
    "hll_daily_user_merge",
    "cms_daily_user_merge",
    # round 9
    "benford_price_audit",
    "priority_status_association",
    "customer_spend_gini",
    "distinctive_terms_by_source",
    "event_value_ranksum_drift",
    "daily_event_acf",
    "dedup_cluster_rand_index",
    "quality_rate_confidence",
    "event_value_psi",
    "event_value_median_ci",
    "price_quantity_spearman",
    "quantity_discount_kendall",
    "corpus_zipf_fit",
    "readability_scores",
    "corpus_health_report",
    "event_type_burstiness",
    "supplier_graph_assortativity",
    # round 9, late additions
    "event_value_ks_drift",
    "daily_event_ewma",
    "customer_order_survival",
    "priority_status_cramers_v",
    "nation_customer_hhi",
    "event_value_anova_f",
    "source_unigram_jsd",
    "quality_gate_kappa",
    "customer_name_edit_pairs",
    "event_value_cohens_d",
    "event_type_ranksum_scan",
    "vocab_chao1_richness",
    "event_transition_entropy",
    "price_quantity_partial_corr",
    "event_value_levene",
    "word_burstiness",
    "doc_length_moments",
    "supplier_graph_clustering",
    "nation_customer_pareto",
    "event_interarrival_burstiness",
    "event_value_quantile_shift",
    "centroid_margin_eval",
    "daily_count_hurst",
    "priority_status_mutual_info",
    "benford_price_conformity",
    "daily_count_runs_test",
    "tfidf_doc_similarity",
    "ann_rank_quality",
    "quality_score_auc",
    "quality_score_lift",
    "event_drift_report",
    "quality_score_calibration",
    "quality_score_brier",
    "event_value_wasserstein",
    "customer_golden_records",
    "event_type_wasserstein_scan",
    "supplier_bfs_hops",
    "prefix_dim_fidelity",
    "quantile_sketch_error",
    "split_leakage_audit",
    "fd_discovery_audit",
    "heavy_hitter_error_report",
    "hll_error_report",
    "hybrid_rrf_ranking",
    "ann_prefilter_vs_postfilter",
    "mmr_diversified_topk",
    "retrieval_health_report",
    # round 10
    "part_supplier_hits",
    "price_qty_discount_ols",
    "conformal_event_intervals",
    "quantile_normalized_doclens",
    "cross_source_dup_matrix",
    "dedup_composition_shift",
    "token_budget_allocation",
    "bloom_fpr_eval",
    "minhash_band_tuning_curve",
    "ivf_nprobe_recall_curve",
    "quality_score_lift_scalable",
    "layout_pruning_eval",
    "pretraining_data_report",
    "time_weighted_event_means",
    "int8_recall_eval",
    "image_dhash_fingerprints",
    "image_neardup_pairs",
    "audio_fingerprints",
    # round 11
    "span_surgery_docs",
    "image_neardup_pairs_mih",
    "contamination_direction_matrix",
    "multimodal_avi_decode",
    "video_frame_fingerprints",
    "video_neardup_pairs",
    "dedup_threshold_curve",
    "dedup_span_surgery_docs",
    # (pretraining_data_report already in the round-10 block; its
    # standing row now includes the multimodal dup columns)
    # round 12
    "image_neardup_pairs_mih_r8",
    "video_neardup_pairs_offset",
    "neardup_gate_quarantine",
    "modality_dup_matrix",
    "image_dhash_fingerprints_wide",
    "image_neardup_pairs_wide",
    "audio_neardup_pairs",
    "crossmodal_mismatch_pairs",
    "length_bucketed_packing_stats",
    "dedup_family_agreement",
    "tokenizer_fertility_by_source",
    # round 13
    "video_neardup_pairs_rate",
    "packed_assignments",
    "packed_boundary_loss_stats",
    "text_hashed_embeddings",
    "dedup_family_agreement_text",
    "semantic_dedup_survivors_text",
    "multimodal_curation_funnel",
    # round 14
    "curated_packed_assignments",
    # round 15 — the versioned-table (Delta-twin) replays: real disk
    # writes + manifest commits + time-travel reads, so they carry
    # write-path cost no other bench row has
    "orders_version_history",
    "orders_versioned_append_diff",
    "orders_incremental_agg_maintenance",
    # round 16 — partition-scoped MERGE (file-pruned rewrite), row-level
    # change feed, stats-based data skipping, catalog-table serving
    "orders_partitioned_merge",
    "orders_version_changes",
    "orders_pruned_date_scan",
    "sql_catalog_orders_rollup",
    # round 16 — file-pruned DML (Delta DELETE / UPDATE parity) and the
    # real Structured Streaming round trip through the Python Data
    # Source versioned streaming source (query startup dominates)
    "orders_file_pruned_delete",
    "orders_file_pruned_update",
    "orders_versioned_stream_roundtrip",
    "orders_dv_delete",
]


def _materialize(df) -> None:
    """Force full execution without a driver collect."""
    df.write.format("noop").mode("overwrite").save()


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = queries()

    # Warm-up: run the cheapest query once so classloading doesn't
    # land in the first warm-up pass.
    _materialize(qs["total_counts"](spark, sf_dir))

    # Protocol (v2, round 5): each query executes TWICE — an unmeasured
    # warm-up pass, then the measured pass on a freshly-built plan.
    # Single-shot timings were dominated by per-query whole-stage-
    # codegen JIT compilation (measured: minhash 8.1s first run, 1.8-
    # 2.5s every run after), which is a fixed per-plan cost that
    # amortizes to zero on any long-running job — steady-state
    # execution is what a 100 TB throughput comparison should measure.
    # Persisted relations are released after BOTH passes, so the
    # measured pass recomputes all data work. Caveat: beyond JVM code
    # caches, the warm-up pass also leaves parquet pages in the OS page
    # cache, so the measured pass is I/O-warm — cross-protocol ratios
    # against single-shot (v1) numbers must be labeled as such (see
    # BASELINE.md).
    # r18 ADDITIVE measurement split (driver round-17 PERF flagged the
    # scaling block as insensitive: at sf0.1 the per-query total is
    # dominated by fixed single-threaded DRIVER time — plan build +
    # analysis — which is identical at 8 and 32 cores, so c8/c32
    # ratios read ≈1 even though the executor work scales). Each
    # measured pass now ALSO records the execute-only wall time (from
    # the moment the DataFrame is built to the end of the noop write),
    # reported as extra "<name>#exec" entries next to the unchanged
    # totals. The timed region, protocol, and every existing entry are
    # byte-identical to r17 — the split only inserts a clock between
    # the two phases the old region already contained. Queries with
    # eager build-time arms (perceptron epochs, tuning curves, CC
    # fixpoints) legitimately keep that data work out of #exec; their
    # totals still carry it.
    timings: dict[str, float] = {}
    exec_timings: dict[str, float] = {}
    for name in HEADLINE + EXTRAS:
        _materialize(qs[name](spark, sf_dir))
        release_tracked()
        t0 = time.perf_counter()
        df = qs[name](spark, sf_dir)
        t_built = time.perf_counter()
        _materialize(df)
        t_done = time.perf_counter()
        timings[name] = round(t_done - t0, 3)
        exec_timings[name] = round(t_done - t_built, 3)
        # Operators persist multi-consumer relations; release between
        # queries so cached blocks don't accumulate across the run.
        release_tracked()

    all_timings = dict(timings)
    all_timings.update(
        {f"{n}#exec": exec_timings[n] for n in exec_timings}
    )
    out = {
        "metric": "headline_total",
        "value": round(sum(timings[n] for n in HEADLINE), 3),
        "unit": "sec",
        "queries": all_timings,
        "sf": sf,
    }
    print(json.dumps(out))
    # Full per-query map to a FILE as well: the driver's stdout tail
    # only preserves the last ~50 rows of the inline map, which made
    # round-over-round comparison of the full tail impossible
    # (VERDICT r13 "what's wrong" #4). Overwritten per run; the round
    # driver (or a human) snapshots it as BENCH_detail_r{n}.json.
    detail_path = os.environ.get(
        "SPARK_GRAFT_BENCH_DETAIL",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_detail.json"),
    )
    with open(detail_path, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
        f.write("\n")
    # The driver captures a bounded TAIL of stdout and parses the last
    # JSON line it sees; the full per-query map above can exceed that
    # window (every BENCH_r*.json through r10 recorded "parsed": null
    # because the tail started mid-JSON). Emit a compact summary line
    # LAST so the driver's parse always succeeds; the full map stays
    # above for humans and BASELINE.md.
    compact = {
        "metric": "headline_total",
        "value": out["value"],
        "unit": "sec",
        "sf": sf,
        "n_queries": len(timings),
        "queries": {
            **{n: timings[n] for n in HEADLINE},
            **{f"{n}#exec": exec_timings[n] for n in HEADLINE},
        },
    }
    print(json.dumps(compact))
    return 0


if __name__ == "__main__":
    sys.exit(main())
