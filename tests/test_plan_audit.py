"""Physical-plan regression guards: the properties that make queries
scale (pushdown, broadcast, top-k heaps, no unbounded nested loops)
are ASSERTED here, not just eyeballed in tools/audit_plans.py. A
regression that silently turns a bucketed join into a cartesian, or
drops a parquet filter pushdown, fails the suite.
"""

import importlib.util
import sys

sys.path.insert(0, "/root/repo/tools")

from yelp_data_pipeline_spark.queries import queries

from conftest import SF_DIR


def _auditor():
    spec = importlib.util.spec_from_file_location(
        "audit_plans", "/root/repo/tools/audit_plans.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_no_dangerous_nested_loops_in_representative_plans(spark):
    ap = _auditor()
    qs = queries()
    for name in [
        "top_regions_by_orders",      # star join chain
        "dedup_minhash_pairs",        # LSH band join
        "shipping_priority_top10",    # TPC-H Q3 shape
        "duplicate_substring_spans",  # round-7 gram join
        "nation_theil_sen_trend",     # pair-sampled slopes
        "hll_users_by_event_type",    # grouped sketch
        "dedup_corpus_lines",         # round-8 line-hash join
        "domain_capped_docs",         # round-8 broadcast suffix chain
        "contamination_spans",        # round-8 eval-gram semi-join
    ]:
        a = ap.audit(name, qs[name](spark, SF_DIR))
        assert not a["nested_loop"], f"{name}: unbounded nested loop"


def test_filter_pushdown_reaches_parquet_scan(spark):
    ap = _auditor()
    qs = queries()
    a = ap.audit("filtered_lineitems", qs["filtered_lineitems"](spark, SF_DIR))
    assert a["pushed_filters"] >= 1, "predicate did not reach the scan"


def test_topk_uses_heap_not_global_sort(spark):
    ap = _auditor()
    qs = queries()
    for name in ["top_regions_by_orders", "shipping_priority_top10"]:
        a = ap.audit(name, qs[name](spark, SF_DIR))
        assert a["takeordered"], f"{name}: top-k fell back to a global sort"


def test_star_join_broadcasts_dims(spark):
    ap = _auditor()
    qs = queries()
    a = ap.audit("top_regions_by_orders", qs["top_regions_by_orders"](spark, SF_DIR))
    assert a["broadcasts"] >= 1, "dim chain not broadcast"


def test_sampled_cross_and_limit_bounded_recognitions(spark):
    """Round-8 auditor categories: the eval's brute-force side must
    read as 'sampled-cross' (md5-residue filter visible on the
    broadcast build side), and a literal limit(n) build side
    (hard-negative anchors) must count as plan-proven bounded — both
    previously printed NESTED-LOOP!."""
    ap = _auditor()
    qs = queries()

    a = ap.audit(
        "simhash_recall_eval", qs["simhash_recall_eval"](spark, SF_DIR)
    )
    assert not a["nested_loop"], "eval brute side flagged as dangerous"
    assert a["sampled_cross"], "md5-residue sample filter not recognized"

    b = ap.audit(
        "hard_negative_pairs", qs["hard_negative_pairs"](spark, SF_DIR)
    )
    assert not b["nested_loop"], "limit-bounded anchor frame flagged"
    assert b["onerow_cross"], "literal limit build side not recognized"


def test_reused_exchange_build_side_classified_by_original(spark):
    """r18: AQE serves the second and third nprobe arms' routing
    crossJoin from exchange REUSE of the checkpointed-centroid
    broadcast — the build side prints as a bare `ReusedExchange
    [plan_id=N]` pointer, which used to fail every exemption matcher
    and flag the row as a dangerous nested loop. The auditor now
    inlines the referenced original exchange's subtree (a reused
    exchange IS its original) before classifying."""
    ap = _auditor()
    qs = queries()
    a = ap.audit(
        "ivf_nprobe_recall_curve",
        qs["ivf_nprobe_recall_curve"](spark, SF_DIR),
    )
    assert not a["nested_loop"], "reused checkpoint broadcast flagged"
    assert a["ckpt_cross"], "checkpointed centroid build not recognized"


def test_tpch_analog_plans_are_clean(spark):
    """The TPC-H analog set (round-8 additions + the round-5/6
    originals they complement): no dangerous nested loops anywhere;
    the Q21 reformulation keeps its heap top-k."""
    ap = _auditor()
    qs = queries()
    for name in [
        "customer_order_count_distribution",
        "small_quantity_order_revenue",
        "large_volume_customers",
        "sole_late_suppliers",
        "part_supplier_diversity",
        "dominant_share_suppliers",
        "incremental_event_state_merge",
    ]:
        a = ap.audit(name, qs[name](spark, SF_DIR))
        assert not a["nested_loop"], f"{name}: unbounded nested loop"
    a = ap.audit(
        "sole_late_suppliers", qs["sole_late_suppliers"](spark, SF_DIR)
    )
    assert a["takeordered"], "Q21 top-k fell back to a global sort"
