"""Connected components, deterministic sampling, and the new text ops
(TF-IDF / PII scrub / inverted index / curation composite)."""

from pyspark.sql import functions as F

from yelp_data_pipeline_spark.operators import graph, sampling as smp
from yelp_data_pipeline_spark.operators import textops as tx


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = graph.connected_components(df, "doc_a", "doc_b")
    return {r["node"]: r["cluster"] for r in out.collect()}


def test_cc_chain_star_disjoint(spark):
    # chain 1-2-3-4 (diameter > 1 round), star 10-{11,12,13}, pair 20-21
    labels = _cc(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)],
    )
    assert labels == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10, 12: 10, 13: 10,
        20: 20, 21: 20,
    }


def test_cc_long_chain_converges(spark):
    # 12-node chain: worst-case diameter for hash-min propagation.
    labels = _cc(spark, [(i, i + 1) for i in range(100, 112)])
    assert set(labels.values()) == {100}
    assert len(labels) == 13


def test_dedup_clusters_labels_all_docs_and_survivors(spark):
    docs = spark.createDataFrame([(i,) for i in range(1, 8)], "doc_id long")
    pairs = spark.createDataFrame([(2, 5), (5, 7)], "doc_a long, doc_b long")
    clusters = graph.dedup_clusters(docs, pairs)
    got = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    assert got == {1: 1, 2: 2, 3: 3, 4: 4, 5: 2, 6: 6, 7: 2}
    surv = {r["doc_id"]: r["n_members"] for r in graph.dedup_survivors(clusters).collect()}
    assert surv == {1: 1, 2: 3, 3: 1, 4: 1, 6: 1}


def test_hash_sample_deterministic_and_disjoint_salts(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "k")
    a = {r["k"] for r in smp.hash_sample(df, "k", 0.2, salt="s1").collect()}
    b = {r["k"] for r in smp.hash_sample(df, "k", 0.2, salt="s1").collect()}
    c = {r["k"] for r in smp.hash_sample(df, "k", 0.2, salt="s2").collect()}
    assert a == b  # rerun-stable
    assert a != c  # independent draw per salt
    assert 0.15 < len(a) / 2000 < 0.25  # rate in the right ballpark
    # nested property: a 10% sample with the same salt is a subset
    sub = {r["k"] for r in smp.hash_sample(df, "k", 0.1, salt="s1").collect()}
    assert sub <= a


def test_stratified_rates(spark):
    rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(2000)]
    df = spark.createDataFrame(rows, "k long, lang string")
    out = smp.stratified_hash_sample(
        df, "k", "lang", {"en": 0.05, "zh": 0.8}, default_fraction=0.0
    )
    by_lang = {
        r["lang"]: r["cnt"]
        for r in out.groupBy("lang").agg(F.count("*").alias("cnt")).collect()
    }
    assert 20 <= by_lang["en"] <= 90  # ~50 of 1000
    assert 720 <= by_lang["zh"] <= 880  # ~800 of 1000


def test_scrub_pii_replaces_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@corp.example.com or call +1 (555) 123-4567"),
            (2, "see https://example.com/a?b=1 and http://foo.bar twice"),
            (3, "nothing sensitive here"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in tx.scrub_pii(df, "doc_id", "text").collect()}
    assert "<EMAIL>" in out[1]["scrubbed_text"]
    assert "<PHONE>" in out[1]["scrubbed_text"]
    assert out[1]["n_emails"] == 1 and out[1]["n_phones"] == 1
    assert out[2]["n_urls"] == 2
    assert "@" not in out[1]["scrubbed_text"]
    assert out[3]["scrubbed_text"] == "nothing sensitive here"


def test_tfidf_rare_term_outranks_common(spark):
    df = spark.createDataFrame(
        [
            (1, "alpha beta common common"),
            (2, "gamma beta common"),
            (3, "delta common common beta"),
        ],
        "doc_id long, text string",
    )
    out = tx.tfidf_top_terms(df, "doc_id", "text", top_n=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # the doc-unique term beats terms shared across all docs
    assert top == {1: "alpha", 2: "gamma", 3: "delta"}
    # idf of an everywhere-term is ln(1) = 0
    all_rows = tx.tfidf_top_terms(df, "doc_id", "text", top_n=10).collect()
    assert all(r["tfidf"] == 0.0 for r in all_rows if r["term"] in ("common", "beta"))


def test_inverted_index_postings_sorted_capped(spark):
    df = spark.createDataFrame(
        [(i, "shared unique%d" % i) for i in range(30)], "doc_id long, text string"
    )
    out = {r["term"]: r for r in tx.inverted_index(df, "doc_id", "text", min_df=2, max_postings=5).collect()}
    assert list(out) == ["shared"]  # hapaxes dropped
    assert out["shared"]["df"] == 30
    assert out["shared"]["postings"] == [0, 1, 2, 3, 4]  # sorted, capped


def test_pivot_missing_combo_is_zero_and_unpivot_roundtrip(spark):
    from yelp_data_pipeline_spark.operators import aggregates as agg

    df = spark.createDataFrame(
        [("hi", "F"), ("hi", "F"), ("lo", "O")], "prio string, status string"
    )
    wide = agg.pivot_counts(df, "prio", "status", ["F", "O", "P"])
    rows = {r["prio"]: r for r in wide.collect()}
    assert rows["hi"]["cnt_f"] == 2 and rows["hi"]["cnt_o"] == 0  # NULL→0
    assert rows["lo"]["cnt_p"] == 0
    long = agg.unpivot_counts(wide, "prio", ["F", "O", "P"])
    got = {(r["prio"], r["status"]): r["cnt"] for r in long.collect()}
    assert got[("hi", "F")] == 2 and got[("hi", "P")] == 0 and len(got) == 6


def test_cc_raises_when_max_iter_exhausted(spark):
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 9)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(chain, "doc_a", "doc_b", max_iter=1)


def _cc_star(spark, edges):
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out = graph.connected_components_star(df, "doc_a", "doc_b")
    got = {r["node"]: r["cluster"] for r in out.collect()}
    from yelp_data_pipeline_spark.session import release_tracked

    release_tracked()
    return got


def test_star_cc_matches_hashmin_on_mixed_graph(spark):
    edges = [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (10, 13), (20, 21)]
    assert _cc_star(spark, edges) == _cc(spark, edges)


def test_star_cc_handles_chain_beyond_hashmin_budget(spark):
    import pytest

    # 60-node chain: diameter 59. Hash-min needs 59 rounds (default
    # max_iter=25 raises); alternating star needs ~log2(60).
    chain = [(i, i + 1) for i in range(100, 160)]
    df = spark.createDataFrame(chain, "doc_a long, doc_b long")
    with pytest.raises(RuntimeError, match="did not converge"):
        graph.connected_components(df, "doc_a", "doc_b")
    labels = _cc_star(spark, chain)
    assert set(labels.values()) == {100}
    assert len(labels) == 61


def test_mixture_resampling_hits_target_proportions(spark):
    # 1000 web, 300 code, 50 books; targets 50/30/20. books is the
    # binding source: T = 50/0.2 = 250 -> keep 125 web, 75 code, all 50.
    rows = (
        [(i, "web") for i in range(1000)]
        + [(1000 + i, "code") for i in range(300)]
        + [(1300 + i, "books") for i in range(50)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = smp.resample_to_mixture(
        df, "doc_id", "source", {"web": 0.5, "code": 0.3, "books": 0.2}
    )
    got = {r["source"]: r["cnt"] for r in
           out.groupBy("source").agg(F.count(F.lit(1)).alias("cnt")).collect()}
    # Binding source kept whole; others within hash-sampling tolerance.
    assert got["books"] == 50
    assert abs(got["web"] - 125) <= 30
    assert abs(got["code"] - 75) <= 25


def test_weighted_sample_extremes(spark):
    df = spark.createDataFrame(
        [(i, 1.0) for i in range(50)] + [(100 + i, 0.0) for i in range(50)],
        "doc_id long, wgt double",
    )
    kept = smp.weighted_hash_sample(df, "doc_id", "wgt").collect()
    ids = {r["doc_id"] for r in kept}
    assert all(i < 100 for i in ids)      # weight-0 rows never survive
    assert len(ids) == 50                 # weight-1 rows always survive


def test_cc_rejects_nonpositive_max_iter(spark):
    import pytest

    df = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="max_iter"):
        graph.connected_components(df, "doc_a", "doc_b", max_iter=0)


def test_mixture_resampling_absent_source_yields_empty(spark):
    # A targeted source with zero corpus rows binds T to 0: the only
    # corpus honoring the requested mixture is the empty one — the
    # proportions must NOT silently renormalize over present sources.
    rows = [(i, "web") for i in range(100)] + [(100 + i, "code") for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = smp.resample_to_mixture(
        df, "doc_id", "source", {"web": 0.5, "code": 0.3, "books": 0.2}
    )
    assert out.count() == 0


def test_temperature_weights_upsamples_rare_source(spark):
    from yelp_data_pipeline_spark.operators.sampling import temperature_weights

    rows = [("big", 10_000), ("big", 6_000), ("small", 100)]
    df = spark.createDataFrame(rows, "source string, n_units long")
    got = {r["source"]: r for r in
           temperature_weights(df, "source", F.col("n_units")).collect()}
    assert got["big"]["n_units"] == 16_000 and got["small"]["n_units"] == 100
    # shares each sum to ~1
    assert abs(got["big"]["raw_share"] + got["small"]["raw_share"] - 1.0) < 1e-5
    assert abs(got["big"]["temp_share"] + got["small"]["temp_share"] - 1.0) < 1e-5
    # sqrt scaling damps the dominant source, raises the rare one
    assert got["big"]["rate_mult"] < 1.0 < got["small"]["rate_mult"]
    # T=2 exact ratio: temp_share(small) = sqrt(100)/(sqrt(16000)+sqrt(100))
    import math
    expect = math.sqrt(100) / (round(math.sqrt(16000), 6) + 10.0)
    assert abs(got["small"]["temp_share"] - expect) < 1e-5


def test_curriculum_order_stages_and_positions(spark):
    from yelp_data_pipeline_spark.operators.sampling import curriculum_order

    df = spark.createDataFrame(
        [(i, float(100 - i)) for i in range(40)], "doc_id long, score double"
    )
    out = curriculum_order(df, "doc_id", "score", stages=4).collect()
    assert len(out) == 40
    by_stage = {}
    for r in out:
        by_stage.setdefault(r["stage"], []).append(r)
    # 4 balanced stages; best scores (lowest ids) land in stage 1
    assert sorted(by_stage) == [1, 2, 3, 4]
    assert all(len(v) == 10 for v in by_stage.values())
    assert {r["doc_id"] for r in by_stage[1]} == set(range(10))
    # positions are a permutation of 1..10 and not the sorted id order
    for s, rows in by_stage.items():
        assert sorted(r["stage_pos"] for r in rows) == list(range(1, 11))
    # determinism across recomputation
    again = curriculum_order(df, "doc_id", "score", stages=4).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_global_shuffle_shards_deterministic_partition(spark):
    from yelp_data_pipeline_spark.operators.sampling import global_shuffle_shards

    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    out = global_shuffle_shards(df, "doc_id", n_shards=8).collect()
    assert len(out) == 200
    shards = {}
    for r in out:
        assert 0 <= r["shard"] < 8
        shards.setdefault(r["shard"], []).append(r["shard_pos"])
    # every shard's positions are contiguous from 1
    for poss in shards.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    # repartitioning the input must not change any assignment
    again = global_shuffle_shards(df.repartition(13), "doc_id", n_shards=8).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_mixture_zero_count_source_yields_empty_not_crash(spark):
    """A targeted source with no corpus rows drives T to 0: the result
    is EMPTY (the only corpus honoring the mixture), and under an ANSI
    session the zero-count source's own 0/0 rate row must be guarded,
    not crash the job."""
    from yelp_data_pipeline_spark.operators.sampling import (
        resample_to_mixture,
    )

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame(
            [(i, "web") for i in range(20)], ["doc_id", "source"]
        )
        out = resample_to_mixture(
            df, "doc_id", "source", {"web": 0.5, "code": 0.5}
        )
        assert out.count() == 0
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)

    import pytest

    with pytest.raises(ValueError, match="non-empty"):
        resample_to_mixture(df, "doc_id", "source", {})
    with pytest.raises(ValueError, match="> 0"):
        resample_to_mixture(df, "doc_id", "source", {"web": 0.0})


def test_priority_sample_unbiased_total_and_small_table(spark):
    """Priority sampling invariants: (1) a table with <= k positive
    rows is returned whole with est_weight == weight (tau absent);
    (2) for k < n the HT total sum(est_weight) approximates the true
    weight total; (3) zero/negative weights never sampled."""
    from yelp_data_pipeline_spark.operators.sampling import priority_sample

    small = spark.createDataFrame(
        [(1, 5.0), (2, 3.0), (3, 0.0), (4, -2.0)], ["id", "w"]
    )
    got = {
        r["id"]: (r["weight"], r["est_weight"])
        for r in priority_sample(small, "id", "w", k=10).collect()
    }
    assert got == {1: (5.0, 5.0), 2: (3.0, 3.0)}

    big = spark.createDataFrame(
        [(i, float(1 + i % 13)) for i in range(400)], ["id", "w"]
    )
    rows = priority_sample(big, "id", "w", k=64).collect()
    assert len(rows) == 64
    true_total = sum(1 + i % 13 for i in range(400))
    est_total = sum(r["est_weight"] for r in rows)
    # HT estimator: unbiased; for this size the realized estimate
    # lands within ~25% of truth (deterministic given the hash).
    assert abs(est_total - true_total) / true_total < 0.25
