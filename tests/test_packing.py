"""Sequence packing / split assignment / incremental dedup semantics."""

from yelp_data_pipeline_spark.operators.dedup import dedup_incremental
from yelp_data_pipeline_spark.operators.packing import pack_sequences, split_assign


def test_pack_sequences_offsets_and_cuts(spark):
    # one shard so the stream order is just doc_id order
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "d e"), (3, "f g h i")], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in pack_sequences(df, seq_len=4, n_shards=1).collect()
    }
    assert [rows[i]["start_offset"] for i in (1, 2, 3)] == [0, 3, 5]
    # doc 2 starts at offset 3 -> still pack 0; doc 3 at offset 5 -> pack 1
    assert [rows[i]["pack_id"] for i in (1, 2, 3)] == [0, 0, 1]
    assert all(rows[i]["shard"] == 0 for i in (1, 2, 3))


def test_pack_sequences_shard_streams_independent(spark):
    df = spark.createDataFrame(
        [(i, "w " * 5) for i in range(40)], "doc_id long, text string"
    )
    out = pack_sequences(df, seq_len=16, n_shards=4).collect()
    # within every shard, offsets are the exclusive prefix sums of 6-token docs
    by_shard: dict = {}
    for r in sorted(out, key=lambda r: (r["shard"], r["doc_id"])):
        nxt = by_shard.get(r["shard"], 0)
        assert r["start_offset"] == nxt
        by_shard[r["shard"]] = nxt + r["n_tokens"]
    assert len(by_shard) > 1  # hash actually spreads across shards


def test_split_assign_deterministic_and_partitioned(spark):
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = {r["doc_id"]: r["split"] for r in split_assign(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in split_assign(df.repartition(7), "doc_id").collect()}
    assert a == b  # layout-independent
    counts = {s: list(a.values()).count(s) for s in ("train", "val", "test")}
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]
    assert sum(counts.values()) == 2000  # every row labeled


def test_dedup_incremental_filters_seen_and_batch_dups(spark):
    seen = spark.createDataFrame([(1, "Known Doc!")], "doc_id long, text string")
    incoming = spark.createDataFrame(
        [
            (10, "known doc"),      # normalizes to the seen fingerprint
            (11, "fresh content"),
            (12, "fresh   CONTENT"),  # same normalized fp as 11 -> min id wins
        ],
        "doc_id long, text string",
    )
    out = dedup_incremental(incoming, seen).collect()
    assert [(r["doc_id"],) for r in out] == [(11,)]


def test_cluster_keyed_split_never_separates_near_dups(spark):
    from pyspark.sql import functions as F

    from yelp_data_pipeline_spark.operators import packing as pk

    # Clusters with multiple members (near-dup groups) + singletons.
    clusters = spark.createDataFrame(
        [(i, i % 5) for i in range(50)], "doc_id long, cluster_id long"
    )
    out = pk.split_assign(clusters, key_col="cluster_id")
    per_cluster = (
        out.groupBy("cluster_id")
        .agg(F.count_distinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_cluster)


def test_boundary_stats_one_token_doc_is_ansi_safe(spark):
    """A bucket whose every pack holds a single <=1-token doc has zero
    causal (query, key) pairs — the crossdoc fraction is 0 by
    convention, never an ANSI DIVIDE_BY_ZERO (the harness grades with
    SPARK_GRAFT_ANSI=true) and never a NULL-vs-NaN oracle drift."""
    from yelp_data_pipeline_spark.operators.packing import (
        length_bucketed_packing,
        packing_boundary_stats,
    )

    df = spark.createDataFrame([(1, "hello")], "doc_id long, text string")
    asg = length_bucketed_packing(df, context=128, bucket_step=16, n_shards=8)
    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        rows = packing_boundary_stats(asg, context=128).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)
    assert len(rows) == 1
    assert rows[0]["n_docs"] == 1
    assert rows[0]["crossdoc_pair_frac"] == 0.0
