"""Scale-technique demonstrations: salting, bucketed co-located joins,
binned range joins, stateful streaming — each asserted on PLAN SHAPE
as well as results, since the plan is the point."""

import pyspark.sql.functions as F

from yelp_data_pipeline_spark.operators.aggregates import salted_group_count
from yelp_data_pipeline_spark.operators.joins import range_join_binned
from yelp_data_pipeline_spark.streaming import windows as sw
from yelp_data_pipeline_spark.streaming.state import running_counts_stateful

from conftest import SF_DIR


def test_salted_group_count_matches_plain(spark):
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    plain = {
        (r["o_orderpriority"], r["cnt"])
        for r in df.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    salted = {
        (r["o_orderpriority"], r["cnt"])
        for r in salted_group_count(df, ["o_orderpriority"], salt_buckets=8).collect()
    }
    assert salted == plain


def test_range_join_binned_no_nested_loop(spark):
    ev = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00"), (2, "2020-01-01 00:00:03"),
         (3, "2020-01-01 00:00:10"), (4, "2020-01-01 00:01:00")],
        "id long, ts string",
    ).withColumn("ts", F.to_timestamp("ts"))
    a = ev.select(F.col("id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = ev.select(F.col("id").alias("id_b"), F.col("ts").alias("ts_b"))
    joined = range_join_binned(a, b, "ts_a", "ts_b", 5, ["id_a"], ["id_b"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    got = sorted((r["id_a"], r["id_b"]) for r in joined.collect())
    assert got == [(1, 2)]  # 3 is 7s from 2 and 10s from 1; 4 is alone


def test_range_join_no_duplicate_pairs(spark):
    # same-timestamp rows sit in one bucket; neighbor explosion must
    # still yield each qualifying pair exactly once
    ev = spark.createDataFrame(
        [(i, "2020-01-01 00:00:01") for i in range(4)], "id long, ts string"
    ).withColumn("ts", F.to_timestamp("ts"))
    a = ev.select(F.col("id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = ev.select(F.col("id").alias("id_b"), F.col("ts").alias("ts_b"))
    joined = range_join_binned(a, b, "ts_a", "ts_b", 5, ["id_a"], ["id_b"]).filter(
        F.col("id_a") < F.col("id_b")
    )
    assert joined.count() == 6  # C(4,2), no duplicates


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    # co-located join: both sides bucketed+sorted on the key → the
    # sort-merge join reads pre-bucketed files with NO Exchange
    df = spark.read.parquet(f"{SF_DIR}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")
    (df.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("bt_a"))
    (df.write.bucketBy(8, "o_custkey").sortBy("o_custkey").saveAsTable("bt_b"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("bt_a").join(spark.table("bt_b"), "o_custkey")
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan, "bucketing must avoid the shuffle"
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")
        spark.sql("DROP TABLE IF EXISTS bt_a")
        spark.sql("DROP TABLE IF EXISTS bt_b")


def test_stateful_running_counts_stream(spark, tmp_path):
    stream = sw.stream_events_from_parquet(spark, SF_DIR)
    counts = running_counts_stateful(stream.select("user_id"), "user_id")
    q = (
        counts.writeStream.format("memory")
        .queryName("t_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["user_id"]: r["events_so_far"]
        for r in spark.sql(
            "SELECT user_id, max(events_so_far) AS events_so_far FROM t_state GROUP BY user_id"
        ).collect()
    }
    batch = {
        r["user_id"]: r["cnt"]
        for r in spark.read.parquet(f"{SF_DIR}/events.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == batch and len(got) > 0
