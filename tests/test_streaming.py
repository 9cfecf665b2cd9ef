"""True readStream coverage (SURVEY.md §5.2): the batch-checked window
operators run identically on a bounded stream replay with a watermark.
"""

import pyspark.sql.functions as F

from yelp_data_pipeline_spark.streaming import windows as sw

from conftest import SF_DIR, normalize_events_ts


def test_stream_tumbling_counts_match_batch(spark, tmp_path):
    stream = sw.stream_events_from_parquet(spark, SF_DIR)
    agg = sw.tumbling_counts(sw.with_watermark(stream, "ts", "1 hour"), "ts", "1 hour")
    q = (
        agg.writeStream.format("memory")
        .queryName("t_tumbling")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["win_start"]), r["cnt"])
        for r in spark.sql("SELECT * FROM t_tumbling").collect()
    }
    batch = sw.tumbling_counts(
        normalize_events_ts(spark.read.parquet(f"{SF_DIR}/events.parquet")),
        "ts",
        "1 hour",
    )
    want = {(str(r["win_start"]), r["cnt"]) for r in batch.collect()}
    assert got == want and len(got) > 0


def test_stream_is_actually_streaming(spark):
    stream = sw.stream_events_from_parquet(spark, SF_DIR)
    assert stream.isStreaming


def _batch_events(spark):
    return normalize_events_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))


def test_stream_sliding_counts_match_batch(spark, tmp_path):
    stream = sw.stream_events_from_parquet(spark, SF_DIR)
    agg = sw.sliding_counts(
        sw.with_watermark(stream, "ts", "1 hour"), "ts", "1 hour", "30 minutes"
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_sliding")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_sl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (str(r["win_start"]), r["cnt"])
        for r in spark.sql("SELECT * FROM t_sliding").collect()
    }
    want = {
        (str(r["win_start"]), r["cnt"])
        for r in sw.sliding_counts(_batch_events(spark), "ts", "1 hour", "30 minutes").collect()
    }
    assert got == want and len(got) > 0


def test_stream_session_windows_match_batch(spark, tmp_path):
    stream = sw.stream_events_from_parquet(spark, SF_DIR)
    agg = sw.session_counts(
        sw.with_watermark(stream, "ts", "1 hour"), "ts", "30 minutes", ["user_id"]
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("t_sessions")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt_se"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["user_id"], str(r["sess_start"]), r["cnt"])
        for r in spark.sql("SELECT * FROM t_sessions").collect()
    }
    want = {
        (r["user_id"], str(r["sess_start"]), r["cnt"])
        for r in sw.session_counts(_batch_events(spark), "ts", "30 minutes", ["user_id"]).collect()
    }
    assert got == want and len(got) > 0


def test_stream_session_window_watermark_eviction(spark, tmp_path):
    """APPEND-mode session semantics under a watermark (the
    dropDuplicatesWithinWatermark treatment, applied to sessions):

    1. a session whose end the watermark has passed is CLOSED and
       emitted exactly once (at the end of the first batch that RUNS
       with the advanced watermark — batch 1 here);
    2. a late row arriving AFTER that eviction is DROPPED by the
       watermark (asserted via numRowsDroppedByWatermark) — it never
       reopens the closed session and never emits a spurious new one;
    3. a session still open relative to the final watermark is NOT
       emitted in append mode (its state awaits more data).

    Three micro-batches (maxFilesPerTrigger=1, files ordered by mod
    time): b0 = session data + a far-future watermark advancer; b1 =
    filler that runs with watermark 11:50 so A's session evicts at its
    end; b2 = the late row. NOTE the deliberate three-batch shape:
    Spark's watermark is a best-effort bound — a late row landing in
    the SAME batch whose start first sees the advanced watermark (a
    two-batch layout) still merges into live state; only rows arriving
    after state eviction are guaranteed dropped. The test pins the
    guaranteed half of the contract.
    """
    import time

    src = tmp_path / "sess_src"
    src.mkdir()

    def mk(rows):
        return spark.createDataFrame(rows, ["user_id", "ts_str"]).select(
            "user_id", F.col("ts_str").cast("timestamp").alias("ts")
        )

    mk(
        [
            ("A", "2024-01-01 10:00:00"),
            ("A", "2024-01-01 10:02:00"),
            ("W", "2024-01-01 12:00:00"),  # advances watermark to 11:50
        ]
    ).coalesce(1).write.parquet(str(src / "b0"))
    time.sleep(1.1)  # file-source orders by mod time
    mk([("W", "2024-01-01 12:01:00")]).coalesce(1).write.parquet(
        str(src / "b1")
    )
    time.sleep(1.1)
    mk([("A", "2024-01-01 10:03:00")]).coalesce(1).write.parquet(
        str(src / "b2")
    )

    stream = (
        spark.readStream.schema(mk([("x", "2024-01-01 10:00:00")]).schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    sess = sw.session_counts(
        sw.with_watermark(stream, "ts", "10 minutes"),
        "ts",
        "5 minutes",
        ["user_id"],
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("t_sess_evict")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], str(r["sess_start"]), str(r["sess_end"]), r["cnt"])
        for r in spark.sql("SELECT * FROM t_sess_evict").collect()
    }
    # Only A's closed session appears: 10:00-10:07 (end = last event +
    # gap), cnt 2 — the late 10:03 row neither extended it nor created
    # a new emitted session; W's still-open session is withheld.
    assert got == {
        ("A", "2024-01-01 10:00:00", "2024-01-01 10:07:00", 2)
    }
    dropped = [
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["numInputRows"] > 0
    ]
    assert dropped[-1] == 1  # the late row was evicted, not merged
