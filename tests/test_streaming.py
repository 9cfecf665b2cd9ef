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
