"""Stream-stream interval join and streaming dedup — true readStream
runs compared against their batch twins."""

import pyspark.sql.functions as F

from yelp_data_pipeline_spark.streaming import joins as sj
from yelp_data_pipeline_spark.streaming import windows as sw

from conftest import SF_DIR, normalize_events_ts


def _batch_events(spark):
    return normalize_events_ts(spark.read.parquet(f"{SF_DIR}/events.parquet"))


def _run(agg, tmp_path, name, mode="append"):
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)


def test_stream_stream_interval_join_matches_batch(spark, tmp_path):
    def split(df):
        ev = df.select("user_id", "ts", "event_type", "event_id")
        return (
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
        )

    ls, rs = split(sw.stream_events_from_parquet(spark, SF_DIR))
    joined = sj.interval_join(
        ls.withWatermark("ts", "1 hour"),
        rs.withWatermark("ts", "1 hour"),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        upper="10 minutes",
    )
    _run(joined, tmp_path, "t_ssj")
    got = {
        (r["l_key"], str(r["l_ts"]), str(r["r_ts"]))
        for r in spark.sql("SELECT * FROM t_ssj").collect()
    }

    lb, rb = split(_batch_events(spark))
    want = {
        (r["l_key"], str(r["l_ts"]), str(r["r_ts"]))
        for r in sj.interval_join(
            lb, rb, key="user_id", left_ts="ts", right_ts="ts", upper="10 minutes"
        ).collect()
    }
    assert got == want and len(got) > 0


def test_stream_dedup_drops_redelivered_file(spark, tmp_path):
    # Simulate at-least-once redelivery: the same events parquet
    # appears twice in the stream source directory.
    src = tmp_path / "redelivered"
    src.mkdir()
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch.write.mode("overwrite").parquet(str(src / "d1.parquet"))
    batch.write.mode("append").parquet(str(src / "d1.parquet"))  # the dup

    schema = spark.read.parquet(str(src / "d1.parquet")).schema
    stream = spark.readStream.schema(schema).parquet(str(src / "d1.parquet"))
    stream = normalize_events_ts(stream)

    deduped = sj.dedup_stream(stream, ["event_id"], "ts", "2 hours")
    _run(deduped, tmp_path, "t_dedup")
    n = spark.sql("SELECT count(*) AS c FROM t_dedup").collect()[0]["c"]
    n_distinct = batch.select("event_id").distinct().count()
    assert n == n_distinct  # every redelivered row dropped, one survivor per id


def test_stream_dedup_within_watermark_restamped_retries(spark, tmp_path):
    # Redelivered events arrive with RESTAMPED timestamps (ts + skew),
    # so (event_id, ts) dedup would pass them through; key-only
    # dropDuplicatesWithinWatermark must collapse them while keeping
    # state bounded by the watermark horizon.
    import shutil

    src = tmp_path / "restamped_src"
    src.mkdir()
    base = _batch_events(spark).select("event_id", "ts", "user_id").limit(200)
    base.write.mode("overwrite").parquet(str(src / "batch0.parquet"))
    restamped = base.withColumn(
        "ts", F.col("ts") + F.expr("INTERVAL 37 seconds")
    )
    restamped.write.mode("overwrite").parquet(str(src / "batch1.parquet"))

    stream = (
        spark.readStream.schema(base.schema)
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    deduped = sj.dedup_stream_within_watermark(
        stream, ["event_id"], "ts", "2 hours"
    )
    _run(deduped, tmp_path, "t_ddww")
    got = spark.sql("SELECT event_id FROM t_ddww").collect()
    ids = [r["event_id"] for r in got]
    assert len(ids) == len(set(ids)) == base.count()


def test_stream_static_enrichment_matches_batch(spark, tmp_path):
    """enrich_stream on a bounded replay must equal the batch join,
    and unmatched stream rows survive a left enrich with NULL attrs
    (the static side carries no state store — nothing to evict)."""
    from yelp_data_pipeline_spark.streaming import joins as sjx
    from yelp_data_pipeline_spark.streaming import windows as sw

    stream = sw.stream_events_from_parquet(spark, SF_DIR).select(
        "event_id", "user_id"
    )
    dim = spark.read.parquet(f"{SF_DIR}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    )
    enriched = sjx.enrich_stream(stream, dim, "user_id", "c_custkey")
    q = (
        enriched.writeStream.format("memory")
        .queryName("t_enrich")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_enrich"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["event_id"], r["c_mktsegment"])
        for r in spark.sql("SELECT event_id, c_mktsegment FROM t_enrich").collect()
    }
    batch = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_id", "user_id")
        .join(dim, F.col("user_id") == F.col("c_custkey"), "left")
    )
    want = {(r["event_id"], r["c_mktsegment"]) for r in batch.collect()}
    assert got == want and len(got) > 0

    import pytest

    with pytest.raises(ValueError):
        sjx.enrich_stream(stream, dim, "user_id", "c_custkey", how="full")


def test_stream_stream_left_outer_interval_join_emits_after_watermark(
    spark, tmp_path
):
    """Left-outer stream-stream join: matched pairs equal the batch
    inner join, and a NULL-right row appears for every unmatched left
    event old enough that the final watermark (max ts − 1 h) passed
    its join horizon (l_ts + 10 min). Unmatched lefts INSIDE the
    horizon are withheld — correct semantics, pinned here."""
    import datetime as dt

    def split(df):
        ev = df.select("user_id", "ts", "event_type", "event_id")
        return (
            ev.filter(F.col("event_type") == "view"),
            ev.filter(F.col("event_type") == "purchase"),
        )

    ls, rs = split(sw.stream_events_from_parquet(spark, SF_DIR))
    joined = sj.interval_join(
        ls.withWatermark("ts", "1 hour"),
        rs.withWatermark("ts", "1 hour"),
        key="user_id",
        left_ts="ts",
        right_ts="ts",
        upper="10 minutes",
        how="left_outer",
    )
    _run(joined, tmp_path, "t_ssoj")
    got = {
        (r["l_key"], str(r["l_ts"]), str(r["r_ts"]))
        for r in spark.sql("SELECT l_key, l_ts, r_ts FROM t_ssoj").collect()
    }

    lb, rb = split(_batch_events(spark))
    inner = {
        (r["l_key"], str(r["l_ts"]), str(r["r_ts"]))
        for r in sj.interval_join(
            lb, rb, key="user_id", left_ts="ts", right_ts="ts",
            upper="10 minutes",
        ).collect()
    }
    matched_lefts = {(k, lts) for k, lts, _ in inner}
    max_ts = max(r["ts"] for r in _batch_events(spark).select("ts").collect())
    horizon = max_ts - dt.timedelta(hours=1) - dt.timedelta(minutes=10)
    expected_nulls = {
        (r["user_id"], str(r["ts"]), "None")
        for r in lb.collect()
        if (r["user_id"], str(r["ts"])) not in matched_lefts
        and r["ts"] < horizon
    }
    assert inner <= got, "matched pairs missing from the outer result"
    assert expected_nulls <= got, "evictable unmatched lefts not emitted"
    # nothing unexpected: every row is either a batch-inner pair or an
    # unmatched left (possibly one still inside the horizon that a
    # batch boundary happened to flush)
    unmatched_all = {
        (r["user_id"], str(r["ts"]), "None")
        for r in lb.collect()
        if (r["user_id"], str(r["ts"])) not in matched_lefts
    }
    assert got <= inner | unmatched_all
    assert len(expected_nulls) > 0
