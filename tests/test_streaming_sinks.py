"""Idempotent foreachBatch MERGE sink (streaming/sinks.py) — where
the streaming tier meets the upsert tier: keyed upsert into a parquet
serving table, exactly-once table state under at-least-once replay.
"""

import time

import pyspark.sql.functions as F

from conftest import SF_DIR  # noqa: F401  (sys.path side effect)

from yelp_data_pipeline_spark.streaming.sinks import (
    applied_batches,
    merge_upsert_batch,
    merge_upsert_sink,
)


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["k", "v", "seq"])


def test_stream_merge_upsert_end_state(spark, tmp_path):
    """Two micro-batches through foreachBatch MERGE: updates win on
    matched keys, inserts land on new keys, in-batch duplicate keys
    resolve latest-wins by order_col."""
    src = tmp_path / "src"
    src.mkdir()
    target = str(tmp_path / "serving")

    _mk(spark, [("k1", 1, 1), ("k2", 2, 1)]).coalesce(1).write.parquet(
        str(src / "b0")
    )
    time.sleep(1.1)  # file source orders by mod time
    _mk(
        spark, [("k1", 9, 2), ("k1", 10, 3), ("k3", 3, 2)]
    ).coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema(_mk(spark, [("x", 0, 0)]).schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            merge_upsert_sink(target, ["k"], order_col="seq")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {r["k"]: r["v"] for r in spark.read.parquet(target).collect()}
    assert got == {"k1": 10, "k2": 2, "k3": 3}
    assert applied_batches(target) == {0, 1}


def test_replayed_batch_is_not_double_applied(spark, tmp_path):
    """The at-least-once replay contract: re-delivering the SAME
    (batch_id, data) must be a ledger-guarded no-op; and a replay
    after a crash-before-marker (marker missing, data applied) must
    leave table state unchanged because MERGE is idempotent."""
    target = str(tmp_path / "serving")
    b0 = _mk(spark, [("k1", 1, 1), ("k2", 2, 1)])

    assert merge_upsert_batch(b0, 0, target, ["k"]) is True
    before = sorted(map(tuple, spark.read.parquet(target).collect()))

    # straight replay: ledger hit, no-op
    assert merge_upsert_batch(b0, 0, target, ["k"]) is False
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == before

    # crash-before-marker replay: marker gone, data already in table
    import os

    os.remove(os.path.join(target + "_applied", "batch-0"))
    assert merge_upsert_batch(b0, 0, target, ["k"]) is True
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == before
    assert applied_batches(target) == {0}


def test_restarted_stream_skips_committed_batches(spark, tmp_path):
    """Restarting from the same checkpoint must not re-enter the sink
    for committed batches (offsets) — and even a fresh checkpoint
    (same data re-delivered as the same batch ids) is ledger-guarded."""
    src = tmp_path / "src2"
    src.mkdir()
    target = str(tmp_path / "serving2")
    _mk(spark, [("a", 1, 1)]).coalesce(1).write.parquet(str(src / "b0"))

    def run(ckpt):
        stream = (
            spark.readStream.schema(_mk(spark, [("x", 0, 0)]).schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(merge_upsert_sink(target, ["k"]))
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ckpt_a")
    st1 = sorted(map(tuple, spark.read.parquet(target).collect()))
    run("ckpt_a")  # restart, same checkpoint: nothing new to process
    run("ckpt_b")  # fresh checkpoint: batch 0 re-delivered, ledger blocks
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == st1
    assert applied_batches(target) == {0}


def test_hll_register_sink_stream_equals_batch_and_replay_idempotent(
    spark, tmp_path
):
    """Three micro-batches of user ids folded through the HLL register
    sink: (1) the streamed state's estimate equals a batch recompute
    over the union of all rows — same registers_hit, same rho_sum,
    same estimate; (2) replaying a batch leaves the state bit-identical
    (register-max is an idempotent semilattice — the no-ledger
    exactly-once argument)."""
    import pyspark.sql.functions as F  # noqa: F811

    from yelp_data_pipeline_spark.operators.aggregates import hll_distinct
    from yelp_data_pipeline_spark.streaming.sinks import (
        hll_register_batch,
        hll_register_sink,
        hll_state_estimate,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "hll_state")

    batches = [
        [(f"u{i}",) for i in range(0, 40)],
        [(f"u{i}",) for i in range(20, 70)],   # overlaps batch 0
        [(f"u{i}",) for i in range(60, 100)],  # overlaps batch 1
    ]
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, ["user_id"]).coalesce(1).write.parquet(
            str(src_dir / f"b{b}")
        )
        time.sleep(1.1)

    stream = (
        spark.readStream.schema("user_id string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    q = (
        stream.writeStream.foreachBatch(hll_register_sink(state, "user_id"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = hll_state_estimate(spark, state).collect()[0]
    all_rows = [r for rows in batches for r in rows]
    direct = hll_distinct(
        spark.createDataFrame(all_rows, ["user_id"]), "user_id"
    ).collect()[0]
    assert streamed["registers_hit"] == direct["registers_hit"]
    assert streamed["rho_sum"] == direct["rho_sum"]
    assert streamed["approx_users"] == direct["approx_users"]

    # Replay batch 1 (same data, new batch id — the at-least-once
    # crash-recovery shape): state must not move.
    before = sorted(
        (r["reg"], r["m_r"]) for r in spark.read.parquet(state).collect()
    )
    hll_register_batch(
        spark.createDataFrame(batches[1], ["user_id"]), 99, state, "user_id"
    )
    after = sorted(
        (r["reg"], r["m_r"]) for r in spark.read.parquet(state).collect()
    )
    assert before == after


def test_cms_grid_sink_needs_ledger(spark, tmp_path):
    """CMS cells merge by SUM (monoid, not idempotent): the streamed
    grid equals the direct batch grid; a replay is skipped by the
    ledger (state unchanged); bypassing the ledger double-counts —
    the demonstrated reason the ledger exists for sum-state while
    HLL's max-state needs none."""
    import pyspark.sql.functions as F  # noqa: F811

    from yelp_data_pipeline_spark.operators.aggregates import _cms_grid
    from yelp_data_pipeline_spark.streaming.sinks import (
        cms_grid_batch,
        cms_grid_sink,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "cms_state")

    batches = [
        [(f"u{i % 7}",) for i in range(30)],
        [(f"u{i % 11}",) for i in range(40)],
    ]
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, ["user_id"]).coalesce(1).write.parquet(
            str(src_dir / f"b{b}")
        )
        time.sleep(1.1)

    stream = (
        spark.readStream.schema("user_id string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    q = (
        stream.writeStream.foreachBatch(cms_grid_sink(state, "user_id"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    def grid_rows(df):
        return sorted((r["i"], r["pos"], r["cnt"]) for r in df.collect())

    all_rows = [r for rows in batches for r in rows]
    direct = grid_rows(
        _cms_grid(spark.createDataFrame(all_rows, ["user_id"]), "user_id", 4, 512)
    )
    streamed = grid_rows(spark.read.parquet(state))
    assert streamed == direct

    # Replay batch id 1 -> ledger skips, state unchanged.
    applied = cms_grid_batch(
        spark.createDataFrame(batches[1], ["user_id"]), 1, state, "user_id"
    )
    assert applied is False
    assert grid_rows(spark.read.parquet(state)) == direct

    # Bypass the ledger (fresh batch id, same data): counts inflate —
    # sum-state is NOT replay-tolerant without it.
    cms_grid_batch(
        spark.createDataFrame(batches[1], ["user_id"]), 99, state, "user_id"
    )
    corrupted = grid_rows(spark.read.parquet(state))
    assert corrupted != direct
    assert sum(c for _, _, c in corrupted) == sum(c for _, _, c in direct) + 4 * len(
        batches[1]
    )


def test_kmv_state_sink_idempotent_and_equals_batch(spark, tmp_path):
    """KMV k-min union is the second idempotent semilattice sink:
    streamed state estimate equals the batch sketch over all rows, and
    a no-ledger replay leaves the k-min set bit-identical."""
    from yelp_data_pipeline_spark.operators.aggregates import kmv_distinct
    from yelp_data_pipeline_spark.streaming.sinks import (
        kmv_state_batch,
        kmv_state_estimate,
        kmv_state_sink,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "kmv_state")
    batches = [
        [(f"u{i}",) for i in range(0, 300)],
        [(f"u{i}",) for i in range(150, 500)],
    ]
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, ["user_id"]).coalesce(1).write.parquet(
            str(src_dir / f"b{b}")
        )
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("user_id string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    q = (
        stream.writeStream.foreachBatch(kmv_state_sink(state, "user_id", k=64))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = kmv_state_estimate(spark, state, k=64).collect()[0]
    all_rows = [r for rows in batches for r in rows]
    direct = kmv_distinct(
        spark.createDataFrame(all_rows, ["user_id"]), "user_id", k=64
    ).collect()[0]
    assert streamed["est_distinct"] == direct["est_distinct"]

    before = sorted(r["h"] for r in spark.read.parquet(state).collect())
    assert len(before) == 64
    kmv_state_batch(
        spark.createDataFrame(batches[0], ["user_id"]), 99, state, "user_id", k=64
    )
    after = sorted(r["h"] for r in spark.read.parquet(state).collect())
    assert before == after


def test_histogram_state_sink_needs_ledger(spark, tmp_path):
    """Histogram buckets add (monoid): streamed buckets equal the
    direct batch histogram; ledger skips a replayed id; bypassing the
    ledger inflates total count by exactly the batch size."""
    import pyspark.sql.functions as F  # noqa: F811

    from yelp_data_pipeline_spark.streaming.sinks import (
        histogram_state_batch,
        histogram_state_sink,
    )

    src_dir = tmp_path / "src"
    src_dir.mkdir()
    state = str(tmp_path / "hist_state")
    batches = [
        [(float(v),) for v in (1, 7, 30, 55, 260)],
        [(float(v),) for v in (2, 26, 49, 510)],
    ]
    for b, rows in enumerate(batches):
        spark.createDataFrame(rows, ["value"]).coalesce(1).write.parquet(
            str(src_dir / f"b{b}")
        )
        time.sleep(1.1)
    stream = (
        spark.readStream.schema("value double")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src_dir))
    )
    q = (
        stream.writeStream.foreachBatch(histogram_state_sink(state, "value"))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        r["bucket"]: r["cnt"] for r in spark.read.parquet(state).collect()
    }
    # buckets of width 25: 1,7,2->0; 30,26,49->1,(49->1); 55->2; 260->10; 510->20
    assert got == {0: 3, 1: 3, 2: 1, 10: 1, 20: 1}

    assert (
        histogram_state_batch(
            spark.createDataFrame(batches[1], ["value"]), 1, state, "value"
        )
        is False
    )
    assert {
        r["bucket"]: r["cnt"] for r in spark.read.parquet(state).collect()
    } == got

    histogram_state_batch(
        spark.createDataFrame(batches[1], ["value"]), 99, state, "value"
    )
    inflated = {
        r["bucket"]: r["cnt"] for r in spark.read.parquet(state).collect()
    }
    assert sum(inflated.values()) == sum(got.values()) + len(batches[1])


def test_psi_monitor_sink_matches_batch_operator(spark, tmp_path):
    """Streaming PSI drift monitor: fold 3 micro-batches of the late
    window against a frozen early-window reference — the final
    monitor row must reproduce the batch psi_drift number on the
    same split bit-for-bit, and a replayed batch must add neither
    counts nor a duplicate monitor row."""
    import os

    from yelp_data_pipeline_spark.operators.timeseries import psi_drift
    from yelp_data_pipeline_spark.streaming.sinks import (
        freeze_psi_reference,
        psi_bin_batch,
        psi_monitor_sink,
    )

    cutoff = "2024-01-16"
    early = [
        ("2024-01-%02d 08:00:00" % (d % 15 + 1), float(v))
        for d, v in enumerate([12, 40, 77, 120, 160, 220, 310, 480, 45, 33])
    ]
    late = [
        ("2024-01-%02d 09:00:00" % (d % 14 + 16), float(v))
        for d, v in enumerate(
            [5, 8, 14, 22, 30, 36, 41, 47, 55, 260, 410, 499]
        )
    ]

    def mk(rows):
        return spark.createDataFrame(rows, "ts_s string, value double").select(
            F.col("ts_s").cast("timestamp").alias("ts"), "value"
        )

    ref_path = str(tmp_path / "ref")
    freeze_psi_reference(mk(early), ref_path, "value")

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        mk(late[i * 4 : (i + 1) * 4]).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
        time.sleep(1.1)

    target = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(mk(early).schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            psi_monitor_sink(target, ref_path, "value")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    log = sorted(
        spark.read.parquet(target + "_monitor").collect(),
        key=lambda r: r["batch_id"],
    )
    assert [r["batch_id"] for r in log] == [0, 1, 2]
    assert [r["n_cur"] for r in log] == [4, 8, 12]
    assert all(r["n_ref"] == len(early) for r in log)

    batch = psi_drift(mk(early + late), "ts", "value", cutoff).collect()[0]
    assert batch["n_a"] == len(early) and batch["n_b"] == len(late)
    assert log[-1]["psi"] == batch["psi"]  # bit-for-bit

    # Replay: ledger hit -> no state change, no new monitor row.
    before = sorted(map(tuple, spark.read.parquet(target).collect()))
    assert psi_bin_batch(mk(late[:4]), 0, target, "value") is False
    psi_monitor_sink(target, ref_path, "value")(mk(late[:4]), 0)
    assert sorted(map(tuple, spark.read.parquet(target).collect())) == before
    assert spark.read.parquet(target + "_monitor").count() == 3


def test_conformal_monitor_sink_matches_batch_operator(spark, tmp_path):
    """Streaming conformal-coverage monitor: freeze the calibration
    on the md5 calib half, stream the test half in 3 micro-batches —
    the final cumulative state must reproduce the oracle-verified
    batch query's (n_test, coverage) per event_type bit-for-bit, and
    a replayed batch must add neither counts nor a log row."""
    import time

    import pyspark.sql.functions as F

    from yelp_data_pipeline_spark.functions.hashing import md5_long
    from yelp_data_pipeline_spark.queries import q_conformal_event_intervals
    from yelp_data_pipeline_spark.streaming.sinks import (
        conformal_monitor_sink,
        freeze_conformal_calibration,
    )
    from yelp_data_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    base = (
        load_table(spark, sf, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value").cast("double") * 100.0 + 0.5)
            .cast("long")
            .alias("v"),
            (md5_long(F.col("event_id").cast("string"), "conf") % 2 == 0)
            .alias("is_calib"),
        )
    )
    ref_path = str(tmp_path / "calib")
    freeze_conformal_calibration(
        base.where(F.col("is_calib")),
        ref_path,
        "event_type",
        "v",
        "event_id",
    )

    test_half = base.where(~F.col("is_calib")).select(
        "event_type", "event_id", "v"
    )
    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        test_half.where(F.pmod(F.col("event_id"), F.lit(3)) == i).coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))
        time.sleep(1.1)

    target = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(test_half.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            conformal_monitor_sink(target, ref_path, "event_type", "v")
        )
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    state = {
        r["event_type"]: (r["n_seen"], r["n_covered"])
        for r in spark.read.parquet(target).collect()
    }
    batch = {
        r["event_type"]: (r["n_test"], r["coverage"])
        for r in q_conformal_event_intervals(spark, sf).collect()
    }
    assert set(state) == set(batch)
    for et, (n_test, coverage) in batch.items():
        n_seen, n_cov = state[et]
        assert n_seen == n_test
        assert round(n_cov / n_seen, 6) == coverage

    log = spark.read.parquet(target + "_monitor")
    n_log_rows = log.count()
    last_batch = log.agg(F.max("batch_id")).collect()[0][0]

    # replay: re-applying an old batch must be a no-op
    replay_df = spark.read.parquet(str(src / "b0"))
    conformal_monitor_sink(target, ref_path, "event_type", "v")(replay_df, 0)
    assert spark.read.parquet(target + "_monitor").count() == n_log_rows
    state2 = {
        r["event_type"]: (r["n_seen"], r["n_covered"])
        for r in spark.read.parquet(target).collect()
    }
    assert state2 == state
    assert last_batch is not None


def test_conformal_monitor_flags_breach_on_shifted_stream(spark, tmp_path):
    """When the live distribution shifts away from the calibration
    window, coverage drops below 1-alpha and the monitor's exact
    integer breach test fires."""
    import pyspark.sql.functions as F

    from yelp_data_pipeline_spark.streaming.sinks import (
        conformal_monitor_sink,
        freeze_conformal_calibration,
    )

    # calibration: tight values around 1000 cents
    calib = spark.createDataFrame(
        [("a", i, 1000 + (i % 5)) for i in range(40)],
        "g string, rid long, v long",
    )
    ref_path = str(tmp_path / "calib")
    freeze_conformal_calibration(calib, ref_path, "g", "v", "rid")

    # live batch: shifted by 10x the calibration spread
    shifted = spark.createDataFrame(
        [("a", 100 + i, 1500 + i) for i in range(20)],
        "g string, rid long, v long",
    )
    target = str(tmp_path / "state")
    conformal_monitor_sink(target, ref_path, "g", "v")(shifted, 0)

    row = spark.read.parquet(target + "_monitor").collect()[0]
    assert row["n_seen"] == 20
    assert row["n_covered"] == 0
    assert row["coverage"] == 0.0
    assert bool(row["breach"]) is True

    # an in-distribution batch pulls coverage back up; breach clears
    ok = spark.createDataFrame(
        [("a", 200 + i, 1000 + (i % 5)) for i in range(180)],
        "g string, rid long, v long",
    )
    conformal_monitor_sink(target, ref_path, "g", "v")(ok, 1)
    rows = {r["batch_id"]: r for r in
            spark.read.parquet(target + "_monitor").collect()}
    assert rows[1]["n_seen"] == 200
    assert bool(rows[1]["breach"]) is False


def test_neardup_gate_matches_batch_pairs_and_is_replay_safe(
    spark, tmp_path
):
    """Streaming near-dup gate: freeze the LSH index on the corpus
    half (doc_id % 2 == 0), stream the other half in 3 micro-batches.
    The union of quarantine-log rows must equal the BATCH minhash
    operator's verified cross-pair set between the two halves (same
    k/bands/threshold), the cumulative (n_seen, n_dups) monoid must
    match direct counts, and a replayed batch must add neither."""
    import time

    import pyspark.sql.functions as F

    from yelp_data_pipeline_spark.operators.dedup import minhash_lsh_pairs
    from yelp_data_pipeline_spark.streaming.sinks import (
        freeze_dedup_index,
        neardup_gate_batch,
        neardup_gate_sink,
    )
    from yelp_data_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 != 0)

    ref_path = str(tmp_path / "index")
    freeze_dedup_index(corpus, ref_path)

    src = tmp_path / "src"
    src.mkdir()
    for i in range(3):
        incoming.where(F.pmod(F.col("doc_id"), F.lit(3)) == i).coalesce(
            1
        ).write.parquet(str(src / f"b{i}"))
        time.sleep(1.1)

    target = str(tmp_path / "state")
    stream = (
        spark.readStream.schema(incoming.schema)
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(neardup_gate_sink(target, ref_path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    # Batch truth: verified cross-half pairs from the SAME algebra.
    cross = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_lsh_pairs(
            docs, "doc_id", "text", k=12, bands=4, threshold=0.8
        ).collect()
        if (r["doc_a"] % 2 == 0) != (r["doc_b"] % 2 == 0)
    }
    cross_oriented = {
        (a, b) if a % 2 != 0 else (b, a) for a, b in cross
    }
    gate = {
        (r["doc_in"], r["doc_ref"])
        for r in spark.read.parquet(target + "_rejects").collect()
    }
    assert gate == cross_oriented
    assert len(gate) > 0  # the fixture has genuine cross-half dups

    st = spark.read.parquet(target).collect()[0]
    assert st["n_seen"] == incoming.count()
    assert st["n_dups"] == len({a for a, _ in gate})

    # Replay: re-applying batch 0 must change nothing.
    n_rej = spark.read.parquet(target + "_rejects").count()
    replay_df = spark.read.parquet(str(src / "b0"))
    assert neardup_gate_batch(replay_df, 0, target, ref_path) is False
    assert spark.read.parquet(target + "_rejects").count() == n_rej
    st2 = spark.read.parquet(target).collect()[0]
    assert (st2["n_seen"], st2["n_dups"]) == (st["n_seen"], st["n_dups"])


def test_crashed_swap_recovers_cumulative_state(spark, tmp_path):
    """A crash between rename(target, old) and rename(staged, target)
    leaves no live state dir, only the orphaned .old-<id>. The next
    read must restore that orphan and resume the cumulative fold —
    NOT silently reset the monoid to the current batch alone."""
    import os

    from yelp_data_pipeline_spark.streaming.sinks import cms_grid_batch

    state = str(tmp_path / "cms_state")
    b0 = spark.createDataFrame([(f"u{i % 7}",) for i in range(30)], ["user_id"])
    b1 = spark.createDataFrame([(f"u{i % 11}",) for i in range(40)], ["user_id"])

    assert cms_grid_batch(b0, 0, state, "user_id") is True
    total0 = sum(
        r["cnt"]
        for r in spark.read.parquet(state).where(F.col("i") == 0).collect()
    )
    assert total0 == 30

    # Simulate the crash window of batch 1: state displaced to the
    # .old dir, replacement swap never happened, no marker written.
    os.rename(state, state + ".old-1")

    # Replayed batch 1 must fold onto the RESTORED batch-0 state.
    assert cms_grid_batch(b1, 1, state, "user_id") is True
    total = sum(
        r["cnt"]
        for r in spark.read.parquet(state).where(F.col("i") == 0).collect()
    )
    assert total == 70  # 30 + 40, not 40
    assert not os.path.exists(state + ".old-1")


def test_gate_crashed_swap_resumes_monoid(spark, tmp_path):
    """The near-dup gate's (n_seen, n_dups) monoid survives the
    two-rename crash window: with the state dir displaced to the
    .old orphan (crash between the renames, no marker written), the
    replayed batch restores the orphan and folds cumulatively."""
    from yelp_data_pipeline_spark.streaming.sinks import (
        freeze_dedup_index,
        neardup_gate_batch,
    )
    from yelp_data_pipeline_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 != 0)

    ref_path = str(tmp_path / "index")
    freeze_dedup_index(corpus, ref_path)
    target = str(tmp_path / "state")

    b0 = incoming.where(F.pmod(F.col("doc_id"), F.lit(3)) == 0)
    b1 = incoming.where(F.pmod(F.col("doc_id"), F.lit(3)) == 1)
    assert neardup_gate_batch(b0, 0, target, ref_path) is True
    st0 = spark.read.parquet(target).collect()[0]
    assert st0["n_seen"] == b0.count()

    # Crash window of batch 1: state displaced, swap never completed,
    # no marker.
    import os

    os.rename(target, target + ".old-1")
    assert neardup_gate_batch(b1, 1, target, ref_path) is True
    st = spark.read.parquet(target).collect()[0]
    assert st["n_seen"] == b0.count() + b1.count()  # resumed, not reset
    assert st["n_dups"] >= st0["n_dups"]
    assert not os.path.exists(target + ".old-1")


def test_postswap_premarker_crash_rolls_back_not_doublecounts(
    spark, tmp_path
):
    """Crash AFTER the swap but BEFORE the ledger marker: the target
    holds an unrecorded fold and the pre-fold state sits in .old.
    Recovery must ROLL BACK and let the replay fold exactly once —
    never sum the batch in twice."""
    import os

    from yelp_data_pipeline_spark.streaming.sinks import cms_grid_batch

    state = str(tmp_path / "cms_state")
    b0 = spark.createDataFrame([("u1",)] * 30, ["user_id"])
    b1 = spark.createDataFrame([("u2",)] * 40, ["user_id"])
    assert cms_grid_batch(b0, 0, state, "user_id") is True

    # Simulate batch 1's crash window: swap completed (target = post-
    # fold state), marker never written, pre-fold state displaced.
    # Build it by really running batch 1 then deleting its marker and
    # resurrecting the pre-fold state from a copy.
    import shutil

    pre = str(tmp_path / "pre_copy")
    shutil.copytree(state, pre)
    assert cms_grid_batch(b1, 1, state, "user_id") is True
    os.remove(os.path.join(state + "_applied", "batch-1"))
    shutil.copytree(pre, state + ".old-1")

    # Replay of batch 1 must roll back to the pre-fold state and fold
    # ONCE: total = 70, not 110.
    assert cms_grid_batch(b1, 1, state, "user_id") is True
    total = sum(
        r["cnt"]
        for r in spark.read.parquet(state).where(F.col("i") == 0).collect()
    )
    assert total == 70
    assert not os.path.exists(state + ".old-1")


def test_postmarker_precleanup_orphan_does_not_wedge(spark, tmp_path):
    """Crash AFTER the marker but BEFORE the .old cleanup: the stale
    orphan must be garbage-collected by the next batch's recovery —
    not wedge its displacement rename — and the replayed batch must
    stay skipped."""
    import os
    import shutil

    from yelp_data_pipeline_spark.streaming.sinks import cms_grid_batch

    state = str(tmp_path / "cms_state")
    b0 = spark.createDataFrame([("u1",)] * 30, ["user_id"])
    b1 = spark.createDataFrame([("u2",)] * 40, ["user_id"])
    b2 = spark.createDataFrame([("u3",)] * 50, ["user_id"])
    assert cms_grid_batch(b0, 0, state, "user_id") is True
    pre = str(tmp_path / "pre_copy")
    shutil.copytree(state, pre)
    assert cms_grid_batch(b1, 1, state, "user_id") is True
    # marker-1 exists; resurrect the displaced state as the orphan the
    # lost cleanup would have removed.
    shutil.copytree(pre, state + ".old-1")

    # Replayed batch 1: marker present -> skipped, state unchanged.
    assert cms_grid_batch(b1, 1, state, "user_id") is False
    # Batch 2 must commit cleanly (the stale orphan must not make the
    # rename(target, old) wedge) and clean the garbage.
    assert cms_grid_batch(b2, 2, state, "user_id") is True
    total = sum(
        r["cnt"]
        for r in spark.read.parquet(state).where(F.col("i") == 0).collect()
    )
    assert total == 120  # 30 + 40 + 50, exactly once each
    assert not os.path.exists(state + ".old-1")
    assert not os.path.exists(state + ".old-2")


def test_live_state_path_reads_orphan_without_mutating(spark, tmp_path):
    """Estimators never mutate: with the target mid-swap (displaced to
    .old), the estimate reads the orphan in place and leaves the
    directory layout untouched for the writer to finish."""
    import os

    from yelp_data_pipeline_spark.streaming.sinks import (
        hll_register_batch,
        hll_state_estimate,
    )

    state = str(tmp_path / "hll_state")
    b0 = spark.createDataFrame([(f"u{i}",) for i in range(50)], ["user_id"])
    hll_register_batch(b0, 0, state, "user_id")
    want = hll_state_estimate(spark, state).collect()[0]["approx_users"]

    os.rename(state, state + ".old-1")  # writer mid-swap
    got = hll_state_estimate(spark, state).collect()[0]["approx_users"]
    assert got == want
    assert os.path.exists(state + ".old-1")  # untouched
    assert not os.path.exists(state)


def test_foreign_old_suffix_does_not_wedge_recovery(spark, tmp_path):
    """A foreign or truncated directory that merely shares the
    '<base>.old-' prefix but whose suffix is not an integer (e.g. a
    user's manual backup '<base>.old-backup') is NOT part of the swap
    protocol: recovery must skip it — not raise ValueError and
    permanently wedge the sink — and must still repair real orphans
    sitting next to it."""
    import os

    from yelp_data_pipeline_spark.streaming.sinks import cms_grid_batch

    state = str(tmp_path / "cms_state")
    b0 = spark.createDataFrame([("u1",)] * 30, ["user_id"])
    b1 = spark.createDataFrame([("u2",)] * 40, ["user_id"])
    assert cms_grid_batch(b0, 0, state, "user_id") is True

    os.makedirs(state + ".old-backup")  # foreign dir, non-numeric suffix
    os.makedirs(state + ".old-")  # truncated: empty suffix
    # A real crash window too: state displaced, swap never completed.
    os.rename(state, state + ".old-1")

    assert cms_grid_batch(b1, 1, state, "user_id") is True
    total = sum(
        r["cnt"]
        for r in spark.read.parquet(state).where(F.col("i") == 0).collect()
    )
    assert total == 70  # orphan restored and folded, foreign dirs ignored
    assert os.path.isdir(state + ".old-backup")  # not ours — untouched
    assert os.path.isdir(state + ".old-")
    assert not os.path.exists(state + ".old-1")


class TestPackStreamSink:
    def _docs(self, spark, ids):
        return spark.createDataFrame(
            [(i, " ".join(f"w{j}" for j in range(1 + i % 7))) for i in ids],
            ["doc_id", "text"],
        )

    def test_stream_equals_batch_packer_in_id_order(self, spark, tmp_path):
        """THE no-drift theorem for the packing tier: batches arriving
        in id order assign byte-identical (shard, start_offset,
        pack_id) to pack_sequences over the concatenated input — the
        carry state is exactly the prefix sum the batch window
        computes."""
        from yelp_data_pipeline_spark.operators import packing as pk
        from yelp_data_pipeline_spark.streaming.sinks import (
            pack_stream_assignments,
            pack_stream_batch,
        )

        target = str(tmp_path / "packstate")
        batches = [list(range(0, 10)), list(range(10, 25)), list(range(25, 30))]
        for bid, ids in enumerate(batches):
            pack_stream_batch(
                self._docs(spark, ids), bid, target,
                seq_len=16, n_shards=2,
            )
        got = {
            r["doc_id"]: (r["shard"], r["start_offset"], r["pack_id"])
            for r in pack_stream_assignments(spark, target).collect()
        }
        want = {
            r["doc_id"]: (r["shard"], r["start_offset"], r["pack_id"])
            for r in pk.pack_sequences(
                self._docs(spark, range(30)), seq_len=16, n_shards=2
            ).collect()
        }
        assert got == want

    def test_replay_is_exactly_once(self, spark, tmp_path):
        """Replaying a committed batch changes neither the state nor
        the assignment log."""
        from yelp_data_pipeline_spark.streaming.sinks import (
            pack_stream_assignments,
            pack_stream_batch,
        )

        target = str(tmp_path / "packstate")
        assert pack_stream_batch(
            self._docs(spark, range(10)), 0, target, seq_len=16, n_shards=2
        )
        state0 = sorted(
            map(tuple, spark.read.parquet(target).collect())
        )
        n0 = pack_stream_assignments(spark, target).count()
        assert not pack_stream_batch(   # ledger marker short-circuits
            self._docs(spark, range(10)), 0, target, seq_len=16, n_shards=2
        )
        assert sorted(map(tuple, spark.read.parquet(target).collect())) == state0
        assert pack_stream_assignments(spark, target).count() == n0

    def test_postswap_premarker_crash_replays_to_same_assignments(
        self, spark, tmp_path
    ):
        """Kill the marker after a completed swap (the unrecorded-fold
        window): recovery rolls the carry back, and the replay rewrites
        the SAME assignment bytes — offsets continue, nothing
        double-counts."""
        import os
        import shutil

        from yelp_data_pipeline_spark.streaming.sinks import (
            pack_stream_assignments,
            pack_stream_batch,
        )

        target = str(tmp_path / "packstate")
        pack_stream_batch(
            self._docs(spark, range(10)), 0, target, seq_len=16, n_shards=2
        )
        pack_stream_batch(
            self._docs(spark, range(10, 20)), 1, target, seq_len=16, n_shards=2
        )
        committed = {
            r["doc_id"]: (r["shard"], r["start_offset"])
            for r in pack_stream_assignments(spark, target).collect()
        }
        # Simulate the crash window: batch 1's swap landed but the
        # marker did not — resurrect the pre-fold state as an orphan
        # and delete the marker (what disk looks like after the crash).
        state1 = spark.read.parquet(target).collect()
        pre = [
            (r["shard"], r["cum_tokens"])
            for r in state1
        ]
        # recompute batch-0-only state: rerun batch 0 into a fresh dir
        t2 = str(tmp_path / "replaystate")
        pack_stream_batch(
            self._docs(spark, range(10)), 0, t2, seq_len=16, n_shards=2
        )
        spark.read.parquet(t2).write.mode("overwrite").parquet(
            target + ".old-1"
        )
        os.remove(os.path.join(target + "_applied", "batch-1"))
        shutil.rmtree(
            os.path.join(target + "_assignments", "batch-1")
        )
        # Replay batch 1: recovery must roll back to the orphan, fold
        # once, and land the identical assignments.
        assert pack_stream_batch(
            self._docs(spark, range(10, 20)), 1, target, seq_len=16, n_shards=2
        )
        got = {
            r["doc_id"]: (r["shard"], r["start_offset"])
            for r in pack_stream_assignments(spark, target).collect()
        }
        assert got == committed
        assert sorted(pre) == sorted(
            (r["shard"], r["cum_tokens"])
            for r in spark.read.parquet(target).collect()
        )


def test_pack_stream_assignments_before_first_commit_is_empty(spark, tmp_path):
    """A never-started stream reads as an EMPTY assignment relation
    with the packer's schema — the engine-wide empty-relation posture
    — not a path-not-found AnalysisException."""
    from yelp_data_pipeline_spark.streaming.sinks import pack_stream_assignments

    out = pack_stream_assignments(spark, str(tmp_path / "never_started"))
    assert out.columns == [
        "doc_id", "shard", "n_tokens", "start_offset", "pack_id"
    ]
    assert out.collect() == []


class TestCurateStreamSink:
    """The streaming curation composite (scrub -> quality -> near-dup
    gate -> packer, ONE ledger) equals the batch
    curated_documents -> pack_sequences chain on id-ordered arrival."""

    def _docs(self, spark, ids):
        # Texts: length varies 1..10 tokens (length gate [3, 8] cuts
        # both tails); ids >= 20 repeat the text of id - 20 (exact
        # dups scrubbed by the fingerprint state across batches).
        rows = []
        for i in ids:
            base = i % 20
            n = 1 + base % 10
            rows.append((i, " ".join(f"w{base}t{j}" for j in range(n))))
        return spark.createDataFrame(rows, "doc_id long, text string")

    def _twin(self, spark, docs, ref_rel=None):
        """Batch twin built from the SAME operators the registry's
        curated_documents query composes, plus the optional gate and
        the batch packer."""
        from pyspark.sql import functions as F

        from yelp_data_pipeline_spark.operators import packing as pk
        from yelp_data_pipeline_spark.operators import textops as tx
        from yelp_data_pipeline_spark.operators.dedup import neardup_gate_log

        q = tx.quality_features(docs, "doc_id", "text").filter(
            (F.col("quality_score") >= 0.0)
            & F.col("n_tokens").between(3, 8)
        )
        keep = (
            tx.doc_fingerprints(docs, "doc_id", "text")
            .groupBy("fingerprint")
            .agg(F.min("doc_id").alias("doc_id"))
        )
        cur = docs.join(keep.select("doc_id"), "doc_id", "left_semi").join(
            q.select("doc_id"), "doc_id", "left_semi"
        )
        if ref_rel is not None:
            ikeys, ish = ref_rel
            rejects = neardup_gate_log(cur, ikeys, ish, "doc_id", "text")
            cur = cur.join(
                rejects.select(F.col("doc_in").alias("doc_id")).distinct(),
                "doc_id",
                "left_anti",
            )
        asg = pk.pack_sequences(cur, seq_len=16, n_shards=2)
        return cur, asg

    def _run(self, spark, target, batches, ref=None):
        from yelp_data_pipeline_spark.streaming.sinks import curate_stream_batch

        for bid, ids in enumerate(batches):
            curate_stream_batch(
                self._docs(spark, ids), bid, target, ref,
                quality_min=0.0, min_tokens=3, max_tokens=8,
                seq_len=16, n_shards=2,
            )

    def test_stream_equals_batch_curation_and_packing(self, spark, tmp_path):
        from yelp_data_pipeline_spark.streaming.sinks import (
            curate_stream_curated,
            pack_stream_assignments,
        )

        target = str(tmp_path / "curate")
        batches = [list(range(0, 15)), list(range(15, 30)), list(range(30, 40))]
        self._run(spark, target, batches)

        all_docs = self._docs(spark, range(40))
        cur_b, asg_b = self._twin(spark, all_docs)

        got_ids = sorted(
            r["doc_id"] for r in curate_stream_curated(spark, target).collect()
        )
        want_ids = sorted(r["doc_id"] for r in cur_b.collect())
        assert got_ids == want_ids
        # dups (ids >= 20 repeating earlier text) were scrubbed and
        # both length tails cut — the stages demonstrably fired
        assert got_ids and all(i < 20 for i in got_ids)

        got_asg = {
            r["doc_id"]: (r["shard"], r["start_offset"], r["pack_id"])
            for r in pack_stream_assignments(spark, target).collect()
        }
        want_asg = {
            r["doc_id"]: (r["shard"], r["start_offset"], r["pack_id"])
            for r in asg_b.collect()
        }
        assert got_asg == want_asg

    def test_neardup_gate_arm_drops_index_matches(self, spark, tmp_path):
        from yelp_data_pipeline_spark.operators.dedup import (
            minhash_index_relations,
        )
        from yelp_data_pipeline_spark.streaming.sinks import (
            curate_stream_curated,
            freeze_dedup_index,
        )

        # Accepted corpus: the exact text of stream doc 5 (7-token
        # doc, inside the length gate) under a different id.
        corpus = spark.createDataFrame(
            [(1000, " ".join(f"w5t{j}" for j in range(6)))],
            "doc_id long, text string",
        )
        ref = str(tmp_path / "ref")
        freeze_dedup_index(corpus, ref)
        target = str(tmp_path / "curate_gated")
        self._run(spark, target, [list(range(0, 20))], ref=ref)

        got_ids = sorted(
            r["doc_id"] for r in curate_stream_curated(spark, target).collect()
        )
        ikeys, ish = minhash_index_relations(corpus, "doc_id", "text")
        cur_b, _ = self._twin(
            spark, self._docs(spark, range(20)), ref_rel=(ikeys, ish)
        )
        assert got_ids == sorted(r["doc_id"] for r in cur_b.collect())
        assert 5 not in got_ids          # gated out by the frozen index
        assert 6 in got_ids              # its neighbors survive

    def test_replay_is_exactly_once(self, spark, tmp_path):
        from yelp_data_pipeline_spark.streaming.sinks import (
            curate_stream_batch,
            curate_stream_curated,
        )

        target = str(tmp_path / "curate_replay")
        assert curate_stream_batch(
            self._docs(spark, range(10)), 0, target,
            quality_min=0.0, min_tokens=3, max_tokens=8,
            seq_len=16, n_shards=2,
        )
        fp0 = sorted(
            r["fp"] for r in spark.read.parquet(target + "_fps").collect()
        )
        n0 = curate_stream_curated(spark, target).count()
        assert not curate_stream_batch(   # ledger marker short-circuits
            self._docs(spark, range(10)), 0, target,
            quality_min=0.0, min_tokens=3, max_tokens=8,
            seq_len=16, n_shards=2,
        )
        assert sorted(
            r["fp"] for r in spark.read.parquet(target + "_fps").collect()
        ) == fp0
        assert curate_stream_curated(spark, target).count() == n0

    def test_crash_between_state_swaps_replays_to_same_results(
        self, spark, tmp_path
    ):
        """The window that makes the ONE-ledger design necessary: the
        fingerprint swap landed but the packer swap and the marker did
        NOT. Recovery must roll the fingerprint state back (else the
        replay sees the batch's own fingerprints as 'seen' and scrubs
        every doc) and the replay must land identical curated rows,
        assignments, and states."""
        import os
        import shutil

        from yelp_data_pipeline_spark.streaming.sinks import (
            curate_stream_batch,
            curate_stream_curated,
            pack_stream_assignments,
        )

        kw = dict(
            quality_min=0.0, min_tokens=3, max_tokens=8,
            seq_len=16, n_shards=2,
        )
        target = str(tmp_path / "curate_crash")
        curate_stream_batch(self._docs(spark, range(10)), 0, target, **kw)
        curate_stream_batch(self._docs(spark, range(10, 20)), 1, target, **kw)
        committed_cur = sorted(
            r["doc_id"] for r in curate_stream_curated(spark, target).collect()
        )
        committed_asg = {
            r["doc_id"]: (r["shard"], r["start_offset"], r["pack_id"])
            for r in pack_stream_assignments(spark, target).collect()
        }
        committed_fp = sorted(
            r["fp"] for r in spark.read.parquet(target + "_fps").collect()
        )

        # Reconstruct the crash window from a batch-0-only replica:
        # fp state = post-fold with its pre-fold orphan still on disk,
        # pack state = pre-fold, marker absent, batch-1 logs gone.
        t2 = str(tmp_path / "prefold")
        curate_stream_batch(self._docs(spark, range(10)), 0, t2, **kw)
        spark.read.parquet(t2 + "_fps").write.mode("overwrite").parquet(
            target + "_fps.old-1"
        )
        shutil.rmtree(target + "_pack")
        spark.read.parquet(t2 + "_pack").write.mode("overwrite").parquet(
            target + "_pack"
        )
        os.remove(os.path.join(target + "_applied", "batch-1"))
        shutil.rmtree(os.path.join(target + "_curated", "batch-1"))
        shutil.rmtree(os.path.join(target + "_assignments", "batch-1"))

        assert curate_stream_batch(
            self._docs(spark, range(10, 20)), 1, target, **kw
        )
        assert sorted(
            r["doc_id"] for r in curate_stream_curated(spark, target).collect()
        ) == committed_cur
        assert {
            r["doc_id"]: (r["shard"], r["start_offset"], r["pack_id"])
            for r in pack_stream_assignments(spark, target).collect()
        } == committed_asg
        assert sorted(
            r["fp"] for r in spark.read.parquet(target + "_fps").collect()
        ) == committed_fp


def test_curate_stream_defaults_equal_registry_twin(spark, tmp_path):
    """The registry's driver-hashed `curated_packed_assignments` row
    IS the stream composite at its default knobs: streaming the real
    documents fixture in two id-ordered batches reproduces the batch
    row's assignment relation exactly — so the driver's hash covers
    the composite's end-to-end algebra."""
    from pyspark.sql import functions as F

    from conftest import SF_DIR
    from yelp_data_pipeline_spark import queries as Q
    from yelp_data_pipeline_spark.streaming.sinks import (
        curate_stream_batch,
        pack_stream_assignments,
    )
    from yelp_data_pipeline_spark.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    mid = 250
    target = str(tmp_path / "curate_defaults")
    curate_stream_batch(docs.filter(F.col("doc_id") < mid), 0, target)
    curate_stream_batch(docs.filter(F.col("doc_id") >= mid), 1, target)

    got = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["start_offset"], r["pack_id"])
        for r in pack_stream_assignments(spark, target).collect()
    }
    twin = {s.name: s.fn for s in Q.registry()}["curated_packed_assignments"]
    want = {
        r["doc_id"]: (r["shard"], r["n_tokens"], r["start_offset"], r["pack_id"])
        for r in twin(spark, SF_DIR).collect()
    }
    assert got == want and len(got) > 100


def test_curate_stream_sink_via_real_writestream(spark, tmp_path):
    """The composite under an actual Structured Streaming driver
    (readStream → writeStream.foreachBatch, availableNow): multiple
    source files arrive as micro-batches, the sink curates+packs them,
    and a restart from the same checkpoint re-enters nothing."""
    from pyspark.sql import functions as F

    from yelp_data_pipeline_spark.streaming.sinks import (
        applied_batches,
        curate_stream_curated,
        curate_stream_sink,
        pack_stream_assignments,
    )

    src = tmp_path / "docsrc"
    src.mkdir()
    mk = TestCurateStreamSink()._docs
    mk(spark, range(0, 20)).coalesce(1).write.parquet(str(src / "f0"))
    mk(spark, range(20, 40)).coalesce(1).write.parquet(str(src / "f1"))
    target = str(tmp_path / "curate_stream")

    def run(ckpt):
        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("recursiveFileLookup", "true")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                curate_stream_sink(
                    target, quality_min=0.0, min_tokens=3, max_tokens=8,
                    seq_len=16, n_shards=2,
                )
            )
            .option("checkpointLocation", str(tmp_path / ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run("ckpt_a")
    cur1 = sorted(
        r["doc_id"] for r in curate_stream_curated(spark, target).collect()
    )
    asg1 = sorted(map(tuple, pack_stream_assignments(spark, target).collect()))
    assert len(applied_batches(target)) >= 1 and cur1
    # dups of earlier text (ids >= 20) were scrubbed across batches
    assert all(i < 20 for i in cur1)

    run("ckpt_a")  # restart, same checkpoint: nothing re-enters
    assert sorted(
        r["doc_id"] for r in curate_stream_curated(spark, target).collect()
    ) == cur1
    assert sorted(
        map(tuple, pack_stream_assignments(spark, target).collect())
    ) == asg1
