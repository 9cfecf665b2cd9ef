"""Streaming SOURCE over the manifest-versioned table
(streaming/versioned_source.py) — the Delta streaming-source twin on
Spark 4's Python Data Source API: version-number offsets, per-file
partitions, append-only contract, skipChangeCommits, checkpointed
resume, and the exactly-once table→stream→table round trip."""

import os

import pytest
from pyspark.sql import functions as F

from yelp_data_pipeline_spark.operators import versioned as vt
from yelp_data_pipeline_spark.streaming.versioned_source import (
    VersionedTableDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(VersionedTableDataSource)
    return spark


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, v string")


def _run(spark, src, ckpt, sink):
    q = (
        spark.readStream.format("versioned_table")
        .option("path", src)
        .load()
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)


def test_stream_reads_appends_and_resumes(registered, spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    vt.create_versioned(_df(spark, [(1, "a"), (2, "b")]), src)
    vt.append_versioned(_df(spark, [(3, "c")]), src)
    got = []
    _run(spark, src, ckpt, lambda b, i: got.extend(
        (r.k, r.v) for r in b.collect()
    ))
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c")]
    # Checkpointed resume: ONLY the new append is delivered — no
    # replays, no gaps (exactly-once offsets).
    vt.append_versioned(_df(spark, [(4, "d")]), src)
    got2 = []
    _run(spark, src, ckpt, lambda b, i: got2.extend(
        (r.k, r.v) for r in b.collect()
    ))
    assert got2 == [(4, "d")]
    # Nothing new: an availableNow run delivers nothing.
    got3 = []
    _run(spark, src, ckpt, lambda b, i: got3.extend(b.collect()))
    assert got3 == []


def test_stream_typed_columns_roundtrip(registered, spark, tmp_path):
    """Arrow-path fidelity for the engine's real column types:
    timestamps, dates, doubles, decimals survive the executor-side
    pyarrow read byte-exact."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    base = spark.sql(
        "SELECT id AS k, TIMESTAMP '1996-03-01 12:34:56' + make_interval(0,0,0,0,0,0,id) AS ts, "
        "DATE '1996-03-01' AS d, id * 1.5 AS x, CAST(id AS DECIMAL(27,4)) / 7 AS dec "
        "FROM range(10)"
    )
    vt.create_versioned(base, src)
    got = []
    _run(spark, src, ckpt, lambda b, i: got.extend(b.collect()))
    expect = {tuple(r) for r in base.collect()}
    assert {tuple(r) for r in got} == expect and len(got) == 10


def test_stream_refuses_change_commits_by_default(registered, spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    vt.create_versioned(_df(spark, [(1, "a"), (2, "b")]), src)
    vt.merge_versioned(spark, _df(spark, [(1, "A")]), src, ["k"])
    q = (
        spark.readStream.format("versioned_table")
        .option("path", src)
        .load()
        .writeStream.foreachBatch(lambda b, i: None)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="not an append"):
        q.awaitTermination(180)


def test_stream_skip_change_commits(registered, spark, tmp_path):
    """Delta's skipChangeCommits opt-in: merge/optimize commits
    contribute no rows; appends before and after still stream."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    vt.create_versioned(_df(spark, [(1, "a")]), src)
    vt.merge_versioned(spark, _df(spark, [(1, "A")]), src, ["k"])  # change
    vt.append_versioned(_df(spark, [(2, "b")]), src)
    got = []
    q = (
        spark.readStream.format("versioned_table")
        .option("path", src)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.foreachBatch(
            lambda b, i: got.extend((r.k, r.v) for r in b.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    # v0's create seeds the stream; the merge's rewritten files are
    # skipped; the append lands.
    assert sorted(got) == [(1, "a"), (2, "b")]


def test_stream_starting_version(registered, spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    vt.create_versioned(_df(spark, [(1, "a")]), src)
    vt.append_versioned(_df(spark, [(2, "b")]), src)
    vt.append_versioned(_df(spark, [(3, "c")]), src)
    got = []
    q = (
        spark.readStream.format("versioned_table")
        .option("path", src)
        .option("startingVersion", "2")
        .load()
        .writeStream.foreachBatch(
            lambda b, i: got.extend((r.k, r.v) for r in b.collect())
        )
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180)
    # startingVersion=2 seeds with v2's FULL snapshot (v2 files =
    # v0+v1+v2 accretive union — Delta's startingVersion reads the
    # named version's adds; our seed is the whole manifest, documented
    # as the initial snapshot).
    assert sorted(got) == [(1, "a"), (2, "b"), (3, "c")]


def test_stream_schema_evolution_null_pads(registered, spark, tmp_path):
    """Files written before an additive schema evolution NULL-pad the
    new column at the stream's declared type."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    vt.create_versioned(_df(spark, [(1, "a")]), src)
    vt.append_versioned(
        spark.createDataFrame([(2, "b", 9.5)], "k int, v string, w double"), src
    )
    got = []
    _run(spark, src, ckpt, lambda b, i: got.extend(
        (r.k, r.v, r.w) for r in b.collect()
    ))
    assert sorted(got) == [(1, "a", None), (2, "b", 9.5)]


def test_stream_to_versioned_sink_exactly_once(registered, spark, tmp_path):
    """The full round trip: versioned table A → streaming source →
    foreachBatch exactly-once append (batch_id in the manifest) →
    versioned table B. B equals A, and re-running the stream from the
    same checkpoint appends nothing (idempotent end to end)."""
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    ckpt = str(tmp_path / "ckpt")
    vt.create_versioned(_df(spark, [(1, "a"), (2, "b")]), a)
    vt.append_versioned(_df(spark, [(3, "c")]), a)

    def sink(batch_df, batch_id):
        vt.append_versioned_stream(
            batch_df.localCheckpoint(eager=True), b, batch_id
        )

    _run(spark, a, ckpt, sink)
    rows = {(r.k, r.v) for r in vt.read_version(spark, b).collect()}
    assert rows == {(1, "a"), (2, "b"), (3, "c")}
    b_version = vt.latest_version(b)
    # Replay the whole stream (fresh checkpoint): every batch_id is
    # already in B's manifests, so nothing lands twice... the batch
    # ids restart at 0, which append_versioned_stream deduplicates.
    _run(spark, a, str(tmp_path / "ckpt2"), sink)
    assert vt.latest_version(b) == b_version
    assert {(r.k, r.v) for r in vt.read_version(spark, b).collect()} == rows


def test_stream_seed_applies_deletion_vectors(registered, spark, tmp_path):
    """startingVersion seeding reads THROUGH the seed version's
    deletion vectors (tombstoned positions masked in the executor-side
    Arrow read), and a later DV delete is a change commit: refused by
    default, skipped under skipChangeCommits."""
    src = str(tmp_path / "src")
    vt.create_versioned(_df(spark, [(k, "a") for k in range(10)]), src)
    vt.delete_versioned(
        spark, src, "k IN (2, 7)", mode="dv", dv_rewrite_threshold=1.0
    )
    got = []
    q0 = (
        spark.readStream.format("versioned_table")
        .option("path", src)
        .option("startingVersion", "1")  # seed AT the DV snapshot
        .load()
        .writeStream.foreachBatch(
            lambda b, i: got.extend(r.k for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "c1"))
        .trigger(availableNow=True)
        .start()
    )
    assert q0.awaitTermination(180)
    assert sorted(got) == [0, 1, 3, 4, 5, 6, 8, 9]
    # New DV delete after the stream's offset: change commit.
    vt.delete_versioned(
        spark, src, "k = 5", mode="dv", dv_rewrite_threshold=1.0
    )
    q = (
        spark.readStream.format("versioned_table")
        .option("path", src)
        .load()
        .writeStream.foreachBatch(lambda b, i: None)
        .option("checkpointLocation", str(tmp_path / "c1"))
        .trigger(availableNow=True)
        .start()
    )
    from pyspark.errors.exceptions.captured import StreamingQueryException

    with pytest.raises(StreamingQueryException, match="not an append"):
        q.awaitTermination(180)
    # skipChangeCommits: the DV commit contributes nothing, a
    # subsequent append still streams.
    vt.append_versioned(_df(spark, [(100, "z")]), src)
    got2 = []
    q2 = (
        spark.readStream.format("versioned_table")
        .option("path", src)
        .option("skipChangeCommits", "true")
        .load()
        .writeStream.foreachBatch(
            lambda b, i: got2.extend(r.k for r in b.collect())
        )
        .option("checkpointLocation", str(tmp_path / "c2"))
        .trigger(availableNow=True)
        .start()
    )
    assert q2.awaitTermination(180)
    # Fresh checkpoint seeds at v0 (pre-delete), skips both DV
    # commits, then the append: 10 + 1 rows.
    assert sorted(got2) == list(range(10)) + [100]


def test_max_files_per_trigger_drains_backlog(registered, spark, tmp_path):
    """Admission control (Delta's maxFilesPerTrigger): a 30-commit
    backlog with a 5-files-per-trigger cap drains in multiple capped
    micro-batches — batch boundaries at version granularity — and the
    streamed rows equal the table snapshot exactly. (Uses a
    processingTime trigger: availableNow in the Python Data Source
    API fixes its drain target at the FIRST latestOffset, so a capped
    stream under availableNow processes one capped batch — see the
    module docstring.)"""
    import time

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    vt.create_versioned(_df(spark, [(0, "v0")]).coalesce(1), src)
    for i in range(1, 30):
        vt.append_versioned(_df(spark, [(i, f"v{i}")]).coalesce(1), src)
    assert vt.latest_version(src) == 29
    assert vt.read_manifest(src, 29)["n_files"] == 30  # 1 file/commit
    batches = []
    q = (
        spark.readStream.format("versioned_table")
        .option("path", src)
        .option("maxFilesPerTrigger", "5")
        .load()
        .writeStream.foreachBatch(
            lambda b, i: batches.append(sorted((r.k, r.v) for r in b.collect()))
        )
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds")
        .start()
    )
    deadline = time.time() + 150
    while time.time() < deadline:
        if sum(len(b) for b in batches) >= 30:
            break
        time.sleep(0.5)
    q.stop()
    non_empty = [b for b in batches if b]
    # 30 single-file commits / cap 5 = 6 capped micro-batches.
    assert len(non_empty) == 6
    assert all(len(b) == 5 for b in non_empty)
    got = sorted(r for b in batches for r in b)
    want = sorted(
        (r.k, r.v) for r in vt.read_version(spark, src).collect()
    )
    assert got == want


def test_max_bytes_per_trigger_admits_at_least_one_version(
    registered, spark, tmp_path
):
    """maxBytesPerTrigger is a SOFT cap: even a 1-byte cap admits the
    first pending version each trigger (the stream must progress), so
    a 4-commit backlog becomes 4 one-version micro-batches, never a
    stall."""
    import time

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    vt.create_versioned(_df(spark, [(0, "a")]).coalesce(1), src)
    for i in range(1, 4):
        vt.append_versioned(_df(spark, [(i, "a")]).coalesce(1), src)
    batches = []
    q = (
        spark.readStream.format("versioned_table")
        .option("path", src)
        .option("maxBytesPerTrigger", "1")
        .load()
        .writeStream.foreachBatch(
            lambda b, i: batches.append(b.count())
        )
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 seconds")
        .start()
    )
    deadline = time.time() + 120
    while time.time() < deadline:
        if sum(batches) >= 4:
            break
        time.sleep(0.5)
    q.stop()
    assert [n for n in batches if n] == [1, 1, 1, 1]
