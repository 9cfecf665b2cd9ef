"""Manifest-based versioned table (operators/versioned.py) — the
jar-free Delta-semantics twin: time travel, append file-sharing,
RESTORE, VACUUM retention, optimistic-concurrency commit, crash
orphan invisibility."""

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from yelp_data_pipeline_spark.operators import versioned as vt


def _df(spark, rows):
    return spark.createDataFrame(rows, "k int, val string")


def _vals(df):
    return {(r.k, r.val) for r in df.collect()}


def test_create_merge_time_travel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a"), (2, "b")]), t)
    vt.merge_versioned(spark, _df(spark, [(2, "B"), (3, "c")]), t, ["k"])

    assert vt.list_versions(t) == [0, 1]
    # Time travel: version 0 is intact AFTER the merge commit.
    assert _vals(vt.read_version(spark, t, 0)) == {(1, "a"), (2, "b")}
    # Latest = MERGE semantics: matched row updated, new row inserted.
    assert _vals(vt.read_version(spark, t)) == {(1, "a"), (2, "B"), (3, "c")}


def test_merge_on_empty_table_creates(spark, tmp_path):
    t = str(tmp_path / "tbl")
    m = vt.merge_versioned(spark, _df(spark, [(1, "a")]), t, ["k"])
    assert m["version"] == 0 and m["op"] == "overwrite"
    assert _vals(vt.read_version(spark, t)) == {(1, "a")}


def test_append_shares_previous_files(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = vt.create_versioned(_df(spark, [(1, "a")]), t)
    v1 = vt.append_versioned(_df(spark, [(2, "b")]), t)
    # Zero-rewrite append: every v0 physical file is re-referenced.
    assert set(v0["files"]) < set(v1["files"])
    assert _vals(vt.read_version(spark, t, 1)) == {(1, "a"), (2, "b")}
    assert _vals(vt.read_version(spark, t, 0)) == {(1, "a")}


def test_restore_is_metadata_only(spark, tmp_path):
    t = str(tmp_path / "tbl")
    v0 = vt.create_versioned(_df(spark, [(1, "a")]), t)
    vt.merge_versioned(spark, _df(spark, [(1, "A")]), t, ["k"])
    before = set(glob.glob(os.path.join(t, "data", "*", "*.parquet")))
    m = vt.restore_versioned(t, 0)
    after = set(glob.glob(os.path.join(t, "data", "*", "*.parquet")))
    assert before == after  # no data files written
    assert m["files"] == v0["files"]
    assert _vals(vt.read_version(spark, t)) == {(1, "a")}
    # Intervening history still readable.
    assert _vals(vt.read_version(spark, t, 1)) == {(1, "A")}


def test_concurrent_commit_loses_cleanly(spark, tmp_path):
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)
    # Simulate a racing writer that won version 1.
    os.makedirs(os.path.join(t, "_manifest"), exist_ok=True)
    with open(os.path.join(t, "_manifest", "v00000001.json"), "w") as f:
        json.dump({"version": 1, "op": "append", "files": [], "n_files": 0}, f)
    with pytest.raises(vt.ConcurrentCommitError):
        vt._commit_manifest(t, 1, "merge", [])
    # Table state untouched by the loser.
    assert _vals(vt.read_version(spark, t, 0)) == {(1, "a")}


def test_crashed_writer_orphans_invisible_then_vacuumed(spark, tmp_path):
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)
    # Crash between step 1 (data write) and step 2 (manifest commit):
    # files exist, nothing references them.
    orphans = vt._write_snapshot_files(_df(spark, [(9, "z")]), t)
    assert orphans
    assert _vals(vt.read_version(spark, t)) == {(1, "a")}  # invisible
    # Default retention window: the young orphans are indistinguishable
    # from a LIVE writer's step-1 files, so vacuum keeps them.
    assert vt.vacuum_versioned(t) == 0
    for f in orphans:
        assert os.path.exists(os.path.join(t, f))
    # Past the window (retention 0 = operator asserts no writer in
    # flight) they are crashed-writer garbage and go.
    deleted = vt.vacuum_versioned(t, retention_seconds=0)
    assert deleted == len(orphans)
    for f in orphans:
        assert not os.path.exists(os.path.join(t, f))
    assert _vals(vt.read_version(spark, t)) == {(1, "a")}  # unharmed


def test_vacuum_retention_keeps_retained_versions_readable(spark, tmp_path):
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)
    vt.merge_versioned(spark, _df(spark, [(1, "A")]), t, ["k"])
    vt.merge_versioned(spark, _df(spark, [(2, "b")]), t, ["k"])
    deleted = vt.vacuum_versioned(t, keep_versions=2)
    assert deleted > 0  # v0's snapshot files dropped
    assert vt.list_versions(t) == [1, 2]
    assert _vals(vt.read_version(spark, t, 1)) == {(1, "A")}
    assert _vals(vt.read_version(spark, t, 2)) == {(1, "A"), (2, "b")}
    with pytest.raises(FileNotFoundError):
        vt.read_manifest(t, 0)


def test_version_history(spark, tmp_path):
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)
    vt.append_versioned(_df(spark, [(2, "b")]), t)
    vt.restore_versioned(t, 0)
    hist = vt.version_history(spark, t).orderBy("version").collect()
    assert [(r.version, r.op) for r in hist] == [
        (0, "overwrite"),
        (1, "append"),
        (2, "restore(0)"),
    ]
    assert all(r.n_files >= 1 for r in hist)


def test_empty_snapshot_reads_typed_empty(spark, tmp_path):
    """An empty batch committed as a version reads back as a TYPED
    empty relation (manifest carries the schema, like Delta's
    metaData action) — the engine's empty-relation posture."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, []), t)
    out = vt.read_version(spark, t)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["k", "val"]
    # Non-empty merge on top of the empty v0 still works.
    vt.merge_versioned(spark, _df(spark, [(1, "a")]), t, ["k"])
    assert _vals(vt.read_version(spark, t)) == {(1, "a")}


def test_optimize_compacts_as_new_version(spark, tmp_path):
    """OPTIMIZE: fewer files, same rows, prior versions intact."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]).repartition(4), t)
    vt.append_versioned(_df(spark, [(2, "b")]).repartition(4), t)
    before = vt.read_manifest(t, 1)
    m = vt.optimize_versioned(spark, t, target_file_bytes=1 << 30)
    assert m["op"] == "optimize"
    assert m["n_files"] < before["n_files"]
    assert _vals(vt.read_version(spark, t)) == {(1, "a"), (2, "b")}
    # The pre-optimize version still reads from its original files.
    assert _vals(vt.read_version(spark, t, 1)) == {(1, "a"), (2, "b")}
    # Vacuum retires the fat layout; the optimized version survives.
    vt.vacuum_versioned(t, keep_versions=1)
    assert _vals(vt.read_version(spark, t, 2)) == {(1, "a"), (2, "b")}


def test_read_version_diff_incremental(spark, tmp_path):
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)
    vt.append_versioned(_df(spark, [(2, "b")]), t)
    vt.append_versioned(_df(spark, [(3, "c")]), t)
    # CDF-for-appends: rows added after v0, after v1, and the
    # empty diff of a version against itself (typed empty relation).
    assert _vals(vt.read_version_diff(spark, t, 0)) == {(2, "b"), (3, "c")}
    assert _vals(vt.read_version_diff(spark, t, 1, 2)) == {(3, "c")}
    empty = vt.read_version_diff(spark, t, 2, 2)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["k", "val"]
    # A merge rewrites files: the file-level diff is no longer the
    # row-level diff, so the read must refuse.
    vt.merge_versioned(spark, _df(spark, [(1, "A")]), t, ["k"])
    with pytest.raises(ValueError, match="anti-join"):
        vt.read_version_diff(spark, t, 0)


def test_concurrent_appends_with_retry_both_land(spark, tmp_path):
    """TWO writers racing real commits: put-if-absent picks exactly one
    winner per version; the loser's commit_with_retry rebases onto the
    new latest and lands next. Both rows present, versions contiguous,
    no file orphaned into the final state."""
    from concurrent.futures import ThreadPoolExecutor

    from yelp_data_pipeline_spark.operators.versioned import commit_with_retry

    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(0, "base")]), t)

    def writer(row):
        # append_versioned re-reads latest on each attempt — the shape
        # commit_with_retry requires.
        return commit_with_retry(
            lambda: vt.append_versioned(_df(spark, [row]), t), retries=5
        )

    with ThreadPoolExecutor(max_workers=2) as ex:
        f1 = ex.submit(writer, (1, "a"))
        f2 = ex.submit(writer, (2, "b"))
        m1, m2 = f1.result(60), f2.result(60)

    assert sorted([m1["version"], m2["version"]]) == [1, 2]
    assert vt.list_versions(t) == [0, 1, 2]
    assert _vals(vt.read_version(spark, t)) == {(0, "base"), (1, "a"), (2, "b")}
    # The retry loop surfaces after exhaustion.
    import pytest as _pytest

    with _pytest.raises(vt.ConcurrentCommitError):
        commit_with_retry(
            lambda: (_ for _ in ()).throw(vt.ConcurrentCommitError("x")),
            retries=2,
        )


def test_append_schema_evolution(spark, tmp_path):
    """Additive append evolution (Delta mergeSchema contract): the new
    column unions into the table schema; every read applies the
    MANIFEST schema, so pre-evolution files yield NULL for it — and
    time travel to the pre-evolution version keeps the old shape."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)
    wider = spark.createDataFrame([(2, "b", 9.5)], "k int, val string, score double")
    vt.append_versioned(wider, t)

    latest = vt.read_version(spark, t)
    assert [f.name for f in latest.schema.fields] == ["k", "val", "score"]
    got = {(r.k, r.val, r.score) for r in latest.collect()}
    assert got == {(1, "a", None), (2, "b", 9.5)}
    # Pre-evolution version: original two-column shape.
    assert vt.read_version(spark, t, 0).columns == ["k", "val"]
    # Increment read carries the evolved shape.
    diff = vt.read_version_diff(spark, t, 0, 1)
    assert {(r.k, r.val, r.score) for r in diff.collect()} == {(2, "b", 9.5)}
    # A type CHANGE on an existing column must refuse.
    clash = spark.createDataFrame([(3, 7)], "k int, val int")
    with pytest.raises(TypeError, match="rewrite"):
        vt.append_versioned(clash, t)


def test_optimize_zorder_tightens_bounding_boxes(spark, tmp_path):
    """OPTIMIZE ZORDER BY parity: after a z-ordered rewrite each file's
    (x, y) bounding box is a tile, so the summed box area collapses vs
    the round-robin layout where every file spans the whole domain —
    measured from the real parquet footer statistics."""
    import glob as _glob

    import pyarrow.parquet as pq

    def box_area_sum(table_dir, version):
        m = vt.read_manifest(table_dir, version)
        total = 0.0
        for f in m["files"]:
            meta = pq.ParquetFile(os.path.join(table_dir, f)).metadata
            xs, ys = [], []
            for rg in range(meta.num_row_groups):
                for ci in range(meta.num_columns):
                    col = meta.row_group(rg).column(ci)
                    st = col.statistics
                    name = col.path_in_schema
                    if name == "x":
                        xs += [st.min, st.max]
                    elif name == "y":
                        ys += [st.min, st.max]
            total += (max(xs) - min(xs) + 1) * (max(ys) - min(ys) + 1)
        return total

    t = str(tmp_path / "tbl")
    grid = spark.createDataFrame(
        [(x, y) for x in range(32) for y in range(32)], "x int, y int"
    ).repartition(4)  # round-robin: every file spans the full domain
    vt.create_versioned(grid, t)
    m = vt.optimize_versioned(spark, t, target_file_bytes=2_500, zorder_by=["x", "y"])
    assert m["op"] == "optimize_zorder(x,y)"
    assert m["n_files"] >= 2
    # Same rows, any version.
    assert vt.read_version(spark, t, 1).count() == 1024
    before, after = box_area_sum(t, 0), box_area_sum(t, 1)
    assert after < 0.5 * before, (before, after)
    # A z-ordered rewrite is a file REWRITE: incremental diff refuses.
    with pytest.raises(ValueError, match="anti-join"):
        vt.read_version_diff(spark, t, 0)
    assert _glob.glob(os.path.join(t, "data", "*", "*.parquet"))


def test_stream_append_replay_skipped(spark, tmp_path):
    """Exactly-once streaming appends: a replayed (crash-redelivered)
    batch_id is a no-op; the race loser's retry also no-ops."""
    from yelp_data_pipeline_spark.operators.versioned import (
        append_versioned_stream,
        last_committed_batch,
    )

    t = str(tmp_path / "tbl")
    m0 = append_versioned_stream(_df(spark, [(1, "a")]), t, 0)
    assert m0["batch_id"] == 0 and m0["version"] == 0
    m1 = append_versioned_stream(_df(spark, [(2, "b")]), t, 1)
    assert m1["version"] == 1
    # Replay batch 1 (same id, same data — Structured Streaming's
    # at-least-once redelivery): skipped, state unchanged.
    assert append_versioned_stream(_df(spark, [(2, "b")]), t, 1) is None
    assert _vals(vt.read_version(spark, t)) == {(1, "a"), (2, "b")}
    assert vt.list_versions(t) == [0, 1]
    assert last_committed_batch(t) == 1
    # A stale batch id (0) after batch 1 committed: also skipped.
    assert append_versioned_stream(_df(spark, [(9, "z")]), t, 0) is None


def test_stream_append_through_real_writestream(spark, tmp_path):
    """Drive versioned_append_sink under a REAL Structured Streaming
    query (file source, availableNow): each micro-batch becomes a
    version, the final state is the union, and read_version_diff
    exposes the per-batch increments."""
    import time as _time

    from yelp_data_pipeline_spark.streaming.sinks import versioned_append_sink

    src = tmp_path / "src"
    src.mkdir()
    t = str(tmp_path / "tbl")
    _df(spark, [(1, "a")]).coalesce(1).write.parquet(str(src / "b0"))
    _time.sleep(1.1)  # file source orders by mod time
    _df(spark, [(2, "b")]).coalesce(1).write.parquet(str(src / "b1"))

    stream = (
        spark.readStream.schema("k int, val string")
        .option("maxFilesPerTrigger", "1")
        .option("recursiveFileLookup", "true")
        .parquet(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(versioned_append_sink(t))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert vt.list_versions(t) == [0, 1]
    assert _vals(vt.read_version(spark, t)) == {(1, "a"), (2, "b")}
    assert _vals(vt.read_version_diff(spark, t, 0, 1)) == {(2, "b")}


def test_merge_rerun_idempotent(spark, tmp_path):
    """Same updates merged twice: version advances, STATE is equal —
    the property the reference's Airflow retries rely on."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a"), (2, "b")]), t)
    upd = _df(spark, [(2, "B"), (3, "c")])
    vt.merge_versioned(spark, upd, t, ["k"])
    once = _vals(vt.read_version(spark, t))
    vt.merge_versioned(spark, upd, t, ["k"])
    assert _vals(vt.read_version(spark, t)) == once


def test_restore_to_earlier_version_refuses_file_diff(spark, tmp_path):
    """A restore to an EARLIER version removes rows; the file-level
    diff validates the actual superset invariant (not op names) and
    refuses, instead of silently omitting the removals."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)
    vt.append_versioned(_df(spark, [(2, "b")]), t)
    vt.restore_versioned(t, 0)  # drops (2, "b") — files shrink
    with pytest.raises(ValueError, match="anti-join"):
        vt.read_version_diff(spark, t, 0)
    # A restore that doesn't shrink the file set (restore to the
    # current state) still diffs fine.
    vt.restore_versioned(t, 1)


def test_truncated_manifest_never_published(spark, tmp_path):
    """Atomic manifest publish: a crash mid-serialization leaves only
    an invisible temp file — version n stays claimable and readers
    never see a truncated manifest."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)

    class Boom(RuntimeError):
        pass

    real_dump = json.dump

    def exploding_dump(obj, fh, *a, **k):
        fh.write('{"version": 1, "op": "appe')  # partial bytes
        raise Boom()

    import yelp_data_pipeline_spark.operators.versioned as _vt

    orig = _vt.json.dump
    _vt.json.dump = exploding_dump
    try:
        with pytest.raises(Boom):
            vt._commit_manifest(t, 1, "append", [])
    finally:
        _vt.json.dump = orig
    # Nothing published: version 1 is still claimable, readers clean.
    assert vt.list_versions(t) == [0]
    assert _vals(vt.read_version(spark, t)) == {(1, "a")}
    m = vt._commit_manifest(t, 1, "append", [], _df(spark, []).schema.json())
    assert m["version"] == 1
    assert real_dump is json.dump


def test_partitioned_merge_rewrites_only_touched_partitions(spark, tmp_path):
    """Delta's file-pruned MERGE over the manifest log: only the
    partitions named by the updates are rewritten; every other
    partition's physical files are RE-REFERENCED byte-identical, and
    the new files all live in touched partitions."""
    import hashlib

    def md5s(table, files):
        return {
            f: hashlib.md5(
                open(os.path.join(table, f), "rb").read()
            ).hexdigest()
            for f in files
        }

    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(k, f"v{k}", k % 4) for k in range(40)], "k int, val string, pm int"
    )
    m0 = vt.create_versioned(base, t, partition_by=["pm"])
    assert m0["partition_by"] == ["pm"]
    assert all("pm=" in f for f in m0["files"])
    # Updates touch ONLY partitions 1 and 2: update k=1 (pm=1),
    # insert k=101 (pm=1), k=102 (pm=2).
    upd = spark.createDataFrame(
        [(1, "V1", 1), (101, "new1", 1), (102, "new2", 2)],
        "k int, val string, pm int",
    )
    untouched_before = [
        f for f in m0["files"]
        if vt._file_partition_values(f, ["pm"]) not in {("1",), ("2",)}
    ]
    sums_before = md5s(t, untouched_before)
    m1 = vt.merge_versioned(spark, upd, t, ["k"])
    # Untouched partitions (pm=0, pm=3): same physical files,
    # byte-identical — re-referenced, not rewritten.
    assert set(untouched_before) <= set(m1["files"])
    assert md5s(t, untouched_before) == sums_before
    # Every NEW file lives in a touched partition.
    new_files = set(m1["files"]) - set(m0["files"])
    assert new_files
    assert {
        vt._file_partition_values(f, ["pm"]) for f in new_files
    } <= {("1",), ("2",)}
    # File-count bound: old untouched + new touched only (no file of a
    # touched partition's OLD layout is re-referenced).
    old_touched = [
        f for f in m0["files"]
        if vt._file_partition_values(f, ["pm"]) in {("1",), ("2",)}
    ]
    assert not (set(old_touched) & set(m1["files"]))
    assert len(m1["files"]) == len(untouched_before) + len(new_files)
    # MERGE semantics hold across the whole table.
    got = {(r.k, r.val, r.pm) for r in vt.read_version(spark, t).collect()}
    want = {(k, f"v{k}", k % 4) for k in range(40) if k != 1}
    want |= {(1, "V1", 1), (101, "new1", 1), (102, "new2", 2)}
    assert got == want
    # Time travel: v0 intact, partition columns recovered.
    assert vt.read_version(spark, t, 0).count() == 40


def test_partitioned_append_and_diff(spark, tmp_path):
    """Appends on a partitioned table keep the layout and the
    incremental diff read recovers partition columns from the paths."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(
        spark.createDataFrame([(1, "a", 1)], "k int, val string, pm int"),
        t,
        partition_by=["pm"],
    )
    m1 = vt.append_versioned(
        spark.createDataFrame([(2, "b", 2)], "k int, val string, pm int"), t
    )
    assert m1["partition_by"] == ["pm"]
    d = vt.read_version_diff(spark, t, 0, 1)
    assert {(r.k, r.val, r.pm) for r in d.collect()} == {(2, "b", 2)}
    got = {(r.k, r.val, r.pm) for r in vt.read_version(spark, t).collect()}
    assert got == {(1, "a", 1), (2, "b", 2)}


def test_version_changes_cdf(spark, tmp_path):
    """Row-level change feed (Delta CDF): keyed insert / delete /
    update_preimage+postimage across a merge+overwrite lineage that
    read_version_diff refuses."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a"), (2, "b"), (3, "c")]), t)
    # v1 = merge: update k=2, insert k=4.
    vt.merge_versioned(spark, _df(spark, [(2, "B"), (4, "d")]), t, ["k"])
    ch = vt.version_changes(spark, t, 0, 1, keys=["k"])
    got = {(r.k, r.val, r._change_type) for r in ch.collect()}
    assert got == {
        (4, "d", "insert"),
        (2, "b", "update_preimage"),
        (2, "B", "update_postimage"),
    }
    # v2 = overwrite dropping k=1: a delete appears.
    vt.create_versioned(_df(spark, [(2, "B"), (3, "c"), (4, "d")]), t)
    ch2 = vt.version_changes(spark, t, 1, 2, keys=["k"])
    got2 = {(r.k, r.val, r._change_type) for r in ch2.collect()}
    assert got2 == {(1, "a", "delete")}
    # Unkeyed: full-row multiset diff, insert/delete encoding.
    ch3 = vt.version_changes(spark, t, 0, 2)
    got3 = {(r.k, r.val, r._change_type) for r in ch3.collect()}
    assert got3 == {
        (1, "a", "delete"),
        (2, "b", "delete"),
        (2, "B", "insert"),
        (4, "d", "insert"),
    }


def test_version_changes_append_fast_path_agreement(spark, tmp_path):
    """On a pure append lineage version_changes and read_version_diff
    agree: every change is an insert and the row sets match — the
    relational path generalizes the file-level fast path."""
    from pyspark.sql import functions as F

    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)
    vt.append_versioned(_df(spark, [(2, "b"), (3, "c")]), t)
    fast = vt.read_version_diff(spark, t, 0, 1).withColumn(
        "_change_type", F.lit("insert")
    )
    slow = vt.version_changes(spark, t, 0, 1, keys=["k"])
    as_set = lambda df: {(r.k, r.val, r._change_type) for r in df.collect()}
    assert as_set(fast) == as_set(slow)
    # Unkeyed agrees too.
    assert as_set(fast) == as_set(vt.version_changes(spark, t, 0, 1))


def test_manifest_checkpoint_bounds_history_reads(spark, tmp_path):
    """500-commit table: last_committed_batch / version_history read
    the latest checkpoint + log tail — manifest opens stay
    O(CHECKPOINT_EVERY), not O(commit count)."""
    import yelp_data_pipeline_spark.operators.versioned as _vt

    t = str(tmp_path / "tbl")
    schema_json = _df(spark, []).schema.json()
    for v in range(500):
        _vt._commit_manifest(
            t, v, "append", [], schema_json, {"batch_id": v}
        )
    # Versions 0..499: the last checkpoint-eligible version is 490.
    assert _vt.latest_checkpoint(t)["version"] == 490

    counter = {"n": 0}
    orig = _vt.read_manifest

    def counting(table, version):
        counter["n"] += 1
        return orig(table, version)

    _vt.read_manifest = counting
    try:
        assert _vt.last_committed_batch(t) == 499
        reads_batch = counter["n"]
        counter["n"] = 0
        hist = _vt.version_history(spark, t)
        assert hist.count() == 500
        reads_hist = counter["n"]
    finally:
        _vt.read_manifest = orig
    # Tail after the v490 checkpoint = 9 manifests; generous bound.
    assert reads_batch <= 2 * _vt.CHECKPOINT_EVERY, reads_batch
    assert reads_hist <= 2 * _vt.CHECKPOINT_EVERY, reads_hist
    # History is complete and correct despite the bounded reads.
    rows = hist.orderBy("version").collect()
    assert [r.version for r in rows] == list(range(500))
    assert all(r.op == "append" for r in rows)


def test_optimize_append_race_loser_rebases(spark, tmp_path):
    """Compaction-under-ingest race: OPTIMIZE and an append race for
    version n. The append should WIN (its rebase is cheap — re-point
    at the new latest + its own files) and OPTIMIZE should re-run (it
    is idempotent maintenance; rebasing its output without re-reading
    would silently drop the appended rows). Deterministic interleave:
    the append lands between optimize's snapshot read and its commit;
    optimize loses put-if-absent, commit_with_retry re-runs it against
    the new latest, and the final table carries BOTH effects."""
    import yelp_data_pipeline_spark.operators.versioned as _vt

    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]).repartition(4), t)

    sneak = {"armed": True}
    orig_commit = _vt._commit_manifest

    def racing_commit(table, version, op, files, schema_json=None, extra=None):
        if op.startswith("optimize") and sneak["armed"]:
            sneak["armed"] = False  # before the append re-enters here
            vt.append_versioned(_df(spark, [(2, "b")]), t)  # wins version n
        return orig_commit(table, version, op, files, schema_json, extra)

    _vt._commit_manifest = racing_commit
    try:
        m = vt.commit_with_retry(
            lambda: vt.optimize_versioned(spark, t, target_file_bytes=1 << 30),
            retries=3,
        )
    finally:
        _vt._commit_manifest = orig_commit
    # The append won version 1; optimize re-ran and landed at 2,
    # compacting the union (so the appended row is IN the rewrite).
    assert vt.list_versions(t) == [0, 1, 2]
    assert m["version"] == 2 and m["op"] == "optimize"
    assert _vals(vt.read_version(spark, t)) == {(1, "a"), (2, "b")}
    assert m["n_files"] < len(vt.read_manifest(t, 1)["files"])
    # Every retained version stays readable.
    assert _vals(vt.read_version(spark, t, 1)) == {(1, "a"), (2, "b")}


def test_manifest_stats_recorded_and_carried(spark, tmp_path):
    """Commits record per-file column min/max (parquet footers); an
    append carries re-referenced files' stats forward and adds the new
    files' — Delta's add-action stats model."""
    t = str(tmp_path / "tbl")
    m0 = vt.create_versioned(_df(spark, [(1, "a"), (5, "e")]), t)
    assert m0["stats"]
    # Every file has a stats entry; zero-row part files legitimately
    # have no per-column stats (no row groups) and are never pruned.
    assert set(m0["stats"]) == set(m0["files"])
    with_k = [s for s in m0["stats"].values() if "k" in s]
    assert with_k
    assert min(s["k"][0] for s in with_k) == 1
    assert max(s["k"][1] for s in with_k) == 5
    assert all("val" in s for s in with_k)
    m1 = vt.append_versioned(_df(spark, [(9, "z")]), t)
    # Old files' stats identical (carried), new files' stats present.
    for f in m0["files"]:
        assert m1["stats"][f] == m0["stats"][f]
    new = set(m1["files"]) - set(m0["files"])
    new_k = [m1["stats"][f]["k"] for f in new if "k" in m1["stats"][f]]
    assert new_k and all(kk == [9, 9] for kk in new_k)


def test_read_version_pruned_skips_files_exactly(spark, tmp_path):
    """Data skipping on a clustered layout: a selective range probe
    scans a strict subset of files, and the result is IDENTICAL to
    filtering the full snapshot (pruning is pure I/O avoidance)."""
    import datetime

    t = str(tmp_path / "tbl")
    rows = [
        (k, datetime.date(1994, 1, 1) + datetime.timedelta(days=k), float(k))
        for k in range(400)
    ]
    df = spark.createDataFrame(rows, "k int, d date, x double").repartition(8)
    vt.create_versioned(df, t)
    # Cluster on k so files own disjoint ranges (write_clustered).
    vt.optimize_versioned(spark, t, target_file_bytes=2_000, sort_within_by=["k"])
    m = vt.read_manifest(t, 1)
    assert m["n_files"] >= 4
    conds = {"k": (100, 140)}
    cand = vt.prune_files_by_stats(m, conds)
    assert 0 < len(cand) < m["n_files"]  # strict pruning happened
    got = {r.k for r in vt.read_version_pruned(spark, t, conds).collect()}
    assert got == set(range(100, 141))
    # Date-typed pruning (ISO-encoded stats): same discipline.
    dconds = {"d": (datetime.date(1994, 4, 11), datetime.date(1994, 5, 21))}
    dcand = vt.prune_files_by_stats(m, dconds)
    assert 0 < len(dcand) < m["n_files"]
    dgot = {r.k for r in vt.read_version_pruned(spark, t, dconds).collect()}
    assert dgot == set(range(100, 141))
    # Open bounds + unknown column: sound over-approximation (keep all).
    assert vt.prune_files_by_stats(m, {"nope": (0, 1)}) == m["files"]
    half = {r.k for r in vt.read_version_pruned(spark, t, {"k": (350, None)}).collect()}
    assert half == set(range(350, 400))
    # A probe entirely outside the table: zero files, typed empty.
    empty = vt.read_version_pruned(spark, t, {"k": (10_000, 20_000)})
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == ["k", "d", "x"]


def test_check_constraints_enforced_on_commit(spark, tmp_path):
    """Delta CHECK-constraint parity: add_constraint validates the
    existing snapshot and commits metadata-only; later appends/merges
    validate their BATCH (one combined scan, never the table); a
    violating commit raises and publishes NOTHING; constraints carry
    across append/merge/optimize/overwrite; NULL passes (SQL standard);
    drop_constraint lifts enforcement."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a"), (2, "b")]), t)
    m = vt.add_constraint(spark, t, "k_pos", "k > 0")
    assert m["op"] == "add_constraint(k_pos)" and m["constraints"] == {"k_pos": "k > 0"}
    # Metadata-only: same files as v0.
    assert m["files"] == vt.read_manifest(t, 0)["files"]
    # Adding a constraint the snapshot violates: refused, not committed.
    with pytest.raises(vt.ConstraintViolation):
        vt.add_constraint(spark, t, "k_big", "k > 10")
    assert vt.latest_version(t) == 1
    # Valid append passes; violating append refused with NO new version.
    vt.append_versioned(_df(spark, [(3, "c")]), t)
    with pytest.raises(vt.ConstraintViolation, match="k_pos"):
        vt.append_versioned(_df(spark, [(-1, "x")]), t)
    assert vt.latest_version(t) == 2
    # NULL passes (SQL-standard CHECK), and the constraint carries
    # through merge and overwrite commits.
    vt.merge_versioned(spark, _df(spark, [(None, "n"), (3, "C")]), t, ["k"])
    with pytest.raises(vt.ConstraintViolation):
        vt.merge_versioned(spark, _df(spark, [(-5, "x")]), t, ["k"])
    vt.create_versioned(_df(spark, [(7, "z")]), t)  # overwrite
    assert vt.read_manifest(t, vt.latest_version(t))["constraints"] == {
        "k_pos": "k > 0"
    }
    with pytest.raises(vt.ConstraintViolation):
        vt.create_versioned(_df(spark, [(-7, "z")]), t)
    # Streaming appends enforce too.
    assert vt.append_versioned_stream(_df(spark, [(8, "s")]), t, 99) is not None
    with pytest.raises(vt.ConstraintViolation):
        vt.append_versioned_stream(_df(spark, [(-8, "s")]), t, 100)
    # Drop: enforcement lifted, recorded as a metadata-only commit.
    vt.drop_constraint(t, "k_pos")
    vt.append_versioned(_df(spark, [(-1, "x")]), t)
    assert (-1, "x") in _vals(vt.read_version(spark, t))


def test_partition_scoped_optimize(spark, tmp_path):
    """OPTIMIZE ... WHERE parity: compact only the hot partition's
    small files; cold partitions' files are re-referenced untouched."""
    t = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(k, f"v{k}", k % 3) for k in range(30)], "k int, val string, pm int"
    ).repartition(6)
    vt.create_versioned(base, t, partition_by=["pm"])
    m0 = vt.read_manifest(t, 0)
    cold = [f for f in m0["files"] if vt._file_partition_values(f, ["pm"]) != ("1",)]
    hot = [f for f in m0["files"] if vt._file_partition_values(f, ["pm"]) == ("1",)]
    assert len(hot) > 1  # fragmented hot partition to compact
    m1 = vt.optimize_versioned(
        spark, t, target_file_bytes=1 << 30, partition_filter={"pm": 1}
    )
    # Cold files identical references; hot partition compacted.
    assert set(cold) <= set(m1["files"])
    new = set(m1["files"]) - set(m0["files"])
    assert new and all(
        vt._file_partition_values(f, ["pm"]) == ("1",) for f in new
    )
    assert len(new) < len(hot)
    assert not (set(hot) & set(m1["files"]))
    got = {(r.k, r.val, r.pm) for r in vt.read_version(spark, t).collect()}
    assert got == {(k, f"v{k}", k % 3) for k in range(30)}
    # Guardrails: unpartitioned table / no matching partition refuse.
    with pytest.raises(ValueError, match="no files match"):
        vt.optimize_versioned(spark, t, partition_filter={"pm": 99})
    t2 = str(tmp_path / "flat")
    vt.create_versioned(_df(spark, [(1, "a")]), t2)
    with pytest.raises(ValueError, match="partitioned"):
        vt.optimize_versioned(spark, t2, partition_filter={"pm": 1})


def test_vacuum_partitioned_table_cleans_nested_files(spark, tmp_path):
    """Partitioned commits nest data files under Hive-style col=value
    subdirectories; vacuum must walk them (a flat listing either
    missed retired files or hit IsADirectoryError on aged orphan
    partition dirs) and the retention window must apply to nested
    step-1 files of a live writer too."""
    t = str(tmp_path / "tbl")
    pdf = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, p string, v int"
    )
    vt.create_versioned(pdf, t, partition_by=["p"])
    retired = vt.read_manifest(t, 0)["files"]
    assert all("p=" in f for f in retired)  # nested layout in play
    vt.create_versioned(
        spark.createDataFrame([(3, "a", 30)], "k int, p string, v int"), t
    )
    # Nested step-1 files of a simulated in-flight writer: kept inside
    # the retention window even though no manifest references them.
    orphans = vt._write_snapshot_files(
        spark.createDataFrame([(9, "z", 90)], "k int, p string, v int"), t, ["p"]
    )
    assert vt.vacuum_versioned(t, keep_versions=1) == len(retired)
    for f in retired:
        assert not os.path.exists(os.path.join(t, f))
    for f in orphans:
        assert os.path.exists(os.path.join(t, f))
    # Past the window the nested orphans (and their emptied commit
    # dir) go; the retained snapshot is unharmed.
    assert vt.vacuum_versioned(t, retention_seconds=0) == len(orphans)
    for f in orphans:
        assert not os.path.exists(os.path.join(t, f))
    assert {(r.k, r.p, r.v) for r in vt.read_version(spark, t).collect()} == {
        (3, "a", 30)
    }


def test_overwrite_inherits_partition_layout(spark, tmp_path):
    """Partition columns are table metadata (Delta): an overwrite with
    partition_by=None keeps the layout; an explicit [] un-partitions."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(
        spark.createDataFrame([(1, "a", 10)], "k int, p string, v int"),
        t,
        partition_by=["p"],
    )
    m1 = vt.create_versioned(
        spark.createDataFrame([(2, "b", 20)], "k int, p string, v int"), t
    )
    assert m1["partition_by"] == ["p"]
    assert all("p=b" in f for f in m1["files"])
    # Partition-scoped merge works against the inherited layout.
    vt.merge_versioned(
        spark,
        spark.createDataFrame([(3, "c", 30)], "k int, p string, v int"),
        t,
        ["k"],
    )
    m2 = vt.read_manifest(t, 2)
    assert m2["partition_by"] == ["p"]
    assert set(m1["files"]) <= set(m2["files"])  # untouched p=b re-referenced
    # Explicit [] changes the layout to unpartitioned.
    m3 = vt.create_versioned(
        spark.createDataFrame([(4, "d", 40)], "k int, p string, v int"),
        t,
        partition_by=[],
    )
    assert "partition_by" not in m3
    assert all("=" not in os.path.basename(os.path.dirname(f)) for f in m3["files"])


def test_delete_versioned_rewrites_only_touched_files(spark, tmp_path):
    """Delta DELETE parity: one scan finds the files containing
    matching rows; only those are rewritten (keeping non-matching
    rows), the rest re-referenced byte-identical; NULL predicate rows
    are kept (SQL DELETE deletes only WHERE true); no-match is a
    no-op with no version committed; time travel across the delete
    still reads the old snapshot."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(k, "keep" if k % 10 else None) for k in range(100)],
        "k int, tag string",
    ).repartition(5, "k")
    vt.create_versioned(df, t)
    m0 = vt.read_manifest(t, 0)
    assert len(m0["files"]) > 1
    m1 = vt.delete_versioned(spark, t, "k >= 90 AND tag = 'keep'")
    assert m1["op"] == "delete"
    # Untouched files re-referenced (same rel paths), touched gone.
    reused = set(m0["files"]) & set(m1["files"])
    assert reused and set(m1["files"]) - set(m0["files"])
    got = {r.k for r in vt.read_version(spark, t).collect()}
    # k in 90..99 deleted EXCEPT k=90 (tag NULL -> predicate unknown -> kept)
    assert got == set(range(90)) | {90}
    assert {r.k for r in vt.read_version(spark, t, 0).collect()} == set(range(100))
    # No-op: nothing matches, no commit.
    assert vt.delete_versioned(spark, t, "k > 1000") is None
    assert vt.latest_version(t) == 1


def test_update_versioned_file_pruned(spark, tmp_path):
    """Delta UPDATE parity: matching rows get the assignments, other
    rows in touched files copy through, untouched files re-reference;
    assignments cast to the column's type; CHECK constraints are
    enforced on the rewritten rows; partitioned tables move updated
    rows into their new partition dirs."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(k, k % 4, float(k)) for k in range(40)], "k int, p int, v double"
    )
    vt.create_versioned(df, t, partition_by=["p"])
    m0 = vt.read_manifest(t, 0)
    vt.add_constraint(spark, t, "v_nonneg", "v >= 0")
    m2 = vt.update_versioned(spark, t, "p = 1", {"v": "v * 2", "p": "3"})
    assert m2["op"] == "update"
    untouched0 = [f for f in m0["files"] if vt._file_partition_values(f, ["p"]) != ("1",)]
    assert set(untouched0) <= set(m2["files"])
    rows = {(r.k, r.p, r.v) for r in vt.read_version(spark, t).collect()}
    expect = {
        (k, 3 if k % 4 == 1 else k % 4, float(k) * 2 if k % 4 == 1 else float(k))
        for k in range(40)
    }
    assert rows == expect
    # Moved rows live under their NEW partition dir in the manifest.
    new_files = set(m2["files"]) - set(m0["files"])
    assert new_files and all(
        vt._file_partition_values(f, ["p"]) == ("3",) for f in new_files
    )
    # Constraint enforcement on the rewritten rows.
    with pytest.raises(vt.ConstraintViolation):
        vt.update_versioned(spark, t, "k = 2", {"v": "-1.0"})
    assert vt.latest_version(t) == 2  # refused commit published nothing
    # Unknown assignment column refused.
    with pytest.raises(ValueError, match="unknown columns"):
        vt.update_versioned(spark, t, "k = 2", {"nope": "1"})


def test_deletion_vector_delete(spark, tmp_path):
    """mode='dv' DELETE: matched positions land in the manifest's dv
    map, the FILE SET is unchanged (zero data rewrite), reads
    anti-join the tombstones out, time travel still sees them, and a
    second DV delete unions indices per file."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(200)], "k int, val string"
    ).repartition(4)
    vt.create_versioned(df, t)
    m0 = vt.read_manifest(t, 0)
    # threshold 1.0: tiny test files would trip the default 10%
    # tombstone-economics rewrite; the economics themselves are pinned
    # in test_deletion_vector_tombstone_economics.
    m1 = vt.delete_versioned(
        spark, t, "k < 5", mode="dv", dv_rewrite_threshold=1.0
    )
    assert m1["op"] == "delete_dv"
    assert m1["files"] == m0["files"]  # byte-identical references
    assert sum(len(v) for v in m1["dv"].values()) == 5
    assert {r.k for r in vt.read_version(spark, t).collect()} == set(range(5, 200))
    assert vt.read_version(spark, t, 0).count() == 200  # time travel
    m2 = vt.delete_versioned(
        spark, t, "k >= 5 AND k < 8", mode="dv", dv_rewrite_threshold=1.0
    )
    assert m2["files"] == m0["files"]
    assert sum(len(v) for v in m2["dv"].values()) == 8  # unioned
    assert {r.k for r in vt.read_version(spark, t).collect()} == set(range(8, 200))
    # No-match DV delete is still a no-op.
    assert vt.delete_versioned(spark, t, "k > 1000", mode="dv") is None


def test_deletion_vector_tombstone_economics(spark, tmp_path):
    """A file whose live-row deleted fraction exceeds the threshold is
    REWRITTEN, not tombstoned; dv_max_rows demotes the biggest
    contributors to rewrite; OPTIMIZE clears DVs by rewriting."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(100)], "k int, val string"
    ).repartition(2)
    vt.create_versioned(df, t)
    m0 = vt.read_manifest(t, 0)
    # 50% delete > 10% threshold: whole-file rewrites, no DV entries.
    m1 = vt.delete_versioned(spark, t, "k % 2 = 0", mode="dv")
    assert not m1.get("dv")
    assert not set(m1["files"]) & set(m0["files"])
    assert vt.read_version(spark, t).count() == 50
    # Cap (inline-only storage): 3 matching rows but dv_max_rows=1
    # forces rewrites for the over-cap files (every file demoted here
    # — 2 rows in one file). With sidecars enabled the cap is moot
    # (test_dv_sidecar_large_delete).
    m2 = vt.delete_versioned(
        spark, t, "k IN (1, 3, 5)", mode="dv", dv_max_rows=1,
        dv_sidecar=False,
    )
    assert sum(len(v) for v in (m2.get("dv") or {}).values()) <= 1
    assert vt.read_version(spark, t).count() == 47
    # Fresh DV then OPTIMIZE: the compaction rewrite retires the
    # tombstones (files are fresh, dv map empty).
    vt.delete_versioned(spark, t, "k = 7", mode="dv")
    m4 = vt.optimize_versioned(spark, t)
    assert not m4.get("dv")
    assert vt.read_version(spark, t).count() == 46


def test_deletion_vectors_interact_with_dml_and_append(spark, tmp_path):
    """DVs survive appends (auto-carry), apply inside UPDATE/MERGE
    reads (a tombstoned row can't be matched or updated), restore
    brings back the DV view of its version, and the append-lineage
    fast path refuses DV-changing history."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(k, "a") for k in range(10)]), t)
    vt.delete_versioned(
        spark, t, "k = 3", mode="dv", dv_rewrite_threshold=1.0
    )                                                         # v1
    vt.append_versioned(_df(spark, [(100, "z")]), t)          # v2
    assert {r.k for r in vt.read_version(spark, t).collect()} == (
        set(range(10)) - {3}
    ) | {100}
    # UPDATE of the tombstoned key matches nothing → no-op (None).
    assert vt.update_versioned(spark, t, "k = 3", {"val": "'X'"}) is None
    # MERGE re-inserts key 3 as a NEW row (it is invisible, so it is
    # an insert, not an update) — Delta semantics.
    vt.merge_versioned(spark, _df(spark, [(3, "resurrected")]), t, ["k"])
    rows = {(r.k, r.val) for r in vt.read_version(spark, t).collect()}
    assert (3, "resurrected") in rows and len(rows) == 11
    # Restore to v1: key 3 gone again, its DV restored explicitly.
    vt.restore_versioned(t, 1)
    assert {r.k for r in vt.read_version(spark, t).collect()} == (
        set(range(10)) - {3}
    )
    with pytest.raises(ValueError, match="deletion vectors"):
        vt.read_version_diff(spark, t, 0, 2)
    # version_changes reads THROUGH DVs: the v0→v1 change set is
    # exactly the one deleted row.
    ch = vt.version_changes(spark, t, 0, 1, keys=["k"]).collect()
    assert [(r.k, r._change_type) for r in ch] == [(3, "delete")]


def test_deletion_vector_update(spark, tmp_path):
    """mode='dv' UPDATE: matched positions tombstoned, updated rows
    APPENDED (every previous file re-referenced), result identical to
    the rewrite path; threshold/cap breach falls back to rewrite."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(k, float(k)) for k in range(200)], "k int, v double"
    ).repartition(4)
    vt.create_versioned(df, t)
    m0 = vt.read_manifest(t, 0)
    m1 = vt.update_versioned(
        spark, t, "k < 4", {"v": "v * 10"}, mode="dv",
        dv_rewrite_threshold=1.0,
    )
    assert m1["op"] == "update_dv"
    assert set(m0["files"]) <= set(m1["files"])  # all re-referenced
    assert sum(len(v) for v in m1["dv"].values()) == 4
    rows = {(r.k, r.v) for r in vt.read_version(spark, t).collect()}
    assert rows == {(k, float(k) * (10 if k < 4 else 1)) for k in range(200)}
    assert vt.read_version(spark, t, 0).count() == 200  # time travel
    # Equivalence with the rewrite path on the same logical update.
    t2 = str(tmp_path / "tbl2")
    vt.create_versioned(df, t2)
    m2 = vt.update_versioned(spark, t2, "k < 4", {"v": "v * 10"})
    assert m2["op"] == "update"
    rows2 = {(r.k, r.v) for r in vt.read_version(spark, t2).collect()}
    assert rows2 == rows
    # Cap breach (inline-only storage): the whole update degrades to
    # rewrite (no dv).
    m3 = vt.update_versioned(
        spark, t, "k >= 100", {"v": "0.0"}, mode="dv", dv_max_rows=5,
        dv_sidecar=False,
    )
    assert m3["op"] == "update" and not m3.get("dv")
    assert (
        vt.read_version(spark, t).filter("k >= 100 AND v = 0.0").count()
        == 100
    )


def test_zorder_temporal_columns(spark, tmp_path):
    """OPTIMIZE ZORDER over a (timestamp, numeric) pair: temporal dims
    quantize through unix epoch (a bare double cast is invalid), and
    the clustered layout prunes on BOTH dims via file stats."""
    t = str(tmp_path / "tbl")
    df = spark.sql(
        "SELECT TIMESTAMP '1996-01-01 00:00:00' + make_interval(0,0,0,id,0,0) AS ts, "
        "CAST(id % 50 AS DOUBLE) AS x, id FROM range(2000)"
    )
    vt.create_versioned(df.repartition(8), t)
    m = vt.optimize_versioned(
        spark, t, target_file_bytes=4096, zorder_by=["ts", "x"]
    )
    assert m["op"].startswith("optimize_zorder")
    assert vt.read_version(spark, t).count() == 2000
    # Stats-based pruning works on the timestamp dim after clustering.
    stats = vt.read_manifest(t, vt.latest_version(t))["stats"]
    import datetime
    probe = (datetime.datetime(1996, 1, 10), datetime.datetime(1996, 1, 12))
    kept = vt.prune_files_by_stats(
        vt.read_manifest(t, vt.latest_version(t)),
        {"ts": probe},
    )
    assert 0 < len(kept) < len(stats)
    got = vt.read_version_pruned(spark, t, {"ts": probe}).count()
    exp = df.filter(
        (df.ts >= probe[0].isoformat()) & (df.ts <= probe[1].isoformat())
    ).count()
    assert got == exp > 0


def test_deletion_vectors_on_partitioned_table(spark, tmp_path):
    """DVs over Hive-partitioned commits: the read-side anti-join
    works through the per-commit basePath scans (hidden _metadata
    columns resolve per file), the file list stays byte-identical,
    and partition-scoped MERGE still re-references DV'd cold
    partitions with their tombstones intact."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(k, k % 3, f"v{k}") for k in range(60)], "k int, p int, val string"
    )
    vt.create_versioned(df, t, partition_by=["p"])
    m0 = vt.read_manifest(t, 0)
    m1 = vt.delete_versioned(
        spark, t, "k IN (0, 31)", mode="dv", dv_rewrite_threshold=1.0
    )
    assert m1["op"] == "delete_dv" and m1["files"] == m0["files"]
    assert all("p=" in f for f in m1["dv"])  # tombstones on nested files
    got = {r.k for r in vt.read_version(spark, t).collect()}
    assert got == set(range(60)) - {0, 31}
    # Merge into partition p=2 only: p=0 / p=1 files (incl. the DV'd
    # ones) re-reference and their tombstones carry.
    upd = spark.createDataFrame([(2, 2, "X")], "k int, p int, val string")
    m2 = vt.merge_versioned(spark, upd, t, ["k"])
    for f, idxs in m1["dv"].items():
        assert f in m2["files"] and m2["dv"][f] == idxs
    got = {(r.k, r.val) for r in vt.read_version(spark, t).collect()}
    assert (2, "X") in got
    assert {k for k, _ in got} == set(range(60)) - {0, 31}


# --------------------------------------------------------------------------
# Round 17: DV sidecars, TIMESTAMP AS OF, conflict rebase, encoding fixes
# --------------------------------------------------------------------------


def test_timestamp_stats_pruning_boundary(spark, tmp_path):
    """Stats pruning on TIMESTAMP columns is sound at boundaries: a
    probe whose inclusive upper bound equals a file's min (and an
    equality probe hitting a file min/max exactly) must KEEP the file.
    Footer stats come back tz-aware while probe bounds are naive —
    both must normalize to one encoding or the longer tz-suffixed
    string compares greater and matching rows silently vanish."""
    import datetime

    t = str(tmp_path / "tbl")
    df = spark.sql(
        "SELECT TIMESTAMP '1996-04-01 00:00:00' + "
        "make_interval(0,0,0,CAST(id AS INT),0,0) AS ts, id FROM range(10)"
    ).coalesce(1)
    vt.create_versioned(df, t)
    m = vt.read_manifest(t, 0)
    assert "ts" in (m["stats"] or {}).get(m["files"][0], {})
    file_min = datetime.datetime(1996, 4, 1)  # naive probe bound
    # Inclusive upper bound == file min: must keep the file.
    assert vt.prune_files_by_stats(m, {"ts": (None, file_min)}) == m["files"]
    # Equality probe (lo == hi) on the exact min: kept too.
    assert (
        vt.prune_files_by_stats(m, {"ts": (file_min, file_min)})
        == m["files"]
    )
    # And the full read agrees with a plain filter.
    got = vt.read_version_pruned(spark, t, {"ts": (file_min, file_min)})
    assert got.count() == 1
    # Probes strictly before the min still prune.
    before = datetime.datetime(1996, 3, 31)
    assert vt.prune_files_by_stats(m, {"ts": (None, before)}) == []


def test_partition_value_escaping_matches_spark(spark, tmp_path):
    """_partition_dir_value reproduces Spark's Hive-style directory
    encoding for metacharacter string values (':' -> %3A, '%' -> %25,
    '' and NULL -> __HIVE_DEFAULT_PARTITION__), so the touched-
    partition probe classifies every partition correctly and a merge
    updates in place instead of silently duplicating keys."""
    t = str(tmp_path / "tbl")
    rows = [(1, "x:y"), (2, "a b"), (3, "p%q"), (4, None), (5, "")]
    df = spark.createDataFrame(rows, "k int, part string")
    vt.create_versioned(df, t, partition_by=["part"])
    m0 = vt.read_manifest(t, 0)
    # The probe encoding matches the directories Spark actually wrote.
    dirs = {vt._file_partition_values(f, ["part"])[0] for f in m0["files"]}
    assert dirs == {
        vt._partition_dir_value(v) for v in ("x:y", "a b", "p%q", None, "")
    }
    # Merge touching ONLY the 'x:y' partition: its key updates in
    # place (no duplicate), every other partition file re-referenced.
    upd = spark.createDataFrame([(1, "x:y")], "k int, part string")
    m1 = vt.merge_versioned(spark, upd, t, ["k"])
    assert (
        vt.read_version(spark, t).filter("k = 1").count() == 1
    )  # no duplicated key
    untouched = [
        f for f in m0["files"]
        if vt._file_partition_values(f, ["part"])[0]
        != vt._partition_dir_value("x:y")
    ]
    assert set(untouched) <= set(m1["files"])  # re-referenced, not rewritten
    assert _count_writes_dirs(t, m0, m1) == 1  # one partition rewritten


def _count_writes_dirs(table, m_prev, m_cur):
    prev_commits = {f.split(os.sep)[1] for f in m_prev["files"]}
    return len(
        {f.split(os.sep)[1] for f in m_cur["files"]} - prev_commits
    )


def test_unsupported_partition_type_raises(spark, tmp_path):
    """Partition column types whose directory encoding is not
    reproduced here (timestamps, floats, booleans) are refused at
    create time instead of silently mis-bucketing merges."""
    t = str(tmp_path / "tbl")
    df = spark.sql("SELECT id, CAST(id AS DOUBLE) AS d FROM range(4)")
    with pytest.raises(TypeError, match="partition column"):
        vt.create_versioned(df, t, partition_by=["d"])


def test_checkpoint_write_failure_does_not_fail_commit(
    spark, tmp_path, monkeypatch
):
    """The manifest IS the commit; the checkpoint is derived metadata.
    A failing checkpoint write (ENOSPC, permissions) must not surface
    as a commit failure — a retry-loop caller would re-apply the same
    batch as a new version."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)
    monkeypatch.setattr(
        vt,
        "_maybe_write_checkpoint",
        lambda *a, **k: (_ for _ in ()).throw(OSError("disk full")),
    )
    with pytest.warns(RuntimeWarning, match="checkpoint write failed"):
        m = vt.append_versioned(_df(spark, [(2, "b")]), t)
    assert m["version"] == 1  # commit succeeded
    monkeypatch.undo()
    assert _vals(vt.read_version(spark, t)) == {(1, "a"), (2, "b")}


def test_metachar_table_path_dml(spark, tmp_path):
    """A table path containing URL-encodable characters (space, '%'):
    the DML file-finding scan (input_file_name -> rel path) and the DV
    anti-join key (_metadata.file_path vs _file_uri) both survive,
    because encode/decode go through one shared pair of inverses."""
    t = str(tmp_path / "meta char %41 tbl")
    df = spark.createDataFrame(
        [(k, f"v{k}") for k in range(40)], "k int, val string"
    ).repartition(4)
    vt.create_versioned(df, t)
    # File-pruned DELETE: finding scan decodes URIs back to rel paths.
    m1 = vt.delete_versioned(spark, t, "k >= 30")
    assert m1 is not None
    assert vt.read_version(spark, t).count() == 30
    # DV delete: the anti-join key must match _metadata.file_path's
    # URL-encoded spelling exactly, else rows silently survive.
    m2 = vt.delete_versioned(
        spark, t, "k < 3", mode="dv", dv_rewrite_threshold=1.0
    )
    assert m2["op"] == "delete_dv" and m2.get("dv")
    assert {r.k for r in vt.read_version(spark, t).collect()} == set(
        range(3, 30)
    )
    # DV update on the same table exercises the update-side decoding.
    m3 = vt.update_versioned(
        spark, t, "k = 5", {"val": "'X'"}, mode="dv",
        dv_rewrite_threshold=1.0,
    )
    assert m3["op"] == "update_dv"
    assert (
        vt.read_version(spark, t).filter("val = 'X'").count() == 1
    )


def test_dv_roaring_codec_roundtrip():
    """The sidecar codec: array containers (sparse chunks), bitmap
    containers (dense chunks), chunk boundaries, empty and large
    inputs all round-trip exactly."""
    cases = [
        [],
        [0],
        [65535, 65536],  # chunk boundary straddle
        list(range(0, 200_000, 3)),  # dense-ish: bitmap containers
        [7, 11, 1_000_003, 2**33 + 5],  # sparse, huge positions
        list(range(5000)),  # one chunk, > _DV_ARRAY_MAX -> bitmap
    ]
    for positions in cases:
        data = vt._dv_encode(positions)
        assert vt._dv_decode(data) == sorted(set(positions))
    # Dense chunk actually produced a bitmap container (kind byte 1).
    dense = vt._dv_encode(list(range(5000)))
    # kind byte: 4B magic + <IQ header (12B) + <q container key (8B).
    assert dense[:4] == b"RDV1" and dense[24] == 1
    with pytest.raises(ValueError, match="magic"):
        vt._dv_decode(b"nope" + b"\x00" * 16)


def test_dv_sidecar_large_delete(spark, tmp_path):
    """A scattered delete of more rows than the inline cap stays
    ZERO-REWRITE: positions land in a roaring-bitmap sidecar under
    _dv/, the manifest references it by (path, cardinality, crc32),
    reads apply it, and a corrupt sidecar is refused."""
    t = str(tmp_path / "tbl")
    n = 10_000
    df = spark.range(n).selectExpr("id AS k", "CAST(id AS STRING) AS val")
    # Two files -> ~1666 tombstones each, over DV_INLINE_MAX_ROWS
    # (1024): per-file vectors must go to sidecars.
    vt.create_versioned(df.repartition(2), t)
    m0 = vt.read_manifest(t, 0)
    # Scattered ~30% delete, way over DV_INLINE_MAX_ROWS (1024):
    # threshold 1.0 isolates the storage path from the economics.
    m1 = vt.delete_versioned(
        spark, t, "k % 3 = 0", mode="dv", dv_rewrite_threshold=1.0,
        dv_max_rows=1,  # the inline cap must be IRRELEVANT with sidecars
    )
    assert m1["files"] == m0["files"]  # zero files rewritten
    entries = list(m1["dv"].values())
    assert entries and all(isinstance(e, dict) for e in entries)
    total = sum(e["cardinality"] for e in entries)
    assert total == len([k for k in range(n) if k % 3 == 0])
    for e in entries:
        assert os.path.isfile(os.path.join(t, e["sidecar"]))
        assert e["sidecar"].startswith("_dv" + os.sep)
    # Read-back excludes exactly the tombstoned rows.
    assert vt.read_version(spark, t).count() == n - total
    assert (
        vt.read_version(spark, t).filter("k % 3 = 0").count() == 0
    )
    # Time travel to v0 still sees everything.
    assert vt.read_version(spark, t, 0).count() == n
    # A second small DV delete UNIONs into the (re-encoded) vectors.
    m2 = vt.delete_versioned(
        spark, t, "k = 1", mode="dv", dv_rewrite_threshold=1.0
    )
    assert vt.read_version(spark, t).count() == n - total - 1
    # Corrupt one sidecar: the read refuses rather than un-deleting.
    e = next(iter(m2["dv"].values()))
    path = os.path.join(t, e["sidecar"])
    with open(path, "r+b") as f:
        f.seek(20)
        f.write(b"\xff\xff\xff")
    with pytest.raises(ValueError, match="checksum|cardinality"):
        vt.read_version(spark, t).count()


def test_vacuum_cleans_orphaned_dv_sidecars(spark, tmp_path):
    """Sidecars referenced by retained manifests survive VACUUM;
    sidecars only referenced by dropped manifests are deleted; an
    unreferenced (orphaned) sidecar falls under the retention
    window like any in-flight writer's file."""
    t = str(tmp_path / "tbl")
    df = spark.range(5000).selectExpr("id AS k", "CAST(id AS STRING) AS val")
    vt.create_versioned(df.coalesce(2), t)
    vt.delete_versioned(
        spark, t, "k % 2 = 0", mode="dv", dv_rewrite_threshold=1.0
    )  # v1: sidecar DV
    m1 = vt.read_manifest(t, 1)
    sidecars = {e["sidecar"] for e in m1["dv"].values()}
    assert sidecars
    # Orphan: a sidecar no manifest references (losing commit debris).
    orphan = os.path.join(t, "_dv", "dv-orphan.bin")
    with open(orphan, "wb") as f:
        f.write(vt._dv_encode([1, 2, 3]))
    # Retention window keeps the young orphan, live sidecars stay.
    assert vt.vacuum_versioned(t, retention_seconds=3600) == 0
    assert os.path.isfile(orphan)
    # Past the window the orphan goes; referenced sidecars still stay.
    deleted = vt.vacuum_versioned(t, retention_seconds=0)
    assert deleted == 1 and not os.path.exists(orphan)
    for rel in sidecars:
        assert os.path.isfile(os.path.join(t, rel))
    assert vt.read_version(spark, t).count() == 2500
    # OPTIMIZE clears the DVs; trimming history to the optimized
    # version retires the old files AND their sidecars.
    vt.optimize_versioned(spark, t)
    vt.vacuum_versioned(t, keep_versions=1, retention_seconds=0)
    for rel in sidecars:
        assert not os.path.exists(os.path.join(t, rel))
    assert vt.read_version(spark, t).count() == 2500


def test_inline_dv_cap_counts_carried_entries(spark, tmp_path):
    """dv_sidecar=False accounting: the inline cap counts positions
    CARRIED from previous versions too, so repeated small DV deletes
    cannot accumulate unbounded inline-JSON payload — the file demotes
    to rewrite once carried + new exceeds the cap."""
    t = str(tmp_path / "tbl")
    df = spark.range(100).selectExpr("id AS k", "CAST(id AS STRING) AS val")
    vt.create_versioned(df.coalesce(1), t)
    m1 = vt.delete_versioned(
        spark, t, "k < 6", mode="dv", dv_rewrite_threshold=1.0,
        dv_max_rows=10, dv_sidecar=False,
    )
    assert m1["op"] == "delete_dv"
    assert sum(len(v) for v in m1["dv"].values()) == 6
    # Second delete: 6 carried + 5 new = 11 > 10 -> demote to rewrite
    # (the file is rewritten — its carried tombstones materialize into
    # the rewrite — and the manifest carries NO inline dv payload).
    m1_files = set(m1["files"])
    m2 = vt.delete_versioned(
        spark, t, "k >= 6 AND k < 11", mode="dv", dv_rewrite_threshold=1.0,
        dv_max_rows=10, dv_sidecar=False,
    )
    assert not m2.get("dv")  # demoted: no inline payload at all
    assert not set(m2["files"]) & m1_files  # the file was rewritten
    assert vt.read_version(spark, t).count() == 89


def test_timestamp_as_of(spark, tmp_path):
    """TIMESTAMP AS OF: latest version at-or-before t; between-commit
    timestamps resolve to the earlier version; before-first-commit
    raises (Delta's posture); after-last resolves to latest;
    version_history(with_ts=True) exposes the commit timestamps."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a")]), t)          # v0
    vt.append_versioned(_df(spark, [(2, "b")]), t)          # v1
    vt.append_versioned(_df(spark, [(3, "c")]), t)          # v2
    ts = [vt.read_manifest(t, v)["ts"] for v in range(3)]
    assert ts == sorted(ts)
    # Exactly-at and between-commits resolution.
    assert vt.version_at_timestamp(t, ts[0]) == 0
    assert vt.version_at_timestamp(t, (ts[0] + ts[1]) / 2) == 0
    assert vt.version_at_timestamp(t, (ts[1] + ts[2]) / 2) == 1
    assert vt.version_at_timestamp(t, ts[2] + 1e9) == 2  # far future
    with pytest.raises(ValueError, match="predates the first commit"):
        vt.version_at_timestamp(t, ts[0] - 1.0)
    # read_version(timestamp=...) is the user surface.
    mid = (ts[1] + ts[2]) / 2
    assert _vals(vt.read_version(spark, t, timestamp=mid)) == {
        (1, "a"), (2, "b")
    }
    # datetime input (naive = UTC) works too.
    import datetime

    dt = datetime.datetime.fromtimestamp(mid, tz=datetime.timezone.utc)
    assert _vals(vt.read_version(spark, t, timestamp=dt)) == {
        (1, "a"), (2, "b")
    }
    with pytest.raises(ValueError, match="not both"):
        vt.read_version(spark, t, version=1, timestamp=mid)
    hist = vt.version_history(spark, t, with_ts=True).collect()
    assert [r.version for r in hist] == [0, 1, 2]
    assert [r.ts for r in hist] == pytest.approx(ts)


def test_timestamp_as_of_through_checkpoint(spark, tmp_path):
    """Timestamp resolution stays O(CHECKPOINT_EVERY): commit
    timestamps ride in checkpoint history entries, so resolving
    against a long history needs no full manifest walk."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(0, "x")]), t)
    for i in range(1, 13):
        vt.append_versioned(_df(spark, [(i, "x")]), t)
    ck = vt.latest_checkpoint(t)
    assert ck is not None and ck["version"] >= 10
    assert all(e.get("ts") is not None for e in ck["history"])
    ts5 = vt.read_manifest(t, 5)["ts"]
    assert vt.version_at_timestamp(t, ts5) == 5
    assert vt.read_version(spark, t, timestamp=ts5).count() == 6


def test_concurrent_merge_rebase_disjoint(spark, tmp_path, monkeypatch):
    """Two partition-disjoint merges racing: the loser REBASES (its
    already-written files re-pointed onto the winner's manifest)
    without re-running the merge — counted via _write_snapshot_files;
    both updates land; untouched partitions stay re-referenced."""
    t = str(tmp_path / "tbl")
    rows = [(k, k % 3, f"v{k}") for k in range(30)]
    df = spark.createDataFrame(rows, "k int, p int, val string")
    vt.create_versioned(df, t, partition_by=["p"])

    writes = []
    orig_write = vt._write_snapshot_files

    def counting_write(df_, table_, partition_by=None):
        writes.append(1)
        return orig_write(df_, table_, partition_by)

    monkeypatch.setattr(vt, "_write_snapshot_files", counting_write)

    # Interleave: when the LOSER (merge on p=1) reaches its manifest
    # publish, the WINNER (merge on p=2) commits first at the same
    # version number.
    orig_commit = vt._commit_manifest
    state = {"injected": False}

    def racing_commit(table, version, op, files, *a, **k):
        if not state["injected"] and op == "merge":
            state["injected"] = True
            upd_w = spark.createDataFrame(
                [(2, 2, "WINNER")], "k int, p int, val string"
            )
            vt.merge_versioned(spark, upd_w, t, ["k"])  # wins this version
        return orig_commit(table, version, op, files, *a, **k)

    monkeypatch.setattr(vt, "_commit_manifest", racing_commit)
    upd_l = spark.createDataFrame(
        [(1, 1, "LOSER")], "k int, p int, val string"
    )
    m = vt.merge_versioned(spark, upd_l, t, ["k"])
    monkeypatch.undo()
    # Two merges -> exactly two snapshot writes: the loser REBASED,
    # it did not re-run its merge (which would be a third write).
    assert len(writes) == 2
    assert m["version"] == 2 and m["op"] == "merge"
    got = {(r.k, r.val) for r in vt.read_version(spark, t).collect()}
    assert (1, "LOSER") in got and (2, "WINNER") in got
    assert len(got) == 30  # both merges updated in place
    # Partition p=0 was touched by NEITHER: files re-referenced from v0.
    m0 = vt.read_manifest(t, 0)
    p0 = [
        f for f in m0["files"]
        if vt._file_partition_values(f, ["p"])[0] == "0"
    ]
    assert set(p0) <= set(m["files"])


def test_concurrent_overlapping_dml_reexecutes(spark, tmp_path, monkeypatch):
    """Two OVERLAPPING deletes racing (same partition): the loser gets
    ConcurrentCommitError (no silent rebase — that could drop the
    winner's effect), and commit_with_retry re-executes it against the
    winner's snapshot; the final state is serializable."""
    t = str(tmp_path / "tbl")
    rows = [(k, k % 2, f"v{k}") for k in range(20)]
    df = spark.createDataFrame(rows, "k int, p int, val string")
    vt.create_versioned(df, t, partition_by=["p"])

    state = {"injected": False}
    orig_commit = vt._commit_manifest

    def racing_commit(table, version, op, files, *a, **k):
        if not state["injected"] and op == "delete":
            state["injected"] = True
            vt.delete_versioned(spark, t, "p = 0 AND k < 4")  # winner
        return orig_commit(table, version, op, files, *a, **k)

    monkeypatch.setattr(vt, "_commit_manifest", racing_commit)
    with pytest.raises(vt.ConcurrentCommitError):
        vt.delete_versioned(spark, t, "p = 0 AND k >= 4 AND k < 8")
    monkeypatch.undo()
    # commit_with_retry re-executes the loser against the new latest.
    m = vt.commit_with_retry(
        lambda: vt.delete_versioned(spark, t, "p = 0 AND k >= 4 AND k < 8")
    )
    assert m is not None
    got = {r.k for r in vt.read_version(spark, t).collect()}
    assert got == set(range(20)) - {0, 2, 4, 6}  # both deletes applied


def test_rename_column_is_metadata_only(spark, tmp_path):
    """Column-mapping rename (Delta name-mode): a metadata-only commit
    — zero files written — after which files written BEFORE the rename
    read under the new logical name; appends after the rename write
    PHYSICAL names so the whole table stays uniform; time travel to
    pre-rename versions shows the old name."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a"), (2, "b")]), t)   # v0
    m1 = vt.rename_column(t, "val", "label")                    # v1
    assert m1["files"] == vt.read_manifest(t, 0)["files"]  # metadata only
    assert [e for e in m1["col_map"] if e["logical"] == "label"][0][
        "physical"
    ] == "val"
    cur = vt.read_version(spark, t)
    assert cur.columns == ["k", "label"]
    assert {(r.k, r.label) for r in cur.collect()} == {(1, "a"), (2, "b")}
    # Time travel: v0 still shows the OLD name.
    assert vt.read_version(spark, t, 0).columns == ["k", "val"]
    # Append AFTER the rename: logical batch, physical files.
    vt.append_versioned(
        spark.createDataFrame([(3, "c")], "k int, label string"), t
    )                                                           # v2
    got = {(r.k, r.label) for r in vt.read_version(spark, t).collect()}
    assert got == {(1, "a"), (2, "b"), (3, "c")}
    # The post-rename file physically stores 'val', not 'label'.
    import pyarrow.parquet as pq

    m2 = vt.read_manifest(t, 2)
    new_file = [f for f in m2["files"] if f not in set(m1["files"])][0]
    assert "val" in pq.read_schema(os.path.join(t, new_file)).names
    # DML through the mapping: predicate and assignments use the
    # LOGICAL name.
    vt.update_versioned(spark, t, "label = 'a'", {"label": "'A'"})
    got = {(r.k, r.label) for r in vt.read_version(spark, t).collect()}
    assert got == {(1, "A"), (2, "b"), (3, "c")}
    vt.delete_versioned(spark, t, "label = 'b'")
    assert {(r.k, r.label) for r in vt.read_version(spark, t).collect()} == {
        (1, "A"), (3, "c")
    }
    # Stats pruning maps logical probes to physical stats keys: every
    # file WITH recorded stats prunes under an impossible probe (only
    # stat-less zero-row part files survive, soundly kept).
    m = vt.read_manifest(t, vt.latest_version(t))
    kept = vt.prune_files_by_stats(m, {"label": ("zzz", None)})
    assert all(not (m["stats"].get(f) or {}) for f in kept)
    assert vt.read_version_pruned(spark, t, {"label": ("zzz", None)}).count() == 0


def test_rename_column_refusals(spark, tmp_path):
    """Renames of partition columns (name baked into directory paths)
    and constraint-referenced columns are refused; name collisions
    too."""
    t = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, 0, "a")], "k int, p int, val string")
    vt.create_versioned(df, t, partition_by=["p"])
    with pytest.raises(ValueError, match="partition column"):
        vt.rename_column(t, "p", "bucket")
    with pytest.raises(ValueError, match="already exists"):
        vt.rename_column(t, "val", "k")
    vt.add_constraint(spark, t, "k_pos", "k > 0")
    with pytest.raises(ValueError, match="CHECK constraint"):
        vt.rename_column(t, "k", "key")


def test_drop_column_and_no_resurrection(spark, tmp_path):
    """drop_column is metadata-only; re-adding a same-named column via
    schema evolution gets a FRESH physical name, so the dropped
    column's old bytes never resurface under the new column."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "secret"), (2, "old")]), t)  # v0
    m1 = vt.drop_column(t, "val")                                    # v1
    assert m1["files"] == vt.read_manifest(t, 0)["files"]
    assert vt.read_version(spark, t).columns == ["k"]
    # Time travel: the column still exists at v0.
    assert vt.read_version(spark, t, 0).columns == ["k", "val"]
    # Re-add 'val' via additive evolution: old rows must be NULL, not
    # the dropped bytes.
    vt.append_versioned(_df(spark, [(3, "new")]), t)                 # v2
    rows = {(r.k, r.val) for r in vt.read_version(spark, t).collect()}
    assert rows == {(1, None), (2, None), (3, "new")}
    cm = {e["logical"]: e["physical"] for e in vt.read_manifest(t, 2)["col_map"]}
    assert cm["val"].startswith("c") and cm["val"] != "val"


def test_column_mapping_interactions(spark, tmp_path):
    """Mapping composes with the rest of the table: restore brings
    back the OLD logical names with its version; merge works through
    the mapping; the streaming source refuses renamed tables; optimize
    rewrites keep physical names consistent."""
    t = str(tmp_path / "tbl")
    vt.create_versioned(_df(spark, [(1, "a"), (2, "b")]), t)   # v0
    vt.rename_column(t, "val", "label")                         # v1
    vt.merge_versioned(
        spark,
        spark.createDataFrame([(2, "B"), (9, "z")], "k int, label string"),
        t,
        ["k"],
    )                                                           # v2
    assert {(r.k, r.label) for r in vt.read_version(spark, t).collect()} == {
        (1, "a"), (2, "B"), (9, "z")
    }
    vt.optimize_versioned(spark, t)                             # v3
    assert {(r.k, r.label) for r in vt.read_version(spark, t).collect()} == {
        (1, "a"), (2, "B"), (9, "z")
    }
    # RESTORE to v0: old logical names come back with the snapshot.
    vt.restore_versioned(t, 0)                                  # v4
    assert vt.read_version(spark, t).columns == ["k", "val"]
    assert {(r.k, r.val) for r in vt.read_version(spark, t).collect()} == {
        (1, "a"), (2, "b")
    }
    # Streaming refusal on renamed tables.
    t2 = str(tmp_path / "tbl2")
    vt.create_versioned(_df(spark, [(1, "a")]), t2)
    vt.rename_column(t2, "val", "label")
    from yelp_data_pipeline_spark.streaming.versioned_source import (
        _refuse_column_mapping,
    )

    with pytest.raises(ValueError, match="column mapping"):
        _refuse_column_mapping(
            vt.read_manifest(t2, vt.latest_version(t2)), "latest"
        )
