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
    deleted = vt.vacuum_versioned(t)
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
