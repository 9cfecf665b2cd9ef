"""Manifest-based versioned parquet table — the jar-free Delta twin.

Closes the last declared Delta-parity boundary *semantically*: the
reference stores Gold tables as Delta (silver_to_gold_on_minio.py:
127-144; delta-spark wired in mnt/spark-conf/spark-defaults.conf:16-18),
which buys four things plain parquet lacks — atomic commits, versioned
snapshot reads (time travel), RESTORE, and VACUUM. This module
re-expresses all four over plain parquet plus a JSON manifest log, the
same design Delta/Iceberg use underneath (an append-only metadata log
naming exactly which data files each version comprises).

Layout::

    <table>/
      _manifest/v00000000.json     one file per committed version
      data/<commit-id>/part-*.parquet

Commit protocol (optimistic concurrency, Delta's model):

1. Write the new data files FIRST, into a fresh ``data/<commit-id>/``
   directory. Unreferenced files are invisible — no manifest names
   them, so no reader can observe a half-written commit.
2. Create ``_manifest/v{n}.json`` with O_EXCL (put-if-absent). Exactly
   one writer wins version n; the loser gets
   :class:`ConcurrentCommitError` and retries against the new latest.
   (On a local/HDFS filesystem ``open(..., 'x')`` IS put-if-absent; on
   S3 the same protocol needs the conditional-PUT header or a
   commit-coordinator, which is precisely what delta-spark's
   LogStore abstraction provides — the protocol here is identical.)
3. A writer that crashes between 1 and 2 leaves only orphaned data
   files; readers never see them and :func:`vacuum_versioned` removes
   them.

Readers (:func:`read_version`) list the manifest directory (metadata
only), pick version n (or the max), and scan exactly the files that
manifest names — snapshot isolation by construction.

File sharing — why this survives 100 TB: an *append* commit
re-references every file of the previous version plus the new ones
(zero rewrite — commit cost is proportional to the appended data, not
the table); *overwrite*/*merge* commits reference only the fresh
snapshot; *restore* is metadata-only (a new manifest re-pointing at an
old version's files). Multiple manifests referencing one physical file
is the Delta/Iceberg model, not copy-on-write of the table per commit.

The transactional gap vs real Delta: MERGE here rewrites the full
table snapshot (one anti-join + union, :func:`merge_upsert_df`) where
Delta rewrites only the files that contain matched keys. Same
asymptotic shuffle (the join), more write amplification on large
tables with selective updates — partition the table and merge
per-partition for that regime.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from .upsert import merge_upsert_df

_MANIFEST_DIR = "_manifest"
_DATA_DIR = "data"


class ConcurrentCommitError(RuntimeError):
    """Another writer committed this version first — reread latest and
    retry (the optimistic-concurrency loser path)."""


def _manifest_path(table: str, version: int) -> str:
    return os.path.join(table, _MANIFEST_DIR, f"v{version:08d}.json")


def list_versions(table: str) -> list[int]:
    """Committed version numbers, ascending. One directory listing."""
    mdir = os.path.join(table, _MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return []
    out = []
    for nm in os.listdir(mdir):
        if nm.startswith("v") and nm.endswith(".json"):
            out.append(int(nm[1:-5]))
    return sorted(out)


def latest_version(table: str) -> int | None:
    vs = list_versions(table)
    return vs[-1] if vs else None


def read_manifest(table: str, version: int) -> dict:
    with open(_manifest_path(table, version)) as f:
        return json.load(f)


def _write_snapshot_files(df: DataFrame, table: str) -> list[str]:
    """Write df into a fresh data/<commit-id>/ dir; return the data
    file paths RELATIVE to the table root (what manifests store, so
    the table directory is relocatable)."""
    commit_id = uuid.uuid4().hex[:12]
    rel_dir = os.path.join(_DATA_DIR, commit_id)
    out_dir = os.path.join(table, rel_dir)
    df.write.mode("error").parquet(out_dir)
    files = [
        os.path.join(rel_dir, nm)
        for nm in sorted(os.listdir(out_dir))
        if nm.endswith(".parquet") and not nm.startswith(("_", "."))
    ]
    return files


def _commit_manifest(
    table: str,
    version: int,
    op: str,
    files: list[str],
    schema_json: str | None = None,
    extra: dict | None = None,
) -> dict:
    """Step 2 of the protocol: put-if-absent on v{n}.json. The
    manifest carries the snapshot SCHEMA (like Delta's metaData
    action) so an empty snapshot — zero data files — still reads back
    with its correct shape. ``extra`` fields (e.g. the streaming
    ``batch_id``) ride in the SAME atomic write — a manifest is never
    visible without them."""
    os.makedirs(os.path.join(table, _MANIFEST_DIR), exist_ok=True)
    manifest = {
        "version": version,
        "op": op,
        "files": files,
        "n_files": len(files),
        "schema": schema_json,
        "ts": time.time(),
        **(extra or {}),
    }
    path = _manifest_path(table, version)
    try:
        # 'x' = O_EXCL put-if-absent: exactly one writer wins version n.
        with open(path, "x") as f:
            json.dump(manifest, f)
    except FileExistsError as e:
        raise ConcurrentCommitError(
            f"version {version} of {table} was committed concurrently"
        ) from e
    return manifest


def create_versioned(df: DataFrame, table: str) -> dict:
    """Commit version 0 (or a full overwrite as the next version)."""
    next_v = (latest_version(table) + 1) if list_versions(table) else 0
    files = _write_snapshot_files(df, table)
    return _commit_manifest(table, next_v, "overwrite", files, df.schema.json())


def _merged_schema_json(prev_json: str | None, df: DataFrame) -> str:
    """Additive schema evolution (Delta ``mergeSchema`` on append):
    the committed table schema is the previous schema plus any NEW
    columns the batch introduces, in arrival order. A same-name column
    with a different type raises — silent coercion is how evolving
    tables rot."""
    if not prev_json:
        return df.schema.json()
    from pyspark.sql.types import StructType

    prev = StructType.fromJson(json.loads(prev_json))
    by_name = {f.name: f for f in prev.fields}
    merged = list(prev.fields)
    for f in df.schema.fields:
        old = by_name.get(f.name)
        if old is None:
            merged.append(f)
        elif old.dataType != f.dataType:
            raise TypeError(
                f"append changes column {f.name!r} from "
                f"{old.dataType.simpleString()} to "
                f"{f.dataType.simpleString()} — rewrite (overwrite/"
                "merge) for type changes"
            )
    return StructType(merged).json()


def append_versioned(df: DataFrame, table: str) -> dict:
    """Append commit: new manifest = previous files + the fresh ones.

    Zero rewrite — the previous version's physical files are
    re-referenced, so commit cost scales with the appended batch, not
    the table. This is the property that makes incremental loads on a
    100 TB table affordable.

    Additive schema evolution is allowed (new columns union into the
    committed schema, :func:`_merged_schema_json`); readers apply the
    manifest schema to every file, so pre-evolution files yield NULL
    for the new columns — Delta's mergeSchema-append contract.
    """
    prev_v = latest_version(table)
    if prev_v is None:
        return create_versioned(df, table)
    prev = read_manifest(table, prev_v)
    new_files = _write_snapshot_files(df, table)
    return _commit_manifest(
        table,
        prev_v + 1,
        "append",
        prev["files"] + new_files,
        _merged_schema_json(prev.get("schema"), df),
    )


def merge_versioned(
    spark: SparkSession, updates: DataFrame, table: str, keys: list[str]
) -> dict:
    """MERGE commit — Delta's whenMatchedUpdateAll/whenNotMatchedInsertAll
    over the manifest log (reference semantics: S2G:127-144, including
    the create-if-absent branch at S2G:132).

    Reads the current snapshot, applies :func:`merge_upsert_df`
    (updates ∪ target⟕anti updates — one key-shuffled anti-join), and
    writes the result as a NEW snapshot directory. The plan reads the
    old version's files and writes different files, so no checkpoint /
    staging is needed: the old version stays intact (that is what time
    travel reads) and the commit is the manifest put-if-absent.
    """
    prev_v = latest_version(table)
    if prev_v is None:
        return create_versioned(updates, table)
    target = read_version(spark, table, prev_v)
    merged = merge_upsert_df(target, updates, keys)
    files = _write_snapshot_files(merged, table)
    return _commit_manifest(table, prev_v + 1, "merge", files, merged.schema.json())


def restore_versioned(table: str, version: int) -> dict:
    """Delta RESTORE: commit a NEW version whose file list is an old
    version's — metadata-only (no data read or written), and the
    intervening history remains readable."""
    old = read_manifest(table, version)
    next_v = latest_version(table) + 1
    return _commit_manifest(
        table, next_v, f"restore({version})", old["files"], old.get("schema")
    )


def read_version(
    spark: SparkSession, table: str, version: int | None = None
) -> DataFrame:
    """Time travel: scan exactly the files manifest ``version`` names
    (default: latest). Equivalent to Delta's
    ``.option("versionAsOf", n)``; snapshot-isolated by construction
    because manifests are immutable once committed.

    The manifest's schema (when recorded) is APPLIED to the scan, like
    Delta reading files through the table schema: after an additive
    schema-evolution append, pre-evolution files yield NULL for the
    new columns instead of the read schema depending on which file the
    reader sampled first."""
    v = latest_version(table) if version is None else version
    if v is None:
        raise FileNotFoundError(f"{table} has no committed versions")
    m = read_manifest(table, v)
    schema = None
    if m.get("schema"):
        from pyspark.sql.types import StructType

        schema = StructType.fromJson(json.loads(m["schema"]))
    if not m["files"]:
        # Empty snapshot (e.g. an empty batch committed): the manifest
        # carries the schema, so the read is a typed empty relation —
        # the engine's empty-relation posture, not an error.
        return spark.createDataFrame([], schema)
    reader = spark.read.schema(schema) if schema is not None else spark.read
    return reader.parquet(*[os.path.join(table, f) for f in m["files"]])


def commit_with_retry(commit_fn, retries: int = 3):
    """Optimistic-concurrency retry loop — the caller-side half of the
    put-if-absent protocol (Delta's ``OptimisticTransaction`` retry):
    ``commit_fn()`` attempts one commit against the CURRENT latest
    version (re-reading it each attempt, so the rebased write sees the
    winner's rows); a :class:`ConcurrentCommitError` loser re-runs up
    to ``retries`` times before surfacing.

    Safe only for commits that re-derive their content from the table
    state each attempt (merge/append re-read latest internally);
    idempotent-by-batch-id streaming appends prefer
    :func:`append_versioned_stream`, which no-ops instead of retrying
    a batch another writer already landed.
    """
    attempt = 0
    while True:
        try:
            return commit_fn()
        except ConcurrentCommitError:
            attempt += 1
            if attempt > retries:
                raise


def last_committed_batch(table: str) -> int | None:
    """Highest ``batch_id`` recorded across committed manifests, or
    None. One manifest-directory scan — bounded by commit count
    (metadata), never data volume."""
    best = None
    for v in list_versions(table):
        b = read_manifest(table, v).get("batch_id")
        if b is not None and (best is None or b > best):
            best = b
    return best


def append_versioned_stream(
    df: DataFrame, table: str, batch_id: int
) -> dict | None:
    """Exactly-once streaming append — Delta's ``txnAppId``/
    ``txnVersion`` idempotence model over the manifest log: the commit
    records ``batch_id``; a replayed foreachBatch (same batch_id, as
    Structured Streaming redelivers after a crash) is detected and
    SKIPPED, so retries never duplicate rows. Returns the manifest, or
    None when the batch was already committed.

    The race window is closed by the commit primitive, not the check:
    two racing retries can both pass the batch-id test, but only one
    wins the put-if-absent manifest; the loser's
    :class:`ConcurrentCommitError` surfaces to the caller, whose retry
    then sees the batch committed and no-ops. Orphaned data files from
    the losing attempt are vacuum-cleanable, invisible to readers.
    """
    last = last_committed_batch(table)
    if last is not None and batch_id <= last:
        return None
    extra = {"batch_id": batch_id}
    if not list_versions(table):
        files = _write_snapshot_files(df, table)
        return _commit_manifest(
            table, 0, "append", files, df.schema.json(), extra
        )
    prev_v = latest_version(table)
    prev_files = read_manifest(table, prev_v)["files"]
    files = _write_snapshot_files(df, table)
    return _commit_manifest(
        table, prev_v + 1, "append", prev_files + files, df.schema.json(), extra
    )


def zorder_column(df: DataFrame, cols: list[str], bits: int = 8):
    """Morton (Z-order) interleave of ``cols``, each min-max quantized
    to ``bits`` bits — the locality key behind Delta's
    ``OPTIMIZE ZORDER BY``: range-partitioning on it gives every
    output file a tight bounding BOX over all the dims at once, so
    selective predicates on ANY of them prune files, where a plain
    sort only prunes on its leading column.

    One tiny bounds aggregate (2·|cols| scalars to the driver) sizes
    the quantizers; the interleave itself is a pure Catalyst bit
    expression (shiftleft/&/+ — codegen'd, no UDF). Returns a Column.
    """
    from functools import reduce
    from operator import add
    from pyspark.sql import functions as F

    bounds = df.agg(
        *[F.min(c).cast("double").alias(f"lo_{i}") for i, c in enumerate(cols)],
        *[F.max(c).cast("double").alias(f"hi_{i}") for i, c in enumerate(cols)],
    ).first()
    n = len(cols)
    terms = []
    for i, c in enumerate(cols):
        lo, hi = bounds[f"lo_{i}"], bounds[f"hi_{i}"]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                (F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
                * F.lit(float((1 << bits) - 1))
            ).cast("long"),
        )
        for b in range(bits):
            # dim i's bit b lands at interleaved position b*n + i
            terms.append(
                F.shiftleft(F.shiftright(q, b).bitwiseAND(F.lit(1)), b * n + i)
            )
    return reduce(add, terms).alias("__zorder__")


def optimize_versioned(
    spark: SparkSession,
    table: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
) -> dict:
    """Delta ``OPTIMIZE`` over the manifest log: rewrite the LATEST
    snapshot into ``ceil(bytes / target_file_bytes)`` files and commit
    the rewrite as a new version (op ``optimize``) — same rows, fewer
    files; prior versions keep reading their original files until
    :func:`vacuum_versioned` retires them.

    Unlike :func:`~.upsert.compact_small_files` (the plain-parquet
    compactor), no localCheckpoint staging is needed: the rewrite
    lands in a fresh ``data/<commit-id>/`` directory, never
    overwriting the files it reads — the manifest swap IS the commit.

    Layout options (mutually exclusive):
    - ``sort_within_by`` — the write_clustered property: files own
      disjoint ranges of the leading sort key.
    - ``zorder_by`` — ``OPTIMIZE ZORDER BY`` parity: range-partition
      on :func:`zorder_column`, giving every file a tight bounding
      box over ALL the named dims, so predicates on any of them prune
      files (verified against parquet footer statistics in
      tests/test_versioned.py).
    """
    import math

    if sort_within_by and zorder_by:
        raise ValueError("pass sort_within_by OR zorder_by, not both")
    prev_v = latest_version(table)
    if prev_v is None:
        raise FileNotFoundError(f"{table} has no committed versions")
    m = read_manifest(table, prev_v)
    total = sum(
        os.path.getsize(os.path.join(table, f)) for f in m["files"]
    )
    n_target = max(1, math.ceil(total / target_file_bytes))
    df = read_version(spark, table, prev_v)
    if zorder_by:
        keyed = df.withColumn("__zorder__", zorder_column(df, zorder_by))
        out = (
            keyed.repartitionByRange(n_target, "__zorder__")
            .sortWithinPartitions("__zorder__")
            .drop("__zorder__")
        )
    elif sort_within_by:
        out = df.repartitionByRange(
            n_target, *sort_within_by
        ).sortWithinPartitions(*sort_within_by)
    else:
        out = df.repartition(n_target)
    files = _write_snapshot_files(out, table)
    op = "optimize" if not zorder_by else f"optimize_zorder({','.join(zorder_by)})"
    manifest = _commit_manifest(table, prev_v + 1, op, files, m.get("schema"))
    manifest["files_before"] = len(m["files"])
    return manifest


def read_version_diff(
    spark: SparkSession, table: str, v_from: int, v_to: int | None = None
) -> DataFrame:
    """Incremental read: the rows ADDED between version ``v_from``
    (exclusive) and ``v_to`` (inclusive, default latest) — Delta
    change-data-feed semantics for the append-only case, and the scan
    an incremental downstream consumer wants: it reads ONLY the new
    files, cost proportional to the appended data, never the table.

    Only valid across ``append``/``restore``-of-append lineage:
    ``merge``/``overwrite``/``optimize`` commits rewrite files (their
    file sets aren't supersets), so the file-level diff would not
    equal the row-level diff — those raise ``ValueError`` and callers
    diff the snapshots relationally instead (anti-join on the key).
    """
    v_to_resolved = latest_version(table) if v_to is None else v_to
    base = set(read_manifest(table, v_from)["files"])
    m_to = read_manifest(table, v_to_resolved)
    for v in range(v_from + 1, v_to_resolved + 1):
        op = read_manifest(table, v)["op"]
        if op != "append" and not op.startswith("restore("):
            raise ValueError(
                f"version {v} is {op!r}: file-level diff only equals "
                "row-level diff across append commits — anti-join the "
                "snapshots instead"
            )
    new_files = [f for f in m_to["files"] if f not in base]
    from pyspark.sql.types import StructType

    schema = StructType.fromJson(json.loads(m_to["schema"]))
    if not new_files:
        return spark.createDataFrame([], schema)
    # Target version's schema applied, matching read_version: an
    # increment read across a schema-evolution append carries the
    # evolved shape (older columns NULL-padded consistently).
    return spark.read.schema(schema).parquet(
        *[os.path.join(table, f) for f in new_files]
    )


def version_history(spark: SparkSession, table: str) -> DataFrame:
    """DESCRIBE HISTORY twin: one row per committed version (version,
    op, n_files). Driver-side manifest read — the log is metadata,
    bounded by commit count, never by data volume."""
    rows = [
        (m["version"], m["op"], m["n_files"])
        for m in (read_manifest(table, v) for v in list_versions(table))
    ]
    return spark.createDataFrame(
        rows, "version int, op string, n_files int"
    )


def vacuum_versioned(table: str, keep_versions: int | None = None) -> int:
    """Delta VACUUM: delete physical files no retained manifest
    references — orphans from crashed writers, and (when
    ``keep_versions`` trims history) files only old versions used.
    Returns the number of files deleted.

    Retention is by version count here rather than Delta's
    retention-hours; the invariant is the same — every RETAINED
    version remains fully readable, enforced by computing the live set
    as the union of retained manifests' file lists before touching
    anything.
    """
    versions = list_versions(table)
    if keep_versions is not None and keep_versions < len(versions):
        drop, keep = versions[:-keep_versions], versions[-keep_versions:]
        for v in drop:
            os.remove(_manifest_path(table, v))
        versions = keep
    live = set()
    for v in versions:
        live.update(read_manifest(table, v)["files"])
    deleted = 0
    data_root = os.path.join(table, _DATA_DIR)
    if not os.path.isdir(data_root):
        return 0
    for commit_dir in sorted(os.listdir(data_root)):
        cdir = os.path.join(data_root, commit_dir)
        for nm in sorted(os.listdir(cdir)):
            rel = os.path.join(_DATA_DIR, commit_dir, nm)
            if nm.startswith(("_", ".")):
                # Spark success markers / CRCs: drop alongside the last
                # data file in the commit dir.
                continue
            if rel not in live:
                os.remove(os.path.join(cdir, nm))
                deleted += 1
        if not any(
            not nm.startswith(("_", ".")) for nm in os.listdir(cdir)
        ):
            import shutil

            shutil.rmtree(cdir)
    return deleted
