"""Structured Streaming SOURCE over the manifest-versioned table —
the Delta streaming-source twin, built on Spark 4's Python Data
Source API (``pyspark.sql.datasource``).

The reference's pipeline is monthly Airflow batches; its Delta gold
tables COULD be streamed from (``spark.readStream.format("delta")``)
but never are. This module closes that gap jar-free for the
manifest-versioned table (`operators/versioned.py`): offsets are
manifest VERSION numbers, each micro-batch is exactly the files the
next versions appended, and Spark's checkpoint + the idempotent
versioned SINK (:func:`..operators.versioned.append_versioned_stream`)
make the table→stream→table round trip end-to-end exactly-once.

Design (mirrors Delta's streaming source):

- ``initialOffset`` = ``{"version": startingVersion - 1}`` — a batch
  covers the half-open version interval ``(start, end]``.
- ``latestOffset`` = the table's current latest committed version;
  manifests are immutable once published, so an offset names an exact,
  replayable file set (snapshot isolation per micro-batch).
- ``partitions(start, end)`` = one :class:`InputPartition` per data
  file ADDED across the interval — planning is metadata-only (manifest
  JSON reads, no data I/O on the driver), and batch read parallelism
  is per-file, like any file source.
- Non-accretive commits (merge / overwrite / optimize / restore to an
  earlier version) RAISE, exactly Delta's default posture (its
  streaming source fails on non-append changes unless
  ``ignoreChanges``/``skipChangeCommits`` is set): silently treating a
  rewrite's files as fresh rows would duplicate the table into the
  stream. Pass ``skipChangeCommits=true`` for Delta's opt-in: change
  commits contribute NO rows, appends still stream.
- ``read(partition)`` runs on executors and yields Arrow record
  batches straight from the parquet file (pyarrow) — vectorized, no
  per-row Python. Files are read THROUGH the stream's fixed schema
  (columns selected/reordered; columns a later schema-evolution append
  introduced are ignored mid-stream, and files predating an evolution
  NULL-pad — restart the stream to pick up a wider schema, Delta's
  contract).

Usage::

    spark.dataSource.register(VersionedTableDataSource)
    df = (spark.readStream.format("versioned_table")
          .option("path", table_dir).load())
    q = (df.writeStream.foreachBatch(...)
         .trigger(availableNow=True).start())

Options: ``path`` (table root, required), ``startingVersion``
(default 0 = the whole table history), ``skipChangeCommits``
(default false), ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``
(admission control, Delta's options: cap how many added files /
bytes one micro-batch may cover — offsets still advance at version
granularity, and the first pending version is always admitted so the
stream makes progress; unset = unbounded, the previous behavior).
A stream starting against a deep commit backlog drains it in capped
micro-batches instead of planning one batch containing every file in
history.

availableNow caveat: Spark's Python Data Source wrapper fixes the
availableNow drain target at the FIRST ``latestOffset`` it sees, so
under that trigger a capped stream processes one capped batch and
stops (rather than iterating capped batches up to a pinned end the
way Delta's source does — the wrapper offers the reader no hook to
distinguish the two). Use a processingTime trigger to drain a
backlog under admission control; leave the caps unset for the
availableNow round-trip pattern.
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..operators import versioned as vt

FORMAT_NAME = "versioned_table"


def _refuse_column_mapping(manifest: dict, where: str) -> None:
    """The streaming source reads parquet files by the stream's
    LOGICAL column names; a table whose col_map diverges (a rename
    happened) would silently NULL-pad the renamed column, so such
    tables are refused — Delta's posture too (its source fails on
    column-mapping schema changes without an explicit schema-tracking
    log). Identity mappings (physical == logical) stream fine."""
    cm = manifest.get("col_map") or []
    if any(e["logical"] != e["physical"] for e in cm):
        raise ValueError(
            f"{where}: the table uses column mapping with renamed "
            "columns — the streaming source cannot read physical "
            "files under logical names; read it as a batch "
            "(read_version) or restart downstream pipelines against "
            "a rewritten table"
        )


class _FilePartition(InputPartition):
    """One appended data file: (absolute path, stream schema as JSON —
    the executor-side read casts every file through it, deleted row
    positions to mask out — non-empty only for seed-snapshot files)."""

    def __init__(self, path: str, schema_json: str, dv_indices: list[int] | None = None):
        self.path = path
        self.schema_json = schema_json
        self.dv_indices = dv_indices or []


class VersionedTableStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._table = options.get("path")
        if not self._table:
            raise ValueError("versioned_table source requires option 'path'")
        self._schema = schema
        self._starting = int(options.get("startingversion", 0))
        self._skip_changes = str(
            options.get("skipchangecommits", "false")
        ).lower() in ("true", "1")
        mf = options.get("maxfilespertrigger")
        mb = options.get("maxbytespertrigger")
        self._max_files = int(mf) if mf is not None else None
        self._max_bytes = int(mb) if mb is not None else None
        # Admission-control cursor: the highest offset this reader has
        # handed to Spark. Synced forward in partitions()/commit() so
        # a restart against an existing checkpoint catches up after
        # its first planned batch.
        self._current = self._starting - 1

    def initialOffset(self) -> dict:
        return {"version": self._starting - 1}

    def latestOffset(self) -> dict:
        v = vt.latest_version(self._table)
        if v is None:
            # Before the first commit: stay at the initial offset
            # (empty batch), don't go backwards.
            return {"version": self._starting - 1}
        cur = max(self._current, self._starting - 1)
        if v <= cur or (self._max_files is None and self._max_bytes is None):
            end = v
        else:
            end = self._admit(cur, v)
        self._current = max(self._current, end)
        return {"version": end}

    def _admit(self, cur: int, latest: int) -> int:
        """Delta's ``maxFilesPerTrigger`` / ``maxBytesPerTrigger``
        admission control: advance the offset version-by-version
        (batch boundaries stay at version granularity — a manifest's
        files are never split across micro-batches) while the
        accumulated ADDED file count / bytes stay within the caps.
        The first pending version is always admitted even when it
        alone exceeds a cap (soft caps, Delta semantics — the stream
        must make progress). Planning cost is metadata-only: manifest
        JSON reads plus driver-side stat calls for byte caps, and the
        walk stops at the cap, so a 10k-commit backlog never plans one
        unbounded first batch."""
        files = 0
        nbytes = 0
        end = cur
        prev: set[str] | None = None
        if cur >= self._starting:
            prev = set(vt.read_manifest(self._table, cur)["files"])
        for v in range(cur + 1, latest + 1):
            m = vt.read_manifest(self._table, v)
            cur_set = set(m["files"])
            added = cur_set if prev is None else cur_set - prev
            n = len(added)
            b = (
                sum(
                    os.path.getsize(os.path.join(self._table, f))
                    for f in added
                )
                if self._max_bytes is not None
                else 0
            )
            if end > cur:  # first pending version is always admitted
                if self._max_files is not None and files + n > self._max_files:
                    break
                if self._max_bytes is not None and nbytes + b > self._max_bytes:
                    break
            files += n
            nbytes += b
            end = v
            prev = cur_set
        return end

    def _added_files(self, v_from: int, v_to: int) -> list[tuple[str, list[int]]]:
        """(file, deletion-vector indices) pairs new in ``(v_from,
        v_to]``, enforcing Delta's append-only streaming contract per
        version step: a commit that drops files OR changes a
        carried-over file's deletion vector (a row removal with an
        unchanged file set) is a CHANGE commit — refused, or skipped
        under ``skipChangeCommits``. ``v_from`` may be
        ``startingVersion - 1`` (nothing read yet): version
        ``v_from + 1``'s full file list seeds the stream, read THROUGH
        that version's deletion vectors (the seed is a snapshot)."""
        added: list[tuple[str, list[int]]] = []
        prev: set[str] | None = None
        prev_dv: dict = {}
        if v_from >= self._starting:
            m_prev = vt.read_manifest(self._table, v_from)
            prev = set(m_prev["files"])
            prev_dv = m_prev.get("dv") or {}
        for v in range(v_from + 1, v_to + 1):
            m = vt.read_manifest(self._table, v)
            _refuse_column_mapping(m, f"version {v}")
            cur = set(m["files"])
            cur_dv = m.get("dv") or {}
            if prev is not None:
                dv_changed = any(
                    (cur_dv.get(f) or []) != (prev_dv.get(f) or [])
                    for f in prev
                )
                if cur >= prev and not dv_changed:
                    # Appended files never carry DV entries (fresh
                    # files start tombstone-free), so no mask here.
                    added.extend((f, []) for f in sorted(cur - prev))
                elif self._skip_changes:
                    pass  # change commit contributes no rows
                else:
                    raise ValueError(
                        f"version {v} ({m['op']!r}) is not an append "
                        "(drops files or changes deletion vectors) — "
                        "the streaming source is append-only; pass "
                        "skipChangeCommits=true to skip change commits "
                        "(Delta's opt-in) or use version_changes for a "
                        "row-level change feed"
                    )
            else:
                added.extend(
                    (f, vt._dv_entry_positions(self._table, cur_dv.get(f)))
                    for f in sorted(cur)
                )
            prev, prev_dv = cur, cur_dv
        return added

    def partitions(self, start: dict, end: dict):
        v_from, v_to = start["version"], end["version"]
        # Keep the admission cursor ahead of everything Spark has
        # planned (covers restarts from a checkpointed offset this
        # reader instance never returned).
        self._current = max(self._current, v_to)
        if v_to <= v_from:
            return []
        sj = self._schema.json()
        return [
            _FilePartition(os.path.join(self._table, rel), sj, dv_idx)
            for rel, dv_idx in self._added_files(v_from, v_to)
        ] or [_FilePartition("", sj)]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return iter(())
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        expected = to_arrow_schema(
            StructType.fromJson(json.loads(partition.schema_json))
        )
        tbl = pq.read_table(
            partition.path,
            columns=[c for c in expected.names if c in
                     set(pq.read_schema(partition.path).names)],
        )
        if partition.dv_indices:
            # Seed-snapshot file with deletion vectors: mask the
            # tombstoned positions (row order in the file IS the
            # row_index definition).
            import numpy as np

            mask = np.ones(tbl.num_rows, dtype=bool)
            mask[np.asarray(partition.dv_indices, dtype=np.int64)] = False
            tbl = tbl.filter(pa.array(mask))
        have = set(tbl.column_names)
        n = tbl.num_rows
        arrays = []
        for field in expected:
            if field.name in have:
                arrays.append(
                    tbl.column(field.name).combine_chunks().cast(field.type)
                )
            else:
                # File predates a schema-evolution append: NULL-pad at
                # the stream's declared type.
                arrays.append(pa.nulls(n, type=field.type))
        return iter(pa.Table.from_arrays(arrays, schema=expected).to_batches())

    def commit(self, end: dict) -> None:
        # Manifests are immutable and offsets live in Spark's
        # checkpoint — nothing to reclaim on the source side. Just
        # keep the admission cursor in sync with completed batches.
        self._current = max(self._current, end["version"])


class VersionedTableDataSource(DataSource):
    """``spark.dataSource.register(VersionedTableDataSource)`` then
    ``spark.readStream.format("versioned_table")``. Batch reads of the
    same table go through :func:`..operators.versioned.read_version`
    (plain DataFrame, full Catalyst pushdown) — this class is the
    STREAMING surface."""

    @classmethod
    def name(cls) -> str:
        return FORMAT_NAME

    def schema(self):
        table = self.options.get("path")
        if not table:
            raise ValueError("versioned_table source requires option 'path'")
        v = vt.latest_version(table)
        if v is None:
            raise FileNotFoundError(f"{table} has no committed versions")
        m = vt.read_manifest(table, v)
        _refuse_column_mapping(m, f"{table} v{v}")
        if not m.get("schema"):
            raise ValueError(
                f"{table} manifest v{v} records no schema — cannot "
                "infer the stream schema"
            )
        return StructType.fromJson(json.loads(m["schema"]))

    def streamReader(self, schema: StructType):
        return VersionedTableStreamReader(schema, dict(self.options))
