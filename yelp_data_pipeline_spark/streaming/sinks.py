"""Streaming sinks: the idempotent foreachBatch MERGE — where the
streaming tier meets the upsert tier.

Structured Streaming's file sink is append-only; keyed UPSERT into a
serving table needs ``foreachBatch`` + MERGE. Spark's contract there
is at-least-once: after a crash between "batch written" and
"offsets committed", the SAME (batch_id, data) is REPLAYED into the
sink. The standard exactly-once recipe (Delta docs call it the
"idempotent table writes" pattern; txnVersion/txnAppId) is a
batch-id ledger: record every applied batch_id durably next to the
target, and skip a batch whose id is already recorded. This module
implements that recipe over plain parquet — the same
:func:`~yelp_data_pipeline_spark.operators.upsert.merge_upsert_df`
semantics the batch tier oracle-verifies, wrapped for
``writeStream.foreachBatch``.

Scale posture: the per-batch merge is one key-shuffled anti-join +
union (Delta MERGE's cost shape); the ledger is O(1) tiny marker
files; the staged-write + rename swap is atomic on HDFS/local and
object stores with atomic rename emulation — at true scale the Delta
transaction log replaces the rename (upsert_delta is the drop-in,
import-gated for this harness).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.upsert import merge_upsert_df


def applied_batches(target_path: str) -> set[int]:
    """Batch ids recorded in the target's ledger."""
    d = target_path + "_applied"
    if not os.path.isdir(d):
        return set()
    out = set()
    for name in os.listdir(d):
        if name.startswith("batch-"):
            out.add(int(name.split("-", 1)[1]))
    return out


def merge_upsert_batch(
    batch_df: DataFrame,
    batch_id: int,
    target_path: str,
    keys: list[str],
    order_col: str | None = None,
) -> bool:
    """Apply one micro-batch as a keyed MERGE into the parquet table
    at ``target_path``; returns False (no-op) if ``batch_id`` is
    already in the ledger — the replay guard that turns at-least-once
    delivery into exactly-once table state.

    ``order_col``: when a batch can carry several rows per key, the
    row with the max ``order_col`` wins (latest-wins dedup via one
    in-batch window); None asserts the caller ships unique keys.

    Write protocol: merge into a STAGED directory (never read and
    overwrite the same path in one job), then swap via rename and only
    then record the marker. A crash before the marker re-runs the
    merge on replay — safe, because MERGE of the same updates is
    idempotent on table state.
    """
    spark = batch_df.sparkSession
    ledger = target_path + "_applied"
    os.makedirs(ledger, exist_ok=True)
    marker = os.path.join(ledger, f"batch-{batch_id}")
    if os.path.exists(marker):
        return False
    updates = batch_df
    if order_col is not None:
        from pyspark.sql import Window

        w = Window.partitionBy(*keys).orderBy(F.desc(order_col))
        updates = (
            updates.withColumn("__rk", F.row_number().over(w))
            .where(F.col("__rk") == 1)
            .drop("__rk")
        )
    if os.path.exists(target_path):
        merged = merge_upsert_df(spark.read.parquet(target_path), updates, keys)
    else:
        merged = updates
    staged = f"{target_path}.staged-{batch_id}"
    merged.write.mode("overwrite").parquet(staged)
    old = f"{target_path}.old-{batch_id}"
    if os.path.exists(target_path):
        os.rename(target_path, old)
    os.rename(staged, target_path)
    if os.path.exists(old):
        shutil.rmtree(old)
    with open(marker, "w") as f:
        f.write("")
    return True


def merge_upsert_sink(
    target_path: str, keys: list[str], order_col: str | None = None
):
    """``foreachBatch`` callable: ``writeStream.foreachBatch(
    merge_upsert_sink(path, ["k"], order_col="ts"))``."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        merge_upsert_batch(batch_df, batch_id, target_path, keys, order_col)

    return sink
