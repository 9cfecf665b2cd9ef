"""Training-batch assembly: sequence packing and dataset splits.

The last mile of a pretraining pipeline: curated documents become
fixed-length training sequences (GPT-style concat-and-chop packing)
and deterministic train/val/test assignments. Both are pure Catalyst
and keyed on content hashes, so a rerun — on any engine, any
partitioning — assembles byte-identical batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import md5_long
from .sampling import BUCKETS, hash_bucket
from .textops import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 512,
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """Concat-and-chop sequence packing: documents are hash-assigned to
    shards, concatenated in deterministic (doc id) order within each
    shard, and the token stream is cut every ``seq_len`` tokens.

    The per-shard running sum is ONE window shuffle partitioned on
    shard — n_shards is chosen per cluster (shards ≈ writer tasks), so
    the window partitions are balanced by the uniform hash, never a
    single global ordering. Output: (id, shard, n_tokens, start_offset
    of the doc in its shard's token stream, pack_id = the training
    sequence its first token lands in).
    """
    shard = F.pmod(
        md5_long(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(n_shards),
    ).cast("int")
    base = df.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    start = (F.sum("n_tokens").over(w) - F.col("n_tokens")).cast("long")
    return base.select(
        id_col,
        "shard",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / F.lit(seq_len)).cast("long").alias("pack_id"),
    )


def split_assign(
    df: DataFrame,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment by content-hash bucket
    — the same row lands in the same split on every rerun and engine
    (rand() would resample per partition layout). Weights are mapped
    to cumulative bucket thresholds in insertion order; they should
    sum to 1 (any remainder falls into the last split via the final
    threshold). Zero shuffle — a pure map-side label.
    """
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    b = hash_bucket(F.col(key_col), salt)
    expr = None
    acc = 0.0
    for name, wgt in weights.items():
        acc += wgt
        cond = b < int(round(acc * BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    return df.withColumn("split", expr)
