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


def pack_base(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_shards: int = 8,
    salt: str = "pack",
) -> DataFrame:
    """The shared (id, shard, n_tokens) projection both the batch
    packer and the streaming packer fold over — ONE definition so the
    two can never drift (the same no-drift discipline as the
    near-dup gate's shared probe construction)."""
    shard = F.pmod(
        md5_long(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(n_shards),
    ).cast("int")
    return df.select(
        F.col(id_col),
        shard.alias("shard"),
        token_count(F.col(text_col)).alias("n_tokens"),
    )


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
    base = pack_base(df, id_col, text_col, n_shards, salt)
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


def length_bucketed_packing(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    context: int = 128,
    bucket_step: int = 16,
    n_shards: int = 8,
    salt: str = "lbpack",
) -> DataFrame:
    """Length-bucketed PACKING ASSIGNMENT — the operator behind the
    ``length_bucketed_packing_stats`` eval (stats → assignment, the
    same move as span-stats → span-surgery): every doc gets a concrete
    (pack_id, position) in a ``context``-token training sequence.

    Algebra (first-fit-decreasing within bucket — with equal-cap slots
    FFD is exactly "sort decreasing, fill slots in order"):

    - eff_tok  = min(tokens, context); bucket_cap = eff_tok rounded up
      to ``bucket_step`` — every doc in a bucket pads to bucket_cap.
    - docs_per_pack = context // bucket_cap (equal slots, so a pack
      NEVER straddles: position r goes to pack r // docs_per_pack,
      slot r % docs_per_pack).
    - Packing order within a (bucket, shard) is eff_tok DESC, id ASC —
      decreasing length, deterministic tiebreak.

    Scale shape: bucket_cap alone has only context/bucket_step
    distinct values — a window partitioned on it would funnel the
    corpus through ~8 reducers. Docs are therefore hash-sharded first
    (same recipe as :func:`pack_sequences`): the window partitions on
    (bucket_cap, shard), n_shards chosen per cluster, so the only
    shuffle is one balanced window. Rerun-deterministic on any engine
    or partitioning: shard is a content hash, order is (eff_tok, id).

    Output: (id, eff_tok, bucket_cap, shard, pack_id, position,
    pack_fill) where pack_id is globally unique (bucket/shard/seq bit-
    packed into one BIGINT: cap16 << 50 | shard << 40 | seq) and
    pack_fill is the pack's real token load / ``context`` — the
    dataloader's fill fraction after bucketing.
    """
    eff = F.least(token_count(F.col(text_col)), F.lit(context)).cast("int")
    shard = F.pmod(
        md5_long(F.concat_ws("|", F.lit(salt), F.col(id_col).cast("string"))),
        F.lit(n_shards),
    ).cast("int")
    base = df.select(
        F.col(id_col),
        eff.alias("eff_tok"),
        shard.alias("shard"),
    ).withColumn(
        "bucket_cap",
        (((F.col("eff_tok") + bucket_step - 1) / bucket_step).cast("int")
         * bucket_step).cast("int"),
    )
    w = Window.partitionBy("bucket_cap", "shard").orderBy(
        F.col("eff_tok").desc(), F.col(id_col).asc()
    )
    r = F.row_number().over(w) - 1
    dpp = F.floor(F.lit(context) / F.col("bucket_cap")).cast("int")
    assigned = base.select(
        id_col,
        "eff_tok",
        "bucket_cap",
        "shard",
        (r / dpp).cast("long").alias("pack_seq"),
        F.pmod(r, dpp).cast("int").alias("position"),
    ).withColumn(
        "pack_id",
        F.shiftleft((F.col("bucket_cap") / bucket_step).cast("long"), 50)
        .bitwiseOR(F.shiftleft(F.col("shard").cast("long"), 40))
        .bitwiseOR(F.col("pack_seq")),
    )
    fill = Window.partitionBy("pack_id")
    return assigned.select(
        id_col,
        "eff_tok",
        "bucket_cap",
        "shard",
        "pack_id",
        "position",
        F.round(
            F.sum("eff_tok").over(fill).cast("double") / F.lit(float(context)),
            6,
        ).alias("pack_fill"),
    )


def packing_boundary_stats(
    assignment: DataFrame,
    context: int = 128,
) -> DataFrame:
    """Cross-document attention loss of a packing ASSIGNMENT — the eval
    that answers "what does this packing COST the model": when packed
    sequences are trained without cross-document attention masking,
    every causal (query, key) pair that straddles a document boundary
    attends to unrelated context. For a pack holding docs of lengths
    l1..lk (L = Σli), total causal pairs are L(L-1)/2 and within-doc
    pairs Σ li(li-1)/2, so the cross-document count is the closed form
    (L² − Σli²)/2 — no token enumeration, the whole metric folds out
    of two per-pack sums.

    Input is :func:`length_bucketed_packing` output (any assignment
    with eff_tok, bucket_cap, pack_id works). Two combinable hash
    aggregates — pack_id then bucket_cap — both map-side partial, both
    linear; pack_id is bit-packed unique so the first groupBy is as
    balanced as the packing itself. Per bucket: pack/doc counts,
    average docs per pack, fill fraction against ``context``, average
    boundaries per pack (docs − 1), and the corpus-weighted
    cross-document pair fraction Σcross / Σtotal.
    """
    per_pack = assignment.groupBy("pack_id", "bucket_cap").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("eff_tok").cast("long").alias("load"),
        F.sum(F.col("eff_tok").cast("long") * F.col("eff_tok"))
        .cast("long")
        .alias("sumsq"),
    )
    load = F.col("load").cast("double")
    cross = (load * F.col("load") - F.col("sumsq")) / 2.0
    total = load * (F.col("load") - 1) / 2.0
    return (
        per_pack.groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_packs"),
            F.sum("n_docs").cast("long").alias("n_docs"),
            F.round(
                F.avg(F.col("n_docs").cast("double")), 6
            ).alias("avg_docs_per_pack"),
            F.round(
                F.sum(load) / (F.count(F.lit(1)) * float(context)), 6
            ).alias("avg_pack_fill"),
            F.round(
                F.sum(F.col("n_docs").cast("double") - 1)
                / F.count(F.lit(1)),
                6,
            ).alias("avg_boundaries"),
            # Guard: every pack in a bucket can hold a single <=1-token
            # doc, making every per-pack `total` 0 — an unguarded ratio
            # is an ANSI DIVIDE_BY_ZERO (and NULL-vs-NaN oracle drift
            # otherwise). Zero causal pairs ⇒ the fraction is 0 by
            # convention, matching the oracle's CASE WHEN.
            F.when(
                F.sum(total) > 0,
                F.round(F.sum(cross) / F.sum(total), 6),
            )
            .otherwise(F.lit(0.0))
            .alias("crossdoc_pair_frac"),
        )
        .orderBy("bucket_cap")
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
