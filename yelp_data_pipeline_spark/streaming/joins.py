"""Stream-stream joins and streaming deduplication.

The two stateful streaming shapes the windowed aggregates don't
cover. Both are batch/stream-agnostic DataFrame transforms; on a
stream they require watermarks so the state store can evict.

Scale posture: state size is the failure mode. The interval join
bounds state to (watermark delay + interval) per key on each side;
streaming dedup bounds it to the watermark horizon — without the
watermark both grow forever and the job dies at scale, so the
helpers take the delays as required arguments rather than optional
niceties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lower: str = "0 seconds",
    upper: str = "5 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands in
    ``[left_ts + lower, left_ts + upper]`` — the enrich-clicks-with-
    impressions shape. Columns come back prefixed l_/r_.

    On streams, apply ``withWatermark`` to BOTH inputs first; Spark
    derives the state-eviction horizon from the watermarks plus this
    interval condition. ``how="left_outer"`` keeps unmatched left
    events (clicks with no purchase): their NULL-right rows are
    emitted only once the watermark passes ``l_ts + upper`` — the
    engine cannot know "no match" earlier, so trailing rows inside
    the horizon are withheld until more data (or the final batch)
    advances the watermark. That is correct streaming semantics, not
    data loss; tests/test_stream_joins.py pins it.
    """
    l = left.select(
        F.col(key).alias("l_key"),
        F.col(left_ts).alias("l_ts"),
        *[F.col(c).alias(f"l_{c}") for c in left.columns if c not in (key, left_ts)],
    )
    r = right.select(
        F.col(key).alias("r_key"),
        F.col(right_ts).alias("r_ts"),
        *[F.col(c).alias(f"r_{c}") for c in right.columns if c not in (key, right_ts)],
    )
    cond = (
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts") + F.expr(f"INTERVAL {lower}"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how)


def dedup_stream(
    df: DataFrame, keys: list[str], ts_col: str, delay: str = "1 hour"
) -> DataFrame:
    """Exactly-once-per-key event delivery within the watermark
    horizon: watermarked ``dropDuplicates`` keeps one row per key and
    evicts seen-key state once the watermark passes. The streaming
    twin of ``dedup.dedup_exact`` — at-least-once sources (Kafka,
    file redelivery) become effectively-once downstream."""
    if df.isStreaming:
        df = df.withWatermark(ts_col, delay)
    return df.dropDuplicates(keys)


def dedup_stream_within_watermark(
    df: DataFrame, keys: list[str], ts_col: str, delay: str = "1 hour"
) -> DataFrame:
    """Streaming dedup for keys whose DUPLICATES carry different event
    times (retries restamped at send time, clock-skewed redelivery) —
    ``dropDuplicatesWithinWatermark``: two rows collide when their keys
    match and their event times fall within the watermark delay of the
    first-seen row, so the timestamp needn't be part of the identity.

    Contrast with :func:`dedup_stream` (plain watermarked
    ``dropDuplicates``): there a redelivered event with a *different*
    timestamp is NOT a duplicate unless ts is excluded from the keys —
    and excluding ts makes state eviction depend on subtle planner
    rules. This variant is the intended API for that case (Spark 3.5+):
    state per key is evicted ``delay`` after the first occurrence,
    keeping the store bounded by the key-arrival rate × horizon.

    On a batch DataFrame, falls back to plain dropDuplicates on keys —
    batch has no watermark clock; callers comparing stream vs batch
    should dedup on keys alone.
    """
    if df.isStreaming:
        return df.withWatermark(ts_col, delay).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def enrich_stream(
    stream: DataFrame,
    dim: DataFrame,
    stream_key: str,
    dim_key: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-STATIC enrichment join — the most common production
    streaming shape (attach dimension attributes to an event stream),
    and deliberately simpler than the stream-stream interval join: a
    static side carries NO state store and needs NO watermark; Spark
    re-evaluates the static relation per micro-batch, so a dim table
    updated between batches is picked up automatically (slowly
    changing dims without restart).

    Scale posture: broadcast the dim (default) so each micro-batch is
    a map-side hash join — no shuffle of the stream, no state. For
    dims too large to broadcast, pass ``broadcast_dim=False`` and
    pre-bucket both sides on the key. Inner and left joins only:
    right/full against a static side would need to emit
    "dim rows never matched", which is unanswerable on an unbounded
    stream.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"stream-static join supports inner/left, got {how!r}"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(
        d, stream[stream_key] == d[dim_key], how
    )
