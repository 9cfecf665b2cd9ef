"""Similarity search over embedding columns (north-star extension).

Two tiers:

- :func:`cosine_topk` — brute-force exact top-k. Map-side score (the
  query vector is a literal/broadcast), then TakeOrderedAndProject:
  each partition keeps a k-heap, the driver merges k·P rows. At 100 TB
  this is one full scan, zero shuffles — the right baseline.
- :func:`ivf_topk` — IVF-style approximate search: coarse-quantize
  vectors to centroids, probe only the nearest ``nprobe`` cells. The
  scan then prunes to ~nprobe/ncells of the data; with the table
  bucketed/partitioned by cell id it becomes partition pruning.
- :func:`cosine_neardup_pairs` — all-pairs above a threshold, for
  embedding-based dedup. Brute force is O(n²)/blocked; prefer LSH
  bucketing (random hyperplane signs) for n beyond ~10⁵ per executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vectors import cosine


def _query_vector_lit(vec: list[float]) -> F.Column:
    return F.array(*[F.lit(float(x)).cast("double") for x in vec])


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector."""
    q = _query_vector_lit(query_vec)
    score = F.round(cosine(F.col(vec_col), q), round_to)
    return (
        df.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def cosine_neardup_pairs(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round_to: int = 6,
) -> DataFrame:
    """All pairs with cosine ≥ threshold.

    Cosine is computed as dot/(|a||b|) with a fixed left-to-right fold —
    NOT on pre-normalized vectors — so the result is bit-identical to a
    sequential oracle evaluating the same formula. (Pre-normalizing is
    the faster layout at scale but changes float rounding; swap it in
    when exact cross-engine reproducibility isn't required.) For n
    beyond ~10⁵ per executor switch the pair generator to sign-LSH
    bucketing so only same-bucket pairs join.
    """
    pre = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("u"))
    a, b = pre.alias("a"), pre.alias("b")
    score = F.round(cosine(F.col("a.u"), F.col("b.u")), round_to)
    return (
        a.join(b, F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            score.alias("score"),
        )
        .filter(F.col("score") >= threshold)
    )


def ivf_topk(
    df: DataFrame,
    centroids: DataFrame,
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cell_col: str = "cell",
) -> DataFrame:
    """IVF probe: rank cells by centroid∙query, search the best
    ``nprobe`` cells only.

    ``centroids``: (cell, centroid array<double>). In a real deployment
    the table is written partitioned/bucketed by cell so the probe is
    partition pruning, not a filter scan.
    """
    q = _query_vector_lit(query_vec)
    probe = (
        centroids.select(cell_col, cosine(F.col("centroid"), q).alias("cscore"))
        .orderBy(F.col("cscore").desc())
        .limit(nprobe)
        .select(cell_col)
    )
    pruned = df.join(F.broadcast(probe), cell_col)
    score = F.round(cosine(F.col(vec_col), q), 6)
    return (
        pruned.select(F.col(id_col), score.alias("score"))
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def train_centroids_by_label(
    df: DataFrame, label_col: str = "label", vec_col: str = "embedding", dim: int = 64
) -> DataFrame:
    """Per-cell mean vectors via posexplode + groupBy(cell, pos) — one
    shuffle of n·dim scalar rows, then re-assembled with array_agg
    ordered by position. (Stands in for a k-means trainer; the IVF
    plumbing is identical.)"""
    pos = df.select(
        F.col(label_col).alias("cell"), F.posexplode(F.col(vec_col)).alias("pos", "x")
    )
    means = pos.groupBy("cell", "pos").agg(F.avg(F.col("x").cast("double")).alias("m"))
    return (
        means.groupBy("cell")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
        .select("cell", F.transform("pm", lambda s: s["m"]).alias("centroid"))
    )
