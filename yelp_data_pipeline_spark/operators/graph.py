"""Graph operators: connected components for dedup clustering
(north-star extension — not in the reference, which has no graph ops).

Near-dup *pairs* (dedup.py, similarity.py) are only half of
deduplication: to drop duplicates you need the transitive closure —
if A~B and B~C, then {A,B,C} is one group and one survivor should be
kept. ``connected_components`` turns a pair list into (node, cluster)
labels; ``dedup_survivors`` picks min-id survivors per cluster.

Scale posture: the iteration is plain label propagation ("hash-min"),
each round a distributed join + min-aggregate; rounds needed = graph
diameter. Near-dup graphs are overwhelmingly tiny star/clique
clusters (diameter ≤ ~3), so convergence is fast. Each round's labels
are persisted and the previous round unpersisted; lineage is cut with
localCheckpoint every few rounds so plans don't grow unboundedly. For
adversarial long-chain graphs, the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) halves the diameter per round; hash-min is the right default
for dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Lineage is truncated every CHECKPOINT_EVERY rounds: iterative joins
# otherwise stack a full join+agg plan per round and analysis cost
# grows quadratically.
CHECKPOINT_EVERY = 3


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Label every node of the undirected graph ``edges`` with the
    minimum node id reachable from it (= component id).

    Returns (node, cluster) for every node that appears in an edge.
    Hash-min propagation: each round every node takes the min of its
    own label and its neighbors' labels; fixpoint when no label
    changes (checked with a distributed count — the only driver
    round-trip, one scalar per round).

    Raises ``RuntimeError`` if ``max_iter`` rounds pass without
    reaching the fixpoint (graph diameter > max_iter) — silently
    returning half-propagated labels would mislabel components. Raise
    ``max_iter`` (or switch to large-star/small-star, which halves the
    diameter per round) for adversarial long-chain graphs.
    """
    # Symmetrize with ONE scan of the (often expensive — e.g. a whole
    # MinHash-LSH pipeline) edge relation: explode each edge into both
    # directions. A union of two selects would execute that subtree
    # twice before the persist ever materializes.
    sym = (
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        sym.select(F.col("u").alias("node"))
        .distinct()
        .withColumn("cluster", F.col("node"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    for it in range(max_iter):
        # min label among each node's neighborhood (neighbors only;
        # the node's own label joins back below).
        nbr_min = (
            sym.join(labels, sym["v"] == labels["node"])
            .groupBy("u")
            .agg(F.min("cluster").alias("nbr_cluster"))
        )
        new_labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["u"], "left")
            .select(
                "node",
                F.least(
                    F.col("cluster"), F.coalesce("nbr_cluster", F.col("cluster"))
                ).alias("cluster"),
                (F.coalesce("nbr_cluster", F.col("cluster")) < F.col("cluster")).alias(
                    "__changed"
                ),
            )
        )
        if it % CHECKPOINT_EVERY == CHECKPOINT_EVERY - 1:
            new_labels = new_labels.localCheckpoint(eager=False)
        new_labels = new_labels.persist(StorageLevel.MEMORY_AND_DISK)
        changed = new_labels.filter(F.col("__changed")).count()
        labels.unpersist()
        labels = new_labels.select("node", "cluster")
        if changed == 0:
            break
    sym.unpersist()
    if changed != 0:
        labels.unpersist()
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing): graph diameter exceeds "
            "max_iter; raise it or use large-star/small-star."
        )
    # The returned relation is still persisted (callers typically fan it
    # into several joins); registered for deferred release.
    from ..session import _TRACKED_PERSISTS

    _TRACKED_PERSISTS.append(labels)
    return labels


def dedup_clusters(
    docs: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(doc_id, cluster_id) for EVERY document: docs in a near-dup
    component share the component's min doc_id; untouched docs are
    their own singleton cluster."""
    comp = connected_components(pairs, "doc_a", "doc_b")
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster", F.col("doc_id")).alias("cluster_id")
        )
    )


def dedup_survivors(clusters: DataFrame) -> DataFrame:
    """One surviving doc_id per cluster (the min = the cluster id
    itself under min-labeling) plus the member count — the row a
    curation pipeline keeps."""
    return clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members")
    ).select(F.col("cluster_id").alias("doc_id"), "n_members")
