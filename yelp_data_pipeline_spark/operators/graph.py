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
clusters (diameter ≤ ~3), so convergence is fast. Each round is ONE
job: a lazy localCheckpoint truncates the plan and the convergence
count materializes its blocks (plans don't grow unboundedly). For
adversarial long-chain graphs, the large-star/small-star algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14) halves the diameter per round; hash-min is the right default
for dedup workloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# Introspection: rounds the last connected_components call took to
# reach the label fixpoint (the changed==0 exit round included).
# Written for measurement tooling (BASELINE.md convergence tables);
# never read by the operators themselves.
LAST_CC_ROUNDS: int = 0


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
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1, got {max_iter}")
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
    init_labels = labels
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
        # ONE job per round (r18, the same fusion connected_components_
        # star got in r17): a LAZY localCheckpoint truncates the
        # round's LOGICAL plan at creation (without the cut the plan
        # string grows geometrically — measured 9.5 MB / 798 nested
        # references after ~6 rounds), and the convergence-count job
        # below both MATERIALIZES the checkpoint blocks
        # (MEMORY_AND_DISK, lineage truncated on job completion) and
        # answers the fixpoint test — the previous eager-checkpoint-
        # then-count shape paid a second full job per round for the
        # same rows. Blocks are RDD-owned (freed by the context
        # cleaner once the round's frame is dropped — the cut_lineage
        # trade, fine for slim label relations).
        new_labels = new_labels.localCheckpoint(eager=False)
        changed = new_labels.filter(F.col("__changed")).count()
        labels = new_labels.select("node", "cluster")
        if changed == 0:
            break
    global LAST_CC_ROUNDS
    LAST_CC_ROUNDS = it + 1
    sym.unpersist()
    init_labels.unpersist()
    if changed != 0:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing): graph diameter exceeds "
            "max_iter; raise it or use connected_components_star "
            "(O(log d) rounds)."
        )
    # The returned relation reads the final round's checkpoint blocks
    # (materialized by its convergence count), so callers that fan it
    # into several joins scan cached blocks, not a recompute.
    return labels


def connected_components_star(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
    rounds_per_checkpoint: int = 1,
    prepass_rounds: int = 0,
) -> DataFrame:
    """Connected components via the alternating large-star/small-star
    algorithm (Kiveris et al., "Connected Components in MapReduce and
    Beyond", SoCC'14) — O(log d) rounds where hash-min needs d, so the
    right tool when ``connected_components`` raises on an adversarial
    long-chain graph. Same output contract: (node, cluster) with
    cluster = the component's min node id, for every node in an edge.

    Per round (all plain joins/aggregates, edge-keyed shuffles):
    - large-star: every node u links its LARGER neighbors to
      m = min(neighborhood ∪ {u});
    - small-star: every node u links its smaller-or-equal neighbors
      (and itself) to their min.
    Fixpoint when the edge set stops changing; the result is a forest
    of depth-1 stars centered at component minima.

    Driver-round-trip economy: the fixpoint test is ONE
    full-outer-join job (a row with either side NULL ⇒ edge sets
    differ) instead of the count-then-anti-join pair.
    ``rounds_per_checkpoint`` > 1 fuses star rounds into one
    checkpoint — convergence-sound (the star fixpoint is stable) but
    MEASURED SLOWER (3× at sf0.1): each round fans its input out ~4
    ways (sym feeds the min-aggregate and the join, large feeds
    small-star twice), so an un-materialized first round is
    re-computed by every consumer of the second — the same
    fan-out-needs-materialization law the per-round eager checkpoint
    exists to enforce. Default stays 1; the knob documents the
    negative result.

    ``prepass_rounds`` > 0 runs that many cheap HASH-MIN rounds first
    and CONTRACTS the graph by the partial labels before the star
    loop: after k rounds every node holds the min id of its k-hop
    neighborhood, each edge (u, v) maps to (L(u), L(v)), self-loops
    drop, and components of diameter ≤ k vanish entirely — the star
    rounds then see only the residual long-diameter skeleton.
    Soundness: L(u) is always in u's component (it is a neighborhood
    min), a component's global min m has L(m) = m, and contracted
    edges preserve inter-group connectivity, so star-over-contracted
    labels compose exactly (node → L(node) → star label).

    NEGATIVE RESULT on the golden-records graph (measured sf0.1,
    BASELINE.md round 12): break-even within host noise (warm ~10.5s
    either way at k ∈ {2, 3, 6}). The premise — collapse the
    short-diameter mass so the star rounds shuffle fewer edges —
    is structurally void there: TPC-H customer names chain at edit
    distance 1, so the edge mass sits in giant chain components and
    k hash-min rounds cut only ~3% of edges per round (44100 → 40050
    at k=3) while costing k extra join+agg rounds. Default stays 0.
    The knob is kept (correctness-pinned in tests/test_round12_ops)
    because on the COMMON near-dup shape — tiny star/clique clusters,
    diameter ≤ ~3 — the same contraction erases almost the whole edge
    set before the first star round.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    all_nodes = (
        e.select(F.col("u").alias("node"))
        .union(e.select("v"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    all_nodes.count()
    pre = None
    if prepass_rounds > 0:
        sym0 = (
            e.select("u", "v")
            .union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        lab = all_nodes.select("node", F.col("node").alias("l"))
        for _ in range(prepass_rounds):
            nbr_min = (
                sym0.join(
                    lab.select(F.col("node").alias("v"), "l"), "v"
                )
                .groupBy("u")
                .agg(F.min("l").alias("nl"))
                .withColumnRenamed("u", "node")
            )
            # Eager checkpoint per round — the CC lineage law: an
            # unmaterialized round is re-derived by the next one.
            lab = (
                lab.join(nbr_min, "node", "left")
                .select(
                    "node",
                    F.least(
                        F.col("l"), F.coalesce("nl", F.col("l"))
                    ).alias("l"),
                )
                .localCheckpoint(eager=True)
            )
        sym0.unpersist()
        pre = lab  # (node, l): node -> min id of its k-hop neighborhood
        contracted = (
            e.join(pre.select(F.col("node").alias("u"), F.col("l").alias("lu")), "u")
            .join(pre.select(F.col("node").alias("v"), F.col("l").alias("lv")), "v")
            .select(F.col("lu").alias("u"), F.col("lv").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        e.unpersist()
        e = contracted.persist(StorageLevel.MEMORY_AND_DISK)
    converged = False
    for _ in range(max_iter):
        cur = e
        for _sub in range(max(1, rounds_per_checkpoint)):
            # ---- large-star ----
            sym = cur.select("u", "v").union(
                cur.select(F.col("v").alias("u"), F.col("u").alias("v"))
            )
            mins = sym.groupBy("u").agg(
                F.least(F.min("v"), F.first("u")).alias("m")
            )
            large = (
                sym.join(mins, "u")
                .where(F.col("v") > F.col("u"))
                .select(F.col("v").alias("u"), F.col("m").alias("v"))
            )
            # ---- small-star (on the large-star output) ----
            oriented = large.select(
                F.greatest("u", "v").alias("a"), F.least("u", "v").alias("b")
            ).where(F.col("a") != F.col("b"))
            smins = oriented.groupBy("a").agg(F.min("b").alias("m"))
            cur = (
                oriented.join(smins, "a")
                .select(F.col("b").alias("u"), F.col("m").alias("v"))
                .union(
                    smins.select(F.col("a").alias("u"), F.col("m").alias("v"))
                )
                .where(F.col("u") != F.col("v"))
                .distinct()
            )
        # ONE job per round (r17): a LAZY localCheckpoint truncates the
        # round's LOGICAL plan immediately (the returned frame scans a
        # LogicalRDD — without the cut each round references `e` ~6
        # times, so plan size grows multiplicatively and the driver
        # OOMs generating plan strings within a few rounds), while the
        # fixpoint-count job below both MATERIALIZES the checkpoint
        # blocks (MEMORY_AND_DISK, lineage truncated on job
        # completion) and answers convergence — the previous
        # eager-checkpoint-then-count shape paid a second full job per
        # round for the same result. Blocks are RDD-owned (freed by
        # the context cleaner once the round's frame is dropped — the
        # cut_lineage trade, fine for slim edge lists). The fixpoint
        # test is unchanged: any full-outer row with a NULL side is an
        # edge present in exactly one of the two sets. (A bare
        # left-anti count is NOT sufficient — new_e ⊂ e gives 0.)
        new_e = cur.localCheckpoint(eager=False)
        changed = (
            new_e.withColumn("__a", F.lit(1))
            .join(e.withColumn("__b", F.lit(1)), ["u", "v"], "full_outer")
            .where(F.col("__a").isNull() | F.col("__b").isNull())
            .count()
        )
        e.unpersist()  # explicit persist on round 0's e; no-op after
        e = new_e
        if changed == 0:
            converged = True
            break
    if not converged:
        e.unpersist()
        all_nodes.unpersist()
        raise RuntimeError(
            f"alternating star did not converge in {max_iter} rounds"
        )
    # Stars: (u → center). Centers and isolated-after-dedup nodes
    # label themselves. With a pre-pass, compose through the partial
    # labels: node → L(node) → star label of the contracted
    # representative (L(node) when the representative is itself a
    # center, or when its component collapsed entirely pre-star).
    if pre is not None:
        labels = (
            pre.join(e, pre["l"] == e["u"], "left")
            .select(
                "node", F.coalesce("v", F.col("l")).alias("cluster")
            )
        )
    else:
        labels = (
            all_nodes.join(e, all_nodes["node"] == e["u"], "left")
            .select(
                "node", F.coalesce("v", F.col("node")).alias("cluster")
            )
        )
    # Eagerly checkpoint the (tiny: one row per node) label map and
    # release the loop relations NOW: without the cut, every consumer
    # of the returned frame embeds the full blocking/verify lineage of
    # the ORIGINAL edge relation in its plan — customer_golden_records'
    # three survivorship arms audited at 550 joins / 224 exchanges
    # before this (round-10 plan audit), ~30 after. One extra small job
    # here buys a scan-sized plan for every downstream subtree.
    labels = labels.localCheckpoint(eager=True)
    e.unpersist()
    all_nodes.unpersist()
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


def clustering_rand_index(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    label_col: str = "cluster_id",
) -> DataFrame:
    """Rand index and adjusted Rand index between two clusterings of
    the same id universe (Rand 1971; Hubert & Arabie 1985) — the
    cluster-LEVEL agreement eval that the pair-level recall evals
    (minhash_recall_eval, simhash_recall_eval) can't express: two
    clusterings can share most candidate pairs yet cut the transitive
    closure differently, and it is the CLOSURE that decides which
    documents a dedup pass deletes.

    Pair-counting form from the label contingency table, exact
    integers throughout: with n_ij = |cluster i of A ∩ cluster j of B|
    and T2(x) = Σ x·(x−1) (twice the pair count),

        RI  = (n(n−1) + 2·T2(n_ij) − T2(a_i) − T2(b_j)) / (n(n−1))
        ARI = (S_ij − S_a·S_b/P) / ((S_a+S_b)/2 − S_a·S_b/P),
              S = T2/2, P = n(n−1)/2

    T2 sums accumulate in DECIMAL(38,0) (n(n−1) ≈ 10²⁴ at 10¹²
    docs — int64 is long gone); the final RI/ARI are fixed IEEE
    sequences on exact parts, rounded 6dp. ARI is NULL when its
    denominator is 0 (both clusterings all-singletons or all-one-
    cluster — agreement is undefined, not 1.0).

    Plan: one id-keyed join of the two label relations, one combinable
    groupBy to the contingency CELLS, then every statistic is an
    aggregate of that bounded relation (≤ clusters_A × clusters_B
    rows) combined via broadcast 1-row cross joins.

    Returns ONE row: (n_docs, n_clusters_a, n_clusters_b, rand_index,
    adjusted_rand).
    """
    la = a.select(F.col(id_col).alias("__id"), F.col(label_col).alias("__ca"))
    lb = b.select(F.col(id_col).alias("__id"), F.col(label_col).alias("__cb"))
    cells = (
        la.join(lb, "__id")
        .groupBy("__ca", "__cb")
        .agg(F.count(F.lit(1)).alias("nij"))
    )
    from ..session import track_persist

    cells = track_persist(cells)
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    def t2(col):
        return F.sum(dec(F.col(col)) * (dec(F.col(col)) - F.lit(1)))

    tot = cells.agg(
        F.sum("nij").cast("long").alias("n_docs"),
        t2("nij").alias("t2ij"),
    )
    pa = (
        cells.groupBy("__ca")
        .agg(F.sum("nij").alias("ai"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters_a"), t2("ai").alias("t2a"))
    )
    pb = (
        cells.groupBy("__cb")
        .agg(F.sum("nij").alias("bj"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_clusters_b"), t2("bj").alias("t2b"))
    )
    j = tot.crossJoin(F.broadcast(pa)).crossJoin(F.broadcast(pb))
    n = F.col("n_docs").cast("double")
    nn = n * (n - F.lit(1.0))
    t2ij = F.col("t2ij").cast("double")
    t2a = F.col("t2a").cast("double")
    t2b = F.col("t2b").cast("double")
    sij, sa, sb = t2ij / F.lit(2.0), t2a / F.lit(2.0), t2b / F.lit(2.0)
    pp = nn / F.lit(2.0)
    ari_den = (sa + sb) / F.lit(2.0) - sa * sb / pp
    # A single document has no pairs (nn = 0): NULL indices via SQL
    # 0/0 semantics, never an ANSI crash — the ari_den probe itself
    # divides by pp, so it only evaluates inside the n > 1 branch.
    return j.select(
        "n_docs",
        "n_clusters_a",
        "n_clusters_b",
        F.when(
            nn > 0,
            F.round((nn + F.lit(2.0) * t2ij - t2a - t2b) / nn, 6),
        ).alias("rand_index"),
        F.when(
            nn > 0,
            F.round(
                F.when(
                    ari_den != F.lit(0.0), (sij - sa * sb / pp) / ari_den
                ),
                6,
            ),
        ).alias("adjusted_rand"),
    )


def degree_assortativity(
    edges: DataFrame, src: str = "a", dst: str = "b"
) -> DataFrame:
    """Degree assortativity coefficient of an undirected graph
    (Newman 2002): the Pearson correlation of endpoint degrees over
    edges — positive means hubs link to hubs (social-network shape),
    negative means hubs link to leaves (hub-and-spoke
    infrastructure). For a dedup/co-occurrence graph it reads whether
    duplication is one giant hub or a mesh — which decides whether
    connected components need the O(log d) star variant.

    ``edges`` must be the UNIQUE undirected pair set; each edge enters
    the correlation in BOTH orientations (the standard symmetric
    formulation). Exact construction: integer degrees from one
    combinable groupBy over the symmetrized endpoints; the five
    Pearson moments accumulate in DECIMAL(38,0)/HUGEINT (deg^2 over
    1e12 edges passes int64); ONE fixed IEEE tail, rounded 6dp. A
    degree-regular graph (zero variance) yields NULL, not 0/0.

    Plan: symmetrize with one explode, one degree groupBy, two
    map-side joins of the slim degree relation, one combinable moment
    aggregate. Returns ONE row: (n_edges, assortativity).
    """
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
    )
    from ..session import track_persist

    sym = track_persist(sym)
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("u").alias("__u"), F.col("d").alias("dx"))
    dv = deg.select(F.col("u").alias("__v"), F.col("d").alias("dy"))
    pairs = (
        sym.join(du, sym["u"] == du["__u"])
        .join(dv, sym["v"] == dv["__v"])
        .select("dx", "dy")
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    m = pairs.agg(
        F.count(F.lit(1)).alias("n2"),
        F.sum(dec(F.col("dx"))).alias("sx"),
        F.sum(dec(F.col("dy"))).alias("sy"),
        F.sum(dec(F.col("dx")) * dec(F.col("dy"))).alias("sxy"),
        F.sum(dec(F.col("dx")) * dec(F.col("dx"))).alias("sxx"),
        F.sum(dec(F.col("dy")) * dec(F.col("dy"))).alias("syy"),
    )
    n = F.col("n2").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    den1 = n * sxx - sx * sx
    den2 = n * syy - sy * sy
    r = (n * sxy - sx * sy) / (F.sqrt(den1) * F.sqrt(den2))
    return m.select(
        (F.col("n2") / F.lit(2)).cast("long").alias("n_edges"),
        F.when((den1 > 0) & (den2 > 0), F.round(r, 6)).alias(
            "assortativity"
        ),
    )


def pagerank_integer(
    edges: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Fixed-iteration PageRank in EXACT integer arithmetic.

    Floating-point PageRank is not reproducible across engines (or even
    across partition counts — FP addition is not associative, so the
    shuffle's reduce order changes low bits). Here ranks are integers
    scaled by ``scale`` and every step uses only integer div/multiply/
    add, which are exact and order-independent:

        r0(v)     = scale div n
        C_t(v)    = sum over in-edges (u,v) of  r_t(u) div outdeg(u)
        r_{t+1}(v)= ((100-damping_pct)*scale div 100) div n
                    + (damping_pct * C_t(v)) div 100

    so any engine (the DuckDB oracle replays it with unrolled CTEs and
    ``//``) produces bit-identical ranks. Dangling mass (nodes with no
    out-edges) is dropped rather than redistributed — acceptable for
    ranking use and keeps each iteration one join + one aggregate.

    Scale posture: per iteration ONE shuffle join (edges ⋈ ranks on
    src — edges can be pre-partitioned by src once and reused every
    round) + ONE groupBy(dst) aggregate with map-side partial sums.
    The node count is ONE driver scalar (the same one-count budget CC
    and k-core spend per round), then a literal in the integer
    expressions. iters is fixed (anytime algorithm), not
    converge-tested: each iteration contracts the error by the damping
    factor, so ~20 rounds reach 1e-3 of stationary; 3 suffice for a
    deterministic cross-engine fixture.

    Overflow: ranks sum to ≤ scale, so damping_pct * C_t ≤ 85·10^12,
    comfortably inside int64.

    edges: (src: string, dst: string), pre-deduplicated.
    Returns (node: string, rank_scaled: long).
    """
    from ..session import track_persist

    teleport_mass = (100 - damping_pct) * scale // 100
    # Loop invariants persist ONCE: without this, every iteration's plan
    # re-executes the edge build (and its dedup shuffle) from source —
    # measured 59 exchanges for 3 rounds vs 12 with reuse. On a real
    # cluster, additionally repartition edges by src so the per-round
    # ranks join reuses the exchange.
    edges = track_persist(edges)
    # deg joins by src every round; computing it pre-attached to edges
    # would denormalize — keep it a slim (src, outdeg) relation instead.
    deg = track_persist(edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg")))
    nodes = track_persist(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    # Global PageRank IS the personalized variant with S = V: delegate
    # to the shared loop (is_seed ≡ 1, ns = |V|) so the per-round
    # join/aggregate/lineage discipline exists once. |V| arrives as
    # ONE driver scalar — the same one-count-per-run budget CC and
    # k-core spend per ROUND.
    n = nodes.count()
    if n == 0:
        # Empty graph: no nodes, no ranks — an empty relation, not a
        # crash (an upstream filter that drops every edge must not
        # kill the stage; scale // 0 would).
        return nodes.select(
            "node", F.lit(None).cast("long").alias("rank_scaled")
        )
    flagged = nodes.withColumn("is_seed", F.lit(1))
    return _pagerank_loop(
        edges, deg, flagged, n, iters, scale, damping_pct, teleport_mass
    )


def kcore_peel(
    edges: DataFrame,
    k: int,
    rounds: int = 8,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """k-core extraction by iterative peeling: repeatedly drop nodes
    whose degree among *surviving* nodes is < k; what remains is the
    k-core (Seidman 1983) — the standard density screen for graph-side
    curation (spam rings, bot cliques, tightly co-occurring entities).

    Anytime contract (the pagerank_integer pattern): BOTH engines run
    exactly ``rounds`` peel rounds, so results agree even if the peel
    has not reached its fixpoint — and because peeling is monotone
    (survivor sets only shrink, and a converged round is a no-op),
    early convergence before ``rounds`` yields the true k-core on both
    sides. The Spark loop early-exits on a converged round (one
    distributed count per round, the only driver scalar); extra
    oracle rounds past convergence change nothing.

    Scale posture: per round ONE semi-join of the symmetrized edge
    list against the survivor set (edge-keyed shuffle) + ONE
    groupBy(node) degree count with map-side partials; survivor
    lineage is cut every round (eager localCheckpoint — the CC
    lesson, see module header). Edges symmetrize + dedup once up
    front and stay persisted across rounds.

    Returns (node, core_deg): surviving nodes with their within-core
    degree after ``rounds`` rounds.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    from ..session import track_persist

    sym = track_persist(
        edges.select(
            F.explode(
                F.array(
                    F.struct(F.col(src).alias("u"), F.col(dst).alias("v")),
                    F.struct(F.col(dst).alias("u"), F.col(src).alias("v")),
                )
            ).alias("e")
        )
        .select("e.u", "e.v")
        .where(F.col("u") != F.col("v"))
        .distinct()
    )
    alive = sym.select(F.col("u").alias("node")).distinct()
    n_alive = None
    for _ in range(rounds):
        deg = (
            sym.join(alive, sym["u"] == alive["node"], "left_semi")
            .join(
                alive.select(F.col("node").alias("__vn")),
                sym["v"] == F.col("__vn"),
                "left_semi",
            )
            .groupBy("u")
            .agg(F.count(F.lit(1)).alias("core_deg"))
        )
        survivors = deg.where(F.col("core_deg") >= k)
        # LAZY checkpoint + count = ONE job per round (r17): the count
        # materializes the checkpoint blocks and yields the
        # convergence scalar; the previous eager-then-count shape paid
        # a second full job per round. Plan stays flat either way (the
        # returned frame scans the checkpointed RDD).
        survivors = survivors.localCheckpoint(eager=False)
        n_next = survivors.count()
        alive = survivors.select(F.col("u").alias("node"))
        if n_alive is not None and n_next == n_alive:
            break
        n_alive = n_next
    # Final degrees come from the last converged/round-limited pass.
    return survivors.select(F.col("u").alias("node"), "core_deg")


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Per-node triangle participation counts via degree-ordered edge
    orientation ("compact-forward", Latapy 2008; the MapReduce variant
    is Suri & Vassilvitskii, WWW'11) — north-star graph extension, no
    reference counterpart.

    The naive wedge join explodes on hubs: a degree-d node contributes
    O(d²) wedges, and real co-occurrence graphs are heavy-tailed.
    Orienting every undirected edge from its lower-(degree, id) endpoint
    to its higher one bounds EVERY out-degree by O(sqrt(m)) — a node of
    degree d only keeps out-edges to neighbors of degree ≥ d, and there
    can be at most ~sqrt(2m) such neighbors — so the wedge join is
    O(m^1.5) worst-case instead of hub-quadratic. Each triangle is then
    enumerated exactly once: its three nodes form a total-order chain
    u < v < w (by (deg, id)), the wedge (u→v, u→w) is built only at the
    minimum node, and the closing edge lookup is an equi-join on (v, w)
    against the oriented edge set itself.

    Distribution: 3 shuffles total past the degree computation — the
    wedge self-join on the low endpoint, the closing-edge join on
    (v, w), and the final explode+count. No driver collects; the total
    order is (degree, node-id), both engine-portable (the DuckDB oracle
    replays it verbatim).

    edges: undirected pair list; duplicates / reversed duplicates /
    self-loops tolerated. Returns (node, n_triangles) for nodes in ≥1
    triangle.

    ``und`` and ``oriented`` are each referenced 2-3 times downstream;
    lineage is cut (localCheckpoint, the pagerank/CC lesson) rather
    than persisted, because nested multi-reference makes the *plan*
    grow geometrically even when the cache executes once — the
    checkpoint keeps both the execution AND the plan linear.
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    und = und.localCheckpoint(eager=False)
    deg = (
        und.select(F.col("a").alias("node"))
        .union(und.select(F.col("b")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("db"))
    # Orient low-(deg, id) -> high-(deg, id); keep the head's rank key so
    # the wedge can order its two spokes without another degree join.
    oriented = (
        und.join(da, "a")
        .join(db, "b")
        .select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(
                    F.col("a").alias("u"),
                    F.col("b").alias("v"),
                    F.col("db").alias("dv"),
                ),
            )
            .otherwise(
                F.struct(
                    F.col("b").alias("u"),
                    F.col("a").alias("v"),
                    F.col("da").alias("dv"),
                )
            )
            .alias("e")
        )
        .select("e.u", "e.v", "e.dv")
    )
    oriented = oriented.localCheckpoint(eager=False)
    e1 = oriented.select(
        F.col("u"), F.col("v").alias("v1"), F.col("dv").alias("dv1")
    )
    e2 = oriented.select(
        F.col("u"), F.col("v").alias("v2"), F.col("dv").alias("dv2")
    )
    wedges = e1.join(e2, "u").where(
        (F.col("dv1") < F.col("dv2"))
        | ((F.col("dv1") == F.col("dv2")) & (F.col("v1") < F.col("v2")))
    )
    closing = oriented.select(
        F.col("u").alias("v1"), F.col("v").alias("v2")
    )
    tri = wedges.join(closing, ["v1", "v2"]).select("u", "v1", "v2")
    return (
        tri.select(
            F.explode(F.array(F.col("u"), F.col("v1"), F.col("v2"))).alias("node")
        )
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def pagerank_personalized(
    edges: DataFrame,
    seeds: DataFrame,
    iters: int = 3,
    scale: int = 10**12,
    damping_pct: int = 85,
) -> DataFrame:
    """Personalized PageRank in exact integer arithmetic: the teleport
    mass returns to a SEED SET instead of all nodes, so ranks measure
    proximity to the seeds (Page et al. 1999 §6 'personalized'; the
    random walker restarts at the seeds). The workhorse of
    seed-expansion retrieval — "entities related to THESE" — where
    global PageRank only answers "globally central".

        r0(v)      = scale div |S|                   if v ∈ S else 0
        r_{t+1}(v) = [v ∈ S] · (teleport div |S|)
                     + damping · C_t(v) div 100

    Seeds are intersected with the graph's node set FIRST (both
    engines must agree on |S|; teleporting to absent nodes would
    silently leak mass). Same determinism/scale posture as
    pagerank_integer: integer-only steps replay bit-identically in
    the unrolled DuckDB oracle; per iteration ONE edges⋈ranks shuffle
    + ONE dst aggregate; the seed flag is attached to the node
    relation once and persists across rounds; lineage cut per round.

    seeds: DataFrame with a ``node`` column. Returns
    (node, rank_scaled).
    """
    from ..session import track_persist

    teleport_mass = (100 - damping_pct) * scale // 100
    edges = track_persist(edges)
    deg = track_persist(
        edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    )
    nodes = edges.select(F.col("src").alias("node")).union(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    flagged = track_persist(
        nodes.join(
            seeds.select("node").distinct().withColumn("__seed", F.lit(1)),
            "node",
            "left",
        ).select("node", F.coalesce("__seed", F.lit(0)).alias("is_seed"))
    )
    # ONE driver scalar (same budget as CC's convergence counts): |S∩V|
    # must be validated — with zero surviving seeds every teleport
    # branch is dead and the loop would SILENTLY return all-zero ranks
    # (a typo'd seed prefix reads as "nothing is related"). The scalar
    # also replaces the broadcast-stat cross join with a literal.
    ns, nn = flagged.agg(
        F.sum("is_seed"), F.count(F.lit(1))
    ).first()
    if nn == 0:
        # Empty graph: an empty rank relation, not a crash — distinct
        # from the typo'd-seed case below, which only makes sense when
        # there ARE nodes the seeds could have hit.
        return flagged.select(
            "node", F.lit(None).cast("long").alias("rank_scaled")
        )
    if not ns:
        raise ValueError(
            "pagerank_personalized: no seed intersects the graph's node "
            "set — ranks would be uniformly zero. Check the seed ids."
        )
    return _pagerank_loop(
        edges, deg, flagged, int(ns), iters, scale, damping_pct, teleport_mass
    )


def _pagerank_loop(
    edges: DataFrame,
    deg: DataFrame,
    flagged: DataFrame,
    ns: int,
    iters: int,
    scale: int,
    damping_pct: int,
    teleport_mass: int,
) -> DataFrame:
    """Shared integer-PageRank iteration: ``flagged`` = (node,
    is_seed) with ``ns`` seed rows; global PageRank is the special
    case is_seed ≡ 1, ns = |V| (pagerank_integer delegates here), so
    the join/aggregate/lineage discipline cannot drift between the
    global and personalized variants."""
    ranks = flagged.select(
        "node",
        F.when(
            F.col("is_seed") == 1, F.lit(scale // ns)
        ).otherwise(F.lit(0)).alias("r"),
    )
    for _ in range(iters):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(deg, "src")
            .select(F.col("dst"), F.expr("r div outdeg").alias("c"))
        )
        agg = contrib.groupBy("dst").agg(F.sum("c").alias("c"))
        ranks = (
            flagged.join(agg, flagged["node"] == agg["dst"], "left")
            .select(
                "node",
                (
                    F.when(
                        F.col("is_seed") == 1, F.lit(teleport_mass // ns)
                    ).otherwise(F.lit(0))
                    + F.expr(f"({damping_pct} * coalesce(c, 0)) div 100")
                ).alias("r"),
            )
        )
        ranks = ranks.localCheckpoint(eager=False)
    return ranks.select("node", F.col("r").alias("rank_scaled"))


def global_clustering(edges: DataFrame, a: str = "a", b: str = "b") -> DataFrame:
    """Global clustering coefficient (transitivity) of an undirected
    graph: C = 3*triangles / wedges — the one-number cohesion summary
    over the per-node triangle counts: C near a random graph's p
    means co-occurrence is incidental; C >> random means the graph
    has real community structure, which decides whether dedup
    clustering will produce meaningful groups or hairballs. Pairs
    with degree_assortativity the way variance pairs with mean.

    Exact: triangle mass reuses triangle_counts (degree-ordered
    compact-forward, O(m^1.5) worst-case — each triangle lands on
    its 3 corners, so sum/3 is the count, an exact integer);
    wedge mass is sum over nodes of d*(d-1)/2 from the degree
    relation, exact in DECIMAL(38,0) (hub degrees square past int64
    at 100 TB graph scale). C is ONE double division of exact
    integers, 6dp; a wedge-free graph yields NULL.

    Returns ONE row: (n_nodes, n_edges, n_triangles, n_wedges, c).
    """
    und = edges.select(
        F.least(F.col(a), F.col(b)).alias("u"),
        F.greatest(F.col(a), F.col(b)).alias("v"),
    ).distinct()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionAll(und.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).cast("long").alias("d"))
    )
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    wedges = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum(dec(F.col("d")) * dec(F.col("d")) - dec(F.col("d"))) / F.lit(2))
        .cast("decimal(38,0)")
        .alias("n_wedges_d"),
    )
    ecount = und.agg(F.count(F.lit(1)).cast("long").alias("n_edges"))
    tri = triangle_counts(und, "u", "v").agg(
        (F.coalesce(F.sum("n_triangles"), F.lit(0)) / F.lit(3))
        .cast("long")
        .alias("n_triangles")
    )
    j = wedges.crossJoin(F.broadcast(ecount)).crossJoin(F.broadcast(tri))
    return j.select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.col("n_wedges_d").cast("long").alias("n_wedges"),
        F.when(
            F.col("n_wedges_d") > 0,
            F.round(
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges_d").cast("double"),
                6,
            ),
        ).alias("c"),
    )


def bfs_hops(
    edges: DataFrame, src: str = "a", dst: str = "b", rounds: int = 8
) -> DataFrame:
    """Breadth-first hop-distance histogram from the graph's
    max-degree node (tie: min id) — the traversal primitive the graph
    tier lacked next to PageRank/k-core/triangles: the hop profile is
    the empirical diameter/reach read ("how many hops until the
    component is covered"), the number that decides how many rounds
    iterative algorithms on this graph actually need.

    Level-synchronous frontier expansion, the canonical distributed
    BFS: each round is one key-shuffled join frontier->edges plus an
    anti-join against the settled set, so a node enters `dist` at its
    FIRST (minimal) hop — no min() reduction needed. `rounds` bounds
    the unrolled plan (the k-core/pagerank anytime contract: fixed
    rounds, exact integers, deterministic regardless of scheduling);
    nodes not reached within `rounds` report as hop -1. Eager
    localCheckpoint per round keeps lineage linear (the plan-fan-in
    lesson from the unigram-LM DP).

    Returns (hop, n_nodes) ordered by hop; the -1 row only when
    unreached nodes exist.
    """
    half = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    # Materialize the symmetric edge list ONCE: every round joins
    # against it, and without this the (potentially expensive)
    # edge-build lineage re-executes per round — measured 17s -> ~4s
    # on the co-supply graph at sf0.1 (the build is the shared
    # kcore/triangles self-join).
    sym = (
        half.union(
            half.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
    seed = (
        deg.orderBy(F.desc("deg"), F.asc("u"))
        .limit(1)
        .select(F.col("u").alias("node"), F.lit(0).cast("int").alias("hop"))
    )
    seed = seed.localCheckpoint(eager=True)
    # ONE job per round (r17): the frontier is LAZY-checkpointed and
    # its count job both materializes the checkpoint blocks and
    # answers the emptiness probe — the previous shape paid three jobs
    # per round (eager frontier checkpoint, eager checkpoint of the
    # growing dist union, isEmpty). The settled set is kept as a LIST
    # of per-round checkpointed frontiers; each anti-join unions those
    # flat scans (linear plan, no per-round union checkpoint job).
    levels = [seed]
    frontier = seed
    for h in range(1, rounds + 1):
        settled = levels[0].select("node")
        for lv in levels[1:]:
            settled = settled.union(lv.select("node"))
        nxt = (
            frontier.join(sym, frontier["node"] == sym["u"])
            .select(F.col("v").alias("node"))
            .distinct()
            .join(settled, "node", "left_anti")
            .withColumn("hop", F.lit(h).cast("int"))
            .localCheckpoint(eager=False)
        )
        n_new = nxt.count()
        frontier = nxt
        if n_new == 0:
            break
        levels.append(nxt)
    dist = levels[0]
    for lv in levels[1:]:
        dist = dist.union(lv)
    hist = dist.groupBy("hop").agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes")
    )
    unreach = (
        sym.select("u")
        .distinct()
        .join(dist.select(F.col("node").alias("u")), "u", "left_anti")
        .agg(F.count(F.lit(1)).cast("long").alias("n_nodes"))
        .where(F.col("n_nodes") > 0)
        .select(F.lit(-1).cast("int").alias("hop"), "n_nodes")
    )
    return hist.unionByName(unreach).orderBy("hop")


def hits_bipartite(
    edges: DataFrame,
    left_col: str,
    right_col: str,
    rounds: int = 2,
    top_k: int = 10,
) -> DataFrame:
    """Unnormalized HITS (Kleinberg 1999, "Authoritative sources in a
    hyperlinked environment") on a bipartite graph — hub scores on the
    left partition, authority scores on the right, returned as the
    top-k right nodes by final authority.

    Recurrence with a(r) initialized to 1:

        h_i(l) = Σ_{r adjacent to l} a_{i-1}(r)
        a_i(r) = Σ_{l adjacent to r} h_i(l)

    The textbook L2 normalization between rounds only rescales every
    score by the same scalar — it cannot change the RANKING, which is
    what this operator returns — so it is dropped and the whole
    computation stays in EXACT integer arithmetic (round 1's hub score
    is the left degree; round 2's authority is a degree-weighted
    two-hop mass). Scores are accumulated in DECIMAL(38,0): they grow
    like edges·deg^(2·rounds−1), which exits int64 long before it
    exits 38 digits; the final projection casts to BIGINT (exact while
    the true value < 2⁶³ — fine at any realistic catalog size, and the
    cast would error loudly under ANSI rather than wrap).

    Anytime contract (same as pagerank/bfs here): a FIXED round count
    is part of the operator's definition — the oracle replays the same
    unrolled recurrence, so any engine agrees bit-for-bit.

    Scale: the deduped edge list is persisted and reused by all
    2·rounds joins; each half-round is one key-partitioned
    shuffle-join + one combinable groupBy (map-side partials), never a
    global sort. The final top-k is a TakeOrdered (per-partition heap
    + driver merge of k rows), and the rank window runs on the ≤k-row
    result, not the graph.
    """
    e = (
        edges.select(
            F.col(left_col).cast("long").alias("l"),
            F.col(right_col).cast("long").alias("r"),
        )
        .where(F.col("l").isNotNull() & F.col("r").isNotNull())
        .distinct()
    )
    from ..session import track_persist

    e = track_persist(e)
    a = e.select("r").distinct().withColumn(
        "s", F.lit(1).cast("decimal(38,0)")
    )
    for _ in range(rounds):
        h = e.join(a, "r").groupBy("l").agg(F.sum("s").alias("s"))
        a = e.join(h, "l").groupBy("r").agg(F.sum("s").alias("s"))
    deg = e.groupBy("r").agg(F.count(F.lit(1)).cast("long").alias("degree"))
    top = (
        a.join(deg, "r")
        .select(
            F.col("r").alias("node"),
            "degree",
            F.col("s").cast("long").alias("authority"),
        )
        .orderBy(F.desc("authority"), F.asc("node"))
        .limit(top_k)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.desc("authority"), F.asc("node"))
    return top.withColumn(
        "rank", F.row_number().over(w).cast("int")
    ).orderBy("rank")
