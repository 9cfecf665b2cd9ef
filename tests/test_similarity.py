"""Similarity-search invariants: LSH vs exact baseline, plan shape."""

import math
import random

from yelp_data_pipeline_spark.operators import similarity as sim


def _vecs(spark, n=60, dim=16, seed=7):
    rnd = random.Random(seed)
    rows = []
    for i in range(n):
        v = [rnd.gauss(0, 1) for _ in range(dim)]
        rows.append((i, v))
    # planted near-duplicate of vec 0
    base = rows[0][1]
    rows.append((n, [x + rnd.gauss(0, 0.01) for x in base]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_cosine_topk_exact(spark):
    df = _vecs(spark)
    q = [float(x) for x in df.filter("vec_id = 0").first()["embedding"]]
    top = sim.cosine_topk(df, q, k=3).collect()
    assert top[0]["vec_id"] == 0 and math.isclose(top[0]["score"], 1.0, abs_tol=1e-6)
    assert top[1]["vec_id"] == 60  # the planted near-dup ranks second


def test_signlsh_no_cartesian_and_finds_planted_pair(spark):
    df = _vecs(spark)
    lsh = sim.cosine_neardup_pairs(df, threshold=0.95, dim=16)
    plan = lsh._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    pairs = {(r["id_a"], r["id_b"]) for r in lsh.collect()}
    assert (0, 60) in pairs, "planted near-identical pair must share every sign bit"


def test_signlsh_no_false_positives(spark):
    """LSH bounds recall only — every emitted pair must also pass the
    exact threshold (verified against the brute-force baseline)."""
    df = _vecs(spark)
    exact = {
        (r["id_a"], r["id_b"])
        for r in sim.cosine_neardup_pairs_exact(df, threshold=0.8).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in sim.cosine_neardup_pairs(df, threshold=0.8, dim=16).collect()
    }
    assert lsh <= exact


def test_hyperplanes_deterministic():
    a = sim.hyperplanes(4, 8)
    b = sim.hyperplanes(4, 8)
    assert a == b
    assert all(x in (1.0, -1.0) for row in a for x in row)


def test_hierarchical_routing_agrees_with_flat(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from yelp_data_pipeline_spark.operators import similarity as sim

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cents = sim.kmeans_centroids(emb, k=9, iters=1)

    hier = sim.route_hierarchical(emb, cents, probes=1, coarse_probes=2)
    top1_hier = {r["vec_id"]: r["cell"] for r in hier.collect()}

    score = F.round(sim.cosine(F.col("embedding"), F.col("centroid")), 6)
    w = Window.partitionBy("vec_id").orderBy(
        F.col("s").desc(), F.col("cell").desc()
    )
    flat = (
        emb.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cell", score.alias("s"))
        .withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
    )
    top1_flat = {r["vec_id"]: r["cell"] for r in flat.collect()}

    assert set(top1_hier) == set(top1_flat)
    agree = sum(
        1 for v, c in top1_flat.items() if top1_hier[v] == c
    ) / len(top1_flat)
    # Random fixture embeddings are hierarchical routing's worst case
    # (near-orthogonal, no cluster structure), so 2-of-3 coarse probes
    # land ~0.83; real clustered corpora route far better.
    assert agree >= 0.8, f"top-1 agreement {agree:.2f}"

    # Full coarse coverage must reproduce flat routing exactly — that
    # pins the two-hop plumbing, independent of recall.
    full = sim.route_hierarchical(emb, cents, probes=1, coarse_probes=3)
    top1_full = {r["vec_id"]: r["cell"] for r in full.collect()}
    assert top1_full == top1_flat
