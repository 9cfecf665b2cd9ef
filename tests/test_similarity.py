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
