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


def test_adaptive_lsh_bits_integer_rule():
    # smallest b in [2,12] with 128·2^b >= n — pure integer arithmetic.
    assert sim.adaptive_lsh_bits(0) == 2
    assert sim.adaptive_lsh_bits(500) == 2
    assert sim.adaptive_lsh_bits(512) == 2
    assert sim.adaptive_lsh_bits(513) == 3
    assert sim.adaptive_lsh_bits(2000) == 4
    assert sim.adaptive_lsh_bits(128 << 12) == 12
    assert sim.adaptive_lsh_bits(10**9) == 12  # clamped: hand off to IVF


def test_adaptive_banding_is_default_and_matches_fixed_at_small_n(spark):
    # 61 vectors -> bits=2 -> 16 planes: the adaptive default must
    # reproduce the legacy 16-plane banding exactly at this size.
    df = _vecs(spark)
    adaptive = {
        (r["id_a"], r["id_b"])
        for r in sim.cosine_neardup_pairs(df, threshold=0.8, dim=16).collect()
    }
    fixed = {
        (r["id_a"], r["id_b"])
        for r in sim.cosine_neardup_pairs(
            df, threshold=0.8, dim=16, n_planes=16
        ).collect()
    }
    assert adaptive == fixed


def test_pandas_projection_bits_match_expression_path(spark):
    import pandas as pd
    from pyspark.sql import functions as F

    from yelp_data_pipeline_spark.functions.vectors import dot

    df = _vecs(spark)
    n_planes, dim = 16, 16
    planes = sim.hyperplanes(n_planes, dim)
    expr_bits = df.select(
        "vec_id",
        *[
            (dot(F.col("embedding"), F.array(*[F.lit(x) for x in planes[p]])) > 0)
            .cast("int")
            .alias(f"bit{p}")
            for p in range(n_planes)
        ],
    ).collect()
    expected = {
        r["vec_id"]: [r[f"bit{p}"] for p in range(n_planes)] for r in expr_bits
    }
    arrow = sim.signlsh_bits_pandas(df, n_planes, dim)
    got = {r["vec_id"]: list(r["sbits"]) for r in arrow.collect()}
    assert got == expected


def test_pandas_projection_pairs_match_jvm_pairs(spark):
    df = _vecs(spark)
    jvm = {
        (r["id_a"], r["id_b"], r["score"])
        for r in sim.cosine_neardup_pairs(df, threshold=0.8, dim=16).collect()
    }
    arrow = {
        (r["id_a"], r["id_b"], r["score"])
        for r in sim.cosine_neardup_pairs(
            df, threshold=0.8, dim=16, use_pandas_projection=True
        ).collect()
    }
    assert arrow == jvm


def test_ivf_hierarchical_branch_engages_and_agrees(spark):
    # k_cells=4 -> coarse grid ceil(sqrt(4))=2 cells; the default
    # coarse_probes=2 covers BOTH, so two-hop routing must reproduce
    # flat routing exactly and the pair sets must be identical.
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    flat = {
        (r["id_a"], r["id_b"])
        for r in sim.neardup_pairs_ivf(
            emb, threshold=0.42, k_cells=4, hierarchical_from=10**9
        ).collect()
    }
    hier = {
        (r["id_a"], r["id_b"])
        for r in sim.neardup_pairs_ivf(
            emb, threshold=0.42, k_cells=4, hierarchical_from=1
        ).collect()
    }
    assert hier == flat and len(flat) > 0


def test_kmeans_guard_rejects_sparse_ids(spark):
    import pytest
    from pyspark.sql import functions as F

    df = _vecs(spark).withColumn("vec_id", F.col("vec_id") + 100)
    with pytest.raises(ValueError, match="dense integers"):
        sim.kmeans_centroids(df, k=4, iters=1)


def test_l2_normalize_quantized_units(spark):
    from yelp_data_pipeline_spark.operators.similarity import l2_normalize_embeddings

    df = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, [0.0, 0.0]), (3, [1.0, 0.0])],
        "vec_id long, embedding array<float>",
    )
    rows = {r["vec_id"]: r for r in l2_normalize_embeddings(df).collect()}
    assert rows[1]["norm"] == 5.0
    assert rows[1]["unit_q5"] == "60000,80000"
    assert rows[2]["norm"] is None and rows[2]["unit_q5"] is None
    assert rows[3]["unit_q5"] == "100000,0"


def test_ivf_batch_agrees_with_brute_at_full_probe(spark):
    """nprobe = ncells ⇒ the IVF arm scans everything, so recall@k
    must be exactly 1 for every query."""
    from yelp_data_pipeline_spark.operators.similarity import (
        ann_recall_eval,
        train_centroids_by_label,
    )
    import random

    rng = random.Random(7)
    rows = [
        (i, [rng.uniform(-1, 1) for _ in range(8)], i % 3) for i in range(60)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    cents = train_centroids_by_label(emb, dim=8)
    qs = emb.where("vec_id < 5").selectExpr("vec_id AS qid", "embedding AS qv")
    out = ann_recall_eval(
        emb.withColumnRenamed("label", "cell"), cents, qs, k=5, nprobe=3
    ).collect()
    assert len(out) == 5
    assert all(r["recall_at_5"] == 1.0 for r in out)

    # nprobe=1 prunes to ~1/3 of the corpus: recall can drop but the
    # metric must stay in [0, 1] and every query must still appear.
    part = ann_recall_eval(
        emb.withColumnRenamed("label", "cell"), cents, qs, k=5, nprobe=1
    ).collect()
    assert len(part) == 5
    assert all(0.0 <= r["recall_at_5"] <= 1.0 for r in part)


def test_embedding_norm_outliers_flags_extremes(spark):
    from yelp_data_pipeline_spark.operators.similarity import embedding_norm_outliers

    rows = [(i, [1.0, 0.0]) for i in range(20)] + [(99, [100.0, 0.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = embedding_norm_outliers(df, z_threshold=2.0).collect()
    assert [r["vec_id"] for r in out] == [99]
    assert out[0]["z"] > 2.0


def test_cosine_zero_vector_is_null_not_crash(spark):
    """A zero vector (failed encoder) must yield NULL cosine under an
    ANSI session — never a DIVIDE_BY_ZERO task failure that kills the
    whole index build."""
    import pyspark.sql.functions as F

    from yelp_data_pipeline_spark.functions.vectors import cosine
    from yelp_data_pipeline_spark.operators.similarity import cosine_topk

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame(
            [(0, [0.0] * 4), (1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
            "vec_id long, embedding array<float>",
        )
        c = {
            r["vec_id"]: r["c"]
            for r in df.select(
                "vec_id",
                cosine(
                    F.col("embedding"),
                    F.array(*[F.lit(v) for v in [1.0, 0.0, 0.0, 0.0]]),
                ).alias("c"),
            ).collect()
        }
        assert c[0] is None and c[1] == 1.0 and c[2] == 0.0
        # Ranking drops the zero vector instead of erroring.
        top = cosine_topk(df, [1.0, 0.0, 0.0, 0.0], k=3).collect()
        assert [r["vec_id"] for r in top][:2] == [1, 2]
        assert all(r["vec_id"] != 0 or r["score"] is None for r in top)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_embedding_top_pc_recovers_planted_direction(spark):
    """With a strongly dominant planted direction e1 the power
    iteration must converge to it (the regime the diagnostic hunts);
    lambda must approximate the planted variance and dominate the
    per-dim residue, and trace must equal the exact total variance."""
    import math
    import random

    from yelp_data_pipeline_spark.operators.similarity import (
        embedding_top_pc,
    )

    rng = random.Random(7)
    dim, n = 16, 300
    rows = []
    for _ in range(n):
        a = rng.gauss(0, 3.0)  # dominant: var 9 along e1
        vec = [a] + [rng.gauss(0, 0.1) for _ in range(dim - 1)]
        rows.append((vec,))
    df = spark.createDataFrame(rows, "embedding array<double>")
    got = {
        r["dim"]: r["loading"]
        for r in embedding_top_pc(df, "embedding", dim=dim, iters=8).collect()
    }
    lam, tr = got[0], got[-1]
    # e1 loading ~1 (sign-fixed positive), others ~0.
    assert got[1] > 0.99
    assert all(abs(got[j]) < 0.1 for j in range(2, dim + 1))
    # lambda ~ planted variance, and most of the total variance.
    assert 6.0 < lam < 12.0
    assert lam / tr > 0.8
    # unit norm
    assert abs(sum(got[j] ** 2 for j in range(1, dim + 1)) - 1) < 1e-3
    assert math.isfinite(tr) and tr > lam
