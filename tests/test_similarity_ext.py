

def test_jl_projection_shape_and_distortion(spark):
    """jl_project: out_dim components, linear (doubling the vector
    doubles the projection), zero maps to zero; jl_distortion_pairs:
    ratios exist, are deterministic across reruns, and sit within the
    JL epsilon envelope for this (n=64, k=16) configuration."""
    import math

    from yelp_data_pipeline_spark.operators.similarity import (
        jl_distortion_pairs,
        jl_project,
    )

    base = [float((i * 7) % 13 - 6) for i in range(64)]
    rows = [(1, base), (2, [2.0 * v for v in base]), (3, [0.0] * 64)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: r["projected"]
        for r in jl_project(df, "embedding", out_dim=16).collect()
    }
    assert all(len(v) == 16 for v in got.values())
    assert got[3] == [0.0] * 16
    for a, b in zip(got[1], got[2]):
        assert abs(b - 2.0 * a) < 1e-9  # linearity

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out1 = sorted(
        map(tuple, jl_distortion_pairs(emb, n_vecs=64).collect())
    )
    out2 = sorted(
        map(tuple, jl_distortion_pairs(emb, n_vecs=64).collect())
    )
    assert out1 == out2 and len(out1) == 32  # deterministic sample
    # JL envelope: eps = sqrt(8 ln n / k) is loose; assert the realized
    # ratios are sane (no collapse, no blowup) rather than the bound.
    eps = math.sqrt(8 * math.log(64) / 16)
    for row in out1:
        ratio = row[-1]
        if ratio is not None:
            assert (1 - eps) / 2 < ratio < (1 + eps) * 1.5, row


def test_hard_negatives_exclude_same_label(spark):
    """Mined negatives must all carry a different label than their
    anchor, rank by true cosine, and never include the anchor itself."""
    from yelp_data_pipeline_spark.operators.similarity import (
        hard_negatives_topk,
    )

    # 3 clusters along axes; same-label vectors are the most similar,
    # so a naive (label-blind) top-k would return them.
    rows = []
    for i in range(6):
        base = [0.0] * 64
        base[i % 3] = 1.0
        base[10 + i] = 0.1  # break exact ties deterministically
        rows.append((i, base, i % 3))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = hard_negatives_topk(df, n_anchors=3, k=2).collect()
    assert len(out) == 6  # 3 anchors x 2 negatives
    anchors = {r["anchor_id"]: r["anchor_label"] for r in out}
    for r in out:
        assert r["neg_label"] != anchors[r["anchor_id"]]
        assert r["vec_id"] != r["anchor_id"]


def test_whitening_removes_top_component(spark):
    """On a corpus with a planted dominant direction, the whitened
    vectors must be (near-)orthogonal to the recovered top PC:
    sum_d w_d * u_d ~ 0 for every sampled vector."""
    from yelp_data_pipeline_spark.operators.similarity import (
        embedding_top_pc,
        whiten_all_but_top,
    )

    # dominant direction e0 + small per-vector noise on other dims
    rows = []
    for i in range(24):
        v = [0.0] * 64
        v[0] = 10.0 + (i % 5)          # strong shared component
        v[1 + (i % 7)] = 0.5 + 0.01 * i  # weak varying component
        rows.append((i, v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    u = {
        r["dim"]: r["loading"]
        for r in embedding_top_pc(df, "embedding", dim=64, iters=8).collect()
        if r["dim"] >= 1
    }
    w = whiten_all_but_top(df, "vec_id", "embedding", 64, 8, n_sample=4)
    by_vec = {}
    for r in w.collect():
        by_vec.setdefault(r["vec_id"], {})[r["dim"]] = r["w"]
    assert len(by_vec) == 4
    for vid, comps in by_vec.items():
        assert len(comps) == 64
        resid = sum(comps[d] * u[d] for d in range(1, 65))
        assert abs(resid) < 1e-3, (vid, resid)
