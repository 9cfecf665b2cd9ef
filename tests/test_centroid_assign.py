"""Nearest-centroid classification semantics."""

import pytest

from yelp_data_pipeline_spark.operators.similarity import classify_to_centroids


def test_assigns_nearest_and_breaks_ties_by_label(spark):
    vectors = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),   # exactly centroid a
            (2, [0.0, 1.0]),   # exactly centroid b
            (3, [1.0, 1.0]),   # equidistant -> tie broken by max label
        ],
        "vec_id long, embedding array<double>",
    )
    cents = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "cell string, centroid array<double>",
    )
    got = {r["vec_id"]: r for r in classify_to_centroids(vectors, cents).collect()}
    assert got[1]["label"] == "a" and got[1]["score"] == pytest.approx(1.0)
    assert got[2]["label"] == "b"
    assert got[3]["label"] == "b"  # tie -> lexicographically max label
    assert got[3]["score"] == pytest.approx(0.707107, abs=1e-6)
    assert len(got) == 3  # exactly one assignment per vector
