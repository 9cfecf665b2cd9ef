"""Gap-fill, histogram, and data-quality operators — edge cases the
fixture can't reach (real gaps, NULL check inputs, duplicate keys)."""

import datetime

from pyspark.sql import functions as F

from yelp_data_pipeline_spark.operators import quality as dq
from yelp_data_pipeline_spark.operators import timeseries as ts_ops


def test_gapfill_inserts_zero_days(spark):
    df = spark.createDataFrame(
        [
            (datetime.datetime(2024, 1, 1, 10),),
            (datetime.datetime(2024, 1, 1, 11),),
            (datetime.datetime(2024, 1, 4, 9),),
        ],
        "ts timestamp",
    )
    out = {str(r["date"]): r["cnt"] for r in ts_ops.daily_counts_gapfilled(df, "ts").collect()}
    assert out == {
        "2024-01-01": 2,
        "2024-01-02": 0,  # the gap days exist with zero counts
        "2024-01-03": 0,
        "2024-01-04": 1,
    }


def test_histogram_negative_values_floor_correctly(spark):
    df = spark.createDataFrame([(-5.0,), (-15.0,), (5.0,), (25.0,)], "v double")
    out = {r["bin"]: r for r in ts_ops.value_histogram(df, "v", 10.0).collect()}
    assert out[-1]["cnt"] == 1 and out[-1]["bin_lo"] == -10.0  # floor, not trunc
    assert out[-2]["cnt"] == 1
    assert out[0]["cnt"] == 1 and out[2]["bin_lo"] == 20.0


def test_dq_null_predicate_counts_as_violation(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (2, None), (3, "bad")], "id long, status string"
    )
    row = dq.dq_summary(
        df, {"bad_status": ~F.col("status").isin("ok")}
    ).collect()[0]
    # 'bad' violates outright; NULL makes the predicate NULL → violation
    assert row["n_rows"] == 3 and row["bad_status"] == 2


def test_duplicate_key_count(spark):
    df = spark.createDataFrame(
        [(1,), (2,), (2,), (3,), (3,), (3,)], "k long"
    )
    row = dq.duplicate_key_count(df, ["k"]).collect()[0]
    assert row["n_keys"] == 3 and row["n_dup_keys"] == 2 and row["n_dup_rows"] == 5


def test_grouped_theil_sen_robust_to_outlier(spark):
    """A single wild outlier day must not drag the Theil-Sen slope
    (where OLS moves substantially), and a clean linear group must
    recover its exact slope."""
    from yelp_data_pipeline_spark.operators.timeseries import (
        grouped_ols_trend,
        grouped_theil_sen,
    )

    clean = [("g", x, 10.0 + 2.0 * x) for x in range(20)]
    dirty = [("h", x, 10.0 + 2.0 * x) for x in range(20)]
    dirty[10] = ("h", 10, 100000.0)  # one corrupted day
    df = spark.createDataFrame(clean + dirty, ["g", "x", "y"])

    ts = {
        r["g"]: r["ts_slope"]
        for r in grouped_theil_sen(df, "g", "x", "y", rounds=8).collect()
    }
    ols = {
        r["g"]: r["slope"]
        for r in grouped_ols_trend(df, "g", "x", "y").collect()
    }
    assert abs(ts["g"] - 2.0) < 1e-6          # clean group: exact
    assert abs(ts["h"] - 2.0) < 1.0           # robust: barely moves
    assert abs(ols["h"] - 2.0) > 50           # OLS: dragged far off
