"""RANGE-frame rolling average: gaps must shrink the window."""

import datetime as dt

import pytest

from yelp_data_pipeline_spark.operators.windows import rolling_range_avg


def test_rolling_range_avg_gap_semantics(spark):
    d = dt.date
    rows = [
        ("a", d(2024, 1, 1), 10),
        ("a", d(2024, 1, 2), 20),
        # 10-day gap: the next frame must NOT include the rows above
        ("a", d(2024, 1, 12), 30),
        ("b", d(2024, 1, 1), 100),  # other partition untouched
    ]
    df = spark.createDataFrame(rows, "grp string, date date, cnt long")
    out = {
        (r["grp"], str(r["date"])): r["avg7"]
        for r in rolling_range_avg(df, ["grp"], "date", "cnt", days=7, alias="avg7").collect()
    }
    assert out[("a", "2024-01-01")] == pytest.approx(10.0)
    assert out[("a", "2024-01-02")] == pytest.approx(15.0)
    assert out[("a", "2024-01-12")] == pytest.approx(30.0)  # gap excluded
    assert out[("b", "2024-01-01")] == pytest.approx(100.0)
