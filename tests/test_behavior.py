"""Behavior-analytics operator semantics on tiny in-memory frames.

The oracle sweep proves cross-engine agreement on fixture data; these
pin the *edge* semantics both engines could get identically wrong:
funnel ordering, cohort week math, transition tiebreaks, quantization
round-trip error.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from yelp_data_pipeline_spark.operators import behavior as bh
from yelp_data_pipeline_spark.operators.similarity import quantize_embeddings


def _ts(s):
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 completes the funnel in order
        (1, _ts("2024-01-01 10:00:00"), 1, "view", 1.0),
        (2, _ts("2024-01-01 10:05:00"), 1, "click", 1.0),
        (3, _ts("2024-01-01 10:10:00"), 1, "purchase", 1.0),
        # u2 clicks BEFORE ever viewing -> must not count past step 1
        (4, _ts("2024-01-02 09:00:00"), 2, "click", 1.0),
        (5, _ts("2024-01-02 09:30:00"), 2, "view", 1.0),
        # u3 views only
        (6, _ts("2024-01-08 12:00:00"), 3, "view", 2.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_funnel_requires_timestamp_order(events):
    got = {
        r["step"]: r["users"]
        for r in bh.funnel_counts(events, ["view", "click", "purchase"]).collect()
    }
    # u2's click precedes their view, so only u1 advances past step 1
    assert got == {"view": 3, "click": 1, "purchase": 1}


def test_funnel_same_instant_counts(spark):
    # step-2 event at exactly the step-1 entry time is reached (>=)
    t = _ts("2024-01-01 00:00:00")
    df = spark.createDataFrame(
        [(1, t, 7, "view", 0.0), (2, t, 7, "click", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {r["step"]: r["users"] for r in bh.funnel_counts(df, ["view", "click"]).collect()}
    assert got == {"view": 1, "click": 1}


def test_cohort_retention_offsets(events):
    got = {
        (str(r["cohort_week"]), r["week_offset"]): r["users"]
        for r in bh.cohort_retention(events).collect()
    }
    # u1+u2 first seen week of 2024-01-01 (Mon); u3 the following week
    assert got == {
        ("2024-01-01", 0): 2,
        ("2024-01-08", 0): 1,
    }
    # a return visit 2 weeks later lands in offset 2
    more = events.union(
        events.sparkSession.createDataFrame(
            [(9, _ts("2024-01-17 08:00:00"), 1, "view", 1.0)],
            events.schema,
        )
    )
    got2 = {
        (str(r["cohort_week"]), r["week_offset"]): r["users"]
        for r in bh.cohort_retention(more).collect()
    }
    assert got2[("2024-01-01", 2)] == 1


def test_event_transitions_tiebreak(spark):
    # two events at the same ts: event_id orders them deterministically
    t = _ts("2024-01-01 00:00:00")
    df = spark.createDataFrame(
        [(1, t, 1, "a", 0.0), (2, t, 1, "b", 0.0), (3, t, 1, "c", 0.0)],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    got = {(r["from_type"], r["to_type"]): r["cnt"] for r in bh.event_transitions(df).collect()}
    assert got == {("a", "b"): 1, ("b", "c"): 1}


def test_decayed_score_halflife(spark):
    # one event now, one exactly a half-life ago -> 1.0 + 0.5
    df = spark.createDataFrame(
        [
            (1, _ts("2024-01-08 00:00:00"), 1, "view", 1.0),
            (2, _ts("2024-01-01 00:00:00"), 1, "view", 1.0),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double",
    )
    [row] = bh.decayed_user_score(df, halflife_days=7.0).collect()
    assert row["score"] == pytest.approx(1.5, abs=1e-6)


def test_quantize_roundtrip_and_zero_vector(spark):
    df = spark.createDataFrame(
        [(1, [0.5, -1.0, 0.25]), (2, [0.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    rows = {r["vec_id"]: r for r in quantize_embeddings(df).collect()}
    q1, s1 = rows[1]["qvec"], rows[1]["scale"]
    assert q1 == [64, -127, 32]  # round(x*127/max|x|)
    # dequantized error bounded by half a quantization step
    for orig, q in zip([0.5, -1.0, 0.25], q1):
        assert abs(q * s1 - orig) <= s1 / 2 + 1e-9
    assert rows[2]["qvec"] is None and rows[2]["scale"] is None


def test_funnel_releases_every_level_cache(events):
    sc = events.sparkSession.sparkContext
    before = sc._jsc.sc().getPersistentRDDs().size()
    bh.funnel_counts(events, ["view", "click", "purchase"]).collect()
    # Eager per-level counting unpersists each level as its successor
    # materializes — nothing may outlive the call.
    assert sc._jsc.sc().getPersistentRDDs().size() <= before
