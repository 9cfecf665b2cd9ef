"""Backfill orchestration (pipelines.backfill) — the reference DAG's
catchup/max_active_runs/retry semantics as a driver loop
(mnt/airflow/dags/yelp_pipeline.py:10-21), pinned by the two
properties Airflow retries rely on: rerun idempotence (month M twice
== once) and backfill == union of single-month runs."""

import json
import os

import pyspark.sql.functions as F
import pytest

from yelp_data_pipeline_spark import pipelines


def _w(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


@pytest.fixture(scope="module")
def bronze(tmp_path_factory):
    """Own bronze tree (test_pipelines' fixture mutates its bronze
    mid-module for the upsert test — never share it)."""
    root = str(tmp_path_factory.mktemp("bronze_bf"))
    _w(f"{root}/business/b.json", [
        {"business_id": "b1", "name": "Cafe", "city": "PHL", "state": "PA",
         "postal_code": "1", "latitude": 1.0, "longitude": 2.0, "is_open": 1,
         "review_count": 5, "stars": 4.0, "categories": "Food, Cafes",
         "hours": {"Monday": "9:0-17:0"},
         "attributes": {"WiFi": "u'free'"}},
        {"business_id": "b2", "name": "Bar", "city": "NYC", "state": "NY",
         "postal_code": "2", "latitude": 3.0, "longitude": 4.0, "is_open": 0,
         "review_count": 2, "stars": 3.0, "categories": "Bars",
         "hours": {"Monday": None},
         "attributes": {"WiFi": "none"}},
    ])
    _w(f"{root}/user/u.json", [
        {"user_id": "u1", "name": "A", "yelping_since": "2019-01-01 00:00:00",
         "review_count": 3, "average_stars": 4.5, "useful": 1, "funny": 0,
         "cool": 2, "fans": 1, "elite": "2019,2020", "friends": "u2, u3"},
    ])
    _w(f"{root}/checkin/c.json", [
        {"business_id": "b1",
         "date": "2021-01-05 10:00:00, 2021-02-01 09:00:00, 2021-03-02 08:00:00"},
    ])
    for y, m, rid in [(2021, 1, "r1"), (2021, 2, "r2"), (2021, 3, "r3")]:
        _w(f"{root}/review/year={y}/month={m}/r.json", [
            {"review_id": rid, "user_id": "u1", "business_id": "b1",
             "stars": 5, "useful": 1, "funny": 0, "cool": 0,
             "text": "great", "date": f"{y}-{m:02d}-05 12:00:00"}])
        _w(f"{root}/tip/year={y}/month={m}/t.json", [
            {"user_id": "u1", "business_id": "b1", "text": "tip",
             "compliment_count": 0, "date": f"{y}-{m:02d}-02 09:00:00"}])
    return root


def _table_state(spark, root):
    """{table: sorted row tuples} for every parquet table under root."""
    out = {}
    for name in sorted(os.listdir(root)):
        df = spark.read.parquet(f"{root}/{name}")
        cols = sorted(df.columns)
        out[name] = sorted(
            tuple(str(r[c]) for c in cols) for r in df.collect()
        )
    return out


def test_month_range():
    assert pipelines.month_range((2021, 11), (2022, 2)) == [
        (2021, 11), (2021, 12), (2022, 1), (2022, 2),
    ]
    assert pipelines.month_range((2021, 5), (2021, 5)) == [(2021, 5)]
    with pytest.raises(ValueError):
        pipelines.month_range((2022, 1), (2021, 12))


def test_backfill_runs_all_months_in_order(spark, bronze, tmp_path):
    silver, gold = str(tmp_path / "silver"), str(tmp_path / "gold")
    summary = pipelines.backfill(
        spark, bronze, silver, gold, (2021, 1), (2021, 3)
    )
    # catchup=True: every month, oldest first; b2s >> s2g per month.
    assert [(s["year"], s["month"], s["task"]) for s in summary] == [
        (2021, 1, "bronze_to_silver"), (2021, 1, "silver_to_gold"),
        (2021, 2, "bronze_to_silver"), (2021, 2, "silver_to_gold"),
        (2021, 3, "bronze_to_silver"), (2021, 3, "silver_to_gold"),
    ]
    r = spark.read.parquet(f"{silver}/reviews")
    months = {
        (row["year"], row["month"])
        for row in r.select("year", "month").distinct().collect()
    }
    assert months == {(2021, 1), (2021, 2), (2021, 3)}
    assert spark.read.parquet(f"{gold}/fact_review").count() == 3


def test_backfill_equals_union_of_single_month_runs(spark, bronze, tmp_path):
    s_bf, g_bf = str(tmp_path / "s_bf"), str(tmp_path / "g_bf")
    pipelines.backfill(spark, bronze, s_bf, g_bf, (2021, 1), (2021, 2))

    s_1x, g_1x = str(tmp_path / "s_1x"), str(tmp_path / "g_1x")
    for m in (1, 2):
        pipelines.bronze_to_silver(spark, bronze, s_1x, 2021, m)
        pipelines.silver_to_gold(spark, s_1x, g_1x, 2021, m)

    assert _table_state(spark, s_bf) == _table_state(spark, s_1x)
    assert _table_state(spark, g_bf) == _table_state(spark, g_1x)


def test_backfill_rerun_idempotent(spark, bronze, tmp_path):
    """Running month M twice == running it once — the property that
    makes the DAG's retries (and manual re-runs) safe."""
    silver, gold = str(tmp_path / "silver"), str(tmp_path / "gold")
    pipelines.backfill(spark, bronze, silver, gold, (2021, 1), (2021, 2))
    once = (_table_state(spark, silver), _table_state(spark, gold))
    # Replay month 2 (the Airflow clear-and-rerun idiom).
    pipelines.backfill(spark, bronze, silver, gold, (2021, 2), (2021, 2))
    assert (_table_state(spark, silver), _table_state(spark, gold)) == once


def test_backfill_retries_then_aborts(spark, bronze, tmp_path):
    """First attempt of a task fails → retried (retries=1) and the
    backfill completes; a task failing beyond retries aborts the
    backfill WITHOUT running later months."""
    silver, gold = str(tmp_path / "silver"), str(tmp_path / "gold")
    calls = {"n": 0}

    def flaky_b2s(spark_, src, dst, y, m):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return pipelines.bronze_to_silver(spark_, src, dst, y, m)

    summary = pipelines.backfill(
        spark, bronze, silver, gold, (2021, 1), (2021, 1),
        retries=1, _b2s=flaky_b2s,
    )
    assert summary[0]["attempts"] == 2

    def always_fails(spark_, src, dst, y, m):
        raise RuntimeError("permanent")

    g2 = str(tmp_path / "gold2")
    with pytest.raises(RuntimeError, match="permanent"):
        pipelines.backfill(
            spark, bronze, silver, g2, (2021, 1), (2021, 2),
            retries=1, _s2g=always_fails,
        )
    assert not os.path.exists(g2)  # month 2 never started downstream
