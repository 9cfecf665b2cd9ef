"""SURVEY §2.3 J2-J3 + §2.4 A1 — fact builders.

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import DIM_TIME_CTE, F, _dim_time, _q, _t, facts  # noqa: F401

# --------------------------------------------------------------------------
# §2.3 J2-J3 + §2.4 A1 — fact builders
# --------------------------------------------------------------------------


@_q(
    "fact_orders",
    f"""
WITH {DIM_TIME_CTE}
SELECT o_orderkey, o_custkey, date_id, year, month, o_totalprice
FROM orders LEFT JOIN dim_time ON CAST(o_orderdate AS DATE) = dim_time.date
""",
    doc="J2 — fact_review shape (S2G:87-105): measures ⟕ broadcast dim_time.",
)
def q_fact_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    f = facts.attach_date_dim(
        o,
        _dim_time(spark, sf_dir),
        F.to_date("o_orderdate"),
        dim_cols=("date_id", "year", "month"),
    )
    return f.select("o_orderkey", "o_custkey", "date_id", "year", "month", "o_totalprice")


@_q(
    "fact_daily_events",
    f"""
WITH {DIM_TIME_CTE},
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS event_cnt
  FROM events GROUP BY 1, 2
)
SELECT user_id, date_id, year, month, event_cnt
FROM daily LEFT JOIN dim_time USING (date)
""",
    doc="A1+J3 — fact_checkin shape (S2G:106-124): per-key daily counts "
    "⟕ dim_time.",
)
def q_fact_daily_events(spark, sf_dir):
    daily = facts.daily_counts(
        _t(spark, sf_dir, "events"), ["user_id"], "ts", count_alias="event_cnt"
    )
    f = facts.attach_date_dim(
        daily,
        _dim_time(spark, sf_dir),
        F.col("date"),
        dim_cols=("date_id", "year", "month"),
    )
    return f.select("user_id", "date_id", "year", "month", "event_cnt")


