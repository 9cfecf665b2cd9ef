"""SURVEY §2.4 A4 / §2.6 O3 — dashboard analytics.

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import F, _q, _t, agg, joins  # noqa: F401

# --------------------------------------------------------------------------
# §2.4 A4 / §2.6 O3 — dashboard analytics (flagship first)
# --------------------------------------------------------------------------


@_q(
    "top_regions_by_orders",
    """
SELECT r_name, count(*) AS order_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY order_cnt DESC, r_name
LIMIT 10
""",
    doc="Flagship: Top Regions by Check-ins shape (dashboard A4/O3) — "
    "fact ⋈ broadcast dim chain → groupBy → top-k.",
)
def q_top_regions_by_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    # customer scales with SF — no broadcast hint (AQE decides);
    # nation/region are fixed-cardinality → explicit broadcast.
    star = joins.star_join(
        o,
        [
            (c, o["o_custkey"] == c["c_custkey"], False),
            (n, c["c_nationkey"] == n["n_nationkey"], True),
            (r, n["n_regionkey"] == r["r_regionkey"], True),
        ],
    )
    counts = agg.group_count(star, ["r_name"], alias="order_cnt")
    return agg.top_k(counts, "order_cnt", 10, tiebreak=["r_name"])


@_q(
    "weekday_activity",
    """
SELECT strftime(ts, '%a') AS weekday, count(*) AS cnt
FROM events GROUP BY 1
""",
    doc="Reviews-per-weekday dashboard panel (A4) on events.",
)
def q_weekday_activity(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return agg.group_count(
        e.select(F.date_format("ts", "E").alias("weekday")), ["weekday"]
    )


@_q(
    "top_urgent_customers",
    """
SELECT c_custkey, c_name, count(*) AS urgent_cnt
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY c_custkey, c_name
ORDER BY urgent_cnt DESC, c_custkey
LIMIT 10
""",
    doc="Top-10 Businesses by 5-Star Reviews shape (A4/O3): filter → "
    "join → groupBy → deterministic top-k.",
)
def q_top_urgent_customers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # customer grows with SF — plain equi-join, AQE picks the strategy
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    counts = agg.group_count(j, ["c_custkey", "c_name"], alias="urgent_cnt")
    return agg.top_k(counts, "urgent_cnt", 10, tiebreak=["c_custkey"])


@_q(
    "total_counts",
    """
SELECT (SELECT count(*) FROM orders)   AS total_orders,
       (SELECT count(*) FROM events)   AS total_events,
       (SELECT count(*) FROM customer) AS total_customers
""",
    doc="Dashboard headline tiles (total reviews / check-ins / businesses).",
)
def q_total_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("total_orders"))
    e = _t(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("total_events"))
    c = _t(spark, sf_dir, "customer").agg(F.count(F.lit(1)).alias("total_customers"))
    return o.crossJoin(e).crossJoin(c)


