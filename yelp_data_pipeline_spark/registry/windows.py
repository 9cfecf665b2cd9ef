"""SURVEY §2.5 — window functions (beyond-reference rows).

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import F, _q, _t, agg, win  # noqa: F401

# --------------------------------------------------------------------------
# §2.5 windows (beyond-reference rows)
# --------------------------------------------------------------------------


@_q(
    "top_order_per_customer",
    """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) = 1
""",
    doc="Partitioned row_number top-1-per-key — the scale-safe variant "
    "of the reference's global-window W1/W2.",
)
def q_top_order_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    top = win.top_n_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], n=1
    )
    return top.select("o_custkey", "o_orderkey", "o_totalprice")


@_q(
    "order_price_quartiles",
    """
SELECT o_orderkey, o_totalprice,
       CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
FROM orders
""",
    doc="ntile ranking window (SURVEY §2.5 completeness): global "
    "quartile assignment with a unique-key tiebreak.",
)
def q_order_price_quartiles(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_totalprice", F.ntile(4).over(w).alias("quartile")
    )


@_q(
    "event_lag_gaps",
    """
SELECT user_id, event_id, ts,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
""",
    doc="lag window (SURVEY §2.5 completeness): inter-event gap in µs.",
)
def q_event_lag_gaps(spark, sf_dir):
    e = _t(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    e = win.with_lag(e, ["user_id"], [F.col("ts"), F.col("event_id")], "us", "prev_us")
    return e.select(
        "user_id", "event_id", "ts", (F.col("us") - F.col("prev_us")).alias("gap_us")
    )


@_q(
    "running_spend_per_customer",
    """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
FROM orders
""",
    doc="Cumulative frame (rowsBetween) — running per-customer spend, "
    "decimal-exact.",
)
def q_running_spend_per_customer(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(agg.DECIMAL)).over(w).cast("double").alias(
            "running_spend"
        ),
    )


