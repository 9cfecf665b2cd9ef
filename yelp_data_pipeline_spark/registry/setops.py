"""SURVEY §2.7 — set operations.

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import F, _q, _t  # noqa: F401

# --------------------------------------------------------------------------
# §2.7 set operations
# --------------------------------------------------------------------------


@_q(
    "union_distinct_dates",
    """
SELECT CAST(o_orderdate AS DATE) AS date FROM orders
UNION
SELECT CAST(l_shipdate AS DATE) FROM lineitem
""",
    doc="U1 — union + distinct calendar (S2G:20-24).",
)
def q_union_distinct_dates(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("date"))
    l = _t(spark, sf_dir, "lineitem").select(F.to_date("l_shipdate").alias("date"))
    return o.union(l).distinct()


@_q(
    "dates_intersect",
    """
SELECT CAST(o_orderdate AS DATE) AS date FROM orders
INTERSECT
SELECT CAST(l_shipdate AS DATE) FROM lineitem
""",
    doc="Set op beyond reference (SURVEY §2.7): INTERSECT.",
)
def q_dates_intersect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("date"))
    l = _t(spark, sf_dir, "lineitem").select(F.to_date("l_shipdate").alias("date"))
    return o.intersect(l)


@_q(
    "dates_except",
    """
SELECT CAST(l_shipdate AS DATE) AS date FROM lineitem
EXCEPT
SELECT CAST(o_orderdate AS DATE) FROM orders
""",
    doc="Set op beyond reference (SURVEY §2.7): EXCEPT.",
)
def q_dates_except(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("date"))
    l = _t(spark, sf_dir, "lineitem").select(F.to_date("l_shipdate").alias("date"))
    return l.subtract(o)


