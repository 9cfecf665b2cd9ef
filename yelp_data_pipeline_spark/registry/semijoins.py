"""SURVEY §2.3 — semi / anti joins.

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import F, _q, _t, joins  # noqa: F401

# --------------------------------------------------------------------------
# §2.3 — semi / anti joins
# --------------------------------------------------------------------------

_URGENT_95 = "o_orderpriority = '1-URGENT' AND year(o_orderdate) = 1995"


@_q(
    "customers_with_urgent_orders",
    f"""
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey AND {_URGENT_95})
""",
    doc="Semi join (EXISTS) — SURVEY §2.3 completeness row.",
)
def q_customers_with_urgent_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.year("o_orderdate") == 1995)
    )
    return joins.semi_join(c, o, c["c_custkey"] == o["o_custkey"])


@_q(
    "customers_without_urgent_orders",
    f"""
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND {_URGENT_95})
""",
    doc="Anti join (NOT EXISTS) — SURVEY §2.3 completeness row.",
)
def q_customers_without_urgent_orders(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderpriority") == "1-URGENT") & (F.year("o_orderdate") == 1995)
    )
    return joins.anti_join(c, o, c["c_custkey"] == o["o_custkey"])


