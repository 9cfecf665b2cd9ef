"""Registry core: QuerySpec, the shared _REGISTRY list, the @_q decorator, _t table loader, and the shared Spark/oracle builders every family module uses.

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import md5_family_sql, md5_long_sql
from ..functions.vectors import cosine_sql
from ..operators import aggregates as agg
from ..operators import cleaning as cl
from ..operators import dedup as dd
from ..operators import dims, facts, graph, joins
from ..operators import quality as dq
from ..operators import sampling as smp
from ..operators import timeseries as ts_ops
from ..operators import multimodal as mm
from ..operators import similarity as sim
from ..operators import textops as tx
from ..operators import upsert as up
from ..operators import urls as ur
from ..operators import windows as win
from ..streaming import windows as sw
from ..tables import load_table


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]
    doc: str
    # Scale posture marker. None (default) = scale-safe as registered.
    # A non-None note marks a RECALL/PARITY BASELINE kept for
    # verification next to its scale-safe production twin — the note
    # names the twin to use at scale. Exported so registry consumers
    # can filter baselines out of production plans programmatically.
    scale_note: Optional[str] = None


_REGISTRY: list[QuerySpec] = []


def _q(
    name: str,
    oracle: Optional[str],
    doc: str = "",
    scale_note: Optional[str] = None,
):
    def wrap(fn):
        # A repeated name would silently SHADOW the earlier spec in
        # queries()/oracle_sql() (dict semantics: last wins) while the
        # earlier one still burned registry/bench slots — exactly the
        # round-8 incident where re-added TPC-H analogs masked the
        # originals. Fail loudly at import instead.
        assert name not in {s.name for s in _REGISTRY}, (
            f"duplicate registry name: {name}"
        )
        _REGISTRY.append(QuerySpec(name, fn, oracle, doc, scale_note))
        return fn

    return wrap


def _t(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)

# --------------------------------------------------------------------------
# Shared Spark builders
# --------------------------------------------------------------------------


def _dates_df(spark, sf_dir) -> DataFrame:
    """U1 — union(+distinct) of order dates and event dates (S2G:20-24)."""
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("date"))
    e = _t(spark, sf_dir, "events").select(F.to_date("ts").alias("date"))
    return o.union(e).distinct()


def _dim_time(spark, sf_dir) -> DataFrame:
    return dims.build_dim_time(_dates_df(spark, sf_dir))


# Shared oracle CTEs (DuckDB)
DATES_CTE = """dates AS (
  SELECT CAST(o_orderdate AS DATE) AS date FROM orders
  UNION
  SELECT CAST(ts AS DATE) FROM events
)"""

DIM_TIME_CTE = (
    DATES_CTE
    + """,
dim_time AS (
  SELECT CAST(row_number() OVER (ORDER BY date) AS INT) AS date_id,
         date,
         CAST(year(date) AS INT) AS year,
         CAST(month(date) AS INT) AS month,
         CAST(dayofmonth(date) AS INT) AS day,
         strftime(date, '%a') AS weekday,
         CAST(quarter(date) AS INT) AS quarter,
         strftime(date, '%a') IN ('Sat','Sun') AS is_weekend
  FROM dates
)"""
)


