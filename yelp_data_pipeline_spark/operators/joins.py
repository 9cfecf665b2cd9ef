"""Join operators (SURVEY.md §2.3).

The reference's joins are all equi-joins against tiny dimensions
(silver_to_gold_on_minio.py:79-84, 93, 116); strategy was left to
Catalyst. Here dims get explicit broadcast hints (AQE still demotes if
an estimate is wrong), and the semi/anti variants the reference lacks
are exposed for API completeness (SURVEY.md §2.3 last row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_broadcast_dim(
    fact: DataFrame, dim: DataFrame, on, how: str = "inner"
) -> DataFrame:
    """J1/J2 — fact ⋈ small dim. Broadcast-hash join: the dim ships to
    every executor once; the fact side never shuffles."""
    return fact.join(F.broadcast(dim), on, how)


def semi_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """EXISTS semantics — returns left rows with ≥1 match, left columns
    only. Spark plans a broadcast/shuffled hash semi-join (no row
    multiplication, no payload from the right side)."""
    return df.join(other, on, "left_semi")


def anti_join(df: DataFrame, other: DataFrame, on) -> DataFrame:
    """NOT EXISTS semantics."""
    return df.join(other, on, "left_anti")


def star_join(fact: DataFrame, dims: list[tuple]) -> DataFrame:
    """Chain fact ⋈ dim1 ⋈ dim2 ⋈ ... — the dashboard's fact_review ⋈
    bridge ⋈ dim pattern (SURVEY.md §2.4 A4).

    Each dims entry is ``(dim, on)`` or ``(dim, on, broadcast)``.
    Broadcast defaults to True — right for fixed-cardinality dims
    (region, nation, dim_time) — but MUST be False for dims that scale
    with the data (e.g. customer): a forced broadcast hint bypasses
    AQE's demotion and OOMs at large SF. Un-hinted joins are left to
    Catalyst/AQE, which still picks broadcast-hash when the runtime
    size is small.
    """
    out = fact
    for entry in dims:
        dim, on, bcast = entry if len(entry) == 3 else (*entry, True)
        out = out.join(F.broadcast(dim) if bcast else dim, on)
    return out
