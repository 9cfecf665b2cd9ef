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


def star_join(fact: DataFrame, dims: list[tuple[DataFrame, object]]) -> DataFrame:
    """Chain fact ⋈ dim1 ⋈ dim2 ⋈ ... with every dim broadcast — the
    dashboard's fact_review ⋈ bridge ⋈ dim pattern (SURVEY.md §2.4 A4).
    One pass over the fact, zero fact-side shuffles."""
    out = fact
    for dim, on in dims:
        out = out.join(F.broadcast(dim), on)
    return out
