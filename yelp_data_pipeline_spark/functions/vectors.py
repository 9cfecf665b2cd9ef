"""Vector math over ``array<float>`` embedding columns.

All expressions are Catalyst higher-order functions (zip_with /
aggregate) — vectors never leave the JVM, and the fold order is the
array order, so results are bit-reproducible (and match a sequential
oracle). Elements are cast to double *before* multiplication: the
inputs are float32 and float-domain arithmetic would diverge between
engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity. A ZERO vector (failed encoder, truncated
    row — exactly what embedding_norm_outliers screens for) has norm
    0, and under the driver's ANSI session even a double division by
    zero crashes — so the denominator is NULL-guarded: cosine against
    a zero vector is NULL (undefined angle), never an error, and
    ranking/threshold consumers drop it. cosine_sql mirrors the CASE."""
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d)


def cosine_sql(a: str, b: str, dim: int) -> str:
    """DuckDB twin with the same fold order (index-driven transform +
    list_sum over doubles)."""
    prod = (
        f"list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )
    na = (
        f"sqrt(list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> CAST({a}[i] AS DOUBLE) * CAST({a}[i] AS DOUBLE))))"
    )
    nb = (
        f"sqrt(list_sum(list_transform(generate_series(1, {dim}),"
        f" i -> CAST({b}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE))))"
    )
    return (
        f"(CASE WHEN ({na}) * ({nb}) > 0 "
        f"THEN ({prod}) / (({na}) * ({nb})) END)"
    )
