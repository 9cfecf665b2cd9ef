"""Deterministic, engine-portable hashing.

Spark's ``xxhash64``/``hash`` are JVM-specific; results can't be
reproduced by other engines (or audited offline). For operators whose
output *is* a hash (fingerprints, MinHash signatures, SimHash), we
derive a 60-bit integer from md5 — identical in any engine with md5 +
hex parsing, so the DuckDB oracle can replay it exactly:

    spark:  conv(substring(md5(s), 1, 15), 16, 10)::long
    duckdb: CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)

15 hex digits = 60 bits, always inside a signed 64-bit range. md5 is
used as a mixer, not for security. For pure-Spark internal hashing
(shuffle keys, salting) prefer xxhash64 — it's ~5× cheaper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60
HEX_DIGITS = 15  # 60 bits


def md5_long(col: Column, seed: int | str | None = None) -> Column:
    """60-bit integer hash of a string column, optionally seeded.
    Seeding prepends ``"{seed}:"`` so seeds define independent hash
    families (MinHash needs k of them)."""
    c = F.concat(F.lit(f"{seed}:"), col) if seed is not None else col
    return F.conv(F.substring(F.md5(c), 1, HEX_DIGITS), 16, 10).cast("long")


def md5_long_sql(expr: str, seed: int | str | None = None) -> str:
    """The DuckDB-SQL twin of :func:`md5_long` (used by query oracles)."""
    e = f"concat('{seed}:', {expr})" if seed is not None else expr
    return f"CAST('0x' || substr(md5({e}), 1, {HEX_DIGITS}) AS BIGINT)"


# Double-hashing family (Kirsch-Mitzenmacher): one md5 yields two
# independent components — h1 from hex digits 1-15 (60 bits), h2 from
# digits 16-28 (52 bits) — and member i is h1 + i*h2. For i ≤ 15,
# h1 + i*h2 < 2^60 + 2^56 < 2^63: no overflow in either engine, so the
# DuckDB oracle replays it with plain BIGINT arithmetic. One md5 per
# input replaces one md5 per (input, seed).
H2_OFFSET = HEX_DIGITS + 1
H2_DIGITS = 13  # 52 bits


def md5_pair(hex_col: Column) -> tuple[Column, Column]:
    """(h1, h2) double-hashing components from an md5 hex column."""
    h1 = F.conv(F.substring(hex_col, 1, HEX_DIGITS), 16, 10).cast("long")
    h2 = F.conv(F.substring(hex_col, H2_OFFSET, H2_DIGITS), 16, 10).cast("long")
    return h1, h2


def md5_family_sql(expr: str, i: int) -> str:
    """DuckDB twin of ``h1 + i*h2`` over ``md5(expr)``."""
    h1 = f"CAST('0x' || substr(md5({expr}), 1, {HEX_DIGITS}) AS BIGINT)"
    h2 = f"CAST('0x' || substr(md5({expr}), {H2_OFFSET}, {H2_DIGITS}) AS BIGINT)"
    return f"({h1} + {i} * {h2})"
