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
