"""Deterministic sampling operators (north-star extension).

Training-data curation needs *reproducible* samples: `df.sample()` is
seed-and-partitioning dependent (a repartition changes the sample), so
pipelines that must be re-runnable key the sample on a content hash
instead — every engine, every partitioning, every rerun selects the
same rows. The md5-derived bucket is uniform, and the operators stay
pure Catalyst (map-side, zero shuffle, pushdown-friendly).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import md5_long

# Hash buckets per key. 10_000 gives 0.01% rate granularity.
BUCKETS = 10_000


def hash_bucket(col, salt: str = "") -> F.Column:
    """Uniform bucket in [0, BUCKETS) keyed on md5(salt|key) — the
    deterministic stand-in for rand(). Changing ``salt`` draws an
    independent sample."""
    keyed = F.concat_ws("|", F.lit(salt), col.cast("string"))
    return F.pmod(md5_long(keyed), F.lit(BUCKETS)).cast("int")


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Keep ~``fraction`` of rows, chosen by content hash of
    ``key_col``. Deterministic across reruns/engines/partitionings."""
    return df.filter(hash_bucket(F.col(key_col), salt) < int(fraction * BUCKETS))


def stratified_hash_sample(
    df: DataFrame,
    key_col: str,
    stratum_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    salt: str = "",
) -> DataFrame:
    """Per-stratum sampling rates (e.g. downsample dominant languages,
    keep all of rare ones) — the standard corpus-rebalancing move.
    Rows in strata absent from ``fractions`` get ``default_fraction``."""
    threshold = F.lit(int(default_fraction * BUCKETS))
    for value, frac in sorted(fractions.items()):
        threshold = (
            F.when(F.col(stratum_col) == value, F.lit(int(frac * BUCKETS)))
            .otherwise(threshold)
        )
    return df.filter(hash_bucket(F.col(key_col), salt) < threshold)
