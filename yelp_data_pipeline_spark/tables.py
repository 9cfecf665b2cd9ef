"""Source layer: parquet scans of the synthetic star schema.

Mirrors the reference's scan operators (SURVEY.md §2.1 S1-S4) on the
driver fixtures: explicit-schema columnar scans with Catalyst pushdown.
The reference's Hive-style partition-path reads
(bronze_to_silver_on_minio.py:143-151) become partition-column
predicates here so pruning happens in the optimizer, not in path math.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import TABLES

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Fixture columns written as parquet TIMESTAMP(NANOS): Spark's reader has
# no nanos type, so (with spark.sql.legacy.parquet.nanosAsLong) they
# arrive as long and are converted to microsecond timestamps here —
# truncation matches DuckDB's own nanos→micros read.
TS_NANOS_COLS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Columnar scan of one table; column pruning / predicate pushdown
    are preserved because nothing is materialized here."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    for c in TS_NANOS_COLS.get(name, ()):
        if c in df.columns and dict(df.dtypes)[c] == "bigint":
            # integer div keeps exactness (float div loses sub-µs bits at 2^60)
            df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    # Fixture generations vary: TIMESTAMP(NANOS) (handled above) vs
    # naive TIMESTAMP(MICROS), which Spark 4 reads as TIMESTAMP_NTZ.
    # Normalize NTZ → session-zone timestamp (session is pinned UTC, so
    # wall-clock values are preserved bit-for-bit and match DuckDB's
    # naive read). Keeps unix_micros()/watermark operators valid.
    ntz_cols = [c for c, t in df.dtypes if t == "timestamp_ntz"]
    for c in ntz_cols:
        df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def read_json_source(spark: SparkSession, path: str, schema=None, partition_filter=None):
    """S1/S2 — Bronze JSON ingestion (bronze_to_silver_on_minio.py:
    141-151): line-delimited JSON, nested structs supported.

    Prefer an explicit ``schema``: inference costs a full extra pass
    over the data (the reference pays it on every monthly run). When
    ``path`` is a Hive-partitioned layout (``year=Y/month=M/…``) the
    partition dirs surface as typed columns; pass ``partition_filter``
    (a Column predicate on those) so pruning happens in the optimizer
    rather than via glob path arithmetic — the scan then lists only
    matching directories (the reference's S2/S4 path-math idiom breaks
    partition pruning and, on Delta 2.x, partial-path reads outright).
    """
    reader = spark.read if schema is None else spark.read.schema(schema)
    df = reader.json(path)
    if partition_filter is not None:
        df = df.filter(partition_filter)
    return df


def read_csv_source(
    spark: SparkSession,
    path: str,
    schema=None,
    header: bool = True,
    partition_filter=None,
):
    """CSV ingestion (source-format breadth beyond the reference's
    JSON/Delta): explicit ``schema`` strongly preferred — inference
    costs a full extra pass AND types everything it can't prove, and a
    malformed row under inference silently nulls columns. With a
    schema, Spark's CSV reader still pushes partition-column predicates
    (Hive layout) and prunes unread columns at parse time
    (``ReadSchema`` shrinks even though CSV is row-oriented — fields
    outside it are skipped, not converted).
    """
    reader = spark.read.option("header", str(header).lower())
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", "true")
    df = reader.csv(path)
    if partition_filter is not None:
        df = df.filter(partition_filter)
    return df


def load_tables(
    spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Register each table as a temp view so the SQL entry point
    (SURVEY.md §3 entry point 3 — Trino/Superset serving path) is
    answered by spark.sql over the same engine."""
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


def save_catalog_table(
    df: DataFrame, name: str, path: str | None = None, mode: str = "overwrite"
) -> None:
    """Register a gold output as a persistent ``spark_catalog`` TABLE
    (``saveAsTable``) — catalog-serving parity with the reference,
    which wires a Hive Metastore + Trino catalog for exactly this
    (mnt/hive-conf/hive-site.xml; trino catalog over the gold bucket)
    even though its jobs only ever write paths. Registered tables are
    queryable by name from ANY session on the catalog (spark.sql /
    thriftserver), carry their schema in the metastore, and survive
    view-less sessions — the serving tier a path-only layout lacks.

    ``path`` makes it an EXTERNAL table (data stays at the given
    location; DROP TABLE removes only the catalog entry) — the gold
    layout stays the single source of truth, exactly the
    metastore-over-bucket shape the reference runs."""
    writer = df.write.mode(mode)
    if path:
        writer = writer.option("path", path)
    writer.saveAsTable(name)
