"""Cleaning / schema-manipulation operators (SURVEY.md §2.9 M1-M9,
§2.8 scalar functions).

These re-express the reference's Bronze→Silver cleaning layer
(`mnt/airflow/scripts/bronze_to_silver_on_minio.py`, cited per function)
as generic DataFrame→DataFrame transforms. Differences from the
reference are deliberate scale fixes, noted inline:

- JSON-column detection/inference samples a *set* of rows in one
  distributed pass instead of one `limit(1).collect()` round-trip per
  column (reference anti-pattern O2/M3/M4, B2S:36-54).
- Everything stays in Catalyst expressions — no Python UDFs — so the
  whole layer compiles into WholeStageCodegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def flatten_schema(schema: StructType, prefix: str | None = None) -> list[str]:
    """M1 — recursive schema flattener (B2S:6-15).

    Depth-first walk of a (possibly nested) StructType returning dotted
    leaf paths, e.g. ``hours.Monday``, ``attributes.BusinessParking``.
    Pure driver-side metadata traversal; O(#fields), no data touched.
    """
    fields: list[str] = []
    for f in schema.fields:
        name = f"{prefix}.{f.name}" if prefix else f.name
        if isinstance(f.dataType, StructType):
            fields.extend(flatten_schema(f.dataType, name))
        else:
            fields.append(name)
    return fields


def flatten_structs(df: DataFrame, sep: str = "_", lowercase: bool = True) -> DataFrame:
    """Flatten all nested struct leaves to top-level columns.

    Column ``a.b`` becomes ``a_b`` (lowercased), matching the rename in
    the reference's clean_json_columns (B2S:17-34). Single projection —
    one Catalyst Project node, zero shuffles.
    """
    cols = []
    for path in flatten_schema(df.schema):
        out = path.replace(".", sep)
        if lowercase:
            out = out.lower()
        cols.append(F.col(f"`{'`.`'.join(path.split('.'))}`").alias(out))
    return df.select(*cols)


def clean_pyrepr_value(col: Column) -> Column:
    """M2 — stringified-Python-repr cleaner (B2S:17-34).

    Strips ``u'...'`` wrappers, normalizes ``True/False`` to JSON
    booleans, and maps ``"none"``/empty to NULL — the exact chain the
    reference applies to Yelp ``attributes.*`` values.
    """
    c = F.regexp_replace(col, r"^u'|^'|'$", "")
    c = F.regexp_replace(c, r"\bTrue\b", "true")
    c = F.regexp_replace(c, r"\bFalse\b", "false")
    c = F.regexp_replace(c, r"\bNone\b", "null")
    return F.when(F.lower(c) == "none", F.lit(None).cast("string")).when(
        c == "", F.lit(None).cast("string")
    ).otherwise(c)


def clean_pyrepr_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Apply M2 to many columns in one projection."""
    return df.withColumns({c: clean_pyrepr_value(F.col(c)) for c in cols})


def split_csv_to_array(
    df: DataFrame,
    col: str,
    out: str,
    pattern: str = r",\s*",
    empty_to_null: bool = True,
) -> DataFrame:
    """M8 — CSV-string → array with empty→NULL (B2S:87-106).

    The reference guards ``elite == ""``/``friends == ""`` before
    splitting so empty strings become NULL arrays, keeping ``size`` = 0
    semantics honest (B2S:89-105).
    """
    split_col = F.split(F.col(col), pattern)
    if empty_to_null:
        arr = F.when(
            F.col(col).isNull() | (F.trim(F.col(col)) == ""), F.lit(None)
        ).otherwise(split_col)
    else:
        arr = split_col
    return df.withColumn(out, arr)


def array_count(df: DataFrame, array_col: str, out: str) -> DataFrame:
    """A3 — array length as scalar (B2S:98-105): size(NULL) → 0 like the
    reference's when/otherwise default."""
    return df.withColumn(
        out,
        F.when(F.col(array_col).isNull(), F.lit(0)).otherwise(F.size(F.col(array_col))),
    )


def explode_csv(
    df: DataFrame,
    col: str,
    out: str,
    pattern: str = r",\s*",
    trim: bool = True,
    drop_empty: bool = True,
) -> DataFrame:
    """M7 / S2G categories exploder (B2S:78-86, S2G:66-70).

    comma-split → explode → trim → filter non-empty. Explode multiplies
    rows map-side (no shuffle); downstream groupBy/join decides the
    shuffle key.
    """
    e = F.explode(F.split(F.col(col), pattern)).alias(out)
    res = df.select("*", e)
    if trim:
        res = res.withColumn(out, F.trim(F.col(out)))
    if drop_empty:
        res = res.filter(F.col(out) != "")
    return res


def split_range_column(
    df: DataFrame, col: str, open_out: str, close_out: str, sep: str = "-"
) -> DataFrame:
    """M5 — hours splitter (B2S:56-62): ``"9:0-17:0"`` →
    (opening, closing) via split().getItem(0/1)."""
    parts = F.split(F.col(col), sep)
    return df.withColumn(open_out, parts.getItem(0)).withColumn(
        close_out, parts.getItem(1)
    )


def detect_json_string_columns(
    df: DataFrame, candidates: list[str], sample_rows: int | None = 256
) -> list[str]:
    """M3 — JSON-column detector (B2S:36-43), scale-fixed.

    The reference issues one ``filter(...).limit(1).collect()`` per
    candidate column (a driver round-trip each). Here a single
    aggregated pass computes, per column, whether any sampled non-null
    value looks like a JSON object. ``sample_rows=None`` probes the
    FULL relation (one combinable ANY-style aggregate — map-side
    partial, no limit), used to confirm a negative sampled verdict
    before callers commit to a "no JSON anywhere" posture.
    """
    if not candidates:
        return []
    probes = [
        F.max(
            F.when(
                F.col(c).isNotNull()
                & F.col(c).startswith("{")
                & F.col(c).endswith("}"),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias(c)
        for c in candidates
    ]
    scoped = df.select(candidates)
    if sample_rows is not None:
        scoped = scoped.limit(sample_rows * 16)
    row = scoped.agg(*probes).first()
    return [c for c in candidates if row[c] == 1]


def parse_json_columns(
    df: DataFrame, cols: list[str], sample_rows: int = 256
) -> DataFrame:
    """M4 — dynamic JSON parser (B2S:45-54), scale-fixed.

    The reference infers each column's struct schema from a *single*
    sampled row (fields missing from that row are silently dropped for
    every row). Here the schema is inferred over a sampled set using
    Spark's JSON reader (union of observed fields), then applied with
    one ``from_json`` per column — still zero Python UDFs.
    """
    out = df
    for c in cols:
        sample = [
            r[0]
            for r in df.select(c)
            .where(F.col(c).isNotNull() & F.col(c).startswith("{"))
            .limit(sample_rows)
            .collect()
        ]
        if not sample:
            out = out.withColumn(c, F.lit(None).cast("string"))
            continue
        inferred = out.sparkSession.read.json(
            out.sparkSession.sparkContext.parallelize(sample)
        ).schema
        out = out.withColumn(c, F.from_json(F.col(c), inferred))
    return out


def normalize_null_tokens(df: DataFrame, cols: list[str], tokens=("none", "null", "")) -> DataFrame:
    """P9 — when/otherwise null-normalization (B2S:30-33, 89-105)."""
    return df.withColumns(
        {
            c: F.when(F.lower(F.col(c)).isin(*tokens), F.lit(None)).otherwise(F.col(c))
            for c in cols
        }
    )


def process_business(
    df: DataFrame, hours_prefix: str = "hours_", attr_prefix: str = "attributes_"
) -> DataFrame:
    """M6 — composite business cleaner (B2S:64-76): the full
    Bronze→Silver path for the business entity, assembled from M1/M2/
    M3/M4/M5.

    Steps (reference order):
    1. ``is_open`` long → boolean (B2S:66);
    2. flatten nested structs to ``lower(a_b)`` top-level columns (M1);
    3. each ``hours_{day}`` range ``"9:0-17:0"`` → ``{day}_opening_time``
       / ``{day}_closing_time``, originals dropped (M5, B2S:56-62);
    4. Python-repr cleaning on every ``attributes_*`` column (M2);
    5. JSON-looking attribute columns detected (M3) and parsed to
       structs (M4).

    Dead-code parity (B2S:74-75): the reference then re-filters
    flattened paths with ``startswith("attributes.")`` — but post-rename
    columns start with ``attributes_``, so the filter matches nothing
    and the parsed attribute structs REMAIN NESTED in Silver. Mirrored
    here by *not* re-flattening after the parse.
    """
    out = df
    if "is_open" in out.columns:
        out = out.withColumn("is_open", F.col("is_open").cast("boolean"))
    out = flatten_structs(out)
    hours_cols = [c for c in out.columns if c.startswith(hours_prefix)]
    for c in hours_cols:
        day = c[len(hours_prefix):]
        out = split_range_column(out, c, f"{day}_opening_time", f"{day}_closing_time")
    out = out.drop(*hours_cols)
    attr_cols = [c for c in out.columns if c.startswith(attr_prefix)]
    if attr_cols:
        out = clean_pyrepr_columns(out, attr_cols)
        json_cols = detect_json_string_columns(out, attr_cols)
        out = parse_json_columns(out, json_cols)
    return out


def process_checkins(df: DataFrame, date_col: str = "date") -> DataFrame:
    """M7 — checkin exploder (B2S:78-86): comma-joined timestamp list →
    one row per check-in with timestamp + (year, month) partition
    columns; the raw list column is dropped."""
    out = df.withColumn("__arr", F.split(F.col(date_col), ","))
    out = out.drop(date_col).select("*", F.explode("__arr").alias(date_col)).drop("__arr")
    ts = F.to_timestamp(F.trim(F.col(date_col)))
    return (
        out.withColumn(date_col, ts)
        .withColumn("year", F.year(date_col))
        .withColumn("month", F.month(date_col))
    )


def process_users(
    df: DataFrame,
    elite_col: str = "elite",
    friends_col: str = "friends",
    since_col: str = "yelping_since",
) -> DataFrame:
    """M8 — user cleaner (B2S:87-106): comma-joined elite years and
    friend ids → arrays (empty string → NULL), counts via size with
    NULL→0, yelping_since → timestamp."""
    out = split_csv_to_array(df, elite_col, "elite_years", pattern=",")
    out = array_count(out, "elite_years", "elite_years_count")
    out = split_csv_to_array(out, friends_col, "friends_list", pattern=r",\s*")
    out = array_count(out, "friends_list", "friends_count")
    out = out.drop(elite_col, friends_col)
    return out.withColumn(since_col, F.to_timestamp(F.col(since_col)))


def add_event_date_parts(df: DataFrame, ts_col: str, ts_out: str | None = None) -> DataFrame:
    """M9 — review/tip dater (B2S:108-111): string/ts → timestamp plus
    year/month partition columns."""
    ts = F.to_timestamp(F.col(ts_col))
    out = df.withColumn(ts_out or ts_col, ts)
    return out.withColumn("year", F.year(ts)).withColumn("month", F.month(ts))
