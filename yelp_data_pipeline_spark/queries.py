"""Query registry: every operator from SURVEY.md §2 (plus the
north-star extensions) as a named (spark_fn, duckdb_oracle_sql) pair.

Exported through /root/repo/__spark_entry__.py. Contract:
- fn(spark, sf_dir) -> DataFrame
- oracle: ANSI SQL over the pre-registered DuckDB views (same parquet).
  ``None`` ⇒ not SQL-expressible; the driver records a rows-only check.

Cross-engine determinism rules used throughout (see operators/):
- aliases identical on both sides (driver sorts columns by name);
- int-ish scalars CAST to Spark's width in the oracle (Spark ``size``/
  ``year``/``row_number`` are INT where DuckDB yields BIGINT);
- float aggregates accumulate in DECIMAL then cast to DOUBLE;
- every top-k has a unique-key tiebreak so the selected *set* matches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.hashing import md5_family_sql, md5_long_sql
from .functions.vectors import cosine_sql
from .operators import aggregates as agg
from .operators import cleaning as cl
from .operators import dedup as dd
from .operators import dims, facts, graph, joins
from .operators import quality as dq
from .operators import sampling as smp
from .operators import timeseries as ts_ops
from .operators import multimodal as mm
from .operators import similarity as sim
from .operators import textops as tx
from .operators import upsert as up
from .operators import urls as ur
from .operators import windows as win
from .streaming import windows as sw
from .tables import load_table


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


# --------------------------------------------------------------------------
# §2.4 A4 / §2.6 O3 — dashboard analytics (flagship first)
# --------------------------------------------------------------------------


@_q(
    "top_regions_by_orders",
    """
SELECT r_name, count(*) AS order_cnt
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY r_name
ORDER BY order_cnt DESC, r_name
LIMIT 10
""",
    doc="Flagship: Top Regions by Check-ins shape (dashboard A4/O3) — "
    "fact ⋈ broadcast dim chain → groupBy → top-k.",
)
def q_top_regions_by_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_custkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region")
    # customer scales with SF — no broadcast hint (AQE decides);
    # nation/region are fixed-cardinality → explicit broadcast.
    star = joins.star_join(
        o,
        [
            (c, o["o_custkey"] == c["c_custkey"], False),
            (n, c["c_nationkey"] == n["n_nationkey"], True),
            (r, n["n_regionkey"] == r["r_regionkey"], True),
        ],
    )
    counts = agg.group_count(star, ["r_name"], alias="order_cnt")
    return agg.top_k(counts, "order_cnt", 10, tiebreak=["r_name"])


@_q(
    "weekday_activity",
    """
SELECT strftime(ts, '%a') AS weekday, count(*) AS cnt
FROM events GROUP BY 1
""",
    doc="Reviews-per-weekday dashboard panel (A4) on events.",
)
def q_weekday_activity(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return agg.group_count(
        e.select(F.date_format("ts", "E").alias("weekday")), ["weekday"]
    )


@_q(
    "top_urgent_customers",
    """
SELECT c_custkey, c_name, count(*) AS urgent_cnt
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE o_orderpriority = '1-URGENT'
GROUP BY c_custkey, c_name
ORDER BY urgent_cnt DESC, c_custkey
LIMIT 10
""",
    doc="Top-10 Businesses by 5-Star Reviews shape (A4/O3): filter → "
    "join → groupBy → deterministic top-k.",
)
def q_top_urgent_customers(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    # customer grows with SF — plain equi-join, AQE picks the strategy
    j = o.join(c, o["o_custkey"] == c["c_custkey"])
    counts = agg.group_count(j, ["c_custkey", "c_name"], alias="urgent_cnt")
    return agg.top_k(counts, "urgent_cnt", 10, tiebreak=["c_custkey"])


@_q(
    "total_counts",
    """
SELECT (SELECT count(*) FROM orders)   AS total_orders,
       (SELECT count(*) FROM events)   AS total_events,
       (SELECT count(*) FROM customer) AS total_customers
""",
    doc="Dashboard headline tiles (total reviews / check-ins / businesses).",
)
def q_total_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").agg(F.count(F.lit(1)).alias("total_orders"))
    e = _t(spark, sf_dir, "events").agg(F.count(F.lit(1)).alias("total_events"))
    c = _t(spark, sf_dir, "customer").agg(F.count(F.lit(1)).alias("total_customers"))
    return o.crossJoin(e).crossJoin(c)


# --------------------------------------------------------------------------
# §2.5 W1-W2, §1.1 — dimension builders
# --------------------------------------------------------------------------


@_q(
    "dim_time",
    f"WITH {DIM_TIME_CTE} SELECT * FROM dim_time",
    doc="W1/U1 — dim_time with row_number date_id (S2G:18-35) over "
    "union-distinct calendar.",
)
def q_dim_time(spark, sf_dir):
    return _dim_time(spark, sf_dir)


@_q(
    "dim_customer",
    """
SELECT c_custkey AS customer_id, c_name AS name, c_nationkey AS nation_id,
       c_acctbal AS acctbal, c_mktsegment AS mktsegment
FROM customer
""",
    doc="P1 — dim projection+rename (build_dim_business S2G:37-52 / "
    "dim_user schema.png gap).",
)
def q_dim_customer(spark, sf_dir):
    return dims.project_dim(
        _t(spark, sf_dir, "customer"),
        {
            "c_custkey": "customer_id",
            "c_name": "name",
            "c_nationkey": "nation_id",
            "c_acctbal": "acctbal",
            "c_mktsegment": "mktsegment",
        },
    )


@_q(
    "dict_encode_part_types",
    """
SELECT p_type AS value, CAST(row_number() OVER (ORDER BY p_type) AS INT) AS type_id
FROM (SELECT DISTINCT p_type FROM part)
""",
    doc="W2 — dictionary encoding over distinct values (S2G:72-78).",
)
def q_dict_encode_part_types(spark, sf_dir):
    enc = dims.dictionary_encode(_t(spark, sf_dir, "part"), "p_type", "type_id")
    return enc.select(F.col("p_type").alias("value"), "type_id")


@_q(
    "bridge_part_words",
    """
WITH pairs AS (
  SELECT DISTINCT p_partkey, w AS word
  FROM (SELECT p_partkey, trim(unnest(string_split(p_name, ' '))) AS w FROM part)
  WHERE w <> ''
),
dict AS (
  SELECT word, CAST(row_number() OVER (ORDER BY word) AS INT) AS word_id
  FROM (SELECT DISTINCT word FROM pairs)
)
SELECT p_partkey, word_id, word FROM pairs JOIN dict USING (word)
""",
    doc="Bridge build (S2G:54-85): split→explode→trim→filter→distinct "
    "pairs ⋈ dictionary-encoded names.",
)
def q_bridge_part_words(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_name")
    exploded = cl.explode_csv(p, "p_name", "word", pattern=" ")
    pairs = exploded.select("p_partkey", "word").distinct()
    dic = dims.dictionary_encode(pairs, "word", "word_id")
    return joins.join_broadcast_dim(pairs, dic, "word").select(
        "p_partkey", "word_id", "word"
    )


# --------------------------------------------------------------------------
# §2.3 J2-J3 + §2.4 A1 — fact builders
# --------------------------------------------------------------------------


@_q(
    "fact_orders",
    f"""
WITH {DIM_TIME_CTE}
SELECT o_orderkey, o_custkey, date_id, year, month, o_totalprice
FROM orders LEFT JOIN dim_time ON CAST(o_orderdate AS DATE) = dim_time.date
""",
    doc="J2 — fact_review shape (S2G:87-105): measures ⟕ broadcast dim_time.",
)
def q_fact_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    f = facts.attach_date_dim(
        o,
        _dim_time(spark, sf_dir),
        F.to_date("o_orderdate"),
        dim_cols=("date_id", "year", "month"),
    )
    return f.select("o_orderkey", "o_custkey", "date_id", "year", "month", "o_totalprice")


@_q(
    "fact_daily_events",
    f"""
WITH {DIM_TIME_CTE},
daily AS (
  SELECT user_id, CAST(ts AS DATE) AS date, count(*) AS event_cnt
  FROM events GROUP BY 1, 2
)
SELECT user_id, date_id, year, month, event_cnt
FROM daily LEFT JOIN dim_time USING (date)
""",
    doc="A1+J3 — fact_checkin shape (S2G:106-124): per-key daily counts "
    "⟕ dim_time.",
)
def q_fact_daily_events(spark, sf_dir):
    daily = facts.daily_counts(
        _t(spark, sf_dir, "events"), ["user_id"], "ts", count_alias="event_cnt"
    )
    f = facts.attach_date_dim(
        daily,
        _dim_time(spark, sf_dir),
        F.col("date"),
        dim_cols=("date_id", "year", "month"),
    )
    return f.select("user_id", "date_id", "year", "month", "event_cnt")


# --------------------------------------------------------------------------
# §2.7 set operations
# --------------------------------------------------------------------------


@_q(
    "union_distinct_dates",
    """
SELECT CAST(o_orderdate AS DATE) AS date FROM orders
UNION
SELECT CAST(l_shipdate AS DATE) FROM lineitem
""",
    doc="U1 — union + distinct calendar (S2G:20-24).",
)
def q_union_distinct_dates(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("date"))
    l = _t(spark, sf_dir, "lineitem").select(F.to_date("l_shipdate").alias("date"))
    return o.union(l).distinct()


@_q(
    "dates_intersect",
    """
SELECT CAST(o_orderdate AS DATE) AS date FROM orders
INTERSECT
SELECT CAST(l_shipdate AS DATE) FROM lineitem
""",
    doc="Set op beyond reference (SURVEY §2.7): INTERSECT.",
)
def q_dates_intersect(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("date"))
    l = _t(spark, sf_dir, "lineitem").select(F.to_date("l_shipdate").alias("date"))
    return o.intersect(l)


@_q(
    "dates_except",
    """
SELECT CAST(l_shipdate AS DATE) AS date FROM lineitem
EXCEPT
SELECT CAST(o_orderdate AS DATE) FROM orders
""",
    doc="Set op beyond reference (SURVEY §2.7): EXCEPT.",
)
def q_dates_except(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(F.to_date("o_orderdate").alias("date"))
    l = _t(spark, sf_dir, "lineitem").select(F.to_date("l_shipdate").alias("date"))
    return l.subtract(o)


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


# --------------------------------------------------------------------------
# §2.2 — filters / predicates / casts / conditionals
# --------------------------------------------------------------------------


@_q(
    "filtered_lineitems",
    """
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_returnflag
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_quantity < 25 AND l_returnflag = 'R'
""",
    doc="P4/P8 + pushdown demo — filters reach the parquet scan "
    "(PushedFilters), projection prunes to 5 columns.",
)
def q_filtered_lineitems(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    return l.filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
        & (F.col("l_quantity") < 25)
        & (F.col("l_returnflag") == "R")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_returnflag")


@_q(
    "lineitem_date_parts",
    """
SELECT l_orderkey, l_linenumber,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(month(l_shipdate) AS INT) AS ship_month,
       CAST(dayofmonth(l_shipdate) AS INT) AS ship_day,
       CAST(quarter(l_shipdate) AS INT) AS ship_quarter
FROM lineitem
WHERE year(l_shipdate) = 1998 AND month(l_shipdate) = 3
""",
    doc="P8/§2.8 date parts — filter on date components (reference "
    "missed partition pruning here, S2G:170-174; on partitioned layouts "
    "filter the partition columns instead).",
)
def q_lineitem_date_parts(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    d = F.col("l_shipdate")
    return l.filter((F.year(d) == 1998) & (F.month(d) == 3)).select(
        "l_orderkey",
        "l_linenumber",
        F.year(d).alias("ship_year"),
        F.month(d).alias("ship_month"),
        F.dayofmonth(d).alias("ship_day"),
        F.quarter(d).alias("ship_quarter"),
    )


@_q(
    "quantity_buckets",
    """
SELECT CASE WHEN l_quantity < 10 THEN 'low'
            WHEN l_quantity < 25 THEN 'mid'
            ELSE 'high' END AS bucket,
       count(*) AS cnt,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty
FROM lineitem GROUP BY 1
""",
    doc="P9 — when/otherwise conditional buckets (B2S:30-33) + exact sum.",
)
def q_quantity_buckets(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    bucket = (
        F.when(F.col("l_quantity") < 10, "low")
        .when(F.col("l_quantity") < 25, "mid")
        .otherwise("high")
    )
    return (
        l.select(bucket.alias("bucket"), "l_quantity")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cnt"), agg.exact_sum("l_quantity", "sum_qty"))
    )


@_q(
    "clean_pyrepr_attributes",
    """
WITH dirty AS (
  SELECT p_partkey,
         CASE WHEN p_size % 3 = 0 THEN 'None'
              WHEN p_size % 3 = 1 THEN concat('u''', p_brand, '''')
              ELSE p_brand END AS raw
  FROM part
),
stripped AS (
  SELECT p_partkey,
    regexp_replace(regexp_replace(regexp_replace(regexp_replace(
      raw, '^u''|^''|''$', '', 'g'),
      '\\bTrue\\b', 'true', 'g'),
      '\\bFalse\\b', 'false', 'g'),
      '\\bNone\\b', 'null', 'g') AS c
  FROM dirty
)
SELECT p_partkey,
       CASE WHEN lower(c) = 'none' THEN NULL
            WHEN c = '' THEN NULL ELSE c END AS cleaned
FROM stripped
""",
    doc="M2 — stringified-Python-repr cleaning chain (B2S:17-34) applied "
    "to synthesized dirty values.",
)
def q_clean_pyrepr_attributes(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    raw = (
        F.when(F.col("p_size") % 3 == 0, F.lit("None"))
        .when(F.col("p_size") % 3 == 1, F.concat(F.lit("u'"), F.col("p_brand"), F.lit("'")))
        .otherwise(F.col("p_brand"))
    )
    dirty = p.select("p_partkey", raw.alias("raw"))
    return dirty.select(
        "p_partkey", cl.clean_pyrepr_value(F.col("raw")).alias("cleaned")
    )


@_q(
    "split_hours_range",
    """
SELECT p_partkey,
       string_split(concat(CAST(p_size AS VARCHAR), ':0-', CAST(p_size + 8 AS VARCHAR), ':0'), '-')[1] AS opening_time,
       string_split(concat(CAST(p_size AS VARCHAR), ':0-', CAST(p_size + 8 AS VARCHAR), ':0'), '-')[2] AS closing_time
FROM part
""",
    doc="M5 — hours splitter (B2S:56-62): '9:0-17:0' → opening/closing.",
)
def q_split_hours_range(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    rng = F.concat(
        F.col("p_size").cast("string"),
        F.lit(":0-"),
        (F.col("p_size") + 8).cast("string"),
        F.lit(":0"),
    )
    df = p.select("p_partkey", rng.alias("rng"))
    return cl.split_range_column(df, "rng", "opening_time", "closing_time").select(
        "p_partkey", "opening_time", "closing_time"
    )


@_q(
    "json_extract_props",
    """
SELECT event_id,
       CAST(json_extract_string(NULLIF(props, ''), '$.k') AS INT) AS k
FROM events
""",
    doc="M4-adjacent — JSON string column → typed value (B2S:45-54; "
    "get_json_object, schema known).",
)
def q_json_extract_props(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.select(
        "event_id", F.get_json_object("props", "$.k").cast("int").alias("k")
    )


@_q(
    "split_array_counts",
    """
SELECT doc_id,
       CASE WHEN text IS NULL OR trim(text) = '' THEN 0
            ELSE CAST(len(string_split_regex(trim(text), '\\s+')) AS INT) END AS token_cnt
FROM documents
""",
    doc="M8+A3 — CSV/whitespace split → array size with empty→0 "
    "(B2S:87-106 elite/friends counts).",
)
def q_split_array_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").withColumn("text", F.trim("text"))
    d = cl.split_csv_to_array(d, "text", "toks", pattern=r"\s+")
    return cl.array_count(d, "toks", "token_cnt").select("doc_id", "token_cnt")


@_q(
    "flatten_nested_structs",
    """
SELECT p_partkey,
       p_brand AS attrs_meta_brand,
       p_type  AS attrs_meta_type,
       p_size  AS attrs_size
FROM part
""",
    doc="M1 — recursive schema flattener (B2S:6-15): nested struct "
    "synthesized from part, flattened to lowercase a_b columns in one "
    "projection.",
)
def q_flatten_nested_structs(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    nested = p.select(
        "p_partkey",
        F.struct(
            F.struct(
                F.col("p_brand").alias("Brand"), F.col("p_type").alias("Type")
            ).alias("Meta"),
            F.col("p_size").alias("Size"),
        ).alias("Attrs"),
    )
    return cl.flatten_structs(nested)


@_q(
    "detect_parse_json_props",
    """
SELECT event_id,
       CAST(json_extract_string(NULLIF(props, ''), '$.k') AS BIGINT) AS k
FROM events
""",
    doc="M3+M4 — JSON-column detector (single aggregated pass, not one "
    "collect per column) + sampled-set schema inference feeding "
    "from_json (B2S:36-54).",
)
def q_detect_parse_json_props(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    detected = cl.detect_json_string_columns(e, ["event_type", "props"])
    if not detected:
        # The sampled probe found nothing — but it only reads the first
        # ~4096 rows, so confirm with a FULL-relation probe (one
        # combinable ANY aggregate) before committing to "no JSON
        # anywhere". A corpus whose JSON appears only beyond the sample
        # window must fail loudly, never be silently nulled out.
        full = cl.detect_json_string_columns(
            e, ["event_type", "props"], sample_rows=None
        )
        if full:
            raise AssertionError(
                "sampled JSON detector missed columns present in the "
                f"full relation: {full} — widen the sample window"
            )
        # Confirmed empty relation OR a corpus whose props column holds
        # no parseable JSON (e.g. all-empty strings): emit the contract
        # schema with NULL k (what extracting from unparseable JSON
        # yields) rather than tripping the fixture assertion below,
        # which pins the detector against data that DOES carry JSON.
        return e.select(
            "event_id", F.lit(None).cast("bigint").alias("k")
        )
    assert detected == ["props"], f"detector should find props only: {detected}"
    parsed = cl.parse_json_columns(e, detected)
    return parsed.select("event_id", F.col("props.k").alias("k"))


@_q(
    "process_business_oracle",
    """
WITH b(business_id, name, is_open, city, state, hours_monday, hours_tuesday,
       wifi, parking, kids) AS (
  VALUES
    ('b1','Cafe One',1,'Springfield','IL','9:0-17:0','10:0-16:0',
     'u''free''', '{''garage'': True, ''street'': False}', 'True'),
    ('b2','Bar Two',0,'Shelbyville','MO',NULL,'11:0-23:0',
     '''no''', '{''garage'': False, ''street'': True}', 'None'),
    ('b3','Shop Three',1,'Capital City','CA','8:30-18:0',NULL,
     NULL, NULL, 'False')
),
pyrepr AS (
  SELECT business_id, name, is_open, city, state, hours_monday, hours_tuesday,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           wifi, '^u''|^''|''$', '', 'g'),
           '\\bTrue\\b', 'true', 'g'), '\\bFalse\\b', 'false', 'g'),
           '\\bNone\\b', 'null', 'g') AS wifi,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           parking, '^u''|^''|''$', '', 'g'),
           '\\bTrue\\b', 'true', 'g'), '\\bFalse\\b', 'false', 'g'),
           '\\bNone\\b', 'null', 'g') AS parking,
         regexp_replace(regexp_replace(regexp_replace(regexp_replace(
           kids, '^u''|^''|''$', '', 'g'),
           '\\bTrue\\b', 'true', 'g'), '\\bFalse\\b', 'false', 'g'),
           '\\bNone\\b', 'null', 'g') AS kids
  FROM b
)
SELECT business_id, name, CAST(is_open AS BOOLEAN) AS is_open,
       city AS location_city, state AS location_state,
       string_split(hours_monday, '-')[1] AS monday_opening_time,
       string_split(hours_monday, '-')[2] AS monday_closing_time,
       string_split(hours_tuesday, '-')[1] AS tuesday_opening_time,
       string_split(hours_tuesday, '-')[2] AS tuesday_closing_time,
       CASE WHEN lower(wifi) = 'none' OR wifi = '' THEN NULL
            ELSE wifi END AS attributes_wifi,
       CAST(json_extract_string(replace(parking, '''', '"'),
                                '$.garage') AS BOOLEAN) AS parking_garage,
       CAST(json_extract_string(replace(parking, '''', '"'),
                                '$.street') AS BOOLEAN) AS parking_street,
       CASE WHEN lower(kids) = 'none' OR kids = '' THEN NULL
            ELSE kids END AS attributes_goodforkids
FROM pyrepr
""",
    doc="M6 — the full composite business cleaner (B2S:64-76) on a "
    "synthesized Yelp-shaped fixture: is_open long→boolean, nested "
    "location/hours/attributes structs flattened (M1), hours ranges "
    "split (M5), py-repr attribute strings cleaned (M2), JSON-looking "
    "attribute columns detected (M3) and parsed to structs (M4). The "
    "final projection reads garage/street via getField on the parsed "
    "struct — which exists ONLY because the operator preserves the "
    "reference's dead-code parity (B2S:74-75: the re-flatten filter "
    "matches nothing, so parsed attributes stay nested).",
)
def q_process_business_oracle(spark, sf_dir):
    rows = [
        ("b1", "Cafe One", 1, ("Springfield", "IL"),
         ("9:0-17:0", "10:0-16:0"),
         ("u'free'", "{'garage': True, 'street': False}", "True")),
        ("b2", "Bar Two", 0, ("Shelbyville", "MO"),
         (None, "11:0-23:0"),
         ("'no'", "{'garage': False, 'street': True}", "None")),
        ("b3", "Shop Three", 1, ("Capital City", "CA"),
         ("8:30-18:0", None),
         (None, None, "False")),
    ]
    schema = (
        "business_id string, name string, is_open bigint, "
        "location struct<city:string,state:string>, "
        "hours struct<Monday:string,Tuesday:string>, "
        "attributes struct<WiFi:string,BusinessParking:string,"
        "GoodForKids:string>"
    )
    biz = spark.createDataFrame(rows, schema)
    out = cl.process_business(biz)
    return out.select(
        "business_id",
        "name",
        "is_open",
        "location_city",
        "location_state",
        "monday_opening_time",
        "monday_closing_time",
        "tuesday_opening_time",
        "tuesday_closing_time",
        "attributes_wifi",
        F.col("attributes_businessparking").getField("garage").alias(
            "parking_garage"
        ),
        F.col("attributes_businessparking").getField("street").alias(
            "parking_street"
        ),
        "attributes_goodforkids",
    )


@_q(
    "events_date_parts",
    """
SELECT event_id, ts,
       CAST(year(ts) AS INT) AS year,
       CAST(month(ts) AS INT) AS month
FROM events
""",
    doc="M9 — review/tip dater (B2S:108-111): timestamp + year/month "
    "partition columns.",
)
def q_events_date_parts(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_id", "ts")
    return cl.add_event_date_parts(e, "ts")


@_q(
    "prefix_filtered_parts",
    """
SELECT p_partkey, p_name FROM part
WHERE p_name LIKE 's%' AND p_name LIKE '%r' AND p_brand IS NOT NULL
""",
    doc="P5+P6 — startswith/endswith conjunction with a null guard "
    "(B2S:40,48): pushed to the parquet scan as StringStartsWith/"
    "StringEndsWith filters.",
)
def q_prefix_filtered_parts(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return p.filter(
        F.col("p_name").startswith("s")
        & F.col("p_name").endswith("r")
        & F.col("p_brand").isNotNull()
    ).select("p_partkey", "p_name")


# S11 — the SQL serving path: the same SQL text runs on spark.sql over
# registered views AND on the DuckDB oracle (SURVEY §3 entry point 3).
_SQL_SERVING = """
SELECT n_name, count(*) AS supplier_cnt,
       CAST(SUM(CAST(s_acctbal AS DECIMAL(27,4))) AS DOUBLE) AS sum_bal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
"""


@_q(
    "sql_suppliers_by_nation",
    _SQL_SERVING,
    doc="S11 — SQL serving over registered temp views: spark.sql runs "
    "the IDENTICAL ANSI string the oracle runs (one engine replaces "
    "the reference's Trino/Superset hop).",
)
def q_sql_suppliers_by_nation(spark, sf_dir):
    from .tables import register_views

    register_views(spark, sf_dir, ("supplier", "nation"))
    return spark.sql(_SQL_SERVING)


# --------------------------------------------------------------------------
# §2.5 windows (beyond-reference rows)
# --------------------------------------------------------------------------


@_q(
    "top_order_per_customer",
    """
SELECT o_custkey, o_orderkey, o_totalprice
FROM orders
QUALIFY row_number() OVER (PARTITION BY o_custkey
                           ORDER BY o_totalprice DESC, o_orderkey) = 1
""",
    doc="Partitioned row_number top-1-per-key — the scale-safe variant "
    "of the reference's global-window W1/W2.",
)
def q_top_order_per_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    top = win.top_n_per_group(
        o, ["o_custkey"], [F.col("o_totalprice").desc(), F.col("o_orderkey")], n=1
    )
    return top.select("o_custkey", "o_orderkey", "o_totalprice")


@_q(
    "order_price_quartiles",
    """
SELECT o_orderkey, o_totalprice,
       CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
FROM orders
""",
    doc="ntile ranking window (SURVEY §2.5 completeness): global "
    "quartile assignment with a unique-key tiebreak.",
)
def q_order_price_quartiles(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey", "o_totalprice", F.ntile(4).over(w).alias("quartile")
    )


@_q(
    "event_lag_gaps",
    """
SELECT user_id, event_id, ts,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
""",
    doc="lag window (SURVEY §2.5 completeness): inter-event gap in µs.",
)
def q_event_lag_gaps(spark, sf_dir):
    e = _t(spark, sf_dir, "events").withColumn("us", F.unix_micros("ts"))
    e = win.with_lag(e, ["user_id"], [F.col("ts"), F.col("event_id")], "us", "prev_us")
    return e.select(
        "user_id", "event_id", "ts", (F.col("us") - F.col("prev_us")).alias("gap_us")
    )


@_q(
    "running_spend_per_customer",
    """
SELECT o_custkey, o_orderkey,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4)))
            OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                  ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_spend
FROM orders
""",
    doc="Cumulative frame (rowsBetween) — running per-customer spend, "
    "decimal-exact.",
)
def q_running_spend_per_customer(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast(agg.DECIMAL)).over(w).cast("double").alias(
            "running_spend"
        ),
    )


# --------------------------------------------------------------------------
# §2.4 — aggregation suite
# --------------------------------------------------------------------------


@_q(
    "pricing_summary",
    """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS sum_disc_price,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) / count(l_quantity) AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-01'
GROUP BY l_returnflag, l_linestatus
""",
    doc="TPC-H Q1 shape — bench headline. Partial (map-side) aggregation "
    "+ one shuffle on the 2-column group key; decimal-exact sums.",
)
def q_pricing_summary(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= "1998-09-01")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return l.groupBy("l_returnflag", "l_linestatus").agg(
        agg.exact_sum("l_quantity", "sum_qty"),
        agg.exact_sum("l_extendedprice", "sum_base_price"),
        agg.exact_sum(disc_price, "sum_disc_price"),
        agg.exact_avg("l_quantity", "avg_qty"),
        F.count(F.lit(1)).alias("count_order"),
    )


@_q(
    "nation_market_share_by_year",
    """
SELECT o_year,
       round(CAST(SUM(CAST(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END
                          AS DECIMAL(27,4))) AS DOUBLE)
             / CAST(SUM(CAST(volume AS DECIMAL(27,4))) AS DOUBLE), 6) AS mkt_share,
       CAST(SUM(CAST(volume AS DECIMAL(27,4))) AS DOUBLE) AS total_volume
FROM (
  SELECT CAST(year(o_orderdate) AS INT) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS nation
  FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
    AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
    AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate < TIMESTAMP '1998-01-01'
    AND p_type = 'PROMO'
) all_nations
GROUP BY o_year
""",
    doc="TPC-H Q8 shape — national market share: the 8-table star "
    "(part/supplier/lineitem/orders/customer/nation×2/region) with a "
    "conditional-share aggregate (one nation's volume over all "
    "nations' volume per year). Every dimension broadcasts; the "
    "part-type and region filters prune fact rows during their "
    "joins; both sums accumulate in DECIMAL and the share is ONE "
    "double division of the exact operands (deterministic "
    "cross-engine, no float accumulation).",
)
def q_nation_market_share_by_year(spark, sf_dir):
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO").select(
        "p_partkey"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1998-01-01")
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n1 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey")
    )
    n2 = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    r = _t(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    ).select("r_regionkey")
    j = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    base = j.select(
        F.year("o_orderdate").cast("int").alias("o_year"),
        vol.alias("volume"),
        "nation",
    )
    tgt = F.when(F.col("nation") == "NATION_3", F.col("volume")).otherwise(
        F.lit(0.0)
    )
    return base.groupBy("o_year").agg(
        F.round(
            F.sum(tgt.cast(agg.DECIMAL)).cast("double")
            / F.sum(F.col("volume").cast(agg.DECIMAL)).cast("double"),
            6,
        ).alias("mkt_share"),
        agg.exact_sum("volume", "total_volume"),
    )


@_q(
    "avg_balance_by_segment",
    """
SELECT c_mktsegment,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) / count(c_acctbal) AS avg_bal,
       count(*) AS cnt
FROM customer GROUP BY c_mktsegment
""",
    doc="A4 — groupBy average (decimal-exact) + count.",
)
def q_avg_balance_by_segment(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        agg.exact_avg("c_acctbal", "avg_bal"), F.count(F.lit(1)).alias("cnt")
    )


@_q(
    "count_distinct_users",
    """
SELECT count(DISTINCT user_id) AS distinct_users,
       count(*) AS total_events
FROM events
""",
    doc="Distinct aggregate (SURVEY §2.4): exact COUNT(DISTINCT) — "
    "two-phase partial dedup then merge under AQE.",
)
def q_count_distinct_users(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("user_id").alias("distinct_users"),
        F.count(F.lit(1)).alias("total_events"),
    )


@_q(
    "priority_status_cube",
    """
SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
FROM orders GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
    doc="Cube (SURVEY §2.4 'built-in if needed'): all 2^k grouping "
    "sets in one pass. Empty-input () grand-total row restored via "
    "the self-gated fallback union (aggregates.empty_grand_total) — "
    "ReusedExchange keeps the nonempty plan single-scan.",
)
def q_priority_status_cube(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    cube = o.cube("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"), agg.exact_sum("o_totalprice", "sum_price")
    )
    return agg.empty_grand_total(cube, o, {"cnt": F.lit(0)})


@_q(
    "scd2_order_status_history",
    """
WITH flags AS (
  SELECT o_custkey, o_orderdate, o_orderstatus, o_orderkey,
         CASE WHEN lag(1) OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate, o_orderkey) IS NULL
                OR o_orderstatus IS DISTINCT FROM
                   lag(o_orderstatus) OVER (PARTITION BY o_custkey
                                            ORDER BY o_orderdate, o_orderkey)
              THEN 1 ELSE 0 END AS chg
  FROM orders
),
runs AS (
  SELECT o_custkey, o_orderdate, o_orderstatus,
         CAST(SUM(chg) OVER (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey
                             ROWS UNBOUNDED PRECEDING) AS INT) AS version_seq
  FROM flags
),
versions AS (
  SELECT o_custkey, version_seq,
         min(o_orderdate) AS valid_from,
         min(o_orderstatus) AS o_orderstatus
  FROM runs GROUP BY 1, 2
)
SELECT o_custkey, version_seq, valid_from, o_orderstatus,
       lead(valid_from) OVER (PARTITION BY o_custkey
                              ORDER BY version_seq) AS valid_to,
       lead(valid_from) OVER (PARTITION BY o_custkey
                              ORDER BY version_seq) IS NULL AS is_current
FROM versions
""",
    doc="SCD type-2 version history (the warehouse pattern the "
    "reference's latest-row MERGE discards): NULL-safe lag-compare "
    "flags → running-sum version ids → per-version validity intervals "
    "via lead(). version_seq (not valid_from) orders the intervals so "
    "same-day status flips stay deterministic.",
)
def q_scd2_order_status_history(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderstatus", "o_orderkey"
    )
    return up.scd2_versions(
        o,
        ["o_custkey"],
        "o_orderdate",
        ["o_orderstatus"],
        tiebreak_cols=["o_orderkey"],
    ).select(
        "o_custkey", "version_seq", "valid_from", "o_orderstatus",
        "valid_to", "is_current",
    )


@_q(
    "fuzzy_dup_pairs",
    """
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
sh AS (
  SELECT doc_id, text,
         CASE WHEN len(toks) >= 3 THEN
           list_sort(list_distinct(list_transform(
             generate_series(1, len(toks) - 2),
             i -> array_to_string(toks[i:i+2], ' '))))
         ELSE [] END AS sorted_shingles
  FROM t
),
ex AS (
  SELECT doc_id, text, unnest(sorted_shingles[1:2]) AS s FROM sh
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.text AS ta, b.text AS tb
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
)
SELECT doc_a, doc_b, CAST(levenshtein(ta, tb) AS INT) AS distance
FROM cand WHERE levenshtein(ta, tb) <= 8
""",
    doc="Fuzzy-duplicate pairs by EXACT edit distance with min-shingle "
    "blocking: docs sharing either of their two lexicographically "
    "smallest word shingles become candidates (min-wise sampling, no "
    "extra hashing), then JVM-codegen levenshtein verifies ≤ 8 — the "
    "O(len²) compare never runs all-pairs.",
)
def q_fuzzy_dup_pairs(spark, sf_dir):
    return dd.edit_distance_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        max_distance=8, n=3, band_shingles=2,
    )


@_q(
    "bigram_logprob_scores",
    """
WITH base AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
big AS (
  SELECT doc_id,
         unnest(list_transform(generate_series(1, len(t) - 1),
                               i -> array_to_string(t[i:i+1], ' '))) AS bg
  FROM base WHERE len(t) >= 2
),
bw AS (SELECT doc_id, bg, string_split(bg, ' ')[1] AS w1 FROM big),
c12 AS (SELECT bg, count(*) AS c12 FROM bw GROUP BY bg),
c1 AS (SELECT w1, count(*) AS c1 FROM bw GROUP BY w1)
SELECT doc_id, count(*) AS n_bigrams,
       round(CAST(SUM(CAST(round(ln(CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE)), 6)
                           AS DECIMAL(27,6))) AS DOUBLE) / count(*), 6) AS mean_logprob
FROM bw JOIN c12 USING (bg) JOIN c1 USING (w1)
GROUP BY doc_id
""",
    doc="Perplexity-style fluency scoring: mean bigram log-probability "
    "under the corpus's own bigram model (CCNet-style quality signal). "
    "Each libm log term is rounded to 6dp then DECIMAL-summed so the "
    "mean replays identically on a sequential engine.",
)
def q_bigram_logprob_scores(spark, sf_dir):
    return tx.bigram_logprob_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )


_WQ_KEY_SQL = md5_long_sql("concat_ws('|', 'wq', CAST(doc_id AS VARCHAR))")
_MIX_KEY_SQL = md5_long_sql("concat_ws('|', 'mix', CAST(d.doc_id AS VARCHAR))")


@_q(
    "weighted_quality_sample",
    f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS INT) AS n_stop
  FROM documents
),
q AS (
  SELECT doc_id,
         round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
               + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
               6) AS quality_score
  FROM base
)
SELECT doc_id, quality_score FROM q
WHERE {_WQ_KEY_SQL} % 10000 < floor(quality_score * 10000)
""",
    doc="Quality-weighted sampling: per-row keep probability = the "
    "composite quality score (soft filter — great docs always survive, "
    "mediocre ones proportionally), decided by content hash so the "
    "kept set is identical on every rerun, engine, and partitioning.",
)
def q_weighted_quality_sample(spark, sf_dir):
    q = tx.quality_features(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    ).select("doc_id", "quality_score")
    return smp.weighted_hash_sample(q, "doc_id", "quality_score", salt="wq")


@_q(
    "mixture_resampled_docs",
    f"""
WITH tgt(source, w) AS (
  VALUES ('src0', 0.5), ('src1', 0.3), ('src2', 0.2)
),
obs AS (
  SELECT source, count(*) AS c
  FROM documents WHERE source IN ('src0', 'src1', 'src2')
  GROUP BY source
),
-- LEFT JOIN from the target list: a targeted source with ZERO corpus
-- rows contributes count 0, driving T to 0 and the result to empty —
-- the operator's strict-mixture contract (sampling.py), not a silent
-- renormalization over whichever sources happen to exist.
cnt AS (
  SELECT t.source, coalesce(o.c, 0) AS c, t.w
  FROM tgt t LEFT JOIN obs o ON t.source = o.source
),
t AS (SELECT min(c / w) AS t FROM cnt),
rates AS (
  SELECT source,
         CASE WHEN c > 0
              THEN CAST(floor(w * t.t / c * 10000) AS BIGINT)
              ELSE 0 END AS thresh
  FROM cnt, t
)
SELECT d.doc_id, d.source
FROM documents d JOIN rates r ON d.source = r.source
WHERE {_MIX_KEY_SQL} % 10000 < r.thresh
""",
    doc="Data mixing: downsample sources so the surviving corpus "
    "matches target proportions (50/30/20 here). The scarcest source "
    "relative to its share is kept whole (T = min count/weight), the "
    "rest hash-downsample to weight·T/count — all computed in-plan "
    "(per-source counts broadcast back, 1-row min for T, no driver "
    "round-trip), deterministic via IEEE division + floor bucketing.",
)
def q_mixture_resampled_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    out = smp.resample_to_mixture(
        d, "doc_id", "source",
        {"src0": 0.5, "src1": 0.3, "src2": 0.2}, salt="mix",
    )
    return out.select("doc_id", "source")


# Shared quality-score SQL fragment (must stay in sync with
# textops.quality_score_col — the 6dp-before-combine rounding contract).
_QSCORE_CTE = f"""qbase AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS INT) AS n_stop
  FROM documents
),
qscore AS (
  SELECT doc_id,
         round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
               + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
               6) AS quality_score
  FROM qbase
)"""


@_q(
    "dedup_keep_best_docs",
    f"""
WITH {_QSCORE_CTE},
g AS (
  SELECT d.doc_id,
         md5(trim(regexp_replace(lower(d.text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
         q.quality_score
  FROM documents d JOIN qscore q ON d.doc_id = q.doc_id
)
SELECT fingerprint, doc_id, quality_score, group_size FROM (
  SELECT fingerprint, doc_id, quality_score,
         count(*) OVER (PARTITION BY fingerprint) AS group_size,
         row_number() OVER (PARTITION BY fingerprint
                            ORDER BY quality_score DESC, doc_id ASC) AS rn
  FROM g
) WHERE rn = 1
""",
    doc="Quality-keeping exact dedup: one survivor per normalized-text "
    "fingerprint group — the best-scoring copy, not an arbitrary "
    "minimal id. Spark side is a single map-side-combinable struct-"
    "argmax groupBy (no window shuffle of the full corpus); the "
    "row_number oracle realizes the same (max score, min id) order.",
)
def q_dedup_keep_best_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.md5(dd.normalize_text(F.col("text"))).alias("fingerprint"),
        tx.quality_score_col(F.col("text")).alias("quality_score"),
    )
    return dd.dedup_keep_best(
        scored, "fingerprint", "quality_score", "doc_id"
    )


@_q(
    "temperature_mixture_weights",
    """
WITH per AS (
  SELECT source, CAST(SUM(n_chars) AS BIGINT) AS n_units
  FROM documents GROUP BY source
),
s AS (
  SELECT source, n_units,
         CAST(n_units AS DOUBLE) / CAST(SUM(n_units) OVER () AS DOUBLE) AS raw,
         round(sqrt(CAST(n_units AS DOUBLE)), 6) AS sq
  FROM per
),
s2 AS (
  SELECT source, n_units, raw,
         sq / CAST(SUM(CAST(sq AS DECIMAL(27,6))) OVER () AS DOUBLE) AS temp
  FROM s
)
SELECT source, n_units,
       round(raw, 6) AS raw_share,
       round(temp, 6) AS temp_share,
       round(temp / raw, 6) AS rate_mult
FROM s2
""",
    doc="Temperature-scaled (T=2) mixture weights per source over "
    "corpus sizes — the multilingual rebalancing rule (upsample rare "
    "sources). sqrt is correctly-rounded IEEE (unlike pow), rounded "
    "6dp and DECIMAL-summed for an order-independent normalizer.",
)
def q_temperature_mixture_weights(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return smp.temperature_weights(d, "source", F.col("n_chars"))


_BM25_TERMS = ("spark", "vector", "merge", "window")


@_q(
    "bm25_doc_scores",
    f"""
WITH dl AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) AS dl
  FROM documents
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs,
         CAST(SUM(CAST(dl AS DECIMAL(27,4))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS avgdl
  FROM dl
),
tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok
  WHERE term IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
  GROUP BY doc_id, term
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY term),
idf AS (
  SELECT term,
         round(ln(1.0 + (n_docs - df + 0.5) / (df + 0.5)), 6) AS idf,
         avgdl
  FROM dfreq, stats
),
part AS (
  SELECT doc_id,
         round(idf * (CAST(tf AS DOUBLE) * (1.2 + 1.0))
               / (CAST(tf AS DOUBLE)
                  + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)),
               6) AS s
  FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
)
SELECT doc_id, CAST(count(*) AS INT) AS n_terms_hit,
       round(CAST(SUM(CAST(s AS DECIMAL(20,6))) AS DOUBLE), 6) AS bm25
FROM part GROUP BY doc_id
""",
    doc="Okapi BM25 of every document against a fixed query-term set "
    "(k1=1.2, b=0.75) — retrieval scoring for corpus search / RAG "
    "curation. Token filter lands before the shuffle; corpus stats "
    "broadcast; idf rounded 6dp before the product (libm ln is the "
    "one non-correctly-rounded term); DECIMAL per-doc sum.",
)
def q_bm25_doc_scores(spark, sf_dir):
    return tx.bm25_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text", _BM25_TERMS
    )


@_q(
    "price_quantity_corr",
    """
WITH m AS (
  SELECT count(*) AS n,
         SUM(CAST(l_quantity AS DECIMAL(27,4))) AS sx,
         SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS sy,
         SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8))) AS sxy,
         SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS sxx,
         SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8))) AS syy
  FROM lineitem
)
SELECT round(
  (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
  / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
     * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS corr
FROM m
""",
    doc="Pearson correlation from EXACT decimal moments (n, Σx, Σy, "
    "Σxy, Σx², Σy²) — never F.corr/corr(), whose float accumulation "
    "is partition-order-dependent; the moment sums are orderless "
    "decimals, so one map-side-combined pass replays identically on "
    "any engine or partitioning.",
)
def q_price_quantity_corr(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    x = F.col("l_quantity")
    y = F.col("l_extendedprice")
    m = l.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x.cast("decimal(27,4)")).alias("sx"),
        F.sum(y.cast("decimal(27,4)")).alias("sy"),
        F.sum((x * y).cast("decimal(38,8)")).alias("sxy"),
        F.sum((x * x).cast("decimal(38,8)")).alias("sxx"),
        F.sum((y * y).cast("decimal(38,8)")).alias("syy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx = F.col("sxx").cast("double")
    syy = F.col("syy").cast("double")
    # NULL when either column has zero variance (e.g. a single row) —
    # SQL 0/0 semantics, never an ANSI crash.
    denx = n * sxx - sx * sx
    deny = n * syy - sy * sy
    return m.select(
        F.when(
            (denx > 0) & (deny > 0),
            F.round(
                (n * sxy - sx * sy) / (F.sqrt(denx) * F.sqrt(deny)), 6
            ),
        ).alias("corr")
    )


@_q(
    "scaled_prices_by_priority",
    """
WITH b AS (
  SELECT o_orderpriority,
         min(o_totalprice) AS lo, max(o_totalprice) AS hi
  FROM orders GROUP BY 1
)
SELECT o_orderkey, o_orderpriority,
       round(CASE WHEN hi = lo THEN 0.0
                  ELSE (o_totalprice - lo) / (hi - lo) END, 6) AS scaled
FROM orders JOIN b USING (o_orderpriority)
""",
    doc="Group-wise min-max feature scaling: per-group bounds from one "
    "hash aggregate broadcast back onto the fact rows (never a global "
    "window). Constant groups scale to 0 instead of dividing by zero. "
    "The min/max + subtract/divide are exact IEEE ops, so no decimal "
    "detour is needed for cross-engine equality.",
)
def q_scaled_prices_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    b = o.groupBy("o_orderpriority").agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    j = o.join(F.broadcast(b), "o_orderpriority")
    scaled = F.when(F.col("hi") == F.col("lo"), F.lit(0.0)).otherwise(
        (F.col("o_totalprice") - F.col("lo")) / (F.col("hi") - F.col("lo"))
    )
    return j.select(
        "o_orderkey", "o_orderpriority", F.round(scaled, 6).alias("scaled")
    )


def _approx_event_stats_oracle() -> str:
    from .operators.aggregates import hll_oracle_sql

    sample_pred = (
        "CAST('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15) "
        "AS BIGINT) % 10 = 0"
    )
    return f"""
WITH sk AS MATERIALIZED ({hll_oracle_sql("events", "user_id", m=64)}),
q AS (
  SELECT count(*) AS sample_n,
         round(quantile_cont(value, 0.5), 6) AS value_p50,
         round(quantile_cont(value, 0.95), 6) AS value_p95,
         round(quantile_cont(value, 0.99), 6) AS value_p99
  FROM events
  WHERE {sample_pred}
)
SELECT sk.*, q.* FROM sk, q
"""


@_q(
    "approx_event_stats",
    _approx_event_stats_oracle(),
    doc="The approximate tier a 100 TB deployment actually uses, in "
    "DETERMINISTIC form so the driver can verify it (the engine-native "
    "approx_count_distinct/percentile_approx sketches are "
    "engine-private — rows-only checkable, never driver-green; this "
    "was the registry's one structurally unverifiable row through r6): "
    "(1) md5-register HyperLogLog distinct users "
    "(operators/aggregates.py:hll_distinct, Flajolet 2007) — register "
    "max-fold is fully map-side combinable, harmonic sum assembled "
    "from an EXACT DECIMAL integer so the estimate is bit-identical "
    "across engines/partitionings/retries; registers_hit + rho_sum "
    "pin the full register state. (2) Exact p50/p95/p99 over a "
    "DETERMINISTIC 10% md5-hash sample of `value` — the hash-sample "
    "quantile pattern (sample is reproducible, unlike Bernoulli "
    "rand()), one sorted-agg over ~10% of rows. Both halves are "
    "1-row aggregates crossed via broadcast.",
)
def q_approx_event_stats(spark, sf_dir):
    from .functions.hashing import md5_long
    from .operators import aggregates as agg_ops

    e = _t(spark, sf_dir, "events")
    sk = agg_ops.hll_distinct(e, "user_id", m=64)
    sample = e.where(md5_long(F.col("event_id").cast("string")) % 10 == 0)
    q = sample.agg(
        F.count(F.lit(1)).alias("sample_n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("value_p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("value_p95"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("value_p99"),
    )
    return sk.crossJoin(F.broadcast(q))


@_q(
    "salted_segment_event_counts",
    """
SELECT c_mktsegment, count(*) AS n_events
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
""",
    doc="Skew-proof JOIN via explicit salting (the join twin of "
    "salted_event_type_counts' agg salting): big side salted per row, "
    "small side replicated per salt, equi-join on (key, salt) — a "
    "pathological hot key spreads over `salts` reducers even when it "
    "defeats AQE's post-shuffle split thresholds. Result is "
    "salt-invariant, so the oracle is the plain join.",
)
def q_salted_segment_event_counts(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("user_id")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = joins.salted_join(e, c, "user_id", "c_custkey", salts=8)
    return j.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_events"))


@_q(
    "priority_status_grouping_sets",
    """
SELECT o_orderpriority, o_orderstatus,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       count(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), (o_orderstatus))
""",
    doc="Arbitrary GROUPING SETS (beyond cube/rollup's fixed lattices): "
    "the three user-chosen sets in ONE pass via Expand, with GROUPING() "
    "flags disambiguating a rolled-up NULL from a genuine NULL key.",
)
def q_priority_status_grouping_sets(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupingSets(
        [["o_orderpriority", "o_orderstatus"], ["o_orderpriority"],
         ["o_orderstatus"]],
        "o_orderpriority",
        "o_orderstatus",
    ).agg(
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.count(F.lit(1)).alias("cnt"),
        agg.exact_sum("o_totalprice", "sum_price"),
    )


@_q(
    "asof_latest_order",
    """
SELECT e.event_id, e.user_id, e.ts, o.o_orderdate AS last_order_date
FROM events e
ASOF LEFT JOIN orders o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
""",
    doc="As-of join (custom operator — Spark lacks one): most recent "
    "order at or before each event, via tag+union+per-key window "
    "last(ignorenulls) — one shuffle, no key-equi-then-filter blowup. "
    "Oracle is DuckDB's native ASOF JOIN.",
)
def q_asof_latest_order(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_orderdate").alias("last_order_date")
    )
    joined = joins.asof_join(
        e, o, "user_id", "o_custkey", "ts", "last_order_date", ["last_order_date"]
    )
    return joined.select("event_id", "user_id", "ts", "last_order_date")


@_q(
    "salted_event_type_counts",
    """
SELECT event_type, count(*) AS cnt FROM events GROUP BY event_type
""",
    doc="Skew-safe two-stage aggregation: (key, salt) partial counts → "
    "per-key sum. Salt-invariant result; the pattern that keeps one "
    "hot key from pinning a single reducer (AQE splits skewed JOINS, "
    "not aggregations).",
)
def q_salted_event_type_counts(spark, sf_dir):
    return agg.salted_group_count(
        _t(spark, sf_dir, "events"), ["event_type"], salt_buckets=16
    )


@_q(
    "event_pairs_within_5s",
    """
SELECT a.event_id AS id_a, b.event_id AS id_b,
       epoch_us(b.ts) - epoch_us(a.ts) AS dt_us
FROM events a JOIN events b
  ON b.ts >= a.ts - INTERVAL 5 SECOND
 AND b.ts <= a.ts + INTERVAL 5 SECOND
 AND a.event_id < b.event_id
""",
    doc="Range join (custom operator — Spark plans bare inequality "
    "joins as nested loops): event pairs within ±5s via bucket-binned "
    "equi-join + exact filter; each pair matches exactly once, no "
    "dedup pass.",
)
def q_event_pairs_within_5s(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    a = e.select(F.col("event_id").alias("id_a"), F.col("ts").alias("ts_a"))
    b = e.select(F.col("event_id").alias("id_b"), F.col("ts").alias("ts_b"))
    return joins.range_join_binned(a, b, "ts_a", "ts_b", 5, ["id_a"], ["id_b"]).filter(
        F.col("id_a") < F.col("id_b")
    )


@_q(
    "median_price_by_priority",
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.5), 6) AS median_price,
       count(*) AS cnt
FROM orders GROUP BY o_orderpriority
""",
    doc="Exact median (linear-interpolated) per group — Spark "
    "percentile vs DuckDB quantile_cont, rounded to 6dp.",
)
def q_median_price_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("median_price"),
        F.count(F.lit(1)).alias("cnt"),
    )


@_q(
    "priority_status_rollup",
    """
SELECT o_orderpriority, o_orderstatus, count(*) AS cnt,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS sum_price
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)
""",
    doc="Rollup (SURVEY §2.4 'built-in if needed'): hierarchical "
    "subtotals in one pass. Empty-input () grand-total row restored "
    "via the self-gated fallback union (aggregates.empty_grand_total).",
)
def q_priority_status_rollup(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    rolled = o.rollup("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt"), agg.exact_sum("o_totalprice", "sum_price")
    )
    return agg.empty_grand_total(rolled, o, {"cnt": F.lit(0)})


# --------------------------------------------------------------------------
# §2.1 S9 — MERGE upsert semantics
# --------------------------------------------------------------------------


@_q(
    "merge_upsert_orders",
    """
WITH old AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders
  WHERE month(o_orderdate) <= 6
),
upd AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE month(o_orderdate) IN (6, 7)
)
SELECT * FROM upd
UNION ALL
SELECT o.* FROM old o
WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
""",
    doc="S9 — Delta MERGE semantics (S2G:127-144) as updates ∪ "
    "anti-joined target: month-6 rows updated, month-7 inserted.",
)
def q_merge_upsert_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    old = o.filter(F.month("o_orderdate") <= 6)
    upd = o.filter(F.month("o_orderdate").isin(6, 7)).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    return up.merge_upsert_df(old, upd, ["o_orderkey"])


def _versioned_orders_replay(spark, sf_dir):
    """Shared replay for the versioned-table rows: commit the
    merge_upsert_orders scenario as two versions of a manifest-tracked
    table (v0 = create base, v1 = MERGE updates) in a throwaway temp
    dir. Returns (table_path, tmp_root)."""
    import tempfile

    from .operators import versioned as vt

    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    base = o.filter(F.month("o_orderdate") <= 6)
    upd = o.filter(F.month("o_orderdate").isin(6, 7)).withColumn(
        "o_totalprice", F.col("o_totalprice") * 2
    )
    tmp_root = tempfile.mkdtemp(prefix="spark_graft_versioned_")
    table = tmp_root + "/orders"
    vt.create_versioned(base, table)
    vt.merge_versioned(spark, upd, table, ["o_orderkey"])
    return table, tmp_root


def _checkpoint_and_clean(df, tmp_root):
    """Materialize the result off the temp table's files (eager
    localCheckpoint — executor-local storage), then delete the temp
    dir so repeated sweeps don't accrete /tmp snapshots."""
    import shutil

    rows = df.localCheckpoint(eager=True)
    shutil.rmtree(tmp_root, ignore_errors=True)
    return rows


_VERSIONED_ORACLE_CTES = """
v0 AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders
  WHERE month(o_orderdate) <= 6
),
upd AS (
  SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice * 2 AS o_totalprice
  FROM orders WHERE month(o_orderdate) IN (6, 7)
),
v1 AS (
  SELECT * FROM upd
  UNION ALL
  SELECT o.* FROM v0 o
  WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = o.o_orderkey)
)"""


@_q(
    "orders_version_history",
    f"""
WITH {_VERSIONED_ORACLE_CTES}
SELECT 0 AS version, * FROM v0
UNION ALL
SELECT 1 AS version, * FROM v1
""",
    doc="S3/S9/S10 Delta-parity closure — manifest-tracked versioned "
    "parquet table (operators/versioned.py): REPLAYS two commits "
    "(v0 create, v1 MERGE; reference S2G:127-144) against a real "
    "on-disk table, then TIME-TRAVELS both versions back "
    "(read_version 0 and 1). The oracle reconstructs each version "
    "from the update stream, so a snapshot-isolation bug (v1 bleeding "
    "into v0's files, or a half-commit visible) hash-mismatches.",
)
def q_orders_version_history(spark, sf_dir):
    from .operators import versioned as vt

    table, tmp_root = _versioned_orders_replay(spark, sf_dir)
    v0 = vt.read_version(spark, table, 0).withColumn("version", F.lit(0))
    v1 = vt.read_version(spark, table, 1).withColumn("version", F.lit(1))
    out = v0.unionByName(v1).select(
        "version", "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    return _checkpoint_and_clean(out, tmp_root)


@_q(
    "orders_time_travel_stats",
    f"""
WITH {_VERSIONED_ORACLE_CTES},
tagged AS (
  SELECT 0 AS version, * FROM v0
  UNION ALL SELECT 1, * FROM v1
  UNION ALL SELECT 2, * FROM v0
)
SELECT version,
       COUNT(*) AS n_rows,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS total_price
FROM tagged GROUP BY version
""",
    doc="Delta RESTORE twin over the manifest log: after v0 create + "
    "v1 MERGE, restore_versioned(0) commits metadata-only v2 "
    "re-referencing v0's physical files; per-version row counts and "
    "decimal-accumulated price sums are read back across ALL three "
    "versions. v2 == v0 proves restore; v1 intact proves history "
    "survives it.",
)
def q_orders_time_travel_stats(spark, sf_dir):
    from .operators import versioned as vt

    table, tmp_root = _versioned_orders_replay(spark, sf_dir)
    vt.restore_versioned(table, 0)
    per_version = [
        vt.read_version(spark, table, v).withColumn("version", F.lit(v))
        for v in (0, 1, 2)
    ]
    tagged = per_version[0].unionByName(per_version[1]).unionByName(per_version[2])
    out = tagged.groupBy("version").agg(
        F.count("*").alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(27,4)"))
        .cast("double")
        .alias("total_price"),
    )
    return _checkpoint_and_clean(out, tmp_root)


# --------------------------------------------------------------------------
# North-star: deduplication (BASELINE.json)
# --------------------------------------------------------------------------

# DuckDB twins of the shingling pipeline (dedup.py). Both engines build
# distinct lowercase word 3-grams, hash with the portable md5-60bit mix.
_SHINGLES_CTE = """
toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
sh AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(t) - 2),
                                        i -> array_to_string(t[i:i+2], ' ')))
         ELSE [] END AS shingles
  FROM toks
)"""


def _minhash_oracle(
    k: int = 12,
    bands: int = 4,
    threshold: float = 0.8,
    pair_pred: str = "a.doc_id < b.doc_id",
) -> str:
    """``pair_pred`` restricts the candidate self-join (default: the
    batch dedup orientation; the gate twin passes the cross-half
    incoming-vs-index predicate)."""
    rows = k // bands
    mh_cols = ",\n         ".join(
        f"list_min(list_transform(shingles, s -> {md5_family_sql('s', i)})) AS mh{i}"
        for i in range(k)
    )
    band_cols = ",\n         ".join(
        "md5(concat_ws('|', "
        + ", ".join(f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
        + f")) AS band{b}"
        for b in range(bands)
    )
    band_union = "\nUNION ALL\n".join(
        f"SELECT doc_id, n_sh, shingles, {b} AS band_id, band{b} AS key FROM banded"
        for b in range(bands)
    )
    return f"""
WITH {_SHINGLES_CTE},
sig AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, shingles,
         {mh_cols}
  FROM sh
),
banded AS (
  SELECT doc_id, n_sh, shingles,
         {band_cols}
  FROM sig
),
bl AS ({band_union}),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  a.shingles AS sh_a, b.shingles AS sh_b,
                  a.n_sh AS na, b.n_sh AS nb
  FROM bl a JOIN bl b
    ON a.band_id = b.band_id AND a.key = b.key AND ({pair_pred})
),
verified AS (
  SELECT doc_a, doc_b,
         round(CAST(len(list_intersect(sh_a, sh_b)) AS DOUBLE)
               / CAST(na + nb - len(list_intersect(sh_a, sh_b)) AS DOUBLE), 6) AS jaccard
  FROM cand
)
SELECT doc_a, doc_b, jaccard FROM verified WHERE jaccard >= {threshold}
"""


def _simhash_sig_sql(bits: int = dd.SIMHASH_BITS, src: str = "documents") -> str:
    """CTEs doc_id → simhash, mirroring dedup.simhash exactly."""
    votes = ",\n         ".join(
        f"list_sum(list_transform(hs, h -> ((h >> {b}) & 1) * 2 - 1)) AS v{b}"
        for b in range(bits)
    )
    sig = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({2**b} AS BIGINT) ELSE CAST(0 AS BIGINT) END"
        for b in range(bits)
    )
    return f"""
toks AS (
  SELECT doc_id,
         list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS t
  FROM {src}
),
hashed AS (
  SELECT doc_id, list_transform(t, s -> {md5_long_sql('s')}) AS hs FROM toks
),
votes AS (
  SELECT doc_id,
         {votes}
  FROM hashed
),
sig AS (
  SELECT doc_id, {sig} AS simhash FROM votes
)"""


@_q(
    "dedup_exact_docs",
    """
SELECT text, min(doc_id) AS doc_id FROM documents GROUP BY text
""",
    doc="Exact dedup — hash groupBy keeping the minimal id "
    "(deterministic survivor).",
)
def q_dedup_exact_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return dd.dedup_exact(d, ["text"], "doc_id")


@_q(
    "doc_fingerprints",
    """
SELECT doc_id,
       md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint,
       CAST(length(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS INT) AS norm_len
FROM documents
""",
    doc="Fingerprint dedup key: md5 over normalized (case/punct/ws-"
    "invariant) text.",
)
def q_doc_fingerprints(spark, sf_dir):
    return tx.doc_fingerprints(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "dedup_ngram_pairs",
    f"""
WITH {_SHINGLES_CTE},
ex0 AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s FROM sh
),
hot AS (
  SELECT s FROM (
    SELECT s, count(DISTINCT doc_id) AS df FROM ex0 GROUP BY s
  ) t WHERE df > 5
),
ex AS (SELECT * FROM ex0 WHERE s NOT IN (SELECT s FROM hot)),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM c
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) >= 0.8
""",
    doc="N-gram Jaccard near-dup pairs — THE DEFAULT VARIANT runs with "
    "the stop-shingle cap ON (max_doc_freq=5, the operator default "
    "since round 6): shingles in >5 docs are excluded before the "
    "self-join via a broadcast anti-join, bounding per-shingle join "
    "fan-out (d·(d-1)/2 candidate rows per shingle in d docs). The "
    "25× doc scale point measured exact at 12.3× vs capped at 2.7× — "
    "the default must be the variant that survives shared-shingle "
    "density growth. Jaccard is conservative under the cap: common "
    "counts only surviving shingles against full set sizes.",
)
def q_dedup_ngram_pairs(spark, sf_dir):
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.8
    )


@_q(
    "ngram_jaccard_exact",
    f"""
WITH {_SHINGLES_CTE},
ex AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s FROM sh
),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM c
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) >= 0.8
""",
    doc="EXACT n-gram Jaccard (max_doc_freq=None): the bit-parity / "
    "recall baseline the capped default is judged against — "
    "deliberately NOT the default (12.3× time at 25× docs vs 2.7× "
    "capped; same default-vs-baseline split as embedding_neardup_"
    "pairs vs embedding_neardup_fine). Shingle-explode + bucket join: "
    "docs only meet on shared shingles, never a cross join.",
    scale_note="recall/parity baseline — superlinear on hot shingles "
    "(13.5× at 25× docs); at scale use dedup_ngram_pairs (capped "
    "max_doc_freq) instead",
)
def q_ngram_jaccard_exact(spark, sf_dir):
    return dd.ngram_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold=0.8, max_doc_freq=None,
    )


@_q(
    "doc_novelty_scores",
    f"""
WITH {_SHINGLES_CTE},
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
first AS (SELECT s, min(doc_id) AS fd FROM ex GROUP BY s),
per AS (
  SELECT e.doc_id,
         count(*) AS n_shingles,
         CAST(sum(CASE WHEN f.fd = e.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel
  FROM ex e JOIN first f ON e.s = f.s
  GROUP BY e.doc_id
)
SELECT doc_id, n_shingles, n_novel,
       round(CAST(n_novel AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6) AS novelty
FROM per
""",
    doc="Per-document novelty / contribution score (operators/"
    "dedup.py:doc_novelty_scores): fraction of a doc's distinct word "
    "3-gram shingles FIRST seen in that doc (min-doc_id attribution) "
    "— ranks near-boilerplate docs that evade every pairwise near-dup "
    "threshold yet contribute almost nothing new; novelty → 0 as "
    "content is already covered by earlier corpus. Same shingle-keyed "
    "shuffle the n-gram dedup family pays, map-side-combinable min "
    "attribution, exploded relation persisted (feeds the first-seen "
    "aggregate AND the per-doc rollup). Deterministic: min/integer "
    "counts, one final division.",
)
def q_doc_novelty_scores(spark, sf_dir):
    return dd.doc_novelty_scores(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "priority_loo_target_encoding",
    """
WITH stats AS (
  SELECT o_orderpriority,
         SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS s,
         count(*) AS n
  FROM orders GROUP BY 1
)
SELECT o_orderkey, o.o_orderpriority, o_totalprice,
       CASE WHEN n > 1 THEN
         round(CAST(s - CAST(o_totalprice AS DECIMAL(27,4)) AS DOUBLE)
               / CAST(n - 1 AS DOUBLE), 6)
       END AS loo_mean
FROM orders o JOIN stats USING (o_orderpriority)
""",
    doc="Leave-one-out target encoding of order priority by mean "
    "total price (operators/aggregates.py:loo_target_encoding) — the "
    "standard high-cardinality categorical encoder in its "
    "leakage-safe form: each row gets the category mean over all "
    "OTHER rows, (S−x)/(n−1), so its own label never leaks into the "
    "feature. DECIMAL-exact sums (order-free under AQE), one double "
    "division per row; singleton categories NULL. ONE map-side-"
    "combinable groupBy + broadcast-back — never a per-row window "
    "over the category (the naive shape funnels every hot category "
    "through one reducer).",
)
def q_priority_loo_target_encoding(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return agg.loo_target_encoding(
        o, ["o_orderkey"], "o_orderpriority", "o_totalprice"
    )


@_q(
    "order_price_decile_bins",
    """
WITH b AS (
  SELECT list_transform(
           quantile_cont(o_totalprice, [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]),
           x -> round(x, 6)) AS bounds
  FROM orders
)
SELECT o_orderkey, o_totalprice,
       CASE WHEN o_totalprice IS NOT NULL THEN
         CAST(1 + len(list_filter(bounds, x -> x <= round(o_totalprice, 6))) AS INT)
       END AS bin
FROM orders, b
""",
    doc="Equi-depth decile binning of order prices (operators/"
    "aggregates.py:quantile_bins — the QuantileDiscretizer shape as "
    "plain DataFrame ops): bin = 1 + #bounds ≤ value over exact "
    "10-quantile bounds, 6dp-rounded before comparison. Unlike "
    "ntile(), which buckets ROW RANKS and splits ties arbitrarily, "
    "value-bound binning is deterministic and inference-stable (equal "
    "values always share a bin). One 1-row percentile aggregate "
    "broadcast back; assignment is a map-side array fold; "
    "percentile_approx is the 100 TB drop-in.",
)
def q_order_price_decile_bins(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return agg.quantile_bins(o, ["o_orderkey"], "o_totalprice", n_bins=10)


@_q(
    "hourly_value_isotonic_fit",
    """
WITH base AS (
  SELECT event_type AS g, CAST(hour(ts) AS INT) AS x,
         count(*) AS w, SUM(CAST(value AS DECIMAL(27,6))) AS wy
  FROM events GROUP BY 1, 2
),
cum AS (
  SELECT g, x, w, wy,
         SUM(w)  OVER (PARTITION BY g ORDER BY x ROWS UNBOUNDED PRECEDING) AS cw,
         SUM(wy) OVER (PARTITION BY g ORDER BY x ROWS UNBOUNDED PRECEDING) AS cwy
  FROM base
),
cum2 AS (
  SELECT g, x, w, wy, cw, cwy, cw - w AS pcw, cwy - wy AS pcwy FROM cum
),
pairs AS (
  SELECT j.g, j.x AS xj, k.x AS xk,
         CAST(k.cwy - j.pcwy AS DOUBLE) / CAST(k.cw - j.pcw AS DOUBLE) AS iavg
  FROM cum2 j JOIN cum2 k ON j.g = k.g AND j.x <= k.x
),
smin AS (
  SELECT g, xj, xk,
         min(iavg) OVER (PARTITION BY g, xj ORDER BY xk DESC
                         ROWS UNBOUNDED PRECEDING) AS sm
  FROM pairs
),
iso AS (SELECT g, xk AS x, round(max(sm), 6) AS y_iso FROM smin GROUP BY g, xk),
means AS (
  SELECT g, x, w AS n,
         round(CAST(wy AS DOUBLE) / CAST(w AS DOUBLE), 6) AS y_mean
  FROM cum2
)
SELECT m.g AS event_type, m.x AS hour, n, y_mean, y_iso
FROM means m JOIN iso ON m.g = iso.g AND m.x = iso.x
""",
    doc="Per-type isotonic (monotone non-decreasing) fit of mean event "
    "value against hour of day (operators/timeseries.py:"
    "isotonic_fit_by_group) — the calibration-curve fit in its closed "
    "MINIMAX form ŷᵢ = max_{j≤i} min_{k≥i} avg(j..k) (Barlow et al. "
    "1972), which equals pool-adjacent-violators exactly but is "
    "expressible as joins + two running-extreme windows — fully "
    "distributed AND hash-checkable in SQL. Ties collapse first "
    "(per-(type, hour) DECIMAL-exact sums), so the O(d²) pair join is "
    "over d = 24 distinct hours, not data rows; interval averages "
    "are single double divisions of exact decimal prefix sums. "
    "isotonic_fit_pandas (applyInPandas PAVA, O(d)) is the large-d "
    "path, pinned against this one in tests.",
)
def q_hourly_value_isotonic_fit(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "event_type", F.hour("ts").alias("hour"), "value"
    )
    return ts_ops.isotonic_fit_by_group(e, "event_type", "hour", "value")


@_q(
    "customer_k_anonymity_audit",
    """
SELECT c_nationkey, c_mktsegment,
       CAST(floor(c_acctbal / 5000) AS INT) AS acctbal_band,
       count(*) AS class_size
FROM customer
GROUP BY 1, 2, 3
HAVING count(*) < 5
ORDER BY class_size, c_nationkey, c_mktsegment, acctbal_band
""",
    doc="k-anonymity audit (Sweeney 2002; operators/quality.py:"
    "k_anonymity_audit) over the (nation, segment, balance-band) "
    "quasi-identifier tuple: every equivalence class with < 5 members "
    "is a re-identification risk — the release gate run before "
    "person-adjacent tabular data enters a training corpus. ONE "
    "map-side-combinable groupBy + count filter; only quasi columns "
    "move, no payloads; smallest (riskiest) classes first with a "
    "deterministic full-column tiebreak. Mitigation (generalize / "
    "suppress / drop) is the caller's policy step.",
)
def q_customer_k_anonymity_audit(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select(
        "c_nationkey", "c_mktsegment",
        F.floor(F.col("c_acctbal") / 5000).cast("int").alias("acctbal_band"),
    )
    return dq.k_anonymity_audit(
        c, ["c_nationkey", "c_mktsegment", "acctbal_band"], k=5
    )


@_q(
    "vocab_coverage_curve",
    r"""
WITH counts AS (
  SELECT w, count(*) AS cnt FROM (
    SELECT trim(unnest(string_split_regex(trim(lower(text)), '\s+'))) AS w
    FROM documents
  ) WHERE w <> '' GROUP BY w
),
ranked AS (
  SELECT cnt, row_number() OVER (ORDER BY cnt DESC, w) AS rn FROM counts
),
cps AS (SELECT unnest([100, 500, 1000, 5000]) AS vocab_size)
SELECT CAST(vocab_size AS INT) AS vocab_size,
       CAST(sum(CASE WHEN rn <= vocab_size THEN cnt ELSE 0 END) AS BIGINT)
         AS covered_tokens,
       CAST(sum(cnt) AS BIGINT) AS total_tokens,
       round(CAST(sum(CASE WHEN rn <= vocab_size THEN cnt ELSE 0 END) AS DOUBLE)
             / CAST(sum(cnt) AS DOUBLE), 6) AS coverage
FROM ranked, cps
GROUP BY vocab_size
""",
    doc="Vocabulary coverage curve (operators/textops.py:"
    "vocab_coverage_curve): fraction of all token occurrences covered "
    "by the N most frequent words at N ∈ {100, 500, 1000, 5000} — the "
    "diagnostic that decides tokenizer vocab size (coverage "
    "saturation) and flags noise/OCR-heavy corpora (flat curves). "
    "Frequency ranks come from the distributed global row-number "
    "(range-partitioned + broadcast prefix offsets — never the "
    "single-reducer global window; vocabulary reaches 100M+ types at "
    "web scale), coverage sums are one conditional-aggregate pass.",
)
def q_vocab_coverage_curve(spark, sf_dir):
    return tx.vocab_coverage_curve(_t(spark, sf_dir, "documents"), "text")


@_q(
    "cdc_chunked_documents",
    rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
  FROM documents WHERE trim(text) <> ''
),
b AS (
  SELECT doc_id, t, len(t) AS L,
         CASE WHEN len(t) >= 3 THEN
           list_filter(generate_series(3, len(t)),
                       i -> ({md5_long_sql("array_to_string(t[i-2:i], ' ')")}) % 16 = 0)
         ELSE [] END AS bp
  FROM toks
),
b2 AS (
  SELECT doc_id, t,
         CASE WHEN len(bp) > 0 AND bp[-1] = L THEN bp
              ELSE list_append(bp, L) END AS bounds
  FROM b
),
c AS (
  SELECT doc_id, t,
         unnest(list_transform(generate_series(1, len(bounds)),
                i -> struct_pack(ci := i - 1,
                                 s := CASE WHEN i = 1 THEN 1 ELSE bounds[i-1] + 1 END,
                                 e := bounds[i]))) AS ch
  FROM b2
)
SELECT doc_id,
       CAST(ch.ci AS INT) AS chunk_idx,
       CAST(ch.s AS INT) AS start_tok,
       CAST(ch.e AS INT) AS end_tok,
       CAST(ch.e - ch.s + 1 AS INT) AS n_tokens,
       md5(array_to_string(t[CAST(ch.s AS INT):CAST(ch.e AS INT)], ' ')) AS chunk_hash
FROM c
""",
    doc="Content-defined chunking (FastCDC/LBFS principle at token "
    "level; operators/textops.py:cdc_chunk_documents): boundaries "
    "where the rolling md5 of the trailing 3-gram ≡ 0 mod 16 — "
    "anchored to CONTENT, so one inserted token re-synchronizes "
    "within ~one chunk instead of shifting every later chunk "
    "(fixed-width chunking defeats chunk-level dedup/caching on any "
    "edit; chunked_documents is that baseline). Expected chunk ≈ 16 "
    "tokens, final boundary forced at doc end. Entirely map-side "
    "nested array transforms — ZERO shuffles, a pure scan→write at "
    "100 TB; per-chunk md5 makes the chunk relation directly "
    "exact-dedupable.",
)
def q_cdc_chunked_documents(spark, sf_dir):
    return tx.cdc_chunk_documents(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "prefix_jaccard_pairs",
    f"""
WITH {_SHINGLES_CTE},
ex AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s FROM sh
),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT doc_a, doc_b,
       round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) AS jaccard
FROM c
WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) >= 0.8
""",
    doc="EXACT Jaccard ≥ 0.8 via PREFIX FILTERING (PPJoin family, "
    "operators/dedup.py:prefix_filtered_jaccard_pairs): tokens "
    "globally ordered rarest-first; only each doc's first "
    "n−⌈t·n⌉+1 tokens (~20% at t=0.8) enter the self-join, and the "
    "hot boilerplate shingles that blow up the full shingle join sit "
    "at the END of every ordering — never join keys. LOSSLESS "
    "(oracle = the full exact-pairs SQL, identical output to "
    "ngram_jaccard_exact) with capped-variant-like candidate counts; "
    "prefix length and the t·max≤min length filter use exact integer "
    "arithmetic (a float ⌈0.8·n⌉ mis-rounds for some n and silently "
    "drops qualifying pairs). Exact array_intersect verify per "
    "candidate; slim prefix rows generate, arrays travel "
    "per-candidate only.",
)
def q_prefix_jaccard_pairs(spark, sf_dir):
    return dd.prefix_filtered_jaccard_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        n=3, threshold_num=4, threshold_den=5,
    )


@_q(
    "dedup_minhash_pairs",
    _minhash_oracle(k=12, bands=4, threshold=0.8),
    doc="MinHash(12) + LSH(4 bands × 3 rows) + exact-Jaccard verify — "
    "the scale path for near-dedup: candidates bounded by band "
    "collisions, not n².",
)
def q_dedup_minhash_pairs(spark, sf_dir):
    return dd.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=12, bands=4, threshold=0.8
    )


@_q(
    "simhash_signatures",
    f"WITH {_simhash_sig_sql()} SELECT doc_id, simhash FROM sig",
    doc=f"SimHash-{dd.SIMHASH_BITS} signatures: per-token md5 votes, map-side only.",
)
def q_simhash_signatures(spark, sf_dir):
    return dd.simhash(_t(spark, sf_dir, "documents"), "doc_id", "text").select(
        F.col("doc").alias("doc_id"), "simhash"
    )


@_q(
    "simhash_near_pairs",
    f"""
WITH {_simhash_sig_sql()}
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
""",
    doc="SimHash near-dup pairs via 7-band LSH with CORPUS-ADAPTIVE "
    "band width (round 6: fixed 256-bucket bands measured 25.3× time "
    "at 25× docs — adaptive_simhash_band_bits grows buckets/band with "
    "n, same integer rule as the embedding family's adaptive_lsh_"
    "bits; band COUNT stays 7 so the pigeonhole losslessness at "
    "hamming ≤ 6 is width-independent). At the fixtures' corpus sizes "
    "the rule instantiates 8-bit bands = the original 56-bit "
    "signature, which is exactly what this oracle unrolls; wider "
    "instantiations are pinned by tests/test_dedup.py's banded-vs-"
    "all-pairs equality and the 25× bench. The oracle is the *exact "
    "all-pairs* hamming query — the check covers recall, not just "
    "the banding replay.",
)
def q_simhash_near_pairs(spark, sf_dir):
    return dd.simhash_pairs(_t(spark, sf_dir, "documents"), "doc_id", "text", 6)


# --------------------------------------------------------------------------
# North-star: similarity search
# --------------------------------------------------------------------------

_EMB_DIM = 64


def _query_vec(spark, sf_dir) -> list[float] | None:
    """The fixture query vector (vec_id = 0), or None when it does not
    exist — the SQL oracles all derive the query via ``WITH q AS
    (SELECT ... WHERE vec_id = 0)`` and cross join it, so a missing
    query row means an EMPTY result in every consumer, never a crash
    (see _empty_if_no_query)."""
    row = (
        _t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return None if row is None else [float(x) for x in row[0]]


def _empty_if_no_query(emb: DataFrame, qv: list[float] | None):
    """Mirror the oracles' cross-join-with-q semantics when the query
    vector is absent: keep the relation's schema, drop every row, and
    substitute a harmless zero vector (never evaluated — no rows
    reach it)."""
    if qv is None:
        return emb.where(F.lit(False)), [0.0] * _EMB_DIM
    return emb, qv


@_q(
    "ann_topk_cosine",
    f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round({cosine_sql('embedding', 'qv', _EMB_DIM)}, 6) AS score
FROM embeddings, q
ORDER BY score DESC, vec_id
LIMIT 10
""",
    doc="Brute-force exact ANN baseline: map-side cosine vs a constant "
    "query vector + TakeOrderedAndProject (k-heap per partition, no "
    "global sort, no shuffle).",
)
def q_ann_topk_cosine(spark, sf_dir):
    emb, qv = _empty_if_no_query(
        _t(spark, sf_dir, "embeddings"), _query_vec(spark, sf_dir)
    )
    return sim.cosine_topk(emb, qv, k=10)


def _signlsh_adaptive_oracle(
    threshold: float,
    dim: int = _EMB_DIM,
    bands: int = 8,
    emb_rel: str = "embeddings",
    prelude: str = "",
) -> str:
    """DuckDB twin of similarity.cosine_neardup_pairs with the DEFAULT
    corpus-adaptive banding: bits-per-band is derived from count(*)
    with the same integer rule as similarity.adaptive_lsh_bits
    (smallest b in [2,12] with 128·2^b ≥ n), so both engines size the
    identical banding at any SF. Planes are emitted for the max width
    (bands·12) and sliced to the active prefix — hyperplanes() is
    prefix-stable, so the slice matches Spark's plane family exactly."""
    from .operators.similarity import LSH_MAX_BITS, LSH_TARGET_BUCKET

    max_planes = bands * LSH_MAX_BITS
    planes = sim.hyperplanes(max_planes, dim)
    planes_lit = ",\n    ".join(
        "[" + ", ".join(str(x) for x in pl) + "]" for pl in planes
    )
    bits_case = (
        "CASE "
        + " ".join(
            f"WHEN n <= {LSH_TARGET_BUCKET << b} THEN {b}"
            for b in range(2, LSH_MAX_BITS)
        )
        + f" ELSE {LSH_MAX_BITS} END"
    )
    cos = cosine_sql("ua", "ub", dim)
    return f"""
WITH {prelude}params AS (
  SELECT {bits_case} AS bits
  FROM (SELECT count(*) AS n FROM {emb_rel})
),
planes AS (SELECT [
    {planes_lit}
  ] AS P),
sgn AS (
  SELECT vec_id,
         list_transform(P[1 : {bands} * bits],
           pl -> CASE WHEN list_sum(list_transform(generate_series(1, {dim}),
                        i -> CAST(embedding[i] AS DOUBLE) * pl[i])) > 0
                 THEN 1 ELSE 0 END) AS sbits
  FROM {emb_rel}, planes, params
),
banded AS (
  SELECT vec_id, band_id,
         list_sum(list_transform(generate_series(1, bits),
           r -> sbits[band_id * bits + r] * (1 << (r - 1)))) AS bucket
  FROM sgn, params,
       (SELECT unnest(generate_series(0, {bands - 1})) AS band_id) bnd
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
),
pairs AS (
  SELECT id_a, id_b, ea.embedding AS ua, eb.embedding AS ub
  FROM cand
  JOIN {emb_rel} ea ON ea.vec_id = cand.id_a
  JOIN {emb_rel} eb ON eb.vec_id = cand.id_b
)
SELECT id_a, id_b, round({cos}, 6) AS score
FROM pairs WHERE round({cos}, 6) >= {threshold}
"""


def _signlsh_oracle(
    threshold: float, dim: int = _EMB_DIM, n_planes: int = 16, bands: int = 8
) -> str:
    """DuckDB twin of similarity.cosine_neardup_pairs — identical
    md5-derived hyperplanes, banding, and exact-cosine verify."""
    rows = n_planes // bands
    planes = sim.hyperplanes(n_planes, dim)
    bit_cols = ",\n         ".join(
        "CASE WHEN list_sum(list_transform(generate_series(1, %d), "
        "i -> CAST(embedding[i] AS DOUBLE) * ([%s])[i])) > 0 THEN 1 ELSE 0 END AS bit%d"
        % (dim, ", ".join(str(x) for x in planes[p]), p)
        for p in range(n_planes)
    )
    band_union = "\nUNION ALL\n".join(
        f"SELECT vec_id, embedding, {b} AS band_id, "
        + " + ".join(f"bit{b * rows + r} * {1 << r}" for r in range(rows))
        + " AS bucket FROM sgn"
        for b in range(bands)
    )
    cos = cosine_sql("ua", "ub", dim)
    return f"""
WITH sgn AS (
  SELECT vec_id, embedding,
         {bit_cols}
  FROM embeddings
),
banded AS ({band_union}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
                  a.embedding AS ua, b.embedding AS ub
  FROM banded a JOIN banded b
    ON a.band_id = b.band_id AND a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round({cos}, 6) AS score
FROM cand WHERE round({cos}, 6) >= {threshold}
"""


@_q(
    "embedding_neardup_pairs",
    _signlsh_adaptive_oracle(threshold=0.42),
    doc="Embedding-cosine near-dup pairs above threshold via sign-LSH "
    "bucketing + exact cosine verify — no cartesian/nested-loop join "
    "in the plan. Banding is CORPUS-ADAPTIVE (bits = smallest b with "
    "128·2^b ≥ n, 8 bands), so buckets per band grow with the corpus "
    "and candidate pairs stay ~O(n·128) instead of the fixed-width "
    "O(n²/2^bits); the oracle derives the identical bits from "
    "count(*) and replays identical md5 planes and banding.",
)
def q_embedding_neardup_pairs(spark, sf_dir):
    return sim.cosine_neardup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.42)


@_q(
    "embedding_neardup_fine",
    _signlsh_oracle(threshold=0.42, n_planes=32, bands=8),
    doc="Sign-LSH near-dup pairs with FINE banding (32 planes, 8 bands "
    "× 4 bits → 16 buckets/band vs the default's 4): bucket count per "
    "band is 2^bits and FIXED, so candidate pairs grow O(n²/2^bits) — "
    "the 5× scale bench measured the 2-bit default at 12.5× cost for "
    "5× vectors. Four bits cut per-bucket occupancy 4× (16× fewer "
    "candidate pairs) at the price of banding recall at low cosine "
    "(0.77 at 0.42; 0.98 at the ≥0.8 regime real dedup targets). "
    "Size bits ≈ log2(n/target_bucket_size) as the corpus grows.",
    scale_note="recall/parity baseline — fixed band width is "
    "superlinear (16.3× at 10× vectors); at scale use "
    "embedding_neardup_pairs (corpus-adaptive LSH bits) instead",
)
def q_embedding_neardup_fine(spark, sf_dir):
    return sim.cosine_neardup_pairs(
        _t(spark, sf_dir, "embeddings"), threshold=0.42, n_planes=32, bands=8
    )


# Shared PQ oracle CTE prefix (DuckDB): md5-seeded 16-entry codebook
# over 8 subspaces, per-(vector, subspace) nearest codeword. cb is
# MATERIALIZED — the ADC query references it twice and DuckDB inlines
# plain CTEs at every reference (the kcore lesson).
_PQ_CTES = f"""h AS (
  SELECT vec_id, embedding,
         {md5_long_sql("CAST(vec_id AS VARCHAR)")} AS hh
  FROM embeddings
),
seeds AS (
  SELECT embedding, CAST(row_number() OVER (ORDER BY hh, vec_id) - 1 AS INT) AS c
  FROM (SELECT * FROM h ORDER BY hh, vec_id LIMIT 16)
),
cb AS MATERIALIZED (
  SELECT c, j,
         list_transform(generate_series(j*8+1, j*8+8),
                        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS csv
  FROM seeds, (SELECT unnest(generate_series(0, 7)) AS j) g
),
vs AS (
  SELECT vec_id, j,
         list_transform(generate_series(j*8+1, j*8+8),
                        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS vsv
  FROM embeddings, (SELECT unnest(generate_series(0, 7)) AS j) g
),
d AS (
  SELECT vs.vec_id, vs.j, cb.c,
         list_sum(list_transform(generate_series(1, 8),
                  i -> (vsv[CAST(i AS INT)] - csv[CAST(i AS INT)])
                     * (vsv[CAST(i AS INT)] - csv[CAST(i AS INT)]))) AS d2
  FROM vs JOIN cb ON vs.j = cb.j
),
best AS (
  SELECT vec_id, j, c, d2,
         row_number() OVER (PARTITION BY vec_id, j ORDER BY d2, c) AS rn
  FROM d
)"""


@_q(
    "pq_encoded_embeddings",
    f"""
WITH {_PQ_CTES}
SELECT vec_id,
       string_agg(CAST(c AS VARCHAR), ',' ORDER BY j) AS codes,
       round(sqrt(list_sum(list(d2 ORDER BY j))), 6) AS recon_err
FROM best WHERE rn = 1
GROUP BY vec_id
""",
    doc="Product-quantization encode (Jégou et al. PAMI'11; operators/"
    "similarity.py:pq_encode): 8 subspaces × 16-codeword codebooks → "
    "4-bit codes, a 64× memory shrink for billion-scale ANN. Codebook "
    "= the 16 smallest-md5(vec_id) corpus vectors (the deterministic "
    "uniform sample a per-subspace k-means would start from; "
    "kmeans_centroids is the refinement path). Distances fold "
    "left-to-right over fixed component order and per-id errors over "
    "a j-sorted array — never a shuffle-ordered float sum, so "
    "recon_err is bit-stable across engines/partitionings. Plan: m·k "
    "codebook rows broadcast onto the n·m exploded subvectors (n·m·k "
    "distance rows is PQ's inherent encode cost), ONE groupBy fold.",
)
def q_pq_encoded_embeddings(spark, sf_dir):
    return sim.pq_encode(_t(spark, sf_dir, "embeddings"))


@_q(
    "pq_adc_topk",
    f"""
WITH {_PQ_CTES},
qs AS (
  SELECT j,
         list_transform(generate_series(j*8+1, j*8+8),
                        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS qsv
  FROM embeddings, (SELECT unnest(generate_series(0, 7)) AS j) g
  WHERE vec_id = 0
),
lut AS (
  SELECT cb.j, cb.c,
         list_sum(list_transform(generate_series(1, 8),
                  i -> (qsv[CAST(i AS INT)] - csv[CAST(i AS INT)])
                     * (qsv[CAST(i AS INT)] - csv[CAST(i AS INT)]))) AS qd2
  FROM qs JOIN cb ON qs.j = cb.j
),
codes AS (SELECT vec_id, j, c FROM best WHERE rn = 1)
SELECT vec_id,
       round(list_sum(list(qd2 ORDER BY codes.j)), 6) AS adc_d2
FROM codes JOIN lut ON codes.j = lut.j AND codes.c = lut.c
GROUP BY vec_id
ORDER BY adc_d2, vec_id
LIMIT 10
""",
    doc="PQ asymmetric-distance top-k (Jégou et al. PAMI'11 §IV; "
    "operators/similarity.py:pq_adc_topk) — the serving scan product "
    "quantization exists for: query at full precision, corpus as "
    "m-byte codes, each candidate scored by summing m lookup-table "
    "entries (128-row LUT broadcast; the (j, code) equi-join + fold "
    "does NO per-candidate vector arithmetic). Distance folds over "
    "j-sorted arrays, top-k via TakeOrderedAndProject with id "
    "tiebreak; query row ranks first at ≈ its recon error — the "
    "compute-side 64× shrink that pairs with pq_encoded_embeddings' "
    "memory shrink.",
)
def q_pq_adc_topk(spark, sf_dir):
    return sim.pq_adc_topk(_t(spark, sf_dir, "embeddings"), query_id=0)


@_q(
    "pq_recall_eval",
    f"""
WITH {_PQ_CTES},
qs AS (
  SELECT vec_id AS qid, j,
         list_transform(generate_series(j*8+1, j*8+8),
                        i -> CAST(embedding[CAST(i AS INT)] AS DOUBLE)) AS qsv
  FROM embeddings, (SELECT unnest(generate_series(0, 7)) AS j) g
  WHERE vec_id IN (0, 1, 2)
),
lut AS (
  SELECT qid, cb.j, cb.c,
         list_sum(list_transform(generate_series(1, 8),
                  i -> (qsv[CAST(i AS INT)] - csv[CAST(i AS INT)])
                     * (qsv[CAST(i AS INT)] - csv[CAST(i AS INT)]))) AS qd2
  FROM qs JOIN cb ON qs.j = cb.j
),
codes AS (SELECT vec_id, j, c FROM best WHERE rn = 1),
adc AS (
  SELECT qid, vec_id,
         round(list_sum(list(qd2 ORDER BY codes.j)), 6) AS adc_d2
  FROM codes JOIN lut ON codes.j = lut.j AND codes.c = lut.c
  GROUP BY qid, vec_id
),
atop AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY adc_d2, vec_id) AS arn
    FROM adc
  ) WHERE arn <= 10
),
qv AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings
  WHERE vec_id IN (0, 1, 2)
),
exd AS (
  SELECT q.qid, e.vec_id,
         round(list_sum(list_transform(generate_series(1, 64),
               i -> (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                     - CAST(q.qvec[CAST(i AS INT)] AS DOUBLE))
                  * (CAST(e.embedding[CAST(i AS INT)] AS DOUBLE)
                     - CAST(q.qvec[CAST(i AS INT)] AS DOUBLE)))), 6) AS d2
  FROM embeddings e, qv q
),
ex AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid ORDER BY d2, vec_id) AS ern
    FROM exd
  ) WHERE ern <= 10
),
hits AS (
  SELECT a.qid, count(*) AS n
  FROM atop a JOIN ex ON a.qid = ex.qid AND a.vec_id = ex.vec_id
  GROUP BY a.qid
)
SELECT q.qid, CAST(coalesce(n, 0) AS INT) AS n_hits,
       round(coalesce(n, 0) / 10.0, 6) AS recall_at_10
FROM qv q LEFT JOIN hits ON q.qid = hits.qid
""",
    doc="Recall@10 of PQ/ADC search vs the exact-L2 ground truth for "
    "3 query vectors (operators/similarity.py:pq_recall_eval) — the "
    "number an index owner tunes m/k_codes against; ann_recall_eval's "
    "PQ twin (on this unit-normalized corpus exact-L2 and "
    "exact-cosine rankings coincide). Batch ADC: |Q|·128-row LUT "
    "broadcast, ONE code-relation join, per-query row_number heap; "
    "ground truth one broadcast corpus pass; intersection a (qid, id) "
    "equi-join. Distance folds left-to-right over fixed component "
    "order on both engines.",
)
def q_pq_recall_eval(spark, sf_dir):
    return sim.pq_recall_eval(_t(spark, sf_dir, "embeddings"), [0, 1, 2])


@_q(
    "ann_topk_batch",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id IN (0, 1, 2)
),
scored AS (
  SELECT q.qid, e.vec_id,
         round({cosine_sql('e.embedding', 'q.qv', _EMB_DIM)}, 6) AS score
  FROM embeddings e, q
)
SELECT qid, vec_id, score FROM (
  SELECT qid, vec_id, score,
         row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS rn
  FROM scored
) WHERE rn <= 5
""",
    doc="Batch ANN serving: top-5 neighbors for every query vector in "
    "one corpus pass — broadcast query set + per-query row_number "
    "window (the queries ≪ corpus serving shape).",
)
def q_ann_topk_batch(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qset = emb.filter(F.col("vec_id").isin(0, 1, 2)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return sim.cosine_topk_batch(emb, qset, k=5)


@_q(
    "ann_ivf_topk",
    f"""
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
cent AS (
  SELECT label AS cell, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
  GROUP BY 1, 2
),
cvec AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM cent GROUP BY cell
),
probe AS (
  SELECT cell FROM cvec, q
  ORDER BY {cosine_sql('centroid', 'qv', _EMB_DIM)} DESC, cell
  LIMIT 2
)
SELECT vec_id, round({cosine_sql('embedding', 'qv', _EMB_DIM)}, 6) AS score
FROM embeddings, probe, q
WHERE label = probe.cell
ORDER BY score DESC, vec_id
LIMIT 10
""",
    doc="IVF-style ANN: label-coarse centroids (means rounded to 6dp "
    "so both engines train identical centroids), probe the 2 nearest "
    "cells, exact cosine rerank inside — the pruned-scan scale path.",
)
def q_ann_ivf_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").withColumnRenamed("label", "cell")
    cents = sim.train_centroids_by_label(
        _t(spark, sf_dir, "embeddings"), "label", "embedding"
    )
    emb, qv = _empty_if_no_query(emb, _query_vec(spark, sf_dir))
    return sim.ivf_topk(emb, cents, qv, k=10, nprobe=2)


# --------------------------------------------------------------------------
# North-star: text analysis
# --------------------------------------------------------------------------


def _langid_oracle() -> str:
    langs = list(tx.LANG_STOPWORDS)
    score_cols = []
    for lang, sw in tx.LANG_STOPWORDS.items():
        inlist = ", ".join(f"'{w}'" for w in sw)
        score_cols.append(
            f"CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),"
            f" t -> t IN ({inlist}))) AS INT) AS s_{lang}"
        )
    cases = []
    for i, lang in enumerate(langs):
        others = langs[i + 1 :]
        if others:
            cond = " AND ".join(f"s_{lang} >= s_{o}" for o in others)
            cases.append(f"WHEN {cond} THEN '{lang}'")
        else:
            cases.append(f"ELSE '{lang}'")
    case_sql = "CASE " + " ".join(cases) + " END"
    scores = ",\n       ".join(score_cols)
    sel = ", ".join(f"s_{lang}" for lang in langs)
    return f"""
WITH scored AS (
  SELECT doc_id,
       {scores}
  FROM documents
)
SELECT doc_id, {sel}, {case_sql} AS lang_pred FROM scored
"""


@_q(
    "lang_id_docs",
    _langid_oracle(),
    doc="Stopword-overlap language ID (deterministic CASE argmax).",
)
def q_lang_id_docs(spark, sf_dir):
    return tx.lang_id(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "quality_scores",
    f"""
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS INT) AS n_stop
  FROM documents
)
SELECT doc_id, n_chars, n_tokens,
       CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END AS punct_ratio,
       round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
       round(CAST(n_chars - (n_tokens - 1) AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS mean_token_len,
       round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
             + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
             + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
             6) AS quality_score
FROM base
""",
    doc="Heuristic quality features + composite score (length/punct/"
    "stopword ratios).",
)
def q_quality_scores(spark, sf_dir):
    return tx.quality_features(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "adaptive_quality_survivors",
    f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS INT) AS n_stop
  FROM documents
),
scored AS (
  SELECT doc_id, source,
         round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
               + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
               6) AS quality_score
  FROM base
),
thr AS (
  SELECT source, quantile_cont(quality_score, 0.25) AS t
  FROM scored GROUP BY source
)
SELECT s.doc_id, s.source, s.quality_score
FROM scored s JOIN thr ON s.source = thr.source
WHERE s.quality_score >= thr.t
""",
    doc="Per-source adaptive quality gate (operators/textops.py:"
    "adaptive_quality_filter): keep docs at or above their OWN "
    "source's p25 composite quality — a global cutoff either guts "
    "clean sources or waves noisy ones through, since quality "
    "distributions differ per crawl/dump. Scored relation persisted "
    "(feeds threshold agg AND final join — one regex scan, not two); "
    "thresholds are one bounded row per source, broadcast back; "
    "filter map-side. Exact per-source percentile here for the "
    "oracle; percentile_approx is the 100 TB path.",
)
def q_adaptive_quality_survivors(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return tx.adaptive_quality_filter(d, "doc_id", "source", "text", p=0.25)


@_q(
    "token_stats",
    f"""
SELECT doc_id,
       CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '{tx.BPE_ISH_PATTERN}')) AS INT) AS bpe_ish_tokens
FROM documents
""",
    doc="Token counting: whitespace + BPE-ish regex proxy, one "
    "vectorized pass.",
)
def q_token_stats(spark, sf_dir):
    return tx.token_stats(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "tokenizer_fertility_by_source",
    f"""
WITH t AS (
  SELECT source,
         strlen(text) AS n_chars,
         len(string_split_regex(trim(lower(text)), '\\s+')) AS ws,
         len(regexp_extract_all(lower(text), '{tx.BPE_ISH_PATTERN}')) AS bp
  FROM documents
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(sum(ws) AS BIGINT) AS ws_tokens,
       CAST(sum(bp) AS BIGINT) AS bpe_ish_tokens,
       round(CAST(sum(n_chars) AS DOUBLE) / CAST(sum(bp) AS DOUBLE), 6)
         AS chars_per_token,
       round(CAST(sum(bp) AS DOUBLE) / CAST(sum(ws) AS DOUBLE), 6)
         AS fertility
FROM t GROUP BY source ORDER BY source
""",
    doc="Tokenizer fertility / compression audit per source — the two "
    "numbers a tokenizer review reads per corpus slice: compression "
    "(chars per subword token; low = the tokenizer fragments this "
    "source, e.g. code or non-Latin text under an English-heavy "
    "vocab) and fertility (subword tokens per whitespace word; high "
    "= words split into many pieces, inflating sequence length and "
    "training cost for the same content). Uses the BPE-ish regex "
    "proxy (alpha runs + digits + punctuation marks) as the subword "
    "stand-in over the per-doc relation — one map-side-combinable "
    "groupBy over a two-column projection, linear at any corpus "
    "size. The per-source fertility gap is the data-mixture cost "
    "adjustment (tokens-per-byte varies by source; budgeting in "
    "bytes alone misallocates).",
)
def q_tokenizer_fertility_by_source(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.length("text").alias("n_chars"),
        tx.token_count(F.col("text")).alias("ws"),
        tx.bpe_ish_count(F.col("text")).alias("bp"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
            F.sum("ws").cast("long").alias("ws_tokens"),
            F.sum("bp").cast("long").alias("bpe_ish_tokens"),
        )
        .select(
            "source",
            "n_docs",
            "total_chars",
            "ws_tokens",
            "bpe_ish_tokens",
            F.round(
                F.col("total_chars").cast("double")
                / F.col("bpe_ish_tokens").cast("double"),
                6,
            ).alias("chars_per_token"),
            F.round(
                F.col("bpe_ish_tokens").cast("double")
                / F.col("ws_tokens").cast("double"),
                6,
            ).alias("fertility"),
        )
        .orderBy("source")
    )


@_q(
    "winnowing_fingerprints",
    f"""
WITH t AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
g AS (
  SELECT doc_id,
         CASE WHEN len(toks) >= 3 THEN
           list_transform(generate_series(1, len(toks) - 2),
                          i -> array_to_string(toks[i:i+2], ' '))
         ELSE [] END AS grams
  FROM t
),
h AS (
  SELECT doc_id, list_transform(grams, s -> {md5_long_sql('s')}) AS hs FROM g
)
SELECT doc_id,
       COALESCE(array_to_string(
         CASE WHEN len(hs) >= 4 THEN
                list_sort(list_distinct(list_transform(
                  generate_series(1, len(hs) - 3), i -> list_min(hs[i:i+3]))))
              WHEN len(hs) > 0 THEN [list_min(hs)]
              ELSE [] END, ','), '') AS fingerprints
FROM h
""",
    doc="Winnowing (rolling-hash) document fingerprints — SIGMOD'03 "
    "scheme: ordered k-gram hashes, per-window minima; shared "
    "substrings ≥ w+k-1 tokens always share a fingerprint. The "
    "already-sorted list is serialized to a CSV string so the "
    "harness canonicalizer can hash the row (arrays are unhashable "
    "in its pandas sort); `tx.winnow_fingerprints` itself keeps the "
    "typed array<long> for API users.",
)
def q_winnowing_fingerprints(spark, sf_dir):
    out = tx.winnow_fingerprints(_t(spark, sf_dir, "documents"), "doc_id", "text")
    return out.select("doc_id", F.array_join("fingerprints", ",").alias("fingerprints"))


@_q(
    "top_words",
    """
SELECT w AS word, count(*) AS cnt
FROM (SELECT trim(unnest(string_split_regex(trim(lower(text)), '\\s+'))) AS w
      FROM documents)
WHERE w <> ''
GROUP BY w
ORDER BY cnt DESC, word
LIMIT 20
""",
    doc="Category-popularity word cloud shape (A4): explode tokens → "
    "count → top-k.",
)
def q_top_words(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        F.trim(F.lower(F.col("text"))).alias("text")
    )
    ex = cl.explode_csv(d, "text", "word", pattern=r"\s+")
    counts = agg.group_count(ex.select("word"), ["word"])
    return agg.top_k(counts, "cnt", 20, tiebreak=["word"])


@_q(
    "daily_events_gapfilled",
    """
WITH c AS (
  SELECT CAST(ts AS DATE) AS date, count(*) AS cnt FROM events GROUP BY 1
),
span AS (SELECT min(date) AS lo, max(date) AS hi FROM c),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS date
  FROM span
)
SELECT spine.date, coalesce(c.cnt, 0) AS cnt
FROM spine LEFT JOIN c ON spine.date = c.date
""",
    doc="Date-spine gap fill: days with zero events appear as 0 rows "
    "(a bare groupBy silently drops them) — spine generated "
    "distributedly from a 1-row span aggregate, no driver collect.",
)
def q_daily_events_gapfilled(spark, sf_dir):
    return ts_ops.daily_counts_gapfilled(_t(spark, sf_dir, "events"), "ts")


@_q(
    "event_value_histogram",
    """
SELECT CAST(floor(value / 10.0) AS BIGINT) AS bin,
       round(floor(value / 10.0) * 10.0, 6) AS bin_lo,
       round((floor(value / 10.0) + 1) * 10.0, 6) AS bin_hi,
       count(*) AS cnt
FROM events GROUP BY 1, 2, 3
""",
    doc="Fixed-width histogram over event values: floor-keyed single "
    "shuffle, occupied bins only.",
)
def q_event_value_histogram(spark, sf_dir):
    return ts_ops.value_histogram(_t(spark, sf_dir, "events"), "value", 10.0)


@_q(
    "price_quantiles_by_priority",
    """
SELECT o_orderpriority,
       round(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       round(quantile_cont(o_totalprice, 0.5), 6) AS p5,
       round(quantile_cont(o_totalprice, 0.75), 6) AS p75,
       round(quantile_cont(o_totalprice, 0.95), 6) AS p95
FROM orders GROUP BY 1
""",
    doc="Exact interpolated quantiles per group (percentile == "
    "quantile_cont, rounded 6dp); at true scale swap to "
    "percentile_approx (mergeable t-digest, no per-group sort).",
)
def q_price_quantiles_by_priority(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        *agg.exact_quantiles("o_totalprice", [0.25, 0.5, 0.75, 0.95])
    )


@_q(
    "order_price_percent_rank",
    """
SELECT o_orderkey,
       round(percent_rank() OVER (ORDER BY o_totalprice), 6) AS pr,
       round(cume_dist() OVER (ORDER BY o_totalprice), 6) AS cd
FROM orders
""",
    doc="Global percent_rank / cume_dist — rank values are "
    "tie-invariant (equal prices share a value), so the output is "
    "deterministic without a unique-key tiebreak. An unpartitioned "
    "window funnels through ONE reducer: this query is the exactness "
    "baseline; `order_price_rank_scalable` computes the identical "
    "numbers with the distributed count-below algorithm "
    "(windows.scalable_ranks) and is the 100 TB path.",
)
def q_order_price_percent_rank(spark, sf_dir):
    from pyspark.sql import Window

    w = Window.orderBy("o_totalprice")
    return _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


@_q(
    "order_price_rank_scalable",
    """
SELECT o_orderkey, o_totalprice,
       round(percent_rank() OVER (ORDER BY o_totalprice), 6) AS pr,
       round(cume_dist() OVER (ORDER BY o_totalprice), 6) AS cd,
       CAST(ntile(4) OVER (ORDER BY o_totalprice, o_orderkey) AS INT) AS quartile
FROM orders
""",
    doc="Scale path for global ranking: exact percent_rank / cume_dist "
    "/ ntile WITHOUT an unpartitioned window (the oracle uses one — "
    "DuckDB is the sequential yardstick). Distributed count-below: "
    "per-value hash agg → repartitionByRange over distinct values → "
    "per-range-partition cumulative (window PARTITIONED by pid) → "
    "bounded per-partition offset collect → broadcast join back. "
    "Every WindowExec in the plan is partitioned.",
)
def q_order_price_rank_scalable(spark, sf_dir):
    return win.scalable_ranks(
        _t(spark, sf_dir, "orders"), "o_totalprice", "o_orderkey", n_tiles=4
    )


@_q(
    "dq_orders_summary",
    """
SELECT count(*) AS n_rows,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_custkey,
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('F','O','P') OR o_orderstatus IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS bad_status,
       CAST(sum(CASE WHEN o_totalprice <= 0 OR o_totalprice IS NULL
                     THEN 1 ELSE 0 END) AS BIGINT) AS nonpositive_price,
       CAST(sum(CASE WHEN o_orderdate < DATE '1990-01-01'
                       OR o_orderdate > DATE '2000-01-01'
                       OR o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS date_out_of_range
FROM orders
""",
    doc="Declarative data-quality audit: every expectation a "
    "conditional count in ONE scan/one 1-row aggregate; scan pruned "
    "to the checked columns. NULL check results count as violations.",
)
def q_dq_orders_summary(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return dq.dq_summary(
        o,
        {
            "null_custkey": F.col("o_custkey").isNull(),
            "bad_status": ~F.col("o_orderstatus").isin("F", "O", "P"),
            "nonpositive_price": F.col("o_totalprice") <= 0,
            "date_out_of_range": (F.col("o_orderdate") < F.lit("1990-01-01").cast("date"))
            | (F.col("o_orderdate") > F.lit("2000-01-01").cast("date")),
        },
    )


_STATUSES = ["F", "O", "P"]

_PIVOT_WIDE_CTE = """wide AS (
  SELECT o_orderpriority,
         count(*) FILTER (WHERE o_orderstatus = 'F') AS cnt_f,
         count(*) FILTER (WHERE o_orderstatus = 'O') AS cnt_o,
         count(*) FILTER (WHERE o_orderstatus = 'P') AS cnt_p
  FROM orders GROUP BY 1
)"""


@_q(
    "orders_status_pivot",
    f"""
WITH {_PIVOT_WIDE_CTE}
SELECT o_orderpriority, cnt_f, cnt_o, cnt_p FROM wide
""",
    doc="Pivot: priority × status count matrix. Values list passed "
    "explicitly — implicit pivot runs a distinct-collect discovery "
    "scan before the real plan (a full extra pass at 100 TB).",
)
def q_orders_status_pivot(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    return agg.pivot_counts(o, "o_orderpriority", "o_orderstatus", _STATUSES)


@_q(
    "orders_status_unpivot",
    f"""
WITH {_PIVOT_WIDE_CTE}
SELECT o_orderpriority, 'F' AS status, cnt_f AS cnt FROM wide
UNION ALL SELECT o_orderpriority, 'O', cnt_o FROM wide
UNION ALL SELECT o_orderpriority, 'P', cnt_p FROM wide
""",
    doc="Unpivot/melt: the wide matrix back to long (priority, status, "
    "cnt) — round-trips pivot_counts through DataFrame.unpivot.",
)
def q_orders_status_unpivot(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderpriority", "o_orderstatus")
    wide = agg.pivot_counts(o, "o_orderpriority", "o_orderstatus", _STATUSES)
    return agg.unpivot_counts(wide, "o_orderpriority", _STATUSES)


@_q(
    "embedding_centroids",
    f"""
SELECT label AS cell, CAST(i - 1 AS INT) AS pos,
       round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
FROM embeddings, (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
GROUP BY 1, 2
""",
    doc="Per-label mean vectors (the IVF/k-means trainer output, "
    "flattened to (cell, pos, component)): posexplode → one shuffle of "
    "n·dim scalars → 6dp-rounded means reproducible across engines.",
)
def q_embedding_centroids(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    pos = emb.select(
        F.col("label").alias("cell"), F.posexplode("embedding").alias("pos", "x")
    )
    return pos.groupBy("cell", "pos").agg(
        F.round(F.avg(F.col("x").cast("double")), 6).alias("m")
    )


# --------------------------------------------------------------------------
# North-star: dedup clustering, sampling, curation, retrieval stats
# --------------------------------------------------------------------------


@_q(
    "dedup_clusters",
    f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) mp
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
)
SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
""",
    doc="Connected components over MinHash near-dup pairs: pairs alone "
    "can't pick survivors (A~B, B~C ⇒ {A,B,C} is ONE group) — hash-min "
    "label propagation labels every doc with its component's min id; "
    "oracle = exact reachability via recursive CTE, so the check "
    "covers the transitive closure, not a banding replay.",
)
def q_dedup_clusters(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(docs, "doc_id", "text", k=12, bands=4, threshold=0.8)
    return graph.dedup_clusters(docs, pairs)


@_q(
    "semantic_dedup_survivors",
    f"""
WITH RECURSIVE pairs AS (
  SELECT id_a, id_b FROM ({_signlsh_adaptive_oracle(threshold=0.42)}) sp
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
walk(node, label) AS (
  SELECT vec_id, vec_id FROM embeddings
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
),
clusters AS (
  SELECT node AS vec_id, min(label) AS cluster_id FROM walk GROUP BY node
)
SELECT cluster_id AS vec_id, count(*) AS n_members
FROM clusters GROUP BY cluster_id
""",
    doc="Semantic (embedding-space) dedup end to end: sign-LSH cosine "
    "near-dup pairs → connected components → min-id survivor per "
    "cluster with member count — the embedding twin of the MinHash "
    "dedup_clusters path, so a curation pipeline can dedup on meaning "
    "rather than surface text. Oracle = recursive-CTE reachability "
    "over the replayed LSH pairs (checks the transitive closure).",
)
def q_semantic_dedup_survivors(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    pairs = sim.cosine_neardup_pairs(emb, threshold=0.42)
    comp = graph.connected_components(pairs, "id_a", "id_b")
    clusters = (
        emb.select(F.col("vec_id"))
        .join(comp.withColumnRenamed("node", "vec_id"), "vec_id", "left")
        .select(
            "vec_id", F.coalesce("cluster", F.col("vec_id")).alias("cluster_id")
        )
    )
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(F.col("cluster_id").alias("vec_id"), "n_members")
    )


@_q(
    "shipping_priority_top10",
    """
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)))
            AS DOUBLE) AS revenue,
       o_orderdate
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < DATE '1995-03-15'
  AND l_shipdate  > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    doc="TPC-H Q3 shape (shipping priority): selective dim filter "
    "broadcast into a fact-fact join, decimal-exact revenue per order, "
    "global top-10 via TakeOrderedAndProject (no full sort). Both date "
    "predicates push to the scans.",
)
def q_shipping_priority_top10(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1995-03-15"
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    l = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1995-03-15"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o.join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey")),
               F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(agg.exact_sum(disc_price, "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@_q(
    "top_orders_with_ties",
    """
SELECT o_custkey, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         rank() OVER (PARTITION BY o_custkey
                      ORDER BY floor(o_totalprice / 10000) DESC) AS rk
  FROM orders
) WHERE rk <= 2
""",
    doc="rank()-based top-k per group KEEPING ties (vs row_number's "
    "arbitrary cut in top_n_per_group): orders bucketed to a coarse "
    "price band so genuine ties exist; every order in a tied band "
    "survives. One partitioned window — same single-shuffle shape.",
)
def q_top_orders_with_ties(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    band = F.floor(F.col("o_totalprice") / 10000)
    w = Window.partitionBy("o_custkey").orderBy(band.desc())
    return (
        o.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )


def _kmeans_cte_chain(k: int, iters: int) -> str:
    """CTE chain c0 → a1 → c1 → … → c{iters} replaying
    kmeans_centroids: fixed init (vec_id < k), per-iteration argmax
    assignment (rounded score, label-DESC tiebreak), rounded
    per-dimension means — the identical deterministic trajectory the
    Spark loop takes."""
    cos = cosine_sql("c.centroid", "e.embedding", _EMB_DIM)
    ctes = [f"""c0 AS (
  SELECT vec_id AS cell,
         list_transform(embedding, x -> CAST(x AS DOUBLE)) AS centroid
  FROM embeddings WHERE vec_id < {k}
)"""]
    for it in range(1, iters + 1):
        ctes.append(f"""a{it} AS (
  SELECT vec_id, cell AS label FROM (
    SELECT e.vec_id, c.cell,
           row_number() OVER (PARTITION BY e.vec_id
                              ORDER BY round({cos}, 6) DESC, c.cell DESC) AS rn
    FROM embeddings e, c{it - 1} c
  ) WHERE rn = 1
)""")
        ctes.append(f"""c{it} AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM (
    SELECT a.label AS cell, i AS pos,
           round(avg(CAST(e.embedding[i] AS DOUBLE)), 6) AS m
    FROM embeddings e JOIN a{it} a ON e.vec_id = a.vec_id,
         (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
    GROUP BY 1, 2
  ) t GROUP BY cell
)""")
    return ",".join(ctes)


def _kmeans_oracle(k: int = 4, iters: int = 2) -> str:
    cos = cosine_sql("c.centroid", "e.embedding", _EMB_DIM)
    return f"""WITH {_kmeans_cte_chain(k, iters)}
SELECT vec_id, cell AS label, s AS score FROM (
  SELECT e.vec_id, c.cell, round({cos}, 6) AS s,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos}, 6) DESC, c.cell DESC) AS rn
  FROM embeddings e, c{iters} c
) t WHERE rn = 1
"""


def _ivf_neardup_oracle(
    threshold: float, k_cells: int = 8, probes: int = 2, iters: int = 1
) -> str:
    cos = cosine_sql("c.centroid", "e.embedding", _EMB_DIM)
    vcos = cosine_sql("ea.embedding", "eb.embedding", _EMB_DIM)
    return f"""WITH {_kmeans_cte_chain(k_cells, iters)},
scored AS (
  SELECT e.vec_id, c.cell,
         row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY round({cos}, 6) DESC, c.cell DESC) AS rn
  FROM embeddings e, c{iters} c
),
probed AS (SELECT vec_id, cell FROM scored WHERE rn <= {probes}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM probed a JOIN probed b ON a.cell = b.cell AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, round({vcos}, 6) AS score
FROM cand
JOIN embeddings ea ON ea.vec_id = id_a
JOIN embeddings eb ON eb.vec_id = id_b
WHERE round({vcos}, 6) >= {threshold}
"""


@_q(
    "embedding_neardup_ivf",
    _ivf_neardup_oracle(threshold=0.42, k_cells=8, probes=2, iters=1),
    doc="Embedding near-dup pairs blocked by IVF cells — the bucketing "
    "whose cardinality grows with the corpus (k_cells ≈ n/target at "
    "scale), unlike sign-LSH's fixed 2^bits buckets whose candidate "
    "blowup the 5× bench measured. Spherical-k-means cells, top-2 "
    "multi-probe routing for boundary recall, exact-cosine verify; "
    "the oracle replays the identical deterministic training and "
    "routing.",
)
def q_embedding_neardup_ivf(spark, sf_dir):
    return sim.neardup_pairs_ivf(
        _t(spark, sf_dir, "embeddings"), threshold=0.42,
        k_cells=8, probes=2, iters=1,
    )


@_q(
    "kmeans_assignments",
    _kmeans_oracle(k=4, iters=2),
    doc="Spherical k-means, 2 Lloyd iterations (iterative ML in pure "
    "Catalyst): deterministic init (vec_id < k), broadcast-cross-join "
    "assignment with rounded-score/label-tiebreak argmax, rounded "
    "per-dimension means — every iteration replayable by a sequential "
    "engine, so the oracle follows the identical trajectory.",
)
def q_kmeans_assignments(spark, sf_dir):
    return sim.kmeans_spherical(
        _t(spark, sf_dir, "embeddings"), k=4, iters=2
    )


@_q(
    "dedup_clusters_star",
    f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) mp
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
)
SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
""",
    doc="Same clustering contract as dedup_clusters but via the "
    "alternating large-star/small-star algorithm (O(log d) rounds vs "
    "hash-min's d) — identical labels, so the identical recursive-CTE "
    "oracle verifies both implementations agree on the transitive "
    "closure.",
)
def q_dedup_clusters_star(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    )
    comp = graph.connected_components_star(pairs, "doc_a", "doc_b")
    return (
        docs.select(F.col("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id", F.coalesce("cluster", F.col("doc_id")).alias("cluster_id")
        )
    )


_SAMPLE_KEY_SQL = md5_long_sql("concat_ws('|', 'r2', CAST(doc_id AS VARCHAR))")


@_q(
    "sampled_documents",
    f"""
SELECT doc_id, lang, source
FROM documents
WHERE {_SAMPLE_KEY_SQL} % 10000 < 1000
""",
    doc="Deterministic 10% hash sample: rand() resamples per partition "
    "layout, a content-hash bucket selects the same rows on every "
    "engine/rerun/repartition — zero shuffle, pure map-side.",
)
def q_sampled_documents(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    return smp.hash_sample(d, "doc_id", 0.10, salt="r2")


@_q(
    "stratified_sample_by_lang",
    f"""
SELECT doc_id, lang
FROM documents
WHERE {_SAMPLE_KEY_SQL} % 10000 <
      CASE WHEN lang = 'en' THEN 500
           WHEN lang = 'zh' THEN 5000
           ELSE 2000 END
""",
    doc="Stratified hash sampling — per-language rates (downsample "
    "dominant en 5%, keep half of rare zh, 20% default): the corpus "
    "rebalancing move, still deterministic and map-side.",
)
def q_stratified_sample_by_lang(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return smp.stratified_hash_sample(
        d, "doc_id", "lang", {"en": 0.05, "zh": 0.5}, default_fraction=0.2, salt="r2"
    )


@_q(
    "tfidf_top_terms",
    """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM tok WHERE term <> '' GROUP BY 1, 2
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, term, tf, df,
         round(CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN dfreq USING (term), n
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS INT) AS rnk
  FROM scored
)
SELECT doc_id, term, tf, df, tfidf, rnk FROM ranked WHERE rnk <= 3
""",
    doc="Top-3 TF-IDF terms per doc: two slim groupBys (term-level "
    "relation never carries payloads) + window top-n; score rounded to "
    "6dp BEFORE ranking with a term tiebreak so both engines select "
    "the identical set.",
)
def q_tfidf_top_terms(spark, sf_dir):
    return tx.tfidf_top_terms(_t(spark, sf_dir, "documents"), "doc_id", "text", 3)


@_q(
    "scrub_pii_docs",
    f"""
SELECT doc_id,
       regexp_replace(regexp_replace(regexp_replace(text,
         '{tx.EMAIL_PATTERN}', '<EMAIL>', 'g'),
         '{tx.URL_PATTERN}', '<URL>', 'g'),
         '{tx.PHONE_PATTERN}', '<PHONE>', 'g') AS scrubbed_text,
       CAST(len(regexp_extract_all(text, '{tx.EMAIL_PATTERN}')) AS INT) AS n_emails,
       CAST(len(regexp_extract_all(text, '{tx.URL_PATTERN}')) AS INT) AS n_urls,
       CAST(len(regexp_extract_all(text, '{tx.PHONE_PATTERN}')) AS INT) AS n_phones
FROM documents
""",
    doc="PII scrub pass: emails/URLs/phone-ish spans → typed "
    "placeholders + per-kind counts; patterns restricted to the "
    "Java-regex ∩ RE2 dialect so the oracle replays them exactly.",
)
def q_scrub_pii_docs(spark, sf_dir):
    return tx.scrub_pii(_t(spark, sf_dir, "documents"), "doc_id", "text")


@_q(
    "inverted_postings",
    """
WITH tok AS (
  SELECT doc_id,
         unnest(list_distinct(string_split_regex(trim(lower(text)), '\\s+'))) AS term
  FROM documents
),
agg AS (
  SELECT term, count(*) AS df,
         (list_sort(list(doc_id)))[1:20] AS postings
  FROM tok WHERE term <> '' GROUP BY term
)
SELECT term, df, array_to_string(postings, ',') AS postings
FROM agg WHERE df >= 2
""",
    doc="Inverted-index posting lists: term → df + first 20 sorted doc "
    "ids; hapax tail dropped (min_df=2). Shuffle key is the term; "
    "payloads never move. Postings serialized to CSV for the harness "
    "canonicalizer; `tx.inverted_index` keeps the typed array.",
)
def q_inverted_postings(spark, sf_dir):
    out = tx.inverted_index(
        _t(spark, sf_dir, "documents"), "doc_id", "text", min_df=2, max_postings=20
    )
    return out.select("term", "df", F.array_join("postings", ",").alias("postings"))


# Shared curation-stage CTEs (DuckDB): the quality features and the
# fingerprint-dedup survivor set — consumed by both the survivor query
# (curated_documents) and the per-source funnel report.
_CURATE_Q_CTE = f"""q AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         round(least(CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                    t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS DOUBLE)
                 / CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS DOUBLE), 6) * 0.3
               + (1.0 - least(round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE), 6) * 10, 1.0)) * 0.2,
               6) AS quality_score
  FROM documents
)"""

_CURATE_KEEP_CTE = """keep AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
)"""


@_q(
    "curated_documents",
    f"""
WITH {_CURATE_Q_CTE},
{_CURATE_KEEP_CTE}
SELECT d.doc_id, d.lang, d.source, d.n_chars
FROM documents d
JOIN keep USING (doc_id)
JOIN q USING (doc_id)
WHERE q.quality_score >= 0.45 AND q.n_tokens BETWEEN 5 AND 5000
""",
    doc="End-to-end curation composite: fingerprint-dedup survivors ∩ "
    "quality threshold ∩ token-length bounds — the assembled "
    "training-data filter chain (dedup → quality → bounds) as one "
    "declarative plan.",
)
def q_curated_documents(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    q = tx.quality_features(docs, "doc_id", "text").filter(
        (F.col("quality_score") >= 0.45) & F.col("n_tokens").between(5, 5000)
    )
    keep = (
        tx.doc_fingerprints(docs, "doc_id", "text")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    return (
        docs.join(keep.select("doc_id"), "doc_id", "left_semi")
        .join(q.select("doc_id"), "doc_id", "left_semi")
        .select("doc_id", "lang", "source", "n_chars")
    )


# --------------------------------------------------------------------------
# North-star: multimodal plumbing — REAL pure-Python codecs (WAV / NPY)
# --------------------------------------------------------------------------
#
# The oracle side never touches bytes: it recomputes the container
# arithmetic (header layout, block alignment, chunk offsets) straight
# from the table columns. The Spark side synthesizes a spec-valid
# container and recovers the same numbers by PARSING THE BYTES — so a
# hash match proves the codec round-trips for real.
#
# Shared WAV layout math (multimodal.py:build_wav/parse_wav):
#   block_align = (1 + doc_id % 2) * 2        [16-bit PCM, 1-2 ch]
#   data_len    = ceil(strlen/ba) * ba        [zero-padded frames]
#   data_offset = 44, +30 when doc_id % 5 = 0 [LIST/INFO chunk]

_WAV_ORACLE_BASE = """
WITH m AS (
  SELECT doc_id,
         1 + doc_id % 2 AS ch,
         (1 + doc_id % 2) * 2 AS ba,
         CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
              ELSE 44100 END AS sr,
         CASE WHEN doc_id % 5 = 0 THEN 74 ELSE 44 END AS data_offset,
         strlen(text) AS sl
  FROM documents
),
w AS (
  SELECT doc_id, ch, ba, sr, data_offset,
         ((sl + ba - 1) // ba) AS n_samples,
         ((sl + ba - 1) // ba) * ba AS data_len
  FROM m
)
"""


@_q(
    "multimodal_decode_meta",
    _WAV_ORACLE_BASE + """
SELECT doc_id,
       CAST(data_offset + data_len AS INT) AS n_bytes,
       CAST(sr AS INT) AS sample_rate,
       CAST(ch AS INT) AS n_channels,
       CAST(n_samples AS INT) AS n_samples,
       CAST(n_samples * 1000 // sr AS INT) AS duration_ms
FROM w
""",
    doc="REAL container decode via Arrow mapInPandas: each row's text "
    "bytes are serialized into a spec-valid RIFF/WAVE file "
    "(multimodal.py:build_wav — rate/channels id-derived, every 5th "
    "row carries an extra LIST/INFO chunk), then parse_wav recovers "
    "sample rate, channels, sample count and duration from BYTES "
    "ALONE (struct.unpack chunk walk — no fixed-offset shortcut, the "
    "INFO rows would break one). The oracle recomputes the layout "
    "arithmetic independently, so a hash match proves the codec "
    "round-trips.",
)
def q_multimodal_decode_meta(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    return mm.decode_wav_meta(d)


@_q(
    "multimodal_bmp_decode",
    """
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(24 AS INT) AS bpp,
       CAST(((w * 3 + 3) // 4) * 4 AS INT) AS row_stride,
       CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS INT) AS n_bytes
FROM dims
""",
    doc="REAL image-container decode (multimodal.py:build_bmp / "
    "parse_bmp via Arrow mapInPandas): id-derived dimensions and "
    "formula pixels serialize into spec-valid 24-bit BMPs — "
    "BOTTOM-UP rows, 4-byte stride padding, the two traps a real BMP "
    "consumer must handle — then the parser recovers dimensions/"
    "stride/size from bytes alone. The oracle recomputes the layout "
    "arithmetic independently; a hash match proves the container "
    "round-trips. Completes the image modality next to WAV (audio) "
    "and NPY (tensor).",
)
def q_multimodal_bmp_decode(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    return mm.decode_bmp_meta(d)


@_q(
    "multimodal_bmp_resize",
    """
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
)
SELECT doc_id, CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
       md5(array_to_string(
         list_transform(generate_series(0, 191),
           k -> (doc_id * 31
                 + ((((k // 24) * h) // 8) * w * 3
                    + ((((k % 24) // 3) * w) // 8) * 3
                    + (k % 3)) * 7) % 256),
         ',')) AS px_md5
FROM dims
""",
    doc="REAL image resize (multimodal.py:resize_bmp_nearest): parse "
    "the BMP, reshape the decoded buffer to (h, w, 3) in numpy, "
    "nearest-neighbor index-sample to 8×8 (src = dst·src_dim // "
    "dst_dim — pure integer), digest the resized pixel sequence. The "
    "oracle replays the sampling arithmetic on the formula pixels "
    "WITHOUT touching bytes — so the hash only matches if the whole "
    "byte path (bottom-up un-flip, stride strip, reshape, resample) "
    "is exact. Pixels digest as a comma-joined int sequence, never a "
    "raw blob (byte-order/encoding-safe across engines).",
)
def q_multimodal_bmp_resize(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    return mm.resize_bmp_nearest(d, out_w=8, out_h=8)


def _dhash_luma_sql(y: str, x: str) -> str:
    """DuckDB fixed-point BT.601 luma of the formula pixel at (y, x)."""
    def px(c: int) -> str:
        return (
            f"((doc_id * 31 + (({y}) * w * 3 + ({x}) * 3 + {c}) * 7) % 256)"
        )

    return f"((77 * {px(0)} + 150 * {px(1)} + 29 * {px(2)}) // 256)"


_DHASH_SQL = (
    "CAST(list_sum(list_transform(generate_series(0, 55), k -> "
    "CASE WHEN "
    + _dhash_luma_sql("((k // 8) * h) // 7", "(((k % 8) + 1) * w) // 9")
    + " > "
    + _dhash_luma_sql("((k // 8) * h) // 7", "((k % 8) * w) // 9")
    + " THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)"
)


@_q(
    "image_dhash_fingerprints",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       {_DHASH_SQL} AS dhash
FROM dims ORDER BY doc_id
""",
    doc="Perceptual difference-hash from IMAGE BYTES "
    "(operators/multimodal.py:image_dhash): BMP parse -> fixed-point "
    "BT.601 integer luma -> nearest-neighbor 9x7 resample -> one bit "
    "per horizontal neighbor comparison, 56 bits packed into a "
    "non-negative long — the standard image near-dup fingerprint "
    "(LAION-style multimodal dedup). The oracle replays luma + "
    "resample + comparison arithmetic on the formula pixels WITHOUT "
    "touching bytes, so the hash only matches if the whole byte path "
    "(bottom-up un-flip, stride strip, reshape, channel order) is "
    "exact. One Arrow mapInPandas stage; all else is arithmetic.",
)
def q_image_dhash_fingerprints(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    return mm.image_dhash(d).orderBy("doc_id")


@_q(
    "image_neardup_pairs",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
sig AS (SELECT doc_id, {_DHASH_SQL} AS dhash FROM dims)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
ORDER BY doc_a, doc_b
""",
    doc="Near-duplicate IMAGE pairs (operators/multimodal.py:"
    "image_neardup_pairs): dHash signatures banded 7 x 8 bits — a "
    "pair within hamming <= 6 differs in at most 6 bands, so by "
    "pigeonhole it collides in at least one band: the banding is "
    "LOSSLESS for the verified radius, and the oracle is the EXACT "
    "all-pairs query (not a replay), so every sweep proves recall. "
    "Candidates bucket-join on (band_id, 8-bit key), verify via one "
    "codegen bit_count(xor); the fixture's formula images share a "
    "constant-shift structure that yields genuine near-dup structure "
    "(~1.5k pairs at 500 images). Extends the dedup tier to the "
    "multimodal column.",
    scale_note="fixed 8-bit bands = 256 buckets/band — occupancy grows "
    "~n/256 and the band self-join degrades toward n²/256 at corpus "
    "scale (the round-4 SimHash wall); at scale use "
    "image_neardup_pairs_mih (multi-index hashing, 16384 buckets/"
    "chunk), which emits the identical pair set",
)
def q_image_neardup_pairs(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.image_dhash(d)
    return mm.image_neardup_pairs(sigs).orderBy("doc_a", "doc_b")


@_q(
    "image_neardup_pairs_mih",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
sig AS (SELECT doc_id, {_DHASH_SQL} AS dhash FROM dims)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
ORDER BY doc_a, doc_b
""",
    doc="Near-duplicate IMAGE pairs by MULTI-INDEX HASHING (operators/"
    "multimodal.py:hamming_neardup_pairs_mih; Norouzi-Punjani-Fleet "
    "CVPR'12) — the scale path past image_neardup_pairs' fixed-band "
    "occupancy wall: 4 chunks × 14 bits = 16384 buckets per chunk "
    "(64× the 8-bit bands), with the lost radius recovered by probing "
    "every key within Hamming-ball radius floor(6/4)=1 of each probe "
    "chunk (15 keys/chunk) against exact index keys — lossless at "
    "radius 6 by pigeonhole. Shares the banding row's EXACT all-pairs "
    "oracle verbatim: every sweep proves the two variants emit the "
    "identical pair set while this one's bucket occupancy is 64× "
    "slimmer. The probe explode is a constant 60 rows/image vs the "
    "band join's 7 — a fixed row tax paid once for the selectivity.",
    scale_note="candidate volume for ANY lossless hamming-radius-6 "
    "bucketing is ~n²/2^chunk_bits, and 14-bit chunks are the MAX a "
    "56-bit code admits at this radius (ball ≤ 1 needs ≥ 4 chunks) — "
    "~7.5× under the 8-bit banding join but still quadratic; at "
    "corpus scale widen the CODE (e.g. 8×15 dHash = 120 bits → 7×17-"
    "bit exact bands, 131072 buckets) so bucket count grows with n, "
    "the IVF cells-∝-n discipline applied to hamming space",
)
def q_image_neardup_pairs_mih(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.image_dhash(d)
    return mm.hamming_neardup_pairs_mih(sigs).orderBy("doc_a", "doc_b")


@_q(
    "image_neardup_pairs_mih_r8",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
sig AS (SELECT doc_id, {_DHASH_SQL} AS dhash FROM dims)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 8
ORDER BY doc_a, doc_b
""",
    doc="MIH at Hamming radius 8 — the wider-radius envelope the "
    "round-11 implementation walled off with a ValueError: "
    "floor(8/4)=2 errors can land in EVERY 14-bit chunk, so the probe "
    "side now enumerates the full ball of radius 2 per chunk "
    "(1+14+C(14,2)=106 literal-mask keys/chunk, 424/image — static "
    "expressions, one explode) against exact index keys; lossless by "
    "the same pigeonhole (8 errors over 4 chunks ⇒ some chunk ≤ 2). "
    "The oracle is the EXACT all-pairs join at radius 8 — every sweep "
    "proves recall at the radius the old guard refused. An "
    "adversarial planted pair with exactly 2 errors per chunk (which "
    "radius-1 probing can never candidate) is pinned in "
    "tests/test_round12_ops.py.",
    scale_note="the ~n²/2^14 lossless-bucketing candidate law from "
    "image_neardup_pairs_mih applies unchanged, and radius 8 admits "
    "more TRUE pairs by definition; the 424-key probe explode is a "
    "constant row tax. At corpus scale widen the code (120-bit dHash "
    "→ 8×15-bit chunks keep ball ≤ 1 at radius 8) before widening "
    "the radius",
)
def q_image_neardup_pairs_mih_r8(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.image_dhash(d)
    return mm.hamming_neardup_pairs_mih(sigs, max_hamming=8).orderBy(
        "doc_a", "doc_b"
    )


_DHASH120_BIT = (
    "CASE WHEN "
    + _dhash_luma_sql("((k // 15) * h) // 8", "(((k % 15) + 1) * w) // 16")
    + " > "
    + _dhash_luma_sql("((k // 15) * h) // 8", "((k % 15) * w) // 16")
    + " THEN 1 ELSE 0 END"
)

_DHASH120_LO = (
    "CAST(list_sum(list_transform(generate_series(0, 59), k -> ("
    + _DHASH120_BIT
    + ") * (CAST(1 AS BIGINT) << CAST(k AS INT)))) AS BIGINT)"
)

_DHASH120_HI = (
    "CAST(list_sum(list_transform(generate_series(60, 119), k -> ("
    + _DHASH120_BIT
    + ") * (CAST(1 AS BIGINT) << CAST(k - 60 AS INT)))) AS BIGINT)"
)


@_q(
    "image_dhash_fingerprints_wide",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       {_DHASH120_HI} AS dh_hi,
       {_DHASH120_LO} AS dh_lo
FROM dims ORDER BY doc_id
""",
    doc="120-bit dHash split across two longs (operators/multimodal"
    ".py:image_dhash_wide) — the WIDER CODE the 56-bit rows' "
    "scale_notes name as the real scale fix: 8 rows × 15 neighbor "
    "comparisons on a (8, 16) luma resample, bits 0-59 in dh_lo and "
    "60-119 in dh_hi. The oracle replays the full luma + resample + "
    "comparison + two-long packing arithmetic on the formula pixels, "
    "so the hashes only match if the byte path AND the hi/lo split "
    "are exact. Same one-Arrow-pass shape as the 56-bit row.",
)
def q_image_dhash_fingerprints_wide(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    return mm.image_dhash_wide(d).orderBy("doc_id")


@_q(
    "image_neardup_pairs_wide",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
sig AS (
  SELECT doc_id, {_DHASH120_HI} AS hi, {_DHASH120_LO} AS lo FROM dims
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.hi, b.hi))
            + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 8
ORDER BY doc_a, doc_b
""",
    doc="Near-duplicate image pairs over the 120-BIT code (operators/"
    "multimodal.py:hamming_neardup_pairs_mih_wide) — the widen-the-"
    "code scale path, now implemented rather than only named in "
    "scale_notes: 8 × 15-bit chunks = 32768 buckets per chunk (2× "
    "the 56-bit code's 14-bit chunks), and ball radius stays ≤ 1 for "
    "every Hamming radius up to 15 (16 keys/chunk, 128 probe rows/"
    "item) where the 56-bit code needs ball-2 enumeration past "
    "radius 7. No chunk straddles the two longs (15 | 60); verify is "
    "bit_count(hi⊕hi) + bit_count(lo⊕lo) in codegen. The oracle is "
    "the EXACT all-pairs join at radius 8 over the replayed 120-bit "
    "formula hashes — recall proven per sweep, and radius-12 "
    "losslessness pinned in tests/test_round12_ops.py.",
    scale_note="candidate volume ~n²/2^15 per chunk-bucket law — 2× "
    "under the 56-bit MIH and 128× under the 8-bit banding; the "
    "probe explode is a constant 128 rows/image. This IS the "
    "widen-the-code path the 56-bit rows point to; past this, grow "
    "bits with log₂(n) (the IVF cells-∝-n discipline in hamming "
    "space)",
)
def q_image_neardup_pairs_wide(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.image_dhash_wide(d)
    return mm.hamming_neardup_pairs_mih_wide(sigs, max_hamming=8).orderBy(
        "doc_a", "doc_b"
    )


def _pcm_byte_sql(pos: str) -> str:
    """DuckDB byte of the WAV data chunk at 0-based ``pos``: the PCM
    body is the doc's ASCII text bytes plus zero padding."""
    return (
        f"(CASE WHEN ({pos}) < sl "
        f"THEN ord(substr(text, CAST(({pos}) + 1 AS INT), 1)) "
        f"ELSE 0 END)"
    )


_AFP_SQL = (
    "CAST(list_sum(list_transform(generate_series(0, 55), k -> "
    "CASE WHEN "
    + _pcm_byte_sql("((k + 1) * data_len) // 57")
    + " > "
    + _pcm_byte_sql("(k * data_len) // 57")
    + " THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)"
)


@_q(
    "audio_fingerprints",
    _WAV_ORACLE_BASE + f""",
t AS (
  SELECT w.doc_id, w.sr, w.n_samples, w.data_len, d.text,
         strlen(d.text) AS sl
  FROM w JOIN documents d USING (doc_id)
)
SELECT doc_id, CAST(sr AS INT) AS sample_rate,
       CAST(n_samples AS INT) AS n_samples,
       {_AFP_SQL} AS afp
FROM t ORDER BY doc_id
""",
    doc="Perceptual fingerprint from AUDIO bytes (operators/"
    "multimodal.py:audio_fingerprint) — the dHash trick on the PCM "
    "body: RIFF chunk walk, nearest-neighbor resample of the data "
    "chunk to 57 positions, one waveform-shape bit per neighbor "
    "comparison, 56 bits in a non-negative long. The oracle replays "
    "the byte arithmetic from the source text (the synthesized PCM "
    "body) WITHOUT touching bytes, so the hash only matches if the "
    "chunk walk, data offset, and block-align padding are exact. "
    "One Arrow mapInPandas stage.",
)
def q_audio_fingerprints(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    return mm.audio_fingerprint(d).orderBy("doc_id")


# Audio near-dup pairs reuse the image path's hash-agnostic joins
# over audio_fingerprint signatures. At the standard hamming<=6
# radius the fixture's synthesized PCM (document text bytes) has NO
# pairs (measured min pairwise hamming = 11 — insertions shift the
# sample alignment), so the r6 arm stays pinned by the planted-edit
# readback in tests/test_round10_ops.py instead of an empty registry
# row. The generic Hamming-ball enumeration (round 12) reaches radius
# 12 (ball 3 over 4x14-bit chunks, 1880 probe keys/item — under the
# 2048 fan-out cap), where the fixture DOES hold genuine pairs — that
# non-empty row follows.


@_q(
    "audio_neardup_pairs",
    _WAV_ORACLE_BASE + f""",
t AS (
  SELECT w.doc_id, w.data_len, d.text, strlen(d.text) AS sl
  FROM w JOIN documents d USING (doc_id)
),
sig AS (SELECT doc_id, {_AFP_SQL} AS afp FROM t)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.afp, b.afp)) <= 12
ORDER BY doc_a, doc_b
""",
    doc="Near-duplicate AUDIO pairs at Hamming radius 12 — the first "
    "NON-EMPTY audio arm (rounds 10-11 could only 0-prove the r6 "
    "radius: the fixture's min pairwise fingerprint distance is 11): "
    "ball radius floor(12/4)=3 over the 4×14-bit MIH chunks, 1880 "
    "literal-mask probe keys/item under the 2048 fan-out cap, "
    "exercising the generic multi-bit Hamming-ball enumeration at "
    "its widest shipped setting. The oracle is the EXACT all-pairs "
    "join over the replayed PCM fingerprint arithmetic, so the sweep "
    "proves pigeonhole losslessness at ball 3 on real data.",
    scale_note="radius 12 on a 56-bit code is a LOOSE gate (the "
    "candidate law ~n²/2^14 applies, and the 1880-key probe explode "
    "is a 32× row tax over radius 6) — the parity/eval setting; at "
    "corpus scale use the 120-bit wide code "
    "(image_neardup_pairs_wide's join), where radius 12 keeps ball "
    "≤ 1 and a 128-key probe",
)
def q_audio_neardup_pairs(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.audio_fingerprint(d).select(
        "doc_id", F.col("afp").alias("dhash")
    )
    return mm.hamming_neardup_pairs_mih(sigs, max_hamming=12).orderBy(
        "doc_a", "doc_b"
    )


@_q(
    "crossmodal_mismatch_pairs",
    f"""
WITH {_SHINGLES_CTE},
dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
isig AS (SELECT doc_id, {_DHASH_SQL} AS dhash FROM dims),
ip AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
  FROM isig a JOIN isig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
),
j AS (
  SELECT p.doc_a, p.doc_b, p.hamming,
         CASE WHEN len(sa.shingles) + len(sb.shingles)
                   - len(list_intersect(sa.shingles, sb.shingles)) = 0
              THEN 1.0
              ELSE round(
                CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / CAST(len(sa.shingles) + len(sb.shingles)
                       - len(list_intersect(sa.shingles, sb.shingles))
                       AS DOUBLE), 6)
         END AS jaccard
  FROM ip p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b
)
SELECT doc_a, doc_b, hamming, jaccard
FROM j WHERE jaccard < 0.5
ORDER BY doc_a, doc_b
""",
    doc="Cross-modal MISMATCH detection — image near-duplicates whose "
    "TEXT disagrees (exact 3-gram Jaccard < 0.5): the caption-swap / "
    "duplicated-asset-different-caption rows a multimodal curation "
    "pipeline quarantines, because near-identical images with "
    "conflicting captions poison contrastive training (the LAION-"
    "style image-text consistency sweep). Composes the production "
    "matchers: the MIH hamming<=6 image join supplies the pairs, the "
    "shared shingle relation supplies exact text Jaccard (empty-"
    "union pairs count as identical, never a divide-by-zero); both "
    "relations already verified standalone. One bucketed image join "
    "+ two doc-keyed shingle joins — the text relation shuffles "
    "only (doc, shingles).",
)
def q_crossmodal_mismatch_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = mm.hamming_neardup_pairs_mih(
        mm.image_dhash(mm.attach_bmp_payload(docs))
    )
    sh = dd.with_shingles(docs, "text", 3).select(
        F.col("doc_id").alias("doc"),
        F.size("shingles").alias("n_sh"),
        "shingles",
    )
    sa = sh.select(
        F.col("doc").alias("doc_a"),
        F.col("n_sh").alias("__na"),
        F.col("shingles").alias("__sh_a"),
    )
    sb = sh.select(
        F.col("doc").alias("doc_b"),
        F.col("n_sh").alias("__nb"),
        F.col("shingles").alias("__sh_b"),
    )
    inter = F.size(F.array_intersect("__sh_a", "__sh_b"))
    den = (F.col("__na") + F.col("__nb") - inter).cast("double")
    jac = F.when(den == 0, F.lit(1.0)).otherwise(
        F.round(inter.cast("double") / den, 6)
    )
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") < 0.5)
        .select("doc_a", "doc_b", "hamming", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


@_q(
    "length_bucketed_packing_stats",
    r"""
WITH t AS (
  SELECT doc_id,
         least(CAST(len(string_split_regex(trim(lower(text)), '\s+'))
                    AS INT), 128) AS eff_tok
  FROM documents
),
b AS (
  SELECT CAST(((eff_tok + 15) // 16) * 16 AS INT) AS bucket_cap,
         eff_tok
  FROM t
)
SELECT bucket_cap,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(eff_tok) AS BIGINT) AS sum_tokens,
       CAST(count(*) * bucket_cap AS BIGINT) AS padded_tokens,
       round(1.0 - CAST(sum(eff_tok) AS DOUBLE)
                   / CAST(count(*) * bucket_cap AS DOUBLE), 6)
         AS waste_frac,
       round(1.0 - CAST(sum(eff_tok) AS DOUBLE)
                   / CAST(count(*) * 128 AS DOUBLE), 6)
         AS naive_waste_frac
FROM b
GROUP BY bucket_cap
ORDER BY bucket_cap
""",
    doc="Length-bucketed batching eval — the padding-waste numbers "
    "that decide a training dataloader's bucketing strategy: docs "
    "clip to a 128-token context, bucket by 16-token steps, and each "
    "bucket reports the tokens actually carried vs the padded cost "
    "at its cap (waste_frac) next to the single-bucket baseline "
    "where every doc pads to the full context (naive_waste_frac — "
    "the per-bucket saving is the gap). One combinable groupBy over "
    "a two-column projection; the bucket key is pure arithmetic so "
    "the aggregate is map-side combinable at any corpus size.",
)
def q_length_bucketed_packing_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    eff = F.least(tx.token_count(F.col("text")), F.lit(128)).cast("int")
    cap = ((F.col("eff_tok") + 15) / 16).cast("int") * 16
    t = docs.select(eff.alias("eff_tok"))
    return (
        t.select("eff_tok", cap.cast("int").alias("bucket_cap"))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("eff_tok").cast("long").alias("sum_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "sum_tokens",
            (F.col("n_docs") * F.col("bucket_cap"))
            .cast("long")
            .alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.col("sum_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_cap")).cast("double"),
                6,
            ).alias("waste_frac"),
            F.round(
                F.lit(1.0)
                - F.col("sum_tokens").cast("double")
                / (F.col("n_docs") * 128).cast("double"),
                6,
            ).alias("naive_waste_frac"),
        )
        .orderBy("bucket_cap")
    )


@_q(
    "multimodal_frame_sample",
    _WAV_ORACLE_BASE + """,
f AS (
  SELECT doc_id, ba, data_offset,
         greatest(1, n_samples // 160) AS n_frames
  FROM w
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(data_offset + i * 160 * ba AS INT) AS frame_offset
FROM (SELECT doc_id, ba, data_offset,
             unnest(generate_series(0, n_frames - 1, 2)) AS i
      FROM f)
""",
    doc="Row-expanding frame sampler over REAL WAV containers (every "
    "2nd 160-sample analysis frame) via Arrow mapInPandas: "
    "frame_offset is the byte-accurate position data_offset + idx * "
    "160 * block_align, where data_offset comes from an actual chunk "
    "walk (it varies 44/74 across rows — the INFO-chunk rows prove "
    "the reader walks chunks rather than assuming the canonical "
    "44-byte header).",
)
def q_multimodal_frame_sample(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    return mm.sample_frames(d, stride=2)


def _vdhash_luma_sql(y: str, x: str) -> str:
    """DuckDB fixed-point BT.601 luma of the formula pixel at (y, x)
    of video frame ``f`` (the BMP formula plus the per-frame shift)."""
    def px(c: int) -> str:
        return (
            f"((doc_id * 31 + f * 13 + (({y}) * w * 3 + ({x}) * 3 + {c}) * 7)"
            " % 256)"
        )

    return f"((77 * {px(0)} + 150 * {px(1)} + 29 * {px(2)}) // 256)"


_VDHASH_SQL = (
    "CAST(list_sum(list_transform(generate_series(0, 55), k -> "
    "CASE WHEN "
    + _vdhash_luma_sql("((k // 8) * h) // 7", "(((k % 8) + 1) * w) // 9")
    + " > "
    + _vdhash_luma_sql("((k // 8) * h) // 7", "((k % 8) * w) // 9")
    + " THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)"
)

_VIDEO_SIG_CTE = """
vdims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h,
         2 + doc_id % 4 AS n_frames
  FROM documents
),
vsig AS (
  SELECT doc_id, CAST(f AS INT) AS frame_idx,
         CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         {dhash} AS dhash
  FROM (SELECT doc_id, w, h,
               unnest(generate_series(0, n_frames - 1, 2)) AS f
        FROM vdims)
)""".format(dhash=_VDHASH_SQL)


@_q(
    "multimodal_avi_decode",
    """
SELECT doc_id,
       CAST(8 + (doc_id % 5) * 4 AS INT) AS width,
       CAST(6 + (doc_id % 3) * 6 AS INT) AS height,
       CAST(2 + doc_id % 4 AS INT) AS n_frames,
       CAST(100000 AS INT) AS usec_per_frame,
       CAST(232 + 18 * (doc_id % 2) AS INT) AS first_frame_offset,
       CAST(224 + 18 * (doc_id % 2)
            + (2 + doc_id % 4)
              * (8 + ((8 + (doc_id % 5) * 4) * 3 + 3) // 4 * 4
                     * (6 + (doc_id % 3) * 6)) AS INT) AS n_bytes
FROM documents ORDER BY doc_id
""",
    doc="REAL video container decode (operators/multimodal.py:"
    "build_avi/parse_avi): a spec-valid uncompressed RIFF AVI — LIST "
    "hdrl {avih, LIST strl {strh, strf}} + LIST movi of '00db' DIB "
    "frames (bottom-up rows, 4-byte stride, the BMP traps per frame), "
    "odd ids carrying a JUNK chunk before movi so the frame offset "
    "varies (proves the reader walks chunks, the WAV INFO trick). The "
    "oracle recomputes the full container layout arithmetic — header "
    "sizes, stride, per-frame chunk bytes, JUNK displacement — so a "
    "hash match proves the writer AND the chunk-walking parser agree "
    "byte-for-byte. Closes the modality set: WAV audio, NPY tensor, "
    "BMP image, AVI video.",
)
def q_multimodal_avi_decode(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    return mm.decode_avi_meta(d).orderBy("doc_id")


@_q(
    "video_frame_fingerprints",
    f"""
WITH {_VIDEO_SIG_CTE}
SELECT doc_id, frame_idx, width, height, dhash
FROM vsig ORDER BY doc_id, frame_idx
""",
    doc="Frame-sampled perceptual fingerprints over REAL AVI "
    "containers (operators/multimodal.py:video_frame_fingerprints): "
    "RIFF chunk walk, every 2nd frame decoded (bottom-up un-flip + "
    "stride strip), per-frame dHash with the image tier's exact "
    "arithmetic (BT.601 integer luma, 9x7 nearest-neighbor resample, "
    "56 neighbor-comparison bits in a long). The oracle replays luma "
    "+ resample + comparison on the per-frame formula pixels WITHOUT "
    "touching bytes, so the hash only matches if the whole container "
    "path (movi offsets, JUNK displacement, DIB un-flip) is exact. "
    "Row-expanding mapInPandas (videos x frames/stride), the video "
    "member of the multimodal dedup tier.",
)
def q_video_frame_fingerprints(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    return mm.video_frame_fingerprints(d, stride=2).orderBy(
        "doc_id", "frame_idx"
    )


@_q(
    "video_neardup_pairs",
    f"""
WITH {_VIDEO_SIG_CTE}
SELECT a.doc_id AS video_a, b.doc_id AS video_b,
       CAST(count(*) AS INT) AS matched_frames,
       CAST(min(bit_count(xor(a.dhash, b.dhash))) AS INT) AS min_hamming
FROM vsig a
JOIN vsig b ON a.doc_id < b.doc_id AND a.frame_idx = b.frame_idx
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
GROUP BY 1, 2
HAVING count(*) >= 2
ORDER BY video_a, video_b
""",
    doc="Video-level near-duplicates (operators/multimodal.py:"
    "video_neardup_pairs): two videos match when >=2 ALIGNED sampled "
    "frames (same frame_idx) land within hamming 6 — frame matching "
    "reuses the scale-safe multi-index hashing join over a composite "
    "(video, frame) packed key (ONE bucketed join for the whole frame "
    "relation, no per-frame loop), then survivors aggregate per video "
    "pair. The oracle is the EXACT all-pairs frame join (recall "
    "proven per sweep, like image_neardup_pairs). Completes "
    "multimodal dedup across image, audio, and video columns.",
)
def q_video_neardup_pairs(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.video_frame_fingerprints(d, stride=2)
    return mm.video_neardup_pairs(sigs).orderBy("video_a", "video_b")


@_q(
    "video_neardup_pairs_offset",
    f"""
WITH {_VIDEO_SIG_CTE},
m AS (
  SELECT a.doc_id AS video_a, b.doc_id AS video_b,
         b.frame_idx - a.frame_idx AS idx_delta,
         bit_count(xor(a.dhash, b.dhash)) AS hamming
  FROM vsig a JOIN vsig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
),
pd AS (
  SELECT video_a, video_b, idx_delta,
         CAST(count(*) AS INT) AS matched_frames,
         CAST(min(hamming) AS INT) AS min_hamming
  FROM m GROUP BY 1, 2, 3
),
best AS (
  SELECT video_a, video_b, idx_delta, matched_frames, min_hamming,
         row_number() OVER (
           PARTITION BY video_a, video_b
           ORDER BY matched_frames DESC, abs(idx_delta) ASC,
                    idx_delta ASC) AS rk
  FROM pd
)
SELECT video_a, video_b, CAST(idx_delta AS INT) AS idx_delta,
       matched_frames, min_hamming
FROM best WHERE rk = 1 AND matched_frames >= 2
ORDER BY video_a, video_b
""",
    doc="OFFSET-TOLERANT video near-duplicates (operators/multimodal"
    ".py:video_neardup_pairs_offset) — the case the aligned matcher "
    "provably misses (pinned by a planted trimmed-clip pytest): a "
    "trimmed or padded clip shifts every frame index by a constant, "
    "so no frame pair shares an index. Alignment is recovered by "
    "VOTING: every cross-video frame match (the SAME one packed-key "
    "MIH join) casts a vote for its idx delta, and the modal delta — "
    "the alignment most frames agree on — wins with a deterministic "
    "tiebreak (most frames, smallest |delta|, smallest delta); "
    ">= 2 supporting frames accepts the pair. One extra combinable "
    "groupBy over the slim matched-frame relation; the oracle is the "
    "exact all-pairs frame join with the same delta-mode aggregate.",
)
def q_video_neardup_pairs_offset(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.video_frame_fingerprints(d, stride=2)
    return mm.video_neardup_pairs_offset(sigs).orderBy(
        "video_a", "video_b"
    )


@_q(
    "video_neardup_pairs_rate",
    f"""
WITH {_VIDEO_SIG_CTE},
m AS (
  SELECT a.doc_id AS video_a, b.doc_id AS video_b,
         a.frame_idx AS idx_a, b.frame_idx AS idx_b,
         bit_count(xor(a.dhash, b.dhash)) AS hamming
  FROM vsig a JOIN vsig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
),
hyp AS (SELECT * FROM (VALUES (1, 1), (1, 2), (2, 1))
        AS t(rate_num, rate_den)),
v AS (
  SELECT video_a, video_b, rate_num, rate_den,
         CAST(rate_den * idx_b - rate_num * idx_a AS INT) AS idx_shift,
         hamming
  FROM m CROSS JOIN hyp
),
pk AS (
  SELECT video_a, video_b, rate_num, rate_den, idx_shift,
         CAST(count(*) AS INT) AS matched_frames,
         CAST(min(hamming) AS INT) AS min_hamming
  FROM v GROUP BY 1, 2, 3, 4, 5
),
best AS (
  SELECT video_a, video_b, rate_num, rate_den, idx_shift,
         matched_frames, min_hamming,
         row_number() OVER (
           PARTITION BY video_a, video_b
           ORDER BY matched_frames DESC, rate_num * rate_den ASC,
                    rate_num ASC, abs(idx_shift) ASC, idx_shift ASC) AS rk
  FROM pk
)
SELECT video_a, video_b, rate_num, rate_den, idx_shift,
       matched_frames, min_hamming
FROM best WHERE rk = 1 AND matched_frames >= 2
ORDER BY video_a, video_b
""",
    doc="FRAME-RATE-CHANGE-tolerant video matching (operators/"
    "multimodal.py:video_neardup_pairs_rate) — closes the r12 "
    "verdict's honesty boundary on the video tier: a re-encode at a "
    "different rate is a LINEAR index map idx_b = (num/den)·idx_a + "
    "shift/den, whose per-pair deltas are all distinct, so modal-"
    "DELTA voting provably finds nothing (planted 2×-rate pytest). "
    "Each cross-video frame match (the SAME one packed-key MIH join) "
    "casts one vote per candidate rate for the invariant shift = "
    "den·idx_b − num·idx_a; under the true rate the shifts agree, "
    "under a wrong one they scatter — Hough-style voting over a "
    "BOUNDED hypothesis family {{identity, half, double}}, which is "
    "what keeps a 2-frame-consistent line from being findable for "
    "every pair. Identity in the family makes this a strict "
    "generalization of the offset matcher (a pure trim reports "
    "(1,1,delta)). Constant len(rates)× expansion of the slim "
    "matched-frame relation, two combinable groupBys, deterministic "
    "tiebreak (frames desc, simplest rate, smallest |shift|, "
    "smallest shift). Oracle = exact all-pairs frame join with the "
    "vote replayed in SQL.",
)
def q_video_neardup_pairs_rate(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.video_frame_fingerprints(d, stride=2)
    return mm.video_neardup_pairs_rate(sigs).orderBy("video_a", "video_b")


@_q(
    "multimodal_resize_meta",
    _WAV_ORACLE_BASE + """
SELECT doc_id,
       CAST(sr AS INT) AS sample_rate,
       CAST(n_samples AS INT) AS n_samples,
       CAST(least(sr, 16000) AS INT) AS out_rate,
       CAST((n_samples * least(sr, 16000)) // sr AS INT) AS out_samples
FROM w
""",
    doc="Resample planning over decoded audio metadata (clamp to 16 "
    "kHz, integer-exact sample scaling) — pure Catalyst over the "
    "mapInPandas decode stage; the resample kernel itself would slot "
    "into the same Arrow stage.",
)
def q_multimodal_resize_meta(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    return mm.resample_plan(mm.decode_wav_meta(d))


@_q(
    "multimodal_npy_decode",
    """
SELECT vec_id,
       '<f4' AS dtype,
       1 AS ndim,
       CAST(len(embedding) AS INT) AS n_elems,
       CAST(((10 + 56 + strlen(CAST(len(embedding) AS VARCHAR)) + 1 + 63)
             // 64) * 64 + 4 * len(embedding) AS INT) AS n_bytes,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val
FROM embeddings
""",
    doc="REAL numpy-format round-trip: each embedding's float32 bytes "
    "are wrapped in a spec-valid .npy v1.0 payload (multimodal.py:"
    "build_npy — np.load reads them), then parse_npy recovers dtype, "
    "shape, total size, and the FIRST FLOAT VALUE unpacked straight "
    "from the data section — matching it against the source array "
    "proves the parser located the 64-byte-aligned data offset "
    "correctly. Oracle recomputes the v1.0 header-length arithmetic "
    "(10-byte preamble + 56-char fixed dict + digits of n, padded to "
    "64).",
)
def q_multimodal_npy_decode(spark, sf_dir):
    d = mm.attach_npy_payload(_t(spark, sf_dir, "embeddings"))
    return mm.decode_npy_meta(d).withColumn(
        "first_val", F.round(F.col("first_val"), 6)
    )


# --------------------------------------------------------------------------
# Streaming-equivalent semantics (batch-checkable; true readStream is
# exercised in tests/test_streaming.py)
# --------------------------------------------------------------------------


@_q(
    "hourly_event_counts",
    """
SELECT date_trunc('hour', ts) AS win_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS win_end,
       count(*) AS cnt
FROM events GROUP BY 1, 2
""",
    doc="Tumbling event-time window (epoch-aligned) — same operator "
    "serves readStream with a watermark.",
)
def q_hourly_event_counts(spark, sf_dir):
    return sw.tumbling_counts(_t(spark, sf_dir, "events"), "ts", "1 hour")


@_q(
    "sliding_event_counts",
    """
WITH starts AS (
  SELECT time_bucket(INTERVAL '30 minutes', ts) AS s1,
         time_bucket(INTERVAL '30 minutes', ts) - INTERVAL 30 MINUTE AS s2
  FROM events
),
w AS (
  SELECT unnest([s1, s2]) AS win_start FROM starts
)
SELECT win_start, win_start + INTERVAL 1 HOUR AS win_end, count(*) AS cnt
FROM w GROUP BY 1, 2
""",
    doc="Sliding window (1h / 30m): each event lands in 2 windows.",
)
def q_sliding_event_counts(spark, sf_dir):
    return sw.sliding_counts(_t(spark, sf_dir, "events"), "ts", "1 hour", "30 minutes")


@_q(
    "user_sessions",
    """
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_sess
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  -- (ts, event_id), the SAME total order as flagged's window: with
  -- ts ties (two events in one instant) an ts-only ROWS cumsum can
  -- fold the tied rows' 1/0 flags in either order — one session or
  -- two, run-dependent (caught by the all-ties degenerate fixture).
  SELECT user_id, ts,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS sess_no
  FROM flagged
)
SELECT user_id, min(ts) AS sess_start, max(ts) + INTERVAL 30 MINUTE AS sess_end,
       count(*) AS cnt
FROM numbered GROUP BY user_id, sess_no
""",
    doc="Gap-based sessionization (session_window, 30 min gap) — the "
    "oracle replays it as a lag+cumsum islands query.",
)
def q_user_sessions(spark, sf_dir):
    return sw.session_counts(_t(spark, sf_dir, "events"), "ts", "30 minutes", ["user_id"])


# --------------------------------------------------------------------------
# Behavior analytics: funnel / cohort / transitions / decayed scoring
# --------------------------------------------------------------------------


@_q(
    "funnel_steps",
    """
WITH s1 AS (
  SELECT user_id AS u, min(ts) AS entry FROM events
  WHERE event_type = 'view' GROUP BY 1
),
s2 AS (
  SELECT e.user_id AS u, min(e.ts) AS entry
  FROM events e JOIN s1 ON e.user_id = s1.u
  WHERE e.event_type = 'click' AND e.ts >= s1.entry GROUP BY 1
),
s3 AS (
  SELECT e.user_id AS u, min(e.ts) AS entry
  FROM events e JOIN s2 ON e.user_id = s2.u
  WHERE e.event_type = 'purchase' AND e.ts >= s2.entry GROUP BY 1
)
SELECT 1 AS step_idx, 'view' AS step, count(*) AS users FROM s1
UNION ALL SELECT 2, 'click', count(*) FROM s2
UNION ALL SELECT 3, 'purchase', count(*) FROM s3
""",
    doc="Ordered funnel view→click→purchase: per-step min-entry chained "
    "on ts >= previous entry; each pass filters its event type before "
    "the per-user shuffle.",
)
def q_funnel_steps(spark, sf_dir):
    from .operators import behavior as bh

    return bh.funnel_counts(
        _t(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


@_q(
    "cohort_retention",
    """
WITH firsts AS (SELECT user_id AS u, min(ts) AS first_ts FROM events GROUP BY 1),
active AS (
  SELECT DISTINCT user_id AS u, date_trunc('week', ts) AS week FROM events
)
SELECT date_trunc('week', first_ts) AS cohort_week,
       CAST(date_diff('day', date_trunc('week', first_ts), week) / 7 AS INT)
         AS week_offset,
       count(DISTINCT u) AS users
FROM active JOIN firsts USING (u)
GROUP BY 1, 2
""",
    doc="Weekly cohort retention triangle: first-seen week × week "
    "offset × distinct returning users (Monday-truncated weeks agree "
    "between Spark and the oracle).",
)
def q_cohort_retention(spark, sf_dir):
    from .operators import behavior as bh

    return bh.cohort_retention(_t(spark, sf_dir, "events"))


@_q(
    "event_transitions",
    """
SELECT from_type, to_type, count(*) AS cnt FROM (
  SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS from_type,
         event_type AS to_type
  FROM events)
WHERE from_type IS NOT NULL
GROUP BY 1, 2
""",
    doc="First-order Markov transition counts per user in (ts, "
    "event_id) order — one user-keyed window shuffle, then a tiny "
    "(from, to) reduce.",
)
def q_event_transitions(spark, sf_dir):
    from .operators import behavior as bh

    return bh.event_transitions(_t(spark, sf_dir, "events"))


@_q(
    "decayed_user_scores",
    """
WITH now_t AS (SELECT max(ts) AS now_ts FROM events)
SELECT user_id,
       CAST(round(sum(CAST(round(
         value * pow(0.5,
           ((epoch_us(now_ts) - epoch_us(ts)) / 86400000000.0) / 7.0), 6)
         AS DECIMAL(38,10))), 6) AS DOUBLE) AS score
FROM events, now_t
GROUP BY 1
""",
    doc="Recency-decayed engagement score (7-day half-life) anchored "
    "at the corpus max ts; exact-microsecond ages, 6dp-rounded terms "
    "accumulated in DECIMAL for order-independence.",
)
def q_decayed_user_scores(spark, sf_dir):
    from .operators import behavior as bh

    return bh.decayed_user_score(_t(spark, sf_dir, "events"), halflife_days=7.0)


@_q(
    "quantized_embeddings",
    """
SELECT vec_id,
       CASE WHEN m > 0 THEN round(m / 127.0, 6) END AS scale,
       CASE WHEN m > 0 THEN
         array_to_string(
           list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / m) AS INT)),
           ',')
       END AS qvec
FROM (
  SELECT vec_id, embedding,
         list_aggregate(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))),
                        'max') AS m
  FROM embeddings
)
""",
    doc="Per-vector symmetric int8 quantization (q = round(x·127/max|x|)"
    ") — zero-shuffle map-side scan; pure IEEE arithmetic so both "
    "engines round the identical double. qvec serialized to CSV for "
    "the harness canonicalizer; `sim.quantize_embeddings` keeps the "
    "typed array<int>.",
)
def q_quantized_embeddings(spark, sf_dir):
    out = sim.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return out.select(
        "vec_id", "scale", F.array_join("qvec", ",").alias("qvec")
    )


@_q(
    "doc_repetition_stats",
    """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
w AS (SELECT doc_id, unnest(t) AS w FROM toks),
wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
wd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_words,
              CAST(count(*) AS BIGINT) AS n_distinct, max(c) AS top_w
       FROM wc GROUP BY 1),
bg AS (SELECT doc_id,
              unnest(CASE WHEN len(t) >= 2 THEN
                list_transform(generate_series(1, len(t) - 1),
                               i -> array_to_string(t[i:i+1], ' '))
              ELSE [] END) AS g
       FROM toks),
bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
bd AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bi, max(c) AS top_bi
       FROM bc GROUP BY 1)
SELECT wd.doc_id, n_words,
       round(1 - CAST(n_distinct AS DOUBLE) / n_words, 6) AS dup_word_frac,
       round(CAST(top_w AS DOUBLE) / n_words, 6) AS top_word_frac,
       round(CAST(top_bi AS DOUBLE) / n_bi, 6) AS top_bigram_frac
FROM wd LEFT JOIN bd ON wd.doc_id = bd.doc_id
""",
    doc="Gopher-style repetition quality gates: duplicate-word / "
    "top-word / top-bigram fractions per doc; bigrams built map-side, "
    "reduces keyed on well-spread (doc, gram).",
)
def q_doc_repetition_stats(spark, sf_dir):
    return tx.repetition_stats(_t(spark, sf_dir, "documents"))


@_q(
    "decontaminated_docs",
    """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
sh AS (SELECT doc_id, CASE WHEN len(t) >= 4 THEN
         list_distinct(list_transform(generate_series(1, len(t) - 3),
                                      i -> array_to_string(t[i:i+3], ' ')))
       ELSE [] END AS shingles FROM toks),
ev AS (SELECT DISTINCT unnest(shingles) AS s FROM sh WHERE doc_id % 97 = 0),
hits AS (SELECT DISTINCT c.doc_id
         FROM (SELECT doc_id, unnest(shingles) AS s FROM sh
               WHERE doc_id % 97 <> 0) c
         JOIN ev USING (s))
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d
WHERE d.doc_id % 97 <> 0 AND d.doc_id NOT IN (SELECT doc_id FROM hits)
""",
    doc="Benchmark decontamination: corpus docs sharing any word 4-gram "
    "with the held-out eval split (doc_id % 97 = 0) are dropped; eval "
    "shingles broadcast, anti-join carries only hit ids.",
)
def q_decontaminated_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    return dd.decontaminate(corpus, ev, n=4).select("doc_id", "lang", "n_chars")


_PACK_SHARD_SQL = md5_long_sql("concat_ws('|', 'pack', CAST(doc_id AS VARCHAR))")
_SPLIT_KEY_SQL = md5_long_sql("concat_ws('|', 'split', CAST(doc_id AS VARCHAR))")


@_q(
    "packed_sequences",
    f"""
WITH t AS (
  SELECT doc_id,
         CAST({_PACK_SHARD_SQL} % 8 AS INT) AS shard,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens
  FROM documents
),
r AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, shard, n_tokens, start_offset,
       start_offset // 512 AS pack_id
FROM r
""",
    doc="GPT-style concat-and-chop sequence packing: hash-sharded "
    "deterministic order, per-shard running token offset, 512-token "
    "cut points — one balanced window shuffle.",
)
def q_packed_sequences(spark, sf_dir):
    from .operators import packing as pk

    return pk.pack_sequences(_t(spark, sf_dir, "documents"), seq_len=512, n_shards=8)


_LBPACK_SHARD_SQL = md5_long_sql(
    "concat_ws('|', 'lbpack', CAST(doc_id AS VARCHAR))"
)


# Shared length-bucketed packing-assignment CTEs (DuckDB) — consumed by
# the assignment row itself AND the boundary-loss eval so the two
# oracles can never drift from one algebra.
_LBPACK_CTES = f"""t AS (
  SELECT doc_id,
         CAST({_LBPACK_SHARD_SQL} % 8 AS INT) AS shard,
         least(CAST(len(string_split_regex(trim(lower(text)), '\\s+'))
                    AS INT), 128) AS eff_tok
  FROM documents
),
b AS (
  SELECT doc_id, shard, eff_tok,
         CAST(((eff_tok + 15) // 16) * 16 AS INT) AS bucket_cap
  FROM t
),
r AS (
  SELECT doc_id, eff_tok, bucket_cap, shard,
         row_number() OVER (PARTITION BY bucket_cap, shard
                            ORDER BY eff_tok DESC, doc_id ASC) - 1 AS rk
  FROM b
),
a AS (
  SELECT doc_id, eff_tok, bucket_cap, shard,
         rk // (128 // bucket_cap) AS pack_seq,
         CAST(rk % (128 // bucket_cap) AS INT) AS position
  FROM r
),
p AS (
  SELECT doc_id, eff_tok, bucket_cap, shard, position,
         (CAST(bucket_cap // 16 AS BIGINT) << 50)
           | (CAST(shard AS BIGINT) << 40) | pack_seq AS pack_id
  FROM a
)"""


@_q(
    "packed_assignments",
    f"""
WITH {_LBPACK_CTES}
SELECT doc_id, eff_tok, bucket_cap, shard, pack_id, position,
       round(CAST(sum(eff_tok) OVER (PARTITION BY pack_id) AS DOUBLE)
             / 128.0, 6) AS pack_fill
FROM p
""",
    doc="The packing ASSIGNMENT operator (verdict r12 item #3 — the "
    "span-stats → span-surgery move applied to the packing tier): "
    "length_bucketed_packing_stats reports what bucketing WOULD save; "
    "this row emits the concrete (doc_id → pack_id, position, "
    "pack_fill) a dataloader consumes. First-fit-decreasing within "
    "bucket — with equal bucket_cap slots FFD reduces to sort-"
    "decreasing + fill-in-order, so the whole assignment is ONE "
    "row_number window partitioned on (bucket_cap, shard): docs are "
    "hash-sharded first because bucket_cap alone has only 8 distinct "
    "values (a reducer funnel at scale — same recipe as "
    "packed_sequences), slot r goes to pack r // (context // "
    "bucket_cap) at position r %% it (equal slots ⇒ no pack ever "
    "straddles the context), and pack_id bit-packs (cap16, shard, "
    "seq) into one BIGINT. The stats row's waste numbers are exactly "
    "recomputable FROM this assignment (pytest-pinned invariant).",
)
def q_packed_assignments(spark, sf_dir):
    from .operators import packing as pk

    return pk.length_bucketed_packing(
        _t(spark, sf_dir, "documents"), context=128, bucket_step=16, n_shards=8
    )


@_q(
    "packed_boundary_loss_stats",
    f"""
WITH {_LBPACK_CTES},
pk AS (
  SELECT pack_id, bucket_cap,
         CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(eff_tok) AS BIGINT) AS load,
         CAST(sum(CAST(eff_tok AS BIGINT) * eff_tok) AS BIGINT) AS sumsq
  FROM p GROUP BY 1, 2
)
SELECT bucket_cap,
       CAST(count(*) AS BIGINT) AS n_packs,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       round(avg(CAST(n_docs AS DOUBLE)), 6) AS avg_docs_per_pack,
       round(sum(CAST(load AS DOUBLE)) / (count(*) * 128.0), 6)
         AS avg_pack_fill,
       round(sum(CAST(n_docs AS DOUBLE) - 1) / count(*), 6)
         AS avg_boundaries,
       CASE WHEN sum(CAST(load AS DOUBLE) * (load - 1) / 2.0) > 0
            THEN round(sum((CAST(load AS DOUBLE) * load - sumsq) / 2.0)
                       / sum(CAST(load AS DOUBLE) * (load - 1) / 2.0), 6)
            ELSE 0.0 END
         AS crossdoc_pair_frac
FROM pk GROUP BY bucket_cap ORDER BY bucket_cap
""",
    doc="Cross-document attention loss of the packing assignment "
    "(operators/packing.py:packing_boundary_stats) — what the packing "
    "COSTS the model when packs train without cross-document masking: "
    "for a pack of doc lengths l1..lk (L = sum), cross-document causal "
    "(query, key) pairs have the closed form (L^2 - sum(li^2))/2, so "
    "the whole metric folds out of two per-pack sums — no token "
    "enumeration. Per bucket_cap: packs, docs, avg docs/pack, fill "
    "fraction, avg boundaries/pack, and the corpus-weighted cross-doc "
    "pair fraction. Two combinable map-side-partial aggregates "
    "(pack_id then bucket_cap) over the SAME assignment algebra as "
    "packed_assignments (shared CTE block oracle-side, shared "
    "operator Spark-side) — linear, balanced by the bit-packed "
    "pack_id. The eval twin of the assignment row: bucketed packing "
    "trades pad waste (length_bucketed_packing_stats) for boundary "
    "contamination; this row prices the second half of that trade.",
)
def q_packed_boundary_loss_stats(spark, sf_dir):
    from .operators import packing as pk

    asg = pk.length_bucketed_packing(
        _t(spark, sf_dir, "documents"), context=128, bucket_step=16, n_shards=8
    )
    return pk.packing_boundary_stats(asg, context=128)


@_q(
    "curated_packed_assignments",
    f"""
WITH {_CURATE_Q_CTE},
{_CURATE_KEEP_CTE},
cur AS (
  SELECT d.doc_id, d.text
  FROM documents d
  JOIN keep USING (doc_id)
  JOIN q USING (doc_id)
  WHERE q.quality_score >= 0.45 AND q.n_tokens BETWEEN 5 AND 5000
),
t AS (
  SELECT doc_id,
         CAST({_PACK_SHARD_SQL} % 8 AS INT) AS shard,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens
  FROM cur
),
r AS (
  SELECT doc_id, shard, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) - n_tokens
              AS BIGINT) AS start_offset
  FROM t
)
SELECT doc_id, shard, n_tokens, start_offset,
       start_offset // 512 AS pack_id
FROM r
""",
    doc="The batch-checkable twin of the STREAMING curation composite "
    "(streaming/sinks.py:curate_stream_batch — scrub -> quality gate "
    "-> sequence packer under ONE ledger): fingerprint-dedup "
    "survivors ∩ the curated_documents quality/length predicate, "
    "packed by the shared concat-and-chop algebra at the composite's "
    "default knobs (quality 0.45, tokens [5, 5000], seq_len 512, 8 "
    "shards). Equals the stream sink's cumulative assignment log on "
    "id-ordered arrival (the TestCurateStreamSink theorem, pinned "
    "against THIS registry row on the real documents fixture) — so "
    "the driver hashes the composite's actual end-to-end algebra, "
    "not a parallel copy. Oracle replays curation CTEs + the packing "
    "window; plan is the curated semi-joins feeding ONE balanced "
    "per-shard window.",
)
def q_curated_packed_assignments(spark, sf_dir):
    from .operators import packing as pk

    docs = _t(spark, sf_dir, "documents")
    q = tx.quality_features(docs, "doc_id", "text").filter(
        (F.col("quality_score") >= 0.45) & F.col("n_tokens").between(5, 5000)
    )
    keep = (
        tx.doc_fingerprints(docs, "doc_id", "text")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
    )
    cur = docs.join(keep.select("doc_id"), "doc_id", "left_semi").join(
        q.select("doc_id"), "doc_id", "left_semi"
    )
    return pk.pack_sequences(cur, seq_len=512, n_shards=8)


@_q(
    "split_assignments",
    f"""
SELECT doc_id,
       CASE WHEN {_SPLIT_KEY_SQL} % 10000 < 9000 THEN 'train'
            WHEN {_SPLIT_KEY_SQL} % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    doc="Deterministic 90/5/5 train/val/test split by content-hash "
    "bucket — stable across reruns, engines, and partitionings; pure "
    "map-side.",
)
def q_split_assignments(spark, sf_dir):
    from .operators import packing as pk

    return pk.split_assign(_t(spark, sf_dir, "documents")).select("doc_id", "split")


_CLUSTER_SPLIT_KEY_SQL = md5_long_sql(
    "concat_ws('|', 'split', CAST(cluster_id AS VARCHAR))"
)


@_q(
    "leakage_safe_splits",
    f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) mp
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
),
clusters AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
)
SELECT doc_id, cluster_id,
       CASE WHEN {_CLUSTER_SPLIT_KEY_SQL} % 10000 < 9000 THEN 'train'
            WHEN {_CLUSTER_SPLIT_KEY_SQL} % 10000 < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM clusters
""",
    doc="Leakage-safe train/val/test splits: the split is keyed on the "
    "near-dup CLUSTER id, not the doc id, so two near-duplicate "
    "documents can never land in different splits (per-doc hashing "
    "leaks ~dup-rate × test-fraction of eval docs into training). "
    "Composition: MinHash pairs → connected components → hash-bucket "
    "split of the cluster id, joined back to every member.",
)
def q_leakage_safe_splits(spark, sf_dir):
    from .operators import packing as pk

    docs = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    )
    clusters = graph.dedup_clusters(docs, pairs)
    return pk.split_assign(clusters, key_col="cluster_id").select(
        "doc_id", "cluster_id", "split"
    )


@_q(
    "dedup_incremental_batch",
    """
WITH fp AS (
  SELECT doc_id,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM documents
),
seen AS (SELECT DISTINCT fp FROM fp WHERE doc_id % 2 = 0)
SELECT fp, min(doc_id) AS doc_id
FROM fp
WHERE doc_id % 2 = 1 AND fp NOT IN (SELECT fp FROM seen)
GROUP BY fp
""",
    doc="Incremental dedup: odd-id batch against the even-id corpus "
    "ledger — fingerprint anti-join (16-byte shuffle keys), min-id "
    "survivor per new fingerprint.",
)
def q_dedup_incremental_batch(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return dd.dedup_incremental(
        docs.filter(F.col("doc_id") % 2 == 1), docs.filter(F.col("doc_id") % 2 == 0)
    )


@_q(
    "chunked_documents",
    """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
k AS (
  SELECT doc_id, t,
         greatest(1, CAST(ceil((len(t) - 8) / 24.0) AS INT)) AS k
  FROM toks
),
ex AS (
  SELECT doc_id, t, CAST(i - 1 AS INT) AS chunk_idx
  FROM k, unnest(generate_series(1, k)) AS u(i)
)
SELECT doc_id, chunk_idx,
       CAST(chunk_idx * 24 AS INT) AS start_tok,
       CAST(len(t[chunk_idx*24+1 : chunk_idx*24+32]) AS INT) AS n_toks,
       array_to_string(t[chunk_idx*24+1 : chunk_idx*24+32], ' ') AS chunk_text
FROM ex
""",
    doc="RAG chunking: 32-token windows, 8-token overlap (stride 24) — "
    "map-side transform + explode, zero shuffles; short docs yield "
    "exactly one chunk.",
)
def q_chunked_documents(spark, sf_dir):
    return tx.chunk_documents(
        _t(spark, sf_dir, "documents"), chunk_tokens=32, overlap=8
    )


@_q(
    "event_type_daily_zscores",
    """
WITH daily AS (
  SELECT event_type AS grp, CAST(ts AS DATE) AS date, count(*) AS cnt
  FROM events GROUP BY 1, 2
),
mom AS (
  SELECT grp, count(*) AS n, CAST(sum(cnt) AS BIGINT) AS s1,
         CAST(sum(cnt*cnt) AS BIGINT) AS s2
  FROM daily GROUP BY 1
)
SELECT grp AS event_type, date, cnt,
       CASE WHEN (CAST(s2 AS DOUBLE)/n
                  - (CAST(s1 AS DOUBLE)/n) * (CAST(s1 AS DOUBLE)/n)) > 0
            THEN round((cnt - CAST(s1 AS DOUBLE)/n)
                       / sqrt(CAST(s2 AS DOUBLE)/n
                              - (CAST(s1 AS DOUBLE)/n) * (CAST(s1 AS DOUBLE)/n)),
                       6)
       END AS z
FROM daily JOIN mom USING (grp)
""",
    doc="Daily-volume anomaly z-scores per event type: moments from "
    "exact integer sums (Σx, Σx², n) so mean/variance are "
    "order-independent and replay identically cross-engine.",
)
def q_event_type_daily_zscores(spark, sf_dir):
    return ts_ops.daily_count_zscores(
        _t(spark, sf_dir, "events"), "ts", "event_type"
    )


@_q(
    "winsorized_prices",
    """
WITH b AS (
  SELECT round(quantile_cont(o_totalprice, 0.01), 6) AS _qlo,
         round(quantile_cont(o_totalprice, 0.99), 6) AS _qhi
  FROM orders
)
SELECT o_orderkey, o_totalprice,
       round(least(greatest(o_totalprice, _qlo), _qhi), 6) AS o_totalprice_w
FROM orders, b
""",
    doc="Winsorization: clip to exact [p01, p99] — 1-row quantile "
    "aggregate broadcast over the scan, then a map-side clamp.",
)
def q_winsorized_prices(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return agg.winsorize(o, "o_totalprice", 0.01, 0.99).select(
        "o_orderkey", "o_totalprice", "o_totalprice_w"
    )


@_q(
    "rolling_7d_event_avg",
    """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS date, count(*) AS cnt
  FROM events GROUP BY 1, 2
)
SELECT event_type, date, cnt,
       round(CAST(sum(cnt) OVER w AS DOUBLE) / (count(*) OVER w), 6)
         AS rolling_avg
FROM daily
WINDOW w AS (PARTITION BY event_type
             ORDER BY date_diff('day', DATE '1970-01-01', date)
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""",
    doc="Trailing 7-day moving average per event type with a RANGE "
    "frame over day numbers — gaps shrink the window instead of "
    "pulling older rows in (a ROWS frame would silently lie on sparse "
    "series).",
)
def q_rolling_7d_event_avg(spark, sf_dir):
    daily = (
        _t(spark, sf_dir, "events")
        .select("event_type", F.to_date("ts").alias("date"))
        .groupBy("event_type", "date")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return win.rolling_range_avg(daily, ["event_type"], "date", "cnt", days=7)


@_q(
    "event_type_distincts",
    """
SELECT event_type,
       count(*) AS n_events,
       count(DISTINCT user_id) AS n_users,
       count(DISTINCT CAST(ts AS DATE)) AS n_days
FROM events
GROUP BY 1
""",
    doc="Multiple DISTINCT aggregates in one statement — Spark plans "
    "this with Expand (one row replica per distinct column), a single "
    "pass instead of per-distinct self-joins.",
)
def q_event_type_distincts(spark, sf_dir):
    return (
        _t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count_distinct("user_id").alias("n_users"),
            F.count_distinct(F.to_date("ts")).alias("n_days"),
        )
    )


@_q(
    "centroid_assignments",
    f"""
WITH cent AS (
  SELECT label AS cell, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
  GROUP BY 1, 2
),
cvec AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM cent GROUP BY cell
),
scored AS (
  SELECT e.vec_id, c.cell,
         round({cosine_sql('c.centroid', 'e.embedding', _EMB_DIM)}, 6) AS s
  FROM embeddings e, cvec c
)
SELECT vec_id, cell AS label, s AS score FROM (
  SELECT vec_id, cell, s,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY s DESC, cell DESC) AS rn
  FROM scored
) WHERE rn = 1
""",
    doc="Nearest-centroid classification (k-means assignment / cell "
    "routing): broadcast cross join against the tiny centroid set, "
    "map-side cosine, per-vector struct argmax with rounded-score + "
    "label tiebreak.",
)
def q_centroid_assignments(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_by_label(emb)
    return sim.classify_to_centroids(emb, cents)


# --------------------------------------------------------------------------
# Round 5: pretraining-corpus quality gates + corpus-level sentence dedup
# --------------------------------------------------------------------------

_EN_STOPS_SQL = ", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS["en"])


@_q(
    "gopher_quality_flags",
    f"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS toks,
         string_split(text, chr(10)) AS lines,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(regexp_extract_all(text, '#')) AS INT)
           + CAST(len(regexp_extract_all(text, '(\\.\\.\\.|…)')) AS INT) AS n_sym
  FROM documents
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS INT) AS n_tokens,
         round(CAST(n_chars - (len(toks) - 1) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 6) AS mean_word_len,
         round(CAST(n_sym AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) AS symbol_ratio,
         round(CAST(len(list_filter(lines, l -> regexp_matches(l, '^\\s*[-*•]'))) AS DOUBLE)
               / CAST(len(lines) AS DOUBLE), 6) AS bullet_ratio,
         round(CAST(len(list_filter(lines, l -> regexp_matches(l, '(\\.\\.\\.|…)\\s*$'))) AS DOUBLE)
               / CAST(len(lines) AS DOUBLE), 6) AS ellipsis_ratio,
         round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
               / CAST(len(toks) AS DOUBLE), 6) AS alpha_word_ratio,
         CAST(len(list_filter(toks, t -> t IN ({_EN_STOPS_SQL}))) AS INT) AS stop_hits
  FROM base
)
SELECT *,
       (n_tokens BETWEEN 50 AND 100000
        AND mean_word_len BETWEEN 3.0 AND 10.0
        AND symbol_ratio <= 0.1
        AND bullet_ratio <= 0.9
        AND ellipsis_ratio <= 0.3
        AND alpha_word_ratio >= 0.8
        AND stop_hits >= 2) AS passes_gopher
FROM m
""",
    doc="Gopher rule filters (word count, mean word length, symbol/"
    "bullet/ellipsis ratios, alpha-word fraction, stopword floor) as "
    "one map-only boolean gate — the cheapest pretraining pre-filter, "
    "zero shuffle at any scale.",
)
def q_gopher_quality_flags(spark, sf_dir):
    return tx.gopher_quality_flags(_t(spark, sf_dir, "documents"))


@_q(
    "script_char_ratios",
    """
WITH base AS (
  SELECT doc_id,
         CAST(length(text) AS INT) AS n,
         CAST(len(regexp_extract_all(text, '[A-Za-z]')) AS INT) AS a,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS d,
         CAST(len(regexp_extract_all(text, '\\s')) AS INT) AS s,
         CAST(len(regexp_extract_all(text, '[^\\x00-\\x7F]')) AS INT) AS na
  FROM documents
)
SELECT doc_id, n AS n_chars,
       CASE WHEN n > 0 THEN round(CAST(a AS DOUBLE) / n, 6) END AS alpha_ratio,
       CASE WHEN n > 0 THEN round(CAST(d AS DOUBLE) / n, 6) END AS digit_ratio,
       CASE WHEN n > 0 THEN round(CAST(s AS DOUBLE) / n, 6) END AS space_ratio,
       CASE WHEN n > 0 THEN round(CAST(n - a - d - s AS DOUBLE) / n, 6) END AS other_ratio,
       CASE WHEN n > 0 THEN round(CAST(na AS DOUBLE) / n, 6) END AS non_ascii_ratio
FROM base
""",
    doc="Character-class composition (alpha/digit/space/other + "
    "non-ASCII fractions): the cheap script and mojibake gate, four "
    "vectorized regexp passes, map-only.",
)
def q_script_char_ratios(spark, sf_dir):
    return tx.script_char_ratios(_t(spark, sf_dir, "documents"))


@_q(
    "duplicate_sentence_stats",
    r"""
WITH punct AS (
  SELECT doc_id,
         regexp_replace(text, '((?:\S+ ){7}\S+) ', '\1. ', 'g') AS text
  FROM documents
),
ex AS (
  SELECT doc_id AS doc,
         unnest(string_split_regex(text, '[.!?]\s+')) AS s
  FROM punct
),
kept AS (
  SELECT doc, regexp_replace(trim(lower(s)), '\s+', ' ', 'g') AS sent
  FROM ex
  WHERE length(regexp_replace(trim(lower(s)), '\s+', ' ', 'g')) >= 20
)
SELECT md5(sent) AS sentence_hash,
       count(DISTINCT doc) AS n_docs,
       count(*) AS n_total,
       min(sent) AS sentence
FROM kept
GROUP BY 1
HAVING count(DISTINCT doc) >= 2
""",
    doc="C4-style corpus-level duplicate-sentence list: explode "
    "sentences map-side, one shuffle keyed on the md5 of the "
    "normalized sentence (maximally spread — never needs salting), "
    "map-side partial aggregation; the output is the anti-join "
    "removal list for boilerplate stripping. The fixture's documents "
    "carry no sentence punctuation (the query returned 0 rows through "
    "round 5 — structurally degenerate), so a deterministic "
    "segmentation inserts a period every 8 words first, mirrored in "
    "both engines; near-dup docs then share exact sentences (135 at "
    "sf0.01).",
)
def q_duplicate_sentence_stats(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    punct = d.withColumn(
        "text",
        F.regexp_replace("text", r"((?:\S+ ){7}\S+) ", "$1. "),
    )
    return tx.duplicate_sentence_stats(punct)


@_q(
    "duplicate_span_stats",
    """
WITH toks AS (
  SELECT doc_id AS doc, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
spans AS (
  SELECT doc,
         unnest(list_transform(generate_series(1, len(t) // 10),
                               i -> array_to_string(t[(i-1)*10+1:i*10], ' '))) AS span
  FROM toks
)
SELECT md5(span) AS span_hash,
       count(DISTINCT doc) AS n_docs,
       count(*) AS n_total,
       min(span) AS span
FROM spans
GROUP BY 1
HAVING count(DISTINCT doc) >= 2
""",
    doc="Fixed-window approximation of suffix-array substring dedup "
    "(Lee et al. 2021): tile docs into non-overlapping 10-token "
    "spans map-side, one md5-keyed shuffle, report spans shared by "
    ">=2 documents — catches boilerplate that has no sentence "
    "punctuation.",
)
def q_duplicate_span_stats(spark, sf_dir):
    return tx.duplicate_span_stats(_t(spark, sf_dir, "documents"))


@_q(
    "normalized_embeddings",
    """
WITH base AS (
  SELECT vec_id, embedding,
         sqrt(list_sum(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS nrm
  FROM embeddings
)
SELECT vec_id,
       CASE WHEN nrm > 0 THEN round(nrm, 6) END AS norm,
       CASE WHEN nrm > 0 THEN
         array_to_string(
           list_transform(embedding,
                          x -> CAST(round(CAST(x AS DOUBLE) / nrm * 100000) AS INT)),
           ',')
       END AS unit_q5
FROM base
""",
    doc="L2 unit-normalization (the prep every cosine index wants; "
    "after it cosine = dot). Map-only, zero shuffle; unit vector "
    "emitted as fixed-point int CSV per the cross-engine float-"
    "formatting convention.",
)
def q_normalized_embeddings(spark, sf_dir):
    return sim.l2_normalize_embeddings(_t(spark, sf_dir, "embeddings"))


@_q(
    "ann_recall_eval",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
cent AS (
  SELECT label AS cell, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
  GROUP BY 1, 2
),
cvec AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM cent GROUP BY cell
),
route AS (
  SELECT qid, qv, cell FROM (
    SELECT q.qid, q.qv, c.cell,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({cosine_sql('c.centroid', 'q.qv', _EMB_DIM)}, 6) DESC,
                      c.cell ASC) AS rn
    FROM q, cvec c
  ) WHERE rn <= 1
),
ivf AS (
  SELECT qid, vec_id FROM (
    SELECT r.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY r.qid
             ORDER BY round({cosine_sql('e.embedding', 'r.qv', _EMB_DIM)}, 6) DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e JOIN route r ON e.label = r.cell
  ) WHERE rn <= 10
),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({cosine_sql('e.embedding', 'q.qv', _EMB_DIM)}, 6) DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e, q
  ) WHERE rn <= 10
),
h AS (
  SELECT b.qid, count(*) AS n
  FROM brute b JOIN ivf i ON b.qid = i.qid AND b.vec_id = i.vec_id
  GROUP BY 1
)
SELECT q.qid,
       CAST(coalesce(h.n, 0) AS INT) AS n_hits,
       round(CAST(coalesce(h.n, 0) AS DOUBLE) / 10, 6) AS recall_at_10
FROM q LEFT JOIN h ON q.qid = h.qid
""",
    doc="Recall@10 of IVF (label centroids, nprobe=1) vs exact brute "
    "force, per query — the eval that sizes nprobe/ncells before an "
    "approximate index is trusted. Both arms are one corpus scan; "
    "ties break on (rounded score, id) so the top-k set is "
    "deterministic cross-engine.",
)
def q_ann_recall_eval(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.withColumnRenamed("label", "cell")
    cents = sim.train_centroids_by_label(emb)
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return sim.ann_recall_eval(corpus, cents, qs, k=10, nprobe=1)


def _ivf_nprobe_curve_sql(nps=(1, 2, 4), k: int = 10) -> str:
    arms = []
    for np_ in nps:
        arms.append(
            f"""ivf{np_} AS (
  SELECT CAST({np_} AS INT) AS nprobe, qid, vec_id FROM (
    SELECT r.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY r.qid
             ORDER BY round({cosine_sql('e.embedding', 'r.qv', _EMB_DIM)}, 6)
                        DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e
    JOIN (SELECT qid, qv, cell FROM rt WHERE rn <= {np_}) r
      ON e.label = r.cell
  ) WHERE rn <= {k}
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM ivf{np_}" for np_ in nps)
    return ",\n".join(arms) + f",\nivf AS ({union})"


@_q(
    "ivf_nprobe_recall_curve",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
cent AS (
  SELECT label AS cell, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, {_EMB_DIM})) AS i) g
  GROUP BY 1, 2
),
cvec AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM cent GROUP BY cell
),
rt AS (
  SELECT q.qid, q.qv, c.cell,
         row_number() OVER (
           PARTITION BY q.qid
           ORDER BY round({cosine_sql('c.centroid', 'q.qv', _EMB_DIM)}, 6)
                      DESC,
                    c.cell ASC) AS rn
  FROM q, cvec c
),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({cosine_sql('e.embedding', 'q.qv', _EMB_DIM)}, 6)
                        DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e, q
  ) WHERE rn <= 10
),
{_ivf_nprobe_curve_sql(nps=(1, 2, 4), k=10)},
h AS (
  SELECT i.nprobe, CAST(count(*) AS BIGINT) AS total_hits
  FROM brute b JOIN ivf i ON b.qid = i.qid AND b.vec_id = i.vec_id
  GROUP BY 1
),
nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q),
nc AS (SELECT CAST(count(DISTINCT label) AS BIGINT) AS n_cells
       FROM embeddings)
SELECT s.nprobe, nq.n_queries, nc.n_cells,
       CAST(coalesce(h.total_hits, 0) AS BIGINT) AS total_hits,
       round(CAST(coalesce(h.total_hits, 0) AS DOUBLE)
             / (CAST(nq.n_queries AS DOUBLE) * 10.0), 6)
         AS mean_recall_at_10
FROM (VALUES (CAST(1 AS INT)), (CAST(2 AS INT)), (CAST(4 AS INT)))
       AS s(nprobe)
LEFT JOIN h ON s.nprobe = h.nprobe
CROSS JOIN nq CROSS JOIN nc
ORDER BY s.nprobe
""",
    doc="IVF nprobe tuning curve (operators/similarity.py:"
    "ivf_topk_batch): mean recall@10 vs exact brute force at "
    "nprobe = 1/2/4 probed cells — the serving-side twin of the "
    "banding S-curve: ann_recall_eval grades the shipped nprobe=1, "
    "this measures what each extra probed cell buys (recall) and "
    "costs (scan fraction ~ nprobe/n_cells, reported via n_cells). "
    "Cell ranking computed ONCE and prefix-sliced per arm; the brute "
    "truth arm runs once and joins each arm's bounded top-k "
    "relation.",
)
def q_ivf_nprobe_recall_curve(spark, sf_dir):
    from .session import track_persist

    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.withColumnRenamed("label", "cell")
    cents = sim.train_centroids_by_label(emb)
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    brute = track_persist(
        sim.cosine_topk_batch(emb, qs, k=10).select("qid", "vec_id")
    )
    per = None
    for np_ in (1, 2, 4):
        approx = sim.ivf_topk_batch(
            corpus, cents, qs, k=10, nprobe=np_
        ).select("qid", "vec_id")
        arm = (
            brute.join(approx, ["qid", "vec_id"])
            .agg(F.count(F.lit(1)).cast("long").alias("total_hits"))
            .select(F.lit(np_).cast("int").alias("nprobe"), "total_hits")
        )
        per = arm if per is None else per.unionByName(arm)
    nq = qs.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    nc = emb.agg(
        F.countDistinct("label").cast("long").alias("n_cells")
    )
    return (
        per.crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(nc))
        .select(
            "nprobe",
            "n_queries",
            "n_cells",
            F.coalesce("total_hits", F.lit(0))
            .cast("long")
            .alias("total_hits"),
            # NULL recall when there are no queries (empty relation)
            # — SQL division semantics, not an ANSI crash.
            F.when(
                F.col("n_queries") > 0,
                F.round(
                    F.coalesce("total_hits", F.lit(0)).cast("double")
                    / (F.col("n_queries").cast("double") * F.lit(10.0)),
                    6,
                ),
            ).alias("mean_recall_at_10"),
        )
        .orderBy("nprobe")
    )


@_q(
    "local_supplier_volume",
    """
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue
FROM customer, orders, lineitem, supplier, nation, region
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY n_name
""",
    doc="TPC-H Q5 shape: 6-way join with the dim chain (region → "
    "nation → supplier) collapsed into one broadcast before touching "
    "the fact tables, date filter pushed to the orders scan, and the "
    "only real shuffles the lineitem⋈orders and orders⋈customer "
    "equi-joins (AQE-planned); decimal-exact revenue.",
)
def q_local_supplier_volume(spark, sf_dir):
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n = (
        _t(spark, sf_dir, "nation")
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-01-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    j = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(F.col("c_nationkey") == F.col("s_nationkey"))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy("n_name").agg(agg.exact_sum(disc_price, "revenue"))


@_q(
    "returned_items_top_customers",
    """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4))) AS DOUBLE) AS revenue,
       count(*) AS n_items
FROM customer, orders, lineitem
WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-10-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
""",
    doc="TPC-H Q10 shape: returned-item revenue per customer over one "
    "quarter, top-20. Filters pushed to both fact scans, group on the "
    "customer key, TakeOrderedAndProject for the limit (per-partition "
    "heaps, no global sort); decimal-exact revenue makes the ordering "
    "and the selected set engine-independent, custkey breaks ties.",
)
def q_returned_items_top_customers(spark, sf_dir):
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= "1996-10-01")
            & (F.col("o_orderdate") < "1997-01-01")
        )
        .select("o_orderkey", "o_custkey")
    )
    l = _t(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            agg.exact_sum(disc_price, "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.col("revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@_q(
    "sole_late_suppliers",
    """
WITH ll AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
              THEN 1 ELSE 0 END AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
os AS (
  SELECT l_orderkey, l_suppkey, max(late) AS sup_late
  FROM ll GROUP BY l_orderkey, l_suppkey
),
od AS (
  SELECT l_orderkey, count(*) AS n_supp, sum(sup_late) AS n_late
  FROM os GROUP BY l_orderkey
)
SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
FROM os
JOIN od USING (l_orderkey)
JOIN supplier ON s_suppkey = l_suppkey
WHERE os.sup_late = 1 AND od.n_supp > 1 AND od.n_late = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 20
""",
    doc="TPC-H Q21 shape, SCALABLE REFORMULATION — the deliberate "
    "pair of sole_late_supplier_waits (which keeps the textbook "
    "EXISTS/NOT-EXISTS semi+anti plan, the way the repo pairs "
    "Theil-Sen with OLS and MAD with stddev): the correlated pair is "
    "collapsed into grouped counts — per-(order, supplier) lateness, "
    "then per-order n_supp / n_late, predicate sup_late = 1 AND "
    "n_supp > 1 AND n_late = 1. ONE shuffle on orderkey reused by "
    "both aggregates and the rejoin (co-partitioned) replaces the "
    "textbook plan's two extra lineitem self-joins; "
    "tests/test_invariants.py pins the equivalence against the "
    "EXISTS form run via spark.sql. Lateness adapted to this schema "
    "(shipped > 90 days after order date; no commit/receipt "
    "columns). Supplier dim broadcast; top-20 via per-partition "
    "heaps.",
)
def q_sole_late_suppliers(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    late = F.when(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"),
        F.lit(1),
    ).otherwise(F.lit(0))
    ll = l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
        "l_orderkey", "l_suppkey", late.alias("late")
    )
    os_ = ll.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("late").alias("sup_late")
    )
    od = os_.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("sup_late").alias("n_late")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        os_.join(od, "l_orderkey")
        .where(
            (F.col("sup_late") == 1)
            & (F.col("n_supp") > 1)
            & (F.col("n_late") == 1)
        )
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(20)
    )


_CURR_HASH = (
    "CAST('0x' || substr(md5(concat_ws('|', 'curr', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)"
)
_SHUF_HASH = (
    "CAST('0x' || substr(md5(concat_ws('|', 'shuf', CAST(doc_id AS VARCHAR))), 1, 15) AS BIGINT)"
)


@_q(
    "curriculum_order_docs",
    f"""
WITH staged AS (
  SELECT doc_id,
         CAST(ntile(4) OVER (ORDER BY n_chars DESC, doc_id ASC) AS INT) AS stage,
         {_CURR_HASH} AS h
  FROM documents
)
SELECT doc_id, stage,
       CAST(row_number() OVER (PARTITION BY stage ORDER BY h ASC, doc_id ASC) AS INT)
         AS stage_pos
FROM staged
""",
    doc="Curriculum staging: ntile quality tiers (best first) + "
    "content-hash shuffled position within each stage — easy-to-hard "
    "across stages, decorrelated inside one. The global ntile is the "
    "one total sort; at 100 TB swap it for quantile-boundary "
    "broadcast (order_price_rank_scalable's trick).",
)
def q_curriculum_order_docs(spark, sf_dir):
    return smp.curriculum_order(
        _t(spark, sf_dir, "documents"), "doc_id", "n_chars", stages=4
    )


@_q(
    "shuffled_doc_shards",
    f"""
WITH base AS (
  SELECT doc_id,
         CAST({_SHUF_HASH} % 8 AS INT) AS shard,
         {_SHUF_HASH} AS h
  FROM documents
)
SELECT doc_id, shard,
       CAST(row_number() OVER (PARTITION BY shard ORDER BY h ASC, doc_id ASC) AS INT)
         AS shard_pos
FROM base
""",
    doc="Deterministic global shuffle + sharding before training "
    "serialization: content-hash shard + within-shard position, "
    "byte-identical across engines/reruns/partitionings; the only "
    "shuffle keys on the uniform 60-bit hash (no skew, no global "
    "sort) and the write is partitionBy(shard).",
)
def q_shuffled_doc_shards(spark, sf_dir):
    return smp.global_shuffle_shards(
        _t(spark, sf_dir, "documents"), "doc_id", n_shards=8
    )


@_q(
    "corpus_trigram_topk",
    """
WITH toks AS (
  SELECT string_split_regex(trim(lower(text)), '\\s+') AS t FROM documents
),
grams AS (
  SELECT unnest(CASE WHEN len(t) >= 3 THEN
    list_transform(generate_series(1, len(t) - 2),
                   i -> array_to_string(t[i:i+2], ' '))
  ELSE [] END) AS gram
  FROM toks
)
SELECT gram, count(*) AS cnt
FROM grams
GROUP BY gram
ORDER BY cnt DESC, gram ASC
LIMIT 100
""",
    doc="Corpus top-100 trigram table (contamination screens, "
    "boilerplate discovery): map-side gram build, one groupBy with "
    "partial agg, TakeOrderedAndProject top-k with lexicographic "
    "tiebreak.",
)
def q_corpus_trigram_topk(spark, sf_dir):
    return tx.corpus_ngram_topk(_t(spark, sf_dir, "documents"), n=3, top=100)


@_q(
    "cross_dup_rate_by_source",
    """
WITH fp AS (
  SELECT source AS src,
         md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
  FROM documents
),
spanning AS (
  SELECT fp FROM fp GROUP BY fp HAVING count(DISTINCT src) >= 2
),
totals AS (SELECT src, count(*) AS n_docs FROM fp GROUP BY 1),
dups AS (
  SELECT src, count(*) AS n_cross_dup
  FROM fp WHERE fp.fp IN (SELECT fp FROM spanning)
  GROUP BY 1
)
SELECT t.src AS source, t.n_docs,
       coalesce(d.n_cross_dup, 0) AS n_cross_dup,
       round(CAST(coalesce(d.n_cross_dup, 0) AS DOUBLE) / t.n_docs, 6)
         AS cross_dup_rate
FROM totals t LEFT JOIN dups d ON t.src = d.src
""",
    doc="Cross-source exact-dup contamination matrix: fingerprints "
    "spanning >= 2 sources, semi-joined back per source. Both "
    "shuffles key on the uniform md5 fingerprint; the spanning set "
    "broadcasts.",
)
def q_cross_dup_rate_by_source(spark, sf_dir):
    return dd.cross_dup_rate_by_source(_t(spark, sf_dir, "documents"))


@_q(
    "pii_summary_by_source",
    f"""
WITH per AS (
  SELECT source,
         CAST(len(regexp_extract_all(text, '{tx.EMAIL_PATTERN}')) AS INT) AS e,
         CAST(len(regexp_extract_all(text, '{tx.URL_PATTERN}')) AS INT) AS u,
         CAST(len(regexp_extract_all(text, '{tx.PHONE_PATTERN}')) AS INT) AS p
  FROM documents
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(e) AS BIGINT) AS n_emails,
       CAST(sum(u) AS BIGINT) AS n_urls,
       CAST(sum(p) AS BIGINT) AS n_phones,
       CAST(sum(CASE WHEN e + u + p > 0 THEN 1 ELSE 0 END) AS BIGINT) AS docs_with_pii,
       round(CAST(sum(CASE WHEN e + u + p > 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS pii_doc_rate
FROM per
GROUP BY source
""",
    doc="Per-source PII exposure dashboard over the scrub patterns: "
    "map-side regexp counts, one tiny groupBy on source.",
)
def q_pii_summary_by_source(spark, sf_dir):
    return tx.pii_summary(_t(spark, sf_dir, "documents"))


@_q(
    "quality_by_source_summary",
    f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS['en'])}))) AS INT) AS n_stop
  FROM documents
),
q AS (
  SELECT source,
         round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
               + (1.0 - least(CASE WHEN n_chars > 0 THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6) END * 10, 1.0)) * 0.2,
               6) AS qs,
         n_tokens
  FROM base
)
SELECT source,
       count(*) AS n_docs,
       CAST(SUM(CAST(qs AS DECIMAL(27,6))) AS DOUBLE) / count(*) AS avg_quality,
       min(qs) AS min_quality,
       max(qs) AS max_quality,
       CAST(SUM(CAST(n_tokens AS DECIMAL(27,4))) AS DOUBLE) / count(*) AS avg_tokens
FROM q
GROUP BY source
""",
    doc="Per-source corpus quality report: the composite heuristic "
    "score aggregated by source (decimal-exact means) — the mix-"
    "design dashboard that decides per-source sampling weights.",
)
def q_quality_by_source_summary(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    qf = tx.quality_features(d, "doc_id", "text").select(
        "doc_id", "quality_score", "n_tokens"
    )
    j = qf.join(d.select("doc_id", "source"), "doc_id")
    # exact_avg's decimal(27,4) would truncate the 6dp scores — sum at
    # the scores' own scale so the decimal accumulation is lossless.
    avg_q = (
        F.sum(F.col("quality_score").cast("decimal(27,6)")).cast("double")
        / F.count(F.lit(1))
    ).alias("avg_quality")
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        avg_q,
        F.min("quality_score").alias("min_quality"),
        F.max("quality_score").alias("max_quality"),
        agg.exact_avg("n_tokens", "avg_tokens"),
    )


@_q(
    "embedding_norm_outliers",
    """
WITH base AS (
  SELECT vec_id,
         round(sqrt(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
               * (CASE WHEN vec_id % 97 = 0 THEN 8.0
                       ELSE 1.0 + (vec_id % 7) * 0.01 END), 6) AS nr
  FROM embeddings
),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n,
         sum(CAST(nr AS DECIMAL(27,6))) AS s1,
         sum(CAST(nr AS DECIMAL(18,6)) * CAST(nr AS DECIMAL(18,6))) AS s2
  FROM base
),
m AS (
  SELECT CAST(s1 AS DOUBLE) / n AS mu,
         sqrt(CAST(s2 AS DOUBLE) / n
              - (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS sd
  FROM stats
)
SELECT vec_id, nr AS norm,
       CASE WHEN sd > 0 THEN round((nr - mu) / sd, 6) END AS z
FROM base, m
WHERE sd > 0 AND abs(round((nr - mu) / sd, 6)) > 2.0
""",
    doc="Norm z-score outlier screen (broken encoders / truncated "
    "rows): ONE decimal-exact moments aggregate broadcast back as a "
    "1-row join; scan stays map-side, no sort anywhere. The fixture's "
    "embeddings are unit-normalized (every L2 norm is exactly 1.0), so "
    "the screen reconstructs raw magnitudes with a deterministic "
    "per-row weight — vec_id % 97 == 0 rows simulate broken-encoder "
    "blow-ups (8x), the rest get a small id-derived spread — making "
    "sd > 0 and the outlier set non-empty. z is sd>0-guarded (lazy "
    "CASE WHEN) so an all-uniform corpus yields 0 rows, not an ANSI "
    "divide-by-zero.",
)
def q_embedding_norm_outliers(spark, sf_dir):
    raw_weight = F.when(
        F.col("vec_id") % 97 == 0, F.lit(8.0)
    ).otherwise(F.lit(1.0) + (F.col("vec_id") % 7).cast("double") * 0.01)
    return sim.embedding_norm_outliers(
        _t(spark, sf_dir, "embeddings"), weight=raw_weight
    )


@_q(
    "orders_yoy_growth",
    """
WITH y AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         count(*) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT yr, n_orders, revenue,
       lag(n_orders) OVER (ORDER BY yr) AS prev_orders,
       round(CAST(n_orders - lag(n_orders) OVER (ORDER BY yr) AS DOUBLE)
             / lag(n_orders) OVER (ORDER BY yr), 6) AS orders_growth
FROM y
""",
    doc="Year-over-year growth: tiny post-aggregate lag window over "
    "per-year rows (the window runs on |years| rows, never the fact "
    "table); decimal-exact revenue.",
)
def q_orders_yoy_growth(spark, sf_dir):
    from pyspark.sql import Window

    y = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.year("o_orderdate").alias("yr"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            agg.exact_sum("o_totalprice", "revenue"),
        )
    )
    w = Window.orderBy("yr")
    prev = F.lag("n_orders").over(w)
    return y.select(
        "yr",
        "n_orders",
        "revenue",
        prev.alias("prev_orders"),
        F.round((F.col("n_orders") - prev).cast("double") / prev, 6).alias(
            "orders_growth"
        ),
    )


# --------------------------------------------------------------------------
# Round-5 additions: classic warehouse shapes (TPC-H Q4/Q6/Q7/Q14/Q15/
# Q18/Q19/Q22 adapted to the fixture schema) + physical-layout operators
# (Bloom-prefiltered semi-join, storage partition transforms, Z-order
# file statistics) + exact-integer PageRank + BPE merge-pair counting.
# --------------------------------------------------------------------------


@_q(
    "forecast_revenue_simple",
    """
SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(27,4)))
            AS DOUBLE) AS promo_revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    doc="TPC-H Q6 shape (forecast revenue change): pure scan-filter-"
    "aggregate — every predicate pushes to the parquet scan (range "
    "predicates on shipdate/discount/quantity prune row groups via "
    "min/max stats), no join, no shuffle beyond the single partial-"
    "aggregate exchange. The canonical 'is the fast path fast' probe: "
    "at 100 TB this query is I/O-bound or the layout is wrong.",
)
def q_forecast_revenue_simple(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return l.agg(
        agg.exact_sum(
            F.col("l_extendedprice") * F.col("l_discount"), "promo_revenue"
        )
    )


@_q(
    "late_shipment_priority_counts",
    """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape (order-priority checking): EXISTS with a non-"
    "equi residual (shipped >30 days after ordering) planned as a "
    "LEFT SEMI hash join on the order key with the date comparison as "
    "the join residual — one row per order regardless of how many "
    "lines are late, no row multiplication, no distinct. The date "
    "window pushes to the orders scan (partition pruning on a "
    "date-partitioned layout).",
)
def q_late_shipment_priority_counts(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    late = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@_q(
    "nation_pair_trade_volume",
    """
SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS yr,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)))
            AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey  = c_custkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
    OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
  AND l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY sn.n_name, cn.n_name, CAST(year(l_shipdate) AS INT)
""",
    doc="TPC-H Q7 shape (volume shipping between two nations): the "
    "nation dim joins twice under different roles (supplier vs "
    "customer side) — both broadcast; the disjunctive nation-pair "
    "predicate applies after both attach. Only the fact-fact "
    "lineitem⋈orders and ⋈customer joins shuffle; supplier broadcasts. "
    "Ship-date window pushes to the lineitem scan.",
)
def q_nation_pair_trade_volume(spark, sf_dir):
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select(
        "l_orderkey", "l_suppkey", "l_shipdate",
        "l_extendedprice", "l_discount",
    )
    j = (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .where(
            (
                (F.col("supp_nation") == "NATION_1")
                & (F.col("cust_nation") == "NATION_2")
            )
            | (
                (F.col("supp_nation") == "NATION_2")
                & (F.col("cust_nation") == "NATION_1")
            )
        )
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.groupBy(
        "supp_nation", "cust_nation",
        F.year("l_shipdate").alias("yr"),
    ).agg(agg.exact_sum(disc_price, "revenue"))


@_q(
    "promo_revenue_share",
    """
SELECT CAST(month(l_shipdate) AS INT) AS mo,
       round(100.0 *
         CAST(SUM(CAST(CASE WHEN p_type = 'PROMO'
                       THEN l_extendedprice * (1 - l_discount)
                       ELSE 0.0 END AS DECIMAL(27,4))) AS DOUBLE)
         / CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(27,4))) AS DOUBLE),
         6) AS promo_share_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate <  TIMESTAMP '1998-01-01'
GROUP BY CAST(month(l_shipdate) AS INT)
""",
    doc="TPC-H Q14 shape (promotion effect): conditional aggregate — "
    "one pass computes promo and total revenue simultaneously (no "
    "second join or union), part broadcasts into lineitem, both sums "
    "decimal-exact with ONE final double division per group so the "
    "ratio is engine-identical.",
)
def q_promo_revenue_share(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1998-01-01")
    ).select("l_partkey", "l_shipdate", "l_extendedprice", "l_discount")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    j = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    g = j.groupBy(F.month("l_shipdate").alias("mo")).agg(
        agg.exact_sum(
            F.when(F.col("p_type") == "PROMO", disc_price).otherwise(0.0),
            "promo_rev",
        ),
        agg.exact_sum(disc_price, "total_rev"),
    )
    return g.select(
        "mo",
        F.round(
            F.lit(100.0) * F.col("promo_rev") / F.col("total_rev"), 6
        ).alias("promo_share_pct"),
    )


@_q(
    "top_supplier_by_revenue",
    """
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                  AS DECIMAL(27,4))) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
    AND l_shipdate <  TIMESTAMP '1997-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM supplier JOIN revenue ON s_suppkey = supplier_no
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""",
    doc="TPC-H Q15 shape (top supplier): the scalar-subquery max is a "
    "broadcast 1-row cross join against the per-supplier aggregate — "
    "no global sort, no window over an unpartitioned frame. Revenue "
    "is decimal-exact, so the double equality that selects the "
    "argmax set is engine-safe (ties all survive, as in the spec).",
)
def q_top_supplier_by_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1997-01-01")
        & (F.col("l_shipdate") < "1997-04-01")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        agg.exact_sum(disc_price, "total_revenue")
    )
    mx = revenue.agg(F.max("total_revenue").alias("__mx"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(mx))
        .where(F.col("total_revenue") == F.col("__mx"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@_q(
    "large_volume_customers",
    """
SELECT c_custkey, c_name, o_orderkey, o_totalprice,
       CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE) AS qty_sum
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY c_custkey, c_name, o_orderkey, o_totalprice
HAVING SUM(CAST(l_quantity AS DECIMAL(27,4))) > 250
""",
    doc="TPC-H Q18 shape (large-volume customers): group lineitem by "
    "order with a HAVING threshold, then attach order/customer "
    "attributes. Planned as one fact aggregate keyed on l_orderkey "
    "(the natural shuffle key) followed by joins that AQE converts to "
    "broadcast once the >250 filter collapses the row count — the "
    "anti-pattern this query guards against is joining BEFORE "
    "aggregating, which multiplies lineitem by the customer payload.",
)
def q_large_volume_customers(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        l.groupBy("l_orderkey")
        .agg(agg.exact_sum("l_quantity", "qty_sum"))
        .where(F.col("qty_sum") > 250)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select("c_custkey", "c_name", "o_orderkey", "o_totalprice", "qty_sum")
    )


@_q(
    "disjunctive_part_revenue",
    """
SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)))
            AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
       AND p_size BETWEEN 1 AND 5)
   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
       AND p_size BETWEEN 1 AND 10)
   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
       AND p_size BETWEEN 1 AND 15)
""",
    doc="TPC-H Q19 shape (discounted revenue, disjunctive predicates): "
    "an OR-of-ANDs across BOTH join sides. Catalyst factors the "
    "single-table conjuncts out of the disjunction: l_quantity "
    "BETWEEN 1 AND 30 pushes to the lineitem scan and the brand/size "
    "union of ranges to the part scan, so each side prunes before the "
    "broadcast join and the residual OR evaluates on the survivors "
    "only — the classic test that an optimizer doesn't give up on "
    "non-conjunctive filters.",
)
def q_disjunctive_part_revenue(spark, sf_dir):
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    j = l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    qty = F.col("l_quantity")
    sz = F.col("p_size")
    cond = (
        ((F.col("p_brand") == "Brand#12") & qty.between(1, 11) & sz.between(1, 5))
        | ((F.col("p_brand") == "Brand#23") & qty.between(10, 20) & sz.between(1, 10))
        | ((F.col("p_brand") == "Brand#34") & qty.between(20, 30) & sz.between(1, 15))
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return j.where(cond).agg(agg.exact_sum(disc_price, "revenue"))


@_q(
    "dormant_rich_customers",
    """
WITH thresh AS (
  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE)
         / count(c_acctbal) AS avg_bal
  FROM customer WHERE c_acctbal > 0
)
SELECT c_nationkey,
       count(*) AS n_custs,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(27,4))) AS DOUBLE) AS total_bal
FROM customer, thresh
WHERE c_acctbal > avg_bal
  AND NOT EXISTS (
    SELECT 1 FROM orders
    WHERE o_custkey = c_custkey
      AND o_orderdate >= TIMESTAMP '2000-01-01'
  )
GROUP BY c_nationkey
""",
    doc="TPC-H Q22 shape (global-customer sales opportunity): a "
    "decimal-exact scalar average broadcast as a 1-row cross join "
    "(never a driver collect), an anti-join against recent orders "
    "(the NOT EXISTS side filters its date predicate BEFORE the "
    "shuffle), and a per-nation rollup of the dormant high-balance "
    "accounts.",
)
def q_dormant_rich_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    thresh = c.where(F.col("c_acctbal") > 0).agg(
        agg.exact_avg("c_acctbal", "avg_bal")
    )
    recent = _t(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "2000-01-01"
    ).select("o_custkey")
    rich = c.crossJoin(F.broadcast(thresh)).where(
        F.col("c_acctbal") > F.col("avg_bal")
    )
    dormant = rich.join(
        recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    )
    return dormant.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_custs"),
        agg.exact_sum("c_acctbal", "total_bal"),
    )


@_q(
    "bloom_filtered_segment_events",
    """
SELECT event_type, count(*) AS n_events
FROM events
WHERE user_id IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
GROUP BY event_type
""",
    doc="Bloom-prefiltered semi-join (operators/joins.py:"
    "bloom_prefilter_semi_join): the AUTOMOBILE customer keys fold "
    "into a 128 Ki-bit Bloom image (one md5 per key, Kirsch-"
    "Mitzenmacher double hashing, bit_or word aggregate) broadcast as "
    "ONE row; the events scan drops non-members in pure codegen "
    "BEFORE any exchange, and an exact left-semi join removes the "
    "~0.1% false positives — result identical to the plain semi-join "
    "(the oracle), volume into the shuffle cut to the survivor "
    "sliver. The explicit form of Spark's runtime bloom-filter "
    "injection, usable when stats are absent or the build side "
    "exceeds the broadcast-hash threshold but not its Bloom image.",
)
def q_bloom_filtered_segment_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("user_id", "event_type")
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "AUTOMOBILE"
    ).select("c_custkey")
    hits = joins.bloom_prefilter_semi_join(
        e, c, "user_id", "c_custkey", m_bits=1 << 17, k=2
    )
    return hits.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )


@_q(
    "storage_partition_layout",
    f"""
WITH tagged AS (
  SELECT ((({md5_long_sql("CAST(o_orderkey AS VARCHAR)")}) % 16) + 16) % 16
           AS bucket_16,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
         CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS price_band,
         o_orderkey
  FROM orders
)
SELECT bucket_16, order_month,
       count(*) AS n_rows,
       min(o_orderkey) AS min_orderkey,
       max(o_orderkey) AS max_orderkey,
       count(DISTINCT price_band) AS n_price_bands
FROM tagged
GROUP BY bucket_16, order_month
""",
    doc="Iceberg-style hidden-partition transforms as portable "
    "expressions: bucket(16, key) via the engine-neutral md5-derived "
    "hash (functions/hashing.py — NOT Spark's murmur, so any engine "
    "routes a key to the same bucket), month(ts) truncation, and "
    "truncate-width price bands; rolled up to per-(bucket, month) "
    "file statistics (row count, key min/max) — exactly the metadata "
    "a table format keeps for partition pruning and file skipping. "
    "Writer-side twin: df.write.partitionBy on these columns.",
)
def q_storage_partition_layout(spark, sf_dir):
    from .functions.hashing import md5_long

    o = _t(spark, sf_dir, "orders")
    tagged = o.select(
        F.pmod(md5_long(F.col("o_orderkey").cast("string")), F.lit(16)).alias(
            "bucket_16"
        ),
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("order_month"),
        F.floor(F.col("o_totalprice") / 25000.0).alias("price_band"),
        "o_orderkey",
    )
    return tagged.groupBy("bucket_16", "order_month").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("o_orderkey").alias("min_orderkey"),
        F.max("o_orderkey").alias("max_orderkey"),
        F.countDistinct("price_band").alias("n_price_bands"),
    )


def _morton8(qx: str, qy: str, engine: str) -> str:
    """16-bit Morton (Z-order) code from two 8-bit quantized dims —
    the same interleave emitted for Spark SQL (shiftleft/shiftright
    functions) and DuckDB (<< >> operators), so the oracle replays the
    layout bit-for-bit."""
    terms = []
    for i in range(8):
        if engine == "spark":
            terms.append(f"shiftleft(shiftright({qx}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({qy}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({qx} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({qy} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


@_q(
    "zorder_file_stats",
    f"""
WITH bounds AS (
  SELECT min(l_extendedprice) AS plo, max(l_extendedprice) AS phi,
         min(l_quantity) AS qlo, max(l_quantity) AS qhi
  FROM lineitem
),
quant AS (
  SELECT CAST(floor(((l_extendedprice - plo) / (phi - plo)) * 255.0) AS BIGINT)
           AS qx,
         CAST(floor(((l_quantity - qlo) / (qhi - qlo)) * 255.0) AS BIGINT)
           AS qy,
         l_extendedprice, l_quantity
  FROM lineitem, bounds
),
coded AS (
  SELECT ({_morton8("qx", "qy", "duckdb")} >> 10) AS file_id,
         l_extendedprice, l_quantity
  FROM quant
)
SELECT file_id, count(*) AS n_rows,
       min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
FROM coded
GROUP BY file_id
""",
    doc="Z-order (Morton) clustering statistics: price and quantity "
    "quantized to 8 bits against broadcast global bounds, bit-"
    "interleaved into a 16-bit Z-key, rows assigned to 64 'files' by "
    "Z-range, and per-file min/max column stats emitted — the "
    "DELTA/Iceberg OPTIMIZE ZORDER layout decision as a query. The "
    "payoff the stats table demonstrates: after Z-clustering, BOTH "
    "a price predicate AND a quantity predicate prune most files "
    "(each file covers a narrow rectangle in the 2-D space), where "
    "single-column sorting prunes only its own column. The interleave "
    "is pure integer bit arithmetic, identical in any engine.",
)
def q_zorder_file_stats(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select("l_extendedprice", "l_quantity")
    bounds = l.agg(
        F.min("l_extendedprice").alias("plo"),
        F.max("l_extendedprice").alias("phi"),
        F.min("l_quantity").alias("qlo"),
        F.max("l_quantity").alias("qhi"),
    )
    # Degenerate bounds (single row / all-equal column) quantize to
    # NULL via SQL 0/0 semantics — never an ANSI crash.
    quant = l.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.col("phi") > F.col("plo"),
            F.floor(
                ((F.col("l_extendedprice") - F.col("plo"))
                 / (F.col("phi") - F.col("plo"))) * 255.0
            ),
        ).alias("qx"),
        F.when(
            F.col("qhi") > F.col("qlo"),
            F.floor(
                ((F.col("l_quantity") - F.col("qlo"))
                 / (F.col("qhi") - F.col("qlo"))) * 255.0
            ),
        ).alias("qy"),
        "l_extendedprice", "l_quantity",
    )
    coded = quant.select(
        F.expr(f"shiftright({_morton8('qx', 'qy', 'spark')}, 10)").alias(
            "file_id"
        ),
        "l_extendedprice", "l_quantity",
    )
    return coded.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


_LAYOUT_BOX = (
    "min_price <= 40000.0 AND max_price >= 30000.0 "
    "AND min_qty <= 15.0 AND max_qty >= 10.0"
)


@_q(
    "layout_pruning_eval",
    f"""
WITH bounds AS (
  SELECT min(l_extendedprice) AS plo, max(l_extendedprice) AS phi,
         min(l_quantity) AS qlo, max(l_quantity) AS qhi
  FROM lineitem
),
quant AS (
  SELECT CAST(floor(((l_extendedprice - plo) / (phi - plo)) * 255.0) AS BIGINT)
           AS qx,
         CAST(floor(((l_quantity - qlo) / (qhi - qlo)) * 255.0) AS BIGINT)
           AS qy,
         l_extendedprice, l_quantity
  FROM lineitem, bounds
),
assigned AS (
  SELECT 'zorder' AS layout, ({_morton8("qx", "qy", "duckdb")} >> 10)
           AS file_id, l_extendedprice, l_quantity
  FROM quant
  UNION ALL
  SELECT 'price_sorted', qx >> 2, l_extendedprice, l_quantity FROM quant
  UNION ALL
  SELECT 'qty_sorted', qy >> 2, l_extendedprice, l_quantity FROM quant
),
files AS (
  SELECT layout, file_id, CAST(count(*) AS BIGINT) AS n_rows,
         min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
         min(l_quantity) AS min_qty, max(l_quantity) AS max_qty
  FROM assigned GROUP BY 1, 2
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS rows_matching
  FROM lineitem
  WHERE l_extendedprice BETWEEN 30000.0 AND 40000.0
    AND l_quantity BETWEEN 10.0 AND 15.0
),
per AS (
  SELECT layout,
         CAST(count(*) AS BIGINT) AS n_files,
         CAST(sum(CASE WHEN {_LAYOUT_BOX} THEN 1 ELSE 0 END) AS BIGINT)
           AS files_touched,
         CAST(sum(CASE WHEN {_LAYOUT_BOX} THEN n_rows ELSE 0 END) AS BIGINT)
           AS rows_scanned
  FROM files GROUP BY layout
)
SELECT per.layout, per.n_files, per.files_touched, per.rows_scanned,
       m.rows_matching,
       round(CAST(per.files_touched AS DOUBLE)
             / CAST(per.n_files AS DOUBLE), 6) AS file_frac,
       CASE WHEN per.rows_scanned > 0 THEN
         round(CAST(m.rows_matching AS DOUBLE)
               / CAST(per.rows_scanned AS DOUBLE), 6) END AS scan_efficiency
FROM per, m ORDER BY per.layout
""",
    doc="Data-layout pruning eval — zorder_file_stats' claimed payoff "
    "MEASURED instead of asserted: the same 64-file budget laid out "
    "three ways (Z-order interleave of price x quantity; price-band "
    "sort; quantity-band sort), then a fixed 2-D box predicate "
    "(price in [30k,40k], qty in [10,15]) is pruned against each "
    "layout's per-file min/max stats. Reports files touched, rows "
    "scanned in touched files, and scan_efficiency = matching/"
    "scanned — the number that decides an OPTIMIZE ZORDER: a single-"
    "column layout prunes its own column perfectly but every touched "
    "file spans the full range of the OTHER column, so its scanned "
    "volume inflates; Z-order files cover narrow 2-D rectangles. "
    "Pure integer bit/bucket arithmetic on broadcast global bounds; "
    "one combinable groupBy per layout over a shared quantized scan.",
)
def q_layout_pruning_eval(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select("l_extendedprice", "l_quantity")
    bounds = l.agg(
        F.min("l_extendedprice").alias("plo"),
        F.max("l_extendedprice").alias("phi"),
        F.min("l_quantity").alias("qlo"),
        F.max("l_quantity").alias("qhi"),
    )
    # Same degenerate-bounds guard as zorder_file_stats.
    quant = l.crossJoin(F.broadcast(bounds)).select(
        F.when(
            F.col("phi") > F.col("plo"),
            F.floor(
                ((F.col("l_extendedprice") - F.col("plo"))
                 / (F.col("phi") - F.col("plo"))) * 255.0
            ),
        ).cast("long").alias("qx"),
        F.when(
            F.col("qhi") > F.col("qlo"),
            F.floor(
                ((F.col("l_quantity") - F.col("qlo"))
                 / (F.col("qhi") - F.col("qlo"))) * 255.0
            ),
        ).cast("long").alias("qy"),
        "l_extendedprice",
        "l_quantity",
    )
    from .session import track_persist

    quant = track_persist(quant)
    z = quant.select(
        F.lit("zorder").alias("layout"),
        F.expr(f"shiftright({_morton8('qx', 'qy', 'spark')}, 10)").alias(
            "file_id"
        ),
        "l_extendedprice",
        "l_quantity",
    )
    px = quant.select(
        F.lit("price_sorted").alias("layout"),
        F.expr("shiftright(qx, 2)").alias("file_id"),
        "l_extendedprice",
        "l_quantity",
    )
    qy = quant.select(
        F.lit("qty_sorted").alias("layout"),
        F.expr("shiftright(qy, 2)").alias("file_id"),
        "l_extendedprice",
        "l_quantity",
    )
    assigned = z.unionAll(px).unionAll(qy)
    files = assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )
    touched = F.expr(_LAYOUT_BOX)
    per = files.groupBy("layout").agg(
        F.count(F.lit(1)).cast("long").alias("n_files"),
        F.sum(F.when(touched, 1).otherwise(0))
        .cast("long")
        .alias("files_touched"),
        F.sum(F.when(touched, F.col("n_rows")).otherwise(0))
        .cast("long")
        .alias("rows_scanned"),
    )
    m = l.where(
        F.col("l_extendedprice").between(30000.0, 40000.0)
        & F.col("l_quantity").between(10.0, 15.0)
    ).agg(F.count(F.lit(1)).cast("long").alias("rows_matching"))
    return (
        per.crossJoin(F.broadcast(m))
        .select(
            "layout",
            "n_files",
            "files_touched",
            "rows_scanned",
            "rows_matching",
            F.round(
                F.col("files_touched").cast("double")
                / F.col("n_files").cast("double"),
                6,
            ).alias("file_frac"),
            F.when(
                F.col("rows_scanned") > 0,
                F.round(
                    F.col("rows_matching").cast("double")
                    / F.col("rows_scanned").cast("double"),
                    6,
                ),
            ).alias("scan_efficiency"),
        )
        .orderBy("layout")
    )


def _pagerank_oracle_sql(iters: int = 3, scale: int = 10**12,
                         damping_pct: int = 85) -> str:
    """Unrolled integer-PageRank CTE chain — the DuckDB twin of
    operators/graph.py:pagerank_integer (// mirrors Spark's div on
    the all-nonnegative ranks)."""
    teleport_mass = (100 - damping_pct) * scale // 100
    parts = [f"""
WITH edges AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT count(*) AS n FROM nodes),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
r0 AS (SELECT node, {scale} // n AS r FROM nodes CROSS JOIN nn)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
c{t} AS (
  SELECT e.dst, SUM(r.r // d.outdeg) AS c
  FROM edges e
  JOIN r{t - 1} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r{t} AS (
  SELECT n.node,
         ({teleport_mass} // nn.n)
           + ({damping_pct} * coalesce(c{t}.c, 0)) // 100 AS r
  FROM nodes n CROSS JOIN nn LEFT JOIN c{t} ON n.node = c{t}.dst
)""")
    # SUM over BIGINT promotes to HUGEINT in DuckDB, which the driver's
    # canonicalizer renders as float64 — cast back so both engines emit
    # int64 even though the row values are already identical.
    parts.append(
        f"\nSELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r{iters}"
    )
    return "".join(parts)


def _ppr_oracle_sql(iters: int = 3, scale: int = 10**12,
                    damping_pct: int = 85, seed_nation: int = 0) -> str:
    """Unrolled personalized-PageRank CTE chain — the DuckDB twin of
    operators/graph.py:pagerank_personalized. Teleport mass returns
    only to the seed set (nation-``seed_nation`` customers ∩ graph
    nodes); everything else mirrors _pagerank_oracle_sql. Edges are
    MATERIALIZED (referenced in every round's c{t})."""
    teleport_mass = (100 - damping_pct) * scale // 100
    parts = [f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                  's' || CAST(l_suppkey AS VARCHAR) AS dst
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
),
nodes AS MATERIALIZED (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
deg AS (SELECT src, count(*) AS outdeg FROM edges GROUP BY src),
seeds AS MATERIALIZED (
  SELECT n.node FROM nodes n
  JOIN (SELECT DISTINCT 'c' || CAST(c_custkey AS VARCHAR) AS node
        FROM customer WHERE c_nationkey = {seed_nation}) s
    ON n.node = s.node
),
sn AS (SELECT count(*) AS ns FROM seeds),
r0 AS (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL THEN {scale} // sn.ns ELSE 0 END AS r
  FROM nodes n CROSS JOIN sn LEFT JOIN seeds s ON n.node = s.node
)"""]
    for t in range(1, iters + 1):
        parts.append(f""",
c{t} AS (
  SELECT e.dst, SUM(r.r // d.outdeg) AS c
  FROM edges e
  JOIN r{t - 1} r ON e.src = r.node
  JOIN deg d ON e.src = d.src
  GROUP BY e.dst
),
r{t} AS (
  SELECT n.node,
         CASE WHEN s.node IS NOT NULL THEN {teleport_mass} // sn.ns ELSE 0 END
           + ({damping_pct} * coalesce(c{t}.c, 0)) // 100 AS r
  FROM nodes n CROSS JOIN sn
  LEFT JOIN seeds s ON n.node = s.node
  LEFT JOIN c{t} ON n.node = c{t}.dst
)""")
    parts.append(
        f"\nSELECT node, CAST(r AS BIGINT) AS rank_scaled FROM r{iters}"
    )
    return "".join(parts)


@_q(
    "personalized_pagerank_nation",
    _ppr_oracle_sql(iters=3, seed_nation=0),
    doc="Personalized PageRank over the customer→supplier trade graph "
    "(operators/graph.py:pagerank_personalized): the teleport mass "
    "returns ONLY to nation-0 customers (∩ graph nodes — both "
    "engines must agree on |S|), so ranks measure proximity to that "
    "nation's demand rather than global centrality — the "
    "seed-expansion retrieval primitive ('suppliers related to "
    "THESE buyers'). Exact integer arithmetic, bit-identical to the "
    "unrolled DuckDB replay; per iteration ONE edges⋈ranks shuffle + "
    "ONE dst aggregate; seed flags attached to the persisted node "
    "relation once; lineage cut per round.",
)
def q_personalized_pagerank_nation(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    seeds = (
        _t(spark, sf_dir, "customer")
        .where(F.col("c_nationkey") == 0)
        .select(
            F.concat(F.lit("c"), F.col("c_custkey").cast("string")).alias("node")
        )
    )
    return graph.pagerank_personalized(edges, seeds, iters=3)


def _cms_oracle_sql(depth: int = 4, width: int = 512, k: int = 20) -> str:
    """DuckDB twin of operators/aggregates.py:cms_heavy_hitters — the
    same md5 double-hash probes, cell counts, and min-estimate."""
    def probe(i: int) -> str:
        return f"({md5_family_sql('CAST(user_id AS VARCHAR)', i)}) % {width}"

    cell_stream = "\n  UNION ALL ".join(
        f"SELECT {i} AS i, {probe(i)} AS pos FROM events"
        for i in range(depth)
    )
    key_probes = "\n  UNION ALL ".join(
        f"SELECT user_id, {i} AS i, {probe(i)} AS pos FROM dk"
        for i in range(depth)
    )
    return f"""
WITH dk AS (SELECT DISTINCT user_id FROM events),
cell_stream AS (
  {cell_stream}
),
cells AS (SELECT i, pos, count(*) AS cnt FROM cell_stream GROUP BY i, pos),
key_probes AS (
  {key_probes}
),
est AS (
  SELECT user_id, min(cnt) AS est_cnt
  FROM key_probes JOIN cells USING (i, pos)
  GROUP BY user_id
)
SELECT user_id, est_cnt FROM est
ORDER BY est_cnt DESC, user_id ASC
LIMIT {k}
"""


@_q(
    "snm_candidate_pairs",
    """
WITH keyed AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS k
  FROM documents
),
rn AS (
  SELECT doc_id, row_number() OVER (ORDER BY k, doc_id) AS rn FROM keyed
)
SELECT least(a.doc_id, b.doc_id) AS doc_a,
       greatest(a.doc_id, b.doc_id) AS doc_b,
       CAST(b.rn - a.rn AS INT) AS dist
FROM rn a JOIN rn b ON b.rn > a.rn AND b.rn <= a.rn + 3
""",
    doc="Sorted-Neighborhood blocking over documents (Hernández & "
    "Stolfo SIGMOD'95, operators/dedup.py:sorted_neighborhood_pairs): "
    "every doc paired with its 3 successors in normalized-text order "
    "— the linear-output (n·w pairs) third blocking strategy next to "
    "LSH banding and shingle buckets, catching sorted-adjacent "
    "near-dups without collision tuning. The global order uses "
    "windows.py:global_row_numbers (range-partitioned local "
    "row_numbers + broadcast prefix offsets, ≤1 collected row per "
    "range partition) — NEVER the single-reducer global window the "
    "oracle's ROW_NUMBER() OVER (ORDER BY …) implies; neighbor "
    "pairing is an equi-join on unique consecutive integers, "
    "skew-free by construction.",
)
def q_snm_candidate_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    key = F.trim(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z0-9]+", " ")
    )
    return dd.sorted_neighborhood_pairs(d, "doc_id", key, window=3)


@_q(
    "customer_linkage_scores",
    """
WITH rn AS (
  SELECT c_custkey, c_nationkey, c_mktsegment, c_acctbal,
         row_number() OVER (ORDER BY c_acctbal, c_custkey) AS rn
  FROM customer
),
cand AS (
  SELECT least(a.c_custkey, b.c_custkey) AS doc_a,
         greatest(a.c_custkey, b.c_custkey) AS doc_b,
         a.c_nationkey AS an, b.c_nationkey AS bn,
         a.c_mktsegment AS asg, b.c_mktsegment AS bsg,
         a.c_acctbal AS aa, b.c_acctbal AS ba
  FROM rn a JOIN rn b ON b.rn > a.rn AND b.rn <= a.rn + 3
),
sc AS (
  SELECT doc_a, doc_b,
         CASE WHEN an = bn THEN 1 ELSE 0 END AS nation_match,
         CASE WHEN asg = bsg THEN 1 ELSE 0 END AS segment_match,
         CASE WHEN abs(aa - ba) <= 50 THEN 1 ELSE 0 END AS acctbal_match,
         (CASE WHEN an = bn THEN 26 ELSE -8 END
        + CASE WHEN asg = bsg THEN 14 ELSE -5 END
        + CASE WHEN abs(aa - ba) <= 50 THEN 18 ELSE -6 END) AS score
  FROM cand
)
SELECT * FROM sc WHERE score >= 30
""",
    doc="Record-linkage comparison stage (Fellegi & Sunter 1969; "
    "operators/dedup.py:linkage_score_pairs) over Sorted-Neighborhood "
    "candidates: acctbal-adjacent customer pairs scored by integer "
    "agreement weights / disagreement penalties on nation, segment, "
    "and acctbal band; threshold keeps the match/possible tier. "
    "Weights are integers by design (rounded log-likelihood ratios) "
    "so totals are exact and cross-engine identical. Plan: blocking "
    "is linear (SNM window pairs via distributed global row numbers, "
    "never a single-reducer window), scoring is two hash joins of "
    "the slim attribute relation onto the bounded pair list + pure "
    "codegen CASE arithmetic. NULL fields count as disagreement.",
)
def q_customer_linkage_scores(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    attrs = c.select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    pairs = dd.sorted_neighborhood_pairs(
        c, "c_custkey", F.col("c_acctbal"), window=3
    )
    rules = {
        "nation": (
            lambda a, b: a["c_nationkey"] == b["c_nationkey"], 26, -8,
        ),
        "segment": (
            lambda a, b: a["c_mktsegment"] == b["c_mktsegment"], 14, -5,
        ),
        "acctbal": (
            lambda a, b: F.abs(a["c_acctbal"] - b["c_acctbal"]) <= 50, 18, -6,
        ),
    }
    return dd.linkage_score_pairs(
        pairs, attrs, "c_custkey", rules, min_score=30
    )


@_q(
    "kmv_user_customer_overlap",
    f"""
WITH ha AS (
  SELECT DISTINCT {md5_long_sql("CAST(user_id AS VARCHAR)")} AS h FROM events
),
hb AS (
  SELECT DISTINCT {md5_long_sql("CAST(o_custkey AS VARCHAR)")} AS h FROM orders
),
ka AS (SELECT h FROM ha ORDER BY h LIMIT 256),
kb AS (SELECT h FROM hb ORDER BY h LIMIT 256),
ku AS (
  SELECT h FROM (SELECT h FROM ka UNION SELECT h FROM kb) u
  ORDER BY h LIMIT 256
),
ea AS (SELECT count(*) AS m, max(h) AS hk FROM ka),
eb AS (SELECT count(*) AS m, max(h) AS hk FROM kb),
eu AS (SELECT count(*) AS m, max(h) AS hk FROM ku),
ci AS (
  SELECT count(*) AS ci FROM ku
  WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)
),
est AS (
  SELECT
    CASE WHEN ea.m < 256 THEN ea.m
         ELSE CAST(round(255.0 * 1152921504606846976.0
                         / CAST(ea.hk AS DOUBLE)) AS BIGINT) END AS est_a,
    CASE WHEN eb.m < 256 THEN eb.m
         ELSE CAST(round(255.0 * 1152921504606846976.0
                         / CAST(eb.hk AS DOUBLE)) AS BIGINT) END AS est_b,
    CASE WHEN eu.m < 256 THEN eu.m
         ELSE CAST(round(255.0 * 1152921504606846976.0
                         / CAST(eu.hk AS DOUBLE)) AS BIGINT) END AS est_union,
    ci.ci AS ci
  FROM ea, eb, eu, ci
)
SELECT est_a, est_b, est_union,
       CAST(round(CAST(ci * est_union AS DOUBLE) / 256) AS BIGINT)
         AS est_intersection
FROM est
""",
    doc="Distinct-set-operation estimates — |users|, |customers|, "
    "union and intersection — from MERGED KMV sketches (Beyer et al. "
    "SIGMOD'07, operators/aggregates.py:kmv_set_estimates). The union "
    "estimate needs NO rescan (k smallest of the two sketches' "
    "hashes) and the intersection uses the ρ estimator over the union "
    "sketch — the multiset-operation capability that makes sketches "
    "composable at 100 TB (pre-computed per-partition/per-day "
    "sketches answer cross-table overlap questions without touching "
    "data again). Deterministic md5 family: the oracle replays both "
    "the m<k exact path (users: 150 < 256) and the (k−1)·2^60/h_(k) "
    "estimator path (customers: >256) bit-exactly; each input "
    "scanned once, all post-sketch relations ≤256 rows.",
)
def q_kmv_user_customer_overlap(spark, sf_dir):
    return agg.kmv_set_estimates(
        _t(spark, sf_dir, "events"), "user_id",
        _t(spark, sf_dir, "orders"), "o_custkey",
        k=256,
    )


@_q(
    "frequent_part_pairs",
    """
WITH items AS (
  SELECT DISTINCT l_orderkey AS b_, l_partkey AS i_ FROM lineitem
),
ok AS (
  SELECT i.b_, i.i_ FROM items i
  JOIN (SELECT b_ FROM items GROUP BY b_ HAVING count(*) <= 64) s USING (b_)
),
pairs AS (
  SELECT l.i_ AS a, r.i_ AS b, count(*) AS support
  FROM ok l JOIN ok r ON l.b_ = r.b_ AND l.i_ < r.i_
  GROUP BY 1, 2
  HAVING count(*) >= 2
),
supp AS (SELECT i_, count(*) AS s FROM ok GROUP BY 1),
nb AS (SELECT count(DISTINCT b_) AS nb FROM ok)
SELECT p.a, p.b, p.support,
       round(CAST(p.support * nb.nb AS DOUBLE)
             / CAST(sa.s * sb.s AS DOUBLE), 6) AS lift
FROM pairs p
JOIN supp sa ON p.a = sa.i_
JOIN supp sb ON p.b = sb.i_
CROSS JOIN nb
ORDER BY p.support DESC, p.a ASC, p.b ASC
LIMIT 100
""",
    doc="Market-basket mining: top part pairs co-ordered in the same "
    "order with support ≥ 2 and lift (operators/aggregates.py:"
    "frequent_pairs — the 2-itemset counting pass of Apriori). "
    "Within-basket self-join is quadratic in basket size, so baskets "
    "over 64 items are dropped BEFORE pairing (heavy-tail guard — one "
    "degenerate crawler basket would otherwise dominate the job); "
    "work is bounded at |baskets|·64². Pair aggregate map-side "
    "combinable; item supports broadcast back; top-100 via TakeOrdered "
    "heap with (support DESC, a, b) tiebreak. Lift from exact integer "
    "operands — engines agree bit-for-bit.",
)
def q_frequent_part_pairs(spark, sf_dir):
    return agg.frequent_pairs(
        _t(spark, sf_dir, "lineitem"),
        basket_col="l_orderkey",
        item_col="l_partkey",
        min_support=2,
        max_basket=64,
        top=100,
    )


@_q(
    "nation_revenue_trend",
    """
WITH daily AS (
  SELECT n_name,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
         sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
s AS (
  SELECT n_name,
         count(*) AS n,
         sum(CAST(x AS BIGINT)) AS sx,
         sum(CAST(rev AS DECIMAL(18,2))) AS sy,
         sum(CAST(x AS DECIMAL(18,0)) * CAST(rev AS DECIMAL(18,2))) AS sxy,
         sum(CAST(x AS BIGINT) * CAST(x AS BIGINT)) AS sxx
  FROM daily GROUP BY 1
)
SELECT n_name,
       CAST(n AS BIGINT) AS n_points,
       CASE WHEN (n * sxx - sx * sx) <> 0 THEN
         round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / CAST(n * sxx - sx * sx AS DOUBLE), 6)
       END AS slope,
       CASE WHEN (n * sxx - sx * sx) <> 0 THEN
         round((CAST(sy AS DOUBLE)
                - (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / CAST(n * sxx - sx * sx AS DOUBLE)
                  * CAST(sx AS DOUBLE))
               / CAST(n AS DOUBLE), 6)
       END AS intercept
FROM s
""",
    doc="Per-nation OLS trend of daily order revenue vs epoch-day "
    "index (operators/timeseries.py:grouped_ols_trend): millions of "
    "tiny regressions as ONE aggregate pass over closed-form "
    "sufficient statistics — no per-group iteration, no driver loop. "
    "Cross-engine exactness: the five statistics accumulate as exact "
    "integers/decimals (order-independent), and only the final "
    "slope/intercept combination runs in doubles of those exact "
    "operands with an int64-exact denominator — identical IEEE ops on "
    "identical inputs, den=0 NULL-guarded (never divided, ANSI-safe).",
)
def q_nation_revenue_trend(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("x"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "x")
        .agg(F.sum("p").alias("rev"))
    )
    return ts_ops.grouped_ols_trend(daily, "n_name", "x", "rev")


@_q(
    "cms_heavy_user_hitters",
    _cms_oracle_sql(),
    doc="Top-20 users by Count-Min-Sketch estimated event count "
    "(operators/aggregates.py:cms_heavy_hitters, Cormode & "
    "Muthukrishnan 2005), md5 double-hash family so the DuckDB oracle "
    "replays every counter bit-exactly. The sketch grid is FIXED "
    "memory (4×512 counters) independent of key cardinality and "
    "merges cell-wise — each task's local grid is a partial "
    "aggregate, the shuffle carries ≤2048 rows per task, never keys; "
    "that merge property is what makes it the 100 TB / streaming "
    "summary structure (vs an exact groupBy whose state is "
    "O(distinct keys)). Probe phase: broadcast the ≤2048-row grid, "
    "min-per-key, TakeOrdered top-k with deterministic tiebreak.",
)
def q_cms_heavy_user_hitters(spark, sf_dir):
    return agg.cms_heavy_hitters(
        _t(spark, sf_dir, "events"), "user_id", depth=4, width=512, k=20
    )


@_q(
    "orders_column_profile",
    """
WITH w AS (
  SELECT count(*) AS n,
         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_k,
         count(DISTINCT o_orderkey) AS nd_k,
         CAST(CAST(FLOOR(min(CAST(o_orderkey AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR) AS mn_k,
         CAST(CAST(FLOOR(max(CAST(o_orderkey AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR) AS mx_k,
         CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_c,
         count(DISTINCT o_custkey) AS nd_c,
         CAST(CAST(FLOOR(min(CAST(o_custkey AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR) AS mn_c,
         CAST(CAST(FLOOR(max(CAST(o_custkey AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR) AS mx_c,
         CAST(sum(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_p,
         count(DISTINCT o_totalprice) AS nd_p,
         CAST(CAST(FLOOR(min(CAST(o_totalprice AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR) AS mn_p,
         CAST(CAST(FLOOR(max(CAST(o_totalprice AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS VARCHAR) AS mx_p,
         CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_s,
         count(DISTINCT o_orderstatus) AS nd_s,
         CAST(min(o_orderstatus) AS VARCHAR) AS mn_s,
         CAST(max(o_orderstatus) AS VARCHAR) AS mx_s,
         CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_o,
         count(DISTINCT o_orderpriority) AS nd_o,
         CAST(min(o_orderpriority) AS VARCHAR) AS mn_o,
         CAST(max(o_orderpriority) AS VARCHAR) AS mx_o,
         CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_d,
         count(DISTINCT CAST(o_orderdate AS DATE)) AS nd_d,
         CAST(CAST(min(o_orderdate) AS DATE) AS VARCHAR) AS mn_d,
         CAST(CAST(max(o_orderdate) AS DATE) AS VARCHAR) AS mx_d
  FROM orders
)
SELECT 'o_orderkey' AS "column", n AS n_rows, nn_k AS n_nulls, nd_k AS n_distinct,
       mn_k AS min_num, mx_k AS max_num,
       CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str FROM w
UNION ALL
SELECT 'o_custkey', n, nn_c, nd_c, mn_c, mx_c, NULL, NULL FROM w
UNION ALL
SELECT 'o_totalprice', n, nn_p, nd_p, mn_p, mx_p, NULL, NULL FROM w
UNION ALL
SELECT 'o_orderstatus', n, nn_s, nd_s, CAST(NULL AS VARCHAR), CAST(NULL AS VARCHAR), mn_s, mx_s FROM w
UNION ALL
SELECT 'o_orderpriority', n, nn_o, nd_o, NULL, NULL, mn_o, mx_o FROM w
UNION ALL
SELECT 'o_date', n, nn_d, nd_d, NULL, NULL, mn_d, mx_d FROM w
""",
    doc="ANALYZE-style long-format column profile of orders "
    "(operators/quality.py:column_profile): one aggregate pass emits "
    "(column, n_rows, n_nulls, n_distinct, min/max) per profiled "
    "column — the statistics a cost-based optimizer or catalog "
    "crawler collects. Scan pruned to exactly the profiled columns; "
    "every stat map-side combinable except exact NDV (Spark expand), "
    "for which the operator offers approx_count_distinct (HLL++) as "
    "the 100 TB path — exact kept here so the oracle replays "
    "bit-for-bit. Numeric min/max as micro-unit integers "
    "(floor(v*1e6+0.5) AS BIGINT, rendered to text): min/max taken "
    "over the RAW double first (same selected value everywhere), "
    "then only IEEE single-op arithmetic — no decimal-cast "
    "semantics, which proved engine-version-dependent on "
    "non-2-decimal-representable doubles (the r6/r7 red-row "
    "lesson). Root cause found by the round-8 bisect probes: ALL six "
    "single-column probes failed the driver hash — including the "
    "string-only ones with no floats at all — pinning the divergence "
    "on the one cell every probe shared: n_nulls, an uncast "
    "sum(CASE..) that DuckDB types HUGEINT (int128). HUGEINT "
    "materializes as float64 through pandas/Arrow (0 → 0.0), so any "
    "driver that hashes through a dataframe sees '0.0' vs Spark's "
    "'0'. The fix is CAST(sum(..) AS BIGINT) in the oracle — every "
    "final oracle output column must land in the pandas-safe type "
    "set {BIGINT, DOUBLE, VARCHAR, DATE, TIMESTAMP, BOOLEAN}, now "
    "enforced repo-wide by tools/audit_oracle_types.py.",
)
def q_orders_column_profile(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").withColumn(
        "o_date", F.to_date("o_orderdate")
    )
    return dq.column_profile(
        o,
        num_cols=["o_orderkey", "o_custkey", "o_totalprice"],
        str_cols=["o_orderstatus", "o_orderpriority"],
        date_cols=["o_date"],
    )




# Statistical / forensic audit tier (round 9): Benford digit
# forensics, contingency association, concentration (Gini), and
# corpus-comparison log-odds — the "is this data trustworthy and
# how is it distributed" battery.
@_q(
    "benford_price_audit",
    """
WITH v AS (
  SELECT CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS cents
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
),
per AS (
  SELECT CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit,
         count(*) AS n_obs
  FROM v GROUP BY 1
),
tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n_total FROM per),
sh AS (
  SELECT digit, n_obs,
         round(CAST(n_obs AS DOUBLE) / CAST(n_total AS DOUBLE), 6) AS obs_share,
         round(log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)), 6) AS benford_share
  FROM per, tot
)
SELECT digit, n_obs, obs_share, benford_share,
       round(abs(obs_share - benford_share), 6) AS abs_dev
FROM sh ORDER BY digit
""",
    doc="Benford first-significant-digit forensic audit of "
    "o_totalprice (operators/quality.py:benford_first_digit, Benford "
    "1938 / Nigrini's fraud screen): observed first-digit shares vs "
    "the log10(1+1/d) law. Digit extracted from the EXACT integer "
    "cents string (never a float rendering — engines disagree on "
    "double formatting); one libm log10 per output row rounded 6dp. "
    "One pruned scan, 9-cell combinable groupBy, total re-derived "
    "from the 9-row cell relation via broadcast 1-row aggregate "
    "(bounded-cross).",
)
def q_benford_price_audit(spark, sf_dir):
    return dq.benford_first_digit(_t(spark, sf_dir, "orders"), "o_totalprice")


@_q(
    "priority_status_association",
    """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, count(*) AS n_cell
  FROM orders GROUP BY 1, 2
),
m AS (
  SELECT o_orderpriority, o_orderstatus, n_cell,
         CAST(sum(n_cell) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n_a,
         CAST(sum(n_cell) OVER (PARTITION BY o_orderstatus) AS BIGINT) AS n_b,
         CAST(sum(n_cell) OVER () AS BIGINT) AS n_total
  FROM cells
)
SELECT o_orderpriority, o_orderstatus, n_cell, n_a, n_b, n_total,
       round(CAST(n_cell AS DOUBLE) * CAST(n_total AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS lift,
       round(ln(CAST(n_cell AS DOUBLE) * CAST(n_total AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6) AS pmi
FROM m ORDER BY o_orderpriority, o_orderstatus
""",
    doc="Contingency-table association audit priority x status "
    "(operators/aggregates.py:contingency_assoc): joint count, both "
    "marginals, lift and pointwise mutual information per cell — the "
    "independence check run before trusting a segmentation on a "
    "cross product. Data-volume work is ONE map-side-combinable "
    "groupBy over the pruned 2-column scan; marginals are window "
    "sums over the |A|x|B|-row cell relation, never a rescan. PMI's "
    "single ln rounded 6dp from exact-integer ratio.",
)
def q_priority_status_association(spark, sf_dir):
    return agg.contingency_assoc(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


@_q(
    "customer_spend_gini",
    """
WITH per_key AS (
  SELECT c.c_mktsegment AS seg, o.o_custkey AS k,
         CAST(sum(CAST(FLOOR(CAST(o.o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS x
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
),
ranked AS (
  SELECT seg, x, row_number() OVER (PARTITION BY seg ORDER BY x, k) AS i
  FROM per_key
),
a AS (
  SELECT seg, count(*) AS n_keys,
         CAST(sum(x) AS BIGINT) AS total_cents,
         sum(CAST(i AS HUGEINT) * CAST(x AS HUGEINT)) AS s1
  FROM ranked GROUP BY 1
)
SELECT seg AS c_mktsegment, n_keys, total_cents,
       CASE WHEN total_cents <> 0 THEN
         round(CAST(2.0 AS DOUBLE) * CAST(s1 AS DOUBLE)
               / (CAST(n_keys AS DOUBLE) * CAST(total_cents AS DOUBLE))
               - (CAST(n_keys AS DOUBLE) + CAST(1.0 AS DOUBLE)) / CAST(n_keys AS DOUBLE),
               6)
       END AS gini
FROM a ORDER BY c_mktsegment
""",
    doc="Gini concentration of per-customer spend within each market "
    "segment (operators/aggregates.py:gini_by_group, Lorenz/Gini): "
    "the 'top customers drive X% of revenue' inequality number, per "
    "segment. Exact integer cents; rank-weighted sum S1 accumulates "
    "in DECIMAL(38,0)/HUGEINT (int64 overflows near 10^18 at fact "
    "scale); G = 2*S1/(n*S) - (n+1)/n as a fixed IEEE sequence on "
    "exact integers, rounded 6dp. The rank window sorts the PER-KEY "
    "relation (|customers|, not |orders|) — facts fold map-side "
    "first.",
)
def q_customer_spend_gini(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    )
    return agg.gini_by_group(j, "c_mktsegment", "o_custkey", "o_totalprice")


@_q(
    "distinctive_terms_by_source",
    """
WITH cells AS (
  SELECT source AS g, w, count(*) AS y
  FROM (SELECT source, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents)
  WHERE w <> ''
  GROUP BY 1, 2
),
sized AS (
  SELECT g, w, y,
         CAST(sum(y) OVER (PARTITION BY w) AS BIGINT) AS y_w,
         CAST(sum(y) OVER (PARTITION BY g) AS BIGINT) AS n_g
  FROM cells
),
tot AS (
  SELECT CAST(sum(y) AS BIGINT) AS n, CAST(count(DISTINCT w) AS BIGINT) AS v
  FROM cells
),
scored AS (
  SELECT g, w, y AS n_in_group,
         round((round(ln((CAST(y AS DOUBLE) + CAST(1.0 AS DOUBLE))
                         / (CAST(n_g AS DOUBLE) - CAST(y AS DOUBLE) + CAST(v AS DOUBLE))), 6)
                - round(ln((CAST(y_w - y AS DOUBLE) + CAST(1.0 AS DOUBLE))
                           / (CAST(n - n_g AS DOUBLE) - CAST(y_w - y AS DOUBLE) + CAST(v AS DOUBLE))), 6))
               / sqrt(CAST(1.0 AS DOUBLE) / (CAST(y AS DOUBLE) + CAST(1.0 AS DOUBLE))
                      + CAST(1.0 AS DOUBLE) / (CAST(y_w - y AS DOUBLE) + CAST(1.0 AS DOUBLE))),
               6) AS z_score
  FROM sized, tot
),
top AS (
  SELECT g, w, n_in_group, z_score,
         row_number() OVER (PARTITION BY g ORDER BY z_score DESC, w) AS r
  FROM scored
)
SELECT g AS source, w AS word, n_in_group, z_score
FROM top WHERE r <= 5
ORDER BY source, z_score DESC, word
""",
    doc="Per-source distinctive vocabulary via log-odds-ratio z-score "
    "with add-one smoothing (operators/textops.py:"
    "distinctive_terms_log_odds; Monroe, Colaresi & Quinn 2008 "
    "'Fightin' Words') — corpus comparison without tf-idf's length "
    "bias. One explode + one (source,word) combinable groupBy is the "
    "only data-volume work; marginals/vocab/total are windows and a "
    "broadcast 1-row aggregate over the cell relation. Each of the "
    "two ln calls per row individually rounded 6dp before "
    "subtraction; variance rational; sqrt correctly-rounded IEEE.",
)
def q_distinctive_terms_by_source(spark, sf_dir):
    return tx.distinctive_terms_log_odds(
        _t(spark, sf_dir, "documents"), "source", "text", k=5
    )


@_q(
    "event_value_ranksum_drift",
    """
WITH cells AS (
  SELECT CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         count(*) AS t,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS t_a
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
ranked AS (
  SELECT v, t, t_a,
         COALESCE(CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
  FROM cells
),
a AS (
  SELECT CAST(sum(t_a) AS BIGINT) AS n_a,
         CAST(sum(t) - sum(t_a) AS BIGINT) AS n_b,
         sum(CAST(t_a AS HUGEINT)
             * (2 * CAST(cb AS HUGEINT) + CAST(t AS HUGEINT) + 1)) AS r2a,
         sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
             - CAST(t AS HUGEINT)) AS ties
  FROM ranked
)
SELECT n_a, n_b,
       CAST(r2a - CAST(n_a AS HUGEINT) * (CAST(n_a AS HUGEINT) + 1) AS BIGINT) AS u2,
       round(CAST(r2a - CAST(n_a AS HUGEINT) * (CAST(n_a AS HUGEINT) + 1) AS DOUBLE)
             / CAST(2.0 AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS auc,
       round((CAST(r2a - CAST(n_a AS HUGEINT) * (CAST(n_a AS HUGEINT) + 1) AS DOUBLE)
              - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
             / (CAST(2.0 AS DOUBLE)
                * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(12.0 AS DOUBLE)
                       * ((CAST(n_a + n_b AS DOUBLE) + CAST(1.0 AS DOUBLE))
                          - CAST(ties AS DOUBLE)
                            / (CAST(n_a + n_b AS DOUBLE)
                               * (CAST(n_a + n_b AS DOUBLE) - CAST(1.0 AS DOUBLE)))))),
             6) AS z
FROM a
""",
    doc="Mann-Whitney U rank-sum drift test on event values, early "
    "vs late window (operators/timeseries.py:ranksum_drift; Mann & "
    "Whitney 1947, tie-corrected normal approx) — the nonparametric "
    "SIGNIFICANCE companion to event_value_drift's total-variation "
    "DISTANCE. Values become exact integer cents, so the ordered "
    "counts-below window runs over a DOMAIN-bounded cell relation "
    "(~50k rows max regardless of volume — why a single window is "
    "scale-safe here, vs windows.scalable_ranks for unbounded "
    "domains). Average-rank ties folded into exact integers "
    "(2R_a = sum(t_a*(2cb+t+1)) in DECIMAL(38,0)/HUGEINT — t_a*cb "
    "passes int64 near 1e9 rows); z is a fixed IEEE sequence on "
    "exact parts, rounded 6dp.",
)
def q_event_value_ranksum_drift(spark, sf_dir):
    return ts_ops.ranksum_drift(
        _t(spark, sf_dir, "events"), "ts", "value", "2024-01-16"
    )


@_q(
    "daily_event_acf",
    """
WITH c AS (
  SELECT CAST(ts AS DATE) AS date, count(*) AS cnt FROM events GROUP BY 1
),
span AS (SELECT min(date) AS lo, max(date) AS hi FROM c),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS date
  FROM span
),
s AS (
  SELECT spine.date, COALESCE(c.cnt, 0) AS cnt
  FROM spine LEFT JOIN c ON spine.date = c.date
),
tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_days, CAST(sum(cnt) AS BIGINT) AS sm
  FROM s
),
base AS (
  SELECT s.date,
         CAST(t.n_days AS HUGEINT) * CAST(s.cnt AS HUGEINT)
           - CAST(t.sm AS HUGEINT) AS ce,
         t.n_days
  FROM s, tot t
),
den AS (SELECT max(n_days) AS n_days, sum(ce * ce) AS den FROM base),
lags AS (SELECT CAST(unnest(generate_series(1, 7)) AS INTEGER) AS lag),
nums AS (
  SELECT l.lag, sum(b1.ce * b2.ce) AS num
  FROM base b1 JOIN lags l ON true
  JOIN base b2 ON b2.date = b1.date + l.lag
  GROUP BY l.lag
)
SELECT n.lag, d.n_days,
       round(CAST(n.num AS DOUBLE) / CAST(d.den AS DOUBLE), 6) AS r
FROM nums n, den d
ORDER BY n.lag
""",
    doc="Sample autocorrelation of the gap-filled daily event-count "
    "series at lags 1..7 (operators/timeseries.py:daily_count_acf) — "
    "the seasonality detector that justifies (or refutes) "
    "seasonal_decompose_daily's weekly model. Exact arithmetic by "
    "clearing denominators: centered terms scale to integers "
    "(n*x_t - S), numerator/denominator are DECIMAL(38,0)/HUGEINT "
    "sums of their products (squares pass 1e27 at 100 TB volume), "
    "r_k is ONE double division rounded 6dp. All lag work is "
    "date-offset self-joins of the <=days-row series; the 7-row lag "
    "frame is a literal bounded Range build.",
)
def q_daily_event_acf(spark, sf_dir):
    return ts_ops.daily_count_acf(_t(spark, sf_dir, "events"), "ts", max_lag=7)


@_q(
    "dedup_cluster_rand_index",
    f"""
WITH RECURSIVE
{_SHINGLES_CTE},
exsh AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s FROM sh
),
cjac AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS common
  FROM exsh a JOIN exsh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
),
ep AS (
  SELECT doc_a, doc_b FROM cjac
  WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) >= 0.8
),
mp AS (SELECT doc_a, doc_b FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) q),
edges_a AS (
  SELECT doc_a AS u, doc_b AS v FROM mp UNION SELECT doc_b, doc_a FROM mp
),
walk_a(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.label FROM walk_a w JOIN edges_a e ON e.u = w.node
),
lab_a AS (SELECT node AS doc_id, min(label) AS ca FROM walk_a GROUP BY node),
edges_b AS (
  SELECT doc_a AS u, doc_b AS v FROM ep UNION SELECT doc_b, doc_a FROM ep
),
walk_b(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.label FROM walk_b w JOIN edges_b e ON e.u = w.node
),
lab_b AS (SELECT node AS doc_id, min(label) AS cb FROM walk_b GROUP BY node),
cells AS (
  SELECT ca, cb, count(*) AS nij
  FROM lab_a a JOIN lab_b b ON a.doc_id = b.doc_id
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(nij) AS BIGINT) AS n_docs,
         sum(CAST(nij AS HUGEINT) * (CAST(nij AS HUGEINT) - 1)) AS t2ij
  FROM cells
),
pa AS (
  SELECT CAST(count(*) AS BIGINT) AS n_clusters_a,
         sum(CAST(ai AS HUGEINT) * (CAST(ai AS HUGEINT) - 1)) AS t2a
  FROM (SELECT ca, sum(nij) AS ai FROM cells GROUP BY 1)
),
pb AS (
  SELECT CAST(count(*) AS BIGINT) AS n_clusters_b,
         sum(CAST(bj AS HUGEINT) * (CAST(bj AS HUGEINT) - 1)) AS t2b
  FROM (SELECT cb, sum(nij) AS bj FROM cells GROUP BY 1)
),
fin AS (
  SELECT n_docs, n_clusters_a, n_clusters_b,
         CAST(n_docs AS DOUBLE) * (CAST(n_docs AS DOUBLE) - CAST(1.0 AS DOUBLE)) AS nn,
         CAST(t2ij AS DOUBLE) AS t2ijd, CAST(t2a AS DOUBLE) AS t2ad,
         CAST(t2b AS DOUBLE) AS t2bd
  FROM tot, pa, pb
),
fin2 AS (
  SELECT n_docs, n_clusters_a, n_clusters_b, nn, t2ijd, t2ad, t2bd,
         t2ijd / CAST(2.0 AS DOUBLE) AS sij,
         t2ad / CAST(2.0 AS DOUBLE) AS sa,
         t2bd / CAST(2.0 AS DOUBLE) AS sb,
         nn / CAST(2.0 AS DOUBLE) AS pp
  FROM fin
)
SELECT n_docs, n_clusters_a, n_clusters_b,
       round((nn + CAST(2.0 AS DOUBLE) * t2ijd - t2ad - t2bd) / nn, 6) AS rand_index,
       round(CASE WHEN (sa + sb) / CAST(2.0 AS DOUBLE) - sa * sb / pp <> CAST(0.0 AS DOUBLE)
                  THEN (sij - sa * sb / pp)
                       / ((sa + sb) / CAST(2.0 AS DOUBLE) - sa * sb / pp)
             END, 6) AS adjusted_rand
FROM fin2
""",
    doc="Cluster-LEVEL agreement between the MinHash-LSH dedup "
    "clustering and the exact-Jaccard clustering: Rand index + "
    "adjusted Rand (operators/graph.py:clustering_rand_index; Rand "
    "1971, Hubert & Arabie 1985). The pair-level recall evals "
    "(minhash_recall_eval) can't see this — two pair sets can mostly "
    "agree while cutting the transitive closure differently, and the "
    "CLOSURE decides which docs a dedup pass deletes. Both label "
    "relations come from the SAME hash-min CC machinery the dedup "
    "tier uses; the oracle recomputes both closures via recursive "
    "CTEs. Contingency pair counts in exact DECIMAL(38,0)/HUGEINT "
    "(n(n-1) ~ 1e24 at 1e12 docs); RI/ARI fixed IEEE sequences on "
    "exact parts, 6dp; ARI NULL when degenerate. Eval-tier cost: "
    "inherits ngram_jaccard_exact's superlinear recall-baseline "
    "shape — run sampled at scale, like the other evals.",
    scale_note="eval-tier — the exact-Jaccard side inherits "
    "ngram_jaccard_exact's superlinear hot-shingle shape; at scale "
    "run on an md5 document sample (the simhash_recall_eval recipe)",
)
def q_dedup_cluster_rand_index(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs_lsh = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    )
    pairs_ex = dd.ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.8, max_doc_freq=None
    )
    la = graph.dedup_clusters(docs, pairs_lsh)
    lb = graph.dedup_clusters(docs, pairs_ex)
    return graph.clustering_rand_index(la, lb)


@_q(
    "quality_rate_confidence",
    f"""
WITH {_CURATE_Q_CTE},
per AS (
  SELECT d.source AS g, count(*) AS n,
         CAST(sum(CASE WHEN q.quality_score >= 0.45 THEN 1 ELSE 0 END) AS BIGINT) AS k
  FROM documents d JOIN q USING (doc_id)
  GROUP BY 1
)
SELECT g AS source, n AS n_docs, k AS n_pass,
       round(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate,
       round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (CAST(2.0 AS DOUBLE) * CAST(n AS DOUBLE))) - (CAST(1.96 AS DOUBLE) * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(1.0 AS DOUBLE) - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (CAST(4.0 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))) / (CAST(1.0 AS DOUBLE) + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS ci_low,
       round(((CAST(k AS DOUBLE) / CAST(n AS DOUBLE) + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (CAST(2.0 AS DOUBLE) * CAST(n AS DOUBLE))) + (CAST(1.96 AS DOUBLE) * sqrt((CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(1.0 AS DOUBLE) - CAST(k AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / (CAST(4.0 AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))) / (CAST(1.0 AS DOUBLE) + CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS ci_high
FROM per ORDER BY g
""",
    doc="Wilson 95% confidence interval for the per-source quality-"
    "gate pass rate (operators/quality.py:rate_confidence_by_group, "
    "Wilson 1927), on the SAME quality predicate curated_documents "
    "and curation_funnel_by_source apply — before down-weighting or "
    "dropping a source over its gate rate, the interval says whether "
    "the observed gap is evidence or small-n noise; Wilson (not the "
    "naive normal interval) stays inside [0,1] at the extreme rates "
    "and small counts long-tail sources occupy. Exact int64 counts; "
    "every interval term a fixed IEEE sequence (z-squared kept as the "
    "literal product 1.96*1.96 so both engines compute the identical "
    "double); one combinable groupBy.",
)
def q_quality_rate_confidence(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    q = tx.quality_features(docs, "doc_id", "text")
    j = docs.select("doc_id", "source").join(
        q.select("doc_id", "quality_score"), "doc_id"
    )
    return dq.rate_confidence_by_group(
        j, "source", F.col("quality_score") >= 0.45
    )


@_q(
    "event_value_psi",
    """
WITH obs AS (
  SELECT CAST(greatest(0, least(19, floor(CAST(value AS DOUBLE) / 25.0))) AS INT) AS bin,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
spine AS (SELECT CAST(unnest(generate_series(0, 19)) AS INT) AS bin),
cells AS (
  SELECT s.bin, COALESCE(o.ca, 0) AS ca, COALESCE(o.cb, 0) AS cb
  FROM spine s LEFT JOIN obs o ON s.bin = o.bin
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b FROM cells
),
terms AS (
  SELECT n_a, n_b,
         round(((CAST(ca AS DOUBLE) + CAST(1.0 AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(20.0 AS DOUBLE))
                - (CAST(cb AS DOUBLE) + CAST(1.0 AS DOUBLE)) / (CAST(n_b AS DOUBLE) + CAST(20.0 AS DOUBLE)))
               * ln(((CAST(ca AS DOUBLE) + CAST(1.0 AS DOUBLE)) / (CAST(n_a AS DOUBLE) + CAST(20.0 AS DOUBLE)))
                    / ((CAST(cb AS DOUBLE) + CAST(1.0 AS DOUBLE)) / (CAST(n_b AS DOUBLE) + CAST(20.0 AS DOUBLE)))),
               6) AS term
  FROM cells, tot
)
SELECT n_a, n_b,
       round(CAST(sum(CAST(term AS DECIMAL(27,6))) AS DOUBLE), 6) AS psi
FROM terms GROUP BY n_a, n_b
""",
    doc="Population Stability Index of event values, early vs late "
    "window (operators/timeseries.py:psi_drift) — the industry-"
    "standard production drift monitor (<0.1 stable, 0.1-0.25 "
    "drifting, >0.25 shifted), completing the drift battery: TV "
    "distance bounds the gap (event_value_drift), rank-sum z gives "
    "significance (event_value_ranksum_drift), PSI is the monitored "
    "number. Fixed 20-bin spine (a bin empty in both windows still "
    "contributes under Laplace smoothing when n_a != n_b); each "
    "bin's term has ONE ln, rounded 6dp then DECIMAL(27,6)-summed "
    "(the bigram-logprob pattern) so the reduction is order-free. "
    "One pruned scan, <=20-cell combinable groupBy.",
)
def q_event_value_psi(spark, sf_dir):
    return ts_ops.psi_drift(
        _t(spark, sf_dir, "events"), "ts", "value", "2024-01-16"
    )


@_q(
    "event_value_median_ci",
    """
WITH cells AS (
  SELECT CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         count(*) AS t
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT v, CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
  FROM cells
),
tot AS (SELECT CAST(max(cum) AS BIGINT) AS n FROM cum),
ranks AS (
  SELECT n,
         greatest(1, CAST(FLOOR((CAST(n AS DOUBLE) - CAST(1.96 AS DOUBLE) * sqrt(CAST(n AS DOUBLE))) / CAST(2.0 AS DOUBLE)) AS BIGINT)) AS lr,
         CAST(FLOOR(CAST(n + 1 AS DOUBLE) / CAST(2.0 AS DOUBLE)) AS BIGINT) AS m1,
         CAST(FLOOR(CAST(n AS DOUBLE) / CAST(2.0 AS DOUBLE)) AS BIGINT) + 1 AS m2
  FROM tot
),
sel AS (
  SELECT r.n,
         min(CASE WHEN c.cum >= r.lr THEN c.v END) AS vl,
         min(CASE WHEN c.cum >= least(r.n, r.n + 1 - r.lr) THEN c.v END) AS vu,
         min(CASE WHEN c.cum >= r.m1 THEN c.v END) AS vm1,
         min(CASE WHEN c.cum >= r.m2 THEN c.v END) AS vm2
  FROM cum c, ranks r
  GROUP BY r.n
)
SELECT n AS n_values,
       round((CAST(vm1 AS DOUBLE) + CAST(vm2 AS DOUBLE)) / CAST(2.0 AS DOUBLE) / CAST(100.0 AS DOUBLE), 6) AS median,
       round(CAST(vl AS DOUBLE) / CAST(100.0 AS DOUBLE), 6) AS ci_low,
       round(CAST(vu AS DOUBLE) / CAST(100.0 AS DOUBLE), 6) AS ci_high
FROM sel
""",
    doc="Distribution-free 95% confidence interval for the median of "
    "event values via order statistics (operators/aggregates.py:"
    "median_ci): ranks floor((n - 1.96*sqrt(n))/2) and n+1-l bracket "
    "the true median for ANY continuous distribution — no normality, "
    "no bootstrap, no randomness; the inference companion to the "
    "exact-quantile tier. Same bounded-domain move as ranksum_drift: "
    "integer cents cells (<= ~50k regardless of volume), order "
    "statistics as min-over-threshold on the running total, rank "
    "arithmetic a fixed IEEE sequence on exact n. One scan, one tiny "
    "shuffle, one bounded window.",
)
def q_event_value_median_ci(spark, sf_dir):
    return agg.median_ci(_t(spark, sf_dir, "events"), "value")


@_q(
    "price_quantity_spearman",
    """
WITH xc AS (SELECT l_quantity AS v, count(*) AS t FROM lineitem GROUP BY 1),
xr AS (
  SELECT v,
         2 * COALESCE(CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           + t + 1 AS r2
  FROM xc
),
yc AS (SELECT l_extendedprice AS v, count(*) AS t FROM lineitem GROUP BY 1),
yr AS (
  SELECT v,
         2 * COALESCE(CAST(sum(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
           + t + 1 AS r2
  FROM yc
),
j AS (
  SELECT xr.r2 AS rx, yr.r2 AS ry
  FROM lineitem l
  JOIN xr ON l.l_quantity = xr.v
  JOIN yr ON l.l_extendedprice = yr.v
),
m AS (
  SELECT count(*) AS n,
         sum(CAST(rx AS HUGEINT)) AS sx,
         sum(CAST(ry AS HUGEINT)) AS sy,
         sum(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy,
         sum(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
         sum(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy
  FROM j
)
SELECT n AS n_rows,
       round(
         (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) AS rho
FROM m
""",
    doc="Spearman rank correlation of quantity vs extended price "
    "(operators/aggregates.py:spearman_corr) — Pearson on average "
    "ranks: the robust monotone-relationship companion to "
    "price_quantity_corr, immune to outliers and monotone rescaling "
    "(the pair reads like mean/stddev vs median/MAD). Average ranks "
    "kept INTEGER via r2 = 2*count_below + ties + 1 over each "
    "column's DISTINCT-value relation (quantity: 50 cells; price: "
    "the distinct-price relation — for unbounded domains swap in "
    "windows.scalable_ranks' range partitioning); rank moments in "
    "DECIMAL(38,0)/HUGEINT (r2^2*n passes int64 near 1e6 rows); "
    "final rho the identical IEEE sequence as the Pearson query.",
)
def q_price_quantity_spearman(spark, sf_dir):
    return agg.spearman_corr(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_extendedprice"
    )


@_q(
    "quantity_discount_kendall",
    """
WITH grid AS (
  SELECT l_quantity AS x, l_discount AS y, count(*) AS n
  FROM lineitem GROUP BY 1, 2
),
cd AS (
  SELECT
    CAST(sum(CASE WHEN a.y < b.y THEN CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS c,
    CAST(sum(CASE WHEN a.y > b.y THEN CAST(a.n AS HUGEINT) * CAST(b.n AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END) AS HUGEINT) AS d
  FROM grid a JOIN grid b ON a.x < b.x
),
tx AS (
  SELECT sum(CAST(t AS HUGEINT) * (CAST(t AS HUGEINT) - 1)) AS tx2,
         CAST(sum(t) AS BIGINT) AS n_rows
  FROM (SELECT x, sum(n) AS t FROM grid GROUP BY 1)
),
ty AS (
  SELECT sum(CAST(t AS HUGEINT) * (CAST(t AS HUGEINT) - 1)) AS ty2
  FROM (SELECT y, sum(n) AS t FROM grid GROUP BY 1)
)
SELECT n_rows,
       CAST(c * 2 AS BIGINT) AS concordant2,
       CAST(d * 2 AS BIGINT) AS discordant2,
       round(CAST(2.0 AS DOUBLE) * (CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
             / sqrt((CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - CAST(1.0 AS DOUBLE))
                       - CAST(tx2 AS DOUBLE))
                    * (CAST(n_rows AS DOUBLE) * (CAST(n_rows AS DOUBLE) - CAST(1.0 AS DOUBLE))
                         - CAST(ty2 AS DOUBLE))), 6) AS tau_b
FROM cd, tx, ty
""",
    doc="Kendall tau-b of quantity vs discount "
    "(operators/aggregates.py:kendall_tau_b) — the ordinal-"
    "association member of the correlation tier (Pearson: linear; "
    "Spearman: monotone; Kendall: pairwise ordinal agreement with "
    "tie correction). Exact at ANY row count because both domains "
    "are bounded: concordant/discordant pairs come from a self-join "
    "of the <=550-cell contingency GRID (50 quantities x 11 "
    "discounts), never row pairs; C ~ n^2/2 accumulates in "
    "DECIMAL(38,0)/HUGEINT; the denominator factors multiply in "
    "DOUBLE (their product passes 1e38). Grid build sides carry the "
    "literal-limit bounded-build idiom for the plan auditor.",
)
def q_quantity_discount_kendall(spark, sf_dir):
    return agg.kendall_tau_b(
        _t(spark, sf_dir, "lineitem"), "l_quantity", "l_discount"
    )


@_q(
    "corpus_zipf_fit",
    """
WITH counts AS (
  SELECT w, count(*) AS c
  FROM (SELECT trim(unnest(string_split_regex(trim(lower(text)), '\\s+'))) AS w
        FROM documents)
  WHERE w <> ''
  GROUP BY w
),
head AS (SELECT w, c FROM counts ORDER BY c DESC, w LIMIT 1000),
pts AS (
  SELECT round(ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE)), 6) AS lr,
         round(ln(CAST(c AS DOUBLE)), 6) AS lf
  FROM head
),
m AS (
  SELECT count(*) AS n,
         sum(CAST(round(lr, 6) AS DECIMAL(27,6))) AS sx,
         sum(CAST(round(lf, 6) AS DECIMAL(27,6))) AS sy,
         sum(CAST(round(lr * lf, 6) AS DECIMAL(27,6))) AS sxy,
         sum(CAST(round(lr * lr, 6) AS DECIMAL(27,6))) AS sxx
  FROM pts
),
d AS (
  SELECT CAST(n AS BIGINT) AS n_points,
         CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
         CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
         CAST(sxx AS DOUBLE) AS sxxd
  FROM m
)
SELECT n_points,
       round((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd), 6) AS slope,
       round((syd - (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) * sxd) / nd, 6)
         AS intercept
FROM d
""",
    doc="Zipf rank-frequency fit over the vocabulary head "
    "(operators/textops.py:zipf_fit; Zipf 1949): OLS of ln(freq) on "
    "ln(rank) for the top-1000 words — natural text runs near slope "
    "-1; much flatter signals templated/boilerplate-heavy text, much "
    "steeper a degenerate vocabulary. Head-only via a TakeOrdered "
    "k-heap (never a global sort; the tail, where Zipf breaks "
    "anyway, never enters). Each ln rounded 6dp; every OLS "
    "sufficient statistic a 6dp term summed in DECIMAL(27,6) (the "
    "bigram-logprob order-free pattern); slope/intercept fixed IEEE "
    "sequences on the exact sums.",
)
def q_corpus_zipf_fit(spark, sf_dir):
    return tx.zipf_fit(_t(spark, sf_dir, "documents"), "text", top_k=1000)


@_q(
    "readability_scores",
    """
WITH base AS (
  SELECT doc_id, trim(lower(text)) AS t FROM documents
),
f AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(t, '\\s+'), w -> w <> '')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(t, '[.!?]+')) AS BIGINT) AS n_term,
         CAST(len(regexp_extract_all(t, '[aeiouy]+')) AS BIGINT) AS n_syllables
  FROM base
)
SELECT doc_id, n_words,
       CASE WHEN n_words > 0 THEN greatest(n_term, 1) END AS n_sentences,
       n_syllables,
       CASE WHEN n_words > 0 AND n_syllables > 0 THEN
         round(CAST(0.39 AS DOUBLE)
                 * (CAST(n_words AS DOUBLE) / CAST(greatest(n_term, 1) AS DOUBLE))
               + CAST(11.8 AS DOUBLE)
                 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
               - CAST(15.59 AS DOUBLE), 6)
       END AS fk_grade
FROM f
""",
    doc="Flesch-Kincaid-style readability per document "
    "(operators/textops.py:readability_scores) — the standard corpus "
    "filter signal (too-low grade = fragmentary text; too-high = OCR "
    "noise / run-on boilerplate). Words, terminator-run sentences, "
    "vowel-group syllable proxy, FK grade 0.39*(w/s) + 11.8*(syl/w) "
    "- 15.59. Pure Catalyst regexp counting: one map-side pass, no "
    "shuffle, RATIONAL arithmetic only; degenerate docs NULL-guarded.",
)
def q_readability_scores(spark, sf_dir):
    return tx.readability_scores(
        _t(spark, sf_dir, "documents"), "doc_id", "text"
    )


@_q(
    "corpus_health_report",
    f"""
WITH {_CURATE_Q_CTE},
base AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
         CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
  FROM documents
),
fp AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(DISTINCT md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))) AS BIGINT) AS nd
  FROM documents
),
qa AS (
  SELECT round(CAST(sum(CAST(round(quality_score, 6) AS DECIMAL(27,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_quality,
         round(CAST(sum(CASE WHEN quality_score >= 0.45 THEN 1 ELSE 0 END) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS gate_pass_rate
  FROM q
),
counts AS (
  SELECT w, count(*) AS c
  FROM (SELECT trim(unnest(string_split_regex(trim(lower(text)), '\\s+'))) AS w
        FROM documents)
  WHERE w <> ''
  GROUP BY w
),
head AS (SELECT w, c FROM counts ORDER BY c DESC, w LIMIT 1000),
pts AS (
  SELECT round(ln(CAST(row_number() OVER (ORDER BY c DESC, w) AS DOUBLE)), 6) AS lr,
         round(ln(CAST(c AS DOUBLE)), 6) AS lf
  FROM head
),
zm AS (
  SELECT CAST(count(*) AS DOUBLE) AS nd_,
         CAST(sum(CAST(round(lr, 6) AS DECIMAL(27,6))) AS DOUBLE) AS sx,
         CAST(sum(CAST(round(lf, 6) AS DECIMAL(27,6))) AS DOUBLE) AS sy,
         CAST(sum(CAST(round(lr * lf, 6) AS DECIMAL(27,6))) AS DOUBLE) AS sxy,
         CAST(sum(CAST(round(lr * lr, 6) AS DECIMAL(27,6))) AS DOUBLE) AS sxx
  FROM pts
),
zf AS (
  SELECT round((nd_ * sxy - sx * sy) / (nd_ * sxx - sx * sx), 6) AS zipf_slope
  FROM zm
),
fk AS (
  SELECT doc_id, trim(lower(text)) AS t FROM documents
),
fk2 AS (
  SELECT CAST(len(list_filter(string_split_regex(t, '\\s+'), w -> w <> '')) AS BIGINT) AS n_words,
         CAST(len(regexp_extract_all(t, '[.!?]+')) AS BIGINT) AS n_term,
         CAST(len(regexp_extract_all(t, '[aeiouy]+')) AS BIGINT) AS n_syl
  FROM fk
),
fk3 AS (
  SELECT round(CAST(sum(CAST(round(CAST(0.39 AS DOUBLE)
                    * (CAST(n_words AS DOUBLE) / CAST(greatest(n_term, 1) AS DOUBLE))
                  + CAST(11.8 AS DOUBLE)
                    * (CAST(n_syl AS DOUBLE) / CAST(n_words AS DOUBLE))
                  - CAST(15.59 AS DOUBLE), 6) AS DECIMAL(27,6))) AS DOUBLE)
               / CAST(sum(CASE WHEN n_words > 0 AND n_syl > 0 THEN 1 ELSE 0 END) AS DOUBLE),
               6) AS mean_fk_grade
  FROM fk2 WHERE n_words > 0 AND n_syl > 0
)
SELECT b.n_docs, b.n_sources, b.n_langs,
       round(CAST(1.0 AS DOUBLE) - CAST(fp.nd AS DOUBLE) / CAST(fp.n AS DOUBLE), 6) AS dup_rate,
       qa.mean_quality, qa.gate_pass_rate, zf.zipf_slope, fk3.mean_fk_grade
FROM base b, fp, qa, zf, fk3
""",
    doc="ONE-ROW corpus health dashboard composing five tiers in a "
    "single declarative plan: size/diversity counts, exact-"
    "fingerprint duplicate rate, mean quality + gate pass rate (the "
    "exact curate predicate), the Zipf head slope, and mean "
    "Flesch-Kincaid grade — the table a data-curation standup reads. "
    "Every sub-metric reuses the SAME operators its standalone query "
    "verifies (quality_features, doc_fingerprints, zipf_fit, "
    "readability_scores); the 1-row aggregates meet via broadcast "
    "cross joins (bounded-cross). Mean aggregates are 6dp-rounded "
    "terms DECIMAL-summed — order-free.",
)
def q_corpus_health_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    base = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct("source").alias("n_sources"),
        F.count_distinct("lang").alias("n_langs"),
    )
    # Every per-count division is guarded for the count = 0 (empty
    # relation) case — NULL rates, SQL semantics, never an ANSI crash.
    fp = tx.doc_fingerprints(docs, "doc_id", "text").agg(
        F.when(
            F.count(F.lit(1)) > 0,
            F.lit(1.0)
            - F.count_distinct("fingerprint").cast("double")
            / F.count(F.lit(1)).cast("double"),
        ).alias("__dup")
    ).select(F.round("__dup", 6).alias("dup_rate"))
    q = tx.quality_features(docs, "doc_id", "text")
    qa = q.agg(
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.sum(
                    F.round("quality_score", 6).cast("decimal(27,6)")
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ),
        ).alias("mean_quality"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.sum(
                    F.when(F.col("quality_score") >= 0.45, 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ),
        ).alias("gate_pass_rate"),
    )
    zf = tx.zipf_fit(docs, "text", top_k=1000).select(
        F.col("slope").alias("zipf_slope")
    )
    fk = (
        tx.readability_scores(docs, "doc_id", "text")
        .where(F.col("fk_grade").isNotNull())
        .agg(
            F.round(
                F.sum(F.round("fk_grade", 6).cast("decimal(27,6)")).cast(
                    "double"
                )
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("mean_fk_grade")
        )
    )
    return (
        base.crossJoin(F.broadcast(fp))
        .crossJoin(F.broadcast(qa))
        .crossJoin(F.broadcast(zf))
        .crossJoin(F.broadcast(fk))
        .select(
            "n_docs", "n_sources", "n_langs", "dup_rate",
            "mean_quality", "gate_pass_rate", "zipf_slope",
            "mean_fk_grade",
        )
    )


@_q(
    "event_type_burstiness",
    """
WITH daily AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS d, count(*) AS x
  FROM events GROUP BY 1, 2
),
m AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_days,
         sum(CAST(x AS HUGEINT)) AS s,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q
  FROM daily GROUP BY 1
)
SELECT g AS event_type, n_days,
       round(CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS mean_daily,
       CASE WHEN s > 0 THEN
         round((CAST(n_days AS DOUBLE) * CAST(q AS DOUBLE)
                  - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
               / (CAST(n_days AS DOUBLE) * CAST(s AS DOUBLE)), 6)
       END AS fano
FROM m ORDER BY event_type
""",
    doc="Fano factor (index of dispersion) of daily counts per event "
    "type (operators/timeseries.py:burstiness_by_group) — var/mean "
    "== 1 for Poisson traffic, >>1 bursty (retry storms, bot "
    "floods), <<1 rate-limited; pairs with daily_event_acf (rhythm "
    "vs clumping). Denominators cleared so the ONLY float op is one "
    "double division of exact DECIMAL(38,0)/HUGEINT moments (Q ~ "
    "1e23 at 1e10 rows/day); zero-mean groups NULL-guarded. One "
    "combinable (type, day) groupBy + a tiny moment aggregate.",
)
def q_event_type_burstiness(spark, sf_dir):
    return ts_ops.burstiness_by_group(
        _t(spark, sf_dir, "events"), "ts", "event_type"
    )


# Supplier co-supply k-NN graph: each supplier keeps its 3 strongest
# co-supply partners (shared-order count, deterministic tiebreak) — a
# scale-free construction shared by the triangle / k-core queries.
KNN_EDGES_CTE = """co AS (
  SELECT l1.l_suppkey AS a, l2.l_suppkey AS b,
         count(DISTINCT l1.l_orderkey) AS cnt
  FROM lineitem l1 JOIN lineitem l2 ON l1.l_orderkey = l2.l_orderkey
  WHERE l1.l_suppkey <> l2.l_suppkey
  GROUP BY 1, 2
),
knn AS (
  SELECT a, b FROM (
    SELECT a, b,
           row_number() OVER (PARTITION BY a ORDER BY cnt DESC, b ASC) AS rk
    FROM co
  ) WHERE rk <= 3
),
und AS (SELECT DISTINCT least(a, b) AS a, greatest(a, b) AS b FROM knn)"""


def _supplier_knn_edges(spark, sf_dir) -> DataFrame:
    """Spark twin of KNN_EDGES_CTE's ``knn`` relation (directed pairs;
    consumers symmetrize/dedup as needed).

    The (orderkey, suppkey) dedup runs BEFORE the self-join, not as a
    count_distinct after it: a supplier appears once per LINEITEM but
    co-supply counts orders, so deduping first both shrinks the
    self-join input (orders × suppliers, not orders × lineitems) and
    turns the expensive distinct-aggregate into a plain map-side-
    combinable count — identical result (count DISTINCT orderkey ==
    plain count over deduped pairs), measured ~2× on the shared
    kcore/triangles graph build."""
    from pyspark.sql import Window

    l = (
        _t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    r = l.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("b")
    )
    co = (
        l.join(r, (F.col("l_orderkey") == F.col("o2")))
        .where(F.col("l_suppkey") != F.col("b"))
        .groupBy(F.col("l_suppkey").alias("a"), "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("a").orderBy(F.desc("cnt"), F.asc("b"))
    return (
        co.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
        .select("a", "b")
    )


@_q(
    "supplier_graph_assortativity",
    "WITH "
    + KNN_EDGES_CTE
    + """,
sym AS (SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und),
deg AS (SELECT u, CAST(count(*) AS BIGINT) AS d FROM sym GROUP BY 1),
pairs AS (
  SELECT du.d AS dx, dv.d AS dy
  FROM sym JOIN deg du ON sym.u = du.u JOIN deg dv ON sym.v = dv.u
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n2,
         sum(CAST(dx AS HUGEINT)) AS sx,
         sum(CAST(dy AS HUGEINT)) AS sy,
         sum(CAST(dx AS HUGEINT) * CAST(dy AS HUGEINT)) AS sxy,
         sum(CAST(dx AS HUGEINT) * CAST(dx AS HUGEINT)) AS sxx,
         sum(CAST(dy AS HUGEINT) * CAST(dy AS HUGEINT)) AS syy
  FROM pairs
)
SELECT CAST(n2 / 2 AS BIGINT) AS n_edges,
       CASE WHEN CAST(n2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) > 0
             AND CAST(n2 AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) > 0 THEN
         round((CAST(n2 AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (sqrt(CAST(n2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                         - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                  * sqrt(CAST(n2 AS DOUBLE) * CAST(syy AS DOUBLE)
                           - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS assortativity
FROM m
""",
    doc="Degree assortativity of the supplier co-supply k-NN graph "
    "(operators/graph.py:degree_assortativity; Newman 2002): Pearson "
    "over endpoint degrees, both orientations per undirected edge — "
    "positive = hubs link hubs, negative = hub-and-spoke; on a dedup/"
    "co-occurrence graph this decides whether CC needs the O(log d) "
    "star variant. Shares the exact edge construction the triangle/"
    "k-core queries verify; integer degrees, DECIMAL(38,0)/HUGEINT "
    "moments, one IEEE tail; degree-regular graphs NULL-guarded.",
)
def q_supplier_graph_assortativity(spark, sf_dir):
    knn = _supplier_knn_edges(spark, sf_dir)
    und = knn.select(
        F.least("a", "b").alias("a"), F.greatest("a", "b").alias("b")
    ).distinct()
    return graph.degree_assortativity(und, "a", "b")


@_q(
    "supplier_knn_triangles",
    "WITH "
    + KNN_EDGES_CTE
    + """,
deg AS (
  SELECT node, count(*) AS deg FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY node
),
oriented AS (
  SELECT CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
              THEN u.a ELSE u.b END AS u,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
              THEN u.b ELSE u.a END AS v,
         CASE WHEN (da.deg < db.deg) OR (da.deg = db.deg AND u.a < u.b)
              THEN db.deg ELSE da.deg END AS dv
  FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node
),
wedges AS (
  SELECT e1.u, e1.v AS v1, e2.v AS v2
  FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u
  WHERE (e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v)
),
tri AS (
  SELECT w.u, w.v1, w.v2
  FROM wedges w JOIN oriented o ON w.v1 = o.u AND w.v2 = o.v
),
tri_nodes AS (
  SELECT u AS node FROM tri
  UNION ALL SELECT v1 FROM tri
  UNION ALL SELECT v2 FROM tri
)
SELECT node, count(*) AS n_triangles FROM tri_nodes GROUP BY node
""",
    doc="Per-node triangle counts over the supplier k-NN co-supply "
    "graph (operators/graph.py:triangle_counts — compact-forward with "
    "degree-ordered orientation, Latapy 2008 / Suri & Vassilvitskii "
    "WWW'11). The graph keeps each supplier's 3 strongest co-supply "
    "partners (count of shared orders, deterministic (cnt DESC, id) "
    "tiebreak) — a scale-free construction: density never degenerates "
    "to complete (small SF) or empty (large SF) as absolute thresholds "
    "do. Orientation from the lower-(deg,id) endpoint bounds every "
    "out-degree by O(sqrt(m)), so the wedge self-join is O(m^1.5) "
    "worst-case instead of hub-quadratic — THE known-safe triangle "
    "plan at 100 TB. 3 shuffles past the degree agg; no driver "
    "collect; each triangle enumerated exactly once via the "
    "(deg,id)-chain u<v<w.",
)
def q_supplier_knn_triangles(spark, sf_dir):
    return graph.triangle_counts(_supplier_knn_edges(spark, sf_dir), "a", "b")


def _kcore_oracle_sql(k: int = 3, rounds: int = 8) -> str:
    """Unrolled peel rounds — the DuckDB twin of graph.py:kcore_peel.
    Round t: degrees over the round-(t-1) survivor set, keep >= k.
    Peeling is monotone, so rounds past the fixpoint are no-ops and
    the fixed unroll equals Spark's early-exited loop (see operator
    docstring for the anytime contract).

    MATERIALIZED hints are load-bearing: DuckDB inlines plain CTEs at
    every reference, and sym / each a{{t}} is referenced twice per
    round — inlined, the k-NN base query re-evaluates exponentially
    down the unroll (measured 69s vs 1.3s at sf0.01)."""
    parts = [
        "WITH "
        + KNN_EDGES_CTE.replace("co AS (", "co AS MATERIALIZED (")
        + """,
sym AS MATERIALIZED (
  SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
),
a0 AS (SELECT DISTINCT u AS node FROM sym)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(f""",
d{t} AS (
  SELECT s.u, count(*) AS core_deg
  FROM sym s JOIN a{t - 1} x ON s.u = x.node JOIN a{t - 1} y ON s.v = y.node
  GROUP BY s.u
),
a{t} AS MATERIALIZED (SELECT u AS node FROM d{t} WHERE core_deg >= {k})""")
    parts.append(
        f"\nSELECT u AS node, CAST(core_deg AS BIGINT) AS core_deg"
        f"\nFROM d{rounds} WHERE core_deg >= {k}"
    )
    return "".join(parts)


@_q(
    "supplier_kcore",
    _kcore_oracle_sql(k=3, rounds=8),
    doc="3-core of the supplier k-NN co-supply graph (operators/"
    "graph.py:kcore_peel — iterative peeling, Seidman 1983): "
    "repeatedly drop suppliers with < 3 surviving co-supply partners; "
    "what remains is the densely inter-connected trade core, the "
    "graph-side density screen (spam rings / bot cliques in a "
    "curation pipeline). Anytime contract like pagerank: both engines "
    "run exactly 8 peel rounds; peeling is monotone so early "
    "convergence equals the full unroll. Per round ONE survivor "
    "semi-join + ONE map-side-combinable degree count; survivor "
    "lineage cut every round (eager localCheckpoint); edges "
    "symmetrize + dedup once, persisted across rounds.",
)
def q_supplier_kcore(spark, sf_dir):
    return graph.kcore_peel(
        _supplier_knn_edges(spark, sf_dir), k=3, rounds=8, src="a", dst="b"
    )


@_q(
    "event_value_mad_outliers",
    """
WITH m AS (SELECT quantile_cont(CAST(value AS DOUBLE), 0.5) AS med FROM events),
d AS (SELECT event_id, CAST(value AS DOUBLE) AS v, m.med,
             abs(CAST(value AS DOUBLE) - m.med) AS ad
      FROM events, m),
s AS (SELECT quantile_cont(ad, 0.5) AS mad FROM d),
z AS (
  SELECT event_id, v AS value,
         CASE WHEN s.mad > 0
              THEN round(0.6745 * (d.v - d.med) / s.mad, 6) END AS robust_z
  FROM d, s
)
SELECT * FROM z WHERE abs(robust_z) > 3.5
""",
    doc="Median/MAD robust outlier screen on event values (operators/"
    "quality.py:mad_outliers, Hampel's rule): |0.6745·(x−med)/MAD| > "
    "3.5. The mean/stddev z-score family has breakdown point 0 — the "
    "heavy tail being hunted drags its own yardstick (this fixture's "
    "value column: max robust-z 12.8 but max classic-z far lower "
    "because the tail inflates sigma); median and MAD have breakdown "
    "50%. Two 1-row exact-median aggregates broadcast back as "
    "literals, flagging pass map-side; MAD==0 NULL-guarded (no ANSI "
    "divide-by-zero; degenerate corpus → empty result). At true scale "
    "swap percentile → percentile_approx (mergeable sketch).",
)
def q_event_value_mad_outliers(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_id", "value")
    return dq.mad_outliers(e, "event_id", "value", z_threshold=3.5)


@_q(
    "event_value_drift",
    """
WITH binned AS (
  SELECT event_type AS grp,
         CAST(greatest(0, least(19, floor(value / 25.0))) AS INT) AS bin,
         sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS bb
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
tot AS (
  SELECT grp, CAST(sum(a) AS BIGINT) AS n_a, CAST(sum(bb) AS BIGINT) AS n_b,
         count(*) AS occ
  FROM binned GROUP BY 1
),
terms AS (
  SELECT b.grp, t.n_a, t.n_b, t.occ,
         abs(CAST(b.a + 1 AS HUGEINT) * CAST(t.n_b + 20 AS HUGEINT)
           - CAST(b.bb + 1 AS HUGEINT) * CAST(t.n_a + 20 AS HUGEINT)) AS anum
  FROM binned b JOIN tot t ON b.grp = t.grp
)
SELECT grp AS event_type, n_a, n_b,
       round(CAST(sum(anum)
                  + (20 - occ) * abs(CAST(n_b AS HUGEINT) - CAST(n_a AS HUGEINT))
             AS DOUBLE)
             / CAST(CAST(n_a + 20 AS HUGEINT) * CAST(n_b + 20 AS HUGEINT) AS DOUBLE)
             / 2.0, 6) AS tv,
       round(CAST(greatest(max(anum),
                           CASE WHEN occ < 20
                                THEN abs(CAST(n_b AS HUGEINT) - CAST(n_a AS HUGEINT))
                                ELSE CAST(0 AS HUGEINT) END)
             AS DOUBLE)
             / CAST(CAST(n_a + 20 AS HUGEINT) * CAST(n_b + 20 AS HUGEINT) AS DOUBLE),
             6) AS max_dev
FROM terms
GROUP BY grp, n_a, n_b, occ
""",
    doc="Distribution-drift gate per event type (operators/"
    "timeseries.py:histogram_drift): value histograms before vs after "
    "2024-01-16 compared by total-variation distance and worst-bin "
    "deviation over 20 Laplace-smoothed fixed-width bins. Metrics are "
    "deliberately rational (PSI/KL need ln — not correctly-rounded "
    "across libms): both reduce to EXACT integer sums/maxes over a "
    "per-group common denominator, with ONE double division at the "
    "end — deterministic across engines, partition counts, and AQE "
    "re-plans. DECIMAL(38,0) accumulation (HUGEINT in the oracle): "
    "num_i reaches ~1e24 at 1e12-row groups, past int64. Plan: ONE "
    "(group, bin) shuffle with conditional partial counts + tiny "
    "broadcast-back of group totals; empty bins enter via a "
    "closed-form correction, not a densifying spine join.",
)
def q_event_value_drift(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("event_type", "ts", "value")
    return ts_ops.histogram_drift(
        e, "ts", "value", "event_type", split="2024-01-16",
        bin_width=25.0, n_bins=20,
    )


@_q(
    "corpus_diversity_by_source",
    r"""
WITH tok AS (
  SELECT source AS grp,
         trim(unnest(string_split_regex(trim(lower(text)), '\s+'))) AS w
  FROM documents
),
counts AS (
  SELECT grp, w, count(*) AS n FROM tok WHERE w <> '' GROUP BY grp, w
),
g AS (
  SELECT grp,
         CAST(sum(n) AS BIGINT) AS n_tokens,
         count(*) AS n_types,
         sum(CAST(n AS HUGEINT) * CAST(n - 1 AS HUGEINT)) AS same2,
         CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax
  FROM counts GROUP BY grp
)
SELECT grp AS source, n_tokens, n_types,
       round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
       CASE WHEN n_tokens > 1 THEN
         round(1.0 - CAST(same2 AS DOUBLE)
               / CAST(CAST(n_tokens AS HUGEINT) * CAST(n_tokens - 1 AS HUGEINT) AS DOUBLE), 6)
       END AS gini_simpson,
       round(CAST(hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6) AS hapax_ratio
FROM g
""",
    doc="Lexical-diversity profile per document source (operators/"
    "textops.py:diversity_by_group): type-token ratio, Gini-Simpson "
    "diversity (P[two tokens drawn w/o replacement differ]), hapax "
    "ratio — the corpus-mix dashboard that catches boilerplate "
    "sources (low diversity) and OCR-noise sources (inflated hapax "
    "share) before they enter a training mixture. All metrics "
    "RATIONAL by design (entropy needs ln — not correctly-rounded "
    "across libms); Σnᵢ(nᵢ−1) accumulates in DECIMAL(38,0)/HUGEINT "
    "(past int64 at ~1e10-count types), single double division at "
    "the end. Plan: explode → ONE map-side-combinable (source, "
    "token) count → ONE source rollup.",
)
def q_corpus_diversity_by_source(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("source", "text")
    return tx.diversity_by_group(d, "source", "text")


@_q(
    "event_sequence_motifs",
    """
WITH steps AS (
  SELECT event_type AS t1,
         lead(event_type, 1) OVER w AS t2,
         lead(event_type, 2) OVER w AS t3
  FROM events
  WHERE event_type IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT t1 || '>' || t2 || '>' || t3 AS motif, count(*) AS cnt
FROM steps WHERE t3 IS NOT NULL
GROUP BY 1
ORDER BY cnt DESC, motif ASC
LIMIT 100
""",
    doc="Population-wide contiguous 3-step behavior motifs (operators/"
    "behavior.py:sequence_motifs): per-user streams ordered by (ts, "
    "event_id), every consecutive type trigram counted and top-100 "
    "ranked — the exploratory flip side of funnel_counts (which "
    "verifies ONE hypothesized path; this surfaces which paths "
    "exist). ONE per-user window pass (two lead()s, user-keyed "
    "shuffle — maximally spread, never salted), map-side-combinable "
    "count, TakeOrderedAndProject top-k with lexicographic tiebreak; "
    "unique event_id tiebreak makes equal-ts ordering deterministic "
    "across engines.",
)
def q_event_sequence_motifs(spark, sf_dir):
    from .operators import behavior as bh

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    return bh.sequence_motifs(e, "user_id", "ts", "event_type", "event_id", top=100)


@_q(
    "pagerank_supplier_graph",
    _pagerank_oracle_sql(iters=3),
    doc="3-iteration PageRank over the customer→supplier trade graph "
    "(operators/graph.py:pagerank_integer) in EXACT integer "
    "arithmetic — ranks scaled by 1e12, every step integer div/mul/"
    "add, so the result is bit-identical across engines and partition "
    "counts (FP PageRank is neither). Per iteration: ONE shuffle join "
    "(edges ⋈ ranks on src) + ONE groupBy(dst) with map-side partial "
    "sums; node count is one driver scalar (the CC per-round count "
    "budget), folded in as a literal. Edges dedup "
    "once up front; on a cluster, pre-partition edges by src and "
    "every iteration reuses the exchange.",
)
def q_pagerank_supplier_graph(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    edges = (
        o.join(l, F.col("o_orderkey") == F.col("l_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    return graph.pagerank_integer(edges, iters=3)


@_q(
    "bpe_merge_pairs",
    r"""
WITH words AS (
  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
  FROM documents
),
pairs AS (
  SELECT unnest(list_transform(generate_series(1, length(w) - 1),
                               i -> substr(w, CAST(i AS INT), 2))) AS pair
  FROM words
  WHERE length(w) >= 2
)
SELECT pair, count(*) AS cnt
FROM pairs
GROUP BY pair
ORDER BY cnt DESC, pair ASC
LIMIT 50
""",
    doc="One BPE merge round's counting pass (operators/textops.py:"
    "bpe_pair_counts): adjacent character-pair frequencies over "
    "whitespace words, built map-side (transform over in-word "
    "offsets, no per-doc shuffle), ONE groupBy with partial "
    "aggregation, top-50 via TakeOrderedAndProject with lexicographic "
    "tiebreak. The highest-count pair is the next merge rule "
    "(Sennrich et al. 2016); at corpus scale this pass IS the "
    "tokenizer-training bottleneck and it is one shuffle here.",
)
def q_bpe_merge_pairs(spark, sf_dir):
    return tx.bpe_pair_counts(_t(spark, sf_dir, "documents"), top=50)


def _bpe_oracle_sql(merges: int = 6) -> str:
    """Unrolled iterated-BPE CTE chain — the DuckDB twin of
    textops.py:bpe_train, but via a DIFFERENT algorithm: words are
    kept as chr(31)-delimited symbol strings ('\\x1fa\\x1f\\x1fb\\x1f')
    and each round's winning rule is applied with plain string
    replace(), whose left-to-right non-overlapping semantics equal the
    Spark side's greedy array fold (the '@A@@B@' boundary encoding
    makes adjacent matches share no bytes, so replace() cannot skip a
    second occurrence). Two independent merge implementations agreeing
    on every (round, pair, count) is the correctness argument."""
    sep = "chr(31)"
    dsep = "chr(31) || chr(31)"
    parts = [r"""
WITH words AS (
  SELECT w, count(*) AS cnt
  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents)
  WHERE length(w) >= 2
  GROUP BY w
),
v0 AS (
  SELECT cnt,
         regexp_replace(w, '(.)', chr(31) || '\1' || chr(31), 'g') AS r
  FROM words
)"""]
    for t in range(1, merges + 1):
        parts.append(f""",
p{t} AS (
  SELECT pair, CAST(SUM(cnt) AS BIGINT) AS cnt FROM (
    SELECT unnest(list_transform(generate_series(1, len(s) - 1),
                  i -> s[i] || ' ' || s[i + 1])) AS pair,
           cnt
    FROM (SELECT string_split(substr(r, 2, length(r) - 2), {dsep}) AS s,
                 cnt
          FROM v{t - 1})
  ) GROUP BY pair
),
b{t} AS (
  SELECT {t} AS merge_round, pair, cnt
  FROM p{t} ORDER BY cnt DESC, pair ASC LIMIT 1
),
v{t} AS (
  SELECT v.cnt,
         replace(v.r,
                 {sep} || replace(b.pair, ' ', {dsep}) || {sep},
                 {sep} || replace(b.pair, ' ', '') || {sep}) AS r
  FROM v{t - 1} v, b{t} b
)""")
    parts.append(
        "\n"
        + "\nUNION ALL\n".join(
            f"SELECT merge_round, pair, cnt FROM b{t}"
            for t in range(1, merges + 1)
        )
    )
    return "".join(parts)


def _bpe_encode_oracle_sql(merges: int = 6) -> str:
    """Oracle for the tokenizer-APPLICATION pass: re-derives the merge
    rules with the same training CTE chain as _bpe_oracle_sql, then
    pushes EVERY document's words (not the distinct vocab) through the
    rules via the delimited-string replace and counts surviving
    symbols per doc."""
    sep = "chr(31)"
    dsep = "chr(31) || chr(31)"
    base = _bpe_oracle_sql(merges)
    chain = base[: base.index("\nSELECT merge_round")]
    parts = [chain]
    parts.append(f""",
dw0 AS (
  SELECT doc_id,
         regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'g') AS r
  FROM (SELECT doc_id,
               unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        FROM documents)
  WHERE length(w) >= 1
)""")
    for t in range(1, merges + 1):
        # LEFT JOIN, not cross join: a degenerate corpus (all words
        # single-symbol) learns FEWER than `merges` rules, leaving
        # b{t} empty — a cross join would wipe every document out of
        # the chain; the encoder must pass docs through unchanged
        # when round t has no rule (the Spark side applies an empty
        # rule list as a no-op).
        parts.append(f""",
dw{t} AS (
  SELECT d.doc_id,
         CASE WHEN b.pair IS NULL THEN d.r
              ELSE replace(d.r,
                 {sep} || replace(b.pair, ' ', {dsep}) || {sep},
                 {sep} || replace(b.pair, ' ', '') || {sep}) END AS r
  FROM dw{t - 1} d LEFT JOIN b{t} b ON TRUE
)""")
    parts.append(f"""
SELECT doc_id,
       CAST(count(*) AS INT) AS n_words,
       CAST(SUM(len(string_split(substr(r, 2, length(r) - 2), {dsep})))
            AS INT) AS n_bpe_tokens
FROM dw{merges}
GROUP BY doc_id""")
    return "".join(parts)


@_q(
    "bpe_merged_vocab",
    _bpe_oracle_sql(merges=6),
    doc="FULL iterated BPE training (Sennrich et al. 2016), 6 merge "
    "rounds — extends bpe_merge_pairs' single counting pass to the "
    "real count → argmax → merge-everywhere loop (textops.py:"
    "bpe_train). Scale shape: ONE corpus scan builds the word-"
    "frequency table, then every round runs on |vocab| rows — "
    "map-side pair explode, one cnt-weighted groupBy, top-1 "
    "TakeOrderedAndProject, and a pure-Catalyst array fold applying "
    "the rule (greedy left-to-right, standard BPE semantics — 'aaa' "
    "+ rule (a,a) gives [aa, a]). One bounded 1-row collect per "
    "round (the argmax), same anytime-iteration shape as kmeans. "
    "Oracle replays the loop via an INDEPENDENT algorithm (delimited-"
    "string replace in unrolled CTEs).",
    scale_note="driver-paced iteration — one 1-row collect + one Spark "
    "job PER merge round, linear in `merges`, not in data. The "
    "contract is merges = small constant (demo uses 6); a real 30k-"
    "merge tokenizer would mean 30k sequential jobs — at that scale "
    "train the vocab off-cluster on the word-frequency table this "
    "operator's ONE corpus scan produces (|vocab| rows, tiny), then "
    "ship the rules to bpe_encoded_token_counts, whose encode is "
    "map-side and scale-safe",
)
def q_bpe_merged_vocab(spark, sf_dir):
    return tx.bpe_train(_t(spark, sf_dir, "documents"), merges=6)


@_q(
    "bpe_encoded_token_counts",
    _bpe_encode_oracle_sql(merges=6),
    doc="Tokenizer APPLICATION: the 6 merge rules learned by "
    "bpe_merged_vocab, applied to every document (textops.py:"
    "bpe_encode_counts) — train once, encode everything, the pair a "
    "real pipeline ships. The encode itself is one narrow map-side "
    "projection (rules frozen as literals, nested pure-Catalyst "
    "folds, greedy left-to-right merge semantics identical to the "
    "trainer's counting): no shuffle, no UDF, trivially parallel at "
    "100 TB. Oracle re-derives the rules with the training CTE chain "
    "and replays the encode via delimited-string replaces.",
    scale_note="the TRAINING arm inherits bpe_merged_vocab's driver-"
    "paced one-job-per-merge contract (merges = small constant); the "
    "encode half is map-side and scale-safe — at scale freeze rules "
    "from an offline/off-cluster trainer and call textops."
    "bpe_encode_counts directly",
)
def q_bpe_encoded_token_counts(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    learned = tx.bpe_train(d, merges=6).collect()
    rules = [tuple(r["pair"].split(" ", 1)) for r in learned]
    return tx.bpe_encode_counts(d, rules)


@_q(
    "incremental_daily_event_counts",
    """
SELECT CAST(ts AS DATE) AS day,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value,
       min(value) AS min_value,
       max(value) AS max_value
FROM events
GROUP BY CAST(ts AS DATE)
""",
    doc="Incremental aggregate maintenance: the standing per-day state "
    "(events before the cutoff) and the new micro-batch (events after) "
    "are aggregated SEPARATELY, then merged by re-aggregating the "
    "algebraic partials — count via SUM, sum via SUM, min/max via "
    "MIN/MAX. The oracle recomputes from scratch; equality holds "
    "because these aggregates are commutative monoids (the property "
    "that makes 100 TB incremental pipelines possible: each batch "
    "touches only its own rows plus the merge, never the history). "
    "Mirrors the reference's monthly-batch + MERGE cadence "
    "(silver_to_gold_on_minio.py:127-144) in aggregate space.",
)
def q_incremental_daily_event_counts(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"), "value"
    )
    cutoff = "2024-01-20"

    def partial(df):
        return df.groupBy("day").agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(27,4)")).alias("__dsum"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )

    state = partial(e.where(F.col("day") < cutoff))
    batch = partial(e.where(F.col("day") >= cutoff))
    merged = state.unionByName(batch).groupBy("day").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("__dsum").cast("double").alias("sum_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )
    return merged


@_q(
    "orders_events_daily_full_join",
    """
WITH od AS (
  SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n_orders
  FROM orders GROUP BY 1
),
ed AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS n_events
  FROM events GROUP BY 1
)
SELECT coalesce(od.day, ed.day) AS day,
       coalesce(od.n_orders, 0) AS n_orders,
       coalesce(ed.n_events, 0) AS n_events
FROM od FULL OUTER JOIN ed ON od.day = ed.day
""",
    doc="FULL OUTER join coverage (the one join type the registry "
    "lacked): daily order counts vs daily event counts, both sides "
    "pre-aggregated so the outer join runs on |distinct days| rows, "
    "never fact×fact; unmatched days coalesce to 0. The fixture's "
    "order and event date ranges are disjoint, so BOTH null sides are "
    "exercised.",
)
def q_orders_events_daily_full_join(spark, sf_dir):
    od = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    ed = (
        _t(spark, sf_dir, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    j = od.alias("od").join(
        ed.alias("ed"), F.col("od.day") == F.col("ed.day"), "full_outer"
    )
    return j.select(
        F.coalesce(F.col("od.day"), F.col("ed.day")).alias("day"),
        F.coalesce("od.n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce("ed.n_events", F.lit(0)).alias("n_events"),
    )


@_q(
    "key_skew_report",
    """
WITH per_key AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY user_id
),
tot AS (
  SELECT count(*) AS n_keys, SUM(n) AS n_rows, max(n) AS max_n
  FROM per_key
)
SELECT per_key.user_id, per_key.n,
       round(CAST(per_key.n AS DOUBLE) / tot.n_rows, 6) AS share,
       round(CAST(per_key.n AS DOUBLE) * tot.n_keys / tot.n_rows, 6)
         AS skew_ratio
FROM per_key, tot
WHERE per_key.n * tot.n_keys * 2 > tot.n_rows
ORDER BY per_key.n DESC, per_key.user_id ASC
LIMIT 20
""",
    doc="Shuffle-skew diagnosis — the report you run BEFORE choosing "
    "salting (operators/joins.py:salted_join) or AQE skew thresholds: "
    "per-key row counts, each key's share of the table, and its "
    "skew_ratio (count ÷ the uniform expectation rows/keys); keys at "
    "ratio > 0.5× uniform shown, worst first. One groupBy + a 1-row "
    "broadcast of the totals; the top-k is TakeOrderedAndProject.",
)
def q_key_skew_report(spark, sf_dir):
    per_key = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").alias("n_rows"),
        F.max("n").alias("max_n"),
    )
    j = per_key.crossJoin(F.broadcast(tot))
    return (
        j.where(F.col("n") * F.col("n_keys") * 2 > F.col("n_rows"))
        .select(
            "user_id",
            "n",
            F.round(F.col("n").cast("double") / F.col("n_rows"), 6).alias(
                "share"
            ),
            F.round(
                F.col("n").cast("double") * F.col("n_keys") / F.col("n_rows"),
                6,
            ).alias("skew_ratio"),
        )
        .orderBy(F.col("n").desc(), F.col("user_id").asc())
        .limit(20)
    )


@_q(
    "customer_rfm_segments",
    """
WITH per_cust AS (
  SELECT o_custkey,
         date_diff('day', CAST(max(o_orderdate) AS DATE),
                   (SELECT CAST(max(o_orderdate) AS DATE) FROM orders))
           AS recency_days,
         count(*) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(27,4))) AS DOUBLE)
           AS monetary
  FROM orders
  GROUP BY o_custkey
)
SELECT CASE WHEN recency_days <= 365 THEN 'active'
            WHEN recency_days <= 1095 THEN 'lapsing'
            ELSE 'dormant' END AS recency_band,
       CASE WHEN frequency >= 15 THEN 'frequent'
            WHEN frequency >= 8 THEN 'regular'
            ELSE 'occasional' END AS frequency_band,
       count(*) AS n_customers,
       CAST(SUM(CAST(monetary AS DECIMAL(27,4))) AS DOUBLE)
         AS total_monetary
FROM per_cust
GROUP BY 1, 2
""",
    doc="RFM (recency/frequency/monetary) segmentation: one pass "
    "builds per-customer recency against the global max date (a 1-row "
    "broadcast, never a driver collect), order counts, and decimal-"
    "exact spend; fixed band edges (not data-dependent quantiles) "
    "keep segment assignment deterministic and cross-engine; a second "
    "small aggregate rolls the segments up. Two shuffles total, both "
    "on o_custkey then on the tiny band pair.",
)
def q_customer_rfm_segments(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    gmax = o.agg(F.max(F.to_date("o_orderdate")).alias("__gmax"))
    per_cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            agg.exact_sum("o_totalprice", "monetary"),
        )
        .crossJoin(F.broadcast(gmax))
        .select(
            F.datediff(F.col("__gmax"), F.col("last_day")).alias(
                "recency_days"
            ),
            "frequency",
            "monetary",
        )
    )
    rband = (
        F.when(F.col("recency_days") <= 365, "active")
        .when(F.col("recency_days") <= 1095, "lapsing")
        .otherwise("dormant")
    )
    fband = (
        F.when(F.col("frequency") >= 15, "frequent")
        .when(F.col("frequency") >= 8, "regular")
        .otherwise("occasional")
    )
    return (
        per_cust.select(
            rband.alias("recency_band"),
            fband.alias("frequency_band"),
            "monetary",
        )
        .groupBy("recency_band", "frequency_band")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            agg.exact_sum("monetary", "total_monetary"),
        )
    )


@_q(
    "part_supplier_diversity",
    """
SELECT p_brand, p_type,
       count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_suppkey NOT IN (
  SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
)
GROUP BY p_brand, p_type
ORDER BY supplier_cnt DESC, p_brand ASC, p_type ASC
LIMIT 25
""",
    doc="TPC-H Q16 shape (parts/supplier relationship): supplier "
    "diversity per (brand, type) with an exclusion list applied as a "
    "broadcast LEFT ANTI join BEFORE the expensive distinct aggregate "
    "(filter early, count late). count(DISTINCT) plans as the "
    "standard two-phase expand/aggregate; top-25 via "
    "TakeOrderedAndProject with full lexicographic tiebreak so the "
    "selected set is engine-independent.",
)
def q_part_supplier_diversity(spark, sf_dir):
    bad = _t(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    l = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    kept = l.join(
        F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
    )
    return (
        kept.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
        )
        .limit(25)
    )


@_q(
    "latest_event_per_user",
    """
WITH last AS (
  SELECT user_id,
         max(struct_pack(ts := ts, event_id := event_id,
                         event_type := event_type)) AS m
  FROM events GROUP BY user_id
)
SELECT user_id, m.ts AS last_ts,
       m.event_id AS last_event_id,
       m.event_type AS last_event_type
FROM last
""",
    doc="Latest-per-key WITHOUT a window: max over a (ts, unique-id, "
    "payload) struct — lexicographic struct ordering makes one "
    "hash aggregate with map-side partial max do what row_number-"
    "over-window does with a full per-key SORT. At 100 TB this is the "
    "difference between one combine-enabled shuffle of one struct per "
    "key and sorting every event; the unique event_id tiebreak makes "
    "the winner deterministic across engines. (Window form kept in "
    "top_order_per_customer for when the full ordered frame is "
    "genuinely needed.)",
)
def q_latest_event_per_user(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    last = e.groupBy("user_id").agg(
        F.max(F.struct("ts", "event_id", "event_type")).alias("m")
    )
    return last.select(
        "user_id",
        F.col("m.ts").alias("last_ts"),
        F.col("m.event_id").alias("last_event_id"),
        F.col("m.event_type").alias("last_event_type"),
    )


@_q(
    "orders_table_checksum",
    f"""
SELECT count(*) AS n_rows,
       bit_xor({md5_long_sql(
           "concat_ws('|', CAST(o_orderkey AS VARCHAR), "
           "CAST(o_custkey AS VARCHAR), o_orderstatus, o_orderpriority)"
       )}) AS checksum
FROM orders
""",
    doc="Order-independent table fingerprint: every row hashes to a "
    "60-bit md5-derived integer (functions/hashing.py — engine-"
    "portable by construction) and the XOR aggregate folds them; XOR "
    "is commutative/associative, so partial aggregation runs map-side "
    "and the result is identical for ANY row order, partitioning, or "
    "engine. This is how two 100 TB replicas (or a migration "
    "source/target pair) are compared without moving data: ship one "
    "16-byte (count, checksum) row per table — the anti-entropy "
    "pattern. String-rendered key/status columns only: float and "
    "timestamp renderings are engine-specific, keys are the identity.",
)
def q_orders_table_checksum(spark, sf_dir):
    from .functions.hashing import md5_long

    o = _t(spark, sf_dir, "orders")
    row_hash = md5_long(
        F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            "o_orderstatus",
            "o_orderpriority",
        )
    )
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.bit_xor(row_hash).alias("checksum"),
    )


@_q(
    "eval_contaminated_docs",
    f"""
SELECT CASE WHEN doc_a % 20 = 0 THEN doc_b ELSE doc_a END AS corpus_doc,
       CASE WHEN doc_a % 20 = 0 THEN doc_a ELSE doc_b END AS eval_doc,
       jaccard
FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) mp
WHERE (doc_a % 20 = 0) <> (doc_b % 20 = 0)
""",
    doc="FUZZY decontamination — the near-dup complement of "
    "decontaminated_docs' exact 4-gram blocklist: a corpus document "
    "is flagged when MinHash LSH banding collides it with a held-out "
    "eval document (doc_id % 20 = 0 plays the eval split) AND exact "
    "Jaccard confirms >= 0.8 — catching paraphrased/lightly-edited "
    "benchmark leakage that exact n-gram matching misses (Brown et "
    "al. 2020's decontamination gap). Same banded signature relation "
    "as dedup_minhash_pairs (computed once, persisted); the eval-"
    "parity filter is a post-pass, so at scale the eval side instead "
    "feeds the band join as a small broadcast relation.",
)
def q_eval_contaminated_docs(spark, sf_dir):
    pairs = dd.minhash_lsh_pairs(
        _t(spark, sf_dir, "documents"), "doc_id", "text",
        k=12, bands=4, threshold=0.8,
    )
    a_eval = F.col("doc_a") % 20 == 0
    b_eval = F.col("doc_b") % 20 == 0
    return (
        pairs.where(a_eval != b_eval)
        .select(
            F.when(a_eval, F.col("doc_b")).otherwise(F.col("doc_a")).alias(
                "corpus_doc"
            ),
            F.when(a_eval, F.col("doc_a")).otherwise(F.col("doc_b")).alias(
                "eval_doc"
            ),
            "jaccard",
        )
    )


@_q(
    "orders_dq_quarantine",
    """
WITH flagged AS (
  SELECT o_orderkey,
         -- arms listed in sorted rule-name order, matching the
         -- operator's sorted(checks.items()) join order exactly
         concat_ws(';',
           CASE WHEN o_orderstatus NOT IN ('F','O','P')
                  OR o_orderstatus IS NULL THEN 'bad_status' END,
           CASE WHEN o_orderdate < DATE '1990-01-01'
                  OR o_orderdate > DATE '2000-01-01'
                  OR o_orderdate IS NULL THEN 'date_out_of_range' END,
           CASE WHEN o_totalprice <= 0 OR o_totalprice IS NULL
                THEN 'nonpositive_price' END
         ) AS violations
  FROM orders
)
SELECT o_orderkey, violations FROM flagged WHERE violations <> ''
""",
    doc="Row-level quarantine routing (operators/quality.py:"
    "dq_quarantine) — the dead-letter half of dq_orders_summary's "
    "audit: rows failing >=1 expectation emit with the sorted, "
    "semicolon-joined violated-rule names, ready to land in a "
    "quarantine table while clean rows flow on. One scan, zero "
    "shuffles: every check is a codegen'd per-row boolean; rule names "
    "sort alphabetically in the operator, so the SQL lists them in "
    "the same order.",
)
def q_orders_dq_quarantine(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return dq.dq_quarantine(
        o,
        {
            "bad_status": ~F.col("o_orderstatus").isin("F", "O", "P"),
            "nonpositive_price": F.col("o_totalprice") <= 0,
            "date_out_of_range": (
                F.col("o_orderdate") < F.lit("1990-01-01").cast("date")
            )
            | (F.col("o_orderdate") > F.lit("2000-01-01").cast("date")),
        },
        id_cols=["o_orderkey"],
    )


@_q(
    "compaction_plan",
    f"""
WITH files AS (
  SELECT ((({md5_long_sql("CAST(o_orderkey AS VARCHAR)")}) % 16) + 16) % 16
           AS bucket_16,
         CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
         count(*) AS n_rows
  FROM orders
  GROUP BY 1, 2
),
planned AS (
  SELECT bucket_16, order_month, n_rows,
         SUM(n_rows) OVER (PARTITION BY bucket_16 ORDER BY order_month
                           ROWS UNBOUNDED PRECEDING) AS cum_rows
  FROM files
)
SELECT bucket_16, order_month, n_rows,
       CAST((cum_rows - n_rows) // 2000 AS BIGINT) AS compaction_group
FROM planned
""",
    doc="Small-file compaction planning — the OPTIMIZE scheduling "
    "decision over the per-(bucket, month) file statistics that "
    "storage_partition_layout emits: files order by month within "
    "each bucket, a running row count accumulates, and each file "
    "lands in compaction group floor(preceding_rows / target) — "
    "consecutive small files pack toward the ~2000-row target while "
    "already-large files get groups of their own. The window "
    "partitions by bucket (never global), so planning parallelizes "
    "across buckets exactly like the rewrite jobs it schedules.",
)
def q_compaction_plan(spark, sf_dir):
    from pyspark.sql import Window

    from .functions.hashing import md5_long

    o = _t(spark, sf_dir, "orders")
    files = (
        o.select(
            F.pmod(
                md5_long(F.col("o_orderkey").cast("string")), F.lit(16)
            ).alias("bucket_16"),
            F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias(
                "order_month"
            ),
        )
        .groupBy("bucket_16", "order_month")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = (
        Window.partitionBy("bucket_16")
        .orderBy("order_month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    planned = files.withColumn("cum_rows", F.sum("n_rows").over(w))
    return planned.select(
        "bucket_16",
        "order_month",
        "n_rows",
        F.expr("(cum_rows - n_rows) div 2000").alias("compaction_group"),
    )


@_q(
    "cluster_size_histogram",
    f"""
WITH RECURSIVE pairs AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) mp
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(node, label) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
),
clusters AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
),
sizes AS (
  SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY cluster_id
)
SELECT cluster_size, count(*) AS n_clusters
FROM sizes
GROUP BY cluster_size
""",
    doc="Dedup-run report card: the distribution of near-dup cluster "
    "sizes (how much of the corpus is singletons vs deep duplicate "
    "stacks) — the number a curation team checks before committing a "
    "dedup pass, since a fat tail means boilerplate or crawl loops, "
    "not organic duplication. Two tiny aggregates over the connected-"
    "components output; all heavy lifting is the shared MinHash + CC "
    "path.",
)
def q_cluster_size_histogram(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    )
    clusters = graph.dedup_clusters(docs, pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters")
    )


@_q(
    "token_count_histogram",
    r"""
WITH tc AS (
  SELECT lang,
         CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS INT)
           AS n_tokens
  FROM documents
)
SELECT lang,
       CAST(floor(n_tokens / 32) * 32 AS INT) AS bucket_lo,
       count(*) AS n_docs,
       min(n_tokens) AS min_tokens,
       max(n_tokens) AS max_tokens
FROM tc
GROUP BY lang, CAST(floor(n_tokens / 32) * 32 AS INT)
""",
    doc="Per-language token-length histogram (fixed 32-token buckets): "
    "the curation dashboard behind truncation-loss and packing-"
    "efficiency decisions — sequence length budgeting needs the "
    "distribution, not the mean. Map-side token count, one groupBy on "
    "(lang, bucket); fixed bucket edges keep the histogram mergeable "
    "across corpus shards (monoid, same reason as "
    "incremental_daily_event_counts).",
)
def q_token_count_histogram(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    n_tok = F.size(tx.tokens(F.col("text")))
    tc = d.select(
        "lang", n_tok.alias("n_tokens")
    )
    bucket = (F.floor(F.col("n_tokens") / 32) * 32).cast("int")
    return tc.groupBy("lang", bucket.alias("bucket_lo")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
    )


@_q(
    "value_band_rate_lookup",
    """
WITH bands AS (
  SELECT CAST(i AS INT) AS band_id,
         i * 10.0 AS lo, (i + 1) * 10.0 AS hi,
         round(0.01 * (i + 1), 4) AS fee_rate
  FROM (SELECT unnest(generate_series(0, 9)) AS i)
)
SELECT band_id,
       count(*) AS n_events,
       CAST(SUM(CAST(value * fee_rate AS DECIMAL(27,6))) AS DOUBLE)
         AS total_fees
FROM events JOIN bands
  ON value >= lo AND value < hi
GROUP BY band_id
""",
    doc="Interval-table lookup (rate/tariff/IP-range pattern): each "
    "event's value lands in one [lo, hi) band of a small rate table. "
    "A bare BETWEEN join would plan as BroadcastNestedLoopJoin — fine "
    "for 10 bands, quadratic pain for 10⁶ IP ranges — so the operator "
    "computes the band key ARITHMETICALLY (floor(value/width)) and "
    "equi-joins it broadcast, the same bin-then-equi rewrite as "
    "range_join_binned; the residual range check keeps semantics "
    "exact even for bands narrower than the bin. Decimal-exact fee "
    "accumulation.",
)
def q_value_band_rate_lookup(spark, sf_dir):
    bands = spark.range(0, 10).select(
        F.col("id").cast("int").alias("band_id"),
        (F.col("id") * 10.0).alias("lo"),
        ((F.col("id") + 1) * 10.0).alias("hi"),
        F.round(0.01 * (F.col("id") + 1), 4).alias("fee_rate"),
    )
    e = _t(spark, sf_dir, "events").select("value")
    keyed = e.withColumn("band_id", F.floor(F.col("value") / 10.0).cast("int"))
    j = keyed.join(F.broadcast(bands), "band_id").where(
        (F.col("value") >= F.col("lo")) & (F.col("value") < F.col("hi"))
    )
    return j.groupBy("band_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(
            (F.col("value") * F.col("fee_rate")).cast("decimal(27,6)")
        ).cast("double").alias("total_fees"),
    )


@_q(
    "orders_reconciliation_diff",
    f"""
WITH replica AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 97 = 0 THEN 'P' ELSE o_orderstatus END
           AS o_orderstatus,
         o_totalprice
  FROM orders
  WHERE o_orderkey % 113 <> 0
),
replica2 AS (
  SELECT * FROM replica
  UNION ALL
  SELECT -1, 'O', 42.0
),
src AS (
  SELECT o_orderkey,
         {md5_long_sql("concat_ws('|', o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(27,4)) AS VARCHAR))")}
           AS row_hash
  FROM orders
),
dst AS (
  SELECT o_orderkey,
         {md5_long_sql("concat_ws('|', o_orderstatus, CAST(CAST(o_totalprice AS DECIMAL(27,4)) AS VARCHAR))")}
           AS row_hash
  FROM replica2
)
SELECT
  CASE WHEN dst.o_orderkey IS NULL THEN 'missing_in_replica'
       WHEN src.o_orderkey IS NULL THEN 'extra_in_replica'
       ELSE 'payload_mismatch' END AS diff_kind,
  count(*) AS n_rows
FROM src FULL OUTER JOIN dst ON src.o_orderkey = dst.o_orderkey
WHERE src.o_orderkey IS NULL OR dst.o_orderkey IS NULL
   OR src.row_hash <> dst.row_hash
GROUP BY 1
""",
    doc="Table reconciliation — the row-level drill-down behind "
    "orders_table_checksum's one-row fingerprint: source vs a "
    "synthetically-drifted replica (every 113th key dropped, every "
    "97th status mutated — deterministic, so the oracle builds the "
    "same replica) compared by key + payload hash. Both sides reduce "
    "to slim (key, 60-bit md5) rows BEFORE the full-outer join, so "
    "the shuffle carries 16 bytes/row regardless of payload width — "
    "how a 100 TB migration diff actually ships. Output: counts by "
    "missing/extra/mismatch.",
)
def q_orders_reconciliation_diff(spark, sf_dir):
    from .functions.hashing import md5_long

    o = _t(spark, sf_dir, "orders")
    replica = o.where(F.col("o_orderkey") % 113 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 97 == 0, F.lit("P"))
        .otherwise(F.col("o_orderstatus"))
        .alias("o_orderstatus"),
        "o_totalprice",
    ).unionByName(
        spark.createDataFrame(
            [(-1, "O", 42.0)],
            "o_orderkey long, o_orderstatus string, o_totalprice double",
        )
    )

    def slim(df):
        # Hash a canonical DECIMAL(27,4) rendering, never the raw float
        # string: float-to-string is engine-specific on exponent/
        # precision edges (see orders_table_checksum's docstring).
        return df.select(
            "o_orderkey",
            md5_long(
                F.concat_ws(
                    "|",
                    F.col("o_orderstatus"),
                    F.col("o_totalprice").cast("decimal(27,4)").cast("string"),
                )
            ).alias("row_hash"),
        )

    src = slim(o).alias("src")
    dst = slim(replica).alias("dst")
    j = src.join(
        dst, F.col("src.o_orderkey") == F.col("dst.o_orderkey"), "full_outer"
    )
    kind = (
        F.when(F.col("dst.o_orderkey").isNull(), "missing_in_replica")
        .when(F.col("src.o_orderkey").isNull(), "extra_in_replica")
        .otherwise("payload_mismatch")
    )
    return (
        j.where(
            F.col("src.o_orderkey").isNull()
            | F.col("dst.o_orderkey").isNull()
            | (F.col("src.row_hash") != F.col("dst.row_hash"))
        )
        .select(kind.alias("diff_kind"))
        .groupBy("diff_kind")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


@_q(
    "customer_order_count_distribution",
    """
SELECT c_count, count(*) AS n_custs
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
) GROUP BY c_count
""",
    doc="TPC-H Q13 shape (customer order distribution): the LEFT join "
    "keeps zero-order customers — count(o_orderkey) counts non-NULL "
    "join matches, so the 0 bucket exists (an inner join silently "
    "drops it: the classic histogram-with-zeros bug). Two aggregates: "
    "per-customer on the join key, then the tiny distribution rollup.",
)
def q_customer_order_count_distribution(spark, sf_dir):
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    per = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count(F.lit(1)).alias("n_custs"))


@_q(
    "small_quantity_order_revenue",
    """
WITH avgs AS (
  SELECT l_partkey AS ap,
         CAST(SUM(CAST(l_quantity AS DECIMAL(27,4))) AS DOUBLE)
           / count(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) / 7.0
         AS avg_yearly
FROM lineitem
JOIN part ON p_partkey = l_partkey
JOIN avgs ON ap = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < 0.2 * avg_qty
""",
    doc="TPC-H Q17 shape (small-quantity-order revenue): the "
    "correlated scalar subquery (per-part average quantity) decorrelates "
    "into one groupBy + a join back — Spark plans the per-part "
    "aggregate once, AQE broadcasts it after the brand filter "
    "collapses the probe side. The average is decimal-exact-sum / "
    "count, so the 0.2× threshold comparison is engine-identical.",
)
def q_small_quantity_order_revenue(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgs = l.groupBy(F.col("l_partkey").alias("ap")).agg(
        agg.exact_avg("l_quantity", "avg_qty")
    )
    p = _t(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#23").select(
        "p_partkey"
    )
    j = (
        l.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(avgs, F.col("ap") == F.col("l_partkey"))
        .where(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
    )
    return j.agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(27,4)")).cast("double")
            / 7.0
        ).alias("avg_yearly")
    )


@_q(
    "sole_late_supplier_waits",
    """
WITH lates AS (
  SELECT l_orderkey, l_suppkey,
         CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
              THEN 1 ELSE 0 END AS is_late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
)
SELECT s_name, count(*) AS numwait
FROM lates l1 JOIN supplier ON s_suppkey = l1.l_suppkey
WHERE l1.is_late = 1
  AND EXISTS (
    SELECT 1 FROM lates l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lates l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.is_late = 1
  )
GROUP BY s_name
ORDER BY numwait DESC, s_name ASC
LIMIT 10
""",
    doc="TPC-H Q21 shape (suppliers who kept orders waiting): the "
    "hardest standard-suite shape — one semi-join (another supplier "
    "participated) AND one anti-join (no OTHER supplier was late) "
    "against the same derived relation, both correlated on the order "
    "key with a supplier inequality residual. The late flag computes "
    "ONCE in a shared (orderkey, suppkey, is_late) relation that is "
    "persisted and consumed three times; 'late' adapts to the fixture "
    "schema as shipped >60 days after ordering (no receipt/commit "
    "dates exist). Top-10 with name tiebreak.",
)
def q_sole_late_supplier_waits(spark, sf_dir):
    from .session import track_persist

    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = _t(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    lates = track_persist(
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey",
            "l_suppkey",
            (
                F.col("l_shipdate")
                > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
            )
            .cast("int")
            .alias("is_late"),
        )
    )
    l1 = lates.where(F.col("is_late") == 1).select(
        F.col("l_orderkey").alias("ok"), F.col("l_suppkey").alias("sk")
    )
    others = lates.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_suppkey").alias("sk2")
    )
    late_others = lates.where(F.col("is_late") == 1).select(
        F.col("l_orderkey").alias("ok3"), F.col("l_suppkey").alias("sk3")
    )
    with_peer = l1.join(
        others,
        (F.col("ok") == F.col("ok2")) & (F.col("sk") != F.col("sk2")),
        "left_semi",
    )
    sole_late = with_peer.join(
        late_others,
        (F.col("ok") == F.col("ok3")) & (F.col("sk") != F.col("sk3")),
        "left_anti",
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        sole_late.join(F.broadcast(s), F.col("sk") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(10)
    )


# --------------------------------------------------------------------------
# Round 6: remaining classic decision-support shapes (TPC-H Q2/Q4/Q8/
# Q9/Q11/Q20). The fixture has no partsupp table, so part-supplier cost
# and stock relations derive from lineitem (documented per query).
# --------------------------------------------------------------------------


@_q(
    "min_cost_part_supplier",
    """
WITH ps AS (
  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
         min(round(CAST(l_extendedprice AS DOUBLE)
                   / CAST(l_quantity AS DOUBLE), 6)) AS unit_cost
  FROM lineitem
  GROUP BY 1, 2
),
m AS (SELECT partkey AS mp, min(unit_cost) AS min_cost FROM ps GROUP BY 1)
SELECT p_partkey, s_name, unit_cost AS min_unit_cost
FROM ps
JOIN m ON mp = partkey AND unit_cost = min_cost
JOIN part ON p_partkey = partkey
JOIN supplier ON s_suppkey = suppkey
WHERE p_type = 'STANDARD' AND p_size < 15
""",
    doc="TPC-H Q2 shape (min-cost supplier): the correlated "
    "min-subquery decorrelates into one per-(part, supplier) "
    "aggregate + a per-part min + an equi-join back on (part, cost) — "
    "Catalyst plans two groupBys sharing one shuffle key and never "
    "re-executes a per-row subquery. Part/supplier costs derive from "
    "lineitem (min observed unit price, 6dp-rounded BEFORE the min so "
    "the tie set is engine-identical) since the fixture has no "
    "partsupp. Ties return every minimal supplier, as in Q2.",
)
def q_min_cost_part_supplier(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    ps = l.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        F.min(
            F.round(
                F.col("l_extendedprice").cast("double")
                / F.col("l_quantity").cast("double"),
                6,
            )
        ).alias("unit_cost")
    )
    from .session import track_persist

    ps = track_persist(ps)  # consumed by the min and the join-back
    m = ps.groupBy(F.col("partkey").alias("mp")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    p = (
        _t(spark, sf_dir, "part")
        .where((F.col("p_type") == "STANDARD") & (F.col("p_size") < 15))
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        ps.join(
            m,
            (F.col("mp") == F.col("partkey"))
            & (F.col("unit_cost") == F.col("min_cost")),
        )
        .join(F.broadcast(p), F.col("p_partkey") == F.col("partkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("suppkey"))
        .select(
            "p_partkey", "s_name", F.col("unit_cost").alias("min_unit_cost")
        )
    )


@_q(
    "order_priority_fulfillment",
    """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= DATE '1996-01-01'
  AND o_orderdate < DATE '1997-01-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey
      AND l_shipdate > o_orderdate + INTERVAL 30 DAY
  )
GROUP BY o_orderpriority
""",
    doc="TPC-H Q4 shape (order priority checking): EXISTS with a "
    "cross-relation predicate (lineitem shipped >30 days after its "
    "order's date — the fixture has no commit/receipt dates) becomes "
    "ONE left-semi join whose condition carries both the key equality "
    "and the date residual; the date-window filter prunes the probe "
    "side before the shuffle. No de-dup pass needed: semi-join "
    "emits each order at most once by construction.",
)
def q_order_priority_fulfillment(spark, sf_dir):
    o = (
        _t(spark, sf_dir, "orders")
        .where(
            (F.col("o_orderdate") >= F.lit("1996-01-01").cast("date"))
            & (F.col("o_orderdate") < F.lit("1997-01-01").cast("date"))
        )
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
    )
    l = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    sem = o.join(
        l,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ),
        "left_semi",
    )
    return sem.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


@_q(
    "nation_market_share",
    """
WITH rev AS (
  SELECT CAST(year(o_orderdate) AS INT) AS yr,
         CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)) AS vol,
         sn.n_name AS supp_nation
  FROM lineitem
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN customer ON c_custkey = o_custkey
  JOIN nation cn ON cn.n_nationkey = c_nationkey
  JOIN region   ON r_regionkey = cn.n_regionkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation sn ON sn.n_nationkey = s_nationkey
  WHERE r_name = 'ASIA'
)
SELECT yr,
       round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol
                           ELSE CAST(0 AS DECIMAL(27,4)) END) AS DOUBLE)
             / CAST(SUM(vol) AS DOUBLE), 6) AS mkt_share
FROM rev
GROUP BY yr
""",
    doc="TPC-H Q8 shape (national market share): the share of ASIA-"
    "destined revenue supplied by NATION_3, per year. Five dimension "
    "joins (orders->customer->nation->region, supplier->nation) all "
    "broadcast — the only shuffle is the final per-year aggregate; "
    "the share is a conditional-sum / total-sum over the SAME "
    "relation (one pass, no self-join), both sums decimal-exact "
    "before the 6dp ratio.",
)
def q_nation_market_share(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    cn = n.select(
        F.col("n_nationkey").alias("cnk"), F.col("n_regionkey").alias("crk")
    )
    sn = n.select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("supp_nation")
    )
    rev = (
        l.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(c), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cnk") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("crk"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("snk") == F.col("s_nationkey"))
        .select(
            F.year("o_orderdate").cast("int").alias("yr"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount")))
            .cast("decimal(27,4)")
            .alias("vol"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(27,4)")
    return rev.groupBy("yr").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("vol"))
                .otherwise(zero)
            ).cast("double")
            / F.sum("vol").cast("double"),
            6,
        ).alias("mkt_share")
    )


@_q(
    "product_profit_by_nation_year",
    """
SELECT sn.n_name AS nation,
       CAST(year(o_orderdate) AS INT) AS yr,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     - p_retailprice * l_quantity * 0.6
                AS DECIMAL(27,4))) AS DOUBLE) AS profit
FROM lineitem
JOIN orders ON o_orderkey = l_orderkey
JOIN part ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
JOIN nation sn ON sn.n_nationkey = s_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""",
    doc="TPC-H Q9 shape (product-type profit): profit per supplier "
    "nation per year over a part-name filter. Cost is the synthetic "
    "0.6 x retail (the fixture has no ps_supplycost); the per-row "
    "profit expression casts to DECIMAL(27,4) BEFORE the sum so "
    "accumulation order cannot shift the result. The part filter "
    "broadcasts; lineitem->orders is the one big join.",
)
def q_product_profit_by_nation_year(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    p = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    sn = _t(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("snk"), F.col("n_name").alias("nation")
    )
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.6
    ).cast("decimal(27,4)")
    j = (
        l.join(F.broadcast(p), F.col("p_partkey") == F.col("l_partkey"))
        .join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("snk") == F.col("s_nationkey"))
    )
    return j.groupBy(
        F.col("nation"), F.year("o_orderdate").cast("int").alias("yr")
    ).agg(F.sum(profit).cast("double").alias("profit"))


@_q(
    "important_part_values",
    """
WITH pv AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(27,4)))
           AS value
  FROM lineitem
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN nation ON n_nationkey = s_nationkey
  WHERE n_name = 'NATION_7'
  GROUP BY l_partkey
),
tot AS (SELECT SUM(value) AS total FROM pv)
SELECT l_partkey AS p_partkey, CAST(value AS DOUBLE) AS part_value
FROM pv, tot
WHERE CAST(value AS DOUBLE) > 0.002 * CAST(total AS DOUBLE)
""",
    doc="TPC-H Q11 shape (important stock): per-part traded value for "
    "one nation's suppliers, kept only when above a FRACTION OF THE "
    "GLOBAL TOTAL — the scalar subquery decorrelates into a 1-row "
    "aggregate broadcast back as a cross join (the same broadcast-"
    "scalar idiom as embedding_norm_outliers). The per-part and "
    "global sums reuse ONE aggregated relation, so the fact table is "
    "scanned once.",
)
def q_important_part_values(spark, sf_dir):
    from .session import track_persist

    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").where(
        F.col("n_name") == "NATION_7"
    ).select("n_nationkey")
    pv = track_persist(
        l.join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .groupBy("l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    "decimal(27,4)"
                )
            ).alias("value")
        )
    )
    tot = pv.agg(F.sum("value").alias("total"))
    return (
        pv.crossJoin(F.broadcast(tot))
        .where(
            F.col("value").cast("double")
            > 0.002 * F.col("total").cast("double")
        )
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.col("value").cast("double").alias("part_value"),
        )
    )


@_q(
    "dominant_share_suppliers",
    """
WITH fp AS (
  SELECT p_partkey FROM part WHERE p_name LIKE 'red%'
),
pq AS (
  SELECT l_partkey, l_suppkey,
         SUM(CAST(l_quantity AS DECIMAL(27,4))) AS sq
  FROM lineitem JOIN fp ON p_partkey = l_partkey
  GROUP BY 1, 2
),
tot AS (
  SELECT l_partkey AS tp, SUM(sq) AS tq FROM pq GROUP BY 1
)
SELECT s_suppkey, s_name
FROM supplier
WHERE s_suppkey IN (
  SELECT l_suppkey FROM pq JOIN tot ON tp = l_partkey
  WHERE CAST(sq AS DOUBLE) > 0.15 * CAST(tq AS DOUBLE)
)
""",
    doc="TPC-H Q20 shape (excess-stock suppliers): suppliers holding "
    "a dominant (>15%) share of any 'red%' part's traded quantity — "
    "the nested IN-subquery chain decorrelates into per-(part, "
    "supplier) sums, a per-part total REUSING that aggregate (not a "
    "second fact scan), a share filter, and one left-semi join into "
    "supplier. Quantity sums are decimal-exact; the share compare "
    "casts to double identically on both engines.",
)
def q_dominant_share_suppliers(spark, sf_dir):
    from .session import track_persist

    fp = (
        _t(spark, sf_dir, "part")
        .where(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    l = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity"
    )
    pq = track_persist(
        l.join(F.broadcast(fp), F.col("p_partkey") == F.col("l_partkey"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(27,4)")).alias("sq"))
    )
    tot = pq.groupBy(F.col("l_partkey").alias("tp")).agg(
        F.sum("sq").alias("tq")
    )
    dominant = (
        pq.join(tot, F.col("tp") == F.col("l_partkey"))
        .where(
            F.col("sq").cast("double") > 0.15 * F.col("tq").cast("double")
        )
        .select("l_suppkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(
        dominant, F.col("l_suppkey") == F.col("s_suppkey"), "left_semi"
    )


@_q(
    "kmv_distinct_events",
    f"""
WITH h AS (
  SELECT DISTINCT {md5_long_sql("CAST(event_id AS VARCHAR)")} AS h
  FROM events
),
k AS (SELECT h FROM h ORDER BY h LIMIT 256),
a AS (SELECT count(*) AS m, max(h) AS hk FROM k),
e AS (SELECT count(DISTINCT event_id) AS exact_distinct FROM events)
SELECT CASE WHEN m < 256 THEN m
            ELSE CAST(round(255.0 * 1152921504606846976.0
                            / CAST(hk AS DOUBLE)) AS BIGINT)
       END AS est_distinct,
       exact_distinct,
       round(abs(CASE WHEN m < 256 THEN m
                      ELSE CAST(round(255.0 * 1152921504606846976.0
                                      / CAST(hk AS DOUBLE)) AS BIGINT)
                 END - exact_distinct) / CAST(exact_distinct AS DOUBLE), 4)
         AS rel_err
FROM a, e
""",
    doc="K-minimum-values distinct sketch (Bar-Yossef et al. 2002, "
    "operators/aggregates.py:kmv_distinct) — the DETERMINISTIC "
    "mergeable alternative to approx_count_distinct's HLL: the "
    "estimate depends only on the md5 family and k, so the DuckDB "
    "oracle reproduces it BIT-EXACTLY (approx_event_stats is "
    "rows-only-checkable by contrast, which is why this query "
    "exists). Scale shape: map-side distinct partials, per-partition "
    "k-min heaps (TakeOrdered — the partials ARE the mergeable "
    "sketch), final aggregate over k rows. exact_compare adds the "
    "true count + relative error for the harness.",
)
def q_kmv_distinct_events(spark, sf_dir):
    return agg.kmv_distinct(
        _t(spark, sf_dir, "events"), "event_id", k=256, exact_compare=True
    )


@_q(
    "segment_event_values_hot_cold",
    """
SELECT c_mktsegment,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS total_value
FROM events JOIN customer ON c_custkey = user_id
GROUP BY c_mktsegment
""",
    doc="Two-path skew join (operators/joins.py:hot_cold_split_join): "
    "the 8 hottest user keys route through a broadcast join (their "
    "dim rows move map-side, no shuffle partition ever receives a "
    "hot key) while the cold tail takes the normal shuffle join; "
    "semi/anti on the same in-plan top-k relation partition the fact "
    "exactly, so the union equals the plain join — which is what the "
    "oracle runs. The declarative complement to AQE's reactive skew "
    "split and to salting (which multiplies the dim for ALL keys).",
)
def q_segment_event_values_hot_cold(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("user_id", "value")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    j = joins.hot_cold_split_join(e, c, "user_id", "c_custkey", n_hot=8)
    return j.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_events"),
        agg.exact_sum("value", "total_value"),
    )


@_q(
    "minhash_recall_eval",
    f"""
WITH lsh AS MATERIALIZED (
  SELECT doc_a, doc_b FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) mp
),
ex AS MATERIALIZED (
  SELECT doc_a, doc_b FROM (
    WITH {_SHINGLES_CTE},
    exx AS (
      SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s FROM sh
    ),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
             count(*) AS common
      FROM exx a JOIN exx b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b
    FROM c
    WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6) >= 0.8
  ) q
),
j AS (
  SELECT coalesce(ex.doc_a, lsh.doc_a) AS doc_a,
         CASE WHEN ex.doc_a IS NOT NULL THEN 1 ELSE 0 END AS e,
         CASE WHEN lsh.doc_a IS NOT NULL THEN 1 ELSE 0 END AS l
  FROM ex FULL OUTER JOIN lsh
    ON ex.doc_a = lsh.doc_a AND ex.doc_b = lsh.doc_b
),
agg AS (
  SELECT CAST(sum(e) AS BIGINT) AS n_exact,
         CAST(sum(l) AS BIGINT) AS n_lsh,
         CAST(sum(e * l) AS BIGINT) AS n_common
  FROM j
)
SELECT n_exact, n_lsh, n_common,
       CASE WHEN n_exact > 0
         THEN round(CAST(n_common AS DOUBLE) / CAST(n_exact AS DOUBLE), 6) END
         AS recall,
       CASE WHEN n_lsh > 0
         THEN round(CAST(n_common AS DOUBLE) / CAST(n_lsh AS DOUBLE), 6) END
         AS precision
FROM agg
""",
    doc="Banding quality measured, not assumed: the MinHash-LSH pair "
    "set (12 hashes × 4 bands, exact-Jaccard verified) scored against "
    "the EXACT n-gram-Jaccard ≥ 0.8 ground truth — recall is the "
    "banding miss rate (P[no band collides] for a qualifying pair), "
    "precision is 1.0 by construction (the verify step readmits no "
    "false positives) and the query PROVES it rather than asserting "
    "it. The dedup-family twin of pq_recall_eval: approximation "
    "quality is itself a first-class, oracle-checked output. Both "
    "pair sets are bucketed joins (never n²); the comparison is one "
    "full-outer join on the bounded pair relations.",
    scale_note="eval-tier — the exact-Jaccard ground-truth side "
    "inherits ngram_jaccard_exact's superlinear recall-baseline cost "
    "on hot shingles; at corpus scale replay the eval on an "
    "md5-capped subsample (the simhash_recall_eval sampling pattern)",
)
def q_minhash_recall_eval(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    lsh = dd.minhash_lsh_pairs(
        d, "doc_id", "text", k=12, bands=4, threshold=0.8
    ).select("doc_a", "doc_b", F.lit(1).alias("l"))
    ex = dd.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.8, max_doc_freq=None
    ).select("doc_a", "doc_b", F.lit(1).alias("e"))
    j = ex.join(lsh, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("e", F.lit(0)).alias("e"),
        F.coalesce("l", F.lit(0)).alias("l"),
    )
    a = j.agg(
        F.sum("e").cast("long").alias("n_exact"),
        F.sum("l").cast("long").alias("n_lsh"),
        F.sum(F.col("e") * F.col("l")).cast("long").alias("n_common"),
    )
    rec = F.when(
        F.col("n_exact") > 0,
        F.round(
            F.col("n_common").cast("double") / F.col("n_exact").cast("double"),
            6,
        ),
    )
    prec = F.when(
        F.col("n_lsh") > 0,
        F.round(
            F.col("n_common").cast("double") / F.col("n_lsh").cast("double"), 6
        ),
    )
    return a.select(
        "n_exact", "n_lsh", "n_common",
        rec.alias("recall"), prec.alias("precision"),
    )


@_q(
    "priority_sampled_docs",
    f"""
WITH scored AS (
  SELECT doc_id, CAST(length(text) AS DOUBLE) AS w,
         CAST(length(text) AS DOUBLE)
           / (CAST(({md5_long_sql("CAST(doc_id AS VARCHAR)")} + 1) AS DOUBLE)
              / 1152921504606846976.0) AS q
  FROM documents
  WHERE CAST(length(text) AS DOUBLE) > 0
),
top AS (
  SELECT doc_id, w, q,
         row_number() OVER (ORDER BY q DESC, doc_id ASC) AS rn
  FROM scored
),
tau AS (SELECT q AS tau FROM top WHERE rn = 65),
kept AS (SELECT doc_id, w FROM top WHERE rn <= 64)
SELECT doc_id, round(w, 6) AS weight,
       round(greatest(w, coalesce((SELECT tau FROM tau), w)), 6)
         AS est_weight
FROM kept
""",
    doc="Fixed-size length-weighted document sample via PRIORITY "
    "SAMPLING (operators/sampling.py:priority_sample; Duffield, Lund "
    "& Thorup 2007) — the deterministic weighted reservoir: priority "
    "q = w/u with u = (md5(id)+1)/2^60, global top-64 kept, ŵ = "
    "max(w, τ) from the 65th priority makes subset-sum estimates "
    "UNBIASED ('how many training tokens does slice X contribute' "
    "from a tiny sample). Content-hash u ⇒ reruns/retries/engines "
    "agree row-for-row, unlike rand(); ONE map-side priority + one "
    "TakeOrdered top-(k+1), no table shuffle. Length weights = "
    "token-budget-proportional sampling.",
)
def q_priority_sampled_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return smp.priority_sample(d, "doc_id", F.length("text"), k=64)


def _hll_by_type_oracle() -> str:
    from .operators.aggregates import hll_oracle_sql

    return hll_oracle_sql("events", "user_id", m=64, by=["event_type"])


@_q(
    "hll_users_by_event_type",
    _hll_by_type_oracle(),
    doc="Per-event-type distinct-user sketch — the deterministic "
    "md5-register HLL (operators/aggregates.py:hll_distinct) in its "
    "actual 100 TB deployment shape: ONE pass, one (group, register)-"
    "keyed fold, ≤64 shuffle rows per group per task, NO expand "
    "(Spark's multi-aggregate exact count_distinct multiplies scan "
    "output per aggregate; the sketch never does) and no key "
    "shuffling. registers_hit/rho_sum pin each group's full register "
    "state; the oracle replays every register bit-exactly.",
)
def q_hll_users_by_event_type(spark, sf_dir):
    return agg.hll_distinct(
        _t(spark, sf_dir, "events"), "user_id", m=64, by=["event_type"]
    )


def _top_pc_ctes(dim: int = 64, iters: int = 8) -> str:
    """Unrolled power-iteration twin of similarity.embedding_top_pc:
    exact-DECIMAL covariance assembly, j-/i-ORDERED list_sum folds
    for every float reduction (the pq-oracle pattern — left-to-right
    on both engines), sqrt allowed (IEEE correctly rounded), per-level
    CTEs MATERIALIZED."""
    parts = [
        f"""
mom AS MATERIALIZED (
  SELECT i, j,
         sum(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                  * CAST(embedding[CAST(j AS INT)] AS DOUBLE)
                  AS DECIMAL(38,18))) AS s
  FROM embeddings,
       LATERAL unnest(generate_series(1, {dim})) AS iu(i),
       LATERAL unnest(generate_series(1, {dim})) AS ju(j)
  GROUP BY 1, 2
),
mu AS MATERIALIZED (
  SELECT i,
         CAST(sum(CAST(CAST(embedding[CAST(i AS INT)] AS DOUBLE)
                       AS DECIMAL(38,18))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mu,
         count(*) AS n
  FROM embeddings, LATERAL unnest(generate_series(1, {dim})) AS iu(i)
  GROUP BY 1
),
cov AS MATERIALIZED (
  SELECT CAST(m.i AS INT) AS i, CAST(m.j AS INT) AS j,
         CAST(m.s AS DOUBLE) / CAST(a.n AS DOUBLE) - a.mu * b.mu AS c
  FROM mom m JOIN mu a ON m.i = a.i JOIN mu b ON m.j = b.i
),
v0 AS (
  SELECT CAST(i AS INT) AS j, 1.0 / sqrt(CAST({dim} AS DOUBLE)) AS vj
  FROM (SELECT unnest(generate_series(1, {dim})) AS i)
)"""
    ]
    for t in range(1, iters + 1):
        parts.append(
            f""",
u{t} AS MATERIALIZED (
  SELECT i, list_sum(list(c * vj ORDER BY j)) AS u
  FROM cov JOIN v{t - 1} USING (j) GROUP BY i
),
n{t} AS (SELECT sqrt(list_sum(list(u * u ORDER BY i))) AS nm FROM u{t}),
v{t} AS MATERIALIZED (SELECT CAST(i AS INT) AS j, u / nm AS vj FROM u{t}, n{t})"""
        )
    parts.append(
        f""",
sg AS (
  SELECT CASE WHEN vj >= 0 THEN 1.0 ELSE -1.0 END AS s FROM (
    SELECT vj, row_number() OVER (ORDER BY abs(vj) DESC, j ASC) AS rn
    FROM v{iters}
  ) WHERE rn = 1
)"""
    )
    return "WITH " + "".join(parts)


def _top_pc_oracle(dim: int = 64, iters: int = 8) -> str:
    """Full top-PC oracle: the shared CTEs plus Rayleigh/trace rows."""
    return _top_pc_ctes(dim, iters) + f""",
ufin AS MATERIALIZED (
  SELECT i, list_sum(list(c * vj ORDER BY j)) AS u
  FROM cov JOIN v{iters} USING (j) GROUP BY i
),
lamr AS (
  SELECT list_sum(list(v.vj * f.u ORDER BY f.i)) AS lam
  FROM v{iters} v JOIN ufin f ON v.j = f.i
),
trr AS (SELECT list_sum(list(c ORDER BY i)) AS tr FROM cov WHERE i = j)
SELECT CAST(j AS INT) AS dim, round(s * vj, 6) AS loading FROM v{iters}, sg
UNION ALL SELECT 0, round(lam, 6) FROM lamr
UNION ALL SELECT -1, round(tr, 6) FROM trr"""


@_q(
    "embedding_principal_component",
    _top_pc_oracle(),
    doc="Top principal component of the embedding corpus by power "
    "iteration over the exactly-aggregated covariance "
    "(operators/similarity.py:embedding_top_pc) — the embedding "
    "anisotropy / dominant-direction / drift diagnostic (Mu & "
    "Viswanath 2018's 'all-but-the-top' preprocessing starts here). "
    "ONE data-scale pass: map-side d² component products into an "
    "(i,j)-keyed combinable groupBy with DECIMAL(38,18) accumulation "
    "(order-independent, bit-stable); then 8 data-free power-iteration "
    "rounds on the d²-cell relation (anytime contract) — matvec joins "
    "+ j-SORTED array folds, sqrt normalization (IEEE correctly "
    "rounded, unlike ln/exp). Output: unit loadings (sign-fixed at "
    "the largest component), dim 0 = Rayleigh λ₁ estimate, dim -1 = "
    "exact trace — anisotropy ≈ λ·d/trace.",
)
def q_embedding_principal_component(spark, sf_dir):
    return sim.embedding_top_pc(
        _t(spark, sf_dir, "embeddings"), "embedding", dim=64, iters=8
    )


def _whiten_oracle(dim: int = 64, iters: int = 8, n_sample: int = 4) -> str:
    key = md5_long_sql("concat('whiten:', CAST(vec_id AS VARCHAR))")
    return _top_pc_ctes(dim, iters) + f""",
uu AS MATERIALIZED (
  SELECT CAST(j AS INT) AS d, s * vj AS u FROM v{iters}, sg
),
pick AS MATERIALIZED (
  SELECT vec_id, embedding FROM (
    SELECT vec_id, embedding, {key} AS k FROM embeddings) t
  ORDER BY k ASC, vec_id ASC LIMIT {n_sample}
),
cent AS MATERIALIZED (
  SELECT p.vec_id, CAST(m.i AS INT) AS d,
         CAST(p.embedding[CAST(m.i AS INT)] AS DOUBLE) - m.mu AS cv
  FROM pick p, mu m
),
dt AS (
  SELECT c.vec_id, list_sum(list(c.cv * u.u ORDER BY c.d)) AS dot
  FROM cent c JOIN uu u ON c.d = u.d GROUP BY c.vec_id
)
SELECT c.vec_id, c.d AS dim, round(c.cv - dt.dot * u.u, 6) AS w
FROM cent c JOIN uu u ON c.d = u.d JOIN dt ON c.vec_id = dt.vec_id
"""


@_q(
    "whitened_embedding_sample",
    _whiten_oracle(),
    doc="All-but-the-top postprocessing APPLIED (operators/similarity."
    "py:whiten_all_but_top; Mu & Viswanath 2018): mean removed and "
    "the top principal component projected out — w = (v−μ) − "
    "⟨v−μ,u⟩·u per dimension, for 4 md5-sampled vectors. "
    "embedding_principal_component DIAGNOSES the anisotropy; this "
    "performs the repair it recommends (a dominant common direction "
    "makes every cosine look alike). In production the 65-row μ/u "
    "frames broadcast against the full corpus and the transform is "
    "one map-side expression — the cheapest repair pass at 100 TB; "
    "the sampled long-format output here is the verification "
    "surface. Same exact-DECIMAL power-iteration numerics as the "
    "diagnostic; dot products fold d-sorted on both engines.",
)
def q_whitened_embedding_sample(spark, sf_dir):
    return sim.whiten_all_but_top(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        dim=64, iters=8, n_sample=4,
    )


def _perceptron_oracle(epochs: int = 24, bias_scale: int = 100) -> str:
    """Unrolled averaged-step pocket-perceptron twin of textops.
    perceptron_quality_gate — every epoch's integer update replayed
    exactly; per-epoch stat/weight CTEs MATERIALIZED (each read by the
    next epoch AND the candidate pool). The label reuses the
    quality_scores oracle's float formula verbatim (already
    hash-proven identical to Spark's quality_score_col)."""
    stop_list = ", ".join(f"'{w}'" for w in tx.LANG_STOPWORDS["en"])
    dot = "y * (w0*x0 + w1*x1 + w2*x2 + w3*x3 + w4*x4)"
    parts = [
        f"""
cnt AS (
  SELECT CAST(length(text) AS INT) AS n_chars,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS INT) AS n_tokens,
         CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INT) AS n_punct,
         CAST(len(regexp_extract_all(text, '[0-9]')) AS INT) AS n_digit,
         CAST(len(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
              t -> t IN ({stop_list}))) AS INT) AS n_stop
  FROM documents
),
feat AS MATERIALIZED (
  SELECT CASE WHEN
           round(least(CAST(n_tokens AS DOUBLE) / 100.0, 1.0) * 0.5
                 + round(CAST(n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) * 0.3
                 + (1.0 - least(CASE WHEN n_chars > 0
                       THEN round(CAST(n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE), 6)
                     END * 10, 1.0)) * 0.2, 6) >= 0.5
         THEN 1 ELSE -1 END AS y,
         CAST({bias_scale} AS BIGINT) AS x0,
         CAST(n_tokens AS BIGINT) AS x1,
         CAST(floor(CAST(1000 * n_stop AS DOUBLE) / CAST(n_tokens AS DOUBLE)) AS BIGINT) AS x2,
         CASE WHEN n_chars > 0
           THEN CAST(floor(CAST(1000 * n_punct AS DOUBLE) / CAST(n_chars AS DOUBLE)) AS BIGINT)
           ELSE 0 END AS x3,
         CASE WHEN n_chars > 0
           THEN CAST(floor(CAST(1000 * n_digit AS DOUBLE) / CAST(n_chars AS DOUBLE)) AS BIGINT)
           ELSE 0 END AS x4
  FROM cnt
),
w0t AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1,
               CAST(0 AS BIGINT) AS w2, CAST(0 AS BIGINT) AS w3,
               CAST(0 AS BIGINT) AS w4)"""
    ]
    for t in range(1, epochs + 1):
        ss = ", ".join(
            f"coalesce(CAST(sum(CASE WHEN {dot} <= 0 THEN y * x{i} END) AS BIGINT), 0) AS s{i}"
            for i in range(5)
        )
        # Pure-long floor division (mirrors textops: (s - pmod) is
        # exactly divisible, `//` exact at any magnitude, no 2^53 cap).
        ws = ", ".join(
            f"w{i} + CASE WHEN m > 0 THEN CAST((s{i} - ((s{i} % m) + m) % m) // m AS BIGINT) ELSE 0 END AS w{i}"
            for i in range(5)
        )
        parts.append(
            f""",
st{t} AS MATERIALIZED (
  SELECT CAST(sum(CASE WHEN {dot} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS correct,
         CAST(count(*) AS BIGINT) AS total,
         coalesce(CAST(sum(CASE WHEN {dot} <= 0 THEN 1 END) AS BIGINT), 0) AS m,
         {ss}
  FROM feat, w{t - 1}t
),
cand{t} AS (SELECT {t} AS ep, correct, total, w0, w1, w2, w3, w4
            FROM st{t}, w{t - 1}t),
w{t}t AS MATERIALIZED (SELECT {ws} FROM w{t - 1}t, st{t})"""
        )
    cands = " UNION ALL ".join(
        f"SELECT * FROM cand{t}" for t in range(1, epochs + 1)
    )
    parts.append(
        f""",
fin AS (
  SELECT CAST(sum(CASE WHEN {dot} > 0 THEN 1 ELSE 0 END) AS BIGINT) AS correct,
         CAST(count(*) AS BIGINT) AS total
  FROM feat, w{epochs}t
),
candF AS (SELECT {epochs + 1} AS ep, correct, total, w0, w1, w2, w3, w4
          FROM fin, w{epochs}t),
pocket AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (ORDER BY correct DESC, ep ASC) AS rn
    FROM ({cands} UNION ALL SELECT * FROM candF)
  ) WHERE rn = 1
)
SELECT 'bias' AS term, w0 AS value FROM pocket
UNION ALL SELECT 'n_tokens', w1 FROM pocket
UNION ALL SELECT 'stop_permille', w2 FROM pocket
UNION ALL SELECT 'punct_permille', w3 FROM pocket
UNION ALL SELECT 'digit_permille', w4 FROM pocket
UNION ALL SELECT 'train_correct', correct FROM pocket
UNION ALL SELECT 'train_total', total FROM pocket"""
    )
    return "WITH " + "".join(parts)


@_q(
    "perceptron_quality_gate",
    _perceptron_oracle(),
    doc="Averaged-step POCKET perceptron (Gallant 1990) distilling "
    "the float composite quality heuristic (label: quality_score >= "
    "0.5, the formula already hash-proven cross-engine in "
    "quality_scores) into five per-mille INTEGER count features "
    "(operators/textops.py:perceptron_quality_gate) — the "
    "fastText-style replacement of an expensive gate with a map-side "
    "dot product; pocket recovers the separable-by-construction gate "
    "at ~96% train accuracy on the fixture. Chosen over logistic "
    "regression because the whole trajectory is EXACT INT64 (no "
    "exp/log — the cross-engine float rule): per epoch w += "
    "floor(sum(y·x)/m) over the m misclassified rows (ties "
    "misclassified), pocket = best-accuracy iterate (integer compare, "
    "earliest-epoch tiebreak), fixed epoch count (anytime contract). "
    "ONE persisted feature scan; per epoch ONE combinable aggregate "
    "yields both the pocket candidate and the update — the "
    "bpe_train/kmeans bounded-iteration frame. Output long-format "
    "(term, value) pocket weights + training accuracy counts.",
)
def q_perceptron_quality_gate(spark, sf_dir):
    return tx.perceptron_quality_gate(
        _t(spark, sf_dir, "documents"), "text", threshold=0.5, epochs=24
    )


@_q(
    "nation_theil_sen_trend",
    f"""
WITH daily AS (
  SELECT n_name,
         date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS x,
         sum(CAST(o_totalprice AS DECIMAL(12,2))) AS rev
  FROM orders
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey
  GROUP BY 1, 2
),
rep AS (
  SELECT n_name, CAST(x AS BIGINT) AS x, CAST(rev AS DECIMAL(18,2)) AS y, r
  FROM daily, LATERAL unnest(generate_series(1, 8)) AS ru(r)
),
rk AS (
  SELECT n_name, r, x, y,
         row_number() OVER (
           PARTITION BY n_name, r
           ORDER BY {md5_long_sql("concat(CAST(r AS VARCHAR), ':', CAST(x AS VARCHAR))")} ASC,
                    x ASC) AS rn
  FROM rep
),
pairs AS (
  SELECT n_name, r, (rn - 1) // 2 AS pid,
         max(CASE WHEN rn % 2 = 1 THEN x END) AS x1,
         max(CASE WHEN rn % 2 = 1 THEN y END) AS y1,
         max(CASE WHEN rn % 2 = 0 THEN x END) AS x2,
         max(CASE WHEN rn % 2 = 0 THEN y END) AS y2
  FROM rk GROUP BY 1, 2, 3
),
sl AS (
  SELECT n_name, CAST(y2 - y1 AS DOUBLE) / CAST(x2 - x1 AS DOUBLE) AS slope
  FROM pairs WHERE x2 IS NOT NULL AND x1 <> x2
)
SELECT n_name, CAST(count(*) AS BIGINT) AS n_slopes,
       round(quantile_cont(slope, 0.5), 6) AS ts_slope
FROM sl GROUP BY 1
""",
    doc="Per-nation Theil-Sen robust trend of daily revenue "
    "(operators/timeseries.py:grouped_theil_sen) — the median-slope "
    "robust sibling of nation_revenue_trend's OLS, as MAD pairs with "
    "mean/stddev: outlier days cannot drag the slope (29% breakdown "
    "vs OLS's 0). All-pairs Theil-Sen is O(n²) per group; this is the "
    "repeated-random-pairing estimator made DETERMINISTIC (points "
    "ranked by md5(round:x) per round, consecutive ranks paired — "
    "8 rounds → O(8n) sampled slopes, reproducible across engines/"
    "partitionings/retries, unlike rand()). y deltas subtract in "
    "DECIMAL, x deltas in int64, ONE double division per slope with "
    "equal-x pairs filtered (ANSI-safe); exact per-group median "
    "(percentile == quantile_cont; percentile_approx at 100 TB).",
)
def q_nation_theil_sen_trend(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(F.to_date("o_orderdate"), F.lit("1992-01-01")).alias("x"),
        F.col("o_totalprice").cast("decimal(12,2)").alias("p"),
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", "x")
        .agg(F.sum("p").alias("rev"))
    )
    return ts_ops.grouped_theil_sen(daily, "n_name", "x", "rev", rounds=8)


def _unigram_lm_oracle(
    L: int = 12, P: int = 4, min_freq: int = 2, k: int = 50
) -> str:
    """Unrolled-DP DuckDB twin of textops.unigram_lm_piece_scores:
    dp/dpu levels are MATERIALIZED (each referenced by later levels
    AND the walk — the kcore inline-explosion lesson), the Viterbi
    argmax is the row_number-rn=1 idiom, and every float op (one
    prob division, per-arc products) mirrors Spark's association
    order exactly."""
    parts = [
        f"""
wf AS MATERIALIZED (
  SELECT substr(word, 1, {L}) AS word, count(*) AS wcnt FROM (
    SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS word
    FROM documents
  ) WHERE word <> '' GROUP BY 1
),
occ AS (
  SELECT substr(word, CAST(s AS INT), CAST(l AS INT)) AS piece, wcnt
  FROM wf,
       LATERAL unnest(generate_series(1, length(word))) AS su(s),
       LATERAL unnest(generate_series(1, least({P}, length(word) - s + 1))) AS lu(l)
),
pieces AS MATERIALIZED (
  SELECT piece, CAST(sum(wcnt) AS BIGINT) AS freq
  FROM occ GROUP BY piece
  HAVING sum(wcnt) >= {min_freq} OR length(piece) = 1
),
tot AS (SELECT CAST(sum(freq) AS DOUBLE) AS total FROM pieces),
pr AS MATERIALIZED (
  SELECT piece, freq, CAST(freq AS DOUBLE) / total AS prob FROM pieces, tot
),
arcs AS MATERIALIZED (
  SELECT a.word, a.j, a.i, a.piece, p.prob
  FROM (
    SELECT word, CAST(i - l AS INT) AS j, CAST(i AS INT) AS i,
           substr(word, CAST(i - l + 1 AS INT), CAST(l AS INT)) AS piece
    FROM wf,
         LATERAL unnest(generate_series(1, length(word))) AS iu(i),
         LATERAL unnest(generate_series(1, least({P}, i))) AS lu(l)
  ) a JOIN pr p USING (piece)
),
dpu0 AS (
  SELECT word, CAST(0 AS INT) AS i, CAST(1.0 AS DOUBLE) AS prob,
         CAST(NULL AS INT) AS bj, CAST(NULL AS VARCHAR) AS bpiece
  FROM wf
)"""
    ]
    for i in range(1, L + 1):
        parts.append(
            f""",
dp{i} AS MATERIALIZED (
  SELECT word, i, prob, bj, bpiece FROM (
    SELECT a.word, a.i AS i, d.prob * a.prob AS prob, a.j AS bj,
           a.piece AS bpiece,
           row_number() OVER (PARTITION BY a.word
             ORDER BY d.prob * a.prob DESC, a.j ASC, a.piece ASC) AS rn
    FROM arcs a JOIN dpu{i - 1} d ON a.word = d.word AND a.j = d.i
    WHERE a.i = {i}
  ) WHERE rn = 1
),
dpu{i} AS MATERIALIZED (
  SELECT * FROM dpu{i - 1} UNION ALL SELECT * FROM dp{i}
)"""
        )
    parts.append(
        f""",
dpall AS MATERIALIZED (SELECT * FROM dpu{L} WHERE i >= 1),
w0 AS (SELECT word, wcnt, CAST(length(word) AS INT) AS pos FROM wf)"""
    )
    for t in range(1, L + 1):
        parts.append(
            f""",
e{t} AS MATERIALIZED (
  SELECT w.word, w.wcnt, d.bpiece, d.bj
  FROM w{t - 1} w JOIN dpall d ON w.word = d.word AND w.pos = d.i
),
w{t} AS (SELECT word, wcnt, bj AS pos FROM e{t} WHERE bj > 0)"""
        )
    unions = " UNION ALL ".join(
        f"SELECT bpiece, wcnt FROM e{t}" for t in range(1, L + 1)
    )
    parts.append(
        f""",
em AS (
  SELECT bpiece AS piece, CAST(sum(wcnt) AS BIGINT) AS em_count
  FROM ({unions}) GROUP BY 1
)
SELECT em.piece, em.em_count, pr.freq AS seed_freq
FROM em JOIN pr USING (piece)
ORDER BY em_count DESC, piece ASC
LIMIT {k}"""
    )
    return "WITH " + "".join(parts)


@_q(
    "unigram_lm_piece_scores",
    _unigram_lm_oracle(),
    doc="One hard-EM round of SentencePiece-style unigram-LM tokenizer "
    "training (operators/textops.py:unigram_lm_piece_scores, Kudo "
    "2018): char-n-gram seed pieces re-counted under each word's "
    "VITERBI segmentation — bpe_train's probabilistic sibling, same "
    "anytime-iteration frame. Everything after the one corpus scan "
    "runs on the DISTINCT-WORD relation; the lattice is max_word_len "
    "bounded, UNROLLED DP levels (word-keyed join per level, eager "
    "localCheckpoint so the ~4^L logical-plan fan-in never builds), "
    "then a bounded backpointer walk. No ln(): Viterbi compares raw "
    "probability products (identical association order both engines), "
    "and the OUTPUT is integer-only (piece, em_count, seed_freq).",
)
def q_unigram_lm_piece_scores(spark, sf_dir):
    return tx.unigram_lm_piece_scores(
        _t(spark, sf_dir, "documents"),
        "text",
        max_word_len=12,
        max_piece_len=4,
        min_freq=2,
        k=50,
    )


@_q(
    "duplicate_substring_spans",
    f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         {md5_long_sql("array_to_string(t[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')")} AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 7)) AS u(i)
  WHERE len(t) >= 8
),
dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dupg USING (g)),
fl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
              THEN 0 ELSE 1 END AS new
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(new) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM fl
)
SELECT doc_id,
       CAST(min(pos) AS INT) AS start_tok,
       CAST(max(pos) + 7 AS INT) AS end_tok,
       CAST(max(pos) + 7 - min(pos) + 1 AS INT) AS span_tokens
FROM isl GROUP BY doc_id, island
""",
    doc="Exact long-duplicate-substring spans (operators/dedup.py:"
    "duplicate_substring_spans; Lee et al. 2022 suffix-array dedup): "
    "maximal per-doc token ranges covered by a ≥8-token substring "
    "occurring ≥2× corpus-wide — the spans the next stage cuts from "
    "training text, complementing the document-level MinHash/SimHash "
    "families and CDC. The suffix-sort + adjacent-LCP scan reduces "
    "exactly to duplicated-L-gram detection (equal L-grams ⟺ adjacent "
    "truncated suffixes with LCP ≥ L), swapping a global sort for two "
    "key-partitioned shuffles: map-side positioned 60-bit gram hashes, "
    "map-side-combinable gram counts + an AQE-splittable join back "
    "(not a count-window — a hot boilerplate gram would pin one "
    "reducer), then a doc-keyed gaps-and-islands merge.",
)
def q_duplicate_substring_spans(spark, sf_dir):
    return dd.duplicate_substring_spans(
        _t(spark, sf_dir, "documents"), "doc_id", "text", min_tokens=8
    )


@_q(
    "contamination_spans",
    f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         {md5_long_sql("array_to_string(t[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')")} AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 4
),
evg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
hits AS (SELECT doc_id, pos FROM grams
         WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM evg)),
fl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 4
              THEN 0 ELSE 1 END AS new
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(new) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM fl
)
SELECT doc_id,
       CAST(min(pos) AS INT) AS start_tok,
       CAST(max(pos) + 3 AS INT) AS end_tok,
       CAST(max(pos) + 3 - min(pos) + 1 AS INT) AS span_tokens
FROM isl GROUP BY doc_id, island
""",
    doc="SPAN-LEVEL eval decontamination (operators/dedup.py:"
    "contamination_spans): per TRAIN document (doc_id % 97 <> 0, the "
    "decontaminated_docs split), the maximal token ranges covered by a "
    "≥4-token substring appearing anywhere in the eval split — the "
    "ranges the pipeline CUTS, keeping the rest of the doc, where the "
    "doc-level 4-gram tier (decontaminated_docs) drops it whole. "
    "Completes the decontamination tier: exact 4-gram blocklist + "
    "MinHash fuzzy + exact substring spans. Same suffix-array⇒dup-"
    "L-gram reduction as duplicate_substring_spans, but the dup-gram "
    "set is the DISTINCT eval gram relation — eval suites are ≪ the "
    "training corpus, so it broadcasts and the marking pass is a "
    "map-side semi-join: zero shuffle of train grams before the "
    "doc-keyed island merge.",
)
def q_contamination_spans(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    return dd.contamination_spans(train, ev, "doc_id", "text", min_tokens=4)


@_q(
    "span_surgery_docs",
    f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         {md5_long_sql("array_to_string(t[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')")} AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 4
),
evg AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
hits AS (SELECT doc_id, pos FROM grams
         WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM evg)),
fl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 4
              THEN 0 ELSE 1 END AS new
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(new) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM fl
),
spans AS (
  SELECT doc_id, min(pos) AS start_tok, max(pos) + 3 AS end_tok
  FROM isl GROUP BY doc_id, island
),
pos AS (
  SELECT doc_id, CAST(i AS INT) AS pos, t[CAST(i AS INT)] AS tok
  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)
  WHERE doc_id % 97 <> 0
),
kept AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS txt
  FROM pos p
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = p.doc_id
                      AND p.pos BETWEEN s.start_tok AND s.end_tok)
  GROUP BY doc_id
),
nsp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.t) AS INT) AS n_tokens,
       CAST(coalesce(n.n_spans, 0) AS INT) AS n_spans,
       CAST(len(t.t) - coalesce(k.n_kept, 0) AS INT) AS n_removed_tokens,
       coalesce(k.txt, '') AS clean_text
FROM toks t
LEFT JOIN kept k USING (doc_id)
LEFT JOIN nsp n USING (doc_id)
WHERE t.doc_id % 97 <> 0
ORDER BY t.doc_id
""",
    doc="SPAN SURGERY (operators/dedup.py:apply_span_surgery) — the "
    "APPLY stage completing the decontamination tier end-to-end: "
    "contamination_spans finds the ≥4-token ranges shared with the "
    "eval split (doc_id % 97 = 0); this row EMITS the rewritten train "
    "corpus with those ranges excised and the rest of each document "
    "kept — Lee et al. 2022's cut step, where the doc-level tier "
    "(decontaminated_docs) would drop whole documents. All Catalyst: "
    "spans collapse to one (start,end)-struct array per doc (bounded "
    "— disjoint merged spans, each ≥4 tokens), join back, and the cut "
    "is a positional higher-order filter with an exists() membership "
    "test; recomposition is array_join. Every original occurrence of "
    "a flagged gram is destroyed by construction (pinned by the "
    "planted-overlap pytest: zero eval 4-grams survive in clean_text).",
)
def q_span_surgery_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    spans = dd.contamination_spans(train, ev, "doc_id", "text", min_tokens=4)
    return dd.apply_span_surgery(train, spans, "doc_id", "text").orderBy(
        "doc_id"
    )


@_q(
    "dedup_span_surgery_docs",
    f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id, CAST(i AS INT) AS pos,
         {md5_long_sql("array_to_string(t[CAST(i AS INT):CAST(i + 7 AS INT)], ' ')")} AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 7)) AS u(i)
  WHERE len(t) >= 8
),
dupg AS (SELECT g FROM grams GROUP BY g HAVING count(*) >= 2),
hits AS (SELECT doc_id, pos FROM grams JOIN dupg USING (g)),
fl AS (
  SELECT doc_id, pos,
         CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) <= 8
              THEN 0 ELSE 1 END AS new
  FROM hits
),
isl AS (
  SELECT doc_id, pos,
         sum(new) OVER (PARTITION BY doc_id ORDER BY pos
                        ROWS UNBOUNDED PRECEDING) AS island
  FROM fl
),
spans AS (
  SELECT doc_id, min(pos) AS start_tok, max(pos) + 7 AS end_tok
  FROM isl GROUP BY doc_id, island
),
pos AS (
  SELECT doc_id, CAST(i AS INT) AS pos, t[CAST(i AS INT)] AS tok
  FROM toks, LATERAL unnest(generate_series(1, len(t))) AS u(i)
),
kept AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY pos) AS txt
  FROM pos p
  WHERE NOT EXISTS (SELECT 1 FROM spans s
                    WHERE s.doc_id = p.doc_id
                      AND p.pos BETWEEN s.start_tok AND s.end_tok)
  GROUP BY doc_id
),
nsp AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans
        FROM spans GROUP BY doc_id)
SELECT t.doc_id, CAST(len(t.t) AS INT) AS n_tokens,
       CAST(coalesce(n.n_spans, 0) AS INT) AS n_spans,
       CAST(len(t.t) - coalesce(k.n_kept, 0) AS INT) AS n_removed_tokens,
       coalesce(k.txt, '') AS clean_text
FROM toks t
LEFT JOIN kept k USING (doc_id)
LEFT JOIN nsp n USING (doc_id)
ORDER BY t.doc_id
""",
    doc="SELF-dedup span surgery — apply_span_surgery composed with "
    "duplicate_substring_spans: the rewritten corpus with every "
    "maximal ≥8-token range that occurs ≥2× corpus-wide excised from "
    "EVERY occurrence (the cut-all policy of Lee et al. 2022's "
    "ExactSubstr tooling, whose documented quirk is that twice-"
    "duplicated text vanishes entirely; a keep-one-copy policy needs "
    "an ownership rule assigning each duplicated gram run a surviving "
    "doc — noted, not implemented). Together with span_surgery_docs "
    "(the train-vs-eval cut) the APPLY stage now covers both span "
    "producers. Same Catalyst shape: span-array join + positional "
    "higher-order filter + array_join recomposition.",
)
def q_dedup_span_surgery_docs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    spans = dd.duplicate_substring_spans(docs, "doc_id", "text", min_tokens=8)
    return dd.apply_span_surgery(docs, spans, "doc_id", "text").orderBy(
        "doc_id"
    )


@_q(
    "dedup_threshold_curve",
    "WITH mp AS (SELECT * FROM ("
    + _minhash_oracle(k=12, bands=4, threshold=0.7)
    + """) z),
th AS (SELECT unnest([0.7, 0.8, 0.9]) AS threshold),
x AS (
  SELECT t.threshold, m.doc_a, m.doc_b
  FROM mp m JOIN th t ON m.jaccard >= t.threshold
),
p AS (
  SELECT threshold, CAST(count(*) AS BIGINT) AS n_pairs
  FROM x GROUP BY 1
),
d AS (
  SELECT threshold, CAST(count(DISTINCT dd) AS BIGINT) AS n_dup_docs
  FROM (SELECT threshold, doc_a AS dd FROM x
        UNION ALL SELECT threshold, doc_b FROM x) u
  GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents)
SELECT CAST(t.threshold AS DOUBLE) AS threshold,
       CAST(coalesce(p.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(coalesce(d.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
       round(CAST(coalesce(d.n_dup_docs, 0) AS DOUBLE)
             / CAST(tot.n_docs AS DOUBLE), 6) AS dup_doc_rate
FROM th t
LEFT JOIN p ON p.threshold = t.threshold
LEFT JOIN d ON d.threshold = t.threshold
CROSS JOIN tot
ORDER BY threshold
""",
    doc="Dedup threshold sensitivity curve — the third member of the "
    "tuning-curve tier (banding S-curve chooses the LSH banding, "
    "nprobe curve the serving knob; this chooses the VERIFY "
    "threshold): near-dup pair count, distinct docs in ≥1 pair, and "
    "the dup-doc rate at Jaccard ≥ 0.7/0.8/0.9, all cut from ONE "
    "MinHash(12)+LSH(4×3) candidates+verify relation computed at the "
    "loosest threshold and persisted — the marginal corpus loss of "
    "tightening the dedup gate, measured before committing a "
    "full-corpus rerun. The threshold explode is 3 rows/pair; both "
    "aggregates are combinable groupBys on the slim pair relation.",
)
def q_dedup_threshold_curve(spark, sf_dir):
    from .session import cut_lineage

    docs = _t(spark, sf_dir, "documents")
    # Eager lineage cut, not a lazy persist: the slim verified-pair
    # relation has three consumers (two aggregates + the spine), and a
    # lazy persist leaves the full MinHash subtree embedded in each
    # consumer's plan (audited at 142 exchanges round 11) — any
    # consumer that misses cache re-derives LSH from scratch. After
    # the checkpoint every consumer plans against a scan of the
    # materialized pair blocks.
    pairs = cut_lineage(
        dd.minhash_lsh_pairs(
            docs, "doc_id", "text", k=12, bands=4, threshold=0.7
        )
    )
    x = pairs.select(
        "doc_a",
        "doc_b",
        "jaccard",
        F.explode(
            F.array(F.lit(0.7), F.lit(0.8), F.lit(0.9))
        ).alias("threshold"),
    ).where(F.col("jaccard") >= F.col("threshold"))
    p = x.groupBy("threshold").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs")
    )
    d = (
        x.select(
            "threshold", F.explode(F.array("doc_a", "doc_b")).alias("dd")
        )
        .groupBy("threshold")
        .agg(F.countDistinct("dd").cast("long").alias("n_dup_docs"))
    )
    tot = docs.agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
    spine = spark.createDataFrame(
        [(0.7,), (0.8,), (0.9,)], "threshold double"
    )
    return (
        spine.join(p, "threshold", "left")
        .join(d, "threshold", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            F.coalesce("n_pairs", F.lit(0)).cast("long").alias("n_pairs"),
            F.coalesce("n_dup_docs", F.lit(0))
            .cast("long")
            .alias("n_dup_docs"),
            # NULL rate on an empty corpus — not an ANSI 0/0 crash.
            F.when(
                F.col("n_docs") > 0,
                F.round(
                    F.coalesce("n_dup_docs", F.lit(0)).cast("double")
                    / F.col("n_docs").cast("double"),
                    6,
                ),
            ).alias("dup_doc_rate"),
        )
        .orderBy("threshold")
    )


@_q(
    "dedup_family_agreement",
    f"""
WITH lex AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) m
),
sem AS (
  SELECT id_a AS doc_a, id_b AS doc_b
  FROM ({_signlsh_adaptive_oracle(threshold=0.42)}) s
),
j AS (
  SELECT CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS lx,
         CASE WHEN r.doc_a IS NOT NULL THEN 1 ELSE 0 END AS sx
  FROM lex l FULL JOIN sem r
    ON l.doc_a = r.doc_a AND l.doc_b = r.doc_b
)
SELECT CAST(sum(lx) AS BIGINT) AS n_lexical,
       CAST(sum(sx) AS BIGINT) AS n_semantic,
       CAST(sum(lx * sx) AS BIGINT) AS n_both,
       CAST(sum(lx * (1 - sx)) AS BIGINT) AS n_only_lexical,
       CAST(sum(sx * (1 - lx)) AS BIGINT) AS n_only_semantic,
       CASE WHEN count(*) = 0 THEN NULL
            ELSE round(CAST(sum(lx * sx) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6)
       END AS pair_jaccard
FROM j
""",
    doc="Lexical-vs-semantic dedup AGREEMENT — the number that decides "
    "whether embedding dedup earns its cost on top of MinHash (the "
    "SemDeDup question asked of real relations): the verified MinHash "
    "pair set (exact Jaccard >= 0.8) and the sign-LSH cosine pair set "
    "(>= 0.42, corpus-adaptive banding) meet in ONE full outer join "
    "on the shared id domain; the row reports each family's pair "
    "count, the intersection, each side's exclusive catches, and the "
    "pair-set Jaccard. High agreement ⇒ the cheaper family suffices; "
    "a large n_only_semantic is the paraphrase mass only embeddings "
    "see. Both member relations are verbatim the standalone green "
    "operators. On THIS fixture the answer is pair_jaccard = 0 — the "
    "synthetic embeddings are generated independently of the "
    "documents' text, so the two families flag disjoint pair sets; "
    "an honest measured zero, like the audio r6 arm.",
)
def q_dedup_family_agreement(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lex = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    ).select("doc_a", "doc_b", F.lit(1).alias("lx"))
    sem = sim.cosine_neardup_pairs(emb, threshold=0.42).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.lit(1).alias("sx"),
    )
    j = lex.join(sem, ["doc_a", "doc_b"], "full").select(
        F.coalesce("lx", F.lit(0)).alias("lx"),
        F.coalesce("sx", F.lit(0)).alias("sx"),
    )
    return j.agg(
        F.sum("lx").cast("long").alias("n_lexical"),
        F.sum("sx").cast("long").alias("n_semantic"),
        F.sum(F.col("lx") * F.col("sx")).cast("long").alias("n_both"),
        F.sum(F.col("lx") * (1 - F.col("sx")))
        .cast("long")
        .alias("n_only_lexical"),
        F.sum(F.col("sx") * (1 - F.col("lx")))
        .cast("long")
        .alias("n_only_semantic"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.sum(F.col("lx") * F.col("sx")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ),
        ).alias("pair_jaccard"),
    )


@_q(
    "text_hashed_embeddings",
    "WITH "
    + tx.hashed_text_embeddings_sql()
    + """
SELECT vec_id AS doc_id,
       array_to_string(list_transform(embedding,
         x -> CAST(CAST(x AS BIGINT) AS VARCHAR)), ',') AS emb_sig
FROM temb
ORDER BY doc_id
""",
    doc="The TEXT-DERIVED embedding fixture twin (verdict r12 item "
    "#2): feature-hashing (Weinberger ICML'09) over each document's "
    "bag of word 3-grams — md5-hashed gram → dimension h % 64, sign "
    "± from bit 6 — summed to a 64-dim signed-count vector, entirely "
    "in Catalyst higher-order functions (one md5 per gram, no "
    "shuffle, no UDF). Unlike the synthetic embeddings table "
    "(text-independent, so semantic similarity there is noise), "
    "cosine over THESE vectors is a real soft-overlap similarity, "
    "which makes the semantic-dedup tier's agreement numbers "
    "meaningful. The row serializes the integer-valued vector "
    "(values are sums of ±1, so the long cast is exact and "
    "formatting-stable) for the cross-engine hash; the DuckDB "
    "oracle replays tokenization, gram slicing, hash, sign, and the "
    "dims-grid fold verbatim.",
)
def q_text_hashed_embeddings(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    emb = tx.hashed_text_embeddings(docs)
    return emb.select(
        F.col("vec_id").alias("doc_id"),
        F.array_join(
            F.transform("embedding", lambda x: x.cast("long").cast("string")),
            ",",
        ).alias("emb_sig"),
    ).orderBy("doc_id")


@_q(
    "dedup_family_agreement_text",
    "WITH "
    + tx.hashed_text_embeddings_sql()
    + f""",
lex AS (
  SELECT doc_a, doc_b FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) m
),
sem AS (
  SELECT id_a AS doc_a, id_b AS doc_b
  FROM ({_signlsh_adaptive_oracle(threshold=0.5, emb_rel="temb")}) s
),
j AS (
  SELECT CASE WHEN l.doc_a IS NOT NULL THEN 1 ELSE 0 END AS lx,
         CASE WHEN r.doc_a IS NOT NULL THEN 1 ELSE 0 END AS sx
  FROM lex l FULL JOIN sem r
    ON l.doc_a = r.doc_a AND l.doc_b = r.doc_b
)
SELECT CAST(sum(lx) AS BIGINT) AS n_lexical,
       CAST(sum(sx) AS BIGINT) AS n_semantic,
       CAST(sum(lx * sx) AS BIGINT) AS n_both,
       CAST(sum(lx * (1 - sx)) AS BIGINT) AS n_only_lexical,
       CAST(sum(sx * (1 - lx)) AS BIGINT) AS n_only_semantic,
       CASE WHEN count(*) = 0 THEN NULL
            ELSE round(CAST(sum(lx * sx) AS DOUBLE)
                       / CAST(count(*) AS DOUBLE), 6)
       END AS pair_jaccard
FROM j
""",
    doc="dedup_family_agreement asked on NON-DEGENERATE truth "
    "(verdict r12 item #2): the lexical arm is unchanged (verified "
    "MinHash, exact Jaccard >= 0.8) but the semantic arm runs the "
    "SAME production sign-LSH cosine matcher over the text-derived "
    "hashed embeddings (text_hashed_embeddings) at cosine >= 0.5 — "
    "so the two families finally see the same underlying text and "
    "the agreement number answers the SemDeDup question for real. "
    "Measured on this fixture: n_both > 0 (every planted near-dup "
    "pair is caught by both arms) and n_only_semantic > 0 — the "
    "paraphrase/containment mass (e.g. a doc vs its half: shingle "
    "Jaccard ~0.5, below the lexical bar, but cosine ~sqrt(0.5) "
    "over shared-gram counts) that ONLY the embedding arm sees, "
    "which is precisely the mass that decides whether semantic "
    "dedup earns its cost. The degenerate twin over the synthetic "
    "embeddings table stays registered as the algebra check.",
)
def q_dedup_family_agreement_text(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    lex = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    ).select("doc_a", "doc_b", F.lit(1).alias("lx"))
    sem = sim.cosine_neardup_pairs(
        tx.hashed_text_embeddings(docs), threshold=0.5
    ).select(
        F.col("id_a").alias("doc_a"),
        F.col("id_b").alias("doc_b"),
        F.lit(1).alias("sx"),
    )
    j = lex.join(sem, ["doc_a", "doc_b"], "full").select(
        F.coalesce("lx", F.lit(0)).alias("lx"),
        F.coalesce("sx", F.lit(0)).alias("sx"),
    )
    return j.agg(
        F.sum("lx").cast("long").alias("n_lexical"),
        F.sum("sx").cast("long").alias("n_semantic"),
        F.sum(F.col("lx") * F.col("sx")).cast("long").alias("n_both"),
        F.sum(F.col("lx") * (1 - F.col("sx")))
        .cast("long")
        .alias("n_only_lexical"),
        F.sum(F.col("sx") * (1 - F.col("lx")))
        .cast("long")
        .alias("n_only_semantic"),
        F.when(
            F.count(F.lit(1)) > 0,
            F.round(
                F.sum(F.col("lx") * F.col("sx")).cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ),
        ).alias("pair_jaccard"),
    )


@_q(
    "semantic_dedup_survivors_text",
    "WITH RECURSIVE "
    + tx.hashed_text_embeddings_sql()
    + f""",
pairs AS (
  SELECT id_a, id_b FROM ({_signlsh_adaptive_oracle(threshold=0.5, emb_rel="temb")}) sp
),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
),
walk(node, label) AS (
  SELECT vec_id, vec_id FROM temb
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
),
clusters AS (
  SELECT node AS doc_id, min(label) AS cluster_id FROM walk GROUP BY node
)
SELECT cluster_id AS doc_id, count(*) AS n_members
FROM clusters GROUP BY cluster_id
""",
    doc="semantic_dedup_survivors on NON-DEGENERATE truth: the same "
    "sign-LSH-pairs → connected-components → min-id-survivor "
    "pipeline, run over the text-derived hashed embeddings at "
    "cosine >= 0.5 — so the semantic clusters actually merge "
    "paraphrase/containment families the MinHash clusters split, "
    "instead of partitioning noise. Oracle = recursive-CTE "
    "reachability over the replayed LSH pairs, seeded from the "
    "derived-embedding id domain (docs with >= 3 tokens).",
)
def q_semantic_dedup_survivors_text(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    emb = tx.hashed_text_embeddings(docs)
    pairs = sim.cosine_neardup_pairs(emb, threshold=0.5)
    comp = graph.connected_components(pairs, "id_a", "id_b")
    clusters = (
        emb.select(F.col("vec_id").alias("doc_id"))
        .join(comp.withColumnRenamed("node", "doc_id"), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster", F.col("doc_id")).alias("cluster_id"),
        )
    )
    return (
        clusters.groupBy("cluster_id")
        .agg(F.count(F.lit(1)).alias("n_members"))
        .select(F.col("cluster_id").alias("doc_id"), "n_members")
    )


@_q(
    "neardup_gate_quarantine",
    "SELECT CAST(doc_a % 3 AS BIGINT) AS batch_id, doc_a AS doc_id, "
    "doc_b AS matched_doc, jaccard FROM ("
    + _minhash_oracle(
        k=12,
        bands=4,
        threshold=0.8,
        pair_pred="a.doc_id % 2 = 1 AND b.doc_id % 2 = 0",
    )
    + ") g ORDER BY doc_id, matched_doc",
    doc="Batch-checkable twin of the STREAMING near-dup ingestion "
    "gate (streaming/sinks.py:neardup_gate_batch — round 11's "
    "pytest-only surface, now driver-hashed): even-id documents form "
    "the frozen accepted-corpus index, odd-id documents arrive as "
    "the stream replayed over a 3-batch spine (batch_id = doc_id % "
    "3), and the quarantine log is every incoming doc that verifies "
    "against an index doc at exact Jaccard >= 0.8 after the band-key "
    "bucket join. The log is computed by dedup.neardup_gate_log — "
    "the SAME single construction the foreachBatch sink calls per "
    "micro-batch, so this row hashes the gate's actual algebra, not "
    "a parallel copy; the frozen index makes per-batch gating equal "
    "the all-at-once relation (order-insensitive union), which is "
    "what makes the stream batch-checkable at all. Oracle: the "
    "minhash fragment with the cross-half (incoming vs index) "
    "candidate predicate.",
)
def q_neardup_gate_quarantine(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    corpus = docs.where(F.col("doc_id") % 2 == 0)
    incoming = docs.where(F.col("doc_id") % 2 == 1)
    ikeys, ish = dd.minhash_index_relations(corpus, "doc_id", "text")
    log = dd.neardup_gate_log(incoming, ikeys, ish, "doc_id", "text")
    return log.select(
        (F.col("doc_in") % 3).cast("long").alias("batch_id"),
        F.col("doc_in").alias("doc_id"),
        F.col("doc_ref").alias("matched_doc"),
        "jaccard",
    ).orderBy("doc_id", "matched_doc")


@_q(
    "contamination_direction_matrix",
    f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         {md5_long_sql("array_to_string(t[CAST(i AS INT):CAST(i + 3 AS INT)], ' ')")} AS g
  FROM toks, LATERAL unnest(generate_series(1, len(t) - 3)) AS u(i)
  WHERE len(t) >= 4
),
tsrc AS (SELECT DISTINCT source FROM documents WHERE doc_id % 97 <> 0),
esrc AS (SELECT DISTINCT source FROM documents WHERE doc_id % 97 = 0),
eg AS (
  SELECT DISTINCT gr.g, d.source AS eval_source
  FROM grams gr JOIN documents d USING (doc_id)
  WHERE d.doc_id % 97 = 0
),
hits AS (
  SELECT gr.doc_id, d.source AS train_source, e.eval_source
  FROM grams gr
  JOIN documents d USING (doc_id)
  JOIN eg e ON gr.g = e.g
  WHERE d.doc_id % 97 <> 0
),
per AS (
  SELECT train_source, eval_source,
         CAST(count(*) AS BIGINT) AS n_gram_hits,
         CAST(count(DISTINCT doc_id) AS BIGINT) AS n_train_docs
  FROM hits GROUP BY 1, 2
)
SELECT s.source AS train_source, e.source AS eval_source,
       CAST(coalesce(p.n_gram_hits, 0) AS BIGINT) AS n_gram_hits,
       CAST(coalesce(p.n_train_docs, 0) AS BIGINT) AS n_train_docs
FROM tsrc s
CROSS JOIN esrc e
LEFT JOIN per p
  ON p.train_source = s.source AND p.eval_source = e.source
ORDER BY train_source, eval_source
""",
    doc="Per-source contamination DIRECTION matrix — which training "
    "feed contaminates which eval suite: for every (train source × "
    "eval source) cell, the number of ≥4-token gram occurrences in "
    "that train source that also appear in that eval source, and the "
    "distinct train docs carrying them (the cross_source_dup_matrix "
    "move applied to the train×eval axis; completes decontamination "
    "REPORTING the way round 10 completed dedup reporting — spans "
    "say what to cut, this says which ingestion pipeline to fix). "
    "Train grams meet the (gram, eval_source) relation in ONE "
    "broadcast hash join (eval suites ≪ corpus); the all-cells spine "
    "is the litbound pattern — two keys=[] collect_set aggregates "
    "crossed at one row each then exploded, plan-provably bounded.",
)
def q_contamination_direction_matrix(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    ev = docs.filter(F.col("doc_id") % 97 == 0)
    tg = dd._positioned_grams(train, "doc_id", "text", 4).join(
        train.select("doc_id", F.col("source").alias("train_source")),
        "doc_id",
    )
    eg = (
        dd._positioned_grams(ev, "doc_id", "text", 4)
        .join(
            ev.select("doc_id", F.col("source").alias("eval_source")),
            "doc_id",
        )
        .select("g", "eval_source")
        .distinct()
    )
    per = (
        tg.join(F.broadcast(eg), "g")
        .groupBy("train_source", "eval_source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_gram_hits"),
            F.countDistinct("doc_id").cast("long").alias("n_train_docs"),
        )
    )
    # All-cells spine, litbound: one-row collect_set aggregates crossed
    # (keys=[] agg is plan-provably single-row), exploded after.
    ts = train.agg(F.collect_set("source").alias("ts"))
    es = ev.agg(F.collect_set("source").alias("es"))
    spine = (
        ts.crossJoin(F.broadcast(es))
        .select(F.explode("ts").alias("train_source"), "es")
        .select("train_source", F.explode("es").alias("eval_source"))
    )
    return (
        spine.join(per, ["train_source", "eval_source"], "left")
        .select(
            "train_source",
            "eval_source",
            F.coalesce("n_gram_hits", F.lit(0))
            .cast("long")
            .alias("n_gram_hits"),
            F.coalesce("n_train_docs", F.lit(0))
            .cast("long")
            .alias("n_train_docs"),
        )
        .orderBy("train_source", "eval_source")
    )


# --------------------------------------------------------------------------
# URL / domain curation tier (operators/urls.py)
# --------------------------------------------------------------------------
# The documents fixture has no URL column, so (like the % 97
# decontamination split) a deterministic messy URL is synthesized
# in-query IDENTICALLY on both engines: scheme/host case, tracking
# params, param order, default ports, fragments, and trailing slashes
# vary by residue class; hosts come from the source column across five
# public-suffix classes (incl. multi-label co.uk / github.io).

_DOC_URLS_CTE = """urls AS (
  SELECT doc_id, lang, source,
         concat(
           CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'http' END,
           '://',
           CASE WHEN doc_id % 11 = 0 THEN 'blog.' WHEN doc_id % 2 = 0 THEN 'WWW.' ELSE '' END,
           source, '.',
           (['com','co.uk','org','github.io','net'])[CAST(doc_id % 5 AS INT) + 1],
           CASE WHEN doc_id % 4 = 0 THEN (CASE WHEN doc_id % 3 = 1 THEN ':443' ELSE ':80' END)
                WHEN doc_id % 4 = 1 THEN ':8080' ELSE '' END,
           '/D', CAST(doc_id % 10 AS VARCHAR),
           CASE WHEN doc_id % 6 = 0 THEN '/' ELSE '' END,
           CASE WHEN doc_id % 2 = 0 THEN concat('?utm_source=feed&q=', CAST(doc_id % 5 AS VARCHAR), '&a=1')
                ELSE concat('?a=1&q=', CAST(doc_id % 5 AS VARCHAR), '&utm_campaign=x') END,
           CASE WHEN doc_id % 7 = 0 THEN '#top' ELSE '' END
         ) AS url
  FROM documents
)"""

_CANON_CTE = _DOC_URLS_CTE + """,
cu1 AS (SELECT doc_id, lang, url, regexp_replace(url, '#.*$', '') AS uf FROM urls),
cu2 AS (SELECT *, lower(regexp_extract(uf, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1)) AS scheme,
               regexp_replace(uf, '^[A-Za-z][A-Za-z0-9+.-]*://', '') AS rest FROM cu1),
cu3 AS (SELECT *, regexp_extract(rest, '^([^/?]+)', 1) AS hostport,
               regexp_replace(rest, '^[^/?]+', '') AS pathq FROM cu2),
cu4 AS (SELECT *, lower(regexp_extract(hostport, '^([^:]+)', 1)) AS host0,
               regexp_extract(hostport, ':([0-9]+)$', 1) AS port FROM cu3),
cu5 AS (SELECT *, CASE WHEN starts_with(host0, 'www.') THEN substr(host0, 5) ELSE host0 END AS host,
               regexp_replace(regexp_extract(pathq, '^([^?]*)', 1), '/+$', '') AS path,
               regexp_extract(pathq, '\\?(.*)$', 1) AS qs FROM cu4),
canon AS (
  SELECT doc_id, lang, url, host,
         concat(scheme, '://', host,
           CASE WHEN port <> '' AND NOT ((scheme = 'http' AND port = '80')
                                         OR (scheme = 'https' AND port = '443'))
                THEN concat(':', port) ELSE '' END,
           path,
           CASE WHEN qc <> '' THEN concat('?', qc) ELSE '' END) AS canonical_url
  FROM (SELECT *, array_to_string(list_sort(list_filter(string_split(qs, '&'),
             p -> p <> '' AND NOT starts_with(p, 'utm_')
                  AND NOT (string_split(p, '=')[1] IN ('fbclid','gclid','mc_cid','mc_eid','ref')))), '&') AS qc
        FROM cu5)
)"""

_SFX_VALUES = ", ".join(
    f"('{s}', {s.count('.') + 1})" for s in ur.DEFAULT_PUBLIC_SUFFIXES
)

_REGDOM_CTE = _CANON_CTE + f""",
sfx(suffix, sfx_labels) AS (VALUES {_SFX_VALUES}),
lbl AS (SELECT doc_id, lang, host, string_split(host, '.') AS L FROM canon),
cnd AS (
  SELECT doc_id, CAST(k AS INT) AS k,
         array_to_string(L[len(L) - CAST(k AS INT) + 1:len(L)], '.') AS cand
  FROM lbl, LATERAL unnest(generate_series(1, least(len(L) - 1, 3))) AS u(k)
  WHERE len(L) >= 2),
hit AS (SELECT doc_id, max(k) AS bk, arg_max(cand, k) AS s
        FROM cnd JOIN sfx ON cnd.cand = sfx.suffix GROUP BY doc_id),
reg AS (SELECT l.doc_id, l.lang, l.host,
               CASE WHEN bk IS NOT NULL THEN concat(L[len(L) - bk], '.', s)
                    ELSE host END AS registrable_domain
        FROM lbl l LEFT JOIN hit ON l.doc_id = hit.doc_id)"""


def _doc_urls(spark, sf_dir) -> DataFrame:
    """Spark twin of _DOC_URLS_CTE — the synthesized messy URL column."""
    d = _t(spark, sf_dir, "documents")

    def m(k):
        return F.col("doc_id") % k

    scheme = (
        F.when(m(3) == 0, F.lit("HTTP"))
        .when(m(3) == 1, F.lit("https"))
        .otherwise(F.lit("http"))
    )
    sub = (
        F.when(m(11) == 0, F.lit("blog."))
        .when(m(2) == 0, F.lit("WWW."))
        .otherwise(F.lit(""))
    )
    tld = F.element_at(
        F.array(*[F.lit(x) for x in ["com", "co.uk", "org", "github.io", "net"]]),
        (m(5) + 1).cast("int"),
    )
    port = (
        F.when(m(4) == 0, F.when(m(3) == 1, F.lit(":443")).otherwise(F.lit(":80")))
        .when(m(4) == 1, F.lit(":8080"))
        .otherwise(F.lit(""))
    )
    q = F.when(
        m(2) == 0,
        F.concat(F.lit("?utm_source=feed&q="), m(5).cast("string"), F.lit("&a=1")),
    ).otherwise(
        F.concat(F.lit("?a=1&q="), m(5).cast("string"), F.lit("&utm_campaign=x"))
    )
    url = F.concat(
        scheme, F.lit("://"), sub, F.col("source"), F.lit("."), tld, port,
        F.lit("/D"), m(10).cast("string"),
        F.when(m(6) == 0, F.lit("/")).otherwise(F.lit("")),
        q,
        F.when(m(7) == 0, F.lit("#top")).otherwise(F.lit("")),
    )
    return d.select("doc_id", "lang", "source", url.alias("url"))


def _doc_domains(spark, sf_dir) -> DataFrame:
    """(doc_id, lang, host, registrable_domain) via the broadcast
    public-suffix table."""
    u = _doc_urls(spark, sf_dir)
    hosts = u.select(
        "doc_id", "lang", ur.url_host(F.col("url")).alias("host")
    )
    return ur.registrable_domain(
        hosts, "host", ["doc_id", "lang"], ur.suffix_table(spark)
    )


@_q(
    "canonical_url_dedup",
    "WITH " + _CANON_CTE + """
SELECT canonical_url,
       CAST(count(*) AS BIGINT) AS n_variants,
       CAST(count(DISTINCT url) AS BIGINT) AS n_raw_forms,
       CAST(min(doc_id) AS BIGINT) AS keep_doc
FROM canon GROUP BY canonical_url HAVING count(*) >= 2
""",
    doc="URL-key dedup groups (operators/urls.py:canonicalize_url): "
    "documents whose URLs differ only by scheme/host case, www., "
    "tracking params (utm_* + fbclid/gclid/...), param ORDER, default "
    "ports, fragments, or trailing slashes collapse to one canonical "
    "key; groups of ≥2 surface with a deterministic min-id survivor — "
    "the C4/RefinedWeb fetch-dedup stage that runs BEFORE any text "
    "op. Canonicalization is one map-side Catalyst expression (regexp "
    "extracts + array filter/sort, zero UDF); the groupBy shuffles "
    "only the canonical string — at 100 TB swap in its xxhash64 for "
    "the shuffle key (the r7 shingle-key move).",
)
def q_canonical_url_dedup(spark, sf_dir):
    c = _doc_urls(spark, sf_dir).select(
        "doc_id", "url", ur.canonicalize_url(F.col("url")).alias("canonical_url")
    )
    return (
        c.groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).alias("n_variants"),
            F.count_distinct(F.col("url")).alias("n_raw_forms"),
            F.min("doc_id").alias("keep_doc"),
        )
        .where(F.col("n_variants") >= 2)
    )


@_q(
    "domain_mixture_stats",
    "WITH " + _REGDOM_CTE + """,
st AS (SELECT registrable_domain, CAST(count(*) AS BIGINT) AS n_docs,
              CAST(count(DISTINCT lang) AS BIGINT) AS n_langs
       FROM reg GROUP BY 1),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM st)
SELECT registrable_domain, n_docs, n_langs,
       round(CAST(n_docs AS DOUBLE) / total, 6) AS share
FROM st, tot
""",
    doc="Per-registrable-domain corpus mixture audit (operators/urls."
    "py:registrable_domain): public-suffix extraction — each host "
    "explodes into ≤3 trailing-label candidates, ONE broadcast hash "
    "join against the (tiny, ~9k-row in production) suffix table, "
    "longest match via a combinable max-struct agg; subdomains "
    "(blog.x.com, www.x.com) collapse into x.com, multi-label "
    "suffixes (co.uk, github.io) handled by construction. Shares via "
    "a broadcast 1-row total (bounded-cross). The audit that catches "
    "a boilerplate domain dominating the corpus before training.",
)
def q_domain_mixture_stats(spark, sf_dir):
    dom = _doc_domains(spark, sf_dir)
    st = dom.groupBy("registrable_domain").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.col("lang")).alias("n_langs"),
    )
    tot = st.agg(F.sum("n_docs").alias("total"))
    return st.crossJoin(F.broadcast(tot)).select(
        "registrable_domain",
        "n_docs",
        "n_langs",
        F.round(F.col("n_docs").cast("double") / F.col("total"), 6).alias("share"),
    )


@_q(
    "domain_capped_docs",
    "WITH " + _REGDOM_CTE + f"""
SELECT doc_id, registrable_domain FROM (
  SELECT doc_id, registrable_domain,
         row_number() OVER (
           PARTITION BY registrable_domain
           ORDER BY {md5_long_sql("concat_ws('|', 'domaincap', CAST(doc_id AS VARCHAR))")} ASC,
                    doc_id ASC) AS rk
  FROM reg) t
WHERE rk <= 20
""",
    doc="Per-domain document cap (operators/urls.py:cap_per_domain): "
    "at most 20 docs per registrable domain, selected by a "
    "deterministic md5 priority over doc_id — rand()-free, so the "
    "survivor set is identical across engines/partitionings/retries "
    "(the repo's sampling rule). ONE domain-keyed window; at extreme "
    "skew (one domain = half the corpus) the documented two-pass "
    "variant windows only the over-cap domains (broadcast list). The "
    "RefinedWeb per-domain cap that stops boilerplate farms from "
    "dominating the training mixture.",
)
def q_domain_capped_docs(spark, sf_dir):
    dom = _doc_domains(spark, sf_dir).select("doc_id", "registrable_domain")
    return ur.cap_per_domain(
        dom, "registrable_domain", "doc_id", cap=20, seed="domaincap"
    )


@_q(
    "price_histogram_quantiles",
    """
WITH h AS (
  SELECT o_orderpriority AS prio,
         CAST(floor(CAST(o_totalprice AS DOUBLE) / 5000.0) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
),
c AS (
  SELECT prio, bucket, cnt,
         CAST(sum(cnt) OVER (PARTITION BY prio ORDER BY bucket
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY prio) AS BIGINT) AS n
  FROM h
),
x AS (SELECT c.*, CAST(q AS DOUBLE) AS q
      FROM c, (VALUES (0.25), (0.5), (0.9), (0.99)) AS qs(q))
SELECT prio, q,
       round(5000.0 * (CAST(bucket AS DOUBLE)
             + CAST(CAST(ceil(q * n) AS BIGINT) - (cum - cnt) AS DOUBLE)
               / CAST(cnt AS DOUBLE)), 6) AS quantile_est,
       n AS n_rows
FROM x
WHERE cum >= CAST(ceil(q * n) AS BIGINT)
  AND (cum - cnt) < CAST(ceil(q * n) AS BIGINT)
""",
    doc="Grouped quantile estimates from a fixed-boundary mergeable "
    "histogram (operators/aggregates.py:histogram_quantiles) — the "
    "deterministic quantile member the sketch tier (KMV/HLL/CMS) "
    "lacked: width-5000 linear buckets over o_totalprice per order "
    "priority; the target rank ceil(q·n) lands in exactly one bucket, "
    "linear interpolation inside it bounds error by the bucket width. "
    "Data-independent boundaries ⇒ per-partition/per-day histograms "
    "merge by SUMMING bucket counts (the t-digest/DDSketch property "
    "without ln/exp, so the oracle replays bit-for-bit); one "
    "combinable groupBy to ≤groups×buckets rows, window + probe on "
    "the bucket relation only. The exact twin is "
    "price_quantiles_by_priority (per-group sort of values vs "
    "bounded bucket state here).",
)
def q_price_histogram_quantiles(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"), "o_totalprice"
    )
    return agg.histogram_quantiles(
        o, ["prio"], "o_totalprice", width=5000.0,
        quantiles=[0.25, 0.5, 0.9, 0.99],
    )


@_q(
    "kmv_daily_user_merge",
    f"""
WITH hx AS (
  SELECT DISTINCT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         {md5_long_sql("CAST(user_id AS VARCHAR)")} AS h
  FROM events
),
pk AS (
  SELECT day, h FROM (
    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
    FROM hx) t
  WHERE rn <= 64
),
pd AS (
  SELECT day, CAST(count(*) AS BIGINT) AS m, max(h) AS hk
  FROM pk GROUP BY day
),
mg AS (
  SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS hk FROM (
    SELECT DISTINCT h FROM pk ORDER BY h LIMIT 64) t
),
dr AS (
  SELECT CAST(count(*) AS BIGINT) AS m, max(h) AS hk FROM (
    SELECT DISTINCT h FROM hx ORDER BY h LIMIT 64) t
)
SELECT day,
       CASE WHEN m < 64 THEN m
            ELSE CAST(round(63.0 * 1152921504606846976.0
                            / CAST(hk AS DOUBLE)) AS BIGINT) END AS est_distinct
FROM pd
UNION ALL
SELECT '__merged__',
       CASE WHEN m < 64 THEN m
            ELSE CAST(round(63.0 * 1152921504606846976.0
                            / CAST(hk AS DOUBLE)) AS BIGINT) END
FROM mg
UNION ALL
SELECT '__direct__',
       CASE WHEN m < 64 THEN m
            ELSE CAST(round(63.0 * 1152921504606846976.0
                            / CAST(hk AS DOUBLE)) AS BIGINT) END
FROM dr
""",
    doc="KMV sketch-associativity demo (operators/aggregates.py:"
    "kmv_daily_merge): per-day k=64 KMV distinct-user sketches, plus "
    "the MERGED estimate (union per-day k-min sets, re-take k) and "
    "the DIRECT global estimate — equal by construction (every global "
    "k-min member is in its own day's k-min set), proven on real data "
    "by the __merged__/__direct__ row pair. The property that lets a "
    "100 TB pipeline answer date-range distinct queries by merging "
    "O(days·k) sketch rows instead of rescanning raw events. One "
    "(day,hash)-distinct combinable pass; estimates over ≤days·k "
    "rows; md5 family ⇒ bit-exact oracle replay.",
)
def q_kmv_daily_user_merge(spark, sf_dir):
    return agg.kmv_daily_merge(
        _t(spark, sf_dir, "events"), "ts", "user_id", k=64
    )


def _jl_oracle(out_dim: int = 16, in_dim: int = 64, n_vecs: int = 64) -> str:
    import math as _math

    m = sim.jl_matrix(out_dim, in_dim)
    mat = "[" + ", ".join(
        "[" + ", ".join(("1.0" if v > 0 else "-1.0") for v in row) + "]"
        for row in m
    ) + "]"
    scale = repr(1.0 / _math.sqrt(out_dim))
    key = md5_long_sql("concat('jlpair:', CAST(vec_id AS VARCHAR))")

    def dsq(a, b, n):
        return (
            f"list_sum(list_transform(generate_series(1, {n}), i -> "
            f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE)) * "
            f"(CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
        )

    return f"""
WITH picked AS MATERIALIZED (
  SELECT vec_id, embedding, {key} AS k FROM embeddings
  ORDER BY k ASC, vec_id ASC LIMIT {n_vecs}
),
mt AS MATERIALIZED (
  SELECT CAST(j AS INT) AS j, ({mat})[CAST(j AS INT)] AS mrow
  FROM (SELECT unnest(generate_series(1, {out_dim})) AS j) t
),
pj AS MATERIALIZED (
  SELECT p.vec_id, m.j,
         list_sum(list_transform(generate_series(1, {in_dim}), i ->
           CAST(p.embedding[i] AS DOUBLE) * m.mrow[i])) * {scale} AS c
  FROM picked p, mt m
),
pvec AS (SELECT vec_id, list(c ORDER BY j ASC) AS p FROM pj GROUP BY vec_id),
sel AS (SELECT pk.vec_id, pk.embedding, pk.k, pv.p
        FROM picked pk JOIN pvec pv USING (vec_id)),
r AS (SELECT vec_id, embedding, p,
             row_number() OVER (ORDER BY k ASC, vec_id ASC) AS rn
      FROM sel),
a AS (SELECT (rn + 1) // 2 AS pid, vec_id AS vec_a, embedding AS ea, p AS pa
      FROM r WHERE rn % 2 = 1),
b AS (SELECT rn // 2 AS pid, vec_id AS vec_b, embedding AS eb, p AS pb
      FROM r WHERE rn % 2 = 0),
d AS (SELECT vec_a, vec_b,
             sqrt({dsq("ea", "eb", in_dim)}) AS do_,
             sqrt({dsq("pa", "pb", out_dim)}) AS dp_
      FROM a JOIN b USING (pid))
SELECT vec_a, vec_b, round(do_, 6) AS d_orig, round(dp_, 6) AS d_proj,
       CASE WHEN do_ > 0 THEN round(dp_ / do_, 6) END AS dist_ratio
FROM d
"""


@_q(
    "jl_distortion_pairs",
    _jl_oracle(),
    doc="Johnson-Lindenstrauss projection distortion eval (operators/"
    "similarity.py:jl_project/jl_distortion_pairs; Achlioptas 2001 "
    "±1 Rademacher matrix from the md5 family, so the oracle replays "
    "the projection bit-exactly): 64→16 dims, 32 deterministic "
    "md5-sampled vector pairs, original vs projected Euclidean "
    "distance + ratio. The empirical ε-check a pipeline runs before "
    "committing LSH banding / IVF routing / rerank to the projected "
    "space (dim is the multiplier on every distance op at 100 TB — "
    "project once, run ANN short, rerank survivors on originals). "
    "Projection map-side zip_with/aggregate folds; sample one "
    "TakeOrdered heap; pairing on a ≤64-row bounded window.",
)
def q_jl_distortion_pairs(spark, sf_dir):
    return sim.jl_distortion_pairs(
        _t(spark, sf_dir, "embeddings"), "vec_id", "embedding",
        out_dim=16, in_dim=64, n_vecs=64,
    )


@_q(
    "daily_seasonal_decomposition",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS date, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
t AS (
  SELECT date, cnt,
         CAST(sum(cnt) OVER w7 AS BIGINT) AS s7,
         CAST(count(*) OVER w7 AS BIGINT) AS c7,
         dayofweek(date) AS dow
  FROM daily
  WINDOW w7 AS (ORDER BY date ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
t2 AS (SELECT *, CASE WHEN c7 = 7 THEN 7 * cnt - s7 END AS num FROM t),
wk AS (SELECT dow, CAST(sum(num) AS BIGINT) AS nw,
              CAST(count(*) AS BIGINT) AS mw
       FROM t2 WHERE num IS NOT NULL GROUP BY dow)
SELECT t2.date, t2.cnt,
       CASE WHEN num IS NOT NULL AND nw IS NOT NULL
            THEN round(CAST(s7 AS DOUBLE) / 7.0, 6) END AS trend,
       CASE WHEN num IS NOT NULL AND nw IS NOT NULL
            THEN round(CAST(nw AS DOUBLE) / (7.0 * CAST(mw AS DOUBLE)), 6)
       END AS seasonal,
       CASE WHEN num IS NOT NULL AND nw IS NOT NULL
            THEN round(CAST(num * mw - nw AS DOUBLE)
                       / (7.0 * CAST(mw AS DOUBLE)), 6)
       END AS residual
FROM t2 LEFT JOIN wk ON t2.dow = wk.dow
""",
    doc="Classical additive seasonal decomposition of the daily event "
    "count (operators/timeseries.py:seasonal_decompose_daily): "
    "trend = centered 7-day moving average (full windows only), "
    "seasonal = per-weekday mean of the detrended series, residual = "
    "the rest — the seasonal-aware anomaly baseline ('is Tuesday "
    "always low, or is THIS Tuesday anomalous?'). Every intermediate "
    "an exact integer (7·cnt−S7, weekday N_w/m_w, num·m_w−N_w); each "
    "output ONE correctly-rounded double division — bit-identical "
    "cross-engine, no float accumulators. One raw-data groupBy, then "
    "everything on the bounded ≤calendar-days relation (dim_time "
    "window class) + a 7-row broadcast weekday join.",
)
def q_daily_seasonal_decomposition(spark, sf_dir):
    return ts_ops.seasonal_decompose_daily(
        _t(spark, sf_dir, "events"), "ts"
    )


@_q(
    "event_user_skew_report",
    """
WITH pk AS (
  SELECT CAST(user_id AS VARCHAR) AS k, CAST(count(*) AS BIGINT) AS c
  FROM events GROUP BY 1
)
SELECT CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       round(CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS mean_rows_per_key,
       round(quantile_cont(c, 0.5), 6) AS p50_cnt,
       round(quantile_cont(c, 0.9), 6) AS p90_cnt,
       round(quantile_cont(c, 0.99), 6) AS p99_cnt,
       CAST(max(c) AS BIGINT) AS max_cnt,
       (max({'c': c, 'k': k})).k AS top_key,
       round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 6) AS top_share
FROM pk
""",
    doc="Join/shuffle-key skew diagnostic on events.user_id "
    "(operators/quality.py:key_skew_report): rows, distinct keys, "
    "exact p50/p90/p99/max of the per-key count distribution, and "
    "the hottest key's share — the numbers that choose between plain "
    "shuffle, broadcast, salting, and AQE skew-split BEFORE the job "
    "runs (a 1% hot key on a 100 TB fact is >1 TB on one reducer). "
    "One combinable groupBy + a 1-row aggregate; percentile == "
    "quantile_cont cross-engine; hottest key via max_by with a "
    "deterministic (count, key) tiebreak.",
)
def q_event_user_skew_report(spark, sf_dir):
    return dq.key_skew_report(_t(spark, sf_dir, "events"), "user_id")


@_q(
    "docs_embeddings_integrity",
    """
WITH lk AS (SELECT DISTINCT doc_id AS k FROM documents),
rk AS (SELECT DISTINCT vec_id AS k FROM embeddings),
j AS (SELECT lk.k AS l, rk.k AS r FROM lk FULL OUTER JOIN rk ON lk.k = rk.k)
SELECT CAST(sum(CASE WHEN l IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_left_keys,
       CAST(sum(CASE WHEN r IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_keys,
       CAST(sum(CASE WHEN l IS NOT NULL AND r IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN l IS NOT NULL AND r IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_left_orphans,
       CAST(sum(CASE WHEN l IS NULL AND r IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_right_orphans
FROM j
""",
    doc="Two-way referential-integrity audit documents ↔ embeddings "
    "(operators/quality.py:referential_integrity_audit): distinct-key "
    "counts per side, matches, and orphans in both directions — the "
    "check that catches a failed encoder batch (docs without vectors) "
    "or a stale index (vectors without docs) before training consumes "
    "the join. ONE full-outer join of the pre-shrunk distinct-key "
    "relations (no row payloads move) + a single combinable flag "
    "aggregate — all five counts in one pass, cheaper than the two "
    "anti-joins it replaces.",
)
def q_docs_embeddings_integrity(spark, sf_dir):
    return dq.referential_integrity_audit(
        _t(spark, sf_dir, "documents"),
        _t(spark, sf_dir, "embeddings"),
        "doc_id",
        "vec_id",
    )


@_q(
    "event_changepoint_cusum",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS date, CAST(count(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(cnt) AS BIGINT) AS s
        FROM daily),
c AS (SELECT date, cnt, n, s, n * cnt - s AS dev FROM daily, tot),
cus AS (SELECT date, n,
               CAST(sum(dev) OVER (ORDER BY date
                    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        FROM c),
peak AS (SELECT date AS change_date, cum AS peak, n FROM cus
         ORDER BY abs(cum) DESC, date ASC LIMIT 1),
seg AS (SELECT p.change_date, p.n AS n_days, p.peak,
               sum(CASE WHEN d.date <= p.change_date THEN d.cnt END) AS sb,
               sum(CASE WHEN d.date <= p.change_date THEN 1 END) AS nb,
               sum(CASE WHEN d.date > p.change_date THEN d.cnt END) AS sa,
               sum(CASE WHEN d.date > p.change_date THEN 1 END) AS na
        FROM daily d, peak p GROUP BY 1, 2, 3)
SELECT change_date, n_days,
       round(CAST(peak AS DOUBLE) / CAST(n_days AS DOUBLE), 6) AS cusum_peak,
       round(CAST(sb AS DOUBLE) / CAST(nb AS DOUBLE), 6) AS mean_before,
       CASE WHEN na > 0
            THEN round(CAST(sa AS DOUBLE) / CAST(na AS DOUBLE), 6)
       END AS mean_after
FROM seg
""",
    doc="CUSUM change-point detection on daily event volume "
    "(operators/timeseries.py:cusum_changepoint_daily; Page 1954): "
    "the |cumulative deviation| peak locates the most likely LEVEL "
    "SHIFT — the regime-change question z-scores (point anomalies) "
    "and histogram drift (two fixed windows) don't answer. "
    "Deviations scaled to exact ints (n·cnt−S) so cumsum/argmax/"
    "segment sums are exact with deterministic tiebreaks; the three "
    "emitted stats are single correctly-rounded divisions. One "
    "raw-data groupBy, then everything on the bounded calendar-day "
    "relation (1-row totals broadcast, bounded-cross).",
)
def q_event_changepoint_cusum(spark, sf_dir):
    return ts_ops.cusum_changepoint_daily(_t(spark, sf_dir, "events"), "ts")


@_q(
    "hard_negative_pairs",
    f"""
WITH anc AS (
  SELECT anchor_id, av, anchor_label FROM (
    SELECT vec_id AS anchor_id, embedding AS av, label AS anchor_label,
           {md5_long_sql("concat('hneg:', CAST(vec_id AS VARCHAR))")} AS kk
    FROM embeddings) t
  ORDER BY kk ASC, anchor_id ASC LIMIT 8
),
scored AS (
  SELECT a.anchor_id, a.anchor_label, e.vec_id,
         e.label AS neg_label,
         round({cosine_sql('e.embedding', 'a.av', 64)}, 6) AS score
  FROM embeddings e, anc a
  WHERE e.label <> a.anchor_label
)
SELECT anchor_id, anchor_label, vec_id, neg_label, score FROM (
  SELECT *, row_number() OVER (PARTITION BY anchor_id
                               ORDER BY score DESC, vec_id ASC) AS rn
  FROM scored
) WHERE rn <= 5
""",
    doc="Contrastive hard-negative mining (operators/similarity.py:"
    "hard_negatives_topk): for each of 8 md5-sampled anchors, the 5 "
    "most cosine-similar vectors with a DIFFERENT label — the "
    "near-boundary negatives contrastive/triplet/InfoNCE batches "
    "need (random negatives are mostly trivial at scale; hard ones "
    "carry the gradient). Serving shape: anchors ≪ corpus, broadcast "
    "anchors vs ONE corpus scan, map-side label filter, per-anchor "
    "row_number heap. At 100 TB mine against the IVF/JL index; this "
    "exact pass is the recall yardstick.",
)
def q_hard_negative_pairs(spark, sf_dir):
    return sim.hard_negatives_topk(
        _t(spark, sf_dir, "embeddings"), n_anchors=8, k=5
    )


@_q(
    "dedup_corpus_lines",
    f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
lines AS (
  SELECT doc_id, CAST(g AS INT) AS pos,
         array_to_string(t[CAST(g * 6 + 1 AS INT):CAST(g * 6 + 6 AS INT)], ' ') AS line
  FROM toks, LATERAL unnest(generate_series(0, CAST((len(t) - 1) // 6 AS INT))) AS u(g)
),
hx AS (SELECT doc_id, pos, line, {md5_long_sql("line")} AS h FROM lines),
fst AS (SELECT h, min({{'d': doc_id, 'p': pos}}) AS f FROM hx GROUP BY h),
surv AS (
  SELECT hx.doc_id, hx.pos, hx.line
  FROM hx JOIN fst ON hx.h = fst.h
  WHERE hx.doc_id = fst.f.d AND hx.pos = fst.f.p
),
rb AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_kept,
         array_to_string(list(line ORDER BY pos ASC), chr(10)) AS kept_text
  FROM surv GROUP BY doc_id
),
og AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines FROM hx GROUP BY doc_id)
SELECT og.doc_id, og.n_lines,
       coalesce(rb.n_kept, 0) AS n_kept,
       coalesce(rb.kept_text, '') AS kept_text
FROM og LEFT JOIN rb ON og.doc_id = rb.doc_id
""",
    doc="C4-style exact line dedup across the corpus (operators/"
    "textops.py:dedup_corpus_lines) — the middle tier of the dedup "
    "ladder between doc-level (MinHash/SimHash) and span-level "
    "(duplicate_substring_spans): boilerplate repeats as whole lines, "
    "and C4 shipped exactly this filter. The fixture has no newlines, "
    "so lines are synthesized identically on both engines (6-token "
    "groups). First-occurrence choice is a combinable min-struct "
    "groupBy on 60-bit line hashes (8-byte shuffle keys; a groupBy "
    "not a window so a hot boilerplate line cannot pin one reducer) "
    "+ an AQE-splittable hash join back; rebuild is one doc-keyed "
    "groupBy with array_sort. Fully-duplicate docs surface with "
    "n_kept = 0.",
)
def q_dedup_corpus_lines(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    synth = F.concat_ws(
        "\n",
        F.transform(
            F.sequence(
                F.lit(0), F.floor((F.size(toks) - 1) / 6).cast("int")
            ),
            lambda g: F.concat_ws(" ", F.slice(toks, g * 6 + 1, 6)),
        ),
    )
    return tx.dedup_corpus_lines(
        d.select("doc_id", synth.alias("text")), "doc_id", "text"
    )


@_q(
    "simhash_recall_eval",
    f"""
WITH sdocs AS MATERIALIZED (
  SELECT * FROM documents
  WHERE {md5_long_sql("CAST(doc_id AS VARCHAR)", seed="srs")} % 4 = 0
),
{_simhash_sig_sql(src="sdocs")},
p AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
),
agg AS (SELECT CAST(count(*) AS BIGINT) AS n FROM p)
SELECT n AS n_exact, n AS n_banded, n AS n_common,
       CASE WHEN n > 0
         THEN round(CAST(n AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS recall,
       CASE WHEN n > 0
         THEN round(CAST(n AS DOUBLE) / CAST(n AS DOUBLE), 6) END AS precision
FROM agg
""",
    doc="SimHash banding equivalence PROVED on a sampled ground truth "
    "— the simhash twin of minhash_recall_eval. An md5-residue sample "
    "(seed 'srs', 1-in-4 docs; at 100 TB the residue modulus grows so "
    "the sample stays eval-sized ~10k docs) bounds the brute-force "
    "side: the Spark plan instantiates TWO independent "
    "implementations — all-pairs hamming over dedup.simhash "
    "signatures (a broadcast nested-loop the auditor tags "
    "'sampled-cross': the build side is the md5-residue-filtered "
    "sample, bounded by construction) and the 7-band LSH of "
    "dedup.simhash_pairs — and full-outer joins their pair sets. The "
    "pigeonhole guarantee (≤6 dirty bands at hamming ≤ 6 ⇒ ≥1 clean "
    "band) says recall = precision = 1.0; this query MEASURES it, so "
    "any banding bug (band split across the two hash words, mask "
    "arithmetic, dedup of multi-band collisions) surfaces as a "
    "sub-1.0 cell against the oracle's single brute-force relation.",
)
def q_simhash_recall_eval(spark, sf_dir):
    from .functions.hashing import md5_long

    d = _t(spark, sf_dir, "documents")
    samp = d.filter(
        F.pmod(md5_long(F.col("doc_id").cast("string"), seed="srs"), F.lit(4))
        == 0
    )
    # Deliberately NOT persisted: recomputing the sampled signature on
    # each side of the self-join is cheap (the sample is eval-sized)
    # and keeps the md5-residue Filter visible in the physical plan,
    # where the auditor's 'sampled-cross' category reads it.
    sig = dd.simhash(samp, "doc_id", "text")
    a, b = sig.alias("a"), sig.alias("b")
    ham = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash")))
    ex = (
        a.join(b, F.col("a.doc") < F.col("b.doc"))
        .filter(ham <= 6)
        .select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.lit(1).alias("e"),
        )
    )
    banded = dd.simhash_pairs(
        samp, "doc_id", "text", max_hamming=6, band_bits=dd.SIMHASH_BAND_BITS
    ).select("doc_a", "doc_b", F.lit(1).alias("l"))
    j = ex.join(banded, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("e", F.lit(0)).alias("e"),
        F.coalesce("l", F.lit(0)).alias("l"),
    )
    # coalesce: COUNT-like totals are 0 on an empty corpus (SQL sum
    # over no rows is NULL; the oracle's counts are 0).
    agg = j.agg(
        F.coalesce(F.sum("e"), F.lit(0)).cast("long").alias("n_exact"),
        F.coalesce(F.sum("l"), F.lit(0)).cast("long").alias("n_banded"),
        F.coalesce(F.sum(F.col("e") * F.col("l")), F.lit(0))
        .cast("long")
        .alias("n_common"),
    )
    rec = F.when(
        F.col("n_exact") > 0,
        F.round(
            F.col("n_common").cast("double") / F.col("n_exact").cast("double"),
            6,
        ),
    )
    prec = F.when(
        F.col("n_banded") > 0,
        F.round(
            F.col("n_common").cast("double") / F.col("n_banded").cast("double"),
            6,
        ),
    )
    return agg.select(
        "n_exact", "n_banded", "n_common",
        rec.alias("recall"), prec.alias("precision"),
    )


@_q(
    "incremental_event_state_merge",
    """
WITH st AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS key, count(*) AS n,
         SUM(CAST(value AS DECIMAL(27,4))) AS s,
         min(value) AS mn, max(value) AS mx
  FROM events WHERE ts < TIMESTAMP '2024-01-25' GROUP BY 1, 2
  UNION ALL
  SELECT CAST(ts AS DATE), event_type, count(*),
         SUM(CAST(value AS DECIMAL(27,4))), min(value), max(value)
  FROM events WHERE ts >= TIMESTAMP '2024-01-25' GROUP BY 1, 2
),
m AS (
  SELECT key, CAST(sum(n) AS BIGINT) AS n, sum(s) AS s,
         min(mn) AS mn, max(mx) AS mx
  FROM st GROUP BY key
),
d AS (
  SELECT event_type AS key, count(*) AS n,
         SUM(CAST(value AS DECIMAL(27,4))) AS s,
         min(value) AS mn, max(value) AS mx
  FROM events GROUP BY event_type
)
SELECT '__merged__' AS src, key AS event_type, n AS n_events,
       CAST(s AS DOUBLE) AS total_value,
       round(mn, 6) AS min_value, round(mx, 6) AS max_value,
       round(CAST(s AS DOUBLE) / n, 6) AS avg_value
FROM m
UNION ALL
SELECT '__direct__', key, n, CAST(s AS DOUBLE),
       round(mn, 6), round(mx, 6), round(CAST(s AS DOUBLE) / n, 6)
FROM d
""",
    doc="Incremental-maintenance equivalence proof (operators/"
    "aggregates.py:incremental_state_merge_demo) — the general-"
    "aggregate sibling of kmv_daily_user_merge: per-(day, type) "
    "mergeable state (count / exact-DECIMAL sum / min / max) built "
    "INDEPENDENTLY for the base (< 2024-01-25) and delta partitions, "
    "folded per type, emitted as __merged__ rows next to a __direct__ "
    "full recompute. Equal by the monoid laws; measured, not assumed. "
    "The nightly-ETL contract at 100 TB: a state refresh scans only "
    "the delta partition (date predicate pruned) plus days×keys "
    "state rows, never the full history; avg is derived at read time "
    "by ONE double division over the exact sum, so merged and direct "
    "agree bit-for-bit on both engines.",
)
def q_incremental_event_state_merge(spark, sf_dir):
    return agg.incremental_state_merge_demo(
        _t(spark, sf_dir, "events"), "ts", "event_type", "value", "2024-01-25"
    )


@_q(
    "curation_funnel_by_source",
    f"""
WITH {_CURATE_Q_CTE},
{_CURATE_KEEP_CTE},
fl AS (
  SELECT d.source,
         CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s1,
         CASE WHEN k.doc_id IS NOT NULL
                   AND q.quality_score >= 0.45 THEN 1 ELSE 0 END AS s2,
         CASE WHEN k.doc_id IS NOT NULL
                   AND q.quality_score >= 0.45
                   AND q.n_tokens BETWEEN 5 AND 5000 THEN 1 ELSE 0 END AS s3
  FROM documents d
  LEFT JOIN keep k ON d.doc_id = k.doc_id
  JOIN q ON d.doc_id = q.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(s1) AS BIGINT) AS n_dedup,
       CAST(sum(s2) AS BIGINT) AS n_quality,
       CAST(sum(s3) AS BIGINT) AS n_final,
       round(CAST(sum(s3) AS DOUBLE) / count(*), 6) AS survival_rate
FROM fl
GROUP BY source
""",
    doc="Per-source curation funnel — the loss-accounting table every "
    "published corpus ships (C4/RefinedWeb/Dolma all report one): raw "
    "→ fingerprint-dedup survivors → + quality ≥ 0.45 → + token "
    "bounds, with the end-to-end survival rate. EXACTLY the "
    "curated_documents stage predicates (shared CTEs on the oracle "
    "side, shared operators on the Spark side), so the funnel's "
    "n_final per source sums to that query's row count by "
    "construction. One pass: stage flags are conditional integer "
    "sums in a single source-keyed aggregate — no per-stage rescan, "
    "20 groups, map-side combinable; the only shuffles are the "
    "fingerprint groupBy the dedup stage already needs and the "
    "doc-keyed joins. The ops twin of corpus_diversity_by_source.",
)
def q_curation_funnel_by_source(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    qf = tx.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score", "n_tokens"
    )
    keep = (
        tx.doc_fingerprints(docs, "doc_id", "text")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(1).alias("is_keep"))
    )
    fl = (
        docs.select("doc_id", "source")
        .join(keep, "doc_id", "left")
        .join(qf, "doc_id")
    )
    dedup_ok = F.col("is_keep").isNotNull()
    quality_ok = dedup_ok & (F.col("quality_score") >= 0.45)
    final_ok = quality_ok & F.col("n_tokens").between(5, 5000)
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return fl.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.sum(flag(dedup_ok)).cast("long").alias("n_dedup"),
        F.sum(flag(quality_ok)).cast("long").alias("n_quality"),
        F.sum(flag(final_ok)).cast("long").alias("n_final"),
        F.round(
            F.sum(flag(final_ok)).cast("double") / F.count(F.lit(1)), 6
        ).alias("survival_rate"),
    )


@_q(
    "simhash_jaccard_proxy_eval",
    f"""
WITH {_simhash_sig_sql()},
flagged AS MATERIALIZED (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 6
),
toks2 AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
sh2 AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 3 THEN
           list_distinct(list_transform(generate_series(1, len(t) - 2),
                                        i -> array_to_string(t[i:i+2], ' ')))
         ELSE [] END AS shingles
  FROM toks2
),
ex0 AS (
  SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s
  FROM sh2
),
c AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
         count(*) AS common
  FROM ex0 a JOIN ex0 b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
),
truth AS MATERIALIZED (
  SELECT doc_a, doc_b FROM c
  WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6)
        >= 0.8
),
j AS (
  SELECT CASE WHEN truth.doc_a IS NOT NULL THEN 1 ELSE 0 END AS e,
         CASE WHEN flagged.doc_a IS NOT NULL THEN 1 ELSE 0 END AS l
  FROM truth FULL OUTER JOIN flagged
    ON truth.doc_a = flagged.doc_a AND truth.doc_b = flagged.doc_b
),
agg AS (
  SELECT CAST(sum(e) AS BIGINT) AS n_truth,
         CAST(sum(l) AS BIGINT) AS n_flagged,
         CAST(sum(e * l) AS BIGINT) AS n_common
  FROM j
)
SELECT n_truth, n_flagged, n_common,
       CASE WHEN n_truth > 0
         THEN round(CAST(n_common AS DOUBLE) / CAST(n_truth AS DOUBLE), 6) END
         AS recall,
       CASE WHEN n_flagged > 0
         THEN round(CAST(n_common AS DOUBLE) / CAST(n_flagged AS DOUBLE), 6)
         END AS precision
FROM agg
""",
    doc="SimHash as a JACCARD DETECTOR, measured — the informative "
    "companion of simhash_recall_eval (which proves implementation "
    "equivalence and is 1.0 by construction): the full-corpus "
    "hamming ≤ 6 pair set scored against the exact 3-gram-Jaccard "
    "≥ 0.8 ground truth. Recall says how many true near-dups the "
    "56-bit signature surfaces; precision says how many flagged "
    "pairs are real — the numbers that decide whether SimHash can "
    "REPLACE MinHash for a corpus or must feed a verify stage (every "
    "production pipeline re-derives this trade-off; on this corpus "
    "hamming ≤ 6 is far LOOSER than Jaccard 0.8, so precision is the "
    "story). Directly comparable to minhash_recall_eval, which "
    "scores its own banding against the SAME truth relation — the "
    "two rows rank the two families on real data. No sampling "
    "needed: both pair generators are bucketed (band join / shingle "
    "join), never n².",
    scale_note="eval-tier — the exact-Jaccard truth side inherits "
    "ngram_jaccard_exact's superlinear recall-baseline cost on hot "
    "shingles; at corpus scale replay this eval on an md5-capped "
    "subsample (the simhash_recall_eval sampling pattern)",
)
def q_simhash_jaccard_proxy_eval(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    flagged = dd.simhash_pairs(
        d, "doc_id", "text", max_hamming=6, band_bits=dd.SIMHASH_BAND_BITS
    ).select("doc_a", "doc_b", F.lit(1).alias("l"))
    truth = dd.ngram_jaccard_pairs(
        d, "doc_id", "text", n=3, threshold=0.8, max_doc_freq=None
    ).select("doc_a", "doc_b", F.lit(1).alias("e"))
    j = truth.join(flagged, ["doc_a", "doc_b"], "full_outer").select(
        F.coalesce("e", F.lit(0)).alias("e"),
        F.coalesce("l", F.lit(0)).alias("l"),
    )
    agg_row = j.agg(
        F.sum("e").cast("long").alias("n_truth"),
        F.sum("l").cast("long").alias("n_flagged"),
        F.sum(F.col("e") * F.col("l")).cast("long").alias("n_common"),
    )
    rec = F.when(
        F.col("n_truth") > 0,
        F.round(
            F.col("n_common").cast("double") / F.col("n_truth").cast("double"),
            6,
        ),
    )
    prec = F.when(
        F.col("n_flagged") > 0,
        F.round(
            F.col("n_common").cast("double")
            / F.col("n_flagged").cast("double"),
            6,
        ),
    )
    return agg_row.select(
        "n_truth", "n_flagged", "n_common",
        rec.alias("recall"), prec.alias("precision"),
    )


@_q(
    "event_value_histogram_merge",
    """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(floor(CAST(value AS DOUBLE) / 10.0) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
mh AS (
  SELECT bucket, CAST(sum(cnt) AS BIGINT) AS cnt FROM daily GROUP BY bucket
),
dh AS (
  SELECT CAST(floor(CAST(value AS DOUBLE) / 10.0) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS cnt
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
probe_m AS (
  SELECT bucket, cnt,
         CAST(sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM mh
),
probe_d AS (
  SELECT bucket, cnt,
         CAST(sum(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum,
         CAST(sum(cnt) OVER () AS BIGINT) AS n
  FROM dh
),
qs AS (SELECT CAST(q AS DOUBLE) AS q
       FROM (VALUES (0.25), (0.5), (0.9), (0.99)) t(q))
SELECT '__merged__' AS src, q,
       round(10.0 * (CAST(bucket AS DOUBLE)
             + CAST(CAST(ceil(q * n) AS BIGINT) - (cum - cnt) AS DOUBLE)
               / CAST(cnt AS DOUBLE)), 6) AS quantile_est,
       n AS n_rows
FROM probe_m, qs
WHERE cum >= CAST(ceil(q * n) AS BIGINT)
  AND (cum - cnt) < CAST(ceil(q * n) AS BIGINT)
UNION ALL
SELECT '__direct__', q,
       round(10.0 * (CAST(bucket AS DOUBLE)
             + CAST(CAST(ceil(q * n) AS BIGINT) - (cum - cnt) AS DOUBLE)
               / CAST(cnt AS DOUBLE)), 6),
       n
FROM probe_d, qs
WHERE cum >= CAST(ceil(q * n) AS BIGINT)
  AND (cum - cnt) < CAST(ceil(q * n) AS BIGINT)
""",
    doc="Histogram sketch-associativity demo (operators/aggregates.py:"
    "histogram_daily_merge) — completes the proof family: KMV "
    "(kmv_daily_user_merge) proved distinct-count merge, "
    "incremental_event_state_merge proved the sum/min/max monoids, "
    "this proves the QUANTILE sketch: per-day fixed-boundary "
    "histograms of event values merged by summing bucket counts give "
    "the identical quantile estimates as the direct whole-table "
    "histogram — because floor(v/width) boundaries are data-"
    "independent, the property t-digest/DDSketch buy with log "
    "buckets, here replayable bit-for-bit by the oracle (no ln/exp). "
    "__merged__/__direct__ row pairs per q ∈ {.25,.5,.9,.99}; both "
    "probes run the SAME factored arithmetic (_hist_quantile_probe) "
    "over ≤50 bucket rows. At 100 TB the per-day bucket relation IS "
    "the serving layer: any date-range quantile = sum O(days × "
    "buckets) integers, no raw rescan.",
)
def q_event_value_histogram_merge(spark, sf_dir):
    return agg.histogram_daily_merge(
        _t(spark, sf_dir, "events"), "ts", "value", width=10.0,
        quantiles=[0.25, 0.5, 0.9, 0.99],
    )


@_q(
    "hll_daily_user_merge",
    agg.hll_merge_oracle_sql("events", "ts", "user_id", m=64),
    doc="HLL register-max merge proof (operators/aggregates.py:"
    "hll_daily_merge) — the proof-family member whose merge is NOT a "
    "sum: per-day register states fold with MAX (associative, "
    "commutative, IDEMPOTENT — re-merging a day is harmless, which "
    "neither counters nor k-min sets give you), then the merged "
    "state's estimate is emitted next to the direct whole-table "
    "sketch. registers_hit and rho_sum pin the full register state, "
    "so the __merged__/__direct__ pair proves STATE equality, not "
    "just estimate coincidence. Completes the family: KMV k-min "
    "union, histogram bucket sum, aggregate-state monoids, HLL "
    "register semilattice. At 100 TB keep days × 64 register rows; "
    "any date-range distinct is one max-fold, no raw rescan.",
)
def q_hll_daily_user_merge(spark, sf_dir):
    return agg.hll_daily_merge(
        _t(spark, sf_dir, "events"), "ts", "user_id", m=64
    )


@_q(
    "cms_daily_user_merge",
    agg.cms_merge_oracle_sql("events", "ts", "user_id", depth=4, width=512),
    doc="Count-Min grid merge proof (operators/aggregates.py:"
    "cms_daily_merge): per-day 4×512 counter grids summed cell-wise "
    "vs the direct whole-table grid — BOTH full nonzero grids are "
    "emitted (src, i, pos, cnt), bounded at 2·depth·width rows "
    "regardless of data volume, so the driver's value hash proves "
    "every counter equal, not a summary statistic. Closes the "
    "sketch-merge proof set (counters ADD, k-min sets UNION, "
    "histogram buckets ADD, HLL registers MAX). At 100 TB the "
    "per-day grids are the stored artifact; any date-range heavy-"
    "hitter query sums O(days·depth·width) integers before the "
    "min-over-rows probe — no raw rescan.",
)
def q_cms_daily_user_merge(spark, sf_dir):
    return agg.cms_daily_merge(
        _t(spark, sf_dir, "events"), "ts", "user_id", depth=4, width=512
    )




@_q(
    "event_value_ks_drift",
    """
WITH cells AS (
  SELECT CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS BIGINT) AS tb
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT CAST(sum(ta) OVER w AS BIGINT) AS ca,
         CAST(sum(tb) OVER w AS BIGINT) AS cb
  FROM cells
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (SELECT CAST(max(ca) AS BIGINT) AS na, CAST(max(cb) AS BIGINT) AS nb FROM cum),
m AS (
  SELECT t.na AS n_a, t.nb AS n_b,
         max(abs(CAST(c.ca AS HUGEINT) * t.nb - CAST(c.cb AS HUGEINT) * t.na)) AS num
  FROM cum c, tot t GROUP BY 1, 2
)
SELECT n_a, n_b,
       round(CAST(num AS DOUBLE) / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS d,
       round(CAST(1.36 AS DOUBLE)
             * sqrt((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                    / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))), 6) AS d_crit
FROM m
""",
    doc="Two-sample Kolmogorov-Smirnov drift test on event values, "
    "early vs late window (operators/timeseries.py:ks_drift) — the "
    "bin-free supremum-CDF-gap member that completes the drift "
    "battery (TV distance on fixed bins, PSI monitored number, "
    "rank-sum location z, KS any-shape-change). Both empirical CDFs "
    "are integer window sums over the domain-bounded cents-cell "
    "relation; the supremum is over EXACT integer cross-differences "
    "|ca*n_b - cb*n_a| (DECIMAL/HUGEINT — the product passes int64 "
    "near 1e9 rows/window), so D is ONE double division and the "
    "Smirnov 5% critical value a fixed IEEE sequence. One scan, one "
    "bounded shuffle, one ordered window over cells.",
)
def q_event_value_ks_drift(spark, sf_dir):
    return ts_ops.ks_drift(
        _t(spark, sf_dir, "events"), "ts", "value", "2024-01-16"
    )


@_q(
    "daily_event_ewma",
    """
WITH c AS (
  SELECT CAST(ts AS DATE) AS date, count(*) AS cnt FROM events GROUP BY 1
),
span AS (SELECT min(date) AS lo, max(date) AS hi FROM c),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS date
  FROM span
),
s AS (
  SELECT spine.date, coalesce(c.cnt, 0) AS cnt
  FROM spine LEFT JOIN c ON spine.date = c.date
),
l AS (
  SELECT date, cnt,
         lag(cnt, 1) OVER w AS l1, lag(cnt, 2) OVER w AS l2,
         lag(cnt, 3) OVER w AS l3, lag(cnt, 4) OVER w AS l4,
         lag(cnt, 5) OVER w AS l5, lag(cnt, 6) OVER w AS l6,
         lag(cnt, 7) OVER w AS l7
  FROM s
  WINDOW w AS (ORDER BY date)
)
SELECT date, cnt,
       round(CAST(cnt * 128 + coalesce(l1, 0) * 64 + coalesce(l2, 0) * 32
                  + coalesce(l3, 0) * 16 + coalesce(l4, 0) * 8
                  + coalesce(l5, 0) * 4 + coalesce(l6, 0) * 2
                  + coalesce(l7, 0) AS DOUBLE)
             / CAST(128 + CASE WHEN l1 IS NOT NULL THEN 64 ELSE 0 END
                    + CASE WHEN l2 IS NOT NULL THEN 32 ELSE 0 END
                    + CASE WHEN l3 IS NOT NULL THEN 16 ELSE 0 END
                    + CASE WHEN l4 IS NOT NULL THEN 8 ELSE 0 END
                    + CASE WHEN l5 IS NOT NULL THEN 4 ELSE 0 END
                    + CASE WHEN l6 IS NOT NULL THEN 2 ELSE 0 END
                    + CASE WHEN l7 IS NOT NULL THEN 1 ELSE 0 END AS DOUBLE),
             6) AS ewma
FROM l ORDER BY date
""",
    doc="Truncated exponentially weighted moving average (alpha=1/2, "
    "8 terms) of the gap-filled daily event count "
    "(operators/timeseries.py:ewma_daily_counts) — the low-latency "
    "smoother next to rolling_7d_event_avg: geometric recency "
    "weighting reacts in ~2 days instead of the window length, and "
    "with alpha=1/2 the truncated weights clear to INTEGER "
    "numerator/denominator (powers of two), so each day's EWMA is "
    "ONE double division of exact int64s — no float powers, no "
    "order-dependent sums. All lag terms are literal offsets over "
    "the tiny daily relation; work is independent of event volume.",
)
def q_daily_event_ewma(spark, sf_dir):
    return ts_ops.ewma_daily_counts(_t(spark, sf_dir, "events"), "ts")


@_q(
    "customer_order_survival",
    """
WITH e AS (SELECT max(o_orderdate) AS end_d FROM orders),
seq AS (
  SELECT o_custkey, o_orderdate,
         lead(o_orderdate) OVER (PARTITION BY o_custkey ORDER BY o_orderdate) AS nxt
  FROM orders
),
durs AS (
  SELECT CAST(CASE WHEN nxt IS NOT NULL THEN date_diff('day', o_orderdate, nxt)
              ELSE date_diff('day', o_orderdate, (SELECT end_d FROM e)) END AS BIGINT) AS t,
         CASE WHEN nxt IS NOT NULL THEN 1 ELSE 0 END AS ev
  FROM seq
),
cells AS (
  SELECT t, CAST(sum(ev) AS BIGINT) AS d, CAST(sum(1 - ev) AS BIGINT) AS c
  FROM durs GROUP BY 1
),
tot AS (SELECT CAST(sum(d + c) AS BIGINT) AS n FROM cells),
ar AS (
  SELECT t, d, c,
         CAST((SELECT n FROM tot)
              - coalesce(sum(d + c) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS n_at_risk
  FROM cells
),
terms AS (
  SELECT t, d, c, n_at_risk,
         CASE WHEN d < n_at_risk
              THEN round(ln(CAST(1.0 AS DOUBLE) - CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)), 6)
              ELSE CAST(0.0 AS DOUBLE) END AS term,
         CASE WHEN d >= n_at_risk THEN 1 ELSE 0 END AS exh
  FROM ar
),
curve AS (
  SELECT t, d, c, n_at_risk,
         sum(CAST(term AS DECIMAL(27,6))) OVER wc AS cum,
         max(exh) OVER wc AS exh2
  FROM terms
  WINDOW wc AS (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT t AS t_days, n_at_risk, d AS n_events, c AS n_censored,
       CASE WHEN exh2 = 1 THEN CAST(0.0 AS DOUBLE)
            ELSE round(exp(CAST(cum AS DOUBLE)), 6) END AS survival
FROM curve WHERE d > 0 ORDER BY t_days
""",
    doc="Kaplan-Meier survival curve over customer inter-order gaps "
    "(operators/timeseries.py:kaplan_meier_gaps) — the censoring-"
    "correct 'time to next order' curve: consecutive-order gaps are "
    "events, the wait from each customer's LAST order to the corpus "
    "end-date is right-censored and enters the risk set without "
    "biasing the estimate (Kaplan & Meier 1958) — the full-curve "
    "companion to cohort_retention's fixed horizons. Per-time terms "
    "ln(1 - d/n) are 6dp-rounded then DECIMAL(27,6)-cumsummed over "
    "the bounded distinct-gap relation (order-free replay); exp is "
    "one libm call per output row; a risk-set-exhausting final time "
    "is exactly 0 on both engines.",
)
def q_customer_order_survival(spark, sf_dir):
    return ts_ops.kaplan_meier_gaps(
        _t(spark, sf_dir, "orders"), "o_custkey", "o_orderdate"
    )




@_q(
    "priority_status_cramers_v",
    """
WITH cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b, count(*) AS o
  FROM orders GROUP BY 1, 2
),
da AS (SELECT DISTINCT a FROM cells),
db AS (SELECT DISTINCT b FROM cells),
full_c AS (
  SELECT da.a, db.b, CAST(coalesce(c.o, 0) AS BIGINT) AS o
  FROM da CROSS JOIN db
  LEFT JOIN cells c ON c.a = da.a AND c.b = db.b
),
sized AS (
  SELECT a, b, o,
         CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS n_a,
         CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS n_b,
         CAST(sum(o) OVER () AS BIGINT) AS n
  FROM full_c
),
m AS (
  SELECT CAST(max(n) AS BIGINT) AS n_rows,
         (SELECT CAST(count(DISTINCT a) AS BIGINT) FROM cells) AS levels_a,
         (SELECT CAST(count(DISTINCT b) AS BIGINT) FROM cells) AS levels_b,
         sum(CAST(round(
           (CAST(o AS DOUBLE)
            - CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE) / CAST(n AS DOUBLE))
           * (CAST(o AS DOUBLE)
              - CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE) / CAST(n AS DOUBLE))
           / (CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE) / CAST(n AS DOUBLE)),
           6) AS DECIMAL(27,6))) AS chi2d
  FROM sized
)
SELECT n_rows, levels_a, levels_b,
       round(CAST(chi2d AS DOUBLE), 6) AS chi2,
       CASE WHEN least(levels_a - 1, levels_b - 1) > 0 THEN
         round(sqrt(CAST(chi2d AS DOUBLE)
                    / (CAST(n_rows AS DOUBLE)
                       * CAST(least(levels_a - 1, levels_b - 1) AS DOUBLE))), 6)
       END AS v
FROM m
""",
    doc="Chi-square statistic and Cramer's V between order priority "
    "and status (operators/aggregates.py:cramers_v) — the one-number "
    "effect-size rollup of priority_status_association's cell-level "
    "lift/PMI table, normalized to [0,1] and comparable across "
    "tables of any shape. Same plan shape as the association audit "
    "(one combinable groupBy, marginals as window sums over the "
    "bounded cell relation) plus the full r x c level spine so "
    "structurally-zero cells contribute their (0-e)^2/e terms — "
    "observed-only understates chi2 exactly when association is "
    "strongest; expected counts keep the n_a*n_b "
    "product exact in DECIMAL/HUGEINT (passes int64 near n ~ 1e10), "
    "each cell's (o-e)^2/e is a fixed IEEE sequence rounded 6dp and "
    "DECIMAL(27,6)-summed — order-free on both engines.",
)
def q_priority_status_cramers_v(spark, sf_dir):
    return agg.cramers_v(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


@_q(
    "nation_customer_hhi",
    """
WITH subs AS (
  SELECT n.n_name AS g, c.c_custkey AS e,
         CAST(sum(CAST(FLOOR(CAST(o.o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_totalprice IS NOT NULL
  GROUP BY 1, 2
),
m AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_entities,
         sum(CAST(s AS HUGEINT)) AS t,
         sum(CAST(s AS HUGEINT) * CAST(s AS HUGEINT)) AS q
  FROM subs GROUP BY 1
)
SELECT g AS n_name, n_entities,
       CASE WHEN t > 0 THEN round(CAST(q AS DOUBLE) / CAST(t * t AS DOUBLE), 6) END AS hhi,
       CASE WHEN t > 0 THEN round(CAST(t * t AS DOUBLE) / CAST(q AS DOUBLE), 6) END AS effective_n,
       CASE WHEN t > 0 AND n_entities > 1 THEN
         round((CAST(q AS DOUBLE) / CAST(t * t AS DOUBLE)
                - CAST(1.0 AS DOUBLE) / CAST(n_entities AS DOUBLE))
               / (CAST(1.0 AS DOUBLE) - CAST(1.0 AS DOUBLE) / CAST(n_entities AS DOUBLE)), 6)
       END AS hhi_normalized
FROM m ORDER BY n_name
""",
    doc="Herfindahl-Hirschman spend-concentration index per nation "
    "over customer order totals (operators/aggregates.py:"
    "hhi_by_group) — the dominance/market-structure companion to "
    "customer_spend_gini (inequality != concentration), with 1/HHI "
    "as the effective number of customers and the [0,1]-normalized "
    "variant for cross-nation comparison. Exact integer cents "
    "subtotals; sum-of-squares and squared-sum both exact in "
    "DECIMAL/HUGEINT (s^2 ~ 1e26 at 100 TB — past int64 by design); "
    "the index is ONE double division. Two combinable groupBys, a "
    "broadcast dim join, no windows.",
)
def q_nation_customer_hhi(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = o.join(
        c, o["o_custkey"] == c["c_custkey"]
    ).join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    return agg.hhi_by_group(j, "n_name", "c_custkey", "o_totalprice")


@_q(
    "event_value_anova_f",
    """
WITH grp AS (
  SELECT event_type AS g, CAST(count(*) AS BIGINT) AS n_g,
         CAST(sum(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s_g,
         sum(CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS HUGEINT)
             * CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS HUGEINT)) AS q_g
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
m AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS k_groups,
         sum(CAST(s_g AS HUGEINT)) AS t,
         sum(q_g) AS q,
         sum(CAST(round(CAST(CAST(s_g AS HUGEINT) * CAST(s_g AS HUGEINT) AS DOUBLE)
                        / CAST(n_g AS DOUBLE), 6) AS DECIMAL(27,6))) AS a
  FROM grp
),
x AS (
  SELECT n_rows, k_groups,
         CAST(a AS DOUBLE) AS ad,
         CAST(q AS DOUBLE) AS qd,
         round(CAST(t * t AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS grand
  FROM m
)
SELECT n_rows, k_groups,
       round((ad - grand) / CAST(10000.0 AS DOUBLE), 6) AS ss_between,
       round((qd - ad) / CAST(10000.0 AS DOUBLE), 6) AS ss_within,
       CASE WHEN k_groups > 1 AND (qd - ad) > 0 AND n_rows > k_groups THEN
         round(((ad - grand) / (CAST(k_groups AS DOUBLE) - CAST(1.0 AS DOUBLE)))
               / ((qd - ad) / (CAST(n_rows AS DOUBLE) - CAST(k_groups AS DOUBLE))), 6)
       END AS f_stat,
       CASE WHEN (qd - grand) > 0 THEN
         round((ad - grand) / (qd - grand), 6)
       END AS eta_sq
FROM x
""",
    doc="One-way ANOVA F and eta-squared of event value across event "
    "types (operators/aggregates.py:anova_f) — the parametric "
    "between-groups member of the distribution-testing tier: "
    "rank-sum/KS compare two time windows, ANOVA asks whether K "
    "category means differ beyond within-group noise, eta^2 is the "
    "variance-explained effect size a feature audit reads. Exact "
    "integer cents moments (Q in DECIMAL/HUGEINT); each group's "
    "S_g^2/n_g is ONE double division rounded 6dp then "
    "DECIMAL(27,6)-summed; F/eta^2 fixed IEEE sequences, NULL-"
    "guarded for degenerate inputs. One combinable groupBy to K "
    "rows, one 1-row aggregate.",
)
def q_event_value_anova_f(spark, sf_dir):
    return agg.anova_f(_t(spark, sf_dir, "events"), "event_type", "value")




@_q(
    "source_unigram_jsd",
    r"""
WITH cells AS (
  SELECT source AS g, w, CAST(count(*) AS BIGINT) AS y
  FROM (SELECT source, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents)
  WHERE w <> ''
  GROUP BY 1, 2
),
words AS (SELECT w, CAST(sum(y) AS BIGINT) AS y_all FROM cells GROUP BY 1),
groups AS (SELECT g, CAST(sum(y) AS BIGINT) AS n_g FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(y) AS BIGINT) AS n, CAST(count(DISTINCT w) AS BIGINT) AS v
  FROM cells
),
full_c AS (
  SELECT gr.g, gr.n_g, wo.w, wo.y_all, coalesce(c.y, 0) AS y
  FROM groups gr CROSS JOIN words wo
  LEFT JOIN cells c ON c.g = gr.g AND c.w = wo.w
),
pq AS (
  SELECT g, n_g,
         (CAST(y AS DOUBLE) + CAST(1.0 AS DOUBLE))
           / (CAST(n_g AS DOUBLE) + CAST(t.v AS DOUBLE)) AS p,
         (CAST(y_all AS DOUBLE) + CAST(1.0 AS DOUBLE))
           / (CAST(t.n AS DOUBLE) + CAST(t.v AS DOUBLE)) AS q,
         t.v AS v
  FROM full_c, tot t
),
terms AS (
  SELECT g, n_g, v,
         round(p * ln(p / ((p + q) / CAST(2.0 AS DOUBLE))), 6) AS tp,
         round(q * ln(q / ((p + q) / CAST(2.0 AS DOUBLE))), 6) AS tq
  FROM pq
)
SELECT g AS source, n_g AS n_tokens,
       CAST(max(v) AS BIGINT) AS n_vocab,
       round(CAST(sum(CAST(tp AS DECIMAL(27,6))) + sum(CAST(tq AS DECIMAL(27,6))) AS DOUBLE)
             / CAST(1.3862943611198906 AS DOUBLE), 6) AS jsd_bits
FROM terms GROUP BY 1, 2 ORDER BY source
""",
    doc="Per-source Jensen-Shannon divergence (bits) between the "
    "source's unigram distribution and the whole corpus "
    "(operators/textops.py:unigram_jsd_to_corpus) — the mixture-"
    "design number next to distinctive_terms_by_source: log-odds "
    "names WHICH words set a source apart, JSD says HOW FAR the "
    "source sits from the corpus mixture (0 = indistinguishable, "
    "1 bit = disjoint), defined for disjoint vocabularies — why it "
    "beats KL for corpus comparison. One token explode + one "
    "(group,word) combinable groupBy; absent-word cells come from a "
    "vocab x groups spine over the SAME cell relation (no rescan); "
    "the two ln terms per row are individually 6dp-rounded then "
    "DECIMAL(27,6)-summed (order-free).",
)
def q_source_unigram_jsd(spark, sf_dir):
    return tx.unigram_jsd_to_corpus(
        _t(spark, sf_dir, "documents"), "source", "text"
    )


@_q(
    "quality_gate_kappa",
    r"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\s+') AS toks,
         string_split(text, chr(10)) AS lines,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(regexp_extract_all(text, '#')) AS INT)
           + CAST(len(regexp_extract_all(text, '(\.\.\.|…)')) AS INT) AS n_sym
  FROM documents
),
g AS (
  SELECT doc_id,
         (CAST(len(toks) AS INT) BETWEEN 50 AND 100000
          AND round(CAST(n_chars - (len(toks) - 1) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE), 6) BETWEEN 3.0 AND 10.0
          AND round(CAST(n_sym AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) <= 0.1
          AND round(CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
                    / CAST(len(lines) AS DOUBLE), 6) <= 0.9
          AND round(CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
                    / CAST(len(lines) AS DOUBLE), 6) <= 0.3
          AND round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE), 6) >= 0.8
          AND CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS INT) >= 2
         ) AS ga
  FROM base
),
q AS (
  SELECT doc_id,
         (round(least(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
                 / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE), 6) * 0.3
               + (1.0 - least(round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE), 6) * 10, 1.0)) * 0.2,
               6) >= 0.45) AS gb
  FROM documents
),
counts AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN coalesce(ga, false) AND coalesce(gb, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_both,
         CAST(sum(CASE WHEN coalesce(ga, false) AND NOT coalesce(gb, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_only_a,
         CAST(sum(CASE WHEN NOT coalesce(ga, false) AND coalesce(gb, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_only_b,
         CAST(sum(CASE WHEN NOT coalesce(ga, false) AND NOT coalesce(gb, false) THEN 1 ELSE 0 END) AS BIGINT) AS n_neither
  FROM g JOIN q USING (doc_id)
),
x AS (
  SELECT n_rows, n_both, n_only_a, n_only_b, n_neither,
         CAST(n_both + n_neither AS DOUBLE) / CAST(n_rows AS DOUBLE) AS po,
         (CAST(n_both + n_only_a AS DOUBLE) / CAST(n_rows AS DOUBLE))
           * (CAST(n_both + n_only_b AS DOUBLE) / CAST(n_rows AS DOUBLE))
         + (CAST(1.0 AS DOUBLE) - CAST(n_both + n_only_a AS DOUBLE) / CAST(n_rows AS DOUBLE))
           * (CAST(1.0 AS DOUBLE) - CAST(n_both + n_only_b AS DOUBLE) / CAST(n_rows AS DOUBLE)) AS pe
  FROM counts
)
SELECT n_rows, n_both, n_only_a, n_only_b, n_neither,
       round(po, 6) AS p_observed,
       round(pe, 6) AS p_expected,
       CASE WHEN pe < CAST(1.0 AS DOUBLE)
            THEN round((po - pe) / (CAST(1.0 AS DOUBLE) - pe), 6) END AS kappa
FROM x
""",
    doc="Cohen's kappa between the Gopher-style rule gate and the "
    "quality-score gate on documents (operators/quality.py:"
    "gate_agreement_kappa) — the chance-corrected agreement number "
    "read before swapping one quality filter for another: raw "
    "accuracy flatters any pair of gates that both pass almost "
    "everything; kappa subtracts the marginal-rate agreement "
    "(Cohen 1960). Both gates reuse the exact predicates of their "
    "green registry rows (gopher_quality_flags, "
    "quality_rate_confidence); every count is one combinable "
    "aggregate, every float step a fixed IEEE sequence on exact "
    "int64s, NULL-guarded at pe = 1.",
)
def q_quality_gate_kappa(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    g = tx.gopher_quality_flags(docs).select("doc_id", "passes_gopher")
    q = tx.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    j = g.join(q, "doc_id")
    return dq.gate_agreement_kappa(
        j, F.col("passes_gopher"), F.col("quality_score") >= 0.45
    )


@_q(
    "customer_name_edit_pairs",
    """
WITH rn AS (
  SELECT c_custkey AS id, c_name AS nm,
         row_number() OVER (ORDER BY c_name, c_custkey) AS rn
  FROM customer
),
pairs AS (
  SELECT least(a.id, b.id) AS doc_a, greatest(a.id, b.id) AS doc_b
  FROM rn a JOIN rn b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3
)
SELECT p.doc_a, p.doc_b,
       CAST(levenshtein(ca.c_name, cb.c_name) AS INT) AS edit_dist
FROM pairs p
JOIN customer ca ON p.doc_a = ca.c_custkey
JOIN customer cb ON p.doc_b = cb.c_custkey
WHERE levenshtein(ca.c_name, cb.c_name) <= 2
ORDER BY doc_a, doc_b
""",
    doc="Edit-distance verification over SNM-blocked customer-name "
    "candidates (operators/dedup.py:edit_distance_verify over "
    "sorted_neighborhood_pairs) — the exact Levenshtein comparison "
    "stage the classic ER pipeline runs AFTER blocking and BEFORE "
    "clustering: O(len^2) per pair is affordable only because SNM "
    "bounded candidates to n*w, and on short identity strings it "
    "catches single-character typos that fall inside every shingle "
    "(the failure mode of token blocking). Integer distances, "
    "integer threshold — no floats anywhere; the blocked pair list "
    "joins the attribute relation on unique keys (equi-joins, "
    "linear in candidates, never all-pairs).",
)
def q_customer_name_edit_pairs(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    pairs = dd.sorted_neighborhood_pairs(
        c, "c_custkey", F.col("c_name"), window=3
    ).select("doc_a", "doc_b")
    return dd.edit_distance_verify(pairs, c, "c_custkey", "c_name", 2)




@_q(
    "event_value_cohens_d",
    """
WITH base AS (
  SELECT CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS x,
         CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END AS a
  FROM events WHERE value IS NOT NULL
),
m AS (
  SELECT CAST(sum(a) AS BIGINT) AS n_a,
         CAST(sum(1 - a) AS BIGINT) AS n_b,
         CAST(sum(a * x) AS BIGINT) AS s_a,
         CAST(sum((1 - a) * x) AS BIGINT) AS s_b,
         sum(CAST(a AS HUGEINT) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q_a,
         sum(CAST(1 - a AS HUGEINT) * CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS q_b
  FROM base
),
x2 AS (
  SELECT n_a, n_b,
         CAST(CAST(n_a AS HUGEINT) * q_a - CAST(s_a AS HUGEINT) * CAST(s_a AS HUGEINT) AS DOUBLE)
           / CAST(n_a AS DOUBLE) AS ssa,
         CAST(CAST(n_b AS HUGEINT) * q_b - CAST(s_b AS HUGEINT) * CAST(s_b AS HUGEINT) AS DOUBLE)
           / CAST(n_b AS DOUBLE) AS ssb,
         CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS ma,
         CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS mb,
         CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE) - CAST(2.0 AS DOUBLE) AS dfree
  FROM m
)
SELECT n_a, n_b,
       round(ma / CAST(100.0 AS DOUBLE), 6) AS mean_a,
       round(mb / CAST(100.0 AS DOUBLE), 6) AS mean_b,
       CASE WHEN n_a > 1 AND n_b > 1 AND (ssa + ssb) / dfree > 0 THEN
         round((ma - mb) / sqrt((ssa + ssb) / dfree), 6) END AS cohens_d,
       CASE WHEN n_a > 1 AND n_b > 1 AND (ssa + ssb) / dfree > 0 THEN
         round((CAST(1.0 AS DOUBLE) - CAST(3.0 AS DOUBLE) / (CAST(4.0 AS DOUBLE) * dfree - CAST(1.0 AS DOUBLE)))
               * ((ma - mb) / sqrt((ssa + ssb) / dfree)), 6) END AS hedges_g
FROM x2
""",
    doc="Cohen's d and Hedges' g between the early/late event-value "
    "windows (operators/timeseries.py:cohens_d_drift) — the "
    "parametric effect size completing the drift battery's pair: "
    "rank-sum AUC is the distribution-free probability of "
    "superiority; d is the mean shift in pooled-SD units that power "
    "analyses and runbooks quote. Exact integer-cents moments from "
    "ONE combinable aggregate (Q in DECIMAL/HUGEINT); "
    "(n-1)s^2 = (nQ - S^2)/n keeps every product exact; d and the "
    "rational Hedges correction are short fixed IEEE sequences, "
    "NULL-guarded for degenerate windows.",
)
def q_event_value_cohens_d(spark, sf_dir):
    return ts_ops.cohens_d_drift(
        _t(spark, sf_dir, "events"), "ts", "value", "2024-01-16"
    )


@_q(
    "event_type_ranksum_scan",
    """
WITH cells AS (
  SELECT event_type AS g,
         CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         count(*) AS t,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS t_a
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
ranked AS (
  SELECT g, v, t, t_a,
         COALESCE(CAST(sum(t) OVER (PARTITION BY g ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
  FROM cells
),
a AS (
  SELECT g,
         CAST(sum(t_a) AS BIGINT) AS n_a,
         CAST(sum(t) - sum(t_a) AS BIGINT) AS n_b,
         sum(CAST(t_a AS HUGEINT)
             * (2 * CAST(cb AS HUGEINT) + CAST(t AS HUGEINT) + 1)) AS r2a,
         sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
             - CAST(t AS HUGEINT)) AS ties
  FROM ranked GROUP BY 1
)
SELECT g AS event_type, n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         round(CAST(r2a - CAST(n_a AS HUGEINT) * (CAST(n_a AS HUGEINT) + 1) AS DOUBLE)
               / CAST(2.0 AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) END AS auc,
       CASE WHEN n_a > 0 AND n_b > 0
                 AND CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(12.0 AS DOUBLE)
                     * ((CAST(n_a + n_b AS DOUBLE) + CAST(1.0 AS DOUBLE))
                        - CAST(ties AS DOUBLE)
                          / (CAST(n_a + n_b AS DOUBLE)
                             * (CAST(n_a + n_b AS DOUBLE) - CAST(1.0 AS DOUBLE)))) > 0 THEN
         round((CAST(r2a - CAST(n_a AS HUGEINT) * (CAST(n_a AS HUGEINT) + 1) AS DOUBLE)
                - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
               / (CAST(2.0 AS DOUBLE)
                  * sqrt(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) / CAST(12.0 AS DOUBLE)
                         * ((CAST(n_a + n_b AS DOUBLE) + CAST(1.0 AS DOUBLE))
                            - CAST(ties AS DOUBLE)
                              / (CAST(n_a + n_b AS DOUBLE)
                                 * (CAST(n_a + n_b AS DOUBLE) - CAST(1.0 AS DOUBLE)))))),
               6) END AS z
FROM a ORDER BY event_type
""",
    doc="Per-event-type Mann-Whitney drift scan, early vs late window "
    "(operators/timeseries.py:grouped_ranksum_drift) — the triage "
    "view over event_value_ranksum_drift's single global test: says "
    "WHICH types carry a corpus-level shift and catches offsetting "
    "per-type drifts the global number averages away. Identical "
    "exact construction with every window/aggregate partitioned by "
    "type (domain-bounded cents cells, DECIMAL/HUGEINT rank sums, "
    "fixed IEEE auc/z), NULL-guarded for one-sided or all-tied "
    "groups. One scan, one (type,cell) shuffle, one per-type "
    "ordered window over cells.",
)
def q_event_type_ranksum_scan(spark, sf_dir):
    return ts_ops.grouped_ranksum_drift(
        _t(spark, sf_dir, "events"), "event_type", "ts", "value",
        "2024-01-16",
    )


@_q(
    "vocab_chao1_richness",
    r"""
WITH counts AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents)
  WHERE w <> ''
  GROUP BY 1
),
m AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_tokens,
         CAST(count(*) AS BIGINT) AS n_vocab,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM counts
)
SELECT n_tokens, n_vocab, f1, f2,
       round(CAST(n_vocab AS DOUBLE)
             + CAST(f1 AS DOUBLE) * (CAST(f1 AS DOUBLE) - CAST(1.0 AS DOUBLE))
               / (CAST(2.0 AS DOUBLE) * (CAST(f2 AS DOUBLE) + CAST(1.0 AS DOUBLE))), 6) AS chao1,
       round(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS unseen_mass,
       round(CAST(1.0 AS DOUBLE) - CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS coverage
FROM m
""",
    doc="Chao1 vocabulary-richness estimate plus Good-Turing unseen "
    "mass over the corpus unigram frequency-of-frequencies "
    "(operators/textops.py:chao1_richness) — vocab_coverage_curve "
    "shows how fast new types arrive; Chao1 (d + f1(f1-1)/(2(f2+1)), "
    "bias-corrected, defined at f2=0) estimates how many types "
    "EXIST, and f1/N is the probability the next token is unseen "
    "(Good-Turing) — the coverage number an LM-data curator reads. "
    "One token explode + word groupBy (the shuffle every vocab query "
    "pays), one combinable 1-row rollup; every output ONE double "
    "division on exact int64s.",
)
def q_vocab_chao1_richness(spark, sf_dir):
    return tx.chao1_richness(_t(spark, sf_dir, "documents"), "text")


@_q(
    "event_transition_entropy",
    """
WITH cells AS (
  SELECT from_type, to_type, count(*) AS cnt FROM (
    SELECT lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS from_type,
           event_type AS to_type
    FROM events)
  WHERE from_type IS NOT NULL
  GROUP BY 1, 2
),
sized AS (
  SELECT cnt,
         CAST(sum(cnt) OVER (PARTITION BY from_type) AS BIGINT) AS row_tot,
         CAST(sum(cnt) OVER () AS BIGINT) AS n,
         from_type
  FROM cells
),
m AS (
  SELECT n,
         CAST(count(DISTINCT from_type) AS BIGINT) AS n_states,
         sum(CAST(round((CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE))
                        * ln(CAST(row_tot AS DOUBLE) / CAST(cnt AS DOUBLE)), 6)
                  AS DECIMAL(27,6))) AS h
  FROM sized GROUP BY 1
)
SELECT n AS n_transitions, n_states,
       round(CAST(h AS DOUBLE), 6) AS entropy_rate,
       round(ln(CAST(n_states AS DOUBLE)), 6) AS max_entropy
FROM m
""",
    doc="Entropy rate (nats) of the first-order event-type Markov "
    "chain (operators/behavior.py:transition_entropy) — the "
    "one-number predictability ceiling over the event_transitions "
    "matrix: near 0 = deterministic journeys, near ln(k) = the next "
    "event is anyone's guess; the number to read before investing "
    "in next-event prediction or session models. Deterministic "
    "(ts,id)-ordered transitions; row marginals are window sums over "
    "the tiny (from,to) cell relation; each term has ONE ln on a "
    "ratio of exact integers, 6dp-rounded then DECIMAL(27,6)-summed "
    "(order-free). One user-keyed window shuffle, one tiny reduce.",
)
def q_event_transition_entropy(spark, sf_dir):
    from .operators import behavior as bh

    return bh.transition_entropy(_t(spark, sf_dir, "events"))


@_q(
    "price_quantity_partial_corr",
    """
WITH base AS (
  SELECT CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS x,
         CAST(FLOOR(CAST(l_quantity AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS y,
         CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS z
  FROM lineitem
  WHERE l_extendedprice IS NOT NULL AND l_quantity IS NOT NULL AND l_discount IS NOT NULL
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy, CAST(sum(z) AS BIGINT) AS sz,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy,
         sum(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS szz,
         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         sum(CAST(x AS HUGEINT) * CAST(z AS HUGEINT)) AS sxz,
         sum(CAST(y AS HUGEINT) * CAST(z AS HUGEINT)) AS syz
  FROM base
),
r AS (
  SELECT n_rows,
         CASE WHEN (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                   AND (CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0 THEN
           round((CAST(n_rows AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (sqrt(CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6) END AS r_xy,
         CASE WHEN (CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) > 0
                   AND (CAST(n_rows AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)) > 0 THEN
           round((CAST(n_rows AS DOUBLE) * CAST(sxz AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sz AS DOUBLE))
                 / (sqrt(CAST(n_rows AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * sqrt(CAST(n_rows AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6) END AS r_xz,
         CASE WHEN (CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                   AND (CAST(n_rows AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE)) > 0 THEN
           round((CAST(n_rows AS DOUBLE) * CAST(syz AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sz AS DOUBLE))
                 / (sqrt(CAST(n_rows AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                    * sqrt(CAST(n_rows AS DOUBLE) * CAST(szz AS DOUBLE) - CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE))), 6) END AS r_yz
  FROM m
)
SELECT n_rows, r_xy, r_xz, r_yz,
       CASE WHEN (CAST(1.0 AS DOUBLE) - r_xz * r_xz) * (CAST(1.0 AS DOUBLE) - r_yz * r_yz) > 0 THEN
         round((r_xy - r_xz * r_yz)
               / sqrt((CAST(1.0 AS DOUBLE) - r_xz * r_xz) * (CAST(1.0 AS DOUBLE) - r_yz * r_yz)), 6)
       END AS partial_r
FROM r
""",
    doc="Partial correlation of extended price and quantity "
    "controlling for discount (operators/aggregates.py:"
    "partial_corr) — the confounder check completing the "
    "correlation ladder (Pearson/Spearman/Kendall): a pairwise r "
    "that collapses under conditioning was the third variable's "
    "doing. Ten exact DECIMAL/HUGEINT cents moments from ONE "
    "combinable aggregate; each pairwise r is the Pearson fixed "
    "IEEE sequence rounded 6dp, and the partial is computed FROM "
    "the rounded r's so the replay needs only the published "
    "numbers. NULL-guarded at zero variance or |r| = 1.",
)
def q_price_quantity_partial_corr(spark, sf_dir):
    return agg.partial_corr(
        _t(spark, sf_dir, "lineitem"),
        "l_extendedprice",
        "l_quantity",
        "l_discount",
    )


@_q(
    "event_value_levene",
    """
WITH cells AS (
  SELECT event_type AS g,
         CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS t
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT g, v, t,
         CAST(sum(t) OVER (PARTITION BY g ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(t) OVER (PARTITION BY g) AS BIGINT) AS n_g
  FROM cells
),
meds AS (
  SELECT g, n_g,
         min(CASE WHEN cum >= CAST(FLOOR((CAST(n_g AS DOUBLE) + 1) / 2.0) AS BIGINT) THEN v END) AS m1,
         min(CASE WHEN cum >= CAST(FLOOR(CAST(n_g AS DOUBLE) / 2.0) AS BIGINT) + 1 THEN v END) AS m2
  FROM cum GROUP BY 1, 2
),
dev AS (
  SELECT c.g, c.t, abs(2 * c.v - (m.m1 + m.m2)) AS zv
  FROM cells c JOIN meds m ON c.g = m.g
),
grp AS (
  SELECT g, CAST(sum(t) AS BIGINT) AS n_g,
         CAST(sum(t * zv) AS BIGINT) AS s_g,
         sum(CAST(t AS HUGEINT) * CAST(zv AS HUGEINT) * CAST(zv AS HUGEINT)) AS q_g
  FROM dev GROUP BY 1
),
m AS (
  SELECT CAST(sum(n_g) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS k_groups,
         sum(CAST(s_g AS HUGEINT)) AS t,
         sum(q_g) AS q,
         sum(CAST(round(CAST(CAST(s_g AS HUGEINT) * CAST(s_g AS HUGEINT) AS DOUBLE)
                        / CAST(n_g AS DOUBLE), 6) AS DECIMAL(27,6))) AS a
  FROM grp
),
x AS (
  SELECT n_rows, k_groups,
         CAST(a AS DOUBLE) AS ad, CAST(q AS DOUBLE) AS qd,
         round(CAST(t * t AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS grand
  FROM m
)
SELECT n_rows, k_groups,
       CASE WHEN k_groups > 1 AND (qd - ad) > 0 AND n_rows > k_groups THEN
         round(((ad - grand) / (CAST(k_groups AS DOUBLE) - CAST(1.0 AS DOUBLE)))
               / ((qd - ad) / (CAST(n_rows AS DOUBLE) - CAST(k_groups AS DOUBLE))), 6)
       END AS f_stat
FROM x
""",
    doc="Brown-Forsythe (median-based Levene) test for equality of "
    "event-value spread across event types (operators/aggregates.py:"
    "levene_bf) — anova_f compares MEANS under an equal-variance "
    "assumption; this runs the same F machinery on absolute "
    "deviations from each group's MEDIAN (the robust 1974 variant), "
    "flagging heteroscedastic segments and gating pooled-variance "
    "use. Per-group medians are min-over-threshold order statistics "
    "on the domain-bounded cents-cell relation; deviations stay "
    "INTEGER via |2x - (m1+m2)| (the doubling cancels in F); then "
    "the identical cleared-denominator F pipeline as anova_f. One "
    "scan, one (type,cell) shuffle, bounded windows.",
)
def q_event_value_levene(spark, sf_dir):
    return agg.levene_bf(_t(spark, sf_dir, "events"), "event_type", "value")




@_q(
    "word_burstiness",
    r"""
WITH per_doc AS (
  SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        FROM documents)
  WHERE w <> ''
  GROUP BY 1, 2
),
words AS (
  SELECT w, CAST(sum(c) AS BIGINT) AS total_cnt,
         CAST(count(*) AS BIGINT) AS doc_freq,
         sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS q
  FROM per_doc GROUP BY 1
),
d AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents)
SELECT w AS word, total_cnt, doc_freq,
       round(CAST(CAST(nd AS HUGEINT) * q
                  - CAST(total_cnt AS HUGEINT) * CAST(total_cnt AS HUGEINT) AS DOUBLE)
             / CAST(CAST(nd AS HUGEINT) * CAST(total_cnt AS HUGEINT) AS DOUBLE), 6) AS fano
FROM words, d
ORDER BY total_cnt DESC, word ASC
LIMIT 20
""",
    doc="Church-Gale burstiness (per-document Fano factor) for the 20 "
    "most frequent corpus words (operators/textops.py:"
    "word_burstiness_topk) — separates evenly-spread function words "
    "(Fano ~ 1) from topical/bursty vocabulary (>> 1) and "
    "once-per-doc boilerplate tokens (< 1); the per-word companion "
    "to doc_repetition_stats for template detection. Closed form "
    "over zero-docs: var/mean = (D*Q - T^2)/(D*T) on exact "
    "DECIMAL/HUGEINT integers — no doc-spine densification; top-k "
    "via TakeOrdered heap, never a global sort.",
)
def q_word_burstiness(spark, sf_dir):
    return tx.word_burstiness_topk(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=20
    )


@_q(
    "doc_length_moments",
    """
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS s2,
         sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)
             * CAST(n_chars AS HUGEINT)) AS s3,
         sum(CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)
             * CAST(n_chars AS HUGEINT) * CAST(n_chars AS HUGEINT)) AS s4
  FROM documents WHERE n_chars IS NOT NULL
),
x AS (
  SELECT n_docs,
         CAST(s1 AS DOUBLE) / CAST(n_docs AS DOUBLE) AS mean,
         CAST(s2 AS DOUBLE) / CAST(n_docs AS DOUBLE) AS r2,
         CAST(s3 AS DOUBLE) / CAST(n_docs AS DOUBLE) AS r3,
         CAST(s4 AS DOUBLE) / CAST(n_docs AS DOUBLE) AS r4
  FROM m
),
y AS (
  SELECT n_docs, mean,
         r2 - mean * mean AS m2,
         r3 - CAST(3.0 AS DOUBLE) * mean * r2
            + CAST(2.0 AS DOUBLE) * mean * mean * mean AS m3,
         r4 - CAST(4.0 AS DOUBLE) * mean * r3
            + CAST(6.0 AS DOUBLE) * mean * mean * r2
            - CAST(3.0 AS DOUBLE) * mean * mean * mean * mean AS m4
  FROM x
)
SELECT n_docs,
       round(mean, 6) AS mean_len,
       CASE WHEN m2 > 0 THEN round(sqrt(m2), 6) END AS sd_len,
       CASE WHEN m2 > 0 THEN round(m3 / (m2 * sqrt(m2)), 6) END AS skewness,
       CASE WHEN m2 > 0 THEN round(m4 / (m2 * m2) - CAST(3.0 AS DOUBLE), 6) END AS excess_kurtosis
FROM y
""",
    doc="Four-moment shape profile of document lengths "
    "(operators/textops.py:doc_length_moments): mean, SD, skewness, "
    "excess kurtosis — the one-row audit behind length gates "
    "(natural corpora are right-skewed/heavy-tailed; near-zero skew "
    "flags truncation or templating, a kurtosis spike flags "
    "contamination at one length). Exact S1..S4 in DECIMAL/HUGEINT "
    "(len^4 passes int64 immediately); standardized moments are a "
    "FIXED documented IEEE sequence using sqrt (correctly rounded) "
    "instead of pow (not) — bit-identical replay. One scan, one "
    "1-row aggregate.",
)
def q_doc_length_moments(spark, sf_dir):
    return tx.doc_length_moments(_t(spark, sf_dir, "documents"), "n_chars")


@_q(
    "supplier_graph_clustering",
    "WITH "
    + KNN_EDGES_CTE
    + """,
deg AS (
  SELECT node, CAST(count(*) AS BIGINT) AS d FROM (
    SELECT a AS node FROM und UNION ALL SELECT b FROM und
  ) GROUP BY 1
),
wed AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         sum(CAST(d AS HUGEINT) * CAST(d AS HUGEINT) - CAST(d AS HUGEINT)) // 2 AS nw
  FROM deg
),
ec AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM und),
oriented AS (
  SELECT CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
              THEN u.a ELSE u.b END AS u,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
              THEN u.b ELSE u.a END AS v,
         CASE WHEN (da.d < db.d) OR (da.d = db.d AND u.a < u.b)
              THEN db.d ELSE da.d END AS dv
  FROM und u JOIN deg da ON u.a = da.node JOIN deg db ON u.b = db.node
),
wedges AS (
  SELECT e1.u, e1.v AS v1, e2.v AS v2
  FROM oriented e1 JOIN oriented e2 ON e1.u = e2.u
  WHERE (e1.dv < e2.dv) OR (e1.dv = e2.dv AND e1.v < e2.v)
),
tri AS (
  SELECT w.u FROM wedges w JOIN oriented o ON w.v1 = o.u AND w.v2 = o.v
),
tc AS (SELECT CAST(count(*) AS BIGINT) AS n_triangles FROM tri)
SELECT n_nodes, n_edges, n_triangles,
       CAST(nw AS BIGINT) AS n_wedges,
       CASE WHEN nw > 0 THEN
         round(CAST(3.0 AS DOUBLE) * CAST(n_triangles AS DOUBLE)
               / CAST(nw AS DOUBLE), 6) END AS c
FROM wed, ec, tc
""",
    doc="Global clustering coefficient (transitivity) of the supplier "
    "co-supply k-NN graph (operators/graph.py:global_clustering): "
    "C = 3*triangles/wedges — the cohesion number read next to "
    "degree assortativity before trusting community structure "
    "(C near random = incidental co-occurrence; C >> random = real "
    "communities worth clustering). Triangle mass reuses the "
    "degree-ordered compact-forward plan the triangle query "
    "verifies (O(m^1.5) bound); wedge mass is sum d(d-1)/2 over the "
    "degree relation in DECIMAL/HUGEINT; C is ONE double division "
    "of exact integers, NULL on wedge-free graphs.",
)
def q_supplier_graph_clustering(spark, sf_dir):
    knn = _supplier_knn_edges(spark, sf_dir)
    return graph.global_clustering(knn, "a", "b")


@_q(
    "nation_customer_pareto",
    """
WITH subs AS (
  SELECT n.n_name AS g, c.c_custkey AS e,
         CAST(sum(CAST(FLOOR(CAST(o.o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE o.o_totalprice IS NOT NULL
  GROUP BY 1, 2
),
ranked AS (
  SELECT g, e, s,
         CAST(row_number() OVER wo AS INT) AS rnk,
         CAST(sum(s) OVER (wo ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
         CAST(sum(s) OVER (PARTITION BY g) AS BIGINT) AS tot,
         CAST(count(*) OVER (PARTITION BY g) AS BIGINT) AS n
  FROM subs
  WINDOW wo AS (PARTITION BY g ORDER BY s DESC, e ASC)
),
m AS (
  SELECT g,
         CAST(max(n) AS BIGINT) AS n_entities,
         CAST(min(CASE WHEN CAST(cum AS HUGEINT) * 5 >= CAST(tot AS HUGEINT) * 4
                       THEN rnk END) AS BIGINT) AS n_top80,
         CAST(max(CASE WHEN rnk = CAST(FLOOR(CAST(n + 9 AS DOUBLE) / CAST(10.0 AS DOUBLE)) AS BIGINT)
                       THEN cum END) AS BIGINT) AS cum10,
         CAST(max(tot) AS BIGINT) AS tot
  FROM ranked GROUP BY 1
)
SELECT g AS n_name, n_entities, n_top80,
       round(CAST(n_top80 AS DOUBLE) / CAST(n_entities AS DOUBLE), 6) AS top80_fraction,
       CASE WHEN tot > 0 THEN
         round(CAST(cum10 AS DOUBLE) / CAST(tot AS DOUBLE), 6) END AS top_decile_share
FROM m ORDER BY n_name
""",
    doc="Pareto (ABC) concentration of customer spend per nation "
    "(operators/aggregates.py:pareto_by_group): how many customers "
    "cover 80% of revenue, and the top decile's share — the "
    "planner's reading next to Gini (inequality) and HHI "
    "(dominance). Deterministic (spend desc, custkey asc) total "
    "order; the 80% cut is the INTEGER predicate 5*cumsum >= "
    "4*total in DECIMAL/HUGEINT (no float threshold); windows run "
    "over the per-nation ENTITY relation (gini_by_group pattern — "
    "swap in scalable_ranks for unbounded groups).",
)
def q_nation_customer_pareto(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    j = o.join(
        c, o["o_custkey"] == c["c_custkey"]
    ).join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
    return agg.pareto_by_group(j, "n_name", "c_custkey", "o_totalprice")


@_q(
    "event_interarrival_burstiness",
    """
WITH gaps AS (
  SELECT event_type AS g,
         epoch_us(ts) - lag(epoch_us(ts)) OVER (
           PARTITION BY event_type, user_id ORDER BY ts, event_id) AS gap
  FROM events
),
m AS (
  SELECT g, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap) AS BIGINT) AS s,
         sum(CAST(gap AS HUGEINT) * CAST(gap AS HUGEINT)) AS q
  FROM gaps WHERE gap IS NOT NULL GROUP BY 1
)
SELECT g AS event_type, n_gaps,
       round(CAST(s AS DOUBLE) / CAST(n_gaps AS DOUBLE) / CAST(1000000.0 AS DOUBLE), 6) AS mean_gap_s,
       CASE WHEN s > 0
                 AND CAST(CAST(n_gaps AS HUGEINT) * q - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS DOUBLE) >= 0 THEN
         round((sqrt(CAST(CAST(n_gaps AS HUGEINT) * q - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS DOUBLE))
                - CAST(s AS DOUBLE))
               / (sqrt(CAST(CAST(n_gaps AS HUGEINT) * q - CAST(s AS HUGEINT) * CAST(s AS HUGEINT) AS DOUBLE))
                  + CAST(s AS DOUBLE)), 6) END AS burstiness
FROM m ORDER BY event_type
""",
    doc="Goh-Barabási burstiness B = (sigma-mu)/(sigma+mu) of "
    "per-user inter-arrival times per event type "
    "(operators/behavior.py:interarrival_burstiness) — the "
    "gap-level companion to the daily-count Fano factor: B = -1 "
    "periodic, ~0 Poisson, ->1 extreme bursts (human-dynamics "
    "diagnostic for retry storms vs organic traffic). Per-user gaps "
    "keep the window partitioned by fine-grained (type,user) keys — "
    "never a per-type global sort; exact integer MICROsecond gaps; "
    "B simplifies to (sqrt(nQ-S^2)-S)/(sqrt(nQ-S^2)+S) on exact "
    "DECIMAL/HUGEINT moments — the n cancels, one sqrt.",
)
def q_event_interarrival_burstiness(spark, sf_dir):
    from .operators import behavior as bh

    return bh.interarrival_burstiness(_t(spark, sf_dir, "events"))




@_q(
    "event_value_quantile_shift",
    """
WITH cells AS (
  SELECT CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS BIGINT) AS tb
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT v,
         CAST(sum(ta) OVER w AS BIGINT) AS ca,
         CAST(sum(tb) OVER w AS BIGINT) AS cb
  FROM cells
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (SELECT CAST(max(ca) AS BIGINT) AS n_a, CAST(max(cb) AS BIGINT) AS n_b FROM cum),
dc AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS decile),
j AS (SELECT c.v, c.ca, c.cb, t.n_a, t.n_b, d.decile FROM cum c, tot t, dc d),
sel AS (
  SELECT decile,
         min(CASE WHEN n_a > 0 AND ca >= CAST(FLOOR(CAST(decile * n_a + 9 AS DOUBLE) / CAST(10.0 AS DOUBLE)) AS BIGINT)
                  THEN v END) AS qa,
         min(CASE WHEN n_b > 0 AND cb >= CAST(FLOOR(CAST(decile * n_b + 9 AS DOUBLE) / CAST(10.0 AS DOUBLE)) AS BIGINT)
                  THEN v END) AS qb
  FROM j GROUP BY 1
)
SELECT decile,
       round(CAST(qa AS DOUBLE) / CAST(100.0 AS DOUBLE), 6) AS q_early,
       round(CAST(qb AS DOUBLE) / CAST(100.0 AS DOUBLE), 6) AS q_late,
       round(CAST(qb - qa AS DOUBLE) / CAST(100.0 AS DOUBLE), 6) AS shift
FROM sel ORDER BY decile
""",
    doc="Per-decile Q-Q shift profile of event values, early vs late "
    "window (operators/timeseries.py:quantile_shift_profile) — the "
    "WHERE-in-the-distribution companion to the drift battery: KS "
    "says the CDFs differ, PSI says how much, this says WHICH "
    "deciles moved (tail-only vs uniform location shifts have "
    "identical KS but opposite fixes). Both windows' order "
    "statistics come from ONE shared domain-bounded cents-cell "
    "relation; ranks are the INTEGER ceil(k*n/10) = "
    "floor((k*n+9)/10) — no float ranks; selection is "
    "min-over-threshold on each window's running total; the decile "
    "spine is a literal bounded Range.",
)
def q_event_value_quantile_shift(spark, sf_dir):
    return ts_ops.quantile_shift_profile(
        _t(spark, sf_dir, "events"), "ts", "value", "2024-01-16"
    )


@_q(
    "centroid_margin_eval",
    """
WITH cent AS (
  SELECT label AS cell, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
  GROUP BY 1, 2
),
cvec AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM cent GROUP BY cell
),
scored AS (
  SELECT e.vec_id, c.cell,
         round((CASE WHEN (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.centroid[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) > 0 THEN (list_sum(list_transform(generate_series(1, 64), i -> CAST(c.centroid[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) / ((sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.centroid[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))))) END), 6) AS s
  FROM embeddings e, cvec c
),
ranked AS (
  SELECT vec_id, cell, s,
         row_number() OVER (PARTITION BY vec_id ORDER BY s DESC, cell DESC) AS rn
  FROM scored
),
per_vec AS (
  SELECT vec_id,
         max(CASE WHEN rn = 1 THEN cell END) AS label,
         max(CASE WHEN rn = 1 THEN s END) AS a,
         max(CASE WHEN rn = 2 THEN s END) AS b
  FROM ranked WHERE rn <= 2 GROUP BY 1
),
m AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n_vectors,
         sum(CAST(a AS DECIMAL(27,6))) AS sa,
         sum(CAST(b AS DECIMAL(27,6))) AS sb,
         CAST(count(b) AS BIGINT) AS nb
  FROM per_vec GROUP BY 1
)
SELECT label, n_vectors,
       round(CAST(sa AS DOUBLE) / CAST(n_vectors AS DOUBLE), 6) AS mean_cohesion,
       CASE WHEN nb = n_vectors THEN
         round(CAST(sb AS DOUBLE) / CAST(n_vectors AS DOUBLE), 6) END AS mean_second_best,
       CASE WHEN nb = n_vectors THEN
         round(CAST(sa - sb AS DOUBLE) / CAST(n_vectors AS DOUBLE), 6) END AS mean_margin
FROM m ORDER BY label
""",
    doc="Per-cluster separation audit of the trained centroids "
    "(operators/similarity.py:centroid_margin_audit) — the "
    "centroid-based silhouette reading for the k-means/IVF tier: "
    "per vector, cohesion = cosine to its best centroid and "
    "separation = cosine to the runner-up; per label, mean a, mean "
    "b, mean margin. Margin near 0 = arbitrary boundary (IVF must "
    "widen probes, assignments churn); wide margin justifies "
    "single-probe routing — the eval companion to "
    "centroid_assignments the way minhash_recall_eval is to LSH. "
    "Scores rounded BEFORE ranking (argmax identical across engines "
    "at 1-ulp raw differences); DECIMAL-accumulated means; "
    "broadcast fan-out + per-vector rank window, no big-side "
    "shuffle.",
)
def q_centroid_margin_eval(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    cents = sim.train_centroids_by_label(emb)
    return sim.centroid_margin_audit(emb, cents)




@_q(
    "daily_count_hurst",
    """
WITH c AS (
  SELECT CAST(ts AS DATE) AS date, count(*) AS cnt FROM events GROUP BY 1
),
span AS (SELECT min(date) AS lo, max(date) AS hi FROM c),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS date
  FROM span
),
s AS (
  SELECT spine.date, coalesce(c.cnt, 0) AS cnt
  FROM spine LEFT JOIN c ON spine.date = c.date
),
base AS (
  SELECT CAST(cnt AS BIGINT) AS x,
         CAST(row_number() OVER (ORDER BY date) AS BIGINT) AS rn
  FROM s
),
tot AS (SELECT CAST(max(rn) AS BIGINT) AS n_days FROM base),
sz AS (SELECT CAST(unnest([4, 8, 16, 32, 64]) AS BIGINT) AS m),
j AS (
  SELECT b.x, b.rn, z.m, t.n_days,
         CAST(FLOOR(CAST(b.rn - 1 AS DOUBLE) / CAST(z.m AS DOUBLE)) AS BIGINT) AS block
  FROM base b, sz z, tot t
),
j2 AS (
  SELECT x, rn, m, n_days, block, rn - block * m AS t
  FROM j
  WHERE block < CAST(FLOOR(CAST(n_days AS DOUBLE) / CAST(m AS DOUBLE)) AS BIGINT)
),
cum AS (
  SELECT m, block, n_days, rn, t, x,
         sum(x) OVER (PARTITION BY m, block ORDER BY rn
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumx,
         CAST(sum(x) OVER (PARTITION BY m, block) AS BIGINT) AS s1,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT))
           OVER (PARTITION BY m, block) AS q
  FROM j2
),
zrel AS (
  SELECT m, block, n_days, m * cumx - t * s1 AS zv, s1, q FROM cum
),
blocks AS (
  SELECT m, block,
         CAST(max(zv) - min(zv) AS BIGINT) AS r_m,
         CAST(max(m) AS HUGEINT) * max(q)
           - CAST(max(s1) AS HUGEINT) * CAST(max(s1) AS HUGEINT) AS d,
         CAST(max(n_days) AS BIGINT) AS n_days
  FROM zrel GROUP BY 1, 2
),
rsr AS (
  SELECT m, n_days,
         CASE WHEN d > 0 THEN
           round(CAST(r_m AS DOUBLE) / sqrt(CAST(d AS DOUBLE)), 6) END AS rs
  FROM blocks
),
per_size AS (
  SELECT m, CAST(max(n_days) AS BIGINT) AS n_days,
         CAST(count(*) AS BIGINT) AS n_blocks,
         round(CAST(sum(CAST(rs AS DECIMAL(27,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS avg_rs
  FROM rsr WHERE rs IS NOT NULL GROUP BY 1
),
pts AS (
  SELECT n_days,
         round(ln(CAST(m AS DOUBLE)), 6) AS lx,
         round(ln(avg_rs), 6) AS ly
  FROM per_size WHERE avg_rs > 0
),
ols AS (
  SELECT n_days, CAST(count(*) AS BIGINT) AS n_sizes,
         sum(CAST(lx AS DECIMAL(27,6))) AS sx,
         sum(CAST(ly AS DECIMAL(27,6))) AS sy,
         sum(CAST(round(lx * ly, 6) AS DECIMAL(27,6))) AS sxy,
         sum(CAST(round(lx * lx, 6) AS DECIMAL(27,6))) AS sxx
  FROM pts GROUP BY 1
)
SELECT n_days, n_sizes,
       CASE WHEN n_sizes > 1
                 AND (CAST(n_sizes AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) <> 0 THEN
         round((CAST(n_sizes AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n_sizes AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) END AS hurst
FROM ols
""",
    doc="Hurst exponent of the daily event-count series via classical "
    "rescaled-range analysis (operators/timeseries.py:"
    "hurst_rs_daily) — the long-memory member completing the "
    "temporal tier: ACF reads fixed-lag rhythm, CUSUM finds breaks, "
    "H reads persistence across ALL horizons (0.5 memoryless, >0.5 "
    "trending, <0.5 mean-reverting; Hurst 1951). Denominators clear "
    "inside each block (m*Z_t = m*cumsum - t*S1 integer, R*m exact; "
    "S via sqrt(m*Q - S1^2) on DECIMAL/HUGEINT), one division+sqrt "
    "per block 6dp; block means and the <= 5-point ln-ln OLS use "
    "the rounded-term DECIMAL(27,6) pattern. Everything lives on "
    "the calendar-bounded daily relation x a literal size spine.",
)
def q_daily_count_hurst(spark, sf_dir):
    return ts_ops.hurst_rs_daily(_t(spark, sf_dir, "events"), "ts")




@_q(
    "priority_status_mutual_info",
    """
WITH cells AS (
  SELECT o_orderpriority AS a, o_orderstatus AS b, CAST(count(*) AS BIGINT) AS o
  FROM orders GROUP BY 1, 2
),
sized AS (
  SELECT o,
         CAST(sum(o) OVER (PARTITION BY a) AS BIGINT) AS n_a,
         CAST(sum(o) OVER (PARTITION BY b) AS BIGINT) AS n_b,
         CAST(sum(o) OVER () AS BIGINT) AS n
  FROM cells
),
mirel AS (
  SELECT n,
         sum(CAST(round((CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
                        * ln(CAST(CAST(n AS HUGEINT) * CAST(o AS HUGEINT) AS DOUBLE)
                             / CAST(CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) AS DOUBLE)), 6)
                  AS DECIMAL(27,6))) AS miv
  FROM sized GROUP BY 1
),
ma AS (SELECT a, CAST(sum(o) AS BIGINT) AS n_a FROM cells GROUP BY 1),
mb AS (SELECT b, CAST(sum(o) AS BIGINT) AS n_b FROM cells GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
ha AS (
  SELECT sum(CAST(round((CAST(n_a AS DOUBLE) / CAST(t.n AS DOUBLE))
                        * ln(CAST(t.n AS DOUBLE) / CAST(n_a AS DOUBLE)), 6)
                  AS DECIMAL(27,6))) AS hav
  FROM ma, tot t
),
hb AS (
  SELECT sum(CAST(round((CAST(n_b AS DOUBLE) / CAST(t.n AS DOUBLE))
                        * ln(CAST(t.n AS DOUBLE) / CAST(n_b AS DOUBLE)), 6)
                  AS DECIMAL(27,6))) AS hbv
  FROM mb, tot t
)
SELECT m.n AS n_rows,
       round(CAST(hav AS DOUBLE), 6) AS h_a,
       round(CAST(hbv AS DOUBLE), 6) AS h_b,
       round(CAST(miv AS DOUBLE), 6) AS mi,
       CASE WHEN CAST(hav + hbv AS DOUBLE) > 0 THEN
         round(CAST(2.0 AS DOUBLE) * CAST(miv AS DOUBLE) / CAST(hav + hbv AS DOUBLE), 6)
       END AS theils_u
FROM mirel m, ha, hb
""",
    doc="Mutual information (nats) and symmetric Theil's U between "
    "order priority and status (operators/aggregates.py:"
    "mutual_info) — the information-theoretic member of the "
    "association tier: chi2/V score deviation from independence, MI "
    "scores shared information, U = 2*MI/(H_a+H_b) normalizes to "
    "[0,1] — the number feature selection ranks categorical "
    "predictors by. Zero cells contribute 0 (no spine needed, "
    "unlike chi2); each term has ONE ln on a ratio of exact "
    "DECIMAL/HUGEINT integer products, 6dp-rounded then "
    "DECIMAL(27,6)-summed; entropies use the same pattern over the "
    "marginal relations.",
)
def q_priority_status_mutual_info(spark, sf_dir):
    return agg.mutual_info(
        _t(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


@_q(
    "benford_price_conformity",
    """
WITH per AS (
  SELECT CAST(substr(CAST(CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS VARCHAR), 1, 1) AS INT) AS digit,
         CAST(count(*) AS BIGINT) AS n_obs
  FROM orders WHERE o_totalprice IS NOT NULL AND o_totalprice > 0
  GROUP BY 1
),
spine AS (SELECT CAST(unnest(generate_series(1, 9)) AS INT) AS digit),
cells AS (
  SELECT s.digit, CAST(coalesce(p.n_obs, 0) AS BIGINT) AS o
  FROM spine s LEFT JOIN per p ON s.digit = p.digit
),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cells),
terms AS (
  SELECT n,
         round((CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * round(log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)), 6))
               * (CAST(o AS DOUBLE) - CAST(n AS DOUBLE) * round(log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)), 6))
               / (CAST(n AS DOUBLE) * round(log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)), 6)), 6) AS chit,
         round(abs(CAST(o AS DOUBLE) / CAST(n AS DOUBLE)
                   - round(log10(CAST(1.0 AS DOUBLE) + CAST(1.0 AS DOUBLE) / CAST(digit AS DOUBLE)), 6)), 6) AS devt
  FROM cells, tot
)
SELECT n AS n_obs,
       round(CAST(sum(CAST(chit AS DECIMAL(27,6))) AS DOUBLE), 6) AS chi2,
       round(CAST(sum(CAST(devt AS DECIMAL(27,6))) AS DOUBLE) / CAST(9.0 AS DOUBLE), 6) AS mad
FROM terms GROUP BY 1
""",
    doc="Benford conformity verdict over the first-digit screen "
    "(operators/quality.py:benford_conformity): chi-square "
    "goodness-of-fit vs the Benford expectation plus Nigrini's Mean "
    "Absolute Deviation (the audit thresholds: MAD < 0.006 close, "
    "> 0.015 nonconforming) — benford_price_audit shows WHERE the "
    "digits deviate, this says WHETHER the column passes. Full "
    "9-digit spine (absent digits contribute their whole expected "
    "mass); expected shares one log10 per digit 6dp-rounded (the "
    "screen's literal sequence); chi2/MAD terms rounded then "
    "DECIMAL(27,6)-summed. Scan-bound.",
)
def q_benford_price_conformity(spark, sf_dir):
    return dq.benford_conformity(
        _t(spark, sf_dir, "orders"), "o_totalprice"
    )


@_q(
    "daily_count_runs_test",
    """
WITH c AS (
  SELECT CAST(ts AS DATE) AS date, count(*) AS cnt FROM events GROUP BY 1
),
span AS (SELECT min(date) AS lo, max(date) AS hi FROM c),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP), CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS date
  FROM span
),
s AS (
  SELECT spine.date, coalesce(c.cnt, 0) AS cnt
  FROM spine LEFT JOIN c ON spine.date = c.date
),
d AS (SELECT date, cnt, lag(cnt) OVER (ORDER BY date) AS prev FROM s),
signs AS (
  SELECT date, CASE WHEN cnt > prev THEN 1 ELSE -1 END AS sgn
  FROM d WHERE prev IS NOT NULL AND cnt <> prev
),
runs AS (
  SELECT sgn,
         CASE WHEN lag(sgn) OVER (ORDER BY date) IS NULL
                   OR sgn <> lag(sgn) OVER (ORDER BY date)
              THEN 1 ELSE 0 END AS new_run
  FROM signs
),
m AS (
  SELECT CAST(sum(CASE WHEN sgn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
         CAST(sum(CASE WHEN sgn = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down,
         CAST(sum(new_run) AS BIGINT) AS n_runs
  FROM runs
),
x AS (
  SELECT n_up, n_down, n_runs,
         CAST(2 * CAST(n_up AS HUGEINT) * CAST(n_down AS HUGEINT) AS DOUBLE) AS t2,
         CAST(n_up AS DOUBLE) + CAST(n_down AS DOUBLE) AS nn
  FROM m
)
SELECT n_up, n_down, n_runs,
       CASE WHEN n_up > 0 AND n_down > 0
                 AND t2 * (t2 - nn) / (nn * nn * (nn - CAST(1.0 AS DOUBLE))) > 0 THEN
         round((CAST(n_runs AS DOUBLE) - (t2 / nn + CAST(1.0 AS DOUBLE)))
               / sqrt(t2 * (t2 - nn) / (nn * nn * (nn - CAST(1.0 AS DOUBLE)))), 6)
       END AS z
FROM x
""",
    doc="Wald-Wolfowitz runs test on day-over-day count direction "
    "(operators/timeseries.py:daily_runs_test) — the randomness "
    "check closing the temporal tier from the other side: ACF/Hurst "
    "measure how much structure; the runs test asks whether the "
    "up/down sequence beats coin flips at all (too few runs = "
    "momentum, too many = oscillation). Signs from integer "
    "differences on the gap-filled daily relation (zero-change days "
    "excluded, the standard convention); run count = 1 + sign "
    "flips; mu/sigma fixed IEEE sequences on exact integer counts, "
    "NULL-guarded one-sided series.",
)
def q_daily_count_runs_test(spark, sf_dir):
    return ts_ops.daily_runs_test(_t(spark, sf_dir, "events"), "ts")


@_q(
    "tfidf_doc_similarity",
    r"""
WITH tf AS (
  SELECT doc_id AS id, t, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS t
        FROM documents)
  WHERE t <> '' GROUP BY 1, 2
),
dfreq AS (SELECT t, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
nd AS (SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n FROM documents),
banded AS (
  SELECT tf.id, tf.t,
         round(CAST(tf.tf AS DOUBLE) * ln(CAST(nd.n AS DOUBLE) / CAST(d.df AS DOUBLE)), 6) AS w
  FROM tf JOIN dfreq d ON tf.t = d.t, nd
  WHERE d.df BETWEEN 2 AND 100
),
norms AS (
  SELECT id, sqrt(CAST(sum(CAST(round(w * w, 6) AS DECIMAL(27,6))) AS DOUBLE)) AS nrm
  FROM banded GROUP BY 1
),
dots AS (
  SELECT a.id AS doc_a, b.id AS doc_b,
         CAST(count(*) AS BIGINT) AS n_shared_terms,
         CAST(sum(CAST(round(a.w * b.w, 6) AS DECIMAL(27,6))) AS DOUBLE) AS dot
  FROM banded a JOIN banded b ON a.t = b.t AND a.id < b.id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, n_shared_terms,
       CASE WHEN na.nrm > 0 AND nb.nrm > 0 THEN
         round(dot / (na.nrm * nb.nrm), 6) END AS cosine
FROM dots
JOIN norms na ON dots.doc_a = na.id
JOIN norms nb ON dots.doc_b = nb.id
ORDER BY cosine DESC, doc_a ASC, doc_b ASC
LIMIT 20
""",
    doc="Top-20 most similar document pairs by TF-IDF cosine over an "
    "inverted-index self-join (operators/textops.py:"
    "tfidf_doc_similarity_topk) — the lexical doc-doc member the "
    "retrieval tier lacked: BM25 scores query-vs-docs, dedup finds "
    "near-copies, TF-IDF cosine finds TOPICALLY similar pairs "
    "sharing distinctive vocabulary without shared n-grams. Pair "
    "generation is the postings join ON TERM inside the df band "
    "[2, 100] (hapax can't pair; stop-terms would blow the join "
    "quadratically and carry ~0 idf — the measured stop-shingle cap "
    "move); dot/norm terms 6dp-rounded then DECIMAL-summed; top-k "
    "by (cosine desc, pair asc) TakeOrdered heap.",
)
def q_tfidf_doc_similarity(spark, sf_dir):
    return tx.tfidf_doc_similarity_topk(
        _t(spark, sf_dir, "documents"), "doc_id", "text", k=20
    )


@_q(
    "ann_rank_quality",
    """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
cent AS (
  SELECT label AS cell, i AS pos,
         round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS m
  FROM embeddings, (SELECT unnest(generate_series(1, 64)) AS i) g
  GROUP BY 1, 2
),
cvec AS (
  SELECT cell, list(m ORDER BY pos) AS centroid FROM cent GROUP BY cell
),
route AS (
  SELECT qid, qv, cell FROM (
    SELECT q.qid, q.qv, c.cell,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round((CASE WHEN (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.centroid[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))) > 0 THEN (list_sum(list_transform(generate_series(1, 64), i -> CAST(c.centroid[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) / ((sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.centroid[i] AS DOUBLE) * CAST(c.centroid[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))) END), 6) DESC,
                      c.cell ASC) AS rn
    FROM q, cvec c
  ) WHERE rn <= 1
),
ivf AS (
  SELECT qid, vec_id, rn AS pos FROM (
    SELECT r.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY r.qid
             ORDER BY round((CASE WHEN (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(r.qv[i] AS DOUBLE) * CAST(r.qv[i] AS DOUBLE))))) > 0 THEN (list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(r.qv[i] AS DOUBLE)))) / ((sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(r.qv[i] AS DOUBLE) * CAST(r.qv[i] AS DOUBLE)))))) END), 6) DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e JOIN route r ON e.label = r.cell
  ) WHERE rn <= 10
),
brute AS (
  SELECT qid, vec_id, rn AS exact_rank FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round((CASE WHEN (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))) > 0 THEN (list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) / ((sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))) END), 6) DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e, q
  ) WHERE rn <= 10
),
joined AS (
  SELECT i.qid, i.pos, b.exact_rank
  FROM ivf i LEFT JOIN brute b ON i.qid = b.qid AND i.vec_id = b.vec_id
),
per AS (
  SELECT qid,
         sum(CAST(round((CASE WHEN exact_rank IS NOT NULL
                              THEN CAST(10 - exact_rank + 1 AS DOUBLE)
                              ELSE CAST(0.0 AS DOUBLE) END)
                        / log2(CAST(pos + 1 AS DOUBLE)), 6)
                  AS DECIMAL(27,6))) AS dcg,
         min(CASE WHEN exact_rank = 1 THEN pos END) AS first_pos
  FROM joined GROUP BY 1
),
ideal AS (
  SELECT sum(CAST(round(CAST(10 - i + 1 AS DOUBLE) / log2(CAST(i + 1 AS DOUBLE)), 6)
                  AS DECIMAL(27,6))) AS idcg
  FROM (SELECT CAST(unnest(generate_series(1, 10)) AS BIGINT) AS i)
)
SELECT q.qid,
       round(coalesce(CAST(p.dcg AS DOUBLE), CAST(0.0 AS DOUBLE))
             / CAST(ideal.idcg AS DOUBLE), 6) AS ndcg_at_10,
       round(CASE WHEN p.first_pos IS NOT NULL
                  THEN CAST(1.0 AS DOUBLE) / CAST(p.first_pos AS DOUBLE)
                  ELSE CAST(0.0 AS DOUBLE) END, 6) AS reciprocal_rank
FROM q LEFT JOIN per p ON q.qid = p.qid, ideal
""",
    doc="Rank-quality eval of the IVF path vs the exact top-10: "
    "nDCG@10 (graded by exact-rank relevance k-r+1) and reciprocal "
    "rank of the true best neighbor, per query "
    "(operators/similarity.py:ann_rank_quality_eval) — the "
    "ORDER-aware companion to ann_recall_eval: recall treats the "
    "returned set as a bag; a stack feeding a reranker needs the "
    "right items EARLY. Both arms reuse the serving operators with "
    "positions re-derived by the identical (rounded score desc, id "
    "asc) window; each DCG term has ONE log2 on an exact integer, "
    "6dp-rounded then DECIMAL-summed; the ideal DCG is a literal "
    "1..k Range with the same pattern.",
)
def q_ann_rank_quality(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    corpus = emb.withColumnRenamed("label", "cell")
    cents = sim.train_centroids_by_label(emb)
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return sim.ann_rank_quality_eval(corpus, cents, qs, k=10, nprobe=1)




@_q(
    "quality_score_auc",
    r"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\s+') AS toks,
         string_split(text, chr(10)) AS lines,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(regexp_extract_all(text, '#')) AS INT)
           + CAST(len(regexp_extract_all(text, '(\.\.\.|…)')) AS INT) AS n_sym
  FROM documents
),
g AS (
  SELECT doc_id,
         (CAST(len(toks) AS INT) BETWEEN 50 AND 100000
          AND round(CAST(n_chars - (len(toks) - 1) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE), 6) BETWEEN 3.0 AND 10.0
          AND round(CAST(n_sym AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) <= 0.1
          AND round(CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
                    / CAST(len(lines) AS DOUBLE), 6) <= 0.9
          AND round(CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
                    / CAST(len(lines) AS DOUBLE), 6) <= 0.3
          AND round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE), 6) >= 0.8
          AND CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS INT) >= 2
         ) AS y
  FROM base
),
q AS (
  SELECT doc_id,
         round(least(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
                 / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE), 6) * 0.3
               + (1.0 - least(round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE), 6) * 10, 1.0)) * 0.2,
               6) AS s
  FROM documents
),
sl AS (
  SELECT q.doc_id, q.s, CASE WHEN coalesce(g.y, false) THEN 1 ELSE 0 END AS y
  FROM q JOIN g USING (doc_id)
),
cells AS (
  SELECT s, CAST(count(*) AS BIGINT) AS t, CAST(sum(y) AS BIGINT) AS t_pos
  FROM sl GROUP BY 1
),
ranked AS (
  SELECT s, t, t_pos,
         COALESCE(CAST(sum(t - t_pos) OVER (ORDER BY s
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0) AS cb
  FROM cells
),
m AS (
  SELECT CAST(sum(t_pos) AS BIGINT) AS n_pos,
         CAST(sum(t) - sum(t_pos) AS BIGINT) AS n_neg,
         sum(CAST(t_pos AS HUGEINT)
             * (2 * CAST(cb AS HUGEINT) + CAST(t - t_pos AS HUGEINT))) AS u2
  FROM ranked
)
SELECT n_pos, n_neg,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round(CAST(u2 AS DOUBLE) / CAST(2.0 AS DOUBLE)
               / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)), 6) END AS auc,
       CASE WHEN n_pos > 0 AND n_neg > 0 THEN
         round(CAST(2.0 AS DOUBLE)
               * (CAST(u2 AS DOUBLE) / CAST(2.0 AS DOUBLE)
                  / (CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)))
               - CAST(1.0 AS DOUBLE), 6) END AS gini
FROM m

""",
    doc="ROC-AUC and accuracy-ratio Gini of the heuristic quality "
    "score against the Gopher rule gate (operators/quality.py:"
    "score_label_auc) — the ranking-power member of the classifier-"
    "eval battery: kappa (quality_gate_kappa) scores hard-gate "
    "agreement; AUC asks whether thresholding the SOFT score can "
    "ever reproduce the gate (0.5 = no signal). AUC IS Mann-Whitney "
    "probability of superiority — the drift tier's rank-sum "
    "machinery aimed at labels: 6dp scores bound the distinct-cell "
    "relation, average-rank tie handling in exact DECIMAL/HUGEINT, "
    "ONE division.",
)
def q_quality_score_auc(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    g = tx.gopher_quality_flags(docs).select("doc_id", "passes_gopher")
    q = tx.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    j = q.join(g, "doc_id")
    return dq.score_label_auc(j, "quality_score", F.col("passes_gopher"))


@_q(
    "quality_score_lift",
    r"""
WITH base AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\s+') AS toks,
         string_split(text, chr(10)) AS lines,
         CAST(length(text) AS INT) AS n_chars,
         CAST(len(regexp_extract_all(text, '#')) AS INT)
           + CAST(len(regexp_extract_all(text, '(\.\.\.|…)')) AS INT) AS n_sym
  FROM documents
),
g AS (
  SELECT doc_id,
         (CAST(len(toks) AS INT) BETWEEN 50 AND 100000
          AND round(CAST(n_chars - (len(toks) - 1) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE), 6) BETWEEN 3.0 AND 10.0
          AND round(CAST(n_sym AS DOUBLE) / CAST(len(toks) AS DOUBLE), 6) <= 0.1
          AND round(CAST(len(list_filter(lines, l -> regexp_matches(l, '^\s*[-*•]'))) AS DOUBLE)
                    / CAST(len(lines) AS DOUBLE), 6) <= 0.9
          AND round(CAST(len(list_filter(lines, l -> regexp_matches(l, '(\.\.\.|…)\s*$'))) AS DOUBLE)
                    / CAST(len(lines) AS DOUBLE), 6) <= 0.3
          AND round(CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS DOUBLE)
                    / CAST(len(toks) AS DOUBLE), 6) >= 0.8
          AND CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS INT) >= 2
         ) AS y
  FROM base
),
q AS (
  SELECT doc_id,
         round(least(CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE) / 100.0, 1.0) * 0.5
               + round(CAST(len(list_filter(string_split_regex(trim(lower(text)), '\s+'),
                    t -> t IN ('the', 'a', 'of', 'and', 'to', 'in', 'is', 'it'))) AS DOUBLE)
                 / CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS DOUBLE), 6) * 0.3
               + (1.0 - least(round(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\s]')) AS DOUBLE)
                 / CAST(length(text) AS DOUBLE), 6) * 10, 1.0)) * 0.2,
               6) AS s
  FROM documents
),
sl AS (
  SELECT q.doc_id, q.s, CASE WHEN coalesce(g.y, false) THEN 1 ELSE 0 END AS y
  FROM q JOIN g USING (doc_id)
),
ranked AS (
  SELECT doc_id, s, y,
         CAST(row_number() OVER (ORDER BY s DESC, doc_id ASC) AS BIGINT) AS rn,
         CAST(count(*) OVER () AS BIGINT) AS n
  FROM sl
),
binned AS (
  SELECT CAST(FLOOR(CAST((rn - 1) * 10 AS DOUBLE) / CAST(n AS DOUBLE)) + 1 AS INT) AS decile, y
  FROM ranked
),
per AS (
  SELECT decile, CAST(count(*) AS BIGINT) AS n_rows, CAST(sum(y) AS BIGINT) AS n_pos
  FROM binned GROUP BY 1
),
tot AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n, CAST(sum(n_pos) AS BIGINT) AS p FROM per),
j AS (
  SELECT per.decile, per.n_rows, per.n_pos, t.n, t.p,
         CAST(sum(per.n_pos) OVER (ORDER BY per.decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos
  FROM per, tot t
)
SELECT decile, n_rows, n_pos,
       round(CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS pos_rate,
       CASE WHEN p > 0 THEN round(CAST(cum_pos AS DOUBLE) / CAST(p AS DOUBLE), 6) END AS cum_recall,
       CASE WHEN p > 0 THEN
         round((CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE))
               / (CAST(p AS DOUBLE) / CAST(n AS DOUBLE)), 6) END AS lift
FROM j ORDER BY decile

""",
    doc="Decile gains/lift table of the quality score against the "
    "Gopher gate (operators/quality.py:score_lift_table) — the "
    "operational companion to AUC: what a capacity-constrained "
    "curation queue gets (review the top decile, catch cum_recall "
    "of gate-passers at lift x the base rate). Deterministic "
    "deciles: (score desc, doc_id asc) total order, INTEGER "
    "floor((rn-1)*10/n)+1 bins — no float ntile; exact counts; "
    "fixed IEEE rates. The global row_number runs over the scored "
    "relation (swap in windows.scalable_ranks past single-window "
    "scale — the documented unbounded-order path).",
)
def q_quality_score_lift(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    g = tx.gopher_quality_flags(docs).select("doc_id", "passes_gopher")
    q = tx.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    j = q.join(g, "doc_id")
    return dq.score_lift_table(
        j, "doc_id", "quality_score", F.col("passes_gopher")
    )




def _oracle_of(name: str) -> str:
    return next(s.oracle for s in _REGISTRY if s.name == name)


@_q(
    "quality_score_lift_scalable",
    _oracle_of("quality_score_lift"),
    doc="quality_score_lift WITHOUT the global row_number window "
    "(operators/quality.py:score_lift_table_scalable over "
    "windows.scalable_unique_ranks): per-score hash-agg -> range "
    "partition -> local cumulative counts -> ONE bounded "
    "per-partition subtotal collect -> broadcast offsets -> small "
    "tie-group windows. The scale path score_lift_table's docstring "
    "promises, shipped as a registry row that SHARES the baseline's "
    "oracle verbatim — every sweep proves the two plans produce the "
    "identical gains table, the order_price_rank_scalable pattern "
    "applied to the classifier-eval tier.",
)
def q_quality_score_lift_scalable(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    g = tx.gopher_quality_flags(docs).select("doc_id", "passes_gopher")
    q = tx.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    j = q.join(g, "doc_id")
    return dq.score_lift_table_scalable(
        j, "doc_id", "quality_score", F.col("passes_gopher")
    )


@_q(
    "event_value_wasserstein",
    """
WITH cells AS (
  SELECT CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS BIGINT) AS tb
  FROM events WHERE value IS NOT NULL GROUP BY 1
),
cum AS (
  SELECT v,
         CAST(sum(ta) OVER w AS BIGINT) AS ca,
         CAST(sum(tb) OVER w AS BIGINT) AS cb,
         lead(v) OVER (ORDER BY v) AS nxt
  FROM cells
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (
  SELECT CAST(sum(ta) AS BIGINT) AS n_a, CAST(sum(tb) AS BIGINT) AS n_b
  FROM cells
),
s AS (
  SELECT coalesce(sum(abs(CAST(c.ca AS HUGEINT) * t.n_b
                          - CAST(c.cb AS HUGEINT) * t.n_a)
                      * CAST(c.nxt - c.v AS HUGEINT)),
                  0) AS sw
  FROM cum c, tot t WHERE c.nxt IS NOT NULL
)
SELECT n_a, n_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         round(CAST(sw AS DOUBLE)
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) * 100.0), 6) END
         AS w1
FROM tot, s
""",
    doc="1-D Wasserstein-1 (earth-mover) distance early-vs-late "
    "(operators/timeseries.py:wasserstein_drift) — the MAGNITUDE "
    "member completing the drift battery: KS caps the CDF gap but a "
    "1-cent and a 100-dollar global shift can share a D; W1 is the "
    "average distance mass moved, in value units, via the 1-D "
    "closed form (integral of |F_a - F_b| over the cents domain — "
    "no LP). Exact integer cell terms |cum_a*n_b - cum_b*n_a| * gap "
    "DECIMAL-summed over the domain-bounded cells; ONE double "
    "division.",
)
def q_event_value_wasserstein(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ts_ops.wasserstein_drift(ev, "ts", "value", "2024-01-16")



@_q(
    "event_drift_report",
    "WITH p AS (" + _oracle_of("event_value_psi") + "),\n"
    "r AS (" + _oracle_of("event_value_ranksum_drift") + "),\n"
    "k AS (" + _oracle_of("event_value_ks_drift") + "),\n"
    "c AS (" + _oracle_of("event_value_cohens_d") + "),\n"
    "wd AS (" + _oracle_of("event_value_wasserstein") + ")\n"
    "SELECT p.n_a, p.n_b, p.psi, k.d AS ks_d, k.d_crit AS ks_crit,\n"
    "       r.auc, r.z, c.cohens_d, wd.w1\n"
    "FROM p, r, k, c, wd",
    doc="One-row drift dashboard composing the full battery over the "
    "same early/late split: PSI (monitored number), KS D + critical "
    "value (bin-free any-shape test), rank-sum AUC + z "
    "(distribution-free effect size + significance), Cohen's d "
    "(parametric effect size), Wasserstein-1 (transport magnitude in "
    "value units) — the single pane a data-drift monitor alerts on, "
    "in the corpus_health_report composition style. Each member is "
    "the EXACT green registry operator (the oracle is built from "
    "their oracle strings verbatim — consistency by construction); "
    "the composition is five 1-row broadcast aggregates cross-joined "
    "(auditor-exempt), each independently scan-bound.",
)
def q_event_drift_report(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    cutoff = "2024-01-16"
    psi = ts_ops.psi_drift(ev, "ts", "value", cutoff).select(
        "n_a", "n_b", "psi"
    )
    rs = ts_ops.ranksum_drift(ev, "ts", "value", cutoff).select(
        "auc", "z"
    )
    ks = ts_ops.ks_drift(ev, "ts", "value", cutoff).select(
        F.col("d").alias("ks_d"), F.col("d_crit").alias("ks_crit")
    )
    cd = ts_ops.cohens_d_drift(ev, "ts", "value", cutoff).select(
        "cohens_d"
    )
    wd = ts_ops.wasserstein_drift(ev, "ts", "value", cutoff).select("w1")
    return (
        psi.crossJoin(F.broadcast(rs))
        .crossJoin(F.broadcast(ks))
        .crossJoin(F.broadcast(cd))
        .crossJoin(F.broadcast(wd))
        .select(
            "n_a", "n_b", "psi", "ks_d", "ks_crit", "auc", "z",
            "cohens_d", "w1",
        )
    )


# The calibration pair reuses the AUC oracle's base/g/q/sl fragments
# VERBATIM (sliced from the green row, like event_drift_report's
# composition) — the score/gate definitions stay consistent by
# construction.
_SL_PREFIX = _oracle_of("quality_score_auc").split("cells AS (")[0]

_KK_CTE = """kk AS (
  SELECT CAST(round(s * 1000000.0) AS BIGINT) AS k, y FROM sl
),
b AS (
  SELECT CAST(least(CAST(floor(CAST(k AS DOUBLE) / 100000.0) AS INT), 9)
              + 1 AS INT) AS bin, k, y
  FROM kk
),
per AS (
  SELECT bin, CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(y) AS BIGINT) AS n_pos,
         sum(CAST(k AS HUGEINT)) AS sk,
         sum(CAST(k AS HUGEINT) * CAST(k AS HUGEINT)) AS sk2,
         sum(CAST(k * y AS HUGEINT)) AS sky
  FROM b GROUP BY 1
)"""


@_q(
    "quality_score_calibration",
    _SL_PREFIX + _KK_CTE + """
SELECT bin, n_rows, n_pos,
       round(CAST(sk AS DOUBLE) / (CAST(n_rows AS DOUBLE) * 1000000.0), 6)
         AS mean_score,
       round(CAST(n_pos AS DOUBLE) / CAST(n_rows AS DOUBLE), 6) AS pos_rate,
       round(CAST(sk - 1000000 * CAST(n_pos AS HUGEINT) AS DOUBLE)
             / (CAST(n_rows AS DOUBLE) * 1000000.0), 6) AS gap
FROM per ORDER BY bin
""",
    doc="Reliability (calibration) table of the heuristic quality "
    "score against the Gopher gate over 10 fixed-width score bins "
    "(operators/quality.py:score_calibration_table) — the third "
    "member of the classifier-eval battery: AUC measures ranking "
    "power, lift measures capacity-constrained yield, calibration "
    "asks whether the score's VALUE means what it says (needed "
    "before the score can serve as a sampling weight). k=round(s*1e6)"
    " exact integer bins; DECIMAL(38,0) per-bin sums; every rate ONE "
    "double division of exact integers.",
)
def q_quality_score_calibration(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    g = tx.gopher_quality_flags(docs).select("doc_id", "passes_gopher")
    q = tx.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    j = q.join(g, "doc_id")
    return dq.score_calibration_table(
        j, "quality_score", F.col("passes_gopher")
    )


@_q(
    "quality_score_brier",
    _SL_PREFIX + _KK_CTE + """,
m AS (
  SELECT CAST(sum(n_rows) AS BIGINT) AS n,
         CAST(sum(n_pos) AS BIGINT) AS n_pos,
         sum(sk2) - 2000000 * sum(sky)
           + 1000000000000 * sum(CAST(n_pos AS HUGEINT)) AS sd2,
         sum(abs(sk - 1000000 * CAST(n_pos AS HUGEINT))) AS enum_
  FROM per
)
SELECT n, n_pos,
       round(CAST(sd2 AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000000000.0), 6)
         AS brier,
       CASE WHEN n_pos > 0 AND n_pos < n THEN
         round(1.0 - (CAST(sd2 AS DOUBLE)
                      / (CAST(n AS DOUBLE) * 1000000000000.0))
               / (CAST(CAST(n_pos AS HUGEINT)
                       * CAST(n - n_pos AS HUGEINT) AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6) END
         AS brier_skill,
       round(CAST(enum_ AS DOUBLE) / (CAST(n AS DOUBLE) * 1000000.0), 6)
         AS ece
FROM m
""",
    doc="Brier score + Brier skill vs the base-rate forecast + "
    "expected calibration error of the quality score against the "
    "Gopher gate (operators/quality.py:score_brier) — the one-row "
    "proper-scoring-rule summary over the calibration table's bins. "
    "ONE combinable pass: the Brier numerator expands to "
    "sum k^2 - 2e6*sum(k*y) + 1e12*sum(y) and the ECE numerator "
    "telescopes to sum_b |sk_b - 1e6*pos_b|, so every output folds "
    "from the same per-bin DECIMAL(38,0) integer sums (the naive "
    "two-aggregate form re-parsed the corpus twice — measured 2x at "
    "25x docs); each output is ONE double division.",
)
def q_quality_score_brier(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    g = tx.gopher_quality_flags(docs).select("doc_id", "passes_gopher")
    q = tx.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score"
    )
    j = q.join(g, "doc_id")
    return dq.score_brier(j, "quality_score", F.col("passes_gopher"))


@_q(
    "customer_golden_records",
    """
WITH RECURSIVE rn AS (
  SELECT c_custkey AS id, c_name AS nm,
         row_number() OVER (ORDER BY c_name, c_custkey) AS rn
  FROM customer
),
cand AS (
  SELECT least(a.id, b.id) AS doc_a, greatest(a.id, b.id) AS doc_b
  FROM rn a JOIN rn b ON b.rn BETWEEN a.rn + 1 AND a.rn + 3
),
pairs AS (
  SELECT p.doc_a, p.doc_b
  FROM cand p
  JOIN customer ca ON p.doc_a = ca.c_custkey
  JOIN customer cb ON p.doc_b = cb.c_custkey
  WHERE levenshtein(ca.c_name, cb.c_name) <= 2
),
edges AS (
  SELECT doc_a AS u, doc_b AS v FROM pairs
  UNION
  SELECT doc_b, doc_a FROM pairs
),
walk(node, label) AS (
  SELECT c_custkey, c_custkey FROM customer
  UNION
  SELECT e.v, w.label FROM walk w JOIN edges e ON e.u = w.node
),
comp AS (SELECT node, CAST(min(label) AS BIGINT) AS cluster FROM walk GROUP BY node),
mem AS (
  SELECT c.*, comp.cluster FROM customer c
  JOIN comp ON c.c_custkey = comp.node
),
rep AS (
  SELECT cluster, c_custkey, c_name, c_nationkey,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY c_acctbal DESC, c_custkey ASC) AS r
  FROM mem
),
seg AS (
  SELECT cluster, c_mktsegment,
         row_number() OVER (PARTITION BY cluster
                            ORDER BY count(*) DESC, c_mktsegment ASC) AS r
  FROM mem GROUP BY cluster, c_mktsegment
),
agg AS (
  SELECT cluster, CAST(count(*) AS BIGINT) AS n_members,
         round(max(c_acctbal), 2) AS max_acctbal,
         CAST(sum(CAST(floor(CAST(c_acctbal AS DOUBLE) * 100.0 + 0.5)
                       AS BIGINT)) AS BIGINT) AS cents
  FROM mem GROUP BY 1
)
SELECT a.cluster AS cluster_id, a.n_members,
       r.c_custkey AS rep_custkey, r.c_name AS rep_name,
       CAST(r.c_nationkey AS INT) AS rep_nationkey,
       s.c_mktsegment AS top_segment,
       a.max_acctbal,
       round(CAST(a.cents AS DOUBLE) / 100.0, 2) AS total_acctbal
FROM agg a
JOIN rep r ON r.cluster = a.cluster AND r.r = 1
JOIN seg s ON s.cluster = a.cluster AND s.r = 1
ORDER BY cluster_id
""",
    doc="Golden-record survivorship - the END stage of the ER "
    "pipeline the tier was missing: blocking (sorted-neighborhood, "
    "customer_name_edit_pairs), pairwise verification (Levenshtein "
    "<= 2), transitive clustering (operators/graph.py:"
    "connected_components_star - the oracle replays it as the "
    "recursive min-label walk, the dedup_clusters_star pattern), "
    "then ATTRIBUTE-level survivorship per entity: representative "
    "by max account balance (tie: min key) contributes name and "
    "nation (recency/value proxy), mode market segment with a "
    "(count desc, value asc) deterministic tie-break (consensus "
    "rule), exact cents-summed total balance (merge rule). All "
    "rules are window/aggregate picks - no mode()/struct-min "
    "engine ambiguity; singletons are their own golden record.",
)
def q_customer_golden_records(spark, sf_dir):
    return _golden_records(_t(spark, sf_dir, "customer"))


def _golden_records(c):
    from pyspark.sql import Window

    pairs = dd.edit_distance_verify(
        dd.sorted_neighborhood_pairs(
            c, "c_custkey", F.col("c_name"), window=3
        ).select("doc_a", "doc_b"),
        c,
        "c_custkey",
        "c_name",
        2,
    ).select("doc_a", "doc_b")
    comp = graph.connected_components_star(pairs, "doc_a", "doc_b")
    mem = c.join(
        comp.withColumnRenamed("node", "c_custkey"), "c_custkey", "left"
    ).withColumn(
        "cluster",
        F.coalesce("cluster", F.col("c_custkey")).cast("long"),
    )
    # The cluster-map relation is consumed by THREE survivorship arms
    # (representative window, mode segment, merge aggregate); without a
    # persist each arm re-derives the blocking+verify+CC subtree —
    # measured 550 joins / 224 exchanges in the round-10 plan audit
    # (the round-9 Brier / round-10 lift-table lesson again).
    from .session import track_persist

    mem = track_persist(mem)
    w_rep = Window.partitionBy("cluster").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    rep = (
        mem.withColumn("r", F.row_number().over(w_rep))
        .where(F.col("r") == 1)
        .select(
            "cluster",
            F.col("c_custkey").alias("rep_custkey"),
            F.col("c_name").alias("rep_name"),
            F.col("c_nationkey").cast("int").alias("rep_nationkey"),
        )
    )
    segc = mem.groupBy("cluster", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("__n")
    )
    w_seg = Window.partitionBy("cluster").orderBy(
        F.desc("__n"), F.asc("c_mktsegment")
    )
    seg = (
        segc.withColumn("r", F.row_number().over(w_seg))
        .where(F.col("r") == 1)
        .select("cluster", F.col("c_mktsegment").alias("top_segment"))
    )
    agg = mem.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members"),
        F.round(F.max("c_acctbal"), 2).alias("max_acctbal"),
        F.sum(
            F.floor(
                F.col("c_acctbal").cast("double") * F.lit(100.0)
                + F.lit(0.5)
            ).cast("long")
        )
        .cast("long")
        .alias("cents"),
    )
    return (
        agg.join(rep, "cluster")
        .join(seg, "cluster")
        .select(
            F.col("cluster").alias("cluster_id"),
            "n_members",
            "rep_custkey",
            "rep_name",
            "rep_nationkey",
            "top_segment",
            "max_acctbal",
            F.round(F.col("cents").cast("double") / F.lit(100.0), 2).alias(
                "total_acctbal"
            ),
        )
        .orderBy("cluster_id")
    )


@_q(
    "event_type_wasserstein_scan",
    """
WITH cells AS (
  SELECT event_type AS g,
         CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 1 ELSE 0 END) AS BIGINT) AS ta,
         CAST(sum(CASE WHEN ts < TIMESTAMP '2024-01-16' THEN 0 ELSE 1 END) AS BIGINT) AS tb
  FROM events WHERE value IS NOT NULL GROUP BY 1, 2
),
cum AS (
  SELECT g, v,
         CAST(sum(ta) OVER w AS BIGINT) AS ca,
         CAST(sum(tb) OVER w AS BIGINT) AS cb,
         lead(v) OVER (PARTITION BY g ORDER BY v) AS nxt
  FROM cells
  WINDOW w AS (PARTITION BY g ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
),
tot AS (
  SELECT g, CAST(sum(ta) AS BIGINT) AS n_a, CAST(sum(tb) AS BIGINT) AS n_b
  FROM cells GROUP BY 1
),
per AS (
  SELECT c.g,
         sum(abs(CAST(c.ca AS HUGEINT) * t.n_b
                 - CAST(c.cb AS HUGEINT) * t.n_a)
             * CAST(c.nxt - c.v AS HUGEINT)) AS sw
  FROM cum c JOIN tot t ON c.g = t.g
  WHERE c.nxt IS NOT NULL GROUP BY 1
)
SELECT t.g AS event_type, t.n_a, t.n_b,
       CASE WHEN t.n_a > 0 AND t.n_b > 0 THEN
         round(CAST(coalesce(p.sw, 0) AS DOUBLE)
               / (CAST(t.n_a AS DOUBLE) * CAST(t.n_b AS DOUBLE) * 100.0), 6)
       END AS w1
FROM tot t LEFT JOIN per p ON t.g = p.g
ORDER BY event_type
""",
    doc="Per-event-type Wasserstein-1 triage scan "
    "(operators/timeseries.py:wasserstein_by_group) — the magnitude "
    "column beside event_type_ranksum_scan: rank-sum ranks types by "
    "shift SIGNIFICANCE, W1 by what the shift COSTS (value units "
    "moved per row) — remediation priority. Every window is "
    "PARTITIONED by type (cells bounded by types x cents domain; no "
    "single-partition stage anywhere); per-type transport sums are "
    "exact DECIMAL integers, ONE double division per type.",
)
def q_event_type_wasserstein_scan(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return ts_ops.wasserstein_by_group(
        ev, "ts", "value", "event_type", "2024-01-16"
    )


@_q(
    "supplier_bfs_hops",
    "WITH RECURSIVE " + KNN_EDGES_CTE + """,
sym AS (SELECT a AS u, b AS v FROM und UNION SELECT b, a FROM und),
deg AS (SELECT u, count(*) AS deg FROM sym GROUP BY 1),
s AS (
  SELECT u AS src FROM (
    SELECT u, row_number() OVER (ORDER BY deg DESC, u ASC) AS r FROM deg
  ) WHERE r = 1
),
walk(node, hop) AS (
  SELECT src, 0 FROM s
  UNION
  SELECT e.v, w.hop + 1 FROM walk w JOIN sym e ON e.u = w.node
  WHERE w.hop < 8
),
dist AS (SELECT node, CAST(min(hop) AS INT) AS hop FROM walk GROUP BY 1),
hist AS (
  SELECT hop, CAST(count(*) AS BIGINT) AS n_nodes FROM dist GROUP BY 1
),
un AS (
  SELECT CAST(-1 AS INT) AS hop, CAST(count(*) AS BIGINT) AS n_nodes
  FROM (SELECT DISTINCT u FROM sym) n LEFT JOIN dist d ON n.u = d.node
  WHERE d.node IS NULL HAVING count(*) > 0
)
SELECT hop, n_nodes FROM hist
UNION ALL
SELECT hop, n_nodes FROM un
ORDER BY hop
""",
    doc="BFS hop-distance histogram from the co-supply graph's "
    "max-degree supplier (operators/graph.py:bfs_hops) — the "
    "traversal primitive beside PageRank/k-core/triangles: the hop "
    "profile is the empirical reach/diameter read that tells you how "
    "many rounds iterative algorithms on this graph need. Level-"
    "synchronous frontier expansion (one keyed join + settled-set "
    "anti-join per round, eager checkpoints), fixed 8-round anytime "
    "contract, hop -1 = unreached; the oracle replays it as the "
    "hop-bounded recursive min-label walk.",
)
def q_supplier_bfs_hops(spark, sf_dir):
    return graph.bfs_hops(
        _supplier_knn_edges(spark, sf_dir), src="a", dst="b", rounds=8
    )


@_q(
    "prefix_dim_fidelity",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
sf AS (
  SELECT q.qid, e.vec_id,
         round({cosine_sql('e.embedding', 'q.qv', 64)}, 6) AS score
  FROM embeddings e, q
),
tf AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, vec_id) AS rn
    FROM sf
  ) WHERE rn <= 10
),
sh AS (
  SELECT q.qid, e.vec_id,
         round({cosine_sql('e.embedding', 'q.qv', 32)}, 6) AS score
  FROM embeddings e, q
),
th AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, vec_id) AS rn
    FROM sh
  ) WHERE rn <= 10
),
ov AS (
  SELECT t.qid, CAST(count(*) AS BIGINT) AS n_overlap
  FROM tf t JOIN th h ON t.qid = h.qid AND t.vec_id = h.vec_id
  GROUP BY 1
)
SELECT q.qid, CAST(coalesce(o.n_overlap, 0) AS BIGINT) AS n_overlap,
       round(CAST(coalesce(o.n_overlap, 0) AS DOUBLE) / 10.0, 6)
         AS overlap_at_10
FROM q LEFT JOIN ov o ON q.qid = o.qid
ORDER BY q.qid
""",
    doc="Prefix-dimension fidelity eval (the Matryoshka/MRL "
    "question): per query, the overlap@10 between exact top-10 by "
    "full 64-dim cosine and top-10 by the FIRST-32-dims cosine — "
    "measures whether serving can run coarse retrieval on a prefix "
    "slice (half the bytes, half the FLOPs) before full-dim rerank, "
    "the standard two-stage stack. Both arms are "
    "similarity.cosine_topk_batch (broadcast query set, one corpus "
    "scan each, per-qid top-k windows); the prefix arm is F.slice — "
    "same JVM fold order as the oracle's generate_series(1, 32). "
    "Self-match included in both arms (rank-1 cos=1, cancels in the "
    "comparison).",
)
def q_prefix_dim_fidelity(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    full = sim.cosine_topk_batch(emb, qs, k=10)
    halfc = emb.select(
        "vec_id", F.slice("embedding", 1, 32).alias("embedding")
    )
    halfq = qs.select("qid", F.slice("qv", 1, 32).alias("qv"))
    pre = sim.cosine_topk_batch(halfc, halfq, k=10)
    ov = (
        full.select("qid", "vec_id")
        .join(pre.select("qid", "vec_id"), ["qid", "vec_id"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).cast("long").alias("n_overlap"))
    )
    return (
        qs.select("qid")
        .join(ov, "qid", "left")
        .select(
            "qid",
            F.coalesce("n_overlap", F.lit(0)).cast("long").alias(
                "n_overlap"
            ),
            F.round(
                F.coalesce("n_overlap", F.lit(0)).cast("double")
                / F.lit(10.0),
                6,
            ).alias("overlap_at_10"),
        )
        .orderBy("qid")
    )


@_q(
    "quantile_sketch_error",
    "WITH e AS (" + _oracle_of("price_histogram_quantiles") + """),
cells AS (
  SELECT o_orderpriority AS prio,
         CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         CAST(count(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
),
c AS (
  SELECT prio, v,
         CAST(sum(cnt) OVER (PARTITION BY prio ORDER BY v
                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
         CAST(sum(cnt) OVER (PARTITION BY prio) AS BIGINT) AS n
  FROM cells
),
x AS (SELECT c.*, CAST(q AS DOUBLE) AS q
      FROM c, (VALUES (0.25), (0.5), (0.9), (0.99)) AS qs(q)),
ex AS (
  SELECT prio, q, round(CAST(min(v) AS DOUBLE) / 100.0, 6) AS exact_q
  FROM x WHERE cum >= CAST(ceil(q * n) AS BIGINT) GROUP BY 1, 2
)
SELECT e.prio, e.q, e.quantile_est, ex.exact_q,
       round(abs(e.quantile_est - ex.exact_q), 6) AS abs_err,
       (round(abs(e.quantile_est - ex.exact_q), 6) <= 5000.0)
         AS within_bucket
FROM e JOIN ex ON e.prio = ex.prio AND e.q = ex.q
ORDER BY e.prio, e.q
""",
    doc="Accuracy eval for the histogram-quantile sketch "
    "(operators/aggregates.py:quantile_sketch_error) — the "
    "recall-eval pattern applied to the sketch tier's quantile "
    "member: per (priority, q), the mergeable-histogram estimate "
    "next to the EXACT type-1 order statistic (bounded cents-cell "
    "CDF, rank ceil(q*n), min-over-threshold), the absolute error, "
    "and the within-bucket flag the width-5000 error bound "
    "promises — the post-merge invariant a monitoring pipeline "
    "checks. Estimate arm reuses the green operator and its oracle "
    "verbatim.",
)
def q_quantile_sketch_error(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"), "o_totalprice"
    )
    return agg.quantile_sketch_error(
        o, ["prio"], "o_totalprice", width=5000.0,
        quantiles=[0.25, 0.5, 0.9, 0.99],
    )


@_q(
    "split_leakage_audit",
    "WITH RECURSIVE naive AS (" + _oracle_of("split_assignments") + "),\n"
    "safe AS (SELECT doc_id, split FROM (" + _oracle_of("leakage_safe_splits")
    + ") s0),\n"
    "mp AS (SELECT doc_a, doc_b FROM ("
    + _oracle_of("dedup_minhash_pairs") + """) z),
b AS (
  SELECT s.strategy, s.doc_id, s.split,
         CASE s.split WHEN 'train' THEN 1 WHEN 'val' THEN 2 ELSE 3 END AS rk
  FROM (
    SELECT 'naive_hash' AS strategy, doc_id, split FROM naive
    UNION ALL
    SELECT 'cluster_keyed' AS strategy, doc_id, split FROM safe
  ) s
),
x AS (
  SELECT a.strategy,
         CASE WHEN a.rk < c.rk THEN a.split ELSE c.split END AS split_a,
         CASE WHEN a.rk < c.rk THEN c.split ELSE a.split END AS split_b,
         CASE WHEN a.rk < c.rk THEN m.doc_b ELSE m.doc_a END AS leaked_doc
  FROM mp m
  JOIN b a ON a.doc_id = m.doc_a
  JOIN b c ON c.strategy = a.strategy AND c.doc_id = m.doc_b
  WHERE a.rk <> c.rk
),
agg AS (
  SELECT strategy, split_a, split_b,
         CAST(count(*) AS BIGINT) AS leaking_pairs,
         CAST(count(DISTINCT leaked_doc) AS BIGINT) AS leaked_docs
  FROM x GROUP BY 1, 2, 3
),
spine AS (
  SELECT s.strategy, p.split_a, p.split_b
  FROM (VALUES ('naive_hash'), ('cluster_keyed')) AS s(strategy),
       (VALUES ('train', 'val'), ('train', 'test'), ('val', 'test'))
         AS p(split_a, split_b)
)
SELECT sp.strategy, sp.split_a, sp.split_b,
       CAST(coalesce(a.leaking_pairs, 0) AS BIGINT) AS leaking_pairs,
       CAST(coalesce(a.leaked_docs, 0) AS BIGINT) AS leaked_docs
FROM spine sp
LEFT JOIN agg a
  ON sp.strategy = a.strategy AND sp.split_a = a.split_a
 AND sp.split_b = a.split_b
ORDER BY sp.strategy, sp.split_a, sp.split_b
""",
    doc="Split-leakage audit over the full strategy x split-pair "
    "spine: verified near-duplicate pairs (the minhash relation, "
    "jaccard >= 0.8) whose endpoints land in DIFFERENT splits, and "
    "the distinct later-split docs leaked — for BOTH strategies "
    "(naive per-doc hash split vs cluster-keyed "
    "leakage_safe_splits). The demonstration the splits tier "
    "needed: the naive split leaks a predictable ~2*p*(1-p) share "
    "of near-dup pairs across splits (eval contamination); the "
    "cluster-keyed split reports ZERO on every pair by construction "
    "(pair endpoints share a cluster, a cluster gets one split). "
    "Every member reuses the green operator/oracle verbatim "
    "(composition via _oracle_of).",
)
def q_split_leakage_audit(spark, sf_dir):
    from .operators import packing as pk

    docs = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    ).select("doc_a", "doc_b")
    naive = pk.split_assign(docs).select("doc_id", "split")
    safe = pk.split_assign(
        graph.dedup_clusters(docs, pairs), key_col="cluster_id"
    ).select("doc_id", "split")
    rk = lambda c: (  # noqa: E731
        F.when(c == "train", 1).when(c == "val", 2).otherwise(3)
    )
    b = naive.withColumn("strategy", F.lit("naive_hash")).unionByName(
        safe.withColumn("strategy", F.lit("cluster_keyed"))
    ).withColumn("rk", rk(F.col("split")))
    a = b.select(
        "strategy",
        F.col("doc_id").alias("doc_a"),
        F.col("split").alias("sa"),
        F.col("rk").alias("ra"),
    )
    c = b.select(
        "strategy",
        F.col("doc_id").alias("doc_b"),
        F.col("split").alias("sb"),
        F.col("rk").alias("rb"),
    )
    x = (
        pairs.join(a, "doc_a")
        .join(c, ["strategy", "doc_b"])
        .where(F.col("ra") != F.col("rb"))
        .select(
            "strategy",
            F.when(F.col("ra") < F.col("rb"), F.col("sa"))
            .otherwise(F.col("sb"))
            .alias("split_a"),
            F.when(F.col("ra") < F.col("rb"), F.col("sb"))
            .otherwise(F.col("sa"))
            .alias("split_b"),
            F.when(F.col("ra") < F.col("rb"), F.col("doc_b"))
            .otherwise(F.col("doc_a"))
            .alias("leaked_doc"),
        )
    )
    agg_x = x.groupBy("strategy", "split_a", "split_b").agg(
        F.count(F.lit(1)).cast("long").alias("leaking_pairs"),
        F.countDistinct("leaked_doc").cast("long").alias("leaked_docs"),
    )
    spine = spark.createDataFrame(
        [
            (s, p[0], p[1])
            for s in ("naive_hash", "cluster_keyed")
            for p in (("train", "val"), ("train", "test"), ("val", "test"))
        ],
        "strategy string, split_a string, split_b string",
    )
    return (
        spine.join(agg_x, ["strategy", "split_a", "split_b"], "left")
        .select(
            "strategy",
            "split_a",
            "split_b",
            F.coalesce("leaking_pairs", F.lit(0)).cast("long").alias(
                "leaking_pairs"
            ),
            F.coalesce("leaked_docs", F.lit(0)).cast("long").alias(
                "leaked_docs"
            ),
        )
        .orderBy("strategy", "split_a", "split_b")
    )


@_q(
    "fd_discovery_audit",
    """
SELECT * FROM (
SELECT 'orders' AS tbl, 'o_orderkey' AS lhs, 'o_custkey' AS rhs,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
       CAST(sum(d) - count(*) AS BIGINT) AS surplus_rhs,
       (sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0) AS holds
FROM (SELECT o_orderkey AS k, count(DISTINCT o_custkey) AS d
      FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1) g
UNION ALL
SELECT 'orders' AS tbl, 'o_custkey' AS lhs, 'o_orderpriority' AS rhs,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
       CAST(sum(d) - count(*) AS BIGINT) AS surplus_rhs,
       (sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0) AS holds
FROM (SELECT o_custkey AS k, count(DISTINCT o_orderpriority) AS d
      FROM orders WHERE o_custkey IS NOT NULL GROUP BY 1) g
UNION ALL
SELECT 'orders' AS tbl, 'o_orderdate' AS lhs, 'o_orderstatus' AS rhs,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
       CAST(sum(d) - count(*) AS BIGINT) AS surplus_rhs,
       (sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0) AS holds
FROM (SELECT o_orderdate AS k, count(DISTINCT o_orderstatus) AS d
      FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1) g
UNION ALL
SELECT 'part' AS tbl, 'p_partkey' AS lhs, 'p_brand' AS rhs,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
       CAST(sum(d) - count(*) AS BIGINT) AS surplus_rhs,
       (sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0) AS holds
FROM (SELECT p_partkey AS k, count(DISTINCT p_brand) AS d
      FROM part WHERE p_partkey IS NOT NULL GROUP BY 1) g
UNION ALL
SELECT 'part' AS tbl, 'p_name' AS lhs, 'p_brand' AS rhs,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
       CAST(sum(d) - count(*) AS BIGINT) AS surplus_rhs,
       (sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0) AS holds
FROM (SELECT p_name AS k, count(DISTINCT p_brand) AS d
      FROM part WHERE p_name IS NOT NULL GROUP BY 1) g
UNION ALL
SELECT 'part' AS tbl, 'p_brand' AS lhs, 'p_type' AS rhs,
       CAST(count(*) AS BIGINT) AS n_lhs,
       CAST(sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_lhs,
       CAST(sum(d) - count(*) AS BIGINT) AS surplus_rhs,
       (sum(CASE WHEN d > 1 THEN 1 ELSE 0 END) = 0) AS holds
FROM (SELECT p_brand AS k, count(DISTINCT p_type) AS d
      FROM part WHERE p_brand IS NOT NULL GROUP BY 1) g
) u ORDER BY tbl, lhs, rhs
""",
    doc="Functional-dependency audit (operators/quality.py:fd_audit) "
    "over six candidate determinant->dependent pairs in orders/part "
    "— the schema-profiling member next to column_profile and "
    "k_anonymity_audit: a HOLDING FD certifies join safety (joining "
    "on lhs cannot fan out rhs) and flags normalization/candidate-"
    "key structure; a near-FD's violating_lhs + surplus_rhs counts "
    "are the data-quality signal (dirty dimension rows, ER "
    "candidates). One combinable groupBy(lhs)->count_distinct(rhs) "
    "pass per pair, each scan pruned to exactly two columns; the "
    "six 1-row folds union.",
)
def q_fd_discovery_audit(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    p = _t(spark, sf_dir, "part")
    a = dq.fd_audit(
        o,
        "orders",
        [
            ("o_orderkey", "o_custkey"),
            ("o_custkey", "o_orderpriority"),
            ("o_orderdate", "o_orderstatus"),
        ],
    )
    b = dq.fd_audit(
        p,
        "part",
        [
            ("p_partkey", "p_brand"),
            ("p_name", "p_brand"),
            ("p_brand", "p_type"),
        ],
    )
    return a.unionByName(b).orderBy("tbl", "lhs", "rhs")


@_q(
    "heavy_hitter_error_report",
    "WITH e AS (" + _oracle_of("cms_heavy_user_hitters") + """),
ex AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
),
tk AS (
  SELECT user_id FROM (
    SELECT user_id,
           row_number() OVER (ORDER BY exact_cnt DESC, user_id ASC) AS rn
    FROM ex
  ) WHERE rn <= 20
)
SELECT e.user_id, CAST(e.est_cnt AS BIGINT) AS est_cnt, x.exact_cnt,
       CAST(e.est_cnt - x.exact_cnt AS BIGINT) AS overcount,
       (t.user_id IS NOT NULL) AS in_exact_topk
FROM e
JOIN ex x ON e.user_id = x.user_id
LEFT JOIN tk t ON e.user_id = t.user_id
ORDER BY est_cnt DESC, e.user_id ASC
""",
    doc="Accuracy eval for the Count-Min heavy hitters "
    "(the recall-eval pattern applied to the counting sketch, next "
    "to quantile_sketch_error and kmv's rel_err): the CMS top-20 "
    "joined to exact per-user counts — overcount = est - exact is "
    "NON-NEGATIVE by the CMS one-sided-error guarantee (min over "
    "rows of counters that only ever add; pinned in the test), and "
    "in_exact_topk flags rank agreement with the exact top-20 "
    "(collision-inflated tail entries are the miss mode). Estimate "
    "arm and its oracle reused verbatim from the green row.",
)
def q_heavy_hitter_error_report(spark, sf_dir):
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    est = agg.cms_heavy_hitters(ev, "user_id", depth=4, width=512, k=20)
    ex = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).cast("long").alias("exact_cnt"))
    )
    w = Window.orderBy(F.desc("exact_cnt"), F.asc("user_id"))
    tk = (
        ex.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 20)
        .select("user_id", F.lit(True).alias("__in"))
    )
    return (
        est.join(ex, "user_id")
        .join(tk, "user_id", "left")
        .select(
            "user_id",
            F.col("est_cnt").cast("long").alias("est_cnt"),
            "exact_cnt",
            (F.col("est_cnt") - F.col("exact_cnt"))
            .cast("long")
            .alias("overcount"),
            F.coalesce("__in", F.lit(False)).alias("in_exact_topk"),
        )
        .orderBy(F.desc("est_cnt"), F.asc("user_id"))
    )


@_q(
    "hll_error_report",
    "WITH e AS (" + _oracle_of("hll_users_by_event_type") + """),
ex AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users
  FROM events WHERE user_id IS NOT NULL GROUP BY 1
)
SELECT e.event_type, e.approx_users, x.exact_users,
       round(abs(e.approx_users - CAST(x.exact_users AS DOUBLE))
             / CAST(x.exact_users AS DOUBLE), 6) AS rel_err
FROM e JOIN ex x ON e.event_type = x.event_type
ORDER BY e.event_type
""",
    doc="Accuracy eval for the grouped deterministic HLL — the last "
    "sketch without one (KMV carries rel_err, the histogram its "
    "within-bucket bound, CMS its one-sided overcount): per "
    "event_type, the md5-register HLL estimate next to the exact "
    "distinct-user count and the relative error. m=64 registers -> "
    "~13% standard error ONCE n >> m; the raw harmonic estimator "
    "(deliberately no linear-counting branch — determinism over "
    "small-range accuracy) drifts far beyond that when n ~ m, and "
    "this eval is what QUANTIFIES that regime boundary per group "
    "(sf0.001 shows it; sf0.01 settles near the SE) — plus the "
    "post-merge sanity check the streaming HLL sink state needs. "
    "Estimate arm and oracle reused verbatim from the green "
    "grouped-HLL row.",
)
def q_hll_error_report(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    est = agg.hll_distinct(ev, "user_id", m=64, by=["event_type"])
    ex = (
        ev.where(F.col("user_id").isNotNull())
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").cast("long").alias("exact_users"))
    )
    return (
        est.join(ex, "event_type")
        .select(
            "event_type",
            "approx_users",
            "exact_users",
            F.round(
                F.abs(
                    F.col("approx_users")
                    - F.col("exact_users").cast("double")
                )
                / F.col("exact_users").cast("double"),
                6,
            ).alias("rel_err"),
        )
        .orderBy("event_type")
    )


@_q(
    "hybrid_rrf_ranking",
    "WITH lexs AS (" + _oracle_of("bm25_doc_scores") + """),
lex AS (
  SELECT doc_id, CAST(rn AS INT) AS lex_rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS rn
    FROM lexs
  ) WHERE rn <= 100
),
qv AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
sems AS (
  SELECT e.vec_id AS doc_id,
         round(""" + cosine_sql('e.embedding', 'q.qv', _EMB_DIM) + """, 6)
           AS score
  FROM embeddings e, qv q
),
sem AS (
  SELECT doc_id, CAST(rn AS INT) AS sem_rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id ASC) AS rn
    FROM sems
  ) WHERE rn <= 100
),
fused AS (
  SELECT coalesce(l.doc_id, s.doc_id) AS doc_id,
         l.lex_rank, s.sem_rank,
         round(coalesce(1.0 / (60.0 + CAST(l.lex_rank AS DOUBLE)), 0.0)
               + coalesce(1.0 / (60.0 + CAST(s.sem_rank AS DOUBLE)), 0.0),
               6) AS rrf
  FROM lex l FULL OUTER JOIN sem s ON l.doc_id = s.doc_id
)
SELECT doc_id, lex_rank, sem_rank, rrf FROM (
  SELECT *, row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS rn
  FROM fused
) WHERE rn <= 20
ORDER BY rrf DESC, doc_id ASC
""",
    doc="Hybrid-search serving: reciprocal-rank fusion (Cormack et "
    "al. 2009, k=60) of the lexical arm (BM25 over the fixed term "
    "query, bm25_doc_scores verbatim) and the semantic arm (cosine "
    "of each doc's embedding against the vec_id-0 query vector, the "
    "ann_topk machinery) — the standard two-retriever stack fused "
    "WITHOUT score normalization (RRF uses only ranks, immune to "
    "incomparable score scales). Each arm is a top-100 candidate "
    "list (rank from the 6dp-rounded score, id tie-break), fused by "
    "1/(60+r) sums over a FULL outer join (single-arm docs keep "
    "their one term); top-20 output. Ranks are per-arm windows over "
    "candidate lists, never the corpus.",
)
def q_hybrid_rrf_ranking(spark, sf_dir):
    from pyspark.sql import Window

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    lexs = tx.bm25_scores(docs, "doc_id", "text", _BM25_TERMS)
    wl = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    lex = (
        lexs.withColumn("rn", F.row_number().over(wl))
        .where(F.col("rn") <= 100)
        .select("doc_id", F.col("rn").cast("int").alias("lex_rank"))
    )
    emb, qv = _empty_if_no_query(emb, _query_vec(spark, sf_dir))
    sems = sim.cosine_topk(emb, qv, k=100).select(
        F.col("vec_id").alias("doc_id"), "score"
    )
    ws = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    sem = (
        sems.withColumn("rn", F.row_number().over(ws))
        .where(F.col("rn") <= 100)
        .select("doc_id", F.col("rn").cast("int").alias("sem_rank"))
    )
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            "lex_rank",
            "sem_rank",
            F.round(
                F.coalesce(
                    F.lit(1.0)
                    / (F.lit(60.0) + F.col("lex_rank").cast("double")),
                    F.lit(0.0),
                )
                + F.coalesce(
                    F.lit(1.0)
                    / (F.lit(60.0) + F.col("sem_rank").cast("double")),
                    F.lit(0.0),
                ),
                6,
            ).alias("rrf"),
        )
    )
    wf = Window.orderBy(F.desc("rrf"), F.asc("doc_id"))
    return (
        fused.withColumn("rn", F.row_number().over(wf))
        .where(F.col("rn") <= 20)
        .select("doc_id", "lex_rank", "sem_rank", "rrf")
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
    )


@_q(
    "ann_prefilter_vs_postfilter",
    f"""
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv, label AS qlabel
  FROM embeddings WHERE vec_id < 10
),
scored AS (
  SELECT q.qid, q.qlabel, e.vec_id, e.label,
         round({cosine_sql('e.embedding', 'q.qv', _EMB_DIM)}, 6) AS score
  FROM embeddings e, q
),
pre AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, vec_id ASC) AS rn
    FROM scored WHERE label = qlabel
  ) WHERE rn <= 5
),
post AS (
  SELECT qid, vec_id FROM (
    SELECT qid, vec_id, label, qlabel,
           row_number() OVER (PARTITION BY qid
                              ORDER BY score DESC, vec_id ASC) AS rn
    FROM scored
  ) WHERE rn <= 30 AND label = qlabel
  QUALIFY row_number() OVER (PARTITION BY qid ORDER BY rn) <= 5
),
np AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_post_found FROM post GROUP BY 1),
npre AS (SELECT qid, CAST(count(*) AS BIGINT) AS n_pre_found FROM pre GROUP BY 1)
SELECT q.qid, CAST(q.qlabel AS INT) AS label,
       CAST(coalesce(npre.n_pre_found, 0) AS BIGINT) AS n_pre_found,
       CAST(coalesce(np.n_post_found, 0) AS BIGINT) AS n_post_found
FROM q LEFT JOIN np ON q.qid = np.qid LEFT JOIN npre ON q.qid = npre.qid
ORDER BY q.qid
""",
    doc="Filtered vector search, the pre-filter vs post-filter design "
    "axis every vector store documents: per query, exact top-5 among "
    "SAME-LABEL vectors computed by PRE-filtering (predicate pushed "
    "below the score-rank — always returns k when k matches exist) "
    "vs POST-filtering an unfiltered top-30 (the cheap path — can "
    "come home short when the label is rare in the global "
    "neighborhood; n_post_found < n_pre_found is that recall loss "
    "made visible; the survivors are always a PREFIX of the "
    "pre-filter ranking, so the counts alone tell the story). One "
    "broadcast-query corpus scan feeds BOTH arms; per-qid windows; "
    "rounded-score/id total order.",
)
def q_ann_prefilter_vs_postfilter(spark, sf_dir):
    from pyspark.sql import Window

    from .functions.vectors import cosine

    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"),
        F.col("embedding").alias("qv"),
        F.col("label").alias("qlabel"),
    )
    scored = emb.crossJoin(F.broadcast(qs)).select(
        "qid",
        "qlabel",
        "vec_id",
        "label",
        F.round(cosine(F.col("embedding"), F.col("qv")), 6).alias("score"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("score"), F.asc("vec_id"))
    pre = (
        scored.where(F.col("label") == F.col("qlabel"))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("qid", "vec_id")
    )
    ranked = scored.withColumn("rn", F.row_number().over(w))
    wpost = Window.partitionBy("qid").orderBy("rn")
    post = (
        ranked.where(
            (F.col("rn") <= 30) & (F.col("label") == F.col("qlabel"))
        )
        .withColumn("rn2", F.row_number().over(wpost))
        .where(F.col("rn2") <= 5)
        .select("qid", "vec_id")
    )
    np_ = post.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_post_found")
    )
    npre = pre.groupBy("qid").agg(
        F.count(F.lit(1)).cast("long").alias("n_pre_found")
    )
    return (
        qs.select("qid", F.col("qlabel").cast("int").alias("label"))
        .join(np_, "qid", "left")
        .join(npre, "qid", "left")
        .select(
            "qid",
            "label",
            F.coalesce("n_pre_found", F.lit(0)).cast("long").alias(
                "n_pre_found"
            ),
            F.coalesce("n_post_found", F.lit(0)).cast("long").alias(
                "n_post_found"
            ),
        )
        .orderBy("qid")
    )


@_q(
    "mmr_diversified_topk",
    """
WITH q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10
),
sc AS (
  SELECT q.qid, e.vec_id AS vid, e.embedding AS emb,
         round((CASE WHEN (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE))))) > 0 THEN (list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))) / ((sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(q.qv[i] AS DOUBLE) * CAST(q.qv[i] AS DOUBLE)))))) END), 6) AS rel
  FROM embeddings e, q
),
cand AS (
  SELECT qid, vid, emb, rel FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY rel DESC, vid ASC) AS rn
    FROM sc
  ) WHERE rn <= 30
),
a1 AS (
  SELECT qid, CAST(1 AS INT) AS pos, vid, emb, rel,
         CAST(NULL AS DOUBLE) AS max_sim, CAST(NULL AS DOUBLE) AS mmr
  FROM (
    SELECT *, row_number() OVER (PARTITION BY qid
                                 ORDER BY rel DESC, vid ASC) AS rn
    FROM cand
  ) WHERE rn = 1
),
s2 AS (
  SELECT c.qid, c.vid, max(round((CASE WHEN (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(c.emb[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(p.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE))))) > 0 THEN (list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE)))) / ((sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(c.emb[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(p.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE)))))) END), 6)) AS max_sim
  FROM cand c JOIN a1 p ON c.qid = p.qid
  WHERE NOT EXISTS (SELECT 1 FROM a1 x
                    WHERE x.qid = c.qid AND x.vid = c.vid)
  GROUP BY c.qid, c.vid
),
p2 AS (
  SELECT qid, CAST(2 AS INT) AS pos, vid, emb, rel, max_sim, mmr FROM (
    SELECT c.qid, c.vid, c.emb, c.rel, s.max_sim,
           round(0.5 * c.rel - 0.5 * s.max_sim, 6) AS mmr,
           row_number() OVER (PARTITION BY c.qid
                              ORDER BY round(0.5 * c.rel - 0.5 * s.max_sim, 6) DESC,
                                       c.vid ASC) AS rn
    FROM cand c JOIN s2 s ON c.qid = s.qid AND c.vid = s.vid
  ) WHERE rn = 1
),
a2 AS (SELECT * FROM a1 UNION ALL SELECT * FROM p2),
s3 AS (
  SELECT c.qid, c.vid, max(round((CASE WHEN (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(c.emb[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(p.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE))))) > 0 THEN (list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE)))) / ((sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(c.emb[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(p.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE)))))) END), 6)) AS max_sim
  FROM cand c JOIN a2 p ON c.qid = p.qid
  WHERE NOT EXISTS (SELECT 1 FROM a2 x
                    WHERE x.qid = c.qid AND x.vid = c.vid)
  GROUP BY c.qid, c.vid
),
p3 AS (
  SELECT qid, CAST(3 AS INT) AS pos, vid, emb, rel, max_sim, mmr FROM (
    SELECT c.qid, c.vid, c.emb, c.rel, s.max_sim,
           round(0.5 * c.rel - 0.5 * s.max_sim, 6) AS mmr,
           row_number() OVER (PARTITION BY c.qid
                              ORDER BY round(0.5 * c.rel - 0.5 * s.max_sim, 6) DESC,
                                       c.vid ASC) AS rn
    FROM cand c JOIN s3 s ON c.qid = s.qid AND c.vid = s.vid
  ) WHERE rn = 1
),
a3 AS (SELECT * FROM a2 UNION ALL SELECT * FROM p3),
s4 AS (
  SELECT c.qid, c.vid, max(round((CASE WHEN (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(c.emb[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(p.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE))))) > 0 THEN (list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE)))) / ((sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(c.emb[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(p.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE)))))) END), 6)) AS max_sim
  FROM cand c JOIN a3 p ON c.qid = p.qid
  WHERE NOT EXISTS (SELECT 1 FROM a3 x
                    WHERE x.qid = c.qid AND x.vid = c.vid)
  GROUP BY c.qid, c.vid
),
p4 AS (
  SELECT qid, CAST(4 AS INT) AS pos, vid, emb, rel, max_sim, mmr FROM (
    SELECT c.qid, c.vid, c.emb, c.rel, s.max_sim,
           round(0.5 * c.rel - 0.5 * s.max_sim, 6) AS mmr,
           row_number() OVER (PARTITION BY c.qid
                              ORDER BY round(0.5 * c.rel - 0.5 * s.max_sim, 6) DESC,
                                       c.vid ASC) AS rn
    FROM cand c JOIN s4 s ON c.qid = s.qid AND c.vid = s.vid
  ) WHERE rn = 1
),
a4 AS (SELECT * FROM a3 UNION ALL SELECT * FROM p4),
s5 AS (
  SELECT c.qid, c.vid, max(round((CASE WHEN (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(c.emb[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(p.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE))))) > 0 THEN (list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE)))) / ((sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(c.emb[i] AS DOUBLE) * CAST(c.emb[i] AS DOUBLE))))) * (sqrt(list_sum(list_transform(generate_series(1, 64), i -> CAST(p.emb[i] AS DOUBLE) * CAST(p.emb[i] AS DOUBLE)))))) END), 6)) AS max_sim
  FROM cand c JOIN a4 p ON c.qid = p.qid
  WHERE NOT EXISTS (SELECT 1 FROM a4 x
                    WHERE x.qid = c.qid AND x.vid = c.vid)
  GROUP BY c.qid, c.vid
),
p5 AS (
  SELECT qid, CAST(5 AS INT) AS pos, vid, emb, rel, max_sim, mmr FROM (
    SELECT c.qid, c.vid, c.emb, c.rel, s.max_sim,
           round(0.5 * c.rel - 0.5 * s.max_sim, 6) AS mmr,
           row_number() OVER (PARTITION BY c.qid
                              ORDER BY round(0.5 * c.rel - 0.5 * s.max_sim, 6) DESC,
                                       c.vid ASC) AS rn
    FROM cand c JOIN s5 s ON c.qid = s.qid AND c.vid = s.vid
  ) WHERE rn = 1
),
a5 AS (SELECT * FROM a4 UNION ALL SELECT * FROM p5)
SELECT qid, pos, vid AS vec_id, rel, max_sim, mmr
FROM a5 ORDER BY qid, pos

""",
    doc="MMR-diversified top-5 per query (Carbonell & Goldstein "
    "1998, lambda=0.5, pool=30) — the diversification stage "
    "completing the retrieval stack (rank / fuse / filter / "
    "diversify): pure relevance returns near-copies of the best hit "
    "when the corpus has near-dups; each greedy pick maximizes "
    "0.5*rel - 0.5*max_sim_to_picked, so redundancy must be earned "
    "(operators/similarity.py:mmr_diversify). One broadcast-query "
    "corpus scan builds the candidate pool, materialized once; the "
    "4 greedy steps are bounded candidate x picked work with "
    "6dp-rounded scores and id tie-breaks (the oracle replays the "
    "greedy trajectory as an unrolled CTE chain).",
)
def q_mmr_diversified_topk(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    qs = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    return sim.mmr_diversify(emb, qs, k=5, pool=30, lam=0.5)


@_q(
    "retrieval_health_report",
    "WITH rq AS (" + _oracle_of("ann_rank_quality") + "),\n"
    "pq AS (" + _oracle_of("pq_recall_eval") + "),\n"
    "pf AS (" + _oracle_of("prefix_dim_fidelity") + "),\n"
    "pp AS (" + _oracle_of("ann_prefilter_vs_postfilter") + """),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_queries,
         round(CAST(SUM(CAST(ndcg_at_10 AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_ndcg_at_10,
         round(CAST(SUM(CAST(reciprocal_rank AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_mrr
  FROM rq
),
b AS (
  SELECT round(CAST(SUM(CAST(recall_at_10 AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_pq_recall_at_10
  FROM pq
),
c AS (
  SELECT round(CAST(SUM(CAST(overlap_at_10 AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_prefix_overlap_at_10
  FROM pf
),
d AS (
  SELECT round(CAST(sum(n_post_found) AS DOUBLE)
               / CAST(sum(n_pre_found) AS DOUBLE), 6)
           AS postfilter_recall
  FROM pp
)
SELECT a.n_queries, a.mean_ndcg_at_10, a.mean_mrr,
       b.mean_pq_recall_at_10, c.mean_prefix_overlap_at_10,
       d.postfilter_recall
FROM a, b, c, d
""",
    doc="One-row vector-serving dashboard in the corpus_health / "
    "drift-report composition style — the single pane that says "
    "whether the ANN stack is healthy: mean nDCG@10 + MRR of the "
    "IVF path vs exact (order quality), mean PQ recall@10 "
    "(compression loss), mean first-32-dims overlap@10 (prefix-"
    "slice viability), and the post-filter recall ratio (filtered-"
    "search strategy cost). Each member is the green standalone "
    "eval verbatim (oracle composed from their oracle strings); "
    "per-query 6dp members DECIMAL-summed before the ONE mean "
    "division (order-free); four 1-row aggregates meet via "
    "broadcast crosses (auditor-exempt).",
)
def q_retrieval_health_report(spark, sf_dir):
    rq = q_ann_rank_quality(spark, sf_dir)
    pq = q_pq_recall_eval(spark, sf_dir)
    pf = q_prefix_dim_fidelity(spark, sf_dir)
    pp = q_ann_prefilter_vs_postfilter(spark, sf_dir)
    dec = lambda c: c.cast("decimal(18,6)")  # noqa: E731
    a = rq.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        F.round(
            F.sum(dec(F.col("ndcg_at_10"))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_ndcg_at_10"),
        F.round(
            F.sum(dec(F.col("reciprocal_rank"))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_mrr"),
    )
    b = pq.agg(
        F.round(
            F.sum(dec(F.col("recall_at_10"))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_pq_recall_at_10")
    )
    c = pf.agg(
        F.round(
            F.sum(dec(F.col("overlap_at_10"))).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_prefix_overlap_at_10")
    )
    d = pp.agg(
        F.round(
            F.sum("n_post_found").cast("double")
            / F.sum("n_pre_found").cast("double"),
            6,
        ).alias("postfilter_recall")
    )
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(d))
        .select(
            "n_queries",
            "mean_ndcg_at_10",
            "mean_mrr",
            "mean_pq_recall_at_10",
            "mean_prefix_overlap_at_10",
            "postfilter_recall",
        )
    )


# --------------------------------------------------------------------------
# Round 10: link-analysis centrality, closed-form multi-feature OLS,
# conformal intervals, quantile normalization, cross-source dedup
# analytics, token-budget allocation.
# --------------------------------------------------------------------------


@_q(
    "part_supplier_hits",
    """
WITH e AS (
  SELECT DISTINCT CAST(l_partkey AS BIGINT) AS l, CAST(l_suppkey AS BIGINT) AS r
  FROM lineitem WHERE l_partkey IS NOT NULL AND l_suppkey IS NOT NULL
),
h1 AS (SELECT l, count(*) AS s FROM e GROUP BY l),
a1 AS (SELECT e.r, sum(h1.s) AS s FROM e JOIN h1 USING (l) GROUP BY e.r),
h2 AS (SELECT e.l, sum(a1.s) AS s FROM e JOIN a1 ON e.r = a1.r GROUP BY e.l),
a2 AS (SELECT e.r, sum(h2.s) AS s FROM e JOIN h2 ON e.l = h2.l GROUP BY e.r),
deg AS (SELECT r, CAST(count(*) AS BIGINT) AS degree FROM e GROUP BY r),
top AS (
  SELECT a2.r AS node, deg.degree, CAST(a2.s AS BIGINT) AS authority
  FROM a2 JOIN deg ON a2.r = deg.r
  ORDER BY authority DESC, node LIMIT 10
)
SELECT node, degree, authority,
       CAST(row_number() OVER (ORDER BY authority DESC, node) AS INT) AS rank
FROM top ORDER BY rank
""",
    doc="HITS link analysis (Kleinberg 1999) on the bipartite "
    "part <-> supplier graph from deduped lineitem edges "
    "(operators/graph.py:hits_bipartite): top-10 suppliers by 2-round "
    "authority mass. Unnormalized EXACT-INTEGER recurrence (L2 "
    "normalization only rescales the ranking, so it is dropped; "
    "DECIMAL(38,0) accumulation, BIGINT projection) — the oracle "
    "replays the same unrolled recurrence. Each half-round is one "
    "key-partitioned join + combinable groupBy on the persisted edge "
    "list; the top-k is a TakeOrdered, and the rank window runs on "
    "10 rows, never the graph.",
)
def q_part_supplier_hits(spark, sf_dir):
    return graph.hits_bipartite(
        _t(spark, sf_dir, "lineitem"), "l_partkey", "l_suppkey",
        rounds=2, top_k=10,
    )


@_q(
    "price_qty_discount_ols",
    """
WITH f AS (
  SELECT l_returnflag,
         CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS y,
         CAST(FLOOR(CAST(l_quantity AS DOUBLE) + 0.5) AS BIGINT) AS x1,
         CAST(FLOOR(CAST(l_discount AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS x2
  FROM lineitem
),
stats AS (
  SELECT l_returnflag,
         CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1,
         CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(y) AS BIGINT) AS sy,
         sum(x1 * x1) AS s11,
         sum(x2 * x2) AS s22,
         sum(x1 * x2) AS s12,
         sum(x1 * y) AS s1y,
         sum(x2 * y) AS s2y,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM f GROUP BY l_returnflag
),
d AS (
  SELECT l_returnflag, n,
         CAST(n AS DOUBLE) AS nd, CAST(s1 AS DOUBLE) AS s1,
         CAST(s2 AS DOUBLE) AS s2, CAST(sy AS DOUBLE) AS sy,
         CAST(s11 AS DOUBLE) AS s11, CAST(s22 AS DOUBLE) AS s22,
         CAST(s12 AS DOUBLE) AS s12, CAST(s1y AS DOUBLE) AS s1y,
         CAST(s2y AS DOUBLE) AS s2y, CAST(syy AS DOUBLE) AS syy
  FROM stats
),
dets AS (
  SELECT *,
    nd * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s12 - s11 * s2) AS det,
    sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
      + s2 * (s1y * s12 - s11 * s2y) AS det0,
    nd * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
      + s2 * (s1 * s2y - s1y * s2) AS det1,
    nd * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
      + sy * (s1 * s12 - s11 * s2) AS det2
  FROM d
),
coefs AS (
  SELECT l_returnflag, n, sy, s1y, s2y, syy, nd,
         CASE WHEN det <> 0.0 THEN det0 / det END AS b0,
         CASE WHEN det <> 0.0 THEN det1 / det END AS b1,
         CASE WHEN det <> 0.0 THEN det2 / det END AS b2,
         det
  FROM dets
),
fit AS (
  SELECT l_returnflag, n, b0, b1, b2,
         syy - b0 * sy - b1 * s1y - b2 * s2y AS sse,
         syy - sy * sy / nd AS sst, det
  FROM coefs
)
SELECT l_returnflag, n AS n_rows,
       round(b0, 6) AS b0, round(b1, 6) AS b1, round(b2, 6) AS b2,
       round(CASE WHEN det <> 0.0 AND sst <> 0.0
                  THEN 1.0 - sse / sst END, 6) AS r2
FROM fit ORDER BY l_returnflag
""",
    doc="Two-feature least squares extendedprice_cents ~ quantity + "
    "discount_pct per returnflag via the NORMAL EQUATIONS "
    "(operators/timeseries.py:ols_multifeature_fit): ONE combinable "
    "aggregate builds the 3x3 Gram matrix (exact ints: first-order "
    "int64, second-order DECIMAL(38,0)); Cramer's rule + R-squared "
    "run as a fixed IEEE-double expression tree on the 3-row result. "
    "The distributed closed form for fitting regressions at 100 TB: "
    "same plan shape as a grouped count.",
)
def q_price_qty_discount_ols(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.floor(F.col("l_extendedprice").cast("double") * 100.0 + 0.5)
        .cast("long")
        .alias("y"),
        F.floor(F.col("l_quantity").cast("double") + 0.5)
        .cast("long")
        .alias("x1"),
        F.floor(F.col("l_discount").cast("double") * 100.0 + 0.5)
        .cast("long")
        .alias("x2"),
    )
    return ts_ops.ols_multifeature_fit(
        li, ["l_returnflag"], "y", "x1", "x2"
    ).orderBy("l_returnflag")


_CONF_SPLIT_SQL = md5_long_sql("CAST(event_id AS VARCHAR)", "conf")


@_q(
    "conformal_event_intervals",
    f"""
WITH base AS (
  SELECT event_type, event_id,
         CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         ({_CONF_SPLIT_SQL} % 2 = 0) AS is_calib
  FROM events WHERE value IS NOT NULL
),
stats AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_calib,
         CAST(sum(v) AS BIGINT) AS sum_v
  FROM base WHERE is_calib GROUP BY event_type
),
m AS (
  SELECT event_type, n_calib,
         CAST(sum_v AS DOUBLE) / CAST(n_calib AS DOUBLE) AS mean_v,
         least(((n_calib + 1) * 9 + 9) // 10, n_calib) AS r_rank
  FROM stats
),
rk AS (
  SELECT b.event_type,
         abs(CAST(b.v AS DOUBLE) - m.mean_v) AS resid,
         row_number() OVER (
           PARTITION BY b.event_type
           ORDER BY abs(CAST(b.v AS DOUBLE) - m.mean_v), b.event_id
         ) AS rn,
         m.r_rank
  FROM base b JOIN m ON b.event_type = m.event_type
  WHERE b.is_calib
),
q AS (SELECT event_type, resid AS qhat FROM rk WHERE rn = r_rank),
t AS (
  SELECT b.event_type,
         CAST(count(*) AS BIGINT) AS n_test,
         CAST(sum(CASE WHEN abs(CAST(b.v AS DOUBLE) - m.mean_v) <= q.qhat
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_covered
  FROM base b
  JOIN m ON b.event_type = m.event_type
  JOIN q ON b.event_type = q.event_type
  WHERE NOT b.is_calib GROUP BY b.event_type
)
SELECT m.event_type, m.n_calib, t.n_test,
       round(q.qhat / 100.0, 6) AS qhat,
       round(CAST(t.n_covered AS DOUBLE) / CAST(t.n_test AS DOUBLE), 6)
         AS coverage
FROM m JOIN q ON m.event_type = q.event_type
       JOIN t ON m.event_type = t.event_type
ORDER BY m.event_type
""",
    doc="Split-conformal prediction intervals for event value per "
    "event_type (Vovk et al. 2005; operators/quality.py:"
    "conformal_intervals): deterministic md5 half-split, predictor = "
    "calibration mean, qhat = ceil((n+1)*0.9)-th smallest absolute "
    "residual (pure-integer rank arithmetic), plus MEASURED held-out "
    "coverage — the distribution-free >=90% guarantee a monitoring "
    "pipeline wraps around any point forecast. One combinable "
    "aggregate + one per-group calibration sort + one broadcast "
    "join onto the test half.",
)
def q_conformal_event_intervals(spark, sf_dir):
    from .functions.hashing import md5_long

    base = (
        _t(spark, sf_dir, "events")
        .where(F.col("value").isNotNull())
        .select(
            "event_type",
            "event_id",
            F.floor(F.col("value").cast("double") * 100.0 + 0.5)
            .cast("long")
            .alias("v"),
            (md5_long(F.col("event_id").cast("string"), "conf") % 2 == 0)
            .alias("is_calib"),
        )
    )
    return dq.conformal_intervals(
        base, "event_type", "v", "is_calib", "event_id",
        alpha_num=1, alpha_den=10,
    )


@_q(
    "quantile_normalized_doclens",
    """
WITH cells AS (
  SELECT CAST(n_chars AS BIGINT) AS v, count(*) AS cnt FROM documents GROUP BY 1
),
cum AS (
  SELECT v, CAST(cnt AS BIGINT) AS cnt,
         CAST(sum(cnt) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS cum
  FROM cells
),
tot AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM documents),
rk AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS nc,
         CAST(row_number() OVER (
           PARTITION BY source ORDER BY n_chars, doc_id) AS BIGINT) AS rnk,
         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n_g
  FROM documents
),
pos AS (
  SELECT rk.*, (rnk * tot.n_total + n_g - 1) // n_g AS p FROM rk, tot
)
SELECT pos.doc_id, pos.source, pos.nc AS n_chars, c.v AS norm_n_chars
FROM pos JOIN cum c ON pos.p > c.cum - c.cnt AND pos.p <= c.cum
ORDER BY pos.doc_id
""",
    doc="Quantile normalization of document lengths across sources "
    "(Bolstad et al. 2003; operators/quality.py:quantile_normalize): "
    "every source's length distribution is mapped onto the POOLED "
    "distribution at matching within-source quantiles — the "
    "cross-source calibration that makes per-source thresholds "
    "comparable before a global quality gate. Pure integer rank/"
    "floor-div arithmetic; pooled CDF is a bounded VALUE-CELLS "
    "relation (never a global row sort), broadcast range-joined back "
    "onto the distributed rows.",
)
def q_quantile_normalized_doclens(spark, sf_dir):
    return dq.quantile_normalize(
        _t(spark, sf_dir, "documents"), "source", "n_chars", "doc_id"
    )


@_q(
    "cross_source_dup_matrix",
    "WITH mp AS (SELECT doc_a, doc_b FROM ("
    + _oracle_of("dedup_minhash_pairs")
    + """) z),
ds AS (SELECT doc_id, source FROM documents),
pairs AS (
  SELECT least(a.source, b.source) AS src_a,
         greatest(a.source, b.source) AS src_b,
         m.doc_a, m.doc_b
  FROM mp m
  JOIN ds a ON m.doc_a = a.doc_id
  JOIN ds b ON m.doc_b = b.doc_id
),
agg AS (
  SELECT src_a, src_b, CAST(count(*) AS BIGINT) AS dup_pairs
  FROM pairs GROUP BY 1, 2
),
di AS (
  SELECT src_a, src_b, CAST(count(DISTINCT d) AS BIGINT) AS docs_involved
  FROM (
    SELECT src_a, src_b, doc_a AS d FROM pairs
    UNION ALL
    SELECT src_a, src_b, doc_b FROM pairs
  ) u GROUP BY 1, 2
),
n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY 1),
spine AS (
  SELECT a.source AS src_a, b.source AS src_b,
         CASE WHEN a.source = b.source
              THEN (a.n_docs * (a.n_docs - 1)) // 2
              ELSE a.n_docs * b.n_docs END AS possible_pairs
  FROM n a JOIN n b ON a.source <= b.source
)
SELECT s.src_a, s.src_b,
       CAST(coalesce(g.dup_pairs, 0) AS BIGINT) AS dup_pairs,
       CAST(coalesce(di.docs_involved, 0) AS BIGINT) AS docs_involved,
       s.possible_pairs,
       round(CAST(coalesce(g.dup_pairs, 0) AS DOUBLE)
             / CAST(s.possible_pairs AS DOUBLE), 6) AS dup_rate
FROM spine s
LEFT JOIN agg g ON s.src_a = g.src_a AND s.src_b = g.src_b
LEFT JOIN di ON s.src_a = di.src_a AND s.src_b = di.src_b
ORDER BY s.src_a, s.src_b
""",
    doc="Cross-source duplication matrix: verified near-dup pairs "
    "(the green minhash relation, jaccard >= 0.8) bucketed by "
    "UNORDERED source pair over the full source x source spine — "
    "pair count, distinct docs involved, possible-pair denominator "
    "and the normalized dup_rate. The corpus-composition question "
    "dedup reports answer at ingest: which feeds mirror each other "
    "(cross-source mass) vs self-repeat (diagonal mass). Everything "
    "downstream of the LSH join is two slim joins against a "
    "broadcastable (doc_id, source) projection + combinable "
    "groupBys; the spine is a bounded |sources|^2 aggregate join.",
)
def q_cross_source_dup_matrix(spark, sf_dir):
    from .session import cut_lineage

    docs = _t(spark, sf_dir, "documents")
    ds = docs.select("doc_id", "source")
    mp = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    ).select("doc_a", "doc_b")
    a = ds.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    b = ds.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    # Eager lineage cut (the dedup_threshold_curve lesson): the slim
    # source-tagged pair relation feeds TWO aggregates — lazily
    # persisted, each consumer's plan re-embeds the whole MinHash
    # subtree (audited 76 exchanges / 34 broadcasts round 12).
    pairs = cut_lineage(
        mp.join(F.broadcast(a), "doc_a")
        .join(F.broadcast(b), "doc_b")
        .select(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
            "doc_a",
            "doc_b",
        )
    )
    aggp = pairs.groupBy("src_a", "src_b").agg(
        F.count(F.lit(1)).cast("long").alias("dup_pairs")
    )
    di = (
        pairs.select("src_a", "src_b", F.col("doc_a").alias("d"))
        .unionAll(pairs.select("src_a", "src_b", F.col("doc_b").alias("d")))
        .groupBy("src_a", "src_b")
        .agg(F.countDistinct("d").cast("long").alias("docs_involved"))
    )
    n = ds.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    na = n.select(F.col("source").alias("src_a"), F.col("n_docs").alias("n_a"))
    # The spine is an unordered self-cross of the source dimension.
    # Rather than an inequality NLJ of two aggregates (whose
    # boundedness AQE's runtime limit-elision hides from the plan
    # text), the build side is a keys=[] aggregate carrying the WHOLE
    # bounded dimension in one row — broadcast 1 row, explode per
    # probe row, filter to src_a <= src_b. Same |sources|^2 output,
    # plan-provably bounded-cross.
    dim = n.agg(
        F.collect_list(
            F.struct(
                F.col("source").alias("src_b"), F.col("n_docs").alias("n_b")
            )
        ).alias("__dim")
    )
    spine = (
        na.crossJoin(F.broadcast(dim))
        .select("src_a", "n_a", F.explode("__dim").alias("b"))
        .where(F.col("src_a") <= F.col("b.src_b"))
        .select(
            "src_a",
            F.col("b.src_b").alias("src_b"),
            "n_a",
            F.col("b.n_b").alias("n_b"),
        )
        .withColumn(
            "possible_pairs",
            F.when(
                F.col("src_a") == F.col("src_b"),
                F.expr("(n_a * (n_a - 1)) div 2"),
            ).otherwise(F.col("n_a") * F.col("n_b")),
        )
        .select("src_a", "src_b", "possible_pairs")
    )
    return (
        spine.join(aggp, ["src_a", "src_b"], "left")
        .join(di, ["src_a", "src_b"], "left")
        .select(
            "src_a",
            "src_b",
            F.coalesce("dup_pairs", F.lit(0)).cast("long").alias("dup_pairs"),
            F.coalesce("docs_involved", F.lit(0))
            .cast("long")
            .alias("docs_involved"),
            "possible_pairs",
            # A single-doc source has 0 possible same-source pairs:
            # NULL rate (SQL 0/0), never an ANSI crash.
            F.when(
                F.col("possible_pairs") > 0,
                F.round(
                    F.coalesce("dup_pairs", F.lit(0)).cast("double")
                    / F.col("possible_pairs").cast("double"),
                    6,
                ),
            ).alias("dup_rate"),
        )
        .orderBy("src_a", "src_b")
    )


@_q(
    "dedup_composition_shift",
    "WITH RECURSIVE cl AS (SELECT doc_id, cluster_id FROM ("
    + _oracle_of("dedup_clusters_star")
    + """) z),
d AS (SELECT doc_id, source FROM documents),
j AS (
  SELECT d.source, (d.doc_id = cl.cluster_id) AS survives
  FROM d JOIN cl ON d.doc_id = cl.doc_id
),
agg AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_before,
         CAST(sum(CASE WHEN survives THEN 1 ELSE 0 END) AS BIGINT) AS n_after
  FROM j GROUP BY source
),
tot AS (
  SELECT CAST(sum(n_before) AS BIGINT) AS tb,
         CAST(sum(n_after) AS BIGINT) AS ta
  FROM agg
)
SELECT source, n_before, n_after, n_before - n_after AS removed,
       round(CAST(n_before AS DOUBLE) / CAST(tb AS DOUBLE), 6)
         AS share_before,
       round(CAST(n_after AS DOUBLE) / CAST(ta AS DOUBLE), 6)
         AS share_after,
       round(CAST(n_after AS DOUBLE) / CAST(ta AS DOUBLE)
             - CAST(n_before AS DOUBLE) / CAST(tb AS DOUBLE), 6)
         AS share_shift
FROM agg, tot ORDER BY source
""",
    doc="Dedup composition-shift report: per-source corpus share "
    "BEFORE vs AFTER near-dup removal (survivor = cluster "
    "representative, doc_id == min-label cluster_id from the green "
    "connected-components relation) — the side-effect audit every "
    "production dedup needs, because removing duplicates is an "
    "implicit RE-WEIGHTING of the mixture (the feed that mirrors "
    "others loses share). share_shift > 0 means dedup promoted the "
    "source. Post-clustering work is one slim join + one combinable "
    "groupBy + a broadcast 1-row totals frame (bounded-cross).",
)
def q_dedup_composition_shift(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    ).select("doc_a", "doc_b")
    cl = graph.dedup_clusters(docs, pairs)
    j = (
        docs.select("doc_id", "source")
        .join(cl, "doc_id")
        .select(
            "source",
            (F.col("doc_id") == F.col("cluster_id")).alias("survives"),
        )
    )
    aggd = j.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_before"),
        F.sum(F.when(F.col("survives"), 1).otherwise(0))
        .cast("long")
        .alias("n_after"),
    )
    tot = aggd.agg(
        F.sum("n_before").cast("long").alias("tb"),
        F.sum("n_after").cast("long").alias("ta"),
    )
    sb = F.col("n_before").cast("double") / F.col("tb").cast("double")
    sa = F.col("n_after").cast("double") / F.col("ta").cast("double")
    return (
        aggd.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_before",
            "n_after",
            (F.col("n_before") - F.col("n_after")).alias("removed"),
            F.round(sb, 6).alias("share_before"),
            F.round(sa, 6).alias("share_after"),
            F.round(sa - sb, 6).alias("share_shift"),
        )
        .orderBy("source")
    )


def _waterfill_rounds_sql(rounds: int) -> tuple[str, str, str, str]:
    """Unrolled water-filling round CTEs for the token-budget oracle.
    Returns (cte_blocks, last_capped, final_W, final_Beff)."""
    blocks = []
    prev, src = "capped0", "s0"
    for r in range(1, rounds + 1):
        blocks.append(
            f"""r{r}a AS (
  SELECT *,
    CAST(coalesce(sum(CASE WHEN NOT {prev} THEN w END) OVER (), 0)
      AS BIGINT) AS W{r},
    B - CAST(coalesce(sum(CASE WHEN {prev} THEN cap END) OVER (), 0)
      AS BIGINT) AS Beff{r}
  FROM {src}),
r{r}b AS (
  SELECT *, CASE WHEN W{r} > 0 THEN (Beff{r} * w) // W{r} ELSE 0 END
    AS prov{r}
  FROM r{r}a),
r{r} AS (SELECT *, {prev} OR prov{r} >= cap AS capped{r} FROM r{r}b)"""
        )
        prev, src = f"capped{r}", f"r{r}"
    fr = rounds + 1
    blocks.append(
        f"""fin AS (
  SELECT *,
    CAST(coalesce(sum(CASE WHEN NOT {prev} THEN w END) OVER (), 0)
      AS BIGINT) AS W{fr},
    B - CAST(coalesce(sum(CASE WHEN {prev} THEN cap END) OVER (), 0)
      AS BIGINT) AS Beff{fr}
  FROM {src})"""
    )
    return ",\n".join(blocks), prev, f"W{fr}", f"Beff{fr}"


_WF_BLOCKS, _WF_CAPPED, _WF_W, _WF_BEFF = _waterfill_rounds_sql(3)


@_q(
    "token_budget_allocation",
    f"""
WITH per AS (
  SELECT source,
         CAST(len(string_split_regex(trim(lower(text)), '\\s+')) AS BIGINT)
           AS tok,
         (n_chars >= 300) AS passes
  FROM documents
),
t AS (
  SELECT source, CAST(sum(tok) AS BIGINT) AS t,
         CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS w
  FROM per GROUP BY source
),
s0 AS (
  SELECT source, t, w, 2 * t AS cap,
         (9 * CAST(sum(t) OVER () AS BIGINT)) // 5 AS B,
         false AS capped0
  FROM t
),
{_WF_BLOCKS},
alloc AS (
  SELECT source, t, w, cap,
         CASE WHEN {_WF_CAPPED} THEN cap
              WHEN {_WF_W} > 0
                THEN least(cap, ({_WF_BEFF} * w) // {_WF_W})
              ELSE 0 END AS alloc_tokens,
         {_WF_CAPPED} AS capped
  FROM fin
)
SELECT source, t AS tokens_available, w AS weight, cap AS cap_tokens,
       alloc_tokens,
       round(CAST(alloc_tokens AS DOUBLE) / CAST(t AS DOUBLE), 6) AS epochs,
       capped
FROM alloc ORDER BY source
""",
    doc="Token-budget allocation under a repeat cap (Muennighoff et "
    "al. 2023 data-constrained scaling; operators/sampling.py:"
    "token_budget_allocation): per-source available tokens (one "
    "combinable whitespace-token aggregate) + integer quality "
    "weights (docs with n_chars >= 300), budget = 1.8x total corpus "
    "tokens, max 2 epochs per source — WATER-FILLED in 3 unrolled "
    "capping rounds + a final pass, all pure integer floor-div "
    "arithmetic on the |sources|-row stats relation. The mixture "
    "planning step that decides how many epochs of each feed a "
    "training run actually gets; capped=true marks feeds the budget "
    "wants more of than the repeat cap allows.",
)
def q_token_budget_allocation(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        "source",
        tx.token_count(F.col("text")).cast("long").alias("tok"),
        (F.col("n_chars") >= 300).alias("passes"),
    )
    stats = d.groupBy("source").agg(
        F.sum("tok").alias("tokens"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0))
        .cast("long")
        .alias("weight"),
    )
    return smp.token_budget_allocation(
        stats, "source", "tokens", "weight",
        budget_num=9, budget_den=5, repeat_cap=2, rounds=3,
    )


@_q(
    "bloom_fpr_eval",
    """
WITH build AS (
  SELECT DISTINCT CAST(c_custkey AS BIGINT) AS key
  FROM customer WHERE c_mktsegment = 'AUTOMOBILE' AND c_custkey IS NOT NULL
),
bh AS (
  SELECT key,
         CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15) AS BIGINT) AS h1,
         CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 16, 13) AS BIGINT) AS h2
  FROM build
),
bpos AS (
  SELECT DISTINCT (h1 + i * h2) % 2048 AS pos
  FROM bh, (VALUES (0), (1)) AS ii(i)
),
probe AS (
  SELECT DISTINCT CAST(user_id AS BIGINT) AS key
  FROM events WHERE user_id IS NOT NULL
),
ph AS (
  SELECT key,
         CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 1, 15) AS BIGINT) AS h1,
         CAST('0x' || substr(md5(CAST(key AS VARCHAR)), 16, 13) AS BIGINT) AS h2
  FROM probe
),
flags AS (
  SELECT key,
         ((h1 % 2048) IN (SELECT pos FROM bpos))
           AND (((h1 + h2) % 2048) IN (SELECT pos FROM bpos)) AS passes,
         key IN (SELECT key FROM build) AS is_member
  FROM ph
),
nb AS (SELECT CAST(count(*) AS BIGINT) AS n_build_keys FROM build),
ag AS (
  SELECT CAST(count(*) AS BIGINT) AS n_probe_keys,
         CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
         CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
           AS n_members,
         CAST(sum(CASE WHEN passes AND NOT is_member THEN 1 ELSE 0 END)
           AS BIGINT) AS n_false_pos,
         CAST(sum(CASE WHEN is_member AND NOT passes THEN 1 ELSE 0 END)
           AS BIGINT) AS n_missed_members
  FROM flags
)
SELECT nb.n_build_keys, ag.n_probe_keys, ag.n_pass, ag.n_members,
       ag.n_false_pos, ag.n_missed_members,
       round(CAST(ag.n_false_pos AS DOUBLE)
             / CAST(ag.n_probe_keys - ag.n_members AS DOUBLE), 6) AS fpr,
       round(2.0 * CAST(nb.n_build_keys AS DOUBLE) / 2048.0, 6)
         AS load_factor,
       round((2.0 * CAST(nb.n_build_keys AS DOUBLE) / 2048.0)
             * (2.0 * CAST(nb.n_build_keys AS DOUBLE) / 2048.0), 6)
         AS fp_bound
FROM nb, ag
""",
    doc="Measured false-positive rate of the Bloom prefilter "
    "(operators/joins.py:bloom_prefilter_fpr_stats) — the accuracy "
    "eval completing the sketch tier's no-sketch-without-an-error-"
    "report rule (KMV rel_err / CMS overcount / HLL bias / histogram "
    "bound / minhash-simhash recall; Bloom was the one member "
    "without one). Deliberately UNDERSIZED image (2 Kibit for ~300 "
    "AUTOMOBILE keys, load 0.29) so the false-positive regime is "
    "real at fixture scale: reports measured fpr vs the (kn/m)^k "
    "sizing bound, and PROVES the no-false-negative contract "
    "(n_missed_members column, structurally 0). Two distinct-key "
    "aggregates + broadcast position joins; nothing quadratic.",
)
def q_bloom_fpr_eval(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select("user_id")
    c = _t(spark, sf_dir, "customer").where(
        F.col("c_mktsegment") == "AUTOMOBILE"
    ).select("c_custkey")
    return joins.bloom_prefilter_fpr_stats(
        e, c, "user_id", "c_custkey", m_bits=2048, k=2
    )


def _band_candidates_sql(k: int = 12, bands_list: tuple = (2, 3, 4, 6)) -> str:
    """CTE blocks: MinHash sig once, candidate pairs per banding
    (DuckDB twin of operators/dedup.py:minhash_band_candidates)."""
    mh_cols = ",\n         ".join(
        f"list_min(list_transform(shingles, s -> {md5_family_sql('s', i)}))"
        f" AS mh{i}"
        for i in range(k)
    )
    parts = []
    for bands in bands_list:
        rows = k // bands
        band_cols = ",\n         ".join(
            "md5(concat_ws('|', "
            + ", ".join(f"CAST(mh{b * rows + r} AS VARCHAR)" for r in range(rows))
            + f")) AS band{b}"
            for b in range(bands)
        )
        band_union = "\nUNION ALL\n".join(
            f"SELECT doc_id, {b} AS band_id, band{b} AS key FROM banded{bands}"
            for b in range(bands)
        )
        parts.append(
            f"""banded{bands} AS (
  SELECT doc_id,
         {band_cols}
  FROM sig
),
bl{bands} AS ({band_union}),
cand{bands} AS (
  SELECT DISTINCT CAST({bands} AS INT) AS bands,
         CAST({rows} AS INT) AS rows_per_band,
         a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bl{bands} a JOIN bl{bands} b
    ON a.band_id = b.band_id AND a.key = b.key AND a.doc_id < b.doc_id
)"""
        )
    union = "\nUNION ALL\n".join(f"SELECT * FROM cand{b}" for b in bands_list)
    return (
        f"""sig AS MATERIALIZED (
  SELECT doc_id,
         {mh_cols}
  FROM sh WHERE len(shingles) > 0
),
"""
        + ",\n".join(parts)
        + f""",
cands AS ({union})"""
    )


@_q(
    "minhash_band_tuning_curve",
    f"""
WITH {_SHINGLES_CTE},
{_band_candidates_sql(k=12, bands_list=(2, 3, 4, 6))},
ex AS MATERIALIZED (
  SELECT doc_a, doc_b FROM (
    WITH exx AS (
      SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh, unnest(shingles) AS s
      FROM sh
    ),
    c AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.n_sh AS na, b.n_sh AS nb,
             count(*) AS common
      FROM exx a JOIN exx b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    )
    SELECT doc_a, doc_b
    FROM c
    WHERE round(CAST(common AS DOUBLE) / CAST(na + nb - common AS DOUBLE), 6)
          >= 0.8
  ) q
),
per AS (
  SELECT c.bands, c.rows_per_band,
         CAST(count(*) AS BIGINT) AS n_candidates,
         CAST(sum(CASE WHEN e.doc_a IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_common
  FROM cands c
  LEFT JOIN ex e ON c.doc_a = e.doc_a AND c.doc_b = e.doc_b
  GROUP BY 1, 2
),
t AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM ex),
spine AS (
  SELECT CAST(v.bands AS INT) AS bands,
         CAST(12 / v.bands AS INT) AS rows_per_band
  FROM (VALUES (2), (3), (4), (6)) AS v(bands)
)
SELECT s.bands, s.rows_per_band,
       CAST(coalesce(p.n_candidates, 0) AS BIGINT) AS n_candidates,
       t.n_truth,
       CAST(coalesce(p.n_common, 0) AS BIGINT) AS n_common,
       CASE WHEN t.n_truth > 0
         THEN round(CAST(coalesce(p.n_common, 0) AS DOUBLE)
                    / CAST(t.n_truth AS DOUBLE), 6) END AS recall,
       CASE WHEN coalesce(p.n_candidates, 0) > 0
         THEN round(CAST(p.n_common AS DOUBLE)
                    / CAST(p.n_candidates AS DOUBLE), 6) END AS precision
FROM spine s
LEFT JOIN per p ON s.bands = p.bands
CROSS JOIN t
ORDER BY s.bands
""",
    doc="MinHash banding S-curve, measured (operators/dedup.py:"
    "minhash_band_candidates): CANDIDATE recall and precision at "
    "bands = 2/3/4/6 of the SAME 12-hash signature vs the exact "
    "3-gram-Jaccard >= 0.8 ground truth. minhash_recall_eval grades "
    "the one shipped banding (4x3) after verification; this is the "
    "eval that CHOOSES the banding — more bands buys recall with "
    "candidate volume (the verification bill), and the curve shows "
    "where the knee is. Signatures computed once and shared; each "
    "banding is one bucketed slim self-join; the comparison joins "
    "bounded pair relations.",
    scale_note="eval-tier — the exact ground-truth arm inherits "
    "ngram_jaccard_exact's superlinear recall-baseline cost; at "
    "corpus scale replay on an md5-capped subsample (the "
    "simhash_recall_eval sampling pattern)",
)
def q_minhash_band_tuning_curve(spark, sf_dir):
    from .session import cut_lineage

    d = _t(spark, sf_dir, "documents")
    cands = dd.minhash_band_candidates(
        d, "doc_id", "text", k=12, bands_list=(2, 3, 4, 6)
    ).withColumn("rows_per_band", (F.lit(12) / F.col("bands")).cast("int"))
    # Eager lineage cut (the dedup_threshold_curve lesson): the exact
    # truth relation — a full shingle self-join — feeds BOTH the
    # per-banding join and the n_truth broadcast; lazily persisted it
    # was re-embedded in each consumer's plan (audited 98 exchanges
    # round 12).
    truth = cut_lineage(
        dd.ngram_jaccard_pairs(
            d, "doc_id", "text", n=3, threshold=0.8, max_doc_freq=None
        ).select("doc_a", "doc_b", F.lit(1).alias("e"))
    )
    per = (
        cands.join(truth, ["doc_a", "doc_b"], "left")
        .groupBy("bands", "rows_per_band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_candidates"),
            F.sum(F.coalesce("e", F.lit(0))).cast("long").alias("n_common"),
        )
    )
    t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    spine = spark.createDataFrame(
        [(b, 12 // b) for b in (2, 3, 4, 6)], ["bands", "rows_per_band"]
    ).select(
        F.col("bands").cast("int").alias("bands"),
        F.col("rows_per_band").cast("int").alias("rows_per_band"),
    )
    rec = F.when(
        F.col("n_truth") > 0,
        F.round(
            F.coalesce("n_common", F.lit(0)).cast("double")
            / F.col("n_truth").cast("double"),
            6,
        ),
    )
    prec = F.when(
        F.coalesce("n_candidates", F.lit(0)) > 0,
        F.round(
            F.col("n_common").cast("double")
            / F.col("n_candidates").cast("double"),
            6,
        ),
    )
    return (
        spine.join(per, ["bands", "rows_per_band"], "left")
        .crossJoin(F.broadcast(t))
        .select(
            "bands",
            "rows_per_band",
            F.coalesce("n_candidates", F.lit(0))
            .cast("long")
            .alias("n_candidates"),
            "n_truth",
            F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
            rec.alias("recall"),
            prec.alias("precision"),
        )
        .orderBy("bands")
    )


_INT8_QZ_CTE = """base AS (
  SELECT vec_id, embedding,
         list_aggregate(list_transform(embedding,
                                       x -> abs(CAST(x AS DOUBLE))), 'max')
           AS m
  FROM embeddings
),
qz AS (
  SELECT vec_id, embedding,
         list_transform(embedding,
                        x -> CAST(round(CAST(x AS DOUBLE) * 127.0 / m)
                                  AS INT)) AS qvec
  FROM base WHERE m > 0
)"""


@_q(
    "int8_recall_eval",
    f"""
WITH {_INT8_QZ_CTE},
rc AS (
  SELECT round({cosine_sql('embedding', 'qvec', _EMB_DIM)}, 6) AS c FROM qz
),
mr AS (
  SELECT CAST(count(*) AS BIGINT) AS n_vectors,
         round(CAST(sum(CAST(c AS DECIMAL(18,6))) AS DOUBLE)
               / CAST(count(*) AS DOUBLE), 6) AS mean_recon_cosine
  FROM rc
),
q AS (
  SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 20
),
brute AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, e.vec_id,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({cosine_sql('e.embedding', 'q.qv', _EMB_DIM)}, 6)
                        DESC,
                      e.vec_id ASC) AS rn
    FROM embeddings e, q
  ) WHERE rn <= 10
),
i8 AS (
  SELECT qid, vec_id FROM (
    SELECT q.qid, z.vec_id,
           row_number() OVER (
             PARTITION BY q.qid
             ORDER BY round({cosine_sql('z.qvec', 'q.qv', _EMB_DIM)}, 6)
                        DESC,
                      z.vec_id ASC) AS rn
    FROM qz z, q
  ) WHERE rn <= 10
),
h AS (
  SELECT CAST(count(*) AS BIGINT) AS total_hits
  FROM brute b JOIN i8 ON b.qid = i8.qid AND b.vec_id = i8.vec_id
),
nq AS (SELECT CAST(count(*) AS BIGINT) AS n_queries FROM q)
SELECT mr.n_vectors, mr.mean_recon_cosine, nq.n_queries, h.total_hits,
       round(CAST(h.total_hits AS DOUBLE)
             / (CAST(nq.n_queries AS DOUBLE) * 10.0), 6)
         AS mean_recall_at_10
FROM mr, nq, h
""",
    doc="Accuracy eval for the int8 scalar quantization "
    "(quantized_embeddings; operators/similarity.py:"
    "quantize_embeddings) — the eval the quantization tier owed "
    "(PQ has pq_recall_eval, JL has jl_distortion_pairs): mean "
    "per-vector reconstruction cosine (scale cancels in cosine, so "
    "it is measured against the raw int codes; per-vector values "
    "rounded 6dp then accumulated in DECIMAL — order-independent) "
    "and recall@10 of full-precision queries against the QUANTIZED "
    "corpus vs the exact ranking, over the standard 20-query set. "
    "The 4x-shrink-for-how-much-recall number an index deployment "
    "decides on. Single quantize+cosine scan feeds the distortion "
    "arm; both rank arms are one corpus scan each.",
)
def q_int8_recall_eval(spark, sf_dir):
    from .functions.vectors import cosine
    from .session import track_persist

    emb = _t(spark, sf_dir, "embeddings")
    absmax = F.array_max(
        F.transform(F.col("embedding"), lambda x: F.abs(x.cast("double")))
    )
    qz = track_persist(
        emb.withColumn("__m", absmax)
        .where(F.col("__m") > 0)
        .select(
            "vec_id",
            "embedding",
            F.transform(
                F.col("embedding"),
                lambda x: F.round(
                    x.cast("double") * F.lit(127.0) / F.col("__m")
                ).cast("int"),
            ).alias("qvec"),
        )
    )
    rc = qz.select(
        F.round(cosine(F.col("embedding"), F.col("qvec")), 6).alias("c")
    )
    mr = rc.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.round(
            F.sum(F.col("c").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("mean_recon_cosine"),
    )
    qs = emb.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    brute = sim.cosine_topk_batch(emb, qs, k=10).select("qid", "vec_id")
    i8 = sim.cosine_topk_batch(
        qz.select("vec_id", F.col("qvec").alias("embedding")), qs, k=10
    ).select("qid", "vec_id")
    h = brute.join(i8, ["qid", "vec_id"]).agg(
        F.count(F.lit(1)).cast("long").alias("total_hits")
    )
    nq = qs.agg(F.count(F.lit(1)).cast("long").alias("n_queries"))
    return (
        mr.crossJoin(F.broadcast(nq))
        .crossJoin(F.broadcast(h))
        .select(
            "n_vectors",
            "mean_recon_cosine",
            "n_queries",
            "total_hits",
            # NULL recall with zero queries (empty relation) — SQL
            # division semantics, never an ANSI crash.
            F.when(
                F.col("n_queries") > 0,
                F.round(
                    F.col("total_hits").cast("double")
                    / (F.col("n_queries").cast("double") * F.lit(10.0)),
                    6,
                ),
            ).alias("mean_recall_at_10"),
        )
    )


@_q(
    "time_weighted_event_means",
    """
WITH base AS (
  SELECT event_type, event_id,
         CAST(FLOOR(CAST(value AS DOUBLE) * 100.0 + 0.5) AS BIGINT) AS v,
         epoch_us(ts) AS t
  FROM events WHERE value IS NOT NULL
),
stepped AS (
  SELECT event_type, v,
         lead(t) OVER (PARTITION BY event_type ORDER BY t, event_id) - t
           AS dt
  FROM base
),
agg AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_points,
         CAST(sum(v) AS BIGINT) AS sum_v,
         CAST(sum(CASE WHEN dt IS NOT NULL THEN dt END) AS BIGINT)
           AS span_us,
         sum(CASE WHEN dt IS NOT NULL THEN CAST(v AS HUGEINT) * dt END)
           AS sum_vdt
  FROM stepped GROUP BY event_type
)
SELECT event_type, n_points,
       CAST(coalesce(span_us, 0) AS BIGINT) AS span_us,
       round(CAST(sum_v AS DOUBLE) / CAST(n_points AS DOUBLE) / 100.0, 6)
         AS naive_mean,
       CASE WHEN span_us > 0 THEN
         round(CAST(sum_vdt AS DOUBLE) / CAST(span_us AS DOUBLE) / 100.0, 6)
       END AS time_weighted_mean
FROM agg ORDER BY event_type
""",
    doc="Time-weighted mean event value per type over the IRREGULAR "
    "event stream (operators/timeseries.py:time_weighted_mean) — the "
    "TSDB-standard LOCF integral (TimescaleDB time_weight): each "
    "value holds until the next observation, so burst seconds stop "
    "over-weighting the mean; reported NEXT to the naive row mean so "
    "the sampling bias is visible per type. Exact DECIMAL(38,0) "
    "value*microsecond products (the per-row product exits int64); "
    "per-type lead() windows, parallel across types, never global.",
)
def q_time_weighted_event_means(spark, sf_dir):
    e = _t(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        "ts",
        F.floor(F.col("value").cast("double") * 100.0 + 0.5)
        .cast("long")
        .alias("v"),
    )
    return ts_ops.time_weighted_mean(e, "event_type", "ts", "v", "event_id")


@_q(
    "pretraining_data_report",
    "WITH comp AS (SELECT * FROM ("
    + _oracle_of("dedup_composition_shift")
    + ") z1),\nleak AS (SELECT * FROM ("
    + _oracle_of("split_leakage_audit")
    + ") z2),\nbud AS (SELECT * FROM ("
    + _oracle_of("token_budget_allocation")
    + ") z3),\nimg AS (SELECT * FROM ("
    + _oracle_of("image_neardup_pairs")
    + ") z4),\nafp AS (SELECT * FROM ("
    + _oracle_of("audio_fingerprints")
    + """) z5),
a AS (
  -- coalesce: n_docs is a COUNT-like total (0 on an empty corpus,
  -- matching the Spark pane's count aggregate), not a NULL sum.
  SELECT CAST(coalesce(sum(n_before), 0) AS BIGINT) AS n_docs,
         CAST(sum(n_after) AS BIGINT) AS n_survivors
  FROM comp
),
b AS (
  SELECT CAST(sum(CASE WHEN strategy = 'naive_hash'
                       THEN leaking_pairs ELSE 0 END) AS BIGINT)
           AS naive_leaked_pairs,
         CAST(sum(CASE WHEN strategy = 'cluster_keyed'
                       THEN leaking_pairs ELSE 0 END) AS BIGINT)
           AS clusterkeyed_leaked_pairs
  FROM leak
),
c AS (
  SELECT CAST(sum(tokens_available) AS BIGINT) AS total_tokens,
         CAST(sum(alloc_tokens) AS BIGINT) AS alloc_tokens,
         CAST(sum(CASE WHEN capped THEN 1 ELSE 0 END) AS BIGINT)
           AS n_sources_capped
  FROM bud
),
i1 AS (SELECT CAST(count(*) AS BIGINT) AS n_image_dup_pairs FROM img),
i2 AS (
  SELECT CAST(count(DISTINCT d) AS BIGINT) AS n_image_dup_docs
  FROM (SELECT doc_a AS d FROM img UNION ALL SELECT doc_b FROM img) u
),
a2 AS (
  SELECT CAST(count(*) AS BIGINT) AS n_audio_dup_pairs
  FROM afp x JOIN afp y
    ON x.doc_id < y.doc_id AND bit_count(xor(x.afp, y.afp)) <= 6
)
SELECT a.n_docs, a.n_survivors,
       round(CAST(a.n_survivors AS DOUBLE) / CAST(a.n_docs AS DOUBLE), 6)
         AS survivor_rate,
       b.naive_leaked_pairs, b.clusterkeyed_leaked_pairs,
       c.total_tokens, c.alloc_tokens, c.n_sources_capped,
       round(CAST(c.alloc_tokens AS DOUBLE) / CAST(c.total_tokens AS DOUBLE),
             6) AS mean_epochs,
       i1.n_image_dup_pairs, i2.n_image_dup_docs,
       round(CAST(i2.n_image_dup_docs AS DOUBLE) / CAST(a.n_docs AS DOUBLE),
             6) AS image_dup_doc_rate,
       a2.n_audio_dup_pairs
FROM a, b, c, i1, i2, a2
""",
    doc="One-row pretraining-data readiness pane — the curation "
    "tier's dashboard in the corpus_health_report / "
    "event_drift_report / retrieval_health_report mold: dedup "
    "survivor count and rate (CC representatives), near-dup pairs "
    "LEAKING across train/val/test under the naive hash split vs "
    "the cluster-keyed split (the latter structurally 0 — proven "
    "every sweep, not asserted), the token-budget outcome (corpus "
    "tokens, allocated tokens = mean epochs, sources hitting the "
    "repeat cap), and — round 11 — the MULTIMODAL dup tier next to "
    "the text one: image near-dup pairs/docs/rate (dHash + the "
    "scale-safe MIH join) and audio near-dup pairs (0 on this "
    "fixture — the PCM has no pairs inside the lossless radius, and "
    "the count PROVES that per sweep rather than assuming it). Every "
    "member reuses the green operators; the Spark plan computes the "
    "LSH pair relation ONCE (persisted) and feeds clustering and "
    "both leakage arms from it; the oracle composes the member "
    "oracle strings verbatim via _oracle_of.",
)
def q_pretraining_data_report(spark, sf_dir):
    from .operators import packing as pk
    from .session import cut_lineage

    docs = _t(spark, sf_dir, "documents")
    # Eager lineage cuts, not lazy persists: the pane broadcasts its
    # arms on separate threads (each crossJoin(broadcast(x)) arm
    # materializes concurrently), and concurrent first-computations
    # race past a lazy persist's unpopulated cache — round 11 measured
    # the pane re-running the fingerprint/LSH subtrees (+6.1s). Each
    # slim relation is materialized exactly once, up front.
    pairs = cut_lineage(
        dd.minhash_lsh_pairs(
            docs, "doc_id", "text", k=12, bands=4, threshold=0.8
        ).select("doc_a", "doc_b")
    )
    cl = cut_lineage(graph.dedup_clusters(docs, pairs))
    a = cl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(
            F.when(F.col("doc_id") == F.col("cluster_id"), 1).otherwise(0)
        )
        .cast("long")
        .alias("n_survivors"),
    )

    def leaked(assign: DataFrame) -> DataFrame:
        sa = assign.select(
            F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")
        )
        sb = assign.select(
            F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")
        )
        return (
            pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .where(F.col("sa") != F.col("sb"))
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )

    naive = pk.split_assign(docs).select("doc_id", "split")
    safe = pk.split_assign(cl, key_col="cluster_id").select(
        "doc_id", "split"
    )
    b_n = leaked(naive).withColumnRenamed("n", "naive_leaked_pairs")
    b_c = leaked(safe).withColumnRenamed("n", "clusterkeyed_leaked_pairs")

    d = docs.select(
        "source",
        tx.token_count(F.col("text")).cast("long").alias("tok"),
        (F.col("n_chars") >= 300).alias("passes"),
    )
    stats = d.groupBy("source").agg(
        F.sum("tok").alias("tokens"),
        F.sum(F.when(F.col("passes"), 1).otherwise(0))
        .cast("long")
        .alias("weight"),
    )
    c = smp.token_budget_allocation(
        stats, "source", "tokens", "weight",
        budget_num=9, budget_den=5, repeat_cap=2, rounds=3,
    ).agg(
        F.sum("tokens_available").cast("long").alias("total_tokens"),
        F.sum("alloc_tokens").cast("long").alias("alloc_tokens"),
        F.sum(F.when(F.col("capped"), 1).otherwise(0))
        .cast("long")
        .alias("n_sources_capped"),
    )
    # Multimodal dup tier: image near-dup pairs via the scale-safe MIH
    # join (lineage-cut — the pair relation feeds both the count and
    # the distinct-doc aggregate, whose broadcasts race a lazy cache)
    # and audio pairs over the PCM fingerprints.
    ip = cut_lineage(
        mm.hamming_neardup_pairs_mih(
            mm.image_dhash(mm.attach_bmp_payload(docs))
        )
    )
    i1 = ip.agg(F.count(F.lit(1)).cast("long").alias("n_image_dup_pairs"))
    i2 = ip.select(
        F.explode(F.array("doc_a", "doc_b")).alias("d")
    ).agg(F.countDistinct("d").cast("long").alias("n_image_dup_docs"))
    # Audio arm lineage-cut too (r12 verdict #6): single consumer
    # TODAY, but the pane's history (+6.1s in r11 from exactly this
    # re-computation class) says cut every arm BEFORE it grows one.
    ap = cut_lineage(
        mm.hamming_neardup_pairs_mih(
            mm.audio_fingerprint(mm.attach_wav_payload(docs)).select(
                "doc_id", F.col("afp").alias("dhash")
            )
        )
    )
    a2 = ap.agg(F.count(F.lit(1)).cast("long").alias("n_audio_dup_pairs"))
    return (
        a.crossJoin(F.broadcast(b_n))
        .crossJoin(F.broadcast(b_c))
        .crossJoin(F.broadcast(c))
        .crossJoin(F.broadcast(i1))
        .crossJoin(F.broadcast(i2))
        .crossJoin(F.broadcast(a2))
        .select(
            "n_docs",
            "n_survivors",
            # Every pane ratio is guarded for the zero-denominator
            # (empty corpus) case — NULL, SQL semantics, never an
            # ANSI crash.
            F.when(
                F.col("n_docs") > 0,
                F.round(
                    F.col("n_survivors").cast("double")
                    / F.col("n_docs").cast("double"),
                    6,
                ),
            ).alias("survivor_rate"),
            "naive_leaked_pairs",
            "clusterkeyed_leaked_pairs",
            "total_tokens",
            "alloc_tokens",
            "n_sources_capped",
            F.when(
                F.col("total_tokens") > 0,
                F.round(
                    F.col("alloc_tokens").cast("double")
                    / F.col("total_tokens").cast("double"),
                    6,
                ),
            ).alias("mean_epochs"),
            "n_image_dup_pairs",
            "n_image_dup_docs",
            F.when(
                F.col("n_docs") > 0,
                F.round(
                    F.col("n_image_dup_docs").cast("double")
                    / F.col("n_docs").cast("double"),
                    6,
                ),
            ).alias("image_dup_doc_rate"),
            "n_audio_dup_pairs",
        )
    )


@_q(
    "modality_dup_matrix",
    f"""
WITH tp AS (SELECT doc_a, doc_b FROM ({_minhash_oracle(k=12, bands=4, threshold=0.8)}) z),
isig AS (
  SELECT doc_id, {_DHASH_SQL} AS dhash
  FROM (SELECT doc_id,
               8 + (doc_id % 5) * 4 AS w,
               6 + (doc_id % 3) * 6 AS h
        FROM documents) dims
),
ip AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM isig a JOIN isig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
),
asig AS (
  SELECT doc_id, afp FROM (
    {_WAV_ORACLE_BASE.strip()},
    t AS (
      SELECT w.doc_id, w.data_len, d.text, strlen(d.text) AS sl
      FROM w JOIN documents d USING (doc_id)
    )
    SELECT doc_id, {_AFP_SQL} AS afp FROM t
  ) q
),
ap AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM asig a JOIN asig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.afp, b.afp)) <= 6
),
dup AS (
  SELECT 'text' AS modality, doc_a AS doc_id FROM tp
  UNION SELECT 'text', doc_b FROM tp
  UNION SELECT 'image', doc_a FROM ip
  UNION SELECT 'image', doc_b FROM ip
  UNION SELECT 'audio', doc_a FROM ap
  UNION SELECT 'audio', doc_b FROM ap
),
srcs AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY source
),
mods AS (SELECT unnest(['audio', 'image', 'text']) AS modality),
ds AS (
  SELECT u.modality, d.source,
         CAST(count(DISTINCT u.doc_id) AS BIGINT) AS n_dup_docs
  FROM dup u JOIN documents d USING (doc_id)
  GROUP BY 1, 2
)
SELECT m.modality, s.source, s.n_docs,
       CAST(coalesce(ds.n_dup_docs, 0) AS BIGINT) AS n_dup_docs,
       round(CAST(coalesce(ds.n_dup_docs, 0) AS DOUBLE)
             / CAST(s.n_docs AS DOUBLE), 6) AS dup_doc_rate
FROM mods m CROSS JOIN srcs s
LEFT JOIN ds ON ds.modality = m.modality AND ds.source = s.source
ORDER BY m.modality, s.source
""",
    doc="Cross-modal duplication matrix — the (modality × source) "
    "pane completing the reporting symmetry (text dedup rates r10, "
    "contamination direction r11, modality r12): for each ingestion "
    "source, how many of its documents participate in >= 1 near-dup "
    "pair under each modality's production matcher (text: MinHash "
    "12/4 + exact-Jaccard >= 0.8; image: dHash + MIH hamming <= 6; "
    "audio: PCM fingerprint + MIH hamming <= 6 — 0-proven on this "
    "fixture, the honest empty arm). Each pair relation computes "
    "once, explodes to its dup-doc set, and one combinable groupBy "
    "against the broadcast (doc, source) map fills a modality × "
    "source spine (bounded 3 × |sources| cross). The answer to "
    "'WHICH feed is polluting WHICH modality' before reweighting a "
    "mixture.",
)
def q_modality_dup_matrix(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    src = docs.select("doc_id", "source")
    tp = dd.minhash_lsh_pairs(
        docs, "doc_id", "text", k=12, bands=4, threshold=0.8
    ).select("doc_a", "doc_b")
    ip = mm.hamming_neardup_pairs_mih(
        mm.image_dhash(mm.attach_bmp_payload(docs))
    ).select("doc_a", "doc_b")
    ap = mm.hamming_neardup_pairs_mih(
        mm.audio_fingerprint(mm.attach_wav_payload(docs)).select(
            "doc_id", F.col("afp").alias("dhash")
        )
    ).select("doc_a", "doc_b")

    def dup_docs(pairs: DataFrame, modality: str) -> DataFrame:
        return pairs.select(
            F.lit(modality).alias("modality"),
            F.explode(F.array("doc_a", "doc_b")).alias("doc_id"),
        ).distinct()

    dup = (
        dup_docs(tp, "text")
        .unionByName(dup_docs(ip, "image"))
        .unionByName(dup_docs(ap, "audio"))
    )
    ds = (
        dup.join(src, "doc_id")
        .groupBy("modality", "source")
        .agg(F.countDistinct("doc_id").cast("long").alias("n_dup_docs"))
    )
    base = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    mods = spark.createDataFrame(
        [("audio",), ("image",), ("text",)], "modality string"
    )
    # Broadcast the LITERAL side (3 rows, LocalTableScan — provably
    # bounded in plan text); per-source counts stay the stream side.
    return (
        base.crossJoin(F.broadcast(mods))
        .join(ds, ["modality", "source"], "left")
        .select(
            "modality",
            "source",
            "n_docs",
            F.coalesce("n_dup_docs", F.lit(0))
            .cast("long")
            .alias("n_dup_docs"),
            F.round(
                F.coalesce("n_dup_docs", F.lit(0)).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_doc_rate"),
        )
        .orderBy("modality", "source")
    )


@_q(
    "multimodal_curation_funnel",
    f"""
WITH {_CURATE_Q_CTE},
{_CURATE_KEEP_CTE},
isig AS (
  SELECT doc_id, {_DHASH_SQL} AS dhash
  FROM (SELECT doc_id,
               8 + (doc_id % 5) * 4 AS w,
               6 + (doc_id % 3) * 6 AS h
        FROM documents) dims
),
idrop AS (
  SELECT DISTINCT b.doc_id
  FROM isig a JOIN isig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
),
asig AS (
  SELECT doc_id, afp FROM (
    {_WAV_ORACLE_BASE.strip()},
    t AS (
      SELECT w.doc_id, w.data_len, d.text, strlen(d.text) AS sl
      FROM w JOIN documents d USING (doc_id)
    )
    SELECT doc_id, {_AFP_SQL} AS afp FROM t
  ) aq
),
adrop AS (
  SELECT DISTINCT b.doc_id
  FROM asig a JOIN asig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.afp, b.afp)) <= 6
),
{_VIDEO_SIG_CTE.strip()},
vdrop AS (
  SELECT DISTINCT doc_b AS doc_id FROM (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM vsig a
    JOIN vsig b ON a.doc_id < b.doc_id AND a.frame_idx = b.frame_idx
    WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
    GROUP BY 1, 2
    HAVING count(*) >= 2
  ) vp
),
fl AS (
  SELECT d.source,
         CASE WHEN k.doc_id IS NOT NULL THEN 1 ELSE 0 END AS s1,
         CASE WHEN k.doc_id IS NOT NULL
                   AND q.quality_score >= 0.45 THEN 1 ELSE 0 END AS s2,
         CASE WHEN k.doc_id IS NOT NULL
                   AND q.quality_score >= 0.45
                   AND q.n_tokens BETWEEN 5 AND 5000 THEN 1 ELSE 0 END AS s3,
         CASE WHEN k.doc_id IS NOT NULL
                   AND q.quality_score >= 0.45
                   AND q.n_tokens BETWEEN 5 AND 5000
                   AND i.doc_id IS NULL THEN 1 ELSE 0 END AS s4,
         CASE WHEN k.doc_id IS NOT NULL
                   AND q.quality_score >= 0.45
                   AND q.n_tokens BETWEEN 5 AND 5000
                   AND i.doc_id IS NULL
                   AND aa.doc_id IS NULL THEN 1 ELSE 0 END AS s5,
         CASE WHEN k.doc_id IS NOT NULL
                   AND q.quality_score >= 0.45
                   AND q.n_tokens BETWEEN 5 AND 5000
                   AND i.doc_id IS NULL
                   AND aa.doc_id IS NULL
                   AND v.doc_id IS NULL THEN 1 ELSE 0 END AS s6
  FROM documents d
  LEFT JOIN keep k ON d.doc_id = k.doc_id
  JOIN q ON d.doc_id = q.doc_id
  LEFT JOIN idrop i ON d.doc_id = i.doc_id
  LEFT JOIN adrop aa ON d.doc_id = aa.doc_id
  LEFT JOIN vdrop v ON d.doc_id = v.doc_id
)
SELECT source,
       CAST(count(*) AS BIGINT) AS n_raw,
       CAST(sum(s1) AS BIGINT) AS n_text_dedup,
       CAST(sum(s2) AS BIGINT) AS n_quality,
       CAST(sum(s3) AS BIGINT) AS n_length,
       CAST(sum(s4) AS BIGINT) AS n_image_dedup,
       CAST(sum(s5) AS BIGINT) AS n_audio_dedup,
       CAST(sum(s6) AS BIGINT) AS n_final,
       round(CAST(sum(s6) AS DOUBLE) / count(*), 6) AS survival_rate
FROM fl
GROUP BY source
""",
    doc="Modality-aware curation funnel (verdict r12 item #7) — "
    "curation_funnel_by_source extended with the multimodal near-dup "
    "cut stages the tier now implements: raw → text fingerprint-dedup "
    "survivors → + quality >= 0.45 → + token bounds → + image "
    "near-dup cut (dHash + MIH hamming <= 6) → + audio near-dup cut "
    "(PCM fingerprint + MIH hamming <= 6) → + video near-dup cut "
    "(>= 2 aligned frames within hamming 6), with end-to-end "
    "survival. Each modality cut applies the keep-lowest-id rule (a "
    "doc is dropped iff it is the higher id of some near-dup pair — "
    "deterministic, matches the pair relations' doc_a < doc_b "
    "convention). The first four columns are BY CONSTRUCTION equal "
    "to curation_funnel_by_source's (same shared CTEs oracle-side, "
    "same operators Spark-side; pytest-pinned), so the multimodal "
    "stages' marginal losses are exactly attributable. Stage flags "
    "are conditional sums in ONE source-keyed aggregate; the only "
    "shuffles are the relations each stage already needs, and every "
    "modality pair join is the scale-safe MIH bucketed join.",
)
def q_multimodal_curation_funnel(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    qf = tx.quality_features(docs, "doc_id", "text").select(
        "doc_id", "quality_score", "n_tokens"
    )
    keep = (
        tx.doc_fingerprints(docs, "doc_id", "text")
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id", F.lit(1).alias("is_keep"))
    )

    def drop_set(pairs: DataFrame, b_col: str, flag: str) -> DataFrame:
        return (
            pairs.select(F.col(b_col).alias("doc_id"))
            .distinct()
            .withColumn(flag, F.lit(1))
        )

    idrop = drop_set(
        mm.hamming_neardup_pairs_mih(
            mm.image_dhash(mm.attach_bmp_payload(docs))
        ),
        "doc_b",
        "img_dup",
    )
    adrop = drop_set(
        mm.hamming_neardup_pairs_mih(
            mm.audio_fingerprint(mm.attach_wav_payload(docs)).select(
                "doc_id", F.col("afp").alias("dhash")
            )
        ),
        "doc_b",
        "aud_dup",
    )
    vdrop = drop_set(
        mm.video_neardup_pairs(
            mm.video_frame_fingerprints(
                mm.attach_avi_payload(docs), stride=2
            )
        ),
        "video_b",
        "vid_dup",
    )
    fl = (
        docs.select("doc_id", "source")
        .join(keep, "doc_id", "left")
        .join(qf, "doc_id")
        .join(idrop, "doc_id", "left")
        .join(adrop, "doc_id", "left")
        .join(vdrop, "doc_id", "left")
    )
    s1 = F.col("is_keep").isNotNull()
    s2 = s1 & (F.col("quality_score") >= 0.45)
    s3 = s2 & F.col("n_tokens").between(5, 5000)
    s4 = s3 & F.col("img_dup").isNull()
    s5 = s4 & F.col("aud_dup").isNull()
    s6 = s5 & F.col("vid_dup").isNull()
    flag = lambda c: F.when(c, 1).otherwise(0)  # noqa: E731
    return fl.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_raw"),
        F.sum(flag(s1)).cast("long").alias("n_text_dedup"),
        F.sum(flag(s2)).cast("long").alias("n_quality"),
        F.sum(flag(s3)).cast("long").alias("n_length"),
        F.sum(flag(s4)).cast("long").alias("n_image_dedup"),
        F.sum(flag(s5)).cast("long").alias("n_audio_dedup"),
        F.sum(flag(s6)).cast("long").alias("n_final"),
        F.round(
            F.sum(flag(s6)).cast("double") / F.count(F.lit(1)), 6
        ).alias("survival_rate"),
    )


# --------------------------------------------------------------------------
# Registry exports (driver contract)
# --------------------------------------------------------------------------

# The external correctness harness samples a fixed-size window from the FRONT
# of the registry, so export order doubles as verification priority.  Names
# listed here are emitted first (in this order); everything else follows in
# decorator order.  Keep queries that have not yet received an external
# verdict — plus anything newly added this round — at the front; long-stable,
# repeatedly-verified queries can wait at the back.  `tools/check_oracle.py`
# always sweeps all entries regardless of order.
_EXPORT_PRIORITY: list[str] = [
    # Round-15 window (50-slot cap), oldest-verdict-first rotation:
    # (1) the queries NEW this round (versioned-table Delta closure):
    "orders_version_history",
    "orders_time_travel_stats",
    # (2) ALL 43 round-8-stale names (the staleness floor after the
    #     r14 window: every name whose latest driver verdict is r8),
    #     in registry order:
    "nation_market_share_by_year",
    "lang_id_docs",
    "top_words",
    "order_price_rank_scalable",
    "orders_status_pivot",
    "orders_status_unpivot",
    "semantic_dedup_survivors",
    "stratified_sample_by_lang",
    "tfidf_top_terms",
    "scrub_pii_docs",
    "hourly_event_counts",
    "sliding_event_counts",
    "user_sessions",
    "packed_sequences",
    "split_assignments",
    "winsorized_prices",
    "rolling_7d_event_avg",
    "local_supplier_volume",
    "returned_items_top_customers",
    "sole_late_suppliers",
    "customer_order_count_distribution",
    "small_quantity_order_revenue",
    "whitened_embedding_sample",
    "contamination_spans",
    "canonical_url_dedup",
    "domain_mixture_stats",
    "domain_capped_docs",
    "price_histogram_quantiles",
    "kmv_daily_user_merge",
    "jl_distortion_pairs",
    "daily_seasonal_decomposition",
    "event_user_skew_report",
    "docs_embeddings_integrity",
    "event_changepoint_cusum",
    "hard_negative_pairs",
    "dedup_corpus_lines",
    "simhash_recall_eval",
    "incremental_event_state_merge",
    "curation_funnel_by_source",
    "simhash_jaccard_proxy_eval",
    "event_value_histogram_merge",
    "hll_daily_user_merge",
    "cms_daily_user_merge",
    # (3) the 5 oldest round-9 names (registry order) to fill the
    #     window; the floor moves to r9 after this round's check:
    "orders_column_profile",
    "event_value_psi",
    "event_value_median_ci",
    "price_quantity_spearman",
    "quantity_discount_kendall",
]


def _ordered_registry() -> list[QuerySpec]:
    by_name = {spec.name: spec for spec in _REGISTRY}
    front = [by_name[n] for n in _EXPORT_PRIORITY if n in by_name]
    front_names = set(s.name for s in front)
    back = [spec for spec in _REGISTRY if spec.name not in front_names]
    return front + back


def registry() -> list[QuerySpec]:
    return _ordered_registry()


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {spec.name: spec.fn for spec in _ordered_registry()}


def oracle_sql() -> dict[str, str]:
    return {
        spec.name: spec.oracle
        for spec in _ordered_registry()
        if spec.oracle is not None
    }
