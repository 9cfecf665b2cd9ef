"""SURVEY §2.5 W1-W2, §1.1 — dimension builders.

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import DIM_TIME_CTE, F, _dim_time, _q, _t, cl, dims, joins  # noqa: F401

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


