"""M1-M9 cleaning semantics on tiny in-memory frames (SURVEY.md §5.2).

Each test pins the observable behavior the reference demonstrates
(bronze_to_silver_on_minio.py, cited per operator docstring)."""

import pyspark.sql.functions as F
import pyspark.sql.types as T
import pytest

from yelp_data_pipeline_spark.operators import cleaning as cl


def test_flatten_schema_dotted_paths(spark):
    df = spark.createDataFrame(
        [(1, ("a", ("x",)))],
        T.StructType(
            [
                T.StructField("id", T.LongType()),
                T.StructField(
                    "Outer",
                    T.StructType(
                        [
                            T.StructField("leaf", T.StringType()),
                            T.StructField(
                                "Inner",
                                T.StructType([T.StructField("deep", T.StringType())]),
                            ),
                        ]
                    ),
                ),
            ]
        ),
    )
    assert cl.flatten_schema(df.schema) == ["id", "Outer.leaf", "Outer.Inner.deep"]


def test_flatten_structs_renames_and_lowercases(spark):
    df = spark.createDataFrame(
        [(1, ("v", ("w",)))],
        "id long, Outer struct<Leaf: string, Inner: struct<Deep: string>>",
    )
    out = cl.flatten_structs(df)
    assert out.columns == ["id", "outer_leaf", "outer_inner_deep"]
    row = out.first()
    assert (row["outer_leaf"], row["outer_inner_deep"]) == ("v", "w")


@pytest.mark.parametrize(
    "raw,expect",
    [
        ("u'free'", "free"),          # Python-repr unicode wrapper (B2S:27)
        ("'quoted'", "quoted"),
        ("True", "true"),             # JSON-bool normalization (B2S:28-29)
        ("{'garage': True, 'lot': False}", "{'garage': true, 'lot': false}"),
        ("none", None),               # "none" → NULL (B2S:30-33)
        ("NONE", None),
        ("", None),                   # empty → NULL
        ("plain", "plain"),
    ],
)
def test_clean_pyrepr_value(spark, raw, expect):
    df = spark.createDataFrame([(raw,)], "v string")
    got = df.select(cl.clean_pyrepr_value(F.col("v")).alias("v")).first()["v"]
    assert got == expect


def test_split_csv_empty_to_null_and_count(spark):
    # B2S:87-106 — elite/friends: "" → NULL array, size → 0
    df = spark.createDataFrame(
        [(1, "2018,2019"), (2, ""), (3, None), (4, "2020")], "id long, elite string"
    )
    out = cl.split_csv_to_array(df, "elite", "years", pattern=",")
    out = cl.array_count(out, "years", "n").orderBy("id")
    rows = out.collect()
    assert [r["years"] for r in rows] == [["2018", "2019"], None, None, ["2020"]]
    assert [r["n"] for r in rows] == [2, 0, 0, 1]


def test_explode_csv_trim_and_drop_empty(spark):
    # S2G:66-70 — categories: split ",\\s*" → trim → filter non-empty
    df = spark.createDataFrame(
        [(1, "Restaurants, Food,  Bars"), (2, "Solo,"), (3, "")], "id long, cats string"
    )
    out = cl.explode_csv(df, "cats", "cat")
    got = sorted((r["id"], r["cat"]) for r in out.collect())
    assert got == [(1, "Bars"), (1, "Food"), (1, "Restaurants"), (2, "Solo")]


def test_split_range_column(spark):
    df = spark.createDataFrame([(1, "9:0-17:0")], "id long, rng string")
    row = cl.split_range_column(df, "rng", "open", "close").first()
    assert (row["open"], row["close"]) == ("9:0", "17:0")


def test_detect_json_string_columns_single_pass(spark):
    df = spark.createDataFrame(
        [("{'a': 1}", "plain", None), ("{'b': 2}", "x", "{}")],
        "jsonish string, plain string, maybe string",
    )
    got = cl.detect_json_string_columns(df, ["jsonish", "plain", "maybe"])
    assert got == ["jsonish", "maybe"]


def test_parse_json_columns_union_of_fields(spark):
    # Deliberate fix of the reference's single-row inference (SURVEY §7
    # risk 2): a field absent from the first row must survive.
    df = spark.createDataFrame(
        [(1, "{'garage': true}"), (2, "{'valet': false}")], "id long, attrs string"
    )
    out = cl.parse_json_columns(df, ["attrs"])
    fields = set(out.schema["attrs"].dataType.names)
    assert fields == {"garage", "valet"}
    rows = {r["id"]: r["attrs"] for r in out.collect()}
    assert rows[1]["garage"] is True and rows[1]["valet"] is None
    assert rows[2]["valet"] is False


def test_normalize_null_tokens(spark):
    df = spark.createDataFrame([("None",), ("ok",), ("",)], "v string")
    got = [r["v"] for r in cl.normalize_null_tokens(df, ["v"]).collect()]
    assert got == [None, "ok", None]


def test_add_event_date_parts(spark):
    # M9 (B2S:108-111)
    df = spark.createDataFrame([(1, "2020-03-05 10:00:00")], "id long, ts string")
    row = cl.add_event_date_parts(df, "ts").first()
    assert (row["year"], row["month"]) == (2020, 3)
    assert str(row["ts"]) == "2020-03-05 10:00:00"
