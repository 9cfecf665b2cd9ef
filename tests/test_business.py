"""M6 — the composite business cleaner (B2S:64-76) on a Yelp-shaped
fixture (FIXTURES.md §A1), including the reference's dead-code parity:
attribute columns parsed to structs stay NESTED (B2S:74-75)."""

import pyspark.sql.types as T

from yelp_data_pipeline_spark.operators import cleaning as cl

SCHEMA = T.StructType(
    [
        T.StructField("business_id", T.StringType()),
        T.StructField("name", T.StringType()),
        T.StructField("is_open", T.LongType()),
        T.StructField(
            "hours",
            T.StructType(
                [
                    T.StructField("Monday", T.StringType()),
                    T.StructField("Tuesday", T.StringType()),
                ]
            ),
        ),
        T.StructField(
            "attributes",
            T.StructType(
                [
                    T.StructField("WiFi", T.StringType()),
                    T.StructField("GoodForKids", T.StringType()),
                    T.StructField("BusinessParking", T.StringType()),
                ]
            ),
        ),
    ]
)

ROWS = [
    ("b1", "Cafe", 1, ("9:0-17:0", None), ("u'free'", "True", "{'garage': True, 'lot': False}")),
    ("b2", "Bar", 0, (None, "8:0-2:0"), ("none", "False", "{'valet': True}")),
]


def _cleaned(spark):
    return cl.process_business(spark.createDataFrame(ROWS, SCHEMA))


def test_is_open_cast_to_boolean(spark):
    out = _cleaned(spark)
    assert dict(out.dtypes)["is_open"] == "boolean"
    got = {r["business_id"]: r["is_open"] for r in out.collect()}
    assert got == {"b1": True, "b2": False}


def test_hours_split_and_originals_dropped(spark):
    out = _cleaned(spark)
    assert "hours_monday" not in out.columns and "hours" not in out.columns
    row = {r["business_id"]: r for r in out.collect()}
    assert row["b1"]["monday_opening_time"] == "9:0"
    assert row["b1"]["monday_closing_time"] == "17:0"
    assert row["b1"]["tuesday_opening_time"] is None
    assert row["b2"]["tuesday_closing_time"] == "2:0"


def test_attribute_cleaning_and_nested_parity(spark):
    out = _cleaned(spark)
    row = {r["business_id"]: r for r in out.collect()}
    # M2 cleaning on scalar attributes
    assert row["b1"]["attributes_wifi"] == "free"
    assert row["b1"]["attributes_goodforkids"] == "true"
    assert row["b2"]["attributes_wifi"] is None          # "none" → NULL
    # M3/M4: the dict-valued column was detected and parsed to a struct —
    # and per the reference's dead code it STAYS a nested struct.
    dt = dict(out.dtypes)["attributes_businessparking"]
    assert dt.startswith("struct"), f"expected nested struct, got {dt}"
    # union-of-samples inference: fields from BOTH rows survive
    fields = set(
        out.schema["attributes_businessparking"].dataType.names
    )
    assert fields == {"garage", "lot", "valet"}
    assert row["b1"]["attributes_businessparking"]["garage"] is True
    assert row["b2"]["attributes_businessparking"]["valet"] is True
    assert row["b2"]["attributes_businessparking"]["garage"] is None
