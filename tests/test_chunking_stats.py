"""Chunking / z-score / winsorize edge semantics."""

import pytest
from pyspark.sql import functions as F

from yelp_data_pipeline_spark.operators.aggregates import winsorize
from yelp_data_pipeline_spark.operators.textops import chunk_documents
from yelp_data_pipeline_spark.operators.timeseries import daily_count_zscores


def test_chunk_documents_overlap_and_coverage(spark):
    words = " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame([(1, words)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # stride 2 over 10 tokens: ceil((10-2)/2) = 4 chunks
    assert [r["start_tok"] for r in rows] == [0, 2, 4, 6]
    assert rows[0]["chunk_text"] == "w0 w1 w2 w3"
    assert rows[1]["chunk_text"] == "w2 w3 w4 w5"  # 2-token overlap
    assert rows[-1]["chunk_text"] == "w6 w7 w8 w9"
    # every token covered
    covered = set()
    for r in rows:
        covered |= set(r["chunk_text"].split())
    assert len(covered) == 10


def test_chunk_documents_short_doc_single_chunk(spark):
    df = spark.createDataFrame([(1, "only two")], "doc_id long, text string")
    [r] = chunk_documents(df, chunk_tokens=4, overlap=2).collect()
    assert (r["chunk_idx"], r["n_toks"], r["chunk_text"]) == (0, 2, "only two")


def test_chunk_documents_rejects_bad_overlap(spark):
    df = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_daily_zscores_flat_series_null(spark):
    import datetime as dt

    rows = [(i, dt.datetime(2024, 1, 1 + d, 10, 0), "a", 0.0)
            for i, d in enumerate([0, 1, 2])]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = daily_count_zscores(df, "ts", "event_type").collect()
    # identical daily counts -> zero variance -> NULL z, not a div-by-zero
    assert all(r["z"] is None for r in out)


def test_winsorize_clips_both_tails(spark):
    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "x double")
    out = winsorize(df, "x", 0.05, 0.95)
    lo = out.agg(F.min("x_w")).first()[0]
    hi = out.agg(F.max("x_w")).first()[0]
    # exact interpolated p05/p95 of 1..100
    assert lo == pytest.approx(5.95)
    assert hi == pytest.approx(95.05)
    assert out.count() == 100  # winsorize clips, never drops
