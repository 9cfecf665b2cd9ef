"""URL / domain curation tier (operators/urls.py)."""

import pytest
from pyspark.sql import functions as F

from yelp_data_pipeline_spark.operators import urls as ur


@pytest.fixture(scope="module")
def spark():
    from yelp_data_pipeline_spark.session import get_spark

    return get_spark("test_urls")


def _canon(spark, raw: str) -> str:
    df = spark.createDataFrame([(raw,)], ["url"])
    return df.select(ur.canonicalize_url(F.col("url")).alias("c")).collect()[0]["c"]


def test_canonicalize_url_rules(spark):
    # every rule in one matrix: scheme/host case, www., default port,
    # kept non-default port, tracking params, param sort, fragment,
    # trailing slash, preserved path case
    assert (
        _canon(spark, "HTTP://WWW.Example.COM:80/A/B/?z=1&utm_source=x&a=2#frag")
        == "http://example.com/A/B?a=2&z=1"
    )
    assert (
        _canon(spark, "https://example.com:443/p?fbclid=abc&q=1")
        == "https://example.com/p?q=1"
    )
    # non-default port survives; https:80 is NOT a default pair
    assert (
        _canon(spark, "https://example.com:8080/p") == "https://example.com:8080/p"
    )
    assert _canon(spark, "https://example.com:80/p") == "https://example.com:80/p"
    # all params tracking -> no '?' at all; bare host slash normalizes
    assert (
        _canon(spark, "http://example.com/?utm_campaign=x&gclid=1")
        == "http://example.com"
    )
    # param order never splits a group
    assert _canon(spark, "http://x.com/p?b=2&a=1") == _canon(
        spark, "http://x.com/p?a=1&b=2"
    )


def test_registrable_domain_longest_suffix_wins(spark):
    rows = [
        (1, "blog.acme.co.uk"),     # multi-label suffix
        (2, "deep.sub.acme.com"),   # >1 subdomain collapses
        (3, "acme.github.io"),      # site == registrable on a 2-label sfx
        (4, "acme.com"),
        (5, "localhost"),           # single label -> fallback to host
        (6, "acme.internal"),       # no suffix match -> fallback
    ]
    df = spark.createDataFrame(rows, ["doc_id", "host"])
    got = {
        r["doc_id"]: r["registrable_domain"]
        for r in ur.registrable_domain(
            df, "host", ["doc_id"], ur.suffix_table(spark)
        ).collect()
    }
    assert got == {
        1: "acme.co.uk",
        2: "acme.com",
        3: "acme.github.io",
        4: "acme.com",
        5: "localhost",
        6: "acme.internal",
    }


def test_cap_per_domain_skewed_and_deterministic(spark):
    # one domain holds 90% of rows: the cap must bite exactly there,
    # keep small domains whole, and pick the SAME survivors on rerun
    rows = [(i, "big.com" if i < 90 else f"s{i}.org") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    out1 = ur.cap_per_domain(df, "domain", "doc_id", cap=5)
    got1 = sorted((r["domain"], r["doc_id"]) for r in out1.collect())
    big = [d for d, _ in got1 if d == "big.com"]
    assert len(big) == 5
    assert len(got1) == 5 + 10  # 10 singleton domains untouched
    got2 = sorted(
        (r["domain"], r["doc_id"])
        for r in ur.cap_per_domain(df, "domain", "doc_id", cap=5).collect()
    )
    assert got1 == got2  # md5 priority => retry/partitioning stable
