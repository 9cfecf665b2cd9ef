"""Repetition-signal and decontamination semantics on tiny frames."""

import pytest

from yelp_data_pipeline_spark.operators.dedup import decontaminate
from yelp_data_pipeline_spark.operators.textops import repetition_stats


def test_repetition_stats_degenerate_and_clean(spark):
    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),          # fully repeated
            (2, "all words here are unique"),    # no repetition
            (3, "one"),                          # single token: no bigrams
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in repetition_stats(df).collect()}

    r1 = rows[1]
    assert r1["n_words"] == 4
    assert r1["dup_word_frac"] == pytest.approx(0.75)
    assert r1["top_word_frac"] == pytest.approx(1.0)
    assert r1["top_bigram_frac"] == pytest.approx(1.0)  # "spam spam" ×3

    r2 = rows[2]
    assert r2["dup_word_frac"] == 0.0
    assert r2["top_word_frac"] == pytest.approx(0.2)
    assert r2["top_bigram_frac"] == pytest.approx(0.25)

    r3 = rows[3]
    assert r3["n_words"] == 1
    assert r3["top_bigram_frac"] is None  # no bigrams, not a div-by-zero


def test_decontaminate_drops_only_overlapping(spark):
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta tail words"),   # shares a 4-gram
            (2, "totally different content entirely here"),
            (3, "alpha beta gamma X delta"),            # 3-gram overlap only
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "prefix alpha beta gamma delta suffix")], "doc_id long, text string"
    )
    kept = sorted(r["doc_id"] for r in decontaminate(corpus, ev, n=4).collect())
    assert kept == [2, 3]


def test_decontaminate_keeps_all_when_no_overlap(spark):
    corpus = spark.createDataFrame(
        [(1, "a b c d e"), (2, "f g h i j")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "v w x y z")], "doc_id long, text string")
    assert decontaminate(corpus, ev, n=4).count() == 2


def test_bm25_ranks_rare_term_doc_higher(spark):
    from yelp_data_pipeline_spark.operators.textops import bm25_scores

    rows = [
        (1, "rare common common common"),
        (2, "common common common common"),
        (3, "common filler filler filler"),
        (4, "nothing matches here at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           bm25_scores(df, "doc_id", "text", ("rare", "common")).collect()}
    assert 4 not in got                      # no term hit → no row
    assert got[1]["n_terms_hit"] == 2
    assert got[2]["n_terms_hit"] == got[3]["n_terms_hit"] == 1
    # doc 1 hits the rare high-idf term → outscores the common-only docs
    assert got[1]["bm25"] > got[2]["bm25"] > 0
    # more occurrences of the same term → higher score (tf saturation)
    assert got[2]["bm25"] > got[3]["bm25"]
