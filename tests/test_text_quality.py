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


def test_gopher_flags_thresholds(spark):
    from yelp_data_pipeline_spark.operators.textops import gopher_quality_flags

    good = " ".join(["the quick brown fox and the lazy dog ran off"] * 6)
    df = spark.createDataFrame(
        [
            (1, good),                                   # passes everything
            (2, "short text only"),                      # word count < 50
            (3, "### " + good + " ... ... ... ... ..."), # symbol-heavy
            (4, "\n".join(["- bullet line"] * 60)),      # all bullets
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_quality_flags(df).collect()}
    assert rows[1]["passes_gopher"] is True
    assert rows[2]["passes_gopher"] is False and rows[2]["n_tokens"] < 50
    assert rows[3]["passes_gopher"] is False and rows[3]["symbol_ratio"] > 0.1
    assert rows[4]["passes_gopher"] is False and rows[4]["bullet_ratio"] > 0.9


def test_script_char_ratios_sums_to_one(spark):
    from yelp_data_pipeline_spark.operators.textops import script_char_ratios

    df = spark.createDataFrame(
        [(1, "abc 123 !? déjà"), (2, "ASCII only text 42")],
        "doc_id long, text string",
    )
    for r in script_char_ratios(df).collect():
        total = (
            r["alpha_ratio"] + r["digit_ratio"] + r["space_ratio"] + r["other_ratio"]
        )
        assert total == pytest.approx(1.0, abs=1e-5)
    r1 = {r["doc_id"]: r for r in script_char_ratios(df).collect()}
    assert r1[1]["non_ascii_ratio"] > 0
    assert r1[2]["non_ascii_ratio"] == 0.0


def test_duplicate_sentence_stats_cross_doc(spark):
    from yelp_data_pipeline_spark.operators.textops import duplicate_sentence_stats

    boiler = "subscribe to our newsletter for more updates"
    df = spark.createDataFrame(
        [
            (1, f"Unique opening line here. {boiler}. Another unique bit."),
            (2, f"Different doc entirely! {boiler}. Trailing thought?"),
            (3, "No shared sentences in this one. Nothing to see here folks."),
        ],
        "doc_id long, text string",
    )
    out = duplicate_sentence_stats(df).collect()
    assert len(out) == 1
    assert out[0]["n_docs"] == 2 and out[0]["n_total"] == 2
    assert out[0]["sentence"] == boiler


def test_duplicate_span_stats_tiling(spark):
    from yelp_data_pipeline_spark.operators.textops import duplicate_span_stats

    shared = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    df = spark.createDataFrame(
        [
            (1, shared + " extra tail tokens beyond the span"),
            (2, shared),                        # exactly one full span
            (3, "totally different words " + shared.upper()),  # lowercased → dup
            (4, "short doc"),                   # < span_tokens: dropped
        ],
        "doc_id long, text string",
    )
    out = duplicate_span_stats(df).collect()
    # doc 3's span is offset by 3 leading tokens, so only docs 1&2 tile-align.
    assert len(out) == 1
    assert out[0]["n_docs"] == 2
    assert out[0]["span"] == shared


def test_corpus_ngram_topk_counts(spark):
    from yelp_data_pipeline_spark.operators.textops import corpus_ngram_topk

    df = spark.createDataFrame(
        [(1, "a b c a b c"), (2, "a b c d"), (3, "x y")],
        "doc_id long, text string",
    )
    out = {r["gram"]: r["cnt"] for r in corpus_ngram_topk(df, n=3, top=10).collect()}
    assert out["a b c"] == 3       # twice in doc1, once in doc2
    assert out["b c a"] == 1
    assert "x y" not in out        # doc3 too short for trigrams


def test_cross_dup_rate_by_source(spark):
    from yelp_data_pipeline_spark.operators.dedup import cross_dup_rate_by_source

    df = spark.createDataFrame(
        [
            (1, "Shared Text!", "a"),
            (2, "shared text",  "b"),   # normalized dup of doc 1, other source
            (3, "only in a",    "a"),
            (4, "only in b",    "b"),
            (5, "shared text",  "b"),   # same-source dup still counts as exposed
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in cross_dup_rate_by_source(df).collect()}
    assert out["a"]["n_docs"] == 2 and out["a"]["n_cross_dup"] == 1
    assert out["a"]["cross_dup_rate"] == 0.5
    assert out["b"]["n_docs"] == 3 and out["b"]["n_cross_dup"] == 2


def test_pii_summary_rates(spark):
    from yelp_data_pipeline_spark.operators.textops import pii_summary

    df = spark.createDataFrame(
        [
            (1, "mail me at a@b.com or visit https://x.org", "web"),
            (2, "clean document", "web"),
            (3, "call +1 (555) 123-4567 now", "books"),
        ],
        "doc_id long, text string, source string",
    )
    out = {r["source"]: r for r in pii_summary(df).collect()}
    assert out["web"]["n_emails"] == 1 and out["web"]["n_urls"] == 1
    assert out["web"]["docs_with_pii"] == 1 and out["web"]["pii_doc_rate"] == 0.5
    assert out["books"]["n_phones"] == 1 and out["books"]["pii_doc_rate"] == 1.0


def test_bpe_train_matches_reference_implementation(spark):
    """Iterated BPE vs an independent pure-Python trainer: every
    (round, rule, count) must agree, including greedy-overlap cases
    ('aaa' + rule (a,a) -> [aa, a]) and rules built from merged
    symbols."""
    from collections import Counter

    from yelp_data_pipeline_spark.operators.textops import bpe_train

    def ref_bpe(texts, merges):
        words = Counter()
        for t in texts:
            for w in t.strip().lower().split():
                if len(w) >= 2:
                    words[w] += 1
        vocab = {tuple(w): c for w, c in words.items()}
        rules = []
        for t in range(1, merges + 1):
            pc = Counter()
            for syms, c in vocab.items():
                for i in range(len(syms) - 1):
                    pc[(syms[i], syms[i + 1])] += c
            if not pc:
                break
            (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
            rules.append((t, a + " " + b, cnt))
            nv = {}
            for syms, c in vocab.items():
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                nv[tuple(out)] = nv.get(tuple(out), 0) + c
            vocab = nv
        return rules

    texts = ["low low lower lowest", "new newer newest low", "aaa aaaa ab ab abab"]
    df = spark.createDataFrame([(t,) for t in texts], ["text"])
    got = [
        (r["merge_round"], r["pair"], r["cnt"])
        for r in bpe_train(df, merges=6).collect()
    ]
    assert got == ref_bpe(texts, 6)


def test_bpe_encode_counts_matches_reference(spark):
    """Apply-step parity: frozen rules applied per word must reproduce
    an independent Python encoder's token counts, including greedy
    overlap and rules chaining onto merged symbols."""
    from yelp_data_pipeline_spark.operators.textops import bpe_encode_counts

    def ref_encode(text, rules):
        n_words = n_toks = 0
        for w in text.strip().lower().split():
            syms = list(w)
            for a, b in rules:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and (syms[i], syms[i + 1]) == (a, b):
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            n_words += 1
            n_toks += len(syms)
        return n_words, n_toks

    rules = [("l", "o"), ("lo", "w"), ("a", "a")]
    texts = ["low lower aaa aaaa", "low aab lowlow", "x"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_words"], r["n_bpe_tokens"])
        for r in bpe_encode_counts(df, rules).collect()
    }
    assert got == {i: ref_encode(t, rules) for i, t in enumerate(texts)}


def test_quality_score_survives_empty_doc_under_ansi(spark):
    """Empty documents have n_chars = 0; under the driver's ANSI
    session even a DOUBLE division by zero crashes (probed), so the
    punct term is NULL-guarded — both quality entry points must
    evaluate, and the score must stay defined (least() skips the NULL
    term identically in both engines)."""
    from yelp_data_pipeline_spark.operators.textops import (
        quality_features,
        quality_score_col,
    )
    import pyspark.sql.functions as F

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        df = spark.createDataFrame(
            [(1, ""), (2, "a perfectly ordinary document")],
            ["doc_id", "text"],
        )
        scores = {
            r["doc_id"]: r["q"]
            for r in df.select(
                "doc_id", quality_score_col(F.col("text")).alias("q")
            ).collect()
        }
        assert scores[1] is not None and scores[2] is not None
        feats = {
            r["doc_id"]: r for r in quality_features(df, "doc_id", "text").collect()
        }
        assert feats[1]["punct_ratio"] is None  # guarded, not crashed
        assert feats[2]["punct_ratio"] is not None
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)


def test_unigram_lm_viterbi_prefers_frequent_pieces(spark):
    """Hard-EM Viterbi must segment words using the high-frequency
    pieces: with 'ab' dominant in the corpus, 'abab' splits as
    ab|ab, never a|b|a|b — and em counts reflect best-path usage,
    not raw substring frequency."""
    from yelp_data_pipeline_spark.operators.textops import (
        unigram_lm_piece_scores,
    )

    # 'ab' appears as a word 8 times; 'abab' twice; 'cd' once.
    text = " ".join(["ab"] * 8 + ["abab"] * 2 + ["cd"])
    df = spark.createDataFrame([("d", text)], ["doc_id", "text"])
    out = {
        r["piece"]: (r["em_count"], r["seed_freq"])
        for r in unigram_lm_piece_scores(
            df, "text", max_word_len=6, max_piece_len=2, min_freq=2, k=20
        ).collect()
    }
    # 'ab' is used once per 'ab' word and twice per 'abab' -> 12.
    assert out["ab"][0] == 8 + 2 * 2
    # Singles 'a'/'b' never appear on a best path (P(ab) >> P(a)P(b)).
    assert "a" not in out and "b" not in out
    # 'cd' word: 'cd' piece has freq 1+... 'cd' substring freq = 1 <
    # min_freq, so 'cd' is NOT a piece; the word segments as c|d.
    assert out["c"][0] == 1 and out["d"][0] == 1


def test_unigram_lm_em_counts_cover_all_words(spark):
    """Every word occurrence decomposes fully: sum(em_count x 1) over
    pieces == total tokens emitted by the walks == sum over words of
    (pieces in its best segmentation) x occurrences; and every piece
    on a path exists in the seed inventory."""
    from yelp_data_pipeline_spark.operators.textops import (
        unigram_lm_piece_scores,
    )

    df = spark.createDataFrame(
        [("a", "spark spark sql engine engine engine")], ["doc_id", "text"]
    )
    rows = unigram_lm_piece_scores(
        df, "text", max_word_len=8, max_piece_len=3, min_freq=2, k=50
    ).collect()
    assert rows  # non-empty
    for r in rows:
        assert r["em_count"] >= 1 and r["seed_freq"] >= 1


def test_perceptron_pocket_learns_separable_gate(spark):
    """On a linearly separable corpus (long wordy docs vs short ones)
    the pocket perceptron must recover the quality gate to >=90%
    train accuracy, and the output must carry exactly the declared
    terms with consistent counts."""
    from yelp_data_pipeline_spark.operators.textops import (
        PERCEPTRON_TERMS,
        perceptron_quality_gate,
    )

    longdoc = "the quick brown fox jumps over the lazy dog " * 20  # ~180 toks
    shortdoc = "tiny note"
    docs = [(i, longdoc if i % 2 == 0 else shortdoc) for i in range(40)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    out = {
        r["term"]: r["value"]
        for r in perceptron_quality_gate(df, "text", epochs=12).collect()
    }
    assert set(out) == set(PERCEPTRON_TERMS) | {
        "train_correct", "train_total"
    }
    assert out["train_total"] == 40
    assert out["train_correct"] >= 36  # >=90% on a separable split


def test_pure_long_floor_div_exact_past_2_53(spark):
    """The averaged perceptron step uses (s - pmod(s, m)) div m as an
    exact int64 floor division. A double round-trip (floor(s/m) via
    DOUBLE) is only exact while |s| < 2^53; this property pins the
    pure-long form at adversarial magnitudes, negatives included."""
    cases = [
        (2**53 + 1, 3),
        (-(2**53) - 1, 3),
        (2**62 + 12345, 7),
        (-(2**62) - 12345, 7),
        (2**53 + 1, 1),
        (-7, 2),
        (7, 2),
        (0, 5),
    ]
    df = spark.createDataFrame(cases, ["s", "m"])
    rows = df.selectExpr(
        "s", "m", "(s - pmod(s, m)) div m AS q"
    ).collect()
    for r in rows:
        assert r["q"] == r["s"] // r["m"], (r["s"], r["m"], r["q"])
    # and confirm at least one case where the double path would be wrong
    import math

    s, m = 2**62 + 12345, 7
    assert math.floor(float(s) / float(m)) != s // m
