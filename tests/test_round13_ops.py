"""Round-13 operators: text-derived hashed embeddings (the
non-degenerate semantic-dedup truth), packing assignment, video
frame-rate boundary."""

import pytest
from pyspark.sql import functions as F

from yelp_data_pipeline_spark.operators import dedup as dd
from yelp_data_pipeline_spark.operators import similarity as sim
from yelp_data_pipeline_spark.operators import textops as tx


def _mk_docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


class TestHashedTextEmbeddings:
    def test_shape_and_determinism(self, spark):
        docs = _mk_docs(
            spark,
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "the quick brown fox jumps over the lazy dog"),
                (3, "completely different words entirely here now"),
                (4, "too short"),  # < 3 tokens: excluded
            ],
        )
        emb = tx.hashed_text_embeddings(docs).orderBy("vec_id").collect()
        assert [r["vec_id"] for r in emb] == [1, 2, 3]
        assert all(len(r["embedding"]) == 64 for r in emb)
        # identical text ⇒ identical vector (deterministic hashing)
        assert emb[0]["embedding"] == emb[1]["embedding"]
        # values are signed integer counts
        assert all(v == int(v) for r in emb for v in r["embedding"])
        # 9 tokens ⇒ 7 grams; same-dim collisions can only cancel, so
        # the total |mass| is bounded by the gram count
        assert sum(abs(v) for v in emb[0]["embedding"]) <= 7

    def test_paraphrase_mass_only_semantic_arm_catches(self, spark):
        """The planted containment pair (a doc and its first half):
        shingle Jaccard = 0.5 < 0.8 ⇒ the lexical MinHash arm MUST
        miss it; shared-gram cosine ≈ sqrt(0.5) ≈ 0.707 >= 0.5 ⇒ the
        semantic arm over text-derived embeddings MUST catch it.
        An exact near-dup pair is caught by both; an unrelated doc by
        neither — so the agreement row's n_only_semantic counts
        exactly the paraphrase/containment mass."""
        base = " ".join(f"w{i}token" for i in range(40))
        half = " ".join(f"w{i}token" for i in range(20))
        neardup = " ".join(
            f"w{i}token" for i in range(39)
        ) + " changedtail"
        unrelated = " ".join(f"z{i}other" for i in range(40))
        docs = _mk_docs(
            spark,
            [(1, base), (2, half), (3, neardup), (4, unrelated)],
        )

        lex = {
            (r["doc_a"], r["doc_b"])
            for r in dd.minhash_lsh_pairs(
                docs, "doc_id", "text", k=12, bands=4, threshold=0.8
            ).collect()
        }
        sem = {
            (r["id_a"], r["id_b"])
            for r in sim.cosine_neardup_pairs(
                tx.hashed_text_embeddings(docs), threshold=0.5
            ).collect()
        }
        assert (1, 3) in lex and (1, 3) in sem  # near-dup: both arms
        assert (1, 2) not in lex  # containment below the lexical bar
        assert (1, 2) in sem  # ...but the semantic arm sees it
        assert not any(4 in p for p in lex | sem)  # unrelated: neither

    def test_half_doc_cosine_is_sqrt_half(self, spark):
        """Exact geometry check of the containment claim (no LSH):
        disjoint-gram halves give cosine = |half| / (|full|·|half|)^.5
        = sqrt(|half|/|full|), up to hash-collision noise."""
        base = " ".join(f"w{i}token" for i in range(40))
        half = " ".join(f"w{i}token" for i in range(20))
        docs = _mk_docs(spark, [(1, base), (2, half)])
        emb = tx.hashed_text_embeddings(docs)
        from yelp_data_pipeline_spark.functions.vectors import cosine

        a = emb.where(F.col("vec_id") == 1).select("embedding")
        b = emb.where(F.col("vec_id") == 2).select("embedding")
        row = (
            a.crossJoin(b.withColumnRenamed("embedding", "eb"))
            .select(cosine(F.col("embedding"), F.col("eb")).alias("c"))
            .collect()[0]
        )
        import math

        # 18 of the full doc's 38 grams are the half's 18 grams
        assert abs(row["c"] - math.sqrt(18 / 38)) < 0.08
