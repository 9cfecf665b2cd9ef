"""Round-12 operator tests: MIH multi-bit Hamming-ball probing,
offset-tolerant video near-dup, the batch gate twin, and the
modality dup matrix."""

import pyspark.sql.functions as F  # noqa: F401
import pytest

from conftest import SF_DIR  # noqa: F401  (sys.path side effect)


class TestMihBallRadius2:
    def test_adversarial_spread_pair_found_at_r8(self, spark):
        """A pair at hamming 8 with EXACTLY 2 errors in every 14-bit
        chunk: no chunk matches exactly and no chunk is within 1 bit,
        so radius-1 probing can never produce the candidate — only the
        ball-2 enumeration finds it. Pigeonhole: 8 errors over 4
        chunks ⇒ some chunk has ≤ 2."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            hamming_neardup_pairs_mih,
        )

        base = 0x00AA55AA55AA55  # arbitrary 56-bit code
        # flip bits {0,1}, {14,15}, {28,29}, {42,43}: 2 per chunk
        xor = (0b11) | (0b11 << 14) | (0b11 << 28) | (0b11 << 42)
        sigs = spark.createDataFrame(
            [(1, base), (2, base ^ xor), (3, base ^ 0x3FF)],  # 3: ham 10
            "doc_id long, dhash long",
        )
        got = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in hamming_neardup_pairs_mih(
                sigs, max_hamming=8
            ).collect()
        }
        assert got == {(1, 2): 8}

    def test_r8_equals_exact_all_pairs_on_fixture(self, spark):
        """MIH at max_hamming=8 (ball radius 2) matches the exact
        all-pairs relation on the real image fingerprints — the
        lossless-by-pigeonhole claim at the wider radius."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            attach_bmp_payload,
            hamming_neardup_pairs_mih,
            image_dhash,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        sigs = image_dhash(attach_bmp_payload(docs)).select(
            "doc_id", "dhash"
        )
        got = {
            (r["doc_a"], r["doc_b"], r["hamming"])
            for r in hamming_neardup_pairs_mih(
                sigs, max_hamming=8
            ).collect()
        }
        # Sort by id: the operator orients pairs doc_a < doc_b by ID,
        # and collect() order is partition order (no longer id-sorted
        # since the attach stage repartitions for parallelism).
        s = sorted((r["doc_id"], r["dhash"]) for r in sigs.collect())
        exact = {
            (a, b, bin(ha ^ hb).count("1"))
            for ai, (a, ha) in enumerate(s)
            for b, hb in s[ai + 1:]
            if bin(ha ^ hb).count("1") <= 8
        }
        assert got == exact
        assert len(got) > 0

    def test_fanout_guard_raises(self, spark):
        """A probe fan-out past 2048 keys/item must raise, never build
        an unboundedly wide plan."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            hamming_neardup_pairs_mih,
        )

        sigs = spark.createDataFrame(
            [(1, 0)], "doc_id long, dhash long"
        )
        with pytest.raises(ValueError, match="fan-out"):
            # ball radius 4 over 2×28-bit chunks: C(28,≤4) ≫ 2048/2
            hamming_neardup_pairs_mih(
                sigs, max_hamming=8, chunks=2, bits=56
            )


class TestVideoOffsetTolerant:
    def _sigs(self, spark, rows):
        return spark.createDataFrame(
            rows, "doc_id long, frame_idx int, dhash long"
        )

    def test_trimmed_clip_matches_only_offset_variant(self, spark):
        """A clip trimmed by 2 frames (constant idx offset) is invisible
        to the aligned-only matcher but found by the modal-delta
        aggregation — the planted case the round-11 tier provably
        missed."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            video_neardup_pairs,
            video_neardup_pairs_offset,
        )

        # video 1: frames 0..4 with distinct hashes; video 2: the same
        # content starting 2 frames in (frame i of v2 == frame i+2 of v1)
        # pairwise hamming >= 14: disjoint 14-bit blocks (and zero)
        content = [0, 0x3FFF, 0x3FFF << 14, 0x3FFF << 28, 0x3FFF << 42]
        rows = [(1, i, h) for i, h in enumerate(content)]
        rows += [(2, i, h) for i, h in enumerate(content[2:])]
        sigs = self._sigs(spark, rows)

        aligned = video_neardup_pairs(sigs, min_matched_frames=2).collect()
        assert aligned == []  # same-idx frames are all different content

        off = {
            (r["video_a"], r["video_b"]): (
                r["idx_delta"],
                r["matched_frames"],
                r["min_hamming"],
            )
            for r in video_neardup_pairs_offset(
                sigs, min_matched_frames=2
            ).collect()
        }
        # frame i of video 2 matches frame i+2 of video 1: delta of the
        # LATER video id relative to the earlier is -2.
        assert off == {(1, 2): (-2, 3, 0)}

    def test_modal_delta_wins_over_incidental_match(self, spark):
        """One incidental cross-delta frame match must not outvote the
        true alignment: the modal (most frames) delta is reported."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            video_neardup_pairs_offset,
        )

        A, B, C, D = 0x3FFF, 0x3FFF << 14, 0x3FFF << 28, 0x3FFF << 42
        rows = [
            (1, 0, A), (1, 1, B), (1, 2, C), (1, 3, D),
            # video 2 aligns at delta 0 on three frames...
            (2, 0, A), (2, 1, B), (2, 2, C),
            # ...plus one incidental match at delta +2 (frame 5 ~ v1 frame 3)
            (2, 5, D),
        ]
        got = {
            (r["video_a"], r["video_b"]): (r["idx_delta"], r["matched_frames"])
            for r in video_neardup_pairs_offset(
                self._sigs(spark, rows), min_matched_frames=2
            ).collect()
        }
        assert got == {(1, 2): (0, 3)}

    def test_deterministic_tiebreak_on_equal_support(self, spark):
        """Two deltas with equal frame support tie-break on smaller
        |delta|, then smaller delta — deterministic output."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            video_neardup_pairs_offset,
        )

        A, B, C, D = 0x3FFF, 0x3FFF << 14, 0x3FFF << 28, 0x3FFF << 42
        rows = [
            (1, 0, A), (1, 1, B),
            (1, 10, C), (1, 11, D),
            # delta 0 twice:
            (2, 0, A), (2, 1, B),
            # delta -3 twice:
            (2, 7, C), (2, 8, D),
        ]
        got = video_neardup_pairs_offset(
            self._sigs(spark, rows), min_matched_frames=2
        ).collect()
        assert len(got) == 1
        assert got[0]["idx_delta"] == 0 and got[0]["matched_frames"] == 2

    def test_same_idx_corpus_agrees_with_aligned_matcher(self, spark):
        """On untrimmed re-encodes (delta 0 everywhere) the offset
        matcher reports the same pairs as the aligned matcher, with
        idx_delta = 0."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            attach_avi_payload,
            video_frame_fingerprints,
            video_neardup_pairs,
            video_neardup_pairs_offset,
        )

        docs = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .where(F.col("doc_id") < 120)
        )
        fps = video_frame_fingerprints(
            attach_avi_payload(docs)
        ).localCheckpoint(eager=True)
        aligned = {
            (r["video_a"], r["video_b"]): (
                r["matched_frames"], r["min_hamming"]
            )
            for r in video_neardup_pairs(fps).collect()
        }
        off = {
            (r["video_a"], r["video_b"]): (
                r["idx_delta"], r["matched_frames"], r["min_hamming"]
            )
            for r in video_neardup_pairs_offset(fps).collect()
        }
        assert len(aligned) > 0
        for pair, (mf, mh) in aligned.items():
            d, omf, omh = off[pair]
            # the modal delta can only gather >= the aligned support
            assert omf >= mf


class TestStarPrepass:
    def test_prepass_labels_equal_plain_star(self, spark):
        """Hash-min contraction pre-pass must not change the labeling:
        adversarial chain + cliques + isolated-pair graph, every
        prepass_rounds value agrees with the plain star loop."""
        from yelp_data_pipeline_spark.operators.graph import (
            connected_components_star,
        )

        edges = []
        # long chain 0-1-2-...-30 (diameter 30: survives the pre-pass)
        edges += [(i, i + 1) for i in range(30)]
        # clique 100..104 (collapses in 1 hash-min round)
        edges += [(a, b) for a in range(100, 105) for b in range(a + 1, 105)]
        # star 200 center (collapses immediately)
        edges += [(200, x) for x in range(201, 208)]
        # isolated pair
        edges += [(300, 301)]
        df = spark.createDataFrame(edges, "src long, dst long")

        want = {
            (r["node"], r["cluster"])
            for r in connected_components_star(df).collect()
        }
        for k in (1, 3):
            got = {
                (r["node"], r["cluster"])
                for r in connected_components_star(
                    df, prepass_rounds=k
                ).collect()
            }
            assert got == want, f"prepass_rounds={k} diverged"
        # sanity: chain labels to 0, clique to 100, star to 200
        d = dict(want)
        assert d[30] == 0 and d[104] == 100 and d[207] == 200 and d[301] == 300

    def test_prepass_fully_collapsed_graph(self, spark):
        """A graph that collapses entirely in the pre-pass (no residual
        edges) must still label every node."""
        from yelp_data_pipeline_spark.operators.graph import (
            connected_components_star,
        )

        df = spark.createDataFrame(
            [(1, 2), (2, 3), (10, 11)], "src long, dst long"
        )
        got = {
            (r["node"], r["cluster"])
            for r in connected_components_star(df, prepass_rounds=5).collect()
        }
        assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


class TestWideCode:
    def test_wide_mih_lossless_at_r8_and_r12(self, spark):
        """120-bit MIH (8×15-bit chunks, ball ≤ 1 through radius 15)
        equals the exact all-pairs relation at radii 8 AND 12 on the
        real fingerprints — the widen-the-code claim, measured."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            attach_bmp_payload,
            hamming_neardup_pairs_mih_wide,
            image_dhash_wide,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        sigs = image_dhash_wide(attach_bmp_payload(docs)).localCheckpoint(
            eager=True
        )
        # id-sorted: collect() order is partition order since the
        # attach stage repartitions (see TestMihBallRadius2).
        s = sorted(
            (r["doc_id"], (r["dh_hi"] << 60) | r["dh_lo"])
            for r in sigs.collect()
        )
        for radius in (8, 12):
            got = {
                (r["doc_a"], r["doc_b"], r["hamming"])
                for r in hamming_neardup_pairs_mih_wide(
                    sigs, max_hamming=radius
                ).collect()
            }
            exact = {
                (a, b, bin(ha ^ hb).count("1"))
                for i, (a, ha) in enumerate(s)
                for b, hb in s[i + 1:]
                if bin(ha ^ hb).count("1") <= radius
            }
            assert got == exact, f"radius {radius} diverged"
            assert len(got) > 0

    def test_wide_split_is_nonnegative_and_recomposes(self, spark):
        """Both longs stay non-negative (60 bits each) and recompose
        to the 120-bit dHash of the same (8, 16) grid."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            _dhash_bits,
            attach_bmp_payload,
            image_dhash_wide,
            parse_bmp,
        )

        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(50)
        wide = {
            r["doc_id"]: (r["dh_hi"], r["dh_lo"])
            for r in image_dhash_wide(attach_bmp_payload(docs)).collect()
        }
        payloads = {
            r["doc_id"]: bytes(r["payload"])
            for r in attach_bmp_payload(docs).collect()
        }
        assert len(wide) == 50
        for did, (hi, lo) in wide.items():
            assert hi >= 0 and lo >= 0 and lo < (1 << 60)
            m = parse_bmp(payloads[did])
            full = _dhash_bits(m["pixels"], m["width"], m["height"], 15, 8)
            assert (hi << 60) | lo == full


class TestCrossmodalMismatch:
    def test_same_text_image_dup_not_flagged(self, spark):
        """An image near-dup pair whose TEXTS agree (jaccard >= 0.5)
        must NOT appear in the mismatch relation; a pair with
        unrelated texts must."""
        import pyspark.sql.functions as F  # noqa: F811

        from yelp_data_pipeline_spark.operators import dedup as dd
        from yelp_data_pipeline_spark.operators.multimodal import (
            hamming_neardup_pairs_mih,
        )

        # Mirror the registry composition inline on a planted frame.
        txt = "the quick brown fox jumps over the lazy dog tonight"
        docs = spark.createDataFrame(
            [
                (1, txt),
                (2, txt + " again"),  # high jaccard with doc 1
                (3, "completely different words in every single position here"),
            ],
            "doc_id long, text string",
        )
        sigs = spark.createDataFrame(
            # identical image hash for all three: every pair is an
            # image near-dup
            [(1, 0xABC), (2, 0xABC), (3, 0xABC)],
            "doc_id long, dhash long",
        )
        pairs = hamming_neardup_pairs_mih(sigs)
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
        out = {
            (r["doc_a"], r["doc_b"])
            for r in pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .withColumn("jaccard", jac)
            .where(F.col("jaccard") < 0.5)
            .collect()
        }
        # (1,2) share text -> clean; (1,3) and (2,3) mismatch.
        assert out == {(1, 3), (2, 3)}
