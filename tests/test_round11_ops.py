"""Round-11 operator tests: multi-index hashing near-dup, span
surgery composition (see test_dedup.py), empty-payload guards, video
container codec."""

import pytest
from pyspark.sql import functions as F


class TestMultiIndexHashing:
    def test_identical_pair_set_to_banding_join(self, spark):
        """MIH and the 7x8 banding join must emit the IDENTICAL pair
        set on the fixture corpus (both are lossless at radius 6) —
        the local twin of the shared-oracle proof the sweep runs."""
        from yelp_data_pipeline_spark.operators import multimodal as mm
        from yelp_data_pipeline_spark.queries import _t

        d = mm.attach_bmp_payload(
            _t(spark, "/root/testdata/sf0.001", "documents")
        )
        sigs = mm.image_dhash(d).persist()
        band = set(map(tuple, mm.image_neardup_pairs(sigs).collect()))
        mih = set(
            map(tuple, mm.hamming_neardup_pairs_mih(sigs).collect())
        )
        sigs.unpersist()
        assert len(band) > 1000  # genuine near-dup structure
        assert band == mih

    def test_radius_exactly_at_ball_boundary(self, spark):
        """A planted pair at hamming EXACTLY max_hamming (the lossless
        boundary) must be found; one at max_hamming+1 must not."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            hamming_neardup_pairs_mih,
        )

        base = 0x00FF00FF00FF00
        # Flip 6 bits spread across chunks (radius = 6 found), 7 not.
        six = base ^ 0b111111
        seven = base ^ 0b1111111
        sigs = spark.createDataFrame(
            [(1, base), (2, six), (3, seven)], "doc_id long, dhash long"
        )
        pairs = {
            (r["doc_a"], r["doc_b"]): r["hamming"]
            for r in hamming_neardup_pairs_mih(sigs).collect()
        }
        assert pairs.get((1, 2)) == 6
        assert (1, 3) not in pairs

    def test_worst_case_error_spread_still_found(self, spark):
        """Adversarial spread: 6 errors placed to leave NO chunk
        error-free (2+2+1+1 across the four 14-bit chunks) still
        pigeonholes into a <=1-error chunk and must be found."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            hamming_neardup_pairs_mih,
        )

        base = 0x2A2A2A2A2A2A2A & ((1 << 56) - 1)
        flips = (
            (1 << 0) | (1 << 5)      # chunk 0: 2 errors
            | (1 << 14) | (1 << 20)  # chunk 1: 2 errors
            | (1 << 30)              # chunk 2: 1 error
            | (1 << 45)              # chunk 3: 1 error
        )
        sigs = spark.createDataFrame(
            [(1, base), (2, base ^ flips)], "doc_id long, dhash long"
        )
        pairs = hamming_neardup_pairs_mih(sigs).collect()
        assert len(pairs) == 1 and pairs[0]["hamming"] == 6

    def test_preconditions_raise(self, spark):
        from yelp_data_pipeline_spark.operators.multimodal import (
            hamming_neardup_pairs_mih,
            image_neardup_pairs,
        )

        sigs = spark.createDataFrame([(1, 0)], "doc_id long, dhash long")
        with pytest.raises(ValueError):
            hamming_neardup_pairs_mih(sigs, bits=56, chunks=5)
        # ball radius floor(12/4)=3 is IMPLEMENTED since round 12
        # (generic literal-mask enumeration, 1880 keys/item — under
        # the 2048 cap); the loud failure moved to the fan-out guard,
        # pinned in tests/test_round12_ops.py::test_fanout_guard_raises.
        with pytest.raises(ValueError):
            # banding precondition now a real error, not an assert
            image_neardup_pairs(sigs, max_hamming=7, bands=7)


class TestAudioEmptyPayload:
    def test_empty_data_chunk_yields_zero_fingerprint(self, spark):
        """An empty WAV data chunk (empty source text) must emit
        afp=0 / n_samples=0 — the oracle's zero-padding CASE — not an
        IndexError inside the Arrow worker."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            audio_fingerprint,
            build_wav,
        )

        df = spark.createDataFrame(
            [
                (1, build_wav(b"", sample_rate=8000, n_channels=1)),
                (2, build_wav(bytes(range(100)), 8000, 1)),
            ],
            "doc_id long, payload binary",
        )
        got = {
            r["doc_id"]: (r["n_samples"], r["afp"])
            for r in audio_fingerprint(df).collect()
        }
        assert got[1] == (0, 0)
        assert got[2][0] == 50 and got[2][1] > 0


class TestAviCodec:
    def _frames(self, w, h, n, fn):
        out = []
        for f in range(n):
            px = bytearray()
            for y in range(h):
                for x in range(w):
                    px.extend(fn(f, y, x))
            out.append(bytes(px))
        return out

    def test_container_roundtrip(self):
        """build_avi -> parse_avi -> decode_avi_frame recovers every
        header field and every frame's exact top-down pixels, with and
        without the JUNK chunk displacing movi."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            build_avi,
            decode_avi_frame,
            parse_avi,
        )

        w, h, n = 10, 6, 3  # stride 32 > w*3=30: padding exercised
        frames = self._frames(w, h, n, lambda f, y, x: (f + x, y, 7))
        for junk in (False, True):
            payload = build_avi(frames, w, h, fps=10, with_junk_chunk=junk)
            m = parse_avi(payload)
            assert (m["width"], m["height"], m["n_frames"]) == (w, h, n)
            assert m["usec_per_frame"] == 100000
            assert m["bpp"] == 24
            assert len(m["frame_offsets"]) == n
            for f in range(n):
                assert decode_avi_frame(payload, m, f) == frames[f]
        # JUNK must displace the first frame offset by its 18 bytes.
        off0 = parse_avi(build_avi(frames, w, h))["frame_offsets"][0]
        off1 = parse_avi(
            build_avi(frames, w, h, with_junk_chunk=True)
        )["frame_offsets"][0]
        assert off1 == off0 + 18

    def test_malformed_rejected(self):
        from yelp_data_pipeline_spark.operators.multimodal import (
            build_avi,
            parse_avi,
        )

        with pytest.raises(ValueError):
            parse_avi(b"RIFF\x00\x00\x00\x00WAVE")
        good = build_avi(self._frames(4, 4, 2, lambda f, y, x: (1, 2, 3)), 4, 4)
        with pytest.raises(ValueError):
            parse_avi(good[:-5])  # truncated: RIFF size mismatch
        with pytest.raises(ValueError):
            build_avi([b"\x00" * 5], 4, 4)  # frame/dims mismatch


class TestVideoNearDup:
    def test_planted_edit_matches_distinct_footage_does_not(self, spark):
        """A re-encode-like copy with one edited frame patch matches
        on >=2 aligned frames; reversed footage does not."""
        from yelp_data_pipeline_spark.operators import multimodal as mm

        w, h, n = 18, 14, 4
        grad = lambda f, y, x: ((x * 12 + f * 3) % 256,) * 3  # noqa: E731

        def edited(f, y, x):
            if f == 1 and (y, x) == (3, 3):
                return ((x * 12 + f * 3 + 40) % 256,) * 3
            return grad(f, y, x)

        rev = lambda f, y, x: ((255 - x * 12 - f * 3) % 256,) * 3  # noqa: E731

        def avi(fn):
            frames = []
            for f in range(n):
                px = bytearray()
                for y in range(h):
                    for x in range(w):
                        px.extend(fn(f, y, x))
                frames.append(bytes(px))
            return mm.build_avi(frames, w, h)

        df = spark.createDataFrame(
            [(1, avi(grad)), (2, avi(edited)), (3, avi(rev))],
            "doc_id long, payload binary",
        )
        sigs = mm.video_frame_fingerprints(df, stride=2)  # frames 0, 2
        got = {
            (r["video_a"], r["video_b"]): (
                r["matched_frames"],
                r["min_hamming"],
            )
            for r in mm.video_neardup_pairs(sigs).collect()
        }
        assert (1, 2) in got and got[(1, 2)][0] == 2
        assert (1, 3) not in got and (2, 3) not in got


class TestVideoPackingGuard:
    def test_high_frame_idx_not_misattributed(self, spark):
        """Regression: with 4-bit packing, frames (10, idx 16) and
        (26, idx 16) collided with (11, idx 0) / (27, idx 0) and a
        genuine match was attributed to the WRONG videos. 16-bit
        packing must attribute it to videos 10 and 26."""
        from yelp_data_pipeline_spark.operators.multimodal import (
            video_neardup_pairs,
        )

        sigs = spark.createDataFrame(
            [(10, 16, 0xAAAA), (26, 16, 0xAAAA),
             (10, 17, 0x5555), (26, 17, 0x5555)],
            "doc_id long, frame_idx int, dhash long",
        )
        got = {
            (r["video_a"], r["video_b"]): r["matched_frames"]
            for r in video_neardup_pairs(sigs).collect()
        }
        assert got == {(10, 26): 2}

    def test_overflowing_frame_idx_raises(self, spark):
        """A frame_idx that cannot pack must fail LOUDLY (assert_true),
        never silently merge key spaces."""
        import pytest

        from yelp_data_pipeline_spark.operators.multimodal import (
            video_neardup_pairs,
        )

        sigs = spark.createDataFrame(
            [(1, 1 << 16, 0xAAAA), (2, 1 << 16, 0xAAAA)],
            "doc_id long, frame_idx int, dhash long",
        )
        # The guard's own MESSAGE — a catch-all without the match
        # would pass even with the packing guard removed. The wrapper
        # type varies run to run: with the signature relation persisted
        # (r17), both AQE join-side stages can fail concurrently and
        # Spark wraps them in a multi-failure SparkException, captured
        # as UnknownException OR surfacing as a raw Py4JJavaError when
        # the multi-failure class escapes the captured-exception
        # mapping (observed both ways on the same tree); a single-task
        # failure converts to the plain SparkRuntimeException. Pinning
        # the three concrete wrappers (r18, advisor) keeps an unrelated
        # failure that merely QUOTES the phrase from passing.
        from py4j.protocol import Py4JJavaError
        from pyspark.errors import SparkRuntimeException, UnknownException

        with pytest.raises(
            (SparkRuntimeException, UnknownException, Py4JJavaError),
            match="packing overflow",
        ):
            video_neardup_pairs(sigs, min_matched_frames=1).collect()
