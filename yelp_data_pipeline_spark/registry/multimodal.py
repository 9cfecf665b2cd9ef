"""North-star: multimodal plumbing — real pure-Python codecs (WAV/NPY/BMP/AVI), fingerprints, MIH hamming joins.

Split from the single-file queries.py (round 15). Modules are imported by registry/__init__.py in a FIXED order; every @_q call appends to the shared _REGISTRY in registry/core.py, so registration order (the driver's export order) is preserved byte-for-byte.
"""

from __future__ import annotations

from .core import F, _q, _t, dd, mm, tx  # noqa: F401
from .dedup import _SHINGLES_CTE  # noqa: F401

# --------------------------------------------------------------------------
# North-star: multimodal plumbing — REAL pure-Python codecs (WAV / NPY)
# --------------------------------------------------------------------------
#
# The oracle side never touches bytes: it recomputes the container
# arithmetic (header layout, block alignment, chunk offsets) straight
# from the table columns. The Spark side synthesizes a spec-valid
# container and recovers the same numbers by PARSING THE BYTES — so a
# hash match proves the codec round-trips for real.
#
# Shared WAV layout math (multimodal.py:build_wav/parse_wav):
#   block_align = (1 + doc_id % 2) * 2        [16-bit PCM, 1-2 ch]
#   data_len    = ceil(strlen/ba) * ba        [zero-padded frames]
#   data_offset = 44, +30 when doc_id % 5 = 0 [LIST/INFO chunk]

_WAV_ORACLE_BASE = """
WITH m AS (
  SELECT doc_id,
         1 + doc_id % 2 AS ch,
         (1 + doc_id % 2) * 2 AS ba,
         CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
              ELSE 44100 END AS sr,
         CASE WHEN doc_id % 5 = 0 THEN 74 ELSE 44 END AS data_offset,
         strlen(text) AS sl
  FROM documents
),
w AS (
  SELECT doc_id, ch, ba, sr, data_offset,
         ((sl + ba - 1) // ba) AS n_samples,
         ((sl + ba - 1) // ba) * ba AS data_len
  FROM m
)
"""


@_q(
    "multimodal_decode_meta",
    _WAV_ORACLE_BASE + """
SELECT doc_id,
       CAST(data_offset + data_len AS INT) AS n_bytes,
       CAST(sr AS INT) AS sample_rate,
       CAST(ch AS INT) AS n_channels,
       CAST(n_samples AS INT) AS n_samples,
       CAST(n_samples * 1000 // sr AS INT) AS duration_ms
FROM w
""",
    doc="REAL container decode via Arrow mapInPandas: each row's text "
    "bytes are serialized into a spec-valid RIFF/WAVE file "
    "(multimodal.py:build_wav — rate/channels id-derived, every 5th "
    "row carries an extra LIST/INFO chunk), then parse_wav recovers "
    "sample rate, channels, sample count and duration from BYTES "
    "ALONE (struct.unpack chunk walk — no fixed-offset shortcut, the "
    "INFO rows would break one). The oracle recomputes the layout "
    "arithmetic independently, so a hash match proves the codec "
    "round-trips.",
)
def q_multimodal_decode_meta(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    return mm.decode_wav_meta(d)


@_q(
    "multimodal_bmp_decode",
    """
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
)
SELECT doc_id,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(24 AS INT) AS bpp,
       CAST(((w * 3 + 3) // 4) * 4 AS INT) AS row_stride,
       CAST(54 + ((w * 3 + 3) // 4) * 4 * h AS INT) AS n_bytes
FROM dims
""",
    doc="REAL image-container decode (multimodal.py:build_bmp / "
    "parse_bmp via Arrow mapInPandas): id-derived dimensions and "
    "formula pixels serialize into spec-valid 24-bit BMPs — "
    "BOTTOM-UP rows, 4-byte stride padding, the two traps a real BMP "
    "consumer must handle — then the parser recovers dimensions/"
    "stride/size from bytes alone. The oracle recomputes the layout "
    "arithmetic independently; a hash match proves the container "
    "round-trips. Completes the image modality next to WAV (audio) "
    "and NPY (tensor).",
)
def q_multimodal_bmp_decode(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    return mm.decode_bmp_meta(d)


@_q(
    "multimodal_bmp_resize",
    """
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
)
SELECT doc_id, CAST(8 AS INT) AS out_w, CAST(8 AS INT) AS out_h,
       md5(array_to_string(
         list_transform(generate_series(0, 191),
           k -> (doc_id * 31
                 + ((((k // 24) * h) // 8) * w * 3
                    + ((((k % 24) // 3) * w) // 8) * 3
                    + (k % 3)) * 7) % 256),
         ',')) AS px_md5
FROM dims
""",
    doc="REAL image resize (multimodal.py:resize_bmp_nearest): parse "
    "the BMP, reshape the decoded buffer to (h, w, 3) in numpy, "
    "nearest-neighbor index-sample to 8×8 (src = dst·src_dim // "
    "dst_dim — pure integer), digest the resized pixel sequence. The "
    "oracle replays the sampling arithmetic on the formula pixels "
    "WITHOUT touching bytes — so the hash only matches if the whole "
    "byte path (bottom-up un-flip, stride strip, reshape, resample) "
    "is exact. Pixels digest as a comma-joined int sequence, never a "
    "raw blob (byte-order/encoding-safe across engines).",
)
def q_multimodal_bmp_resize(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    return mm.resize_bmp_nearest(d, out_w=8, out_h=8)


def _dhash_luma_sql(y: str, x: str) -> str:
    """DuckDB fixed-point BT.601 luma of the formula pixel at (y, x)."""
    def px(c: int) -> str:
        return (
            f"((doc_id * 31 + (({y}) * w * 3 + ({x}) * 3 + {c}) * 7) % 256)"
        )

    return f"((77 * {px(0)} + 150 * {px(1)} + 29 * {px(2)}) // 256)"


_DHASH_SQL = (
    "CAST(list_sum(list_transform(generate_series(0, 55), k -> "
    "CASE WHEN "
    + _dhash_luma_sql("((k // 8) * h) // 7", "(((k % 8) + 1) * w) // 9")
    + " > "
    + _dhash_luma_sql("((k // 8) * h) // 7", "((k % 8) * w) // 9")
    + " THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)"
)


@_q(
    "image_dhash_fingerprints",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       {_DHASH_SQL} AS dhash
FROM dims ORDER BY doc_id
""",
    doc="Perceptual difference-hash from IMAGE BYTES "
    "(operators/multimodal.py:image_dhash): BMP parse -> fixed-point "
    "BT.601 integer luma -> nearest-neighbor 9x7 resample -> one bit "
    "per horizontal neighbor comparison, 56 bits packed into a "
    "non-negative long — the standard image near-dup fingerprint "
    "(LAION-style multimodal dedup). The oracle replays luma + "
    "resample + comparison arithmetic on the formula pixels WITHOUT "
    "touching bytes, so the hash only matches if the whole byte path "
    "(bottom-up un-flip, stride strip, reshape, channel order) is "
    "exact. One Arrow mapInPandas stage; all else is arithmetic.",
)
def q_image_dhash_fingerprints(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    return mm.image_dhash(d).orderBy("doc_id")


@_q(
    "image_neardup_pairs",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
sig AS (SELECT doc_id, {_DHASH_SQL} AS dhash FROM dims)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
ORDER BY doc_a, doc_b
""",
    doc="Near-duplicate IMAGE pairs (operators/multimodal.py:"
    "image_neardup_pairs): dHash signatures banded 7 x 8 bits — a "
    "pair within hamming <= 6 differs in at most 6 bands, so by "
    "pigeonhole it collides in at least one band: the banding is "
    "LOSSLESS for the verified radius, and the oracle is the EXACT "
    "all-pairs query (not a replay), so every sweep proves recall. "
    "Candidates bucket-join on (band_id, 8-bit key), verify via one "
    "codegen bit_count(xor); the fixture's formula images share a "
    "constant-shift structure that yields genuine near-dup structure "
    "(~1.5k pairs at 500 images). Extends the dedup tier to the "
    "multimodal column.",
    scale_note="fixed 8-bit bands = 256 buckets/band — occupancy grows "
    "~n/256 and the band self-join degrades toward n²/256 at corpus "
    "scale (the round-4 SimHash wall); at scale use "
    "image_neardup_pairs_mih (multi-index hashing, 16384 buckets/"
    "chunk), which emits the identical pair set",
)
def q_image_neardup_pairs(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.image_dhash(d)
    return mm.image_neardup_pairs(sigs).orderBy("doc_a", "doc_b")


@_q(
    "image_neardup_pairs_mih",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
sig AS (SELECT doc_id, {_DHASH_SQL} AS dhash FROM dims)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
ORDER BY doc_a, doc_b
""",
    doc="Near-duplicate IMAGE pairs by MULTI-INDEX HASHING (operators/"
    "multimodal.py:hamming_neardup_pairs_mih; Norouzi-Punjani-Fleet "
    "CVPR'12) — the scale path past image_neardup_pairs' fixed-band "
    "occupancy wall: 4 chunks × 14 bits = 16384 buckets per chunk "
    "(64× the 8-bit bands), with the lost radius recovered by probing "
    "every key within Hamming-ball radius floor(6/4)=1 of each probe "
    "chunk (15 keys/chunk) against exact index keys — lossless at "
    "radius 6 by pigeonhole. Shares the banding row's EXACT all-pairs "
    "oracle verbatim: every sweep proves the two variants emit the "
    "identical pair set while this one's bucket occupancy is 64× "
    "slimmer. The probe explode is a constant 60 rows/image vs the "
    "band join's 7 — a fixed row tax paid once for the selectivity.",
    scale_note="candidate volume for ANY lossless hamming-radius-6 "
    "bucketing is ~n²/2^chunk_bits, and 14-bit chunks are the MAX a "
    "56-bit code admits at this radius (ball ≤ 1 needs ≥ 4 chunks) — "
    "~7.5× under the 8-bit banding join but still quadratic; at "
    "corpus scale widen the CODE (e.g. 8×15 dHash = 120 bits → 7×17-"
    "bit exact bands, 131072 buckets) so bucket count grows with n, "
    "the IVF cells-∝-n discipline applied to hamming space",
)
def q_image_neardup_pairs_mih(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.image_dhash(d)
    return mm.hamming_neardup_pairs_mih(sigs).orderBy("doc_a", "doc_b")


@_q(
    "image_neardup_pairs_mih_r8",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
sig AS (SELECT doc_id, {_DHASH_SQL} AS dhash FROM dims)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.dhash, b.dhash)) <= 8
ORDER BY doc_a, doc_b
""",
    doc="MIH at Hamming radius 8 — the wider-radius envelope the "
    "round-11 implementation walled off with a ValueError: "
    "floor(8/4)=2 errors can land in EVERY 14-bit chunk, so the probe "
    "side now enumerates the full ball of radius 2 per chunk "
    "(1+14+C(14,2)=106 literal-mask keys/chunk, 424/image — static "
    "expressions, one explode) against exact index keys; lossless by "
    "the same pigeonhole (8 errors over 4 chunks ⇒ some chunk ≤ 2). "
    "The oracle is the EXACT all-pairs join at radius 8 — every sweep "
    "proves recall at the radius the old guard refused. An "
    "adversarial planted pair with exactly 2 errors per chunk (which "
    "radius-1 probing can never candidate) is pinned in "
    "tests/test_round12_ops.py.",
    scale_note="the ~n²/2^14 lossless-bucketing candidate law from "
    "image_neardup_pairs_mih applies unchanged, and radius 8 admits "
    "more TRUE pairs by definition; the 424-key probe explode is a "
    "constant row tax. At corpus scale widen the code (120-bit dHash "
    "→ 8×15-bit chunks keep ball ≤ 1 at radius 8) before widening "
    "the radius",
)
def q_image_neardup_pairs_mih_r8(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.image_dhash(d)
    return mm.hamming_neardup_pairs_mih(sigs, max_hamming=8).orderBy(
        "doc_a", "doc_b"
    )


_DHASH120_BIT = (
    "CASE WHEN "
    + _dhash_luma_sql("((k // 15) * h) // 8", "(((k % 15) + 1) * w) // 16")
    + " > "
    + _dhash_luma_sql("((k // 15) * h) // 8", "((k % 15) * w) // 16")
    + " THEN 1 ELSE 0 END"
)

_DHASH120_LO = (
    "CAST(list_sum(list_transform(generate_series(0, 59), k -> ("
    + _DHASH120_BIT
    + ") * (CAST(1 AS BIGINT) << CAST(k AS INT)))) AS BIGINT)"
)

_DHASH120_HI = (
    "CAST(list_sum(list_transform(generate_series(60, 119), k -> ("
    + _DHASH120_BIT
    + ") * (CAST(1 AS BIGINT) << CAST(k - 60 AS INT)))) AS BIGINT)"
)


@_q(
    "image_dhash_fingerprints_wide",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
)
SELECT doc_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       {_DHASH120_HI} AS dh_hi,
       {_DHASH120_LO} AS dh_lo
FROM dims ORDER BY doc_id
""",
    doc="120-bit dHash split across two longs (operators/multimodal"
    ".py:image_dhash_wide) — the WIDER CODE the 56-bit rows' "
    "scale_notes name as the real scale fix: 8 rows × 15 neighbor "
    "comparisons on a (8, 16) luma resample, bits 0-59 in dh_lo and "
    "60-119 in dh_hi. The oracle replays the full luma + resample + "
    "comparison + two-long packing arithmetic on the formula pixels, "
    "so the hashes only match if the byte path AND the hi/lo split "
    "are exact. Same one-Arrow-pass shape as the 56-bit row.",
)
def q_image_dhash_fingerprints_wide(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    return mm.image_dhash_wide(d).orderBy("doc_id")


@_q(
    "image_neardup_pairs_wide",
    f"""
WITH dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
sig AS (
  SELECT doc_id, {_DHASH120_HI} AS hi, {_DHASH120_LO} AS lo FROM dims
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.hi, b.hi))
            + bit_count(xor(a.lo, b.lo)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.hi, b.hi)) + bit_count(xor(a.lo, b.lo)) <= 8
ORDER BY doc_a, doc_b
""",
    doc="Near-duplicate image pairs over the 120-BIT code (operators/"
    "multimodal.py:hamming_neardup_pairs_mih_wide) — the widen-the-"
    "code scale path, now implemented rather than only named in "
    "scale_notes: 8 × 15-bit chunks = 32768 buckets per chunk (2× "
    "the 56-bit code's 14-bit chunks), and ball radius stays ≤ 1 for "
    "every Hamming radius up to 15 (16 keys/chunk, 128 probe rows/"
    "item) where the 56-bit code needs ball-2 enumeration past "
    "radius 7. No chunk straddles the two longs (15 | 60); verify is "
    "bit_count(hi⊕hi) + bit_count(lo⊕lo) in codegen. The oracle is "
    "the EXACT all-pairs join at radius 8 over the replayed 120-bit "
    "formula hashes — recall proven per sweep, and radius-12 "
    "losslessness pinned in tests/test_round12_ops.py.",
    scale_note="candidate volume ~n²/2^15 per chunk-bucket law — 2× "
    "under the 56-bit MIH and 128× under the 8-bit banding; the "
    "probe explode is a constant 128 rows/image. This IS the "
    "widen-the-code path the 56-bit rows point to; past this, grow "
    "bits with log₂(n) (the IVF cells-∝-n discipline in hamming "
    "space)",
)
def q_image_neardup_pairs_wide(spark, sf_dir):
    d = mm.attach_bmp_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.image_dhash_wide(d)
    return mm.hamming_neardup_pairs_mih_wide(sigs, max_hamming=8).orderBy(
        "doc_a", "doc_b"
    )


def _pcm_byte_sql(pos: str) -> str:
    """DuckDB byte of the WAV data chunk at 0-based ``pos``: the PCM
    body is the doc's ASCII text bytes plus zero padding."""
    return (
        f"(CASE WHEN ({pos}) < sl "
        f"THEN ord(substr(text, CAST(({pos}) + 1 AS INT), 1)) "
        f"ELSE 0 END)"
    )


_AFP_SQL = (
    "CAST(list_sum(list_transform(generate_series(0, 55), k -> "
    "CASE WHEN "
    + _pcm_byte_sql("((k + 1) * data_len) // 57")
    + " > "
    + _pcm_byte_sql("(k * data_len) // 57")
    + " THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)"
)


@_q(
    "audio_fingerprints",
    _WAV_ORACLE_BASE + f""",
t AS (
  SELECT w.doc_id, w.sr, w.n_samples, w.data_len, d.text,
         strlen(d.text) AS sl
  FROM w JOIN documents d USING (doc_id)
)
SELECT doc_id, CAST(sr AS INT) AS sample_rate,
       CAST(n_samples AS INT) AS n_samples,
       {_AFP_SQL} AS afp
FROM t ORDER BY doc_id
""",
    doc="Perceptual fingerprint from AUDIO bytes (operators/"
    "multimodal.py:audio_fingerprint) — the dHash trick on the PCM "
    "body: RIFF chunk walk, nearest-neighbor resample of the data "
    "chunk to 57 positions, one waveform-shape bit per neighbor "
    "comparison, 56 bits in a non-negative long. The oracle replays "
    "the byte arithmetic from the source text (the synthesized PCM "
    "body) WITHOUT touching bytes, so the hash only matches if the "
    "chunk walk, data offset, and block-align padding are exact. "
    "One Arrow mapInPandas stage.",
)
def q_audio_fingerprints(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    return mm.audio_fingerprint(d).orderBy("doc_id")


# Audio near-dup pairs reuse the image path's hash-agnostic joins
# over audio_fingerprint signatures. At the standard hamming<=6
# radius the fixture's synthesized PCM (document text bytes) has NO
# pairs (measured min pairwise hamming = 11 — insertions shift the
# sample alignment), so the r6 arm stays pinned by the planted-edit
# readback in tests/test_round10_ops.py instead of an empty registry
# row. The generic Hamming-ball enumeration (round 12) reaches radius
# 12 (ball 3 over 4x14-bit chunks, 1880 probe keys/item — under the
# 2048 fan-out cap), where the fixture DOES hold genuine pairs — that
# non-empty row follows.


@_q(
    "audio_neardup_pairs",
    _WAV_ORACLE_BASE + f""",
t AS (
  SELECT w.doc_id, w.data_len, d.text, strlen(d.text) AS sl
  FROM w JOIN documents d USING (doc_id)
),
sig AS (SELECT doc_id, {_AFP_SQL} AS afp FROM t)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.afp, b.afp)) AS INT) AS hamming
FROM sig a JOIN sig b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.afp, b.afp)) <= 12
ORDER BY doc_a, doc_b
""",
    doc="Near-duplicate AUDIO pairs at Hamming radius 12 — the first "
    "NON-EMPTY audio arm (rounds 10-11 could only 0-prove the r6 "
    "radius: the fixture's min pairwise fingerprint distance is 11): "
    "ball radius floor(12/4)=3 over the 4×14-bit MIH chunks, 1880 "
    "literal-mask probe keys/item under the 2048 fan-out cap, "
    "exercising the generic multi-bit Hamming-ball enumeration at "
    "its widest shipped setting. The oracle is the EXACT all-pairs "
    "join over the replayed PCM fingerprint arithmetic, so the sweep "
    "proves pigeonhole losslessness at ball 3 on real data.",
    scale_note="radius 12 on a 56-bit code is a LOOSE gate (the "
    "candidate law ~n²/2^14 applies, and the 1880-key probe explode "
    "is a 32× row tax over radius 6) — the parity/eval setting; at "
    "corpus scale use the 120-bit wide code "
    "(image_neardup_pairs_wide's join), where radius 12 keeps ball "
    "≤ 1 and a 128-key probe",
)
def q_audio_neardup_pairs(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.audio_fingerprint(d).select(
        "doc_id", F.col("afp").alias("dhash")
    )
    return mm.hamming_neardup_pairs_mih(sigs, max_hamming=12).orderBy(
        "doc_a", "doc_b"
    )


@_q(
    "crossmodal_mismatch_pairs",
    f"""
WITH {_SHINGLES_CTE},
dims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h
  FROM documents
),
isig AS (SELECT doc_id, {_DHASH_SQL} AS dhash FROM dims),
ip AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.dhash, b.dhash)) AS INT) AS hamming
  FROM isig a JOIN isig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
),
j AS (
  SELECT p.doc_a, p.doc_b, p.hamming,
         CASE WHEN len(sa.shingles) + len(sb.shingles)
                   - len(list_intersect(sa.shingles, sb.shingles)) = 0
              THEN 1.0
              ELSE round(
                CAST(len(list_intersect(sa.shingles, sb.shingles)) AS DOUBLE)
                / CAST(len(sa.shingles) + len(sb.shingles)
                       - len(list_intersect(sa.shingles, sb.shingles))
                       AS DOUBLE), 6)
         END AS jaccard
  FROM ip p
  JOIN sh sa ON sa.doc_id = p.doc_a
  JOIN sh sb ON sb.doc_id = p.doc_b
)
SELECT doc_a, doc_b, hamming, jaccard
FROM j WHERE jaccard < 0.5
ORDER BY doc_a, doc_b
""",
    doc="Cross-modal MISMATCH detection — image near-duplicates whose "
    "TEXT disagrees (exact 3-gram Jaccard < 0.5): the caption-swap / "
    "duplicated-asset-different-caption rows a multimodal curation "
    "pipeline quarantines, because near-identical images with "
    "conflicting captions poison contrastive training (the LAION-"
    "style image-text consistency sweep). Composes the production "
    "matchers: the MIH hamming<=6 image join supplies the pairs, the "
    "shared shingle relation supplies exact text Jaccard (empty-"
    "union pairs count as identical, never a divide-by-zero); both "
    "relations already verified standalone. One bucketed image join "
    "+ two doc-keyed shingle joins — the text relation shuffles "
    "only (doc, shingles).",
)
def q_crossmodal_mismatch_pairs(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    pairs = mm.hamming_neardup_pairs_mih(
        mm.image_dhash(mm.attach_bmp_payload(docs))
    )
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
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("jaccard", jac)
        .where(F.col("jaccard") < 0.5)
        .select("doc_a", "doc_b", "hamming", "jaccard")
        .orderBy("doc_a", "doc_b")
    )


@_q(
    "length_bucketed_packing_stats",
    r"""
WITH t AS (
  SELECT doc_id,
         least(CAST(len(string_split_regex(trim(lower(text)), '\s+'))
                    AS INT), 128) AS eff_tok
  FROM documents
),
b AS (
  SELECT CAST(((eff_tok + 15) // 16) * 16 AS INT) AS bucket_cap,
         eff_tok
  FROM t
)
SELECT bucket_cap,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(eff_tok) AS BIGINT) AS sum_tokens,
       CAST(count(*) * bucket_cap AS BIGINT) AS padded_tokens,
       round(1.0 - CAST(sum(eff_tok) AS DOUBLE)
                   / CAST(count(*) * bucket_cap AS DOUBLE), 6)
         AS waste_frac,
       round(1.0 - CAST(sum(eff_tok) AS DOUBLE)
                   / CAST(count(*) * 128 AS DOUBLE), 6)
         AS naive_waste_frac
FROM b
GROUP BY bucket_cap
ORDER BY bucket_cap
""",
    doc="Length-bucketed batching eval — the padding-waste numbers "
    "that decide a training dataloader's bucketing strategy: docs "
    "clip to a 128-token context, bucket by 16-token steps, and each "
    "bucket reports the tokens actually carried vs the padded cost "
    "at its cap (waste_frac) next to the single-bucket baseline "
    "where every doc pads to the full context (naive_waste_frac — "
    "the per-bucket saving is the gap). One combinable groupBy over "
    "a two-column projection; the bucket key is pure arithmetic so "
    "the aggregate is map-side combinable at any corpus size.",
)
def q_length_bucketed_packing_stats(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    eff = F.least(tx.token_count(F.col("text")), F.lit(128)).cast("int")
    cap = ((F.col("eff_tok") + 15) / 16).cast("int") * 16
    t = docs.select(eff.alias("eff_tok"))
    return (
        t.select("eff_tok", cap.cast("int").alias("bucket_cap"))
        .groupBy("bucket_cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("eff_tok").cast("long").alias("sum_tokens"),
        )
        .select(
            "bucket_cap",
            "n_docs",
            "sum_tokens",
            (F.col("n_docs") * F.col("bucket_cap"))
            .cast("long")
            .alias("padded_tokens"),
            F.round(
                F.lit(1.0)
                - F.col("sum_tokens").cast("double")
                / (F.col("n_docs") * F.col("bucket_cap")).cast("double"),
                6,
            ).alias("waste_frac"),
            F.round(
                F.lit(1.0)
                - F.col("sum_tokens").cast("double")
                / (F.col("n_docs") * 128).cast("double"),
                6,
            ).alias("naive_waste_frac"),
        )
        .orderBy("bucket_cap")
    )


@_q(
    "multimodal_frame_sample",
    _WAV_ORACLE_BASE + """,
f AS (
  SELECT doc_id, ba, data_offset,
         greatest(1, n_samples // 160) AS n_frames
  FROM w
)
SELECT doc_id,
       CAST(i AS INT) AS frame_idx,
       CAST(data_offset + i * 160 * ba AS INT) AS frame_offset
FROM (SELECT doc_id, ba, data_offset,
             unnest(generate_series(0, n_frames - 1, 2)) AS i
      FROM f)
""",
    doc="Row-expanding frame sampler over REAL WAV containers (every "
    "2nd 160-sample analysis frame) via Arrow mapInPandas: "
    "frame_offset is the byte-accurate position data_offset + idx * "
    "160 * block_align, where data_offset comes from an actual chunk "
    "walk (it varies 44/74 across rows — the INFO-chunk rows prove "
    "the reader walks chunks rather than assuming the canonical "
    "44-byte header).",
)
def q_multimodal_frame_sample(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    return mm.sample_frames(d, stride=2)


def _vdhash_luma_sql(y: str, x: str) -> str:
    """DuckDB fixed-point BT.601 luma of the formula pixel at (y, x)
    of video frame ``f`` (the BMP formula plus the per-frame shift)."""
    def px(c: int) -> str:
        return (
            f"((doc_id * 31 + f * 13 + (({y}) * w * 3 + ({x}) * 3 + {c}) * 7)"
            " % 256)"
        )

    return f"((77 * {px(0)} + 150 * {px(1)} + 29 * {px(2)}) // 256)"


_VDHASH_SQL = (
    "CAST(list_sum(list_transform(generate_series(0, 55), k -> "
    "CASE WHEN "
    + _vdhash_luma_sql("((k // 8) * h) // 7", "(((k % 8) + 1) * w) // 9")
    + " > "
    + _vdhash_luma_sql("((k // 8) * h) // 7", "((k % 8) * w) // 9")
    + " THEN (CAST(1 AS BIGINT) << CAST(k AS INT)) ELSE 0 END)) AS BIGINT)"
)

_VIDEO_SIG_CTE = """
vdims AS (
  SELECT doc_id,
         8 + (doc_id % 5) * 4 AS w,
         6 + (doc_id % 3) * 6 AS h,
         2 + doc_id % 4 AS n_frames
  FROM documents
),
vsig AS (
  SELECT doc_id, CAST(f AS INT) AS frame_idx,
         CAST(w AS INT) AS width, CAST(h AS INT) AS height,
         {dhash} AS dhash
  FROM (SELECT doc_id, w, h,
               unnest(generate_series(0, n_frames - 1, 2)) AS f
        FROM vdims)
)""".format(dhash=_VDHASH_SQL)


@_q(
    "multimodal_avi_decode",
    """
SELECT doc_id,
       CAST(8 + (doc_id % 5) * 4 AS INT) AS width,
       CAST(6 + (doc_id % 3) * 6 AS INT) AS height,
       CAST(2 + doc_id % 4 AS INT) AS n_frames,
       CAST(100000 AS INT) AS usec_per_frame,
       CAST(232 + 18 * (doc_id % 2) AS INT) AS first_frame_offset,
       CAST(224 + 18 * (doc_id % 2)
            + (2 + doc_id % 4)
              * (8 + ((8 + (doc_id % 5) * 4) * 3 + 3) // 4 * 4
                     * (6 + (doc_id % 3) * 6)) AS INT) AS n_bytes
FROM documents ORDER BY doc_id
""",
    doc="REAL video container decode (operators/multimodal.py:"
    "build_avi/parse_avi): a spec-valid uncompressed RIFF AVI — LIST "
    "hdrl {avih, LIST strl {strh, strf}} + LIST movi of '00db' DIB "
    "frames (bottom-up rows, 4-byte stride, the BMP traps per frame), "
    "odd ids carrying a JUNK chunk before movi so the frame offset "
    "varies (proves the reader walks chunks, the WAV INFO trick). The "
    "oracle recomputes the full container layout arithmetic — header "
    "sizes, stride, per-frame chunk bytes, JUNK displacement — so a "
    "hash match proves the writer AND the chunk-walking parser agree "
    "byte-for-byte. Closes the modality set: WAV audio, NPY tensor, "
    "BMP image, AVI video.",
)
def q_multimodal_avi_decode(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    return mm.decode_avi_meta(d).orderBy("doc_id")


@_q(
    "video_frame_fingerprints",
    f"""
WITH {_VIDEO_SIG_CTE}
SELECT doc_id, frame_idx, width, height, dhash
FROM vsig ORDER BY doc_id, frame_idx
""",
    doc="Frame-sampled perceptual fingerprints over REAL AVI "
    "containers (operators/multimodal.py:video_frame_fingerprints): "
    "RIFF chunk walk, every 2nd frame decoded (bottom-up un-flip + "
    "stride strip), per-frame dHash with the image tier's exact "
    "arithmetic (BT.601 integer luma, 9x7 nearest-neighbor resample, "
    "56 neighbor-comparison bits in a long). The oracle replays luma "
    "+ resample + comparison on the per-frame formula pixels WITHOUT "
    "touching bytes, so the hash only matches if the whole container "
    "path (movi offsets, JUNK displacement, DIB un-flip) is exact. "
    "Row-expanding mapInPandas (videos x frames/stride), the video "
    "member of the multimodal dedup tier.",
)
def q_video_frame_fingerprints(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    return mm.video_frame_fingerprints(d, stride=2).orderBy(
        "doc_id", "frame_idx"
    )


@_q(
    "video_neardup_pairs",
    f"""
WITH {_VIDEO_SIG_CTE}
SELECT a.doc_id AS video_a, b.doc_id AS video_b,
       CAST(count(*) AS INT) AS matched_frames,
       CAST(min(bit_count(xor(a.dhash, b.dhash))) AS INT) AS min_hamming
FROM vsig a
JOIN vsig b ON a.doc_id < b.doc_id AND a.frame_idx = b.frame_idx
WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
GROUP BY 1, 2
HAVING count(*) >= 2
ORDER BY video_a, video_b
""",
    doc="Video-level near-duplicates (operators/multimodal.py:"
    "video_neardup_pairs): two videos match when >=2 ALIGNED sampled "
    "frames (same frame_idx) land within hamming 6 — frame matching "
    "reuses the scale-safe multi-index hashing join over a composite "
    "(video, frame) packed key (ONE bucketed join for the whole frame "
    "relation, no per-frame loop), then survivors aggregate per video "
    "pair. The oracle is the EXACT all-pairs frame join (recall "
    "proven per sweep, like image_neardup_pairs). Completes "
    "multimodal dedup across image, audio, and video columns.",
)
def q_video_neardup_pairs(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.video_frame_fingerprints(d, stride=2)
    return mm.video_neardup_pairs(sigs).orderBy("video_a", "video_b")


@_q(
    "video_neardup_pairs_offset",
    f"""
WITH {_VIDEO_SIG_CTE},
m AS (
  SELECT a.doc_id AS video_a, b.doc_id AS video_b,
         b.frame_idx - a.frame_idx AS idx_delta,
         bit_count(xor(a.dhash, b.dhash)) AS hamming
  FROM vsig a JOIN vsig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
),
pd AS (
  SELECT video_a, video_b, idx_delta,
         CAST(count(*) AS INT) AS matched_frames,
         CAST(min(hamming) AS INT) AS min_hamming
  FROM m GROUP BY 1, 2, 3
),
best AS (
  SELECT video_a, video_b, idx_delta, matched_frames, min_hamming,
         row_number() OVER (
           PARTITION BY video_a, video_b
           ORDER BY matched_frames DESC, abs(idx_delta) ASC,
                    idx_delta ASC) AS rk
  FROM pd
)
SELECT video_a, video_b, CAST(idx_delta AS INT) AS idx_delta,
       matched_frames, min_hamming
FROM best WHERE rk = 1 AND matched_frames >= 2
ORDER BY video_a, video_b
""",
    doc="OFFSET-TOLERANT video near-duplicates (operators/multimodal"
    ".py:video_neardup_pairs_offset) — the case the aligned matcher "
    "provably misses (pinned by a planted trimmed-clip pytest): a "
    "trimmed or padded clip shifts every frame index by a constant, "
    "so no frame pair shares an index. Alignment is recovered by "
    "VOTING: every cross-video frame match (the SAME one packed-key "
    "MIH join) casts a vote for its idx delta, and the modal delta — "
    "the alignment most frames agree on — wins with a deterministic "
    "tiebreak (most frames, smallest |delta|, smallest delta); "
    ">= 2 supporting frames accepts the pair. One extra combinable "
    "groupBy over the slim matched-frame relation; the oracle is the "
    "exact all-pairs frame join with the same delta-mode aggregate.",
)
def q_video_neardup_pairs_offset(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.video_frame_fingerprints(d, stride=2)
    return mm.video_neardup_pairs_offset(sigs).orderBy(
        "video_a", "video_b"
    )


@_q(
    "video_neardup_pairs_rate",
    f"""
WITH {_VIDEO_SIG_CTE},
m AS (
  SELECT a.doc_id AS video_a, b.doc_id AS video_b,
         a.frame_idx AS idx_a, b.frame_idx AS idx_b,
         bit_count(xor(a.dhash, b.dhash)) AS hamming
  FROM vsig a JOIN vsig b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.dhash, b.dhash)) <= 6
),
hyp AS (SELECT * FROM (VALUES (1, 1), (1, 2), (2, 1))
        AS t(rate_num, rate_den)),
v AS (
  SELECT video_a, video_b, rate_num, rate_den,
         CAST(rate_den * idx_b - rate_num * idx_a AS INT) AS idx_shift,
         hamming
  FROM m CROSS JOIN hyp
),
pk AS (
  SELECT video_a, video_b, rate_num, rate_den, idx_shift,
         CAST(count(*) AS INT) AS matched_frames,
         CAST(min(hamming) AS INT) AS min_hamming
  FROM v GROUP BY 1, 2, 3, 4, 5
),
best AS (
  SELECT video_a, video_b, rate_num, rate_den, idx_shift,
         matched_frames, min_hamming,
         row_number() OVER (
           PARTITION BY video_a, video_b
           ORDER BY matched_frames DESC, rate_num * rate_den ASC,
                    rate_num ASC, abs(idx_shift) ASC, idx_shift ASC) AS rk
  FROM pk
)
SELECT video_a, video_b, rate_num, rate_den, idx_shift,
       matched_frames, min_hamming
FROM best WHERE rk = 1 AND matched_frames >= 2
ORDER BY video_a, video_b
""",
    doc="FRAME-RATE-CHANGE-tolerant video matching (operators/"
    "multimodal.py:video_neardup_pairs_rate) — closes the r12 "
    "verdict's honesty boundary on the video tier: a re-encode at a "
    "different rate is a LINEAR index map idx_b = (num/den)·idx_a + "
    "shift/den, whose per-pair deltas are all distinct, so modal-"
    "DELTA voting provably finds nothing (planted 2×-rate pytest). "
    "Each cross-video frame match (the SAME one packed-key MIH join) "
    "casts one vote per candidate rate for the invariant shift = "
    "den·idx_b − num·idx_a; under the true rate the shifts agree, "
    "under a wrong one they scatter — Hough-style voting over a "
    "BOUNDED hypothesis family {{identity, half, double}}, which is "
    "what keeps a 2-frame-consistent line from being findable for "
    "every pair. Identity in the family makes this a strict "
    "generalization of the offset matcher (a pure trim reports "
    "(1,1,delta)). Constant len(rates)× expansion of the slim "
    "matched-frame relation, two combinable groupBys, deterministic "
    "tiebreak (frames desc, simplest rate, smallest |shift|, "
    "smallest shift). Oracle = exact all-pairs frame join with the "
    "vote replayed in SQL.",
)
def q_video_neardup_pairs_rate(spark, sf_dir):
    d = mm.attach_avi_payload(_t(spark, sf_dir, "documents"))
    sigs = mm.video_frame_fingerprints(d, stride=2)
    return mm.video_neardup_pairs_rate(sigs).orderBy("video_a", "video_b")


@_q(
    "multimodal_resize_meta",
    _WAV_ORACLE_BASE + """
SELECT doc_id,
       CAST(sr AS INT) AS sample_rate,
       CAST(n_samples AS INT) AS n_samples,
       CAST(least(sr, 16000) AS INT) AS out_rate,
       CAST((n_samples * least(sr, 16000)) // sr AS INT) AS out_samples
FROM w
""",
    doc="Resample planning over decoded audio metadata (clamp to 16 "
    "kHz, integer-exact sample scaling) — pure Catalyst over the "
    "mapInPandas decode stage; the resample kernel itself would slot "
    "into the same Arrow stage.",
)
def q_multimodal_resize_meta(spark, sf_dir):
    d = mm.attach_wav_payload(_t(spark, sf_dir, "documents"))
    return mm.resample_plan(mm.decode_wav_meta(d))


@_q(
    "multimodal_npy_decode",
    """
SELECT vec_id,
       '<f4' AS dtype,
       1 AS ndim,
       CAST(len(embedding) AS INT) AS n_elems,
       CAST(((10 + 56 + strlen(CAST(len(embedding) AS VARCHAR)) + 1 + 63)
             // 64) * 64 + 4 * len(embedding) AS INT) AS n_bytes,
       round(CAST(embedding[1] AS DOUBLE), 6) AS first_val
FROM embeddings
""",
    doc="REAL numpy-format round-trip: each embedding's float32 bytes "
    "are wrapped in a spec-valid .npy v1.0 payload (multimodal.py:"
    "build_npy — np.load reads them), then parse_npy recovers dtype, "
    "shape, total size, and the FIRST FLOAT VALUE unpacked straight "
    "from the data section — matching it against the source array "
    "proves the parser located the 64-byte-aligned data offset "
    "correctly. Oracle recomputes the v1.0 header-length arithmetic "
    "(10-byte preamble + 56-char fixed dict + digits of n, padded to "
    "64).",
)
def q_multimodal_npy_decode(spark, sf_dir):
    d = mm.attach_npy_payload(_t(spark, sf_dir, "embeddings"))
    return mm.decode_npy_meta(d).withColumn(
        "first_val", F.round(F.col("first_val"), 6)
    )


