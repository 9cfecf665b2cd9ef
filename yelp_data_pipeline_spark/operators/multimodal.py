"""Multimodal column plumbing (north-star extension) — REAL codecs.

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. Earlier rounds stubbed the codec step; this version
ships two genuinely decodable pure-Python containers so the decode
stage exercises real byte-parsing end-to-end with zero external
libraries:

- **WAV (RIFF)** — :func:`build_wav` emits a spec-valid RIFF/WAVE file
  (fmt + optional LIST/INFO chunk + data); :func:`parse_wav` walks the
  chunk list with ``struct.unpack`` exactly as a real reader must (it
  cannot assume the canonical 44-byte header — some rows carry an INFO
  chunk before ``data``).
- **NPY (numpy format v1.0)** — :func:`build_npy` emits the magic +
  aligned header-dict + raw little-endian data; :func:`parse_npy`
  validates the magic, reads the header length, and parses
  descr/fortran_order/shape without importing numpy's own loader.

The correctness loop: payload synthesis derives its parameters
(sample rate, channels, shape) from table columns, the decoder
recovers them from BYTES ALONE, and the DuckDB oracle recomputes the
same metadata arithmetically — any header-layout or parsing bug breaks
the three-way agreement.

At scale: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row counts) governs task
sizing, and ``arrow.maxRecordsPerBatch`` keeps per-batch memory bounded
inside the Python workers. True image/video codecs (PIL/ffmpeg) slot
into the same ``mapInPandas`` stage with identical batch shape.
"""

from __future__ import annotations

import ast
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ------------------------------------------------------------------ WAV

_WAV_RATES = (8000, 16000, 44100)


def build_wav(
    pcm: bytes,
    sample_rate: int,
    n_channels: int,
    with_info_chunk: bool = False,
) -> bytes:
    """Serialize a spec-valid 16-bit PCM RIFF/WAVE file.

    ``pcm`` is zero-padded to a whole number of sample frames
    (``block_align = n_channels * 2`` bytes). When ``with_info_chunk``
    is set, a 30-byte LIST/INFO chunk precedes ``data`` — forcing any
    reader to walk chunks instead of assuming the 44-byte layout.
    """
    bits = 16
    block_align = n_channels * bits // 8
    pad = (-len(pcm)) % block_align
    data = pcm + b"\x00" * pad
    fmt = struct.pack(
        "<4sIHHIIHH",
        b"fmt ", 16, 1, n_channels, sample_rate,
        sample_rate * block_align, block_align, bits,
    )
    info = b""
    if with_info_chunk:
        # LIST content = 'INFO' (4) + ISFT subchunk header (8) + payload
        # (10) = 22 bytes -> a 30-byte chunk total, data at offset 74
        info = struct.pack("<4sI4s4sI", b"LIST", 22, b"INFO", b"ISFT", 10)
        info += b"sparkgen\x00\x00"
    body = b"WAVE" + fmt + info + struct.pack("<4sI", b"data", len(data)) + data
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def parse_wav(payload: bytes) -> dict:
    """Parse a RIFF/WAVE container from bytes alone: validate magic,
    walk the chunk list for ``fmt `` and ``data``, and derive sample
    counts from byte sizes. Raises ``ValueError`` on malformed input
    (a quarantine-not-crash policy belongs in the caller)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size does not match payload length")
    pos, fmt_info, data_offset, data_len = 12, None, None, None
    while pos + 8 <= len(payload):
        cid, csize = struct.unpack_from("<4sI", payload, pos)
        if cid == b"fmt ":
            (audio_fmt, n_channels, sample_rate, _byte_rate,
             block_align, bits) = struct.unpack_from("<HHIIHH", payload, pos + 8)
            if audio_fmt != 1:
                raise ValueError(f"unsupported WAV encoding {audio_fmt}")
            fmt_info = (n_channels, sample_rate, block_align, bits)
        elif cid == b"data":
            data_offset, data_len = pos + 8, csize
        pos += 8 + csize + (csize % 2)  # chunks are word-aligned
    if fmt_info is None or data_offset is None:
        raise ValueError("missing fmt or data chunk")
    n_channels, sample_rate, block_align, bits = fmt_info
    n_samples = data_len // block_align
    return {
        "n_bytes": len(payload),
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "data_offset": data_offset,
        "n_samples": n_samples,
        "duration_ms": n_samples * 1000 // sample_rate,
    }


# ------------------------------------------------------------------ NPY

def build_npy(data: bytes, descr: str, shape: tuple[int, ...]) -> bytes:
    """Serialize numpy format v1.0: magic, little-endian header length,
    header dict padded with spaces to 64-byte alignment, raw data."""
    header = (
        "{'descr': '%s', 'fortran_order': False, 'shape': %s, }"
        % (descr, repr(shape if len(shape) != 1 else (shape[0],)))
    )
    base = 6 + 2 + 2  # magic + version + header-len field
    pad = (-(base + len(header) + 1)) % 64
    header = header + " " * pad + "\n"
    return (
        b"\x93NUMPY" + bytes([1, 0])
        + struct.pack("<H", len(header))
        + header.encode("latin1")
        + data
    )


_DTYPE_SIZES = {"<f4": 4, "<f8": 8, "<i4": 4, "<i8": 8, "<i2": 2, "|u1": 1}


def parse_npy(payload: bytes) -> dict:
    """Parse a .npy v1.x header from bytes alone: magic, header length,
    literal-eval'd dict, element count from shape, and the first value
    (when float32) unpacked straight from the data section."""
    if payload[:6] != b"\x93NUMPY":
        raise ValueError("not an NPY payload")
    major = payload[6]
    hlen = struct.unpack_from("<H", payload, 8)[0] if major == 1 else (
        struct.unpack_from("<I", payload, 8)[0]
    )
    hstart = 10 if major == 1 else 12
    header = ast.literal_eval(payload[hstart:hstart + hlen].decode("latin1"))
    shape = tuple(header["shape"])
    descr = header["descr"]
    n_elems = 1
    for s in shape:
        n_elems *= s
    itemsize = _DTYPE_SIZES.get(descr)
    if itemsize is None:
        raise ValueError(f"unsupported dtype {descr}")
    data_offset = hstart + hlen
    if data_offset + n_elems * itemsize != len(payload):
        raise ValueError("data section does not match header shape")
    first_val = None
    if descr == "<f4" and n_elems:
        first_val = float(struct.unpack_from("<f", payload, data_offset)[0])
    return {
        "dtype": descr,
        "ndim": len(shape),
        "n_elems": n_elems,
        "n_bytes": len(payload),
        "data_offset": data_offset,
        "first_val": first_val,
    }


# ----------------------------------------------------- Spark operators

WAV_META_SCHEMA = (
    "doc_id bigint, n_bytes int, sample_rate int, n_channels int, "
    "n_samples int, duration_ms int"
)


def attach_wav_payload(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
    out: str = "payload",
) -> DataFrame:
    """Materialize a REAL audio container column: each row's utf-8 text
    bytes become the PCM body of a spec-valid WAV file whose parameters
    derive deterministically from the id (sample rate by ``id % 3``,
    channels by ``id % 2``, an extra INFO chunk every 5th row). The
    fixtures carry no media, so this is the payload source — but the
    bytes are genuine containers, not tagged fakes."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_wav(
                    t.encode("utf-8"),
                    sample_rate=_WAV_RATES[i % 3],
                    n_channels=1 + i % 2,
                    with_info_chunk=(i % 5 == 0),
                )
                for i, t in zip(pdf[id_col], pdf[text_col])
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out: payloads})

    from ..session import ensure_min_parallelism

    # The fixtures are one small parquet file → ONE input split, which
    # would serialize the whole Python synth→decode→fingerprint chain
    # on a single core (guide §2.5 input skew); repartition the slim
    # (id, text) rows so every downstream Arrow stage runs wide.
    return ensure_min_parallelism(df.select(id_col, text_col)).mapInPandas(
        _synth, f"{id_col} bigint, {out} binary"
    )


def decode_wav_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Binary → typed metadata via Arrow ``mapInPandas``, parsing the
    RIFF container for real (chunk walk, no fixed-offset shortcuts)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_wav(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(
                        [m["n_bytes"] for m in metas], dtype="int32"),
                    "sample_rate": pd.Series(
                        [m["sample_rate"] for m in metas], dtype="int32"),
                    "n_channels": pd.Series(
                        [m["n_channels"] for m in metas], dtype="int32"),
                    "n_samples": pd.Series(
                        [m["n_samples"] for m in metas], dtype="int32"),
                    "duration_ms": pd.Series(
                        [m["duration_ms"] for m in metas], dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, WAV_META_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int"
FRAME_SAMPLES = 160  # samples per analysis frame (20 ms @ 8 kHz)


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    stride: int = 2,
) -> DataFrame:
    """Row-expanding ``mapInPandas``: every ``stride``-th analysis
    frame of each REAL container, with byte-accurate offsets.

    The frame table comes from an actual parse — ``frame_offset`` is
    ``data_offset + idx · FRAME_SAMPLES · block_align``, and
    ``data_offset`` varies per row (the INFO-chunk rows prove the
    reader walks chunks). Output rows ≈ input rows × frames/stride, so
    size ``arrow.maxRecordsPerBatch`` for the output multiplicity.
    A video cut would replace ``parse_wav`` with an ffmpeg keyframe
    index read — batch shape, schema, expansion semantics identical."""

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_offset": []}
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                m = parse_wav(bytes(b))
                block_align = m["n_channels"] * m["bits"] // 8
                n_frames = max(1, m["n_samples"] // FRAME_SAMPLES)
                for i in range(0, n_frames, stride):
                    out["doc_id"].append(did)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(
                        m["data_offset"] + i * FRAME_SAMPLES * block_align
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_offset": pd.Series(out["frame_offset"], dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, FRAMES_SCHEMA)


def resample_plan(
    df: DataFrame, target_rate: int = 16000
) -> DataFrame:
    """Resample planning over decoded audio metadata — pure Catalyst
    (the arithmetic needs no codec): clamp the rate to ``target_rate``
    and scale the sample count with integer math. The actual resample
    kernel would slot into the same mapInPandas stage as
    :func:`decode_wav_meta`."""
    out_rate = F.least(F.col("sample_rate"), F.lit(target_rate))
    return df.select(
        "doc_id",
        "sample_rate",
        "n_samples",
        out_rate.alias("out_rate"),
        F.expr(
            f"CAST((CAST(n_samples AS BIGINT) * least(sample_rate, {target_rate})) "
            "div sample_rate AS INT)"
        ).alias("out_samples"),
    )


NPY_META_SCHEMA = (
    "vec_id bigint, dtype string, ndim int, n_elems int, n_bytes int, "
    "first_val double"
)


def attach_npy_payload(
    df: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    out: str = "payload",
) -> DataFrame:
    """Materialize each embedding as a REAL ``.npy`` v1.0 payload — the
    actual float32 vector bytes behind a spec-valid header."""

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [
                build_npy(
                    struct.pack(f"<{len(v)}f", *v), "<f4", (len(v),)
                )
                for v in pdf[vec_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], out: payloads})

    from ..session import ensure_min_parallelism

    # One input split would serialize the Python chain — see
    # attach_wav_payload.
    return ensure_min_parallelism(df.select(id_col, vec_col)).mapInPandas(
        _synth, f"{id_col} bigint, {out} binary"
    )


def decode_npy_meta(
    df: DataFrame, id_col: str = "vec_id", payload_col: str = "payload"
) -> DataFrame:
    """NPY payload → typed metadata via Arrow ``mapInPandas``: magic,
    header-dict, shape, and the first float32 value unpacked straight
    from the data section (proof the parser found the right offset)."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_npy(bytes(b)) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "vec_id": pdf[id_col].astype("int64"),
                    "dtype": [m["dtype"] for m in metas],
                    "ndim": pd.Series(
                        [m["ndim"] for m in metas], dtype="int32"),
                    "n_elems": pd.Series(
                        [m["n_elems"] for m in metas], dtype="int32"),
                    "n_bytes": pd.Series(
                        [m["n_bytes"] for m in metas], dtype="int32"),
                    "first_val": pd.Series(
                        [m["first_val"] for m in metas], dtype="float64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, NPY_META_SCHEMA)


# ------------------------------------------------------------------ BMP

def build_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """Serialize a spec-valid 24-bit uncompressed BMP (BITMAPFILEHEADER
    + BITMAPINFOHEADER): pixel rows written BOTTOM-UP, each padded to a
    4-byte boundary — the two traps any real BMP consumer must handle.
    ``pixels`` is top-down row-major BGR, len == width*height*3."""
    if len(pixels) != width * height * 3:
        raise ValueError("pixel buffer does not match dimensions")
    stride = ((width * 3 + 3) // 4) * 4
    pad = b"\x00" * (stride - width * 3)
    rows = [
        pixels[y * width * 3:(y + 1) * width * 3] + pad
        for y in range(height - 1, -1, -1)
    ]
    body = b"".join(rows)
    info = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    header = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(body), 0, 0, 14 + 40)
    return header + info + body


def parse_bmp(payload: bytes) -> dict:
    """Parse a BMP from bytes alone: validate magic, read the info
    header, undo the bottom-up row order and stride padding, and
    return metadata + the top-down BGR pixel buffer."""
    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP container")
    px_offset = struct.unpack("<I", payload[10:14])[0]
    hdr_size, width, height, _planes, bpp = struct.unpack(
        "<IiiHH", payload[14:30]
    )
    if bpp != 24 or hdr_size < 40:
        raise ValueError(f"unsupported BMP (bpp={bpp})")
    if width <= 0 or height <= 0:
        raise ValueError(f"invalid BMP dimensions {width}x{height}")
    stride = ((width * 3 + 3) // 4) * 4
    if len(payload) < px_offset + stride * height:
        # Fail HERE with a per-row diagnosis, not later as an opaque
        # reshape error inside an executor when the short pixel buffer
        # meets np.frombuffer.
        raise ValueError("truncated BMP: payload shorter than declared rows")
    rows = []
    for y in range(height):
        start = px_offset + (height - 1 - y) * stride
        rows.append(payload[start:start + width * 3])
    return {
        "width": width,
        "height": height,
        "bpp": bpp,
        "row_stride": stride,
        "n_bytes": len(payload),
        "pixels": b"".join(rows),
    }


BMP_META_SCHEMA = (
    "doc_id long, width int, height int, bpp int, row_stride int, n_bytes int"
)


def _bmp_dims(doc_id: int) -> tuple[int, int]:
    return 8 + (doc_id % 5) * 4, 6 + (doc_id % 3) * 6


def _bmp_pixels(doc_id: int, w: int, h: int):
    import numpy as np

    idx = np.arange(w * h * 3, dtype=np.int64)
    return ((doc_id * 31 + idx * 7) % 256).astype(np.uint8)


def attach_bmp_payload(
    df: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """(id, payload binary): id-derived dimensions and formula pixels
    ((doc_id·31 + i·7) mod 256 — arithmetic any engine replays),
    serialized through build_bmp so payloads are genuine bottom-up,
    stride-padded containers, not tagged fakes."""
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                w, h = _bmp_dims(int(did))
                px = _bmp_pixels(int(did), w, h).tobytes()
                rows.append((int(did), build_bmp(px, w, h)))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    from ..session import ensure_min_parallelism

    # One input split would serialize the Python chain — see
    # attach_wav_payload.
    return ensure_min_parallelism(df.select(id_col)).mapInPandas(
        _synth, schema
    )


def decode_bmp_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Recover image metadata from BYTES ALONE via parse_bmp."""
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_bmp(bytes(payload))
                out.append(
                    (int(did), m["width"], m["height"], m["bpp"],
                     m["row_stride"], m["n_bytes"])
                )
            yield pd.DataFrame(
                out,
                columns=[
                    id_col, "width", "height", "bpp", "row_stride", "n_bytes"
                ],
            )

    return df.select(id_col, payload_col).mapInPandas(_decode, BMP_META_SCHEMA)


def resize_bmp_nearest(
    df: DataFrame,
    out_w: int = 8,
    out_h: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """REAL image resize: parse the BMP, reshape the decoded buffer to
    (h, w, 3) in numpy, nearest-neighbor index-sample to (out_h,
    out_w, 3) (src = (dst·src_dim) // dst_dim — pure integer, engine-
    replayable), and emit the resized pixels' digest. Any stride /
    bottom-up / channel bug in the codec breaks the digest, so the
    oracle hash proves decode → ndarray → resample end to end.
    px_md5 = md5 of the comma-joined int sequence (byte-order-safe
    across engines, unlike hashing raw blobs)."""
    import hashlib

    import numpy as np

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_bmp(bytes(payload))
                arr = np.frombuffer(m["pixels"], dtype=np.uint8).reshape(
                    m["height"], m["width"], 3
                )
                ys = (np.arange(out_h) * m["height"]) // out_h
                xs = (np.arange(out_w) * m["width"]) // out_w
                res = arr[ys][:, xs]
                digest = hashlib.md5(
                    ",".join(map(str, res.flatten().tolist())).encode()
                ).hexdigest()
                out.append((int(did), out_w, out_h, digest))
            yield pd.DataFrame(
                out, columns=[id_col, "out_w", "out_h", "px_md5"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _resize, f"{id_col} long, out_w int, out_h int, px_md5 string"
    )


def image_dhash(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    hash_w: int = 8,
    hash_h: int = 7,
) -> DataFrame:
    """Perceptual difference-hash (dHash) from IMAGE BYTES — the
    standard near-duplicate fingerprint for image corpora (the
    LAION-style multimodal dedup move): parse the BMP, integer
    grayscale via the fixed-point BT.601 luma (77R + 150G + 29B) >> 8
    (no floats, engine-replayable), nearest-neighbor resample to
    (hash_h, hash_w + 1), then one bit per horizontal neighbor
    comparison — visually similar images (re-encodes, small edits,
    brightness shifts that preserve gradients) land within a few bits.

    hash_w × hash_h defaults to 8 × 7 = 56 bits — inside a
    non-negative int64 (SimHash's width here, so the banding algebra
    below is shared) — packed little-endian (bit k = row k//8,
    col k%8).

    Runs as one Arrow mapInPandas batch over (id, payload); all pixel
    math is numpy on the decoded buffer. Output: (id, width, height,
    dhash long).
    """
    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_bmp(bytes(payload))
                h = _dhash_bits(
                    m["pixels"], m["width"], m["height"], hash_w, hash_h
                )
                out.append((int(did), m["width"], m["height"], h))
            yield pd.DataFrame(
                out, columns=[id_col, "width", "height", "dhash"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _hash, f"{id_col} long, width int, height int, dhash long"
    )


def image_dhash_wide(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """120-bit dHash (8 rows × 15 comparisons) split across TWO longs
    — the WIDER CODE every narrow-code scale_note in this module
    points at: for any lossless Hamming-radius-r bucketing, candidate
    volume is ~n²/2^chunk_bits, so the only way to keep bucket count
    growing with the corpus is more code bits, not more probes. 120
    bits give :func:`hamming_neardup_pairs_mih_wide` 8 × 15-bit
    chunks (32768 buckets per chunk, 2× the 14-bit chunks of the
    56-bit code) AND ball radius ≤ 1 all the way to Hamming radius
    15 — where the 56-bit code needs ball-2 enumeration past radius 7.

    Same decode + luma + resample arithmetic as :func:`image_dhash`
    (one Arrow mapInPandas pass, ``_dhash_bits`` with a (8, 16)
    grid); bit k = row k//15, col k%15, packed little-endian with
    bits 0-59 in ``dh_lo`` and 60-119 in ``dh_hi`` (both longs stay
    non-negative). Output: (id, width, height, dh_hi, dh_lo)."""
    lo_mask = (1 << 60) - 1

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                m = parse_bmp(bytes(payload))
                h = _dhash_bits(
                    m["pixels"], m["width"], m["height"], 15, 8
                )
                out.append(
                    (
                        int(did),
                        m["width"],
                        m["height"],
                        h >> 60,
                        h & lo_mask,
                    )
                )
            yield pd.DataFrame(
                out, columns=[id_col, "width", "height", "dh_hi", "dh_lo"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _hash,
        f"{id_col} long, width int, height int, dh_hi long, dh_lo long",
    )


def hamming_neardup_pairs_mih_wide(
    sigs: DataFrame,
    id_col: str = "doc_id",
    hi_col: str = "dh_hi",
    lo_col: str = "dh_lo",
    max_hamming: int = 8,
    chunks: int = 8,
    bits: int = 120,
) -> DataFrame:
    """Multi-index hashing over the TWO-LONG 120-bit code — the scale
    path the 56-bit rows' scale_notes name: 8 × 15-bit chunks =
    32768 buckets per chunk, and floor(max_hamming/8) ≤ 1 for every
    radius up to 15, so the probe ball stays single-bit (16
    keys/chunk, 128 probe rows/item) at radii where the 56-bit code
    already needs multi-bit enumeration. Same Norouzi-Punjani-Fleet
    pigeonhole, same literal-mask probe encoding as
    :func:`hamming_neardup_pairs_mih` (one explode + one expression,
    codegen-safe at any radius), verify = bit_count(hi⊕hi) +
    bit_count(lo⊕lo) in pure codegen.

    Chunk layout: 15 divides 60, so chunks 0-3 read ``lo_col`` and
    4-7 read ``hi_col`` — no chunk straddles the longs. Output:
    (doc_a, doc_b, hamming), doc_a < doc_b, identical contract to the
    56-bit joins so the exact all-pairs oracle shape carries over."""
    if bits != 120 or chunks != 8:
        raise ValueError(
            "two-long MIH is laid out for bits=120, chunks=8 "
            f"(got bits={bits}, chunks={chunks})"
        )
    from ..session import track_persist

    w = bits // chunks
    # Two join-side consumers of the decode→fingerprint pipeline —
    # persist the slim rows (see hamming_neardup_pairs_mih).
    s = track_persist(
        sigs.select(
            F.col(id_col).alias("doc"),
            F.col(hi_col).alias("hi"),
            F.col(lo_col).alias("lo"),
        )
    )
    cand = _mih_candidate_join(
        s,
        chunks=chunks,
        w=w,
        ball_r=max_hamming // chunks,
        # chunks 0-3 live in lo (bits 0-59), 4-7 in hi — 15 | 60, so
        # no chunk straddles the longs.
        chunk_val=lambda ce: (
            f"(CASE WHEN ({ce}) < 4 THEN (lo >> (({ce}) * {w})) "
            f"ELSE (hi >> ((({ce}) - 4) * {w})) END)"
        ),
        carry=["hi", "lo"],
    )
    return (
        cand.select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.hi").alias("hi_a"),
            F.col("a.lo").alias("lo_a"),
            F.col("b.hi").alias("hi_b"),
            F.col("b.lo").alias("lo_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn(
            "hamming",
            F.expr(
                "CAST(bit_count(hi_a ^ hi_b) + bit_count(lo_a ^ lo_b)"
                " AS INT)"
            ),
        )
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


def _dhash_bits(
    pixels: bytes, width: int, height: int, hash_w: int, hash_h: int
) -> int:
    """THE dHash arithmetic — fixed-point BT.601 luma, nearest-neighbor
    (hash_h, hash_w+1) resample, one bit per horizontal neighbor
    comparison — shared by the image and video fingerprints so the
    hashes stay comparable across modalities and a change here cannot
    silently diverge one copy."""
    import numpy as np

    arr = (
        np.frombuffer(pixels, dtype=np.uint8)
        .reshape(height, width, 3)
        .astype(np.int64)
    )
    luma = (77 * arr[:, :, 0] + 150 * arr[:, :, 1] + 29 * arr[:, :, 2]) // 256
    ys = (np.arange(hash_h) * height) // hash_h
    xs = (np.arange(hash_w + 1) * width) // (hash_w + 1)
    g = luma[ys][:, xs]
    bits = (g[:, 1:] > g[:, :-1]).astype(np.int64).flatten()
    return int(sum(int(b) << k for k, b in enumerate(bits)))


def image_neardup_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
    bands: int = 7,
    band_bits: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs from dHash signatures via the
    SimHash banding algebra: 56 bits → 7 bands × 8 bits; a pair
    within hamming ≤ 6 differs in at most 6 bands, so by pigeonhole
    it COLLIDES in at least one band — the banding is LOSSLESS for
    the verified radius (the oracle checks recall against exact
    all-pairs, not just replay). Candidates are verified with
    bit_count(a XOR b) ≤ max_hamming in pure codegen.

    Scale: the band explode is bands rows per image; the self-join is
    bucketed by (band_id, 8-bit key) — never n². Output: (doc_a,
    doc_b, hamming), doc_a < doc_b.
    """
    if max_hamming >= bands:
        # Not an assert: under ``python -O`` an assert is stripped and
        # a bad radius/band combo would silently LOSE pairs.
        raise ValueError(
            f"max_hamming={max_hamming} must be < bands={bands}: the "
            "pigeonhole banding guarantee loses pairs beyond bands-1 bits"
        )
    from ..session import track_persist

    # The band self-join consumes this twice; persist the slim rows so
    # the upstream fingerprint pipeline runs once per pass (see
    # hamming_neardup_pairs_mih).
    s = track_persist(
        sigs.select(F.col(id_col).alias("doc"), F.col(hash_col).alias("h"))
    )
    bl = s.select(
        "doc",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band_id"),
                        F.expr(
                            f"CAST((h >> {b * band_bits}) "
                            f"& {(1 << band_bits) - 1} AS INT)"
                        ).alias("key"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("doc", "h", F.col("bk.band_id"), F.col("bk.key"))
    a, b_ = bl.alias("a"), bl.alias("b")
    cand = a.join(
        b_,
        (F.col("a.band_id") == F.col("b.band_id"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc") < F.col("b.doc")),
    )
    return _hamming_verify_tail(cand, max_hamming)


def _hamming_verify_tail(cand: DataFrame, max_hamming: int) -> DataFrame:
    """THE candidate dedup + hamming verify tail (codegen
    bit_count(a XOR b) ≤ radius), shared by the banding and the
    multi-index-hashing joins so the two variants' verify cannot
    drift — the shared-oracle equivalence rests on it. ``cand`` is an
    aliased a/b join carrying doc + h on both sides."""
    return (
        cand.select(
            F.col("a.doc").alias("doc_a"),
            F.col("b.doc").alias("doc_b"),
            F.col("a.h").alias("ha"),
            F.col("b.h").alias("hb"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .withColumn("hamming", F.expr("CAST(bit_count(ha ^ hb) AS INT)"))
        .where(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )


# The 56-bit hamming-band join is hash-agnostic — the audio
# fingerprint below reuses it unchanged.
hamming_neardup_pairs = image_neardup_pairs


def hamming_neardup_pairs_mih(
    sigs: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "dhash",
    max_hamming: int = 6,
    chunks: int = 4,
    bits: int = 56,
) -> DataFrame:
    """Near-duplicate pairs by MULTI-INDEX HASHING (Norouzi, Punjani &
    Fleet, "Fast Search in Hamming Space with Multi-Index Hashing",
    CVPR'12) — the scale path past the fixed banding join's occupancy
    wall: :func:`image_neardup_pairs`' 7×8-bit bands give only 256
    buckets per band, so bucket occupancy grows ~n/256 and the band
    self-join degrades toward n²/256 (the same wall BASELINE.md
    documents for fixed-band SimHash). MIH splits the code into FEWER,
    WIDER chunks — 4×14 bits = 16384 buckets per chunk, 64× more
    selective — and recovers the lost radius by PROBING: by pigeonhole,
    a pair within hamming ≤ r has some chunk with ≤ floor(r/m) errors,
    so the probe side enumerates every key within that Hamming ball of
    each of its chunk values (r=6, m=4 ⇒ ball radius 1 ⇒ 15 keys per
    chunk) while the index side stores exact chunk keys. Lossless for
    ANY chunk count m (m·(floor(r/m)+1) > r always), verified like the
    banding join with one codegen ``bit_count(a XOR b)``.

    Cost shape: probe explode is m·Σ_{{j≤r'}} C(w,j) rows per item
    (60 at ball radius r'=1, 424 at r'=2 with w=14) vs the banding
    join's 7 — a constant-factor row tax paid to push the occupancy
    wall out 64×; the join stays bucketed by (chunk, key), never n².
    The Hamming ball is enumerated generically (all XOR masks of
    weight ≤ floor(max_hamming/chunks) per chunk — static expressions,
    so Catalyst sees one explode of literal-mask keys); a probe fan-out
    past 2048 keys/item raises rather than silently building an
    unboundedly wide plan — at that point use more chunks or a wider
    fingerprint.

    Output: (doc_a, doc_b, hamming), doc_a < doc_b — identical to
    :func:`image_neardup_pairs`, so the two share one exact all-pairs
    oracle and every sweep proves the equivalence.
    """
    if bits % chunks != 0:
        raise ValueError(f"bits={bits} must divide into chunks={chunks}")
    w = bits // chunks
    from ..session import track_persist

    # The candidate join consumes this relation TWICE (probe side +
    # index side), and upstream is typically the whole Arrow decode →
    # fingerprint pipeline — persist the slim (doc, h) rows so the
    # Python stages run once per pass, not once per join side
    # (guide §2.4: two consumers of one expensive subtree share one
    # materialization; measured ~2× on every video/image MIH row).
    s = track_persist(
        sigs.select(F.col(id_col).alias("doc"), F.col(hash_col).alias("h"))
    )
    cand = _mih_candidate_join(
        s,
        chunks=chunks,
        w=w,
        ball_r=max_hamming // chunks,
        chunk_val=lambda ce: f"(h >> (({ce}) * {w}))",
        carry=["h"],
    )
    return _hamming_verify_tail(cand, max_hamming)


def _mih_candidate_join(
    s: DataFrame,
    chunks: int,
    w: int,
    ball_r: int,
    chunk_val,
    carry: list,
) -> DataFrame:
    """THE multi-index-hashing candidate join, shared by the
    single-long and the two-long (wide) code paths so the ball
    enumeration, the fan-out guard, and the probe/index scaffolding
    cannot drift (the neardup_gate_log lesson): ``chunk_val`` maps a
    chunk-id SQL expression to the SQL extracting that chunk's bits
    from the carried payload columns; everything else is identical.

    The Hamming ball is enumerated as a LITERAL array of
    (chunk << w) | xor_mask encodings, exploded once, with the probe
    key computed by ONE shift/and/xor expression over the exploded
    element — NOT as one projection expression per ball key: at ball
    radius 2 that is 424 expressions in a single Project, which
    overflows janino's method-size limit and silently drops the whole
    stage out of codegen (observed in the round-12 plan audit). A
    constant array + one expression keeps every radius inside
    whole-stage codegen and the plan size flat.

    Returns the aliased a/b candidate join (probe side ``a``, exact
    index side ``b``) with ``doc`` + the carry columns on both sides;
    callers attach their verify tail."""
    from itertools import combinations
    from math import comb

    keys_per_item = chunks * sum(comb(w, j) for j in range(ball_r + 1))
    if keys_per_item > 2048:
        raise ValueError(
            f"MIH probe fan-out {keys_per_item} keys/item (ball radius "
            f"{ball_r} over {chunks}×{w}-bit chunks) exceeds 2048: use "
            "more chunks or a wider fingerprint"
        )
    mask = (1 << w) - 1
    index = s.select(
        "doc", *carry, F.explode(F.lit(list(range(chunks)))).alias("__c")
    ).select(
        "doc",
        *carry,
        F.col("__c").cast("int").alias("chunk_id"),
        F.expr(f"CAST({chunk_val('CAST(__c AS INT)')} & {mask} AS INT)").alias(
            "key"
        ),
    )
    enc = [
        (c << w) | sum(1 << b for b in flipped)
        for c in range(chunks)
        for j in range(ball_r + 1)
        for flipped in combinations(range(w), j)
    ]
    ce = f"CAST(__e div {1 << w} AS INT)"
    probe = s.select(
        "doc", *carry, F.explode(F.lit(enc)).alias("__e")
    ).select(
        "doc",
        *carry,
        F.expr(ce).alias("chunk_id"),
        F.expr(
            f"CAST({chunk_val(ce)} & {mask} AS INT)"
            f" ^ CAST(__e % {1 << w} AS INT)"
        ).alias("key"),
    )
    a, b_ = probe.alias("a"), index.alias("b")
    return a.join(
        b_,
        (F.col("a.chunk_id") == F.col("b.chunk_id"))
        & (F.col("a.key") == F.col("b.key"))
        & (F.col("a.doc") < F.col("b.doc")),
    )


def audio_fingerprint(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    bits: int = 56,
) -> DataFrame:
    """Perceptual-hash analog for AUDIO bytes — the dHash trick on the
    PCM body: parse the RIFF container (chunk walk), take the data
    chunk's bytes, nearest-neighbor resample to ``bits``+1 positions,
    and emit one bit per neighbor comparison (waveform 'rising here?'
    shape bits). Re-encodes and small edits preserve most of the
    coarse shape, so near-duplicate audio lands within a few bits —
    the same banding join as the image path finds the pairs.

    56 bits in a non-negative long (shared banding algebra with
    dHash / SimHash). One Arrow mapInPandas stage; numpy byte math.

    Output: (id, sample_rate, n_samples, afp long).
    """
    import numpy as np

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, payload in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(payload)
                m = parse_wav(b)
                block_align = m["n_channels"] * m["bits"] // 8
                L = m["n_samples"] * block_align
                if L == 0:
                    # Empty data chunk (e.g. empty source text): no
                    # neighbor comparisons exist — emit afp=0 exactly
                    # like the oracle's zero-padding CASE instead of
                    # letting body[xs] raise in the Arrow worker.
                    out.append((int(did), m["sample_rate"], 0, 0))
                    continue
                body = np.frombuffer(
                    b, dtype=np.uint8, count=L, offset=m["data_offset"]
                ).astype(np.int64)
                xs = (np.arange(bits + 1) * L) // (bits + 1)
                g = body[xs]
                bvec = (g[1:] > g[:-1]).astype(np.int64)
                h = int(sum(int(v) << k for k, v in enumerate(bvec)))
                out.append(
                    (int(did), m["sample_rate"], m["n_samples"], h)
                )
            yield pd.DataFrame(
                out, columns=[id_col, "sample_rate", "n_samples", "afp"]
            )

    return df.select(id_col, payload_col).mapInPandas(
        _fp, f"{id_col} long, sample_rate int, n_samples int, afp long"
    )


# ------------------------------------------------------------------ AVI

def _dib_body(pixels: bytes, width: int, height: int) -> bytes:
    """Bottom-up, 4-byte-stride-padded DIB bits from a top-down
    row-major BGR buffer — the frame payload layout BI_RGB AVIs share
    with BMP (the BMP body without the file/info headers)."""
    stride = ((width * 3 + 3) // 4) * 4
    pad = b"\x00" * (stride - width * 3)
    return b"".join(
        pixels[y * width * 3:(y + 1) * width * 3] + pad
        for y in range(height - 1, -1, -1)
    )


def build_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    with_junk_chunk: bool = False,
) -> bytes:
    """Serialize a spec-valid uncompressed (BI_RGB 'DIB ') RIFF AVI:
    LIST hdrl { avih, LIST strl { strh, strf } } + LIST movi holding
    one '00db' chunk per frame (bottom-up stride-padded DIB bits —
    the same two traps as BMP). ``frames`` are top-down row-major BGR
    buffers, each len == width*height*3. ``with_junk_chunk`` inserts
    a JUNK chunk before movi so the movi offset varies across rows —
    forcing any reader to walk chunks rather than assume a fixed
    layout (the WAV INFO-chunk trick)."""
    stride = ((width * 3 + 3) // 4) * 4
    for fr in frames:
        if len(fr) != width * height * 3:
            raise ValueError("frame buffer does not match dimensions")
    n = len(frames)
    frame_bytes = stride * height
    avih = struct.pack(
        "<4sI14I",
        b"avih", 56,
        1_000_000 // fps,              # dwMicroSecPerFrame
        frame_bytes * fps,             # dwMaxBytesPerSec
        0, 0,                          # padding granularity, flags
        n, 0, 1,                       # totalFrames, initialFrames, streams
        frame_bytes,                   # suggestedBufferSize
        width, height,
        0, 0, 0, 0,                    # reserved
    )
    strh = struct.pack(
        "<4sI4s4sIHHIIIIIIIi4h",
        b"strh", 56,
        b"vids", b"DIB ",
        0, 0, 0, 0,                    # flags, priority, language, initFrames
        1, fps,                        # scale, rate (fps = rate/scale)
        0, n,                          # start, length (frames)
        frame_bytes, 0xFFFFFFFF & -1,  # suggestedBufferSize, quality (-1)
        0,                             # sampleSize (0: varies)
        0, 0, width, height,           # rcFrame
    )
    strf = struct.pack(
        "<4sIIiiHHIIiiII",
        b"strf", 40,
        40, width, height, 1, 24, 0,   # BITMAPINFOHEADER, BI_RGB
        frame_bytes, 2835, 2835, 0, 0,
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl_content = b"hdrl" + avih + strl
    hdrl = b"LIST" + struct.pack("<I", len(hdrl_content)) + hdrl_content
    junk = b""
    if with_junk_chunk:
        junk = struct.pack("<4sI", b"JUNK", 10) + b"sparkgen\x00\x00"
    movi_content = b"movi" + b"".join(
        struct.pack("<4sI", b"00db", frame_bytes)
        + _dib_body(fr, width, height)
        for fr in frames
    )
    movi = b"LIST" + struct.pack("<I", len(movi_content)) + movi_content
    body = b"AVI " + hdrl + junk + movi
    return struct.pack("<4sI", b"RIFF", len(body)) + body


def parse_avi(payload: bytes) -> dict:
    """Parse a RIFF AVI from bytes alone: validate magic, walk the
    top-level chunk list, recurse into LIST hdrl for the main header
    (dimensions, frame count, frame duration) and the stream format
    (bpp), then walk LIST movi collecting byte-accurate frame chunk
    offsets. Raises ``ValueError`` on malformed input."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI container")
    riff_size = struct.unpack_from("<I", payload, 4)[0]
    if riff_size + 8 != len(payload):
        raise ValueError("RIFF size does not match payload length")
    meta: dict = {"n_bytes": len(payload)}
    frame_offsets: list[int] = []
    frame_sizes: list[int] = []

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid, csize = struct.unpack_from("<4sI", payload, pos)
            if cid == b"LIST":
                ltype = payload[pos + 8:pos + 12]
                if ltype in (b"hdrl", b"strl", b"movi"):
                    walk(pos + 12, pos + 8 + csize)
            elif cid == b"avih":
                (usec, _mbps, _pad, _flags, total, _init, _streams,
                 _sbuf, w, h) = struct.unpack_from("<10I", payload, pos + 8)
                meta.update(
                    width=w, height=h, n_frames=total,
                    usec_per_frame=usec,
                )
            elif cid == b"strf":
                (_hs, _w, _h, _planes, bpp) = struct.unpack_from(
                    "<IiiHH", payload, pos + 8
                )
                meta["bpp"] = bpp
            elif cid == b"00db":
                frame_offsets.append(pos + 8)
                frame_sizes.append(csize)
            pos += 8 + csize + (csize % 2)  # chunks are word-aligned

    walk(12, len(payload))
    if "width" not in meta or "bpp" not in meta:
        raise ValueError("missing avih or strf header")
    if meta["bpp"] != 24:
        raise ValueError(f"unsupported AVI frame bpp {meta['bpp']}")
    if len(frame_offsets) != meta["n_frames"]:
        raise ValueError("frame chunk count does not match avih total")
    meta["frame_offsets"] = frame_offsets
    meta["frame_sizes"] = frame_sizes
    return meta


def decode_avi_frame(payload: bytes, meta: dict, idx: int) -> bytes:
    """Top-down BGR pixel buffer of frame ``idx`` from the parsed
    container (undo the DIB bottom-up row order + stride padding)."""
    w, h = meta["width"], meta["height"]
    stride = ((w * 3 + 3) // 4) * 4
    off = meta["frame_offsets"][idx]
    return b"".join(
        payload[off + (h - 1 - y) * stride: off + (h - 1 - y) * stride + w * 3]
        for y in range(h)
    )


def _avi_n_frames(doc_id: int) -> int:
    return 2 + doc_id % 4


def _avi_frame_pixels(doc_id: int, f: int, w: int, h: int):
    """Formula pixels of frame ``f``: the BMP formula plus a per-frame
    shift term — (doc_id·31 + f·13 + i·7) mod 256 — so the oracle
    replays every frame arithmetically."""
    import numpy as np

    idx = np.arange(w * h * 3, dtype=np.int64)
    return ((doc_id * 31 + f * 13 + idx * 7) % 256).astype(np.uint8)


def attach_avi_payload(
    df: DataFrame, id_col: str = "doc_id", fps: int = 10
) -> DataFrame:
    """(id, payload binary): id-derived dimensions (shared with the
    BMP tier), 2 + id%4 frames of formula pixels, serialized through
    build_avi so payloads are genuine chunk-walked containers; odd
    ids carry a JUNK chunk before movi (varying offsets prove the
    reader walks chunks)."""
    from pyspark.sql.types import (
        BinaryType, LongType, StructField, StructType,
    )

    schema = StructType(
        [
            StructField(id_col, LongType(), False),
            StructField("payload", BinaryType(), False),
        ]
    )

    def _synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did in pdf[id_col]:
                did = int(did)
                w, h = _bmp_dims(did)
                frames = [
                    _avi_frame_pixels(did, f, w, h).tobytes()
                    for f in range(_avi_n_frames(did))
                ]
                rows.append(
                    (did, build_avi(frames, w, h, fps=fps,
                                    with_junk_chunk=bool(did % 2)))
                )
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    from ..session import ensure_min_parallelism

    # One input split would serialize the Python chain — see
    # attach_wav_payload.
    return ensure_min_parallelism(df.select(id_col)).mapInPandas(
        _synth, schema
    )


def decode_avi_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """Recover video metadata from BYTES ALONE via parse_avi."""
    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                m = parse_avi(bytes(b))
                # A zero-frame container is valid (avih total 0, no
                # '00db' chunks) — emit a -1 offset sentinel instead
                # of letting frame_offsets[0] raise in the Arrow
                # worker (the audio empty-payload lesson).
                first = m["frame_offsets"][0] if m["frame_offsets"] else -1
                out.append(
                    (int(did), m["width"], m["height"], m["n_frames"],
                     m["usec_per_frame"], first, m["n_bytes"])
                )
            yield pd.DataFrame(
                out,
                columns=[id_col, "width", "height", "n_frames",
                         "usec_per_frame", "first_frame_offset",
                         "n_bytes"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _decode,
        f"{id_col} long, width int, height int, n_frames int, "
        "usec_per_frame int, first_frame_offset int, n_bytes int",
    )


def video_frame_fingerprints(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    stride: int = 2,
    hash_w: int = 8,
    hash_h: int = 7,
) -> DataFrame:
    """Frame-sampled perceptual fingerprints over REAL AVI containers
    — the video member of the multimodal dedup tier: parse the RIFF
    chunk list, decode every ``stride``-th frame (bottom-up un-flip +
    stride strip), and dHash each decoded frame with the image tier's
    exact arithmetic (fixed-point BT.601 luma, nearest-neighbor
    (hash_h, hash_w+1) resample, one bit per horizontal neighbor
    comparison). Row-expanding like sample_frames: output rows ≈
    videos × frames/stride. Output: (id, frame_idx, width, height,
    dhash long) — the relation the hamming band/MIH joins consume for
    video near-dup."""
    import numpy as np

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for did, b in zip(pdf[id_col], pdf[payload_col]):
                b = bytes(b)
                m = parse_avi(b)
                w, h = m["width"], m["height"]
                for fi in range(0, m["n_frames"], stride):
                    hh = _dhash_bits(
                        decode_avi_frame(b, m, fi), w, h, hash_w, hash_h
                    )
                    out.append((int(did), fi, w, h, hh))
            yield pd.DataFrame(
                out,
                columns=[id_col, "frame_idx", "width", "height", "dhash"],
            )

    return df.select(id_col, payload_col).mapInPandas(
        _fp,
        f"{id_col} long, frame_idx int, width int, height int, dhash long",
    )


def video_neardup_pairs(
    fps_df: DataFrame,
    id_col: str = "doc_id",
    min_matched_frames: int = 2,
    max_hamming: int = 6,
) -> DataFrame:
    """Video-level near-duplicates from frame fingerprints: two videos
    are near-dups when ≥ ``min_matched_frames`` ALIGNED sampled frames
    (same frame_idx) land within ``max_hamming`` bits — re-encodes and
    small edits preserve most frames' coarse structure, while distinct
    footage matches at most incidentally. Frame matching reuses the
    scale-safe multi-index hashing join over a composite (video,
    frame) key — frame_idx is packed into the id's low 16 bits, so
    the whole frame relation goes through ONE bucketed join, never a
    per-frame loop — then pairs with mismatched frame_idx are dropped
    and survivors aggregate per video pair.

    The packing is GUARDED per row (``assert_true``): frame_idx must
    fit 16 bits and the video id 46, else two distinct (video, frame)
    keys could collide and a genuine match would be attributed to the
    WRONG videos — a silent-corruption class, so it fails loudly.

    Output: (video_a, video_b, matched_frames, min_hamming)."""
    aligned = (
        _packed_frame_pairs(fps_df, id_col, max_hamming)
        .where(F.col("idx_a") == F.col("idx_b"))
        .select("video_a", "video_b", "hamming")
    )
    return (
        aligned.groupBy("video_a", "video_b")
        .agg(
            F.count(F.lit(1)).cast("int").alias("matched_frames"),
            F.min("hamming").cast("int").alias("min_hamming"),
        )
        .where(F.col("matched_frames") >= min_matched_frames)
    )


def _packed_frame_pairs(
    fps_df: DataFrame, id_col: str, max_hamming: int
) -> DataFrame:
    """The shared packed-key MIH frame join behind both video
    matchers: (video, frame_idx) packs into one long (guarded per row
    — see :func:`video_neardup_pairs`), the WHOLE frame relation goes
    through ONE bucketed MIH join, and the packed ids unpack back to
    (video_a, video_b, idx_a, idx_b, hamming) with video_a < video_b
    (packed order is (video, frame) lexicographic, so cross-video
    pairs always orient by video id)."""
    pack_ok = F.assert_true(
        (F.col("frame_idx") >= 0)
        & (F.col("frame_idx") < F.lit(1 << 16))
        & (F.col(id_col) >= 0)
        & (F.col(id_col) < F.lit(1 << 46)),
        F.lit(
            "video_neardup_pairs packing overflow: need 0 <= frame_idx"
            " < 2^16 and 0 <= video id < 2^46"
        ),
    )
    packed = fps_df.select(
        F.when(
            pack_ok.isNull(),
            F.col(id_col) * F.lit(1 << 16) + F.col("frame_idx"),
        ).alias("doc_id"),
        F.col("dhash"),
    )
    pairs = hamming_neardup_pairs_mih(
        packed, "doc_id", "dhash", max_hamming=max_hamming
    )
    return pairs.select(
        F.expr(f"doc_a div {1 << 16}").alias("video_a"),
        F.expr(f"doc_b div {1 << 16}").alias("video_b"),
        (F.col("doc_a") % F.lit(1 << 16)).cast("int").alias("idx_a"),
        (F.col("doc_b") % F.lit(1 << 16)).cast("int").alias("idx_b"),
        "hamming",
    )


def video_neardup_pairs_offset(
    fps_df: DataFrame,
    id_col: str = "doc_id",
    min_matched_frames: int = 2,
    max_hamming: int = 6,
) -> DataFrame:
    """OFFSET-TOLERANT video near-duplicates — the case the aligned
    matcher (:func:`video_neardup_pairs`) provably misses: a TRIMMED
    or padded clip shifts every frame index by a constant, so no frame
    pair shares an index and same-idx matching finds nothing, yet the
    content is a near-duplicate. Temporal alignment is recovered by
    VOTING: every cross-video frame match casts a vote for its index
    delta (idx_b − idx_a), and the MODAL delta — the alignment most
    frames agree on — wins; ≥ ``min_matched_frames`` supporting frames
    accepts the pair. Incidental single-frame matches at stray deltas
    are outvoted, which is exactly the robustness constant-offset
    matching needs (the standard temporal-alignment trick in video
    copy detection, e.g. Hampapur & Bolle's sequence matching).

    Same ONE packed-key bucketed MIH join as the aligned matcher (the
    frame relation never self-joins n²) plus one extra combinable
    groupBy over the slim matched-frame relation: (pair, delta) counts
    then a per-pair struct-max picks the modal delta with a
    deterministic tiebreak (most frames, then smallest |delta|, then
    smallest delta).

    Output: (video_a, video_b, idx_delta, matched_frames,
    min_hamming), video_a < video_b; idx_delta is the winning
    alignment of the higher-id video relative to the lower-id one
    (a clip trimmed by t frames reports −t)."""
    cross = _packed_frame_pairs(fps_df, id_col, max_hamming).where(
        F.col("video_a") != F.col("video_b")
    )
    per_delta = cross.groupBy(
        "video_a",
        "video_b",
        (F.col("idx_b") - F.col("idx_a")).alias("idx_delta"),
    ).agg(
        F.count(F.lit(1)).cast("int").alias("matched_frames"),
        F.min("hamming").cast("int").alias("min_hamming"),
    )
    # Struct max = lexicographic: most supporting frames, then the
    # smallest |delta| (prefer the least-shifted alignment), then the
    # smaller signed delta — fully deterministic.
    pick = F.max(
        F.struct(
            F.col("matched_frames").alias("mf"),
            (-F.abs(F.col("idx_delta"))).alias("neg_abs"),
            (-F.col("idx_delta")).alias("neg_d"),
            F.col("idx_delta").alias("idx_delta"),
            F.col("min_hamming").alias("min_hamming"),
        )
    ).alias("p")
    return (
        per_delta.groupBy("video_a", "video_b")
        .agg(pick)
        .select(
            "video_a",
            "video_b",
            F.col("p.idx_delta").alias("idx_delta"),
            F.col("p.mf").alias("matched_frames"),
            F.col("p.min_hamming").alias("min_hamming"),
        )
        .where(F.col("matched_frames") >= min_matched_frames)
    )


def video_neardup_pairs_rate(
    fps_df: DataFrame,
    id_col: str = "doc_id",
    min_matched_frames: int = 2,
    max_hamming: int = 6,
    rates: tuple[tuple[int, int], ...] = ((1, 1), (1, 2), (2, 1)),
) -> DataFrame:
    """FRAME-RATE-CHANGE-tolerant video near-duplicates — the LINEAR
    index map the constant-offset matcher provably cannot see (verdict
    r12 boundary #4): a re-encode at a different frame rate maps
    idx_b ≈ (num/den)·idx_a + shift/den, so even with perfect content
    matches the per-pair idx deltas are all DISTINCT and modal-delta
    voting finds no majority. The vote key is generalized to the full
    linear hypothesis: each cross-video frame match casts one vote per
    candidate rate (num, den) for the invariant
    ``shift = den·idx_b − num·idx_a`` (constant across a pair's
    matches exactly when the linear map holds), and the modal
    (num, den, shift) wins. Under a WRONG hypothesis a true pair's
    votes scatter (shift varies with idx_a), so wrong rates are
    outvoted by construction — the same robustness argument as the
    offset matcher, lifted from translations to the rational-slope
    affine family.

    ``rates`` bounds the hypothesis family to the re-samples that
    occur in practice (2×/half speed plus identity by default; the
    identity makes this a strict generalization of
    :func:`video_neardup_pairs_offset` — a pure trim reports
    (1, 1, delta)). Arbitrary irrational or drifting maps remain out
    of scope by design: an unbounded family would let every pair find
    SOME 2-frame-consistent line (Hough-style voting needs a bounded
    accumulator to mean anything).

    Scale shape: the SAME one packed-key bucketed MIH join, then a
    len(rates)× constant expansion of the slim matched-frame relation
    (explode of a literal array — no join, no re-shuffle of frames)
    into two combinable groupBys. Deterministic tiebreak: most
    supporting frames, simplest rate (num·den, then num — identity
    before slow-down before speed-up), smallest |shift|, smallest
    shift.

    Output: (video_a, video_b, rate_num, rate_den, idx_shift,
    matched_frames, min_hamming), video_a < video_b, with
    idx_b = (rate_num·idx_a + idx_shift) / rate_den at the matched
    frames."""
    cross = _packed_frame_pairs(fps_df, id_col, max_hamming).where(
        F.col("video_a") != F.col("video_b")
    )
    hyp = F.array(
        *[
            F.struct(
                F.lit(n).alias("rate_num"), F.lit(d).alias("rate_den")
            )
            for n, d in rates
        ]
    )
    votes = cross.select(
        "video_a",
        "video_b",
        "hamming",
        F.explode(hyp).alias("r"),
        (F.col("idx_a")).alias("idx_a"),
        (F.col("idx_b")).alias("idx_b"),
    ).select(
        "video_a",
        "video_b",
        "hamming",
        F.col("r.rate_num").alias("rate_num"),
        F.col("r.rate_den").alias("rate_den"),
        (
            F.col("r.rate_den") * F.col("idx_b")
            - F.col("r.rate_num") * F.col("idx_a")
        )
        .cast("int")
        .alias("idx_shift"),
    )
    per_key = votes.groupBy(
        "video_a", "video_b", "rate_num", "rate_den", "idx_shift"
    ).agg(
        F.count(F.lit(1)).cast("int").alias("matched_frames"),
        F.min("hamming").cast("int").alias("min_hamming"),
    )
    pick = F.max(
        F.struct(
            F.col("matched_frames").alias("mf"),
            (-(F.col("rate_num") * F.col("rate_den"))).alias("neg_prod"),
            (-F.col("rate_num")).alias("neg_num"),
            (-F.abs(F.col("idx_shift"))).alias("neg_abs"),
            (-F.col("idx_shift")).alias("neg_s"),
            F.col("rate_num").alias("rate_num"),
            F.col("rate_den").alias("rate_den"),
            F.col("idx_shift").alias("idx_shift"),
            F.col("min_hamming").alias("min_hamming"),
        )
    ).alias("p")
    return (
        per_key.groupBy("video_a", "video_b")
        .agg(pick)
        .select(
            "video_a",
            "video_b",
            F.col("p.rate_num").alias("rate_num"),
            F.col("p.rate_den").alias("rate_den"),
            F.col("p.idx_shift").alias("idx_shift"),
            F.col("p.mf").alias("matched_frames"),
            F.col("p.min_hamming").alias("min_hamming"),
        )
        .where(F.col("matched_frames") >= min_matched_frames)
    )
