"""Multimodal column plumbing (north-star extension).

Image/audio/video payloads are opaque ``binary`` columns with typed
metadata structs. The Spark-side machinery — schema, Arrow batching,
``mapInPandas`` signatures, partition sizing — is real and tested; the
actual codec step is STUBBED (this environment has no image/audio
libraries): ``decode_image_meta(real_decode=True)`` raises
NotImplementedError, and the default path derives deterministic fake
metadata from the payload bytes so the pipeline shape is verifiable
end-to-end.

At scale: binary payloads dominate row size, so
``spark.sql.files.maxPartitionBytes`` (not row counts) governs task
sizing, and ``arrow.maxRecordsPerBatch`` keeps per-batch memory bounded
inside the Python workers.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = (
    "doc_id bigint, n_bytes int, width int, height int, n_frames int"
)


def attach_binary_payload(df: DataFrame, text_col: str, out: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (here: utf-8 bytes of a text
    column — the fixtures carry no real media)."""
    return df.withColumn(out, F.encode(F.col(text_col), "utf-8"))


def decode_image_meta(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    real_decode: bool = False,
) -> DataFrame:
    """"Decode" binary payloads to typed metadata via mapInPandas.

    Arrow ships (id, payload) batches to Python; the stub derives
    deterministic pseudo-dimensions from the byte length. Swap
    ``_decode_batch`` for a real PIL/ffmpeg call where available —
    signature and batch shape stay identical.
    """

    def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real image decode requires PIL/ffmpeg (not in this container)"
                )
            n = pdf[payload_col].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n.astype("int32"),
                    "width": (1 + n % 640).astype("int32"),
                    "height": (1 + n % 480).astype("int32"),
                    "n_frames": (1 + n % 16).astype("int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_decode_batch, DECODED_SCHEMA)


FRAMES_SCHEMA = "doc_id bigint, frame_idx int, frame_offset int"


def sample_frames(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
    stride: int = 2,
    real_decode: bool = False,
) -> DataFrame:
    """Frame sampling for video-ish payloads — a ROW-EXPANDING
    mapInPandas: each input row yields one output row per sampled
    frame (every ``stride``-th of the container's frames).

    The container probe is stubbed deterministically (n_frames =
    1 + n_bytes % 16, frame_offset = frame_idx · (n_bytes // n_frames));
    a real implementation replaces the inner loop with an ffmpeg
    keyframe index read — batch shape, schema, and expansion semantics
    are identical. Output rows ≈ input rows × frames/stride, so size
    ``arrow.maxRecordsPerBatch`` for the *output* multiplicity.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if real_decode:
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg (not in this container)"
                )
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_offset": []}
            for did, nb in zip(pdf[id_col], pdf[payload_col].map(len)):
                n_frames = 1 + nb % 16
                step = nb // n_frames
                for i in range(0, n_frames, stride):
                    out["doc_id"].append(did)
                    out["frame_idx"].append(i)
                    out["frame_offset"].append(i * step)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                    "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                    "frame_offset": pd.Series(out["frame_offset"], dtype="int32"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(_sample, FRAMES_SCHEMA)


def resize_meta(
    df: DataFrame, max_w: int = 224, max_h: int = 224
) -> DataFrame:
    """Resize planning over decoded metadata — pure Catalyst (the
    arithmetic needs no codec): clamp to (max_w, max_h). The actual
    pixel resample would slot into the same mapInPandas stage as
    :func:`decode_image_meta`."""
    return df.select(
        "doc_id",
        "width",
        "height",
        F.least(F.col("width"), F.lit(max_w)).alias("out_width"),
        F.least(F.col("height"), F.lit(max_h)).alias("out_height"),
    )
