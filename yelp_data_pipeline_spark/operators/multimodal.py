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
