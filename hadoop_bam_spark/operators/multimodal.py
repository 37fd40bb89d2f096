"""Multimodal column plumbing: image/audio/video as opaque binary columns.

The Spark-side machinery is real — binary columns travel through Arrow to
vectorized Python batches via ``mapInPandas``, with typed metadata structs —
but actual media decoding is STUBBED (the image/audio libraries are not in
this container): ``decode_image_batch`` computes deterministic fake features
from the bytes so the pipeline is testable end-to-end, and raises
``NotImplementedError`` when a real decode is requested.

At 100 TB: binary payloads stay in parquet (never shuffled unless needed),
metadata extraction is a narrow mapInPandas over the scan, and feature
columns are written back columnar. Batch size is controlled by
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("magic", T.LongType(), False),
        T.StructField("checksum", T.LongType(), False),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Derive a deterministic opaque binary column (stand-in for image bytes)."""
    return df.withColumn("payload", F.unhex(F.md5(F.col(text_col))))


def extract_media_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Vectorized metadata extraction over binary payloads via mapInPandas.

    This is the exact plumbing a real decoder plugs into: bytes arrive as
    Python ``bytes`` in Arrow-backed pandas batches; outputs are typed columns.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col].astype("int64"),
                    "n_bytes": payloads.map(len).astype("int64"),
                    "magic": payloads.map(lambda b: b[0] if b else 0).astype("int64"),
                    "checksum": payloads.map(lambda b: sum(b) % 65536).astype("int64"),
                }
            )

    return df.select(id_col, "payload").mapInPandas(batches, MEDIA_META_SCHEMA)


def decode_image_batch(payloads: pd.Series, fake: bool = True) -> pd.DataFrame:
    """STUB image decode. ``fake=True`` yields deterministic pseudo-features
    (so pipelines are testable); a real decode needs PIL/opencv, absent here.
    """
    if not fake:
        raise NotImplementedError(
            "Real image decoding requires PIL/opencv, not available in this "
            "environment. Run with fake=True for deterministic pseudo-features."
        )
    return pd.DataFrame(
        {
            "width": payloads.map(lambda b: 1 + b[0] % 64 if b else 0),
            "height": payloads.map(lambda b: 1 + b[1] % 64 if len(b) > 1 else 0),
            "mean_px": payloads.map(lambda b: (sum(b) / len(b)) if b else 0.0),
        }
    )


def frame_sample_indices(n_frames: pd.Series, every: int = 10) -> pd.Series:
    """Deterministic frame-sampling plan for video payloads (indices only —
    decoding is stubbed)."""
    return n_frames.map(lambda n: list(range(0, int(n), every)))
