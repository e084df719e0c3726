"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed with Arrow-batched pandas via mapInPandas.

The decode step itself (image/audio libs) is STUBBED — not available in
this environment — behind `decode_image_stub`; everything Spark-side is
real and tested: schema, batch iteration, partition-preserving transform,
output typing. Swap the stub for PIL/librosa per modality.

Scale notes (100 TB): mapInPandas streams Arrow record batches — memory
is bounded by spark.sql.execution.arrow.maxRecordsPerBatch regardless of
partition size; payloads never pass through the driver.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("byte_mean", T.DoubleType()),
        T.StructField("head_hex", T.StringType()),
    ]
)


def docs_as_media(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Materialize a media-like table from the documents fixture: utf-8
    payload bytes + fake mime/typed metadata. Stands in for an
    image/audio table in tests."""
    return docs.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
    )


def decode_image_stub(payload: bytes) -> dict:
    """Placeholder for a real decoder (PIL.Image.open etc.). Deterministic
    fake: byte stats. Raise NotImplementedError here if you want a hard
    stub instead of the fake."""
    n = len(payload)
    return {
        "n_bytes": n,
        "byte_mean": (sum(payload) / n) if n else 0.0,
        "head_hex": payload[:4].hex(),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads — the real
    Arrow-batched plumbing a decode/resize/frame-sample stage uses."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image_stub(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)
