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


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Placeholder for a real resize (PIL Image.resize + re-encode).
    Deterministic fake: truncate/pad the payload to width*height bytes so
    output size is a pure function of the target dimensions."""
    target = width * height
    return payload[:target].ljust(target, b"\0")


def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """1:1 mapInPandas resize stage: same media schema out, new
    dimensions. Swap resize_stub for a real decoder+resizer; the Arrow
    batch shape, schema, and partitioning are what production uses."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["payload"] = [resize_stub(p, width, height) for p in pdf["payload"]]
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return media.mapInPandas(batches, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),
    ]
)


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """1:N mapInPandas frame sampling (the video path): each input row
    fans out to up to n_frames rows. Stub 'decoder' chunks the payload at
    evenly spaced offsets — deterministic, so tests pin exact output.
    Swap for pyav/ffmpeg keyframe extraction; the row-explosion shape,
    schema, and Arrow batching stay identical."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, payloads = [], [], []
            for mid, p in zip(pdf["media_id"], pdf["payload"]):
                n = len(p)
                if n == 0:
                    continue
                k = min(n_frames, max(1, n // frame_bytes))
                for f in range(k):
                    off = (n * f) // k
                    ids.append(mid)
                    idxs.append(f)
                    payloads.append(p[off : off + frame_bytes])
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "payload": payloads}
            )

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)
