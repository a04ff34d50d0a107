"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The decode kernels (image decode, resample, frame sample) are STUBS —
the codec libraries aren't in this container — but the Spark-side
design is real and tested: Arrow-batched ``mapInPandas`` with explicit
schemas, binary payloads never exploded row-by-row through Python
object churn, and partition sizing left to
``spark.sql.files.maxPartitionBytes`` so a 100 TB media corpus streams
batch-by-batch through executors.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_sha", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def decode_image(payload: bytes) -> object:
    """STUB: real impl would use PIL/libjpeg — not in this container."""
    raise NotImplementedError("image codecs unavailable; inject a decoder")


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic fake feature vector from payload bytes (stands in
    for an encoder model output; keeps shapes/partitioning real)."""
    import hashlib

    digest = hashlib.sha256(payload or b"").digest()
    return [int.from_bytes(digest[4 * i : 4 * i + 4], "big") / 2**32 for i in range(dim)]


def extract_features(df: DataFrame, batch_decoder=None) -> DataFrame:
    """media frame -> per-item features via Arrow-batched mapInPandas.

    ``batch_decoder(payload bytes) -> list[float]`` plugs a real model;
    default is the deterministic fake."""
    decoder = batch_decoder or _fake_feature

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0),
                    "payload_sha": payloads.map(
                        lambda b: hashlib.sha256(b or b"").hexdigest()
                    ),
                    "feature": payloads.map(decoder),
                }
            )

    return df.mapInPandas(run, schema=_FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB resize: passes payload through and updates meta dims —
    the real kernel swaps in a codec inside the same mapInPandas shape."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = pdf["meta"].map(
                lambda m: {**(m or {}), "width": width, "height": height}
            )
            out = pdf.copy()
            out["meta"] = meta
            yield out

    return df.mapInPandas(run, schema=MEDIA_SCHEMA)


def make_media_frame(spark, docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents (payload = utf8 bytes)
    for tests — deterministic, no external data."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )
