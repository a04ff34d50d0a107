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


_FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("t_ms", T.IntegerType()),
        T.StructField("frame_payload", T.BinaryType()),
    ]
)


def sample_frames(df: DataFrame, every_ms: int = 1000, frame_decoder=None) -> DataFrame:
    """Video frame sampling: one output row per sampled timestamp
    (``duration_ms // every_ms`` frames per video). The frame grab is a
    STUB (``frame_decoder(payload, t_ms) -> bytes`` plugs a real
    codec; default slices deterministic bytes from the payload) — the
    Spark side is the real shape: fan-out happens INSIDE mapInPandas,
    so one input batch yields many frame rows without a Generate/
    explode pass over binary columns, and downstream repartition
    spreads decode work."""
    grab = frame_decoder or (
        lambda payload, t_ms: (payload or b"")[t_ms % max(len(payload or b" "), 1) :][:16]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, ts, frames = [], [], [], []
            for _, row in pdf.iterrows():
                duration = (row["meta"] or {}).get("duration_ms") or 0
                payload = row["payload"]
                for i in range(max(duration // every_ms, 0)):
                    ids.append(row["media_id"])
                    idxs.append(i)
                    ts.append(i * every_ms)
                    frames.append(grab(payload, i * every_ms))
            yield pd.DataFrame(
                {"media_id": ids, "frame_idx": idxs, "t_ms": ts, "frame_payload": frames}
            )

    return df.filter(F.col("kind") == "video").mapInPandas(run, schema=_FRAME_SCHEMA)


_CHUNK_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("chunk_idx", T.IntegerType()),
        T.StructField("start_ms", T.IntegerType()),
        T.StructField("end_ms", T.IntegerType()),
        T.StructField("chunk_payload", T.BinaryType()),
    ]
)


def chunk_audio(df: DataFrame, chunk_ms: int = 30_000) -> DataFrame:
    """Audio chunking: fixed-duration windows from ``meta.duration_ms``
    with byte ranges sliced proportionally from the payload (a real
    transcoder would cut on frame boundaries inside the same shape).
    Rows multiply inside the Arrow batch, never via explode over
    binary."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, starts, ends, chunks = [], [], [], [], []
            for _, row in pdf.iterrows():
                duration = (row["meta"] or {}).get("duration_ms") or 0
                payload = row["payload"] or b""
                n = max((duration + chunk_ms - 1) // chunk_ms, 0)
                for i in range(n):
                    lo_ms, hi_ms = i * chunk_ms, min((i + 1) * chunk_ms, duration)
                    lo = len(payload) * lo_ms // max(duration, 1)
                    hi = len(payload) * hi_ms // max(duration, 1)
                    ids.append(row["media_id"])
                    idxs.append(i)
                    starts.append(lo_ms)
                    ends.append(hi_ms)
                    chunks.append(payload[lo:hi])
            yield pd.DataFrame(
                {
                    "media_id": ids,
                    "chunk_idx": idxs,
                    "start_ms": starts,
                    "end_ms": ends,
                    "chunk_payload": chunks,
                }
            )

    return df.filter(F.col("kind") == "audio").mapInPandas(run, schema=_CHUNK_SCHEMA)
