"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

North-star extension (BASELINE.json). The decode step is STUBBED — the
image/audio libraries are not in this container — but everything Spark
cares about is real and tested: the schema contract, the Arrow batch
shape, partition-size control, and the UDF signatures. Swap
``_decode_image_stub`` for a real decoder (PIL/libav) on a cluster with
the libs installed and nothing else changes.

Scale notes: binary payloads dominate partition size, so operators here
expose ``target_rows_per_batch`` (bounds Arrow batch memory) and callers
should size ``spark.sql.files.maxPartitionBytes`` so one partition of
blobs fits executor memory. Metadata-only transforms (size, magic-byte
sniffing) are pure JVM column expressions and never touch the payload in
Python.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata struct carried next to every media blob.
MEDIA_META = T.StructType(
    [
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)


def sniff_mime(payload_col) -> F.Column:
    """Magic-byte MIME sniffing as a pure JVM expression (hex on the first
    bytes — the payload never crosses into Python)."""
    head = F.hex(F.substring(payload_col, 1, 4))
    return (
        F.when(head.startswith("89504E47"), "image/png")
        .when(head.startswith("FFD8FF"), "image/jpeg")
        .when(head.startswith("47494638"), "image/gif")
        .when(head.startswith("52494646"), "audio/wav")
        .otherwise("application/octet-stream")
    )


def with_media_meta(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Attach/refresh metadata without decoding: byte length + MIME sniff."""
    p = F.col(payload_col)
    return df.withColumn(
        "meta",
        F.struct(
            sniff_mime(p).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.length(p).cast("long").alias("n_bytes"),
            F.lit(None).cast("long").alias("duration_ms"),
        ),
    )


def _decode_image_stub(payload: bytes) -> tuple[int, int]:
    """STUB decode: a real implementation returns (width, height) via PIL.
    Here: deterministic fake derived from the payload so tests are stable.
    Raises on None to mirror real decoder behavior on corrupt input."""
    if payload is None:
        raise NotImplementedError("decode of empty payload")
    h = int.from_bytes(payload[:8].ljust(8, b"\0"), "big")
    return (64 + h % 1920, 64 + (h >> 16) % 1080)


FEATURE_SCHEMA = "media_id long, width int, height int, n_bytes long, feat array<double>"


def extract_image_features(df: DataFrame, target_rows_per_batch: int = 256) -> DataFrame:
    """Decode + feature-extract via mapInPandas. The Arrow batch size is
    bounded so blob batches fit in the Python worker. Feature vector is a
    deterministic 8-dim byte-histogram sketch of the payload (stands in
    for a real CNN embedding; same shape, same partitioning)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), target_rows_per_batch):
                chunk = pdf.iloc[start : start + target_rows_per_batch]
                rows = []
                for _, r in chunk.iterrows():
                    payload = r["payload"]
                    w, h = _decode_image_stub(payload)
                    hist = [0.0] * 8
                    for byte in payload[:4096]:
                        hist[byte >> 5] += 1.0
                    total = sum(hist) or 1.0
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "width": w,
                            "height": h,
                            "n_bytes": len(payload),
                            "feat": [v / total for v in hist],
                        }
                    )
                yield pd.DataFrame(rows, columns=["media_id", "width", "height", "n_bytes", "feat"])

    return df.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, max_dim: int = 256, target_rows_per_batch: int = 256) -> DataFrame:
    """Resize via mapInPandas: decode (stub) -> scale the dimensions to
    fit ``max_dim`` preserving aspect ratio -> re-encode (stub: payload
    passes through; a real implementation re-encodes the scaled raster).
    The Spark-side contract — batch bounding, binary in/out schema,
    aspect-ratio math — is real and tested."""

    def fn(batches):
        for pdf in batches:
            for start in range(0, len(pdf), target_rows_per_batch):
                chunk = pdf.iloc[start : start + target_rows_per_batch]
                rows = []
                for _, r in chunk.iterrows():
                    payload = r["payload"]
                    w, h = _decode_image_stub(payload)
                    scale = min(1.0, max_dim / max(w, h))
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "width": max(1, int(w * scale)),
                            "height": max(1, int(h * scale)),
                            "payload": payload,
                        }
                    )
                yield pd.DataFrame(rows, columns=["media_id", "width", "height", "payload"])

    return df.select("media_id", "payload").mapInPandas(fn, RESIZED_SCHEMA)


AUDIO_CHUNK_SCHEMA = "media_id long, chunk_idx int, start_ms long, end_ms long"


def audio_chunk_plan(df: DataFrame, chunk_ms: int = 30_000) -> DataFrame:
    """Audio chunking *plan*: each media row expands to the fixed-length
    windows a transcription/feature pass would decode (the decode is the
    stub boundary). Pure JVM sequence/explode, like frame_sample_plan —
    the fan-out never touches Python."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0).cast("long"))
    starts = F.sequence(F.lit(0).cast("long"), dur, F.lit(chunk_ms).cast("long"))
    chunks = F.filter(starts, lambda st: st < F.greatest(dur, F.lit(1).cast("long")))
    out = df.select("media_id", F.col("meta.duration_ms").alias("_dur"), F.posexplode(chunks).alias("chunk_idx", "start_ms"))
    return out.select(
        "media_id",
        F.col("chunk_idx").cast("int"),
        "start_ms",
        F.least(F.col("start_ms") + chunk_ms, F.coalesce(F.col("_dur"), F.lit(0).cast("long"))).alias("end_ms"),
    )


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: expands each media row into the frame
    timestamps a decoder would extract (the decode itself is the stub
    boundary). Pure JVM sequence/explode — demonstrates the fan-out shape
    without Python."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0).cast("long"))
    frames = F.sequence(F.lit(0).cast("long"), dur, F.lit(every_ms).cast("long"))
    return df.select(
        "media_id", F.explode(frames).alias("frame_ms")
    )


def text_to_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Adapter used in tests/bench: wraps a text table into the MEDIA_SCHEMA
    shape (utf-8 bytes as payload) so the multimodal plumbing is exercised
    on the driver-provided `documents` table without real image data."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
    ).transform(with_media_meta)
