"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed through Arrow-batched
``mapInPandas``.

North-star extension (BASELINE.json). The decode step parses REAL
container headers in pure stdlib — PNG IHDR, GIF logical-screen
descriptor, JPEG SOF marker scan, RIFF/WAV chunk walk
(:func:`decode_header`) — over real bytes. Only pixel/sample decode
(which needs PIL/libav, not in this container) is out of scope: a
cluster deployment swaps the feature sketch for a real CNN/fbank
embedding and nothing else changes. Payloads that parse as no known
container yield typed nulls rather than failing the batch — at 100 TB a
corrupt blob must cost one row, not a stage retry.

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


def decode_header(payload: bytes) -> dict:
    """Parse a media payload's container header in pure stdlib — the real
    decode boundary for this container-less environment (reference parity:
    job_data materialization is typed, SURVEY.md §1.1).

    Formats: PNG (IHDR width/height, big-endian), GIF87a/89a (logical
    screen descriptor, little-endian), JPEG (marker scan to the first SOF
    frame header), RIFF/WAV (chunk walk: 'fmt ' byte-rate + 'data' size
    -> duration). Returns ``{mime, width, height, duration_ms}``; raises
    ``ValueError`` on unrecognized or structurally corrupt input."""
    if payload is None or len(payload) < 10:
        raise ValueError("payload too short for any container header")
    buf = bytes(payload)
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        if buf[12:16] != b"IHDR" or len(buf) < 24:
            raise ValueError("PNG: first chunk is not IHDR")
        return {
            "mime": "image/png",
            "width": int.from_bytes(buf[16:20], "big"),
            "height": int.from_bytes(buf[20:24], "big"),
            "duration_ms": None,
        }
    if buf[:6] in (b"GIF87a", b"GIF89a"):
        return {
            "mime": "image/gif",
            "width": int.from_bytes(buf[6:8], "little"),
            "height": int.from_bytes(buf[8:10], "little"),
            "duration_ms": None,
        }
    if buf[:3] == b"\xff\xd8\xff":
        i = 2
        while i + 9 < len(buf):
            if buf[i] != 0xFF:
                raise ValueError("JPEG: marker sync lost")
            marker = buf[i + 1]
            if marker in (0x01, 0xD8) or 0xD0 <= marker <= 0xD7:
                i += 2
                continue
            seg_len = int.from_bytes(buf[i + 2 : i + 4], "big")
            # SOF0..SOF15 carry the frame header, except DHT/JPG/DAC
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                return {
                    "mime": "image/jpeg",
                    "width": int.from_bytes(buf[i + 7 : i + 9], "big"),
                    "height": int.from_bytes(buf[i + 5 : i + 7], "big"),
                    "duration_ms": None,
                }
            i += 2 + seg_len
        raise ValueError("JPEG: no SOF marker found")
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        i, byte_rate, data_size = 12, None, None
        while i + 8 <= len(buf):
            cid = buf[i : i + 4]
            sz = int.from_bytes(buf[i + 4 : i + 8], "little")
            if cid == b"fmt " and i + 20 <= len(buf):
                byte_rate = int.from_bytes(buf[i + 16 : i + 20], "little")
            elif cid == b"data":
                data_size = sz
            i += 8 + sz + (sz & 1)
        if not byte_rate:
            raise ValueError("WAV: missing fmt chunk")
        return {
            "mime": "audio/wav",
            "width": None,
            "height": None,
            "duration_ms": (data_size or 0) * 1000 // byte_rate,
        }
    raise ValueError("unrecognized container magic")


FEATURE_SCHEMA = (
    "media_id long, mime string, width int, height int, "
    "duration_ms long, n_bytes long, feat array<double>"
)


def extract_media_features(df: DataFrame, target_rows_per_batch: int = 256) -> DataFrame:
    """Decode + feature-extract via mapInPandas. The Arrow batch size is
    bounded so blob batches fit in the Python worker. Header fields come
    from :func:`decode_header` (real parsing); the feature vector is a
    deterministic 8-dim byte-histogram sketch of the payload (stands in
    for a real CNN embedding; same shape, same partitioning). Payloads
    that fail to parse yield null mime/dims — one bad blob costs one
    row, never the batch."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for start in range(0, len(pdf), target_rows_per_batch):
                chunk = pdf.iloc[start : start + target_rows_per_batch]
                rows = []
                for _, r in chunk.iterrows():
                    payload = r["payload"]
                    try:
                        hdr = decode_header(payload)
                    except ValueError:
                        hdr = {"mime": None, "width": None, "height": None, "duration_ms": None}
                    hist = [0.0] * 8
                    for byte in (payload or b"")[:4096]:
                        hist[byte >> 5] += 1.0
                    total = sum(hist) or 1.0
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "mime": hdr["mime"],
                            "width": hdr["width"],
                            "height": hdr["height"],
                            "duration_ms": hdr["duration_ms"],
                            "n_bytes": len(payload) if payload is not None else 0,
                            "feat": [v / total for v in hist],
                        }
                    )
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "mime", "width", "height", "duration_ms", "n_bytes", "feat"],
                )

    return df.select("media_id", "payload").mapInPandas(fn, FEATURE_SCHEMA)


RESIZED_SCHEMA = "media_id long, width int, height int, payload binary"


def resize_images(df: DataFrame, max_dim: int = 256, target_rows_per_batch: int = 256) -> DataFrame:
    """Resize via mapInPandas: decode the real header -> scale the
    dimensions to fit ``max_dim`` preserving aspect ratio -> re-encode
    (payload passes through; a real implementation re-encodes the scaled
    raster — the only step needing an image lib). Non-image payloads pass
    through with null dims. The Spark-side contract — batch bounding,
    binary in/out schema, aspect-ratio math — is real and tested."""

    def fn(batches):
        for pdf in batches:
            for start in range(0, len(pdf), target_rows_per_batch):
                chunk = pdf.iloc[start : start + target_rows_per_batch]
                rows = []
                for _, r in chunk.iterrows():
                    payload = r["payload"]
                    try:
                        hdr = decode_header(payload)
                    except ValueError:
                        hdr = {"width": None}
                    w, h = hdr.get("width"), hdr.get("height")
                    if w and h:
                        scale = min(1.0, max_dim / max(w, h))
                        w, h = max(1, int(w * scale)), max(1, int(h * scale))
                    else:
                        w = h = None
                    rows.append(
                        {"media_id": r["media_id"], "width": w, "height": h, "payload": payload}
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


def _be_hex(col, nbytes: int):
    """Fixed-width big-endian hex of a non-negative integer column."""
    return F.lpad(F.hex(col.cast("bigint")), nbytes * 2, "0")


def _le_hex(col, nbytes: int):
    """Fixed-width little-endian hex: the big-endian bytes reversed."""
    c = col.cast("bigint")
    return F.concat(
        *[
            F.lpad(F.hex(F.shiftright(c, 8 * i).bitwiseAND(F.lit(255))), 2, "0")
            for i in range(nbytes)
        ]
    )


def synthesize_media_payloads(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build REAL container bytes per document — a valid PNG signature +
    IHDR, a RIFF/WAVE fmt+data header, or a GIF89a screen descriptor
    (by ``id % 3``), with 16 bytes of md5(text) as body filler. All
    header fields are closed-form in the id (width ``16 + id % 2000``,
    height ``16 + 7*id % 1000``, WAV sample-rate ``8000*(1 + id % 5)``,
    mono 16-bit, data size ``2000 + 2*(id % 1000)``), so a SQL oracle
    can compute the expected decode output from the formulas while the
    Spark path must actually PARSE the bytes — the decode is what's
    under test. Assembly is JVM-side hex concat + unhex: payload bytes
    never touch Python until the decode UDF reads them."""
    did = F.col(id_col)
    w = (did % 2000 + 16).cast("bigint")
    h = ((did * 7) % 1000 + 16).cast("bigint")
    sr = ((did % 5 + 1) * 8000).cast("bigint")
    byte_rate = sr * 2  # mono, 16-bit samples
    data_size = ((did % 1000) * 2 + 2000).cast("bigint")
    filler = F.md5(F.col(text_col))  # 32 hex chars = 16 payload bytes
    png = F.concat(
        F.lit("89504E470D0A1A0A" + "0000000D" + "49484452"),
        _be_hex(w, 4), _be_hex(h, 4),
        F.lit("0806000000" + "00000000"),  # bit depth/color/crc fields
        filler,
    )
    wav = F.concat(
        F.lit("52494646"), _le_hex(data_size + 52, 4), F.lit("57415645"),
        F.lit("666D7420"), _le_hex(F.lit(16), 4),
        _le_hex(F.lit(1), 2), _le_hex(F.lit(1), 2),  # PCM, mono
        _le_hex(sr, 4), _le_hex(byte_rate, 4),
        _le_hex(F.lit(2), 2), _le_hex(F.lit(16), 2),  # block align, bits
        F.lit("64617461"), _le_hex(data_size, 4),
        filler,
    )
    gif = F.concat(F.lit("474946383961"), _le_hex(w, 2), _le_hex(h, 2), filler)
    payload_hex = (
        F.when(did % 3 == 0, png).when(did % 3 == 1, wav).otherwise(gif)
    )
    return df.select(
        did.alias("media_id"), F.unhex(payload_hex).alias("payload")
    ).transform(with_media_meta)
