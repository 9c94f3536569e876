"""Multimodal columns: opaque binary payloads with typed metadata.

Pattern per SURVEY.md §2.8 and the reference's own binary-column shape (the
``tile: binary`` output of X4/X5, ``TileMapBuilder.java:161-174``): media
travels as a ``binary`` column plus a metadata struct; decode /
feature-extraction runs as Arrow-batched ``mapInPandas`` so bytes cross the
JVM<->Python boundary in columnar batches (never row-at-a-time pickling).

The container ships no image/audio codecs, so the payloads themselves use a
small self-describing wire format ("SPM1") that the Python side REALLY
decodes and validates — header parse, length check, CRC32 check — rather
than a stubbed decoder:

    magic "SPM1" (4) | kind u8 (1) | width i32 (4) | height i32 (4)
    | body_len i64 (8) | crc32(body) u32 (4) | body bytes

All header ints are big-endian. The header is assembled with NATIVE Spark
expressions (``concat``/``unhex``/``lpad(hex(...))``/``crc32``) so payload
synthesis stays JVM-side and whole-stage-codegen'd; only decode crosses into
Python, via Arrow. Swapping a real codec (Pillow/ffmpeg) in means replacing
:func:`decode_media`'s body interpretation — the Spark-side plumbing
(schema, batching, payload-dropped-before-shuffle) is unchanged.

At 100 TB the important properties are (a) payloads never pass through a
shuffle unnecessarily — featurize *before* any groupBy and drop the payload
column, and (b) ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds
executor memory per batch.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MAGIC = b"SPM1"
HEADER_LEN = 25
KINDS = ("image", "audio")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def _be_hex(col: Column, n_hex_digits: int) -> Column:
    """Fixed-width big-endian bytes from a non-negative integral column."""
    return F.unhex(F.lpad(F.hex(col), n_hex_digits, "0"))


def spm1_payload(kind_code: Column, width: Column, height: Column, body: Column) -> Column:
    """Assemble an SPM1 container natively (no Python on the synth path)."""
    return F.concat(
        F.unhex(F.lit(MAGIC.hex())),
        _be_hex(kind_code.cast("int"), 2),
        _be_hex(width.cast("int"), 8),
        _be_hex(height.cast("int"), 8),
        _be_hex(F.octet_length(body).cast("bigint"), 16),
        _be_hex(F.crc32(body), 8),
        body,
    )


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: SPM1-wrapped utf-8 payload +
    metadata columns. Stands in for `spark.read.format('binaryFile')` over an
    object store. ``n_bytes`` is the body (content) size, excluding the
    25-byte container header."""
    body = F.encode("text", "utf-8")
    width = (F.col("doc_id") % 640 + 32).cast("int")
    height = (F.col("doc_id") % 480 + 32).cast("int")
    kind_code = (F.col("doc_id") % 2 != 0).cast("int")  # 0=image, 1=audio
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("kind"),
        spm1_payload(kind_code, width, height, body).alias("payload"),
        width.alias("width"),
        height.alias("height"),
        F.octet_length(body).cast("long").alias("n_bytes"),
    )


def decode_media(payload: bytes) -> dict:
    """Real SPM1 decoder: header parse + length + CRC32 validation.

    Raises ValueError on any corruption, so a featurize pass doubles as an
    integrity scan. A real image/audio codec slots in downstream of this —
    it would interpret ``body`` instead of returning it raw.
    """
    payload = bytes(payload)
    if len(payload) < HEADER_LEN or payload[:4] != MAGIC:
        raise ValueError("not an SPM1 container")
    kind_code, width, height, body_len, crc = struct.unpack(">BiiqI", payload[4:HEADER_LEN])
    if kind_code >= len(KINDS):
        raise ValueError(f"unknown kind code {kind_code}")
    body = payload[HEADER_LEN:]
    if len(body) != body_len:
        raise ValueError(f"body length {len(body)} != declared {body_len}")
    if zlib.crc32(body) != crc:
        raise ValueError("body CRC32 mismatch")
    return {"kind": KINDS[kind_code], "width": width, "height": height, "body": body}


def encode_media(kind: str, width: int, height: int, body: bytes) -> bytes:
    """Python-side SPM1 encoder (inverse of :func:`decode_media`); used by
    payload-rewriting operators like :func:`resize_media`."""
    return (
        MAGIC
        + struct.pack(">BiiqI", KINDS.index(kind), width, height, len(body), zlib.crc32(body))
        + body
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
        StructField("body_md5", StringType()),
        StructField("byte_mean_x100", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
    ]
)


def featurize_media(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction: payload in, features out, payload
    dropped before anything downstream can shuffle it. Every payload is
    actually decoded (header + CRC verified inside :func:`decode_media`);
    features combine decoded metadata with body byte statistics. The
    checksum FEATURE is md5 (hex) rather than the container's CRC32 so the
    output is oracle-checkable cross-engine (DuckDB has ``md5``, no
    ``crc32``) — integrity validation still uses the CRC."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                # Missing objects are routine at corpus scale (deleted
                # originals, failed fetches): a NULL payload is skipped,
                # not a job-killer. Corrupt payloads still raise.
                if payload is None:
                    continue
                m = decode_media(payload)
                body = m["body"]
                rows.append(
                    (
                        media_id,
                        m["kind"],
                        m["width"],
                        m["height"],
                        len(body),
                        hashlib.md5(body).hexdigest(),
                        int(sum(body) * 100 // len(body)) if body else 0,
                        body[0] if body else -1,
                        body[-1] if body else -1,
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return media.select("media_id", "payload").mapInPandas(extract, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_bytes", LongType()),
    ]
)


def resize_media(media: DataFrame, max_dim: int = 64) -> DataFrame:
    """Resize over ``mapInPandas``: decode the container, aspect-preserving
    fit of (width, height) into ``max_dim``, subsample the body at the same
    ratio (the codec-free stand-in for pixel resampling), re-encode a valid
    SPM1 container with the new dimensions. Output payloads decode cleanly,
    so resize composes with :func:`featurize_media` / :func:`sample_frames`."""

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:  # missing object: skip, like featurize
                    continue
                m = decode_media(payload)
                scale = min(1.0, max_dim / max(m["width"], m["height"], 1))
                w2 = max(1, int(m["width"] * scale))
                h2 = max(1, int(m["height"] * scale))
                step = max(1, int(1 / scale)) if scale < 1 else 1
                body = m["body"][::step]
                out_rows.append(
                    (media_id, m["kind"], encode_media(m["kind"], w2, h2, body), w2, h2, len(body))
                )
            yield pd.DataFrame(
                out_rows, columns=["media_id", "kind", "payload", "width", "height", "n_bytes"]
            )

    return media.select("media_id", "payload").mapInPandas(shrink, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_bytes", IntegerType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 256, every_nth: int = 4) -> DataFrame:
    """Frame sampling: decode the container, treat the BODY (not the raw
    payload) as a sequence of fixed-size frames and emit every Nth — the
    1->N fan-out shape of real video frame extraction (one input row becomes
    many output rows inside one Arrow batch; no shuffle). ffmpeg would slot
    into the chunking step."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for media_id, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:  # missing object: skip, like featurize
                    continue
                body = decode_media(payload)["body"]
                n = len(body) // frame_size + (1 if len(body) % frame_size else 0)
                for i in range(0, n, every_nth):
                    chunk = body[i * frame_size : (i + 1) * frame_size]
                    rows.append((media_id, i, chunk, len(chunk)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame", "frame_bytes"])

    return media.select("media_id", "payload").mapInPandas(frames, schema=FRAME_SCHEMA)
