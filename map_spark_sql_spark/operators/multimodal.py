"""Multimodal columns: opaque binary payloads with typed metadata.

Pattern per SURVEY.md §2.8 and the reference's own binary-column shape (the
``tile: binary`` output of X4/X5): media travels as a ``binary`` column plus
a metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so bytes cross the JVM<->Python boundary in columnar batches
(never row-at-a-time pickling).

The container ships no image/audio codecs, so ``decode_image`` raises
NotImplementedError by contract and ``fake_image_features`` provides a
deterministic stand-in (documented, test-covered) that exercises the real
plumbing: schema declaration, batch iteration, per-partition statefulness.
At 100 TB the important properties are (a) payloads never pass through a
shuffle unnecessarily — featurize *before* any groupBy and drop the payload
column, and (b) ``maxRecordsPerBatch`` bounds executor memory per batch.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

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

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("byte_mean_x100", LongType()),
        StructField("first_byte", IntegerType()),
        StructField("last_byte", IntegerType()),
    ]
)


def media_from_documents(docs: DataFrame) -> DataFrame:
    """Synthesize a media table from documents: utf-8 payload + metadata.
    Stands in for `spark.read.format('binaryFile')` over an object store."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.when(F.col("doc_id") % 2 == 0, "image").otherwise("audio").alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
        (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
        F.length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decoder hook. The container has no image codecs; wire Pillow/ffmpeg
    here when available."""
    raise NotImplementedError(
        "image/audio codecs are not available in this environment; "
        "use fake_image_features for the deterministic test path"
    )


def fake_image_features(payload: bytes) -> dict:
    """Deterministic stand-in feature extractor (mean byte, endpoints)."""
    if not payload:
        return {"byte_mean_x100": 0, "first_byte": -1, "last_byte": -1}
    return {
        "byte_mean_x100": int(sum(payload) * 100 // len(payload)),
        "first_byte": payload[0],
        "last_byte": payload[-1],
    }


def featurize_media(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas feature extraction: payload in, features out, payload
    dropped before anything downstream can shuffle it."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(fake_image_features)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": pdf["n_bytes"],
                    "byte_mean_x100": feats.map(lambda f: f["byte_mean_x100"]),
                    "first_byte": feats.map(lambda f: f["first_byte"]),
                    "last_byte": feats.map(lambda f: f["last_byte"]),
                }
            )

    return media.mapInPandas(extract, schema=FEATURE_SCHEMA)


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
    """Resize stub over ``mapInPandas``: metadata is scaled exactly (the real
    contract — aspect-preserving fit into ``max_dim``); the payload transform
    is a deterministic stand-in (byte subsampling at the same ratio) where a
    real build would call Pillow via :func:`decode_image`. The Spark-side
    plumbing — schema, Arrow batching, payload-in/payload-out — is real."""

    def shrink(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for r in pdf.itertuples(index=False):
                scale = min(1.0, max_dim / max(int(r.width), int(r.height), 1))
                w2, h2 = max(1, int(r.width * scale)), max(1, int(r.height * scale))
                step = max(1, int(1 / scale) if scale < 1 else 1)
                payload = bytes(r.payload)[::step]
                out_rows.append((r.media_id, r.kind, payload, w2, h2, len(payload)))
            yield pd.DataFrame(
                out_rows, columns=["media_id", "kind", "payload", "width", "height", "n_bytes"]
            )

    return media.mapInPandas(shrink, schema=RESIZED_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame", BinaryType()),
        StructField("frame_bytes", IntegerType()),
    ]
)


def sample_frames(media: DataFrame, frame_size: int = 256, every_nth: int = 4) -> DataFrame:
    """Frame-sampling stub: treat the payload as a sequence of fixed-size
    frames and emit every Nth — the 1->N fan-out shape of real video frame
    extraction (one input row becomes many output rows inside one Arrow
    batch; no shuffle). ffmpeg would slot into the chunking step."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                payload = bytes(r.payload)
                n = len(payload) // frame_size + (1 if len(payload) % frame_size else 0)
                for i in range(0, n, every_nth):
                    chunk = payload[i * frame_size : (i + 1) * frame_size]
                    rows.append((r.media_id, i, chunk, len(chunk)))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame", "frame_bytes"])

    return media.mapInPandas(frames, schema=FRAME_SCHEMA)
