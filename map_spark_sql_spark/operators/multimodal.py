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
