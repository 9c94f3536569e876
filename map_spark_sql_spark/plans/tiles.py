"""Binary tile encoding (X4/X5) and KeyValue assembly (X6).

The reference encodes aggregated features to bytes on RDD detours —
protobuf ``PointFeatures`` for the points path (``ProtobufTiles.java:30-52``)
and Mapbox Vector Tiles for the tiles path (``VectorTiles.java:34-86``) —
deliberately avoiding Java UDFs because Spark 2.3's ``byte[]`` wrapping was
slow (comments ``PointMapBuilder.java:83``, ``TileMapBuilder.java:163``).

The PySpark analogue of that decision is an **Arrow-batched pandas UDF**: the
aggregated rows cross to Python once, in columnar batches, and come back as a
``binary`` column — no per-row pickling, no RDD hop. The MVT/protobuf wire
formats themselves need libraries this container doesn't ship, so the byte
layout here is a documented deterministic stand-in (SURVEY.md §2.7: "byte
exactness with the Java encoder is a non-goal, structural equality is the
contract"); ``decode_*`` inverses make that structure testable.

Formats (all little-endian, lengths as uint32):

- point features (X4): ``b"PF1\\0" | n | n * (lat f64, lng f64, borYear i32,
  occCount i64)``
- vector tile (X5): ``b"VT1\\0" | nPixels | nPixels * (px i32, py i32, nF |
  nF * (borYear i32, occCount i64))`` — pixels carry their feature list just
  like the MVT layer carries per-pixel attributes {year: count}
  (``VectorTiles.java:57-77``).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

POINT_MAGIC = b"PF1\x00"
TILE_MAGIC = b"VT1\x00"


# --- pure-Python codecs (unit-testable without Spark) -----------------------


def encode_point_features_py(features: list) -> bytes:
    out = [POINT_MAGIC, struct.pack("<I", len(features))]
    for f in features:
        lat, lng, bor_year, occ = f["lat"], f["lng"], f["borYear"], f["occCount"]
        out.append(struct.pack("<ddiq", lat, lng, bor_year, occ))
    return b"".join(out)


def decode_point_features_py(blob: bytes) -> list[dict]:
    assert blob[:4] == POINT_MAGIC
    (n,) = struct.unpack_from("<I", blob, 4)
    off, res = 8, []
    for _ in range(n):
        lat, lng, bor_year, occ = struct.unpack_from("<ddiq", blob, off)
        off += 28
        res.append({"lat": lat, "lng": lng, "borYear": bor_year, "occCount": occ})
    return res


def encode_tile_py(pixels: list) -> bytes:
    out = [TILE_MAGIC, struct.pack("<I", len(pixels))]
    for p in pixels:
        feats = p["features"]
        out.append(struct.pack("<iiI", p["px"], p["py"], len(feats)))
        for f in feats:
            out.append(struct.pack("<iq", f["borYear"], f["occCount"]))
    return b"".join(out)


def decode_tile_py(blob: bytes) -> list[dict]:
    assert blob[:4] == TILE_MAGIC
    (n,) = struct.unpack_from("<I", blob, 4)
    off, res = 8, []
    for _ in range(n):
        px, py, nf = struct.unpack_from("<iiI", blob, off)
        off += 12
        feats = []
        for _ in range(nf):
            bor_year, occ = struct.unpack_from("<iq", blob, off)
            off += 12
            feats.append({"borYear": bor_year, "occCount": occ})
        res.append({"px": px, "py": py, "features": feats})
    return res


# --- Spark operators --------------------------------------------------------


def encode_point_features(points: DataFrame, features_col: str = "features") -> DataFrame:
    """points-path rows -> (key, mapKey, value binary); X4 analogue."""

    @F.pandas_udf(BinaryType())
    def _enc(col: pd.Series) -> pd.Series:
        return col.map(encode_point_features_py)

    return points.withColumn("value", _enc(F.col(features_col))).drop(features_col)


def encode_tiles(tiles: DataFrame, tile_col: str = "tile") -> DataFrame:
    """tiles-path rows -> (key, mapKey, z, x, y, value binary); X5 analogue."""

    @F.pandas_udf(BinaryType())
    def _enc(col: pd.Series) -> pd.Series:
        return col.map(encode_tile_py)

    return tiles.withColumn("value", _enc(F.col(tile_col))).drop(tile_col)


def to_key_values(df: DataFrame, family: str, qualifier: str) -> DataFrame:
    """X6: assemble the sink's (key, family, qualifier, value) shape
    (PointMapBuilder.java:97-110, TileMapBuilder.java:185-193)."""
    return df.select(
        "key",
        F.lit(family.replace(":", "_")).alias("family"),
        F.lit(qualifier).alias("qualifier"),
        "value",
    )
