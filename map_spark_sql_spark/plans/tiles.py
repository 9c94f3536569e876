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


# --- vectorized (Arrow/numpy) encoder kernels --------------------------------
#
# The original encoders mapped a Python codec over every row: each tile's
# list<struct> crossed Arrow -> pandas as boxed dicts and was walked dict-by-
# dict through struct.pack — interpreted Python per FEATURE, the exact shape
# guide §4.2 says to replace with whole-batch native kernels. Both wire
# records are fixed-width (pixel header <iiI> = 12 B, feature <iq> = 12 B;
# point feature <ddiq> = 28 B), so a batch's entire body assembles as ONE
# numpy integer matrix whose row-major bytes ARE the packed records; the
# per-row work left is slicing bytes at record offsets. The UDFs are Spark
# 4.1 `arrow_udf`s: the column arrives as a `pyarrow.Array` (zero Python
# boxing — offsets + primitive child arrays), runs on the same byte-bounded
# ArrowEvalPython batching as the pandas UDFs they replace (whale batches
# still close at arrow.maxBytesPerBatch), and the pure-Python codecs above
# stay as the unit-testable spec the kernels are pinned byte-identical to.


def _assert_no_nulls(arr, what: str):
    """Bad upstream data must fail LOUDLY (r11 advice #2): a null list
    would otherwise encode as a valid empty blob, and a null int field
    routes through float64 in ``to_numpy(zero_copy_only=False)`` and comes
    back as silent garbage bytes. ``null_count`` is a validity-bitmap
    popcount — O(n/8) bits, vectorized, negligible next to the encode."""
    if arr.null_count:
        raise ValueError(
            f"encoder input has {arr.null_count} null {what} value(s); "
            "the wire format has no null encoding — fix the upstream"
        )


def _np_field(struct_arr, name):
    import numpy as np

    field = struct_arr.field(name)
    _assert_no_nulls(field, f"struct field '{name}'")
    return field.to_numpy(zero_copy_only=False)


def _list_lengths(list_arr):
    """Per-row element counts of a ListArray as int64 (nulls -> 0)."""
    import numpy as np
    import pyarrow.compute as pc

    return (
        pc.fill_null(pc.list_value_length(list_arr), 0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )


def _exclusive_cumsum(counts):
    """[0, c0, c0+c1, ...] — offsets array one longer than ``counts``."""
    import numpy as np

    off = np.zeros(counts.shape[0] + 1, dtype=np.int64)
    np.cumsum(counts, out=off[1:])
    return off


def _tile_body_records(pixels):
    """The 12-byte wire records of a flattened pixel StructArray as an
    (n_pixels + n_features) x 3 little-endian uint32 matrix: row-major
    ``tobytes()`` equals the concatenation encode_tile_block_py produces.
    Pixel headers land at record index ``i + features_before(i)``; the
    feature records fill every other slot in flattened order."""
    import numpy as np

    px = _np_field(pixels, "px").astype("<i4")
    py = _np_field(pixels, "py").astype("<i4")
    feats_col = pixels.field("features")
    _assert_no_nulls(feats_col, "pixel features-array")
    nf = _list_lengths(feats_col)
    import pyarrow.compute as pc

    feats = pc.list_flatten(feats_col)
    bor = _np_field(feats, "borYear").astype("<i4")
    occ = _np_field(feats, "occCount").astype("<i8")

    n = px.shape[0]
    total = n + bor.shape[0]
    buf = np.empty((total, 3), dtype="<u4")
    hdr = np.arange(n, dtype=np.int64) + _exclusive_cumsum(nf)[:-1]
    buf[hdr, 0] = px.view("<u4")
    buf[hdr, 1] = py.view("<u4")
    buf[hdr, 2] = nf.astype("<u4")
    mask = np.ones(total, dtype=bool)
    mask[hdr] = False
    occ_u = occ.view("<u8")
    buf[mask, 0] = bor.view("<u4")
    buf[mask, 1] = (occ_u & np.uint64(0xFFFFFFFF)).astype("<u4")
    buf[mask, 2] = (occ_u >> np.uint64(32)).astype("<u4")
    return buf, nf


def _encode_tiles_batch(tile_arr, header: bool):
    """One Arrow batch of tile pixel-arrays -> BinaryArray of wire blobs
    (``header=True``: full TILE_MAGIC|u32(npx) blobs; False: body runs for
    the chunked assembler)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    _assert_no_nulls(tile_arr, "tile pixel-array")
    npx = _list_lengths(tile_arr)
    pixels = pc.list_flatten(tile_arr)
    buf, nf = _tile_body_records(pixels)
    body = memoryview(buf.tobytes())
    pix_off = _exclusive_cumsum(npx)
    rec_off = (pix_off + _exclusive_cumsum(nf)[pix_off]) * 12
    if header:
        blobs = [
            TILE_MAGIC
            + struct.pack("<I", int(npx[i]))
            + bytes(body[rec_off[i] : rec_off[i + 1]])
            for i in range(npx.shape[0])
        ]
    else:
        blobs = [
            bytes(body[rec_off[i] : rec_off[i + 1]]) for i in range(npx.shape[0])
        ]
    return pa.array(blobs, type=pa.binary())


_POINT_DT = None  # built lazily: numpy packed struct dtype of the PF1 record


def _encode_points_batch(features_arr):
    """One Arrow batch of point feature-arrays -> BinaryArray of PF1 blobs.
    The 28-byte <ddiq> record is a packed numpy structured dtype, so the
    whole batch's features serialize as one ``rec.tobytes()``."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    global _POINT_DT
    if _POINT_DT is None:
        _POINT_DT = np.dtype(
            {
                "names": ["lat", "lng", "borYear", "occCount"],
                "formats": ["<f8", "<f8", "<i4", "<i8"],
                "offsets": [0, 8, 16, 20],
                "itemsize": 28,
            }
        )
    _assert_no_nulls(features_arr, "point feature-array")
    n = _list_lengths(features_arr)
    feats = pc.list_flatten(features_arr)
    rec = np.empty(len(feats), dtype=_POINT_DT)
    rec["lat"] = _np_field(feats, "lat")
    rec["lng"] = _np_field(feats, "lng")
    rec["borYear"] = _np_field(feats, "borYear").astype("<i4")
    rec["occCount"] = _np_field(feats, "occCount").astype("<i8")
    body = memoryview(rec.tobytes())
    off = _exclusive_cumsum(n) * 28
    blobs = [
        POINT_MAGIC + struct.pack("<I", int(n[i])) + bytes(body[off[i] : off[i + 1]])
        for i in range(n.shape[0])
    ]
    return pa.array(blobs, type=pa.binary())


# --- Spark operators --------------------------------------------------------


def encode_point_features(points: DataFrame, features_col: str = "features") -> DataFrame:
    """points-path rows -> (key, mapKey, value binary); X4 analogue."""

    @F.arrow_udf(BinaryType())
    def _enc(col):
        return _encode_points_batch(col)

    return points.withColumn("value", _enc(F.col(features_col))).drop(features_col)


def encode_tiles(tiles: DataFrame, tile_col: str = "tile") -> DataFrame:
    """tiles-path rows -> (key, mapKey, z, x, y, value binary); X5 analogue.

    Ships each row's WHOLE pixel array to the Python worker — fine at mid/
    high zooms (tile payload shrinks 4x per zoom), fatal for low-zoom whale
    tiles at rung scale: a z2 tile over ~1.2B fanned rows is ~10M+ pixel
    structs; even the unboxed Arrow transfer is a whole-tile buffer per row
    (caught by the 1000x blob gate, round 7). Use
    :func:`encode_tiles_chunked` wherever a whale tile can appear; output
    is byte-identical (pinned in pytest)."""

    @F.arrow_udf(BinaryType())
    def _enc(col):
        return _encode_tiles_batch(col, header=True)

    return tiles.withColumn("value", _enc(F.col(tile_col))).drop(tile_col)


def encode_tile_block_py(pixels: list) -> bytes:
    """Body bytes of a pixel run — :func:`encode_tile_py` without the
    header. Concatenating block bodies in pixel order and prefixing
    ``TILE_MAGIC | u32(total_pixels)`` reproduces the full blob exactly,
    which is what makes the wire format whale-safe to produce: it is a
    length-prefixed CONCATENATION, so no single process ever has to hold
    the whole tile as objects."""
    out = []
    for p in pixels:
        feats = p["features"]
        out.append(struct.pack("<iiI", p["px"], p["py"], len(feats)))
        for f in feats:
            out.append(struct.pack("<iq", f["borYear"], f["occCount"]))
    return b"".join(out)


def encode_tiles_chunked(
    tiles: DataFrame, tile_col: str = "tile", chunk: int = 16384
) -> DataFrame:
    """Whale-safe X5 encoder, byte-identical to :func:`encode_tiles`.

    The pixel array is sliced into <= ``chunk``-pixel runs IN THE JVM
    (``slice`` over a ``sequence`` of offsets — native expressions, no
    giant row ever crosses to Python), each run's body bytes are encoded
    by an Arrow-batched pandas UDF (bounded object count per call), and
    the per-tile blob is assembled by joining the run bodies in slice
    order under the ``TILE_MAGIC | u32(nPixels)`` header. The assembly
    buffer equals the output blob's own size — irreducible, since the
    blob IS the result row — but no stage multiplies it through Python
    object boxing (~10-20x), which is what crashed workers at the 1000x
    rung. Scale shape: one extra narrow shuffle (chunk re-group), Python
    memory bounded by ``chunk``, JVM aggregation buffer bounded by the
    blob size.
    """
    from pyspark.sql.types import StructField, StructType

    others = [c for c in tiles.columns if c != tile_col]
    base_fields = [tiles.schema[c] for c in others]
    asm_schema = StructType(base_fields + [StructField("value", BinaryType())])

    # Two bounds compose here (both learned at the 1000x rung):
    # 1. Per-ROW bound: a whale tile is sliced into <= chunk-pixel runs in
    #    the JVM, so no single value crossing to Python exceeds ~chunk
    #    pixels of boxed objects.
    # 2. Per-BATCH bound: scalar pandas UDFs batch by row count (10000
    #    default), which multiplied even 20MB chunk rows into tens of GB —
    #    get_session sets spark.sql.execution.arrow.maxBytesPerBatch so a
    #    batch closes at 32MB regardless of row count.
    # Small tiles (the overwhelming majority past z2 — payload shrinks 4x
    # per zoom) take the narrow whole-row encode: zero extra shuffles.
    # Only whale tiles pay the chunk fan-out + one assembly shuffle, whose
    # applyInPandas group = one tile, bounded by the blob's own size
    # (irreducible — the blob IS the result row). The filter-split does
    # NOT double-compute the upstream aggregation: both branches sit on
    # the same exchange and Spark's ReuseExchange shares the shuffle
    # files (block-caching t3 here instead OOM'd the 100x composed run —
    # ~340MB partitions x 17 zooms of block storage on the default heap).
    small = tiles.filter(F.size(F.col(tile_col)) <= chunk)
    big = tiles.filter(F.size(F.col(tile_col)) > chunk)

    @F.arrow_udf(BinaryType())
    def _enc_whole(col):
        return _encode_tiles_batch(col, header=True)

    small_enc = small.withColumn("value", _enc_whole(F.col(tile_col))).select(
        *others, "value"
    )

    @F.arrow_udf(BinaryType())
    def _enc_block(col):
        return _encode_tiles_batch(col, header=False)

    def _asm_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("_idx")
        value = (
            TILE_MAGIC
            + struct.pack("<I", int(pdf["_npx"].iloc[0]))
            + b"".join(bytes(b) for b in pdf["_body"])
        )
        out = pdf.iloc[[0]][[f.name for f in base_fields]].copy()
        out["value"] = [value]
        return out

    # Chunk width adapts PER ROW to its element density: the real row-size
    # driver is pixel-ENTRIES (pixels x their features arrays — ~130
    # borYears per pixel at z<=2, where "16384 pixels" is a ~30-50MB row),
    # so each tile gets chunk_px = chunk_elems / its avg features-per-px,
    # clamped to [16, chunk]. And the sequence explodes INDEXES with the
    # slice computed lazily per output row — the old
    # transform-then-posexplode materialized every chunk up front, i.e. a
    # SECOND full copy of the whale tile inside one generate-input row
    # (BufferHolder.grow OOM at the 100x composed build's z<=2 writes even
    # under the task cap). The input tile still exists once per in-flight
    # row — irreducible — but nothing doubles it.
    chunk_elems = 262144  # ~4-6MB chunk rows at wire width
    chunked = (
        big.withColumn("_npx", F.size(F.col(tile_col)))
        .withColumn(
            "_cpx",
            F.expr(
                # coalesce: size(NULL) is -1 under non-ANSI semantics, so a
                # null features array would silently skew _cpx low (r8
                # advice #4); count it as 0 elements instead
                f"least(CAST({chunk} AS INT), greatest(16, CAST({chunk_elems} DIV "
                f"greatest(1L, aggregate({tile_col}, 0L, "
                f"(a, p) -> a + coalesce(size(p.features), 0)) "
                f"DIV size({tile_col})) AS INT)))"
            ),
        )
        .select(
            *others,
            "_npx",
            "_cpx",
            F.col(tile_col),
            F.posexplode(
                F.expr(f"sequence(0, (size({tile_col}) - 1) DIV _cpx)")
            ).alias("_idx", "_i"),
        )
        .select(
            *others,
            "_npx",
            "_idx",
            F.expr(f"slice({tile_col}, _idx * _cpx + 1, _cpx)").alias("_chunk"),
        )
    )
    big_enc = (
        chunked.withColumn("_body", _enc_block(F.col("_chunk")))
        .drop("_chunk")
        .groupBy(*others)
        .applyInPandas(_asm_group, asm_schema)
    )
    return small_enc.unionByName(big_enc)


# --- oracle-side wire-format reconstruction (DuckDB SQL) --------------------
#
# The driver's hash gate needs a DuckDB twin for the binary encoders. Blobs
# themselves can't cross the dialect boundary, but their HEX transcription
# can: the Spark side emits md5(lower(hex(value))) over the REAL pandas-UDF
# encoder output, and the oracle rebuilds the same lowercase hex string from
# the documented little-endian wire format (module docstring above) with
# pure SQL — printf for the integer fields and explicit IEEE-754 bit math
# for the doubles. Exact for every normal double and +/-0; subnormals
# (|v| < 2.2e-308) would mis-encode, which lat/lng can never hit. This is
# the same move that turned multimodal_featurize driver-certifiable: a
# deterministic length-prefixed format makes byte output SQL-reconstructable.


def _le_hex(expr: str, nbytes: int) -> str:
    """printf little-endian lowercase hex of a non-negative integer SQL
    expression (DuckDB)."""
    fmt = "%02x" * nbytes
    args = ", ".join(f"(({expr}) // {256 ** i}) % 256" for i in range(nbytes))
    return f"printf('{fmt}', {args})"


def u32le_hex(expr: str) -> str:
    return _le_hex(f"CAST({expr} AS BIGINT)", 4)


def i32le_hex(expr: str) -> str:
    """Two's-complement int32, little-endian."""
    wrapped = f"(((CAST({expr} AS BIGINT)) % 4294967296 + 4294967296) % 4294967296)"
    return _le_hex(wrapped, 4)


def i64le_hex(expr: str) -> str:
    """Non-negative int64 (counts), little-endian."""
    return _le_hex(f"CAST({expr} AS BIGINT)", 8)


def f64_bits_ctes(cols: list[str], src: str, keep: list[str]) -> tuple[str, dict[str, str]]:
    """CTE chain reconstructing the IEEE-754 bit pattern of each double
    column in ``cols`` (from relation ``src``, carrying ``keep`` columns
    through), as exact integer math:

    - exponent: floor(log2|v|), then corrected by one step in either
      direction so that |v| / 2^e lands in [1, 2) — log2 alone is 1-ulp
      unreliable exactly at powers of two;
    - mantissa: (|v| / 2^e - 1) * 2^52 — division by a power of two and the
      subtraction are exact, so the rounded product is the exact 52-bit
      fraction;
    - assembled as two uint32 halves (no int64 sign-bit overflow).

    Returns (cte_sql_fragment, {col: hex_expr}) where hex_expr yields the
    8-byte little-endian lowercase hex of the double.
    """
    ks = ", ".join(keep + cols)
    er = {c: f"CASE WHEN {c} = 0 THEN 0 ELSE CAST(floor(log2(abs({c}))) AS BIGINT) END" for c in cols}
    f0 = f"SELECT {ks}, " + ", ".join(f"{er[c]} AS er_{c}" for c in cols) + f" FROM {src}"
    e = {
        c: (
            f"CASE WHEN {c} = 0 THEN 0 "
            f"WHEN abs({c}) / power(2.0, er_{c}) >= 2 THEN er_{c} + 1 "
            f"WHEN abs({c}) / power(2.0, er_{c}) < 1 THEN er_{c} - 1 "
            f"ELSE er_{c} END"
        )
        for c in cols
    }
    f1 = f"SELECT {ks}, " + ", ".join(f"{e[c]} AS e_{c}" for c in cols) + " FROM _f0"
    m = {
        c: (
            f"CASE WHEN {c} = 0 THEN 0 ELSE "
            f"CAST(round((abs({c}) / power(2.0, e_{c}) - 1) * 4503599627370496.0) AS BIGINT) END"
        )
        for c in cols
    }
    f2 = (
        f"SELECT {ks}, "
        + ", ".join(f"e_{c}" for c in cols)
        + ", "
        + ", ".join(f"{m[c]} AS m_{c}" for c in cols)
        + " FROM _f1"
    )
    hi = {
        c: (
            f"CASE WHEN {c} = 0 THEN 0 ELSE "
            f"(CASE WHEN {c} < 0 THEN 2147483648 ELSE 0 END) + (e_{c} + 1023) * 1048576 + m_{c} // 4294967296 END"
        )
        for c in cols
    }
    lo = {c: f"CASE WHEN {c} = 0 THEN 0 ELSE m_{c} % 4294967296 END" for c in cols}
    f3 = (
        f"SELECT {ks}, "
        + ", ".join(f"{hi[c]} AS hi_{c}, {lo[c]} AS lo_{c}" for c in cols)
        + " FROM _f2"
    )
    ctes = f"_f0 AS ({f0}),\n_f1 AS ({f1}),\n_f2 AS ({f2}),\n_f3 AS ({f3})"
    hexes = {c: f"({_le_hex(f'lo_{c}', 4)} || {_le_hex(f'hi_{c}', 4)})" for c in cols}
    return ctes, hexes


def to_key_values(df: DataFrame, family: str, qualifier: str) -> DataFrame:
    """X6: assemble the sink's (key, family, qualifier, value) shape
    (PointMapBuilder.java:97-110, TileMapBuilder.java:185-193)."""
    return df.select(
        "key",
        F.lit(family.replace(":", "_")).alias("family"),
        F.lit(qualifier).alias("qualifier"),
        "value",
    )
