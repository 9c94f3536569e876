"""Tile addressing with buffer duplication (U4).

Reimplements ``udf/TileXYUDF.java:39-229``: a global pixel (zoom, x, y) maps to
its primary tile plus up to three duplicate addresses when it falls within the
``buffer_size`` margin of a neighboring tile (so edge pixels render in the
neighbor's buffered canvas). Wrapping is modular in both axes
(``TileXYUDF.java:208-229``): crossing the date line wraps horizontally,
crossing a pole wraps vertically; the golden wraparound cases are the
reference's only unit test (``src/test/java/.../TileXYUDFTest.java:29-59``)
and are ported verbatim in tests/test_tiling.py.

Semantics per address:

- primary: ``tileX = floor(x / tileSize)``, ``pixelX = x - tileX*tileSize``
  (in ``[0, tileSize)``), same for Y.
- duplicate in direction (dx, dy) — emitted only when the pixel lies in that
  neighbor's buffer margin (``TileXYUDF.java:110-187``): reported tile address
  wraps modulo the tile-grid dims (``numXTiles = 2^z * zzTilesHorizontal``),
  but the local pixel is computed against the *unwrapped* neighbor position,
  so it lands in the buffer margin ``[-buffer, 0)`` or
  ``[tileSize, tileSize+buffer)`` of the wrapped tile's canvas.
- results are distinct (the reference collects into a ``Set<Row>``,
  ``TileXYUDF.java:90-103``): at zoom 0 a 1x1-grid neighbor wraps to the
  primary tile itself, and identical (tile, pixel) rows collapse.

Int-safe to zoom 16 like the reference (``TileXYUDF.java:65`` comment): max
global pixel 2^16 * 2 * 512 = 2^26 fits comfortably in int32.

As in projection.py, the expression is one SQL string valid in both Spark SQL
and DuckDB, up to the struct/array constructor syntax which differs between
dialects and is abstracted by the ``dialect`` argument.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from map_spark_sql_spark.functions.projection import TILE_SCHEMAS

# (dx, dy) per direction, screen convention (y grows downward, so N = dy -1).
DIRECTIONS = {
    "N": (0, -1),
    "S": (0, 1),
    "E": (1, 0),
    "W": (-1, 0),
    "NE": (1, -1),
    "NW": (-1, -1),
    "SE": (1, 1),
    "SW": (-1, 1),
}


def grid_dims(epsg: str, zoom: int) -> tuple[int, int]:
    zh, zv = TILE_SCHEMAS[epsg]
    return (1 << zoom) * zh, (1 << zoom) * zv


def adjacent_tile_address(
    epsg: str, zoom: int, direction: str, tile_x: int, tile_y: int
) -> tuple[int, int]:
    """Plain-Python twin of the wrap rule (TileXYUDF.java:208-229); used by
    tests as the executable spec and by driver-side pyramid planning."""
    nx, ny = grid_dims(epsg, zoom)
    dx, dy = DIRECTIONS[direction]
    return (tile_x + dx + nx) % nx, (tile_y + dy + ny) % ny


def _candidates_sql(
    epsg: str, zoom: int, tile_size: int, buffer_size: int, x: str, y: str, dialect: str
) -> list[str]:
    """One SQL struct expression per candidate address (primary + 8 dirs)."""
    nx, ny = grid_dims(epsg, zoom)
    t = tile_size
    b = buffer_size

    tx = f"CAST(floor(({x}) / {t}) AS INTEGER)"
    ty = f"CAST(floor(({y}) / {t}) AS INTEGER)"
    lx = f"(({x}) - {tx} * {t})"
    ly = f"(({y}) - {ty} * {t})"

    def struct(tile_x: str, tile_y: str, px: str, py: str) -> str:
        fields = [
            ("tileX", f"CAST({tile_x} AS INTEGER)"),
            ("tileY", f"CAST({tile_y} AS INTEGER)"),
            ("pixelX", f"CAST({px} AS INTEGER)"),
            ("pixelY", f"CAST({py} AS INTEGER)"),
        ]
        if dialect == "spark":
            inner = ", ".join(f"'{n}', {v}" for n, v in fields)
            return f"named_struct({inner})"
        inner = ", ".join(f"'{n}': {v}" for n, v in fields)
        return f"{{{inner}}}"

    # buffer-margin gate per direction (TileXYUDF.java:110-187)
    conds = {
        "N": f"({ly} < {b})",
        "S": f"({ly} >= {t - b})",
        "E": f"({lx} >= {t - b})",
        "W": f"({lx} < {b})",
    }
    conds["NE"] = f"({conds['N']} AND {conds['E']})"
    conds["NW"] = f"({conds['N']} AND {conds['W']})"
    conds["SE"] = f"({conds['S']} AND {conds['E']})"
    conds["SW"] = f"({conds['S']} AND {conds['W']})"

    out = [struct(tx, ty, lx, ly)]
    for d, (dx, dy) in DIRECTIONS.items():
        # wrapped address for reporting; unwrapped position for local pixels
        wrapped_x = f"(({tx} + {dx} + {nx}) % {nx})"
        wrapped_y = f"(({ty} + {dy} + {ny}) % {ny})"
        raw_px = f"(({x}) - ({tx} + {dx}) * {t})"
        raw_py = f"(({y}) - ({ty} + {dy}) * {t})"
        out.append(f"CASE WHEN {conds[d]} THEN {struct(wrapped_x, wrapped_y, raw_px, raw_py)} END")
    return out


def tile_addresses_sql(
    epsg: str,
    zoom: int,
    tile_size: int,
    buffer_size: int,
    x: str,
    y: str,
    dialect: str,
) -> str:
    """Array-of-structs SQL expression (null candidates dropped).

    No explicit distinct is needed, unlike the reference's ``Set<Row>``
    (``TileXYUDF.java:90-103``): because local pixels are computed against the
    *unwrapped* neighbor, every candidate carries a direction-unique pixel
    offset ``(-dx*tileSize, -dy*tileSize)``, so the 9 candidates are pairwise
    distinct whenever ``2*buffer_size <= tile_size`` (asserted; prod geometry
    is 64 vs 512). The reference's wrapped-local computation can collide at
    zoom 0 (neighbor == self), which silently drops the dateline/pole buffer
    duplicate there — ours keeps it, which renders correctly.
    """
    if 2 * buffer_size > tile_size:
        raise ValueError("buffer_size must be <= tile_size/2 (distinctness invariant)")
    cands = _candidates_sql(epsg, zoom, tile_size, buffer_size, x, y, dialect)
    if dialect == "spark":
        arr = f"array({', '.join(cands)})"
        return f"filter({arr}, c -> c IS NOT NULL)"
    arr = f"[{', '.join(cands)}]"
    return f"list_filter({arr}, c -> c IS NOT NULL)"


def tile_addresses(
    epsg: str, zoom: int, tile_size: int, buffer_size: int, x: str, y: str
) -> Column:
    """``array<struct<tileX,tileY,pixelX,pixelY>>`` — explode downstream, as the
    reference does at ``TileMapBuilder.java:150-153``."""
    return F.expr(tile_addresses_sql(epsg, zoom, tile_size, buffer_size, x, y, "spark"))
