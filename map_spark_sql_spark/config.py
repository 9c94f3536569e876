"""Pipeline configuration.

Mirrors the reference's YAML-bound config POJO
(``workflow/MapConfiguration.java:28-62``, ``src/main/resources/example.yml:14-31``)
as a plain dataclass. Field semantics:

- ``tiles_threshold``: map views with >= this many occurrences are routed to the
  tile-pyramid path; smaller views are served as raw point features
  (``MapBuilder.java:63``, prod 250_000 / example 100_000).
- ``tile_size`` / ``tile_buffer_size``: pixel geometry; buffer is the margin of a
  tile into which neighboring tiles' edge pixels are duplicated
  (``example.yml:18-24``; buffer = tileSize/8 in prod).
- ``max_zoom``: deepest pyramid level; int-pixel addressing is safe to zoom 16
  (``udf/TileXYUDF.java:65`` comment).
- ``key_salt_modulus``: number of salt buckets prefixed onto sink keys, aligning
  the final shuffle with the sink's partitioning (``MapBuilder.java:62``,
  ``SaltPrefixPartitioner.java:21-37``; prod 100, example 10).
- ``projections``: CRSs to build pyramids for (``TileMapBuilder.java:55-62``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


DEFAULT_PROJECTIONS = ("EPSG:3857", "EPSG:4326", "EPSG:3575", "EPSG:3031")


@dataclass(frozen=True)
class MapConfiguration:
    tiles_threshold: int = 100_000
    tile_size: int = 512
    tile_buffer_size: int = 64
    max_zoom: int = 16
    key_salt_modulus: int = 10
    projections: tuple[str, ...] = field(default=DEFAULT_PROJECTIONS)
    # Spark-side knobs (our addition): target shuffle partitions for the
    # materialization write; None => leave it to AQE.
    ingest_partitions: int | None = None

    @property
    def salt_width(self) -> int:
        """Digits in the zero-padded salt prefix: salt of modulus 100 -> '07'.

        Matches the fixed-width convention of the reference's ModulusSalt
        (used at ``workflow/PrepareBackfill.java:49-51``).
        """
        return len(str(self.key_salt_modulus - 1))
