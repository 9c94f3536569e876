"""The driver-contract query registry.

Each entry pairs a Spark DataFrame builder with a DuckDB oracle SQL string
over the same parquet tables, per the ``__spark_entry__.py`` contract
(BASELINE.md t2). Naming discipline: every computed column is aliased to the
same name on both sides, because the driver's comparator sorts columns by
name before hashing values.

The reference pipeline operates on a GBIF occurrence table the driver's
testdata doesn't contain, so the map-pipeline queries derive a deterministic
occurrence-shaped relation from ``events`` (the ``OCC`` CTE below) — the
derivation is a dialect-shared SQL fragment, so Spark and DuckDB see the
same input rows bit-for-bit. Float-valued aggregates are rounded on both
sides; list-valued results are encoded as sorted integer-string blobs
(double->string formatting differs between engines; int strings don't).

Query -> SURVEY.md §2 operator mapping is given per entry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from map_spark_sql_spark.functions import keys as K
from map_spark_sql_spark.functions import encode as E
from map_spark_sql_spark.functions import projection as PJ
from map_spark_sql_spark.functions import tiling as TL
from map_spark_sql_spark.sources.readers import load_table

# ---------------------------------------------------------------------------
# derived occurrence relation (dialect-shared)
# ---------------------------------------------------------------------------

TILES_THRESHOLD = 1000  # routing split for the sf0.01 harness
TILE_SIZE = 512
BUFFER = 64
SALT_MOD = 10


def _occ_fields(d: str) -> dict[str, str]:
    """Column -> SQL expression over `events`, valid in both dialects except
    the array constructor, switched on ``d`` in {'spark','duckdb'}."""
    s = "STRING"  # accepted by both engines' CAST
    net_arr = (
        "array('net-' || CAST(event_id % 3 AS STRING))"
        if d == "spark"
        else "['net-' || CAST(event_id % 3 AS STRING)]"
    )
    return {
        "datasetKey": f"'ds-' || CAST(event_id % 20 AS {s})",
        "publishingOrgKey": f"'org-' || CAST(user_id % 7 AS {s})",
        "publishingCountry": f"'C' || CAST(user_id % 10 AS {s})",
        "networkKey": f"CASE WHEN event_id % 7 = 0 THEN {net_arr} END",
        "countryCode": "event_type",
        "basisOfRecord": (
            "CASE user_id % 3 WHEN 0 THEN 'HUMAN_OBSERVATION' "
            "WHEN 1 THEN 'OBSERVATION' ELSE 'PRESERVED_SPECIMEN' END"
        ),
        "decimalLatitude": (
            "CASE WHEN event_id % 83 = 0 THEN NULL ELSE "
            "CAST(user_id % 170 AS DOUBLE) - 85.0 + (value - floor(value)) END"
        ),
        "decimalLongitude": (
            "CASE WHEN event_id % 79 = 0 THEN NULL ELSE "
            "CAST(event_id % 358 AS DOUBLE) - 179.0 + (value - floor(value)) END"
        ),
        "kingdomKey": "CAST(1 + user_id % 3 AS INTEGER)",
        "phylumKey": "CAST(NULL AS INTEGER)",
        "classKey": "CAST(NULL AS INTEGER)",
        "orderKey": "CAST(NULL AS INTEGER)",
        "familyKey": "CAST(NULL AS INTEGER)",
        "genusKey": f"CASE WHEN user_id % 17 = 0 THEN NULL ELSE CAST(10 + user_id % 40 AS INTEGER) END",
        "speciesKey": f"CASE WHEN user_id % 13 = 0 THEN NULL ELSE CAST(10 + user_id % 40 AS INTEGER) END",
        "taxonKey": f"CASE WHEN user_id % 13 = 0 THEN NULL ELSE CAST(10 + user_id % 40 AS INTEGER) END",
        "year": "CASE WHEN event_id % 11 = 0 THEN NULL ELSE CAST(year(ts) AS INTEGER) END",
        "occurrenceStatus": "CASE WHEN event_id % 97 = 0 THEN 'ABSENT' ELSE 'PRESENT' END",
        "hasGeospatialIssues": "(event_id % 89 = 0)",
    }


# P2 quality predicate (MapBuilder.java:160-164), over the derived columns
_QUALITY = (
    "decimalLatitude IS NOT NULL AND decimalLongitude IS NOT NULL "
    "AND hasGeospatialIssues = false AND occurrenceStatus = 'PRESENT'"
)

# U1 dims on the derived occurrence (MapKeysUDF.java:114-127)
_DIMS = [
    ("TAXON", "kingdomKey"),
    ("TAXON", "genusKey"),
    ("TAXON", "speciesKey"),
    ("TAXON", "taxonKey"),
    ("DATASET", "datasetKey"),
    ("PUBLISHER", "publishingOrgKey"),
    ("COUNTRY", "countryCode"),
    ("PUBLISHING_COUNTRY", "publishingCountry"),
]


def occurrence_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived occurrence DataFrame (Spark side)."""
    ev = load_table(spark, sf_dir, "events")
    fields = _occ_fields("spark")
    return ev.select(*[F.expr(sql).alias(name) for name, sql in fields.items()])


def occurrence_cte(d: str) -> str:
    """`occ` CTE text (oracle side embeds d='duckdb')."""
    fields = _occ_fields(d)
    cols = ",\n    ".join(f"{sql} AS {name}" for name, sql in fields.items())
    return f"SELECT\n    {cols}\n  FROM events"


def ingested_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return occurrence_df(spark, sf_dir).filter(_QUALITY)


def _map_keys_col() -> F.Column:
    return K.map_keys(
        [(t, F.col(c)) for t, c in _DIMS], network=F.col("networkKey")
    )


def _map_keys_sql() -> str:
    return K.map_keys_sql(_DIMS, network_sql="networkKey")


def _exploded_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        ingested_df(spark, sf_dir)
        .withColumn("mapKey", F.explode(_map_keys_col()))
        .select(
            "mapKey",
            F.col("decimalLatitude").alias("lat"),
            F.col("decimalLongitude").alias("lng"),
            E.encode_bor_year(F.col("basisOfRecord"), F.col("year")).alias("borYear"),
        )
    )


def _exploded_cte() -> str:
    """`expl` CTE: (mapKey, lat, lng, borYear) fan-out (oracle side)."""
    return (
        f"SELECT u.mapKey, decimalLatitude AS lat, decimalLongitude AS lng,\n"
        f"       {E.encode_bor_year_sql('basisOfRecord', 'year')} AS borYear\n"
        f"  FROM (SELECT *, unnest({_map_keys_sql()}) AS mapKey FROM ingested) u"
    )


def _oracle(body: str) -> str:
    """Wrap an oracle query body with the shared CTE prelude."""
    return (
        f"WITH occ AS (\n  {occurrence_cte('duckdb')}\n),\n"
        f"ingested AS (SELECT * FROM occ WHERE {_QUALITY}),\n"
        f"expl AS (\n  {_exploded_cte()}\n),\n"
        f"stats AS (SELECT mapKey, count(*) AS occCount FROM expl GROUP BY mapKey),\n"
        f"large AS (SELECT mapKey FROM stats WHERE occCount >= {TILES_THRESHOLD})\n"
        f"{body}"
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# --- S1/P1/P2/P6: scan, projection, quality predicate ----------------------


@q(
    "occ_ingest_filter",
    _oracle(
        "SELECT datasetKey, countryCode, basisOfRecord, "
        "CAST(floor(lat * 10000) AS BIGINT) AS lat_px, "
        "CAST(floor(lng * 10000) AS BIGINT) AS lng_px, year "
        "FROM (SELECT *, decimalLatitude AS lat, decimalLongitude AS lng FROM ingested) t"
    ),
)
def occ_ingest_filter(spark, sf_dir):
    """S1+P1+P2+P6 (MapBuilder.java:134-164): scan -> project -> quality filter.
    Doubles are floored to int micro-degrees for engine-portable hashing."""
    return ingested_df(spark, sf_dir).select(
        "datasetKey",
        "countryCode",
        "basisOfRecord",
        F.floor(F.col("decimalLatitude") * 10000).alias("lat_px"),
        F.floor(F.col("decimalLongitude") * 10000).alias("lng_px"),
        "year",
    )


# --- U1/U6/A1: map-key fan-out + stats --------------------------------------


@q("mapkeys_stats", _oracle("SELECT mapKey, occCount FROM stats"))
def mapkeys_stats(spark, sf_dir):
    """U1 explode -> A1 count per mapKey (MapBuilder.java:182-196)."""
    return (
        _exploded_df(spark, sf_dir)
        .groupBy("mapKey")
        .agg(F.count(F.lit(1)).alias("occCount"))
    )


@q(
    "mapkeys_threshold",
    _oracle(f"SELECT mapKey, occCount FROM stats WHERE occCount >= {TILES_THRESHOLD}"),
)
def mapkeys_threshold(spark, sf_dir):
    """P3 HAVING-style threshold filter (MapBuilder.java:197)."""
    return mapkeys_stats(spark, sf_dir).filter(F.col("occCount") >= TILES_THRESHOLD)


# --- J1/J2: broadcast semi/anti routing ------------------------------------


@q(
    "route_tiles_semi",
    _oracle(
        "SELECT mapKey, count(*) AS n FROM expl "
        "WHERE mapKey IN (SELECT mapKey FROM large) GROUP BY mapKey"
    ),
)
def route_tiles_semi(spark, sf_dir):
    """J1 broadcast left-semi join (approve mode, MapKeysUDF.java:134-144)."""
    expl = _exploded_df(spark, sf_dir)
    large = (
        expl.groupBy("mapKey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= TILES_THRESHOLD)
        .select("mapKey")
    )
    return (
        expl.join(F.broadcast(large), "mapKey", "left_semi")
        .groupBy("mapKey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@q(
    "route_points_anti",
    _oracle(
        "SELECT mapKey, count(*) AS n FROM expl "
        "WHERE mapKey NOT IN (SELECT mapKey FROM large) GROUP BY mapKey"
    ),
)
def route_points_anti(spark, sf_dir):
    """J2 broadcast left-anti join (deny mode, PointMapBuilder.java:49)."""
    expl = _exploded_df(spark, sf_dir)
    large = (
        expl.groupBy("mapKey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= TILES_THRESHOLD)
        .select("mapKey")
    )
    return (
        expl.join(F.broadcast(large), "mapKey", "left_anti")
        .groupBy("mapKey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- U2/A2: borYear encoding + location aggregation -------------------------


@q(
    "points_counts",
    _oracle(
        "SELECT mapKey, CAST(floor(lat * 1000) AS BIGINT) AS latk, "
        "CAST(floor(lng * 1000) AS BIGINT) AS lngk, borYear, count(*) AS occCount "
        "FROM expl WHERE mapKey NOT IN (SELECT mapKey FROM large) "
        "GROUP BY mapKey, latk, lngk, borYear"
    ),
)
def points_counts(spark, sf_dir):
    """A2 count per (view, location, borYear) — PointMapBuilder.java:53-71.
    Locations keyed at milli-degree so grouping keys are integers."""
    expl = _exploded_df(spark, sf_dir)
    large = (
        expl.groupBy("mapKey")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= TILES_THRESHOLD)
        .select("mapKey")
    )
    return (
        expl.join(F.broadcast(large), "mapKey", "left_anti")
        .groupBy(
            "mapKey",
            F.floor(F.col("lat") * 1000).alias("latk"),
            F.floor(F.col("lng") * 1000).alias("lngk"),
            "borYear",
        )
        .agg(F.count(F.lit(1)).alias("occCount"))
    )


@q(
    "points_features",
    _oracle(
        "SELECT mapKey, string_agg(feat, '|' ORDER BY feat) AS features FROM ("
        "  SELECT mapKey, CAST(floor(lat*1000) AS BIGINT) || ':' || CAST(floor(lng*1000) AS BIGINT)"
        "         || ':' || CAST(borYear AS STRING) || ':' || CAST(count(*) AS STRING) AS feat"
        "  FROM expl WHERE mapKey NOT IN (SELECT mapKey FROM large)"
        "  GROUP BY mapKey, floor(lat*1000), floor(lng*1000), borYear"
        ") GROUP BY mapKey"
    ),
)
def points_features(spark, sf_dir):
    """A6 collect_list(struct) per view (PointMapBuilder.java:74-80), encoded
    as a sorted '|'-joined string of int features for order-insensitive
    cross-engine hashing (SURVEY §7 caveat d)."""
    counts = points_counts(spark, sf_dir)
    feat = F.concat_ws(
        ":",
        F.col("latk").cast("string"),
        F.col("lngk").cast("string"),
        F.col("borYear").cast("string"),
        F.col("occCount").cast("string"),
    )
    return (
        counts.withColumn("feat", feat)
        .groupBy("mapKey")
        .agg(F.array_join(F.array_sort(F.collect_list("feat")), "|").alias("features"))
    )


# --- U5: salted keys --------------------------------------------------------


@q(
    "points_salted_keys",
    _oracle(
        f"SELECT {K.salted_key_sql('mapKey', modulus=SALT_MOD)} AS key, "
        "count(*) AS n FROM expl GROUP BY key"
    ),
)
def points_salted_keys(spark, sf_dir):
    """U5 point-key variant (HBaseKeyUDF.java:54-60): fixed-width salt prefix
    from the documented md5-based hash convention."""
    return (
        _exploded_df(spark, sf_dir)
        .select(K.salted_key(F.col("mapKey"), modulus=SALT_MOD).alias("key"))
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n"))
    )


# --- U3/A4/P4: global pixel + rollup (t1), per CRS --------------------------


def _t1_query(epsg: str, zoom: int):
    xs, ys = PJ.global_pixel_xy_sql(epsg, zoom, TILE_SIZE, "lat", "lng")

    def spark_fn(spark, sf_dir):
        expl = _exploded_df(spark, sf_dir)
        return (
            expl.withColumn("px", F.expr(xs))
            .withColumn("py", F.expr(ys))
            .filter("px IS NOT NULL")
            .groupBy("mapKey", "px", "py", "borYear")
            .agg(F.count(F.lit(1)).alias("occCount"))
        )

    oracle = _oracle(
        f"SELECT mapKey, px, py, borYear, count(*) AS occCount FROM ("
        f"  SELECT mapKey, borYear, {xs} AS px, {ys} AS py FROM expl"
        f") t WHERE px IS NOT NULL GROUP BY mapKey, px, py, borYear"
    )
    return spark_fn, oracle


for _epsg, _zoom, _name in [
    ("EPSG:3857", 4, "t1_mercator_z4"),
    ("EPSG:4326", 2, "t1_wgs84_z2"),
    ("EPSG:3575", 1, "t1_arctic_z1"),
    ("EPSG:3031", 1, "t1_antarctic_z1"),
]:
    _fn, _orc = _t1_query(_epsg, _zoom)
    _fn.__doc__ = f"U3+A4 t1 stage for {_epsg} z{_zoom} (TileMapBuilder.java:117-126)."
    q(_name, _orc)(_fn)


# --- P5/S4: Antarctic input subset ------------------------------------------


@q(
    "antarctic_subset",
    _oracle(
        "SELECT countryCode, count(*) AS n, CAST(floor(min(decimalLatitude)*10000) AS BIGINT) AS min_latk "
        "FROM ingested WHERE decimalLatitude <= 1 GROUP BY countryCode"
    ),
)
def antarctic_subset(spark, sf_dir):
    """P5 range predicate + S4 filtered CTAS shape (TileMapBuilder.java:59-62,203-211)."""
    return (
        ingested_df(spark, sf_dir)
        .filter(F.col("decimalLatitude") <= 1)
        .groupBy("countryCode")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.floor(F.min("decimalLatitude") * 10000).alias("min_latk"),
        )
    )


# --- U4/A5/A6: tile addressing + per-tile collection (t2/t3) ----------------


def _t3_query(epsg: str, zoom: int):
    xs, ys = PJ.global_pixel_xy_sql(epsg, zoom, TILE_SIZE, "lat", "lng")
    s_tiles = TL.tile_addresses_sql(epsg, zoom, TILE_SIZE, BUFFER, "px", "py", "spark")
    d_tiles = TL.tile_addresses_sql(epsg, zoom, TILE_SIZE, BUFFER, "px", "py", "duckdb")

    def spark_fn(spark, sf_dir):
        expl = _exploded_df(spark, sf_dir)
        t1 = (
            expl.withColumn("px", F.expr(xs))
            .withColumn("py", F.expr(ys))
            .filter("px IS NOT NULL")
            .groupBy("mapKey", "px", "py", "borYear")
            .agg(F.count(F.lit(1)).alias("occCount"))
        )
        t3 = (
            t1.withColumn("t", F.explode(F.expr(s_tiles)))
            .groupBy("mapKey", F.col("t.tileX").alias("x"), F.col("t.tileY").alias("y"))
            .agg(
                F.count(F.lit(1)).alias("nFeatures"),
                F.sum("occCount").alias("occCount"),
            )
        )
        return t3.withColumn(
            "key",
            K.salted_key(F.col("mapKey"), F.lit(zoom), F.col("x"), F.col("y"), modulus=SALT_MOD),
        )

    oracle = _oracle(
        f"SELECT mapKey, x, y, nFeatures, occCount, "
        f"{K.salted_key_sql('mapKey', str(zoom), 'x', 'y', modulus=SALT_MOD)} AS key FROM ("
        f"  SELECT mapKey, u.tileX AS x, u.tileY AS y, count(*) AS nFeatures, sum(occCount) AS occCount"
        f"  FROM ("
        f"    SELECT mapKey, px, py, borYear, occCount, unnest({d_tiles}) AS u FROM ("
        f"      SELECT mapKey, px, py, borYear, count(*) AS occCount FROM ("
        f"        SELECT mapKey, borYear, {xs} AS px, {ys} AS py FROM expl"
        f"      ) a WHERE px IS NOT NULL GROUP BY mapKey, px, py, borYear"
        f"    ) b"
        f"  ) c GROUP BY mapKey, x, y"
        f") d"
    )
    return spark_fn, oracle


for _epsg, _zoom, _name in [
    ("EPSG:3857", 2, "tiles_mercator_z2"),
    ("EPSG:4326", 1, "tiles_wgs84_z1"),
]:
    _fn, _orc = _t3_query(_epsg, _zoom)
    _fn.__doc__ = (
        f"U4 buffered tile fan-out + A6 per-tile aggregation + U5 tile key for "
        f"{_epsg} z{_zoom} (TileMapBuilder.java:113-158)."
    )
    q(_name, _orc)(_fn)


# --- pyramid roll-up equivalence (SURVEY §4 optimization, oracle = recompute)


@q(
    "pyramid_rollup_z3",
    _oracle(
        # oracle computes z3 directly from the base data
        "SELECT mapKey, px, py, borYear, count(*) AS occCount FROM ("
        f"  SELECT mapKey, borYear, {PJ.global_pixel_xy_sql('EPSG:3857', 3, TILE_SIZE, 'lat', 'lng')[0]} AS px, "
        f"{PJ.global_pixel_xy_sql('EPSG:3857', 3, TILE_SIZE, 'lat', 'lng')[1]} AS py FROM expl"
        ") t WHERE px IS NOT NULL GROUP BY mapKey, px, py, borYear"
    ),
)
def pyramid_rollup_z3(spark, sf_dir):
    """Derives z3 t1 from the z4 aggregate (pixel z = pixel z+1 div 2) — the
    scan-once pyramid optimization; the oracle recomputes z3 from base,
    pinning the equivalence (SURVEY §4 'aggregation pyramid caveat')."""
    xs, ys = PJ.global_pixel_xy_sql("EPSG:3857", 4, TILE_SIZE, "lat", "lng")
    expl = _exploded_df(spark, sf_dir)
    z4 = (
        expl.withColumn("px", F.expr(xs))
        .withColumn("py", F.expr(ys))
        .filter("px IS NOT NULL")
        .groupBy("mapKey", "px", "py", "borYear")
        .agg(F.count(F.lit(1)).alias("occCount"))
    )
    return (
        z4.withColumn("px", F.expr("CAST(px / 2 AS INTEGER)"))
        .withColumn("py", F.expr("CAST(py / 2 AS INTEGER)"))
        .groupBy("mapKey", "px", "py", "borYear")
        .agg(F.sum("occCount").cast("bigint").alias("occCount"))
    )


# --- U2 decode round-trip ---------------------------------------------------


@q(
    "boryear_decode",
    _oracle(
        f"SELECT borYear, {E.decode_year_sql('borYear')} AS yr, "
        f"{E.decode_bor_sql('borYear')} AS bor, count(*) AS n "
        "FROM expl GROUP BY borYear"
    ),
)
def boryear_decode(spark, sf_dir):
    """U2 encode->decode inverse surfaced as a query (EncodeBorYearUDF.java:58-71)."""
    return (
        _exploded_df(spark, sf_dir)
        .groupBy("borYear")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "borYear",
            E.decode_year(F.col("borYear")).alias("yr"),
            E.decode_bor(F.col("borYear")).alias("bor"),
            "n",
        )
    )
