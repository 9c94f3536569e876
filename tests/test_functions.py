"""Unit tests for the native expression factories, including Spark<->DuckDB
parity of every dialect-shared formula (the mechanism the correctness oracle
relies on)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from map_spark_sql_spark.functions import keys, encode, projection, tiling


class TestStableHashAndSalt:
    def test_hash_parity_with_duckdb(self, spark):
        samples = ["0:0", "1:212", "6:net-1", "x", "", "1:212:3:1:2"]
        df = spark.createDataFrame([(s,) for s in samples], ["k"])
        got = {r.k: r.h for r in df.select("k", keys.stable_hash(F.col("k")).alias("h")).collect()}
        for s in samples:
            want = duckdb.sql(f"select {keys.stable_hash_sql('?')}", params=[s]).fetchone()[0]
            assert got[s] == want

    def test_salted_key_shape(self, spark):
        df = spark.createDataFrame([("1:212",)], ["mk"])
        # tile variant (HBaseKeyUDF.java:43-50)
        r = df.select(
            keys.salted_key(F.col("mk"), F.lit(3), F.lit(1), F.lit(2), modulus=100).alias("k")
        ).collect()[0]
        salt, rest = r.k.split(":", 1)
        assert rest == "1:212:3:1:2"
        assert len(salt) == 2 and 0 <= int(salt) < 100
        # point variant (HBaseKeyUDF.java:54-60)
        r2 = df.select(keys.salted_key(F.col("mk"), modulus=10).alias("k")).collect()[0]
        assert r2.k.split(":", 1)[1] == "1:212"

    def test_salt_is_deterministic_and_uniformish(self, spark):
        df = spark.range(1000).select(F.concat(F.lit("1:"), F.col("id")).alias("k"))
        salts = df.select(keys.salt_of(F.col("k"), 10).alias("s")).groupBy("s").count().collect()
        assert len(salts) == 10  # all buckets hit
        assert all(50 < r["count"] < 200 for r in salts)


class TestMapKeys:
    def test_fanout_null_skip_and_distinct(self, spark):
        # speciesKey == taxonKey must collapse (HashSet semantics,
        # MapKeysUDF.java:114); nulls skipped (:149-151); 0:0 always (:115).
        df = spark.createDataFrame(
            [(212, 212, "DK", None), (None, None, None, ["n1", "n1", "n2"])],
            ["sk", "tk", "cc", "nk"],
        )
        mk = keys.map_keys(
            [("TAXON", F.col("sk")), ("TAXON", F.col("tk")), ("COUNTRY", F.col("cc"))],
            network=F.col("nk"),
        )
        got = [sorted(r.m) for r in df.select(mk.alias("m")).collect()]
        assert got[0] == ["0:0", "1:212", "4:DK"]
        assert got[1] == ["0:0", "6:n1", "6:n2"]

    def test_approve_deny(self, spark):
        df = spark.createDataFrame([(212, "DK")], ["tk", "cc"])
        dims = [("TAXON", F.col("tk")), ("COUNTRY", F.col("cc"))]
        ap = df.select(keys.map_keys(dims, approve=["1:212"]).alias("m")).collect()[0].m
        assert sorted(ap) == ["1:212"]
        de = df.select(keys.map_keys(dims, deny=["1:212"]).alias("m")).collect()[0].m
        assert sorted(de) == ["0:0", "4:DK"]


class TestEncodeBorYear:
    def test_encode_known_values(self, spark):
        df = spark.createDataFrame(
            [("PRESERVED_SPECIMEN", 1999), ("FOSSIL_SPECIMEN", None), ("HUMAN_OBSERVATION", 0)],
            ["b", "y"],
        )
        got = [r.e for r in df.select(encode.encode_bor_year(F.col("b"), F.col("y")).alias("e")).collect()]
        assert got == [199900, 8, 3]

    def test_roundtrip_inverse(self, spark):
        # encode -> (year, bor) inverse property (EncodeBorYearUDF.java:58-71)
        rows = [(b, y) for b in encode.BOR_MAPPING for y in (None, 1500, 2025)]
        df = spark.createDataFrame(rows, ["b", "y"])
        out = (
            df.withColumn("e", encode.encode_bor_year(F.col("b"), F.col("y")))
            .select(
                "b", "y",
                encode.decode_bor(F.col("e")).alias("b2"),
                encode.decode_year(F.col("e")).alias("y2"),
            )
            .collect()
        )
        for r in out:
            assert r.b2 == r.b
            assert r.y2 == r.y

    def test_sql_twin_parity(self, spark):
        rows = [(b, y) for b in encode.BOR_MAPPING for y in (None, 1999)]
        df = spark.createDataFrame(rows, ["b", "y"])
        got = [r.e for r in df.select(encode.encode_bor_year(F.col("b"), F.col("y")).alias("e")).collect()]
        con = duckdb.connect()
        con.execute("create table t(b varchar, y int)")
        con.executemany("insert into t values (?,?)", rows)
        want = [r[0] for r in con.sql(f"select {encode.encode_bor_year_sql('b','y')} from t").fetchall()]
        assert got == want


PROJ_POINTS = [
    (0.0, 0.0), (52.0, 10.0), (-52.0, -110.0), (85.0, 179.999), (-85.0, -179.999),
    (85.06, 0.0), (-85.06, 0.0), (89.99, 10.0), (-89.99, 10.0), (90.0, 0.0),
    (-90.0, 0.0), (0.0, 180.0), (0.0, -180.0), (None, 5.0), (5.0, None), (1.0, 2.0),
]


class TestGlobalPixel:
    @pytest.mark.parametrize("epsg", list(projection.TILE_SCHEMAS))
    @pytest.mark.parametrize("zoom", [0, 1, 8])
    def test_duckdb_parity(self, spark, epsg, zoom):
        df = spark.createDataFrame(PROJ_POINTS, ["lat", "lng"])
        xs, ys = projection.global_pixel_xy_sql(epsg, zoom, 512, "lat", "lng")
        df.createOrReplaceTempView("pp")
        got = [(r.x, r.y) for r in spark.sql(f"select {xs} as x, {ys} as y from pp").collect()]
        con = duckdb.connect()
        con.execute("create table pp(lat double, lng double)")
        con.executemany("insert into pp values (?,?)", PROJ_POINTS)
        want = con.sql(f"select {xs} as x, {ys} as y from pp").fetchall()
        assert got == [tuple(w) for w in want]

    def test_mercator_known_values(self, spark):
        # z0, 512px: (0,0) -> center pixel (256, 256); lat clip -> NULL
        df = spark.createDataFrame([(0.0, 0.0), (86.0, 0.0), (-86.0, 0.0)], ["lat", "lng"])
        out = df.select(projection.global_pixel("EPSG:3857", 0, 512, "lat", "lng").alias("xy")).collect()
        assert (out[0].xy.x, out[0].xy.y) == (256, 256)
        assert out[1].xy is None and out[2].xy is None

    def test_4326_schema_is_2x1(self, spark):
        # z0: world is 1024x512; (0,0) -> (512, 256); poles plottable
        df = spark.createDataFrame([(0.0, 0.0), (90.0, -180.0), (-90.0, 180.0)], ["lat", "lng"])
        out = df.select(projection.global_pixel("EPSG:4326", 0, 512, "lat", "lng").alias("xy")).collect()
        assert (out[0].xy.x, out[0].xy.y) == (512, 256)
        assert (out[1].xy.x, out[1].xy.y) == (0, 0)
        assert (out[2].xy.x, out[2].xy.y) == (1023, 511)

    def test_polar_hemisphere_gating(self, spark):
        df = spark.createDataFrame([(45.0, 0.0), (-45.0, 0.0), (90.0, 0.0), (-90.0, 0.0)], ["lat", "lng"])
        north = df.select(projection.global_pixel("EPSG:3575", 0, 512, "lat", "lng").alias("xy")).collect()
        south = df.select(projection.global_pixel("EPSG:3031", 0, 512, "lat", "lng").alias("xy")).collect()
        assert north[0].xy is not None and north[1].xy is None
        assert south[0].xy is None and south[1].xy is not None
        # poles project to the exact center of the world square
        assert (north[2].xy.x, north[2].xy.y) == (256, 256)
        assert (south[3].xy.x, south[3].xy.y) == (256, 256)


class TestTileAddresses:
    def test_golden_wraparound_cases(self):
        """Port of TileXYUDFTest.java:29-59 — the reference's only unit test."""
        adj = tiling.adjacent_tile_address
        for epsg in ("EPSG:3857", "EPSG:3575", "EPSG:3031"):
            for d in tiling.DIRECTIONS:
                assert adj(epsg, 0, d, 0, 0) == (0, 0)
            assert adj(epsg, 1, "N", 0, 0) == (0, 1)
            assert adj(epsg, 1, "E", 1, 0) == (0, 0)
        assert tiling.adjacent_tile_address("EPSG:4326", 0, "N", 0, 0) == (0, 0)
        assert tiling.adjacent_tile_address("EPSG:4326", 0, "S", 0, 0) == (0, 0)
        assert tiling.adjacent_tile_address("EPSG:4326", 0, "N", 1, 0) == (1, 0)
        assert tiling.adjacent_tile_address("EPSG:4326", 0, "S", 1, 0) == (1, 0)
        assert tiling.adjacent_tile_address("EPSG:4326", 0, "W", 0, 0) == (1, 0)
        assert tiling.adjacent_tile_address("EPSG:4326", 0, "E", 1, 0) == (0, 0)

    def test_interior_pixel_single_address(self, spark):
        df = spark.createDataFrame([(256, 256)], ["x", "y"])
        out = df.select(
            tiling.tile_addresses("EPSG:3857", 1, 512, 64, "x", "y").alias("t")
        ).collect()[0].t
        assert len(out) == 1
        assert (out[0].tileX, out[0].tileY, out[0].pixelX, out[0].pixelY) == (0, 0, 256, 256)

    def test_corner_pixel_four_addresses(self, spark):
        # pixel at (510, 510) on z1 tile (0,0): E, S, SE duplicates
        df = spark.createDataFrame([(510, 510)], ["x", "y"])
        out = df.select(
            tiling.tile_addresses("EPSG:3857", 1, 512, 64, "x", "y").alias("t")
        ).collect()[0].t
        addrs = {(t.tileX, t.tileY, t.pixelX, t.pixelY) for t in out}
        assert addrs == {
            (0, 0, 510, 510),
            (1, 0, -2, 510),   # E neighbor, west buffer
            (0, 1, 510, -2),   # S neighbor, north buffer
            (1, 1, -2, -2),    # SE neighbor corner
        }

    def test_dateline_wrap_duplicate(self, spark):
        # z1 3857: global x=1020 is on tile 1 near the east edge; its E
        # neighbor wraps to tile 0 across the date line with pixel -4.
        df = spark.createDataFrame([(1020, 256)], ["x", "y"])
        out = df.select(
            tiling.tile_addresses("EPSG:3857", 1, 512, 64, "x", "y").alias("t")
        ).collect()[0].t
        addrs = {(t.tileX, t.tileY, t.pixelX, t.pixelY) for t in out}
        assert (1, 0, 508, 256) in addrs
        assert (0, 0, -4, 256) in addrs

    def test_duckdb_parity(self, spark):
        rows = [(x, y) for x in (0, 5, 63, 64, 447, 448, 511, 512, 1000, 1023)
                for y in (0, 100, 448, 1023)]
        df = spark.createDataFrame(rows, ["x", "y"])
        df.createOrReplaceTempView("pxls")
        con = duckdb.connect()
        con.execute("create table pxls(x int, y int)")
        con.executemany("insert into pxls values (?,?)", rows)
        for epsg in ("EPSG:3857", "EPSG:4326"):
            for zoom in (0, 1):
                s_sql = tiling.tile_addresses_sql(epsg, zoom, 512, 64, "x", "y", "spark")
                d_sql = tiling.tile_addresses_sql(epsg, zoom, 512, 64, "x", "y", "duckdb")
                gs = sorted(tuple(r) for r in spark.sql(f"select x, y, inline({s_sql}) from pxls").collect())
                gd = sorted(tuple(r) for r in con.sql(
                    f"select x, y, u.tileX, u.tileY, u.pixelX, u.pixelY from "
                    f"(select x, y, unnest({d_sql}) as u from pxls)").fetchall())
                assert gs == gd, (epsg, zoom)

    def test_buffer_invariant_rejected(self):
        with pytest.raises(ValueError):
            tiling.tile_addresses_sql("EPSG:3857", 0, 512, 300, "x", "y", "spark")


class TestZoom16Boundary:
    """Pin the int-safety boundary the reference documents (TileXYUDF.java:65):
    zoom 16 is the deepest supported level; max global pixel 2^16*2*512 = 2^26
    must stay in int32 through projection, addressing, and both dialects."""

    def test_grid_and_extent_z16(self):
        assert tiling.grid_dims("EPSG:3857", 16) == (65536, 65536)
        assert tiling.grid_dims("EPSG:4326", 16) == (131072, 65536)
        assert projection.world_extent("EPSG:4326", 16, 512) == (67108864, 33554432)
        assert projection.world_extent("EPSG:4326", 16, 512)[0] < 2**31  # int-safe

    def test_adjacency_wraps_at_z16(self):
        adj = tiling.adjacent_tile_address
        assert adj("EPSG:3857", 16, "E", 65535, 10) == (0, 10)
        assert adj("EPSG:3857", 16, "W", 0, 10) == (65535, 10)
        assert adj("EPSG:3857", 16, "N", 10, 0) == (10, 65535)
        assert adj("EPSG:4326", 16, "E", 131071, 0) == (0, 0)

    def test_global_pixel_clamps_at_z16_extremes(self, spark):
        w, h = projection.world_extent("EPSG:3857", 16, 512)
        pts = [
            (projection.MAX_MERCATOR_LAT, 180.0),    # NE extreme
            (-projection.MAX_MERCATOR_LAT, -180.0),  # SW extreme
            (0.0, 0.0),                              # center
        ]
        df = spark.createDataFrame(pts, ["lat", "lng"])
        out = df.select(
            projection.global_pixel("EPSG:3857", 16, 512, "lat", "lng").alias("xy")
        ).collect()
        assert (out[0].xy.x, out[0].xy.y) == (w - 1, 0)
        assert (out[1].xy.x, out[1].xy.y) == (0, h - 1)
        assert (out[2].xy.x, out[2].xy.y) == (w // 2, h // 2)
        for r in out:  # every coordinate fits int32
            assert 0 <= r.xy.x < 2**31 and 0 <= r.xy.y < 2**31

    def test_tile_addresses_dateline_and_pole_wrap_z16(self, spark):
        w, h = projection.world_extent("EPSG:3857", 16, 512)
        # east-edge pixel (mid-tile y): E duplicate wraps across the date
        # line to tile 0
        df = spark.createDataFrame([(w - 1, h // 2 + 256), (w // 2, 0)], ["x", "y"])
        rows = df.select(
            "x", "y", tiling.tile_addresses("EPSG:3857", 16, 512, 64, "x", "y").alias("t")
        ).collect()
        east = {(t.tileX, t.tileY, t.pixelX, t.pixelY) for t in rows[0].t}
        assert (65535, 32768, 511, 256) in east          # primary
        assert (0, 32768, -1, 256) in east               # dateline wrap
        north = {(t.tileX, t.tileY, t.pixelX, t.pixelY) for t in rows[1].t}
        assert (32768, 0, 0, 0) in north                 # primary
        assert (32768, 65535, 0, 512) in north           # pole wrap, south buffer
        assert (32767, 65535, 512, 512) in north         # NW corner wrap

    def test_duckdb_parity_z16(self, spark):
        w, h = projection.world_extent("EPSG:3857", 16, 512)
        pix = [(0, 0), (w - 1, h - 1), (w - 1, 0), (63, 448), (w // 2, h // 2),
               (w - 64, h - 64), (512 * 65535, 512 * 65535)]
        df = spark.createDataFrame(pix, ["x", "y"])
        df.createOrReplaceTempView("pix16")
        con = duckdb.connect()
        con.execute("create table pix16(x int, y int)")
        con.executemany("insert into pix16 values (?,?)", pix)
        s_sql = tiling.tile_addresses_sql("EPSG:3857", 16, 512, 64, "x", "y", "spark")
        d_sql = tiling.tile_addresses_sql("EPSG:3857", 16, 512, 64, "x", "y", "duckdb")
        gs = sorted(tuple(r) for r in spark.sql(f"select x, y, inline({s_sql}) from pix16").collect())
        gd = sorted(tuple(r) for r in con.sql(
            f"select x, y, u.tileX, u.tileY, u.pixelX, u.pixelY from "
            f"(select x, y, unnest({d_sql}) as u from pix16)").fetchall())
        assert gs == gd
        # projection parity at the lat/lng extremes, z16
        ptsql_s, ptsql_d = projection.global_pixel_xy_sql("EPSG:3857", 16, 512, "lat", "lng"), None
        df2 = spark.createDataFrame(PROJ_POINTS, ["lat", "lng"])
        df2.createOrReplaceTempView("pp16")
        xs, ys = ptsql_s
        got = [(r.x, r.y) for r in spark.sql(f"select {xs} as x, {ys} as y from pp16").collect()]
        con.execute("create table pp16(lat double, lng double)")
        con.executemany("insert into pp16 values (?,?)", PROJ_POINTS)
        want = con.sql(f"select {xs} as x, {ys} as y from pp16").fetchall()
        assert got == [tuple(r) for r in want]
