"""Property-based and invariant tests.

Hypothesis drives the pure-Python binary codecs (no Spark in the loop, so the
full example budget is cheap); the Spark-side invariants (projection bounds,
pyramid halving, codec inverses, salted-collect equivalence) run as dense
grids inside single Spark jobs.
"""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from map_spark_sql_spark.plans.tiles import (
    decode_point_features_py,
    decode_tile_py,
    encode_point_features_py,
    encode_tile_py,
)

# --- pure-Python codec roundtrips (hypothesis) ------------------------------

feature = st.fixed_dictionaries(
    {
        "lat": st.floats(-90, 90, allow_nan=False),
        "lng": st.floats(-180, 180, allow_nan=False),
        "borYear": st.integers(0, 2**31 - 1),
        "occCount": st.integers(0, 2**62),
    }
)


@settings(max_examples=200, deadline=None)
@given(st.lists(feature, max_size=20))
def test_point_features_roundtrip(features):
    rows = [
        {"lat": f["lat"], "lng": f["lng"], "borYear": f["borYear"], "occCount": f["occCount"]}
        for f in features
    ]
    back = decode_point_features_py(encode_point_features_py(rows))
    assert len(back) == len(rows)
    for a, b in zip(rows, back):
        assert a["borYear"] == b["borYear"] and a["occCount"] == b["occCount"]
        assert math.isclose(a["lat"], b["lat"]) and math.isclose(a["lng"], b["lng"])


pixel = st.fixed_dictionaries(
    {
        "px": st.integers(0, 511),
        "py": st.integers(0, 511),
        "features": st.lists(
            st.fixed_dictionaries(
                {"borYear": st.integers(0, 2**31 - 1), "occCount": st.integers(0, 2**62)}
            ),
            max_size=8,
        ),
    }
)


@settings(max_examples=200, deadline=None)
@given(st.lists(pixel, max_size=10))
def test_tile_roundtrip(pixels):
    back = decode_tile_py(encode_tile_py(pixels))
    assert back == [
        {"px": p["px"], "py": p["py"], "features": [dict(f) for f in p["features"]]}
        for p in pixels
    ]


# --- Spark-side invariants (dense grids, one job each) ----------------------


def _latlng_grid(spark):
    """Latitudes/longitudes including every boundary the projections care
    about (web-mercator clip, poles, date line) plus a dense interior grid."""
    lats = [-90.0, -89.9, -85.0511288, -85.05, -60.0, -1.0, 0.0, 1.0, 45.0, 85.05, 85.0511288, 89.9, 90.0]
    lngs = [-180.0, -179.999, -90.0, -0.001, 0.0, 0.001, 90.0, 179.999, 180.0]
    lats += [x / 3.0 for x in range(-255, 256, 15)]
    lngs += [x / 3.0 for x in range(-537, 538, 30)]
    rows = [(la, ln) for la in lats for ln in lngs]
    return spark.createDataFrame(rows, "lat double, lng double")


def test_projection_bounds_and_halving(spark):
    """For every CRS and zoom: non-null pixels lie inside the world grid, and
    pixel(z) == pixel(z+1) div 2 — the invariant the pyramid roll-up relies
    on (SURVEY §4)."""
    from map_spark_sql_spark.functions.projection import global_pixel_xy_sql

    tile_size = 512
    grid = _latlng_grid(spark)
    checks = []
    for epsg, width_tiles in [("EPSG:3857", 1), ("EPSG:4326", 2), ("EPSG:3575", 1), ("EPSG:3031", 1)]:
        for z in range(0, 4):
            xs, ys = global_pixel_xy_sql(epsg, z, tile_size, "lat", "lng")
            xs1, ys1 = global_pixel_xy_sql(epsg, z + 1, tile_size, "lat", "lng")
            w = width_tiles * tile_size * (2**z)
            h = tile_size * (2**z)
            tag = f"{epsg}@z{z}"
            checks.append(
                F.sum(
                    F.when(
                        F.expr(
                            f"({xs}) IS NOT NULL AND ("
                            f"({xs}) < 0 OR ({xs}) >= {w} OR ({ys}) < 0 OR ({ys}) >= {h}"
                            f" OR ({xs}) != CAST(({xs1}) / 2 AS INT) * 1"
                            f" OR CAST(({xs1}) / 2 AS INT) != ({xs})"
                            f" OR CAST(({ys1}) / 2 AS INT) != ({ys})"
                            f")",
                        ),
                        1,
                    ).otherwise(0)
                ).alias(tag.replace(":", "_").replace("@", "_"))
            )
    row = grid.select(*checks).first()
    bad = {k: v for k, v in row.asDict().items() if v}
    assert not bad, f"violations: {bad}"


def test_boryear_codec_inverse_grid(spark):
    """decode(encode(bor, year)) == (bor, year) over the full bor set and a
    year sweep including NULL (EncodeBorYearUDF.java:58-71 inverse pair)."""
    from map_spark_sql_spark.functions.encode import (
        BOR_MAPPING,
        decode_bor,
        decode_year,
        encode_bor_year,
    )

    rows = [
        (b, y)
        for b in BOR_MAPPING
        for y in [None, 0, 1, 1600, 1999, 2000, 2026, 9999]
    ]
    df = spark.createDataFrame(rows, "bor string, year int")
    out = (
        df.withColumn("e", encode_bor_year(F.col("bor"), F.col("year")))
        .withColumn("bor2", decode_bor(F.col("e")))
        .withColumn("year2", decode_year(F.col("e")))
    )
    for r in out.collect():
        assert r["bor2"] == r["bor"]
        expect_year = r["year"] if r["year"] not in (None, 0) else None
        assert r["year2"] == expect_year, r


@settings(max_examples=300, deadline=None)
@given(st.integers(0, 2**16 - 1), st.integers(0, 2**16 - 1))
def test_morton_locality_property(x, y):
    """Morton invariants (python twin): bijective bit interleave; moving one
    step in x or y changes the key by a bounded-structure amount (the key's
    even/odd bit planes are exactly x and y)."""
    from map_spark_sql_spark.functions.zorder import morton_py

    m = morton_py(x, y)
    # de-interleave recovers inputs (bijectivity)
    xr = sum(((m >> (2 * i)) & 1) << i for i in range(16))
    yr = sum(((m >> (2 * i + 1)) & 1) << i for i in range(16))
    assert (xr, yr) == (x, y)


def test_morton_spark_duckdb_python_parity(spark):
    """The SQL expression equals the python twin in BOTH engines."""
    import duckdb

    from map_spark_sql_spark.functions.zorder import morton_py, morton_sql

    rows = [(x, y) for x in (0, 1, 2, 3, 255, 256, 65535) for y in (0, 1, 127, 65535)]
    df = spark.createDataFrame(rows, "x int, y int")
    got_s = {(r.x, r.y): r.m for r in df.selectExpr("x", "y", f"{morton_sql('x', 'y')} AS m").collect()}
    con = duckdb.connect()
    con.execute("CREATE TABLE t(x int, y int)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    got_d = {(x, y): m for x, y, m in con.execute(f"SELECT x, y, {morton_sql('x', 'y')} FROM t").fetchall()}
    for x, y in rows:
        assert got_s[(x, y)] == got_d[(x, y)] == morton_py(x, y)


def test_salted_collect_list_equivalence(spark):
    """salted_collect_list == plain collect_list as per-key multisets."""
    from map_spark_sql_spark.operators.skew import salted_collect_list

    df = spark.range(0, 5000).select(
        (F.col("id") % 7).alias("k"), (F.col("id") * 31 % 997).alias("v")
    )
    plain = {
        r["k"]: sorted(r["items"])
        for r in df.groupBy("k").agg(F.collect_list("v").alias("items")).collect()
    }
    salted = {
        r["k"]: sorted(r["items"])
        for r in salted_collect_list(df, ["k"], "v", buckets=8).collect()
    }
    assert salted == plain


# --- sequence packing invariants (hypothesis) --------------------------------


@given(
    st.lists(st.integers(0, 40), min_size=1, max_size=30),
    st.integers(4, 16),
)
@settings(max_examples=20, deadline=None)
def test_packing_invariants_random_lengths(lengths, chunk_tokens):
    """For arbitrary doc lengths: per-doc takes sum to the doc's token
    count, every chunk except the last is exactly full, and offsets stay
    in-range. (Pure-python mirror of the operator's arithmetic, pinned
    against the Spark implementation in TestPacking.)"""
    total = sum(lengths)
    start = 0
    by_chunk: dict[int, int] = {}
    for n in lengths:
        if n > 0:
            first, last = start // chunk_tokens, (start + n - 1) // chunk_tokens
            for c in range(first, last + 1):
                lo, hi = c * chunk_tokens, (c + 1) * chunk_tokens
                take = min(start + n, hi) - max(start, lo)
                assert 1 <= take <= chunk_tokens
                off = max(start, lo) - lo
                assert 0 <= off < chunk_tokens
                by_chunk[c] = by_chunk.get(c, 0) + take
        start += n
    assert sum(by_chunk.values()) == total
    if by_chunk:
        last_chunk = max(by_chunk)
        assert all(v == chunk_tokens for c, v in by_chunk.items() if c != last_chunk)


# --- round-6 randomized invariants (dense corpora, one Spark job each) -------


def test_prefix_pairs_recompose_random_corpora(spark):
    """Family-collapsed prefix_filter_pairs must recompose to EXACTLY the
    brute-force doc-level threshold pairs on randomized corpora with
    engineered duplicate families, whale tokens, and near-dup variants."""
    import random

    from map_spark_sql_spark.operators.dedup import prefix_filter_pairs

    rng = random.Random(606)
    vocab = [f"w{i}" for i in range(40)]
    whale = "the of and"  # appears in most docs
    docs = []
    did = 0
    for _ in range(12):  # families of exact copies
        base = " ".join(rng.sample(vocab, rng.randint(3, 8))) + " " + whale
        for _ in range(rng.randint(1, 4)):
            docs.append((did, base)); did += 1
        # near-dup variant: one token swapped
        toks = base.split(); toks[0] = rng.choice(vocab)
        docs.append((did, " ".join(toks))); did += 1
    for _ in range(10):  # singletons
        docs.append((did, " ".join(rng.sample(vocab, rng.randint(1, 6))))); did += 1

    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = prefix_filter_pairs(df).collect()

    sets = {i: frozenset(t.split(" ")) for i, t in docs if t}
    members: dict[int, list[int]] = {}
    for i, s in sets.items():
        rep = min(j for j, t in sets.items() if t == s)
        members.setdefault(rep, []).append(i)
    got = set()
    for r in rows:
        if r["a_id"] == r["b_id"]:
            fam = members[r["a_id"]]
            assert r["a_family"] == len(fam) >= 2
            got.update((x, y) for x in fam for y in fam if x < y)
        else:
            fa, fb = members[r["a_id"]], members[r["b_id"]]
            assert (r["a_family"], r["b_family"]) == (len(fa), len(fb))
            got.update((min(x, y), max(x, y)) for x in fa for y in fb)

    want = set()
    ids = sorted(sets)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and 10 * inter >= 7 * union:
                want.add((a, b))
    assert got == want


def test_char_entropy_fold_random_strings(spark):
    """The sorted-run entropy fold must match the Counter-based mirror on
    randomized strings: repeated runs, full-distinct, unicode, whitespace."""
    import math
    import random
    from collections import Counter

    from map_spark_sql_spark.operators.text import char_entropy

    rng = random.Random(66)
    alphabet = "abcXYZ 019_éç中"
    docs = []
    for i in range(120):
        n = rng.randint(1, 60)
        docs.append((i, "".join(rng.choice(alphabet) for _ in range(n))))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r["doc_id"]: r for r in char_entropy(df).collect()}
    for i, t in docs:
        cnt = Counter(list(t))
        n = sum(cnt.values())
        want = sum(round(-math.log(k / n) * 1000000) * k for k in cnt.values())
        assert got[i]["n_chars_split"] == n
        assert got[i]["n_distinct_chars"] == len(cnt)
        assert got[i]["sum_ent_micro"] == want, (i, t)
