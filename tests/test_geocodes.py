"""Geohash/quadkey vs canonical pure-Python encoders on random points."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.functions import geocodes as GC
from mvt_wrangler_spark.functions import tiling


def _ref_geohash(lon: float, lat: float, precision: int) -> str:
    """Niemeyer's bisection form — independent of the bit-spread path."""
    lo_lon, hi_lon, lo_lat, hi_lat = -180.0, 180.0, -90.0, 90.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lo_lon + hi_lon) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lo_lon = mid
            else:
                ch *= 2
                hi_lon = mid
        else:
            mid = (lo_lat + hi_lat) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lo_lat = mid
            else:
                ch *= 2
                hi_lat = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(GC.GEOHASH32[ch])
            bits, ch = 0, 0
    return "".join(out)


def _ref_quadkey(x: int, y: int, z: int) -> str:
    return "".join(str(((x >> k) & 1) + 2 * ((y >> k) & 1))
                   for k in range(z - 1, -1, -1))


@pytest.mark.spark
def test_geohash_known_point(spark):
    # the canonical worked example: (42.6, -5.6) -> "ezs42" prefix
    df = spark.createDataFrame([(1, -5.6, 42.6)], "id long, lon double, lat double")
    gh = GC.with_geohash(df, "lon", "lat", precision=8).collect()[0].geohash
    assert gh.startswith("ezs42")
    assert gh == _ref_geohash(-5.6, 42.6, 8)


@pytest.mark.spark
def test_geohash_random_matches_reference(spark):
    rng = np.random.RandomState(7)
    pts = [(i, float(rng.uniform(-180, 180)), float(rng.uniform(-90, 90)))
           for i in range(200)]
    df = spark.createDataFrame(pts, "id long, lon double, lat double")
    got = {r.id: r.geohash for r in
           GC.with_geohash(df, "lon", "lat", precision=8).collect()}
    for i, lon, lat in pts:
        assert got[i] == _ref_geohash(lon, lat, 8), (lon, lat)


@pytest.mark.spark
def test_quadkey_bing_example_and_random(spark):
    # Bing tile-system doc example: level 3 tile (3, 5) -> "213"
    rng = np.random.RandomState(11)
    z = 9
    tiles = [(0, 3, 5, 3)] + [
        (i, int(rng.randint(0, 1 << z)), int(rng.randint(0, 1 << z)), z)
        for i in range(1, 100)]
    df = spark.createDataFrame([(i, x, y) for i, x, y, _ in tiles],
                               "id long, x long, y long")
    got3 = {r.id: r.qk for r in
            df.filter(F.col("id") == 0)
            .withColumn("qk", GC.quadkey(F.col("x"), F.col("y"), 3)).collect()}
    assert got3[0] == "213"
    gotz = {r.id: r.qk for r in
            df.filter(F.col("id") > 0)
            .withColumn("qk", GC.quadkey(F.col("x"), F.col("y"), z)).collect()}
    for i, x, y, zz in tiles[1:]:
        assert gotz[i] == _ref_quadkey(x, y, zz)


@pytest.mark.spark
def test_quadkey_prefix_is_parent(spark):
    """Zoom hierarchy: a tile's quadkey at z is its z-1 parent's quadkey
    plus one digit — the property pyramid rollups rely on."""
    df = spark.createDataFrame([(37.77, -122.41)], "lat double, lon double")
    z = 12
    d = df.withColumn("qk", GC.quadkey(tiling.tile_x(F.col("lon"), z),
                                       tiling.tile_y(F.col("lat"), z), z))
    d = d.withColumn("qk_p", GC.quadkey(tiling.tile_x(F.col("lon"), z - 1),
                                        tiling.tile_y(F.col("lat"), z - 1), z - 1))
    r = d.collect()[0]
    assert r.qk[:-1] == r.qk_p and len(r.qk) == z
