"""Geometry measures: hand-computed rings + randomized numpy cross-check."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.functions import measures as M


def _measure_df(spark, rings):
    df = spark.createDataFrame(
        [(i, [float(x) for x, _ in r], [float(y) for _, y in r])
         for i, r in enumerate(rings)],
        "gkey long, fxs array<double>, fys array<double>")
    df = df.select("gkey", F.transform("fxs", lambda v: v.cast("long")).alias("xs"),
                   F.transform("fys", lambda v: v.cast("long")).alias("ys"))
    xs, ys = F.col("xs"), F.col("ys")
    cx, cy, den = M.centroid_nums(xs, ys)
    minx, miny, maxx, maxy = M.bbox_cols(xs, ys)
    return df.select(
        "gkey",
        M.shoelace_area2_signed(xs, ys).alias("a2s"),
        M.shoelace_area2(xs, ys).alias("area2"),
        cx.alias("cx_num"), cy.alias("cy_num"), den.alias("den"),
        M.perimeter2_sum(xs, ys).alias("perim2"),
        M.polyline_len2_sum(xs, ys).alias("len2_open"),
        minx.alias("minx"), miny.alias("miny"),
        maxx.alias("maxx"), maxy.alias("maxy"))


def _np_measures(r):
    x = np.array([p[0] for p in r], dtype=np.int64)
    y = np.array([p[1] for p in r], dtype=np.int64)
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    cross = x * yn - xn * y
    a2s = int(cross.sum())
    cx = int(((x + xn) * cross).sum())
    cy = int(((y + yn) * cross).sum())
    p2 = int(((xn - x) ** 2 + (yn - y) ** 2).sum())
    l2 = int((np.diff(x) ** 2 + np.diff(y) ** 2).sum())
    return a2s, cx, cy, p2, l2


@pytest.mark.spark
def test_measures_unit_square(spark):
    # CCW unit-square scaled by 10: area 100 -> 2A = 200, centroid (5, 5)
    ring = [(0, 0), (10, 0), (10, 10), (0, 10)]
    r = _measure_df(spark, [ring]).collect()[0]
    assert r.a2s == 200 and r.area2 == 200
    assert r.cx_num / r.den == 5.0 and r.cy_num / r.den == 5.0
    assert r.perim2 == 4 * 100 and r.len2_open == 3 * 100
    assert (r.minx, r.miny, r.maxx, r.maxy) == (0, 0, 10, 10)
    # CW orientation flips the sign but not |area| / centroid
    rw = _measure_df(spark, [ring[::-1]]).collect()[0]
    assert rw.a2s == -200 and rw.area2 == 200
    assert rw.cx_num / rw.den == 5.0 and rw.cy_num / rw.den == 5.0


@pytest.mark.spark
def test_measures_random_rings_match_numpy(spark):
    rng = np.random.RandomState(42)
    rings = [[(int(a), int(b)) for a, b in
              rng.randint(0, 4096, size=(rng.randint(3, 12), 2))]
             for _ in range(50)]
    rows = {r.gkey: r for r in _measure_df(spark, rings).collect()}
    for i, ring in enumerate(rings):
        a2s, cx, cy, p2, l2 = _np_measures(ring)
        r = rows[i]
        assert (r.a2s, r.cx_num, r.cy_num, r.perim2, r.len2_open) == \
            (a2s, cx, cy, p2, l2)
        assert r.den == 3 * a2s and r.area2 == abs(a2s)


@pytest.mark.spark
def test_measures_degenerate_collinear(spark):
    # collinear ring: zero area, centroid denominator 0 (caller filters)
    r = _measure_df(spark, [[(0, 0), (5, 5), (10, 10)]]).collect()[0]
    assert r.area2 == 0 and r.den == 0
    assert r.perim2 == 50 + 50 + 200


def test_normalize_winding_flips_both_arrays(spark):
    """CW ring reverses BOTH xs and ys (the flip decision must not be
    re-resolved against the already-reversed xs — regression for the
    column re-resolution bug); CCW and degenerate rings pass through."""
    from mvt_wrangler_spark.functions.measures import normalize_winding

    rows = [
        (0, [0, 10, 10, 0], [0, 0, 10, 10]),   # CCW (y-up signed area > 0)
        (1, [0, 0, 10, 10], [0, 10, 10, 0]),   # CW -> must reverse
        (2, [0, 5, 10], [0, 5, 10]),           # collinear, area 0 -> keep
    ]
    df = spark.createDataFrame(rows, "gkey long, xs array<long>, ys array<long>")
    got = {r.gkey: r for r in normalize_winding(df).collect()}
    assert got[0].was_reversed is False and got[0].xs == [0, 10, 10, 0]
    assert got[1].was_reversed is True
    assert got[1].xs == [10, 10, 0, 0] and got[1].ys == [0, 10, 10, 0]
    # and the reversed ring is now CCW: re-normalizing is a no-op
    again = {r.gkey: r for r in normalize_winding(
        df.sparkSession.createDataFrame(
            [(1, got[1].xs, got[1].ys)],
            "gkey long, xs array<long>, ys array<long>")).collect()}
    assert again[1].was_reversed is False
    assert got[2].was_reversed is False and got[2].xs == [0, 5, 10]
