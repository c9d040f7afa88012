"""geoms_intersect_polygon vs a slow per-row reference implementation."""

from __future__ import annotations

import numpy as np

from mvt_wrangler_spark.functions import geometry as G


def _brute_row(gtype, xs, ys, poly: G.Polygon) -> bool:
    xs = np.asarray(xs, float)
    ys = np.asarray(ys, float)
    if G.points_in_polygon(xs, ys, poly).any():
        return True
    verts = list(zip(xs, ys))
    segs = list(zip(verts, verts[1:]))
    if gtype == "Polygon" and len(verts) >= 3:
        segs.append((verts[-1], verts[0]))
    rings = [poly.exterior] + poly.holes
    for (a, b) in segs:
        for ring in rings:
            for i in range(len(ring) - 1):
                if G.segments_cross(np.array([a[0]]), np.array([a[1]]),
                                    np.array([b[0]]), np.array([b[1]]),
                                    ring[i, 0], ring[i, 1],
                                    ring[i + 1, 0], ring[i + 1, 1])[0]:
                    return True
    if gtype == "Polygon" and len(verts) >= 3:
        ring = G._close_ring(np.stack([xs, ys], axis=1))
        fpx, fpy = poly.exterior[:-1, 0], poly.exterior[:-1, 1]
        if G.points_in_ring(fpx, fpy, ring).any():
            return True
    return False


def _rand_batch(n, rng):
    gtypes, xsl, ysl = [], [], []
    for _ in range(n):
        k = rng.integers(0, 3)
        cx, cy = rng.uniform(-30, 30), rng.uniform(-30, 30)
        if k == 0:
            gtypes.append("Point")
            xsl.append([cx])
            ysl.append([cy])
        elif k == 1:
            m = int(rng.integers(2, 5))
            gtypes.append("LineString")
            xsl.append(list(cx + rng.uniform(-15, 15, m)))
            ysl.append(list(cy + rng.uniform(-15, 15, m)))
        else:
            m = int(rng.integers(3, 6))
            ang = np.sort(rng.uniform(0, 2 * np.pi, m))
            r = rng.uniform(1, 12)
            gtypes.append("Polygon")
            xsl.append(list(cx + r * np.cos(ang)))
            ysl.append(list(cy + r * np.sin(ang)))
    return np.array(gtypes, dtype=object), np.array(xsl, dtype=object), np.array(ysl, dtype=object)


def test_intersects_kernel_matches_bruteforce():
    rng = np.random.default_rng(42)
    hexv = np.array([[10 * np.cos(a) + 2, 10 * np.sin(a) - 1]
                     for a in np.linspace(0.2, 2 * np.pi + 0.2, 6, endpoint=False)])
    poly = G.Polygon(hexv)
    gtypes, xsl, ysl = _rand_batch(400, rng)
    got = G.geoms_intersect_polygon(gtypes, xsl, ysl, poly)
    for i in range(len(gtypes)):
        assert got[i] == _brute_row(gtypes[i], xsl[i], ysl[i], poly), \
            (i, gtypes[i], xsl[i], ysl[i])


def test_feature_polygon_swallows_filter():
    """A huge triangle containing the whole filter polygon must intersect
    even though no vertices or edges touch."""
    poly = G.Polygon(np.array([[0, 0], [2, 0], [2, 2], [0, 2]]))
    gtypes = np.array(["Polygon", "Polygon"], dtype=object)
    xsl = np.array([[-50, 50, 0], [10, 12, 11]], dtype=object)
    ysl = np.array([[-50, -50, 80], [10, 10, 12]], dtype=object)
    got = G.geoms_intersect_polygon(gtypes, xsl, ysl, poly)
    assert got[0] and not got[1]


def test_polygon_with_hole_linestring():
    """A segment entirely inside a hole does not intersect; one crossing the
    hole boundary does."""
    outer = np.array([[0, 0], [10, 0], [10, 10], [0, 10]])
    hole = np.array([[4, 4], [6, 4], [6, 6], [4, 6]])
    poly = G.Polygon(outer, [hole])
    gtypes = np.array(["LineString", "LineString"], dtype=object)
    xsl = np.array([[4.5, 5.5], [4.5, 7.0]], dtype=object)
    ysl = np.array([[5.0, 5.0], [5.0, 5.0]], dtype=object)
    got = G.geoms_intersect_polygon(gtypes, xsl, ysl, poly)
    assert not got[0] and got[1]
