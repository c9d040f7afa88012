"""Overlay operators: exact segment intersection — ring validity and the
line/line crossing join — vs a brute-force all-pairs Python oracle."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# pure-python reference (all-pairs, no bucketing)
# ---------------------------------------------------------------------------


def _orient(ax, ay, bx, by, cx, cy):
    return (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)


def _on_seg(px, py, qx, qy, rx, ry):
    return (min(px, qx) <= rx <= max(px, qx)
            and min(py, qy) <= ry <= max(py, qy))


def _flags(a, b):
    (ax, ay, bx, by), (cx, cy, dx, dy) = a, b
    d1 = _orient(ax, ay, bx, by, cx, cy)
    d2 = _orient(ax, ay, bx, by, dx, dy)
    d3 = _orient(cx, cy, dx, dy, ax, ay)
    d4 = _orient(cx, cy, dx, dy, bx, by)
    proper = ((d1 > 0) != (d2 > 0) and d1 != 0 and d2 != 0
              and (d3 > 0) != (d4 > 0) and d3 != 0 and d4 != 0)
    touch = (not proper) and (
        (d1 == 0 and _on_seg(ax, ay, bx, by, cx, cy))
        or (d2 == 0 and _on_seg(ax, ay, bx, by, dx, dy))
        or (d3 == 0 and _on_seg(cx, cy, dx, dy, ax, ay))
        or (d4 == 0 and _on_seg(cx, cy, dx, dy, bx, by)))
    return proper, touch


def _ring_validity_brute(verts):
    n = len(verts)
    edges = [(verts[i][0], verts[i][1],
              verts[(i + 1) % n][0], verts[(i + 1) % n][1]) for i in range(n)]
    n_cross = n_touch = 0
    for i in range(n):
        for j in range(i + 1, n):
            if j - i == 1 or (i == 0 and j == n - 1):
                continue
            p, t = _flags(edges[i], edges[j])
            n_cross += p
            n_touch += t
    return n_cross, n_touch


# ---------------------------------------------------------------------------
# known shapes
# ---------------------------------------------------------------------------

SQUARE = [(0, 0), (100, 0), (100, 100), (0, 100)]
BOWTIE = [(0, 0), (100, 100), (100, 0), (0, 100)]            # 1 proper cross
SPIKE = [(0, 0), (100, 0), (100, 100), (50, 0), (20, 60)]    # vertex on edge


def test_known_shapes(spark):
    from mvt_wrangler_spark.operators.overlay import ring_validity

    rows = [(k, [int(x) for x, _ in v], [int(y) for _, y in v])
            for k, v in enumerate([SQUARE, BOWTIE, SPIKE])]
    rings = spark.createDataFrame(rows, "gkey long, xs array<long>, ys array<long>")
    got = {r.gkey: (r.n_cross, r.n_touch, r.is_simple)
           for r in ring_validity(rings, cell_size=64).collect()}
    assert got[0] == (0, 0, True)
    assert got[1] == (1, 0, False)
    assert got[1][2] is False
    exp = _ring_validity_brute(SPIKE)
    assert got[2] == (exp[0], exp[1], (exp[0] + exp[1]) == 0)
    assert got[2][1] >= 1  # the spike's vertex-on-edge is an improper touch


@pytest.mark.parametrize("seed", [1, 2])
def test_ring_validity_random_vs_brute(spark, seed):
    """Random dense rings (guaranteed self-intersections) vs all-pairs."""
    from mvt_wrangler_spark.operators.overlay import ring_validity

    rng = random.Random(seed)
    rows, expected = [], {}
    for k in range(60):
        n = rng.randint(3, 12)
        verts = [(rng.randrange(0, 2048), rng.randrange(0, 2048))
                 for _ in range(n)]
        rows.append((k, [v[0] for v in verts], [v[1] for v in verts]))
        expected[k] = _ring_validity_brute(verts)
    rings = spark.createDataFrame(rows, "gkey long, xs array<long>, ys array<long>")
    got = {r.gkey: (r.n_cross, r.n_touch)
           for r in ring_validity(rings, cell_size=256).collect()}
    assert got == expected
    assert sum(c for c, _ in expected.values()) > 0  # test isn't vacuous


def test_degenerate_and_duplicate_vertices(spark):
    """Zero-length edges (repeated vertices) stay deterministic."""
    from mvt_wrangler_spark.operators.overlay import ring_validity

    verts = [(0, 0), (0, 0), (100, 0), (100, 100), (50, 50), (50, 50)]
    rings = spark.createDataFrame(
        [(0, [v[0] for v in verts], [v[1] for v in verts])],
        "gkey long, xs array<long>, ys array<long>")
    r = ring_validity(rings, cell_size=64).collect()[0]
    exp = _ring_validity_brute(verts)
    assert (r.n_cross, r.n_touch) == exp


def test_segment_cross_join_vs_brute(spark):
    from mvt_wrangler_spark.operators.overlay import segment_cross_join

    rng = random.Random(7)

    def mk(n):
        out = []
        for i in range(n):
            ax, ay = rng.randrange(0, 1024), rng.randrange(0, 1024)
            bx = max(0, min(1023, ax + rng.randrange(-80, 81)))
            by = max(0, min(1023, ay + rng.randrange(-80, 81)))
            out.append((i, ax, ay, bx, by))
        return out

    a_rows, b_rows = mk(300), mk(300)
    expected = set()
    for (i, ax, ay, bx, by) in a_rows:
        for (j, cx, cy, dx, dy) in b_rows:
            p, _ = _flags((ax, ay, bx, by), (cx, cy, dx, dy))
            if p:
                expected.add((i, j))
    schema = "id long, ax long, ay long, bx long, by long"
    a = spark.createDataFrame(a_rows, schema)
    b = spark.createDataFrame(b_rows, schema)
    got = {(r.a_id, r.b_id)
           for r in segment_cross_join(a, b, cell_size=64).collect()}
    assert got == expected
    assert len(expected) > 10  # dense enough to mean something


def test_shared_endpoint_between_layers_is_not_a_crossing(spark):
    from mvt_wrangler_spark.operators.overlay import segment_cross_join

    schema = "id long, ax long, ay long, bx long, by long"
    a = spark.createDataFrame([(0, 0, 0, 100, 100)], schema)
    # touches a's endpoint / lies collinear-overlapping — never "proper"
    b = spark.createDataFrame(
        [(0, 100, 100, 200, 100), (1, 50, 50, 150, 150)], schema)
    assert segment_cross_join(a, b, cell_size=64).count() == 0


def test_cover_cells_requires_power_of_two():
    from mvt_wrangler_spark.operators.overlay import with_cover_cells

    with pytest.raises(ValueError):
        with_cover_cells(None, 100)
