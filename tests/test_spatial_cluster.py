"""Grid clustering vs a brute-force union-find reference."""

from __future__ import annotations

import numpy as np
import pytest

from mvt_wrangler_spark.operators.spatial_cluster import grid_cluster


def _ref_clusters(pts, eps):
    """O(n²) union-find ground truth."""
    ids = sorted(pts)
    parent = {i: i for i in ids}

    def find(i):
        while parent[i] != i:
            parent[i] = parent[parent[i]]
            i = parent[i]
        return i

    for i in ids:
        for j in ids:
            if i < j:
                (x1, y1), (x2, y2) = pts[i], pts[j]
                if (x1 - x2) ** 2 + (y1 - y2) ** 2 <= eps * eps:
                    ri, rj = find(i), find(j)
                    if ri != rj:
                        parent[max(ri, rj)] = min(ri, rj)
    comps = {}
    for i in ids:
        comps.setdefault(find(i), []).append(i)
    out = {}
    for members in comps.values():
        rep = min(members)
        for m in members:
            out[m] = (rep, len(members))
    return out


@pytest.mark.spark
def test_grid_cluster_matches_bruteforce(spark):
    rng = np.random.RandomState(8)
    pts = {int(i): (int(rng.randint(0, 500)), int(rng.randint(0, 500)))
           for i in range(300)}
    df = spark.createDataFrame(
        [(i, x, y) for i, (x, y) in pts.items()], "id long, px long, py long")
    for eps in (5, 20, 60):
        got = {r.member_id: (r.cluster_rep, r.cluster_size)
               for r in grid_cluster(df, eps=eps).collect()}
        assert got == _ref_clusters(pts, eps), eps


@pytest.mark.spark
def test_grid_cluster_singletons_and_chain(spark):
    # a chain of points each within eps of the next merges into ONE cluster
    # even though the ends are far apart (single-linkage transitivity)
    rows = [(i, i * 10, 0) for i in range(10)] + [(99, 900, 900)]
    df = spark.createDataFrame(rows, "id long, px long, py long")
    got = {r.member_id: (r.cluster_rep, r.cluster_size)
           for r in grid_cluster(df, eps=10).collect()}
    assert all(got[i] == (0, 10) for i in range(10))
    assert got[99] == (99, 1)  # isolated point survives as its own cluster


def test_dwithin_join_vs_brute(spark):
    """Two-table radius join vs all-pairs python; includes exact-boundary
    pairs (d2 == eps^2 kept) and a cross-cell pair."""
    import random

    from mvt_wrangler_spark.operators.joins import dwithin_join

    rng = random.Random(11)
    A = [(i, rng.randrange(0, 500), rng.randrange(0, 500)) for i in range(120)]
    B = [(j, rng.randrange(0, 500), rng.randrange(0, 500)) for j in range(150)]
    B += [(900, A[0][1] + 3, A[0][2] + 4)]  # d2 = 25 = eps^2 exactly (eps=5)... kept
    eps = 40
    expected = {(i, j, (ax - bx) ** 2 + (ay - by) ** 2)
                for (i, ax, ay) in A for (j, bx, by) in B
                if (ax - bx) ** 2 + (ay - by) ** 2 <= eps * eps}
    left = spark.createDataFrame(A, "a_id long, px long, py long")
    right = spark.createDataFrame(B, "b_id long, px long, py long")
    rows = dwithin_join(left, right, eps=eps).collect()
    got = {(r.a_id, r.b_id, r.d2) for r in rows}
    assert got == expected
    assert len(rows) == len(got)  # each pair exactly once — no dup emission
    assert len(expected) > 50
