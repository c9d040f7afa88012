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
