"""Douglas–Peucker: known cases + randomized vs a recursive reference."""

from __future__ import annotations

import numpy as np
import pytest

from mvt_wrangler_spark.operators.simplify import dp_keep_mask, simplify_lines


def _ref_dp(x, y, eps2):
    """Plain recursive reference (independent of the worklist kernel)."""
    n = len(x)
    keep = {0, n - 1}

    def rec(lo, hi):
        if hi <= lo + 1:
            return
        dx, dy = x[hi] - x[lo], y[hi] - y[lo]
        best, bj = -1, -1
        for j in range(lo + 1, hi):
            cr = dx * (y[j] - y[lo]) - dy * (x[j] - x[lo])
            if cr * cr > best:
                best, bj = cr * cr, j
        if best > eps2 * (dx * dx + dy * dy):
            keep.add(bj)
            rec(lo, bj)
            rec(bj, hi)

    rec(0, n - 1)
    return keep


def test_dp_straightish_line_collapses():
    x = np.arange(10, dtype=np.int64) * 100
    y = np.array([0, 1, -1, 2, 0, 1, -2, 1, 0, 0], dtype=np.int64)
    m = dp_keep_mask(x, y, eps2=25)  # eps=5 > every deviation
    assert set(np.flatnonzero(m)) == {0, 9}


def test_dp_keeps_real_corner():
    x = np.array([0, 50, 100], dtype=np.int64)
    y = np.array([0, 40, 0], dtype=np.int64)
    m = dp_keep_mask(x, y, eps2=100)  # eps=10 < 40
    assert set(np.flatnonzero(m)) == {0, 1, 2}


def test_dp_random_matches_reference():
    rng = np.random.RandomState(12)
    for _ in range(100):
        n = rng.randint(2, 15)
        x = rng.randint(0, 4096, n).astype(np.int64)
        y = rng.randint(0, 4096, n).astype(np.int64)
        for eps in (16, 64, 256):
            got = set(np.flatnonzero(dp_keep_mask(x, y, eps * eps)).tolist())
            assert got == _ref_dp(x, y, eps * eps), (x, y, eps)


@pytest.mark.spark
def test_simplify_lines_operator(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 100.0, 200.0, 300.0], [0.0, 1.0, -1.0, 0.0]),
         (2, [0.0, 50.0, 100.0], [0.0, 40.0, 0.0])],
        "gkey long, xs array<double>, ys array<double>")
    from pyspark.sql import functions as F

    df = df.select("gkey",
                   F.transform("xs", lambda c: c.cast("long")).alias("xs"),
                   F.transform("ys", lambda c: c.cast("long")).alias("ys"))
    got = {}
    for r in simplify_lines(df, eps=10).collect():
        got.setdefault(r.gkey, set()).add(r.kept_seq)
    assert got == {1: {0, 3}, 2: {0, 1, 2}}
