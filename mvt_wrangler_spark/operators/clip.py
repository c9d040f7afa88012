"""Polygon clipping to tile bounds — the MVT encoder's geometry step.

Reference analog: tile pipelines clip each feature ring to the (buffered)
tile square before encoding (mvt-wrangler consumes pre-clipped tiles; a
from-scratch tile build needs the clip itself). Implemented as the
classic Sutherland–Hodgman convex clip: four half-plane passes
(left/right/bottom/top), each pass walking the ring's edges and emitting
[intersection-if-crossing, endpoint-if-inside] per edge.

Execution shape: `clip_rings` runs as ONE mapInPandas over (id, xs, ys)
rows — embarrassingly parallel per feature, no shuffle introduced; the
kernel is numpy per ring (each half-plane pass is vectorized across the
ring's edges: roll/compare/interleave/boolean-select, no per-vertex
Python). After clipping, coordinates are floor-snapped to a subpixel
grid (real MVT encoders snap to the integer extent), which makes the
post-clip shoelace area an exact integer — the property the DuckDB twin
relies on to be order-independent and bit-comparable.

Float determinism: the intersection formula is written with the SAME
operation order here and in the SQL twin —
    t  = (b - c) / (cn - c)
    o' = o + (on - o) * t
so both engines produce bit-identical float64 intermediates and the
snapped integers agree exactly.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401 (API symmetry)


def _clip_halfplane(x: np.ndarray, y: np.ndarray, b: float, axis: int,
                    keep_ge: bool) -> tuple[np.ndarray, np.ndarray]:
    """One Sutherland–Hodgman pass over a closed ring (float64 arrays).

    Emits, per directed edge (v, vn): the crossing point if the edge
    crosses the clip line, then vn if vn is inside. Fully vectorized:
    candidates are interleaved as (edge, slot) and boolean-selected.
    """
    if len(x) == 0:
        return x, y
    xn, yn = np.roll(x, -1), np.roll(y, -1)
    c, cn = (x, xn) if axis == 0 else (y, yn)
    cur_in = c >= b if keep_ge else c <= b
    nxt_in = cn >= b if keep_ge else cn <= b
    cross = cur_in != nxt_in
    # intersection: the clipped coordinate is exactly b; the other one is
    # interpolated with the shared-with-SQL operation order
    with np.errstate(divide="ignore", invalid="ignore"):
        # non-crossing edges produce inf/nan here; they are masked out by
        # `cross` below and never emitted
        t = (b - c) / (cn - c)
        if axis == 0:
            ix = np.full_like(x, b)
            iy = y + (yn - y) * t
        else:
            iy = np.full_like(y, b)
            ix = x + (xn - x) * t
    n = len(x)
    ox = np.empty(2 * n, dtype=np.float64)
    oy = np.empty(2 * n, dtype=np.float64)
    keep = np.zeros(2 * n, dtype=bool)
    ox[0::2], oy[0::2], keep[0::2] = ix, iy, cross
    ox[1::2], oy[1::2], keep[1::2] = xn, yn, nxt_in
    return ox[keep], oy[keep]


def clip_ring_np(x: np.ndarray, y: np.ndarray, minx: float, miny: float,
                 maxx: float, maxy: float) -> tuple[np.ndarray, np.ndarray]:
    """Clip one ring to the axis-aligned box; may return < 3 vertices
    (degenerate/outside — callers drop those)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    for b, axis, keep_ge in ((minx, 0, True), (maxx, 0, False),
                             (miny, 1, True), (maxy, 1, False)):
        x, y = _clip_halfplane(x, y, b, axis, keep_ge)
    return x, y


def snapped_area2(x: np.ndarray, y: np.ndarray, snap: int) -> tuple[int, int]:
    """(n_vertices, |shoelace 2A|) of the ring floor-snapped to 1/snap
    subpixels — integer-exact, the MVT encoder's post-clip quantity."""
    qx = np.floor(x * snap).astype(np.int64)
    qy = np.floor(y * snap).astype(np.int64)
    qxn, qyn = np.roll(qx, -1), np.roll(qy, -1)
    return len(qx), abs(int((qx * qyn - qxn * qy).sum()))


def clip_rings(df: DataFrame, minx: float, miny: float, maxx: float,
               maxy: float, snap: int = 16, id_col: str = "gkey",
               xs_col: str = "xs", ys_col: str = "ys") -> DataFrame:
    """Clip every (id, xs, ys) ring to the box; returns
    (id, n_out, area2q) for rings that survive with >= 3 vertices and
    positive snapped area. One mapInPandas, no shuffle."""
    out_schema = f"{id_col} long, n_out long, area2q long"

    def _clip(batches):
        import pandas as pd

        for pdf in batches:
            ids, ns, areas = [], [], []
            for gid, xs, ys in zip(pdf[id_col], pdf[xs_col], pdf[ys_col]):
                cx, cy = clip_ring_np(np.asarray(xs, dtype=np.float64),
                                      np.asarray(ys, dtype=np.float64),
                                      minx, miny, maxx, maxy)
                if len(cx) < 3:
                    continue
                n, a2 = snapped_area2(cx, cy, snap)
                if a2 == 0:
                    continue
                ids.append(gid)
                ns.append(n)
                areas.append(a2)
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "n_out": pd.Series(ns, dtype="int64"),
                                "area2q": pd.Series(areas, dtype="int64")})

    return df.mapInPandas(_clip, out_schema)


# ---------------------------------------------------------------------------
# DuckDB twin: the same four passes unrolled as CTE blocks over
# (gkey, seq, x, y) vertex rows; each pass emits (seq, slot) candidates and
# renumbers. Identical float expression order keeps intersections bit-equal.
# ---------------------------------------------------------------------------

def _pass_sql(src: str, dst: str, b: float, axis: int, keep_ge: bool) -> str:
    c, cn = ("x", "xn") if axis == 0 else ("y", "yn")
    op = ">=" if keep_ge else "<="
    if axis == 0:
        ix, iy = f"CAST({b} AS DOUBLE)", f"y + (yn - y) * (({b} - x) / (xn - x))"
    else:
        iy, ix = f"CAST({b} AS DOUBLE)", f"x + (xn - x) * (({b} - y) / (yn - y))"
    return f"""
{dst}_e AS (
  SELECT gkey, seq, x, y,
         coalesce(lead(x) OVER w, first_value(x) OVER wf) AS xn,
         coalesce(lead(y) OVER w, first_value(y) OVER wf) AS yn
  FROM {src}
  WINDOW w  AS (PARTITION BY gkey ORDER BY seq),
         wf AS (PARTITION BY gkey ORDER BY seq
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
{dst}_c AS (
  SELECT gkey, seq, 0 AS slot, {ix} AS x, {iy} AS y
  FROM {dst}_e WHERE ({c} {op} {b}) != ({cn} {op} {b})
  UNION ALL
  SELECT gkey, seq, 1 AS slot, xn AS x, yn AS y
  FROM {dst}_e WHERE {cn} {op} {b}
),
{dst} AS (
  SELECT gkey, row_number() OVER (PARTITION BY gkey ORDER BY seq, slot) AS seq,
         x, y
  FROM {dst}_c
)"""


def clip_rings_sql(src: str, minx: float, miny: float, maxx: float,
                   maxy: float, snap: int = 16) -> str:
    """CTE chain over `src`(gkey, seq, x DOUBLE, y DOUBLE); exposes
    __clip(gkey, n_out, area2q) with the same drop rules as clip_rings."""
    passes = [
        _pass_sql(src, "__cp1", minx, 0, True),
        _pass_sql("__cp1", "__cp2", maxx, 0, False),
        _pass_sql("__cp2", "__cp3", miny, 1, True),
        _pass_sql("__cp3", "__cp4", maxy, 1, False),
    ]
    final = f"""
__cq AS (
  SELECT gkey, seq,
         CAST(floor(x * {snap}) AS BIGINT) AS qx,
         CAST(floor(y * {snap}) AS BIGINT) AS qy,
         coalesce(lead(CAST(floor(x * {snap}) AS BIGINT)) OVER w,
                  first_value(CAST(floor(x * {snap}) AS BIGINT)) OVER wf) AS qxn,
         coalesce(lead(CAST(floor(y * {snap}) AS BIGINT)) OVER w,
                  first_value(CAST(floor(y * {snap}) AS BIGINT)) OVER wf) AS qyn
  FROM __cp4
  WINDOW w  AS (PARTITION BY gkey ORDER BY seq),
         wf AS (PARTITION BY gkey ORDER BY seq
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
__clip AS (
  SELECT gkey, count(*) AS n_out, abs(sum(qx*qyn - qxn*qy)) AS area2q
  FROM __cq GROUP BY gkey
  HAVING count(*) >= 3 AND abs(sum(qx*qyn - qxn*qy)) > 0
)"""
    return ",".join(passes) + "," + final


# ---------------------------------------------------------------------------
# Line clipping (Liang–Barsky) — PURE CODEGEN, no Python at all: each
# polyline segment clips independently (no sequential dependence, unlike
# the polygon clip above), so the whole operator is per-row column math.
# ---------------------------------------------------------------------------

def _axis_ts(c1, d, lo: float, hi: float):
    """(t_enter, t_exit) for one axis; ±inf conventions for d == 0."""
    from pyspark.sql import functions as F

    inf = float("inf")
    t_in = (F.when(d > 0, (F.lit(lo) - c1) / d)
            .when(d < 0, (F.lit(hi) - c1) / d)
            .otherwise(F.when(c1 >= lo, F.lit(-inf)).otherwise(F.lit(inf))))
    t_out = (F.when(d > 0, (F.lit(hi) - c1) / d)
             .when(d < 0, (F.lit(lo) - c1) / d)
             .otherwise(F.when(c1 <= hi, F.lit(inf)).otherwise(F.lit(-inf))))
    return t_in, t_out


def clip_segments(df: DataFrame, minx: float, miny: float, maxx: float,
                  maxy: float, snap: int = 16,
                  x1="x1", y1="y1", x2="x2", y2="y2") -> DataFrame:
    """Liang–Barsky clip of segment rows to the box. Emits surviving
    segments with endpoints floor-snapped to 1/snap subpixels (dropping
    zero-length results after the snap). Single codegen projection —
    `.explain` shows no exchange and no Python stage."""
    from pyspark.sql import functions as F

    X1, Y1 = F.col(x1), F.col(y1)
    dx, dy = F.col(x2) - X1, F.col(y2) - Y1
    tx0, tx1 = _axis_ts(X1, dx, minx, maxx)
    ty0, ty1 = _axis_ts(Y1, dy, miny, maxy)
    t0 = F.greatest(F.lit(0.0), tx0, ty0)
    t1 = F.least(F.lit(1.0), tx1, ty1)
    d = (df.withColumns({"__t0": t0, "__t1": t1})
         .filter(F.col("__t0") < F.col("__t1")))
    qs = {
        "qx1": F.floor((X1 + F.col("__t0") * dx) * snap).cast("long"),
        "qy1": F.floor((Y1 + F.col("__t0") * dy) * snap).cast("long"),
        "qx2": F.floor((X1 + F.col("__t1") * dx) * snap).cast("long"),
        "qy2": F.floor((Y1 + F.col("__t1") * dy) * snap).cast("long"),
    }
    d = d.withColumns(qs).drop("__t0", "__t1")
    return d.filter((F.col("qx1") != F.col("qx2"))
                    | (F.col("qy1") != F.col("qy2")))


def clip_segments_sql(src: str, minx: float, miny: float, maxx: float,
                      maxy: float, snap: int = 16) -> str:
    """DuckDB twin over `src`(..., x1, y1, x2, y2) — identical expression
    order so the float t-parameters and snapped ints are bit-equal.
    Exposes __lseg(gkey, seq, qx1, qy1, qx2, qy2)."""
    def axis(c1, d, lo, hi):
        t_in = (f"CASE WHEN {d} > 0 THEN ({lo} - {c1}) / {d} "
                f"WHEN {d} < 0 THEN ({hi} - {c1}) / {d} "
                f"WHEN {c1} >= {lo} THEN CAST('-infinity' AS DOUBLE) "
                f"ELSE CAST('infinity' AS DOUBLE) END")
        t_out = (f"CASE WHEN {d} > 0 THEN ({hi} - {c1}) / {d} "
                 f"WHEN {d} < 0 THEN ({lo} - {c1}) / {d} "
                 f"WHEN {c1} <= {hi} THEN CAST('infinity' AS DOUBLE) "
                 f"ELSE CAST('-infinity' AS DOUBLE) END")
        return t_in, t_out

    tx0, tx1 = axis("x1", "(x2 - x1)", minx, maxx)
    ty0, ty1 = axis("y1", "(y2 - y1)", miny, maxy)
    return f"""
__lt AS (
  SELECT *, greatest(CAST(0.0 AS DOUBLE), {tx0}, {ty0}) AS t0,
            least(CAST(1.0 AS DOUBLE), {tx1}, {ty1}) AS t1
  FROM {src}
),
__lq AS (
  SELECT gkey, seq,
         CAST(floor((x1 + t0 * (x2 - x1)) * {snap}) AS BIGINT) AS qx1,
         CAST(floor((y1 + t0 * (y2 - y1)) * {snap}) AS BIGINT) AS qy1,
         CAST(floor((x1 + t1 * (x2 - x1)) * {snap}) AS BIGINT) AS qx2,
         CAST(floor((y1 + t1 * (y2 - y1)) * {snap}) AS BIGINT) AS qy2
  FROM __lt WHERE t0 < t1
),
__lseg AS (
  SELECT * FROM __lq WHERE qx1 != qx2 OR qy1 != qy2
)"""
