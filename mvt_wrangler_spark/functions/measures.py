"""Geometry measures over vertex-array columns — pure codegen column math.

The MVT post-processing measures a tile pipeline runs per feature: ring area
(the drop-tiny-polygons filter most tile simplifiers apply at low zooms),
perimeter, polygon centroid (label placement), polyline length, bbox.
Reference analog: mvt-wrangler's per-feature geometry walk (src/mvt.rs
geometry decode loop) exposes exactly these vertex sequences; the measures
themselves are the standard computational-geometry forms computed over them.

All functions take `array<long>` xs/ys TILE-LOCAL integer coordinates (the
MVT wire format's native space, 0..extent) and stay integer-exact:

  * shoelace 2A and centroid numerators are integer polynomials of the
    vertices — no float rounding, so the DuckDB oracle twins are bit-exact
    and order-of-summation independent;
  * centroid is returned as an exact rational (cx_num, cy_num, 3*signed 2A
    denominator) instead of a lossy float divide;
  * perimeter/length are returned as Σ of squared segment lengths (exact)
    — callers that need metric length apply sqrt per segment downstream.

Everything here is a Column expression (zip_with / aggregate / slice /
array_min) — whole-stage codegen, no Python in the hot path, safe under
ANSI overflow rules for extent ≤ 2^20 and rings ≤ 2^20 vertices
(|terms| ≤ 2^40 each, Σ ≤ 2^60 < int64 max).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _rot1(arr: Column) -> Column:
    """Array rotated left by one: [a1..an] -> [a2..an, a1] (ring successor)."""
    n = F.size(arr)
    return F.concat(F.slice(arr, 2, n - 1), F.slice(arr, 1, 1))


def _isum(arr: Column) -> Column:
    """Exact integer sum of an array<long> (left fold, no float)."""
    return F.aggregate(arr, F.lit(0).cast("long"), lambda acc, x: acc + x)


def cross_terms(xs: Column, ys: Column) -> Column:
    """Per-edge shoelace terms x_i*y_{i+1} - x_{i+1}*y_i (ring-closed)."""
    a = F.zip_with(xs, _rot1(ys), lambda x, y: x * y)
    b = F.zip_with(_rot1(xs), ys, lambda x, y: x * y)
    return F.zip_with(a, b, lambda p, q: p - q)


def shoelace_area2_signed(xs: Column, ys: Column) -> Column:
    """Signed 2*area of the ring (positive = counter-clockwise in y-up)."""
    return _isum(cross_terms(xs, ys))


def shoelace_area2(xs: Column, ys: Column) -> Column:
    """|2*area| of the ring — integer-exact tiny-polygon filter key."""
    return F.abs(shoelace_area2_signed(xs, ys))


def centroid_nums(xs: Column, ys: Column) -> tuple[Column, Column, Column]:
    """Polygon centroid as an exact rational: (cx_num, cy_num, den) with
    centroid = (cx_num/den, cy_num/den), den = 3 * signed 2A.

    Cx = Σ (x_i + x_{i+1}) * cross_i / (3 * 2A) — all-integer numerators.
    """
    cr = cross_terms(xs, ys)
    sx = F.zip_with(xs, _rot1(xs), lambda a, b: a + b)
    sy = F.zip_with(ys, _rot1(ys), lambda a, b: a + b)
    cx_num = _isum(F.zip_with(sx, cr, lambda s, c: s * c))
    cy_num = _isum(F.zip_with(sy, cr, lambda s, c: s * c))
    den = F.lit(3).cast("long") * shoelace_area2_signed(xs, ys)
    return cx_num, cy_num, den


def _seg2(xs: Column, ys: Column, closed: bool) -> Column:
    """Array of squared segment lengths; ring-closed or open polyline."""
    nx = _rot1(xs) if closed else F.slice(xs, 2, F.size(xs) - 1)
    ny = _rot1(ys) if closed else F.slice(ys, 2, F.size(ys) - 1)
    bx = xs if closed else F.slice(xs, 1, F.size(xs) - 1)
    by = ys if closed else F.slice(ys, 1, F.size(ys) - 1)
    dx = F.zip_with(nx, bx, lambda a, b: a - b)
    dy = F.zip_with(ny, by, lambda a, b: a - b)
    return F.zip_with(dx, dy, lambda a, b: a * a + b * b)


def perimeter2_sum(xs: Column, ys: Column) -> Column:
    """Σ squared segment lengths around the closed ring (integer-exact)."""
    return _isum(_seg2(xs, ys, closed=True))


def polyline_len2_sum(xs: Column, ys: Column) -> Column:
    """Σ squared segment lengths along the OPEN polyline (integer-exact)."""
    return _isum(_seg2(xs, ys, closed=False))


def bbox_cols(xs: Column, ys: Column) -> tuple[Column, Column, Column, Column]:
    """(minx, miny, maxx, maxy) of the vertex arrays."""
    return F.array_min(xs), F.array_min(ys), F.array_max(xs), F.array_max(ys)


# ---------------------------------------------------------------------------
# DuckDB SQL twins — same integer polynomials via window lead() with ring
# wrap-around; integer sums are order-independent so GROUP BY order is moot.
# ---------------------------------------------------------------------------

MEASURES_SQL_TEMPLATE = """
__seg AS (
  SELECT {key} AS gkey, {x} AS x, {y} AS y,
         coalesce(lead({x}) OVER w, first_value({x}) OVER wf) AS xn,
         coalesce(lead({y}) OVER w, first_value({y}) OVER wf) AS yn,
         (lead({x}) OVER w IS NULL) AS wrap
  FROM {src}
  WINDOW w  AS (PARTITION BY {key} ORDER BY {ord}),
         wf AS (PARTITION BY {key} ORDER BY {ord}
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
__m AS (
  -- DuckDB sum(BIGINT) returns HUGEINT (int128); CAST every sum back to
  -- BIGINT so downstream canonicalizers hash the same lexical form as the
  -- Spark int64 values (values provably fit: |Σ| <= 2^60, see module doc).
  SELECT gkey,
         count(*) AS n_vertices,
         CAST(sum(x*yn - xn*y) AS BIGINT) AS a2_signed,
         CAST(sum((x + xn) * (x*yn - xn*y)) AS BIGINT) AS cx_num,
         CAST(sum((y + yn) * (x*yn - xn*y)) AS BIGINT) AS cy_num,
         CAST(sum((xn - x)*(xn - x) + (yn - y)*(yn - y)) AS BIGINT) AS perim2,
         CAST(sum(CASE WHEN wrap THEN 0
                  ELSE (xn - x)*(xn - x) + (yn - y)*(yn - y) END) AS BIGINT)
             AS len2_open,
         min(x) AS minx, min(y) AS miny, max(x) AS maxx, max(y) AS maxy
  FROM __seg GROUP BY gkey
)
"""


def measures_sql(src: str, key: str, x: str, y: str, ord_col: str) -> str:
    """CTE computing per-group ring measures; exposes __m(gkey, n_vertices,
    a2_signed, cx_num, cy_num, perim2, len2_open, minx, miny, maxx, maxy)."""
    return MEASURES_SQL_TEMPLATE.format(src=src, key=key, x=x, y=y, ord=ord_col)


def normalize_winding(rings, xs_col: str = "xs", ys_col: str = "ys",
                      ccw: bool = True):
    """Force ring orientation: reverse vertex arrays whose signed shoelace
    area disagrees with the target (MVT encoders require exterior rings in
    a fixed winding or fills invert; the reference's geometry walk hands
    rings to the encoder in decoded order). Adds `was_reversed`; zero-area
    (degenerate) rings pass through unchanged. Pure codegen: the sign test
    is the existing integer shoelace, the flip is F.reverse — no shuffle,
    no Python."""
    from pyspark.sql import functions as F

    sign = shoelace_area2_signed(F.col(xs_col), F.col(ys_col))
    rev = (sign < 0) if ccw else (sign > 0)
    # decide ONCE, then flip both arrays off the materialized flag: reusing
    # the raw `rev` expression in the second withColumn would re-resolve it
    # against the already-reversed xs (sign flips -> ys never reverses)
    flag = F.col("was_reversed")
    return (rings
            .withColumn("was_reversed", rev)
            .withColumn(xs_col, F.when(flag, F.reverse(F.col(xs_col)))
                        .otherwise(F.col(xs_col)))
            .withColumn(ys_col, F.when(flag, F.reverse(F.col(ys_col)))
                        .otherwise(F.col(ys_col))))
