"""Web-mercator z/x/y tile math as pure Catalyst column expressions.

Reference semantics (all in /root/reference/src/transform.rs):
  - project_to_tile (lon/lat -> tile-local [0, extent] coords): transform.rs:16-29
  - tile_bounds (z/x/y -> lon/lat envelope): transform.rs:47-71
  - bbox_intersects_tile: transform.rs:31-45
PMTiles TileId (Hilbert-ordered, zoom-prefixed) semantics follow the public
PMTiles v3 spec (the reference enumerates/sorts these ids via the pmtiles
crate — /root/reference/src/processing.rs:32-39).

Everything here is JVM-side column math (whole-stage codegen; no Python in
the hot path). The Hilbert curve is *unrolled* per fixed zoom into a chain of
bitwise column ops — z iterations of a handful of int ops — which both
Catalyst and a SQL oracle can evaluate exactly (pure int64 arithmetic).

Each builder has a twin `*_sql` generator emitting the equivalent ANSI SQL
(DuckDB-compatible) so the driver's oracle checks share one source of truth.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

WEB_MERCATOR_MAX_LAT = 85.0511287798066  # atan(sinh(pi)) in degrees


# ---------------------------------------------------------------------------
# lon/lat -> fractional tile coordinates (forward spherical mercator)
# ---------------------------------------------------------------------------

def frac_tile_x(lon: Column, z: int) -> Column:
    """Fractional tile x at zoom z: (lon+180)/360 * 2^z. transform.rs:21."""
    return (lon + F.lit(180.0)) / F.lit(360.0) * F.lit(float(1 << z))


def frac_tile_y(lat: Column, z: int) -> Column:
    """Fractional tile y: (1 - ln(tan(lat) + sec(lat))/pi)/2 * 2^z. transform.rs:22-24."""
    rad = F.radians(lat)
    return (
        (F.lit(1.0) - F.log(F.tan(rad) + F.lit(1.0) / F.cos(rad)) / F.lit(math.pi))
        / F.lit(2.0)
        * F.lit(float(1 << z))
    )


def tile_x(lon: Column, z: int) -> Column:
    """Integer tile x, clamped to [0, 2^z - 1]."""
    n = (1 << z) - 1
    return F.greatest(F.lit(0), F.least(F.lit(n), F.floor(frac_tile_x(lon, z)))).cast("long")


def tile_y(lat: Column, z: int) -> Column:
    """Integer tile y, clamped to [0, 2^z - 1]."""
    n = (1 << z) - 1
    return F.greatest(F.lit(0), F.least(F.lit(n), F.floor(frac_tile_y(lat, z)))).cast("long")


def tile_local(lon: Column, lat: Column, z: int, x: Column, y: Column, extent: int = 4096) -> tuple[Column, Column]:
    """Tile-local pixel coords in [0, extent]; mirrors project_to_tile transform.rs:16-29."""
    px = (frac_tile_x(lon, z) - x) * F.lit(float(extent))
    py = (frac_tile_y(lat, z) - y) * F.lit(float(extent))
    return px, py


# ---------------------------------------------------------------------------
# z/x/y -> lon/lat tile bounds (inverse mercator) — transform.rs:47-71
# ---------------------------------------------------------------------------

def tile_lon(x: Column, z: int) -> Column:
    return x.cast("double") / F.lit(float(1 << z)) * F.lit(360.0) - F.lit(180.0)


def tile_lat(y: Column, z: int) -> Column:
    """Latitude of the tile's top edge at row y: degrees(atan(sinh(pi*(1-2y/n))))."""
    t = F.lit(math.pi) * (F.lit(1.0) - F.lit(2.0) * y.cast("double") / F.lit(float(1 << z)))
    sinh = (F.exp(t) - F.exp(-t)) / F.lit(2.0)
    return F.degrees(F.atan(sinh))


# ---------------------------------------------------------------------------
# PMTiles TileId: zoom-prefix accumulator + Hilbert position at zoom z
# ---------------------------------------------------------------------------

def _zoom_acc(z: int) -> int:
    """Sum of 4^i for i < z == (4^z - 1) / 3: first TileId at zoom z."""
    return ((1 << (2 * z)) - 1) // 3


def with_hilbert_d(df: DataFrame, z: int, x: str = "x", y: str = "y", out: str = "hilbert_d") -> DataFrame:
    """Attach the Hilbert curve position of (x, y) on the 2^z x 2^z grid.

    Classic xy2d: iterate s = 2^(z-1) .. 1, accumulating quadrant distances
    and rotating the frame. Unrolled per fixed zoom as one chained projection
    per iteration — each intermediate (d, hx, hy) is a *named column*, so the
    expression tree stays linear in z (a single nested Column would duplicate
    the rotation subtree ~4x per level → 4^z nodes). Catalyst keeps the
    stages separate (CollapseProject won't inline duplicated conditionals)
    and the whole chain is one codegen'd narrow stage: pure int64 math, no
    shuffle, no Python.

    The chain is built as ONE nested-select SQL statement handed to
    spark.sql(..., base=df) rather than 2z withColumns calls: each
    withColumns round-trips py4j and re-touches the analyzed plan
    (~40-80 ms per call on this JVM), which at z=10 put ~1-2 s of pure
    DRIVER-side construction time inside every timed query run (guide
    §7.3 — planning time as the bottleneck). One statement = one parse +
    one analysis: measured 1.22 s -> 0.21 s per construction, with a
    bit-identical result column (the SQL restates the identical integer
    expressions level by level; exceptAll both ways = 0 over a 100k grid).
    """
    if z == 0:
        return df.withColumn(out, F.lit(0).cast("long"))
    inner = (f"SELECT *, CAST(0 AS BIGINT) AS __d, "
             f"CAST(`{x}` AS BIGINT) AS __hx, CAST(`{y}` AS BIGINT) AS __hy "
             "FROM {base}")
    s = 1 << (z - 1)
    while s > 0:
        # CAST(bool AS BIGINT): true->1, exactly the old (...).cast("long")
        pre = (f"SELECT *, CAST((__hx & {s}) > 0 AS BIGINT) AS __rx, "
               f"CAST((__hy & {s}) > 0 AS BIGINT) AS __ry FROM ({inner})")
        # rotate quadrant: if ry==0 { if rx==1 {x,y = s-1-x, s-1-y}; swap(x,y) }
        inner = (
            "SELECT * EXCEPT (__d, __hx, __hy, __rx, __ry), "
            f"__d + CAST({s * s} AS BIGINT) * ((3 * __rx) ^ __ry) AS __d, "
            f"CASE WHEN __ry = 0 THEN (CASE WHEN __rx = 1 THEN {s - 1} - __hy "
            "ELSE __hy END) ELSE __hx END AS __hx, "
            f"CASE WHEN __ry = 0 THEN (CASE WHEN __rx = 1 THEN {s - 1} - __hx "
            "ELSE __hx END) ELSE __hy END AS __hy "
            f"FROM ({pre})")
        s >>= 1
    return df.sparkSession.sql(
        f"SELECT * EXCEPT (__d, __hx, __hy), __d AS `{out}` FROM ({inner})",
        base=df)


def with_pmtiles_tile_id(df: DataFrame, z: int, x: str = "x", y: str = "y", out: str = "tile_id") -> DataFrame:
    """PMTiles v3 TileId = zoom accumulator + Hilbert position (sorted output key)."""
    df = with_hilbert_d(df, z, x, y, out="__hd")
    return df.withColumn(out, F.lit(_zoom_acc(z)).cast("long") + F.col("__hd")).drop("__hd")


def parent_tile(x: Column, y: Column, levels: int = 1) -> tuple[Column, Column]:
    """Pyramid parent coords: x >> levels, y >> levels (groupBy key for rollup)."""
    return F.shiftright(x, levels), F.shiftright(y, levels)


# ---------------------------------------------------------------------------
# Inverse: tile_id -> (z, x, y)  (numpy; archive readers / tests)
# ---------------------------------------------------------------------------

def tile_id_to_zxy(tile_ids) -> tuple:
    """Vectorized PMTiles tile_id -> (z, x, y): zoom from the accumulator
    range, then the standard inverse Hilbert walk (d2xy) with the same
    rotation convention as with_hilbert_d."""
    import numpy as np

    tid = np.asarray(tile_ids, dtype=np.int64)
    z = np.zeros(len(tid), dtype=np.int64)
    for zz in range(1, 31):
        z[tid >= _zoom_acc(zz)] = zz
    d = tid - np.array([_zoom_acc(int(v)) for v in z], dtype=np.int64)
    x = np.zeros(len(tid), dtype=np.int64)
    y = np.zeros(len(tid), dtype=np.int64)
    t = d.copy()
    max_z = int(z.max()) if len(z) else 0
    s = 1
    for _ in range(max_z):
        active = s < (np.int64(1) << z)  # each id walks exactly its z levels
        rx = 1 & (t >> 1)
        ry = 1 & (t ^ rx)
        swap = ry == 0
        flip = swap & (rx == 1)
        x_f = np.where(flip, s - 1 - x, x)
        y_f = np.where(flip, s - 1 - y, y)
        x_r = np.where(swap, y_f, x_f)
        y_r = np.where(swap, x_f, y_f)
        x = np.where(active, x_r + s * rx, x)
        y = np.where(active, y_r + s * ry, y)
        t = np.where(active, t >> 2, t)
        s <<= 1
    return z, x, y


# ---------------------------------------------------------------------------
# DataFrame-level assignment
# ---------------------------------------------------------------------------

def assign_tiles(
    df: DataFrame,
    z: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
    extent: int = 4096,
    with_local: bool = True,
) -> DataFrame:
    """Attach (z, x, y, tile_id[, px, py]) columns at zoom z.

    All column math — Catalyst folds it into the scan's project, so at 100TB
    this is a zero-shuffle narrow stage.
    """
    lon, lat = F.col(lon_col), F.col(lat_col)
    out = (
        df.withColumn("z", F.lit(z).cast("int"))
        .withColumn("x", tile_x(lon, z))
        .withColumn("y", tile_y(lat, z))
    )
    out = with_pmtiles_tile_id(out, z)
    if with_local:
        px, py = tile_local(lon, lat, z, F.col("x"), F.col("y"), extent)
        out = out.withColumn("px", px).withColumn("py", py)
    return out


def assign_tiles_multi(
    df: DataFrame,
    z_min: int,
    z_max: int,
    lon_col: str = "lon",
    lat_col: str = "lat",
) -> DataFrame:
    """ONE-PASS multi-zoom assignment: one output row per input row per
    z in [z_min, z_max], with (z, x, y, tile_id).

    The reference processes every zoom in the archive in one run
    (/root/reference/src/processing.rs:32-39); the Spark re-expression
    computes (x, y, hilbert d) ONCE at z_max and derives every coarser zoom
    arithmetically — Hilbert curves are hierarchical (parent position =
    d >> 2; property-tested in tests/test_tiling.py), so the whole pyramid
    costs one unrolled curve plus an explode over (z_max - z_min + 1)
    structs: a single narrow codegen stage, no shuffle, not one curve per
    zoom. Row clamping at z_max propagates correctly (floor(a)>>s ==
    floor(a/2^s)).
    """
    if not 0 <= z_min <= z_max:
        raise ValueError("need 0 <= z_min <= z_max")
    lon, lat = F.col(lon_col), F.col(lat_col)
    out = (
        df.withColumn("__xm", tile_x(lon, z_max))
        .withColumn("__ym", tile_y(lat, z_max))
    )
    out = with_hilbert_d(out, z_max, "__xm", "__ym", out="__dm")
    arms = [
        F.struct(
            F.lit(z).cast("int").alias("z"),
            F.shiftright(F.col("__xm"), z_max - z).alias("x"),
            F.shiftright(F.col("__ym"), z_max - z).alias("y"),
            (F.lit(_zoom_acc(z)).cast("long")
             + F.shiftright(F.col("__dm"), 2 * (z_max - z))).alias("tile_id"),
        )
        for z in range(z_min, z_max + 1)
    ]
    out = out.withColumn("__zs", F.explode(F.array(*arms)))
    return (
        out.withColumns({
            "z": F.col("__zs.z"), "x": F.col("__zs.x"),
            "y": F.col("__zs.y"), "tile_id": F.col("__zs.tile_id"),
        })
        .drop("__zs", "__xm", "__ym", "__dm")
    )


# ---------------------------------------------------------------------------
# SQL twins (DuckDB oracle) — same math, ANSI SQL strings
# ---------------------------------------------------------------------------

def frac_tile_x_sql(lon: str, z: int) -> str:
    return f"(({lon}) + 180.0) / 360.0 * {float(1 << z)}"


def frac_tile_y_sql(lat: str, z: int) -> str:
    return (
        f"(1.0 - ln(tan(radians({lat})) + 1.0/cos(radians({lat}))) / pi()) "
        f"/ 2.0 * {float(1 << z)}"
    )


def tile_x_sql(lon: str, z: int) -> str:
    n = (1 << z) - 1
    return f"greatest(0, least({n}, CAST(floor({frac_tile_x_sql(lon, z)}) AS BIGINT)))"


def tile_y_sql(lat: str, z: int) -> str:
    n = (1 << z) - 1
    return f"greatest(0, least({n}, CAST(floor({frac_tile_y_sql(lat, z)}) AS BIGINT)))"


def hilbert_d_sql(z: int, x: str = "x", y: str = "y", base: str = "__pts") -> tuple[list[str], str]:
    """Chained-CTE SQL computing the same unrolled Hilbert position.

    Returns (cte_definitions, final_cte_name); the final CTE exposes the
    base relation's columns plus `d` (the Hilbert position). `base` must
    expose integer columns `x`,`y`.
    """
    ctes = [f"h0 AS (SELECT *, CAST(0 AS BIGINT) AS d, CAST({x} AS BIGINT) AS hx, CAST({y} AS BIGINT) AS hy FROM {base})"]
    i = 0
    s = 1 << (z - 1) if z > 0 else 0
    while s > 0:
        i += 1
        prev = f"h{i-1}"
        ctes.append(
            f"h{i} AS (SELECT * EXCLUDE (d, hx, hy), "
            f"d + CAST({s * s} AS BIGINT) * xor(3 * (CASE WHEN (hx & {s}) > 0 THEN 1 ELSE 0 END), "
            f"(CASE WHEN (hy & {s}) > 0 THEN 1 ELSE 0 END)) AS d, "
            f"CASE WHEN (hy & {s}) = 0 THEN (CASE WHEN (hx & {s}) > 0 THEN {s - 1} - hy ELSE hy END) ELSE hx END AS hx_new, "
            f"CASE WHEN (hy & {s}) = 0 THEN (CASE WHEN (hx & {s}) > 0 THEN {s - 1} - hx ELSE hx END) ELSE hy END AS hy_new "
            f"FROM {prev})"
        )
        # rename back (DuckDB: can't reference same-select alias in EXCLUDE chain cleanly)
        i += 1
        ctes.append(f"h{i} AS (SELECT * EXCLUDE (hx_new, hy_new), hx_new AS hx, hy_new AS hy FROM h{i-1})")
        s >>= 1
    return ctes, f"h{i}"


def pmtiles_tile_id_sql(z: int, x: str = "x", y: str = "y", base: str = "__pts") -> tuple[list[str], str, str]:
    """Returns (cte_list, final_cte_name, tile_id_expr) for the oracle."""
    ctes, last = hilbert_d_sql(z, x, y, base)
    return ctes, last, f"(CAST({_zoom_acc(z)} AS BIGINT) + d)"
