"""Deterministic point synthesis from the driver's TPC-H-ish testdata.

The driver's correctness gate compares Spark queries against DuckDB oracle
SQL over the SAME parquet tables, so the spatial engine's oracle-checked
queries derive lon/lat/phash deterministically from lineitem keys with pure
integer arithmetic — bit-identical in both engines. (The engine's real input
is the images table, sources/images.py; this module exists so every spatial
operator gets an independently-checkable twin.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def synth_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """id, lon, lat, phash, layer, kind from lineitem — pure column math."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    lon_md = F.pmod(ok * 7919 + ln * 104729, F.lit(360000)) - 180000
    lat_md = F.pmod(ok * 104729 + ln * 7919, F.lit(170000)) - 85000
    kinds = ["park", "school", "building", "hospital", "shop", "road"]
    layer = (
        F.when(F.pmod(ok + ln, F.lit(6)).isin(0, 1, 3, 4), "pois")
        .when(F.pmod(ok + ln, F.lit(6)) == 2, "buildings")
        .otherwise("roads")
    )
    kind_expr = F.element_at(F.array(*[F.lit(k) for k in kinds]),
                             (F.pmod(ok + ln, F.lit(6)) + 1).cast("int"))
    return li.select(
        (ok * 8 + ln).alias("id"),
        (lon_md.cast("double") / 1000.0).alias("lon"),
        (lat_md.cast("double") / 1000.0).alias("lat"),
        F.pmod(ok * 131 + ln * 7, F.lit(5000)).alias("phash"),
        layer.alias("layer"),
        kind_expr.alias("kind"),
    )


POINTS_SQL = """
SELECT CAST(l_orderkey*8 + l_linenumber AS BIGINT) AS id,
       CAST(((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 360000 + 360000) % 360000 - 180000 AS DOUBLE) / 1000.0 AS lon,
       CAST(((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 170000 + 170000) % 170000 - 85000 AS DOUBLE) / 1000.0 AS lat,
       CAST(((l_orderkey*131 + CAST(l_linenumber AS BIGINT)*7) % 5000 + 5000) % 5000 AS BIGINT) AS phash,
       CASE WHEN ((l_orderkey + l_linenumber) % 6) IN (0,1,3,4) THEN 'pois'
            WHEN ((l_orderkey + l_linenumber) % 6) = 2 THEN 'buildings'
            ELSE 'roads' END AS layer,
       (['park','school','building','hospital','shop','road'])[CAST((l_orderkey + l_linenumber) % 6 AS INT) + 1] AS kind
FROM lineitem
"""


def synth_xyz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """id, x, y, z unit-sphere points from lineitem integers — NO trig.

    lat/lng -> xyz needs sin/cos, which are not correctly-rounded and can
    differ by 1 ulp between the JVM and libm; synthesizing xyz directly from
    integers (+0.25 so no component is 0) and normalizing with sqrt (IEEE
    correctly-rounded) keeps the cell-encode oracle bit-exact end to end.
    """
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    x0 = (F.pmod(ok * 7919 + ln * 104729, F.lit(2001)) - 1000).cast("double") + 0.25
    y0 = (F.pmod(ok * 104729 + ln * 7919, F.lit(2001)) - 1000).cast("double") + 0.25
    z0 = (F.pmod(ok * 52379 + ln * 31337, F.lit(2001)) - 1000).cast("double") + 0.25
    r = F.sqrt(x0 * x0 + y0 * y0 + z0 * z0)
    return li.select(
        (ok * 8 + ln).alias("id"),
        (x0 / r).alias("x"), (y0 / r).alias("y"), (z0 / r).alias("z"),
    )


def _imod(expr: str, m: int) -> str:
    return f"(({expr}) % {m} + {m}) % {m}"


XYZ_SQL = f"""
SELECT id, x0 / r AS x, y0 / r AS y, z0 / r AS z FROM (
  SELECT id, x0, y0, z0, sqrt(x0*x0 + y0*y0 + z0*z0) AS r FROM (
    SELECT CAST(l_orderkey*8 + l_linenumber AS BIGINT) AS id,
           CAST({_imod('l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729', 2001)} - 1000 AS DOUBLE) + 0.25 AS x0,
           CAST({_imod('l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919', 2001)} - 1000 AS DOUBLE) + 0.25 AS y0,
           CAST({_imod('l_orderkey*52379 + CAST(l_linenumber AS BIGINT)*31337', 2001)} - 1000 AS DOUBLE) + 0.25 AS z0
    FROM lineitem))
"""


# Convex CCW hexagons used by the oracle-checked PIP join: vertices are
# Python floats embedded as literals on both sides (identical doubles).
def hexagon(cx: float, cy: float, r: float) -> list[tuple[float, float]]:
    import math

    return [
        (cx + r * math.cos(a), cy + r * math.sin(a))
        for a in [i * math.pi / 3.0 + 0.1 for i in range(6)]
    ]


PIP_POLYGONS = [
    ("adm_a", hexagon(60.0, 30.0, 25.0)),
    ("adm_b", hexagon(-100.0, -40.0, 30.0)),
    ("adm_c", hexagon(139.0, 35.0, 12.0)),
]


def halfplane_sql(pid: str, verts: list[tuple[float, float]],
                  x: str = "lon", y: str = "lat") -> str:
    """Convex CCW polygon containment as a conjunction of edge half-planes."""
    conds = []
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        conds.append(
            f"(({x2!r} - {x1!r}) * ({y} - {y1!r}) - ({y2!r} - {y1!r}) * ({x} - {x1!r})) >= 0"
        )
    return "(" + " AND ".join(conds) + ")"


# ---------------------------------------------------------------------------
# General geometries (Point / LineString / Polygon features) + intersects SQL
# ---------------------------------------------------------------------------

def synth_geoms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """id, geom_type, xs, ys — mixed-geometry features from lineitem integers
    (1/3 points, 1/3 two-vertex linestrings, 1/3 triangles). The scalar
    vertex formulas are mirrored by GEOMS_SQL so the intersects oracle is
    value-exact."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    ok, ln = F.col("l_orderkey"), F.col("l_linenumber").cast("long")
    lon = (F.pmod(ok * 7919 + ln * 104729, F.lit(360000)) - 180000).cast("double") / 1000.0
    lat = (F.pmod(ok * 104729 + ln * 7919, F.lit(170000)) - 85000).cast("double") / 1000.0
    a = (F.pmod(ok * 37 + ln * 11, F.lit(33)) - 16).cast("double") * 0.9 + 0.25
    b = (F.pmod(ok * 11 + ln * 37, F.lit(29)) - 14).cast("double") * 0.9 + 0.25
    c = (F.pmod(ok * 23 + ln * 41, F.lit(27)) - 13).cast("double") * 0.7 + 0.25
    d = (F.pmod(ok * 41 + ln * 23, F.lit(25)) - 12).cast("double") * 0.7 + 0.25
    sel = F.pmod(ok + ln, F.lit(3))
    gtype = (F.when(sel == 0, "Point").when(sel == 1, "LineString")
             .otherwise("Polygon"))
    xs = (F.when(sel == 0, F.array(lon))
          .when(sel == 1, F.array(lon, lon + a))
          .otherwise(F.array(lon, lon + a, lon + c)))
    ys = (F.when(sel == 0, F.array(lat))
          .when(sel == 1, F.array(lat, lat + b))
          .otherwise(F.array(lat, lat + b, lat + d)))
    return li.select((ok * 8 + ln).alias("id"), gtype.alias("geom_type"),
                     xs.alias("xs"), ys.alias("ys"))


GEOMS_SQL = """
SELECT id, CASE sel WHEN 0 THEN 'Point' WHEN 1 THEN 'LineString' ELSE 'Polygon' END AS geom_type,
       x1, y1, x1 + a AS x2, y1 + b AS y2, x1 + c AS x3, y1 + d AS y3, sel
FROM (
  SELECT CAST(l_orderkey*8 + l_linenumber AS BIGINT) AS id,
         CAST(((l_orderkey*7919 + CAST(l_linenumber AS BIGINT)*104729) % 360000 + 360000) % 360000 - 180000 AS DOUBLE) / 1000.0 AS x1,
         CAST(((l_orderkey*104729 + CAST(l_linenumber AS BIGINT)*7919) % 170000 + 170000) % 170000 - 85000 AS DOUBLE) / 1000.0 AS y1,
         CAST(((l_orderkey*37 + CAST(l_linenumber AS BIGINT)*11) % 33 + 33) % 33 - 16 AS DOUBLE) * 0.9 + 0.25 AS a,
         CAST(((l_orderkey*11 + CAST(l_linenumber AS BIGINT)*37) % 29 + 29) % 29 - 14 AS DOUBLE) * 0.9 + 0.25 AS b,
         CAST(((l_orderkey*23 + CAST(l_linenumber AS BIGINT)*41) % 27 + 27) % 27 - 13 AS DOUBLE) * 0.7 + 0.25 AS c,
         CAST(((l_orderkey*41 + CAST(l_linenumber AS BIGINT)*23) % 25 + 25) % 25 - 12 AS DOUBLE) * 0.7 + 0.25 AS d,
         CAST((l_orderkey + l_linenumber) % 3 AS INT) AS sel
  FROM lineitem)
"""


def seg_cross_sql(ax: str, ay: str, bx: str, by: str,
                  x1: float, y1: float, x2: float, y2: float) -> str:
    """Segment (ax,ay)-(bx,by) crosses literal edge (x1,y1)-(x2,y2) — the
    exact sign-product formula of geometry.segments_cross (operand order
    matched term for term)."""
    d1 = f"(({x2!r} - {x1!r}) * ({ay} - {y1!r}) - ({y2!r} - {y1!r}) * ({ax} - {x1!r}))"
    d2 = f"(({x2!r} - {x1!r}) * ({by} - {y1!r}) - ({y2!r} - {y1!r}) * ({bx} - {x1!r}))"
    d3 = f"(({bx} - {ax}) * ({y1!r} - {ay}) - ({by} - {ay}) * ({x1!r} - {ax}))"
    d4 = f"(({bx} - {ax}) * ({y2!r} - {ay}) - ({by} - {ay}) * ({x2!r} - {ax}))"
    return f"({d1} * {d2} <= 0 AND {d3} * {d4} <= 0)"


def point_in_triangle_sql(px: float, py: float) -> str:
    """Literal point inside the row's triangle (x1..y3 columns): consistent
    orientation signs (boundary-inclusive both ways)."""
    s1 = f"((x2 - x1) * ({py!r} - y1) - (y2 - y1) * ({px!r} - x1))"
    s2 = f"((x3 - x2) * ({py!r} - y2) - (y3 - y2) * ({px!r} - x2))"
    s3 = f"((x1 - x3) * ({py!r} - y3) - (y1 - y3) * ({px!r} - x3))"
    return (f"(({s1} >= 0 AND {s2} >= 0 AND {s3} >= 0) OR "
            f"({s1} <= 0 AND {s2} <= 0 AND {s3} <= 0))")


def geom_intersects_sql(pid: str, verts: list[tuple[float, float]]) -> str:
    """Row geometry (geom_type + x1..y3 from GEOMS_SQL) intersects the convex
    CCW polygon `verts` — same decomposition as geoms_intersect_polygon:
    vertex-in-polygon OR edge crossings OR (triangles) polygon-vertex-in-
    feature."""
    edges = list(zip(verts, verts[1:] + verts[:1]))
    v_in = [halfplane_sql(pid, verts, x=f"x{i}", y=f"y{i}") for i in (1, 2, 3)]

    def seg_any(ax, ay, bx, by):
        return "(" + " OR ".join(
            seg_cross_sql(ax, ay, bx, by, p[0], p[1], q[0], q[1])
            for p, q in edges) + ")"

    point = v_in[0]
    line = f"({v_in[0]} OR {v_in[1]} OR {seg_any('x1','y1','x2','y2')})"
    tri_edges = [("x1", "y1", "x2", "y2"), ("x2", "y2", "x3", "y3"),
                 ("x3", "y3", "x1", "y1")]
    tri_cross = "(" + " OR ".join(seg_any(*e) for e in tri_edges) + ")"
    tri_contains = "(" + " OR ".join(point_in_triangle_sql(p[0], p[1])
                                     for p in verts) + ")"
    poly = (f"({v_in[0]} OR {v_in[1]} OR {v_in[2]} OR {tri_cross} OR {tri_contains})")
    return (f"(CASE sel WHEN 0 THEN {point} WHEN 1 THEN {line} "
            f"ELSE {poly} END)")
