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


def halfplane_sql(pid: str, verts: list[tuple[float, float]]) -> str:
    """Convex CCW polygon containment as a conjunction of edge half-planes."""
    conds = []
    n = len(verts)
    for i in range(n):
        x1, y1 = verts[i]
        x2, y2 = verts[(i + 1) % n]
        conds.append(
            f"(({x2!r} - {x1!r}) * (lat - {y1!r}) - ({y2!r} - {y1!r}) * (lon - {x1!r})) >= 0"
        )
    return " AND ".join(conds)
