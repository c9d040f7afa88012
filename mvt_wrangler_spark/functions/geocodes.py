"""Geohash and Bing quadkey encodes — pure codegen, no Python in the plan.

Two more cell systems alongside H3/S2/tile_id (functions/cells.py,
functions/tiling.py): the base32 geohash (Niemeyer's public algorithm:
interleave quantized lon/lat bits msb-first, lon first, 5 bits per char)
and the Bing Maps quadkey (z base-4 digits, digit = x bit + 2*y bit,
msb-first). Both are deterministic integer/float column math with
bit-identical DuckDB twins.

The 64-bit bit-spread (Morton part1by1) is chained through withColumns
stages — inlining the 5 mask steps into one Column doubles the Catalyst
tree per step (x appears twice per step), so each step materializes one
named column instead (same pattern as the Hilbert chain in tiling.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GEOHASH32 = "0123456789bcdefghjkmnpqrstuvwxyz"

# part1by1 spread masks: 20-bit input -> bits at even positions of a 40-bit
# value (classic Morton magic numbers; all constants < 2^63, ANSI-safe)
_SPREAD = [
    (16, 0x0000FFFF0000FFFF),
    (8, 0x00FF00FF00FF00FF),
    (4, 0x0F0F0F0F0F0F0F0F),
    (2, 0x3333333333333333),
    (1, 0x5555555555555555),
]


def _quant(v: Column, lo: float, hi: float, bits: int) -> Column:
    """floor((v-lo)/(hi-lo) * 2^bits), clamped to [0, 2^bits-1]."""
    n = 1 << bits
    q = F.floor((v - F.lit(lo)) / F.lit(hi - lo) * F.lit(float(n)))
    return F.greatest(F.lit(0), F.least(F.lit(n - 1), q)).cast("long")


def with_geohash(df: DataFrame, lon: str, lat: str, precision: int = 8,
                 out_col: str = "geohash") -> DataFrame:
    """Add the `precision`-char geohash of (lon, lat).

    precision=8 consumes 40 bits = 20 lon + 20 lat, so both quantizations
    are plain 20-bit grids (geohash's alternating-bit definition lands on
    equal splits at even precisions).
    """
    if precision % 2:
        raise ValueError("even precision only (equal lon/lat bit split)")
    bits = 5 * precision // 2
    d = df.withColumns({
        "__ghx": _quant(F.col(lon), -180.0, 180.0, bits),
        "__ghy": _quant(F.col(lat), -90.0, 90.0, bits),
    })
    for sh, mask in _SPREAD:
        d = d.withColumns({
            "__ghx": (F.col("__ghx").bitwiseOR(F.shiftleft("__ghx", sh))
                      .bitwiseAND(F.lit(mask))),
            "__ghy": (F.col("__ghy").bitwiseOR(F.shiftleft("__ghy", sh))
                      .bitwiseAND(F.lit(mask))),
        })
    d = d.withColumn(
        "__ghv", F.shiftleft("__ghx", 1).bitwiseOR(F.col("__ghy")))
    alpha = F.array(*[F.lit(c) for c in GEOHASH32])
    nbits = 5 * precision
    chars = [
        F.element_at(alpha, (F.shiftrightunsigned("__ghv", nbits - 5 * (c + 1))
                             .bitwiseAND(F.lit(31)) + F.lit(1)).cast("int"))
        for c in range(precision)
    ]
    return (d.withColumn(out_col, F.concat(*chars))
            .drop("__ghx", "__ghy", "__ghv"))


def quadkey(x: Column, y: Column, z: int) -> Column:
    """Bing quadkey: z base-4 digits msb-first, digit = x_bit + 2*y_bit."""
    digits = [
        (F.shiftrightunsigned(x, k).bitwiseAND(F.lit(1))
         + F.shiftleft(F.shiftrightunsigned(y, k).bitwiseAND(F.lit(1)), 1)
         ).cast("string")
        for k in range(z - 1, -1, -1)
    ]
    return F.concat(*digits)


# ---------------------------------------------------------------------------
# DuckDB twins — identical arithmetic, chained CTEs for the spread stages
# ---------------------------------------------------------------------------

def geohash_sql(lon: str, lat: str, precision: int, base: str,
                prefix: str = "__gh") -> tuple[list[str], str, str]:
    """Chained-CTE SQL for the same geohash. Returns (ctes, last, expr)."""
    assert precision % 2 == 0
    bits = 5 * precision // 2
    n = 1 << bits
    q = (f"{prefix}0 AS (SELECT *, "
         f"CAST(greatest(0, least({n - 1}, floor(({lon} + 180.0) / 360.0 * {float(n)}))) AS BIGINT) AS ghx, "
         f"CAST(greatest(0, least({n - 1}, floor(({lat} + 90.0) / 180.0 * {float(n)}))) AS BIGINT) AS ghy "
         f"FROM {base})")
    ctes = [q]
    last = f"{prefix}0"
    for i, (sh, mask) in enumerate(_SPREAD, start=1):
        nxt = f"{prefix}{i}"
        ctes.append(
            f"{nxt} AS (SELECT * REPLACE ("
            f"(ghx | (ghx << {sh})) & {mask} AS ghx, "
            f"(ghy | (ghy << {sh})) & {mask} AS ghy) FROM {last})")
        last = nxt
    nbits = 5 * precision
    val = "((ghx << 1) | ghy)"
    parts = [
        f"substr('{GEOHASH32}', CAST((({val} >> {nbits - 5 * (c + 1)}) & 31) AS INT) + 1, 1)"
        for c in range(precision)
    ]
    return ctes, last, " || ".join(parts)


def quadkey_sql(x: str, y: str, z: int) -> str:
    parts = [
        f"CAST((({x} >> {k}) & 1) + 2 * (({y} >> {k}) & 1) AS VARCHAR)"
        for k in range(z - 1, -1, -1)
    ]
    return " || ".join(parts)
