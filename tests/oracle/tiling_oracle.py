"""Pure-Python single-node reimplementation of the tiling semantics.

Plays the role the Rust binary plays for the reference's golden tests
(/root/reference/tests/integration_test.rs): an independent oracle the
Spark engine is compared against row-for-row.
"""

from __future__ import annotations

import math


def frac_xy(lon: float, lat: float, z: int) -> tuple[float, float]:
    n = float(1 << z)
    fx = (lon + 180.0) / 360.0 * n
    rad = math.radians(lat)
    fy = (1.0 - math.log(math.tan(rad) + 1.0 / math.cos(rad)) / math.pi) / 2.0 * n
    return fx, fy


def tile_xy(lon: float, lat: float, z: int) -> tuple[int, int]:
    fx, fy = frac_xy(lon, lat, z)
    m = (1 << z) - 1
    return max(0, min(m, math.floor(fx))), max(0, min(m, math.floor(fy)))


def tile_local(lon: float, lat: float, z: int, x: int, y: int, extent: int = 4096) -> tuple[float, float]:
    fx, fy = frac_xy(lon, lat, z)
    return (fx - x) * extent, (fy - y) * extent


def tile_bounds(z: int, x: int, y: int) -> tuple[float, float, float, float]:
    """(min_lon, min_lat, max_lon, max_lat) — transform.rs:47-71 semantics."""

    def lat_of(yy: int) -> float:
        t = math.pi * (1.0 - 2.0 * yy / float(1 << z))
        return math.degrees(math.atan(math.sinh(t)))

    n = float(1 << z)
    return (x / n * 360.0 - 180.0, lat_of(y + 1), (x + 1) / n * 360.0 - 180.0, lat_of(y))


def hilbert_d(z: int, x: int, y: int) -> int:
    """Classic xy2d Hilbert position (the PMTiles ordering)."""
    d = 0
    s = 1 << (z - 1) if z > 0 else 0
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s >>= 1
    return d


def pmtiles_tile_id(z: int, x: int, y: int) -> int:
    return ((1 << (2 * z)) - 1) // 3 + hilbert_d(z, x, y)
