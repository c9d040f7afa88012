"""Raster <-> vector zonal assignment: decoded image pixels -> tile-grid zones.

North-star operator: each image row's pixels are assigned to a gx x gy zone
grid over its tile-local footprint, producing per-(image, zone) pixel stats.
Decode + block-reduce run vectorized in numpy inside one mapInPandas pass
(Arrow batches, no per-row Python beyond the per-image decode loop whose body
is pure numpy). Geometry convention: the image footprint covers
[px, px+w) x [py, py+h) in its tile's local pixel space (transform.rs:16-29
coordinates), so zone boundaries land on tile-local pixel lines.

Real JPEG/PNG decoding is not available in this environment (no PIL); the
raw/rawz/qlossy codecs from sources/images.py stand in. A production decode
would replace `images.decode` inside `_zonal_partition` — the Spark-side
plumbing (schema, batching, partitioning) is identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..sources import images as I

ZONAL_SCHEMA = (
    "image_id string, z int, x bigint, y bigint, zone int, n_px bigint, "
    "mean_r double, mean_g double, mean_b double"
)


def _block_reduce(px: np.ndarray, gx: int, gy: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-zone (gy*gx) pixel counts and per-channel means, pure numpy."""
    h, w, _ = px.shape
    zy = (np.arange(h) * gy) // h
    zx = (np.arange(w) * gx) // w
    zone = (zy[:, None] * gx + zx[None, :]).ravel()  # (h*w,)
    flat = px.reshape(-1, 3).astype(np.float64)
    counts = np.bincount(zone, minlength=gx * gy)
    sums = np.stack([np.bincount(zone, weights=flat[:, c], minlength=gx * gy)
                     for c in range(3)], axis=1)
    means = sums / np.maximum(counts, 1)[:, None]
    return counts, means


def zonal_stats(images_df: DataFrame, gx: int = 2, gy: int = 2) -> DataFrame:
    """Per-(image, zone) decoded-pixel stats; input needs bytes/fmt/w/h/z/x/y."""

    def _zonal_partition(pdfs):
        for pdf in pdfs:
            out = {k: [] for k in ("image_id", "z", "x", "y", "zone",
                                   "n_px", "mean_r", "mean_g", "mean_b")}
            for row in pdf.itertuples(index=False):
                if row.bytes is None:
                    continue
                px = I.decode(bytes(row.bytes), row.fmt, row.w, row.h)
                counts, means = _block_reduce(px, gx, gy)
                nz = gx * gy
                out["image_id"] += [row.image_id] * nz
                out["z"] += [row.z] * nz
                out["x"] += [row.x] * nz
                out["y"] += [row.y] * nz
                out["zone"] += list(range(nz))
                out["n_px"] += counts.tolist()
                out["mean_r"] += means[:, 0].tolist()
                out["mean_g"] += means[:, 1].tolist()
                out["mean_b"] += means[:, 2].tolist()
            yield pd.DataFrame(out)

    cols = ["image_id", "bytes", "fmt", "w", "h", "z", "x", "y"]
    return images_df.select(*cols).mapInPandas(_zonal_partition, ZONAL_SCHEMA)
