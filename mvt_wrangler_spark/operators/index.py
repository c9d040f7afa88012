"""Spatial index BUILD: Hilbert/STR-packed R-tree leaves at scale.

`CREATE SPATIAL INDEX` as a dataflow: sort features by the Hilbert tile id
of their bbox center (the engine's PMTiles key — spatially local ids pack
spatially local features), cut the sorted sequence into runs of `leaf_size`,
and emit each leaf's MBR + feature count. The leaf table IS the index: a
query bbox prunes leaves by MBR overlap (a broadcast-able few-thousand-row
dim for any corpus), then reads only surviving leaves — the same
prefilter-then-refine shape as the engine's grid joins, but persisted.
Packing by a space-filling curve is the standard bulk-load (STR/Hilbert
packing, Leutenegger et al. ICDE'97 / Kamel & Faloutsos VLDB'94 — public).

Determinism + scale: the global sort rank comes from with_global_rank
(range partitioner + per-partition row_number + broadcast offset table —
no single-partition window), ordered by (hilbert_id, feature id) so ties
are impossible; leaf = rank DIV leaf_size; leaf MBRs are min/max
aggregates. Everything is exact integer column math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.metrics import with_global_rank


def pack_rtree_leaves(feats: DataFrame, leaf_size: int,
                      id_col: str = "id", key_col: str = "tile_id",
                      bbox_cols: tuple = ("minx", "miny", "maxx", "maxy")) -> DataFrame:
    """(leaf, n, minx, miny, maxx, maxy): Hilbert-packed index leaves.

    Input rows carry a spatial sort key (Hilbert tile id of the bbox
    center — tiling.assign_tiles provides it) and integer bbox columns.
    leaf = global_rank DIV leaf_size, so every leaf except the last holds
    exactly leaf_size features and the packing is a pure function of the
    input set.
    """
    if leaf_size < 1:
        raise ValueError("leaf_size must be >= 1")
    mnx, mny, mxx, mxy = bbox_cols
    ranked = with_global_rank(feats, [key_col, id_col])
    leaves = ranked.withColumn(
        "leaf", F.expr(f"(rn - 1) DIV {leaf_size}"))
    return (leaves.groupBy("leaf")
            .agg(F.count(F.lit(1)).cast("long").alias("n"),
                 F.min(mnx).alias("minx"), F.min(mny).alias("miny"),
                 F.max(mxx).alias("maxx"), F.max(mxy).alias("maxy")))


def pack_rtree_leaves_sql(src: str, leaf_size: int, id_col: str = "id",
                          key_col: str = "tile_id",
                          bbox_cols: tuple = ("minx", "miny", "maxx", "maxy")) -> str:
    """DuckDB twin over a CTE/subquery yielding (id, key, bbox...): a
    plain global row_number replaces the distributed rank (same total
    order, different plan — which is the point)."""
    mnx, mny, mxx, mxy = bbox_cols
    return f"""
WITH __ix AS ({src}),
__ir AS (SELECT *, row_number() OVER (ORDER BY {key_col}, {id_col}) AS rn
         FROM __ix)
SELECT (rn - 1) // {leaf_size} AS leaf,
       CAST(count(*) AS BIGINT) AS n,
       min({mnx}) AS minx, min({mny}) AS miny,
       max({mxx}) AS maxx, max({mxy}) AS maxy
FROM __ir GROUP BY 1
"""
