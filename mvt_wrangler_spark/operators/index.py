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
    mnx, mny, mxx, mxy = bbox_cols
    leaves = assign_rtree_leaves(feats, leaf_size, id_col, key_col)
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


def assign_rtree_leaves(feats: DataFrame, leaf_size: int,
                        id_col: str = "id",
                        key_col: str = "tile_id") -> DataFrame:
    """Per-feature leaf assignment (the rows pack_rtree_leaves aggregates):
    input columns + `leaf`."""
    if leaf_size < 1:
        raise ValueError("leaf_size must be >= 1")
    ranked = with_global_rank(feats, [key_col, id_col])
    return (ranked.withColumn("leaf", F.expr(f"(rn - 1) DIV {leaf_size}"))
            .drop("rn"))


def rtree_probe(feats: DataFrame, leaf_size: int, qbox: tuple,
                id_col: str = "id", key_col: str = "tile_id",
                bbox_cols: tuple = ("minx", "miny", "maxx", "maxy")) -> DataFrame:
    """Index-path bbox query: build the leaf index, PRUNE leaves whose MBR
    misses the query box, then refine only the surviving leaves' features
    with the exact overlap test. Lossless by construction (a feature
    overlapping qbox forces its leaf MBR to overlap qbox), so the result
    is row-identical to a direct full-scan filter — which is exactly what
    the contract oracle runs, making the driver hash a completeness proof
    of the pruning.

    Plan: the leaf dim is tiny (n/leaf_size rows) and broadcasts; the
    feature side joins on `leaf` — at 100 TB the leaf assignment is a
    persisted table (write assign_rtree_leaves partitioned by leaf) and
    the probe reads only matching partitions; here both sides derive from
    the same scan, which the plan audit accepts for a fixture query.
    """
    qminx, qminy, qmaxx, qmaxy = qbox
    mnx, mny, mxx, mxy = bbox_cols
    assigned = assign_rtree_leaves(feats, leaf_size, id_col, key_col)
    leaves = (assigned.groupBy("leaf")
              .agg(F.min(mnx).alias("__lmnx"), F.min(mny).alias("__lmny"),
                   F.max(mxx).alias("__lmxx"), F.max(mxy).alias("__lmxy")))
    hit = leaves.filter((F.col("__lmnx") <= qmaxx) & (F.col("__lmxx") >= qminx)
                        & (F.col("__lmny") <= qmaxy) & (F.col("__lmxy") >= qminy))
    pruned = assigned.join(F.broadcast(hit.select("leaf")), "leaf")
    return (pruned.filter((F.col(mnx) <= qmaxx) & (F.col(mxx) >= qminx)
                          & (F.col(mny) <= qmaxy) & (F.col(mxy) >= qminy))
            .select(id_col, mnx, mny, mxx, mxy))
