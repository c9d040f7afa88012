"""Spatial joins: broadcast point-in-polygon + salted kNN top-k.

Reference analog: the R-tree-prefiltered, exact-refined spatial join of
tiles x filter geometries (/root/reference/src/filtering/data.rs:189-230 +
src/transform.rs:96-143). Here generalized to the graft's operators
(north rule): broadcast STRtree PIP join against admin polygons, and a
salted kNN join for nearest-neighbor lookups.

Scale notes (100 TB / 10^12 rows):
  - PIP join is a NARROW stage: polygons broadcast once per executor, one
    Arrow-batched UDF pass, zero shuffle. Output explodes only matching
    pairs.
  - kNN is the shuffling operator; the two-phase salted top-k bounds any
    single reducer at (k x n_salt) rows per query point, so one hot query
    cell can't straggle a stage (AQE skew-join handles the join side; the
    explicit salt handles the aggregation side).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..functions import geometry as G


# ---------------------------------------------------------------------------
# Broadcast point-in-polygon join
# ---------------------------------------------------------------------------

def pip_match_ids_column(spark: SparkSession, polygons: list[tuple[str, G.Polygon]],
                         lon: Column, lat: Column) -> Column:
    """array<string> of polygon ids containing the point.

    GridIndex (STRtree-lite) prefilters by bbox; exact winding-number refine.
    Entirely executor-side vectorized numpy over Arrow batches.

    The returned Column is marked non-deterministic (see the comment at the
    return); consequences for callers: other filters will not push PAST a
    projection containing it (apply selective source filters BEFORE calling
    this), and it is only legal in Project/Filter contexts — not in join
    conditions or aggregates.
    """
    payload = [(pid, p.exterior, list(p.holes)) for pid, p in polygons]
    index = G.GridIndex([p.bbox for _, p in polygons])
    bc = spark.sparkContext.broadcast((payload, index))

    @pandas_udf("array<string>")
    def _match(plon: pd.Series, plat: pd.Series) -> pd.Series:
        pl, idx = bc.value
        px = plon.to_numpy(dtype=np.float64)
        py = plat.to_numpy(dtype=np.float64)
        n = len(px)
        hits: list[list[str]] = [[] for _ in range(n)]
        if n:
            # batch-bbox grid query prunes far polygons, then a vectorized
            # per-point bbox mask per candidate prunes rows BEFORE the exact
            # kernel — a globe-spanning batch against 10^4 polygons costs one
            # cheap compare per (candidate, row), not an exact PIP each
            # (points_in_polygon also bbox-culls internally; the explicit
            # mask keeps the nonzero/append loop off non-candidates too)
            cands = idx.query(px.min(), py.min(), px.max(), py.max())
            for ci in cands:
                pid, ext, holes = pl[ci]
                poly = G.Polygon(ext, holes)
                m = ((px >= poly.minx) & (px <= poly.maxx)
                     & (py >= poly.miny) & (py <= poly.maxy))
                if not m.any():
                    continue
                sub = np.nonzero(m)[0]
                inside = G.points_in_polygon(px[sub], py[sub], poly)
                for j in sub[np.nonzero(inside)[0]]:
                    hits[j].append(pid)
        return pd.Series(hits)

    # asNondeterministic: explode("__admins") makes the optimizer infer a
    # size(..)>0 filter and push it BELOW this projection, duplicating the
    # whole PIP pass (two ArrowEvalPython nodes — every row paid the grid
    # query + winding number twice; guide §4.4). The function is pure, but
    # the marker is the documented way to stop the optimizer cloning an
    # expensive UDF; the inferred filter then runs on the single computed
    # column. Generate drops empty arrays regardless, so results are
    # unchanged.
    return _match.asNondeterministic()(lon, lat)


def broadcast_pip_join(spark: SparkSession, points: DataFrame,
                       polygons: list[tuple[str, G.Polygon]],
                       lon_col: str = "lon", lat_col: str = "lat",
                       out_col: str = "admin_id", how: str = "inner") -> DataFrame:
    """Attach one output row per (point, containing polygon).

    how="inner": drop non-matching points; "left": keep them with NULL id.
    """
    matched = points.withColumn(
        "__admins", pip_match_ids_column(spark, polygons, F.col(lon_col), F.col(lat_col))
    )
    exploder = F.explode if how == "inner" else F.explode_outer
    return matched.withColumn(out_col, exploder("__admins")).drop("__admins")


# ---------------------------------------------------------------------------
# Partitioned point-in-polygon join (the beyond-broadcast scale path)
# ---------------------------------------------------------------------------

def partitioned_pip_join(points: DataFrame, polys: DataFrame, z: int = 9, *,
                         id_col: str = "id", lon_col: str = "lon",
                         lat_col: str = "lat", poly_id_col: str = "poly_id",
                         xs_col: str = "xs", ys_col: str = "ys",
                         n_salt: int = 8,
                         max_tiles_per_poly: int = 4096) -> DataFrame:
    """PIP join where BOTH sides are distributed DataFrames — the scale path
    when the polygon layer (parcels, buildings: 10^7+ rings) does not fit in
    a broadcast, the regime broadcast_pip_join cannot serve.

    `polys` schema: (poly_id, xs: array<array<double>>, ys: array<array<double>>)
    — ring 0 is the exterior, later rings are holes. Returns (id_col,
    poly_id_col) candidate-refined INNER pairs; left-keep is a left-anti
    join of `points` against this output.

    Scale shape (same reference analog as broadcast_pip_join —
    data.rs:189-230 prefilter + transform.rs:96-143 exact refine — but
    re-expressed as a co-partitioned equi-join instead of a broadcast):
      1. polygon tile cover: bbox -> inclusive tile range at zoom z, exploded
         to slim (tx, ty, poly_id) rows. Monotonicity of tile_x / tile_y
         (decreasing in lat) makes the cover complete: any point inside the
         polygon lands in a covered tile. A runtime raise_error guard caps
         blowup at max_tiles_per_poly cover tiles (lower z or raise the cap
         for continent-scale polygons).
      2. points -> (tx, ty) by the same formulas (pure codegen), equi-join
         on the tile key -> candidate (point, polygon) pairs. A point has
         exactly ONE tile, so no candidate pair duplicates and no dedup
         shuffle is needed.
      3. exact refine as PURE CODEGEN: polygon rings explode once to slim
         EDGE rows and equi-join the candidates on (poly_id, salt); the
         even-odd ray-casting rule of functions/geometry.points_in_ring is
         reproduced term for term as column math (identical double
         arithmetic, so results are bit-identical to the numpy kernel) and
         a two-level aggregation — per-ring crossing parity, then
         exterior AND NOT any(hole) — decides containment. No Python
         boundary at all: the earlier cogrouped-applyInPandas refine moved
         every candidate row through Arrow and was the dominant cost
         (measured 45 s warm at sf0.1 vs ~5 s for this plan).
      4. skew: a metro tile with 10^6 points under one big polygon would
         make one join key hot; candidates salt by xxhash64(point id) %
         n_salt and each polygon's edges replicate n_salt times (cheap:
         n_salt * edges slim rows per polygon), bounding any single key at
         ~1/n_salt of a polygon's candidates. Both partial aggregations
         combine map-side, so the parity shuffle carries one row per
         (candidate, ring), not per edge.
    """
    from ..functions import tiling as T

    ext_x, ext_y = F.col(xs_col)[0], F.col(ys_col)[0]
    p = polys.select(
        F.col(poly_id_col).alias("__pid"),
        F.col(xs_col).alias("__xs"), F.col(ys_col).alias("__ys"),
        F.array_min(ext_x).alias("__minx"), F.array_max(ext_x).alias("__maxx"),
        F.array_min(ext_y).alias("__miny"), F.array_max(ext_y).alias("__maxy"),
    ).withColumns({
        # y decreases with lat: the top edge (maxlat) gives the smaller ty
        "__tx0": T.tile_x(F.col("__minx"), z), "__tx1": T.tile_x(F.col("__maxx"), z),
        "__ty0": T.tile_y(F.col("__maxy"), z), "__ty1": T.tile_y(F.col("__miny"), z),
    })
    # polygons with NULL/empty rings have a NULL bbox and can never contain a
    # point — drop them before the cap guard (assert_true raises on NULL)
    p = p.filter(F.col("__tx0").isNotNull() & F.col("__ty0").isNotNull()
                 & F.col("__tx1").isNotNull() & F.col("__ty1").isNotNull())
    ntiles = ((F.col("__tx1") - F.col("__tx0") + 1)
              * (F.col("__ty1") - F.col("__ty0") + 1))
    # assert_true: NULL when the cap holds, raises with the message when not;
    # wrapping __ntiles in when(guard.isNull(), ...) forces the check to be
    # evaluated per polygon row (AssertTrue is non-foldable, so Catalyst
    # cannot prune it) without a separate action.
    guard = F.assert_true(ntiles <= F.lit(max_tiles_per_poly), F.concat(
        F.lit("partitioned_pip_join: polygon "), F.col("__pid").cast("string"),
        F.lit(f" covers > {max_tiles_per_poly} tiles at z={z}; "
              "lower z or raise max_tiles_per_poly"),
    ))
    p = p.withColumn("__ntiles", F.when(guard.isNull(), ntiles))

    cover = (
        # the filter REFERENCES __ntiles so the guard cannot be pruned
        p.filter(F.col("__ntiles") > 0)
        .select("__pid", F.explode(F.sequence("__tx0", "__tx1")).alias("__tx"),
                "__ty0", "__ty1")
        .select("__pid", "__tx",
                F.explode(F.sequence("__ty0", "__ty1")).alias("__ty"))
    )

    # duplicate (id, lon, lat) rows refine once and re-expand by count at
    # the end (rows with equal key are identical, so this is lossless);
    # rows sharing an id with different coordinates stay distinct groups
    mult = (points.select(F.col(id_col).alias("__id"),
                          F.col(lon_col).alias("__lon"),
                          F.col(lat_col).alias("__lat"))
            .groupBy("__id", "__lon", "__lat")
            # materialized once: referenced by the candidate path AND the
            # final multiplicity join-back — un-materialized, the point
            # scan + dedup groupBy execute twice per run. Slim rows
            # (id + 2 doubles + count), the guide §8 proxy shape.
            .agg(F.count(F.lit(1)).alias("__mult"))
            .localCheckpoint())
    pt = mult.withColumns({
        "__tx": T.tile_x(F.col("__lon"), z),
        "__ty": T.tile_y(F.col("__lat"), z),
    })
    cand = (
        pt.join(cover, on=["__tx", "__ty"])
        .select("__pid", "__id", "__lon", "__lat")
        .withColumn("__salt", F.pmod(F.xxhash64("__id"), F.lit(n_salt)))
    )
    # polygon EDGE rows: ring index + consecutive vertex pairs — exactly
    # the edges points_in_ring tests AFTER Polygon._close_ring appends the
    # first vertex to an open ring (exact float first!=last check, same as
    # np.array_equal there). Replicated per salt; the exterior bbox rides
    # along for the kernel's pre-cull.
    ring = p.select("__pid", "__minx", "__maxx", "__miny", "__maxy",
                    F.posexplode(F.arrays_zip(
                        F.col("__xs").alias("rx"),
                        F.col("__ys").alias("ry"))).alias("__ri", "__r"))
    oxs, oys = F.col("__r.rx"), F.col("__r.ry")
    is_open = (F.size(oxs) > 0) & (
        (F.element_at(oxs, 1) != F.element_at(oxs, -1))
        | (F.element_at(oys, 1) != F.element_at(oys, -1)))
    ring = ring.select(
        "__pid", "__ri", "__minx", "__maxx", "__miny", "__maxy",
        F.when(is_open, F.concat(oxs, F.array(F.element_at(oxs, 1))))
        .otherwise(oxs).alias("__rxs"),
        F.when(is_open, F.concat(oys, F.array(F.element_at(oys, 1))))
        .otherwise(oys).alias("__rys"))
    rxs, rys = F.col("__rxs"), F.col("__rys")
    m = F.greatest(F.size(rxs) - 1, F.lit(0))
    edges = ring.select(
        "__pid", "__ri", "__minx", "__maxx", "__miny", "__maxy",
        F.posexplode(F.arrays_zip(
            F.slice(rxs, 1, m).alias("x1"), F.slice(rys, 1, m).alias("y1"),
            F.slice(rxs, 2, m).alias("x2"), F.slice(rys, 2, m).alias("y2"),
        )).alias("__ei", "__e"))
    edges = edges.select(
        "__pid", "__ri", "__minx", "__maxx", "__miny", "__maxy",
        F.col("__e.x1").alias("__x1"), F.col("__e.y1").alias("__y1"),
        F.col("__e.x2").alias("__x2"), F.col("__e.y2").alias("__y2"),
        # long salt: must match cand's pmod(xxhash64) type exactly — the
        # equi-join coerces, but keeping both long avoids a cast in the key
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))
                  .cast("array<bigint>")).alias("__salt"))

    px, py = F.col("__lon"), F.col("__lat")
    j = (cand.join(edges, on=["__pid", "__salt"])
         # same inclusive exterior-bbox pre-cull as points_in_polygon
         .filter((px >= F.col("__minx")) & (px <= F.col("__maxx"))
                 & (py >= F.col("__miny")) & (py <= F.col("__maxy"))))
    # points_in_ring's crossing rule, identical double arithmetic: a
    # rightward ray crosses edge (x1,y1)->(x2,y2) iff (y1>py) != (y2>py)
    # and px < the edge's x at py (denominator masked to 1.0 when y1==y2,
    # where the parity condition is false anyway)
    den = F.when(F.col("__y2") != F.col("__y1"),
                 F.col("__y2") - F.col("__y1")).otherwise(F.lit(1.0))
    xint = (F.col("__x1")
            + (py - F.col("__y1")) * (F.col("__x2") - F.col("__x1")) / den)
    cross = ((F.col("__y1") > py) != (F.col("__y2") > py)) & (px < xint)
    parity = j.groupBy("__id", "__lon", "__lat", "__pid", "__ri").agg(
        (F.sum(cross.cast("int")) % 2 == 1).alias("__odd"))
    inside = (parity.groupBy("__id", "__lon", "__lat", "__pid").agg(
        F.coalesce(F.max(F.when(F.col("__ri") == 0, F.col("__odd"))),
                   F.lit(False)).alias("__ext"),
        F.coalesce(F.max(F.when(F.col("__ri") > 0, F.col("__odd"))),
                   F.lit(False)).alias("__hole"))
        .filter(F.col("__ext") & ~F.col("__hole")))
    return (inside.join(mult, on=["__id", "__lon", "__lat"])
            .withColumn("__rep", F.explode(
                F.array_repeat(F.lit(1), F.col("__mult").cast("int"))))
            .select(F.col("__id").alias(id_col),
                    F.col("__pid").alias(poly_id_col)))


# ---------------------------------------------------------------------------
# Broadcast exact intersects join (general geometries: point/line/polygon)
# ---------------------------------------------------------------------------

def intersects_match_ids_column(spark: SparkSession,
                                polygons: list[tuple[str, G.Polygon]],
                                gtype: Column, xs: Column, ys: Column,
                                ring_lens: Column | None = None) -> Column:
    """array<string> of polygon ids whose geometry intersects the feature.

    The returned Column is marked non-deterministic (same rationale and
    caller caveats as pip_match_ids_column: apply selective source filters
    BEFORE calling this; Project/Filter contexts only).

    General form of the reference's exact-intersects refine
    (transform.rs:130-143) beyond points: features are (geom_type,
    xs array, ys array[, ring_lens array]) rows — ring_lens splits the flat
    vertex arrays into rings/parts (the decode_tiles contract), making holed
    and Multi* FEATURE polygons exact. Per polygon, a vectorized row-bbox
    pre-mask rejects far rows (so 10^4 broadcast polygons cost one cheap
    compare each per batch, not an exact kernel each), then the exact kernel
    runs on the surviving subset only.
    """
    payload = [(pid, p.exterior, list(p.holes), p.bbox) for pid, p in polygons]
    bc = spark.sparkContext.broadcast(payload)

    def _match_core(t: pd.Series, xs_s: pd.Series, ys_s: pd.Series,
                    rl_s: pd.Series | None) -> pd.Series:
        gtypes = t.to_numpy(dtype=object)
        xsl = xs_s.to_numpy(dtype=object)
        ysl = ys_s.to_numpy(dtype=object)
        rll = rl_s.to_numpy(dtype=object) if rl_s is not None else None
        n = len(gtypes)
        hits: list[list[str]] = [[] for _ in range(n)]
        if n:
            lens = np.fromiter(map(len, xsl), np.int64, n)
            offs = np.zeros(n + 1, np.int64)
            np.cumsum(lens, out=offs[1:])
            fx = np.concatenate([np.asarray(v, np.float64) for v in xsl])
            fy = np.concatenate([np.asarray(v, np.float64) for v in ysl])
            rminx = np.minimum.reduceat(fx, offs[:-1])
            rmaxx = np.maximum.reduceat(fx, offs[:-1])
            rminy = np.minimum.reduceat(fy, offs[:-1])
            rmaxy = np.maximum.reduceat(fy, offs[:-1])
            for pid, ext, holes, (bx0, by0, bx1, by1) in bc.value:
                m = (rminx <= bx1) & (bx0 <= rmaxx) & (rminy <= by1) & (by0 <= rmaxy)
                if not m.any():
                    continue
                sub = np.nonzero(m)[0]
                h = G.geoms_intersect_polygon(
                    gtypes[sub], xsl[sub], ysl[sub], G.Polygon(ext, holes),
                    ring_lens_list=rll[sub] if rll is not None else None)
                for j in sub[np.nonzero(h)[0]]:
                    hits[j].append(pid)
        return pd.Series(hits)

    # asNondeterministic on both variants: same inferred-filter UDF
    # duplication as pip_match_ids_column (see the comment there) — the
    # downstream explode otherwise re-evaluates the exact-intersects pass
    # below the pushed size(..)>0 filter.
    if ring_lens is not None:
        @pandas_udf("array<string>")
        def _match_rings(t: pd.Series, xs_s: pd.Series, ys_s: pd.Series,
                         rl_s: pd.Series) -> pd.Series:
            return _match_core(t, xs_s, ys_s, rl_s)

        return _match_rings.asNondeterministic()(gtype, xs, ys, ring_lens)

    @pandas_udf("array<string>")
    def _match(t: pd.Series, xs_s: pd.Series, ys_s: pd.Series) -> pd.Series:
        return _match_core(t, xs_s, ys_s, None)

    return _match.asNondeterministic()(gtype, xs, ys)


def broadcast_intersects_join(spark: SparkSession, feats: DataFrame,
                              polygons: list[tuple[str, G.Polygon]],
                              type_col: str = "geom_type", xs_col: str = "xs",
                              ys_col: str = "ys", out_col: str = "admin_id",
                              how: str = "inner",
                              ring_lens_col: str | None = None) -> DataFrame:
    """One output row per (feature, intersecting polygon) — the J2 exact
    geometry x geometry join generalized to line/polygon features, and (with
    ring_lens_col) to holed / multi-part feature polygons."""
    matched = feats.withColumn(
        "__admins",
        intersects_match_ids_column(
            spark, polygons, F.col(type_col), F.col(xs_col), F.col(ys_col),
            ring_lens=F.col(ring_lens_col) if ring_lens_col else None),
    )
    exploder = F.explode if how == "inner" else F.explode_outer
    return matched.withColumn(out_col, exploder("__admins")).drop("__admins")


# ---------------------------------------------------------------------------
# Salted kNN join (nearest neighbors among `data` for each row of `queries`)
# ---------------------------------------------------------------------------

def knn_join_cells(data: DataFrame, queries: DataFrame, k: int, z: int = 7,
                   data_id: str = "image_id", query_id: str = "query_id",
                   lon_col: str = "lon", lat_col: str = "lat",
                   n_salt: int = 8, max_rounds: int | None = None) -> DataFrame:
    """Salted cell-bucketed kNN for LARGE query sets (both sides
    distributed) — EXACT by expanding-ring rounds.

    Round i explodes each still-unsatisfied query over the (2w+1)^2 cell box
    around its z-tile (w = 2^i, round 0 = the classic 3x3), equi-joins on
    (cell, salt) — a plain shuffle join AQE can plan; hot metro cells spread
    over n_salt reducers and two-phase top-k bounds every reducer at k.
    A query is DONE when it has k candidates whose k-th distance fits inside
    the box's interior circle (distance to the nearest box border that has
    data beyond it; world edges count as infinitely far) — its in-box top-k
    is then provably the global top-k. Survivors re-probe with doubled w;
    once the box covers the grid the result is exact by construction, so
    the loop always terminates (~log2(n) rounds worst case; round counts
    are driver-side scalars, no data collect).

    Output: query_id, rank, neighbor_id, dist2 (squared degrees,
    tie-broken by neighbor id).
    """
    from ..functions import tiling

    n = 1 << z
    d = data.select(
        F.col(data_id).alias("__did"),
        F.col(lon_col).alias("lon"), F.col(lat_col).alias("lat"))
    d = tiling.assign_tiles(d, z=z, with_local=False).select(
        "__did", F.col("lon").alias("__dlon"), F.col("lat").alias("__dlat"),
        F.col("x").alias("__cx"), F.col("y").alias("__cy"),
        F.pmod(F.xxhash64(F.col("__did")), F.lit(n_salt)).alias("__salt"),
    )
    # localCheckpoint, not persist(): the expanding-ring loop references d
    # every round, so it must be materialized — but a persist() is matched
    # by canonicalized plan in the CacheManager and would be silently
    # REUSED by the next invocation of the same query (cross-run result
    # reuse the bench rules forbid, and it was never unpersisted). The
    # checkpoint re-materializes per invocation.
    d = d.localCheckpoint()
    remaining = tiling.assign_tiles(
        queries.select(F.col(query_id).alias("__qid"),
                       F.col(lon_col).alias("lon"), F.col(lat_col).alias("lat")),
        z=z, with_local=False,
    ).select("__qid", F.col("lon").alias("__qlon"), F.col("lat").alias("__qlat"),
             F.col("x").alias("__qx"), F.col("y").alias("__qy"))

    finals: list[DataFrame] = []
    w = 1
    # enough doublings that the final round's box provably covers the grid
    # (w = 2^(z-1) gives 2w+1 >= 2^z) — exactness never depends on a cap
    rounds = max_rounds if max_rounds is not None else max(z, 1) + 1
    for _ in range(rounds):
        covers_grid = 2 * w + 1 >= n
        if covers_grid:
            # the box would cover the grid: skip the (2w+1)^2 cell explode
            # and probe everything — the salt explode alone spreads the join
            qc = remaining.withColumn(
                "__salt", F.explode(F.array(*[F.lit(s) for s in range(n_salt)])))
            pairs = qc.join(d, on="__salt")
        else:
            qc = remaining.withColumn(
                "__cx", F.explode(F.sequence(F.greatest(F.lit(0), F.col("__qx") - w),
                                             F.least(F.lit(n - 1), F.col("__qx") + w))))
            qc = qc.withColumn(
                "__cy", F.explode(F.sequence(F.greatest(F.lit(0), F.col("__qy") - w),
                                             F.least(F.lit(n - 1), F.col("__qy") + w))))
            qc = qc.withColumn("__salt",
                               F.explode(F.array(*[F.lit(s) for s in range(n_salt)])))
            pairs = qc.join(d, on=["__cx", "__cy", "__salt"])
        dx = pairs["__dlon"] - pairs["__qlon"]
        dy = pairs["__dlat"] - pairs["__qlat"]
        pairs = pairs.withColumn("dist2", dx * dx + dy * dy)
        # tie-break equal dist2 NUMERICALLY when the id parses (then by the
        # string form): string order ('10' < '9') diverges from the numeric
        # brute-force oracle on exact ties, which the lattice-derived synth
        # points do produce
        tie = [F.expr("try_cast(__did AS BIGINT)").asc_nulls_last(), F.col("__did").asc()]
        w1 = Window.partitionBy("__qid", "__salt").orderBy(F.col("dist2").asc(), *tie)
        local = pairs.withColumn("__r", F.row_number().over(w1)).filter(F.col("__r") <= k)
        w2 = Window.partitionBy("__qid").orderBy(F.col("dist2").asc(), *tie)
        res = (local.withColumn("rank", F.row_number().over(w2))
               .filter(F.col("rank") <= k)
               .select("__qid", "__qlon", "__qlat", "__qx", "__qy",
                       "rank", "__did", "dist2"))

        if covers_grid:
            finals.append(res.select("__qid", "rank", "__did", "dist2"))
            break
        # safety radius: distance from the query point to the nearest box
        # border beyond which data could exist (world edges -> +inf)
        inf = F.lit(float("inf"))
        west = tiling.tile_lon(F.col("__qx") - w, z)
        east = tiling.tile_lon(F.col("__qx") + w + 1, z)
        north = tiling.tile_lat(F.col("__qy") - w, z)
        south = tiling.tile_lat(F.col("__qy") + w + 1, z)
        safe = F.least(
            F.when(F.col("__qx") - w <= 0, inf).otherwise(F.col("__qlon") - west),
            F.when(F.col("__qx") + w >= n - 1, inf).otherwise(east - F.col("__qlon")),
            F.when(F.col("__qy") - w <= 0, inf).otherwise(north - F.col("__qlat")),
            F.when(F.col("__qy") + w >= n - 1, inf).otherwise(F.col("__qlat") - south),
        )
        status = (res.groupBy("__qid")
                  .agg(F.count(F.lit(1)).alias("__n"), F.max("dist2").alias("__kth2"))
                  .join(remaining, on="__qid")
                  .withColumn("__safe", safe)
                  .withColumn("__done", (F.col("__n") >= k)
                              & (F.col("__kth2") <= F.col("__safe") * F.col("__safe"))))
        # localCheckpoint (eager) truncates the per-round plan lineage: the
        # rounds would otherwise chain into one compounding DAG whose
        # re-analysis/persist OOMs the driver after a few doublings. The
        # checkpointed frames are tiny (<= k rows/query; shrinking queries).
        done_ids = status.filter(F.col("__done")).select("__qid").localCheckpoint()
        finals.append(res.join(done_ids, on="__qid")
                      .select("__qid", "rank", "__did", "dist2").localCheckpoint())
        # anti-join (NOT status-filter): a query with ZERO in-box candidates
        # has no status row but must keep expanding
        remaining = remaining.join(done_ids, on="__qid",
                                   how="left_anti").localCheckpoint()
        if remaining.isEmpty():
            break
        w *= 2

    out = finals[0]
    for f in finals[1:]:
        out = out.unionByName(f)
    return out.select(F.col("__qid").alias(query_id), "rank",
                      F.col("__did").alias("neighbor_id"), "dist2")


def ann_topk_lsh(emb: DataFrame, k: int = 5, id_col: str = "vec_id",
                 vec_col: str = "embedding", n_queries: int = 3,
                 quant: int = 1000, nbits: int = 8) -> DataFrame:
    """IVF-style ANN top-k over embeddings: sign-LSH coarse quantizer
    (2^nbits cells), queries probe their cell plus all hamming-distance-1
    neighbors, exact integer dot-product rank within candidates.

    The scale path next to the brute-force crossJoin baseline (ann_topk):
    shuffle volume is (nbits+1) probe rows per query equi-joined on cell —
    linear, no cartesian stage; candidates per query ~ N*(nbits+1)/2^nbits.
    Recall is the LSH collision probability (deterministic hyperplanes; the
    DuckDB twin reproduces the exact same result set). Ties break on id.
    """
    from .dedup import embedding_sign_buckets

    base = emb.select(
        F.col(id_col).alias("vid"),
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * quant).cast("long")).alias("q"),
        F.element_at(
            embedding_sign_buckets(F.col(vec_col), quant=100, nbits=nbits, bands=1),
            1).alias("cell"),
    )
    qs = base.filter(F.col("vid") < n_queries).select(
        F.col("vid").alias("qid"), F.col("q").alias("qq"), F.col("cell").alias("qcell"))
    probes = qs.withColumn(
        "cell", F.explode(F.array(*[F.col("qcell").bitwiseXOR(F.lit(m))
                                    for m in [0] + [1 << b for b in range(nbits)]])))
    cand = probes.join(base, on="cell").filter(F.col("vid") != F.col("qid"))
    score = F.aggregate(F.zip_with("q", "qq", lambda x, y: x * y),
                        F.lit(0).cast("long"), lambda a, v: a + v)
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("vid").asc())
    return (
        cand.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", F.col("vid").alias("neighbor_id"), "score")
    )


def ann_topk_lsh_sql(table: str = "embeddings", k: int = 5, n_queries: int = 3,
                     quant: int = 1000, nbits: int = 8, dim: int = 64) -> str:
    """DuckDB twin of ann_topk_lsh (identical result set)."""
    from .dedup import GOLD

    proj = (
        f"list_transform(generate_series(0, {nbits - 1}), j -> CASE WHEN "
        f"list_sum(list_transform(generate_series(1, {dim}), i -> "
        f"CAST(round(CAST(e[i] AS DOUBLE) * 100) AS BIGINT)"
        f" * (((i - 1) * {GOLD} + j * 40503 + 17) % 7 - 3))) >= 0 THEN 1 ELSE 0 END)"
    )
    fold = " + ".join(f"bits[{t + 1}] * {1 << t}" for t in range(nbits))
    masks = ", ".join(f"({m})" for m in [0] + [1 << b for b in range(nbits)])
    return f"""
WITH __b AS (
  SELECT vec_id AS vid,
         list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * {quant}) AS BIGINT)) AS q,
         {fold} AS cell
  FROM (SELECT vec_id, embedding, {proj} AS bits
        FROM (SELECT vec_id, embedding, embedding AS e FROM {table}))),
__q AS (SELECT vid AS qid, q AS qq, cell AS qcell FROM __b WHERE vid < {n_queries}),
__p AS (SELECT qid, qq, xor(qcell, m.m) AS cell FROM __q, (VALUES {masks}) m(m)),
__c AS (SELECT p.qid, b.vid,
               list_sum(list_transform(generate_series(1, {dim}), i -> b.q[i] * p.qq[i])) AS score
        FROM __p p JOIN __b b USING (cell) WHERE b.vid != p.qid),
__r AS (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY score DESC, vid ASC) AS rank
        FROM __c)
SELECT qid, CAST(rank AS INT) AS rank, vid AS neighbor_id, CAST(score AS BIGINT) AS score
FROM __r WHERE rank <= {k}
"""


def knn_join(data: DataFrame, queries: DataFrame, k: int,
             data_id: str = "image_id", query_id: str = "query_id",
             lon_col: str = "lon", lat_col: str = "lat",
             max_queries: int = 100_000) -> DataFrame:
    """Exact k nearest data rows per query row (squared-degree distance).

    BROADCAST-QUERIES variant: the query table is collected to the driver
    and broadcast, so it is HARD-BOUNDED at `max_queries` rows (raises
    ValueError above it — ~100k queries x 3 fields is a few MB of broadcast;
    beyond that, use knn_join_cells, the both-sides-distributed twin).

    Two-phase top-k, shaped for 10^12 data rows:
      1. LOCAL phase — queries broadcast as a numpy array; `mapInPandas`
         computes a (batch x Q) distance matrix per Arrow batch and emits
         only each batch's top-k per query (argpartition). Zero shuffle,
         zero join; survivor volume <= k x Q x n_batches.
      2. GLOBAL phase — row_number window over the tiny survivor set.
    The hash-uniform Arrow batching is the salting here: a hot metro cell
    spreads across input splits, so no single task owns a hot query (the
    reference's analog is its rayon work-stealing pool, processing.rs:78-96).
    Ties break on data id (deterministic). Output columns:
    query_id, rank, neighbor_id, dist2.
    """
    spark = data.sparkSession
    qrows = queries.select(query_id, lon_col, lat_col).limit(max_queries + 1).collect()
    if len(qrows) > max_queries:
        raise ValueError(
            f"knn_join broadcasts the query side to the driver and is bounded "
            f"at max_queries={max_queries} rows; use knn_join_cells for large "
            f"query sets (both sides distributed, exact expanding-ring)")
    bc = spark.sparkContext.broadcast(
        (
            [r[0] for r in qrows],
            np.array([r[1] for r in qrows], dtype=np.float64),
            np.array([r[2] for r in qrows], dtype=np.float64),
        )
    )

    def local_topk(pdfs):
        qids, qlon, qlat = bc.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            dlon = pdf[lon_col].to_numpy(dtype=np.float64)
            dlat = pdf[lat_col].to_numpy(dtype=np.float64)
            dids = pdf[data_id].to_numpy()
            # (N, Q) squared distances
            dx = dlon[:, None] - qlon[None, :]
            dy = dlat[:, None] - qlat[None, :]
            d2 = dx * dx + dy * dy
            kk = min(k, len(pdf))
            # tie-inclusive local top-k: emit every row at or below the k-th
            # distance, so boundary ties survive to the global phase and the
            # window's (dist2, id) tie-break — argpartition alone would keep
            # an arbitrary member of a tie and could drop the global winner
            kth = np.partition(d2, kk - 1, axis=0)[kk - 1, :]   # (Q,)
            di, qi = np.nonzero(d2 <= kth[None, :])
            yield pd.DataFrame({
                query_id: np.array(qids, dtype=object)[qi],
                "neighbor_id": dids[di],
                "dist2": d2[di, qi],
            })

    survivors = data.select(data_id, lon_col, lat_col).mapInPandas(
        local_topk, f"{query_id} string, neighbor_id string, dist2 double"
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("dist2").asc(),
        F.expr("try_cast(neighbor_id AS BIGINT)").asc_nulls_last(),
        F.col("neighbor_id").asc())
    return (
        survivors.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id, "rank", "neighbor_id", "dist2")
    )


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_time: str = "ts", right_time: str | None = None,
              value_cols: list[str] | None = None,
              suffix: str = "_r") -> DataFrame:
    """Backward as-of join: for every left row, attach the right row with
    the greatest `right_time` <= `left_time` within the same `on` key
    (inclusive ties, LEFT-join semantics — unmatched left rows keep NULL
    value columns). The nearest-prior-event join every event pipeline needs
    (last click before each purchase, last config before each reading) and
    an operator Spark has no built-in for.

    NOT a join under the hood: a join formulation needs an inequality
    condition (range join -> O(n*m) explosion or a broadcast-only range
    strategy). Instead both sides are UNIONED into one stream tagged
    src=(0 right, 1 left), shuffled ONCE on the key, and a running
    `last(value, ignorenulls)` window ordered by (time, src, value) fills
    each left row with the latest right payload at or before it. Right
    rows sort before left rows at equal times, which yields the inclusive
    `>=` match; ordering by the value struct last makes duplicate
    (key, time) right rows resolve deterministically (max struct wins) —
    dedupe the right side on (key, time) upstream if a different winner is
    wanted. Rows with NULL time sort first and so never match anything.

    100 TB notes: cost is one hash shuffle of |L|+|R| rows plus a per-key
    sort — map-side combinable nowhere, but no pair blowup and no driver
    state. Each key's rows pass through one task: fine for the usual
    many-keys regime; a single giant key (one global time series) instead
    wants the range-partition + per-partition-carry variant of
    with_global_rank, which this operator intentionally does not pay for.
    DuckDB twin: native `ASOF LEFT JOIN` (semantics verified identical on
    inclusive ties by the contract query).
    """
    from pyspark.sql import Window

    right_time = right_time or left_time
    value_cols = value_cols or [c for c in right.columns
                                if c not in {on, right_time}]
    vtype = None
    r = right.select(
        F.col(on).alias("__k"), F.col(right_time).alias("__t"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__v"),
        F.lit(0).alias("__src"))
    vtype = r.schema["__v"].dataType
    lcols = list(left.columns)
    l_ = left.select(
        *lcols, F.col(on).alias("__k"), F.col(left_time).alias("__t"),
        F.lit(None).cast(vtype).alias("__v"), F.lit(1).alias("__src"))
    r_full = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        "__k", "__t", "__v", "__src")
    u = l_.unionByName(r_full)
    w = (Window.partitionBy("__k").orderBy("__t", "__src", "__v")
         .rowsBetween(Window.unboundedPreceding, 0))
    u = u.withColumn("__m", F.last("__v", ignorenulls=True).over(w))
    out = u.filter(F.col("__src") == 1)
    for c in value_cols:
        out = out.withColumn(c + suffix, F.col(f"__m.{c}"))
    return out.drop("__k", "__t", "__v", "__src", "__m")


# ---------------------------------------------------------------------------
# Interval (point-in-range) join via bucketed equi-join
# ---------------------------------------------------------------------------

def interval_join(points: DataFrame, intervals: DataFrame, *,
                  point_col: str, start_col: str, end_col: str,
                  bucket_width: int,
                  max_buckets_per_interval: int = 4096,
                  overflow: str = "error") -> DataFrame:
    """INNER join of point rows to every interval row with
    start <= point <= end (numeric columns; cast timestamps to epoch
    micros upstream). The 1-D analog of [[partitioned-pip-join]]'s tile
    cover, and the general-range sibling of `asof_join`.

    Spark's own plan for an inequality-only join is a broadcast
    nested-loop or a full cartesian — O(|P|*|I|) at any scale. Here both
    sides are bucketized on floor(value / bucket_width): each interval is
    exploded to its covered buckets (slim rows), each point to exactly ONE
    bucket, and a plain equi-join + exact range refine does the rest.
    Because a point has one bucket, no output dedup pass is needed.

    Scale shape:
    - shuffle is |P| + sum(interval spans / bucket_width) rows on the
      bucket key; choose bucket_width ~ the median interval length so
      short intervals cost 1-2 cover rows.
    - hot buckets (many points AND many intervals at the same time) are
      output-size-bound, handled by AQE skew-join splitting.
    - pathologically long intervals would explode the cover; the
      assert_true guard fails fast at max_buckets_per_interval (overflow=
      "error"). overflow="broadcast" instead routes ONLY the oversized
      intervals through a broadcast range arm (sound for the few
      global-span intervals real data has; the arm is a deliberate
      BroadcastNestedLoopJoin, so plans containing it are excluded from
      the no-cartesian gate the same way ann_topk is).

    Column names of `points` and `intervals` must be disjoint; both sides'
    columns pass through to the output.
    """
    dup = set(points.columns) & set(intervals.columns)
    if dup:
        raise ValueError(f"interval_join: overlapping column names {sorted(dup)}")
    if overflow not in ("error", "broadcast"):
        raise ValueError("interval_join: overflow must be 'error' or 'broadcast'")
    w = int(bucket_width)
    if w <= 0:
        raise ValueError("interval_join: bucket_width must be positive")

    # floor(x / w) via double division: monotone (IEEE division rounds to
    # nearest, preserving <=), and identical on both sides, so a point in
    # [start, end] always lands inside the interval's [b0, b1] cover.
    def _bucket(c):
        return F.floor(c / F.lit(float(w))).cast("long")

    p, s, e = F.col(point_col), F.col(start_col), F.col(end_col)
    # NULL-endpoint intervals can never match (SQL range predicate is never
    # true) — drop them up front: assert_true would otherwise RAISE on the
    # NULL cap comparison with a misleading span message.
    iv = (intervals.filter(s.isNotNull() & e.isNotNull())
          .withColumns({"__b0": _bucket(s), "__b1": _bucket(e)}))
    nb = F.col("__b1") - F.col("__b0") + 1

    pt = points.withColumn("__b", _bucket(p))
    refine = (s <= p) & (p <= e)

    if overflow == "error":
        guard = F.assert_true(
            nb <= F.lit(max_buckets_per_interval),
            F.concat(F.lit("interval_join: interval spans "), nb.cast("string"),
                     F.lit(f" buckets > max_buckets_per_interval="
                           f"{max_buckets_per_interval}; raise bucket_width, "
                           "raise the cap, or use overflow='broadcast'")))
        iv = iv.withColumn("__b0", F.when(guard.isNull(), F.col("__b0")))
        short, long_ = iv, None
    else:
        short = iv.filter(nb <= F.lit(max_buckets_per_interval))
        long_ = iv.filter(nb > F.lit(max_buckets_per_interval))

    cover = short.withColumn("__b", F.explode(F.sequence("__b0", "__b1"))) \
                 .drop("__b0", "__b1")
    out = pt.join(cover, on="__b").filter(refine).drop("__b")
    if long_ is not None:
        arm = pt.drop("__b").join(F.broadcast(long_.drop("__b0", "__b1")), refine)
        out = out.unionByName(arm)
    return out


def partitioned_intersects_join(feats: DataFrame, polys: DataFrame, z: int = 9, *,
                                id_col: str = "id", type_col: str = "geom_type",
                                fxs_col: str = "xs", fys_col: str = "ys",
                                poly_id_col: str = "poly_id",
                                xs_col: str = "xs", ys_col: str = "ys",
                                n_salt: int = 8,
                                max_tiles: int = 4096) -> DataFrame:
    """Exact `intersects` join of mixed Point/LineString/Polygon features vs
    a DISTRIBUTED polygon table — the non-broadcast generalization of
    broadcast_intersects_join, completing the family begun by
    [[partitioned-pip-join]] (same reference analog: data.rs:189-230 bbox
    prefilter + transform.rs:130-143 exact refine).

    `feats`: (id, geom_type, xs array<double>, ys array<double>) — the
    synth_geoms / decode_tiles single-ring contract. `polys`: (poly_id,
    xs array<array<double>>, ys array<array<double>>), ring 0 exterior.
    Returns DISTINCT (id_col, type_col, poly_id_col) intersecting pairs.

    Differences from the PIP case, both scale-relevant:
      - a feature's bbox may span MULTIPLE tiles, so the tile equi-join can
        emit the same (feature, polygon) pair once per shared tile; a slim
        distinct on (id, poly_id) dedups BEFORE the wide vertex arrays are
        re-attached (the [[ngram-jaccard]] shuffle-bytes discipline).
      - BOTH sides carry a cover cap guard: a continent polygon or a
        transcontinental linestring would explode the cover; each side
        fails fast at max_tiles with its own message.
    The exact refine is the same salted cogrouped geoms_intersect_polygon
    pass: polygon rings cross the wire once per (polygon, salt), feature
    arrays once per surviving candidate.
    """
    from ..functions import tiling as T

    def _cover(df, idc, bbox_cols, what, pfx):
        """Tile cover of each bbox; the 4 bbox corners RIDE ALONG as
        `{pfx}0x..{pfx}1y` so the candidate join can bbox-prune pairs that
        merely share a coarse tile before anything wide moves, and the
        cover-min tile (`{pfx}tx0`/`{pfx}ty0`) rides along so the pair
        dedup can be a codegen reporting-tile predicate instead of a
        distinct (the cover rows stay slim: id + 4 tile ints + 4 doubles).
        """
        bx0, bx1, by0, by1 = bbox_cols
        d = df.withColumns({
            "__tx0": T.tile_x(bx0, z), "__tx1": T.tile_x(bx1, z),
            "__ty0": T.tile_y(by1, z), "__ty1": T.tile_y(by0, z),
        }).filter(F.col("__tx0").isNotNull() & F.col("__ty0").isNotNull()
                  & F.col("__tx1").isNotNull() & F.col("__ty1").isNotNull())
        ntiles = ((F.col("__tx1") - F.col("__tx0") + 1)
                  * (F.col("__ty1") - F.col("__ty0") + 1))
        guard = F.assert_true(ntiles <= F.lit(max_tiles), F.concat(
            F.lit(f"partitioned_intersects_join: {what} "),
            F.col(idc).cast("string"),
            F.lit(f" covers > {max_tiles} tiles at z={z}")))
        d = d.withColumn("__tx0", F.when(guard.isNull(), F.col("__tx0")))
        bb = {f"{pfx}0x": bx0, f"{pfx}1x": bx1,
              f"{pfx}0y": by0, f"{pfx}1y": by1}
        return (d.select(idc, *[c.alias(n) for n, c in bb.items()],
                         F.col("__tx0").alias(f"{pfx}tx0"),
                         F.col("__ty0").alias(f"{pfx}ty0"),
                         F.explode(F.sequence("__tx0", "__tx1")).alias("__tx"),
                         "__ty0", "__ty1")
                 .select(idc, *bb.keys(), f"{pfx}tx0", f"{pfx}ty0", "__tx",
                         F.explode(F.sequence("__ty0", "__ty1")).alias("__ty")))

    f = feats.select(
        F.col(id_col).alias("__fid"), F.col(type_col).alias("__gt"),
        F.col(fxs_col).alias("__fxs"), F.col(fys_col).alias("__fys"))
    # ONE aggregation consolidates what used to be three separate passes
    # over the feature input (cover source, dropDuplicates for the vertex
    # rows, multiplicity count), materialized once with localCheckpoint:
    # per-branch column pruning makes the three copies non-identical, so
    # exchange reuse does NOT fire (verified in the plan) and without the
    # checkpoint the upstream feature derivation still executes three
    # times. The checkpoint is one pass over the unique-feature table —
    # at corpus scale the same cost class as the shuffle the groupBy
    # already pays. (Duplicate ids carry identical geometry by contract,
    # so first() is exact.)
    g = (f.groupBy("__fid")
         .agg(F.count(F.lit(1)).alias("__mult"),
              F.first("__gt").alias("__gt"),
              F.first("__fxs").alias("__fxs"),
              F.first("__fys").alias("__fys"))
         .localCheckpoint())
    fcov = _cover(
        g.withColumns({"__minx": F.array_min("__fxs"), "__maxx": F.array_max("__fxs"),
                       "__miny": F.array_min("__fys"), "__maxy": F.array_max("__fys")}),
        "__fid",
        (F.col("__minx"), F.col("__maxx"), F.col("__miny"), F.col("__maxy")),
        "feature", "__fb")

    pp = polys.select(
        F.col(poly_id_col).alias("__pid"),
        F.col(xs_col).alias("__pxs"), F.col(ys_col).alias("__pys"))
    ext_x, ext_y = F.col("__pxs")[0], F.col("__pys")[0]
    pcov = _cover(
        pp.withColumns({"__minx": F.array_min(ext_x), "__maxx": F.array_max(ext_x),
                        "__miny": F.array_min(ext_y), "__maxy": F.array_max(ext_y)}),
        "__pid",
        (F.col("__minx"), F.col("__maxx"), F.col("__miny"), F.col("__maxy")),
        "polygon", "__pb")

    # slim candidate pairs: bbox overlap (a NECESSARY condition for
    # intersects) prunes pairs that only share a coarse tile; pairs sharing
    # several tiles are collapsed by the PBSM reporting-tile predicate (the
    # pair survives only in the minimum tile of the two covers'
    # intersection — pure integer codegen on the riding cover-min tiles)
    # instead of a distinct's shuffle. Exactly-once holds because the
    # feature side is unique per id (the groupBy above) and polys must be
    # unique per poly_id (the refine already requires that — duplicate
    # polygon rows would double their rings in the cogroup).
    cand = (fcov.join(pcov, on=["__tx", "__ty"])
            .filter((F.col("__fb0x") <= F.col("__pb1x"))
                    & (F.col("__pb0x") <= F.col("__fb1x"))
                    & (F.col("__fb0y") <= F.col("__pb1y"))
                    & (F.col("__pb0y") <= F.col("__fb1y")))
            .filter((F.col("__tx") == F.greatest("__fbtx0", "__pbtx0"))
                    & (F.col("__ty") == F.greatest("__fbty0", "__pbty0")))
            .select("__fid", "__pid")
            .withColumn("__salt", F.pmod(F.xxhash64("__fid"), F.lit(n_salt))))
    # SCALAR vertex rows, not array columns: pyarrow's arrow_to_pandas
    # SEGFAULTS on sliced nested-list batches in the cogroup load path
    # (observed with pyspark 4.1.2's bundled arrow once candidate groups
    # grow past one batch slice at sf0.1 — serializers.py:405, crash in
    # libarrow_python). Exploding (xs, ys) to one (idx, x, y) row per
    # vertex keeps the big cogroup side all-scalar — which is the shuffle
    # shape you want at 10^12 rows anyway — and the kernel rebuilds the
    # ragged arrays with one sort + np.split per group.
    # duplicate feature ids (same id appearing on several input rows) must
    # carry identical geometry — the id IS the geometry key here — and their
    # multiplicity is preserved: the refine runs once per distinct id, and
    # the output re-expands by the input row count (matching the broadcast
    # path, which emits one row per input ROW). Both the multiplicity and
    # the unique vertex rows come from the SAME g aggregation as the cover.
    fmult = g.select("__fid", "__mult")
    fvert = g.select(
        "__fid", "__gt",
        F.posexplode(F.arrays_zip(F.col("__fxs"), F.col("__fys")))
        .alias("__vi", "__v"))
    fvert = fvert.select(
        "__fid", "__gt", "__vi",
        F.col("__v.__fxs").alias("__x"), F.col("__v.__fys").alias("__y"))
    cand = cand.join(fvert, on="__fid")

    # the polygon side must ALSO be scalar rows through the cogroup: the
    # same arrow_to_pandas segfault fires on its sliced array<array<double>>
    # ring columns once enough (polygon, salt) groups share an Arrow batch
    # (reproduced at sf0.1; the candidate-side fix alone was not enough).
    # One (pid, ring_idx, vert_idx, x, y) row per vertex; rings rebuild in
    # the kernel by (ring, vertex) sort + np.split.
    pvert = pp.select("__pid", F.col("__pxs").alias("pxs"),
                      F.col("__pys").alias("pys"))
    pvert = pvert.select(
        "__pid", F.posexplode(F.arrays_zip("pxs", "pys")).alias("__ri", "__ring"))
    pvert = pvert.select(
        "__pid", "__ri",
        F.col("__ring.pxs").alias("rxs"), F.col("__ring.pys").alias("rys"))
    pvert = pvert.select(
        "__pid", "__ri",
        F.posexplode(F.arrays_zip("rxs", "rys")).alias("__pvi", "__pv"))
    pvert = pvert.select(
        F.col("__pid").alias("__pid_r"), "__ri", "__pvi",
        F.col("__pv.rxs").alias("__px"), F.col("__pv.rys").alias("__py"))
    # long cast: cogroup keys are partitioned per side WITHOUT cross-side
    # type coercion — an int salt here vs cand's long salt lands the two
    # sides of one key in different partitions (rows silently lost; see
    # partitioned_pip_join's polyrep note)
    polyrep = pvert.withColumn(
        "__salt_r",
        F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))
                  .cast("array<bigint>")))

    id_t = feats.schema[id_col].dataType.simpleString()
    pid_t = polys.schema[poly_id_col].dataType.simpleString()
    out_schema = (f"{id_col} {id_t}, {type_col} string, {poly_id_col} {pid_t}")

    def _refine(key, cand_pdf: pd.DataFrame, poly_pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({id_col: [], type_col: [], poly_id_col: []})
        if cand_pdf.empty or poly_pdf.empty:
            return empty
        poly_pdf = poly_pdf.sort_values(["__ri", "__pvi"], kind="mergesort")
        ri = poly_pdf["__ri"].to_numpy()
        _, rstarts = np.unique(ri, return_index=True)  # ring order ascending
        rx = np.split(poly_pdf["__px"].to_numpy(dtype=np.float64), rstarts[1:])
        ry = np.split(poly_pdf["__py"].to_numpy(dtype=np.float64), rstarts[1:])
        rings = [np.column_stack([x, y]) for x, y in zip(rx, ry)]
        poly = G.Polygon(rings[0], rings[1:])
        # rebuild ragged per-feature vertex arrays from the scalar rows
        cand_pdf = cand_pdf.sort_values(["__fid", "__vi"], kind="mergesort")
        fid = cand_pdf["__fid"].to_numpy()
        # rows are fid-sorted, so first-occurrence indices come out ascending
        ufid, starts = np.unique(fid, return_index=True)
        xs_list = np.split(cand_pdf["__x"].to_numpy(dtype=np.float64), starts[1:])
        ys_list = np.split(cand_pdf["__y"].to_numpy(dtype=np.float64), starts[1:])
        gtypes = cand_pdf["__gt"].to_numpy()[starts]
        hit = G.geoms_intersect_polygon(gtypes, xs_list, ys_list, poly)
        if not hit.any():
            return empty
        return pd.DataFrame({id_col: ufid[hit],
                             type_col: gtypes[hit],
                             poly_id_col: key[0]})

    refined = (cand.groupBy("__pid", "__salt")
               .cogroup(polyrep.groupBy("__pid_r", "__salt_r"))
               .applyInPandas(_refine, out_schema))
    return (refined
            .join(fmult.withColumnRenamed("__fid", id_col), on=id_col)
            .withColumn("__rep", F.explode(
                F.array_repeat(F.lit(1), F.col("__mult").cast("int"))))
            .drop("__mult", "__rep"))


def dwithin_join(left: DataFrame, right: DataFrame, eps: int,
                 left_id: str = "a_id", right_id: str = "b_id",
                 x_col: str = "px", y_col: str = "py") -> DataFrame:
    """Distance-band join (ST_DWithin): ALL (a, b) pairs with
    dist((a), (b))² <= eps² — the two-table radius join next to the
    engine's kNN (fixed count, not fixed radius) and grid_cluster (self
    radius). Classic uses: POIs near roads, captures near a landmark,
    sensor-to-station assignment.

    Coordinates are NON-NEGATIVE integers (quantized milli-degrees or
    tile-local; shift signed coords first — DIV truncation vs floor is the
    engine-wide negative-grid hazard, see spatial_cluster). Exact integer
    refine, no float, no epsilon.

    Scale shape: left is bucketed by its own eps-grid cell; right explodes
    to the 9-cell stencil; the cell equi-join + dist² filter produce each
    qualifying pair EXACTLY once (a's cell is fixed, so it matches exactly
    one of b's nine probes) — no distinct needed, no cross join, shuffle
    linear in rows (9x the right side). Output: (left_id, right_id, d2).
    """
    ax, ay = F.col(x_col), F.col(y_col)
    a = left.select(F.col(left_id).alias("__aid"), ax.alias("__ax"),
                    ay.alias("__ay"),
                    F.expr(f"{x_col} DIV {eps}").alias("__cx"),
                    F.expr(f"{y_col} DIV {eps}").alias("__cy"))
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx in (-1, 0, 1) for dy in (-1, 0, 1)])
    b = (right.select(F.col(right_id).alias("__bid"), ax.alias("__bx"),
                      ay.alias("__by"),
                      F.expr(f"{x_col} DIV {eps}").alias("__bcx"),
                      F.expr(f"{y_col} DIV {eps}").alias("__bcy"))
         .withColumn("__o", F.explode(offs))
         .select("__bid", "__bx", "__by",
                 (F.col("__bcx") + F.col("__o.dx")).alias("__cx"),
                 (F.col("__bcy") + F.col("__o.dy")).alias("__cy")))
    d2 = ((F.col("__ax") - F.col("__bx")) * (F.col("__ax") - F.col("__bx"))
          + (F.col("__ay") - F.col("__by")) * (F.col("__ay") - F.col("__by")))
    return (a.join(b, on=["__cx", "__cy"])
            .filter(d2 <= eps * eps)
            .select(F.col("__aid").alias(left_id),
                    F.col("__bid").alias(right_id),
                    d2.cast("long").alias("d2")))


def dwithin_join_sql(left_src: str, right_src: str, eps: int,
                     left_id: str = "a_id", right_id: str = "b_id") -> str:
    """DuckDB twin of dwithin_join over CTE sources yielding (id, px, py):
    same cell equi-join shape (equality keys hash-join in DuckDB; a brute
    inequality join would nested-loop), same integer refine."""
    return f"""
WITH __dla AS ({left_src}),
__dlb AS ({right_src}),
__ga AS (SELECT id AS aid, px AS ax, py AS ay,
                px // {eps} AS cx, py // {eps} AS cy FROM __dla),
__gb0 AS (SELECT id AS bid, px AS bx, py AS by,
                 px // {eps} AS bcx, py // {eps} AS bcy FROM __dlb),
__gb AS (SELECT bid, bx, by, bcx + dx.d AS cx, bcy + dy.d AS cy
         FROM __gb0, generate_series(-1, 1) dx(d), generate_series(-1, 1) dy(d))
SELECT a.aid AS {left_id}, b.bid AS {right_id},
       CAST((a.ax - b.bx)*(a.ax - b.bx) + (a.ay - b.by)*(a.ay - b.by) AS BIGINT) AS d2
FROM __ga a JOIN __gb b ON a.cx = b.cx AND a.cy = b.cy
WHERE (a.ax - b.bx)*(a.ax - b.bx) + (a.ay - b.by)*(a.ay - b.by) <= {eps * eps}
"""
