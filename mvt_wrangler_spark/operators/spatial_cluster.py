"""Spatial clustering at scale: single-linkage over an eps-grid.

Groups points into clusters where every member is within `eps` of some
other member (DBSCAN with min_pts=1 / fixed-radius single linkage) — the
spatial analog of near-dup clustering, used to merge duplicate POI pins,
collapse burst captures at one location, or build label regions.

Scale shape — pure DataFrame ops, NO Python anywhere:
  1. cell = integer floor-division of coordinates by eps. Any two points
     within eps are in the same or 8-adjacent cells.
  2. candidate pairs = equi-join of points against a 9-stencil explode of
     points (each point probes its cell + 8 neighbors). This is a HASH
     join on cell ids — never a distance cross-join.
  3. exact refine: dist² <= eps², integer-exact for integer coordinates.
  4. transitive closure via pair_clusters (large-star/small-star) with the
     corpus wrapper, so isolated points come back as size-1 clusters.

Coordinates must be NON-NEGATIVE integers (tile-local / quantized
space): Spark's DIV truncates while floor-division floors, so negative
coordinates would put -1..-eps+1 into cell 0 alongside 0..eps-1. Quantize
into a non-negative grid first (the MVT-space convention used across this
engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import pair_clusters_with_corpus

_STENCIL = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]


def grid_cluster_pairs(pts: DataFrame, eps: int, id_col: str = "id",
                       x_col: str = "px", y_col: str = "py") -> DataFrame:
    """(id_a, id_b) pairs with id_a < id_b and distance² <= eps²."""
    cx = F.expr(f"{x_col} DIV {eps}")
    cy = F.expr(f"{y_col} DIV {eps}")
    a = pts.select(F.col(id_col).alias("id_a"), F.col(x_col).alias("__ax"),
                   F.col(y_col).alias("__ay"), cx.alias("__cx"),
                   cy.alias("__cy"))
    # probe side: each point appears once per stencil cell it should meet
    b = pts.select(F.col(id_col).alias("id_b"), F.col(x_col).alias("__bx"),
                   F.col(y_col).alias("__by"), cx.alias("__bcx"),
                   cy.alias("__bcy"))
    offs = F.array(*[F.struct(F.lit(dx).alias("dx"), F.lit(dy).alias("dy"))
                     for dx, dy in _STENCIL])
    b = (b.withColumn("__o", F.explode(offs))
         .select("id_b", "__bx", "__by",
                 (F.col("__bcx") + F.col("__o.dx")).alias("__cx"),
                 (F.col("__bcy") + F.col("__o.dy")).alias("__cy")))
    d2 = ((F.col("__ax") - F.col("__bx")) * (F.col("__ax") - F.col("__bx"))
          + (F.col("__ay") - F.col("__by")) * (F.col("__ay") - F.col("__by")))
    return (a.join(b, on=["__cx", "__cy"])
            .filter((F.col("id_a") < F.col("id_b")) & (d2 <= eps * eps))
            .select("id_a", "id_b").distinct())


def grid_cluster(pts: DataFrame, eps: int, id_col: str = "id",
                 x_col: str = "px", y_col: str = "py",
                 max_rounds: int = 50) -> DataFrame:
    """(member_id, cluster_rep, cluster_size) for EVERY input point."""
    pairs = grid_cluster_pairs(pts, eps, id_col, x_col, y_col)
    return pair_clusters_with_corpus(pts, pairs, id_col=id_col,
                                     max_rounds=max_rounds)


def grid_cluster_sql(pts_src: str, eps: int, id_col: str = "id",
                     x_col: str = "px", y_col: str = "py") -> str:
    """DuckDB twin: same stencil equi-join + refine, then the recursive
    reachability closure, left-joined back onto the corpus for
    singletons."""
    from .dedup import pair_clusters_sql

    pairs = f"""
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b
FROM (SELECT *, {x_col} // {eps} AS cx, {y_col} // {eps} AS cy
      FROM ({pts_src})) a
JOIN (SELECT p.*, p.{x_col} // {eps} + o.dx AS cx,
             p.{y_col} // {eps} + o.dy AS cy
      FROM ({pts_src}) p,
           (SELECT dx.d AS dx, dy.d AS dy
            FROM generate_series(-1, 1) dx(d),
                 generate_series(-1, 1) dy(d)) o) b
  ON a.cx = b.cx AND a.cy = b.cy
WHERE a.{id_col} < b.{id_col}
  AND (a.{x_col} - b.{x_col}) * (a.{x_col} - b.{x_col})
    + (a.{y_col} - b.{y_col}) * (a.{y_col} - b.{y_col}) <= {eps * eps}
"""
    closure = pair_clusters_sql(pairs)
    return f"""
SELECT CAST(p.{id_col} AS BIGINT) AS member_id,
       coalesce(c.cluster_rep, CAST(p.{id_col} AS BIGINT)) AS cluster_rep,
       coalesce(c.cluster_size, 1) AS cluster_size
FROM ({pts_src}) p LEFT JOIN ({closure}) c ON c.member_id = p.{id_col}
"""
