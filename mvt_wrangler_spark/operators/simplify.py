"""Douglas–Peucker polyline simplification — the low-zoom geometry step.

Tile pipelines simplify feature geometry as zoom decreases (a z8 road does
not need z14 vertex density). Classic Douglas–Peucker over INTEGER
tile-local coordinates, kept integer-exact end to end: the split test
compares cross² > eps² · len² (both int64 polynomials of the vertices), so
there is no float anywhere, ties break to the lowest vertex index, and the
DuckDB twin — a recursive CTE that splits segments at the same argmax —
reproduces the kept-vertex set exactly.

Execution shape: one mapInPandas over assembled rings (no extra shuffle);
per ring the kernel is a worklist loop whose per-segment argmax is a
vectorized numpy reduction over the segment's span.

Overflow bounds (ANSI-safe): |cross| <= 2·extent² and cross² <= 4·extent⁴,
so extent up to 2^14 and eps²·len² up to 2^59 stay inside int64.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame


def dp_keep_mask(x: np.ndarray, y: np.ndarray, eps2: int) -> np.ndarray:
    """Boolean keep-mask for the OPEN polyline (endpoints always kept).

    Degenerate segments (identical endpoints) never split — same rule as
    the SQL twin (cross² is 0 when the chord is a point).
    """
    x = np.asarray(x, dtype=np.int64)
    y = np.asarray(y, dtype=np.int64)
    n = len(x)
    keep = np.zeros(n, dtype=bool)
    if n == 0:
        return keep
    keep[0] = keep[n - 1] = True
    stack = [(0, n - 1)]
    while stack:
        lo, hi = stack.pop()
        if hi <= lo + 1:
            continue
        dx, dy = x[hi] - x[lo], y[hi] - y[lo]
        cross = dx * (y[lo + 1:hi] - y[lo]) - dy * (x[lo + 1:hi] - x[lo])
        c2 = cross * cross
        j = int(np.argmax(c2))  # first max == lowest index on ties
        if c2[j] > eps2 * (dx * dx + dy * dy):
            mid = lo + 1 + j
            keep[mid] = True
            stack.append((lo, mid))
            stack.append((mid, hi))
    return keep


def simplify_lines(df: DataFrame, eps: int, id_col: str = "gkey",
                   xs_col: str = "xs", ys_col: str = "ys") -> DataFrame:
    """(id, xs, ys) integer polylines -> (id, kept_seq) rows: the 0-based
    positions of the vertices Douglas–Peucker keeps at tolerance eps."""
    out_schema = f"{id_col} long, kept_seq long"
    eps2 = eps * eps

    def _simp(batches):
        import pandas as pd

        for pdf in batches:
            ids, seqs = [], []
            for gid, xs, ys in zip(pdf[id_col], pdf[xs_col], pdf[ys_col]):
                m = dp_keep_mask(np.asarray(xs, dtype=np.int64),
                                 np.asarray(ys, dtype=np.int64), eps2)
                kept = np.flatnonzero(m)
                ids.extend([gid] * len(kept))
                seqs.extend(kept.tolist())
            yield pd.DataFrame({id_col: pd.Series(ids, dtype="int64"),
                                "kept_seq": pd.Series(seqs, dtype="int64")})

    return df.mapInPandas(_simp, out_schema)


def simplify_sql(src: str, eps: int) -> str:
    """Recursive-CTE twin over `src`(gkey, i, x, y) with i dense 0-based per
    gkey; exposes __kept(gkey, kept_seq). Kept set = both global endpoints
    plus every split vertex == the DISTINCT endpoints of all segments the
    recursion visits."""
    eps2 = eps * eps
    return f"""
__dpseg(gkey, lo, hi) AS (
  SELECT gkey, min(i) AS lo, max(i) AS hi FROM {src} GROUP BY gkey
  UNION ALL
  (
   WITH __cand AS (
     SELECT s.gkey, s.lo, s.hi, m.j, m.c2, m.l2,
            row_number() OVER (PARTITION BY s.gkey, s.lo, s.hi
                               ORDER BY m.c2 DESC, m.j ASC) AS rn
     FROM __dpseg s JOIN LATERAL (
       SELECT mid.i AS j,
              ((b.x - a.x)*(mid.y - a.y) - (b.y - a.y)*(mid.x - a.x))
              * ((b.x - a.x)*(mid.y - a.y) - (b.y - a.y)*(mid.x - a.x)) AS c2,
              ((b.x - a.x)*(b.x - a.x) + (b.y - a.y)*(b.y - a.y)) AS l2
       FROM {src} mid, {src} a, {src} b
       WHERE mid.gkey = s.gkey AND a.gkey = s.gkey AND b.gkey = s.gkey
         AND a.i = s.lo AND b.i = s.hi AND mid.i > s.lo AND mid.i < s.hi
     ) m ON true
     WHERE s.hi > s.lo + 1
   ),
   __win AS (SELECT * FROM __cand WHERE rn = 1 AND c2 > {eps2} * l2)
   SELECT gkey, lo, j AS hi FROM __win
   UNION ALL
   SELECT gkey, j AS lo, hi FROM __win
  )
),
__kept AS (
  -- explicit outer DISTINCT: DuckDB does not fully dedupe a plain UNION
  -- of two references to a recursive CTE (duplicates survive)
  SELECT DISTINCT gkey, kept_seq FROM (
    SELECT gkey, lo AS kept_seq FROM __dpseg
    UNION ALL
    SELECT gkey, hi AS kept_seq FROM __dpseg
  )
)"""
