"""Deterministic sampling for training-data pipelines.

Two shapes a 100 TB curation job needs constantly:

  * hash_sample — stateless Bernoulli by integer hash threshold. No RNG
    state, no shuffle, no partition sensitivity: the decision is a pure
    function of the row id, so re-runs, retried tasks, and different
    cluster sizes all keep the SAME rows (rand()-based sampling breaks all
    three). Plan: a codegen filter that pushes down next to the scan.
  * stratified_topk — exactly k rows per group (per tile/cell/class),
    picked by the same deterministic hash so the per-group sample is
    stable. Plan: one shuffle on the group key + per-group window; group
    cardinality is the tile universe, so no single-task funnel.

The mix is two multiply-mod rounds (Numerical Recipes + MINSTD constants,
both public) with xor-shift steps between them. The xor is load-bearing: a
single affine step mod p has severe serial correlation (consecutive ids
select with an even/odd stripe pattern, and a salt merely rotates the same
pattern — composing affine rounds stays affine), while the xor breaks
linearity. The raw id is reduced mod p BEFORE the first multiply, so every
intermediate stays < 2^31 * 2^31 < int64 max for the FULL int64 id range
(xxhash64-style ids included) — no ANSI overflow, and every step is exactly
expressible in DuckDB for the twins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_M1 = 1103515245
_M2 = 48271
_INC = 12345
_MOD = 2147483647


def sample_hash(id_col: Column, salt: int = 0) -> Column:
    """Deterministic uniform-ish hash in [0, 2^31-2] from an int64 id.

    The id is reduced mod p first: (id % p) * _M1 is congruent to id * _M1
    mod p, so results are unchanged for small ids, while |id| >= ~8.4e9 no
    longer overflows int64 in the multiply (ANSI-safe for full-range ids).
    """
    h = F.pmod(F.pmod(id_col, F.lit(_MOD)) * F.lit(_M1)
               + F.lit(_INC + salt), F.lit(_MOD))
    h = h.bitwiseXOR(F.shiftrightunsigned(h, 15))
    h = F.pmod(h * F.lit(_M2), F.lit(_MOD))
    h = h.bitwiseXOR(F.shiftrightunsigned(h, 13))
    return F.pmod(h, F.lit(_MOD))


def sample_hash_sql(id_col: str, salt: int = 0) -> str:
    r = f"((CAST({id_col} AS BIGINT) % {_MOD} + {_MOD}) % {_MOD})"
    h1 = f"((({r} * {_M1} + {_INC + salt}) % {_MOD} + {_MOD}) % {_MOD})"
    h2 = f"xor({h1}, {h1} >> 15)"
    h3 = f"(({h2} * {_M2}) % {_MOD})"
    h4 = f"xor({h3}, {h3} >> 13)"
    return f"({h4} % {_MOD})"


def hash_sample(df: DataFrame, frac: float, id_col: str = "id",
                salt: int = 0) -> DataFrame:
    """Keep ~frac of rows, decided per-row by hash threshold — reproducible
    across runs, retries, and cluster sizes."""
    thr = int(frac * _MOD)
    return df.filter(sample_hash(F.col(id_col), salt) < F.lit(thr))


def stratified_topk(df: DataFrame, keys: list[str], k: int,
                    id_col: str = "id", salt: int = 0,
                    rank_col: str = "rn") -> DataFrame:
    """Exactly min(k, group size) rows per group, deterministically.

    Orders each group by (hash, id) — ties-free — and keeps rank <= k.
    The id tiebreak makes the output a pure function of the input set.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(*keys)
         .orderBy(sample_hash(F.col(id_col), salt), F.col(id_col)))
    return (df.withColumn(rank_col, F.row_number().over(w))
            .filter(F.col(rank_col) <= k))


def assign_shards(df: DataFrame, keys: list[str], size_col: str,
                  shard_bytes: int, id_col: str = "id",
                  out_col: str = "shard") -> DataFrame:
    """Deterministic training-shard assignment: within each group (tile/
    cell/class), rows are packed into ~shard_bytes shards in id order —
    shard = exclusive-prefix-sum(size) // shard_bytes.

    The webdataset-style sharding step of a curation pipeline, as exact
    integer column math: assignment is a pure function of the input set
    (stable across runs and cluster sizes), and the plan is one key shuffle
    + window cumsum — no Python, no driver-side packing loop. Invariant
    (offset-based): the first row of shard k+1 has prefix sum
    >= (k+1)*shard_bytes, i.e. shard boundaries fall at fixed byte offsets;
    a row that OVERHANGS a boundary counts toward the shard it starts in,
    so a non-last shard can hold less than shard_bytes of row-starts while
    the byte RANGE it covers is always exactly shard_bytes.
    """
    from pyspark.sql import Window

    w = (Window.partitionBy(*keys).orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    off = F.coalesce(F.sum(size_col).over(w), F.lit(0).cast("long"))
    # integer DIV, not float '/': float division loses exactness past 2^53
    # (offsets are byte totals — they get there at shard scale)
    return (df.withColumn("__shard_off", off)
            .withColumn(out_col, F.expr(f"__shard_off DIV {shard_bytes}"))
            .drop("__shard_off"))


def split_thresholds(fractions: dict[str, float]) -> list[tuple[str, int]]:
    """(name, exclusive upper hash bound) per split, in dict order.

    Bounds are exact integers on the hash range [0, p): cumulative
    fraction * (p-1), floored — so Spark and the DuckDB twin compare
    against the SAME integers and the assignment is reproducible from the
    fraction spec alone. The last split absorbs rounding (bound = p)."""
    if not fractions:
        raise ValueError("fractions must be non-empty")
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    out, acc = [], 0.0
    names = list(fractions)
    for name in names[:-1]:
        acc += fractions[name]
        out.append((name, int(acc * (_MOD - 1))))
    out.append((names[-1], _MOD))
    return out


def assign_split(df: DataFrame, fractions: dict[str, float],
                 id_col: str = "id", salt: int = 0,
                 out_col: str = "split") -> DataFrame:
    """Deterministic train/val/test split assignment.

    Each row's split is a pure function of (id, salt): the sample hash
    lands in [0, p) and contiguous ranges proportional to `fractions` name
    the split. The properties a 100 TB curation pipeline needs:

      * stable under growth — ingesting more rows later never moves an
        existing row between splits (no global count, no rand() state);
      * stable under retries / cluster size — no partition sensitivity;
      * zero shuffle — one codegen CASE next to the scan;
      * leak-free vs sampling — use a DIFFERENT salt than any upstream
        hash_sample, or the subsample correlates with the split boundary
        (same hash family ⇒ same ordering of ids).

    Group-level splitting (all rows of one document/site/cluster on the
    same side — the usual contamination guard) falls out by passing the
    GROUP id as id_col."""
    h = sample_hash(F.col(id_col), salt)
    bounds = split_thresholds(fractions)
    expr = F.lit(bounds[-1][0])
    for name, ub in reversed(bounds[:-1]):
        expr = F.when(h < F.lit(ub), F.lit(name)).otherwise(expr)
    return df.withColumn(out_col, expr)


def assign_split_sql(fractions: dict[str, float], id_col: str = "id",
                     salt: int = 0) -> str:
    """DuckDB twin of assign_split's CASE (same integer bounds)."""
    h = sample_hash_sql(id_col, salt)
    bounds = split_thresholds(fractions)
    whens = "".join(f" WHEN {h} < {ub} THEN '{name}'"
                    for name, ub in bounds[:-1])
    return f"CASE{whens} ELSE '{bounds[-1][0]}' END"


def shard_manifest(df: DataFrame, keys: list[str], size_col: str,
                   shard_bytes: int, id_col: str = "id") -> DataFrame:
    """Random-access shard manifest: assign_shards' deterministic packing
    plus, per row, its sequence number and byte offsets WITHIN its shard —
    the index a training loader needs to seek straight to sample k of
    shard s without reading the archive sequentially.

    Columns added: shard (assign_shards), seq (0-based row order inside
    the shard), byte_start / byte_end (within-shard offsets; end
    exclusive). Exactness: both cumsums are int64 window sums over the
    same (group, id) total order, so the manifest is a pure function of
    the input set — a re-run, a retry, or a different cluster size
    produces byte-identical manifests (the property that makes resumable
    multi-epoch training possible).

    Plan: ONE shuffle on the group keys; the shard assignment and both
    within-shard window passes reuse the same partitioning (no second
    exchange — shard is a function of the group-ordered cumsum, and the
    within-shard window partitions by (keys..., shard), a refinement of
    the same keys).
    """
    from pyspark.sql import Window

    with_shards = assign_shards(df, keys, size_col, shard_bytes,
                                id_col=id_col)
    w = (Window.partitionBy(*keys, "shard").orderBy(id_col)
         .rowsBetween(Window.unboundedPreceding, -1))
    start = F.coalesce(F.sum(size_col).over(w), F.lit(0).cast("long"))
    ws = Window.partitionBy(*keys, "shard").orderBy(id_col)
    return (with_shards
            .withColumn("seq", (F.row_number().over(ws) - 1).cast("long"))
            .withColumn("byte_start", start)
            .withColumn("byte_end",
                        (F.col("byte_start") + F.col(size_col)).cast("long")))


def shard_manifest_sql(src: str, keys: list[str], size_col: str,
                       shard_bytes: int, id_col: str = "id") -> str:
    """DuckDB twin of shard_manifest over a CTE/subquery `src`."""
    ks = ", ".join(keys)
    return f"""
WITH __sm0 AS (SELECT * FROM ({src}) __smsrc),
__sm1 AS (
  SELECT *, CAST(coalesce(sum({size_col}) OVER (
              PARTITION BY {ks} ORDER BY {id_col}
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            // {shard_bytes} AS BIGINT) AS shard
  FROM __sm0),
__sm2 AS (
  SELECT *,
         CAST(row_number() OVER w - 1 AS BIGINT) AS seq,
         CAST(coalesce(sum({size_col}) OVER (
               PARTITION BY {ks}, shard ORDER BY {id_col}
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS byte_start
  FROM __sm1
  WINDOW w AS (PARTITION BY {ks}, shard ORDER BY {id_col}))
SELECT *, CAST(byte_start + {size_col} AS BIGINT) AS byte_end FROM __sm2
"""
