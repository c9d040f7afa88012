"""Deduplication operators: phash-per-tile (north rule) + the training-data
suite (exact, minhash-LSH, simhash) over text/bytes columns.

The reference's only dedup is the per-tile dictionary re-encode
(/root/reference/src/transform.rs:174-191); the graft promotes dedup to a
first-class operator family.

Skew note: `phash_dedup` groups on (z, x, y, phash). Hot metro tiles are the
skew risk, but the group key INCLUDES phash, which is hash-uniform within a
tile — so the shuffle key space is fine without salting; salting is applied
in the tile-level aggregations (see rollup.py / pipeline.py) where the key is
the bare tile.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def phash_dedup(df: DataFrame, keys: tuple[str, ...] = ("z", "x", "y", "phash"),
                order_col: str = "image_id") -> DataFrame:
    """Keep the min-`order_col` row per (tile, phash) — deterministic keeper.

    row_number window; partial map-side combine isn't available for window
    fns, but the key includes phash so partitions are balanced.
    """
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def exact_dedup(df: DataFrame, on: str, order_col: str) -> DataFrame:
    """Exact dedup by column value, deterministic keeper (min order_col)."""
    w = Window.partitionBy(on).orderBy(F.col(order_col).asc())
    return df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")


# ---------------------------------------------------------------------------
# Text near-dup: character-shingle minhash + LSH banding (documents table)
# ---------------------------------------------------------------------------

def _shingle_hashes(text_col, n: int = 5):
    """Array of xxhash64 values of character n-gram shingles (JVM-side)."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text_col) - (n - 1), F.lit(1)))
    return F.transform(idx, lambda i: F.xxhash64(text_col.substr(i, F.lit(n))))


def minhash_signature(text_col, num_hashes: int = 32, shingle: int = 5):
    """MinHash signature as array<long>, fully JVM-side.

    One xxhash64 per shingle, then num_hashes cheap affine reshuffles
    (a_i * h + b_i mod 2^61-1) minimized with aggregate() — no Python.
    """
    base = _shingle_hashes(text_col, shingle)
    P = 2147483647  # 2^31 - 1; reshuffles stay far from int64 overflow (ANSI mode)
    sigs = []
    for i in range(num_hashes):
        a, b = 2 * i + 1, (i * 0x9E3779B9 + 7) % P
        sigs.append(
            F.array_min(F.transform(base, lambda h: F.pmod(F.pmod(h, F.lit(P)) * a + b, F.lit(P))))
        )
    return F.array(*sigs)


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                           num_hashes: int = 32, bands: int = 8, shingle: int = 5) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    signature -> split into `bands` rows of width num_hashes/bands -> bucket
    join on (band_idx, band_hash) -> distinct candidate id pairs (a < b).
    The band join is a hash-uniform equi-join: scales as a standard shuffle.
    """
    width = num_hashes // bands
    sig = df.select(F.col(id_col).alias("id"),
                    minhash_signature(F.col(text_col), num_hashes, shingle).alias("sig"))
    banded = sig.select(
        "id",
        F.posexplode(
            F.array(*[
                F.xxhash64(F.concat_ws(",", *[F.element_at("sig", i * width + j + 1).cast("string")
                                              for j in range(width)]))
                for i in range(bands)
            ])
        ).alias("band", "bucket"),
    )
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def simhash64(text_col, shingle: int = 3):
    """64-bit SimHash over character shingles, JVM-side bit-vote aggregate."""
    hashes = _shingle_hashes(text_col, shingle)
    bits = []
    for i in range(64):
        votes = F.aggregate(
            hashes, F.lit(0),
            lambda acc, h: acc + F.when(h.bitwiseAND(F.lit(1 << i if i < 63 else -(1 << 63))) != 0, 1).otherwise(-1),
        )
        bits.append(F.when(votes > 0, F.lit(1 << i if i < 63 else -(1 << 63))).otherwise(F.lit(0)).cast("long"))
    out = F.lit(0).cast("long")
    for b in bits:
        out = out.bitwiseOR(b)
    return out
