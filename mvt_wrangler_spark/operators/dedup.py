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

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf


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


def phash_dedup_agg(df: DataFrame, keys: tuple[str, ...] = ("z", "x", "y", "phash"),
                    order_col: str = "image_id", extra_aggs: dict | None = None) -> DataFrame:
    """Keeper-id dedup via groupBy/min — same keeper semantics as phash_dedup
    but with map-side partial aggregation and a narrow shuffle row (keys +
    aggregates only, no full-row carry). Use when downstream needs keeper ids
    and per-group stats rather than the full surviving rows: at 10^12 rows
    the window variant shuffles every column, this one only the group keys.
    """
    aggs = [F.min(order_col).alias(f"keeper_{order_col}"), F.count(F.lit(1)).alias("n_dups")]
    for name, expr in (extra_aggs or {}).items():
        aggs.append(expr.alias(name))
    return df.groupBy(*keys).agg(*aggs)


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


def minhash_band_buckets(text_col, num_hashes: int = 32, bands: int = 8, shingle: int = 5):
    """array<long> of LSH band-bucket hashes — vectorized numpy pandas UDF.

    Spark's higher-order fns (transform/aggregate) evaluate interpreted per
    element (~100x slower than codegen), so the signature is computed in one
    Arrow-batched numpy pass: rolling polynomial shingle hash (sliding window
    dot product, uint64 wraparound) -> splitmix64 mix -> num_hashes affine
    mins -> per-band mix. Deterministic; no library hash functions.
    """
    width = num_hashes // bands
    P = np.uint64(2147483647)
    A = np.array([2 * i + 1 for i in range(num_hashes)], dtype=np.uint64)
    B = np.array([(i * 0x9E3779B9 + 7) % 2147483647 for i in range(num_hashes)], dtype=np.uint64)
    K = np.uint64(1099511628211)  # FNV prime as polynomial base
    POWS = np.empty(shingle, dtype=np.uint64)
    acc = 1
    for j in range(shingle):
        POWS[j] = acc
        acc = (acc * int(K)) % (1 << 64)

    def _mix(x: np.ndarray) -> np.ndarray:
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    @pandas_udf("array<long>")
    def _buckets(texts: pd.Series) -> pd.Series:
        out = []
        with np.errstate(over="ignore"):
            for t in texts:
                b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
                if len(b) < shingle:
                    b = np.pad(b, (0, shingle - len(b)), constant_values=32)
                win = np.lib.stride_tricks.sliding_window_view(b, shingle).astype(np.uint64)
                sh = _mix(win @ POWS)                      # (n_shingles,) u64
                vals = ((sh[:, None] % P) * A + B) % P     # (n_shingles, H)
                sig = vals.min(axis=0)                     # (H,)
                bb = sig.reshape(bands, width)
                bucket = _mix(
                    bb @ POWS[:width] if width <= shingle
                    else bb @ np.arange(1, width + 1, dtype=np.uint64)
                )
                bucket = (np.arange(bands, dtype=np.uint64) << np.uint64(56)) ^ bucket
                out.append(bucket.astype(np.int64))
        return pd.Series(out)

    return _buckets(text_col)


def minhash_lsh_candidates(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
                           num_hashes: int = 32, bands: int = 8, shingle: int = 5) -> DataFrame:
    """Candidate near-duplicate pairs via LSH banding.

    band-bucket hashes (one numpy UDF pass) -> explode -> self equi-join on
    bucket -> distinct candidate id pairs (a < b). The bucket join is a
    hash-uniform equi-join: scales as a standard shuffle; band index is
    folded into the bucket hash so one join covers all bands.
    """
    banded = df.select(
        F.col(id_col).alias("id"),
        F.explode(minhash_band_buckets(F.col(text_col), num_hashes, bands, shingle)).alias("bucket"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, on="bucket")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def embedding_neardup_pairs(df: DataFrame, id_col: str = "vec_id",
                            vec_col: str = "embedding", quant: int = 100,
                            cos_num: int = 16, cos_den: int = 100) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact integer test: keep (a < b) with
    score>0 and score^2 * cos_den > cos_num * |a|^2 * |b|^2 (i.e. cos^2 >
    cos_num/cos_den on `quant`-quantized vectors).

    The comparison matrix is computed as an int64 matmul per Arrow batch
    against the broadcast quantized matrix — identical results to the
    per-pair SQL (Spark HOF aggregate is interpreted per element and ~50x
    slower). Scale path: for >1e6 vectors, LSH-bucket by dominant-dimension
    signs first and run this within buckets.
    """
    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    Q = np.round(np.array([r[1] for r in rows], dtype=np.float64) * quant).astype(np.int64)
    norms = (Q * Q).sum(axis=1)
    bc = spark.sparkContext.broadcast((ids, Q, norms))

    def _pairs(pdfs):
        aids, aq, anorm = bc.value
        for pdf in pdfs:
            if not len(pdf):
                continue
            bq = np.round(np.stack(pdf[vec_col].to_numpy()).astype(np.float64) * quant).astype(np.int64)
            bids = pdf[id_col].to_numpy(dtype=np.int64)
            bnorm = (bq * bq).sum(axis=1)
            S = bq @ aq.T  # (B, N) int64
            # int64-safe: |q|<=quant, dim 64 -> S <= 64*quant^2 ~ 6.4e5;
            # S^2*cos_den ~ 4e13 and norms product *cos_num ~ 7e12, both < 2^63
            ok = (S > 0) & (S * S * cos_den > cos_num * np.outer(bnorm, anorm))
            lt = bids[:, None] < aids[None, :]
            bi, ai = np.nonzero(ok & lt)
            yield pd.DataFrame({"id_a": bids[bi], "id_b": aids[ai]})

    return df.select(id_col, vec_col).mapInPandas(_pairs, "id_a long, id_b long")


def simhash64(text_col, shingle: int = 3):
    """64-bit SimHash over character shingles — vectorized numpy bit-vote.

    (A JVM higher-order-fn formulation needs 64 interpreted aggregate()
    passes per row — measured 39s for 500 docs; this is one Arrow pass.)
    Shingle hashing shares minhash's rolling-polynomial + splitmix64 mix.
    """
    K = np.uint64(1099511628211)
    POWS = np.empty(shingle, dtype=np.uint64)
    acc = 1
    for j in range(shingle):
        POWS[j] = acc
        acc = (acc * int(K)) % (1 << 64)

    def _mix(x: np.ndarray) -> np.ndarray:
        x = (x + np.uint64(0x9E3779B97F4A7C15))
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))

    @pandas_udf("long")
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.empty(len(texts), dtype=np.int64)
        with np.errstate(over="ignore"):
            for n, t in enumerate(texts):
                b = np.frombuffer((t or "").encode("utf-8"), dtype=np.uint8)
                if len(b) < shingle:
                    b = np.pad(b, (0, shingle - len(b)), constant_values=32)
                win = np.lib.stride_tricks.sliding_window_view(b, shingle).astype(np.uint64)
                sh = _mix(win @ POWS)  # (n_shingles,) u64
                # bit votes: +1 where bit set, -1 where clear
                bits = (sh[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)
                votes = 2 * bits.astype(np.int64).sum(axis=0) - len(sh)
                word = np.uint64(0)
                setbits = np.nonzero(votes > 0)[0]
                for i in setbits:
                    word |= np.uint64(1) << np.uint64(i)
                out[n] = np.int64(word.astype(np.int64))
        return pd.Series(out)

    return _simhash(text_col)
