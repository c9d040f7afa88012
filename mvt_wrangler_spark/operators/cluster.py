"""Distributed k-means (integer Lloyd) + learned-centroid IVF assignment.

The iterative-algorithm class of the engine: a driver loop over DataFrame
stages, the pattern the reference has no analog for but a 10^12-row
embedding pipeline needs (coarse quantizers for IVF ANN, cluster-balanced
sharding, dedup blocking). Everything is INTEGER math so results are
bit-deterministic and SQL-restatable (the contract oracle unrolls the same
iterations in DuckDB):

  * vectors quantized to int64 (round(v * quant) — the convention every
    embedding operator here uses);
  * init: the k vectors with the smallest ids, centroid id = rank order —
    deterministic, engine-independent;
  * assignment: exact squared-L2 argmin (integer), ties to the lowest
    centroid id; computed in one numpy pandas pass (integer GEMM — order
    of summation is irrelevant for ints, so numpy == sequential SQL);
  * update: per-dimension TRUNCATED integer mean — DuckDB's `//` truncates
    toward zero on negatives (measured: -7 // 2 = -3, NOT floor), same as
    Spark's `div`; the driver-side update uses the same truncation. Empty
    clusters keep their previous centroid.

Scale shape: the per-iteration reduce is posexplode -> groupBy(cluster, dim)
partial-agg (map-side combined, k*dim result rows); only the k x dim
centroid table ever reaches the driver (tiny by construction). The
assignment stage is one Arrow pass over the vectors.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _quantized(emb: DataFrame, id_col: str, vec_col: str, quant: int) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("id"),
        F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * quant).cast("long")).alias("q"),
    )


def _assign_pass(qdf: DataFrame, centroids: list[list[int]]) -> DataFrame:
    """(id, q) -> (id, q, cluster, dist2): exact integer argmin, one Arrow pass."""
    C = np.asarray(centroids, dtype=np.int64)          # (k, d)
    cn = (C * C).sum(axis=1)                           # |c|^2, (k,)

    def _assign(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            V = np.asarray([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            d2 = ((V * V).sum(axis=1)[:, None] - 2 * (V @ C.T) + cn[None, :])
            cl = d2.argmin(axis=1)                     # ties -> lowest index
            out = pdf[["id", "q"]].copy()
            out["cluster"] = cl.astype(np.int32)
            out["dist2"] = d2[np.arange(len(cl)), cl].astype(np.int64)
            yield out

    return qdf.mapInPandas(
        _assign, "id long, q array<long>, cluster int, dist2 long")


def kmeans_fit(emb: DataFrame, k: int = 4, n_iter: int = 2, quant: int = 100,
               id_col: str = "vec_id", vec_col: str = "embedding",
               ) -> tuple[DataFrame, list[list[int]]]:
    """Fit integer-Lloyd k-means; returns (final assignment DF, centroids).

    Assignment DF: (id, cluster, dist2) AFTER n_iter update rounds — i.e.
    assignments against the n_iter-times-updated centroids.
    """
    if k < 1 or n_iter < 0:
        raise ValueError("need k >= 1 and n_iter >= 0")
    qdf = _quantized(emb, id_col, vec_col, quant)
    # deterministic init: the k smallest ids in id order (collect is k rows)
    init = qdf.orderBy("id").limit(k).collect()
    centroids = [list(map(int, r.q)) for r in init]

    for _ in range(n_iter):
        assigned = _assign_pass(qdf, centroids)
        # per-dimension integer sums: posexplode -> partial agg, k*d rows out
        sums = (assigned.select("cluster", F.posexplode("q").alias("dim", "v"))
                .groupBy("cluster", "dim")
                .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
                .collect())
        new_c = [list(c) for c in centroids]           # empty cluster -> keep
        per = {}
        for r in sums:
            per.setdefault(r.cluster, {})[r.dim] = (r.s, r.n)
        for cid, dims in per.items():
            for dim, (s, n) in dims.items():
                # truncate toward zero (DuckDB // and Spark div semantics);
                # python's // floors, so negate-divide-negate for s < 0
                new_c[cid][dim] = s // n if s >= 0 else -((-s) // n)
        centroids = [[int(v) for v in c] for c in new_c]

    final = _assign_pass(qdf, centroids).select("id", "cluster", "dist2")
    return final, centroids


def kmeans_assign(emb: DataFrame, k: int = 4, n_iter: int = 2, quant: int = 100,
                  id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Contract-facing wrapper: (id, cluster, dist2)."""
    final, _ = kmeans_fit(emb, k=k, n_iter=n_iter, quant=quant,
                          id_col=id_col, vec_col=vec_col)
    return final


def _d2(dim: int) -> str:
    return (f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> (e.q[i] - c.q[i]) * (e.q[i] - c.q[i])))")


def _kmeans_ctes(table: str, k: int, n_iter: int, quant: int, id_col: str,
                 vec_col: str, dim: int) -> tuple[list[str], str]:
    """Shared CTE chain: (__q quantized vectors, unrolled Lloyd iterations);
    returns (ctes, name of the final centroid CTE)."""
    q = (f"SELECT {id_col} AS id, list_transform({vec_col}, "
         f"x -> CAST(round(CAST(x AS DOUBLE) * {quant}) AS BIGINT)) AS q "
         f"FROM {table}")
    ctes = [f"__q AS ({q})",
            f"__c0 AS (SELECT row_number() OVER (ORDER BY id) - 1 AS cid, q "
            f"FROM __q ORDER BY id LIMIT {k})"]
    prev = "__c0"
    for it in range(1, n_iter + 1):
        a, s, c = f"__a{it}", f"__s{it}", f"__c{it}"
        ctes += [
            f"""{a} AS (
  SELECT id, cid, d2 FROM (
    SELECT e.id, c.cid, {_d2(dim)} AS d2,
           row_number() OVER (PARTITION BY e.id ORDER BY
             {_d2(dim)} ASC, c.cid ASC) AS rn
    FROM __q e, {prev} c) WHERE rn = 1)""",
            f"""{s} AS (
  SELECT a.cid, i.i, sum(e.q[i.i]) AS sm, count(*) AS n
  FROM {a} a JOIN __q e USING (id), generate_series(1, {dim}) i(i)
  GROUP BY 1, 2)""",
            f"""{c} AS (
  SELECT p.cid, coalesce(u.q, p.q) AS q
  FROM {prev} p LEFT JOIN (
    SELECT cid, list(sm // n ORDER BY i) AS q FROM {s} GROUP BY cid) u
  USING (cid))""",
        ]
        prev = c
    return ctes, prev


def kmeans_sql(table: str = "embeddings", k: int = 4, n_iter: int = 2,
               quant: int = 100, id_col: str = "vec_id",
               vec_col: str = "embedding", dim: int = 64) -> str:
    """DuckDB twin: the same integer Lloyd unrolled n_iter times.

    Bit-exact vs kmeans_assign: integer distances (summation order free),
    row_number ties on centroid id, `//` truncated division (DuckDB and
    Spark `div` both truncate toward zero — measured, NOT floor), empty
    clusters inherit via COALESCE.
    """
    ctes, prev = _kmeans_ctes(table, k, n_iter, quant, id_col, vec_col, dim)
    final = f"""
SELECT id, CAST(cid AS INT) AS cluster, CAST(d2 AS BIGINT) AS dist2 FROM (
  SELECT e.id, c.cid, {_d2(dim)} AS d2,
         row_number() OVER (PARTITION BY e.id ORDER BY
           {_d2(dim)} ASC, c.cid ASC) AS rn
  FROM __q e, {prev} c) WHERE rn = 1"""
    return "WITH " + ",\n".join(ctes) + final


def ann_topk_ivf(emb: DataFrame, k: int = 5, n_clusters: int = 4,
                 n_probe: int = 2, n_iter: int = 2, quant: int = 100,
                 n_queries: int = 3, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """ANN top-k with a LEARNED coarse quantizer (textbook IVF): k-means
    cells from kmeans_fit instead of ann_topk_lsh's data-independent
    hyperplanes. Queries probe their n_probe nearest cells (integer
    centroid distance, ties to the lowest cell id), candidates are ranked
    by exact integer dot product, ties on id — the same rank convention as
    ann_topk / ann_topk_lsh, so the three ANN paths are interchangeable.

    Scale shape: centroid table is k x dim (broadcast by construction);
    probing is one Arrow pass over the query side; the candidate join is a
    cell equi-join (linear shuffle, no cartesian stage).
    """
    from pyspark.sql import Window

    assigned, centroids = kmeans_fit(emb, k=n_clusters, n_iter=n_iter,
                                     quant=quant, id_col=id_col, vec_col=vec_col)
    qdf = _quantized(emb, id_col, vec_col, quant)
    base = qdf.join(assigned.select("id", F.col("cluster").alias("cell")), on="id")
    C = np.asarray(centroids, dtype=np.int64)
    cn = (C * C).sum(axis=1)

    def _probe(pdfs):
        for pdf in pdfs:
            if not len(pdf):
                continue
            V = np.asarray([np.asarray(v, dtype=np.int64) for v in pdf["q"]])
            d2 = (V * V).sum(1)[:, None] - 2 * (V @ C.T) + cn[None, :]
            # stable argsort: equal distances keep ascending cell id
            order = np.argsort(d2, axis=1, kind="stable")[:, :n_probe]
            out = {"qid": [], "qq": [], "cell": []}
            for r in range(len(pdf)):
                for c in order[r]:
                    out["qid"].append(int(pdf["id"].iloc[r]))
                    out["qq"].append(list(pdf["q"].iloc[r]))
                    out["cell"].append(int(c))
            yield pd.DataFrame(out)

    probes = (qdf.filter(F.col("id") < n_queries)
              .mapInPandas(_probe, "qid long, qq array<long>, cell int"))
    cand = probes.join(base, on="cell").filter(F.col("id") != F.col("qid"))
    score = F.aggregate(F.zip_with("q", "qq", lambda x, y: x * y),
                        F.lit(0).cast("long"), lambda a, v: a + v)
    w = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("id").asc())
    return (
        cand.withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "rank", F.col("id").alias("neighbor_id"), "score")
    )


def ann_topk_ivf_sql(table: str = "embeddings", k: int = 5, n_clusters: int = 4,
                     n_probe: int = 2, n_iter: int = 2, quant: int = 100,
                     n_queries: int = 3, id_col: str = "vec_id",
                     vec_col: str = "embedding", dim: int = 64) -> str:
    """DuckDB twin of ann_topk_ivf: identical result set (same learned
    centroids, probes, and exact rank)."""
    ctes, prev = _kmeans_ctes(table, n_clusters, n_iter, quant, id_col,
                              vec_col, dim)
    ctes += [
        f"""__fa AS (
  SELECT id, cid AS cell FROM (
    SELECT e.id, c.cid, row_number() OVER (PARTITION BY e.id ORDER BY
      {_d2(dim)} ASC, c.cid ASC) AS rn
    FROM __q e, {prev} c) WHERE rn = 1)""",
        f"__qs AS (SELECT id AS qid, q AS qq FROM __q WHERE id < {n_queries})",
        f"""__pc AS (
  SELECT qid, qq, cid AS cell FROM (
    SELECT qs.qid, qs.qq, c.cid,
           row_number() OVER (PARTITION BY qs.qid ORDER BY
             list_sum(list_transform(generate_series(1, {dim}),
                      i -> (qs.qq[i] - c.q[i]) * (qs.qq[i] - c.q[i]))) ASC,
             c.cid ASC) AS rn
    FROM __qs qs, {prev} c) WHERE rn <= {n_probe})""",
        f"""__cand AS (
  SELECT pc.qid, e.id AS vid,
         list_sum(list_transform(generate_series(1, {dim}),
                  i -> e.q[i] * pc.qq[i])) AS score
  FROM __pc pc JOIN __fa fa USING (cell) JOIN __q e ON e.id = fa.id
  WHERE e.id != pc.qid)""",
        """__r AS (
  SELECT *, row_number() OVER (PARTITION BY qid
            ORDER BY score DESC, vid ASC) AS rank FROM __cand)""",
    ]
    final = (f"\nSELECT qid, CAST(rank AS INT) AS rank, vid AS neighbor_id, "
             f"CAST(score AS BIGINT) AS score FROM __r WHERE rank <= {k}")
    return "WITH " + ",\n".join(ctes) + final


def group_centroids(df: DataFrame, dim: int, keys: list[str],
                    vec_col: str = "embedding",
                    quant: int = 1_000_000) -> DataFrame:
    """Exact per-group embedding centroid sums in long format.

    The scale-right shape for mean-pooling embeddings per tile/cell/class:
    each dimension becomes ONE codegen aggregate column (64 sums + a
    count), so the shuffle carries dim+1 longs per group with full
    map-side partial aggregation — no explode (which would multiply the
    shuffle rows by dim) and no Python. Values are floor-quantized to
    integers first, making sums order-independent and the DuckDB twin
    exact; output is (keys..., pos, csum, n) — callers divide csum/n
    (kept apart because Spark's DIV truncates while DuckDB's // floors,
    so emitting a quotient would diverge on negative sums).
    """
    q = [F.sum(F.floor(F.col(vec_col)[i].cast("double") * quant)
               .cast("long")).alias(f"__s{i}") for i in range(dim)]
    agg = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"), *q)
    pairs = ", ".join(f"{i}, __s{i}" for i in range(dim))
    return agg.select(
        *keys, "n",
        F.expr(f"stack({dim}, {pairs}) AS (pos, csum)")
    ).select(*keys, F.col("pos").cast("int").alias("pos"), "csum", "n")


def group_centroids_sql(table: str, dim: int, key: str,
                        vec_col: str = "embedding",
                        quant: int = 1_000_000) -> str:
    """DuckDB twin of group_centroids (single group key)."""
    return f"""
SELECT {key}, CAST(g.i - 1 AS INT) AS pos,
       CAST(sum(CAST(floor(CAST({vec_col}[g.i] AS DOUBLE) * CAST({quant} AS DOUBLE)) AS BIGINT)) AS BIGINT) AS csum,
       count(*) AS n
FROM {table}, generate_series(1, {dim}) g(i)
GROUP BY {key}, g.i"""
