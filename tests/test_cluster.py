"""Integer-Lloyd k-means: numpy reference parity, tie/empty-cluster rules,
partition-layout determinism."""

from __future__ import annotations

import numpy as np
import pytest

from mvt_wrangler_spark.operators import cluster as CL


def _ref_kmeans(V: np.ndarray, k: int, n_iter: int):
    """Pure-numpy reference with the operator's exact rules: min-id init,
    lowest-index ties, truncated integer mean, empty keeps previous."""
    C = V[:k].copy()
    for _ in range(n_iter):
        d2 = ((V * V).sum(1)[:, None] - 2 * (V @ C.T) + (C * C).sum(1)[None, :])
        cl = d2.argmin(1)
        for c in range(k):
            m = V[cl == c]
            if len(m):
                s = m.sum(0)
                C[c] = np.where(s >= 0, s // len(m), -((-s) // len(m)))
    d2 = ((V * V).sum(1)[:, None] - 2 * (V @ C.T) + (C * C).sum(1)[None, :])
    cl = d2.argmin(1)
    return cl, d2[np.arange(len(cl)), cl], C


def _emb_df(spark, V, partitions=4):
    # quant=100 recovers these integers exactly: round((x/100)*100) == x
    rows = [(i, [float(x) / 100.0 for x in v]) for i, v in enumerate(V)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>") \
        .repartition(partitions)


@pytest.mark.spark
def test_kmeans_matches_numpy_reference(spark):
    rng = np.random.default_rng(3)
    centers = rng.integers(-80, 80, size=(4, 16))
    V = np.concatenate([c + rng.integers(-5, 6, size=(30, 16)) for c in centers])
    df = _emb_df(spark, V)
    got = {r.id: (r.cluster, r.dist2)
           for r in CL.kmeans_assign(df, k=4, n_iter=2, quant=100).collect()}
    cl, d2, _ = _ref_kmeans(V.astype(np.int64), 4, 2)
    assert got == {i: (int(cl[i]), int(d2[i])) for i in range(len(V))}


@pytest.mark.spark
def test_kmeans_partition_layout_invariant(spark):
    rng = np.random.default_rng(9)
    V = rng.integers(-100, 100, size=(90, 8))
    a = sorted(map(tuple, CL.kmeans_assign(_emb_df(spark, V, 1), k=3, n_iter=2).collect()))
    b = sorted(map(tuple, CL.kmeans_assign(_emb_df(spark, V, 7), k=3, n_iter=2).collect()))
    assert a == b


@pytest.mark.spark
def test_kmeans_empty_cluster_keeps_centroid(spark):
    # ids 0 and 1 share a vector -> duplicate init centroids; ties go to the
    # lowest cid, so cid 1 empties on iteration 1 and must keep its centroid
    V = np.array([[0, 0], [0, 0], [50, 50]] + [[1, 1]] * 10 + [[49, 51]] * 10,
                 dtype=np.int64)
    df = _emb_df(spark, V)
    res, cents = CL.kmeans_fit(df, k=3, n_iter=2, quant=100)
    rows = res.collect()
    assert {r.cluster for r in rows} <= {0, 1, 2}
    assert cents[1] == [0, 0]  # inherited, never updated
    cl, d2, C = _ref_kmeans(V.copy(), 3, 2)
    got = {r.id: r.cluster for r in rows}
    assert got == {i: int(cl[i]) for i in range(len(V))}


def test_kmeans_validates_params():
    with pytest.raises(ValueError):
        CL.kmeans_fit(None, k=0)


@pytest.mark.spark
def test_ann_ivf_full_probe_equals_bruteforce(spark):
    """With n_probe == n_clusters (probe everything) the IVF path must give
    the EXACT top-k by integer dot product — the approximation comes only
    from probing fewer cells, never from ranking."""
    rng = np.random.default_rng(5)
    V = rng.integers(-100, 100, size=(120, 12))
    df = _emb_df(spark, V)
    got = [(r.qid, r.rank, r.neighbor_id, r.score)
           for r in CL.ann_topk_ivf(df, k=4, n_clusters=3, n_probe=3,
                                    n_iter=2, quant=100, n_queries=2).collect()]
    want = []
    for qid in range(2):
        scores = sorted(
            ((int(V[i] @ V[qid]), i) for i in range(len(V)) if i != qid),
            key=lambda t: (-t[0], t[1]))
        want += [(qid, r + 1, i, s) for r, (s, i) in enumerate(scores[:4])]
    assert sorted(got) == sorted(want)


@pytest.mark.spark
def test_ann_ivf_partial_probe_shape(spark):
    rng = np.random.default_rng(6)
    V = rng.integers(-100, 100, size=(150, 8))
    rows = CL.ann_topk_ivf(_emb_df(spark, V), k=3, n_clusters=5, n_probe=2,
                           n_iter=1, quant=100, n_queries=3).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.qid, []).append(r.rank)
    for qid, ranks in by_q.items():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 3


def test_pagerank_int_vs_python(spark):
    """Integer PageRank matches a pure-python replica on a small directed
    graph with a hub, a dangling node, and a cycle."""
    from collections import defaultdict

    from mvt_wrangler_spark.operators.graph import pagerank_int

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3)]  # 3 is a hub
    # node 6: dangling receiver only
    edges.append((3, 6))
    nodes = sorted({u for e in edges for u in e})
    SCALE, A_N, A_D, ITERS = 1_000_000, 85, 100, 3
    out = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    pr = {n: SCALE for n in nodes}
    base = SCALE - SCALE * A_N // A_D
    for _ in range(ITERS):
        nxt = {n: base for n in nodes}
        for u, vs in out.items():
            c = pr[u] * A_N // (A_D * len(vs))
            for v in vs:
                nxt[v] += c
        pr = nxt
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.pr for r in pagerank_int(df, iters=ITERS).collect()}
    assert got == pr
    assert got[3] > got[1]          # the hub outranks a cycle member
    assert got[6] > base            # dangling node still receives


def test_pagerank_int_deep_iters_checkpointed(spark):
    """12 iterations cross the checkpoint_every=5 lineage truncation twice
    and still match the pure-python replica bit for bit; the final plan
    must not embed all 12 iterations (bounded analysis time at real
    link-graph iteration counts)."""
    from collections import defaultdict

    from mvt_wrangler_spark.operators.graph import pagerank_int

    edges = [(1, 2), (1, 3), (2, 3), (3, 1), (4, 3), (5, 3), (3, 6)]
    nodes = sorted({u for e in edges for u in e})
    SCALE, A_N, A_D, ITERS = 1_000_000, 85, 100, 12
    out = defaultdict(list)
    for u, v in edges:
        out[u].append(v)
    pr = {n: SCALE for n in nodes}
    base = SCALE - SCALE * A_N // A_D
    for _ in range(ITERS):
        nxt = {n: base for n in nodes}
        for u, vs in out.items():
            c = pr[u] * A_N // (A_D * len(vs))
            for v in vs:
                nxt[v] += c
        pr = nxt
    df = spark.createDataFrame(edges, "src long, dst long")
    result = pagerank_int(df, iters=ITERS, checkpoint_every=5)
    got = {r.node: r.pr for r in result.collect()}
    assert got == pr
    # lineage truncated: at most the post-checkpoint tail (2 iterations of
    # joins) appears in the plan, not all 12
    plan = result._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 12
