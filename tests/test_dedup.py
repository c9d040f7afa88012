"""Near-dup operators: distributed exact vs brute force, LSH candidate
soundness, hot-bucket cap under adversarial (all-identical) input."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.operators import dedup as D

QUANT, COS_NUM, COS_DEN = 100, 16, 100


def _synth_vectors(n: int, dim: int = 64, n_dups: int = 40, seed: int = 7):
    """Random unit-ish vectors plus planted near-duplicates."""
    rng = np.random.default_rng(seed)
    V = rng.normal(size=(n, dim))
    for t in range(n_dups):  # plant near-dups: small perturbations of earlier rows
        V[n - 1 - t] = V[t] + rng.normal(scale=0.05, size=dim)
    V /= np.linalg.norm(V, axis=1, keepdims=True)
    return V


def _brute_pairs(V: np.ndarray) -> set[tuple[int, int]]:
    Q = np.round(V * QUANT).astype(np.int64)
    norms = (Q * Q).sum(axis=1)
    S = Q @ Q.T
    ok = (S > 0) & (S * S * COS_DEN > COS_NUM * np.outer(norms, norms))
    out = set()
    for a, b in zip(*np.nonzero(np.triu(ok, 1))):
        out.add((int(a), int(b)))
    return out


@pytest.mark.spark
def test_exact_blockpairs_matches_bruteforce(spark):
    V = _synth_vectors(600)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<float>",
    ).repartition(8)
    # float32 storage (array<float>) is what the real table uses — recompute
    # the brute-force truth from the float32-rounded values
    V32 = np.array([[np.float32(x) for x in row] for row in V], dtype=np.float64)
    want = _brute_pairs(V32)
    got = {(r.id_a, r.id_b) for r in
           D.embedding_neardup_pairs(df, n_blocks=5).collect()}
    assert got == want
    # no pair may appear twice (each unordered block pair is one group)
    rows = D.embedding_neardup_pairs(df, n_blocks=5).collect()
    assert len(rows) == len(set((r.id_a, r.id_b) for r in rows))


@pytest.mark.spark
def test_lsh_pairs_are_subset_of_exact(spark):
    V = _synth_vectors(600)
    df = spark.createDataFrame(
        [(i, [float(x) for x in V[i]]) for i in range(len(V))],
        "vec_id long, embedding array<float>",
    )
    exact = {(r.id_a, r.id_b) for r in D.embedding_neardup_pairs(df).collect()}
    lsh = {(r.id_a, r.id_b) for r in D.embedding_neardup_lsh(df).collect()}
    assert lsh <= exact
    # the planted strong near-dups should mostly survive the sign-LSH bands
    assert len(lsh) >= len(exact) // 4, (len(lsh), len(exact))


@pytest.mark.spark
def test_minhash_hot_bucket_star_fallback(spark):
    """Adversarial: 10k identical docs would make one bucket emit ~50M pairs
    without the cap. With the star fallback the hot bucket emits LINEAR
    (rep, member) pairs — bounded output AND full recall inside the bucket
    (every duplicate stays connected to the representative)."""
    n_dup = 10_000
    rows = [(i, "the same boilerplate text repeated everywhere") for i in range(n_dup)]
    rows += [(100000 + i, f"unique document number {i} with distinct words {i * 7}")
             for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.minhash_lsh_candidates(docs, max_bucket=100)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    # bounded: linear in the hot-bucket size, nowhere near quadratic
    assert len(got) < 2 * n_dup
    # nonzero recall inside the hot bucket: every dup links to the rep (min id)
    star = {(a, b) for a, b in got if a == 0}
    assert star == {(0, i) for i in range(1, n_dup)}

    # DuckDB twin reproduces the exact same pair set (incl. the fallback)
    import duckdb

    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO documents VALUES (?, ?)", rows[:500])
        want = set(map(tuple, con.execute(
            D.minhash_lsh_sql(max_bucket=100)).fetchall()))
    finally:
        con.close()
    small = spark.createDataFrame(rows[:500], "doc_id long, text string")
    got_small = {(r.id_a, r.id_b) for r in
                 D.minhash_lsh_candidates(small, max_bucket=100).collect()}
    assert got_small == want

    # with a big-enough cap, identical docs DO pair up all-pairs
    tiny = spark.createDataFrame(rows[:20], "doc_id long, text string")
    assert D.minhash_lsh_candidates(tiny, max_bucket=1000).count() == 20 * 19 // 2

    # round-2 behavior still available
    dropped = D.minhash_lsh_candidates(docs, max_bucket=100, hot_fallback=False)
    assert not any(r.id_a == 0 for r in dropped.collect())


@pytest.mark.spark
def test_minhash_and_simhash_similarity_behavior(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "the quick brown fox jumps over the lazy dog near the river banks"),
            (3, "completely different content about spark shuffle partitioning"),
        ],
        "doc_id long, text string",
    )
    cand = {(r.id_a, r.id_b) for r in D.minhash_lsh_candidates(docs).collect()}
    assert (1, 2) in cand and (1, 3) not in cand

    sh = {r.doc_id: r.s for r in
          docs.select("doc_id", D.simhash64(F.col("text")).alias("s")).collect()}
    d12 = bin(sh[1] ^ sh[2]).count("1")
    d13 = bin(sh[1] ^ sh[3]).count("1")
    assert d12 < d13
    assert all(0 <= v < (1 << 62) for v in sh.values())


@pytest.mark.spark
def test_ann_lsh_scores_exact(spark):
    """ann_topk_lsh candidates are ranked by the EXACT quantized dot product
    (LSH only prunes candidates, never changes scores), and neighbors are
    distinct per query."""
    import numpy as np

    from mvt_wrangler_spark.operators.joins import ann_topk_lsh

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    vecs = {r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1000).astype(np.int64)
            for r in emb.collect()}
    got = ann_topk_lsh(emb, k=5).collect()
    assert len(got) > 0
    seen = set()
    for r in got:
        assert r.score == int(vecs[r.qid] @ vecs[r.neighbor_id])
        assert (r.qid, r.neighbor_id) not in seen
        seen.add((r.qid, r.neighbor_id))
        assert r.neighbor_id != r.qid


@pytest.mark.spark
def test_minhash_wide_band_and_unicode_match_duckdb(spark):
    """Two ADVICE regressions in one oracle check: (a) band width >= 7 used
    to overflow int64 silently in numpy while DuckDB raised/diverged — the
    Horner fold keeps both in range and identical; (b) shingle hashes ran
    over UTF-8 bytes while DuckDB's ascii() is code points — non-ASCII docs
    diverged. Both engines must now agree bucket-for-bucket."""
    import duckdb

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "naïve café résumé — déjà vu über alles"),
        (3, "日本語のテキストを含む文書です タイル処理"),
        (4, "mixed ascii and 中文 characters with émojis ✨ in one doc"),
        (5, "short"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    for num_hashes, bands in ((16, 4), (32, 2)):  # widths 4 and 16 (>= 7 arm)
        got = {
            (r.doc_id, i, v)
            for r in docs.select(
                "doc_id",
                D.minhash_band_buckets(F.col("text"), num_hashes, bands).alias("b"),
            ).collect()
            for i, v in enumerate(r.b)
        }
        con = duckdb.connect()
        try:
            con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
            con.executemany("INSERT INTO d VALUES (?, ?)", rows)
            expr = D.minhash_buckets_sql_expr("text", num_hashes, bands)
            want = {
                (doc_id, i, v)
                for doc_id, lst in con.execute(
                    f"SELECT doc_id, {expr} FROM d").fetchall()
                for i, v in enumerate(lst)
            }
        finally:
            con.close()
        assert got == want, f"num_hashes={num_hashes} bands={bands}"


@pytest.mark.spark
def test_simhash_unicode_matches_duckdb(spark):
    import duckdb

    rows = [(1, "über café naïve"), (2, "日本語 テスト 文書"), (3, "plain ascii words")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.s for r in
           docs.select("doc_id", D.simhash64(F.col("text")).alias("s")).collect()}
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR)")
        con.executemany("INSERT INTO d VALUES (?, ?)", rows)
        want = dict(con.execute(
            f"SELECT doc_id, {D.simhash_sql_expr('text')} FROM d").fetchall())
    finally:
        con.close()
    assert got == want


@pytest.mark.spark
def test_knn_join_query_bound_raises(spark):
    from mvt_wrangler_spark.operators.joins import knn_join

    data = spark.range(0, 100).select(
        F.col("id").cast("string").alias("image_id"),
        (F.col("id") * 0.1).alias("lon"), (F.col("id") * 0.05).alias("lat"))
    queries = spark.range(0, 50).select(
        F.col("id").cast("string").alias("query_id"),
        (F.col("id") * 0.2).alias("lon"), (F.col("id") * 0.1).alias("lat"))
    with pytest.raises(ValueError, match="knn_join_cells"):
        knn_join(data, queries, k=3, max_queries=10)
    # under the bound it works
    assert knn_join(data, queries, k=3, max_queries=50).count() == 150


@pytest.mark.spark
def test_phash_dedup_packed_matches_agg(spark):
    """The flagship packed dedup (one-long group key, numeric keeper) must
    produce the same groups + keepers as phash_dedup_agg — zero-padded ids
    make numeric min == string min."""
    from mvt_wrangler_spark.functions import tiling
    from mvt_wrangler_spark.sources import images as I

    df = I.synthetic_images(spark, 3000, with_pixels=False, partitions=4)
    a = tiling.assign_tiles(df, z=6, with_local=False)
    # packed mode's contract is a BOUNDED phash domain (the full images table
    # carries a signed 64-bit hash, which the operator loudly refuses below);
    # both variants group on the same bounded column for a fair comparison
    a = a.withColumn("phash", F.pmod("phash", F.lit(1 << 20)))
    agg = {(r.z, r.x, r.y, r.phash): (int(r.keeper_image_id[3:]), r.n_dups)
           for r in D.phash_dedup_agg(
               a, keys=("z", "x", "y", "phash"), order_col="image_id").collect()}
    packed = {(r.z, r.x, r.y, r.phash): (r.keeper_num, r.n_dups)
              for r in D.phash_dedup_packed(a, z=6).collect()}
    assert packed == agg
    assert len(packed) > 100

    # domain guard: out-of-range phash fails loudly, never collides silently
    bad = a.withColumn("phash", F.lit(-1).cast("long"))
    with pytest.raises(Exception, match="packed dedup key"):
        D.phash_dedup_packed(bad, z=6).collect()
    with pytest.raises(ValueError, match="exceeds 63"):
        D.phash_dedup_packed(a, z=6, phash_bits=60)


# ---------------------------------------------------------------------------
# phash hamming near-dup (banding guarantee + popcount refine)
# ---------------------------------------------------------------------------

def _brute_hamming_pairs(ids, codes, k):
    out = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if bin((codes[i] ^ codes[j]) & ((1 << 64) - 1)).count("1") <= k:
                a, b = sorted((ids[i], ids[j]))
                out.add((a, b))
    return out


@pytest.mark.spark
def test_phash_hamming_matches_bruteforce(spark):
    """Lossless banding: with k < bands every hamming<=k pair must appear —
    random signed 64-bit codes plus planted few-bit perturbations."""
    rng = np.random.default_rng(11)
    codes = rng.integers(-(2 ** 63), 2 ** 63, size=80, dtype=np.int64)
    for t in range(20):  # plant near-dups at hamming 1..3 of earlier rows
        flips = rng.choice(64, size=1 + t % 3, replace=False)
        v = codes[t]
        for p in flips:
            v = np.int64(v) ^ np.int64(np.uint64(1) << np.uint64(p))
        codes[79 - t] = v
    ids = list(range(80))
    df = spark.createDataFrame(
        [(i, int(c)) for i, c in zip(ids, codes)], "image_id long, phash long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in D.phash_hamming_pairs(df, id_col="image_id", k=3).collect()}
    want = _brute_hamming_pairs(ids, [int(c) & ((1 << 64) - 1) for c in codes], 3)
    assert set(got) == want
    for (a, b), h in got.items():
        assert h == bin((int(codes[a]) ^ int(codes[b])) & ((1 << 64) - 1)).count("1")


@pytest.mark.spark
def test_phash_hamming_hot_bucket_star(spark):
    """Adversarial identical-phash clique: output stays linear (star pairs
    against the min-id representative), every member stays connected."""
    n = 300
    rows = [(i, 1234567890123) for i in range(n)]
    df = spark.createDataFrame(rows, "image_id long, phash long")
    pairs = D.phash_hamming_pairs(df, id_col="image_id", k=3, max_bucket=50).collect()
    assert len(pairs) == n - 1  # star, not the C(300,2)=44850 clique
    assert all(r.id_a == 0 and r.hamming == 0 for r in pairs)
    assert {r.id_b for r in pairs} == set(range(1, n))


@pytest.mark.spark
def test_phash_hamming_refine_before_dedup(spark):
    """Pin the r07 refine-then-distinct internals: a pair that agrees on
    SEVERAL bands yields duplicate candidate occurrences that must collapse
    to ONE output row, and a same-band candidate beyond k must be dropped
    by the popcount refine (it never reaches the pair dedup) — both checked
    against brute force, which is blind to the operator's ordering."""
    rows = []
    for i in range(10):
        base = (i * 0x9E3779B97F4A7C15) & ((1 << 64) - 1)
        # hamming 2, flipped in bands 0 and 3 -> agrees on bands 1+2
        # (duplicate candidates), survives the k=3 refine
        near = base ^ (1 << 1) ^ (1 << 62)
        # hamming 8 inside band 2 -> agrees on bands 0,1,3 (three candidate
        # occurrences), all dropped by the refine
        far = base ^ (0xFF << 40)
        rows += [(3 * i, base), (3 * i + 1, near), (3 * i + 2, far)]
    signed = lambda v: v - (1 << 64) if v >= (1 << 63) else v  # noqa: E731
    df = spark.createDataFrame([(i, signed(c)) for i, c in rows],
                               "image_id long, phash long")
    got = {(r.id_a, r.id_b): r.hamming
           for r in D.phash_hamming_pairs(df, id_col="image_id", k=3).collect()}
    want = _brute_hamming_pairs([i for i, _ in rows], [c for _, c in rows], 3)
    assert set(got) == want
    assert all(h <= 3 for h in got.values())


def test_phash_hamming_validates_params():
    with pytest.raises(ValueError):
        D.phash_hamming_pairs(None, k=4, bands=4)
    with pytest.raises(ValueError):
        D.phash_hamming_pairs(None, k=3, bands=5)


# ---------------------------------------------------------------------------
# pair_clusters: pairs -> connected components with min-id reps
# ---------------------------------------------------------------------------

def _clusters(spark, pairs, thr=65536):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = D.pair_clusters(df, driver_threshold=thr).collect()
    return {r.member_id: (r.cluster_rep, r.cluster_size) for r in rows}


@pytest.mark.spark
@pytest.mark.parametrize("thr", [0, 65536])  # distributed loop AND driver union-find
def test_pair_clusters_transitive_chain(spark, thr):
    """Planted 3-chain: (a,b)+(b,c) with NO (a,c) pair must yield one
    cluster {a,b,c} with the min id as keeper."""
    got = _clusters(spark, [(10, 20), (20, 30)], thr)
    assert got == {10: (10, 3), 20: (10, 3), 30: (10, 3)}


@pytest.mark.spark
@pytest.mark.parametrize("thr", [0, 65536])
def test_pair_clusters_path_and_components(spark, thr):
    """Adversarial path graph (worst case for plain label propagation)
    plus disjoint components, reversed/duplicate/self-loop input rows."""
    n = 33
    path = [(i + 1, i) for i in range(n - 1)]          # reversed orientation
    path += [(5, 6), (5, 6), (7, 7)]                   # dup + self-loop
    other = [(1000, 2000), (3000, 1000)]
    got = _clusters(spark, path + other, thr)
    for i in range(n):
        assert got[i] == (0, n), i
    assert got[1000] == (1000, 3) and got[2000] == (1000, 3) and got[3000] == (1000, 3)


@pytest.mark.spark
def test_pair_clusters_clique_through_star_fallback(spark):
    """300 identical phashes through phash_hamming_pairs with a tiny
    max_bucket: hot buckets emit only star pairs, and pair_clusters must
    still recover the single 300-member cluster with the min id as rep."""
    rows = [(i, 0x0F0F0F0F) for i in range(300)]
    ph = spark.createDataFrame(rows, "id long, phash long")
    pairs = D.phash_hamming_pairs(ph, id_col="id", phash_col="phash",
                                  k=3, bands=4, max_bucket=50)
    # star fallback keeps output linear, not 300*299/2
    n_pairs = pairs.count()
    assert n_pairs < 1000
    out = D.pair_clusters(pairs).collect()
    assert len(out) == 300
    assert {r.member_id for r in out} == set(range(300))
    assert all(r.cluster_rep == 0 and r.cluster_size == 300 for r in out)


@pytest.mark.spark
def test_pair_clusters_empty_and_oracle(spark):
    """Empty input -> empty output with the contract schema; random graph
    matches the DuckDB recursive-CTE twin exactly."""
    import duckdb

    empty = spark.createDataFrame([], "id_a long, id_b long")
    out = D.pair_clusters(empty)
    assert out.columns == ["member_id", "cluster_rep", "cluster_size"]
    assert out.count() == 0

    rng = np.random.default_rng(11)
    edges = [(int(a), int(b)) for a, b in rng.integers(0, 120, size=(200, 2))]
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = sorted(tuple(r) for r in D.pair_clusters(df).collect())
    # the distributed star loop must agree with the driver union-find path
    got_dist = sorted(tuple(r) for r in
                      D.pair_clusters(df, driver_threshold=0).collect())
    assert got == got_dist

    con = duckdb.connect()
    con.execute("CREATE TABLE __pairs(id_a BIGINT, id_b BIGINT)")
    con.executemany("INSERT INTO __pairs VALUES (?, ?)", edges)
    want = sorted(tuple(r) for r in con.execute(
        D.pair_clusters_sql("SELECT id_a, id_b FROM __pairs")).fetchall())
    assert got == want


@pytest.mark.spark
def test_pair_clusters_with_corpus_singletons(spark):
    """Unpaired corpus rows come back as size-1 clusters (their own rep);
    keeping `member_id == cluster_rep` yields exactly uniques + one keeper
    per dup group."""
    corpus = spark.createDataFrame([(i,) for i in range(10)], "id long")
    pairs = spark.createDataFrame([(1, 2), (2, 3), (7, 8)],
                                  "id_a long, id_b long")
    out = D.pair_clusters_with_corpus(corpus, pairs, id_col="id")
    rows = {r.member_id: (r.cluster_rep, r.cluster_size)
            for r in out.collect()}
    assert len(rows) == 10
    assert rows[1] == (1, 3) and rows[2] == (1, 3) and rows[3] == (1, 3)
    assert rows[7] == (7, 2) and rows[8] == (7, 2)
    for s in (0, 4, 5, 6, 9):
        assert rows[s] == (s, 1)
    keepers = {r.member_id for r in
               out.filter(F.col("member_id") == F.col("cluster_rep")).collect()}
    assert keepers == {0, 1, 4, 5, 6, 7, 9}


@pytest.mark.spark
def test_ngram_jaccard_matches_bruteforce_oracle(spark):
    """Prefix-filter completeness, adversarially: the DuckDB oracle is a
    full cross join with no prefix logic — any candidate the AllPairs
    prefix drops incorrectly shows up as an oracle-only pair."""
    import duckdb

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                "'/root/testdata/sf0.001/documents.parquet'")
    for thr in (0.3, 0.5):
        got = sorted((r.id_a, r.id_b, r.n_common, r.n_union)
                     for r in D.ngram_jaccard_pairs(
                         docs, "doc_id", "text", shingle=5,
                         threshold=thr).collect())
        want = sorted(map(tuple, con.execute(D.ngram_jaccard_sql(
            "documents", "doc_id", "text", 5, thr)).fetchall()))
        assert got == want, f"threshold {thr}"
        assert len(got) > 0, "fixture should contain near-dup documents"


@pytest.mark.spark
def test_ngram_jaccard_threshold_boundary_exact(spark):
    """J exactly == threshold is INCLUDED (>=), decided in integer math.
    Planted: A/B share 2 of 3 shingles -> J = 1/2 exactly; C is disjoint."""
    rows = [(1, "abcdef"),   # shingles(4): abcd bcde cdef
            (2, "abcdex"),   # shingles(4): abcd bcde cdex -> J(1,2)=2/4=0.5
            (3, "zzzzzz")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    at = D.ngram_jaccard_pairs(df, "doc_id", "text", shingle=4,
                               threshold=0.5).collect()
    assert [(r.id_a, r.id_b, r.n_common, r.n_union) for r in at] == [(1, 2, 2, 4)]
    above = D.ngram_jaccard_pairs(df, "doc_id", "text", shingle=4,
                                  threshold=0.51).collect()
    assert above == []
    # identical docs: J = 1.0 survives threshold=1.0
    dup = spark.createDataFrame([(1, "hello world"), (2, "hello world")],
                                "doc_id long, text string")
    full = D.ngram_jaccard_pairs(dup, "doc_id", "text", shingle=4,
                                 threshold=1.0).collect()
    assert [(r.id_a, r.id_b) for r in full] == [(1, 2)]


@pytest.mark.spark
def test_phash_hamming_clusters_equals_composed(spark):
    """phash_hamming_clusters must equal pair_clusters(phash_hamming_pairs)
    EXACTLY across bucket regimes: all-normal, forced-hot (tiny max_bucket,
    star-fallback connectivity incl. identical-hash groups far from the
    bucket rep), and mixed duplicates (cnt 1/2/large cliques)."""
    import random

    rng = random.Random(42)
    rows = []
    nid = 0
    # planted identical-hash cliques of varying size around base patterns
    bases = [rng.getrandbits(64) - (1 << 63) for _ in range(12)]
    for gi, base in enumerate(bases):
        for _ in range(1 + (gi % 5) * 3):
            rows.append((nid, base)); nid += 1
        # near variants: flip 1-2 bits (within k), and 8 bits (beyond k)
        for nb in (1, 2, 8):
            v = base
            for bpos in rng.sample(range(64), nb):
                v ^= (1 << bpos)
            v = (v + (1 << 63)) % (1 << 64) - (1 << 63)
            rows.append((nid, v)); nid += 1
    df = spark.createDataFrame(rows, "image_id long, phash long")

    for max_bucket in (1000, 4):  # all-normal vs heavily hot
        composed = D.pair_clusters(D.phash_hamming_pairs(
            df, id_col="image_id", k=3, bands=4, max_bucket=max_bucket))
        collapsed = D.phash_hamming_clusters(
            df, id_col="image_id", k=3, bands=4, max_bucket=max_bucket)
        got = sorted(map(tuple, collapsed.collect()))
        want = sorted(map(tuple, composed.collect()))
        assert got == want, f"max_bucket={max_bucket}"
        assert len(want) > 10


def test_hamming_keepers_includes_singletons(spark):
    """Keeper set = one min-id rep per cluster PLUS every singleton at
    cluster_size 1 (pair_clusters alone drops unpaired rows)."""
    from mvt_wrangler_spark.operators.dedup import hamming_keepers

    rows = [
        (1, 0b1111),                    # cluster A (hamming 1 to id 2)
        (2, 0b1110),
        (3, 0x5A5A5A5A5A5A5A5A),        # singleton (far from everything)
        (4, -1234567890111213141),      # singleton, negative hash
        (10, 0x0F0F0F0F0F0F0F00),       # cluster B: two exact + hamming 2
        (11, 0x0F0F0F0F0F0F0F00),
        (12, 0x0F0F0F0F0F0F0F03),
    ]
    df = spark.createDataFrame(rows, "id long, phash long")
    got = {r.id: r.cluster_size for r in
           hamming_keepers(df, k=3, bands=4).collect()}
    assert got == {1: 2, 3: 1, 4: 1, 10: 3}
