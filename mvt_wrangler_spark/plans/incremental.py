"""Incremental near-dup ingest: the flow a production training-data pipeline
actually runs — new batches arrive forever, each must be deduped against
itself AND everything already committed, WITHOUT recomputing the corpus.

Design (scale-first):
  - `docs` SnapshotTable: committed survivors (first-seen-wins keepers).
  - `bands` SnapshotTable: the PERSISTENT LSH index — (bucket, rep_id) rows
    for every document ever seen, keyed by its surviving cluster
    representative. Storing dropped rows' bands under their keeper's id is
    what preserves transitive chains across batches: if batch 2's B was
    dropped as a dup of A, and batch 3's C collides only with B's buckets,
    C still pairs with A — the same closure a one-shot global clustering
    would find (tested).
  - Per batch: ONE numpy minhash pass over the batch, batch self-pairs via
    minhash_lsh_candidates (hot-bucket star fallback included), corpus
    pairs via an equi-join of batch buckets against the index reduced to
    min(rep_id) per bucket — O(batch x bands) pairs, no O(bucket^2) blowup
    no matter how hot a committed bucket is — then ONE pair_clusters
    closure over both pair sets.
  - Keeper rule: cluster representative = min id. `id_col` must be
    monotone with ingest order (true of any ingest-assigned id), which
    makes min-id == first-seen and guarantees a cluster's rep is always a
    committed/kept doc.
  - Commits via SnapshotTable(append=True) with caller job_ids: replaying
    a committed batch is a no-op (committed-job-id ledger), and a crash
    between the docs and bands commits replays deterministically — the
    batch's own rows are self-loops against the corpus, so survivors
    recompute identically.

Documented divergence from one-shot global dedup (inherent to ANY
first-seen incremental system): a later row can BRIDGE two already-
committed docs (reveal they are transitively near-dups of each other).
First-seen semantics drops the bridge row but keeps both committed docs —
retro-deletion is a separate compaction job, not an ingest step. The test
plants exactly this case and asserts the kept set.

Reference analog: the per-tile dictionary dedup
(/root/reference/src/transform.rs:174-191) is per-scope-complete; this
lifts the same keep-first-drop-rest contract to an unbounded stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    minhash_band_buckets,
    minhash_lsh_candidates,
    pair_clusters,
)
from ..sources.catalog import SnapshotTable


def incremental_neardup_ingest(
    spark: SparkSession,
    docs: SnapshotTable,
    bands: SnapshotTable,
    batch: DataFrame,
    job_id: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands_n: int = 4,
    shingle: int = 5,
    max_bucket: int = 1000,
) -> dict:
    """Ingest one batch; returns {"batch_rows", "kept", "dropped",
    "docs_snapshot", "bands_snapshot"}. See module docstring for semantics.
    `docs` should be keyed/bucketed on `id_col`; `bands` on "bucket"."""
    # pin the batch: it feeds the band pass, the pair closure, and the two
    # commits — a nondeterministic source (limit/sample) would otherwise
    # drop one row set and commit another (same rationale as merge_keys)
    batch = batch.localCheckpoint(eager=True)
    batch_ids = batch.select(F.col(id_col).cast("long").alias("member_id"))

    batch_buckets = batch.select(
        F.col(id_col).cast("long").alias("id"),
        F.explode(
            minhash_band_buckets(F.col(text_col), num_hashes, bands_n, shingle)
        ).alias("bucket"),
    )

    self_pairs = minhash_lsh_candidates(
        batch, id_col=id_col, text_col=text_col, num_hashes=num_hashes,
        bands=bands_n, shingle=shingle, max_bucket=max_bucket,
    )
    have_index = bands.current_snapshot() is not None
    if have_index:
        # one representative per committed bucket is enough for
        # connectivity: every batch member of the bucket links to it, and
        # committed members of the bucket are already mutually clustered
        idx = (bands.read_current(spark)
               .groupBy("bucket").agg(F.min("rep_id").alias("id_a")))
        corpus_pairs = (batch_buckets.join(idx, "bucket")
                        .filter(F.col("id_a") != F.col("id"))
                        .select("id_a", F.col("id").alias("id_b"))
                        .distinct())
        all_pairs = self_pairs.unionByName(corpus_pairs)
    else:
        all_pairs = self_pairs

    clusters = pair_clusters(all_pairs)  # (member_id, cluster_rep, size)
    membership = (batch_ids.join(clusters, "member_id", "left")
                  .select("member_id",
                          F.coalesce("cluster_rep", F.col("member_id"))
                          .alias("rep_id"))
                  .localCheckpoint(eager=True))  # used by 3 jobs below
    keep_ids = membership.filter(F.col("member_id") == F.col("rep_id"))

    survivors = batch.join(
        keep_ids.select(F.col("member_id").alias(id_col)), id_col, "left_semi")
    docs_snap = docs.write_snapshot(survivors, job_id=job_id, append=True)

    # EVERY batch row's buckets enter the index, keyed by its keeper —
    # dropped rows' buckets under the keeper's id preserve transitive
    # reachability for future batches (module docstring)
    new_index = (batch_buckets
                 .join(membership.withColumnRenamed("member_id", "id"), "id")
                 .select("bucket", "rep_id").distinct())
    bands_snap = bands.write_snapshot(new_index, job_id=f"{job_id}-bands",
                                      append=True)

    n_batch = batch.count()
    n_kept = keep_ids.count()
    return {
        "batch_rows": n_batch,
        "kept": n_kept,
        "dropped": n_batch - n_kept,
        "docs_snapshot": docs_snap["snapshot"],
        "bands_snapshot": bands_snap["snapshot"],
    }
