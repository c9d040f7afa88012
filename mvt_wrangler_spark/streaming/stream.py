"""Structured Streaming surface: incremental tile ingest.

The reference is strictly batch (SURVEY §2.7); its bounded-queue backpressure
and ordered writer map onto Structured Streaming's micro-batches +
foreachBatch ordered sink. This module gives the engine an incremental
ingest path: a stream of image rows -> tile assignment -> watermarked
windowed per-tile counts, and a foreachBatch writer that lands each
micro-batch through the same SnapshotTable checkpoint layer (idempotent by
batch id, so failure/restart resumes exactly like the batch job).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import tiling


def assign_stream(stream_df: DataFrame, z: int = 10,
                  ts_col: str = "ts", watermark: str = "10 minutes") -> DataFrame:
    """Tile assignment on a stream (same column math as batch — stateless)."""
    return tiling.assign_tiles(stream_df.withWatermark(ts_col, watermark), z=z)


def windowed_tile_counts(stream_df: DataFrame, z: int = 10, ts_col: str = "ts",
                         window: str = "1 hour", watermark: str = "10 minutes") -> DataFrame:
    """Per-tile tumbling-window counts with late-data handling."""
    assigned = assign_stream(stream_df, z=z, ts_col=ts_col, watermark=watermark)
    return (
        assigned.groupBy(F.window(F.col(ts_col), window), "z", "x", "y")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .select(F.col("window.start").alias("window_start"), "z", "x", "y", "n_rows")
    )


def stream_phash_dedup(assigned_stream: DataFrame,
                       timeout_ms: int | None = None) -> DataFrame:
    """CROSS-micro-batch per-tile phash dedup — the custom stateful operator
    (applyInPandasWithState): per (z, x, y) group, the set of phashes seen so
    far is the group state; a row is emitted only the first time its
    (tile, phash) appears across the whole stream. Stateless streaming (or
    per-batch dropDuplicates) cannot do this; batch phash_dedup is the
    bounded-input equivalent.

    State growth is bounded per tile by its distinct-phash count;
    timeout_ms (processing-time) expires idle tiles' state so a 10^12-row
    stream doesn't hold dead metros forever (expired tiles restart dedup —
    the documented trade of bounded state).

    Input needs columns image_id, z, x, y, phash. Output = the surviving
    rows (deterministic keeper: first batch arrival, then min image_id
    within a batch).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "image_id string, z int, x bigint, y bigint, phash long"
    state_schema = "phashes array<long>"

    def _dedup(key, pdfs, state: GroupState):
        z, x, y = key
        if timeout_ms is not None and state.hasTimedOut:
            state.remove()
            return
        seen = set(state.get[0]) if state.exists else set()
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values("image_id", kind="mergesort")
            pdf = pdf[~pdf["phash"].isin(seen)].drop_duplicates("phash", keep="first")
            if len(pdf):
                seen.update(int(p) for p in pdf["phash"])
                outs.append(pdf[["image_id", "z", "x", "y", "phash"]])
        state.update((sorted(seen),))
        if timeout_ms is not None:
            state.setTimeoutDuration(timeout_ms)
        if outs:
            yield pd.concat(outs)

    timeout_conf = (GroupStateTimeout.ProcessingTimeTimeout
                    if timeout_ms is not None else GroupStateTimeout.NoTimeout)
    return assigned_stream.groupBy("z", "x", "y").applyInPandasWithState(
        _dedup, out_schema, state_schema, "append", timeout_conf)


def snapshot_sink(table_root: str, n_buckets: int = 8, key_max: int | None = None,
                  key_min: int = 0, compact_every: int | None = None):
    """foreachBatch writer: each micro-batch commits one APPEND snapshot,
    keyed by batch id (idempotent on replay after restart — a replayed batch
    reuses its job-scoped staging dir and markers, so no duplicate data).

    Each batch's files land under data/stream-batch-<id>/ and the snapshot
    references ALL batches' paths, so earlier micro-batches are never
    clobbered — the table accumulates (incremental tile ingest).

    compact_every=N folds the accreted per-batch files back to one file per
    bucket every N batches (SnapshotTable.compact) — without it a long-lived
    stream accumulates one file per bucket per micro-batch forever. The
    compaction job id is keyed by batch id, so replays stay idempotent."""
    from ..sources.catalog import SnapshotTable

    table = SnapshotTable(table_root, n_buckets=n_buckets, key_max=key_max,
                          key_min=key_min)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        table.write_snapshot(batch_df, job_id=f"stream-batch-{batch_id}",
                             sort_col="tile_id", append=True)
        if compact_every and batch_id > 0 and batch_id % compact_every == 0:
            table.compact(batch_df.sparkSession,
                          job_id=f"stream-compact-{batch_id}",
                          sort_col="tile_id")

    return _write


def stream_blocklist_hits(doc_stream: DataFrame, blocked: DataFrame,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Streaming curation flags: incoming documents joined against a STATIC
    blocklist dim — the stream-static broadcast join pattern. Each emitted
    row is one (doc, blocked domain) hit.

    Fully STATELESS: domain extraction is a per-row projection + explode,
    and a stream-static inner join keeps no watermark state (only
    stream-stream joins do), so this runs at any stream rate with zero
    state store growth — unlike a per-doc re-aggregation, which would need
    unbounded doc_id state. Downstream either drops flagged ids (left-anti
    in the batch layer) or feeds an alerting sink; the batch twin is
    operators/text.blocklist_scrub.
    """
    from ..operators.text import extract_domains

    doms = extract_domains(doc_stream, id_col=id_col, text_col=text_col)
    b = F.broadcast(blocked.select(F.col("domain")).distinct())
    return doms.join(b, "domain").select(id_col, "domain")


def stream_od_transitions(located_stream: DataFrame) -> DataFrame:
    """Incremental origin-destination transitions: per user, emit one row
    per CONSECUTIVE tile transition as events arrive, across micro-batch
    boundaries — the streaming twin of operators/events.od_matrix (which
    needs the whole history; this keeps only each user's LAST (key, tile)
    as group state, so state is one row per user regardless of stream
    length — the opposite end of the state-size spectrum from
    stream_phash_dedup's growing per-tile sets).

    Input columns: user_id, k (int64 total order — the packed
    (micros, event_id) convention), tile. Rows must arrive in key order
    per user ACROSS batches for transitions to match the batch operator
    (within a batch they are sorted here — the group's WHOLE micro-batch is
    concatenated before the sort, because applyInPandasWithState delivers
    one group's rows as multiple Arrow chunks and a per-chunk sort would
    splice transitions in chunk order; late cross-batch events still need
    a watermark-delayed sort upstream if the source reorders). Output:
    (user_id, k, tile_from, tile_to).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    out_schema = "user_id bigint, k bigint, tile_from bigint, tile_to bigint"
    state_schema = "last_k bigint, last_tile bigint"

    def _trans(key, pdfs, state: GroupState):
        (uid,) = key
        last = state.get if state.exists else None
        outs = []
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            batch = (pd.concat(chunks, ignore_index=True) if len(chunks) > 1
                     else chunks[0])
            batch = batch.sort_values("k", kind="mergesort")
            for row in batch.itertuples(index=False):
                if last is not None:
                    outs.append((uid, int(row.k), int(last[1]), int(row.tile)))
                last = (int(row.k), int(row.tile))
        if last is not None:
            state.update(last)
        if outs:
            yield pd.DataFrame(outs, columns=["user_id", "k",
                                              "tile_from", "tile_to"])

    return located_stream.groupBy("user_id").applyInPandasWithState(
        _trans, out_schema, state_schema, "append",
        GroupStateTimeout.NoTimeout)
