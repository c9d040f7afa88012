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


def snapshot_sink(table_root: str, n_buckets: int = 8, key_max: int | None = None):
    """foreachBatch writer: each micro-batch commits one APPEND snapshot,
    keyed by batch id (idempotent on replay after restart — a replayed batch
    reuses its job-scoped staging dir and markers, so no duplicate data).

    Each batch's files land under data/stream-batch-<id>/ and the snapshot
    references ALL batches' paths, so earlier micro-batches are never
    clobbered — the table accumulates (incremental tile ingest)."""
    from ..sources.catalog import SnapshotTable

    table = SnapshotTable(table_root, n_buckets=n_buckets, key_max=key_max)

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        table.write_snapshot(batch_df, job_id=f"stream-batch-{batch_id}",
                             sort_col="tile_id", append=True)

    return _write
