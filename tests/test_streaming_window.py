"""Watermarked windowed tile counts: late data dropped, windows finalize."""

from __future__ import annotations

import datetime

import pytest


def _write_batch(spark, path, rows):
    spark.createDataFrame(
        rows, "image_id string, lon double, lat double, ts timestamp"
    ).coalesce(1).write.mode("append").parquet(path)


@pytest.mark.spark
def test_windowed_counts_drop_late_rows(spark, tmp_path):
    from mvt_wrangler_spark.streaming.stream import windowed_tile_counts

    src = str(tmp_path / "in")
    t = lambda h, m: datetime.datetime(2024, 1, 1, h, m)  # noqa: E731
    lon, lat = 139.76, 35.68  # one fixed tile

    # batch 1: three rows in the 10:00 window; a 12:00 row advances the
    # watermark to 11:50 at batch end, FINALIZING the 10:00 window (append
    # mode only emits and only drops against closed windows: a late row is
    # discarded iff its window end < watermark)
    _write_batch(spark, src, [
        ("a", lon, lat, t(10, 0)), ("b", lon, lat, t(10, 2)),
        ("c", lon, lat, t(10, 4)), ("d", lon, lat, t(12, 0))])

    stream = (spark.readStream
              .schema("image_id string, lon double, lat double, ts timestamp")
              .option("maxFilesPerTrigger", 1).parquet(src))
    out = windowed_tile_counts(stream, z=6, window="1 hour",
                               watermark="10 minutes")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("wincounts")
         .option("checkpointLocation", str(tmp_path / "ck")).start())
    try:
        q.processAllAvailable()
        # batch 2: one LATE row at 10:01 — its window closed at watermark
        # 11:50, so it is dropped — and a 13:30 row that pushes the
        # watermark to 13:20, finalizing the 12:00 window
        _write_batch(spark, src, [
            ("late", lon, lat, t(10, 1)), ("e", lon, lat, t(13, 30))])
        q.processAllAvailable()
        rows = {r.window_start.hour: r.n_rows
                for r in spark.sql("SELECT * FROM wincounts").collect()}
    finally:
        q.stop()
    # 10:00 window finalized WITHOUT the late row; 12:00 window finalized;
    # 13:00 window still open (not emitted in append mode)
    assert rows == {10: 3, 12: 1}
