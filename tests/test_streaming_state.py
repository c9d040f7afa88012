"""Stateful streaming dedup: first (tile, phash) occurrence ACROSS
micro-batches wins; later batches' duplicates are suppressed by group state."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.functions import tiling
from mvt_wrangler_spark.streaming.stream import stream_phash_dedup


@pytest.mark.spark
def test_stream_phash_dedup_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    # batch 0: phashes 0..49 (ids 0..49); batch 1: phashes 25..74 (ids 100..)
    # -> batch 1 must emit only phashes 50..74 (25..49 are cross-batch dups)
    b0 = spark.range(0, 50).select(
        F.format_string("a%03d", F.col("id")).alias("image_id"),
        F.lit(0.5).alias("lon"), F.lit(0.5).alias("lat"),
        F.col("id").alias("phash"))
    b1 = spark.range(100, 150).select(
        F.format_string("b%03d", F.col("id")).alias("image_id"),
        F.lit(0.5).alias("lon"), F.lit(0.5).alias("lat"),
        (F.col("id") - 75).alias("phash"))
    b0.coalesce(1).write.parquet(f"{src}/f=0")
    b1.coalesce(1).write.parquet(f"{src}/f=1")

    schema = spark.read.parquet(f"{src}/f=0").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/f=*"))
    assigned = tiling.assign_tiles(stream, z=3, with_local=False).select(
        "image_id", "z", "x", "y", "phash")
    deduped = stream_phash_dedup(assigned)
    q = (deduped.writeStream.outputMode("append").format("memory")
         .queryName("sdedup").option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    rows = spark.sql("SELECT * FROM sdedup").collect()
    by_phash = {}
    for r in rows:
        assert r.phash not in by_phash, "duplicate phash emitted"
        by_phash[r.phash] = r.image_id
    # every phash 0..74 exactly once
    assert sorted(by_phash) == list(range(75))
    # cross-batch keepers: first batch won for the overlap 25..49
    assert all(by_phash[p].startswith("a") for p in range(0, 50))
    assert all(by_phash[p].startswith("b") for p in range(50, 75))
