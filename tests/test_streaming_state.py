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


def test_snapshot_sink_compacts_every_n_batches(spark, tmp_path):
    """The foreachBatch sink with compact_every folds accreted per-batch
    files back to one file per bucket, rows intact, idempotent on replay."""
    from pyspark.sql import functions as F

    from mvt_wrangler_spark.sources.catalog import SnapshotTable
    from mvt_wrangler_spark.streaming.stream import snapshot_sink

    root = str(tmp_path / "sink")
    write = snapshot_sink(root, n_buckets=4, compact_every=2)
    for bid in range(4):
        batch = spark.range(bid * 50, (bid + 1) * 50).select(
            F.col("id"), (F.col("id") * 13 % 389).alias("tile_id"))
        write(batch, bid)

    table = SnapshotTable(root, n_buckets=4)
    # batch 2's compaction ran; batch 3 appended after it
    lin = table.lineage()
    per_bucket = {}
    for m in lin:
        per_bucket[m["bucket"]] = per_bucket.get(m["bucket"], 0) + len(m["files"])
    # batches 0..2 collapsed to ONE file per bucket; batch 3 appended after
    # (a single batch may add up to 2 range-partition files per bucket)
    assert max(per_bucket.values()) <= 3
    compacted = [m for m in lin
                 if m["path"].startswith(f"{root}/data/stream-compact-2/")]
    assert compacted and all(len(m["files"]) <= 1 for m in compacted)
    assert not any(m["path"].startswith(f"{root}/data/stream-batch-0/")
                   or m["path"].startswith(f"{root}/data/stream-batch-1/")
                   for m in lin)
    got = table.read_current(spark)
    assert {r.id for r in got.select("id").collect()} == set(range(200))

    # replaying batch 2 (restart mid-stream) changes nothing
    snap_before = table.current_snapshot_id()
    batch2 = spark.range(100, 150).select(
        F.col("id"), (F.col("id") * 13 % 389).alias("tile_id"))
    write(batch2, 2)
    assert table.current_snapshot_id() == snap_before
    assert table.read_current(spark).count() == 200


@pytest.mark.spark
def test_stream_blocklist_hits_matches_batch(spark, tmp_path):
    """The stateless stream-static blocklist join emits exactly the hits
    the batch operator counts, across micro-batches."""
    from mvt_wrangler_spark.operators.text import blocklist_scrub
    from mvt_wrangler_spark.streaming.stream import stream_blocklist_hits

    src = str(tmp_path / "docs")
    mk = lambda i: (f"see https://www.s{i % 3}.dom{i % 4}.com/x page"  # noqa: E731
                    if i % 5 else "no links here")
    b0 = spark.createDataFrame([(i, mk(i)) for i in range(20)], ["doc_id", "text"])
    b1 = spark.createDataFrame([(i, mk(i)) for i in range(20, 40)], ["doc_id", "text"])
    b0.coalesce(1).write.parquet(f"{src}/f=0")
    b1.coalesce(1).write.parquet(f"{src}/f=1")
    blocked = spark.createDataFrame([("dom1.com",), ("dom3.com",)], ["domain"])

    schema = spark.read.parquet(f"{src}/f=0").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/f=*"))
    hits = stream_blocklist_hits(stream, blocked)
    q = (hits.writeStream.outputMode("append").format("memory")
         .queryName("sblock").option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)

    got = {(r["doc_id"], r["domain"])
           for r in spark.sql("SELECT * FROM sblock").collect()}
    batch = blocklist_scrub(b0.unionAll(b1), blocked)
    flagged = {r["doc_id"] for r in batch.filter("n_blocked > 0").collect()}
    assert {d for d, _ in got} == flagged
    assert all(dom in ("dom1.com", "dom3.com") for _, dom in got)
    assert flagged == {i for i in range(40) if i % 5 and i % 4 in (1, 3)}


@pytest.mark.spark
def test_stream_od_transitions_matches_batch(spark, tmp_path):
    """Two micro-batches of per-user movement emit exactly the transitions
    the batch od_matrix computes on the union — including the SPLICE
    transition between the last event of batch 0 and the first of batch 1
    (the row only group state can produce)."""
    from collections import Counter

    src = str(tmp_path / "odsrc")
    # user u: tiles 1,2 in batch 0 then 2,3 in batch 1 (keys ordered across
    # batches); user v: single event per batch -> exactly one spliced row
    rows0 = [(7, 10, 1), (7, 20, 2), (9, 15, 5)]
    rows1 = [(7, 30, 2), (7, 40, 3), (9, 25, 6)]
    sch = "user_id long, k long, tile long"
    spark.createDataFrame(rows0, sch).coalesce(1).write.parquet(f"{src}/f=0")
    spark.createDataFrame(rows1, sch).coalesce(1).write.parquet(f"{src}/f=1")

    from mvt_wrangler_spark.streaming.stream import stream_od_transitions

    schema = spark.read.parquet(f"{src}/f=0").schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(f"{src}/f=*"))
    q = (stream_od_transitions(stream)
         .writeStream.outputMode("append").format("memory")
         .queryName("sod").option("checkpointLocation", str(tmp_path / "odck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = Counter((r.tile_from, r.tile_to)
                  for r in spark.sql("SELECT * FROM sod").collect())

    from mvt_wrangler_spark.operators.events import od_matrix

    allrows = spark.createDataFrame(rows0 + rows1, sch)
    batch = {(r.tile_from, r.tile_to): r.n_trips
             for r in od_matrix(allrows, order_cols=["k"],
                                tile_col="tile").collect()}
    assert dict(got) == batch
    assert got[(2, 2)] == 1 and got[(5, 6)] == 1  # cross-batch splices


def test_stream_od_transitions_multichunk_group(spark, tmp_path):
    """A group whose micro-batch spans SEVERAL Arrow chunks must still walk
    its events in key order: applyInPandasWithState delivers one group's
    rows as multiple chunks, and a per-chunk sort (the pre-round-7 bug)
    splices transitions in chunk order. Forcing 8-row Arrow batches with a
    40-event user reproduces >1 chunk per group; the result must equal the
    batch od_matrix on the same rows."""
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "8")
    try:
        src = str(tmp_path / "odmc")
        # one user, 40 events, keys written in REVERSED order so chunk-local
        # sorting cannot accidentally produce the global order
        rows = [(3, k, k % 7) for k in range(40, 0, -1)]
        sch = "user_id long, k long, tile long"
        spark.createDataFrame(rows, sch).coalesce(1).write.parquet(f"{src}/f=0")

        from mvt_wrangler_spark.streaming.stream import stream_od_transitions

        schema = spark.read.parquet(f"{src}/f=0").schema
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/f=*"))
        q = (stream_od_transitions(stream)
             .writeStream.outputMode("append").format("memory")
             .queryName("sodmc")
             .option("checkpointLocation", str(tmp_path / "odmcck"))
             .trigger(availableNow=True).start())
        q.awaitTermination(180)
        got = sorted((r.k, r.tile_from, r.tile_to)
                     for r in spark.sql("SELECT * FROM sodmc").collect())

        from mvt_wrangler_spark.operators.events import od_matrix
        from collections import Counter

        batch = {(r.tile_from, r.tile_to): r.n_trips
                 for r in od_matrix(spark.createDataFrame(rows, sch),
                                    order_cols=["k"],
                                    tile_col="tile").collect()}
        assert dict(Counter((f, t) for _, f, t in got)) == batch
        # and the walk itself is the key-ordered one: event k transitions
        # FROM tile (k-1)%7 TO k%7 for every k >= 2
        assert got == [(k, (k - 1) % 7, k % 7) for k in range(2, 41)]
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
