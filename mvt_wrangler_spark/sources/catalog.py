"""Iceberg-shaped snapshot table layer over parquet (no Iceberg jars in env).

Gives the north rule's resume semantics: per-partition (bucket) checkpoints
with lineage + row counts, idempotent overwrite-by-partition, and an atomic
snapshot commit — the Spark re-expression of the reference's ordered
finalize() (/root/reference/src/processing.rs:98-121): work lands bucket by
bucket, becomes visible only at the atomic CURRENT swap.

Layout:
  root/
    data/bucket=<b>/*.parquet          one range-bucket of tile_id space
    manifests/job-<job_id>/bucket-<b>.json   per-partition done marker:
        {rows, bytes, files, bucket, wall_sec, finished_at}
    manifests/snapshot-<n>.json        committed snapshot (bucket list + totals)
    CURRENT                            text file with latest snapshot number
                                       (atomic rename swap)

Resume: re-running the same job_id skips buckets whose marker exists; a
killed job leaves only complete bucket dirs + markers (bucket write is
overwrite-idempotent, marker written after the bucket data lands).
If the iceberg-spark-runtime jar is ever available, SnapshotTable's surface
(write_snapshot / read_current / resume) maps 1:1 onto a real Iceberg table.
"""

from __future__ import annotations

import json
import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SnapshotTable:
    def __init__(self, root: str, n_buckets: int = 16, bucket_col: str = "tile_id"):
        self.root = root
        self.n_buckets = n_buckets
        self.bucket_col = bucket_col
        os.makedirs(f"{root}/manifests", exist_ok=True)
        os.makedirs(f"{root}/data", exist_ok=True)

    # -- bucket assignment: range-ish via high bits of the cluster key ------
    def _bucketed(self, df: DataFrame) -> DataFrame:
        return df.withColumn(
            "__bucket", F.pmod(F.col(self.bucket_col), F.lit(self.n_buckets)).cast("int")
        )

    def _marker(self, job_id: str, b: int) -> str:
        return f"{self.root}/manifests/job-{job_id}/bucket-{b}.json"

    def write_snapshot(self, df: DataFrame, job_id: str, sort_col: str | None = None,
                       progress=None) -> dict:
        """Write all buckets (skipping checkpointed ones), then commit.

        Returns the committed snapshot manifest. Buckets are processed
        sequentially as independent Spark jobs — each is the resumable unit;
        within a bucket all executors work in parallel. Each bucket's data is
        sorted by the cluster key (ordered-sink semantics, W1/S5).
        """
        os.makedirs(f"{self.root}/manifests/job-{job_id}", exist_ok=True)
        bucketed = self._bucketed(df)
        sort_col = sort_col or self.bucket_col
        manifests = []
        for b in range(self.n_buckets):
            mpath = self._marker(job_id, b)
            if os.path.exists(mpath):
                with open(mpath) as f:
                    manifests.append(json.load(f))
                continue
            t0 = time.time()
            part = bucketed.filter(F.col("__bucket") == b).drop("__bucket")
            out_dir = f"{self.root}/data/bucket={b}"
            part.sortWithinPartitions(sort_col).write.mode("overwrite").parquet(out_dir)
            rows = part.sparkSession.read.parquet(out_dir).count()  # post-commit truth
            files = [fn for fn in os.listdir(out_dir) if fn.endswith(".parquet")]
            m = {
                "bucket": b,
                "rows": rows,
                "files": sorted(files),
                "bytes": sum(os.path.getsize(f"{out_dir}/{fn}") for fn in files),
                "wall_sec": round(time.time() - t0, 3),
                "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            }
            tmp = mpath + f".tmp-{uuid.uuid4().hex[:8]}"
            with open(tmp, "w") as f:
                json.dump(m, f)
            os.rename(tmp, mpath)  # atomic per-partition checkpoint
            manifests.append(m)
            if progress:
                progress(b, m)
        return self._commit(job_id, manifests)

    def _commit(self, job_id: str, manifests: list[dict]) -> dict:
        n = self.current_snapshot_id() + 1
        snap = {
            "snapshot": n,
            "job_id": job_id,
            "buckets": manifests,
            "total_rows": sum(m["rows"] for m in manifests),
            "total_bytes": sum(m["bytes"] for m in manifests),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        spath = f"{self.root}/manifests/snapshot-{n}.json"
        tmp = spath + ".tmp"
        with open(tmp, "w") as f:
            json.dump(snap, f, indent=1)
        os.rename(tmp, spath)
        ctmp = f"{self.root}/CURRENT.tmp"
        with open(ctmp, "w") as f:
            f.write(str(n))
        os.rename(ctmp, f"{self.root}/CURRENT")  # atomic visibility swap
        return snap

    def current_snapshot_id(self) -> int:
        try:
            with open(f"{self.root}/CURRENT") as f:
                return int(f.read().strip())
        except FileNotFoundError:
            return 0

    def current_snapshot(self) -> dict | None:
        n = self.current_snapshot_id()
        if n == 0:
            return None
        with open(f"{self.root}/manifests/snapshot-{n}.json") as f:
            return json.load(f)

    def read_current(self, spark: SparkSession) -> DataFrame:
        snap = self.current_snapshot()
        if snap is None:
            raise FileNotFoundError(f"no committed snapshot at {self.root}")
        return spark.read.parquet(*[f"{self.root}/data/bucket={m['bucket']}"
                                    for m in snap["buckets"]])

    def lineage(self) -> list[dict]:
        """Per-partition lineage of the current snapshot (north rule metric)."""
        snap = self.current_snapshot()
        return snap["buckets"] if snap else []
