"""SparkSession builder with the engine's scale-oriented defaults.

The reference's runtime knobs (num_cpus readers + rayon pool, bounded
channels — /root/reference/src/processing.rs:12,24) map in Spark to
parallelism + AQE configs; we set them once here so every entry point
(tests, bench, CLI, driver hooks) runs with the same physical profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    master: str | None = None,
    app_name: str = "mvt-wrangler-spark",
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with AQE + Arrow enabled.

    Defaults are chosen for the sandbox (local[N]) but the same configs are
    what we would ship to a 1000-executor cluster: AQE coalescing/skew-join
    on, Arrow for pandas UDF transport, sane shuffle partitioning.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        n = cpus if cpus.isdigit() else "32"
        shuffle_partitions = max(int(n) * 2, 8)

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        # AQE: runtime re-planning, partition coalescing, skew-join splitting.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow transport for pandas UDFs / mapInPandas (the only Python path).
        # 64k-row batches: the vectorized numpy kernels amortize per-batch
        # Arrow framing + Python dispatch — measured 30% on the 120M compute
        # scenario vs the old 10k default (round 5 A/B, BENCH/BASELINE.md);
        # ~3 MB/batch/stream at these row widths, safe for any executor size.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        # Keep broadcast autodetection on; our dims (filters, admin polys) are tiny.
        .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
        # 128MB splits — matches large-cluster defaults for 100TB scans.
        .config("spark.sql.files.maxPartitionBytes", "134217728")
        .config("spark.sql.session.timeZone", "UTC")
        # Shuffle spill dir: the sandbox's /tmp is one shared block device,
        # which serializes concurrent shuffle writers (negative core-scaling);
        # a real cluster has per-node SSDs. tmpfs is the faithful local stand-in.
        .config("spark.local.dir", os.environ.get(
            "SPARK_GRAFT_LOCAL_DIR",
            "/dev/shm/spark-local" if os.path.isdir("/dev/shm") else "/tmp"))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
