"""SparkSession factory with scale-oriented defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]``; the same config block is
what we would pass to ``spark-submit`` on a multi-executor cluster (AQE,
skew-join handling, Arrow batching). Only ``spark.driver.memory`` is
local-mode specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _dev_shm_bytes() -> int:
    """Capacity of /dev/shm, 0 if absent (probe before using it for shuffle)."""
    try:
        st = os.statvfs("/dev/shm")
        return st.f_frsize * st.f_blocks
    except OSError:
        return 0


def get_spark(
    app_name: str = "ttmf_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on: runtime partition coalescing + skew-join splitting cover the
      data-dependent shuffle sizing we cannot know statically at 100 TB.
    - Arrow on: every Python-side operator in this repo is a pandas UDF /
      applyInPandas; row-at-a-time Python UDFs are banned.
    - shuffle.partitions defaults to 2x cores locally; on a real cluster
      this is overridden (or left to AQE's coalescing with a high initial
      partition count).
    """
    cores = cores or os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        # throughput GC: G1 with a large un-pinned heap suffered a
        # commit/uncommit page-fault storm that WORSENED with task
        # parallelism (measured 173.9s -> 20.3s on the identical local[32]
        # assemble stage just by switching collectors — the round-1
        # scaling-collapse root cause). Batch analytics wants the
        # throughput collector; on a cluster this maps to
        # spark.executor.extraJavaOptions.
        .config(
            "spark.driver.extraJavaOptions",
            os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS", "-XX:+UseParallelGC"),
        )
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    # shuffle/spill dirs on tmpfs: the sandbox /tmp is a virtio disk and
    # 32 concurrent shuffle writers serialize on it (~19x per-task
    # slowdown measured); on a real cluster spark.local.dir is the
    # cluster manager's local-NVMe setting and this block is inert.
    # Guarded: only use /dev/shm when it is actually big (Docker defaults
    # it to 64 MB, where tmpfs shuffle space would fail or OOM the host).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if local_dir is None and _dev_shm_bytes() >= 8 * 1024**3:
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    n_shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "0")) or None
    if n_shuffle is None:
        try:
            n_cores = int(str(cores))
        except ValueError:
            n_cores = os.cpu_count() or 8
        n_shuffle = max(8, 2 * n_cores)
    builder = builder.config("spark.sql.shuffle.partitions", str(n_shuffle))
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
