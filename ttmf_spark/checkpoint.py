"""Per-stage checkpointing + lineage/metrics logging.

Resumability contract (BASELINE.json north_rule: "resumable from checkpoint
with per-partition lineage + metrics"): every pipeline stage writes an
idempotent parquet/Iceberg table; a completed stage (``_SUCCESS`` marker)
is *not* recomputed on restart — the reference's file-existence memoization
(SearchPaths2.py:119-120, Model1.py:987,999) generalized to whole tables.
For incremental re-runs over a grown input, ``anti_join_resume`` restarts
only the unprocessed keys (SURVEY.md P6).

Metrics: each stage append-logs one JSON line per run (rows, wall seconds,
partition count) to ``<root>/_metrics.jsonl`` and per-partition row counts
to ``<root>/<stage>_partstats`` — the per-partition lineage record.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class StageStore:
    """Directory-backed stage checkpoint store."""

    def __init__(self, root: str, fmt: str = "parquet"):
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    def path(self, stage: str) -> str:
        return os.path.join(self.root, stage)

    def done(self, stage: str) -> bool:
        return os.path.exists(os.path.join(self.path(stage), "_SUCCESS"))

    def _log(self, record: dict) -> None:
        with open(os.path.join(self.root, "_metrics.jsonl"), "a") as f:
            f.write(json.dumps(record) + "\n")

    def log_timing(self, stage: str, seconds: float) -> None:
        """Record a driver-side (non-DataFrame) stage — e.g. the numpy
        embedding/fusion fits — in the same metrics log the DataFrame
        stages use, so the per-stage breakdown accounts for the full
        pipeline wall time."""
        self._log(
            {
                "stage": stage,
                "rows": None,
                "seconds": round(seconds, 3),
                "partitions": None,
                "ts": time.time(),
            }
        )

    def materialize(
        self,
        spark: SparkSession,
        stage: str,
        build,
        partition_by: list[str] | None = None,
        repartition: int | None = None,
        force: bool = False,
        log_partition_stats: bool = True,
    ) -> DataFrame:
        """Run ``build()`` unless the stage is already checkpointed.

        Returns the checkpointed DataFrame (read back from disk — this
        truncates lineage, exactly what iterative downstream stages need).
        """
        p = self.path(stage)
        if force or not self.done(stage):
            t0 = time.perf_counter()
            df = build()
            if repartition:
                df = df.repartition(repartition, *(partition_by or []))
            writer = df.write.mode("overwrite")
            if partition_by and not repartition:
                writer = writer.partitionBy(*partition_by)
            getattr(writer, self.fmt)(p)
            out = getattr(spark.read, self.fmt)(p)
            elapsed = time.perf_counter() - t0
            n = out.count()
            nparts = out.rdd.getNumPartitions()
            self._log(
                {
                    "stage": stage,
                    "rows": n,
                    "seconds": round(elapsed, 3),
                    "partitions": nparts,
                    "ts": time.time(),
                }
            )
            if log_partition_stats:
                stats = out.groupBy(F.spark_partition_id().alias("pid")).count()
                stats.write.mode("overwrite").parquet(p + "_partstats")
            return out
        return getattr(spark.read, self.fmt)(p)


def anti_join_resume(
    new_input: DataFrame, done_output: DataFrame, keys: list[str]
) -> DataFrame:
    """Keys already present in the checkpointed output are skipped
    (reference memoization predicate, SURVEY.md P6)."""
    return new_input.join(done_output.select(*keys).distinct(), keys, "left_anti")
