"""Incremental / streaming ingestion of interleaved documents.

The reference is pure batch (SURVEY.md §2.11); the north rule requires
batch with resumable checkpoints, which `checkpoint.StageStore` covers.
This module adds the *incremental arrival* path a production corpus has:
new document files land continuously, and triples must be extracted
exactly-once without reprocessing the corpus.

Design: Structured Streaming file source -> foreachBatch(extract + append).
Inside each micro-batch we run the SAME batch extraction pipeline (one
code path for batch and streaming — the Spark-first way), then drop
already-emitted triples with an anti-join against the sink before
appending. Spark's checkpointLocation gives exactly-once file-source
progress tracking; the anti-join makes the append idempotent even across
manual re-runs.

Scale: the sink is hash-bucketed on (s, p, o) into ``n_buckets``
partition directories, and the anti-join key includes the bucket — both
sides hash-partition identically, so each task probes only its own
1/n_buckets slice of sink history instead of the whole table (round-2
fix for the grows-with-history anti-join). Production swaps the
partitioned-parquet sink for an Iceberg table with a bucket(s,p,o)
partition transform and a MERGE.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ttmf_spark.extract import extract_triples

DOCS_SCHEMA = (
    "doc_id string, "
    "spans array<struct<kind:string,text:string,media_ref:string,offset:int>>"
)


def stream_docs(spark: SparkSession, input_dir: str, max_files: int = 16) -> DataFrame:
    """File-source stream of interleaved-doc parquet drops."""
    return (
        spark.readStream.schema(DOCS_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_dir)
    )


def incremental_extract(
    spark: SparkSession,
    input_dir: str,
    output_path: str,
    checkpoint_dir: str,
    gazetteer: DataFrame,
    same_as: DataFrame | None = None,
    trigger_once: bool = True,
    n_buckets: int = 64,
):
    """Start the incremental extraction query; returns the StreamingQuery.

    ``trigger_once`` processes the current backlog then stops (the
    batch-resume pattern); set False for continuous micro-batches.
    """
    gaz = gazetteer.localCheckpoint(eager=True)
    same = same_as.localCheckpoint(eager=True) if same_as is not None else None

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        triples = extract_triples(batch_df, gaz, same).withColumn(
            "bucket", F.pmod(F.xxhash64("s", "p", "o"), F.lit(n_buckets))
        )
        # explicit existence check: a transient read error must propagate,
        # not silently disable dedup (it would duplicate the whole batch)
        if os.path.exists(os.path.join(output_path, "_SUCCESS")) or any(
            e.startswith("bucket=") for e in (
                os.listdir(output_path) if os.path.isdir(output_path) else []
            )
        ):
            existing = spark.read.parquet(output_path).select(
                "bucket", "s", "p", "o"
            )
            fresh = triples.join(
                existing, ["bucket", "s", "p", "o"], "left_anti"
            )
        else:  # first batch: sink does not exist yet
            fresh = triples
        fresh.write.mode("append").partitionBy("bucket").parquet(output_path)

    writer = (
        stream_docs(spark, input_dir)
        .writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint_dir)
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
