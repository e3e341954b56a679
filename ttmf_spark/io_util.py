"""Skew-aware join helpers + partitioned sinks.

`salted_join` is the explicit hot-key strategy for joins AQE cannot fix
(BASELINE.json north_star: "salted broadcast alias joins", "skew-key
salting on hot entities"): replicate the small side `salt` times, salt
the big side with a deterministic hash — every hot key spreads over
`salt` reducers. Used when the dim side exceeds the broadcast threshold
but key frequency is Zipf (entity alias tables, hub-entity joins).

`write_partitioned` is the triple-table sink: repartition by a bucketed
key (subject hash) + sort within partitions — the parquet stand-in for
an Iceberg `bucket(N, s)` partition spec (same layout contract:
co-located subjects, pruned scans; swap `.format("iceberg")` in a real
lakehouse deployment).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join `big` with `small` on column ``on`` with `salt`-way
    key-spreading. `small` is replicated `salt` times (explode over the
    salt range), `big` rows pick one replica via a row hash — hot keys in
    `big` scatter across `salt` partitions instead of one."""
    salted_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt))
    )
    return salted_big.join(salted_small, [on, "_salt"], how).drop("_salt")


def write_partitioned(
    df: DataFrame,
    path: str,
    bucket_col: str = "s",
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Bucket-layout write honoring the Iceberg ``bucket(N, col)``
    contract at FILE granularity: an explicit ``bucket`` column
    (pmod(xxhash64(col), N)) drives both the shuffle AND a
    ``partitionBy`` directory per bucket, so every data file holds rows
    of exactly one bucket and a reader prunes to ``bucket=k``
    directories. Sorted within partitions for merge-friendly scans.

    Round-3 fix (pinned by tests/test_pipeline.py bucket-layout
    contract test): the previous ``repartition(N, pmod(...))`` only
    CO-LOCATED equal keys — Spark hash-partitions the pmod value again,
    so files mixed bucket ids and the documented one-file-one-bucket
    pruning contract did not actually hold on disk.
    """
    out = df.withColumn(
        "bucket", F.pmod(F.xxhash64(F.col(bucket_col)), F.lit(n_buckets))
    ).repartition(n_buckets, "bucket")
    if sort_cols:
        # bucket first: the dynamic-partition writer requires rows sorted
        # by partition columns and would otherwise insert its own
        # (non-stable) sort, destroying the data ordering
        out = out.sortWithinPartitions("bucket", *sort_cols)
    getattr(out.write.mode(mode).partitionBy("bucket"), fmt)(path)


def compact_partitioned(
    spark,
    path: str,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> int:
    """Rewrite a ``write_partitioned`` table so each bucket directory
    holds ONE file again; returns the file count before compaction.

    Steady-state maintenance ops (``triple_support_incremental`` folds,
    ``components_incremental`` label merges, streaming micro-batch
    sinks) append a file per bucket per fold — after thousands of folds
    a 100 TB reader pays file-open and footer cost per tiny file, the
    classic small-files problem. Compaction restores one-file-per-bucket
    while preserving the full layout contract (bucket dirs = pruning,
    within-file sort order), so it is safe to run on any cadence.

    This is the parquet stand-in for Iceberg's ``rewriteDataFiles``
    action (which does the same rewrite under a snapshot transaction).
    Without a transactional catalog the swap is two directory renames:
    write to ``<path>.compacting``, rename ``path`` -> ``<path>.bak``,
    rename ``.compacting`` -> ``path``, delete ``.bak``. Crash-window
    ordering contract (same duplicates-never-loss style the batched
    path resume pins): a crash always leaves at least one complete copy
    — before the first rename the original is untouched; between the
    renames ``.bak`` is the complete table; after, ``path`` is.
    Readers racing the swap must re-list (document as the non-Iceberg
    deployment caveat).
    """
    import glob
    import os
    import shutil

    before = len(glob.glob(os.path.join(path, "bucket=*", "*")))
    df = getattr(spark.read, fmt)(path)
    # hash-repartition ON the bucket column: every bucket's rows land in
    # exactly one task, so the dynamic-partition writer emits exactly
    # one file per bucket directory (a task holding several buckets
    # still writes each to its own directory)
    out = df.repartition(F.col("bucket"))
    if sort_cols:
        out = out.sortWithinPartitions("bucket", *sort_cols)
    tmp, bak = path + ".compacting", path + ".bak"
    shutil.rmtree(tmp, ignore_errors=True)
    getattr(out.write.mode("overwrite").partitionBy("bucket"), fmt)(tmp)
    os.rename(path, bak)
    os.rename(tmp, path)
    shutil.rmtree(bak)
    return before
