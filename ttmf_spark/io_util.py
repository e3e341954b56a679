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
    renames ``.bak`` is the complete table; after, ``path`` is — and
    entry self-heals both crash residues: a stale ``.bak`` next to an
    intact ``path`` is cleared, and a missing ``path`` with a ``.bak``
    rolls the backup forward before compacting.
    Readers racing the swap must re-list (document as the non-Iceberg
    deployment caveat).

    LOCAL-FILESYSTEM ONLY: this function uses ``os.rename``/``glob``
    directly, so it works on a driver-local (POSIX) path and nowhere
    else — on an object-store URI there is no rename (and Hadoop's
    emulation is non-atomic copy+delete). For s3/hdfs deployments use
    the versioned-directory pair ``write_partitioned_versioned`` /
    ``compact_partitioned_versioned`` below (no renames at all), or
    real Iceberg ``rewriteDataFiles``.
    """
    import glob
    import os
    import shutil

    bak_pre = path + ".bak"
    if not os.path.exists(path) and os.path.exists(bak_pre):
        # crash landed between the two renames: .bak is the complete table
        os.rename(bak_pre, path)
    elif os.path.exists(bak_pre):
        # crash landed after the second rename, before cleanup
        shutil.rmtree(bak_pre, ignore_errors=True)

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


def read_bucket_pruned(
    spark,
    path: str,
    keys: DataFrame,
    key_col: str,
    n_buckets: int = 64,
    fmt: str = "parquet",
) -> DataFrame:
    """Scan a ``write_partitioned`` table touching ONLY the bucket
    directories that can hold rows whose bucket column (``key_col``)
    value appears in ``keys`` — partition pruning pushed to the
    directory listing, the parquet stand-in for Iceberg's bucket-
    transform partition pruning.

    ``keys`` may be arbitrarily large (affected-subgraph-sized): it is
    reduced to its distinct BUCKET ids first — at most ``n_buckets``
    longs, driver-safe by construction — and the scan filters on the
    ``bucket`` partition column, so unaffected bucket dirs are never
    listed, opened, or read. The caller still applies its own row-level
    predicate; this prunes files, not rows.

    The maintenance use (components_decremental): the per-retraction-
    batch carve joins the maintained edge table against the affected
    components; when that table is bucketed on ``src``, passing the
    affected NODES here confines the only corpus-scale touch of the
    deletion path to the affected buckets (measured at sf0.1 in
    BENCH.md's maintenance-economics table).
    """
    if key_col in keys.columns:
        kc = key_col
    elif len(keys.columns) == 1:
        # single-column key frame: unambiguous, accept any name
        kc = keys.columns[0]
    else:
        # a silent fallback here would hash the WRONG column and prune
        # buckets that actually hold affected rows — fail fast instead
        raise ValueError(
            f"key_col {key_col!r} not in keys columns {keys.columns}"
        )
    bkts = [
        r["b"]
        for r in keys.select(
            F.pmod(F.xxhash64(F.col(kc)), F.lit(n_buckets)).alias("b")
        ).distinct().collect()
    ]
    return getattr(spark.read, fmt)(path).filter(F.col("bucket").isin(bkts))


# --- object-store-safe versioned layout -------------------------------------
#
# The rename-free twin of write_partitioned/compact_partitioned for
# deployments without POSIX renames (s3/gcs; also correct on hdfs/local).
# Layout: <root>/v=<n>/bucket=*/part-*.parquet. A version COMMITS when its
# Spark write finishes (the _SUCCESS marker the committer drops at
# <root>/v=<n>/_SUCCESS); readers resolve "current" as the highest
# committed version — the same versioned-sink contract the streaming label
# / support state stores use (streaming._list_label_versions), so a crash
# mid-write leaves an uncommitted v-dir that every reader ignores and the
# next writer's version counter skips past. No pointer file, no rename,
# no crash window: every observable state is a complete table.


def _fs_for(spark, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def committed_versions(spark, root: str) -> list[int]:
    """Sorted committed version numbers under ``root`` (Hadoop FS API, so
    s3a/hdfs/file URIs all work): a v=<n> dir counts iff its _SUCCESS
    marker exists."""
    fs, jroot, jvm = _fs_for(spark, root)
    if not fs.exists(jroot):
        return []
    out = []
    for st in fs.listStatus(jroot):
        name = st.getPath().getName()
        if name.startswith("v="):
            try:
                v = int(name[2:])
            except ValueError:
                continue
            if fs.exists(jvm.org.apache.hadoop.fs.Path(f"{root}/v={v}/_SUCCESS")):
                out.append(v)
    return sorted(out)


def write_partitioned_versioned(
    df: DataFrame,
    root: str,
    bucket_col: str = "s",
    n_buckets: int = 64,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
) -> int:
    """``write_partitioned`` into the next version dir of a versioned
    table root; returns the committed version number. Any uncommitted
    residue of a crashed writer at the same version is ignored by
    readers (no _SUCCESS) and overwritten here."""
    spark = df.sparkSession
    vs = committed_versions(spark, root)
    v = (vs[-1] + 1) if vs else 0
    write_partitioned(
        df, f"{root}/v={v}", bucket_col=bucket_col, n_buckets=n_buckets,
        sort_cols=sort_cols, fmt=fmt, mode="overwrite",
    )
    return v


def read_partitioned_current(spark, root: str, fmt: str = "parquet") -> DataFrame:
    """The current (= highest committed) version of a versioned table."""
    vs = committed_versions(spark, root)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {root}")
    return getattr(spark.read, fmt)(f"{root}/v={vs[-1]}")


def compact_partitioned_versioned(
    spark,
    root: str,
    sort_cols: list[str] | None = None,
    fmt: str = "parquet",
    keep: int = 2,
) -> int:
    """Object-store-safe compaction: rewrite the current version so each
    bucket dir holds one file again, commit it as the NEXT version, then
    prune all but the newest ``keep`` committed versions; returns the
    file count before compaction.

    Crash contract (strictly stronger than the rename swap's): the new
    version is invisible until its _SUCCESS lands, so a crash at ANY
    point leaves readers on the old complete version; ``keep >= 2``
    retains the previous version so a reader that resolved "current"
    just before the commit still reads a complete table. Re-running
    after a crash simply writes the next version number — no residue to
    heal. This is the manifest-swap semantics of Iceberg's
    ``rewriteDataFiles`` + snapshot expiry, expressed with nothing but
    listings and immutable version dirs."""
    vs = committed_versions(spark, root)
    if not vs:
        raise FileNotFoundError(f"no committed versions under {root}")
    cur = f"{root}/v={vs[-1]}"
    fs, _, jvm = _fs_for(spark, root)
    glob_path = jvm.org.apache.hadoop.fs.Path(f"{cur}/bucket=*/*")
    before = len(fs.globStatus(glob_path))
    df = getattr(spark.read, fmt)(cur)
    out = df.repartition(F.col("bucket"))
    if sort_cols:
        out = out.sortWithinPartitions("bucket", *sort_cols)
    getattr(out.write.mode("overwrite").partitionBy("bucket"), fmt)(
        f"{root}/v={vs[-1] + 1}"
    )
    for v in committed_versions(spark, root)[:-keep]:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{root}/v={v}"), True)
    return before
