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
