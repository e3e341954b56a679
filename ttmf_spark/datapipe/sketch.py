"""KMV (k-minimum-values) distinct-cardinality sketch — the
deterministic cousin of HyperLogLog (Bar-Yossef et al. 2002; Beyer et
al., "On Synopses for Distinct-Value Estimation Under Multiset
Operations", SIGMOD 2007): hash every distinct value to (0, 2^60),
keep the k smallest hashes, estimate |D| ≈ (k-1) * 2^60 / h_(k).

Why KMV instead of Spark's built-in approx_count_distinct (HLL++):
the KMV estimate is a PURE FUNCTION of the value set — same input,
same estimate, on any engine and any partitioning — so the DuckDB twin
gates it exactly, and sketches of different partitions/days merge by
"union hashes, re-take k smallest" (the property stratified_sample
already leans on). HLL registers are implementation-defined and can't
be cross-engine-gated.

The gated query doubles as the sketch's own QA: it reports the exact
distinct count next to the estimate and the relative error — at 100 TB
you drop the exact column (that's the point of the sketch) after this
gate has told you what error k buys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ttmf_spark.datapipe.dedup import shingles, u60


def kmv_distinct_shingles(
    docs: DataFrame,
    k: int = 64,
    n: int = 3,
    n_salts: int = 64,
    seed: int = 0,
    text_col: str = "text",
    source_col: str = "source",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(source, n_exact, est, rel_err): per-source distinct word-n-gram
    (shingle) cardinality, exact and KMV-estimated — the corpus profile
    that sizes dedup indexes (minhash/jaccard work per distinct shingle)
    before building them.

    Skew shape: the k smallest hashes per source are found with the same
    two-phase bounded top-k as stratified_sample (top-k within
    (source, salt-bucket), then top-k of the <= k*n_salts survivors) —
    a source owning half the corpus never sorts in one task. The exact
    count is one distinct + count aggregation (map-side combinable
    after the distinct); it exists for the QA column only.

    Estimator: est = (k-1) * 2^60 / h_(k) when the source has >= k
    distinct tokens, else the exact count (the sketch IS exact below
    k). All arithmetic is one integer-to-double cast and one division —
    byte-identical across engines.
    """
    toks = (
        shingles(docs, text_col, source_col, n)
        .withColumnRenamed("shingle", "tok")
        .distinct()
        .withColumn("_u", u60(F.col("tok"), seed=seed, fn=hash_fn))
    ).localCheckpoint(eager=True)  # consumed by the sketch AND the exact count
    exact = toks.groupBy(source_col).agg(F.count("*").alias("n_exact"))
    d = toks.withColumn("_salt", F.pmod(F.col("_u"), F.lit(n_salts)))
    w1 = Window.partitionBy(source_col, "_salt").orderBy("_u", "tok")
    survivors = d.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy(source_col).orderBy("_u", "tok")
    sk = (
        survivors.withColumn("_r", F.row_number().over(w2))
        .filter(F.col("_r") <= k)
        .groupBy(source_col)
        .agg(F.max("_u").alias("_hk"), F.count("*").alias("_have"))
    )
    est = F.when(
        F.col("_have") < k, F.col("n_exact").cast("double")
    ).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("_hk").cast("double")
    )
    return (
        exact.join(sk, source_col)
        .withColumn("est", F.round(est, 6))
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact"), 6
            ),
        )
        .select(source_col, "n_exact", "est", "rel_err")
    )
