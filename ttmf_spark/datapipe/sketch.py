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


def cms_heavy_hitters(
    events: DataFrame,
    key_col: str = "user_id",
    phi_num: int = 1,
    phi_den: int = 125,
    width: int = 256,
    depth: int = 3,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Heavy-hitter shortlist from the Count-Min sketch: keys whose CMS
    estimate reaches ``phi_num/phi_den`` of the stream length.

    (key, n_exact, est, is_true_hh), flagged rows only. Because est >=
    n_exact always, the shortlist is a SUPERSET of the true phi-heavy
    hitters — CMS can add spurious keys but never drop a real one (the
    property that makes sketch-then-verify safe: the exact second pass
    only needs to touch the shortlist). ``is_true_hh`` is the QA column
    (false => a collision artifact of (width, depth)).

    The phi threshold is compared in EXACT INTEGER arithmetic
    (est * phi_den >= phi_num * N) — a float phi would round differently
    between engines (DuckDB parses 0.008 as DECIMAL, Spark as double)
    and flip boundary keys. Scale: inherits cms_counts' shape (one
    model-sized counter table broadcast onto the key side) plus one
    1-row stream-length broadcast.
    """
    est = cms_counts(events, key_col, width, depth, seed, hash_fn)
    total = events.groupBy().agg(F.count("*").alias("_n"))
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("est") * phi_den >= phi_num * F.col("_n"))
        .select(
            key_col,
            "n_exact",
            "est",
            (F.col("n_exact") * phi_den >= phi_num * F.col("_n")).alias(
                "is_true_hh"
            ),
        )
    )


def cms_counts(
    events: DataFrame,
    key_col: str = "user_id",
    width: int = 8,
    depth: int = 3,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Count-Min sketch frequency estimates with built-in truth QA.

    (key, n_exact, est, overcount): ``est`` is the classic CMS estimate
    (Cormode & Muthukrishnan 2005) — min over ``depth`` rows of the
    (seeded-hash % width) cell counters — and is >= n_exact by
    construction (one-sided error; expected overcount ~ N/width per
    row). Like the KMV gate above, the exact column IS the QA: this
    query tells you what error (width, depth) buys before you drop the
    exact count at scale.

    Scale: the sketch is a groupBy onto width*depth cells — partials
    combine map-side into a model-sized table (THE point of CMS: the
    counter table is O(w*d), not O(|keys|)), broadcast to the estimate
    join. The key side here enumerates all distinct keys for the QA
    gate; at 100 TB the key side is whatever candidate stream needs
    estimates (a sample, a heavy-hitter shortlist), not an enumeration.
    Deterministic under any partitioning: counters are exact integer
    sums, hashes are seeded.
    """
    key_s = F.col(key_col).cast("string")

    def _cells():
        # unbound column exprs: resolve against events and keys alike
        return F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        F.pmod(
                            u60(key_s, seed=seed + d, fn=hash_fn), F.lit(width)
                        )
                        .cast("int")
                        .alias("cell"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("dc")

    sketch = (
        events.select(_cells())
        .groupBy("dc.d", "dc.cell")
        .agg(F.count("*").alias("c"))
    )
    keys = events.groupBy(key_col).agg(F.count("*").alias("n_exact"))
    key_cells = keys.select(key_col, "n_exact", _cells()).select(
        key_col, "n_exact", "dc.d", "dc.cell"
    )
    return (
        key_cells.join(F.broadcast(sketch), ["d", "cell"])
        .groupBy(key_col, "n_exact")
        .agg(F.min("c").alias("est"))
        .select(
            key_col,
            "n_exact",
            "est",
            (F.col("est") - F.col("n_exact")).alias("overcount"),
        )
    )


def sampled_quantiles(
    docs: DataFrame,
    k: int = 64,
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95),
    n_salts: int = 16,
    seed: int = 0,
    group_col: str = "lang",
    value_col: str = "n_chars",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Hash-sample quantile sketch with built-in truth QA.

    (grp, n_docs, n_sample, pct, est, exact, abs_err): per group, the
    type-7 quantiles of a bottom-k-by-hash row sample next to the exact
    quantiles. textstats.length_quantiles documents the production gap
    this fills: ``percentile`` buffers whole groups (hot spot at 10^10
    docs/group) and ``percentile_approx``'s t-digest is not
    engine-portable — a bottom-k hash sample IS: it's a pure function of
    the id set (same rows chosen on any engine, any partitioning), it
    merges across shards/days by "union, re-take k smallest" (the KMV
    property), and its estimate error is the textbook O(1/sqrt(k)).
    The exact columns are the QA gate you drop at scale.

    Skew shape: the k smallest hashes per group are found with the same
    two-phase bounded top-k as kmv_distinct_shingles (top-k within
    (grp, salt-bucket), then top-k of the <= k*n_salts survivors) — a
    group owning the whole corpus never sorts in one task. The exact
    side is one percentile aggregate per group (the fixture-scale QA).
    """
    d = docs.select(
        F.col(group_col).alias("grp"),
        F.col(value_col).alias("v"),
        F.col(id_col).alias("_id"),
    ).withColumn(
        "_u", u60(F.col("_id").cast("string"), seed=seed, fn=hash_fn)
    )
    arr = ", ".join(str(p) for p in probs)
    exact = d.groupBy("grp").agg(
        F.count("*").alias("n_docs"),
        F.expr(f"percentile(v, array({arr}))").alias("_qe"),
    )
    d2 = d.withColumn("_salt", F.pmod(F.col("_u"), F.lit(n_salts)))
    w1 = Window.partitionBy("grp", "_salt").orderBy("_u", "_id")
    surv = d2.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy("grp").orderBy("_u", "_id")
    samp = surv.withColumn("_r", F.row_number().over(w2)).filter(
        F.col("_r") <= k
    )
    est = samp.groupBy("grp").agg(
        F.count("*").alias("n_sample"),
        F.expr(f"percentile(v, array({arr}))").alias("_qs"),
    )
    j = exact.join(est, "grp")
    entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(int(round(p * 100))).alias("pct"),
                    F.round(F.col("_qs")[i], 6).alias("est"),
                    F.round(F.col("_qe")[i], 6).alias("exact"),
                )
                for i, p in enumerate(probs)
            ]
        )
    )
    return j.select("grp", "n_docs", "n_sample", entries.alias("e")).select(
        "grp",
        "n_docs",
        "n_sample",
        "e.pct",
        "e.est",
        "e.exact",
        F.round(F.abs(F.col("e.est") - F.col("e.exact")), 6).alias("abs_err"),
    )
