"""Curation verdict: the final keep/drop gate of a training-data
pipeline, composed from the already-verified per-document signals
(quality score, repetition/boilerplate fraction, exact-dup survivorship).

One row per document with a deterministic first-match reason in fixed
precedence (duplicate > low_quality > boilerplate > ok); the thresholds
are explicit arguments so a pipeline can sweep them. Everything is a
composition of existing operators — three dim-key equi-joins on doc_id
(broadcast or shuffle-on-id depending on size; all sides are
per-document aggregates, never token-level rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ttmf_spark.datapipe.dedup import exact_dedup
from ttmf_spark.datapipe.textstats import with_quality_score, with_repetition_stats


def curation_verdict(
    docs: DataFrame,
    q_min: float = 0.3,
    rep_max: float = 0.5,
) -> DataFrame:
    """(doc_id, quality, dup_3gram_frac, reason, keep).

    reason precedence: 'duplicate' (not the min-id survivor of its
    exact-fingerprint group) > 'low_quality' (quality < q_min, on the
    6-dp-rounded score so the SQL twin agrees at the boundary) >
    'boilerplate' (dup_3gram_frac > rep_max) > 'ok'. keep == (reason = ok).
    """
    q = with_quality_score(docs).select("doc_id", F.round("quality", 6).alias("quality"))
    r = with_repetition_stats(docs).select("doc_id", "dup_3gram_frac")
    surv = exact_dedup(docs).select("doc_id", F.lit(True).alias("_surv"))
    out = (
        docs.select("doc_id")
        .join(q, "doc_id")
        .join(r, "doc_id")
        .join(surv, "doc_id", "left")
    )
    reason = (
        F.when(F.col("_surv").isNull(), F.lit("duplicate"))
        .when(F.col("quality") < q_min, F.lit("low_quality"))
        .when(F.col("dup_3gram_frac") > rep_max, F.lit("boilerplate"))
        .otherwise(F.lit("ok"))
    )
    return out.select(
        "doc_id",
        "quality",
        "dup_3gram_frac",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


def stratified_sample(
    docs: DataFrame,
    k: int,
    seed: int = 0,
    n_salts: int = 64,
    hash_fn: str = "xxhash64",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-k-per-source deterministic sample: the k documents with
    the SMALLEST salted hash per source (all of them if the source has
    fewer), with their 1-based rank.

    The "minimum k hashes" rule makes the sample a pure function of the
    ids — stable under reruns, partitioning, and incremental growth
    (a new doc only enters the sample by evicting the current max, the
    same property KMV sketches rely on).

    Skew: a naive row_number() over (source) sorts the biggest source
    in ONE task — the classic hot-domain killer when one crawl domain
    is half the corpus. This runs two bounded phases instead: top-k
    within (source, salt-bucket) — ``n_salts`` ways parallel even for a
    single giant source — then top-k of the <= k*n_salts survivors per
    source. Both windows sort only bounded partitions; output is
    IDENTICAL to the naive rule (the global top-k is contained in the
    union of per-bucket top-ks).
    """
    from pyspark.sql.window import Window

    from ttmf_spark.datapipe.dedup import u60

    u = u60(F.col(id_col).cast("string"), seed=seed, fn=hash_fn)

    d = docs.select(source_col, id_col).withColumn("_u", u).withColumn(
        "_salt", F.pmod(F.col("_u"), F.lit(n_salts))
    )
    w1 = Window.partitionBy(source_col, "_salt").orderBy("_u", id_col)
    survivors = d.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy(source_col).orderBy("_u", id_col)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(id_col, source_col, "rank")
    )


def mixture_sample(
    docs: DataFrame,
    weights: dict[str, float],
    seed: int = 0,
    hash_fn: str = "xxhash64",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic domain-mixture (re)sampling: keep each document with
    its source's target probability, plus the 1/p importance weight.

    The training-mix step of a data pipeline ("web at 12%, code at 50%,
    …"): a per-source Bernoulli keep decided by a salted hash of the
    doc id — reproducible across runs, engines, and partitionings (no
    ``rand()``; the md5 variant is bit-identical in DuckDB). Returns
    the kept rows as (doc_id, source, p_keep, sample_weight) where
    sample_weight = 1/p_keep restores unbiased expectations downstream.

    ``weights`` SHOULD be multiples of 1/1024 — p*2^60 is then exact in
    a double, so the integer threshold compare carries no
    engine-dependent rounding. Sources absent from ``weights`` are
    dropped (p = 0).

    Scale: the weights table is dim-sized (one row per source/domain) ->
    broadcast inner join; the keep decision is a pure column predicate on
    the scan. Zero shuffles end to end, any corpus size.
    """
    from ttmf_spark.datapipe.dedup import u60

    spark = docs.sparkSession
    dim = spark.createDataFrame(
        [(s, float(p)) for s, p in sorted(weights.items())],
        f"{source_col} string, p_keep double",
    )
    u = u60(F.col(id_col).cast("string"), seed=seed, fn=hash_fn)
    # threshold = floor(p * 2^60) on BOTH engines (Spark cast truncates,
    # the SQL twin floors explicitly) — exact for dyadic weights and
    # parity-safe even for non-dyadic ones
    return (
        docs.join(F.broadcast(dim), source_col)
        .filter(u < (F.col("p_keep") * F.lit(float(1 << 60))).cast("long"))
        .select(
            id_col,
            source_col,
            "p_keep",
            F.round(F.lit(1.0) / F.col("p_keep"), 6).alias("sample_weight"),
        )
    )


def top_quality_per_source(
    docs: DataFrame,
    k: int,
    n_salts: int = 64,
    hash_fn: str = "xxhash64",
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Best-k documents per source by quality score — the "keep the best
    of each domain" curation step (quality from
    textstats.with_quality_score, rounded to 6 so the ordering is
    engine-portable; ties broken by doc_id asc).

    Same skew-safe two-phase top-k as stratified_sample: a naive
    row_number() over (source) sorts the biggest crawl domain in ONE
    task; here phase 1 ranks within (source, hash-salt bucket) and
    phase 2 ranks the <= k*n_salts survivors — identical output (the
    global top-k is contained in the union of per-bucket top-ks for ANY
    total order), bounded partitions throughout.
    """
    from pyspark.sql.window import Window

    from ttmf_spark.datapipe.dedup import u60
    from ttmf_spark.datapipe.textstats import with_quality_score

    q = with_quality_score(docs).select(
        id_col, source_col, F.round("quality", 6).alias("quality")
    )
    d = q.withColumn(
        "_salt",
        F.pmod(u60(F.col(id_col).cast("string"), seed=0, fn=hash_fn), F.lit(n_salts)),
    )
    order = [F.col("quality").desc(), F.col(id_col).asc()]
    w1 = Window.partitionBy(source_col, "_salt").orderBy(*order)
    survivors = d.withColumn("_r1", F.row_number().over(w1)).filter(
        F.col("_r1") <= k
    )
    w2 = Window.partitionBy(source_col).orderBy(*order)
    return (
        survivors.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select(id_col, source_col, "quality", "rank")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    seed: int = 5,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
) -> DataFrame:
    """Quality-weighted sampling WITHOUT replacement (Efraimidis-Spirakis
    exponential-draw rule): keep the k docs with the smallest
    key = -ln(u) / w, where u is the salted 60-bit uniform draw of the
    doc id mapped into (0, 1] and w = quality + 0.001 (strictly positive)
    — inclusion probability proportional to quality, the "sample the
    training mix by quality" step. Completes the sampling family:
    mixture (Bernoulli, weighted by source), stratified (uniform
    exact-k per source), top_quality (deterministic best), this
    (global weighted random).

    Determinism/parity: u is exact integer arithmetic on both engines;
    the key is rounded to 12 decimals before ranking (an engine's ln may
    differ in the last ulp) with doc_id as the tie-break, so the DuckDB
    twin orders identically. Global top-k = TakeOrderedAndProject — no
    full sort materializes.
    """
    from ttmf_spark.datapipe.dedup import u60
    from ttmf_spark.datapipe.textstats import with_quality_score

    q = with_quality_score(docs).select(
        id_col, "source", F.round("quality", 6).alias("quality")
    )
    u = (u60(F.col(id_col).cast("string"), seed=seed, fn=hash_fn) + 1) / F.lit(
        float(1 << 60)
    )
    key = F.round(-F.log(u) / (F.col("quality") + F.lit(0.001)), 12)
    return (
        q.withColumn("key", key)
        .orderBy(F.col("key").asc(), F.col(id_col).asc())
        .limit(k)
        .select(id_col, "source", "quality", "key")
    )


def shuffle_shards(
    docs: DataFrame,
    n_shards: int = 64,
    seed: int = 11,
    hash_fn: str = "xxhash64",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle + shard plan.

    The "shuffle the corpus before training" step of LLM data prep done
    as a PLAN, not a data move: every document draws a seeded 60-bit
    order key, a shard = draw(seed+1) % n_shards, and its position
    within the shard (order key asc, id tie-break). A loader that reads
    shards in shard order and rows in pos order sees a reproducible
    uniform permutation — no rand(), identical across runs, engines,
    and partitionings (the corpus-level twin of the W6 triple shuffle,
    kg/transe.py; reference analogue: TransE.java's per-epoch random
    triple order, re-expressed seeded).

    Scale: one hash exchange on shard + a per-shard sort; partitions
    are bounded at N/n_shards rows (pick n_shards ~ corpus/10M docs),
    never the single-task global sort a bare orderBy(hash) would be.
    """
    from pyspark.sql.window import Window

    from ttmf_spark.datapipe.dedup import u60

    sid = F.col(id_col).cast("string")
    d = (
        docs.select(id_col)
        .withColumn("_ord", u60(sid, seed=seed, fn=hash_fn))
        .withColumn(
            "shard",
            F.pmod(u60(sid, seed=seed + 1, fn=hash_fn), F.lit(n_shards)).cast("int"),
        )
    )
    w = Window.partitionBy("shard").orderBy(F.col("_ord").asc(), F.col(id_col).asc())
    return d.withColumn("pos", (F.row_number().over(w) - 1).cast("long")).select(
        id_col, "shard", "pos"
    )


def token_budget_plan(
    docs: DataFrame,
    budget: int,
    weights: dict[str, float],
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-source token accounting + epoch allocation for a token budget.

    The mixture-table planning step of training-data prep (the
    "how many passes of each source hit the budget" audit): given a
    total token budget and each source's target mixture weight, report
    what the source holds (n_docs, n_tokens) and what the plan asks of
    it — target_tokens = floor(budget * weight), epochs =
    target/available (>1 means the source repeats), full_passes =
    floor(epochs), tail_rate = the sampling rate of the final partial
    pass. Sources missing from ``weights`` are reported with weight 0,
    not dropped: the table IS the audit.

    Scale: token counting is the same codegen expression as doc_stats
    (map-side partial agg), the groupBy output is dim-sized (one row
    per source), the weights join is broadcast. One shuffle of
    dim-sized partials end to end at any corpus size.
    """
    from ttmf_spark.datapipe.textstats import with_token_counts

    spark = docs.sparkSession
    dim = spark.createDataFrame(
        [(s, float(p)) for s, p in sorted(weights.items())],
        f"{source_col} string, weight double",
    )
    per_src = (
        with_token_counts(docs, text_col)
        .groupBy(source_col)
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").cast("long").alias("n_tokens"))
    )
    return (
        per_src.join(F.broadcast(dim), source_col, "left")
        .withColumn("weight", F.coalesce(F.col("weight"), F.lit(0.0)))
        .withColumn(
            "target_tokens",
            F.floor(F.lit(float(budget)) * F.col("weight")).cast("long"),
        )
        # epochs from the already-floored integer target: both engines
        # divide the same exact integers, so round(., 6) agrees
        .withColumn(
            "epochs",
            F.round(
                F.col("target_tokens")
                / F.greatest(F.col("n_tokens"), F.lit(1)).cast("double"),
                6,
            ),
        )
        .withColumn("full_passes", F.floor("epochs").cast("long"))
        .withColumn("tail_rate", F.round(F.col("epochs") - F.col("full_passes"), 6))
        .select(
            source_col,
            "n_docs",
            "n_tokens",
            "weight",
            "target_tokens",
            "epochs",
            "full_passes",
            "tail_rate",
        )
    )
