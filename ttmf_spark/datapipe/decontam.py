"""Benchmark decontamination: flag training documents whose word-n-gram
overlap with a held-out evaluation/benchmark set exceeds a threshold.

This is the standard pre-training hygiene pass (the "13-gram overlap"
check of GPT-3 appendix C / the Dolma decontamination stage, shrunk to
n=3 here because the synthetic fixture corpus draws from a ~30-word
vocabulary): any training document that shares too many distinct
n-grams with any benchmark document is quarantined before training.

Scale shape (100 TB corpus, dim-sized benchmark):

- the benchmark side is ALWAYS small (benchmarks are thousands of docs,
  not billions) -> its distinct-shingle set is a broadcast dim table;
- the training side explodes to (doc_id, shingle) rows and probes that
  broadcast in a single left join — the token-level rows NEVER shuffle;
- the per-doc rollup groups by doc_id, and a document's shingle rows are
  co-located within their scan partition (explode preserves locality),
  so map-side partial aggregation collapses to ~1 row per doc before
  the only exchange in the plan.

No UDFs anywhere — shingling is the same built-in array-expression
pipeline as datapipe.dedup.shingles, so the whole op stays inside
whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ttmf_spark.datapipe.dedup import shingles, u60


def contamination_scores(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    tau: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_shingles, n_hit, contamination, contaminated) per
    training document.

    ``n_shingles``: distinct word n-grams of the training doc;
    ``n_hit``: how many of those also occur in ANY benchmark doc;
    ``contamination`` = n_hit / n_shingles (rounded to 6 dp so the
    DuckDB twin agrees bit-for-bit); ``contaminated`` = contamination
    >= tau (compared on the rounded value for the same reason).

    Documents shorter than ``n`` tokens contribute their full token
    string as a single degenerate shingle (dedup.shingles semantics).
    Every training doc emits exactly one output row: docs with NO
    shingles at all (empty/whitespace-only text) come back with
    n_shingles = n_hit = 0, contamination 0.0, contaminated false —
    an empty doc is clean, not silently missing (callers anti-join on
    this output; a dropped row would misclassify).
    """
    train_sh = shingles(train_docs, text_col, id_col, n)
    eval_sh = (
        shingles(eval_docs, text_col, id_col, n)
        .select("shingle")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = train_sh.join(F.broadcast(eval_sh), "shingle", "left")
    agg = joined.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count("_hit").alias("n_hit"),
    )
    per_doc = train_docs.select(id_col).join(agg, id_col, "left").select(
        id_col,
        F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
        F.coalesce("n_hit", F.lit(0)).alias("n_hit"),
    )
    contamination = F.round(
        F.when(F.col("n_shingles") > 0, F.col("n_hit") / F.col("n_shingles")).otherwise(
            F.lit(0.0)
        ),
        6,
    )
    return per_doc.select(
        id_col,
        "n_shingles",
        "n_hit",
        contamination.alias("contamination"),
        (contamination >= tau).alias("contaminated"),
    )


def bloom_contamination(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    m_bits: int = 1024,
    k_hashes: int = 3,
    n: int = 3,
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Bloom-filter decontamination with built-in truth QA.

    The 100 TB story for `contamination_scores`: when even the
    benchmark's distinct-shingle set is too wide to broadcast as strings
    (memorized web dumps of the eval set, 13-gram strings), fold it into
    an ``m_bits``-slot Bloom filter (Bloom 1970) and probe THAT — the
    broadcast side shrinks from |shingles| strings to at most m_bits
    integers, at the cost of one-sided false positives (quarantining a
    clean doc is safe; missing a contaminated one is not, and a Bloom
    filter can't do that by construction).

    Per training doc: (doc_id, n_shingles, n_hit_exact, n_hit_bloom,
    n_false_pos) where ``n_hit_bloom >= n_hit_exact`` always (no false
    negatives) and ``n_false_pos = n_hit_bloom - n_hit_exact`` is the QA
    column — the gate that tells you what error (m_bits, k_hashes) buys
    before you drop the exact join at scale. Expected FP rate
    ~ (1 - e^{-k*S/m})^k for S eval shingles.

    Plan shape: the filter is built as a distinct set-bit table (<=
    m_bits rows) and probed with ``k_hashes`` broadcast LEFT joins over
    the (doc_id, shingle) rows — the training side NEVER shuffles until
    the per-doc rollup (the same single exchange as
    contamination_scores). Deterministic under any partitioning: seeded
    hashes, exact integer counters.
    """
    train_sh = shingles(train_docs, text_col, id_col, n)
    eval_sh = (
        shingles(eval_docs, text_col, id_col, n).select("shingle").distinct()
    )

    def _pos(i: int):
        return F.pmod(
            u60(F.col("shingle"), seed=seed + i, fn=hash_fn), F.lit(m_bits)
        ).cast("int")

    bits = (
        eval_sh.select(
            F.explode(F.array(*[_pos(i) for i in range(k_hashes)])).alias("pos")
        )
        .distinct()
        .withColumn("_set", F.lit(1))
    )

    probed = train_sh
    for i in range(k_hashes):
        probed = probed.join(
            F.broadcast(bits.withColumnRenamed("_set", f"_b{i}")),
            _pos(i) == F.col("pos"),
            "left",
        ).drop("pos")
    bloom_hit = None
    for i in range(k_hashes):
        flag = F.col(f"_b{i}").isNotNull()
        bloom_hit = flag if bloom_hit is None else (bloom_hit & flag)
    exact = eval_sh.withColumn("_hit", F.lit(1))
    probed = probed.join(F.broadcast(exact), "shingle", "left")

    agg = probed.groupBy(id_col).agg(
        F.count("*").alias("n_shingles"),
        F.count("_hit").alias("n_hit_exact"),
        F.sum(bloom_hit.cast("long")).alias("n_hit_bloom"),
    )
    return (
        train_docs.select(id_col)
        .join(agg, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_shingles", F.lit(0)).alias("n_shingles"),
            F.coalesce("n_hit_exact", F.lit(0)).alias("n_hit_exact"),
            F.coalesce("n_hit_bloom", F.lit(0)).alias("n_hit_bloom"),
            (
                F.coalesce("n_hit_bloom", F.lit(0))
                - F.coalesce("n_hit_exact", F.lit(0))
            ).alias("n_false_pos"),
        )
    )


def split_train_eval(
    docs: DataFrame, modulus: int = 17, id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic stand-in benchmark split: doc_id % modulus == 0 is
    the "benchmark" slice, the rest is the training corpus.

    In production the benchmark set is an external table (MMLU/GSM8K/…
    prompts); the modulus split exists so the driver query and its SQL
    twin can both reconstruct the same two sides from one input table.
    """
    is_eval = (F.col(id_col) % modulus) == 0
    return docs.filter(~is_eval), docs.filter(is_eval)
