"""DSIR-style data selection: hashed n-gram importance resampling
(Xie et al., "Data Selection for Language Models via Importance
Resampling", NeurIPS 2023). Score every raw document by how much more
likely its hashed n-gram bag is under a TARGET domain's bucket model
than under the raw-corpus model, and keep the high scorers — the
standard recipe for "make my 100 TB crawl look like Wikipedia".

Why this scales where classifier filtering struggles: the feature space
is a FIXED number of hash buckets (not a vocabulary), so the "model" is
one n_buckets-row table built by two map-side-combinable aggregations
and broadcast to the token stream — the corpus never shuffles, and
adding data never grows the model.

Numerics: the per-bucket log-ratio ln(p_b) - ln(q_b) is rounded to
1e-9 FIXED-POINT integers once, model-side; every cross-row sum after
that is exact integer arithmetic (the kg/graph.py PCRA contract) —
a float sum of logs is order-dependent in its last bit and a
distributed aggregation has no stable order. The single ln() call per
bucket is the only libm dependence, and a cross-engine ulp there moves
lambda by ~1e-16 — seven orders below the 0.5e-9 rounding quantum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ttmf_spark.datapipe.dedup import u60

_SCALE = 10**9


def _grams(docs: DataFrame, ns: tuple[int, ...], text_col: str, id_col: str):
    """(id, gram): every word-n-gram occurrence for each n in ``ns``
    (counts, not per-doc distinct — DSIR models bag frequencies)."""
    toks = F.filter(
        F.split(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "), " "),
        lambda t: t != "",
    )
    d = docs.select(F.col(id_col), toks.alias("_toks")).withColumn(
        "_n", F.size("_toks")
    )
    def _gram_expr(n: int):
        # NB: the transform lambda must stay unary — pyspark treats a
        # second parameter (even defaulted) as the array-index argument
        return F.when(
            F.col("_n") >= n,
            F.transform(
                F.sequence(F.lit(0), F.col("_n") - n),
                lambda i: F.array_join(F.slice("_toks", i + 1, n), " "),
            ),
        ).otherwise(F.array())

    per_n = [_gram_expr(n) for n in ns]
    return d.select(
        id_col, F.explode(F.flatten(F.array(*per_n))).alias("gram")
    ).filter(F.col("gram") != "")


def dsir_scores(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    n_buckets: int = 1024,
    ns: tuple[int, ...] = (1, 2),
    seed: int = 0,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """(doc_id, n_grams, logw, selected) per raw document.

    ``logw`` = sum over the doc's hashed-n-gram occurrences of
    ln(p_bucket) - ln(q_bucket), where p is the Laplace-smoothed bucket
    distribution of the TARGET docs and q that of the raw corpus;
    ``selected`` = logw > 0 (more target-like than corpus-average — the
    deterministic thresholding variant; production resampling adds
    Gumbel noise, which is exactly the seeded-draw machinery
    curation.weighted_sample already provides on top of any weight
    column). Docs with no grams score 0.0 / not selected, one output
    row per raw doc regardless (callers anti-join on this table).

    Plan: two bucket-count aggs (map-side combinable, n_buckets rows
    each) -> one broadcast model table -> per-gram int lookup ->
    exact-integer per-doc sum. The raw side shuffles once, at the
    per-doc rollup.
    """
    raw_g = _grams(raw_docs, ns, text_col, id_col).withColumn(
        "bucket",
        F.pmod(u60(F.col("gram"), seed=seed, fn=hash_fn), F.lit(n_buckets)).cast(
            "int"
        ),
    )
    tgt_g = _grams(target_docs, ns, text_col, id_col).withColumn(
        "bucket",
        F.pmod(u60(F.col("gram"), seed=seed, fn=hash_fn), F.lit(n_buckets)).cast(
            "int"
        ),
    )
    # One pass over each side: the n_buckets-row count tables come to the
    # driver ONCE and tt/tr are their sums — no separate .count() actions
    # re-running the gram explode+hash over the (nominally 100 TB) corpus.
    ct = {
        r["bucket"]: r["_ct"]
        for r in tgt_g.groupBy("bucket").agg(F.count("*").alias("_ct")).collect()
    }
    cr = {
        r["bucket"]: r["_cr"]
        for r in raw_g.groupBy("bucket").agg(F.count("*").alias("_cr")).collect()
    }
    tt = sum(ct.values())
    tr = sum(cr.values())
    # dense model: every bucket gets a row (smoothing gives unseen
    # buckets a real ratio), so the gram-side join is an inner equi-join.
    # ln() runs driver-side in Python — same libm class as the SQL twin,
    # and the 1e-9 fixed-point rounding absorbs any ulp (docstring).
    import math

    def _round_half_away(x: float) -> int:
        # Spark/DuckDB ROUND(x, 0) semantics (half away from zero), not
        # Python's banker's rounding
        return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))

    model_rows = [
        (
            b,
            _round_half_away(
                (
                    math.log((ct.get(b, 0) + 1) / float(tt + n_buckets))
                    - math.log((cr.get(b, 0) + 1) / float(tr + n_buckets))
                )
                * _SCALE
            ),
        )
        for b in range(n_buckets)
    ]
    lam = raw_docs.sparkSession.createDataFrame(
        model_rows, "bucket int, lam_fp long"
    )
    per_doc = (
        raw_g.join(F.broadcast(lam), "bucket")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_grams"), F.sum("lam_fp").alias("_s"))
    )
    return (
        raw_docs.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.round(
                F.coalesce("_s", F.lit(0)) / F.lit(float(_SCALE)), 6
            ).alias("logw"),
            (F.coalesce("_s", F.lit(0)) > 0).alias("selected"),
        )
    )
