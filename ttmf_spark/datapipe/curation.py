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
