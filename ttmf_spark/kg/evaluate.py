"""Evaluation operators (reference `Model1.py` test harness + `find_errors.py`).

- classification_accuracy (A8, Model1.py:478-498): fraction of labeled
  pairs on the right side of conf = 0.5 (argmax of the 2-way softmax).
- pr_sweep (A9, Model1.py:543-586): P/R/F over thresholds 0.01..1.0 step
  0.02 in ONE pass — the reference loops over the result list 50 times;
  we cross-join 50 threshold literals against per-row flags and aggregate
  (tiny fan-out, single shuffle).
- link_prediction_ranks (W4, Model1.py:658-741): rank of the true tail
  among all candidate corruptions by descending confidence; raw and
  filtered (gold corruptions excluded via anti-join J7); Hits@k + mean
  rank per variant.
- error_report: find_errors.py P5/W5 — see pipeline.lowest_confidence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def classification_accuracy(scored_pairs: DataFrame) -> DataFrame:
    """(conf, flag) -> single-row accuracy: tag = conf >= 0.5 vs flag."""
    return scored_pairs.agg(
        F.avg(
            F.when(
                ((F.col("conf") >= 0.5) & (F.col("flag") == 1))
                | ((F.col("conf") < 0.5) & (F.col("flag") == -1)),
                1.0,
            ).otherwise(0.0)
        ).alias("accuracy"),
        F.count("*").alias("n"),
    )


def pr_sweep(
    scored_pairs: DataFrame, start: float = 0.01, stop: float = 1.0, step: float = 0.02
) -> DataFrame:
    """(conf, flag) -> (threshold, precision, recall, f1) per threshold.

    Reference epsilon guards preserved: denominators carry +1e-5 seeds
    (Model1.py:556-557) and F adds +1e-5 (Model1.py:574).
    """
    spark = scored_pairs.sparkSession
    ths = [round(start + i * step, 6) for i in range(int((stop - start) / step) + 1)]
    th_df = spark.createDataFrame([(t,) for t in ths], ["threshold"])
    joined = scored_pairs.select("conf", "flag").crossJoin(F.broadcast(th_df))
    agg = joined.groupBy("threshold").agg(
        F.sum(F.when((F.col("conf") >= F.col("threshold")) & (F.col("flag") == 1), 1.0).otherwise(0.0)).alias("tp"),
        F.sum(F.when(F.col("conf") >= F.col("threshold"), 1.0).otherwise(0.0)).alias("pred_pos"),
        F.sum(F.when(F.col("flag") == 1, 1.0).otherwise(0.0)).alias("pos"),
    )
    p = F.col("tp") / (F.col("pred_pos") + 1e-5)
    r = F.col("tp") / (F.col("pos") + 1e-5)
    return agg.select(
        "threshold",
        p.alias("precision"),
        r.alias("recall"),
        (2 * p * r / (p + r + 1e-5)).alias("f1"),
    ).orderBy("threshold")


def link_prediction_ranks(
    scored_candidates: DataFrame,
    gold: DataFrame | None = None,
) -> DataFrame:
    """Candidate sets (h, r, t, conf, is_true) -> per-query rank of truth.

    ``scored_candidates``: for each (h, r) query, all candidate tails with
    confidence and an ``is_true`` marker. ``gold``: known-true (h, r, t)
    triples to exclude (filtered ranking, J7); pass None for raw.
    Returns (h, r, rank).
    """
    cands = scored_candidates
    if gold is not None:
        known = gold.select("h", "r", "t").withColumn("_gold", F.lit(True))
        cands = (
            cands.join(known, ["h", "r", "t"], "left")
            .filter(F.col("is_true") | F.col("_gold").isNull())
            .drop("_gold")
        )
    w = Window.partitionBy("h", "r").orderBy(F.col("conf").desc(), F.col("t").asc())
    ranked = cands.withColumn("rank", F.row_number().over(w))
    return ranked.filter(F.col("is_true")).select("h", "r", "rank")


def rank_metrics(ranks: DataFrame) -> DataFrame:
    """(rank) -> hits@1, hits@10, mean rank, MRR (one row)."""
    return ranks.agg(
        F.avg(F.when(F.col("rank") <= 1, 1.0).otherwise(0.0)).alias("hits1"),
        F.avg(F.when(F.col("rank") <= 10, 1.0).otherwise(0.0)).alias("hits10"),
        F.avg(F.col("rank").cast("double")).alias("mean_rank"),
        F.avg(1.0 / F.col("rank")).alias("mrr"),
    )


def calibration_table(labeled: DataFrame, n_bins: int = 10) -> DataFrame:
    """Reliability diagram data over labeled (conf, flag) pairs: per
    confidence bin, the example count, positive count, mean confidence,
    and empirical positive rate — the calibration check run next to the
    A8 accuracy / A9 P-R sweep before trusting confidences as
    probabilities (the reference prints accuracy only; calibration is
    the production-grade extension of the same labeled-pair scan).

    One map-side-combinable agg over `floor(conf * n_bins)` (top edge
    clamped into the last bin); dim-sized output.
    """
    b = F.least(
        F.floor(F.col("conf") * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    return (
        labeled.withColumn("bin", b)
        .groupBy("bin")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("flag") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_pos"),
            F.round(F.avg("conf"), 6).alias("mean_conf"),
            F.round(
                F.avg(F.when(F.col("flag") == 1, 1.0).otherwise(0.0)), 6
            ).alias("pos_rate"),
        )
    )


def rank_metrics_by(ranks: DataFrame, keys: DataFrame, on: str = "r") -> DataFrame:
    """W4 metrics sliced by a dim-sized key table (e.g. the Bordes
    relation category from graph.relation_profile): (key..., n_queries,
    hits1, hits10, mean_rank, mrr) — the standard FB15k-style breakdown
    (1-1 relations rank far better than N-N; an aggregate-only metric
    hides that). ``keys`` must be dim-sized; it is broadcast onto the
    rank rows so nothing reshuffles.
    """
    group_cols = [c for c in keys.columns if c != on]
    j = ranks.join(F.broadcast(keys), on)
    return j.groupBy(*group_cols).agg(
        F.count("*").alias("n_queries"),
        F.round(F.avg(F.when(F.col("rank") <= 1, 1.0).otherwise(0.0)), 6).alias("hits1"),
        F.round(F.avg(F.when(F.col("rank") <= 10, 1.0).otherwise(0.0)), 6).alias("hits10"),
        F.round(F.avg(F.col("rank").cast("double")), 6).alias("mean_rank"),
        F.round(F.avg(1.0 / F.col("rank")), 6).alias("mrr"),
    )
