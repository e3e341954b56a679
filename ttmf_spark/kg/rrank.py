"""Resource-allocation (RR) features + confidence (reference
`ResourceRankConfidence.py`), as joins + column expressions — no UDF.

Stage outputs:

- per-head thresholds over dev-pair rank values (rrcThreshold,
  ResourceRankConfidence.py:81-100): RR variant of the W1 scan
  (descending sort, default max+0.01), rank value 0.0 when the tail is
  outside the head's subgraph;
- per-(core, node) feature table (get_features_2file,
  ResourceRankConfidence.py:198-269):
  [f, in(core), out(core), in(node), out(node), depth] where
  f = 1/(1+exp(-25 (pr - theta_core))), theta default 0.5, and — reference
  quirk — f uses the *calibrated* value even though every subgraph node has
  a pr (get_f:136-152);
- per-triple feature lookup (get_rrank_features, PrecessData.py:232-244):
  left join on (h==core, t==node), default [0,0,0,0,0,10000];
- standalone RR confidence (get_RRankConfidence,
  ResourceRankConfidence.py:105-132): f as above but 0.001 when the tail
  is not in the head's subgraph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ttmf_spark.kg.threshold import best_threshold

RR_DEFAULT_FEATURES = [0.0, 0.0, 0.0, 0.0, 0.0, 10000.0]  # PrecessData.py:241


def rr_thresholds(dev_pairs: DataFrame, ranks: DataFrame) -> DataFrame:
    """Per-head best-accuracy threshold over dev (rank, flag) pairs.

    ``dev_pairs``: (h, t, r, flag, seq) id-encoded labeled pairs.
    ``ranks``: (core, node, pr). Missing (h, t) -> rank 0.0
    (ResourceRankConfidence.py:88-91).
    Returns (h, threshold).
    """
    scored = (
        dev_pairs.join(
            ranks.select(
                F.col("core").alias("h"), F.col("node").alias("t"), F.col("pr")
            ),
            ["h", "t"],
            "left",
        )
        .withColumn("score", F.coalesce("pr", F.lit(0.0)))
        .select("h", "score", "flag", "seq")
    )
    return best_threshold(scored, "h", ascending=False).withColumnRenamed(
        "threshold", "rr_threshold"
    )


def _calibrated(pr_col, theta_col):
    return 1.0 / (1.0 + F.exp(-25.0 * (pr_col - theta_col)))


def rr_feature_table(
    ranks: DataFrame,
    degrees: DataFrame,
    depths: DataFrame,
    thresholds: DataFrame,
) -> DataFrame:
    """(core, node) -> 6 features [f, in_core, out_core, in_node, out_node, depth].

    ``ranks`` (core, node, pr); ``degrees`` (core, node, in_deg, out_deg);
    ``depths`` (core, node, depth); ``thresholds`` (h, rr_threshold),
    dim-sized -> broadcast. theta default 0.5
    (ResourceRankConfidence.py:138-143).
    """
    th = F.broadcast(
        thresholds.select(F.col("h").alias("core"), F.col("rr_threshold"))
    )
    core_deg = degrees.filter(F.col("core") == F.col("node")).select(
        "core",
        F.col("in_deg").alias("in_core"),
        F.col("out_deg").alias("out_core"),
    )
    return (
        ranks.join(th, "core", "left")
        .withColumn(
            "f", _calibrated(F.col("pr"), F.coalesce("rr_threshold", F.lit(0.5)))
        )
        .join(degrees, ["core", "node"], "left")
        .join(depths, ["core", "node"], "left")
        .join(core_deg, "core", "left")
        .select(
            "core",
            "node",
            "f",
            F.coalesce("in_core", F.lit(0)).cast("double").alias("in_core"),
            F.coalesce("out_core", F.lit(0)).cast("double").alias("out_core"),
            F.coalesce("in_deg", F.lit(0)).cast("double").alias("in_node"),
            F.coalesce("out_deg", F.lit(0)).cast("double").alias("out_node"),
            F.coalesce("depth", F.lit(0)).cast("double").alias("depth"),
        )
    )


def attach_rr_features(triples: DataFrame, features: DataFrame) -> DataFrame:
    """Triple stream (h, t, ...) + feature table -> rr_features array[6].

    Left join on (h==core, t==node); default [0,0,0,0,0,10000]
    (PrecessData.py:232-244). The feature table is partitioned by core —
    the join key prefix — so at scale this co-partitions with a
    subject-bucketed triple table.
    """
    f = features.select(
        F.col("core").alias("h"),
        F.col("node").alias("t"),
        F.array("f", "in_core", "out_core", "in_node", "out_node", "depth").alias(
            "_rr"
        ),
    )
    default = F.array(*[F.lit(x) for x in RR_DEFAULT_FEATURES])
    return (
        triples.join(f, ["h", "t"], "left")
        .withColumn("rr_features", F.coalesce("_rr", default))
        .drop("_rr")
    )


def rr_confidence(
    pairs: DataFrame, ranks: DataFrame, thresholds: DataFrame
) -> DataFrame:
    """Standalone RR confidence per pair (h, t): 0.001 if t unreached, else
    sigmoid(25 (pr - theta_h)) (ResourceRankConfidence.py:105-132)."""
    th = F.broadcast(thresholds.select(F.col("h"), F.col("rr_threshold")))
    r = ranks.select(F.col("core").alias("h"), F.col("node").alias("t"), "pr")
    return (
        pairs.join(r, ["h", "t"], "left")
        .join(th, "h", "left")
        .withColumn(
            "rr_conf",
            F.when(F.col("pr").isNull(), 0.001).otherwise(
                _calibrated(F.col("pr"), F.coalesce("rr_threshold", F.lit(0.5)))
            ),
        )
        .drop("pr", "rr_threshold")
    )
