"""Best-accuracy threshold scan (reference `TransConfidence.getThreshold`,
`ResourceRankConfidence.getThreshold`, `KGE/src/utils/TCDevItem.java:15-38`).

Reference semantics (TransConfidence.py:8-26 asc / ResourceRankConfidence.py
:61-79 desc):

  sort labeled (score, flag) pairs (stable; ties keep input order);
  threshold defaults to score[0] -/+ 0.01;
  for i in 1..n-1: cum += +1 if flag[i-1]==1 else -1;
                   if cum > max_so_far: threshold = (score[i]+score[i-1])/2
  i.e. the final threshold is the midpoint at the FIRST index attaining the
  global maximum of the prefix sum, if that maximum is > 0.

Pure window expressions — one shuffle on the group key, SQL-expressible
(DuckDB oracle in ttmf_spark.oracles). The stable-sort tie order is made
explicit with a ``seq`` column (input sequence number); the reference gets
the same tie order implicitly from file line order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def best_threshold(
    scored: DataFrame,
    group_col: str,
    score_col: str = "score",
    flag_col: str = "flag",
    seq_col: str = "seq",
    ascending: bool = True,
) -> DataFrame:
    """(group, score, flag, seq) -> (group, threshold).

    ``ascending=True`` is the TransE variant (low energy = positive side,
    default threshold min-0.01); ``ascending=False`` the RR variant
    (high rank = positive side, default max+0.01).
    """
    order = [F.col(score_col).asc(), F.col(seq_col).asc()] if ascending else [
        F.col(score_col).desc(), F.col(seq_col).asc()
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    rows = (
        scored.select(group_col, score_col, flag_col, seq_col)
        .withColumn("_i", F.row_number().over(w))
        .withColumn("_prev_score", F.lag(score_col).over(w))
        .withColumn(
            "_cum",
            F.sum(
                F.when(F.lag(F.col(flag_col)).over(w).isNull(), 0)
                .when(F.lag(F.col(flag_col)).over(w) == 1, 1)
                .otherwise(-1)
            ).over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    # row i>=2 (1-indexed) carries cum = sum over flags of rows 1..i-1
    gmax = rows.filter(F.col("_i") >= 2).groupBy(group_col).agg(
        F.max("_cum").alias("_gmax")
    )
    default = rows.filter(F.col("_i") == 1).select(
        group_col,
        (F.col(score_col) + (F.lit(-0.01) if ascending else F.lit(0.01))).alias(
            "_default"
        ),
    )
    best = (
        rows.filter(F.col("_i") >= 2)
        .join(gmax, group_col)
        .filter((F.col("_cum") == F.col("_gmax")) & (F.col("_gmax") > 0))
        .groupBy(group_col)
        .agg(
            F.min_by(
                ((F.col(score_col) + F.col("_prev_score")) / 2.0), F.col("_i")
            ).alias("_best")
        )
    )
    return default.join(best, group_col, "left").select(
        group_col, F.coalesce("_best", "_default").alias("threshold")
    )
