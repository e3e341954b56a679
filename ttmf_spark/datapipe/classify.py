"""Model-based filtering over `embeddings(vec_id, embedding, label)`:
nearest-class-centroid (Rocchio) classification — the shape of the
"quality classifier" stage of an LLM data pipeline (train a small model
on a labeled sample, score the whole corpus, filter/route by predicted
class), with fully deterministic training so a DuckDB twin can gate it.

Not in the reference (TTMF has no labeled-embedding stage); sibling of
the similarity operators and reuses their unit-norm/dot helpers.

Scale shape:
- TRAIN is one distributed aggregation: per-class mean of the unit
  vectors (`groupBy(label)` over |classes| groups, map-side combinable)
  — no SGD, no driver iteration, deterministic under any partitioning
  because each centroid element is rounded to 8 decimals.
- The MODEL is (n_classes x dim) floats — dim-bounded, collected once
  and inlined as literals (the same broadcast-model pattern as the
  sign-LSH hyperplanes in similarity.py). On a real cluster this is a
  handful of KB riding the closure; nothing re-reads the training table.
- INFERENCE is a narrow map over the corpus scan: per row, dot products
  against the literal centroids via zip_with/aggregate (JVM-side, no
  UDF, no shuffle), argmax via array_max over (score, -class) structs.
  A 100 TB corpus classifies at scan speed.

Determinism/parity: unit-norm and dots in float64; centroid elements
rounded to 8, scores to 6; argmax on the ROUNDED score with lowest-label
tie-break — so the DuckDB twin (same rounding, ROW_NUMBER ordering)
matches. Caveat (same class as the ivf_refine means): a distributed mean
is order-sensitive at the last ulp, so the 8-decimal centroid rounding
is deterministic only up to a ~1e-12-wide boundary band — measure-zero
at fixture scales (the gate pins sf0.01), but at 10^5+ rows per class a
boundary flip is possible; pin centroids as literals (the model IS
collected anyway) if bit-stability across reruns ever matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ttmf_spark.datapipe.similarity import _dot, with_unit_norm


def class_centroids(
    emb: DataFrame,
    dim: int,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> list[tuple[int, list[float]]]:
    """[(label, centroid)] sorted by label; centroid = per-element mean of
    the unit-normalized class vectors, rounded to 8 decimals."""
    u = with_unit_norm(emb, vec_col)
    cent = u.groupBy(label_col).agg(
        *[F.round(F.avg(F.col("_unit")[i]), 8).alias(f"c{i}") for i in range(dim)]
    )
    rows = sorted(cent.collect(), key=lambda r: r[label_col])
    return [(int(r[label_col]), [float(r[f"c{i}"]) for i in range(dim)]) for r in rows]


def centroid_classify(
    emb: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """(vec_id, label, pred, score): predicted class = argmax over the
    rounded centroid dot products, ties to the lowest label."""
    model = class_centroids(emb, dim, vec_col, label_col)
    u = with_unit_norm(emb, vec_col)
    scored = F.array(
        *[
            F.struct(
                F.round(
                    _dot(F.col("_unit"), F.array(*[F.lit(x) for x in cvec])), 6
                ).alias("score"),
                F.lit(-cl).alias("negcl"),
            )
            for cl, cvec in model
        ]
    )
    best = F.array_max(scored)
    return u.select(
        F.col(id_col),
        F.col(label_col).cast("int").alias("label"),
        (-best["negcl"]).cast("int").alias("pred"),
        best["score"].alias("score"),
    )


def classifier_eval(classified: DataFrame) -> DataFrame:
    """Per-class quality report over centroid_classify output:
    (label, n, n_correct, accuracy) — the resubstitution confusion
    diagonal; the gate a pipeline checks before trusting the filter."""
    return classified.groupBy("label").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("pred") == F.col("label"), 1).otherwise(0))
        .cast("long")
        .alias("n_correct"),
        F.round(
            F.avg(F.when(F.col("pred") == F.col("label"), 1.0).otherwise(0.0)), 6
        ).alias("accuracy"),
    )
