"""Johnson-Lindenstrauss dimensionality reduction for embedding tables:
Achlioptas sparse-sign random projection (Achlioptas 2003, "Database-
friendly random projections"), the standard pre-shrink before ANN /
clustering when 100 TB of float32 vectors won't fit the serving tier —
proj = sqrt(s/k) * R^T v with R[j][i] in {+1, 0, -1}, P(+-1) = 1/(2s).

Scale shape: the projection matrix is dim x k literals compiled INTO the
plan (like the sign-LSH hyperplanes in datapipe/similarity.py) — no join,
no shuffle, no UDF; the corpus scan maps straight to k output columns and
whole-stage codegen fuses the chained additions. Adding data never grows
the model.

Engine-portable numerics: each output coordinate is an explicit
left-to-right chained sum of +-v[j] terms in ascending j (only the
nonzero entries of the sparse column), built by the same Python loop for
the Spark expression and the DuckDB oracle — identical IEEE-754 addition
order, so results match bit-for-bit before the final round(…, 9). A
cross-row float sum would not be order-stable; there isn't one anywhere
in this module (the distortion gate's dot products are per-row in-order
folds over fixed-length arrays, the emb_topk contract).

No reference analogue (the reference keeps its 100-dim TransE vectors
raw); this is part of the LLM-data-pipeline surface next to lsh_topk /
ivf_topk / pq_codes.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def projection_entries(
    dim: int, k: int, seed: int = 0, s: int = 3
) -> list[list[tuple[int, int]]]:
    """Per output coordinate i: the nonzero entries [(j, sign), ...] of
    column i of the Achlioptas matrix, ascending j (driver-side, tiny).
    """
    rng = np.random.default_rng(seed)
    # draw the full dim x k matrix in one shot so entries are independent
    u = rng.random((dim, k))
    cols: list[list[tuple[int, int]]] = []
    for i in range(k):
        col = []
        for j in range(dim):
            if u[j, i] < 1.0 / (2 * s):
                col.append((j, 1))
            elif u[j, i] < 1.0 / s:
                col.append((j, -1))
        cols.append(col)
    return cols


def _scale(k: int, s: int) -> float:
    return math.sqrt(s / k)


def _proj_exprs(vec_col: str, entries: list[list[tuple[int, int]]], k: int, s: int):
    """k column expressions, each round(scale * chained +-v[j] sum, 9)."""
    sc = _scale(k, s)
    outs = []
    for col in entries:
        expr = F.lit(0.0)
        for j, sign in col:
            term = F.col(vec_col)[j].cast("double")
            expr = expr + term if sign > 0 else expr - term
        outs.append(F.round(expr * F.lit(sc), 9))
    return outs


def project_embeddings(
    emb: DataFrame,
    k: int = 16,
    seed: int = 0,
    s: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """(vec_id, dim_i, val): the k-dim JL projection of every vector in
    long form (scalar columns — exact value-hash across engines; callers
    wanting arrays re-assemble with collect_list over dim_i order).

    Plan: one scan-speed projection, zero shuffles.
    """
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    entries = projection_entries(dim, k, seed, s)
    exprs = _proj_exprs(vec_col, entries, k, s)
    cols = emb.select(
        F.col(id_col),
        *[e.alias(f"_p{i}") for i, e in enumerate(exprs)],
    )
    pairs = F.array(
        *[
            F.struct(F.lit(i).alias("dim_i"), F.col(f"_p{i}").alias("val"))
            for i in range(k)
        ]
    )
    return (
        cols.select(id_col, F.explode(pairs).alias("_e"))
        .select(
            F.col(id_col),
            F.col("_e.dim_i").cast("int").alias("dim_i"),
            F.col("_e.val").alias("val"),
        )
    )


def projection_distortion(
    emb: DataFrame,
    k: int = 16,
    seed: int = 0,
    s: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    pair_mod: int = 2,
    dim: int | None = None,
) -> DataFrame:
    """QA gate for the projection: per-pair cosine distortion on the
    deterministic pair sample (vec_id 2*pair_mod*j, 2*pair_mod*j +
    pair_mod) — i.e. (4m, 4m+2) at the default pair_mod=2; consecutive
    ids are never paired — (a, b, cos_full,
    cos_proj, abs_err). The JL promise is abs_err concentrated near 0;
    this is the trust gate before swapping raw vectors for projected
    ones in ANN (same pattern as emb_ann_recall / emb_pq_recall).

    All float sums are per-row in-order folds over fixed-length arrays
    (never cross-row), rounded to 6 — the emb_topk numerics contract.
    """
    if dim is None:
        dim = len(emb.select(vec_col).first()[0])
    entries = projection_entries(dim, k, seed, s)
    exprs = _proj_exprs(vec_col, entries, k, s)

    def dot(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
        )

    def unit(a):
        n = F.sqrt(dot(a, a))
        return F.when(n > 0, F.transform(a, lambda x: x / n)).otherwise(a)

    base = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
        F.array(*exprs).alias("_p"),
    ).withColumn("_uv", unit(F.col("_v"))).withColumn("_up", unit(F.col("_p")))
    a = base.filter(F.col(id_col) % (2 * pair_mod) == 0).select(
        (F.col(id_col) / 2).cast("long").alias("_m"),
        F.col(id_col).alias("a"),
        F.col("_uv").alias("_uva"),
        F.col("_up").alias("_upa"),
    )
    b = base.filter(F.col(id_col) % (2 * pair_mod) == pair_mod).select(
        ((F.col(id_col) - pair_mod) / 2).cast("long").alias("_m"),
        F.col(id_col).alias("b"),
        F.col("_uv").alias("_uvb"),
        F.col("_up").alias("_upb"),
    )
    return (
        a.join(b, "_m")
        .select(
            "a",
            "b",
            F.round(dot(F.col("_uva"), F.col("_uvb")), 6).alias("cos_full"),
            F.round(dot(F.col("_upa"), F.col("_upb")), 6).alias("cos_proj"),
        )
        .withColumn("abs_err", F.round(F.abs(F.col("cos_full") - F.col("cos_proj")), 6))
    )
