"""TransE embeddings: seeded numpy trainer (M4) + distributed energy scoring
(M1/M2) via Arrow-batched pandas UDFs.

Reference: `KGE/src/approaches/TransE.java` (margin-based SGD: dim=100,
margin=1.0, lr=0.001, L2, 50 epochs, per-epoch entity renormalization,
head-or-tail corruption — KGE_config_template.properties:6-13,
TransE.java:245-356) and `TransConfidence.py:35-43` (true-L2 energy
``E = ||e_h + r_r - e_t||_2``, the canonical scoring semantics; the Java
side's un-rooted L2 — TransE.java:567-574 — is a train-time-only detail).

Exact value parity with the Java trainer is impossible (unseeded
`java.util.Random` + `Collections.shuffle`); per FIXTURES.md §7 the fixture
embeddings are produced ONCE by this seeded trainer and shared by our
pipeline and the reference-semantics oracles, so downstream feature parity
tests are exact.

Scale notes: the model is dim-bounded (|V| x 100 floats; 1e5 entities =
40 MB) so training is a driver-side vectorized numpy loop over minibatches
(SURVEY.md M4 — embeddings are an input artifact, not the scored
dataflow), while SCORING is distributed: the matrices ship to executors as
a Spark broadcast and each Arrow batch computes energies with one fused
numpy expression — no per-row Python, no shuffle, no join.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

DIM = 100  # KGE_config_template.properties:6
MARGIN = 1.0
LR = 0.001
EPOCHS = 50


def train_transe(
    triples: np.ndarray,
    n_ent: int,
    n_rel: int,
    dim: int = DIM,
    epochs: int = EPOCHS,
    lr: float = LR,
    margin: float = MARGIN,
    seed: int = 42,
    batch: int = 4096,
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded vectorized TransE SGD. ``triples`` is (n, 3) int array (h, r, t).

    Returns (entity_matrix [n_ent, dim], relation_matrix [n_rel, dim]).
    Uniform Xavier-style init + L2 entity renorm per epoch mirror
    TransE.java:188-243; the SGD step uses the margin hinge with L2
    distance gradient, minibatched instead of per-example.
    """
    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    ent = rng.uniform(-bound, bound, (n_ent, dim))
    rel = rng.uniform(-bound, bound, (n_rel, dim))
    rel /= np.maximum(np.linalg.norm(rel, axis=1, keepdims=True), 1e-12)
    n = len(triples)
    if n == 0:
        return ent.astype(np.float32), rel.astype(np.float32)
    for _ in range(epochs):
        ent /= np.maximum(np.linalg.norm(ent, axis=1, keepdims=True), 1e-12)
        order = rng.permutation(n)
        for s in range(0, n, batch):
            idx = order[s : s + batch]
            h, r, t = triples[idx, 0], triples[idx, 1], triples[idx, 2]
            corrupt_head = rng.random(len(idx)) < 0.5
            neg_e = rng.integers(0, n_ent, len(idx))
            nh = np.where(corrupt_head, neg_e, h)
            nt = np.where(corrupt_head, t, neg_e)
            d_pos = ent[h] + rel[r] - ent[t]
            d_neg = ent[nh] + rel[r] - ent[nt]
            s_pos = (d_pos**2).sum(axis=1)
            s_neg = (d_neg**2).sum(axis=1)
            viol = margin + s_pos - s_neg > 0
            if not viol.any():
                continue
            g_pos = 2.0 * lr * d_pos[viol]
            g_neg = 2.0 * lr * d_neg[viol]
            np.add.at(ent, h[viol], -g_pos)
            np.add.at(ent, t[viol], g_pos)
            np.add.at(rel, r[viol], -g_pos + g_neg)
            np.add.at(ent, nh[viol], g_neg)
            np.add.at(ent, nt[viol], -g_neg)
    return ent.astype(np.float32), rel.astype(np.float32)


def train_ptranse(
    triples: np.ndarray,
    n_ent: int,
    n_rel: int,
    dim: int = DIM,
    epochs: int = EPOCHS,
    lr: float = LR,
    n_neg: int = 15,
    bias: float = 7.0,
    seed: int = 42,
    batch: int = 2048,
) -> tuple[np.ndarray, np.ndarray]:
    """PTransE-style trainer (reference KGE/src/approaches/PTransE.java:
    logistic loss sigma(bias - 0.5 * E) with 15 negative samples per side
    plus relation corruption, accumulated gradients —
    KGE_config_template.properties:11-13, PTransE.java:20-21,279-460).
    Vectorized + seeded like train_transe; used for path-ranking
    embeddings (SearchPaths2 loads PTransE vectors, SearchPaths2.py:187).
    """
    rng = np.random.default_rng(seed)
    bound = 6.0 / np.sqrt(dim)
    ent = rng.uniform(-bound, bound, (n_ent, dim))
    rel = rng.uniform(-bound, bound, (n_rel, dim))
    n = len(triples)
    if n == 0:
        return ent.astype(np.float32), rel.astype(np.float32)

    def sig(x):
        return 1.0 / (1.0 + np.exp(-np.clip(x, -60, 60)))

    for _ in range(epochs):
        ent /= np.maximum(np.linalg.norm(ent, axis=1, keepdims=True), 1e-12)
        order = rng.permutation(n)
        for s in range(0, n, batch):
            idx = order[s : s + batch]
            h, r, t = triples[idx, 0], triples[idx, 1], triples[idx, 2]
            # positive: push sigma(bias - 0.5E) up; negatives (corrupt
            # head/tail/relation): push down. gradient of logloss wrt E.
            for kind in ("pos", "ent_neg", "rel_neg"):
                if kind == "pos":
                    hh, rr, tt, sign = h, r, t, 1.0
                    reps = 1
                else:
                    reps = n_neg if kind == "ent_neg" else 1
                for _rep in range(reps):
                    if kind == "ent_neg":
                        corrupt_head = rng.random(len(idx)) < 0.5
                        ne = rng.integers(0, n_ent, len(idx))
                        hh = np.where(corrupt_head, ne, h)
                        tt = np.where(corrupt_head, t, ne)
                        rr, sign = r, -1.0
                    elif kind == "rel_neg":
                        hh, tt = h, t
                        rr = rng.integers(0, n_rel, len(idx))
                        sign = -1.0
                    d = ent[hh] + rel[rr] - ent[tt]
                    E = (d**2).sum(axis=1)
                    p = sig(bias - 0.5 * E)
                    # dL/dE for label y in {1 pos, 0 neg}: (p - y) * (-0.5)
                    coef = (p - (1.0 if sign > 0 else 0.0)) * (-0.5)
                    g = (2.0 * lr) * coef[:, None] * d
                    np.add.at(ent, hh, -g)
                    np.add.at(ent, tt, g)
                    np.add.at(rel, rr, -g)
    return ent.astype(np.float32), rel.astype(np.float32)


def dev_hinge_loss(
    pairs: DataFrame, energy_col: str = "energy", margin: float = MARGIN
) -> DataFrame:
    """A10 (TransE.java:357-380): mean hinge over aligned pos/neg pairs.

    ``pairs``: (..., flag, seq, energy) with seq pairing pos 2k / neg 2k+1
    (negatives.tc_pairs layout). One self-join on the pair key.
    """
    pos = pairs.filter(F.col("flag") == 1).select(
        (F.col("seq") / 2).cast("long").alias("k"), F.col(energy_col).alias("e_pos")
    )
    neg = pairs.filter(F.col("flag") == -1).select(
        ((F.col("seq") - 1) / 2).cast("long").alias("k"),
        F.col(energy_col).alias("e_neg"),
    )
    return pos.join(neg, "k").agg(
        F.avg(F.greatest(F.lit(margin) + F.col("e_pos") - F.col("e_neg"), F.lit(0.0))).alias(
            "dev_loss"
        )
    )


def fit_embeddings_from_df(
    id_triples: DataFrame, n_ent: int, n_rel: int, seed: int = 42, **kw
) -> tuple[np.ndarray, np.ndarray]:
    """Collect the (dim-bounded) id triples to the driver and train."""
    pdf = id_triples.select("h", "r", "t").toPandas()
    arr = pdf[["h", "r", "t"]].to_numpy(dtype=np.int64)
    return train_transe(arr, n_ent, n_rel, seed=seed, **kw)


def embeddings_to_df(spark, mat: np.ndarray) -> DataFrame:
    """(id, vec array<float>) table — the S9 sink (TransE.java:773-789)."""
    pdf = pd.DataFrame(
        {"id": np.arange(len(mat), dtype=np.int64), "vec": list(mat.astype("float32"))}
    )
    return spark.createDataFrame(pdf)


def transe_energy_col(spark, ent: np.ndarray, rel: np.ndarray):
    """Column factory: (h, r, t) id cols -> double energy ||e_h + r_r - e_t||_2.

    True-L2 python semantics (TransConfidence.py:37-38). Matrices are a
    SparkContext broadcast; each Arrow batch is one fused numpy expression.
    """
    b_ent = spark.sparkContext.broadcast(ent.astype(np.float64))
    b_rel = spark.sparkContext.broadcast(rel.astype(np.float64))

    @pandas_udf("double")
    def _energy(h: pd.Series, r: pd.Series, t: pd.Series) -> pd.Series:
        E, R = b_ent.value, b_rel.value
        d = E[h.to_numpy()] + R[r.to_numpy()] - E[t.to_numpy()]
        return pd.Series(np.linalg.norm(d, axis=1))

    return _energy


def add_transe_energy(df: DataFrame, energy_udf, out_col: str = "energy") -> DataFrame:
    return df.withColumn(out_col, energy_udf(F.col("h"), F.col("r"), F.col("t")))


def transe_confidence(
    scored: DataFrame, thresholds: DataFrame, energy_col: str = "energy"
) -> DataFrame:
    """conf = theta_r - energy (TransConfidence.py:78-81 raw-margin
    semantics — the sigmoid at :80 is dead code, overwritten at :81);
    theta defaults to 0.0 for unseen relations (TransConfidence.py:72-76).
    """
    th = thresholds.select(F.col("r"), F.col("threshold").alias("_theta"))
    return (
        scored.join(F.broadcast(th), "r", "left")
        .withColumn(
            "trans_conf",
            F.coalesce(F.col("_theta"), F.lit(0.0)) - F.col(energy_col),
        )
        .drop("_theta")
    )
