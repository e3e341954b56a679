"""Confidence fusion (reference `Model1.py` crisscross net +
`ResourceRankConfidence.gradAscent` logistic fallback).

The reference fuses three feature families per triple — path branches
(token-embedded, SimpleRNN), the 6-dim RR branch, and the raw TransE
margin — in a Keras network (Model1.py:23-160) trained on labeled pos/neg
pairs. BASELINE.json licenses a "small MLP/logistic layer" re-expression:
this module's fusion consumes the same three families, with the path
branches summarized by their ranked SD scores + lengths + rel_align
(same inputs/outputs contract: softmax-style confidence in [0, 1] per
triple, Model1.py:465-487). The FULL architecture — masked SimpleRNN
token-sequence branches and all — is implemented in
``ttmf_spark.kg.crisscross`` (``score_triples(kind="crisscross")``);
this module is the cheap/simple fusion tier (logistic = the reference's
own gradAscent fallback, MLP = the licensed summary re-expression).

Training is driver-side vectorized numpy (feature matrices are
query-set-sized, not corpus-sized — SURVEY.md M6), seeded. INFERENCE is
distributed: weights broadcast, one fused matmul per Arrow batch.

- ``fit_logistic``: gradient ascent, alpha=0.001, 500 cycles
  (ResourceRankConfidence.py:293-354 gradAscent, vectorized);
- ``fit_mlp``: 2-layer tanh MLP + sigmoid, Adam, batch 64, <=200 epochs,
  early-stop patience 20 (Model1.py:982,1004,446 hyperparameters);
- ``score_udf``: pandas UDF producing the fused confidence column.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

# fusion feature layout:
# [trans_conf, rr(6), (score, len, rel_align) x top-3 paths]
# rel_align is the path-CONTENT summary (paths.path_align_udf) standing in
# for the reference's RNN token-sequence branches (Model1.py:23-160).
N_FEATURES = 1 + 6 + 3 * 3


def _sigmoid(z: np.ndarray) -> np.ndarray:
    return 1.0 / (1.0 + np.exp(-np.clip(z, -60, 60)))


def fit_logistic(
    X: np.ndarray, y: np.ndarray, alpha: float = 0.001, cycles: int = 500
) -> np.ndarray:
    """Reference gradAscent semantics (batch gradient ascent on log-lik,
    weights init 1.0, fixed step), vectorized. Returns w with bias last."""
    Xb = np.hstack([X, np.ones((len(X), 1))])
    w = np.ones(Xb.shape[1])
    for _ in range(cycles):
        err = y - _sigmoid(Xb @ w)
        w = w + alpha * (Xb.T @ err)
    return w


def fit_mlp(
    X: np.ndarray,
    y: np.ndarray,
    hidden: int = 50,
    lr: float = 1e-3,
    batch: int = 64,
    epochs: int = 200,
    patience: int = 20,
    seed: int = 42,
) -> dict:
    """Small MLP: X -> tanh(hidden) -> sigmoid. Adam, early stopping on a
    10% holdout (Model1.py train loop contract). Returns weight dict."""
    rng = np.random.default_rng(seed)
    n, d = X.shape
    mu, sd = X.mean(axis=0), X.std(axis=0) + 1e-9
    Xn = (X - mu) / sd
    idx = rng.permutation(n)
    n_val = max(1, n // 10)
    vi, ti = idx[:n_val], idx[n_val:]
    W1 = rng.normal(0, 1.0 / np.sqrt(d), (d, hidden))
    b1 = np.zeros(hidden)
    W2 = rng.normal(0, 1.0 / np.sqrt(hidden), hidden)
    b2 = 0.0
    m = {k: 0.0 for k in ("W1", "b1", "W2", "b2")}
    v = {k: 0.0 for k in ("W1", "b1", "W2", "b2")}
    beta1, beta2, eps = 0.9, 0.999, 1e-8
    best = {"W1": W1.copy(), "b1": b1.copy(), "W2": W2.copy(), "b2": b2}
    best_loss, bad, step = np.inf, 0, 0

    def forward(Xs, W1, b1, W2, b2):
        H = np.tanh(Xs @ W1 + b1)
        return H, _sigmoid(H @ W2 + b2)

    for _ in range(epochs):
        order = rng.permutation(len(ti))
        for s in range(0, len(ti), batch):
            bi = ti[order[s : s + batch]]
            Xs, ys = Xn[bi], y[bi]
            H, p = forward(Xs, W1, b1, W2, b2)
            dz2 = (p - ys) / len(bi)
            gW2 = H.T @ dz2
            gb2 = dz2.sum()
            dH = np.outer(dz2, W2) * (1 - H**2)
            gW1 = Xs.T @ dH
            gb1 = dH.sum(axis=0)
            step += 1
            for k, g in (("W1", gW1), ("b1", gb1), ("W2", gW2), ("b2", gb2)):
                m[k] = beta1 * m[k] + (1 - beta1) * g
                v[k] = beta2 * v[k] + (1 - beta2) * (g * g)
                mh = m[k] / (1 - beta1**step)
                vh = v[k] / (1 - beta2**step)
                upd = lr * mh / (np.sqrt(vh) + eps)
                if k == "W1":
                    W1 -= upd
                elif k == "b1":
                    b1 -= upd
                elif k == "W2":
                    W2 -= upd
                else:
                    b2 -= upd
        _, pv = forward(Xn[vi], W1, b1, W2, b2)
        yl = y[vi]
        loss = -np.mean(yl * np.log(pv + 1e-12) + (1 - yl) * np.log(1 - pv + 1e-12))
        if loss < best_loss - 1e-6:
            best_loss, bad = loss, 0
            best = {"W1": W1.copy(), "b1": b1.copy(), "W2": W2.copy(), "b2": b2}
        else:
            bad += 1
            if bad >= patience:
                break
    best["mu"], best["sd"] = mu, sd
    return best


FEATURE_COLS = [
    "trans_conf",
    "rr_features",
    "path1_score",
    "path1_len",
    "path1_align",
    "path2_score",
    "path2_len",
    "path2_align",
    "path3_score",
    "path3_len",
    "path3_align",
]


def feature_matrix(pdf: pd.DataFrame) -> np.ndarray:
    rr = np.stack(pdf["rr_features"].to_numpy())
    rest = pdf[[c for c in FEATURE_COLS if c != "rr_features"]].to_numpy(
        dtype=np.float64
    )
    return np.hstack([rest[:, :1], rr, rest[:, 1:]])


def attach_path_summary(triples: DataFrame, ranked: DataFrame) -> DataFrame:
    """Add path{k}_score/len/align columns (k=1..3) from the ranked-path
    table; missing paths get 0.0 (absent path file, PrecessData.py:185).

    One groupBy + ONE join (not one join per k): the top-3 lines pivot
    into columns in a single aggregation — at scale this is 1 shuffle
    against 3. ``line`` is unique per (h, t, r) group, so the
    null-skipping F.max over the when() projection is deterministic."""
    aggs = []
    for k in (1, 2, 3):
        line_k = F.col("line") == k
        aggs += [
            F.max(F.when(line_k, F.col("score"))).alias(f"path{k}_score"),
            F.max(F.when(line_k, F.col("len"))).alias(f"path{k}_len"),
            F.max(F.when(line_k, F.col("rel_align"))).alias(f"path{k}_align"),
        ]
    top = ranked.filter(F.col("line") <= 3).groupBy("h", "t", "r").agg(*aggs)
    out = triples.join(top, ["h", "t", "r"], "left")
    for k in (1, 2, 3):
        out = (
            out.withColumn(f"path{k}_score", F.coalesce(f"path{k}_score", F.lit(0.0)))
            .withColumn(
                f"path{k}_len",
                F.coalesce(F.col(f"path{k}_len").cast("double"), F.lit(0.0)),
            )
            .withColumn(f"path{k}_align", F.coalesce(f"path{k}_align", F.lit(0.0)))
        )
    return out


def logistic_udf(spark, w: np.ndarray):
    b_w = spark.sparkContext.broadcast(w)

    @pandas_udf("double")
    def _conf(*cols: pd.Series) -> pd.Series:
        pdf = pd.DataFrame({c: s for c, s in zip(FEATURE_COLS, cols)})
        X = feature_matrix(pdf)
        Xb = np.hstack([X, np.ones((len(X), 1))])
        return pd.Series(_sigmoid(Xb @ b_w.value))

    return _conf


def mlp_udf(spark, weights: dict):
    b = spark.sparkContext.broadcast(weights)

    @pandas_udf("double")
    def _conf(*cols: pd.Series) -> pd.Series:
        wt = b.value
        pdf = pd.DataFrame({c: s for c, s in zip(FEATURE_COLS, cols)})
        X = (feature_matrix(pdf) - wt["mu"]) / wt["sd"]
        H = np.tanh(X @ wt["W1"] + wt["b1"])
        return pd.Series(_sigmoid(H @ wt["W2"] + wt["b2"]))

    return _conf


def add_confidence(features_df: DataFrame, conf_udf) -> DataFrame:
    return features_df.withColumn(
        "conf", conf_udf(*[F.col(c) for c in FEATURE_COLS])
    )
