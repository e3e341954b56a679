"""Localize the distributed crisscross fit's per-epoch fixed cost.

BENCH.md records ~9.5-10.2 s/epoch on the bench-shaped labeled set
(~26k rows, 8 shards) while the pure Adam compute in those tasks is
~1 s/epoch (50 minibatches/shard x ~20 ms, shards parallel). This probe
times one epoch's Spark round with (a) a null shard fn (no compute, no
delta payload), (b) a delta-payload-only fn (no Adam), and (c) the real
shard fn — separating job/Arrow-in cost, delta-collect cost, and
kernel cost.

Usage: PYTHONPATH=. python scripts/probe_ccfit_epoch.py
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from ttmf_spark.kg import crisscross as cc  # noqa: E402
from ttmf_spark.session import get_spark  # noqa: E402


def feats_pdf(n=26000, n_ent=30000, n_rel=40, L=cc.MAX_EDGES, seed=7):
    rng = np.random.default_rng(seed)
    flag = rng.integers(0, 2, n)
    pdf = pd.DataFrame(
        {
            "h": rng.integers(0, n_ent, n),
            "t": rng.integers(0, n_ent, n),
            "r": rng.integers(0, n_rel, n),
            "trans_conf": rng.normal(0, 0.3, n) + 0.8 * flag,
            "rr_features": list(rng.normal(0, 0.3, (n, 6)) + 0.5 * flag[:, None]),
            "flag": flag * 2 - 1,
        }
    )
    for k in (1, 2, 3):
        for nm in ("h", "t", "r"):
            nv = n_rel if nm == "r" else n_ent
            toks = rng.integers(0, nv, (n, L))
            cut = rng.integers(0, L + 1, n)
            for i, ci in enumerate(cut):
                toks[i, ci:] = 0
            pdf[f"path{k}_{nm}"] = list(toks)
    return pdf


def main():
    spark = get_spark(app_name="ccfit_epoch_probe", cores=32)
    sc = spark.sparkContext
    dim = 100
    n_ent, n_rel, n_shards = 30000, 40, 8
    rng = np.random.default_rng(1)
    E = rng.normal(0, 0.1, (n_ent, dim))
    R = rng.normal(0, 0.1, (n_rel, dim))
    params = cc.init_params(dim, dim, seed=42)

    pdf = feats_pdf(n_ent=n_ent, n_rel=n_rel)
    feats = spark.createDataFrame(pdf)
    hcols = [F.col("h"), F.col("t"), F.col("r"), F.col("flag")]
    train = feats.withColumn(
        "_sh", F.pmod(F.xxhash64(*hcols, F.lit(42)), F.lit(n_shards))
    ).localCheckpoint(eager=True)
    print("rows:", train.count())

    schema = "sh long, key string, delta array<double>"
    b_emb = sc.broadcast((E, R))
    b_params = sc.broadcast(params)

    def null_fn(key, p):
        return pd.DataFrame(
            {
                "sh": pd.Series([], dtype="int64"),
                "key": pd.Series([], dtype="str"),
                "delta": pd.Series([], dtype="object"),
            }
        )

    def payload_fn(key, p):
        # touch the broadcasts + emit a real-sized delta, but no Adam
        params0 = b_params.value
        _E, _R = b_emb.value
        rows = []
        for k in cc._delta_keys(params0):
            d = np.zeros_like(np.asarray(params0[k], dtype=np.float64))
            rows.append((int(key[0]), k, d.ravel().tolist()))
        return pd.DataFrame(rows, columns=["sh", "key", "delta"])

    real_fn = cc._shard_fit_fn(b_params, b_emb, 1e-3, 64, 42, 0, True, None)

    for name, fn in [("null", null_fn), ("payload", payload_fn), ("real", real_fn)]:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            train.groupBy("_sh").applyInPandas(fn, schema=schema).toPandas()
            times.append(round(time.perf_counter() - t0, 2))
        print(f"{name}: {times}")

    # gather route epoch (cogroup) for comparison
    ent_df = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n_ent), "vec": list(E)})
    )
    rel_df = spark.createDataFrame(
        pd.DataFrame({"id": np.arange(n_rel), "vec": list(R)})
    )
    gathered = cc._gather_emb_frame(train, ent_df, rel_df, "_sh", "_gsh")
    gathered = gathered.repartition(n_shards, "_gsh").localCheckpoint(eager=True)
    real_cg = cc._shard_fit_cogroup_fn(b_params, 1e-3, 64, 42, 0, True, None)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        train.groupBy("_sh").cogroup(gathered.groupBy("_gsh")).applyInPandas(
            real_cg, schema=schema
        ).toPandas()
        times.append(round(time.perf_counter() - t0, 2))
    print(f"real-gather: {times}")


if __name__ == "__main__":
    main()
