"""Round-4 directive-2 probe: localize the crisscross score_infer_write
cost on the bench-shaped input (sf0.1, 1/20 doc subset, local[32]).

Variants over the SAME checkpointed feature frame:
  assemble   feats materialize + parquet write, no UDF (plan cost)
  null_udf   trivial pandas UDF over CC_INPUT_COLS (adds Arrow transfer)
  full_udf   the real crisscross UDF (adds kernel + broadcast deser)
  packed     9 path arrays concat into ONE array col Spark-side,
             UDF unpacks with a single stack+reshape

Usage: PYTHONPATH=. python scripts/probe_cc_infer.py [sf_dir]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

sys.path.insert(0, ".")

from ttmf_spark import corpus
from ttmf_spark.extract import extract_triples
from ttmf_spark.kg import crisscross, paths, pipeline
from ttmf_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WORK = "/tmp/cc_probe"
N_RUNS = 3


def t(fn):
    best = np.inf
    for _ in range(N_RUNS):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(
        app_name="cc_probe",
        cores="32",
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
            "spark.sql.files.maxPartitionBytes": "1m",
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    docs = corpus.interleaved_docs(spark, SF_DIR).filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(20)) == 0
    )
    gaz = corpus.gazetteer(spark, SF_DIR)
    same = corpus.same_as_edges(spark, SF_DIR)
    triples = extract_triples(docs, gaz, same)
    ctx, model = pipeline.build_context(
        spark, triples, transe_kw={"epochs": 10}
    )
    model = pipeline.fit_fusion(
        ctx, model, kind="crisscross",
        fit_kw={"epochs": 20, "max_steps": 200},
    )
    feats = pipeline.attach_features(ctx, ctx.id_triples)
    feats = paths.path_features(feats, ctx.ranked_paths)
    feats = feats.select(*crisscross.CC_INPUT_COLS).localCheckpoint(eager=True)
    n = feats.count()
    print(f"rows={n}")

    out = os.path.join(WORK, "out.parquet")

    def w(df):
        shutil.rmtree(out, ignore_errors=True)
        df.write.mode("overwrite").parquet(out)

    # A: materialized frame write (floor: scan + write)
    print(f"assemble_write: {t(lambda: w(feats)):.2f}s")

    # B: trivial UDF over the same input columns (adds Arrow transfer)
    @pandas_udf("double")
    def _null(*cols: pd.Series) -> pd.Series:
        return pd.Series(np.zeros(len(cols[0])))

    null_df = feats.withColumn("conf", _null(*[F.col(c) for c in crisscross.CC_INPUT_COLS]))
    print(f"null_udf_write: {t(lambda: w(null_df)):.2f}s")

    # B2: trivial UDF over scalars only (no list columns)
    scal = ["h", "t", "r", "trans_conf"]
    null2 = feats.withColumn("conf", _null(*[F.col(c) for c in scal]))
    print(f"null_udf_scalars_write: {t(lambda: w(null2)):.2f}s")

    # C: real UDF (adds kernel + per-worker broadcast deserialization)
    udf = crisscross.crisscross_udf(spark, model.fusion_weights, model.p_ent, model.p_rel)
    full = crisscross.add_confidence(feats, udf)
    print(f"full_udf_write: {t(lambda: w(full)):.2f}s")

    # D: packed single array column, unpack inside UDF
    packed = feats.withColumn(
        "paths_packed", F.concat(*[F.col(c) for c in crisscross.TOKEN_COLS])
    )
    b = spark.sparkContext.broadcast(
        (model.fusion_weights,
         model.p_ent.astype(np.float64), model.p_rel.astype(np.float64))
    )
    PCOLS = ["h", "t", "r", "paths_packed", "trans_conf", "rr_features"]

    @pandas_udf("double")
    def _packed(*cols: pd.Series) -> pd.Series:
        p, E, R = b.value
        if not len(cols[0]):
            return pd.Series(np.zeros(0))
        d = dict(zip(PCOLS, cols))
        B = len(d["h"])
        tok = np.vstack(d["paths_packed"].to_numpy()).astype(np.int64)
        tok = tok.reshape(B, 3, 3, paths.MAX_EDGES)
        batch = {
            "h": d["h"].to_numpy(dtype=np.int64),
            "t": d["t"].to_numpy(dtype=np.int64),
            "r": d["r"].to_numpy(dtype=np.int64),
            "transe": d["trans_conf"].to_numpy(dtype=np.float64),
            "rrank": np.vstack(d["rr_features"].to_numpy()).astype(np.float64),
        }
        for k in range(1, 4):
            for i, nm in enumerate(("h", "t", "r")):
                batch[f"p{k}_{nm}"] = tok[:, k - 1, i, :]
        probs, _ = crisscross.forward(batch, p, (E, R), train=False)
        return pd.Series(probs[:, 1])

    pk = packed.withColumn("conf", _packed(*[F.col(c) for c in PCOLS])).drop("paths_packed")
    print(f"packed_udf_write: {t(lambda: w(pk)):.2f}s")

    # E: the actual fix — repartition the feature frame for CPU before
    # the UDF (probe 2 showed the stage ran in ONE python worker)
    rep = feats.repartition(64)
    full_rep = crisscross.add_confidence(rep, udf)
    print(f"repartitioned_udf_write: {t(lambda: w(full_rep)):.2f}s")

    # parity check D vs C on values
    a = full.select("h", "t", "r", "conf").toPandas().sort_values(["h", "t", "r"]).reset_index(drop=True)
    bb = pk.select("h", "t", "r", "conf").toPandas().sort_values(["h", "t", "r"]).reset_index(drop=True)
    print("packed parity:", np.allclose(a["conf"], bb["conf"], atol=1e-12))

    spark.stop()


if __name__ == "__main__":
    main()
