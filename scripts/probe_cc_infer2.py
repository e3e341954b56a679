"""Directive-2 probe, pass 2: the in-worker breakdown. The null-UDF test
showed Arrow transfer is ~0.2s of the ~7.3s stage; this pass times the
three in-worker components (broadcast access, batch_from_pandas,
forward) per task and aggregates."""

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
WORK = "/tmp/cc_probe2"


def main():
    os.makedirs(WORK, exist_ok=True)
    spark = get_spark(
        app_name="cc_probe2", cores="32",
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
    ctx, model = pipeline.build_context(spark, triples, transe_kw={"epochs": 10})
    model = pipeline.fit_fusion(
        ctx, model, kind="crisscross", fit_kw={"epochs": 20, "max_steps": 200}
    )
    feats = pipeline.attach_features(ctx, ctx.id_triples)
    feats = paths.path_features(feats, ctx.ranked_paths)
    feats = feats.select(*crisscross.CC_INPUT_COLS).localCheckpoint(eager=True)
    print("rows=", feats.count(), "partitions=", feats.rdd.getNumPartitions())
    print("ent_shape=", model.p_ent.shape, "rel_shape=", model.p_rel.shape)
    import pickle
    blob = pickle.dumps((model.fusion_weights, model.p_ent.astype(np.float64),
                         model.p_rel.astype(np.float64)))
    print(f"broadcast_pickle_mb={len(blob)/1e6:.1f}")

    b = spark.sparkContext.broadcast(
        (model.fusion_weights, model.p_ent.astype(np.float64),
         model.p_rel.astype(np.float64))
    )
    CC = crisscross.CC_INPUT_COLS

    @pandas_udf("string")
    def _timed(*cols: pd.Series) -> pd.Series:
        t0 = time.perf_counter()
        p, E, R = b.value
        t_b = time.perf_counter() - t0
        pdf = pd.DataFrame({c: s for c, s in zip(CC, cols)})
        n = len(pdf)
        if not n:
            return pd.Series(["empty"])
        t0 = time.perf_counter()
        batch = crisscross.batch_from_pandas(pdf)
        t_conv = time.perf_counter() - t0
        t0 = time.perf_counter()
        probs, _ = crisscross.forward(batch, p, (E, R), train=False)
        t_fwd = time.perf_counter() - t0
        msg = f"pid={os.getpid()} n={n} b={t_b:.3f} conv={t_conv:.3f} fwd={t_fwd:.3f}"
        return pd.Series([msg] * n)

    out = feats.withColumn("m", _timed(*[F.col(c) for c in CC]))
    t0 = time.perf_counter()
    rows = out.groupBy("m").count().collect()
    wall = time.perf_counter() - t0
    print(f"stage_wall={wall:.2f}s  distinct_task_msgs={len(rows)}")
    tot_b = tot_c = tot_f = 0.0
    pids = set()
    for r in rows:
        parts = dict(kv.split("=") for kv in r["m"].split())
        pids.add(parts["pid"])
        tot_b += float(parts["b"]); tot_c += float(parts["conv"]); tot_f += float(parts["fwd"])
    print(f"workers={len(pids)} sum_bcast={tot_b:.2f} sum_conv={tot_c:.2f} sum_fwd={tot_f:.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
