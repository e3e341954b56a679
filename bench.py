"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Prints ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {...per-query sec...}, "sf": ..., "extras": {...}}.

Headline: end-to-end KG construction + TTMF trust scoring
(docs -> extract -> link -> canonicalize -> score -> materialize),
measured from a pre-materialized interleaved-docs parquet (corpus
generation is not part of the pipeline under test). The scoring stage
runs on a deterministic subset of documents (SPARK_GRAFT_SCORE_FRAC_MOD)
so the bench completes within a per-round budget while measuring the
same per-triple cost; triples/sec is reported for both stages.

Scaling-efficiency evidence (BASELINE.json: >=0.8 from N to 4N
executors): with SPARK_GRAFT_SCALING=1 (default) the extraction stage is
re-run at local[8] on the same input and extras.scaling reports
throughput at both parallelism levels and efficiency =
(thr_32 / thr_8) / (32 / 8). scripts/scaling_bench.sh writes the
long-form report to BENCH.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

from ttmf_spark import corpus
from ttmf_spark.extract import extract_triples
from ttmf_spark.kg.pipeline import score_triples
from ttmf_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WORK = os.environ.get("SPARK_GRAFT_WORK", "/tmp/ttmf_bench")
SCORE_MOD = int(os.environ.get("SPARK_GRAFT_SCORE_FRAC_MOD", "20"))  # 1/20 of docs
TRANSE_EPOCHS = int(os.environ.get("SPARK_GRAFT_TRANSE_EPOCHS", "10"))
DO_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") == "1"
SCALING_BASE_CPUS = int(os.environ.get("SPARK_GRAFT_SCALING_BASE", "8"))
# the scaling probe replicates the docs input so per-core compute dominates
# fixed stage overhead (the sandbox stand-in for "same job, bigger cluster");
# both parallelism levels run the SAME replicated input with the SAME shuffle
# partitioning, so cores are the only variable.
SCALING_REP = int(os.environ.get("SPARK_GRAFT_SCALING_REP", "8"))
# small-data parallelism: keep AQE's post-shuffle coalescing from collapsing
# bench-scale shuffles (~50 MB) into 1 partition — at 100 TB the default
# 64 MB advisory is right, at sf<=0.1 it serializes every stage.
BENCH_CONF = {
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    # small files at bench scale: default 128m splits give < cores tasks
    "spark.sql.files.maxPartitionBytes": "32m",
}


def _materialize_inputs(spark, sf_dir: str, work: str) -> str:
    """Write the interleaved-docs corpus once (untimed input fixture)."""
    docs_path = os.path.join(work, f"docs_{os.path.basename(sf_dir)}.parquet")
    marker = docs_path + "/_SUCCESS"
    if not os.path.exists(marker):
        corpus.interleaved_docs(spark, sf_dir).repartition(64).write.mode(
            "overwrite"
        ).parquet(docs_path)
    return docs_path


def _run_extract(spark, docs_path: str, sf_dir: str, out_path: str) -> tuple[float, int]:
    shutil.rmtree(out_path, ignore_errors=True)
    docs = spark.read.parquet(docs_path)
    gaz = corpus.gazetteer(spark, sf_dir)
    same = corpus.same_as_edges(spark, sf_dir)
    t0 = time.perf_counter()
    triples = extract_triples(docs, gaz, same)
    triples.write.mode("overwrite").parquet(out_path)
    dt = time.perf_counter() - t0
    n = spark.read.parquet(out_path).count()
    return dt, n


def main() -> None:
    spark = get_spark(app_name="ttmf_bench", cores=CPUS, extra_conf=BENCH_CONF)
    os.makedirs(WORK, exist_ok=True)
    docs_path = _materialize_inputs(spark, SF_DIR, WORK)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # q1: KG construction (extract -> link -> canonicalize -> write)
    out_path = os.path.join(WORK, "triples_out.parquet")
    dt, n_triples = _run_extract(spark, docs_path, SF_DIR, out_path)
    timings["kg_construct_e2e"] = dt
    extras["triples_out"] = n_triples
    extras["extract_triples_per_sec"] = n_triples / dt

    # q2: TTMF trust scoring on a deterministic doc subset
    sub_docs = spark.read.parquet(docs_path).filter(
        F.pmod(F.xxhash64("doc_id"), F.lit(SCORE_MOD)) == 0
    )
    gaz = corpus.gazetteer(spark, SF_DIR)
    same = corpus.same_as_edges(spark, SF_DIR)
    scored_path = os.path.join(WORK, "scored_out.parquet")
    shutil.rmtree(scored_path, ignore_errors=True)
    ck_dir = os.path.join(WORK, "score_ck")
    shutil.rmtree(ck_dir, ignore_errors=True)
    from ttmf_spark.checkpoint import StageStore

    store = StageStore(ck_dir)
    t0 = time.perf_counter()
    sub_triples = extract_triples(sub_docs, gaz, same)
    scored, _model = score_triples(
        spark,
        sub_triples,
        kind="logistic",
        transe_kw={"epochs": TRANSE_EPOCHS},
        store=store,
    )
    scored.write.mode("overwrite").parquet(scored_path)
    timings["ttmf_score_e2e"] = time.perf_counter() - t0
    n_scored = spark.read.parquet(scored_path).count()
    extras["triples_scored"] = n_scored
    extras["scored_triples_per_sec"] = n_scored / timings["ttmf_score_e2e"]
    try:  # per-stage breakdown from the checkpoint store's lineage log
        with open(os.path.join(ck_dir, "_metrics.jsonl")) as f:
            extras["score_stages"] = {
                r["stage"]: r["seconds"] for r in map(json.loads, f)
            }
    except OSError:
        pass

    # q3: span flatten scan (input-invariant surface)
    t0 = time.perf_counter()
    n_spans = (
        spark.read.parquet(docs_path)
        .selectExpr("doc_id", "posexplode(spans) as (pos, span)")
        .count()
    )
    timings["span_flatten"] = time.perf_counter() - t0
    extras["spans"] = n_spans

    # q4: dedup + similarity over the driver tables
    from ttmf_spark.datapipe import dedup, similarity

    docs_tbl = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    t0 = time.perf_counter()
    n_pairs = dedup.minhash_lsh_pairs(docs_tbl, tau=0.8, k=64, bands=16).count()
    timings["dedup_minhash"] = time.perf_counter() - t0
    extras["near_dup_pairs"] = n_pairs

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    t0 = time.perf_counter()
    qs = emb.filter(F.col("vec_id") % 50 == 0)
    n_nn = similarity.brute_force_topk(emb, qs, k=10).count()
    timings["similarity_topk"] = time.perf_counter() - t0
    extras["topk_rows"] = n_nn

    # scaling probe input: replicated docs (id-suffixed copies), written once
    rep_path = None
    if DO_SCALING:
        rep_path = os.path.join(
            WORK, f"docs_{os.path.basename(SF_DIR)}_x{SCALING_REP}.parquet"
        )
        if not os.path.exists(rep_path + "/_SUCCESS"):
            docs = spark.read.parquet(docs_path)
            reps = [
                docs.select(
                    F.concat(F.col("doc_id"), F.lit(f"_r{i}")).alias("doc_id"), "spans"
                )
                for i in range(SCALING_REP)
            ]
            big = reps[0]
            for r in reps[1:]:
                big = big.unionByName(r)
            big.repartition(128).write.mode("overwrite").parquet(rep_path)
    spark.stop()

    # scaling probe: identical job + input + shuffle partitioning at
    # local[SCALING_BASE_CPUS] and local[CPUS]; cores are the only variable
    if DO_SCALING:
        thr = {}
        for cores in (SCALING_BASE_CPUS, int(CPUS)):
            s = get_spark(
                app_name=f"ttmf_bench_scale_{cores}",
                cores=str(cores),
                shuffle_partitions=2 * int(CPUS),
                extra_conf=BENCH_CONF,
            )
            outp = os.path.join(WORK, f"triples_out_scale_{cores}.parquet")
            dt_c, n_c = _run_extract(s, rep_path, SF_DIR, outp)
            s.stop()
            thr[cores] = n_c / dt_c
        ratio = int(CPUS) / SCALING_BASE_CPUS
        extras["scaling"] = {
            f"triples_per_sec_local{SCALING_BASE_CPUS}": round(thr[SCALING_BASE_CPUS], 1),
            f"triples_per_sec_local{int(CPUS)}": round(thr[int(CPUS)], 1),
            "input_replication": SCALING_REP,
            "cores_ratio": ratio,
            "efficiency": round((thr[int(CPUS)] / thr[SCALING_BASE_CPUS]) / ratio, 3),
        }

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "kg_construct_plus_ttmf_score_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": os.path.basename(SF_DIR),
                "cpus": CPUS,
                "extras": {
                    k: (v if isinstance(v, dict) else round(v, 3))
                    for k, v in extras.items()
                },
            }
        )
    )
    sys.stdout.flush()


if __name__ == "__main__":
    main()
