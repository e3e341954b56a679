"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Prints ONE JSON line: {"metric": ..., "value": <total sec>, "unit": "sec",
"queries": {...per-query sec...}, "sf": ..., "extras": {...}}.

The headline metric is end-to-end KG construction throughput
(docs -> extract -> link -> canonicalize -> materialize), measured from a
pre-materialized interleaved-docs parquet (generation is not part of the
pipeline under test). TTMF scoring stages are added to the timed pipeline
as they land.

Scaling-efficiency evidence (BASELINE.json: >=0.8 from N to 4N executors)
is produced by scripts/scaling_bench.sh running this file at
SPARK_GRAFT_CPUS=8 and =32 on the identical input.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from ttmf_spark import corpus
from ttmf_spark.extract import extract_triples
from ttmf_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
WORK = os.environ.get("SPARK_GRAFT_WORK", "/tmp/ttmf_bench")


def _materialize_inputs(spark, sf_dir: str, work: str) -> str:
    """Write the interleaved-docs corpus once (untimed input fixture)."""
    docs_path = os.path.join(work, f"docs_{os.path.basename(sf_dir)}.parquet")
    marker = docs_path + "/_SUCCESS"
    if not os.path.exists(marker):
        corpus.interleaved_docs(spark, sf_dir).repartition(64).write.mode(
            "overwrite"
        ).parquet(docs_path)
    return docs_path


def main() -> None:
    spark = get_spark(app_name="ttmf_bench", cores=CPUS)
    os.makedirs(WORK, exist_ok=True)
    docs_path = _materialize_inputs(spark, SF_DIR, WORK)

    timings: dict[str, float] = {}
    extras: dict[str, float] = {}

    # q1: end-to-end KG construction (extract -> link -> canonicalize -> write)
    out_path = os.path.join(WORK, "triples_out.parquet")
    shutil.rmtree(out_path, ignore_errors=True)
    docs = spark.read.parquet(docs_path)
    gaz = corpus.gazetteer(spark, SF_DIR)
    same = corpus.same_as_edges(spark, SF_DIR)
    t0 = time.perf_counter()
    triples = extract_triples(docs, gaz, same)
    triples.write.mode("overwrite").parquet(out_path)
    t1 = time.perf_counter()
    timings["kg_construct_e2e"] = t1 - t0
    n_triples = spark.read.parquet(out_path).count()
    extras["triples_out"] = n_triples
    extras["triples_per_sec"] = n_triples / timings["kg_construct_e2e"]

    # q2: span flatten scan (input-invariant surface)
    t0 = time.perf_counter()
    n_spans = spark.read.parquet(docs_path).select(
        "doc_id", "spans"
    ).selectExpr("doc_id", "posexplode(spans) as (pos, span)").count()
    timings["span_flatten"] = time.perf_counter() - t0
    extras["spans"] = n_spans

    total = sum(timings.values())
    print(
        json.dumps(
            {
                "metric": "kg_construct_e2e_sec",
                "value": round(total, 3),
                "unit": "sec",
                "queries": {k: round(v, 3) for k, v in timings.items()},
                "sf": os.path.basename(SF_DIR),
                "cpus": CPUS,
                "extras": {k: round(v, 3) for k, v in extras.items()},
            }
        )
    )
    sys.stdout.flush()
    spark.stop()


if __name__ == "__main__":
    main()
