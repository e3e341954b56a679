"""Instrumented scaling probe: per-stage wall times for the extract pipeline.

Usage: python scripts/probe_stages.py <cores> [input_path]

Times each stage of extract_triples separately (detect, link, assemble,
canonicalize, full write) at local[<cores>] on the replicated docs input,
printing one JSON line. Used to localize the round-1 scaling collapse
(BENCH_r01 extras.scaling efficiency 0.105).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ttmf_spark import corpus
from ttmf_spark.extract.assemble import assemble_triples
from ttmf_spark.extract.canonicalize import apply_canonical, canonical_map
from ttmf_spark.extract.linking import link_mentions
from ttmf_spark.extract.mentions import detect_mentions, flatten_docs
from ttmf_spark.session import get_spark

CORES = sys.argv[1] if len(sys.argv) > 1 else "32"
INPUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/ttmf_bench/docs_sf0.1_x8.parquet"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
BENCH_CONF = {
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    "spark.sql.files.maxPartitionBytes": "8m",
    "spark.sql.files.openCostInBytes": "0",
}


def main() -> None:
    spark = get_spark(
        app_name=f"probe_{CORES}", cores=CORES,
        shuffle_partitions=64, extra_conf=BENCH_CONF,
    )
    docs = spark.read.parquet(INPUT)
    gaz = corpus.gazetteer(spark, SF_DIR)
    same = corpus.same_as_edges(spark, SF_DIR)
    t: dict[str, float] = {}
    n: dict[str, int] = {}

    t0 = time.perf_counter()
    mentions = detect_mentions(flatten_docs(docs))
    n["mentions"] = mentions.count()
    t["detect"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    linked = link_mentions(mentions, gaz)
    n["linked"] = linked.count()
    t["detect_link"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    triples = assemble_triples(linked.select("doc_id", "pos", "slot", "entity"))
    n["assembled"] = triples.count()
    t["assemble"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    mapping = canonical_map(same)
    n["mapping"] = mapping.count()
    t["canonicalize_cc"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    out = apply_canonical(triples, mapping, ["s", "o"]).distinct()
    outp = f"/tmp/ttmf_bench/probe_out_{CORES}.parquet"
    shutil.rmtree(outp, ignore_errors=True)
    out.write.mode("overwrite").parquet(outp)
    t["canon_distinct_write"] = time.perf_counter() - t0
    n["triples"] = spark.read.parquet(outp).count()

    print(json.dumps({"cores": CORES, "times": {k: round(v, 2) for k, v in t.items()},
                      "counts": n, "total": round(sum(t.values()), 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
