"""Single-run end-to-end extract probe (the bench's scaling measurement).

Usage: python scripts/probe_e2e.py <cores> [maxPartitionBytes]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ttmf_spark import corpus
from ttmf_spark.extract import extract_triples
from ttmf_spark.session import get_spark

CORES = sys.argv[1]
MAXPB = sys.argv[2] if len(sys.argv) > 2 else "1m"
INPUT = "/tmp/ttmf_bench/docs_sf0.1_x8.parquet"
SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    spark = get_spark(
        app_name=f"e2e_{CORES}", cores=CORES, shuffle_partitions=64,
        extra_conf={
            "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
            "spark.sql.files.maxPartitionBytes": MAXPB,
            "spark.sql.files.openCostInBytes": "0",
        },
    )
    docs = spark.read.parquet(INPUT)
    gaz = corpus.gazetteer(spark, SF_DIR)
    same = corpus.same_as_edges(spark, SF_DIR)
    outp = f"/tmp/ttmf_bench/e2e_{CORES}.parquet"
    shutil.rmtree(outp, ignore_errors=True)
    t0 = time.perf_counter()
    extract_triples(docs, gaz, same).write.mode("overwrite").parquet(outp)
    dt = time.perf_counter() - t0
    n = spark.read.parquet(outp).count()
    print(json.dumps({"cores": CORES, "maxpb": MAXPB, "sec": round(dt, 2),
                      "triples": n, "tps": round(n / dt, 1)}))
    spark.stop()


if __name__ == "__main__":
    main()
