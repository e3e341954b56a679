"""JVM-config experiment for the scaling collapse: run the no-persist
assemble at a given core count under different heap/GC settings.

Usage: python scripts/probe_jvm.py <cores> <mem> [gc_flags...]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CORES = sys.argv[1]
MEM = sys.argv[2]
GC = " ".join(sys.argv[3:])

os.environ["SPARK_GRAFT_DRIVER_MEM"] = MEM

from ttmf_spark.extract.assemble import SPAN_RULES, _SLOTS  # noqa: E402
from ttmf_spark.session import get_spark  # noqa: E402

LINKED = "/tmp/ttmf_bench/linked_x8.parquet"
CONF = {
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    "spark.sql.files.maxPartitionBytes": "8m",
    "spark.sql.files.openCostInBytes": "0",
}
if GC:
    CONF["spark.driver.extraJavaOptions"] = GC


def main() -> None:
    spark = get_spark(app_name=f"jvm_{CORES}_{MEM}", cores=CORES,
                      shuffle_partitions=64, extra_conf=CONF)
    linked = spark.read.parquet(LINKED)
    t0 = time.perf_counter()
    agg = [F.max(F.when(F.col("slot") == s, F.col("entity"))).alias(s) for s in _SLOTS]
    wide = linked.groupBy("doc_id", "pos").agg(*agg)
    rule_arr = F.array(
        *[F.struct(F.col(s).alias("s"), F.lit(p).alias("p"), F.col(o).alias("o"))
          for p, s, o in SPAN_RULES]
    )
    span_triples = (
        wide.select(F.explode(rule_arr).alias("tr"))
        .select("tr.s", "tr.p", "tr.o")
        .filter(F.col("s").isNotNull() & F.col("o").isNotNull())
    )
    contains = (
        wide.select("doc_id", "order",
                    F.coalesce(F.col("part"), F.col("media_part")).alias("part_e"))
        .groupBy("doc_id")
        .agg(F.min("order").alias("order_e"), F.collect_list("part_e").alias("parts"))
        .filter(F.col("order_e").isNotNull())
        .select(F.col("order_e").alias("s"), F.lit("contains").alias("p"),
                F.explode("parts").alias("o"))
    )
    out = span_triples.unionByName(contains).distinct()
    outp = f"/tmp/ttmf_bench/jvm_{CORES}_{MEM}.parquet"
    shutil.rmtree(outp, ignore_errors=True)
    out.write.mode("overwrite").parquet(outp)
    dt = time.perf_counter() - t0
    print(json.dumps({"cores": CORES, "mem": MEM, "gc": GC, "sec": round(dt, 2)}))
    spark.stop()


if __name__ == "__main__":
    main()
