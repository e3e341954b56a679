"""Isolate the assemble stage: pre-materialize linked mentions, then time
assemble variants at a given core count.

Usage: python scripts/probe_assemble.py <cores> [variant ...]
Variants: persist | noprersist | docid (repartition by doc_id, ReuseExchange)
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ttmf_spark import corpus
from ttmf_spark.extract.assemble import SPAN_RULES, _SLOTS
from ttmf_spark.extract.linking import link_mentions
from ttmf_spark.extract.mentions import detect_mentions, flatten_docs
from ttmf_spark.session import get_spark

CORES = sys.argv[1] if len(sys.argv) > 1 else "32"
VARIANTS = sys.argv[2:] or ["persist", "nopersist", "docid"]
INPUT = "/tmp/ttmf_bench/docs_sf0.1_x8.parquet"
SF_DIR = "/root/testdata/sf0.1"
LINKED = "/tmp/ttmf_bench/linked_x8.parquet"
BENCH_CONF = {
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "4m",
    "spark.sql.files.maxPartitionBytes": "8m",
    "spark.sql.files.openCostInBytes": "0",
}


def _span_triples(wide):
    rule_arr = F.array(
        *[
            F.struct(F.col(s).alias("s"), F.lit(p).alias("p"), F.col(o).alias("o"))
            for p, s, o in SPAN_RULES
        ]
    )
    return (
        wide.select(F.explode(rule_arr).alias("tr"))
        .select("tr.s", "tr.p", "tr.o")
        .filter(F.col("s").isNotNull() & F.col("o").isNotNull())
    )


def _contains(wide):
    return (
        wide.select(
            "doc_id", "order",
            F.coalesce(F.col("part"), F.col("media_part")).alias("part_e"),
        )
        .groupBy("doc_id")
        .agg(F.min("order").alias("order_e"), F.collect_list("part_e").alias("parts"))
        .filter(F.col("order_e").isNotNull())
        .select(F.col("order_e").alias("s"), F.lit("contains").alias("p"),
                F.explode("parts").alias("o"))
    )


def main() -> None:
    spark = get_spark(app_name=f"pa_{CORES}", cores=CORES,
                      shuffle_partitions=64, extra_conf=BENCH_CONF)
    if not os.path.exists(LINKED + "/_SUCCESS"):
        docs = spark.read.parquet(INPUT)
        gaz = corpus.gazetteer(spark, SF_DIR)
        linked = link_mentions(detect_mentions(flatten_docs(docs)), gaz)
        linked.select("doc_id", "pos", "slot", "entity").write.mode(
            "overwrite").parquet(LINKED)

    res = {}
    for variant in VARIANTS:
        linked = spark.read.parquet(LINKED)
        t0 = time.perf_counter()
        agg = [F.max(F.when(F.col("slot") == s, F.col("entity"))).alias(s)
               for s in _SLOTS]
        if variant == "docid":
            wide = linked.repartition(64, "doc_id").groupBy("doc_id", "pos").agg(*agg)
        else:
            wide = linked.groupBy("doc_id", "pos").agg(*agg)
        if variant == "persist":
            wide = wide.persist(StorageLevel.MEMORY_AND_DISK)
        out = _span_triples(wide).unionByName(_contains(wide)).distinct()
        outp = f"/tmp/ttmf_bench/asm_{variant}_{CORES}.parquet"
        shutil.rmtree(outp, ignore_errors=True)
        out.write.mode("overwrite").parquet(outp)
        res[variant] = round(time.perf_counter() - t0, 2)
        if variant == "persist":
            wide.unpersist()
    print(json.dumps({"cores": CORES, "assemble": res}))
    spark.stop()


if __name__ == "__main__":
    main()
