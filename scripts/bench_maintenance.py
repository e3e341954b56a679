"""Maintenance economics: incremental fold/retract/rerank wall time vs
full recompute at sf0.1 — the measured version of the chain's central
claim ("cost bounded by the delta, not the corpus",
extract/pipeline.py / canonicalize.py docstrings).

Measures, each as min-of-2 timed runs after one warm pass, at two delta
sizes (1% and 5%):

  (a) triple_support_incremental fold of a doc delta  vs full
      triple_support recompute on the union corpus;
  (b) components_decremental of an edge-retraction batch vs a cold
      connected_components on the survivors (both the driver union-find
      shortcut production uses at this SF and the distributed
      star-contraction a 100 TB graph would force), plus the
      bucket-pruned carve's scan reduction (rows + bucket dirs touched);
  (c) rerank_after_delta (warm, affected-cores-scoped) vs a cold
      personalized-PageRank re-rank of every core on the post-delta
      graph (reach tables shared by both sides — reach refresh cost is
      identical either way and excluded).

Maintained state (support table, doc_level, labels, prev ranks) is
materialized to parquet first, as a production steady state would hold
it. Emits one JSON line; the BENCH.md table is transcribed from it.

Usage: python scripts/bench_maintenance.py [sf_dir] [cpus]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from ttmf_spark import corpus
from ttmf_spark.extract.canonicalize import (
    components_decremental,
    connected_components,
)
from ttmf_spark.extract.pipeline import (
    doc_triples,
    triple_support,
    triple_support_incremental,
)
from ttmf_spark.io_util import read_bucket_pruned, write_partitioned
from ttmf_spark.kg import encode, graph, pagerank
from ttmf_spark.session import get_spark

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
CPUS = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
    "SPARK_GRAFT_CPUS", "32"
)
WORK = os.environ.get("SPARK_GRAFT_WORK", "/tmp/maint_bench")
N_CORES = int(os.environ.get("MAINT_CORES", "2048"))


def timed(fn, warm: int = 1, reps: int = 2) -> float:
    for _ in range(warm):
        fn()
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return round(best, 2)


def materialize(df, path):
    df.write.mode("overwrite").parquet(path)
    return df.sparkSession.read.parquet(path)


def main() -> None:
    shutil.rmtree(WORK, ignore_errors=True)
    os.makedirs(WORK, exist_ok=True)
    sections = os.environ.get("MAINT_SECTIONS", "abc")
    spark = get_spark(app_name="maint_bench", cores=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"sf_dir": SF_DIR, "cpus": CPUS}

    docs = corpus.interleaved_docs(spark, SF_DIR)
    gaz = corpus.gazetteer(spark, SF_DIR)
    same = corpus.same_as_edges(spark, SF_DIR)
    n_docs = docs.count()
    out["n_docs"] = n_docs

    # (a) support fold vs full recompute -----------------------------------
    support_rows = {}
    if "a" not in sections:
        support_rows = None
    for tag, mod in (
        ("event", max(1, n_docs // 10)), ("1pct", 100), ("5pct", 20)
    ) if support_rows is not None else ():
        pred = F.crc32(F.col("doc_id")) % mod == 0
        base_docs, delta_docs = docs.filter(~pred), docs.filter(pred)
        existing = materialize(
            triple_support(base_docs, gaz, same_as=same),
            os.path.join(WORK, f"support_{tag}"),
        )
        t_fold = timed(
            lambda: triple_support_incremental(
                existing, delta_docs, gaz, same_as=same
            ).count()
        )
        t_full = timed(lambda: triple_support(docs, gaz, same_as=same).count())
        support_rows[tag] = {
            "delta_docs": delta_docs.count(),
            "fold_sec": t_fold,
            "full_recompute_sec": t_full,
            "speedup": round(t_full / t_fold, 2),
        }
    if support_rows is not None:
        out["support_fold"] = support_rows

    # (b) CC retraction vs cold CC + bucket-pruned carve --------------------
    #
    # The operator's production target is the ALIAS graph — many bounded
    # components, not the KG skeleton's giant component (where "affected
    # component" degenerates to everything). Its at-scale stand-in here:
    # per-customer order chains (order_i -> order_{i+1} within each
    # customer), ~|orders| edges in |customers| components. The
    # maintained edge table is bucketed on the COMPONENT LABEL at write
    # time — the layout a label-keyed maintenance store would use — so
    # the carve's affected-old-component filter IS the bucket filter.
    from pyspark.sql import Window

    cc_rows = None
    if "b" in sections:
        orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
        w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
        chain = orders.select(
            "o_custkey", F.col("o_orderkey").alias("dst"),
            F.lag("o_orderkey").over(w).alias("src"),
        ).filter(F.col("src").isNotNull()).select("src", "dst")
        e = chain.localCheckpoint(eager=True)
        n_edges = e.count()
        labels = materialize(
            connected_components(e), os.path.join(WORK, "labels")
        )
        n_buckets = 64
        epath = os.path.join(WORK, "edges")
        lab_src = labels.select(
            F.col("node").alias("src"), F.col("component").alias("label")
        )
        write_partitioned(e.join(lab_src, "src"), epath, bucket_col="label",
                          n_buckets=n_buckets, sort_cols=["src", "dst"])
        full_scan = spark.read.parquet(epath)
        cc_rows = {"n_edges": n_edges}
    for tag, mod in (
        ("event", max(1, n_edges // 10)), ("1pct", 100), ("5pct", 20)
    ) if cc_rows is not None else ():
        dpred = F.pmod(F.xxhash64("src", "dst", F.lit(5)), F.lit(mod)) == 0
        deleted = e.filter(dpred).localCheckpoint(eager=True)
        surviving = e.filter(~dpred)
        t_cold_driver = timed(lambda: connected_components(surviving).count())
        t_cold_dist = timed(
            lambda: connected_components(surviving, driver_max_edges=0).count()
        )
        t_dec = timed(
            lambda: components_decremental(labels, full_scan, deleted).count()
        )

        def _aff():
            ends = deleted.select(F.col("src").alias("node")).union(
                deleted.select(F.col("dst").alias("node"))
            ).distinct()
            return ends.join(labels, "node").select("component").distinct()

        def _pruned_scan():
            return read_bucket_pruned(
                spark, epath, _aff(), key_col="component",
                n_buckets=n_buckets,
            )

        t_dec_pruned = timed(
            lambda: components_decremental(
                labels, _pruned_scan(), deleted
            ).count()
        )
        pr = _pruned_scan()
        cc_rows[tag] = {
            "deleted_edges": deleted.count(),
            "affected_components": _aff().count(),
            "decremental_sec": t_dec,
            "decremental_pruned_sec": t_dec_pruned,
            "cold_cc_driver_sec": t_cold_driver,
            "cold_cc_distributed_sec": t_cold_dist,
            "carve_rows_full": full_scan.count(),
            "carve_rows_pruned": pr.count(),
            "buckets_touched": pr.select("bucket").distinct().count(),
            "n_buckets": n_buckets,
        }
    if cc_rows is not None:
        out["cc_retract"] = cc_rows

    # (c) scoped warm rerank vs cold rerank ---------------------------------
    rank_rows = None
    if "c" in sections:
        truth = corpus.truth_triples(spark, SF_DIR)
        idt = encode.encode_triples(
            truth, encode.entity_dim(truth), encode.relation_dim(truth)
        ).localCheckpoint(eager=True)
        n_idt = idt.count()
        n_ent = int(idt.agg(F.max(F.greatest("h", "t"))).first()[0]) + 1
        cores = (
            spark.range(n_ent)
            .filter(F.pmod(F.xxhash64("id", F.lit(9)), F.lit(max(1, n_ent // N_CORES))) == 0)
            .select(F.col("id").alias("core"))
            .localCheckpoint(eager=True)
        )
        out["n_cores"] = cores.count()
        rank_rows = {}
    for tag, mod in (
        ("event", max(1, n_idt // 100)), ("01pct", 1000), ("1pct", 100)
    ) if rank_rows is not None else ():
        dpred = F.pmod(F.xxhash64("h", "t", F.lit(7)), F.lit(mod)) == 0
        pre, post = idt, idt.filter(~dpred)
        deleted = idt.filter(dpred).select(
            F.col("h").alias("src"), F.col("t").alias("dst")
        ).localCheckpoint(eager=True)

        def _tables(tr, path_tag):
            adj = graph.build_adjacency(tr)
            ew = graph.weighted_edges(adj).localCheckpoint(eager=True)
            reach = graph.reach_sets(adj, cores, depth=4).localCheckpoint(
                eager=True
            )
            sg = graph.subgraph_edges(ew, reach, depth=4).localCheckpoint(
                eager=True
            )
            nodes = graph.subgraph_nodes(sg, cores).localCheckpoint(eager=True)
            patched = pagerank.patched_edges(sg, nodes).localCheckpoint(
                eager=True
            )
            return ew, reach, nodes, patched

        _, reach_pre, nodes_pre, patched_pre = _tables(pre, "pre")
        prev = materialize(
            pagerank.pagerank_routed(patched_pre, nodes_pre),
            os.path.join(WORK, f"prev_ranks_{tag}"),
        )
        ew2, reach2, _, _ = _tables(post, "post")

        def _cold():
            # apples-to-apples with rerank_after_delta: the cold route
            # pays subgraph assembly for ALL cores from the same shared
            # (edges_w, reach) inputs the scoped route starts from
            sg = graph.subgraph_edges(ew2, reach2, depth=4)
            nodes = graph.subgraph_nodes(sg, cores)
            patched = pagerank.patched_edges(sg, nodes)
            return pagerank.pagerank_routed(patched, nodes).count()

        t_cold = timed(_cold)
        scope = reach_pre.unionByName(reach2).localCheckpoint(eager=True)
        t_maint = timed(
            lambda: pagerank.rerank_after_delta(
                ew2, reach2, cores, prev, deleted, depth=4,
                use_routed=True, scope_reach=scope,
            ).count()
        )
        aff = pagerank.affected_cores(scope, deleted, depth=4).count()
        rank_rows[tag] = {
            "deleted_edges": deleted.count(),
            "affected_cores": aff,
            "rerank_scoped_sec": t_maint,
            "rerank_cold_sec": t_cold,
            "speedup": round(t_cold / t_maint, 2),
        }
    if rank_rows is not None:
        out["rerank"] = rank_rows

    print(json.dumps(out))


if __name__ == "__main__":
    main()
