"""Cluster launch entrypoint (north rule: "run via spark-submit
--py-files on a multi-executor cluster").

Usage (cluster):
    scripts/submit.sh extract --sf-dir /data/sf1 --out /out/triples
    scripts/submit.sh score   --sf-dir /data/sf1 --out /out/scored \
        --kind crisscross --checkpoint /ck/run1

Usage (local dev):
    python -m ttmf_spark extract --master 'local[8]' \
        --sf-dir /root/testdata/sf0.001 --out /tmp/triples

Under spark-submit the session config (master, executors, --py-files)
comes from the submit command line; ``--master`` here is only for plain
``python -m`` runs. Outputs are written with the bucketed partitioned
layout (``io_util.write_partitioned`` — the parquet stand-in for an
Iceberg ``bucket(N, s)`` spec), and scoring checkpoints/stage metrics go
through ``StageStore`` so a killed run resumes per-stage.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def _build_session(args):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        return active
    if args.master:
        # plain-python path: our tuned factory (AQE, Arrow, ParallelGC)
        from ttmf_spark.session import get_spark

        cores = args.master.split("[")[-1].rstrip("]") if "[" in args.master else "8"
        return get_spark(app_name=f"ttmf_{args.cmd}", cores=cores)
    # spark-submit path: master/executors come from the submit conf
    return SparkSession.builder.appName(f"ttmf_{args.cmd}").getOrCreate()


def _inputs(spark, args):
    from ttmf_spark import corpus

    docs = (
        spark.read.parquet(args.docs)
        if args.docs
        else corpus.interleaved_docs(spark, args.sf_dir)
    )
    gaz = corpus.gazetteer(spark, args.sf_dir)
    same = corpus.same_as_edges(spark, args.sf_dir)
    return docs, gaz, same


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(prog="ttmf_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)
    common = argparse.ArgumentParser(add_help=False)
    common.add_argument("--sf-dir", required=True, help="input table directory")
    common.add_argument("--docs", help="override docs parquet path")
    common.add_argument("--out", required=True, help="output table path")
    common.add_argument("--master", help="master for plain-python runs only")
    common.add_argument("--buckets", type=int, default=64)
    sub.add_parser("extract", parents=[common], help="docs -> (s,p,o) triples")
    score_common = argparse.ArgumentParser(add_help=False)
    score_common.add_argument("--kind", default="logistic",
                              choices=["logistic", "mlp", "crisscross"])
    score_common.add_argument("--checkpoint",
                              help="StageStore dir (resume + metrics)")
    score_common.add_argument("--transe-epochs", type=int, default=50)
    sub.add_parser(
        "score", parents=[common, score_common],
        help="docs -> trust-scored triples",
    )
    er = sub.add_parser(
        "errors", parents=[common, score_common],
        help="bottom-k lowest-confidence triples (reference find_errors.py)",
    )
    er.add_argument("--k", type=int, default=100)
    er.add_argument("--threshold", type=float, default=None,
                    help="optional conf < theta pre-filter (P5)")
    args = ap.parse_args(argv)

    spark = _build_session(args)
    from ttmf_spark.extract import extract_triples
    from ttmf_spark.io_util import write_partitioned

    docs, gaz, same = _inputs(spark, args)
    t0 = time.perf_counter()
    triples = extract_triples(docs, gaz, same)
    if args.cmd in ("score", "errors"):
        from ttmf_spark.checkpoint import StageStore
        from ttmf_spark.kg.pipeline import lowest_confidence, score_triples

        store = StageStore(args.checkpoint) if args.checkpoint else None
        scored, _model = score_triples(
            spark, triples, kind=args.kind, store=store,
            transe_kw={"epochs": args.transe_epochs},
        )
        if args.cmd == "errors":
            # k-row report (find_errors.py:54-67): no bucketing needed
            report = lowest_confidence(
                scored, k=args.k, threshold=args.threshold,
                tie_cols=["s", "p", "o"],
            )
            report.coalesce(1).write.mode("overwrite").parquet(args.out)
        else:
            write_partitioned(scored, args.out, bucket_col="s",
                              n_buckets=args.buckets, sort_cols=["s", "p", "o"])
    else:
        write_partitioned(triples, args.out, bucket_col="s",
                          n_buckets=args.buckets, sort_cols=["s", "p", "o"])
    n = spark.read.parquet(args.out).count()
    print(json.dumps({
        "cmd": args.cmd, "rows": n,
        "seconds": round(time.perf_counter() - t0, 2),
        "out": args.out,
    }))
    # leave session shutdown to spark-submit / caller when shared
    if os.environ.get("TTMF_KEEP_SESSION") != "1":
        spark.stop()


if __name__ == "__main__":
    main(sys.argv[1:])
