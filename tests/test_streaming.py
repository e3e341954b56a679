"""Incremental (streaming) extraction: exactly-once triple appends."""

from __future__ import annotations

import os

from tests.conftest import SF_UNIT
from ttmf_spark import corpus, streaming


def test_incremental_extract_matches_batch(spark, tmp_path):
    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")

    # drop the corpus as two file batches
    part1 = docs.filter("pmod(xxhash64(doc_id), 2) = 0")
    part2 = docs.filter("pmod(xxhash64(doc_id), 2) = 1")
    part1.write.mode("overwrite").parquet(in_dir)

    q = streaming.incremental_extract(spark, in_dir, out, ck, gaz, same)
    q.awaitTermination(300)
    n1 = spark.read.parquet(out).count()
    assert n1 > 0

    # second drop: only new docs processed (file-source checkpoint), and
    # the anti-join keeps the sink duplicate-free
    part2.write.mode("append").parquet(in_dir)
    q = streaming.incremental_extract(spark, in_dir, out, ck, gaz, same)
    q.awaitTermination(300)

    got = spark.read.parquet(out).select("s", "p", "o")
    truth = corpus.truth_triples(spark, SF_UNIT)
    assert got.count() == got.distinct().count()  # no duplicate appends
    assert got.distinct().count() == truth.count()
    assert got.exceptAll(truth).count() == 0
