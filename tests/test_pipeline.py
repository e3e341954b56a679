"""End-to-end TTMF scoring + checkpoint/resume + evaluation tests."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.test_kg import TINY_TRIPLES
from ttmf_spark.checkpoint import StageStore, anti_join_resume
from ttmf_spark.kg import evaluate
from ttmf_spark.kg.pipeline import lowest_confidence, score_triples


@pytest.fixture(scope="module")
def tiny2(spark):
    return spark.createDataFrame(TINY_TRIPLES, ["s", "p", "o"])


def test_score_triples_end_to_end(spark, tiny2):
    scored, model = score_triples(
        spark, tiny2, kind="logistic", transe_kw={"epochs": 3}
    )
    rows = scored.collect()
    assert len(rows) == len(TINY_TRIPLES)
    assert {(r["s"], r["p"], r["o"]) for r in rows} == set(TINY_TRIPLES)
    for r in rows:
        assert 0.0 <= r["conf"] <= 1.0
        assert len(r["rr_features"]) == 6
    # error report: bottom-k ordering
    bottom = lowest_confidence(scored, k=3).collect()
    confs = [r["conf"] for r in bottom]
    assert confs == sorted(confs) and len(bottom) == 3


def test_scored_positives_above_corrupted(spark, tiny2):
    """Fused confidence separates true triples from corrupted ones on
    average (the reference's accuracy printouts are this check's analogue)."""
    from ttmf_spark.kg import encode, negatives
    from ttmf_spark.kg.pipeline import build_context, fit_fusion, score_ids

    ctx, model = build_context(spark, tiny2, transe_kw={"epochs": 20})
    model = fit_fusion(ctx, model, kind="logistic")
    pairs = ctx.dev_pairs
    scored = score_ids(spark, ctx, model, pairs.select("h", "r", "t", "flag"))
    pdf = scored.select("flag", "conf").toPandas()
    pos = pdf[pdf.flag == 1]["conf"].mean()
    neg = pdf[pdf.flag == -1]["conf"].mean()
    assert pos > neg, (pos, neg)


def test_two_embedding_mode(spark, tiny2):
    """ptranse_kw switches path ranking + crisscross frozen vectors to a
    separate PTransE fit (reference: TransE -> TransConfidence, PTransE ->
    SearchPaths2/Model1.py:162-164) while energy keeps the TransE fit."""
    from ttmf_spark.kg.pipeline import build_context

    ctx, model = build_context(
        spark, tiny2, transe_kw={"epochs": 2}, ptranse_kw={"epochs": 2}
    )
    assert model.path_ent_emb is not None
    assert not np.array_equal(model.p_ent, model.ent_emb)
    assert model.p_ent.shape == model.ent_emb.shape
    assert ctx.ranked_paths.count() > 0


def test_stage_store_resume(spark, tiny2, tmp_path):
    store = StageStore(str(tmp_path / "ck"))
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return tiny2

    df1 = store.materialize(spark, "s1", build)
    assert calls["n"] == 1 and df1.count() == len(TINY_TRIPLES)
    df2 = store.materialize(spark, "s1", build)  # resume: no rebuild
    assert calls["n"] == 1 and df2.count() == len(TINY_TRIPLES)
    store.materialize(spark, "s1", build, force=True)
    assert calls["n"] == 2
    # metrics log exists with one line per build
    lines = (tmp_path / "ck" / "_metrics.jsonl").read_text().strip().splitlines()
    assert len(lines) == 2


def test_anti_join_resume(spark, tiny2):
    done = tiny2.limit(4)
    remaining = anti_join_resume(tiny2, done, ["s", "p", "o"])
    assert remaining.count() == len(TINY_TRIPLES) - 4


def test_pr_sweep_matches_loop_oracle(spark):
    rows = [(0.1 * i, 1 if i % 3 == 0 else -1) for i in range(11)]
    df = spark.createDataFrame(rows, ["conf", "flag"])
    got = {r["threshold"]: r for r in evaluate.pr_sweep(df).collect()}
    # loop oracle (Model1.py:543-586 semantics)
    for th in (0.01, 0.51, 0.99):
        tp = sum(1.0 for c, f in rows if c >= th and f == 1)
        pred = sum(1.0 for c, f in rows if c >= th)
        pos = sum(1.0 for c, f in rows if f == 1)
        p, r = tp / (pred + 1e-5), tp / (pos + 1e-5)
        assert got[th]["precision"] == pytest.approx(p, abs=1e-9)
        assert got[th]["recall"] == pytest.approx(r, abs=1e-9)
        assert got[th]["f1"] == pytest.approx(2 * p * r / (p + r + 1e-5), abs=1e-9)


def test_link_prediction_ranks(spark):
    # query (0, 0): candidates 1..4, truth t=2 ranked by conf desc
    cands = spark.createDataFrame(
        [
            (0, 0, 1, 0.9, False),
            (0, 0, 2, 0.8, True),
            (0, 0, 3, 0.7, False),
            (0, 0, 4, 0.6, False),
        ],
        ["h", "r", "t", "conf", "is_true"],
    )
    raw = evaluate.link_prediction_ranks(cands).collect()
    assert raw[0]["rank"] == 2
    gold = spark.createDataFrame([(0, 0, 1)], ["h", "r", "t"])
    filt = evaluate.link_prediction_ranks(cands, gold).collect()
    assert filt[0]["rank"] == 1  # gold corruption excluded
    m = evaluate.rank_metrics(evaluate.link_prediction_ranks(cands)).collect()[0]
    assert m["hits10"] == 1.0 and m["mean_rank"] == 2.0


def test_lowest_confidence_threshold_filter(spark, tiny2):
    """P5 direct test: conf < theta filter (find_errors.py:54-67) drops
    rows at/above the threshold before the bottom-k."""
    scored, _ = score_triples(spark, tiny2, kind="logistic", transe_kw={"epochs": 3})
    confs = sorted(r["conf"] for r in scored.collect())
    theta = confs[len(confs) // 2]  # median: some below, some at/above
    out = lowest_confidence(scored, k=100, threshold=theta).collect()
    assert len(out) == sum(c < theta for c in confs)
    assert all(r["conf"] < theta for r in out)
    # unfiltered returns everything (k > n)
    assert len(lowest_confidence(scored, k=100).collect()) == len(confs)


def test_self_loop_zero_path_features(spark):
    """P7 direct test: a self-loop (h==t) triple has no ranked paths; the
    reference writes an empty path file for it (SearchPaths2.py:240-248)
    and downstream reads empty as all-zero path features
    (PrecessData.py:185). attach_path_summary must reproduce that."""
    from ttmf_spark.kg.fusion import attach_path_summary

    triples = spark.createDataFrame([(7, 0, 7), (1, 0, 2)], ["h", "r", "t"])
    ranked = spark.createDataFrame(
        [(1, 2, 0, 1, 3, 2, [0], 1, 0.5, 0.9)],
        ["h", "t", "r", "line", "ph", "pt", "pr", "len", "score", "rel_align"],
    )
    out = {(r["h"], r["t"]): r for r in attach_path_summary(triples, ranked).collect()}
    loop = out[(7, 7)]
    for k in (1, 2, 3):
        assert loop[f"path{k}_score"] == 0.0
        assert loop[f"path{k}_len"] == 0.0
        assert loop[f"path{k}_align"] == 0.0
    # the non-loop triple keeps its real line-1 path features
    assert out[(1, 2)]["path1_score"] == 0.5
    assert out[(1, 2)]["path1_align"] == 0.9


def test_cli_errors_subcommand(spark, tmp_path, monkeypatch):
    """The `python -m ttmf_spark errors` entry point end-to-end, sharing
    the test session (TTMF_KEEP_SESSION): extract -> score -> bottom-k
    report with the find_errors.py output contract."""
    from tests.conftest import SF_UNIT
    from ttmf_spark.__main__ import main

    monkeypatch.setenv("TTMF_KEEP_SESSION", "1")
    out = str(tmp_path / "errs")
    main([
        "errors", "--sf-dir", SF_UNIT, "--out", out,
        "--k", "7", "--transe-epochs", "2",
    ])
    rep = spark.read.parquet(out)
    rows = rep.collect()
    assert len(rows) == 7
    assert {"s", "p", "o", "conf"} <= set(rep.columns)
    confs = [r["conf"] for r in rows]
    # every report row carries a real confidence (file order is not a
    # parquet contract, so no order assertion here — lowest_confidence's
    # bottom-k semantics is pinned by its own unit test)
    assert all(c is not None for c in confs)


def test_bucket_layout_contract(spark, tmp_path):
    """The parquet sink honors the documented Iceberg ``bucket(N, s)``
    contract (io_util.write_partitioned + streaming's partitioned sink):
    (a) bucket id == pmod(xxhash64(key), N) exactly; (b) each output
    file holds rows of ONE bucket only (subject co-location — a reader
    filtering one subject hash touches one bucket's files, the pruned
    scan the Iceberg spec would give); (c) rows are sorted within files
    by the declared sort columns; (d) the bucket=K directory layout of
    the streaming sink prunes: reading one subdirectory yields exactly
    that bucket's rows. Green here == the layout swap to
    .format('iceberg') changes the catalog, not the data placement."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ttmf_spark.io_util import write_partitioned

    n_buckets = 8
    df = spark.range(500).select(
        F.concat(F.lit("S"), (F.col("id") % 97).cast("string")).alias("s"),
        F.concat(F.lit("P"), (F.col("id") % 5).cast("string")).alias("p"),
        F.col("id").cast("string").alias("o"),
    )
    path = str(tmp_path / "bucketed")
    write_partitioned(df, path, bucket_col="s", n_buckets=n_buckets,
                      sort_cols=["s", "p", "o"])

    want_bucket = {
        r["s"]: r["b"]
        for r in df.select(
            "s", F.pmod(F.xxhash64("s"), F.lit(n_buckets)).alias("b")
        ).distinct().collect()
    }
    files = sorted(glob.glob(path + "/bucket=*/part-*.parquet"))
    assert len(files) > 0
    seen_rows = 0
    for f in files:
        dir_bucket = int(f.split("bucket=")[1].split("/")[0])
        t = pq.read_table(f)
        rows = list(zip(t["s"].to_pylist(), t["p"].to_pylist(), t["o"].to_pylist()))
        seen_rows += len(rows)
        # (a)+(b): every row's hash-bucket == its file's directory bucket
        assert {want_bucket[s] for s, _, _ in rows} == {dir_bucket}, f
        # (c): sorted within the file by (s, p, o)
        assert rows == sorted(rows), f
    assert seen_rows == 500
    # directory set == the occupied bucket ids, so bucket=k pruning is real
    dirs = {int(d.split("bucket=")[1]) for d in glob.glob(path + "/bucket=*")}
    assert dirs == set(want_bucket.values())

    # (d) streaming sink layout: bucket=K dirs prune to exactly bucket K
    out2 = str(tmp_path / "sink")
    (df.withColumn("bucket", F.pmod(F.xxhash64("s", "p", "o"), F.lit(n_buckets)))
       .write.partitionBy("bucket").parquet(out2))
    one = spark.read.parquet(out2 + "/bucket=3")
    got = sorted(map(tuple, one.select("s", "p", "o").collect()))
    want = sorted(
        map(tuple,
            df.filter(F.pmod(F.xxhash64("s", "p", "o"), F.lit(n_buckets)) == 3)
            .collect())
    )
    assert got == want and len(got) > 0


def test_compact_partitioned_restores_one_file_per_bucket(spark, tmp_path):
    """compact_partitioned: after N incremental appends each bucket dir
    holds N small files; compaction restores one file per bucket while
    preserving the row multiset, the dir-bucket purity, and the
    within-file sort — the steady-state small-files maintenance op for
    the fold-maintained tables."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ttmf_spark.io_util import compact_partitioned, write_partitioned

    n_buckets = 8

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("S"), (F.col("id") % 97).cast("string")).alias("s"),
            F.concat(F.lit("P"), (F.col("id") % 5).cast("string")).alias("p"),
            F.col("id").cast("string").alias("o"),
        )

    path = str(tmp_path / "maintained")
    write_partitioned(batch(0, 300), path, bucket_col="s",
                      n_buckets=n_buckets, sort_cols=["s", "p", "o"])
    for lo in (300, 600, 900):  # three incremental folds
        write_partitioned(batch(lo, lo + 300), path, bucket_col="s",
                          n_buckets=n_buckets, sort_cols=["s", "p", "o"],
                          mode="append")
    want = sorted(
        map(tuple, spark.read.parquet(path).select("s", "p", "o").collect())
    )
    per_dir = {
        d: len(glob.glob(d + "/*.parquet"))
        for d in glob.glob(path + "/bucket=*")
    }
    assert max(per_dir.values()) > 1  # the small-files problem is real

    n_before = compact_partitioned(spark, path, sort_cols=["s", "p", "o"])
    assert n_before == sum(per_dir.values())

    files = sorted(glob.glob(path + "/bucket=*/*.parquet"))
    per_dir2 = {
        d: len(glob.glob(d + "/*.parquet"))
        for d in glob.glob(path + "/bucket=*")
    }
    assert set(per_dir2.values()) == {1}  # one file per bucket again
    assert set(per_dir2) == set(per_dir)  # same bucket dirs -> same pruning
    got = sorted(
        map(tuple, spark.read.parquet(path).select("s", "p", "o").collect())
    )
    assert got == want  # row multiset preserved
    for f in files:
        dir_bucket = int(f.split("bucket=")[1].split("/")[0])
        t = pq.read_table(f)
        rows = list(zip(t["s"].to_pylist(), t["p"].to_pylist(), t["o"].to_pylist()))
        hb = {r["b"] for r in spark.createDataFrame(
            [(s,) for s, _, _ in set(rows)], "s string"
        ).select(F.pmod(F.xxhash64("s"), F.lit(n_buckets)).alias("b")).collect()}
        assert hb == {dir_bucket}  # purity survives the rewrite
        assert rows == sorted(rows)  # and so does the within-file sort
    assert not glob.glob(path + ".bak") and not glob.glob(path + ".compacting")


def test_compact_partitioned_self_heals_crash_residue(spark, tmp_path):
    """Both crash residues of the two-rename swap recover at next entry:
    a crash between the renames (no <path>, .bak holds the table) rolls
    the backup forward; a crash before .bak cleanup (intact <path> plus
    stale .bak) clears the stale dir instead of failing the next
    rename."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from ttmf_spark.io_util import compact_partitioned, write_partitioned

    df = spark.range(200).select(
        F.concat(F.lit("S"), (F.col("id") % 37).cast("string")).alias("s"),
        F.col("id").cast("string").alias("o"),
    )
    path = str(tmp_path / "t")
    write_partitioned(df, path, bucket_col="s", n_buckets=4, sort_cols=["s", "o"])
    write_partitioned(df, path, bucket_col="s", n_buckets=4,
                      sort_cols=["s", "o"], mode="append")
    want = sorted(map(tuple, spark.read.parquet(path).select("s", "o").collect()))

    # crash between the renames: only .bak exists
    os.rename(path, path + ".bak")
    compact_partitioned(spark, path, sort_cols=["s", "o"])
    assert sorted(
        map(tuple, spark.read.parquet(path).select("s", "o").collect())
    ) == want
    assert not glob.glob(path + ".bak")

    # crash after the second rename, before cleanup: stale .bak remains
    shutil.copytree(path, path + ".bak")
    compact_partitioned(spark, path, sort_cols=["s", "o"])
    assert sorted(
        map(tuple, spark.read.parquet(path).select("s", "o").collect())
    ) == want
    assert not glob.glob(path + ".bak")


def test_compact_partitioned_versioned_object_store_safe(spark, tmp_path):
    """The rename-free versioned twin: same four contract assertions as
    the rename swap (file count restored to one per bucket, same bucket
    dirs, row multiset preserved, within-file sort + dir purity), PLUS
    the object-store crash contract — an uncommitted version dir (no
    _SUCCESS) is invisible to readers and compaction, and the previous
    committed version survives the compaction for racing readers."""
    import glob

    import pyarrow.parquet as pq
    from pyspark.sql import functions as F

    from ttmf_spark.io_util import (
        committed_versions,
        compact_partitioned_versioned,
        read_partitioned_current,
        write_partitioned_versioned,
    )

    n_buckets = 8

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.concat(F.lit("S"), (F.col("id") % 97).cast("string")).alias("s"),
            F.concat(F.lit("P"), (F.col("id") % 5).cast("string")).alias("p"),
            F.col("id").cast("string").alias("o"),
        )

    root = str(tmp_path / "vtab")
    v0 = write_partitioned_versioned(
        batch(0, 300), root, bucket_col="s", n_buckets=n_buckets,
        sort_cols=["s", "p", "o"],
    )
    assert v0 == 0 and committed_versions(spark, root) == [0]
    # incremental folds append files into the CURRENT version dir
    from ttmf_spark.io_util import write_partitioned

    for lo in (300, 600, 900):
        write_partitioned(batch(lo, lo + 300), f"{root}/v=0", bucket_col="s",
                          n_buckets=n_buckets, sort_cols=["s", "p", "o"],
                          mode="append")
    want = sorted(map(
        tuple, read_partitioned_current(spark, root).select("s", "p", "o").collect()
    ))
    per_dir = {
        d: len(glob.glob(d + "/*.parquet"))
        for d in glob.glob(root + "/v=0/bucket=*")
    }
    assert max(per_dir.values()) > 1

    # a crashed writer's residue: a version dir with data but no _SUCCESS
    import os
    import shutil

    shutil.copytree(root + "/v=0", root + "/v=7")
    os.remove(root + "/v=7/_SUCCESS")
    assert committed_versions(spark, root) == [0]  # invisible

    n_before = compact_partitioned_versioned(spark, root, sort_cols=["s", "p", "o"])
    assert n_before == sum(per_dir.values())
    assert committed_versions(spark, root) == [0, 1]  # previous retained
    cur = root + "/v=1"
    per_dir2 = {
        d: len(glob.glob(d + "/*.parquet"))
        for d in glob.glob(cur + "/bucket=*")
    }
    assert set(per_dir2.values()) == {1}
    assert {os.path.basename(d) for d in per_dir2} == {
        os.path.basename(d) for d in per_dir
    }
    got = sorted(map(
        tuple, read_partitioned_current(spark, root).select("s", "p", "o").collect()
    ))
    assert got == want
    for f in sorted(glob.glob(cur + "/bucket=*/*.parquet")):
        dir_bucket = int(f.split("bucket=")[1].split("/")[0])
        t = pq.read_table(f)
        rows = list(zip(t["s"].to_pylist(), t["p"].to_pylist(), t["o"].to_pylist()))
        hb = {r["b"] for r in spark.createDataFrame(
            [(s,) for s, _, _ in set(rows)], "s string"
        ).select(F.pmod(F.xxhash64("s"), F.lit(n_buckets)).alias("b")).collect()}
        assert hb == {dir_bucket}
        assert rows == sorted(rows)
    # a second compaction prunes beyond keep=2: v=0 goes, readers move on
    compact_partitioned_versioned(spark, root, sort_cols=["s", "p", "o"])
    assert committed_versions(spark, root) == [1, 2]
    assert sorted(map(
        tuple, read_partitioned_current(spark, root).select("s", "p", "o").collect()
    )) == want
    # a crashed WRITER's residue at the next version number (v=3, no
    # _SUCCESS) is overwritten by the next committed write, as the
    # write_partitioned_versioned docstring claims
    import pyspark.sql.functions as _F

    os.makedirs(root + "/v=3/bucket=0", exist_ok=True)
    with open(root + "/v=3/bucket=0/garbage.parquet", "w") as fh:
        fh.write("not parquet")
    v3 = write_partitioned_versioned(
        batch(0, 50).withColumn("o", _F.col("o")), root, bucket_col="s",
        n_buckets=n_buckets, sort_cols=["s", "p", "o"],
    )
    assert v3 == 3 and committed_versions(spark, root) == [1, 2, 3]
    assert read_partitioned_current(spark, root).count() == 50


def test_composed_lifecycle_matches_from_scratch(spark, tmp_path):
    """The maintenance capstone: EVERY event type interleaved across
    three batches — doc adds (fold), an alias delta that MERGES
    (components_incremental -> label_remap -> resupport_after_merge),
    more doc adds under the merged mapping, doc RETRACTIONS
    (triple_support_decremental), an alias retraction that SPLITS
    (components_decremental -> resupport_from_docs), then an
    object-store-safe compaction pass — and the final maintained
    (support, doc_level) pair equals triple_support / doc_triples
    rebuilt from scratch on the final corpus under the final alias
    graph. This is the interleaved fold cadence the scope_reach /
    resupport docstrings reserve; the driver twin (kg_maintenance_e2e)
    gates the same flow against a DuckDB cold build at sf0.01."""
    from tests.conftest import SF_UNIT
    from ttmf_spark import corpus
    from ttmf_spark.extract.canonicalize import (
        components_decremental,
        components_incremental,
        connected_components,
        label_remap,
    )
    from ttmf_spark.extract.pipeline import (
        _support_agg,
        doc_triples,
        resupport_after_merge,
        resupport_from_docs,
        triple_support,
        triple_support_decremental,
        triple_support_incremental,
    )
    from ttmf_spark.io_util import (
        compact_partitioned_versioned,
        read_partitioned_current,
        write_partitioned_versioned,
    )

    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)

    batch = F.crc32(F.col("doc_id")) % 3
    b0, b1, b2 = (docs.filter(batch == i) for i in range(3))
    is_add = F.crc32(F.concat_ws("|", "src", "dst")) % 3 == 0
    base_same, delta_add = same.filter(~is_add), same.filter(is_add)
    deleted_docs = docs.select("doc_id").filter(F.crc32("doc_id") % 5 == 2)
    retract_al = same.filter(F.crc32(F.concat_ws("|", "src", "dst")) % 4 == 2)
    for frame in (delta_add, deleted_docs, retract_al):
        assert frame.count() > 0  # every event type actually fires

    def _map(labels):
        return labels.select(
            F.col("node").alias("entity"), F.col("component").alias("canonical")
        )

    labels = connected_components(base_same).localCheckpoint(eager=True)
    doc_level = doc_triples(b0, gaz, mapping=_map(labels)).localCheckpoint(True)
    support = _support_agg(doc_level).localCheckpoint(True)

    b1_dl = doc_triples(b1, gaz, mapping=_map(labels)).localCheckpoint(True)
    support = triple_support_incremental(
        support, None, None, delta_doc_level=b1_dl
    ).localCheckpoint(True)
    doc_level = doc_level.unionByName(b1_dl).localCheckpoint(True)
    new_labels = components_incremental(labels, delta_add).localCheckpoint(True)
    remap = label_remap(labels, new_labels).localCheckpoint(True)
    assert remap.count() > 0  # the delta really merges clusters
    support, doc_level = resupport_after_merge(support, doc_level, remap)
    support, doc_level = (
        support.localCheckpoint(True), doc_level.localCheckpoint(True)
    )
    labels = new_labels

    b2_dl = doc_triples(b2, gaz, mapping=_map(labels)).localCheckpoint(True)
    support = triple_support_incremental(
        support, None, None, delta_doc_level=b2_dl
    ).localCheckpoint(True)
    doc_level = doc_level.unionByName(b2_dl).localCheckpoint(True)
    support, doc_level = triple_support_decremental(
        support, doc_level, deleted_docs
    )
    support, doc_level = (
        support.localCheckpoint(True), doc_level.localCheckpoint(True)
    )
    split_labels = components_decremental(
        labels, same, retract_al
    ).localCheckpoint(True)
    remap2 = label_remap(labels, split_labels).localCheckpoint(True)
    assert remap2.count() > 0  # the retraction really splits clusters
    surviving = docs.join(F.broadcast(deleted_docs), "doc_id", "left_anti")
    support, doc_level = resupport_from_docs(
        support, doc_level, remap2, surviving, gaz, _map(split_labels)
    )

    root = str(tmp_path / "support")
    write_partitioned_versioned(
        support, root, bucket_col="s", n_buckets=8, sort_cols=["s", "p", "o"]
    )
    compact_partitioned_versioned(spark, root, sort_cols=["s", "p", "o"])
    served = read_partitioned_current(spark, root)

    final_same = same.join(retract_al, ["src", "dst"], "left_anti")
    want_support = triple_support(surviving, gaz, same_as=final_same)
    got = {
        (r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in served.collect()
    }
    want = {
        (r.s, r.p, r.o): (r.n_docs, r.first_doc)
        for r in want_support.collect()
    }
    assert got == want
    want_doc = doc_triples(surviving, gaz, same_as=final_same)
    assert {(r.doc_id, r.s, r.p, r.o) for r in doc_level.collect()} == {
        (r.doc_id, r.s, r.p, r.o) for r in want_doc.collect()
    }


def test_incremental_maintenance_chain_matches_full_recompute(spark):
    """The whole incremental story composes: a new doc batch folds into
    every long-lived table WITHOUT rescanning the base corpus, and each
    maintained table equals its full-recompute twin on the union corpus.

    Chain (each step consumes the previous step's delta output):
    1. extraction is doc-local, so maintained triples = base ∪
       extract(delta batch) — no base rescan;
    2. provenance: triple_support_incremental fold == full recompute;
    3. ranks: the delta batch's triples name the re-rank scope
       (affected_cores is src-keyed), rerank_after_delta == full cold
       recompute on the post-delta graph, untouched cores verbatim.
    """
    from tests.conftest import SF_UNIT
    from ttmf_spark import corpus
    from ttmf_spark.extract import extract_triples
    from ttmf_spark.extract.pipeline import (
        triple_support,
        triple_support_incremental,
    )
    from ttmf_spark.kg import graph, pagerank

    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    base_docs = docs.filter(F.crc32(F.col("doc_id")) % 3 != 0)
    delta_docs = docs.filter(F.crc32(F.col("doc_id")) % 3 == 0)
    assert base_docs.count() > 0 and delta_docs.count() > 0

    # 1. triples: union of per-batch extraction == full extraction
    base_triples = extract_triples(base_docs, gaz, same).localCheckpoint(
        eager=True
    )
    delta_triples = extract_triples(delta_docs, gaz, same).localCheckpoint(
        eager=True
    )
    maintained = base_triples.unionByName(delta_triples).distinct()
    full = extract_triples(docs, gaz, same)
    assert maintained.exceptAll(full).isEmpty()
    assert full.exceptAll(maintained).isEmpty()

    # 2. provenance fold == full recompute (same canonical mapping)
    support_base = triple_support(base_docs, gaz, same_as=same).localCheckpoint(
        eager=True
    )
    folded = triple_support_incremental(support_base, delta_docs, gaz, same_as=same)
    want = triple_support(docs, gaz, same_as=same)
    f = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in folded.collect()}
    w = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in want.collect()}
    assert f == w

    # 3. ranks: delta triples scope the re-rank; maintained == full cold.
    # Node keys are entity NAMES — pagerank_iterative is pure DataFrame
    # joins, so keys need not be dense ids.
    def build(tr, cores):
        adj = graph.build_adjacency(
            tr.select(F.col("s").alias("h"), F.col("p").alias("r"), F.col("o").alias("t"))
        )
        ew = graph.weighted_edges(adj)
        reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
        sg = graph.subgraph_edges(ew, reach, depth=4).localCheckpoint(eager=True)
        nodes = graph.subgraph_nodes(sg, cores)
        return ew, reach, pagerank.pagerank_iterative(
            pagerank.patched_edges(sg, nodes), nodes
        )

    # two cores present in the base snapshot
    core_rows = [
        r.s for r in base_triples.select("s").distinct().orderBy("s").limit(2).collect()
    ]
    cores = spark.createDataFrame([(c,) for c in core_rows], ["core"])
    _, _, prev = build(base_triples, cores)
    prev = prev.localCheckpoint(eager=True)
    ew_post, reach_post, cold = build(maintained, cores)
    delta_edges = delta_triples.select(
        F.col("s").alias("src"), F.col("o").alias("dst")
    )
    maint = pagerank.rerank_after_delta(
        ew_post, reach_post, cores, prev, delta_edges, depth=4
    )
    c = {(r["core"], r["node"]): r["pr"] for r in cold.collect()}
    m = {(r["core"], r["node"]): r["pr"] for r in maint.collect()}
    assert set(c) == set(m)
    for k in c:
        assert m[k] == pytest.approx(c[k], abs=1e-4)
