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


def test_canonicalize_stream_matches_batch(spark, tmp_path):
    """Streaming alias-graph canonicalization (canonicalize_stream):
    edge files land in three drops processed one file per micro-batch —
    so components merge ACROSS batches through the incremental fold — and
    the served labeling must equal a from-scratch connected_components
    over everything landed, after the backlog run AND after a resume."""
    from pyspark.sql import functions as F

    from ttmf_spark.extract.canonicalize import connected_components

    same = corpus.same_as_edges(spark, SF_UNIT)
    in_dir = str(tmp_path / "alias_in")
    labels = str(tmp_path / "labels")
    ck = str(tmp_path / "alias_ck")

    # split so each alias chain's two hops (A->B, B->canonical) land in
    # DIFFERENT micro-batches: the fold must merge existing components
    part = F.pmod(F.xxhash64("src", "dst"), F.lit(3))
    same.filter(part == 0).coalesce(1).write.mode("overwrite").parquet(in_dir)
    same.filter(part == 1).coalesce(1).write.mode("append").parquet(in_dir)

    q = streaming.canonicalize_stream(spark, in_dir, labels, ck, max_files=1)
    q.awaitTermination(300)
    got = streaming.read_canonical_labels(spark, labels)
    want = connected_components(same.filter(part != 2))
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    # third drop after a stop: the restarted query folds only the new file
    same.filter(part == 2).coalesce(1).write.mode("append").parquet(in_dir)
    q = streaming.canonicalize_stream(spark, in_dir, labels, ck, max_files=1)
    q.awaitTermination(300)
    got2 = streaming.read_canonical_labels(spark, labels)
    want2 = connected_components(same)
    assert got2.exceptAll(want2).count() == 0
    assert want2.exceptAll(got2).count() == 0


def test_windowed_counts_stream_matches_batch(spark, tmp_path):
    """Watermarked streaming windowed agg == batch operator on emitted
    windows, with late (out-of-order) events landing in their correct
    windows. Two file drops force multi-batch processing; the second drop
    is a hash-chosen 20% of events that are late w.r.t. the first."""
    from pyspark.sql import functions as F

    from ttmf_spark.datapipe import events as evops

    ev = spark.read.parquet(f"{SF_UNIT}/events.parquet")
    in_dir = str(tmp_path / "evt_in")
    late = F.pmod(F.xxhash64("event_id"), F.lit(5)) == 0
    ev.filter(~late).write.mode("overwrite").parquet(in_dir)
    ev.filter(late).write.mode("append").parquet(in_dir)

    q = streaming.windowed_counts_stream(
        spark, in_dir, width_minutes=60, watermark="2 hours",
        query_name="wcs_test",
    )
    q.awaitTermination(300)
    got = spark.table("wcs_test")
    batch = evops.windowed_counts(ev, width_minutes=60)

    n_got, n_batch = got.count(), batch.count()
    assert n_got > 0
    # every emitted window agrees EXACTLY with the batch twin (late rows
    # included in their event-time windows, not arrival-time ones)
    assert got.exceptAll(batch).count() == 0
    # only the watermark-trailing windows may be unemitted
    assert n_got >= int(n_batch * 0.8)


def test_sessionize_stream_matches_batch(spark, tmp_path):
    """Stateful streaming sessionization (applyInPandasWithState) emits
    exactly the batch sessions for every provably-closed session, with
    identical consecutive session_seq numbering, across multi-batch
    arrival with late events."""
    from pyspark.sql import functions as F

    from ttmf_spark.datapipe import events as evops

    ev = spark.read.parquet(f"{SF_UNIT}/events.parquet")
    in_dir = str(tmp_path / "sess_in")
    late = F.pmod(F.xxhash64("event_id"), F.lit(5)) == 0
    ev.filter(~late).write.mode("overwrite").parquet(in_dir)
    ev.filter(late).write.mode("append").parquet(in_dir)

    q = streaming.sessionize_stream(
        spark, in_dir, gap_minutes=30, watermark="2 hours",
        query_name="ss_test",
    )
    q.awaitTermination(300)
    got = spark.table("ss_test")
    batch = evops.sessionize(ev, gap_minutes=30)

    n_got, n_batch = got.count(), batch.count()
    assert n_got > 0
    assert got.exceptAll(batch).count() == 0  # exact rows incl. seq + sums
    assert n_got >= int(n_batch * 0.5)  # only watermark-trailing stay open


def test_dedup_stream_matches_batch(spark, tmp_path):
    from ttmf_spark.datapipe import dedup

    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet")
    in_dir = str(tmp_path / "docs_in")
    docs.write.mode("overwrite").parquet(in_dir)

    q = streaming.dedup_stream(spark, in_dir, query_name="dedup_stream_t")
    q.awaitTermination(300)
    got = spark.sql("SELECT doc_id, fingerprint FROM dedup_stream_t")

    batch = dedup.exact_dedup(docs)
    # same fingerprint set, one survivor each...
    assert sorted(r["fingerprint"] for r in got.collect()) == sorted(
        r["fingerprint"] for r in batch.collect()
    )
    assert got.count() == got.select("fingerprint").distinct().count()
    # ...and each kept doc really belongs to its fingerprint's dup group
    from ttmf_spark.datapipe.textstats import with_fingerprint

    fp_all = with_fingerprint(docs).select("doc_id", "fingerprint")
    assert got.join(fp_all, ["doc_id", "fingerprint"]).count() == got.count()


def test_near_dup_stream_matches_batch(spark, tmp_path):
    """Streaming MinHash-LSH near-dup over two file drops == the batch
    minhash_lsh_pairs pair set on the same corpus (same tau/k/bands),
    with no duplicate pair appends across batches."""
    from pyspark.sql import functions as F

    from ttmf_spark.datapipe import dedup

    docs = spark.read.parquet(f"{SF_UNIT}/documents.parquet")
    in_dir = str(tmp_path / "nd_in")
    pairs = str(tmp_path / "nd_pairs")
    index = str(tmp_path / "nd_index")
    ck = str(tmp_path / "nd_ck")

    half = F.pmod(F.xxhash64("doc_id"), F.lit(2)) == 0
    docs.filter(half).write.mode("overwrite").parquet(in_dir)
    q = streaming.near_dup_stream(spark, in_dir, pairs, index, ck, tau=0.5)
    q.awaitTermination(300)

    docs.filter(~half).write.mode("append").parquet(in_dir)
    q = streaming.near_dup_stream(spark, in_dir, pairs, index, ck, tau=0.5)
    q.awaitTermination(300)

    got = spark.read.parquet(pairs)
    batch = dedup.minhash_lsh_pairs(docs, tau=0.5)
    g = {(r["a"], r["b"], r["jaccard"]) for r in got.collect()}
    b = {(r["a"], r["b"], r["jaccard"]) for r in batch.collect()}
    assert got.count() == len(g)  # no duplicate appends
    assert g == b
    # the index sink carries bands rows per doc
    assert spark.read.parquet(index).count() == docs.count() * 16


def test_cms_stream_matches_batch(spark, tmp_path):
    """The streaming CMS counter table over two file drops equals the
    batch cms_counts counter table on the same events: the counter
    monoid makes the sketch incrementally maintainable with O(w*d)
    state."""
    from pyspark.sql import functions as F

    from ttmf_spark.datapipe.dedup import u60

    ev = spark.read.parquet(f"{SF_UNIT}/events.parquet")
    in_dir = str(tmp_path / "ev_in")
    half = F.pmod(F.xxhash64("event_id"), F.lit(2)) == 0
    ev.filter(half).write.mode("overwrite").parquet(in_dir)
    ev.filter(~half).write.mode("append").parquet(in_dir)

    q = streaming.cms_stream(
        spark, in_dir, width=8, depth=3, query_name="cms_stream_t"
    )
    q.awaitTermination(300)
    got = {(r["d"], r["cell"]): r["c"] for r in spark.table("cms_stream_t").collect()}

    key_s = F.col("user_id").cast("string")
    want = {}
    for d in range(3):
        rows = (
            ev.select(F.pmod(u60(key_s, seed=d), F.lit(8)).cast("int").alias("cell"))
            .groupBy("cell").agg(F.count("*").alias("c")).collect()
        )
        for r in rows:
            want[(d, r["cell"])] = r["c"]
    assert got == want
    assert sum(got.values()) == ev.count() * 3


def test_canonicalize_stream_remap_hook_maintains_support(spark, tmp_path):
    """ST5's mapping-version hook: when a streamed alias batch MERGES
    clusters, ``on_remap`` receives the label_remap merge map and the
    maintained triple-support + doc-level provenance tables re-key via
    resupport_after_merge — ending equal to a from-scratch recompute
    under the full alias graph (the N22 alias-merge precondition, now
    closed in code rather than documentation)."""
    from pyspark.sql import functions as F

    from ttmf_spark.extract.pipeline import (
        _support_agg,
        doc_triples,
        resupport_after_merge,
        triple_support,
    )

    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    part = F.pmod(F.xxhash64("src", "dst"), F.lit(2))
    drop1, drop2 = same.filter(part == 0), same.filter(part == 1)

    in_dir = str(tmp_path / "alias_in")
    labels = str(tmp_path / "labels")
    ck = str(tmp_path / "alias_ck")
    drop1.coalesce(1).write.mode("overwrite").parquet(in_dir)

    # batch 0: establish the labeling, then build the maintained state
    # under it (the support table a long-running pipeline would carry)
    q = streaming.canonicalize_stream(spark, in_dir, labels, ck, max_files=1)
    q.awaitTermination(300)
    doc0 = doc_triples(docs, gaz, same_as=drop1).localCheckpoint(eager=True)
    state = {
        "support": _support_agg(doc0).localCheckpoint(eager=True),
        "doc": doc0,
        "versions": [],
    }

    def hook(remap, batch_id):
        sup, doc = resupport_after_merge(state["support"], state["doc"], remap)
        state["support"] = sup.localCheckpoint(eager=True)
        state["doc"] = doc.localCheckpoint(eager=True)
        state["versions"].append(batch_id)

    # batch 1: the held-out alias edges merge clusters; the hook fires
    drop2.coalesce(1).write.mode("append").parquet(in_dir)
    q = streaming.canonicalize_stream(
        spark, in_dir, labels, ck, max_files=1, on_remap=hook
    )
    q.awaitTermination(300)
    assert state["versions"], "merge batch must fire the remap hook"

    want = triple_support(docs, gaz, same_as=same)
    got = {
        (r.s, r.p, r.o): (r.n_docs, r.first_doc)
        for r in state["support"].collect()
    }
    assert got == {
        (r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in want.collect()
    }


def test_retraction_stream_matches_batch(spark, tmp_path):
    """ST6 streaming document retraction (retraction_stream): takedown
    files land in two drops; the maintained (support, doc_level) state
    must equal triple_support / doc_triples recomputed on the surviving
    corpus after the backlog run AND after a resume with a third drop —
    with a duplicate retraction in the second drop proving no-op
    semantics."""
    from pyspark.sql import functions as F

    from ttmf_spark.extract.pipeline import doc_triples, triple_support

    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    init_sup = triple_support(docs, gaz, same_as=same).localCheckpoint(
        eager=True
    )
    init_dl = doc_triples(docs, gaz, same_as=same).localCheckpoint(eager=True)

    part = F.pmod(F.crc32("doc_id"), F.lit(6))
    d0 = docs.filter(part == 0).select("doc_id")
    d1 = docs.filter(part == 1).select("doc_id")
    d2 = docs.filter(part == 2).select("doc_id")
    assert d0.count() > 0 and d1.count() > 0 and d2.count() > 0

    in_dir = str(tmp_path / "retract_in")
    state = str(tmp_path / "retract_state")
    ck = str(tmp_path / "retract_ck")
    d0.coalesce(1).write.mode("overwrite").parquet(in_dir)
    # second drop retracts d1 AND replays d0 (duplicate delivery)
    d1.unionByName(d0).coalesce(1).write.mode("append").parquet(in_dir)

    q = streaming.retraction_stream(
        spark, in_dir, state, ck, init_sup, init_dl, max_files=1
    )
    q.awaitTermination(300)
    sup, dl = streaming.read_support_state(spark, state)
    kept = docs.filter(~part.isin(0, 1))
    want = triple_support(kept, gaz, same_as=same)
    f = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in sup.collect()}
    w = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in want.collect()}
    assert f == w

    # third drop after a stop: the restarted query folds only the new file
    d2.coalesce(1).write.mode("append").parquet(in_dir)
    q = streaming.retraction_stream(
        spark, in_dir, state, ck, init_sup, init_dl, max_files=1
    )
    q.awaitTermination(300)
    sup2, dl2 = streaming.read_support_state(spark, state)
    kept2 = docs.filter(~part.isin(0, 1, 2))
    want2 = triple_support(kept2, gaz, same_as=same)
    f2 = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in sup2.collect()}
    w2 = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in want2.collect()}
    assert f2 == w2
    # the maintained doc-level table matches its from-scratch twin too
    dlf = sorted(map(tuple, dl2.select("doc_id", "s", "p", "o").collect()))
    dlw = sorted(
        map(tuple, doc_triples(kept2, gaz, same_as=same)
            .select("doc_id", "s", "p", "o").collect())
    )
    assert dlf == dlw


def test_alias_retraction_stream_matches_batch(spark, tmp_path):
    """ST7 streaming alias-edge retraction (alias_retraction_stream):
    same_as withdrawal files land in two drops (the second replaying the
    first — duplicate-delivery no-op), then a third after a restart. The
    maintained labels must equal a cold connected_components over the
    surviving alias edges at every probe point, and an on_remap hook
    re-keying the support table through resupport_from_docs (the
    split-side hook) must leave it equal to triple_support rebuilt from
    scratch under the surviving alias graph — the streaming twin of the
    composed-lifecycle gate's split leg."""
    from pyspark.sql import functions as F

    from ttmf_spark.extract.canonicalize import connected_components
    from ttmf_spark.extract.pipeline import (
        _support_agg,
        doc_triples,
        resupport_from_docs,
        triple_support,
    )

    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    init_labels = connected_components(same).localCheckpoint(eager=True)
    init_edges = same.localCheckpoint(eager=True)

    part = F.pmod(F.crc32(F.concat_ws("|", "src", "dst")), F.lit(6))
    d0 = same.filter(part == 0)
    d1 = same.filter(part == 1)
    d2 = same.filter(part == 2)
    assert d0.count() > 0 and d1.count() > 0 and d2.count() > 0

    state = {
        "doc": doc_triples(docs, gaz, same_as=same).localCheckpoint(True),
    }
    state["sup"] = _support_agg(state["doc"]).localCheckpoint(True)

    def on_remap(remap, batch_id):
        labels = spark.read.schema("node string, component string").parquet(
            f"{st}/labels/v={batch_id}"
        )
        mapping = labels.select(
            F.col("node").alias("entity"), F.col("component").alias("canonical")
        )
        sup, doc = resupport_from_docs(
            state["sup"], state["doc"], remap, docs, gaz, mapping
        )
        state["sup"] = sup.localCheckpoint(eager=True)
        state["doc"] = doc.localCheckpoint(eager=True)

    in_dir = str(tmp_path / "alias_in")
    st = str(tmp_path / "alias_state")
    ck = str(tmp_path / "alias_ck")
    d0.coalesce(1).write.mode("overwrite").parquet(in_dir)
    d1.unionByName(d0).coalesce(1).write.mode("append").parquet(in_dir)

    q = streaming.alias_retraction_stream(
        spark, in_dir, st, ck, init_labels, init_edges,
        max_files=1, on_remap=on_remap,
    )
    q.awaitTermination(300)
    labels, edges = streaming.read_alias_state(spark, st)
    surv = same.filter(~part.isin(0, 1))
    assert sorted(map(tuple, edges.collect())) == sorted(
        map(tuple, surv.collect())
    )
    cold = {
        r.node: r.component for r in connected_components(surv).collect()
    }
    for r in labels.collect():
        assert cold.get(r.node, r.node) == r.component

    # restart with a third drop
    d2.coalesce(1).write.mode("append").parquet(in_dir)
    q = streaming.alias_retraction_stream(
        spark, in_dir, st, ck, init_labels, init_edges,
        max_files=1, on_remap=on_remap,
    )
    q.awaitTermination(300)
    # a crashed batch's residue — a v= dir without _SUCCESS — must be
    # invisible to the version listing (the commit contract shared by
    # every versioned state sink here)
    import os
    import shutil

    os.makedirs(f"{st}/labels/v=99")
    assert 99 not in streaming._list_label_versions(spark, f"{st}/labels")
    shutil.rmtree(f"{st}/labels/v=99")
    labels2, edges2 = streaming.read_alias_state(spark, st)
    surv2 = same.filter(~part.isin(0, 1, 2))
    cold2 = {
        r.node: r.component for r in connected_components(surv2).collect()
    }
    for r in labels2.collect():
        assert cold2.get(r.node, r.node) == r.component
    # the re-keyed support table equals the from-scratch build under the
    # surviving alias graph — splits included
    want = triple_support(docs, gaz, same_as=surv2)
    got = {
        (r.s, r.p, r.o): (r.n_docs, r.first_doc)
        for r in state["sup"].collect()
    }
    w = {
        (r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in want.collect()
    }
    assert got == w
