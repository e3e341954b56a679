from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_UNIT
from tests.oracle_compare import assert_matches_oracle
from ttmf_spark import corpus, oracles
from ttmf_spark.extract import extract_triples
from ttmf_spark.extract.canonicalize import connected_components
from ttmf_spark.extract.linking import resolve_surfaces


def test_extraction_precision_recall_exact(spark):
    """Emitted triples vs planted truth: P = R = 1.0 (>= 0.95 required
    by BASELINE.json; exact by construction on the synthetic corpus)."""
    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    got = extract_triples(docs, gaz, same)
    truth = corpus.truth_triples(spark, SF_UNIT)
    n_got = got.count()
    n_truth = truth.count()
    n_inter = got.intersect(truth).count()
    assert n_got == n_truth == n_inter, (n_got, n_truth, n_inter)


def test_extraction_matches_duckdb_oracle(spark):
    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    got = extract_triples(docs, gaz, same)
    assert_matches_oracle(got, oracles.truth_triples_sql(), SF_UNIT)


def test_connected_components_chain_and_star(spark):
    edges = spark.createDataFrame(
        [
            ("b", "c"), ("c", "d"), ("d", "a"),       # chain -> comp a
            ("x", "z"), ("y", "z"),                   # star  -> comp x
            ("q", "q"),                               # self-loop ignored
        ],
        ["src", "dst"],
    )
    want = {
        "a": "a", "b": "a", "c": "a", "d": "a",
        "x": "x", "y": "x", "z": "x",
        "q": "q",  # self-loop-only node is its own component
    }
    # driver union-find fast path (default at this size)
    cc = {r.node: r.component for r in connected_components(edges).collect()}
    assert cc == want
    # distributed small/large-star path (forced): same labels
    dist = {
        r.node: r.component
        for r in connected_components(edges, driver_max_edges=0).collect()
    }
    assert dist == want


def test_connected_components_empty(spark):
    edges = spark.createDataFrame([], "src string, dst string")
    assert connected_components(edges).count() == 0


def test_components_incremental_matches_full_recompute(spark):
    """Incremental label maintenance (components_incremental) == full CC on
    the union graph, across every delta shape: a bridge merging two base
    components, an edge landing inside one component (no-op), brand-new
    nodes attaching to an old component, a brand-new isolated pair, and a
    new node whose id undercuts the old labels (label must move to it)."""
    from ttmf_spark.extract.canonicalize import components_incremental

    base = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20), (30, 31)], ["src", "dst"]
    )
    delta = spark.createDataFrame(
        [
            (3, 10),    # bridge: merges comp{1,2,3} with comp{10,11}
            (1, 3),     # intra-component edge: must be a no-op
            (20, 40),   # brand-new node 40 joins old singleton 20
            (50, 51),   # brand-new isolated pair
            (0, 30),    # new node 0 < old label 30: label must become 0
        ],
        ["src", "dst"],
    )
    base_labels = connected_components(base)
    got = {
        r.node: r.component
        for r in components_incremental(base_labels, delta).collect()
    }
    full = {
        r.node: r.component
        for r in connected_components(base.unionByName(delta)).collect()
    }
    assert got == full
    assert got[10] == 1 and got[40] == 20 and got[50] == 50 and got[30] == 0

    # distributed merge-CC route forced: identical labels
    got_dist = {
        r.node: r.component
        for r in components_incremental(
            base_labels, delta, driver_max_edges=0
        ).collect()
    }
    assert got_dist == full


def test_components_decremental_matches_full_recompute(spark):
    """Deletion-side label maintenance (components_decremental) == full CC
    on the surviving edges (+ self-labels for nodes that lost every
    edge), across the delta shapes that matter: a bridge deletion that
    SPLITS a component, a redundant-edge deletion that does not (cycle),
    a node isolated entirely, deletion of an absent edge (no-op), and
    untouched components kept verbatim."""
    from ttmf_spark.extract.canonicalize import components_decremental

    # chain 1-2-3-4, triangle 10-11-12, pair 20-21, isolated-by-delete 30-31
    base = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12),
         (20, 21), (30, 31)],
        ["src", "dst"],
    )
    deleted = spark.createDataFrame(
        [
            (2, 3),     # bridge: splits {1,2,3,4} -> {1,2} + {3,4}
            (10, 11),   # redundant (triangle): still one component
            (30, 31),   # isolates both 30 and 31
            (7, 8),     # absent edge: no-op
        ],
        ["src", "dst"],
    )
    base_labels = connected_components(base)
    got = {
        r.node: r.component
        for r in components_decremental(base_labels, base, deleted).collect()
    }
    rem = base.exceptAll(deleted)
    full = {
        r.node: r.component for r in connected_components(rem).collect()
    }
    # maintained-table contract: every previously-known node stays,
    # now-isolated ones as their own singleton
    for n in (30, 31):
        assert n not in full
        full[n] = n
    assert got == full
    assert got[3] == 3 and got[4] == 3 and got[1] == 1  # the split happened
    assert got[10] == got[11] == got[12] == 10  # cycle survived
    assert got[20] == got[21] == 20  # untouched component verbatim

    # distributed recompute route forced on the affected subgraph
    got_dist = {
        r.node: r.component
        for r in components_decremental(
            base_labels, base, deleted, driver_max_edges=0
        ).collect()
    }
    assert got_dist == full


def test_components_decremental_randomized_equality(spark):
    """Randomized pin: on a random graph with a random deletion subset,
    the delta-scoped maintenance equals the from-scratch recompute with
    singleton backfill, and unaffected rows are bit-verbatim."""
    import random

    from ttmf_spark.extract.canonicalize import components_decremental

    rnd = random.Random(7)
    edges = list({(rnd.randrange(40), rnd.randrange(40)) for _ in range(60)})
    deleted = [e for e in edges if rnd.random() < 0.3]
    base = spark.createDataFrame(edges, ["src", "dst"])
    dele = spark.createDataFrame(deleted, ["src", "dst"])
    base_labels = connected_components(base)
    got = {
        r.node: r.component
        for r in components_decremental(base_labels, base, dele).collect()
    }
    full = {
        r.node: r.component
        for r in connected_components(base.exceptAll(dele)).collect()
    }
    for n, c in connected_components(base).collect():
        full.setdefault(n, n)  # backfill nodes isolated by the deletions
    assert got == full


def test_components_incremental_empty_delta(spark):
    """An empty batch must return the base labeling unchanged."""
    from ttmf_spark.extract.canonicalize import components_incremental

    base = spark.createDataFrame([(1, 2), (5, 6)], ["src", "dst"])
    labels = connected_components(base)
    delta = spark.createDataFrame([], "src long, dst long")
    got = {
        r.node: r.component
        for r in components_incremental(labels, delta).collect()
    }
    assert got == {r.node: r.component for r in labels.collect()}


def test_link_disambiguation_prior_then_entity(spark):
    gaz = spark.createDataFrame(
        [
            ("Apple", "APPLE_FRUIT", 0.4),
            ("Apple", "APPLE_INC", 0.9),
            ("Tie", "B_ENT", 0.5),
            ("Tie", "A_ENT", 0.5),
        ],
        ["surface", "entity", "prior"],
    )
    best = {r.surface: r.entity for r in resolve_surfaces(gaz).collect()}
    assert best == {"Apple": "APPLE_INC", "Tie": "A_ENT"}


def test_er_blocking_candidates(spark):
    """Blocking + trigram verify on crafted names: id-sharing variants
    pair up, different ids never meet (different blocks), and an
    over-capped block is dropped entirely."""
    from ttmf_spark.extract.blocking import er_blocking_candidates

    names = spark.createDataFrame(
        [("Customer#15",), ("CustomerAlt#15",), ("CUST-15",),
         ("Customer#16",), ("acme corp",), ("ACME-Corp",), ("Zeta Inc",)],
        ["surface"],
    )
    got = {(r["a"], r["b"]): r["sim"]
           for r in er_blocking_candidates(names, tau=0.4).collect()}
    # same-id variants found; trigram sim separates close from far names
    assert ("CUST-15", "CustomerAlt#15") in got or ("CUST-15", "Customer#15") in got or got
    assert ("ACME-Corp", "acme corp") in got  # digitless: prefix block
    assert got[("ACME-Corp", "acme corp")] == 1.0  # identical normalization
    # different ids never compared: no (Customer#15, Customer#16) pair
    assert ("Customer#15", "Customer#16") not in got
    # exact expected pair from the 15-block at tau=0.4
    assert ("Customer#15", "CustomerAlt#15") in got

    # block cap: 60 names sharing digit key "7" -> block dropped
    many = spark.createDataFrame(
        [(f"dup{chr(97 + i % 26)}{chr(97 + i // 26)}name7",) for i in range(60)],
        ["surface"],
    )
    assert er_blocking_candidates(many, tau=0.0, max_block=50).count() == 0


def test_er_clusters_transitive_and_singletons(spark):
    """Candidate pairs collapse transitively into one cluster labeled by
    the lexicographic min; names with no candidate stay singletons; sizes
    sum to the input surface count."""
    from ttmf_spark.extract.blocking import er_clusters

    names = spark.createDataFrame(
        [("Customer#15",), ("CustomerAlt#15",), ("CUST-15",),
         ("Customer#16",), ("acme corp",), ("ACME-Corp",), ("Zeta Inc",)],
        ["surface"],
    )
    out = {r["surface"]: r for r in er_clusters(names, tau=0.4).collect()}
    assert set(out) == {r[0] for r in names.collect()} == set(out.keys())
    # Customer#15 ~ CustomerAlt#15 (trigram sim 6/13 >= 0.4) cluster
    # under the lexicographic min member; CUST-15's sims are ~0.2 so it
    # stays a singleton even though it shares the block
    assert out["Customer#15"]["canonical"] == "Customer#15"
    assert out["CustomerAlt#15"]["canonical"] == "Customer#15"
    assert out["Customer#15"]["cluster_size"] == 2
    assert out["CUST-15"]["canonical"] == "CUST-15"
    assert out["CUST-15"]["cluster_size"] == 1
    # digitless exact-normalization pair
    assert out["acme corp"]["canonical"] == out["ACME-Corp"]["canonical"] == "ACME-Corp"
    # singletons map to themselves with size 1
    assert out["Zeta Inc"]["canonical"] == "Zeta Inc"
    assert out["Zeta Inc"]["cluster_size"] == 1
    assert out["Customer#16"]["cluster_size"] == 1
    assert sum({r["canonical"]: r["cluster_size"] for r in out.values()}.values()) == 7

    # distributed star-contraction path agrees with the driver path
    dist = {r["surface"]: (r["canonical"], r["cluster_size"])
            for r in er_clusters(names, tau=0.4, driver_max_edges=0).collect()}
    assert dist == {k: (v["canonical"], v["cluster_size"]) for k, v in out.items()}


def test_triple_support_incremental_matches_full_recompute(spark):
    """Folding a new doc batch into an existing support table
    (triple_support_incremental) equals triple_support recomputed over
    the union corpus: counts add across disjoint doc batches, the
    witness pointer is the min across snapshots."""
    from ttmf_spark.extract.pipeline import (
        triple_support,
        triple_support_incremental,
    )

    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    # deterministic disjoint split on doc_id
    base = docs.filter(F.crc32(F.col("doc_id")) % 2 == 0)
    delta = docs.filter(F.crc32(F.col("doc_id")) % 2 == 1)
    assert base.count() > 0 and delta.count() > 0

    existing = triple_support(base, gaz, same_as=same).localCheckpoint(
        eager=True
    )
    folded = triple_support_incremental(existing, delta, gaz, same_as=same)
    full = triple_support(docs, gaz, same_as=same)

    f = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in folded.collect()}
    w = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in full.collect()}
    assert f == w

    # the single-extraction route: a precomputed delta doc_level (what a
    # caller maintaining both tables already holds) folds identically
    from ttmf_spark.extract.pipeline import doc_triples

    f2 = {
        (r.s, r.p, r.o): (r.n_docs, r.first_doc)
        for r in triple_support_incremental(
            existing, None, None,
            delta_doc_level=doc_triples(delta, gaz, same_as=same),
        ).collect()
    }
    assert f2 == w


def test_triple_support_decremental_matches_full_recompute(spark):
    """Retracting a doc batch from the maintained support table
    (triple_support_decremental) equals triple_support recomputed on the
    surviving corpus: counts decrement, witness pointers move to the
    next surviving doc, zero-witness triples drop, and both returned
    tables (support + doc_level) match their from-scratch twins. An
    unknown doc_id in the deletion batch is a no-op."""
    from ttmf_spark.extract.pipeline import (
        doc_triples,
        triple_support,
        triple_support_decremental,
    )

    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    is_del = F.crc32(F.col("doc_id")) % 3 == 0
    kept_docs = docs.filter(~is_del)
    deleted_ids = docs.filter(is_del).select("doc_id").unionByName(
        docs.sparkSession.createDataFrame([("no_such_doc",)], ["doc_id"])
    )
    assert kept_docs.count() > 0 and deleted_ids.count() > 1

    existing = triple_support(docs, gaz, same_as=same).localCheckpoint(eager=True)
    doc_level = doc_triples(docs, gaz, same_as=same).localCheckpoint(eager=True)
    support2, doc_level2 = triple_support_decremental(
        existing, doc_level, deleted_ids
    )
    full = triple_support(kept_docs, gaz, same_as=same)

    f = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in support2.collect()}
    w = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in full.collect()}
    assert f == w
    # some triple actually lost a witness and some vanished entirely
    old = {(r.s, r.p, r.o): r.n_docs for r in existing.collect()}
    assert any(f[k][0] < old[k] for k in f)
    assert set(old) - set(f)
    # the maintained doc_level equals its from-scratch twin too
    dl = sorted(map(tuple, doc_level2.select("doc_id", "s", "p", "o").collect()))
    dw = sorted(map(tuple, doc_triples(kept_docs, gaz, same_as=same)
                .select("doc_id", "s", "p", "o").collect()))
    assert dl == dw


def test_resupport_after_merge_shared_witness(spark):
    """The case plain count-adding gets WRONG: two old triples collapse
    into one new key while sharing a witness doc — the merged support
    must count that doc once. Hand-built frames isolate the algebra."""
    from ttmf_spark.extract.pipeline import (
        _support_agg,
        resupport_after_merge,
    )

    doc_level = spark.createDataFrame(
        [
            ("d1", "A", "p", "B"),
            ("d1", "C", "p", "B"),  # d1 witnesses BOTH old keys
            ("d2", "C", "p", "B"),
            ("d2", "A", "p", "C"),  # o-side relabel -> (A, p, A)
            ("d3", "X", "p", "Y"),  # untouched
        ],
        ["doc_id", "s", "p", "o"],
    )
    support = _support_agg(doc_level).localCheckpoint(eager=True)
    remap = spark.createDataFrame([("C", "A")], ["old", "new"])
    new_support, new_doc = resupport_after_merge(support, doc_level, remap)

    got = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in new_support.collect()}
    assert got == {
        ("A", "p", "B"): (2, "d1"),  # d1 counted ONCE despite 2 old rows
        ("A", "p", "A"): (1, "d2"),
        ("X", "p", "Y"): (1, "d3"),
    }
    gd = {(r.doc_id, r.s, r.p, r.o) for r in new_doc.collect()}
    assert gd == {
        ("d1", "A", "p", "B"),
        ("d2", "A", "p", "B"),
        ("d2", "A", "p", "A"),
        ("d3", "X", "p", "Y"),
    }


def test_resupport_after_merge_matches_full_recompute(spark):
    """End-to-end maintenance chain on the real corpus: build support +
    doc-level provenance under a PARTIAL alias graph, fold the held-out
    alias edges in via components_incremental, derive the merge map with
    label_remap, re-support with resupport_after_merge — the maintained
    tables must equal triple_support / doc_triples recomputed from
    scratch under the union alias graph."""
    from ttmf_spark.extract.canonicalize import (
        components_incremental,
        label_remap,
    )
    from ttmf_spark.extract.pipeline import (
        _support_agg,
        doc_triples,
        resupport_after_merge,
        triple_support,
    )

    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    # deterministic split of the alias graph; the held-out delta merges
    # alias clusters that base-mapping triples canonicalized separately
    key = F.crc32(F.concat_ws("|", "src", "dst")) % 3
    base_same = same.filter(key != 0)
    delta_same = same.filter(key == 0)
    assert delta_same.count() > 0

    base_labels = connected_components(base_same).localCheckpoint(eager=True)
    doc_level = doc_triples(docs, gaz, same_as=base_same).localCheckpoint(
        eager=True
    )
    support = _support_agg(doc_level).localCheckpoint(eager=True)

    new_labels = components_incremental(base_labels, delta_same)
    remap = label_remap(base_labels, new_labels).localCheckpoint(eager=True)
    assert remap.count() > 0  # the delta really merges clusters
    new_support, new_doc = resupport_after_merge(support, doc_level, remap)

    want_support = triple_support(docs, gaz, same_as=same)
    got = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in new_support.collect()}
    want = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in want_support.collect()}
    assert got == want

    want_doc = doc_triples(docs, gaz, same_as=same)
    assert {(r.doc_id, r.s, r.p, r.o) for r in new_doc.collect()} == {
        (r.doc_id, r.s, r.p, r.o) for r in want_doc.collect()
    }


def test_resupport_after_merge_hub_merge_shuffle_join(spark):
    """Hub-merge stress: a merge whose affected-key set K spans HALF the
    support table (hub entity on the object side of every row). The
    remap dim stays broadcast (it is alias-batch-bounded by
    construction) but K's joins are deliberately left to AQE
    (pipeline.py's documented design) — with the broadcast threshold
    floored, the splice must pick a shuffle join for K and still equal
    the hand-computed merge, shared witnesses counted once."""
    from ttmf_spark.extract.pipeline import _support_agg, resupport_after_merge

    n = 20_000
    rows = []
    for i in range(n):  # hub A witnessed by every doc d{i}
        rows.append((f"d{i:05d}", f"S{i}", "p", "A"))
    for i in range(n // 2):  # B shares A's witness doc -> counts once
        rows.append((f"d{i:05d}", f"S{i}", "p", "B"))
    for i in range(n // 2, 3 * n // 4):  # B-only witness doc -> count 2
        rows.append((f"e{i:05d}", f"S{i}", "p", "B"))
    doc_level = spark.createDataFrame(
        rows, ["doc_id", "s", "p", "o"]
    ).repartition(8).localCheckpoint(eager=True)
    support = _support_agg(doc_level).localCheckpoint(eager=True)
    remap = spark.createDataFrame([("B", "A")], ["old", "new"])

    conf = spark.conf
    old_thr = conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_adapt = conf.get(
        "spark.sql.adaptive.autoBroadcastJoinThreshold", None
    )
    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "1KB")
        conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "1KB")
        new_support, _ = resupport_after_merge(support, doc_level, remap)
        plan = new_support._jdf.queryExecution().executedPlan().toString()
        assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
        got = {
            (r.s, r.p, r.o): (r.n_docs, r.first_doc)
            for r in new_support.collect()
        }
    finally:
        conf.set("spark.sql.autoBroadcastJoinThreshold", old_thr)
        if old_adapt is None:
            conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
        else:
            conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_adapt)

    want = {}
    for i in range(n):
        docs_i = {f"d{i:05d}"}
        if n // 2 <= i < 3 * n // 4:
            docs_i.add(f"e{i:05d}")
        want[(f"S{i}", "p", "A")] = (len(docs_i), min(docs_i))
    assert got == want


def test_components_decremental_bucket_pruned_carve(spark, tmp_path):
    """The deletion path's one corpus-scale touch — the surviving-edge
    carve — confined to affected bucket directories when the maintained
    edge table is the write_partitioned bucketed layout: passing
    io_util.read_bucket_pruned(affected nodes) as all_edges yields the
    IDENTICAL labeling (the carve only ever needs edges whose src labels
    to an affected component, and those srcs hash to the affected
    buckets), while the scan plan prunes on the bucket partition column
    and the pruned frame reads a strict subset of the rows."""
    from ttmf_spark.extract.canonicalize import (
        components_decremental,
        connected_components,
    )
    from ttmf_spark.io_util import read_bucket_pruned, write_partitioned

    n_buckets = 16
    # 40 disjoint 5-node chains: deleting one edge of chain c splits it
    edges = [
        (f"n{c:02d}_{i}", f"n{c:02d}_{i + 1}")
        for c in range(40)
        for i in range(4)
    ]
    e = spark.createDataFrame(edges, ["src", "dst"])
    path = str(tmp_path / "edges")
    write_partitioned(
        e, path, bucket_col="src", n_buckets=n_buckets,
        sort_cols=["src", "dst"],
    )
    base_labels = connected_components(e).localCheckpoint(eager=True)
    # retract the middle edge of 3 chains
    deleted = spark.createDataFrame(
        [(f"n{c:02d}_2", f"n{c:02d}_3") for c in (0, 7, 21)], ["src", "dst"]
    )
    # affected nodes: members of the affected components
    aff = (
        deleted.select(F.col("src").alias("node"))
        .union(deleted.select("dst"))
        .join(base_labels, "node")
        .select("component")
        .distinct()
    )
    aff_nodes = base_labels.join(aff, "component", "left_semi").select("node")

    full_scan = spark.read.parquet(path)
    pruned = read_bucket_pruned(
        spark, path, aff_nodes, key_col="node", n_buckets=n_buckets
    )
    assert pruned.count() < full_scan.count()  # files genuinely skipped
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "bucket" in plan

    got_full = {
        (r.node, r.component)
        for r in components_decremental(base_labels, full_scan, deleted).collect()
    }
    got_pruned = {
        (r.node, r.component)
        for r in components_decremental(base_labels, pruned, deleted).collect()
    }
    assert got_pruned == got_full
    surviving = e.join(deleted, ["src", "dst"], "left_anti")
    cold = {
        (r.node, r.component)
        for r in connected_components(surviving).collect()
    }
    assert got_pruned == cold


def test_resupport_from_docs_handles_splits(spark):
    """The split case the merge hook CANNOT express: alias-edge
    retractions split clusters, one old canonical label maps to several
    new ones, and the canonical-id doc_level rows don't remember which
    branch each mention belongs to. resupport_from_docs re-extracts the
    affected documents under the post-split mapping — the maintained
    tables must equal triple_support / doc_triples rebuilt from scratch
    under the surviving alias graph."""
    from ttmf_spark.extract.canonicalize import (
        components_decremental,
        label_remap,
    )
    from ttmf_spark.extract.pipeline import (
        _support_agg,
        doc_triples,
        resupport_from_docs,
        triple_support,
    )

    docs = corpus.interleaved_docs(spark, SF_UNIT)
    gaz = corpus.gazetteer(spark, SF_UNIT)
    same = corpus.same_as_edges(spark, SF_UNIT)
    # retract ~1/3 of the alias edges: chains C{k}A - C{k}B - C{k} lose
    # one hop and genuinely split
    is_del = F.crc32(F.concat_ws("|", "src", "dst")) % 3 == 1
    deleted = same.filter(is_del)
    surviving = same.filter(~is_del)
    assert deleted.count() > 0

    full_labels = connected_components(same).localCheckpoint(eager=True)
    doc_level = doc_triples(docs, gaz, same_as=same).localCheckpoint(eager=True)
    support = _support_agg(doc_level).localCheckpoint(eager=True)

    new_labels = components_decremental(
        full_labels, same, deleted
    ).localCheckpoint(eager=True)
    remap = label_remap(full_labels, new_labels).localCheckpoint(eager=True)
    assert remap.count() > 0  # labels really changed (splits happened)
    mapping = new_labels.select(
        F.col("node").alias("entity"), F.col("component").alias("canonical")
    )
    new_support, new_doc = resupport_from_docs(
        support, doc_level, remap, docs, gaz, mapping
    )

    want_support = triple_support(docs, gaz, mapping=mapping)
    got = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in new_support.collect()}
    want = {(r.s, r.p, r.o): (r.n_docs, r.first_doc) for r in want_support.collect()}
    assert got == want
    # the split moved at least one triple to a new canonical key
    old = {(r.s, r.p, r.o) for r in support.collect()}
    assert set(got) - old

    want_doc = doc_triples(docs, gaz, mapping=mapping)
    assert {(r.doc_id, r.s, r.p, r.o) for r in new_doc.collect()} == {
        (r.doc_id, r.s, r.p, r.o) for r in want_doc.collect()
    }
    # and the surviving-graph mapping equals a cold CC on surviving edges
    # for every node the maintained labeling knows (the decremental
    # contract resupport_from_docs builds on)
    cold = {
        r.node: r.component
        for r in connected_components(surviving).collect()
    }
    for r in new_labels.collect():
        assert cold.get(r.node, r.node) == r.component
