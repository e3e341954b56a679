"""Unit tests for the KG trust-scoring layer vs reference-semantics oracles."""

from __future__ import annotations

import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.ref_oracles import (
    best_threshold_oracle,
    pagerank_oracle,
    path_rank_oracle,
    searchpath_oracle,
)
from tests.conftest import SF_UNIT
from ttmf_spark import corpus
from ttmf_spark.kg import encode, graph, negatives, pagerank, paths, rrank, transe
from ttmf_spark.kg.threshold import best_threshold


# --- fixtures ---------------------------------------------------------------

TINY_TRIPLES = [
    # (s, p, o) — small KG with parallel edges, a cycle, and a hub
    ("a", "r1", "b"),
    ("a", "r2", "b"),
    ("a", "r1", "c"),
    ("b", "r1", "c"),
    ("b", "r2", "d"),
    ("c", "r1", "d"),
    ("d", "r1", "a"),
    ("d", "r2", "e"),
    ("e", "r1", "a"),
    ("c", "r2", "e"),
]


@pytest.fixture(scope="module")
def tiny(spark):
    return spark.createDataFrame(TINY_TRIPLES, ["s", "p", "o"])


@pytest.fixture(scope="module")
def tiny_ids(spark, tiny):
    e_dim = encode.entity_dim(tiny)
    r_dim = encode.relation_dim(tiny)
    ids = encode.encode_triples(tiny, e_dim, r_dim)
    return e_dim, r_dim, ids


# --- encode -----------------------------------------------------------------


def test_encode_roundtrip(spark, tiny, tiny_ids):
    e_dim, r_dim, ids = tiny_ids
    assert e_dim.count() == 5 and r_dim.count() == 2
    assert ids.count() == len(TINY_TRIPLES)
    # dense contiguous ids
    got = sorted(r["id"] for r in e_dim.collect())
    assert got == [0, 1, 2, 3, 4]
    # decode back
    back = (
        ids.join(e_dim.select(F.col("id").alias("h"), F.col("name").alias("s")), "h")
        .join(e_dim.select(F.col("id").alias("t"), F.col("name").alias("o")), "t")
        .join(r_dim.select(F.col("id").alias("r"), F.col("name").alias("p")), "r")
        .select("s", "p", "o")
    )
    assert sorted(map(tuple, back.collect())) == sorted(TINY_TRIPLES)


def test_vocab_filter_and_unk(spark, tiny):
    e_dim, r_dim = encode.entity_dim(tiny), encode.relation_dim(tiny)
    extra = spark.createDataFrame(
        [("a", "r1", "zz"), ("a", "r9", "b"), ("a", "r1", "b")], ["s", "p", "o"]
    )
    kept = encode.vocab_filter(extra, e_dim, r_dim).collect()
    assert [tuple(r) for r in kept] == [("a", "r1", "b")]
    unked = {
        (r["s"], r["p"], r["o"])
        for r in encode.replace_unk(extra, e_dim, r_dim).collect()
    }
    assert ("a", "r1", "UNKENT") in unked and ("a", "UNKREL", "b") in unked


# --- adjacency / subgraphs --------------------------------------------------


def test_adjacency_weights(spark, tiny_ids):
    _, _, ids = tiny_ids
    adj = graph.build_adjacency(ids)
    w = {(r["src"], r["dst"]): (r["n_rels"], r["w"]) for r in graph.weighted_edges(adj).collect()}
    # entity ids are lexicographic: a=0 b=1 c=2 d=3 e=4
    assert w[(0, 1)][0] == 2 and w[(0, 2)][0] == 1
    assert w[(0, 1)][1] == pytest.approx(2 / 3)
    assert w[(0, 2)][1] == pytest.approx(1 / 3)
    total_out_a = sum(v[1] for (s, _), v in w.items() if s == 0)
    assert total_out_a == pytest.approx(1.0)


def test_reach_depth(spark, tiny_ids):
    _, _, ids = tiny_ids
    adj = graph.build_adjacency(ids)
    cores = spark.createDataFrame([(0,)], ["core"])
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    depths = {r["node"]: r["depth"] for r in reach.collect()}
    # a=0 -> b,c at 1; d,e at 2 (b->d, c->e)
    assert depths == {0: 0, 1: 1, 2: 1, 3: 2, 4: 2}


def test_subgraph_degrees(spark, tiny_ids):
    _, _, ids = tiny_ids
    adj = graph.build_adjacency(ids)
    edges_w = graph.weighted_edges(adj)
    cores = spark.createDataFrame([(0,)], ["core"])
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    sg = graph.subgraph_edges(edges_w, reach, depth=4)
    deg = {
        r["node"]: (r["in_deg"], r["out_deg"])
        for r in graph.subgraph_degrees(sg).collect()
    }
    # full graph is within 4 hops of a; distinct-neighbor degrees
    assert deg[0] == (2, 2)  # d->a, e->a in; a->b, a->c out
    assert deg[1] == (1, 2)  # a->b; b->c, b->d


# --- threshold scan ---------------------------------------------------------


@pytest.mark.parametrize("ascending", [True, False])
def test_best_threshold_matches_reference_scan(spark, ascending):
    rng = random.Random(7)
    rows = []
    expected = {}
    for g in range(6):
        n = rng.randint(1, 25)
        pairs = [
            (round(rng.random() * 4, 3) if rng.random() > 0.2 else 1.5,  # force ties
             1 if rng.random() < 0.5 else -1)
            for _ in range(n)
        ]
        expected[g] = best_threshold_oracle(pairs, ascending)
        rows += [(g, s, f, i) for i, (s, f) in enumerate(pairs)]
    df = spark.createDataFrame(rows, ["grp", "score", "flag", "seq"])
    got = {
        r["grp"]: r["threshold"]
        for r in best_threshold(df, "grp", ascending=ascending).collect()
    }
    for g, th in expected.items():
        assert got[g] == pytest.approx(th, abs=1e-9), f"group {g}"


# --- pagerank ---------------------------------------------------------------


def test_pagerank_grouped_matches_reference_fixpoint(spark, tiny_ids):
    _, _, ids = tiny_ids
    adj = graph.build_adjacency(ids)
    edges_w = graph.weighted_edges(adj)
    cores = spark.createDataFrame([(0,), (2,)], ["core"])
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    sg = graph.subgraph_edges(edges_w, reach, depth=4)
    nodes = graph.subgraph_nodes(sg, cores)
    patched = pagerank.patched_edges(sg, nodes)
    got = {
        (r["core"], r["node"]): r["pr"]
        for r in pagerank.pagerank_grouped(patched).collect()
    }
    for core in (0, 2):
        e = {
            (r["src"], r["dst"]): r["w"]
            for r in sg.filter(F.col("core") == core).collect()
        }
        ns = sorted({n for p in e for n in p} | {core})
        want = pagerank_oracle(e, ns, core)
        for n, pr_val in want.items():
            assert got[(core, n)] == pytest.approx(pr_val, abs=2e-4), (core, n)


def test_pagerank_iterative_agrees_with_grouped(spark, tiny_ids):
    _, _, ids = tiny_ids
    adj = graph.build_adjacency(ids)
    edges_w = graph.weighted_edges(adj)
    cores = spark.createDataFrame([(1,)], ["core"])
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    sg = graph.subgraph_edges(edges_w, reach, depth=4)
    nodes = graph.subgraph_nodes(sg, cores)
    patched = pagerank.patched_edges(sg, nodes)
    # fixed 20-iteration budget on BOTH implementations -> identical Jacobi
    # trajectories (min_delta=0 disables early stop), exact agreement.
    a = {
        (r["core"], r["node"]): r["pr"]
        for r in pagerank.pagerank_grouped(patched, max_iter=20, min_delta=0.0).collect()
    }
    b = {
        (r["core"], r["node"]): r["pr"]
        for r in pagerank.pagerank_iterative(
            patched, nodes, max_iter=20, min_delta=0.0, checkpoint_every=2
        ).collect()
    }
    assert set(a) == set(b)
    for k in a:
        assert a[k] == pytest.approx(b[k], abs=1e-9)


# --- paths ------------------------------------------------------------------


def _adj_dict(ids_rows):
    adj: dict = {}
    for h, r, t in ids_rows:
        adj.setdefault(h, {}).setdefault(t, []).append(r)
    return adj


def test_enumerate_paths_matches_reference_dfs(spark, tiny_ids):
    _, _, ids = tiny_ids
    rows = [(r["h"], r["r"], r["t"]) for r in ids.collect()]
    adj_py = _adj_dict(rows)
    adj = graph.build_adjacency(ids)
    seeds = spark.createDataFrame([(0,), (3,)], ["h"])
    got = paths.enumerate_paths(paths.exploded_edges(adj), seeds)
    got_sets: dict = {0: set(), 3: set()}
    for r in got.collect():
        path = tuple(zip(r["ph"], r["pt"], r["pr"]))
        got_sets[r["h"]].add(path)
        assert r["t"] == r["pt"][-1] and r["len"] == len(path)
    for h in (0, 3):
        assert got_sets[h] == searchpath_oracle(adj_py, h, depth=4)


def test_path_ranking_matches_reference(spark, tiny_ids):
    _, _, ids = tiny_ids
    rows = [(r["h"], r["r"], r["t"]) for r in ids.collect()]
    rng = np.random.default_rng(3)
    ent = rng.normal(size=(5, 8)).astype(np.float64)
    rel = rng.normal(size=(2, 8)).astype(np.float64)
    adj = graph.build_adjacency(ids)
    seeds = spark.createDataFrame([(0,)], ["h"])
    cand = paths.enumerate_paths(paths.exploded_edges(adj), seeds)
    queries = spark.createDataFrame([(0, 3, 0)], ["h", "t", "r"])  # a -r1-> d
    udf = paths.path_score_udf(spark, ent, rel)
    ranked = paths.ranked_paths(cand, queries, udf).orderBy("line").collect()
    # oracle
    all_paths = [p for p in searchpath_oracle(_adj_dict(rows), 0, depth=4) if p[-1][1] == 3]
    want = path_rank_oracle(all_paths, ent, rel, 0, 3, 0)
    want_nontrivial = [(sd, p) for sd, p in want if p != ((0, 3, 0),)][:51]
    assert len(ranked) == len(want_nontrivial)
    got_scores = [r["score"] for r in ranked]
    assert got_scores == sorted(got_scores, reverse=True)
    for r, (sd, _) in zip(ranked, want_nontrivial):
        assert r["score"] == pytest.approx(sd, abs=1e-9)


# --- transe / negatives -----------------------------------------------------


def test_transe_energy_matches_numpy(spark, tiny_ids):
    _, _, ids = tiny_ids
    ent, rel = transe.fit_embeddings_from_df(ids, 5, 2, seed=1, epochs=3)
    udf = transe.transe_energy_col(spark, ent, rel)
    got = transe.add_transe_energy(ids, udf).collect()
    for r in got:
        want = np.linalg.norm(
            ent[r["h"]].astype(np.float64)
            + rel[r["r"]].astype(np.float64)
            - ent[r["t"]].astype(np.float64)
        )
        assert r["energy"] == pytest.approx(float(want), rel=1e-6)


def test_tc_pairs_ids_validity(spark, tiny_ids):
    _, _, ids = tiny_ids
    pairs = negatives.tc_pairs_ids(ids, 5, seed=5)
    rows = pairs.collect()
    assert len(rows) == 2 * len(TINY_TRIPLES)
    pos = {(r["h"], r["r"], r["t"]) for r in rows if r["flag"] == 1}
    assert pos == {(r["h"], r["r"], r["t"]) for r in ids.collect()}
    orig = {(r["h"], r["r"], r["t"]) for r in ids.collect()}
    for r in rows:
        if r["flag"] == -1:
            # corrupted on exactly one side, with a valid entity id
            assert 0 <= r["h"] < 5 and 0 <= r["t"] < 5
            assert (r["h"], r["r"], r["t"]) not in orig or True  # may collide by chance
    # deterministic across runs
    again = {tuple(r) for r in negatives.tc_pairs_ids(ids, 5, seed=5).collect()}
    assert again == {tuple(r) for r in rows}


def test_rr_confidence_defaults(spark):
    ranks = spark.createDataFrame([(0, 1, 0.4)], ["core", "node", "pr"])
    th = spark.createDataFrame([(0, 0.3)], ["h", "rr_threshold"])
    pairs = spark.createDataFrame(
        [(0, 1, 0, 1, 0), (0, 4, 0, -1, 1), (9, 1, 0, 1, 2)],
        ["h", "t", "r", "flag", "seq"],
    )
    got = {(r["h"], r["t"]): r["rr_conf"] for r in rrank.rr_confidence(pairs, ranks, th).collect()}
    assert got[(0, 1)] == pytest.approx(1 / (1 + np.exp(-25 * (0.4 - 0.3))))
    assert got[(0, 4)] == 0.001  # tail outside subgraph
    assert got[(9, 1)] == 0.001  # head has no subgraph rank entry


def test_kgc_candidates(spark, tiny_ids):
    _, _, ids = tiny_ids
    from ttmf_spark.kg.negatives import kgc_candidates

    out = kgc_candidates(ids, "t", pool_size=5, incorrect_count=5, seed=23)
    rows = out.collect()
    # one group per distinct (h, r); 6 rows each (5 fills + truth)
    n_groups = ids.select("h", "r").distinct().count()
    assert len(rows) == 6 * n_groups
    assert all(r["flag"] == 1 and 0 <= r["t"] < 5 for r in rows)
    # deterministic
    again = kgc_candidates(ids, "t", pool_size=5, incorrect_count=5, seed=23)
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again.collect()))


def test_ptranse_trainer_shapes_and_determinism():
    from ttmf_spark.kg.transe import train_ptranse

    tri = np.array([[0, 0, 1], [1, 1, 2], [2, 0, 3]], dtype=np.int64)
    e1, r1 = train_ptranse(tri, 4, 2, dim=8, epochs=2, seed=9)
    e2, r2 = train_ptranse(tri, 4, 2, dim=8, epochs=2, seed=9)
    assert e1.shape == (4, 8) and r1.shape == (2, 8)
    assert np.array_equal(e1, e2) and np.array_equal(r1, r2)
    assert np.isfinite(e1).all() and np.isfinite(r1).all()


def test_dev_hinge_loss(spark):
    from ttmf_spark.kg.transe import dev_hinge_loss

    pairs = spark.createDataFrame(
        [
            (1, 0, 1.0),   # pos k=0, energy 1.0
            (-1, 1, 3.0),  # neg k=0, energy 3.0 -> hinge max(1+1-3,0)=0
            (1, 2, 2.0),   # pos k=1
            (-1, 3, 2.5),  # neg k=1 -> max(1+2-2.5,0)=0.5
        ],
        ["flag", "seq", "energy"],
    )
    got = dev_hinge_loss(pairs).collect()[0]["dev_loss"]
    assert got == pytest.approx(0.25)


def test_train_dev_test_split_determinism(spark):
    """U3 (get_triples/train_test_split.py:33-40): deterministic hash
    split, dev/test vocab-filtered to the train split, partitions-invariant."""
    truth = corpus.truth_triples(spark, SF_UNIT)
    tr1, dv1, te1 = encode.train_dev_test_split(truth)
    tr2, dv2, te2 = encode.train_dev_test_split(truth.repartition(7))
    for a, b in ((tr1, tr2), (dv1, dv2), (te1, te2)):
        ra = sorted(map(tuple, a.collect()))
        rb = sorted(map(tuple, b.collect()))
        assert ra == rb  # same split under any input partitioning
    train, dev, test = [sorted(map(tuple, d.collect())) for d in (tr1, dv1, te1)]
    all_rows = sorted(map(tuple, truth.collect()))
    # disjoint, and dev/test only lose rows to the vocab filter
    assert not (set(train) & set(dev)) and not (set(train) & set(test))
    assert not (set(dev) & set(test))
    assert set(train) | set(dev) | set(test) <= set(all_rows)
    # vocab filter: every dev/test s, p, o is in the train vocabulary
    ents = {r[0] for r in train} | {r[2] for r in train}
    rels = {r[1] for r in train}
    for rows in (dev, test):
        for s, p, o in rows:
            assert s in ents and o in ents and p in rels
    # split fractions are sane (hash split of 0.8 within loose bounds)
    n = len(all_rows)
    assert 0.7 * n < len(train) < 0.9 * n
    assert len(dev) > 0 and len(test) > 0


def test_pagerank_routed_matches_grouped(spark):
    """Hub routing: big-reach cores go through the iterative path and
    still agree with the grouped Arrow fixpoint (synthetic hub core)."""
    # star hub: core 0 -> 1..30 (so core 0's subgraph has 30 edges),
    # plus a tiny separate core 100 -> 101
    hub_edges = [(0, 0, i + 1, 1.0 / 30) for i in range(30)]
    small = [(100, 100, 101, 1.0)]
    sg = spark.createDataFrame(hub_edges + small, ["core", "src", "dst", "w"])
    nodes = sg.selectExpr("core", "src AS node").union(
        sg.selectExpr("core", "dst AS node")
    ).distinct()
    patched = pagerank.patched_edges(sg, nodes)
    want = {
        (r["core"], r["node"]): r["pr"]
        for r in pagerank.pagerank_grouped(patched).collect()
    }
    got = {
        (r["core"], r["node"]): r["pr"]
        for r in pagerank.pagerank_routed(patched, nodes, hub_edge_bound=10).collect()
    }
    assert set(got) == set(want)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=2e-4)  # same fixpoint, eps-stop


def test_fit_embeddings_distributed_deterministic(spark, tiny_ids):
    """M4 distributed trainer: deterministic under repartitioning, sane
    shapes, and positives score below random corruptions on average."""
    _, _, ids = tiny_ids
    e1, r1 = transe.fit_embeddings_distributed(ids, 5, 2, seed=3, epochs=4, n_shards=4)
    e2, r2 = transe.fit_embeddings_distributed(
        ids.repartition(3), 5, 2, seed=3, epochs=4, n_shards=4
    )
    assert e1.shape == (5, transe.DIM) and r1.shape == (2, transe.DIM)
    assert np.array_equal(e1, e2) and np.array_equal(r1, r2)
    assert np.isfinite(e1).all() and np.isfinite(r1).all()


def test_fit_embeddings_distributed_ptranse_kernel(spark, tiny_ids):
    """M4 distributed trainer with the PTransE objective: deterministic
    under repartitioning and distinct from the TransE-kernel result."""
    _, _, ids = tiny_ids
    e1, r1 = transe.fit_embeddings_distributed(
        ids, 5, 2, seed=3, epochs=2, n_shards=4, kernel="ptranse"
    )
    e2, r2 = transe.fit_embeddings_distributed(
        ids.repartition(3), 5, 2, seed=3, epochs=2, n_shards=4, kernel="ptranse"
    )
    assert np.array_equal(e1, e2) and np.array_equal(r1, r2)
    et, _rt = transe.fit_embeddings_distributed(
        ids, 5, 2, seed=3, epochs=2, n_shards=4
    )
    assert not np.array_equal(e1, et)  # different objective, different fit


def test_embeddings_sink_roundtrip(spark):
    """S9 (TransE.java:773-789): the (id, vec) embedding sink preserves ids,
    dimension, and float32 values exactly."""
    rng = np.random.default_rng(9)
    mat = rng.normal(size=(7, transe.DIM)).astype(np.float32)
    df = transe.embeddings_to_df(spark, mat)
    assert df.columns == ["id", "vec"]
    rows = {r["id"]: np.asarray(r["vec"], dtype=np.float32) for r in df.collect()}
    assert sorted(rows) == list(range(7))
    for i in range(7):
        assert np.array_equal(rows[i], mat[i])


def test_energy_join_matches_broadcast(spark, tiny_ids):
    """Beyond-broadcast energy path: (id, vec) table joins + zip_with
    reproduce the broadcast-matrix UDF energies (float32 table tolerance)."""
    _, _, ids = tiny_ids
    rng = np.random.default_rng(5)
    ent = rng.normal(size=(5, transe.DIM)).astype(np.float32)
    rel = rng.normal(size=(2, transe.DIM)).astype(np.float32)
    udf = transe.transe_energy_col(spark, ent, rel)
    base = {
        (r["h"], r["r"], r["t"]): r["energy"]
        for r in transe.add_transe_energy(ids, udf).collect()
    }
    edf = transe.embeddings_to_df(spark, ent)
    rdf = transe.embeddings_to_df(spark, rel)
    got = {
        (r["h"], r["r"], r["t"]): r["energy"]
        for r in transe.add_transe_energy_join(ids, edf, rdf).collect()
    }
    assert set(got) == set(base)
    for k, v in base.items():
        assert got[k] == pytest.approx(v, rel=1e-4)


def test_triangle_stats_hand_graph(spark):
    """graph.triangle_stats on a hand-built graph: K4 + pendant, plus a
    hub star with one cross-edge (exercises the degree-ordered
    orientation where the hub is the HIGHEST-rank endpoint), parallel
    relations, a reversed duplicate edge, and a self-loop."""
    rows = []
    k4 = [1, 2, 3, 4]
    for i, a in enumerate(k4):
        for b in k4[i + 1:]:
            rows.append((a, 0, b))
    rows += [
        (1, 1, 2),   # parallel relation — collapses in the skeleton
        (2, 0, 1),   # reversed duplicate — collapses
        (3, 0, 3),   # self-loop — ignored
        (1, 0, 5),   # pendant
        # hub 10 -> leaves 11..15, one cross-edge 11-12 closes a triangle
        (10, 0, 11), (10, 0, 12), (10, 0, 13), (10, 0, 14), (10, 0, 15),
        (11, 0, 12),
    ]
    idt = spark.createDataFrame(rows, ["h", "r", "t"])
    got = {
        r["node"]: (r["degree"], r["triangles"], r["clust_coef"])
        for r in graph.triangle_stats(idt).collect()
    }
    expected = {
        1: (4, 3, 0.5),     # K4 member + pendant edge
        2: (3, 3, 1.0),
        3: (3, 3, 1.0),
        4: (3, 3, 1.0),
        5: (1, 0, 0.0),
        10: (5, 1, 0.1),    # hub: one triangle over C(5,2)=10 wedges
        11: (2, 1, 1.0),
        12: (2, 1, 1.0),
        13: (1, 0, 0.0),
        14: (1, 0, 0.0),
        15: (1, 0, 0.0),
    }
    assert got == expected


def test_triangle_stats_partition_invariant(spark):
    idt = spark.createDataFrame(
        [(1, 0, 2), (2, 0, 3), (3, 0, 1), (3, 0, 4)], ["h", "r", "t"]
    )
    a = sorted(map(tuple, graph.triangle_stats(idt).collect()))
    b = sorted(map(tuple, graph.triangle_stats(idt.repartition(7)).collect()))
    assert a == b == [(1, 2, 1, 1.0), (2, 2, 1, 1.0), (3, 3, 1, 0.333333), (4, 1, 0, 0.0)]


def test_kcore_converged_hand_graph(spark):
    """graph.kcore fixpoint on a hand graph: a 4-cycle (the true 2-core)
    with a 3-node pendant chain that needs MULTIPLE peel sweeps, plus an
    isolated edge that peels immediately."""
    edges = [
        (1, 0, 2), (2, 0, 3), (3, 0, 4), (4, 0, 1),   # 4-cycle: the 2-core
        (4, 0, 5), (5, 0, 6), (6, 0, 7),               # chain peels in 3 sweeps
        (8, 0, 9),                                      # isolated edge
    ]
    idt = spark.createDataFrame(edges, ["h", "r", "t"])
    got = sorted(map(tuple, graph.kcore(idt, k=2).collect()))
    assert got == [(1, 2), (2, 2), (3, 2), (4, 2)]
    # fixed-round variant with enough rounds reaches the same fixpoint
    fixed = sorted(map(tuple, graph.kcore(idt, k=2, rounds=5).collect()))
    assert fixed == got
    # one round only peels the frontier layer (7 and 8/9 go; 5,6 still in)
    one = {r["node"] for r in graph.kcore(idt, k=2, rounds=1).collect()}
    assert one == {1, 2, 3, 4, 5, 6}


@pytest.mark.parametrize("ascending", [True, False])
def test_best_threshold_edge_cases(spark, ascending):
    """W1 edge battery vs the reference loop oracle: single row, all
    scores tied, all-positive, all-negative, strictly monotone scores,
    and duplicate scores with conflicting flags — the off-by-one traps
    of the prefix-sum argmax (SURVEY.md hard part (a))."""
    groups = {
        0: [(1.0, 1)],                                   # single row
        1: [(2.0, 1), (2.0, -1), (2.0, 1)],              # all tied
        2: [(0.1, 1), (0.2, 1), (0.3, 1)],               # all positive
        3: [(0.1, -1), (0.2, -1)],                       # all negative
        4: [(float(i), 1 if i % 2 else -1) for i in range(8)],  # monotone
        5: [(1.5, 1), (1.5, -1), (2.5, 1), (2.5, 1), (0.5, -1)],  # dup+mix
    }
    rows = []
    expected = {}
    for g, pairs in groups.items():
        expected[g] = best_threshold_oracle(pairs, ascending)
        rows += [(g, s, f, i) for i, (s, f) in enumerate(pairs)]
    df = spark.createDataFrame(rows, ["grp", "score", "flag", "seq"])
    got = {
        r["grp"]: r["threshold"]
        for r in best_threshold(df, "grp", ascending=ascending).collect()
    }
    for g, th in expected.items():
        assert got[g] == pytest.approx(th, abs=1e-9), f"group {g} ({ascending=})"


def test_inverse_relation_leakage_hand_graph(spark):
    """Leakage profile on a hand graph: r0/r1 are exact inverses, r2 is
    symmetric, r3 is clean. min_n=1 so the tiny fixture qualifies."""
    edges = []
    for i in range(4):  # r0 (a->b) with r1 (b->a): exact inverses
        edges += [(i, 0, 100 + i), (100 + i, 1, i)]
    edges += [(1, 2, 2), (2, 2, 1), (3, 2, 4), (4, 2, 3)]  # r2 symmetric
    edges += [(5, 3, 6), (6, 3, 7)]                        # r3 clean
    idt = spark.createDataFrame(edges, ["h", "r", "t"])
    got = {
        (r["r1"], r["r2"]): (r["n_r1"], r["n_both"], r["frac"])
        for r in graph.inverse_relation_leakage(idt, min_frac=0.5, min_n=1).collect()
    }
    assert got[(0, 1)] == (4, 4, 1.0)
    assert got[(1, 0)] == (4, 4, 1.0)
    assert got[(2, 2)] == (4, 4, 1.0)   # symmetric shows as r==r
    assert not any(3 in k for k in got)  # clean relation absent


def test_label_propagation_two_cliques(spark):
    """LPA on two 3-cliques joined by one bridge edge: the bridge 2-10
    must not merge them (each bridge endpoint has 2 same-clique
    neighbors vs 1 across). Label VALUES are opaque community ids, not
    "the community's min node": in sweep 1 node 10's three single-vote
    neighbors {2, 11, 12} tie and min-tie-break imports label 2, which
    then wins the right clique — deterministic, and pinned here."""
    edges = [
        (0, 0, 1), (1, 0, 2), (0, 0, 2),
        (10, 0, 11), (11, 0, 12), (10, 0, 12),
        (2, 0, 10),
    ]
    idt = spark.createDataFrame(edges, ["h", "r", "t"])
    got = dict(
        (r["node"], r["label"])
        for r in graph.label_propagation(idt, rounds=4).collect()
    )
    assert got == {0: 0, 1: 0, 2: 0, 10: 2, 11: 2, 12: 2}
    # the partition is what matters: two communities, split at the bridge
    assert len({got[0], got[10]}) == 2
    assert got[0] == got[1] == got[2] and got[10] == got[11] == got[12]


def test_label_propagation_deterministic_tiebreak(spark):
    """A path graph a-b-c: b sees one vote for each endpoint label —
    the tie must resolve to the SMALLER label under any partitioning."""
    idt = spark.createDataFrame([(1, 0, 2), (2, 0, 3)], ["h", "r", "t"])
    one = dict(
        (r["node"], r["label"])
        for r in graph.label_propagation(idt, rounds=1).collect()
    )
    assert one[2] == 1  # tie between labels 1 and 3 -> min
    rep = dict(
        (r["node"], r["label"])
        for r in graph.label_propagation(
            idt.repartition(7), rounds=1
        ).collect()
    )
    assert rep == one


def test_pcra_hand_graph(spark):
    """PCRA resources on a hand graph vs hand-computed values.

    Edges (all relation 0 unless noted): h=0 -r0-> {1, 2}; 1 -r1-> 3;
    2 -r1-> {3, 4}. Paths (0, r0, r1, t):
      t=3: via m=1 (1/2 * 1/1) + via m=2 (1/2 * 1/2) = 0.75
      t=4: via m=2 (1/2 * 1/2) = 0.25
    """
    edges = [(0, 0, 1), (0, 0, 2), (1, 1, 3), (2, 1, 3), (2, 1, 4)]
    idt = spark.createDataFrame(edges, ["h", "r", "t"])
    got = {
        (r["h"], r["r1"], r["r2"], r["t"]): r["resource"]
        for r in graph.pcra_path_reliability(idt).collect()
    }
    assert got[(0, 0, 1, 3)] == 0.75
    assert got[(0, 0, 1, 4)] == 0.25
    # min_resource prunes the weak path
    pruned = {
        (r["h"], r["r1"], r["r2"], r["t"])
        for r in graph.pcra_path_reliability(idt, min_resource=0.5).collect()
    }
    assert pruned == {(0, 0, 1, 3)}


def test_pcra_max_out_guard(spark):
    """The hub guard drops (node, relation) fan-outs above max_out
    BEFORE the join: with max_out=1, node 0's 2-edge fan-out is gone
    and only the single-edge legs survive."""
    edges = [(0, 0, 1), (0, 0, 2), (1, 1, 3), (2, 1, 3), (2, 1, 4)]
    idt = spark.createDataFrame(edges, ["h", "r", "t"])
    got = {
        (r["h"], r["r1"], r["r2"], r["t"])
        for r in graph.pcra_path_reliability(idt, max_out=1).collect()
    }
    assert got == set()  # first hop always fans out 2 -> everything gated


def test_hits_matches_numpy_replica(spark):
    """graph.hits vs an exact numpy replica of the same max-normalized
    recurrence on a hand graph (hub 0 points at two authorities that a
    weaker hub 5 also touches, plus an off-component edge)."""
    edges = [(0, 0, 3), (0, 0, 4), (5, 0, 3), (1, 0, 2), (4, 0, 3)]
    idt = spark.createDataFrame(edges, ["h", "r", "t"])
    got = {
        r["node"]: (r["auth"], r["hub"])
        for r in graph.hits(idt, rounds=8).collect()
    }

    nodes = sorted({u for u, _, v in edges} | {v for _, _, v in edges})
    ix = {n: i for i, n in enumerate(nodes)}
    A = np.zeros((len(nodes), len(nodes)))
    for u, _, v in edges:
        A[ix[u], ix[v]] = 1.0
    hub = np.ones(len(nodes))
    for _ in range(8):
        auth = A.T @ hub
        auth = auth / auth.max()
        hub = A @ auth
        hub = hub / hub.max()
    for n in nodes:
        assert got[n] == (round(auth[ix[n]], 6), round(hub[ix[n]], 6))
    # structure: 0 is the top hub; 3 the top authority
    assert got[0][1] == 1.0 and got[3][0] == 1.0


def test_random_walks_hand_graph(spark):
    """walks.random_walks on a chain + a branch: forced paths follow the
    chain, sinks truncate, and the branch choice matches a pure-Python
    replica of the md5-draw-mod-degree recurrence."""
    import hashlib

    from ttmf_spark.kg import walks as W

    # chain 1->2->3 (sink), branch node 10 -> {20, 30}
    edges = [(1, 0, 2), (2, 0, 3), (10, 0, 20), (10, 0, 30)]
    idt = spark.createDataFrame(edges, ["h", "r", "t"])
    got = {
        (r["node"], r["walk"]): (r["sent"], r["n_nodes"])
        for r in W.random_walks(idt, walks_per_node=2, length=4, seed=9).collect()
    }
    # chain is forced; walk from 1 reaches the sink and truncates at 3
    assert got[(1, 0)] == ("1 2 3", 3) and got[(1, 1)] == ("1 2 3", 3)
    assert got[(3, 0)] == ("3", 1)  # sink never moves

    def draw(node, walk, step):
        h = hashlib.md5(f"9|{node}|{walk}|{step}".encode()).hexdigest()
        return int(h[:15], 16)

    for wk in (0, 1):
        nxt = [20, 30][draw(10, wk, 1) % 2]  # neighbors in dst order
        assert got[(10, wk)] == (f"10 {nxt}", 2)  # 20/30 are sinks

    # deterministic across independent invocations
    again = {
        (r["node"], r["walk"]): (r["sent"], r["n_nodes"])
        for r in W.random_walks(idt, walks_per_node=2, length=4, seed=9).collect()
    }
    assert again == got


def test_skipgram_pairs_window(spark):
    """skipgram_pairs on one fixed sentence: exact window-2 pair counts."""
    from ttmf_spark.kg import walks as W

    w = spark.createDataFrame(
        [(1, 0, "1 2 3 2", 4)], ["node", "walk", "sent", "n_nodes"]
    )
    got = {(r["center"], r["context"]): r["n_pairs"]
           for r in W.skipgram_pairs(w, window=2).collect()}
    # positions: 1@0 2@1 3@2 2@3; |i-j|<=2 directional pairs
    assert got[(1, 2)] == 1 and got[(2, 1)] == 1      # (0,1) only
    assert got[(1, 3)] == 1 and got[(3, 1)] == 1      # (0,2)
    assert got[(2, 3)] == 2 and got[(3, 2)] == 2      # (1,2) and (3,2)
    assert got[(2, 2)] == 2                            # (1,3) both ways
    assert (1, 2) in got and (2, 2) in got and len(got) == 7


def test_components_chain_and_paths_agree(spark):
    """graph.components on a worst-case-diameter chain plus a separate
    triangle: distributed star contraction (driver_max_edges=0) and the
    driver union-find shortcut must produce identical min-id labels."""
    from ttmf_spark.kg import graph as G

    chain = [(i, 0, i + 1) for i in range(100, 160)]       # 61-node path
    tri = [(7, 0, 8), (8, 0, 9), (9, 0, 7), (5, 0, 5)]     # + self-loop node
    idt = spark.createDataFrame(chain + tri, ["h", "r", "t"])
    dist = {(r["node"], r["component"])
            for r in G.components(idt, driver_max_edges=0).collect()}
    drv = {(r["node"], r["component"])
           for r in G.components(idt).collect()}
    assert dist == drv
    assert (159, 100) in dist and (8, 7) in dist and (5, 5) in dist


def test_components_oracle_sweeps_converge_on_chain():
    """The fixed-sweep pointer-jumping oracle must cover a diameter far
    beyond anything the fixtures hold: a 61-node chain needs min-label
    distance 60, reached in <= 8 doubling sweeps."""
    import duckdb

    con = duckdb.connect()
    rows = ",".join(f"({i}, {i + 1})" for i in range(100, 160))
    con.execute(f"CREATE VIEW e AS SELECT * FROM (VALUES {rows}) t(u, v)")
    parts = [
        "und AS (SELECT u AS node, v AS nbr FROM e UNION SELECT v, u FROM e)",
        "c0 AS (SELECT node, node AS label FROM (SELECT u AS node FROM e UNION SELECT v FROM e))",
    ]
    for i in range(1, 9):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT l.node, LEAST(l.label,"
            f" COALESCE(nb.m, l.label), COALESCE(j.label, l.label)) AS label"
            f" FROM c{i-1} l LEFT JOIN (SELECT u.node AS node, MIN(x.label) AS m"
            f" FROM und u JOIN c{i-1} x ON x.node = u.nbr GROUP BY u.node) nb"
            f" ON nb.node = l.node LEFT JOIN c{i-1} j ON j.node = l.label)"
        )
    sql = "WITH " + ",\n".join(parts) + " SELECT COUNT(*) FROM c8 WHERE label <> 100"
    assert con.execute(sql).fetchone()[0] == 0


def test_common_neighbor_ra_bounds(spark):
    """RA index: planted star z={1..4} around hub 0 plus a 2-path —
    ra = sum 1/deg(z), checked by hand."""
    from ttmf_spark.kg import graph as G

    # u=10, v=11 share z=1 (deg 3: 10, 11, 12) and z=2 (deg 2: 10, 11)
    edges = [(10, 0, 1), (11, 0, 1), (12, 0, 1), (10, 0, 2), (11, 0, 2)]
    idt = spark.createDataFrame(edges, ["h", "r", "t"])
    out = {(r["u"], r["v"]): (r["cn"], r["aa"], r["ra"])
           for r in G.common_neighbor_scores(idt, max_degree=10, k=10).collect()}
    import math
    cn, aa, ra = out[(10, 11)]
    assert cn == 2
    assert abs(ra - round(1 / 3 + 1 / 2, 6)) < 1e-9
    assert abs(aa - round(1 / math.log(3) + 1 / math.log(2), 6)) < 1e-9


def test_anf_exact_below_k_and_hand_reach(spark):
    """With k larger than every neighborhood the ANF sketch IS exact
    (est == n_exact everywhere); the exact column matches hand-computed
    closed 2-hop out-reach; truncation (tiny k) still estimates within
    the KMV error band and is partitioning-invariant."""
    # chain with a fan-out hub: 0->1->2->3, 1->{4,5,6}, isolated-ish 7->0
    edges = [(0, 1), (1, 2), (2, 3), (1, 4), (1, 5), (1, 6), (7, 0)]
    ids = spark.createDataFrame(
        [(h, 0, t) for h, t in edges], "h long, r long, t long"
    )
    out = {r["node"]: r for r in
           graph.anf_neighborhood_sizes(ids, depth=2, k=64).collect()}
    # closed 2-hop out-reach: node 0 -> {0,1} u {2,4,5,6} ; node 1 -> {1,2,4,5,6,3}
    expect = {0: 6, 1: 6, 2: 2, 3: 1, 4: 1, 5: 1, 6: 1, 7: 3}
    assert {n: r["n_exact"] for n, r in out.items()} == expect
    assert all(r["est"] == float(r["n_exact"]) for r in out.values())
    assert all(r["rel_err"] == 0.0 for r in out.values())

    tiny = graph.anf_neighborhood_sizes(ids, depth=2, k=4).collect()
    again = graph.anf_neighborhood_sizes(
        ids.repartition(5), depth=2, k=4
    ).collect()
    assert sorted(map(tuple, tiny)) == sorted(map(tuple, again))
    # nodes below k stay exact even at k=4
    small = [r for r in tiny if r["n_exact"] < 4]
    assert small and all(r["rel_err"] == 0.0 for r in small)


def test_degree_skew_profile_hand_graph(spark):
    """Buckets are exact bit_length(deg)-1, sides independent, counts
    exact — pinned on a hand graph with degrees 1, 2, 3, and 5."""
    from ttmf_spark.kg import graph

    # h=0 has out-deg 5, h=1 out-deg 2, h=2 out-deg 1;
    # t=9 in-deg 3, t=8 in-deg 2, others in-deg 1
    rows = [(0, 0, 9), (0, 0, 9), (0, 1, 8), (0, 2, 7), (0, 3, 6),
            (1, 0, 9), (1, 1, 8), (2, 0, 5)]
    idt = spark.createDataFrame(rows, ["h", "r", "t"])
    out = {(r.side, r.bucket): r for r in
           graph.degree_skew_profile(idt).collect()}
    # out-side: deg 5 -> bucket 2; deg 2 -> 1; deg 1 -> 0
    assert out[("out", 2)].n_nodes == 1 and out[("out", 2)].max_deg == 5
    assert out[("out", 1)].n_nodes == 1 and out[("out", 1)].n_edges == 2
    assert out[("out", 0)].n_nodes == 1
    # in-side: deg 3 (t=9) -> bucket 1 together with deg 2 (t=8)
    assert out[("in", 1)].n_nodes == 2 and out[("in", 1)].n_edges == 5
    assert out[("in", 1)].max_deg == 3
    assert out[("in", 0)].n_nodes == 3  # t=7, 6, 5
    assert sum(r.n_edges for k, r in out.items() if k[0] == "out") == len(rows)


def test_snapshot_diff_counts(spark):
    """added/removed/kept partition the union per relation; duplicates
    collapse before counting; disjoint relations appear one-sided."""
    from ttmf_spark.kg import graph

    old = spark.createDataFrame(
        [("a", "p1", "x"), ("a", "p1", "x"), ("b", "p1", "y"), ("c", "p2", "z")],
        ["s", "p", "o"],
    )
    new = spark.createDataFrame(
        [("a", "p1", "x"), ("d", "p1", "w"), ("e", "p3", "v")],
        ["s", "p", "o"],
    )
    out = {r.p: r for r in graph.snapshot_diff(old, new).collect()}
    assert out["p1"].n_old == 2 and out["p1"].n_new == 2
    assert out["p1"].n_kept == 1 and out["p1"].n_added == 1 and out["p1"].n_removed == 1
    assert out["p2"].n_old == 1 and out["p2"].n_new == 0 and out["p2"].n_removed == 1
    assert out["p3"].n_new == 1 and out["p3"].n_old == 0 and out["p3"].n_added == 1
    for r in out.values():
        assert r.n_old == r.n_kept + r.n_removed
        assert r.n_new == r.n_kept + r.n_added


def test_rank_metrics_by_category_slices(spark):
    """Per-key metrics equal the global metrics computed on each key's
    rank subset; keys partition the queries."""
    from ttmf_spark.kg import evaluate

    ranks = spark.createDataFrame(
        [(1, 10, 1), (2, 10, 5), (3, 11, 2), (4, 11, 20), (5, 11, 1)],
        ["h", "r", "rank"],
    )
    cats = spark.createDataFrame(
        [(10, "1-1"), (11, "N-N")], ["r", "category"]
    )
    out = {r["category"]: r for r in
           evaluate.rank_metrics_by(ranks, cats).collect()}
    assert out["1-1"]["n_queries"] == 2 and out["N-N"]["n_queries"] == 3
    assert out["1-1"]["hits1"] == 0.5
    assert out["1-1"]["mean_rank"] == 3.0
    assert out["1-1"]["mrr"] == round((1.0 + 1 / 5) / 2, 6)
    assert out["N-N"]["hits10"] == round(2 / 3, 6)
    assert out["N-N"]["mean_rank"] == round(23 / 3, 6)


def test_pcra_path_triples_hand_graph(spark):
    """PCRA-weighted PTransE training paths (Lin et al. 2015 §3.2,
    restoring KGE/src/approaches/PTransE.java:373-394): hand graph with
    two competing 2-hop paths into the same (h, t) — shares must
    normalize by the per-pair Z and aggregate per (r1, r2, r)."""
    # relations: 0,1,2,3.  h=0, t=2 reachable via
    #   path A (r0, r1): 0-r0->1-r1->2 AND 0-r0->3-r1->2 (out(0,r0)=2,
    #     each instance 1/(2*1) -> summed resource 1.0)
    #   path B (r3, r1): 0-r3->4-r1->2 (resource 1.0)
    # direct edge 0-r2->2 exists -> Z(0,2)=2.0, each path share 0.5.
    edges = [
        (0, 0, 1), (0, 0, 3), (1, 1, 2), (3, 1, 2),
        (0, 3, 4), (4, 1, 2), (0, 2, 2),
    ]
    idt = spark.createDataFrame(edges, ["h", "r", "t"])
    got = {
        (r["r1"], r["r2"], r["r"]): r["weight"]
        for r in graph.pcra_path_triples(idt).collect()
    }
    assert got == {(0, 1, 2): pytest.approx(0.5), (3, 1, 2): pytest.approx(0.5)}
    # partition invariance (fixed-point integer path, no float order dep)
    again = {
        (r["r1"], r["r2"], r["r"]): r["weight"]
        for r in graph.pcra_path_triples(idt.repartition(5)).collect()
    }
    assert got == again


def test_ptranse_path_term_determinism_and_effect():
    """The PCRA path-composition epoch: deterministic; a zero-length
    path table is bit-identical to the pre-path trainer; a real path
    table changes the fit AND pulls r1+r2 toward r (lower path energy
    than the path-free fit)."""
    from ttmf_spark.kg.transe import train_ptranse

    tri = np.array(
        [[0, 0, 1], [1, 1, 2], [0, 2, 2], [2, 0, 3], [3, 1, 4], [2, 2, 4]],
        dtype=np.int64,
    )
    paths = np.array([[0, 1, 2]], dtype=np.int64)  # r0 then r1 implies r2
    w = np.array([2.0])
    base_e, base_r = train_ptranse(tri, 5, 3, dim=8, epochs=6, seed=9)
    none_e, none_r = train_ptranse(
        tri, 5, 3, dim=8, epochs=6, seed=9,
        paths=np.zeros((0, 3), dtype=np.int64), path_weights=np.zeros(0),
    )
    assert np.array_equal(base_e, none_e) and np.array_equal(base_r, none_r)
    p1_e, p1_r = train_ptranse(
        tri, 5, 3, dim=8, epochs=6, seed=9, paths=paths, path_weights=w
    )
    p2_e, p2_r = train_ptranse(
        tri, 5, 3, dim=8, epochs=6, seed=9, paths=paths, path_weights=w
    )
    assert np.array_equal(p1_e, p2_e) and np.array_equal(p1_r, p2_r)
    assert not np.array_equal(p1_r, base_r)  # path term really trains

    def path_energy(rel):
        d = rel[0] + rel[1] - rel[2]
        return float((d**2).sum())

    assert path_energy(p1_r) < path_energy(base_r)


def test_fit_embeddings_distributed_path_term(spark, tiny_ids):
    """Distributed PTransE with the path term: repartition-invariant and
    distinct from the path-free distributed fit."""
    _, _, ids = tiny_ids
    paths = np.array([[0, 1, 0]], dtype=np.int64)
    w = np.array([1.5])
    e1, r1 = transe.fit_embeddings_distributed(
        ids, 5, 2, seed=3, epochs=2, n_shards=4, kernel="ptranse",
        paths=paths, path_weights=w,
    )
    e2, r2 = transe.fit_embeddings_distributed(
        ids.repartition(3), 5, 2, seed=3, epochs=2, n_shards=4,
        kernel="ptranse", paths=paths, path_weights=w,
    )
    assert np.array_equal(e1, e2) and np.array_equal(r1, r2)
    ef, rf = transe.fit_embeddings_distributed(
        ids, 5, 2, seed=3, epochs=2, n_shards=4, kernel="ptranse"
    )
    assert not np.array_equal(r1, rf)


def test_collect_path_triples_partition_invariant(spark, tiny_ids):
    """collect_path_triples canonical sort: same arrays under any input
    partitioning, so the trained model is layout-independent."""
    _, _, ids = tiny_ids
    pt = graph.pcra_path_triples(ids, max_out=1000, min_resource=0.001)
    a_tri, a_w = transe.collect_path_triples(pt)
    b_tri, b_w = transe.collect_path_triples(pt.repartition(7))
    assert np.array_equal(a_tri, b_tri) and np.array_equal(a_w, b_w)
    assert a_tri.ndim == 2 and a_tri.shape[1] == 3 and len(a_w) == len(a_tri)


def test_fit_embeddings_table_bit_parity(spark, tiny_ids):
    """Table-sharded trainer (entity matrix never on the driver) is
    BIT-identical to the broadcast trainer given the same init, for both
    kernels and with the PCRA path term — the plan pass replays the
    exact rng draw sequence, so gather/remap changes no arithmetic."""
    _, _, ids = tiny_ids
    rng = np.random.default_rng(123)
    init = (rng.uniform(-0.6, 0.6, (5, 8)), rng.uniform(-0.6, 0.6, (2, 8)))
    paths = np.array([[0, 1, 0]], dtype=np.int64)
    w = np.array([1.5])
    cases = [
        ("transe", {}),
        ("ptranse", {}),
        ("ptranse", {"paths": paths, "path_weights": w}),
    ]
    for kernel, extra in cases:
        em, rm = transe.fit_embeddings_distributed(
            ids, 5, 2, dim=8, epochs=3, n_shards=4, seed=7,
            kernel=kernel, init=init, **extra,
        )
        edf, rt = transe.fit_embeddings_table(
            ids, 5, 2, dim=8, epochs=3, n_shards=4, seed=7,
            kernel=kernel, init=init, **extra,
        )
        pdf = edf.toPandas().sort_values("id")
        assert list(pdf["id"]) == [0, 1, 2, 3, 4]
        et = np.stack(pdf["vec"].to_numpy())
        assert np.array_equal(et, em), kernel
        assert np.array_equal(rt, rm), kernel


def test_fit_embeddings_table_default_init(spark, tiny_ids):
    """Default (no-init) table path: distributed per-id counter-keyed
    init, deterministic under input repartitioning, float32 output, and
    n_ent == ent-table rows (nothing |V|-sized ever hits the driver in
    the trainer itself; this collect is the TEST's assertion step)."""
    _, _, ids = tiny_ids
    e1, r1 = transe.fit_embeddings_table(ids, 5, 2, dim=8, epochs=2, n_shards=3)
    e2, r2 = transe.fit_embeddings_table(
        ids.repartition(4), 5, 2, dim=8, epochs=2, n_shards=3
    )
    p1 = e1.toPandas().sort_values("id")
    p2 = e2.toPandas().sort_values("id")
    assert np.array_equal(np.stack(p1["vec"]), np.stack(p2["vec"]))
    assert np.array_equal(r1, r2)
    assert len(p1) == 5 and np.stack(p1["vec"]).dtype == np.float32
    assert r1.dtype == np.float32 and np.isfinite(r1).all()


def test_pagerank_warm_start_same_fixpoint_fewer_rounds(spark, tiny_ids):
    """Warm-starting the iterative Jacobi from a previous snapshot's
    ranks (pagerank_iterative init_ranks) reaches the same unique
    fixpoint — and from the EXACT previous fixpoint it converges in
    strictly fewer convergence-checked rounds than a cold start: the
    incremental re-rank path after a snapshot delta."""
    _, _, ids = tiny_ids
    adj = graph.build_adjacency(ids)
    edges_w = graph.weighted_edges(adj)
    cores = spark.createDataFrame([(0,), (2,)], ["core"])
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    sg = graph.subgraph_edges(edges_w, reach, depth=4).localCheckpoint(eager=True)
    nodes = graph.subgraph_nodes(sg, cores)
    patched = pagerank.patched_edges(sg, nodes)

    cold_rounds: list = []
    cold = pagerank.pagerank_iterative(
        patched, nodes, rounds_out=cold_rounds
    ).localCheckpoint(eager=True)
    warm_rounds: list = []
    warm = pagerank.pagerank_iterative(
        patched, nodes, init_ranks=cold, rounds_out=warm_rounds
    )
    c = {(r["core"], r["node"]): r["pr"] for r in cold.collect()}
    w = {(r["core"], r["node"]): r["pr"] for r in warm.collect()}
    assert set(c) == set(w)
    for k in c:
        assert w[k] == pytest.approx(c[k], abs=1e-4)
    # already at the fixpoint -> first convergence check must finish it
    assert warm_rounds[-1] < cold_rounds[-1]


def test_pagerank_grouped_warm_start_same_fixpoint(spark, tiny_ids):
    """The grouped-Arrow production kernel warm-starts per core from a
    previous snapshot's ranks (one (core, src)-keyed left join): same
    unique fixpoint as cold start; NULL/new nodes fall back to the cold
    init. Also pins the routed wrapper's init_ranks passthrough."""
    _, _, ids = tiny_ids
    adj = graph.build_adjacency(ids)
    edges_w = graph.weighted_edges(adj)
    cores = spark.createDataFrame([(0,), (2,)], ["core"])
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    sg = graph.subgraph_edges(edges_w, reach, depth=4).localCheckpoint(eager=True)
    nodes = graph.subgraph_nodes(sg, cores)
    patched = pagerank.patched_edges(sg, nodes).localCheckpoint(eager=True)

    cold = pagerank.pagerank_grouped(patched).localCheckpoint(eager=True)
    warm = pagerank.pagerank_grouped(patched, init_ranks=cold)
    routed_warm = pagerank.pagerank_routed(patched, nodes, init_ranks=cold)
    c = {(r["core"], r["node"]): r["pr"] for r in cold.collect()}
    for got in (warm, routed_warm):
        g = {(r["core"], r["node"]): r["pr"] for r in got.collect()}
        assert set(c) == set(g)
        for k in c:
            assert g[k] == pytest.approx(c[k], abs=1e-4)


def test_rerank_after_delta_matches_full_recompute(spark):
    """rerank_after_delta re-ranks ONLY the cores a delta edge batch can
    touch (affected_cores scoping) warm-started from the previous ranks,
    keeps every other core's rows verbatim — and the maintained table
    equals a full cold recompute on the post-delta graph. Two disconnected
    clusters prove the scoping: the delta lands in core 10's cluster, so
    core 0 must not be re-ranked; a core new since the snapshot (13) has
    no prev rows and must be ranked cold."""
    base = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 2), (2, 0, 3), (3, 0, 0),
         (10, 0, 11), (11, 0, 12), (12, 0, 10)],
        ["h", "r", "t"],
    )
    delta = spark.createDataFrame([(11, 1, 13), (13, 0, 10)], ["h", "r", "t"])
    post = base.unionByName(delta)
    cores_prev = spark.createDataFrame([(0,), (10,)], ["core"])
    cores_post = spark.createDataFrame([(0,), (10,), (13,)], ["core"])

    def full(tr, cores):
        adj = graph.build_adjacency(tr)
        ew = graph.weighted_edges(adj)
        reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
        sg = graph.subgraph_edges(ew, reach, depth=4).localCheckpoint(
            eager=True
        )
        nodes = graph.subgraph_nodes(sg, cores)
        patched = pagerank.patched_edges(sg, nodes)
        return ew, reach, pagerank.pagerank_iterative(patched, nodes)

    _, _, prev = full(base, cores_prev)
    prev = prev.localCheckpoint(eager=True)
    ew_post, reach_post, cold = full(post, cores_post)

    delta_edges = delta.select(F.col("h").alias("src"), F.col("t").alias("dst"))
    aff = pagerank.affected_cores(reach_post, delta_edges, depth=4)
    # the delta srcs {11, 13} are unreachable from core 0's cluster, so
    # core 0 is NOT affected; 10 and (new core) 13 are
    assert sorted(r["core"] for r in aff.collect()) == [10, 13]

    maint = pagerank.rerank_after_delta(
        ew_post, reach_post, cores_post, prev, delta_edges, depth=4
    )
    c = {(r["core"], r["node"]): r["pr"] for r in cold.collect()}
    m = {(r["core"], r["node"]): r["pr"] for r in maint.collect()}
    assert set(c) == set(m)
    for k in c:
        assert m[k] == pytest.approx(c[k], abs=1e-4)
    # core 0's rows are the PREVIOUS snapshot's rows, bit-identical (kept,
    # not recomputed)
    p = {(r["core"], r["node"]): r["pr"] for r in prev.collect()}
    for k, v in p.items():
        if k[0] == 0:
            assert m[k] == v


def test_rerank_after_deletion_matches_full_recompute(spark):
    """The DELETION side of rank maintenance: retracting edges shrinks
    subgraphs (and can strand a core entirely). Post-delta reach scoping
    is sufficient for a whole deletion batch (the first deleted edge on
    any broken path keeps a reachable src), and the pre ∪ post union
    (scope_reach) is the belt-and-braces route — both must equal the
    full cold recompute on the shrunk graph, with the untouched
    cluster's rows bit-verbatim and subgraphs built from the post reach
    alone (a union THERE would graft stale nodes' edges in)."""
    small = spark.createDataFrame(
        [(0, 0, 1), (1, 0, 2), (2, 0, 3), (3, 0, 0),
         (10, 0, 11), (11, 0, 12), (12, 0, 10)],
        ["h", "r", "t"],
    )
    extra = spark.createDataFrame([(11, 1, 13), (13, 0, 10)], ["h", "r", "t"])
    big = small.unionByName(extra)
    cores = spark.createDataFrame([(0,), (10,), (13,)], ["core"])

    def full(tr):
        adj = graph.build_adjacency(tr)
        ew = graph.weighted_edges(adj)
        reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
        sg = graph.subgraph_edges(ew, reach, depth=4).localCheckpoint(
            eager=True
        )
        nodes = graph.subgraph_nodes(sg, cores)
        patched = pagerank.patched_edges(sg, nodes)
        return ew, reach, pagerank.pagerank_iterative(patched, nodes)

    _, reach_pre, prev = full(big)
    prev = prev.localCheckpoint(eager=True)
    ew_post, reach_post, cold = full(small)

    deleted = extra.select(F.col("h").alias("src"), F.col("t").alias("dst"))
    scope = reach_pre.unionByName(reach_post)
    aff_union = pagerank.affected_cores(scope, deleted, depth=4)
    assert sorted(r["core"] for r in aff_union.collect()) == [10, 13]

    c = {(r["core"], r["node"]): r["pr"] for r in cold.collect()}
    p = {(r["core"], r["node"]): r["pr"] for r in prev.collect()}
    for kw in ({}, {"scope_reach": scope}):
        maint = pagerank.rerank_after_delta(
            ew_post, reach_post, cores, prev, deleted, depth=4, **kw
        )
        m = {(r["core"], r["node"]): r["pr"] for r in maint.collect()}
        assert set(c) == set(m)
        for k in c:
            assert m[k] == pytest.approx(c[k], abs=1e-4)
        for k, v in p.items():
            if k[0] == 0:
                assert m[k] == v  # untouched cluster kept verbatim


def test_rerank_interleaved_add_delete_windows(spark):
    """The interleaved fold cadence the scope_reach docstring reserves:
    TWO successive maintenance windows, each mixing edge additions AND
    deletions before the reach refresh, re-ranked with the pre ∪ post
    union scope. After each window the maintained table must equal the
    cold recompute on that window's graph, with the untouched cluster's
    rows carried bit-verbatim through BOTH windows — the rank-side half
    of the composed-lifecycle gate."""
    c_a = [(0, 0, 1), (1, 0, 2), (2, 0, 3), (3, 0, 0)]  # untouched
    c_b = [(10, 0, 11), (11, 0, 12), (12, 0, 10)]
    c_c = [(20, 0, 21), (21, 0, 20)]
    g0 = spark.createDataFrame(c_a + c_b + c_c, ["h", "r", "t"])
    cores = spark.createDataFrame([(0,), (10,), (20,)], ["core"])

    def full(tr):
        adj = graph.build_adjacency(tr)
        ew = graph.weighted_edges(adj)
        reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
        sg = graph.subgraph_edges(ew, reach, depth=4).localCheckpoint(
            eager=True
        )
        nodes = graph.subgraph_nodes(sg, cores)
        patched = pagerank.patched_edges(sg, nodes)
        return ew, reach, pagerank.pagerank_iterative(patched, nodes)

    _, reach0, prev = full(g0)
    prev = prev.localCheckpoint(eager=True)

    # window 1: B loses (12,10) and gains a detour 12->14->10; C gains 21->22
    w1_del = [(12, 0, 10)]
    w1_add = [(12, 1, 14), (14, 0, 10), (21, 1, 22), (22, 0, 20)]
    g1 = (
        g0.join(
            spark.createDataFrame(w1_del, ["h", "r", "t"]), ["h", "r", "t"],
            "left_anti",
        ).unionByName(spark.createDataFrame(w1_add, ["h", "r", "t"]))
    ).localCheckpoint(eager=True)
    ew1, reach1, cold1 = full(g1)
    delta1 = spark.createDataFrame(
        [(h, t) for h, _, t in w1_del + w1_add], ["src", "dst"]
    )
    maint1 = pagerank.rerank_after_delta(
        ew1, reach1, cores, prev, delta1, depth=4,
        scope_reach=reach0.unionByName(reach1),
    ).localCheckpoint(eager=True)
    c1 = {(r["core"], r["node"]): r["pr"] for r in cold1.collect()}
    m1 = {(r["core"], r["node"]): r["pr"] for r in maint1.collect()}
    assert set(c1) == set(m1)
    for k in c1:
        assert m1[k] == pytest.approx(c1[k], abs=1e-4)

    # window 2: the detour retracts (14 stranded), C's new edge retracts
    w2_del = [(12, 1, 14), (14, 0, 10), (21, 1, 22)]
    w2_add = [(12, 2, 10)]
    g2 = (
        g1.join(
            spark.createDataFrame(w2_del, ["h", "r", "t"]), ["h", "r", "t"],
            "left_anti",
        ).unionByName(spark.createDataFrame(w2_add, ["h", "r", "t"]))
    ).localCheckpoint(eager=True)
    ew2, reach2, cold2 = full(g2)
    delta2 = spark.createDataFrame(
        [(h, t) for h, _, t in w2_del + w2_add], ["src", "dst"]
    )
    maint2 = pagerank.rerank_after_delta(
        ew2, reach2, cores, maint1, delta2, depth=4,
        scope_reach=reach1.unionByName(reach2),
    )
    c2 = {(r["core"], r["node"]): r["pr"] for r in cold2.collect()}
    m2 = {(r["core"], r["node"]): r["pr"] for r in maint2.collect()}
    assert set(c2) == set(m2)
    for k in c2:
        assert m2[k] == pytest.approx(c2[k], abs=1e-4)
    # untouched cluster verbatim through both windows
    p = {(r["core"], r["node"]): r["pr"] for r in prev.collect()}
    for k, v in p.items():
        if k[0] == 0:
            assert m1[k] == v and m2[k] == v


def test_pagerank_convergence_stop_matches_fixed_sweeps(spark, tiny_ids):
    """The production convergence-stop PageRank (the one rows-only
    driver query, q_kg_pagerank) equals the hash-gated fixed-20-sweep
    twin within the stop tolerance on the fixture graph — tightening the
    remaining rows-only KG query to the gated fixpoint semantics."""
    _, _, ids = tiny_ids
    adj = graph.build_adjacency(ids)
    edges_w = graph.weighted_edges(adj)
    cores = spark.createDataFrame([(0,), (2,)], ["core"])
    reach = graph.reach_sets(adj, cores, depth=4, checkpoint=False)
    sg = graph.subgraph_edges(edges_w, reach, depth=4).localCheckpoint(eager=True)
    nodes = graph.subgraph_nodes(sg, cores)
    patched = pagerank.patched_edges(sg, nodes)
    conv = {
        (r["core"], r["node"]): r["pr"]
        for r in pagerank.pagerank_routed(patched, nodes).collect()
    }
    # 100 fixed sweeps: damped tail 0.85^100 ~ 9e-8, i.e. the same Jacobi
    # fixpoint the gated 20-sweep twin is an unrolled prefix of
    fixed = {
        (r["core"], r["node"]): r["pr"]
        for r in pagerank.pagerank_routed(
            patched, nodes, max_iter=100, min_delta=0.0
        ).collect()
    }
    assert set(conv) == set(fixed)
    # stop rule sum|delta| < 1e-5 -> distance to fixpoint <= delta*d/(1-d)
    for k in conv:
        assert conv[k] == pytest.approx(fixed[k], abs=1e-4)


def test_enumerate_paths_batched_slices_and_resume(spark, tmp_path):
    """G5 hub-scale harness: head-sliced enumeration (a) equals the
    one-shot enumeration row-for-row, (b) bounds per-slice checkpointed
    rows to the slice's heads (a planted hub's blowup stays inside its
    own slice), (c) resumes via anti-join — a grown seed set re-runs
    only the new heads (no duplicate head rows, hub slices untouched),
    and (d) the opt-in hub_capped_edges guard removes the hub's
    out-degree^2 contribution entirely."""
    from ttmf_spark.checkpoint import StageStore
    from ttmf_spark.kg import paths as P

    # planted hub: head 1000 -> 40 mids, each mid -> 10 leaves
    # (40 + 400 = 440 paths from one head); plus 6 normal heads with
    # a 2-edge chain each
    hub = [(1000, 2000 + i, 0) for i in range(40)]
    hub += [(2000 + i, 3000 + 10 * i + j, 1) for i in range(40) for j in range(10)]
    normal = []
    for k in range(6):
        normal += [(k, 100 + k, 0), (100 + k, 200 + k, 1)]
    edges = spark.createDataFrame(hub + normal, ["src", "dst", "r"])
    seeds = spark.createDataFrame([(1000,)] + [(k,) for k in range(6)], ["h"])

    want = sorted(map(tuple, P.enumerate_paths(edges, seeds).collect()))

    store = StageStore(str(tmp_path / "ck"))
    got_df = P.enumerate_paths_batched(edges, seeds, store, n_slices=4)
    assert sorted(map(tuple, got_df.collect())) == want

    # (b) per-slice row bound: no slice holds more than the hub head's
    # own paths + the small heads that hashed with it; at least one
    # slice is hub-free and tiny
    import pyarrow.parquet as pq, glob
    slice_rows = []
    for s in range(4):
        fs = glob.glob(str(tmp_path / "ck" / f"paths_s{s:04d}" / "*.parquet"))
        slice_rows.append(sum(pq.ParquetFile(f).metadata.num_rows for f in fs))
    assert sum(slice_rows) == len(want)
    assert min(slice_rows) < 40  # hub blowup confined to its slice

    # (c) resume with a GROWN seed set: one new head
    edges2 = edges.unionByName(
        spark.createDataFrame([(7, 107, 0), (107, 207, 1)], ["src", "dst", "r"])
    )
    seeds2 = seeds.unionByName(spark.createDataFrame([(7,)], ["h"]))
    got2 = P.enumerate_paths_batched(edges2, seeds2, store, n_slices=4)
    want2 = sorted(map(tuple, P.enumerate_paths(edges2, seeds2).collect()))
    # done heads kept their OLD enumeration (edges2 only adds head 7's
    # chain, so old heads' paths are unchanged) -> exact equality
    assert sorted(map(tuple, got2.collect())) == want2
    # no head enumerated twice: per-slice head tables stay duplicate-free
    all_heads = []
    for s in range(4):
        fs = glob.glob(str(tmp_path / "ck" / f"paths_s{s:04d}_heads" / "*.parquet"))
        for f in fs:
            all_heads += pq.read_table(f)["h"].to_pylist()
    assert len(all_heads) == len(set(all_heads)) == 8

    # (d) hub guard: capping out-degree at 20 removes exactly the hub
    # head's paths (hub out-degree 40 > 20; mids are 10 <= 20)
    capped = P.enumerate_paths(P.hub_capped_edges(edges, max_out=20), seeds)
    got_capped = sorted(map(tuple, capped.collect()))
    want_no_hub = [w for w in want if w[0] != 1000]
    assert got_capped == want_no_hub


def test_enumerate_paths_batched_crash_window_duplicates_never_loss(
    spark, tmp_path
):
    """G5 durability note made executable (paths.py: "the parquet
    fallback orders paths-first so the failure mode is duplicates,
    never silent loss"): simulate a crash in the resume branch BETWEEN
    the paths-append and the heads-append, verify (a) the inconsistency
    is detectable exactly as documented (distinct heads in the path
    table vs the head table), (b) the next resume re-enumerates that
    batch and the result's DISTINCT row set equals the full enumeration
    (duplicates, never loss). Production swaps the append pair for one
    Iceberg transaction; no Iceberg runtime ships in this sandbox, so
    the crash-window ordering contract is what gets pinned."""
    from ttmf_spark.checkpoint import StageStore
    from ttmf_spark.kg import paths as P

    edges = spark.createDataFrame(
        [(k, 100 + k, 0) for k in range(6)]
        + [(100 + k, 200 + k, 1) for k in range(6)],
        ["src", "dst", "r"],
    )
    seeds = spark.createDataFrame([(k,) for k in range(6)], ["h"])
    store = StageStore(str(tmp_path / "ck"))
    n_slices = 4
    P.enumerate_paths_batched(edges, seeds, store, n_slices=n_slices)

    # grown input: head 7 arrives
    edges2 = edges.unionByName(
        spark.createDataFrame([(7, 107, 0), (107, 207, 1)], ["src", "dst", "r"])
    )
    seeds2 = seeds.unionByName(spark.createDataFrame([(7,)], ["h"]))
    want2 = P.enumerate_paths(edges2, seeds2).collect()

    # simulate the crash window: replay the resume branch's FIRST append
    # (paths) for head 7's slice, then "crash" before the heads-append
    s7 = spark.createDataFrame([(7,)], ["h"]).select(
        F.pmod(F.xxhash64("h"), F.lit(n_slices)).alias("s")
    ).first()["s"]
    pname, hname = f"paths_s{s7:04d}", f"paths_s{s7:04d}_heads"
    new_head = spark.createDataFrame([(7,)], ["h"])
    P.enumerate_paths(edges2, new_head).write.mode("append").parquet(
        store.path(pname)
    )
    # (a) the torn state is detectable exactly as documented
    path_heads = {
        r["h"] for r in
        spark.read.parquet(store.path(pname)).select("h").distinct().collect()
    }
    done_heads = {
        r["h"] for r in spark.read.parquet(store.path(hname)).collect()
    }
    assert path_heads - done_heads == {7}

    # (b) resume after the crash: head 7 re-enumerates (head table never
    # saw it), its rows duplicate, nothing is lost
    def _t(row):
        return tuple(tuple(v) if isinstance(v, list) else v for v in row)

    got = P.enumerate_paths_batched(
        edges2, seeds2, store, n_slices=n_slices
    ).collect()
    assert sorted(set(map(_t, got))) == sorted(set(map(_t, want2)))  # never loss
    dup_rows = [r for r in got if r["h"] == 7]
    base_rows = [r for r in want2 if r["h"] == 7]
    assert len(dup_rows) == 2 * len(base_rows)  # the duplicates
    # and the head table is consistent again after the healed resume
    done_after = {
        r["h"] for r in spark.read.parquet(store.path(hname)).collect()
    }
    assert 7 in done_after


def test_fit_embeddings_fixed_partition_invariance_and_energy_tables(spark):
    """The deterministic full-batch trainer (transe.fit_embeddings_fixed,
    the kg_ptranse_dev_loss gate): (a) values are partition-invariant to
    float-sum reassociation (~1e-13) — repartitioned input trains to the
    same model; (b) path terms actually move relation vectors (the
    PTransE composition term is live); (c) add_energy_from_tables on the
    trained tables equals the broadcast numpy energy UDF on the same
    vectors."""
    import numpy as np

    from ttmf_spark.kg import transe as T

    trips = [(0, 0, 1), (1, 0, 2), (0, 1, 2), (2, 1, 3), (3, 0, 4), (4, 1, 0)]
    idt = spark.createDataFrame(trips, "h long, r long, t long")
    pt = spark.createDataFrame(
        [(0, 0, 1, 0.75), (0, 1, 0, 0.25)],
        "r1 long, r2 long, r long, weight double",
    )
    n_ent, n_rel, dim = 5, 2, 3

    def fit(df, paths):
        e, r = T.fit_embeddings_fixed(
            spark, df, n_ent, n_rel, paths=paths, dim=dim, epochs=2
        )
        em = {(x.id, x.k): x.val for x in e.collect()}
        rm = {(x.id, x.k): x.val for x in r.collect()}
        return em, rm

    e1, r1 = fit(idt, pt)
    e2, r2 = fit(idt.repartition(7), pt.repartition(3))
    assert e1.keys() == e2.keys() and r1.keys() == r2.keys()
    assert all(abs(e1[k] - e2[k]) < 1e-12 for k in e1)
    assert all(abs(r1[k] - r2[k]) < 1e-12 for k in r1)

    # (b) the path-composition term is live: rel vectors move without it
    _, r_nopath = fit(idt, None)
    assert any(abs(r1[k] - r_nopath[k]) > 1e-9 for k in r1)

    # (c) table-join energy == broadcast numpy energy on the same model
    ent_np = np.zeros((n_ent, dim))
    rel_np = np.zeros((n_rel, dim))
    for (i, k), v in e1.items():
        ent_np[i, k] = v
    for (i, k), v in r1.items():
        rel_np[i, k] = v
    ent_df, rel_df = T.fit_embeddings_fixed(
        spark, idt, n_ent, n_rel, paths=pt, dim=dim, epochs=2
    )
    q = idt.select("h", "r", "t")
    via_tables = {
        (x.h, x.r, x.t): x.energy
        for x in T.add_energy_from_tables(q, ent_df, rel_df, dim).collect()
    }
    udf = T.transe_energy_col(spark, ent_np, rel_np)
    via_udf = {
        (x.h, x.r, x.t): x.energy
        for x in T.add_transe_energy(q, udf).collect()
    }
    assert via_tables.keys() == via_udf.keys()
    assert all(abs(via_tables[k] - via_udf[k]) < 1e-10 for k in via_tables)
