"""Personalized weighted PageRank per core subgraph (reference `pagerank.py`).

Reference semantics (pagerank.py:18-85), preserved exactly up to iteration
scheme:

- dangling patch: a node with no out-edges in its subgraph gets a self-loop
  of weight 0.5 and (unless it IS the core) an edge to the core of weight
  0.5 (pagerank.py:32-44);
- init: PR(core)=1.0, all others 0.0 (pagerank.py:53-54);
- update: PR(n) = (1-a)/N + a * sum_in PR(in) * w(in, n), a=0.85
  (pagerank.py:63-72);
- stop when sum |delta| < 1e-5 or 500 iterations (pagerank.py:22-24,78-81).

The reference iterates Gauss-Seidel style (in-place dict updates in node
order — pagerank.py:63-75), which is traversal-order-dependent mid-flight
but converges to the same linear-system fixpoint PR = aW'PR + (1-a)/N as
the order-free Jacobi sweep we use; with epsilon=1e-5 both stop within
epsilon of that fixpoint, so values agree to ~1e-4 (fixture-pinned).

Two implementations:

- ``pagerank_grouped`` (primary): one subgraph per Arrow group via
  applyInPandas — each 4-hop subgraph is small (the reference holds one in
  a single process; ~32 GB bound is for 500k-triple graphs,
  README.md:57), while the number of cores is huge. Parallelism across
  groups = hash shuffle on `core`; inside a group it's a dense/sparse
  numpy Jacobi sweep — vectorized, no per-row Python (BASELINE.json).
  This is the scale path: 10^12-doc graphs mean billions of cores, each a
  tiny matrix — exactly the "many small problems" shape grouped-map was
  built for.
- ``pagerank_iterative`` (reference-shaped alternative, used for
  cross-checks): all cores advance together through global DataFrame
  Jacobi rounds; converged cores drop out via a per-core delta agg.
  Correct but pays a shuffle per iteration — benchmarked slower; kept as
  the arbitrarily-large-single-subgraph fallback.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMPING = 0.85  # pagerank.py:22
MAX_ITER = 500  # pagerank.py:23
MIN_DELTA = 1e-5  # pagerank.py:24

PR_SCHEMA = "core long, node long, pr double"


def patched_edges(sg_edges: DataFrame, sg_nodes: DataFrame) -> DataFrame:
    """Apply the dangling-node patch to (core, src, dst, w) edges.

    Dangling = subgraph node with no out-edge (reference pagerank.py:32-44).
    """
    dangling = sg_nodes.join(
        sg_edges.select("core", F.col("src").alias("node")).distinct(),
        ["core", "node"],
        "left_anti",
    )
    self_loops = dangling.select(
        "core",
        F.col("node").alias("src"),
        F.col("node").alias("dst"),
        F.lit(0.5).alias("w"),
    )
    to_core = dangling.filter(F.col("node") != F.col("core")).select(
        "core",
        F.col("node").alias("src"),
        F.col("core").alias("dst"),
        F.lit(0.5).alias("w"),
    )
    return sg_edges.unionByName(self_loops).unionByName(to_core)


def _jacobi(
    n: int,
    core_ix: int,
    src: np.ndarray,
    dst: np.ndarray,
    w: np.ndarray,
    damping: float = DAMPING,
    max_iter: int = MAX_ITER,
    min_delta: float = MIN_DELTA,
    pr_init: np.ndarray | None = None,
) -> np.ndarray:
    if pr_init is not None:
        pr = pr_init.astype(np.float64, copy=True)
    else:
        pr = np.zeros(n)
        pr[core_ix] = 1.0
    dv = (1.0 - damping) / n
    for _ in range(max_iter):
        # bincount is the buffered scatter-add (np.add.at is unbuffered and
        # ~10x slower — it was the hot inner loop of the 23s round-1 stage)
        new = np.bincount(dst, weights=damping * pr[src] * w, minlength=n) + dv
        if np.abs(new - pr).sum() < min_delta:
            pr = new
            break
        pr = new
    return pr


def pagerank_grouped(
    patched: DataFrame,
    max_iter: int = MAX_ITER,
    min_delta: float = MIN_DELTA,
    n_buckets: int = 256,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """(core, src, dst, w) [patched] -> (core, node, pr) via grouped Arrow UDF.

    Cores are batched into ``n_buckets`` hash buckets and solved core-by-
    core INSIDE each Arrow group: one group per core pays per-group
    Arrow/pandas overhead thousands of times (it dominated the round-1
    23s entity_rank stage), while per-bucket batching amortizes it ~
    (cores/buckets)x with identical results and the same cross-core
    parallelism (buckets >> cores(cluster)). Per-bucket memory is
    total_edges/n_buckets — hub-size outliers are already routed away by
    ``pagerank_routed`` before this runs.

    ``init_ranks`` (core, node, pr) warm-starts each core's Jacobi sweep
    from the previous snapshot's ranks (same unique fixpoint, fewer
    sweeps — the grouped twin of the iterative path's warm start). It
    rides in as one extra (core, src)-keyed left join: after patching,
    EVERY subgraph node appears as a src (dangling nodes got self-loops),
    so a per-(core, src) column covers the full node set; new-since-
    snapshot nodes are NULL -> cold value.
    """
    with_init = init_ranks is not None
    if with_init:
        prev = init_ranks.select(
            "core", F.col("node").alias("src"), F.col("pr").alias("_pr0")
        )
        patched = patched.join(prev, ["core", "src"], "left")

    def _solve_slice(core, sv, dv_, wv, pr0):
        """One core's Jacobi on raw array slices -> (cores, nodes, pr)."""
        nodes = np.unique(np.concatenate([sv, dv_, [core]]))
        # nodes is sorted -> searchsorted is the vectorized id->index map
        src = np.searchsorted(nodes, sv)
        dst = np.searchsorted(nodes, dv_)
        core_ix = int(np.searchsorted(nodes, core))
        pr_init = None
        if pr0 is not None:
            # one value per unique src row; every node IS a src post-patch
            first = np.unique(src, return_index=True)[1]
            pr_init = np.zeros(len(nodes))
            pr_init[core_ix] = 1.0  # cold fallback for NULL/new nodes
            got = pr0[first]
            have = ~np.isnan(got)
            pr_init[src[first][have]] = got[have]
        pr = _jacobi(
            len(nodes),
            core_ix,
            src,
            dst,
            wv,
            max_iter=max_iter,
            min_delta=min_delta,
            pr_init=pr_init,
        )
        return np.full(len(nodes), core, dtype=np.int64), nodes, pr

    def _bucket(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        # pure-numpy batch path: one stable argsort groups the bucket's
        # cores contiguously, each core solves on array SLICES, and the
        # bucket emits ONE frame — pandas groupby + a pd.DataFrame per
        # core cost ~3 ms/core at 30k cores/run (it was half the stage)
        cores_arr = pdf["core"].to_numpy(dtype=np.int64)
        order = np.argsort(cores_arr, kind="stable")
        cs = cores_arr[order]
        sv_a = pdf["src"].to_numpy(dtype=np.int64)[order]
        dv_a = pdf["dst"].to_numpy(dtype=np.int64)[order]
        wv_a = pdf["w"].to_numpy(dtype=np.float64)[order]
        pr0_a = (
            pdf["_pr0"].to_numpy(dtype=np.float64)[order]
            if with_init else None
        )
        bounds = np.flatnonzero(np.r_[True, cs[1:] != cs[:-1], True])
        out = [
            _solve_slice(
                int(cs[a]), sv_a[a:b], dv_a[a:b], wv_a[a:b],
                pr0_a[a:b] if pr0_a is not None else None,
            )
            for a, b in zip(bounds[:-1], bounds[1:])
        ]
        return pd.DataFrame(
            {
                "core": np.concatenate([o[0] for o in out]),
                "node": np.concatenate([o[1] for o in out]).astype(np.int64),
                "pr": np.concatenate([o[2] for o in out]),
            }
            if out
            else {"core": [], "node": [], "pr": []}
        )

    bucketed = patched.withColumn(
        "_bkt", F.pmod(F.xxhash64("core"), F.lit(n_buckets))
    )
    return (
        bucketed.groupBy("_bkt")
        .applyInPandas(_bucket, schema=PR_SCHEMA)
    )


def pagerank_routed(
    patched: DataFrame,
    sg_nodes: DataFrame,
    hub_edge_bound: int = 2_000_000,
    max_iter: int = MAX_ITER,
    min_delta: float = MIN_DELTA,
    init_ranks: DataFrame | None = None,
) -> DataFrame:
    """Hub-safe PageRank: per-core edge counts route each subgraph.

    Cores with <= ``hub_edge_bound`` edges go through the grouped Arrow
    kernel (one small numpy problem per core — the common case); cores
    whose 4-hop subgraph explodes past the bound (a core within reach of a
    hub entity) would OOM a single Arrow group, so they run through the
    all-DataFrame ``pagerank_iterative`` path instead (SCALE.md routing
    rule, round-2 implementation). Both paths share patch semantics and
    the fixpoint, so the union is seamless.
    """
    sizes = patched.groupBy("core").agg(F.count("*").alias("_n_edges"))
    # snapshot BEFORE counting: count() on the raw plan would run the
    # full per-core aggregation once for the count and a second time for
    # the eager checkpoint
    big_cores = (
        sizes.filter(F.col("_n_edges") > hub_edge_bound)
        .select("core")
        .localCheckpoint(eager=True)
    )
    n_big = big_cores.count()
    if n_big == 0:
        return pagerank_grouped(
            patched, max_iter=max_iter, min_delta=min_delta,
            init_ranks=init_ranks,
        )
    big_cores = F.broadcast(big_cores)
    small = pagerank_grouped(
        patched.join(big_cores, "core", "left_anti"),
        max_iter=max_iter,
        min_delta=min_delta,
        init_ranks=init_ranks.join(big_cores, "core", "left_anti")
        if init_ranks is not None else None,
    )
    big = pagerank_iterative(
        patched.join(big_cores, "core", "left_semi"),
        sg_nodes.join(big_cores, "core", "left_semi"),
        max_iter=max_iter,
        min_delta=min_delta,
        init_ranks=init_ranks.join(big_cores, "core", "left_semi")
        if init_ranks is not None else None,
    )
    return small.unionByName(big)


def pagerank_iterative(
    patched: DataFrame,
    sg_nodes: DataFrame,
    max_iter: int = MAX_ITER,
    min_delta: float = MIN_DELTA,
    checkpoint_every: int = 2,
    init_ranks: DataFrame | None = None,
    rounds_out: list | None = None,
) -> DataFrame:
    """Global DataFrame Jacobi: all cores per round, converged cores retire.

    ``checkpoint_every`` must stay small: each iteration references the
    previous state twice (contrib + delta join), so the lazy plan DOUBLES
    per round — localCheckpoint is what keeps analysis cost linear.

    ``init_ranks`` (core, node, pr) warm-starts the sweep — the
    incremental-maintenance path after a snapshot delta: the Jacobi
    fixpoint is unique (damping < 1 contraction), so starting from the
    previous snapshot's ranks reaches the SAME fixpoint in fewer rounds
    (pinned by test); nodes absent from ``init_ranks`` (new since the
    snapshot) fall back to the cold-start value. ``rounds_out``, if
    given, receives the number of convergence-checked rounds actually
    run (the warm-vs-cold evidence hook).
    """
    # snapshot the (possibly deep) edge lineage ONCE: it is re-joined every
    # iteration and would otherwise be re-analyzed ~2 x max_iter times
    patched = patched.localCheckpoint(eager=True)
    sizes = sg_nodes.groupBy("core").agg(F.count("*").alias("n"))
    cold = F.when(F.col("node") == F.col("core"), 1.0).otherwise(0.0)
    pr0 = sg_nodes.join(sizes, "core")
    if init_ranks is not None:
        prev = init_ranks.select("core", "node", F.col("pr").alias("_pr_prev"))
        pr0 = pr0.join(prev, ["core", "node"], "left").withColumn(
            "_pr0", F.coalesce("_pr_prev", cold)
        )
    else:
        pr0 = pr0.withColumn("_pr0", cold)
    pr = pr0.select(
        "core",
        "node",
        F.col("_pr0").alias("pr"),
        ((1.0 - DAMPING) / F.col("n")).alias("dv"),
    ).localCheckpoint(eager=True)
    active = pr
    done_parts: list[DataFrame] = []
    for i in range(max_iter):
        e = patched.join(
            active.select("core").distinct(), "core", "left_semi"
        )
        contrib = (
            active.select("core", F.col("node").alias("src"), "pr")
            .join(e, ["core", "src"])
            .groupBy("core", F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") * F.col("w")).alias("mass"))
        )
        new = (
            active.select("core", "node", "dv", F.col("pr").alias("pr_old"))
            .join(contrib, ["core", "node"], "left")
            .select(
                "core",
                "node",
                (F.coalesce("mass", F.lit(0.0)) * DAMPING + F.col("dv")).alias("pr"),
                "dv",
                "pr_old",
            )
        )
        if (i + 1) % checkpoint_every == 0 or i == max_iter - 1:
            new = new.localCheckpoint(eager=True)
            deltas = new.groupBy("core").agg(
                F.sum(F.abs(F.col("pr") - F.col("pr_old"))).alias("delta")
            )
            finished = deltas.filter(F.col("delta") < min_delta).select("core")
            done_parts.append(
                new.join(finished, "core", "left_semi").select("core", "node", "pr")
            )
            active = new.join(finished, "core", "left_anti").select(
                "core", "node", "pr", "dv"
            ).localCheckpoint(eager=True)
            if rounds_out is not None:
                rounds_out.append(i + 1)
            if active.isEmpty():
                break
        else:
            active = new.select("core", "node", "pr", "dv")
    out = active.select("core", "node", "pr")
    for d in done_parts:
        out = out.unionByName(d)
    return out


def affected_cores(
    reach: DataFrame, delta_edges: DataFrame, depth: int = 4
) -> DataFrame:
    """Cores whose personalized ranks a delta edge batch can change.

    A core's subgraph is the out-edges of nodes within ``depth - 1`` hops
    (graph.subgraph_edges), so an added / removed / re-weighted edge
    (src, dst) touches core c iff ``src`` lies within ``depth - 1`` of c —
    re-weighting is keyed on src too because weights are src-out-degree
    normalized (graph.weighted_edges). ``reach`` must cover every hop the
    delta can matter through: pass the reach table of the POST-delta graph
    for additions, union the pre-delta reach when edges were dropped.

    ONE semi-join, output is core-dim: the scoping step that turns a
    snapshot delta into a bounded re-rank instead of a full re-rank of
    billions of cores.
    """
    touched = delta_edges.select(F.col("src").alias("node")).distinct()
    return (
        reach.filter(F.col("depth") <= depth - 1)
        .join(touched, "node", "left_semi")
        .select("core")
        .distinct()
    )


def rerank_after_delta(
    edges_w: DataFrame,
    reach: DataFrame,
    cores: DataFrame,
    prev_ranks: DataFrame,
    delta_edges: DataFrame,
    depth: int = 4,
    max_iter: int = MAX_ITER,
    min_delta: float = MIN_DELTA,
    use_routed: bool = False,
    scope_reach: DataFrame | None = None,
) -> DataFrame:
    """Maintain (core, node, pr) after a delta edge batch: re-rank ONLY
    affected cores, warm-started from the previous snapshot's ranks.

    ``edges_w`` / ``reach`` describe the post-delta graph; ``cores`` is
    the full core set (cores new since the snapshot re-rank too — they
    have no prev rows); ``prev_ranks`` is the previous snapshot's full
    (core, node, pr) table. Unaffected cores keep their rows verbatim —
    their subgraphs are identical by construction, so the result equals a
    full cold recompute on the post-delta graph (pinned by
    tests/test_kg.py::test_rerank_after_delta_matches_full_recompute).

    ``scope_reach`` is used ONLY for affected-core scoping (default: the
    post-delta ``reach``). Post-delta scoping provably covers whole
    deletion batches too — on any core->...->deleted-edge path, the FIRST
    deleted edge's src keeps its intact prefix and so stays in post
    reach, and that edge is in the batch — but when maintenance folds
    several interleaved add/delete batches between reach refreshes, pass
    the pre ∪ post union here as the belt-and-braces scope. Subgraphs
    always build from the post-delta ``reach`` alone (a union there would
    graft now-unreachable nodes' out-edges into the re-ranked
    subgraphs). Deletion equality under both scopes is pinned by
    test_rerank_after_deletion_matches_full_recompute.

    Work is bounded by the affected-core subgraphs, not the graph: the
    steady-state maintenance cost of the 10^12-doc rank table as
    extraction batches land (completes ST1 ingestion + N18 label folding
    + N20 warm start into one scoped path).

    Measured economics (BENCH.md round-5 table): the scoped route's cost
    is ~flat in core count (dominated by the reach/prev table scans)
    while the cold route grows linearly with cores — crossover between
    2k and 8.5k cores at event-sized deltas on sf0.1. At scale the fixed
    scans file-prune via ``io_util.read_bucket_pruned``: the scoping
    scan (``affected_cores``) is NODE-keyed (semi-join on the delta
    srcs), so a node-bucketed reach layout prunes it by the delta's
    srcs; the subgraph scan (``reach`` semi affected cores) is
    CORE-keyed and prunes by the affected set once known.
    ``prev_ranks`` must stay the FULL table (the kept-side splice emits
    every unaffected core verbatim) but is touched by exactly one
    broadcast anti-join.
    """
    from . import graph

    aff = affected_cores(
        reach if scope_reach is None else scope_reach, delta_edges, depth=depth
    ).unionByName(
        cores.join(prev_ranks.select("core").distinct(), "core", "left_anti")
    ).distinct().localCheckpoint(eager=True)

    reach_aff = reach.join(aff, "core", "left_semi")
    sg = graph.subgraph_edges(edges_w, reach_aff, depth=depth)
    nodes = graph.subgraph_nodes(sg, cores.join(aff, "core", "left_semi"))
    patched = patched_edges(sg, nodes)
    init = prev_ranks.join(aff, "core", "left_semi")
    if use_routed:
        # production kernel: hub-routed grouped Arrow, warm-started per
        # core (requires long node ids — PR_SCHEMA)
        warm = pagerank_routed(
            patched,
            nodes,
            max_iter=max_iter,
            min_delta=min_delta,
            init_ranks=init,
        )
    else:
        # type-agnostic DataFrame path (works on name-keyed graphs too)
        warm = pagerank_iterative(
            patched,
            nodes,
            max_iter=max_iter,
            min_delta=min_delta,
            init_ranks=init,
        )
    kept = prev_ranks.join(aff, "core", "left_anti")
    return kept.unionByName(warm)
