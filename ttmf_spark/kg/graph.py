"""Adjacency + 4-hop subgraph extraction (reference `search.py`) and
per-subgraph degree/depth features (reference `ResourceRankConfidence.py`).

Reference semantics, re-expressed cleanly:

- Adjacency: parallel (src, dst) edges collapse to one edge with raw
  weight = #relations between the pair (search.py:22-28,48).
- Edge weight normalization: the reference divides each out-edge of a node
  by the total raw weight the node's first DFS visit added
  (search.py:58-60) — at first visit that is the node's *entire* raw
  out-weight, so the clean, traversal-order-free semantics is
  ``w(src,dst) = n_rels(src,dst) / sum_dst' n_rels(src,dst')`` — a single
  global window, computed once for all cores (the reference recomputes it
  inside every per-core DFS). Cycle-induced revisit artifacts of the
  reference DFS (SURVEY.md A4) are deliberately not reproduced; fixtures
  pin the clean rule.
- Subgraph membership: DFS from the core with depth=4 (search.py:76)
  expands nodes at hop distance 0..3 and emits all their out-edges, i.e.
  ``edges(core) = {(u, v) in E : dist(core, u) <= depth-1}``. We compute
  the reach set for ALL cores simultaneously with `depth` rounds of
  frontier equi-joins — the reference's per-core process fan-out
  (search.py:129-137) becomes hash partitioning on `core`.
- BFS depth labels (ResourceRankConfidence.py:238-255): hop distance from
  the core — free from the same frontier iteration (round of first
  discovery).
- Degrees (ResourceRankConfidence.py:232-236): distinct-neighbor in/out
  degree *within the subgraph* (pygraph collapses parallel edges).

Scale notes: each join round is an equi-join on `node == src`; hub
entities make the frontier skewed, so rounds run with AQE skew-join
splitting plus an optional salted join for the pathological case. The
frontier is `distinct`-ed each round (set semantics) which also bounds
growth; lineage is truncated per round via localCheckpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_DEPTH = 4  # reference search.py:76 (DFS depth=4)


def build_adjacency(id_triples: DataFrame) -> DataFrame:
    """(h, r, t) -> collapsed edges (src, dst, rels array<long>, n_rels).

    Reference ReadAllTriples (search.py:14-34): {h: {t: [r, ...]}}.
    ``rels`` keeps the parallel relation list (needed by path enumeration);
    ``n_rels`` is the raw edge weight (search.py:48 wt=len(sequence[key])).
    """
    return (
        id_triples.groupBy(F.col("h").alias("src"), F.col("t").alias("dst"))
        .agg(
            F.sort_array(F.collect_list("r")).alias("rels"),
            F.count("r").alias("n_rels"),
        )
    )


def weighted_edges(adjacency: DataFrame) -> DataFrame:
    """Add the out-normalized weight w = n_rels / sum(n_rels) per src."""
    w = Window.partitionBy("src")
    return adjacency.withColumn(
        "w", (F.col("n_rels") / F.sum("n_rels").over(w)).cast("double")
    )


def reach_sets(
    edges: DataFrame,
    cores: DataFrame,
    depth: int = DEFAULT_DEPTH,
    checkpoint: bool = True,
) -> DataFrame:
    """All-cores BFS: (core, node, depth) with depth = hop distance <= depth.

    ``cores`` is a one-column DataFrame (``core``). Runs `depth` rounds of
    frontier x edges equi-joins; every round the frontier is reduced to
    newly-discovered (core, node) pairs via left_anti against the visited
    set (min-depth semantics come free: first discovery is the BFS round).
    """
    slim = edges.select("src", "dst")
    visited = cores.select(F.col("core"), F.col("core").alias("node")).withColumn(
        "depth", F.lit(0)
    )
    if checkpoint:
        visited = visited.localCheckpoint(eager=True)
    frontier = visited
    for d in range(1, depth + 1):
        nxt = (
            frontier.join(slim, frontier.node == slim.src)
            .select("core", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("core", "node"), ["core", "node"], "left_anti")
            .withColumn("depth", F.lit(d))
        )
        if checkpoint:
            nxt = nxt.localCheckpoint(eager=True)
        visited = visited.unionByName(nxt)
        frontier = nxt
        if checkpoint:
            visited = visited.localCheckpoint(eager=True)
    return visited


def subgraph_edges(
    edges_w: DataFrame, reach: DataFrame, depth: int = DEFAULT_DEPTH
) -> DataFrame:
    """(core, src, dst, w): out-edges of every node within depth-1 of core.

    Equivalent of the reference's per-core subGraphs_4/<e>.txt files
    (search.py:78-86) as ONE table — eliminates the million-small-files
    pattern (SURVEY.md S5).
    """
    inner = reach.filter(F.col("depth") <= depth - 1).select(
        "core", F.col("node").alias("src")
    )
    return inner.join(edges_w.select("src", "dst", "w"), "src").select(
        "core", "src", "dst", "w"
    )


def subgraph_nodes(sg_edges: DataFrame, cores: DataFrame) -> DataFrame:
    """Node set of each subgraph: endpoints of subgraph edges + the core."""
    return (
        sg_edges.select("core", F.col("src").alias("node"))
        .unionByName(sg_edges.select("core", F.col("dst").alias("node")))
        .unionByName(cores.select("core", F.col("core").alias("node")))
        .distinct()
    )


def subgraph_degrees(sg_edges: DataFrame) -> DataFrame:
    """Distinct-neighbor in/out degree per (core, node).

    Reference rudu/chudu (ResourceRankConfidence.py:232-236); missing
    degree = 0 (node with no in- or out-edges in the subgraph).
    """
    outd = sg_edges.groupBy("core", F.col("src").alias("node")).agg(
        F.count_distinct("dst").alias("out_deg")
    )
    ind = sg_edges.groupBy("core", F.col("dst").alias("node")).agg(
        F.count_distinct("src").alias("in_deg")
    )
    return outd.join(ind, ["core", "node"], "full").select(
        "core",
        "node",
        F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
        F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
    )


def common_neighbor_scores(
    id_triples: DataFrame,
    max_degree: int | None = 1000,
    k: int = 100,
    checkpoint: bool = True,
) -> DataFrame:
    """Link-prediction candidate scores over the undirected KG skeleton:
    for node pairs u < v that are NOT already connected, the
    common-neighbor count, Adamic-Adar score
    `aa = sum over z in N(u) & N(v) of 1/ln(deg(z))`, and the
    resource-allocation index `ra = sum of 1/deg(z)` (Zhou et al. 2009)
    — the classic KGC missing-link baselines (not in the reference, which
    predicts links via TransE ranks in evaluate.py; this is the
    structural twin a production pipeline runs first because it needs no
    training, and RA is the same spread-resource-over-out-degree
    weighting TTMF's entity-level ResourceRank itself uses,
    ResourceRank2.py:49-57).

    Shape at scale: one self-join of the (node, neighbor) edge list on
    the shared neighbor z — shuffles on z, so a hub z with degree d
    contributes d^2 join rows. ``max_degree`` is the skew guard (same
    pattern as the jaccard max_df guard, dedup.py): hub intermediates are
    dropped BEFORE the join, bounding any z's contribution to
    max_degree^2; the score loss is bounded by 1/ln(max_degree) per
    dropped hub, the smallest-weight evidence there is. Top-k output
    (TakeOrderedAndProject, no global sort materialization) keeps the
    result dim-sized; ordering is deterministic (aa desc, cn desc, u, v).

    ``checkpoint`` snapshots the twice-consumed skeleton and (z, node)
    frames so the upstream encode subtree isn't replicated under every
    self-join arm (measured 140 -> ~20 Exchanges, analysis 27 s -> sub-s
    on the driver query; same localCheckpoint discipline as the loops).
    """
    und = (
        id_triples.filter(F.col("h") != F.col("t"))
        .select(F.col("h").alias("node"), F.col("t").alias("nbr"))
        .unionByName(
            id_triples.filter(F.col("h") != F.col("t")).select(
                F.col("t").alias("node"), F.col("h").alias("nbr")
            )
        )
        .distinct()
    )
    if checkpoint:
        und = und.localCheckpoint(eager=True)
    deg = und.groupBy(F.col("nbr").alias("z")).agg(F.count("*").alias("deg"))
    if max_degree is not None:
        deg = deg.filter(F.col("deg") <= max_degree)
    # (z, node) pairs restricted to surviving intermediates
    ez = und.select(F.col("nbr").alias("z"), "node").join(deg, "z")
    if checkpoint:
        ez = ez.localCheckpoint(eager=True)
    left = ez.select("z", F.col("node").alias("u"), "deg")
    right = ez.select("z", F.col("node").alias("v"))
    pairs = (
        left.join(right, "z")
        .filter(F.col("u") < F.col("v"))
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("cn"),
            F.round(F.sum(1.0 / F.log("deg")), 6).alias("aa"),
            F.round(F.sum(1.0 / F.col("deg")), 6).alias("ra"),
        )
    )
    # keep only non-edges: the point is predicting MISSING links
    existing = und.select(
        F.least("node", "nbr").alias("u"), F.greatest("node", "nbr").alias("v")
    ).distinct()
    return (
        pairs.join(existing, ["u", "v"], "left_anti")
        .orderBy(F.col("aa").desc(), F.col("cn").desc(), "u", "v")
        .limit(k)
    )


def relation_profile(id_triples: DataFrame) -> DataFrame:
    """Per-relation cardinality profile: triple count, distinct
    head/tail counts, avg tails-per-head (tph) and heads-per-tail (hpt),
    and the Bordes-et-al category (1-1 / 1-N / N-1 / N-N at the 1.5
    threshold) standard TransE evaluations bucket by. The KG QA query a
    pipeline runs before training: pathological relations (huge N-N fan)
    surface here first.

    Two partial aggregations on (r, h) / (r, t) then a dim-sized join —
    everything map-side combinable; output is |relations| rows.
    """
    tph = (
        id_triples.groupBy("r", "h")
        .agg(F.count("*").alias("_n"))
        .groupBy("r")
        .agg(
            F.round(F.avg("_n"), 6).alias("tph"),
            F.count("*").alias("n_heads"),
            F.sum("_n").alias("n_triples"),
        )
    )
    hpt = (
        id_triples.groupBy("r", "t")
        .agg(F.count("*").alias("_n"))
        .groupBy("r")
        .agg(F.round(F.avg("_n"), 6).alias("hpt"), F.count("*").alias("n_tails"))
    )
    prof = tph.join(hpt, "r")
    cat = (
        F.when((F.col("tph") < 1.5) & (F.col("hpt") < 1.5), F.lit("1-1"))
        .when((F.col("tph") >= 1.5) & (F.col("hpt") < 1.5), F.lit("1-N"))
        .when((F.col("tph") < 1.5) & (F.col("hpt") >= 1.5), F.lit("N-1"))
        .otherwise(F.lit("N-N"))
    )
    return prof.select(
        "r", "n_triples", "n_heads", "n_tails", "tph", "hpt", cat.alias("category")
    )


def triangle_stats(id_triples: DataFrame, checkpoint: bool = True) -> DataFrame:
    """Per-node triangle count and local clustering coefficient over the
    undirected distinct KG skeleton — the standard graph-quality profile a
    pipeline runs next to `relation_profile` (not in the reference, which
    has no whole-graph statistics; structural sibling of
    `common_neighbor_scores`).

    Skew story (the part that matters at 10^9 edges): triangles are
    enumerated with the *degree-ordered orientation* (each undirected edge
    kept once, pointing from the lower-(degree, id) endpoint to the
    higher), so every wedge join fans out over a node's ORIENTED
    out-neighborhood, which is O(sqrt(m)) even at a hub — the classic
    compact-forward bound — instead of deg(hub)^2. The orientation changes
    only the plan, never the result (each triangle has exactly one
    rank-minimal apex), so the DuckDB twin can use the naive a<b
    orientation and still match exactly. Two equi-joins total; no windows,
    no cartesian products.

    Output: (node, degree, triangles, clust_coef) with
    clust_coef = 2*T / (d*(d-1)) rounded to 6 (0.0 when d < 2).

    ``checkpoint``: the skeleton and the oriented edge list are each
    consumed by 2-3 downstream branches; snapshotting them
    (localCheckpoint, same discipline as the reach/PageRank loops) keeps
    the plan LINEAR instead of replicating the whole upstream
    encode/extract subtree under every self-join arm (measured: 828
    Exchanges without, 13 with, on the driver query).
    """
    und = (
        id_triples.filter(F.col("h") != F.col("t"))
        .select(F.col("h").alias("node"), F.col("t").alias("nbr"))
        .unionByName(
            id_triples.filter(F.col("h") != F.col("t")).select(
                F.col("t").alias("node"), F.col("h").alias("nbr")
            )
        )
        .distinct()
    )
    if checkpoint:
        und = und.localCheckpoint(eager=True)
    deg = und.groupBy("node").agg(F.count("*").alias("deg"))
    # one row per undirected edge, endpoint degrees attached
    ed = (
        und.filter(F.col("node") < F.col("nbr"))
        .join(deg.select(F.col("node").alias("node"), F.col("deg").alias("dx")), "node")
        .join(
            deg.select(F.col("node").alias("nbr"), F.col("deg").alias("dy")),
            "nbr",
        )
    )
    rank_x = F.struct(F.col("dx").alias("d"), F.col("node").alias("i"))
    rank_y = F.struct(F.col("dy").alias("d"), F.col("nbr").alias("i"))
    oriented = ed.select(
        F.when(rank_x < rank_y, F.col("node")).otherwise(F.col("nbr")).alias("a"),
        F.when(rank_x < rank_y, F.col("nbr")).otherwise(F.col("node")).alias("b"),
        F.when(rank_x < rank_y, rank_y).otherwise(rank_x).alias("rank_b"),
    )
    if checkpoint:
        oriented = oriented.localCheckpoint(eager=True)
    u = oriented.select(
        F.col("a"), F.col("b").alias("b1"), F.col("rank_b").alias("rk1")
    )
    v = oriented.select(
        F.col("a"), F.col("b").alias("b2"), F.col("rank_b").alias("rk2")
    )
    wedges = u.join(v, "a").filter(F.col("rk1") < F.col("rk2"))
    closing = oriented.select(
        F.col("a").alias("b1"), F.col("b").alias("b2")
    )
    tri = wedges.join(closing, ["b1", "b2"]).select("a", "b1", "b2")
    nodes = (
        tri.select(F.col("a").alias("node"))
        .unionByName(tri.select(F.col("b1").alias("node")))
        .unionByName(tri.select(F.col("b2").alias("node")))
    )
    tn = nodes.groupBy("node").agg(F.count("*").alias("triangles"))
    return deg.join(tn, "node", "left").select(
        "node",
        F.col("deg").alias("degree"),
        F.coalesce(F.col("triangles"), F.lit(0)).cast("long").alias("triangles"),
        F.when(
            F.col("deg") >= 2,
            F.round(
                2.0
                * F.coalesce(F.col("triangles"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - F.lit(1.0))),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("clust_coef"),
    )


def kcore(
    id_triples: DataFrame,
    k: int = 2,
    rounds: int | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """K-core of the undirected distinct KG skeleton: iteratively peel
    nodes with degree < k until fixpoint (``rounds=None``) or for exactly
    ``rounds`` sweeps (the hash-gatable twin — same fixed-iteration
    pattern as pagerank_routed(max_iter=20): an unrolled-CTE DuckDB
    oracle matches it sweep for sweep). Output: (node, degree) over the
    surviving edge set — the cohesion profile a pipeline reads next to
    triangles/clustering coefficient (dense cores = well-attested
    regions; the periphery peels off first).

    Scale shape per sweep: one degree agg + two semi-joins, all equi on
    node ids; the edge set only shrinks, and localCheckpoint per sweep
    keeps lineage flat (an unbounded loop otherwise compounds analysis
    cost). Peeling converges in <= diameter sweeps; the fixpoint variant
    stops early via a driver-side count compare (same loop-guard pattern
    as the reference's PageRank convergence check, pagerank.py:78-81).
    """
    alive = (
        id_triples.filter(F.col("h") != F.col("t"))
        .select(F.col("h").alias("node"), F.col("t").alias("nbr"))
        .unionByName(
            id_triples.filter(F.col("h") != F.col("t")).select(
                F.col("t").alias("node"), F.col("h").alias("nbr")
            )
        )
        .distinct()
    )
    if checkpoint:
        alive = alive.localCheckpoint(eager=True)
    n_prev = alive.count()
    i = 0
    while True:
        keep = (
            alive.groupBy("node")
            .agg(F.count("*").alias("deg"))
            .filter(F.col("deg") >= k)
            .select("node")
        )
        nxt = alive.join(keep, "node", "left_semi").join(
            keep.select(F.col("node").alias("nbr")), "nbr", "left_semi"
        )
        if checkpoint:
            nxt = nxt.localCheckpoint(eager=True)
        i += 1
        if rounds is not None:
            alive = nxt
            if i >= rounds:
                break
        else:
            n_next = nxt.count()
            alive, done = nxt, n_next == n_prev
            n_prev = n_next
            if done:
                break
    return alive.groupBy("node").agg(F.count("*").alias("degree"))


def inverse_relation_leakage(
    id_triples: DataFrame,
    min_frac: float = 0.5,
    min_n: int = 10,
) -> DataFrame:
    """(Near-)inverse and symmetric relation pairs — the train/test
    leakage pattern behind FB15K's inflated link-prediction numbers
    (Toutanova & Chen 2015, the reason FB15k-237 exists): for relation
    pair (r1, r2), the fraction of distinct r1 edges (h, t) whose
    reverse (t, h) also exists under r2. A pipeline runs this BEFORE a
    random split: any split of a graph with high-leakage pairs leaks
    test answers into training.

    Output: (r1, r2, n_r1, n_both, frac) for frac >= min_frac and
    n_r1 >= min_n (r1 == r2 rows = symmetric relations). One self-join
    on the (h, t) node pair — hub nodes are NOT hot keys here because
    the join key is the edge's endpoint PAIR; map-side-combinable counts
    above it; output is |relations|^2-bounded (dim-sized).
    """
    # snapshot: consumed by both join sides + the r totals
    t1 = id_triples.select("h", "r", "t").distinct().localCheckpoint(eager=True)
    rev = t1.select(
        F.col("t").alias("h"), F.col("r").alias("r2"), F.col("h").alias("t")
    )
    both = (
        t1.join(rev, ["h", "t"])
        .groupBy(F.col("r").alias("r1"), "r2")
        .agg(F.count("*").alias("n_both"))
    )
    nr = t1.groupBy(F.col("r").alias("r1")).agg(F.count("*").alias("n_r1"))
    return (
        both.join(nr, "r1")
        .withColumn("frac", F.round(F.col("n_both") / F.col("n_r1"), 6))
        .filter((F.col("frac") >= min_frac) & (F.col("n_r1") >= min_n))
        .select("r1", "r2", "n_r1", "n_both", "frac")
    )


def label_propagation(
    id_triples: DataFrame,
    rounds: int = 4,
    checkpoint: bool = True,
) -> DataFrame:
    """Community detection by synchronous label propagation (Raghavan et
    al. 2007) over the undirected distinct KG skeleton — the entity-
    clustering QA step a construction pipeline runs to find disconnected
    or weakly-stitched regions before canonicalization is trusted.

    Deterministic variant: every node starts labeled with its own id;
    each sweep every node adopts the label with the highest neighbor
    count, ties broken toward the SMALLEST label (the usual async
    coin-flip is replaced by a total order so the same input gives the
    same communities under any partitioning — the repo-wide determinism
    contract). Fixed ``rounds`` sweeps, so the unrolled-CTE DuckDB twin
    gates the loop sweep-for-sweep (same pattern as kcore/pagerank_fixed).

    Output: (node, label) — community = label equivalence class.

    Scale shape per sweep: one equi-join of the edge list against the
    label map on nbr (both hash-partitioned on the join key; AQE splits
    hub skew) + two aggregations whose map-side partial combine absorbs
    hot (node, label) cells; the label map is node-sized, never edge-
    sized. localCheckpoint per sweep keeps the plan flat.
    """
    und = (
        id_triples.filter(F.col("h") != F.col("t"))
        .select(F.col("h").alias("node"), F.col("t").alias("nbr"))
        .unionByName(
            id_triples.filter(F.col("h") != F.col("t")).select(
                F.col("t").alias("node"), F.col("h").alias("nbr")
            )
        )
        .distinct()
    )
    if checkpoint:
        und = und.localCheckpoint(eager=True)
    labels = und.select("node").distinct().withColumn("label", F.col("node"))
    for _ in range(rounds):
        votes = (
            und.join(
                labels.select(
                    F.col("node").alias("nbr"), F.col("label").alias("_lbl")
                ),
                "nbr",
            )
            .groupBy("node", "_lbl")
            .agg(F.count("*").alias("_c"))
        )
        # max by (count, -label): largest count, then smallest label
        best = votes.groupBy("node").agg(
            F.max(F.struct(F.col("_c"), (-F.col("_lbl")).alias("_nl"))).alias("_b")
        )
        labels = best.select("node", (-F.col("_b")["_nl"]).alias("label"))
        if checkpoint:
            labels = labels.localCheckpoint(eager=True)
    return labels


def pcra_path_reliability(
    id_triples: DataFrame,
    max_out: int = 1000,
    min_resource: float = 0.01,
) -> DataFrame:
    """Path-Constraint Resource Allocation reliability for 2-hop relation
    paths (Lin et al. 2015, "Modeling Relation Paths for Representation
    Learning" — the PCRA weighting PTransE uses to score how reliably a
    path p = (r1, r2) connects h to t). The reference's shipped PTransE
    trainer skips the path-composition term (KGE/src/approaches/
    PTransE.java:373-394 corrupts relations only), so this surfaces the
    paper's path-evidence signal as a standalone graph feature instead:
    R(t | h, p) = sum_m [1/|out(h, r1)|] * [1/|out(m, r2)|] over
    intermediate nodes m, i.e. one unit of resource flows out of h and
    splits uniformly at each hop along the path's relation type.

    Rows: (h, r1, r2, t, resource) with resource >= ``min_resource``
    (PTransE prunes low-resource paths the same way).

    Numerics: each term 1/(|out(h,r1)| * |out(m,r2)|) is computed in
    FIXED-POINT — ``10^12 div (n1*n2)`` summed as integers — because a
    float sum is order-dependent in its last bit and a distributed
    aggregation has no stable order (a round-6 output flipped between
    0.026562/0.026563 across engines before this). Integer sums are
    exact and permutation-invariant; the <=1e-12 per-term truncation is
    far below the 1e-6 output quantum.

    Scale shape: two-hop = ONE self-equi-join on the midpoint id; the
    (node, relation) out-degree side is an aggregation reused on both
    legs. Hub midpoints are the skew hazard — ``max_out`` drops
    (node, relation) fan-outs above the cap BEFORE the join (documented
    recall loss: a hub's per-edge resource 1/|out| <= 1/max_out is below
    any practical min_resource anyway, so the cap removes work, not
    signal). AQE skew-join covers residual imbalance.
    """
    scale = 10**12
    e = id_triples.select("h", "r", "t").distinct()
    od = e.groupBy("h", "r").agg(F.count("*").alias("_n"))
    src = e.join(od, ["h", "r"]).filter(F.col("_n") <= max_out)
    leg1 = src.select(
        "h", F.col("r").alias("r1"), F.col("t").alias("_m"), F.col("_n").alias("_n1")
    )
    leg2 = src.select(
        F.col("h").alias("_m"), F.col("r").alias("r2"), "t", F.col("_n").alias("_n2")
    )
    return (
        leg1.join(leg2, "_m")
        .groupBy("h", "r1", "r2", "t")
        .agg(F.sum(F.expr(f"{scale} div (_n1 * _n2)")).alias("_s"))
        .filter(F.col("_s") >= int(min_resource * scale))
        .select(
            "h",
            "r1",
            "r2",
            "t",
            F.round(F.col("_s") / F.lit(float(scale)), 6).alias("resource"),
        )
    )


def pcra_path_triples(
    id_triples: DataFrame,
    max_out: int = 1000,
    min_resource: float = 0.01,
) -> DataFrame:
    """PCRA-weighted relation-path TRAINING triples for PTransE
    (Lin et al. 2015 §3.2): rows (r1, r2, r, weight) where p = (r1, r2)
    is a surviving 2-hop path between some (h, t), r is a direct
    relation observed on that same (h, t), and weight is the summed
    per-instance normalized reliability R(p|h,t) / Z(h,t) over every
    such (h, t) — Z(h,t) = sum of reliabilities of ALL surviving paths
    between h and t, exactly the paper's per-pair normalizer. This is
    the input `kernel consumes (path, reliability) pairs` table that
    restores the path-composition loss term the reference ships
    commented out (KGE/src/approaches/PTransE.java:373-394).

    Aggregating per-instance weights to relation level is
    gradient-exact for a full epoch because the path energy
    ||r1 + r2 - r||^2 depends on relations only and the loss is linear
    in the weight (see transe._ptranse_path_epoch).

    Numerics: path resources are the pcra_path_reliability 10^12
    fixed-point integer sums; the per-(h,t) share _s/Z is ONE int64 ->
    double division (IEEE-identical across engines) rounded once to a
    1e-9 fixed-point BIGINT, and every cross-row sum after that is
    exact integer arithmetic — the PCRA/DSIR portability contract.

    Scale shape: the pcra midpoint self-join (hub-capped via
    ``max_out``) plus one (h, t) equi-join against the distinct edge
    set; output cardinality is relation-vocab bounded (distinct
    (r1, r2, r)), i.e. schema-sized even at 10^12 docs.
    """
    scale = 10**12
    wscale = 10**9
    e = id_triples.select("h", "r", "t").distinct()
    od = e.groupBy("h", "r").agg(F.count("*").alias("_n"))
    src = e.join(od, ["h", "r"]).filter(F.col("_n") <= max_out)
    leg1 = src.select(
        "h", F.col("r").alias("r1"), F.col("t").alias("_m"), F.col("_n").alias("_n1")
    )
    leg2 = src.select(
        F.col("h").alias("_m"), F.col("r").alias("r2"), "t", F.col("_n").alias("_n2")
    )
    paths = (
        leg1.join(leg2, "_m")
        .groupBy("h", "r1", "r2", "t")
        .agg(F.sum(F.expr(f"{scale} div (_n1 * _n2)")).alias("_s"))
        .filter(F.col("_s") >= int(min_resource * scale))
    )
    z = paths.groupBy("h", "t").agg(F.sum("_s").alias("_z"))
    w = paths.join(z, ["h", "t"]).select(
        "h",
        "t",
        "r1",
        "r2",
        F.round(
            F.col("_s").cast("double") / F.col("_z").cast("double") * wscale, 0
        )
        .cast("long")
        .alias("_wfp"),
    )
    return (
        w.join(e.select("h", F.col("r"), "t"), ["h", "t"])
        .groupBy("r1", "r2", "r")
        .agg(F.sum("_wfp").alias("_ws"))
        .select(
            "r1",
            "r2",
            "r",
            F.round(F.col("_ws") / F.lit(float(wscale)), 6).alias("weight"),
        )
    )


def hits(
    id_triples: DataFrame,
    rounds: int = 8,
    checkpoint: bool = True,
) -> DataFrame:
    """HITS hubs/authorities (Kleinberg 1999) over the directed distinct
    KG edge set — the third spectral ranking next to in/out degree and
    personalized PageRank: authorities = entities many good hubs point
    at, hubs = entities pointing at many good authorities; a KG QA pass
    reads both to find over-attested sink entities before trusting
    degree-based features.

    Fixed ``rounds`` iterations of the classic mutual recurrence
    (auth' = sum of in-neighbor hubs, hub' = sum of out-neighbor NEW
    auths), normalized per step by the MAX score instead of the L2 norm:
    max is permutation-invariant (an L2 norm is a float sum whose last
    bit depends on reduction order), so both engines run the identical
    float64 recurrence and ROUND(., 6) hashes identically — the same
    portability contract as kg_pagerank_fixed, with the sum-order-
    sensitive normalizer removed by construction.

    Scale shape per round: two edge-list equi-joins + two map-side-
    combinable sum aggregations + two single-row max aggregations
    (tree-reduced, broadcast back as a 1-row frame — NOT a global
    window). Hub skew: a celebrity entity's million in-edges partial-sum
    map-side. localCheckpoint per round keeps lineage flat.
    """
    e = (
        id_triples.select(F.col("h").alias("src"), F.col("t").alias("dst"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    if checkpoint:
        nodes = nodes.localCheckpoint(eager=True)
    hub = nodes.withColumn("hub", F.lit(1.0))
    auth = nodes.withColumn("auth", F.lit(1.0))
    for _ in range(rounds):
        ar = (
            e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum("hub").alias("_v"))
        )
        ar = nodes.join(ar, "node", "left").select(
            "node", F.coalesce("_v", F.lit(0.0)).alias("_v")
        )
        am = ar.agg(F.max("_v").alias("_m"))
        auth = ar.crossJoin(F.broadcast(am)).select(
            "node", (F.col("_v") / F.col("_m")).alias("auth")
        )
        if checkpoint:
            auth = auth.localCheckpoint(eager=True)
        hr = (
            e.join(auth.withColumnRenamed("node", "dst"), "dst")
            .groupBy(F.col("src").alias("node"))
            .agg(F.sum("auth").alias("_v"))
        )
        hr = nodes.join(hr, "node", "left").select(
            "node", F.coalesce("_v", F.lit(0.0)).alias("_v")
        )
        hm = hr.agg(F.max("_v").alias("_m"))
        hub = hr.crossJoin(F.broadcast(hm)).select(
            "node", (F.col("_v") / F.col("_m")).alias("hub")
        )
        if checkpoint:
            hub = hub.localCheckpoint(eager=True)
    return auth.join(hub, "node").select(
        "node",
        F.round("auth", 6).alias("auth"),
        F.round("hub", 6).alias("hub"),
    )


def components(
    id_triples: DataFrame,
    driver_max_edges: int | None = None,
) -> DataFrame:
    """(node, component) over the undirected KG skeleton, component = the
    minimum entity id in each connected component — the same alternating
    small-star/large-star contraction (Kiveris et al. 2014) the extraction
    front end uses for alias canonicalization
    (extract/canonicalize.py:95), surfaced over the *constructed* graph as
    the fragmentation QA pass a KG build runs before trusting global
    features (PageRank mass, reach sets) that silently assume one big
    component.

    Star contraction converges in O(log n) rounds independent of
    diameter, so a 10^9-node chain costs ~30 equi-join rounds, not 10^9
    label sweeps; each round is two hash joins + distinct on the
    shrinking edge set with per-round localCheckpoint. The DuckDB twin is
    a fixed-sweep pointer-jumping min-label recurrence (neighbor-min +
    label-of-label), which reaches the same fixpoint (min id per
    component) once converged — kg_components_sql unrolls enough doubling
    sweeps to cover any diameter the fixtures can hold.
    """
    from ttmf_spark.extract.canonicalize import connected_components

    kwargs = {}
    if driver_max_edges is not None:
        kwargs["driver_max_edges"] = driver_max_edges
    e = id_triples.select(F.col("h").alias("src"), F.col("t").alias("dst"))
    return connected_components(e, **kwargs)


def anf_neighborhood_sizes(
    id_triples: DataFrame,
    depth: int = 2,
    k: int = 16,
    seed: int = 0,
    hash_fn: str = "xxhash64",
    checkpoint: bool = True,
) -> DataFrame:
    """(node, n_exact, est, rel_err): closed depth-``depth``
    out-neighborhood size per node, exact and KMV-estimated — the
    approximate-neighborhood-function algorithm (ANF, Palmer et al. KDD
    2002; HyperBall, Boldi & Vigna 2013) with a bottom-k sketch instead
    of their probabilistic counters, because bottom-k is a pure function
    of the id set and therefore cross-engine-gateable (the same reason
    datapipe.sketch prefers KMV to HLL).

    Recursion: S_0(v) = {h(v)};
    S_{t+1}(v) = bottom-k(S_t(v) ∪ ⋃_{v->u} S_t(u)) — the min-k monoid
    merges under truncation, so each round is one equi-join of the edge
    list with the sketch rows plus a per-node top-k window (never a
    global sort; rows are bounded by k·|E|). The exact reach set runs
    the SAME recursion untruncated — it is the fixture-scale QA column
    (reference reach_sets materializes true sets for 145 cores; at 10^9
    nodes materializing ⋃|N_d(v)| is exactly what ANF exists to avoid).

    Estimator: est = n (sketch holds the whole neighborhood) when the
    node collected fewer than k hashes, else (k-1)·2^60 / h_(k).
    Deterministic under any partitioning: seeded hashes, dedup on exact
    integers.
    """
    from ttmf_spark.datapipe.dedup import u60

    edges = id_triples.select(
        F.col("h").alias("src"), F.col("t").alias("dst")
    ).distinct()
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    sk = nodes.select(
        "node", u60(F.col("node").cast("string"), seed=seed, fn=hash_fn).alias("hu")
    )
    exact = nodes.select("node", F.col("node").alias("member"))
    w = Window.partitionBy("node").orderBy("hu")
    for _ in range(depth):
        inc = (
            edges.join(
                sk.withColumnRenamed("node", "_n"), F.col("dst") == F.col("_n")
            )
            .select(F.col("src").alias("node"), "hu")
        )
        sk = (
            sk.unionByName(inc)
            .distinct()
            .withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= k)
            .drop("_r")
        )
        incx = (
            edges.join(
                exact.withColumnRenamed("node", "_n"), F.col("dst") == F.col("_n")
            )
            .select(F.col("src").alias("node"), "member")
        )
        exact = exact.unionByName(incx).distinct()
        if checkpoint:
            sk = sk.localCheckpoint(eager=True)
            exact = exact.localCheckpoint(eager=True)
    ex = exact.groupBy("node").agg(F.count("*").alias("n_exact"))
    s = sk.groupBy("node").agg(
        F.max("hu").alias("_hk"), F.count("*").alias("_have")
    )
    est = F.when(F.col("_have") < k, F.col("_have").cast("double")).otherwise(
        F.lit(float(k - 1)) * F.lit(float(1 << 60)) / F.col("_hk").cast("double")
    )
    return (
        ex.join(s, "node")
        .withColumn("est", F.round(est, 6))
        .withColumn(
            "rel_err",
            F.round(F.abs(F.col("est") - F.col("n_exact")) / F.col("n_exact"), 6),
        )
        .select("node", "n_exact", "est", "rel_err")
    )


def degree_skew_profile(id_triples: DataFrame) -> DataFrame:
    """(side, bucket, n_nodes, n_edges, max_deg): log2-bucketed degree
    histogram of the KG, out-side (h) and in-side (t) separately — the
    hub audit behind every salting / broadcast decision in this engine
    (a bucket-12 entity means a 4096-fan join key; SURVEY §4 prescribes
    salting exactly when this profile shows such buckets).

    ``bucket`` is bit_length(degree) - 1 computed via base-2 string
    length — exact integer semantics, immune to the log2(8)=2.9999...
    float hazard that makes FLOOR(LOG2(x)) engine-dependent. Everything
    downstream is integer counts: tol=0 across engines.

    Scale: two map-side-combinable (node)->degree aggs over the triple
    scan, then a bucket-count agg over the node-sized frame; output is
    <=2*64 rows. No reference analogue (the reference never audits its
    graph); first-class pipeline QA here.
    """
    sides = []
    for side, col in (("out", "h"), ("in", "t")):
        deg = id_triples.groupBy(F.col(col).alias("node")).agg(
            F.count("*").alias("deg")
        )
        sides.append(deg.select(F.lit(side).alias("side"), "deg"))
    degs = sides[0].unionByName(sides[1])
    bucket = (F.length(F.conv(F.col("deg").cast("string"), 10, 2)) - 1).cast("int")
    return (
        degs.withColumn("bucket", bucket)
        .groupBy("side", "bucket")
        .agg(
            F.count("*").alias("n_nodes"),
            F.sum("deg").alias("n_edges"),
            F.max("deg").alias("max_deg"),
        )
    )


def snapshot_diff(old_triples: DataFrame, new_triples: DataFrame) -> DataFrame:
    """(p, n_old, n_new, n_added, n_removed, n_kept) per relation — the
    churn report between two KG snapshots (yesterday's corpus vs
    today's): the QA a pipeline runs after every incremental rebuild to
    catch extraction regressions (a relation suddenly losing half its
    triples) before the graph ships.

    Full-outer join on the whole (s, p, o) key — at 10^12 triples this
    is ONE co-partitioned sort-merge join (both sides hash the same
    key), and with both snapshots stored bucketed by the same key it is
    shuffle-free. Output is relation-dim-sized. All-integer: tol=0.
    """
    o = old_triples.select("s", "p", "o").distinct().withColumn("_o", F.lit(1))
    n = new_triples.select("s", "p", "o").distinct().withColumn("_n", F.lit(1))
    j = o.join(n, ["s", "p", "o"], "full_outer")
    return j.groupBy("p").agg(
        F.sum(F.coalesce("_o", F.lit(0))).alias("n_old"),
        F.sum(F.coalesce("_n", F.lit(0))).alias("n_new"),
        F.sum(
            F.when(F.col("_o").isNull() & F.col("_n").isNotNull(), 1).otherwise(0)
        ).alias("n_added"),
        F.sum(
            F.when(F.col("_n").isNull() & F.col("_o").isNotNull(), 1).otherwise(0)
        ).alias("n_removed"),
        F.sum(
            F.when(F.col("_o").isNotNull() & F.col("_n").isNotNull(), 1).otherwise(0)
        ).alias("n_kept"),
    )
