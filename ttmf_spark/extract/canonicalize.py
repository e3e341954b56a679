"""Entity canonicalization: connected components over same_as alias edges.

Implements the alternating large-star / small-star algorithm (Kiveris et
al., "Connected Components in MapReduce and Beyond", SoCC'14 — public
algorithm, referenced from PAPERS.md) directly on DataFrames:

  large-star: every node u links each *strictly greater* neighbor to
              m = min(N(u) ∪ {u})
  small-star: every node u links each *smaller-or-equal* neighbor (and
              itself) to m = min(N≤(u) ∪ {u})

Both rounds are a groupBy-agg + explode (two shuffles per iteration);
convergence in O(log n) iterations. Lineage is truncated with
``localCheckpoint`` every iteration so the plan does not grow.

The component label is the lexicographically smallest member, which is the
canonical entity id by corpus construction ("C17" < "C17A" < "C17B").

Reference parity note: the reference has no canonicalization stage — this
operator is required by BASELINE.json (north_rule: "entity linking,
canonicalization"); SURVEY.md G7.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_round(edges: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star round over undirected (u, v) edges.

    ``edges`` must be symmetric (both directions present) for large-star;
    we keep the canonical representation as directed (child -> parent)
    pairs with child > parent and re-symmetrize inside.
    """
    sym = edges.select("u", "v").union(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    if large:
        grouped = sym.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
        out = grouped.select(
            "u",
            F.array_min(F.array_union(F.col("nbrs"), F.array(F.col("u")))).alias("m"),
            F.explode("nbrs").alias("n"),
        ).filter(F.col("n") > F.col("u"))
        return out.select(F.col("n").alias("u"), F.col("m").alias("v")).filter(
            F.col("u") != F.col("v")
        )
    grouped = (
        sym.filter(F.col("v") <= F.col("u"))
        .groupBy("u")
        .agg(F.collect_set("v").alias("nbrs"))
    )
    out = grouped.select(
        "u",
        F.array_min(F.array_union(F.col("nbrs"), F.array(F.col("u")))).alias("m"),
        F.explode(F.array_union(F.col("nbrs"), F.array(F.col("u")))).alias("n"),
    )
    return out.select(F.col("n").alias("u"), F.col("m").alias("v")).filter(
        F.col("u") != F.col("v")
    )


# alias graphs at or below this edge count run as a driver union-find:
# the same_as graph is dim-bounded (aliased entities, not documents), and
# the iterative star loop costs ~6s of SERIAL driver-coordination time per
# call regardless of size — pure Amdahl drag on scaling. Above the bound,
# the distributed O(log n)-round loop takes over.
DRIVER_CC_MAX_EDGES = 5_000_000


def _driver_union_find(pairs, nodes_iter):
    """Path-compressed union-find; the smaller id stays root, so the
    component label is the min member — same contract as the star loop.
    (Ids are ASCII, so Python and Spark string orderings agree.)"""
    parent: dict = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            hi, lo = (ru, rv) if ru > rv else (rv, ru)
            parent[hi] = lo
    return [(n, find(n)) for n in nodes_iter]


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
    driver_max_edges: int = DRIVER_CC_MAX_EDGES,
) -> DataFrame:
    """(src, dst) undirected edges -> (node, component) with component = min id.

    Every endpoint appears in the output (representatives map to
    themselves); nodes appearing only in self-loops map to themselves.
    """
    all_edges = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    nodes = (
        all_edges.select(F.col("u").alias("node"))
        .union(all_edges.select(F.col("v").alias("node")))
        .distinct()
    )
    cur = all_edges.filter(F.col("u") != F.col("v")).distinct()
    n_edges = cur.count()
    if n_edges == 0:
        return nodes.select("node", F.col("node").alias("component"))
    if n_edges <= driver_max_edges:
        from pyspark.sql.types import StructField, StructType

        spark = edges.sparkSession
        labels = _driver_union_find(
            ((r["u"], r["v"]) for r in cur.collect()),
            (r["node"] for r in nodes.collect()),
        )
        ntype = nodes.schema["node"].dataType
        schema = StructType(
            [StructField("node", ntype), StructField("component", ntype)]
        )
        return spark.createDataFrame(labels, schema=schema)
    cur = cur.localCheckpoint(eager=True)

    def _fingerprint(df: DataFrame) -> tuple:
        # one cheap agg instead of two exceptAll shuffles: the edge set is
        # stable iff (count, order-insensitive hash-sum) is stable
        row = df.agg(
            F.count("*").alias("n"),
            # decimal sum: a long sum of 64-bit hashes overflows in ANSI mode
            F.sum(F.xxhash64("u", "v").cast("decimal(20,0)")).alias("h"),
        ).collect()[0]
        return (row["n"], row["h"])

    prev_fp = _fingerprint(cur)
    for _ in range(max_iter):
        after_large = _star_round(cur, large=True).distinct()
        after_small = _star_round(after_large, large=False).distinct()
        after_small = after_small.localCheckpoint(eager=True)
        fp = _fingerprint(after_small)
        cur = after_small
        if fp == prev_fp:
            break
        prev_fp = fp
    # at convergence every edge is (node -> component-min); re-attach
    # representatives and self-loop-only nodes as their own component
    labels = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def canonical_map(same_as: DataFrame) -> DataFrame:
    """same_as (src, dst) -> (entity, canonical) for non-trivial entities."""
    cc = connected_components(same_as)
    return cc.select(F.col("node").alias("entity"), F.col("component").alias("canonical"))


def components_incremental(
    base_labels: DataFrame,
    delta_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    **cc_kwargs,
) -> DataFrame:
    """Fold a batch of new edges into an existing labeling without a full
    recompute: (node, component) for the union graph.

    The 100 TB maintenance path: a trillion-row KG's alias/skeleton graph
    is re-canonicalized incrementally as extraction batches land, not by
    re-contracting the whole edge set. Each delta edge is contracted
    through the existing labels (label(u), label(v)) — one join against
    the label table — and connected components runs only on that
    DELTA-SIZED component-level graph. Because every existing label is
    the min member id of its component, the min over merged labels is the
    min over all members, so the result is IDENTICAL to a full recompute
    over base+delta edges (pinned by test and by the driver oracle, which
    recomputes from scratch in SQL).

    Cost: one (broadcastable, merge-map-sized) relabel join over the base
    label table + a CC on |delta| edges. Hot components (many delta edges
    landing in one giant component) collapse to a single contracted node
    up front, so delta skew never amplifies.

    ``base_labels``: (node, component) as produced by
    ``connected_components`` (component = min member id — required).
    """
    d = delta_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    lu = base_labels.select(F.col("node").alias("u"), F.col("component").alias("_cu"))
    lv = base_labels.select(F.col("node").alias("v"), F.col("component").alias("_cv"))
    # contract each delta edge through the current labels; unseen endpoints
    # (brand-new nodes) stand for themselves
    contracted = (
        d.join(lu, "u", "left")
        .join(lv, "v", "left")
        .select(
            F.coalesce("_cu", F.col("u")).alias("src"),
            F.coalesce("_cv", F.col("v")).alias("dst"),
        )
    )
    # CC on the component-level graph: nodes are old labels + new node ids,
    # output label = min over merged old labels / new ids = global min member.
    # The merge map is consumed twice (relabel + new-node anti-join) and is
    # delta-bounded — pin it so the delta CC never recomputes.
    merge = connected_components(contracted, **cc_kwargs).localCheckpoint(
        eager=True
    )
    relabel = merge.select(
        F.col("node").alias("_old"), F.col("component").alias("_new")
    )
    # the merge map is delta-bounded — broadcast it onto the big label table
    updated = (
        base_labels.join(
            F.broadcast(relabel), base_labels["component"] == relabel["_old"], "left"
        )
        .select("node", F.coalesce("_new", "component").alias("component"))
    )
    # brand-new nodes appear only in the merge map
    new_nodes = merge.join(
        base_labels.select("node"), "node", "left_anti"
    ).select("node", "component")
    return updated.unionByName(new_nodes)


def components_decremental(
    base_labels: DataFrame,
    all_edges: DataFrame,
    deleted_edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    **cc_kwargs,
) -> DataFrame:
    """Fold a batch of edge DELETIONS into an existing labeling without a
    full recompute: (node, component) for the graph minus the deletions.

    The retraction half of the maintenance pair (``components_incremental``
    folds additions): when alias edges are withdrawn — a source document
    un-published, an extraction correction, a spam takedown — clusters can
    SPLIT, which no label-join shortcut can express; connectivity must be
    re-derived from the surviving edges. The cost stays delta-bounded
    anyway, because a deletion can only change components that contained a
    deleted edge:

      1. name the affected components: one delta-sized join of the deleted
         edges' endpoints against the label table (the affected-component
         set is delta-bounded and broadcasts);
      2. carve the affected subgraph: surviving edges (one anti-join on
         the stored (src, dst) rows) whose source labels to an affected
         component — one pruned pass over the maintained edge table, the
         only corpus-scale touch (on a bucketed/Iceberg edge table the
         broadcast label filter prunes files);
      3. re-run ``connected_components`` on that subgraph ONLY, then
         splice: unaffected rows are kept VERBATIM, affected nodes take
         their recomputed label, and affected nodes isolated by the
         deletion become their own singleton component.

    Equality contract (pinned by pytest): output == ``connected_components``
    on the surviving edge set, backfilled with self-labels for
    previously-known nodes that lost every edge — the maintained table
    keeps every node it has ever seen, exactly like the incremental fold.
    Splits change canonical ids for the NON-min side, so downstream
    maintained tables re-key through ``label_remap(old, new)`` +
    ``pipeline.resupport_from_docs`` — NOT the merge hook
    (``resupport_after_merge``): a split maps one old label to several
    new ones, and the canonical-id doc_level rows no longer remember
    which branch each mention belongs to, so the affected documents must
    re-extract under the new mapping (see resupport_from_docs' docstring
    for the full argument; equality pinned by the composed-lifecycle
    pytest + the kg_maintenance_e2e driver oracle).

    ``deleted_edges`` matches rows by their stored (src, dst) orientation
    (delete what was inserted); deleting an absent edge is a no-op.
    """
    rem = all_edges.select(
        F.col(src).alias("u"), F.col(dst).alias("v")
    ).join(
        deleted_edges.select(F.col(src).alias("u"), F.col(dst).alias("v")),
        ["u", "v"],
        "left_anti",
    )
    d = deleted_edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    ends = d.select(F.col("u").alias("node")).union(
        d.select(F.col("v").alias("node"))
    ).distinct()
    aff = (
        ends.join(base_labels, "node").select("component").distinct()
        .localCheckpoint(eager=True)  # delta-bounded; consumed three times
    )
    sub_nodes = base_labels.join(F.broadcast(aff), "component", "left_semi")
    # any surviving edge has both endpoints in one base component, so the
    # src label alone decides membership in the affected subgraph
    sub_edges = (
        rem.join(
            base_labels.select(
                F.col("node").alias("u"), F.col("component").alias("_c")
            ),
            "u",
        )
        .join(F.broadcast(aff.select(F.col("component").alias("_c"))), "_c", "left_semi")
        .select(F.col("u").alias("src"), F.col("v").alias("dst"))
    )
    recomputed = connected_components(sub_edges, **cc_kwargs)
    relabeled = sub_nodes.select("node").join(recomputed, "node", "left").select(
        "node", F.coalesce("component", F.col("node")).alias("component")
    )
    kept = base_labels.join(F.broadcast(aff), "component", "left_anti")
    return kept.unionByName(relabeled)


def label_remap(old_labels: DataFrame, new_labels: DataFrame) -> DataFrame:
    """(old, new) canonical-label pairs that CHANGED between two labelings
    — the merge map a cluster-merging alias delta produces, named so
    downstream maintained tables (triple support, adjacency, ranks) can
    re-key exactly the affected rows and nothing else.

    ``old_labels``/``new_labels``: (node, component) as produced by
    ``connected_components`` / ``components_incremental`` (new must be a
    superset of old's nodes — components_incremental guarantees it).
    Nodes absent from ``old_labels`` implicitly labeled themselves (the
    apply_canonical coalesce convention), so a brand-new node that lands
    in an existing cluster emits (node, component) too. Output is
    distinct over LABEL pairs: merge-delta-bounded, broadcastable."""
    old = old_labels.select(
        F.col("node").alias("_n"), F.col("component").alias("_c_old")
    )
    return (
        new_labels.join(old, new_labels["node"] == old["_n"], "left")
        .select(
            F.coalesce("_c_old", "node").alias("old"),
            F.col("component").alias("new"),
        )
        .filter(F.col("old") != F.col("new"))
        .distinct()
    )


def apply_canonical(
    df: DataFrame, mapping: DataFrame, cols: list[str], broadcast_map: bool = True
) -> DataFrame:
    """Rewrite each column in ``cols`` through the canonical mapping.

    The mapping is dim-sized (#aliased entities), so a broadcast join per
    column avoids shuffling the triple stream; entities without an alias
    chain canonicalize to themselves via coalesce (SURVEY.md J1/P3 pattern).
    """
    out = df
    for c in cols:
        m = mapping.select(
            F.col("entity").alias(f"_ent_{c}"), F.col("canonical").alias(f"_can_{c}")
        )
        if broadcast_map:
            m = F.broadcast(m)
        out = (
            out.join(m, out[c] == m[f"_ent_{c}"], "left")
            .withColumn(c, F.coalesce(F.col(f"_can_{c}"), F.col(c)))
            .drop(f"_ent_{c}", f"_can_{c}")
        )
    return out
