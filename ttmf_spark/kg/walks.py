"""Truncated random-walk corpus generation (DeepWalk / node2vec p=q=1):
the sentence-generation step that turns the constructed KG into training
data for skip-gram entity embeddings — the classic bridge from a graph
to an LLM-era embedding pipeline (Perozzi et al., DeepWalk, KDD 2014).

The reference trains TransE directly on triples and never walks the
graph; this is a new-op extension in the same spirit as the PCRA and
HITS features: a standard public-graph-mining primitive expressed
Spark-first.

Determinism contract: the "random" next-step draw is a salted md5 hash
of (seed, start, walk, step) reduced modulo the current node's
out-degree and looked up in a per-node *indexed* neighbor table. Same
input => same walks on any engine and any partitioning, and the DuckDB
twin (oracles_kg.kg_walks_sql) unrolls the identical recurrence.

Scale shape — the part that matters at 10^9 nodes:

- The neighbor table carries ``idx = row_number() over (partition by
  src order by dst)`` — a PER-KEY window, never a global sort.
- Each step is two hash equi-joins that produce exactly ONE row per
  live walk: walk->degree (to draw u % deg) and (cur, u)->neighbor.
  A celebrity hub with 10^6 out-edges costs the same per step as a
  leaf — the draw indexes into the hub's neighbor list instead of
  exploding candidates (the naive frontier-x-adjacency join would emit
  deg(cur) rows per walk at a hub).
- Walks are independent rows: length L costs L such join rounds,
  lineage kept flat with localCheckpoint per step (house discipline
  for iterative loops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _draw(seed: int, step: int):
    """60-bit md5 draw from (seed | start | walk | step) — the DuckDB
    twin computes ('0x'||substr(md5(...),1,15))::BIGINT on the same
    '|'-joined string."""
    key = F.concat_ws(
        "|",
        F.lit(str(seed)),
        F.col("node").cast("string"),
        F.col("walk").cast("string"),
        F.lit(str(step)),
    )
    return F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("long")


def random_walks(
    id_triples: DataFrame,
    walks_per_node: int = 2,
    length: int = 5,
    seed: int = 628,
    checkpoint: bool = True,
) -> DataFrame:
    """(node, walk, sent, n_nodes): one truncated random walk per row.

    ``sent`` is the space-joined node-id sentence (the skip-gram corpus
    line), ``n_nodes`` its length including the start. Every node starts
    ``walks_per_node`` walks of at most ``length`` nodes; a walk that
    reaches a sink (no out-edges) truncates there — DeepWalk semantics,
    no restart.
    """
    e = (
        id_triples.select(F.col("h").alias("src"), F.col("t").alias("dst"))
        .distinct()
    )
    if checkpoint:
        e = e.localCheckpoint(eager=True)
    # per-node indexed neighbor list + out-degree (per-key window only)
    nbr = e.withColumn(
        "idx",
        F.row_number().over(Window.partitionBy("src").orderBy("dst")) - 1,
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    if checkpoint:
        nbr = nbr.localCheckpoint(eager=True)
        deg = deg.localCheckpoint(eager=True)
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    w = nodes.select(
        "node",
        F.explode(
            F.sequence(F.lit(0), F.lit(walks_per_node - 1))
        ).alias("walk"),
    ).select(
        "node",
        F.col("walk").cast("long").alias("walk"),
        F.col("node").alias("cur"),
        F.col("node").cast("string").alias("sent"),
        F.lit(1).cast("long").alias("n_nodes"),
    )
    for step in range(1, length):
        d = w.join(deg, w["cur"] == deg["src"], "left").drop("src")
        d = d.withColumn(
            "_u",
            F.when(
                F.col("deg").isNotNull(), _draw(seed, step) % F.col("deg")
            ),
        )
        stepped = (
            d.join(
                nbr,
                (d["cur"] == nbr["src"]) & (d["_u"] == nbr["idx"]),
                "left",
            )
            .select(
                "node",
                "walk",
                F.col("dst").alias("cur"),
                F.when(
                    F.col("dst").isNotNull(),
                    F.concat_ws(
                        " ", F.col("sent"), F.col("dst").cast("string")
                    ),
                )
                .otherwise(F.col("sent"))
                .alias("sent"),
                (
                    F.col("n_nodes")
                    + F.when(F.col("dst").isNotNull(), 1).otherwise(0)
                ).alias("n_nodes"),
            )
        )
        w = stepped.localCheckpoint(eager=True) if checkpoint else stepped
    return w.select("node", "walk", "sent", "n_nodes")


def skipgram_pairs(
    walks: DataFrame, window: int = 2
) -> DataFrame:
    """(center, context, n_pairs): aggregated skip-gram co-occurrence
    counts over the walk corpus — the training-pair generator between
    random_walks and a word2vec-style embedding fit (Mikolov 2013;
    DeepWalk trains skip-gram on exactly these pairs).

    Each walk sentence contributes (w[i], w[j]) for all 0 < |i - j| <=
    ``window``; pairs are directional (center, context) like word2vec's.

    Scale shape: posexplode the (short, bounded-length) sentence into
    (pos, node) rows, self-join per walk key on a bounded position-band
    — each sentence of length L emits at most 2*window*L rows — then
    one count aggregation keyed by the pair. The join key is the walk
    id, so co-location is per-walk (uniform by construction: every walk
    has the same bounded length); the final groupBy is the only
    corpus-wide shuffle and it moves (center, context, partial-count)
    triples that map-side combine.
    """
    toks = walks.select(
        "node",
        "walk",
        F.posexplode(F.split("sent", " ")).alias("pos", "tok"),
    ).select(
        "node", "walk", "pos", F.col("tok").cast("long").alias("tok")
    )
    a = toks.select(
        "node", "walk", F.col("pos").alias("pa"), F.col("tok").alias("center")
    )
    b = toks.select(
        "node", "walk", F.col("pos").alias("pb"), F.col("tok").alias("context")
    )
    return (
        a.join(b, ["node", "walk"])
        .filter(
            (F.col("pa") != F.col("pb"))
            & (F.abs(F.col("pa") - F.col("pb")) <= window)
        )
        .groupBy("center", "context")
        .agg(F.count("*").alias("n_pairs"))
    )
