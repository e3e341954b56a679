"""Entity-resolution blocking: candidate same-as pair generation from
surface-form similarity — the step BEFORE connected-components
canonicalization (extract/canonicalize.py) when the alias table is
incomplete and link candidates must be DISCOVERED, not looked up.

Standard blocking design (Papadakis et al., "Blocking and Filtering
Techniques for Entity Resolution", CSUR 2020): a cheap deterministic
blocking key partitions the name universe so the quadratic pair
comparison runs per block, never corpus-wide; a block-size cap is the
skew guard (a generic key like an empty-digit bucket would otherwise
re-create the corpus-wide cross product).

Key choice here: the digit substring of the normalized name (names that
share their numeric id are candidate co-references — the classic
record-linkage id-block), falling back to a 4-char prefix for digitless
names. Verification: character-trigram Jaccard on the normalized names,
computed with built-in array expressions (no UDF), emitted for pairs
>= tau.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_GRAMS = (
    "CASE WHEN length(_norm) >= 3 THEN "
    "array_distinct(transform(sequence(1, length(_norm) - 2), "
    "i -> substring(_norm, i, 3))) "
    "ELSE array(_norm) END"
)


def er_blocking_candidates(
    names: DataFrame,
    tau: float = 0.4,
    max_block: int = 50,
    name_col: str = "surface",
    checkpoint: bool = True,
) -> DataFrame:
    """(a, b, sim): candidate same-as pairs with trigram Jaccard >= tau.

    - normalize: lowercase, strip non-alphanumerics.
    - block key: digits of the normalized name; 4-char prefix fallback.
    - ``max_block`` drops blocks bigger than the cap BEFORE the self-join
      (documented recall loss — an over-generic key is evidence the key
      carries no identity signal for those names anyway).
    - verify: |G(a) & G(b)| / |G(a) | G(b)| over distinct char trigrams,
      pure array expressions (array_intersect/array_union) — no Python.

    Scale shape: one groupBy(count) on the key + one per-block equi
    self-join; a block of size s contributes s^2 rows, bounded by
    max_block^2, and the join shuffles on the key — the standard
    blocking cost model. The trigram arrays ride through the join as
    row payload (names are short); nothing is ever compared across
    blocks.
    """
    norm = F.regexp_replace(F.lower(F.col("_name")), "[^a-z0-9]", "")
    d = (
        names.select(F.col(name_col).alias("_name"))
        .distinct()
        .withColumn("_norm", norm)
        .withColumn("_digits", F.regexp_replace(F.col("_norm"), "[^0-9]", ""))
        .withColumn(
            "_key",
            F.when(F.col("_digits") != "", F.col("_digits")).otherwise(
                F.substring(F.col("_norm"), 1, 4)
            ),
        )
        .withColumn("_g", F.expr(_GRAMS))
        .select("_name", "_key", "_g")
    )
    if checkpoint:
        # consumed three times (cap agg + both join arms): snapshot, or
        # the upstream name-source subtree replicates per consumer
        d = d.localCheckpoint(eager=True)
    ok = d.groupBy("_key").count().filter(F.col("count") <= max_block)
    d = d.join(ok.select("_key"), "_key", "left_semi")
    a = d.select(
        F.col("_key"), F.col("_name").alias("a"), F.col("_g").alias("_ga")
    )
    b = d.select(
        F.col("_key"), F.col("_name").alias("b"), F.col("_g").alias("_gb")
    )
    return (
        a.join(b, "_key")
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "sim",
            F.size(F.array_intersect("_ga", "_gb"))
            / F.size(F.array_union("_ga", "_gb")),
        )
        .filter(F.col("sim") >= tau)
        .select("a", "b", F.round("sim", 6).alias("sim"))
    )


def er_clusters(
    names: DataFrame,
    tau: float = 0.4,
    max_block: int = 50,
    name_col: str = "surface",
    driver_max_edges: int | None = None,
) -> DataFrame:
    """(surface, canonical, cluster_size): the full entity-resolution
    step — candidate pairs from :func:`er_blocking_candidates` become
    same-as edges, connected components collapse them (same Kiveris
    star-contraction as the alias canonicalizer), the lexicographically
    smallest member names the cluster, and every input surface appears
    (singletons map to themselves with size 1). This is the table a
    construction pipeline broadcast-joins back onto mentions when no
    curated alias dim exists.

    Scale shape: blocking bounds the pair join (max_block^2 per block),
    CC is O(log n) equi-join rounds, the size rollup is one
    cluster-keyed count — no stage touches more than the candidate
    edges + one row per distinct surface.
    """
    from ttmf_spark.extract.canonicalize import connected_components

    surfaces = names.select(F.col(name_col).alias("surface")).distinct()
    pairs = er_blocking_candidates(
        names, tau=tau, max_block=max_block, name_col=name_col
    )
    kwargs = {} if driver_max_edges is None else {"driver_max_edges": driver_max_edges}
    cc = connected_components(pairs, src="a", dst="b", **kwargs)
    labeled = (
        surfaces.join(
            cc.select(F.col("node").alias("surface"), "component"),
            "surface",
            "left",
        )
        .select(
            "surface",
            F.coalesce("component", F.col("surface")).alias("canonical"),
        )
    )
    sizes = labeled.groupBy("canonical").agg(F.count("*").alias("cluster_size"))
    return labeled.join(sizes, "canonical").select(
        "surface", "canonical", "cluster_size"
    )
