"""Entity co-occurrence mining over linked mentions: top-k entity pairs
by document-level PMI — the classic relation-candidate signal a KG
construction pipeline computes BETWEEN linking and relation extraction
(pairs that co-occur far above chance are candidate edges; not in the
reference, which starts from already-extracted triples,
get_triples/process_triples.py:12-13).

Pipeline shape: reuses the production wide mention path (flatten ->
detect_mentions_wide -> link_entities_wide -> canonicalize), stacks the
slot columns into (doc_id, entity), distincts, then

    pmi(a, b) = ln( c_ab * n_docs / (c_a * c_b) )

over within-doc pairs (a < b), keeping pairs seen in >= min_count docs,
top-k by (pmi desc, a, b).

Scale story:
- the per-doc pair self-join shuffles on doc_id, and pair fan-out is
  bounded by the per-doc entity count squared (docs are small; a
  pathological mega-doc would need a span cap upstream, not here);
- the pair groupBy is map-side combinable, so globally hot pairs
  (nation x region co-occurs in almost every doc) do not hot-key the
  shuffle;
- marginals are entity-dim-sized and broadcast to the pair stream;
- n_docs is a single scalar pulled to the driver (same pattern as the
  entity count in negatives.tc_pairs_ids);
- the (doc_id, entity) frame is consumed three times (marginals, both
  pair sides) -> localCheckpoint keeps the plan linear instead of
  replicating the detect/link subtree per consumer;
- top-k via orderBy+limit = TakeOrderedAndProject, no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ttmf_spark.extract.canonicalize import apply_canonical, canonical_map
from ttmf_spark.extract.linking import link_entities_wide
from ttmf_spark.extract.mentions import WIDE_SLOTS, detect_mentions_wide, flatten_docs


def doc_entities(
    docs: DataFrame,
    gazetteer: DataFrame,
    same_as: DataFrame | None = None,
    checkpoint: bool = True,
) -> DataFrame:
    """Distinct (doc_id, entity) over linked + canonicalized mentions."""
    wide = detect_mentions_wide(flatten_docs(docs))
    linked = link_entities_wide(wide, gazetteer, WIDE_SLOTS)
    ents = linked.select(
        "doc_id",
        F.explode(F.array(*[F.col(s) for s in WIDE_SLOTS])).alias("entity"),
    ).filter(F.col("entity").isNotNull())
    if same_as is not None:
        ents = apply_canonical(ents, canonical_map(same_as), ["entity"])
    ents = ents.distinct()
    if checkpoint:
        ents = ents.localCheckpoint(eager=True)
    return ents


def entity_cooccurrence(
    docs: DataFrame,
    gazetteer: DataFrame,
    same_as: DataFrame | None = None,
    min_count: int = 2,
    k: int = 100,
) -> DataFrame:
    """(a, b, c_ab, c_a, c_b, pmi): top-k co-occurring entity pairs."""
    ents = doc_entities(docs, gazetteer, same_as)
    n_docs = ents.select("doc_id").distinct().count()
    cx = ents.groupBy("entity").agg(F.count("*").alias("c"))
    pairs = (
        ents.select("doc_id", F.col("entity").alias("a"))
        .join(ents.select("doc_id", F.col("entity").alias("b")), "doc_id")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= min_count)
    )
    return (
        pairs.join(
            F.broadcast(
                cx.select(F.col("entity").alias("a"), F.col("c").alias("c_a"))
            ),
            "a",
        )
        .join(
            F.broadcast(
                cx.select(F.col("entity").alias("b"), F.col("c").alias("c_b"))
            ),
            "b",
        )
        .select(
            "a",
            "b",
            "c_ab",
            "c_a",
            "c_b",
            F.round(
                F.log(
                    F.col("c_ab")
                    * F.lit(float(n_docs))
                    / (F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "a", "b")
        .limit(k)
    )
