"""Triple assembly: linked mentions -> (s, p, o) triples.

Relation patterns are span-local (both arguments detected in the same
span) except ``contains``, which pairs part mentions with the document's
order mention. Span-local pairing is a single groupBy (doc_id, pos) into a
slot->entity map — one shuffle, no self-join; the doc-level pairing is a
doc_id equi-join between two outputs of that same aggregation, which AQE
co-partitions (and would bucket by doc_id on a real cluster's Iceberg
layout, removing the shuffle entirely).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (predicate, subject slot, object slot) — span-local patterns
SPAN_RULES = [
    ("placed_by", "order", "customer"),
    ("in_nation", "customer", "nation_c"),
    ("in_region", "nation_c", "region"),
    ("supplied_by", "part", "supplier"),
    ("in_nation", "supplier", "nation_s"),
]


def assemble_triples(linked: DataFrame, materialize: bool = True) -> DataFrame:
    """(doc_id, pos, slot, entity) -> distinct (s, p, o).

    ``materialize`` snapshots the slot->entity span map ONCE: it feeds
    seven consumers (five span rules + the doc-level order/part sides),
    and without truncation each one — including the broadcast subquery
    for the doc-level join — recomputes the entire detect->link upstream
    (observed 7x wall-time at bench scale). This is the natural stage
    boundary; production swaps localCheckpoint for a StageStore/Iceberg
    checkpoint table (the reference's intermediate-files analog).
    """
    span_map = linked.groupBy("doc_id", "pos").agg(
        F.map_from_entries(F.collect_list(F.struct("slot", "entity"))).alias("m")
    )
    if materialize:
        span_map = span_map.localCheckpoint(eager=True)
    parts = []
    for pred, s_slot, o_slot in SPAN_RULES:
        parts.append(
            span_map.select(
                F.col("m")[s_slot].alias("s"),
                F.lit(pred).alias("p"),
                F.col("m")[o_slot].alias("o"),
            ).filter(F.col("s").isNotNull() & F.col("o").isNotNull())
        )
    # doc-level: order-of-doc contains each part mention (text or media)
    doc_order = (
        span_map.select("doc_id", F.col("m")["order"].alias("order_e"))
        .filter(F.col("order_e").isNotNull())
        .dropDuplicates(["doc_id"])
    )
    doc_parts = span_map.select(
        "doc_id",
        F.coalesce(F.col("m")["part"], F.col("m")["media_part"]).alias("part_e"),
    ).filter(F.col("part_e").isNotNull())
    parts.append(
        doc_parts.join(doc_order, "doc_id").select(
            F.col("order_e").alias("s"),
            F.lit("contains").alias("p"),
            F.col("part_e").alias("o"),
        )
    )
    out = parts[0]
    for x in parts[1:]:
        out = out.unionByName(x)
    return out.distinct()
