"""Triple assembly: linked mentions -> (s, p, o) triples.

Relation patterns are span-local (both arguments detected in the same
span) except ``contains``, which pairs part mentions with the document's
order mention.

Shape (round-2 rewrite): repartition the linked mentions ONCE by doc_id,
then pivot into a WIDE frame of primitive string columns per (doc_id,
pos) via conditional aggregation — hash(doc_id) partitioning satisfies
the (doc_id, pos) grouping, so the aggregation adds no extra exchange.
The doc-level ``contains`` subject (the document's order mention) is
attached with a ``min`` window over doc_id — partitioning already
satisfied, so the window adds only a partition-local sort, no exchange.
All six rules (five span-local + contains) are then ONE explode of a
rule-struct array: the whole pipeline is a single linear plan, so the
expensive detect->link subtree is computed exactly once. (A previous
variant computed contains via a second groupBy consumer of the wide
frame and relied on ReuseExchange — which never fires, because column
pruning gives the two branches different exchange subtrees, and the
MapInPandas detect stage ran TWICE.)

Why not the round-1 map_from_entries + localCheckpoint design: per-row
MapData objects materialized deserialized into the block manager caused
a GC/page-fault storm that got WORSE with more cores (the round-1
scaling collapse; assemble was 146s of 186s at local[32] on the probe
input, and 58s at local[8]). The rewrite measured 7.4s at local[32] /
19.6s at local[8] on the same input — faster at every level AND scaling
with cores.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# (predicate, subject slot, object slot) — span-local patterns
SPAN_RULES = [
    ("placed_by", "order", "customer"),
    ("in_nation", "customer", "nation_c"),
    ("in_region", "nation_c", "region"),
    ("supplied_by", "part", "supplier"),
    ("in_nation", "supplier", "nation_s"),
]

# every slot referenced by a rule (incl. the doc-level part slots)
_SLOTS = ["order", "customer", "nation_c", "region", "part", "supplier",
          "nation_s", "media_part"]


def _rule_rows(wide: DataFrame) -> DataFrame:
    """Wide (doc_id-partitioned) slot-entity frame -> per-emission
    (doc_id, s, p, o) rows (NOT deduplicated — provenance callers
    aggregate per doc; the triple API distincts).

    ``wide`` must already be hash-partitioned by doc_id so the min-window
    (the doc's order mention, the ``contains`` subject) needs no exchange.
    All six rules are ONE explode of a rule-struct array — a single linear
    plan, the expensive upstream computed exactly once.
    """
    wide = wide.withColumn(
        "order_doc", F.min("order").over(Window.partitionBy("doc_id"))
    )
    rule_arr = F.array(
        *[
            F.struct(
                F.col(s_slot).alias("s"),
                F.lit(pred).alias("p"),
                F.col(o_slot).alias("o"),
            )
            for pred, s_slot, o_slot in SPAN_RULES
        ],
        F.struct(
            F.col("order_doc").alias("s"),
            F.lit("contains").alias("p"),
            F.coalesce(F.col("part"), F.col("media_part")).alias("o"),
        ),
    )
    return (
        wide.select("doc_id", F.explode(rule_arr).alias("tr"))
        .select("doc_id", "tr.s", "tr.p", "tr.o")
        .filter(F.col("s").isNotNull() & F.col("o").isNotNull())
    )


def _rules_from_wide(wide: DataFrame) -> DataFrame:
    """Wide (doc_id-partitioned) slot-entity frame -> distinct (s, p, o)."""
    return _rule_rows(wide).select("s", "p", "o").distinct()


def assemble_triples_wide_with_doc(
    linked_wide: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """One-row-per-span slot-entity frame -> per-doc distinct
    (doc_id, s, p, o) — the provenance-preserving twin of
    ``assemble_triples_wide`` (same single-linear-plan dataflow; the
    dedup key just keeps doc_id, so grouping by triple downstream yields
    exact supporting-document counts)."""
    parts = num_partitions or int(
        linked_wide.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return _rule_rows(linked_wide.repartition(parts, "doc_id")).distinct()


def assemble_triples_wide(
    linked_wide: DataFrame, num_partitions: int | None = None
) -> DataFrame:
    """One-row-per-span slot-entity frame -> distinct (s, p, o).

    The span stream's ONLY shuffle before the final distinct: a doc_id
    repartition feeding the contains-rule window. No pivot aggregation —
    the wide detect UDF already emitted the (doc_id, pos) pivot.
    """
    parts = num_partitions or int(
        linked_wide.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    return _rules_from_wide(linked_wide.repartition(parts, "doc_id"))


def assemble_triples(linked: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """(doc_id, pos, slot, entity) -> distinct (s, p, o).

    ``num_partitions`` sizes the doc_id repartition (defaults to the
    session's shuffle partitions); documents are bounded (tens of spans),
    so hash(doc_id) has no skew risk.
    """
    parts = num_partitions or int(
        linked.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    # pivot: at most one entity per slot per span by construction, so
    # max(when(...)) IS the value; all-primitive columns, codegen-friendly.
    # hash(doc_id) partitioning satisfies BOTH the (doc_id, pos) and the
    # doc_id aggregations below -> one shuffle total, reused by Spark.
    wide = (
        linked.repartition(parts, "doc_id")
        .groupBy("doc_id", "pos")
        .agg(
            *[F.max(F.when(F.col("slot") == s, F.col("entity"))).alias(s)
              for s in _SLOTS]
        )
    )
    # hash(doc_id) partitioning survives the agg, so the window inside
    # needs no further exchange
    return _rules_from_wide(wide)
