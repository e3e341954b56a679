"""Entity-link scoring: mention surface -> best gazetteer entity.

Disambiguation (argmax prior, ties broken by lexicographically smallest
entity) is computed ONCE per distinct surface *on the gazetteer side* —
a dim-sized window — and the resolved map is broadcast-joined against the
mention stream. The 10^12-row mention side therefore never shuffles for
linking; this is the "salted broadcast alias join" degenerate case where
broadcast removes the shuffle entirely. When the gazetteer exceeds the
broadcast threshold, ``ttmf_spark.io_util.salted_join`` is the fallback
(hot surfaces are Zipf-skewed, so a plain shuffle-hash join would skew).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resolve_surfaces(gazetteer: DataFrame) -> DataFrame:
    """(surface, entity, prior) -> (surface, entity, prior) best-per-surface."""
    w = Window.partitionBy("surface").orderBy(
        F.col("prior").desc(), F.col("entity").asc()
    )
    return (
        gazetteer.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def link_mentions(
    mentions: DataFrame, gazetteer: DataFrame, broadcast_gazetteer: bool = True
) -> DataFrame:
    """(doc_id, pos, slot, surface) -> + (entity, prior); unlinkable dropped.

    NULL-entity (out-of-gazetteer) mentions are dropped here; the reference
    analogue is the UNK replacement / vocab-membership filter
    (get_triples/train_test_split.py:15-19) which our encode stage also
    implements for raw triples.
    """
    resolved = resolve_surfaces(gazetteer)
    if broadcast_gazetteer:
        resolved = F.broadcast(resolved)
    return mentions.join(resolved, "surface", "inner").select(
        "doc_id", "pos", "slot", "surface", "entity", "prior"
    )


def link_entities_wide(
    wide: DataFrame, gazetteer: DataFrame, slots: list[str],
    broadcast_gazetteer: bool = True,
) -> DataFrame:
    """Rewrite each slot's surface column to its linked entity in place.

    One broadcast left join per slot column — all hash probes against the
    SAME dim-sized resolved map (one broadcast exchange, reused), fused
    into a single codegen stage: the span stream never shuffles. An
    unlinkable surface becomes NULL (== the narrow path's inner-join drop,
    since every downstream rule filters null arguments).
    """
    resolved = resolve_surfaces(gazetteer).select("surface", "entity")
    out = wide
    for slot in slots:
        m = resolved.select(
            F.col("surface").alias("_surf"), F.col("entity").alias("_ent")
        )
        if broadcast_gazetteer:
            m = F.broadcast(m)
        out = (
            out.join(m, out[slot] == F.col("_surf"), "left")
            .withColumn(slot, F.col("_ent"))
            .drop("_surf", "_ent")
        )
    return out
