"""End-to-end extraction: docs -> mentions -> link -> canonicalize -> triples.

This is the KG-construction front end demanded by BASELINE.json's
north_rule; the reference pipeline begins where this ends (flat triple
files, reference get_triples/process_triples.py:12-13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ttmf_spark.extract.assemble import (
    assemble_triples_wide,
    assemble_triples_wide_with_doc,
)
from ttmf_spark.extract.canonicalize import apply_canonical, canonical_map
from ttmf_spark.extract.linking import link_entities_wide
from ttmf_spark.extract.mentions import WIDE_SLOTS, detect_mentions_wide, flatten_docs


def extract_triples(
    docs: DataFrame,
    gazetteer: DataFrame,
    same_as: DataFrame | None = None,
    repartition_output: int | None = None,
) -> DataFrame:
    """(doc_id, spans) + gazetteer [+ same_as] -> distinct canonical (s, p, o).

    The final ``distinct`` is the only triple-stream shuffle; it hashes on
    all of (s, p, o) so hub entities (hot s or o alone) do NOT skew it.
    ``repartition_output`` optionally re-buckets the result by subject for
    downstream adjacency builds (write-side: partitionBy(bucket(s)) on
    Iceberg; parquet fallback here).
    """
    # wide path: one row per mention-bearing span (slot -> surface columns),
    # per-slot broadcast linking, rules via one explode. The span stream
    # shuffles exactly twice end-to-end: the doc_id repartition for the
    # contains window, and the final distinct. (The narrow
    # detect_mentions/link_mentions/assemble_triples ops remain the
    # mention-level API; both produce identical triples — see
    # tests/test_extract.py wide/narrow parity.)
    wide = detect_mentions_wide(flatten_docs(docs))
    linked = link_entities_wide(wide, gazetteer, WIDE_SLOTS)
    triples = assemble_triples_wide(linked)
    if same_as is not None:
        mapping = canonical_map(same_as)
        triples = apply_canonical(triples, mapping, ["s", "o"]).distinct()
    if repartition_output:
        triples = triples.repartition(repartition_output, F.col("s"))
    return triples


def triple_support(
    docs: DataFrame,
    gazetteer: DataFrame,
    same_as: DataFrame | None = None,
) -> DataFrame:
    """Per-triple provenance: (s, p, o, n_docs, first_doc) where n_docs
    counts the distinct documents whose spans assert the canonical triple
    and first_doc is the lexicographic-min supporting doc_id (a stable
    exemplar pointer back into the corpus).

    The evidence table a downstream trust model consumes alongside the
    triple set: support is the cheapest independent confidence signal a
    100 TB corpus offers (a fact asserted by 10^6 documents vs 1), and
    first_doc gives audits a concrete witness. Same dataflow as
    ``extract_triples`` with doc_id carried through assembly; the
    per-(doc, triple) dedup and the final (s, p, o) aggregation hash on
    the full triple key, so hub entities do not skew either shuffle.
    """
    with_doc = assemble_triples_wide_with_doc(
        link_entities_wide(
            detect_mentions_wide(flatten_docs(docs)), gazetteer, WIDE_SLOTS
        )
    )
    if same_as is not None:
        mapping = canonical_map(same_as)
        # canonical ids can merge per-doc rows -> re-dedup per (doc, triple)
        with_doc = apply_canonical(
            with_doc, mapping, ["s", "o"]
        ).distinct()
    return with_doc.groupBy("s", "p", "o").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc")
    )


def triple_support_incremental(
    existing: DataFrame,
    delta_docs: DataFrame,
    gazetteer: DataFrame,
    same_as: DataFrame | None = None,
) -> DataFrame:
    """Fold a NEW doc batch into an existing (s, p, o, n_docs, first_doc)
    support table without rescanning the corpus.

    Runs the ``triple_support`` dataflow over the delta batch only, then
    merges by one full-outer join on the triple key: counts add, the
    witness pointer is the min across snapshots. Cost is bounded by the
    delta, not the 10^12-doc corpus — the provenance-table twin of the
    N18 label fold and N21 rank maintenance.

    Correctness preconditions (both enforced upstream, both documented
    here because violating them silently over/under-counts):

    - ``delta_docs`` doc_ids are disjoint from every batch already folded
      in (distinct-doc counts add only then; the streaming ingestion
      anti-join — streaming.py — is what guarantees it);
    - ``same_as`` is the SAME canonical mapping ``existing`` was built
      under. When an alias delta merges clusters (components_incremental
      relabels), triples touching relabeled entities must be re-supported
      from their supporting docs instead — the merge map names exactly
      which rows those are.

    Pinned by tests/test_extract.py: fold(base, delta) equals
    ``triple_support`` recomputed on the union corpus.
    """
    delta = triple_support(delta_docs, gazetteer, same_as=same_as)
    e = existing.select(
        "s", "p", "o",
        F.col("n_docs").alias("_n_e"), F.col("first_doc").alias("_f_e"),
    )
    d = delta.select(
        "s", "p", "o",
        F.col("n_docs").alias("_n_d"), F.col("first_doc").alias("_f_d"),
    )
    return e.join(d, ["s", "p", "o"], "full_outer").select(
        "s",
        "p",
        "o",
        (
            F.coalesce("_n_e", F.lit(0)) + F.coalesce("_n_d", F.lit(0))
        ).alias("n_docs"),
        # least() skips NULLs: a triple seen on one side only keeps its
        # own witness
        F.least("_f_e", "_f_d").alias("first_doc"),
    )
