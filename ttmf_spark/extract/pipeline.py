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


def doc_triples(
    docs: DataFrame,
    gazetteer: DataFrame,
    same_as: DataFrame | None = None,
    mapping: DataFrame | None = None,
) -> DataFrame:
    """Per-(doc_id, s, p, o) provenance rows, distinct — the doc-level
    evidence table behind ``triple_support`` and the maintained state
    that makes alias-merge re-support (``resupport_after_merge``)
    possible: the aggregated (n_docs, first_doc) table alone cannot
    answer a cluster merge, because two old triples collapsing into one
    may share supporting documents and their counts do NOT add.

    Same dataflow as ``extract_triples`` with doc_id carried through
    assembly; the per-(doc, triple) dedup hashes on the full
    (doc_id, s, p, o) key, so hub entities do not skew the shuffle.

    ``mapping`` short-circuits the alias-graph CC: pass a maintained
    (entity, canonical) table (e.g. ``components_incremental`` labels
    renamed) instead of re-deriving it from ``same_as`` — the
    maintenance chain's route, where the labeling is long-lived state.
    """
    with_doc = assemble_triples_wide_with_doc(
        link_entities_wide(
            detect_mentions_wide(flatten_docs(docs)), gazetteer, WIDE_SLOTS
        )
    )
    if mapping is None and same_as is not None:
        mapping = canonical_map(same_as)
    if mapping is not None:
        # canonical ids can merge per-doc rows -> re-dedup per (doc, triple)
        with_doc = apply_canonical(
            with_doc, mapping, ["s", "o"]
        ).distinct()
    return with_doc


def _support_agg(doc_level: DataFrame) -> DataFrame:
    """(doc_id, s, p, o) distinct rows -> (s, p, o, n_docs, first_doc)."""
    return doc_level.groupBy("s", "p", "o").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc")
    )


def triple_support(
    docs: DataFrame,
    gazetteer: DataFrame,
    same_as: DataFrame | None = None,
    mapping: DataFrame | None = None,
) -> DataFrame:
    """Per-triple provenance: (s, p, o, n_docs, first_doc) where n_docs
    counts the distinct documents whose spans assert the canonical triple
    and first_doc is the lexicographic-min supporting doc_id (a stable
    exemplar pointer back into the corpus).

    The evidence table a downstream trust model consumes alongside the
    triple set: support is the cheapest independent confidence signal a
    100 TB corpus offers (a fact asserted by 10^6 documents vs 1), and
    first_doc gives audits a concrete witness. The final (s, p, o)
    aggregation hashes on the full triple key, so hub entities do not
    skew it; see ``doc_triples`` for the doc-level dataflow (and the
    ``mapping`` shortcut for maintained labelings).
    """
    return _support_agg(
        doc_triples(docs, gazetteer, same_as=same_as, mapping=mapping)
    )


def triple_support_incremental(
    existing: DataFrame,
    delta_docs: DataFrame | None,
    gazetteer: DataFrame | None,
    same_as: DataFrame | None = None,
    mapping: DataFrame | None = None,
    delta_doc_level: DataFrame | None = None,
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
      from their supporting docs instead — ``resupport_after_merge``
      (below) does exactly that from the maintained ``doc_triples``
      table and the ``label_remap`` merge map; run it BEFORE folding
      further doc batches under the new mapping. When the delta can
      SPLIT clusters (alias retractions), re-key through
      ``resupport_from_docs`` instead — the merge hook is label-level
      and provably insufficient for splits (see its docstring).

    Pinned by tests/test_extract.py: fold(base, delta) equals
    ``triple_support`` recomputed on the union corpus.

    ``delta_doc_level``: pass the batch's already-extracted
    (doc_id, s, p, o) rows (``doc_triples`` under the same mapping) to
    skip re-extraction — the route for callers that maintain BOTH the
    support table and the doc-level provenance (every real maintenance
    deployment does: the merge/split re-key hooks need doc_level), which
    otherwise pay the mention-detection/link/canonicalize pass twice per
    batch. ``delta_docs``/``gazetteer`` are ignored when it is given.
    """
    if delta_doc_level is not None:
        delta = _support_agg(delta_doc_level)
    else:
        delta = triple_support(
            delta_docs, gazetteer, same_as=same_as, mapping=mapping
        )
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


def resupport_after_merge(
    existing: DataFrame,
    doc_level: DataFrame,
    remap: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Re-key a maintained support table after an alias-merge relabeling.

    Closes the ``triple_support_incremental`` precondition: when a
    ``components_incremental`` delta MERGES clusters, the canonical
    mapping changes and the affected triples' supports must be recomputed
    from their supporting DOCUMENTS — counts cannot be added across the
    merged keys, because two old triples collapsing into one new key may
    share witnesses (one doc asserting both (A, p, B) and (C, p, B) with
    C merging into A supports the merged triple ONCE).

    Inputs:
      - ``existing``: (s, p, o, n_docs, first_doc) under the OLD mapping;
      - ``doc_level``: the maintained (doc_id, s, p, o) provenance rows
        (``doc_triples``) under the OLD mapping;
      - ``remap``: (old, new) CHANGED canonical-label pairs
        (``canonicalize.label_remap(old_labels, new_labels)``) — the
        merge map, delta-bounded by construction.

    Returns ``(support, doc_level)`` both under the NEW mapping —
    equal to a from-scratch ``triple_support`` / ``doc_triples`` under
    the union alias graph (pinned by pytest).

    Scale shape: ``remap`` broadcasts onto the two maintained tables (no
    corpus shuffle to FIND the affected rows — on an Iceberg/bucketed
    doc_level the s/o predicates also prune files); every shuffle
    (relabeled-row dedup, re-aggregation, collide splice) runs on the
    affected-subgraph-sized row sets only. Hot merged entities are
    bounded by the same full-triple-key hashing as the base build.
    """
    remap = remap.filter(F.col("old") != F.col("new")).distinct()
    ms = F.broadcast(
        remap.select(F.col("old").alias("s"), F.col("new").alias("_ns"))
    )
    mo = F.broadcast(
        remap.select(F.col("old").alias("o"), F.col("new").alias("_no"))
    )
    marked = doc_level.join(ms, "s", "left").join(mo, "o", "left")
    touched = marked.filter(
        F.col("_ns").isNotNull() | F.col("_no").isNotNull()
    )
    untouched = marked.filter(
        F.col("_ns").isNull() & F.col("_no").isNull()
    ).drop("_ns", "_no")
    # relabel the touched rows; the merge can collapse per-doc duplicates
    relabeled = touched.select(
        "doc_id",
        F.coalesce("_ns", "s").alias("s"),
        "p",
        F.coalesce("_no", "o").alias("o"),
    ).distinct()
    # new keys K: every key the relabeled rows land on. Untouched rows
    # already ON those keys must join the recount (their counts merge
    # with the incomers and may share witness docs). Unlike the remap
    # (alias-batch-bounded, safe to force-broadcast above), K is
    # AFFECTED-SUBGRAPH-bounded — a hub-entity merge can make it huge —
    # so its joins are left to AQE (broadcast when small, shuffle-hash
    # when not).
    new_keys = relabeled.select("s", "p", "o").distinct()
    collide = untouched.join(new_keys, ["s", "p", "o"], "left_semi")
    refit = relabeled.unionByName(collide).distinct()
    new_support_rows = _support_agg(refit)

    # splice: drop every OLD key of a touched row and every key in K,
    # then add the recomputed rows
    drop_keys = (
        touched.select("s", "p", "o")
        .distinct()
        .unionByName(new_keys.select("s", "p", "o"))
        .distinct()
    )
    support = existing.join(
        drop_keys, ["s", "p", "o"], "left_anti"
    ).unionByName(new_support_rows)

    # maintained doc-level state: untouched rows off K keep themselves;
    # on-K rows are replaced by the deduped refit set
    new_doc_level = untouched.join(
        new_keys, ["s", "p", "o"], "left_anti"
    ).unionByName(refit)
    return support, new_doc_level


def triple_support_decremental(
    existing: DataFrame,
    doc_level: DataFrame,
    deleted_doc_ids: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Fold a batch of DOCUMENT RETRACTIONS out of the maintained support
    table — the deletion twin of ``triple_support_incremental`` (adds)
    and the chain-mate of ``components_decremental`` (edge retractions):
    when source documents are withdrawn (takedowns, un-publications,
    extraction corrections), every triple they witnessed must decrement,
    its ``first_doc`` witness pointer may need to move to the next
    surviving doc, and triples with no surviving witness must drop.

    Counts cannot simply subtract from the aggregate: ``first_doc`` is a
    MIN, so losing the current witness requires the surviving docs —
    which is exactly what the maintained ``doc_level`` table holds.

      1. drop the deleted rows: one anti-join of ``doc_level`` on the
         (delta-bounded, broadcastable) deleted doc_id dim;
      2. affected keys = triples the deleted docs witnessed (delta-
         bounded: rows-of-deleted-docs, one semi-join);
      3. re-aggregate ONLY the affected keys from their surviving rows;
         keys with zero survivors vanish (no zero-count tombstones);
      4. splice: every unaffected support row verbatim.

    Returns ``(support, doc_level)`` — equal to ``triple_support`` /
    ``doc_triples`` recomputed on the surviving corpus (pinned by
    pytest). Deleting an unknown doc_id is a no-op. The affected-key
    joins are left to AQE like the resupport splice above (a hub doc
    can witness many triples).
    """
    ids = F.broadcast(
        deleted_doc_ids.select(F.col(deleted_doc_ids.columns[0]).alias("doc_id"))
        .distinct()
    )
    affected = doc_level.join(ids, "doc_id").select("s", "p", "o").distinct()
    surviving = doc_level.join(ids, "doc_id", "left_anti")
    refit = surviving.join(affected, ["s", "p", "o"], "left_semi")
    support = existing.join(
        affected, ["s", "p", "o"], "left_anti"
    ).unionByName(_support_agg(refit))
    return support, surviving


def resupport_from_docs(
    existing: DataFrame,
    doc_level: DataFrame,
    remap: DataFrame,
    docs: DataFrame,
    gazetteer: DataFrame,
    mapping: DataFrame,
) -> tuple[DataFrame, DataFrame]:
    """Re-key a maintained support table after a canonical-mapping change
    that can SPLIT clusters — the deletion-side completion of
    ``resupport_after_merge``, which is correct for merges ONLY.

    Why the merge hook cannot handle a split: the maintained
    ``doc_level`` stores CANONICAL ids, so a row (doc, C, p, o) no longer
    remembers whether the underlying mention was the min-member entity
    (which keeps label C after the split) or an alias that moved to the
    split-off cluster (new label D). ``label_remap`` for a split maps one
    old label to several new ones — no label-level join can pick the
    right branch per row. The only exact source of truth is the corpus:
    re-extract the AFFECTED DOCUMENTS under the new mapping and splice at
    document granularity.

      1. affected old labels = ``remap.old`` (delta-bounded, broadcast);
      2. affected docs = doc_level rows touching an affected label on s
         or o — one broadcast-filtered pass, file-pruned on a bucketed/
         Iceberg layout;
      3. re-extract ``doc_triples`` for those docs only, under the NEW
         ``mapping`` (a maintained (entity, canonical) labeling — e.g.
         ``components_decremental`` output renamed);
      4. splice doc-wise: unaffected docs' rows verbatim, affected docs'
         rows replaced wholesale; re-aggregate support for every key that
         appears in a dropped or re-extracted row, keep the rest verbatim.

    Returns ``(support, doc_level)`` equal to ``triple_support`` /
    ``doc_triples`` rebuilt from scratch on the full corpus under the new
    mapping (pinned by pytest + the kg_maintenance_e2e driver oracle).

    Scale shape: cost is bounded by the affected documents (the docs that
    mention a relabeled entity), not the corpus — the corpus scan in step
    3 is a doc_id point-lookup set (partition-pruned on an Iceberg
    doc_id-keyed table). Works for merges too (it is the general exact
    hook); ``resupport_after_merge`` remains the cheaper label-level path
    when the delta only merges.
    """
    # ONE pass over the corpus-scale doc_level: both affected-label
    # probes ride the same scan as broadcast left joins (the
    # resupport_after_merge marked-join pattern), never two semi-joins
    old_labels = remap.select(F.col("old").alias("lab")).distinct()
    ms = F.broadcast(old_labels.select(F.col("lab").alias("s"), F.lit(1).alias("_ts")))
    mo = F.broadcast(old_labels.select(F.col("lab").alias("o"), F.lit(1).alias("_to")))
    aff_docs = (
        doc_level.join(ms, "s", "left")
        .join(mo, "o", "left")
        .filter(F.col("_ts").isNotNull() | F.col("_to").isNotNull())
        .select("doc_id")
        .distinct()
        .localCheckpoint(eager=True)
    )
    dropped = doc_level.join(aff_docs, "doc_id", "left_semi")
    kept_doc = doc_level.join(aff_docs, "doc_id", "left_anti")
    redo = doc_triples(
        docs.join(aff_docs, "doc_id", "left_semi"), gazetteer, mapping=mapping
    )
    new_doc_level = kept_doc.unionByName(redo)
    aff_keys = (
        dropped.select("s", "p", "o")
        .unionByName(redo.select("s", "p", "o"))
        .distinct()
    )
    support = existing.join(aff_keys, ["s", "p", "o"], "left_anti").unionByName(
        _support_agg(new_doc_level.join(aff_keys, ["s", "p", "o"], "left_semi"))
    )
    return support, new_doc_level
