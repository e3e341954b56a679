"""End-to-end extraction: docs -> mentions -> link -> canonicalize -> triples.

This is the KG-construction front end demanded by BASELINE.json's
north_rule; the reference pipeline begins where this ends (flat triple
files, reference get_triples/process_triples.py:12-13).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ttmf_spark.extract.assemble import assemble_triples_wide
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
