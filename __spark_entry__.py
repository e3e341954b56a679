"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implemented operators map to SURVEY.md §2; the KG-specific queries run
over the deterministic interleaved-docs corpus derived from the driver
parquet tables (ttmf_spark.corpus), which makes the full
extract -> link -> canonicalize pipeline exactly SQL-derivable.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ttmf_spark import corpus, oracles
from ttmf_spark.extract import extract_triples


def _docs_inputs(spark: SparkSession, sf_dir: str):
    return (
        corpus.interleaved_docs(spark, sf_dir),
        corpus.gazetteer(spark, sf_dir),
        corpus.same_as_edges(spark, sf_dir),
    )


def q_span_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus span sequence (the per-row span invariant surface)."""
    return corpus.flat_spans(spark, sf_dir)


def q_extract_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full front end: docs -> mentions -> link -> canonicalize -> (s,p,o)."""
    docs, gaz, same = _docs_inputs(spark, sf_dir)
    return extract_triples(docs, gaz, same)


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: end-to-end KG construction on /root/testdata/sf0.001."""
    return q_extract_triples(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "span_flatten": q_span_flatten,
        "extract_triples": q_extract_triples,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "span_flatten": oracles.span_flatten_sql(),
        "extract_triples": oracles.truth_triples_sql(),
    }
