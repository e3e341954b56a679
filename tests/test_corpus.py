from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_UNIT
from tests.oracle_compare import assert_matches_oracle
from ttmf_spark import corpus, oracles


def test_docs_shape(spark):
    docs = corpus.interleaved_docs(spark, SF_UNIT)
    assert docs.columns == ["doc_id", "spans"]
    fields = {f.name for f in docs.schema["spans"].dataType.elementType.fields}
    assert fields == {"kind", "text", "media_ref", "offset"}
    n_orders = spark.read.parquet(f"{SF_UNIT}/orders.parquet").count()
    assert docs.count() == n_orders


def test_span_offsets_strictly_increasing(spark):
    flat = corpus.flat_spans(spark, SF_UNIT)
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    bad = (
        flat.withColumn("prev", F.lag("offset").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("offset") <= F.col("prev")))
        .count()
    )
    assert bad == 0


def test_span_kinds_all_present(spark):
    kinds = {
        r.kind
        for r in corpus.flat_spans(spark, SF_UNIT).select("kind").distinct().collect()
    }
    assert kinds == {"text", "image", "audio", "video"}


def test_span_flatten_matches_duckdb_oracle(spark):
    """Span-sequence invariant (kind, text, media_ref, order) — exact."""
    flat = corpus.flat_spans(spark, SF_UNIT)
    assert_matches_oracle(flat, oracles.span_flatten_sql(), SF_UNIT)
