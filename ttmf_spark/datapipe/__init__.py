"""Large-scale training-data pipeline operators over the `documents` and
`embeddings` tables: deduplication (exact / MinHash-LSH / SimHash /
n-gram Jaccard / embedding-cosine), similarity search, text analysis
(language-ID, quality scoring, token counting, fingerprinting) and
multimodal column plumbing.

All hot paths are built-in `pyspark.sql.functions` expressions (JVM-side,
whole-stage-codegen); Python appears only in Arrow-batched UDFs for the
vector ops that built-ins cannot express efficiently.
"""
