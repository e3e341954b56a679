"""KG trust-scoring layer — Spark-first re-expression of the reference's
TTMF dataflow (reference `generate_intermediate.sh` + `Model1.py`):

encode -> adjacency -> subgraphs -> personalized PageRank -> RR features
       -> TransE embeddings/energy -> bounded path enumeration + ranking
       -> per-triple fusion confidence.

Every stage is a DataFrame transformation (joins, windows, grouped Arrow
UDFs); stage boundaries are checkpointable parquet/Iceberg tables
(ttmf_spark.checkpoint) instead of the reference's per-entity text files.
"""
