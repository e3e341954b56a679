"""ttmf_spark — PySpark-native KG-construction + triple-trustworthiness engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference TTMF pipeline (WWW'19 "Triple Trustworthiness Measurement for
Knowledge Graph"): interleaved-document triple extraction, entity linking,
connected-components canonicalization, and three-level trust scoring
(resource-allocation PageRank features, TransE translation energy,
bounded reachable-path features) fused into a per-triple confidence.

Design commitments (see SURVEY.md):
- DataFrame/SQL declarative plans; Catalyst handles pushdown/pruning/AQE.
- Vectorized Arrow (pandas) UDFs only — no per-row Python anywhere.
- Iterative graph stages = frontier equi-joins across all cores at once;
  per-core exact semantics (DFS weights, personalized PageRank) run as
  grouped Arrow UDFs because each core's 4-hop subgraph is small while
  the number of cores is huge — parallelism across groups, not within.
"""

__version__ = "0.1.0"
