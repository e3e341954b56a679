"""DuckDB oracle SQL builders for the driver correctness gate.

Every SQL string here runs on the driver-registered views (region nation
customer supplier part orders lineitem events documents embeddings) and
reuses the exact template fragments from ``ttmf_spark.corpus`` so the
Spark pipeline and its oracle stay definitionally in sync.
"""

from __future__ import annotations

from ttmf_spark.corpus import (
    HEAD_TEXT,
    LINE_TEXT,
    MEDIA_ORDER_MOD,
    MEDIA_PART_MOD,
    MEDIA_SUPP_MOD,
)

# Shared CTEs: orders x customer x nation, and lineitem x supplier
_OC = (
    "oc AS (SELECT o_orderkey, c_custkey, c_nationkey, n_regionkey "
    "FROM orders JOIN customer ON o_custkey = c_custkey "
    "JOIN nation ON c_nationkey = n_nationkey)"
)
_LI = (
    "li AS (SELECT l_orderkey, l_linenumber, l_partkey, s_suppkey, s_nationkey "
    "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey)"
)


def truth_triples_sql() -> str:
    """Planted (s, p, o) triples — the expected output of the full
    extract -> link -> canonicalize pipeline (P = R = 1.0 by construction)."""
    return f"""
WITH {_OC}, {_LI}
SELECT DISTINCT s, p, o FROM (
  SELECT 'O' || o_orderkey AS s, 'placed_by' AS p, 'C' || c_custkey AS o FROM oc
  UNION ALL SELECT 'C' || c_custkey, 'in_nation', 'N' || c_nationkey FROM oc
  UNION ALL SELECT 'N' || c_nationkey, 'in_region', 'R' || n_regionkey FROM oc
  UNION ALL SELECT 'O' || l_orderkey, 'contains', 'P' || l_partkey FROM li
  UNION ALL SELECT 'P' || l_partkey, 'supplied_by', 'S' || s_suppkey FROM li
  UNION ALL SELECT 'S' || s_suppkey, 'in_nation', 'N' || s_nationkey FROM li
) t
"""


def kg_triple_support_sql(doc_pred: str = "TRUE") -> str:
    """Per-triple provenance: distinct supporting docs + min supporting
    doc_id per planted canonical triple (twin of pipeline.triple_support;
    every doc is 'D' || the orderkey whose spans assert the triple).
    ``doc_pred`` filters the witnessing docs — the retraction twin
    (kg_support_retract) passes the portable-hash deletion predicate."""
    return f"""
WITH {_OC}, {_LI},
dt AS (
  SELECT DISTINCT s, p, o, doc FROM (
    SELECT 'O' || o_orderkey AS s, 'placed_by' AS p, 'C' || c_custkey AS o,
           'D' || o_orderkey AS doc FROM oc
    UNION ALL SELECT 'C' || c_custkey, 'in_nation', 'N' || c_nationkey,
           'D' || o_orderkey FROM oc
    UNION ALL SELECT 'N' || c_nationkey, 'in_region', 'R' || n_regionkey,
           'D' || o_orderkey FROM oc
    UNION ALL SELECT 'O' || l_orderkey, 'contains', 'P' || l_partkey,
           'D' || l_orderkey FROM li
    UNION ALL SELECT 'P' || l_partkey, 'supplied_by', 'S' || s_suppkey,
           'D' || l_orderkey FROM li
    UNION ALL SELECT 'S' || s_suppkey, 'in_nation', 'N' || s_nationkey,
           'D' || l_orderkey FROM li
  ) t
  WHERE {doc_pred}
)
SELECT s, p, o, COUNT(*) AS n_docs, MIN(doc) AS first_doc
FROM dt GROUP BY s, p, o
"""


def kg_support_retract_sql(seed: int = 13, mod: int = 4, residue: int = 1) -> str:
    """Twin of queries.q_kg_support_retract: full support recompute with
    the deterministically-deleted docs (portable md5 hash of doc_id)
    excluded from the witness set."""
    pred = (
        f"NOT (('0x' || substr(md5('{seed}|' || doc), 1, 15))::BIGINT"
        f" % {mod} = {residue})"
    )
    return kg_triple_support_sql(doc_pred=pred)


def kg_maintenance_e2e_sql(
    doc_seed: int = 37,
    doc_mod: int = 5,
    doc_res: int = 2,
    al_seed: int = 35,
    al_mod: int = 4,
    al_res: int = 2,
    rounds: int = 4,
) -> str:
    """Twin of queries.q_kg_maintenance_e2e: the COLD build of the final
    state the interleaved maintenance cadence must converge to — support
    over the surviving docs under the canonical mapping of the surviving
    alias graph. Raw (pre-canonical) customer ids come from the corpus
    definition (CustomerAlt surfaces link to C{k}A); the alias CC runs as
    ``rounds`` pointer-jumping sweeps (chains are 3 nodes, diameter 2);
    VARCHAR LEAST is the same lexicographic min the star contraction
    uses ('C10' < 'C10A' < 'C10B'). The doc-batch interleaving (h31%3)
    and the add-edge holdout (h33%3) exist only on the Spark side — fold
    order must wash out, which is exactly what this gate proves."""
    craw = (
        "CASE WHEN c_custkey % 10 = 0 THEN 'C' || c_custkey || 'A' "
        "ELSE 'C' || c_custkey END"
    )
    doc_pred = (
        f"NOT (('0x' || substr(md5('{doc_seed}|' || doc), 1, 15))::BIGINT"
        f" % {doc_mod} = {doc_res})"
    )
    al_pred = (
        f"NOT (('0x' || substr(md5('{al_seed}|' || src || '|' || dst), 1, 15))"
        f"::BIGINT % {al_mod} = {al_res})"
    )
    cc = [
        "c0 AS (SELECT node, node AS label FROM anodes)",
    ]
    for i in range(1, rounds + 1):
        cc.append(
            f"c{i} AS MATERIALIZED ("
            f"  SELECT l.node, LEAST(l.label,"
            f"                       COALESCE(nb.m, l.label),"
            f"                       COALESCE(j.label, l.label)) AS label"
            f"  FROM c{i - 1} l"
            f"  LEFT JOIN (SELECT u.node AS node, MIN(x.label) AS m"
            f"             FROM und u JOIN c{i - 1} x ON x.node = u.nbr"
            f"             GROUP BY u.node) nb ON nb.node = l.node"
            f"  LEFT JOIN c{i - 1} j ON j.node = l.label)"
        )
    return f"""
WITH {_OC}, {_LI},
dt_raw AS (
  SELECT DISTINCT s, p, o, doc FROM (
    SELECT 'O' || o_orderkey AS s, 'placed_by' AS p, {craw} AS o,
           'D' || o_orderkey AS doc FROM oc
    UNION ALL SELECT {craw}, 'in_nation', 'N' || c_nationkey,
           'D' || o_orderkey FROM oc
    UNION ALL SELECT 'N' || c_nationkey, 'in_region', 'R' || n_regionkey,
           'D' || o_orderkey FROM oc
    UNION ALL SELECT 'O' || l_orderkey, 'contains', 'P' || l_partkey,
           'D' || l_orderkey FROM li
    UNION ALL SELECT 'P' || l_partkey, 'supplied_by', 'S' || s_suppkey,
           'D' || l_orderkey FROM li
    UNION ALL SELECT 'S' || s_suppkey, 'in_nation', 'N' || s_nationkey,
           'D' || l_orderkey FROM li
  ) t
  WHERE {doc_pred}
),
al_all AS (
  SELECT 'C' || c_custkey || 'A' AS src, 'C' || c_custkey || 'B' AS dst
  FROM customer WHERE c_custkey % 10 = 0
  UNION ALL
  SELECT 'C' || c_custkey || 'B', 'C' || c_custkey
  FROM customer WHERE c_custkey % 10 = 0
),
al AS (SELECT src, dst FROM al_all WHERE {al_pred}),
und AS (SELECT src AS node, dst AS nbr FROM al
        UNION SELECT dst, src FROM al),
anodes AS (SELECT src AS node FROM al_all UNION SELECT dst FROM al_all),
{",".join(cc)},
lab AS (SELECT node, label FROM c{rounds}),
mapped AS (
  SELECT DISTINCT COALESCE(ls.label, d.s) AS s, d.p,
         COALESCE(lo.label, d.o) AS o, d.doc
  FROM dt_raw d
  LEFT JOIN lab ls ON ls.node = d.s
  LEFT JOIN lab lo ON lo.node = d.o
)
SELECT s, p, o, COUNT(*) AS n_docs, MIN(doc) AS first_doc
FROM mapped GROUP BY s, p, o
"""


def raw_spans_sql() -> str:
    """Un-positioned spans with their (sort1, sort2) order keys."""
    return f"""
WITH {_OC}, {_LI},
raw AS (
  SELECT 'D' || o_orderkey AS doc_id, CAST(-1 AS BIGINT) AS sort1,
         CAST(0 AS BIGINT) AS tie1, CAST(0 AS BIGINT) AS tie2, 0 AS sort2,
         'text' AS kind, {HEAD_TEXT} AS text, CAST(NULL AS VARCHAR) AS media_ref
  FROM oc
  UNION ALL
  SELECT 'D' || l_orderkey, CAST(l_linenumber AS BIGINT),
         CAST(l_partkey AS BIGINT), CAST(s_suppkey AS BIGINT), 0,
         'text', {LINE_TEXT}, NULL
  FROM li
  UNION ALL
  SELECT 'D' || l_orderkey, CAST(l_linenumber AS BIGINT),
         CAST(l_partkey AS BIGINT), CAST(s_suppkey AS BIGINT), 1,
         'image', NULL, 'media://part/' || l_partkey
  FROM li WHERE l_partkey % {MEDIA_PART_MOD} = 0
  UNION ALL
  SELECT 'D' || l_orderkey, CAST(l_linenumber AS BIGINT),
         CAST(l_partkey AS BIGINT), CAST(s_suppkey AS BIGINT), 2,
         'video', NULL, 'media://supplier/' || s_suppkey
  FROM li WHERE s_suppkey % {MEDIA_SUPP_MOD} = 0
  UNION ALL
  SELECT 'D' || o_orderkey, CAST(2147483648 AS BIGINT),
         CAST(0 AS BIGINT), CAST(0 AS BIGINT), 0,
         'audio', NULL, 'media://order/' || o_orderkey
  FROM oc WHERE o_orderkey % {MEDIA_ORDER_MOD} = 0
)
SELECT * FROM raw
"""


def span_flatten_sql() -> str:
    """Expected (doc_id, pos, kind, text, media_ref, offset) rows — the
    span-sequence invariant surface (BASELINE.json per-row invariant)."""
    return f"""
WITH raw AS ({raw_spans_sql()})
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sort1, tie1, tie2, sort2) - 1 AS INT) AS pos,
       kind, text, media_ref,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sort1, tie1, tie2, sort2) - 1 AS INT) AS offset
FROM raw
"""


def kg_cooccurrence_sql(min_count: int = 2, k: int = 100) -> str:
    """Twin of extract.cooccur.entity_cooccurrence: the planted per-doc
    entity sets (exactly what linking + canonicalization recovers — same
    construction as truth_triples_sql, whose extract parity is P=R=1.0),
    within-doc pairs, PMI, top-k (pmi desc, a, b)."""
    return f"""
WITH {_OC}, {_LI},
de AS MATERIALIZED (
  SELECT DISTINCT doc_id, entity FROM (
    SELECT 'D' || o_orderkey AS doc_id, 'O' || o_orderkey AS entity FROM oc
    UNION ALL SELECT 'D' || o_orderkey, 'C' || c_custkey FROM oc
    UNION ALL SELECT 'D' || o_orderkey, 'N' || c_nationkey FROM oc
    UNION ALL SELECT 'D' || o_orderkey, 'R' || n_regionkey FROM oc
    UNION ALL SELECT 'D' || l_orderkey, 'P' || l_partkey FROM li
    UNION ALL SELECT 'D' || l_orderkey, 'S' || s_suppkey FROM li
    UNION ALL SELECT 'D' || l_orderkey, 'N' || s_nationkey FROM li
  ) u
),
nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM de),
cx AS (SELECT entity, COUNT(*) AS c FROM de GROUP BY entity),
pairs AS (
  SELECT l.entity AS a, r.entity AS b, COUNT(*) AS c_ab
  FROM de l JOIN de r ON l.doc_id = r.doc_id AND l.entity < r.entity
  GROUP BY l.entity, r.entity
  HAVING COUNT(*) >= {min_count}
)
SELECT p.a, p.b, p.c_ab, ca.c AS c_a, cb.c AS c_b,
       ROUND(ln(p.c_ab * CAST(nd.n AS DOUBLE) / (ca.c * cb.c)), 6) AS pmi
FROM pairs p
JOIN cx ca ON ca.entity = p.a
JOIN cx cb ON cb.entity = p.b
CROSS JOIN nd
ORDER BY pmi DESC, p.a, p.b
LIMIT {k}
"""


def kg_extraction_pr_sql() -> str:
    """Twin of q_kg_extraction_pr: gold-vs-gold, i.e. the expected row is
    (n, n, n, 1.0, 1.0, 1.0) — a green gate row asserts the pipeline's
    P = R = 1.0 (north-rule criterion >= 0.95) plus the P/R arithmetic."""
    return f"""
WITH gold AS ({truth_triples_sql()})
SELECT COUNT(*) AS n_extracted, COUNT(*) AS n_gold, COUNT(*) AS tp,
       ROUND(CAST(1.0 AS DOUBLE), 6) AS precision,
       ROUND(CAST(1.0 AS DOUBLE), 6) AS recall,
       ROUND(CAST(1.0 AS DOUBLE), 6) AS f1
FROM gold
"""


# non-media gazetteer surface universe (corpus.gazetteer minus media://)
_SURFACES = """
surfaces AS (
  SELECT DISTINCT surface FROM (
    SELECT 'Customer#' || c_custkey AS surface FROM customer
    UNION ALL SELECT 'CUST-' || c_custkey FROM customer WHERE c_custkey % 3 = 0
    UNION ALL SELECT 'CustomerAlt#' || c_custkey FROM customer WHERE c_custkey % 10 = 0
    UNION ALL SELECT 'Supplier#' || s_suppkey FROM supplier
    UNION ALL SELECT 'SUPP_' || s_suppkey FROM supplier WHERE s_suppkey % 5 = 0
    UNION ALL SELECT 'Part#' || p_partkey FROM part
    UNION ALL SELECT 'O' || o_orderkey FROM orders
    UNION ALL SELECT 'N' || n_nationkey FROM nation
    UNION ALL SELECT 'R' || r_regionkey FROM region
  ) s
)
"""


def kg_er_candidates_sql(tau: float = 0.4, max_block: int = 50) -> str:
    """Twin of extract.blocking.er_blocking_candidates over the non-media
    gazetteer surfaces: digit-key blocking (4-char-prefix fallback),
    block-size cap, trigram-Jaccard verify."""
    return f"""
WITH {_SURFACES.strip()},
d AS MATERIALIZED (
  SELECT surface AS name, key,
         CASE WHEN len(norm) >= 3 THEN
           list_distinct(list_transform(range(1, len(norm) - 1),
                                        i -> substr(norm, i, 3)))
         ELSE [norm] END AS g
  FROM (
    SELECT surface, norm,
           CASE WHEN digits <> '' THEN digits
                ELSE substr(norm, 1, 4) END AS key
    FROM (
      SELECT surface,
             regexp_replace(lower(surface), '[^a-z0-9]', '', 'g') AS norm,
             regexp_replace(regexp_replace(lower(surface), '[^a-z0-9]', '', 'g'),
                            '[^0-9]', '', 'g') AS digits
      FROM surfaces
    )
  )
),
ok AS (SELECT key FROM d GROUP BY key HAVING COUNT(*) <= {max_block}),
db AS MATERIALIZED (SELECT d.* FROM d JOIN ok ON ok.key = d.key)
SELECT a.name AS a, b.name AS b,
       ROUND(CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
             / len(list_distinct(list_concat(a.g, b.g))), 6) AS sim
FROM db a JOIN db b ON a.key = b.key AND a.name < b.name
WHERE CAST(len(list_intersect(a.g, b.g)) AS DOUBLE)
      / len(list_distinct(list_concat(a.g, b.g))) >= {tau}
"""


def kg_er_clusters_sql(tau: float = 0.4, max_block: int = 50, rounds: int = 8) -> str:
    """Twin of extract.blocking.er_clusters: the candidate-pair twin
    (kg_er_candidates_sql) feeds a fixed-sweep pointer-jumping min-label
    recurrence (the kg_components_sql pattern, VARCHAR labels — binary
    collation matches Spark's UTF8 ordering on these ASCII surfaces);
    singletons label themselves, sizes roll up per canonical."""
    parts = [
        f"cand AS MATERIALIZED ({kg_er_candidates_sql(tau, max_block)})",
        f"allnames AS (WITH {_SURFACES.strip()} SELECT DISTINCT surface FROM surfaces)",
        "und AS MATERIALIZED ("
        "  SELECT a AS node, b AS nbr FROM cand"
        "  UNION"
        "  SELECT b AS node, a AS nbr FROM cand)",
        "c0 AS (SELECT surface AS node, surface AS label FROM allnames)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"c{i} AS MATERIALIZED ("
            f"  SELECT l.node, LEAST(l.label,"
            f"                       COALESCE(nb.m, l.label),"
            f"                       COALESCE(j.label, l.label)) AS label"
            f"  FROM c{i - 1} l"
            f"  LEFT JOIN (SELECT u.node AS node, MIN(x.label) AS m"
            f"             FROM und u JOIN c{i - 1} x ON x.node = u.nbr"
            f"             GROUP BY u.node) nb ON nb.node = l.node"
            f"  LEFT JOIN c{i - 1} j ON j.node = l.label)"
        )
    body = ",\n".join(parts)
    return f"""
WITH {body},
labeled AS (SELECT node AS surface, label AS canonical FROM c{rounds}),
sizes AS (SELECT canonical, CAST(COUNT(*) AS BIGINT) AS cluster_size
          FROM labeled GROUP BY canonical)
SELECT l.surface, l.canonical, s.cluster_size
FROM labeled l JOIN sizes s ON l.canonical = s.canonical
"""


_FLAT = """
flat AS (
  SELECT doc_id,
         CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sort1, tie1, tie2, sort2) - 1 AS INT) AS pos,
         kind, text, media_ref
  FROM raw
)
"""


def media_interleave_stats_sql() -> str:
    """Twin of multimodal.interleave_stats over the span surface."""
    return f"""
WITH raw AS ({raw_spans_sql()}),
{_FLAT.strip()}
SELECT kind,
       CAST(COUNT(*) AS BIGINT) AS n_spans,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT media_ref) AS BIGINT) AS n_refs,
       ROUND(COUNT(*) / CAST(COUNT(DISTINCT doc_id) AS DOUBLE), 6) AS spans_per_doc
FROM flat GROUP BY kind
"""


def media_caption_pairs_sql(max_gap: int = 2) -> str:
    """Twin of multimodal.caption_pairs: same two ignore-nulls window
    scans per document, same nearest-with-preceding-tie caption rule."""
    return f"""
WITH raw AS ({raw_spans_sql()}),
{_FLAT.strip()},
d AS (
  SELECT *,
         LAST_VALUE(CASE WHEN kind = 'text' THEN pos END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ppos,
         LAST_VALUE(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS ptxt,
         FIRST_VALUE(CASE WHEN kind = 'text' THEN pos END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS npos,
         FIRST_VALUE(CASE WHEN kind = 'text' THEN text END IGNORE NULLS)
           OVER (PARTITION BY doc_id ORDER BY pos
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS ntxt
  FROM flat
),
rules AS (
  SELECT *,
         (ppos IS NOT NULL AND pos - ppos <= {max_gap}) AS prev_ok,
         (npos IS NOT NULL AND npos - pos <= {max_gap}) AS next_ok
  FROM d WHERE kind <> 'text'
)
SELECT doc_id, pos, kind, media_ref,
       CAST(COALESCE(
         CASE WHEN prev_ok AND (NOT next_ok OR pos - ppos <= npos - pos) THEN ppos
              WHEN next_ok THEN npos END, -1) AS INT) AS caption_pos,
       COALESCE(
         CASE WHEN prev_ok AND (NOT next_ok OR pos - ppos <= npos - pos) THEN ptxt
              WHEN next_ok THEN ntxt END, '') AS caption_text
FROM rules
"""
