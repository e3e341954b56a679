"""DuckDB oracle SQL for the KG-layer operators (SURVEY.md §2.2-2.7).

All queries run on the driver-registered TPC-H views; the KG itself is
the planted truth-triple set (ttmf_spark.oracles.truth_triples_sql), so
encode/adjacency/reach/subgraph/degree/path results are exactly
relationally derivable. Core/head restrictions keep the sf0.01 gate fast
while exercising full operator semantics.
"""

from __future__ import annotations

from ttmf_spark.oracles import truth_triples_sql

# shared CTE prefix: triples -> dense dictionaries -> id triples
KG_BASE = f"""
triples AS ({truth_triples_sql()}),
ent AS (
  SELECT name, CAST(ROW_NUMBER() OVER (ORDER BY name) - 1 AS BIGINT) AS id
  FROM (SELECT s AS name FROM triples UNION SELECT o FROM triples) u
),
rel AS (
  SELECT name, CAST(ROW_NUMBER() OVER (ORDER BY name) - 1 AS BIGINT) AS id
  FROM (SELECT DISTINCT p AS name FROM triples) u
),
idt AS MATERIALIZED (
  SELECT eh.id AS h, r.id AS r, et.id AS t
  FROM triples
  JOIN ent eh ON triples.s = eh.name
  JOIN rel r  ON triples.p = r.name
  JOIN ent et ON triples.o = et.name
)
"""

# adjacency with global out-normalized weights (SURVEY.md A3/A4 clean rule)
KG_ADJ = """
adj AS (
  SELECT h AS src, t AS dst, COUNT(*) AS n_rels,
         string_agg(CAST(r AS VARCHAR), ',' ORDER BY r) AS rels_str
  FROM idt GROUP BY h, t
),
edges AS MATERIALIZED (
  SELECT src, dst, n_rels, rels_str,
         CAST(n_rels AS DOUBLE) / SUM(n_rels) OVER (PARTITION BY src) AS w
  FROM adj
)
"""

# restricted core set: order entities with orderkey % 100 = 0
KG_CORES = """
cores AS (
  SELECT id AS core FROM ent
  WHERE name LIKE 'O%' AND CAST(substr(name, 2) AS BIGINT) % 100 = 0
)
"""

def _bfs_reach(depth: int = 4) -> str:
    """Unrolled BFS as min-depth over layered expansion: layer k = distinct
    (core, dst) of layer k-1; shortest distance = MIN over the union (no
    visited-set anti-join needed — the graph is a bounded-depth DAG)."""
    parts = ["l0 AS (SELECT core, core AS node, 0 AS depth FROM cores)"]
    for k in range(1, depth + 1):
        parts.append(
            f"l{k} AS (SELECT DISTINCT f.core, e.dst AS node, {k} AS depth "
            f"FROM l{k-1} f JOIN edges e ON e.src = f.node)"
        )
    layers = " UNION ALL ".join(f"SELECT * FROM l{k}" for k in range(depth + 1))
    parts.append(
        f"reach AS MATERIALIZED (SELECT core, node, MIN(depth) AS depth FROM ({layers}) "
        "lall GROUP BY core, node)"
    )
    return ",\n".join(parts)


def kg_entity2id_sql() -> str:
    return f"WITH {KG_BASE.strip()} SELECT name, id FROM ent"


def kg_triples2id_sql() -> str:
    return f"WITH {KG_BASE.strip()} SELECT h, r, t FROM idt"


def kg_adjacency_sql() -> str:
    return (
        f"WITH {KG_BASE.strip()}, {KG_ADJ.strip()} "
        "SELECT src, dst, n_rels, rels_str, ROUND(w, 6) AS w FROM edges"
    )


def kg_reach_sql(depth: int = 4) -> str:
    return (
        f"WITH {KG_BASE.strip()}, {KG_ADJ.strip()}, {KG_CORES.strip()},\n"
        f"{_bfs_reach(depth)}\n"
        "SELECT core, node, depth FROM reach"
    )


def kg_subgraph_edges_sql(depth: int = 4) -> str:
    return (
        f"WITH {KG_BASE.strip()}, {KG_ADJ.strip()}, {KG_CORES.strip()},\n"
        f"{_bfs_reach(depth)}\n"
        f"SELECT r.core, e.src, e.dst, ROUND(e.w, 6) AS w "
        f"FROM reach r JOIN edges e ON e.src = r.node WHERE r.depth <= {depth - 1}"
    )


def kg_degrees_sql(depth: int = 4) -> str:
    return (
        f"WITH {KG_BASE.strip()}, {KG_ADJ.strip()}, {KG_CORES.strip()},\n"
        f"{_bfs_reach(depth)},\n"
        f"sg AS MATERIALIZED (SELECT r.core, e.src, e.dst FROM reach r JOIN edges e "
        f"ON e.src = r.node WHERE r.depth <= {depth - 1}),\n"
        "nodes AS (SELECT DISTINCT core, src AS node FROM sg "
        "UNION SELECT DISTINCT core, dst FROM sg UNION SELECT core, core FROM cores),\n"
        "od AS (SELECT core, src AS node, COUNT(DISTINCT dst) AS out_deg FROM sg GROUP BY 1, 2),\n"
        "idg AS (SELECT core, dst AS node, COUNT(DISTINCT src) AS in_deg FROM sg GROUP BY 1, 2)\n"
        "SELECT n.core, n.node, COALESCE(idg.in_deg, 0) AS in_deg, "
        "COALESCE(od.out_deg, 0) AS out_deg "
        "FROM nodes n LEFT JOIN od ON n.core = od.core AND n.node = od.node "
        "LEFT JOIN idg ON n.core = idg.core AND n.node = idg.node"
    )


# --- bounded simple paths (SURVEY.md G5) -----------------------------------

KG_PATH_HEADS = """
heads AS (
  SELECT id AS h FROM ent
  WHERE name LIKE 'O%' AND CAST(substr(name, 2) AS BIGINT) % 500 = 0
)
"""


def kg_paths_sql() -> str:
    """All simple paths of 1..3 edges from restricted heads, as strings."""
    return f"""
WITH {KG_BASE.strip()}, {KG_PATH_HEADS.strip()},
e AS (SELECT h AS src, t AS dst, r FROM idt),
p1 AS (
  SELECT heads.h, e.dst AS t,
         '(' || e.src || ',' || e.dst || ',' || e.r || ')' AS path, 1 AS len,
         e.src AS v0, e.dst AS v1, CAST(NULL AS BIGINT) AS v2
  FROM heads JOIN e ON e.src = heads.h WHERE e.dst <> heads.h
),
p2 AS (
  SELECT p1.h, e.dst AS t,
         p1.path || '(' || e.src || ',' || e.dst || ',' || e.r || ')' AS path, 2 AS len,
         p1.v0, p1.v1, e.dst AS v2
  FROM p1 JOIN e ON e.src = p1.t
  WHERE e.dst <> p1.v0 AND e.dst <> p1.v1
),
p3 AS (
  SELECT p2.h, e.dst AS t,
         p2.path || '(' || e.src || ',' || e.dst || ',' || e.r || ')' AS path, 3 AS len
  FROM p2 JOIN e ON e.src = p2.t
  WHERE e.dst <> p2.v0 AND e.dst <> p2.v1 AND e.dst <> p2.v2
)
SELECT h, t, path, len FROM p1
UNION ALL SELECT h, t, path, len FROM p2
UNION ALL SELECT h, t, path, len FROM p3
"""


# --- W1 threshold scan on synthetic labeled groups -------------------------

THRESH_INPUT = """
pairs AS (
  SELECT CAST(c_nationkey AS BIGINT) AS grp,
         CAST((c_custkey * 2654435761) % 100000 AS DOUBLE) / 1000.0 AS score,
         CASE WHEN (c_custkey * 7919) % 3 = 0 THEN 1 ELSE -1 END AS flag,
         CAST(c_custkey AS BIGINT) AS seq
  FROM customer
)
"""


def kg_threshold_scan_sql(ascending: bool = True) -> str:
    """Reference getThreshold scan re-expressed in portable window SQL."""
    direction = "ASC" if ascending else "DESC"
    default = "- 0.01" if ascending else "+ 0.01"
    return f"""
WITH {THRESH_INPUT.strip()},
lagged AS (
  SELECT grp, score, flag, seq,
         ROW_NUMBER() OVER (PARTITION BY grp ORDER BY score {direction}, seq ASC) AS i,
         LAG(score) OVER (PARTITION BY grp ORDER BY score {direction}, seq ASC) AS prev_score,
         LAG(flag) OVER (PARTITION BY grp ORDER BY score {direction}, seq ASC) AS prev_flag
  FROM pairs
),
ordered AS (
  SELECT grp, score, flag, seq, i, prev_score,
         SUM(CASE WHEN prev_flag IS NULL THEN 0
                  WHEN prev_flag = 1 THEN 1 ELSE -1 END)
           OVER (PARTITION BY grp ORDER BY i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM lagged
),
gmax AS (SELECT grp, MAX(cum) AS g FROM ordered WHERE i >= 2 GROUP BY grp),
dflt AS (SELECT grp, score {default} AS d FROM ordered WHERE i = 1),
best AS (
  SELECT o.grp, MIN_BY((o.score + o.prev_score) / 2.0, o.i) AS b
  FROM ordered o JOIN gmax ON o.grp = gmax.grp
  WHERE o.i >= 2 AND o.cum = gmax.g AND gmax.g > 0
  GROUP BY o.grp
)
SELECT dflt.grp, ROUND(COALESCE(best.b, dflt.d), 9) AS threshold
FROM dflt LEFT JOIN best ON dflt.grp = best.grp
"""


# --- fixed-iteration personalized PageRank (SURVEY.md G2/A7) ----------------


def kg_pagerank_fixed_sql(depth: int = 4, k: int = 20) -> str:
    """Exactly ``k`` Jacobi sweeps of the dangling-patched personalized
    PageRank (reference pagerank.py:18-85 semantics), unrolled as k chained
    CTEs — SQL twin of ``pagerank_routed(..., max_iter=k, min_delta=0)``.

    Fixed iteration count makes the fixpoint method SQL-expressible: both
    sides run the identical float64 recurrence
    ``pr' = (1-a)/N + a * sum_in pr(src)*w`` from ``pr0(core)=1``, so values
    agree to ~1e-14 and ROUND(.,6) hashes identically.
    """
    a = "CAST(0.85 AS DOUBLE)"
    parts = [
        f"sg AS MATERIALIZED (SELECT r.core, e.src, e.dst, e.w FROM reach r "
        f"JOIN edges e ON e.src = r.node WHERE r.depth <= {depth - 1})",
        "nodes AS MATERIALIZED (SELECT DISTINCT core, src AS node FROM sg "
        "UNION SELECT DISTINCT core, dst FROM sg "
        "UNION SELECT core, core FROM cores)",
        # dangling patch: no-out-edge nodes get a 0.5 self-loop and (unless
        # they are the core) a 0.5 edge to the core (pagerank.py:32-44)
        "dang AS (SELECT n.core, n.node FROM nodes n LEFT JOIN "
        "(SELECT DISTINCT core, src FROM sg) o "
        "ON n.core = o.core AND n.node = o.src WHERE o.src IS NULL)",
        "patched AS MATERIALIZED ("
        "SELECT core, src, dst, w FROM sg "
        "UNION ALL SELECT core, node, node, CAST(0.5 AS DOUBLE) FROM dang "
        "UNION ALL SELECT core, node, core, CAST(0.5 AS DOUBLE) FROM dang "
        "WHERE node <> core)",
        "nsz AS (SELECT core, COUNT(*) AS n FROM nodes GROUP BY core)",
        "pr0 AS (SELECT core, node, CASE WHEN node = core THEN "
        "CAST(1.0 AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END AS pr FROM nodes)",
    ]
    for i in range(1, k + 1):
        parts.append(
            f"pr{i} AS MATERIALIZED (SELECT n.core, n.node, "
            f"(CAST(1.0 AS DOUBLE) - {a}) / nsz.n "
            f"+ {a} * COALESCE(m.mass, CAST(0.0 AS DOUBLE)) AS pr "
            f"FROM nodes n JOIN nsz ON nsz.core = n.core LEFT JOIN "
            f"(SELECT e.core, e.dst AS node, SUM(p.pr * e.w) AS mass "
            f"FROM pr{i - 1} p JOIN patched e "
            f"ON e.core = p.core AND e.src = p.node "
            f"GROUP BY e.core, e.dst) m "
            f"ON m.core = n.core AND m.node = n.node)"
        )
    return (
        f"WITH {KG_BASE.strip()}, {KG_ADJ.strip()}, {KG_CORES.strip()},\n"
        f"{_bfs_reach(depth)},\n" + ",\n".join(parts) + "\n"
        f"SELECT core, node, ROUND(pr, 6) AS pr FROM pr{k}"
    )


def kg_common_neighbors_sql(max_degree: int = 1000, k: int = 100) -> str:
    """Twin of graph.common_neighbor_scores: common-neighbor count +
    Adamic-Adar over the undirected distinct skeleton, hub intermediates
    dropped at max_degree, existing edges anti-joined out, top-k with the
    same deterministic ordering."""
    return f"""
WITH {KG_BASE},
und AS MATERIALIZED (
  SELECT h AS node, t AS nbr FROM idt WHERE h <> t
  UNION
  SELECT t AS node, h AS nbr FROM idt WHERE h <> t
),
deg AS (
  SELECT nbr AS z, COUNT(*) AS deg FROM und GROUP BY nbr
  HAVING COUNT(*) <= {max_degree}
),
ez AS MATERIALIZED (
  SELECT u.nbr AS z, u.node, d.deg FROM und u JOIN deg d ON u.nbr = d.z
),
pairs AS (
  SELECT l.node AS u, r.node AS v,
         CAST(COUNT(*) AS BIGINT) AS cn,
         ROUND(SUM(1.0 / ln(l.deg)), 6) AS aa,
         ROUND(SUM(1.0 / l.deg), 6) AS ra
  FROM ez l JOIN ez r ON l.z = r.z AND l.node < r.node
  GROUP BY l.node, r.node
),
existing AS (
  SELECT DISTINCT LEAST(node, nbr) AS u, GREATEST(node, nbr) AS v FROM und
)
SELECT p.u, p.v, p.cn, p.aa, p.ra
FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM existing e WHERE e.u = p.u AND e.v = p.v)
ORDER BY p.aa DESC, p.cn DESC, p.u, p.v
LIMIT {k}
"""


def kg_relation_profile_sql() -> str:
    """Twin of graph.relation_profile (Bordes 1.5-threshold categories)."""
    return f"""
WITH {KG_BASE},
tph AS (
  SELECT r, ROUND(AVG(_n), 6) AS tph,
         CAST(COUNT(*) AS BIGINT) AS n_heads,
         CAST(SUM(_n) AS BIGINT) AS n_triples
  FROM (SELECT r, h, COUNT(*) AS _n FROM idt GROUP BY r, h) GROUP BY r
),
hpt AS (
  SELECT r, ROUND(AVG(_n), 6) AS hpt, CAST(COUNT(*) AS BIGINT) AS n_tails
  FROM (SELECT r, t, COUNT(*) AS _n FROM idt GROUP BY r, t) GROUP BY r
)
SELECT tph.r, n_triples, n_heads, n_tails, tph, hpt,
       CASE WHEN tph < 1.5 AND hpt < 1.5 THEN '1-1'
            WHEN tph >= 1.5 AND hpt < 1.5 THEN '1-N'
            WHEN tph < 1.5 AND hpt >= 1.5 THEN 'N-1'
            ELSE 'N-N' END AS category
FROM tph JOIN hpt ON tph.r = hpt.r
"""


def kg_triangles_sql() -> str:
    """Twin of graph.triangle_stats. The Spark side enumerates with the
    degree-ordered orientation (skew bound); orientation changes the plan
    only, so this twin uses the naive a<b orientation — identical result
    by construction."""
    return f"""
WITH {KG_BASE},
und AS MATERIALIZED (
  SELECT h AS node, t AS nbr FROM idt WHERE h <> t
  UNION
  SELECT t AS node, h AS nbr FROM idt WHERE h <> t
),
deg AS (SELECT node, COUNT(*) AS degree FROM und GROUP BY node),
e AS MATERIALIZED (SELECT node AS x, nbr AS y FROM und WHERE node < nbr),
tri AS (
  SELECT e1.x AS a, e1.y AS b, e2.y AS c
  FROM e e1
  JOIN e e2 ON e2.x = e1.y
  JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y
),
tn AS (
  SELECT node, COUNT(*) AS triangles FROM (
    SELECT a AS node FROM tri
    UNION ALL SELECT b FROM tri
    UNION ALL SELECT c FROM tri
  ) GROUP BY node
)
SELECT d.node, d.degree,
       CAST(COALESCE(tn.triangles, 0) AS BIGINT) AS triangles,
       CASE WHEN d.degree >= 2
            THEN ROUND(2.0 * COALESCE(tn.triangles, 0)
                       / (d.degree * (d.degree - 1.0)), 6)
            ELSE 0.0 END AS clust_coef
FROM deg d LEFT JOIN tn ON tn.node = d.node
"""


def kg_kcore_sql(k: int = 2, rounds: int = 8) -> str:
    """Twin of graph.kcore(k, rounds=rounds): the peel loop unrolled into
    one CTE per sweep (same fixed-iteration gating pattern as
    kg_pagerank_fixed_sql)."""
    parts = [
        "a0 AS MATERIALIZED ("
        "  SELECT h AS node, t AS nbr FROM idt WHERE h <> t"
        "  UNION"
        "  SELECT t AS node, h AS nbr FROM idt WHERE h <> t)"
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"k{i} AS (SELECT node FROM "
            f"(SELECT node, COUNT(*) AS c FROM a{i - 1} GROUP BY node) d "
            f"WHERE c >= {k})"
        )
        parts.append(
            f"a{i} AS MATERIALIZED (SELECT a.node, a.nbr FROM a{i - 1} a "
            f"JOIN k{i} x ON a.node = x.node "
            f"JOIN k{i} y ON a.nbr = y.node)"
        )
    return (
        f"WITH {KG_BASE.strip()},\n" + ",\n".join(parts) + "\n"
        f"SELECT node, COUNT(*) AS degree FROM a{rounds} GROUP BY node"
    )


def kg_inverse_leakage_sql(min_frac: float = 0.5, min_n: int = 10) -> str:
    """Twin of graph.inverse_relation_leakage."""
    return f"""
WITH {KG_BASE},
t1 AS MATERIALIZED (SELECT DISTINCT h, r, t FROM idt),
bd AS (
  SELECT a.r AS r1, b.r AS r2, COUNT(*) AS n_both
  FROM t1 a JOIN t1 b ON b.h = a.t AND b.t = a.h
  GROUP BY 1, 2
),
nr AS (SELECT r AS r1, COUNT(*) AS n_r1 FROM t1 GROUP BY 1)
SELECT bd.r1, bd.r2, nr.n_r1, bd.n_both,
       ROUND(CAST(bd.n_both AS DOUBLE) / nr.n_r1, 6) AS frac
FROM bd JOIN nr ON nr.r1 = bd.r1
WHERE CAST(bd.n_both AS DOUBLE) / nr.n_r1 >= {min_frac} AND nr.n_r1 >= {min_n}
"""


def kg_communities_sql(rounds: int = 4) -> str:
    """Twin of graph.label_propagation(rounds=rounds): the synchronous
    min-tie-break label-propagation sweep unrolled into one (votes,
    labels) CTE pair per round (same fixed-iteration gating pattern as
    kg_kcore_sql)."""
    parts = [
        "und AS MATERIALIZED ("
        "  SELECT h AS node, t AS nbr FROM idt WHERE h <> t"
        "  UNION"
        "  SELECT t AS node, h AS nbr FROM idt WHERE h <> t)",
        "l0 AS (SELECT DISTINCT node, node AS label FROM und)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"v{i} AS (SELECT u.node, l.label AS lbl, COUNT(*) AS c "
            f"FROM und u JOIN l{i - 1} l ON l.node = u.nbr GROUP BY 1, 2)"
        )
        parts.append(
            f"l{i} AS MATERIALIZED (SELECT node, lbl AS label FROM ("
            f"SELECT node, lbl, ROW_NUMBER() OVER "
            f"(PARTITION BY node ORDER BY c DESC, lbl ASC) AS rn FROM v{i}"
            f") WHERE rn = 1)"
        )
    return (
        f"WITH {KG_BASE.strip()},\n" + ",\n".join(parts) + "\n"
        f"SELECT node, label FROM l{rounds}"
    )


def kg_path_reliability_sql(max_out: int = 1000, min_resource: float = 0.01) -> str:
    """Twin of graph.pcra_path_reliability: 2-hop PCRA resource via one
    midpoint self-join over (h, r) out-degree-weighted edges. Terms are
    summed in the same 10^12 fixed-point integer space as the Spark side
    (float sums are order-dependent in the last bit; integer sums are
    permutation-invariant and engine-exact)."""
    scale = 10**12
    return f"""
WITH {KG_BASE},
e AS MATERIALIZED (SELECT DISTINCT h, r, t FROM idt),
od AS (SELECT h, r, COUNT(*) AS n FROM e GROUP BY 1, 2),
s AS MATERIALIZED (
  SELECT e.h, e.r, e.t, od.n FROM e
  JOIN od ON od.h = e.h AND od.r = e.r
  WHERE od.n <= {max_out}
)
SELECT a.h, a.r AS r1, b.r AS r2, b.t,
       ROUND(CAST(SUM({scale} // (a.n * b.n)) AS DOUBLE) / {float(scale)}, 6)
         AS resource
FROM s a JOIN s b ON b.h = a.t
GROUP BY 1, 2, 3, 4
HAVING SUM({scale} // (a.n * b.n)) >= {int(min_resource * scale)}
"""


# augmented base: planted triples + the two derived shortcut relations
# (corpus.shortcut_triples) — the planted KG is multipartite, so WITHOUT
# shortcut edges no 2-hop path ever parallels a direct edge and the path
# table is structurally empty. Same dense-dictionary construction.
KG_AUG_BASE = f"""
triples AS (
  WITH base AS ({truth_triples_sql()})
  SELECT DISTINCT s, p, o FROM (
    SELECT s, p, o FROM base
    UNION ALL
    SELECT 'O' || l_orderkey AS s, 'supplied_via' AS p,
           'S' || l_suppkey AS o FROM lineitem
    UNION ALL
    SELECT 'O' || o_orderkey, 'order_nation', 'N' || c_nationkey
    FROM orders JOIN customer ON o_custkey = c_custkey
  ) u
),
ent AS (
  SELECT name, CAST(ROW_NUMBER() OVER (ORDER BY name) - 1 AS BIGINT) AS id
  FROM (SELECT s AS name FROM triples UNION SELECT o FROM triples) u
),
rel AS (
  SELECT name, CAST(ROW_NUMBER() OVER (ORDER BY name) - 1 AS BIGINT) AS id
  FROM (SELECT DISTINCT p AS name FROM triples) u
),
idt AS MATERIALIZED (
  SELECT eh.id AS h, r.id AS r, et.id AS t
  FROM triples
  JOIN ent eh ON triples.s = eh.name
  JOIN rel r  ON triples.p = r.name
  JOIN ent et ON triples.o = et.name
)
"""


def kg_path_triples_sql(max_out: int = 1000, min_resource: float = 0.01) -> str:
    """Twin of graph.pcra_path_triples over the shortcut-AUGMENTED KG:
    PCRA fixed-point resources -> per-(h,t) normalized share (one
    int64->double division, rounded once to a 1e-9 fixed-point BIGINT)
    -> exact integer sum per (r1, r2, r) joined against the direct edge
    set. Same numerics contract as kg_path_reliability_sql."""
    scale = 10**12
    wscale = 10**9
    return f"""
WITH {KG_AUG_BASE},
e AS MATERIALIZED (SELECT DISTINCT h, r, t FROM idt),
od AS (SELECT h, r, COUNT(*) AS n FROM e GROUP BY 1, 2),
s AS MATERIALIZED (
  SELECT e.h, e.r, e.t, od.n FROM e
  JOIN od ON od.h = e.h AND od.r = e.r
  WHERE od.n <= {max_out}
),
p AS MATERIALIZED (
  SELECT a.h, a.r AS r1, b.r AS r2, b.t, SUM({scale} // (a.n * b.n)) AS _s
  FROM s a JOIN s b ON b.h = a.t
  GROUP BY 1, 2, 3, 4
  HAVING SUM({scale} // (a.n * b.n)) >= {int(min_resource * scale)}
),
z AS (SELECT h, t, SUM(_s) AS _z FROM p GROUP BY 1, 2),
w AS (
  SELECT p.h, p.t, p.r1, p.r2,
         CAST(ROUND(CAST(p._s AS DOUBLE) / CAST(z._z AS DOUBLE) * {wscale}, 0)
              AS BIGINT) AS wfp
  FROM p JOIN z ON z.h = p.h AND z.t = p.t
)
SELECT w.r1, w.r2, e.r,
       ROUND(CAST(SUM(w.wfp) AS DOUBLE) / {float(wscale)}, 6) AS weight
FROM w JOIN e ON e.h = w.h AND e.t = w.t
GROUP BY 1, 2, 3
"""


def kg_hits_sql(rounds: int = 8) -> str:
    """Twin of graph.hits(rounds=rounds): the mutual auth/hub recurrence
    unrolled round by round. Max-normalization (not L2) keeps the
    normalizer permutation-invariant; the update sums are the same
    float64 recurrence on both engines (~1e-14 agreement, ROUND(.,6)
    hashes identically — the kg_pagerank_fixed portability contract)."""
    parts = [
        "e AS MATERIALIZED (SELECT DISTINCT h AS src, t AS dst FROM idt)",
        "n AS MATERIALIZED (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        "hb0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM n)",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"ar{i} AS (SELECT n.node, COALESCE(s.v, CAST(0.0 AS DOUBLE)) AS v "
            f"FROM n LEFT JOIN (SELECT e.dst AS node, SUM(h.hub) AS v "
            f"FROM e JOIN hb{i - 1} h ON h.node = e.src GROUP BY e.dst) s "
            f"ON s.node = n.node)"
        )
        parts.append(
            f"au{i} AS MATERIALIZED (SELECT node, v / m AS auth FROM ar{i}, "
            f"(SELECT MAX(v) AS m FROM ar{i}))"
        )
        parts.append(
            f"hr{i} AS (SELECT n.node, COALESCE(s.v, CAST(0.0 AS DOUBLE)) AS v "
            f"FROM n LEFT JOIN (SELECT e.src AS node, SUM(a.auth) AS v "
            f"FROM e JOIN au{i} a ON a.node = e.dst GROUP BY e.src) s "
            f"ON s.node = n.node)"
        )
        parts.append(
            f"hb{i} AS MATERIALIZED (SELECT node, v / m AS hub FROM hr{i}, "
            f"(SELECT MAX(v) AS m FROM hr{i}))"
        )
    return (
        f"WITH {KG_BASE.strip()},\n" + ",\n".join(parts) + "\n"
        f"SELECT a.node, ROUND(a.auth, 6) AS auth, ROUND(h.hub, 6) AS hub "
        f"FROM au{rounds} a JOIN hb{rounds} h ON h.node = a.node"
    )


def kg_walks_sql(
    walks_per_node: int = 2, length: int = 5, seed: int = 628
) -> str:
    """Twin of walks.random_walks: the step recurrence unrolled one CTE
    per hop. The next-node draw is the identical md5-of-'|'-joined-key
    60-bit integer modulo out-degree, indexed into the same
    (src, idx)-keyed neighbor list (idx = per-src row_number over dst
    order), so both engines walk byte-identical sentences."""
    draw = (
        "('0x' || substr(md5('{seed}|' || CAST(w.node AS VARCHAR) || '|' "
        "|| CAST(w.walk AS VARCHAR) || '|{step}'), 1, 15))::BIGINT"
    )
    parts = [
        "e AS MATERIALIZED (SELECT DISTINCT h AS src, t AS dst FROM idt)",
        "nbr AS MATERIALIZED (SELECT src, dst, ROW_NUMBER() OVER "
        "(PARTITION BY src ORDER BY dst) - 1 AS idx FROM e)",
        "dg AS MATERIALIZED (SELECT src, COUNT(*) AS deg FROM e GROUP BY src)",
        "n AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"w0 AS (SELECT node, wk.walk, node AS cur, "
        f"CAST(node AS VARCHAR) AS sent, CAST(1 AS BIGINT) AS n_nodes "
        f"FROM n CROSS JOIN (SELECT UNNEST(range({walks_per_node})) AS walk) wk)",
    ]
    for i in range(1, length):
        k = draw.format(seed=seed, step=i)
        parts.append(
            f"w{i} AS MATERIALIZED ("
            f"SELECT w.node, w.walk, nb.dst AS cur, "
            f"CASE WHEN nb.dst IS NOT NULL THEN w.sent || ' ' || "
            f"CAST(nb.dst AS VARCHAR) ELSE w.sent END AS sent, "
            f"w.n_nodes + CASE WHEN nb.dst IS NOT NULL THEN 1 ELSE 0 END "
            f"AS n_nodes "
            f"FROM w{i - 1} w "
            f"LEFT JOIN dg ON dg.src = w.cur "
            f"LEFT JOIN nbr nb ON nb.src = w.cur "
            f"AND nb.idx = {k} % dg.deg)"
        )
    return (
        f"WITH {KG_BASE.strip()},\n" + ",\n".join(parts) + "\n"
        f"SELECT node, walk, sent, n_nodes FROM w{length - 1}"
    )


def kg_walk_pairs_sql(
    walks_per_node: int = 2,
    length: int = 5,
    seed: int = 628,
    window: int = 2,
) -> str:
    """Twin of walks.skipgram_pairs over walks.random_walks: tokenize the
    walk sentences, band self-join on position distance, count pairs."""
    return f"""
WITH w AS ({kg_walks_sql(walks_per_node, length, seed)}),
toks AS (
  SELECT node, walk, t.pos - 1 AS pos, CAST(t.tok AS BIGINT) AS tok
  FROM w, LATERAL (
    SELECT UNNEST(string_split(sent, ' ')) AS tok,
           UNNEST(generate_series(1, len(string_split(sent, ' ')))) AS pos
  ) t
)
SELECT a.tok AS center, b.tok AS context, COUNT(*) AS n_pairs
FROM toks a JOIN toks b
  ON a.node = b.node AND a.walk = b.walk
 AND a.pos <> b.pos AND ABS(a.pos - b.pos) <= {window}
GROUP BY a.tok, b.tok
"""


def kg_components_sql(rounds: int = 8) -> str:
    """Twin of graph.components (star-contraction CC, min-id labels): a
    fixed-sweep pointer-jumping min-label recurrence — each sweep takes
    the min of (own label, neighbors' labels, label-of-own-label), so the
    reachable-min horizon at least doubles per sweep and ``rounds`` = 8
    covers any component diameter up to ~2^8; integer-only, so the
    fixpoint hashes identically to the contraction result."""
    parts = [
        "e AS MATERIALIZED (SELECT DISTINCT h AS u, t AS v FROM idt WHERE h <> t)",
        "und AS MATERIALIZED ("
        "  SELECT u AS node, v AS nbr FROM e"
        "  UNION"
        "  SELECT v AS node, u AS nbr FROM e)",
        "nodes AS (SELECT h AS node FROM idt UNION SELECT t FROM idt)",
        "c0 AS (SELECT node, node AS label FROM nodes)",
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
    return (
        f"WITH {KG_BASE.strip()},\n" + ",\n".join(parts) + "\n"
        f"SELECT node, label AS component FROM c{rounds}"
    )


def kg_components_retract_sql(
    rounds: int = 8, seed: int = 11, mod: int = 8, residue: int = 3
) -> str:
    """Twin of queries.q_kg_components_retract: full-recompute CC over the
    SURVIVING edges (the deterministic md5-hash deletion subset removed)
    with the node universe taken from the FULL edge set — so nodes
    isolated by the deletions label themselves, exactly the maintained-
    table contract components_decremental implements delta-scoped."""
    hdel = (
        f"('0x' || substr(md5('{seed}|' || CAST(h AS VARCHAR) || '|' || "
        f"CAST(t AS VARCHAR)), 1, 15))::BIGINT % {mod} = {residue}"
    )
    parts = [
        "e AS MATERIALIZED ("
        f"  SELECT DISTINCT h AS u, t AS v FROM idt WHERE h <> t AND NOT ({hdel}))",
        "und AS MATERIALIZED ("
        "  SELECT u AS node, v AS nbr FROM e"
        "  UNION"
        "  SELECT v AS node, u AS nbr FROM e)",
        "nodes AS (SELECT h AS node FROM idt UNION SELECT t FROM idt)",
        "c0 AS (SELECT node, node AS label FROM nodes)",
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
    return (
        f"WITH {KG_BASE.strip()},\n" + ",\n".join(parts) + "\n"
        f"SELECT node, label AS component FROM c{rounds}"
    )


def kg_anf_sql(k: int = 16, seed: int = 0) -> str:
    """Twin of graph.anf_neighborhood_sizes(depth=2, hash_fn='md5'):
    the 2-round bottom-k recursion unrolled, same seeded md5-60bit
    member hashes, same UNION-dedup + per-node top-k per round, same
    (k-1)*2^60/h_k estimator and below-k exact fallback."""
    two60 = 1 << 60
    hu = (
        f"('0x' || substr(md5('{seed}' || CAST(node AS VARCHAR)), 1, 15))::BIGINT"
        f" % {two60}"
    )
    return f"""
WITH {KG_BASE.strip()},
e2 AS MATERIALIZED (SELECT DISTINCT h AS src, t AS dst FROM idt),
n0 AS (SELECT src AS node FROM e2 UNION SELECT dst FROM e2),
s0 AS (SELECT node, {hu} AS hu FROM n0),
u1 AS (SELECT node, hu FROM s0
       UNION SELECT e2.src AS node, s0.hu FROM e2 JOIN s0 ON s0.node = e2.dst),
s1 AS (SELECT node, hu FROM u1
       QUALIFY row_number() OVER (PARTITION BY node ORDER BY hu) <= {k}),
u2 AS (SELECT node, hu FROM s1
       UNION SELECT e2.src AS node, s1.hu FROM e2 JOIN s1 ON s1.node = e2.dst),
s2 AS (SELECT node, hu FROM u2
       QUALIFY row_number() OVER (PARTITION BY node ORDER BY hu) <= {k}),
x0 AS (SELECT node, node AS member FROM n0),
x1 AS (SELECT node, member FROM x0
       UNION SELECT e2.src AS node, x0.member FROM e2 JOIN x0 ON x0.node = e2.dst),
x2 AS (SELECT node, member FROM x1
       UNION SELECT e2.src AS node, x1.member FROM e2 JOIN x1 ON x1.node = e2.dst),
ex AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS n_exact FROM x2 GROUP BY 1),
sk AS (SELECT node, MAX(hu) AS hk, COUNT(*) AS have FROM s2 GROUP BY 1),
j AS (
  SELECT ex.node, ex.n_exact,
         ROUND(CASE WHEN sk.have < {k} THEN CAST(sk.have AS DOUBLE)
                    ELSE {float(k - 1)} * {float(two60)} / CAST(sk.hk AS DOUBLE)
               END, 6) AS est
  FROM ex JOIN sk ON ex.node = sk.node
)
SELECT node, n_exact, est,
       ROUND(ABS(est - n_exact) / n_exact, 6) AS rel_err
FROM j
"""


def kg_degree_hist_sql() -> str:
    """Twin of graph.degree_skew_profile: bucket = bit_length(deg)-1 via
    base-2 string length (exact integers; no FLOOR(LOG2()) float hazard)."""
    return f"""
WITH {KG_BASE},
degs AS (
  SELECT 'out' AS side, h AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM idt GROUP BY 1, 2
  UNION ALL
  SELECT 'in', t, CAST(COUNT(*) AS BIGINT) FROM idt GROUP BY 1, 2
)
SELECT side, CAST(length(bin(deg)) - 1 AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(deg) AS BIGINT) AS n_edges,
       CAST(MAX(deg) AS BIGINT) AS max_deg
FROM degs GROUP BY 1, 2
"""


def kg_snapshot_diff_sql(seed: int = 9) -> str:
    """Twin of queries.q_kg_snapshot_diff: same md5 60-bit triple-key
    draw (dedup.u60 contract) picking the two 90% snapshots, same
    full-outer churn counts."""
    from ttmf_spark.oracles import truth_triples_sql

    bucket = (
        f"(('0x' || substr(md5('{seed}' || s || '|' || p || '|' || o), 1, 15))::BIGINT"
        f" % {1 << 60}) % 10"
    )
    return f"""
WITH triples AS ({truth_triples_sql()}),
keyed AS (SELECT s, p, o, {bucket} AS b FROM triples),
old AS (SELECT DISTINCT s, p, o FROM keyed WHERE b <> 0),
new AS (SELECT DISTINCT s, p, o FROM keyed WHERE b <> 1),
j AS (
  SELECT COALESCE(old.p, new.p) AS p,
         (old.s IS NOT NULL) AS in_old, (new.s IS NOT NULL) AS in_new
  FROM old FULL OUTER JOIN new
    ON old.s = new.s AND old.p = new.p AND old.o = new.o
)
SELECT p,
       CAST(SUM(CASE WHEN in_old THEN 1 ELSE 0 END) AS BIGINT) AS n_old,
       CAST(SUM(CASE WHEN in_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN in_new AND NOT in_old THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN in_old AND NOT in_new THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(CASE WHEN in_old AND in_new THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM j GROUP BY p
"""


def _hxp(prefix: str, cols: str) -> str:
    """Portable 60-bit md5 hash with an arbitrary string seed prefix
    (negatives._portable_hash md5 variant with a str seed)."""
    parts = " || '|' || ".join(f"CAST({c} AS VARCHAR)" for c in cols.split(","))
    return f"('0x' || substr(md5('{prefix}' || '|' || {parts}), 1, 15))::BIGINT"


def kg_ptranse_dev_loss_sql(
    dim: int = 4,
    epochs: int = 2,
    lr: float = 0.01,
    bias: float = 7.0,
    seed: int = 42,
    pair_seed: int = 17,
    margin: float = 1.0,
    max_out: int = 1000,
    min_resource: float = 0.01,
    n_attempts: int = 8,
) -> str:
    """Twin of q_kg_ptranse_dev_loss: the DETERMINISTIC full-batch
    PTransE sweep (transe.fit_embeddings_fixed — triple terms + the
    PCRA-weighted path-composition term) unrolled one CTE-block per
    epoch, then the md5 tc-pair set scored with true-L2 energy and the
    mean hinge. Both engines run the identical float64 recurrence from
    identical hash-derived init/negatives, so values agree to ~1e-13
    and ROUND(., 6) hashes identically — the kg_pagerank_fixed
    portability contract applied to embedding TRAINING."""
    scale = 10**12
    wscale = 10**9
    c2lr = repr(2.0 * lr)
    sig = (
        "(1.0 / (1.0 + EXP(-GREATEST(LEAST({x}, 60.0), -60.0))))"
    )
    parts = [
        # PCRA path-triple table (kg_path_triples_sql body, as a CTE)
        "pe AS MATERIALIZED (SELECT DISTINCT h, r, t FROM idt)",
        "pod AS (SELECT h, r, COUNT(*) AS n FROM pe GROUP BY 1, 2)",
        f"psrc AS MATERIALIZED (SELECT pe.h, pe.r, pe.t, pod.n FROM pe "
        f"JOIN pod ON pod.h = pe.h AND pod.r = pe.r WHERE pod.n <= {max_out})",
        f"pp2 AS MATERIALIZED (SELECT a.h, a.r AS r1, b.r AS r2, b.t, "
        f"SUM({scale} // (a.n * b.n)) AS _s FROM psrc a JOIN psrc b "
        f"ON b.h = a.t GROUP BY 1, 2, 3, 4 "
        f"HAVING SUM({scale} // (a.n * b.n)) >= {int(min_resource * scale)})",
        "pz AS (SELECT h, t, SUM(_s) AS _z FROM pp2 GROUP BY 1, 2)",
        f"pw AS (SELECT pp2.h, pp2.t, pp2.r1, pp2.r2, "
        f"CAST(ROUND(CAST(pp2._s AS DOUBLE) / CAST(pz._z AS DOUBLE) "
        f"* {wscale}, 0) AS BIGINT) AS wfp "
        f"FROM pp2 JOIN pz ON pz.h = pp2.h AND pz.t = pp2.t)",
        f"pt AS MATERIALIZED (SELECT pw.r1, pw.r2, pe.r, "
        f"ROUND(CAST(SUM(pw.wfp) AS DOUBLE) / {float(wscale)}, 6) AS weight "
        f"FROM pw JOIN pe ON pe.h = pw.h AND pe.t = pw.t GROUP BY 1, 2, 3)",
        # scalars + the dim axis
        "nent AS (SELECT COUNT(*) AS c FROM ent)",
        "nrel AS (SELECT COUNT(*) AS c FROM rel)",
        f"ks AS (SELECT CAST(range AS BIGINT) AS k FROM range({dim}))",
        # hash-uniform init in [-0.5, 0.5)
        f"te0 AS MATERIALIZED (SELECT ent.id, ks.k, "
        f"(({_hxp(f'fxe{seed}', 'ent.id,ks.k')}) % 1000000) / 1e6 - 0.5 AS val "
        f"FROM ent CROSS JOIN ks)",
        f"tr0 AS MATERIALIZED (SELECT rel.id, ks.k, "
        f"(({_hxp(f'fxr{seed}', 'rel.id,ks.k')}) % 1000000) / 1e6 - 0.5 AS val "
        f"FROM rel CROSS JOIN ks)",
        # static term sets: pos + one hash-corrupted negative each
        f"tt AS MATERIALIZED ("
        f"SELECT h, r, t AS t0, 'p' AS kind, t AS tail, 1.0 AS y FROM idt "
        f"UNION ALL SELECT h, r, t, 'n', "
        f"({_hxp(f'fxnt{seed}', 'h,r,t')}) % nent.c, 0.0 FROM idt, nent)",
        f"ptm AS MATERIALIZED ("
        f"SELECT r1, r2, r AS r0, 'p' AS kind, r AS rr, 1.0 AS y, "
        f"weight AS wgt FROM pt "
        f"UNION ALL SELECT r1, r2, r, 'n', "
        f"({_hxp(f'fxnr{seed}', 'r1,r2,r')}) % nrel.c, 0.0, weight "
        f"FROM pt, nrel)",
    ]
    for i in range(1, epochs + 1):
        j = i - 1
        parts += [
            f"td{i} AS MATERIALIZED (SELECT tt.h, tt.r, tt.t0, tt.kind, "
            f"tt.tail, tt.y, ks.k, eh.val + rh.val - et.val AS d "
            f"FROM tt CROSS JOIN ks "
            f"JOIN te{j} eh ON eh.id = tt.h AND eh.k = ks.k "
            f"JOIN tr{j} rh ON rh.id = tt.r AND rh.k = ks.k "
            f"JOIN te{j} et ON et.id = tt.tail AND et.k = ks.k)",
            f"tsum{i} AS (SELECT h, r, t0, kind, SUM(d * d) AS S "
            f"FROM td{i} GROUP BY 1, 2, 3, 4)",
            f"tg{i} AS MATERIALIZED (SELECT td.h, td.r, td.t0, td.kind, "
            f"td.tail, td.k, {c2lr} * "
            f"({sig.format(x=f'{bias!r} - 0.5 * ts.S')} - td.y) * (-0.5) * td.d AS g "
            f"FROM td{i} td JOIN tsum{i} ts ON ts.h = td.h AND ts.r = td.r "
            f"AND ts.t0 = td.t0 AND ts.kind = td.kind)",
            f"pd{i} AS MATERIALIZED (SELECT ptm.r1, ptm.r2, ptm.r0, "
            f"ptm.kind, ptm.rr, ptm.y, ptm.wgt, ks.k, "
            f"ra.val + rb.val - rc.val AS d "
            f"FROM ptm CROSS JOIN ks "
            f"JOIN tr{j} ra ON ra.id = ptm.r1 AND ra.k = ks.k "
            f"JOIN tr{j} rb ON rb.id = ptm.r2 AND rb.k = ks.k "
            f"JOIN tr{j} rc ON rc.id = ptm.rr AND rc.k = ks.k)",
            f"psum{i} AS (SELECT r1, r2, r0, kind, SUM(d * d) AS S "
            f"FROM pd{i} GROUP BY 1, 2, 3, 4)",
            f"pg{i} AS MATERIALIZED (SELECT pd.r1, pd.r2, pd.r0, pd.kind, "
            f"pd.rr, pd.k, {c2lr} * pd.wgt * "
            f"({sig.format(x=f'{bias!r} - 0.5 * ps.S')} - pd.y) * (-0.5) * pd.d AS g "
            f"FROM pd{i} pd JOIN psum{i} ps ON ps.r1 = pd.r1 "
            f"AND ps.r2 = pd.r2 AND ps.r0 = pd.r0 AND ps.kind = pd.kind)",
            f"te{i} AS MATERIALIZED (SELECT b.id, b.k, "
            f"b.val - COALESCE(u.g, 0.0) AS val FROM te{j} b LEFT JOIN ("
            f"SELECT id, k, SUM(g) AS g FROM ("
            f"SELECT h AS id, k, -g AS g FROM tg{i} "
            f"UNION ALL SELECT tail AS id, k, g AS g FROM tg{i}) q "
            f"GROUP BY 1, 2) u ON u.id = b.id AND u.k = b.k)",
            f"tr{i} AS MATERIALIZED (SELECT b.id, b.k, "
            f"b.val - COALESCE(u.g, 0.0) AS val FROM tr{j} b LEFT JOIN ("
            f"SELECT id, k, SUM(g) AS g FROM ("
            f"SELECT r AS id, k, -g AS g FROM tg{i} "
            f"UNION ALL SELECT r1 AS id, k, -g AS g FROM pg{i} "
            f"UNION ALL SELECT r2 AS id, k, -g AS g FROM pg{i} "
            f"UNION ALL SELECT rr AS id, k, g AS g FROM pg{i}) q "
            f"GROUP BY 1, 2) u ON u.id = b.id AND u.k = b.k)",
        ]
    # md5 tc-pair set over the SAME idt (kg_tc_pairs_sql construction)
    def att(i: int) -> str:
        hx = _hxp(str(pair_seed + 1 + i), "nb.h,nb.r,nb.t")
        return (
            f"CASE WHEN {hx} % nent.c <> nb.h AND {hx} % nent.c <> nb.t "
            f"THEN {hx} % nent.c END"
        )

    cand = ", ".join(att(i) for i in range(n_attempts))
    parts += [
        f"nb AS (SELECT h, r, t, {_hxp(str(pair_seed), 'h,r,t')} "
        f"% {1 << 61} AS row_h FROM idt)",
        f"ncand AS (SELECT nb.h, nb.r, nb.t, nb.row_h, "
        f"(nb.row_h % 2 = 0) AS side, COALESCE({cand}, "
        f"(nb.h + 1) % nent.c) AS neg FROM nb, nent)",
        "tc AS (SELECT h, t, r, 1 AS flag, row_h * 2 AS seq FROM ncand "
        "UNION ALL SELECT CASE WHEN side THEN neg ELSE h END, "
        "CASE WHEN side THEN t ELSE neg END, r, -1, row_h * 2 + 1 FROM ncand)",
        f"en AS MATERIALIZED (SELECT tc.seq, tc.flag, "
        f"SQRT(SUM((eh.val + rh.val - et.val) * (eh.val + rh.val - et.val))) "
        f"AS energy FROM tc CROSS JOIN ks "
        f"JOIN te{epochs} eh ON eh.id = tc.h AND eh.k = ks.k "
        f"JOIN tr{epochs} rh ON rh.id = tc.r AND rh.k = ks.k "
        f"JOIN te{epochs} et ON et.id = tc.t AND et.k = ks.k "
        f"GROUP BY tc.seq, tc.flag)",
        "hp AS (SELECT seq // 2 AS kk, energy AS e_pos FROM en WHERE flag = 1)",
        "hn AS (SELECT (seq - 1) // 2 AS kk, energy AS e_neg FROM en "
        "WHERE flag = -1)",
    ]
    return (
        f"WITH {KG_AUG_BASE.strip()},\n" + ",\n".join(parts) + "\n"
        f"SELECT ROUND(AVG(GREATEST({margin!r} + e_pos - e_neg, 0.0)), 6) "
        f"AS dev_loss FROM hp JOIN hn ON hp.kk = hn.kk"
    )


def kg_crisscross_conf_sql(
    n_paths: int = 3,
    dim: int = 8,
    rnn_h: int = 8,
    rr_h: int = 8,
    bp_h: int = 4,
    steps: int = 3,
) -> str:
    """Twin of queries.q_kg_crisscross_conf — the crisscross fusion net's
    EVAL-MODE FORWARD (Model1.py:23-160 architecture: three masked
    SimpleRNN path branches -> BN -> sigmoid path values, tanh+sigmoid RR
    branch, linear Dense -> softmax head) unrolled per timestep into
    CTEs, in long (row, index, value) form: every weight, embedding and
    feature is the same md5-hash rational the Spark fixture uses, state
    updates follow the identical masked recurrence
    s_t = mask_t ? tanh(a_fix + b + x_t.Wx + s_{t-1}.Wh) : s_{t-1},
    BN runs on the init running stats (mean 0, var 1, eps 1e-3), and the
    softmax uses the same max-shift. Float reassociation (SQL SUM vs
    BLAS dot) stays ~1e-14 — far below the ROUND(conf, 6) gate, the
    kg_ptranse_dev_loss portability contract."""

    def h60(expr: str) -> str:
        return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"

    def th(expr: str) -> str:
        # DuckDB 1.0 ships no tanh(); (e^2x - 1)/(e^2x + 1) is exact to
        # ~1 ulp at the |x| <= ~5 range these activations span
        return (
            f"((exp(2.0 * ({expr})) - 1.0) / (exp(2.0 * ({expr})) + 1.0))"
        )

    hrt = (
        "CAST(h AS VARCHAR) || '|' || CAST(r AS VARCHAR) || '|' || "
        "CAST(t AS VARCHAR)"
    )

    def hseed(seed) -> str:
        return h60(f"'{seed}|' || {hrt}")

    def rat(tag2: str) -> str:  # hash rational of a fully-formed string expr
        return f"(({h60(tag2)}) % 1000) / 1000.0 - 0.5"

    def mat_cte(name: str, tag: str, n: int, m: int) -> str:
        v = rat(f"'{tag}|' || CAST(i AS VARCHAR) || '|' || CAST(j AS VARCHAR)")
        return (
            f"{name} AS MATERIALIZED (SELECT a.i, b.j, {v} AS v "
            f"FROM range({n}) a(i), range({m}) b(j))"
        )

    def vec_cte(name: str, tag: str, n: int, idx: str = "j") -> str:
        v = rat(f"'{tag}|' || CAST({idx} AS VARCHAR)")
        return f"{name} AS (SELECT {idx}, {v} AS v FROM range({n}) a({idx}))"

    inv = "(1.0 / sqrt(1.0 + 0.001))"
    parts = [
        "nn AS (SELECT COUNT(*) AS n FROM ent)",
    ]
    # features: 1/8 subset, hash transe/rr/paths (seeds match the query)
    fcols = [
        "ROW_NUMBER() OVER (ORDER BY h, r, t) AS rid", "h", "r", "t",
        f"({hseed(91)} % 1000) / 1000.0 AS transe",
    ]
    for j in range(6):
        fcols.append(f"({hseed(92 + j)} % 1000) / 1000.0 AS rr{j}")
    for k in range(1, n_paths + 1):
        fcols.append(f"({hseed(95 + k)} % 4) AS ln{k}")
        for nm_i, nm in enumerate(("h", "t", "r")):
            for i in range(steps):
                tok = (
                    f"CASE WHEN {i} < ({hseed(95 + k)} % 4) THEN "
                    f"({hseed(300 + 30 * k + 10 * nm_i + i)} % (nn.n - 1)) + 1 "
                    f"ELSE 0 END AS t{k}{nm}{i}"
                )
                fcols.append(tok)
    parts.append(
        "f AS MATERIALIZED (SELECT "
        + ", ".join(fcols)
        + f" FROM idt, nn WHERE {hseed(90)} % 8 = 0)"
    )
    # embeddings over the full entity-id range, hash rationals
    parts.append(
        "ee AS MATERIALIZED (SELECT ent.id AS id, dd.d AS d, "
        + rat("'cce|' || CAST(ent.id AS VARCHAR) || '|' || CAST(dd.d AS VARCHAR)")
        + f" AS val FROM ent, range({dim}) dd(d))"
    )
    parts.append(
        "er AS MATERIALIZED (SELECT ent.id AS id, dd.d AS d, "
        + rat("'ccr|' || CAST(ent.id AS VARCHAR) || '|' || CAST(dd.d AS VARCHAR)")
        + f" AS val FROM ent, range({dim}) dd(d))"
    )
    # fixed input block [E_h, R_r, E_t] in Wx row coordinates 0..3*dim-1
    parts.append(
        "xf AS MATERIALIZED ("
        "  SELECT f.rid, e.d AS i, e.val FROM f JOIN ee e ON e.id = f.h"
        f"  UNION ALL SELECT f.rid, {dim} + e.d, e.val FROM f JOIN er e ON e.id = f.r"
        f"  UNION ALL SELECT f.rid, {2 * dim} + e.d, e.val FROM f JOIN ee e ON e.id = f.t)"
    )
    d_in = 6 * dim
    for k in range(1, n_paths + 1):
        parts.append(mat_cte(f"wx{k}", f"ccwx{k}", d_in, rnn_h))
        parts.append(mat_cte(f"wh{k}", f"ccwh{k}", rnn_h, rnn_h))
        parts.append(vec_cte(f"wb{k}", f"ccb{k}", rnn_h))
        parts.append(vec_cte(f"g{k}", f"ccg{k}", rnn_h))
        parts.append(vec_cte(f"be{k}", f"ccbe{k}", rnn_h))
        parts.append(vec_cte(f"pw{k}", f"ccpw{k}", rnn_h))
        parts.append(
            f"af{k} AS MATERIALIZED (SELECT x.rid, w.j, SUM(x.val * w.v) AS v "
            f"FROM xf x JOIN wx{k} w ON w.i = x.i GROUP BY x.rid, w.j)"
        )
        for i in range(steps):
            parts.append(
                f"xs{k}_{i} AS MATERIALIZED ("
                f"  SELECT f.rid, {3 * dim} + e.d AS i, e.val FROM f JOIN ee e ON e.id = f.t{k}h{i}"
                f"  UNION ALL SELECT f.rid, {4 * dim} + e.d, e.val FROM f JOIN er e ON e.id = f.t{k}r{i}"
                f"  UNION ALL SELECT f.rid, {5 * dim} + e.d, e.val FROM f JOIN ee e ON e.id = f.t{k}t{i})"
            )
            parts.append(
                f"as{k}_{i} AS MATERIALIZED (SELECT x.rid, w.j, SUM(x.val * w.v) AS v "
                f"FROM xs{k}_{i} x JOIN wx{k} w ON w.i = x.i GROUP BY x.rid, w.j)"
            )
            if i == 0:
                parts.append(
                    f"s{k}_0 AS MATERIALIZED ("
                    f"  SELECT a.rid, a.j, CASE WHEN fx.ln{k} > 0 THEN "
                    f"{th('a.v + b.v + st.v')} ELSE 0.0 END AS s "
                    f"FROM af{k} a JOIN wb{k} b ON b.j = a.j "
                    f"JOIN as{k}_0 st ON st.rid = a.rid AND st.j = a.j "
                    f"JOIN f fx ON fx.rid = a.rid)"
                )
            else:
                parts.append(
                    f"rc{k}_{i} AS MATERIALIZED (SELECT s.rid, w.j, SUM(s.s * w.v) AS v "
                    f"FROM s{k}_{i - 1} s JOIN wh{k} w ON w.i = s.j GROUP BY s.rid, w.j)"
                )
                parts.append(
                    f"s{k}_{i} AS MATERIALIZED ("
                    f"  SELECT a.rid, a.j, CASE WHEN fx.ln{k} > {i} THEN "
                    f"{th('a.v + b.v + st.v + r.v')} ELSE sp.s END AS s "
                    f"FROM af{k} a JOIN wb{k} b ON b.j = a.j "
                    f"JOIN as{k}_{i} st ON st.rid = a.rid AND st.j = a.j "
                    f"JOIN rc{k}_{i} r ON r.rid = a.rid AND r.j = a.j "
                    f"JOIN s{k}_{i - 1} sp ON sp.rid = a.rid AND sp.j = a.j "
                    f"JOIN f fx ON fx.rid = a.rid)"
                )
        pvb = rat(f"'ccpb{k}'")
        parts.append(
            f"pv{k} AS MATERIALIZED (SELECT s.rid, "
            f"1.0 / (1.0 + exp(-(SUM((g.v * (s.s * {inv}) + be.v) * pw.v) + {pvb}))) AS v "
            f"FROM s{k}_{steps - 1} s JOIN g{k} g ON g.j = s.j "
            f"JOIN be{k} be ON be.j = s.j JOIN pw{k} pw ON pw.j = s.j "
            f"GROUP BY s.rid)"
        )
    # RR branch
    parts.append(mat_cte("rw1", "ccrw1", 6, rr_h))
    parts.append(vec_cte("rb1", "ccrb1", rr_h))
    parts.append(vec_cte("rw2", "ccrw2", rr_h))
    rr_case = " ".join(f"WHEN {j} THEN rr{j}" for j in range(6))
    parts.append(
        f"rrx AS (SELECT rid, ii.i, CASE ii.i {rr_case} END AS val "
        f"FROM f, range(6) ii(i))"
    )
    parts.append(
        "rrz AS MATERIALIZED (SELECT x.rid, w.j, SUM(x.val * w.v) AS v "
        "FROM rrx x JOIN rw1 w ON w.i = x.i GROUP BY x.rid, w.j)"
    )
    parts.append(
        f"rrh AS (SELECT z.rid, z.j, {th('z.v + b.v')} AS v "
        "FROM rrz z JOIN rb1 b ON b.j = z.j)"
    )
    rrb2 = rat("'ccrb2'")
    parts.append(
        f"rrv AS MATERIALIZED (SELECT t2.rid, "
        f"1.0 / (1.0 + exp(-(SUM(t2.v * w2.v) + {rrb2}))) AS v "
        f"FROM rrh t2 JOIN rw2 w2 ON w2.j = t2.j GROUP BY t2.rid)"
    )
    # fusion head
    parts.append(mat_cte("fw1", "ccfw1", 2 + n_paths, bp_h))
    parts.append(vec_cte("fb1", "ccfb1", bp_h))
    parts.append(mat_cte("fw2", "ccfw2", bp_h, 2))
    parts.append(vec_cte("fb2", "ccfb2", 2, idx="c"))
    pv_sel = " ".join(
        f"UNION ALL SELECT rid, {k - 1}, v FROM pv{k}"
        for k in range(2, n_paths + 1)
    )
    parts.append(
        "bpin AS (SELECT rid, 0 AS i, v FROM pv1 "
        + pv_sel
        + f" UNION ALL SELECT rid, {n_paths}, transe FROM f"
        + f" UNION ALL SELECT rid, {n_paths + 1}, v FROM rrv)"
    )
    parts.append(
        "z1 AS MATERIALIZED (SELECT x.rid, w.j, SUM(x.v * w.v) AS v "
        "FROM bpin x JOIN fw1 w ON w.i = x.i GROUP BY x.rid, w.j)"
    )
    parts.append(
        "z1b AS (SELECT z.rid, z.j, z.v + b.v AS v "
        "FROM z1 z JOIN fb1 b ON b.j = z.j)"
    )
    parts.append(
        "lg AS (SELECT z.rid, w.j AS c, SUM(z.v * w.v) AS v "
        "FROM z1b z JOIN fw2 w ON w.i = z.j GROUP BY z.rid, w.j)"
    )
    parts.append(
        "lgb AS (SELECT l.rid, l.c, l.v + b.v AS v "
        "FROM lg l JOIN fb2 b ON b.c = l.c)"
    )
    parts.append(
        "wide AS (SELECT rid, MAX(CASE WHEN c = 0 THEN v END) AS l0, "
        "MAX(CASE WHEN c = 1 THEN v END) AS l1 FROM lgb GROUP BY rid)"
    )
    parts.append(
        "cf AS (SELECT rid, exp(l1 - GREATEST(l0, l1)) / "
        "(exp(l0 - GREATEST(l0, l1)) + exp(l1 - GREATEST(l0, l1))) AS conf "
        "FROM wide)"
    )
    return (
        f"WITH {KG_BASE.strip()},\n"
        + ",\n".join(parts)
        + "\nSELECT f.h, f.r, f.t, ROUND(cf.conf, 6) AS conf "
        "FROM f JOIN cf ON cf.rid = f.rid"
    )
