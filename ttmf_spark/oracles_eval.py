"""DuckDB oracle SQL for the scoring/evaluation layer (SURVEY.md §2.8-2.9).

These mirror the hash-derived fixtures in ttmf_spark.queries
(q_kg_kgc_candidates, q_kg_link_prediction, ...): the portable md5-60bit
hash is byte-identical in both engines, so the REAL Spark evaluation /
fusion operators are value-compared against plain relational SQL.

Seeds/shape must stay in lockstep with queries.py:
  test split 11 (mod 5), kgc fills 23..27, lp fills 100..149, lp conf 7,
  pair flag 3, pair conf 5, fusion features 21..27 / 31-33 / 41-43 /
  51-53, fusion weights (i+1)/10, bias 1.7.
"""

from __future__ import annotations

from ttmf_spark.oracles_kg import KG_BASE


def _hx(seed: int, cols: str) -> str:
    """Portable 60-bit md5 hash of '|'-joined columns (Spark queries._h)."""
    parts = " || '|' || ".join(c for c in cols.split(","))
    return f"('0x' || substr(md5('{seed}' || '|' || {parts}), 1, 15))::BIGINT"


_TEST = f"test AS (SELECT h, r, t FROM idt WHERE {_hx(11, 'h,r,t')} % 5 = 0)"
_N = "n AS (SELECT COUNT(*) AS c FROM ent)"


def kg_kgc_candidates_sql(incorrect_count: int = 5, seed: int = 23) -> str:
    fills = "\nUNION ALL ".join(
        f"SELECT f.h, {_hx(seed + i, 'f.h,f.r')} % n.c AS t, f.r FROM firsts f, n"
        for i in range(incorrect_count)
    )
    return f"""
WITH {KG_BASE.strip()},
{_TEST},
firsts AS (SELECT h, r, MIN(t) AS t FROM test GROUP BY h, r),
{_N}
SELECT h, t, r, 1 AS flag FROM (
{fills}
UNION ALL SELECT h, t, r FROM firsts
) cand
"""


_LP_FILLS = 50


def _lp_ranked() -> str:
    fills = "\nUNION ALL ".join(
        f"SELECT q.h, q.r, q.t_true, {_hx(100 + i, 'q.h,q.r')} % n.c AS t FROM qs q, n"
        for i in range(_LP_FILLS)
    )
    return f"""
{_TEST},
qs AS (SELECT h, r, MIN(t) AS t_true FROM test GROUP BY h, r),
{_N},
cand AS (SELECT DISTINCT h, r, t_true, t FROM (
{fills}
UNION ALL SELECT h, r, t_true, t_true AS t FROM qs
) f),
scored AS (
  SELECT h, r, t, (t = t_true) AS is_true,
         ({_hx(7, 'h,r,t')} % 1000000) / 1e6 AS conf
  FROM cand
),
filtered AS (
  SELECT s.* FROM scored s
  LEFT JOIN (SELECT DISTINCT h, r, t FROM idt) g
    ON s.h = g.h AND s.r = g.r AND s.t = g.t
  WHERE s.is_true OR g.h IS NULL
),
ranked AS (
  SELECT h, r, is_true,
         ROW_NUMBER() OVER (PARTITION BY h, r ORDER BY conf DESC, t ASC) AS rnk
  FROM filtered
)
"""


def kg_link_prediction_sql() -> str:
    return (
        f"WITH {KG_BASE.strip()},\n{_lp_ranked().strip()}\n"
        'SELECT h, r, rnk AS "rank" FROM ranked WHERE is_true'
    )


def kg_rank_metrics_sql() -> str:
    return f"""
WITH {KG_BASE.strip()},
{_lp_ranked().strip()}
SELECT
  ROUND(AVG(CASE WHEN rnk <= 1 THEN 1.0 ELSE 0.0 END), 6) AS hits1,
  ROUND(AVG(CASE WHEN rnk <= 10 THEN 1.0 ELSE 0.0 END), 6) AS hits10,
  ROUND(AVG(CAST(rnk AS DOUBLE)), 6) AS mean_rank,
  ROUND(AVG(1.0 / rnk), 6) AS mrr
FROM ranked WHERE is_true
"""


_PAIRS = f"""
pairs AS (
  SELECT h, r, t,
         CASE WHEN {_hx(3, 'h,r,t')} % 2 = 0 THEN 1 ELSE -1 END AS flag,
         ({_hx(5, 'h,r,t')} % 1000000) / 1e6 AS conf
  FROM idt
)
"""


def kg_accuracy_sql() -> str:
    return f"""
WITH {KG_BASE.strip()},
{_PAIRS.strip()}
SELECT ROUND(AVG(CASE WHEN (conf >= 0.5 AND flag = 1)
                        OR (conf < 0.5 AND flag = -1)
                      THEN 1.0 ELSE 0.0 END), 6) AS accuracy,
       COUNT(*) AS n
FROM pairs
"""


def kg_pr_sweep_sql() -> str:
    p = "(tp / (pred_pos + 0.00001))"
    r = "(tp / (pos + 0.00001))"
    return f"""
WITH {KG_BASE.strip()},
{_PAIRS.strip()},
th AS (SELECT ROUND(0.01 + i * 0.02, 6) AS threshold FROM range(50) tbl(i)),
agg AS (
  SELECT threshold,
         SUM(CASE WHEN conf >= threshold AND flag = 1 THEN 1.0 ELSE 0.0 END) AS tp,
         SUM(CASE WHEN conf >= threshold THEN 1.0 ELSE 0.0 END) AS pred_pos,
         SUM(CASE WHEN flag = 1 THEN 1.0 ELSE 0.0 END) AS pos
  FROM pairs CROSS JOIN th GROUP BY threshold
)
SELECT ROUND(threshold, 6) AS threshold,
       ROUND({p}, 6) AS "precision",
       ROUND({r}, 6) AS recall,
       ROUND(2 * {p} * {r} / ({p} + {r} + 0.00001), 6) AS f1
FROM agg
"""


# fusion feature expressions (seeds in lockstep with queries._fusion_features)
def _feats() -> str:
    rr = ",\n         ".join(
        f"({_hx(22 + j, 'h,r,t')} % 1000) / 1000.0 AS rr{j + 1}" for j in range(6)
    )
    pk = ",\n         ".join(
        f"({_hx(30 + k, 'h,r,t')} % 1000) / 1000.0 AS p{k}s,\n"
        f"         CAST({_hx(40 + k, 'h,r,t')} % 4 AS DOUBLE) AS p{k}l,\n"
        f"         ({_hx(50 + k, 'h,r,t')} % 1000) / 1000.0 AS p{k}a"
        for k in (1, 2, 3)
    )
    return f"""
feats AS (
  SELECT h, r, t,
         ({_hx(21, 'h,r,t')} % 1000) / 1000.0 AS tc,
         {rr},
         {pk}
  FROM idt
)
"""


# z in EXACT feature_matrix order:
# trans_conf, rr(6), (score, len, align) x3, bias
_Z = (
    "0.1*tc + 0.2*rr1 + 0.3*rr2 + 0.4*rr3 + 0.5*rr4 + 0.6*rr5 + 0.7*rr6"
    " + 0.8*p1s + 0.9*p1l + 1.0*p1a + 1.1*p2s + 1.2*p2l + 1.3*p2a"
    " + 1.4*p3s + 1.5*p3l + 1.6*p3a + 1.7"
)


def kg_fusion_conf_sql() -> str:
    return f"""
WITH {KG_BASE.strip()},
{_feats().strip()}
SELECT h, r, t, ROUND(1.0 / (1.0 + exp(-({_Z}))), 6) AS conf FROM feats
"""


def kg_lowest_conf_sql(k: int = 100, theta: float = 0.9999) -> str:
    return f"""
WITH {KG_BASE.strip()},
{_feats().strip()},
scored AS (
  SELECT h, r, t, ROUND(1.0 / (1.0 + exp(-({_Z}))), 6) AS conf FROM feats
)
SELECT h, r, t, conf FROM scored WHERE conf < {theta}
ORDER BY conf, h, r, t LIMIT {k}
"""


def kg_tc_pairs_sql(seed: int = 17, n_attempts: int = 8) -> str:
    """N1 pos/neg pairs (negatives.tc_pairs_ids md5 variant): the draw is
    pure hash arithmetic, so the oracle is the same expressions in SQL."""
    def att(i: int) -> str:
        hx = _hx(seed + 1 + i, "b.h,b.r,b.t")
        return f"CASE WHEN {hx} % n.c <> b.h AND {hx} % n.c <> b.t THEN {hx} % n.c END"

    cand = ",\n    ".join(att(i) for i in range(n_attempts))
    return f"""
WITH {KG_BASE.strip()},
{_N},
b AS (
  SELECT h, r, t, {_hx(seed, 'h,r,t')} % 2305843009213693952 AS row_h
  FROM idt
),
c AS (
  SELECT b.h, b.r, b.t, b.row_h,
    (b.row_h % 2 = 0) AS side,
    COALESCE(
    {cand},
    (b.h + 1) % n.c) AS neg
  FROM b, n
)
SELECT h, t, r, 1 AS flag, row_h * 2 AS seq FROM c
UNION ALL
SELECT CASE WHEN side THEN neg ELSE h END AS h,
       CASE WHEN side THEN t ELSE neg END AS t,
       r, -1 AS flag, row_h * 2 + 1 AS seq
FROM c
"""


def kg_dev_loss_sql(seed: int = 17, energy_seed: int = 19, margin: float = 1.0) -> str:
    """Twin of q_kg_dev_loss: the tc-pair set with md5-derived energies,
    pos 2k / neg 2k+1 self-join, mean hinge (transe.dev_hinge_loss)."""
    return f"""
WITH tc AS ({kg_tc_pairs_sql(seed)}),
en AS (
  SELECT seq, flag,
         (({_hx(energy_seed, 'h,r,t,flag')} % 1000000) / 1e6) * 2.0 AS energy
  FROM tc
),
pos AS (SELECT seq // 2 AS k, energy AS e_pos FROM en WHERE flag = 1),
neg AS (SELECT (seq - 1) // 2 AS k, energy AS e_neg FROM en WHERE flag = -1)
SELECT ROUND(AVG(GREATEST({margin} + e_pos - e_neg, 0.0)), 6) AS dev_loss
FROM pos JOIN neg USING (k)
"""


def kg_calibration_sql(n_bins: int = 10) -> str:
    """Twin of evaluate.calibration_table over the md5-fixture labeled
    pairs (same conf/flag construction as kg_accuracy/kg_pr_sweep)."""
    conf = f"(({_hx(5, 'h,r,t')} % 1000000) / 1e6)"
    flag = f"(CASE WHEN {_hx(3, 'h,r,t')} % 2 = 0 THEN 1 ELSE -1 END)"
    return f"""
WITH {KG_BASE.strip()},
lp AS (SELECT {conf} AS conf, {flag} AS flag FROM idt),
binned AS (
  SELECT LEAST(CAST(FLOOR(conf * {n_bins}) AS INT), {n_bins - 1}) AS bin,
         conf, flag
  FROM lp
)
SELECT bin, COUNT(*) AS n,
       CAST(SUM(CASE WHEN flag = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
       ROUND(AVG(conf), 6) AS mean_conf,
       ROUND(AVG(CASE WHEN flag = 1 THEN 1.0 ELSE 0.0 END), 6) AS pos_rate
FROM binned GROUP BY bin
"""


def kg_rank_metrics_by_cat_sql() -> str:
    """Twin of queries.q_kg_rank_metrics_by_cat: the filtered-rank CTE
    joined to the Bordes category table (nested relation-profile twin),
    same per-category W4 metrics."""
    return f"""
WITH {KG_BASE.strip()},
{_lp_ranked().strip()},
cat AS MATERIALIZED (
  SELECT tphs.r,
         CASE WHEN tph < 1.5 AND hpt < 1.5 THEN '1-1'
              WHEN tph >= 1.5 AND hpt < 1.5 THEN '1-N'
              WHEN tph < 1.5 AND hpt >= 1.5 THEN 'N-1'
              ELSE 'N-N' END AS category
  FROM (SELECT r, ROUND(AVG(_n), 6) AS tph
        FROM (SELECT r, h, COUNT(*) AS _n FROM idt GROUP BY r, h) GROUP BY r) tphs
  JOIN (SELECT r, ROUND(AVG(_n), 6) AS hpt
        FROM (SELECT r, t, COUNT(*) AS _n FROM idt GROUP BY r, t) GROUP BY r) hpts
    ON tphs.r = hpts.r
)
SELECT c.category,
       CAST(COUNT(*) AS BIGINT) AS n_queries,
       ROUND(AVG(CASE WHEN rnk <= 1 THEN 1.0 ELSE 0.0 END), 6) AS hits1,
       ROUND(AVG(CASE WHEN rnk <= 10 THEN 1.0 ELSE 0.0 END), 6) AS hits10,
       ROUND(AVG(CAST(rnk AS DOUBLE)), 6) AS mean_rank,
       ROUND(AVG(1.0 / rnk), 6) AS mrr
FROM ranked JOIN cat c ON ranked.r = c.r
WHERE is_true
GROUP BY c.category
"""
