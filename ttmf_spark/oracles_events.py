"""DuckDB oracle SQL for the event-stream operators (datapipe.events)
over the driver `events` view.

Cross-engine exactness contract (mirrors events.py): value sums are
aggregated in DECIMAL(18,2) (order-free) and cast to DOUBLE only at the
very end (the same decimal converts to the same nearest double in both
engines); window bucketing and session bounds use second-truncated epoch built
from date/time components (timezone-free on TIMESTAMP_NTZ in both engines);
within-user ordering is by raw microsecond ts with event_id tiebreak.
"""

from __future__ import annotations

_E = """
e AS (
  SELECT event_id, user_id, event_type, ts, props,
         CAST(date_diff('day', DATE '1970-01-01', ts::DATE) AS BIGINT) * 86400
           + date_part('hour', ts) * 3600 + date_part('minute', ts) * 60
           + date_part('second', ts) AS sec,
         CAST(value AS DECIMAL(18,2)) AS val
  FROM events
)
"""


def evt_sessions_sql(gap_minutes: int = 30) -> str:
    gap_s = gap_minutes * 60
    return f"""
WITH {_E.strip()},
f AS (
  SELECT *, CASE WHEN lag(sec) OVER w IS NULL
                   OR sec - lag(sec) OVER w > {gap_s} THEN 1 ELSE 0 END AS nw
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT *, SUM(nw) OVER (
    PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING
  ) AS session_seq FROM f
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       COUNT(*) AS n_events, MIN(sec) AS start_s, MAX(sec) AS end_s,
       CAST(SUM(val) AS DOUBLE) AS total_value
FROM s GROUP BY user_id, session_seq
"""


def evt_windowed_sql(width_minutes: int = 60) -> str:
    width_s = width_minutes * 60
    return f"""
WITH {_E.strip()}
SELECT CAST(floor(sec / {width_s}) * {width_s} AS BIGINT) AS window_start_s,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(val) AS DOUBLE) AS total_value
FROM e GROUP BY 1, 2
"""


def evt_json_stats_sql(field: str = "k") -> str:
    return f"""
SELECT event_type,
       COUNT(CAST(json_extract_string(props, '$.{field}') AS BIGINT)) AS n_with_field,
       CAST(SUM(CAST(json_extract_string(props, '$.{field}') AS BIGINT)) AS DOUBLE) AS sum_field
FROM events GROUP BY event_type
"""


def evt_funnel_sql(
    step_a: str = "signup", step_b: str = "purchase", horizon_minutes: int = 1440
) -> str:
    """Twin of events.funnel_conversion."""
    return f"""
WITH e AS (
  SELECT user_id, event_type,
         (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 86400
          + hour(ts) * 3600 + minute(ts) * 60 + second(ts))::BIGINT AS s
  FROM events
),
fa AS (SELECT user_id, MIN(s) AS t_a FROM e WHERE event_type = '{step_a}' GROUP BY 1),
fb AS (
  SELECT fa.user_id, MIN(e.s) AS t_b
  FROM fa JOIN e ON e.user_id = fa.user_id
  WHERE e.event_type = '{step_b}' AND e.s >= fa.t_a
  GROUP BY 1
)
SELECT fa.user_id, fa.t_a, fb.t_b,
       (fb.t_b IS NOT NULL AND fb.t_b - fa.t_a <= {horizon_minutes * 60}) AS converted
FROM fa LEFT JOIN fb ON fb.user_id = fa.user_id
"""


def evt_retention_sql(bucket_days: int = 7) -> str:
    """Twin of events.retention_cohorts."""
    width = bucket_days * 86400
    return f"""
WITH e AS (
  SELECT user_id,
         (datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) * 86400
          + hour(ts) * 3600 + minute(ts) * 60 + second(ts))::BIGINT AS s
  FROM events
),
b AS (SELECT user_id, (s - (s % {width}))::BIGINT AS bucket FROM e),
cohort AS (SELECT user_id, MIN(bucket) AS cohort_start_s FROM b GROUP BY 1),
active AS (SELECT DISTINCT user_id, bucket FROM b)
SELECT c.cohort_start_s,
       CAST((a.bucket - c.cohort_start_s) / {width} AS INT) AS bucket_offset,
       COUNT(DISTINCT a.user_id) AS n_users
FROM active a JOIN cohort c ON c.user_id = a.user_id
GROUP BY 1, 2
"""


def evt_anomaly_sql(z_cut: float = 3.0) -> str:
    """Twin of events.value_anomalies: per-type sample mean/stddev,
    |rounded z| > z_cut outliers."""
    return f"""
WITH stats AS (
  SELECT event_type, AVG(value) AS mu, STDDEV_SAMP(value) AS sd
  FROM events GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       ROUND((e.value - s.mu) / s.sd, 6) AS z
FROM events e JOIN stats s ON s.event_type = e.event_type
WHERE s.sd > 0 AND ABS(ROUND((e.value - s.mu) / s.sd, 6)) > {z_cut}
"""


def evt_cms_counts_sql(width: int = 8, depth: int = 3, seed: int = 0) -> str:
    """Twin of sketch.cms_counts(hash_fn='md5'): same per-row salted
    cells, same exact-integer counters, same min-over-depth estimate."""

    def _h(d: int, expr: str) -> str:
        return (
            f"('0x' || substr(md5('{seed + d}' || {expr}), 1, 15))::BIGINT"
        )

    two60 = 1 << 60
    ev_branches = " UNION ALL ".join(
        f"SELECT {d} AS d, CAST(({_h(d, 'CAST(user_id AS VARCHAR)')} % {two60})"
        f" % {width} AS INT) AS cell FROM events"
        for d in range(depth)
    )
    key_branches = " UNION ALL ".join(
        f"SELECT user_id, n_exact, {d} AS d,"
        f" CAST(({_h(d, 'CAST(user_id AS VARCHAR)')} % {two60}) % {width} AS INT)"
        f" AS cell FROM keys"
        for d in range(depth)
    )
    return f"""
WITH cells AS (
  SELECT d, cell, CAST(COUNT(*) AS BIGINT) AS c FROM ({ev_branches}) GROUP BY d, cell
),
keys AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact FROM events GROUP BY user_id),
kc AS ({key_branches})
SELECT kc.user_id, kc.n_exact, MIN(cells.c) AS est, MIN(cells.c) - kc.n_exact AS overcount
FROM kc JOIN cells ON cells.d = kc.d AND cells.cell = kc.cell
GROUP BY kc.user_id, kc.n_exact
"""


def evt_heavy_hitters_sql(
    phi_num: int = 1,
    phi_den: int = 125,
    width: int = 256,
    depth: int = 3,
    seed: int = 0,
) -> str:
    """Twin of sketch.cms_heavy_hitters(hash_fn='md5'): the cms_counts
    twin as a subquery, exact-integer phi threshold on both sides."""
    return f"""
WITH cms AS ({evt_cms_counts_sql(width=width, depth=depth, seed=seed)}),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM events)
SELECT cms.user_id, cms.n_exact, cms.est,
       (cms.n_exact * {phi_den} >= {phi_num} * tot.n) AS is_true_hh
FROM cms, tot
WHERE cms.est * {phi_den} >= {phi_num} * tot.n
"""
