"""Event-stream operators over `events(event_id, ts, user_id, event_type,
value, props)` — sessionization, windowed aggregation, JSON extraction.

The reference is pure batch KG code; these are the event-side operators a
large-scale training-data pipeline needs, built Spark-first:

- ``sessionize``: gap-based sessions per user. One hash shuffle on
  user_id (window partitionBy — never a global window); the classic
  lag -> new-session flag -> running-sum pattern, then a per-session
  aggregate. At 100 TB this is the canonical "sessionize clickstream"
  shape: partition count follows shuffle.partitions, per-user state is
  bounded by that user's events, and hot users are AQE-splittable
  because the session aggregate is a groupBy (partial map-side combine),
  not a window.
- ``windowed_counts``: tumbling-window counts/sums per event_type.
  Pure column math + groupBy — JVM codegen end to end.
- ``json_props_stats``: per-type aggregates of a JSON payload field
  (``get_json_object`` stays in the JVM; no Python).

Exactness for the DuckDB oracles: money-ish ``value`` sums are done in
DECIMAL(18,2) (order-free exact addition — float sums depend on
partition order), counts/JSON sums are integers, and window bucketing
uses second-truncated epoch derived from date/time COMPONENTS in BOTH
engines (timezone-free; see _epoch_sec). Event ordering inside a
user uses the raw microsecond timestamp with event_id as tiebreaker.

Streaming twin: ``sessionize`` state is per-user and gap-bounded, so the
structured-streaming version is `applyInPandasWithState` keyed by
user_id with a session timeout; ``windowed_counts`` maps 1:1 onto
`groupBy(window(ts, ...))` + watermark. The batch forms below are the
oracle-checkable semantics those streaming jobs must reproduce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def _epoch_sec(col: str = "ts"):
    """Second-truncated epoch from date/time COMPONENTS — timezone-free on
    TIMESTAMP_NTZ (a direct cast to long is illegal in Spark 4, and
    unix_timestamp() would shift with the session timezone; component
    extraction is identical in every engine)."""
    c = F.col(col)
    return (
        F.datediff(F.to_date(c), F.lit("1970-01-01")).cast("long") * 86400
        + F.hour(c) * 3600
        + F.minute(c) * 60
        + F.second(c)
    )


def sessionize(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Gap-based sessions: a new session starts when a user's inter-event
    gap exceeds ``gap_minutes``. Returns one row per session:
    (user_id, session_seq, n_events, start_s, end_s, total_value).

    start_s/end_s are second-truncated epochs (cross-engine exact);
    total_value is summed in DECIMAL (order-free exact) then cast to
    double at the end (identical nearest-double in every engine).
    """
    gap_s = gap_minutes * 60
    sec = _epoch_sec()
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = events.withColumn("_sec", sec).withColumn(
        "_new",
        F.when(
            F.lag("_sec").over(w).isNull()
            | ((F.col("_sec") - F.lag("_sec").over(w)) > gap_s),
            1,
        ).otherwise(0),
    )
    sessed = flagged.withColumn(
        "session_seq",
        F.sum("_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sessed.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        F.min("_sec").alias("start_s"),
        F.max("_sec").alias("end_s"),
        F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
    )


def windowed_counts(events: DataFrame, width_minutes: int = 60) -> DataFrame:
    """Tumbling-window aggregate: (window_start_s, event_type, n_events,
    total_value). Bucketing = floor(epoch_seconds / width) — identical
    arithmetic in any engine; the streaming twin is
    groupBy(window(ts, width)) + watermark."""
    width_s = width_minutes * 60
    bucket = F.floor(_epoch_sec() / width_s)
    return (
        events.withColumn("window_start_s", (bucket * width_s).cast("long"))
        .groupBy("window_start_s", "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum(F.col("value").cast(DEC)).cast("double").alias("total_value"),
        )
    )


def json_props_stats(events: DataFrame, field: str = "k") -> DataFrame:
    """Per-event-type stats of an integer JSON payload field:
    (event_type, n_with_field, sum_field). get_json_object is JVM-side;
    missing/non-numeric fields are ignored (NULL after cast)."""
    v = F.get_json_object(F.col("props"), f"$.{field}").cast("long")
    return (
        events.withColumn("_v", v)
        .groupBy("event_type")
        .agg(
            F.count("_v").alias("n_with_field"),
            F.sum("_v").cast("double").alias("sum_field"),
        )
    )


def funnel_conversion(
    events: DataFrame,
    step_a: str = "signup",
    step_b: str = "purchase",
    horizon_minutes: int = 1440,
) -> DataFrame:
    """Two-step funnel: for every user with at least one ``step_a`` event,
    the first step_a time, the first ``step_b`` time at-or-after it, and
    whether that conversion landed within ``horizon_minutes`` — the
    product-analytics query every event pipeline answers.

    Shape: two filtered min-aggregations per user (map-side combinable)
    joined at user granularity — the B side aggregates the min-B-per-user
    CONDITIONED on A via one equi-join on user_id then min(ts_b >= ts_a);
    no window over raw events, no per-event shuffle beyond the two aggs.
    Timestamps as component-derived epoch seconds (engine-portable).
    """
    e = events.select("user_id", "event_type", _epoch_sec().alias("s"))
    first_a = (
        e.filter(F.col("event_type") == step_a)
        .groupBy("user_id")
        .agg(F.min("s").alias("t_a"))
    )
    b = e.filter(F.col("event_type") == step_b).select("user_id", F.col("s").alias("_tb"))
    first_b_after = (
        first_a.join(b, "user_id")
        .filter(F.col("_tb") >= F.col("t_a"))
        .groupBy("user_id", "t_a")
        .agg(F.min("_tb").alias("t_b"))
    )
    out = first_a.join(first_b_after.select("user_id", "t_b"), "user_id", "left")
    return out.select(
        "user_id",
        "t_a",
        "t_b",
        (
            F.col("t_b").isNotNull()
            & (F.col("t_b") - F.col("t_a") <= horizon_minutes * 60)
        ).alias("converted"),
    )


def retention_cohorts(events: DataFrame, bucket_days: int = 7) -> DataFrame:
    """Cohort retention matrix: users grouped by the bucket (default
    week) of their FIRST event; for every later bucket, how many of the
    cohort were active — (cohort_start_s, bucket_offset, n_users). The
    second canonical product-analytics query next to funnel_conversion.

    Shape: one min-agg per user (map-side combinable) for the cohort,
    one distinct over (user, bucket) for activity, one broadcast-sized
    join back on user_id, one final count agg. Buckets are integer
    epoch-seconds arithmetic — engine-portable, no session-timezone
    dependence.
    """
    width = bucket_days * 86400
    e = events.select("user_id", _epoch_sec().alias("s")).withColumn(
        "bucket", (F.col("s") - F.pmod(F.col("s"), width)).cast("long")
    )
    cohort = e.groupBy("user_id").agg(F.min("bucket").alias("cohort_start_s"))
    active = e.select("user_id", "bucket").distinct()
    return (
        active.join(cohort, "user_id")
        .select(
            "cohort_start_s",
            ((F.col("bucket") - F.col("cohort_start_s")) / width)
            .cast("int")
            .alias("bucket_offset"),
            "user_id",
        )
        .groupBy("cohort_start_s", "bucket_offset")
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def value_anomalies(events: DataFrame, z_cut: float = 3.0) -> DataFrame:
    """Per-event-type z-score outliers: events whose |value - mean| exceeds
    ``z_cut`` sample standard deviations of their type — the stream QA
    pass that flags instrumentation bugs (unit changes, overflow spikes)
    before aggregate features are trusted. Emits (event_id, event_type,
    value, z) with z rounded to 6; types with fewer than 2 events or zero
    variance emit nothing (z undefined).

    Scale shape: one map-side-combinable (avg, stddev) aggregation over
    the scan — the per-type stats table is dim-sized (one row per event
    type) and broadcast back onto the stream, so the event table is read
    once and never shuffled. The same shape holds under Structured
    Streaming as a windowed aggregate + stream-static join.
    """
    stats = events.groupBy("event_type").agg(
        F.avg("value").alias("_mu"), F.stddev_samp("value").alias("_sd")
    )
    z = F.round((F.col("value") - F.col("_mu")) / F.col("_sd"), 6)
    return (
        events.join(F.broadcast(stats), "event_type")
        .filter(F.col("_sd") > 0)
        .withColumn("z", z)
        .filter(F.abs(F.col("z")) > z_cut)
        .select("event_id", "event_type", "value", "z")
    )
