"""Event-stream analytics over the ``events`` table (batch side).

The reference approximates streaming with event-driven micro-batches
(SURVEY.md §2.9); this module provides the batch analytics the streaming
wrapper (``streaming/``) mirrors: time-bucketed rollups, JSON property
extraction, and gap-based sessionization (lag/lead windows — an operator
class the reference lacks but any event pipeline needs).

All event-time columns come from integer microsecond arithmetic
(``datalake.load_events``) — no timezone dependence anywhere.

Scale notes:

- rollups are single-shuffle hash aggregations on low-cardinality keys;
- sessionization shuffles once on ``user_id`` and sorts within partitions
  — the canonical distributed pattern; skewed power-users are handled by
  AQE skew-split since each user's events still fit one task comfortably;
- JSON extraction uses ``get_json_object`` (JVM-side, codegen) — not a
  Python UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.functions import money_avg, money_sum

DEFAULT_SESSION_GAP_MINUTES = 30


def enrich_events(events: DataFrame) -> DataFrame:
    """Typed JSON property extraction + value bucketing (P-class ops)."""
    return events.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        "event_date",
        "event_hour",
        F.col("value").cast("double").alias("value"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
        F.when(F.col("value") < 10.0, "LOW")
        .when(F.col("value") < 100.0, "MEDIUM")
        .otherwise("HIGH")
        .alias("value_bucket"),
        (F.col("event_type") == "error").alias("is_error"),
        (F.col("event_type") == "purchase").alias("is_purchase"),
    )


def hourly_event_summary(events: DataFrame) -> DataFrame:
    """Tumbling-hour rollup (streaming twin: 1h window aggregation)."""
    return (
        events.groupBy("event_date", "event_hour")
        .agg(
            F.count("*").alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            money_sum("value", "total_value"),
            money_avg("value", "avg_value"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("error_count"),
        )
        .withColumn("error_rate_pct", F.col("error_count") / F.col("event_count") * 100.0)
        .orderBy("event_date", "event_hour")
    )


def sliding_window_summary(
    events: DataFrame, width_minutes: int = 60, slide_minutes: int = 30
) -> DataFrame:
    """Overlapping sliding-window rollup (the streaming
    ``F.window(ts, width, slide)`` operator in batch form).

    Each event belongs to ``width/slide`` windows; the expansion is a
    JVM-side ``explode(sequence(...))`` — exactly how Spark's own window
    operator expands rows — followed by one hash aggregation on the
    window start. Boundaries come from integer microsecond arithmetic,
    so results are timezone-free and identical in any engine.
    """
    if width_minutes % slide_minutes:
        raise ValueError("width must be a multiple of slide")
    width_us = width_minutes * 60 * 1_000_000
    slide_us = slide_minutes * 60 * 1_000_000
    ratio = width_minutes // slide_minutes
    expanded = events.withColumn("k", F.explode(F.sequence(F.lit(0), F.lit(ratio - 1)))).withColumn(
        "window_start_us",
        (F.expr(f"ts_us div {slide_us}") - F.col("k")) * F.lit(slide_us),
    )
    return (
        expanded.groupBy("window_start_us")
        .agg(
            F.count("*").alias("event_count"),
            F.countDistinct("user_id").alias("unique_users"),
            money_sum("value", "total_value"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("error_count"),
        )
        .withColumn("window_end_us", F.col("window_start_us") + F.lit(width_us))
        .select(
            "window_start_us",
            "window_end_us",
            "event_count",
            "unique_users",
            "total_value",
            "error_count",
        )
        .orderBy("window_start_us")
    )


def error_context(events: DataFrame, window_minutes: int = 5) -> DataFrame:
    """Per-error activity context: for each ``error`` event, the count and
    value of the same user's events in the trailing ``window_minutes``
    (a time-range self-join, expressed as a **range-frame window** —
    ``rangeBetween`` on integer microseconds — so it costs one shuffle on
    ``user_id`` instead of an interval join; RANGE frames include
    equal-timestamp peers identically in any engine).
    """
    us = window_minutes * 60_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us").rangeBetween(-us, Window.currentRow)
    base = events.select(
        "event_id", "user_id", "ts_us", "event_type", F.col("value").cast("double").alias("value")
    )
    ctx = base.withColumn(
        "trailing_events", (F.count(F.lit(1)).over(w) - 1).cast("long")
    ).withColumn(
        "trailing_value",
        F.sum(F.col("value").cast("decimal(27,2)")).over(w).cast("double") - F.col("value"),
    )
    return (
        ctx.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ts_us", "trailing_events", "trailing_value")
        .orderBy("event_id")
    )


def event_type_summary(events: DataFrame) -> DataFrame:
    """Per-type rollup with share-of-total (A6-style decimal window total)."""
    agg = events.groupBy("event_type").agg(
        F.count("*").alias("event_count"),
        F.countDistinct("user_id").alias("unique_users"),
        money_sum("value", "total_value"),
        money_avg("value", "avg_value"),
    )
    total_w = Window.partitionBy()
    return agg.withColumn(
        "event_share_pct",
        F.col("event_count") / F.sum("event_count").over(total_w) * 100.0,
    ).orderBy("event_type")


def sessionize(events: DataFrame, gap_minutes: int = DEFAULT_SESSION_GAP_MINUTES) -> DataFrame:
    """Gap-based sessionization: a new session starts when a user is idle
    longer than ``gap_minutes``. Classic lag + running-sum window pair;
    ``(ts_us, event_id)`` ordering is unique, so frames are deterministic.
    """
    gap_us = gap_minutes * 60_000_000
    w = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("prev_ts_us", F.lag("ts_us").over(w))
        .withColumn(
            "is_session_start",
            F.when(
                F.col("prev_ts_us").isNull() | (F.col("ts_us") - F.col("prev_ts_us") > gap_us), 1
            ).otherwise(0),
        )
        .withColumn("session_seq", F.sum("is_session_start").over(run).cast("long"))
    )


def session_summary(events: DataFrame, gap_minutes: int = DEFAULT_SESSION_GAP_MINUTES) -> DataFrame:
    """Per-session rollup: span, size, composition."""
    s = sessionize(events, gap_minutes)
    return (
        s.groupBy("user_id", "session_seq")
        .agg(
            F.count("*").alias("session_events"),
            F.min("ts_us").alias("session_start_us"),
            F.max("ts_us").alias("session_end_us"),
            F.countDistinct("event_type").alias("distinct_event_types"),
            money_sum("value", "session_value"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("purchase_events"),
        )
        .withColumn(
            "session_minutes",
            (F.col("session_end_us") - F.col("session_start_us")) / F.lit(60_000_000.0),
        )
    )


def user_activity_summary(events: DataFrame, gap_minutes: int = DEFAULT_SESSION_GAP_MINUTES) -> DataFrame:
    """Per-user activity rollup over sessions (two-level aggregation —
    sessions reuse the user_id shuffle, so this is still one exchange)."""
    per_session = session_summary(events, gap_minutes)
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("session_count"),
            F.sum("session_events").cast("long").alias("total_events"),
            # exact integer µs total → double division at the end (a
            # decimal cast of the fractional minutes would round, and
            # µs/60e6 lands exactly on cast boundaries all the time)
            F.sum(F.col("session_end_us") - F.col("session_start_us"))
            .cast("long")
            .alias("total_session_us"),
            money_sum("session_value", "total_value"),
            F.sum("purchase_events").cast("long").alias("total_purchases"),
        )
        .withColumn(
            "avg_session_minutes",
            F.col("total_session_us") / F.col("session_count") / F.lit(60_000_000.0),
        )
    )


def cohort_retention(events: DataFrame, period_days: int = 7) -> DataFrame:
    """Cohort retention matrix: users grouped by the period of their first
    event; each later period's row counts how many of that cohort came
    back. The canonical product-analytics rollup (the reference has
    nothing like it; any event warehouse grows one).

    Periods are integer epoch-day buckets (``day_idx div period_days``) —
    no calendar/timezone arithmetic anywhere. Two shuffles total: the
    per-user first-seen aggregation and the (cohort, offset) rollup over
    distinct user-periods.
    """
    activity = events.select(
        "user_id",
        F.expr(f"datediff(event_date, date'1970-01-01') div {period_days}")
        .cast("long")
        .alias("period"),
    ).distinct()
    first = activity.groupBy("user_id").agg(F.min("period").alias("cohort_period"))
    cohort_sizes = first.groupBy("cohort_period").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_users")
    )
    return (
        activity.join(first, "user_id")
        .groupBy("cohort_period", (F.col("period") - F.col("cohort_period")).alias("period_offset"))
        .agg(F.count(F.lit(1)).cast("long").alias("active_users"))
        .join(cohort_sizes, "cohort_period")
        .select(
            "cohort_period",
            "period_offset",
            "cohort_users",
            "active_users",
            (F.col("active_users") / F.col("cohort_users")).alias("retention"),
        )
        .orderBy("cohort_period", "period_offset")
    )


#: Ordered step sequence for the demo conversion funnel.
FUNNEL_STEPS = ("view", "click", "purchase")


def conversion_funnel(
    events: DataFrame, steps: tuple[str, ...] = FUNNEL_STEPS
) -> DataFrame:
    """Ordered-sequence conversion funnel: a user completes step N when
    their earliest step-N event STRICTLY follows their step-(N−1)
    completion time (first-touch semantics, deterministic for any tie
    layout because each step time is a min over an exact integer µs
    predicate).

    One shuffle on ``user_id``; each step is another window pass over
    the same partitioning (no re-shuffle). Output: one row per step with
    completing-user counts and conversion vs the previous step and vs
    all users.
    """
    wu = Window.partitionBy("user_id")
    df = events.select("user_id", "event_type", "ts_us")
    prev: F.Column | None = None
    step_cols = []
    for i, step in enumerate(steps):
        cond = F.col("event_type") == step
        if prev is not None:
            cond = cond & (F.col("ts_us") > prev)
        col_name = f"_t{i}"
        df = df.withColumn(col_name, F.min(F.when(cond, F.col("ts_us"))).over(wu))
        prev = F.col(col_name)
        step_cols.append(col_name)
    per_user = df.groupBy("user_id").agg(
        *[F.max(c).alias(c) for c in step_cols]
    )
    total = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("users_total"),
        *[
            F.count(F.col(c)).cast("long").alias(f"_n{i}")
            for i, c in enumerate(step_cols)
        ],
    )
    rows = None
    for i, step in enumerate(steps):
        prev_n = F.col("users_total") if i == 0 else F.col(f"_n{i - 1}")
        row = total.select(
            F.lit(i + 1).cast("int").alias("step_idx"),
            F.lit(step).alias("step"),
            F.col(f"_n{i}").alias("users_completed"),
            F.when(prev_n > 0, F.col(f"_n{i}") / prev_n).alias("conversion_from_prev"),
            F.when(
                F.col("users_total") > 0, F.col(f"_n{i}") / F.col("users_total")
            ).alias("conversion_from_start"),
        )
        rows = row if rows is None else rows.unionByName(row)
    return rows.orderBy("step_idx")
