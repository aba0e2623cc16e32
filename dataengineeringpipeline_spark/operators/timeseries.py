"""Time-series shaping: calendar gap-fill with carry-forward, and
exponentially-weighted smoothing.

Warehouse event streams are sparse — a key with no activity on a day
simply has no row — but downstream consumers (dashboards, drift
monitors, forecasting features) need a dense regular series. The two
operators here supply that shaping Spark-first:

- :func:`gap_filled_daily_values` densifies each key's daily series
  over its own [min, max] date span (``sequence`` + ``explode`` builds
  the calendar spine IN the engine — one row per key expands to its day
  count, no driver loop) and carries the last observation forward with
  an ``ignoreNulls`` window.
- :func:`ewma_value_summary` folds each key's ordered daily series into
  an exponentially-weighted moving average. The fold runs over a
  ``sort_array``-ed collected series — the same deterministic
  sorted-fold discipline as PageRank — so the result is bit-exact in
  any engine; the closed-form ``pow`` formulation is deliberately
  avoided (libm ``pow`` is not identically rounded across engines).

Scale: both are one map-side-combined daily aggregation (the only
data-sized shuffle) followed by per-key work bounded by the CALENDAR
(days per key), not the data. A key's collected series is days-long;
for multi-year spans that is thousands of elements — driver-free,
executor-bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..functions import money_sum


def daily_values(events: DataFrame, alpha_scale: int = 2) -> DataFrame:
    """Per (event_type, event_date): row count + exact-decimal value sum
    — the shared dense-series input. One shuffle, map-side combined."""
    return events.groupBy("event_type", "event_date").agg(
        F.count(F.lit(1)).alias("n_events"),
        money_sum("value", "daily_value"),
    )


def gap_filled_daily_values(events: DataFrame) -> DataFrame:
    """Dense daily series per event_type over the key's own [min, max]
    span: missing days appear with ``is_observed = false``, ``n_events =
    0``, and ``daily_value`` carried forward from the last observed day
    (the standard dashboard/feature densification).

    The calendar spine is built engine-side: one ``sequence(min_date,
    max_date)`` array per key, exploded — rows created exactly where
    needed, partitioned by key. The carry-forward is one
    ``last_value(ignoreNulls)`` running window per key — a single
    additional shuffle on rows that are calendar-sized, not data-sized.
    """
    daily = daily_values(events)
    spine = (
        daily.groupBy("event_type")
        .agg(
            F.min("event_date").alias("d0"), F.max("event_date").alias("d1")
        )
        .select(
            "event_type",
            F.explode(F.sequence("d0", "d1")).alias("event_date"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_date")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        spine.join(daily, ["event_type", "event_date"], "left")
        .select(
            "event_type",
            "event_date",
            F.col("daily_value").isNotNull().alias("is_observed"),
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
            F.last("daily_value", ignorenulls=True).over(w).alias("daily_value"),
        )
        .orderBy("event_type", "event_date")
    )


def ewma_value_summary(events: DataFrame, alpha: float = 0.25) -> DataFrame:
    """Per event_type: the EWMA of its ordered daily value series —
    ``ewma_t = α·v_t + (1−α)·ewma_{t−1}`` seeded with the first day —
    plus span metadata. ``(event_type, n_days, first_date, last_date,
    last_value, ewma_value)``.

    The recurrence is a sequential fold, which is exactly what makes it
    deterministic here: the series is collected per key, sorted by
    date, and folded element by element — the same IEEE sequence in any
    engine (DuckDB: ``list_reduce(list(v ORDER BY d), ...)``), unlike a
    windowed ``pow(1-α, k)`` formulation whose libm ``pow`` is not
    identically rounded across engines.
    """
    daily = daily_values(events)
    series = daily.groupBy("event_type").agg(
        F.sort_array(
            F.collect_list(F.struct("event_date", "daily_value"))
        ).alias("s"),
        F.count(F.lit(1)).alias("n_days"),
        F.min("event_date").alias("first_date"),
        F.max("event_date").alias("last_date"),
    )
    a = F.lit(alpha)
    ewma = F.aggregate(
        F.slice(F.col("s"), 2, F.size("s") - 1),
        F.element_at("s", 1)["daily_value"],
        lambda acc, x: a * x["daily_value"] + (F.lit(1.0) - a) * acc,
    )
    return series.select(
        "event_type",
        "n_days",
        "first_date",
        "last_date",
        F.element_at("s", -1)["daily_value"].alias("last_value"),
        ewma.alias("ewma_value"),
    ).orderBy("event_type")
