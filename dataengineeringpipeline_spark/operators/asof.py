"""As-of (point-in-time) join — the operator behind leakage-free feature
lookups and event attribution.

Spark has no native ASOF JOIN. The naive formulation — an inequality join
``right.ts <= left.ts`` plus a per-left-row argmax — explodes into a
range join (every left row × every earlier right row per key) and is
unusable at 100 TB. This implementation is the scalable composition:

1. union both sides into one tagged stream (``unionByName`` with missing
   columns),
2. one shuffle: partition by key, sort by (time, side-tag, right-row
   payload) within partitions,
3. carry the latest right payload forward with
   ``last(payload, ignorenulls=True)`` over an unbounded-preceding
   running window,
4. keep only left rows and unpack the carried payload.

Cost is one shuffle + one sort — same as a groupBy on the key —
independent of how many right rows precede each left row. Ties are
deterministic: a right row at exactly ``left.ts`` wins (``<=``
semantics), and among right rows sharing a timestamp the
lexicographically-largest payload (lead with a unique id) wins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    payload_cols: list[str],
    matched_time_col: str = "asof_ts",
    tolerance: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the payload of the matching right row
    sharing ``key``: the latest with ``right_time <= left_time``
    (``direction="backward"``, the default), the earliest with
    ``right_time >= left_time`` (``"forward"``), or whichever of the two
    is closer in time (``"nearest"``, ties to backward) — the pandas
    ``merge_asof`` direction trio, shuffle-once on the key either way.

    ``payload_cols`` (must not collide with left column names) arrive as
    nullable columns, plus ``matched_time_col`` carrying the matched
    right timestamp; unmatched left rows keep them all null.
    ``tolerance`` (same unit as the time columns) voids matches farther
    than ``tolerance`` from ``left_time`` in the match's direction — the
    "don't attribute a purchase to a six-month-old click" dial.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    out_cols = [*payload_cols, matched_time_col]
    clash = set(out_cols) & set(left.columns)
    if clash:
        raise ValueError(f"as-of output columns collide with left columns: {sorted(clash)}")
    payload = F.struct(
        F.col(right_time).alias("_rt"), *[F.col(c).alias(c) for c in payload_cols]
    )
    r = right.select(
        F.col(key).alias(key),
        F.col(right_time).alias("_t"),
        F.lit(False).alias("_is_left"),
        payload.alias("_payload"),
    )
    left_side = left.select(
        "*",
        F.col(left_time).alias("_t"),
        F.lit(True).alias("_is_left"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
    )
    both = left_side.unionByName(r, allowMissingColumns=True)
    # backward: right rows at equal _t sort BEFORE left (inclusive <=);
    # forward: right rows at equal _t sort AFTER left (inclusive >=).
    # Both windows share the same partitioning, so "nearest" still
    # shuffles once.
    w_back = (
        Window.partitionBy(key)
        .orderBy(F.asc("_t"), F.asc("_is_left"), F.asc("_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy(key)
        .orderBy(F.asc("_t"), F.desc("_is_left"), F.asc("_payload"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carried = both
    if direction in ("backward", "nearest"):
        carried = carried.withColumn("_mb", F.last("_payload", ignorenulls=True).over(w_back))
    if direction in ("forward", "nearest"):
        carried = carried.withColumn("_mf", F.first("_payload", ignorenulls=True).over(w_fwd))

    def _tol(m, cmp_ok):
        return m if tolerance is None else F.when(cmp_ok, m)

    lt = F.col(left_time)
    if direction == "backward":
        match = _tol(F.col("_mb"), F.col("_mb._rt") >= lt - F.lit(tolerance or 0))
    elif direction == "forward":
        match = _tol(F.col("_mf"), F.col("_mf._rt") <= lt + F.lit(tolerance or 0))
    else:
        back = _tol(F.col("_mb"), F.col("_mb._rt") >= lt - F.lit(tolerance or 0))
        fwd = _tol(F.col("_mf"), F.col("_mf._rt") <= lt + F.lit(tolerance or 0))
        match = (
            F.when(back.isNull(), fwd)
            .when(fwd.isNull(), back)
            .when(lt - back["_rt"] <= fwd["_rt"] - lt, back)  # tie -> backward
            .otherwise(fwd)
        )
    out = carried.filter(F.col("_is_left"))
    for c in payload_cols:
        out = out.withColumn(c, match[c])
    return out.withColumn(matched_time_col, match["_rt"]).drop(
        "_t", "_is_left", "_payload", "_mb", "_mf"
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join: match each ``left`` row (point ``ts_col``)
    to every ``right`` row whose half-open interval
    ``[start_col, end_col)`` contains it.

    Spark's native plan for ``l.ts >= r.start AND l.ts < r.end`` is a
    BroadcastNestedLoopJoin (fine for a handful of intervals, fatal for
    millions). This is the scalable **bucketed** formulation: each
    interval is exploded to the time buckets it overlaps, each point
    falls in exactly one bucket, and the match becomes a plain shuffled
    equi-join on the bucket plus a residual range filter. A (point,
    interval) pair can meet in at most one bucket — the point's own — so
    no post-join dedup is needed.

    ``bucket_width`` (same unit as the time columns) should be on the
    order of the typical interval length: too small and each interval
    explodes into many buckets; too large and each bucket degenerates
    toward all-pairs. Intervals vastly longer than ``bucket_width`` are
    the skew case — split them upstream or raise the width.

    ``how='left'`` keeps unmatched points (right columns null).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"interval_join supports inner/left, got {how!r}")
    b = F.lit(bucket_width)
    r = right.withColumn(
        "_rbucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b).cast("long"),
                F.floor((F.col(end_col) - 1) / b).cast("long"),
            )
        ),
    )
    l = left.withColumn("_lbucket", F.floor(F.col(ts_col) / b).cast("long"))
    cond = (
        (F.col("_lbucket") == F.col("_rbucket"))
        & (F.col(ts_col) >= F.col(start_col))
        & (F.col(ts_col) < F.col(end_col))
    )
    return l.join(r, cond, how).drop("_lbucket", "_rbucket")


#: Incident-window parameters for :func:`incident_window_events` — the
#: top-K error hours become overlapping 70-minute windows (5 min of
#: lead-in + the hour + 5 min of tail), so the join is genuinely
#: interval-shaped rather than a disguised hour equi-join.
INCIDENT_TOP_K = 20
INCIDENT_LEAD_US = 5 * 60_000_000
INCIDENT_TAIL_US = 65 * 60_000_000


def incident_windows(events: DataFrame, top_k: int = INCIDENT_TOP_K) -> DataFrame:
    """The ``top_k`` hours by error count (ties → earlier hour), widened
    into half-open incident windows ``[hour−5min, hour+65min)``.

    A relative (rank-based) trigger rather than an absolute threshold,
    so the operator is meaningful at any corpus scale. The ranking is a
    720-row global sort at any SF — the hourly pre-aggregation has
    already collapsed the event volume.
    """
    hourly = (
        events.filter(F.col("event_type") == "error")
        .groupBy((F.col("ts_us") / F.lit(3_600_000_000)).cast("long").alias("hour_idx"))
        .agg(F.count(F.lit(1)).alias("error_count"))
    )
    w = Window.orderBy(F.desc("error_count"), F.asc("hour_idx"))
    return (
        hourly.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= top_k)
        .select(
            "hour_idx",
            "error_count",
            (F.col("hour_idx") * 3_600_000_000 - INCIDENT_LEAD_US).alias("window_start_us"),
            (F.col("hour_idx") * 3_600_000_000 + INCIDENT_TAIL_US).alias("window_end_us"),
        )
    )


def incident_window_events(events: DataFrame) -> DataFrame:
    """Driver-contract query: interval-join every event to the top-20
    error-hour incident windows and profile each window — event volume,
    error share, distinct users swept up.

    The window set is tiny (20 rows) but the join deliberately runs
    through :func:`interval_join`'s bucketed plan — the shape that holds
    when the interval side is millions of maintenance windows, not 20.
    """
    ev = events.select("event_id", "ts_us", "user_id", "event_type")
    windows = incident_windows(events)
    joined = interval_join(
        ev, windows, "ts_us", "window_start_us", "window_end_us", bucket_width=3_600_000_000
    )
    return (
        joined.groupBy("hour_idx", "window_start_us", "window_end_us")
        .agg(
            F.count(F.lit(1)).alias("events_in_window"),
            F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
            .cast("long")
            .alias("errors_in_window"),
            F.countDistinct("user_id").alias("distinct_users"),
        )
        .withColumn(
            "error_share", F.col("errors_in_window") / F.col("events_in_window")
        )
        .orderBy("hour_idx")
    )


def purchase_attribution(events: DataFrame, tolerance_us: int | None = None) -> DataFrame:
    """Attribution query: each ``purchase`` event joined as-of to the
    user's latest preceding-or-simultaneous ``click``/``view`` event.

    One row per purchase with the attributed source event and the gap in
    microseconds (nulls when no prior touchpoint exists).
    """
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us", F.col("value").cast("double").alias("value")
    )
    touches = events.filter(F.col("event_type").isin("click", "view")).select(
        "user_id",
        F.col("ts_us").alias("src_ts_us"),
        F.col("event_id").alias("src_event_id"),
        F.col("event_type").alias("src_type"),
    )
    joined = asof_join(
        purchases,
        touches,
        key="user_id",
        left_time="ts_us",
        right_time="src_ts_us",
        payload_cols=["src_event_id", "src_type"],
        matched_time_col="src_ts_us",
        tolerance=tolerance_us,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        "value",
        "src_event_id",
        "src_type",
        "src_ts_us",
        (F.col("ts_us") - F.col("src_ts_us")).alias("gap_us"),
    ).orderBy("event_id")
