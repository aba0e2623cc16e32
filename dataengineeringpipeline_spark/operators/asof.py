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
) -> DataFrame:
    """For each left row, attach the payload of the latest right row with
    ``right[right_time] <= left[left_time]`` sharing ``key``.

    ``payload_cols`` (must not collide with left column names) arrive as
    nullable columns, plus ``matched_time_col`` carrying the matched
    right timestamp; unmatched left rows keep them all null.
    ``tolerance`` (same unit as the time columns) voids matches older
    than ``left_time - tolerance`` — the "don't attribute a purchase to
    a six-month-old click" dial.
    """
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
    w = (
        Window.partitionBy(key)
        .orderBy(F.asc("_t"), F.asc("_is_left"), F.asc("_payload"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = both.withColumn("_m", F.last("_payload", ignorenulls=True).over(w))
    match = F.col("_m")
    if tolerance is not None:
        match = F.when(F.col("_m._rt") >= F.col(left_time) - F.lit(tolerance), F.col("_m"))
    out = carried.filter(F.col("_is_left"))
    for c in payload_cols:
        out = out.withColumn(c, match[c])
    return out.withColumn(matched_time_col, match["_rt"]).drop(
        "_t", "_is_left", "_payload", "_m"
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
