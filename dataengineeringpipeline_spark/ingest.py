"""Incremental extraction with watermark state (SURVEY.md §2.1 S1–S3).

Re-expresses the reference's extractor loop
(``lambda/snowflake_extractor/lambda_function.py:296-400``) Spark-first:

- the batched ``WHERE wm > ? ORDER BY wm LIMIT n`` pagination loop
  (``watermark_manager.py:181-259``) collapses into a single declarative
  ``df.filter(col(wm) > lit(state))`` — Spark parallelizes the scan and
  the predicate pushes down to the Parquet reader (check ``PushedFilters``
  in ``.explain``), so pagination is unnecessary;
- the DynamoDB watermark table (``watermark_manager.py:33-164``, one row
  per ``(source_table, watermark_column)``) becomes a tiny JSON state file
  — control-plane state is driver-side by design, the data plane never
  touches it;
- the next watermark is ``F.max(wm)`` over the extracted increment
  (``lambda_function.py:367-371``) — one distributed aggregate, no
  driver-side row loop.

At 100 TB: the watermark predicate prunes both Parquet row groups and
(YYYY/MM/DD-partitioned) directories, so each incremental run reads only
the new tail, not the table.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class Watermark:
    """State row per (source_table, watermark_column) — mirrors the
    reference's DynamoDB item shape (``watermark_manager.py:69-115``)."""

    source_table: str
    watermark_column: str
    value: Any = None
    extraction_count: int = 0
    last_row_count: int = 0


class WatermarkStore:
    """Tiny JSON-file watermark store.

    get / update / get_all / delete parity with
    ``watermark_manager.py:33-164``. The store holds control-plane state
    (a handful of rows), so a driver-local JSON file is the right tool —
    putting this in a distributed table would add a shuffle to every
    incremental run for no benefit.
    """

    def __init__(self, path: str):
        self.path = path
        self._state: dict[str, dict] = {}
        if os.path.exists(path):
            with open(path) as f:
                self._state = json.load(f)

    @staticmethod
    def _key(source_table: str, watermark_column: str) -> str:
        return f"{source_table}\x00{watermark_column}"

    def get(self, source_table: str, watermark_column: str) -> Watermark:
        raw = self._state.get(self._key(source_table, watermark_column))
        if raw is None:
            return Watermark(source_table, watermark_column)
        return Watermark(**raw)

    def update(
        self, source_table: str, watermark_column: str, value: Any, row_count: int
    ) -> Watermark:
        prev = self.get(source_table, watermark_column)
        wm = Watermark(
            source_table,
            watermark_column,
            value=value,
            extraction_count=prev.extraction_count + 1,
            last_row_count=row_count,
        )
        self._state[self._key(source_table, watermark_column)] = wm.__dict__
        self._save()
        return wm

    def get_all(self) -> list[Watermark]:
        return [Watermark(**raw) for raw in self._state.values()]

    def delete(self, source_table: str, watermark_column: str) -> None:
        self._state.pop(self._key(source_table, watermark_column), None)
        self._save()

    def _save(self) -> None:
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self._state, f, indent=2, sort_keys=True)


def incremental_slice(df: DataFrame, watermark_column: str, last_value: Any | None) -> DataFrame:
    """``WHERE wm > last_value`` — the whole extraction "loop" as one
    pushdown-able predicate. ``None`` means first run (full extract)."""
    if last_value is None:
        return df
    return df.filter(F.col(watermark_column) > F.lit(last_value))


def with_extraction_metadata(
    df: DataFrame, source_system: str, extraction_ts: str | Column | None = None
) -> DataFrame:
    """Audit columns added by the extractor's Parquet writer
    (``lambda_function.py:276-284``): run timestamp + source system.

    ``extraction_ts`` is an explicit argument (not ``current_timestamp()``)
    for the same reason the reference pins ``EXECUTION_DATE`` once per run
    — deterministic reruns and oracle checks.
    """
    ts = (
        F.current_timestamp()
        if extraction_ts is None
        else (F.lit(extraction_ts).cast("timestamp") if isinstance(extraction_ts, str) else extraction_ts)
    )
    return df.withColumn("extraction_timestamp", ts).withColumn(
        "source_system", F.lit(source_system)
    )


def ingest(
    spark: SparkSession,
    source: DataFrame,
    name: str,
    watermark_column: str,
    store: WatermarkStore,
    bronze_path: str,
    source_system: str = "testdata",
    extraction_ts: str | None = None,
) -> dict:
    """One incremental extraction run: slice past the watermark, stamp
    audit columns, append to bronze, advance the watermark to
    ``max(wm)`` of the increment. Returns a run report dict (the
    reference's Lambda response shape, ``lambda_function.py:470-495``)."""
    wm = store.get(name, watermark_column)
    # Pin the increment before any action: stats and the write below are
    # two Spark actions, and a live source gaining rows between them
    # would write rows the stored watermark doesn't cover (duplicated on
    # the next run). persist() materializes the slice once so both
    # actions see the same snapshot.
    increment = incremental_slice(source, watermark_column, wm.value).persist()
    try:
        stats = increment.agg(
            F.count(F.lit(1)).alias("rows"), F.max(watermark_column).alias("next_wm")
        ).collect()[0]
        if stats["rows"] == 0:
            return {"table": name, "rows_extracted": 0, "watermark": wm.value, "skipped": True}
        out = with_extraction_metadata(increment, source_system, extraction_ts)
        out.write.mode("append").parquet(os.path.join(bronze_path, name))
    finally:
        increment.unpersist()
    next_wm = stats["next_wm"]
    if hasattr(next_wm, "isoformat"):
        next_wm = next_wm.isoformat()
    store.update(name, watermark_column, next_wm, stats["rows"])
    return {
        "table": name,
        "rows_extracted": stats["rows"],
        "watermark": next_wm,
        "skipped": False,
    }


#: Fixed demo watermark for the oracle query: 2024-01-20 00:00:00 UTC in
#: epoch microseconds (events span 2024-01-01..01-30 at every SF).
DEMO_WATERMARK_US = 19_742 * 86_400_000_000


def incremental_events(events: DataFrame, watermark_us: int = DEMO_WATERMARK_US) -> DataFrame:
    """Oracle-checkable incremental extract over the events table: the
    slice strictly past the stored watermark, with deterministic audit
    columns (run id instead of wall clock)."""
    # The exact predicate sits on the derived ts_us = ts div 1000, which
    # cannot reach the parquet scan. Add the (weaker, implied-superset)
    # raw-column twin so row-group/partition pruning happens at the
    # source — at 100 TB this is the difference between reading the new
    # tail and scanning the table. `.explain` shows PushedFilters:
    # [GreaterThan(ts, ...)] with it, only IsNotNull(ts) without.
    if "ts" in events.columns:
        events = events.filter(F.col("ts") > F.lit(watermark_us * 1000))
    inc = incremental_slice(events, "ts_us", watermark_us)
    return inc.select(
        "event_id",
        "user_id",
        "event_type",
        "ts_us",
        "event_date",
        F.col("value").cast("double").alias("value"),
        F.lit("testdata").alias("source_system"),
        F.lit(watermark_us).alias("watermark_us"),
    ).orderBy("event_id")
