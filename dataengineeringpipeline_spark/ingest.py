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

For real databases, :func:`jdbc_read` / :func:`jdbc_ingest` complete the
S1 contract: watermark predicate inlined into the JDBC subquery (the DB
scans its index, not Spark post-filtering a full pull) and a
partitionColumn/bounds parallel range read.
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


def _sql_literal(value: Any) -> str:
    """Render a watermark value as a SQL literal for the pushdown
    subquery. Strings are single-quoted with quote doubling; numbers pass
    through. For timestamp/date columns pass the DB's literal syntax
    as a string wrapped via ``raw=`` in :func:`jdbc_read`."""
    if isinstance(value, bool):
        return "TRUE" if value else "FALSE"
    if isinstance(value, (int, float)):
        return repr(value)
    s = str(value).replace("'", "''")
    return f"'{s}'"


def jdbc_read(
    spark: SparkSession,
    url: str,
    table: str,
    watermark_column: str | None = None,
    watermark_value: Any | None = None,
    partition_column: str | None = None,
    lower_bound: Any | None = None,
    upper_bound: Any | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    driver: str | None = None,
    raw_predicate: str | None = None,
) -> DataFrame:
    """Parallel JDBC extract with watermark pushdown — the real-database
    form of S1 (reference ``lambda/snowflake_extractor/lambda_function.py:
    296-400``; the parquet+filter form in :func:`ingest` is the local
    mapping).

    - The watermark predicate is inlined into the ``dbtable`` subquery,
      so the DATABASE evaluates it (index scan of the new tail) rather
      than Spark post-filtering a full-table pull. ``raw_predicate``
      accepts an arbitrary DB-dialect WHERE fragment (e.g. a timestamp
      literal) when the generic ``column > literal`` form isn't enough.
    - ``partition_column`` + bounds split the read into
      ``num_partitions`` concurrent range queries — the difference
      between 1 connection and N streaming in parallel. Bounds left as
      ``None`` are probed with one cheap ``MIN()``/``MAX()`` round trip
      (the reference's extractor does the same to size its batches).
    - ``fetch_size`` keeps the per-connection row buffer bounded
      (drivers default absurdly low or unbounded).
    """
    preds = []
    if watermark_column is not None and watermark_value is not None:
        preds.append(f"{watermark_column} > {_sql_literal(watermark_value)}")
    if raw_predicate:
        preds.append(f"({raw_predicate})")
    where = f" WHERE {' AND '.join(preds)}" if preds else ""
    dbtable = f"(SELECT * FROM {table}{where}) src"

    def _opts(reader):
        reader = reader.option("url", url).option("fetchsize", str(fetch_size))
        return reader.option("driver", driver) if driver else reader

    if partition_column is not None and (lower_bound is None or upper_bound is None):
        probe = (
            _opts(spark.read.format("jdbc"))
            .option(
                "query",
                f"SELECT MIN({partition_column}) AS lo, MAX({partition_column}) AS hi "
                f"FROM {table}{where}",
            )
            .load()
            .collect()[0]
        )
        # positional: identifier case differs per DB (Derby uppercases)
        lower_bound, upper_bound = probe[0], probe[1]
        if lower_bound is None:  # empty slice: nothing to parallelize over
            partition_column = None

    reader = _opts(spark.read.format("jdbc")).option("dbtable", dbtable)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def jdbc_ingest(
    spark: SparkSession,
    url: str,
    table: str,
    watermark_column: str,
    store: WatermarkStore,
    bronze_path: str,
    source_system: str = "jdbc",
    extraction_ts: str | None = None,
    **jdbc_kwargs,
) -> dict:
    """Incremental JDBC extraction run: watermark-pushdown read (the DB
    scans only rows past the stored watermark), stamp audit columns,
    append to bronze, advance the watermark — :func:`ingest` with a real
    database source (S1+S3+S8 end-to-end)."""
    wm = store.get(table, watermark_column)
    source = jdbc_read(
        spark, url, table,
        watermark_column=watermark_column if wm.value is not None else None,
        watermark_value=wm.value,
        **jdbc_kwargs,
    )
    return ingest(
        spark, source, table, watermark_column, store, bronze_path,
        source_system=source_system, extraction_ts=extraction_ts,
    )


#: Fixed demo watermark for the oracle query: 2024-01-20 00:00:00 UTC in
#: epoch microseconds (events span 2024-01-01..01-30 at every SF).
DEMO_WATERMARK_US = 19_742 * 86_400_000_000


def incremental_events(events: DataFrame, watermark_us: int = DEMO_WATERMARK_US) -> DataFrame:
    """Oracle-checkable incremental extract over the events table: the
    slice strictly past the stored watermark, with deterministic audit
    columns (run id instead of wall clock)."""
    # The exact predicate sits on the derived ts_us, which cannot reach
    # the parquet scan. Add the equivalent raw-column twin so
    # row-group/partition pruning happens at the source — at 100 TB this
    # is the difference between reading the new tail and scanning the
    # table. `.explain` shows PushedFilters: [GreaterThan(ts, ...)] with
    # it, only IsNotNull(ts) without. The literal's type must match the
    # raw column's (see datalake.raw_ts_us_expr); a constant-folded
    # timestampadd stays pushdown-eligible. In the raw-nanos branch,
    # ts_us > w  ⟺  ts div 1000 > w  ⟺  ts >= (w+1)*1000 — the >= form
    # is the exact twin (a plain ts > w*1000 would admit the
    # sub-microsecond remainder rows with ts_us == w).
    if "ts" in events.columns:
        raw_t = dict(events.dtypes).get("ts", "").lower()
        if raw_t in ("bigint", "long"):
            events = events.filter(F.col("ts") >= F.lit((watermark_us + 1) * 1000))
        elif raw_t == "timestamp_ntz":
            events = events.filter(F.expr(
                f"ts > timestampadd(MICROSECOND, {watermark_us}, TIMESTAMP_NTZ'1970-01-01 00:00:00')"
            ))
        elif raw_t == "timestamp":
            events = events.filter(F.col("ts") > F.timestamp_micros(F.lit(watermark_us)))
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
