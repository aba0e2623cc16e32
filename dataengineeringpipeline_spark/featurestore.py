"""Feature-store operations (SURVEY.md §2.1 S10).

The reference's SageMaker Feature Store integration
(``lambda/feature_store_integration/lambda_function.py:104-355``) reduces
to three data operations, each natural in Spark:

- **offline store** = a gold table keyed by ``(record_id, event_time)``
  — a partitioned Parquet append;
- **online get** = latest feature row per record id
  (``get_online_features``, ``lambda_function.py:329-355``) — an argmax
  window (``row_number`` over ``event_time DESC``), partitioned by the
  record key so the shuffle spreads across the cluster;
- **lineage** = an append-only versioned log per ingest
  (auto-increment version, ``lambda_function.py:222-240``) — a tiny
  driver-side JSON log, same rationale as the watermark store.

At scale the online view is the one to watch: ``row_number`` over
``(record_id)`` windows shuffles once on the key — fine. What would NOT
be fine is ``orderBy(desc(event_time)).limit(1)`` per lookup; the
batch-materialized latest-view is the distributed answer.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.functions import money_avg, money_sum


class LineageLog:
    """Append-only feature-group version log (reference keeps this in
    DynamoDB with ``ScanIndexForward=False`` latest-first reads)."""

    def __init__(self, path: str):
        self.path = path
        self._rows: list[dict] = []
        if os.path.exists(path):
            with open(path) as f:
                self._rows = json.load(f)

    def record(self, feature_group: str, row_count: int, source: str) -> dict:
        version = 1 + max(
            (r["version"] for r in self._rows if r["feature_group"] == feature_group), default=0
        )
        entry = {
            "feature_group": feature_group,
            "version": version,
            "row_count": row_count,
            "source": source,
        }
        self._rows.append(entry)
        os.makedirs(os.path.dirname(self.path) or ".", exist_ok=True)
        with open(self.path, "w") as f:
            json.dump(self._rows, f, indent=2)
        return entry

    def latest(self, feature_group: str, n: int = 1) -> list[dict]:
        rows = [r for r in self._rows if r["feature_group"] == feature_group]
        return sorted(rows, key=lambda r: -r["version"])[:n]


def daily_user_features(events: DataFrame) -> DataFrame:
    """A feature group built from the event stream: one row per
    ``(user_id, event_date)`` — the offline-store shape (record id +
    event time + typed features, ``feature_group_schema.json``)."""
    return events.groupBy("user_id", "event_date").agg(
        F.count(F.lit(1)).alias("daily_events"),
        F.countDistinct("event_type").alias("distinct_event_types"),
        money_sum("value", "daily_value"),
        money_avg("value", "avg_event_value"),
        F.max("ts_us").alias("last_event_us"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("long")
        .alias("purchase_events"),
    )


def online_latest(features: DataFrame, record_id: str, event_time: str) -> DataFrame:
    """Online-store view: the latest feature row per record id.

    ``row_number`` over ``(record_id ORDER BY event_time DESC)`` — the
    high-cardinality partition key keeps the window shuffle well-spread.
    """
    w = Window.partitionBy(record_id).orderBy(F.desc(event_time))
    return (
        features.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def online_get(features: DataFrame, record_id: str, event_time: str, key) -> DataFrame:
    """Point lookup: latest feature row for one record id
    (``get_online_features``). The key filter is pushed below the window
    so only one record's rows are ever read."""
    return online_latest(features.filter(F.col(record_id) == key), record_id, event_time)


def feature_store_latest(events: DataFrame) -> DataFrame:
    """Driver-contract query: materialized online view of the daily user
    feature group — latest feature row per user."""
    return (
        online_latest(daily_user_features(events), "user_id", "event_date")
        .select(
            "user_id",
            "event_date",
            "daily_events",
            "distinct_event_types",
            "daily_value",
            "avg_event_value",
            "last_event_us",
            "purchase_events",
        )
        .orderBy("user_id")
    )


def point_in_time_features(events: DataFrame, tolerance_days: int = 7) -> DataFrame:
    """Point-in-time-correct training-set assembly — the feature-store
    join that makes offline training match online serving: each label
    event (here: every ``purchase``) is joined to the newest daily
    feature row of the same user whose day had FULLY ELAPSED before the
    label fired. A feature row for day D becomes servable at the end of
    D (``feature_ts_us = (D+1)·86400s``), so a label at 14:00 on day D
    sees day D−1's features — never same-day aggregates that would leak
    the label's own event into its features (the train/serve-skew bug
    point-in-time joins exist to prevent).

    Built on :func:`operators.asof.asof_join` — one shuffle on
    ``user_id``, cost independent of how many feature days precede each
    label. ``tolerance_days`` voids matches older than the serving
    window (a user dormant for a week gets null features, exactly what
    the online store would return under the same TTL). Unmatched labels
    keep null feature columns; ``feature_age_us`` is the label-to-
    feature staleness the serving SLO monitors.
    """
    from dataengineeringpipeline_spark.operators.asof import asof_join

    labels = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts_us",
        F.col("value").cast("double").alias("label_value"),
    )
    feats = daily_user_features(events).select(
        "user_id",
        (
            (F.datediff(F.col("event_date"), F.to_date(F.lit("1970-01-01"))).cast("long") + 1)
            * F.lit(86_400_000_000)
        ).alias("_f_ts_us"),
        "daily_events",
        "daily_value",
        "purchase_events",
    )
    joined = asof_join(
        labels,
        feats,
        key="user_id",
        left_time="ts_us",
        right_time="_f_ts_us",
        payload_cols=["daily_events", "daily_value", "purchase_events"],
        matched_time_col="feature_ts_us",
        tolerance=tolerance_days * 86_400_000_000,
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts_us",
        "label_value",
        "daily_events",
        "daily_value",
        "purchase_events",
        "feature_ts_us",
        (F.col("ts_us") - F.col("feature_ts_us")).alias("feature_age_us"),
    ).orderBy("event_id")


def ingest_features(
    features: DataFrame,
    feature_group: str,
    offline_root: str,
    lineage: LineageLog,
    source: str = "gold",
) -> dict:
    """Offline-store ingest + lineage version bump
    (``ingest_features_from_gold_layer``).

    The input is pinned with ``persist()`` so the lineage row count and
    the appended files come from the same snapshot — a bare ``.count()``
    after the write would recompute the upstream pipeline and could
    disagree with what was written. (``Dataset.observe`` would fold the
    count into the write, but in Spark 4.1 a consumed Observation leaves
    JVM state behind that later breaks closure serialization of
    RDD-backed jobs — e.g. every ``pyspark.ml`` evaluator — so the
    persist-count-write-unpersist sequence is deliberate.)"""
    path = os.path.join(offline_root, feature_group)
    features = features.persist()
    try:
        n = features.count()
        features.write.mode("append").parquet(path)
    finally:
        features.unpersist()
    return lineage.record(feature_group, n, source)
