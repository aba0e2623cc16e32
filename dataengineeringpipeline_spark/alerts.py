"""Alert classification and routing — the engine half of the reference's
notification service (``lambda/notification_alerting/lambda_function.py:1-662``).

The reference couples three things: severity classification
(``severity_levels``, priority 1-4), rule-based routing decisions
(``should_send_alert``: pipeline regex + alert-type match + min-severity
threshold), and channel transport (SNS/Slack/Teams formatting + HTTP).
The first two are analytics over pipeline observables and live here as
DataFrame transforms; transport is deliberately out of scope — the
routed alert table IS the interface a notifier consumes (the same
boundary as ``datalake.write_json_report``).

Classifiers turn this package's existing observables into one uniform
alert schema ``(pipeline_name, alert_type, source_name, severity,
priority, metric_value, channel?)``:

- :func:`dq_alerts` ← ``quality.evaluate_rules`` report rows,
- :func:`volume_alerts` ← ``quality.daily_volume_anomalies`` rows,
- :func:`job_status_alerts` ← an ``orchestrator.Pipeline.run`` execution
  record (COMPLETED→INFO / PARTIAL→WARNING / FAILED→ERROR, the
  reference's ``process_pipeline_status_update`` mapping).

Scale shape: classification is a pure map over report rows (which are
O(rules + days + jobs), never O(data rows) — the heavy scan already
happened inside the DQ/anomaly aggregations). Routing fans each alert
out to its matching channels with literal-pattern RLIKE ``when``
expressions compiled from the static rule config — map-only, no join,
no shuffle; an alert matching no rule is dropped exactly like the
reference's ``should_send_alert`` returning False.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: Reference severity ladder (`lambda_function.py:68-74`), transport
#: colors/emoji dropped: only the priority ordering has engine meaning.
SEVERITY_PRIORITY = {"INFO": 1, "WARNING": 2, "ERROR": 3, "CRITICAL": 4}

#: A failed DQ rule whose pass-rate shortfall reaches this is CRITICAL.
DQ_CRITICAL_SHORTFALL = 0.05
#: A passing DQ rule within this margin of its threshold is a WARNING
#: (the "about to start failing" heads-up the reference has no analog
#: for — its DQ alerts are binary).
DQ_WARN_MARGIN = 0.01
#: Volume-anomaly |z| tiers (WARNING at the detector's own 2.0 default).
VOL_WARN_Z = 2.0
VOL_ERROR_Z = 3.0
VOL_CRITICAL_Z = 4.0

ALERT_SCHEMA = (
    "pipeline_name string, alert_type string, source_name string, "
    "severity string, priority int, metric_value double"
)


@dataclass(frozen=True)
class AlertRule:
    """One routing rule (``should_send_alert``'s rule shape,
    ``lambda_function.py:95-125``): alerts whose pipeline matches
    ``pipeline_pattern``, whose type matches ``alert_type`` (None = any),
    and whose severity reaches ``min_severity`` go to ``channel``.
    The business-hours gate is omitted — wall-clock-dependent routing is
    nondeterministic by construction and belongs in the notifier."""

    name: str
    channel: str
    pipeline_pattern: str = ".*"
    alert_type: str | None = None
    min_severity: str = "INFO"


DEFAULT_ALERT_RULES: tuple[AlertRule, ...] = (
    AlertRule("page_on_critical", "pager", ".*", None, "CRITICAL"),
    AlertRule("ops_errors", "ops-alerts", ".*", None, "ERROR"),
    AlertRule("dq_team", "data-quality", ".*", "data_quality", "WARNING"),
    AlertRule("volume_watch", "volume-watch", ".*", "volume_anomaly", "WARNING"),
    AlertRule("audit_trail", "audit", ".*", None, "INFO"),
)


def dq_alerts(rule_report: DataFrame, pipeline_name: str = "orders_pipeline") -> DataFrame:
    """Classify a :func:`quality.evaluate_rules` report into alert rows.

    Severity: failed with shortfall ≥ ``DQ_CRITICAL_SHORTFALL`` →
    CRITICAL; failed → ERROR; passing within ``DQ_WARN_MARGIN`` of the
    threshold → WARNING; else INFO. ``metric_value`` is the pass rate.
    """
    sev = (
        F.when(
            ~F.col("passed")
            & (F.col("threshold") - F.col("pass_rate") >= DQ_CRITICAL_SHORTFALL),
            F.lit("CRITICAL"),
        )
        .when(~F.col("passed"), F.lit("ERROR"))
        .when(F.col("pass_rate") - F.col("threshold") <= DQ_WARN_MARGIN, F.lit("WARNING"))
        .otherwise(F.lit("INFO"))
    )
    return rule_report.select(
        F.lit(pipeline_name).alias("pipeline_name"),
        F.lit("data_quality").alias("alert_type"),
        F.col("rule_name").alias("source_name"),
        sev.alias("severity"),
        _priority_col(sev).alias("priority"),
        F.col("pass_rate").cast("double").alias("metric_value"),
    )


def volume_alerts(anomalies: DataFrame, pipeline_name: str = "orders_pipeline") -> DataFrame:
    """Classify :func:`quality.daily_volume_anomalies` rows into alert
    rows — only days at or past the WARNING |z| tier emit an alert (a
    normal day is not an alert, matching the detector's ``is_anomaly``
    contract at its 2.0 default). ``metric_value`` is the signed z."""
    absz = F.abs(F.col("z_score"))
    sev = (
        F.when(absz >= VOL_CRITICAL_Z, F.lit("CRITICAL"))
        .when(absz >= VOL_ERROR_Z, F.lit("ERROR"))
        .otherwise(F.lit("WARNING"))
    )
    return anomalies.filter(F.col("z_score").isNotNull() & (absz >= VOL_WARN_Z)).select(
        F.lit(pipeline_name).alias("pipeline_name"),
        F.lit("volume_anomaly").alias("alert_type"),
        F.col("day").cast("string").alias("source_name"),
        sev.alias("severity"),
        _priority_col(sev).alias("priority"),
        F.col("z_score").cast("double").alias("metric_value"),
    )


def drift_alerts(drift: DataFrame, pipeline_name: str = "orders_pipeline") -> DataFrame:
    """Classify a :func:`quality.category_drift` report into alert rows —
    one alert per drifted report (the TV score and band are corpus-wide,
    so the per-category rows collapse to a single alert keyed by the
    worst-shifted category). Band → severity: major → ERROR, moderate →
    WARNING; a stable mix emits nothing (drift is an exception feed, not
    a metrics feed — the report itself is the metrics surface).
    ``metric_value`` is the TV distance."""
    worst = drift.orderBy(
        F.abs(F.col("share_delta")).desc(), F.col("category").asc()
    ).limit(1)
    sev = F.when(F.col("drift_band") == "major", F.lit("ERROR")).otherwise(
        F.lit("WARNING")
    )
    return worst.filter(F.col("drift_band") != "stable").select(
        F.lit(pipeline_name).alias("pipeline_name"),
        F.lit("category_drift").alias("alert_type"),
        F.col("category").cast("string").alias("source_name"),
        sev.alias("severity"),
        _priority_col(sev).alias("priority"),
        F.col("tv_distance").cast("double").alias("metric_value"),
    )


def job_status_alerts(
    spark: SparkSession, record: dict, pipeline_name: str = "pipeline"
) -> DataFrame:
    """Classify an :meth:`orchestrator.Pipeline.run` execution record:
    per-job rows (succeeded→INFO, failed→ERROR, skipped→WARNING) plus
    one overall row using the reference's status mapping
    (``process_pipeline_status_update``: COMPLETED→INFO,
    PARTIAL→WARNING, FAILED→ERROR). The record is O(jobs) driver state,
    so building a DataFrame from it is not a collect smell."""
    job_sev = {
        "succeeded": "INFO",
        "failed": "ERROR",
        "skipped": "WARNING",
        "quarantined": "WARNING",  # orchestrator RecoveryAction.QUARANTINE
    }
    rows = [
        (
            pipeline_name,
            "pipeline_status",
            name,
            job_sev.get(status, "WARNING"),
            SEVERITY_PRIORITY[job_sev.get(status, "WARNING")],
            None,
        )
        for name, status in sorted(record["job_status"].items())
    ]
    statuses = set(record["job_status"].values())
    if statuses <= {"succeeded"}:
        overall = "INFO"
    elif "succeeded" in statuses or statuses <= {"succeeded", "quarantined"}:
        overall = "WARNING"  # PARTIAL: some work landed (or only quarantines)
    else:
        overall = "ERROR"  # FAILED outright
    rows.append(
        (
            pipeline_name,
            "pipeline_status",
            "__overall__",
            overall,
            SEVERITY_PRIORITY[overall],
            None,
        )
    )
    # auto-recovery events (the reference's send_recovery_notification /
    # send_max_attempts_notification surface, auto_recovery.py:374-448):
    # one row per recovered/acted-on job, severity by what the policy did,
    # metric = re-drive attempts consumed.
    action_sev = {
        "retry": "INFO",       # re-driven and (if logged last) recovered
        "quarantine": "WARNING",
        "skip": "ERROR",       # retry budget exhausted or policy skip
        "halt": "CRITICAL",    # stopped the DAG
    }
    for name, info in sorted(record.get("recovery", {}).items()):
        sev2 = action_sev.get(info.get("action"), "WARNING")
        rows.append(
            (
                pipeline_name,
                "auto_recovery",
                name,
                sev2,
                SEVERITY_PRIORITY[sev2],
                float(info.get("attempts", 0)),
            )
        )
    return spark.createDataFrame(rows, ALERT_SCHEMA)


def _priority_col(sev):
    m = F.create_map(
        *[x for s, p in SEVERITY_PRIORITY.items() for x in (F.lit(s), F.lit(p))]
    )
    return m[sev].cast("int")


def route_alerts(
    alerts: DataFrame, rules: tuple[AlertRule, ...] = DEFAULT_ALERT_RULES
) -> DataFrame:
    """Fan each alert out to every channel whose rule matches — one
    output row per (alert, channel), duplicates collapsed when two rules
    name the same channel. Alerts matching no rule are dropped (the
    reference's ``should_send_alert`` → False).

    The rule config is static Python, so matching compiles to literal
    RLIKE/comparison ``when`` expressions — a pure map; no rules table
    join, no shuffle, regardless of alert volume."""
    matched = [
        F.when(
            F.col("pipeline_name").rlike(r.pipeline_pattern)
            & (
                F.lit(r.alert_type is None)
                | (F.col("alert_type") == F.lit(r.alert_type or ""))
            )
            & (F.col("priority") >= SEVERITY_PRIORITY[r.min_severity]),
            F.lit(r.channel),
        )
        for r in rules
    ]
    chans = F.array_distinct(
        F.filter(F.array(*matched), lambda c: c.isNotNull())
    )
    return alerts.withColumn("channel", F.explode(chans))


def pipeline_alerts(
    silver_orders: DataFrame,
    rules: tuple[AlertRule, ...] = DEFAULT_ALERT_RULES,
) -> DataFrame:
    """Driver-contract query: the routed alert table for the orders
    pipeline — DQ rule alerts + volume-anomaly alerts, classified and
    fanned out to their channels, highest severity first."""
    from dataengineeringpipeline_spark import quality

    report = quality.evaluate_rules(silver_orders, quality.ORDERS_RULES)
    anomalies = quality.daily_volume_anomalies(silver_orders)
    alerts = dq_alerts(report).unionByName(volume_alerts(anomalies))
    return route_alerts(alerts, rules).orderBy(
        F.desc("priority"), "alert_type", "source_name", "channel"
    )


#: Suppression window for repeat-alert throttling: 6 hours in µs.
SUPPRESS_WINDOW_US = 6 * 3_600_000_000


def suppress_repeats(
    feed: DataFrame,
    key_cols: tuple[str, ...] = (),
    ts_col: str = "window_start_us",
    window_us: int = SUPPRESS_WINDOW_US,
    min_priority: int = SEVERITY_PRIORITY["WARNING"],
) -> DataFrame:
    """Notification throttle over a time-stamped alert feed: at most one
    page per (key, suppression window); repeats inside the window fold
    into the emitted row instead of re-paging (the incident-dedup
    behavior every on-call system applies between a metrics feed and a
    pager). Rows below ``min_priority`` are metrics, not pages, and are
    dropped first — the same INFO cut :func:`route_alerts` makes.

    The suppression bucket is ``ts div window_us`` (pure integer on the
    µs timeline — engine-exact, and at 100 TB/day one map-side-combined
    aggregation over the already-tiny alert feed). The emitted row
    carries the window's first alert time, how many were folded in, and
    the worst severity seen (an escalation inside the window is visible
    even though it doesn't re-page).

    Returns (*key_cols, window_bucket, first_ts_us, alerts_in_window,
    worst_priority, worst_severity) ordered by (*key_cols,
    window_bucket)."""
    kept = feed.filter(F.col("priority") >= min_priority)
    g = kept.groupBy(
        *key_cols, F.expr(f"{ts_col} div {window_us}").alias("window_bucket")
    ).agg(
        F.min(ts_col).cast("long").alias("first_ts_us"),
        F.count(F.lit(1)).cast("long").alias("alerts_in_window"),
        F.max("priority").cast("int").alias("worst_priority"),
    )
    sev = F.coalesce(
        *[
            F.when(F.col("worst_priority") == p, F.lit(s))
            for s, p in SEVERITY_PRIORITY.items()
        ]
    )
    return g.withColumn("worst_severity", sev).orderBy(*key_cols, "window_bucket")
