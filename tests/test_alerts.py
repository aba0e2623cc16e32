"""Alert classification + routing (alerts.py) — severity tiers, rule
fan-out, and the execution-record mapping."""

from __future__ import annotations

import pytest

from dataengineeringpipeline_spark import alerts, quality
from dataengineeringpipeline_spark.alerts import AlertRule


def _report(spark, rows):
    return spark.createDataFrame(
        rows,
        "rule_name string, passed_count long, total_count long, "
        "pass_rate double, threshold double, passed boolean",
    )


def test_dq_alert_severity_tiers(spark):
    """CRITICAL at ≥5pt shortfall, ERROR on any other failure, WARNING
    within 1pt of the threshold, INFO otherwise."""
    report = _report(
        spark,
        [
            ("deep_fail", 80, 100, 0.80, 0.95, False),   # shortfall 0.15
            ("shallow_fail", 94, 100, 0.94, 0.95, False),  # shortfall 0.01
            ("near_miss", 955, 1000, 0.955, 0.95, True),   # margin 0.005
            ("comfortable", 100, 100, 1.0, 0.95, True),
        ],
    )
    got = {r["source_name"]: r for r in alerts.dq_alerts(report).collect()}
    assert got["deep_fail"]["severity"] == "CRITICAL"
    assert got["shallow_fail"]["severity"] == "ERROR"
    assert got["near_miss"]["severity"] == "WARNING"
    assert got["comfortable"]["severity"] == "INFO"
    assert got["deep_fail"]["priority"] == 4
    assert got["comfortable"]["priority"] == 1
    assert got["near_miss"]["metric_value"] == pytest.approx(0.955)


def test_volume_alert_tiers_and_quiet_days(spark):
    """|z| tiers map to WARNING/ERROR/CRITICAL; quiet and warmup (NULL z)
    days emit nothing; the signed z survives as metric_value."""
    anom = spark.createDataFrame(
        [
            ("2024-01-01", 100, None),
            ("2024-01-02", 100, 1.5),
            ("2024-01-03", 100, -2.5),
            ("2024-01-04", 100, 3.5),
            ("2024-01-05", 100, -4.5),
        ],
        "day string, rows long, z_score double",
    )
    got = {r["source_name"]: r for r in alerts.volume_alerts(anom).collect()}
    assert set(got) == {"2024-01-03", "2024-01-04", "2024-01-05"}
    assert got["2024-01-03"]["severity"] == "WARNING"
    assert got["2024-01-04"]["severity"] == "ERROR"
    assert got["2024-01-05"]["severity"] == "CRITICAL"
    assert got["2024-01-05"]["metric_value"] == pytest.approx(-4.5)


def test_route_alerts_fan_out_threshold_and_drop(spark):
    """Each alert reaches every matching channel exactly once; severity
    thresholds and type filters apply; an alert matching no rule is
    dropped; two rules naming one channel don't duplicate rows."""
    rows = [
        ("orders_pipeline", "data_quality", "r1", "CRITICAL", 4, 0.5),
        ("orders_pipeline", "data_quality", "r2", "INFO", 1, 1.0),
        ("events_pipeline", "volume_anomaly", "d1", "WARNING", 2, 2.5),
    ]
    adf = spark.createDataFrame(rows, alerts.ALERT_SCHEMA)
    rules = (
        AlertRule("pager", "pager", ".*", None, "CRITICAL"),
        AlertRule("pager_dq_dup", "pager", ".*", "data_quality", "CRITICAL"),
        AlertRule("orders_only", "orders-chan", "^orders_", None, "INFO"),
        AlertRule("vol_only", "volume-watch", ".*", "volume_anomaly", "WARNING"),
    )
    got = sorted(
        (r["source_name"], r["channel"])
        for r in alerts.route_alerts(adf, rules).collect()
    )
    assert got == [
        ("d1", "volume-watch"),        # type-matched; not orders_, below CRITICAL
        ("r1", "orders-chan"),
        ("r1", "pager"),               # matched two pager rules → one row
        ("r2", "orders-chan"),         # INFO reaches only the INFO-floor rule
    ]


def test_job_status_alerts_mappings(spark):
    """succeeded→INFO, failed→ERROR, skipped→WARNING per job; overall
    PARTIAL→WARNING when successes mix with failures, FAILED→ERROR when
    nothing succeeded, COMPLETED→INFO when everything did."""
    partial = {
        "job_status": {"a": "succeeded", "b": "failed", "c": "skipped"},
    }
    got = {r["source_name"]: r for r in alerts.job_status_alerts(spark, partial).collect()}
    assert got["a"]["severity"] == "INFO"
    assert got["b"]["severity"] == "ERROR"
    assert got["c"]["severity"] == "WARNING"
    assert got["__overall__"]["severity"] == "WARNING"

    all_green = {"job_status": {"a": "succeeded", "b": "succeeded"}}
    got = {r["source_name"]: r for r in alerts.job_status_alerts(spark, all_green).collect()}
    assert got["__overall__"]["severity"] == "INFO"

    all_red = {"job_status": {"a": "failed"}}
    got = {r["source_name"]: r for r in alerts.job_status_alerts(spark, all_red).collect()}
    assert got["__overall__"]["severity"] == "ERROR"


def test_job_status_alerts_include_recovery_events(spark):
    """The execution record's recovery log becomes auto_recovery alert
    rows: recovered retries are INFO (attempts as the metric),
    quarantines WARNING, halts CRITICAL — and a halt reaches the pager
    through the default routing rules."""
    record = {
        "job_status": {"a": "succeeded", "dq": "quarantined", "x": "failed"},
        "recovery": {
            "a": {"error_class": "transient", "action": "retry", "attempts": 2, "recovered": True},
            "dq": {"error_class": "data_quality", "action": "quarantine", "attempts": 0},
            "x": {"error_class": "permanent", "action": "halt", "attempts": 0},
        },
    }
    rows = alerts.job_status_alerts(spark, record).collect()
    rec = {r["source_name"]: r for r in rows if r["alert_type"] == "auto_recovery"}
    assert rec["a"]["severity"] == "INFO" and rec["a"]["metric_value"] == 2.0
    assert rec["dq"]["severity"] == "WARNING"
    assert rec["x"]["severity"] == "CRITICAL"
    routed = alerts.route_alerts(alerts.job_status_alerts(spark, record)).collect()
    assert any(r["channel"] == "pager" and r["source_name"] == "x" for r in routed)


def test_pipeline_alerts_end_to_end(spark, sf_dir):
    """The contract query produces severity-sorted routed rows; every
    CRITICAL alert reaches the pager; no channel outside the rule set."""
    so = None
    from dataengineeringpipeline_spark import cleaning

    so = cleaning.clean_orders(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    out = alerts.pipeline_alerts(so).collect()
    assert out, "expected at least the DQ INFO alerts"
    channels = {r["channel"] for r in out}
    assert channels <= {"pager", "ops-alerts", "data-quality", "volume-watch", "audit"}
    crit_sources = {r["source_name"] for r in out if r["severity"] == "CRITICAL"}
    paged = {r["source_name"] for r in out if r["channel"] == "pager"}
    assert crit_sources == paged
    priorities = [r["priority"] for r in out]
    assert priorities == sorted(priorities, reverse=True)


def test_drift_alerts_fire_only_on_shifted_mix(spark):
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import alerts, quality

    rows = [("a", "2024-01-01")] * 80 + [("b", "2024-01-01")] * 20 + [
        ("a", "2024-03-01")
    ] * 20 + [("b", "2024-03-01")] * 80
    df = spark.createDataFrame(rows, "cat string, d string").select(
        "cat", F.to_timestamp("d").alias("ts")
    )
    drifted = quality.category_drift(df, "cat", "ts", "2024-02-01")
    out = alerts.drift_alerts(drifted).collect()
    assert len(out) == 1
    assert out[0]["alert_type"] == "category_drift"
    assert out[0]["severity"] == "ERROR"  # tv = 0.6 -> major
    assert out[0]["metric_value"] == 0.6
    # a stable mix (same rows both periods) emits nothing
    same = [("a", "2024-01-01"), ("b", "2024-01-01"), ("a", "2024-03-01"), ("b", "2024-03-01")]
    df2 = spark.createDataFrame(same, "cat string, d string").select(
        "cat", F.to_timestamp("d").alias("ts")
    )
    stable = quality.category_drift(df2, "cat", "ts", "2024-02-01")
    assert alerts.drift_alerts(stable).count() == 0


# -- repeat-alert suppression -----------------------------------------------


def test_suppress_repeats_closed_form(spark):
    from dataengineeringpipeline_spark.alerts import SEVERITY_PRIORITY, suppress_repeats

    h = 3_600_000_000
    feed = spark.createDataFrame(
        [
            (0 * h, "INFO", 1),       # dropped: below WARNING
            (1 * h, "WARNING", 2),    # bucket 0, first page
            (2 * h, "ERROR", 3),      # bucket 0, folded (escalation visible)
            (5 * h, "WARNING", 2),    # bucket 0, folded
            (7 * h, "CRITICAL", 4),   # bucket 1, first page
            (13 * h, "INFO", 1),      # dropped
        ],
        "window_start_us long, severity string, priority int",
    )
    rows = suppress_repeats(feed).collect()
    assert [(r["window_bucket"], r["first_ts_us"], r["alerts_in_window"],
             r["worst_priority"], r["worst_severity"]) for r in rows] == [
        (0, 1 * h, 3, 3, "ERROR"),
        (1, 7 * h, 1, 4, "CRITICAL"),
    ]
    assert SEVERITY_PRIORITY["WARNING"] == 2  # the default page threshold


def test_suppress_repeats_keys_split_pages(spark):
    from dataengineeringpipeline_spark.alerts import suppress_repeats

    h = 3_600_000_000
    feed = spark.createDataFrame(
        [("a", 1 * h, "WARNING", 2), ("b", 2 * h, "WARNING", 2)],
        "src string, window_start_us long, severity string, priority int",
    )
    rows = suppress_repeats(feed, key_cols=("src",)).collect()
    assert {(r["src"], r["alerts_in_window"]) for r in rows} == {("a", 1), ("b", 1)}
