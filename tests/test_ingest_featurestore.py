"""Stateful mechanics not covered by the SQL oracle: watermark advance,
append-only lineage versions, incremental ingest round-trips."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataengineeringpipeline_spark import featurestore, ingest
from dataengineeringpipeline_spark.datalake import load_events


def test_watermark_store_roundtrip(tmp_path):
    store = ingest.WatermarkStore(str(tmp_path / "wm.json"))
    assert store.get("events", "ts").value is None
    store.update("events", "ts", 100, row_count=7)
    wm = store.get("events", "ts")
    assert (wm.value, wm.extraction_count, wm.last_row_count) == (100, 1, 7)
    store.update("events", "ts", 200, row_count=3)
    assert store.get("events", "ts").extraction_count == 2
    # persisted: a fresh store sees the same state
    again = ingest.WatermarkStore(str(tmp_path / "wm.json"))
    assert again.get("events", "ts").value == 200
    again.delete("events", "ts")
    assert again.get("events", "ts").value is None


def test_incremental_ingest_advances_watermark(spark, sf_dir, tmp_path):
    store = ingest.WatermarkStore(str(tmp_path / "wm.json"))
    bronze = str(tmp_path / "bronze")
    ev = load_events(spark, sf_dir).select("event_id", "user_id", "event_type", "ts_us")
    total = ev.count()

    first = ingest.ingest(
        spark, ev, "events", "ts_us", store, bronze, extraction_ts="2024-02-01 00:00:00"
    )
    assert first["rows_extracted"] == total
    assert store.get("events", "ts_us").value == ev.agg(F.max("ts_us")).collect()[0][0]

    # nothing new → skip, watermark unchanged
    second = ingest.ingest(spark, ev, "events", "ts_us", store, bronze)
    assert second["skipped"] and second["rows_extracted"] == 0

    written = spark.read.parquet(os.path.join(bronze, "events"))
    assert written.count() == total
    assert {"extraction_timestamp", "source_system"} <= set(written.columns)


def test_incremental_slice_is_strict(spark, sf_dir):
    ev = load_events(spark, sf_dir)
    max_us = ev.agg(F.max("ts_us")).collect()[0][0]
    assert ingest.incremental_slice(ev, "ts_us", max_us).count() == 0
    assert ingest.incremental_slice(ev, "ts_us", None).count() == ev.count()


def test_lineage_versions_increment(tmp_path):
    log = featurestore.LineageLog(str(tmp_path / "lineage.json"))
    assert log.record("daily_user", 10, "gold")["version"] == 1
    assert log.record("daily_user", 12, "gold")["version"] == 2
    assert log.record("other_group", 5, "gold")["version"] == 1
    assert [r["version"] for r in log.latest("daily_user", 2)] == [2, 1]


def test_online_get_returns_latest_row(spark, sf_dir, tmp_path):
    ev = load_events(spark, sf_dir)
    feats = featurestore.daily_user_features(ev)
    some_user = feats.select("user_id").orderBy("user_id").first()["user_id"]
    got = featurestore.online_get(feats, "user_id", "event_date", some_user).collect()
    assert len(got) == 1
    expected_date = (
        feats.filter(F.col("user_id") == some_user).agg(F.max("event_date")).collect()[0][0]
    )
    assert got[0]["event_date"] == expected_date

    log = featurestore.LineageLog(str(tmp_path / "lineage.json"))
    entry = featurestore.ingest_features(feats, "daily_user", str(tmp_path / "offline"), log)
    assert entry["version"] == 1 and entry["row_count"] == feats.count()


def test_point_in_time_features_never_leak_same_day(spark):
    """The PIT contract: a 14:00 purchase on day 10 must see day 9's
    features (day 10's aggregates include the label's own event — using
    them would be train/serve leakage); a user whose only history is
    older than the tolerance gets null features."""
    import datetime as dt

    DAY_US = 86_400_000_000

    def row(eid, uid, day, hour, etype, value):
        return (
            eid,
            uid,
            day * DAY_US + hour * 3_600_000_000,
            dt.date(1970, 1, 1) + dt.timedelta(days=day),
            etype,
            float(value),
        )

    events = spark.createDataFrame(
        [
            # user 1: activity on days 9 and 10, purchase 14:00 day 10
            row(100, 1, 9, 1, "click", 5.0),
            row(101, 1, 9, 2, "click", 7.0),
            row(102, 1, 10, 1, "view", 11.0),
            row(103, 1, 10, 14, "purchase", 99.0),
            # user 2: last activity 30 days before the purchase
            row(200, 2, 40, 3, "click", 1.0),
            row(201, 2, 70, 12, "purchase", 50.0),
        ],
        "event_id long, user_id long, ts_us long, event_date date, event_type string, value double",
    )
    out = {r["event_id"]: r for r in featurestore.point_in_time_features(events).collect()}
    # day-9 features: 2 events, value 12.0, 0 purchases; servable at day-10 start
    m = out[103]
    assert m["feature_ts_us"] == 10 * DAY_US
    assert m["daily_events"] == 2 and m["daily_value"] == 12.0
    assert m["purchase_events"] == 0
    assert m["feature_age_us"] == 14 * 3_600_000_000
    # user 2: nothing inside the 7-day window -> null features
    d = out[201]
    assert d["feature_ts_us"] is None and d["daily_events"] is None
    # its own purchase day's features exist but are same-day -> excluded too
    assert d["label_value"] == 50.0


# -- JDBC source (S1 real-database path, embedded Derby) ---------------------

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def _derby_conn(spark, url):
    """Open an embedded-Derby connection through the session JVM; skip the
    test when the driver isn't on the classpath."""
    import pytest

    try:
        jvm = spark._jvm
        jvm.java.lang.Class.forName(DERBY_DRIVER)
        return jvm.java.sql.DriverManager.getConnection(url)
    except Exception:
        pytest.skip("embedded Derby JDBC driver not available")


def test_jdbc_read_watermark_pushdown_and_partitioned(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/jdbc_db;create=true"
    conn = _derby_conn(spark, url)
    st = conn.createStatement()
    st.executeUpdate("CREATE TABLE src_events (id INT, ts BIGINT, val DOUBLE)")
    ps = conn.prepareStatement("INSERT INTO src_events VALUES (?, ?, ?)")
    for i in range(100):
        ps.setInt(1, i)
        ps.setLong(2, i * 10)
        ps.setDouble(3, i * 1.5)
        ps.addBatch()
    ps.executeBatch()
    conn.close()

    df = ingest.jdbc_read(
        spark, url, "src_events",
        watermark_column="ts", watermark_value=500,
        partition_column="id", num_partitions=4, driver=DERBY_DRIVER,
    )
    # bounds were probed, so the scan really is 4 parallel range queries
    assert df.rdd.getNumPartitions() == 4
    got = {(r["ID"], r["TS"]) for r in df.collect()}
    assert got == {(i, i * 10) for i in range(100) if i * 10 > 500}


def test_jdbc_ingest_roundtrip_advances_watermark(spark, tmp_path):
    url = f"jdbc:derby:{tmp_path}/jdbc_inc;create=true"
    conn = _derby_conn(spark, url)
    st = conn.createStatement()
    st.executeUpdate("CREATE TABLE tx (id INT, amount DOUBLE)")
    st.executeUpdate("INSERT INTO tx VALUES (1, 10.0), (2, 20.0), (3, 30.0)")

    store = ingest.WatermarkStore(str(tmp_path / "wm.json"))
    bronze = str(tmp_path / "bronze")
    first = ingest.jdbc_ingest(
        spark, url, "tx", "id", store, bronze,
        extraction_ts="2024-02-01 00:00:00", driver=DERBY_DRIVER,
    )
    assert first["rows_extracted"] == 3 and first["watermark"] == 3

    # no new rows: run is a skip, watermark unchanged
    second = ingest.jdbc_ingest(
        spark, url, "tx", "id", store, bronze,
        extraction_ts="2024-02-02 00:00:00", driver=DERBY_DRIVER,
    )
    assert second["skipped"] and store.get("tx", "id").value == 3

    # two new rows: only they are extracted (DB-side watermark pushdown)
    st.executeUpdate("INSERT INTO tx VALUES (4, 40.0), (5, 50.0)")
    conn.close()
    third = ingest.jdbc_ingest(
        spark, url, "tx", "id", store, bronze,
        extraction_ts="2024-02-03 00:00:00", driver=DERBY_DRIVER,
    )
    assert third["rows_extracted"] == 2 and third["watermark"] == 5
    out = spark.read.parquet(os.path.join(bronze, "tx"))
    assert out.count() == 5  # 3 + 2 appended, nothing re-extracted
