"""Streaming semantics beyond the oracle gate: batch/stream equivalence,
append-mode watermark behavior (late windows withheld), incremental
file-source micro-batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineeringpipeline_spark import events_analytics, streaming
from dataengineeringpipeline_spark.datalake import load_events


def test_stream_equals_batch_hourly(spark, sf_dir):
    streaming.run_available_now(
        streaming.hourly_stream_counts(streaming.stream_events(spark, sf_dir)),
        "t_stream_hourly",
    )
    got = {
        r["window_start_us"]: (r["event_count"], r["error_count"])
        for r in spark.table("t_stream_hourly").collect()
    }
    batch = {
        (
            r["event_date"].toordinal() - 719_163  # date(1970,1,1).toordinal()
        ) * 86_400_000_000 + r["event_hour"] * 3_600_000_000: (
            r["event_count"],
            r["error_count"],
        )
        for r in events_analytics.hourly_event_summary(load_events(spark, sf_dir)).collect()
    }
    assert got == batch


def test_append_mode_withholds_open_windows(spark, sf_dir):
    """With outputMode=append, windows not yet past the watermark are
    withheld at backlog end — the late-data contract."""
    streaming.run_available_now(
        streaming.hourly_stream_counts(streaming.stream_events(spark, sf_dir)),
        "t_stream_append",
        output_mode="append",
    )
    appended = spark.table("t_stream_append")
    ev = load_events(spark, sf_dir)
    max_us = ev.agg(F.max("ts_us")).collect()[0][0]
    watermark_us = max_us - 3_600_000_000  # delay = 1 hour
    # every emitted window is fully closed w.r.t. the final watermark
    open_emitted = appended.filter(
        F.col("window_start_us") + 3_600_000_000 > watermark_us
    ).count()
    assert open_emitted == 0
    # and all closed windows were emitted
    total_windows = ev.select((F.col("ts_us") / 3_600_000_000).cast("long")).distinct().count()
    withheld = total_windows - appended.count()
    assert 1 <= withheld <= 2  # the final open window (+boundary window)


def test_file_source_picks_up_new_files(spark, sf_dir, tmp_path):
    """Micro-batch ingestion: a second file appearing in the source dir is
    processed as its own micro-batch into the same result table."""
    src = tmp_path / "stream_src"
    src.mkdir()
    ev = load_events(spark, sf_dir).limit(500).select(
        "event_id", F.col("ts_us").alias("ts"), "user_id", "event_type", "value", "props"
    )
    # write nanos-free bigint ts directly; schema matches EVENTS_DDL
    ev.withColumn("ts", F.col("ts") * 1000).coalesce(1).write.mode("overwrite").parquet(
        str(src / "batch1")
    )

    raw = (
        spark.readStream.schema(streaming.EVENTS_DDL)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "batch*"))
    )
    counted = raw.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    q = (
        counted.writeStream.format("memory")
        .queryName("t_incr")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    q.stop()
    first_total = spark.table("t_incr").agg(F.sum("n")).collect()[0][0]
    assert first_total == 500


ORDERS_DDL = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def test_stream_etl_is_incremental_exactly_once(spark, sf_dir, tmp_path):
    """foreachBatch bronze→silver: first run transforms the backlog; a
    re-run with the same checkpoint processes only NEW files."""
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import cleaning

    bronze = str(tmp_path / "bronze")
    silver = str(tmp_path / "silver")
    ckpt = str(tmp_path / "ckpt")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    orders.coalesce(1).write.mode("overwrite").parquet(bronze + "/f1")

    streaming.stream_etl(
        spark, bronze + "/f*", ORDERS_DDL, cleaning.clean_orders, silver, ckpt
    )
    assert spark.read.parquet(silver).count() == n

    # second file with shifted keys → only its rows are appended
    orders.withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000).coalesce(1).write.mode(
        "overwrite"
    ).parquet(bronze + "/f2")
    streaming.stream_etl(
        spark, bronze + "/f*", ORDERS_DDL, cleaning.clean_orders, silver, ckpt
    )
    out = spark.read.parquet(silver)
    assert out.count() == 2 * n  # not 3n — f1 was not re-transformed
    assert out.filter(F.col("order_key") >= 10_000_000).count() == n
    assert "order_size_category" in out.columns  # transform really ran


def test_streaming_sessionize_matches_batch(spark, sf_dir):
    streaming.run_available_now(
        streaming.sessionize_stream(streaming.stream_events(spark, sf_dir)),
        "t_stream_sessions",
        output_mode="update",
    )
    final = (
        spark.table("t_stream_sessions")
        .groupBy("user_id")
        .agg(F.max_by("sessions", "events_seen").alias("sessions"))
    )
    batch = (
        events_analytics.sessionize(load_events(spark, sf_dir))
        .groupBy("user_id")
        .agg(F.max("session_seq").alias("sessions"))
    )
    diff = final.join(batch, "user_id").filter(final["sessions"] != batch["sessions"]).count()
    assert diff == 0
