"""Orchestrator DAG/retry/breaker semantics + multimodal plumbing checks
not covered by the SQL oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineeringpipeline_spark import orchestrator
from dataengineeringpipeline_spark.operators import multimodal as mm


# -- orchestrator ------------------------------------------------------------


def _no_sleep(_):
    pass


def test_pipeline_runs_in_dependency_order():
    order = []

    def job(name):
        def fn(results):
            order.append(name)
            return name

        return fn

    p = (
        orchestrator.Pipeline()
        .add("extract", job("extract"))
        .add("clean", job("clean"), depends_on=("extract",))
        .add("quality", job("quality"), depends_on=("clean",))
        .add("gold_a", job("gold_a"), depends_on=("quality",))
        .add("gold_b", job("gold_b"), depends_on=("quality",))
    )
    record = p.run()
    assert record["status"] == "succeeded"
    assert order.index("extract") < order.index("clean") < order.index("quality")
    assert set(order[3:]) == {"gold_a", "gold_b"}


def test_failure_skips_downstream_only():
    def boom(_):
        raise RuntimeError("boom")

    p = (
        orchestrator.Pipeline()
        .add("a", lambda r: 1)
        .add("b", boom, depends_on=("a",))
        .add("c", lambda r: 3, depends_on=("b",))
        .add("d", lambda r: 4, depends_on=("a",))
    )
    record = p.run(sleep=_no_sleep)
    assert record["status"] == "failed"
    assert record["job_status"] == {"a": "succeeded", "b": "failed", "c": "skipped", "d": "succeeded"}
    assert "boom" in record["failed"]["b"]


def test_retry_recovers_flaky_job():
    attempts = {"n": 0}

    def flaky(_):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RuntimeError("transient")
        return "ok"

    p = orchestrator.Pipeline().add("flaky", flaky, max_retries=3)
    record = p.run(sleep=_no_sleep)
    assert record["status"] == "succeeded" and attempts["n"] == 3


def test_unknown_dependency_rejected():
    p = orchestrator.Pipeline().add("a", lambda r: 1, depends_on=("nope",))
    with pytest.raises(ValueError, match="unknown jobs"):
        p.run()


def test_circuit_breaker_opens_and_recovers():
    br = orchestrator.CircuitBreaker(failure_threshold=2, recovery_timeout_s=0.0)

    def boom():
        raise RuntimeError("down")

    with pytest.raises(RuntimeError):
        orchestrator.execute_with_retry(boom, max_retries=1, breaker=br, sleep=_no_sleep)
    assert br.opened_at is not None
    # recovery_timeout 0 → half-open immediately; a success closes it
    assert orchestrator.execute_with_retry(lambda: "up", breaker=br) == "up"
    assert br.failures == 0 and br.opened_at is None


def test_end_to_end_medallion_dag(spark, sf_dir, tmp_path):
    """Bronze→silver→gold as a DAG over a temp lake — the reference's
    pipeline shape in-process."""
    from dataengineeringpipeline_spark import cleaning, gold
    from dataengineeringpipeline_spark.datalake import Lake

    lake = Lake(str(tmp_path / "lake"))

    def bronze(r):
        df = spark.read.parquet(f"{sf_dir}/orders.parquet")
        lake.write(df, "bronze", "orders")
        return df

    def silver(r):
        df = cleaning.clean_orders(lake.read(spark, "bronze", "orders"))
        lake.write(df, "silver", "orders", partition_by=("order_year",))
        return df

    def daily(r):
        df = gold.daily_sales_summary(lake.read(spark, "silver", "orders"))
        lake.write(df, "gold", "daily_sales")
        return df

    record = (
        orchestrator.Pipeline()
        .add("bronze", bronze)
        .add("silver", silver, depends_on=("bronze",))
        .add("gold", daily, depends_on=("silver",))
        .run()
    )
    assert record["status"] == "succeeded"
    out = lake.read(spark, "gold", "daily_sales")
    assert out.count() > 0


# -- multimodal --------------------------------------------------------------


def test_multimodal_payload_roundtrip(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = mm.attach_payloads(docs)
    row = media.select("payload", "media_meta").first()
    assert row["media_meta"]["byte_size"] == len(row["payload"])
    assert row["media_meta"]["mime"].startswith("application/x-fake-")


def test_multimodal_entropy_bounds(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    feats = mm.extract_features(mm.attach_payloads(docs))
    bad = feats.filter(
        F.col("byte_entropy").isNull()
        | (F.col("byte_entropy") < 0)
        | (F.col("byte_entropy") > 8.0)
    ).count()
    assert bad == 0


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError, match="image"):
        mm.decode_media(b"\x89PNG", "image")


def test_frame_sample_plan_covers_all_chunks(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = mm.attach_payloads(docs)
    plan = mm.frame_sample_plan(media, every_n_chunks=1)
    per_doc = plan.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    joined = media.select(
        "doc_id", F.ceil(F.col("media_meta.byte_size") / mm.CHUNK_BYTES).cast("long").alias("expect")
    ).join(per_doc, "doc_id")
    # docs smaller than one chunk still get one sampled offset
    mismatch = joined.filter(
        F.col("n") != F.greatest(F.col("expect"), F.lit(1))
    ).count()
    assert mismatch == 0
