"""Deployment control plane: registry versioning, deterministic A/B
split scoring, metric-gated promotion (reference:
sagemaker/deployment/deployment_orchestrator.py — Spark-native form)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineeringpipeline_spark import cleaning, deployment, features, mlpipe
from dataengineeringpipeline_spark.operators.sampling import per_mille_bucket


@pytest.fixture(scope="module")
def prepared(spark, sf_dir):
    import os

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    feats = features.ml_customer_features(cleaning.clean_orders(orders))
    return mlpipe._prepare(feats, "churn_flag", None).cache()


def test_registry_versions_and_latest(spark, tmp_path):
    reg = deployment.ModelRegistry(str(tmp_path / "reg"))
    assert reg.register(spark, "churn", "champion", "f1", 0.9) == 1
    assert reg.register(spark, "churn", "champion", "f1", 0.92) == 2
    assert reg.register(spark, "other", "challenger_rejected", "f1", 0.5) == 1
    latest = {r["model_name"]: (r["version"], r["stage"]) for r in reg.latest(spark).collect()}
    assert latest == {"churn": (2, "champion"), "other": (1, "challenger_rejected")}
    assert reg.stage_of(spark, "churn") == "champion"
    with pytest.raises(KeyError):
        reg.stage_of(spark, "missing")


def test_ab_split_is_deterministic_and_covers_population(spark, prepared):
    champion = mlpipe.make_classifier("random_forest", n_estimators=5).fit(prepared)
    challenger = mlpipe.make_classifier("gradient_boosting", n_estimators=5).fit(prepared)
    scored = deployment.ab_split_score(
        prepared, champion, challenger, key_col="customer_key", challenger_pm=300
    )
    n_in = prepared.count()
    assert scored.count() == n_in  # every row scored exactly once
    # variant assignment is the pure key-hash map — recompute independently
    expect = prepared.select(
        "customer_key",
        F.when(per_mille_bucket("customer_key") < 300, "challenger")
        .otherwise("champion")
        .alias("want"),
    )
    mism = (
        scored.select("customer_key", "variant")
        .join(expect, "customer_key")
        .filter(F.col("variant") != F.col("want"))
        .count()
    )
    assert mism == 0
    # both variants actually received traffic at this split
    counts = {r["variant"]: r["n"] for r in
              scored.groupBy("variant").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(counts) == {"champion", "challenger"} and min(counts.values()) > 0


def test_variant_metrics_and_promotion_gate(spark, prepared, tmp_path):
    champion = mlpipe.make_classifier("random_forest", n_estimators=5).fit(prepared)
    challenger = mlpipe.make_classifier("gradient_boosting", n_estimators=20).fit(prepared)
    scored = deployment.ab_split_score(
        prepared, champion, challenger, key_col="customer_key", challenger_pm=500
    )
    vm = deployment.ab_variant_metrics(scored)
    rows = {r["variant"]: r for r in vm.collect()}
    assert set(rows) == {"champion", "challenger"}
    for r in rows.values():
        assert 0.0 <= r["accuracy"] <= 1.0 and r["n"] > 0

    reg = deployment.ModelRegistry(str(tmp_path / "reg"))
    reg.register(spark, "churn", "champion", "ab_accuracy", rows["champion"]["accuracy"])
    decision = deployment.promote_challenger(spark, reg, "churn", vm)
    # decision must mirror the metrics table exactly
    assert decision["promoted"] == (
        rows["challenger"]["accuracy"] > rows["champion"]["accuracy"]
    )
    want_stage = "champion" if decision["promoted"] else "challenger_rejected"
    assert reg.stage_of(spark, "churn") == want_stage
    # an impossible lift gate always rejects
    d2 = deployment.promote_challenger(spark, reg, "churn", vm, min_lift=1.0)
    assert not d2["promoted"] and reg.stage_of(spark, "churn") == "challenger_rejected"
