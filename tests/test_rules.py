"""Config-driven rule compilers: compilation semantics and guards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataengineeringpipeline_spark import rules


def test_aggregation_rule_from_dict_roundtrip():
    cfg = {
        "name": "demo",
        "group_by_columns": ["a"],
        "aggregate_columns": [{"column": "x", "function": "sum", "alias": "sx"}],
        "filters": "x > 0",
    }
    rule = rules.AggregationRule.from_dict(cfg)
    assert rule.name == "demo" and rule.aggregate_columns[0].alias == "sx"


def test_aggregation_rule_compiles_and_filters(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("b", -5.0), ("b", 3.0)], ["k", "x"]
    )
    rule = rules.AggregationRule(
        "r",
        ("k",),
        (
            rules.AggregateColumn("x", "sum", "sx"),
            rules.AggregateColumn("x", "count", "n"),
        ),
        filters="x > 0",
    )
    out = {r["k"]: (r["sx"], r["n"]) for r in rules.apply_aggregation_rule(df, rule).collect()}
    assert out == {"a": (3.0, 2), "b": (3.0, 1)}


def test_aggregation_rule_global_agg(spark):
    df = spark.createDataFrame([(1.0,), (2.0,)], ["x"])
    rule = rules.AggregationRule("g", (), (rules.AggregateColumn("x", "max", "mx"),))
    assert rules.apply_aggregation_rule(df, rule).collect()[0]["mx"] == 2.0


def test_unsupported_function_rejected(spark):
    df = spark.createDataFrame([(1.0,)], ["x"])
    rule = rules.AggregationRule("bad", (), (rules.AggregateColumn("x", "mode", "m"),))
    with pytest.raises(ValueError, match="unsupported aggregate function"):
        rules.apply_aggregation_rule(df, rule).collect()
    # percentile needs its fraction param in [0, 1]
    for p in (None, 1.5):
        bad_p = rules.AggregationRule(
            "bad_p", (), (rules.AggregateColumn("x", "percentile", "p", p),)
        )
        with pytest.raises(ValueError, match="param in \\[0, 1\\]"):
            rules.apply_aggregation_rule(df, bad_p).collect()
    empty = rules.AggregationRule("empty", ("x",), ())
    with pytest.raises(ValueError, match="no aggregate columns"):
        rules.apply_aggregation_rule(df, empty)


def test_feature_rules_chain_and_literal_policy(spark):
    df = spark.createDataFrame([(776,)], ["recency_days"])
    out = rules.apply_feature_rules(
        df,
        (
            rules.FeatureRule("engagement", "1.0 / (1.0 + recency_days / 30.0)"),
            rules.FeatureRule("double_engagement", "engagement * 2.0"),  # refs earlier rule
        ),
    ).collect()[0]
    assert out["engagement"] == 1.0 / (1.0 + 776 / 30.0)  # IEEE double, not decimal
    assert out["double_engagement"] == out["engagement"] * 2.0


def test_double_literal_rewrite_preserves_identifiers():
    assert rules._double_literals("a1.b + 1.5 * col2") == "a1.b + CAST(1.5 AS DOUBLE) * col2"
    assert rules._double_literals("LOG(1 + x)") == "LOG(1 + x)"  # ints untouched


def test_double_literal_rewrite_skips_string_literals():
    assert (
        rules._double_literals("CASE WHEN version = '1.5' THEN 1.5 ELSE 0 END")
        == "CASE WHEN version = '1.5' THEN CAST(1.5 AS DOUBLE) ELSE 0 END"
    )
    # '' escapes keep the string literal intact
    assert rules._double_literals("x || 'it''s 2.5' || 2.5").endswith("CAST(2.5 AS DOUBLE)")
    assert "'it''s 2.5'" in rules._double_literals("x || 'it''s 2.5' || 2.5")


# -- SCD2 merge --------------------------------------------------------------


def test_scd2_merge_versions_changes(spark):
    from dataengineeringpipeline_spark import cleaning

    base = spark.createDataFrame(
        [(1, "NY", "A"), (2, "CA", "B"), (3, "TX", "C")], ["id", "state", "seg"]
    )
    current = cleaning.scd2_columns(base, "2024-01-01")
    updates = spark.createDataFrame(
        [(1, "NY", "A"),      # unchanged
         (2, "WA", "B"),      # changed -> new version
         (4, "FL", "D")],     # brand new key
        ["id", "state", "seg"],
    )
    merged = cleaning.scd2_merge(current, updates, "id", ["state", "seg"], "2024-06-01")
    rows = {(r["id"], str(r["effective_date"]), r["is_current"]): r for r in merged.collect()}

    assert len(rows) == 5  # 1 kept, 2 closed+new, 3 kept (no update), 4 inserted
    assert rows[(1, "2024-01-01", True)]["state"] == "NY"
    closed = rows[(2, "2024-01-01", False)]
    assert str(closed["expiry_date"]) == "2024-06-01" and closed["state"] == "CA"
    assert rows[(2, "2024-06-01", True)]["state"] == "WA"
    assert rows[(3, "2024-01-01", True)]["state"] == "TX"  # absent from update: kept open
    assert rows[(4, "2024-06-01", True)]["state"] == "FL"

    # idempotence: re-merging the same snapshot changes nothing
    again = cleaning.scd2_merge(merged, updates, "id", ["state", "seg"], "2024-07-01")
    assert again.count() == 5


def test_scd2_merge_null_transitions(spark):
    from dataengineeringpipeline_spark import cleaning

    current = cleaning.scd2_columns(
        spark.createDataFrame([(1, None), (2, "X")], ["id", "attr"]), "2024-01-01"
    )
    updates = spark.createDataFrame([(1, "Y"), (2, None)], ["id", "attr"])
    merged = cleaning.scd2_merge(current, updates, "id", ["attr"], "2024-02-01")
    open_now = {r["id"]: r["attr"] for r in merged.filter("is_current").collect()}
    assert open_now == {1: "Y", 2: None}  # NULL->value and value->NULL both version
    assert merged.count() == 4
