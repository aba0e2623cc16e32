"""Time-series shaping (operators/timeseries.py) + association rules."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataengineeringpipeline_spark.operators import graph, timeseries


def _events(spark, rows):
    """rows: (user_id, ts_us, event_id, event_type, value, item)"""
    df = spark.createDataFrame(
        rows,
        "user_id long, ts_us long, event_id long, event_type string,"
        " value double, item long",
    )
    return df.withColumn(
        "event_date",
        F.expr("date_add(date'2024-01-01', cast(ts_us as int))"),
    ).withColumn("props", F.format_string('{"k": %d}', "item"))


def test_gap_fill_carries_forward_and_flags_gaps(spark):
    # type 'a': days 0, 3 observed — days 1, 2 must be filled from day 0
    rows = [
        (1, 0, 1, "a", 10.0, 0),
        (1, 3, 2, "a", 40.0, 0),
        (2, 1, 3, "b", 5.0, 0),
    ]
    out = timeseries.gap_filled_daily_values(_events(spark, rows)).collect()
    a = [r for r in out if r["event_type"] == "a"]
    assert [str(r["event_date"]) for r in a] == [
        "2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
    ]
    assert [r["is_observed"] for r in a] == [True, False, False, True]
    assert [r["daily_value"] for r in a] == [10.0, 10.0, 10.0, 40.0]
    assert [r["n_events"] for r in a] == [1, 0, 0, 1]
    b = [r for r in out if r["event_type"] == "b"]
    assert len(b) == 1 and b[0]["is_observed"]


def test_ewma_matches_hand_fold(spark):
    rows = [
        (1, 0, 1, "a", 8.0, 0),
        (1, 1, 2, "a", 4.0, 0),
        (1, 2, 3, "a", 16.0, 0),
    ]
    out = timeseries.ewma_value_summary(_events(spark, rows), alpha=0.25).collect()
    r = out[0]
    want = 8.0
    for v in (4.0, 16.0):
        want = 0.25 * v + (1.0 - 0.25) * want
    assert r["ewma_value"] == want  # bitwise: same IEEE sequence
    assert r["n_days"] == 3 and r["last_value"] == 16.0


def test_ewma_single_day_is_identity(spark):
    out = timeseries.ewma_value_summary(
        _events(spark, [(1, 0, 1, "a", 7.0, 0)])
    ).collect()
    assert out[0]["ewma_value"] == 7.0 and out[0]["n_days"] == 1


def test_next_item_rules_confidence_and_lift(spark):
    # user 1: 7→8, 8→7, 7→8 ; user 2: 7→9
    rows = [
        (1, 0, 1, "e", 0.0, 7),
        (1, 1, 2, "e", 0.0, 8),
        (1, 2, 3, "e", 0.0, 7),
        (1, 3, 4, "e", 0.0, 8),
        (2, 0, 5, "e", 0.0, 7),
        (2, 1, 6, "e", 0.0, 9),
    ]
    out = {
        (r["src_item"], r["next_item"]): r
        for r in graph.next_item_rules(_events(spark, rows)).collect()
    }
    # edges: 7→8 cnt 2, 7→9 cnt 1, 8→7 cnt 1; out(7)=3, out(8)=1; total=4
    r = out[(7, 8)]
    assert r["cnt"] == 2 and r["out_cnt"] == 3 and r["in_cnt"] == 2
    assert r["confidence"] == 2.0 / 3.0
    assert r["lift"] == (2.0 / 3.0) / (2.0 / 4.0)
    assert r["rank"] == 1
    assert out[(7, 9)]["rank"] == 2
    assert out[(8, 7)]["confidence"] == 1.0


def test_fixed_k_sample_exact_k_and_partition_invariant(spark):
    from dataengineeringpipeline_spark.operators import sampling

    df = spark.createDataFrame(
        [(f"s{i % 3}", i) for i in range(300)], "source string, doc_id long"
    )
    a = sampling.fixed_k_sample(df.repartition(1), "source", "doc_id", 10)
    b = sampling.fixed_k_sample(df.repartition(13, "doc_id"), "source", "doc_id", 10)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # deterministic picks regardless of partitioning
    per = {}
    for s, d, r in ra:
        per.setdefault(s, []).append(r)
    assert all(sorted(v) == list(range(1, 11)) for v in per.values())

    # groups smaller than k return the whole group
    small = spark.createDataFrame([("x", 1), ("x", 2)], "source string, doc_id long")
    assert sampling.fixed_k_sample(small, "source", "doc_id", 10).count() == 2


def _reference_fixed_k(rows, k):
    """Driver-side re-derivation of the spec pick: rank by
    (hash(key), key) within each group, keep the first k."""
    from dataengineeringpipeline_spark.operators.sampling import _PICK_P

    per: dict = {}
    for s, d in rows:
        h = ((d % 1_000_003) * 2_654_435_761) % _PICK_P
        per.setdefault(s, []).append((h, d))
    out = []
    for s, hs in per.items():
        for rank, (_, d) in enumerate(sorted(hs)[:k], start=1):
            out.append((s, d, rank))
    return sorted(out)


def test_fixed_k_matches_reference_ranking(spark):
    """Spark picks == the driver-side spec re-derivation for k spanning
    tiny through group-exceeding (incl. k=1)."""
    from dataengineeringpipeline_spark.operators import sampling

    rows = [(f"g{i % 5}", i * 7 + 3) for i in range(20000)]
    df = spark.createDataFrame(rows, "source string, doc_id long")
    for k in (1, 2, 10, 100):
        got = sorted(map(tuple, sampling.fixed_k_sample(df, "source", "doc_id", k).collect()))
        assert got == _reference_fixed_k(rows, k), f"k={k}: picks diverged"
