"""Log-linear quantile sketch (scale.quantile_sketch*): bin math,
mergeability, accuracy bound, and the streaming face's exactly-once
merge — the quantile member of the CMS/HLL/Bloom sketch family."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dataengineeringpipeline_spark import scale, streaming


def _cents(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select(
            "event_type",
            F.round(F.col("value") * 100).cast("long").alias("cents"),
        )
    )


def test_bin_roundtrip_brackets_value(spark):
    """Every value lands in a bin whose [lo, lo+width) interval contains
    it, and the midpoint estimate is within 1/(2*QSK_SUB) relative
    error — the sketch's accuracy contract, checked over octave
    boundaries, the linear region, and large values."""
    vals = [0, 1, 63, 64, 65, 127, 128, 1000, 4095, 4096, 10**6, 10**9, 10**12]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    bins = scale.quantile_sketch(df, "v")
    est = scale.quantile_sketch_estimates(bins, [0.0], ())
    # single-value check instead: map each value through bin+est
    out = (
        df.select(F.col("v"), scale._qsk_bin("v").alias("bin"))
        .select("v", "bin", F.expr(scale._qsk_est_sql("bin")).alias("est"))
        .collect()
    )
    for r in out:
        if r.v < 2 * scale.QSK_SUB:
            assert r.est == r.v, r
        else:
            assert abs(r.est - r.v) / r.v <= 1.0 / (2 * scale.QSK_SUB) + 1e-12, r
    assert est.count() == 1  # p=0.0 -> rank 1 -> smallest bin


def test_sketch_merges_by_addition(spark, sf_dir):
    """sketch(A ∪ B) == merge(sketch(A), sketch(B)) — the property that
    makes partition/day/micro-batch partials combine losslessly."""
    ev = _cents(spark, sf_dir)
    a = ev.filter(F.col("cents") % 2 == 0)
    b = ev.filter(F.col("cents") % 2 != 0)
    whole = scale.quantile_sketch(ev, "cents", ("event_type",))
    merged = (
        scale.quantile_sketch(a, "cents", ("event_type",))
        .unionByName(scale.quantile_sketch(b, "cents", ("event_type",)))
        .groupBy("event_type", "bin")
        .agg(F.sum("c").alias("c"))
    )
    assert sorted(map(tuple, whole.collect())) == sorted(map(tuple, merged.collect()))


def test_estimates_match_exact_within_bound(spark, sf_dir):
    rep = scale.quantile_sketch_report(
        _cents(spark, sf_dir), "cents", ("event_type",)
    ).collect()
    assert rep
    for r in rep:
        assert r.err_pm <= 1000 // (2 * scale.QSK_SUB) + 1, r


def test_stream_quantile_sketch_merge_equals_batch(spark, sf_dir, tmp_path):
    """Multi-batch drain (one file per micro-batch) merges to the batch
    sketch bit-exactly, and a crash-replayed batch overwrites its own
    partition instead of double-counting."""
    src = tmp_path / "src"
    src.mkdir()
    ev = _cents(spark, sf_dir)
    for i in range(3):
        ev.filter(F.col("cents") % 3 == i).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(src / f"part{i}"))
    # flatten: file source wants files, not dirs -> point at globbed dirs
    sdf = (
        spark.readStream.schema("event_type string, cents long")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/part*")
    )
    streaming.stream_quantile_sketch(
        sdf, "cents", str(tmp_path / "sk"), str(tmp_path / "ck"), ("event_type",)
    )
    merged = streaming.read_quantile_sketch(spark, str(tmp_path / "sk"), ("event_type",))
    batch = scale.quantile_sketch(ev, "cents", ("event_type",))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, batch.collect()))
    # replay batch 0: overwrite its partition with identical content
    import os

    parts = sorted(os.listdir(tmp_path / "sk"))
    assert any(p.startswith("batch_id=") for p in parts)
    first = ev.filter(F.col("cents") % 3 == 0)
    scale.quantile_sketch(first, "cents", ("event_type",)).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "sk" / "batch_id=0"))
    again = streaming.read_quantile_sketch(spark, str(tmp_path / "sk"), ("event_type",))
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_contract_matches_batch_estimates(spark, sf_dir):
    got = streaming.streaming_value_quantiles(spark, sf_dir).collect()
    bins = scale.quantile_sketch(_cents(spark, sf_dir), "cents", ("event_type",))
    want = (
        scale.quantile_sketch_estimates(bins, [0.5, 0.9, 0.99], ("event_type",))
        .select("event_type", "p", "n", F.col("est").alias("est_cents"))
        .orderBy("event_type", "p")
        .collect()
    )
    assert got == want


def test_value_quartile_profile_balances_buckets(spark):
    """On a uniform integer stream every quartile holds ~250‰ (within
    the sketch's ~1.6% edge error), buckets are exhaustive and ordered,
    and min/max per bucket nest inside the edges."""
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import scale

    df = spark.range(0, 40_000).select(
        F.lit("t").alias("g"), (F.col("id") % 10_000).alias("v")
    )
    out = scale.value_quartile_profile(df, "v", ("g",)).collect()
    assert [r["quartile"] for r in out] == [1, 2, 3, 4]
    assert sum(r["n_rows"] for r in out) == 40_000
    for r in out:
        assert 220 <= r["share_pm"] <= 280
    # buckets partition the domain: each min is the previous max + 1
    for prev, nxt in zip(out, out[1:]):
        assert nxt["min_v"] == prev["max_v"] + 1
