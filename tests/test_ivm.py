"""Incremental materialized-view maintenance (ivm.py)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataengineeringpipeline_spark import cleaning, gold, ivm
from dataengineeringpipeline_spark.datalake import Lake


def _silver(spark, sf_dir):
    return cleaning.clean_orders(
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    )


def test_incremental_equals_full_recompute(spark, sf_dir):
    """Partials merged across a base/delta split reproduce the batch
    daily summary bit-for-bit — the IVM contract."""
    so = _silver(spark, sf_dir)
    inc = ivm.incremental_daily_sales(so).collect()
    full = gold.daily_sales_summary(so).collect()
    assert [tuple(r) for r in inc] == [tuple(r) for r in full]


def test_merge_is_order_independent(spark, sf_dir):
    """delta⊕base == base⊕delta — decimal partial sums make the merge
    exact, so application order cannot perturb the summary."""
    so = _silver(spark, sf_dir)
    cut = F.lit("1997-01-01").cast("date")
    a = ivm.sales_partials(so.filter(F.col("order_date") < cut))
    b = ivm.sales_partials(so.filter(F.col("order_date") >= cut))
    ab = ivm.daily_summary_from_partials(ivm.merge_partials(a, b)).collect()
    ba = ivm.daily_summary_from_partials(ivm.merge_partials(b, a)).collect()
    assert [tuple(r) for r in ab] == [tuple(r) for r in ba]


def _file_state(path):
    out = {}
    for dirpath, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                p = os.path.join(dirpath, f)
                st = os.stat(p)
                out[os.path.relpath(p, path)] = (st.st_size, st.st_mtime_ns)
    return out


def test_maintain_rewrites_only_touched_partitions(spark, sf_dir, tmp_path):
    """A delta touching one date rewrites ONLY that date's partition —
    sibling partition files stay byte-identical (path + size + mtime),
    the O(delta)-not-O(table) property."""
    lake = Lake(str(tmp_path / "lake"))
    so = _silver(spark, sf_dir).persist()
    dates = sorted(
        r["order_date"]
        for r in so.select("order_date").distinct().limit(5).collect()
    )
    hot = dates[-1]
    base = so.filter(F.col("order_date") != F.lit(hot))
    delta = so.filter(F.col("order_date") == F.lit(hot))
    assert ivm.maintain_sales_partials(lake, base)  # first load
    before = _file_state(lake.path("gold", "sales_partials"))

    touched = ivm.maintain_sales_partials(lake, delta)
    assert touched == [hot]
    after = _file_state(lake.path("gold", "sales_partials"))

    hot_dir = f"order_date={hot}"
    untouched_before = {k: v for k, v in before.items() if hot_dir not in k}
    untouched_after = {k: v for k, v in after.items() if hot_dir not in k}
    assert untouched_before == untouched_after
    assert any(hot_dir in k for k in after)

    # and the maintained table reconciles with the batch summary
    maintained = ivm.daily_summary_from_partials(
        lake.read(spark, "gold", "sales_partials")
    ).collect()
    full = gold.daily_sales_summary(so).collect()
    assert [tuple(r) for r in maintained] == [tuple(r) for r in full]
    so.unpersist()


def test_maintain_empty_delta_is_noop(spark, sf_dir, tmp_path):
    lake = Lake(str(tmp_path / "lake"))
    so = _silver(spark, sf_dir)
    ivm.maintain_sales_partials(lake, so)
    before = _file_state(lake.path("gold", "sales_partials"))
    assert ivm.maintain_sales_partials(lake, so.filter(F.lit(False))) == []
    assert _file_state(lake.path("gold", "sales_partials")) == before
