"""Performance-property tests mirroring the reference's strategy
(SURVEY.md §5.1: throughput-degradation bound between successive data
sizes, parquet-beats-JSON format assertion) plus plan-shape evidence
(partition pruning) that the scale design actually engages."""

from __future__ import annotations

import io
import time
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from dataengineeringpipeline_spark import cleaning, gold


def _rows_per_sec(spark, sf_dir: str) -> float:
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    t0 = time.perf_counter()
    gold.daily_sales_summary(cleaning.clean_orders(orders)).write.mode("overwrite").format(
        "noop"
    ).save()
    return n / (time.perf_counter() - t0)


def test_throughput_degrades_sublinearly(spark):
    """The reference asserts throughput ratio > 0.5 between successive
    sizes (test_performance.py:203-207). 10× the rows must cost far less
    than 10× the time; warm both paths first to exclude codegen setup."""
    _rows_per_sec(spark, "/root/testdata/sf0.001")
    small = _rows_per_sec(spark, "/root/testdata/sf0.001")
    big = _rows_per_sec(spark, "/root/testdata/sf0.01")
    # per-row throughput should IMPROVE with size locally (fixed overhead
    # amortizes); the reference's bound is ratio > 0.5 — assert that.
    assert big / small > 0.5, f"throughput degraded: {small:.0f} -> {big:.0f} rows/s"


def _keyed_rows_per_sec(spark, sf_dir: str, fn) -> float:
    from dataengineeringpipeline_spark.cache import release_caches
    from dataengineeringpipeline_spark.datalake import load_events

    ev = load_events(spark, sf_dir)
    n = ev.count()
    t0 = time.perf_counter()
    fn(ev).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    release_caches()
    spark.catalog.clearCache()
    return n / dt


def test_new_operator_throughput_degrades_sublinearly(spark):
    """The reference's >0.5 throughput-ratio bound, applied to this
    round's operators: CMS heavy hitters (sketch agg + broadcast
    estimate) and the windowed top-k ranking shape. 10× the events must
    not cost 10× the time."""
    from dataengineeringpipeline_spark import scale
    from pyspark.sql.window import Window

    def cms(ev):
        return scale.cms_heavy_hitters(ev, "user_id", top_n=20)

    def windowed_topk(ev):
        counts = ev.groupBy(
            ((F.col("ts_us") / 3_600_000_000).cast("long")).alias("w"), "user_id"
        ).agg(F.count(F.lit(1)).alias("events"))
        rnk = F.row_number().over(Window.partitionBy("w").orderBy(F.desc("events"), "user_id"))
        return counts.withColumn("r", rnk).filter(F.col("r") <= 5)

    for fn in (cms, windowed_topk):
        _keyed_rows_per_sec(spark, "/root/testdata/sf0.001", fn)  # warm
        small = _keyed_rows_per_sec(spark, "/root/testdata/sf0.001", fn)
        big = _keyed_rows_per_sec(spark, "/root/testdata/sf0.01", fn)
        assert big / small > 0.5, f"{fn.__name__} degraded: {small:.0f} -> {big:.0f} rows/s"


def test_parquet_beats_json_format(spark, tmp_path):
    """Format requirement from the reference (test_performance.py:415-449).

    The reference compared pandas *indented-JSON* write time vs pyarrow —
    in Spark both writers are task-overhead-bound at this size, so write
    wall-time is noise. The properties that actually hold (and matter at
    100 TB) are deterministic: columnar+snappy parquet is far smaller on
    disk, and a single-column read prunes in parquet but must parse every
    row in JSON."""
    import os

    df = cleaning.clean_orders(
        spark.read.parquet("/root/testdata/sf0.1/orders.parquet")
    ).cache()
    df.count()
    df.write.mode("overwrite").parquet(str(tmp_path / "p"))
    df.write.mode("overwrite").json(str(tmp_path / "j"))
    df.unpersist()

    def _bytes(d):
        return sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(d)
            for f in fs
            if not f.startswith(("_", "."))
        )

    parquet_bytes, json_bytes = _bytes(tmp_path / "p"), _bytes(tmp_path / "j")
    assert parquet_bytes * 3 < json_bytes, f"{parquet_bytes} vs {json_bytes}"

    # warm both read paths, then time a one-column aggregate
    for d in ("p", "j"):
        spark.read.format("parquet" if d == "p" else "json").load(str(tmp_path / d)).limit(
            10
        ).collect()
    t0 = time.perf_counter()
    spark.read.parquet(str(tmp_path / "p")).agg(F.sum("total_price")).collect()
    t_parquet = time.perf_counter() - t0
    t0 = time.perf_counter()
    spark.read.json(str(tmp_path / "j")).agg(F.sum("total_price")).collect()
    t_json = time.perf_counter() - t0
    assert t_parquet < t_json, f"parquet read {t_parquet:.2f}s vs json {t_json:.2f}s"


def test_partition_pruning_engages(spark, sf_dir, tmp_path):
    """A year-partitioned silver lake + a year filter must prune at the
    directory level (PartitionFilters in the scan, not a post-scan
    filter over all files)."""
    from dataengineeringpipeline_spark.datalake import Lake

    lake = Lake(str(tmp_path / "lake"))
    silver = cleaning.clean_orders(spark.read.parquet(f"{sf_dir}/orders.parquet"))
    lake.write(silver, "silver", "orders", partition_by=("order_year",))

    scan = lake.read(spark, "silver", "orders").filter(F.col("order_year") == 1995)
    buf = io.StringIO()
    with redirect_stdout(buf):
        scan.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    # the partition predicate appears in PartitionFilters, so the scan
    # only touches the 1995 directory
    pf_line = next(l for l in plan.splitlines() if "PartitionFilters" in l)
    assert "order_year" in pf_line
    assert scan.count() == silver.filter(F.col("order_year") == 1995).count()


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    buf = io.StringIO()
    with redirect_stdout(buf):
        spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
            F.col("o_totalprice") > 500_000
        ).select("o_orderkey").explain("formatted")
    plan = buf.getvalue()
    assert "GreaterThan(o_totalprice,500000" in plan  # PushedFilters
    # column pruning: ReadSchema only carries the needed columns
    rs_line = next(l for l in plan.splitlines() if "ReadSchema" in l)
    assert "o_orderdate" not in rs_line


def _docs_rows_per_sec(spark, sf_dir: str, fn) -> float:
    from dataengineeringpipeline_spark.cache import release_caches

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    t0 = time.perf_counter()
    fn(docs).write.mode("overwrite").format("noop").save()
    dt = time.perf_counter() - t0
    release_caches()
    spark.catalog.clearCache()
    return n / dt


def test_span_and_distribution_throughput_degrades_sublinearly(spark):
    """The reference's >0.5 throughput-ratio bound applied to the
    substring-span dedup and the length-distribution profile: 10× the
    documents must not cost 10× the time."""
    from dataengineeringpipeline_spark.operators.dedup import duplicate_span_coverage
    from dataengineeringpipeline_spark.operators.text import doc_length_distribution

    for fn in (duplicate_span_coverage, doc_length_distribution):
        _docs_rows_per_sec(spark, "/root/testdata/sf0.001", fn)  # warm
        small = _docs_rows_per_sec(spark, "/root/testdata/sf0.001", fn)
        big = _docs_rows_per_sec(spark, "/root/testdata/sf0.01", fn)
        assert big / small > 0.5, f"{fn.__name__} degraded: {small:.0f} -> {big:.0f} rows/s"


def test_round5_operator_throughput_degrades_sublinearly(spark):
    """The reference's >0.5 throughput-ratio bound applied to this
    round's operators: BPE training (the corpus pass is the word count;
    the merge loop runs on the vocab), the subword-stats apply pass,
    and the drift report. 10× the input must not cost 10× the time.

    BPE uses noop-write of the merge table? No — training collects
    driver-side by design; time the callable end-to-end instead."""
    from dataengineeringpipeline_spark.cache import release_caches
    from dataengineeringpipeline_spark.operators import bpe
    from dataengineeringpipeline_spark import quality

    def timed_docs(sf_dir, fn):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.count()
        t0 = time.perf_counter()
        fn(docs)
        dt = time.perf_counter() - t0
        release_caches()
        spark.catalog.clearCache()
        return n / dt

    def train(docs):
        bpe.bpe_train(docs, n_merges=4)

    def subwords(docs):
        bpe.bpe_subword_stats(docs, n_merges=2).collect()

    for fn in (train, subwords):
        timed_docs("/root/testdata/sf0.001", fn)  # warm
        small = timed_docs("/root/testdata/sf0.001", fn)
        big = timed_docs("/root/testdata/sf0.01", fn)
        assert big / small > 0.5, f"{fn.__name__} degraded: {small:.0f} -> {big:.0f} rows/s"

    def drift(ev):
        # split at mid-January so both periods are populated
        return quality.category_drift(ev, "event_type", "ts_us", 1705276800000000)

    _keyed_rows_per_sec(spark, "/root/testdata/sf0.001", drift)  # warm
    small = _keyed_rows_per_sec(spark, "/root/testdata/sf0.001", drift)
    big = _keyed_rows_per_sec(spark, "/root/testdata/sf0.01", drift)
    assert big / small > 0.5, f"drift degraded: {small:.0f} -> {big:.0f} rows/s"
