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


def test_monthly_from_partials_equals_full_recompute(spark, sf_dir):
    so = _silver(spark, sf_dir)
    inc = ivm.monthly_sales_from_partials(so).collect()
    full = gold.monthly_sales_summary(so).collect()
    # align columns: the batch summary carries the same names
    cols = inc[0].__fields__
    assert [tuple(r[c] for c in cols) for r in inc] == [
        tuple(r[c] for c in cols) for r in full
    ]


def test_customer_incremental_equals_full_recompute(spark, sf_dir):
    """Second IVM family: merged customer partials reproduce the
    11-measure batch metrics bit-for-bit (incl. the COUNT(DISTINCT
    order_year) the grain makes mergeable)."""
    so = _silver(spark, sf_dir)
    cols = gold.customer_lifetime_metrics(so).columns
    inc = sorted(
        tuple(r[c] for c in cols)
        for r in ivm.incremental_customer_metrics(so).collect()
    )
    full = sorted(
        tuple(r[c] for c in cols)
        for r in gold.customer_lifetime_metrics(so).collect()
    )
    assert inc == full


def test_customer_merge_is_order_independent(spark, sf_dir):
    so = _silver(spark, sf_dir)
    cut = F.lit("1997-01-01").cast("date")
    a = ivm.customer_partials(so.filter(F.col("order_date") < cut))
    b = ivm.customer_partials(so.filter(F.col("order_date") >= cut))
    ab = sorted(
        map(
            tuple,
            ivm.customer_metrics_from_partials(
                ivm.merge_customer_partials(a, b)
            ).collect(),
        )
    )
    ba = sorted(
        map(
            tuple,
            ivm.customer_metrics_from_partials(
                ivm.merge_customer_partials(b, a)
            ).collect(),
        )
    )
    assert ab == ba


def test_maintain_customer_rewrites_only_touched_years(spark, sf_dir, tmp_path):
    """A delta of recent orders rewrites ONLY the touched order_year
    partitions — sibling years byte-identical — and the maintained
    table reconciles with the batch metrics."""
    lake = Lake(str(tmp_path / "lake"))
    so = _silver(spark, sf_dir).persist()
    hot = so.agg(F.max("order_year")).collect()[0][0]  # latest year = the delta
    base = so.filter(F.col("order_year") < hot)
    delta = so.filter(F.col("order_year") == hot)
    assert ivm.maintain_customer_partials(lake, base)
    before = _file_state(lake.path("gold", "customer_partials"))

    touched = ivm.maintain_customer_partials(lake, delta)
    assert touched == [hot]
    after = _file_state(lake.path("gold", "customer_partials"))
    hot_dir = f"order_year={hot}"
    untouched_before = {k: v for k, v in before.items() if hot_dir not in k}
    untouched_after = {k: v for k, v in after.items() if hot_dir not in k}
    assert untouched_before == untouched_after
    assert any(hot_dir in k for k in after)

    cols = gold.customer_lifetime_metrics(so).columns
    maintained = sorted(
        tuple(r[c] for c in cols)
        for r in ivm.customer_metrics_from_partials(
            lake.read(spark, "gold", "customer_partials")
        ).collect()
    )
    full = sorted(
        tuple(r[c] for c in cols)
        for r in gold.customer_lifetime_metrics(so).collect()
    )
    assert maintained == full
    so.unpersist()


def test_streaming_ivm_crash_replay(spark, sf_dir, tmp_path):
    """A wiped checkpoint commit + fresh-process restart must not
    double-count any partial (batch partition overwrites itself)."""
    import os
    import subprocess
    import sys

    from dataengineeringpipeline_spark import cleaning, streaming

    silver = cleaning.clean_orders(
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    ).select(
        "order_key", "customer_key", "order_date", "total_price", "is_complete_order"
    )
    src, state, ckpt = str(tmp_path / "in"), str(tmp_path / "state"), str(tmp_path / "ckpt")
    os.makedirs(src)
    streaming._stage_arrival_batches(silver, F.expr("order_key % 3"), src, 3)
    ddl = (
        "order_key bigint, customer_key bigint, order_date date,"
        " total_price double, is_complete_order boolean"
    )
    streaming.stream_sales_partials(spark, src, state, ckpt, ddl)
    want = sorted(
        map(
            tuple,
            ivm.daily_summary_from_partials(
                ivm.reaggregate_partials(spark.read.parquet(state).drop("batch_id"))
            ).collect(),
        )
    )
    batch = sorted(map(tuple, gold.daily_sales_summary(silver).collect()))
    assert want == batch

    last = max(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", last))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    script = f"""
import sys; sys.path.insert(0, {os.getcwd()!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from dataengineeringpipeline_spark import ivm, streaming
streaming.stream_sales_partials(spark, {src!r}, {state!r}, {ckpt!r}, {ddl!r})
rows = ivm.daily_summary_from_partials(
    ivm.reaggregate_partials(spark.read.parquet({state!r}).drop("batch_id"))).collect()
print("REPLAY_SUM", sum(r["total_orders"] for r in rows))
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    line = next(l for l in proc.stdout.splitlines() if l.startswith("REPLAY_SUM"))
    total = sum(r[1] for r in want)  # total_orders is column 2 of the summary
    assert int(line.split()[1]) == total


def test_rule_ivm_matches_batch_compiler_bit_for_bit(spark, sf_dir):
    """Generic rule-IVM: partials fold of the configured demo rule ==
    the batch rule compiler, including stddev and count_distinct; the
    explicit merge step collapses stacked partials without changing the
    fold."""
    from dataengineeringpipeline_spark import rules

    so = _silver(spark, sf_dir)
    rule = rules.MONTHLY_REVENUE_RULE
    cols = rules.apply_aggregation_rule(so, rule).columns
    batch = sorted(
        tuple(r[c] for c in cols)
        for r in rules.apply_aggregation_rule(so, rule).collect()
    )
    cut = F.lit("1997-06-01").cast("date")
    base = ivm.rule_partials(so.filter(F.col("order_date") < cut), rule)
    delta = ivm.rule_partials(so.filter(F.col("order_date") >= cut), rule)
    stacked = base.unionByName(delta)
    inc = sorted(
        tuple(r[c] for c in cols)
        for r in ivm.rule_summary_from_partials(stacked, rule).collect()
    )
    assert inc == batch
    merged = ivm.merge_rule_partials(stacked, rule)
    inc2 = sorted(
        tuple(r[c] for c in cols)
        for r in ivm.rule_summary_from_partials(merged, rule).collect()
    )
    assert inc2 == batch
    # the merge actually collapsed grain duplicates
    assert merged.count() <= stacked.count()


def test_rule_ivm_global_agg_and_global_approx(spark, sf_dir):
    from dataengineeringpipeline_spark import rules

    so = _silver(spark, sf_dir)
    glob = rules.AggregationRule(
        name="global",
        group_by_columns=(),
        aggregate_columns=(
            rules.AggregateColumn("total_price", "sum", "rev"),
            rules.AggregateColumn("customer_key", "count_distinct", "nc"),
        ),
        filters="is_complete_order",
    )
    batch = rules.apply_aggregation_rule(so, glob).collect()[0]
    got = ivm.rule_summary_from_partials(ivm.rule_partials(so, glob), glob).collect()[0]
    assert tuple(got) == tuple(batch)

    # approx-only GLOBAL rule (empty grain): the register map rides a
    # single partials row; one-shot and base/delta-merged estimates are
    # bit-identical (the crossJoin fold path)
    approx_glob = rules.AggregationRule(
        name="approx_global",
        group_by_columns=(),
        aggregate_columns=(
            rules.AggregateColumn("customer_key", "approx_count_distinct", "nc"),
        ),
        filters="is_complete_order",
    )
    one = ivm.rule_summary_from_partials(
        ivm.rule_partials(so, approx_glob), approx_glob
    ).collect()[0]
    cut = F.lit("1998-06-01").cast("date")
    stacked = ivm.rule_partials(so.filter(F.col("order_date") < cut), approx_glob).unionByName(
        ivm.rule_partials(so.filter(F.col("order_date") >= cut), approx_glob)
    )
    two = ivm.rule_summary_from_partials(stacked, approx_glob).collect()[0]
    assert one["nc"] == two["nc"] and one["nc"] > 0


def test_streaming_rule_ivm_crash_replay(spark, sf_dir, tmp_path):
    """Config-driven streaming: wiping the last commit and re-draining
    in a fresh process leaves the folded rule summary identical (batch
    partitions overwrite themselves)."""
    import os
    import subprocess
    import sys

    from dataengineeringpipeline_spark import cleaning, rules, streaming

    silver = cleaning.clean_orders(
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    ).select(
        "order_key", "customer_key", "order_year", "order_month",
        "order_status", "total_price", "is_complete_order",
    )
    src, state, ckpt = (str(tmp_path / p) for p in ("in", "state", "ckpt"))
    os.makedirs(src)
    streaming._stage_arrival_batches(silver, F.expr("order_key % 3"), src, 3)
    ddl = (
        "order_key bigint, customer_key bigint, order_year int, order_month int,"
        " order_status string, total_price double, is_complete_order boolean"
    )
    rule = rules.MONTHLY_REVENUE_RULE
    streaming.stream_rule_partials(spark, rule, src, state, ckpt, ddl)

    def summary():
        stacked = spark.read.parquet(state).drop("batch_id")
        return sorted(
            map(tuple, ivm.rule_summary_from_partials(stacked, rule).collect())
        )

    want = sorted(map(tuple, rules.apply_aggregation_rule(silver, rule).collect()))
    assert summary() == want

    last = max(
        f for f in os.listdir(os.path.join(ckpt, "commits")) if not f.startswith(".")
    )
    os.remove(os.path.join(ckpt, "commits", last))
    crc = os.path.join(ckpt, "commits", f".{last}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    script = f"""
import sys; sys.path.insert(0, {os.getcwd()!r})
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[4]")
         .config("spark.sql.shuffle.partitions","4").config("spark.ui.enabled","false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from dataengineeringpipeline_spark import streaming
from dataengineeringpipeline_spark.rules import MONTHLY_REVENUE_RULE
streaming.stream_rule_partials(spark, MONTHLY_REVENUE_RULE, {src!r}, {state!r}, {ckpt!r}, {ddl!r})
print("REPLAY_DONE")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert summary() == want


def test_maintain_rule_partials_prunes_and_reconciles(spark, sf_dir, tmp_path):
    """Generic rule maintenance: a delta bounded on one grain value
    rewrites only that partition; the maintained table folds to the
    batch rule output bit-for-bit; a non-grain partition_col is
    rejected."""
    from dataengineeringpipeline_spark import rules

    lake = Lake(str(tmp_path / "lake"))
    so = _silver(spark, sf_dir).persist()
    rule = rules.MONTHLY_REVENUE_RULE
    hot = so.agg(F.max("order_year")).collect()[0][0]
    base = so.filter(F.col("order_year") < hot)
    delta = so.filter(F.col("order_year") == hot)
    assert ivm.maintain_rule_partials(lake, base, rule, "order_year")
    tname = f"{rule.name}_partials"
    before = _file_state(lake.path("gold", tname))

    touched = ivm.maintain_rule_partials(lake, delta, rule, "order_year")
    assert touched == [hot]
    after = _file_state(lake.path("gold", tname))
    hot_dir = f"order_year={hot}"
    assert {k: v for k, v in before.items() if hot_dir not in k} == {
        k: v for k, v in after.items() if hot_dir not in k
    }

    cols = rules.apply_aggregation_rule(so, rule).columns
    maintained = sorted(
        tuple(r[c] for c in cols)
        for r in ivm.rule_summary_from_partials(
            lake.read(spark, "gold", tname), rule
        ).collect()
    )
    batch = sorted(
        tuple(r[c] for c in cols)
        for r in rules.apply_aggregation_rule(so, rule).collect()
    )
    assert maintained == batch
    so.unpersist()

    try:
        ivm.maintain_rule_partials(lake, delta, rule, "order_date")
        raise AssertionError("expected ValueError for non-grain partition col")
    except ValueError:
        pass


def test_maintain_retry_with_batch_id_is_noop(spark, sf_dir, tmp_path):
    """Exactly-once maintenance: re-applying the same delta under the
    same batch_id must change NOTHING (the applied-batch ledger rides
    the atomic swap), where a retry without batch_id would double-count
    the delta into the touched partitions."""
    lake = Lake(str(tmp_path / "lake"))
    so = _silver(spark, sf_dir).persist()
    cut = F.lit("1998-06-01").cast("date")
    base = so.filter(F.col("order_date") < cut)
    delta = so.filter(F.col("order_date") >= cut)
    assert ivm.maintain_sales_partials(lake, base, batch_id="b0")
    assert ivm.maintain_sales_partials(lake, delta, batch_id="b1")
    state1 = _file_state(lake.path("gold", "sales_partials"))
    want = [
        tuple(r)
        for r in ivm.daily_summary_from_partials(
            lake.read(spark, "gold", "sales_partials")
        ).collect()
    ]
    # retry of an applied batch: byte-identical no-op
    assert ivm.maintain_sales_partials(lake, delta, batch_id="b1") == []
    assert _file_state(lake.path("gold", "sales_partials")) == state1
    got = [
        tuple(r)
        for r in ivm.daily_summary_from_partials(
            lake.read(spark, "gold", "sales_partials")
        ).collect()
    ]
    assert got == want == [tuple(r) for r in gold.daily_sales_summary(so).collect()]
    so.unpersist()


def test_maintain_crash_recovery_never_leaves_a_mixed_table(spark, sf_dir, tmp_path):
    """Simulated crashes around the maintenance swap: (a) a stale stage
    dir from a crash mid-stage-write, (b) a crash between the two swap
    renames (live path gone, old copy stranded). In both cases the next
    maintenance call recovers and applies the delta exactly once."""
    import shutil

    lake = Lake(str(tmp_path / "lake"))
    so = _silver(spark, sf_dir).persist()
    cut = F.lit("1998-06-01").cast("date")
    base, delta = so.filter(F.col("order_date") < cut), so.filter(F.col("order_date") >= cut)
    ivm.maintain_sales_partials(lake, base, batch_id="b0")
    path = lake.path("gold", "sales_partials")

    # (a) crash mid-stage-write: junk stage dir beside the live table
    os.makedirs(path + "__upserting/order_date=junk", exist_ok=True)
    ivm.maintain_sales_partials(lake, delta, batch_id="b1")
    assert not os.path.exists(path + "__upserting")
    want = [
        tuple(r)
        for r in ivm.daily_summary_from_partials(
            lake.read(spark, "gold", "sales_partials")
        ).collect()
    ]
    assert want == [tuple(r) for r in gold.daily_sales_summary(so).collect()]

    # (b) crash between the swap renames: live absent, old stranded
    os.rename(path, path + "__preupsert")
    ivm.maintain_sales_partials(lake, delta, batch_id="b1")  # recover + no-op
    assert os.path.isdir(path) and not os.path.exists(path + "__preupsert")
    got = [
        tuple(r)
        for r in ivm.daily_summary_from_partials(
            lake.read(spark, "gold", "sales_partials")
        ).collect()
    ]
    assert got == want
    so.unpersist()


def test_ndv_rule_estimate_accuracy_and_face_identity(spark, sf_dir):
    """The approx-NDV rule's folded ESTIMATE (sketch-union HLL): (a)
    bit-identical between the one-shot and base/delta-merged faces (the
    registers are identical, so the same IEEE fold runs on both), and
    (b) within 3× the sketch's theoretical relative error (1.04/√m) of
    the exact distinct count for every group."""
    import math

    from dataengineeringpipeline_spark.rules import NDV_RULE as rule
    from dataengineeringpipeline_spark.scale import HLL_P

    so = _silver(spark, sf_dir).persist()
    one_shot = ivm.rule_summary_from_partials(ivm.rule_partials(so, rule), rule)
    cut = F.lit("1998-06-01").cast("date")
    base = ivm.rule_partials(so.filter(F.col("order_date") < cut), rule)
    delta = ivm.rule_partials(so.filter(F.col("order_date") >= cut), rule)
    merged = ivm.rule_summary_from_partials(
        ivm.merge_rule_partials(base.unionByName(delta), rule), rule
    )
    a = {r["order_status"]: r for r in one_shot.collect()}
    b = {r["order_status"]: r for r in merged.collect()}
    assert set(a) == set(b) and len(a) >= 2
    for k in a:
        assert a[k]["approx_customers"] == b[k]["approx_customers"]  # bit-identical
        assert a[k]["order_count"] == b[k]["order_count"]

    exact = {
        r["order_status"]: r["ndv"]
        for r in so.filter("is_complete_order")
        .groupBy("order_status")
        .agg(F.countDistinct("customer_key").alias("ndv"))
        .collect()
    }
    bound = 3 * 1.04 / math.sqrt(1 << HLL_P)
    for k, row in a.items():
        rel = abs(row["approx_customers"] - exact[k]) / exact[k]
        assert rel <= bound, f"{k}: est {row['approx_customers']} vs {exact[k]} ({rel:.3%})"
    so.unpersist()


def test_fold_stream_partials_compacts_state_exactly_once(spark, sf_dir, tmp_path):
    """Stream-state compaction: drained batch_id partials fold into the
    maintained partitioned table (summary == batch recompute), folded
    batch dirs are deleted, a re-fold is a no-op, and a crash between
    the fold's swap and the dir deletes self-heals (leftover dirs are
    removed, nothing double-counts)."""
    from dataengineeringpipeline_spark import cleaning, streaming

    silver = cleaning.clean_orders(
        spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    ).select(
        "order_key", "customer_key", "order_date", "total_price", "is_complete_order"
    )
    cut = F.lit("1998-06-01").cast("date")
    early, late = silver.filter(F.col("order_date") < cut), silver.filter(
        F.col("order_date") >= cut
    )
    src, state, ckpt = str(tmp_path / "in"), str(tmp_path / "state"), str(tmp_path / "ckpt")
    os.makedirs(src)
    streaming._stage_arrival_batches(early, F.expr("order_key % 3"), src, 3)
    ddl = (
        "order_key bigint, customer_key bigint, order_date date,"
        " total_price double, is_complete_order boolean"
    )
    streaming.stream_sales_partials(
        spark, src, state, ckpt, ddl, max_files_per_trigger=1
    )

    lake = Lake(str(tmp_path / "lake"))
    folded = ivm.fold_stream_partials(
        spark, lake, state, "gold", "sales_partials", "order_date", ivm.merge_partials
    )
    assert folded == [0, 1, 2]
    assert not any(d.startswith("batch_id=") for d in os.listdir(state))
    got = sorted(
        map(
            tuple,
            ivm.daily_summary_from_partials(
                lake.read(spark, "gold", "sales_partials")
            ).collect(),
        )
    )
    want = sorted(map(tuple, gold.daily_sales_summary(early).collect()))
    assert got == want

    # crash between swap and deletes: resurrect a folded batch dir —
    # its id is in the ledger, so the re-fold must not double-count
    ghost = os.path.join(state, "batch_id=0")
    os.makedirs(ghost)
    ivm.sales_partials(early.filter(F.col("order_key") % 3 == 0)).write.mode(
        "overwrite"
    ).parquet(ghost)
    assert ivm.fold_stream_partials(
        spark, lake, state, "gold", "sales_partials", "order_date", ivm.merge_partials
    ) == []
    assert not os.path.exists(ghost)  # leftover removed, state clean
    still = sorted(
        map(
            tuple,
            ivm.daily_summary_from_partials(
                lake.read(spark, "gold", "sales_partials")
            ).collect(),
        )
    )
    assert still == want

    # a second streamed increment — its own feed (source, checkpoint,
    # state dir; a fresh stream restarts batch ids at 0, so it folds
    # under its own feed namespace in the shared table's ledger)
    assert ivm.fold_stream_partials(
        spark, lake, state, "gold", "sales_partials", "order_date", ivm.merge_partials
    ) == []  # first feed is fully folded already: re-fold is a no-op
    src2, state2, ckpt2 = (
        str(tmp_path / "in2"),
        str(tmp_path / "state2"),
        str(tmp_path / "ckpt2"),
    )
    os.makedirs(src2)
    streaming._stage_arrival_batches(late, F.expr("order_key % 2"), src2, 2)
    streaming.stream_sales_partials(spark, src2, state2, ckpt2, ddl)
    folded2 = ivm.fold_stream_partials(
        spark, lake, state2, "gold", "sales_partials", "order_date",
        ivm.merge_partials, feed="feed2",
    )
    assert folded2 == [0]
    final = sorted(
        map(
            tuple,
            ivm.daily_summary_from_partials(
                lake.read(spark, "gold", "sales_partials")
            ).collect(),
        )
    )
    assert final == sorted(map(tuple, gold.daily_sales_summary(silver).collect()))


def test_quartile_rule_faces_match_batch_bit_for_bit(spark, sf_dir):
    """Percentile rule-IVM: value-histogram partials fold to EXACTLY the
    batch compiler's F.percentile results across a base/delta split,
    through the explicit merge, and merge order cannot perturb them."""
    from dataengineeringpipeline_spark import rules

    so = _silver(spark, sf_dir)
    rule = rules.QUARTILE_RULE
    cols = rules.apply_aggregation_rule(so, rule).columns
    batch = sorted(
        tuple(r[c] for c in cols)
        for r in rules.apply_aggregation_rule(so, rule).collect()
    )
    cut = F.lit("1997-06-01").cast("date")
    base = ivm.rule_partials(so.filter(F.col("order_date") < cut), rule)
    delta = ivm.rule_partials(so.filter(F.col("order_date") >= cut), rule)
    for stacked in (base.unionByName(delta), delta.unionByName(base)):
        inc = sorted(
            tuple(r[c] for c in cols)
            for r in ivm.rule_summary_from_partials(stacked, rule).collect()
        )
        assert inc == batch
        merged = ivm.merge_rule_partials(stacked, rule)
        inc2 = sorted(
            tuple(r[c] for c in cols)
            for r in ivm.rule_summary_from_partials(merged, rule).collect()
        )
        assert inc2 == batch


def test_percentile_fold_matches_engine_on_hostile_values(spark):
    """The histogram fold replays F.percentile's interpolation
    arithmetic bit-for-bit — probed on doubles with duplicates,
    negatives, awkward fractions (p=0.37), one-row groups, an all-null
    group (percentile must be null, row must survive), and a group
    split across three partial slices."""
    import random

    from dataengineeringpipeline_spark import rules
    from dataengineeringpipeline_spark.rules import AggregateColumn, AggregationRule

    rng = random.Random(421)
    rows = []
    for g in ["a", "b", "c", "one_row", "all_null"]:
        n = {"one_row": 1, "all_null": 4}.get(g, 157)
        for i in range(n):
            v = None if g == "all_null" else rng.choice(
                [rng.uniform(-1e6, 1e6), float(rng.randint(-5, 5)), 0.125]
            )
            rows.append((g, i % 3, v))
    df = spark.createDataFrame(rows, "grp string, slice int, x double")
    rule = AggregationRule(
        name="hostile_pctl",
        group_by_columns=("grp",),
        aggregate_columns=(
            AggregateColumn("x", "percentile", "p37", 0.37),
            AggregateColumn("x", "median", "med"),
            AggregateColumn("x", "percentile", "p99", 0.99),
        ),
    )
    cols = ["grp", "p37", "med", "p99"]
    batch = sorted(
        tuple(r[c] for c in cols)
        for r in rules.apply_aggregation_rule(df, rule).collect()
    )
    parts = [
        ivm.rule_partials(df.filter(F.col("slice") == s), rule) for s in range(3)
    ]
    stacked = parts[0].unionByName(parts[1]).unionByName(parts[2])
    inc = sorted(
        tuple(r[c] for c in cols)
        for r in ivm.rule_summary_from_partials(stacked, rule).collect()
    )
    assert inc == batch
    null_rows = [t for t in inc if t[0] == "all_null"]
    assert null_rows == [("all_null", None, None, None)]


def test_customer_analytics_fold_matches_batch_bit_for_bit(spark, sf_dir):
    """The full customer-360 row (dims ⟕ metrics ⟕ size pivot + RFM +
    lifecycle) folded off partials == gold.customer_analytics."""
    import os

    from dataengineeringpipeline_spark import cleaning

    so = _silver(spark, sf_dir)
    sc = cleaning.clean_customers(
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet")),
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet")),
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")),
    ).drop("geography")
    batch = gold.customer_analytics(sc, so)
    cols = batch.columns
    b = sorted(tuple(r[c] for c in cols) for r in batch.collect())
    fold = ivm.customer_analytics_from_partials(sc, ivm.customer_partials(so))
    f = sorted(tuple(r[c] for c in cols) for r in fold.collect())
    assert f == b


def test_refresh_customer_analytics_is_delta_sized_and_idempotent(spark, sf_dir, tmp_path):
    """The in-place gold refresh rewrites only the touched keys' files
    (untouched gold files hard-link through byte-identical), lands the
    table exactly where the full recompute would, and a crash-replayed
    batch_id is a no-op on both the partials and the gold merge."""
    import os

    from dataengineeringpipeline_spark import cleaning

    so = _silver(spark, sf_dir).persist()
    sc = cleaning.clean_customers(
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet")),
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet")),
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")),
    ).drop("geography").persist()
    cut = F.lit("1998-06-01").cast("date")
    base = so.filter(F.col("order_date") < cut)
    # a KEY-NARROW delta (one customer-key range) so the footer prune has
    # something to prune: real refresh batches are skewed, not uniform
    max_key = so.agg(F.max("customer_key")).collect()[0][0]
    delta = so.filter(
        (F.col("order_date") >= cut) & (F.col("customer_key") <= max_key // 10)
    )
    so_used = base.unionByName(delta)
    lake = Lake(str(tmp_path / "lake"))
    ivm.maintain_customer_partials(lake, base)
    initial = ivm.customer_analytics_from_partials(
        sc, lake.read(spark, "gold", "customer_partials")
    )
    lake.write(
        initial.repartitionByRange(8, "customer_key").sortWithinPartitions(
            "customer_key"
        ),
        "gold",
        "customer_analytics",
    )
    gpath = lake.path("gold", "customer_analytics")

    def inodes():
        return {
            f: os.stat(os.path.join(gpath, f)).st_ino
            for f in os.listdir(gpath)
            if f.endswith(".parquet")
        }

    before = inodes()
    rep = ivm.refresh_customer_analytics(
        lake, spark, sc, delta, refresh_seq=1, batch_id="b1"
    )
    assert 0 < rep["files_rewritten"] < rep["files_total"]
    after = inodes()
    linked = set(before) & set(after)
    assert linked and all(before[f] == after[f] for f in linked)
    # refreshed table == full recompute over base ∪ delta, bit for bit
    full = gold.customer_analytics(sc, so_used)
    cols = full.columns
    want = sorted(tuple(r[c] for c in cols) for r in full.collect())
    got = sorted(
        tuple(r[c] for c in cols)
        for r in lake.read(spark, "gold", "customer_analytics").collect()
    )
    assert got == want
    # crash replay: same batch_id is a no-op end to end
    rep2 = ivm.refresh_customer_analytics(
        lake, spark, sc, delta, refresh_seq=1, batch_id="b1"
    )
    assert rep2.get("skipped_replay") is True
    got2 = sorted(
        tuple(r[c] for c in cols)
        for r in lake.read(spark, "gold", "customer_analytics").collect()
    )
    assert got2 == want
    so.unpersist(); sc.unpersist()


def test_quartile_rule_partials_persist_through_maintenance(spark, sf_dir, tmp_path):
    """Value-histogram (map-typed) partials survive the parquet
    round-trip through crash-safe partitioned maintenance: base load +
    delta upsert on the rule's grain partition, then the fold off the
    stored table equals the one-shot batch compiler."""
    from dataengineeringpipeline_spark import rules

    rule = rules.QUARTILE_RULE
    so = _silver(spark, sf_dir)
    cut = F.lit("1997-06-01").cast("date")
    lake = Lake(str(tmp_path / "lake"))
    ivm.maintain_rule_partials(
        lake, so.filter(F.col("order_date") < cut), rule, "order_status"
    )
    ivm.maintain_rule_partials(
        lake, so.filter(F.col("order_date") >= cut), rule, "order_status"
    )
    stored = lake.read(spark, "gold", f"{rule.name}_partials")
    cols = rules.apply_aggregation_rule(so, rule).columns
    batch = sorted(
        tuple(r[c] for c in cols)
        for r in rules.apply_aggregation_rule(so, rule).collect()
    )
    inc = sorted(
        tuple(r[c] for c in cols)
        for r in ivm.rule_summary_from_partials(stored, rule).collect()
    )
    assert inc == batch


def test_refresh_rule_summary_is_delta_sized_and_idempotent(spark, sf_dir, tmp_path):
    """The generic rule-summary refresh: only the delta's groups are
    replaced (composite-grain merge), the maintained table equals the
    batch rule compiler bit-for-bit, and a replayed batch_id is a no-op
    on both ledgers."""
    from dataengineeringpipeline_spark import rules

    rule = rules.MONTHLY_REVENUE_RULE
    so = _silver(spark, sf_dir).persist()
    cut = F.lit("1998-06-01").cast("date")
    base, delta = so.filter(F.col("order_date") < cut), so.filter(F.col("order_date") >= cut)
    lake = Lake(str(tmp_path / "lake"))
    ivm.maintain_rule_partials(lake, base, rule, "order_year")
    initial = ivm.rule_summary_from_partials(
        lake.read(spark, "gold", f"{rule.name}_partials"), rule
    )
    lake.write(
        initial.repartitionByRange(4, "order_year").sortWithinPartitions(
            "order_year", "order_month"
        ),
        "gold",
        f"{rule.name}_summary",
    )
    rep = ivm.refresh_rule_summary(
        lake, spark, rule, delta, "order_year", refresh_seq=1, batch_id="r1"
    )
    assert 0 < rep["files_rewritten"] < rep["files_total"]
    cols = rules.apply_aggregation_rule(so, rule).columns
    want = sorted(
        tuple(r[c] for c in cols)
        for r in rules.apply_aggregation_rule(so, rule).collect()
    )
    got = sorted(
        tuple(r[c] for c in cols)
        for r in lake.read(spark, "gold", f"{rule.name}_summary").collect()
    )
    assert got == want
    rep2 = ivm.refresh_rule_summary(
        lake, spark, rule, delta, "order_year", refresh_seq=1, batch_id="r1"
    )
    assert rep2.get("skipped_replay") is True
    got2 = sorted(
        tuple(r[c] for c in cols)
        for r in lake.read(spark, "gold", f"{rule.name}_summary").collect()
    )
    assert got2 == want
    so.unpersist()


def test_mixed_measure_rule_faces_are_identical(spark, sf_dir):
    """A rule mixing ALL partial kinds — exact sums/counts, a
    count_distinct grain, an approx-NDV register map, and two
    percentile histograms — folds identically from one-shot partials
    and from base/delta merged partials (face identity), and the
    non-sketch measures equal the batch compiler bit-for-bit."""
    from dataengineeringpipeline_spark import rules
    from dataengineeringpipeline_spark.rules import AggregateColumn, AggregationRule

    rule = AggregationRule(
        name="mixed_all_kinds",
        group_by_columns=("order_status",),
        aggregate_columns=(
            AggregateColumn("total_price", "sum", "revenue"),
            AggregateColumn("order_key", "count", "n"),
            AggregateColumn("order_month", "count_distinct", "months"),
            AggregateColumn("customer_key", "approx_count_distinct", "approx_cust"),
            AggregateColumn("days_since_order", "median", "med_age"),
            AggregateColumn("days_since_order", "percentile", "p90_age", 0.9),
        ),
        filters="is_complete_order",
    )
    so = _silver(spark, sf_dir)
    cut = F.lit("1997-06-01").cast("date")
    one_shot = ivm.rule_summary_from_partials(ivm.rule_partials(so, rule), rule)
    base = ivm.rule_partials(so.filter(F.col("order_date") < cut), rule)
    delta = ivm.rule_partials(so.filter(F.col("order_date") >= cut), rule)
    merged = ivm.rule_summary_from_partials(
        ivm.merge_rule_partials(base.unionByName(delta), rule), rule
    )
    cols = ["order_status", "revenue", "n", "months", "approx_cust", "med_age", "p90_age"]
    a = sorted(tuple(r[c] for c in cols) for r in one_shot.collect())
    b = sorted(tuple(r[c] for c in cols) for r in merged.collect())
    assert a == b  # face identity incl. the sketch estimate
    # non-sketch measures equal the batch compiler
    exact_cols = ["order_status", "revenue", "n", "months", "med_age", "p90_age"]
    batch_rule = AggregationRule(
        rule.name, rule.group_by_columns,
        tuple(x for x in rule.aggregate_columns if x.alias != "approx_cust"),
        rule.filters,
    )
    batch = sorted(
        tuple(r[c] for c in exact_cols)
        for r in rules.apply_aggregation_rule(so, batch_rule).collect()
    )
    inc_exact = sorted(tuple(t[cols.index(c)] for c in exact_cols) for t in a)
    assert inc_exact == batch


def test_migrate_rule_rebuilds_changed_schema_bit_for_bit(spark, sf_dir, tmp_path):
    """VERDICT r08 gap 3: adding a measure to a rule whose partials +
    summary tables already exist migrates via migrate_rule — the
    rebuilt, then delta-refreshed summary equals the one-shot batch
    compiler of the NEW config bit-for-bit; ledgers survive the
    rebuild; a matching schema is a no-op."""
    import json

    from dataengineeringpipeline_spark.rules import (
        MONTHLY_REVENUE_RULE,
        AggregateColumn,
        AggregationRule,
        apply_aggregation_rule,
    )

    so = _silver(spark, sf_dir)
    cut = F.lit("1998-06-01").cast("date")
    base = so.filter(F.col("order_date") < cut)
    delta = so.filter(F.col("order_date") >= cut)
    old = MONTHLY_REVENUE_RULE
    new = AggregationRule(
        name=old.name,
        group_by_columns=old.group_by_columns,
        aggregate_columns=(
            *old.aggregate_columns,
            AggregateColumn("total_price", "min", "min_order_value"),
        ),
        filters=old.filters,
    )
    lake = Lake(str(tmp_path))
    ivm.maintain_rule_partials(lake, base, old, "order_year", batch_id="b0")
    lake.write(
        ivm.rule_summary_from_partials(
            lake.read(spark, "gold", f"{old.name}_partials"), old
        ),
        "gold",
        f"{old.name}_summary",
    )
    rep = ivm.migrate_rule(lake, spark, new, base, "order_year")
    assert rep["migrated"]
    assert rep["added_columns"] == ["_min_total_price"]
    assert rep["dropped_columns"] == []
    # the applied-batch ledger rode the rebuild: a replay of b0 is a no-op
    from dataengineeringpipeline_spark.datalake import _read_ledger

    assert "b0" in _read_ledger(lake.path("gold", f"{old.name}_partials"))
    assert ivm.maintain_rule_partials(lake, base, new, "order_year", batch_id="b0") == []
    # second migrate: no-op
    assert not ivm.migrate_rule(lake, spark, new, base, "order_year")["migrated"]
    # ordinary delta refresh resumes on the migrated tables
    ivm.refresh_rule_summary(lake, spark, new, delta, "order_year", refresh_seq=1)
    got = sorted(
        map(tuple, lake.read(spark, "gold", f"{new.name}_summary")
            .select("order_year", "order_month", "order_status", "revenue",
                    "avg_order_value", "order_value_stddev", "order_count",
                    "unique_customers", "max_order_value", "min_order_value")
            .collect())
    )
    want = sorted(
        map(tuple, apply_aggregation_rule(so, new)
            .select("order_year", "order_month", "order_status", "revenue",
                    "avg_order_value", "order_value_stddev", "order_count",
                    "unique_customers", "max_order_value", "min_order_value")
            .collect())
    )
    assert got == want


def test_migrate_rule_validates_partition_col(spark, sf_dir, tmp_path):
    import pytest

    from dataengineeringpipeline_spark.rules import MONTHLY_REVENUE_RULE

    with pytest.raises(ValueError, match="grain column"):
        ivm.migrate_rule(
            Lake(str(tmp_path)), spark, MONTHLY_REVENUE_RULE,
            _silver(spark, sf_dir), "not_a_grain_col",
        )


def test_refresh_large_delta_avoids_broadcast_and_matches(spark, sf_dir, tmp_path, monkeypatch):
    """VERDICT r08 stretch: with merge_broadcast_keys=0 the gold refresh
    takes the large-delta path end to end — no driver key collect
    anywhere (monkeypatch-asserted), distributed merge — and the
    refreshed table still equals the full batch recompute."""
    import dataengineeringpipeline_spark.datalake as dl
    from dataengineeringpipeline_spark import cleaning as cl

    silver_customers = cl.clean_customers(
        spark.read.parquet(os.path.join(sf_dir, "customer.parquet")),
        spark.read.parquet(os.path.join(sf_dir, "nation.parquet")),
        spark.read.parquet(os.path.join(sf_dir, "region.parquet")),
    ).drop("geography")
    so = _silver(spark, sf_dir)
    cut = F.lit("1998-06-01").cast("date")
    base, delta = so.filter(F.col("order_date") < cut), so.filter(F.col("order_date") >= cut)
    lake = Lake(str(tmp_path), merge_broadcast_keys=0)
    ivm.maintain_customer_partials(lake, base)
    initial = ivm.customer_analytics_from_partials(
        silver_customers, lake.read(spark, "gold", "customer_partials")
    )
    lake.write(
        initial.repartitionByRange(8, "customer_key").sortWithinPartitions("customer_key"),
        "gold",
        "customer_analytics",
    )

    def boom(keys_df, col):
        raise AssertionError("large-delta refresh must not collect keys")

    monkeypatch.setattr(dl, "_collect_key_vals", boom)
    audit = ivm.refresh_customer_analytics(lake, spark, silver_customers, delta, refresh_seq=1)
    assert audit["key_path"] == "distributed"
    got = sorted(map(tuple, lake.read(spark, "gold", "customer_analytics").collect()))
    want = sorted(map(tuple, gold.customer_analytics(silver_customers, so).collect()))
    assert got == want


def test_migrate_rule_fingerprint_detects_same_column_set_changes(spark, tmp_path):
    """Config changes that leave the compiled partials COLUMN SET
    unchanged — a re-parameterized percentile, a changed filter, an
    alias rename — must still migrate (the fingerprint, not the column
    set, is the detector), each landing exactly where a from-scratch
    build of the new config would; refreshing with a changed config
    without migrating fails loudly."""
    import pytest

    from dataengineeringpipeline_spark import ivm
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.rules import AggregateColumn, AggregationRule

    df = spark.createDataFrame(
        [
            (1995 + i % 3, "O" if i % 2 else "F", float((i * 37) % 997))
            for i in range(600)
        ],
        "order_year int, status string, total_price double",
    )

    def mk(param=0.5, filters=None, alias="p_val"):
        return AggregationRule(
            name="fp_demo",
            group_by_columns=("order_year",),
            aggregate_columns=(
                AggregateColumn("total_price", "count", "n_rows"),
                AggregateColumn("total_price", "percentile", alias, param),
            ),
            filters=filters,
        )

    lake = Lake(str(tmp_path))
    base = mk()
    ivm.maintain_rule_partials(lake, df, base, "order_year")
    lake.write(
        ivm.rule_summary_from_partials(
            lake.read(spark, "gold", "fp_demo_partials"), base
        ),
        "gold",
        "fp_demo_summary",
    )
    # unchanged config: no-op (fingerprint recorded at first build)
    rep0 = ivm.migrate_rule(lake, spark, base, df, "order_year")
    assert rep0["migrated"] is False and "fingerprint" in rep0["reason"]

    for changed in (
        mk(param=0.9),               # same _vh partial column, new fraction
        mk(filters="status = 'O'"),  # same columns, new filter
        mk(alias="renamed_p"),       # same partials, new output alias
    ):
        rep = ivm.migrate_rule(lake, spark, changed, df, "order_year")
        assert rep["migrated"] is True, (changed, rep)
        got = sorted(
            map(tuple, lake.read(spark, "gold", "fp_demo_summary").collect())
        )
        want = sorted(
            map(
                tuple,
                ivm.rule_summary_from_partials(
                    ivm.rule_partials(df, changed), changed
                ).collect(),
            )
        )
        assert got == want, changed
        # idempotent: the same config immediately re-deploys as a no-op
        assert not ivm.migrate_rule(lake, spark, changed, df, "order_year")[
            "migrated"
        ]

    # refreshing with yet another config WITHOUT migrating fails loudly
    with pytest.raises(ValueError, match="fingerprint mismatch"):
        ivm.maintain_rule_partials(lake, df, mk(param=0.25), "order_year")


def test_migrate_rule_adopts_pre_fingerprint_tables(spark, tmp_path):
    """A partials table from before the fingerprint feature (no
    sidecar) whose columns match the compiled set is ADOPTED without a
    rebuild — the legacy detector's exact semantics — and carries a
    fingerprint afterwards, so the next same-column config change is
    caught."""
    import os

    from dataengineeringpipeline_spark import ivm
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.rules import AggregateColumn, AggregationRule

    df = spark.createDataFrame(
        [(1995 + i % 2, float(i)) for i in range(200)],
        "order_year int, total_price double",
    )
    rule = AggregationRule(
        name="legacy_demo",
        group_by_columns=("order_year",),
        aggregate_columns=(
            AggregateColumn("total_price", "percentile", "p50", 0.5),
        ),
    )
    lake = Lake(str(tmp_path))
    ivm.maintain_rule_partials(lake, df, rule, "order_year")
    fp_path = ivm._rule_fp_path(lake, "gold", "legacy_demo_partials")
    os.remove(fp_path)  # simulate a pre-fingerprint table
    rep = ivm.migrate_rule(lake, spark, rule, df, "order_year")
    assert rep["migrated"] is False and "adopted" in rep["reason"]
    assert os.path.exists(fp_path)
    # the adopted fingerprint now catches a same-column param change
    changed = AggregationRule(
        name="legacy_demo",
        group_by_columns=("order_year",),
        aggregate_columns=(
            AggregateColumn("total_price", "percentile", "p50", 0.9),
        ),
    )
    assert ivm.migrate_rule(lake, spark, changed, df, "order_year")["migrated"]
