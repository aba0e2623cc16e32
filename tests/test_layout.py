"""Z-order layout: Morton-key correctness, pruning-report invariants,
and the physical write path's actual parquet file statistics."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.operators import layout


def test_morton_key_closed_form(spark):
    """Hand-interleaved 2-bit cases: (gx, gy) -> z with x-bits at even
    positions, y-bits at odd (z = x0 + 2*y0 + 4*x1 + 8*y1)."""
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (3, 3)], "gx long, gy long"
    )
    out = {
        (r["gx"], r["gy"]): r["z"]
        for r in df.select(
            "gx", "gy", F.expr(layout._morton_expr("gx", "gy", bits=2)).alias("z")
        ).collect()
    }
    assert out == {
        (0, 0): 0,
        (1, 0): 1,
        (0, 1): 2,
        (1, 1): 3,
        (2, 0): 4,
        (0, 2): 8,
        (3, 3): 15,
    }


def test_zorder_keyed_spans_full_grid(spark):
    """Min/max rows land in grid cells 0 and 2^bits-1; a constant column
    collapses to cell 0 instead of dividing by zero."""
    df = spark.createDataFrame(
        [(1, 10, 5), (2, 20, 5), (3, 30, 5)], "event_id long, x long, y long"
    )
    keyed = {r["x"]: r for r in layout.zorder_keyed(df, "x", "y").collect()}
    assert keyed[10]["gx"] == 0 and keyed[30]["gx"] == (1 << layout.GRID_BITS) - 1
    assert all(r["gy"] == 0 for r in keyed.values())  # constant y
    # z of a (gx, 0) point is the even-bit spread of gx — strictly
    # monotone in gx, so ordering by zkey orders by x here
    zs = [keyed[x]["zkey"] for x in (10, 20, 30)]
    assert zs == sorted(zs) and zs[0] == 0


def test_layout_pruning_report_invariants(spark, sf_dir):
    """Same rows, same predicate under both layouts: row totals and true
    matches must agree; the z-ordered layout must prune at least as hard
    as arrival order (and strictly harder on real data)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    rows = {r["layout"]: r for r in layout.layout_pruning_report(events).collect()}
    a, z = rows["arrival"], rows["zorder"]
    assert a["rows_total"] == z["rows_total"]
    assert a["matching_rows"] == z["matching_rows"]
    assert z["rows_in_scanned_files"] >= z["matching_rows"]  # pruning is sound
    assert a["rows_in_scanned_files"] >= a["matching_rows"]
    assert z["files_scanned"] < a["files_scanned"]
    assert z["scan_pm"] < a["scan_pm"]


def test_zorder_rewrite_files_prune_harder_for_box_scan(spark, sf_dir, tmp_path):
    """The gauge ↔ rewrite bridge: lay the same events down
    arrival-ordered and through the production Z-order rewrite
    (``Lake.cluster_by_zorder``), read back each parquet file's ACTUAL
    (user_id, value) min/max envelope, and count files a centered box
    predicate must read. The z-ordered layout must touch fewer files —
    the physical realization of what ``layout_pruning_report``
    predicts."""
    from dataengineeringpipeline_spark.datalake import Lake, _file_stats

    events = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("event_id", "user_id", "value")
    )
    n = 8
    arrival_path = str(tmp_path / "arrival")
    (
        events.repartitionByRange(n, "event_id")
        .write.mode("overwrite")
        .parquet(arrival_path)
    )
    lake = Lake(str(tmp_path / "lake"))
    lake.write(events.repartition(n), "silver", "ev_z")
    _f, nbytes = _file_stats(lake.path("silver", "ev_z"))
    lake.cluster_by_zorder(
        spark, "silver", "ev_z", ("user_id", "value"), bits=8,
        target_file_mb=nbytes / (n * 1e6),
    )
    z_path = lake.path("silver", "ev_z")

    stats = spark.read.parquet(f"{sf_dir}/events.parquet").agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).collect()[0]
    ux_lo = stats[0] + (stats[1] - stats[0]) * 45 // 100
    ux_hi = stats[0] + (stats[1] - stats[0]) * 55 // 100
    v_lo = stats[2] + (stats[3] - stats[2]) * 0.45
    v_hi = stats[2] + (stats[3] - stats[2]) * 0.55

    def files_hit(path: str) -> int:
        hit = 0
        for f in glob.glob(f"{path}/part-*.parquet"):
            t = pq.read_table(f, columns=["user_id", "value"])
            u, v = t.column("user_id").to_pylist(), t.column("value").to_pylist()
            if not u:
                continue
            if min(u) <= ux_hi and max(u) >= ux_lo and min(v) <= v_hi and max(v) >= v_lo:
                hit += 1
        return hit

    # same rows in both layouts; helper columns must not leak
    assert spark.read.parquet(z_path).count() == events.count()
    assert set(spark.read.parquet(z_path).columns) == {"event_id", "user_id", "value"}
    assert files_hit(z_path) < files_hit(arrival_path)


def test_advise_layout_reads_real_footers(spark, tmp_path):
    """Footer-real advisor face: on a lake table written in arrival
    order with a scattered lookup key, a scattered range measure, and a
    monotone (already-clustered) range column, the recommendations
    follow the same rules the oracle-checked modeled report pins —
    bloom for the unprunable point probe, zorder for the two range
    candidates, nothing for the clustered column."""
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.operators.layout import advise_layout

    lake = Lake(str(tmp_path))
    df = spark.range(0, 40000).select(
        F.col("id").alias("seq"),  # arrival-monotone
        (F.col("id") * 2654435761 % 99991).alias("k"),  # scattered key
        (F.col("id") * 48271 % 10007).alias("v"),  # scattered measure
        (F.col("id") % 24).alias("hr"),  # low-NDV, everywhere
    )
    # arrival order: contiguous seq ranges per file
    lake.write(df.repartitionByRange(16, "seq").sortWithinPartitions("seq"), "silver", "t")
    rows = {r["col_name"]: r for r in advise_layout(
        lake, "silver", "t",
        [("k", "point"), ("v", "range"), ("hr", "range"), ("seq", "range")],
    )}
    assert rows["k"]["recommendation"] == "bloom_index"
    assert rows["seq"]["recommendation"] == "already_clustered"
    zpair = {rows["v"]["recommendation"], rows["hr"]["recommendation"]}
    assert zpair == {"zorder_with:hr", "zorder_with:v"}
    # and the advised actions are the ones the Lake actually implements
    lake.build_file_index(spark, "silver", "t", "k")
    out, rep = lake.point_lookup(spark, "silver", "t", "k", [2654435761 % 99991])
    assert rep["bloom_indexed"] and rep["files_read"] < rep["files_total"]
    # the advised rewrite is executable as advised (its amplification
    # effect at real file counts is pinned by
    # tests/test_scale.py::test_zorder_cluster_serves_both_columns)
    zrep = lake.cluster_by_zorder(spark, "silver", "t", ("v", "hr"))
    assert zrep["cluster_cols"] == ["v", "hr"]


def test_advise_layout_no_stats_column_is_not_a_candidate(spark, tmp_path):
    """A workload column with no usable stats (absent or all-NULL) gets
    a uniform-shaped 'no_stats' row and is EXCLUDED from cluster/zorder
    candidacy — recommending a rewrite on a column the table can't
    cluster would be advice the Lake cannot execute."""
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.operators.layout import advise_layout

    lake = Lake(str(tmp_path))
    df = spark.range(0, 20000).select(
        F.col("id").alias("seq"),
        (F.col("id") * 48271 % 997).alias("v"),
        F.lit(None).cast("long").alias("empty"),  # all-NULL: no stats
    )
    lake.write(df.repartitionByRange(16, "seq").sortWithinPartitions("seq"), "silver", "t")
    rows = {
        r["col_name"]: r
        for r in advise_layout(
            lake, "silver", "t",
            [("v", "range"), ("empty", "range"), ("seq", "range")],
        )
    }
    assert rows["empty"]["recommendation"] == "no_stats"
    # uniform row shape: every row carries the same keys
    assert set(rows["empty"]) == set(rows["v"])
    # the lone real candidate gets cluster_by, never zorder_with:empty
    assert rows["v"]["recommendation"] == "cluster_by"
    assert rows["seq"]["recommendation"] == "already_clustered"


def test_apply_layout_advice_closes_the_loop(spark, tmp_path):
    """observe → advise → ACT → re-advise: apply_layout_advice executes
    the advisor's plan with the Lake's own levers (one zorder rewrite
    for the top candidate pair, a bloom index for the unprunable point
    key), read amplification strictly improves on every advised range
    column, the new bloom index serves point lookups, and a re-run of
    the advisor reports the work as already done (fixpoint) — so a
    second apply is all no-ops.

    Geometry: the advisor's box is ~10% of each dimension's span, so a
    SINGLE-column range probe converges (scan_pm ≤ 200) only when each
    z-block spans ≤ 1/16 of the probed dimension. zorder_bits=4 with
    ~256 target files makes the range partitioner's boundaries SNAP to
    whole z-cells of a 16×16 grid (256 distinct z-values ≈ 1 cell per
    partition) — at the default bits=8 the boundaries fall mid-block
    and every file's envelope widens past the bar (measured scan_pm 238
    vs 125 here). The arrival layout stages 64 files so per-point read
    amplification also strictly drops (64 full-width files → ~1/16-width
    hits)."""
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark.datalake import (
        Lake,
        _file_stats,
        _read_amplification,
    )
    from dataengineeringpipeline_spark.operators.layout import apply_layout_advice

    lake = Lake(str(tmp_path))
    df = spark.range(0, 40000).select(
        F.col("id").alias("seq"),  # arrival-monotone
        (F.col("id") * 2654435761 % 99991).alias("k"),  # scattered lookup key
        (F.col("id") * 48271 % 10007).alias("v"),  # scattered measure
        (F.col("id") * 7919 % 9973).alias("w"),  # second scattered measure
    )
    lake.write(df.repartitionByRange(64, "seq").sortWithinPartitions("seq"), "silver", "t")
    path = lake.path("silver", "t")
    _files, nbytes = _file_stats(path)
    workload = [("k", "point"), ("v", "range"), ("w", "range")]
    amp_before = {c: _read_amplification(path, c) for c in ("v", "w")}
    rep = apply_layout_advice(
        lake, spark, "silver", "t", workload,
        target_file_mb=nbytes / 256e6, zorder_bits=4,
    )
    # exactly one physical rewrite: the zorder pair (never a second
    # full rewrite that would undo it)
    z = [a for a in rep["actions"] if a["action"] == "cluster_by_zorder"]
    assert len(z) == 1 and set(z[0]["cols"]) == {"v", "w"}
    assert not [a for a in rep["actions"] if a["action"] == "cluster_by"]
    # read amplification strictly improves on every advised range column
    for c in ("v", "w"):
        assert _read_amplification(path, c) < amp_before[c]
        assert z[0]["read_amplification_after"][c] < z[0]["read_amplification_before"][c]
    # the advised bloom index was built and point lookups prune through it
    assert [a["cols"] for a in rep["actions"] if a["action"] == "build_file_index"] == [["k"]]
    probe = 2654435761 % 99991
    out, lrep = lake.point_lookup(spark, "silver", "t", "k", [probe])
    assert lrep["bloom_indexed"] and lrep["files_read"] < lrep["files_total"]
    assert {r["k"] for r in out.collect()} == {probe}
    # re-advice (carried in the report) reaches the fixpoint
    after = {r["col_name"]: r["recommendation"] for r in rep["advice_after"]}
    assert after["v"] == "already_clustered"
    assert after["w"] == "already_clustered"
    assert after["k"] == "already_indexed"
    # idempotent: the second apply performs nothing
    rep2 = apply_layout_advice(
        lake, spark, "silver", "t", workload,
        target_file_mb=nbytes / 256e6, zorder_bits=4,
    )
    assert rep2["actions"] and all(a["action"] == "noop" for a in rep2["actions"])


def test_apply_layout_advice_three_candidates_terminates(spark, tmp_path):
    """3+ cluster candidates: ONE multi-column z-order rewrite serves
    all of them (no second full rewrite ever undoes the first), read
    amplification strictly improves on every candidate, and when the
    coarse toy-scale file count can't push the modeled scan cost below
    the candidate bar, a repeat apply recognizes the recorded layout
    and performs NO rewrite (already_applied_layout) — the apply loop
    terminates instead of re-paying a full-table rewrite forever."""
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark.datalake import (
        Lake,
        _file_stats,
        _read_amplification,
    )
    from dataengineeringpipeline_spark.operators.layout import apply_layout_advice

    lake = Lake(str(tmp_path))
    df = spark.range(0, 40000).select(
        F.col("id").alias("seq"),
        (F.col("id") * 48271 % 10007).alias("v"),
        (F.col("id") * 7919 % 9973).alias("w"),
        (F.col("id") * 104729 % 9949).alias("x"),
    )
    lake.write(df.repartitionByRange(64, "seq").sortWithinPartitions("seq"), "silver", "t")
    path = lake.path("silver", "t")
    _files, nbytes = _file_stats(path)
    workload = [("v", "range"), ("w", "range"), ("x", "range")]
    amp_before = {c: _read_amplification(path, c) for c in ("v", "w", "x")}
    rep = apply_layout_advice(
        lake, spark, "silver", "t", workload, target_file_mb=nbytes / 64e6
    )
    rewrites = [a for a in rep["actions"] if a["action"] in ("cluster_by", "cluster_by_zorder")]
    assert len(rewrites) == 1 and rewrites[0]["action"] == "cluster_by_zorder"
    assert set(rewrites[0]["cols"]) == {"v", "w", "x"}
    for c in ("v", "w", "x"):
        assert _read_amplification(path, c) < amp_before[c]
    # repeat apply: whatever the re-advice says, NO rewrite runs again —
    # either everything converged (all noop) or the identical plan is
    # recognized against the recorded layout
    rep2 = apply_layout_advice(
        lake, spark, "silver", "t", workload, target_file_mb=nbytes / 64e6
    )
    again = [a for a in rep2["actions"] if a["action"] in ("cluster_by", "cluster_by_zorder")]
    assert again == []
    assert all(
        a["action"] in ("noop", "already_applied_layout") for a in rep2["actions"]
    )
