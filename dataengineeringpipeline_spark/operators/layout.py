"""Data-layout optimization — Z-order (Morton) clustering and the scan-
pruning economics it buys.

At 100 TB the scan is the query: a parquet reader skips a file (or row
group) when the predicate's range does not intersect the file's min/max
stats, so WHERE a row lands decides how much of the table a 2-D box
query touches. Arrival-ordered files localize nothing but ingestion
time; files clustered by the Morton interleave of two columns' bits
localize BOTH columns at once, cutting the files a (x-range AND
y-range) predicate must read from "almost all" to "the few covering the
box" — the same layout trade Delta's OPTIMIZE ZORDER and Hudi's
space-filling-curve clustering make.

Everything here is exact integer arithmetic (grid scaling via floor
division, bit interleave as shift-free powers of two), so the layout
decision is reproducible across engines and the DuckDB oracle can
recompute it bit-for-bit. This module is the oracle-checked PLANNING
gauge; the production REWRITE is ``datalake.Lake.cluster_by_zorder``
(quantile-bucket ranks + ``repartitionByRange(z)``, atomic swap),
whose parquet-footer read-amplification gains are verified in
``tests/test_scale.py::test_zorder_cluster_serves_both_columns``.

Reference parity: the reference has no layout optimizer; this is part
of the at-scale lake-maintenance surface the brief adds (its Glue jobs
rely on partition pruning only, `glue/etl_jobs/*.py`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Grid resolution per dimension: 16 bits → 65536 cells, z in [0, 2^32).
GRID_BITS = 16
#: Files the report models per layout.
N_FILES = 64
#: Box predicate bounds, per-mille of each dimension's span (a centered
#: ~10% × ~10% box — selective on both dimensions, the case Z-order is
#: built for).
BOX_LO_PM = 450
BOX_HI_PM = 550


def _grid_expr(col: str, lo: str, hi: str, bits: int = GRID_BITS) -> str:
    """SQL-string form of the grid scaling (used via ``F.expr`` so the
    floor-division semantics are the documented ``div``)."""
    top = (1 << bits) - 1
    return f"CASE WHEN {hi} > {lo} THEN (({col} - {lo}) * {top}) div ({hi} - {lo}) ELSE 0 END"


def _morton_expr(gx: str, gy: str, bits: int = GRID_BITS) -> str:
    """Morton/Z interleave as pure integer arithmetic: bit b of ``gx``
    lands at position 2b, bit b of ``gy`` at 2b+1 — no shift builtins,
    so the identical text runs in Spark SQL and DuckDB."""
    terms = []
    for b in range(bits):
        terms.append(f"((({gx}) div {1 << b}) % 2) * {1 << (2 * b)}")
        terms.append(f"((({gy}) div {1 << b}) % 2) * {1 << (2 * b + 1)}")
    return " + ".join(terms)


def _grid_expr_double(col: str, lo: str, hi: str, bits: int = GRID_BITS) -> str:
    """Grid scaling for fractional columns: the same map computed in
    double space with an explicit floor (integer ``div`` requires
    integral operands). Used only by the physical write path; the
    oracle-checked report integerizes its inputs first."""
    top = (1 << bits) - 1
    return (
        f"CASE WHEN {hi} > {lo} THEN CAST(floor((({col}) - {lo}) * {top}"
        f" / ({hi} - {lo})) AS BIGINT) ELSE 0 END"
    )


def zorder_keyed(df: DataFrame, x: str, y: str, bits: int = GRID_BITS) -> DataFrame:
    """Attach ``gx``/``gy`` grid coordinates and the Morton key ``zkey``
    for two numeric columns (integral columns use exact integer
    arithmetic; fractional ones a floored double map). One scalar
    min/max aggregation (broadcast, 1 row) plus a map-only projection —
    no corpus shuffle."""
    fractional = {
        f.name for f in df.schema.fields if f.dataType.typeName() in ("double", "float")
    }
    scalars = df.agg(
        F.min(x).alias("_min_x"),
        F.max(x).alias("_max_x"),
        F.min(y).alias("_min_y"),
        F.max(y).alias("_max_y"),
    )
    out = df.crossJoin(F.broadcast(scalars))
    gridder = lambda c, lo, hi: (  # noqa: E731
        _grid_expr_double(c, lo, hi, bits) if c in fractional else _grid_expr(c, lo, hi, bits)
    )
    return (
        out.withColumn("gx", F.expr(gridder(x, "_min_x", "_max_x")).cast("long"))
        .withColumn("gy", F.expr(gridder(y, "_min_y", "_max_y")).cast("long"))
        .withColumn("zkey", F.expr(_morton_expr("gx", "gy", bits)).cast("long"))
        .drop("_min_x", "_max_x", "_min_y", "_max_y")
    )


def layout_pruning_report(
    events: DataFrame, n_files: int = N_FILES, bits: int = GRID_BITS
) -> DataFrame:
    """Driver-contract query: how many files a centered 2-D box predicate
    on ``(user_id, value)`` must read under two layouts of the same
    rows into ``n_files`` files —

    - ``arrival``: files are contiguous ``event_id`` ranges (ingestion
      order, what an unclustered append-only table looks like);
    - ``zorder``: files are contiguous Morton-key ranges (equi-width
      over the 2^(2·bits) key space).

    A file must be scanned iff its per-file min/max envelope of BOTH
    columns intersects the box — exactly the parquet row-group pruning
    rule. The report is the evidence for running
    ``Lake.cluster_by_zorder``: same rows, same predicate, an
    order-of-magnitude fewer rows read.

    Plan: one scalar min/max agg (1 broadcast row), a map-only
    grid/interleave projection, one explode into the two layout
    assignments, and a ``(layout, file)`` aggregation — ≤ 2·n_files
    groups, so the shuffle is map-side-combined and trivially small at
    any corpus scale. Integer arithmetic throughout.
    """
    base = events.select(
        F.col("event_id").cast("long").alias("event_id"),
        F.col("user_id").cast("long").alias("x"),
        F.floor(F.col("value") * 100).cast("long").alias("y"),
    )
    scalars = base.agg(
        F.min("x").alias("_min_x"),
        F.max("x").alias("_max_x"),
        F.min("y").alias("_min_y"),
        F.max("y").alias("_max_y"),
        F.min("event_id").alias("_min_id"),
        F.max("event_id").alias("_max_id"),
    )
    keyed = (
        base.crossJoin(F.broadcast(scalars))
        .withColumn("gx", F.expr(_grid_expr("x", "_min_x", "_max_x", bits)).cast("long"))
        .withColumn("gy", F.expr(_grid_expr("y", "_min_y", "_max_y", bits)).cast("long"))
        .withColumn("zkey", F.expr(_morton_expr("gx", "gy", bits)).cast("long"))
        .withColumn(
            "box_x_lo", F.expr(f"_min_x + ((_max_x - _min_x) * {BOX_LO_PM}) div 1000")
        )
        .withColumn(
            "box_x_hi", F.expr(f"_min_x + ((_max_x - _min_x) * {BOX_HI_PM}) div 1000")
        )
        .withColumn(
            "box_y_lo", F.expr(f"_min_y + ((_max_y - _min_y) * {BOX_LO_PM}) div 1000")
        )
        .withColumn(
            "box_y_hi", F.expr(f"_min_y + ((_max_y - _min_y) * {BOX_HI_PM}) div 1000")
        )
    )
    z_width = 1 << (2 * bits)
    assigned = keyed.select(
        "x",
        "y",
        "box_x_lo",
        "box_x_hi",
        "box_y_lo",
        "box_y_hi",
        F.explode(
            F.array(
                F.struct(
                    F.lit("arrival").alias("layout"),
                    F.expr(
                        f"((event_id - _min_id) * {n_files}) div (_max_id - _min_id + 1)"
                    )
                    .cast("long")
                    .alias("file_id"),
                ),
                F.struct(
                    F.lit("zorder").alias("layout"),
                    F.expr(f"(zkey * {n_files}) div {z_width}").cast("long").alias("file_id"),
                ),
            )
        ).alias("a"),
    ).select("x", "y", "box_x_lo", "box_x_hi", "box_y_lo", "box_y_hi", "a.layout", "a.file_id")
    in_box = (
        (F.col("x") >= F.col("box_x_lo"))
        & (F.col("x") <= F.col("box_x_hi"))
        & (F.col("y") >= F.col("box_y_lo"))
        & (F.col("y") <= F.col("box_y_hi"))
    )
    per_file = assigned.groupBy("layout", "file_id").agg(
        F.count(F.lit(1)).cast("long").alias("rows"),
        F.min("x").alias("fx_lo"),
        F.max("x").alias("fx_hi"),
        F.min("y").alias("fy_lo"),
        F.max("y").alias("fy_hi"),
        F.sum(F.when(in_box, 1).otherwise(0)).cast("long").alias("match_rows"),
        F.min("box_x_lo").alias("box_x_lo"),
        F.min("box_x_hi").alias("box_x_hi"),
        F.min("box_y_lo").alias("box_y_lo"),
        F.min("box_y_hi").alias("box_y_hi"),
    )
    scanned = (
        (F.col("fx_lo") <= F.col("box_x_hi"))
        & (F.col("fx_hi") >= F.col("box_x_lo"))
        & (F.col("fy_lo") <= F.col("box_y_hi"))
        & (F.col("fy_hi") >= F.col("box_y_lo"))
    )
    return (
        per_file.groupBy("layout")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.sum(F.when(scanned, 1).otherwise(0)).cast("long").alias("files_scanned"),
            F.sum("rows").cast("long").alias("rows_total"),
            F.sum(F.when(scanned, F.col("rows")).otherwise(0))
            .cast("long")
            .alias("rows_in_scanned_files"),
            F.sum("match_rows").cast("long").alias("matching_rows"),
        )
        .select(
            "layout",
            "files_total",
            "files_scanned",
            "rows_total",
            "rows_in_scanned_files",
            "matching_rows",
            F.expr("(rows_in_scanned_files * 1000) div rows_total")
            .cast("long")
            .alias("scan_pm"),
        )
        .orderBy("layout")
    )


#: The advisor's observed-workload spec for the driver-contract query:
#: (column, predicate kind) pairs a query log would yield. Deterministic
#: module constants so the DuckDB oracle replays the same analysis.
ADVISOR_WORKLOAD = (
    ("user_id", "point"),
    ("value_cents", "range"),
    ("event_hour", "range"),
    ("ts_us", "range"),
)
#: Envelope-usefulness bar, per-mille of rows a predicate's modeled scan
#: touches: above it for a point probe the envelopes can't prune (bloom
#: index territory); below it for a range probe the column is already
#: effectively clustered.
ADVISOR_HI_PM = 800
ADVISOR_LO_PM = 200


def layout_advisor_report(events: DataFrame, n_files: int = N_FILES) -> DataFrame:
    """Driver-contract query: the LAYOUT ADVISOR — given an observed
    predicate workload (``ADVISOR_WORKLOAD``: point lookups on
    ``user_id``, range scans on ``value_cents`` / ``event_hour`` /
    ``ts_us``), model the CURRENT arrival-order layout's per-file
    [min,max] envelopes (contiguous ``event_id`` ranges, the same
    modeling as :func:`layout_pruning_report`) and recommend, per
    column, which layout/index lever closes its scan cost:

    - point probe whose envelopes can't prune (``scan_pm`` ≥ 800: every
      file's range covers the probed key) → ``bloom_index`` — exactly
      when :meth:`Lake.build_file_index` beats clustering;
    - range probe already served by the current order (``scan_pm`` ≤
      200) → ``already_clustered`` (don't pay a rewrite);
    - remaining range probes are CLUSTER CANDIDATES, ranked by modeled
      scan cost: the top two compose a ``zorder_with:<partner>`` pair
      (:meth:`Lake.cluster_by_zorder` serves both at once), further
      candidates get single-column ``cluster_by``, a lone candidate
      gets ``cluster_by``.

    Pure integer arithmetic over one melt + two tiny aggregations
    (≤ cols × n_files groups), so the DuckDB oracle recomputes the
    whole recommendation bit-for-bit — closing the loop from "observed
    predicates" to "which maintenance command to run", with the
    decision rule itself under the correctness gate.

    The footer-real production face is :func:`advise_layout` (same
    thresholds, real parquet stats).
    """
    from pyspark.sql.window import Window

    base = events.select(
        F.col("event_id").cast("long").alias("rid"),
        F.col("user_id").cast("long").alias("user_id"),
        F.floor(F.col("value") * 100).cast("long").alias("value_cents"),
        F.col("event_hour").cast("long").alias("event_hour"),
        F.col("ts_us").cast("long").alias("ts_us"),
    )
    scalars = base.agg(F.min("rid").alias("_min_id"), F.max("rid").alias("_max_id"))
    probes = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.lit(kind).alias("kind"),
                F.col(c).alias("val"),
            )
            for c, kind in ADVISOR_WORKLOAD
        ]
    )
    melted = (
        base.crossJoin(F.broadcast(scalars))
        .withColumn(
            "file_id",
            F.expr(f"((rid - _min_id) * {n_files}) div (_max_id - _min_id + 1)").cast(
                "long"
            ),
        )
        .select("file_id", F.explode(probes).alias("p"))
        .select("file_id", "p.col_name", "p.kind", "p.val")
    )
    per_file = melted.groupBy("col_name", "kind", "file_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.min("val").alias("f_lo"),
        F.max("val").alias("f_hi"),
    )
    gl = per_file.groupBy("col_name").agg(
        F.min("f_lo").alias("g_lo"), F.max("f_hi").alias("g_hi")
    )
    lo_pm, hi_pm = BOX_LO_PM, BOX_HI_PM
    pf = (
        per_file.join(F.broadcast(gl), "col_name")
        .withColumn(
            "box_lo",
            F.expr(
                f"CASE WHEN kind = 'point' THEN g_lo + ((g_hi - g_lo) * 500) div 1000"
                f" ELSE g_lo + ((g_hi - g_lo) * {lo_pm}) div 1000 END"
            ),
        )
        .withColumn(
            "box_hi",
            F.expr(
                f"CASE WHEN kind = 'point' THEN g_lo + ((g_hi - g_lo) * 500) div 1000"
                f" ELSE g_lo + ((g_hi - g_lo) * {hi_pm}) div 1000 END"
            ),
        )
    )
    scanned = (F.col("f_lo") <= F.col("box_hi")) & (F.col("f_hi") >= F.col("box_lo"))
    per_col = (
        pf.groupBy("col_name", "kind")
        .agg(
            F.count(F.lit(1)).cast("long").alias("files_total"),
            F.sum(F.when(scanned, 1).otherwise(0)).cast("long").alias("files_scanned"),
            F.sum("n_rows").cast("long").alias("rows_total"),
            F.sum(F.when(scanned, F.col("n_rows")).otherwise(0))
            .cast("long")
            .alias("rows_in_scanned_files"),
        )
        .withColumn(
            "scan_pm",
            F.expr("(rows_in_scanned_files * 1000) div rows_total").cast("long"),
        )
    )
    w = Window.partitionBy(F.lit(1))
    cand = (
        (F.col("kind") == "range") & (F.col("scan_pm") > ADVISOR_LO_PM)
    ).cast("int")
    ranked = (
        per_col.withColumn("_cand", cand)
        .withColumn("_n_cand", F.sum("_cand").over(w))
        .withColumn(
            "_rnk",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy(
                    F.col("_cand").desc(),
                    F.col("scan_pm").desc(),
                    F.col("col_name").asc(),
                )
            ),
        )
    )
    top1 = F.max(F.when(F.col("_rnk") == 1, F.col("col_name"))).over(w)
    top2 = F.max(F.when(F.col("_rnk") == 2, F.col("col_name"))).over(w)
    rec = (
        F.when(
            (F.col("kind") == "point") & (F.col("scan_pm") >= ADVISOR_HI_PM),
            F.lit("bloom_index"),
        )
        .when(F.col("kind") == "point", F.lit("already_selective"))
        .when(F.col("_cand") == 0, F.lit("already_clustered"))
        .when(
            (F.col("_n_cand") >= 2) & (F.col("_rnk") == 1),
            F.concat(F.lit("zorder_with:"), top2),
        )
        .when(
            (F.col("_n_cand") >= 2) & (F.col("_rnk") == 2),
            F.concat(F.lit("zorder_with:"), top1),
        )
        .otherwise(F.lit("cluster_by"))
    )
    return (
        ranked.withColumn("recommendation", rec)
        .select(
            "col_name",
            F.col("kind").alias("predicate"),
            "files_total",
            "files_scanned",
            "rows_total",
            "rows_in_scanned_files",
            "scan_pm",
            "recommendation",
        )
        .orderBy("col_name")
    )


def advise_layout(lake, layer: str, table: str, workload) -> list[dict]:
    """Footer-REAL face of :func:`layout_advisor_report`: read the live
    table's parquet footers (``_key_envelopes`` — metadata only, no
    data) and apply the same thresholds to an observed workload of
    ``(column, 'point' | 'range')`` predicates. Returns ranked
    recommendation dicts; feed the result straight into
    :meth:`Lake.build_file_index` / :meth:`Lake.cluster_by` /
    :meth:`Lake.cluster_by_zorder`.

    The modeled contract query keeps the DECISION RULE under the DuckDB
    oracle; this face applies it to real file stats (covered by unit
    tests, like every footer-reading path).

    The advice CONVERGES under :func:`apply_layout_advice`: a point
    column that already carries a per-file bloom index reports
    ``already_indexed`` (not ``bloom_index`` again), and a range column
    whose rewrite landed reports ``already_clustered`` on the next run
    — so observe → advise → act → re-advise reaches a fixpoint instead
    of re-recommending work already done."""
    from ..datalake import _indexed_cols, _key_envelopes

    path = lake.path(layer, table)
    indexed = set(_indexed_cols(path))
    rows = []
    for col, kind in workload:
        envs = [e for e in _key_envelopes(path, col)]
        usable = [e for e in envs if e[2] is not None and e[3] is not None]
        total_rows = sum(e[1] for e in envs) or 1
        if not usable:
            # absent or all-NULL column: nothing to prune on and nothing
            # a layout rewrite can serve — report it, keep the row shape
            # uniform, and exclude it from cluster candidacy below
            rows.append(
                {"col_name": col, "predicate": kind, "scan_pm": 1000,
                 "files_total": len(envs), "files_scanned": len(envs),
                 "rows_total": total_rows,
                 "rows_in_scanned_files": total_rows,
                 "recommendation": "no_stats"}
            )
            continue
        g_lo, g_hi = min(e[2] for e in usable), max(e[3] for e in usable)
        try:
            span = g_hi - g_lo
            if kind == "point":
                lo = hi = g_lo + span * 500 // 1000
            else:
                # floor form, matching layout_advisor_report / the
                # oracle-pinned rule exactly (a ceil-shaped hi flips
                # boundary files and can change the recommendation)
                lo = g_lo + span * BOX_LO_PM // 1000
                hi = g_lo + span * BOX_HI_PM // 1000
        except TypeError:  # non-numeric column (strings): probe midpoints
            mids = sorted(e[2] for e in usable)
            lo = hi = mids[len(mids) // 2]
        hit = [
            e
            for e in envs
            if e[2] is None or e[3] is None or (e[2] <= hi and e[3] >= lo)
        ]
        rows.append(
            {
                "col_name": col,
                "predicate": kind,
                "files_total": len(envs),
                "files_scanned": len(hit),
                "rows_total": total_rows,
                "rows_in_scanned_files": sum(e[1] for e in hit),
                "scan_pm": sum(e[1] for e in hit) * 1000 // total_rows,
            }
        )
    cands = sorted(
        (
            r
            for r in rows
            if r["predicate"] == "range"
            and r["scan_pm"] > ADVISOR_LO_PM
            and "recommendation" not in r  # no_stats rows can't cluster
        ),
        key=lambda r: (-r["scan_pm"], r["col_name"]),
    )
    for r in rows:
        if "recommendation" in r:
            continue
        if r["predicate"] == "point":
            r["recommendation"] = (
                ("already_indexed" if r["col_name"] in indexed else "bloom_index")
                if r["scan_pm"] >= ADVISOR_HI_PM
                else "already_selective"
            )
        elif r not in cands:
            r["recommendation"] = "already_clustered"
        elif len(cands) >= 2 and r is cands[0]:
            r["recommendation"] = f"zorder_with:{cands[1]['col_name']}"
        elif len(cands) >= 2 and r is cands[1]:
            r["recommendation"] = f"zorder_with:{cands[0]['col_name']}"
        else:
            r["recommendation"] = "cluster_by"
    return rows


def apply_layout_advice(
    lake,
    spark,
    layer: str,
    table: str,
    workload,
    advice: list[dict] | None = None,
    target_file_mb: float = 128,
    zorder_bits: int = 8,
) -> dict:
    """Close the observe → advise → ACT loop: execute
    :func:`advise_layout`'s recommendations with the Lake's own
    maintenance levers, one pass, under the same per-table writer fence
    every lever already takes —

    - the CLUSTER CANDIDATES (every ``zorder_with:`` / ``cluster_by``
      row, ranked by modeled scan cost) become ONE physical rewrite: a
      multi-column :meth:`Lake.cluster_by_zorder` over up to four
      candidates when there are two or more (a table has ONE physical
      sort order — z-ordering ALL candidates serves each of them
      ~F^(1/k)-wide instead of letting a second rewrite undo the
      first), or a plain :meth:`Lake.cluster_by` for a lone candidate
      (extended into the recorded z-order's columns when one exists, so
      acting on a new candidate never un-serves previously advised
      columns);
    - ``bloom_index`` → :meth:`Lake.build_file_index` (run AFTER any
      rewrite so the fresh index covers the rewritten files);
    - ``already_*`` / ``no_stats`` rows are skipped as ``noop``.

    The executed layout is recorded in a ``_layout.json`` sidecar
    beside the data, and a planned rewrite IDENTICAL to the recorded
    one is skipped as ``already_applied_layout`` — so repeated applies
    TERMINATE even when the modeled scan cost stays above the
    candidate bar (coarse toy-scale file counts can't push a
    k-dimensional curve below it), instead of re-paying a full-table
    rewrite per invocation. The sidecar is advisory apply-loop memory:
    a mutation that rewrites the table drops it, and the next apply
    legitimately re-clusters the changed data.

    Returns an audit dict: per-column actions taken, each rewrite's
    read-amplification before/after (from the levers' own footer-read
    reports), and the re-run advice so callers can assert convergence
    (the advised columns come back ``already_clustered`` /
    ``already_indexed``). At 100 TB each action is the lever's own
    economics — metadata-only advice, ONE range shuffle per invocation
    at most, a single data pass per bloom build. ``target_file_mb`` /
    ``zorder_bits`` pass through to the rewrite levers (size the target
    so each shuffle partition lands in the 64-256 MB parquet sweet spot
    at the table's real scale)."""
    advice = list(advice) if advice is not None else advise_layout(lake, layer, table, workload)
    actions: list[dict] = []
    path = lake.path(layer, table)
    recorded = _layout_meta(path)

    def _amp_keys(rep: dict) -> dict:
        return {
            k: rep[k]
            for k in (
                "read_amplification_before", "read_amplification_after",
                "files_before", "files_after",
            )
            if k in rep
        }

    cands = sorted(
        (
            r
            for r in advice
            if str(r["recommendation"]).startswith("zorder_with:")
            or r["recommendation"] == "cluster_by"
        ),
        key=lambda r: (-r["scan_pm"], r["col_name"]),
    )
    plan: tuple[str, list[str]] | None = None
    if len(cands) >= 2:
        plan = ("zorder", [r["col_name"] for r in cands][:4])
    elif len(cands) == 1:
        cand = cands[0]["col_name"]
        if recorded is not None and recorded.get("method") == "zorder":
            cols = [cand] + [c for c in recorded.get("cols", []) if c != cand]
            plan = ("zorder", cols[:4]) if len(cols) >= 2 else ("cluster_by", [cand])
        else:
            plan = ("cluster_by", [cand])
    if plan is not None:
        method, cols = plan
        if (
            recorded is not None
            and recorded.get("method") == method
            and set(recorded.get("cols", [])) == set(cols)
        ):
            actions.append({"action": "already_applied_layout", "cols": cols})
        elif method == "zorder":
            rep = lake.cluster_by_zorder(
                spark, layer, table, tuple(cols),
                bits=zorder_bits, target_file_mb=target_file_mb,
            )
            _write_layout_meta(path, method, cols)
            actions.append({"action": "cluster_by_zorder", "cols": cols, **_amp_keys(rep)})
        else:
            rep = lake.cluster_by(
                spark, layer, table, (cols[0],), target_file_mb=target_file_mb
            )
            _write_layout_meta(path, method, cols)
            actions.append({"action": "cluster_by", "cols": cols, **_amp_keys(rep)})
    for r in (r for r in advice if r["recommendation"] == "bloom_index"):
        rep = lake.build_file_index(spark, layer, table, r["col_name"])
        actions.append(
            {"action": "build_file_index", "cols": [r["col_name"]],
             "files_indexed": rep.get("files_indexed")}
        )
    for r in advice:
        rec = str(r["recommendation"])
        if rec.startswith("already_") or rec == "no_stats":
            actions.append({"action": "noop", "cols": [r["col_name"]], "why": rec})
    return {
        "table": f"{layer}.{table}",
        "advice": advice,
        "actions": actions,
        "advice_after": advise_layout(lake, layer, table, workload),
    }


def _layout_meta(path: str) -> dict | None:
    """The apply-loop's recorded layout (``_layout.json``), or None."""
    import json
    import os

    try:
        with open(os.path.join(path, "_layout.json")) as f:
            return json.load(f)
    except (OSError, ValueError):
        return None


def _write_layout_meta(path: str, method: str, cols: list[str]) -> None:
    import json
    import os

    tmp = os.path.join(path, "._layout.json.tmp")
    with open(tmp, "w") as f:
        json.dump({"method": method, "cols": list(cols)}, f)
    os.rename(tmp, os.path.join(path, "_layout.json"))
