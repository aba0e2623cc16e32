"""Silver→Gold analytics aggregations.

Re-expresses the reference gold Glue jobs
(``silver_to_gold_sales_summary.py``, ``silver_to_gold_customer_analytics.py``)
on the testdata star schema: hash aggregations with single / composite
keys, conditional aggregation, pivot, window ranks, percent-of-total via
unpartitioned window (not ``collect()`` — SURVEY.md §4.2-3), left-join
enrichment with ``fillna`` defaults, RFM scoring, segmentation, and the
union'd comprehensive summary.

Scale notes:

- each summary is exactly one shuffle on its grouping key; partial
  (map-side) aggregation is automatic for all the agg functions used here;
- dimension enrichments broadcast the small side explicitly;
- the pivot passes **explicit values** so Spark skips the extra distinct
  scan (``silver_to_gold_customer_analytics.py:157`` anti-pattern fixed);
- percent-of-total uses a scalar-aggregate cross join (AQE turns it into a
  broadcast) instead of driver-side ``collect`` so the whole plan stays
  lazy and distributed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.functions import det_stddev, money_avg, money_sum, pct_of, sum_long

# ---------------------------------------------------------------------------
# Sales summaries (silver_to_gold_sales_summary.py:117-232)
# ---------------------------------------------------------------------------


def daily_sales_summary(silver_orders: DataFrame) -> DataFrame:
    """Daily sales: 8 aggregate measures over complete orders (A1)."""
    return (
        silver_orders.filter(F.col("is_complete_order"))
        .groupBy("order_date")
        .agg(
            F.count("*").alias("total_orders"),
            F.countDistinct("customer_key").alias("unique_customers"),
            money_sum("total_price", "total_revenue"),
            money_avg("total_price", "avg_order_value"),
            F.min("total_price").alias("min_order_value"),
            F.max("total_price").alias("max_order_value"),
            det_stddev("total_price", "order_value_stddev"),
        )
        .orderBy("order_date")
    )


def daily_metrics_long(silver_orders: DataFrame) -> DataFrame:
    """Wide→long unpivot of the daily summary (the inverse of A5's pivot):
    one ``(order_date, metric, value)`` row per measure — the shape
    metric stores and plotting layers consume. ``DataFrame.unpivot`` is a
    zero-shuffle projection (each input row fans out to N output rows in
    place)."""
    metrics = ["total_orders", "unique_customers", "total_revenue", "avg_order_value"]
    wide = daily_sales_summary(silver_orders).select(
        "order_date", *[F.col(m).cast("double").alias(m) for m in metrics]
    )
    return wide.unpivot(
        ids=["order_date"], values=metrics, variableColumnName="metric", valueColumnName="value"
    ).orderBy("order_date", "metric")


def monthly_sales_summary(silver_orders: DataFrame) -> DataFrame:
    """Monthly sales by composite key incl. active-day count (A2)."""
    return (
        silver_orders.filter(F.col("is_complete_order"))
        .groupBy("order_year", "order_month")
        .agg(
            F.count("*").alias("total_orders"),
            F.countDistinct("customer_key").alias("unique_customers"),
            F.countDistinct("order_date").alias("active_days"),
            money_sum("total_price", "total_revenue"),
            money_avg("total_price", "avg_order_value"),
        )
        .withColumn(
            "month_start",
            F.to_date(
                F.concat_ws("-", F.col("order_year"), F.lpad(F.col("order_month"), 2, "0"), F.lit("01"))
            ),
        )
        .orderBy("order_year", "order_month")
    )


def sales_rollup(silver_orders: DataFrame) -> DataFrame:
    """Month → year → grand-total subtotals in ONE aggregation pass
    (``df.rollup`` — Spark expands the grouping sets before the shuffle,
    so partial aggregation still applies; three separate groupBys would
    scan the fact table three times).

    ``grouping()`` flags distinguish subtotal rows from genuine NULL
    keys, and the levels are made explicit so the output is
    self-describing.
    """
    agg = (
        silver_orders.filter(F.col("is_complete_order"))
        .rollup("order_year", "order_month")
        .agg(
            F.count("*").alias("total_orders"),
            money_sum("total_price", "total_revenue"),
            F.grouping("order_year").cast("int").alias("year_is_total"),
            F.grouping("order_month").cast("int").alias("month_is_total"),
        )
    )
    level = (
        F.when((F.col("year_is_total") == 1), F.lit("grand_total"))
        .when(F.col("month_is_total") == 1, F.lit("year"))
        .otherwise(F.lit("month"))
    )
    return agg.select(
        "order_year",
        "order_month",
        level.alias("rollup_level"),
        "total_orders",
        "total_revenue",
    ).orderBy(
        F.asc_nulls_first("order_year"), F.asc_nulls_first("order_month")
    )


def priority_performance(silver_orders: DataFrame) -> DataFrame:
    """Revenue by order priority with rank + percent-of-total (W2 + A6).

    The grand total is an unpartitioned window sum — idiomatic-Spark
    replacement for the reference's ``agg(...).collect()[0][0]`` scalar
    (``silver_to_gold_sales_summary.py:263-268``); on the tiny aggregated
    frame (a handful of rows) the single-task window is free.
    """
    agg = (
        silver_orders.filter(F.col("is_complete_order"))
        .groupBy("order_priority")
        .agg(
            F.count("*").alias("total_orders"),
            money_sum("total_price", "priority_revenue"),
        )
    )
    total_w = Window.partitionBy()
    rank_w = Window.orderBy(F.desc("priority_revenue"), F.asc("order_priority"))
    return (
        agg.withColumn(
            "revenue_share_pct",
            F.col("priority_revenue")
            / F.sum(F.col("priority_revenue").cast("decimal(27,2)")).over(total_w).cast("double")
            * 100.0,
        )
        .withColumn("priority_rank", F.row_number().over(rank_w))
        .orderBy("priority_rank")
    )


def comprehensive_sales_summary(silver_orders: DataFrame) -> DataFrame:
    """Union of schema-aligned daily + monthly summaries tagged with a
    ``summary_type`` literal (U1 — ``silver_to_gold_sales_summary.py:334-378``)."""
    daily = daily_sales_summary(silver_orders).select(
        F.lit("daily").alias("summary_type"),
        F.date_format("order_date", "yyyy-MM-dd").alias("period"),
        "total_orders",
        "unique_customers",
        "total_revenue",
        "avg_order_value",
    )
    monthly = monthly_sales_summary(silver_orders).select(
        F.lit("monthly").alias("summary_type"),
        F.date_format("month_start", "yyyy-MM-dd").alias("period"),
        "total_orders",
        "unique_customers",
        "total_revenue",
        "avg_order_value",
    )
    return daily.unionByName(monthly).orderBy("summary_type", "period")


# ---------------------------------------------------------------------------
# Customer analytics (silver_to_gold_customer_analytics.py)
# ---------------------------------------------------------------------------


def customer_lifetime_metrics(silver_orders: DataFrame) -> DataFrame:
    """Per-customer lifetime metrics (A3, 11-measure variant)."""
    return (
        silver_orders.filter(F.col("is_complete_order"))
        .groupBy("customer_key")
        .agg(
            F.count("*").alias("total_orders"),
            money_sum("total_price", "lifetime_value"),
            money_avg("total_price", "avg_order_value"),
            F.min("total_price").alias("min_order_value"),
            F.max("total_price").alias("max_order_value"),
            F.min("order_date").alias("first_order_date"),
            F.max("order_date").alias("last_order_date"),
            F.countDistinct("order_year").alias("active_years"),
            F.min("days_since_order").alias("recency_days"),
            F.sum(F.when(F.col("order_size_category") == "EXTRA_LARGE", 1).otherwise(0)).alias(
                "extra_large_orders"
            ),
        )
    )


SIZE_PIVOT_VALUES = ["SMALL", "MEDIUM", "LARGE", "EXTRA_LARGE"]


def order_size_distribution(silver_orders: DataFrame) -> DataFrame:
    """Per-customer pivot of order counts by size category (A5).

    Explicit pivot values skip the distinct-discovery scan (fixes
    SURVEY.md §4.2-5). Output columns ``size_<label>_orders``.
    """
    pivoted = (
        silver_orders.filter(F.col("is_complete_order"))
        .groupBy("customer_key")
        .pivot("order_size_category", SIZE_PIVOT_VALUES)
        .count()
        .fillna(0, subset=SIZE_PIVOT_VALUES)
    )
    for v in SIZE_PIVOT_VALUES:
        pivoted = pivoted.withColumnRenamed(v, f"size_{v.lower()}_orders")
    return pivoted


def rfm_scores(metrics: DataFrame) -> DataFrame:
    """RFM 1–5 scoring + concatenated code
    (``silver_to_gold_customer_analytics.py:284-315``).

    Threshold-based (like the reference), not quantile-based, so scoring
    is a narrow projection and oracle-deterministic.
    """
    r = (
        F.when(F.col("recency_days") <= 600, 5)
        .when(F.col("recency_days") <= 900, 4)
        .when(F.col("recency_days") <= 1400, 3)
        .when(F.col("recency_days") <= 2000, 2)
        .otherwise(1)
    )
    f_ = (
        F.when(F.col("total_orders") >= 25, 5)
        .when(F.col("total_orders") >= 15, 4)
        .when(F.col("total_orders") >= 8, 3)
        .when(F.col("total_orders") >= 3, 2)
        .otherwise(1)
    )
    m = (
        F.when(F.col("lifetime_value") >= 4_000_000, 5)
        .when(F.col("lifetime_value") >= 3_000_000, 4)
        .when(F.col("lifetime_value") >= 2_000_000, 3)
        .when(F.col("lifetime_value") >= 1_000_000, 2)
        .otherwise(1)
    )
    return (
        metrics.withColumn("recency_score", r)
        .withColumn("frequency_score", f_)
        .withColumn("monetary_score", m)
        .withColumn(
            "rfm_code",
            F.concat(F.col("recency_score"), F.col("frequency_score"), F.col("monetary_score")),
        )
    )


FILL_DEFAULTS = {
    "total_orders": 0,
    "lifetime_value": 0.0,
    "avg_order_value": 0.0,
    "min_order_value": 0.0,
    "max_order_value": 0.0,
    "active_years": 0,
    "extra_large_orders": 0,
    "size_small_orders": 0,
    "size_medium_orders": 0,
    "size_large_orders": 0,
    "size_extra_large_orders": 0,
}


def lifecycle_stage_expr():
    """The lifecycle staging rule — shared by the batch
    :func:`customer_analytics` and the partials fold
    (``ivm.customer_analytics_from_partials``) so the two faces cannot
    drift."""
    return (
        F.when(F.col("total_orders") == 0, "PROSPECT")
        .when(F.col("recency_days") <= 720, "ACTIVE")
        .when(F.col("recency_days") <= 1500, "AT_RISK")
        .otherwise("CHURNED")
    )


def customer_analytics(silver_customers: DataFrame, silver_orders: DataFrame) -> DataFrame:
    """Customer 360: dim ⟕ lifetime metrics ⟕ size pivot, null-defaulted,
    RFM-scored, lifecycle-staged (J1/J2 + P5 + A5).

    Join strategy: both aggregate sides are keyed on ``customer_key`` —
    at scale these are shuffle joins on the same key, so Catalyst reuses
    one exchange; the customer dim side carries no skew (unique keys).
    """
    metrics = rfm_scores(customer_lifetime_metrics(silver_orders))
    sizes = order_size_distribution(silver_orders)
    joined = (
        silver_customers.join(metrics, "customer_key", "left")
        .join(sizes, "customer_key", "left")
        .fillna(FILL_DEFAULTS)
    )
    return joined.withColumn("lifecycle_stage", lifecycle_stage_expr())


def segment_summary(analytics: DataFrame) -> DataFrame:
    """CLV-threshold segmentation + per-segment rollup (A8 —
    ``silver_to_gold_sales_summary.py:288-311``)."""
    segment = (
        F.when(F.col("lifetime_value") >= 4_000_000, "PLATINUM")
        .when(F.col("lifetime_value") >= 3_000_000, "GOLD")
        .when(F.col("lifetime_value") >= 1_500_000, "SILVER")
        .otherwise("BRONZE")
    )
    return (
        analytics.withColumn("customer_segment", segment)
        .groupBy("customer_segment")
        .agg(
            F.count("*").alias("customer_count"),
            money_sum("lifetime_value", "segment_revenue"),
            money_avg("lifetime_value", "avg_lifetime_value"),
            money_avg("total_orders", "avg_order_count"),
        )
        .orderBy("customer_segment")
    )


def top_customers_per_segment(analytics: DataFrame, k: int = 3) -> DataFrame:
    """Top-K per group (the canonical ranked-window pattern): the K
    highest-lifetime-value customers within each CLV segment. Spark plans
    the rank filter as a per-partition top-K (no global sort); ties break
    on customer key for engine-independent results."""
    segment = (
        F.when(F.col("lifetime_value") >= 4_000_000, "PLATINUM")
        .when(F.col("lifetime_value") >= 3_000_000, "GOLD")
        .when(F.col("lifetime_value") >= 1_500_000, "SILVER")
        .otherwise("BRONZE")
    )
    w = Window.partitionBy("customer_segment").orderBy(
        F.desc("lifetime_value"), F.asc("customer_key")
    )
    return (
        analytics.withColumn("customer_segment", segment)
        .withColumn("segment_rank", F.row_number().over(w))
        .filter(F.col("segment_rank") <= k)
        .select(
            "customer_segment", "segment_rank", "customer_key", "lifetime_value", "total_orders"
        )
        .orderBy("customer_segment", "segment_rank")
    )


# ---------------------------------------------------------------------------
# Part / category performance (lineitem-grain, the big fact at scale)
# ---------------------------------------------------------------------------


def category_performance(silver_lineitems: DataFrame, silver_parts: DataFrame) -> DataFrame:
    """Revenue by part category with rank + share-of-total (A1+W2+A6 over
    the *large* fact table).

    Plan shape at 100 TB: lineitem aggregates **first** on ``part_key``
    (map-side partial agg shrinks the shuffle to ~|part| rows), then
    broadcast-joins the parts dim, then re-aggregates on the
    low-cardinality category. ``distinct_parts`` is a plain ``count``
    over the per-part rows — they are unique by construction, and a
    ``countDistinct`` here would re-plan as a second distinct-agg
    shuffle for nothing.
    """
    per_part = silver_lineitems.groupBy("part_key").agg(
        money_sum("net_revenue", "part_revenue", scale=4),
        F.sum("quantity").alias("part_quantity"),
        F.count("*").alias("line_count"),
    )
    cat = (
        per_part.join(F.broadcast(silver_parts.select("part_key", "part_category")), "part_key", "left")
        .groupBy("part_category")
        .agg(
            money_sum("part_revenue", "category_revenue", scale=4),
            F.sum("part_quantity").alias("category_quantity"),
            F.sum("line_count").alias("line_count"),
            F.count("part_key").alias("distinct_parts"),
        )
    )
    total_w = Window.partitionBy()
    rank_w = Window.orderBy(F.desc("category_revenue"), F.asc("part_category"))
    return (
        cat.withColumn(
            "revenue_share_pct",
            F.col("category_revenue")
            / F.sum(F.col("category_revenue").cast("decimal(27,4)")).over(total_w).cast("double")
            * 100.0,
        )
        .withColumn("category_rank", F.row_number().over(rank_w))
        .orderBy("category_rank")
    )


def supplier_performance(
    supplier: DataFrame, nation: DataFrame, silver_lineitems: DataFrame
) -> DataFrame:
    """Per-supplier fulfillment metrics with within-nation revenue rank —
    the A3 per-entity-agg + J1 dim-left-join + A4 conditional-agg + W2
    ranking pattern applied to the supply side (reference analog:
    ``silver_to_gold_customer_analytics.py:116-196``).

    Plan shape at 100 TB: the fact table reduces to one row per supplier
    **before** touching any dim (map-side partial agg); the supplier dim
    then left-joins the shrunken aggregate, and nation (25 rows) is
    broadcast. The rank window partitions by nation — no global sort.
    """
    per_supp = silver_lineitems.groupBy("supplier_key").agg(
        F.count("*").alias("line_count"),
        F.sum("quantity").alias("total_quantity"),
        money_sum("net_revenue", "supplier_revenue", scale=4),
        F.sum(F.when(F.col("return_flag") == "R", 1).otherwise(0)).alias("returned_lines"),
    )
    dim = supplier.select(
        F.col("s_suppkey").alias("supplier_key"),
        F.col("s_name").alias("supplier_name"),
        F.col("s_nationkey").alias("nation_key"),
        F.col("s_acctbal").cast("double").alias("account_balance"),
    ).join(
        F.broadcast(
            nation.select(
                F.col("n_nationkey").alias("nation_key"), F.col("n_name").alias("nation_name")
            )
        ),
        "nation_key",
        "left",
    )
    joined = (
        dim.join(per_supp, "supplier_key", "left")
        .fillna({"line_count": 0, "total_quantity": 0.0, "supplier_revenue": 0.0, "returned_lines": 0})
    )
    rank_w = Window.partitionBy("nation_name").orderBy(
        F.desc("supplier_revenue"), F.asc("supplier_key")
    )
    return joined.select(
        "supplier_key",
        "supplier_name",
        "nation_name",
        "account_balance",
        "line_count",
        "total_quantity",
        "supplier_revenue",
        "returned_lines",
        F.when(
            F.col("line_count") > 0,
            F.col("returned_lines").cast("double") / F.col("line_count") * 100.0,
        )
        .otherwise(F.lit(0.0))
        .alias("return_rate_pct"),
        F.row_number().over(rank_w).alias("nation_revenue_rank"),
    ).orderBy("nation_name", "nation_revenue_rank")


def top_n(df: DataFrame, order_col: str, n: int = 1, tiebreak: str | None = None) -> DataFrame:
    """Top-N selection (W3/O2): ``orderBy(desc).limit(n)`` — Spark plans
    this as TakeOrderedAndProject (no full sort)."""
    keys = [F.desc(order_col)] + ([F.asc(tiebreak)] if tiebreak else [])
    return df.orderBy(*keys).limit(n)


def status_priority_cube(silver_orders: DataFrame) -> DataFrame:
    """All four grouping-set combinations of (status, priority) in ONE
    aggregation pass (``df.cube`` — like :func:`sales_rollup`, the
    grouping sets expand before the shuffle so map-side partial
    aggregation still applies; four separate groupBys would scan the
    fact four times). ``grouping()`` flags disambiguate subtotal rows
    from genuine key values, and the sort keys include them so the
    output order is fully deterministic."""
    return (
        silver_orders.cube("order_status", "order_priority")
        .agg(
            F.count("*").alias("total_orders"),
            money_sum("total_price", "total_revenue"),
            F.grouping("order_status").cast("int").alias("status_is_total"),
            F.grouping("order_priority").cast("int").alias("priority_is_total"),
        )
        .select(
            "order_status",
            "order_priority",
            "status_is_total",
            "priority_is_total",
            "total_orders",
            "total_revenue",
        )
        .orderBy(
            "status_is_total",
            "priority_is_total",
            F.asc_nulls_first("order_status"),
            F.asc_nulls_first("order_priority"),
        )
    )


def customer_value_deciles(silver_orders: DataFrame) -> DataFrame:
    """Decile segmentation of customers by lifetime value (`ntile(10)`
    with a customer-key tiebreak, so bucket membership is deterministic
    for any spend-tie layout), rolled up to one row per decile with the
    value range and totals each decile contributes.

    Plan: one per-customer aggregation, one global ntile window (sorting
    only the ~|customers| aggregate rows, never order lines), one tiny
    10-row rollup.
    """
    ltv = customer_lifetime_metrics(silver_orders).select(
        "customer_key", "lifetime_value", "total_orders"
    )
    w = Window.orderBy(F.desc("lifetime_value"), F.asc("customer_key"))
    return (
        ltv.withColumn("decile", F.ntile(10).over(w).cast("int"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("customers"),
            F.min("lifetime_value").alias("min_ltv"),
            F.max("lifetime_value").alias("max_ltv"),
            money_sum("lifetime_value", "decile_value"),
            sum_long(F.col("total_orders"), "decile_orders"),
        )
        .withColumn(
            "value_share",
            F.col("decile_value")
            / F.sum(F.col("decile_value").cast("decimal(27,2)"))
            .over(Window.partitionBy())
            .cast("double"),
        )
        .orderBy("decile")
    )
