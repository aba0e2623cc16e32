"""DuckDB oracle SQL twins for the driver correctness gate.

Every SQL string here is the ANSI-SQL equivalent of one ``queries()``
entry in ``__spark_entry__.py``, written so that Spark and DuckDB produce
**bit-identical** values:

- row-level derivations are plain double arithmetic (IEEE 754 scalar ops
  are engine-independent) with *no rounding* — ``round()`` semantics near
  half-boundaries differ between engines;
- aggregate sums go through exact DECIMAL casts (order-independent) and
  convert to double only at the end;
- stddev uses the sum-of-squares formula over exact decimal sums with the
  final arithmetic in doubles, mirroring
  :func:`dataengineeringpipeline_spark.functions.det_stddev` op-for-op;
- DuckDB type quirks are normalized: ``year()``-family returns BIGINT
  (cast to INTEGER to match Spark), ``SUM(BIGINT)`` returns HUGEINT (cast
  to BIGINT), ``dayofweek`` is Sunday=0 (Spark: Sunday=1 → ``+1``),
  ``concat`` ignores NULLs (use ``||`` which propagates them).
"""

from __future__ import annotations

# ---------------------------------------------------------------------------
# Deterministic aggregate fragments (SQL twins of functions/__init__.py)
# ---------------------------------------------------------------------------


def dec2dbl(expr: str) -> str:
    """Decimal→double via VARCHAR: DuckDB's direct decimal→double cast
    double-rounds (int128→double, then /10^scale) once the unscaled value
    exceeds 2^53; the string parse is correctly rounded, matching the JVM
    (BigDecimal falls back to ``Double.parseDouble(toString())`` above
    2^52). Required for bit-exact parity with Spark's decimal sums."""
    return f"CAST(CAST({expr} AS VARCHAR) AS DOUBLE)"


def money_sum_sql(col: str, scale: int = 2) -> str:
    return dec2dbl(f"SUM(CAST({col} AS DECIMAL(27,{scale})))")


def money_avg_sql(col: str, scale: int = 2) -> str:
    return f"{money_sum_sql(col, scale)} / COUNT({col})"


def det_stddev_sql(col: str, scale: int = 2) -> str:
    n = f"CAST(COUNT({col}) AS DOUBLE)"
    sx = money_sum_sql(col, scale)
    dec = f"CAST({col} AS DECIMAL(18,{scale}))"
    sxx = dec2dbl(f"SUM({dec} * {dec})")
    return (
        f"CASE WHEN COUNT({col}) > 1 THEN "
        f"sqrt(greatest(({n}*{sxx} - {sx}*{sx}) / ({n}*({n} - 1.0)), 0.0)) END"
    )


def sum_long_sql(expr: str) -> str:
    return f"CAST(SUM({expr}) AS BIGINT)"


# ---------------------------------------------------------------------------
# Silver-layer CTE bodies (twins of cleaning.py)
# ---------------------------------------------------------------------------

_ORDER_SIZE_CASE = (
    "CASE WHEN o_totalprice < 50000.0 THEN 'SMALL' "
    "WHEN o_totalprice < 150000.0 THEN 'MEDIUM' "
    "WHEN o_totalprice < 300000.0 THEN 'LARGE' "
    "WHEN o_totalprice IS NOT NULL THEN 'EXTRA_LARGE' END"
)

_IS_COMPLETE = (
    "COALESCE(upper(trim(o_orderstatus)) IN ('O','F','P') "
    "AND o_totalprice IS NOT NULL AND CAST(o_totalprice AS DOUBLE) > 0 "
    "AND o_orderdate IS NOT NULL, FALSE)"
)

SILVER_ORDERS = f"""
SELECT
  o_orderkey AS order_key,
  o_custkey AS customer_key,
  upper(trim(o_orderstatus)) AS order_status,
  COALESCE(upper(trim(o_orderstatus)) IN ('O','F','P'), FALSE) AS is_valid_status,
  CAST(o_totalprice AS DOUBLE) AS total_price,
  COALESCE(o_totalprice IS NOT NULL AND CAST(o_totalprice AS DOUBLE) > 0, FALSE) AS is_valid_price,
  CAST(o_orderdate AS DATE) AS order_date,
  CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_year,
  CAST(month(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_month,
  CAST(quarter(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_quarter,
  CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS order_day_of_week,
  CAST(dayofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_day_of_year,
  CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS order_week_of_year,
  dayname(CAST(o_orderdate AS DATE)) AS order_day_name,
  {_ORDER_SIZE_CASE} AS order_size_category,
  upper(trim(o_orderpriority)) AS order_priority,
  CAST(str_split(trim(o_orderpriority), '-')[1] AS INTEGER) AS priority_level,
  CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2002-12-31') AS INTEGER) AS days_since_order,
  {_IS_COMPLETE} AS is_complete_order
FROM orders
""".strip()

SILVER_CUSTOMERS = """
SELECT
  c.c_custkey AS customer_key,
  COALESCE(trim(c.c_name), 'Unknown') AS customer_name,
  upper(trim(c.c_mktsegment)) AS market_segment,
  CAST(c.c_acctbal AS DOUBLE) AS account_balance,
  COALESCE(c.c_acctbal IS NOT NULL AND CAST(c.c_acctbal AS DOUBLE) >= 0, FALSE) AS is_balance_nonnegative,
  CASE WHEN c.c_acctbal < 0.0 THEN 'NEGATIVE'
       WHEN c.c_acctbal < 2500.0 THEN 'LOW'
       WHEN c.c_acctbal < 7500.0 THEN 'MEDIUM'
       WHEN c.c_acctbal IS NOT NULL THEN 'HIGH' END AS balance_tier,
  c.c_nationkey AS nation_key,
  upper(trim(n.n_name)) AS nation_name,
  upper(trim(r.r_name)) AS region_name
FROM customer c
LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
""".strip()

SILVER_PARTS = """
SELECT
  p_partkey AS part_key,
  regexp_replace(trim(p_name), '\\s+', ' ', 'g') AS part_name,
  upper(trim(p_brand)) AS brand,
  upper(trim(p_type)) AS part_type,
  str_split(upper(trim(p_type)), ' ')[1] AS part_category,
  p_size AS part_size,
  CASE WHEN p_size < 10 THEN 'COMPACT'
       WHEN p_size < 25 THEN 'SMALL'
       WHEN p_size < 40 THEN 'MEDIUM'
       WHEN p_size IS NOT NULL THEN 'LARGE' END AS size_category,
  CAST(p_retailprice AS DOUBLE) AS retail_price,
  CASE WHEN p_retailprice < 930.0 THEN 'BUDGET'
       WHEN p_retailprice < 960.0 THEN 'STANDARD'
       WHEN p_retailprice < 990.0 THEN 'PREMIUM'
       WHEN p_retailprice IS NOT NULL THEN 'LUXURY' END AS price_tier,
  COALESCE(p_retailprice IS NOT NULL AND CAST(p_retailprice AS DOUBLE) > 0, FALSE) AS is_valid_price
FROM part
""".strip()

SILVER_LINEITEMS = """
SELECT
  l_orderkey AS order_key,
  l_partkey AS part_key,
  l_suppkey AS supplier_key,
  l_linenumber AS line_number,
  CAST(l_quantity AS DOUBLE) AS quantity,
  CAST(l_extendedprice AS DOUBLE) AS extended_price,
  CAST(l_discount AS DOUBLE) AS discount,
  CAST(l_tax AS DOUBLE) AS tax,
  CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)) AS net_revenue,
  CAST(l_extendedprice AS DOUBLE) * (1 - CAST(l_discount AS DOUBLE)) * (1 + CAST(l_tax AS DOUBLE)) AS gross_revenue,
  upper(trim(l_returnflag)) AS return_flag,
  upper(trim(l_linestatus)) AS line_status,
  CAST(l_shipdate AS DATE) AS ship_date,
  COALESCE(l_discount BETWEEN 0.0 AND 1.0, FALSE) AS is_valid_discount
FROM lineitem
""".strip()


def _with(ctes: dict[str, str], body: str) -> str:
    parts = ",\n".join(f"{name} AS (\n{sql}\n)" for name, sql in ctes.items())
    return f"WITH {parts}\n{body}"


# ---------------------------------------------------------------------------
# Gold-layer oracle statements (twins of gold.py)
# ---------------------------------------------------------------------------

_DAILY_BODY = f"""
SELECT order_date,
  COUNT(*) AS total_orders,
  COUNT(DISTINCT customer_key) AS unique_customers,
  {money_sum_sql('total_price')} AS total_revenue,
  {money_avg_sql('total_price')} AS avg_order_value,
  MIN(total_price) AS min_order_value,
  MAX(total_price) AS max_order_value,
  {det_stddev_sql('total_price')} AS order_value_stddev
FROM silver_orders WHERE is_complete_order GROUP BY order_date
""".strip()

_DAILY_LONG_BODY = """
SELECT order_date, metric, value FROM (
  SELECT order_date, 'total_orders' AS metric, CAST(total_orders AS DOUBLE) AS value FROM daily
  UNION ALL SELECT order_date, 'unique_customers', CAST(unique_customers AS DOUBLE) FROM daily
  UNION ALL SELECT order_date, 'total_revenue', total_revenue FROM daily
  UNION ALL SELECT order_date, 'avg_order_value', avg_order_value FROM daily
)
ORDER BY order_date, metric
""".strip()

_MONTHLY_BODY = f"""
SELECT order_year, order_month,
  COUNT(*) AS total_orders,
  COUNT(DISTINCT customer_key) AS unique_customers,
  COUNT(DISTINCT order_date) AS active_days,
  {money_sum_sql('total_price')} AS total_revenue,
  {money_avg_sql('total_price')} AS avg_order_value,
  make_date(order_year, order_month, 1) AS month_start
FROM silver_orders WHERE is_complete_order GROUP BY order_year, order_month
""".strip()

_ROLLUP_BODY = f"""
SELECT order_year, order_month,
  CASE WHEN GROUPING(order_year) = 1 THEN 'grand_total'
       WHEN GROUPING(order_month) = 1 THEN 'year' ELSE 'month' END AS rollup_level,
  COUNT(*) AS total_orders,
  {money_sum_sql('total_price')} AS total_revenue
FROM silver_orders WHERE is_complete_order
GROUP BY ROLLUP(order_year, order_month)
ORDER BY order_year NULLS FIRST, order_month NULLS FIRST
""".strip()

_CUBE_BODY = f"""
SELECT order_status, order_priority,
  CAST(GROUPING(order_status) AS INTEGER) AS status_is_total,
  CAST(GROUPING(order_priority) AS INTEGER) AS priority_is_total,
  COUNT(*) AS total_orders,
  {money_sum_sql('total_price')} AS total_revenue
FROM silver_orders
GROUP BY CUBE(order_status, order_priority)
ORDER BY status_is_total, priority_is_total,
  order_status NULLS FIRST, order_priority NULLS FIRST
""".strip()

_DECILE_BODY = f"""
SELECT decile, customers, min_ltv, max_ltv, decile_value, decile_orders,
  decile_value / CAST(CAST(SUM(CAST(decile_value AS DECIMAL(27,2))) OVER () AS VARCHAR) AS DOUBLE) AS value_share
FROM (
  SELECT decile, CAST(COUNT(*) AS BIGINT) AS customers,
    MIN(lifetime_value) AS min_ltv, MAX(lifetime_value) AS max_ltv,
    {money_sum_sql('lifetime_value')} AS decile_value,
    {sum_long_sql('total_orders')} AS decile_orders
  FROM (
    SELECT customer_key, lifetime_value, total_orders,
      CAST(NTILE(10) OVER (ORDER BY lifetime_value DESC, customer_key ASC) AS INTEGER) AS decile
    FROM (
      SELECT customer_key, COUNT(*) AS total_orders,
        {money_sum_sql('total_price')} AS lifetime_value
      FROM silver_orders WHERE is_complete_order GROUP BY customer_key
    )
  ) GROUP BY decile
)
ORDER BY decile
""".strip()

_PRIORITY_BODY = f"""
SELECT order_priority, total_orders, priority_revenue,
  priority_revenue / CAST(CAST(SUM(CAST(priority_revenue AS DECIMAL(27,2))) OVER () AS VARCHAR) AS DOUBLE) * 100.0 AS revenue_share_pct,
  ROW_NUMBER() OVER (ORDER BY priority_revenue DESC, order_priority ASC) AS priority_rank
FROM (
  SELECT order_priority, COUNT(*) AS total_orders, {money_sum_sql('total_price')} AS priority_revenue
  FROM silver_orders WHERE is_complete_order GROUP BY order_priority
)
""".strip()

_COMPREHENSIVE_BODY = f"""
SELECT 'daily' AS summary_type, strftime(order_date, '%Y-%m-%d') AS period,
  total_orders, unique_customers, total_revenue, avg_order_value
FROM ({_DAILY_BODY})
UNION ALL
SELECT 'monthly' AS summary_type, strftime(month_start, '%Y-%m-%d') AS period,
  total_orders, unique_customers, total_revenue, avg_order_value
FROM ({_MONTHLY_BODY})
""".strip()

_LIFETIME_METRICS_BODY = f"""
SELECT customer_key,
  COUNT(*) AS total_orders,
  {money_sum_sql('total_price')} AS lifetime_value,
  {money_avg_sql('total_price')} AS avg_order_value,
  MIN(total_price) AS min_order_value,
  MAX(total_price) AS max_order_value,
  MIN(order_date) AS first_order_date,
  MAX(order_date) AS last_order_date,
  COUNT(DISTINCT order_year) AS active_years,
  MIN(days_since_order) AS recency_days,
  {sum_long_sql("CASE WHEN order_size_category = 'EXTRA_LARGE' THEN 1 ELSE 0 END")} AS extra_large_orders
FROM silver_orders WHERE is_complete_order GROUP BY customer_key
""".strip()

_RFM_SQL = """
SELECT *,
  CASE WHEN recency_days <= 600 THEN 5 WHEN recency_days <= 900 THEN 4
       WHEN recency_days <= 1400 THEN 3 WHEN recency_days <= 2000 THEN 2 ELSE 1 END AS recency_score,
  CASE WHEN total_orders >= 25 THEN 5 WHEN total_orders >= 15 THEN 4
       WHEN total_orders >= 8 THEN 3 WHEN total_orders >= 3 THEN 2 ELSE 1 END AS frequency_score,
  CASE WHEN lifetime_value >= 4000000 THEN 5 WHEN lifetime_value >= 3000000 THEN 4
       WHEN lifetime_value >= 2000000 THEN 3 WHEN lifetime_value >= 1000000 THEN 2 ELSE 1 END AS monetary_score
FROM lifetime_metrics
""".strip()

_SIZES_SQL = """
SELECT customer_key,
  COUNT(*) FILTER (WHERE order_size_category = 'SMALL') AS size_small_orders,
  COUNT(*) FILTER (WHERE order_size_category = 'MEDIUM') AS size_medium_orders,
  COUNT(*) FILTER (WHERE order_size_category = 'LARGE') AS size_large_orders,
  COUNT(*) FILTER (WHERE order_size_category = 'EXTRA_LARGE') AS size_extra_large_orders
FROM silver_orders WHERE is_complete_order GROUP BY customer_key
""".strip()

_ANALYTICS_BODY = """
SELECT
  sc.customer_key, sc.customer_name, sc.market_segment, sc.account_balance,
  sc.is_balance_nonnegative, sc.balance_tier, sc.nation_key, sc.nation_name, sc.region_name,
  COALESCE(m.total_orders, 0) AS total_orders,
  COALESCE(m.lifetime_value, 0.0) AS lifetime_value,
  COALESCE(m.avg_order_value, 0.0) AS avg_order_value,
  COALESCE(m.min_order_value, 0.0) AS min_order_value,
  COALESCE(m.max_order_value, 0.0) AS max_order_value,
  m.first_order_date, m.last_order_date,
  COALESCE(m.active_years, 0) AS active_years,
  m.recency_days,
  COALESCE(m.extra_large_orders, 0) AS extra_large_orders,
  m.recency_score, m.frequency_score, m.monetary_score,
  CAST(m.recency_score AS VARCHAR) || CAST(m.frequency_score AS VARCHAR) || CAST(m.monetary_score AS VARCHAR) AS rfm_code,
  COALESCE(s.size_small_orders, 0) AS size_small_orders,
  COALESCE(s.size_medium_orders, 0) AS size_medium_orders,
  COALESCE(s.size_large_orders, 0) AS size_large_orders,
  COALESCE(s.size_extra_large_orders, 0) AS size_extra_large_orders,
  CASE WHEN COALESCE(m.total_orders, 0) = 0 THEN 'PROSPECT'
       WHEN m.recency_days <= 720 THEN 'ACTIVE'
       WHEN m.recency_days <= 1500 THEN 'AT_RISK'
       ELSE 'CHURNED' END AS lifecycle_stage
FROM silver_customers sc
LEFT JOIN rfm m ON sc.customer_key = m.customer_key
LEFT JOIN sizes s ON sc.customer_key = s.customer_key
""".strip()

_SEGMENT_BODY = f"""
SELECT customer_segment,
  COUNT(*) AS customer_count,
  {money_sum_sql('lifetime_value')} AS segment_revenue,
  {money_avg_sql('lifetime_value')} AS avg_lifetime_value,
  {money_avg_sql('total_orders')} AS avg_order_count
FROM (
  SELECT CASE WHEN lifetime_value >= 4000000 THEN 'PLATINUM'
              WHEN lifetime_value >= 3000000 THEN 'GOLD'
              WHEN lifetime_value >= 1500000 THEN 'SILVER'
              ELSE 'BRONZE' END AS customer_segment, lifetime_value, total_orders
  FROM (
    SELECT COALESCE(m.lifetime_value, 0.0) AS lifetime_value,
           COALESCE(m.total_orders, 0) AS total_orders
    FROM customer c LEFT JOIN lifetime_metrics m ON c.c_custkey = m.customer_key
  )
) GROUP BY customer_segment
""".strip()

_TOP_PER_SEGMENT_BODY = """
SELECT customer_segment, CAST(segment_rank AS INTEGER) AS segment_rank,
  customer_key, lifetime_value, total_orders
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY customer_segment
            ORDER BY lifetime_value DESC, customer_key ASC) AS segment_rank
  FROM (
    SELECT c.c_custkey AS customer_key,
      COALESCE(m.lifetime_value, 0.0) AS lifetime_value,
      COALESCE(m.total_orders, 0) AS total_orders,
      CASE WHEN COALESCE(m.lifetime_value, 0.0) >= 4000000 THEN 'PLATINUM'
           WHEN COALESCE(m.lifetime_value, 0.0) >= 3000000 THEN 'GOLD'
           WHEN COALESCE(m.lifetime_value, 0.0) >= 1500000 THEN 'SILVER'
           ELSE 'BRONZE' END AS customer_segment
    FROM customer c LEFT JOIN lifetime_metrics m ON c.c_custkey = m.customer_key
  )
) WHERE segment_rank <= 3
ORDER BY customer_segment, segment_rank
""".strip()

_CATEGORY_BODY = f"""
SELECT part_category, category_revenue, category_quantity, line_count, distinct_parts,
  category_revenue / CAST(CAST(SUM(CAST(category_revenue AS DECIMAL(27,4))) OVER () AS VARCHAR) AS DOUBLE) * 100.0 AS revenue_share_pct,
  ROW_NUMBER() OVER (ORDER BY category_revenue DESC, part_category ASC) AS category_rank
FROM (
  SELECT sp.part_category,
    {money_sum_sql('pp.part_revenue', 4)} AS category_revenue,
    SUM(pp.part_quantity) AS category_quantity,
    {sum_long_sql('pp.line_count')} AS line_count,
    COUNT(DISTINCT pp.part_key) AS distinct_parts
  FROM (
    SELECT part_key, {money_sum_sql('net_revenue', 4)} AS part_revenue,
      SUM(quantity) AS part_quantity, COUNT(*) AS line_count
    FROM silver_lineitems GROUP BY part_key
  ) pp
  LEFT JOIN (SELECT part_key, part_category FROM silver_parts) sp ON pp.part_key = sp.part_key
  GROUP BY sp.part_category
)
""".strip()


# ---------------------------------------------------------------------------
# Data-quality oracle statements (twins of quality.py)
# ---------------------------------------------------------------------------


def rule_report_sql(source_sql: str, rules) -> str:
    """Oracle twin of :func:`quality.evaluate_rules` (single-pass + unpivot
    in Spark; wide agg + UNION ALL unpivot here)."""
    wide_cols = ["COUNT(*) AS total_count"]
    for i, r in enumerate(rules):
        expr = r.duck_expression or r.expression
        wide_cols.append(f"CAST(SUM(CASE WHEN {expr} THEN 1 ELSE 0 END) AS BIGINT) AS p{i}")
    unions = "\n  UNION ALL ".join(
        f"SELECT '{r.name}' AS rule_name, p{i} AS passed_count, total_count, "
        f"CAST({r.threshold} AS DOUBLE) AS threshold FROM wide"
        for i, r in enumerate(rules)
    )
    return (
        f"WITH src AS ({source_sql}),\nwide AS (SELECT {', '.join(wide_cols)} FROM src)\n"
        f"SELECT rule_name, passed_count, total_count, "
        f"passed_count/total_count AS pass_rate, threshold, "
        f"passed_count/total_count >= threshold AS passed FROM ({unions})"
    )


def null_profile_sql(table: str, cols: list[str]) -> str:
    unions = "\n  UNION ALL ".join(
        f"SELECT '{c}' AS column_name, "
        f"CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS null_count, "
        f"COUNT(*) AS total_count FROM {table}"
        for c in cols
    )
    return f"SELECT column_name, null_count, total_count, null_count/total_count*100.0 AS null_pct FROM ({unions})"


DUPLICATES_SQL = """
WITH per_key AS (SELECT o_custkey, o_orderdate, COUNT(*) AS cnt FROM orders GROUP BY 1, 2),
s AS (SELECT COUNT(*) AS distinct_keys, CAST(SUM(cnt) AS BIGINT) AS total_rows,
  CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT) AS duplicated_keys,
  CAST(SUM(cnt) - COUNT(*) AS BIGINT) AS excess_rows FROM per_key)
SELECT distinct_keys, total_rows, duplicated_keys, excess_rows,
  excess_rows/total_rows*100.0 AS duplicate_pct FROM s
""".strip()

RANGE_VIOLATIONS_SQL = """
WITH wide AS (SELECT COUNT(*) AS total_count,
  CAST(SUM(CASE WHEN o_totalprice < 0.0 OR o_totalprice > 600000.0 THEN 1 ELSE 0 END) AS BIGINT) AS v0,
  CAST(SUM(CASE WHEN o_custkey < 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
  CAST(SUM(CASE WHEN NOT (o_orderstatus IN ('O','F','P')) THEN 1 ELSE 0 END) AS BIGINT) AS v2,
  CAST(SUM(CASE WHEN NOT (o_orderpriority IN ('1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW')) THEN 1 ELSE 0 END) AS BIGINT) AS v3
  FROM orders)
SELECT 'o_totalprice' AS column_name, v0 AS violation_count, total_count FROM wide
UNION ALL SELECT 'o_custkey', v1, total_count FROM wide
UNION ALL SELECT 'o_orderstatus', v2, total_count FROM wide
UNION ALL SELECT 'o_orderpriority', v3, total_count FROM wide
""".strip()

FRESHNESS_SQL = """
SELECT latest_ts_us,
  (1706659200000000 - latest_ts_us)/CAST(3600000000.0 AS DOUBLE) AS age_hours,
  (1706659200000000 - latest_ts_us)/CAST(3600000000.0 AS DOUBLE) <= 24.0 AS is_fresh
FROM (SELECT CAST(epoch_us(CAST(max(ts) AS TIMESTAMP)) AS BIGINT) AS latest_ts_us FROM events)
""".strip()

OUTLIERS_SQL = """
WITH b AS (SELECT quantile_cont(o_totalprice, 0.25) AS q1, quantile_cont(o_totalprice, 0.75) AS q3,
           COUNT(*) AS total_count FROM orders),
b2 AS (SELECT q1, q3, total_count,
       q1 - 1.5*(q3 - q1) AS lower_bound, q3 + 1.5*(q3 - q1) AS upper_bound FROM b),
c AS (SELECT b2.q1, b2.q3, b2.lower_bound, b2.upper_bound, b2.total_count,
  CAST(SUM(CASE WHEN o.o_totalprice < b2.lower_bound OR o.o_totalprice > b2.upper_bound THEN 1 ELSE 0 END) AS BIGINT) AS outlier_count
  FROM orders o CROSS JOIN b2
  GROUP BY b2.q1, b2.q3, b2.lower_bound, b2.upper_bound, b2.total_count)
SELECT q1, q3, lower_bound, upper_bound, total_count, outlier_count,
  outlier_count/total_count*100.0 AS outlier_pct FROM c
""".strip()


# ---------------------------------------------------------------------------
# ML features (twin of features.py)
# ---------------------------------------------------------------------------

_SPLIT_BUCKET = "(customer_key * 2654435761) % 100"

_ML_FEATURES_BODY = f"""
SELECT *,
  round(ln(1.0 + lifetime_value), 6) AS log_lifetime_value,
  greatest(orders_q1, orders_q2, orders_q3, orders_q4) AS max_quarter_orders,
  CASE WHEN order_value_stddev IS NOT NULL AND avg_order_value > 0
       THEN 1.0/(1.0 + order_value_stddev/avg_order_value) END AS order_consistency,
  CASE WHEN total_orders > 1
       THEN (first_order_age_days - recency_days)/(total_orders - 1) END AS avg_days_between_orders,
  first_order_age_days - recency_days AS tenure_days,
  recency_days > 1500 AS churn_flag,
  lifetime_value >= 3000000 AS is_high_value,
  CASE WHEN lifetime_value >= 4000000 THEN 'HIGH'
       WHEN lifetime_value >= 2000000 THEN 'MEDIUM' ELSE 'LOW' END AS clv_bucket,
  {_SPLIT_BUCKET} AS split_bucket,
  CASE WHEN {_SPLIT_BUCKET} < 70 THEN 'train'
       WHEN {_SPLIT_BUCKET} < 85 THEN 'validation' ELSE 'test' END AS data_split
FROM (
  SELECT customer_key,
    COUNT(*) AS total_orders,
    {money_sum_sql('total_price')} AS lifetime_value,
    {money_avg_sql('total_price')} AS avg_order_value,
    {det_stddev_sql('total_price')} AS order_value_stddev,
    MIN(total_price) AS min_order_value,
    MAX(total_price) AS max_order_value,
    MIN(days_since_order) AS recency_days,
    MAX(days_since_order) AS first_order_age_days,
    COUNT(DISTINCT order_year) AS active_years,
    {sum_long_sql('CASE WHEN order_quarter = 1 THEN 1 ELSE 0 END')} AS orders_q1,
    {sum_long_sql('CASE WHEN order_quarter = 2 THEN 1 ELSE 0 END')} AS orders_q2,
    {sum_long_sql('CASE WHEN order_quarter = 3 THEN 1 ELSE 0 END')} AS orders_q3,
    {sum_long_sql('CASE WHEN order_quarter = 4 THEN 1 ELSE 0 END')} AS orders_q4,
    {sum_long_sql('CASE WHEN order_day_of_week IN (1,7) THEN 1 ELSE 0 END')} AS weekend_orders,
    {sum_long_sql("CASE WHEN order_size_category = 'EXTRA_LARGE' THEN 1 ELSE 0 END")} AS extra_large_orders
  FROM silver_orders WHERE is_complete_order GROUP BY customer_key
)
""".strip()

# ---------------------------------------------------------------------------
# Event analytics (twins of events_analytics.py); event-time columns from
# integer µs arithmetic exactly like datalake.load_events
# ---------------------------------------------------------------------------

_EV_US = "CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT)"

EVENTS_BASE = f"""
SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value, props,
  {_EV_US} AS ts_us,
  DATE '1970-01-01' + CAST(({_EV_US} // 86400000000) AS INTEGER) AS event_date,
  CAST((({_EV_US} % 86400000000) // 3600000000) AS INTEGER) AS event_hour
FROM events
""".strip()

_ENRICHED_BODY = """
SELECT event_id, user_id, event_type, ts_us, event_date, event_hour, value,
  CAST(props->>'k' AS INTEGER) AS prop_k,
  CASE WHEN value < 10.0 THEN 'LOW' WHEN value < 100.0 THEN 'MEDIUM' ELSE 'HIGH' END AS value_bucket,
  event_type = 'error' AS is_error,
  event_type = 'purchase' AS is_purchase
FROM ev
""".strip()

_HOURLY_BODY = f"""
SELECT event_date, event_hour, event_count, unique_users, total_value, avg_value, error_count,
  error_count/event_count*100.0 AS error_rate_pct
FROM (
  SELECT event_date, event_hour,
    COUNT(*) AS event_count,
    COUNT(DISTINCT user_id) AS unique_users,
    {money_sum_sql('value')} AS total_value,
    {money_avg_sql('value')} AS avg_value,
    {sum_long_sql("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END")} AS error_count
  FROM ev GROUP BY event_date, event_hour
)
""".strip()

_SLIDING_BODY = f"""
SELECT window_start_us, window_start_us + 3600000000 AS window_end_us,
  event_count, unique_users, total_value, error_count
FROM (
  SELECT (ts_us // 1800000000 - k) * 1800000000 AS window_start_us,
    COUNT(*) AS event_count,
    COUNT(DISTINCT user_id) AS unique_users,
    {money_sum_sql('value')} AS total_value,
    {sum_long_sql("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END")} AS error_count
  FROM ev CROSS JOIN (SELECT CAST(unnest(range(0, 2)) AS BIGINT) AS k)
  GROUP BY 1
)
ORDER BY window_start_us
""".strip()

_ERROR_CONTEXT_BODY = """
SELECT event_id, user_id, ts_us, trailing_events, trailing_value FROM (
  SELECT event_id, user_id, ts_us, event_type,
    CAST(COUNT(*) OVER w - 1 AS BIGINT) AS trailing_events,
    CAST(SUM(CAST(value AS DECIMAL(27,2))) OVER w AS DOUBLE) - value AS trailing_value
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
               RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)
)
WHERE event_type = 'error'
ORDER BY event_id
""".strip()

_ATTRIBUTION_BODY = """
SELECT event_id, user_id, ts_us, value, src_event_id, src_type, src_ts_us, gap_us FROM (
  SELECT m.event_id, m.user_id, m.ts_us, m.value, m.src_event_id, m.src_type, m.src_ts_us,
    m.ts_us - m.src_ts_us AS gap_us
  FROM (
    SELECT p.event_id, p.user_id, p.ts_us, p.value, t.src_event_id, t.src_type, t.src_ts_us,
      ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY t.src_ts_us DESC, t.src_event_id DESC) AS rn
    FROM p JOIN t ON t.user_id = p.user_id AND t.src_ts_us <= p.ts_us
  ) m WHERE m.rn = 1
  UNION ALL
  SELECT p.event_id, p.user_id, p.ts_us, p.value, NULL, NULL, NULL, NULL
  FROM p WHERE NOT EXISTS (SELECT 1 FROM t WHERE t.user_id = p.user_id AND t.src_ts_us <= p.ts_us)
)
ORDER BY event_id
""".strip()

_ATTRIBUTION_P = (
    "SELECT event_id, user_id, ts_us, value FROM ev WHERE event_type = 'purchase'"
)
_ATTRIBUTION_T = (
    "SELECT user_id, ts_us AS src_ts_us, event_id AS src_event_id, event_type AS src_type "
    "FROM ev WHERE event_type IN ('click', 'view')"
)

_TYPE_SUMMARY_BODY = f"""
SELECT event_type, event_count, unique_users, total_value, avg_value,
  event_count / CAST(SUM(event_count) OVER () AS BIGINT) * 100.0 AS event_share_pct
FROM (
  SELECT event_type,
    COUNT(*) AS event_count,
    COUNT(DISTINCT user_id) AS unique_users,
    {money_sum_sql('value')} AS total_value,
    {money_avg_sql('value')} AS avg_value
  FROM ev GROUP BY event_type
)
""".strip()

_SESSIONS_CTE = """
SELECT *, CAST(SUM(is_session_start) OVER (
    PARTITION BY user_id ORDER BY ts_us, event_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
FROM (
  SELECT *, CASE WHEN prev_ts_us IS NULL OR ts_us - prev_ts_us > 1800000000 THEN 1 ELSE 0 END AS is_session_start
  FROM (
    SELECT *, LAG(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_ts_us FROM ev
  )
)
""".strip()

_SESSION_SUMMARY_BODY = f"""
SELECT user_id, session_seq, session_events, session_start_us, session_end_us,
  distinct_event_types, session_value, purchase_events,
  (session_end_us - session_start_us)/CAST(60000000.0 AS DOUBLE) AS session_minutes
FROM (
  SELECT user_id, session_seq,
    COUNT(*) AS session_events,
    MIN(ts_us) AS session_start_us,
    MAX(ts_us) AS session_end_us,
    COUNT(DISTINCT event_type) AS distinct_event_types,
    {money_sum_sql('value')} AS session_value,
    {sum_long_sql("CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END")} AS purchase_events
  FROM sessions GROUP BY user_id, session_seq
)
""".strip()

_USER_ACTIVITY_BODY = f"""
SELECT user_id, session_count, total_events, total_session_us, total_value, total_purchases,
  total_session_us/session_count/CAST(60000000.0 AS DOUBLE) AS avg_session_minutes
FROM (
  SELECT user_id,
    COUNT(*) AS session_count,
    {sum_long_sql('session_events')} AS total_events,
    {sum_long_sql('session_end_us - session_start_us')} AS total_session_us,
    {money_sum_sql('session_value')} AS total_value,
    {sum_long_sql('purchase_events')} AS total_purchases
  FROM sess GROUP BY user_id
)
""".strip()


def _feature_event_oracles() -> dict[str, str]:
    session_sql = _with({"ev": EVENTS_BASE, "sessions": _SESSIONS_CTE}, _SESSION_SUMMARY_BODY)
    return {
        "ml_customer_features": _with({"silver_orders": SILVER_ORDERS}, _ML_FEATURES_BODY),
        "events_enriched": _with({"ev": EVENTS_BASE}, _ENRICHED_BODY),
        "hourly_event_summary": _with({"ev": EVENTS_BASE}, _HOURLY_BODY),
        "sliding_window_summary": _with({"ev": EVENTS_BASE}, _SLIDING_BODY),
        "purchase_attribution": _with(
            {"ev": EVENTS_BASE, "p": _ATTRIBUTION_P, "t": _ATTRIBUTION_T}, _ATTRIBUTION_BODY
        ),
        "error_context": _with({"ev": EVENTS_BASE}, _ERROR_CONTEXT_BODY),
        "event_type_summary": _with({"ev": EVENTS_BASE}, _TYPE_SUMMARY_BODY),
        "session_summary": session_sql,
        "user_activity_summary": _with(
            {"ev": EVENTS_BASE, "sessions": _SESSIONS_CTE, "sess": _SESSION_SUMMARY_BODY},
            _USER_ACTIVITY_BODY,
        ),
    }


# ---------------------------------------------------------------------------
# Text analysis (twins of operators/text.py)
# ---------------------------------------------------------------------------

_W = "string_split_regex(trim(text), '\\s+')"
_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

TEXT_STATS = f"""
SELECT doc_id, lang, source,
  CAST(length(text) AS INTEGER) AS char_count,
  CAST(CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_W}) END AS INTEGER) AS word_count,
  CAST(len(list_distinct({_W})) AS INTEGER) AS distinct_words,
  CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS INTEGER) AS token_count,
  CAST(len(regexp_extract_all(text, '[0-9]')) AS INTEGER) AS digit_chars,
  CAST(len(regexp_extract_all(text, '[^A-Za-z0-9\\s]')) AS INTEGER) AS punct_chars,
  CAST(len(regexp_extract_all(text, '\\s')) AS INTEGER) AS space_chars,
  CAST(list_reduce(list_transform({_W}, w -> len(w)), (a, b) -> a + b) AS BIGINT) AS letter_chars
FROM documents
""".strip()

_TEXT_STATS_DERIVED = """
SELECT *,
  CASE WHEN word_count > 0 THEN letter_chars/word_count END AS avg_word_len,
  CASE WHEN word_count > 0 THEN distinct_words/word_count END AS lexical_diversity,
  CASE WHEN char_count > 0 THEN digit_chars/char_count END AS digit_ratio,
  CASE WHEN char_count > 0 THEN punct_chars/char_count END AS punct_ratio,
  CASE WHEN char_count > 0 THEN space_chars/char_count END AS space_ratio
FROM base
""".strip()

_QUALITY_BODY = """
SELECT *,
  CAST((CASE WHEN word_count >= 50 THEN 40 WHEN word_count >= 20 THEN 30 WHEN word_count >= 5 THEN 15 ELSE 0 END)
     + (CASE WHEN lexical_diversity >= 0.7 THEN 30 WHEN lexical_diversity >= 0.4 THEN 20 WHEN lexical_diversity >= 0.2 THEN 10 ELSE 0 END)
     + (CASE WHEN punct_ratio <= 0.1 THEN 30 WHEN punct_ratio <= 0.25 THEN 15 ELSE 0 END) AS INTEGER) AS quality_score
FROM stats
""".strip()


def _lang_hits_sql() -> str:
    from dataengineeringpipeline_spark.operators.text import CJK_REGEX, LANG_STOPWORDS

    hit_cols = ",\n  ".join(
        f"CAST(len(list_filter({_W}, w -> list_contains({list(ws)!r}, w))) AS INTEGER) AS hits_{lang}".replace(
            "'", "'"
        )
        for lang, ws in LANG_STOPWORDS.items()
    )
    # python list repr uses single quotes — valid DuckDB list literal
    return (
        f"SELECT doc_id, lang,\n"
        f"  CAST(len(regexp_extract_all(text, '{CJK_REGEX}')) AS INTEGER) AS cjk_chars,\n  {hit_cols}\nFROM documents"
    )


_LANG_PRED = """
SELECT *,
  CASE WHEN cjk_chars > 0 THEN 'zh'
       WHEN hits_en >= hits_es AND hits_en >= hits_fr AND hits_en >= hits_de AND hits_en > 0 THEN 'en'
       WHEN hits_es >= hits_fr AND hits_es >= hits_de AND hits_es > 0 THEN 'es'
       WHEN hits_fr >= hits_de AND hits_fr > 0 THEN 'fr'
       WHEN hits_de > 0 THEN 'de'
       ELSE 'unknown' END AS predicted_lang
FROM scores
""".strip()

_FINGERPRINT_SQL = """
SELECT doc_id,
  md5(text) AS md5_exact,
  md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS md5_normalized,
  CAST('0x' || substring(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')), 1, 12) AS BIGINT) AS content_key
FROM documents
""".strip()


#: Mirrors text.repetition_stats (n=3): duplicate-ngram fraction per doc.
_REPETITION_SQL = f"""
SELECT doc_id,
  CAST(len(grams) AS INTEGER) AS total_ngrams,
  CAST(len(list_distinct(grams)) AS INTEGER) AS distinct_ngrams,
  CASE WHEN len(grams) > 0
       THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
       ELSE 0.0 END AS dup_ngram_ratio,
  (CASE WHEN len(grams) > 0
        THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
        ELSE 0.0 END) > 0.2 AS is_repetitive
FROM (
  SELECT doc_id, CASE WHEN len(ws) >= 3
    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
    ELSE [] END AS grams
  FROM (SELECT doc_id, {_W} AS ws FROM documents)
)
""".strip()


def _chunk_summary_sql(chunk_tokens: int = 64, overlap: int = 16) -> str:
    """Mirrors text.chunk_summary: per-doc rollup of the token-window
    chunking (chunk count / token totals / bounds)."""
    stride = chunk_tokens - overlap
    return f"""
WITH toks AS (
  SELECT doc_id, len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n FROM documents
),
counted AS (
  SELECT doc_id, n,
    CASE WHEN n > 0 THEN CAST(ceil(n / {stride}.0) AS INTEGER) ELSE 0 END AS num0
  FROM toks
),
final AS (
  SELECT doc_id, n,
    CASE WHEN num0 > 1 AND (num0 - 1) * {stride} + {overlap} >= n
         THEN num0 - 1 ELSE num0 END AS num
  FROM counted
),
chunks AS (
  SELECT doc_id, n, unnest(range(0, num)) AS ci FROM final WHERE num > 0
)
SELECT doc_id,
  CAST(COUNT(*) AS BIGINT) AS chunk_count,
  CAST(SUM(LEAST({chunk_tokens}, n - ci * {stride})) AS BIGINT) AS chunked_tokens,
  CAST(MAX(LEAST({chunk_tokens}, n - ci * {stride})) AS INTEGER) AS max_chunk_tokens,
  CAST(MIN(LEAST({chunk_tokens}, n - ci * {stride})) AS INTEGER) AS min_chunk_tokens
FROM chunks GROUP BY doc_id ORDER BY doc_id
""".strip()


def _pack_ctes(
    source: str,
    chunk_tokens: int = 64,
    overlap: int = 16,
    budget: int = 256,
    num_groups: int = 8,
    prefix: str = "pk_",
) -> dict[str, str]:
    """CTE chain mirroring text.chunk_documents -> text.pack_chunks over
    ``source`` (a table/CTE with doc_id + text): the final CTE
    ``<prefix>packed`` has one row per chunk with (pack_group, seq_id,
    sz). ``prefix`` keeps names collision-free when composed into larger
    statements (e.g. the training-corpus funnel)."""
    stride = chunk_tokens - overlap
    p = prefix
    return {
        f"{p}toks": (
            f"SELECT doc_id, len(regexp_extract_all(text, '{_TOKEN_RE}')) AS n FROM {source}"
        ),
        f"{p}counted": (
            f"SELECT doc_id, n, CASE WHEN n > 0 THEN CAST(ceil(n / {stride}.0) AS INTEGER) "
            f"ELSE 0 END AS num0 FROM {p}toks"
        ),
        f"{p}final": (
            f"SELECT doc_id, n, CASE WHEN num0 > 1 AND (num0 - 1) * {stride} + {overlap} >= n "
            f"THEN num0 - 1 ELSE num0 END AS num FROM {p}counted"
        ),
        f"{p}chunks": (
            f"SELECT doc_id, n, unnest(range(0, num)) AS ci FROM {p}final WHERE num > 0"
        ),
        f"{p}sized": (
            f"SELECT doc_id, ci, LEAST({chunk_tokens}, n - ci * {stride}) AS sz, "
            f"doc_id % {num_groups} AS pack_group FROM {p}chunks"
        ),
        f"{p}packed": (
            f"SELECT pack_group, FLOOR(COALESCE(SUM(sz) OVER (PARTITION BY pack_group "
            f"ORDER BY doc_id, ci ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) "
            f"/ {budget}) AS seq_id, sz FROM {p}sized"
        ),
    }


def _pack_summary_sql(
    chunk_tokens: int = 64, overlap: int = 16, budget: int = 256, num_groups: int = 8
) -> str:
    """Mirrors text.pack_summary: chunk -> hash-group -> running-sum pack ->
    per-sequence rollup."""
    body = f"""
SELECT pack_group, CAST(seq_id AS BIGINT) AS seq_id,
  CAST(COUNT(*) AS BIGINT) AS chunk_count,
  CAST(SUM(sz) AS BIGINT) AS seq_tokens,
  CAST(SUM(sz) AS DOUBLE) / {budget} AS fill_ratio
FROM pk_packed GROUP BY pack_group, seq_id ORDER BY pack_group, seq_id
""".strip()
    return _with(_pack_ctes("documents", chunk_tokens, overlap, budget, num_groups), body)


def _length_distribution_sql() -> str:
    """Twin of text.doc_length_distribution (exact mode): quantile_cont
    over doubles interpolates with the same lo + (hi-lo)*frac arithmetic
    as Spark's percentile, so the grid is bit-exact; means are exact
    integer sums divided as doubles."""
    from dataengineeringpipeline_spark.operators.text import LENGTH_PERCENTILES

    cols = []
    for name in ("char", "word"):
        cols += [
            f"quantile_cont(CAST({name}_count AS DOUBLE), {p}) AS {name}_p{round(p * 100)}"
            for p in LENGTH_PERCENTILES
        ]
    body = f"""
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs, {', '.join(cols)},
  CAST(SUM(char_count) AS DOUBLE) / COUNT(*) AS avg_chars,
  CAST(SUM(word_count) AS DOUBLE) / COUNT(*) AS avg_words
FROM base GROUP BY source ORDER BY source
""".strip()
    return _with({"base": TEXT_STATS}, body)


def _text_oracles() -> dict[str, str]:
    return {
        "text_stats": _with({"base": TEXT_STATS}, _TEXT_STATS_DERIVED),
        "doc_length_distribution": _length_distribution_sql(),
        "repetition_stats": _REPETITION_SQL,
        "chunk_summary": _chunk_summary_sql(),
        "pack_summary": _pack_summary_sql(),
        "text_quality": _with(
            {"base": TEXT_STATS, "stats": _TEXT_STATS_DERIVED},
            "SELECT *, quality_score >= 70 AS is_high_quality FROM (" + _QUALITY_BODY + ")",
        ),
        "language_id_eval": _with(
            {"scores": _lang_hits_sql(), "pred": _LANG_PRED},
            "SELECT lang, predicted_lang, COUNT(*) AS doc_count FROM pred GROUP BY lang, predicted_lang",
        ),
        "doc_fingerprints": _FINGERPRINT_SQL,
        "classifier_quality_summary": _classifier_summary_sql(),
        "lexical_search_topk": _lexical_search_sql(),
        "pii_redaction_report": _pii_redaction_sql(),
    }


def _pii_redaction_sql() -> str:
    """Twin of text.pii_redaction_report: rebuilds the planted dirty
    text from doc_id by concatenation (no code shared with the
    scrubber), counts matches per pattern, and md5s the scrubbed text.
    The regexes live in text.py and are dialect-portable by design
    (no backrefs/lookaheads — Java regex and RE2 agree)."""
    from dataengineeringpipeline_spark.operators.text import (
        EMAIL_REGEX,
        PHONE_REGEX,
        URL_REGEX,
    )

    dirty = (
        "text"
        " || CASE WHEN doc_id % 4 = 0 THEN ' Contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com' ELSE '' END"
        " || CASE WHEN doc_id % 12 = 0 THEN ' via https://example.org/u/'"
        " || CAST(doc_id AS VARCHAR) ELSE '' END"
        " || CASE WHEN doc_id % 20 = 0 THEN ' or (555) 010-'"
        " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"
    )
    scrubbed = (
        f"regexp_replace(regexp_replace(regexp_replace(dirty, '{EMAIL_REGEX}',"
        f" '[EMAIL]', 'g'), '{URL_REGEX}', '[URL]', 'g'), '{PHONE_REGEX}', '[PHONE]', 'g')"
    )
    return _with(
        {
            "d": f"SELECT doc_id, {dirty} AS dirty FROM documents",
            "c": (
                "SELECT doc_id,"
                f" CAST(len(regexp_extract_all(dirty, '{EMAIL_REGEX}')) AS BIGINT) AS email_count,"
                f" CAST(len(regexp_extract_all(dirty, '{URL_REGEX}')) AS BIGINT) AS url_count,"
                f" CAST(len(regexp_extract_all(dirty, '{PHONE_REGEX}')) AS BIGINT) AS phone_count,"
                f" md5({scrubbed}) AS scrubbed_md5 FROM d"
            ),
        },
        """
SELECT doc_id, email_count, url_count, phone_count,
  email_count + url_count + phone_count AS redaction_count, scrubbed_md5
FROM c WHERE email_count + url_count + phone_count > 0 ORDER BY doc_id
""".strip(),
    )


def _lexical_search_sql() -> str:
    """Twin of operators/search.lexical_search_topk (k=5, query_mod=100,
    no df cap — mirrors the contract call's defaults)."""
    from dataengineeringpipeline_spark.operators.search import WEIGHT_SCALE

    return _with(
        {
            "ct": (
                "SELECT doc_id, unnest(list_distinct(ws)) AS term "
                f"FROM (SELECT doc_id, {_W} AS ws FROM documents WHERE doc_id % 100 <> 0)"
            ),
            "nrow": "SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ct",
            "wts": (
                f"SELECT term, CAST((n_docs * {WEIGHT_SCALE}) // df AS BIGINT) AS weight "
                "FROM (SELECT term, COUNT(*) AS df FROM ct GROUP BY term), nrow"
            ),
            "qt": (
                "SELECT doc_id AS query_id, unnest(list_distinct(ws)) AS term "
                f"FROM (SELECT doc_id, {_W} AS ws FROM documents WHERE doc_id % 100 = 0)"
            ),
            "m": (
                "SELECT q.query_id, c.doc_id,\n"
                "  CAST(COUNT(*) AS BIGINT) AS shared_terms, CAST(SUM(w.weight) AS BIGINT) AS score\n"
                "FROM qt q JOIN wts w USING (term) JOIN ct c USING (term)\n"
                "GROUP BY q.query_id, c.doc_id"
            ),
        },
        """
SELECT query_id, doc_id, shared_terms, score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank FROM m
) WHERE rank <= 5 ORDER BY query_id, rank
""".strip(),
    )


def _classifier_summary_sql() -> str:
    """Twin of operators/classify.classifier_quality_summary — the
    feature hash, bucket, and weight arithmetic are recomputed in SQL
    from the module's constants."""
    from dataengineeringpipeline_spark.operators.classify import (
        _MULT,
        _WEIGHT_MOD,
        _WEIGHT_SHIFT,
        N_BUCKETS,
    )

    weight = (
        f"(({_wh('t')} % {N_BUCKETS}) * {_MULT}) % {_WEIGHT_MOD} - {_WEIGHT_SHIFT}"
    )
    return _with(
        {
            "feats": (
                f"SELECT doc_id, source, list_concat(ws,"
                " list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1])) AS fs "
                f"FROM (SELECT doc_id, source, {_W} AS ws FROM documents)"
            ),
            "scored": (
                "SELECT doc_id, source, len(fs) AS n_features,\n"
                f"  list_reduce(list_transform(fs, t -> {weight}), (a, b) -> a + b) AS score_sum\n"
                "FROM feats"
            ),
        },
        """
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN score_sum >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
  CAST(SUM(CASE WHEN score_sum >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS keep_rate,
  CAST(SUM(n_features) AS BIGINT) AS total_features,
  CAST(SUM(score_sum) AS BIGINT) AS total_score,
  CAST(SUM(score_sum) AS DOUBLE) / CAST(SUM(n_features) AS DOUBLE) AS mean_feature_score
FROM scored GROUP BY source ORDER BY source
""".strip(),
    )


# ---------------------------------------------------------------------------
# Dedup (twins of operators/dedup.py — constants imported so the oracle
# always mirrors the engine's parameters)
# ---------------------------------------------------------------------------


def _wh(expr: str) -> str:
    """48-bit md5-prefix hash — twin of operators.text.word_hash."""
    return f"CAST('0x' || substring(md5({expr}), 1, 12) AS BIGINT)"


_SHINGLES = r"""
SELECT DISTINCT doc_id, shingle FROM (
  SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
    THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
    ELSE [] END) AS shingle
  FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents)
)
""".strip()

_SHINGLE_HASHES = f"SELECT doc_id, {_wh('shingle')} AS h FROM shingles"


def _jaccard_sql(items_cte: str, key: str, max_df: int | None = None) -> str:
    """Pairwise Jaccard over (doc_id, key) sets; ``max_df`` mirrors the
    Spark side's frequent-element stop-filter (dedup.DEDUP_MAX_DF): when
    set, elements with document frequency > max_df are removed from both
    the join and the set sizes."""
    src = items_cte
    if max_df is not None:
        src = f"""(
  SELECT i.doc_id, i.{key} FROM {items_cte} i
  JOIN (SELECT {key}, COUNT(*) AS df FROM {items_cte} GROUP BY {key}) d
    ON i.{key} = d.{key} AND d.df <= {max_df}
)"""
    return f"""
SELECT doc_a, doc_b, shared, sa.set_size AS size_a, sb.set_size AS size_b,
  shared/(sa.set_size + sb.set_size - shared) AS jaccard
FROM (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM {src} a JOIN {src} b ON a.{key} = b.{key} AND a.doc_id < b.doc_id
  GROUP BY 1, 2
) p
JOIN (SELECT doc_id, COUNT(*) AS set_size FROM {src} GROUP BY doc_id) sa ON p.doc_a = sa.doc_id
JOIN (SELECT doc_id, COUNT(*) AS set_size FROM {src} GROUP BY doc_id) sb ON p.doc_b = sb.doc_id
""".strip()


EXACT_DEDUP_SQL = """
WITH t AS (SELECT doc_id, md5(text) AS md5_exact FROM documents),
g AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY md5_exact ORDER BY doc_id) AS rn,
      CAST(COUNT(*) OVER (PARTITION BY md5_exact) AS BIGINT) AS group_size FROM t)
SELECT doc_id, md5_exact, group_size, group_size > 1 AS had_duplicates FROM g WHERE rn = 1
""".strip()


def _dup_span_sql(window: int, stride: int) -> str:
    """Twin of dedup.duplicate_span_coverage: sliding char-window hashes,
    ≥2-occurrence duplicate marking, per-doc gaps-and-islands union."""
    return f"""
WITH base AS (
  SELECT doc_id, length(text) AS doc_chars, text FROM documents
),
wins AS (
  SELECT doc_id, pos, {_wh(f'substring(text, pos, {window})')} AS h
  FROM (
    SELECT doc_id, text, unnest(generate_series(1, doc_chars - {window - 1}, {stride})) AS pos
    FROM base WHERE doc_chars >= {window}
  )
),
dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
ds AS (SELECT w.doc_id, w.pos, w.pos + {window - 1} AS e FROM wins w JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos, e,
    CASE WHEN max(e) OVER pw IS NULL OR pos > max(e) OVER pw + 1 THEN 1 ELSE 0 END AS ni
  FROM ds
  WINDOW pw AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl2 AS (
  SELECT *, SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM isl
),
per_isl AS (SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS e2, COUNT(*) AS c FROM isl2 GROUP BY 1, 2),
per_doc AS (SELECT doc_id, SUM(e2 - s + 1) AS dup_chars, SUM(c) AS dup_windows FROM per_isl GROUP BY 1)
SELECT b.doc_id,
  CAST(b.doc_chars AS BIGINT) AS doc_chars,
  CAST(CASE WHEN b.doc_chars >= {window} THEN (b.doc_chars - {window}) // {stride} + 1 ELSE 0 END AS BIGINT) AS total_windows,
  CAST(COALESCE(d.dup_windows, 0) AS BIGINT) AS dup_windows,
  CAST(COALESCE(d.dup_chars, 0) AS BIGINT) AS dup_chars,
  CASE WHEN b.doc_chars > 0 THEN CAST(COALESCE(d.dup_chars, 0) AS DOUBLE) / b.doc_chars ELSE 0.0 END AS dup_char_ratio
FROM base b LEFT JOIN per_doc d USING (doc_id)
ORDER BY doc_id
""".strip()


def _span_removal_sql(window: int, stride: int) -> str:
    """Twin of dedup.remove_duplicate_spans: coverage islands, kept
    segments via lag-gaps + tail, string_agg reconstruction, md5."""
    return f"""
WITH base AS (
  SELECT doc_id, length(text) AS doc_chars, text FROM documents
),
wins AS (
  SELECT doc_id, pos, {_wh(f'substring(text, pos, {window})')} AS h
  FROM (
    SELECT doc_id, text, unnest(generate_series(1, doc_chars - {window - 1}, {stride})) AS pos
    FROM base WHERE doc_chars >= {window}
  )
),
dup AS (SELECT h FROM wins GROUP BY h HAVING count(*) >= 2),
ds AS (SELECT w.doc_id, w.pos, w.pos + {window - 1} AS e FROM wins w JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos, e,
    CASE WHEN max(e) OVER pw IS NULL OR pos > max(e) OVER pw + 1 THEN 1 ELSE 0 END AS ni
  FROM ds
  WINDOW pw AS (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
),
isl2 AS (
  SELECT *, SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS island FROM isl
),
per_isl AS (SELECT doc_id, island, MIN(pos) AS s, MAX(e) AS e2 FROM isl2 GROUP BY 1, 2),
segs AS (
  SELECT doc_id, COALESCE(LAG(e2) OVER (PARTITION BY doc_id ORDER BY s), 0) + 1 AS seg_start,
         s - 1 AS seg_end
  FROM per_isl
  UNION ALL
  SELECT doc_id, MAX(e2) + 1 AS seg_start, NULL AS seg_end FROM per_isl GROUP BY doc_id
),
cleaned AS (
  SELECT s2.doc_id,
    string_agg(
      CASE WHEN s2.seg_end IS NULL
           THEN substring(b.text, s2.seg_start, b.doc_chars - s2.seg_start + 1)
           ELSE substring(b.text, s2.seg_start, s2.seg_end - s2.seg_start + 1) END,
      '' ORDER BY s2.seg_start) AS ct
  FROM segs s2 JOIN base b USING (doc_id) GROUP BY s2.doc_id
)
SELECT b.doc_id,
  CAST(b.doc_chars AS BIGINT) AS doc_chars,
  CAST(b.doc_chars - length(COALESCE(c.ct, b.text)) AS BIGINT) AS removed_chars,
  CAST(length(COALESCE(c.ct, b.text)) AS BIGINT) AS kept_chars,
  md5(COALESCE(c.ct, b.text)) AS cleaned_md5
FROM base b LEFT JOIN cleaned c USING (doc_id)
ORDER BY doc_id
""".strip()


def _span_pair_sql(window: int, stride: int, max_df: int, min_windows: int) -> str:
    """Twin of dedup.shared_span_pairs: per-(doc, hash) first positions,
    df-capped postings, hash self-join, per-pair aggregation."""
    return f"""
WITH base AS (
  SELECT doc_id, length(text) AS doc_chars, text FROM documents
),
wins0 AS (
  SELECT doc_id, pos, {_wh(f'substring(text, pos, {window})')} AS h
  FROM (
    SELECT doc_id, text, unnest(generate_series(1, doc_chars - {window - 1}, {stride})) AS pos
    FROM base WHERE doc_chars >= {window}
  )
),
wins AS (SELECT doc_id, h, MIN(pos) AS pos FROM wins0 GROUP BY doc_id, h),
keep AS (SELECT h FROM wins GROUP BY h HAVING COUNT(*) <= {max_df}),
posts AS (SELECT w.doc_id, w.h, w.pos FROM wins w JOIN keep USING (h))
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
  CAST(COUNT(*) AS BIGINT) AS shared_windows,
  CAST(MIN(a.pos) AS INTEGER) AS min_pos_a,
  CAST(MIN(b.pos) AS INTEGER) AS min_pos_b
FROM posts a JOIN posts b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2 HAVING COUNT(*) >= {min_windows}
ORDER BY doc_a, doc_b
""".strip()


def _dedup_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.operators.dedup import (
        DEDUP_MAX_DF,
        LSH_BANDS,
        LSH_ROWS,
        MINHASH_P,
        SIMHASH_BITS,
        SPAN_PAIR_MAX_DF,
        SPAN_STRIDE,
        SPAN_WINDOW,
        _minhash_params,
    )

    k = LSH_BANDS * LSH_ROWS
    sig_cols = []
    for j in range(k):
        a, b = _minhash_params(j)
        sig_cols.append(f"MIN(({a} * (h % {MINHASH_P}) + {b}) % {MINHASH_P}) AS sig_{j}")
    sigs = f"SELECT doc_id, {', '.join(sig_cols)} FROM shingle_hashes GROUP BY doc_id"

    band_selects = []
    for bidx in range(LSH_BANDS):
        expr = None
        for r in range(LSH_ROWS):
            c = f"sig_{bidx * LSH_ROWS + r}"
            expr = c if expr is None else f"({expr}) * 31 + {c}"
        band_selects.append(f"SELECT doc_id, {bidx} AS band_idx, {expr} AS band_hash FROM sigs")
    bands = "\nUNION ALL ".join(band_selects)

    minhash_pairs = f"""
SELECT c.doc_a, c.doc_b, j.shared, j.size_a, j.size_b, j.jaccard
FROM (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band_idx = b.band_idx AND a.band_hash = b.band_hash AND a.doc_id < b.doc_id
) c
JOIN ({_jaccard_sql('shingle_hashes', 'h')}) j
  ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
WHERE j.jaccard >= 0.5
""".strip()

    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS _b{b}"
        for b in range(SIMHASH_BITS)
    )
    sim_terms = " + ".join(
        f"(CASE WHEN _b{b} > 0 THEN {1 << b} ELSE 0 END)" for b in range(SIMHASH_BITS)
    )
    simhash_sigs = (
        f"SELECT doc_id, CAST({sim_terms} AS BIGINT) AS simhash FROM "
        f"(SELECT doc_id, {bit_sums} FROM shingle_hashes GROUP BY doc_id)"
    )
    simhash_pairs = """
SELECT doc_a, doc_b, simhash_a, simhash_b, CAST(bit_count(xor(simhash_a, simhash_b)) AS INTEGER) AS hamming
FROM (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
    a.simhash AS simhash_a, b.simhash AS simhash_b
  FROM simbands a JOIN simbands b
    ON a.band_idx = b.band_idx AND a.band_val = b.band_val AND a.doc_id < b.doc_id
)
WHERE CAST(bit_count(xor(simhash_a, simhash_b)) AS INTEGER) <= 3
""".strip()
    # 4 × 8-bit bands: mirrors dedup.SIMHASH_BANDS (pigeonhole guarantee
    # for Hamming ≤ 3 on the 32-bit signature).
    simbands = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_idx, (simhash // {1 << (8 * b)}) % 256 AS band_val FROM simsigs"
        for b in range(4)
    )

    cluster_ctes = {
        "shingles": _SHINGLES,
        "shingle_hashes": _SHINGLE_HASHES,
        "sigs": sigs,
        "bands": bands,
        "pairs": minhash_pairs,
        "und": (
            "SELECT doc_a AS src, doc_b AS dst FROM pairs "
            "UNION SELECT doc_b AS src, doc_a AS dst FROM pairs"
        ),
        "reach(src, dst)": (
            "SELECT src, src AS dst FROM und UNION SELECT src, dst FROM und\n"
            "  UNION SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src"
        ),
    }
    clusters_cte = (
        "SELECT doc_id, cluster_id,"
        " CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size\n"
        "FROM (SELECT src AS doc_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)"
    )

    def _with_recursive(ctes: dict[str, str], body: str) -> str:
        parts = ",\n".join(f"{name} AS (\n{sql}\n)" for name, sql in ctes.items())
        return f"WITH RECURSIVE {parts}\n{body}"

    minhash_clusters = _with_recursive(
        {**cluster_ctes, "clusters": clusters_cte}, "SELECT * FROM clusters ORDER BY doc_id"
    )

    # -- hybrid (lexical ∪ semantic) clusters: the MinHash pair CTEs
    # renamed to tpairs, the embedding hyperplane-LSH near-dup CTEs
    # renamed esigs/epairs (both sides' names collide on sigs/pairs),
    # union → same recursive reach kernel.
    from dataengineeringpipeline_spark.operators.similarity import (
        EMB_DIM as _EDIM,
        LSH_PLANES as _EPLANES,
        _plane_coef,
    )

    eterms = []
    for p in range(_EPLANES):
        dot_p = (
            f"list_reduce(list_transform(range(0, {_EDIM}), "
            f"i -> e[i + 1] * {_plane_coef(p)}), (acc, x) -> acc + x)"
        )
        eterms.append(f"(CASE WHEN {dot_p} > 0 THEN {1 << p} ELSE 0 END)")
    esigs = f"SELECT vec_id, e, nrm, CAST({' + '.join(eterms)} AS BIGINT) AS bucket FROM n"
    epairs = f"""
SELECT vec_a, vec_b FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    list_reduce(list_transform(range(1, {_EDIM + 1}), i -> a.e[i] * b.e[i]), (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
  FROM esigs a JOIN esigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cosine >= 0.35
""".strip()
    hybrid_clusters = _with_recursive(
        {
            "shingles": _SHINGLES,
            "shingle_hashes": _SHINGLE_HASHES,
            "sigs": sigs,
            "bands": bands,
            "tpairs": minhash_pairs,
            "n": _EMB_NORMS,
            "esigs": esigs,
            "epairs": epairs,
            "pairs": (
                "SELECT doc_a, doc_b FROM tpairs "
                "UNION SELECT vec_a AS doc_a, vec_b AS doc_b FROM epairs"
            ),
            "und": cluster_ctes["und"],
            "reach(src, dst)": cluster_ctes["reach(src, dst)"],
            "clusters": clusters_cte,
        },
        "SELECT * FROM clusters ORDER BY doc_id",
    )
    dedup_survivors_sql = _with_recursive(
        {
            **cluster_ctes,
            "clusters": clusters_cte,
            "base": TEXT_STATS,
            "stats": _TEXT_STATS_DERIVED,
            "q": _QUALITY_BODY,
        },
        """
SELECT c.doc_id, c.cluster_id, c.cluster_size, q.quality_score,
  (ROW_NUMBER() OVER (PARTITION BY c.cluster_id ORDER BY q.quality_score DESC, c.doc_id ASC)) = 1 AS is_survivor
FROM clusters c JOIN q ON c.doc_id = q.doc_id
ORDER BY c.doc_id
""".strip(),
    )

    # -- end-to-end training-corpus funnel (operators/corpus.py) --------
    # scrub → dedup-survivor anti-join → quality+repetition gates →
    # chunk → pack, rolled into one funnel row. Reuses the recursive
    # cluster CTEs above and the chunk/pack CTE builder.
    from dataengineeringpipeline_spark.operators.text import (
        EMAIL_REGEX,
        PHONE_REGEX,
        URL_REGEX,
    )

    scrub_cte = (
        "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace(text, '"
        + EMAIL_REGEX + "', '[EMAIL]', 'g'), '"
        + URL_REGEX + "', '[URL]', 'g'), '"
        + PHONE_REGEX + "', '[PHONE]', 'g') AS text FROM documents "
        "WHERE doc_id IN (SELECT doc_id FROM gates)"
    )
    funnel_sql = _with_recursive(
        {
            **cluster_ctes,
            "clusters": clusters_cte,
            "base": TEXT_STATS,
            "stats": _TEXT_STATS_DERIVED,
            "q": _QUALITY_BODY,
            "surv": (
                "SELECT c.doc_id, ROW_NUMBER() OVER (PARTITION BY c.cluster_id "
                "ORDER BY q.quality_score DESC, c.doc_id ASC) AS rn "
                "FROM clusters c JOIN q ON c.doc_id = q.doc_id"
            ),
            "losers": "SELECT doc_id FROM surv WHERE rn > 1",
            "rep": _REPETITION_SQL,
            "gates": (
                "SELECT d.doc_id FROM documents d "
                "LEFT JOIN losers l ON d.doc_id = l.doc_id "
                "JOIN q ON d.doc_id = q.doc_id JOIN rep r ON d.doc_id = r.doc_id "
                "WHERE l.doc_id IS NULL AND q.quality_score >= 40 "
                "AND r.dup_ngram_ratio <= 0.2"
            ),
            "scrub": scrub_cte,
            **_pack_ctes("scrub"),
        },
        """
SELECT
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS docs_in,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM documents)
    - (SELECT CAST(COUNT(*) AS BIGINT) FROM losers) AS docs_after_dedup,
  (SELECT CAST(COUNT(*) AS BIGINT) FROM gates) AS docs_after_gates,
  CAST(COUNT(*) AS BIGINT) AS chunks,
  CAST(COUNT(DISTINCT (pack_group, seq_id)) AS BIGINT) AS sequences,
  CAST(SUM(sz) AS BIGINT) AS tokens
FROM pk_packed
""".strip(),
    )

    # -- corpus snapshot diff (operators/corpus.snapshot_diff_report) ---
    # same loser CTEs; per-doc quality/repetition scores computed once
    # and filtered by the two gate policies, then count-diffed.
    from dataengineeringpipeline_spark.operators.corpus import (
        SNAPSHOT_GATES_A,
        SNAPSHOT_GATES_B,
    )

    (_ga_q, _ga_r), (_gb_q, _gb_r) = SNAPSHOT_GATES_A, SNAPSHOT_GATES_B
    snapshot_diff_sql = _with_recursive(
        {
            **cluster_ctes,
            "clusters": clusters_cte,
            "base": TEXT_STATS,
            "stats": _TEXT_STATS_DERIVED,
            "q": _QUALITY_BODY,
            "surv": (
                "SELECT c.doc_id, ROW_NUMBER() OVER (PARTITION BY c.cluster_id "
                "ORDER BY q.quality_score DESC, c.doc_id ASC) AS rn "
                "FROM clusters c JOIN q ON c.doc_id = q.doc_id"
            ),
            "losers": "SELECT doc_id FROM surv WHERE rn > 1",
            "rep": _REPETITION_SQL,
            "scored": (
                "SELECT q.doc_id, q.quality_score, r.dup_ngram_ratio "
                "FROM q JOIN rep r ON q.doc_id = r.doc_id "
                "LEFT JOIN losers l ON q.doc_id = l.doc_id WHERE l.doc_id IS NULL"
            ),
            "ka": (
                f"SELECT doc_id FROM scored WHERE quality_score >= {_ga_q} "
                f"AND dup_ngram_ratio <= {_ga_r}"
            ),
            "kb": (
                f"SELECT doc_id FROM scored WHERE quality_score >= {_gb_q} "
                f"AND dup_ngram_ratio <= {_gb_r}"
            ),
            "cnt": (
                "SELECT (SELECT COUNT(*) FROM ka) AS docs_a,"
                " (SELECT COUNT(*) FROM kb) AS docs_b,"
                " (SELECT COUNT(*) FROM ka JOIN kb USING (doc_id)) AS kept_both"
            ),
        },
        """
SELECT CAST(docs_a AS BIGINT) AS docs_a, CAST(docs_b AS BIGINT) AS docs_b,
  CAST(kept_both AS BIGINT) AS kept_both,
  CAST(docs_b - kept_both AS BIGINT) AS added,
  CAST(docs_a - kept_both AS BIGINT) AS removed,
  CAST(CASE WHEN docs_b > 0 THEN ((docs_b - kept_both) * 1000) // docs_b ELSE 0 END AS BIGINT) AS churn_pm
FROM cnt
""".strip(),
    )

    from dataengineeringpipeline_spark.operators.sampling import (
        SPLIT_TRAIN_PM,
        SPLIT_VAL_PM,
    )

    split_summary_sql = _with_recursive(
        {
            **cluster_ctes,
            "clusters": clusters_cte,
            "assigned": (
                "SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS split_key "
                "FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id"
            ),
            "b": (
                "SELECT doc_id, split_key,"
                " ((split_key % 1000003) * 2654435761) % 1000 AS bucket FROM assigned"
            ),
        },
        f"""
SELECT split, docs, split_keys, CAST(docs AS DOUBLE) / SUM(docs) OVER () AS doc_share
FROM (
  SELECT CASE WHEN bucket < {SPLIT_TRAIN_PM} THEN 'train'
              WHEN bucket < {SPLIT_TRAIN_PM + SPLIT_VAL_PM} THEN 'val'
              ELSE 'test' END AS split,
    CAST(COUNT(*) AS BIGINT) AS docs,
    CAST(COUNT(DISTINCT split_key) AS BIGINT) AS split_keys
  FROM b GROUP BY 1
) ORDER BY split
""".strip(),
    )

    # -- split leakage audit: verified pairs × two split policies ----------
    def _split_case(key_expr: str) -> str:
        return (
            f"CASE WHEN ((({key_expr}) % 1000003) * 2654435761) % 1000 < {SPLIT_TRAIN_PM}"
            f" THEN 'train' WHEN ((({key_expr}) % 1000003) * 2654435761) % 1000 <"
            f" {SPLIT_TRAIN_PM + SPLIT_VAL_PM} THEN 'val' ELSE 'test' END"
        )

    split_leakage_sql = _with_recursive(
        {
            **cluster_ctes,
            "clusters": clusters_cte,
            "sp": (
                "SELECT p.doc_a, p.doc_b,\n"
                f"  {_split_case('p.doc_a')} AS na, {_split_case('p.doc_b')} AS nb,\n"
                f"  {_split_case('COALESCE(ca.cluster_id, p.doc_a)')} AS sa,\n"
                f"  {_split_case('COALESCE(cb.cluster_id, p.doc_b)')} AS sb\n"
                "FROM pairs p LEFT JOIN clusters ca ON ca.doc_id = p.doc_a\n"
                "             LEFT JOIN clusters cb ON cb.doc_id = p.doc_b"
            ),
        },
        """
SELECT policy, dup_pairs, cross_split_pairs, train_eval_pairs,
  CAST((cross_split_pairs * 1000) // dup_pairs AS BIGINT) AS leak_pm
FROM (
  SELECT 'cluster_keyed' AS policy, CAST(COUNT(*) AS BIGINT) AS dup_pairs,
    CAST(SUM(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT) AS cross_split_pairs,
    CAST(SUM(CASE WHEN (sa = 'train' AND sb <> 'train')
                    OR (sb = 'train' AND sa <> 'train') THEN 1 ELSE 0 END) AS BIGINT) AS train_eval_pairs
  FROM sp
  UNION ALL
  SELECT 'naive' AS policy, CAST(COUNT(*) AS BIGINT) AS dup_pairs,
    CAST(SUM(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT) AS cross_split_pairs,
    CAST(SUM(CASE WHEN (na = 'train' AND nb <> 'train')
                    OR (nb = 'train' AND na <> 'train') THEN 1 ELSE 0 END) AS BIGINT) AS train_eval_pairs
  FROM sp
) ORDER BY policy
""".strip(),
    )

    # -- contrastive pair mining: verified dup positives vs stride negs --
    from dataengineeringpipeline_spark.operators.similarity import (
        COS_SCALE as _CSCALE,
        EMB_DIM as _CDIM,
        NEG_STRIDE as _CSTRIDE,
    )

    contrastive_sql = _with(
        {
            "shingles": _SHINGLES,
            "shingle_hashes": _SHINGLE_HASHES,
            "sigs": sigs,
            "bands": bands,
            "pairs": minhash_pairs,
            "n": _EMB_NORMS,
            "neg": (
                f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b\n"
                f"FROM documents a JOIN documents b ON b.doc_id = a.doc_id + {_CSTRIDE}\n"
                "WHERE NOT EXISTS (SELECT 1 FROM pairs p"
                " WHERE p.doc_a = a.doc_id AND p.doc_b = b.doc_id)"
            ),
            "tagged": (
                "SELECT doc_a, doc_b, 'positive' AS pair_set FROM pairs\n"
                "UNION ALL SELECT doc_a, doc_b, 'negative' AS pair_set FROM neg"
            ),
            "cscored": (
                "SELECT pair_set, cosine,"
                f" CAST(floor(cosine * {_CSCALE}) AS BIGINT) AS ic FROM (\n"
                "  SELECT t.pair_set,\n"
                f"    list_reduce(list_transform(range(1, {_CDIM + 1}),"
                " i -> na.e[i] * nb.e[i]), (a, b) -> a + b) / (na.nrm * nb.nrm) AS cosine\n"
                "  FROM tagged t JOIN n na ON na.vec_id = t.doc_a"
                " JOIN n nb ON nb.vec_id = t.doc_b)"
            ),
        },
        f"""
SELECT pair_set, CAST(COUNT(*) AS BIGINT) AS pairs,
  {dec2dbl('SUM(ic)')} / CAST(COUNT(*) AS DOUBLE) / {float(_CSCALE)} AS mean_cos,
  MIN(cosine) AS min_cos, MAX(cosine) AS max_cos
FROM cscored GROUP BY pair_set ORDER BY pair_set
""".strip(),
    )

    return {
        "split_leakage_audit": split_leakage_sql,
        "contrastive_pairs_report": contrastive_sql,
        "exact_dedup": EXACT_DEDUP_SQL,
        "duplicate_span_coverage": _dup_span_sql(SPAN_WINDOW, SPAN_STRIDE),
        "shared_span_pairs": _span_pair_sql(SPAN_WINDOW, SPAN_STRIDE, SPAN_PAIR_MAX_DF, 2),
        "span_dedup_cleaned": _span_removal_sql(SPAN_WINDOW, SPAN_STRIDE),
        "split_summary": split_summary_sql,
        "snapshot_diff_report": snapshot_diff_sql,
        "minhash_dup_clusters": minhash_clusters,
        "hybrid_dup_clusters": hybrid_clusters,
        "dedup_survivors": dedup_survivors_sql,
        "training_corpus_funnel": funnel_sql,
        "ngram_jaccard_pairs": _with(
            {"shingles": _SHINGLES},
            "SELECT * FROM ("
            f"{_jaccard_sql('shingles', 'shingle', max_df=DEDUP_MAX_DF)}"
            ") WHERE jaccard >= 0.4",
        ),
        "minhash_lsh_pairs": _with(
            {"shingles": _SHINGLES, "shingle_hashes": _SHINGLE_HASHES, "sigs": sigs, "bands": bands},
            minhash_pairs,
        ),
        "streaming_incremental_dedup": _with(
            {
                "shingles": _SHINGLES,
                "shingle_hashes": _SHINGLE_HASHES,
                "sigs": sigs,
                "bands": bands,
                # arriving docs are doc_id % 5 = 0 in arrival batch
                # (doc_id // 5) % 3; candidate state for a doc = the
                # seeded corpus plus strictly-earlier arrival batches
                "cand": (
                    "SELECT DISTINCT n.doc_id, o.doc_id AS dup_of\n"
                    "FROM bands n JOIN bands o\n"
                    "  ON n.band_idx = o.band_idx AND n.band_hash = o.band_hash\n"
                    "WHERE n.doc_id % 5 = 0 AND (o.doc_id % 5 <> 0\n"
                    "  OR (o.doc_id // 5) % 3 < (n.doc_id // 5) % 3)"
                ),
                "sz": "SELECT doc_id, COUNT(*) AS sz FROM shingle_hashes GROUP BY doc_id",
                "ver": (
                    "SELECT c.doc_id, c.dup_of, COUNT(*) AS shared\n"
                    "FROM cand c\n"
                    "JOIN shingle_hashes a ON a.doc_id = c.doc_id\n"
                    "JOIN shingle_hashes b ON b.doc_id = c.dup_of AND b.h = a.h\n"
                    "GROUP BY c.doc_id, c.dup_of"
                ),
                "jac": (
                    "SELECT doc_id, dup_of, jaccard FROM (\n"
                    "  SELECT v.doc_id, v.dup_of,\n"
                    "    CAST(v.shared AS DOUBLE) / (sa.sz + sb.sz - v.shared) AS jaccard\n"
                    "  FROM ver v JOIN sz sa ON sa.doc_id = v.doc_id\n"
                    "  JOIN sz sb ON sb.doc_id = v.dup_of\n"
                    ") WHERE jaccard >= 0.5"
                ),
                "best": (
                    "SELECT doc_id, dup_of, jaccard FROM (\n"
                    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id\n"
                    "    ORDER BY jaccard DESC, dup_of ASC) AS rn FROM jac\n"
                    ") WHERE rn = 1"
                ),
            },
            """
SELECT d.doc_id, b.dup_of, b.jaccard, b.dup_of IS NOT NULL AS is_duplicate
FROM (SELECT doc_id FROM documents WHERE doc_id % 5 = 0) d
LEFT JOIN best b USING (doc_id) ORDER BY d.doc_id
""".strip(),
        ),
        "source_overlap_matrix": _with(
            {
                "shingles": _SHINGLES,
                "shingle_hashes": _SHINGLE_HASHES,
                "sigs": sigs,
                "bands": bands,
                "pairs": minhash_pairs,
            },
            """
SELECT least(sa.source, sb.source) AS source_a,
  greatest(sa.source, sb.source) AS source_b,
  CAST(COUNT(*) AS BIGINT) AS dup_pairs,
  MIN(p.jaccard) AS min_jaccard,
  MAX(p.jaccard) AS max_jaccard
FROM pairs p
JOIN documents sa ON p.doc_a = sa.doc_id
JOIN documents sb ON p.doc_b = sb.doc_id
GROUP BY 1, 2 ORDER BY 1, 2
""".strip(),
        ),
        "minhash_recall": _with(
            {
                "shingles": _SHINGLES,
                "shingle_hashes": _SHINGLE_HASHES,
                "sigs": sigs,
                "bands": bands,
                "exact": (
                    f"SELECT doc_a, doc_b FROM ({_jaccard_sql('shingle_hashes', 'h')}) "
                    "WHERE jaccard >= 0.5"
                ),
                "lshp": f"SELECT doc_a, doc_b FROM ({minhash_pairs})",
            },
            """
SELECT
  (SELECT COUNT(*) FROM exact) AS exact_pairs,
  (SELECT COUNT(*) FROM lshp) AS lsh_pairs,
  (SELECT COUNT(*) FROM exact e JOIN lshp l USING (doc_a, doc_b)) AS hit_pairs,
  CASE WHEN (SELECT COUNT(*) FROM exact) > 0 THEN
    (SELECT COUNT(*) FROM exact e JOIN lshp l USING (doc_a, doc_b))
      / (SELECT COUNT(*) FROM exact)
  END AS recall
""".strip(),
        ),
        "simhash_dup_candidates": _with(
            {
                "shingles": _SHINGLES,
                "shingle_hashes": _SHINGLE_HASHES,
                "simsigs": simhash_sigs,
                "simbands": simbands,
            },
            simhash_pairs,
        ),
    }


_SUPPLIER_BODY = f"""
SELECT supplier_key, supplier_name, nation_name, account_balance, line_count,
  total_quantity, supplier_revenue, returned_lines,
  CASE WHEN line_count > 0 THEN CAST(returned_lines AS DOUBLE) / line_count * 100.0
       ELSE 0.0 END AS return_rate_pct,
  CAST(ROW_NUMBER() OVER (PARTITION BY nation_name
       ORDER BY supplier_revenue DESC, supplier_key ASC) AS INTEGER) AS nation_revenue_rank
FROM (
  SELECT s.s_suppkey AS supplier_key, s.s_name AS supplier_name, n.n_name AS nation_name,
    CAST(s.s_acctbal AS DOUBLE) AS account_balance,
    COALESCE(p.line_count, 0) AS line_count,
    COALESCE(p.total_quantity, 0.0) AS total_quantity,
    COALESCE(p.supplier_revenue, 0.0) AS supplier_revenue,
    COALESCE(p.returned_lines, 0) AS returned_lines
  FROM supplier s
  LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
  LEFT JOIN (
    SELECT supplier_key, COUNT(*) AS line_count, SUM(quantity) AS total_quantity,
      {money_sum_sql('net_revenue', 4)} AS supplier_revenue,
      {sum_long_sql("CASE WHEN return_flag = 'R' THEN 1 ELSE 0 END")} AS returned_lines
    FROM silver_lineitems GROUP BY supplier_key
  ) p ON p.supplier_key = s.s_suppkey
)
ORDER BY nation_name, nation_revenue_rank
""".strip()


# ---------------------------------------------------------------------------
# Embedding similarity (twins of operators/similarity.py)
# ---------------------------------------------------------------------------

_EMB_NORMS = """
SELECT vec_id, label, e, sqrt(list_reduce(list_transform(e, x -> x*x), (a, b) -> a + b)) AS nrm
FROM (SELECT vec_id, label, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e FROM embeddings)
""".strip()

_ANN_BODY = """
SELECT query_id, neighbor_id, label, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM (
    SELECT q.query_id, n.vec_id AS neighbor_id, n.label,
      list_reduce(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]), (a, b) -> a + b) / (q.qn * n.nrm) AS cosine
    FROM (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n WHERE vec_id % 100 = 0) q
    JOIN n ON n.vec_id <> q.query_id
  )
) WHERE rank <= 5
""".strip()


#: Twin of similarity.semantic_decontamination (benchmark = vec_id%100=0,
#: threshold = the module's 0.35 near-dup cosine bar; ties keep lowest bid).
_SEM_DECON_BODY = """
SELECT vec_id, label, bid AS best_match_id, cosine AS best_cosine, cosine >= 0.35 AS is_contaminated
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY cosine DESC, bid ASC) AS rn FROM (
    SELECT c.vec_id, c.label, q.bid,
      list_reduce(list_transform(range(1, 65), i -> c.e[i] * q.be[i]), (a, b) -> a + b) / (c.nrm * q.bn) AS cosine
    FROM (SELECT vec_id, label, e, nrm FROM n WHERE vec_id % 100 <> 0) c
    CROSS JOIN (SELECT vec_id AS bid, e AS be, nrm AS bn FROM n WHERE vec_id % 100 = 0) q
  )
) WHERE rn = 1 ORDER BY vec_id
""".strip()


_IVF_CELLS = """
cent AS (
  SELECT vec_id AS centroid_id, e AS ce, nrm AS cn FROM n WHERE vec_id % {cmod} = 7
),
assign AS (
  SELECT vec_id, label, e, nrm, centroid_id FROM (
    SELECT n.vec_id, n.label, n.e, n.nrm, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY n.vec_id ORDER BY
        list_reduce(list_transform(range(1, 65), i -> n.e[i] * c.ce[i]), (a, b) -> a + b) / (n.nrm * c.cn) DESC,
        c.centroid_id ASC) AS rn
    FROM n CROSS JOIN cent c
  ) WHERE rn = 1
),
q AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n WHERE vec_id % 100 = 0),
probes AS (
  SELECT query_id, qe, qn, centroid_id FROM (
    SELECT q.query_id, q.qe, q.qn, c.centroid_id,
      ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
        list_reduce(list_transform(range(1, 65), i -> q.qe[i] * c.ce[i]), (a, b) -> a + b) / (q.qn * c.cn) DESC,
        c.centroid_id ASC) AS pr
    FROM q CROSS JOIN cent c
  ) WHERE pr <= {nprobe}
)
""".strip()

_IVF_BODY = """
SELECT query_id, neighbor_id, label, cosine, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM (
    SELECT p.query_id, a.vec_id AS neighbor_id, a.label,
      list_reduce(list_transform(range(1, 65), i -> p.qe[i] * a.e[i]), (x, y) -> x + y) / (p.qn * a.nrm) AS cosine
    FROM probes p JOIN assign a ON a.centroid_id = p.centroid_id AND a.vec_id <> p.query_id
  )
) WHERE rank <= 5
""".strip()


def _sim_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.operators.similarity import (
        EMB_DIM,
        IVF_CENTROID_MOD,
        IVF_NPROBE,
        LSH_PLANES,
        _plane_coef,
    )

    terms = []
    for p in range(LSH_PLANES):
        dot_p = (
            f"list_reduce(list_transform(range(0, {EMB_DIM}), "
            f"i -> e[i + 1] * {_plane_coef(p)}), (acc, x) -> acc + x)"
        )
        terms.append(f"(CASE WHEN {dot_p} > 0 THEN {1 << p} ELSE 0 END)")
    sigs = f"SELECT vec_id, e, nrm, CAST({' + '.join(terms)} AS BIGINT) AS bucket FROM n"
    near_dups = """
SELECT vec_a, vec_b, cosine FROM (
  SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
    list_reduce(list_transform(range(1, 65), i -> a.e[i] * b.e[i]), (x, y) -> x + y) / (a.nrm * b.nrm) AS cosine
  FROM sigs a JOIN sigs b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
) WHERE cosine >= 0.35
""".strip()
    ivf_cells = _IVF_CELLS.format(cmod=IVF_CENTROID_MOD, nprobe=IVF_NPROBE)
    ivf_topk = f"WITH n AS ({_EMB_NORMS}),\n{ivf_cells}\n{_IVF_BODY}"
    ivf_recall = (
        f"WITH n AS ({_EMB_NORMS}),\n{ivf_cells},\n"
        f"exact_tk AS (SELECT query_id, neighbor_id FROM ({_ANN_BODY})),\n"
        f"ivf_tk AS (SELECT query_id, neighbor_id FROM ({_IVF_BODY}))\n"
        "SELECT CAST(5 AS INTEGER) AS k,\n"
        "  (SELECT count(*) FROM exact_tk) AS exact_pairs,\n"
        "  (SELECT count(*) FROM exact_tk e JOIN ivf_tk i USING (query_id, neighbor_id)) AS hit_pairs,\n"
        "  (SELECT count(*) FROM exact_tk e JOIN ivf_tk i USING (query_id, neighbor_id))\n"
        "    / (SELECT count(*) FROM exact_tk) AS recall_at_k"
    )
    semantic_clusters = (
        f"WITH RECURSIVE n AS ({_EMB_NORMS}),\n"
        f"sigs AS ({sigs}),\n"
        f"pairs AS ({near_dups}),\n"
        "und AS (SELECT vec_a AS src, vec_b AS dst FROM pairs"
        " UNION SELECT vec_b AS src, vec_a AS dst FROM pairs),\n"
        "reach(src, dst) AS (\n"
        "  SELECT src, src AS dst FROM und UNION SELECT src, dst FROM und\n"
        "  UNION SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src\n"
        ")\n"
        "SELECT vec_id, cluster_id,\n"
        "  CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,\n"
        "  vec_id = cluster_id AS is_canonical\n"
        "FROM (SELECT src AS vec_id, MIN(dst) AS cluster_id FROM reach GROUP BY src)\n"
        "ORDER BY vec_id"
    )
    # The Arrow/numpy kernel's contract is exact top-k MEMBERSHIP parity
    # with the fold kernel (cosine floats differ in the last ulp, ids do
    # not). The Spark gauge scores a distinct approx pair as a hit when
    # its cosine reaches the query's k-th exact cosine within a 1e-9
    # margin (so a genuine tie flip under SIMD order still scores 1.0).
    # The oracle DERIVES the hit count by applying the same margin rule
    # to the exact top-k table — every correct kernel returns k distinct
    # pairs per query from the margin-eligible set, so hit == the count
    # of exact pairs passing their own query's margin test (== exact,
    # but computed from data, not asserted). A kernel that loses a
    # neighbor (replacement cosine < kth - 1e-9), duplicates one, or
    # returns short drops Spark's hit_pairs below that and the hash
    # mismatches. Tie-free margin measured: min rank-5/6 cosine gap
    # ≥ 3e-4 at sf0.001/0.01/0.1 — ~12 orders above double rounding.
    arrow_recall = (
        f"WITH n AS ({_EMB_NORMS}),\n"
        f"exact_tk AS (SELECT query_id, neighbor_id, cosine FROM ({_ANN_BODY})),\n"
        "kth AS (SELECT query_id, MIN(cosine) AS kth_cosine FROM exact_tk GROUP BY query_id),\n"
        "hits AS (SELECT e.query_id, e.neighbor_id FROM exact_tk e"
        " JOIN kth USING (query_id) WHERE e.cosine >= kth_cosine - 1e-9)\n"
        "SELECT CAST(5 AS INTEGER) AS k,\n"
        "  (SELECT count(*) FROM exact_tk) AS exact_pairs,\n"
        "  (SELECT count(*) FROM hits) AS hit_pairs,\n"
        "  (SELECT count(*) FROM hits) / (SELECT count(*) FROM exact_tk) AS recall_at_k"
    )
    return {
        "ann_bruteforce_topk": _with({"n": _EMB_NORMS}, _ANN_BODY),
        "knn_label_eval": _with(
            {
                "n": _EMB_NORMS,
                "q": (
                    "SELECT vec_id AS query_id, label AS true_label, e AS qe, nrm AS qn "
                    "FROM n WHERE vec_id % 100 = 0"
                ),
                "topk": (
                    "SELECT * FROM (\n"
                    "  SELECT q.query_id, q.true_label, n.label,\n"
                    "    ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY\n"
                    "      list_reduce(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]), (a, b) -> a + b) / (q.qn * n.nrm) DESC,\n"
                    "      n.vec_id ASC) AS rnk\n"
                    "  FROM q JOIN n ON n.vec_id % 100 <> 0\n"
                    ") WHERE rnk <= 5"
                ),
                "votes": (
                    "SELECT query_id, true_label, label, COUNT(*) AS votes, MIN(rnk) AS best_rank "
                    "FROM topk GROUP BY query_id, true_label, label"
                ),
                "pred": (
                    "SELECT query_id, true_label, label AS predicted_label FROM (\n"
                    "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id\n"
                    "    ORDER BY votes DESC, best_rank ASC, label ASC) AS rn FROM votes\n"
                    ") WHERE rn = 1"
                ),
            },
            """
SELECT true_label AS label,
  CAST(COUNT(*) AS BIGINT) AS n_queries,
  CAST(SUM(CASE WHEN predicted_label = true_label THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
  CAST(SUM(CASE WHEN predicted_label = true_label THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS accuracy
FROM pred GROUP BY true_label ORDER BY label
""".strip(),
        ),
        "semantic_decontamination": _with({"n": _EMB_NORMS}, _SEM_DECON_BODY),
        "ann_ivf_topk": ivf_topk,
        "ann_ivf_recall": ivf_recall,
        "ann_arrow_recall": arrow_recall,
        "embedding_near_dups": _with({"n": _EMB_NORMS, "sigs": sigs}, near_dups),
        "semantic_dup_clusters": semantic_clusters,
    }


def _dq_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.quality import ORDERS_RULES

    orders_cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority"]
    return {
        "dq_rule_report": rule_report_sql(SILVER_ORDERS, ORDERS_RULES),
        "dq_null_profile": null_profile_sql("orders", orders_cols),
        "dq_duplicates": DUPLICATES_SQL,
        "dq_range_violations": RANGE_VIOLATIONS_SQL,
        "dq_freshness": FRESHNESS_SQL,
        "dq_outliers": OUTLIERS_SQL,
    }


ORACLES: dict[str, str] = {
    "silver_orders": SILVER_ORDERS,
    "silver_customers": SILVER_CUSTOMERS,
    "silver_parts": SILVER_PARTS,
    "silver_lineitems": SILVER_LINEITEMS,
    "daily_sales_summary": _with({"silver_orders": SILVER_ORDERS}, _DAILY_BODY),
    "daily_metrics_long": _with(
        {"silver_orders": SILVER_ORDERS, "daily": _DAILY_BODY}, _DAILY_LONG_BODY
    ),
    "monthly_sales_summary": _with({"silver_orders": SILVER_ORDERS}, _MONTHLY_BODY),
    "sales_rollup": _with({"silver_orders": SILVER_ORDERS}, _ROLLUP_BODY),
    "status_priority_cube": _with({"silver_orders": SILVER_ORDERS}, _CUBE_BODY),
    "customer_value_deciles": _with({"silver_orders": SILVER_ORDERS}, _DECILE_BODY),
    "salted_status_summary": _with(
        {"silver_orders": SILVER_ORDERS},
        f"""
SELECT order_status, COUNT(*) AS order_count, {money_sum_sql('total_price')} AS revenue,
  MIN(total_price) AS min_price, MAX(total_price) AS max_price
FROM silver_orders GROUP BY order_status ORDER BY order_status
""".strip(),
    ),
    "priority_performance": _with({"silver_orders": SILVER_ORDERS}, _PRIORITY_BODY),
    "comprehensive_sales_summary": _with({"silver_orders": SILVER_ORDERS}, _COMPREHENSIVE_BODY),
    "customer_lifetime_metrics": _with({"silver_orders": SILVER_ORDERS}, _LIFETIME_METRICS_BODY),
    "customer_analytics": _with(
        {
            "silver_orders": SILVER_ORDERS,
            "silver_customers": SILVER_CUSTOMERS,
            "lifetime_metrics": _LIFETIME_METRICS_BODY,
            "rfm": _RFM_SQL,
            "sizes": _SIZES_SQL,
        },
        _ANALYTICS_BODY,
    ),
    "top_customers_per_segment": _with(
        {"silver_orders": SILVER_ORDERS, "lifetime_metrics": _LIFETIME_METRICS_BODY},
        _TOP_PER_SEGMENT_BODY,
    ),
    "segment_summary": _with(
        {"silver_orders": SILVER_ORDERS, "lifetime_metrics": _LIFETIME_METRICS_BODY},
        _SEGMENT_BODY,
    ),
    "supplier_performance": _with({"silver_lineitems": SILVER_LINEITEMS}, _SUPPLIER_BODY),
    "category_performance": _with(
        {"silver_lineitems": SILVER_LINEITEMS, "silver_parts": SILVER_PARTS},
        _CATEGORY_BODY,
    ),
}
# ---------------------------------------------------------------------------
# Referential integrity + quarantine selection (twins of quality.py)
# ---------------------------------------------------------------------------

_REF_INTEGRITY_SQL = """
WITH checks AS (
  SELECT 'orders_customer_fk' AS check_name,
    (SELECT COUNT(*) FROM orders) AS checked_rows,
    (SELECT COUNT(*) FROM orders o WHERE NOT EXISTS
      (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS invalid_rows
  UNION ALL
  SELECT 'lineitem_order_fk',
    (SELECT COUNT(*) FROM lineitem),
    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
  UNION ALL
  SELECT 'lineitem_part_fk',
    (SELECT COUNT(*) FROM lineitem),
    (SELECT COUNT(*) FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM part p WHERE p.p_partkey = l.l_partkey))
)
SELECT check_name, checked_rows, invalid_rows, invalid_rows = 0 AS passed
FROM checks ORDER BY check_name
""".strip()

_QUARANTINE_BODY = """
SELECT order_key, order_status, total_price, order_date
FROM silver_orders
WHERE NOT (COALESCE(total_price < 400000, FALSE))
   OR NOT (COALESCE(order_status IN ('O','F'), FALSE))
ORDER BY order_key
""".strip()


# ---------------------------------------------------------------------------
# Config-driven rule compilers (twins of rules.py demo configs)
# ---------------------------------------------------------------------------

_RULE_AGG_BODY = f"""
SELECT order_year, order_month, order_status,
  {money_sum_sql('total_price')} AS revenue,
  {money_avg_sql('total_price')} AS avg_order_value,
  {det_stddev_sql('total_price')} AS order_value_stddev,
  COUNT(order_key) AS order_count,
  COUNT(DISTINCT customer_key) AS unique_customers,
  MAX(total_price) AS max_order_value
FROM silver_orders
WHERE is_complete_order AND order_status <> 'P'
GROUP BY order_year, order_month, order_status
ORDER BY order_year, order_month, order_status
""".strip()

_RULE_FEATURES_BODY = """
SELECT customer_key, total_orders, lifetime_value, recency_days,
  1.0 / (1.0 + recency_days / 30.0) AS engagement_score,
  ROUND(ln(1 + total_orders), 6) AS log_total_orders,
  lifetime_value / total_orders AS value_per_order,
  recency_days < 1000 AND total_orders >= 10 AS is_recent_and_active
FROM lm
ORDER BY customer_key
""".strip()


# ---------------------------------------------------------------------------
# Incremental ingestion + feature store (twins of ingest.py / featurestore.py)
# ---------------------------------------------------------------------------

def _demo_watermark_us() -> int:
    # imported from the engine so oracle and query can never disagree
    from dataengineeringpipeline_spark.ingest import DEMO_WATERMARK_US

    return DEMO_WATERMARK_US


_DEMO_WATERMARK_US = _demo_watermark_us()

_INCREMENTAL_BODY = f"""
SELECT event_id, user_id, event_type, ts_us, event_date,
  CAST(value AS DOUBLE) AS value,
  'testdata' AS source_system,
  CAST({_DEMO_WATERMARK_US} AS BIGINT) AS watermark_us
FROM ev
WHERE ts_us > {_DEMO_WATERMARK_US}
ORDER BY event_id
""".strip()


def _daily_features_body() -> str:
    return f"""
SELECT user_id, event_date,
  COUNT(*) AS daily_events,
  COUNT(DISTINCT event_type) AS distinct_event_types,
  {money_sum_sql('value')} AS daily_value,
  {money_avg_sql('value')} AS avg_event_value,
  MAX(ts_us) AS last_event_us,
  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase_events
FROM ev
GROUP BY user_id, event_date
""".strip()


_FS_LATEST_BODY = """
SELECT user_id, event_date, daily_events, distinct_event_types, daily_value,
       avg_event_value, last_event_us, purchase_events
FROM daily
QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY event_date DESC) = 1
ORDER BY user_id
""".strip()


def _pit_features_sql(tolerance_days: int = 7) -> str:
    """Twin of featurestore.point_in_time_features: day-D features become
    servable at (D+1)·86400s; each purchase label takes the newest
    servable feature row within the tolerance window, else nulls."""
    tol = tolerance_days * 86_400_000_000
    return _with(
        {
            "ev": EVENTS_BASE,
            "daily": _daily_features_body(),
            "f": (
                "SELECT user_id,"
                " (CAST(datediff('day', DATE '1970-01-01', event_date) AS BIGINT) + 1)"
                " * 86400000000 AS feature_ts_us,"
                " daily_events, daily_value, purchase_events FROM daily"
            ),
            "p": (
                "SELECT event_id, user_id, ts_us, value AS label_value"
                " FROM ev WHERE event_type = 'purchase'"
            ),
        },
        f"""
SELECT event_id, user_id, ts_us, label_value, daily_events, daily_value,
  purchase_events, feature_ts_us, ts_us - feature_ts_us AS feature_age_us
FROM (
  SELECT p.event_id, p.user_id, p.ts_us, p.label_value,
    f.daily_events, f.daily_value, f.purchase_events, f.feature_ts_us,
    ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY f.feature_ts_us DESC) AS rn
  FROM p JOIN f ON f.user_id = p.user_id
    AND f.feature_ts_us <= p.ts_us AND f.feature_ts_us >= p.ts_us - {tol}
) WHERE rn = 1
UNION ALL
SELECT p.event_id, p.user_id, p.ts_us, p.label_value,
  NULL, NULL, NULL, NULL, NULL
FROM p WHERE NOT EXISTS (
  SELECT 1 FROM f WHERE f.user_id = p.user_id
    AND f.feature_ts_us <= p.ts_us AND f.feature_ts_us >= p.ts_us - {tol}
)
ORDER BY event_id
""".strip(),
    )


def _ingest_oracles() -> dict[str, str]:
    return {
        "incremental_events": _with({"ev": EVENTS_BASE}, _INCREMENTAL_BODY),
        "feature_store_latest": _with(
            {"ev": EVENTS_BASE, "daily": _daily_features_body()}, _FS_LATEST_BODY
        ),
        "point_in_time_features": _pit_features_sql(),
        "dq_referential_integrity": _REF_INTEGRITY_SQL,
        "dq_quarantine_rows": _with({"silver_orders": SILVER_ORDERS}, _QUARANTINE_BODY),
        "rule_driven_aggregation": _with({"silver_orders": SILVER_ORDERS}, _RULE_AGG_BODY),
        "rule_driven_features": _with(
            {
                "silver_orders": SILVER_ORDERS,
                "lm": "SELECT customer_key, total_orders, lifetime_value, recency_days "
                "FROM (" + _LIFETIME_METRICS_BODY + ")",
            },
            _RULE_FEATURES_BODY,
        ),
    }


# ---------------------------------------------------------------------------
# Streaming twins (batch-equivalent SQL: tumbling windows are epoch-µs
# floors; stateful sessionization is the lag+running-sum pattern)
# ---------------------------------------------------------------------------

_STREAM_HOURLY_BODY = f"""
SELECT (ts_us // 3600000000) * 3600000000 AS window_start_us,
  COUNT(*) AS event_count,
  {money_sum_sql('value')} AS total_value,
  CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error_count
FROM ev
GROUP BY 1
ORDER BY 1
""".strip()

_STREAM_SESSIONS_BODY = """
SELECT user_id, CAST(SUM(is_start) AS BIGINT) AS sessions, COUNT(*) AS events_seen
FROM (
  SELECT user_id,
    CASE WHEN lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) IS NULL
           OR ts_us - lag(ts_us) OVER (PARTITION BY user_id ORDER BY ts_us, event_id) > 1800000000
         THEN 1 ELSE 0 END AS is_start
  FROM ev
)
GROUP BY user_id
ORDER BY user_id
""".strip()


# ---------------------------------------------------------------------------
# Multimodal (twin of operators/multimodal.py — byte-level features over
# the utf-8 payload, reproduced from hex expansion)
# ---------------------------------------------------------------------------

_FRAME_PLAN_SQL = """
WITH m AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'image'
         WHEN doc_id % 3 = 1 THEN 'audio'
         ELSE 'video' END AS modality,
    CAST(ceil(octet_length(encode(text)) / 4096.0) AS INTEGER) AS n_chunks
  FROM documents
)
SELECT doc_id, modality, CAST(unnest(range(0, greatest(n_chunks - 1, 0) + 1, 4)) AS INTEGER) AS chunk_idx
FROM m
ORDER BY doc_id, chunk_idx
""".strip()

_MULTIMODAL_SQL = """
WITH m AS (
  SELECT doc_id,
    CASE WHEN doc_id % 3 = 0 THEN 'image'
         WHEN doc_id % 3 = 1 THEN 'audio'
         ELSE 'video' END AS modality,
    encode(text) AS p,
    text AS s
  FROM documents
)
SELECT doc_id, modality,
  CAST(octet_length(p) AS BIGINT) AS byte_size,
  sha256(s) AS sha256,
  CASE WHEN octet_length(p) > 0 THEN
    list_avg(list_transform(range(octet_length(p)),
      i -> CAST(('0x' || substr(hex(p), 2*CAST(i AS INT)+1, 2)) AS INTEGER)))
  END AS mean_byte,
  CAST(ceil(octet_length(p) / 4096.0) AS INTEGER) AS n_chunks
FROM m
ORDER BY doc_id
""".strip()

# Twin of multimodal.multimodal_decode_report: the Spark side round-trips
# real BMP/WAV container bytes through decode_media; this side predicts
# every decoded feature from the closed-form pixel/sample construction in
# synthesize_media (doc_id arithmetic) — an independent check that the
# encode→decode round trip preserved dimensions and values exactly.
_MM_DECODE_SQL = """
WITH s AS (SELECT doc_id AS d FROM documents WHERE doc_id % 5 = 0),
img AS (
  SELECT d AS doc_id, 'image' AS modality,
    8 AS width, CAST(4 + d % 4 AS INTEGER) AS height,
    CAST(NULL AS INTEGER) AS sample_rate, CAST(NULL AS BIGINT) AS n_samples,
    CAST(NULL AS DOUBLE) AS duration_s,
    CAST(list_aggregate(list_transform(range(0, (4 + d % 4) * 24),
      i -> (d * 31 + i) % 256), 'sum') AS DOUBLE) / ((4 + d % 4) * 24) AS mean_value
  FROM s WHERE d % 2 = 0 AND d % 8 <> 2
),
jpg AS (
  -- baseline-JPEG docs are FLAT gray quantizer fixed points: the lossy
  -- Huffman+DCT round trip returns the even value 2*((d*17) % 128)
  -- exactly (DC divisible by the Annex-K quantum, AC all zero)
  SELECT d AS doc_id, 'image' AS modality,
    8 AS width, CAST(6 AS INTEGER) AS height,
    CAST(NULL AS INTEGER) AS sample_rate, CAST(NULL AS BIGINT) AS n_samples,
    CAST(NULL AS DOUBLE) AS duration_s,
    CAST(2 * ((d * 17) % 128) AS DOUBLE) AS mean_value
  FROM s WHERE d % 8 = 2
),
aud AS (
  -- samples are mu-law codebook fixed points: expand(code) with
  -- code = (d*7 + i*13) % 256, u = ~code & 0xFF, seg/mantissa per
  -- G.711 — exact integer arithmetic, container-independent (PCM and
  -- mu-law WAV carry the same values)
  SELECT d AS doc_id, 'audio' AS modality,
    CAST(NULL AS INTEGER) AS width, CAST(NULL AS INTEGER) AS height,
    8000 AS sample_rate, CAST(64 + d % 32 AS BIGINT) AS n_samples,
    CAST(64 + d % 32 AS DOUBLE) / 8000 AS duration_s,
    CAST(list_aggregate(list_transform(
      list_transform(range(0, 64 + d % 32), i -> 255 - (d * 7 + i * 13) % 256),
      u -> CASE WHEN u >= 128
        THEN -((((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132)
        ELSE (((u % 16) * 8 + 132) * (1 << ((u // 16) % 8))) - 132 END
    ), 'sum') AS DOUBLE) / (64 + d % 32) AS mean_value
  FROM s WHERE d % 2 = 1
)
SELECT * FROM img UNION ALL SELECT * FROM jpg UNION ALL SELECT * FROM aud
ORDER BY doc_id
""".strip()


def _sampling_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.operators.sampling import EVENT_RATES_PER_MILLE

    rate_case = " ".join(
        f"WHEN event_type = '{cls}' THEN {r}" for cls, r in sorted(EVENT_RATES_PER_MILLE.items())
    )
    body = f"""
SELECT t.event_type, t.input_count, COALESCE(k.kept_count, 0) AS kept_count,
  CAST(COALESCE(k.kept_count, 0) AS DOUBLE) / t.input_count AS achieved_rate
FROM (SELECT event_type, COUNT(*) AS input_count FROM ev GROUP BY event_type) t
LEFT JOIN (
  SELECT event_type, COUNT(*) AS kept_count FROM ev
  WHERE ((event_id % 1000003) * 2654435761) % 1000 < (CASE {rate_case} ELSE 0 END)
  GROUP BY event_type
) k ON t.event_type = k.event_type
ORDER BY t.event_type
""".strip()
    return {"stratified_sample_summary": _with({"ev": EVENTS_BASE}, body)}


def _streaming_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.streaming import SEVERITY_ROWS

    dim_values = ", ".join(f"('{t}', '{s}')" for t, s in SEVERITY_ROWS)
    severity_body = f"""
SELECT severity, COUNT(*) AS event_count, {money_sum_sql('value')} AS total_value,
  {sum_long_sql("CASE WHEN event_type = 'error' THEN 1 ELSE 0 END")} AS error_count
FROM (
  SELECT COALESCE(d.severity, 'unknown') AS severity, e.value, e.event_type
  FROM ev e LEFT JOIN (VALUES {dim_values}) d(event_type, severity)
    ON e.event_type = d.event_type
)
GROUP BY severity ORDER BY severity
""".strip()
    heavy_hitters_body = """
SELECT window_start_us, user_id, events, rnk FROM (
  SELECT window_start_us, user_id, events,
    CAST(ROW_NUMBER() OVER (
      PARTITION BY window_start_us ORDER BY events DESC, user_id ASC
    ) AS INTEGER) AS rnk
  FROM (
    SELECT (ts_us // 3600000000) * 3600000000 AS window_start_us,
      user_id, COUNT(*) AS events
    FROM ev GROUP BY 1, 2
  )
)
WHERE rnk <= 5
ORDER BY window_start_us, rnk
""".strip()
    # Twin of streaming.streaming_volume_alerts: per-hour-of-day baseline
    # (exact integer sums, fixed float-op order) + per-window z and the
    # alert severity ladder. Expression order mirrors the Spark side
    # exactly: mean = sx/n, var = (sxx - n*mean*mean)/(n-1).
    from dataengineeringpipeline_spark.alerts import (
        SEVERITY_PRIORITY,
        VOL_CRITICAL_Z,
        VOL_ERROR_Z,
        VOL_WARN_Z,
    )

    prio_case = " ".join(f"WHEN '{s}' THEN {p}" for s, p in SEVERITY_PRIORITY.items())
    volume_body = f"""
SELECT window_start_us, event_count, z_score,
  severity, CAST(CASE severity {prio_case} END AS INTEGER) AS priority
FROM (
  SELECT w.window_start_us, w.event_count,
    CASE WHEN b.std_rows > 0 THEN (w.event_count - b.mean_rows) / b.std_rows END AS z_score,
    CASE
      WHEN abs(CASE WHEN b.std_rows > 0 THEN (w.event_count - b.mean_rows) / b.std_rows END) >= {VOL_CRITICAL_Z} THEN 'CRITICAL'
      WHEN abs(CASE WHEN b.std_rows > 0 THEN (w.event_count - b.mean_rows) / b.std_rows END) >= {VOL_ERROR_Z} THEN 'ERROR'
      WHEN abs(CASE WHEN b.std_rows > 0 THEN (w.event_count - b.mean_rows) / b.std_rows END) >= {VOL_WARN_Z} THEN 'WARNING'
      ELSE 'INFO'
    END AS severity
  FROM (
    SELECT (ts_us // 3600000000) * 3600000000 AS window_start_us,
      CAST(COUNT(*) AS BIGINT) AS event_count
    FROM ev GROUP BY 1
  ) w
  JOIN (
    SELECT hod, sx / n AS mean_rows,
      CASE WHEN n > 1 THEN sqrt(greatest((sxx - n * (sx / n) * (sx / n)) / (n - 1), 0.0)) END AS std_rows
    FROM (
      SELECT CAST(hidx % 24 AS INTEGER) AS hod, CAST(COUNT(*) AS BIGINT) AS n,
        CAST(SUM(rows) AS BIGINT) AS sx, CAST(SUM(rows * rows) AS BIGINT) AS sxx
      FROM (SELECT ts_us // 3600000000 AS hidx, CAST(COUNT(*) AS BIGINT) AS rows FROM ev GROUP BY 1)
      GROUP BY 1
    )
  ) b ON b.hod = CAST((w.window_start_us // 3600000000) % 24 AS INTEGER)
)
ORDER BY window_start_us
""".strip()
    # Twin of alerts.suppress_repeats over the volume feed: WARNING+
    # rows only, 6h integer suppression buckets, worst-severity carry.
    from dataengineeringpipeline_spark.alerts import SUPPRESS_WINDOW_US

    sev_case = " ".join(f"WHEN {p} THEN '{s}'" for s, p in SEVERITY_PRIORITY.items())
    suppressed_body = f"""
SELECT window_bucket, first_ts_us, alerts_in_window, worst_priority,
  CASE worst_priority {sev_case} END AS worst_severity
FROM (
  SELECT window_start_us // {SUPPRESS_WINDOW_US} AS window_bucket,
    CAST(MIN(window_start_us) AS BIGINT) AS first_ts_us,
    CAST(COUNT(*) AS BIGINT) AS alerts_in_window,
    CAST(MAX(priority) AS INTEGER) AS worst_priority
  FROM feed WHERE priority >= {SEVERITY_PRIORITY['WARNING']}
  GROUP BY 1
)
ORDER BY window_bucket
""".strip()
    return {
        "streaming_volume_alerts": _with({"ev": EVENTS_BASE}, volume_body),
        "suppressed_volume_alerts": _with(
            {"ev": EVENTS_BASE, "feed": volume_body}, suppressed_body
        ),
        "streaming_heavy_hitters": _with({"ev": EVENTS_BASE}, heavy_hitters_body),
        "streaming_hourly_counts": _with({"ev": EVENTS_BASE}, _STREAM_HOURLY_BODY),
        "streaming_session_counts": _with({"ev": EVENTS_BASE}, _STREAM_SESSIONS_BODY),
        "streaming_severity_counts": _with({"ev": EVENTS_BASE}, severity_body),
        # The streamed feature upsert merges to BIT-EXACTLY the batch
        # materialization, so its oracle IS feature_store_latest's.
        "streaming_feature_store_latest": _with(
            {"ev": EVENTS_BASE, "daily": _daily_features_body()}, _FS_LATEST_BODY
        ),
        "multimodal_features": _MULTIMODAL_SQL,
        "multimodal_decode_report": _MM_DECODE_SQL,
        "frame_sample_plan": _FRAME_PLAN_SQL,
    }


# ---------------------------------------------------------------------------
# Corpus hygiene (twins of operators/decontam.py) + interval join
# (operators/asof.interval_join) + stream-stream join (streaming)
# ---------------------------------------------------------------------------


def _shingle_hashes_pred(pred: str) -> str:
    """(doc_id, h) shingle-hash sets over a filtered slice of the
    documents table — twin of dedup.doc_shingle_hash_sets(docs.filter(pred))."""
    return rf"""
SELECT doc_id, {_wh('shingle')} AS h FROM (
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
      THEN list_transform(range(1, len(ws) - 1), i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
      ELSE [] END) AS shingle
    FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS ws FROM documents WHERE {pred})
  )
)""".strip()


def _corpus_hygiene_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.operators.decontam import (
        BENCHMARK_SOURCE,
        BOILERPLATE_MIN_DF,
    )

    corpus_pred = f"source <> '{BENCHMARK_SOURCE}'"
    bench_pred = f"source = '{BENCHMARK_SOURCE}'"
    decontam = f"""
WITH corpus AS ({_shingle_hashes_pred(corpus_pred)}),
bench AS (SELECT DISTINCT h FROM ({_shingle_hashes_pred(bench_pred)})),
totals AS (SELECT doc_id, COUNT(*) AS total FROM corpus GROUP BY doc_id),
hits AS (SELECT c.doc_id, COUNT(*) AS hit FROM corpus c JOIN bench b ON c.h = b.h GROUP BY c.doc_id)
SELECT d.doc_id,
  CAST(COALESCE(t.total, 0) AS BIGINT) AS total_ngrams,
  CAST(COALESCE(hh.hit, 0) AS BIGINT) AS contaminated_ngrams,
  CASE WHEN COALESCE(t.total, 0) > 0
       THEN CAST(COALESCE(hh.hit, 0) AS DOUBLE) / t.total END AS contamination_ratio,
  COALESCE(hh.hit, 0) > 0 AS is_contaminated
FROM (SELECT doc_id FROM documents WHERE {corpus_pred}) d
LEFT JOIN totals t ON d.doc_id = t.doc_id
LEFT JOIN hits hh ON d.doc_id = hh.doc_id
ORDER BY d.doc_id
""".strip()

    boilerplate = f"""
WITH sets AS ({_shingle_hashes_pred('TRUE')}),
frequent AS (SELECT h FROM (SELECT h, COUNT(*) AS df FROM sets GROUP BY h) WHERE df > {BOILERPLATE_MIN_DF}),
totals AS (SELECT doc_id, COUNT(*) AS total FROM sets GROUP BY doc_id),
bp AS (SELECT s.doc_id, COUNT(*) AS n FROM sets s JOIN frequent f ON s.h = f.h GROUP BY s.doc_id)
SELECT d.doc_id,
  CAST(COALESCE(t.total, 0) AS BIGINT) AS total_ngrams,
  CAST(COALESCE(bp.n, 0) AS BIGINT) AS boilerplate_ngrams,
  CASE WHEN COALESCE(t.total, 0) > 0
       THEN CAST(COALESCE(bp.n, 0) AS DOUBLE) / t.total END AS boilerplate_ratio
FROM (SELECT doc_id FROM documents) d
LEFT JOIN totals t ON d.doc_id = t.doc_id
LEFT JOIN bp ON d.doc_id = bp.doc_id
ORDER BY d.doc_id
""".strip()
    # Twin of decontam.top_ngrams_per_source (n=3, top_k=5, min_df=2).
    top_ngrams = f"""
WITH shingles AS ({_SHINGLES}),
counts AS (
  SELECT d.source, s.shingle, CAST(COUNT(*) AS BIGINT) AS doc_freq
  FROM shingles s JOIN documents d USING (doc_id)
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT source, shingle, doc_freq, rank FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY doc_freq DESC, shingle ASC) AS INTEGER) AS rank
  FROM counts
) WHERE rank <= 5 ORDER BY source, rank
""".strip()
    return {
        "decontamination_report": decontam,
        "boilerplate_report": boilerplate,
        "top_ngrams_per_source": top_ngrams,
    }


def _interval_join_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.operators.asof import (
        INCIDENT_LEAD_US,
        INCIDENT_TAIL_US,
        INCIDENT_TOP_K,
    )

    body = f"""
SELECT t.hour_idx, t.window_start_us, t.window_end_us,
  COUNT(*) AS events_in_window,
  {sum_long_sql("CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END")} AS errors_in_window,
  COUNT(DISTINCT e.user_id) AS distinct_users,
  CAST(SUM(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS error_share
FROM (
  SELECT hour_idx, error_count,
    hour_idx * 3600000000 - {INCIDENT_LEAD_US} AS window_start_us,
    hour_idx * 3600000000 + {INCIDENT_TAIL_US} AS window_end_us
  FROM (
    SELECT hour_idx, error_count,
      ROW_NUMBER() OVER (ORDER BY error_count DESC, hour_idx) AS rk
    FROM (SELECT ts_us // 3600000000 AS hour_idx, COUNT(*) AS error_count
          FROM ev WHERE event_type = 'error' GROUP BY 1)
  ) WHERE rk <= {INCIDENT_TOP_K}
) t
JOIN ev e ON e.ts_us >= t.window_start_us AND e.ts_us < t.window_end_us
GROUP BY 1, 2, 3
ORDER BY t.hour_idx
""".strip()
    return {"incident_window_events": _with({"ev": EVENTS_BASE}, body)}


def _pq_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.operators.similarity import (
        PQ_CODEBOOK_STRIDE,
        PQ_K,
        PQ_M,
        PQ_SHORTLIST,
        PQ_SUBDIM,
    )

    cb_ids = ", ".join(str(PQ_CODEBOOK_STRIDE * c) for c in range(PQ_K))
    sub_l2 = (
        f"list_reduce(list_transform(range(1, {PQ_SUBDIM + 1}), "
        "i -> (un.u[cb.m*{sd}+i] - cb.cw[i]) * (un.u[cb.m*{sd}+i] - cb.cw[i])), "
        "(a, b) -> a + b)"
    ).format(sd=PQ_SUBDIM)
    ctes = f"""
unit AS (SELECT vec_id, label, list_transform(e, x -> x / nrm) AS u FROM n),
cb AS (
  SELECT t.m, CAST(un.vec_id // {PQ_CODEBOOK_STRIDE} AS INTEGER) AS code,
    un.u[t.m*{PQ_SUBDIM}+1 : t.m*{PQ_SUBDIM}+{PQ_SUBDIM}] AS cw
  FROM unit un CROSS JOIN (SELECT unnest(range(0, {PQ_M})) AS m) t
  WHERE un.vec_id IN ({cb_ids})
),
enc AS (
  SELECT vec_id, m, code FROM (
    SELECT un.vec_id, cb.m, cb.code,
      ROW_NUMBER() OVER (PARTITION BY un.vec_id, cb.m ORDER BY {sub_l2} ASC, cb.code ASC) AS rn
    FROM unit un CROSS JOIN cb
  ) WHERE rn = 1
),
qt AS (
  SELECT un.vec_id AS query_id, cb.m, cb.code, {sub_l2} AS d
  FROM unit un CROSS JOIN cb WHERE un.vec_id % 100 = 0
),
ranked AS (
  SELECT query_id, neighbor_id, approx_dist,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dist ASC, neighbor_id ASC) AS rk
  FROM (
    SELECT qt.query_id, enc.vec_id AS neighbor_id,
      list_reduce(list(qt.d ORDER BY qt.m), (a, b) -> a + b) AS approx_dist
    FROM enc JOIN qt ON enc.m = qt.m AND enc.code = qt.code
    WHERE enc.vec_id <> qt.query_id
    GROUP BY 1, 2
  )
),
rr AS (
  SELECT query_id, neighbor_id, label, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM (
    SELECT s.query_id, s.neighbor_id, v.label,
      list_reduce(list_transform(range(1, 65), i -> q.e[i] * v.e[i]), (a, b) -> a + b) / (q.nrm * v.nrm) AS cosine
    FROM (SELECT query_id, neighbor_id FROM ranked WHERE rk <= {PQ_SHORTLIST}) s
    JOIN n q ON q.vec_id = s.query_id
    JOIN n v ON v.vec_id = s.neighbor_id
  )
)""".strip()

    pq_topk = f"""
WITH n AS ({_EMB_NORMS}),
{ctes}
SELECT query_id, neighbor_id, label, cosine, CAST(rk AS INTEGER) AS rank
FROM rr WHERE rk <= 5 ORDER BY query_id, rank
""".strip()

    pq_recall = f"""
WITH n AS ({_EMB_NORMS}),
{ctes},
exact_tk AS (SELECT query_id, neighbor_id FROM ({_ANN_BODY})),
adc_tk AS (SELECT query_id, neighbor_id FROM ranked WHERE rk <= 5),
rr_tk AS (SELECT query_id, neighbor_id FROM rr WHERE rk <= 5)
SELECT CAST(5 AS INTEGER) AS k,
  (SELECT count(*) FROM exact_tk) AS exact_pairs,
  (SELECT count(*) FROM exact_tk e JOIN adc_tk a USING (query_id, neighbor_id)) AS adc_hits,
  (SELECT count(*) FROM exact_tk e JOIN adc_tk a USING (query_id, neighbor_id))
    / (SELECT count(*) FROM exact_tk) AS adc_recall,
  (SELECT count(*) FROM exact_tk e JOIN rr_tk r USING (query_id, neighbor_id)) AS rerank_hits,
  (SELECT count(*) FROM exact_tk e JOIN rr_tk r USING (query_id, neighbor_id))
    / (SELECT count(*) FROM exact_tk) AS rerank_recall
""".strip()
    from dataengineeringpipeline_spark.operators.similarity import (
        IVF_CENTROID_MOD,
        IVF_NPROBE,
    )

    ivf_cells = _IVF_CELLS.format(cmod=IVF_CENTROID_MOD, nprobe=IVF_NPROBE)
    ivfpq_topk = f"""
WITH n AS ({_EMB_NORMS}),
{ivf_cells},
{ctes},
pranked AS (
  SELECT query_id, neighbor_id,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY approx_dist ASC, neighbor_id ASC) AS rk
  FROM (
    SELECT qt.query_id, enc.vec_id AS neighbor_id,
      list_reduce(list(qt.d ORDER BY qt.m), (a, b) -> a + b) AS approx_dist
    FROM enc
    JOIN assign a2 ON a2.vec_id = enc.vec_id
    JOIN probes p ON p.centroid_id = a2.centroid_id
    JOIN qt ON enc.m = qt.m AND enc.code = qt.code AND qt.query_id = p.query_id
    WHERE enc.vec_id <> qt.query_id
    GROUP BY qt.query_id, enc.vec_id
  )
),
prr AS (
  SELECT query_id, neighbor_id, label, cosine,
    ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS rk
  FROM (
    SELECT s.query_id, s.neighbor_id, v.label,
      list_reduce(list_transform(range(1, 65), i -> q2.e[i] * v.e[i]), (a, b) -> a + b) / (q2.nrm * v.nrm) AS cosine
    FROM (SELECT query_id, neighbor_id FROM pranked WHERE rk <= {PQ_SHORTLIST}) s
    JOIN n q2 ON q2.vec_id = s.query_id
    JOIN n v ON v.vec_id = s.neighbor_id
  )
)
SELECT query_id, neighbor_id, label, cosine, CAST(rk AS INTEGER) AS rank
FROM prr WHERE rk <= 5 ORDER BY query_id, rank
""".strip()
    return {
        "pq_ann_topk": pq_topk,
        "pq_ann_recall": pq_recall,
        "ann_ivfpq_topk": ivfpq_topk,
    }


def _cohort_funnel_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.events_analytics import FUNNEL_STEPS

    cohort_body = """
SELECT a.cohort_period, a.period_offset, s.cohort_users, a.active_users,
  CAST(a.active_users AS DOUBLE) / s.cohort_users AS retention
FROM (
  SELECT f.cohort_period, act.period - f.cohort_period AS period_offset,
    CAST(COUNT(*) AS BIGINT) AS active_users
  FROM act JOIN first f ON act.user_id = f.user_id
  GROUP BY 1, 2
) a
JOIN (
  SELECT cohort_period, CAST(COUNT(*) AS BIGINT) AS cohort_users
  FROM first GROUP BY 1
) s ON a.cohort_period = s.cohort_period
ORDER BY a.cohort_period, a.period_offset
""".strip()
    act = (
        "SELECT DISTINCT user_id,"
        " CAST((event_date - DATE '1970-01-01') // 7 AS BIGINT) AS period FROM ev"
    )
    first = "SELECT user_id, MIN(period) AS cohort_period FROM act GROUP BY user_id"
    cohort = _with({"ev": EVENTS_BASE, "act": act, "first": first}, cohort_body)

    t_defs, prev = [], None
    for i, step in enumerate(FUNNEL_STEPS):
        cond = f"event_type = '{step}'"
        if prev is not None:
            cond += f" AND ts_us > {prev}"
        t_defs.append(f"MIN(CASE WHEN {cond} THEN ts_us END) OVER (PARTITION BY user_id) AS _t{i}")
        prev = f"_t{i}"
    # nested selects so each step's window can reference the previous one
    inner = "SELECT user_id, event_type, ts_us FROM ev"
    for i in range(len(FUNNEL_STEPS)):
        inner = f"SELECT *, {t_defs[i]} FROM ({inner})"
    per_user = (
        f"SELECT user_id, {', '.join(f'MAX(_t{i}) AS _t{i}' for i in range(len(FUNNEL_STEPS)))} "
        f"FROM ({inner}) GROUP BY user_id"
    )
    totals = (
        "SELECT CAST(COUNT(*) AS BIGINT) AS users_total, "
        + ", ".join(
            f"CAST(COUNT(_t{i}) AS BIGINT) AS _n{i}" for i in range(len(FUNNEL_STEPS))
        )
        + " FROM pu"
    )
    step_rows = []
    for i, step in enumerate(FUNNEL_STEPS):
        prev_n = "users_total" if i == 0 else f"_n{i - 1}"
        step_rows.append(
            f"SELECT CAST({i + 1} AS INTEGER) AS step_idx, '{step}' AS step,"
            f" _n{i} AS users_completed,"
            f" CASE WHEN {prev_n} > 0 THEN CAST(_n{i} AS DOUBLE) / {prev_n} END AS conversion_from_prev,"
            f" CASE WHEN users_total > 0 THEN CAST(_n{i} AS DOUBLE) / users_total END AS conversion_from_start"
            " FROM t"
        )
    funnel = _with(
        {"ev": EVENTS_BASE, "pu": per_user, "t": totals},
        " UNION ALL ".join(step_rows) + " ORDER BY step_idx",
    )
    return {"cohort_retention": cohort, "conversion_funnel": funnel}


def _session_window_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.streaming import DEFAULT_SESSION_GAP_MINUTES

    gap_us = DEFAULT_SESSION_GAP_MINUTES * 60_000_000
    body = f"""
SELECT user_id,
  CAST(COUNT(*) AS BIGINT) AS sessions,
  CAST(SUM(n) AS BIGINT) AS events_seen,
  CAST(SUM(t1 - t0 + {gap_us}) AS BIGINT) AS total_session_us
FROM (
  SELECT user_id, sid, COUNT(*) AS n, MIN(ts_us) AS t0, MAX(ts_us) AS t1
  FROM (
    SELECT user_id, ts_us,
      SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us ROWS UNBOUNDED PRECEDING) AS sid
    FROM (
      SELECT user_id, ts_us,
        CASE WHEN LAG(ts_us) OVER w IS NULL
          OR ts_us - LAG(ts_us) OVER w > {gap_us} THEN 1 ELSE 0 END AS new_s
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY ts_us)
    )
  ) GROUP BY user_id, sid
)
GROUP BY user_id ORDER BY user_id
""".strip()
    return {"streaming_session_windows": _with({"ev": EVENTS_BASE}, body)}


def _anomaly_oracles() -> dict[str, str]:
    body = """
SELECT day, rows,
  CASE WHEN n >= 1 THEN mean END AS trailing_mean,
  CASE WHEN n >= 2 AND var > 0 THEN sqrt(var) END AS trailing_std,
  CASE WHEN n >= 2 AND var > 0 THEN (rows - mean) / sqrt(var) END AS z_score,
  COALESCE(CASE WHEN n >= 2 AND var > 0
    THEN abs((rows - mean) / sqrt(var)) > 2.0 END, FALSE) AS is_anomaly
FROM (
  SELECT day, rows, n, mean, (sxx - n * mean * mean) / (n - 1) AS var
  FROM (
    SELECT day, rows,
      COUNT(*) OVER w AS n,
      CAST(SUM(rows) OVER w AS BIGINT) / COUNT(*) OVER w AS mean,
      CAST(SUM(rows * rows) OVER w AS BIGINT) AS sxx
    FROM daily
    WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
  )
)
ORDER BY day
""".strip()
    daily = "SELECT order_date AS day, CAST(COUNT(*) AS BIGINT) AS rows FROM so GROUP BY 1"
    return {
        "dq_daily_anomalies": _with({"so": SILVER_ORDERS, "daily": daily}, body)
    }


def _histogram_oracles() -> dict[str, str]:
    tok = f"SELECT doc_id, len(regexp_extract_all(text, '{_TOKEN_RE}')) AS token_count FROM documents"
    body = """
SELECT bucket,
  CAST(CASE WHEN bucket = 0 THEN 0 ELSE 1 << (bucket - 1) END AS BIGINT) AS bucket_lo,
  CAST(CASE WHEN bucket = 0 THEN 0 ELSE (1 << bucket) - 1 END AS BIGINT) AS bucket_hi,
  docs, tokens,
  CAST(docs AS DOUBLE) / SUM(docs) OVER () AS doc_share,
  CAST(tokens AS DOUBLE) / SUM(tokens) OVER () AS token_share,
  CAST(SUM(docs) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS DOUBLE)
    / SUM(docs) OVER () AS cum_doc_share
FROM (
  SELECT CASE WHEN token_count <= 0 THEN 0 ELSE CAST(length(bin(token_count)) AS INTEGER) END AS bucket,
    COUNT(*) AS docs, CAST(SUM(token_count) AS BIGINT) AS tokens
  FROM tok GROUP BY 1
)
ORDER BY bucket
""".strip()
    hh_body = """
SELECT user_id, rows, share, skew_factor FROM (
  SELECT c.user_id, c.rows,
    CAST(c.rows AS DOUBLE) / t.total_rows AS share,
    c.rows / t.mean_rows AS skew_factor
  FROM (SELECT user_id, COUNT(*) AS rows FROM ev GROUP BY user_id) c
  CROSS JOIN (
    SELECT SUM(rows) AS total_rows, AVG(rows) AS mean_rows
    FROM (SELECT user_id, COUNT(*) AS rows FROM ev GROUP BY user_id)
  ) t
)
ORDER BY rows DESC, user_id ASC LIMIT 20
""".strip()
    # Count-min sketch twin: same pure-integer row hashes as
    # scale._cms_bucket — (key%P · (2654435761 + d·1013904223) + 40503(d+1))
    # mod P mod width, P=1000003, width=1024, depth=4.
    cms_hash = (  # CAST the row index: VALUES yields INT32, d·1013904223 overflows it
        "((({k} % 1000003) * (2654435761 + CAST({d} AS BIGINT) * 1013904223)"
        " + 40503 * (CAST({d} AS BIGINT) + 1)) % 1000003) % 1024"
    )
    cms_body = f"""
SELECT user_id, est_count, true_count, est_count - true_count AS overcount
FROM (
  SELECT e.user_id, e.true_count, MIN(s.c) AS est_count
  FROM (SELECT user_id, COUNT(*) AS true_count FROM ev GROUP BY user_id) e
  JOIN (
    SELECT d, {cms_hash.format(k='user_id', d='d')} AS bucket, COUNT(*) AS c
    FROM ev CROSS JOIN (VALUES (0), (1), (2), (3)) ds(d)
    GROUP BY 1, 2
  ) s ON s.bucket = {cms_hash.format(k='e.user_id', d='s.d')}
  GROUP BY e.user_id, e.true_count
)
ORDER BY est_count DESC, user_id ASC LIMIT 20
""".strip()
    # HyperLogLog twin (scale.hll_sketch_summary): same 48-bit md5-prefix
    # hash of the stringified key, bucket = top HLL_P bits, rho via bin()
    # string length (no float log2). Pure-integer digest — the estimator's
    # linear-counting ln is libm-dependent and stays out of the oracle.
    from dataengineeringpipeline_spark.scale import HLL_P, HLL_REGISTER_BITS

    wmod = 1 << HLL_REGISTER_BITS
    m = 1 << HLL_P
    rb = HLL_REGISTER_BITS
    hll_body = f"""
SELECT event_type, occupied_buckets, register_sum, deepest_register, exact_distinct,
  CAST(occupied_buckets AS DOUBLE) / {m} AS occupancy
FROM (
  SELECT event_type,
    CAST(COUNT(*) AS BIGINT) AS occupied_buckets,
    CAST(SUM(max_rho) AS BIGINT) AS register_sum,
    CAST(MAX(max_rho) AS INTEGER) AS deepest_register
  FROM (
    SELECT event_type, h // {wmod} AS bucket,
      MAX(CASE WHEN h % {wmod} = 0 THEN {rb + 1}
          ELSE {rb} - (length(bin(h % {wmod})) - 1) END) AS max_rho
    FROM (SELECT event_type, {_wh('CAST(user_id AS VARCHAR)')} AS h FROM events)
    GROUP BY 1, 2
  ) r GROUP BY r.event_type
) s
JOIN (
  SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
  FROM events GROUP BY 1
) x USING (event_type)
ORDER BY event_type
""".strip()
    return {
        "token_histogram": _with({"tok": tok}, body),
        "event_heavy_hitters": _with({"ev": EVENTS_BASE}, hh_body),
        "cms_heavy_hitters": _with({"ev": EVENTS_BASE}, cms_body),
        "hll_sketch_summary": hll_body,
    }


def _scd_oracles() -> dict[str, str]:
    body = """
SELECT customer_key, priority, change_date AS valid_from,
  LEAD(change_date) OVER w2 AS valid_to,
  CAST(ROW_NUMBER() OVER w2 AS INTEGER) AS version,
  LEAD(change_date) OVER w2 IS NULL AS is_current
FROM (
  SELECT customer_key, priority, change_date, order_key FROM (
    SELECT *,
      (LAG(change_date) OVER w IS NULL)
      OR (priority IS DISTINCT FROM LAG(priority) OVER w) AS _open
    FROM ch
    WINDOW w AS (PARTITION BY customer_key ORDER BY change_date ASC, order_key ASC)
  ) WHERE _open
)
WINDOW w2 AS (PARTITION BY customer_key ORDER BY change_date ASC, order_key ASC)
ORDER BY customer_key, version
""".strip()
    ch = (
        "SELECT o_custkey AS customer_key, o_orderpriority AS priority, "
        "CAST(o_orderdate AS DATE) AS change_date, o_orderkey AS order_key FROM orders"
    )
    snap = (
        "SELECT o_orderkey AS order_key, o_orderstatus AS status,"
        " o_totalprice AS total_price, CAST(o_orderdate AS DATE) AS last_change"
        " FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1999-01-01'"
    )
    chg = (
        "SELECT l_orderkey AS order_key,"
        " CASE WHEN l_returnflag = 'R' THEN 'D' ELSE 'U' END AS op,"
        " 'SHIPPED-' || l_linestatus AS status,"
        " l_extendedprice AS total_price,"
        " CAST(l_shipdate AS DATE) AS last_change, l_linenumber AS line_number"
        " FROM lineitem WHERE CAST(l_shipdate AS DATE) >= DATE '2001-01-01'"
    )
    latest = (
        "SELECT * FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY order_key"
        " ORDER BY last_change DESC, line_number DESC, op DESC, status DESC,"
        " total_price DESC) AS rn FROM chg)"
        " WHERE rn = 1"
    )
    cdc_body = """
SELECT order_key, status, total_price, last_change FROM (
  SELECT s.order_key, s.status, s.total_price, s.last_change FROM snap s
  WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.order_key = s.order_key)
  UNION ALL
  SELECT order_key, status, total_price, last_change FROM latest
  WHERE op <> 'D'
) ORDER BY order_key
""".strip()
    # Lakehouse SCD2 merge: the oracle is the TWO-PHASE arithmetic the
    # merge performs — phase 1 derives history on the pre-1997 batch
    # (keeping each version-opening record with its order_key
    # tiebreaker), phase 2 re-derives over (phase-1 survivors ∪ 1997+
    # changes). For keys the second batch never touches, re-deriving
    # over the survivors alone reproduces phase-1 history exactly
    # (consecutive survivors differ pairwise by construction), so one
    # derivation over the union is the whole truth.
    opener = (
        "SELECT customer_key, priority, change_date, order_key FROM ("
        " SELECT *, (LAG(change_date) OVER w IS NULL)"
        " OR (priority IS DISTINCT FROM LAG(priority) OVER w) AS _open"
        " FROM {src}"
        " WINDOW w AS (PARTITION BY customer_key"
        " ORDER BY change_date ASC, order_key ASC)"
        ") WHERE _open"
    )
    scd2_lake_ctes = {
        "ch": ch,
        "b1": "SELECT * FROM ch WHERE change_date < DATE '1997-01-01'",
        "b2": "SELECT * FROM ch WHERE change_date >= DATE '1997-01-01'",
        "ph1": opener.format(src="b1"),
        "un": "SELECT * FROM ph1 UNION ALL SELECT * FROM b2",
        "op2": opener.format(src="un"),
    }
    scd2_lake_body = """
SELECT customer_key, priority, order_key, change_date AS valid_from,
  LEAD(change_date) OVER w2 AS valid_to,
  CAST(ROW_NUMBER() OVER w2 AS INTEGER) AS version,
  LEAD(change_date) OVER w2 IS NULL AS is_current
FROM op2
WINDOW w2 AS (PARTITION BY customer_key ORDER BY change_date ASC, order_key ASC)
ORDER BY customer_key, version
""".strip()
    # Time travel: version 1 is the staged snapshot, version 2 the
    # CDC-merged state — both aggregates are pure arithmetic over the
    # same CTEs the cdc oracle uses.
    tt_body = f"""
SELECT 1 AS version, status, COUNT(*) AS order_count,
  {money_sum_sql('total_price')} AS total_value
FROM snap GROUP BY status
UNION ALL
SELECT 2 AS version, status, COUNT(*) AS order_count,
  {money_sum_sql('total_price')} AS total_value
FROM (
  SELECT s.status, s.total_price FROM snap s
  WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.order_key = s.order_key)
  UNION ALL
  SELECT status, total_price FROM latest WHERE op <> 'D'
) GROUP BY status
ORDER BY version, status
""".strip()
    # Change data feed: the diff of the two snapshots must reproduce the
    # change log it never saw — each set derived from the changelog
    # arithmetic directly.
    cdf_body = """
SELECT * FROM (
  SELECT 'insert' AS change_type, COUNT(*) AS n_rows,
    MIN(order_key) AS min_key, MAX(order_key) AS max_key
  FROM latest l WHERE op <> 'D'
    AND NOT EXISTS (SELECT 1 FROM snap s WHERE s.order_key = l.order_key)
  UNION ALL
  SELECT 'delete', COUNT(*), MIN(s.order_key), MAX(s.order_key)
  FROM snap s WHERE EXISTS (
    SELECT 1 FROM latest l WHERE l.order_key = s.order_key AND l.op = 'D')
  UNION ALL
  SELECT 'update', COUNT(*), MIN(s.order_key), MAX(s.order_key)
  FROM snap s JOIN latest l ON s.order_key = l.order_key AND l.op <> 'D'
  WHERE (s.status, s.total_price, s.last_change)
    IS DISTINCT FROM (l.status, l.total_price, l.last_change)
) ORDER BY change_type
""".strip()
    # Snapshot retention: version 2 is the CDC-merged state, version 3
    # that state minus the purged % 71 cohort — the expiry of version 1
    # must leave both retained reads bit-identical to this arithmetic.
    merged = (
        "SELECT s.order_key, s.status, s.total_price FROM snap s"
        " WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.order_key = s.order_key)"
        " UNION ALL SELECT order_key, status, total_price FROM latest WHERE op <> 'D'"
    )
    retention_body = f"""
SELECT * FROM (
  SELECT 2 AS version, status, COUNT(*) AS order_count,
    {money_sum_sql('total_price')} AS total_value
  FROM merged GROUP BY status
  UNION ALL
  SELECT 3 AS version, status, COUNT(*) AS order_count,
    {money_sum_sql('total_price')} AS total_value
  FROM merged WHERE order_key % 71 <> 0 GROUP BY status
) ORDER BY version, status
""".strip()
    return {
        "customer_priority_scd2": _with({"ch": ch}, body),
        "cdc_order_snapshot": _with(
            {"snap": snap, "chg": chg, "latest": latest}, cdc_body
        ),
        "lake_scd2_merged_history": _with(scd2_lake_ctes, scd2_lake_body),
        "lake_time_travel_totals": _with(
            {"snap": snap, "chg": chg, "latest": latest}, tt_body
        ),
        "lake_retention_totals": _with(
            {"snap": snap, "chg": chg, "latest": latest, "merged": merged},
            retention_body,
        ),
        "lake_version_changes": _with(
            {"snap": snap, "chg": chg, "latest": latest}, cdf_body
        ),
    }


def _mix_oracles() -> dict[str, str]:
    from dataengineeringpipeline_spark.operators.mix import MIX_WEIGHTS_PER_MILLE

    w_values = ", ".join(f"('{d}', {w})" for d, w in sorted(MIX_WEIGHTS_PER_MILLE.items()))
    body = f"""
SELECT p.domain, p.available, p.weight_pm, p.planned_target, p.rate_pm,
  COALESCE(k.kept_count, 0) AS kept_count,
  CAST(COALESCE(k.kept_count, 0) AS DOUBLE)
    / SUM(COALESCE(k.kept_count, 0)) OVER () AS achieved_share
FROM (
  SELECT domain, available, weight_pm,
    (weight_pm * t_total) // 1000 AS planned_target,
    (((weight_pm * t_total) // 1000) * 1000) // available AS rate_pm
  FROM (
    SELECT a.lang AS domain, a.available, w.weight_pm,
      MIN((a.available * 1000) // w.weight_pm) OVER () AS t_total
    FROM (SELECT lang, COUNT(*) AS available FROM documents GROUP BY lang) a
    JOIN (VALUES {w_values}) w(domain, weight_pm) ON a.lang = w.domain
  )
) p
LEFT JOIN (
  SELECT d.lang AS domain, COUNT(*) AS kept_count
  FROM documents d
  JOIN (
    SELECT domain,
      (((weight_pm * t_total) // 1000) * 1000) // available AS rate_pm
    FROM (
      SELECT a.lang AS domain, a.available, w.weight_pm,
        MIN((a.available * 1000) // w.weight_pm) OVER () AS t_total
      FROM (SELECT lang, COUNT(*) AS available FROM documents GROUP BY lang) a
      JOIN (VALUES {w_values}) w(domain, weight_pm) ON a.lang = w.domain
    )
  ) r ON d.lang = r.domain
  WHERE ((d.doc_id % 1000003) * 2654435761) % 1000 < r.rate_pm
  GROUP BY d.lang
) k ON p.domain = k.domain
ORDER BY p.domain
""".strip()
    from dataengineeringpipeline_spark.operators.mix import TOKEN_BUDGET_DEFAULT

    budget_body = f"""
SELECT domain, available_tokens, weight_pm, target_tokens,
  target_tokens // available_tokens AS full_epochs,
  ((target_tokens % available_tokens) * 1000) // available_tokens AS remainder_rate_pm,
  (target_tokens * 1000) // available_tokens AS oversample_x1000
FROM (
  SELECT a.lang AS domain, a.available_tokens, w.weight_pm,
    (w.weight_pm * CAST({TOKEN_BUDGET_DEFAULT} AS BIGINT)) // 1000 AS target_tokens
  FROM (
    SELECT lang,
      CAST(SUM(len(regexp_extract_all(text, '{_TOKEN_RE}'))) AS BIGINT) AS available_tokens
    FROM documents GROUP BY lang
  ) a
  JOIN (VALUES {w_values}) w(domain, weight_pm) ON a.lang = w.domain
  WHERE a.available_tokens > 0
)
ORDER BY domain
""".strip()
    return {"domain_mix_summary": body, "token_budget_plan": budget_body}


def _stream_join_oracles() -> dict[str, str]:
    body = """
SELECT p.user_id, p.event_id AS purchase_id, c.event_id AS click_id,
  p.ts_us AS purchase_ts_us, c.ts_us AS click_ts_us,
  p.ts_us - c.ts_us AS gap_us
FROM ev p JOIN ev c
  ON p.user_id = c.user_id AND p.event_type = 'purchase' AND c.event_type = 'click'
  AND c.ts_us <= p.ts_us AND c.ts_us > p.ts_us - 1800000000
ORDER BY purchase_id, click_id
""".strip()
    return {"streaming_attribution_pairs": _with({"ev": EVENTS_BASE}, body)}


def _alert_oracles() -> dict[str, str]:
    """Twin of :func:`alerts.pipeline_alerts` — the DQ rule report and
    the volume-anomaly detector (both already oracled verbatim above)
    classified into severities and fanned out per routing rule."""
    from dataengineeringpipeline_spark.alerts import (
        DEFAULT_ALERT_RULES,
        DQ_CRITICAL_SHORTFALL,
        DQ_WARN_MARGIN,
        SEVERITY_PRIORITY,
        VOL_CRITICAL_Z,
        VOL_ERROR_Z,
        VOL_WARN_Z,
    )
    from dataengineeringpipeline_spark.quality import ORDERS_RULES

    wide_cols = ["COUNT(*) AS total_count"]
    for i, r in enumerate(ORDERS_RULES):
        expr = r.duck_expression or r.expression
        wide_cols.append(
            f"CAST(SUM(CASE WHEN {expr} THEN 1 ELSE 0 END) AS BIGINT) AS p{i}"
        )
    report_unions = "\n  UNION ALL ".join(
        f"SELECT '{r.name}' AS rule_name, p{i} AS passed_count, total_count, "
        f"CAST({r.threshold} AS DOUBLE) AS threshold FROM wide"
        for i, r in enumerate(ORDERS_RULES)
    )
    sev_priority = " ".join(
        f"WHEN severity = '{s}' THEN {p}" for s, p in SEVERITY_PRIORITY.items()
    )
    route_unions = "\n  UNION ALL ".join(
        "SELECT a.*, '{ch}' AS channel FROM alerts a WHERE "
        "regexp_matches(pipeline_name, '{pat}'){type_pred} AND priority >= {minp}".format(
            ch=r.channel,
            pat=r.pipeline_pattern,
            type_pred=(
                "" if r.alert_type is None else f" AND alert_type = '{r.alert_type}'"
            ),
            minp=SEVERITY_PRIORITY[r.min_severity],
        )
        for r in DEFAULT_ALERT_RULES
    )
    body = f"""
report AS (
  SELECT rule_name, passed_count, total_count,
    passed_count/total_count AS pass_rate, threshold,
    passed_count/total_count >= threshold AS passed
  FROM ({report_unions})
),
dq AS (
  SELECT 'orders_pipeline' AS pipeline_name, 'data_quality' AS alert_type,
    rule_name AS source_name,
    CASE WHEN NOT passed AND threshold - pass_rate >= {DQ_CRITICAL_SHORTFALL} THEN 'CRITICAL'
         WHEN NOT passed THEN 'ERROR'
         WHEN pass_rate - threshold <= {DQ_WARN_MARGIN} THEN 'WARNING'
         ELSE 'INFO' END AS severity,
    CAST(pass_rate AS DOUBLE) AS metric_value
  FROM report
),
daily AS (SELECT order_date AS day, CAST(COUNT(*) AS BIGINT) AS rows FROM so GROUP BY 1),
anom AS (
  SELECT day, CASE WHEN n >= 2 AND var > 0 THEN (rows - mean) / sqrt(var) END AS z_score
  FROM (
    SELECT day, rows, n, mean, (sxx - n * mean * mean) / (n - 1) AS var
    FROM (
      SELECT day, rows,
        COUNT(*) OVER w AS n,
        CAST(SUM(rows) OVER w AS BIGINT) / COUNT(*) OVER w AS mean,
        CAST(SUM(rows * rows) OVER w AS BIGINT) AS sxx
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
  )
),
vol AS (
  SELECT 'orders_pipeline' AS pipeline_name, 'volume_anomaly' AS alert_type,
    CAST(day AS VARCHAR) AS source_name,
    CASE WHEN abs(z_score) >= {VOL_CRITICAL_Z} THEN 'CRITICAL'
         WHEN abs(z_score) >= {VOL_ERROR_Z} THEN 'ERROR'
         ELSE 'WARNING' END AS severity,
    CAST(z_score AS DOUBLE) AS metric_value
  FROM anom WHERE z_score IS NOT NULL AND abs(z_score) >= {VOL_WARN_Z}
),
alerts AS (
  SELECT pipeline_name, alert_type, source_name, severity,
    CAST(CASE {sev_priority} END AS INTEGER) AS priority, metric_value
  FROM (SELECT * FROM dq UNION ALL SELECT * FROM vol)
)
SELECT DISTINCT * FROM ({route_unions})
ORDER BY priority DESC, alert_type, source_name, channel
""".strip()
    # body is a bare CTE list (starts at `report AS`) so it splices into
    # ONE WITH clause alongside the source CTEs.
    sql = (
        f"WITH so AS (\n{SILVER_ORDERS}\n),\n"
        f"wide AS (SELECT {', '.join(wide_cols)} FROM so),\n"
        f"{body}"
    )
    return {"pipeline_alerts": sql}


ORACLES.update(_alert_oracles())
ORACLES.update(_dq_oracles())
ORACLES.update(_ingest_oracles())
ORACLES.update(_streaming_oracles())
ORACLES.update(_feature_event_oracles())
ORACLES.update(_text_oracles())
ORACLES.update(_dedup_oracles())
ORACLES.update(_sim_oracles())
ORACLES.update(_sampling_oracles())
ORACLES.update(_corpus_hygiene_oracles())
ORACLES.update(_interval_join_oracles())
ORACLES.update(_stream_join_oracles())
ORACLES.update(_pq_oracles())
ORACLES.update(_mix_oracles())
ORACLES.update(_scd_oracles())
ORACLES.update(_histogram_oracles())
ORACLES.update(_anomaly_oracles())
ORACLES.update(_session_window_oracles())
ORACLES.update(_cohort_funnel_oracles())


def _layout_oracles() -> dict[str, str]:
    """Twin of operators/layout.layout_pruning_report: rebuilds the grid
    scaling, the Morton interleave (its own term loop — no code shared
    with the operator), both file assignments, and the min/max pruning
    rule in SQL. All arithmetic is non-negative integers, so DuckDB's
    floor `//` and Spark's truncating `div` agree."""
    from dataengineeringpipeline_spark.operators.layout import (
        BOX_HI_PM,
        BOX_LO_PM,
        GRID_BITS,
        N_FILES,
    )

    top = (1 << GRID_BITS) - 1
    z_width = 1 << (2 * GRID_BITS)
    morton = " + ".join(
        f"((gx // {1 << b}) % 2) * {1 << (2 * b)} + ((gy // {1 << b}) % 2) * {1 << (2 * b + 1)}"
        for b in range(GRID_BITS)
    )
    sql = _with(
        {
            "s": (
                "SELECT CAST(MIN(user_id) AS BIGINT) AS min_x, CAST(MAX(user_id) AS BIGINT) AS max_x,"
                " CAST(MIN(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS min_y,"
                " CAST(MAX(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS max_y,"
                " CAST(MIN(event_id) AS BIGINT) AS min_id, CAST(MAX(event_id) AS BIGINT) AS max_id"
                " FROM events"
            ),
            "b": (
                "SELECT CAST(event_id AS BIGINT) AS event_id, CAST(user_id AS BIGINT) AS x,"
                " CAST(floor(value * 100) AS BIGINT) AS y FROM events"
            ),
            "k": (
                "SELECT b.*, s.*,\n"
                f"  CASE WHEN max_x > min_x THEN ((x - min_x) * {top}) // (max_x - min_x) ELSE 0 END AS gx,\n"
                f"  CASE WHEN max_y > min_y THEN ((y - min_y) * {top}) // (max_y - min_y) ELSE 0 END AS gy\n"
                "FROM b, s"
            ),
            "z": (
                f"SELECT *, {morton} AS zkey,\n"
                f"  min_x + ((max_x - min_x) * {BOX_LO_PM}) // 1000 AS box_x_lo,\n"
                f"  min_x + ((max_x - min_x) * {BOX_HI_PM}) // 1000 AS box_x_hi,\n"
                f"  min_y + ((max_y - min_y) * {BOX_LO_PM}) // 1000 AS box_y_lo,\n"
                f"  min_y + ((max_y - min_y) * {BOX_HI_PM}) // 1000 AS box_y_hi\n"
                "FROM k"
            ),
            "a": (
                "SELECT x, y, box_x_lo, box_x_hi, box_y_lo, box_y_hi, 'arrival' AS layout,\n"
                f"  ((event_id - min_id) * {N_FILES}) // (max_id - min_id + 1) AS file_id FROM z\n"
                "UNION ALL\n"
                "SELECT x, y, box_x_lo, box_x_hi, box_y_lo, box_y_hi, 'zorder' AS layout,\n"
                f"  (zkey * {N_FILES}) // {z_width} AS file_id FROM z"
            ),
            "pf": (
                "SELECT layout, file_id, COUNT(*) AS nrows,\n"
                "  MIN(x) AS fx_lo, MAX(x) AS fx_hi, MIN(y) AS fy_lo, MAX(y) AS fy_hi,\n"
                "  SUM(CASE WHEN x BETWEEN box_x_lo AND box_x_hi"
                " AND y BETWEEN box_y_lo AND box_y_hi THEN 1 ELSE 0 END) AS match_rows,\n"
                "  MIN(box_x_lo) AS box_x_lo, MIN(box_x_hi) AS box_x_hi,\n"
                "  MIN(box_y_lo) AS box_y_lo, MIN(box_y_hi) AS box_y_hi\n"
                "FROM a GROUP BY layout, file_id"
            ),
        },
        """
SELECT layout, CAST(COUNT(*) AS BIGINT) AS files_total,
  CAST(SUM(CASE WHEN fx_lo <= box_x_hi AND fx_hi >= box_x_lo
                 AND fy_lo <= box_y_hi AND fy_hi >= box_y_lo THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,
  CAST(SUM(nrows) AS BIGINT) AS rows_total,
  CAST(SUM(CASE WHEN fx_lo <= box_x_hi AND fx_hi >= box_x_lo
                 AND fy_lo <= box_y_hi AND fy_hi >= box_y_lo THEN nrows ELSE 0 END) AS BIGINT) AS rows_in_scanned_files,
  CAST(SUM(match_rows) AS BIGINT) AS matching_rows,
  CAST((SUM(CASE WHEN fx_lo <= box_x_hi AND fx_hi >= box_x_lo
                  AND fy_lo <= box_y_hi AND fy_hi >= box_y_lo THEN nrows ELSE 0 END) * 1000)
       // SUM(nrows) AS BIGINT) AS scan_pm
FROM pf GROUP BY layout ORDER BY layout
""".strip(),
    )
    return {"layout_pruning_report": sql}


def _layout_advisor_oracle() -> dict[str, str]:
    """Twin of operators/layout.layout_advisor_report: the same melt →
    modeled arrival files → per-column envelope/box scan model → the
    SAME threshold-and-rank decision rule, all integer arithmetic (every
    operand non-negative, so DuckDB `//` and Spark `div` agree) — the
    advisor's RECOMMENDATIONS themselves sit under the correctness
    gate."""
    from dataengineeringpipeline_spark.operators.layout import (
        ADVISOR_HI_PM,
        ADVISOR_LO_PM,
        BOX_HI_PM,
        BOX_LO_PM,
        N_FILES,
    )

    sql = _with(
        {
            "ev": EVENTS_BASE,
            "b": (
                "SELECT CAST(event_id AS BIGINT) AS rid,"
                " CAST(user_id AS BIGINT) AS user_id,"
                " CAST(floor(value * 100) AS BIGINT) AS value_cents,"
                " CAST(event_hour AS BIGINT) AS event_hour,"
                " CAST(ts_us AS BIGINT) AS ts_us FROM ev"
            ),
            "s": "SELECT MIN(rid) AS min_id, MAX(rid) AS max_id FROM b",
            "fb": (
                f"SELECT ((rid - min_id) * {N_FILES}) // (max_id - min_id + 1)"
                " AS file_id, user_id, value_cents, event_hour, ts_us FROM b, s"
            ),
            "m": (
                "SELECT file_id, 'user_id' AS col_name, 'point' AS kind, user_id AS val FROM fb"
                " UNION ALL SELECT file_id, 'value_cents', 'range', value_cents FROM fb"
                " UNION ALL SELECT file_id, 'event_hour', 'range', event_hour FROM fb"
                " UNION ALL SELECT file_id, 'ts_us', 'range', ts_us FROM fb"
            ),
            "pf": (
                "SELECT col_name, kind, file_id, COUNT(*) AS nrows,"
                " MIN(val) AS f_lo, MAX(val) AS f_hi FROM m GROUP BY 1, 2, 3"
            ),
            "gl": (
                "SELECT col_name, MIN(f_lo) AS g_lo, MAX(f_hi) AS g_hi"
                " FROM pf GROUP BY 1"
            ),
            "pfj": (
                "SELECT pf.*,\n"
                "  CASE WHEN kind = 'point' THEN g_lo + ((g_hi - g_lo) * 500) // 1000\n"
                f"       ELSE g_lo + ((g_hi - g_lo) * {BOX_LO_PM}) // 1000 END AS box_lo,\n"
                "  CASE WHEN kind = 'point' THEN g_lo + ((g_hi - g_lo) * 500) // 1000\n"
                f"       ELSE g_lo + ((g_hi - g_lo) * {BOX_HI_PM}) // 1000 END AS box_hi\n"
                "FROM pf JOIN gl USING (col_name)"
            ),
            "pc": (
                "SELECT col_name, kind, CAST(COUNT(*) AS BIGINT) AS files_total,\n"
                "  CAST(SUM(CASE WHEN f_lo <= box_hi AND f_hi >= box_lo THEN 1 ELSE 0 END) AS BIGINT) AS files_scanned,\n"
                "  CAST(SUM(nrows) AS BIGINT) AS rows_total,\n"
                "  CAST(SUM(CASE WHEN f_lo <= box_hi AND f_hi >= box_lo THEN nrows ELSE 0 END) AS BIGINT) AS rows_in_scanned_files\n"
                "FROM pfj GROUP BY 1, 2"
            ),
            "pc2": (
                "SELECT *, CAST((rows_in_scanned_files * 1000) // rows_total AS BIGINT) AS scan_pm,\n"
                f"  CASE WHEN kind = 'range' AND (rows_in_scanned_files * 1000) // rows_total > {ADVISOR_LO_PM}"
                " THEN 1 ELSE 0 END AS cand\nFROM pc"
            ),
            "rk": (
                "SELECT *, SUM(cand) OVER () AS n_cand,\n"
                "  ROW_NUMBER() OVER (ORDER BY cand DESC, scan_pm DESC, col_name ASC) AS rnk\nFROM pc2"
            ),
            "tp": (
                "SELECT *, MAX(CASE WHEN rnk = 1 THEN col_name END) OVER () AS top1,\n"
                "  MAX(CASE WHEN rnk = 2 THEN col_name END) OVER () AS top2\nFROM rk"
            ),
        },
        f"""
SELECT col_name, kind AS predicate, files_total, files_scanned, rows_total,
  rows_in_scanned_files, scan_pm,
  CASE WHEN kind = 'point' AND scan_pm >= {ADVISOR_HI_PM} THEN 'bloom_index'
       WHEN kind = 'point' THEN 'already_selective'
       WHEN cand = 0 THEN 'already_clustered'
       WHEN n_cand >= 2 AND rnk = 1 THEN 'zorder_with:' || top2
       WHEN n_cand >= 2 AND rnk = 2 THEN 'zorder_with:' || top1
       ELSE 'cluster_by' END AS recommendation
FROM tp ORDER BY col_name
""".strip(),
    )
    return {"layout_advisor_report": sql}


ORACLES.update(_layout_oracles())
ORACLES.update(_layout_advisor_oracle())


def _scale_prune_oracles() -> dict[str, str]:
    """Twins of scale.bloom_prune_stats and quality.category_drift."""
    from dataengineeringpipeline_spark.scale import BLOOM_K, BLOOM_M

    m, k = BLOOM_M, BLOOM_K
    js = ",".join(f"({j})" for j in range(k))
    probe_miss = " OR ".join(
        f"({_wh(f'{j}||' + chr(39) + ':' + chr(39) + '||CAST(o_custkey AS VARCHAR)')} % {m})"
        f" NOT IN (SELECT pos FROM pos)"
        for j in range(k)
    )
    bloom = f"""
WITH dimk AS (
  SELECT DISTINCT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
),
pos AS (
  SELECT DISTINCT {_wh("j||':'||CAST(c_custkey AS VARCHAR)")} % {m} AS pos
  FROM dimk, (VALUES {js}) js(j)
),
fact AS (
  SELECT o_custkey, NOT ({probe_miss}) AS passes,
    o_custkey IN (SELECT c_custkey FROM dimk) AS is_true
  FROM orders
)
SELECT CAST({m} AS INTEGER) AS m, CAST({k} AS INTEGER) AS k,
  (SELECT CAST(count(*) AS BIGINT) FROM dimk) AS n_keys,
  (SELECT CAST(count(*) AS BIGINT) FROM pos) AS bits_set,
  CAST(count(*) AS BIGINT) AS fact_rows,
  CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS passed_rows,
  CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS true_match_rows,
  CAST(sum(CASE WHEN passes AND NOT is_true THEN 1 ELSE 0 END) AS BIGINT) AS false_positive_rows,
  CAST(count(*) - sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS pruned_rows,
  CAST(sum(CASE WHEN passes AND NOT is_true THEN 1 ELSE 0 END) AS DOUBLE)
    / (count(*) - sum(CASE WHEN is_true THEN 1 ELSE 0 END)) AS fp_rate,
  CAST(count(*) - sum(CASE WHEN passes THEN 1 ELSE 0 END) AS DOUBLE) / count(*) AS pruned_frac
FROM fact
""".strip()
    drift = """
WITH per AS (
  SELECT o_orderpriority AS category,
    CAST(coalesce(sum(CASE WHEN o_orderdate < TIMESTAMP '1999-01-01' THEN 1 END),0) AS BIGINT) AS base_n,
    CAST(coalesce(sum(CASE WHEN NOT (o_orderdate < TIMESTAMP '1999-01-01') THEN 1 END),0) AS BIGINT) AS cur_n
  FROM orders GROUP BY 1
),
tot AS (
  SELECT per.*, CAST(sum(base_n) OVER () AS BIGINT) nb, CAST(sum(cur_n) OVER () AS BIGINT) nc FROM per
),
tot2 AS (
  SELECT tot.*, CAST(sum(abs(base_n*nc - cur_n*nb)) OVER () AS DOUBLE) sn FROM tot
)
SELECT category, base_n, cur_n,
  CASE WHEN nb > 0 AND nc > 0 THEN CAST(base_n AS DOUBLE)/CAST(nb AS DOUBLE) END AS base_share,
  CASE WHEN nb > 0 AND nc > 0 THEN CAST(cur_n AS DOUBLE)/CAST(nc AS DOUBLE) END AS cur_share,
  CASE WHEN nb > 0 AND nc > 0 THEN CAST(cur_n AS DOUBLE)/CAST(nc AS DOUBLE) - CAST(base_n AS DOUBLE)/CAST(nb AS DOUBLE) END AS share_delta,
  CASE WHEN nb > 0 AND nc > 0 THEN sn/(2.0*CAST(nb AS DOUBLE)*CAST(nc AS DOUBLE)) END AS tv_distance,
  CASE WHEN NOT (nb > 0 AND nc > 0) THEN 'undefined'
       WHEN sn/(2.0*CAST(nb AS DOUBLE)*CAST(nc AS DOUBLE)) < 0.1 THEN 'stable'
       WHEN sn/(2.0*CAST(nb AS DOUBLE)*CAST(nc AS DOUBLE)) < 0.25 THEN 'moderate'
       ELSE 'major' END AS drift_band
FROM tot2 ORDER BY category
""".strip()
    return {"bloom_join_prune": bloom, "priority_drift_report": drift}


ORACLES.update(_scale_prune_oracles())


def _cluster_mix_oracle() -> dict[str, str]:
    """Twin of similarity.cluster_label_mix (reuses the IVF assignment
    CTEs; the unused q/probes CTEs are dead code DuckDB ignores)."""
    from dataengineeringpipeline_spark.operators.similarity import (
        IVF_CENTROID_MOD,
        IVF_NPROBE,
    )

    cells = _IVF_CELLS.format(cmod=IVF_CENTROID_MOD, nprobe=IVF_NPROBE)
    sql = f"""
WITH n AS ({_EMB_NORMS}),
{cells}
SELECT centroid_id, label, n_vectors, cluster_n,
  CAST(n_vectors AS DOUBLE)/CAST(cluster_n AS DOUBLE) AS label_share,
  ROW_NUMBER() OVER (PARTITION BY centroid_id ORDER BY n_vectors DESC, label ASC) = 1 AS is_majority
FROM (
  SELECT centroid_id, label, CAST(count(*) AS BIGINT) AS n_vectors,
    CAST(sum(count(*)) OVER (PARTITION BY centroid_id) AS BIGINT) AS cluster_n
  FROM assign GROUP BY 1, 2
)
ORDER BY centroid_id, label
""".strip()
    return {"semantic_cluster_mix": sql}


ORACLES.update(_cluster_mix_oracle())


def _mix_drift_oracle() -> dict[str, str]:
    """Twin of streaming.streaming_mix_drift — the drained availableNow
    stream over the full backlog equals this batch computation exactly
    (same integer numerator, same division order)."""
    sql = f"""
WITH ev AS ({EVENTS_BASE}),
base AS (SELECT event_type, CAST(count(*) AS BIGINT) AS base_n FROM ev GROUP BY 1),
nbt AS (SELECT CAST(sum(base_n) AS BIGINT) AS nb FROM base),
win AS (
  SELECT (ts_us // 3600000000) * 3600000000 AS window_start_us, event_type,
    CAST(count(*) AS BIGINT) AS cnt
  FROM ev GROUP BY 1, 2
),
tot AS (SELECT window_start_us, CAST(sum(cnt) AS BIGINT) AS window_n FROM win GROUP BY 1),
terms AS (
  SELECT t.window_start_us, t.window_n,
    CAST(sum(abs(coalesce(w.cnt, 0) * nbt.nb - b.base_n * t.window_n)) AS DOUBLE) AS sn,
    max(nbt.nb) AS nb
  FROM tot t
  CROSS JOIN base b
  CROSS JOIN nbt
  LEFT JOIN win w ON w.window_start_us = t.window_start_us AND w.event_type = b.event_type
  GROUP BY 1, 2
)
SELECT window_start_us, window_n,
  sn/(2.0*CAST(window_n AS DOUBLE)*CAST(nb AS DOUBLE)) AS tv_distance,
  CASE WHEN sn/(2.0*CAST(window_n AS DOUBLE)*CAST(nb AS DOUBLE)) < 0.1 THEN 'stable'
       WHEN sn/(2.0*CAST(window_n AS DOUBLE)*CAST(nb AS DOUBLE)) < 0.25 THEN 'moderate'
       ELSE 'major' END AS drift_band
FROM terms
ORDER BY window_start_us
""".strip()
    return {"streaming_mix_drift": sql}


ORACLES.update(_mix_drift_oracle())


def _bpe_oracle() -> dict[str, str]:
    """Twins of operators.bpe.bpe_merge_table and bpe_subword_stats —
    the iterative merge loop unrolled as N chained MATERIALIZED CTE
    rounds (materialized: each vocab state is referenced twice per
    round; inlining would expand the chain exponentially). The vocab
    chain carries the original word so the subword-stats twin can join
    word occurrences to their final segmentation (bpe_segment applied
    per occurrence is the same function of (word, merge sequence))."""
    from dataengineeringpipeline_spark.operators.bpe import BPE_MERGES

    n = BPE_MERGES
    parts = [
        "WITH wf AS MATERIALIZED (",
        "  SELECT word, CAST(count(*) AS BIGINT) AS freq FROM (",
        r"    SELECT unnest(string_split_regex(trim(text), '\s+')) AS word FROM documents",
        "  ) WHERE word <> '' GROUP BY 1",
        "),",
        r"v0 AS MATERIALIZED (SELECT word, trim(regexp_replace(word, '(.)', '\1 ', 'g')) AS sym, freq FROM wf)",
    ]
    for r in range(n):
        parts.append(
            f", b{r} AS MATERIALIZED (SELECT pair, CAST(sum(freq) AS BIGINT) AS pair_count FROM ("
            f" SELECT unnest(list_transform(range(1, len(l)), i -> l[i] || ' ' || l[i+1])) AS pair, freq"
            f" FROM (SELECT string_split(sym, ' ') AS l, freq FROM v{r})"
            f") GROUP BY 1 ORDER BY pair_count DESC, pair ASC LIMIT 1)"
        )
        parts.append(
            f", v{r + 1} AS MATERIALIZED (SELECT word, trim(replace(' ' || sym || ' ',"
            f" ' ' || (SELECT pair FROM b{r}) || ' ',"
            f" ' ' || (SELECT replace(pair, ' ', '') FROM b{r}) || ' ')) AS sym, freq FROM v{r})"
        )
    chain = "\n".join(parts)
    union = " UNION ALL ".join(
        f"SELECT {r} AS merge_rank, pair, replace(pair, ' ', '') AS merged, pair_count FROM b{r}"
        for r in range(n)
    )
    merge_table = (
        f"{chain}\n SELECT CAST(merge_rank AS INTEGER) AS merge_rank, pair, merged, pair_count"
        f" FROM ({union}) ORDER BY merge_rank"
    )
    subword_stats = f"""{chain}
, occ AS (
  SELECT source, word FROM (
    SELECT source, unnest(string_split_regex(trim(text), '\\s+')) AS word FROM documents
  ) WHERE word <> ''
),
segged AS (SELECT word, CAST(len(string_split(sym, ' ')) AS BIGINT) AS subwords FROM v{n})
SELECT source, CAST(count(*) AS BIGINT) AS words,
  CAST(sum(s.subwords) AS BIGINT) AS subwords,
  CAST(sum(s.subwords) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS subwords_per_word
FROM occ o JOIN segged s USING (word)
GROUP BY source ORDER BY source"""
    return {"bpe_merge_table": merge_table, "bpe_subword_stats": subword_stats}


ORACLES.update(_bpe_oracle())


def _temperature_mix_oracle() -> dict[str, str]:
    """Twin of operators.mix.temperature_mix_summary (α=0.5 closed form:
    rate_d = √(n_min/n_d); sqrt and division are correctly-rounded IEEE
    ops, so the floats match bit for bit with no cross-domain float sum)."""
    sql = """
WITH counts AS (
  SELECT source AS domain, CAST(count(*) AS BIGINT) AS n_docs FROM documents GROUP BY 1
),
plan AS (
  SELECT domain, n_docs,
    CAST(floor(1000.0 * sqrt(CAST(min(n_docs) OVER () AS DOUBLE) / CAST(n_docs AS DOUBLE))) AS INTEGER) AS rate_pm
  FROM counts
),
kept AS (
  SELECT d.source AS domain, CAST(count(*) AS BIGINT) AS kept_docs
  FROM documents d JOIN plan p ON d.source = p.domain
  WHERE ((d.doc_id % 1000003) * 2654435761) % 1000 < p.rate_pm
  GROUP BY 1
),
j AS (
  SELECT p.domain, p.n_docs, p.rate_pm, coalesce(k.kept_docs, 0) AS kept_docs
  FROM plan p LEFT JOIN kept k USING (domain)
),
t AS (
  SELECT j.*, CAST(sum(n_docs) OVER () AS BIGINT) AS tr,
    CAST(sum(kept_docs) OVER () AS BIGINT) AS tk
  FROM j
)
SELECT domain, n_docs,
  CAST(n_docs AS DOUBLE) / CAST(tr AS DOUBLE) AS raw_share,
  rate_pm, kept_docs,
  CAST(kept_docs AS DOUBLE) / CAST(tk AS DOUBLE) AS kept_share
FROM t ORDER BY domain
""".strip()
    return {"temperature_mix_summary": sql}


ORACLES.update(_temperature_mix_oracle())


def _quality_sample_oracle() -> dict[str, str]:
    """Twin of operators.sampling.quality_sample_summary — the quality
    score is the oracle-exact integer from the text_quality chain and
    membership is the shared per-mille doc_id hash."""
    sql = _with(
        {"base": TEXT_STATS, "stats": _TEXT_STATS_DERIVED},
        """
SELECT band, n_docs, kept_docs,
  CAST(kept_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS keep_rate,
  CAST(score_sum AS DOUBLE) / (100.0 * CAST(n_docs AS DOUBLE)) AS expected_rate
FROM (
  SELECT CAST((quality_score // 10) * 10 AS INTEGER) AS band,
    CAST(count(*) AS BIGINT) AS n_docs,
    CAST(sum(CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 < quality_score * 10
             THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
    CAST(sum(quality_score) AS BIGINT) AS score_sum
  FROM ("""
        + _QUALITY_BODY
        + """)
  GROUP BY 1
)
ORDER BY band
""".strip(),
    )
    return {"quality_sample_summary": sql}


ORACLES.update(_quality_sample_oracle())


def _retrieval_linkage_oracles() -> dict[str, str]:
    """Twins of search.hybrid_search_topk, linkage.fuzzy_matches /
    entity_resolution_report, classify.classifier_calibration, and
    scale.skew_join_segment_summary (the skew-split join's oracle is the
    PLAIN join — the operator must be result-identical to it)."""
    from dataengineeringpipeline_spark.operators.classify import (
        _MULT,
        _WEIGHT_MOD,
        _WEIGHT_SHIFT,
        N_BUCKETS,
    )
    from dataengineeringpipeline_spark.operators.linkage import MAX_BLOCK
    from dataengineeringpipeline_spark.operators.search import (
        RRF_K0,
        RRF_SCALE,
        WEIGHT_SCALE,
    )

    # -- hybrid RRF retrieval (lex list_k=20 ∪ sem list_k=20 → top 10) --
    lex_ctes = {
        "ct": (
            "SELECT doc_id, unnest(list_distinct(ws)) AS term "
            f"FROM (SELECT doc_id, {_W} AS ws FROM documents WHERE doc_id % 100 <> 0)"
        ),
        "nrow": "SELECT COUNT(DISTINCT doc_id) AS n_docs FROM ct",
        "wts": (
            f"SELECT term, CAST((n_docs * {WEIGHT_SCALE}) // df AS BIGINT) AS weight "
            "FROM (SELECT term, COUNT(*) AS df FROM ct GROUP BY term), nrow"
        ),
        "qt": (
            "SELECT doc_id AS query_id, unnest(list_distinct(ws)) AS term "
            f"FROM (SELECT doc_id, {_W} AS ws FROM documents WHERE doc_id % 100 = 0)"
        ),
        "m": (
            "SELECT q.query_id, c.doc_id, CAST(SUM(w.weight) AS BIGINT) AS score\n"
            "FROM qt q JOIN wts w USING (term) JOIN ct c USING (term)\n"
            "GROUP BY q.query_id, c.doc_id"
        ),
        "lex": (
            "SELECT query_id, doc_id, CAST(rank AS INTEGER) AS lex_rank FROM ("
            " SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id"
            " ORDER BY score DESC, doc_id ASC) AS rank FROM m) WHERE rank <= 20"
        ),
        "n": _EMB_NORMS,
        "sem": (
            "SELECT query_id, neighbor_id AS doc_id, CAST(rank AS INTEGER) AS sem_rank FROM (\n"
            "  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id"
            " ORDER BY cosine DESC, neighbor_id ASC) AS rank FROM (\n"
            "    SELECT q.query_id, n.vec_id AS neighbor_id,\n"
            "      list_reduce(list_transform(range(1, 65), i -> q.qe[i] * n.e[i]),"
            " (a, b) -> a + b) / (q.qn * n.nrm) AS cosine\n"
            "    FROM (SELECT vec_id AS query_id, e AS qe, nrm AS qn FROM n"
            " WHERE vec_id % 100 = 0) q\n"
            "    JOIN n ON n.vec_id <> q.query_id\n"
            "  )\n"
            ") WHERE rank <= 20"
        ),
        "fused": (
            "SELECT COALESCE(l.query_id, s.query_id) AS query_id,"
            " COALESCE(l.doc_id, s.doc_id) AS doc_id, l.lex_rank, s.sem_rank,\n"
            f"  CAST(COALESCE({RRF_SCALE} // ({RRF_K0} + l.lex_rank), 0)"
            f" + COALESCE({RRF_SCALE} // ({RRF_K0} + s.sem_rank), 0) AS BIGINT) AS rrf_score\n"
            "FROM lex l FULL OUTER JOIN sem s"
            " ON l.query_id = s.query_id AND l.doc_id = s.doc_id"
        ),
    }
    hybrid = _with(
        lex_ctes,
        """
SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score, CAST(rank AS INTEGER) AS rank FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused
) WHERE rank <= 10 ORDER BY query_id, rank
""".strip(),
    )

    # -- RAG context pack over the hybrid top-3 -------------------------
    rag_sql = _with(
        {
            **lex_ctes,
            "ranked": (
                "SELECT query_id, doc_id, rrf_score, rank FROM ("
                " SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id"
                " ORDER BY rrf_score DESC, doc_id ASC) AS rank"
                " FROM fused) WHERE rank <= 3"
            ),
            "tok": (
                f"SELECT doc_id, len(regexp_extract_all(text, '{_TOKEN_RE}')) AS tokens "
                "FROM documents"
            ),
        },
        """
SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_ctx, CAST(SUM(t.tokens) AS BIGINT) AS ctx_tokens,
  CAST(MAX(r.rrf_score) AS BIGINT) AS best_rrf, arg_min(r.doc_id, r.rank) AS top_doc_id
FROM ranked r JOIN tok t USING (doc_id) GROUP BY query_id ORDER BY query_id
""".strip(),
    )

    # -- fuzzy record linkage over the part-name vocabulary -------------
    linkage_ctes = {
        "names": (
            "SELECT p_name AS rec_name, MIN(p_partkey) AS name_id "
            "FROM part GROUP BY p_name"
        ),
        "toks": (
            "SELECT name_id, rec_name, block FROM ("
            " SELECT name_id, rec_name,"
            " unnest(list_distinct(string_split_regex(rec_name, ' +'))) AS block"
            " FROM names) WHERE block <> ''"
        ),
        "tf": (
            "SELECT t.name_id, t.rec_name, t.block FROM toks t JOIN ("
            f" SELECT block FROM toks GROUP BY block HAVING COUNT(*) <= {MAX_BLOCK}"
            ") b USING (block)"
        ),
        "cand": (
            "SELECT DISTINCT a.name_id AS a_id, b.name_id AS b_id,"
            " a.rec_name AS a_name, b.rec_name AS b_name\n"
            "FROM tf a JOIN tf b ON a.block = b.block AND a.name_id < b.name_id"
        ),
        "fpairs": (
            "SELECT a_id, b_id, a_name, b_name,"
            " CAST(levenshtein(a_name, b_name) AS INTEGER) AS distance\n"
            "FROM cand WHERE levenshtein(a_name, b_name) <= 2"
        ),
    }
    fuzzy_matches_sql = _with(
        linkage_ctes, "SELECT * FROM fpairs ORDER BY a_id, b_id"
    )

    # -- two-table fuzzy join: perturbed batch vs the part catalog ------
    # Twin of linkage.fuzzy_join via __spark_entry__._fuzzy_join_matches:
    # batch = every 40th part, name truncated by one char for every 80th;
    # both sides collapse to name vocabularies, token-blocked candidates,
    # Levenshtein <= 2, then best-only resolution AFTER the record join
    # (min distance per left name at vocab level keeps distance ties; the
    # record-level row_number breaks them on the real right key).
    fuzzy_join_sql = _with(
        {
            "batch": (
                "SELECT p_partkey AS batch_key,"
                " CASE WHEN p_partkey % 80 = 0"
                " THEN substr(p_name, 1, length(p_name) - 1)"
                " ELSE p_name END AS batch_name "
                "FROM part WHERE p_partkey % 40 = 0"
            ),
            "lv": (
                "SELECT batch_name AS l_name, MIN(batch_key) AS l_id "
                "FROM batch GROUP BY batch_name"
            ),
            "rv": (
                "SELECT p_name AS r_name, MIN(p_partkey) AS r_id "
                "FROM part GROUP BY p_name"
            ),
            "lt": (
                "SELECT l_id, l_name, block FROM ("
                " SELECT l_id, l_name,"
                " unnest(list_distinct(string_split_regex(l_name, ' +'))) AS block"
                " FROM lv) WHERE block <> ''"
            ),
            "ltf": (
                "SELECT t.l_id, t.l_name, t.block FROM lt t JOIN ("
                f" SELECT block FROM lt GROUP BY block HAVING COUNT(*) <= {MAX_BLOCK}"
                ") g USING (block)"
            ),
            "rt": (
                "SELECT r_id, r_name, block FROM ("
                " SELECT r_id, r_name,"
                " unnest(list_distinct(string_split_regex(r_name, ' +'))) AS block"
                " FROM rv) WHERE block <> ''"
            ),
            "rtf": (
                "SELECT t.r_id, t.r_name, t.block FROM rt t JOIN ("
                f" SELECT block FROM rt GROUP BY block HAVING COUNT(*) <= {MAX_BLOCK}"
                ") g USING (block)"
            ),
            "cand": (
                "SELECT DISTINCT l.l_id, l.l_name, r.r_id, r.r_name\n"
                "FROM ltf l JOIN rtf r USING (block)"
            ),
            "dist": (
                "SELECT *, levenshtein(l_name, r_name) AS distance "
                "FROM cand WHERE levenshtein(l_name, r_name) <= 2"
            ),
            "best": (
                "SELECT * FROM (SELECT *,"
                " MIN(distance) OVER (PARTITION BY l_id) AS md FROM dist)"
                " WHERE distance = md"
            ),
            "recs": (
                "SELECT b.batch_key AS left_key, p.p_partkey AS right_key,"
                " b.batch_name AS left_name, p.p_name AS right_name,"
                " CAST(d.distance AS INTEGER) AS distance\n"
                "FROM batch b JOIN best d ON b.batch_name = d.l_name"
                " JOIN part p ON p.p_name = d.r_name"
            ),
        },
        """
SELECT left_key, right_key, left_name, right_name, distance FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY left_key ORDER BY distance, right_key) AS rn
  FROM recs
) WHERE rn = 1 ORDER BY left_key, right_key
""".strip(),
    )

    er_ctes = {
        **linkage_ctes,
        "und": (
            "SELECT a_id AS src, b_id AS dst FROM fpairs "
            "UNION SELECT b_id AS src, a_id AS dst FROM fpairs"
        ),
        "reach(src, dst)": (
            "SELECT src, src AS dst FROM und UNION SELECT src, dst FROM und\n"
            "  UNION SELECT r.src, u.dst FROM reach r JOIN und u ON r.dst = u.src"
        ),
        "clusters": (
            "SELECT src AS name_id, MIN(dst) AS entity_id FROM reach GROUP BY src"
        ),
        "assigned": (
            "SELECT n.rec_name, n.name_id, c.entity_id "
            "FROM names n JOIN clusters c USING (name_id)"
        ),
        "per_entity": (
            "SELECT entity_id, CAST(COUNT(*) AS BIGINT) AS n_names,"
            " arg_min(rec_name, name_id) AS canonical_name "
            "FROM assigned GROUP BY entity_id"
        ),
        "rec_counts": (
            "SELECT a.entity_id, CAST(COUNT(*) AS BIGINT) AS n_records "
            "FROM part p JOIN assigned a ON p.p_name = a.rec_name "
            "GROUP BY a.entity_id"
        ),
        "pair_ent": (
            "SELECT a.entity_id, CAST(MAX(f.distance) AS INTEGER) AS max_distance "
            "FROM fpairs f JOIN assigned a ON a.name_id = f.a_id GROUP BY a.entity_id"
        ),
    }
    parts = ",\n".join(f"{n} AS (\n{s}\n)" for n, s in er_ctes.items())
    er_report_sql = (
        f"WITH RECURSIVE {parts}\n"
        "SELECT e.entity_id, e.n_names, r.n_records, e.canonical_name, pe.max_distance\n"
        "FROM per_entity e JOIN rec_counts r USING (entity_id)"
        " JOIN pair_ent pe USING (entity_id)\n"
        "ORDER BY n_records DESC, entity_id"
    )

    # -- classifier calibration vs the heuristic quality gate -----------
    weight = (
        f"(({_wh('t')} % {N_BUCKETS}) * {_MULT}) % {_WEIGHT_MOD} - {_WEIGHT_SHIFT}"
    )
    calibration_sql = _with(
        {
            "feats": (
                "SELECT doc_id, list_concat(ws,"
                " list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1])) AS fs "
                f"FROM (SELECT doc_id, {_W} AS ws FROM documents)"
            ),
            "scored": (
                "SELECT doc_id, len(fs) AS n_features,\n"
                f"  list_reduce(list_transform(fs, t -> {weight}), (a, b) -> a + b) AS score_sum\n"
                "FROM feats"
            ),
            "base": TEXT_STATS,
            "stats": _TEXT_STATS_DERIVED,
            "q": _QUALITY_BODY,
            "binned": (
                "SELECT s.doc_id,"
                " CASE WHEN s.n_features > 0 THEN CAST(((s.score_sum * 10"
                " + 500 * s.n_features) // s.n_features) // 100 AS INTEGER) END AS score_bin,\n"
                "  s.score_sum >= 0 AS keep, q.quality_score >= 70 AS is_high_quality\n"
                "FROM scored s JOIN q ON q.doc_id = s.doc_id"
            ),
        },
        """
SELECT score_bin,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS classifier_keep,
  CAST(SUM(CASE WHEN is_high_quality THEN 1 ELSE 0 END) AS BIGINT) AS high_quality,
  CAST(SUM(CASE WHEN is_high_quality THEN 1 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS high_quality_rate
FROM binned GROUP BY score_bin ORDER BY score_bin
""".strip(),
    )

    # -- skew-split join contract: oracle is the PLAIN join + rollup ----
    skew_sql = f"""
SELECT c.c_mktsegment,
  CAST(COUNT(*) AS BIGINT) AS events,
  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS users,
  {money_sum_sql('e.value')} AS total_value
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment
""".strip()

    return {
        "hybrid_search_topk": hybrid,
        "rag_context_stats": rag_sql,
        "fuzzy_part_matches": fuzzy_matches_sql,
        "fuzzy_join_matches": fuzzy_join_sql,
        "entity_resolution_report": er_report_sql,
        "classifier_calibration": calibration_sql,
        "skew_join_segment_summary": skew_sql,
    }


ORACLES.update(_retrieval_linkage_oracles())


def _shard_oracles() -> dict[str, str]:
    """Twin of corpus.shard_balance_report (seed 0, 16 shards)."""
    from dataengineeringpipeline_spark.operators.corpus import N_SHARDS

    h = _wh("'0:' || CAST(doc_id AS VARCHAR)")
    sql = _with(
        {
            "toks": (
                f"SELECT doc_id, CAST(len(regexp_extract_all(text, '{_TOKEN_RE}')) AS BIGINT) AS tokens "
                "FROM documents"
            ),
            "asg": f"SELECT doc_id, CAST({h} % {N_SHARDS} AS INTEGER) AS shard FROM documents",
            "per": (
                "SELECT shard, CAST(COUNT(*) AS BIGINT) AS docs,"
                " CAST(SUM(tokens) AS BIGINT) AS tokens "
                "FROM asg JOIN toks USING (doc_id) GROUP BY shard"
            ),
            "tot": (
                "SELECT CAST(SUM(docs) AS BIGINT) AS t_docs,"
                " CAST(SUM(tokens) AS BIGINT) AS t_tokens FROM per"
            ),
        },
        """
SELECT shard, docs, tokens,
  CAST((docs * 1000) // t_docs AS BIGINT) AS docs_pm,
  CAST((tokens * 1000) // t_tokens AS BIGINT) AS tokens_pm
FROM per, tot ORDER BY shard
""".strip(),
    )
    return {"shard_balance_report": sql}


ORACLES.update(_shard_oracles())


def _fluency_oracles() -> dict[str, str]:
    """Twin of classify.bigram_fluency (integer per-mille conditional
    bigram frequencies, NULL for <2-word docs)."""
    from dataengineeringpipeline_spark.operators.classify import FLUENCY_SCALE

    sql = _with(
        {
            "docw": f"SELECT doc_id, source, {_W} AS ws FROM documents",
            "uni": (
                "SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM ("
                " SELECT unnest(ws) AS w FROM docw) GROUP BY w"
            ),
            "pairs": (
                "SELECT doc_id, ws[i] AS w, ws[i + 1] AS w2 FROM ("
                " SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM docw)"
            ),
            "bi": (
                "SELECT w, w2, CAST(COUNT(*) AS BIGINT) AS c2 "
                "FROM pairs GROUP BY w, w2"
            ),
            "scored": (
                "SELECT p.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,\n"
                f"  CAST(SUM((b.c2 * {FLUENCY_SCALE}) // u.c1) AS BIGINT) AS fluency_sum\n"
                "FROM pairs p JOIN bi b USING (w, w2) JOIN uni u USING (w)\n"
                "GROUP BY p.doc_id"
            ),
        },
        """
SELECT d.doc_id, d.source, s.n_bigrams, s.fluency_sum,
  CAST(s.fluency_sum // s.n_bigrams AS BIGINT) AS fluency_pm
FROM documents d LEFT JOIN scored s USING (doc_id) ORDER BY d.doc_id
""".strip(),
    )
    return {"bigram_fluency": sql}


ORACLES.update(_fluency_oracles())


def _ensemble_oracles() -> dict[str, str]:
    """Twin of classify.quality_gate_ensemble: the heuristic quality
    CTEs, the classifier feature-hash CTEs, and the fluency count CTEs
    composed per doc_id, majority-voted, aggregated per source."""
    from dataengineeringpipeline_spark.operators.classify import (
        _MULT,
        _WEIGHT_MOD,
        _WEIGHT_SHIFT,
        FLUENCY_GATE_PM,
        FLUENCY_SCALE,
        N_BUCKETS,
    )

    weight = f"(({_wh('t')} % {N_BUCKETS}) * {_MULT}) % {_WEIGHT_MOD} - {_WEIGHT_SHIFT}"
    sql = _with(
        {
            "base": TEXT_STATS,
            "stats": _TEXT_STATS_DERIVED,
            "q": _QUALITY_BODY,
            "feats": (
                "SELECT doc_id, list_concat(ws,"
                " list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1])) AS fs "
                f"FROM (SELECT doc_id, {_W} AS ws FROM documents)"
            ),
            "cls": (
                "SELECT doc_id,"
                f" list_reduce(list_transform(fs, t -> {weight}), (a, b) -> a + b) AS score_sum"
                " FROM feats"
            ),
            "docw": f"SELECT doc_id, {_W} AS ws FROM documents",
            "uni": (
                "SELECT w, CAST(COUNT(*) AS BIGINT) AS c1 FROM ("
                " SELECT unnest(ws) AS w FROM docw) GROUP BY w"
            ),
            "fpairs": (
                "SELECT doc_id, ws[i] AS w, ws[i + 1] AS w2 FROM ("
                " SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM docw)"
            ),
            "fbi": (
                "SELECT w, w2, CAST(COUNT(*) AS BIGINT) AS c2 FROM fpairs GROUP BY w, w2"
            ),
            "flu": (
                "SELECT doc_id,"
                f" CAST(SUM((b.c2 * {FLUENCY_SCALE}) // u.c1) AS BIGINT)"
                " // CAST(COUNT(*) AS BIGINT) AS fluency_pm\n"
                "FROM fpairs p JOIN fbi b USING (w, w2) JOIN uni u USING (w)\n"
                "GROUP BY doc_id"
            ),
            "per": (
                "SELECT q.source,\n"
                "  CASE WHEN q.quality_score >= 70 THEN 1 ELSE 0 END AS g_heur,\n"
                "  CASE WHEN c.score_sum >= 0 THEN 1 ELSE 0 END AS g_cls,\n"
                f"  CASE WHEN f.fluency_pm >= {FLUENCY_GATE_PM} THEN 1 ELSE 0 END AS g_flu\n"
                "FROM q JOIN cls c ON c.doc_id = q.doc_id\n"
                "LEFT JOIN flu f ON f.doc_id = q.doc_id"
            ),
        },
        """
SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(g_cls) AS BIGINT) AS cls_pass,
  CAST(SUM(g_heur) AS BIGINT) AS heur_pass,
  CAST(SUM(g_flu) AS BIGINT) AS flu_pass,
  CAST(SUM(CASE WHEN g_heur + g_cls + g_flu >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS ensemble_keep,
  CAST(SUM(CASE WHEN g_heur + g_cls + g_flu = 3 THEN 1 ELSE 0 END) AS BIGINT) AS unanimous_keep,
  CAST(SUM(CASE WHEN g_heur + g_cls + g_flu = 0 THEN 1 ELSE 0 END) AS BIGINT) AS unanimous_reject,
  CAST((SUM(CASE WHEN g_heur + g_cls + g_flu >= 2 THEN 1 ELSE 0 END) * 1000) // COUNT(*) AS BIGINT) AS keep_pm
FROM per GROUP BY source ORDER BY source
""".strip(),
    )
    return {"quality_gate_ensemble": sql}


ORACLES.update(_ensemble_oracles())


def _table_stats_oracles() -> dict[str, str]:
    """Twin of quality.table_stats on the orders table (exact mode).
    Numeric/timestamp min-max normalize into one double domain
    (timestamps as epoch µs); strings report lexicographic min/max and
    mean length."""
    specs = [
        ("o_orderkey", "num"),
        ("o_custkey", "num"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "num"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ]
    blocks = []
    for c, kind in specs:
        if kind == "num":
            mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
            mns = mxs = "CAST(NULL AS VARCHAR)"
            sl = "CAST(NULL AS BIGINT)"
        elif kind == "ts":
            mn = f"CAST(epoch_us(CAST(MIN({c}) AS TIMESTAMP)) AS DOUBLE)"
            mx = f"CAST(epoch_us(CAST(MAX({c}) AS TIMESTAMP)) AS DOUBLE)"
            mns = mxs = "CAST(NULL AS VARCHAR)"
            sl = "CAST(NULL AS BIGINT)"
        else:
            mn = mx = "CAST(NULL AS DOUBLE)"
            mns, mxs = f"MIN({c})", f"MAX({c})"
            sl = f"CAST(SUM(length({c})) AS BIGINT)"
        blocks.append(
            f"SELECT '{c}' AS column_name, CAST(COUNT({c}) AS BIGINT) AS non_null,\n"
            f"  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv, {mn} AS min_num, {mx} AS max_num,\n"
            f"  {mns} AS min_str, {mxs} AS max_str, {sl} AS sum_len FROM orders"
        )
    sql = _with(
        {
            "t": 'SELECT CAST(COUNT(*) AS BIGINT) AS "rows" FROM orders',
            "u": "\nUNION ALL\n".join(blocks),
        },
        """
SELECT column_name, "rows", non_null, CAST("rows" - non_null AS BIGINT) AS nulls, ndv,
  min_num, max_num, min_str, max_str,
  CAST(sum_len AS DOUBLE) / CAST(non_null AS DOUBLE) AS avg_len
FROM u, t ORDER BY column_name
""".strip(),
    )
    return {"table_stats_report": sql}


ORACLES.update(_table_stats_oracles())


def _advisor_oracles() -> dict[str, str]:
    """Twin of scale.join_strategy_advisor at the contract call's demo
    thresholds (512 KiB / 5 pm). Dim widths are the EST_TYPE_BYTES sums
    for each table's schema: customer 8+20+4+8+20 = 60, orders
    8+8+20+8+8+20 = 72, events 8+8+8+20+8+20 = 72."""
    bb, hk = 512 * 1024, 5
    joins = [
        ("orders", "o_custkey", "customer", "c_custkey", 60),
        ("lineitem", "l_orderkey", "orders", "o_orderkey", 72),
        ("events", "user_id", "events", "user_id", 72),
    ]
    ctes, selects = {}, []
    for i, (ft, fk, dt, dk, width) in enumerate(joins):
        ctes[f"f{i}"] = (
            "SELECT CAST(MAX(c) AS BIGINT) AS top_key_rows, CAST(SUM(c) AS BIGINT) AS fact_rows"
            f" FROM (SELECT COUNT(*) AS c FROM {ft} GROUP BY {fk})"
        )
        ctes[f"d{i}"] = f"SELECT CAST(COUNT(*) AS BIGINT) AS dim_rows FROM {dt}"
        selects.append(
            f"SELECT '{ft}' AS fact_table, '{dt}' AS dim_table, '{fk}={dk}' AS join_key,\n"
            f"  fact_rows, dim_rows, CAST(dim_rows * {width} AS BIGINT) AS dim_est_bytes,\n"
            "  top_key_rows, CAST(CASE WHEN fact_rows > 0"
            " THEN (top_key_rows * 1000) // fact_rows ELSE 0 END AS BIGINT) AS top_key_pm\n"
            f"FROM f{i}, d{i}"
        )
    ctes["u"] = "\nUNION ALL\n".join(selects)
    sql = _with(
        ctes,
        f"""
SELECT *, CASE WHEN dim_est_bytes <= {bb} THEN 'broadcast'
               WHEN top_key_pm >= {hk} THEN 'hot_key_split'
               ELSE 'shuffle_hash' END AS strategy
FROM u ORDER BY fact_table, dim_table
""".strip(),
    )
    return {"join_strategy_advisor": sql}


ORACLES.update(_advisor_oracles())


def _advisor_from_stats_oracles() -> dict[str, str]:
    """Twin of the ANALYZE-fed advisor: the stats CTE reproduces
    scale.analyze_join_keys row-for-row, the advice derives from it
    alone — structurally the same two-step loop the Spark side runs
    (same demo thresholds and dim widths as join_strategy_advisor)."""
    bb, hk = 512 * 1024, 5
    stats_entries = [
        ("orders", "o_custkey"),
        ("orders", "o_orderkey"),
        ("lineitem", "l_orderkey"),
        ("customer", "c_custkey"),
        ("events", "user_id"),
    ]
    ks = "\nUNION ALL\n".join(
        f"SELECT '{t}' AS table_name, '{c}' AS column_name,"
        " CAST(COALESCE(SUM(n), 0) AS BIGINT) AS nrows,"
        " CAST(COUNT(*) AS BIGINT) AS ndv,"
        " CAST(COALESCE(MAX(n), 0) AS BIGINT) AS top_key_rows"
        f" FROM (SELECT COUNT(*) AS n FROM {t} GROUP BY {c})"
        for t, c in stats_entries
    )
    joins = [
        ("orders", "o_custkey", "customer", "c_custkey", 60),
        ("lineitem", "l_orderkey", "orders", "o_orderkey", 72),
        ("events", "user_id", "events", "user_id", 72),
    ]
    meta = "\nUNION ALL\n".join(
        f"SELECT '{ft}' AS fact_table, '{fk}' AS fact_key, '{dt}' AS dim_table,"
        f" '{dk}' AS dim_key, {w} AS dim_row_bytes"
        for ft, fk, dt, dk, w in joins
    )
    sql = _with(
        {
            "ks": ks,
            "meta": meta,
            "j": """
SELECT m.fact_table, m.dim_table, m.fact_key || '=' || m.dim_key AS join_key,
       f.nrows AS fact_rows, d.nrows AS dim_rows,
       CAST(d.nrows * m.dim_row_bytes AS BIGINT) AS dim_est_bytes,
       f.top_key_rows,
       CAST(CASE WHEN f.nrows > 0 THEN (f.top_key_rows * 1000) // f.nrows
                 ELSE 0 END AS BIGINT) AS top_key_pm
FROM meta m
JOIN ks f ON f.table_name = m.fact_table AND f.column_name = m.fact_key
JOIN ks d ON d.table_name = m.dim_table AND d.column_name = m.dim_key
""".strip(),
        },
        f"""
SELECT *, CASE WHEN dim_est_bytes <= {bb} THEN 'broadcast'
               WHEN top_key_pm >= {hk} THEN 'hot_key_split'
               ELSE 'shuffle_hash' END AS strategy
FROM j ORDER BY fact_table, dim_table
""".strip(),
    )
    return {"advisor_from_stats": sql}


ORACLES.update(_advisor_from_stats_oracles())


def _purge_oracles() -> dict[str, str]:
    """Twin of datalake.forget_users_report: the opt-out cohort is the
    deterministic rule user_id % 97 = 0, so every audit count — and the
    zero-remaining erasure proof — is predictable from the events table
    without seeing the mutated lake."""
    sql = _with(
        {
            "o": (
                "SELECT COUNT(*) AS n,"
                " SUM(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END) AS r FROM events"
            ),
            "g": (
                "SELECT COUNT(DISTINCT user_id) AS n,"
                " COUNT(DISTINCT CASE WHEN user_id % 97 = 0 THEN user_id END) AS r"
                " FROM events"
            ),
        },
        """
SELECT 'bronze.events_raw' AS table_name, CAST(n AS BIGINT) AS rows_before,
  CAST(r AS BIGINT) AS rows_removed, CAST(n - r AS BIGINT) AS rows_after,
  CAST(0 AS BIGINT) AS remaining_optout_rows FROM o
UNION ALL
SELECT 'gold.user_activity', CAST(n AS BIGINT), CAST(r AS BIGINT),
  CAST(n - r AS BIGINT), CAST(0 AS BIGINT) FROM g
ORDER BY table_name
""".strip(),
    )
    return {"forget_users_report": sql}


ORACLES.update(_purge_oracles())


def _lang_mix_oracles() -> dict[str, str]:
    """Twin of text.language_mix_by_source."""
    sql = _with(
        {
            "scores": _lang_hits_sql(),
            "pred": _LANG_PRED,
            "per": (
                "SELECT d.source, p.predicted_lang, CAST(COUNT(*) AS BIGINT) AS docs "
                "FROM pred p JOIN documents d USING (doc_id) "
                "GROUP BY d.source, p.predicted_lang"
            ),
        },
        """
SELECT source, predicted_lang, docs,
  CAST((docs * 1000) // SUM(docs) OVER (PARTITION BY source) AS BIGINT) AS docs_pm
FROM per ORDER BY source, predicted_lang
""".strip(),
    )
    return {"language_mix_by_source": sql}


ORACLES.update(_lang_mix_oracles())


def _numeric_drift_oracles() -> dict[str, str]:
    """Twin of quality.numeric_drift over events.value split mid-month."""
    from dataengineeringpipeline_spark.quality import DRIFT_PERCENTILES

    split_us = 19_738 * 86_400_000_000  # 2024-01-16 00:00 UTC in µs
    plist = "[" + ", ".join(str(p) for p in DRIFT_PERCENTILES) + "]"
    q = "quantile_cont(CAST(round(value * 100) AS BIGINT), " + plist + ")"
    sql = _with(
        {
            "ev": EVENTS_BASE,
            "b": f"SELECT {q} AS qs FROM ev WHERE ts_us < {split_us}",
            "c": f"SELECT {q} AS qs FROM ev WHERE ts_us >= {split_us}",
        },
        f"""
SELECT p, base_q, cur_q, abs(cur_q - base_q) AS abs_gap FROM (
  SELECT unnest({plist}) AS p, unnest(b.qs) AS base_q, unnest(c.qs) AS cur_q FROM b, c
) ORDER BY p
""".strip(),
    )
    return {"value_drift_report": sql}


ORACLES.update(_numeric_drift_oracles())


# streaming_search_topk merges streamed posting/count state that is, by
# construction, identical to the batch index — same oracle as the inline op.
ORACLES["streaming_search_topk"] = ORACLES["lexical_search_topk"]


def _streaming_gate_sql() -> str:
    """Twin of streaming.streaming_quality_gate: the arrival batch is the
    deterministic ``doc_id % 3`` split, the decision the same integer
    classifier arithmetic as _classifier_summary_sql."""
    from dataengineeringpipeline_spark.operators.classify import (
        _MULT,
        _WEIGHT_MOD,
        _WEIGHT_SHIFT,
        N_BUCKETS,
    )

    weight = (
        f"(({_wh('t')} % {N_BUCKETS}) * {_MULT}) % {_WEIGHT_MOD} - {_WEIGHT_SHIFT}"
    )
    return _with(
        {
            "feats": (
                "SELECT doc_id, source, list_concat(ws,"
                " list_transform(range(1, len(ws)), i -> ws[i] || '_' || ws[i+1])) AS fs "
                f"FROM (SELECT doc_id, source, {_W} AS ws FROM documents)"
            ),
            "scored": (
                "SELECT doc_id % 3 AS arrival_batch, source,\n"
                f"  list_reduce(list_transform(fs, t -> {weight}), (a, b) -> a + b) AS score_sum\n"
                "FROM feats"
            ),
        },
        """
SELECT CAST(arrival_batch AS BIGINT) AS arrival_batch, source,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(CASE WHEN score_sum >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS kept_docs,
  CAST(SUM(CASE WHEN score_sum < 0 THEN 1 ELSE 0 END) AS BIGINT) AS quarantined_docs,
  CAST(SUM(CASE WHEN score_sum >= 0 THEN 1 ELSE 0 END) AS DOUBLE)
    / CAST(COUNT(*) AS DOUBLE) AS keep_rate,
  CAST(SUM(score_sum) AS BIGINT) AS total_score
FROM scored GROUP BY arrival_batch, source ORDER BY arrival_batch, source
""".strip(),
    )


ORACLES["streaming_quality_gate"] = _streaming_gate_sql()

# streaming_ann_topk drains per-batch encodings against frozen quantizers
# that are, by construction, identical to the batch-materialized index —
# same oracle as the inline IVF+PQ query.
ORACLES["streaming_ann_topk"] = ORACLES["ann_ivfpq_topk"]


def _datacard_sql() -> str:
    """Twin of operators/corpus.corpus_datacard — quality/stats CTEs
    shared with the text oracles, the dup flag a window over md5(text)."""
    return _with(
        {
            "base": TEXT_STATS,
            "stats": _TEXT_STATS_DERIVED,
            "q": _QUALITY_BODY,
            "dups": (
                "SELECT doc_id FROM (SELECT doc_id,"
                " COUNT(*) OVER (PARTITION BY md5(text)) AS gs FROM documents)"
                " WHERE gs > 1"
            ),
        },
        """
SELECT source,
  CAST(COUNT(*) AS BIGINT) AS docs,
  CAST(SUM(token_count) AS BIGINT) AS tokens,
  CAST(SUM(quality_score) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_quality,
  CAST((SUM(CASE WHEN quality_score >= 70 THEN 1 ELSE 0 END) * 1000) // COUNT(*) AS BIGINT) AS high_quality_pm,
  CAST((SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1000) // COUNT(*) AS BIGINT) AS english_pm,
  CAST(COUNT(DISTINCT lang) AS BIGINT) AS langs,
  CAST((SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) * 1000) // COUNT(*) AS BIGINT) AS exact_dup_pm
FROM q LEFT JOIN dups d ON q.doc_id = d.doc_id
GROUP BY source ORDER BY source
""".strip(),
    )


ORACLES["corpus_datacard"] = _datacard_sql()


def _quantile_sketch_oracles() -> dict[str, str]:
    """Twins of scale.quantile_sketch* — the log-linear (HdrHistogram /
    DDSketch-style) quantile sketch. The bin function is exact integer
    arithmetic (octave = bit length via ``bin()``, which DuckDB and
    Spark both provide; sub-bucket via shifts), so the sketch estimate
    reproduces bit-for-bit; the only doubles are the ``p·n`` rank
    products, one IEEE multiply each."""
    sub, sub_bits = 32, 5
    binned = f"""
SELECT event_type,
  CASE WHEN v < {2 * sub} THEN CAST(v AS INT)
       ELSE (CAST(length(bin(v)) AS INT) - 1 - {sub_bits + 1}) * {sub} + {2 * sub}
            + CAST((v // (CAST(1 AS BIGINT) << (CAST(length(bin(v)) AS INT) - 1 - {sub_bits}))) - {sub} AS INT)
  END AS bin
FROM vals
""".strip()
    est_case = f"""
  CASE WHEN bin < {2 * sub} THEN CAST(bin AS BIGINT)
       ELSE CAST((bin - {2 * sub}) % {sub} + {sub} AS BIGINT)
            * (CAST(1 AS BIGINT) << (CAST((bin - {2 * sub}) // {sub} AS INT) + 1))
            + ((CAST(1 AS BIGINT) << (CAST((bin - {2 * sub}) // {sub} AS INT) + 1)) - 1) // 2
  END
""".strip()
    ctes = {
        "vals": "SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events",
        "binned": binned,
        "sk": "SELECT event_type, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2",
        "cum": (
            "SELECT event_type, bin,"
            " SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,"
            " SUM(c) OVER (PARTITION BY event_type) AS n FROM sk"
        ),
        "probs": "SELECT * FROM (VALUES (0.5), (0.9), (0.99)) t(p)",
        "hit": (
            "SELECT event_type, p, CAST(n AS BIGINT) AS n, MIN(bin) AS bin"
            " FROM cum JOIN probs ON cum >= GREATEST(1, CEIL(p * n))"
            " GROUP BY 1, 2, 3"
        ),
        "est": f"SELECT event_type, p, n, {est_case} AS est FROM hit",
        "dist": "SELECT event_type, v, COUNT(*) AS c FROM vals GROUP BY 1, 2",
        "dcum": (
            "SELECT event_type, v,"
            " SUM(c) OVER (PARTITION BY event_type ORDER BY v) AS cum,"
            " SUM(c) OVER (PARTITION BY event_type) AS n FROM dist"
        ),
        "ex": (
            "SELECT event_type, p, MIN(v) AS exact"
            " FROM dcum JOIN probs ON cum >= GREATEST(1, CEIL(p * n))"
            " GROUP BY 1, 2"
        ),
    }
    batch = _with(
        ctes,
        """
SELECT est.event_type, est.p, est.n, est.est, ex.exact,
  (abs(est.est - ex.exact) * 1000) // ex.exact AS err_pm
FROM est JOIN ex ON est.event_type = ex.event_type AND est.p = ex.p
ORDER BY est.event_type, est.p
""".strip(),
    )
    # The streamed sketch merges bin partials by addition, which is
    # exact — so the drained result IS the batch arithmetic.
    stream = _with(
        ctes,
        "SELECT event_type, p, n, est AS est_cents FROM est ORDER BY event_type, p",
    )
    return {"value_quantile_sketch": batch, "streaming_value_quantiles": stream}


ORACLES.update(_quantile_sketch_oracles())

# The IVM contract: the incrementally-maintained summary must equal the
# full recompute EXACTLY, so its oracle IS the batch summary's SQL.
ORACLES["incremental_daily_sales"] = ORACLES["daily_sales_summary"]
ORACLES["incremental_customer_metrics"] = ORACLES["customer_lifetime_metrics"]
ORACLES["incremental_rule_aggregation"] = ORACLES["rule_driven_aggregation"]
ORACLES["streaming_rule_aggregation"] = ORACLES["rule_driven_aggregation"]

# The streaming-CDC contract: the latest-change merge is associative, so
# the drained snapshot must equal the batch apply — one shared oracle.
ORACLES["streaming_cdc_snapshot"] = ORACLES["cdc_order_snapshot"]

# The lakehouse-MERGE contract: the physically merged table read back
# must equal the logical batch apply — same oracle again.
ORACLES["lake_cdc_merged_snapshot"] = ORACLES["cdc_order_snapshot"]

# twin of datalake.lake_schema_evolution_snapshot: reconstruct the
# post-evolution merged table in plain SQL — inserts/updates carry the
# new sales_channel, the delete beats the repriced update on the
# key % 9700 overlap (later change timestamp), untouched pre-1997 rows
# read the evolved column as NULL
ORACLES["lake_schema_evolution_snapshot"] = f"""
WITH snap AS (
  SELECT o_orderkey AS k, o_totalprice AS tp FROM orders
  WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'
),
ins AS (
  SELECT o_orderkey AS k, o_totalprice AS tp FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
    AND CAST(o_orderdate AS DATE) < DATE '1998-01-01'
),
upd AS (SELECT k, tp + 10.0 AS tp FROM snap WHERE k % 100 = 0),
dels AS (SELECT k FROM snap WHERE k % 97 = 0),
merged AS (
  SELECT CASE WHEN k % 3 = 0 THEN 'WEB'
              WHEN k % 3 = 1 THEN 'APP'
              ELSE 'STORE' END AS sales_channel, tp
  FROM (
    SELECT k, tp FROM ins
    UNION ALL
    SELECT k, tp FROM upd WHERE k NOT IN (SELECT k FROM dels)
  )
  UNION ALL
  SELECT NULL AS sales_channel, tp FROM snap
  WHERE k NOT IN (SELECT k FROM upd)
    AND k NOT IN (SELECT k FROM dels)
)
SELECT sales_channel,
  COUNT(*) AS n_rows,
  {money_sum_sql('tp')} AS revenue
FROM merged
GROUP BY sales_channel
ORDER BY sales_channel
""".strip()

# The streaming-SCD2 contract: per-key-complete micro-batches touch
# disjoint key sets, so the drained history must be bit-identical to the
# single-batch lake merge — one shared oracle.
ORACLES["streaming_scd2_history"] = ORACLES["lake_scd2_merged_history"]

# ...and its Type-1 sibling: changelog micro-batches physically MERGEd
# into the lake table must land on the same batch-apply arithmetic.
ORACLES["streaming_lake_cdc_snapshot"] = ORACLES["cdc_order_snapshot"]


def _ndv_rule_oracle() -> dict[str, str]:
    """Integer register digest of the approx-NDV demo rule
    (``rules.NDV_RULE`` through the IVM compiler): the oracle rebuilds
    the HLL registers in SQL — same portable md5-prefix 48-bit hash,
    same bucket/rank arithmetic as ``scale.hll_registers`` — so a pass
    proves the sketch STATE is bit-exact cross-engine. The float
    estimate (linear-counting ``ln`` is libm-dependent) stays out of the
    oracle and is property-tested instead. One oracle for all three
    faces: registers merge by element-wise MAX, so one-pass ==
    base/delta merge == streamed micro-batches, bit-for-bit."""
    from dataengineeringpipeline_spark.scale import HLL_REGISTER_BITS

    wmod = 1 << HLL_REGISTER_BITS
    rb = HLL_REGISTER_BITS
    body = f"""
SELECT s.order_status, c.order_count, s.approx_customers_occupied,
  s.approx_customers_register_sum, s.approx_customers_deepest
FROM (
  SELECT order_status,
    CAST(COUNT(*) AS BIGINT) AS approx_customers_occupied,
    CAST(SUM(max_rho) AS BIGINT) AS approx_customers_register_sum,
    CAST(MAX(max_rho) AS INTEGER) AS approx_customers_deepest
  FROM (
    SELECT order_status, h // {wmod} AS bucket,
      MAX(CASE WHEN h % {wmod} = 0 THEN {rb + 1}
          ELSE {rb} - (length(bin(h % {wmod})) - 1) END) AS max_rho
    FROM (
      SELECT order_status, {_wh('CAST(customer_key AS VARCHAR)')} AS h
      FROM silver_orders WHERE is_complete_order
    )
    GROUP BY 1, 2
  ) r GROUP BY r.order_status
) s
JOIN (
  SELECT order_status, CAST(COUNT(order_key) AS BIGINT) AS order_count
  FROM silver_orders WHERE is_complete_order GROUP BY 1
) c USING (order_status)
ORDER BY s.order_status
""".strip()
    return {"rule_ndv_aggregation": _with({"silver_orders": SILVER_ORDERS}, body)}


ORACLES.update(_ndv_rule_oracle())
ORACLES["incremental_ndv_rule"] = ORACLES["rule_ndv_aggregation"]
ORACLES["streaming_ndv_rule"] = ORACLES["rule_ndv_aggregation"]


_QUARTILE_RULE_BODY = f"""
SELECT order_status,
  COUNT(order_key) AS order_count,
  quantile_cont(days_since_order, 0.25) AS p25_order_age,
  quantile_cont(days_since_order, 0.5) AS median_order_age,
  quantile_cont(days_since_order, 0.75) AS p75_order_age,
  {money_sum_sql('total_price')} AS revenue
FROM silver_orders
WHERE is_complete_order
GROUP BY order_status
ORDER BY order_status
""".strip()

# twin of rules.QUARTILE_RULE (rule_quartile_aggregation + the IVM
# faces): DuckDB quantile_cont and Spark `percentile` share the exact
# two-sided interpolation at rank (n-1)p, and the measure is integral,
# so the comparison is bit-exact
ORACLES["rule_quartile_aggregation"] = _with(
    {"silver_orders": SILVER_ORDERS}, _QUARTILE_RULE_BODY
)
ORACLES["incremental_quartile_rule"] = ORACLES["rule_quartile_aggregation"]
ORACLES["streaming_quartile_rule"] = ORACLES["rule_quartile_aggregation"]

# twins of ivm.refresh_customer_analytics (batch + streaming faces): an
# in-place delta refresh of the customer-360 gold lake table must equal
# the full batch recompute
ORACLES["incremental_gold_refresh"] = ORACLES["customer_analytics"]
ORACLES["streaming_gold_refresh"] = ORACLES["customer_analytics"]

# twins of ivm.refresh_rule_summary (batch + streaming faces): a
# continuously maintained rule-summary lake table must equal the
# one-shot config-driven batch job
ORACLES["incremental_rule_summary_table"] = ORACLES["rule_driven_aggregation"]
ORACLES["streaming_rule_summary_table"] = ORACLES["rule_driven_aggregation"]

# twin of datalake.lake_partial_update_snapshot: an UPDATE SET subset
# merge — patched rows keep their stored total_price, inserts carrying
# only the named column land NULL elsewhere, delete beats the flag on
# the key % 4850 overlap (later change timestamp)
ORACLES["lake_partial_update_snapshot"] = f"""
WITH snap AS (
  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS tp
  FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'
),
dels AS (SELECT k FROM snap WHERE k % 97 = 0),
final AS (
  SELECT CASE WHEN k % 50 = 0 THEN 'FLAGGED' ELSE st END AS status, tp
  FROM snap WHERE k NOT IN (SELECT k FROM dels)
  UNION ALL
  SELECT 'NEW-' || o_orderstatus AS status, CAST(NULL AS DOUBLE) AS tp
  FROM orders
  WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'
    AND CAST(o_orderdate AS DATE) < DATE '1997-07-01'
)
SELECT status,
  COUNT(*) AS n_rows,
  {money_sum_sql('tp')} AS revenue
FROM final
GROUP BY status
ORDER BY status
""".strip()

# twin of datalake.lake_point_lookup_orders: two-level data skipping
# (footer envelopes + per-file bloom) must never change the answer
ORACLES["lake_point_lookup_orders"] = """
SELECT o_orderkey AS order_key,
       o_orderstatus AS status,
       o_totalprice AS total_price,
       CAST(o_orderdate AS DATE) AS order_date
FROM orders
WHERE o_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_orderkey % 997 = 0
  ORDER BY o_orderkey LIMIT 8
)
ORDER BY o_orderkey
""".strip()


def _graph_oracles() -> dict[str, str]:
    """Twin of operators.graph.item_pagerank — the 5-iteration power
    method UNROLLED into CTEs. Every floating sum runs the engine's
    canonical two-level bucketed fold (graph.FOLD_BUCKETS source-salt
    buckets; per-bucket fold in ascending source order, then across
    buckets in bucket order — Spark ``aggregate(array_sort(...))``
    nested twice, here ``list_reduce(list(... ORDER BY ...))`` nested
    twice), so PageRank — usually written off as only approximately
    reproducible — matches bit-exactly. DuckDB's no-init list_reduce
    starts at x1 where Spark starts at 0.0 + x1; identical for finite
    doubles. ``pmod`` spelled ``((x % B) + B) % B`` so negative ids
    would bucket identically too."""
    d = "0.85"
    B = 1024  # graph.FOLD_BUCKETS

    def fold(expr: str, order: str) -> str:
        return (
            f"COALESCE(list_reduce(list({expr} ORDER BY {order}),"
            " (a, b) -> a + b), 0.0)"
        )

    def bucket(expr: str) -> str:
        return f"((({expr}) % {B}) + {B}) % {B}"

    ctes: dict[str, str] = {
        "ev": (
            "SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,"
            " event_id, CAST(props->>'k' AS BIGINT) AS item"
            " FROM events WHERE props->>'k' IS NOT NULL"
        ),
        "seq": (
            "SELECT item AS src, LEAD(item) OVER"
            " (PARTITION BY user_id ORDER BY ts_us, event_id) AS dst FROM ev"
        ),
        "edges": (
            "SELECT src, dst, COUNT(*) AS cnt FROM seq"
            " WHERE dst IS NOT NULL GROUP BY src, dst"
        ),
        "outd": "SELECT src, CAST(SUM(cnt) AS BIGINT) AS out_cnt FROM edges GROUP BY src",
        "ew": (
            "SELECT e.src, e.dst, e.cnt, o.out_cnt"
            " FROM edges e JOIN outd o ON e.src = o.src"
        ),
        "nodes": (
            "SELECT DISTINCT node FROM"
            " (SELECT src AS node FROM edges UNION ALL SELECT dst FROM edges)"
        ),
        "dang": "SELECT node FROM nodes WHERE node NOT IN (SELECT src FROM outd)",
        "nn": "SELECT COUNT(*) AS n_nodes FROM nodes",
        "r0": "SELECT node, 1.0 / n_nodes AS rank FROM nodes, nn",
    }
    for i in range(1, 6):
        p = f"r{i - 1}"
        ctes[f"dm{i}"] = (
            f"SELECT {fold('sub', 'bucket')} AS dmass FROM ("
            f"SELECT {bucket('r.node')} AS bucket,"
            f" {fold('r.rank', 'r.node')} AS sub"
            f" FROM {p} r JOIN dang d ON r.node = d.node"
            f" GROUP BY {bucket('r.node')})"
        )
        contrib = "(r.rank * (CAST(ew.cnt AS DOUBLE) / CAST(ew.out_cnt AS DOUBLE)))"
        ctes[f"in{i}"] = (
            f"SELECT node, {fold('sub', 'bucket')} AS inflow FROM ("
            f"SELECT ew.dst AS node, {bucket('ew.src')} AS bucket,"
            f" {fold(contrib, 'ew.src')} AS sub"
            f" FROM ew JOIN {p} r ON ew.src = r.node"
            f" GROUP BY ew.dst, {bucket('ew.src')}) GROUP BY node"
        )
        ctes[f"r{i}"] = (
            f"SELECT n.node, (1.0 - {d}) / nn.n_nodes"
            f" + {d} * (COALESCE(i.inflow, 0.0) + dm.dmass / nn.n_nodes) AS rank"
            f" FROM nodes n LEFT JOIN in{i} i ON n.node = i.node, nn, dm{i} dm"
        )
    ctes["od"] = (
        "SELECT src AS node, COUNT(*) AS out_edges,"
        " CAST(SUM(cnt) AS BIGINT) AS out_weight FROM edges GROUP BY src"
    )
    ctes["idg"] = "SELECT dst AS node, COUNT(*) AS in_edges FROM edges GROUP BY dst"
    body = """
SELECT r.node AS item,
  CAST(floor(r.rank * 1000000) AS BIGINT) AS rank_ppm,
  COALESCE(od.out_edges, 0) AS out_edges,
  COALESCE(od.out_weight, 0) AS out_weight,
  COALESCE(idg.in_edges, 0) AS in_edges
FROM r5 r
LEFT JOIN od ON r.node = od.node
LEFT JOIN idg ON r.node = idg.node
ORDER BY rank_ppm DESC, item
""".strip()
    return {"item_pagerank": _with(ctes, body)}


ORACLES.update(_graph_oracles())


def _privacy_oracles() -> dict[str, str]:
    """Twins of quality.k_anonymous_release / k_anon_audit at k=3 over
    (event_date, event_hour, event_type)."""
    grp = f"""
SELECT event_date, event_hour, event_type,
  COUNT(DISTINCT user_id) AS n_individuals,
  COUNT(*) AS n_rows,
  {money_sum_sql('value')} AS total_value
FROM ({EVENTS_BASE})
GROUP BY event_date, event_hour, event_type
""".strip()
    release = f"""
SELECT * FROM ({grp})
WHERE n_individuals >= 3
ORDER BY event_date, event_hour, event_type
""".strip()
    audit = f"""
SELECT 3 AS k,
  CAST(SUM(CASE WHEN n_individuals >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS released_groups,
  CAST(SUM(CASE WHEN n_individuals < 3 THEN 1 ELSE 0 END) AS BIGINT) AS suppressed_groups,
  CAST(SUM(CASE WHEN n_individuals < 3 THEN n_rows ELSE 0 END) AS BIGINT) AS suppressed_rows,
  (CAST(SUM(CASE WHEN n_individuals < 3 THEN n_rows ELSE 0 END) AS BIGINT) * 1000)
    // CAST(SUM(n_rows) AS BIGINT) AS suppressed_rows_pm
FROM ({grp})
""".strip()
    return {"k_anon_release": release, "k_anon_audit": audit}


ORACLES.update(_privacy_oracles())


def _timeseries_oracles() -> dict[str, str]:
    """Twins of operators.timeseries — calendar gap-fill with
    carry-forward, and the EWMA fold (list_reduce starts from the first
    element exactly as the Spark aggregate seeds with it)."""
    daily = f"""
SELECT event_type, event_date, COUNT(*) AS n_events,
  {money_sum_sql('value')} AS daily_value
FROM ({EVENTS_BASE}) GROUP BY event_type, event_date
""".strip()
    gap = _with(
        {
            "daily": daily,
            "bounds": (
                "SELECT event_type, MIN(event_date) AS d0, MAX(event_date) AS d1"
                " FROM daily GROUP BY event_type"
            ),
            "spine": (
                "SELECT event_type, CAST(unnest(generate_series(d0, d1,"
                " INTERVAL 1 DAY)) AS DATE) AS event_date FROM bounds"
            ),
            "joined": (
                "SELECT s.event_type, s.event_date, d.n_events,"
                " d.daily_value AS observed_value"
                " FROM spine s LEFT JOIN daily d"
                " ON s.event_type = d.event_type AND s.event_date = d.event_date"
            ),
        },
        """
SELECT event_type, event_date,
  observed_value IS NOT NULL AS is_observed,
  COALESCE(n_events, 0) AS n_events,
  last_value(observed_value IGNORE NULLS) OVER (
    PARTITION BY event_type ORDER BY event_date
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS daily_value
FROM joined ORDER BY event_type, event_date
""".strip(),
    )
    ewma = _with(
        {
            "daily": daily,
            "series": (
                "SELECT event_type, list(daily_value ORDER BY event_date) AS s,"
                " COUNT(*) AS n_days, MIN(event_date) AS first_date,"
                " MAX(event_date) AS last_date FROM daily GROUP BY event_type"
            ),
        },
        """
SELECT event_type, n_days, first_date, last_date,
  s[len(s)] AS last_value,
  list_reduce(s, (a, b) -> 0.25 * b + (1.0 - 0.25) * a) AS ewma_value
FROM series ORDER BY event_type
""".strip(),
    )
    return {"gap_filled_daily_values": gap, "ewma_value_summary": ewma}


ORACLES.update(_timeseries_oracles())


def _rules_mining_oracles() -> dict[str, str]:
    """Twin of operators.graph.next_item_rules (top-3 next items)."""
    ctes = {
        "ev": (
            "SELECT user_id, CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS BIGINT) AS ts_us,"
            " event_id, CAST(props->>'k' AS BIGINT) AS item"
            " FROM events WHERE props->>'k' IS NOT NULL"
        ),
        "seq": (
            "SELECT item AS src, LEAD(item) OVER"
            " (PARTITION BY user_id ORDER BY ts_us, event_id) AS dst FROM ev"
        ),
        "edges": (
            "SELECT src, dst, COUNT(*) AS cnt FROM seq"
            " WHERE dst IS NOT NULL GROUP BY src, dst"
        ),
        "outd": "SELECT src, CAST(SUM(cnt) AS BIGINT) AS out_cnt FROM edges GROUP BY src",
        "ind": "SELECT dst, CAST(SUM(cnt) AS BIGINT) AS in_cnt FROM edges GROUP BY dst",
        "tot": "SELECT CAST(SUM(cnt) AS BIGINT) AS total_cnt FROM edges",
        "ranked": (
            "SELECT * FROM (SELECT src, dst, cnt, ROW_NUMBER() OVER"
            " (PARTITION BY src ORDER BY cnt DESC, dst) AS rank FROM edges)"
            " WHERE rank <= 3"
        ),
    }
    body = """
SELECT r.src AS src_item, r.dst AS next_item, r.cnt, o.out_cnt, i.in_cnt,
  CAST(r.cnt AS DOUBLE) / CAST(o.out_cnt AS DOUBLE) AS confidence,
  (CAST(r.cnt AS DOUBLE) / CAST(o.out_cnt AS DOUBLE))
    / (CAST(i.in_cnt AS DOUBLE) / CAST(t.total_cnt AS DOUBLE)) AS lift,
  r.rank
FROM ranked r
JOIN outd o ON r.src = o.src
JOIN ind i ON r.dst = i.dst
CROSS JOIN tot t
ORDER BY src_item, rank
""".strip()
    return {"next_item_rules": _with(ctes, body)}


ORACLES.update(_rules_mining_oracles())


def _quartile_profile_oracle() -> dict[str, str]:
    """Twin of scale.value_quartile_profile — quartile edges from the
    log-linear sketch (same exact-integer bin/midpoint arithmetic as
    _quantile_sketch_oracles, probed at 0.25/0.5/0.75), then a map-side
    CASE assignment and integer per-mille shares."""
    sub, sub_bits = 32, 5
    binned = f"""
SELECT event_type,
  CASE WHEN v < {2 * sub} THEN CAST(v AS INT)
       ELSE (CAST(length(bin(v)) AS INT) - 1 - {sub_bits + 1}) * {sub} + {2 * sub}
            + CAST((v // (CAST(1 AS BIGINT) << (CAST(length(bin(v)) AS INT) - 1 - {sub_bits}))) - {sub} AS INT)
  END AS bin
FROM vals
""".strip()
    est_case = f"""
  CASE WHEN bin < {2 * sub} THEN CAST(bin AS BIGINT)
       ELSE CAST((bin - {2 * sub}) % {sub} + {sub} AS BIGINT)
            * (CAST(1 AS BIGINT) << (CAST((bin - {2 * sub}) // {sub} AS INT) + 1))
            + ((CAST(1 AS BIGINT) << (CAST((bin - {2 * sub}) // {sub} AS INT) + 1)) - 1) // 2
  END
""".strip()
    ctes = {
        "vals": "SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events",
        "binned": binned,
        "sk": "SELECT event_type, bin, COUNT(*) AS c FROM binned GROUP BY 1, 2",
        "cum": (
            "SELECT event_type, bin,"
            " SUM(c) OVER (PARTITION BY event_type ORDER BY bin) AS cum,"
            " SUM(c) OVER (PARTITION BY event_type) AS n FROM sk"
        ),
        "probs": "SELECT * FROM (VALUES (0.25), (0.5), (0.75)) t(p)",
        "hit": (
            "SELECT event_type, p, MIN(bin) AS bin"
            " FROM cum JOIN probs ON cum >= GREATEST(1, CEIL(p * n))"
            " GROUP BY 1, 2"
        ),
        "est": f"SELECT event_type, p, {est_case} AS est FROM hit",
        "edges": (
            "SELECT event_type,"
            " MAX(CASE WHEN p = 0.25 THEN est END) AS q1,"
            " MAX(CASE WHEN p = 0.5 THEN est END) AS q2,"
            " MAX(CASE WHEN p = 0.75 THEN est END) AS q3"
            " FROM est GROUP BY event_type"
        ),
        "bucketed": (
            "SELECT v.event_type, v.v,"
            " CASE WHEN v.v <= e.q1 THEN 1 WHEN v.v <= e.q2 THEN 2"
            " WHEN v.v <= e.q3 THEN 3 ELSE 4 END AS quartile"
            " FROM vals v JOIN edges e ON v.event_type = e.event_type"
        ),
        "prof": (
            "SELECT event_type, quartile, COUNT(*) AS n_rows,"
            " MIN(v) AS min_v, MAX(v) AS max_v"
            " FROM bucketed GROUP BY event_type, quartile"
        ),
    }
    body = """
SELECT event_type, quartile, n_rows,
  (n_rows * 1000) // CAST(SUM(n_rows) OVER (PARTITION BY event_type) AS BIGINT) AS share_pm,
  min_v, max_v
FROM prof ORDER BY event_type, quartile
""".strip()
    return {"value_quartile_profile": _with(ctes, body)}


ORACLES.update(_quartile_profile_oracle())


# The IVM hierarchy contracts: the monthly rollup read off the daily
# partials, and the STREAMED partials merged on read, must both equal
# their plain full recomputes.
ORACLES["monthly_sales_from_partials"] = ORACLES["monthly_sales_summary"]
ORACLES["streaming_daily_sales"] = ORACLES["daily_sales_summary"]


def _stats_drift_oracle() -> dict[str, str]:
    """Twin of quality.stats_drift on orders split at 1997-01-01 —
    reuses the table_stats arithmetic over two filtered relations."""
    specs = [
        ("o_orderkey", "num"),
        ("o_custkey", "num"),
        ("o_orderstatus", "str"),
        ("o_totalprice", "num"),
        ("o_orderdate", "ts"),
        ("o_orderpriority", "str"),
    ]

    def stats_sub(rel: str) -> str:
        blocks = []
        for c, kind in specs:
            if kind == "num":
                mn, mx = f"CAST(MIN({c}) AS DOUBLE)", f"CAST(MAX({c}) AS DOUBLE)"
                mns = mxs = "CAST(NULL AS VARCHAR)"
            elif kind == "ts":
                mn = f"CAST(epoch_us(CAST(MIN({c}) AS TIMESTAMP)) AS DOUBLE)"
                mx = f"CAST(epoch_us(CAST(MAX({c}) AS TIMESTAMP)) AS DOUBLE)"
                mns = mxs = "CAST(NULL AS VARCHAR)"
            else:
                mn = mx = "CAST(NULL AS DOUBLE)"
                mns, mxs = f"MIN({c})", f"MAX({c})"
            blocks.append(
                f"SELECT '{c}' AS column_name, CAST(COUNT({c}) AS BIGINT) AS non_null,\n"
                f"  CAST(COUNT(DISTINCT {c}) AS BIGINT) AS ndv, {mn} AS min_num,"
                f" {mx} AS max_num, {mns} AS min_str, {mxs} AS max_str FROM {rel}"
            )
        u = "\nUNION ALL\n".join(blocks)
        return (
            f"SELECT column_name, t.n_rows, CAST(t.n_rows - non_null AS BIGINT) AS nulls,"
            f" ndv, min_num, max_num, min_str, max_str\n"
            f"FROM ({u}) u, (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM {rel}) t"
        )

    ctes = {
        "old_src": "SELECT * FROM orders WHERE CAST(o_orderdate AS DATE) < DATE '1997-01-01'",
        "new_src": "SELECT * FROM orders WHERE CAST(o_orderdate AS DATE) >= DATE '1997-01-01'",
        "olds": stats_sub("old_src"),
        "news": stats_sub("new_src"),
    }
    body = """
SELECT o.column_name,
  o.n_rows AS old_rows, n.n_rows AS new_rows,
  CASE WHEN o.n_rows > 0 THEN (n.n_rows * 1000) // o.n_rows END AS rows_ratio_pm,
  CASE WHEN o.n_rows > 0 THEN (o.nulls * 1000) // o.n_rows END AS null_pm_old,
  CASE WHEN n.n_rows > 0 THEN (n.nulls * 1000) // n.n_rows END AS null_pm_new,
  CASE WHEN o.ndv > 0 THEN (n.ndv * 1000) // o.ndv END AS ndv_ratio_pm,
  COALESCE(n.min_num < o.min_num, FALSE) OR COALESCE(n.min_str < o.min_str, FALSE) AS min_widened,
  COALESCE(n.max_num > o.max_num, FALSE) OR COALESCE(n.max_str > o.max_str, FALSE) AS max_widened
FROM olds o JOIN news n ON o.column_name = n.column_name
ORDER BY o.column_name
""".strip()
    return {"stats_drift_report": _with(ctes, body)}


ORACLES.update(_stats_drift_oracle())

# The streaming-ANALYZE contract: merged stats partials must reproduce
# the one-shot ANALYZE diff exactly — the batch drift SQL is the oracle.
ORACLES["streaming_stats_drift"] = ORACLES["stats_drift_report"]


def _fixed_k_sample_oracle() -> dict[str, str]:
    """Twin of sampling.eval_sample_picks (k=20): same integer hash,
    same (hash, key) ordering."""
    h = "((doc_id % 1000003) * 2654435761) % 1000000007"
    return {
        "eval_sample_picks": f"""
SELECT source, doc_id, pick_rank FROM (
  SELECT source, doc_id, ROW_NUMBER() OVER (
    PARTITION BY source ORDER BY {h}, doc_id) AS pick_rank
  FROM documents
) WHERE pick_rank <= 20
ORDER BY source, pick_rank
""".strip()
    }


ORACLES.update(_fixed_k_sample_oracle())


# twin of datalake.lake_backfill_merge_snapshot: the DISTRIBUTED merge
# key path (merge_broadcast_keys=0 — envelope join for the file prune,
# shuffle anti-join for kept rows, no driver key collect) must leave
# the table identical to the broadcast path / the batch apply
ORACLES["lake_backfill_merge_snapshot"] = ORACLES["lake_cdc_merged_snapshot"]

# twin of ivm.large_delta_gold_refresh: the backfill face of the gold
# refresh (shuffle semi joins + distributed merge) still equals the
# full batch recompute
ORACLES["large_delta_gold_refresh"] = ORACLES["customer_analytics"]

# twin of ivm.rule_migration_summary: migrate_rule (a MIN measure added
# to the deployed config) + ordinary delta refresh must equal the
# one-shot batch compile of the EXTENDED rule
_RULE_AGG_MIGRATED_BODY = f"""
SELECT order_year, order_month, order_status,
  {money_sum_sql('total_price')} AS revenue,
  {money_avg_sql('total_price')} AS avg_order_value,
  {det_stddev_sql('total_price')} AS order_value_stddev,
  COUNT(order_key) AS order_count,
  COUNT(DISTINCT customer_key) AS unique_customers,
  MAX(total_price) AS max_order_value,
  MIN(total_price) AS min_order_value
FROM silver_orders
WHERE is_complete_order AND order_status <> 'P'
GROUP BY order_year, order_month, order_status
ORDER BY order_year, order_month, order_status
""".strip()

ORACLES["rule_migration_summary"] = _with(
    {"silver_orders": SILVER_ORDERS}, _RULE_AGG_MIGRATED_BODY
)

# twin of datalake.lake_indexed_merge_lookup: a point lookup through
# the bloom index maintained THROUGH a merge — patch the even probed
# keys, tombstone the odd %3 ones, insert a brand-new key — must equal
# the plain SQL reconstruction (data skipping never changes answers)
ORACLES["lake_indexed_merge_lookup"] = """
WITH base AS (
  SELECT o_orderkey AS order_key, o_orderstatus AS status,
         o_totalprice AS total_price
  FROM orders
),
p AS (
  SELECT order_key FROM base WHERE order_key % 997 = 0
  ORDER BY order_key LIMIT 8
),
merged AS (
  SELECT b.order_key,
    CASE WHEN p.order_key IS NOT NULL AND b.order_key % 2 = 0
         THEN 'MERGED' ELSE b.status END AS status,
    CASE WHEN p.order_key IS NOT NULL AND b.order_key % 2 = 0
         THEN -1.0 ELSE b.total_price END AS total_price
  FROM base b LEFT JOIN p ON b.order_key = p.order_key
  WHERE NOT (p.order_key IS NOT NULL
             AND b.order_key % 2 <> 0 AND b.order_key % 3 = 0)
  UNION ALL
  SELECT 987654321 AS order_key, 'INSERTED' AS status, -2.0 AS total_price
)
SELECT order_key, status, total_price FROM merged
WHERE order_key IN (SELECT order_key FROM p) OR order_key = 987654321
ORDER BY order_key
""".strip()
