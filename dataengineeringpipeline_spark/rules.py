"""Config-driven rule compilers (SURVEY.md §2.10, §7.3).

The reference's extensibility surface is configuration, not UDFs:

- **aggregation rules** ``{group_by_columns, aggregate_columns:
  [{column, function, alias}], filters}``
  (``terraform/modules/glue/variables.tf:352-417``) — compiled here to
  one ``groupBy().agg()``;
- **feature rules** — named features whose ``calculation`` is a SQL
  expression string (``variables.tf:449-483``, e.g.
  ``"1.0 / (1.0 + days_since_last_order / 30.0)"``) — compiled to
  ``withColumn(F.expr(...))``.

Everything lands in Catalyst as ordinary expressions: config-driven does
not mean interpreted row-at-a-time — the compiled plan is identical to
hand-written DataFrame code, including pushdown and codegen.

Determinism: ``sum``/``avg``/``stddev`` compile to the engine's exact
decimal recipes (``functions``), so rule-driven aggregates are
partitioning-independent like every other engine aggregate.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.functions import det_stddev, money_avg, money_sum


@dataclass
class AggregateColumn:
    column: str
    function: str
    alias: str
    #: extra parameter for parameterized functions — today the
    #: ``percentile`` fraction in [0, 1] (``median`` is sugar for 0.5)
    param: float | None = None


@dataclass
class AggregationRule:
    """One configured aggregation job (reference rule schema)."""

    name: str
    group_by_columns: tuple[str, ...]
    aggregate_columns: tuple[AggregateColumn, ...]
    filters: str | None = None  # SQL boolean expression

    @classmethod
    def from_dict(cls, cfg: dict) -> "AggregationRule":
        return cls(
            name=cfg["name"],
            group_by_columns=tuple(cfg["group_by_columns"]),
            aggregate_columns=tuple(
                AggregateColumn(a["column"], a["function"], a["alias"], a.get("param"))
                for a in cfg["aggregate_columns"]
            ),
            filters=cfg.get("filters"),
        )


def _compile_aggregate(spec: AggregateColumn) -> Column:
    fn = spec.function.lower()
    if fn == "sum":
        return money_sum(spec.column, spec.alias)
    if fn == "avg":
        return money_avg(spec.column, spec.alias)
    if fn == "stddev":
        return det_stddev(spec.column, spec.alias)
    if fn == "count":
        return F.count(spec.column).alias(spec.alias)
    if fn == "count_distinct":
        return F.countDistinct(spec.column).alias(spec.alias)
    if fn == "approx_count_distinct":
        return F.approx_count_distinct(spec.column).alias(spec.alias)
    if fn in ("min", "max"):
        return getattr(F, fn)(spec.column).alias(spec.alias)
    if fn in ("median", "percentile"):
        p = 0.5 if fn == "median" else spec.param
        if p is None or not 0.0 <= p <= 1.0:
            raise ValueError(
                f"percentile rule {spec.alias!r} needs param in [0, 1], got {spec.param!r}"
            )
        # exact interpolated percentile (SQL `percentile`, R-7 / quantile_cont
        # definition) — the IVM compiler maintains it from value-histogram
        # partials bit-identically (ivm._fold_pctl)
        return F.percentile(spec.column, float(p)).alias(spec.alias)
    raise ValueError(f"unsupported aggregate function {spec.function!r}")


def apply_aggregation_rule(df: DataFrame, rule: AggregationRule) -> DataFrame:
    """Compile one aggregation rule to a single groupBy().agg() plan."""
    if not rule.aggregate_columns:
        raise ValueError(f"rule {rule.name!r} has no aggregate columns")
    if rule.filters:
        df = df.filter(F.expr(rule.filters))
    aggs = [_compile_aggregate(a) for a in rule.aggregate_columns]
    if rule.group_by_columns:
        return df.groupBy(*rule.group_by_columns).agg(*aggs)
    return df.agg(*aggs)


@dataclass
class FeatureRule:
    """One configured derived feature: name + SQL calculation.

    ``round_dp`` guards transcendental calculations (LOG etc.): libm
    implementations differ in the last ulp, so portable features pin a
    decimal grid.
    """

    name: str
    calculation: str
    round_dp: int | None = None


import re as _re

_FLOAT_LITERAL = _re.compile(r"(?<![\w.])(\d+\.\d+)(?![\w.])")
_SQL_STRING = _re.compile(r"'(?:[^']|'')*'")


def _double_literals(calculation: str) -> str:
    """Literal-typing policy: float literals in rule configs evaluate as
    DOUBLE. Spark SQL parses ``1.0`` as DECIMAL(2,1), which drags the
    whole calculation into decimal arithmetic with division-scale
    truncation (~1e-9 error vs IEEE double); the reference's configs
    (pandas/Snowflake semantics) and the DuckDB oracle both mean double.

    SQL string literals (``'...'``, with ``''`` escapes) pass through
    untouched — ``version = '1.5'`` must keep comparing against the
    string, not against ``'CAST(1.5 AS DOUBLE)'``.
    """
    out, pos = [], 0
    for m in _SQL_STRING.finditer(calculation):
        out.append(_FLOAT_LITERAL.sub(r"CAST(\1 AS DOUBLE)", calculation[pos : m.start()]))
        out.append(m.group(0))
        pos = m.end()
    out.append(_FLOAT_LITERAL.sub(r"CAST(\1 AS DOUBLE)", calculation[pos:]))
    return "".join(out)


def apply_feature_rules(df: DataFrame, rules: tuple[FeatureRule, ...]) -> DataFrame:
    """Compile feature rules to withColumn(F.expr(...)) chain — rules may
    reference features defined by earlier rules."""
    for r in rules:
        col = F.expr(_double_literals(r.calculation))
        if r.round_dp is not None:
            col = F.round(col, r.round_dp)
        df = df.withColumn(r.name, col)
    return df


#: Demo config mirroring the reference's sales-summary aggregation rule
#: (variables.tf:352-417 shape) — used by the driver-contract query.
MONTHLY_REVENUE_RULE = AggregationRule(
    name="monthly_revenue_by_status",
    group_by_columns=("order_year", "order_month", "order_status"),
    aggregate_columns=(
        AggregateColumn("total_price", "sum", "revenue"),
        AggregateColumn("total_price", "avg", "avg_order_value"),
        AggregateColumn("total_price", "stddev", "order_value_stddev"),
        AggregateColumn("order_key", "count", "order_count"),
        AggregateColumn("customer_key", "count_distinct", "unique_customers"),
        AggregateColumn("total_price", "max", "max_order_value"),
    ),
    filters="is_complete_order AND order_status <> 'P'",
)

#: Demo approx-NDV rule (same variables.tf:352-417 config shape): an
#: ``approx_count_distinct`` measure beside an exact count. Through the
#: IVM compiler (``ivm.rule_partials``) the NDV measure becomes a
#: mergeable HLL register map — the bounded-state dial for NDV over a
#: key universe too large to carry in the grain.
NDV_RULE = AggregationRule(
    name="status_customer_ndv",
    group_by_columns=("order_status",),
    aggregate_columns=(
        AggregateColumn("order_key", "count", "order_count"),
        AggregateColumn("customer_key", "approx_count_distinct", "approx_customers"),
    ),
    filters="is_complete_order",
)

#: Demo percentile rule (same config schema): exact quartiles of order
#: age beside ordinary measures. Through the IVM compiler the
#: percentile measures become mergeable VALUE-HISTOGRAM partials — the
#: classic result that exact quantiles need per-distinct-value state;
#: for bounded state at unbounded measure cardinality use the quantile
#: sketch (``scale.quantile_sketch``) instead.
QUARTILE_RULE = AggregationRule(
    name="status_order_age_quartiles",
    group_by_columns=("order_status",),
    aggregate_columns=(
        AggregateColumn("order_key", "count", "order_count"),
        AggregateColumn("days_since_order", "percentile", "p25_order_age", 0.25),
        AggregateColumn("days_since_order", "median", "median_order_age"),
        AggregateColumn("days_since_order", "percentile", "p75_order_age", 0.75),
        AggregateColumn("total_price", "sum", "revenue"),
    ),
    filters="is_complete_order",
)

#: Demo feature-rule config (variables.tf:449-483 shape; LOG rounded —
#: natural log differs between libm builds in the last ulp).
ENGAGEMENT_FEATURE_RULES = (
    FeatureRule("engagement_score", "1.0 / (1.0 + recency_days / 30.0)"),
    FeatureRule("log_total_orders", "LOG(1 + total_orders)", round_dp=6),
    FeatureRule("value_per_order", "lifetime_value / total_orders"),
    FeatureRule("is_recent_and_active", "recency_days < 1000 AND total_orders >= 10"),
)


def rule_driven_aggregation(silver_orders: DataFrame) -> DataFrame:
    """Driver-contract query: the demo aggregation rule compiled and run."""
    return apply_aggregation_rule(silver_orders, MONTHLY_REVENUE_RULE).orderBy(
        "order_year", "order_month", "order_status"
    )


def rule_quartile_aggregation(silver_orders: DataFrame) -> DataFrame:
    """Driver-contract query (BATCH face): the percentile demo rule
    compiled by the batch rule compiler — exact interpolated quartiles
    (`F.percentile`) beside count/sum measures. The DuckDB oracle's
    ``quantile_cont`` shares the two-sided interpolation formula
    ``(ceil(r)-r)*lo + (r-floor(r))*hi`` at rank ``r=(n-1)p``, so the
    comparison is bit-exact on the integer-valued measure."""
    return apply_aggregation_rule(silver_orders, QUARTILE_RULE).orderBy("order_status")


def rule_driven_features(lifetime_metrics: DataFrame) -> DataFrame:
    """Driver-contract query: feature rules over customer lifetime metrics."""
    return apply_feature_rules(
        lifetime_metrics.select("customer_key", "total_orders", "lifetime_value", "recency_days"),
        ENGAGEMENT_FEATURE_RULES,
    ).orderBy("customer_key")
