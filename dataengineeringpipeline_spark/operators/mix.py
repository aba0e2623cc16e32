"""Training-mix construction: hit a target domain composition exactly,
deterministically, with no global pass beyond one per-domain count.

A pretraining corpus is specified as *weights over domains* ("50% en,
15% zh, ..."), but the raw pool has whatever composition crawling
produced. The planner computes, per domain, the keep rate that realizes
the largest corpus achievable under the weights without upsampling any
domain (the scarcest weighted domain is used in full; every other domain
is downsampled to its proportional share). Sampling membership is the
same pure key-hash as :mod:`sampling` — stable under repartitioning,
retries, and engine swaps.

All planning arithmetic is integer (per-mille weights, floor division),
so the plan — and therefore the sampled corpus — is bit-identical in any
engine; the DuckDB oracle reproduces it exactly.

Scale shape: one count per domain (map-side partial agg over the
corpus), a ~|domains|-row plan broadcast back, and a pure map filter.
No full-corpus shuffle anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.operators.sampling import per_mille_bucket

#: Target composition (per mille) for the demo query over ``documents``.
#: Domains absent from the table are simply unachievable (rate 0 rows);
#: domains in the table but not in the target are dropped (weight 0).
MIX_WEIGHTS_PER_MILLE: dict[str, int] = {
    "en": 500,
    "zh": 150,
    "es": 150,
    "fr": 100,
    "de": 100,
}


def domain_mix_plan(
    docs: DataFrame,
    weights_per_mille: dict[str, int] | None = None,
    domain_col: str = "lang",
) -> DataFrame:
    """Per-domain sampling plan for the target mix.

    With integer weights ``W_d`` (summing to 1000) and availability
    ``n_d``, the largest total respecting the mix without upsampling is
    ``T = min_d floor(n_d * 1000 / W_d)``; domain ``d`` then contributes
    ``target_d = floor(W_d * T / 1000)`` docs, sampled at
    ``rate_pm_d = floor(target_d * 1000 / n_d)`` per mille.

    Returns one row per *targeted* domain:
    ``(domain, available, weight_pm, planned_target, rate_pm)``.
    """
    weights = weights_per_mille or MIX_WEIGHTS_PER_MILLE
    w_map = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(int(v)))]
    )
    avail = (
        docs.groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count(F.lit(1)).alias("available"))
        .withColumn("weight_pm", w_map[F.col("domain")])
        .filter(F.col("weight_pm").isNotNull())
    )
    # T over all weighted domains: an unpartitioned min window over
    # |domains| rows (post-aggregation — never the corpus itself).
    # Integer `div` end-to-end: floor-of-double would invite last-ulp
    # drift between engines; integer arithmetic is bit-exact everywhere.
    t_total = F.min(F.expr("(available * 1000) div weight_pm")).over(Window.partitionBy())
    return (
        avail.withColumn("t_total", t_total)
        .select(
            "domain",
            "available",
            "weight_pm",
            F.expr("(weight_pm * t_total) div 1000").alias("planned_target"),
        )
        .withColumn("rate_pm", F.expr("(planned_target * 1000) div available"))
    )


def domain_mix_sample(
    docs: DataFrame,
    weights_per_mille: dict[str, int] | None = None,
    domain_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """The sampled corpus realizing the target mix: join the (tiny,
    broadcast) plan and keep rows whose key-hash bucket clears the
    domain's rate. Pure map over the corpus — deterministic membership,
    no shuffle of the text."""
    plan = domain_mix_plan(docs, weights_per_mille, domain_col)
    return docs.join(
        F.broadcast(plan.select(F.col("domain").alias(domain_col), "rate_pm")),
        domain_col,
    ).filter(per_mille_bucket(key_col) < F.col("rate_pm"))


def domain_mix_summary(
    docs: DataFrame,
    weights_per_mille: dict[str, int] | None = None,
    domain_col: str = "lang",
    key_col: str = "doc_id",
) -> DataFrame:
    """Driver-contract query: the plan next to what it actually sampled —
    per domain: availability, weight, planned target, rate, kept count,
    and the achieved share of the sampled corpus."""
    plan = domain_mix_plan(docs, weights_per_mille, domain_col)
    kept = (
        domain_mix_sample(docs, weights_per_mille, domain_col, key_col)
        .groupBy(F.col(domain_col).alias("domain"))
        .agg(F.count(F.lit(1)).alias("kept_count"))
    )
    total_kept = F.sum("kept_count").over(Window.partitionBy())
    return (
        plan.join(kept, "domain", "left")
        .fillna({"kept_count": 0})
        .withColumn("achieved_share", F.col("kept_count") / total_kept)
        .select(
            "domain",
            "available",
            "weight_pm",
            "planned_target",
            "rate_pm",
            "kept_count",
            "achieved_share",
        )
        .orderBy("domain")
    )


def temperature_mix_plan(
    docs: DataFrame, domain_col: str = "source"
) -> DataFrame:
    """Temperature-based rebalancing plan (the multilingual-pretraining
    recipe: sample domains ∝ n^α instead of n, pulling the long tail up
    without the explicit weight table :func:`domain_mix_plan` needs).

    With α = 0.5 the plan has a closed per-domain form that never sums
    floats across domains: target share ∝ √n_d means keep rate
    r_d = √(n_min / n_d) — the scarcest domain is kept in full and every
    larger one downsampled toward equality. n_min is an exact integer
    MIN, each rate is one IEEE division + one sqrt (both
    correctly-rounded operations, so any engine computes the identical
    double), and the per-mille quantization floors that exact value.
    α = 0.5 is pinned deliberately: a general n^α needs pow(), whose
    last-ulp behavior is libm-specific (same reason the HLL estimator
    keeps ln out of its oracle); other temperatures belong in a
    test-asserted variant, not the oracle-exact surface.

    Scale shape: one per-domain count (map-side partials), a
    |domains|-row plan — the corpus itself is only touched by the
    map-only sample filter.
    """
    counts = docs.groupBy(F.col(domain_col).alias("domain")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs")
    )
    n_min = F.min("n_docs").over(Window.partitionBy()).cast("long")
    rate_pm = F.floor(
        F.lit(1000.0)
        * F.sqrt(n_min.cast("double") / F.col("n_docs").cast("double"))
    ).cast("int")
    return counts.select(
        "domain", "n_docs", n_min.alias("min_docs"), rate_pm.alias("rate_pm")
    )


def temperature_mix_summary(
    docs: DataFrame, domain_col: str = "source", key_col: str = "doc_id"
) -> DataFrame:
    """The α=0.5 plan next to what it actually keeps: per domain, raw
    share, keep rate, kept docs (deterministic per-mille hash
    membership), and the achieved share of the rebalanced corpus —
    which moves every domain toward √-proportionality."""
    plan = temperature_mix_plan(docs, domain_col)
    kept = (
        docs.join(
            F.broadcast(plan),
            docs[domain_col] == plan["domain"],
        )
        .filter(per_mille_bucket(key_col) < F.col("rate_pm"))
        .groupBy("domain")
        .agg(F.count(F.lit(1)).cast("long").alias("kept_docs"))
    )
    w = Window.partitionBy()
    total_raw = F.sum("n_docs").over(w).cast("long")
    total_kept = F.sum("kept_docs").over(w).cast("long")
    return (
        plan.join(kept, "domain", "left")
        .fillna({"kept_docs": 0})
        .select(
            "domain",
            "n_docs",
            (F.col("n_docs").cast("double") / total_raw.cast("double")).alias(
                "raw_share"
            ),
            "rate_pm",
            "kept_docs",
            (F.col("kept_docs").cast("double") / total_kept.cast("double")).alias(
                "kept_share"
            ),
        )
        .orderBy("domain")
    )

#: Default token budget for the demo planning query — sized so the
#: sf0.01 corpus needs upsampling (epochs > 1) for scarce domains while
#: bigger scale factors mix up- and down-sampling: the report shows both
#: regimes of the planner.
TOKEN_BUDGET_DEFAULT = 100_000


def token_budget_plan(
    docs: DataFrame,
    target_tokens: int = TOKEN_BUDGET_DEFAULT,
    weights_per_mille: dict[str, int] | None = None,
    domain_col: str = "lang",
) -> DataFrame:
    """Epoch/up-sampling plan to hit a total token budget at a target mix
    — the question a pretraining run actually asks ("1T tokens at 50% en
    / 15% zh / ...: how many passes over each domain?"), where
    :func:`domain_mix_plan` answers the no-upsampling variant.

    Domain ``d`` must supply ``target_d = floor(W_d * T / 1000)`` tokens
    from ``A_d`` available tokens (token counts are the same regex
    tokenizer as ``text_stats``; integer sums):

    - ``full_epochs = target_d div A_d`` — complete passes over the
      domain (0 when downsampling);
    - ``remainder_rate_pm = ((target_d mod A_d) * 1000) div A_d`` — the
      per-mille hash-sample rate for the final partial pass (the same
      deterministic membership as every sampler in this package);
    - ``oversample_x1000 = (target_d * 1000) div A_d`` — the domain's
      effective duplication factor ×1000 (the number a data card
      reports; >4-5× is the "repeating data hurts" red flag).

    All arithmetic is integer (floor division), so the plan is
    bit-identical in any engine. Scale shape: one integer-sum
    aggregation per domain over the corpus (map-side partials), then a
    |domains|-row projection; the corpus text never shuffles.

    Returns (domain, available_tokens, weight_pm, target_tokens,
    full_epochs, remainder_rate_pm, oversample_x1000) ordered by domain.
    """
    from dataengineeringpipeline_spark.operators.text import TOKEN_REGEX

    weights = weights_per_mille or MIX_WEIGHTS_PER_MILLE
    w_map = F.create_map(
        *[x for k, v in sorted(weights.items()) for x in (F.lit(k), F.lit(int(v)))]
    )
    avail = (
        docs.select(
            F.col(domain_col).alias("domain"),
            F.regexp_count("text", F.lit(TOKEN_REGEX)).cast("long").alias("toks"),
        )
        .groupBy("domain")
        .agg(F.sum("toks").alias("available_tokens"))
        .withColumn("weight_pm", w_map[F.col("domain")])
        .filter(F.col("weight_pm").isNotNull() & (F.col("available_tokens") > 0))
    )
    return (
        avail.withColumn(
            "target_tokens",
            F.expr(f"(weight_pm * CAST({int(target_tokens)} AS BIGINT)) div 1000"),
        )
        .select(
            "domain",
            "available_tokens",
            "weight_pm",
            "target_tokens",
            F.expr("target_tokens div available_tokens").alias("full_epochs"),
            F.expr("((target_tokens % available_tokens) * 1000) div available_tokens").alias(
                "remainder_rate_pm"
            ),
            F.expr("(target_tokens * 1000) div available_tokens").alias(
                "oversample_x1000"
            ),
        )
        .orderBy("domain")
    )
