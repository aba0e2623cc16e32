"""Deterministic stratified sampling — training-data class rebalancing.

``df.sampleBy`` draws from ``rand(seed)``, which is **row-order
dependent**: the same data repartitioned differently yields a different
sample, so a 1000-executor run isn't reproducible. This module samples by
an *arithmetic hash of the row key* instead — membership is a pure
function of the key, identical on any cluster layout and in any engine
(the DuckDB oracle reproduces it exactly).

The hash is a Knuth multiplicative step bounded to avoid 64-bit overflow:
``((key % 1_000_003) * 2_654_435_761) % 1000`` gives a uniform-enough
per-mille bucket for sampling decisions (the same integer-arithmetic
trick as the MinHash/LSH plane recipes in this repo).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Per-class keep rates (per mille) for the demo query: downsample the
#: high-volume low-signal classes, keep all business events.
EVENT_RATES_PER_MILLE = {
    "click": 100,
    "view": 100,
    "error": 500,
    "purchase": 1000,
    "signup": 1000,
}


def per_mille_bucket(key: str | Column) -> Column:
    """Deterministic [0, 1000) bucket from an integer key.

    ``pmod`` keeps the bucket non-negative for negative keys (Spark's
    ``%`` follows the dividend's sign, which would yield buckets in
    (-1000, 0] and silently skew any threshold comparison); identical to
    ``%`` for the non-negative keys the testdata uses."""
    c = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.pmod(c, F.lit(1_000_003)) * F.lit(2_654_435_761), F.lit(1000))


def stratified_sample(
    df: DataFrame, class_col: str, key_col: str, rates_per_mille: dict[str, int]
) -> DataFrame:
    """Keep each row iff its key's bucket falls under its class's rate.

    Unlisted classes are dropped (rate 0). The filter is a pure map —
    no shuffle, no state, and the sample is stable under repartitioning,
    retries, and incremental reprocessing (the property that matters
    when the sample feeds a training set that must not drift between
    pipeline runs).
    """
    rate = None
    for cls, r in sorted(rates_per_mille.items()):
        branch = F.when(F.col(class_col) == cls, F.lit(r))
        rate = branch if rate is None else rate.when(F.col(class_col) == cls, F.lit(r))
    rate = rate.otherwise(F.lit(0)) if rate is not None else F.lit(0)
    return df.filter(per_mille_bucket(key_col) < rate)


#: Default split budget (per mille): 80 / 10 / 10.
SPLIT_TRAIN_PM = 800
SPLIT_VAL_PM = 100


def leakage_safe_splits(
    docs: DataFrame, train_pm: int = SPLIT_TRAIN_PM, val_pm: int = SPLIT_VAL_PM
) -> DataFrame:
    """Train/val/test assignment that cannot leak near-duplicates across
    splits: the split decision hashes the document's *dedup cluster id*
    (its own id when unclustered), so every member of a near-dup cluster
    lands in the same split — the guard that keeps eval sets honest when
    the corpus contains paraphrase/boilerplate families. Random per-doc
    splitting would put one copy in train and its twin in test.

    Same pure key-hash membership as :func:`stratified_sample` —
    deterministic under repartitioning, retries, and engine swaps.
    Returns ``(doc_id, split_key, bucket, split)``.
    """
    from dataengineeringpipeline_spark.operators.dedup import minhash_dup_clusters

    clusters = minhash_dup_clusters(docs).select("doc_id", "cluster_id")
    key = F.coalesce(F.col("cluster_id"), F.col("doc_id"))
    bucket = per_mille_bucket(key)
    return (
        docs.select("doc_id")
        .join(clusters, "doc_id", "left")
        .select(
            "doc_id",
            key.alias("split_key"),
            bucket.cast("long").alias("bucket"),
            F.when(bucket < train_pm, "train")
            .when(bucket < train_pm + val_pm, "val")
            .otherwise("test")
            .alias("split"),
        )
    )


def split_summary(
    docs: DataFrame, train_pm: int = SPLIT_TRAIN_PM, val_pm: int = SPLIT_VAL_PM
) -> DataFrame:
    """Driver-contract query: per-split doc and distinct-cluster counts
    plus achieved share for :func:`leakage_safe_splits`."""
    assigned = leakage_safe_splits(docs, train_pm, val_pm)
    total = Window.partitionBy()
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.countDistinct("split_key").cast("long").alias("split_keys"),
        )
        .withColumn("doc_share", F.col("docs") / F.sum("docs").over(total))
        .orderBy("split")
    )


def split_leakage_audit(
    docs: DataFrame,
    train_pm: int = SPLIT_TRAIN_PM,
    val_pm: int = SPLIT_VAL_PM,
    threshold: float = 0.5,
) -> DataFrame:
    """Measure how much near-duplicate leakage a split policy lets
    through — the audit that justifies :func:`leakage_safe_splits`.

    For every *verified* near-dup pair (MinHash-LSH candidates, exact
    shingle-Jaccard ≥ ``threshold``), compute both endpoints' split
    under two policies and count pairs whose endpoints land in
    different splits:

    - ``naive``: bucket each doc by its own id — what a per-row
      ``rand()``/hash split does, and what most pipelines ship;
    - ``cluster_keyed``: bucket by the dedup-cluster id (the
      :func:`leakage_safe_splits` policy) — provably 0 cross-split
      pairs, which this audit asserts as data rather than as prose.

    ``train_eval_pairs`` is the damage that matters: a duplicate
    straddling train and val/test inflates eval scores.

    Scale shape: the audit rides the pair set, not the corpus — pairs
    are persisted once (the LSH chain runs once), cluster labels come
    from the same persisted pairs, and both policy rows come from ONE
    pass over the pairs (explode of two policy structs), so cost beyond
    the dedup itself is O(|pairs|). Cluster labels broadcast (the
    near-dup graph is orders of magnitude smaller than the corpus).
    """
    from dataengineeringpipeline_spark.operators.dedup import (
        connected_components,
        minhash_lsh_pairs,
    )
    from dataengineeringpipeline_spark.cache import tracked_persist

    # prune to the two consumed columns so the parquet scan under the
    # persisted shingle arrays never reads lang/source/n_chars
    docs = docs.select("doc_id", "text")
    pairs = tracked_persist(
        minhash_lsh_pairs(docs, threshold, ordered=False).select("doc_a", "doc_b")
    )
    clusters = connected_components(pairs)

    def split_of(key: Column) -> Column:
        b = per_mille_bucket(key)
        return (
            F.when(b < train_pm, "train")
            .when(b < train_pm + val_pm, "val")
            .otherwise("test")
        )

    ca = clusters.select(F.col("doc_id").alias("doc_a"), F.col("cluster_id").alias("cl_a"))
    cb = clusters.select(F.col("doc_id").alias("doc_b"), F.col("cluster_id").alias("cl_b"))
    per_policy = (
        pairs.join(F.broadcast(ca), "doc_a", "left")
        .join(F.broadcast(cb), "doc_b", "left")
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("cluster_keyed").alias("policy"),
                        split_of(F.coalesce("cl_a", "doc_a")).alias("split_a"),
                        split_of(F.coalesce("cl_b", "doc_b")).alias("split_b"),
                    ),
                    F.struct(
                        F.lit("naive").alias("policy"),
                        split_of(F.col("doc_a")).alias("split_a"),
                        split_of(F.col("doc_b")).alias("split_b"),
                    ),
                )
            ).alias("p")
        )
        .select("p.policy", "p.split_a", "p.split_b")
    )
    return (
        per_policy.groupBy("policy")
        .agg(
            F.count(F.lit(1)).cast("long").alias("dup_pairs"),
            F.sum(F.when(F.col("split_a") != F.col("split_b"), 1).otherwise(0))
            .cast("long")
            .alias("cross_split_pairs"),
            F.sum(
                F.when(
                    ((F.col("split_a") == "train") & (F.col("split_b") != "train"))
                    | ((F.col("split_b") == "train") & (F.col("split_a") != "train")),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("train_eval_pairs"),
        )
        .select(
            "policy",
            "dup_pairs",
            "cross_split_pairs",
            "train_eval_pairs",
            F.expr("(cross_split_pairs * 1000) div dup_pairs").cast("long").alias("leak_pm"),
        )
        .orderBy("policy")
    )


def stratified_sample_summary(events: DataFrame) -> DataFrame:
    """Driver-contract query: per-class input/kept counts and achieved
    keep rate for the demo rate table over ``events``."""
    kept = stratified_sample(events, "event_type", "event_id", EVENT_RATES_PER_MILLE).groupBy(
        "event_type"
    ).agg(F.count(F.lit(1)).alias("kept_count"))
    totals = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("input_count"))
    return (
        totals.join(kept, "event_type", "left")
        .fillna({"kept_count": 0})
        .select(
            "event_type",
            "input_count",
            "kept_count",
            (F.col("kept_count") / F.col("input_count")).alias("achieved_rate"),
        )
        .orderBy("event_type")
    )


def quality_weighted_sample(docs: DataFrame) -> DataFrame:
    """Quality-weighted corpus sampling: each document is kept with
    probability proportional to its quality score (the DCLM-style
    upweighting of clean text without a hard cutoff) — keep iff
    ``per_mille_bucket(doc_id) < quality_score·10``, so a score-100 doc
    always survives and a score-0 doc never does.

    Deterministic end to end: the score is integer arithmetic over the
    oracle-exact text stats and membership is the same pure key-hash as
    every sampler here — re-runs, retries, and engine swaps keep the
    identical corpus. Map-only over the stats projection (no shuffle,
    no RNG state)."""
    from dataengineeringpipeline_spark.operators.text import quality_score, text_stats

    scored = quality_score(text_stats(docs))
    return scored.filter(per_mille_bucket("doc_id") < F.col("quality_score") * 10)


def quality_sample_summary(docs: DataFrame) -> DataFrame:
    """Per score-decile report of what quality weighting keeps: docs,
    kept docs, the realized keep rate, and the expected rate
    (Σscore/(100·n)) it converges to — the observability face of
    :func:`quality_weighted_sample`."""
    from dataengineeringpipeline_spark.operators.text import quality_score, text_stats

    scored = quality_score(text_stats(docs)).select(
        (F.expr("quality_score div 10") * 10).cast("int").alias("band"),
        "quality_score",
        (per_mille_bucket("doc_id") < F.col("quality_score") * 10).alias("kept"),
    )
    return (
        scored.groupBy("band")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("kept").cast("long")).cast("long").alias("kept_docs"),
            F.sum("quality_score").cast("long").alias("_score_sum"),
        )
        .select(
            "band",
            "n_docs",
            "kept_docs",
            (F.col("kept_docs").cast("double") / F.col("n_docs").cast("double")).alias(
                "keep_rate"
            ),
            (
                F.col("_score_sum").cast("double")
                / (F.lit(100.0) * F.col("n_docs").cast("double"))
            ).alias("expected_rate"),
        )
        .orderBy("band")
    )


#: Hash modulus for the deterministic pick hash.
_PICK_P = 1_000_000_007


def _pick_hash(key_col: str):
    c = F.col(key_col)
    return F.pmod(
        F.pmod(c, F.lit(1_000_003)) * F.lit(2_654_435_761),
        F.lit(_PICK_P),
    )


def fixed_k_sample(
    df: DataFrame, group_col: str, key_col: str, k: int
) -> DataFrame:
    """EXACTLY ``k`` rows per group (fewer only if the group is
    smaller), picked deterministically: rows are ranked inside each
    group by an integer hash of their key (ties broken by the key
    itself) and the first ``k`` win. The eval-set constructor — "1000
    docs per source, same 1000 on every run, any cluster, any engine"
    — where rate-based sampling (:func:`stratified_sample`) can only
    promise a proportion.

    The hash is the same integer-arithmetic per-mille family as
    :func:`per_mille_bucket` widened to a large prime, so a SQL oracle
    reproduces the pick bit-for-bit.

    **Scale path (the 100 TB shape).** One window, one scan — and the
    engine itself bounds the shuffle: for a ``row_number() <= k``
    filter, Catalyst inserts ``WindowGroupLimit`` in *Partial* mode
    below the window's exchange (rank-limit pushdown, SPARK-37099 /
    Spark ≥3.5), so each map task forwards at most ``k`` rows per group
    — the exchange carries ``O(k · map_tasks)`` rows per group, never
    the group. The plan test pins the Partial node's presence under the
    exchange.

    A hand-built hash-threshold pre-prune (count → broadcast threshold
    → filter → window, with an exact-fallback branch for under-filled
    groups) was tried in an earlier round and REMOVED: it re-derived
    exactly what WindowGroupLimit already does, at the cost of five
    scans of the input (the threshold/survivor/fallback subtrees each
    re-scan — measured 1.0s vs 0.35s steady-state at sf0.1 for the
    naive form, which is also the plan that wins at 100 TB: one I/O
    pass, per-map-task in-memory sort, k-bounded shuffle).
    """
    from pyspark.sql.window import Window

    h = _pick_hash(key_col)
    w = Window.partitionBy(group_col).orderBy(h.alias("h"), F.col(key_col))
    return df.withColumn("pick_rank", F.row_number().over(w)).filter(
        F.col("pick_rank") <= k
    )


def eval_sample_picks(docs: DataFrame, k: int = 20) -> DataFrame:
    """Driver-contract query: the deterministic per-source eval sample
    — exactly ``k`` doc_ids per source, stable across runs, engines,
    and partitionings. ``(source, doc_id, pick_rank)``."""
    return (
        fixed_k_sample(docs.select("source", "doc_id"), "source", "doc_id", k)
        .select("source", "doc_id", "pick_rank")
        .orderBy("source", "pick_rank")
    )
