"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``dataengineeringpipeline_spark/``; this module
only wires (spark, sf_dir) -> DataFrame callables to their DuckDB oracle
SQL twins (``dataengineeringpipeline_spark/oracles.py``).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataengineeringpipeline_spark import (
    alerts,
    cleaning,
    datalake,
    events_analytics,
    features,
    featurestore,
    gold,
    ingest,
    ivm,
    quality,
    rules,
    scale,
    scd,
    streaming,
)
from dataengineeringpipeline_spark.operators import asof as asof_ops
from dataengineeringpipeline_spark.operators import bpe as bpe_ops
from dataengineeringpipeline_spark.operators import classify as classify_ops
from dataengineeringpipeline_spark.operators import corpus as corpus_ops
from dataengineeringpipeline_spark.operators import decontam as decontam_ops
from dataengineeringpipeline_spark.operators import dedup as dedup_ops
from dataengineeringpipeline_spark.operators import graph as graph_ops
from dataengineeringpipeline_spark.operators import layout as layout_ops
from dataengineeringpipeline_spark.operators import linkage as linkage_ops
from dataengineeringpipeline_spark.operators import mix as mix_ops
from dataengineeringpipeline_spark.operators import multimodal as mm_ops
from dataengineeringpipeline_spark.operators import sampling as sampling_ops
from dataengineeringpipeline_spark.operators import search as search_ops
from dataengineeringpipeline_spark.operators import similarity as sim_ops
from dataengineeringpipeline_spark.operators import text as text_ops
from dataengineeringpipeline_spark.operators import timeseries as ts_ops
from dataengineeringpipeline_spark.datalake import load_events
from dataengineeringpipeline_spark.oracles import ORACLES

DQ_RANGE_SPECS = [
    quality.RangeSpec("o_totalprice", 0.0, 600000.0),
    quality.RangeSpec("o_custkey", 1),
    quality.RangeSpec("o_orderstatus", allowed_values=("O", "F", "P")),
    quality.RangeSpec(
        "o_orderpriority",
        allowed_values=("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"),
    ),
]

SF0001 = "/root/testdata/sf0.001"

#: Strict rule set for the quarantine-selection query — deliberately
#: tighter than ORDERS_RULES so the failing-row set is non-empty.
QUARANTINE_RULES = (
    quality.Rule("price_under_400k", "total_price < 400000"),
    quality.Rule("status_is_final", "order_status IN ('O','F')"),
)


def _dq_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = _orders(spark, sf_dir)
    checks = [
        quality.referential_integrity(
            orders, "o_custkey", _read(spark, sf_dir, "customer"), "c_custkey", "orders_customer_fk"
        ),
        quality.referential_integrity(
            _read(spark, sf_dir, "lineitem"), "l_orderkey", orders, "o_orderkey", "lineitem_order_fk"
        ),
        quality.referential_integrity(
            _read(spark, sf_dir, "lineitem"), "l_partkey", _read(spark, sf_dir, "part"), "p_partkey", "lineitem_part_fk"
        ),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionByName(c)
    return out.orderBy("check_name")


def _orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))


def _read(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))


def _silver_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleaning.clean_orders(_orders(spark, sf_dir))


def _silver_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cleaning.clean_customers(
        _read(spark, sf_dir, "customer"),
        _read(spark, sf_dir, "nation"),
        _read(spark, sf_dir, "region"),
    ).drop("geography")  # struct kept in the library API; flat cols for the oracle


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: bronze→silver cleaning → daily sales summary."""
    return gold.daily_sales_summary(_silver_orders(spark, SF0001))


def _fuzzy_join_matches(spark: SparkSession, sf_dir: str) -> DataFrame:
    """An "arriving order batch" (every 40th part, half with the last
    character of the name dropped — a deterministic typo) fuzzy-joined
    back against the full part catalog: best match per batch record."""
    from pyspark.sql import functions as F

    part = _read(spark, sf_dir, "part")
    batch = part.filter(F.col("p_partkey") % 40 == 0).select(
        F.col("p_partkey").alias("batch_key"),
        F.when(
            F.col("p_partkey") % 80 == 0,
            F.expr("substring(p_name, 1, length(p_name) - 1)"),
        )
        .otherwise(F.col("p_name"))
        .alias("batch_name"),
    )
    return linkage_ops.fuzzy_join(
        batch, part, "batch_key", "batch_name", "p_partkey", "p_name"
    )


def _advisor_from_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE once, advise many: persist per-key join stats to a gold
    table, then recommend join strategies reading ONLY that
    metadata-sized table (no fact scan per advised join — the plan is
    asserted fact-free in tests/test_scale.py). Same demo thresholds
    and decision rule as ``join_strategy_advisor``."""
    import tempfile

    from dataengineeringpipeline_spark.datalake import Lake

    orders = _read(spark, sf_dir, "orders")
    customer = _read(spark, sf_dir, "customer")
    lineitem = _read(spark, sf_dir, "lineitem")
    events = _read(spark, sf_dir, "events")
    stats = (
        scale.analyze_join_keys("orders", orders, ["o_custkey", "o_orderkey"])
        .unionByName(scale.analyze_join_keys("lineitem", lineitem, ["l_orderkey"]))
        .unionByName(scale.analyze_join_keys("customer", customer, ["c_custkey"]))
        .unionByName(scale.analyze_join_keys("events", events, ["user_id"]))
    )
    lake = Lake(tempfile.mkdtemp(prefix="advisor_stats_"))
    lake.write(stats, "gold", "join_key_stats")
    joins = [
        ("orders", "o_custkey", "customer", "c_custkey", scale.est_row_bytes(customer)),
        ("lineitem", "l_orderkey", "orders", "o_orderkey", scale.est_row_bytes(orders)),
        ("events", "user_id", "events", "user_id", scale.est_row_bytes(events)),
    ]
    return scale.join_strategy_advisor_from_stats(
        lake.read(spark, "gold", "join_key_stats"),
        joins,
        broadcast_bytes=512 * 1024,
        hot_key_pm=5,
    )


#: The driver's correctness record covers roughly the first 50 entries of
#: ``queries()`` in insertion order. This list rotates the window each
#: round: lead with (a) queries NEW this round, then (b) queries whose
#: operator code changed this round, then (c) the block whose most
#: recent driver check is oldest (after r04 that is the r01 gold/dq/
#: events/silver block), then (d/e) the oldest remaining checks on the
#: files this round touched. Everything past the window is still
#: oracle-checked every round by tests/test_oracle_parity.py, which runs
#: ALL entries.
WINDOW_HEAD = [
    # ===== r11 window =====
    # (a) no new contract queries this round (the round's new surface —
    #     apply_layout_advice, the bounded applied-batch ledger, the
    #     N-column envelope prune — is physical-rewrite/sidecar
    #     machinery proven by tests, not new query semantics)
    # (b) operator code changed this round — re-prove every contract
    #     face riding the changed substrate: the applied-batch ledger
    #     switched to the bounded v2 representation (merge_changes /
    #     merge_scd2 / upsert_partitions / replace_table / the
    #     streaming fold all read+write it) and the composite-key
    #     envelope prune generalized to N columns
    "lake_cdc_merged_snapshot",
    "lake_backfill_merge_snapshot",
    "lake_scd2_merged_history",
    "streaming_lake_cdc_snapshot",
    # (c) the 46 queries whose most recent driver proof is r07 — the
    #     oldest block in the record (VERDICT r10 item 2's exact list,
    #     oldest-first rotation policy)
    "boilerplate_report",
    "category_performance",
    "chunk_summary",
    "cohort_retention",
    "comprehensive_sales_summary",
    "conversion_funnel",
    "customer_analytics",
    "customer_lifetime_metrics",
    "customer_priority_scd2",
    "customer_value_deciles",
    "daily_sales_summary",
    "decontamination_report",
    "domain_mix_summary",
    "eval_sample_picks",
    "event_heavy_hitters",
    "incident_window_events",
    "incremental_rule_aggregation",
    "item_pagerank",
    "lake_version_changes",
    "language_id_eval",
    "ml_customer_features",
    "monthly_sales_summary",
    "next_item_rules",
    "pack_summary",
    "priority_performance",
    "purchase_attribution",
    "repetition_stats",
    "rule_driven_aggregation",
    "rule_driven_features",
    "salted_status_summary",
    "segment_summary",
    "session_summary",
    "sliding_window_summary",
    "split_summary",
    "status_priority_cube",
    "stratified_sample_summary",
    "streaming_hourly_counts",
    "streaming_rule_aggregation",
    "streaming_session_counts",
    "streaming_severity_counts",
    "streaming_stats_drift",
    "text_quality",
    "text_stats",
    "token_histogram",
    "top_customers_per_segment",
    "value_quartile_profile",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    The dict below is grouped by subsystem; the returned dict is
    re-ordered so ``WINDOW_HEAD`` (this round's driver correctness
    window) leads. See the WINDOW_HEAD comment for the rotation policy.
    (bench.py iterates ``sorted(...)``, so the rotation affects only the
    driver's correctness window, never bench timings.)
    """
    q = _grouped_queries()
    missing = [k for k in WINDOW_HEAD if k not in q]
    if missing:  # fail loudly: a typo here would silently shrink coverage
        raise KeyError(f"WINDOW_HEAD names unknown queries: {missing}")
    return {**{k: q[k] for k in WINDOW_HEAD}, **{k: v for k, v in q.items() if k not in WINDOW_HEAD}}


def _grouped_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # -- structured streaming (availableNow drain over the backlog) -----
        "streaming_hourly_counts": streaming.streaming_hourly_counts,
        "streaming_severity_counts": streaming.streaming_severity_counts,
        "streaming_session_counts": streaming.streaming_session_counts,
        "streaming_session_windows": streaming.streaming_session_windows,
        "streaming_attribution_pairs": streaming.streaming_attribution_pairs,
        "streaming_volume_alerts": streaming.streaming_volume_alerts,
        "suppressed_volume_alerts": lambda spark, sf: alerts.suppress_repeats(
            streaming.streaming_volume_alerts(spark, sf)
        ),
        # -- streaming continuous-ingest dedup (incremental signature state)
        "streaming_incremental_dedup": streaming.streaming_incremental_dedup,
        "streaming_search_topk": streaming.streaming_search_topk,
        "streaming_quality_gate": streaming.streaming_quality_gate,
        "streaming_ann_topk": streaming.streaming_ann_topk,
        "streaming_feature_store_latest": streaming.streaming_feature_store_latest,
        # -- streaming CDC changelog apply (streaming face of cdc_apply) ----
        "streaming_cdc_snapshot": streaming.streaming_cdc_snapshot,
        # -- streaming SCD2 merge (dimension updates through Lake.merge_scd2)
        "streaming_scd2_history": streaming.streaming_scd2_history,
        # -- streaming CDC lake merge (changelog batches through
        #    Lake.merge_changes — physical Type-1 sibling) ----------------
        "streaming_lake_cdc_snapshot": streaming.streaming_lake_cdc_snapshot,
        # -- streaming quantile sketch (mergeable percentile monitor) -------
        "streaming_value_quantiles": streaming.streaming_value_quantiles,
        # -- streaming categorical-mix drift (streaming face of
        #    quality.category_drift) -------------------------------------
        "streaming_mix_drift": streaming.streaming_mix_drift,
        # -- event-time top-k heavy hitters per window (streaming twin of
        #    scale.key_skew_profile) --------------------------------------
        "streaming_heavy_hitters": streaming.streaming_heavy_hitters,
        # -- text analysis (training-data ops: stats/quality/lang-id/fp) ----
        "text_stats": lambda spark, sf: text_ops.text_stats(_read(spark, sf, "documents")),
        "text_quality": lambda spark, sf: text_ops.quality_score(
            text_ops.text_stats(_read(spark, sf, "documents"))
        ),
        "language_id_eval": lambda spark, sf: text_ops.language_id_eval(
            _read(spark, sf, "documents")
        ),
        "language_mix_by_source": lambda spark, sf: text_ops.language_mix_by_source(
            _read(spark, sf, "documents")
        ),
        "repetition_stats": lambda spark, sf: text_ops.repetition_stats(
            _read(spark, sf, "documents")
        ),
        "chunk_summary": lambda spark, sf: text_ops.chunk_summary(
            _read(spark, sf, "documents")
        ),
        "pack_summary": lambda spark, sf: text_ops.pack_summary(
            _read(spark, sf, "documents")
        ),
        # -- PII redaction (planted deterministic PII, md5-proved scrub) ----
        "pii_redaction_report": lambda spark, sf: text_ops.pii_redaction_report(
            _read(spark, sf, "documents")
        ),
        "token_histogram": lambda spark, sf: text_ops.token_histogram(
            _read(spark, sf, "documents")
        ),
        # -- lexical retrieval (inverted index, integer-IDF top-k) ----------
        "lexical_search_topk": lambda spark, sf: search_ops.lexical_search_topk(
            _read(spark, sf, "documents")
        ),
        # -- hybrid retrieval (integer reciprocal-rank fusion of the lexical
        #    and embedding-cosine lists) -------------------------------------
        "hybrid_search_topk": lambda spark, sf: search_ops.hybrid_search_topk(
            _read(spark, sf, "documents"), _read(spark, sf, "embeddings")
        ),
        "rag_context_stats": lambda spark, sf: search_ops.rag_context_stats(
            _read(spark, sf, "documents"), _read(spark, sf, "embeddings")
        ),
        # -- fuzzy record linkage / entity resolution (vocabulary-level
        #    blocking + Levenshtein verify + CC canonicalization) ------------
        "fuzzy_part_matches": lambda spark, sf: linkage_ops.fuzzy_name_pairs(
            _read(spark, sf, "part"), "p_partkey", "p_name"
        ),
        "entity_resolution_report": lambda spark, sf: linkage_ops.entity_resolution_report(
            _read(spark, sf, "part"), "p_partkey", "p_name"
        ),
        # -- two-table fuzzy join: a perturbed arriving batch matched
        #    against the part catalog (best match per batch record; the
        #    catalog's heavily duplicated names exercise the
        #    one-row-per-left-record guarantee) ---------------------------
        "fuzzy_join_matches": _fuzzy_join_matches,
        # -- classifier calibration vs the heuristic quality gate -----------
        # -- 2-of-3 majority-vote quality gate ensemble ----------------------
        "quality_gate_ensemble": lambda spark, sf: classify_ops.quality_gate_ensemble(
            _read(spark, sf, "documents")
        ),
        "classifier_calibration": lambda spark, sf: classify_ops.classifier_calibration(
            _read(spark, sf, "documents")
        ),
        # -- count-based LM fluency (integer perplexity proxy) --------------
        "bigram_fluency": lambda spark, sf: classify_ops.bigram_fluency(
            _read(spark, sf, "documents")
        ),
        # -- hot-key-split (skew) join; oracle is the PLAIN join ------------
        "skew_join_segment_summary": lambda spark, sf: scale.skew_join_segment_summary(
            load_events(spark, sf), _read(spark, sf, "customer")
        ),
        # -- model-based quality gate (hashed n-gram linear classifier) -----
        "classifier_quality_summary": lambda spark, sf: classify_ops.classifier_quality_summary(
            _read(spark, sf, "documents")
        ),
        # -- BPE tokenizer induction (iterative merge learning, oracle-exact
        #    via unrolled-CTE twin) ------------------------------------------
        "bpe_merge_table": lambda spark, sf: bpe_ops.bpe_merge_table(
            _read(spark, sf, "documents")
        ),
        "bpe_subword_stats": lambda spark, sf: bpe_ops.bpe_subword_stats(
            _read(spark, sf, "documents")
        ),
        "doc_length_distribution": lambda spark, sf: text_ops.doc_length_distribution(
            _read(spark, sf, "documents")
        ),
        # -- deduplication (exact / n-gram Jaccard / MinHash-LSH / SimHash) -
        "exact_dedup": lambda spark, sf: dedup_ops.exact_dedup(_read(spark, sf, "documents")),
        "duplicate_span_coverage": lambda spark, sf: dedup_ops.duplicate_span_coverage(
            _read(spark, sf, "documents")
        ),
        # -- cross-document verbatim-span pairs (quote/contamination
        #    evidence the coverage readout above cannot attribute) ----------
        "shared_span_pairs": lambda spark, sf: dedup_ops.shared_span_pairs(
            _read(spark, sf, "documents")
        ),
        # -- substring-dedup APPLICATION: delete corpus-repeated spans;
        #    cleaned text proved bit-exact via md5 ------------------------
        "span_dedup_cleaned": lambda spark, sf: dedup_ops.remove_duplicate_spans(
            _read(spark, sf, "documents")
        ),
        "ngram_jaccard_pairs": lambda spark, sf: dedup_ops.ngram_jaccard_pairs(
            _read(spark, sf, "documents")
        ),
        "minhash_lsh_pairs": lambda spark, sf: dedup_ops.minhash_lsh_pairs(
            _read(spark, sf, "documents")
        ),
        "minhash_dup_clusters": lambda spark, sf: dedup_ops.minhash_dup_clusters(
            _read(spark, sf, "documents")
        ),
        "minhash_recall": lambda spark, sf: dedup_ops.minhash_recall(
            _read(spark, sf, "documents")
        ),
        "dedup_survivors": lambda spark, sf: dedup_ops.dedup_survivors(
            _read(spark, sf, "documents")
        ),
        # -- cross-source duplication matrix (which feeds mirror each other)
        "source_overlap_matrix": lambda spark, sf: dedup_ops.source_overlap_matrix(
            _read(spark, sf, "documents")
        ),
        # -- cross-modal: lexical ∪ semantic near-dup evidence ---------------
        "hybrid_dup_clusters": lambda spark, sf: dedup_ops.hybrid_dup_clusters(
            _read(spark, sf, "documents"), _read(spark, sf, "embeddings")
        ),
        "simhash_dup_candidates": lambda spark, sf: dedup_ops.simhash_dup_candidates(
            _read(spark, sf, "documents")
        ),
        # -- corpus hygiene (benchmark decontamination + boilerplate) -------
        "decontamination_report": lambda spark, sf: decontam_ops.decontamination_report(
            _read(spark, sf, "documents")
        ),
        "top_ngrams_per_source": lambda spark, sf: decontam_ops.top_ngrams_per_source(
            _read(spark, sf, "documents")
        ),
        "boilerplate_report": lambda spark, sf: decontam_ops.boilerplate_report(
            _read(spark, sf, "documents")
        ),
        # -- end-to-end corpus construction (scrub→dedup→gates→chunk→pack) --
        "training_corpus_funnel": lambda spark, sf: corpus_ops.training_corpus_funnel(
            _read(spark, sf, "documents")
        ),
        # -- snapshot policy diff (two gate policies over one scored pass) --
        "snapshot_diff_report": lambda spark, sf: corpus_ops.snapshot_diff_report(
            _read(spark, sf, "documents")
        ),
        # -- per-source dataset release card --
        "corpus_datacard": lambda spark, sf: corpus_ops.corpus_datacard(
            _read(spark, sf, "documents")
        ),
        # -- training shards (deterministic global shuffle, balance gauge) --
        "shard_balance_report": lambda spark, sf: corpus_ops.shard_balance_report(
            _read(spark, sf, "documents")
        ),
        # -- multimodal (binary payloads + Arrow-batched feature kernel) ----
        "multimodal_features": lambda spark, sf: mm_ops.multimodal_features(
            _read(spark, sf, "documents")
        ),
        # -- real BMP/WAV round trip through decode_media -------------------
        "multimodal_decode_report": lambda spark, sf: mm_ops.multimodal_decode_report(
            _read(spark, sf, "documents")
        ),
        "frame_sample_plan": lambda spark, sf: mm_ops.frame_sample_plan(
            mm_ops.attach_payloads(_read(spark, sf, "documents"))
        ).orderBy("doc_id", "chunk_idx"),
        # -- deterministic stratified sampling (training-set rebalancing) ---
        "quality_sample_summary": lambda spark, sf: sampling_ops.quality_sample_summary(
            _read(spark, sf, "documents")
        ),
        # -- exact-k per-source eval sample (deterministic picks) -----------
        "eval_sample_picks": lambda spark, sf: sampling_ops.eval_sample_picks(
            _read(spark, sf, "documents")
        ),
        "stratified_sample_summary": lambda spark, sf: sampling_ops.stratified_sample_summary(
            load_events(spark, sf)
        ),
        # -- leakage-safe splits (cluster-hashed train/val/test) ------------
        # -- cross-split near-dup leakage audit (naive vs cluster-keyed) ----
        "split_leakage_audit": lambda spark, sf: sampling_ops.split_leakage_audit(
            _read(spark, sf, "documents")
        ),
        "split_summary": lambda spark, sf: sampling_ops.split_summary(
            _read(spark, sf, "documents")
        ),
        # -- domain-mix planning + hash-deterministic sampling --------------
        "temperature_mix_summary": lambda spark, sf: mix_ops.temperature_mix_summary(
            _read(spark, sf, "documents")
        ),
        "domain_mix_summary": lambda spark, sf: mix_ops.domain_mix_summary(
            _read(spark, sf, "documents")
        ),
        # -- token-budget epoch planning (upsampling/epoch math per domain) -
        "token_budget_plan": lambda spark, sf: mix_ops.token_budget_plan(
            _read(spark, sf, "documents")
        ),
        # -- embedding similarity search (brute-force + IVF + LSH near-dup) -
        "ann_bruteforce_topk": lambda spark, sf: sim_ops.ann_bruteforce_topk(
            _read(spark, sf, "embeddings")
        ),
        "semantic_decontamination": lambda spark, sf: sim_ops.semantic_decontamination(
            _read(spark, sf, "embeddings")
        ),
        "ann_ivf_topk": lambda spark, sf: sim_ops.ann_ivf_topk(_read(spark, sf, "embeddings")),
        "ann_ivf_recall": lambda spark, sf: sim_ops.ann_ivf_recall(_read(spark, sf, "embeddings")),
        "embedding_near_dups": lambda spark, sf: sim_ops.embedding_near_dups(
            _read(spark, sf, "embeddings")
        ),
        "semantic_dup_clusters": lambda spark, sf: sim_ops.semantic_dup_clusters(
            _read(spark, sf, "embeddings")
        ),
        # -- per-cluster label composition (cluster-balanced mixing input) --
        "semantic_cluster_mix": lambda spark, sf: sim_ops.cluster_label_mix(
            _read(spark, sf, "embeddings")
        ),
        # -- k-NN majority-vote label eval (held-out split; "do my
        #    embeddings encode my labels" gauge) ---------------------------
        "knn_label_eval": lambda spark, sf: sim_ops.knn_label_eval(
            _read(spark, sf, "embeddings")
        ),
        # -- Arrow/numpy scale kernel vs fold kernel (rows-only gauge: the
        #    SIMD matmul's float order differs in the last ulp by design) -
        "ann_arrow_recall": lambda spark, sf: sim_ops.ann_arrow_recall(
            _read(spark, sf, "embeddings")
        ),
        # -- product quantization (64x-compressed ADC + exact re-rank) ------
        "pq_ann_topk": lambda spark, sf: sim_ops.pq_topk_rerank(_read(spark, sf, "embeddings")),
        # -- contrastive pair mining (dup positives vs stride negatives) ----
        "contrastive_pairs_report": lambda spark, sf: sim_ops.contrastive_pairs_report(
            _read(spark, sf, "documents"), _read(spark, sf, "embeddings")
        ),
        "pq_ann_recall": lambda spark, sf: sim_ops.pq_recall(_read(spark, sf, "embeddings")),
        # -- IVF+PQ composed (FAISS-IVFPQ topology: probe -> ADC -> re-rank)
        "ann_ivfpq_topk": lambda spark, sf: sim_ops.ann_ivfpq_topk(
            _read(spark, sf, "embeddings")
        ),
        # -- event analytics (§2.9 batch side + lag/lead sessionization) ----
        "sliding_window_summary": lambda spark, sf: events_analytics.sliding_window_summary(
            load_events(spark, sf)
        ),
        # -- as-of join (point-in-time attribution; operators/asof.py) ------
        "purchase_attribution": lambda spark, sf: asof_ops.purchase_attribution(
            load_events(spark, sf)
        ),
        # -- bucketed interval join (point-in-interval; operators/asof.py) --
        "incident_window_events": lambda spark, sf: asof_ops.incident_window_events(
            load_events(spark, sf)
        ),
        "session_summary": lambda spark, sf: events_analytics.session_summary(load_events(spark, sf)),
        # -- product analytics: cohort retention + ordered funnel -----------
        "cohort_retention": lambda spark, sf: events_analytics.cohort_retention(
            load_events(spark, sf)
        ),
        "conversion_funnel": lambda spark, sf: events_analytics.conversion_funnel(
            load_events(spark, sf)
        ),
        # -- SCD Type-2 versioned dimension history -------------------------
        "customer_priority_scd2": lambda spark, sf: scd.customer_priority_scd2(
            _orders(spark, sf)
        ),
        # -- CDC changelog apply (Type-1 latest-state sibling) --------------
        "cdc_order_snapshot": lambda spark, sf: scd.cdc_order_snapshot(
            _orders(spark, sf), _read(spark, sf, "lineitem")
        ),
        # -- incremental ingestion + feature store --------------------------
        "feature_store_latest": lambda spark, sf: featurestore.feature_store_latest(
            load_events(spark, sf)
        ),
        # -- point-in-time-correct training join (leakage-free features) ----
        "point_in_time_features": lambda spark, sf: featurestore.point_in_time_features(
            load_events(spark, sf)
        ),
        # -- delete propagation (opt-out purge + erasure-proof audit) --------
        "forget_users_report": lambda spark, sf: datalake.forget_users_report(spark, sf),
        # -- lakehouse MERGE INTO: file-pruned physical CDC apply ------------
        # -- ADD-COLUMN schema evolution: sidecar schema rides the swap,
        #    pre-evolution files read the new column as NULL ------------
        "lake_schema_evolution_snapshot": lambda spark, sf: datalake.lake_schema_evolution_snapshot(
            spark, sf
        ),
        # -- per-file bloom index: point-lookup data skipping ----------
        "lake_point_lookup_orders": lambda spark, sf: datalake.lake_point_lookup_orders(
            spark, sf
        ),
        # -- partial-column MERGE (UPDATE SET subset) ------------------
        "lake_partial_update_snapshot": lambda spark, sf: datalake.lake_partial_update_snapshot(
            spark, sf
        ),
        "lake_cdc_merged_snapshot": lambda spark, sf: datalake.lake_cdc_merged_snapshot(
            spark, sf
        ),
        # -- backfill MERGE: distributed key path (no driver key collect) --
        "lake_backfill_merge_snapshot": lambda spark, sf: datalake.lake_backfill_merge_snapshot(
            spark, sf
        ),
        # -- bloom index maintained THROUGH a merge: lookup still prunes --
        "lake_indexed_merge_lookup": lambda spark, sf: datalake.lake_indexed_merge_lookup(
            spark, sf
        ),
        # -- lakehouse SCD2 MERGE: file-pruned physical history apply --------
        "lake_scd2_merged_history": lambda spark, sf: datalake.lake_scd2_merged_history(
            spark, sf
        ),
        # -- lakehouse time travel: hard-linked snapshots across a MERGE ----
        "lake_time_travel_totals": lambda spark, sf: datalake.lake_time_travel_totals(
            spark, sf
        ),
        # -- snapshot retention: expire_snapshots + stale-stage vacuum ------
        "lake_retention_totals": lambda spark, sf: datalake.lake_retention_totals(
            spark, sf
        ),
        # -- change data feed read off two snapshots (Delta CDF analog) -----
        "lake_version_changes": lambda spark, sf: datalake.lake_version_changes(
            spark, sf
        ),
        # -- ANALYZE-style catalog statistics (CBO surface) ------------------
        "table_stats_report": lambda spark, sf: quality.table_stats(
            _read(spark, sf, "orders")
        ),
        # -- Z-order layout planning (file-pruning economics) ---------------
        "layout_pruning_report": lambda spark, sf: layout_ops.layout_pruning_report(
            _read(spark, sf, "events")
        ),
        # -- layout advisor: observed predicates → bloom/cluster/zorder plan
        "layout_advisor_report": lambda spark, sf: layout_ops.layout_advisor_report(
            load_events(spark, sf)
        ),
        # -- join strategy advisor (broadcast / hot-key-split / shuffle) ----
        # demo thresholds: 512 KiB ceiling + 0.5% hot-key bar so all three
        # branches are exercised at test SFs (production defaults: 10 MiB /
        # 5% — scale.BROADCAST_BYTES_DEFAULT / HOT_KEY_PM_DEFAULT)
        "join_strategy_advisor": lambda spark, sf: scale.join_strategy_advisor(
            [
                ("orders", _read(spark, sf, "orders"), "o_custkey",
                 "customer", _read(spark, sf, "customer"), "c_custkey"),
                ("lineitem", _read(spark, sf, "lineitem"), "l_orderkey",
                 "orders", _read(spark, sf, "orders"), "o_orderkey"),
                ("events", _read(spark, sf, "events"), "user_id",
                 "events", _read(spark, sf, "events"), "user_id"),
            ],
            broadcast_bytes=512 * 1024,
            hot_key_pm=5,
        ),
        # -- advisor fed from persisted ANALYZE stats (CBO loop) ------------
        "advisor_from_stats": _advisor_from_stats,
        # -- heavy-hitter skew triage (scale.py) ----------------------------
        "event_heavy_hitters": lambda spark, sf: scale.key_skew_profile(
            load_events(spark, sf), ["user_id"], top_n=20
        ),
        # -- count-min sketch heavy hitters (bounded-state skew triage) -----
        "cms_heavy_hitters": lambda spark, sf: scale.cms_heavy_hitters(
            load_events(spark, sf), "user_id", top_n=20
        ),
        # -- HyperLogLog distinct sketch (bounded-state distinct counts) ----
        "hll_sketch_summary": lambda spark, sf: scale.hll_sketch_summary(
            _read(spark, sf, "events")
        ),
        # -- log-linear quantile sketch (bounded-state percentiles, with
        #    the exact-quantile gauge alongside) ----------------------------
        "value_quantile_sketch": lambda spark, sf: scale.quantile_sketch_report(
            load_events(spark, sf).select(
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            ),
            "cents",
            ("event_type",),
        ),
        # -- quartile-bucket profile: sketch edges broadcast back for a
        #    map-only assignment (ANALYZE once, transform many) -------------
        "value_quartile_profile": lambda spark, sf: scale.value_quartile_profile(
            load_events(spark, sf).select(
                "event_type",
                F.round(F.col("value") * 100).cast("long").alias("cents"),
            ),
            "cents",
            ("event_type",),
        ),
        # -- Bloom-filter join pruning (semi-join reduction, scale.py) ------
        "bloom_join_prune": lambda spark, sf: scale.bloom_prune_stats(
            _read(spark, sf, "orders"),
            _read(spark, sf, "customer").filter("c_mktsegment = 'BUILDING'"),
            "o_custkey",
            "c_custkey",
        ),
        # -- categorical distribution drift monitor (quality.py) ------------
        "priority_drift_report": lambda spark, sf: quality.category_drift(
            _read(spark, sf, "orders"), "o_orderpriority", "o_orderdate", "1999-01-01"
        ),
        "value_drift_report": lambda spark, sf: quality.numeric_drift(
            load_events(spark, sf), "value", "ts_us", 19_738 * 86_400_000_000
        ),
        # -- skew-safe two-stage aggregation (scale.py) ---------------------
        "salted_status_summary": lambda spark, sf: scale.salted_aggregate(
            _silver_orders(spark, sf).select("order_status", "total_price"),
            ["order_status"],
            {
                "order_count": "count:*",
                "revenue": "sum:total_price",
                "min_price": "min:total_price",
                "max_price": "max:total_price",
            },
        ).orderBy("order_status"),
        # -- config-driven rule compilers (§2.10) ---------------------------
        "rule_driven_aggregation": lambda spark, sf: rules.rule_driven_aggregation(
            _silver_orders(spark, sf)
        ),
        "rule_driven_features": lambda spark, sf: rules.rule_driven_features(
            gold.customer_lifetime_metrics(_silver_orders(spark, sf))
        ),
        # -- generic rule-IVM: the SAME config, maintained incrementally ----
        "incremental_rule_aggregation": lambda spark, sf: ivm.incremental_rule_aggregation(
            _silver_orders(spark, sf)
        ),
        # -- ...and streamed: config-driven per-batch partials, merge-on-read
        "streaming_rule_aggregation": streaming.streaming_rule_aggregation,
        # -- approx-NDV rule through the IVM compiler: HLL register-map
        #    partials, integer-digest oracle, three bit-identical faces --
        "rule_ndv_aggregation": lambda spark, sf: ivm.rule_ndv_aggregation(
            _silver_orders(spark, sf)
        ),
        "incremental_ndv_rule": lambda spark, sf: ivm.incremental_ndv_rule(
            _silver_orders(spark, sf)
        ),
        # -- join-IVM: in-place delta refresh of the customer-360 gold
        #    table (partials absorb the delta, touched keys' rows
        #    re-derive and MERGE, footer-pruned) == full recompute ----
        "incremental_gold_refresh": lambda spark, sf: ivm.incremental_gold_refresh(
            spark, sf
        ),
        "streaming_gold_refresh": streaming.streaming_gold_refresh,
        # -- backfill face: shuffle semi joins + distributed merge ------
        "large_delta_gold_refresh": lambda spark, sf: ivm.large_delta_gold_refresh(
            spark, sf
        ),
        # -- ...and for ANY configured rule: live summary table refreshed
        #    in place on its composite grain key -------------------------
        "incremental_rule_summary_table": lambda spark, sf: ivm.incremental_rule_summary_table(
            spark, sf
        ),
        "streaming_rule_summary_table": streaming.streaming_rule_summary_table,
        # -- rule-config evolution: migrate_rule then ordinary refresh --
        "rule_migration_summary": lambda spark, sf: ivm.rule_migration_summary(
            spark, sf
        ),
        "streaming_ndv_rule": streaming.streaming_ndv_rule,
        # -- exact percentile rule through the IVM compiler: value-histogram
        #    partials, interpolation replayed bit-exactly, three faces --
        "rule_quartile_aggregation": lambda spark, sf: rules.rule_quartile_aggregation(
            _silver_orders(spark, sf)
        ),
        "incremental_quartile_rule": lambda spark, sf: ivm.incremental_quartile_rule(
            _silver_orders(spark, sf)
        ),
        "streaming_quartile_rule": streaming.streaming_quartile_rule,
        "status_priority_cube": lambda spark, sf: gold.status_priority_cube(
            _silver_orders(spark, sf)
        ),
        "customer_value_deciles": lambda spark, sf: gold.customer_value_deciles(
            _silver_orders(spark, sf)
        ),
        "dq_daily_anomalies": lambda spark, sf: quality.daily_volume_anomalies(
            _silver_orders(spark, sf)
        ),
        # -- alert classification + routing (severity-ranked, channel fan-out)
        "pipeline_alerts": lambda spark, sf: alerts.pipeline_alerts(
            _silver_orders(spark, sf)
        ),
        # -- ML feature engineering (A4 + §2.8 + deterministic split) -------
        "ml_customer_features": lambda spark, sf: features.ml_customer_features(
            _silver_orders(spark, sf)
        ),
        # -- gold aggregations (A1-A8, W2, U1, J1/J2, A5, P5) ---------------
        "daily_sales_summary": lambda spark, sf: gold.daily_sales_summary(_silver_orders(spark, sf)),
        "daily_metrics_long": lambda spark, sf: gold.daily_metrics_long(_silver_orders(spark, sf)),
        # -- incremental materialized-view maintenance: merged partials
        #    must reproduce the full-recompute summary bit-for-bit --------
        "incremental_daily_sales": lambda spark, sf: ivm.incremental_daily_sales(
            _silver_orders(spark, sf)
        ),
        # -- second IVM family: 11-measure customer metrics off mergeable
        #    (customer_key, order_year)-grain partials ---------------------
        "incremental_customer_metrics": lambda spark, sf: ivm.incremental_customer_metrics(
            _silver_orders(spark, sf)
        ),
        # -- second granularity off the SAME partials (rollup hierarchy) ----
        "monthly_sales_from_partials": lambda spark, sf: ivm.monthly_sales_from_partials(
            _silver_orders(spark, sf)
        ),
        # -- streaming IVM: per-batch partials, merge-on-read ---------------
        "streaming_daily_sales": streaming.streaming_daily_sales,
        "monthly_sales_summary": lambda spark, sf: gold.monthly_sales_summary(_silver_orders(spark, sf)),
        "sales_rollup": lambda spark, sf: gold.sales_rollup(_silver_orders(spark, sf)),
        "priority_performance": lambda spark, sf: gold.priority_performance(_silver_orders(spark, sf)),
        "comprehensive_sales_summary": lambda spark, sf: gold.comprehensive_sales_summary(
            _silver_orders(spark, sf)
        ),
        "customer_lifetime_metrics": lambda spark, sf: gold.customer_lifetime_metrics(
            _silver_orders(spark, sf)
        ),
        "customer_analytics": lambda spark, sf: gold.customer_analytics(
            _silver_customers(spark, sf), _silver_orders(spark, sf)
        ),
        "top_customers_per_segment": lambda spark, sf: gold.top_customers_per_segment(
            gold.customer_analytics(_silver_customers(spark, sf), _silver_orders(spark, sf))
        ),
        "segment_summary": lambda spark, sf: gold.segment_summary(
            gold.customer_analytics(_silver_customers(spark, sf), _silver_orders(spark, sf))
        ),
        "supplier_performance": lambda spark, sf: gold.supplier_performance(
            _read(spark, sf, "supplier"),
            _read(spark, sf, "nation"),
            cleaning.clean_lineitems(_read(spark, sf, "lineitem")),
        ),
        "category_performance": lambda spark, sf: gold.category_performance(
            cleaning.clean_lineitems(_read(spark, sf, "lineitem")),
            cleaning.clean_parts(_read(spark, sf, "part")),
        ),
        # -- data quality: rule engine + joins/sorts-heavy checks -----------
        "dq_rule_report": lambda spark, sf: quality.evaluate_rules(
            _silver_orders(spark, sf), quality.ORDERS_RULES
        ),
        "dq_outliers": lambda spark, sf: quality.iqr_outlier_bounds(
            _orders(spark, sf), "o_totalprice"
        ),
        "dq_referential_integrity": _dq_referential_integrity,
        "dq_quarantine_rows": lambda spark, sf: quality.failing_rows(
            _silver_orders(spark, sf), QUARANTINE_RULES
        ).select("order_key", "order_status", "total_price", "order_date").orderBy("order_key"),
        # ===== lowest-risk tail (beyond the driver's ~50-query window) =====
        # These trail on purpose: the silver cleaners run transitively
        # inside every gold query above, the trailing events queries are
        # near-duplicates of in-window patterns (A7 group-count, lag/lead
        # windows), and everything here is still oracle-checked by
        # tests/test_oracle_parity.py.
        # -- event analytics near-duplicates --------------------------------
        "doc_fingerprints": lambda spark, sf: text_ops.fingerprint(_read(spark, sf, "documents")),
        "events_enriched": lambda spark, sf: events_analytics.enrich_events(load_events(spark, sf)),
        # -- link-graph analytics: PageRank over the item-transition graph --
        "item_pagerank": lambda spark, sf: graph_ops.item_pagerank(
            load_events(spark, sf)
        ),
        # -- association-rule mining: top-3 next items per source item ------
        "next_item_rules": lambda spark, sf: graph_ops.next_item_rules(
            load_events(spark, sf)
        ),
        # -- time-series shaping: calendar gap-fill + EWMA fold -------------
        "gap_filled_daily_values": lambda spark, sf: ts_ops.gap_filled_daily_values(
            load_events(spark, sf)
        ),
        "ewma_value_summary": lambda spark, sf: ts_ops.ewma_value_summary(
            load_events(spark, sf)
        ),
        # -- streaming ANALYZE: per-batch mergeable stats partials, drift
        #    vs the latest persisted snapshot, merged-on-read ---------------
        "streaming_stats_drift": streaming.streaming_stats_drift,
        # -- ANALYZE-to-ANALYZE drift between two snapshots ------------------
        "stats_drift_report": lambda spark, sf: quality.stats_drift(
            _orders(spark, sf).filter(
                F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date")
            ),
            _orders(spark, sf).filter(
                F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date")
            ),
        ),
        # -- privacy: k-anonymous aggregate release + suppression audit -----
        "k_anon_release": lambda spark, sf: quality.k_anonymous_release(
            load_events(spark, sf),
            ["event_date", "event_hour", "event_type"],
            "user_id",
            "value",
            k=3,
        ),
        "k_anon_audit": lambda spark, sf: quality.k_anon_audit(
            load_events(spark, sf),
            ["event_date", "event_hour", "event_type"],
            "user_id",
            k=3,
        ),
        "incremental_events": lambda spark, sf: ingest.incremental_events(
            load_events(spark, sf)
        ),
        "hourly_event_summary": lambda spark, sf: events_analytics.hourly_event_summary(
            load_events(spark, sf)
        ),
        "event_type_summary": lambda spark, sf: events_analytics.event_type_summary(
            load_events(spark, sf)
        ),
        "error_context": lambda spark, sf: events_analytics.error_context(load_events(spark, sf)),
        "user_activity_summary": lambda spark, sf: events_analytics.user_activity_summary(
            load_events(spark, sf)
        ),
        # -- bronze→silver cleaning (P1/P4/P6, §2.8 scalar functions) -------
        "silver_orders": _silver_orders,
        "silver_customers": _silver_customers,
        "silver_parts": lambda spark, sf: cleaning.clean_parts(_read(spark, sf, "part")),
        "silver_lineitems": lambda spark, sf: cleaning.clean_lineitems(_read(spark, sf, "lineitem")),
        # -- data quality: single-pass profiling checks ---------------------
        "dq_null_profile": lambda spark, sf: quality.null_profile(_orders(spark, sf)),
        "dq_duplicates": lambda spark, sf: quality.duplicate_stats(
            _orders(spark, sf), ["o_custkey", "o_orderdate"]
        ),
        "dq_range_violations": lambda spark, sf: quality.range_violations(
            _orders(spark, sf), DQ_RANGE_SPECS
        ),
        "dq_freshness": lambda spark, sf: quality.freshness_check(
            load_events(spark, sf), "ts_us", quality.EVENTS_AS_OF_US
        ),
    }


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each query (sans non-SQL-expressible ops)."""
    return {name: ORACLES[name] for name in queries() if name in ORACLES}
