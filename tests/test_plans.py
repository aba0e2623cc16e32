"""Plan-shape regression guard: the shuffle/broadcast structure each
operator family documents is pinned here via ``plans.plan_summary`` —
a refactor that silently adds a corpus-wide exchange, drops a broadcast,
or un-pushes a scan filter fails this file, not a 100 TB cluster run."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from dataengineeringpipeline_spark import plans
from dataengineeringpipeline_spark.cache import release_caches


@pytest.fixture(autouse=True)
def _clean_cache_state(spark):
    """Compile every plan against a cache-free session.

    The test session's SparkSession is session-scoped, so a
    ``tracked_persist`` registered by an EARLIER test (several queries
    share the same ``spread`` subtree) leaks into this file's plans: a
    cached AdaptiveSparkPlan that some prior action finalized prints
    BOTH its Final and Initial plan, double-counting the cached
    subtree's Exchange and failing the shuffle bound for a query whose
    standalone plan is unchanged. bench.py gives each query the same
    isolation via ``release_caches`` between queries; the bounds here
    pin the standalone shape.

    Cleanup runs on BOTH sides of the test: compiling a plan here can
    itself register tracked persists (shared ``spread`` subtrees), and
    leaving them in the session would hand later-collected test files
    the same order-dependence this fixture exists to remove.
    """
    release_caches()
    spark.catalog.clearCache()
    yield
    release_caches()
    spark.catalog.clearCache()

#: name -> (max shuffles, min broadcast joins). Bounds are the measured
#: shape plus zero slack on shuffles (the claim under guard) and a lower
#: bound on broadcasts where the operator's scale story requires one.
PLAN_BOUNDS = {
    # map-only scan projections: zero exchanges of any kind
    "text_stats": (0, 0),
    "doc_fingerprints": (0, 0),
    "silver_orders": (0, 0),
    # single hash-agg / window families
    "exact_dedup": (1, 0),
    "daily_sales_summary": (3, 0),
    "event_type_summary": (3, 0),
    "classifier_quality_summary": (3, 0),
    # dim joins must broadcast the small side, never sort-merge
    "customer_analytics": (4, 1),
    "skew_join_segment_summary": (3, 1),
    # inverted-index / LSH fronts: bounded band/posting shuffles only
    "minhash_lsh_pairs": (3, 1),
    # +1 shuffle since r11: spread()'s repartition of the compact corpus
    # (projected to doc_id+text) before the tokenize/scoring stage — the
    # exchange that un-serializes single-partition inputs; no-op (and no
    # exchange) on well-partitioned cluster-scale input
    "lexical_search_topk": (7, 1),
    # +1 shuffle since r11: spread()'s repartition of the compact corpus
    # before the tokenize/explode passes (see lexical_search_topk note)
    "bigram_fluency": (6, 1),
    "shard_balance_report": (4, 1),
    "ann_ivf_topk": (4, 1),
    # PQ shortlist + re-rank: two top-k windows + persists, broadcast
    # codebook/query tables/shortlist; the interior shortlist sort is
    # gone (ordered=False) — a regrowth shows up as a 9th shuffle
    "pq_ann_topk": (8, 5),
    # token-blocked fuzzy join: vocabulary-sized shuffles only, the
    # block-size guard and record rejoin sides broadcast
    "fuzzy_join_matches": (9, 5),
    # BMP/WAV round trip is two chained mapInPandas passes — the only
    # exchange is the final presentation sort
    "multimodal_decode_report": (1, 0),
    # substring-dedup family: hash-keyed duplicate-set shuffle + doc-keyed
    # island shuffle(s); the duplicate-hash join side broadcasts at test
    # scale (AQE may legitimately pick either at corpus scale)
    "shared_span_pairs": (6, 1),
    "span_dedup_cleaned": (4, 1),
    # data card: md5 window + doc_id join + source agg, dup flags
    # broadcast at test scale; text never shuffles
    "corpus_datacard": (5, 1),
    # plant + scrub + md5 are pure projections; only the final
    # presentation sort exchanges
    "pii_redaction_report": (1, 0),
    # PIT join: daily-feature agg + one asof union window + final sort;
    # the purchase label filter must reach the scan
    "point_in_time_features": (3, 0),
    # leakage audit rides the persisted pair set; cluster labels and
    # verify candidates broadcast, band self-join is the only corpus
    # shuffle inside the LSH chain. 5→6 in r12: the Arrow shingle
    # kernel's repartition now lives directly inside the arrays cache,
    # and because this query's construction executes the CC size probe,
    # that cache's finalized AdaptiveSparkPlan prints BOTH its Final and
    # Initial plan — the SAME exchange string-counted twice (the
    # candidates-distinct exchange was already double-printed this way
    # in the r11 plan). Physical shuffles are unchanged: one spread
    # repartition, one band self-join + distinct, policy agg, final sort.
    "split_leakage_audit": (6, 1),
    # layout gauge: scalar agg + broadcast scalars + (layout,file) agg
    # (≤2·n_files groups) + 2-row final agg; scan reads 3 columns only
    "layout_pruning_report": (4, 1),
    # ANALYZE stats: the Expand-based multi-distinct agg runs ALONE
    # (2 exchanges) beside the plain stats agg (1), 1-row broadcast
    # crossjoin; stack is map-only
    "table_stats_report": (3, 1),
    # advisor: per join one fact key-count agg + scalar dim count,
    # 1-row crossjoins broadcast; scans read only the join keys
    "join_strategy_advisor": (9, 3),
    # CDC apply: batch latest-per-key window + union sort; the snapshot
    # side must pass through a broadcast left_anti (never shuffle)
    "cdc_order_snapshot": (3, 1),
    # IVM: base/delta partials + merge re-agg + presentation sort; the
    # date-split filters must reach the orders scan
    "incremental_daily_sales": (4, 0),
    # privacy gate: one grouped agg (+ distinct expand) + final shape
    "k_anon_release": (3, 0),
    "k_anon_audit": (3, 0),
    # calendar spine join: daily agg + bounds agg + spine join (the
    # calendar side broadcasts) + carry-forward window
    "gap_filled_daily_values": (3, 1),
    "ewma_value_summary": (3, 0),
    # association rules off the PERSISTED edge aggregate: degree aggs +
    # ranking window; 1-row total and dim sides broadcast
    "next_item_rules": (7, 3),
    # exact-k eval sample: ONE scan + pick-window exchange (k-bounded by
    # the engine's partial WindowGroupLimit, asserted below) +
    # presentation sort — no joins, nothing to broadcast
    "eval_sample_picks": (2, 0),
    # two ANALYZE passes (each: distinct agg alone + plain agg +
    # broadcast 1×1), column_name join broadcast
    "stats_drift_report": (6, 3),
    # monthly rollup off merged partials: base/delta partials + merge +
    # distinct-bearing month agg + presentation sort
    "monthly_sales_from_partials": (5, 0),
    # second IVM family: base/delta (customer, year) partials + merge
    # re-agg + customer fold; both date-split filters reach the scan and
    # the scan reads only the 4 needed columns
    "incremental_customer_metrics": (3, 0),
    # approx-NDV rule, batch face: persisted partials (count fold +
    # register digest read the cache, not the fact table), register
    # two-level agg + digest agg + presentation sort
    "rule_ndv_aggregation": (8, 1),
    # approx-NDV rule, incremental face: base/delta partials persist
    # once, merge + digest re-aggregate the cached stack (static plan
    # counts include the InMemoryRelation's cached subtree)
    "incremental_ndv_rule": (14, 3),
    # exact-percentile rule, incremental face: base/delta value-histogram
    # partials persist once; the main-measure fold and the histogram fold
    # (explode + one window pass over the merged histogram) read the
    # cache, not the fact table (static counts include the cached
    # subtree's own shuffles)
    "incremental_quartile_rule": (10, 3),
}


@pytest.mark.parametrize("name", sorted(PLAN_BOUNDS))
def test_plan_shape_is_pinned(spark, sf_dir, name):
    max_shuffles, min_bcast = PLAN_BOUNDS[name]
    df = entrymod.queries()[name](spark, sf_dir)
    s = plans.plan_summary(df)
    assert s["shuffles"] <= max_shuffles, f"{name} grew a shuffle: {s}"
    assert s["broadcast_joins"] >= min_bcast, f"{name} lost a broadcast: {s}"
    assert s["sort_merge_joins"] == 0, f"{name} fell back to sort-merge: {s}"


def test_silver_filter_reaches_scan(spark, sf_dir):
    """The incremental-extract watermark predicate must appear in
    PushedFilters (the 100 TB read-the-tail-not-the-table property)."""
    df = entrymod.queries()["incremental_events"](spark, sf_dir)
    pushed = plans.pushed_filters(df)
    assert any("ts" in p for p in pushed), pushed


def test_projection_prunes_scan_columns(spark, sf_dir):
    """A 2-column projection must not read the whole documents schema."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    two = docs.select("doc_id", "source")
    assert set(plans.scan_columns(two)) == {"doc_id", "source"}


def test_fixed_k_partial_group_limit_precedes_window_exchange(spark, sf_dir):
    """The pick window's shuffle must be k-bounded by the engine's
    rank-limit pushdown: a ``WindowGroupLimit ... Partial`` node (map
    side top-k per group, SPARK-37099) appears in the subtree UNDER the
    ``Exchange hashpartitioning(source...)`` node (in treeString,
    children print below parents), so each map task forwards at most k
    rows per group — the exchange never moves whole groups. Also pins
    that the query stays a single scan of documents (the earlier
    hand-built pre-prune cost five)."""
    import io
    import re
    from contextlib import redirect_stdout

    df = entrymod.queries()["eval_sample_picks"](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain()
    lines = buf.getvalue().splitlines()
    ok = False
    for i, ln in enumerate(lines):
        if re.search(r"Exchange hashpartitioning\(source", ln):
            if any(
                "WindowGroupLimit" in nxt and "Partial" in nxt
                for nxt in lines[i + 1 : i + 7]
            ):
                ok = True
                break
    assert ok, "no partial WindowGroupLimit under the pick-window exchange"
    scans = sum(1 for ln in lines if "FileScan" in ln and "documents" in ln)
    assert scans == 1, f"expected a single documents scan, saw {scans}"
