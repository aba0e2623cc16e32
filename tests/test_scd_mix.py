"""SCD Type-2 and domain-mix operators: semantics not covered by the
oracle sweep (incremental merge, mix invariants, cluster properties)."""

from __future__ import annotations

import datetime

import pytest

from dataengineeringpipeline_spark import scd
from dataengineeringpipeline_spark.operators import mix as mix_ops


def _d(s: str) -> datetime.date:
    return datetime.date.fromisoformat(s)


def _hist_rows(df):
    rows = [
        (
            r["customer_key"],
            r["priority"],
            r["valid_from"],
            r["valid_to"],
            r["version"],
            r["is_current"],
        )
        for r in df.collect()
    ]
    return sorted(rows, key=lambda t: (t[0], t[4]))


def test_scd2_history_suppresses_dups_and_chains_intervals(spark):
    changes = spark.createDataFrame(
        [
            # key 1: A, A (suppressed), B, A  -> 3 versions
            (1, "A", _d("2024-01-01"), 10),
            (1, "A", _d("2024-02-01"), 11),
            (1, "B", _d("2024-03-01"), 12),
            (1, "A", _d("2024-04-01"), 13),
            # key 2: same-day tie broken by order_key: B(5) then A(6)
            (2, "B", _d("2024-01-15"), 5),
            (2, "A", _d("2024-01-15"), 6),
        ],
        "customer_key int, priority string, change_date date, order_key int",
    )
    hist = scd.scd2_history(
        changes, ["customer_key"], ["priority"], "change_date", ["order_key"]
    )
    assert _hist_rows(hist) == [
        (1, "A", _d("2024-01-01"), _d("2024-03-01"), 1, False),
        (1, "B", _d("2024-03-01"), _d("2024-04-01"), 2, False),
        (1, "A", _d("2024-04-01"), None, 3, True),
        (2, "B", _d("2024-01-15"), _d("2024-01-15"), 1, False),
        (2, "A", _d("2024-01-15"), None, 2, True),
    ]


def test_scd2_merge_touches_only_updated_keys(spark):
    changes = spark.createDataFrame(
        [
            (1, "A", _d("2024-01-01"), 1),
            (1, "B", _d("2024-02-01"), 2),
            (2, "X", _d("2024-01-01"), 3),
        ],
        "customer_key int, priority string, change_date date, order_key int",
    )
    dim = scd.scd2_history(
        changes, ["customer_key"], ["priority"], "change_date", ["order_key"]
    )
    updates = spark.createDataFrame(
        [
            (1, "C", _d("2024-03-01"), 4),  # changes key 1
            (2, "X", _d("2024-04-01"), 5),  # no-op: same attrs as current
            (3, "N", _d("2024-03-15"), 6),  # brand-new key
        ],
        "customer_key int, priority string, change_date date, order_key int",
    )
    merged = scd.scd2_apply_changes(
        dim, updates, ["customer_key"], ["priority"], "change_date", ["order_key"]
    )
    assert _hist_rows(merged) == [
        (1, "A", _d("2024-01-01"), _d("2024-02-01"), 1, False),
        (1, "B", _d("2024-02-01"), _d("2024-03-01"), 2, False),
        (1, "C", _d("2024-03-01"), None, 3, True),
        (2, "X", _d("2024-01-01"), None, 1, True),
        (3, "N", _d("2024-03-15"), None, 1, True),
    ]
    # idempotence: re-applying the same batch changes nothing
    again = scd.scd2_apply_changes(
        merged, updates, ["customer_key"], ["priority"], "change_date", ["order_key"]
    )
    assert _hist_rows(again) == _hist_rows(merged)


def test_scd2_merge_splices_late_arriving_change(spark):
    changes = spark.createDataFrame(
        [(1, "A", _d("2024-01-01"), 1), (1, "C", _d("2024-03-01"), 2)],
        "customer_key int, priority string, change_date date, order_key int",
    )
    dim = scd.scd2_history(
        changes, ["customer_key"], ["priority"], "change_date", ["order_key"]
    )
    late = spark.createDataFrame(
        [(1, "B", _d("2024-02-01"), 3)],
        "customer_key int, priority string, change_date date, order_key int",
    )
    merged = scd.scd2_apply_changes(
        dim, late, ["customer_key"], ["priority"], "change_date", ["order_key"]
    )
    assert _hist_rows(merged) == [
        (1, "A", _d("2024-01-01"), _d("2024-02-01"), 1, False),
        (1, "B", _d("2024-02-01"), _d("2024-03-01"), 2, False),
        (1, "C", _d("2024-03-01"), None, 3, True),
    ]


def test_domain_mix_invariants(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    summary = {r["domain"]: r for r in mix_ops.domain_mix_summary(docs).collect()}
    weights = mix_ops.MIX_WEIGHTS_PER_MILLE
    assert set(summary) <= set(weights)
    for d, row in summary.items():
        # never upsample: target and kept within availability
        assert 0 <= row["planned_target"] <= row["available"]
        assert 0 <= row["kept_count"] <= row["available"]
        assert 0 <= row["rate_pm"] <= 1000
    # the scarcest weighted domain is used at (nearly) full rate
    assert any(row["rate_pm"] >= 990 for row in summary.values())
    # achieved shares sum to 1 and track the target weights loosely
    # (hash-sampling noise at small n, hence the wide tolerance)
    total_share = sum(row["achieved_share"] for row in summary.values())
    assert total_share == pytest.approx(1.0)
    for d, row in summary.items():
        assert row["achieved_share"] == pytest.approx(weights[d] / 1000, abs=0.08)
    # deterministic under repartitioning
    again = {
        r["domain"]: r["kept_count"]
        for r in mix_ops.domain_mix_summary(docs.repartition(13)).collect()
    }
    assert again == {d: row["kept_count"] for d, row in summary.items()}


def test_semantic_dup_clusters_match_pair_graph(spark, sf_dir):
    from dataengineeringpipeline_spark.operators import similarity as sim

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    pairs = sim.embedding_near_dups(emb).collect()
    clusters = sim.semantic_dup_clusters(emb).collect()
    label = {r["vec_id"]: r["cluster_id"] for r in clusters}
    # every pair endpoint is clustered together
    for p in pairs:
        assert label[p["vec_a"]] == label[p["vec_b"]]
    # cluster ids are the min member, canonical flag matches
    by_cluster: dict[int, list[int]] = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], []).append(r["vec_id"])
    for cid, members in by_cluster.items():
        assert cid == min(members)
    for r in clusters:
        assert r["is_canonical"] == (r["vec_id"] == r["cluster_id"])
        assert r["cluster_size"] == len(by_cluster[r["cluster_id"]])


def test_temperature_mix_closed_form_rates(spark):
    """Counts 100 vs 400: the scarce domain keeps everything (rate 1000),
    the big one keeps floor(1000*sqrt(100/400)) = 500 per mille — the
    sqrt rebalance toward equality."""
    from dataengineeringpipeline_spark.operators import mix

    rows = [(i, "small") for i in range(100)] + [
        (1000 + i, "big") for i in range(400)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    plan = {r["domain"]: r for r in mix.temperature_mix_plan(docs).collect()}
    assert plan["small"]["rate_pm"] == 1000
    assert plan["big"]["rate_pm"] == 500
    summ = {r["domain"]: r for r in mix.temperature_mix_summary(docs).collect()}
    assert summ["small"]["kept_docs"] == 100  # scarcest domain kept in full
    # kept shares move toward the sqrt proportions (1:2 instead of 1:4)
    assert summ["big"]["kept_share"] < 0.75
    assert abs(summ["big"]["kept_docs"] / 400 - 0.5) < 0.1  # ~rate_pm/1000


def test_quality_weighted_sample_keeps_extremes_correctly(spark):
    """Score-100 docs always survive, score-0 docs never do, and the
    kept set is exactly the predicted hash membership."""
    from dataengineeringpipeline_spark.operators import sampling
    from dataengineeringpipeline_spark.operators.text import quality_score, text_stats
    from pyspark.sql import functions as F

    rich = (
        "the quick brown fox jumps over a lazy dog near the riverbank and "
        "watches bright clouds drift while distant hills catch evening light "
        "from a slow amber sun that settles behind tall quiet pines today "
        "with gentle wind moving soft grass beside clear shallow water and "
        "further along worn stone paths small birds gather seeds before dusk"
    )
    rows = [(i, rich) for i in range(50)] + [(1000 + i, "!!! ??? ...") for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string").withColumn(
        "lang", F.lit("en")
    ).withColumn("source", F.lit("s"))
    scored = {r["doc_id"]: r["quality_score"] for r in quality_score(text_stats(docs)).collect()}
    assert all(scored[i] == 100 for i in range(50))
    junk_score = scored[1000]
    assert junk_score <= 30  # junk lands in a low band
    # membership is exactly the per-mille hash model, for every doc
    predicted = {
        d for d, s in scored.items() if ((d % 1000003) * 2654435761) % 1000 < s * 10
    }
    kept = {r["doc_id"] for r in sampling.quality_weighted_sample(docs).collect()}
    assert kept == predicted
    assert set(range(50)) <= kept  # score-100 docs always survive
    summ = {r["band"]: r for r in sampling.quality_sample_summary(docs).collect()}
    assert summ[100]["keep_rate"] == 1.0 and summ[100]["expected_rate"] == 1.0
    low = summ[(junk_score // 10) * 10]
    assert low["kept_docs"] == len(predicted - set(range(50)))
    assert low["expected_rate"] == junk_score / 100.0


# -- training shards ---------------------------------------------------------


def test_shard_assignments_deterministic_and_total(spark, sf_dir):
    from dataengineeringpipeline_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    a1 = {r["doc_id"]: (r["shard"], r["sort_key"]) for r in corpus.shard_assignments(docs).collect()}
    a2 = {r["doc_id"]: (r["shard"], r["sort_key"]) for r in corpus.shard_assignments(docs).collect()}
    assert a1 == a2  # reproducible, no RNG
    assert len(a1) == docs.count()  # every doc assigned exactly once
    assert all(0 <= s < corpus.N_SHARDS for s, _ in a1.values())
    # a different seed is a different permutation
    a3 = {r["doc_id"]: r["sort_key"] for r in corpus.shard_assignments(docs, seed=1).collect()}
    assert any(a3[d] != a1[d][1] for d in a3)


def test_materialized_shards_are_shuffled_and_complete(spark, sf_dir, tmp_path):
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lake = Lake(str(tmp_path / "lake"))
    corpus.materialize_training_shards(docs, lake, snapshot="t1", n_shards=4)
    back = lake.read(spark, "gold", "corpus_t1_shards")
    assert back.count() == docs.count()
    assert set(r["shard"] for r in back.select("shard").distinct().collect()) <= set(range(4))
    # within a shard file, rows come back in sort_key order (trainer
    # streams the shuffled order with no further sort)
    import glob

    files = glob.glob(str(tmp_path / "lake" / "gold" / "corpus_t1_shards" / "shard=0" / "*.parquet"))
    assert files
    one = spark.read.parquet(files[0]).select("sort_key").collect()
    keys = [r["sort_key"] for r in one]
    assert keys == sorted(keys)


def test_shard_balance_within_tolerance(spark, sf_dir):
    from dataengineeringpipeline_spark.operators import corpus

    rows = corpus.shard_balance_report(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    ).collect()
    total_pm = sum(r["docs_pm"] for r in rows)
    assert 1000 - corpus.N_SHARDS <= total_pm <= 1000  # floor rounding only
    # hash balance: no shard is more than ~3x the fair share at test scale
    fair = 1000 // corpus.N_SHARDS
    assert all(r["docs_pm"] <= 3 * fair + 10 for r in rows)


def test_snapshot_diff_counts_added_removed(spark, sf_dir, tmp_path):
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lake = Lake(str(tmp_path / "lake"))
    corpus.materialize_corpus(docs, lake, snapshot="va")
    # snapshot B sees a corpus missing some docs (simulates new gates /
    # a different crawl): every surviving id with doc_id % 7 == 0 gone
    corpus.materialize_corpus(docs.filter("doc_id % 7 != 0"), lake, snapshot="vb")
    row = corpus.snapshot_diff(spark, lake, "va", "vb").collect()[0]
    ids_a = {r["doc_id"] for r in corpus.read_corpus(spark, lake, "va")["keep_ids"].collect()}
    ids_b = {r["doc_id"] for r in corpus.read_corpus(spark, lake, "vb")["keep_ids"].collect()}
    assert row["docs_a"] == len(ids_a)
    assert row["docs_b"] == len(ids_b)
    assert row["kept_both"] == len(ids_a & ids_b)
    assert row["added"] == len(ids_b - ids_a)
    assert row["removed"] == len(ids_a - ids_b)
    assert row["churn_pm"] == (row["added"] * 1000) // row["docs_b"]


def test_snapshot_diff_report_matches_policy_filters(spark, sf_dir, tmp_path):
    """The two-policy harness must equal independently computed keep sets:
    snapshot X = corpus_keep_ids under gates X (same dedup threshold)."""
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.operators import corpus

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    lake = Lake(str(tmp_path / "lake"))
    row = corpus.snapshot_diff_report(docs, lake).collect()[0]
    qa, ra = corpus.SNAPSHOT_GATES_A
    qb, rb = corpus.SNAPSHOT_GATES_B
    ids_a = {r["doc_id"] for r in corpus.corpus_keep_ids(docs, qa, ra).collect()}
    ids_b = {r["doc_id"] for r in corpus.corpus_keep_ids(docs, qb, rb).collect()}
    assert row["docs_a"] == len(ids_a)
    assert row["docs_b"] == len(ids_b)
    assert row["kept_both"] == len(ids_a & ids_b)
    assert row["added"] == len(ids_b - ids_a)
    assert row["removed"] == len(ids_a - ids_b)
    # the fixture corpus must exercise both directions of the diff
    assert row["added"] > 0 and row["removed"] > 0


def test_corpus_datacard_flags_planted_duplicates(spark):
    """Closed-form card: 3 sources, one with a planted exact duplicate
    pair, one bilingual — rates are integer per-mille."""
    from dataengineeringpipeline_spark.operators import corpus

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again", "en", "a"),
        (2, "the quick brown fox jumps over the lazy dog again and again", "en", "a"),
        (3, "completely different text with many unusual distinct words here", "en", "a"),
        (4, "bonjour le monde tout le monde est ici aujourd'hui", "fr", "b"),
        (5, "hello world everyone is here today for the meeting", "en", "b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")
    card = {r["source"]: r for r in corpus.corpus_datacard(docs).collect()}
    assert card["a"]["docs"] == 3 and card["b"]["docs"] == 2
    assert card["a"]["exact_dup_pm"] == (2 * 1000) // 3
    assert card["b"]["exact_dup_pm"] == 0
    assert card["a"]["english_pm"] == 1000 and card["b"]["english_pm"] == 500
    assert card["a"]["langs"] == 1 and card["b"]["langs"] == 2
    assert card["a"]["tokens"] > 0


# -- CDC apply (Type-1 latest-state changelog) ------------------------------


def _cdc_fixtures(spark):
    from pyspark.sql import Row

    snap = spark.createDataFrame(
        [(1, "A", 10.0, "2020-01-01"), (2, "B", 20.0, "2020-01-02"),
         (3, "C", 30.0, "2020-01-03")],
        "k long, status string, price double, ts string",
    )
    chg = spark.createDataFrame(
        [
            # key 1: two updates then a delete — terminal D wins
            (1, "U", "A2", 11.0, "2020-02-01", 1),
            (1, "U", "A3", 12.0, "2020-02-02", 1),
            (1, "D", "A3", 12.0, "2020-02-03", 1),
            # key 2: churn collapses to the latest update (same ts,
            # tiebreak decides)
            (2, "U", "B2", 21.0, "2020-02-01", 1),
            (2, "U", "B3", 22.0, "2020-02-01", 2),
            # key 4: insert of a key the snapshot never had
            (4, "U", "D1", 40.0, "2020-02-01", 1),
            # key 5: insert immediately tombstoned in the same batch
            (5, "U", "E1", 50.0, "2020-02-01", 1),
            (5, "D", "E1", 50.0, "2020-02-02", 1),
        ],
        "k long, op string, status string, price double, ts string, tb int",
    )
    return snap, chg


def test_cdc_apply_semantics(spark):
    """Latest-per-key wins, 'D' tombstones (even unseen keys), untouched
    rows pass through verbatim."""
    from dataengineeringpipeline_spark.scd import cdc_apply

    snap, chg = _cdc_fixtures(spark)
    out = {
        r["k"]: r
        for r in cdc_apply(
            snap, chg, ["k"], "ts", op_col="op", tiebreak_cols=["tb"]
        ).collect()
    }
    assert set(out) == {2, 3, 4}          # 1 and 5 deleted, 3 untouched
    assert out[2]["status"] == "B3" and out[2]["price"] == 22.0
    assert out[3]["status"] == "C" and out[3]["ts"] == "2020-01-03"
    assert out[4]["status"] == "D1"


def test_cdc_apply_snapshot_never_shuffles(spark):
    """The untouched side goes through a broadcast left_anti — the
    snapshot must not appear under any shuffle exchange (the 100 TB
    property: only the batch shuffles)."""
    from dataengineeringpipeline_spark.scd import cdc_apply

    snap, chg = _cdc_fixtures(spark)
    plan = cdc_apply(
        snap, chg, ["k"], "ts", op_col="op", tiebreak_cols=["tb"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_cdc_apply_idempotent_replay(spark):
    """Re-applying the same batch to the applied snapshot is a no-op —
    the at-least-once delivery property a CDC consumer needs."""
    from dataengineeringpipeline_spark.scd import cdc_apply

    snap, chg = _cdc_fixtures(spark)
    once = cdc_apply(snap, chg, ["k"], "ts", op_col="op", tiebreak_cols=["tb"])
    twice = cdc_apply(once, chg, ["k"], "ts", op_col="op", tiebreak_cols=["tb"])
    a = sorted(map(tuple, once.collect()))
    b = sorted(map(tuple, twice.collect()))
    assert a == b


# -- k-anonymity release gate ------------------------------------------------


def test_k_anon_release_suppresses_small_groups(spark):
    from dataengineeringpipeline_spark import quality

    rows = (
        # group 'big': 4 distinct users, 6 rows
        [("big", u, 1.0) for u in (1, 2, 3, 4)]
        + [("big", 1, 2.0), ("big", 2, 2.0)]
        # group 'small': 2 distinct users (5 rows — row count must NOT
        # rescue a group with too few individuals)
        + [("small", 9, 1.0)] * 3
        + [("small", 8, 1.0)] * 2
    )
    df = spark.createDataFrame(rows, "g string, user_id long, value double")
    rel = quality.k_anonymous_release(df, ["g"], "user_id", "value", k=3).collect()
    assert [r["g"] for r in rel] == ["big"]
    assert rel[0]["n_individuals"] == 4 and rel[0]["n_rows"] == 6
    assert rel[0]["total_value"] == 8.0

    audit = quality.k_anon_audit(df, ["g"], "user_id", k=3).collect()[0]
    assert audit["k"] == 3
    assert audit["released_groups"] == 1 and audit["suppressed_groups"] == 1
    assert audit["suppressed_rows"] == 5
    assert audit["suppressed_rows_pm"] == 5 * 1000 // 11


def test_stats_drift_flags_planted_shifts(spark):
    from dataengineeringpipeline_spark import quality

    old = spark.createDataFrame(
        [(i, float(i % 50), "A") for i in range(100)],
        "k long, v double, s string",
    )
    # new: half the rows, nulls introduced in v, wider v range, new max s
    new = spark.createDataFrame(
        [(i, None if i % 5 == 0 else float(i * 7 % 300), "B") for i in range(50)],
        "k long, v double, s string",
    )
    d = {r["column_name"]: r for r in quality.stats_drift(old, new).collect()}
    assert d["k"]["rows_ratio_pm"] == 500
    assert d["v"]["null_pm_old"] == 0 and d["v"]["null_pm_new"] == 200
    assert d["v"]["max_widened"] and not d["v"]["min_widened"]
    assert d["s"]["max_widened"] and not d["s"]["min_widened"]  # 'B' > 'A'
    assert d["k"]["ndv_ratio_pm"] == 500


def test_stats_drift_empty_old_gives_null_ratios(spark):
    from dataengineeringpipeline_spark import quality

    old = spark.createDataFrame([], "k long")
    new = spark.createDataFrame([(1,), (2,)], "k long")
    r = quality.stats_drift(old, new).collect()[0]
    assert r["rows_ratio_pm"] is None and r["ndv_ratio_pm"] is None
    assert r["null_pm_new"] == 0


def test_stats_from_partials_equals_table_stats(spark, sf_dir):
    """Mergeable stats partials over disjoint slices fold back to the
    one-shot ANALYZE bit-for-bit — every column type branch (numeric,
    timestamp, string) exercised on the raw orders table."""
    import os

    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import quality

    from functools import reduce

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    slices = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    counters = reduce(
        lambda a, b: a.unionByName(b),
        [quality.stats_counter_partials(s) for s in slices],
    )
    distincts = reduce(
        lambda a, b: a.unionByName(b),
        [quality.stats_distinct_partials(s) for s in slices],
    )
    got = quality.stats_from_partials(counters, distincts).collect()
    want = quality.table_stats(orders).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_streaming_stats_drift_crash_replay(spark, sf_dir, tmp_path):
    """Wiping the last stream commit and re-draining in a FRESH process
    must leave the final drift identical (batch partitions overwrite
    themselves), and the streamed drift equals the batch one-shot diff."""
    import os
    import subprocess
    import sys

    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import quality, streaming
    from dataengineeringpipeline_spark.datalake import Lake

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    d = F.col("o_orderdate").cast("date")
    old = orders.filter(d < F.lit("1997-01-01").cast("date"))
    new = orders.filter(d >= F.lit("1997-01-01").cast("date"))
    lake = Lake(str(tmp_path / "lake"))
    lake.write(
        quality.table_stats(old)
        .withColumn("table_name", F.lit("orders"))
        .withColumn("snapshot_date", F.lit("1997-01-01").cast("date")),
        "gold",
        "stats_snapshots",
        partition_by=("snapshot_date",),
    )
    src, state, ckpt = (str(tmp_path / p) for p in ("in", "state", "ckpt"))
    os.makedirs(src)
    streaming._stage_arrival_batches(new, F.expr("o_orderkey % 3"), src, 3)
    ddl = (
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp_ntz, o_orderpriority string"
    )
    snap_path = lake.path("gold", "stats_snapshots")
    streaming.stream_stats_drift(spark, src, snap_path, state, ckpt, ddl)

    def final_drift():
        drift = spark.read.parquet(f"{state}/drift")
        last = drift.agg(F.max("batch_id")).collect()[0][0]
        return sorted(
            map(tuple, drift.filter(F.col("batch_id") == last).drop("batch_id").collect())
        )

    got = final_drift()
    want = sorted(map(tuple, quality.stats_drift(old, new).collect()))
    assert got == want

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
streaming.stream_stats_drift(spark, {src!r}, {snap_path!r}, {state!r}, {ckpt!r}, {ddl!r})
print("REPLAY_DONE")
"""
    proc = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True, timeout=300
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "REPLAY_DONE" in proc.stdout
    assert final_drift() == want


def test_merge_scd2_prunes_by_footer_envelope(spark, tmp_path):
    """Lake SCD2 MERGE: an update batch touching one key range rewrites
    only that range's file; other files hard-link through byte-identical
    (same inode, same mtime); brand-new keys' fresh histories need no
    rewrite; the merged table equals the logical scd2_apply_changes."""
    import os

    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.scd import scd2_apply_changes, scd2_history

    lake = Lake(str(tmp_path))
    changes = spark.createDataFrame(
        [(i, f"A{i % 3}", float(i % 5), i) for i in range(1000)],
        "k long, attr string, ts double, tb long",
    )
    hist = scd2_history(
        changes, ["k"], ["attr"], "ts", tiebreak_cols=["tb"], carry_cols=["tb"]
    )
    lake.write(
        hist.repartitionByRange(10, "k").sortWithinPartitions("k"), "gold", "h"
    )
    path = lake.path("gold", "h")

    def state():
        return {
            f: (
                os.stat(os.path.join(path, f)).st_ino,
                os.stat(os.path.join(path, f)).st_mtime_ns,
            )
            for f in os.listdir(path)
            if f.endswith(".parquet")
        }

    before = state()
    dim_before = lake.read(spark, "gold", "h")
    upd = spark.createDataFrame(
        [(340, "NEW", 99.0, 9001), (5000, "FRESH", 1.0, 9002)],
        "k long, attr string, ts double, tb long",
    )
    audit = lake.merge_scd2(
        spark,
        "gold",
        "h",
        upd,
        key_col="k",
        attr_cols=("attr",),
        ts_col="ts",
        tiebreak_cols=("tb",),
        carry_cols=("tb",),
    )
    assert audit["files_total"] == 10 and audit["files_rewritten"] == 1

    after = state()
    untouched = set(before) & set(after)
    assert len(untouched) == 9
    for f in untouched:
        assert before[f] == after[f]

    got = sorted(map(tuple, lake.read(spark, "gold", "h").collect()))
    want = sorted(
        map(
            tuple,
            scd2_apply_changes(
                hist, upd, ["k"], ["attr"], "ts",
                tiebreak_cols=["tb"], carry_cols=["tb"],
            ).collect(),
        )
    )
    assert got == want
    # the brand-new key opened a fresh v1 history
    fresh = [r for r in got if r[0] == 5000]
    assert len(fresh) == 1 and fresh[0][1] == "FRESH"


def test_merge_scd2_empty_batch_is_zero_io(spark, tmp_path):
    import os

    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.scd import scd2_history

    lake = Lake(str(tmp_path))
    ch = spark.createDataFrame(
        [(1, "A", 1.0), (1, "B", 2.0)], "k long, attr string, ts double"
    )
    lake.write(scd2_history(ch, ["k"], ["attr"], "ts"), "gold", "h")
    path = lake.path("gold", "h")
    before = {
        f: os.stat(os.path.join(path, f)).st_mtime_ns for f in os.listdir(path)
    }
    audit = lake.merge_scd2(
        spark,
        "gold",
        "h",
        spark.createDataFrame([], "k long, attr string, ts double"),
        key_col="k",
        attr_cols=("attr",),
        ts_col="ts",
    )
    assert audit["files_rewritten"] == 0
    assert audit["rows_before"] == audit["rows_after"]
    after = {
        f: os.stat(os.path.join(path, f)).st_mtime_ns for f in os.listdir(path)
    }
    assert before == after


def test_ndv_sketch_partials_merge_close_to_exact(spark, sf_dir):
    """The HLL dial: sketch partials over disjoint slices union-merge to
    per-column NDV estimates within a few percent of the exact counts —
    and re-merging a replayed slice does not move the estimate
    (idempotent union)."""
    import os
    from functools import reduce

    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import quality

    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    slices = [orders.filter(F.col("o_orderkey") % 3 == i) for i in range(3)]
    parts = reduce(
        lambda a, b: a.unionByName(b),
        [quality.stats_ndv_sketch_partials(s) for s in slices],
    )
    approx = {
        r["column_name"]: r["ndv_approx"]
        for r in quality.ndv_from_sketches(parts).collect()
    }
    exact = {
        r["column_name"]: r["ndv"] for r in quality.table_stats(orders).collect()
    }
    for c, n in exact.items():
        assert abs(approx[c] - n) <= max(2, 0.05 * n), (c, approx[c], n)

    replayed = parts.unionByName(quality.stats_ndv_sketch_partials(slices[0]))
    again = {
        r["column_name"]: r["ndv_approx"]
        for r in quality.ndv_from_sketches(replayed).collect()
    }
    assert again == approx


def test_stats_distinct_partials_float_canonicalization(spark):
    """-0.0 and 0.0 are ONE grouping value — the distinct-value state
    must not split them into two strings; NaNs collapse to one value."""
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark import quality

    df = spark.createDataFrame(
        [(0.0,), (-0.0,), (float("nan"),), (float("nan"),), (1.5,)], "v double"
    )
    state = quality.stats_distinct_partials(df)
    ndv_state = state.filter("column_name = 'v'").count()
    ndv_exact = df.agg(F.countDistinct("v")).collect()[0][0]
    assert ndv_state == ndv_exact == 3  # {0.0, NaN, 1.5}


def test_merge_scd2_schema_evolution_adds_attribute(spark, tmp_path):
    """evolve_schema=True on the SCD2 merge: a new attribute appends to
    the history's logical schema (historical versions read NULL — no
    file rewrite beyond the merge's own, untouched files hard-link
    through), a touched key's NULL→value transition is an ordinary
    attribute change (old version closes, new one opens), the logical
    twin on NULL-padded frames agrees row for row, and a type change is
    rejected loudly."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark.datalake import Lake, _read_schema_json
    from dataengineeringpipeline_spark.scd import scd2_apply_changes, scd2_history

    lake = Lake(str(tmp_path))
    changes = spark.createDataFrame(
        [(i, f"A{i % 3}", float(i % 5), i) for i in range(1000)],
        "k long, attr string, ts double, tb long",
    )
    hist = scd2_history(
        changes, ["k"], ["attr"], "ts", tiebreak_cols=["tb"], carry_cols=["tb"]
    )
    lake.write(
        hist.repartitionByRange(10, "k").sortWithinPartitions("k"), "gold", "h"
    )
    path = lake.path("gold", "h")

    def inodes():
        return {
            f: os.stat(os.path.join(path, f)).st_ino
            for f in os.listdir(path)
            if f.endswith(".parquet")
        }

    before = inodes()
    upd = spark.createDataFrame(
        [(340, "A1", "GOLD", 99.0, 9001), (5000, "FRESH", "SILVER", 1.0, 9002)],
        "k long, attr string, tier string, ts double, tb long",
    )
    audit = lake.merge_scd2(
        spark, "gold", "h", upd,
        key_col="k", attr_cols=("attr", "tier"), ts_col="ts",
        tiebreak_cols=("tb",), carry_cols=("tb",), evolve_schema=True,
    )
    assert audit["files_rewritten"] == 1
    after = inodes()
    linked = set(before) & set(after)
    assert len(linked) == 9 and all(before[f] == after[f] for f in linked)
    assert _read_schema_json(path) is not None
    t = lake.read(spark, "gold", "h")
    assert "tier" in t.columns
    # logical twin: apply the same changes to the NULL-padded history
    padded = hist.select("*", F.lit(None).cast("string").alias("tier"))
    want = sorted(
        map(
            tuple,
            scd2_apply_changes(
                padded, upd, ["k"], ["attr", "tier"], "ts",
                tiebreak_cols=["tb"], carry_cols=["tb"],
            ).select(*t.columns).collect(),
        )
    )
    got = sorted(map(tuple, t.collect()))
    assert got == want
    # key 340: NULL→GOLD opened a new version; untouched keys read NULL
    k340 = sorted(r for r in got if r[0] == 340)
    tiers_340 = {r[t.columns.index("tier")] for r in k340}
    assert "GOLD" in tiers_340
    k0 = [r for r in got if r[0] == 0]
    assert all(r[t.columns.index("tier")] is None for r in k0)
    # type change rejected
    bad = spark.createDataFrame(
        [(1, "A0", 5, 100.0, 9003)], "k long, attr string, tier int, ts double, tb long"
    )
    with pytest.raises(ValueError, match="type changes rejected"):
        lake.merge_scd2(
            spark, "gold", "h", bad,
            key_col="k", attr_cols=("attr", "tier"), ts_col="ts",
            tiebreak_cols=("tb",), carry_cols=("tb",), evolve_schema=True,
        )
