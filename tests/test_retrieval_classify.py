"""Unit checks for the round-4 additions: k-NN label eval, the hashed
n-gram quality classifier, lexical inverted-index retrieval, and the
cross-source duplication matrix — semantics and plan-shape guarantees
the SQL oracles don't express."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataengineeringpipeline_spark.operators import classify, dedup, search, similarity


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# -- k-NN label eval --------------------------------------------------------


def test_knn_predictions_cover_every_query_once(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    pred = similarity.knn_predictions(emb).collect()
    qids = sorted(r["query_id"] for r in pred)
    expected = sorted(
        r["vec_id"] for r in emb.filter(F.col("vec_id") % 100 == 0).collect()
    )
    assert qids == expected  # exactly one prediction per held-out vector
    for r in pred:
        assert 1 <= r["votes"] <= 5


def test_knn_predictions_draw_labels_from_index_side_only(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    idx_labels = {
        r["label"] for r in emb.filter(F.col("vec_id") % 100 != 0).select("label").distinct().collect()
    }
    for r in similarity.knn_predictions(emb).collect():
        assert r["predicted_label"] in idx_labels


def test_knn_predictions_partitioning_independent(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    one = {r["query_id"]: r["predicted_label"] for r in similarity.knn_predictions(emb).collect()}
    many = {
        r["query_id"]: r["predicted_label"]
        for r in similarity.knn_predictions(emb.repartition(13)).collect()
    }
    assert one == many


def test_knn_eval_counts_reconcile_with_predictions(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    pred = similarity.knn_predictions(emb).collect()
    report = similarity.knn_label_eval(emb).collect()
    assert sum(r["n_queries"] for r in report) == len(pred)
    correct = sum(1 for r in pred if r["predicted_label"] == r["true_label"])
    assert sum(r["n_correct"] for r in report) == correct
    for r in report:
        assert r["accuracy"] == r["n_correct"] / r["n_queries"]


# -- hashed n-gram classifier ----------------------------------------------


def test_classifier_feature_count_is_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "alpha", "s"), (2, "alpha beta", "s"), (3, "a b c d", "s")],
        "doc_id long, text string, source string",
    )
    rows = {r["doc_id"]: r for r in classify.classifier_scores(df).collect()}
    assert rows[1]["n_features"] == 1  # single word: no bigram
    assert rows[2]["n_features"] == 3  # 2 unigrams + 1 bigram
    assert rows[3]["n_features"] == 7  # 4 + 3


def test_classifier_keep_is_integer_sign_of_score(spark, sf_dir):
    scored = classify.classifier_scores(_docs(spark, sf_dir)).collect()
    assert len(scored) > 0
    for r in scored:
        assert r["keep"] == (r["score_sum"] >= 0)
        assert r["mean_score"] == r["score_sum"] / r["n_features"]


def test_classifier_scoring_is_map_only(spark, sf_dir, tmp_path):
    """Scoring must ride the scan: no Exchange in the per-doc score plan
    on well-partitioned input (the 100 TB claim in the module docstring)."""
    wide = str(tmp_path / "docs_wide_cls")
    _docs(spark, sf_dir).repartition(16).write.mode("overwrite").parquet(wide)
    plan = (
        classify.classifier_scores(spark.read.parquet(wide))
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan, plan.splitlines()[:8]


def test_classifier_summary_reconciles_with_scores(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    per_doc = classify.classifier_scores(docs).collect()
    summary = {r["source"]: r for r in classify.classifier_quality_summary(docs).collect()}
    by_src: dict[str, list] = {}
    for r in per_doc:
        by_src.setdefault(r["source"], []).append(r)
    assert set(summary) == set(by_src)
    for src, rows in by_src.items():
        s = summary[src]
        assert s["docs"] == len(rows)
        assert s["kept_docs"] == sum(1 for r in rows if r["keep"])
        assert s["total_score"] == sum(r["score_sum"] for r in rows)
        assert s["total_features"] == sum(r["n_features"] for r in rows)


def test_quality_gate_ensemble_reconciles_with_component_gates(spark, sf_dir):
    """The ensemble's per-source tallies must equal a driver-side
    majority vote recomputed from the three component operators, with a
    bigram-less document (no fluency evidence) counting as a fluency
    fail, not a null vote."""
    from dataengineeringpipeline_spark.operators import text as text_ops

    docs = _docs(spark, sf_dir).limit(200)
    cls = {r["doc_id"]: r["keep"] for r in classify.classifier_scores(docs).collect()}
    heur = {
        r["doc_id"]: r["is_high_quality"]
        for r in text_ops.quality_score(text_ops.text_stats(docs)).collect()
    }
    flu = {
        r["doc_id"]: (r["fluency_pm"] is not None and r["fluency_pm"] >= classify.FLUENCY_GATE_PM)
        for r in classify.bigram_fluency(docs).collect()
    }
    src = {r["doc_id"]: r["source"] for r in docs.select("doc_id", "source").collect()}
    expected: dict[str, dict[str, int]] = {}
    for d, s in src.items():
        e = expected.setdefault(
            s, {"docs": 0, "cls": 0, "heur": 0, "flu": 0, "keep": 0, "ukeep": 0, "urej": 0}
        )
        votes = int(cls[d]) + int(heur[d]) + int(flu[d])
        e["docs"] += 1
        e["cls"] += int(cls[d])
        e["heur"] += int(heur[d])
        e["flu"] += int(flu[d])
        e["keep"] += int(votes >= 2)
        e["ukeep"] += int(votes == 3)
        e["urej"] += int(votes == 0)
    out = {r["source"]: r for r in classify.quality_gate_ensemble(docs).collect()}
    assert set(out) == set(expected)
    for s, e in expected.items():
        r = out[s]
        assert (r["docs"], r["cls_pass"], r["heur_pass"], r["flu_pass"]) == (
            e["docs"],
            e["cls"],
            e["heur"],
            e["flu"],
        ), s
        assert (r["ensemble_keep"], r["unanimous_keep"], r["unanimous_reject"]) == (
            e["keep"],
            e["ukeep"],
            e["urej"],
        ), s
        assert r["keep_pm"] == (e["keep"] * 1000) // e["docs"]
    # the fixture must exercise disagreement, or the vote is untested
    assert any(
        int(cls[d]) + int(heur[d]) + int(flu[d]) not in (0, 3) for d in src
    ), "all gates unanimous - fixture too easy"


# -- lexical retrieval ------------------------------------------------------


def test_lexical_search_never_returns_self_or_other_queries(spark, sf_dir):
    hits = search.lexical_search_topk(_docs(spark, sf_dir)).collect()
    assert len(hits) > 0
    for r in hits:
        assert r["query_id"] % 100 == 0
        assert r["doc_id"] % 100 != 0
        assert r["score"] > 0 and r["shared_terms"] > 0


def test_lexical_search_ranks_are_dense_and_score_ordered(spark, sf_dir):
    by_q: dict[int, list] = {}
    for r in search.lexical_search_topk(_docs(spark, sf_dir), k=5).collect():
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert (a["score"], -a["doc_id"]) >= (b["score"], -b["doc_id"])


def test_lexical_search_max_df_guard_prunes_hot_terms(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    posts = search.posting_lists(docs.filter(F.col("doc_id") % 100 != 0))
    max_df = posts.groupBy("term").count().agg(F.max("count")).collect()[0][0]
    # cap below the hottest term's df: that term must vanish from scoring
    capped = search.term_weights(posts, max_df=int(max_df) - 1).collect()
    uncapped = search.term_weights(posts, max_df=None).collect()
    assert len(capped) < len(uncapped)
    assert all(r["df"] <= max_df - 1 for r in capped)
    # weight is the exact integer quotient
    n_docs = docs.filter(F.col("doc_id") % 100 != 0).count()
    for r in uncapped:
        assert r["weight"] == (n_docs * search.WEIGHT_SCALE) // r["df"]


def test_lexical_search_partitioning_independent(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    one = {(r["query_id"], r["rank"]): r["doc_id"] for r in search.lexical_search_topk(docs).collect()}
    many = {
        (r["query_id"], r["rank"]): r["doc_id"]
        for r in search.lexical_search_topk(docs.repartition(13)).collect()
    }
    assert one == many


# -- cross-source duplication matrix ---------------------------------------


def test_source_overlap_matrix_reconciles_with_pairs(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    pairs = dedup.minhash_lsh_pairs(docs).collect()
    matrix = dedup.source_overlap_matrix(docs).collect()
    assert sum(r["dup_pairs"] for r in matrix) == len(pairs)
    for r in matrix:
        assert r["source_a"] <= r["source_b"]
        assert r["min_jaccard"] <= r["max_jaccard"]


# -- token-budget epoch planning --------------------------------------------


def test_token_budget_plan_arithmetic_is_consistent(spark, sf_dir):
    from dataengineeringpipeline_spark.operators import mix

    rows = mix.token_budget_plan(_docs(spark, sf_dir), target_tokens=100_000).collect()
    assert len(rows) > 0
    for r in rows:
        a, t = r["available_tokens"], r["target_tokens"]
        assert r["full_epochs"] == t // a
        assert r["remainder_rate_pm"] == ((t % a) * 1000) // a
        assert r["oversample_x1000"] == (t * 1000) // a
        # the plan's pieces must reassemble the oversample factor
        assert r["full_epochs"] * 1000 + r["remainder_rate_pm"] <= r["oversample_x1000"]
        assert r["oversample_x1000"] - (r["full_epochs"] * 1000 + r["remainder_rate_pm"]) <= 1


def test_token_budget_plan_downsampling_regime(spark, sf_dir):
    """A tiny budget puts every domain in the downsampling regime:
    zero full epochs, a sub-1000 remainder rate."""
    from dataengineeringpipeline_spark.operators import mix

    rows = mix.token_budget_plan(_docs(spark, sf_dir), target_tokens=100).collect()
    for r in rows:
        assert r["full_epochs"] == 0
        assert 0 <= r["remainder_rate_pm"] < 1000


# -- hybrid RRF retrieval ---------------------------------------------------


def test_hybrid_rrf_scores_and_ranks(spark, sf_dir):
    from dataengineeringpipeline_spark.operators.search import (
        RRF_K0,
        RRF_SCALE,
        hybrid_search_topk,
        lexical_search_topk,
    )
    from dataengineeringpipeline_spark.operators.similarity import ann_bruteforce_topk

    docs = _docs(spark, sf_dir)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = hybrid_search_topk(docs, emb, k=10, list_k=20).collect()
    assert out, "hybrid retrieval returned nothing"
    lex = {
        (r["query_id"], r["doc_id"]): r["rank"]
        for r in lexical_search_topk(docs, k=20).collect()
    }
    sem = {
        (r["query_id"], r["neighbor_id"]): r["rank"]
        for r in ann_bruteforce_topk(emb, k=20).collect()
    }
    by_q: dict = {}
    for r in out:
        # the fused score is exactly the sum of the two integer RRF terms
        expect = 0
        if (r["query_id"], r["doc_id"]) in lex:
            assert r["lex_rank"] == lex[(r["query_id"], r["doc_id"])]
            expect += RRF_SCALE // (RRF_K0 + r["lex_rank"])
        else:
            assert r["lex_rank"] is None
        if (r["query_id"], r["doc_id"]) in sem:
            assert r["sem_rank"] == sem[(r["query_id"], r["doc_id"])]
            expect += RRF_SCALE // (RRF_K0 + r["sem_rank"])
        else:
            assert r["sem_rank"] is None
        assert r["rrf_score"] == expect
        by_q.setdefault(r["query_id"], []).append(r)
    for rows in by_q.values():
        rows.sort(key=lambda r: r["rank"])
        # ranks are 1..n and scores non-increasing in rank
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
        scores = [r["rrf_score"] for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_hybrid_doc_in_both_lists_outranks_single_list(spark):
    """Closed-form: a doc ranked 5th by both retrievers must outrank a
    doc ranked 1st by only one (2/65 > 1/61 at RRF_K0=60)."""
    from dataengineeringpipeline_spark.operators.search import RRF_K0, RRF_SCALE

    both_5th = 2 * (RRF_SCALE // (RRF_K0 + 5))
    single_1st = RRF_SCALE // (RRF_K0 + 1)
    assert both_5th > single_1st


# -- classifier calibration -------------------------------------------------


def test_calibration_partitions_corpus_and_bins_in_range(spark, sf_dir):
    from dataengineeringpipeline_spark.operators.classify import (
        classifier_calibration,
        classifier_scores,
    )

    docs = _docs(spark, sf_dir)
    rows = classifier_calibration(docs).collect()
    assert rows, "calibration table empty"
    n_docs = docs.count()
    assert sum(r["docs"] for r in rows) == n_docs
    for r in rows:
        if r["score_bin"] is not None:
            assert 0 <= r["score_bin"] <= 10
        assert 0 <= r["classifier_keep"] <= r["docs"]
        assert 0 <= r["high_quality"] <= r["docs"]
        assert abs(r["high_quality_rate"] - r["high_quality"] / r["docs"]) < 1e-12
    # the gate decision and the binning agree: bins ≥ 5 are exactly the
    # non-negative-mean docs (keep ⇔ score_sum >= 0 ⇔ shifted mean ≥ 500)
    scored = classifier_scores(docs).collect()
    kept = sum(1 for s in scored if s["keep"])
    assert sum(r["classifier_keep"] for r in rows) == kept


# -- materialized search index ----------------------------------------------


def test_search_index_reproduces_inline_retrieval(spark, sf_dir, tmp_path):
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.operators.search import (
        lexical_search_topk,
        materialize_search_index,
        search_index_topk,
    )

    docs = _docs(spark, sf_dir)
    lake = Lake(str(tmp_path / "lake"))
    # index = the candidate corpus (the inline op's convention)
    materialize_search_index(docs.filter("doc_id % 100 != 0"), lake, snapshot="s1")
    from_index = search_index_topk(
        docs.filter("doc_id % 100 = 0"), spark, lake, snapshot="s1"
    ).collect()
    inline = lexical_search_topk(docs).collect()
    assert sorted(map(tuple, from_index)) == sorted(map(tuple, inline))


def test_search_index_append_reranks_with_merged_df(spark, sf_dir, tmp_path):
    """Materialize half the candidates, append the other half: queries
    must rank identically to the inline op over the full corpus (the
    read-time weight derivation picks up post-append document
    frequencies — nothing stale)."""
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.operators.search import (
        lexical_search_topk,
        materialize_search_index,
        search_index_append,
        search_index_topk,
    )

    docs = _docs(spark, sf_dir)
    cand = docs.filter("doc_id % 100 != 0")
    lake = Lake(str(tmp_path / "lake"))
    materialize_search_index(cand.filter("doc_id % 2 = 0"), lake, snapshot="s2")
    search_index_append(cand.filter("doc_id % 2 = 1"), spark, lake, snapshot="s2")
    from_index = search_index_topk(
        docs.filter("doc_id % 100 = 0"), spark, lake, snapshot="s2"
    ).collect()
    inline = lexical_search_topk(docs).collect()
    assert sorted(map(tuple, from_index)) == sorted(map(tuple, inline))


def test_search_index_tokenless_doc_does_not_skew_idf(spark, tmp_path):
    """A document that tokenizes to zero terms (NULL text) must not
    inflate the stored corpus size: the stored ``n_docs`` is counted
    over POSTING rows, the same N convention ``term_weights`` uses, so
    the materialized index ranks bit-identically to the inline op even
    with token-less docs in the indexed batch (regression: the stored
    count used to be ``countDistinct`` over ALL input docs)."""
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.operators.search import (
        read_search_index,
        materialize_search_index,
        term_weights,
        posting_lists,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma"),
            (2, "alpha beta"),
            (3, "delta gamma"),
            (4, None),  # token-less: contributes no postings
        ],
        "doc_id bigint, text string",
    )
    lake = Lake(str(tmp_path / "lake"))
    materialize_search_index(docs, lake, snapshot="nulls")
    _, stored_wt = read_search_index(spark, lake, snapshot="nulls")
    inline_wt = term_weights(posting_lists(docs))
    assert sorted(map(tuple, stored_wt.collect())) == sorted(
        map(tuple, inline_wt.collect())
    )
    # and the stored corpus size is 3 (posting docs), not 4 (input rows)
    n = lake.read(spark, "gold", "search_nulls_meta").agg(
        F.sum("n_docs")
    ).collect()[0][0]
    assert n == 3


# -- bigram LM fluency ------------------------------------------------------


def test_bigram_fluency_closed_form(spark):
    from dataengineeringpipeline_spark.operators.classify import bigram_fluency

    docs = spark.createDataFrame(
        [
            (1, "s", "a b a b"),   # bigrams: ab, ba, ab
            (2, "s", "a c"),       # bigram: ac
            (3, "s", "x"),         # too short: NULL scores
        ],
        "doc_id bigint, source string, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_fluency(docs).collect()}
    # corpus counts: C(a)=3, C(b)=2, C(c)=1, C(x)=1
    # C(a,b)=2, C(b,a)=1, C(a,c)=1
    # doc 1: ab: 2000//3=666, ba: 1000//2=500, ab: 666 → sum 1832, n 3
    assert rows[1]["n_bigrams"] == 3
    assert rows[1]["fluency_sum"] == 666 + 500 + 666
    assert rows[1]["fluency_pm"] == 1832 // 3
    # doc 2: ac: 1000//3=333
    assert (rows[2]["fluency_sum"], rows[2]["fluency_pm"]) == (333, 333)
    # doc 3: no bigrams → NULLs
    assert rows[3]["n_bigrams"] is None and rows[3]["fluency_pm"] is None


def test_bigram_fluency_separates_common_from_rare_transitions(spark):
    """The signal the gate exists for: a document built from the
    corpus's common transition scores far above one built from the same
    words in an unseen order."""
    from dataengineeringpipeline_spark.operators.classify import bigram_fluency

    background = [(i, "s", "the cat sat") for i in range(20)]
    docs = spark.createDataFrame(
        background + [(100, "s", "the cat"), (101, "s", "cat the")],
        "doc_id bigint, source string, text string",
    )
    rows = {r["doc_id"]: r["fluency_pm"] for r in bigram_fluency(docs).collect()}
    # C(the)=22, C(the,cat)=21 → doc 100 ≈ 954‰; C(cat)=22, C(cat,the)=1 → doc 101 ≈ 45‰
    assert rows[100] > 900
    assert rows[101] < 100
