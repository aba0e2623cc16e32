"""Operator-level checks not covered by the SQL oracles: the Arrow ANN
kernel, signature determinism, degenerate word-set joins, quarantine
round-trip."""

from __future__ import annotations

import os

from pyspark.sql import Row
from pyspark.sql import functions as F

from dataengineeringpipeline_spark import quality
from dataengineeringpipeline_spark.datalake import Lake
from dataengineeringpipeline_spark.operators import dedup, similarity


def _embeddings(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


def test_arrow_ann_matches_fold_topk(spark, sf_dir):
    """The numpy-matmul scale kernel must return the same neighbor ids and
    ranks as the deterministic fold version (cosines may differ in the
    last ulp — that is the documented trade)."""
    emb = _embeddings(spark, sf_dir)
    fold = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ann_bruteforce_topk(emb, k=5).collect()
    }
    arrow = {
        (r["query_id"], r["rank"]): r["neighbor_id"]
        for r in similarity.ann_topk_arrow(emb, k=5).collect()
    }
    assert fold == arrow
    gauge = similarity.ann_arrow_recall(emb, k=5).collect()
    assert len(gauge) == 1 and gauge[0]["recall_at_k"] == 1.0


def test_ivf_assignment_covers_corpus_and_is_partitioning_independent(spark, sf_dir):
    """Every vector lands in exactly one cell, cells come from the declared
    centroid subset, and assignment doesn't depend on input partitioning."""
    emb = _embeddings(spark, sf_dir)
    assign = similarity.ivf_assign(emb)
    n = emb.count()
    assert assign.count() == n
    cents = {r["centroid_id"] for r in similarity.ivf_centroids(emb).collect()}
    used = {r["centroid_id"] for r in assign.select("centroid_id").distinct().collect()}
    assert used <= cents and len(cents) > 1
    one = {r["vec_id"]: r["centroid_id"] for r in assign.collect()}
    many = {
        r["vec_id"]: r["centroid_id"]
        for r in similarity.ivf_assign(emb.repartition(13)).collect()
    }
    assert one == many


def test_ivf_topk_subset_of_probed_cells_and_recall(spark, sf_dir):
    """IVF results are exact cosines drawn from probed cells only; recall
    against brute force is positive and the summary row is consistent."""
    emb = _embeddings(spark, sf_dir)
    k = 5
    ivf = similarity.ann_ivf_topk(emb, k=k).collect()
    per_query = {}
    for r in ivf:
        per_query.setdefault(r["query_id"], []).append(r)
    for rows in per_query.values():
        assert len(rows) <= k
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
            range(1, len(rows) + 1)
        )
    exact = {
        (r["query_id"], r["neighbor_id"], round(r["cosine"], 9))
        for r in similarity.ann_bruteforce_topk(emb, k=emb.count()).collect()
    }
    assert all((r["query_id"], r["neighbor_id"], round(r["cosine"], 9)) in exact for r in ivf)
    rec = similarity.ann_ivf_recall(emb, k=k).collect()[0]
    assert rec["hit_pairs"] <= rec["exact_pairs"]
    assert 0.0 < rec["recall_at_k"] <= 1.0


def test_lsh_signatures_partitioning_independent(spark, sf_dir):
    emb = _embeddings(spark, sf_dir)
    one = {r["vec_id"]: r["bucket"] for r in similarity.lsh_signatures(emb).collect()}
    many = {
        r["vec_id"]: r["bucket"]
        for r in similarity.lsh_signatures(emb.repartition(13)).collect()
    }
    assert one == many


def test_minhash_signatures_partitioning_independent(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    one = {r["doc_id"]: r["sig_0"] for r in dedup.minhash_signatures(docs).collect()}
    many = {
        r["doc_id"]: r["sig_0"]
        for r in dedup.minhash_signatures(docs.repartition(17)).collect()
    }
    assert one == many


def test_shingle_hash_arrays_arrow_matches_jvm_chain(spark):
    """The vectorized Arrow shingle-hash kernel (round-12 optimization)
    must reproduce the JVM expression chain BIT-FOR-BIT on the edge
    cases where Java-regex/trim semantics diverge from naive Python:
    tab/newline/vertical-tab separators (Java ``\\s``), NBSP (NOT a
    Java ``\\s`` — must stay inside a word), space-only ``trim``
    (leading tab survives and yields a leading empty word), trailing
    separators (split keeps trailing empties with limit=-1), short/
    empty/NULL texts, duplicate shingles (first-occurrence distinct),
    and non-ASCII md5 input (UTF-8 bytes)."""
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),                 # plain
            (2, "a b c a b c a b c d"),       # duplicate shingles
            (3, "  a\tb\nc\x0bd\fe\rf  "),    # every Java \s class + space trim
            (4, "\ta b c"),                   # leading tab survives trim → leading ""
            (5, "a b c\t"),                   # trailing separator → trailing ""
            (6, "a b c d"),              # NBSP is NOT Java \s: stays in-word
            (7, "one two"),                   # < n words: dropped
            (8, ""),                          # empty: dropped
            (9, None),                        # NULL text: dropped
            (10, "héllo wörld ünïcode tæxt"),  # UTF-8 md5 bytes
            (11, "x  y   z"),                 # run-length separators collapse
        ],
        "doc_id long, text string",
    )
    from pyspark.sql import functions as F

    from dataengineeringpipeline_spark.operators.text import word_hash

    def jvm(frame, keep_empty=False):
        arrays = dedup._shingle_arrays(frame, 3)
        if not keep_empty:
            arrays = arrays.filter(F.size("shs") > 0)
        return arrays.select(
            "doc_id", F.transform("shs", lambda s: word_hash(s)).alias("hs")
        )

    ref = {r["doc_id"]: r["hs"] for r in jvm(docs).collect()}
    got = {
        r["doc_id"]: r["hs"]
        for r in dedup._shingle_hash_arrays_arrow(docs, 3).collect()
    }
    assert got == ref
    assert set(ref) == {1, 2, 3, 4, 5, 6, 10, 11}  # 7/8/9 dropped
    # keep_empty face (boilerplate_stats): short/NULL docs keep hs = []
    ref_all = {r["doc_id"]: r["hs"] for r in jvm(docs, keep_empty=True).collect()}
    got_all = {
        r["doc_id"]: r["hs"]
        for r in dedup._shingle_hash_arrays_arrow(docs, 3, keep_empty=True).collect()
    }
    assert got_all == ref_all and set(got_all) == set(range(1, 12))
    # doc_id type passes through verbatim (string ids)
    sdocs = spark.createDataFrame([("a", "x y z w")], "doc_id string, text string")
    srows = dedup._shingle_hash_arrays_arrow(sdocs, 3).collect()
    assert [r["doc_id"] for r in srows] == ["a"]


def test_chunk_documents_windows_and_edges(spark):
    """Token-window chunking: stride/overlap math, the short-doc single
    partial chunk, the empty doc yielding nothing, and the trailing
    pure-overlap window being dropped."""
    from dataengineeringpipeline_spark.operators import text as text_ops

    # pure-alpha tokens: the BPE-ish TOKEN_REGEX would split "t0" into
    # a letter run + a digit run (two tokens)
    toks = [f"t{chr(97 + i)}" for i in range(10)]  # ta tb ... tj
    docs = spark.createDataFrame(
        [
            (1, " ".join(toks)),     # 10 tokens
            (2, "a b c"),            # shorter than one chunk
            (3, ""),                 # empty: no chunks
            (4, " ".join(toks[:6])),  # 6 tokens = exactly chunk+overlap-2
        ],
        "doc_id long, text string",
    )
    out = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_token_count"], r["chunk_text"])
        for r in text_ops.chunk_documents(docs, chunk_tokens=4, overlap=2).collect()
    }
    # doc 1: starts 0,2,4,6 then start 8 is pure overlap of chunk 3 → dropped
    assert {k for k in out if k[0] == 1} == {(1, 0), (1, 1), (1, 2), (1, 3)}
    assert out[(1, 0)] == (4, "ta tb tc td")
    assert out[(1, 1)] == (4, "tc td te tf")  # 2-token overlap carried
    assert out[(1, 3)] == (4, "tg th ti tj")
    assert out[(2, 0)] == (3, "a b c")  # single partial chunk
    assert not [k for k in out if k[0] == 3]  # empty doc: no chunks
    # doc 4 (6 tokens): starts 0,2 then the start-4 window (te tf) would
    # be pure overlap of chunk 1 (which covers tc..tf) → dropped
    assert {k for k in out if k[0] == 4} == {(4, 0), (4, 1)}
    assert out[(4, 1)] == (4, "tc td te tf")
    # every token of doc 1 appears in some chunk (coverage invariant)
    covered = set()
    for (d, _), (_, txt) in out.items():
        if d == 1:
            covered.update(txt.split())
    assert covered == set(toks)


def test_scrub_pii_redacts_and_counts(spark):
    from dataengineeringpipeline_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or visit https://a.io/p?q=1 now"),
            (2, "call 555-123-4567 or +1 (555) 987-6543 today"),
            (3, "clean document with no private data"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in text_ops.scrub_pii(docs).collect()}
    assert (out[1]["email_count"], out[1]["url_count"]) == (1, 1)
    assert out[1]["scrubbed_text"] == "mail me at [EMAIL] or visit [URL] now"
    assert out[2]["phone_count"] == 2
    assert out[2]["scrubbed_text"] == "call [PHONE] or [PHONE] today"
    assert out[3]["redaction_count"] == 0
    assert out[3]["scrubbed_text"] == "clean document with no private data"
    assert out[4]["redaction_count"] == 0


def test_pii_redaction_report_plants_and_scrubs(spark):
    """doc_id 60 hits all three plant cadences (4, 12, 20); doc_id 4
    only the email; doc_id 5 stays clean and is absent from the report.
    The scrubbed md5 must equal the hash of the hand-computed cleaned
    string — proving plant order and scrub order end-to-end."""
    import hashlib

    from dataengineeringpipeline_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(4, "alpha beta"), (5, "gamma delta"), (60, "omega")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in text_ops.pii_redaction_report(docs).collect()}
    assert set(rows) == {4, 60}
    assert (rows[4]["email_count"], rows[4]["url_count"], rows[4]["phone_count"]) == (1, 0, 0)
    assert rows[4]["scrubbed_md5"] == hashlib.md5(b"alpha beta Contact [EMAIL]").hexdigest()
    assert (rows[60]["email_count"], rows[60]["url_count"], rows[60]["phone_count"]) == (1, 1, 1)
    assert rows[60]["redaction_count"] == 3
    expected_60 = "omega Contact [EMAIL] via [URL] or [PHONE]"
    assert rows[60]["scrubbed_md5"] == hashlib.md5(expected_60.encode()).hexdigest()


def test_pack_chunks_fills_sequences_in_order(spark):
    """Packing invariants: chunks keep their deterministic order inside a
    group, offsets are the running token sum, and a sequence's id is the
    budget-window its chunk STARTS in (straddling chunks stay whole)."""
    from dataengineeringpipeline_spark.operators import text as text_ops

    chunks = spark.createDataFrame(
        [(d, c, 60, f"x{d}-{c}") for d in (0, 8) for c in range(3)],  # same group (d%8=0)
        "doc_id long, chunk_idx int, chunk_token_count int, chunk_text string",
    )
    packed = {
        (r["doc_id"], r["chunk_idx"]): (r["pack_group"], r["seq_id"], r["seq_start_offset"])
        for r in text_ops.pack_chunks(chunks, budget=128, num_groups=8).collect()
    }
    # order: (0,0)(0,1)(0,2)(8,0)(8,1)(8,2); offsets 0,60,120,180,240,300
    # seq = floor(offset/128): 0,0,0,1,1,2
    assert packed[(0, 0)] == (0, 0, 0)
    assert packed[(0, 1)] == (0, 0, 60)
    assert packed[(0, 2)] == (0, 0, 120)  # starts inside window 0 → stays whole
    assert packed[(8, 0)] == (0, 1, 180)
    assert packed[(8, 2)] == (0, 2, 300)
    # partitioning independence: same assignment under a different layout
    repacked = {
        (r["doc_id"], r["chunk_idx"]): (r["pack_group"], r["seq_id"], r["seq_start_offset"])
        for r in text_ops.pack_chunks(chunks.repartition(7), budget=128, num_groups=8).collect()
    }
    assert repacked == packed


def test_kmeans_ivf_recall_at_least_matches_sampled_centroids(spark, sf_dir):
    """Trained (spherical) k-means centroids with k matched to the
    corpus's latent cluster structure (10 labels) must beat the
    deterministic vec_id%mod sample at the same nprobe — cells aligned
    with real clusters concentrate true neighbors in fewer probes
    (measured: 0.48 vs 0.32 at sf0.001, 0.60 vs 0.44 at sf0.01)."""
    emb = _embeddings(spark, sf_dir)
    sampled = similarity.ann_ivf_recall(emb, k=5).collect()[0]
    trained = similarity.ann_ivf_recall(
        emb, k=5, centroids=similarity.kmeans_centroids(emb, n_clusters=10)
    ).collect()[0]
    assert trained["exact_pairs"] == sampled["exact_pairs"]
    assert trained["recall_at_k"] > sampled["recall_at_k"]


def test_training_corpus_funnel_is_monotone_and_consistent(spark, sf_dir):
    """The end-to-end corpus pipeline only ever removes documents
    (docs_in ≥ after_dedup ≥ after_gates), and the packed output's chunk
    tokens reconcile with the packed chunk rows."""
    from dataengineeringpipeline_spark.operators import corpus

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    row = corpus.training_corpus_funnel(docs).collect()[0]
    assert row["docs_in"] >= row["docs_after_dedup"] >= row["docs_after_gates"] > 0
    assert row["docs_in"] > row["docs_after_dedup"]  # corpus HAS near-dups
    packed = corpus.training_corpus(docs)
    agg = packed.agg(
        F.count(F.lit(1)).alias("chunks"), F.sum("chunk_token_count").alias("tokens")
    ).collect()[0]
    assert (agg["chunks"], agg["tokens"]) == (row["chunks"], row["tokens"])
    # no packed chunk exceeds the chunk window
    assert packed.filter(F.col("chunk_token_count") > 64).count() == 0


def test_operator_persists_are_released_by_release_caches(spark, sf_dir):
    """Operators persist shared subtrees that must outlive the call (the
    caller's action populates them); release_caches() is the session's
    way to drop them so a long-lived service doesn't accumulate cached
    shingle sets/signatures across queries."""
    from dataengineeringpipeline_spark.cache import _TRACKED, release_caches

    release_caches()  # start clean regardless of earlier tests
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    dedup.minhash_lsh_pairs(docs).limit(1).count()  # action populates the caches
    # r12: the Arrow shingle kernel dropped spread()'s corpus persist
    # (single consumer, optimizer barrier built in), so the chain
    # registers exactly the shared hash-ARRAYS persist
    assert len(_TRACKED) >= 1
    tracked = list(_TRACKED)
    released = release_caches()
    assert released == len(tracked) and not _TRACKED
    for df in tracked:
        assert not df.storageLevel.useMemory and not df.storageLevel.useDisk
    assert release_caches() == 0  # idempotent


def test_iqr_outlier_approx_path_matches_exact_at_small_scale(spark, sf_dir):
    """The exact=False sketch path (single-pass approx_percentile, no
    column sort) must track the exact path closely: the sketch picks a
    real order statistic at rank error ≤ 1/accuracy (while exact
    ``percentile`` interpolates between order stats), so the cut points
    can differ by roughly one inter-row gap — never more."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    exact = quality.iqr_outlier_bounds(orders, "o_totalprice").collect()[0]
    approx = quality.iqr_outlier_bounds(orders, "o_totalprice", exact=False).collect()[0]
    assert approx.asDict().keys() == exact.asDict().keys()
    for fld in ("q1", "q3", "lower_bound", "upper_bound"):
        assert abs(approx[fld] - exact[fld]) <= 1e-3 * max(1.0, abs(exact[fld]))
    assert approx["total_count"] == exact["total_count"]
    # Bounds land deep in the distribution's tails, so a hair's shift in
    # the cut points moves at most a handful of rows across them.
    assert abs(approx["outlier_count"] - exact["outlier_count"]) <= max(
        5, 0.01 * exact["total_count"]
    )


def test_simhash_banding_has_full_hamming3_recall(spark, sf_dir):
    """4×8-bit banding must surface EVERY pair within Hamming ≤ 3 of the
    32-bit signature (pigeonhole: ≤3 flips leave ≥1 of 4 bands clean) —
    compared against the brute-force all-pairs bit_count(xor) ground
    truth."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sigs = dedup.simhash_signatures(docs).persist()
    a, b = sigs.alias("a"), sigs.alias("b")
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    sigs.unpersist()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_dup_candidates(docs, max_hamming=3).collect()
    }
    assert got == truth and truth  # full recall, and the probe is non-vacuous


def test_simhash_48bit_scale_variant_keeps_full_recall(spark, sf_dir):
    """The bits=48 scale variant (12-bit bands, 16x more selective
    buckets) must keep the pigeonhole recall guarantee on its own 48-bit
    signature space."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    sigs = dedup.simhash_signatures(docs, bits=48).persist()
    a, b = sigs.alias("a"), sigs.alias("b")
    truth = {
        (r["doc_a"], r["doc_b"])
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    sigs.unpersist()
    got = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.simhash_dup_candidates(docs, max_hamming=3, bits=48).collect()
    }
    # non-vacuous: the corpus has exact dups (identical sigs, Hamming 0)
    assert got == truth and truth


def test_jaccard_max_df_caps_universal_shingle(spark):
    """Skew guard: a shingle shared by every document must not force the
    inverted-index join quadratic. With max_df below the corpus size,
    docs sharing ONLY the universal shingle produce no pair at all, and
    set sizes exclude the capped shingle (Jaccard of the filtered sets)."""
    # Every doc starts with the same 3-gram ("common boiler plate");
    # docs 1/2 share a second, rare 4-word tail (3 shared tail shingles
    # out of 4 kept per doc after the cap); doc 3 is otherwise unique.
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="common boiler plate alpha beta gamma delta"),
            Row(doc_id=2, text="common boiler plate alpha beta gamma epsilon"),
            Row(doc_id=3, text="common boiler plate zeta eta theta iota"),
        ]
    )
    capped = dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_df=2).collect()
    # 1-3 and 2-3 share only the universal prefix shingles → gone entirely.
    assert {(p["doc_a"], p["doc_b"]) for p in capped} == {(1, 2)}
    (pair,) = capped
    # Only "common boiler plate" (df=3) is over the cap; each doc keeps
    # 4 of its 5 shingles, and 1-2 share the three tail shingles
    # "boiler plate alpha", "plate alpha beta", "alpha beta gamma".
    assert pair["size_a"] == pair["size_b"] == 4
    assert pair["shared"] == 3
    assert abs(pair["jaccard"] - 0.6) < 1e-12
    # Uncapped, the universal shingle resurrects the 1-3 / 2-3 pairs.
    uncapped = dedup.ngram_jaccard_pairs(docs, threshold=0.1, max_df=None).collect()
    assert {(p["doc_a"], p["doc_b"]) for p in uncapped} == {(1, 2), (1, 3), (2, 3)}


def test_word_jaccard_identical_docs(spark):
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text="alpha beta gamma"),
            Row(doc_id=2, text="gamma beta alpha"),  # reordering: word-set identical
            Row(doc_id=3, text="delta epsilon zeta"),
        ]
    )
    pairs = dedup.word_jaccard_pairs(docs, threshold=0.9).collect()
    assert [(p["doc_a"], p["doc_b"], p["jaccard"]) for p in pairs] == [(1, 2, 1.0)]


def test_stratified_sample_is_partitioning_independent_and_rate_accurate(spark, sf_dir):
    """Hash-based sampling keeps the same rows under any partitioning and
    lands near the target rate (unlike rand-based sampleBy)."""
    from dataengineeringpipeline_spark.datalake import load_events
    from dataengineeringpipeline_spark.operators import sampling

    ev = load_events(spark, sf_dir)
    rates = sampling.EVENT_RATES_PER_MILLE
    one = {r["event_id"] for r in sampling.stratified_sample(ev, "event_type", "event_id", rates).collect()}
    many = {
        r["event_id"]
        for r in sampling.stratified_sample(
            ev.repartition(13), "event_type", "event_id", rates
        ).collect()
    }
    assert one == many and one
    for r in sampling.stratified_sample_summary(ev).collect():
        target = rates[r["event_type"]] / 1000.0
        assert abs(r["achieved_rate"] - target) < 0.15  # hash-uniformity tolerance


def test_connected_components_chain_triangle_pair(spark):
    """Min-label propagation: a 5-node chain (needs multiple rounds), a
    triangle, and an isolated pair all resolve to min-id labels."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12), (20, 21)],
        "doc_a long, doc_b long",
    )
    got = {
        r["doc_id"]: r["cluster_id"] for r in dedup.connected_components(pairs).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_connected_components_distributed_matches_driver(spark, sf_dir):
    """The distributed min-label-propagation branch (forced with
    driver_threshold=0) must produce the exact labeling the driver
    union-find produces on the real sf corpus candidate graph — the
    threshold only moves work, never answers. Without this forcing, every
    test corpus stays under the 2M-edge bound and the distributed branch
    would never execute in CI."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dedup.minhash_lsh_pairs(docs).select("doc_a", "doc_b")
    via_driver = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs).collect()
    }
    via_distributed = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, driver_threshold=0).collect()
    }
    assert via_driver, "test corpus yielded no candidate pairs - parity untestable"
    assert via_distributed == via_driver


def test_asof_join_semantics(spark):
    """<= match, same-timestamp right row wins, ties to larger id, no
    match before any right row, tolerance voids stale matches."""
    from dataengineeringpipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 50), (3, "u", 5), (4, "v", 100)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("u", 10, 900), ("u", 50, 901), ("u", 50, 902), ("u", 60, 903)],
        "k string, rt long, rid long",
    )
    out = {
        r["id"]: (r["rid"], r["asof_ts"])
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt", payload_cols=["rid"]
        ).collect()
    }
    assert out[1] == (903, 60)  # latest rt <= 100
    assert out[2] == (902, 50)  # same-instant match allowed; tie -> larger rid
    assert out[3] == (None, None)  # nothing at or before t=5
    assert out[4] == (None, None)  # key with no right rows at all
    tol = {
        r["id"]: r["rid"]
        for r in asof_join(
            left, right, key="k", left_time="t", right_time="rt",
            payload_cols=["rid"], tolerance=20,
        ).collect()
    }
    assert tol[1] is None  # gap 100-60=40 exceeds tolerance 20 -> voided
    assert tol[2] == 902  # gap 0 within tolerance
    import pytest as _pytest

    with _pytest.raises(ValueError):
        asof_join(left, right, key="k", left_time="t", right_time="rt", payload_cols=["k"])


def test_sliding_window_counts_each_event_width_over_slide_times(spark, sf_dir):
    """60/30-minute sliding windows: every event lands in exactly 2
    overlapping windows, and each window covers [start, start+width)."""
    from dataengineeringpipeline_spark import events_analytics
    from dataengineeringpipeline_spark.datalake import load_events

    ev = load_events(spark, sf_dir)
    win = events_analytics.sliding_window_summary(ev).collect()
    assert sum(r["event_count"] for r in win) == 2 * ev.count()
    for r in win:
        assert r["window_end_us"] - r["window_start_us"] == 3_600_000_000
        assert r["window_start_us"] % 1_800_000_000 == 0


def test_quarantine_roundtrip(spark, sf_dir, tmp_path):
    from dataengineeringpipeline_spark import cleaning

    lake = Lake(str(tmp_path / "lake"))
    silver = cleaning.clean_orders(spark.read.parquet(os.path.join(sf_dir, "orders.parquet")))
    rules = (quality.Rule("small_orders_only", "total_price < 100000", 0.99),)
    data_path, report_path = quality.quarantine(silver, rules, lake, "orders")
    bad = spark.read.parquet(data_path)
    assert bad.count() == silver.filter(~F.expr("total_price < 100000")).count()
    assert bad.count() > 0
    assert "quarantine_timestamp" in bad.columns
    assert os.path.isdir(report_path)


def test_materialized_ann_index_matches_inline_ivfpq(spark, sf_dir, tmp_path):
    """Querying the lake-materialized IVF+PQ index must reproduce the
    inline ann_ivfpq_topk exactly (same frozen deterministic quantizers,
    same corpus); appended vectors become findable without touching the
    existing encoded rows."""
    from dataengineeringpipeline_spark.operators import similarity as sim

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    lake = Lake(str(tmp_path / "lake"))
    sim.materialize_ann_index(emb, lake, snapshot="i1")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    got = sim.ann_index_topk(queries, emb, spark, lake, snapshot="i1").collect()
    want = sim.ann_ivfpq_topk(emb).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want] and len(got) > 0

    # append: re-encode a shifted copy of some vectors under new ids
    shifted = emb.filter(F.col("vec_id") < 5).select(
        (F.col("vec_id") + 100_000).alias("vec_id"), "embedding", "label"
    )
    sim.ann_index_append(shifted, spark, lake, snapshot="i1")
    n_all = spark.read.parquet(str(tmp_path / "lake/gold/ann_i1_encoded")).count()
    assert n_all == emb.count() + 5
    # a query identical to an appended vector finds it at cosine ~1
    probe = emb.filter(F.col("vec_id") == 2).select(
        (F.col("vec_id") + 777_000).alias("vec_id"), "embedding", "label"
    )
    corpus_all = emb.unionByName(shifted)
    top = sim.ann_index_topk(probe, corpus_all, spark, lake, snapshot="i1", k=1).collect()
    assert len(top) == 1 and top[0]["neighbor_id"] in (2, 100_002)
    assert top[0]["cosine"] > 0.999999


def test_incremental_dedup_matches_full_corpus_pairs(spark, sf_dir, tmp_path):
    """Splitting the corpus into base + increment and matching the
    increment against the materialized snapshot must flag exactly the
    increment docs that the FULL-corpus LSH links to a base doc; the
    appended state then serves a second increment."""
    from dataengineeringpipeline_spark.operators.dedup import (
        incremental_dedup,
        materialize_signatures,
        minhash_lsh_pairs,
    )

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    n_docs = docs.count()
    cut = (2 * n_docs) // 3
    base, inc = docs.filter(F.col("doc_id") < cut), docs.filter(F.col("doc_id") >= cut)
    lake = Lake(str(tmp_path / "lake"))
    materialize_signatures(base, lake, snapshot="s")
    got = {
        r["doc_id"]: r
        for r in incremental_dedup(inc, spark, lake, snapshot="s").collect()
    }
    assert set(got) == {r["doc_id"] for r in inc.select("doc_id").collect()}
    # ground truth: full-corpus verified pairs straddling the cut
    cross = {}
    for r in minhash_lsh_pairs(docs).collect():
        if r["doc_a"] < cut <= r["doc_b"]:
            cross.setdefault(r["doc_b"], []).append((r["jaccard"], r["doc_a"]))
    assert len(cross) > 0  # the fixture corpus has dup families across the cut
    for doc_id, cands in cross.items():
        best_j, best_a = max(((j, -a) for j, a in cands))
        assert got[doc_id]["is_duplicate"], doc_id
        assert got[doc_id]["dup_of"] == -best_a and abs(got[doc_id]["jaccard"] - best_j) < 1e-12
    for doc_id, r in got.items():
        if doc_id not in cross:
            assert not r["is_duplicate"] and r["dup_of"] is None
    # append folded the increment in: an identical re-increment matches itself
    again = {
        r["doc_id"]: r
        for r in incremental_dedup(
            inc.limit(5), spark, lake, snapshot="s", append=False
        ).collect()
    }
    assert all(r["is_duplicate"] and r["jaccard"] == 1.0 for r in again.values())


def test_hybrid_clusters_merge_lexical_and_semantic_evidence(spark):
    """Doc 1-2 share text (lexical edge), doc 2-3 share an embedding
    (semantic edge), docs 1 and 3 share nothing directly — the hybrid
    union must still place all three in one cluster, which neither
    single-modality clustering would."""
    from pyspark.sql import Row

    from dataengineeringpipeline_spark.operators.dedup import (
        hybrid_dup_clusters,
        minhash_dup_clusters,
    )

    same = "the quick brown fox jumps over the lazy dog near the river bank"
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=same),
            Row(doc_id=2, text=same),
            Row(doc_id=3, text="entirely different words about unrelated machinery and tools"),
        ]
    )
    e1 = [1.0] + [0.0] * 63
    e2 = [0.0, 1.0] + [0.0] * 62
    emb = spark.createDataFrame(
        [Row(vec_id=1, embedding=e1, label=0), Row(vec_id=2, embedding=e2, label=0),
         Row(vec_id=3, embedding=e2, label=0)],
        "vec_id bigint, embedding array<float>, label int",
    )
    got = {r["doc_id"]: (r["cluster_id"], r["cluster_size"]) for r in
           hybrid_dup_clusters(docs, emb).collect()}
    assert got == {1: (1, 3), 2: (1, 3), 3: (1, 3)}
    # lexical-only clustering sees just the 1-2 pair
    lex = {r["doc_id"] for r in minhash_dup_clusters(docs).collect()}
    assert lex == {1, 2}


def test_materialized_corpus_matches_lazy_funnel(spark, sf_dir, tmp_path):
    """Lake-checkpointed snapshot == the lazy funnel: same survivor ids,
    same packed chunks, and consumers read parquet instead of re-running
    the LSH chain."""
    from dataengineeringpipeline_spark.operators import corpus as corpus_ops

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    lake = Lake(str(tmp_path / "lake"))
    paths = corpus_ops.materialize_corpus(docs, lake, snapshot="t1")
    snap = corpus_ops.read_corpus(spark, lake, snapshot="t1")
    want_keep = {r["doc_id"] for r in corpus_ops.corpus_keep_ids(docs).collect()}
    got_keep = {r["doc_id"] for r in snap["keep_ids"].collect()}
    assert got_keep == want_keep and len(got_keep) > 0
    want_chunks = sorted(
        (r["doc_id"], r["chunk_idx"], r["seq_id"], r["chunk_token_count"])
        for r in corpus_ops.training_corpus(docs).collect()
    )
    got_chunks = sorted(
        (r["doc_id"], r["chunk_idx"], r["seq_id"], r["chunk_token_count"])
        for r in snap["chunks"].collect()
    )
    assert got_chunks == want_chunks
    assert paths["chunks"].endswith("gold/corpus_t1_chunks")


def test_read_any_dispatches_all_formats(spark, sf_dir, tmp_path):
    """S7 multi-format reader: parquet/csv/json/orc round-trip through
    read_any with extension inference and explicit fmt override."""
    from dataengineeringpipeline_spark.datalake import read_any

    src = (
        spark.read.parquet(os.path.join(sf_dir, "region.parquet"))
        .select("r_regionkey", "r_name")
        .orderBy("r_regionkey")
    )
    rows = [(r["r_regionkey"], r["r_name"]) for r in src.collect()]
    paths = {
        "parquet": str(tmp_path / "t.parquet"),
        "csv": str(tmp_path / "t.csv"),
        "json": str(tmp_path / "t.json"),
        "orc": str(tmp_path / "t.orc"),
    }
    src.write.parquet(paths["parquet"])
    src.write.option("header", "true").csv(paths["csv"])
    src.write.json(paths["json"])
    src.write.orc(paths["orc"])
    for fmt, path in paths.items():
        got = read_any(spark, path)  # inferred from extension
        assert sorted(
            (int(r["r_regionkey"]), r["r_name"]) for r in got.collect()
        ) == rows, fmt
    # explicit fmt overrides a non-indicative path
    plain = str(tmp_path / "plain_dir_orc")
    src.write.orc(plain)
    got = read_any(spark, plain, fmt="orc")
    assert got.count() == len(rows)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported format"):
        read_any(spark, str(tmp_path / "t.avro"), fmt="avro")


def test_decontaminate_counts_benchmark_overlap(spark):
    """Known 3-gram overlap: one corpus doc shares exactly one 3-gram with
    the benchmark, one shares none, one is too short to shingle."""
    from dataengineeringpipeline_spark.operators.decontam import decontaminate

    corpus = spark.createDataFrame(
        [
            Row(doc_id=1, text="x alpha beta gamma y"),  # "alpha beta gamma" hits
            Row(doc_id=2, text="delta epsilon zeta eta"),  # no overlap
            Row(doc_id=3, text="one two"),  # < 3 words: no 3-grams at all
        ]
    )
    bench = spark.createDataFrame([Row(doc_id=100, text="alpha beta gamma tail words here")])
    got = {r["doc_id"]: r for r in decontaminate(corpus, bench).collect()}
    assert got[1]["total_ngrams"] == 3 and got[1]["contaminated_ngrams"] == 1
    assert got[1]["is_contaminated"] and abs(got[1]["contamination_ratio"] - 1 / 3) < 1e-12
    assert got[2]["contaminated_ngrams"] == 0 and not got[2]["is_contaminated"]
    assert got[3]["total_ngrams"] == 0 and got[3]["contamination_ratio"] is None


def test_boilerplate_stats_flags_corpus_frequent_ngrams(spark):
    """A 3-gram present in 4 documents (df > min_df=3) is boilerplate;
    document-unique ngrams are not."""
    from dataengineeringpipeline_spark.operators.decontam import boilerplate_stats

    docs = spark.createDataFrame(
        [Row(doc_id=i, text=f"shared header line unique{i} tail{i}") for i in range(4)]
    )
    # each doc's 3-grams: "shared header line", "header line uniqueI",
    # "line uniqueI tailI" -> exactly one corpus-wide frequent ngram (df=4)
    got = {r["doc_id"]: r for r in boilerplate_stats(docs, min_df=3).collect()}
    for i in range(4):
        assert got[i]["total_ngrams"] == 3
        assert got[i]["boilerplate_ngrams"] == 1
        assert abs(got[i]["boilerplate_ratio"] - 1 / 3) < 1e-12


def test_interval_join_matches_naive_and_handles_spans(spark):
    """Bucketed interval join == naive theta-join, including intervals
    spanning many buckets (no duplicate pairs) and left rows with no
    interval (kept under how='left', dropped under inner)."""
    from dataengineeringpipeline_spark.operators.asof import interval_join

    points = spark.createDataFrame(
        [(i, t) for i, t in enumerate([5, 10, 99, 100, 150, 250, 999])],
        "pid long, ts long",
    )
    intervals = spark.createDataFrame(
        [(1, 0, 100), (2, 90, 160), (3, 100, 101), (4, 0, 1000)],
        "iid long, s long, e long",
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join(points, intervals, "ts", "s", "e", bucket_width=50).collect()
    }
    naive = {
        (r["pid"], r["iid"])
        for r in points.crossJoin(intervals)
        .filter((F.col("ts") >= F.col("s")) & (F.col("ts") < F.col("e")))
        .collect()
    }
    assert got == naive and got
    # half-open semantics: ts=100 not in [0,100) but in [100,101) and [90,160)
    assert (3, 1) not in got and (3, 3) in got and (3, 2) in got
    left = interval_join(points, intervals, "ts", "s", "e", bucket_width=50, how="left")
    matched = {(r["pid"], r["iid"]) for r in left.collect() if r["iid"] is not None}
    assert matched == naive
    import pytest as _pytest

    with _pytest.raises(ValueError):
        interval_join(points, intervals, "ts", "s", "e", bucket_width=50, how="full")


def test_pq_encode_properties_and_rerank_dominates_adc(spark, sf_dir):
    """PQ codes are in range and partitioning-independent; codebook
    vectors encode to their own code in every subspace (distance 0); the
    exact re-rank pass never has lower recall than the raw ADC ranking."""
    from dataengineeringpipeline_spark.operators import similarity as s

    emb = _embeddings(spark, sf_dir)
    enc = {r["vec_id"]: r["codes"] for r in s.pq_encode(emb).collect()}
    assert all(len(c) == s.PQ_M for c in enc.values())
    assert all(0 <= v < s.PQ_K for c in enc.values() for v in c)
    again = {r["vec_id"]: r["codes"] for r in s.pq_encode(emb.repartition(13)).collect()}
    assert enc == again
    for c in range(s.PQ_K):
        vid = s.PQ_CODEBOOK_STRIDE * c
        if vid in enc:
            assert enc[vid] == [c] * s.PQ_M
    r = s.pq_recall(emb).collect()[0]
    assert r["rerank_hits"] >= r["adc_hits"]
    assert r["exact_pairs"] >= r["rerank_hits"]


def test_funnel_monotone_and_cohort_offset_zero_full(spark, sf_dir):
    """Funnel step counts can only shrink along the sequence; a cohort's
    offset-0 row is by definition every cohort member (retention 1.0)."""
    from dataengineeringpipeline_spark import events_analytics as ea
    from dataengineeringpipeline_spark.datalake import load_events

    ev = load_events(spark, sf_dir)
    steps = ea.conversion_funnel(ev).collect()
    counts = [r["users_completed"] for r in sorted(steps, key=lambda r: r["step_idx"])]
    assert counts == sorted(counts, reverse=True)
    assert all(r["conversion_from_prev"] <= 1.0 for r in steps)

    rows = ea.cohort_retention(ev).collect()
    for r in rows:
        if r["period_offset"] == 0:
            assert r["active_users"] == r["cohort_users"]
            assert r["retention"] == 1.0
        assert 0 < r["active_users"] <= r["cohort_users"]


def test_ivfpq_with_all_cells_probed_equals_pq_rerank(spark, sf_dir):
    """With nprobe >= the cell count the IVF restriction vanishes, so
    IVF+PQ must reduce to exactly the plain PQ shortlist + re-rank —
    the composition adds pruning, never different answers."""
    from dataengineeringpipeline_spark.operators import similarity as s

    emb = _embeddings(spark, sf_dir)
    full = [
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in s.ann_ivfpq_topk(emb, nprobe=10**6).collect()
    ]
    plain = [
        (r["query_id"], r["rank"], r["neighbor_id"])
        for r in s.pq_topk_rerank(emb).collect()
    ]
    assert sorted(full) == sorted(plain)


def test_leakage_safe_splits_keep_clusters_together(spark, sf_dir):
    """No dedup cluster may straddle two splits (the whole point), and
    assignment must be deterministic under repartitioning."""
    from dataengineeringpipeline_spark.operators import dedup, sampling

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assigned = sampling.leakage_safe_splits(docs).collect()
    split_of = {r["doc_id"]: r["split"] for r in assigned}
    clusters = dedup.minhash_dup_clusters(docs).collect()
    by_cluster: dict[int, set] = {}
    for r in clusters:
        by_cluster.setdefault(r["cluster_id"], set()).add(split_of[r["doc_id"]])
    assert by_cluster, "test corpus has no dup clusters - guard untestable"
    for cid, splits in by_cluster.items():
        assert len(splits) == 1, f"cluster {cid} spans {splits}"
    again = {
        r["doc_id"]: r["split"]
        for r in sampling.leakage_safe_splits(docs.repartition(13)).collect()
    }
    assert again == split_of


def test_split_leakage_audit_closed_form(spark):
    """Two planted duplicate pairs whose endpoints hash into different
    per-mille split buckets (1→train/17→test, 4→train/5→val by the
    documented formula): the naive policy must leak both pairs, the
    cluster-keyed policy neither."""
    from dataengineeringpipeline_spark.operators import sampling

    dup_a = "the migration guide explains how to move tables between regions safely " * 3
    dup_b = "quarterly revenue grew across every segment while costs stayed flat overall " * 3
    rows = [
        (1, dup_a),
        (17, dup_a),
        (4, dup_b),
        (5, dup_b),
        (2, "entirely unrelated prose about gardening tools and their seasonal upkeep"),
        (21, "another singleton document describing a bicycle repair procedure in detail"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["policy"]: r for r in sampling.split_leakage_audit(docs).collect()}
    assert out["naive"]["dup_pairs"] == out["cluster_keyed"]["dup_pairs"] == 2
    assert out["cluster_keyed"]["cross_split_pairs"] == 0
    assert out["cluster_keyed"]["leak_pm"] == 0
    assert out["naive"]["cross_split_pairs"] == 2
    assert out["naive"]["train_eval_pairs"] == 2
    assert out["naive"]["leak_pm"] == 1000


def test_duplicate_span_coverage_closed_form(spark):
    """Hand-computed span coverage: a 100-char block shared between two
    docs at grid-aligned offsets, an internal self-repeat, a unique doc,
    and a doc too short to window."""
    import random

    from dataengineeringpipeline_spark.operators.dedup import duplicate_span_coverage

    rng = random.Random(7)

    def rand_text(n, alphabet="abcdefghijklmnopqrstuvwxyz"):
        return "".join(rng.choice(alphabet) for _ in range(n))

    B = rand_text(100)
    P = rand_text(45, "ABCDEFGHIJKLMNOP")
    docs = spark.createDataFrame(
        [
            # B at pos 41 (grid-aligned with doc 2's B at pos 1: offsets
            # differ by a stride multiple, so window hashes collide)
            Row(doc_id=1, text=rand_text(40, "0123456789") + B),
            Row(doc_id=2, text=B + rand_text(37, "QRSTUVWXYZ")),
            # internal repetition: P ... P, second copy at pos 51
            Row(doc_id=3, text=P + "zzzzz" + P),
            Row(doc_id=4, text=rand_text(120, "!@#$%^&*()")),  # unique
            Row(doc_id=5, text="short"),  # < window: no windows at all
        ]
    )
    got = {r["doc_id"]: r for r in duplicate_span_coverage(docs).collect()}

    # doc 1: L=140, windows at 1..101; those at 41..101 sit inside B and
    # match doc 2's offsets 0,10,..,60 -> one island covering B (41..140)
    assert got[1]["total_windows"] == 11
    assert got[1]["dup_windows"] == 7
    assert got[1]["dup_chars"] == 100
    assert abs(got[1]["dup_char_ratio"] - 100 / 140) < 1e-12
    # doc 2: L=137, windows at 1..91; 1..61 inside B -> island 1..100
    assert got[2]["total_windows"] == 10
    assert got[2]["dup_windows"] == 7
    assert got[2]["dup_chars"] == 100
    # doc 3: L=95; windows 1 and 51 are both exactly P[0:40] (self-repeat)
    # -> two islands [1,40] and [51,90]
    assert got[3]["dup_windows"] == 2
    assert got[3]["dup_chars"] == 80
    assert abs(got[3]["dup_char_ratio"] - 80 / 95) < 1e-12
    # unique and too-short docs report zero coverage (ratio 0, not NULL)
    assert got[4]["dup_windows"] == 0 and got[4]["dup_char_ratio"] == 0.0
    assert got[5]["total_windows"] == 0 and got[5]["dup_chars"] == 0


def test_shared_span_pairs_closed_form(spark):
    """Cross-doc span pairs: a 100-char block shared between docs 1 and
    2 at grid-aligned offsets pairs them with 7 shared windows; a doc's
    internal repetition does NOT pair it with itself; a unique doc pairs
    with nobody."""
    import random

    from dataengineeringpipeline_spark.operators.dedup import shared_span_pairs

    rng = random.Random(7)

    def rand_text(n, alphabet="abcdefghijklmnopqrstuvwxyz"):
        return "".join(rng.choice(alphabet) for _ in range(n))

    B = rand_text(100)
    P = rand_text(45, "ABCDEFGHIJKLMNOP")
    docs = spark.createDataFrame(
        [
            Row(doc_id=1, text=rand_text(40, "0123456789") + B),
            Row(doc_id=2, text=B + rand_text(37, "QRSTUVWXYZ")),
            Row(doc_id=3, text=P + "zzzzz" + P),  # self-repeat only
            Row(doc_id=4, text=rand_text(120, "!@#$%^&*()")),
        ]
    )
    rows = shared_span_pairs(docs).collect()
    assert [(r["doc_a"], r["doc_b"]) for r in rows] == [(1, 2)]
    r = rows[0]
    # B occupies doc1[41:140] and doc2[1:100]; windows land every 10
    # chars, so 7 windows of B align across the two docs
    assert r["shared_windows"] == 7
    assert r["min_pos_a"] == 41 and r["min_pos_b"] == 1


def test_remove_duplicate_spans_closed_form(spark):
    """The cleaned text is exactly the original minus the coverage
    islands: verified by md5 against a hand-built expectation for every
    island shape (head-covered, tail-covered, internal repeat, no
    coverage, too-short)."""
    import hashlib
    import random

    from dataengineeringpipeline_spark.operators.dedup import remove_duplicate_spans

    rng = random.Random(7)

    def rand_text(n, alphabet="abcdefghijklmnopqrstuvwxyz"):
        return "".join(rng.choice(alphabet) for _ in range(n))

    B = rand_text(100)
    P = rand_text(45, "ABCDEFGHIJKLMNOP")
    t1 = rand_text(40, "0123456789") + B          # island [41,140] -> tail cut
    t2 = B + rand_text(37, "QRSTUVWXYZ")          # island [1,100] -> head cut
    t3 = P + "zzzzz" + P                          # islands [1,40],[51,90]
    t4 = rand_text(120, "!@#$%^&*()")             # untouched
    t5 = "short"                                  # untouched (< window)
    docs = spark.createDataFrame(
        [Row(doc_id=i + 1, text=t) for i, t in enumerate([t1, t2, t3, t4, t5])]
    )
    expect = {
        1: t1[:40],                 # keep chars 1..40
        2: t2[100:],                # keep chars 101..137
        3: t3[40:50] + t3[90:],     # keep 41..50 and 91..95
        4: t4,
        5: t5,
    }
    got = {r["doc_id"]: r for r in remove_duplicate_spans(docs).collect()}
    for d, txt in expect.items():
        assert got[d]["kept_chars"] == len(txt), d
        assert got[d]["cleaned_md5"] == hashlib.md5(txt.encode()).hexdigest(), d
    assert got[1]["removed_chars"] == 100
    assert got[3]["removed_chars"] == 80


def test_shared_span_pairs_boilerplate_guard(spark):
    """A block pasted into more documents than max_df is excluded
    from pairing entirely — boilerplate belongs to boilerplate_report,
    not the pair graph."""
    import random

    from dataengineeringpipeline_spark.operators.dedup import shared_span_pairs

    rng = random.Random(11)
    B = "".join(rng.choice("abcdefghij") for _ in range(60))
    docs = spark.createDataFrame(
        [Row(doc_id=i, text=B + str(i)) for i in range(1, 6)]
    )
    # df=5 > max_df=4: no pairs at all
    assert shared_span_pairs(docs, max_df=4).count() == 0
    # df=5 <= max_df=5: all 10 pairs appear
    assert shared_span_pairs(docs, max_df=5).count() == 10


def test_doc_length_distribution_closed_form_and_approx_brackets(spark):
    """Known word/char counts: interpolated percentiles are hand-checked,
    and the approx (scale) path stays within the group's value range."""
    from dataengineeringpipeline_spark.operators.text import doc_length_distribution

    # 5 docs of 1..5 words ("a", "a a", ...): word_count = k, char_count = 2k-1
    docs = spark.createDataFrame(
        [Row(doc_id=k, text=" ".join(["a"] * k), lang="en", source="s") for k in range(1, 6)]
    )
    row = doc_length_distribution(docs).collect()[0]
    assert row["docs"] == 5
    # percentile over [1..5]: p25 -> 2.0, p50 -> 3.0, p90 -> 1 + 0.9*4 = 4.6
    assert row["word_p25"] == 2.0 and row["word_p50"] == 3.0
    assert abs(row["word_p90"] - 4.6) < 1e-12
    assert row["avg_words"] == 3.0
    # char counts [1,3,5,7,9]: p50 -> 5.0, mean 5.0
    assert row["char_p50"] == 5.0 and row["avg_chars"] == 5.0
    approx = doc_length_distribution(docs, exact=False).collect()[0]
    assert 1.0 <= approx["word_p50"] <= 5.0
    assert approx["docs"] == 5


def test_semantic_decontamination_flags_and_tiebreaks(spark):
    """Known geometry: a corpus vector parallel to a benchmark vector is
    contaminated (cosine 1.0, scale-invariant), an orthogonal one is not,
    and a vector equidistant to two identical benchmark vectors reports
    the LOWER benchmark id."""
    from dataengineeringpipeline_spark.operators.similarity import semantic_decontamination

    rows = [
        Row(vec_id=0, label="b", embedding=[1.0, 0.0, 0.0, 0.0]),    # benchmark
        Row(vec_id=100, label="b", embedding=[1.0, 0.0, 0.0, 0.0]),  # benchmark twin
        Row(vec_id=1, label="c", embedding=[2.0, 0.0, 0.0, 0.0]),    # parallel -> hit, tie -> bid 0
        Row(vec_id=2, label="c", embedding=[0.0, 3.0, 0.0, 0.0]),    # orthogonal -> clean
        Row(vec_id=3, label="c", embedding=[1.0, 1.0, 0.0, 0.0]),    # cos = 1/sqrt(2)
    ]
    got = {
        r["vec_id"]: r
        for r in semantic_decontamination(spark.createDataFrame(rows), threshold=0.9).collect()
    }
    assert set(got) == {1, 2, 3}  # benchmark rows are not scored
    assert got[1]["is_contaminated"] and got[1]["best_cosine"] == 1.0
    assert got[1]["best_match_id"] == 0  # tie between 0 and 100 -> lowest id
    assert not got[2]["is_contaminated"] and abs(got[2]["best_cosine"]) < 1e-12
    assert abs(got[3]["best_cosine"] - 2**-0.5) < 1e-12 and not got[3]["is_contaminated"]


def test_top_ngrams_per_source_floor_and_ties(spark):
    """min_df floor excludes singleton n-grams; ranking is doc-frequency
    desc with alphabetical tie-break; per-doc counting is distinct (a
    doc repeating the n-gram internally counts once)."""
    from dataengineeringpipeline_spark.operators.decontam import top_ngrams_per_source

    docs = spark.createDataFrame(
        [
            Row(doc_id=1, source="s1", text="a b c x y z"),       # "a b c" + "x y z"(via windows)
            Row(doc_id=2, source="s1", text="a b c a b c"),       # repeats "a b c" internally
            Row(doc_id=3, source="s1", text="a b c unique words"),
            Row(doc_id=4, source="s2", text="only one doc here"),  # all singletons
        ]
    )
    got = top_ngrams_per_source(docs).collect()
    by_source = {}
    for r in got:
        by_source.setdefault(r["source"], []).append(r)
    # s2 has no n-gram in >= 2 docs: no rows at all
    assert "s2" not in by_source
    top = by_source["s1"][0]
    assert top["shingle"] == "a b c" and top["doc_freq"] == 3 and top["rank"] == 1
    # doc 2's internal repetition did not inflate doc_freq past the 3 docs
    assert all(r["doc_freq"] <= 3 for r in by_source["s1"])


def test_bpe_learns_closed_form_merges(spark):
    """Hand-computable corpus: 'ab'x3 + 'abc'x2 -> merge0 = ('a b' -> ab,
    count 5), merge1 = ('ab c' -> abc, count 2), then the vocabulary is
    fully merged and training stops early."""
    from dataengineeringpipeline_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab abc")], "doc_id long, text string"
    )
    ms = bpe.bpe_train(docs, n_merges=5)
    assert [(m["pair"], m["merged"], m["pair_count"]) for m in ms] == [
        ("a b", "ab", 5),
        ("ab c", "abc", 2),
    ]


def test_bpe_segment_applies_merges_in_rank_order(spark):
    from dataengineeringpipeline_spark.operators import bpe

    merges = [
        {"merge_rank": 0, "pair": "a b", "merged": "ab", "pair_count": 5},
        {"merge_rank": 1, "pair": "ab c", "merged": "abc", "pair_count": 2},
    ]
    out = bpe.bpe_segment(
        spark.createDataFrame([("abcd",), ("zab",), ("x",)], "word string"), merges
    )
    got = {r["word"]: r["sym"] for r in out.collect()}
    # greedy-left: 'abcd' -> 'a b c d' -> 'ab c d' -> 'abc d'
    assert got == {"abcd": "abc d", "zab": "z ab", "x": "x"}


def test_bpe_merge_application_is_greedy_left_nonoverlapping(spark):
    """'aaa' with pair (a,a): leftmost pair merges, third 'a' survives —
    the same semantics the DuckDB oracle's replace() implements."""
    from dataengineeringpipeline_spark.operators import bpe

    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    ms = bpe.bpe_train(docs, n_merges=1)
    assert ms[0]["pair"] == "a a"
    seg = bpe.bpe_segment(
        spark.createDataFrame([("aaa",), ("aaaa",)], "word string"), ms
    )
    got = {r["word"]: r["sym"] for r in seg.collect()}
    # separator consumption: in a same-symbol run, alternate occurrences
    # merge per round ('a a a a' -> 'aa a a'); the leftover pair is
    # picked up by later rounds' counts (see module docstring)
    assert got == {"aaa": "aa a", "aaaa": "aa a a"}


def test_bpe_materialized_merges_tokenize_new_batches_identically(spark, tmp_path):
    """Freeze-to-lake lifecycle: stored merges reload into the exact
    list the trainer produced, and tokenizing an UNSEEN batch with them
    equals tokenizing with the in-memory merges — no retraining."""
    from dataengineeringpipeline_spark.datalake import Lake
    from dataengineeringpipeline_spark.operators import bpe

    docs = spark.createDataFrame(
        [(1, "ab ab abc"), (2, "ab abc")], "doc_id long, text string"
    )
    lake = Lake(str(tmp_path))
    bpe.materialize_bpe(docs, lake, n_merges=4)
    stored = bpe.read_bpe_merges(spark, lake)
    trained = bpe.bpe_train(docs, n_merges=4)
    assert stored == trained
    batch = spark.createDataFrame([("abx",), ("cab",)], "word string")
    a = {r["word"]: r["sym"] for r in bpe.bpe_segment(batch, stored).collect()}
    b = {r["word"]: r["sym"] for r in bpe.bpe_segment(batch, trained).collect()}
    assert a == b == {"abx": "ab x", "cab": "c ab"}


def test_asof_join_direction_trio_closed_form(spark):
    """backward/forward/nearest against hand-computed matches, ties to
    backward, tolerance voiding in the match's direction."""
    from dataengineeringpipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 100), (1, 205), (1, 400), (2, 50)], "k long, lt long"
    )
    right = spark.createDataFrame(
        [(1, 90, "a"), (1, 200, "b"), (1, 210, "c"), (1, 1000, "d")],
        "k long, rt long, v string",
    )

    def run(**kw):
        return {
            (r["k"], r["lt"]): (r["v"], r["asof_ts"])
            for r in asof_join(left, right, "k", "lt", "rt", ["v"], **kw).collect()
        }

    back = run()
    assert back[(1, 100)] == ("a", 90)
    assert back[(1, 205)] == ("b", 200)
    assert back[(1, 400)] == ("c", 210)
    assert back[(2, 50)] == (None, None)
    fwd = run(direction="forward")
    assert fwd[(1, 100)] == ("b", 200)
    assert fwd[(1, 205)] == ("c", 210)
    assert fwd[(1, 400)] == ("d", 1000)
    assert fwd[(2, 50)] == (None, None)
    near = run(direction="nearest")
    assert near[(1, 100)] == ("a", 90)   # 10 back vs 100 fwd
    assert near[(1, 205)] == ("b", 200)  # tie (5 vs 5) -> backward
    assert near[(1, 400)] == ("c", 210)  # 190 back vs 600 fwd
    # tolerance voids the far side: at lt=400, back match (210) is 190
    # away -> void under 100; fwd (1000) is 600 away -> void too
    near_tol = run(direction="nearest", tolerance=100)
    assert near_tol[(1, 400)] == (None, None)
    assert near_tol[(1, 205)] == ("b", 200)
    fwd_tol = run(direction="forward", tolerance=50)
    assert fwd_tol[(1, 100)] == (None, None)  # next right is 100 away
    assert fwd_tol[(1, 205)] == ("c", 210)


def test_asof_join_equal_timestamps_are_inclusive_both_directions(spark):
    from dataengineeringpipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame([(1, 100)], "k long, lt long")
    right = spark.createDataFrame([(1, 100, "x")], "k long, rt long, v string")
    for d in ("backward", "forward", "nearest"):
        got = asof_join(left, right, "k", "lt", "rt", ["v"], direction=d).collect()[0]
        assert (got["v"], got["asof_ts"]) == ("x", 100), d


# -- fuzzy record linkage (operators/linkage.py) ----------------------------


def _linkage_records(spark):
    return spark.createDataFrame(
        [
            (1, "acme corp"),
            (2, "acme corp"),
            (3, "acme co"),
            (4, "zeta llc"),
            (5, "zeta lcc"),
            (6, "other name"),
        ],
        "rid bigint, rname string",
    )


def test_fuzzy_name_pairs_closed_form(spark):
    from dataengineeringpipeline_spark.operators.linkage import fuzzy_name_pairs

    rows = fuzzy_name_pairs(_linkage_records(spark), "rid", "rname").collect()
    got = {(r["a_name"], r["b_name"]): r["distance"] for r in rows}
    # "acme corp"(id 1) ↔ "acme co"(id 3): lev 2; "zeta llc" ↔ "zeta lcc": lev 1
    assert got == {("acme corp", "acme co"): 2, ("zeta llc", "zeta lcc"): 1}
    for r in rows:
        assert r["a_id"] < r["b_id"]


def test_entity_resolution_report_closed_form(spark):
    from dataengineeringpipeline_spark.operators.linkage import (
        entity_resolution_report,
    )

    rows = entity_resolution_report(_linkage_records(spark), "rid", "rname").collect()
    by_entity = {r["entity_id"]: r for r in rows}
    assert set(by_entity) == {1, 4}
    acme = by_entity[1]
    assert acme["n_names"] == 2  # "acme corp", "acme co"
    assert acme["n_records"] == 3  # two "acme corp" records + one "acme co"
    assert acme["canonical_name"] == "acme corp"  # name of min id
    assert acme["max_distance"] == 2
    zeta = by_entity[4]
    assert (zeta["n_names"], zeta["n_records"], zeta["max_distance"]) == (2, 2, 1)
    assert zeta["canonical_name"] == "zeta llc"
    # report is ordered by record count descending
    assert [r["entity_id"] for r in rows] == [1, 4]


def test_fuzzy_name_pairs_block_cap_drops_hot_blocks(spark):
    from dataengineeringpipeline_spark.operators.linkage import fuzzy_name_pairs

    rows = fuzzy_name_pairs(
        _linkage_records(spark), "rid", "rname", max_block=1
    ).collect()
    assert rows == []  # every block has ≥2 names or never matches


def test_fuzzy_join_matches_batch_to_catalog(spark):
    from dataengineeringpipeline_spark.operators.linkage import fuzzy_join

    catalog = spark.createDataFrame(
        [(10, "acme corp"), (11, "zeta llc"), (12, "omega inc")],
        "cid bigint, cname string",
    )
    batch = spark.createDataFrame(
        [(1, "acme co"), (2, "zeta lcc"), (3, "unrelated name"), (4, "omega inc")],
        "bid bigint, bname string",
    )
    rows = fuzzy_join(batch, catalog, "bid", "bname", "cid", "cname").collect()
    got = {(r["left_key"], r["right_key"]): r["distance"] for r in rows}
    # exact match distance 0; typo variants matched; unrelated dropped
    assert got == {(1, 10): 2, (2, 11): 1, (4, 12): 0}


def test_fuzzy_join_best_only_picks_closest(spark):
    from dataengineeringpipeline_spark.operators.linkage import fuzzy_join

    catalog = spark.createDataFrame(
        [(10, "acme corp"), (11, "acme co")], "cid bigint, cname string"
    )
    batch = spark.createDataFrame([(1, "acme cor")], "bid bigint, bname string")
    best = fuzzy_join(batch, catalog, "bid", "bname", "cid", "cname").collect()
    # "acme cor" is 1 from "acme corp", 1 from "acme co" → tie to lowest id
    assert [(r["right_key"], r["distance"]) for r in best] == [(10, 1)]
    all_rows = fuzzy_join(
        batch, catalog, "bid", "bname", "cid", "cname", best_only=False
    ).collect()
    assert len(all_rows) == 2


def test_fuzzy_join_best_only_one_row_per_left_record(spark):
    """best_only must yield exactly ONE row per left record even when
    the catalog has duplicate rows under the matched name, and the tie
    must go to the lowest ACTUAL right key (regression: the old
    vocabulary-level filter fanned out across duplicate catalog rows
    and tie-broke on the name's min-key surrogate)."""
    from dataengineeringpipeline_spark.operators.linkage import fuzzy_join

    catalog = spark.createDataFrame(
        # duplicate catalog listings of the same name, plus an
        # equal-distance competitor whose min name_id is lower
        [(20, "acme corp"), (25, "acme corp"), (21, "acme cord")],
        "cid bigint, cname string",
    )
    batch = spark.createDataFrame([(1, "acme cor")], "bid bigint, bname string")
    rows = fuzzy_join(batch, catalog, "bid", "bname", "cid", "cname").collect()
    # distance 1 to both names; duplicates of "acme corp" collapse to
    # one row; tie resolved by the real right key: 20
    assert [(r["left_key"], r["right_key"], r["distance"]) for r in rows] == [
        (1, 20, 1)
    ]


def test_contrastive_pairs_mines_positives_and_excludes_dup_negatives(spark):
    """Two planted dup pairs, one of them exactly a stride pair (3, 20):
    positives = both pairs; negatives = every (i, i+17) EXCEPT the dup
    one; with embeddings aligned to the duplicate structure the positive
    band must sit above the negative band."""
    from dataengineeringpipeline_spark.operators import similarity

    dup_a = "the shared migration guide text repeated for the dedup pass " * 3
    dup_b = "a second duplicated block of prose that also repeats verbatim " * 3
    rows = []
    for i in range(1, 41):
        if i in (1, 2):
            rows.append((i, dup_a))
        elif i in (3, 20):
            rows.append((i, dup_b))
        else:
            # token-disjoint filler so no two fillers share a shingle
            rows.append((i, " ".join(f"w{i}x{j}" for j in range(12))))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    # embeddings: dup groups share a direction, everyone else orthogonal-ish
    import math

    def vec(i):
        v = [0.0] * 64
        if i in (1, 2):
            v[0] = 1.0
        elif i in (3, 20):
            v[1] = 1.0
        else:
            v[2 + (i % 60)] = 1.0
            v[(7 * i) % 64] += 0.1
        return v

    emb = spark.createDataFrame(
        [(i, vec(i), 0) for i in range(1, 41)],
        "vec_id long, embedding array<float>, label int",
    )
    out = {r["pair_set"]: r for r in similarity.contrastive_pairs_report(docs, emb).collect()}
    assert out["positive"]["pairs"] == 2
    # stride negatives: ids 1..23 have i+17 <= 40 -> 23 candidates, minus the (3,20) dup
    assert out["negative"]["pairs"] == 22
    assert out["positive"]["mean_cos"] > 0.9
    assert out["negative"]["mean_cos"] < 0.5
    assert out["positive"]["min_cos"] > out["negative"]["mean_cos"]


def test_ann_index_purge_removes_neighbor_with_rank_backfill(spark, sf_dir, tmp_path):
    """Purging a known top-1 neighbor from the materialized index: the
    purged vec_id never surfaces again (candidate codes physically
    gone), every query still returns k neighbors (ranks backfill with
    the next-best candidates), and the survivors keep their relative
    order."""
    from dataengineeringpipeline_spark.operators import similarity as sim

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    lake = Lake(str(tmp_path / "lake"))
    sim.materialize_ann_index(emb, lake, snapshot="p1")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    before = sim.ann_index_topk(queries, emb, spark, lake, snapshot="p1", k=5).collect()
    per_q: dict = {}
    for r in before:
        per_q.setdefault(r["query_id"], []).append(r)
    qid, rows = next((q, rs) for q, rs in per_q.items() if len(rs) == 5)
    doomed = rows[0]["neighbor_id"]

    audit = sim.ann_index_purge(
        spark, lake, spark.createDataFrame([(doomed,)], "vec_id long"), snapshot="p1"
    )
    assert audit["rows_removed"] == 1

    after = sim.ann_index_topk(queries, emb, spark, lake, snapshot="p1", k=5).collect()
    assert all(r["neighbor_id"] != doomed for r in after)  # erased everywhere
    per_q_after: dict = {}
    for r in after:
        per_q_after.setdefault(r["query_id"], []).append(r)
    got = per_q_after[qid]
    assert len(got) == 5  # rank backfilled to k
    assert [r["rank"] for r in got] == [1, 2, 3, 4, 5]
    # survivors keep their relative order; the old ranks 2..5 shift up
    old_tail = [r["neighbor_id"] for r in rows if r["neighbor_id"] != doomed]
    assert [r["neighbor_id"] for r in got][: len(old_tail)] == old_tail
