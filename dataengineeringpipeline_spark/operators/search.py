"""Lexical retrieval over an inverted index — the search half of a
corpus platform (near-dup finds *copies*; retrieval finds *relevant*
documents for a query).

Scoring is rarity-weighted distinct-term overlap:

    score(q, d) = Σ_{t ∈ terms(q) ∩ terms(d)}  (N * 1000) // df(t)

i.e. an IDF-shaped weight kept in **exact integer arithmetic** (floor
division instead of the textbook ``log(N/df)`` — the ranking signal is
the same "rare terms count more", but the score is a pure integer sum,
so top-k membership and order are bit-identical in any engine; the
log/BM25 variants tie the score to libm, the divergence the drift and
HLL modules document).

Plan shape at 100 TB — the classic distributed search-index build:

- posting rows are ``explode(array_distinct(words))`` — one shuffle of
  (term, doc_id) pairs to build the index; document *text* never
  shuffles.
- ``df`` and the weight table are vocabulary-sized — orders of
  magnitude smaller than the corpus — and broadcast.
- the query side is a bounded query set: broadcast against the posting
  lists, so scoring joins are map-side; the only corpus-wide exchange
  after the index build is the (query_id, doc_id) score aggregation,
  whose input is already pruned to matched postings.
- ``max_df`` is the hot-list guard (same role as dedup.DEDUP_MAX_DF):
  terms appearing in more than ``max_df`` candidate documents are
  dropped from scoring — stopword pruning that bounds the worst
  posting list's fan-out. Default None because the synthetic corpus
  has a ~40-word vocabulary where every term exceeds any useful cap;
  production sets it (and the weight floor makes ubiquitous terms
  near-worthless anyway: df ≈ N ⇒ weight ≈ 1000 ⇒ rarest-term signal
  dominates).

At index-refresh scale the posting/df/weight tables are materialized to
the lake once per corpus snapshot (the same lifecycle as the ANN index
and dedup signatures) and every query batch reads them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.operators.text import words_col

#: Integer weight scale: weight(t) = (N * WEIGHT_SCALE) // df(t).
WEIGHT_SCALE = 1000


def posting_lists(docs: DataFrame) -> DataFrame:
    """(term, doc_id) posting rows — distinct terms per document."""
    return docs.select(
        "doc_id", F.explode(F.array_distinct(words_col())).alias("term")
    )


def term_weights(postings: DataFrame, max_df: int | None = None) -> DataFrame:
    """Vocabulary-sized (term, df, weight) table from posting rows.

    ``N`` (the candidate corpus size) is derived from the postings
    themselves (distinct doc count) so the weight table is
    self-contained when read back from a materialized index."""
    df_tab = postings.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df")
    )
    n_row = postings.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    # integer floor division (`div`), NOT float `/` + cast: the weight
    # must be the exact integer quotient in every engine
    wt = df_tab.crossJoin(F.broadcast(n_row)).select(
        "term",
        "df",
        F.expr(f"(n_docs * {WEIGHT_SCALE}) div df").cast("long").alias("weight"),
    )
    if max_df is not None:
        wt = wt.filter(F.col("df") <= max_df)
    return wt


def lexical_search_topk(
    docs: DataFrame,
    k: int = 5,
    query_mod: int = 100,
    max_df: int | None = None,
    ordered: bool = True,
) -> DataFrame:
    """Top-k candidate documents per query document.

    Queries = ``doc_id % query_mod == 0`` (the module-family held-out
    convention); candidates = everything else, so a query never
    retrieves itself. Ties break by ascending doc_id. Returns
    (query_id, doc_id, shared_terms, score, rank) ordered by
    (query_id, rank); ``ordered=False`` skips the presentation sort for
    consumers (fusion, joins) that destroy the order anyway."""
    # spread: a compact single-file corpus scans as ONE partition,
    # serializing the tokenize/explode and the broadcast scoring joins
    # below the first exchange on one core (profiled: 0.76s single-task
    # job at sf0.1). Persisted repartition, shared by the candidate and
    # query branches; no-op on well-partitioned cluster-scale input.
    # Projected to the two columns the retriever reads BEFORE the
    # exchange (guide: never ship unused columns through a shuffle).
    from dataengineeringpipeline_spark.scale import spread

    docs = spread(docs.select("doc_id", "text"), "doc_id")
    cand = docs.filter(F.col("doc_id") % query_mod != 0)
    posts = posting_lists(cand)
    wt = term_weights(posts, max_df)
    q_terms = posting_lists(docs.filter(F.col("doc_id") % query_mod == 0)).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    matched = (
        posts.join(F.broadcast(wt), "term")
        .join(F.broadcast(q_terms), "term")
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_terms"),
            F.sum("weight").cast("long").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    out = matched.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return out.orderBy("query_id", "rank") if ordered else out


# ---------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of lexical + embedding lists
# ---------------------------------------------------------------------------

#: RRF contribution scale: contrib(rank) = RRF_SCALE div (RRF_K0 + rank).
#: Integer floor division of positive ints — the fused score is a pure
#: integer sum (same engine-exactness rationale as WEIGHT_SCALE; the
#: textbook 1/(k0+r) float sum would tie tie-breaks to addition order).
RRF_SCALE = 1_000_000
RRF_K0 = 60


def hybrid_search_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    k: int = 10,
    list_k: int = 20,
    query_mod: int = 100,
    k0: int = RRF_K0,
    ordered: bool = True,
) -> DataFrame:
    """Top-k hybrid retrieval: the lexical top-``list_k`` and the
    embedding-cosine top-``list_k`` are fused with reciprocal-rank
    fusion — ``score = Σ_lists RRF_SCALE div (k0 + rank)`` — the
    standard two-retriever recipe (a doc ranked well by either signal
    surfaces; one ranked well by both wins).

    The doc and vector sides share the id space (``doc_id`` ≡
    ``vec_id``, the same convention ``dedup.hybrid_dup_clusters``
    uses); queries are the ``id % query_mod == 0`` held-out subset in
    both retrievers. A doc missing from one list contributes 0 from it
    (rank-based fusion needs no score normalization across the two
    incomparable score scales — that is the point of RRF).

    Plan shape: both input lists are already reduced to |Q|·list_k rows,
    so the fusion join + re-rank is driver-trivial at any corpus scale;
    the heavy lifting stays inside the two retrievers' own bounded
    plans. Returns (query_id, doc_id, lex_rank, sem_rank, rrf_score,
    rank) ordered by (query_id, rank); ties break by ascending doc_id.
    """
    from dataengineeringpipeline_spark.operators.similarity import (
        ann_bruteforce_topk,
    )

    lex = lexical_search_topk(
        docs, k=list_k, query_mod=query_mod, ordered=False
    ).select("query_id", "doc_id", F.col("rank").alias("lex_rank"))
    sem = ann_bruteforce_topk(
        embeddings, k=list_k, query_mod=query_mod, ordered=False
    ).select(
        "query_id",
        F.col("neighbor_id").alias("doc_id"),
        F.col("rank").alias("sem_rank"),
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_score",
        (
            F.coalesce(F.expr(f"{RRF_SCALE} div ({k0} + lex_rank)"), F.lit(0))
            + F.coalesce(F.expr(f"{RRF_SCALE} div ({k0} + sem_rank)"), F.lit(0))
        ).cast("long"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    out = fused.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
    return out.orderBy("query_id", "rank") if ordered else out


# ---------------------------------------------------------------------------
# Materialized search index (the lake lifecycle the module docstring
# promises — same snapshot pattern as the ANN index and dedup signatures)
# ---------------------------------------------------------------------------


def materialize_search_index(docs: DataFrame, lake, snapshot: str = "idx1") -> dict:
    """Write the inverted index to gold tables: the (term, doc_id)
    posting rows and a per-batch corpus-size table.

    Only the POSTINGS are stored — df/weights are derived on read
    (:func:`read_search_index`), because document frequency is the one
    statistic an append invalidates; storing it would bake in a stale
    ranking. The posting table is the index: term-partitionable,
    appendable, and orders of magnitude narrower than the corpus text
    (two ids per distinct term-occurrence; the text itself never lands
    in the index).

    ``n_docs`` is stored as data so a term-pruned or partially-read
    posting table cannot silently shift the IDF scale — and it is
    counted over the POSTING rows (docs that produced ≥1 term), the
    same ``N`` convention :func:`term_weights` uses inline, so a
    token-less document can never skew the stored corpus size away
    from the inline ranking. The meta table holds one row per write
    batch and the reader SUMs them (the same layout the streaming
    writer uses) — appends are pure appends, never read-modify-write.
    """
    from dataengineeringpipeline_spark.scale import spread

    # spread: parallelize the index-build explode on compact inputs and
    # share one corpus scan between the postings and meta writes (two
    # actions); no-op on well-partitioned cluster-scale input.
    posts = posting_lists(spread(docs.select("doc_id", "text"), "doc_id"))
    n_row = posts.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    return {
        "postings": lake.write(posts, "gold", f"search_{snapshot}_postings"),
        "meta": lake.write(n_row, "gold", f"search_{snapshot}_meta"),
    }


def search_index_append(new_docs: DataFrame, spark, lake, snapshot: str = "idx1") -> None:
    """Fold a new document batch into the stored index: explode the
    batch's postings (map-only over the batch — existing postings are
    untouched) and append; append the batch's own corpus-size row.
    Weights are derived at read time, so the next query batch
    automatically ranks with the post-append document frequencies — no
    rebuild. Both writes are appends: there is no read-modify-overwrite
    of shared state, so a concurrent append cannot lose the other's
    count (batches are assumed disjoint in ``doc_id``, the same
    contract the streaming writer's batch partitions rely on)."""
    posts = posting_lists(new_docs)
    lake.write(posts, "gold", f"search_{snapshot}_postings", mode="append")
    add_row = posts.agg(F.countDistinct("doc_id").cast("long").alias("n_docs"))
    lake.write(add_row, "gold", f"search_{snapshot}_meta", mode="append")


def read_search_index(spark, lake, snapshot: str = "idx1", max_df: int | None = None):
    """(postings, weights) from the stored snapshot. Weights are the
    same integer-IDF table :func:`term_weights` builds inline, computed
    from the STORED corpus size (summed over the per-batch count rows)."""
    posts = lake.read(spark, "gold", f"search_{snapshot}_postings")
    n_row = lake.read(spark, "gold", f"search_{snapshot}_meta").agg(
        F.sum("n_docs").cast("long").alias("n_docs")
    )
    df_tab = posts.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    wt = df_tab.crossJoin(F.broadcast(n_row)).select(
        "term",
        "df",
        F.expr(f"(n_docs * {WEIGHT_SCALE}) div df").cast("long").alias("weight"),
    )
    if max_df is not None:
        wt = wt.filter(F.col("df") <= max_df)
    return posts, wt


def search_index_topk(
    query_docs: DataFrame,
    spark,
    lake,
    snapshot: str = "idx1",
    k: int = 5,
    max_df: int | None = None,
) -> DataFrame:
    """Top-k retrieval from the materialized index — the same scoring
    join as :func:`lexical_search_topk`, but the posting/weight tables
    come from the lake instead of being rebuilt per query batch (the
    100 TB shape: the corpus is read once per snapshot, every query
    batch after that touches only the index tables).

    ``query_docs`` rows are (doc_id, text); a query never retrieves
    itself (its own postings may be in the index after an append).
    Returns the :func:`lexical_search_topk` schema."""
    posts, wt = read_search_index(spark, lake, snapshot, max_df)
    q_terms = posting_lists(query_docs).select(
        F.col("doc_id").alias("query_id"), "term"
    )
    matched = (
        posts.join(F.broadcast(wt), "term")
        .join(F.broadcast(q_terms), "term")
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("shared_terms"),
            F.sum("weight").cast("long").alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        matched.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def rag_context_stats(
    docs: DataFrame, embeddings: DataFrame, k: int = 3, list_k: int = 20
) -> DataFrame:
    """Context-pack readout for a RAG pipeline: for each query, retrieve
    the hybrid top-``k`` and report what would go into the prompt — how
    many context documents, their total token budget
    (:data:`..text.TOKEN_REGEX` tokens, the same counter the chunker and
    packer use), the best fused score, and the top-ranked doc.

    The only corpus-side touch beyond the retrievers is the token
    projection joined to |Q|·k retrieved rows (broadcast-sized).
    Returns (query_id, n_ctx, ctx_tokens, best_rrf, top_doc_id) ordered
    by query_id."""
    from dataengineeringpipeline_spark.operators.text import TOKEN_REGEX
    from dataengineeringpipeline_spark.scale import spread

    # One spread serves both corpus touches: the lexical retriever
    # inside hybrid_search_topk (its own spread no-ops on the already
    # repartitioned frame and reuses this cache) and the token
    # projection (a full-corpus regexp_count that otherwise runs
    # serialized on a compact input's single scan partition). Projected
    # to the columns both touches read before the exchange.
    docs = spread(docs.select("doc_id", "text"), "doc_id")
    top = hybrid_search_topk(docs, embeddings, k=k, list_k=list_k, ordered=False)
    tok = docs.select(
        "doc_id", F.regexp_count("text", F.lit(TOKEN_REGEX)).alias("tokens")
    )
    return (
        top.join(tok, "doc_id")
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_ctx"),
            F.sum("tokens").cast("long").alias("ctx_tokens"),
            F.max("rrf_score").cast("long").alias("best_rrf"),
            F.min(F.struct("rank", "doc_id")).getField("doc_id").alias("top_doc_id"),
        )
        .orderBy("query_id")
    )
