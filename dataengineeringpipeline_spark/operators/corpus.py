"""End-to-end training-corpus construction: the composition every LLM
data pipeline runs, wired from this package's operators:

    raw documents
      → PII scrub                     (operators/text.scrub_pii)
      → near-dup survivor selection   (operators/dedup.dedup_survivors)
      → quality gate                  (operators/text.quality_score)
      → repetition gate               (operators/text.repetition_stats)
      → token-window chunking         (operators/text.chunk_documents)
      → fixed-budget sequence packing (operators/text.pack_chunks)

Dedup runs on the RAW text (before the quality gates): near-duplicate
detection wants the original byte stream, and removing low-quality docs
first would split duplicate clusters whose members straddle the quality
threshold. Scrubbing precedes chunking so placeholder tokens count
toward the token budget exactly as they will at training time.

Every stage is a DataFrame transform — the whole funnel is one lazy
plan; nothing materializes until the caller acts. At 100 TB you would
checkpoint the survivor set and the chunk table to the lake between
stages (they are reused by many downstream jobs), but the composition
itself is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.cache import tracked_persist
from dataengineeringpipeline_spark.operators.dedup import dedup_survivors
from dataengineeringpipeline_spark.scale import spread
from dataengineeringpipeline_spark.operators.text import (
    chunk_documents,
    pack_chunks,
    quality_score,
    repetition_stats,
    scrub_pii,
    text_stats,
    word_hash,
)

DEFAULT_MIN_QUALITY = 40
DEFAULT_MAX_DUP_RATIO = 0.2


def _doc_cols(docs: DataFrame) -> DataFrame:
    """Prune to the columns the funnel consumes BEFORE ``spread``: the
    spread persist is an optimizer barrier, so anything not dropped here
    is materialized in the cache and read from the scan for nothing."""
    return docs.select("doc_id", "lang", "source", "text")


def _dedup_losers(docs: DataFrame, dedup_threshold: float) -> DataFrame:
    """doc_ids removed by near-dup survivor selection (clustered, not the
    quality-weighted survivor); unclustered docs are implicit survivors."""
    return dedup_survivors(docs, dedup_threshold).filter(~F.col("is_survivor")).select("doc_id")


def _gate_ids(
    docs: DataFrame, losers: DataFrame, min_quality: int, max_dup_ratio: float
) -> DataFrame:
    """doc_ids passing the quality + repetition gates among non-losers.

    Every join side here is a tiny id set while ``docs`` carries the
    full text column — broadcast the ids so the corpus text is never
    shuffled (a sort-merge join would move every document's bytes)."""
    kept = docs.join(F.broadcast(losers), "doc_id", "left_anti")
    good = quality_score(text_stats(kept)).filter(
        F.col("quality_score") >= min_quality
    ).select("doc_id")
    calm = repetition_stats(kept).filter(
        F.col("dup_ngram_ratio") <= max_dup_ratio
    ).select("doc_id")
    return kept.select("doc_id").join(F.broadcast(good), "doc_id", "left_semi").join(
        F.broadcast(calm), "doc_id", "left_semi"
    )


def corpus_keep_ids(
    docs: DataFrame,
    min_quality: int = DEFAULT_MIN_QUALITY,
    max_dup_ratio: float = DEFAULT_MAX_DUP_RATIO,
    dedup_threshold: float = 0.5,
) -> DataFrame:
    """doc_ids surviving dedup + quality + repetition gates.

    Near-dup losers (clustered, not the quality-weighted survivor) are
    removed; unclustered docs are implicit survivors. The gates then
    keep docs with quality ≥ ``min_quality`` and duplicate-3-gram ratio
    ≤ ``max_dup_ratio``."""
    docs = spread(_doc_cols(docs), "doc_id")
    return _gate_ids(docs, _dedup_losers(docs, dedup_threshold), min_quality, max_dup_ratio)


def training_corpus(
    docs: DataFrame,
    min_quality: int = DEFAULT_MIN_QUALITY,
    max_dup_ratio: float = DEFAULT_MAX_DUP_RATIO,
    dedup_threshold: float = 0.5,
    chunk_tokens: int = 64,
    overlap: int = 16,
    budget: int = 256,
) -> DataFrame:
    """Packed training chunks from the raw corpus — the full funnel.

    Returns (doc_id, chunk_idx, chunk_token_count, chunk_text,
    pack_group, seq_start_offset, seq_id)."""
    docs = spread(_doc_cols(docs), "doc_id")
    keep = corpus_keep_ids(docs, min_quality, max_dup_ratio, dedup_threshold)
    return _pack_kept(docs, keep, chunk_tokens, overlap, budget)


def _pack_kept(
    docs: DataFrame, keep: DataFrame, chunk_tokens: int, overlap: int, budget: int
) -> DataFrame:
    # scrub AFTER the keep filter: the regex chain is the per-row
    # expensive part, no reason to pay it for gated-out documents.
    # keep is a small id set — broadcast so the text never shuffles.
    kept_docs = docs.join(F.broadcast(keep), "doc_id", "left_semi")
    scrubbed = scrub_pii(kept_docs).select(
        "doc_id", F.col("scrubbed_text").alias("text")
    )
    return pack_chunks(chunk_documents(scrubbed, chunk_tokens, overlap), budget)


def training_corpus_funnel(
    docs: DataFrame,
    min_quality: int = DEFAULT_MIN_QUALITY,
    max_dup_ratio: float = DEFAULT_MAX_DUP_RATIO,
    dedup_threshold: float = 0.5,
    chunk_tokens: int = 64,
    overlap: int = 16,
    budget: int = 256,
) -> DataFrame:
    """One-row funnel report — the corpus-construction observable a
    pipeline owner watches: docs in, docs after each gate, and the
    chunk/sequence/token yield of the packed output.

    Fully lazy, ONE driver action when consumed: the three per-stage
    counts come from one aggregation over a stage-labeled id frame
    (every doc tagged with whether it survived dedup and the gates), the
    packed yield from a second 1-row aggregation, and the report is
    their crossJoin — two independent 1-row subtrees under a single
    job, no driver collect anywhere. The persisted loser/keep id sets
    are what keep the expensive LSH→verify→cluster chain executing ONCE
    across both subtrees (measured 26s → ~8s at sf0.1 when the persists
    landed; fusing the per-stage counts 4 actions → 2 shaved ~1.5s, and
    folding the remaining two actions into this single lazy plan
    another ~0.6s — 6.4 → 5.8s steady-state).

    ``spread`` fixes the other local pathology: a compact single-file
    corpus scans as ONE partition, serializing the regex/shingle/chunk
    maps on one core (measured ~13s → ~2.5s for the gate+pack path at
    sf0.1 on 32 cores; no-op on well-partitioned cluster-scale input)."""
    docs = spread(_doc_cols(docs), "doc_id")
    losers = tracked_persist(_dedup_losers(docs, dedup_threshold))
    keep = tracked_persist(_gate_ids(docs, losers, min_quality, max_dup_ratio))
    stage_agg = (
        docs.select("doc_id")
        .join(F.broadcast(losers.withColumn("is_loser", F.lit(True))), "doc_id", "left")
        .join(
            F.broadcast(keep.withColumn("is_kept", F.lit(True))), "doc_id", "left"
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs_in"),
            F.sum(F.when(F.col("is_loser").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("docs_after_dedup"),
            F.sum(F.when(F.col("is_kept").isNotNull(), 1).otherwise(0))
            .cast("long")
            .alias("docs_after_gates"),
        )
    )
    packed = _pack_kept(docs, keep, chunk_tokens, overlap, budget)
    yield_agg = packed.agg(
        F.count(F.lit(1)).cast("long").alias("chunks"),
        F.countDistinct("pack_group", "seq_id").cast("long").alias("sequences"),
        F.sum("chunk_token_count").cast("long").alias("tokens"),
    )
    # both sides are single rows; the join is a trivial broadcast
    return stage_agg.crossJoin(yield_agg)


def materialize_corpus(
    docs: DataFrame,
    lake,
    snapshot: str = "snap1",
    min_quality: int = DEFAULT_MIN_QUALITY,
    max_dup_ratio: float = DEFAULT_MAX_DUP_RATIO,
    dedup_threshold: float = 0.5,
    chunk_tokens: int = 64,
    overlap: int = 16,
    budget: int = 256,
) -> dict[str, str]:
    """Checkpoint the funnel's reusable intermediates to the lake — the
    100 TB shape this module's docstrings promise: the survivor id set
    and the packed chunk table are consumed by MANY downstream jobs
    (train/val/test splits, domain mixes, tokenizer runs, epoch
    shuffles), so a production pipeline derives them ONCE per corpus
    snapshot and every consumer reads the parquet tables — re-running
    the LSH→verify→cluster chain per consumer would multiply the most
    expensive shuffle in the whole engine by the consumer count.

    Writes ``gold/corpus_<snapshot>_keep_ids`` (doc_id) and
    ``gold/corpus_<snapshot>_chunks`` (the :func:`training_corpus`
    schema), returns ``{"keep_ids": path, "chunks": path}``. The chunk
    table is written as-is (pack_chunks already spread the rows across
    the cluster via its hash-group shuffle); at warehouse scale, bucket
    it on ``doc_id`` (``scale.write_bucketed``) if chunk↔doc joins are
    a recurring downstream pattern.

    Idempotent per snapshot: overwrite mode — re-materializing a
    snapshot replaces it atomically at the table level.
    """
    docs = spread(_doc_cols(docs), "doc_id")
    keep = tracked_persist(
        corpus_keep_ids(docs, min_quality, max_dup_ratio, dedup_threshold)
    )
    keep_path = lake.write(keep, "gold", f"corpus_{snapshot}_keep_ids")
    chunks = _pack_kept(docs, keep, chunk_tokens, overlap, budget)
    chunks_path = lake.write(chunks, "gold", f"corpus_{snapshot}_chunks")
    return {"keep_ids": keep_path, "chunks": chunks_path}


def read_corpus(spark, lake, snapshot: str = "snap1") -> dict[str, DataFrame]:
    """Read a materialized corpus snapshot's tables back from the lake."""
    return {
        "keep_ids": lake.read(spark, "gold", f"corpus_{snapshot}_keep_ids"),
        "chunks": lake.read(spark, "gold", f"corpus_{snapshot}_chunks"),
    }


# ---------------------------------------------------------------------------
# Training shards: deterministic global shuffle → balanced output files
# ---------------------------------------------------------------------------

N_SHARDS = 16


def shard_assignments(docs: DataFrame, n_shards: int = N_SHARDS, seed: int = 0) -> DataFrame:
    """Deterministic global shuffle + shard assignment — the last mile
    of a training-data pipeline (the trainer streams shard files; the
    order must be shuffled, reproducible, and balanced).

    ``sort_key`` is the engine-portable md5 hash of ``seed:doc_id``
    (:func:`..text.word_hash`): a pseudo-random total order that any
    cluster (or engine) reproduces bit-exactly — no RNG, no
    partitioning dependence, re-seedable per epoch. ``shard`` is its
    ``pmod``; with a high-cardinality hash the shards are balanced to
    sampling noise. One map-only projection; the only shuffle anywhere
    in the path is the final ``repartition(shard)`` at write time.

    Returns (doc_id, shard, sort_key)."""
    h = word_hash(F.concat_ws(":", F.lit(str(seed)), F.col("doc_id").cast("string")))
    return docs.select(
        "doc_id",
        F.pmod(h, F.lit(n_shards)).cast("int").alias("shard"),
        h.alias("sort_key"),
    )


def materialize_training_shards(
    docs: DataFrame,
    lake,
    snapshot: str = "shards1",
    n_shards: int = N_SHARDS,
    seed: int = 0,
) -> str:
    """Write the shuffled corpus as a shard-partitioned gold table:
    one hash-ordered partition directory per shard, rows sorted by
    ``sort_key`` inside each file so a trainer reading a shard
    sequentially sees the shuffled order without any further sort."""
    assigned = shard_assignments(docs, n_shards, seed)
    out = (
        docs.join(assigned, "doc_id")
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "sort_key")
    )
    return lake.write(out, "gold", f"corpus_{snapshot}_shards", partition_by=("shard",))


def shard_balance_report(
    docs: DataFrame, n_shards: int = N_SHARDS, seed: int = 0
) -> DataFrame:
    """Per-shard balance readout: docs, token mass, and each shard's
    per-mille share of the corpus (integer arithmetic). The gauge that
    says whether any trainer rank starves. Returns (shard, docs,
    tokens, docs_pm, tokens_pm) ordered by shard."""
    from dataengineeringpipeline_spark.operators.text import TOKEN_REGEX

    toks = docs.select(
        "doc_id", F.regexp_count("text", F.lit(TOKEN_REGEX)).cast("long").alias("tokens")
    )
    per = (
        shard_assignments(docs, n_shards, seed)
        .join(toks, "doc_id")
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("tokens").cast("long").alias("tokens"),
        )
    )
    tot = per.agg(
        F.sum("docs").cast("long").alias("t_docs"),
        F.sum("tokens").cast("long").alias("t_tokens"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "shard",
            "docs",
            "tokens",
            F.expr("(docs * 1000) div t_docs").cast("long").alias("docs_pm"),
            F.expr("(tokens * 1000) div t_tokens").cast("long").alias("tokens_pm"),
        )
        .orderBy("shard")
    )


def snapshot_diff(spark, lake, snapshot_a: str, snapshot_b: str) -> DataFrame:
    """What changed between two materialized corpus snapshots — the
    version-diff a data team reads before switching trainers to a new
    snapshot (did the new gates drop 1% or 40%?).

    One full-outer join of the two id tables (ids only — the chunk
    payloads never load, so a snapshot materialized without its chunk
    table diffs just the same) and single-row integer counts:
    (docs_a, docs_b, kept_both, added, removed, churn_pm) where churn is
    the per-mille of snapshot B that is new. Engine-trivial at any
    corpus size: the id tables are the funnel's smallest artifact."""
    a = lake.read(spark, "gold", f"corpus_{snapshot_a}_keep_ids").select(
        F.col("doc_id").alias("id_a")
    )
    b = lake.read(spark, "gold", f"corpus_{snapshot_b}_keep_ids").select(
        F.col("doc_id").alias("id_b")
    )
    joined = a.join(b, a["id_a"] == b["id_b"], "full_outer")
    return joined.agg(
        F.count("id_a").cast("long").alias("docs_a"),
        F.count("id_b").cast("long").alias("docs_b"),
        F.sum(
            F.when(F.col("id_a").isNotNull() & F.col("id_b").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("kept_both"),
        F.sum(
            F.when(F.col("id_a").isNull() & F.col("id_b").isNotNull(), 1).otherwise(0)
        ).cast("long").alias("added"),
        F.sum(
            F.when(F.col("id_a").isNotNull() & F.col("id_b").isNull(), 1).otherwise(0)
        ).cast("long").alias("removed"),
    ).select(
        "*",
        F.expr(
            "CASE WHEN docs_b > 0 THEN (added * 1000) div docs_b ELSE 0 END"
        ).cast("long").alias("churn_pm"),
    )


#: Gate settings for the two snapshots the diff contract query compares:
#: snapshot A is the incumbent (quality ≥ 80, some repetition tolerated),
#: snapshot B the candidate (slightly looser quality floor, but zero
#: repetition tolerance) — a two-dimensional gate change, so the diff has
#: both additions and removals, like a real policy revision would.
SNAPSHOT_GATES_A = (80, 0.05)
SNAPSHOT_GATES_B = (75, 0.0)


def snapshot_diff_report(
    docs: DataFrame,
    lake=None,
    gates_a: tuple[int, float] = SNAPSHOT_GATES_A,
    gates_b: tuple[int, float] = SNAPSHOT_GATES_B,
    dedup_threshold: float = 0.5,
) -> DataFrame:
    """Contract harness for :func:`snapshot_diff`: materialize two corpus
    snapshots that differ only in gate policy, then diff their id tables
    through the lake.

    The expensive subtrees are shared, not recomputed per snapshot: the
    LSH→verify→cluster loser set depends only on ``dedup_threshold``
    (identical for both snapshots) and the quality/repetition scores are
    per-document facts — so both are computed ONCE, persisted, and the
    two snapshots are just two threshold filters over the same scored
    frame. At 100 TB this is exactly how snapshot families are cut: one
    scoring pass, N policy filters, N cheap id-table writes.
    """
    from dataengineeringpipeline_spark.datalake import Lake

    spark = docs.sparkSession
    if lake is None:
        import tempfile

        lake = Lake(tempfile.mkdtemp(prefix="snapshot_diff_"))
    docs = spread(_doc_cols(docs), "doc_id")
    losers = tracked_persist(_dedup_losers(docs, dedup_threshold))
    kept = docs.join(F.broadcast(losers), "doc_id", "left_anti")
    scores = tracked_persist(
        quality_score(text_stats(kept))
        .select("doc_id", "quality_score")
        .join(repetition_stats(kept).select("doc_id", "dup_ngram_ratio"), "doc_id")
    )
    for snapshot, (min_q, max_r) in (("snapa", gates_a), ("snapb", gates_b)):
        keep = scores.filter(
            (F.col("quality_score") >= min_q) & (F.col("dup_ngram_ratio") <= max_r)
        ).select("doc_id")
        lake.write(keep, "gold", f"corpus_{snapshot}_keep_ids")
    return snapshot_diff(spark, lake, "snapa", "snapb")


def corpus_datacard(docs: DataFrame) -> DataFrame:
    """Per-source data card — the one-page summary a dataset release
    ships (datasheet/data-card practice): volume, token yield, quality,
    language composition, and exact-duplication rate, per source.

    Two narrow per-doc frames share the corpus scan economics: the
    quality/stats projection (map-only expressions) and the exact-dup
    flag (one window over the md5 fingerprint — high-cardinality key,
    well-spread shuffle of 16-byte rows; the text column never
    shuffles). They meet in one doc_id join of int-sized rows, then a
    single per-source aggregation. Integer per-mille rates (`div`) keep
    every rate engine-exact; the only float is the final mean-quality
    division."""
    from pyspark.sql import Window

    # prune BEFORE spread: column pruning does not push through a
    # user-requested repartition, so an unpruned spread would drag every
    # unused column through the scan
    docs = spread(docs.select("doc_id", "lang", "source", "text"), "doc_id")
    scored = quality_score(text_stats(docs)).select(
        "doc_id", "source", "lang", "token_count", "quality_score", "is_high_quality"
    )
    dup_ids = (
        docs.select("doc_id", F.md5("text").alias("m"))
        .withColumn("gs", F.count(F.lit(1)).over(Window.partitionBy("m")))
        .filter(F.col("gs") > 1)
        .select("doc_id", F.lit(True).alias("is_dup"))
    )
    per_doc = scored.join(dup_ids, "doc_id", "left")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("docs"),
            F.sum("token_count").cast("long").alias("tokens"),
            F.sum("quality_score").cast("long").alias("_qsum"),
            F.sum(F.when(F.col("is_high_quality"), 1).otherwise(0)).cast("long").alias("_hq"),
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("long").alias("_en"),
            F.countDistinct("lang").cast("long").alias("langs"),
            F.sum(F.when(F.col("is_dup").isNotNull(), 1).otherwise(0)).cast("long").alias("_dups"),
        )
        .select(
            "source",
            "docs",
            "tokens",
            (F.col("_qsum").cast("double") / F.col("docs").cast("double")).alias(
                "mean_quality"
            ),
            F.expr("(_hq * 1000) div docs").cast("long").alias("high_quality_pm"),
            F.expr("(_en * 1000) div docs").cast("long").alias("english_pm"),
            "langs",
            F.expr("(_dups * 1000) div docs").cast("long").alias("exact_dup_pm"),
        )
        .orderBy("source")
    )
