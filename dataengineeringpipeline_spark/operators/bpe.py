"""Distributed BPE merge-rule induction — tokenizer training as a
first-class corpus operator.

A training-data pipeline that counts tokens, chunks documents, and packs
sequences eventually needs the tokenizer itself to come FROM the corpus.
This module implements byte-pair-encoding vocabulary induction (Sennrich,
Haddow & Birch, *Neural Machine Translation of Rare Words with Subword
Units*, ACL 2016 — the public recipe) Spark-first:

- The corpus collapses to a **word-frequency table** first (one
  corpus-sized aggregation; Zipf bounds the vocabulary far below corpus
  size), and every merge iteration runs over that table only — the
  classic "aggregate once, iterate on the aggregate" shape that makes
  the loop's per-iteration cost independent of corpus size at 100 TB.
- Each iteration is: adjacent-pair counts (map-only array transform +
  explode over the vocab), one tiny argmax collect (a single best-pair
  row — the only driver traffic), and a map-only merge application.
  The working table is persisted per iteration and the predecessor
  unpersisted, so lineage never re-executes earlier rounds.
- Merge application is greedy-left non-overlapping string replacement
  on space-delimited symbol strings — ``replace(' '||sym||' ', ' a b ',
  ' ab ')`` — which Spark and DuckDB implement identically (verified on
  the overlapping ``a a a`` case), making the whole iterative algorithm
  oracle-exact: the DuckDB twin unrolls the same N rounds as chained
  CTEs. Semantics note: because the separator space is consumed by the
  match, a run of IDENTICAL symbols merges alternate occurrences per
  round (``a a a a`` → ``aa a a``, not classic BPE's ``aa aa``); the
  leftover pairs simply surface in later rounds' counts. For pairs of
  distinct symbols — every merge the test corpora actually learn — the
  application is exactly the reference recipe. Classic intra-run
  semantics would need lookaround regex, which RE2 (DuckDB) lacks; an
  engine-divergent operator would be worse than a precisely-defined
  engine-exact one.

Determinism: pair counts are exact integer sums; the argmax tie-breaks
on (count DESC, pair ASC); no RNG anywhere — any engine derives the
same merge table from the same corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from dataengineeringpipeline_spark.operators.text import words_col

#: Default number of merge rounds for the contract query — enough to show
#: multi-character symbols composing from earlier merges.
BPE_MERGES = 8


def word_frequencies(docs: DataFrame, min_word_freq: int = 1) -> DataFrame:
    """Corpus → (word, freq): the single corpus-sized pass of BPE
    training. ``min_word_freq`` prunes the singleton tail (the same
    scale guard ``top_ngrams_per_source`` uses) without changing the
    high-count merges that matter."""
    wf = (
        docs.select(F.explode(words_col("text")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    if min_word_freq > 1:
        wf = wf.filter(F.col("freq") >= min_word_freq)
    return wf


def _spaced_symbols(word) -> F.Column:
    """'abc' -> 'a b c' (one space between single-char symbols)."""
    return F.trim(F.regexp_replace(word, "(.)", "$1 "))


def _adjacent_pairs(sym_col: str = "sym") -> F.Column:
    """Array of adjacent symbol pairs 'x y' from a delimited symbol
    string; empty for single-symbol words (guarded: Spark's sequence()
    runs DESCENDING when start > stop, it does not return empty)."""
    arr = F.split(F.col(sym_col), " ")
    pairs = F.transform(
        F.sequence(F.lit(0), F.size(arr) - 2),
        lambda i: F.concat(
            F.element_at(arr, i + 1), F.lit(" "), F.element_at(arr, i + 2)
        ),
    )
    return F.when(F.size(arr) >= 2, pairs).otherwise(
        F.array().cast("array<string>")
    )


def bpe_train(
    docs: DataFrame, n_merges: int = BPE_MERGES, min_word_freq: int = 1
) -> list[dict]:
    """Learn ``n_merges`` BPE merge rules from the corpus; returns them
    in rank order as dicts ``{merge_rank, pair, merged, pair_count}``.

    The loop stops early if no pair remains (fully merged vocabulary).

    Exactly ONE Spark action per round (the best-pair collect): each
    round's vocab state is persisted lazily, and the round's argmax job
    populates that cache while it scans — the already-cached predecessor
    bounds recomputation to a single map stage. The vocab is coalesced
    to a few partitions first: it's ~|vocab| rows, and 8 rounds of
    32-task micro-jobs would be pure scheduler overhead.
    """
    cur = (
        word_frequencies(docs, min_word_freq)
        .select(_spaced_symbols(F.col("word")).alias("sym"), "freq")
        .coalesce(4)
        .persist()
    )
    persisted = [cur]
    merges: list[dict] = []
    try:
        for rank in range(n_merges):
            best = (
                cur.select(F.explode(_adjacent_pairs()).alias("pair"), "freq")
                .groupBy("pair")
                .agg(F.sum("freq").cast("long").alias("pair_count"))
                .orderBy(F.desc("pair_count"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            pair = best[0]["pair"]
            merged = pair.replace(" ", "")
            merges.append(
                {
                    "merge_rank": rank,
                    "pair": pair,
                    "merged": merged,
                    "pair_count": int(best[0]["pair_count"]),
                }
            )
            cur = cur.select(
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("sym"), F.lit(" ")),
                        F.lit(f" {pair} "),
                        F.lit(f" {merged} "),
                    )
                ).alias("sym"),
                "freq",
            ).persist()
            persisted.append(cur)
    finally:
        for p in persisted:
            p.unpersist()
    return merges


def bpe_merge_table(
    docs: DataFrame, n_merges: int = BPE_MERGES, min_word_freq: int = 1
) -> DataFrame:
    """Contract-query face of :func:`bpe_train`: the learned merge table
    as a DataFrame (n_merges rows — driver-side by construction, the
    merges ARE the model)."""
    spark = docs.sparkSession
    rows = [
        (m["merge_rank"], m["pair"], m["merged"], m["pair_count"])
        for m in bpe_train(docs, n_merges, min_word_freq)
    ]
    return spark.createDataFrame(
        rows, "merge_rank int, pair string, merged string, pair_count long"
    ).orderBy("merge_rank")


def bpe_segment(
    df: DataFrame, merges: list[dict], text_col: str = "word", out_col: str = "sym"
) -> DataFrame:
    """Apply learned merge rules to segment words into subword symbols:
    the inference half of the tokenizer. A map-only chain of the same
    greedy-left replacements, applied in rank order — no shuffle, no
    state beyond the (tiny) merge list baked into the plan."""
    sym = F.concat(F.lit(" "), _spaced_symbols(F.col(text_col)), F.lit(" "))
    for m in sorted(merges, key=lambda m: m["merge_rank"]):
        sym = F.replace(sym, F.lit(f" {m['pair']} "), F.lit(f" {m['merged']} "))
    return df.withColumn(out_col, F.trim(sym))


def bpe_subword_stats(
    docs: DataFrame, n_merges: int = BPE_MERGES, min_word_freq: int = 1
) -> DataFrame:
    """Train-then-apply in one report: learn the merge table, tokenize
    the corpus with it (the map-only :func:`bpe_segment` chain over
    every word occurrence — the real corpus-scale tokenizer pass), and
    report per-source compression: word occurrences, subword tokens,
    and subwords-per-word. The number a tokenizer owner watches as the
    vocabulary grows — it starts at ~word-length with no merges and
    falls toward 1.0 as merges cover the corpus."""
    # spread: a single-file corpus scans as ONE partition, serializing
    # the explode + merge-replace tokenizer chain on one core (profiled
    # as a 0.5s single-task job at sf0.1); the persisted repartition
    # also shares one corpus scan between the training pass and the
    # segmentation pass. No-op on well-partitioned cluster-scale input.
    from dataengineeringpipeline_spark.scale import spread

    base = spread(docs.select("doc_id", "source", "text"), "doc_id")
    merges = bpe_train(base, n_merges, min_word_freq)
    words = base.select(
        "source", F.explode(words_col("text")).alias("word")
    ).filter(F.col("word") != "")
    seg = bpe_segment(words, merges, text_col="word", out_col="sym")
    per_word = seg.select(
        "source", F.size(F.split(F.col("sym"), " ")).cast("long").alias("subwords")
    )
    return (
        per_word.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("words"),
            F.sum("subwords").cast("long").alias("subwords"),
        )
        .select(
            "source",
            "words",
            "subwords",
            (F.col("subwords").cast("double") / F.col("words").cast("double")).alias(
                "subwords_per_word"
            ),
        )
        .orderBy("source")
    )


def materialize_bpe(
    docs: DataFrame, lake, table: str = "bpe_merges", n_merges: int = BPE_MERGES
) -> str:
    """Train once, freeze to the lake: write the merge table as a gold
    table — the tokenizer analog of the frozen-quantizer ANN index and
    the materialized dedup signatures. Later batches are tokenized with
    :func:`read_bpe_merges` + :func:`bpe_segment` (map-only, no
    retraining); re-deriving the vocabulary is a scheduled snapshot job,
    not a per-batch cost."""
    return lake.write(bpe_merge_table(docs, n_merges), "gold", table)


def read_bpe_merges(spark, lake, table: str = "bpe_merges") -> list[dict]:
    """Load a materialized merge table back into the list form
    :func:`bpe_segment` consumes (n_merges rows — driver-side by
    construction)."""
    return [
        r.asDict()
        for r in lake.read(spark, "gold", table).orderBy("merge_rank").collect()
    ]
