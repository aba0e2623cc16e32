"""Fuzzy record linkage (entity resolution) over structured records —
the structured-data sibling of the document dedup family.

Document dedup (``operators/dedup.py``) answers "are these two *texts*
the same content"; record linkage answers "do these two *rows* describe
the same real-world entity" when keys are absent and attribute strings
drift (typos, abbreviations, re-listings). The reference's DQ engine
flags exact duplicates only (key-group counts); this adds the fuzzy
tier a catalog at scale actually needs (duplicate part listings under
slightly different names).

Classic shape, with the scale twist that makes it tractable: the
quadratic phase runs over the **distinct-value vocabulary**, never the
record table —

- **vocabulary**: ``GROUP BY name`` collapses the corpus to its
  distinct names (orders of magnitude smaller — the same
  corpus-to-vocabulary collapse the BPE trainer rides); each name gets
  a deterministic numeric id (its min record key).
- **blocking**: names meet only inside a shared *block* (a shared name
  token — the inverted-index trick again: one shuffle of (token, name)
  rows, never the O(n²) pair space). ``max_block`` drops pathological
  blocks (a token shared by thousands of distinct names joins
  quadratically — same guard and rationale as ``dedup.DEDUP_MAX_DF``).
- **verify**: candidate name pairs are scored with exact Levenshtein
  edit distance (``F.levenshtein`` — JVM-side, integer, bit-identical
  in any engine), kept when ``distance <= max_dist``.
- **canonicalize**: matched name pairs are edges; connected components
  (:func:`..dedup.connected_components` — driver union-find under 2M
  edges, distributed min-label propagation above) assign each name its
  component-minimum id as ``entity_id``; records then join the tiny
  name→entity map by exact equality (broadcast, map-side) — the only
  corpus-wide work in the whole pipeline is that one hash join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.operators.dedup import connected_components

#: Blocks larger than this are dropped from candidate generation (a
#: block of b distinct names yields b·(b-1)/2 pairs; 1024 bounds the
#: worst single block at ~0.5M pairs). No-op at the test scales.
MAX_BLOCK = 1024


def name_vocabulary(records: DataFrame, key: str, name: str) -> DataFrame:
    """(name_id, rec_name) — one row per distinct name; ``name_id`` is
    the min record key carrying that name (deterministic, numeric, and
    meaningful: the oldest listing)."""
    return records.groupBy(F.col(name).alias("rec_name")).agg(
        F.min(key).alias("name_id")
    )


def fuzzy_name_pairs(
    records: DataFrame,
    key: str,
    name: str,
    max_dist: int = 2,
    max_block: int = MAX_BLOCK,
    ordered: bool = True,
) -> DataFrame:
    """Fuzzy-duplicate name pairs from the distinct-name vocabulary:
    token-blocked candidates, Levenshtein verify.

    Returns (a_id, b_id, a_name, b_name, distance) with ``a_id < b_id``,
    one row per matched name pair (a pair sharing several tokens is
    still reported once), ordered by (a_id, b_id). ``ordered=False``
    skips the final sort for consumers that immediately join/aggregate
    the pairs (connected components, the report roll-up) — they would
    pay a range-partition exchange for nothing."""
    vocab = name_vocabulary(records, key, name)
    toks = vocab.select(
        "name_id",
        "rec_name",
        F.explode(F.array_distinct(F.split("rec_name", " +"))).alias("block"),
    ).filter(F.col("block") != "")
    # bound the block fan-out BEFORE the self-join (skew guard)
    sizes = toks.groupBy("block").agg(F.count(F.lit(1)).alias("block_n"))
    toks = toks.join(
        F.broadcast(sizes.filter(F.col("block_n") <= max_block).select("block")),
        "block",
    )
    a = toks.select(
        "block", F.col("name_id").alias("a_id"), F.col("rec_name").alias("a_name")
    )
    b = toks.select(
        "block", F.col("name_id").alias("b_id"), F.col("rec_name").alias("b_name")
    )
    cand = (
        a.join(b, "block")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_name", "b_name")
        .distinct()  # names sharing >1 token meet once
    )
    out = cand.withColumn("distance", F.levenshtein("a_name", "b_name")).filter(
        F.col("distance") <= max_dist
    )
    return out.orderBy("a_id", "b_id") if ordered else out


def entity_assignments(
    records: DataFrame,
    key: str,
    name: str,
    max_dist: int = 2,
    max_block: int = MAX_BLOCK,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """(rec_name, name_id, entity_id) for every name that belongs to a
    multi-name entity (singleton names are their own entity and are
    omitted, mirroring ``dedup.minhash_dup_clusters``).

    ``pairs`` lets a caller that already materialized the
    :func:`fuzzy_name_pairs` output (the expensive blocking+verify
    phase) reuse it instead of re-running the self-join."""
    if pairs is None:
        pairs = fuzzy_name_pairs(records, key, name, max_dist, max_block, ordered=False)
    comp = connected_components(pairs, src="a_id", dst="b_id").select(
        F.col("doc_id").alias("name_id"), F.col("cluster_id").alias("entity_id")
    )
    return name_vocabulary(records, key, name).join(comp, "name_id")


def entity_resolution_report(
    records: DataFrame,
    key: str,
    name: str,
    max_dist: int = 2,
    max_block: int = MAX_BLOCK,
) -> DataFrame:
    """Per-entity roll-up: distinct name variants, record count across
    all variants, the canonical (min-id) name, and the worst matched
    pair distance inside the cluster.

    The record count is the only corpus-side touch — an exact-equality
    join of the record table against the broadcastable name→entity map.
    The blocking+Levenshtein phase (the expensive part) runs ONCE: the
    verified pair set is persisted and feeds both the connected
    components and the per-cluster max-distance roll-up.
    Returns (entity_id, n_names, n_records, canonical_name,
    max_distance) ordered by (n_records desc, entity_id)."""
    from dataengineeringpipeline_spark.cache import tracked_persist

    pairs = tracked_persist(
        fuzzy_name_pairs(records, key, name, max_dist, max_block, ordered=False)
    )
    assigned = entity_assignments(
        records, key, name, max_dist, max_block, pairs=pairs
    )
    rec_counts = (
        records.select(F.col(name).alias("rec_name"))
        .join(F.broadcast(assigned.select("rec_name", "entity_id")), "rec_name")
        .groupBy("entity_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_records"))
    )
    per_entity = assigned.groupBy("entity_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_names"),
        F.min(F.struct("name_id", "rec_name")).getField("rec_name").alias(
            "canonical_name"
        ),
    )
    pair_dist = (
        pairs
        .join(
            assigned.select(F.col("name_id").alias("a_id"), "entity_id"), "a_id"
        )
        .groupBy("entity_id")
        .agg(F.max("distance").cast("int").alias("max_distance"))
    )
    return (
        per_entity.join(rec_counts, "entity_id")
        .join(pair_dist, "entity_id")
        .select("entity_id", "n_names", "n_records", "canonical_name", "max_distance")
        .orderBy(F.desc("n_records"), "entity_id")
    )


def fuzzy_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    left_name: str,
    right_key: str,
    right_name: str,
    max_dist: int = 2,
    max_block: int = MAX_BLOCK,
    best_only: bool = True,
) -> DataFrame:
    """Two-table fuzzy equi-join on a name attribute — match an arriving
    batch of records against a canonical catalog when exact keys don't
    line up (the A-vs-B face of the self-linkage above; same blocking
    economics: both sides collapse to their name vocabularies, tokens
    block, Levenshtein verifies, and the original record tables only
    ever join their own vocabulary by exact equality).

    ``best_only=True`` keeps, for each left RECORD, exactly one row:
    the lowest-distance match, ties broken by the lowest actual
    ``right_key`` (enforced after the record join, so a catalog with
    duplicate rows under the matched name cannot fan a left record out
    to multiple rows, and the tiebreak key is the real right key — not
    a vocabulary surrogate). ``False`` returns every (left record ×
    right record) pair whose names are within ``max_dist``. Returns
    (left_key, right_key, left_name, right_name, distance) ordered by
    (left_key, right_key)."""
    lv = name_vocabulary(left, left_key, left_name).select(
        F.col("name_id").alias("l_id"), F.col("rec_name").alias("l_name")
    )
    rv = name_vocabulary(right, right_key, right_name).select(
        F.col("name_id").alias("r_id"), F.col("rec_name").alias("r_name")
    )

    def toks(v: DataFrame, name: str) -> DataFrame:
        t = v.select(
            "*", F.explode(F.array_distinct(F.split(name, " +"))).alias("block")
        ).filter(F.col("block") != "")
        sizes = t.groupBy("block").agg(F.count(F.lit(1)).alias("n"))
        return t.join(
            F.broadcast(sizes.filter(F.col("n") <= max_block).select("block")), "block"
        )

    cand = (
        toks(lv, "l_name")
        .join(toks(rv, "r_name"), "block")
        .select("l_id", "l_name", "r_id", "r_name")
        .distinct()
        .withColumn("distance", F.levenshtein("l_name", "r_name"))
        .filter(F.col("distance") <= max_dist)
    )
    if best_only:
        # vocabulary-level prune: only min-distance name pairs per left
        # name can win the record-level tiebreak, so drop the rest
        # before fanning out to records (keeps distance ties — the
        # record-level row_number below resolves them by real right_key)
        wv = Window.partitionBy("l_id")
        cand = cand.withColumn("_min_d", F.min("distance").over(wv)).filter(
            F.col("distance") == F.col("_min_d")
        ).drop("_min_d")
    out = (
        left.select(F.col(left_key).alias("left_key"), F.col(left_name).alias("l_name"))
        .join(F.broadcast(cand), "l_name")
        .join(
            right.select(
                F.col(right_key).alias("right_key"), F.col(right_name).alias("r_name")
            ),
            "r_name",
        )
        .select(
            "left_key",
            "right_key",
            F.col("l_name").alias("left_name"),
            F.col("r_name").alias("right_name"),
            F.col("distance").cast("int").alias("distance"),
        )
    )
    if best_only:
        wr = Window.partitionBy("left_key").orderBy(
            F.asc("distance"), F.asc("right_key")
        )
        out = out.withColumn("rn", F.row_number().over(wr)).filter(
            F.col("rn") == 1
        ).drop("rn")
    return out.orderBy("left_key", "right_key")
