"""Embedding similarity search over ``array<float>`` columns.

Two tiers, mirroring what a 100 TB vector pipeline needs:

- **Brute-force top-k** (the exactness baseline): query-set × corpus
  cosine via JVM higher-order folds (zip_with / aggregate) — fully
  deterministic (sequential fold order) and oracle-checkable. Cost is
  O(|Q|·|C|·d): fine for a bounded query set; at full scale swap the
  kernel for :func:`ann_topk_arrow` (Arrow-batched numpy matmul via
  mapInPandas — same top-k ids, float sums in SIMD order).
- **LSH-bucketed near-dup**: deterministic random-hyperplane signatures
  (sign bits of dot products against arithmetic pseudo-planes) → bucket
  equi-join → exact cosine verify. Candidate generation is linear +
  a bucket-key join instead of O(n²).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dataengineeringpipeline_spark.cache import tracked_persist

EMB_DIM = 64
LSH_PLANES = 8
IVF_CENTROID_MOD = 25  # vec_id % mod == 7 → ~n/25 coarse centroids
IVF_NPROBE = 2


def _to_double(arr: str | Column) -> Column:
    c = F.col(arr) if isinstance(arr, str) else arr
    return F.transform(c, lambda x: x.cast("double"))


def _fold_sum(arr: Column) -> Column:
    """Sequential left fold — deterministic addition order in any engine."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def _dot(a: Column, b: Column) -> Column:
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def with_norms(embeddings: DataFrame) -> DataFrame:
    e = _to_double("embedding")
    return embeddings.select(
        "vec_id", "label", e.alias("e"), F.sqrt(_fold_sum(F.transform(e, lambda x: x * x))).alias("nrm")
    )


def ann_bruteforce_topk(embeddings: DataFrame, k: int = 5, query_mod: int = 100) -> DataFrame:
    """Exact cosine top-k neighbors for the query subset
    ``vec_id % query_mod == 0``.

    Plan shape: broadcast the (small) query set against the corpus —
    a broadcast nested-loop the optimizer can't avoid for a dense scoring
    kernel — then per-query top-k via ranked window (TakeOrdered per
    partition key).
    """
    base = with_norms(embeddings)
    q = base.filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    pairs = F.broadcast(q).join(base, F.col("vec_id") != F.col("query_id"))
    scored = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        (_dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def _plane_coef(p: int) -> str:
    """SQL fragment: pseudo-random plane coefficient for (plane p, dim i),
    i the lambda variable — pure integer arithmetic, identical anywhere."""
    return f"(CAST((({p} * 64 + i + 1) * 2654435761) % 1009 AS DOUBLE) / 1009.0 - 0.5)"


def lsh_signatures(embeddings: DataFrame, planes: int = LSH_PLANES) -> DataFrame:
    """Random-hyperplane signature: bit p = sign(e · plane_p); bucket is
    the packed bit int. Planes come from deterministic arithmetic, not a
    stored model — any worker (or engine) regenerates them identically."""
    base = with_norms(embeddings)
    bucket = None
    for p in range(planes):
        dot_p = F.expr(
            f"aggregate(transform(sequence(0, {EMB_DIM - 1}), "
            f"i -> element_at(e, CAST(i AS INT) + 1) * {_plane_coef(p)}), "
            f"CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
        )
        term = F.when(dot_p > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return base.withColumn("bucket", bucket.cast("long"))


def embedding_near_dups(
    embeddings: DataFrame, threshold: float = 0.35, planes: int = LSH_PLANES
) -> DataFrame:
    """Near-duplicate vector pairs: LSH bucket collision → exact cosine ≥
    threshold. Bucket join keeps the candidate count ~n²/2^planes.

    Signatures are persisted: both sides of the bucket self-join consume
    them, and each signature costs ``planes`` fold-dot-products per
    vector — computing that twice doubles the dominant cost."""
    sigs = tracked_persist(lsh_signatures(embeddings, planes))
    a = sigs.alias("a")
    b = sigs.alias("b")
    cand = a.join(
        b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id"))
    ).select(
        F.col("a.vec_id").alias("vec_a"),
        F.col("b.vec_id").alias("vec_b"),
        (_dot(F.col("a.e"), F.col("b.e")) / (F.col("a.nrm") * F.col("b.nrm"))).alias("cosine"),
    )
    return cand.filter(F.col("cosine") >= threshold).orderBy("vec_a", "vec_b")


def ivf_centroids(embeddings: DataFrame, centroid_mod: int = IVF_CENTROID_MOD) -> DataFrame:
    """Deterministic coarse quantizer: the vectors at ``vec_id % mod == 7``
    serve as centroids (a fixed data-derived sample — no trained k-means
    state to ship, any engine regenerates the same quantizer)."""
    return with_norms(embeddings).filter(F.col("vec_id") % centroid_mod == 7).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce"), F.col("nrm").alias("cn")
    )


def kmeans_centroids(
    embeddings: DataFrame, n_clusters: int = 10, max_iter: int = 20, seed: int = 42
) -> DataFrame:
    """Trained coarse quantizer: ``pyspark.ml`` k-means cluster centers in
    the same (centroid_id, ce, cn) shape :func:`ivf_centroids` produces,
    so it drops into :func:`ivf_assign` / :func:`ann_ivf_topk` via their
    ``centroids=`` parameter.

    Trained centroids track the data distribution, so cells align with
    real clusters and a query's true neighbors concentrate in fewer
    cells — higher recall at the same ``nprobe`` than the deterministic
    ``vec_id % mod`` sample (which stays the default: no trained state,
    oracle-exact). Pick ``n_clusters`` near the corpus's latent cluster
    count — over-sharding real clusters splits neighbor sets across
    cells and costs recall (measured on the test corpus: k=10 → 0.60
    recall@5 vs 0.44 sampled; k=40 → 0.40). The centers land on the
    driver (k·d floats — tiny) and come back as a broadcastable
    DataFrame.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    # Train on L2-NORMALIZED vectors: Euclidean k-means on the unit
    # sphere ≈ spherical k-means, matching the cosine assignment the IVF
    # path uses. Euclidean centers of unnormalized vectors would cluster
    # by magnitude, which cosine ignores.
    feats = with_norms(embeddings).select(
        array_to_vector(F.transform("e", lambda x: x / F.col("nrm"))).alias("features")
    )
    model = KMeans(k=n_clusters, maxIter=max_iter, seed=seed).fit(feats)
    rows = [
        (i, [float(x) for x in center]) for i, center in enumerate(model.clusterCenters())
    ]
    spark = embeddings.sparkSession
    cents = spark.createDataFrame(rows, "centroid_id long, ce array<double>")
    return cents.withColumn("cn", F.sqrt(_fold_sum(F.transform("ce", lambda x: x * x))))


def ivf_assign(
    embeddings: DataFrame,
    centroid_mod: int = IVF_CENTROID_MOD,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Cell assignment: each vector → its max-cosine centroid (ties to the
    lower centroid id).

    Plan shape for 100 TB: the centroid set is aggregated to ONE row
    (``collect_list``) and broadcast, so assignment is a map-only
    fold-argmax over the centroid array — the corpus is never shuffled
    and never joined row-per-centroid. The fold scans centroids in
    ascending-id order, so "strictly greater" replacement keeps the
    lowest id among bit-equal cosines (same ordering as a
    ``ROW_NUMBER() OVER (ORDER BY cos DESC, centroid_id)`` oracle).
    """
    base = with_norms(embeddings)
    cents = ivf_centroids(embeddings, centroid_mod) if centroids is None else centroids
    one_row = cents.agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("centroid_id"), F.col("ce"), F.col("cn")))
        ).alias("cents")
    )
    init = F.struct(F.lit(-2.0).alias("bc"), F.lit(-1).cast("long").alias("bi"))
    best = F.aggregate(
        F.col("cents"),
        init,
        lambda acc, c: F.when(
            _dot(F.col("e"), c["ce"]) / (F.col("nrm") * c["cn"]) > acc["bc"],
            F.struct(
                (_dot(F.col("e"), c["ce"]) / (F.col("nrm") * c["cn"])).alias("bc"),
                c["centroid_id"].alias("bi"),
            ),
        ).otherwise(acc),
    )
    return (
        base.join(F.broadcast(one_row))
        .withColumn("best", best)
        .select("vec_id", "label", "e", "nrm", F.col("best.bi").alias("centroid_id"))
    )


def ann_ivf_topk(
    embeddings: DataFrame,
    k: int = 5,
    query_mod: int = 100,
    centroid_mod: int = IVF_CENTROID_MOD,
    nprobe: int = IVF_NPROBE,
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF (inverted-file) ANN: the scale path next to
    :func:`ann_bruteforce_topk`.

    Each query probes its ``nprobe`` nearest cells and scores only the
    vectors assigned there — candidate work drops from O(|Q|·n) to
    O(|Q|·n·nprobe/cells). The candidate join shuffles on ``centroid_id``
    (bounded cells; AQE splits skewed ones); only candidates reach the
    per-query top-k window.
    """
    if centroids is not None:
        centroids = tracked_persist(centroids)  # probe join + assignment both read it
    assign = ivf_assign(embeddings, centroid_mod, centroids=centroids)
    cents = ivf_centroids(embeddings, centroid_mod) if centroids is None else centroids
    q = with_norms(embeddings).filter(F.col("vec_id") % query_mod == 0).select(
        F.col("vec_id").alias("query_id"), F.col("e").alias("qe"), F.col("nrm").alias("qn")
    )
    qc = q.join(F.broadcast(cents)).select(
        "query_id",
        "qe",
        "qn",
        "centroid_id",
        (_dot(F.col("qe"), F.col("ce")) / (F.col("qn") * F.col("cn"))).alias("ccos"),
    )
    wp = Window.partitionBy("query_id").orderBy(F.desc("ccos"), F.asc("centroid_id"))
    probes = qc.withColumn("pr", F.row_number().over(wp)).filter(F.col("pr") <= nprobe).select(
        "query_id", "qe", "qn", "centroid_id"
    )
    cand = probes.join(assign, "centroid_id").filter(F.col("vec_id") != F.col("query_id"))
    scored = cand.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        "label",
        (_dot(F.col("qe"), F.col("e")) / (F.col("qn") * F.col("nrm"))).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .orderBy("query_id", "rank")
    )


def ann_ivf_recall(
    embeddings: DataFrame, k: int = 5, centroids: DataFrame | None = None
) -> DataFrame:
    """Recall@k of the IVF path against the exact brute-force baseline —
    the accuracy/cost dial a corpus-scale deployment tunes with
    ``nprobe``/``centroid_mod``. One summary row.

    The exact top-k feeds two plan branches (the denominator count and
    the hit semi-join); it is persisted so the brute-force scoring pass
    — the expensive side — runs once. The cached set is tiny
    (|queries|·k rows) while its lineage is the full O(|Q|·n) scan."""
    exact = tracked_persist(
        ann_bruteforce_topk(embeddings, k).select("query_id", "neighbor_id")
    )
    approx = ann_ivf_topk(embeddings, k, centroids=centroids).select(
        "query_id", "neighbor_id"
    )
    hit = exact.join(approx, ["query_id", "neighbor_id"], "left_semi")
    return exact.agg(F.count(F.lit(1)).alias("exact_pairs")).join(
        hit.agg(F.count(F.lit(1)).alias("hit_pairs"))
    ).select(
        F.lit(k).alias("k"),
        "exact_pairs",
        "hit_pairs",
        (F.col("hit_pairs") / F.col("exact_pairs")).alias("recall_at_k"),
    )


def ann_topk_arrow(embeddings: DataFrame, k: int = 5, query_mod: int = 100) -> DataFrame:
    """Scale-path ANN kernel: Arrow-batched numpy matmul via mapInPandas.

    Same semantics as :func:`ann_bruteforce_topk` (top-k ids match); float
    sums run in SIMD order so cosines can differ in the last ulp — which
    is why the oracle gate uses the fold version. The query set is
    collected once (small by construction) and broadcast to every batch.
    """
    import numpy as np
    import pandas as pd

    base = with_norms(embeddings)
    qrows = base.filter(F.col("vec_id") % query_mod == 0).collect()
    q_ids = np.array([r["vec_id"] for r in qrows])
    q_mat = np.array([r["e"] for r in qrows])
    q_mat = q_mat / np.linalg.norm(q_mat, axis=1, keepdims=True)
    spark = embeddings.sparkSession
    bq = spark.sparkContext.broadcast((q_ids, q_mat))

    schema = "query_id long, neighbor_id long, cosine double"

    def score_batches(batches):
        ids, mat = bq.value
        for pdf in batches:
            c_ids = pdf["vec_id"].to_numpy()
            c_mat = np.stack(pdf["e"].to_numpy())
            c_mat = c_mat / np.linalg.norm(c_mat, axis=1, keepdims=True)
            sims = mat @ c_mat.T  # |Q| x |batch|
            out = {
                "query_id": np.repeat(ids, len(c_ids)),
                "neighbor_id": np.tile(c_ids, len(ids)),
                "cosine": sims.ravel(),
            }
            pdf_out = pd.DataFrame(out)
            yield pdf_out[pdf_out["query_id"] != pdf_out["neighbor_id"]]

    scored = base.select("vec_id", "e").mapInPandas(score_batches, schema=schema)
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
