"""Link-graph analytics: transition-edge derivation and PageRank.

LLM data pipelines weight web documents by link-graph importance
(PageRank over the crawl graph is the classic quality prior — Page et
al. 1999; CommonCrawl's host-level ranks are the modern instance). The
reference has no graph operator; this module supplies the Spark-first
one: derive a weighted directed graph from an event stream (one window
+ one aggregation — the only data-sized work), then run power iteration
as a fixed-depth chain of DataFrame joins over the EDGE table.

Scale shape: the graph is aggregate-sized (|V| nodes, |E| weighted
edges), not event-sized — transition counting collapses the fact table
map-side before any iteration starts. Each PageRank iteration is one
join of the rank vector (|V| rows) with the edge list plus one
aggregation; at web scale both sides are huge but partition cleanly on
node id, and the iteration count is a constant (default 5), so total
cost is O(iters · |E|) regardless of corpus size.

Determinism: a double SUM over shuffled rows is order-dependent, so
rank mass entering a node is folded in a CANONICAL two-level order:
sources salt into ``pmod(src, FOLD_BUCKETS)`` buckets, each bucket's
contributions fold in ascending source order from a 0.0 seed, and the
bucket sub-sums fold in ascending bucket order — the same IEEE addition
sequence any engine reproduces (Spark
``aggregate(transform(array_sort(collect_list(...))))`` twice, DuckDB
``list_reduce(list(... ORDER BY ...))`` nested), making PageRank —
usually considered "approximately reproducible" — bit-exact
oracle-checkable. The two levels also bound per-task state: a web-scale
hub with 10⁸ in-edges materializes ``FOLD_BUCKETS`` arrays of
~in_degree/FOLD_BUCKETS contributions plus one array of FOLD_BUCKETS
sub-sums, never one array of the whole in-neighborhood.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..cache import tracked_persist


def transition_edges(
    events: DataFrame,
    session_col: str,
    item_col: str,
    order_cols: tuple[str, ...],
) -> DataFrame:
    """Weighted directed edges ``(src, dst, cnt)`` from consecutive
    items within each session/user stream. The per-session ``lead``
    window is the single data-sized shuffle; the count aggregation
    collapses to |E| rows with map-side combine."""
    w = Window.partitionBy(session_col).orderBy(
        *[F.col(c) for c in order_cols]
    )
    return (
        events.select(
            F.col(item_col).alias("src"),
            F.lead(item_col).over(w).alias("dst"),
        )
        .filter(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


#: Source-salt bucket count for the canonical two-level fold. Bounds
#: per-node (and per-task) fold state to O(FOLD_BUCKETS + max bucket
#: size) instead of O(in-degree) — the hub-node guard.
FOLD_BUCKETS = 1024


def _sorted_fold(pairs_col) -> F.Column:
    """Deterministic double sum: fold ``contrib`` fields in ascending
    order of the struct's FIRST field from a 0.0 seed — identical IEEE
    sequence in any engine. Used at both fold levels: structs are
    ``(src, contrib)`` inside a bucket and ``(bucket, sub-sum)``
    across buckets."""
    return F.aggregate(
        F.transform(F.array_sort(pairs_col), lambda s: s["contrib"]),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _bucketed_fold_py(pairs: list, key_of, val_of, n_buckets: int) -> float:
    """The driver-side twin of the distributed two-level fold: ``pairs``
    must already be sorted ascending by key; sub-sums fold per
    ``key % n_buckets`` bucket, then across buckets in bucket order —
    the exact IEEE sequence of two nested :func:`_sorted_fold` passes."""
    buckets: dict = {}
    for p in pairs:
        buckets.setdefault(key_of(p) % n_buckets, []).append(p)
    total = 0.0
    for b in sorted(buckets):
        sub = 0.0
        for p in buckets[b]:
            sub = sub + val_of(p)
        total = total + sub
    return total


def _pagerank_driver(
    edges: DataFrame, iterations: int, damping: float, fold_buckets: int
) -> DataFrame:
    """Driver-side power iteration over a bounded (≤ ``driver_max_edges``)
    collected edge list. Bit-for-bit the distributed arithmetic: python
    floats ARE IEEE doubles, and every sum runs the canonical two-level
    bucketed fold (per-bucket ascending source order, then ascending
    bucket order, 0.0 seeds) — the exact sequence the distributed folds
    (and the SQL oracle) execute."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    spark = edges.sparkSession
    rows = edges.collect()
    out_cnt: dict = {}
    incoming: dict = {}
    node_set = set()
    for r in rows:
        src, dst, cnt = r["src"], r["dst"], r["cnt"]
        node_set.add(src)
        node_set.add(dst)
        out_cnt[src] = out_cnt.get(src, 0) + cnt
        incoming.setdefault(dst, []).append((src, cnt))
    nodes = sorted(node_set)
    schema = StructType(
        [
            StructField("node", edges.schema["src"].dataType),
            StructField("rank", DoubleType()),
        ]
    )
    if not nodes:
        return spark.createDataFrame([], schema)
    for lst in incoming.values():
        lst.sort()
    dangling = sorted(v for v in node_set if v not in out_cnt)
    n = len(nodes)
    ranks = {v: 1.0 / n for v in nodes}
    for _ in range(iterations):
        dmass = _bucketed_fold_py(
            dangling, lambda v: v, lambda v: ranks[v], fold_buckets
        )
        new = {}
        for v in nodes:
            inflow = _bucketed_fold_py(
                incoming.get(v, ()),
                lambda p: p[0],
                lambda p: ranks[p[0]] * (p[1] / out_cnt[p[0]]),
                fold_buckets,
            )
            new[v] = (1.0 - damping) / n + damping * (inflow + dmass / n)
        ranks = new
    return spark.createDataFrame([(v, ranks[v]) for v in nodes], schema)


def pagerank(
    edges: DataFrame,
    iterations: int = 5,
    damping: float = 0.85,
    driver_max_edges: int = 2_000_000,
    fold_buckets: int = FOLD_BUCKETS,
) -> DataFrame:
    """PageRank over a weighted edge list by fixed-count power
    iteration: ``(node, rank)``, ranks summing to 1.

    Per iteration: rank mass flows along edges proportionally to edge
    weight (``r_src · cnt / out_cnt``), dangling nodes' mass teleports
    uniformly, and ``1-d`` teleports from everywhere — the standard
    stochastic-matrix completion, so total mass is conserved and the
    oracle can unroll the same arithmetic.

    Hybrid execution, the dedup connected-components pattern: the edge
    list is an AGGREGATE of the fact table (item/host transition counts,
    never raw events), so it is usually orders of magnitude smaller than
    the data. When it fits the ``driver_max_edges`` budget, iteration
    runs on the driver — a 100-node transition matrix has no business
    paying 6 shuffle stages per iteration (measured: 12.6s distributed
    vs <0.1s driver for the contract instance). Above the budget —
    the billion-node web-graph case — iteration stays distributed:
    edge/node/dangling frames ``tracked_persist``-ed once, each
    iteration's rank vector persisted and eagerly materialized so
    lineage depth stays constant (at true web scale swap the persist
    for a checkpoint to also truncate fault-recovery lineage).

    BOTH paths execute the identical IEEE operation sequence — every
    floating sum runs the canonical two-level bucketed fold (sources
    salt into ``pmod(src, fold_buckets)`` buckets; per-bucket fold in
    ascending source order, then across buckets in bucket order, each
    from a 0.0 seed) — so they are bit-identical to each other and to
    the SQL oracle (``tests/test_graph.py`` forces the distributed path
    and asserts bitwise equality with the driver path, including with
    ``fold_buckets`` small enough that buckets genuinely multi-fill).
    The bucketing is also the hub-node state bound: a node's fold state
    is O(fold_buckets + in_degree/fold_buckets) per task, never one
    array of the whole in-neighborhood.
    """
    edges = tracked_persist(edges)
    n_edges = edges.count()
    if n_edges <= driver_max_edges:
        return _pagerank_driver(edges, iterations, damping, fold_buckets)
    out = edges.groupBy("src").agg(F.sum("cnt").alias("out_cnt"))
    ew = tracked_persist(edges.join(out, "src"))
    nodes = tracked_persist(
        edges.select(F.col("src").alias("node"))
        .unionByName(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    dangling = tracked_persist(
        nodes.join(out.select(F.col("src").alias("node")), "node", "left_anti")
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        return nodes.select("node", F.lit(0.0).alias("rank"))
    n_lit = F.lit(n_nodes)

    ranks = tracked_persist(
        nodes.select("node", (F.lit(1.0) / n_lit).alias("rank"))
    )
    ranks.count()
    b_lit = F.lit(fold_buckets)
    for _ in range(iterations):
        # dangling mass this iteration — a 1-row scalar, two-level
        # fold: per node-salt bucket in node order, then bucket order
        dmass = (
            ranks.join(dangling, "node")
            .groupBy(F.pmod(F.col("node"), b_lit).alias("bucket"))
            .agg(
                _sorted_fold(
                    F.collect_list(
                        F.struct(
                            F.col("node").alias("src"),
                            F.col("rank").alias("contrib"),
                        )
                    )
                ).alias("sub")
            )
            .agg(
                F.coalesce(
                    _sorted_fold(
                        F.collect_list(
                            F.struct(
                                F.col("bucket"),
                                F.col("sub").alias("contrib"),
                            )
                        )
                    ),
                    F.lit(0.0),
                ).alias("dmass")
            )
            .collect()[0]["dmass"]
        )
        inflow = (
            ew.join(ranks.withColumnRenamed("node", "src"), "src")
            .select(
                F.col("dst").alias("node"),
                F.pmod(F.col("src"), b_lit).alias("bucket"),
                F.struct(
                    "src",
                    (
                        F.col("rank")
                        * (
                            F.col("cnt").cast("double")
                            / F.col("out_cnt").cast("double")
                        )
                    ).alias("contrib"),
                ).alias("pair"),
            )
            # level 1: per (node, source-bucket) sub-sums — bounded
            # arrays even for web-hub in-degrees
            .groupBy("node", "bucket")
            .agg(_sorted_fold(F.collect_list("pair")).alias("sub"))
            # level 2: fold the ≤ fold_buckets sub-sums in bucket order
            .groupBy("node")
            .agg(
                _sorted_fold(
                    F.collect_list(
                        F.struct(F.col("bucket"), F.col("sub").alias("contrib"))
                    )
                ).alias("inflow")
            )
        )
        ranks = tracked_persist(
            nodes.join(inflow, "node", "left").select(
                "node",
                (
                    (F.lit(1.0) - F.lit(damping)) / n_lit
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("inflow"), F.lit(0.0))
                        + F.lit(dmass) / n_lit
                    )
                ).alias("rank"),
            )
        )
        ranks.count()
    return ranks


def item_pagerank(events: DataFrame, iterations: int = 5) -> DataFrame:
    """Driver-contract query: PageRank over the item-transition graph of
    the events stream — items are ``props.k``, edges are consecutive
    items within a user's event sequence ordered by ``(ts_us,
    event_id)``. Returns every item's rank with its degree profile,
    ranked. Rank per-mille uses integer div so engines cannot disagree
    on rounding."""
    # three consumers (the pagerank edge collect/iteration plus the two
    # degree aggregations) read the edge aggregate — persist so the
    # fact-table lead window runs once, not three times (the
    # next_item_rules pattern; the cache is |E| aggregate rows)
    edges = tracked_persist(
        transition_edges(
            _item_stream(events), "user_id", "item", ("ts_us", "event_id")
        )
    )
    ranks = pagerank(edges, iterations=iterations)
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("out_edges"), F.sum("cnt").alias("out_weight")
    )
    in_deg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("in_edges")
    )
    return (
        ranks.join(out_deg, "node", "left")
        .join(in_deg, "node", "left")
        .select(
            F.col("node").alias("item"),
            # explicit floor: a bare long cast TRUNCATES in Spark but
            # ROUNDS in DuckDB — the documented parity trap
            F.floor(F.col("rank") * 1_000_000).alias("rank_ppm"),
            F.coalesce("out_edges", F.lit(0)).alias("out_edges"),
            F.coalesce("out_weight", F.lit(0)).alias("out_weight"),
            F.coalesce("in_edges", F.lit(0)).alias("in_edges"),
        )
        .orderBy(F.col("rank_ppm").desc(), "item")
    )


def _item_stream(events: DataFrame) -> DataFrame:
    """The (user, time, item) projection shared by the graph queries."""
    return events.select(
        "user_id",
        "ts_us",
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("item"),
    ).filter(F.col("item").isNotNull())


def next_item_rules(events: DataFrame, top_n: int = 3) -> DataFrame:
    """Association-rule mining over the item-transition graph: for each
    source item, the ``top_n`` next items by transition count, with
    support/confidence/lift — the classic next-item recommender /
    market-basket readout. ``(src_item, next_item, cnt, out_cnt,
    in_cnt, confidence, lift, rank)``.

    Everything rides the edge aggregate: out-counts, in-counts, and the
    1-row grand total are map-side-combined aggregations of edge rows,
    and the per-source ranking window orders by INTEGER (cnt desc, dst)
    — identical ordering to confidence (same denominator per source)
    without comparing floats. Confidence and lift are each a fixed
    two/three-operation IEEE tree on exact integer counts, so any
    engine reproduces them bitwise.
    """
    from pyspark.sql.window import Window

    # four consumers (out/in/total/ranked) read the edge aggregate —
    # persist so the fact-table window runs once, not four times
    edges = tracked_persist(
        transition_edges(
            _item_stream(events), "user_id", "item", ("ts_us", "event_id")
        )
    )
    out = edges.groupBy("src").agg(F.sum("cnt").alias("out_cnt"))
    inn = edges.groupBy("dst").agg(F.sum("cnt").alias("in_cnt"))
    total = edges.agg(F.sum("cnt").alias("total_cnt"))
    w = Window.partitionBy("src").orderBy(F.col("cnt").desc(), F.col("dst"))
    ranked = (
        edges.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_n)
        .join(out, "src")
        .join(inn, "dst")
        .crossJoin(F.broadcast(total))
    )
    conf = F.col("cnt").cast("double") / F.col("out_cnt").cast("double")
    p_dst = F.col("in_cnt").cast("double") / F.col("total_cnt").cast("double")
    return ranked.select(
        F.col("src").alias("src_item"),
        F.col("dst").alias("next_item"),
        "cnt",
        "out_cnt",
        "in_cnt",
        conf.alias("confidence"),
        (conf / p_dst).alias("lift"),
        "rank",
    ).orderBy("src_item", "rank")
