"""Link-graph analytics (operators/graph.py)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from dataengineeringpipeline_spark.operators import graph


def _edges(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, cnt long")


def test_pagerank_mass_conserved_and_uniform_on_cycle(spark):
    """On a directed cycle every node is symmetric, so ranks are exactly
    uniform each iteration; total mass is 1."""
    e = _edges(spark, [(1, 2, 1), (2, 3, 1), (3, 1, 1)])
    got = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=5).collect()}
    assert set(got) == {1, 2, 3}
    for v in got.values():
        assert math.isclose(v, 1 / 3, rel_tol=1e-12)
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-12)


def test_pagerank_sink_absorbs_rank(spark):
    """star → hub: the pointed-to node outranks its pointers, and the
    dangling hub's mass teleports back so total mass stays 1."""
    e = _edges(spark, [(1, 9, 1), (2, 9, 1), (3, 9, 1)])
    got = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=8).collect()}
    assert got[9] > got[1] == got[2] == got[3]
    assert math.isclose(sum(got.values()), 1.0, rel_tol=1e-12)


def test_pagerank_weighted_edges_split_proportionally(spark):
    """One source splitting 3:1 between two sinks ranks the heavy sink
    higher; after one iteration from uniform the inflow ratio is 3:1."""
    e = _edges(spark, [(1, 2, 3), (1, 3, 1)])
    got = {r["node"]: r["rank"] for r in graph.pagerank(e, iterations=1).collect()}
    # both sinks share identical teleport + dangling terms, so their
    # rank gap is exactly the edge-inflow gap: 0.85 · (1/3) · (3/4 − 1/4)
    assert got[2] > got[3]
    assert math.isclose(
        got[2] - got[3], 0.85 * (1 / 3) * (3 / 4 - 1 / 4), rel_tol=1e-9
    )


def test_pagerank_driver_and_distributed_paths_bit_identical(spark):
    """Forcing the distributed path (driver_max_edges=0) must reproduce
    the driver path bit-for-bit — both run the canonical two-level
    bucketed fold from 0.0 seeds."""
    rows = [(i % 23, (i * 5 + 1) % 23, 1 + i % 4) for i in range(300)]
    rows = [(a, b, c) for a, b, c in rows if a != b]
    e = _edges(spark, rows)
    drv = sorted(map(tuple, graph.pagerank(e, iterations=4).collect()))
    dist = sorted(
        map(
            tuple,
            graph.pagerank(e, iterations=4, driver_max_edges=0).collect(),
        )
    )
    assert drv == dist  # bitwise, not isclose


def test_pagerank_bucketed_fold_bit_identical_when_buckets_fill(spark):
    """fold_buckets=4 on a 23-node graph makes every bucket hold several
    sources (and several dangling nodes), so the two-level sequence is
    genuinely exercised — driver and distributed paths must still agree
    bitwise, and mass must still be conserved."""
    import math

    rows = [(i % 23, (i * 5 + 1) % 23, 1 + i % 4) for i in range(300)]
    rows = [(a, b, c) for a, b, c in rows if a != b]
    # add dangling nodes (pointed to, never pointing) across buckets
    rows += [(i, 100 + i, 1) for i in range(8)]
    e = _edges(spark, rows)
    drv = sorted(
        map(tuple, graph.pagerank(e, iterations=4, fold_buckets=4).collect())
    )
    dist = sorted(
        map(
            tuple,
            graph.pagerank(
                e, iterations=4, driver_max_edges=0, fold_buckets=4
            ).collect(),
        )
    )
    assert drv == dist  # bitwise, not isclose
    assert math.isclose(sum(r for _, r in drv), 1.0, rel_tol=1e-12)


def test_pagerank_deterministic_across_partitionings(spark):
    """Sorted-order folds make the double sums partition-invariant: the
    rank bits cannot move when the edge list arrives differently
    partitioned."""
    rows = [(i % 17, (i * 7) % 17, 1 + i % 3) for i in range(200)]
    rows = [(a, b, c) for a, b, c in rows if a != b]
    a = graph.pagerank(_edges(spark, rows).repartition(1), iterations=4)
    b = graph.pagerank(_edges(spark, rows).repartition(13, "dst"), iterations=4)
    ra = sorted(map(tuple, a.collect()))
    rb = sorted(map(tuple, b.collect()))
    assert ra == rb  # bit-exact, not approx


def test_transition_edges_orders_within_session(spark):
    ev = spark.createDataFrame(
        [
            (1, 10, 100, 7),
            (1, 20, 101, 8),
            (1, 30, 102, 7),
            (2, 10, 103, 8),
            (2, 40, 104, 7),
        ],
        "user_id long, ts_us long, event_id long, item long",
    )
    got = {
        (r["src"], r["dst"]): r["cnt"]
        for r in graph.transition_edges(
            ev, "user_id", "item", ("ts_us", "event_id")
        ).collect()
    }
    assert got == {(7, 8): 1, (8, 7): 2}
