#!/usr/bin/env python3
"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the ``noop`` sink (full execution,
no collect-to-driver cost, no disk write skew). A JVM warm-up job runs
first so the measurement isn't dominated by classloading.

Per-query time is the MEDIAN of $SPARK_GRAFT_REPS runs (default 3):
single-shot timings on this box vary 30-50% run-to-run (JIT, page
cache, GC pauses), which made round-over-round comparisons chase noise
— e.g. round 1 recorded supplier_performance at 7.7s where its steady
state is ~1.2s. "value" stays the wall-clock of the whole sweep (all
reps); "queries" holds the medians.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time


def _sf_from_dir(sf_dir: str) -> float:
    tail = os.path.basename(sf_dir.rstrip("/"))
    if tail.startswith("sf"):
        try:
            return float(tail[2:])
        except ValueError:
            pass
    return -1.0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from dataengineeringpipeline_spark.cache import release_caches
    from dataengineeringpipeline_spark.session import get_spark

    spark = get_spark(app_name="dep-spark-bench", cpus=cpus, shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # JVM / codegen warm-up (not measured)
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    reps = max(1, int(os.environ.get("SPARK_GRAFT_REPS", "3")))
    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, fn in sorted(queries.items()):
        samples = []
        for _ in range(reps):
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples.append(time.perf_counter() - t0)
            # Operators persist shared subtrees scoped to their own run;
            # dropping them between reps/queries keeps each timing
            # independent and executor memory flat across the sweep.
            # release_caches() unpersists the tracked operator persists;
            # clearCache sweeps anything else.
            release_caches()
            spark.catalog.clearCache()
        timings[name] = round(statistics.median(samples), 3)
    total = round(time.perf_counter() - t_all, 3)

    print(
        json.dumps(
            {
                "metric": "all_queries_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(sf_dir),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
