#!/usr/bin/env python3
"""Benchmark harness: runs every declared query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with the ``noop`` sink (full execution,
no collect-to-driver cost, no disk write skew). A JVM warm-up job runs
first so the measurement isn't dominated by classloading.
"""

from __future__ import annotations

import json
import os
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

    timings: dict[str, float] = {}
    t_all = time.perf_counter()
    for name, fn in sorted(queries.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # Operators persist shared subtrees scoped to their own run;
        # dropping them between queries keeps each timing independent
        # and executor memory flat across the sweep. release_caches()
        # unpersists the tracked operator persists; clearCache sweeps
        # anything else (e.g. test fixtures' .cache()).
        release_caches()
        spark.catalog.clearCache()
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
