#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# Repetitions per query; the reported number is the MIN across reps so a
# noisy neighbor in a shared sandbox can't turn a win into a regression
# (BENCH_r02 recorded a 3.1x simhash "regression" on unchanged code that a
# same-commit local run contradicted).
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))

HEADLINE = [
    # engine: pattern joins, aggregation, optional, VLE, BFS, stats
    "g_join2_agg",
    "g_join3_edgeprops",
    "g_optional_match",
    "g_agg_stats",
    "g_vle_2hop",
    "g_not_exists",
    "g_shortest_path",
    "g_vertex_stats",
    # pipeline: dedup / similarity / text / events
    "p_exact_dedup",
    "p_text_features",
    "p_minhash_pairs",
    "p_simhash_pairs",
    "p_ann_topk",
    "p_ann_ivf",
    "e_type_agg",
    "e_sessionize",
    "e_tumbling",
]


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .appName("age_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # Build the demo graph once, outside the timed region: catalog
    # construction is a one-time cost, not per-query work (the first
    # timed query also absorbs JVM/codegen warm-up otherwise).
    t0 = time.time()
    entry_mod._graph(spark, SF_DIR)
    build_sec = round(time.time() - t0, 3)
    print(f"# graph-build (untimed): {build_sec}s", file=sys.stderr)

    import gc

    timings: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        best = None
        n = 0
        for rep in range(REPS):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
            print(f"# {name} rep{rep}: {dt}s ({n} rows)", file=sys.stderr)
            # drop DataFrame refs so the ContextCleaner can unpersist BFS
            # localCheckpoint blocks before the next rep is timed
            del df
            gc.collect()
        timings[name] = best
        total += best
        print(f"# {name}: min {best}s over {REPS} reps", file=sys.stderr)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "headline-suite wall time (graph + pipeline ops)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": timings,
                "reps": REPS,
                "build_sec": build_sec,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
