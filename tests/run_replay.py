"""Triage helper: replay one or more extracted conformance suites and
print failures.  Usage: python tests/run_replay.py cypher_set cypher_with
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

from conformance_replay import replay


def main(names):
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName("replay-triage")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    data = os.path.join(os.path.dirname(__file__), "data")
    for name in names:
        t0 = time.time()
        fails = replay(spark, os.path.join(data, f"{name}_cases.json"), f"rt_{name[:6]}")
        dt = time.time() - t0
        print(f"== {name}: {len(fails)} failures ({dt:.1f}s)")
        for f in fails:
            print("  " + f)


if __name__ == "__main__":
    main(sys.argv[1:])
