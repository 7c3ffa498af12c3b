#!/usr/bin/env python
"""Dump .explain('formatted') for every headline query to
plans/r10/<query>_<tag>.txt (tag = before/after, argv[1])."""
import os
import sys

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
ONLY = sys.argv[2].split(",") if len(sys.argv) > 2 else None
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.dirname(os.path.abspath(__file__))

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.driver.memory", "16g")
    .config("spark.ui.enabled", "false")
    .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    .appName("age_spark-plancap")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, "/root/repo")
import bench
import __spark_entry__ as entry_mod

queries = entry_mod.queries()
entry_mod._graph(spark, SF_DIR)

for name in bench.HEADLINE:
    if ONLY and name not in ONLY:
        continue
    df = queries[name](spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    path = os.path.join(OUT, f"{name}_{TAG}.txt")
    with open(path, "w") as f:
        f.write(plan)
    print(f"wrote {path} ({len(plan)} chars)")
spark.stop()
