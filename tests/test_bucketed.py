"""Bucketed table storage: co-located joins must not shuffle the bucketed
side (the scale path for pattern joins at 100 TB)."""

from pyspark.sql import functions as F

from age_spark import AgeSession
from age_spark.graph import Graph


def _clean(spark, prefix):
    import shutil

    # SHOW TABLES columns are (namespace, tableName, isTemporary) — any
    # temp view left by an earlier test made the old `r.name` access blow
    # up, so this cleanup only worked when the catalog happened to be empty
    for t in [r.tableName for r in spark.sql("SHOW TABLES").collect()]:
        if t.startswith(prefix):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    import glob
    import os

    for d in glob.glob(os.path.join(wh, f"{prefix}_*")):
        shutil.rmtree(d, ignore_errors=True)


def test_bucketed_round_trip_and_colocated_join(spark):
    _clean(spark, "bktg")
    age = AgeSession(spark)
    g = age.create_graph("bkt")
    v = spark.range(0, 1000).select(F.col("id").alias("vid"), (F.col("id") % 7).alias("grp"))
    g.add_vertices("N", v, id_col="vid")
    e = spark.range(0, 999).select(
        F.col("id").alias("s"), (F.col("id") + 1).alias("t"), F.col("id").alias("eid")
    )
    g.add_edges("E", e, start_col="s", end_col="t", start_label="N", end_label="N", id_col="eid")

    g.save_as_tables("bktg", buckets=4)
    g2 = Graph.load_from_tables(spark, "bktg")

    # correctness round trip through Cypher
    n = age.cypher(g2, "MATCH (a:N)-[r:E]->(b:N) RETURN count(*) AS c").df.collect()[0].c
    assert n == 999

    # co-location: joining the bucketed edge table to itself on the bucket
    # key plans without a shuffle on either side (disable broadcast so the
    # sort-merge path is visible)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        et = spark.table("bktg_e_E")
        joined = et.alias("a").join(et.alias("b"), F.col("a.start_id") == F.col("b.start_id"))
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
