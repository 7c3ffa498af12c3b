"""CALL-able procedures (SURVEY §2.3/§2.9).

The reference exposes whole-graph statistics and path search as SQL SRFs
(``graph_stats``/``vertex_stats`` — ``age_global_graph.c:1659/1502``;
``shortest_path``/``all_shortest_paths`` — ``age_vle.c:3877/3892``). Here
they are plain aggregates/joins over the unified scans — no global in-memory
graph cache is needed because Spark shuffles instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..compiler.clauses import procedure
from ..compiler.context import QueryContext


@procedure("graph_stats")
def graph_stats(ctx: QueryContext, arg_asts, arg_cols) -> DataFrame:
    g = ctx.graph
    v = g.scan_vertices(None)
    e = g.scan_edges(None)
    vcnt = v.agg(F.count(F.lit(1)).alias("num_vertices"))
    ecnt = e.agg(
        F.count(F.lit(1)).alias("num_edges"),
        F.sum(F.when(F.col("start_id") == F.col("end_id"), 1).otherwise(0)).alias("num_self_loops"),
    )
    vlab = v.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    elab = e.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    return (
        vcnt.crossJoin(ecnt)
        .withColumn("num_vertex_labels", F.lit(vlab.count()))
        .withColumn("num_edge_labels", F.lit(elab.count()))
    )


@procedure("vertex_stats")
def vertex_stats(ctx: QueryContext, arg_asts, arg_cols) -> DataFrame:
    """Per-vertex degrees: in/out degree + self loops
    (``age_vertex_stats``, ``age_global_graph.c:1502``). Two shuffles on the
    packed id — map-side combined by Catalyst."""
    g = ctx.graph
    v = g.scan_vertices(None)
    e = g.scan_edges(None)
    out_deg = e.groupBy(F.col("start_id").alias("id")).agg(F.count(F.lit(1)).alias("out_degree"))
    in_deg = e.groupBy(F.col("end_id").alias("id")).agg(F.count(F.lit(1)).alias("in_degree"))
    loops = (
        e.filter(F.col("start_id") == F.col("end_id"))
        .groupBy(F.col("start_id").alias("id"))
        .agg(F.count(F.lit(1)).alias("self_loops"))
    )
    out = (
        v.select("id", "label")
        .join(out_deg, "id", "left")
        .join(in_deg, "id", "left")
        .join(loops, "id", "left")
        .select(
            "id",
            "label",
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("self_loops", F.lit(0)).alias("self_loops"),
        )
    )
    return out
