"""Graph generators + subgraph extraction (SURVEY §2.1).

Mirrors the reference's ``create_complete_graph`` / ``age_create_barbell_graph``
(``src/backend/utils/graph_generation.c:47, 206``) and ``create_subgraph``
(``sql/age_subgraph.sql:45``), re-expressed as DataFrame constructions:

  - K_n vertices come from ``spark.range`` (distributed, no driver loop);
    edges are the i<j half of a range x range join — n(n-1)/2 rows, exactly
    the reference's nested-loop insert order (one directed edge per pair,
    low index -> high index).
  - barbell = two K_n blocks + one bridge edge between the first vertex of
    each block (the reference's bridge_size is currently fixed at 0).
  - subgraph = label/predicate filter on vertices, then edges are kept only
    when their label passes AND both endpoints survive — two left-semi joins
    on the packed int64 ids (broadcast when the kept-vertex side is small).
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import CatalogError
from .graph import Graph


def create_complete_graph(
    graph: Graph, n: int, edge_label: str, vertex_label: Optional[str] = None
) -> Graph:
    """Add K_n to `graph`: n fresh vertices under `vertex_label` and one
    directed edge (i -> j, i < j) per pair under `edge_label`
    (graph_generation.c:47 — loop ``for i in 1..n-1: for j in i+1..n``)."""
    if n is None:
        raise CatalogError("number of nodes can not be NULL")
    if edge_label is None:
        raise CatalogError("edge label can not be NULL")
    if vertex_label is not None and vertex_label == edge_label:
        raise CatalogError("vertex and edge label can not be same")
    vlabel = vertex_label or "_ag_label_vertex"
    spark = graph.spark
    vmeta = graph.create_vlabel(vlabel)
    first_v = vmeta.allocate(n)
    ids = spark.range(first_v, first_v + n).select(F.col("id").alias("entry"))
    graph.add_vertices(vlabel, ids, id_col="entry")

    a = ids.select(F.col("entry").alias("s"))
    b = ids.select(F.col("entry").alias("t"))
    pairs = a.join(b, F.col("s") < F.col("t"))
    graph.add_edges(
        edge_label, pairs, start_col="s", end_col="t",
        start_label=vlabel, end_label=vlabel,
    )
    return graph


def create_barbell_graph(
    graph: Graph, n: int, bridge_size: int, edge_label: str,
    vertex_label: Optional[str] = None,
) -> Graph:
    """Two K_n blocks joined by a single bridge edge between the first
    vertex of block one and the last of block two (graph_generation.c:231).
    ``bridge_size`` is validated (NULL / negative rejected) but its VALUE
    is ignored — exactly the reference's behavior: its own code carries
    `to do: implement bridge with variable number of nodes`
    (graph_generation.c:278) and builds the single bridge edge regardless."""
    if n is None or n < 3:
        raise CatalogError("Graph size cannot be NULL or lower than 3")
    if bridge_size is None or bridge_size < 0:
        raise CatalogError("Bridge size cannot be NULL or lower than 0")
    vlabel = vertex_label or "_ag_label_vertex"
    create_complete_graph(graph, n, edge_label, vertex_label)
    first_of_second = graph.meta.label(vlabel).next_entry_id
    create_complete_graph(graph, n, edge_label, vertex_label)
    bridge = graph.spark.createDataFrame(
        [(first_of_second - n, first_of_second)], "s long, t long"
    )
    graph.add_edges(
        edge_label, bridge, start_col="s", end_col="t",
        start_label=vlabel, end_label=vlabel,
    )
    return graph


def create_subgraph(
    from_graph: Graph,
    new_name: str,
    vertex_labels: Optional[list[str]] = None,
    edge_labels: Optional[list[str]] = None,
    vertex_pred: Optional[Callable[[DataFrame], F.Column]] = None,
    edge_pred: Optional[Callable[[DataFrame], F.Column]] = None,
    vertex_ids: Optional[DataFrame] = None,
    edge_ids: Optional[DataFrame] = None,
) -> Graph:
    """Filtered copy of a graph (sql/age_subgraph.sql:45): keep vertices
    whose label is in `vertex_labels` (None = all) and that pass
    `vertex_pred`; keep edges whose label passes AND whose endpoints both
    survive. Ids (and therefore the catalog) carry over unchanged, so the
    copy is a pure metadata + filter operation — no renumbering shuffle.

    ``vertex_ids``/``edge_ids``: kept-id DataFrames (column `id`) — the
    shape produced by compiling an arbitrary Cypher predicate over the
    whole-graph scan (AgeSession.create_subgraph_filtered), semi-joined per
    label table."""
    if new_name == from_graph.name:
        raise CatalogError(f"cannot extract a subgraph of {new_name!r} into itself")
    new = Graph(from_graph.spark, from_graph.meta.renamed(new_name), {}, {})

    kept_ids = None
    for m in from_graph.meta.vertex_labels():
        if m.name not in from_graph.vertex_dfs:
            continue
        if vertex_labels is not None and m.name not in vertex_labels:
            continue
        df = from_graph.vertex_dfs[m.name]
        if vertex_pred is not None:
            df = df.filter(vertex_pred(df))
        if vertex_ids is not None:
            df = df.join(vertex_ids.select("id"), "id", "left_semi")
        new.vertex_dfs[m.name] = df
        ids = df.select("id")
        kept_ids = ids if kept_ids is None else kept_ids.unionByName(ids)

    if kept_ids is None:
        return new
    for m in from_graph.meta.edge_labels():
        if m.name not in from_graph.edge_dfs:
            continue
        if edge_labels is not None and m.name not in edge_labels:
            continue
        df = from_graph.edge_dfs[m.name]
        if edge_pred is not None:
            df = df.filter(edge_pred(df))
        if edge_ids is not None:
            df = df.join(edge_ids.select("id"), "id", "left_semi")
        df = df.join(
            kept_ids.withColumnRenamed("id", "start_id"), "start_id", "left_semi"
        ).join(kept_ids.withColumnRenamed("id", "end_id"), "end_id", "left_semi")
        new.edge_dfs[m.name] = df
    return new
