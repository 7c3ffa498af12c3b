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
    from ..compiler.clauses import _mark_context_loaded

    _mark_context_loaded(ctx)
    g = ctx.graph
    v = g.scan_vertices(None)
    e = g.scan_edges(None)
    vcnt = v.agg(
        F.count(F.lit(1)).alias("num_vertices"),
        F.count_distinct(F.col("label")).alias("num_vertex_labels"),
    )
    ecnt = e.agg(
        F.count(F.lit(1)).alias("num_edges"),
        F.sum(F.when(F.col("start_id") == F.col("end_id"), 1).otherwise(0)).alias("num_self_loops"),
        F.count_distinct(F.col("label")).alias("num_edge_labels"),
    )
    return vcnt.crossJoin(ecnt).select(
        "num_vertices", "num_edges", "num_self_loops",
        "num_vertex_labels", "num_edge_labels",
    )


def _endpoint_filter(arg_ast):
    """Build a vertex filter from a constant procedure argument: a string is
    a label match, an integer is a packed-graphid match (the reference's SRF
    takes graphids; the label form is our CALL-friendly extension)."""
    from ..cypher import ast as A

    if isinstance(arg_ast, A.Lit) and isinstance(arg_ast.value, str):
        val = arg_ast.value
        return lambda df: F.col("label") == F.lit(val)
    if isinstance(arg_ast, A.Lit) and isinstance(arg_ast.value, int):
        val = arg_ast.value
        return lambda df: F.col("id") == F.lit(val)
    raise ValueError("shortest_path endpoints must be constant labels or graphids")


def sp_options(opt_asts):
    """The optional (edge_types, direction, min_hops, max_hops) tail of the
    shortest-path callables, with the reference's argument validation
    (``age_vle.c:2913 sp_agtype_to_direction``; ``get_agtype_value``
    AGTV_STRING checks on edge_types elements)."""
    from ..compiler.context import CompileError
    from ..cypher import ast as A

    types = None
    direction = "both"
    min_hops = 0
    max_hops = None
    if len(opt_asts) > 0 and isinstance(opt_asts[0], A.Lit) and opt_asts[0].value is not None:
        if not isinstance(opt_asts[0].value, str):
            raise CompileError("edge_types argument must be an agtype string or list of strings")
        types = [opt_asts[0].value]
    elif len(opt_asts) > 0 and isinstance(opt_asts[0], A.ListLit):
        # edge_types may be a LIST of labels (age_vle.c:2807 edge_types;
        # age_shortest_path.sql '["KNOWS", "LIKES"]')
        vals = [x.value if isinstance(x, A.Lit) else x for x in opt_asts[0].items]
        if any(not isinstance(v, str) for v in vals):
            raise CompileError("edge_types argument must be an agtype string or list of strings")
        types = vals or None
    if len(opt_asts) > 1 and isinstance(opt_asts[1], A.Lit) and opt_asts[1].value is not None:
        d = opt_asts[1].value
        if not isinstance(d, str) or d.lower() not in ("out", "in", "any", "both"):
            raise CompileError(
                "direction argument must be one of 'out', 'in', or 'any'"
            )
        direction = "both" if d.lower() in ("any", "both") else d.lower()
    if len(opt_asts) > 2 and isinstance(opt_asts[2], A.Lit) and opt_asts[2].value is not None:
        # NULL or negative min_hops means none (age_vle.c:3601)
        min_hops = max(int(opt_asts[2].value), 0)
    if len(opt_asts) > 3 and isinstance(opt_asts[3], A.Lit) and opt_asts[3].value is not None:
        # NULL or negative max_hops means unbounded (age_shortest_path.sql
        # max_hops=-1 block returns the path)
        max_hops = int(opt_asts[3].value)
        if max_hops < 0:
            max_hops = None
    return types, direction, min_hops, max_hops


def _shortest(ctx: QueryContext, arg_asts, all_paths: bool) -> DataFrame:
    """shortest_path/all_shortest_paths (age_vle.c:3877/3892) as a CALL-able:
    CALL shortest_path(<start label|id>, <end label|id>
                       [, edge_label [, dir [, min_hops [, max_hops]]]])
    YIELD src, dst, hops. A NULL/omitted direction means UNDIRECTED — the
    reference's default (sp_agtype_to_direction, age_vle.c:2912:
    'NULL defaults to undirected')."""
    from ..cypher import ast as A
    from .vle import shortest_path_pairs

    if len(arg_asts) < 2:
        raise ValueError("shortest_path requires start and end arguments")
    types, direction, min_hops, max_hops = sp_options(arg_asts[2:])
    out = shortest_path_pairs(
        ctx.graph,
        _endpoint_filter(arg_asts[0]),
        _endpoint_filter(arg_asts[1]),
        types=types,
        direction=direction,
        min_hops=min_hops,
        max_hops=max_hops,
        all_paths=all_paths,
        slim=True,  # YIELD surface is (src, dst, hops)
    )
    return out.select("src", "dst", "hops")


@procedure("shortest_path")
def shortest_path_proc(ctx: QueryContext, arg_asts, arg_cols) -> DataFrame:
    return _shortest(ctx, arg_asts, all_paths=False)


@procedure("all_shortest_paths")
def all_shortest_paths_proc(ctx: QueryContext, arg_asts, arg_cols) -> DataFrame:
    return _shortest(ctx, arg_asts, all_paths=True)


@procedure("pagerank")
def pagerank_proc(ctx: QueryContext, arg_asts, arg_cols) -> DataFrame:
    """CALL pagerank([damping [, iterations]]) YIELD id, rank."""
    from ..algorithms import pagerank
    from ..cypher import ast as A

    damping = arg_asts[0].value if len(arg_asts) > 0 and isinstance(arg_asts[0], A.Lit) else 0.85
    iters = arg_asts[1].value if len(arg_asts) > 1 and isinstance(arg_asts[1], A.Lit) else 10
    g = ctx.graph
    out = pagerank(g.scan_vertices(None), g.scan_edges(None), float(damping), int(iters))
    # full float8 precision: ranks scale like 1/n, so a fixed decimal
    # rounding here would erase significance on large graphs (at 18k
    # vertices, round(rank, 8) left ~3 significant digits and a 1.8e-4
    # relative error); callers round for display
    return out.select("id", "rank")


@procedure("connected_components")
def connected_components_proc(ctx: QueryContext, arg_asts, arg_cols) -> DataFrame:
    """CALL connected_components() YIELD id, component."""
    from ..algorithms import connected_components

    g = ctx.graph
    return connected_components(g.scan_vertices(None), g.scan_edges(None))


@procedure("triangle_count")
def triangle_count_proc(ctx: QueryContext, arg_asts, arg_cols) -> DataFrame:
    """CALL triangle_count() YIELD n_triangles."""
    from ..algorithms import triangle_count

    return triangle_count(ctx.graph.scan_edges(None))


@procedure("vertex_stats")
def vertex_stats(ctx: QueryContext, arg_asts, arg_cols) -> DataFrame:
    """Per-vertex degrees: in/out degree + self loops
    (``age_vertex_stats``, ``age_global_graph.c:1502``). Two shuffles on the
    packed id — map-side combined by Catalyst."""
    from ..compiler.clauses import _mark_context_loaded

    _mark_context_loaded(ctx)
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
