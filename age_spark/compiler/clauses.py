"""Clause chain -> DataFrame pipeline.

The reference's analyzer turns each Cypher clause into a nested SELECT whose
FROM is the previous clause (``transform_cypher_clause``,
``src/backend/parser/cypher_clause.c:519``; chaining via
``transform_prev_cypher_clause``). Our equivalent: each clause is a function
``(DataFrame, Env) -> (DataFrame, Env)`` and the chain is ordinary DataFrame
composition — Catalyst collapses the nesting exactly like PG's subquery
pull-up does for the reference.

Implicit grouping (``RETURN a, count(b)`` groups by a) follows
``cypher_clause.c:3519-3534`` / ``parser/cypher_parse_agg.c``: every
non-aggregate projection item becomes a grouping key.

EXISTS/COUNT subqueries and pattern predicates are *lifted*: computed as
helper columns via semi/left joins keyed on the shared variables (the Spark
shape of the reference's sublink + bool_or strategy,
``cypher_clause.c:1728/4333``), then the expression tree references the
helper column.
"""

from __future__ import annotations

from dataclasses import dataclass, replace as dc_replace
from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cypher import ast as A
from .context import (
    EDGE,
    EDGE_LIST,
    PATH,
    SCALAR,
    VERTEX,
    Binding,
    CompileError,
    Env,
    QueryContext,
)
from .exprs import (
    AGG_FNS,
    ExprScope,
    compile_expr,
    contains_aggregate,
    dtype_of,
)
from .patterns import ast_strings, compile_match_patterns


@dataclass
class State:
    df: Optional[DataFrame]
    env: Env


def _unit_df(ctx: QueryContext) -> DataFrame:
    return ctx.spark.range(1).select(F.lit(0).alias("_unit"))


# ------------------------------------------------------------ AST rewriting


def transform_expr(e, fn):
    """Bottom-up rebuild; fn applied to every node (returning a replacement
    or the node itself)."""
    if e is None:
        return None
    if isinstance(e, A.Unary):
        e = A.Unary(e.op, transform_expr(e.expr, fn))
    elif isinstance(e, A.Binary):
        e = A.Binary(e.op, transform_expr(e.left, fn), transform_expr(e.right, fn))
    elif isinstance(e, A.Prop):
        e = A.Prop(transform_expr(e.expr, fn), e.key)
    elif isinstance(e, A.Index):
        e = A.Index(transform_expr(e.expr, fn), transform_expr(e.index, fn), e.arrow)
    elif isinstance(e, A.Slice):
        e = A.Slice(transform_expr(e.expr, fn), transform_expr(e.lo, fn), transform_expr(e.hi, fn))
    elif isinstance(e, A.ListLit):
        e = A.ListLit([transform_expr(x, fn) for x in e.items])
    elif isinstance(e, A.MapLit):
        e = A.MapLit([(k, transform_expr(v, fn)) for k, v in e.items])
    elif isinstance(e, A.IsNull):
        e = A.IsNull(transform_expr(e.expr, fn), e.negated)
    elif isinstance(e, A.CaseExpr):
        e = A.CaseExpr(
            transform_expr(e.operand, fn),
            [(transform_expr(c, fn), transform_expr(r, fn)) for c, r in e.whens],
            transform_expr(e.default, fn),
        )
    elif isinstance(e, A.ListComp):
        e = A.ListComp(e.var, transform_expr(e.source, fn), transform_expr(e.where, fn), transform_expr(e.projection, fn))
    elif isinstance(e, A.PredFn):
        e = A.PredFn(e.kind, e.var, transform_expr(e.source, fn), transform_expr(e.where, fn))
    elif isinstance(e, A.Reduce):
        e = A.Reduce(e.acc, transform_expr(e.init, fn), e.var, transform_expr(e.source, fn), transform_expr(e.expr, fn))
    elif isinstance(e, A.FuncCall):
        e = A.FuncCall(e.name, [transform_expr(a, fn) for a in e.args], e.distinct)
    return fn(e)


def expr_vars(e) -> set[str]:
    out: set[str] = set()

    def fn(x):
        if isinstance(x, A.Var):
            out.add(x.name)
        # pattern-shaped subexpressions reference variables too — an
        # OPTIONAL MATCH ... WHERE (a)-[:KNOWS]->(b) correlates on a;
        # missing it makes the predicate evaluate against ANY a
        elif isinstance(x, A.PatternPred):
            out.update(pattern_vars([x.pattern]))
        elif isinstance(x, (A.ExistsSubquery, A.CountSubquery)):
            out.update(pattern_vars(x.patterns))
            if x.where is not None:
                out.update(expr_vars(x.where))
        return x

    transform_expr(e, fn)
    return out


def pattern_vars(pats: list[A.PathPattern]) -> set[str]:
    """Variables a pattern list touches: element/path names plus variables
    REFERENCED inside property constraints (`MERGE ({i: n.i})` correlates
    on n even though n names no element)."""
    from .exprs import _ast_any

    out: set[str] = set()

    def note(x):
        if isinstance(x, A.Var):
            out.add(x.name)
        return False

    for p in pats:
        if p.var:
            out.add(p.var)
        for el in p.elements:
            if el.var:
                out.add(el.var)
            if el.props is not None and not isinstance(el.props, A.Param):
                _ast_any(el.props, note)
    return out


# ------------------------------------------------------- subquery lifting


def lift_subqueries(ctx: QueryContext, st: State, e):
    """Replace ExistsSubquery/CountSubquery/PatternPred nodes with references
    to helper columns computed via joins, and startNode()/endNode() calls
    with vertex structs fetched by a left join on the endpoint id (the Spark
    shape of ``age_startnode``/``age_endnode``, ``agtype.c:6261/6327`` —
    which do a by-graphid heap lookup). Returns (new_state, new_expr)."""
    if e is None:
        return st, None

    pending: list[tuple[object, str]] = []

    def detect(x):
        if isinstance(x, (A.ExistsSubquery, A.CountSubquery, A.PatternPred)):
            name = ctx.fresh("_sq")
            pending.append((x, name))
            if isinstance(x, A.CountSubquery):
                return A.FuncCall("coalesce", [A.Var(name), A.Lit(0)])
            return A.FuncCall("coalesce", [A.Var(name), A.Lit(False)])
        if isinstance(x, A.FuncCall) and x.name in ("startnode", "endnode") and len(x.args) == 1:
            name = ctx.fresh("_vn")
            pending.append((x, name))
            return A.Var(name)
        if isinstance(x, A.FuncCall) and x.name == "vertex_stats" and len(x.args) == 1:
            # scalar vertex_stats(v) (age_global_graph.c:1502 — usable in
            # any expression, expr.out:7781): joined from the per-vertex
            # degree aggregation on the packed id
            name = ctx.fresh("_vs")
            pending.append((x, name))
            return A.Var(name)
        if (
            isinstance(x, A.FuncCall)
            and x.name in ("shortest_path", "all_shortest_paths")
            and len(x.args) >= 2
        ):
            # scalar shortest_path(a, b [, types [, dir [, min [, max]]]])
            # inside a RETURN (age_shortest_path.sql:666): a set-returning
            # call — one output row per path, rows with no path vanish
            name = ctx.fresh("_spf")
            pending.append((x, name))
            return A.Var(name)
        if isinstance(x, A.FuncCall) and x.name == "graph_stats" and len(x.args) == 1:
            # scalar graph_stats('name') (age_global_graph.c:1659): loads
            # the NAMED graph's context and reports its loaded sizes
            name = ctx.fresh("_gs")
            pending.append((x, name))
            return A.Var(name)
        if isinstance(x, A.FuncCall) and x.name == "delete_global_graphs" and len(x.args) == 1:
            # delete_global_graphs('name'|NULL) (age_global_graph.c:1777):
            # true iff a loaded context existed (NULL = delete all).  The
            # GGC set mutates at COMPILE time — the reference's function is
            # likewise a statement-time catalog action, not a per-row one.
            sess = ctx.session
            arg = x.args[0]
            gname = arg.value if isinstance(arg, A.Lit) else None
            if sess is None:
                return A.Lit(False)
            if gname is None:
                sess.ggc.clear()
                return A.Lit(True)
            existed = gname in sess.ggc
            sess.ggc.discard(gname)
            return A.Lit(existed)
        return x

    new_e = transform_expr(e, detect)
    for node, name in pending:
        if isinstance(node, A.FuncCall) and node.name == "vertex_stats":
            st = _attach_vertex_stats(ctx, st, node, name)
        elif isinstance(node, A.FuncCall) and node.name in (
            "shortest_path", "all_shortest_paths"
        ):
            st = _attach_shortest_path(ctx, st, node, name)
        elif isinstance(node, A.FuncCall) and node.name == "graph_stats":
            st = _attach_graph_stats(ctx, st, node, name)
        elif isinstance(node, A.FuncCall):
            st = _attach_vertex_lookup(ctx, st, node, name)
        else:
            st = _attach_subquery(ctx, st, node, name)
    return st, new_e


def _mark_context_loaded(ctx: QueryContext, graph=None, name: str | None = None):
    """Record that a graph's global context is loaded (GGC analogue):
    graph_stats/vertex_stats build contexts in the reference; here the set
    only feeds delete_global_graphs()' true/false answer."""
    sess = ctx.session
    if sess is None:
        return
    if name is not None:
        sess.ggc.add(name)
        return
    g = graph if graph is not None else ctx.graph
    for k, v in sess.graphs.items():
        if v is g:
            sess.ggc.add(k)


def _attach_vertex_stats(ctx: QueryContext, st: State, node: A.FuncCall, out_name: str) -> State:
    from ..runtime.procedures import vertex_stats as _vs_proc

    _mark_context_loaded(ctx)
    df = st.df if st.df is not None else _unit_df(ctx)
    scope = ExprScope(ctx, df, st.env)
    vcol = compile_expr(scope, node.args[0])
    stats = _vs_proc(ctx, [], []).select(
        F.struct("id", "label", "in_degree", "out_degree", "self_loops").alias(out_name)
    )
    out = df.join(
        stats, vcol.getField("id") == F.col(out_name).getField("id"), "left"
    )
    return State(out, st.env.bind(Binding(out_name, SCALAR, hidden=True)))


def _attach_shortest_path(ctx: QueryContext, st: State, node: A.FuncCall, out_name: str) -> State:
    """Scalar shortest_path/all_shortest_paths(a, b, ...) in an expression
    (age_shortest_path.sql:666): run the BFS seeded by the DISTINCT endpoint
    ids present in the current rows, then INNER-join paths back per row —
    a set-returning call multiplies rows per path and drops rows with no
    path, the PG SRF-in-targetlist contract."""
    from ..runtime.procedures import sp_options
    from ..runtime.vle import shortest_path_pairs
    from .patterns import normalize_edge, normalize_vertex

    df = st.df if st.df is not None else _unit_df(ctx)
    scope = ExprScope(ctx, df, st.env)
    acol = compile_expr(scope, node.args[0])
    bcol = compile_expr(scope, node.args[1])
    adt = dtype_of(scope, acol)
    types, direction, min_hops, max_hops = sp_options(node.args[2:])
    pairs = shortest_path_pairs(
        ctx.graph,
        types=types,
        direction=direction,
        min_hops=min_hops,
        max_hops=max_hops,
        all_paths=node.name == "all_shortest_paths",
        slim=False,
        starts_df=df.select(acol.getField("id").alias("id")).distinct(),
        targets_df=df.select(bcol.getField("id").alias("id")).distinct(),
    )
    s, d, e, n = (ctx.fresh("_sp") for _ in range(4))
    pairs = pairs.select(
        F.col("src").alias(s), F.col("dst").alias(d),
        F.col("edges").alias(e), F.col("nodes").alias(n),
    )
    out = df.join(
        pairs, (acol.getField("id") == F.col(s)) & (bcol.getField("id") == F.col(d)),
        "inner",
    )
    edt = pairs.schema[e].dataType.elementType
    ndt = pairs.schema[n].dataType.elementType
    bdt = dtype_of(scope, bcol)

    def _edge_norm(x):
        return normalize_edge(ctx, x, edt)

    def _vertex_norm(x):
        return normalize_vertex(ctx, x, ndt)

    # path value = start vertex + interleaved interiors + end vertex; a
    # zero-hop path (a == b) is the single start vertex
    nodes_col = F.when(
        F.size(F.col(e)) == 0, F.array(normalize_vertex(ctx, acol, adt))
    ).otherwise(
        F.concat(
            F.array(normalize_vertex(ctx, acol, adt)),
            F.transform(F.col(n), _vertex_norm),
            F.array(normalize_vertex(ctx, bcol, bdt)),
        )
    )
    path_col = F.struct(
        nodes_col.alias("nodes"),
        F.transform(F.col(e), _edge_norm).alias("edges"),
    )
    out = out.withColumn(out_name, path_col).drop(s, d, e, n)
    return State(out, st.env.bind(Binding(out_name, PATH, hidden=True)))


def _attach_graph_stats(ctx: QueryContext, st: State, node: A.FuncCall, out_name: str) -> State:
    """Scalar graph_stats('name'): one aggregate row over the NAMED graph's
    scans, broadcast onto every outer row.  {"graph", "num_loaded_edges",
    "num_loaded_vertices"} mirrors the reference's context-stats object
    (age_global_graph.c:1659); the counts are the graph's CURRENT sizes —
    the engine has no stale cache to report."""
    arg = node.args[0]
    gname = arg.value if isinstance(arg, A.Lit) else None
    if not isinstance(gname, str):
        raise CompileError("graph_stats() requires a graph name string")
    sess = ctx.session
    g = None
    if sess is not None:
        g = sess.graphs.get(gname)
    if g is None:
        raise CompileError(f'graph "{gname}" does not exist')
    _mark_context_loaded(ctx, name=gname)
    df = st.df if st.df is not None else _unit_df(ctx)
    stats = (
        g.scan_vertices(None)
        .agg(F.count(F.lit(1)).alias("_nv"))
        .crossJoin(g.scan_edges(None).agg(F.count(F.lit(1)).alias("_ne")))
        .select(
            F.struct(
                F.lit(gname).alias("graph"),
                F.col("_ne").alias("num_loaded_edges"),
                F.col("_nv").alias("num_loaded_vertices"),
            ).alias(out_name)
        )
    )
    out = df.crossJoin(F.broadcast(stats))
    return State(out, st.env.bind(Binding(out_name, SCALAR, hidden=True)))


def _attach_vertex_lookup(ctx: QueryContext, st: State, node: A.FuncCall, out_name: str) -> State:
    df = st.df if st.df is not None else _unit_df(ctx)
    scope = ExprScope(ctx, df, st.env)
    edge_col = compile_expr(scope, node.args[0])
    from .exprs import dtype_of

    adt = dtype_of(scope, edge_col)
    if adt is not None and isinstance(adt, T.NullType):
        # startNode(null) / endNode(null) -> null (expr.out:341)
        out = df.withColumn(out_name, F.lit(None).cast("string"))
        return State(out, st.env.bind(Binding(out_name, SCALAR, hidden=True)))
    fld = "start_id" if node.name == "startnode" else "end_id"
    vscan = ctx.graph.scan_vertices(None).select(
        F.struct(F.col("id"), F.col("label"), F.col("properties")).alias(out_name)
    )
    out = df.join(
        vscan, edge_col.getField(fld) == F.col(out_name).getField("id"), "left"
    )
    env = st.env.bind(Binding(out_name, VERTEX, hidden=True))
    return State(out, env)


def _subquery_parts(ctx: QueryContext, st: State, node):
    """Shared front half of EXISTS/COUNT/pattern-predicate compilation:
    validate, compile the sub-pattern seeded on the DISTINCT shared
    variables, and return (outer_df, sub_df, keys, want_count)."""
    if isinstance(node, A.PatternPred):
        pats, where = [node.pattern], None
        want_count = False
    elif isinstance(node, A.ExistsSubquery):
        pats, where = node.patterns, node.where
        want_count = False
        if node.paren_form:
            for v in sorted(pattern_vars(pats)):
                if st.env.get(v) is None:
                    raise CompileError(
                        f"EXISTS(pattern) cannot create variable `{v}` — only "
                        "references to bound variables are allowed"
                    )
    else:
        pats, where = node.patterns, node.where
        want_count = True

    df, env = st.df, st.env
    if df is None:
        df = _unit_df(ctx)

    ret_vars: set[str] = set()
    for rexpr in getattr(node, "returns", None) or []:
        ret_vars |= expr_vars(rexpr)
    shared = sorted(
        v
        for v in (
            pattern_vars(pats)
            | (expr_vars(where) if where else set())
            | ret_vars
        )
        if env.get(v) is not None
    )
    keys = []
    for v in shared:
        b = env.require(v)
        if b.kind in (VERTEX, EDGE):
            keys.append((v, "id"))
        else:
            keys.append((v, None))

    if shared:
        seed = df.select(*[F.col(v) for v in shared]).distinct()
    else:
        seed = _unit_df(ctx)

    env_sub = Env({v: env.require(v) for v in shared})
    # names observable past the sub-pattern: its own WHERE and RETURN items
    # (everything else dies at the subquery boundary, so dead-node pruning
    # is maximal here — EXISTS { (c)-[:X]->(o:Order) } needs no Order join)
    sub_live = ast_strings(where) | ast_strings(getattr(node, "returns", None) or [])
    sub_df, sub_env, _ = compile_match_patterns(
        ctx, seed if shared else None, env_sub, pats, lenient_relabel=True,
        live=sub_live,
    )
    sub_st = State(sub_df, sub_env)
    if where is not None:
        sub_st, w = lift_subqueries(ctx, sub_st, where)
        scope = ExprScope(ctx, sub_st.df, sub_st.env)
        sub_st = State(sub_st.df.filter(compile_expr(scope, w).cast("boolean")), sub_st.env)
    # the subquery's RETURN items matter only for existence, but their
    # variable references must resolve in the sub-scope
    # (cypher_subquery.out: `EXISTS { MATCH (b) RETURN a }` with no outer
    # `a` errors 'could not find rte for a')
    for v in sorted(ret_vars):
        if sub_st.env.get(v) is None:
            raise CompileError(f"could not find rte for {v}")
    return df, sub_st.df, keys, want_count


def _attach_subquery(ctx: QueryContext, st: State, node, out_name: str) -> State:
    df, sub_df, keys, want_count = _subquery_parts(ctx, st, node)

    key_cols = []
    for v, fld in keys:
        c = F.col(v).getField(fld) if fld else F.col(v)
        key_cols.append(c.alias(f"_key_{v}"))

    if want_count:
        if key_cols:
            agg = sub_df.select(*key_cols).groupBy(*[f"_key_{v}" for v, _ in keys]).agg(
                F.count(F.lit(1)).alias(out_name)
            )
        else:
            agg = sub_df.agg(F.count(F.lit(1)).alias(out_name))
    else:
        if key_cols:
            agg = sub_df.select(*key_cols).distinct().withColumn(out_name, F.lit(True))
        else:
            agg = sub_df.limit(1).select(F.lit(True).alias(out_name))

    if keys:
        cond = None
        for v, fld in keys:
            left = F.col(v).getField(fld) if fld else F.col(v)
            c = left.eqNullSafe(F.col(f"_key_{v}"))
            cond = c if cond is None else (cond & c)
        out = df.join(agg, cond, "left").drop(*[f"_key_{v}" for v, _ in keys])
    else:
        out = df.crossJoin(agg) if want_count else df.crossJoin(
            agg.select(F.coalesce(F.first(out_name), F.lit(False)).alias(out_name))
        )
    new_env = st.env.bind(Binding(out_name, SCALAR, hidden=True))
    return State(out, new_env)


def _split_exists_conjuncts(e):
    """Decompose a WHERE tree into (semi, anti, rest): top-level AND
    conjuncts that are a bare EXISTS/pattern predicate (semi), its NOT
    (anti), and everything else.  AND-splitting is retention-exact under
    Cypher WHERE (NULL keeps nothing, same as FALSE)."""
    semi, anti, rest = [], [], []

    def walk(x):
        if isinstance(x, A.Binary) and x.op == "and":
            walk(x.left)
            walk(x.right)
            return
        if isinstance(x, (A.ExistsSubquery, A.PatternPred)):
            semi.append(x)
            return
        if (
            isinstance(x, A.Unary)
            and x.op == "not"
            and isinstance(x.expr, (A.ExistsSubquery, A.PatternPred))
        ):
            anti.append(x.expr)
            return
        rest.append(x)

    walk(e)
    return semi, anti, rest


def _attach_exists_join(ctx: QueryContext, st: State, node, how: str):
    """(NOT) EXISTS used as a whole top-level WHERE conjunct compiles to a
    LEFT SEMI/ANTI join on the shared entity keys instead of the lifted
    helper-column plan: no distinct aggregate, no outer join, no filter.
    The lifted plan's build side (DISTINCT matched keys) falls out of
    broadcast once the match set outgrows the threshold, and the
    left-outer SMJ then carries the distinct exchange for nothing —
    BENCH r8 measured g_not_exists' 10x growth drifting 2.73x -> 3.41x on
    exactly that cliff; semi/anti joins need neither the distinct nor the
    helper column.  Returns None when there are no shared keys (the
    uncorrelated case keeps the crossJoin helper lane) — the caller then
    falls back to lifting."""
    if st.df is None:
        return None
    df, sub_df, keys, _ = _subquery_parts(ctx, st, node)
    if not keys:
        return None
    key_cols = []
    cond = None
    for v, fld in keys:
        c = F.col(v).getField(fld) if fld else F.col(v)
        key_cols.append(c.alias(f"_key_{v}"))
        eq = c.eqNullSafe(F.col(f"_key_{v}"))
        cond = eq if cond is None else (cond & eq)
    return State(df.join(sub_df.select(*key_cols), cond, how), st.env)


# ------------------------------------------------------------- aggregates


def _agg_column(
    ctx: QueryContext, node: A.FuncCall, arg_col: Optional[Column], arg_dt=None
) -> Column:
    name = node.name
    from ..graph import is_tagged_type

    if arg_dt is not None and is_tagged_type(arg_dt) and name in (
        "sum", "avg", "stdev", "stdevp", "percentilecont", "percentiledisc"
    ):
        return _agg_tagged(ctx, node, arg_col)
    if name == "count":
        if not node.args or isinstance(node.args[0], A.Star):
            return F.count(F.lit(1))
        if node.distinct:
            return F.count_distinct(arg_col)
        return F.count(arg_col)
    if name == "sum":
        return F.sum_distinct(arg_col) if node.distinct else F.sum(arg_col)
    if name == "avg":
        if node.distinct:
            return F.sum_distinct(arg_col) / F.count_distinct(arg_col)
        return F.avg(arg_col)
    if name in ("min", "max"):  # DISTINCT is a no-op for min/max
        if arg_dt is not None and is_tagged_type(arg_dt):
            # dynamic values pick the winner by the reference's FULL
            # comparator (exact order text — any container depth/width,
            # arbitrary-precision numerics); reference-EQUAL candidates
            # (1 vs 1.0) tie-break on the native struct so the result
            # stays deterministic at any partition count
            from ..graph import tagged_cmp_key_exact

            key = F.when(
                arg_col.isNotNull(),
                F.struct(
                    tagged_cmp_key_exact(arg_col).alias("e"),
                    arg_col.alias("v"),
                ),
            )
            return F.min_by(arg_col, key) if name == "min" else F.max_by(arg_col, key)
        return F.min(arg_col) if name == "min" else F.max(arg_col)
    if name == "collect":
        # never NULL: empty list for no input (agtype.c:12108)
        return F.collect_set(arg_col) if node.distinct else F.collect_list(arg_col)
    if name == "stdev":
        # n=1 -> 0 not NULL (age_aggregate.sql:42)
        return F.coalesce(F.stddev_samp(arg_col), F.lit(0.0))
    if name == "stdevp":
        return F.coalesce(F.stddev_pop(arg_col), F.lit(0.0))
    if name == "percentilecont":
        return F.percentile(arg_col, F.lit(_const_float(ctx, node.args[1])))
    if name == "percentiledisc":
        return F.percentile_approx(arg_col, F.lit(_const_float(ctx, node.args[1])), F.lit(2147483647))
    raise CompileError(f"unknown aggregate {name}")


def _agg_tagged(ctx: QueryContext, node: A.FuncCall, arg_col: Column) -> Column:
    """Numeric aggregates over a tagged (mixed-kind) dynamic column operate
    on the numeric slot; non-numeric rows contribute NULL (ignored).

    sum() preserves the numeric kind the way the reference does
    (age_agtype_sum, agtype.c:11344): all-int input returns an exact int64
    sum (via the __i payloads), any float in the group promotes the result
    to float. The result is itself a tagged value so either kind can
    surface per group."""
    from ..graph import TAGGED_TYPE

    name = node.name
    n, i = arg_col.getField("__n"), arg_col.getField("__i")
    if name == "sum":
        nsum = F.sum_distinct(n) if node.distinct else F.sum(n)
        isum = F.sum_distinct(i) if node.distinct else F.sum(i)
        all_int = F.count(n) == F.count(i)
        from ..graph import ORDER_KEY_TYPE, dec_trim_text

        # kind-preserving sum with the NUMERIC lane (age_agtype_sum,
        # agtype.c:11344): ANY numeric-kind row promotes the whole group's
        # sum to numeric, computed exactly in DECIMAL(38,18) from each
        # row's exact slot (__d digits / __i int / __n float)
        d = arg_col.getField("__d")
        dval = F.coalesce(
            d.try_cast("decimal(38,18)"),
            i.cast("decimal(38,18)"),
            n.cast("decimal(38,18)"),
        )
        dsum = F.sum_distinct(dval) if node.distinct else F.sum(dval)
        any_num = F.max(F.when((arg_col.getField("__k") == 7) & d.isNotNull(), 1).otherwise(0)) == 1
        # NaN/Infinity rows cast to NULL decimal and would silently drop out
        # of dsum — PG's numeric sum propagates them (numeric addition:
        # NaN dominates; +inf + -inf = NaN).  Detect specials via the exact
        # __d spelling or the __n double and route __d to the spelling.
        nn = F.coalesce(n, F.lit(0.0))
        has_nan = F.max(
            F.when((d == "NaN") | F.isnan(nn), 1).otherwise(0)
        ) == 1
        has_pinf = F.max(
            F.when((d == "Infinity") | (nn == float("inf")), 1).otherwise(0)
        ) == 1
        has_ninf = F.max(
            F.when((d == "-Infinity") | (nn == float("-inf")), 1).otherwise(0)
        ) == 1
        dspecial = (
            F.when(has_nan | (has_pinf & has_ninf), F.lit("NaN"))
            .when(has_pinf, F.lit("Infinity"))
            .when(has_ninf, F.lit("-Infinity"))
        )
        return F.when(nsum.isNull(), F.lit(None).cast(TAGGED_TYPE)).otherwise(
            F.struct(
                F.lit(7).cast("tinyint").alias("__k"),
                F.coalesce(dspecial.cast("double"), nsum).alias("__n"),
                F.when(all_int & ~any_num, isum).alias("__i"),
                F.when(
                    any_num,
                    F.coalesce(dspecial, dec_trim_text(dsum.cast("string"))),
                ).alias("__d"),
                F.lit(None).cast("string").alias("__s"),
                F.lit(None).cast("boolean").alias("__b"),
                F.lit(None).cast(ORDER_KEY_TYPE).alias("__o"),
                F.lit(None).cast("string").alias("__j"),
            )
        )
    if name == "avg":
        # float8 accumulator in the reference (age_agtype_float8_accum)
        if node.distinct:
            return F.sum_distinct(n) / F.count_distinct(n)
        return F.avg(n)
    if name == "stdev":
        return F.coalesce(F.stddev_samp(n), F.lit(0.0))
    if name == "stdevp":
        return F.coalesce(F.stddev_pop(n), F.lit(0.0))
    if name == "percentilecont":
        return F.percentile(n, F.lit(_const_float(ctx, node.args[1])))
    return F.percentile_approx(n, F.lit(_const_float(ctx, node.args[1])), F.lit(2147483647))


def _const_float(ctx: QueryContext, e) -> float:
    if isinstance(e, A.Lit) and isinstance(e.value, (int, float)):
        return float(e.value)
    if isinstance(e, A.Param):
        return float((ctx.params or {})[e.name])
    raise CompileError("percentile requires a constant fraction")


def collect_agg_nodes(e) -> list[A.FuncCall]:
    out = []

    def fn(x):
        if isinstance(x, A.FuncCall) and x.name in AGG_FNS:
            out.append(x)
        return x

    transform_expr(e, fn)
    return out


# ------------------------------------------------------------- projection


def _derive_alias(item: A.ReturnItem, i: int) -> str:
    if item.alias:
        return item.alias
    if isinstance(item.expr, A.Var):
        return item.expr.name
    if isinstance(item.expr, A.Prop):
        return item.expr.key
    return f"col{i}"


def _binding_kind_of_item(env: Env, df: DataFrame, expr, alias: str) -> Binding:
    if isinstance(expr, A.Var):
        b = env.get(expr.name)
        if b is not None:
            return Binding(alias, b.kind, b.labels)
    dt = df.schema[alias].dataType if alias in df.columns else None
    return Binding(alias, _infer_kind(dt))


def _infer_kind(dt) -> str:
    if isinstance(dt, T.StructType):
        names = {f.name for f in dt.fields}
        if {"id", "label", "properties"} <= names:
            return EDGE if "start_id" in names else VERTEX
        if {"nodes", "edges"} <= names:
            return PATH
    return SCALAR


def _const_int(ctx: QueryContext, e) -> int:
    if isinstance(e, A.Lit) and isinstance(e.value, int):
        return e.value
    if isinstance(e, A.Param):
        return int((ctx.params or {})[e.name])
    raise CompileError("SKIP/LIMIT must be a constant integer")


def compile_projection(
    ctx: QueryContext,
    st: State,
    items: list[A.ReturnItem],
    distinct: bool,
    star: bool,
    order_by: list[A.OrderItem],
    skip,
    limit,
    where,
    is_with: bool,
) -> State:
    df = st.df if st.df is not None else _unit_df(ctx)
    env = st.env
    state = State(df, env)

    if star:
        star_items = [A.ReturnItem(A.Var(n), n) for n in env.visible_names()]
        items = star_items + items
        if not items and is_with:
            # WITH * over only-anonymous bindings carries the rows through
            # unchanged (cypher_match.sql:1060 CREATE () WITH * MATCH ...)
            return State(df, Env({}))
    if not items:
        raise CompileError("empty projection")

    # lift subqueries out of item / order / where expressions
    new_items = []
    for it in items:
        state, ne = lift_subqueries(ctx, state, it.expr)
        new_items.append(A.ReturnItem(ne, it.alias))
    items = new_items
    new_order = []
    for ob in order_by:
        state, ne = lift_subqueries(ctx, state, ob.expr)
        new_order.append(A.OrderItem(ne, ob.asc))
    order_by = new_order
    df, env = state.df, state.env

    aliases = []
    seen = set()
    for i, it in enumerate(items):
        a = _derive_alias(it, i)
        while a in seen:
            a = a + "_"
        seen.add(a)
        aliases.append(a)

    has_agg = any(contains_aggregate(it.expr) for it in items) or any(
        contains_aggregate(ob.expr) for ob in order_by
    )

    if has_agg:
        out_df, out_env = _project_aggregate(ctx, df, env, items, aliases, order_by, distinct)
    else:
        out_df, out_env = _project_plain(ctx, df, env, items, aliases, order_by, distinct)

    state = State(out_df, out_env)

    if skip is not None:
        state = State(state.df.offset(_const_int(ctx, skip)), state.env)
    if limit is not None:
        state = State(state.df.limit(_const_int(ctx, limit)), state.env)

    if where is not None:
        state, w = lift_subqueries(ctx, state, where)
        scope = ExprScope(ctx, state.df, state.env)
        state = State(state.df.filter(compile_expr(scope, w).cast("boolean")), state.env)
        # drop any helper cols the lifting added
        keep = [c for c in state.df.columns if not c.startswith("_sq")]
        state = State(state.df.select(*keep), state.env)

    return state


def _sort_cols(order_specs: list[tuple[Column, bool]]) -> list[Column]:
    # Cypher/agtype ordering: NULLs sort largest (agtype_util.c:271-310)
    out = []
    for c, asc in order_specs:
        out.append(c.asc_nulls_last() if asc else c.desc_nulls_first())
    return out


def _dtype_on(df: DataFrame, c: Column):
    try:
        return df.select(c.alias("_t")).schema[0].dataType
    except Exception:
        return None


def _exact_order_key(df: DataFrame, c: Column):
    """EXACT order key (runtime/ordertext.py) for a sort column whose
    native ordering can diverge from the reference comparator: tagged
    dynamic values, paths (AGTV_PATH counts elements FIRST,
    agtype_util.c:1025 — native struct compare walks nodes element-wise),
    and static containers (native arrays put NULL elements first where
    the reference's null kind sorts last; native structs compare fields
    in declaration order, not jsonb key order).  None = native ordering
    already exact (scalars, vertices/edges by leading id field)."""
    from ..graph import (
        _container_kind,
        _entity_kind,
        _strip_nullability,
        is_tagged_type,
        tag_column,
        tagged_cmp_key_exact,
    )

    dt = _dtype_on(df, c)
    if dt is None:
        return None
    sdt = _strip_nullability(dt)
    if is_tagged_type(sdt):
        return tagged_cmp_key_exact(c)
    ek = _entity_kind(sdt)
    if ek == "path":
        return tagged_cmp_key_exact(tag_column(c, sdt))
    if ek is None and _container_kind(sdt) is not None:
        return tagged_cmp_key_exact(tag_column(c, sdt))
    return None


def _expand_order_specs(df: DataFrame, specs):
    """Prepend the EXACT order text (pandas-UDF key, any depth/width —
    runtime/ordertext.py) before each sort column that needs it; the
    native column stays as the final tiebreak so reference-EQUAL values
    keep today's deterministic order."""
    out = []
    for c, asc in specs:
        k = _exact_order_key(df, c)
        if k is not None:
            out.append((k, asc))
        out.append((c, asc))
    return out


def _project_plain(ctx, df, env, items, aliases, order_by, distinct):
    # remember (or clear) the clause's ordering for a following collect()
    if order_by:
        ctx.scratch["pending_order"] = order_by
    else:
        ctx.scratch.pop("pending_order", None)
    scope = ExprScope(ctx, df, env)
    proj_cols = {}
    for i, it in enumerate(items):
        proj_cols[f"_p{i}"] = compile_expr(scope, it.expr)
    work = df
    for name, c in proj_cols.items():
        work = work.withColumn(name, c)

    # final bindings
    new_env = Env({})
    for i, (it, alias) in enumerate(zip(items, aliases)):
        b = _binding_kind_of_item(env, work, it.expr, alias)
        new_env = new_env.bind(Binding(alias, b.kind, b.labels))

    alias_to_p = { alias: f"_p{i}" for i, alias in enumerate(aliases) }
    item_ast_to_p = []
    for i, it in enumerate(items):
        item_ast_to_p.append((it.expr, f"_p{i}"))

    if distinct:
        sel = work.select(*[F.col(f"_p{i}").alias(a) for i, a in enumerate(aliases)]).distinct()
        if order_by:
            scope2 = ExprScope(ctx, sel, new_env)
            specs = []
            for ob in order_by:
                c = _order_col_on_projected(scope2, ob.expr, aliases, items)
                specs.append((c, ob.asc))
            sel = sel.orderBy(*_sort_cols(_expand_order_specs(sel, specs)))
        return sel, new_env

    if order_by:
        specs = []
        scope_ord = ExprScope(ctx, work, env)
        for ob in order_by:
            c = None
            if isinstance(ob.expr, A.Var) and ob.expr.name in alias_to_p:
                c = F.col(alias_to_p[ob.expr.name])
            else:
                for ast_e, pcol in item_ast_to_p:
                    if ast_e == ob.expr:
                        c = F.col(pcol)
                        break
            if c is None:
                c = compile_expr(scope_ord, ob.expr)
            specs.append((c, ob.asc))
        work = work.orderBy(*_sort_cols(_expand_order_specs(work, specs)))
    out = work.select(*[F.col(f"_p{i}").alias(a) for i, a in enumerate(aliases)])
    return out, new_env


def _order_col_on_projected(scope, expr, aliases, items):
    if isinstance(expr, A.Var) and expr.name in aliases:
        return F.col(expr.name)
    for it, alias in zip(items, aliases):
        if it.expr == expr:
            return F.col(alias)
    return compile_expr(scope, expr)


def _ordered_collect(arg_col: Column, ord_ascs: list[bool]) -> Column:
    """collect() honoring the previous clause's ORDER BY: gather
    (sort-keys, value) structs, then array_sort with a comparator that
    applies per-key direction and the NULLS-LARGEST rule, and strip the
    keys.  NULL values still drop (collect never includes nulls)."""
    st = F.struct(
        *[F.col(f"_ob{i}").alias(f"k{i}") for i in range(len(ord_ascs))],
        arg_col.alias("v"),
    )
    arr = F.collect_list(F.when(arg_col.isNotNull(), st))

    def comparator(l, r):
        out = F.lit(0)
        for i in reversed(range(len(ord_ascs))):
            asc = ord_ascs[i]
            lk, rk = l.getField(f"k{i}"), r.getField(f"k{i}")
            cmp_i = (
                F.when(lk.isNull() & rk.isNull(), F.lit(0))
                .when(lk.isNull(), F.lit(1 if asc else -1))  # nulls largest
                .when(rk.isNull(), F.lit(-1 if asc else 1))
                .when(lk < rk, F.lit(-1 if asc else 1))
                .when(lk > rk, F.lit(1 if asc else -1))
                .otherwise(F.lit(0))
            )
            out = F.when(cmp_i != 0, cmp_i).otherwise(out)
        return out.cast("int")

    return F.transform(F.array_sort(arr, comparator), lambda x: x.getField("v"))


def _project_aggregate(ctx, df, env, items, aliases, order_by, distinct):
    scope = ExprScope(ctx, df, env)

    # 1) grouping keys = non-aggregate items (implicit grouping, §2.5)
    key_idx = [i for i, it in enumerate(items) if not contains_aggregate(it.expr)]
    key_cols = {}
    for i in key_idx:
        key_cols[f"_k{i}"] = compile_expr(scope, items[i].expr)

    # 2) aggregate nodes across items + order-by
    agg_nodes: list[A.FuncCall] = []
    for it in items:
        agg_nodes.extend(collect_agg_nodes(it.expr))
    for ob in order_by:
        agg_nodes.extend(collect_agg_nodes(ob.expr))
    uniq: list[A.FuncCall] = []
    for n in agg_nodes:
        if not any(n == u for u in uniq):
            uniq.append(n)

    # batch every helper column into single withColumns calls — each
    # withColumn is a full py4j select + analysis round-trip, and the
    # helpers here never reference each other (driver plan time only)
    pre = df
    if key_cols:
        pre = pre.withColumns(key_cols)
    # a preceding `WITH ... ORDER BY` defines the row order collect() sees
    # in the reference's sequential executor (pattern_expression.sql
    # `WITH a ORDER BY a.name RETURN collect(...)`); materialize the sort
    # keys pre-agg so collect can re-sort its elements deterministically
    pending = ctx.scratch.pop("pending_order", None)
    ord_specs_pre: list[bool] = []
    if pending:
        try:
            sc_ord = ExprScope(ctx, pre, env)
            cols_pre = [(compile_expr(sc_ord, ob.expr), ob.asc) for ob in pending]
            ob_cols = {}
            for i, (c, asc) in enumerate(cols_pre):
                # a tagged sort key materializes as its EXACT order key so
                # the collect() array_sort comparator (a lambda — no UDFs
                # allowed inside) still orders containers by value
                k = _exact_order_key(pre, c)
                if k is not None:
                    c = k
                ob_cols[f"_ob{i}"] = c
                ord_specs_pre.append(asc)
            if ob_cols:
                pre = pre.withColumns(ob_cols)
        except Exception:
            ord_specs_pre = []
    if not ord_specs_pre:
        # no explicit ordering: the reference's sequential executor emits
        # heap order = insertion order = graphid order per label (expr.out
        # collect blocks pin it).  Order by the BOUND ENTITIES' ids in
        # match order — reproducible at any partition count — with the
        # input row position as the final tiebreak (and the sole key when
        # no entity is in scope)
        from .context import EDGE, VERTEX

        i = 0
        ob_cols = {}
        pre_cols = set(pre.columns)
        for name, b in env.bindings.items():
            if b.kind in (VERTEX, EDGE) and name in pre_cols:
                ob_cols[f"_ob{i}"] = F.col(name).getField("id")
                ord_specs_pre.append(True)
                i += 1
        ob_cols[f"_ob{i}"] = F.monotonically_increasing_id()
        ord_specs_pre.append(True)
        pre = pre.withColumns(ob_cols)
    arg_names: list[Optional[str]] = []
    aa_cols = {}
    aa_scope = ExprScope(ctx, pre, env)
    for j, node in enumerate(uniq):
        if node.args and not isinstance(node.args[0], A.Star):
            an = f"_aa{j}"
            aa_cols[an] = compile_expr(aa_scope, node.args[0])
            arg_names.append(an)
        else:
            arg_names.append(None)
    if aa_cols:
        pre = pre.withColumns(aa_cols)

    aggs = []
    for j, node in enumerate(uniq):
        arg_col = F.col(arg_names[j]) if arg_names[j] else None
        arg_dt = pre.schema[arg_names[j]].dataType if arg_names[j] else None
        if (
            node.name == "collect"
            and not node.distinct
            and ord_specs_pre
            and arg_col is not None
        ):
            aggs.append(
                _ordered_collect(arg_col, ord_specs_pre).alias(f"_a{j}")
            )
            continue
        aggs.append(_agg_column(ctx, node, arg_col, arg_dt).alias(f"_a{j}"))

    if key_idx:
        grouped = pre.groupBy(*[F.col(f"_k{i}") for i in key_idx]).agg(*aggs)
    else:
        grouped = pre.agg(*aggs)

    # 3) rewrite item/order ASTs onto the grouped columns
    helper_env = Env({})
    for i in key_idx:
        helper_env = helper_env.bind(Binding(f"_k{i}", SCALAR))
    for j in range(len(uniq)):
        helper_env = helper_env.bind(Binding(f"_a{j}", SCALAR))

    def _key_sub(x):
        for i in key_idx:
            if x == items[i].expr:
                return A.Var(f"_k{i}")
        return x

    # transform_expr rewrites BOTTOM-UP, so an aggregate's ARGUMENTS get
    # key-substituted before the aggregate node itself is compared — match
    # against both the original and the key-substituted spelling
    uniq_keyed = [transform_expr(u, _key_sub) for u in uniq]

    def rewrite(e):
        def fn(x):
            if isinstance(x, A.FuncCall) and x.name in AGG_FNS:
                for j, (u, uk) in enumerate(zip(uniq, uniq_keyed)):
                    if x == u or x == uk:
                        return A.Var(f"_a{j}")
            # references to a GROUPING item inside a mixed expression
            # (`RETURN n, CASE n.j WHEN 1 THEN count(*) ...`, expr.out:843)
            # read the grouped key column
            return _key_sub(x)

        return transform_expr(e, fn)

    scope_g = ExprScope(ctx, grouped, helper_env)
    final_cols = []
    for i, (it, alias) in enumerate(zip(items, aliases)):
        if i in key_idx:
            final_cols.append(F.col(f"_k{i}").alias(alias))
        else:
            final_cols.append(compile_expr(scope_g, rewrite(it.expr)).alias(alias))

    ord_specs = []
    for jo, ob in enumerate(order_by):
        expr = ob.expr
        c = None
        if isinstance(expr, A.Var):
            for i, a in enumerate(aliases):
                if a == expr.name:
                    c = F.col(f"_k{i}") if i in key_idx else compile_expr(scope_g, rewrite(items[i].expr))
                    break
        if c is None:
            for i, it in enumerate(items):
                if it.expr == expr:
                    c = F.col(f"_k{i}") if i in key_idx else compile_expr(scope_g, rewrite(it.expr))
                    break
        if c is None:
            c = compile_expr(scope_g, rewrite(expr))
        ord_specs.append((c, ob.asc))

    work = grouped.select(*final_cols, *[c.alias(f"_o{j}") for j, (c, _) in enumerate(ord_specs)])
    if ord_specs:
        work = work.orderBy(*_sort_cols(_expand_order_specs(
            work, [(F.col(f"_o{j}"), asc) for j, (_, asc) in enumerate(ord_specs)]
        )))
    out = work.select(*aliases)
    if distinct:
        out = out.distinct()

    new_env = Env({})
    for i, (it, alias) in enumerate(zip(items, aliases)):
        if i in key_idx:
            b = _binding_kind_of_item(env, out, it.expr, alias)
            new_env = new_env.bind(Binding(alias, b.kind, b.labels))
        else:
            new_env = new_env.bind(Binding(alias, _infer_kind(out.schema[alias].dataType)))
    return out, new_env


# ---------------------------------------------------------------- clauses


def compile_match(ctx: QueryContext, st: State, m: A.Match,
                  live: Optional[set] = None) -> State:
    if m.optional:
        return _compile_optional_match(ctx, st, m, live=live)
    if live is not None and m.where is not None:
        live = live | ast_strings(m.where)
    df, env, mst = compile_match_patterns(ctx, st.df, st.env, m.patterns, live=live)
    state = State(df, env)
    if m.where is not None:
        semi, anti, rest = _split_exists_conjuncts(m.where)
        for node, how in (
            [(n, "left_semi") for n in semi] + [(n, "left_anti") for n in anti]
        ):
            ns = _attach_exists_join(ctx, state, node, how)
            if ns is None:  # uncorrelated: keep the helper-column lane
                rest.append(node if how == "left_semi" else A.Unary("not", node))
            else:
                state = ns
        w_all = None
        for x in rest:
            w_all = x if w_all is None else A.Binary("and", w_all, x)
        if w_all is not None:
            state, w = lift_subqueries(ctx, state, w_all)
            scope = ExprScope(ctx, state.df, state.env)
            state = State(
                state.df.filter(compile_expr(scope, w).cast("boolean")), state.env
            )
    mst.df = state.df
    mst.drop_helpers()
    return State(mst.df, state.env)


def _compile_optional_match(ctx: QueryContext, st: State, m: A.Match,
                            live: Optional[set] = None) -> State:
    """OPTIONAL MATCH = LATERAL LEFT JOIN of the pattern
    (``transform_cypher_optional_match_clause``, ``cypher_clause.c:3995``).

    Correlation runs through the shared variables only, so we seed the
    optional side with the DISTINCT projection of those variables and left
    join the result back on entity ids — no row-id generation, deterministic
    under recomputation."""
    if st.df is None:
        # no prior rows: plain MATCH but preserving zero-row -> still zero
        return compile_match(ctx, st, A.Match(m.patterns, False, m.where), live=live)
    outer_vars = set(st.env.names())
    used = (pattern_vars(m.patterns) | (expr_vars(m.where) if m.where else set()))
    shared = sorted(v for v in used if v in outer_vars)

    seed = st.df.select(*[F.col(v) for v in shared]).distinct() if shared else None
    env_sub = Env({v: st.env.require(v) for v in shared})
    sub_live = None if live is None else (
        live | (ast_strings(m.where) if m.where is not None else set())
    )
    sub_df, sub_env, mst = compile_match_patterns(
        ctx, seed, env_sub, m.patterns, live=sub_live
    )
    sub_state = State(sub_df, sub_env)
    if m.where is not None:
        sub_state, w = lift_subqueries(ctx, sub_state, m.where)
        scope = ExprScope(ctx, sub_state.df, sub_state.env)
        sub_state = State(sub_state.df.filter(compile_expr(scope, w).cast("boolean")), sub_state.env)
    mst.df = sub_state.df
    mst.drop_helpers()
    sub_df = mst.df

    new_vars = [n for n in sub_state.env.names() if n not in shared and not n.startswith("_sq")]
    sel = []
    join_keys = []
    for v in shared:
        b = st.env.require(v)
        if b.kind in (VERTEX, EDGE):
            sel.append(F.col(v).getField("id").alias(f"_j_{v}"))
            join_keys.append((v, "id"))
        else:
            sel.append(F.col(v).alias(f"_j_{v}"))
            join_keys.append((v, None))
    for v in new_vars:
        sel.append(F.col(v))
    sub_out = sub_df.select(*sel)

    cond = None
    for v, fld in join_keys:
        left = F.col(v).getField(fld) if fld else F.col(v)
        c = left.eqNullSafe(F.col(f"_j_{v}"))
        cond = c if cond is None else (cond & c)
    if cond is None:
        # No shared vars: a left join on a constant-true condition IS a cross
        # join when the optional side has rows, and null-fills the new
        # columns when it is empty — one declarative plan, no driver-side
        # isEmpty() probes (the old eager probes ran the subquery twice at
        # compile time and a third time in the crossJoin).
        out = st.df.join(sub_out, F.lit(True), "left")
    else:
        out = st.df.join(sub_out, cond, "left").drop(*[f"_j_{v}" for v, _ in join_keys])

    env = st.env
    for v in new_vars:
        b = sub_state.env.require(v)
        env = env.bind(b)
    return State(out, env)


def compile_unwind(ctx: QueryContext, st: State, u: A.Unwind) -> State:
    from ..graph import is_tagged_type

    df = st.df if st.df is not None else _unit_df(ctx)
    scope = ExprScope(ctx, df, st.env)
    col = compile_expr(scope, u.expr)
    dt = df.select(col.alias("_uw")).schema["_uw"].dataType
    # age_unnest semantics (cypher_unwind.out): a list explodes to its
    # elements (empty -> no rows), but NULL and non-list scalars unnest to
    # THEMSELVES — one row each (`UNWIND NULL` -> one null row)
    if isinstance(dt, T.NullType):
        col = F.array(F.lit(None).cast("string"))
    elif is_tagged_type(dt):
        col = _unwind_tagged_elements(col)
    elif isinstance(dt, T.ArrayType):
        col = F.when(
            col.isNull(), F.array(F.lit(None).cast(dt.elementType))
        ).otherwise(col)
    elif not isinstance(dt, T.MapType):
        col = F.array(col)
    out = df.select("*", F.explode(col).alias(u.var))
    dt = out.schema[u.var].dataType
    env = st.env.bind(Binding(u.var, _infer_kind(dt)))
    return State(out, env)


def _unwind_tagged_elements(col: Column) -> Column:
    """Element array of a dynamic (tagged) value for UNWIND: array-kind
    payloads re-materialize per element with kinds preserved (VARIANT
    parse of the JSON payload, JVM-side, exprs.tagged_json_elements),
    scalar kinds and NULL unnest to themselves."""
    from ..graph import TAGGED_TYPE, let_column
    from .exprs import tagged_json_elements

    def _build(c: Column) -> Column:
        k = c.getField("__k")
        return (
            F.when(c.isNull(), F.array(F.lit(None).cast(TAGGED_TYPE)))
            .when(k == 4, tagged_json_elements(c))
            .otherwise(F.array(c))
        )

    return let_column(col, _build)


# ----------------------------------------------------------------- driver


def compile_single(ctx: QueryContext, q: A.SingleQuery) -> tuple[DataFrame, QueryContext]:
    from ..runtime import mutate

    st = State(None, Env({}))
    # Per-clause liveness for dead-node pruning: lives[i] = conservative
    # set of names clauses AFTER i may reference (None = a later RETURN */
    # WITH * keeps every binding observable -> pruning off).  ast_strings
    # over-collects (aliases, literals, keys), which only costs pruning
    # opportunities, never correctness.
    lives: list[Optional[set]] = [None] * len(q.clauses)
    acc: set = set()
    star_later = False
    for i in range(len(q.clauses) - 1, -1, -1):
        cl = q.clauses[i]
        lives[i] = None if star_later else set(acc)
        if isinstance(cl, (A.Return, A.With)) and cl.star:
            star_later = True
        ast_strings(cl, acc)
    returned = False
    effectful = False
    after_optional = False
    for idx, clause in enumerate(q.clauses):
        if isinstance(clause, (A.Create, A.SetClause, A.RemoveClause, A.Delete, A.Merge)):
            effectful = True
        if isinstance(clause, A.Match):
            if after_optional and not clause.optional:
                # the reference rejects MATCH after OPTIONAL MATCH inside
                # one reading block (cypher_match.sql:808 'this syntax is
                # invalid'); a WITH barrier resets the block
                raise CompileError("MATCH cannot follow OPTIONAL MATCH")
            after_optional = after_optional or clause.optional
            st = compile_match(ctx, st, clause, live=lives[idx])
        elif isinstance(clause, A.Unwind):
            st = compile_unwind(ctx, st, clause)
        elif isinstance(clause, A.With):
            after_optional = False
            st = compile_projection(
                ctx, st, clause.items, clause.distinct, clause.star,
                clause.order_by, clause.skip, clause.limit, clause.where, True,
            )
        elif isinstance(clause, A.Return):
            st = compile_projection(
                ctx, st, clause.items, clause.distinct, clause.star,
                clause.order_by, clause.skip, clause.limit, None, False,
            )
            returned = True
        elif isinstance(clause, A.Create):
            st, ctx = mutate.compile_create(ctx, st, clause)
        elif isinstance(clause, A.SetClause):
            st, ctx = mutate.compile_set(ctx, st, clause.items)
        elif isinstance(clause, A.RemoveClause):
            st, ctx = mutate.compile_remove(ctx, st, clause)
        elif isinstance(clause, A.Delete):
            st, ctx = mutate.compile_delete(ctx, st, clause)
        elif isinstance(clause, A.Merge):
            st, ctx = mutate.compile_merge(ctx, st, clause)
        elif isinstance(clause, A.CallProc):
            last = clause is q.clauses[-1]
            first = clause is q.clauses[0]
            st = compile_call(ctx, st, clause, is_last=last, is_first=first)
            if last:
                # a standalone CALL [YIELD] returns the procedure resultset
                # itself (cypher_call.sql `CALL sqrt(64)` -> 8.0); a trailing
                # CALL with a preceding clause already errored above
                returned = True
        else:
            raise CompileError(f"unsupported clause {type(clause).__name__}")
    if not returned:
        if not effectful:
            # a pure reading query must end in RETURN (the reference:
            # 'query must end with RETURN', cypher_match.sql:331)
            raise CompileError("query must end with a RETURN clause")
        # write-only query: execute side effects, return empty frame
        if st.df is not None:
            st.df.count()
        empty = ctx.spark.createDataFrame([], T.StructType([]))
        return empty, ctx
    return st.df, ctx


def compile_query(ctx: QueryContext, q: A.UnionQuery) -> tuple[DataFrame, QueryContext]:
    df, ctx = compile_single(ctx, q.parts[0])
    if len(q.parts) == 1:
        return df, ctx
    # UNION is positional with the FIRST branch's column names
    # (cypher_union.sql: `MATCH (n) RETURN n UNION RETURN 1` is valid), and
    # kind-preserving: int/float (or any cross-kind) branches merge into
    # tagged dynamic values, deduplicated by VALUE on the agtype ladder
    # (`1.0::int UNION 1::float` -> one row printing "1") with the earliest
    # branch's representative kept.
    # branch-ordinal column: fresh per query so a user column that happens
    # to be aliased "_ub" is never silently overwritten
    ub = ctx.fresh("_ub")
    df = df.withColumn(ub, F.lit(0))
    for bi, (part, keep_all) in enumerate(zip(q.parts[1:], q.alls), start=1):
        nxt, ctx = compile_single(ctx, part)
        if len(nxt.columns) != len(df.columns) - 1:
            raise CompileError(
                "UNION branches must return the same number of columns"
            )
        df = _union_positional(df, nxt.withColumn(ub, F.lit(bi)))
        if not keep_all:
            df = _union_distinct(df, ub)
    return df.drop(ub), ctx


def _union_positional(df: DataFrame, nxt: DataFrame) -> DataFrame:
    from ..graph import _widen, conform_col

    lnames = df.columns
    lcols, rcols = [], []
    for ln, rn in zip(lnames, nxt.columns):
        ldt = df.schema[ln].dataType
        rdt = nxt.schema[rn].dataType
        if ldt == rdt:
            lcols.append(F.col(ln))
            rcols.append(F.col(rn).alias(ln))
            continue
        tgt = _widen(ldt, rdt)
        lcols.append(conform_col(F.col(ln), ldt, tgt).alias(ln))
        rcols.append(conform_col(F.col(rn), rdt, tgt).alias(ln))
    return df.select(*lcols).unionByName(nxt.select(*rcols))


def _union_distinct(df: DataFrame, ub: str) -> DataFrame:
    from pyspark.sql.window import Window

    from ..graph import is_tagged_type, let_column, tagged_cmp_key_jvm

    data_cols = [c for c in df.columns if c != ub]
    if not any(is_tagged_type(df.schema[c].dataType) for c in data_cols):
        # plain distinct, but keep the smallest branch ordinal so later
        # tagged unions still see earliest-branch representatives
        return df.groupBy(*data_cols).agg(F.min(ub).alias(ub))
    keys = [
        let_column(F.col(c), lambda t: tagged_cmp_key_jvm(t))
        if is_tagged_type(df.schema[c].dataType)
        else F.col(c)
        for c in data_cols
    ]
    urn = ub + "_rn"  # derived from the fresh ordinal name, so also fresh
    w = Window.partitionBy(*keys).orderBy(F.col(ub), F.monotonically_increasing_id())
    return (
        df.withColumn(urn, F.row_number().over(w))
        .where(F.col(urn) == 1)
        .drop(urn)
    )


# -------------------------------------------------------------- CALL procs

PROCEDURES = {}


def procedure(name):
    def deco(f):
        PROCEDURES[name] = f
        return f
    return deco


def _sql_literal_arg(ctx: QueryContext, e) -> str:
    """Render a CALL argument as a SQL literal for a table-function
    invocation (only constants/params are CALL-able table-function args —
    the reference's SRF calls are likewise per-statement, not lateral)."""
    if isinstance(e, A.Param):
        v = (ctx.params or {})[e.name]
    elif isinstance(e, A.Lit):
        v = e.value
    elif isinstance(e, A.Unary) and e.op == "-" and isinstance(e.expr, A.Lit):
        v = -e.expr.value
    elif isinstance(e, A.ListLit):
        return "array(" + ", ".join(_sql_literal_arg(ctx, i) for i in e.items) + ")"
    else:
        raise CompileError(
            "table-function CALL arguments must be literals or parameters"
        )
    if v is None:
        return "NULL"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, list):
        return "array(" + ", ".join(
            _sql_literal_arg(ctx, A.Lit(x)) for x in v
        ) + ")"
    raise CompileError(f"cannot pass {type(v).__name__} to a table function")


def _call_spark_table_function(ctx: QueryContext, c: A.CallProc) -> DataFrame:
    """CALL fallthrough for names outside the @procedure registry: resolve
    against Spark-registered table functions (UDTFs via spark.udtf.register
    and SQL built-ins like range). Parity: the reference CALLs ANY
    set-returning SQL function (cypher_gram.y:436-553,
    regress/sql/cypher_call.sql), its scalar twin being the external-
    function fallthrough already in exprs.py."""
    import re

    name = c.name
    if not re.fullmatch(r"[A-Za-z_][A-Za-z0-9_.]*", name):
        raise CompileError(f"unknown procedure {name}")
    try:
        known = ctx.spark.catalog.functionExists(name)
    except Exception:
        known = False
    if not known:
        raise CompileError(f"unknown procedure {name}")
    arg_sql = ", ".join(_sql_literal_arg(ctx, a) for a in c.args)
    return ctx.spark.sql(f"SELECT * FROM {name}({arg_sql})")  # noqa: S608 — name validated, args rendered as literals


def _call_scalar_fallthrough(ctx: QueryContext, c: A.CallProc):
    """CALL of a scalar function (cypher_call.sql): the reference resolves
    ANY PG function by (optionally schema-qualified) name and runs it as a
    one-row procedure whose single output column is the function's name as
    WRITTEN (last path segment — `CALL ag_catalog.age_sqrt(64)` yields
    `age_sqrt`).  Resolution mirrors the PG lookup against the Cypher
    registry: drop an ag_catalog qualifier, try the name and its age_
    SQL-prefix-stripped form.  Returns (None, None) when unresolvable so
    the table-function fallthrough can try next."""
    from .exprs import FUNCTIONS

    parts = c.name.split(".")
    if len(parts) > 2 or (len(parts) == 2 and parts[0] != "ag_catalog"):
        return None, None
    last = parts[-1]
    cand = None
    for nm in (last.lower(), last.lower().removeprefix("age_")):
        if nm in FUNCTIONS:
            cand = nm
            break
    if cand is None:
        return None, None
    unit = _unit_df(ctx)
    scope = ExprScope(ctx, unit, Env({}))
    col = compile_expr(scope, A.FuncCall(cand, list(c.args)))
    return unit.select(col.alias(last)), last


def compile_call(
    ctx: QueryContext, st: State, c: A.CallProc,
    is_last: bool = True, is_first: bool = True,
) -> State:
    from ..runtime import procedures as _procs  # registers built-ins

    # rule set of transform_cypher_call_stmt (cypher_clause.c:1268-1318),
    # checked BEFORE procedure resolution exactly as the reference does:
    # standalone (!prev && !next) CALL rejects only WHERE; a CALL inside a
    # larger query must name outputs with YIELD and cannot be the final
    # clause (regardless of WHERE)
    if is_first and is_last:
        if c.where is not None:
            raise CompileError("Cannot use standalone CALL with WHERE")
    else:
        if not c.yield_items:
            raise CompileError(
                "Procedure call inside a query does not support naming results implicitly"
            )
        if is_last:
            raise CompileError("Query cannot conclude with CALL")

    impl = PROCEDURES.get(c.name.lower())
    if impl is not None:
        scope = ExprScope(ctx, st.df if st.df is not None else _unit_df(ctx), st.env)
        args = [compile_expr(scope, a) for a in c.args]
        out = impl(ctx, c.args, args)
    else:
        # scalar registry first, then Spark table functions; a scalar-path
        # failure (e.g. CALL range(3) — Cypher range() needs 2 args but
        # SQL's TVF range takes 1) falls through to the TVF, and the
        # scalar's error is re-raised only when the TVF cannot resolve the
        # name either
        scalar_err = None
        try:
            out, _ = _call_scalar_fallthrough(ctx, c)
        except Exception as ex:  # noqa: BLE001 — diagnostic fallback chain
            out, scalar_err = None, ex
        if out is None:
            try:
                out = _call_spark_table_function(ctx, c)
            except Exception:
                if scalar_err is not None:
                    raise scalar_err
                raise
    # rename procedure outputs to internal names so a second CALL of the
    # same function (CALL sqrt(64) ... CALL sqrt(81) YIELD sqrt AS sqrt1)
    # never collides at the join
    mapping = {}
    for f in out.schema.fields:
        fresh = ctx.fresh("_call")
        mapping[f.name] = fresh
        out = out.withColumnRenamed(f.name, fresh)
    joined = st.df.crossJoin(F.broadcast(out)) if st.df is not None else out
    if not c.yield_items:
        # standalone CALL: the procedure's resultset IS the query result
        sel = [F.col(v).alias(k) for k, v in mapping.items()]
        env = st.env
        for k in mapping:
            if env.get(k) is not None:
                raise CompileError(f'duplicate variable "{k}"')
            env = env.bind(Binding(k, _infer_kind(out.schema[mapping[k]].dataType)))
        return State(joined.select(*sel), env)
    sel = [F.col(k) for k in (st.df.columns if st.df is not None else [])]
    env = st.env
    for it in c.yield_items:
        if not isinstance(it.expr, A.Var) or it.expr.name not in mapping:
            raise CompileError("Unknown CALL output")
        nm = it.alias or it.expr.name
        if env.get(nm) is not None:
            raise CompileError(f'duplicate variable "{nm}"')
        sel.append(F.col(mapping[it.expr.name]).alias(nm))
        env = env.bind(
            Binding(nm, _infer_kind(out.schema[mapping[it.expr.name]].dataType))
        )
    df2 = joined.select(*sel)
    state = State(df2, env)
    if c.where is not None:
        scope = ExprScope(ctx, df2, env)
        state = State(df2.filter(compile_expr(scope, c.where).cast("boolean")), env)
    return state
