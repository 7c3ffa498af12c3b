"""Cypher expression -> native Spark Column compiler.

Mirrors the surface of the reference's expression layer
(``src/backend/parser/cypher_expr.c`` + the ``age_*`` function bodies in
``src/backend/utils/adt/agtype.c`` — see SURVEY §2.8) but compiles to
**native Column expressions** so everything stays inside whole-stage codegen.
Where the reference evaluates one universal dynamic type (agtype) at runtime,
we do lightweight static type dispatch at compile time via the DataFrame's
resolved schema (``dtype_of``): the hot path never leaves the JVM and never
parses JSON.

Non-standard semantics pinned by the reference's regression suite
(``regress/sql/expr.sql``) and kept here:
  - ``substring``/``left``/``right`` are 0-based (``agtype.c:9181``)
  - ``range(a, b[, step])`` is inclusive of b (``agtype.c:12937``)
  - ``split`` uses a literal (non-regex) delimiter (``agtype.c:9399``)
  - list index is 0-based, negatives count from the end; slices clamp
    (``agtype.c:4452, 4766``)
  - int/int division truncates (PG semantics)
"""

from __future__ import annotations

import re as _re
from dataclasses import dataclass, field
from typing import Callable, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..cypher import ast as A
from .context import EDGE, EDGE_LIST, PATH, SCALAR, VERTEX, Binding, CompileError, Env, QueryContext

# ------------------------------------------------------------------- scope


@dataclass
class ExprScope:
    ctx: QueryContext
    df: Optional[DataFrame]
    env: Env
    lambda_vars: dict[str, Column] = field(default_factory=dict)
    lambda_types: dict[str, T.DataType] = field(default_factory=dict)

    def child(self, more_vars: dict[str, Column], more_types: dict[str, T.DataType]) -> "ExprScope":
        lv = dict(self.lambda_vars)
        lv.update(more_vars)
        lt = dict(self.lambda_types)
        lt.update(more_types)
        return ExprScope(self.ctx, self.df, self.env, lv, lt)


def dtype_of(scope: ExprScope, col: Column) -> Optional[T.DataType]:
    """Resolve a Column's static type against the current DataFrame (driver-
    side schema-only analysis; no job runs). None if unresolvable (e.g.,
    references a lambda variable)."""
    try:
        df = scope.df
        if df is None:
            df = scope.ctx.spark.range(1)
        return df.select(col.alias("_t")).schema[0].dataType
    except Exception:
        return None


# ------------------------------------------------- literals & params


def literal_to_column(value) -> Column:
    if isinstance(value, dict):
        if not value:
            return F.struct(F.lit(None).cast("string").alias("_none"))
        return F.struct(*[literal_to_column(v).alias(k) for k, v in value.items()])
    if isinstance(value, (list, tuple)):
        if not value:
            return F.expr("array()")
        return F.array(*[literal_to_column(v) for v in value])
    if isinstance(value, int) and not isinstance(value, bool) and not (
        -(2**63) <= value <= 2**63 - 1
    ):
        # agtype integers are int64 (agtype.out: 'value "9223372036854775808"
        # is out of range for type bigint')
        raise CompileError(f'value "{value}" is out of range for type bigint')
    return F.lit(value)


# ------------------------------------------------------------- aggregates

AGG_FNS = {
    "count", "sum", "avg", "min", "max", "collect", "stdev", "stdevp",
    "percentilecont", "percentiledisc",
}


def contains_aggregate(e) -> bool:
    found = False

    def walk(x):
        nonlocal found
        if found or x is None:
            return
        if isinstance(x, A.FuncCall):
            if x.name in AGG_FNS:
                found = True
                return
            for a in x.args:
                walk(a)
        elif isinstance(x, A.Unary):
            walk(x.expr)
        elif isinstance(x, A.Binary):
            walk(x.left); walk(x.right)
        elif isinstance(x, A.Prop):
            walk(x.expr)
        elif isinstance(x, A.Index):
            walk(x.expr); walk(x.index)
        elif isinstance(x, A.Slice):
            walk(x.expr); walk(x.lo); walk(x.hi)
        elif isinstance(x, A.ListLit):
            for a in x.items:
                walk(a)
        elif isinstance(x, A.MapLit):
            for _, v in x.items:
                walk(v)
        elif isinstance(x, A.IsNull):
            walk(x.expr)
        elif isinstance(x, A.CaseExpr):
            walk(x.operand)
            for c, r in x.whens:
                walk(c); walk(r)
            walk(x.default)
        elif isinstance(x, A.ListComp):
            walk(x.source); walk(x.where); walk(x.projection)
        elif isinstance(x, A.PredFn):
            walk(x.source); walk(x.where)
        elif isinstance(x, A.Reduce):
            walk(x.init); walk(x.source); walk(x.expr)

    walk(e)
    return found


# --------------------------------------------------------------- numerics

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_NUMERIC = _INTEGRAL + (T.FloatType, T.DoubleType, T.DecimalType)


def _is_integral(dt) -> bool:
    return isinstance(dt, _INTEGRAL)


def _is_string(dt) -> bool:
    return isinstance(dt, T.StringType)


def _is_array(dt) -> bool:
    return isinstance(dt, T.ArrayType)


def _is_struct(dt) -> bool:
    return isinstance(dt, T.StructType)


def _is_map(dt) -> bool:
    return isinstance(dt, T.MapType)


def _entity_fields(dt: T.StructType) -> set[str]:
    return {f.name for f in dt.fields}


# ---------------------------------------------------------------- compile


def compile_expr(scope: ExprScope, e: A.Expr) -> Column:
    if isinstance(e, A.Lit):
        if e.value is None:
            return F.lit(None)
        return literal_to_column(e.value)
    if isinstance(e, A.Param):
        # the reference distinguishes NO parameter argument (error at any
        # $ref, expr.out:73) from a SUPPLIED map missing the key (NULL —
        # `RETURN $var, $missingvar` with '{"var": 1}' prints `1 |`)
        if scope.ctx.params is None:
            raise CompileError(
                "parameters argument is missing from cypher() function call"
            )
        if not isinstance(scope.ctx.params, dict):
            # a non-map parameters value: $name keys into it like a
            # container access — an ARRAY rejects the string key
            # (expr.out EXECUTE ... ('[1]') block)
            raise CompileError("array index must resolve to an integer value")
        if e.name not in scope.ctx.params:
            return F.lit(None)
        return literal_to_column(scope.ctx.params[e.name])
    if isinstance(e, A.Var):
        if e.name in scope.lambda_vars:
            return scope.lambda_vars[e.name]
        scope.env.require(e.name)
        return F.col(e.name)
    if isinstance(e, A.Prop):
        return _compile_prop(scope, e)
    if isinstance(e, A.Index):
        return _compile_index(scope, e)
    if isinstance(e, A.Slice):
        return _compile_slice(scope, e)
    if isinstance(e, A.ListLit):
        if not e.items:
            return F.expr("array()")
        cols = [compile_expr(scope, i) for i in e.items]
        dts = [dtype_of(scope, c) for c in cols]
        kinds = set()
        for dt in dts:
            if dt is None or isinstance(dt, T.NullType):
                continue
            from ..graph import (
                _INT_TYPES,
                _container_kind,
                _entity_kind,
                _scalar_kind,
                is_tagged_type,
            )

            if is_tagged_type(dt):
                k = "tagged"
            else:
                # entities are taggable kinds too ([1, u] with a vertex u —
                # list_comprehension.sql:109)
                k = (
                    _scalar_kind(dt)
                    or _entity_kind(dt)
                    or _container_kind(dt)
                    or "other"
                )
            if k == "numeric":
                # int and float are distinct agtype kinds (agtype.h:307):
                # [1, 2.5] element-tags so 1 stays an exact, bare-printing int
                k = "int" if isinstance(dt, _INT_TYPES) else "float"
            kinds.add(k)
        if kinds == {"vertex", "edge"}:
            # vertex/edge mix stays CONCRETE via field union (vertices get
            # a null start_id) — the shape ::path consumes (expr.out ::path
            # literals); tagging would JSON-freeze the entities
            from ..graph import _widen, conform_col

            fields: dict = {}
            order: list[str] = []
            for dt2 in dts:
                for f2 in dt2.fields:
                    if f2.name in fields:
                        fields[f2.name] = _widen(fields[f2.name], f2.dataType)
                    else:
                        fields[f2.name] = f2.dataType
                        order.append(f2.name)
            target = T.StructType(
                [T.StructField(nm, fields[nm], True) for nm in order]
            )
            return F.array(
                *[conform_col(c, dt2, target) for c, dt2 in zip(cols, dts)]
            )
        if len(kinds - {"other"}) > 1 and "other" not in kinds:
            # heterogeneous scalar literal list ([1, 'a', true] — agtype is
            # dynamically typed, agtype.h:307): element-tag so one Spark
            # array type holds every kind, ladder-ordered
            from ..graph import TAGGED_TYPE, is_tagged_type, tag_column

            tagged = [
                F.lit(None).cast(TAGGED_TYPE)
                if dt is None or isinstance(dt, T.NullType)
                else tag_column(c, dt)
                for c, dt in zip(cols, dts)
            ]
            return F.array(*tagged)
        if kinds == {"object"}:
            # list of objects with differing shapes ([{b: true}, {a: 1}]):
            # one Spark array type needs one struct schema, so tag each
            # object (the order key keeps element-wise object comparison)
            from ..graph import TAGGED_TYPE, tag_column

            shapes = {
                dt.simpleString() for dt in dts
                if dt is not None and not isinstance(dt, T.NullType)
            }
            if len(shapes) > 1:
                return F.array(
                    *[
                        F.lit(None).cast(TAGGED_TYPE)
                        if dt is None or isinstance(dt, T.NullType)
                        else tag_column(c, dt)
                        for c, dt in zip(cols, dts)
                    ]
                )
        if kinds == {"array"}:
            # list of lists whose ELEMENT types disagree (e.g.
            # [[1, 'string'], [1, 1]] — the first is element-tagged, the
            # second concrete): lift every inner list to array<tagged> so
            # the outer array has one type
            from ..graph import TAGGED_TYPE, is_tagged_type, tag_column

            ets = [
                dt.elementType if isinstance(dt, T.ArrayType) else None
                for dt in dts
            ]
            concrete = set(
                et.simpleString() for et in ets
                if et is not None and not isinstance(et, T.NullType)
            )
            if len(concrete) > 1:
                def _lift(src):
                    # closure factory: a default-arg lambda would read as a
                    # 2-ary (value, index) transform lambda to PySpark
                    if src is None or isinstance(src, T.NullType):
                        return lambda x: F.lit(None).cast(TAGGED_TYPE)
                    return lambda x: tag_column(x, src)

                lifted = []
                for c, dt, et in zip(cols, dts, ets):
                    if dt is None or isinstance(dt, T.NullType):
                        lifted.append(F.lit(None).cast(T.ArrayType(TAGGED_TYPE)))
                    elif et is not None and is_tagged_type(et):
                        lifted.append(c)
                    else:
                        lifted.append(F.transform(c, _lift(et)))
                return F.array(*lifted)
        return F.array(*cols)
    if isinstance(e, A.MapLit):
        if not e.items:
            return F.struct(F.lit(None).cast("string").alias("_none"))
        # duplicate keys: the LAST occurrence wins (jsonb object semantics;
        # agtype.out `{ a:'aa', b:'bb', b:'xx' }` keeps b:'xx')
        dedup: dict = {}
        for k, v in e.items:
            dedup[k] = v
        return F.struct(*[compile_expr(scope, v).alias(k) for k, v in dedup.items()])
    if isinstance(e, A.MapProjection):
        return _compile_map_projection(scope, e)
    if isinstance(e, A.Unary):
        c = compile_expr(scope, e.expr)
        if e.op == "not":
            from ..graph import _scalar_kind, is_tagged_type

            sdt = _operand_dtype(scope, e.expr, c)
            if sdt is not None and not isinstance(sdt, (T.NullType, T.BooleanType)):
                if is_tagged_type(sdt):
                    return ~c.getField("__b")
                k = _scalar_kind(sdt)
                if k in ("numeric", "string"):
                    # expr.out:156 `NOT 1` errors like AND/OR operands
                    kindname = "integer" if k == "numeric" else "string"
                    raise CompileError(
                        f"cannot cast agtype {kindname} to type boolean"
                    )
            return ~c.cast("boolean")
        if e.op == "-":
            sdt = _operand_dtype(scope, e.expr, c)
            from ..graph import is_tagged_type as _itt2

            if sdt is not None and _itt2(sdt):
                # negate a dynamic numeric by slots: exact int, exact
                # decimal text (sign toggle; -NaN stays NaN), float via __n
                from ..graph import ORDER_KEY_TYPE as _OKT
                from ..graph import TAGGED_TYPE as _TT

                d = c.getField("__d")
                negd = (
                    F.when(d == "NaN", d)
                    .when(d.startswith("-"), F.substring(d, 2, 2147483647))
                    .otherwise(F.concat(F.lit("-"), d))
                )
                neg = F.struct(
                    c.getField("__k").alias("__k"),
                    (-c.getField("__n")).alias("__n"),
                    (-c.getField("__i")).alias("__i"),
                    negd.alias("__d"),
                    F.lit(None).cast("string").alias("__s"),
                    F.lit(None).cast("boolean").alias("__b"),
                    F.lit(None).cast(_OKT).alias("__o"),
                    F.lit(None).cast("string").alias("__j"),
                )
                return F.when(
                    c.isNull() | (c.getField("__k") != 7), F.lit(None).cast(_TT)
                ).otherwise(neg)
            return -c
        return c
    if isinstance(e, A.Binary):
        return _compile_binary(scope, e)
    if isinstance(e, A.IsNull):
        c = compile_expr(scope, e.expr)
        return c.isNotNull() if e.negated else c.isNull()
    if isinstance(e, A.CaseExpr):
        return _compile_case(scope, e)
    if isinstance(e, A.ListComp):
        return _compile_listcomp(scope, e)
    if isinstance(e, A.PredFn):
        return _compile_predfn(scope, e)
    if isinstance(e, A.Reduce):
        return _compile_reduce(scope, e)
    if isinstance(e, A.FuncCall):
        return _compile_func(scope, e)
    if isinstance(e, (A.ExistsSubquery, A.CountSubquery, A.PatternPred)):
        raise CompileError(
            "pattern/EXISTS subquery must be lifted before expression compilation"
        )
    raise CompileError(f"unsupported expression: {type(e).__name__}")


# ---- property access


def _tagged_container_access(c: Column, path: str) -> Column:
    """x.key / x[i] where x is a tagged dynamic value whose row holds an
    object/array kind: navigate the __j JSON payload with Spark's VARIANT
    functions and re-tag the extracted value (kind from schema_of_variant,
    int/float distinction preserved — JSON keeps the '.0'). The access
    operator over dynamic containers mirrors agtype_access_operator
    (agtype.c:4482). Stays JVM-side; no Python."""
    from ..graph import ORDER_KEY_TYPE, TAGGED_TYPE, let_column

    def _from_variant(v: Column) -> Column:
        from ..graph import FLOAT_SENTINEL, NUM_SENTINEL

        sch = F.schema_of_variant(v)
        is_int = sch.isin("TINYINT", "SMALLINT", "INT", "BIGINT")
        is_float = sch.startswith("DECIMAL") | sch.isin("DOUBLE", "FLOAT")
        is_str = sch == F.lit("STRING")
        is_bool = sch == F.lit("BOOLEAN")
        is_arr = sch.startswith("ARRAY")
        is_obj = sch.startswith("OBJECT") | sch.startswith("STRUCT") | sch.startswith("MAP")
        # NUMERIC / FLOAT values ride container payloads as sentinel
        # strings (graph.py NUM_SENTINEL/FLOAT_SENTINEL): decode back to
        # their kinds — exact digits for numeric, float8 for float
        sval = F.try_variant_get(v, "$", "string")
        is_sent = is_str & sval.startswith(NUM_SENTINEL)
        is_fsent = is_str & sval.startswith(FLOAT_SENTINEL)
        dtext = sval.substr(F.lit(len(NUM_SENTINEL) + 1), F.length(sval))
        k = (
            F.when(is_obj, 3).when(is_arr, 4).when(is_sent | is_fsent, 7)
            .when(is_str, 5).when(is_bool, 6).when(is_int | is_float, 7)
        ).cast("tinyint")
        tagged = F.struct(
            k.alias("__k"),
            F.when(is_sent | is_fsent, dtext.cast("double"))
            .when(is_int | is_float, F.try_variant_get(v, "$", "double"))
            .alias("__n"),
            F.when(is_int, F.try_variant_get(v, "$", "long")).alias("__i"),
            F.when(is_sent, dtext).alias("__d"),
            F.when(is_str & ~is_sent & ~is_fsent, sval).alias("__s"),
            F.when(is_bool, F.try_variant_get(v, "$", "boolean")).alias("__b"),
            F.lit(None).cast(ORDER_KEY_TYPE).alias("__o"),
            F.when(is_obj | is_arr, F.to_json(v)).alias("__j"),
        )
        return F.when(
            v.isNull() | (sch == F.lit("VOID")), F.lit(None).cast(TAGGED_TYPE)
        ).otherwise(tagged)

    # bind the base and the extracted variant each exactly once: chained
    # accesses stay linear in tree size instead of exponential
    return let_column(
        c,
        lambda cc: let_column(
            F.try_variant_get(F.parse_json(cc.getField("__j")), path, "variant"),
            _from_variant,
        ),
    )


def _deref_entity(scope: ExprScope, base: Column, dt: T.DataType, key: str) -> Column:
    """x.key where x is a struct: entity structs ALWAYS deref into their
    properties object — `n.id` is the PROPERTY named id, never the graphid
    (``agtype_access_operator`` extracts pairs[2]/pairs[4] = properties for
    vertex/edge before the map access, ``agtype.c:4556-4564``; structural
    fields are reachable via id()/startNode()/... functions only)."""
    if _is_tagged(dt):
        if _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", key):
            return _tagged_container_access(base, f"$.{key}")
        return F.lit(None)
    if _is_struct(dt):
        names = _entity_fields(dt)
        if "properties" in names and "id" in names:
            pdt = next(f.dataType for f in dt.fields if f.name == "properties")
            if _is_struct(pdt) and key in _entity_fields(pdt):
                return base.getField("properties").getField(key)
            return F.lit(None)
        if key in names:
            return base.getField(key)
        return F.lit(None)
    if _is_map(dt):
        return base.getItem(key)
    return F.lit(None)


def _compile_prop(scope: ExprScope, e: A.Prop) -> Column:
    base = compile_expr(scope, e.expr)
    dt = None
    if isinstance(e.expr, A.Var) and e.expr.name in scope.lambda_types:
        dt = scope.lambda_types[e.expr.name]
    else:
        dt = dtype_of(scope, base)
    if dt is None:
        # unresolvable (lambda without type hint): best-effort struct access
        return base.getField(e.key)
    return _deref_entity(scope, base, dt, e.key)


def _compile_index(scope: ExprScope, e: A.Index) -> Column:
    base = compile_expr(scope, e.expr)
    idx = compile_expr(scope, e.index)
    dt = dtype_of(scope, base)
    if dt is not None and _is_tagged(dt):
        # dynamic container subscript: constant paths navigate the JSON
        # payload (variant); others are unresolvable per-row kinds -> null
        if isinstance(e.index, A.Lit) and isinstance(e.index.value, str):
            if _re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", e.index.value):
                return _tagged_container_access(base, f"$.{e.index.value}")
            return F.lit(None)
        # int indexes (literal or dynamic): materialize the element array
        # (kinds preserved) and index it — scalar payloads self-index at
        # 0/-1 (expr.out l[2][-2]; jsonb_operators.out ->'float'->0)
        from ..graph import TAGGED_TYPE, let_column

        def _idx(c):
            elems = tagged_json_elements(c)
            i = idx.cast("int")
            picked = F.when(i >= 0, F.get(elems, i)).otherwise(
                F.get(elems, F.size(elems) + i)
            )
            k = c.getField("__k")
            out = F.when(k == 4, picked)
            if getattr(e, "arrow", False):
                # `->` indexes a scalar like a one-element list: 0 / -1
                # return the value itself (jsonb_operators.out:63)
                out = out.when((k >= 5) & ((i == 0) | (i == -1)), c)
            return out.otherwise(F.lit(None).cast(TAGGED_TYPE))

        return let_column(base, _idx)
    if dt is not None and _is_map(dt):
        return F.element_at(base, idx)
    if dt is not None and _is_struct(dt):
        if isinstance(e.index, A.Lit) and isinstance(e.index.value, str):
            return _deref_entity(scope, base, dt, e.index.value)
        if isinstance(e.index, A.Lit) or isinstance(e.index, A.Unary):
            # int subscript into an object: no match, null (jsonb `->`)
            return F.lit(None)
        raise CompileError("struct subscript requires a constant string key")
    if dt is not None and not isinstance(dt, (T.ArrayType, T.NullType)):
        # the jsonb `->` spelling treats a scalar as a one-element list
        # (index 0 / -1 returns it, jsonb_operators.out:63); a bracket
        # SUBSCRIPT on a scalar is an error (expr.out:996)
        if not getattr(e, "arrow", False):
            raise CompileError(
                "A_indirection could not convert the scalar to a container"
            )
        i0 = idx.cast("int")
        return F.when((i0 == 0) | (i0 == -1), base)
    if (
        dt is not None
        and isinstance(dt, T.ArrayType)
        and isinstance(e.index, A.Lit)
        and isinstance(e.index.value, str)
    ):
        return F.lit(None)  # string key into a list: null
    # list: 0-based, negative counts from end (agtype.c:4452)
    i = idx.cast("int")
    return F.when(i >= 0, F.get(base, i)).otherwise(F.get(base, F.size(base) + i))


def _compile_slice(scope: ExprScope, e: A.Slice) -> Column:
    base = compile_expr(scope, e.expr)
    bdt = dtype_of(scope, base)
    if bdt is not None and _is_tagged(bdt):
        # slice of a dynamic list: materialize the element array, slice it,
        # and keep the result an array<tagged> (expr.out l[2][-2..])
        from ..graph import TAGGED_TYPE, let_column

        def _sl(c):
            elems = tagged_json_elements(c)
            return F.when(c.getField("__k") == 4, _slice_array(scope, e, elems)).otherwise(
                F.lit(None).cast(T.ArrayType(TAGGED_TYPE))
            )

        return let_column(base, _sl)
    return _slice_array(scope, e, base)


def _slice_array(scope: ExprScope, e: A.Slice, base: Column) -> Column:
    n = F.size(base)
    # clamp bounds into int range BEFORE the int cast — a literal like
    # -2147483649 must clamp, not overflow (expr.out:62)
    lo = (
        _clamp_i32(compile_expr(scope, e.lo)) if e.lo is not None else F.lit(0)
    )
    hi = _clamp_i32(compile_expr(scope, e.hi)) if e.hi is not None else n
    lo = F.when(lo < 0, F.greatest(n + lo, F.lit(0))).otherwise(F.least(lo, n))
    hi = F.when(hi < 0, F.greatest(n + hi, F.lit(0))).otherwise(F.least(hi, n))
    length = F.greatest(hi - lo, F.lit(0))
    return F.slice(base, lo + 1, length)


def _clamp_i32(col: Column) -> Column:
    lo, hi = -(2**31), 2**31 - 1
    c = col.cast("long")
    return F.least(F.greatest(c, F.lit(lo)), F.lit(hi)).cast("int")


def _compile_map_projection(scope: ExprScope, e: A.MapProjection) -> Column:
    b = scope.env.require(e.var)
    base = F.col(e.var)
    dt = dtype_of(scope, base)
    # base-type validation (map_projection.out:14-15 error parity)
    if dt is not None and isinstance(dt, T.NullType):
        # NULL base projects to the empty object (map_projection.out:11)
        return F.struct(F.lit(None).cast("string").alias("_none"))
    if dt is not None and isinstance(dt, T.ArrayType):
        raise CompileError("properties() argument must resolve to an object")
    if dt is not None and not _is_struct(dt) and not isinstance(dt, T.MapType):
        raise CompileError("properties() argument must be a vertex, an edge or null")
    # EXPLICIT entries (key:expr, bare variables) always win over `.*`,
    # regardless of their order in the projection
    # (map_projection.out: `map { name:'Tom', .* }` keeps name = 'Tom')
    fields: dict[str, Column] = {}
    for kind, payload in e.items:
        if kind == "prop":
            fields.setdefault(payload, _deref_entity(scope, base, dt, payload).alias(payload))
        elif kind == "var":
            fields[payload] = F.col(payload).alias(payload)
        elif kind == "expr":
            key, sub = payload
            fields[key] = compile_expr(scope, sub).alias(key)
    for kind, payload in e.items:
        if kind != "all":
            continue
        pdt = dt
        if b.kind in (VERTEX, EDGE) and _is_struct(dt):
            base_p = base.getField("properties")
            pdt = next(f.dataType for f in dt.fields if f.name == "properties")
            for f2 in pdt.fields:
                if f2.name != "_none":
                    fields.setdefault(f2.name, base_p.getField(f2.name).alias(f2.name))
        elif _is_struct(pdt):
            for f2 in pdt.fields:
                fields.setdefault(f2.name, base.getField(f2.name).alias(f2.name))
    if not fields:
        return F.struct(F.lit(None).cast("string").alias("_none"))
    return F.struct(*fields.values())






# ---- binary ops


def _as_tagged_array(arr: Column, et) -> Column:
    from ..graph import TAGGED_TYPE, is_tagged_type, tag_column

    if et is not None and is_tagged_type(et):
        return arr
    if et is None or isinstance(et, T.NullType):
        return F.transform(arr, lambda x: F.lit(None).cast(TAGGED_TYPE))
    return F.transform(arr, lambda x: tag_column(x, et))


def _compile_path_extract(scope: ExprScope, e: A.Binary, l: Column, as_text: bool) -> Column:
    """`#>` / `#>>` — extract at a constant path list (agtype_ops.c:2024,
    `#>>` returns the value as text; regress jsonb_operators `#>` block):
    int elements index arrays (negatives count from the end), strings key
    into objects, an empty path returns the operand, and any mis-typed
    path element or walk off the value yields NULL."""
    if not isinstance(e.right, A.ListLit):
        raise CompileError("#> requires a constant path list")
    from ..graph import _entity_kind, _scalar_kind, _strip_nullability

    cur = e.left
    dt = dtype_of(scope, l)
    if dt is not None and _scalar_kind(_strip_nullability(dt)) is not None:
        # a non-entity scalar has no paths (jsonb_operators.out:122)
        raise CompileError("scalar object must be a vertex or edge")
    if dt is not None and _entity_kind(_strip_nullability(dt)) in ("vertex", "edge"):
        # entities path-extract through their properties object
        # (jsonb_operators.out: `n #> []` prints the properties)
        cur = A.FuncCall("properties", [cur])
        dt = next(
            f.dataType for f in _strip_nullability(dt).fields if f.name == "properties"
        )
    for step in e.right.items:
        # unary minus arrives as Unary("-", Lit): negative array indexes
        if isinstance(step, A.Unary) and step.op == "-" and isinstance(step.expr, A.Lit) \
                and isinstance(step.expr.value, int):
            step = A.Lit(-step.expr.value)
        if isinstance(step, A.Lit) and isinstance(step.value, str) and (
            dt is None or isinstance(dt, T.ArrayType) or _is_tagged(dt)
        ) and _re.fullmatch(r"-?\d+", step.value):
            # a numeric STRING step indexes arrays ("-1" — the reference
            # coerces path text to an index, jsonb_operators.out:93)
            step = A.Lit(int(step.value))
        if isinstance(step, A.Lit) and isinstance(step.value, bool):
            return F.lit(None)
        if isinstance(step, A.Lit) and isinstance(step.value, int):
            if not (dt is None or isinstance(dt, T.ArrayType) or _is_tagged(dt)):
                return F.lit(None)  # int step into a non-array
            cur = A.Index(cur, step)
            dt = dt.elementType if isinstance(dt, T.ArrayType) else None
        elif isinstance(step, A.Lit) and isinstance(step.value, str):
            ok = dt is None or _is_tagged(dt) or _is_map(dt) or (
                isinstance(dt, T.StructType)
            )
            if not ok:
                return F.lit(None)  # string step into a non-object
            cur = A.Index(cur, step)
            if isinstance(dt, T.StructType):
                dt = dt[step.value].dataType if step.value in {f.name for f in dt.fields} else T.NullType()
            elif _is_map(dt):
                dt = dt.valueType
            else:
                dt = None
        else:
            return F.lit(None)  # non-int/string path element (e.g. [{}])
        if isinstance(dt, T.NullType):
            return F.lit(None)
    out = compile_expr(scope, cur)
    if as_text:
        dt = dtype_of(scope, out)
        if _is_tagged(dt):
            return _tagged_to_string(out)
        return out.cast("string")
    return out


def _compile_concat_op(scope: ExprScope, e: A.Binary, l: Column, r: Column) -> Column:
    """`||` — jsonb-style agtype concatenation (agtype_concat_impl,
    agtype_ops.c:1761; regress/sql/jsonb_operators.sql concat block):
    object||object merges (right wins), array||array concatenates,
    array||anything appends it as an element, scalar||array prepends,
    scalar||scalar builds a 2-element array; object on only ONE side of a
    non-object is an error."""
    from ..graph import TAGGED_TYPE, _container_kind, is_tagged_type, tag_column

    ldt = _operand_dtype(scope, e.left, l)
    rdt = _operand_dtype(scope, e.right, r)
    if isinstance(ldt, T.NullType) or isinstance(rdt, T.NullType):
        return F.lit(None)

    def kind_of(dt):
        if dt is None:
            return None
        if is_tagged_type(dt):
            return "dynamic"
        if isinstance(dt, T.ArrayType):
            return "array"
        from ..graph import _entity_kind

        if _entity_kind(dt) is not None:
            return "entity"
        ck = _container_kind(dt)
        if ck == "object" or isinstance(dt, (T.MapType,)):
            return "object"
        if isinstance(dt, T.StructType):
            return "object"
        return "scalar"

    lk, rk = kind_of(ldt), kind_of(rdt)
    # entity operands: on the LEFT of an object they merge through their
    # properties (jsonb_operators.out:133 runs `n || {list: ...}`); with
    # scalars/arrays/entities they pair as scalar VALUES ([vertex, 1],
    # :132); an object REFUSES an entity on its right (:138)
    if lk == "entity" and rk == "object":
        return _compile_concat_op(
            scope,
            A.Binary("||", A.FuncCall("properties", [e.left]), e.right),
            l.getField("properties"),
            r,
        )
    if rk == "entity" and lk == "object":
        return _compile_concat_op(
            scope,
            A.Binary("||", e.left, A.FuncCall("properties", [e.right])),
            l,
            r.getField("properties"),
        )
    if lk == "entity":
        lk = "scalar"
    if rk == "entity":
        rk = "scalar"
    if lk == "object" and rk == "object":
        if isinstance(ldt, T.StructType) and isinstance(rdt, T.StructType):
            names = []
            cols = {}
            for f2 in ldt.fields:
                if f2.name != "_none":
                    names.append(f2.name)
                    cols[f2.name] = l.getField(f2.name)
            for f2 in rdt.fields:
                if f2.name != "_none":
                    if f2.name not in cols:
                        names.append(f2.name)
                    cols[f2.name] = r.getField(f2.name)  # right wins
            if not names:
                return F.struct(F.lit(None).cast("string").alias("_none"))
            return F.struct(*[cols[nm].alias(nm) for nm in names])
        if isinstance(ldt, T.MapType) and isinstance(rdt, T.MapType):
            return F.map_concat(l, r)
        raise CompileError("cannot concatenate these object representations")
    if lk == "object" or rk == "object":
        if lk == "array":
            # array || object appends the object as an element
            return _concat_arrays(l, ldt.elementType, F.array(r), rdt)
        if rk == "array":
            # object || array prepends it (jsonb_operators.out:136
            # `n.json || [1, 2, 3]` = [{...}, 1, 2, 3])
            return _concat_arrays(F.array(l), ldt, r, rdt.elementType)
        side = "left" if lk == "object" else "right"
        # a plain object refuses scalar concatenation
        # (jsonb_operators.out:139-141)
        raise CompileError(f"invalid {side} operand for agtype concatenation")
    if lk == "array" and rk == "array":
        return _concat_arrays(l, ldt.elementType, r, rdt.elementType)
    if lk == "array":
        return _concat_arrays(l, ldt.elementType, F.array(r), rdt)
    if rk == "array":
        return _concat_arrays(F.array(l), ldt, r, rdt.elementType)
    # scalar || scalar -> 2-element array (kinds may differ -> tag)
    return _concat_arrays(F.array(l), ldt, F.array(r), rdt)


def tagged_json_elements(col: Column) -> Column:
    """Element array of a dynamic (tagged) ARRAY payload: parses the JSON
    payload as VARIANT (JVM-side) and re-materializes each element as a
    tagged value with kinds preserved.  Container elements lose their
    element-wise order key (lexical-JSON fallback, documented)."""
    from ..graph import TAGGED_TYPE

    def _elem_to_tagged(e: Column) -> Column:
        from ..graph import FLOAT_SENTINEL, NUM_SENTINEL

        sch = F.schema_of_variant(e)
        is_int = sch.isin("BIGINT", "INT", "SMALLINT", "TINYINT")
        is_num = is_int | sch.isin("DOUBLE", "FLOAT") | sch.startswith("DECIMAL")
        is_str = sch == "STRING"
        is_bool = sch == "BOOLEAN"
        is_arr = sch.startswith("ARRAY")
        sval = F.try_variant_get(e, "$", "string")
        is_sent = is_str & sval.startswith(NUM_SENTINEL)
        is_fsent = is_str & sval.startswith(FLOAT_SENTINEL)
        dtext = sval.substr(F.lit(len(NUM_SENTINEL) + 1), F.length(sval))
        k = (
            F.when(is_num | is_sent | is_fsent, F.lit(7))
            .when(is_bool, F.lit(6))
            .when(is_str, F.lit(5))
            .when(is_arr, F.lit(4))
            .otherwise(F.lit(3))
            .cast("tinyint")
        )
        return F.named_struct(
            F.lit("__k"), k,
            F.lit("__n"), F.when(is_sent | is_fsent, dtext.cast("double"))
            .when(is_num, F.try_variant_get(e, "$", "double")),
            F.lit("__i"), F.when(is_int, F.try_variant_get(e, "$", "bigint")),
            F.lit("__d"), F.when(is_sent, dtext),
            F.lit("__s"), F.when(is_str & ~is_sent & ~is_fsent, sval),
            F.lit("__b"), F.when(is_bool, F.try_variant_get(e, "$", "boolean")),
            F.lit("__o"), F.lit(None).cast(
                next(f.dataType for f in TAGGED_TYPE.fields if f.name == "__o")
            ),
            F.lit("__j"), F.when(is_arr | (k == 3), F.to_json(e)),
        ).cast(TAGGED_TYPE)

    return F.transform(
        F.from_json(col.getField("__j"), "array<variant>"), _elem_to_tagged
    )


def dyn_array_contains(l: Column, ldt, r: Column, rdt) -> Column:
    """jsonb-style array containment `l @> r` for COLUMN-valued operands
    (the literal-constraint twin is patterns._contains): every element of
    r must equal SOME element of l, compared on the kind ladder via
    element cmp-keys (order-free, duplicates irrelevant)."""
    lk = F.transform(
        _as_tagged_array(l, ldt.elementType if isinstance(ldt, T.ArrayType) else None),
        _containment_key,
    )
    rk = F.transform(
        _as_tagged_array(r, rdt.elementType if isinstance(rdt, T.ArrayType) else None),
        _containment_key,
    )
    return F.forall(rk, lambda e: F.array_contains(lk, e))


def _containment_key(c: Column) -> Column:
    """Containment equality is KIND-STRICT, unlike the ordering ladder:
    `[5] @> [5.0]` is FALSE (list_comprehension.out:46 — the int and float
    kinds do not cross-match in agtype_deep_contains). Keep the exact-int
    slot so 5 != 5.0; drop the shape-dependent order key.  The __d slot
    normalizes through the exact numeric key so value-equal NUMERICs
    ('5.0' vs '5.00', numeric_eq) match while the kind split from
    int/float survives (their __d is NULL)."""
    from ..graph import jvm_numeric_sort_text

    return F.struct(
        c.getField("__k").alias("__k"),
        c.getField("__n").alias("__n"),
        c.getField("__i").alias("__i"),
        F.when(
            c.getField("__d").isNotNull(),
            jvm_numeric_sort_text(c.getField("__d")),
        ).alias("__d"),
        c.getField("__s").alias("__s"),
        c.getField("__b").alias("__b"),
        c.getField("__j").alias("__j"),
    )


def _exist_trim_dec(d: Column) -> Column:
    # numeric_eq is value equality: 5.00 == 5, so strip the fixed-scale
    # zero padding before encoding
    return F.regexp_replace(
        F.regexp_replace(d.cast("string"), r"(\.\d*?)0+$", r"$1"), r"\.$", ""
    )


def _exist_enc_tagged(x: Column) -> Column:
    """Kind-prefixed existence key of one tagged scalar: AGE's existence
    lookup matches array elements by SAME-TYPE value equality
    (agtype_util.c equals_agtype_scalar_value via
    find_agtype_value_from_container — int 1 does not match float 1.0 or
    string "1"), so the encoding carries the kind.  NULL for the null kind
    and for container/entity kinds (non-scalars never match)."""
    k = x.getField("__k")
    d = x.getField("__d")
    return (
        F.when(k == 5, F.concat(F.lit("s:"), x.getField("__s")))
        .when(k == 6, F.concat(F.lit("b:"), x.getField("__b").cast("string")))
        .when(
            k == 7,
            F.when(d.isNotNull(), F.concat(F.lit("d:"), _exist_trim_dec(d)))
            .when(
                x.getField("__i").isNotNull(),
                F.concat(F.lit("i:"), x.getField("__i").cast("string")),
            )
            .otherwise(F.concat(F.lit("f:"), x.getField("__n").cast("string"))),
        )
    )


def _exist_enc_concrete(x: Column, et) -> "Optional[Column]":
    """Kind-prefixed existence key for a concretely-typed scalar; None when
    the type is statically non-scalar (containers never match)."""
    from ..graph import _strip_nullability, is_tagged_type

    et = _strip_nullability(et)
    if is_tagged_type(et):
        return _exist_enc_tagged(x)
    if isinstance(et, T.StringType):
        return F.concat(F.lit("s:"), x)
    if isinstance(et, T.BooleanType):
        return F.concat(F.lit("b:"), x.cast("string"))
    if isinstance(et, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return F.concat(F.lit("i:"), x.cast("string"))
    if isinstance(et, (T.FloatType, T.DoubleType)):
        return F.concat(F.lit("f:"), x.cast("double").cast("string"))
    if isinstance(et, T.DecimalType):
        return F.concat(F.lit("d:"), _exist_trim_dec(x))
    return None


def _existence_keys(col: Column, dt) -> "Optional[Column]":
    """The encoded key set a jsonb existence operator tests against
    (agtype_ops.c agtype_exists_agtype): an object's top-level keys
    (string-only match), an array's scalar ELEMENTS by same-type value
    equality, a string itself.  Entities contribute their property keys
    (the vertex IS its properties object for `n ? 'k'`).  Keys are
    kind-prefixed via _exist_enc_* so int/float/string/bool/numeric stay
    distinct.  None = statically not key-bearing."""
    from ..graph import _entity_kind, _strip_nullability, is_tagged_type

    if dt is None:
        return None
    dt = _strip_nullability(dt)
    s_pfx = lambda arr: F.transform(arr, lambda x: F.concat(F.lit("s:"), x))  # noqa: E731
    if is_tagged_type(dt):
        k = col.getField("__k")
        obj_keys = s_pfx(F.json_object_keys(col.getField("__j")))
        arr_elems = F.filter(
            F.transform(tagged_json_elements(col), _exist_enc_tagged),
            lambda x: x.isNotNull(),
        )
        return (
            F.when(k == 3, obj_keys)
            .when(k == 4, arr_elems)
            .when(k == 5, F.array(F.concat(F.lit("s:"), col.getField("__s"))))
        )
    if _entity_kind(dt) in ("vertex", "edge"):
        pdt = next(f.dataType for f in dt.fields if f.name == "properties")
        props = col.getField("properties")
        return s_pfx(_struct_key_array(props, pdt))
    if isinstance(dt, T.StructType):
        return s_pfx(_struct_key_array(col, dt))
    if isinstance(dt, T.ArrayType):
        enc = _exist_enc_concrete(F.lit(None), dt.elementType)
        if enc is None:  # array of containers: no scalar elements to match
            return F.array().cast("array<string>")
        return F.filter(
            F.transform(col, lambda x: _exist_enc_concrete(x, dt.elementType)),
            lambda x: x.isNotNull(),
        )
    if isinstance(dt, T.StringType):
        return F.array(F.concat(F.lit("s:"), col))
    return None


def _struct_key_array(col: Column, dt: T.StructType) -> Column:
    from ..graph import prop_display_name

    slots = [
        F.when(col.getField(f.name).isNotNull(), F.lit(prop_display_name(f.name)))
        for f in dt.fields
        if f.name != "_none"
    ]
    if not slots:
        return F.array().cast("array<string>")
    return F.filter(F.array(*slots), lambda x: x.isNotNull())


def compile_containment(big: Column, bdt, small: Column, sdt) -> Column:
    """`big @> small` across the value shapes a column can take: array ⊇
    array via element cmp-keys; a dynamic (tagged) big side contains when
    its array-kind payload does; non-container shapes fall to kind-aligned
    equality (scalar @> scalar is equality in jsonb)."""
    from ..graph import (
        is_tagged_type,
        let_column,
        tagged_cmp_key_jvm,
        tagged_cmp_key_jvm_of,
    )

    def _jk(c):
        return let_column(c, lambda t: tagged_cmp_key_jvm(t))

    if isinstance(bdt, T.ArrayType) and isinstance(sdt, T.ArrayType):
        return dyn_array_contains(big, bdt, small, sdt)
    if bdt is not None and is_tagged_type(bdt):
        if isinstance(sdt, T.ArrayType):
            elems = F.transform(tagged_json_elements(big), _containment_key)
            sk = F.transform(_as_tagged_array(small, sdt.elementType), _containment_key)
            return F.when(
                big.getField("__k") == 4,
                F.forall(sk, lambda x: F.array_contains(elems, x)),
            ).otherwise(F.lit(False))
        # exact JVM keys (value-exact at any width, bounded depth); the
        # let-binding keeps the key's input references from duplicating
        # big trees (unbound literal trees OOMed the driver)
        return _jk(big) == (
            _jk(small)
            if (sdt is not None and is_tagged_type(sdt))
            else tagged_cmp_key_jvm_of(small, sdt)
        )
    if bdt is not None and sdt is not None:
        return tagged_cmp_key_jvm_of(big, bdt) == tagged_cmp_key_jvm_of(small, sdt)
    return big == small


def _concat_arrays(l: Column, let_, r: Column, ret_) -> Column:
    lt = _strip(let_)
    rt = _strip(ret_)
    if lt is not None and rt is not None and lt == rt:
        return F.concat(l, r)
    return F.concat(_as_tagged_array(l, let_), _as_tagged_array(r, ret_))


def _strip(dt):
    from ..graph import _strip_nullability

    return None if dt is None else _strip_nullability(dt)


_NUM_ARITH_UDFS: dict = {}


def _numeric_arith_udf(op: str):
    if op not in _NUM_ARITH_UDFS:
        from ..runtime.pgnumeric import make_numeric_arith_udf

        _NUM_ARITH_UDFS[op] = make_numeric_arith_udf(op)
    return _NUM_ARITH_UDFS[op]


def _tagged_arith(
    op: str,
    l: Column,
    ldt,
    lt_tag: bool,
    r: Column,
    rdt,
    rt_tag: bool,
    exact_num: bool = False,
) -> Column:
    """Kind-preserving + - * / % over dynamic numeric values
    (age_agtype add/sub/mul/div/mod): all-int rows compute exactly in
    int64 (truncating division, C-style modulo) and stay int kind; any
    float operand promotes that row to float8. Non-numeric rows (string/
    bool/container kinds in the dynamic column) yield NULL. The result is
    itself a tagged value so kinds can differ per row.

    ``exact_num=True`` computes the NUMERIC-kind __d payload through the
    EXACT Arrow kernel (runtime/pgnumeric.py — arbitrary precision with
    PG display scales, matching numeric_out at any width); the bounded
    DECIMAL(38,18) lane survives ONLY for non-tree arithmetic inside
    higher-order-function lambdas (where a pandas UDF cannot run and the
    array-level eval_arith_tree kernel cannot reach).  The int/float
    lanes (__i/__n) stay pure JVM codegen either way."""
    from ..graph import ORDER_KEY_TYPE, TAGGED_TYPE

    def parts(c, dt, tagged):
        if tagged:
            num = F.when(c.getField("__k") == 7, c.getField("__n"))
            return num, c.getField("__i")
        if dt is not None and _is_integral(dt):
            return c.cast("double"), c.cast("long")
        if dt is not None and isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
            return c.cast("double"), F.lit(None).cast("long")
        # strings/bools/containers/null literals never contribute a number
        return F.lit(None).cast("double"), F.lit(None).cast("long")

    ln, li = parts(l, ldt, lt_tag)
    rn, ri = parts(r, rdt, rt_tag)
    both_int = li.isNotNull() & ri.isNotNull()
    str_concat = None
    if op == "+":
        # string-kind rows concatenate: 'str' + 1 -> "str1" (agtype_any_add;
        # expr.out:659-663 keeps the float ".0" in "1.0str")
        def as_text(c, dt, tagged):
            from ..graph import _scalar_kind

            if tagged:
                # only string/numeric kinds join a concat (agtype_add:31-35
                # — bool + string is an error, so that row nulls out)
                return F.when(c.getField("__k") != 6, _tagged_to_string(c))
            if dt is not None and _is_string(dt):
                return c
            if dt is not None and _scalar_kind(dt) == "numeric":
                return c.cast("string")
            return F.lit(None).cast("string")

        lstr = (
            F.when(l.getField("__k") == 5, l.getField("__s")) if lt_tag
            else (l if ldt is not None and _is_string(ldt) else F.lit(None).cast("string"))
        )
        rstr = (
            F.when(r.getField("__k") == 5, r.getField("__s")) if rt_tag
            else (r if rdt is not None and _is_string(rdt) else F.lit(None).cast("string"))
        )
        str_concat = (
            F.when(lstr.isNotNull(), F.concat(lstr, as_text(r, rdt, rt_tag)))
            .when(rstr.isNotNull(), F.concat(as_text(l, ldt, lt_tag), rstr))
        )
        nv, iv = ln + rn, li + ri
    elif op == "-":
        nv, iv = ln - rn, li - ri
    elif op == "*":
        nv, iv = ln * rn, li * ri
    elif op == "^":
        # int/float kinds ride float8 pow (agtype_pow, agtype_ops.c:984);
        # ONLY a NUMERIC-kind operand routes through numeric_power below —
        # there is no int lane (int ^ int is FLOAT kind in the reference)
        nv, iv = F.pow(ln, rn), F.lit(None).cast("long")
        both_int = F.lit(False)
    elif op == "/":
        nv = ln / rn
        # SQL div: exact int64 division truncating toward zero
        iv = F.when(ri != 0, F.call_function("div", li, ri))
    else:  # %
        nv = F.when(rn == 0.0, F.lit(float("nan"))).otherwise(ln % rn)
        iv = F.when(ri != 0, li % ri)  # int%0 -> null (not NaN)

    # NUMERIC lane (age_agtype ops: the NUMERIC kind dominates a mixed
    # pair): if either operand is numeric-kind, the result is numeric with
    # exact-as-possible DECIMAL(38,18) math and the text payload in __d.
    # NaN/Infinity operands (no finite decimal) route through the double
    # result's spelling.  Division by an integral operand computes at
    # scale 16 — Spark's decimal typing then reproduces PG's
    # select_div_scale shape (24.45/7 = 3.4928571428571429).
    from ..graph import _strip_nullability, dec_trim_text

    def num_flag_and_dec(c, dt, tagged, other_i):
        if tagged:
            flag = (c.getField("__k") == 7) & c.getField("__d").isNotNull()
            dec = c.getField("__d").try_cast("decimal(38,18)")
            return F.coalesce(flag, F.lit(False)), dec
        if dt is not None and isinstance(_strip_nullability(dt), T.DecimalType):
            return F.lit(True), c.cast("decimal(38,18)")
        return F.lit(False), F.lit(None).cast("decimal(38,18)")

    l_isnum, ldec0 = num_flag_and_dec(l, ldt, lt_tag, ri)
    r_isnum, rdec0 = num_flag_and_dec(r, rdt, rt_tag, li)
    is_num = l_isnum | r_isnum
    if exact_num:
        # EXACT lane: one Arrow kernel call computes the NUMERIC __d text
        # at arbitrary precision with PG display scales; it returns NULL
        # for non-numeric rows, so no JVM is_num gate is needed
        def num_slots(c, dt, tagged, iv_, nv_, pre):
            if tagged:
                return [
                    c.getField("__d").alias(pre + "d"),
                    c.getField("__i").cast("string").alias(pre + "i"),
                    c.getField("__n").cast("string").alias(pre + "n"),
                ]
            return [
                (
                    dec_trim_text(c.cast("string"))
                    if dt is not None
                    and isinstance(_strip_nullability(dt), T.DecimalType)
                    else F.lit(None).cast("string")
                ).alias(pre + "d"),
                iv_.cast("string").alias(pre + "i"),
                (
                    nv_.cast("string")
                    if not (
                        dt is not None
                        and (
                            _is_integral(dt)
                            or isinstance(_strip_nullability(dt), T.DecimalType)
                        )
                    )
                    else F.lit(None).cast("string")
                ).alias(pre + "n"),
            ]

        final_d = _numeric_arith_udf(op)(
            F.struct(
                *num_slots(l, ldt, lt_tag, li, ln, "l"),
                *num_slots(r, rdt, rt_tag, ri, rn, "r"),
            ),
            F.lit(None).cast("string"),
        )
    else:
        # bounded in-lambda fallback: non-numeric side converts through
        # its numeric slots (int exact, float via %.15g text like the PG
        # cast); try_* variants NULL on >38-digit overflow (falling back
        # to the double spelling below) instead of raising under ANSI
        ldec = F.coalesce(
            ldec0, li.try_cast("decimal(38,18)"), ln.try_cast("decimal(38,18)")
        )
        rdec = F.coalesce(
            rdec0, ri.try_cast("decimal(38,18)"), rn.try_cast("decimal(38,18)")
        )
        if op == "/":
            dres = F.when(
                ri.isNotNull(),
                F.try_divide(ldec.cast("decimal(38,16)"), ri.cast("decimal(20,0)")).cast("string"),
            ).otherwise(F.try_divide(ldec, rdec).cast("string"))
        elif op == "%":
            dres = F.try_mod(ldec, rdec).cast("string")
        elif op == "+":
            dres = F.try_add(ldec, rdec).cast("string")
        elif op == "-":
            dres = F.try_subtract(ldec, rdec).cast("string")
        elif op == "^":
            # no decimal power primitive: the in-lambda bounded lane keeps
            # the float8 spelling (documented; the exact lane above carries
            # PG numeric_power display scales)
            dres = F.lit(None).cast("string")
        else:
            dres = F.try_multiply(ldec, rdec).cast("string")
        # specials: a NaN/Infinity operand or an overflowed decimal falls
        # back to the double result's spelling
        dv = F.when(
            F.isnan(nv), F.lit("NaN")
        ).when(nv == float("inf"), F.lit("Infinity")).when(
            nv == float("-inf"), F.lit("-Infinity")
        ).otherwise(F.coalesce(dec_trim_text(dres), F.format_string("%.15g", nv)))
        final_d = F.when(is_num & nv.isNotNull(), dv).otherwise(
            F.when(is_num & F.isnull(nv) & (l_isnum & F.isnan(F.coalesce(ln, F.lit(0.0)))), F.lit("NaN"))
        )

    final_i = F.when(both_int & ~is_num, iv)
    # the sort key mirrors the row's actual kind: exact-int rows key on the
    # int result (7/2 keys 3, not 3.5), float rows on the float8 result.
    # `^` NUMERIC rows key on the __d text instead (NaN/Infinity spellings
    # cast fine), so a kernel NULL (numeric_power's SQL error cases:
    # zero^negative, negative^non-integer) nulls the whole row rather than
    # leaking the float8 pow lane's value; the other ops keep the float
    # lane, whose ANSI division-by-zero raise IS the reference's error
    # surface for `/ 0`
    if op == "^":
        num_n = final_d.cast("double")
    else:
        num_n = nv
    final_n = F.when(final_i.isNotNull(), final_i.cast("double")).otherwise(
        F.when(is_num, num_n).otherwise(F.when(~both_int, nv))
    )
    is_str = str_concat.isNotNull() if str_concat is not None else F.lit(False)
    return F.when(
        ~is_str & final_n.isNull() & final_d.isNull(), F.lit(None).cast(TAGGED_TYPE)
    ).otherwise(
        F.struct(
            F.when(is_str, 5).otherwise(7).cast("tinyint").alias("__k"),
            F.when(~is_str, final_n.cast("double")).alias("__n"),
            F.when(~is_str, final_i).alias("__i"),
            F.when(~is_str, final_d).alias("__d"),
            (str_concat if str_concat is not None else F.lit(None).cast("string")).alias("__s"),
            F.lit(None).cast("boolean").alias("__b"),
            F.lit(None).cast(ORDER_KEY_TYPE).alias("__o"),
            F.lit(None).cast("string").alias("__j"),
        )
    )


def _numeric_binary(op: str, l: Column, r: Column, ldt, rdt) -> Column:
    if op == "+":
        return l + r
    if op == "-":
        return l - r
    if op == "*":
        return l * r
    if op == "/":
        if ldt is not None and rdt is not None and _is_integral(ldt) and _is_integral(rdt):
            return (l / r).cast("long")  # int/int truncates (PG div semantics)
        return l / r
    if op == "%":
        if (ldt is not None and isinstance(ldt, (T.FloatType, T.DoubleType))) or (
            rdt is not None and isinstance(rdt, (T.FloatType, T.DoubleType))
        ):
            # PG float8 modulo-by-zero yields NaN (int%0 stays an error)
            return F.when(r == 0.0, F.lit(float("nan"))).otherwise(l % r)
        return l % r
    if op == "^":
        return F.pow(l, r)
    raise CompileError(f"unknown arithmetic op {op}")


def _ladder_rank(dt: Optional[T.DataType]) -> Optional[int]:
    """Reference sort priority of a statically-typed operand
    (get_type_sort_priority, agtype_util.c:271): edge=1, vertex=2, object=3,
    array=4, string=5, bool=6, numeric=7. None for unknown/dynamic types."""
    from ..graph import _scalar_kind, is_tagged_type

    if dt is None or isinstance(dt, T.NullType):
        return None
    if is_tagged_type(dt):
        return None  # dynamic: rank varies per row
    k = _scalar_kind(dt)
    if k == "numeric":
        return 7
    if k == "bool":
        return 6
    if k == "string":
        return 5
    if isinstance(dt, T.ArrayType):
        return 4
    if isinstance(dt, T.StructType):
        names = _entity_fields(dt)
        if names == {"id", "label", "properties"}:
            return 2  # vertex
        if names == {"id", "start_id", "end_id", "label", "properties"}:
            return 1  # edge
        return 3  # object (map literal / properties struct)
    if isinstance(dt, T.MapType):
        return 3
    return None


def _cross_kind_compare(op: str, l: Column, r: Column, lk: int, rk: int) -> Column:
    """Comparison between operands of two different static kinds: the result
    is decided entirely by the kind ladder (compare_agtype_containers_
    orderability, agtype_util.c:333 — differing types never compare equal),
    null-propagating per the reference's strict comparison ops."""
    if op == "=":
        const = False
    elif op == "<>":
        const = True
    else:
        const = {"<": lk < rk, "<=": lk < rk, ">": lk > rk, ">=": lk > rk}[op]
    return F.when(
        l.isNull() | r.isNull(), F.lit(None).cast("boolean")
    ).otherwise(F.lit(const))


def _tag_align(
    scope: ExprScope,
    l: Column,
    r: Column,
    ldt=None,
    rdt=None,
    exact: bool = False,
    jvm_exact: bool = False,
) -> tuple[Column, Column]:
    """If either comparison side is a tagged dynamic value, wrap the other
    and reduce both to comparison KEYS (the struct minus the exact-int
    payload slot) so struct ordering applies the reference's cross-type
    ladder and `2 = 2.0` stays true (expr.out:680-685).  Callers that
    already resolved operand types (lambda-aware) pass them in — a lambda
    variable's Column is not schema-resolvable here.

    ``exact=True`` keys both sides on the EXACT normalized order text (a
    pandas UDF — any container depth/width, arbitrary-precision numerics).
    A statically-known plain STRING/BOOL side downgrades to the JVM key
    (a different dynamic kind is decided by the __k rank alone, the same
    kind by the native slot), keeping WHERE-clause comparisons against
    such literals pure codegen on the scan hot path.  A plain NUMERIC
    side vs a tagged side KEEPS the exact key: the reference compares
    int/float against NUMERIC through numeric_cmp (agtype_util.c
    is_numeric_result branch), so a dynamic NUMERIC with >float8
    precision must not collapse through __n.  Only int-vs-float (no
    NUMERIC operand anywhere) is a float8 collapse in the reference —
    and plain-vs-plain numerics stay JVM for exactly that reason."""
    from ..graph import (
        _scalar_kind,
        _strip_nullability,
        is_tagged_type,
        tag_column,
        tagged_cmp_key,
        tagged_cmp_key_exact,
    )

    if ldt is None:
        ldt = dtype_of(scope, l)
    if rdt is None:
        rdt = dtype_of(scope, r)

    def _plain_scalar_kind(dt):
        if dt is None or is_tagged_type(dt):
            return None
        return _scalar_kind(_strip_nullability(dt))

    lk, rk = _plain_scalar_kind(ldt), _plain_scalar_kind(rdt)
    if lk is not None or rk is not None:
        # A statically-known string/bool side compares exactly through its
        # native slot (different dynamic kinds are decided by __k rank).
        # A plain NUMERIC side vs a TAGGED other side compares through the
        # JVM numeric-ladder key (graph.py jvm_numeric_sort_text): the
        # dynamic side may hold a NUMERIC whose precision exceeds float8,
        # and the reference compares int/float-vs-numeric through
        # numeric_cmp (agtype_util.c is_numeric_result branch), not a __n
        # float8 collapse.  The key is exact at any precision AND pure
        # codegen, so WHERE tagged-vs-literal scans stay UDF-free.
        # Plain-vs-plain numerics stay native (both sides' exact values
        # are typed columns).
        from ..graph import ladder_keys_float8_collapse

        if lk == "numeric" and rdt is not None and is_tagged_type(rdt):
            return ladder_keys_float8_collapse(l, ldt, r)
        if rk == "numeric" and ldt is not None and is_tagged_type(ldt):
            kr, kl = ladder_keys_float8_collapse(r, rdt, l)
            return kl, kr
        exact = jvm_exact = False
    from ..graph import _container_kind, let_column, tagged_cmp_key_jvm

    # jvm_exact: inside a HOF lambda (no pandas UDF) — the pure-JVM exact
    # key keeps container comparisons value-exact there (unbounded width,
    # depth-bounded); scalar kinds key identically to tagged_cmp_key
    if exact:
        key = tagged_cmp_key_exact
    elif jvm_exact:
        def key(c):
            return let_column(c, lambda t: tagged_cmp_key_jvm(t))
    else:
        key = tagged_cmp_key

    def tagged_side(c, dt):
        # freshly tagging a CONTAINER builds a big __o tree; the JVM key
        # references its input ~10 times, and duplicating that tree per
        # reference makes Catalyst superlinear (measured: a lambda
        # container equality went 9 s -> 60 s unbound) — let-bind it.
        # Scalar tags are small, and the exact key (3 refs, and a pandas
        # UDF may not sit inside the HOF wrapper) stays direct.
        t = tag_column(c, dt)
        if not exact and _container_kind(_strip_nullability(dt)) is not None:
            return let_column(t, key)
        return key(t)

    lt = ldt is not None and is_tagged_type(ldt)
    rt = rdt is not None and is_tagged_type(rdt)
    if lt and not rt and rdt is not None:
        return key(l), tagged_side(r, rdt)
    if rt and not lt and ldt is not None:
        return tagged_side(l, ldt), key(r)
    if lt and rt:
        if exact or jvm_exact:
            # both dynamic, string-lane keys: apply the reference's
            # int-vs-float float8 collapse per pair (agtype_util.c:333;
            # non-transitive above 2^53, so it lives here and not in the
            # total-order key — see graph.py)
            from ..graph import pair_float8_collapse_string_keys

            return pair_float8_collapse_string_keys(l, r, key)
        return key(l), key(r)
    return l, r


def _operand_dtype(scope: ExprScope, node: A.Expr, col: Column) -> Optional[T.DataType]:
    """Operand type, resolving lambda variables via the scope's hint map
    (a namedlambdavariable Column is not schema-resolvable).  Composite
    expressions OVER lambda variables (`[x * x]` inside a reduce body)
    are schema-unresolvable too — fall back to AST-level inference so
    operator dispatch (e.g. list-concat vs list-append) stays correct."""
    if isinstance(node, A.Var) and node.name in scope.lambda_types:
        return scope.lambda_types[node.name]
    dt = dtype_of(scope, col)
    if dt is None:
        dt = _infer_ast_dtype(scope, node)
    return dt


def _infer_ast_dtype(scope: ExprScope, node) -> Optional[T.DataType]:
    """Static type of an expression AST when the Column is unresolvable
    (lambda context). Covers the shapes that appear in fold/comprehension
    bodies; None = unknown (callers keep their conservative path)."""
    if isinstance(node, A.Var):
        if node.name in scope.lambda_types:
            return scope.lambda_types[node.name]
        return dtype_of(scope, F.col(node.name))
    if isinstance(node, A.Lit):
        v = node.value
        if v is None:
            return T.NullType()
        if isinstance(v, bool):
            return T.BooleanType()
        if isinstance(v, int):
            return T.LongType()
        if isinstance(v, float):
            return T.DoubleType()
        if isinstance(v, str):
            return T.StringType()
        return None
    if isinstance(node, A.ListLit):
        from ..graph import _widen

        ets = [_infer_ast_dtype(scope, it) for it in node.items]
        if not ets:
            return T.ArrayType(T.NullType())
        if any(e2 is None for e2 in ets):
            return None
        tgt = ets[0]
        try:
            for e2 in ets[1:]:
                tgt = _widen(tgt, e2)
        except Exception:
            return None
        return T.ArrayType(tgt)
    if isinstance(node, A.Binary) and node.op in ("+", "-", "*", "/", "%", "^"):
        from ..graph import is_tagged_type

        ldt = _infer_ast_dtype(scope, node.left)
        rdt = _infer_ast_dtype(scope, node.right)
        # kind-preserving arithmetic: a tagged operand yields a tagged
        # result (nested arith over a lambda var stays dynamic)
        if (ldt is not None and is_tagged_type(ldt)) or (
            rdt is not None and is_tagged_type(rdt)
        ):
            from ..graph import TAGGED_TYPE

            return TAGGED_TYPE
        if node.op == "^":
            return T.DoubleType()
        if ldt is None or rdt is None:
            return None
        flt = (T.DoubleType, T.FloatType, T.DecimalType)
        ints = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
        if isinstance(ldt, ints + flt) and isinstance(rdt, ints + flt):
            if isinstance(ldt, flt) or isinstance(rdt, flt):
                return T.DoubleType()
            return T.LongType()
        return None
    if isinstance(node, A.FuncCall):
        # fixed-result-type conversions appearing in lambda bodies (e.g.
        # size(toString(x*y)) — size() needs to know the inner call yields
        # a string to dispatch char-count instead of array-size)
        fixed = {
            "tostring": T.StringType(),
            "tostringlist": T.ArrayType(T.StringType()),
            "tointeger": T.LongType(),
            "tofloat": T.DoubleType(),
            "toboolean": T.BooleanType(),
            "keys": T.ArrayType(T.StringType()),
        }
        if node.name == "abs" and len(node.args) == 1:
            # abs() is type-preserving (age_abs: int->int, float->float,
            # numeric->numeric) — a tagged arg yields a tagged result
            return _infer_ast_dtype(scope, node.args[0])
        return fixed.get(node.name)
    return None


# the exact PG-numeric kernel (weight/select_div_scale/exact ops) lives in
# runtime/pgnumeric.py, shared between this compile-time fold and the
# runtime Arrow kernel for NUMERIC-kind column arithmetic


def _const_num_operand(e):
    """(kind, value, dscale) of a CONSTANT numeric operand — kind in
    ('int', 'float', 'numeric'), value int/float/Decimal.  None when not
    statically foldable (variables, specials, non-numeric literals)."""
    import decimal as _dec

    if isinstance(e, A.Unary) and e.op in ("-", "+"):
        inner = _const_num_operand(e.expr)
        if inner is None:
            return None
        k, v, ds = inner
        return (k, -v if e.op == "-" else v, ds)
    if isinstance(e, A.Lit) and not isinstance(e.value, bool):
        if isinstance(e.value, int):
            return ("int", e.value, 0)
        if isinstance(e.value, float):
            return ("float", e.value, None)
        return None
    if isinstance(e, A.FuncCall) and e.name == "tonumeric" and len(e.args) == 1:
        a0 = e.args[0]
        raw = None
        if isinstance(a0, A.Lit):
            if isinstance(a0.value, str):
                if a0.value.strip().lower() in _NUMERIC_SPECIALS:
                    return None  # NaN/Infinity: the runtime lane handles them
                raw = a0.value.strip()
            else:
                raw = getattr(a0, "raw", None)
                if raw is None and isinstance(a0.value, (int, float)) and not isinstance(a0.value, bool):
                    raw = repr(a0.value)
        elif isinstance(a0, A.Unary):
            inner = _const_num_operand(a0)
            if inner is None:
                return None
            k, v, ds = inner
            if k == "float":
                v = _dec.Decimal(format(v, ".15g"))
            elif k == "int":
                v = _dec.Decimal(v)
            return ("numeric", v, max(0, -v.as_tuple()[2]))
        if raw is None:
            return None
        try:
            d = _dec.Decimal(str(raw))
        except _dec.InvalidOperation:
            return None
        if not d.is_finite():
            return None
        return ("numeric", d, max(0, -d.as_tuple()[2]))
    if isinstance(e, A.FuncCall) and e.name == "castint" and len(e.args) == 1:
        inner = _const_num_operand(e.args[0])
        if inner is None:
            return None
        k, v, ds = inner
        if k == "int":
            return inner
        # ::int ROUNDS (2.71::int = 3, expr.out) — but the half-way rule
        # differs by kind: AGTV_FLOAT routes through dtoi8/rint
        # (half-to-EVEN: (2.5)::int = 2), AGTV_NUMERIC through
        # numeric_int8 (half away from zero) — agtype.c:5518-5525
        if k == "numeric":
            q, mode = v, _dec.ROUND_HALF_UP
        else:
            q, mode = _dec.Decimal(repr(v)), _dec.ROUND_HALF_EVEN
        iv = int(q.quantize(_dec.Decimal(1), rounding=mode))
        if not (-(1 << 63) <= iv < (1 << 63)):
            return None  # int64 overflow: the runtime error surface handles it
        return ("int", iv, 0)
    if isinstance(e, A.FuncCall) and e.name == "castfloat" and len(e.args) == 1:
        inner = _const_num_operand(e.args[0])
        if inner is None:
            return None
        k, v, ds = inner
        return ("float", float(v), None)
    if isinstance(e, A.Binary):
        folded = _fold_const_numeric(e)
        return folded
    return None


def _fold_const_numeric(e):
    """Fold a constant arithmetic expression with at least one NUMERIC-kind
    operand to its EXACT PG value: arbitrary precision (beyond the runtime
    lane's DECIMAL(38,18) bound) with PG display scales — add/sub keep
    max(d1,d2), mul keeps d1+d2, division uses select_div_scale.  Returns
    ('numeric', Decimal, dscale) or None when not foldable."""
    import decimal as _dec

    if not isinstance(e, A.Binary) or e.op not in ("+", "-", "*", "/", "%", "^"):
        return None
    lt = _const_num_operand(e.left)
    rt = _const_num_operand(e.right)
    if lt is None or rt is None:
        return None
    if lt[0] != "numeric" and rt[0] != "numeric":
        return None  # pure int/float arithmetic stays on the runtime lane

    def as_dec(t):
        k, v, ds = t
        if k == "numeric":
            return v, ds
        if k == "int":
            return _dec.Decimal(v), 0
        # PG casts float8 -> numeric through the %.15g text
        d = _dec.Decimal(format(v, ".15g"))
        return d, max(0, -d.as_tuple()[2])

    lv, ld = as_dec(lt)
    rv, rd = as_dec(rt)
    from ..runtime.pgnumeric import exact_numeric_op

    out = exact_numeric_op(e.op, lv, ld, rv, rd)
    if out is None:
        return None  # division by zero: runtime error surface
    return ("numeric", out[0], out[1])


def _compile_binary(scope: ExprScope, e: A.Binary) -> Column:
    op = e.op
    if op in ("+", "-", "*", "/", "%", "^"):
        folded = _fold_const_numeric(e)
        if folded is not None:
            from ..graph import numeric_tagged

            return numeric_tagged(F.lit(format(folded[1], "f")))
    l = compile_expr(scope, e.left)
    r = compile_expr(scope, e.right)
    if op in ("<->", "<#>", "<=>", "<+>"):
        # pgvector distance operators (vectors.py; pgvector.out operator
        # block). `<->` only reaches here via OPERATOR(`<->`) — bare it is
        # a pattern arrow in both lexers.
        from . import vectors as V

        a = V.as_vector(l, _operand_dtype(scope, e.left, l))
        b = V.as_vector(r, _operand_dtype(scope, e.right, r))
        return V.DISTANCE_OPS[op](a, b)
    if op in ("and", "or", "xor"):
        # strictly boolean operands (expr.out:152 'cannot cast agtype
        # integer to type boolean'): a statically non-boolean scalar errors;
        # dynamic/unknown types cast at runtime (non-bool rows null out)
        from ..graph import _scalar_kind, is_tagged_type

        for side, sdt in ((e.left, _operand_dtype(scope, e.left, l)),
                          (e.right, _operand_dtype(scope, e.right, r))):
            if isinstance(side, A.FuncCall) and side.name == "tonumeric":
                # ::numeric yields a dynamic value but its kind is STATIC
                raise CompileError("cannot cast agtype numeric to type boolean")
            if sdt is None or isinstance(sdt, (T.NullType, T.BooleanType)):
                continue
            if is_tagged_type(sdt):
                continue
            k = _scalar_kind(sdt)
            if k in ("numeric", "string"):
                kindname = "integer" if k == "numeric" else "string"
                raise CompileError(
                    f"cannot cast agtype {kindname} to type boolean"
                )
        ldt2 = _operand_dtype(scope, e.left, l)
        rdt2 = _operand_dtype(scope, e.right, r)

        def _boolish(col, sdt):
            if sdt is not None and is_tagged_type(sdt):
                return col.getField("__b")  # non-bool kinds -> NULL
            return col.cast("boolean")

        lb, rb = _boolish(l, ldt2), _boolish(r, rdt2)
        if op == "xor":
            return lb != rb
        return lb & rb if op == "and" else lb | rb
    if op in ("=", "<>", "<", "<=", ">", ">="):
        from ..graph import _entity_kind, _strip_nullability

        ldt = _operand_dtype(scope, e.left, l)
        rdt = _operand_dtype(scope, e.right, r)
        lek = _entity_kind(_strip_nullability(ldt)) if ldt is not None else None
        rek = _entity_kind(_strip_nullability(rdt)) if rdt is not None else None
        if lek is not None and lek == rek and lek in ("vertex", "edge"):
            # entities compare by IDENTITY — raw struct equality nulls out
            # on absent properties (expr.out `WHERE r1 = r2` matches the
            # same edge regardless of null property slots)
            li, ri = l.getField("id"), r.getField("id")
            return {
                "=": li == ri, "<>": li != ri,
                "<": li < ri, "<=": li <= ri, ">": li > ri, ">=": li >= ri,
            }[op]
        lk, rk = _ladder_rank(ldt), _ladder_rank(rdt)
        if lk is not None and rk is not None and lk != rk:
            return _cross_kind_compare(op, l, r, lk, rk)
        if (
            lk == 3
            and rk == 3
            and not (isinstance(ldt, T.MapType) and isinstance(rdt, T.MapType) and ldt == rdt)
        ):
            # object vs object with (possibly) different shapes: native
            # struct comparison either fails analysis or ignores the jsonb
            # rules — go through the container order keys (pair-count
            # first, then pairs in jsonb key order)
            from ..graph import (
                let_column,
                tag_column,
                tagged_cmp_key_exact,
                tagged_cmp_key_jvm,
            )

            if not (scope.lambda_vars or scope.lambda_types):
                _key = tagged_cmp_key_exact  # UDF: may not sit inside a HOF
            else:
                # in-lambda: the pure-JVM exact key (variant recursion over
                # the canonical __j — unbounded width, depth-bounded); big
                # object trees: bind once (see _tag_align note)
                def _key(c):
                    return let_column(c, lambda t: tagged_cmp_key_jvm(t))

            l, r = _key(tag_column(l, ldt)), _key(tag_column(r, rdt))
            return {
                "=": l == r, "<>": l != r,
                "<": l < r, "<=": l <= r, ">": l > r, ">=": l >= r,
            }[op]
        l_arr_t = isinstance(ldt, T.ArrayType) and _is_tagged(ldt.elementType)
        r_arr_t = isinstance(rdt, T.ArrayType) and _is_tagged(rdt.elementType)
        if (
            isinstance(ldt, T.ArrayType)
            and isinstance(rdt, T.ArrayType)
            and not (l_arr_t or r_arr_t)
            and _strip(ldt.elementType) != _strip(rdt.elementType)
        ):
            # same-kind lists with different element types ([1,2] vs ['a']):
            # element-tag both so the cross-kind ladder decides per element
            l_arr_t = r_arr_t = True
            l = F.transform(_as_tagged_array(l, ldt.elementType), lambda x: x)
            r = F.transform(_as_tagged_array(r, rdt.elementType), lambda x: x)
            ldt = rdt = T.ArrayType(_TAGGED_TYPE_CACHE())
        if (l_arr_t or r_arr_t) and isinstance(ldt, T.ArrayType) and isinstance(rdt, T.ArrayType):
            # at least one list is dynamic-kind: lift the concrete one and
            # compare element EXACT keys (the pure-JVM variant key — HOF-
            # safe, any width, depth-bounded) so the ladder applies at full
            # precision: int/float elements compare by value, container
            # elements element-wise, and a null element is the agtype null
            # kind (sorts last, equals itself — the orderability
            # comparator's rule, agtype_util.c:333)
            from ..graph import let_column, tag_column, tagged_cmp_key_jvm

            def _ekey(x):
                return let_column(x, lambda c: tagged_cmp_key_jvm(c, elem=True))

            if l_arr_t and not r_arr_t:
                et = rdt.elementType
                r = F.transform(r, lambda x: _ekey(tag_column(x, et)))
                l = F.transform(l, _ekey)
            elif r_arr_t and not l_arr_t:
                et = ldt.elementType
                l = F.transform(l, lambda x: _ekey(tag_column(x, et)))
                r = F.transform(r, _ekey)
            else:
                l = F.transform(l, _ekey)
                r = F.transform(r, _ekey)
        else:
            # exact (UDF-backed) container keys only outside lambda bodies
            # — a pandas UDF cannot run inside a higher-order function;
            # inside one, the pure-JVM exact key takes over
            in_lambda = bool(scope.lambda_vars or scope.lambda_types)
            l, r = _tag_align(
                scope, l, r, ldt, rdt, exact=not in_lambda, jvm_exact=in_lambda
            )
    if op == "=":
        return l == r
    if op == "<>":
        return l != r
    if op in ("<", "<=", ">", ">="):
        return {"<": l < r, "<=": l <= r, ">": l > r, ">=": l >= r}[op]
    if op == "in":
        from ..graph import _strip_nullability, is_tagged_type, tag_column

        ldt, rdt = _operand_dtype(scope, e.left, l), _operand_dtype(scope, e.right, r)
        # the IN object must be list-shaped (expr.out:42 'object of IN
        # must be a list'); a statically non-list right side errors
        if rdt is not None and not isinstance(rdt, (T.ArrayType, T.NullType)) and not (
            is_tagged_type(rdt)
        ):
            raise CompileError("object of IN must be a list")
        if isinstance(rdt, T.NullType):
            return F.lit(None).cast("boolean")
        if isinstance(ldt, T.NullType):
            # NULL needle: an EMPTY list still yields false (no element to
            # compare, expr.out:38); otherwise three-valued NULL
            return F.when(
                F.coalesce(F.size(r), F.lit(0)) == 0, F.lit(False)
            ).otherwise(F.lit(None).cast("boolean"))
        from ..graph import _entity_kind

        if (
            ldt is not None
            and _entity_kind(_strip_nullability(ldt)) in ("vertex", "edge")
            and isinstance(rdt, T.ArrayType)
            and _entity_kind(_strip_nullability(rdt.elementType)) is not None
        ):
            # entity membership compares by IDENTITY (id), like entity =
            return F.array_contains(
                F.transform(r, lambda x: x.getField("id")), l.getField("id")
            )
        needle_tagged = ldt is not None and is_tagged_type(ldt)
        hay_tagged = isinstance(rdt, T.ArrayType) and is_tagged_type(rdt.elementType)
        kind_mismatch = (
            not needle_tagged
            and not hay_tagged
            and ldt is not None
            and isinstance(rdt, T.ArrayType)
            and not isinstance(rdt.elementType, T.NullType)
            and _strip_nullability(ldt) != _strip_nullability(rdt.elementType)
        )
        if hay_tagged or kind_mismatch or (needle_tagged and isinstance(rdt, T.ArrayType)):
            # membership on the dynamic-kind ladder: compare cmp-keys so
            # 1.0 IN [..., 1, ...] is true (expr.out:174-178 — numeric
            # kinds compare by value) and 1 IN [[1]] is simply false
            # rather than an analysis error
            needle = l if needle_tagged else tag_column(l, ldt)
            if not (scope.lambda_vars or scope.lambda_types):
                # top-level: EXACT keys — the whole haystack through one
                # array-level UDF call (per-element exact keys can't run
                # inside the array_contains lambda), so container elements
                # match by value ([2] IN [[2.0]] true) at any depth
                from ..graph import tagged_cmp_key_exact, tagged_cmp_keys_exact_array

                from ..graph import float8_collapse_eq_pair

                if hay_tagged:
                    hay_t = r
                else:
                    et = rdt.elementType
                    hay_t = F.transform(r, lambda x: tag_column(x, et))
                # the needle key cannot vary per element, so the reference's
                # int-vs-float float8 collapse (agtype_util.c:333) ORs in as
                # a per-pair existence check; it only adds hits the exact
                # keys miss (>2^53 mixed pairs), never removes one.  No
                # let-binding here: the pandas-UDF exact key cannot sit
                # inside a HOF lambda.
                return F.when(
                    F.exists(hay_t, lambda x: float8_collapse_eq_pair(x, needle)),
                    F.lit(True),
                ).otherwise(
                    F.array_contains(
                        tagged_cmp_keys_exact_array(hay_t),
                        tagged_cmp_key_exact(needle),
                    )
                )
            # in-lambda: per-element pure-JVM exact keys (container
            # elements match by value at any width / bounded depth);
            # null elements keep NULL keys so IN's three-valued logic
            # survives (5 IN [null] -> null via array_contains)
            from ..graph import let_column, tagged_cmp_key_jvm

            def _jkey(c):
                return let_column(c, lambda t: tagged_cmp_key_jvm(t))

            from ..graph import float8_collapse_eq_pair

            if hay_tagged:
                hay = F.transform(r, _jkey)
                hay_t = r
            else:
                et = rdt.elementType
                hay = F.transform(r, lambda x: _jkey(tag_column(x, et)))
                hay_t = F.transform(r, lambda x: tag_column(x, et))
            needle_t = needle if needle_tagged else tag_column(l, ldt)
            # same float8-collapse OR as the top-level lane
            return let_column(
                needle_t,
                lambda n: F.when(
                    F.exists(hay_t, lambda x: float8_collapse_eq_pair(x, n)),
                    F.lit(True),
                ).otherwise(F.array_contains(hay, _jkey(n))),
            )
        return F.array_contains(r, l)
    if op in ("starts with", "ends with", "contains", "=~"):
        from ..graph import is_tagged_type

        # a dynamic-kind operand contributes its string slot; non-string
        # kinds yield NULL -> three-valued null, matching the reference's
        # string-op null result on non-string agtype input
        ldt = _operand_dtype(scope, e.left, l)
        rdt = _operand_dtype(scope, e.right, r)
        if ldt is not None and is_tagged_type(ldt):
            l = l.getField("__s")
        if rdt is not None and is_tagged_type(rdt):
            r = r.getField("__s")
        if op == "starts with":
            return l.startswith(r)
        if op == "ends with":
            return l.endswith(r)
        if op == "contains":
            return l.contains(r)
        return F.regexp_like(l, r)
    if op in ("@>", "<@"):
        # jsonb containment over column operands (agtype_ops.c @>/<@;
        # list_comprehension.sql `u.list@>[i IN range(0,6,2)]`)
        ldt = _operand_dtype(scope, e.left, l)
        rdt = _operand_dtype(scope, e.right, r)
        big, bdt = (l, ldt) if op == "@>" else (r, rdt)
        small_ast = e.right if op == "@>" else e.left
        small, sdt = (r, rdt) if op == "@>" else (l, ldt)
        from ..graph import _entity_kind, _strip_nullability

        if bdt is not None and _entity_kind(_strip_nullability(bdt)) in ("vertex", "edge"):
            # an entity contains what its properties object contains
            # (jsonb_operators.sql `n @> {json: ...}`)
            big = big.getField("properties")
            bdt = next(
                f.dataType for f in _strip_nullability(bdt).fields if f.name == "properties"
            )
        from .patterns import _lit_tree, _MISS, _contains

        qv = _lit_tree(small_ast)
        if qv is not _MISS:
            # literal small side: full recursive jsonb subset semantics
            return _contains(big, bdt, qv)
        return compile_containment(big, bdt, small, sdt)
    if op in ("?", "?|", "?&"):
        # agtype existence operators (agtype_ops.c agtype_exists_agtype
        # family): objects check top-level KEYS (string keys only), arrays
        # their scalar ELEMENTS by same-type VALUE equality, a scalar
        # string itself — `?` one key, `?|` any, `?&` all.  A non-scalar
        # key element short-circuits the whole operator to false, in
        # list order; null key elements skip.
        from ..graph import _strip_nullability as _sn
        from ..graph import is_tagged_type as _itt

        ldt = _operand_dtype(scope, e.left, l)
        keys = _existence_keys(l, ldt)
        if keys is None:
            return F.lit(None).cast("boolean")
        rdt = _operand_dtype(scope, e.right, r)
        if op == "?":
            if rdt is None:
                renc = F.concat(F.lit("s:"), r.cast("string"))
            elif isinstance(rdt, T.NullType):
                renc = F.lit(None).cast("string")
            elif isinstance(_sn(rdt), (T.ArrayType, T.StructType, T.MapType)) and not _itt(
                _sn(rdt)
            ):
                return F.when(keys.isNotNull(), F.lit(False))  # non-scalar key
            else:
                renc = _exist_enc_concrete(r, rdt)
                if renc is None:
                    return F.when(keys.isNotNull(), F.lit(False))
            return (
                F.when(keys.isNull(), F.lit(None).cast("boolean"))
                .when(renc.isNull(), F.lit(False))
                .otherwise(F.coalesce(F.array_contains(keys, renc), F.lit(False)))
            )
        if rdt is not None and not isinstance(rdt, (T.ArrayType, T.NullType)):
            # ?| / ?& take a key LIST (jsonb_operators.out:33-39 errors)
            raise CompileError(
                f"{op} requires an agtype list of strings on the right side"
            )
        rarr = r if isinstance(rdt, T.ArrayType) else F.array(r)
        if isinstance(rdt, T.ArrayType):
            et = _sn(rdt.elementType)
            if _itt(et):
                enc_fn = _exist_enc_tagged
                sc_fn = lambda x: x.getField("__k") >= 5  # noqa: E731
            else:
                probe = _exist_enc_concrete(F.lit(None), et)
                if probe is None:  # statically non-scalar elements
                    enc_fn = lambda x: F.lit(None).cast("string")  # noqa: E731
                    sc_fn = lambda x: F.lit(False)  # noqa: E731
                else:
                    enc_fn = lambda x: _exist_enc_concrete(x, et)  # noqa: E731
                    sc_fn = lambda x: F.lit(True)  # noqa: E731
        else:
            enc_fn = lambda x: F.concat(F.lit("s:"), x.cast("string"))  # noqa: E731
            sc_fn = lambda x: F.lit(True)  # noqa: E731
        pairs = F.transform(
            rarr, lambda x: F.struct(enc_fn(x).alias("e"), sc_fn(x).alias("sc"))
        )
        hit = lambda p: F.coalesce(  # noqa: E731
            F.array_contains(keys, p.getField("e")), F.lit(False)
        )
        if op == "?|":
            # fold state: 0 = no match yet, 1 = matched, 2 = aborted
            state = F.aggregate(
                pairs,
                F.lit(0),
                lambda acc, p: F.when(acc != 0, acc)
                .when(~F.coalesce(p.getField("sc"), F.lit(True)), F.lit(2))
                .when(p.getField("e").isNull(), acc)
                .when(hit(p), F.lit(1))
                .otherwise(acc),
            )
            return F.when(keys.isNull(), F.lit(None).cast("boolean")).otherwise(
                state == 1
            )
        # ?&: 0 = all satisfied so far, 2 = failed
        state = F.aggregate(
            pairs,
            F.lit(0),
            lambda acc, p: F.when(acc != 0, acc)
            .when(~F.coalesce(p.getField("sc"), F.lit(True)), F.lit(2))
            .when(p.getField("e").isNull(), acc)
            .when(hit(p), acc)
            .otherwise(F.lit(2)),
        )
        return F.when(keys.isNull(), F.lit(None).cast("boolean")).otherwise(state == 0)
    if op == "->>":
        # jsonb `->>`: access, then the value AS TEXT (strings unquoted,
        # containers as their JSON text)
        inner = compile_expr(scope, A.Index(e.left, e.right, arrow=True))
        idt = dtype_of(scope, inner)
        if idt is None or isinstance(idt, T.NullType):
            return inner
        from ..graph import is_tagged_type

        if is_tagged_type(idt):
            return _tagged_to_string(inner)
        if isinstance(idt, (T.ArrayType, T.StructType, T.MapType)):
            return F.to_json(inner)
        return inner.cast("string")
    if op == "||":
        return _compile_concat_op(scope, e, l, r)
    if op in ("#>", "#>>"):
        return _compile_path_extract(scope, e, l, op == "#>>")
    if op in ("+", "-", "*", "/", "%", "^"):
        from ..graph import _entity_kind, _scalar_kind, is_tagged_type

        ldt = _operand_dtype(scope, e.left, l)
        rdt = _operand_dtype(scope, e.right, r)
        if op in ("+", "-", "*"):
            from . import vectors as V

            if V.is_vector_dt(ldt) or V.is_vector_dt(rdt):
                # a ::vector operand flips + - * to elementwise float4
                # arithmetic (pgvector.out: [1,2,3]::vector + [1,2,4]::vector
                # = [2,4,7]); || concat needs no branch — float arrays
                # concatenate type-preserving below
                return V.elementwise(op, V.as_vector(l, ldt), V.as_vector(r, rdt))
        # arithmetic on a mixed-kind dynamic value uses its numeric slots;
        # non-numeric rows null-propagate (the reference raises per value —
        # a per-row error is not expressible in a vectorized plan). The
        # numeric KIND is preserved per age_agtype ops: int op int stays
        # exact int64 via the __i payloads, any float promotes.
        lt_tag = ldt is not None and is_tagged_type(ldt)
        rt_tag = rdt is not None and is_tagged_type(rdt)
        if lt_tag or rt_tag:
            # `^` included: int/float rows ride float8 pow, NUMERIC rows
            # route through numeric_power display scales (agtype_pow,
            # agtype_ops.c:984,1040) via the exact Arrow kernel
            return _tagged_arith(
                op, l, ldt, lt_tag, r, rdt, rt_tag,
                # the row-level Arrow kernel cannot run inside HOF
                # lambdas; tree-shaped lambda bodies pre-project through
                # the array kernels instead (_lambda_arith_pre,
                # _listcomp_numeric_fixup, _reduce_numeric_fixup) — only
                # NON-tree in-lambda arithmetic keeps the bounded
                # DECIMAL(38,18) lane
                exact_num=not (scope.lambda_vars or scope.lambda_types),
            )
        if op == "-":
            # jsonb removal operators (expr.out:165-167): map - 'key'
            # drops the key, list - i drops the element at index i
            # (negatives count from the end; out-of-range is a no-op)
            if (
                ldt is not None
                and _is_struct(ldt)
                and _entity_kind(_strip(ldt)) is None
                and rdt is not None
                and _is_string(rdt)
                and isinstance(e.right, A.Lit)
            ):
                key = e.right.value
                keep = [
                    l.getField(f.name).alias(f.name)
                    for f in ldt.fields
                    if f.name != key
                ]
                if len(keep) == len(ldt.fields):
                    return l  # unknown key: unchanged
                if not keep:
                    return F.struct(F.lit(None).cast("string").alias("_none"))
                return F.struct(*keep)
            if (
                ldt is not None
                and _is_array(ldt)
                and rdt is not None
                and not isinstance(rdt, (T.FloatType, T.DoubleType, T.DecimalType))
                and _scalar_kind(_strip(rdt)) == "numeric"
            ):
                def _rm(arr):
                    n = F.size(arr)
                    i0 = r.cast("int")
                    i = F.when(i0 < 0, n + i0).otherwise(i0)
                    return F.when(
                        (i >= 0) & (i < n),
                        F.concat(F.slice(arr, 1, i), F.slice(arr, i + 2, n - i - 1)),
                    ).otherwise(arr)

                from ..graph import let_column

                return let_column(l, _rm)
        if op == "+":
            if (ldt is not None and _is_string(ldt)) or (rdt is not None and _is_string(rdt)):
                return F.concat(l.cast("string"), r.cast("string"))
            if ldt is not None and _is_array(ldt):
                if rdt is not None and _is_array(rdt):
                    # element types may differ ([] + [x], [1] + ['a']):
                    # align via element tagging like any dynamic list
                    return _concat_arrays(l, ldt.elementType, r, rdt.elementType)
                # list + elem appends (agtype_ops.c:145)
                return _concat_arrays(l, ldt.elementType, F.array(r), rdt)
        return _numeric_binary(op, l, r, ldt, rdt)
    raise CompileError(f"unknown binary op {op}")


def _compile_case(scope: ExprScope, e: A.CaseExpr) -> Column:
    from ..graph import _scalar_kind, is_tagged_type, tag_column

    # conditions: operand form compares on the KIND LADDER (CASE n.j WHEN
    # 'b' with a non-string n.j is false, not an analysis error — reuse the
    # `=` machinery); searched form wants a boolean — a statically
    # numeric/string condition errors like AND/OR operands (expr.out:825),
    # dynamic values read their bool slot
    conds: list[Column] = []
    for cond, _res in e.whens:
        if e.operand is not None:
            conds.append(compile_expr(scope, A.Binary("=", e.operand, cond)))
            continue
        c = compile_expr(scope, cond)
        cdt = _operand_dtype(scope, cond, c)
        if cdt is not None and not isinstance(cdt, (T.NullType, T.BooleanType)):
            if is_tagged_type(cdt):
                c = c.getField("__b")
            else:
                k = _scalar_kind(cdt)
                if k in ("numeric", "string"):
                    raise CompileError(
                        "cannot cast agtype "
                        + ("integer" if k == "numeric" else "string")
                        + " to type boolean"
                    )
        conds.append(c.cast("boolean"))

    # branch RESULTS with conflicting kinds merge into a dynamic value
    # (CASE WHEN ... THEN 'text' ELSE n.i END — expr.out CASE blocks)
    results = [(res, compile_expr(scope, res)) for _c, res in e.whens]
    if e.default is not None:
        results.append((e.default, compile_expr(scope, e.default)))
    dts = [_operand_dtype(scope, ast_e, c) for ast_e, c in results]
    from ..graph import TAGGED_TYPE, _strip_nullability, _widen

    tgt = None
    known = [dt for dt in dts if dt is not None and not isinstance(dt, T.NullType)]
    if len(known) > 1:
        try:
            tgt = known[0]
            for dt in known[1:]:
                tgt = _widen(tgt, dt)
        except Exception:
            tgt = None
    cols = []
    for (ast_e, c), dt in zip(results, dts):
        if tgt is not None and is_tagged_type(tgt):
            if dt is None or isinstance(dt, T.NullType):
                c = F.lit(None).cast(TAGGED_TYPE)
            elif not is_tagged_type(dt):
                c = tag_column(c, dt)
        cols.append(c)

    out = None
    for c, rcol in zip(conds, cols[: len(e.whens)]):
        out = F.when(c, rcol) if out is None else out.when(c, rcol)
    if out is None:
        raise CompileError("CASE requires at least one WHEN")
    if e.default is not None:
        out = out.otherwise(cols[-1])
    return out


def _elem_type(
    scope: ExprScope, src_col: Column, sdt: Optional[T.DataType] = None
) -> Optional[T.DataType]:
    """Element type of an array source.  ``sdt`` (when the caller already
    resolved the source type — possibly via the lambda hint map, where
    dtype_of cannot) takes precedence: a NESTED comprehension's source is
    a lambda variable whose schema probe fails, and losing the element
    type here dropped tagged dispatch inside inner lambdas (round 10)."""
    dt = sdt if sdt is not None else dtype_of(scope, src_col)
    return dt.elementType if isinstance(dt, T.ArrayType) else None


def _flatten_arith_tree(e, leaves: list):
    """Serialize a projection AST into the pgnumeric tree form: nested
    ('op', l, r) tuples over integer LEAF indexes (maximal non-arithmetic
    subtrees, appended to ``leaves``), plus the unary nodes
    ('neg'|'abs', child, None) — the two numeric functions the reference
    evaluates EXACTLY on NUMERIC (numeric_uminus; numeric_abs via
    age_abs, agtype.c:10517 — floor/ceil/round/sign return FLOAT there,
    so they stay leaves).  Returns None when the root is neither."""
    if isinstance(e, A.Binary) and e.op in ("+", "-", "*", "/", "%", "^"):
        l = _flatten_arith_tree(e.left, leaves)
        if l is None:
            leaves.append(e.left)
            l = len(leaves) - 1
        r = _flatten_arith_tree(e.right, leaves)
        if r is None:
            leaves.append(e.right)
            r = len(leaves) - 1
        return (e.op, l, r)
    if isinstance(e, A.Unary) and e.op == "+":
        return _flatten_arith_tree(e.expr, leaves)
    inner = None
    if isinstance(e, A.Unary) and e.op == "-":
        kind, inner = "neg", e.expr
    elif isinstance(e, A.FuncCall) and e.name == "abs" and len(e.args) == 1:
        kind, inner = "abs", e.args[0]
    if inner is not None:
        c = _flatten_arith_tree(inner, leaves)
        if c is None:
            leaves.append(inner)
            c = len(leaves) - 1
        return (kind, c, None)
    return None


def _arith_leaf_slots(sub: "ExprScope", lf, j: int) -> list:
    """d/i/n payload-slot text Columns of one arithmetic-tree leaf under
    an element-bound scope (names s{j}d / s{j}i / s{j}n).  All slots go
    to TEXT JVM-side: pandas float64 NaN would alias SQL NULL for __n,
    and int64-with-nulls rounds >2^53 for __i."""
    from ..graph import _strip_nullability, dec_trim_text, is_tagged_type

    c = compile_expr(sub, lf)
    dt = _operand_dtype(sub, lf, c)
    sdt = _strip_nullability(dt) if dt is not None else None
    if sdt is not None and is_tagged_type(sdt):
        num = F.when(c.getField("__k") == 7, F.lit(True))
        return [
            c.getField("__d").alias(f"s{j}d"),
            F.when(num, c.getField("__i")).cast("string").alias(f"s{j}i"),
            F.when(num, c.getField("__n")).cast("string").alias(f"s{j}n"),
        ]
    if sdt is not None and isinstance(sdt, T.DecimalType):
        return [
            dec_trim_text(c.cast("string")).alias(f"s{j}d"),
            F.lit(None).cast("string").alias(f"s{j}i"),
            F.lit(None).cast("string").alias(f"s{j}n"),
        ]
    if sdt is not None and _is_integral(sdt):
        return [
            F.lit(None).cast("string").alias(f"s{j}d"),
            c.cast("long").cast("string").alias(f"s{j}i"),
            F.lit(None).cast("string").alias(f"s{j}n"),
        ]
    if sdt is not None and isinstance(sdt, (T.FloatType, T.DoubleType)):
        return [
            F.lit(None).cast("string").alias(f"s{j}d"),
            F.lit(None).cast("string").alias(f"s{j}i"),
            c.cast("double").cast("string").alias(f"s{j}n"),
        ]
    # statically non-numeric (string/bool/container/null): no number
    return [
        F.lit(None).cast("string").alias(f"s{j}d"),
        F.lit(None).cast("string").alias(f"s{j}i"),
        F.lit(None).cast("string").alias(f"s{j}n"),
    ]


def _listcomp_numeric_fixup(scope: ExprScope, e: A.ListComp, et):
    """Exact NUMERIC arithmetic inside a list-comprehension PROJECTION:
    the row-level Arrow kernel cannot run inside the transform lambda, so
    pre-project each element's operand slots (pure JVM), evaluate the
    whole arithmetic tree through ONE array-level kernel call, and return
    a function ``arr -> exact __d text array`` to splice into the
    (bounded-lane) projected elements.  None when the projection is not
    an arithmetic tree or no leaf can carry a NUMERIC kind (the JVM
    int/float lanes are already exact — no Arrow stage is added then)."""
    from ..graph import _strip_nullability, dec_trim_text, is_tagged_type

    if scope.lambda_vars or scope.lambda_types:
        # a pandas UDF cannot run inside a HOF lambda: a NESTED-inner
        # comprehension keeps the bounded DECIMAL(38,18) lane (the
        # documented residual) instead of failing analysis with
        # LAMBDA_FUNCTION_WITH_PYTHON_UDF (caught round 10)
        return None
    if e.projection is None or not isinstance(e.projection, A.Binary):
        return None
    leaves: list = []
    tree = _flatten_arith_tree(e.projection, leaves)
    if tree is None or not leaves:
        return None

    def _is_tagged_leaf(ast_node) -> bool:
        # is this leaf STATICALLY tagged (dynamic / NUMERIC-capable)?  The
        # projection's element type is tagged exactly when some operand is,
        # and the splice below reads tagged fields — so the fix applies
        # only on a definite yes; unknown leaves keep the bounded lane
        # (status quo), and pure int/float trees skip the Arrow stage
        # entirely (their JVM lanes are already exact).
        if isinstance(ast_node, A.Var) and ast_node.name == e.var:
            dt = et
        else:
            try:
                c = compile_expr(
                    scope.child({e.var: F.lit(None)}, {e.var: et} if et else {}),
                    ast_node,
                )
            except Exception:
                return False
            dt = _operand_dtype(scope, ast_node, c)
        return dt is not None and is_tagged_type(_strip_nullability(dt))

    if not any(_is_tagged_leaf(lf) for lf in leaves):
        return None

    def _leaf_slots(x: Column, j: int, lf) -> list:
        sub = scope.child({e.var: x}, {e.var: et} if et else {})
        return _arith_leaf_slots(sub, lf, j)

    from ..runtime.pgnumeric import make_numeric_tree_udf

    kernel = make_numeric_tree_udf(tree, len(leaves))

    def _dtexts(arr: Column) -> Column:
        slots = F.transform(
            arr,
            lambda x: F.struct(
                *[s for j, lf in enumerate(leaves) for s in _leaf_slots(x, j, lf)]
            ),
        )
        return kernel(slots, F.lit(None).cast("string"))

    return _dtexts


def _splice_exact_tagged(v: Column, d: Column) -> Column:
    """Replace a tagged NUMERIC value's __d payload (and its float8
    shadow) with the exact kernel text ``d``; non-numeric rows and rows
    the kernel declined (NULL text) keep the JVM value."""
    from ..graph import TAGGED_TYPE

    fixed = F.struct(
        *[
            (
                d.alias("__d")
                if f.name == "__d"
                else (
                    F.coalesce(d.cast("double"), v.getField("__n")).alias("__n")
                    if f.name == "__n"
                    else v.getField(f.name).alias(f.name)
                )
            )
            for f in TAGGED_TYPE.fields
        ]
    )
    return F.when(d.isNotNull() & (v.getField("__k") == 7), fixed).otherwise(v)


def _find_arith_subtrees(scope: ExprScope, body, var: str, et) -> list:
    """Maximal arithmetic subtrees of a lambda-body AST whose leaves
    include a STATICALLY tagged (NUMERIC-capable) operand and reference
    no lambda variable other than ``var``.  Descent stops at nested
    binder nodes (their element vars aren't bound in a pre-projection)."""
    from ..graph import _strip_nullability, is_tagged_type

    found: list = []

    def _leaf_ok_and_tagged(leaves):
        any_tagged = False
        for lf in leaves:
            try:
                sub = scope.child({var: F.lit(None)}, {var: et} if et else {})
                c = compile_expr(sub, lf)
                dt = _operand_dtype(sub, lf, c)
            except Exception:
                return False  # unresolvable leaf (nested-lambda var etc.)
            sdt = _strip_nullability(dt) if dt is not None else None
            if sdt is not None and is_tagged_type(sdt):
                any_tagged = True
        return any_tagged

    def walk(node):
        if not hasattr(node, "__dict__") or not node.__class__.__module__.endswith(
            "ast"
        ):
            return
        if isinstance(node, A.Binary) and node.op in ("+", "-", "*", "/", "%", "^"):
            leaves: list = []
            tree = _flatten_arith_tree(node, leaves)
            if tree is not None and leaves and _leaf_ok_and_tagged(leaves):
                found.append((node, tree, leaves))
                return
        if isinstance(node, (A.ListComp, A.PredFn, A.Reduce)):
            return
        for v in vars(node).values():
            items = v if isinstance(v, (list, tuple)) else [v]
            for it in items:
                for it2 in it if isinstance(it, tuple) else [it]:
                    walk(it2)

    walk(body)
    return found


def _ast_replace(e, mapping: dict):
    """Deep-copy an expression AST substituting nodes by identity."""
    import copy

    if id(e) in mapping:
        return mapping[id(e)]
    if not hasattr(e, "__dict__") or not e.__class__.__module__.endswith("ast"):
        return e
    c = copy.copy(e)
    for k, v in vars(e).items():
        if isinstance(v, list):
            setattr(c, k, [_ast_replace(i, mapping) for i in v])
        elif isinstance(v, tuple):
            setattr(c, k, tuple(_ast_replace(i, mapping) for i in v))
        else:
            setattr(c, k, _ast_replace(v, mapping))
    return c


def _lambda_arith_pre(scope: ExprScope, body, var: str, src: Column, et):
    """Exact NUMERIC arithmetic inside a lambda PREDICATE (quantifier
    WHERE, list-comprehension filter): pre-compute each arithmetic
    subtree's exact value per element (JVM slot projection + one Arrow
    tree-kernel call per subtree), zip the spliced values with the
    elements, and rewrite the body to read them.  The comparison then
    runs on exact __d payloads through the in-lambda JVM keys.  Returns
    (zipped_source, rewritten_body, child_scope_factory) or None when no
    subtree qualifies (pure int/float predicates add no Arrow stage)."""
    from ..graph import TAGGED_TYPE

    if scope.lambda_vars or scope.lambda_types:
        return None  # a pandas UDF cannot run inside a HOF lambda
    subs = _find_arith_subtrees(scope, body, var, et)
    if not subs:
        return None
    from ..runtime.pgnumeric import make_numeric_tree_udf

    pre_arrays = []
    for node, tree, leaves in subs:
        # closure factories keep the HOF lambdas UNARY (a second python
        # parameter — even a defaulted one — would receive the array
        # index)
        def _proj_of(_n):
            return lambda x: compile_expr(
                scope.child({var: x}, {var: et} if et else {}), _n
            )

        def _slots_of(_ls):
            return lambda x: F.struct(
                *[
                    s
                    for j, lf in enumerate(_ls)
                    for s in _arith_leaf_slots(
                        scope.child({var: x}, {var: et} if et else {}), lf, j
                    )
                ]
            )

        projected = F.transform(src, _proj_of(node))
        slots = F.transform(src, _slots_of(leaves))
        exact = make_numeric_tree_udf(tree, len(leaves))(
            slots, F.lit(None).cast("string")
        )
        pre_arrays.append(F.zip_with(projected, exact, _splice_exact_tagged))

    mapping = {
        id(node): A.Var(f"__arith{k}") for k, (node, _, _) in enumerate(subs)
    }
    new_body = _ast_replace(body, mapping)
    # chained zip_with: each pre-array is an Arrow-kernel result, which
    # must evaluate OUTSIDE any lambda — zip_with's array inputs do
    zsrc = F.zip_with(
        src,
        pre_arrays[0],
        lambda x, p: F.struct(x.alias("e"), p.alias("p0")),
    )
    for k in range(1, len(pre_arrays)):

        def _zip_of(_k):
            return lambda z, p: F.struct(
                z.getField("e").alias("e"),
                *[z.getField(f"p{i}").alias(f"p{i}") for i in range(_k)],
                p.alias(f"p{_k}"),
            )

        zsrc = F.zip_with(zsrc, pre_arrays[k], _zip_of(k))

    def mkchild(z: Column) -> ExprScope:
        binds = {var: z.getField("e")}
        types = dict({var: et} if et else {})
        for k in range(len(subs)):
            binds[f"__arith{k}"] = z.getField(f"p{k}")
            types[f"__arith{k}"] = TAGGED_TYPE
        return scope.child(binds, types)

    return zsrc, new_body, mkchild


def _compile_listcomp(scope: ExprScope, e: A.ListComp) -> Column:
    from ..graph import TAGGED_TYPE, is_tagged_type, let_column

    src = compile_expr(scope, e.source)
    sdt = _operand_dtype(scope, e.source, src)
    if sdt is not None and is_tagged_type(sdt):
        # dynamic source: iterate the array-kind payload's elements (kinds
        # preserved); non-array rows yield NULL like the reference's
        # iterator on a non-list
        src = let_column(
            src,
            lambda c: F.when(c.getField("__k") == 4, tagged_json_elements(c)).otherwise(
                F.lit(None).cast(T.ArrayType(TAGGED_TYPE))
            ),
        )
        et = TAGGED_TYPE
    else:
        et = _elem_type(scope, src, sdt)
    fix = (
        _listcomp_numeric_fixup(scope, e, et) if e.projection is not None else None
    )

    def _project(x: Column) -> Column:
        return compile_expr(
            scope.child({e.var: x}, {e.var: et} if et else {}), e.projection
        )

    out = src
    if e.where is not None:
        pre = _lambda_arith_pre(scope, e.where, e.var, out, et)
        if pre is not None:
            # exact predicate arithmetic: filter the zipped source.  The
            # projection's exact texts must ALSO pre-compute here (two
            # stacked Arrow kernels cannot nest in one expression), so
            # they ride the zip — the kernel is exception-free on
            # elements the WHERE excludes, while the projection's JVM
            # lanes (whose ANSI division raise is the reference's error
            # surface) stay post-filter
            zsrc, wbody, mkchild = pre
            if fix is not None:
                zsrc = F.zip_with(
                    zsrc,
                    fix(src),
                    lambda z, d: z.withField("pd", d),
                )
            zf = F.filter(
                zsrc, lambda z: compile_expr(mkchild(z), wbody).cast("boolean")
            )
            if e.projection is None:
                return F.transform(zf, lambda z: z.getField("e"))
            if fix is not None:
                return F.transform(
                    zf,
                    lambda z: _splice_exact_tagged(
                        _project(z.getField("e")), z.getField("pd")
                    ),
                )
            # projection may still hold NON-root arithmetic (e.g.
            # toString(x*y)): unwrap the filtered elements and fall
            # through to the shared projection pre-pass below
            out = F.transform(zf, lambda z: z.getField("e"))
        else:
            out = F.filter(out, lambda x: compile_expr(
                scope.child({e.var: x}, {e.var: et} if et else {}), e.where).cast("boolean"))
    if e.projection is not None:
        filtered = out
        if fix is not None:
            out = F.transform(filtered, _project)
            out = F.zip_with(out, fix(filtered), _splice_exact_tagged)
        else:
            # NON-root arithmetic inside the projection (an arithmetic
            # operand feeding a non-arithmetic function, e.g.
            # `toString(x*y)`): the root-tree fixup above cannot splice
            # into a consumed value, but the predicate pre-pass machinery
            # can — pre-compute each maximal arithmetic subtree's exact
            # tagged value per (already filtered) element and rewrite the
            # projection to read it, so downstream functions see the exact
            # __d payload (closes the r7 "non-tree in-lambda" NUMERIC
            # bound for projections; fold steps and inner lambdas remain
            # the documented residual)
            proj_pre = _lambda_arith_pre(scope, e.projection, e.var, filtered, et)
            if proj_pre is not None:
                pz, pbody, pmk = proj_pre
                out = F.transform(pz, lambda z: compile_expr(pmk(z), pbody))
            else:
                out = F.transform(filtered, _project)
    return out


def _compile_predfn(scope: ExprScope, e: A.PredFn) -> Column:
    from ..graph import TAGGED_TYPE, is_tagged_type, let_column

    src = compile_expr(scope, e.source)
    sdt = _operand_dtype(scope, e.source, src)
    if sdt is not None and isinstance(sdt, T.NullType):
        return F.lit(None).cast("boolean")  # all/any/... over NULL -> NULL
    if sdt is not None and is_tagged_type(sdt):
        # dynamic source: iterate the array-kind payload's elements (same
        # unwrap as the list-comprehension compiler); non-list rows yield
        # NULL like the reference's iterator on a non-list
        src = let_column(
            src,
            lambda c: F.when(c.getField("__k") == 4, tagged_json_elements(c)).otherwise(
                F.lit(None).cast(T.ArrayType(TAGGED_TYPE))
            ),
        )
        et = TAGGED_TYPE
    else:
        et = _elem_type(scope, src, sdt)

    pre = _lambda_arith_pre(scope, e.where, e.var, src, et)
    if pre is not None:
        # quantifier over the exact-arithmetic zipped source: the
        # predicate's NUMERIC subtrees read pre-spliced exact payloads
        src, wbody, mkchild = pre

        def pred(z):
            return compile_expr(mkchild(z), wbody).cast("boolean")

    else:

        def pred(x):
            return compile_expr(scope.child({e.var: x}, {e.var: et} if et else {}), e.where).cast("boolean")

    if e.kind == "all":
        return F.forall(src, pred)
    if e.kind == "any":
        return F.exists(src, pred)
    if e.kind == "none":
        return ~F.exists(src, pred)
    if e.kind == "single":
        # three-valued: a NULL predicate row makes the exactly-one verdict
        # unknowable unless two trues already force false
        # (predicate_functions.out single() null blocks)
        n_true = F.size(F.filter(src, pred))
        has_null = F.exists(src, lambda x: pred(x).isNull())
        return (
            F.when(n_true > 1, F.lit(False))
            .when(has_null, F.lit(None).cast("boolean"))
            .otherwise(n_true == 1)
        )
    raise CompileError(f"unknown predicate function {e.kind}")


def _tagged_null() -> Column:
    """An agtype-null marker (kind 8): unlike a SQL NULL, it PRINTS as
    `null` — the reference's reduce() returns AGTV_NULL when a step
    evaluates to null, and psql shows the literal text
    (age_reduce.out:158), where a strict-function SQL NULL would show an
    empty cell."""
    from ..graph import TAGGED_TYPE

    return F.named_struct(
        F.lit("__k"), F.lit(8).cast("tinyint"),
        F.lit("__n"), F.lit(None).cast("double"),
        F.lit("__i"), F.lit(None).cast("long"),
        F.lit("__d"), F.lit(None).cast("string"),
        F.lit("__s"), F.lit(None).cast("string"),
        F.lit("__b"), F.lit(None).cast("boolean"),
        F.lit("__o"), F.lit(None).cast(
            next(f.dataType for f in TAGGED_TYPE.fields if f.name == "__o")
        ),
        F.lit("__j"), F.lit(None).cast("string"),
    ).cast(TAGGED_TYPE)


def _ast_any(e, pred) -> bool:
    """Walk an expression AST; True if pred holds anywhere."""
    if pred(e):
        return True
    for v in vars(e).values() if hasattr(e, "__dict__") else []:
        items = v if isinstance(v, (list, tuple)) else [v]
        for it in items:
            if isinstance(it, tuple):
                items2 = list(it)
            else:
                items2 = [it]
            for it2 in items2:
                if hasattr(it2, "__dict__") and it2.__class__.__module__.endswith("ast"):
                    if _ast_any(it2, pred):
                        return True
    return False


def _reduce_may_null(scope: ExprScope, e: A.Reduce) -> bool:
    """Static check: can this reduce() see a null during folding?  True
    when a null literal appears in the subtree or a referenced variable's
    column is typed NULL.  Only such reduces pay the dynamic-value wrap
    that preserves the agtype-null print."""
    def p(x):
        if isinstance(x, A.Lit) and x.value is None:
            return True
        if isinstance(x, A.Var):
            try:
                dt = dtype_of(scope, F.col(x.name))
            except Exception:
                return False
            return dt is not None and isinstance(dt, T.NullType)
        return False

    return any(_ast_any(part, p) for part in (e.source, e.init, e.expr))


def _reduce_numeric_fixup(scope: ExprScope, e: A.Reduce, src, et, init, idt, rdt):
    """Exact NUMERIC arithmetic inside a reduce() FOLD: when the body is
    a pure arithmetic tree whose accumulator references are bare leaves,
    one Arrow kernel call replays the WHOLE fold value-level (the
    reference folds through agtype-numeric ops step by step, age_reduce)
    and splices the exact __d text into the JVM fold result.  None when
    the body is not tree-expressible, the accumulator feeds a
    non-arithmetic subexpression, or no operand can statically carry a
    NUMERIC kind (the JVM int/float fold lanes are already exact — no
    Arrow stage is added then)."""
    from ..graph import TAGGED_TYPE, _strip_nullability, dec_trim_text, is_tagged_type, let_column

    if scope.lambda_vars or scope.lambda_types:
        return None  # a pandas UDF cannot run inside a HOF lambda

    # step bodies ROOTED at a float-returning wrapper (floor/ceil/
    # round[0]/sign — float in the reference too, age_ceil
    # agtype.c:10451): the merge type is double (long for sign), so the
    # tagged-rdt gate below would bail and the pre-wrapper arithmetic
    # would ride the bounded in-lambda DECIMAL(38,18) lane — the r9
    # residual.  Unwrap the root and fold through the exact kernel with
    # the wrapper applied per step (reference order: exact numeric op,
    # THEN float8).
    wrapper = None
    body = e.expr
    if isinstance(body, A.FuncCall):
        if body.name in ("ceil", "floor", "sign") and len(body.args) == 1:
            wrapper, body = body.name, body.args[0]
        elif body.name == "round" and (
            len(body.args) == 1
            or (
                len(body.args) == 2
                and isinstance(body.args[1], A.Lit)
                and body.args[1].value in (None, 0)
            )
        ):
            wrapper, body = "round0", body.args[0]
    srt = _strip_nullability(rdt) if rdt is not None else None
    if wrapper is not None:
        want = T.LongType if wrapper == "sign" else T.DoubleType
        if srt is None or not isinstance(srt, want):
            return None
    elif srt is None or not is_tagged_type(srt):
        return None  # statically-typed folds stay on the exact JVM lanes
    leaves: list = []
    tree = _flatten_arith_tree(body, leaves)
    if tree is None or not leaves:
        return None
    acc_ix = []
    for j, lf in enumerate(leaves):
        if isinstance(lf, A.Var) and lf.name == e.acc:
            acc_ix.append(j)
        elif _ast_any(lf, lambda x, _a=e.acc: isinstance(x, A.Var) and x.name == _a):
            return None  # acc inside a non-arithmetic leaf

    def _cap(dt):
        s = _strip_nullability(dt) if dt is not None else None
        return s is not None and (is_tagged_type(s) or isinstance(s, T.DecimalType))

    cap = _cap(idt)
    for j, lf in enumerate(leaves):
        if cap or j in acc_ix:
            continue
        try:
            sub = scope.child({e.var: F.lit(None)}, {e.var: et} if et else {})
            c = compile_expr(sub, lf)
            cap = _cap(_operand_dtype(sub, lf, c))
        except Exception:
            continue
    if not cap:
        return None

    # init d/i/n slot texts from its (post-widen) static type
    sidt = _strip_nullability(idt) if idt is not None else None
    nil = F.lit(None).cast("string")
    if sidt is not None and is_tagged_type(sidt):
        num = init.getField("__k") == 7
        d = init.getField("__d")
        i = F.when(num, init.getField("__i")).cast("string")
        n = F.when(num, init.getField("__n")).cast("string")
    elif sidt is not None and isinstance(sidt, T.DecimalType):
        d, i, n = dec_trim_text(init.cast("string")), nil, nil
    elif sidt is not None and _is_integral(sidt):
        d, i, n = nil, init.cast("long").cast("string"), nil
    elif sidt is not None and isinstance(sidt, (T.FloatType, T.DoubleType)):
        d, i, n = nil, nil, init.cast("double").cast("string")
    else:
        return None  # non-numeric init: the fold result is never NUMERIC
    init_slots = F.struct(d.alias("d"), i.alias("i"), n.alias("n"))

    from ..runtime.pgnumeric import (
        make_numeric_fold_udf,
        make_numeric_wrapped_fold_udf,
    )

    if wrapper is not None:
        kernel = make_numeric_wrapped_fold_udf(tree, acc_ix, len(leaves), wrapper)
    else:
        kernel = make_numeric_fold_udf(tree, acc_ix, len(leaves))

    def _elem_struct(x: Column) -> Column:
        sub = scope.child({e.var: x}, {e.var: et} if et else {})
        cols = []
        for j, lf in enumerate(leaves):
            if j in acc_ix:
                cols.extend(
                    F.lit(None).cast("string").alias(f"s{j}{c}") for c in "din"
                )
            else:
                cols.extend(_arith_leaf_slots(sub, lf, j))
        return F.struct(*cols)

    if wrapper is not None:
        # plain value override: the kernel emits the final double/long
        # whenever >= 1 step ran successfully (exactly the rows where the
        # pre-wrapper NUMERIC intermediate matters); None rows — empty
        # array (init passthrough) or operand error (JVM nulls too) —
        # keep the JVM fold result
        def _fix_wrapped(out: Column) -> Column:
            return F.coalesce(
                kernel(init_slots, F.transform(src, _elem_struct)), out
            )

        return _fix_wrapped

    def _fix(out: Column) -> Column:
        dtext = kernel(init_slots, F.transform(src, _elem_struct))

        # let-bind BOTH the fold result and the kernel text (the splice
        # reads each several times; the kernel must evaluate OUTSIDE the
        # binding lambda — a pandas UDF cannot live inside one)
        def _splice(s: Column) -> Column:
            o, dcol = s.getField("o"), s.getField("d")
            fixed = F.struct(
                *[
                    (
                        dcol.alias("__d")
                        if f.name == "__d"
                        else (
                            F.coalesce(dcol.cast("double"), o.getField("__n")).alias("__n")
                            if f.name == "__n"
                            else o.getField(f.name).alias(f.name)
                        )
                    )
                    for f in TAGGED_TYPE.fields
                ]
            )
            return F.when(
                dcol.isNotNull() & (o.getField("__k") == 7), fixed
            ).otherwise(o)

        return let_column(F.struct(out.alias("o"), dtext.alias("d")), _splice)

    return _fix


def _compile_reduce(scope: ExprScope, e: A.Reduce) -> Column:
    # the reference transforms reduce() with a dedicated walker that
    # rejects nested subqueries/reduces (age_reduce.out parity)
    # only the fold BODY rejects nesting — a reduce() as the init value is
    # fine (age_reduce.out: init `s = reduce(...)` runs, body nesting errors)
    if _ast_any(e.expr, lambda x: isinstance(x, A.Reduce)):
        raise CompileError(
            "subqueries (including a nested reduce()) are not supported in a reduce() expression"
        )
    src = compile_expr(scope, e.source)
    init = compile_expr(scope, e.init)
    idt = _operand_dtype(scope, e.init, init)
    sdt = _operand_dtype(scope, e.source, src)
    if sdt is not None and isinstance(sdt, T.NullType):
        # reduce over NULL: strict SQL NULL (empty cell, age_reduce.out:10)
        return F.lit(None)
    from ..graph import TAGGED_TYPE, is_tagged_type, let_column

    if sdt is not None and is_tagged_type(sdt):
        # dynamic source: fold over the array-kind payload's elements
        # (same unwrap as list comprehension); non-list rows yield NULL
        src = let_column(
            src,
            lambda c: F.when(c.getField("__k") == 4, tagged_json_elements(c)).otherwise(
                F.lit(None).cast(T.ArrayType(TAGGED_TYPE))
            ),
        )
        et = TAGGED_TYPE
    else:
        et = _elem_type(scope, src, sdt)

    # F.aggregate requires merge-result type == init type; probe the merge
    # type with stand-in columns (driver-side schema analysis, no job) and
    # widen the init to match (e.g. INT literal init + BIGINT list -> BIGINT)
    probe_types = {}
    if et is not None:
        probe_types[e.var] = et
    if idt is not None:
        probe_types[e.acc] = idt
    probe = compile_expr(
        scope.child({e.acc: init, e.var: F.get(src, 0)}, probe_types), e.expr
    )
    rdt = dtype_of(scope, probe)
    if rdt is not None and isinstance(rdt, T.NullType):
        # a constant-NULL fold body nulls every step — but only if a step
        # RUNS: the empty list returns the (SQL-null) init as an empty
        # cell, a non-empty one folds to agtype null which prints
        # (age_reduce.out:11 vs :13)
        from ..graph import TAGGED_TYPE

        return F.when(
            F.coalesce(F.size(src), F.lit(0)) > 0, _tagged_null()
        ).otherwise(F.lit(None).cast(TAGGED_TYPE))
    if rdt is not None and idt is not None and rdt != idt:
        from ..graph import is_tagged_type, tag_column

        if is_tagged_type(rdt) and not is_tagged_type(idt):
            # a dynamic fold over a plain init: TAG it (a struct CAST from
            # a scalar is an analysis error) — reduce(a = 0, x IN n.list
            # | a + x) is the reference's canonical sum fold
            init = tag_column(init, idt)
        elif (
            is_tagged_type(idt)
            and isinstance(
                rdt, (T.DoubleType, T.FloatType, T.LongType, T.IntegerType,
                      T.DecimalType)
            )
        ):
            # the mirror case: a float-returning step body (floor(acc+x),
            # sqrt(acc+x), ...) merges to a plain scalar while the init is
            # tagged — UNTAG the numeric payload (the struct CAST was an
            # analysis error).  NUMERIC rows convert through the exact
            # __d text; int/float rows through their payload slot.
            num = init.getField("__k") == 7
            init = F.coalesce(
                F.when(num, init.getField("__d")).cast("double"),
                F.when(num, init.getField("__i")).cast("double"),
                F.when(num, init.getField("__n")),
            ).cast(rdt)
        else:
            init = init.cast(rdt)
        idt = rdt

    def merge(acc, x):
        types = {}
        if et is not None:
            types[e.var] = et
        if idt is not None:
            types[e.acc] = idt
        return compile_expr(scope.child({e.acc: acc, e.var: x}, types), e.expr)

    out = F.aggregate(src, init, merge)
    fix = _reduce_numeric_fixup(scope, e, src, et, init, idt, rdt)
    if fix is not None:
        out = fix(out)
    if _reduce_may_null(scope, e):
        # a null CAN flow through the fold: dynamic-value result so a null
        # outcome prints as agtype `null` (age_reduce.out:158), not an
        # empty SQL cell; non-null outcomes keep their kind via tagging
        from ..graph import TAGGED_TYPE, is_tagged_type, tag_column

        rdt2 = rdt if rdt is not None else dtype_of(scope, out)
        if rdt2 is None or isinstance(rdt2, T.NullType):
            # same empty-source rule as the constant-NULL body above
            return F.when(
                F.coalesce(F.size(src), F.lit(0)) > 0, _tagged_null()
            ).otherwise(F.lit(None).cast(TAGGED_TYPE))
        tagged = out if is_tagged_type(rdt2) else tag_column(out, rdt2)
        # agtype-null only when a fold STEP produced it — an empty source
        # passes the SQL-null init through unchanged (age_reduce.out:11)
        return F.when(
            F.coalesce(F.size(src), F.lit(0)) > 0,
            F.coalesce(tagged, _tagged_null()),
        ).otherwise(tagged)
    return out


# ---- function registry

FuncImpl = Callable[[ExprScope, list, list[Column]], Column]
FUNCTIONS: dict[str, FuncImpl] = {}


def fn(name: str):
    def deco(f: FuncImpl):
        FUNCTIONS[name] = f
        return f
    return deco


# single-arg entity/container accessors that return SQL NULL for a NULL
# argument (the reference's strict fns: label(NULL), keys(null), id(null)
# etc. all yield null rather than erroring — agtype.out null-arg blocks)
_NULL_STRICT_FNS = frozenset(
    {
        "id", "label", "type", "properties", "startnode", "endnode",
        "start_id", "end_id", "keys", "head", "last", "tail", "nodes",
        "relationships", "length",
    }
)


def _compile_func(scope: ExprScope, e: A.FuncCall) -> Column:
    name = e.name
    if name in AGG_FNS:
        raise CompileError(
            f"aggregate {name}() must appear in a RETURN/WITH projection"
        )
    if name in _NULL_STRICT_FNS and len(e.args) == 1:
        a0 = e.args[0]
        if isinstance(a0, A.Lit) and a0.value is None:
            return F.lit(None)
    impl = FUNCTIONS.get(name)
    if impl is None:
        # External-function fallthrough (reference parity: ANY SQL function
        # is Cypher-callable with agtype<->native casts,
        # cypher_expr.c transform_external_ext_FuncCall, tested against
        # pgvector/pg_trgm in regress/sql/pgvector.sql). Spark equivalent:
        # unknown names resolve against the session's function registry —
        # builtins and spark.udf.register'ed UDFs.
        spark = scope.ctx.spark
        try:
            exists = spark.catalog.functionExists(name)
        except Exception:
            exists = False
        if exists:
            cols = [compile_expr(scope, a) for a in e.args if not isinstance(a, A.Star)]
            return F.call_function(name, *cols)
        raise CompileError(f"unknown function {name}()")
    cols = [compile_expr(scope, a) for a in e.args if not isinstance(a, A.Star)]
    return impl(scope, e.args, cols)


@fn("id")
def _fn_id(scope, args, cols):
    return cols[0].getField("id")


@fn("start_id")
def _fn_start_id(scope, args, cols):
    return cols[0].getField("start_id")


@fn("end_id")
def _fn_end_id(scope, args, cols):
    return cols[0].getField("end_id")


@fn("label")
def _fn_label(scope, args, cols):
    # expr.out:358-359 — label() rejects non-entity arguments (a list, a
    # plain map without entity shape) at transform time
    k = _arg_kind(scope, args[0], cols[0])
    if k == "null":
        return F.lit(None)
    if k not in (None, "vertex", "edge") or isinstance(args[0], A.MapLit):
        # a LITERAL map is an object, not an entity, even when its keys
        # mimic the vertex shape (expr.out:359)
        raise CompileError("label() argument must resolve to an edge or vertex")
    return cols[0].getField("label")


@fn("labels")
def _fn_labels(scope, args, cols):
    # agtype_labels: the vertex's label list (single-label model -> one
    # entry; the default label is no label at all). cypher_merge.out:1766
    from ..catalog import DEFAULT_VLABEL

    if _arg_kind(scope, args[0], cols[0]) == "null":
        return F.lit(None)
    lbl = cols[0].getField("label")
    return F.when(
        lbl == DEFAULT_VLABEL, F.array().cast("array<string>")
    ).otherwise(F.array(lbl))


@fn("type")
def _fn_type(scope, args, cols):
    # type() is edge-only (expr.out:350 'type() argument must be an edge
    # or null'; agtype.c age_type)
    k = _arg_kind(scope, args[0], cols[0])
    if k == "null":
        return F.lit(None)
    if k not in (None, "edge") or isinstance(args[0], A.MapLit):
        raise CompileError("type() argument must be an edge or null")
    return cols[0].getField("label")


@fn("properties")
def _fn_properties(scope, args, cols):
    # a bare properties() projection must PRINT with the null-means-absent
    # convention ({} for a propertyless vertex, cypher_match.out isEmpty
    # block) — entities get this via the entity printer; a standalone
    # struct needs the marker field agvalue keys on
    p = cols[0].getField("properties")
    dt = dtype_of(scope, p)
    if isinstance(dt, T.StructType):
        # strict: properties(NULL) is NULL, not {} (an out-of-range VLE
        # subscript e[i] yields a NULL edge — cypher_vle.out prints empty)
        return F.when(
            cols[0].isNotNull(),
            F.struct(
                F.lit(None).cast("string").alias("_pstruct"),
                *[p.getField(f.name).alias(f.name) for f in dt.fields],
            ),
        )
    return p


@fn("keys")
def _fn_keys(scope, args, cols):
    if isinstance(args[0], A.MapLit):
        # a LITERAL map keeps explicitly-null-valued keys
        # (expr.out:1077 keys({a: null}) = ["a"]) — unlike stored
        # properties, where null means absent
        names = sorted({k for k, _ in args[0].items}, key=lambda k: (len(k), k))
        if not names:
            return F.expr("array()").cast("array<string>")
        return F.array(*[F.lit(nm) for nm in names])
    c = cols[0]
    dt = dtype_of(scope, c)
    from ..graph import _entity_kind, _strip_nullability

    if dt is not None and _entity_kind(_strip_nullability(dt)) == "path":
        # expr.out:887 — a PATH has no keys
        raise CompileError("keys() argument must be a vertex, edge, object or null")
    if dt is not None and _is_struct(dt):
        names = _entity_fields(dt)
        if "properties" in names and "id" in names:
            pdt = next(f.dataType for f in dt.fields if f.name == "properties")
            c = c.getField("properties")
            dt = pdt
        # JSONB key order: (length, bytes) — matches the reference's
        # keys()/object print order (agtype_util.c key sort)
        names_sorted = sorted(
            (f2.name for f2 in dt.fields if f2.name != "_none"),
            key=lambda k: (len(k), k),
        )
        items = [
            F.when(c.getField(nm).isNotNull(), F.lit(nm))
            for nm in names_sorted
        ]
        if not items:
            return F.expr("array()").cast("array<string>")
        return F.array_compact(F.array(*items))
    if dt is not None and _is_map(dt):
        return F.map_keys(c)
    raise CompileError("keys() requires a map or entity")


@fn("tojson")
def _fn_tojson(scope, args, cols):
    """Serialize a list/map/struct value to its JSON text.

    The agtype<->jsonb bridge surface (reference: sql/agtype_coercions.sql
    181-202, regress/sql/agtype_jsonb_cast.sql): where the reference casts
    agtype to jsonb, we print the JSON text of the compiled Spark value.
    """
    return F.to_json(cols[0])


@fn("fromjson")
def _fn_fromjson(scope, args, cols):
    """Parse a JSON string into a typed value: fromJson(s, 'array<bigint>').

    The inverse half of the jsonb bridge (reference: jsonb->agtype cast,
    sql/agtype_coercions.sql). The second argument is a Spark DDL type
    string and must be a literal.
    """
    if len(args) != 2 or not isinstance(args[1], A.Lit) or not isinstance(args[1].value, str):
        raise CompileError("fromJson(s, 'ddl-type') requires a literal type string")
    return F.from_json(cols[0], args[1].value)


@fn("head")
def _fn_head(scope, args, cols):
    if isinstance(dtype_of(scope, cols[0]), T.NullType):
        return F.lit(None)
    return F.get(cols[0], 0)


@fn("last")
def _fn_last(scope, args, cols):
    if isinstance(dtype_of(scope, cols[0]), T.NullType):
        return F.lit(None)
    # try_ variant: element_at(-1) on an empty list must yield NULL, not an
    # ANSI ArrayIndexOutOfBounds
    return F.try_element_at(cols[0], F.lit(-1))


@fn("tail")
def _fn_tail(scope, args, cols):
    if isinstance(dtype_of(scope, cols[0]), T.NullType):
        return F.lit(None)
    c = cols[0]
    return F.slice(c, 2, F.greatest(F.size(c) - 1, F.lit(0)))


@fn("size")
def _fn_size(scope, args, cols):
    c = cols[0]
    dt = _operand_dtype(scope, args[0], c) if args else dtype_of(scope, c)
    if dt is not None and _is_string(dt):
        return F.length(c)
    if dt is not None and _is_tagged(dt):
        # dynamic input resolves the kind per row: string -> char count,
        # array -> element count; any other kind raises AT RUNTIME like
        # age_size (agtype.c:7627 "size() unsupported argument").  A NULL
        # tagged value stays NULL (SQL-null passthrough, agtype.c:7588).
        k = c.getField("__k")
        return (
            F.when(c.isNull() | k.isNull(), F.lit(None).cast("long"))
            .when(k == 5, F.length(c.getField("__s")).cast("long"))
            .when(k == 4, F.json_array_length(c.getField("__j")).cast("long"))
            .otherwise(
                F.raise_error(F.lit("size() unsupported argument")).cast("long")
            )
        )
    if dt is not None and _is_struct(dt):
        # expr.out:3025 — size() unsupported argument (objects/entities)
        raise CompileError("size() unsupported argument: object")
    if dt is not None and not isinstance(dt, (T.ArrayType, T.NullType)) and not _is_string(dt):
        # statically-known scalar non-string kind: raise at compile time
        # (agtype.c:7643)
        raise CompileError("size() unsupported argument")
    return F.size(c)


@fn("length")
def _fn_length(scope, args, cols):
    c = cols[0]
    dt = dtype_of(scope, c)
    if dt is not None and _is_struct(dt) and "edges" in _entity_fields(dt):
        return F.size(c.getField("edges"))  # path length = #edges (agtype.c:6705)
    if dt is not None and _is_string(dt):
        return F.length(c)
    return F.size(c)


@fn("nodes")
def _fn_nodes(scope, args, cols):
    return cols[0].getField("nodes")


@fn("relationships")
def _fn_relationships(scope, args, cols):
    return cols[0].getField("edges")


@fn("exists")
def _fn_exists(scope, args, cols):
    return cols[0].isNotNull()


@fn("isempty")
def _fn_isempty(scope, args, cols):
    c = cols[0]
    dt = dtype_of(scope, c)
    if dt is not None and _is_string(dt):
        return F.length(c) == 0
    if dt is not None and _is_struct(dt):
        if _entity_fields(dt) in ({"id", "label", "properties"},
                                  {"id", "start_id", "end_id", "label", "properties"}):
            # isEmpty(vertex/edge) is an error in the reference
            # (cypher_match.out 'should give an error' isEmpty block)
            raise CompileError("isEmpty() argument must be a list, map or string")
        # object emptiness: a properties/map-literal struct is empty when
        # every key slot is null (null value == absent key convention);
        # the reference's isEmpty(properties(u)) block (cypher_match.sql:626)
        fields = [f.name for f in dt.fields if f.name not in ("_none", "_pstruct")]
        if not fields:
            return F.when(c.isNull(), F.lit(None)).otherwise(F.lit(True))
        non_null = [c.getField(nm).isNotNull().cast("int") for nm in fields]
        total = non_null[0]
        for x in non_null[1:]:
            total = total + x
        return F.when(c.isNull(), F.lit(None)).otherwise(total == 0)
    from ..graph import is_tagged_type

    if dt is not None and is_tagged_type(dt):
        k = c.getField("__k")
        j = c.getField("__j")
        return (
            F.when(c.isNull(), F.lit(None))
            .when(k == 5, F.length(c.getField("__s")) == 0)
            .when(k.isin(3, 4), (j == "{}") | (j == "[]"))
            .otherwise(F.lit(False))
        )
    return F.size(c) == 0


@fn("coalesce")
def _fn_coalesce(scope, args, cols):
    return F.coalesce(*cols)


# -- conversions (agtype.c:6741-8085)

def _is_tagged(dt) -> bool:
    from ..graph import is_tagged_type

    return dt is not None and is_tagged_type(dt)


def _tagged_parts(c: Column):
    return c.getField("__k"), c.getField("__n"), c.getField("__s"), c.getField("__b")


def _elem_tagged(scope, col: Column) -> bool:
    dt = dtype_of(scope, col)
    return isinstance(dt, T.ArrayType) and _is_tagged(dt.elementType)


def _tagged_to_string(c: Column) -> Column:
    k, n, s, b = _tagged_parts(c)
    i = c.getField("__i")
    d = c.getField("__d")
    # int kind prints bare (exact via the __i payload); NUMERIC carries its
    # exact canonical text in __d; float kind keeps the ".0" (float8out)
    return (
        F.when(k == 5, s)
        .when(k == 6, b.cast("string"))
        .when(
            k == 7,
            F.when(d.isNotNull(), d)
            .when(i.isNotNull(), i.cast("string"))
            .otherwise(n.cast("string")),
        )
    )


def _tagged_to_integer(c: Column) -> Column:
    k, n, s, b = _tagged_parts(c)
    i = c.getField("__i")
    return (
        F.when(k == 7, F.coalesce(i, n.cast("long")))
        .when(k == 5, F.coalesce(s.try_cast("long"), s.try_cast("double").cast("long")))
        .when(k == 6, b.cast("long"))
    )


def _tagged_to_float(c: Column) -> Column:
    k, n, s, b = _tagged_parts(c)
    return F.when(k == 7, n).when(k == 5, s.try_cast("double"))


def _tagged_to_boolean(c: Column) -> Column:
    k, n, s, b = _tagged_parts(c)
    lc = F.lower(s)
    return (
        F.when(k == 6, b)
        .when(k == 7, n != 0.0)
        .when(k == 5, F.when(lc == "true", F.lit(True)).when(lc == "false", F.lit(False)))
    )


def _to_integer(c: Column, dt) -> Column:
    if _is_tagged(dt):
        return _tagged_to_integer(c)
    if dt is not None and _is_integral(dt):
        return c
    if dt is not None and isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return c.cast("long")
    if dt is not None and isinstance(dt, T.BooleanType):
        # expr.out:3666 — toInteger() unsupported argument agtype 5 (bool)
        raise CompileError("toInteger() unsupported argument: boolean")
    return F.coalesce(c.try_cast("long"), c.try_cast("double").cast("long"))


def _to_float(c: Column, dt) -> Column:
    if _is_tagged(dt):
        return _tagged_to_float(c)
    if dt is not None and isinstance(dt, T.BooleanType):
        # expr.out:3502 — toFloat() unsupported argument agtype 5 (bool)
        raise CompileError("toFloat() unsupported argument: boolean")
    return c.try_cast("double") if dt is None or _is_string(dt) else c.cast("double")


def _to_boolean(c: Column, dt) -> Column:
    if _is_tagged(dt):
        return _tagged_to_boolean(c)
    if dt is not None and isinstance(dt, T.BooleanType):
        return c
    if dt is not None and _is_integral(dt):
        return c != 0
    lc = F.lower(c.cast("string"))
    return F.when(lc == "true", F.lit(True)).when(lc == "false", F.lit(False))


@fn("tointeger")
def _fn_tointeger(scope, args, cols):
    # _operand_dtype: lambda-bound tagged operands must kind-dispatch
    dt = _operand_dtype(scope, args[0], cols[0]) if args else dtype_of(scope, cols[0])
    return _to_integer(cols[0], dt)


@fn("tofloat")
def _fn_tofloat(scope, args, cols):
    # _operand_dtype: lambda-bound tagged operands must kind-dispatch
    dt = _operand_dtype(scope, args[0], cols[0]) if args else dtype_of(scope, cols[0])
    return _to_float(cols[0], dt)


@fn("toboolean")
def _fn_toboolean(scope, args, cols):
    # _operand_dtype: lambda-bound tagged operands must kind-dispatch
    dt = _operand_dtype(scope, args[0], cols[0]) if args else dtype_of(scope, cols[0])
    return _to_boolean(cols[0], dt)


def _float_literal_ok(txt: str) -> bool:
    t = txt.strip().lower()
    if t in ("nan", "inf", "infinity", "+inf", "+infinity", "-inf", "-infinity"):
        return True
    try:
        float(t)
        return True
    except ValueError:
        return False


@fn("castfloat")
def _fn_castfloat(scope, args, cols):
    """::float — unlike toFloat() (null on bad strings), the CAST raises
    on malformed text ('2:71'::float, expr.out:259)."""
    a0 = args[0] if args else None
    if isinstance(a0, A.Lit) and isinstance(a0.value, str) and not _float_literal_ok(a0.value):
        raise CompileError(
            f'invalid input syntax for type double precision: "{a0.value}"'
        )
    return _fn_tofloat(scope, args, cols)


@fn("castbool")
def _fn_castbool(scope, args, cols):
    """::bool — integers and booleans only (floats error, expr.out:226);
    bad boolean text errors instead of nulling."""
    a0 = args[0] if args else None
    if isinstance(a0, A.Lit):
        v = a0.value
        if isinstance(v, float):
            raise CompileError("typecast expression must be an integer or a boolean")
        if isinstance(v, str) and v.strip().lower() not in ("true", "false", "t", "f"):
            raise CompileError(f'invalid input syntax for type boolean: "{v}"')
    dt = dtype_of(scope, cols[0]) if cols else None
    if dt is not None and isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        raise CompileError("typecast expression must be an integer or a boolean")
    return _fn_toboolean(scope, args, cols)


@fn("tostring")
def _fn_tostring(scope, args, cols):
    # _operand_dtype, not dtype_of: inside a HOF lambda the column is not
    # schema-resolvable, but the scope's hint map knows a tagged element /
    # pre-computed arithmetic value — which must kind-dispatch here
    # (toString over a raw tagged struct would stringify the struct)
    dt = _operand_dtype(scope, args[0], cols[0]) if args else dtype_of(scope, cols[0])
    if _is_tagged(dt):
        return _tagged_to_string(cols[0])
    if isinstance(dt, T.DecimalType):
        # numeric prints without the fixed-scale zero padding
        # (toString(3.14::numeric) = "3.14", expr.out:464)
        c = cols[0].cast("string")
        trimmed = F.regexp_replace(c, r"(\.\d*?)0+$", r"$1")
        return F.regexp_replace(trimmed, r"\.$", "")
    return cols[0].cast("string")


_NUMERIC_SPECIALS = {
    "nan": "NaN",
    "inf": "Infinity", "+inf": "Infinity",
    "infinity": "Infinity", "+infinity": "Infinity",
    "-inf": "-Infinity", "-infinity": "-Infinity",
}


@fn("tonumeric")
def _fn_tonumeric(scope, args, cols):
    """agtype NUMERIC = PG's arbitrary-precision numeric (agtype.h:307-323,
    numeric casts agtype.c:5385-5943): the value is a TAGGED numeric-kind
    dynamic with the EXACT decimal text in __d — NaN/Infinity spellings,
    >38-digit literals, and input scale all survive storage and printing.
    Arithmetic over numerics computes through DECIMAL(38,18) (documented
    precision bound).  A numeric LITERAL parses its exact source digits —
    the float lexeme has already lost them
    ('100000000000.0000000000001'::numeric, agtype.out:86)."""
    from ..graph import numeric_tagged

    a0 = args[0] if args else None
    if isinstance(a0, A.Lit) and (
        getattr(a0, "raw", None) is not None or isinstance(a0.value, str)
    ):
        import decimal as _dec

        raw = getattr(a0, "raw", None)
        if isinstance(a0.value, str):
            sp = _NUMERIC_SPECIALS.get(a0.value.strip().lower())
            if sp is not None:
                return numeric_tagged(F.lit(sp))
            raw = a0.value.strip()
        try:
            return numeric_tagged(F.lit(format(_dec.Decimal(raw), "f")))
        except _dec.InvalidOperation:
            if isinstance(a0.value, str):
                # numeric_in rejects malformed text ('2:71'::numeric errors,
                # expr.out:1810)
                raise CompileError(
                    f'invalid input syntax for type numeric: "{a0.value}"'
                )
    dt = dtype_of(scope, cols[0])
    if _is_tagged(dt):
        # dynamic input (e.g. a heterogeneous-list element): numeric kinds
        # convert, strings parse, other kinds null (expr.out:236-239)
        c = cols[0]
        k = c.getField("__k")
        return numeric_tagged(
            F.when(k == 7, F.coalesce(
                c.getField("__d"),
                c.getField("__i").cast("string"),
                _f8_numeric_text(c.getField("__n")),
            ))
            .when(k == 5, _parse_numeric_text(c.getField("__s")))
        )
    if dt is not None and isinstance(dt, (T.FloatType, T.DoubleType)):
        return numeric_tagged(_f8_numeric_text(cols[0]))
    if dt is not None and isinstance(dt, T.StringType):
        return numeric_tagged(_parse_numeric_text(cols[0]))
    if dt is not None and isinstance(dt, T.DecimalType):
        from ..graph import dec_trim_text

        return numeric_tagged(dec_trim_text(cols[0].cast("string")))
    if dt is not None and isinstance(dt, T.BooleanType):
        # bool::numeric is not a cast — null out, type-stable
        return numeric_tagged(F.lit(None).cast("string"))
    return numeric_tagged(cols[0].cast("long").cast("string"))


def _parse_numeric_text(s: Column) -> Column:
    """Runtime string -> canonical numeric text: NaN/Infinity spellings
    normalized, plain decimal digits kept verbatim (scale preserved, the PG
    numeric_in contract), exponent forms evaluated through DECIMAL(38,18)
    (bounded), anything else NULL."""
    from ..graph import dec_trim_text

    t = F.trim(s)
    lower = F.lower(t)
    return (
        F.when(lower == "nan", F.lit("NaN"))
        .when(lower.isin("inf", "+inf", "infinity", "+infinity"), F.lit("Infinity"))
        .when(lower.isin("-inf", "-infinity"), F.lit("-Infinity"))
        .when(
            t.rlike(r"^[+-]?([0-9]+(\.[0-9]*)?|\.[0-9]+)$"),
            F.regexp_replace(t, r"^\+", ""),
        )
        .otherwise(dec_trim_text(t.try_cast("decimal(38,18)").cast("string")))
    )


def _f8_numeric_text(col: Column) -> Column:
    # PG casts float8 -> numeric through float8out's %.15g text:
    # ((1 + 2.71) * 3)::numeric = 11.13, not 11.129999999999999
    # (expr.out:235) — 15 significant digits, zeros trimmed.  NaN/Infinity
    # keep their spellings.
    s = F.format_string("%.15g", col)
    s = F.regexp_replace(s, r"(\.\d*?)0+(e[+-]?\d+)?$", r"$1$2")
    s = F.regexp_replace(s, r"\.(e|$)", r"$1")
    return (
        F.when(F.isnan(col), F.lit("NaN"))
        .when(col == float("inf"), F.lit("Infinity"))
        .when(col == float("-inf"), F.lit("-Infinity"))
        .otherwise(
            # exponent forms normalize through decimal (bounded)
            F.when(
                s.contains("e"),
                F.regexp_replace(
                    F.regexp_replace(
                        s.try_cast("decimal(38,18)").cast("string"),
                        r"(\.\d*?)0+$", r"$1",
                    ),
                    r"\.$", "",
                ),
            ).otherwise(s)
        )
    )


@fn("castint")
def _fn_castint(scope, args, cols):
    """The ::int / ::integer TYPECAST — distinct from toInteger(): it
    ROUNDS floats (2.71::int = 3, agtype_typecast_int) and accepts
    booleans (true::int = 1), while toInteger() truncates and rejects
    bools (expr.out toInteger vs typecast blocks). STRING input must be
    strict bigint text ('0.0'::int errors, expr.out:218)."""
    a0 = args[0] if args else None
    if isinstance(a0, A.Lit) and isinstance(a0.value, str):
        if not _re.fullmatch(r"[+-]?\d+", a0.value.strip()):
            raise CompileError(
                f'invalid input syntax for type bigint: "{a0.value}"'
            )
    c, dt = cols[0], dtype_of(scope, cols[0])
    if _is_tagged(dt):
        k, n, s, b = _tagged_parts(c)
        i = c.getField("__i")
        d = c.getField("__d")
        # float kind rounds half-to-EVEN (dtoi8/rint); NUMERIC kind (__d
        # payload) half away from zero (numeric_int8) — agtype.c:5518-5525
        return (
            F.when(
                k == 7,
                F.coalesce(
                    i,
                    F.round(d.try_cast("decimal(38,18)"), 0).cast("long"),
                    F.bround(n, 0).cast("long"),
                ),
            )
            .when(k == 6, b.cast("long"))
            .when(k == 5, F.coalesce(s.try_cast("long"), F.round(s.try_cast("double"), 0).cast("long")))
        )
    if dt is not None and isinstance(dt, T.BooleanType):
        return c.cast("long")
    if dt is not None and _is_integral(dt):
        return c
    if dt is not None and isinstance(dt, T.DecimalType):
        # NUMERIC lane: numeric_int8 rounds half away from zero
        return F.round(c, 0).cast("long")
    if dt is not None and isinstance(dt, (T.FloatType, T.DoubleType)):
        # float lane: dtoi8/rint rounds half to even
        return F.bround(c.cast("double"), 0).cast("long")
    return F.coalesce(c.try_cast("long"), F.round(c.try_cast("double"), 0).cast("long"))


@fn("castpgfloat8")
def _fn_castpgfloat8(scope, args, cols):
    """::pg_float8 — PG float8in semantics: accepts NaN / [+-]inf[inity]
    spellings case-insensitively (ag_float8_supp.c:31
    float8in_internal_null); malformed text raises (expr.out:278-280)."""
    a0 = args[0] if args else None
    if isinstance(a0, A.Lit) and isinstance(a0.value, str) and not _float_literal_ok(a0.value):
        raise CompileError(
            f'invalid input syntax for type double precision: "{a0.value}"'
        )
    c, dt = cols[0], dtype_of(scope, cols[0])
    if _is_tagged(dt):
        # dynamic input: numeric kinds convert, strings parse through the
        # float8in spellings, other kinds null (expr.out:266-271)
        k = c.getField("__k")
        lc = F.lower(F.trim(c.getField("__s")))
        from_s = (
            F.when(lc == "nan", F.lit(float("nan")))
            .when(lc.isin("inf", "infinity", "+inf", "+infinity"), F.lit(float("inf")))
            .when(lc.isin("-inf", "-infinity"), F.lit(float("-inf")))
            .otherwise(c.getField("__s").try_cast("double"))
        )
        return (
            F.when(k == 7, c.getField("__n"))
            .when(k == 5, from_s)
        )
    if dt is None or _is_string(dt) or isinstance(dt, T.NullType):
        lc = F.lower(F.trim(c.cast("string")))
        return (
            F.when(lc == "nan", F.lit(float("nan")))
            .when(lc.isin("inf", "infinity", "+inf", "+infinity"), F.lit(float("inf")))
            .when(lc.isin("-inf", "-infinity"), F.lit(float("-inf")))
            .otherwise(c.try_cast("double"))
        )
    return c.cast("double")


def _entity_cast(scope, col, want_edge: bool):
    dt = dtype_of(scope, col)
    if dt is None or isinstance(dt, T.NullType):
        return F.lit(None)
    if not isinstance(dt, T.StructType):
        raise CompileError("::vertex/::edge requires a map value")
    names = {f.name for f in dt.fields}
    need = {"id", "label", "properties"} | ({"start_id", "end_id"} if want_edge else set())
    if not need <= names:
        raise CompileError(
            f"map is missing {sorted(need - names)} for the entity cast"
        )
    kindname = "edge" if want_edge else "vertex"
    for fld in sorted(need - {"label", "properties"}):
        fdt = next(f.dataType for f in dt.fields if f.name == fld)
        if not isinstance(fdt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
            # expr.out:294 '{id:"0", ...}::vertex' errors — graphids must
            # be integers, never strings/floats
            raise CompileError(
                f"{kindname} typecast object has invalid or missing {fld}"
            )
    fields = [
        col.getField("id").cast("long").alias("id"),
        col.getField("label").cast("string").alias("label"),
    ]
    if want_edge:
        fields += [
            col.getField("start_id").cast("long").alias("start_id"),
            col.getField("end_id").cast("long").alias("end_id"),
        ]
    fields.append(col.getField("properties").alias("properties"))
    return F.struct(*fields)


@fn("castvertex")
def _fn_castvertex(scope, args, cols):
    """{id, label, properties}::vertex (1.8 composite casts,
    sql/agtype_graphid.sql:49-61; agtype.out ::vertex blocks)."""
    return _entity_cast(scope, cols[0], want_edge=False)


@fn("castedge")
def _fn_castedge(scope, args, cols):
    return _entity_cast(scope, cols[0], want_edge=True)


@fn("castpath")
def _fn_castpath(scope, args, cols):
    """[v, e, v, ...]::path (agtype.out ::path blocks): an odd-length
    alternating vertex/edge array becomes a path value; null -> null."""
    col = cols[0]
    # a valid path literal alternates v,e,v,... — at least 3 elements,
    # odd length (expr.out:301-302 single-entity lists error)
    a0 = args[0] if args else None
    if isinstance(a0, A.ListLit) and (len(a0.items) < 3 or len(a0.items) % 2 == 0):
        raise CompileError("typecast argument is not a valid path")
    dt = dtype_of(scope, col)
    if dt is None or isinstance(dt, T.NullType):
        return F.lit(None)
    if not isinstance(dt, T.ArrayType) or not isinstance(dt.elementType, T.StructType):
        raise CompileError("::path requires a list of alternating vertices and edges")
    from ..graph import _entity_kind

    et = dt.elementType
    names = {f.name for f in et.fields}
    if _entity_kind(et) == "vertex" or (
        {"id", "label", "properties"} <= names and "start_id" not in names
    ):
        # homogeneous vertex array can't alternate unless length 1 —
        # still build it (cast validation is shape-level)
        nodes, edges = col, F.array().cast(
            "array<struct<id:long,start_id:long,end_id:long,label:string,properties:struct<_none:string>>>"
        )
        return F.struct(nodes.alias("nodes"), edges.alias("edges"))
    # mixed vertex/edge structs field-merged: split by start_id presence
    has_se = "start_id" in names and "end_id" in names
    if not has_se:
        raise CompileError("::path requires a list of alternating vertices and edges")
    is_edge = lambda x: x.getField("start_id").isNotNull()
    nodes = F.filter(col, lambda x: ~is_edge(x))
    nodes = F.transform(
        nodes,
        lambda x: F.struct(
            x.getField("id").cast("long").alias("id"),
            x.getField("label").cast("string").alias("label"),
            x.getField("properties").alias("properties"),
        ),
    )
    edges = F.filter(col, is_edge)
    edges = F.transform(
        edges,
        lambda x: F.struct(
            x.getField("id").cast("long").alias("id"),
            x.getField("start_id").cast("long").alias("start_id"),
            x.getField("end_id").cast("long").alias("end_id"),
            x.getField("label").cast("string").alias("label"),
            x.getField("properties").alias("properties"),
        ),
    )
    return F.struct(nodes.alias("nodes"), edges.alias("edges"))


def _empty_list_null(col: Column, out: Column) -> Column:
    """Every age_to*list() returns NULL for an EMPTY input list
    (agtype.c `if (count == 0) PG_RETURN_NULL()`, e.g. :7476;
    expr.out toBooleanList([]) block)."""
    return F.when(F.size(col) == 0, F.lit(None)).otherwise(out)


@fn("tointegerlist")
def _fn_tointegerlist(scope, args, cols):
    if _elem_tagged(scope, cols[0]):
        return _empty_list_null(cols[0], F.transform(cols[0], _tagged_to_integer))
    return _empty_list_null(
        cols[0],
        F.transform(cols[0], lambda x: F.coalesce(x.try_cast("long"), x.try_cast("double").cast("long"))),
    )


@fn("tofloatlist")
def _fn_tofloatlist(scope, args, cols):
    if _elem_tagged(scope, cols[0]):
        return _empty_list_null(cols[0], F.transform(cols[0], _tagged_to_float))
    return _empty_list_null(cols[0], F.transform(cols[0], lambda x: x.try_cast("double")))


@fn("tobooleanlist")
def _fn_tobooleanlist(scope, args, cols):
    if _elem_tagged(scope, cols[0]):
        return _empty_list_null(cols[0], F.transform(cols[0], _tagged_to_boolean))
    dt = dtype_of(scope, cols[0])
    et = dt.elementType if isinstance(dt, T.ArrayType) else None
    # numeric elements convert (0 -> false, else true): expr.out:3384
    return _empty_list_null(cols[0], F.transform(cols[0], lambda x: _to_boolean(x, et)))


@fn("tostringlist")
def _fn_tostringlist(scope, args, cols):
    # the reference's list variant does NOT convert booleans — they come
    # back null (expr.out:3936-3941), unlike scalar toString(true)
    if _elem_tagged(scope, cols[0]):
        k = lambda c: F.when(c.getField("__k") == 6, F.lit(None).cast("string")).otherwise(_tagged_to_string(c))  # noqa: E731
        return _empty_list_null(cols[0], F.transform(cols[0], k))
    dt = dtype_of(scope, cols[0])
    et = dt.elementType if isinstance(dt, T.ArrayType) else None
    if et is not None and isinstance(et, T.BooleanType):
        return _empty_list_null(
            cols[0], F.transform(cols[0], lambda x: F.lit(None).cast("string"))
        )
    return _empty_list_null(cols[0], F.transform(cols[0], lambda x: x.cast("string")))



def _arg_kind(scope, node, col):
    """Static agtype kind of a function argument: 'string' / 'numeric' /
    'bool' / 'array' / 'object' / entity kind / 'null' / None (unknown)."""
    from ..graph import _container_kind, _entity_kind, _scalar_kind, is_tagged_type

    dt = _operand_dtype(scope, node, col)
    if dt is None:
        return None
    if isinstance(dt, T.NullType):
        return "null"
    if is_tagged_type(dt):
        return None
    return _entity_kind(dt) or _scalar_kind(dt) or _container_kind(dt)


def _require_string(scope, name, args, cols, positions, errmsg=None):
    """Reference string functions raise on statically non-string scalar
    arguments (expr.out: reverse(true), toUpper(true), split(123, ...) all
    error); dynamic/unknown kinds pass through (runtime null-out)."""
    for p in positions:
        if p >= len(args):
            continue
        k = _arg_kind(scope, args[p], cols[p])
        if k in ("numeric", "bool", "object", "array"):
            kindno = {"numeric": 3, "bool": 4, "array": 5, "object": 6}[k]
            raise CompileError(
                errmsg or f"{name}() unsupported argument agtype {kindno}"
            )


def _nonneg_len(scope, name, arg, col):
    # left()/right() reject negative lengths with a dedicated message
    # (expr.out:529) and int4-overflowing ones like PG (expr.out:533)
    if isinstance(arg, A.Unary) and arg.op == "-":
        raise CompileError(
            f"{name}() negative values are not supported for length"
        )
    if isinstance(arg, A.Lit) and isinstance(arg.value, int):
        if arg.value < 0:
            raise CompileError(
                f"{name}() negative values are not supported for length"
            )
        if arg.value > 2**31 - 1:
            raise CompileError(f"{name}() length out of integer range")
    return _clamp_i32(col)


# -- strings (agtype.c:8234-9547; 0-based offsets!)

@fn("toupper")
def _fn_toupper(scope, args, cols):
    _require_string(scope, "toUpper", args, cols, [0])
    return F.upper(cols[0])


@fn("tolower")
def _fn_tolower(scope, args, cols):
    _require_string(scope, "toLower", args, cols, [0])
    return F.lower(cols[0])


@fn("trim")
def _fn_trim(scope, args, cols):
    _require_string(scope, "trim", args, cols, [0])
    return F.trim(cols[0])


@fn("ltrim")
def _fn_ltrim(scope, args, cols):
    _require_string(scope, "lTrim", args, cols, [0])
    return F.ltrim(cols[0])


@fn("rtrim")
def _fn_rtrim(scope, args, cols):
    _require_string(scope, "rTrim", args, cols, [0])
    return F.rtrim(cols[0])


@fn("reverse")
def _fn_reverse(scope, args, cols):
    # reverse() accepts strings and lists — never numerics/booleans
    # (expr.out: reverse(true) / reverse(3.14) error)
    k = _arg_kind(scope, args[0], cols[0])
    if k in ("numeric", "bool", "object"):
        raise CompileError("reverse() unsupported argument agtype")
    return F.reverse(cols[0])


@fn("left")
def _fn_left(scope, args, cols):
    _require_string(scope, "left", args, cols, [0])
    n = _nonneg_len(scope, "left", args[1], cols[1])
    return F.substring(cols[0], 1, n)


@fn("right")
def _fn_right(scope, args, cols):
    _require_string(scope, "right", args, cols, [0])
    c = cols[0]
    n = _nonneg_len(scope, "right", args[1], cols[1])
    return F.substring(c, F.greatest(F.length(c) - n + 1, F.lit(1)).cast("int"), F.length(c))


@fn("substring")
def _fn_substring(scope, args, cols):
    _require_string(scope, "substring", args, cols, [0])
    if isinstance(args[0], A.Lit) and args[0].value is None:
        # substring(null, ...) is null, whatever the other args
        # (expr.out:549-550) — the offset checks apply to real strings only
        return F.lit(None).cast("string")
    # offset/length must be non-null, non-negative (expr.out:552-560)
    for a in args[1:]:
        if isinstance(a, A.Lit) and a.value is None:
            raise CompileError("substring() offset or length cannot be null")
        if (isinstance(a, A.Unary) and a.op == "-") or (
            isinstance(a, A.Lit) and isinstance(a.value, int) and a.value < 0
        ):
            raise CompileError(
                "substring() negative values are not supported for offset or length"
            )
    c = cols[0]
    start = _clamp_i32(cols[1]) + 1  # 0-based in Cypher (agtype.c:9181)
    if len(cols) > 2:
        return F.substring(c, start, _clamp_i32(cols[2]))
    return F.substring(c, start, F.length(c))


@fn("split")
def _fn_split(scope, args, cols):
    _require_string(scope, "split", args, cols, [0, 1])
    # AGE split is literal-delimiter (agtype.c:9399); Spark's is regex
    if isinstance(args[1], A.Lit) and isinstance(args[1].value, str):
        return F.split(cols[0], _re.escape(args[1].value))
    return F.split(cols[0], F.regexp_replace(cols[1], r"([.*+?^${}()|\[\]\\])", r"\\$1"))


@fn("replace")
def _fn_replace(scope, args, cols):
    _require_string(scope, "replace", args, cols, [0, 1, 2])
    return F.replace(cols[0], cols[1], cols[2])


# -- lists

@fn("range")
def _fn_range(scope, args, cols):
    # a NULL start/stop errors (expr.out:917 range(null, -10, -3)); only
    # the STEP may be null (defaulting to 1)
    for a in args[:2]:
        if isinstance(a, A.Lit) and a.value is None:
            raise CompileError("range(): neither start nor stop can be null")
    for c in cols:
        cdt = dtype_of(scope, c)
        if cdt is not None and isinstance(cdt, (T.FloatType, T.DoubleType, T.DecimalType)):
            # expr.out:8070 — range() unsupported argument type (floats)
            raise CompileError("range() unsupported argument type: float")
    start, stop = cols[0].cast("long"), cols[1].cast("long")
    # NULL step means default 1 (expr.out range(0,10,null) block)
    step = (
        F.coalesce(cols[2].cast("long"), F.lit(1).cast("long"))
        if len(cols) > 2
        else F.lit(1).cast("long")
    )
    # wrong-direction bounds yield [] (expr.out:8037-8047); F.sequence throws
    ok = ((stop - start >= 0) & (step > 0)) | ((stop - start <= 0) & (step < 0))
    return F.when(ok, F.sequence(start, stop, step)).otherwise(
        F.expr("array()").cast("array<long>")
    )


# -- math (agtype.c:9849-10923)


def _math_operand(scope, a, c) -> Column:
    """Double view of a math-function operand: tagged (dynamic/NUMERIC)
    values read their numeric payload (int64 exact-cast, else the float8
    shadow — NUMERIC rows carry it too); non-numeric kinds yield NULL.
    The float-returning math family (agtype.c:10496 floor/ceil et al.
    return FLOAT even for NUMERIC inputs) needs nothing more."""
    from ..graph import _strip_nullability, is_tagged_type

    dt = _operand_dtype(scope, a, c)
    sdt = _strip_nullability(dt) if dt is not None else None
    if sdt is not None and is_tagged_type(sdt):
        return F.when(
            c.getField("__k") == 7,
            F.coalesce(c.getField("__i").cast("double"), c.getField("__n")),
        )
    return c


@fn("abs")
def _fn_abs(scope, args, cols):
    """abs() is TYPE-PRESERVING in the reference (age_abs,
    agtype.c:10517: int->int, float->float, numeric->numeric via
    numeric_abs).  A tagged operand therefore returns a tagged result
    per row kind; the NUMERIC payload's abs is EXACT in the text domain
    (strip the sign — numeric_abs changes nothing else, and it is pure
    JVM so it stays exact inside HOF lambdas too).  abs(INT64_MIN)
    errors "bigint out of range" like the reference (age_abs goes
    through numeric_abs -> numeric_int8, which overflows) instead of
    Spark's silent two's-complement wrap back to INT64_MIN."""
    from ..graph import TAGGED_TYPE, _strip_nullability, is_tagged_type

    _require_numeric(scope, "abs", args, cols)
    c = cols[0]
    dt = _operand_dtype(scope, args[0], c)
    sdt = _strip_nullability(dt) if dt is not None else None

    def guarded_long_abs(lc):
        return F.when(
            lc == F.lit(-(1 << 63)).cast("long"),
            F.raise_error(F.lit("bigint out of range")).cast("long"),
        ).otherwise(F.abs(lc))

    if sdt is None or not is_tagged_type(sdt):
        if isinstance(sdt, T.LongType):
            return guarded_long_abs(c)
        return F.abs(c)
    fields = []
    for f in TAGGED_TYPE.fields:
        if f.name == "__k":
            fields.append(F.lit(7).cast("tinyint").alias("__k"))
        elif f.name == "__n":
            fields.append(F.abs(c.getField("__n")).alias("__n"))
        elif f.name == "__i":
            fields.append(guarded_long_abs(c.getField("__i")).alias("__i"))
        elif f.name == "__d":
            fields.append(
                F.regexp_replace(c.getField("__d"), "^-", "").alias("__d")
            )
        else:
            fields.append(F.lit(None).cast(f.dataType).alias(f.name))
    return F.when(c.getField("__k") == 7, F.struct(*fields)).otherwise(
        F.lit(None).cast(TAGGED_TYPE)
    )


def _exact_numeric_unary_text(d: Column, op: str) -> Column:
    """Exact text-domain ceil/floor/round-half-away (op in 'ceil'|'floor'|
    'round0') on a PG numeric text — arbitrary width, pure JVM (works
    inside HOF lambdas).  The arbitrary-precision integer increment uses
    the trailing-9s trick: '12999' splits into head '12' + nines, and
    bumping the head's last digit while zeroing the nines carries exactly.
    NULL when ``d`` is not plain digits (NaN/Infinity spellings, non-
    numeric rows) so callers fall back to the float8 lane."""
    from ..graph import let_column

    def build(dcol: Column) -> Column:
        ok = dcol.rlike(r"^-?[0-9]+(\.[0-9]+)?$")
        neg = dcol.startswith("-")
        mag = F.regexp_replace(dcol, "^-", "")
        ip = F.regexp_extract(mag, r"^([0-9]+)", 1)
        frac = F.regexp_extract(mag, r"\.([0-9]+)$", 1)
        frac_nz = frac.rlike("[1-9]")
        head = F.regexp_extract(ip, r"^([0-9]*?)9*$", 1)
        zeros = F.repeat(F.lit("0"), F.length(ip) - F.length(head))
        inc = F.when(
            F.length(head) == 0, F.concat(F.lit("1"), zeros)
        ).otherwise(
            F.concat(
                head.substr(F.lit(1), F.length(head) - 1),
                F.translate(
                    head.substr(F.length(head), F.lit(1)),
                    "012345678",
                    "123456789",
                ),
                zeros,
            )
        )
        if op == "ceil":  # away from zero only for positive fractions
            up = ~neg & frac_nz
        elif op == "floor":
            up = neg & frac_nz
        else:  # round0: half away from zero (PG numeric_round at scale 0)
            up = F.substring(frac, 1, 1) >= "5"  # '' compares false
        txt = F.when(up, inc).otherwise(ip)
        signed = F.when(
            neg & ~txt.rlike("^0+$"), F.concat(F.lit("-"), txt)
        ).otherwise(txt)
        return F.when(ok, signed.cast("double"))

    return let_column(d, build)


def _dbl_ceil_floor(c: Column, op: str) -> Column:
    """float8 ceil/floor that never leaves the double domain: Spark's
    ceil/floor convert through LONG, which clamps |x| > 2^63 to
    Long.Max/Min and turns NaN into 0.  At |x| >= 2^52 every double is
    already integral, so the value passes through; NaN/Infinity too."""
    c = c.cast("double")
    passthrough = F.isnan(c) | (F.abs(c) >= F.lit(float(1 << 52)))
    stepped = (F.ceil(c) if op == "ceil" else F.floor(c)).cast("double")
    return F.when(passthrough, c).otherwise(stepped)


def _exact_then_float(scope, a, c, op: str, jvm_fn) -> Column:
    """ceil/floor/round parity for NUMERIC operands: the reference applies
    numeric_ceil/floor/round EXACTLY on the numeric and only then converts
    to float8 (age_ceil, agtype.c:10451-10496) — converting first loses
    sub-float8 fractions (ceil(2.0000000000000000001::numeric) is 3.0
    there, 2.0 through a double view).  NUMERIC rows run the exact
    text-domain lane (arbitrary width); NaN/Infinity spellings and
    int/float rows fall back to ``jvm_fn`` on the double view."""
    from ..graph import _strip_nullability, is_tagged_type

    dt = _operand_dtype(scope, a, c)
    sdt = _strip_nullability(dt) if dt is not None else None
    if sdt is None or not is_tagged_type(sdt):
        return jvm_fn(c)
    exact = (
        _exact_numeric_unary_text(c.getField("__d"), op)
        if op is not None
        else F.lit(None).cast("double")
    )
    return F.when(
        c.getField("__k") == 7,
        F.coalesce(
            exact,
            jvm_fn(F.coalesce(c.getField("__i").cast("double"), c.getField("__n"))),
        ),
    )


@fn("ceil")
def _fn_ceil(scope, args, cols):
    # AGE ceil/floor return FLOAT even for NUMERIC inputs, but compute
    # numeric_ceil/numeric_floor BEFORE the float8 cast (_exact_then_float)
    _require_numeric(scope, "ceil", args, cols)
    return _exact_then_float(
        scope, args[0], cols[0], "ceil", lambda c: _dbl_ceil_floor(c, "ceil")
    )


@fn("floor")
def _fn_floor(scope, args, cols):
    _require_numeric(scope, "floor", args, cols)
    return _exact_then_float(
        scope, args[0], cols[0], "floor", lambda c: _dbl_ceil_floor(c, "floor")
    )


for _name, _f in [
    # sqrt of a negative returns NULL in the reference (expr.out:718)
    ("sqrt", lambda c: F.when(c.cast("double") >= 0, F.sqrt(c))),
    ("age_sqrt", lambda c: F.when(c.cast("double") >= 0, F.sqrt(c))),
    ("exp", F.exp), ("log", F.log), ("log10", F.log10), ("sin", F.sin),
    ("cos", F.cos), ("tan", F.tan),
    # out-of-domain asin/acos return NULL in the reference (expr.out
    # asin(1.1) block), not NaN
    ("asin", lambda c: F.when(F.abs(c.cast("double")) <= 1.0, F.asin(c))),
    ("acos", lambda c: F.when(F.abs(c.cast("double")) <= 1.0, F.acos(c))),
    ("atan", F.atan), ("degrees", F.degrees), ("radians", F.radians),
]:
    def _mk(f, name):
        def impl(scope, args, cols):
            _require_numeric(scope, name, args, cols)
            return f(_math_operand(scope, args[0], cols[0]))
        return impl
    FUNCTIONS[_name] = _mk(_f, _name)


def _require_numeric(scope, name, args, cols):
    """Math functions reject statically non-numeric scalar arguments
    (expr.out:599 sin(\"0\") errors)."""
    for a, c in zip(args, cols):
        k = _arg_kind(scope, a, c)
        if k in ("string", "bool", "object", "array"):
            raise CompileError(f"{name}() argument must resolve to a number")


@fn("agtype_sum")
def _fn_agtype_sum(scope, args, cols):
    """ag_catalog.agtype_sum = agtype + agtype (agtype.c age_agtype_sum);
    reachable through the CALL scalar fallthrough
    (cypher_call.sql `CALL agtype_sum(2,2)` -> 4)."""
    if len(args) != 2:
        raise CompileError("agtype_sum() requires two arguments")
    return compile_expr(scope, A.Binary("+", args[0], args[1]))


@fn("cot")
def _fn_cot(scope, args, cols):
    _require_numeric(scope, "cot", args, cols)
    return F.lit(1.0) / F.tan(_math_operand(scope, args[0], cols[0]))


@fn("atan2")
def _fn_atan2(scope, args, cols):
    _require_numeric(scope, "atan2", args, cols)
    return F.atan2(
        _math_operand(scope, args[0], cols[0]),
        _math_operand(scope, args[1], cols[1]),
    )


@fn("sign")
def _fn_sign(scope, args, cols):
    # age_sign returns an INTEGER (expr.out:6010-6026 prints 1/-1/0 bare).
    # NUMERIC rows decide from the text payload (numeric_sign order):
    # magnitudes below the float8 denormal floor would otherwise collapse
    # to 0 through the double view; NaN/Infinity spellings fall through.
    from ..graph import _strip_nullability, is_tagged_type

    _require_numeric(scope, "sign", args, cols)
    c = cols[0]
    dt = _operand_dtype(scope, args[0], c)
    sdt = _strip_nullability(dt) if dt is not None else None
    if sdt is not None and is_tagged_type(sdt):
        d = c.getField("__d")
        exact = F.when(
            d.rlike(r"^-?[0-9]+(\.[0-9]+)?$"),
            F.when(~d.rlike("[1-9]"), F.lit(0))
            .when(d.startswith("-"), F.lit(-1))
            .otherwise(F.lit(1))
            .cast("long"),
        )
        dbl = F.coalesce(c.getField("__i").cast("double"), c.getField("__n"))
        return F.when(
            c.getField("__k") == 7,
            F.coalesce(exact, F.signum(dbl).cast("long")),
        )
    return F.signum(c).cast("long")


@fn("round")
def _fn_round(scope, args, cols):
    # round always returns FLOAT (round(0) -> 0.0, round(7, 2) -> 7.0) and
    # a NULL precision means 0, not null-propagation (expr.out round block).
    # With a STATIC precision the NUMERIC lane rounds exactly before the
    # float8 cast (numeric_round-then-float8, same order as ceil/floor —
    # _exact_then_float); a dynamic precision column keeps the double view.
    _require_numeric(scope, "round", args[:1], cols[:1])
    prec = None
    if len(cols) <= 1 or (isinstance(args[1], A.Lit) and args[1].value is None):
        prec = 0
    elif isinstance(args[1], A.Lit) and isinstance(args[1].value, int):
        prec = int(args[1].value)
    if prec == 0:
        return _exact_then_float(
            scope, args[0], cols[0], "round0",
            lambda c: F.round(c.cast("double"), 0),
        )
    if prec is not None:
        # static nonzero precision: NUMERIC rows round through a
        # losslessly-castable DECIMAL(38,18) (guarded by the text shape —
        # the cast itself would silently round wider fractions); rows
        # outside the guard keep the double view (sub-ulp residual only)
        from ..graph import _strip_nullability, is_tagged_type

        dt = _operand_dtype(scope, args[0], cols[0])
        sdt = _strip_nullability(dt) if dt is not None else None
        if sdt is None or not is_tagged_type(sdt):
            return F.round(cols[0].cast("double"), prec)
        c = cols[0]
        d = c.getField("__d")
        exact = F.when(
            d.rlike(r"^-?[0-9]{1,20}(\.[0-9]{1,18})?$"),
            F.round(d.try_cast("decimal(38,18)"), prec).cast("double"),
        )
        dbl = F.coalesce(c.getField("__i").cast("double"), c.getField("__n"))
        return F.when(
            c.getField("__k") == 7, F.coalesce(exact, F.round(dbl, prec))
        )
    return F.round(_math_operand(scope, args[0], cols[0]).cast("double"), cols[1])


@fn("pi")
def _fn_pi(scope, args, cols):
    return F.lit(3.141592653589793)


@fn("e")
def _fn_e(scope, args, cols):
    return F.lit(2.718281828459045)


@fn("rand")
def _fn_rand(scope, args, cols):
    return F.rand()


@fn("timestamp")
def _fn_timestamp(scope, args, cols):
    # epoch-ms INTEGER; AGE has no temporal types (agtype.c:10924)
    return F.unix_millis(F.current_timestamp())


@fn("sqrt2")
def _fn_sqrt2(scope, args, cols):  # pragma: no cover - convenience
    return F.sqrt(cols[0])


# ---- pgvector parity (regress/sql/pgvector.sql; kernels in vectors.py).
# Each function coerces its arguments like the extension's input function
# (vector-text strings, agtype lists, dynamic values), then runs the pure
# higher-order-function kernel — no UDFs, codegen throughout.

def _vec_arg(scope, node, col) -> Column:
    from . import vectors as V

    return V.as_vector(col, _operand_dtype(scope, node, col))


def _vec_pair_fn(kernel_name: str):
    def impl(scope, args, cols):
        from . import vectors as V

        a = _vec_arg(scope, args[0], cols[0])
        b = _vec_arg(scope, args[1], cols[1])
        return getattr(V, kernel_name)(a, b)

    return impl


for _name in ("l2_distance", "inner_product", "cosine_distance", "l1_distance"):
    fn(_name)(_vec_pair_fn(_name))


@fn("vector_dims")
def _fn_vector_dims(scope, args, cols):
    return F.size(_vec_arg(scope, args[0], cols[0])).cast("long")


@fn("vector_norm")
def _fn_vector_norm(scope, args, cols):
    from . import vectors as V

    return V.vector_norm(_vec_arg(scope, args[0], cols[0]))


@fn("l2_normalize")
def _fn_l2_normalize(scope, args, cols):
    from . import vectors as V

    return V.l2_normalize(_vec_arg(scope, args[0], cols[0]))


@fn("subvector")
def _fn_subvector(scope, args, cols):
    from . import vectors as V

    return V.subvector(
        _vec_arg(scope, args[0], cols[0]), cols[1].cast("int"), cols[2].cast("int")
    )


@fn("binary_quantize")
def _fn_binary_quantize(scope, args, cols):
    from . import vectors as V

    return V.binary_quantize(_vec_arg(scope, args[0], cols[0]))


@fn("castvector")
def _fn_castvector(scope, args, cols):
    """``::vector`` / ``::vector(n)`` — the typed entry point that flips a
    list into elementwise-arithmetic vector semantics (array<float>)."""
    from . import vectors as V

    v = _vec_arg(scope, args[0], cols[0])
    if len(cols) > 1:
        if not isinstance(args[1], A.Lit):
            raise CompileError("::vector(n) requires a literal dimension")
        return V.check_dims(v, int(args[1].value))
    return v


@fn("castagtype")
def _fn_castagtype(scope, args, cols):
    # ::agtype — on a vector this reproduces the reference's
    # through-the-text-form cast (vectors.vector_to_agtype); on anything
    # already agtype-shaped it is the identity
    from . import vectors as V

    dt = _operand_dtype(scope, args[0], cols[0])
    if V.is_vector_dt(dt):
        return V.vector_to_agtype(cols[0])
    return cols[0]


@fn("casttext")
def _fn_casttext(scope, args, cols):
    """``::text``: on a vector the reference's text form round-trips back
    through agtype_in in its AS clause (same observable result as
    ::agtype); every other kind stringifies like toString()."""
    from . import vectors as V

    dt = _operand_dtype(scope, args[0], cols[0])
    if V.is_vector_dt(dt):
        return V.vector_to_agtype(cols[0])
    return _fn_tostring(scope, args, cols)


# ---- fuzzystrmatch parity (regress/sql/fuzzystrmatch.sql). soundex and
# levenshtein reach Spark's built-ins through the external-function
# fallthrough (values verified identical to the extension's); difference
# and metaphone need their own kernels.

@fn("difference")
def _fn_difference(scope, args, cols):
    """Number of matching soundex code positions (0-4) — fuzzystrmatch's
    difference(); expected/fuzzystrmatch.out difference block."""
    s1 = F.soundex(cols[0].cast("string"))
    s2 = F.soundex(cols[1].cast("string"))
    hits = [
        (F.substring(s1, i, 1) == F.substring(s2, i, 1)).cast("int")
        for i in (1, 2, 3, 4)
    ]
    return (hits[0] + hits[1] + hits[2] + hits[3]).cast("long")


@fn("metaphone")
def _fn_metaphone(scope, args, cols):
    """Original-Metaphone code (runtime/phonetic.py) through an
    Arrow-batched pandas UDF — a per-string rule cascade has no Column
    expression form; fuzzystrmatch runs the same published algorithm in C."""
    from ..runtime.phonetic import metaphone as _mp

    if len(args) > 1:
        if not isinstance(args[1], A.Lit):
            raise CompileError("metaphone() needs a literal max length")
        ml = int(args[1].value)
    else:
        ml = 255

    @F.pandas_udf("string")
    def _mp_udf(s):
        return s.map(lambda x: _mp(x, ml))

    return _mp_udf(cols[0].cast("string"))


@fn("dmetaphone")
def _fn_dmetaphone(scope, args, cols):
    """Primary Double Metaphone code (runtime/phonetic.py, Philips 2000) —
    fuzzystrmatch's dmetaphone(); Arrow-batched like metaphone()."""
    from ..runtime.phonetic import dmetaphone as _dm

    @F.pandas_udf("string")
    def _dm_udf(s):
        return s.map(_dm)

    return _dm_udf(cols[0].cast("string"))


@fn("dmetaphone_alt")
def _fn_dmetaphone_alt(scope, args, cols):
    from ..runtime.phonetic import dmetaphone_alt as _dma

    @F.pandas_udf("string")
    def _dma_udf(s):
        return s.map(_dma)

    return _dma_udf(cols[0].cast("string"))


# ---- pg_trgm parity (regress/sql/pg_trgm.sql). The reference exposes
# PostgreSQL's published contrib/pg_trgm inside Cypher: show_trgm /
# similarity / word_similarity.  Pure Column HOFs — trigram counts are
# bounded by string length, so the O(n^2) extent scan in word_similarity
# stays tiny per row and fully JVM-side.


def _trgm_array(c: Column) -> Column:
    """Sorted, deduped trigram array (pg_trgm generate_trgm): lowercase,
    split into alnum words, pad each '  w ' (two leading blanks, one
    trailing), take every 3-char window."""
    words = F.filter(
        F.split(F.lower(c.cast("string")), r"[^a-z0-9]+"),
        lambda w: F.length(w) > 0,
    )

    def grams(w):
        padded = F.concat(F.lit("  "), w, F.lit(" "))
        return F.transform(
            F.sequence(F.lit(1), F.length(padded) - 2),
            lambda i: padded.substr(i, F.lit(3)),
        )

    return F.array_sort(F.array_distinct(F.flatten(F.transform(words, grams))))


@fn("show_trgm")
def _fn_show_trgm(scope, args, cols):
    """pg_trgm show_trgm(): the sorted trigram array (pg_trgm.out
    show_trgm block pins '  j',' ja','ane','jan','ne ' for 'Jane')."""
    return _trgm_array(cols[0])


def trigram_similarity(a: Column, b: Column) -> Column:
    """pg_trgm similarity(): |T1 ∩ T2| / |T1 ∪ T2| computed in float4
    like the extension (cnt_sml_similarity).  Public so DataFrame-level
    pipelines can reuse the kernel outside Cypher."""
    from ..graph import let_column

    def body(t1):
        def body2(t2):
            inter = F.size(F.array_intersect(t1, t2))
            union = F.size(t1) + F.size(t2) - inter
            return F.when(union > 0, inter.cast("float") / union.cast("float")) \
                .otherwise(F.lit(0.0)).cast("float").cast("double")

        return let_column(_trgm_array(b), body2)

    return let_column(_trgm_array(a), body)


@fn("similarity")
def _fn_similarity(scope, args, cols):
    return trigram_similarity(cols[0], cols[1])


def strict_word_similarity(a: Column, b: Column) -> Column:
    """pg_trgm strict_word_similarity(s1, s2): greatest similarity between
    s1's trigram set and any continuous extent of WORDS of s2 (extent
    boundaries forced to word boundaries — trgm_op.c
    calc_word_similarity(WORD_SIMILARITY_STRICT); there are no cross-word
    trigrams, so an extent's set is the union of its words' trigrams).
    Doc-pinned: strict_word_similarity('word', 'two words') = 0.571429.
    Pure Column HOFs (JVM-side), public for DataFrame pipelines."""
    from ..graph import let_column

    words = F.filter(
        F.split(F.lower(b.cast("string")), r"[^a-z0-9]+"),
        lambda w: F.length(w) > 0,
    )

    def grams(w):
        padded = F.concat(F.lit("  "), w, F.lit(" "))
        return F.transform(
            F.sequence(F.lit(1), F.length(padded) - 2),
            lambda i: padded.substr(i, F.lit(3)),
        )

    def body(t1):
        def body2(wg):
            n1 = F.size(t1)
            nw = F.size(wg)
            ratios = F.flatten(
                F.transform(
                    F.sequence(F.lit(1), nw),
                    lambda i: F.transform(
                        F.sequence(i, nw),
                        lambda j: let_column(
                            F.array_distinct(
                                F.flatten(F.slice(wg, i, (j - i + 1).cast("int")))
                            ),
                            lambda e: let_column(
                                F.size(F.array_intersect(t1, e)).cast("float"),
                                lambda inter: inter
                                / (n1 + F.size(e) - inter).cast("float"),
                            ),
                        ),
                    ),
                )
            )
            return F.when(
                (n1 > 0) & (nw > 0),
                F.array_max(ratios).cast("float").cast("double"),
            ).otherwise(F.lit(0.0))

        return let_column(F.transform(words, grams), body2)

    return let_column(_trgm_array(a), body)


@fn("strict_word_similarity")
def _fn_strict_word_similarity(scope, args, cols):
    return strict_word_similarity(cols[0], cols[1])


@fn("word_similarity")
def _fn_word_similarity(scope, args, cols):
    """pg_trgm word_similarity(s1, s2): greatest similarity between s1's
    trigram set and any continuous extent of s2's trigram SEQUENCE in
    string order (trgm_op.c calc_word_similarity walks the word-trigram
    array positionally; extents may start/end mid-word) — max over
    extents [i..j] of |T1∩E| / (|T1| + |E| - |T1∩E|) with E the extent's
    DISTINCT trigrams.  Doc-pinned: word_similarity('word', 'two words')
    = 0.8 (extent '  w',' wo','wor','ord' inside 'words').  The former
    sorted-order prefix-sum formulation scanned extents of the sorted
    trigram set — right answers on single-word strings only."""
    from ..graph import let_column

    words = F.filter(
        F.split(F.lower(cols[1].cast("string")), r"[^a-z0-9]+"),
        lambda w: F.length(w) > 0,
    )

    def grams(w):
        padded = F.concat(F.lit("  "), w, F.lit(" "))
        return F.transform(
            F.sequence(F.lit(1), F.length(padded) - 2),
            lambda i: padded.substr(i, F.lit(3)),
        )

    def body(t1):
        def body2(pos):
            n1 = F.size(t1)
            np = F.size(pos)
            ratios = F.flatten(
                F.transform(
                    F.sequence(F.lit(1), np),
                    lambda i: F.transform(
                        F.sequence(i, np),
                        lambda j: let_column(
                            F.array_distinct(
                                F.slice(pos, i, (j - i + 1).cast("int"))
                            ),
                            lambda e: let_column(
                                F.size(F.array_intersect(t1, e)).cast("float"),
                                lambda inter: inter
                                / (n1 + F.size(e) - inter).cast("float"),
                            ),
                        ),
                    ),
                )
            )
            return F.when(
                (n1 > 0) & (np > 0),
                F.array_max(ratios).cast("float").cast("double"),
            ).otherwise(F.lit(0.0))

        return let_column(F.flatten(F.transform(words, grams)), body2)

    return let_column(_trgm_array(cols[0]), body)


def _TAGGED_TYPE_CACHE():
    from ..graph import TAGGED_TYPE

    return TAGGED_TYPE


@fn("agtype_build_map")
def _fn_agtype_build_map(scope, args, cols):
    """ag_catalog.agtype_build_map(k1, v1, ...) — callable from Cypher via
    the schema-qualified form (agtype.out:3806). Keys stringify like the
    reference (2 -> "2", 3.14 -> "3.14"); jsonb key order applies at
    print."""
    if len(args) % 2:
        raise CompileError(
            "agtype_build_map() argument list must have an even number of elements"
        )
    if not args:
        return F.struct(F.lit(None).cast("string").alias("_none"))
    fields: dict = {}
    for i in range(0, len(args), 2):
        ka = args[i]
        if not isinstance(ka, A.Lit) or ka.value is None or isinstance(
            ka.value, (dict, list)
        ):
            raise CompileError(
                "agtype_build_map_as_agtype_value only supports scalar arguments"
            )
        key = (
            ka.value
            if isinstance(ka.value, str)
            else (getattr(ka, "raw", None) or str(ka.value))
        )
        fields[key] = cols[i + 1]
    return F.struct(*[c.alias(k) for k, c in fields.items()])


@fn("agtype_build_list")
def _fn_agtype_build_list(scope, args, cols):
    return compile_expr(scope, A.ListLit(list(args)))

@fn("pg_typeof")
def _fn_pg_typeof(scope, args, cols):
    # inside cypher() every value IS agtype (expr.out:948)
    return F.lit("agtype")


@fn("pg_sqrt")
def _fn_pg_sqrt(scope, args, cols):
    """pg_catalog.sqrt with the reference's negative-argument error
    (float.c dsqrt). SCOPE BOUND: the error is detected SYNTACTICALLY on
    literal ASTs only — a computed negative (``sqrt(0-1)`` or a negative
    column value) returns NULL instead of raising, because a distributed
    plan cannot raise per-row without a runtime raise_error branch. This
    is a test-parity shim for the regression suites' literal calls."""
    _require_numeric(scope, "sqrt", args, cols)
    a0 = args[0] if args else None
    neg = isinstance(a0, A.Unary) and a0.op == "-"
    if not neg and isinstance(a0, A.FuncCall) and a0.args:
        # -1::pg_float8 arrives as castpgfloat8(Unary(-,1))
        inner = a0.args[0]
        neg = isinstance(inner, A.Unary) and inner.op == "-"
    if neg:
        raise CompileError("cannot take square root of a negative number")
    return F.sqrt(cols[0])

@fn("is_valid_label_name")
def _fn_is_valid_label_name(scope, args, cols):
    # name_validation.out — the reference's label-name rules as a boolean
    from ..catalog import _NAME_RE

    a0 = args[0] if args else None
    if isinstance(a0, A.Lit):
        if not isinstance(a0.value, str):
            return F.lit(False)
        return F.lit(bool(_NAME_RE.match(a0.value)))
    return F.regexp_like(cols[0].cast("string"), F.lit(r"^[A-Za-z_][A-Za-z0-9_]{0,62}$"))

