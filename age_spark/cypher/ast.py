"""Cypher AST.

Node inventory mirrors the reference grammar's productions
(``src/backend/parser/cypher_gram.y``) and its parse-node structs
(``src/include/nodes/cypher_nodes.h``), re-expressed as plain dataclasses.
This is IR #1 of the pipeline; the compiler lowers it straight to DataFrame
operations (there is no intermediate relational Query tree — Catalyst is our
planner).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

# --------------------------------------------------------------------- exprs


class Expr:
    pass


@dataclass
class Lit(Expr):
    value: object  # int | float | str | bool | None
    # original numeric spelling, kept so ::numeric can parse the exact
    # decimal digits (a float lexeme loses precision the reference's
    # NUMERIC keeps: '100000000000.0000000000001'::numeric, agtype.sql)
    raw: object = None


@dataclass
class Param(Expr):
    name: str


@dataclass
class Var(Expr):
    name: str


@dataclass
class Prop(Expr):
    expr: Expr
    key: str


@dataclass
class Index(Expr):
    expr: Expr
    index: Expr
    # True for the jsonb `->` spelling: scalar bases self-index at 0/-1
    # there, while a bracket subscript on a non-container errors
    # (jsonb_operators.out:63 vs expr.out:996)
    arrow: bool = False


@dataclass
class Slice(Expr):
    expr: Expr
    lo: Optional[Expr]
    hi: Optional[Expr]


@dataclass
class ListLit(Expr):
    items: list[Expr]


@dataclass
class MapLit(Expr):
    items: list[tuple[str, Expr]]


@dataclass
class MapProjection(Expr):
    """m{.k, .*, var, k: expr} — cypher_gram.y:2164-2239."""
    var: str
    items: list[tuple[str, object]]  # (kind, payload): ('prop',key)|('all',None)|('var',name)|('expr',(key,Expr))


@dataclass
class Star(Expr):
    pass


@dataclass
class FuncCall(Expr):
    name: str  # lowercased
    args: list[Expr]
    distinct: bool = False


@dataclass
class Unary(Expr):
    op: str  # '-', '+', 'not'
    expr: Expr


@dataclass
class Binary(Expr):
    op: str  # arithmetic/comparison/boolean/string ops, lowercased keywords
    left: Expr
    right: Expr


@dataclass
class IsNull(Expr):
    expr: Expr
    negated: bool = False  # True => IS NOT NULL


@dataclass
class CaseExpr(Expr):
    operand: Optional[Expr]
    whens: list[tuple[Expr, Expr]]
    default: Optional[Expr]


@dataclass
class ListComp(Expr):
    """[x IN list WHERE p | expr] — cypher_gram.y:2257-2284."""
    var: str
    source: Expr
    where: Optional[Expr]
    projection: Optional[Expr]


@dataclass
class PredFn(Expr):
    """all/any/none/single(x IN list WHERE p) — cypher_gram.y:1956-1972."""
    kind: str
    var: str
    source: Expr
    where: Expr


@dataclass
class Reduce(Expr):
    """reduce(acc = init, x IN list | expr) — regress/sql/age_reduce.sql."""
    acc: str
    init: Expr
    var: str
    source: Expr
    expr: Expr


@dataclass
class PatternPred(Expr):
    """A path pattern used as a boolean expression in WHERE
    (``cypher_clause.c:4333 transform_cypher_sub_pattern``)."""
    pattern: "PathPattern"


@dataclass
class ExistsSubquery(Expr):
    """EXISTS { MATCH ... [WHERE ...] } — cypher_gram.y:1977-2032.
    ``paren_form`` marks EXISTS(pattern): that form may only REFERENCE
    variables (a new named variable is the reference's 'variable creation
    error'), while the braced subquery may introduce its own."""
    patterns: list["PathPattern"]
    where: Optional[Expr]
    paren_form: bool = False
    returns: Optional[list[Expr]] = None  # RETURN items (existence only —
    # kept so variable references validate, cypher_subquery.out rte errors)


@dataclass
class CountSubquery(Expr):
    patterns: list["PathPattern"]
    where: Optional[Expr]
    returns: Optional[list[Expr]] = None


# ------------------------------------------------------------------ patterns


@dataclass
class ExactProps(Expr):
    """`={...}` pattern constraint: per-key EQUALITY even when containment
    is the session default (cypher_match.sql `MATCH (x:Customer ={...})`
    blocks)."""
    inner: Expr


@dataclass
class NodePattern:
    var: Optional[str]
    labels: list[str]
    props: Optional[Expr]  # MapLit or Param


@dataclass
class RelPattern:
    var: Optional[str]
    types: list[str]
    props: Optional[Expr]
    direction: str  # 'out' (->), 'in' (<-), 'both' (undirected)
    varlen: Optional[tuple[Optional[int], Optional[int]]] = None  # (min,max); None=not VLE


@dataclass
class PathPattern:
    var: Optional[str]  # p = (a)-[..]->(b)
    elements: list[Union[NodePattern, RelPattern]]  # node, rel, node, rel, node...


# ------------------------------------------------------------------- clauses


class Clause:
    pass


@dataclass
class ReturnItem:
    expr: Expr
    alias: Optional[str]


@dataclass
class OrderItem:
    expr: Expr
    asc: bool = True


@dataclass
class Match(Clause):
    patterns: list[PathPattern]
    optional: bool = False
    where: Optional[Expr] = None


@dataclass
class Unwind(Clause):
    expr: Expr
    var: str


@dataclass
class With(Clause):
    items: list[ReturnItem]  # [] + star=True for WITH *
    distinct: bool = False
    star: bool = False
    order_by: list[OrderItem] = field(default_factory=list)
    skip: Optional[Expr] = None
    limit: Optional[Expr] = None
    where: Optional[Expr] = None


@dataclass
class Return(Clause):
    items: list[ReturnItem]
    distinct: bool = False
    star: bool = False
    order_by: list[OrderItem] = field(default_factory=list)
    skip: Optional[Expr] = None
    limit: Optional[Expr] = None


@dataclass
class Create(Clause):
    patterns: list[PathPattern]


@dataclass
class SetItem:
    kind: str  # 'prop' (n.p = e), 'replace' (n = m), 'merge' (n += m)
    var: str
    key: Optional[str]  # for 'prop'
    expr: Optional[Expr]


@dataclass
class SetClause(Clause):
    items: list[SetItem]


@dataclass
class RemoveItem:
    var: str
    key: str


@dataclass
class RemoveClause(Clause):
    items: list[RemoveItem]


@dataclass
class Delete(Clause):
    exprs: list[Expr]
    detach: bool = False


@dataclass
class Merge(Clause):
    pattern: PathPattern
    on_create: list[SetItem] = field(default_factory=list)
    on_match: list[SetItem] = field(default_factory=list)


@dataclass
class CallProc(Clause):
    """CALL name(args) [YIELD items [WHERE expr]] — cypher_gram.y:436-553."""
    name: str
    args: list[Expr]
    yield_items: list[ReturnItem] = field(default_factory=list)
    where: Optional[Expr] = None


# -------------------------------------------------------------------- query


@dataclass
class SingleQuery:
    clauses: list[Clause]


@dataclass
class UnionQuery:
    parts: list[SingleQuery]
    alls: list[bool]  # alls[i]: parts[i] UNION [ALL] parts[i+1]
