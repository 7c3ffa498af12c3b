"""Compilation context: variable bindings + per-query state.

The reference's analyzer keeps a per-clause ParseState whose range table
carries the bound pattern variables (``cypher_clause.c
transform_match_entities``); our equivalent is an ``Env`` mapping variable
name -> Binding, where each binding owns one column of the in-flight
DataFrame (entity bindings are STRUCT columns, scalars are native columns).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

VERTEX = "vertex"
EDGE = "edge"
EDGE_LIST = "edge_list"  # VLE binding: ARRAY<edge struct>
PATH = "path"  # STRUCT<nodes ARRAY<vertex>, edges ARRAY<edge>>
SCALAR = "scalar"


class CompileError(ValueError):
    pass


@dataclass(frozen=True)
class Binding:
    name: str  # column name in the DataFrame (== variable name)
    kind: str  # one of the constants above
    labels: tuple[str, ...] = ()  # statically-known label restriction ((), = any)
    hidden: bool = False  # anonymous pattern variables (not visible to RETURN *)
    deleted: bool = False  # entity deleted by an earlier DELETE in this query
    # (later CREATE through it must error: "vertex assigned to variable x
    # was deleted", executor/cypher_create.c)


@dataclass
class Env:
    """Immutable-ish variable scope. WITH creates a fresh Env (scoping
    barrier, ``cypher_clause.c:3686``)."""

    bindings: dict[str, Binding] = field(default_factory=dict)

    def get(self, name: str) -> Optional[Binding]:
        return self.bindings.get(name)

    def require(self, name: str) -> Binding:
        b = self.bindings.get(name)
        if b is None:
            raise CompileError(f"variable `{name}` is not defined")
        return b

    def bind(self, b: Binding) -> "Env":
        new = dict(self.bindings)
        new[b.name] = b
        return Env(new)

    def names(self) -> list[str]:
        return list(self.bindings)

    def visible_names(self) -> list[str]:
        return [n for n, b in self.bindings.items() if not b.hidden]

    def entity_names(self) -> list[str]:
        return [n for n, b in self.bindings.items() if b.kind in (VERTEX, EDGE, EDGE_LIST, PATH)]


@dataclass
class QueryContext:
    """Per-query mutable state: the graph snapshot, parameters, counters."""

    spark: object
    graph: object  # Graph (import cycle avoided)
    params: dict = field(default_factory=dict)
    # property-constraint semantics: containment (the reference default,
    # age.enable_containment=on) vs per-key equality (off). The `={...}`
    # syntax forces equality per constraint regardless.
    enable_containment: bool = True
    # owning AgeSession, when compiled through one — gives name-addressed
    # functions (graph_stats('g'), delete_global_graphs) the session's
    # graph catalog and loaded-context set (age_global_graph.c GGC analogue)
    session: object = None
    _counter: int = 0
    # cross-clause scratch (SHARED by reference across with_graph copies):
    # e.g. "pending_order" — the ORDER BY of the previous projection, so a
    # following collect() aggregates in the sorted order the reference's
    # sequential executor would see
    scratch: dict = field(default_factory=dict)

    def fresh(self, prefix: str = "_anon") -> str:
        self._counter += 1
        return f"{prefix}{self._counter}"

    def with_graph(self, graph) -> "QueryContext":
        return replace(self, graph=graph)
