"""Graph catalog: graphs, labels, label_id allocation, graphid packing.

Mirrors the reference's catalog semantics (ag_graph/ag_label tables and the
int64 graphid encoding) without its storage machinery:

- reference: ``sql/age_main.sql:54-81`` (catalog tables),
  ``src/include/utils/graphid.h:29-62`` (id packing),
  ``src/backend/commands/label_commands.c:362-366`` (per-label sequences).

A ``graphid`` packs a 16-bit label id and a 48-bit entry id into one int64:

    graphid = (label_id << 48) | entry_id

so the label of an entity is recoverable from its id alone (used by MATCH to
filter already-bound vertices by label without a join —
``cypher_clause.c:5272 filter_vertices_on_label_id``), and every join/filter in
the engine stays a plain LongType operation — critical at 100 TB (no string
keys ever shuffle).
"""

from __future__ import annotations

import json
import re
from dataclasses import dataclass, field

ENTRY_ID_BITS = 48
ENTRY_ID_MASK = (1 << ENTRY_ID_BITS) - 1
MAX_LABEL_ID = (1 << 16) - 1

# Name rules follow the reference's name_validation.c:
# graph/label names: start with letter or underscore, then word chars; the
# reference caps at 63 bytes (PG NAMEDATALEN).
_NAME_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]{0,62}$")

VERTEX_KIND = "v"
EDGE_KIND = "e"

# Default label names (include/commands/label_commands.h:25-26); created
# with the graph so they consume label ids 1 and 2 from the sequence and
# user labels start at 3 — graphid parity with the reference's regression
# outputs (e.g. first user vertex label packs ids as 3 << 48 | entry).
DEFAULT_VLABEL = "_ag_label_vertex"
DEFAULT_ELABEL = "_ag_label_edge"


class CatalogError(ValueError):
    pass


def validate_name(name: str, what: str = "name") -> str:
    if not isinstance(name, str) or not _NAME_RE.match(name):
        raise CatalogError(f"invalid {what}: {name!r}")
    return name


def pack_graphid(label_id: int, entry_id: int) -> int:
    """graphid = label_id << 48 | entry_id  (graphid.h:46-50 make_graphid)."""
    if not (0 <= label_id <= MAX_LABEL_ID):
        raise CatalogError(f"label_id out of range: {label_id}")
    if not (0 <= entry_id <= ENTRY_ID_MASK):
        raise CatalogError(f"entry_id out of range: {entry_id}")
    return (label_id << ENTRY_ID_BITS) | entry_id


def label_id_of(graphid: int) -> int:
    """GET_LABEL_ID (graphid.h:59)."""
    return (graphid >> ENTRY_ID_BITS) & MAX_LABEL_ID


def entry_id_of(graphid: int) -> int:
    """GET_ENTRY_ID (graphid.h:60)."""
    return graphid & ENTRY_ID_MASK


@dataclass
class LabelMeta:
    name: str
    label_id: int
    kind: str  # 'v' or 'e'
    next_entry_id: int = 1  # per-label sequence (label_commands.c:362-366)
    # deferred floor computations (thunks returning a max user-supplied
    # entry id, or None for an empty load); resolved on first allocate()
    pending_floors: list = field(default_factory=list)

    def allocate(self, n: int) -> int:
        """Reserve n entry ids; return the first. Single-writer batch model
        (SURVEY §7.3: reserve ranges per job)."""
        self._resolve_pending()
        first = self.next_entry_id
        self.next_entry_id += n
        if self.next_entry_id > ENTRY_ID_MASK:
            raise CatalogError(f"label {self.name}: entry id space exhausted")
        return first

    def bump_lazy(self, thunk) -> None:
        """Register a deferred sequence floor (mirrors setval after a load
        with id_field_exists — keeps CREATE/MERGE allocations from colliding
        with user-supplied entry ids). Deferred so pure loads never pay a
        Spark action; the max-scan runs only if a write later allocates."""
        self.pending_floors.append(thunk)

    def _resolve_pending(self) -> None:
        if not self.pending_floors:
            return
        for t in self.pending_floors:
            mx = t()
            if mx is not None:
                self.next_entry_id = max(self.next_entry_id, mx + 1)
        self.pending_floors = []


@dataclass
class GraphMeta:
    name: str
    labels: dict[str, LabelMeta] = field(default_factory=dict)
    next_label_id: int = 1

    def __post_init__(self):
        # graph_commands.c create_graph: the two default labels are created
        # with the graph, taking ids 1 and 2 (from_dict replays a stored
        # sequence and skips this)
        if self.next_label_id == 1 and not self.labels:
            self.create_label(DEFAULT_VLABEL, VERTEX_KIND)
            self.create_label(DEFAULT_ELABEL, EDGE_KIND)

    def label(self, name: str) -> LabelMeta:
        try:
            return self.labels[name]
        except KeyError:
            raise CatalogError(f"label {name!r} does not exist in graph {self.name!r}") from None

    def has_label(self, name: str) -> bool:
        return name in self.labels

    def create_label(self, name: str, kind: str) -> LabelMeta:
        validate_name(name, "label name")
        if name in self.labels:
            existing = self.labels[name]
            if existing.kind != kind:
                raise CatalogError(f"label {name!r} already exists with kind {existing.kind!r}")
            return existing
        if self.next_label_id > MAX_LABEL_ID:
            raise CatalogError("label id space exhausted")
        meta = LabelMeta(name=name, label_id=self.next_label_id, kind=kind)
        self.next_label_id += 1
        self.labels[name] = meta
        return meta

    def renamed(self, new_name: str) -> "GraphMeta":
        """Same catalog under a new graph name (label metas — and so the id
        space — are shared: used by subgraph extraction, where ids carry
        over)."""
        validate_name(new_name, "graph name")
        return GraphMeta(name=new_name, labels=dict(self.labels), next_label_id=self.next_label_id)

    def vertex_labels(self) -> list[LabelMeta]:
        return [m for m in self.labels.values() if m.kind == VERTEX_KIND]

    def edge_labels(self) -> list[LabelMeta]:
        return [m for m in self.labels.values() if m.kind == EDGE_KIND]

    # ---- (de)serialization: the engine catalog is small JSON metadata ----
    def to_dict(self) -> dict:
        for m in self.labels.values():
            m._resolve_pending()  # persisted sequences must be collision-safe
        return {
            "name": self.name,
            "next_label_id": self.next_label_id,
            "labels": [
                {
                    "name": m.name,
                    "label_id": m.label_id,
                    "kind": m.kind,
                    "next_entry_id": m.next_entry_id,
                }
                for m in self.labels.values()
            ],
        }

    @classmethod
    def from_dict(cls, d: dict) -> "GraphMeta":
        g = cls(name=d["name"], next_label_id=d["next_label_id"])
        for ld in d["labels"]:
            g.labels[ld["name"]] = LabelMeta(
                name=ld["name"],
                label_id=ld["label_id"],
                kind=ld["kind"],
                next_entry_id=ld["next_entry_id"],
            )
        return g

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=1)

    @classmethod
    def from_json(cls, s: str) -> "GraphMeta":
        return cls.from_dict(json.loads(s))
