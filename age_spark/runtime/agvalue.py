"""agtype output formatting — the golden-test contract.

Replicates ``agtype_out`` (``src/backend/utils/adt/agtype.c:418`` and the
serializer it drives) so results collected from our DataFrames print
byte-identically to the reference's regression outputs
(``regress/expected/*.out``):

  - vertices/edges/paths print as JSON + ``::vertex``/``::edge``/``::path``
  - object keys use JSONB storage order: sorted by (length, byte order) —
    which is why an edge prints id, label, end_id, start_id, properties
  - floats keep a trailing ``.0`` for integral values (PG float8out);
    integers print bare; strings JSON-escaped; booleans lowercase;
    null prints as the SQL empty cell (None here)
  - ``, `` between items, ``: `` after keys (jsonb_out conventions)
"""

from __future__ import annotations

import decimal as _decimal
import json
import math
import struct as _struct
from typing import Any, Optional

from ..graph import FLOAT_SENTINEL, NUM_SENTINEL

try:  # Row is only needed for isinstance checks
    from pyspark.sql import Row
except Exception:  # pragma: no cover
    Row = tuple  # type: ignore


def _is_entity_dict(d: dict) -> Optional[str]:
    keys = set(d.keys())
    if {"id", "label", "properties"} <= keys:
        return "edge" if {"start_id", "end_id"} <= keys else "vertex"
    if {"nodes", "edges"} <= keys and len(keys) == 2:
        return "path"
    return None


def _jsonb_key_order(keys):
    return sorted(keys, key=lambda k: (len(k), k))


def _fmt_float(v: float) -> str:
    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == int(v) and abs(v) < 1e16:
        return f"{int(v)}.0"
    try:
        # the float4 shortening only serves pgvector-scale values; big
        # powers of two (2^64 from an overflowing int literal) are f32-
        # exact by accident and must keep their %.15g digits
        f32_exact = (
            1e-30 < abs(v) < 1e10
            and _struct.unpack("f", _struct.pack("f", v))[0] == v
        )
    except OverflowError:  # |v| beyond float4 range
        f32_exact = False
    if f32_exact:
        # exactly float4-representable: print float4 shortest digits.
        # pgvector values reach agtype through their float4 text form
        # (pgvector.out:459 — 0.26726124, not the widened float8 digits),
        # and a float8 COMPUTATION landing exactly on a float4 value is a
        # ~2^-29 coincidence whose shorter print still reads back equal.
        import numpy as _np

        return repr(_np.float32(v))
    # float8out with extra_float_digits=0 (the regress environment):
    # %.15g — pi() prints 3.14159265358979, not the 17-digit repr
    # (expr.out:631); shortest-repr values within 15 digits unaffected
    s = "%.15g" % v
    if "e" in s or "E" in s:
        return s
    if "." not in s:
        return s + ".0"
    return s


def _props(d: Optional[dict]) -> dict:
    if not d:
        return {}
    return {k: v for k, v in d.items() if k != "_none" and v is not None}


def agtype_out(value: Any) -> Optional[str]:
    """Format one collected value the way the reference's agtype_out does.
    Returns None for SQL NULL (psql prints an empty cell)."""
    if value is None:
        return None
    return _out(value)


def _out(v: Any) -> str:
    if v is None:
        return "null"  # nested null prints; only top-level NULL is an empty cell
    if isinstance(v, Row):
        v = v.asDict(recursive=True)
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, int):
        return str(v)
    if isinstance(v, float):
        return _fmt_float(v)
    if isinstance(v, _decimal.Decimal):
        # agtype NUMERIC prints with a ::numeric suffix (expr.out:1758-1771).
        # A Decimal value only reaches here from the bounded in-lambda
        # DECIMAL(38,18) lane (everything else carries exact __d TEXT);
        # that fixed type pads scale, so strip trailing zeros.
        return f"{format(v.normalize(), 'f')}::numeric"
    if isinstance(v, str):
        if v.startswith(NUM_SENTINEL):
            # NUMERIC embedded in a container payload: sentinel string
            # carries exact digits + the ::numeric marker (graph.py
            # _tagged_json_text)
            return v[len(NUM_SENTINEL):] + "::numeric"
        if v.startswith(FLOAT_SENTINEL):
            # FLOAT embedded in a container payload — float8out format,
            # NaN/Infinity bare (expr.out:1924)
            return _fmt_float(float(v[len(FLOAT_SENTINEL):]))
        return json.dumps(v, ensure_ascii=False)
    if isinstance(v, (list, tuple)):
        return "[" + ", ".join(_out(x) for x in v) + "]"
    if isinstance(v, dict):
        if "__k" in v and set(v.keys()) <= {"__k", "__n", "__i", "__d", "__s", "__b", "__o", "__j"}:
            # tagged dynamic value (mixed-kind property): print its payload
            k = v["__k"]
            if k in (0, 1, 2, 3, 4):
                # path/edge/vertex/object/array kinds: JSON payload
                # round-trip (entity payloads re-dispatch through the
                # entity-dict formatting below, keeping ::vertex suffixes)
                return _out(json.loads(v["__j"]))
            if k == 5:
                return json.dumps(v["__s"], ensure_ascii=False)
            if k == 6:
                return "true" if v["__b"] else "false"
            if k == 7:
                # numeric kinds: NUMERIC carries its decimal in __d
                # (prints with the ::numeric marker), int its exact int64
                # in __i (prints bare, >2^53 exact); float prints
                # float8out-style with the ".0" kept for integral values
                # (ag_float8_supp.c:31; agtype.h:307-323 kind trio)
                d = v.get("__d")
                if d is not None:
                    # exact text payload — NaN/Infinity spellings included
                    return f"{d}::numeric"
                i = v.get("__i")
                if i is not None:
                    return str(i)
                return _fmt_float(v["__n"])
            return "null"
        kind = _is_entity_dict(v)
        if kind == "vertex":
            body = {
                "id": v["id"],
                "label": v["label"],
                "properties": _props(v.get("properties")),
            }
            return _obj(body) + "::vertex"
        if kind == "edge":
            body = {
                "id": v["id"],
                "label": v["label"],
                "end_id": v["end_id"],
                "start_id": v["start_id"],
                "properties": _props(v.get("properties")),
            }
            return _obj(body) + "::edge"
        if kind == "path":
            nodes = [x if isinstance(x, dict) else x.asDict(recursive=True) for x in v["nodes"]]
            edges = [x if isinstance(x, dict) else x.asDict(recursive=True) for x in v["edges"]]
            inter: list = []
            for i, n in enumerate(nodes):
                inter.append(_out(n))
                if i < len(edges):
                    inter.append(_out(edges[i]))
            return "[" + ", ".join(inter) + "]::path"
        return _obj(v)
    raise TypeError(f"cannot format {type(v).__name__} as agtype")


def _obj(d: dict) -> str:
    # the _pstruct marker tags a bare properties() struct: its null fields
    # mean ABSENT keys (label-table storage convention), unlike a map
    # literal where an explicit null prints
    props_conv = "_pstruct" in d
    items = []
    for k in _jsonb_key_order(d.keys()):
        if k in ("_none", "_pstruct") and d[k] is None:
            continue  # engine sentinel fields, not keys
        if props_conv and d[k] is None:
            continue
        items.append(f"{json.dumps(k, ensure_ascii=False)}: {_out(d[k])}")
    return "{" + ", ".join(items) + "}"


def format_result(rows, columns=None) -> list[list[Optional[str]]]:
    """Format a collected result set (list of Rows) as the reference would
    print it — one formatted string (or None) per column per row."""
    out = []
    for r in rows:
        if columns is None:
            columns = r.__fields__ if hasattr(r, "__fields__") else list(range(len(r)))
        out.append([agtype_out(r[c] if isinstance(c, str) else r[c]) for c in columns])
    return out
