"""Exact normalized order text for dynamic (tagged) agtype values.

A faithful port of the reference's B-Tree comparator pair —
``compare_agtype_containers_orderability`` (agtype_util.c:333) and
``compare_agtype_scalar_values`` (agtype_util.c:960) — as an ORDER-ONLY
byte string: ``text(a) < text(b)``  iff  ``compare(a, b) < 0``.  Computed
vectorized (Arrow batches) from a tagged value's payload slots, it keys
ORDER BY and the ``= <> < <= > >=`` operators on dynamic values with the
reference's element-wise container recursion at ANY depth and width —
the former 16-element / depth-3 JVM-side bound applies only where a
Python UDF cannot run (inside higher-order-function lambdas).

Encoding, mirroring the token-stream walk of the reference comparator:

  - first byte = kind rank (get_type_sort_priority, agtype_util.c:271):
    'A'+rank — path=0, edge=1, vertex=2, object=3, array=4, string=5,
    bool=6, numeric=7, null=8
  - arrays:  'E' + (elem_key SEP)* END; objects: 'D' + (key SEP val_key
    SEP)* END with pairs in jsonb (length, byte) key order.  END(\\x02) <
    SEP(\\x03) < any payload byte, so a container that ends while the
    other continues sorts FIRST — the premature-END rule the reference
    applies when one iterator hits WAGT_END while the other holds a token
    (agtype_util.c:476-495)
  - vertices/edges: rank + zero-padded graphid (compare_agtype_scalar_values
    AGTV_VERTEX/AGTV_EDGE compare ids only); paths: rank + zero-padded
    element count FIRST (the AGTV_PATH num_elems fast path) + element keys
  - numbers: one exact decimal encoding across the int/float/numeric kind
    trio — sign bucket + biased adjusted exponent + mantissa digits
    (nines-complement for negatives) with kind-appropriate terminators.
    Floats convert through their shortest round-trip text, matching PG's
    float8 -> numeric conversion (float8out then numeric_in), so
    ``2.0 = 2::numeric`` holds and NaN sorts largest ('9'), matching both
    float8 orderability and numeric_cmp.  Documented deviation: the
    reference compares a >2^53 int against a float by casting BOTH to
    float8 (agtype_util.c int/float branch) — a non-transitive collapse a
    single total-order key cannot express; this encoding compares exactly.

String payloads (and object keys) are embedded through an
order-preserving escape so the key stays INJECTIVE even when user data
contains the framing control bytes: each byte in \\x00-\\x04 is prefixed
with \\x04 (``\\x04`` itself included, so the escape is unambiguous).
Escaped pairs start at \\x04 > SEP(\\x03) > END(\\x02), preserving both
the premature-END rule and raw byte order — ``["a\\x03Fb"]`` and
``["a","b"]`` now key differently.  The engine's \\x01-prefixed payload
sentinels are decoded before embedding, never compared raw.
"""

from __future__ import annotations

import json
import math
import re
from decimal import Decimal
from typing import Any, Optional

_END = "\x02"
_SEP = "\x03"
# order-preserving escape for string payloads: any byte <= \x04 gets a
# \x04 prefix, keeping every payload byte sequence > SEP and injective
_CTRL_RE = re.compile("[\x00-\x04]")


def esc_payload(s: str) -> str:
    """Escape framing control bytes in a string payload (order-preserving:
    escaped pairs keep the raw byte as the second char, and \\x04 > SEP)."""
    if _CTRL_RE.search(s) is None:
        return s
    return _CTRL_RE.sub(lambda m: "\x04" + m.group(0), s)
# terminators ordering a mantissa prefix correctly: positives end low
# (12 < 12.05 -> '12\x05' < '1205\x05'), negatives end high
# (-12 > -12.05 -> '87~' > '8794~' under nines-complement digits)
_POS_TERM = "\x05"
_NEG_TERM = "~"
_ADJ_BIAS = 500000  # PG numeric weight spans ~±131k decimal digits


def _rank_char(rank: int) -> str:
    return chr(ord("A") + rank)


def numeric_key(d: Decimal) -> str:
    """Sortable text of one exact decimal: lexical order == numeric order."""
    if d.is_nan():
        return "9"  # NaN largest (compare_two_floats_orderability / numeric NaN)
    if d.is_infinite():
        return "8" if d > 0 else "1"
    if d == 0:
        return "5"  # covers -0.0 == 0.0
    sign, digits, exp = d.as_tuple()
    dl = list(digits)
    while len(dl) > 1 and dl[-1] == 0:  # strip trailing zeros exactly
        dl.pop()
        exp += 1
    while len(dl) > 1 and dl[0] == 0:
        dl.pop(0)
    adj = exp + len(dl) - 1  # adjusted (scientific) exponent
    adj = max(-_ADJ_BIAS + 1, min(_ADJ_BIAS - 1, adj))
    mant = "".join(str(x) for x in dl)
    if sign == 0:
        return "6" + format(adj + _ADJ_BIAS, "07d") + mant + _POS_TERM
    nines = "".join(str(9 - int(c)) for c in mant)
    return "4" + format(_ADJ_BIAS - adj, "07d") + nines + _NEG_TERM


def _float_decimal(v: float) -> Decimal:
    """float8 -> exact decimal through the shortest round-trip text, the
    way PG converts float8 to numeric (float8out -> numeric_in)."""
    if math.isnan(v):
        return Decimal("NaN")
    if math.isinf(v):
        return Decimal("Infinity") if v > 0 else Decimal("-Infinity")
    return Decimal(repr(v))


def _entity_kind_of(d: dict) -> Optional[str]:
    keys = set(d.keys())
    if {"id", "label", "properties"} <= keys:
        return "edge" if {"start_id", "end_id"} <= keys else "vertex"
    if {"nodes", "edges"} <= keys and len(keys) == 2:
        return "path"
    return None


_TAGGED_KEYS = {"__k", "__n", "__i", "__d", "__s", "__b", "__o", "__j"}


def order_text_value(v: Any) -> str:
    """Full ranked order key of one parsed payload value (the recursive
    worker — handles nested tagged dicts, entity dicts, sentinel strings)."""
    # late import: graph.py lazily imports this module (circularity guard)
    from ..graph import FLOAT_SENTINEL, NUM_SENTINEL

    if v is None:
        return _rank_char(8)
    if isinstance(v, bool):  # before int: bool is an int subclass
        return _rank_char(6) + ("1" if v else "0")
    if isinstance(v, int):
        return _rank_char(7) + numeric_key(Decimal(v))
    if isinstance(v, float):
        return _rank_char(7) + numeric_key(_float_decimal(v))
    if isinstance(v, Decimal):
        return _rank_char(7) + numeric_key(v)
    if isinstance(v, str):
        if v.startswith(NUM_SENTINEL):
            return _rank_char(7) + numeric_key(Decimal(v[len(NUM_SENTINEL):]))
        if v.startswith(FLOAT_SENTINEL):
            # JVM Double.toString text: shortest round-trip, Decimal-exact
            return _rank_char(7) + numeric_key(Decimal(v[len(FLOAT_SENTINEL):]))
        return _rank_char(5) + esc_payload(v)
    if isinstance(v, (list, tuple)):
        return (
            _rank_char(4)
            + "".join(order_text_value(x) + _SEP for x in v)
            + _END
        )
    if isinstance(v, dict):
        if "__k" in v and set(v.keys()) <= _TAGGED_KEYS:
            return _tagged_dict_key(v)
        ek = _entity_kind_of(v)
        if ek == "vertex":
            return _rank_char(2) + format(int(v["id"]), "020d")
        if ek == "edge":
            return _rank_char(1) + format(int(v["id"]), "020d")
        if ek == "path":
            nodes, edges = v["nodes"] or [], v["edges"] or []
            parts = []
            for i, n in enumerate(nodes):
                parts.append(order_text_value(n))
                if i < len(edges):
                    parts.append(order_text_value(edges[i]))
            # AGTV_PATH: element COUNT decides first (agtype_util.c:1025)
            return (
                _rank_char(0)
                + format(len(nodes) + len(edges), "010d")
                + "".join(parts)
            )
        # plain object: pairs in jsonb (length, byte) key order; engine
        # sentinel fields and _pstruct null-means-absent follow agvalue._obj
        props_conv = "_pstruct" in v
        items = []
        for k in sorted(v.keys(), key=lambda k: (len(k), k)):
            if k in ("_none", "_pstruct") and v[k] is None:
                continue
            if props_conv and v[k] is None:
                continue
            items.append(esc_payload(k) + _SEP + order_text_value(v[k]) + _SEP)
        return _rank_char(3) + "".join(items) + _END
    raise TypeError(f"cannot order {type(v).__name__} as agtype")


def _tagged_dict_key(v: dict) -> str:
    k = v.get("__k")
    if k is None:
        return _rank_char(8)
    k = int(k)
    if k in (0, 1, 2, 3, 4):
        j = v.get("__j")
        return order_text_value(json.loads(j)) if j is not None else _rank_char(8)
    if k == 5:
        return _rank_char(5) + esc_payload(v.get("__s") or "")
    if k == 6:
        return _rank_char(6) + ("1" if v.get("__b") else "0")
    if k == 7:
        d = v.get("__d")
        if d is not None:
            return _rank_char(7) + numeric_key(Decimal(d))
        i = v.get("__i")
        if i is not None:
            return _rank_char(7) + numeric_key(Decimal(int(i)))
        n = v.get("__n")
        if n is not None:
            return _rank_char(7) + numeric_key(_float_decimal(float(n)))
    return _rank_char(8)


def tag_order_text(
    k, j: Optional[str], d: Optional[str], i: Optional[str], n: Optional[str]
) -> Optional[str]:
    """Order text of one tagged value from its payload slots (``__i``/``__n``
    pre-cast to STRING JVM-side so pandas NaN never aliases SQL NULL).
    Non-container, non-numeric kinds return None — their native slots
    (__s id/string, __b) already order exactly."""
    if k is None or (isinstance(k, float) and math.isnan(k)):
        return None
    k = int(k)
    if k in (0, 3, 4):
        if j is None:
            return None
        return order_text_value(json.loads(j))
    if k == 7:
        if d is not None:
            return _rank_char(7) + numeric_key(Decimal(d))
        if i is not None:
            return _rank_char(7) + numeric_key(Decimal(i))
        if n is not None:
            return _rank_char(7) + numeric_key(Decimal(n))
    return None


def full_tag_text(k, n, d, s, b, j, i_str) -> Optional[str]:
    """COMPLETE ranked order key of one tagged value — every kind, so the
    key alone is a total order (and an equality) matching the reference
    comparator.  ``i_str`` is ``__i`` pre-cast to string JVM-side (pandas
    would round >2^53 int64-with-nulls through float64); ``n`` arrives as
    float64 where NaN is unambiguous: a kind-7 row with no __d/__i payload
    always has a real __n."""
    if k is None or (isinstance(k, float) and math.isnan(k)):
        return None
    k = int(k)
    if k in (0, 1, 2, 3, 4):
        if k in (1, 2) and isinstance(s, str):
            # vertex/edge fast path: __s already holds the zero-padded id
            return _rank_char(k) + s
        if isinstance(j, str):
            return order_text_value(json.loads(j))
        return _rank_char(8)
    if k == 5:
        return _rank_char(5) + esc_payload(s if isinstance(s, str) else "")
    if k == 6:
        return _rank_char(6) + ("1" if b else "0")
    if k == 7:
        if isinstance(d, str):
            return _rank_char(7) + numeric_key(Decimal(d))
        if isinstance(i_str, str):
            return _rank_char(7) + numeric_key(Decimal(i_str))
        if n is not None:
            return _rank_char(7) + numeric_key(_float_decimal(float(n)))
    return _rank_char(8)


import pandas as pd  # noqa: E402  (module-level: pandas_udf type-hint resolution)


def make_array_order_text_udf():
    """Vectorized full-order-text UDF over an ARRAY of tagged values:
    array<tagged> -> array<string> of ranked keys (None per null element,
    preserving 3-valued IN).  Lets top-level IN membership use the exact
    comparator even though its per-element compare runs inside an
    array_contains (no per-element UDF possible there).  Arrow delivers
    nested struct fields as Python objects, so >2^53 __i stays exact."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<string>")
    def _exact_order_texts(v: pd.Series) -> pd.Series:
        out = []
        for arr in v:
            if arr is None:
                out.append(None)
                continue
            out.append(
                [
                    None
                    if el is None
                    else _tagged_dict_key(
                        el if isinstance(el, dict) else el.asDict()
                    )
                    for el in arr
                ]
            )
        return pd.Series(out, dtype="object")

    return _exact_order_texts


def make_order_text_udf():
    """Vectorized (Arrow) full-order-text UDF: (tagged struct, __i-as-
    string) -> ranked key string.  ONE struct argument keeps the source
    expression tree from being duplicated per payload slot — a 15-
    comparison projection over object literals made the optimizer
    superlinear when the key referenced the source column 12 times."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _exact_order_text(v: pd.DataFrame, i: pd.Series) -> pd.Series:
        out = [
            full_tag_text(kk, nn, dd, ss, bb, jj, ii)
            for kk, nn, dd, ss, bb, jj, ii in zip(
                v["__k"], v["__n"], v["__d"], v["__s"], v["__b"], v["__j"], i
            )
        ]
        return pd.Series(out, dtype="object")

    return _exact_order_text
