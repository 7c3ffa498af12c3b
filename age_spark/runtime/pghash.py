"""Python port of ``agtype_hash_cmp`` (reference: agtype.c:5259,
agtype_util.c:2001) and the PostgreSQL hash primitives it builds on
(PostgreSQL ``hashfn.c`` — Bob Jenkins' public lookup3 in PG's
little-endian formulation — and ``numeric.c:hash_numeric_extended``).

This is the hash/btree opclass surface the engine's Spark runtime
replaces with its own shuffle hashing; the port exists for conformance
(regress/sql/agtype_hash_cmp.sql pins 26 exact values) and for any user
relying on agtype_hash_cmp() as a stable value fingerprint.

Values operate on a small Python model mirroring agtype_value kinds:
  None                      -> AGTV_NULL
  bool / int / float / str  -> the matching scalar
  ("numeric", Decimal)      -> AGTV_NUMERIC
  ("vertex", id, obj)       -> AGTV_VERTEX      (hashes by graphid)
  ("edge", id, obj)         -> AGTV_EDGE        (hashes by graphid)
  ("path", [elems])         -> AGTV_PATH        (chains element hashes)
  list / dict               -> containers (iterated like the reference)
"""

from __future__ import annotations

import struct
from decimal import Decimal
from typing import Any

M32 = 0xFFFFFFFF
M64 = 0xFFFFFFFFFFFFFFFF


def _rot32(x: int, k: int) -> int:
    return ((x << k) | (x >> (32 - k))) & M32


def _rotl64(n: int, i: int) -> int:
    return ((n << i) | (n >> (64 - i))) & M64


def _rotr64(n: int, i: int) -> int:
    return ((n >> i) | (n << (64 - i))) & M64


def _mix(a: int, b: int, c: int):
    # lookup3 mix() (PG hashfn.c)
    a = (a - c) & M32; a ^= _rot32(c, 4); c = (c + b) & M32
    b = (b - a) & M32; b ^= _rot32(a, 6); a = (a + c) & M32
    c = (c - b) & M32; c ^= _rot32(b, 8); b = (b + a) & M32
    a = (a - c) & M32; a ^= _rot32(c, 16); c = (c + b) & M32
    b = (b - a) & M32; b ^= _rot32(a, 19); a = (a + c) & M32
    c = (c - b) & M32; c ^= _rot32(b, 4); b = (b + a) & M32
    return a, b, c


def _final(a: int, b: int, c: int):
    # lookup3 final() (PG hashfn.c)
    c ^= b; c = (c - _rot32(b, 14)) & M32
    a ^= c; a = (a - _rot32(c, 11)) & M32
    b ^= a; b = (b - _rot32(a, 25)) & M32
    c ^= b; c = (c - _rot32(b, 16)) & M32
    a ^= c; a = (a - _rot32(c, 4)) & M32
    b ^= a; b = (b - _rot32(a, 14)) & M32
    c ^= b; c = (c - _rot32(b, 24)) & M32
    return a, b, c


def hash_bytes_extended(k: bytes, seed: int) -> int:
    """PG hash_bytes_extended (hashfn.c) — little-endian word path."""
    length = len(k)
    a = b = c = (0x9E3779B9 + length + 3923095) & M32
    if seed:
        a = (a + ((seed >> 32) & M32)) & M32
        b = (b + (seed & M32)) & M32
        a, b, c = _mix(a, b, c)
    pos = 0
    rem = length
    while rem >= 12:
        w0, w1, w2 = struct.unpack_from("<III", k, pos)
        a = (a + w0) & M32
        b = (b + w1) & M32
        c = (c + w2) & M32
        a, b, c = _mix(a, b, c)
        pos += 12
        rem -= 12
    t = k[pos:]
    # little-endian tail (the lowest byte of c is reserved for the length)
    if rem >= 11:
        c = (c + (t[10] << 24)) & M32
    if rem >= 10:
        c = (c + (t[9] << 16)) & M32
    if rem >= 9:
        c = (c + (t[8] << 8)) & M32
    if rem >= 8:
        b = (b + (t[7] << 24)) & M32
    if rem >= 7:
        b = (b + (t[6] << 16)) & M32
    if rem >= 6:
        b = (b + (t[5] << 8)) & M32
    if rem >= 5:
        b = (b + t[4]) & M32
    if rem >= 4:
        a = (a + (t[3] << 24)) & M32
    if rem >= 3:
        a = (a + (t[2] << 16)) & M32
    if rem >= 2:
        a = (a + (t[1] << 8)) & M32
    if rem >= 1:
        a = (a + t[0]) & M32
    a, b, c = _final(a, b, c)
    return ((b << 32) | c) & M64


def hash_uint32_extended(k: int, seed: int) -> int:
    """PG hash_uint32_extended (hashfn.c): seed mixes BEFORE the key is
    added (unlike plain hash_uint32, which has no seed step)."""
    a = b = c = (0x9E3779B9 + 4 + 3923095) & M32
    if seed:
        a = (a + ((seed >> 32) & M32)) & M32
        b = (b + (seed & M32)) & M32
        a, b, c = _mix(a, b, c)
    a = (a + (k & M32)) & M32
    a, b, c = _final(a, b, c)
    return ((b << 32) | c) & M64


def hashint8_extended(val: int, seed: int) -> int:
    """PG hashint8extended: fold halves then hash_uint32_extended."""
    val &= M64
    lohalf = val & M32
    hihalf = (val >> 32) & M32
    signed = val - (1 << 64) if val >> 63 else val
    lohalf ^= hihalf if signed >= 0 else (~hihalf & M32)
    return hash_uint32_extended(lohalf, seed)


def hashfloat8_extended(val: float, seed: int) -> int:
    """PG hashfloat8extended: +-0 hash alike (returns the seed), else the
    IEEE-754 bytes through hash_bytes_extended."""
    if val == 0.0:
        return seed & M64
    return hash_bytes_extended(struct.pack("<d", val), seed)


def hashchar_extended(val: int, seed: int) -> int:
    """PG hashcharextended."""
    return hash_uint32_extended(val & 0xFF, seed)


def hash_numeric_extended(value: Decimal, seed: int) -> int:
    """PG hash_numeric_extended (numeric.c): hash the base-10000 digit
    array with leading/trailing zero digits stripped, xor the adjusted
    weight.  NaN hashes to the seed and zero to seed-1 (the early
    returns).  NOTE: the conformance suite feeds no NUMERIC values, so
    this path is a faithful-but-unpinned port — exercised only by
    user-level agtype_hash_cmp calls on ::numeric values."""
    if value.is_nan():
        return seed & M64
    if value == 0:
        # PG_RETURN_UINT64(seed - 1) per hash_numeric_extended's zero path
        return (seed - 1) & M64
    sign, digits, exp = value.as_tuple()
    # decimal digits -> base-10000 digits aligned so that the decimal
    # point falls on a base-10000 boundary (PG's storage invariant)
    ds = "".join(map(str, digits))
    # current power of 10 of the LAST digit is exp; pad on the right so
    # (len + right_pad + exp) % 4 == 0 with pad < 4, and on the left to a
    # multiple of 4
    rpad = exp % 4 if exp % 4 else 0
    if rpad:
        ds = ds + "0" * rpad
        exp -= rpad
    lpad = (-len(ds)) % 4
    ds = "0" * lpad + ds
    d4 = [int(ds[i : i + 4]) for i in range(0, len(ds), 4)]
    weight = (len(ds) + exp) // 4 - 1  # base-10000 weight of d4[0]
    # strip leading zero digits, adjusting weight like the reference
    start = 0
    while start < len(d4) and d4[start] == 0:
        start += 1
        weight -= 1
    end = len(d4)
    while end > start and d4[end - 1] == 0:
        end -= 1
    trimmed = d4[start:end]
    raw = b"".join(struct.pack("<h", d) for d in trimmed)
    digit_hash = hash_bytes_extended(raw, seed)
    return (digit_hash ^ (weight & M64)) & M64


def _double_bits_of_int(i: int) -> int:
    """The reference's vertex/edge hash passes the graphid through
    Float8GetDatum before hashint8extended (agtype_util.c:2050) — the
    int64 actually hashed is the IEEE bit pattern of (double)id.  A
    faithful port keeps the quirk."""
    return struct.unpack("<q", struct.pack("<d", float(i)))[0]


def _hash_scalar_extended(v: Any, hash_: int, seed: int) -> int:
    """agtype_hash_scalar_value_extended (agtype_util.c:2001)."""
    if v is None:
        tmp = (seed + 0x01) & M64
    elif isinstance(v, bool):
        if seed:
            tmp = hashchar_extended(1 if v else 0, seed)
        else:
            tmp = 0x02 if v else 0x04
    elif isinstance(v, int):
        tmp = hashint8_extended(v, seed)
    elif isinstance(v, float):
        tmp = hashfloat8_extended(v, seed)
    elif isinstance(v, str):
        tmp = hash_bytes_extended(v.encode("utf-8"), seed)
    elif isinstance(v, tuple) and v[0] == "numeric":
        tmp = hash_numeric_extended(v[1], seed)
    elif isinstance(v, tuple) and v[0] in ("vertex", "edge"):
        tmp = hashint8_extended(_double_bits_of_int(v[1]), seed)
    elif isinstance(v, tuple) and v[0] == "path":
        tmp = 0
        for elem in v[1]:
            tmp = _hash_scalar_extended(elem, tmp, seed)
    else:
        raise ValueError(f"not a scalar: {v!r}")
    hash_ = (((hash_ << 1) & 0xFFFFFFFEFFFFFFFE)
             | ((hash_ >> 31) & 0x0000000100000001))  # ROTATE_HIGH_AND_LOW_32BITS
    return (hash_ ^ tmp) & M64


def _is_scalar(v: Any) -> bool:
    if isinstance(v, (list, dict)):
        return False
    if isinstance(v, tuple):
        return v[0] in ("numeric", "vertex", "edge", "path")
    return True


def agtype_hash_cmp(value: Any, _present: bool = True) -> int:
    """agtype_hash_cmp (agtype.c:5259): iterate the value like the
    reference's agtype iterator — scalars hash with the rolling seed,
    container boundaries rotate the seed, every token rotates it left
    one bit — and truncate to a signed int32.  A SQL NULL argument (call
    with ``_present=False``) returns 0."""
    if not _present:
        return 0
    state = {"hash": 0, "seed": 0xF0F0F0F0}

    def tick():
        state["seed"] = _rotl64(state["seed"], 1)

    def walk(v: Any, raw_wrap: bool):
        if _is_scalar(v):
            if raw_wrap:
                # top-level scalar rides a raw-scalar pseudo-array:
                # BEGIN_ARRAY(raw, no seed rotate) / ELEM / END_ARRAY(raw)
                tick()
                state["hash"] = _hash_scalar_extended(v, state["hash"], state["seed"])
                tick()
                tick()
            else:
                state["hash"] = _hash_scalar_extended(v, state["hash"], state["seed"])
                tick()
            return
        if isinstance(v, list):
            state["seed"] = _rotl64(state["seed"], 4)  # WAGT_BEGIN_ARRAY
            tick()
            for elem in v:
                walk(elem, False)
            state["seed"] = _rotr64(state["seed"], 4)  # WAGT_END_ARRAY
            tick()
            return
        # object: keys iterate in the container's (jsonb) key order
        state["seed"] = _rotl64(state["seed"], 6)  # WAGT_BEGIN_OBJECT
        tick()
        for k in sorted(v.keys(), key=lambda s: (len(s), s)):
            state["hash"] = _hash_scalar_extended(k, state["hash"], state["seed"])
            tick()
            walk(v[k], False)
        state["seed"] = _rotr64(state["seed"], 4)  # WAGT_END_OBJECT
        tick()

    walk(value, True)
    h32 = state["hash"] & M32
    return h32 - (1 << 32) if h32 >> 31 else h32
