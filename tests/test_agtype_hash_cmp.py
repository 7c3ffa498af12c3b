"""agtype_hash_cmp conformance (regress/sql/agtype_hash_cmp.sql): the
little-endian expected file pins 26 exact int32 hashes.  The engine's
Spark runtime replaces PG's hash opclasses with shuffle hashing, so this
surface lives as a faithful Python port (runtime/pghash.py) — every
statement of the suite must reproduce the reference value exactly.

No Spark session needed: the port is driver-side."""

import re

from age_spark.runtime.pghash import agtype_hash_cmp

OUT = "/root/reference/regress/expected/agtype_hash_cmp.out"


def _parse_literal(s: str):
    """Tiny agtype literal reader for the suite's inputs: JSON-ish values
    plus ::vertex/::edge/::path annotations."""
    s = s.strip()
    pos = 0

    def skip_ws():
        nonlocal pos
        while pos < len(s) and s[pos] in " \t\n\r":
            pos += 1

    def parse():
        nonlocal pos
        skip_ws()
        ch = s[pos]
        if ch == "[":
            pos += 1
            out = []
            skip_ws()
            if s[pos] == "]":
                pos += 1
            else:
                while True:
                    out.append(parse())
                    skip_ws()
                    if s[pos] == ",":
                        pos += 1
                        continue
                    assert s[pos] == "]", s[pos:]
                    pos += 1
                    break
            return annotate(out)
        if ch == "{":
            pos += 1
            obj = {}
            skip_ws()
            if s[pos] == "}":
                pos += 1
            else:
                while True:
                    skip_ws()
                    k = parse()
                    skip_ws()
                    assert s[pos] == ":"
                    pos += 1
                    obj[k] = parse()
                    skip_ws()
                    if s[pos] == ",":
                        pos += 1
                        continue
                    assert s[pos] == "}"
                    pos += 1
                    break
            return annotate(obj)
        if ch == '"':
            m = re.match(r'"((?:[^"\\]|\\.)*)"', s[pos:])
            pos += m.end()
            return m.group(1)
        m = re.match(r"-?\d+\.\d+(?:[eE][-+]?\d+)?|-?\d+[eE][-+]?\d+", s[pos:])
        if m:
            pos += m.end()
            return float(m.group(0))
        m = re.match(r"-?\d+", s[pos:])
        if m:
            pos += m.end()
            return int(m.group(0))
        for lit, v in (("null", None), ("true", True), ("false", False)):
            if s.startswith(lit, pos):
                pos += len(lit)
                return v
        raise AssertionError(f"unparsed literal at {s[pos:pos+30]!r}")

    def annotate(v):
        nonlocal pos
        skip_ws()
        if s.startswith("::vertex", pos):
            pos += len("::vertex")
            return ("vertex", v["id"], v)
        if s.startswith("::edge", pos):
            pos += len("::edge")
            return ("edge", v["id"], v)
        if s.startswith("::path", pos):
            pos += len("::path")
            return ("path", v)
        return v

    v = parse()
    return v


def _cases():
    text = open(OUT).read()
    out = []
    # each block: SELECT agtype_hash_cmp(<arg>); ... <value> (1 row)
    for m in re.finditer(
        r"SELECT agtype_hash_cmp\((.*?)\);\s*\n\s*agtype_hash_cmp\s*\n-+\s*\n\s*(-?\d+)",
        text,
        re.S,
    ):
        arg, want = m.group(1).strip(), int(m.group(2))
        out.append((arg, want))
    return out


def test_suite_values():
    cases = _cases()
    assert len(cases) == 26, len(cases)
    fails = []
    for arg, want in cases:
        if arg.upper() == "NULL":
            got = agtype_hash_cmp(None, _present=False)
        else:
            m = re.match(r"^(?:agtype_in\()?'(.*)'(?:::agtype)?\)?$", arg, re.S)
            assert m, arg
            got = agtype_hash_cmp(_parse_literal(m.group(1)))
        if got != want:
            fails.append(f"{arg[:60]!r}: got {got}, want {want}")
    assert not fails, "\n".join(fails)
