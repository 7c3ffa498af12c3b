"""Golden expression conformance: RETURN <expr> through the engine, printed
with agtype_out, compared to the reference's regression outputs
(regress/sql/expr.sql — 955 pinned behaviors; this is the curated slice,
one case per semantic rule; sections cite the reference blocks they mirror).

Cases are evaluated in CHUNKS (one multi-column RETURN per chunk) so the
200+ cases cost ~15 Spark round-trips, not 200."""

import pytest

from age_spark import AgeSession
from age_spark.runtime.agvalue import agtype_out

# (cypher RETURN payload, expected agtype_out string or None for SQL NULL)
CASES = [
    # ---- arithmetic & numeric types (expr.out arithmetic blocks)
    ("1 + 1", "2"),
    ("1 + 1.0", "2.0"),
    ("1 - 2", "-1"),
    ("2 * 3.0", "6.0"),
    ("7 / 2", "3"),
    ("-7 / 2", "-3"),  # int division truncates toward zero
    ("7.0 / 2", "3.5"),
    ("7 % 2", "1"),
    ("-5 % 3", "-2"),  # PG modulo keeps dividend sign
    ("5.5 % 2", "1.5"),
    ("2 ^ 10", "1024.0"),
    ("2 ^ 0.5", "1.4142135623730951"),
    ("-(5)", "-5"),
    ("-(1.5)", "-1.5"),
    ("1 + 2 * 3", "7"),
    ("(1 + 2) * 3", "9"),
    ("(1 + 2) - (3)", "0"),
    # ---- null propagation through operators (expr.out:70 agtype_any_add)
    ("1 + null", None),
    ("null * 2", None),
    ("null + null", None),
    ("null - 1", None),
    ("null ^ 2", None),
    ("null % 3", None),
    # ---- comparisons / logic (three-valued; agtype_util.c ladder)
    ("1 < 2", "true"),
    ("1 = 1.0", "true"),
    ("1 <> 2", "true"),
    ("2 >= 2", "true"),
    ("2 > 2", "false"),
    ("'a' < 'b'", "true"),
    ("'abc' = 'abc'", "true"),
    ("null = null", None),
    ("null <> 1", None),
    ("NOT null", None),
    ("true OR null", "true"),
    ("false OR null", None),
    ("true AND null", None),
    ("false AND null", "false"),
    ("true AND false", "false"),
    ("true XOR true", "false"),
    ("true XOR false", "true"),
    ("NOT false", "true"),
    ("null IS NULL", "true"),
    ("1 IS NULL", "false"),
    ("null IS NOT NULL", "false"),
    ("[1, 2] = [1, 2]", "true"),
    ("[1, 2] = [2, 1]", "false"),
    # ---- IN operator (expr.out:366 "object of IN must be a list")
    ("3 IN [1, 2, 3]", "true"),
    ("4 IN [1, 2]", "false"),
    ("null IN [1, 2]", None),
    ("1 IN null", None),
    # ---- strings: 0-based offsets (agtype.c:9181 substring block)
    ("substring('hello', 1, 3)", '"ell"'),
    ("substring('hello', 0)", '"hello"'),
    ("substring('hello', 3)", '"lo"'),
    ("substring('hello', 0, 0)", '""'),
    ("substring('hello', 4, 10)", '"o"'),
    ("substring(null, 0)", None),
    ("left('hello', 2)", '"he"'),
    ("left('hello', 0)", '""'),
    ("left('hello', 99)", '"hello"'),
    ("left(null, 1)", None),  # expr.out:4589
    ("right('hello', 2)", '"lo"'),
    ("right('hello', 0)", '""'),
    ("right('hello', 99)", '"hello"'),
    ("right(null, 1)", None),
    ("toUpper('abc')", '"ABC"'),
    ("toLower('ABC')", '"abc"'),
    ("toUpper(null)", None),
    ("trim('  x  ')", '"x"'),
    ("lTrim('  x')", '"x"'),
    ("rTrim('x  ')", '"x"'),
    ("trim(null)", None),
    ("reverse('abc')", '"cba"'),
    ("reverse(null)", None),
    ("replace('aaa', 'a', 'b')", '"bbb"'),
    ("replace('hello', 'l', 'L')", '"heLLo"'),
    ("replace('aaa', 'aa', 'b')", '"ba"'),
    ("replace(null, 'a', 'b')", None),
    ("split('a,b,c', ',')", '["a", "b", "c"]'),
    ("split('one,two', ',')", '["one", "two"]'),
    ("split('abc', 'z')", '["abc"]'),
    ("split(null, ',')", None),
    ("'a' + 'b'", '"ab"'),
    # string + number concatenates (agtype_ops.c:179-190)
    ("'1' + 1", '"11"'),
    ("1 + 'a'", '"1a"'),
    ("'a' + 1.5", '"a1.5"'),
    ("size('hello')", "5"),
    ("size('')", "0"),
    ("size(null)", None),  # expr.out:3016
    ("'hello' STARTS WITH 'he'", "true"),
    ("'abc' STARTS WITH 'b'", "false"),
    ("null STARTS WITH 'a'", None),
    ("'abc' ENDS WITH 'bc'", "true"),
    ("'hello' CONTAINS 'ell'", "true"),
    ("'abc' CONTAINS null", None),
    ("'hello' =~ 'h.*'", "true"),
    ("'Hello' =~ 'hello'", "false"),
    ("'Hello' =~ '(?i)hello'", "true"),
    # ---- lists: access / out-of-bounds nulls (expr.out:373-416)
    ("range(0, 3)", "[0, 1, 2, 3]"),
    ("range(0, 6, 2)", "[0, 2, 4, 6]"),
    ("[1, 2, 3][1]", "2"),
    ("[1, 2, 3][-1]", "3"),
    ("[1, 2, 3][3]", None),
    ("[1, 2, 3][-4]", None),
    ("[][0]", None),
    ("[[1], [2]][0]", "[1]"),
    ("[[1, 2], [3]][0][1]", "2"),
    # ---- list slices: clamp semantics (expr.out:417-514)
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][0..]", "[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][..11]", "[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][0..0]", "[]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][10..10]", "[]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][0..1]", "[0]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][9..10]", "[9]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-1..]", "[10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-1..11]", "[10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-3..11]", "[8, 9, 10]"),
    ("[0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10][-1..10]", "[]"),
    ("[1, 2, 3, 4][1..3]", "[2, 3]"),
    ("[1, 2, 3][1..]", "[2, 3]"),
    ("[1, 2, 3][..2]", "[1, 2]"),
    ("[1, 2, 3][5..9]", "[]"),
    # ---- range(): step/empty/clamp (expr.out:7987-8047)
    ("range(0, 10, 3)", "[0, 3, 6, 9]"),
    ("range(0, -10, -3)", "[0, -3, -6, -9]"),
    ("range(0, -10, -1)", "[0, -1, -2, -3, -4, -5, -6, -7, -8, -9, -10]"),
    ("range(0, -10)", "[]"),
    ("range(0, 10, -1)", "[]"),
    ("range(-10, 10, -1)", "[]"),
    ("range(0, 10, 11)", "[0]"),
    ("range(-20, 10, 5)", "[-20, -15, -10, -5, 0, 5, 10]"),
    # ---- list fns (expr.out head/last/tail blocks)
    ("head([5, 6, 7])", "5"),
    ("head([])", None),
    ("head(null)", None),
    ("last([5, 6, 7])", "7"),
    ("last([])", None),
    ("tail([5, 6, 7])", "[6, 7]"),
    ("tail([1])", "[]"),
    ("tail([])", "[]"),
    ("tail([1, 2, 3, 4, 5])", "[2, 3, 4, 5]"),  # expr.out:8075
    ("size([1, 2, 3])", "3"),
    ("size([])", "0"),
    ("[1, 2] + [3]", "[1, 2, 3]"),
    ("[1, 2] + [3, 4]", "[1, 2, 3, 4]"),
    ("reverse([1, 2, 3])", "[3, 2, 1]"),
    ("reverse([])", "[]"),
    # ---- conversions (expr.out toInteger/toFloat blocks, 3440-3540)
    ("toInteger('1.2')", "1"),
    ("toInteger(1.2)", "1"),
    ("toInteger('not a number')", None),
    ("toInteger('42')", "42"),
    ("toInteger('')", None),
    ("toInteger(null)", None),
    ("toFloat('2.5')", "2.5"),
    ("toFloat(1)", "1.0"),
    ("toFloat('1')", "1.0"),
    ("toFloat('1.2')", "1.2"),
    ("toFloat('false_')", None),
    ("toFloat('')", None),
    ("toFloat(null)", None),
    ("toString(3)", '"3"'),
    ("toString(3.5)", '"3.5"'),
    ("toString(true)", '"true"'),
    ("toString(null)", None),
    ("toBoolean('true')", "true"),
    ("toBoolean('TRUE')", "true"),
    ("toBoolean('False')", "false"),
    ("toBoolean('nope')", None),
    ("toBoolean(null)", None),
    # ---- math (expr.out math fn blocks)
    ("abs(-3)", "3"),
    ("abs(-3.5)", "3.5"),
    ("abs(null)", None),
    ("sign(-3)", "-1.0"),
    ("sign(0)", "0.0"),
    ("sign(2)", "1.0"),
    ("floor(1.9)", "1.0"),
    ("floor(-1.1)", "-2.0"),
    ("ceil(1.1)", "2.0"),
    ("ceil(-1.1)", "-1.0"),
    ("round(1.45, 1)", "1.5"),
    ("round(2.5)", "3.0"),
    ("sqrt(16)", "4.0"),
    ("sqrt(2)", "1.4142135623730951"),
    ("sqrt(null)", None),
    ("exp(0)", "1.0"),
    ("log(1)", "0.0"),
    ("log10(1000)", "3.0"),
    ("sin(0)", "0.0"),
    ("cos(0)", "1.0"),
    ("tan(0)", "0.0"),
    ("asin(0)", "0.0"),
    ("acos(1)", "0.0"),
    ("atan(0)", "0.0"),
    ("atan2(0, 1)", "0.0"),
    ("degrees(0)", "0.0"),
    ("radians(0)", "0.0"),
    ("pi()", "3.141592653589793"),
    ("e()", "2.718281828459045"),
    # ---- higher-order (expr.out reduce/list-comp blocks)
    ("reduce(a = 0, x IN [1, 2, 3] | a + x)", "6"),
    ("reduce(s = '', x IN ['a', 'b'] | s + x)", '"ab"'),
    ("reduce(a = 1, x IN [] | a + x)", "1"),
    ("[x IN [1, 2, 3, 4] WHERE x % 2 = 0 | x * 10]", "[20, 40]"),
    ("[x IN [1, 2, 3]]", "[1, 2, 3]"),
    ("[x IN range(0, 10) WHERE x % 2 = 0 | x ^ 2]", "[0.0, 4.0, 16.0, 36.0, 64.0, 100.0]"),
    ("all(x IN [1, 2] WHERE x > 0)", "true"),
    ("all(x IN [] WHERE x > 0)", "true"),
    ("any(x IN [] WHERE x > 0)", "false"),
    ("none(x IN [1, 2] WHERE x > 5)", "true"),
    ("none(x IN [] WHERE x > 0)", "true"),
    ("single(x IN [1, 2, 3] WHERE x = 2)", "true"),
    ("single(x IN [] WHERE x > 0)", "false"),
    # ---- case / coalesce
    ("CASE WHEN 1 = 1 THEN 'y' ELSE 'n' END", '"y"'),
    ("CASE WHEN false THEN 1 END", None),
    ("CASE 2 WHEN 1 THEN 'a' WHEN 2 THEN 'b' END", '"b"'),
    ("CASE 9 WHEN 1 THEN 'a' END", None),
    ("coalesce(null, null, 9)", "9"),
    ("coalesce(null)", None),
    ("coalesce(null, 'x')", '"x"'),
    # ---- maps
    ("{a: 1, b: 'x'}.a", "1"),
    ("{a: {b: 2}}.a.b", "2"),
    ("{a: 1, b: 'x'}['b']", '"x"'),
    ("{a: [1, 2]}.a[1]", "2"),
    ("keys({a: 1, b: 2})", '["a", "b"]'),
    ("{z: 1, a: 2}", '{"a": 2, "z": 1}'),  # JSONB key order on print
    # ---- predicates on values
    ("exists(null)", "false"),
    ("exists(3)", "true"),
    ("isEmpty([])", "true"),
    ("isEmpty([1])", "false"),
    ("isEmpty('')", "true"),
    ("isEmpty('x')", "false"),
    # ---- jsonb bridge
    ("toJson([1, 2, 3])", '"[1,2,3]"'),
    ("toJson({a: 1})", '"{\\"a\\":1}"'),
    ("fromJson('[1,2,3]', 'array<bigint>')", "[1, 2, 3]"),
    # ---- float print / literals (PG float8out conventions)
    ("0.1 + 0.2", "0.30000000000000004"),
    ("1e3", "1000.0"),
    ("1.5e-2", "0.015"),
    ("9007199254740993", "9007199254740993"),  # > 2^53: stays exact int64
    ("-(2 ^ 2)", "-4.0"),
    ("2 ^ -1", "0.5"),
    ("10 % 0.0", "NaN"),  # float modulo-by-zero (PG float8)
    ("round(-1.5)", "-2.0"),  # half away from zero
    ("abs(-0.0)", "0.0"),
    # ---- string escapes / unicode (jsonb_out conventions)
    ("'a\\\"b'", '"a\\"b"'),
    ("'héllo'", '"héllo"'),
    # ---- list conversions (expr.out toFloatList block, 3510-3540)
    ("toIntegerList(['1', '2.9'])", "[1, 2]"),
    ("toFloatList([1.2, '4.654'])", "[1.2, 4.654]"),
    ("toFloatList(['1.9432', 8.6222])", "[1.9432, 8.6222]"),
    ("toBooleanList(['true', 'no'])", "[true, null]"),
    ("toStringList([1, 2.5, true])", '["1", "2.5", "true"]'),
    # ---- list comparisons (element-wise ladder)
    ("[] = []", "true"),
    ("[1] < [2]", "true"),
    ("[1, 2] < [2]", "true"),
    ("{a: 1} = {a: 1}", "true"),
    # ---- heterogeneous literal lists (dynamic agtype, agtype.h:307)
    ("[1, 'a', true]", '[1, "a", true]'),
    ("[1, 'a', null]", '[1, "a", null]'),
    ("[1, 'a', true][1]", '"a"'),
    ("size([1, 'a', true])", "3"),
    ("'a' IN [1, 'a']", "true"),
    ("2 IN [1, 'a']", "false"),
    ("toStringList([1, 'a', true])", '["1", "a", "true"]'),
    # ---- boolean conversions of numbers (expr.out:3335)
    ("toBoolean(1)", "true"),
    ("toBoolean(0)", "false"),
]


@pytest.fixture(scope="module")
def empty_graph(spark):
    age = AgeSession(spark)
    return age, age.create_graph("expr")


CHUNK = 15
_CHUNKS = [CASES[i : i + CHUNK] for i in range(0, len(CASES), CHUNK)]


@pytest.mark.parametrize(
    "chunk", _CHUNKS, ids=[f"{i * CHUNK}-{c[0][0][:25]}" for i, c in enumerate(_CHUNKS)]
)
def test_golden_expr(empty_graph, chunk):
    age, g = empty_graph
    payload = ", ".join(f"{expr} AS c{i}" for i, (expr, _) in enumerate(chunk))
    row = age.cypher(g, f"RETURN {payload}").df.collect()[0]
    bad = []
    for i, (expr, expected) in enumerate(chunk):
        got = agtype_out(row[f"c{i}"])
        if got != expected:
            bad.append(f"{expr!r}: got {got!r}, want {expected!r}")
    assert not bad, "\n".join(bad)


def test_case_count():
    assert len(CASES) >= 200, len(CASES)


def test_numeric_cast_golden(empty_graph):
    """'::numeric' cast golden cases (expr.out:1758-1771)."""
    age, g = empty_graph
    for expr, want in [
        ("0::numeric", "0::numeric"),
        ("2.71::numeric", "2.71::numeric"),
        ("toNumeric('12.3')", "12.3::numeric"),
    ]:
        row = age.cypher(g, f"RETURN {expr} AS v").df.collect()[0]
        assert agtype_out(row.v) == want, expr
