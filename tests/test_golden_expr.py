"""Golden expression conformance: RETURN <expr> through the engine, printed
with agtype_out, compared to the reference's regression outputs
(regress/expected/expr.out shapes — curated cases, one per semantic rule)."""

import pytest

from age_spark import AgeSession
from age_spark.runtime.agvalue import agtype_out

# (cypher RETURN payload, expected agtype_out string or None for SQL NULL)
CASES = [
    # arithmetic & types
    ("1 + 1", "2"),
    ("1 + 1.0", "2.0"),
    ("7 / 2", "3"),
    ("7.0 / 2", "3.5"),
    ("7 % 2", "1"),
    ("2 ^ 10", "1024.0"),
    ("-(5)", "-5"),
    ("1 + null", None),
    ("null * 2", None),
    # comparisons / logic
    ("1 < 2", "true"),
    ("true AND false", "false"),
    ("true XOR true", "false"),
    ("NOT false", "true"),
    ("null IS NULL", "true"),
    ("3 IN [1, 2, 3]", "true"),
    # strings (0-based offsets — agtype.c:9181)
    ("substring('hello', 1, 3)", '"ell"'),
    ("left('hello', 2)", '"he"'),
    ("right('hello', 2)", '"lo"'),
    ("toUpper('abc')", '"ABC"'),
    ("toLower('ABC')", '"abc"'),
    ("trim('  x  ')", '"x"'),
    ("reverse('abc')", '"cba"'),
    ("replace('aaa', 'a', 'b')", '"bbb"'),
    ("split('a,b,c', ',')", '["a", "b", "c"]'),
    ("'a' + 'b'", '"ab"'),
    ("size('hello')", "5"),
    ("'hello' STARTS WITH 'he'", "true"),
    ("'hello' CONTAINS 'ell'", "true"),
    ("'hello' =~ 'h.*'", "true"),
    # lists
    ("range(0, 3)", "[0, 1, 2, 3]"),
    ("range(0, 6, 2)", "[0, 2, 4, 6]"),
    ("[1, 2, 3][1]", "2"),
    ("[1, 2, 3][-1]", "3"),
    ("[1, 2, 3, 4][1..3]", "[2, 3]"),
    ("head([5, 6, 7])", "5"),
    ("last([5, 6, 7])", "7"),
    ("tail([5, 6, 7])", "[6, 7]"),
    ("size([1, 2, 3])", "3"),
    ("[1, 2] + [3]", "[1, 2, 3]"),
    ("reverse([1, 2, 3])", "[3, 2, 1]"),
    # conversions (golden: expr.out toInteger block)
    ("toInteger('1.2')", "1"),
    ("toInteger(1.2)", "1"),
    ("toInteger('not a number')", None),
    ("toFloat('2.5')", "2.5"),
    ("toFloat(1)", "1.0"),
    ("toString(3)", '"3"'),
    ("toBoolean('true')", "true"),
    ("toBoolean('nope')", None),
    # math
    ("abs(-3)", "3"),
    ("sign(-3)", "-1.0"),
    ("floor(1.9)", "1.0"),
    ("ceil(1.1)", "2.0"),
    ("round(1.45, 1)", "1.5"),
    ("sqrt(16)", "4.0"),
    # higher-order
    ("reduce(a = 0, x IN [1, 2, 3] | a + x)", "6"),
    ("[x IN [1, 2, 3, 4] WHERE x % 2 = 0 | x * 10]", "[20, 40]"),
    ("all(x IN [1, 2] WHERE x > 0)", "true"),
    ("none(x IN [1, 2] WHERE x > 5)", "true"),
    ("single(x IN [1, 2, 3] WHERE x = 2)", "true"),
    # case / coalesce
    ("CASE WHEN 1 = 1 THEN 'y' ELSE 'n' END", '"y"'),
    ("coalesce(null, null, 9)", "9"),
    # maps
    ("{a: 1, b: 'x'}.a", "1"),
    ("{a: {b: 2}}.a.b", "2"),
    ("{a: 1, b: 'x'}['b']", '"x"'),
    ("keys({a: 1, b: 2})", '["a", "b"]'),
    ("{z: 1, a: 2}", '{"a": 2, "z": 1}'),  # JSONB key order on print
    # predicates on values
    ("exists(null)", "false"),
    ("isEmpty([])", "true"),
    ("isEmpty('x')", "false"),
]


@pytest.fixture(scope="module")
def empty_graph(spark):
    age = AgeSession(spark)
    return age, age.create_graph("expr")


@pytest.mark.parametrize("expr,expected", CASES, ids=[c[0][:40] for c in CASES])
def test_golden_expr(empty_graph, expr, expected):
    age, g = empty_graph
    row = age.cypher(g, f"RETURN {expr} AS v").df.collect()[0]
    assert agtype_out(row.v) == expected
