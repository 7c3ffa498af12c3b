"""Exact container/numeric ordering — the full, unbounded port of the
reference's B-Tree comparator (compare_agtype_containers_orderability,
agtype_util.c:333; compare_agtype_scalar_values, agtype_util.c:960) via
the normalized order text in runtime/ordertext.py.

These cases sit PAST the bounded JVM-side key (16 elements / depth 3):
wide arrays, depth-4 nesting, int-vs-float ties inside containers,
>38-digit numerics — each previously a documented lexical-fallback
deviation, now ordered by value."""

from decimal import Decimal

import pytest

from age_spark import AgeSession
from age_spark.runtime.agvalue import format_result
from age_spark.runtime.ordertext import numeric_key, order_text_value, tag_order_text


# ----------------------------------------------------- pure encoder


def test_numeric_key_total_order():
    vals = [
        Decimal("-Infinity"), Decimal("-1E+40"), Decimal("-100"),
        Decimal("-12.05"), Decimal("-12"), Decimal("-0.5"), Decimal(0),
        Decimal("0.5"), Decimal("9"), Decimal("9.5"), Decimal("10"),
        Decimal("12"), Decimal("12.05"),
        Decimal("99999999999999999999999999999999999999"), Decimal("1E+40"),
        Decimal("Infinity"), Decimal("NaN"),
    ]
    keys = [numeric_key(v) for v in vals]
    assert keys == sorted(keys)


def test_numeric_key_value_identity():
    assert numeric_key(Decimal("2")) == numeric_key(Decimal("2.0"))
    assert numeric_key(Decimal("-0.0")) == numeric_key(Decimal("0"))
    # 21-digit neighbors (beyond double precision) stay distinct
    assert numeric_key(Decimal("123456789012345678900")) < numeric_key(
        Decimal("123456789012345678901")
    )


def test_order_text_containers():
    o = order_text_value
    # element-wise with the premature-END (prefix-first) rule
    assert o([1, 2]) < o([1, 2, 0]) < o([1, 3]) < o([2])
    # numbers inside containers compare by VALUE across kinds
    assert o([2]) == o([2.0])
    assert o({"a": 1}) == o({"a": 1.0})
    # objects: pair-wise in jsonb (length, byte) key order, keys lexical
    assert o({"a": 1}) < o({"a": 1, "b": 0})
    assert o({"a": 1}) < o({"b": 0})
    assert o({"aa": 1}) < o({"b": 0})  # 'aa' < 'b' byte-lexically
    # cross-kind ladder: object < array < string < bool < numeric < null
    assert o({"a": 1}) < o([1]) < o("a") < o(True) < o(1) < o(None)
    # depth-4 nesting by value (lexical would say "10" < "9")
    assert o([[[[9]]]]) < o([[[[10]]]])
    # width 17 (past the JVM ORDER_KEY_WIDTH bound)
    assert o(list(range(16)) + [1]) < o(list(range(16)) + [2])


def test_order_text_entities_and_paths():
    o = order_text_value
    v1 = {"id": 1, "label": "A", "properties": {}}
    v2 = {"id": 2, "label": "A", "properties": {}}
    e1 = {"id": 3, "label": "R", "properties": {}, "start_id": 1, "end_id": 2}
    assert o(v1) < o(v2)
    assert o(e1) < o(v1)  # edge rank 1 < vertex rank 2
    # AGTV_PATH: element count first (agtype_util.c:1025)
    p1 = {"nodes": [v1], "edges": []}
    p2 = {"nodes": [v1, v2], "edges": [e1]}
    assert o(p1) < o(p2)


def test_order_text_sentinels_and_tagged():
    o = order_text_value
    assert o("\x01N:2") == o(2.0) == o(2)  # numeric sentinel == value
    assert o(["\x01F:2.5"]) == o([2.5])  # float sentinel
    assert o({"__k": 7, "__i": 5, "__n": 5.0}) == o(5)  # nested tagged
    assert tag_order_text(4, "[1,2]", None, None, None) == o([1, 2])
    assert tag_order_text(5, None, None, None, None) is None  # native slot
    big = tag_order_text(7, None, None, "123456789012345678901", None)
    assert big > tag_order_text(7, None, None, "123456789012345678900.5", None)


# ----------------------------------------------------- engine-level


def rows1(age, g, text):
    r = age.cypher(g, text)
    return [row[0] for row in format_result(r.df.collect(), r.df.columns)]


@pytest.fixture(scope="module")
def xo(spark):
    age = AgeSession(spark)
    g = age.create_graph("exact_order")
    return age, g


def test_order_by_wide_array(xo):
    age, g = xo
    big1 = list(range(16)) + [1]
    big2 = list(range(16)) + [2]
    res = rows1(age, g, f"UNWIND [{big2}, 's', {big1}] AS x RETURN x ORDER BY x")
    exp1 = "[" + ", ".join(map(str, big1)) + "]"
    exp2 = "[" + ", ".join(map(str, big2)) + "]"
    assert res == [exp1, exp2, '"s"']


def test_order_by_deep_nesting(xo):
    age, g = xo
    res = rows1(age, g, "UNWIND [[[[10]]], 0, [[[9]]]] AS x RETURN x ORDER BY x")
    assert res == ["[[[9]]]", "[[[10]]]", "0"]


def test_container_value_equality(xo):
    age, g = xo
    assert rows1(age, g, "RETURN [2] = [2.0]") == ["true"]
    assert rows1(age, g, "RETURN [2] < [2.0]") == ["false"]
    assert rows1(age, g, "RETURN [2] >= [2.0]") == ["true"]
    assert rows1(age, g, "RETURN {a: 1} = {a: 1.0}") == ["true"]
    # dynamically-BUILT containers (list concat / nested maps) too
    assert rows1(age, g, "RETURN [1] + [2] = [1, 2.0]") == ["true"]
    assert rows1(
        age, g, "RETURN {a: [1, {b: 2}]} = {a: [1.0, {b: 2.0}]}"
    ) == ["true"]


def test_order_by_big_numerics(xo):
    age, g = xo
    res = rows1(
        age, g,
        "UNWIND ['99999999999999999999999999999999999999995'::numeric, "
        "'99999999999999999999999999999999999999990'::numeric, 'x'] AS x "
        "RETURN x ORDER BY x",
    )
    assert res == [
        '"x"',
        "99999999999999999999999999999999999999990::numeric",
        "99999999999999999999999999999999999999995::numeric",
    ]


def test_ordered_collect_on_containers(xo):
    age, g = xo
    res = rows1(
        age, g,
        "UNWIND [[1,[2,10]], 'z', [1,[2,9]]] AS x WITH x ORDER BY x "
        "RETURN collect(x)",
    )
    assert res == ['[[1, [2, 9]], [1, [2, 10]], "z"]']


def test_order_by_desc_containers(xo):
    age, g = xo
    res = rows1(age, g, "UNWIND [[1],[2],[1,5]] AS x RETURN x ORDER BY x DESC")
    assert res == ["[2]", "[1, 5]", "[1]"]


def test_in_membership_exact(xo):
    age, g = xo
    # container elements match by VALUE at any depth (reference IN uses
    # the full comparator per element)
    assert rows1(age, g, "RETURN [2] IN [[2.0], 'x']") == ["true"]
    assert rows1(
        age, g, "RETURN {a:[1,{b:2}]} IN [[1], {a:[1.0,{b:2.0}]}]"
    ) == ["true"]
    # 3-valued semantics preserved (expr.out IN blocks)
    assert rows1(age, g, "RETURN 2 IN [1, null]") == [None]
    assert rows1(age, g, "RETURN 2 IN [2, null]") == ["true"]
    assert rows1(age, g, "RETURN 1 IN [[1]]") == ["false"]
    # inside a lambda body the bounded key applies: scalar membership by
    # numeric value still holds there
    assert rows1(age, g, "RETURN [x IN [1,2,3] WHERE x IN [2.0]]") == ["[2]"]


def test_static_path_and_container_order(xo):
    """Static (non-tagged) sort columns with divergent native orderings
    route through the exact key too: paths count elements FIRST
    (AGTV_PATH, agtype_util.c:1025), array NULL elements sort last
    (null kind rank 8), objects compare in jsonb key order."""
    age, g0 = xo
    g = age.create_graph("exact_order_static")
    g = age.cypher(g, "CREATE (a:N {k:1})-[:E]->(b:N {k:2})-[:E]->(c:N {k:3})").graph
    got = [
        tuple(r)
        for r in format_result(
            age.cypher(
                g,
                "MATCH p = (x:N)-[:E*1..2]->(y) WITH p ORDER BY p "
                "RETURN length(p) AS l, nodes(p)[0].k AS k",
            ).df.collect()
        )
    ]
    assert got == [("1", "1"), ("1", "2"), ("2", "1")]
    assert rows1(age, g, "UNWIND [[1, null], [1, 2]] AS x RETURN x ORDER BY x") == [
        "[1, 2]", "[1, null]",
    ]
    assert rows1(
        age, g, "UNWIND [{b: 0, a: 2}, {b: 9, a: 1}] AS x RETURN x ORDER BY x"
    ) == ['{"a": 1, "b": 9}', '{"a": 2, "b": 0}']


def test_lambda_comparisons_numeric_exact(xo):
    """Inside HOF lambdas the bounded JVM key now carries the EXACT
    numeric text (graph.py jvm_numeric_sort_text): high-precision
    NUMERICs compare by numeric_cmp value even where the Arrow
    comparator cannot run."""
    age, g = xo
    # >float8 precision must NOT collapse inside the lambda
    assert rows1(
        age, g,
        "RETURN [x IN ['2.0000000000000000001'::numeric, 2.0] "
        "WHERE x = 2] = [2.0]",
    ) == ["true"]
    assert rows1(
        age, g,
        "RETURN any(x IN [1, '2.0000000000000000001'::numeric] "
        "WHERE x > 2)",
    ) == ["true"]
    # value-equal spellings key identically in lambda membership
    assert rows1(
        age, g, "RETURN [x IN [1, 2, 3] WHERE x IN ['2.00'::numeric]]"
    ) == ["[2]"]


def test_lambda_deep_container_membership(xo):
    """Containers inside lambda predicates order and match by value
    element-wise (agtype_util.c:333) through the bounded key up to its
    documented depth/width (the exact Arrow comparator cannot run inside
    a HOF lambda)."""
    age, g = xo
    # ORDERING of a dynamic container inside a lambda is value-exact
    # element-wise at depth (the __o key: int/float compare by VALUE via
    # the exact numeric text); cross-kind container EQUALITY keeps the
    # __j tiebreak bound (documented — the Arrow comparator cannot run
    # inside a HOF lambda)
    deep = "[[1, 2], [3, 4]]"
    assert rows1(
        age, g, f"RETURN [x IN [{deep}, 'z'] WHERE x < [[1.0, 2.6]]] = [{deep}]"
    ) == ["true"]
    assert rows1(
        age, g, f"RETURN [x IN [{deep}, 'z'] WHERE x < [[1.0, 1.9]]] = []"
    ) == ["true"]
    # same-kind lists with different element types compare by value
    wide = "[" + ", ".join(str(i) for i in range(16)) + "]"
    wide_f = "[" + ", ".join(f"{i}.0" for i in range(16)) + "]"
    assert rows1(
        age, g, f"RETURN any(x IN [{wide}] WHERE x = {wide_f})"
    ) == ["true"]
    # strings containing framing control bytes stay distinct in lambdas
    sep = chr(3)
    assert rows1(
        age, g,
        'RETURN any(x IN [["a' + sep + 'Fb"]] WHERE x = ["a", "b"])',
    ) == ["false"]

