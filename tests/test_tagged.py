"""Heterogeneous (mixed-kind) property values — the reference's dynamic
agtype typing (agtype.h:307-323). One key holding 1, "1", true across rows
merges into a tagged struct whose native Spark ordering reproduces the
cross-type ladder (agtype_util.c:271-310): String < Bool < Numeric < NULL
(under the engine's NULLS-LARGEST ORDER BY). Conversion fixture shapes
mirror regress/age_load/data/conversion_vertices.csv."""

import pytest

from age_spark import AgeSession
from age_spark.catalog import CatalogError
from age_spark.graph import TAGGED_TYPE, _widen, is_tagged_type

from pyspark.sql import types as T


def rows(age, g, q):
    return [tuple(r) for r in age.cypher(g, q).df.collect()]


@pytest.fixture
def mixed(spark):
    age = AgeSession(spark)
    g = age.create_graph("mixed1")
    g = age.cypher(g, "CREATE (:A {val: 1}), (:A {val: 2.5})").graph
    g = age.cypher(g, "CREATE (:B {val: 'x'}), (:B {val: '1'})").graph
    g = age.cypher(g, "CREATE (:C {val: true})").graph
    g = age.cypher(g, "CREATE (:D {other: 9})").graph  # val is NULL here
    return age, g


def test_cross_type_order_ladder(mixed):
    age, g = mixed
    got = rows(age, g, "MATCH (n) RETURN toString(n.val) AS v ORDER BY n.val")
    # String(5) < Bool(6) < Numeric(7) < NULL(largest)
    assert got == [("1",), ("x",), ("true",), ("1",), ("2.5",), (None,)]


def test_cross_type_equality_not_stringified(mixed):
    age, g = mixed
    # int 1 must NOT equal string "1" (the old stringify bug made them equal)
    assert rows(age, g, "MATCH (n) WHERE n.val = 1 RETURN count(*) AS c") == [(1,)]
    assert rows(age, g, "MATCH (n) WHERE n.val = '1' RETURN count(*) AS c") == [(1,)]
    assert rows(age, g, "MATCH (n) WHERE n.val = true RETURN count(*) AS c") == [(1,)]
    # int/float numerics compare by value within the numeric kind
    assert rows(age, g, "MATCH (n) WHERE n.val < 2.6 AND n.val >= 1 RETURN count(*) AS c") == [(2,)]


def test_tagged_conversions(mixed):
    age, g = mixed
    got = rows(
        age, g,
        "MATCH (n) WHERE n.val IS NOT NULL "
        "RETURN toInteger(n.val) AS i, toFloat(n.val) AS f, toBoolean(n.val) AS b "
        "ORDER BY n.val",
    )
    assert got == [
        (1, 1.0, None),      # "1"
        (None, None, None),  # "x"
        (1, None, True),     # true  (toInteger(bool) -> 1; toFloat(bool) -> null)
        (1, 1.0, True),      # 1
        (2, 2.5, True),      # 2.5 (toInteger truncates)
    ]


def test_tagged_arithmetic_kind_preserving(mixed):
    """Arithmetic over a dynamic column preserves the numeric kind
    (agtype_ops.c add/sub/...): int rows stay exact ints, float rows stay
    float8, non-numeric rows null-propagate."""
    from age_spark.runtime.agvalue import agtype_out

    age, g = mixed
    got = [
        agtype_out(r.v)
        for r in age.cypher(
            g, "MATCH (n) WHERE n.val IS NOT NULL RETURN n.val + 1 AS v ORDER BY n.val"
        ).df.collect()
    ]
    # string rows CONCAT with the number ('1' + 1 -> "11", agtype_any_add);
    # the bool row nulls out; numeric rows keep their kind
    assert got == ['"11"', '"x1"', None, "2", "3.5"]
    got = [
        agtype_out(r.v)
        for r in age.cypher(
            g,
            "MATCH (n) WHERE n.val IS NOT NULL AND NOT n.val IN ['x', '1', true] "
            "RETURN n.val * 2 AS v ORDER BY n.val",
        ).df.collect()
    ]
    assert got == ["2", "5.0"]
    row = age.cypher(
        g,
        "MATCH (n) WHERE n.val = 1 RETURN n.val / 2 AS d, n.val % 2 AS m, "
        "n.val ^ 2 AS p",
    ).df.collect()[0]
    got = [agtype_out(row.d), agtype_out(row.m), agtype_out(row.p)]
    assert got == ["0", "1", "1.0"]  # int div truncates; ^ is always float
    # string-kind rows CONCATENATE on + ('str' + 1 -> "str1",
    # expr.out:659-663); numeric rows append with kind-faithful text;
    # bool rows null out
    got = [
        agtype_out(r.v)
        for r in age.cypher(
            g, "MATCH (n) WHERE n.val IS NOT NULL RETURN n.val + 'z' AS v ORDER BY n.val"
        ).df.collect()
    ]
    assert got == ['"1z"', '"xz"', None, '"1z"', '"2.5z"']


def test_is_null_and_nulls_largest(mixed):
    age, g = mixed
    assert rows(age, g, "MATCH (n) WHERE n.val IS NULL RETURN count(*) AS c") == [(1,)]


def test_widen_merges_all_agtype_kinds():
    # array vs scalar: distinct KINDS -> one dynamic (tagged) column,
    # same as the reference's one-agtype-column-per-key (agtype.h:307)
    assert is_tagged_type(_widen(T.ArrayType(T.LongType()), T.LongType()))
    # array vs array with conflicting element kinds: element-tagged list
    w = _widen(T.ArrayType(T.LongType()), T.ArrayType(T.StringType()))
    assert isinstance(w, T.ArrayType) and is_tagged_type(w.elementType)
    assert is_tagged_type(_widen(T.LongType(), T.StringType()))
    # int vs float are distinct agtype KINDS (agtype.h:307) -> dynamic value
    assert is_tagged_type(_widen(T.LongType(), T.DoubleType()))
    assert _widen(T.IntegerType(), T.LongType()) == T.LongType()
    assert _widen(T.FloatType(), T.DoubleType()) == T.DoubleType()
    assert is_tagged_type(_widen(TAGGED_TYPE, T.BooleanType()))
    # entity structs merge into a dynamic value too (vertex kind rank 2,
    # agtype_util.c:271 — `MATCH (n) RETURN n UNION RETURN 1` is valid,
    # cypher_union.sql)
    vertex = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("properties", T.StructType([])),
    ])
    assert is_tagged_type(_widen(vertex, T.LongType()))
    # but two SAME-kind entity structs field-merge, staying concrete
    assert isinstance(_widen(vertex, vertex), T.StructType)
    assert not is_tagged_type(_widen(vertex, vertex))


def test_set_mixed_kind_update(spark):
    """SET a string onto an int property: the label column becomes tagged,
    both kinds survive, comparisons stay kind-correct."""
    age = AgeSession(spark)
    g = age.create_graph("mixed2")
    g = age.cypher(g, "CREATE (:T {k: 1, val: 10}), (:T {k: 2, val: 20})").graph
    g = age.cypher(g, "MATCH (n:T {k: 2}) SET n.val = 'twenty'").graph
    assert rows(age, g, "MATCH (n:T) WHERE n.val = 10 RETURN count(*) AS c") == [(1,)]
    assert rows(age, g, "MATCH (n:T) WHERE n.val = 'twenty' RETURN count(*) AS c") == [(1,)]
    got = rows(age, g, "MATCH (n:T) RETURN toString(n.val) AS v ORDER BY n.val")
    assert got == [("twenty",), ("10",)]  # string kind < numeric kind


def test_heterogeneous_literal_lists(spark):
    """[1, 'a', true] — agtype's dynamically-typed lists (agtype.h:307) via
    element tagging; access, size, IN, equality, conversions all work."""
    from age_spark.runtime.agvalue import agtype_out

    age = AgeSession(spark)
    g = age.create_graph("hetlist")

    def out(q):
        return agtype_out(age.cypher(g, f"RETURN {q} AS v").df.collect()[0][0])

    assert out("[1, 'a', true]") == '[1, "a", true]'
    assert out("[1, 'a', null]") == '[1, "a", null]'
    assert out("[1, 'a', true][1]") == '"a"'
    assert out("size([1, 'a', true])") == "3"
    assert out("'a' IN [1, 'a']") == "true"
    assert out("2 IN [1, 'a']") == "false"
    assert out("[1, 'a'] = [1, 'a']") == "true"
    assert out("toStringList([1, 2.5, true])") == '["1", "2.5", null]'  # ref: bools -> null
    assert out("toIntegerList([1, '2', true])") == "[1, 2, 1]"


@pytest.fixture
def intfloat(spark):
    age = AgeSession(spark)
    g = age.create_graph("intfloat1")
    g = age.cypher(
        g,
        "CREATE (:N {k: 1, val: 2}), (:N {k: 2, val: 2.0}), "
        "(:N {k: 3, val: 2.5}), (:N {k: 4, val: 9007199254740993})",
    ).graph  # 2^53 + 1: not representable as float8
    return age, g


def test_int_float_kind_print_fidelity(intfloat):
    """The reference keeps INTEGER and FLOAT as distinct kinds
    (agtype.h:307-323): int 2 prints "2", float 2.0 prints "2.0"
    (ag_float8_supp.c float8out), and >2^53 ints stay exact."""
    from age_spark.runtime.agvalue import agtype_out

    age, g = intfloat
    got = [
        agtype_out(r.v)
        for r in age.cypher(g, "MATCH (n:N) RETURN n.val AS v ORDER BY n.k").df.collect()
    ]
    assert got == ["2", "2.0", "2.5", "9007199254740993"]


def test_int_float_mixed_order_and_equality(intfloat):
    age, g = intfloat
    # numeric ORDER is by value across kinds: 2 and 2.0 tie, then 2.5, 2^53+1
    vals = [
        r.k for r in age.cypher(
            g, "MATCH (n:N) RETURN n.k AS k ORDER BY n.val, n.k"
        ).df.collect()
    ]
    assert vals[2:] == [3, 4] and set(vals[:2]) == {1, 2}
    # = compares numeric kinds by VALUE (expr.out: RETURN 1 = 1.0 -> true)
    assert rows(age, g, "MATCH (n:N) WHERE n.val = 2.0 RETURN count(*) AS c") == [(2,)]
    assert rows(age, g, "MATCH (n:N) WHERE n.val = 2 RETURN count(*) AS c") == [(2,)]
    assert rows(age, g, "MATCH (n:N) WHERE n.val > 2 RETURN count(*) AS c") == [(2,)]


def test_sum_type_preservation(spark):
    """age_agtype_sum (agtype.c:11344): all-int input -> exact int sum;
    any float promotes the result to float."""
    from age_spark.runtime.agvalue import agtype_out

    age = AgeSession(spark)
    g = age.create_graph("sumkinds")
    g = age.cypher(
        g,
        "CREATE (:A {grp: 'i', v: 9007199254740993}), (:A {grp: 'i', v: 2}), "
        "(:A {grp: 'f', v: 1}), (:A {grp: 'f', v: 0.5})",
    ).graph
    got = {
        r.g: agtype_out(r.s)
        for r in age.cypher(
            g, "MATCH (n:A) RETURN n.grp AS g, sum(n.v) AS s"
        ).df.collect()
    }
    assert got["i"] == "9007199254740995"  # exact: would be wrong as float8
    assert got["f"] == "1.5"


def test_int_float_literal_list(spark):
    from age_spark.runtime.agvalue import agtype_out

    age = AgeSession(spark)
    g = age.create_graph("iflist")
    r = age.cypher(g, "RETURN [1, 2.5, 2.0] AS v").df.collect()[0][0]
    assert agtype_out(r) == "[1, 2.5, 2.0]"
    assert rows(age, g, "RETURN 1.0 IN [2, 1] AS v") == [(True,)]
    assert rows(age, g, "RETURN 1 IN [2.0, 1.0] AS v") == [(True,)]


def test_container_elementwise_ordering(spark):
    """Containers inside one dynamic column order element-wise
    (compare_agtype_containers_orderability, agtype_util.c:333): ["b"] >
    ["a","c"] because "b" > "a" decides at element 0; [2] < [10] by value
    (lexical JSON would say '2' > '1'); a strict prefix sorts first
    (premature-END rule)."""
    from age_spark.runtime.agvalue import agtype_out

    age = AgeSession(spark)
    g = age.create_graph("contord")
    # mix arrays with a scalar so the column becomes a dynamic value
    g = age.cypher(
        g,
        "CREATE (:L {v: ['b']}), (:L {v: ['a', 'c']}), (:L {v: ['a']}), "
        "(:L {v: [2]}), (:L {v: [10]}), (:L {v: 'scalar'})",
    ).graph
    got = [
        agtype_out(r.v)
        for r in age.cypher(g, "MATCH (n:L) RETURN n.v AS v ORDER BY n.v").df.collect()
    ]
    # ladder: ARRAY(4) < STRING(5); within arrays, string elements (5) <
    # numeric elements (7), and element values/prefixes decide
    assert got == ['["a"]', '["a", "c"]', '["b"]', "[2]", "[10]", '"scalar"']
    # comparisons agree with the ordering ('scalar' outranks every array)
    assert rows(age, g, "MATCH (n:L) WHERE n.v > ['a', 'c'] RETURN count(*) AS c") == [(4,)]
    assert rows(age, g, "MATCH (n:L) WHERE n.v < ['a'] RETURN count(*) AS c") == [(0,)]
    assert rows(age, g, "MATCH (n:L) WHERE n.v < ['b'] RETURN count(*) AS c") == [(2,)]


def test_object_elementwise_ordering(spark):
    from age_spark.runtime.agvalue import agtype_out

    age = AgeSession(spark)
    g = age.create_graph("objord")
    # objects with jsonb key order (length, byte): key 'a' < 'b'; a strict
    # pair-prefix sorts first; values decide when keys tie
    g = age.cypher(
        g,
        "CREATE (:M {v: {a: 2}}), (:M {v: {a: 1, b: 9}}), (:M {v: {a: 1}}), "
        "(:M {v: 7})",
    ).graph
    got = [
        agtype_out(r.v)
        for r in age.cypher(g, "MATCH (n:M) RETURN n.v AS v ORDER BY n.v").df.collect()
    ]
    assert got == ['{"a": 1}', '{"a": 1, "b": 9}', '{"a": 2}', "7"]


def test_deep_container_ordering(spark):
    """Past-the-old-bounds ordering (VERDICT r3 #5): 10+-element arrays
    compare element-wise, depth-2 containers compare by VALUE (not lexical
    JSON — [1,[3]] < [1,[20]]), and the prefix-shorter-first rule holds at
    every width (compare_agtype_containers_orderability,
    agtype_util.c:333)."""
    from age_spark.runtime.agvalue import agtype_out

    age = AgeSession(spark)
    g = age.create_graph("deepord")

    def ordered(lst_expr):
        return [
            agtype_out(r[0])
            for r in age.cypher(
                g, f"UNWIND {lst_expr} AS x RETURN x ORDER BY x"
            ).df.collect()
        ]

    # depth-2 arrays by numeric VALUE
    assert ordered("[[1,[20]], [1,[3]]]") == ["[1, [3]]", "[1, [20]]"]
    # 10- and 12-element arrays element-wise (old bound was 8)
    assert ordered("[[1,1,1,1,1,1,1,1,1,30], [1,1,1,1,1,1,1,1,1,4]]") == [
        "[1, 1, 1, 1, 1, 1, 1, 1, 1, 4]",
        "[1, 1, 1, 1, 1, 1, 1, 1, 1, 30]",
    ]
    assert ordered(
        "[[1,1,1,1,1,1,1,1,1,1,1,20], [1,1,1,1,1,1,1,1,1,1,1,3]]"
    ) == [
        "[1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 3]",
        "[1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 20]",
    ]
    # premature END sorts first beyond the old width
    assert ordered("[[1,1,1,1,1,1,1,1,2], [1,1,1,1,1,1,1,1]]") == [
        "[1, 1, 1, 1, 1, 1, 1, 1]",
        "[1, 1, 1, 1, 1, 1, 1, 1, 2]",
    ]
    # depth-2 objects by value
    assert ordered("[{a: {b: 20}}, {a: {b: 3}}]") == [
        '{"a": {"b": 3}}',
        '{"a": {"b": 20}}',
    ]
    # nested negatives order numerically
    assert ordered("[[0, [-3]], [0, [-20]], [0, [5]]]") == [
        "[0, [-20]]",
        "[0, [-3]]",
        "[0, [5]]",
    ]
    # int-vs-float inside containers tie by VALUE: both orders are valid
    # outputs for equal values — assert the pair is ADJACENT under a
    # third, strictly larger container
    got = ordered("[[3], [2.0], [2]]")
    assert got[2] == "[3]" and set(got[:2]) == {"[2]", "[2.0]"}

