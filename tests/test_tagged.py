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


def test_tagged_arithmetic_null_propagates(mixed):
    age, g = mixed
    got = rows(
        age, g,
        "MATCH (n) WHERE n.val IS NOT NULL RETURN n.val + 1 AS v ORDER BY n.val",
    )
    assert got == [(None,), (None,), (None,), (2.0,), (3.5,)]


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
    assert _widen(T.LongType(), T.DoubleType()) == T.DoubleType()
    assert is_tagged_type(_widen(TAGGED_TYPE, T.BooleanType()))
    # entity structs never merge into a dynamic value
    vertex = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("label", T.StringType()),
        T.StructField("properties", T.StructType([])),
    ])
    with pytest.raises(CatalogError):
        _widen(vertex, T.LongType())


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
    assert out("toStringList([1, 2.5, true])") == '["1", "2.5", "true"]'
    assert out("toIntegerList([1, '2', true])") == "[1, 2, 1]"
