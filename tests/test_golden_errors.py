"""Golden ERROR conformance: expressions the reference rejects must raise a
clear error here too (compile-time where static typing allows — the
distributed engine cannot raise per-row, so runtime-value errors from the
reference become compile rejections when the type is statically known).
Citations are regress/expected/expr.out lines."""

import pytest

from age_spark import AgeSession
from age_spark.compiler.context import CompileError

ERROR_CASES = [
    "toInteger(true)",            # expr.out:3666 unsupported argument (bool)
    "toFloat(true)",              # expr.out:3502
    "range(0, -10.0, -3.0)",      # expr.out:8070 unsupported argument type
    "range(1.5, 3)",
    "bogus_fn_xyz(1)",            # unknown fn, no Spark registry match
    "9223372036854775808",        # agtype.out:104 out of range for bigint
    "-9223372036854775809",       # agtype.out:108
]


@pytest.fixture(scope="module")
def g(spark):
    age = AgeSession(spark)
    return age, age.create_graph("errs")


@pytest.mark.parametrize("expr", ERROR_CASES)
def test_rejected(g, expr):
    age, graph = g
    with pytest.raises(CompileError):
        age.cypher(graph, f"RETURN {expr} AS v")


def test_slice_non_list_rejected(g):
    """expr.out:505 — slice must access a list."""
    age, graph = g
    with pytest.raises(Exception):  # CompileError or analysis rejection
        age.cypher(graph, "RETURN 0[0..1] AS v").df.collect()


def test_delete_without_detach_rejected(g):
    age, graph = g
    gr = age.cypher(graph, "CREATE (a:D1)-[:E]->(b:D2)").graph
    with pytest.raises(CompileError):
        age.cypher(gr, "MATCH (n:D1) DELETE n")


def test_size_of_object_rejected(g):
    """expr.out:3025 — size() unsupported argument (objects)."""
    age, graph = g
    with pytest.raises(CompileError):
        age.cypher(graph, "RETURN size({a: 1}) AS v")


def test_float_mod_zero_is_nan(g):
    """PG float8 modulo by zero yields NaN (int % 0 stays an error)."""
    from age_spark.runtime.agvalue import agtype_out

    age, graph = g
    v = age.cypher(graph, "RETURN 10 % 0.0 AS v").df.collect()[0][0]
    assert agtype_out(v) == "NaN"
    v = age.cypher(graph, "RETURN 5.5 % 2 AS v").df.collect()[0][0]
    assert agtype_out(v) == "1.5"



def test_abs_int64_min_overflows(g):
    """abs(INT64_MIN) errors like the reference (age_abs ->
    numeric_abs -> numeric_int8, which raises bigint-out-of-range) —
    Spark's F.abs would silently wrap back to INT64_MIN (ADVICE r9).
    A literal INT64_MIN parses fine (it is within range); only abs
    overflows.  abs on the neighbouring value stays exact."""
    age, graph = g
    with pytest.raises(Exception, match="bigint out of range"):
        age.cypher(
            graph, "RETURN abs(-9223372036854775807 - 1) AS v"
        ).df.collect()
    v = age.cypher(
        graph, "RETURN abs(-9223372036854775807) AS v"
    ).df.collect()[0][0]
    from age_spark.runtime.agvalue import agtype_out

    assert agtype_out(v) == "9223372036854775807"
