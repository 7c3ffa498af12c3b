"""agtype_out formatting parity — shapes taken from the reference's golden
outputs (regress/expected/cypher_match.out:46-83, agtype.out:86-90)."""

from age_spark import AgeSession
from age_spark.runtime.agvalue import agtype_out


def test_scalars():
    assert agtype_out(None) is None
    assert agtype_out(True) == "true"
    assert agtype_out(7) == "7"
    assert agtype_out(1.0) == "1.0"
    assert agtype_out(2.5) == "2.5"
    assert agtype_out("a\"b") == '"a\\"b"'
    assert agtype_out([1, 3, 5]) == "[1, 3, 5]"
    assert agtype_out({"bool": True}) == '{"bool": true}'
    assert agtype_out([True, False, None, "string", 1, 1.0, {"bool": True}]) == \
        '[true, false, null, "string", 1, 1.0, {"bool": true}]'


def test_mixed_list_null_prints_inline():
    # inside containers null prints as the literal (only top-level NULL is
    # an empty cell)
    assert agtype_out([None]) == "[null]"


def test_vertex_edge_shapes():
    v = {"id": 844424930131969, "label": "v", "properties": {"_none": None}}
    assert agtype_out(v) == '{"id": 844424930131969, "label": "v", "properties": {}}::vertex'
    e = {
        "id": 1407374883553281, "label": "e1", "start_id": 1125899906842626,
        "end_id": 1125899906842627, "properties": {},
    }
    # JSONB key order: id, label, end_id, start_id, properties
    assert agtype_out(e) == (
        '{"id": 1407374883553281, "label": "e1", "end_id": 1125899906842627, '
        '"start_id": 1125899906842626, "properties": {}}::edge'
    )


def test_engine_row_round_trip(spark):
    age = AgeSession(spark)
    g = age.create_graph("fmt")
    g.add_vertices("v", spark.createDataFrame([(1, 0)], "vid long, i long"), id_col="vid")
    row = age.cypher(g, "MATCH (n:v) RETURN n").df.collect()[0]
    out = agtype_out(row.n)
    lid = g.meta.label("v").label_id
    expected_id = (lid << 48) | 1
    assert out == ('{"id": %d, "label": "v", "properties": {"i": 0}}::vertex' % expected_id)


def test_path_round_trip(spark):
    age = AgeSession(spark)
    g = age.create_graph("fmt2")
    g.add_vertices("v", spark.createDataFrame([(1,), (2,)], "vid long"), id_col="vid")
    g.add_edges("e", spark.createDataFrame([(9, 1, 2)], "eid long, s long, t long"),
                start_col="s", end_col="t", start_label="v", end_label="v", id_col="eid")
    row = age.cypher(g, "MATCH p = (a:v)-[:e]->(b:v) RETURN p").df.collect()[0]
    out = agtype_out(row.p)
    assert out.endswith("::path") and out.count("::vertex") == 2 and out.count("::edge") == 1


def test_numeric_prints_with_suffix():
    """agtype NUMERIC prints '<value>::numeric' (expr.out:1758-1771)."""
    import decimal

    from age_spark.runtime.agvalue import agtype_out

    assert agtype_out(decimal.Decimal("2.710000000000000000")) == "2.71::numeric"
    assert agtype_out(decimal.Decimal("0E-18")) == "0::numeric"

