"""Session API parity for drop_graph(cascade) / alter_graph RENAME —
mirrors the reference's graph-level statements in
regress/expected/catalog.out:56-186 (graph_commands.c:192,299)."""

import pytest

from age_spark import AgeSession
from age_spark.catalog import CatalogError


@pytest.fixture()
def age(spark):
    return AgeSession(spark)


def test_drop_graph_restrict_refuses(age):
    g = age.create_graph("ddl_graph")
    age.cypher(g, "CREATE (:v)")
    # catalog.out:68 — cascade=false refuses: the namespace always holds
    # the label tables
    with pytest.raises(CatalogError, match="cannot drop schema .* other objects depend"):
        age.drop_graph("ddl_graph")
    assert "ddl_graph" in age.graphs


def test_drop_graph_cascade_drops(age):
    g = age.create_graph("ddl_graph2")
    age.graphs["ddl_graph2"] = age.cypher(g, "CREATE (:v {k: 1})").graph
    age.drop_graph("ddl_graph2", cascade=True)
    assert "ddl_graph2" not in age.graphs
    # catalog.out:103 — dropping again: the graph no longer exists
    with pytest.raises(CatalogError, match='graph "ddl_graph2" does not exist'):
        age.drop_graph("ddl_graph2", cascade=True)


def test_drop_graph_null_name(age):
    # catalog.out:101 'graph name can not be NULL'
    with pytest.raises(CatalogError, match="graph name can not be NULL"):
        age.drop_graph(None)


def test_alter_graph_rename_roundtrip(age):
    g = age.create_graph("GraphA")
    age.graphs["GraphA"] = age.cypher(g, "CREATE (:Person {name: 'a'})").graph
    age.create_graph("GraphB")
    ng = age.alter_graph("GraphA", "RENAME", "GraphX")
    assert ng.name == "GraphX"
    assert "GraphA" not in age.graphs and "GraphX" in age.graphs
    # data and label-id space carry over
    rows = age.cypher(age.graphs["GraphX"], "MATCH (n:Person) RETURN n.name").df.collect()
    assert [r[0] for r in rows] == ["a"]
    # catalog.out:174 — case sensitive: graphx does not exist
    with pytest.raises(CatalogError, match='graph "graphx" does not exist'):
        age.alter_graph("graphx", "RENAME", "GRAPHX")
    # catalog.out:176 — collision with an existing graph
    with pytest.raises(CatalogError, match='schema "GraphB" already exists'):
        age.alter_graph("GraphX", "RENAME", "GraphB")


def test_alter_graph_operation_and_null_errors(age):
    age.create_graph("ddl_graph3")
    with pytest.raises(CatalogError, match='invalid operation "DROP"'):
        age.alter_graph("ddl_graph3", "DROP", "x")
    # operation is case-insensitive (graph_commands.c:334 strcasecmp)
    ng = age.alter_graph("ddl_graph3", "rename", "ddl_graph4")
    assert ng.name == "ddl_graph4"
    with pytest.raises(CatalogError, match="graph_name must not be NULL"):
        age.alter_graph(None, "RENAME", "x")
    with pytest.raises(CatalogError, match="operation must not be NULL"):
        age.alter_graph("ddl_graph4", None, "x")
    with pytest.raises(CatalogError, match="new_value must not be NULL"):
        age.alter_graph("ddl_graph4", "RENAME", None)
    with pytest.raises(CatalogError, match="new graph name is invalid"):
        age.alter_graph("ddl_graph4", "RENAME", "")



def test_scan_cache_bounded_and_supersede_drops_ref(spark):
    """ADVICE r7: the per-graph scan/thin-table cache must not grow
    unboundedly across keys, and a superseded entry (label table swapped)
    must drop this graph's reference so the ContextCleaner can release
    the checkpoint once no snapshot holds it."""
    from age_spark.graph import _SCAN_CACHE_MAX, create_graph

    g = create_graph(spark, "cache_bound")
    df = spark.range(3)
    for i in range(_SCAN_CACHE_MAX + 8):
        g._scan_cached(("k", i), [df], lambda: df)
    assert len(g._scan_cache) <= _SCAN_CACHE_MAX

    # hit path returns the same object and refreshes recency
    out1 = g._scan_cached(("hot",), [df], lambda: df.select("id"))
    out2 = g._scan_cached(("hot",), [df], lambda: df.select("id"))
    assert out1 is out2

    # supersede: same key, different underlying df -> old entry replaced
    df2 = spark.range(4)
    out3 = g._scan_cached(("hot",), [df2], lambda: df2.select("id"))
    assert out3 is not out1
    assert g._scan_cache[("hot",)][1] is out3
