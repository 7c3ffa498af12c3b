"""VLE conformance: the reference's cypher_vle regression fixture and its
count-pinned queries, ported verbatim (regress/sql/cypher_vle.sql fixture
graph at :28; expected counts from regress/expected/cypher_vle.out). The
counts are id-independent, so they transfer exactly; path/edge-printing
blocks embed reference-assigned graphids and stay with the engine's own
golden print tests instead."""

import os

import pytest

from age_spark import AgeSession

# the fixture CREATE from cypher_vle.sql:28 — 5 vertices, 13 edges
# (4-hop main chain, two self-loops, alternate/bypass/backup edges)
FIXTURE = (
    "CREATE (b:begin)-[:edge {name: 'main edge', number: 1, "
    'dangerous: {type: "all", level: "all"}}]->(u1:middle)'
    "-[:edge {name: 'main edge', number: 2, "
    'dangerous: {type: "all", level: "all"}, packages: [2,4,6]}]->(u2:middle)'
    "-[:edge {name: 'main edge', number: 3, "
    'dangerous: {type: "all", level: "all"}}]->(u3:middle)'
    "-[:edge {name: 'main edge', number: 4, "
    'dangerous: {type: "all", level: "all"}}]->(e:end), '
    "(u1)-[:self_loop {name: 'self loop', number: 1, "
    'dangerous: {type: "all", level: "all"}}]->(u1), '
    "(e)-[:self_loop {name: 'self loop', number: 2, "
    'dangerous: {type: "all", level: "all"}}]->(e), '
    "(b)-[:alternate_edge {name: 'alternate edge', number: 1, packages: [2,4,6], "
    'dangerous: {type: "poisons", level: "all"}}]->(u1), '
    "(u2)-[:alternate_edge {name: 'alternate edge', number: 2, packages: [2,4,6], "
    'dangerous: {type: "poisons", level: "all"}}]->(u3), '
    "(u3)-[:alternate_edge {name: 'alternate edge', number: 3, packages: [2,4,6], "
    'dangerous: {type: "poisons", level: "all"}}]->(e), '
    "(u2)-[:bypass_edge {name: 'bypass edge', number: 1, packages: [1,3,5,7]}]->(e), "
    "(e)-[:alternate_edge {name: 'backup edge', number: 1, packages: [1,3,5,7]}]->(u3), "
    "(u3)-[:alternate_edge {name: 'backup edge', number: 2, packages: [1,3,5,7]}]->(u2), "
    "(u2)-[:bypass_edge {name: 'bypass edge', number: 2, packages: [1,3,5,7], "
    'dangerous: {type: "poisons", level: "all"}}]->(b)'
)

# (cypher MATCH, expected count) — verbatim from cypher_vle.out
COUNT_CASES = [
    ("MATCH (u:begin)-[*]->(v:end) RETURN count(*) AS c", 400),
    ("MATCH (u:begin)-[*..]->(v:end) RETURN count(*) AS c", 400),
    ("MATCH (u:begin)-[*0..]->(v:end) RETURN count(*) AS c", 400),
    ("MATCH (u:begin)-[*1..]->(v:end) RETURN count(*) AS c", 400),
    ("MATCH (u:begin)-[*1..200]->(v:end) RETURN count(*) AS c", 400),
    ("MATCH (u:begin)<-[*]-(v:end) RETURN count(*) AS c", 2),
    ("MATCH (u:begin)<-[*..]-(v:end) RETURN count(*) AS c", 2),
    ("MATCH (u:begin)<-[*0..]-(v:end) RETURN count(*) AS c", 2),
    ("MATCH (u:begin)<-[*1..]-(v:end) RETURN count(*) AS c", 2),
    ("MATCH (u:begin)<-[*1..200]-(v:end) RETURN count(*) AS c", 2),
    ("MATCH (u:begin)-[*]-(v:end) RETURN count(*) AS c", 7092),
    ("MATCH (u:begin)-[*..]-(v:end) RETURN count(*) AS c", 7092),
    ("MATCH (u:begin)-[*0..]-(v:end) RETURN count(*) AS c", 7092),
    ("MATCH (u:begin)-[*1..]-(v:end) RETURN count(*) AS c", 7092),
    ("MATCH (u:begin)-[*1..200]-(v:end) RETURN count(*) AS c", 7092),
    ("MATCH (u:begin)-[:edge*]-(v:end) RETURN count(*) AS c", 1),
    ('MATCH (u:begin)-[:edge* {name: "main edge"}]-(v:end) RETURN count(*) AS c', 1),
    ('MATCH (u:begin)-[* {name: "main edge"}]-(v:end) RETURN count(*) AS c', 1),
    ('MATCH ()<-[*4..4 {name: "main edge"}]-() RETURN count(*) AS c', 1),
    ('MATCH (u)<-[*4..4 {name: "main edge"}]-() RETURN count(*) AS c', 1),
    ('MATCH ()<-[*4..4 {name: "main edge"}]-(v) RETURN count(*) AS c', 1),
    ("MATCH ()-[*]->() RETURN count(*) AS c", 2922),
    ("MATCH (u)-[*]->() RETURN count(*) AS c", 2922),
    ("MATCH ()-[*]->(v) RETURN count(*) AS c", 2922),
]


@pytest.fixture(scope="module")
def vle_graph(spark):
    age = AgeSession(spark)
    g = age.create_graph("vle_conformance")
    g = age.cypher(g, FIXTURE).graph
    return age, g


def test_fixture_shape(vle_graph):
    age, g = vle_graph
    assert age.cypher(g, "MATCH (n) RETURN count(*) AS c").df.collect()[0].c == 5
    assert age.cypher(g, "MATCH ()-[r]->() RETURN count(*) AS c").df.collect()[0].c == 13


# each VLE count costs compile + traversal latency, not CPU: thread-pool
# them (SPARK_GRAFT_SERIAL_SUITES=1 restores per-case tests for debugging)
if os.environ.get("SPARK_GRAFT_SERIAL_SUITES") == "1":

    @pytest.mark.parametrize(
        "q,want", COUNT_CASES, ids=[q[:48] for q, _ in COUNT_CASES]
    )
    def test_vle_count(vle_graph, q, want):
        age, g = vle_graph
        assert age.cypher(g, q).df.collect()[0].c == want

else:

    def test_vle_counts_pooled(vle_graph):
        from concurrent.futures import ThreadPoolExecutor

        age, g = vle_graph

        def run(case):
            q, want = case
            got = age.cypher(g, q).df.collect()[0].c
            return None if got == want else f"{q}: got {got}, want {want}"

        with ThreadPoolExecutor(max_workers=16) as ex:
            fails = [f for f in ex.map(run, COUNT_CASES) if f]
        assert not fails, "\n".join(fails)


def test_undirected_self_loop_matches_once(vle_graph):
    """A self-loop matches an undirected single-edge pattern ONCE, not once
    per orientation (the reference's separate edges_self list,
    age_global_graph.c:642-657)."""
    age, g = vle_graph
    got = age.cypher(
        g, "MATCH (a:end)-[r:self_loop]-(b) RETURN count(*) AS c"
    ).df.collect()[0].c
    assert got == 1



def test_vcount_gate_invalidated_by_inplace_load(spark):
    """VERDICT r7 "What's wrong" #3: the capped vertex-count probe behind
    the VLE pruning gate is cached per Graph object; an IN-PLACE bulk load
    (loads mutate the same Graph, unlike write snapshots) must invalidate
    it, or the gate keeps answering "under bound" for a graph that outgrew
    the broadcast budget and re-enables a label-sized closure broadcast."""
    import pyspark.sql.functions as F

    from age_spark.runtime import vle as vle_mod
    from age_spark.runtime.vle import _pruning_small_enough

    age = AgeSession(spark)
    g = age.create_graph("gate_inval")
    g = age.load_vertices(
        g, "N", spark.range(5).select(F.col("id"), F.lit("x").alias("name")),
        id_col="id",
    )
    bound = 16
    orig = vle_mod._SP_BCAST_ROWS
    vle_mod._SP_BCAST_ROWS = bound
    try:
        targets = g.scan_vertices(None).select(F.col("id").alias("_tv"))
        # small graph: probe caches "under bound", pruning allowed
        assert g.vertex_count_capped(bound) == 5
        assert _pruning_small_enough(g, targets)
        # in-place load pushes the SAME Graph object past the bound
        g = age.load_vertices(
            g, "N",
            spark.range(100, 100 + 2 * bound).select(
                F.col("id"), F.lit("y").alias("name")
            ),
            id_col="id",
        )
        assert g.vertex_count_capped(bound) == bound, (
            "stale capped-count cache survived an in-place load"
        )
        big_targets = g.scan_vertices(None).select(F.col("id").alias("_tv"))
        assert not _pruning_small_enough(g, big_targets), (
            "VLE gate still allows the pruning broadcast after the graph "
            "outgrew _SP_BCAST_ROWS"
        )
    finally:
        vle_mod._SP_BCAST_ROWS = orig
