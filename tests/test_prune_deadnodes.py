"""Dead-pattern-node vertex-join pruning (round 10 optimization) +
the AgeSession prepared-plan cache.

The pruning replaces a label-only, never-again-referenced pattern node's
vertex-table join with an id-bit label filter on the adjacent edge
endpoint — valid only under the referential-integrity invariant
(`Graph.integrity`).  These tests pin:

  * result equivalence on every tricky shape (pruned first node, pruned
    destination, unknown label, reused edge var, OPTIONAL MATCH,
    undirected, incoming direction, write-after-prune);
  * the PLAN effect (fewer parquet scans when the node is dead, the
    join back when the variable is referenced);
  * the integrity gate (file-loaded edges disable pruning);
  * plan-cache hygiene (same results on repeat, in-place-load
    invalidation, EXPLAIN bypass is covered by test_plans.py).
"""

import pytest
from pyspark.sql import functions as F

from age_spark import AgeSession


@pytest.fixture()
def age_g(spark):
    age = AgeSession(spark)
    g = age.create_graph("prune_t")
    g = age.cypher(
        g,
        "CREATE (a:A {k:1})-[:R {w:1}]->(b:B {k:2}), "
        "(a2:A {k:3})-[:R {w:2}]->(b2:B {k:4})",
    ).graph
    g = age.cypher(g, "MATCH (a:A {k:1}) CREATE (a)-[:S]->(:C {k:9})").graph
    return age, g


def _n(age, g, q):
    return age.cypher(g, q).df.collect()[0][0]


def test_pruned_results_match_semantics(age_g):
    age, g = age_g
    assert _n(age, g, "MATCH (:NoSuch)-[e]->() RETURN count(*) AS n") == 0
    assert _n(age, g, "MATCH (:A)-[e:R]->() RETURN count(*) AS n") == 2
    assert _n(age, g, "MATCH (a:A)-[e]->(:B) RETURN count(*) AS n") == 2
    # shared variable on both endpoints is NOT prunable (self-loop qual)
    assert _n(age, g, "MATCH (a)-[e]->(a) RETURN count(*) AS n") == 0
    # reused edge variable: second clause prunes only its destination
    assert _n(
        age, g,
        "MATCH (a:A)-[e:R]->(b:B) MATCH (a)-[e]->() RETURN count(*) AS n",
    ) == 2
    assert _n(age, g, "MATCH (a:A)-[e]-() RETURN count(*) AS n") == 3
    assert _n(age, g, "MATCH (:B)<-[e:R]-(a) RETURN count(*) AS n") == 2
    rows = sorted(
        tuple(r)
        for r in age.cypher(
            g, "MATCH (a:A) OPTIONAL MATCH (a)-[:S]->(x) RETURN a.k AS k, count(x) AS n"
        ).df.collect()
    )
    assert rows == [(1, 1), (3, 0)]


def test_vle_around_pruned_nodes(spark):
    age = AgeSession(spark)
    g = age.create_graph("prune_vle")
    g = age.cypher(
        g, "CREATE (:A {k:1})-[:R]->(:M {k:2})-[:R]->(:X {k:3})-[:R]->(:Y {k:4})"
    ).graph
    # VLE seeded from a PRUNED intermediate node (seeds come from the
    # previous hop's destination helper column, not a vertex struct)
    assert _n(
        age, g, "MATCH (a:A)-[:R]->()-[*1..2]->(x) RETURN count(*) AS n"
    ) == 2
    # reference answer with the intermediate kept
    assert _n(
        age, g, "MATCH (a:A)-[:R]->(m:M)-[*1..2]->(x) RETURN count(*) AS n"
    ) == 2
    # VLE destination pruned but label-constrained (id-bit filter on the
    # traversal's arrival id)
    assert _n(age, g, "MATCH (a:A)-[*1..3]->(:Y) RETURN count(*) AS n") == 1


def test_write_through_pruned_match(age_g):
    age, g = age_g
    g2 = age.cypher(g, "MATCH (:A)-[:R]->(b:B) SET b.seen = true").graph
    rows = sorted(
        tuple(r)
        for r in age.cypher(g2, "MATCH (b:B) RETURN b.k AS k, b.seen AS s").df.collect()
    )
    assert rows == [(2, True), (4, True)]


def test_plan_drops_scans_only_when_dead(age_g):
    age, g = age_g
    dead = age.explain(g, "MATCH (a:A)-[:R]->(b:B) RETURN count(*) AS n")
    live = age.explain(g, "MATCH (a:A)-[:R]->(b:B) RETURN b.k AS k")
    # b dead: its vertex scan is pruned -> strictly fewer scans than the
    # variant that projects b.k (a is the single pattern source and is
    # pruned in BOTH, so the delta isolates b's join)
    assert dead.count("Scan ") < live.count("Scan ")
    # the label constraint survives as an id-bit filter on the endpoint
    assert "shiftright" in dead.lower() or ">> 48" in dead


def test_integrity_gate_disables_pruning(spark):
    age = AgeSession(spark)
    g = age.create_graph("prune_csv")
    v = spark.createDataFrame([(1, "x"), (2, "y")], "id long, name string")
    g = age.load_vertices(g, "N", v, id_col="id")
    # endpoint id 99 was never loaded -> dangling edge; the loader clears
    # Graph.integrity, so the vertex join must STAY and filter it out
    e = spark.createDataFrame([(1, 2), (1, 99)], "s long, t long")
    g = age.load_edges(g, "R", e, start_col="s", end_col="t",
                       start_label="N", end_label="N")
    assert g.integrity is False
    assert _n(age, g, "MATCH (:N)-[e:R]->(:N) RETURN count(*) AS n") == 1
    assert _n(age, g, "MATCH ()-[e:R]->(:N) RETURN count(*) AS n") == 1


def test_plan_cache_repeat_and_invalidation(spark):
    age = AgeSession(spark)
    g = age.create_graph("pc_t")
    g = age.cypher(g, "UNWIND range(1, 5) AS i CREATE (n:T {k: i})").graph
    q = "MATCH (n:T) WHERE n.k > 2 RETURN n.k AS k"
    first = sorted(r.k for r in age.cypher(g, q).df.collect())
    again = sorted(r.k for r in age.cypher(g, q).df.collect())
    assert first == again == [3, 4, 5]
    # in-place load bumps _mutation_count -> the cached plan must not be
    # served against the mutated graph
    mc = g._mutation_count
    g.add_vertices("T", spark.createDataFrame([(7, 99)], "id long, k long"),
                   id_col="id")
    assert g._mutation_count > mc
    assert sorted(r.k for r in age.cypher(g, q).df.collect()) == [3, 4, 5, 99]
