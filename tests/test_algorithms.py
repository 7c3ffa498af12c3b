"""Graph algorithms: known-answer fixtures."""

import pytest
from pyspark.sql import functions as F

from age_spark import AgeSession
from age_spark.algorithms import connected_components, pagerank, triangle_count


@pytest.fixture(scope="module")
def two_comp_graph(spark):
    """Components {1,2,3} (triangle) and {10,11} (edge); 20 isolated."""
    v = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 20)], "id long")
    e = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (10, 11)], "start_id long, end_id long"
    )
    return v, e


def test_connected_components(two_comp_graph):
    v, e = two_comp_graph
    got = {r.id: r.component for r in connected_components(v, e).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20}


def test_triangle_count(two_comp_graph):
    v, e = two_comp_graph
    assert triangle_count(e).collect()[0].n_triangles == 1


def test_pagerank_sums_to_one_and_ranks_hub(spark):
    # star graph: everyone points at 1 -> 1 has the top rank
    v = spark.createDataFrame([(i,) for i in range(1, 6)], "id long")
    e = spark.createDataFrame([(i, 1) for i in range(2, 6)], "start_id long, end_id long")
    pr = pagerank(v, e, iterations=15).collect()
    total = sum(r.rank for r in pr)
    assert abs(total - 1.0) < 1e-6
    top = max(pr, key=lambda r: r.rank)
    assert top.id == 1


def test_call_procedures(spark):
    age = AgeSession(spark)
    g = age.create_graph("alg")
    g.add_vertices("N", spark.createDataFrame([(i,) for i in (1, 2, 3)], "vid long"), id_col="vid")
    g.add_edges("E", spark.createDataFrame([(1, 1, 2), (2, 2, 3), (3, 3, 1)],
                "eid long, s long, t long"),
                start_col="s", end_col="t", start_label="N", end_label="N", id_col="eid")
    r = age.cypher(g, "CALL triangle_count() YIELD n_triangles RETURN n_triangles")
    assert r.df.collect()[0].n_triangles == 1
    r = age.cypher(g, "CALL connected_components() YIELD id, component RETURN count(DISTINCT component) AS c")
    assert r.df.collect()[0].c == 1
    r = age.cypher(g, "CALL pagerank(0.85, 5) YIELD id, rank RETURN round(sum(rank), 4) AS total")
    assert abs(r.df.collect()[0].total - 1.0) < 1e-3


def test_near_dedup_collapses_transitive_cluster(spark):
    from age_spark.pipeline.dedup import near_dedup

    base = "the quick brown fox jumps over the lazy dog and runs far away home tonight"
    rows = [
        (1, base),
        (2, base + " extra"),           # near-dup of 1
        (3, "extra " + base),           # near-dup of 1 and 2
        (4, "completely different text about database engines and query planners at scale"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r.doc_id for r in near_dedup(docs, threshold=0.5).collect())
    assert kept == [1, 4]
