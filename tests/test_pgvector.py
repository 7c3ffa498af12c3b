"""pgvector conformance: the reference integrates the pgvector extension
into Cypher (regress/sql/pgvector.sql); these cases are mined verbatim from
regress/expected/pgvector.out — function values, operators (including the
PG OPERATOR ( op ) syntax it needs for `<->`), float4 print fidelity, the
Movie similarity-search block, and the dimension-check errors."""

import pytest

from age_spark import AgeSession
from age_spark.compiler.vectors import vector_out
from age_spark.runtime.agvalue import agtype_out

# (cypher RETURN payload, expected agtype_out) — pgvector.out:116-180
SCALAR_CASES = [
    ('l2_distance("[1,2,3]", "[1,2,4]")', "1.0"),
    ('inner_product("[1,2,3]", "[1,2,4]")', "17.0"),
    ('cosine_distance("[1,2,3]", "[1,2,4]")', "0.00853986601633272"),
    ('l1_distance("[1,2,3]", "[1,2,4]")', "1.0"),
    ('vector_dims("[1,2,3]")', "3"),
    ('vector_norm("[1,2,3]")', "3.74165738677394"),
    ('l2_normalize("[1,2,3]")::text', "[0.26726124, 0.5345225, 0.80178374]"),
    ('subvector("[1,2,3,4,5,6]", 2, 4)::text', "[2, 3, 4, 5]"),
    ('binary_quantize("[1,2,4]")', '"111"'),
    # operator block (pgvector.out:185-230); vector results printed through
    # the ::text round-trip the reference's AS (n vector) column applies
    ("([1,2,3]::vector + [1,2,4]::vector)::text", "[2, 4, 7]"),
    ("([1,2,3]::vector - [1,2,4]::vector)::text", "[0, 0, -1]"),
    ("([1,2,3]::vector * [1,2,4]::vector)::text", "[1, 4, 12]"),
    ("([1,2,3]::vector || [1,2,4]::vector)::text", "[1, 2, 3, 1, 2, 4]"),
    ("[1,2,3]::vector <#> [1,2,4]::vector", "-17.0"),
    ("[1,2,3]::vector <=> [1,2,4]::vector", "0.00853986601633272"),
    ("[1,2,3]::vector <+> [1,2,4]::vector", "1.0"),
    # OPERATOR ( op ) syntax, bare and schema-qualified (pgvector.out:246+)
    ("[1,2,3]::vector OPERATOR (`<->`) [1,2,4]::vector", "1.0"),
    ("([1,2,3]::vector OPERATOR (+) [1,2,4]::vector)::text", "[2, 4, 7]"),
    ("[1,2,3]::vector OPERATOR (<#>) [1,2,4]::vector", "-17.0"),
    ("[1,2,3]::vector OPERATOR (public.`<->`) [1,2,4]::vector", "1.0"),
    ("[1,2,3]::vector OPERATOR (public.<=>) [1,2,4]::vector", "0.00853986601633272"),
    ("[1,2,3]::vector OPERATOR (public.<+>) [1,2,4]::vector", "1.0"),
]

# title -> 4-dim embedding, verbatim from the fixture CREATE (pgvector.sql)
MOVIES = [
    ("The Matrix", [-0.07594558, 0.04081754, 0.29592122, -0.11921061]),
    ("The Matrix Reloaded", [0.30228977, -0.22839354, 0.35070436, 0.01262819]),
    ("The Matrix Revolutions", [0.12240622, -0.29752459, 0.22620453, 0.24454723]),
    ("The Matrix Resurrections", [0.34717246, -0.13820869, 0.29214213, 0.08090488]),
    ("Inception", [0.03923657, 0.39284106, -0.20927092, -0.17770818]),
    ("Interstellar", [-0.29302418, -0.39615033, -0.23393948, -0.09601383]),
    ("Avatar", [-0.13663386, 0.00635589, -0.03038832, -0.08252723]),
    ("Blade Runner", [0.27215557, -0.1479577, -0.09972772, -0.08234394]),
    ("Blade Runner 2049", [0.21560573, -0.07505179, -0.01331814, 0.13403069]),
    ("Minority Report", [0.24008012, 0.44954908, -0.30905488, 0.15195407]),
    ("Total Recall", [-0.17471036, 0.14695261, -0.06272433, -0.21795064]),
    ("Elysium", [-0.33280967, 0.07733926, 0.11015328, 0.53382836]),
    ("Gattaca", [-0.21629286, 0.31114665, 0.08303899, 0.46199759]),
    ("The Fifth Element", [-0.11528205, -0.0208782, -0.0735215, 0.14327449]),
    ("The Terminator", [0.33666933, 0.18040994, -0.01075103, -0.11117851]),
    ("Terminator 2: Judgment Day", [0.34698868, 0.06439331, 0.06232323, -0.19534876]),
    ("Jurassic Park", [0.01794725, -0.11434246, -0.46831815, -0.01049593]),
    ("The Avengers", [0.00546514, -0.37005171, -0.42612838, 0.07968612]),
]


@pytest.fixture(scope="module")
def age(spark):
    return AgeSession(spark)


@pytest.fixture(scope="module")
def movie_graph(spark, age):
    g = age.create_graph("pgvector_movies")
    parts = ", ".join(
        "(:Movie {title: %s, embedding: [%s]})"
        % (repr(t).replace("'", '"'), ", ".join(map(repr, e)))
        for t, e in MOVIES
    )
    return age.cypher(g, f"CREATE {parts}").graph


def test_scalar_and_operator_cases(age):
    g = age.create_graph("pgvector_scalars")
    # one chunked RETURN — dozens of cases, one Spark action
    exprs = ", ".join(f"{c} AS c{i}" for i, (c, _) in enumerate(SCALAR_CASES))
    row = age.cypher(g, f"RETURN {exprs}").df.collect()[0]
    for i, (expr, want) in enumerate(SCALAR_CASES):
        assert agtype_out(row[f"c{i}"]) == want, expr


def test_vector_cast_float4_print(age, movie_graph):
    """(m.embedding)::vector prints each element with float4
    shortest-roundtrip digits (pgvector.out:361-380 — 0.29592122 input
    becomes 0.2959212 after f32 storage)."""
    rows = age.cypher(
        movie_graph, "MATCH (m:Movie) RETURN m.title AS t, (m.embedding)::vector AS v"
    ).df.collect()
    got = {r.t: vector_out(r.v) for r in rows}
    assert got["The Matrix"] == "[-0.07594558,0.04081754,0.2959212,-0.11921061]"
    assert got["The Matrix Reloaded"] == "[0.30228978,-0.22839354,0.35070437,0.01262819]"
    assert got["Elysium"] == "[-0.33280966,0.07733926,0.11015328,0.5338284]"
    assert got["The Avengers"] == "[0.00546514,-0.3700517,-0.4261284,0.07968612]"


def test_vector_dims_over_table(age, movie_graph):
    rows = age.cypher(
        movie_graph, "MATCH (m:Movie) RETURN vector_dims(m.embedding) AS d"
    ).df.collect()
    assert len(rows) == 18 and all(r.d == 4 for r in rows)


TERMINATOR_TOP4 = [
    "The Terminator", "Terminator 2: Judgment Day", "Minority Report", "Blade Runner",
]
MATRIX_TOP4 = [
    "The Matrix", "The Matrix Reloaded", "The Matrix Resurrections", "Total Recall",
]


def _top4(age, g, order_expr, search):
    q = (
        'MATCH (m:Movie), (search:Movie {title: "%s"}) '
        "RETURN m.title AS t ORDER BY %s ASC LIMIT 4" % (search, order_expr)
    )
    return [r.t for r in age.cypher(g, q).df.collect()]


def test_similarity_search_sequence(age, movie_graph):
    """The Movie block in fixture order (pgvector.out:423-520): cosine
    searches over the raw embeddings, then SET l2_normalize(...)::agtype,
    then the l2 searches — which the reference runs on the NORMALIZED
    vectors (that is why Minority Report outranks Blade Runner 2049 on l2
    despite raw-l2 saying otherwise)."""
    for expr in (
        "cosine_distance(m.embedding, search.embedding)",
        "m.embedding::vector <=> search.embedding::vector",
        "m.embedding::vector(4) <=> search.embedding::vector(4)",
    ):
        assert _top4(age, movie_graph, expr, "The Terminator") == TERMINATOR_TOP4
        assert _top4(age, movie_graph, expr, "The Matrix") == MATRIX_TOP4

    r = age.cypher(
        movie_graph,
        "MATCH (m:Movie) SET m.embedding = l2_normalize(m.embedding)::agtype",
    )
    g = r.graph
    rows = age.cypher(g, "MATCH (m:Movie) RETURN m.title AS t, m.embedding AS e").df.collect()
    got = {r2.t: agtype_out(r2.e) for r2 in rows}
    # normalized float4 digits, byte-identical to pgvector.out:459
    assert got["The Matrix"] == "[-0.22980669, 0.12351139, 0.89543957, -0.36072403]"
    assert got["Interstellar"] == "[-0.5290723, -0.71527255, -0.4223914, -0.17335857]"
    assert got["Jurassic Park"] == "[0.037194606, -0.23696794, -0.9705615, -0.02175219]"

    for expr in (
        "l2_distance(m.embedding, search.embedding)",
        "m.embedding::vector OPERATOR (`<->`) search.embedding::vector",
    ):
        assert _top4(age, g, expr, "The Terminator") == TERMINATOR_TOP4
        assert _top4(age, g, expr, "The Matrix") == MATRIX_TOP4


def test_dimension_errors(age):
    g = age.create_graph("pgvector_errors")
    with pytest.raises(Exception, match="expected 2 dimensions, not 3"):
        age.cypher(g, "RETURN [1.22,2.22,3.33]::vector(2) AS v").df.collect()
    with pytest.raises(Exception, match="different vector dimensions"):
        age.cypher(g, 'RETURN l2_distance("[1,2]", "[1,2,3]") AS v').df.collect()
    with pytest.raises(Exception, match="at least 1 dimension"):
        age.cypher(g, 'RETURN subvector("[1,2,3]", 9, 2) AS v').df.collect()
