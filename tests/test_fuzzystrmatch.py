"""fuzzystrmatch conformance: the reference exposes the extension's
phonetic functions inside Cypher (regress/sql/fuzzystrmatch.sql); expected
codes mined from regress/expected/fuzzystrmatch.out. soundex/levenshtein
ride the external-function fallthrough to Spark built-ins; difference and
metaphone are engine kernels (exprs.py / runtime/phonetic.py)."""

import pytest

from age_spark import AgeSession

NAMES = [
    "Jane", "John", "Jone", "Jack", "Jax", "Jake",
    "Julie", "Julius", "Jill", "Jillie", "Julian",
]
SOUNDEX = ["J500", "J500", "J500", "J200", "J200", "J200",
           "J400", "J420", "J400", "J400", "J450"]
LEV_JOHN = [3, 0, 2, 3, 3, 3, 4, 5, 3, 5, 4]
DIFF_JOHN = [4, 4, 4, 3, 3, 3, 3, 2, 3, 3, 2]
METAPHONE4 = ["JN", "JN", "JN", "JK", "JKS", "JK",
              "JL", "JLS", "JL", "JL", "JLN"]


@pytest.fixture(scope="module")
def person_graph(spark):
    age = AgeSession(spark)
    g = age.create_graph("fuzzy_people")
    parts = ", ".join('(:Person {name: "%s"})' % n for n in NAMES)
    return age, age.cypher(g, f"CREATE {parts}").graph


def _by_name(age, g, expr):
    rows = age.cypher(
        g, f"MATCH (p:Person) RETURN p.name AS n, {expr} AS v"
    ).df.collect()
    return {r.n: r.v for r in rows}

def test_soundex(person_graph):
    age, g = person_graph
    got = _by_name(age, g, "soundex(p.name)")
    assert got == dict(zip(NAMES, SOUNDEX))


def test_levenshtein(person_graph):
    age, g = person_graph
    got = _by_name(age, g, 'levenshtein(p.name, "John")')
    assert got == dict(zip(NAMES, LEV_JOHN))


def test_difference(person_graph):
    age, g = person_graph
    got = _by_name(age, g, 'difference(p.name, "John")')
    assert got == dict(zip(NAMES, DIFF_JOHN))


def test_metaphone(person_graph):
    age, g = person_graph
    got = _by_name(age, g, "metaphone(p.name, 4)")
    assert got == dict(zip(NAMES, METAPHONE4))


@pytest.mark.parametrize(
    "target, want",
    [
        # ORDER BY difference(...) DESC LIMIT 3 — the top-3 SET is pinned
        # (ties make the exact order backend-dependent; the reference's
        # printed order is its unstable-sort accident)
        ("Jon", {"Jane", "John", "Jone"}),
        ("Jak", {"Jack", "Jax", "Jake"}),
    ],
)
def test_difference_ranking(person_graph, target, want):
    age, g = person_graph
    rows = age.cypher(
        g,
        'MATCH (p:Person) RETURN p.name AS n '
        f'ORDER BY difference(p.name, "{target}") DESC LIMIT 3',
    ).df.collect()
    assert {r.n for r in rows} == want


def test_dmetaphone(person_graph):
    age, g = person_graph
    got = _by_name(age, g, "dmetaphone(p.name)")
    # expected/fuzzystrmatch.out dmetaphone block (identical codes to
    # metaphone(4) for these names)
    assert got == dict(zip(NAMES, METAPHONE4))


def test_dmetaphone_canonical_pairs():
    """Canonical primary/alternate pairs from the published algorithm."""
    from age_spark.runtime.phonetic import double_metaphone

    assert double_metaphone("Smith") == ("SM0", "XMT")
    assert double_metaphone("Schmidt") == ("XMT", "SMT")
    assert double_metaphone("Jose") == ("HS", "HS")
