"""pg_trgm parity (regress/sql/pg_trgm.sql): show_trgm / similarity /
word_similarity values pinned from expected/pg_trgm.out (the suite's value
blocks ride SQL-shaped columns, so the replay only runs them for state —
this test checks the numbers)."""

import pytest

from age_spark import AgeSession

NAMES = ["Jane", "John", "Jone", "Jack", "Jax", "Jake", "Julie", "Julius",
         "Jill", "Jillie", "Julian"]

# expected/pg_trgm.out similarity + word_similarity blocks (vs "Jon")
SIM = {"Jone": 0.5, "John": 0.2857143, "Jax": 0.14285715, "Jane": 0.125,
       "Jack": 0.125, "Jake": 0.125, "Jill": 0.125, "Julie": 0.11111111,
       "Julius": 0.1, "Julian": 0.1, "Jillie": 0.1}
WSIM = {"Jone": 0.6, "John": 0.4, "Jax": 0.25, "Jane": 0.2, "Jack": 0.2,
        "Jake": 0.2, "Jill": 0.2, "Julie": 0.16666667, "Julius": 0.14285715,
        "Julian": 0.14285715, "Jillie": 0.14285715}


@pytest.fixture(scope="module")
def trgm_graph(spark):
    age = AgeSession(spark)
    g = age.create_graph("pgtrgm")
    for n in NAMES:
        g = age.cypher(g, f'CREATE (:Person {{name: "{n}"}})').graph
    return age, g


def test_show_trgm(trgm_graph):
    age, g = trgm_graph
    got = age.cypher(g, 'RETURN show_trgm("Jane") AS t').df.collect()[0][0]
    assert got == ["  j", " ja", "ane", "jan", "ne "]
    # multi-word input pads each word separately
    got2 = age.cypher(g, 'RETURN show_trgm("a b") AS t').df.collect()[0][0]
    assert got2 == ["  a", "  b", " a ", " b "]


def test_similarity_values(trgm_graph):
    age, g = trgm_graph
    rows = age.cypher(
        g, 'MATCH (p) RETURN p.name AS n, similarity(p.name, "Jon") AS s'
    ).df.collect()
    assert len(rows) == len(NAMES)
    for r in rows:
        assert r[1] == pytest.approx(SIM[r[0]], abs=1e-6), r[0]


def test_word_similarity_values(trgm_graph):
    age, g = trgm_graph
    rows = age.cypher(
        g, 'MATCH (p) RETURN p.name AS n, word_similarity(p.name, "Jon") AS s'
    ).df.collect()
    for r in rows:
        assert r[1] == pytest.approx(WSIM[r[0]], abs=1e-6), r[0]


def test_word_similarity_multiword_doc_values(trgm_graph):
    """PostgreSQL pg_trgm documentation's canonical triple for
    ('word', 'two words'): extents walk the second string's trigram
    sequence in STRING order (calc_word_similarity), so the best
    non-strict extent is '  w',' wo','wor','ord' inside 'words'."""
    age, g = trgm_graph
    row = age.cypher(
        g,
        "RETURN similarity('word', 'two words') AS s, "
        "word_similarity('word', 'two words') AS w, "
        "strict_word_similarity('word', 'two words') AS t",
    ).df.collect()[0]
    assert row[0] == pytest.approx(0.36363637, abs=1e-6)
    assert row[1] == pytest.approx(0.8, abs=1e-6)
    assert row[2] == pytest.approx(0.571429, abs=1e-5)


def test_strict_word_similarity_word_bounds(trgm_graph):
    age, g = trgm_graph
    # single-word second argument: the strict extent is the WHOLE word
    # ('Jon' -> 4 trigrams, 3 shared with 'Jone''s 5: 3/(5+4-3) = 0.5),
    # while non-strict may stop mid-word ('  j',' jo','jon': 3/(5+3-3))
    row = age.cypher(
        g,
        "RETURN strict_word_similarity('Jone', 'Jon') AS a, "
        "word_similarity('Jone', 'Jon') AS b, "
        "strict_word_similarity('', 'x') AS empty",
    ).df.collect()[0]
    assert row[0] == pytest.approx(0.5, abs=1e-6)
    assert row[1] == pytest.approx(0.6, abs=1e-6)
    assert row[2] == 0.0
