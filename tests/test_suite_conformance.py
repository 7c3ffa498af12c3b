"""Full-script replay of the reference's regression suites (beyond
cypher_match, which has its own long-standing test): each suite's
expected-output file is extracted to cases (tests/gen_conformance_cases.py)
and replayed statement-by-statement in script order against one engine
session, pinning row counts, id-free value multisets, and expected errors.

Per-suite skips document the few cases a distributed engine cannot (or
should not) reproduce; everything else must match.
"""

import os

import pytest

from conformance_replay import replay

DATA = os.path.join(os.path.dirname(__file__), "data")

# query-text -> reason, consulted per case
SKIPS = {
    "cypher_with": {
        # the outer SQL resultset casts the value to a PG type before psql
        # prints it — boolean renders 't', a composite row decomposes the
        # vertex; both are outside the Cypher engine's print contract
        "WITH true AS b RETURN b": "outer-SQL bool cast renders 't'",
        "MATCH (n:Person) WITH n as m RETURN m ORDER BY id(m) ASC":
            "outer-SQL composite decomposition of the vertex",
    },
    "map_projection": {
        # collect() order inside a value: the reference's single-node heap
        # scan yields insertion order; a distributed engine cannot pin the
        # intra-array order without an explicit sort key
        "MATCH (a:Actor)-[:ACTED_IN]->(m:Movie) WITH a, collect(m { .title }) AS movies RETURN collect(a { .name, movies })":
            "collect() intra-array order is scan-order in the reference",
    },
}

SUITES = [
    "cypher_create",
    "cypher_delete",
    "cypher_set",
    "cypher_remove",
    "cypher_merge",
    "cypher_union",
    "cypher_unwind",
    "cypher_with",
    "list_comprehension",
    "map_projection",
    "pattern_expression",
    "predicate_functions",
    "age_reduce",
]


@pytest.mark.parametrize("suite", SUITES)
def test_suite_replay(spark, suite):
    fails = replay(
        spark,
        os.path.join(DATA, f"{suite}_cases.json"),
        f"sc_{suite[:10]}",
        SKIPS.get(suite),
    )
    assert not fails, f"{len(fails)} failures:\n" + "\n".join(fails[:25])
