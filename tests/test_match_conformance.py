"""MATCH conformance: the reference's cypher_match regression script
(regress/sql/cypher_match.sql, 1705 lines — fixture graphs, 400+ queries)
replayed in order against this engine.

`tests/data/cypher_match_cases.json` is auto-extracted from
regress/expected/cypher_match.out: each case pins the row count, the
value multiset when the output is id-free, or the fact that the reference
errors.  Graph state threads statement to statement exactly as the psql
script runs; prepared-statement cases replay with their EXECUTE-time
parameter maps.  Shared runner: tests/conformance_replay.py.
"""

import os

from conformance_replay import replay

CASES_PATH = os.path.join(os.path.dirname(__file__), "data", "cypher_match_cases.json")


def test_cypher_match_conformance(spark):
    failures = replay(spark, CASES_PATH, "cm")
    assert not failures, f"{len(failures)} conformance failures:\n" + "\n".join(failures[:25])
