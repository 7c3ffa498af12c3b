"""Shared replay runner for the reference's regression scripts.

`tests/gen_conformance_cases.py` extracts each psql block of a
regress/expected/*.out file into a case (query text, row count, value
multiset when id-free, or expected error).  `replay()` runs the cases in
script order against one AgeSession, threading graph state statement to
statement exactly as the psql script does, and returns the list of
mismatches.  Suite-specific engine-model differences are passed as a
query-text -> reason skip map and consulted per case.
"""

import json
import re as _re

from age_spark import AgeSession
from age_spark.runtime.agvalue import agtype_out


def _norm_ref_row(s: str):
    # psql column separator is " | " (padded); a bare "|" can appear INSIDE
    # a value ('a1|b1'), so split only on the padded form.  An EMPTY
    # trailing/leading cell leaves a bare "... |" / "| ..." after psql's
    # right-padding is stripped — restore those cells explicitly.
    s = s.strip()
    if set(s) <= {"|", " "}:
        # every cell empty: the row is just separators ("|" for two cells)
        return tuple("" for _ in range(s.count("|") + 1))
    cells = s.split(" | ")
    if cells and cells[-1].endswith(" |"):
        cells[-1] = cells[-1][:-2].rstrip()
        cells.append("")
    if cells and cells[0].startswith("| "):
        cells[0] = cells[0][2:].lstrip()
        cells.insert(0, "")
    return tuple(c.strip() for c in cells)


def _norm_our_row(row):
    out = []
    for v in row:
        fv = agtype_out(v)
        # no whitespace collapsing: string VALUES may legitimately hold
        # runs of spaces (lTrim("  string   ") keeps its trailing ones)
        out.append("" if fv is None else fv.strip())
    return tuple(out)


# expected-error messages that come from the OUTER psql/SQL layer, not the
# Cypher engine (the extractor keeps only the inner $$...$$ query, so these
# cases would ask the engine to reproduce an error PostgreSQL raised about
# resultset column definitions / prepared statements)
_SQL_LEVEL_ERR = (
    "column definition list",
    "parameter",
    "prepared statement",
    "syntax error at or near",  # outer-SQL syntax, not cypher
    "cannot be rescanned",  # PG executor rescan limitation of the cypher() SRF
    "row and column definition list do not match",  # resultset arity
    "rows from is not supported",  # cypher() SRF placement rules
    "with ordinality is not supported",
    "in expressions is not supported",
    "cannot cast type agtype to",  # outer resultset column cast
    "does not exist",  # graph addressing — the replay creates graphs lazily
    "could not find rte for c",  # outer-SQL alias, not a cypher variable
)


_BOOL_RENDER = {"t": "true", "f": "false"}


def _fold_bools(rows):
    # a resultset declared `AS (r boolean)` renders agtype booleans through
    # PG bool ('t'/'f'); fold both spellings together for comparison
    return [tuple(_BOOL_RENDER.get(c, c) for c in r) for r in rows]


def _is_sql_level(c: dict) -> bool:
    msg = c.get("errmsg", "").lower()
    return any(p in msg for p in _SQL_LEVEL_ERR)


def replay(spark, cases_path: str, graph_prefix: str, skip: dict[str, str] | None = None):
    """Run every case in `cases_path` in order; return failure strings."""
    skip = skip or {}
    cases = json.load(open(cases_path))
    # mutable_graphs: the reference's lifecycle — a long replay would
    # otherwise pin one superseded snapshot per write statement
    age = AgeSession(spark, mutable_graphs=True)
    graphs = {}
    failures = []
    for idx, c in enumerate(cases):
        if c.get("kind") == "containment":
            age.enable_containment = c["on"]
            continue
        gname, q = c["g"], c["q"]
        # skips key by query text, or by "text#index" when the same text
        # appears several times and only one occurrence is engine-bounded
        if q in skip or f"{q}#{idx}" in skip:
            continue
        expect_err = c.get("expect") == "error"
        if expect_err and (_is_sql_level(c) or c.get("sqlshape")):
            continue  # outer-SQL error (column def list / PREPARE), not ours
        if (
            expect_err
            and c.get("boolcol")
            and "cannot cast agtype" in c.get("errmsg", "")
            and not _re.search(r"\b(AND|OR|XOR|NOT)\b", c["q"], _re.I)
        ):
            # the PG bool column cast raised, not the Cypher engine (the
            # query has no boolean operator of its own)
            continue
        if c.get("sqlshape"):
            # the outer SQL reshapes the resultset (casting column
            # definitions, computed target lists, outer WHERE, joins of
            # several cypher() calls): the query still EXECUTED in the
            # reference (side effects committed), but neither its row
            # count nor its values survive the reshaping — run it for
            # state, check nothing
            c = {k: v for k, v in c.items() if k not in ("vals", "n")}
        if gname not in graphs:
            graphs[gname] = age.create_graph(f"{graph_prefix}_{gname}")
            # alias the script's BARE graph name in the session catalog so
            # name-addressed functions (graph_stats('g')) resolve it
            age.graphs[gname] = graphs[gname]
        g = graphs[gname]
        try:
            r = age.cypher(g, q, c.get("params"))
            rows = r.df.collect() if r.df is not None else []
            graphs[gname] = r.graph
            if expect_err:
                failures.append(f"[{idx}] expected error, ran: {q[:90]}")
                continue
            if q.upper().startswith("EXPLAIN"):
                if not rows:
                    failures.append(f"[{idx}] empty plan: {q[:90]}")
                continue
            n = c.get("n")
            if n is not None and len(rows) != n:
                failures.append(f"[{idx}] rows {len(rows)} != {n}: {q[:90]}")
                continue
            if "vals" in c:
                want = sorted(_norm_ref_row(v) for v in c["vals"])
                got = sorted(_norm_our_row(row) for row in rows)
                if want != got and _fold_bools(want) != _fold_bools(got):
                    failures.append(
                        f"[{idx}] values differ ({got[:2]}... vs {want[:2]}...): {q[:80]}"
                    )
        except Exception as ex:
            if "not supplied" in str(ex) and "$" in q:
                continue  # $param case; the replay has no parameter channel
            if not expect_err:
                failures.append(
                    f"[{idx}] raised {type(ex).__name__}: {str(ex)[:100]} | {q[:80]}"
                )
    return failures
