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
    "permission denied",  # PG role/GRANT machinery (age_load security tests)
    "row-level security",
    "check constraint",
)


_BOOL_RENDER = {"t": "true", "f": "false"}


def _fold_bools(rows):
    # a resultset declared `AS (r boolean)` renders agtype booleans through
    # PG bool ('t'/'f'); fold both spellings together for comparison
    return [tuple(_BOOL_RENDER.get(c, c) for c in r) for r in rows]


def _is_sql_level(c: dict) -> bool:
    msg = c.get("errmsg", "").lower()
    return any(p in msg for p in _SQL_LEVEL_ERR)


def _sp_lit(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, (int, float)):
        return repr(v)
    if isinstance(v, str):
        return '"' + v.replace('"', '\\"') + '"'
    if isinstance(v, list):
        return "[" + ", ".join(_sp_lit(x) for x in v) + "]"
    raise ValueError(f"unrenderable sp arg {v!r}")


_REF_REGRESS = "/root/reference/regress"


def _map_csv_path(p):
    """The suite's 'age_load/x.csv' paths live under regress/age_load/data/
    on disk; error-probing paths (missing files, traversal) pass through
    untouched so the loader's own validation fires."""
    import os

    if isinstance(p, str) and p.startswith("age_load/"):
        if not os.path.exists(os.path.join(_REF_REGRESS, p)):
            q = "age_load/data/" + p[len("age_load/"):]
            if os.path.exists(os.path.join(_REF_REGRESS, q)):
                return q
    return p


def _replay_ddl(age, graphs, graph_prefix, c, idx):
    """One SQL-level DDL/loader directive (create_graph, generators,
    load_*_from_file, create_subgraph) executed through the engine API."""
    expect_err = c.get("expect") == "error"
    if expect_err and _is_sql_level(c):
        return None  # PG role/GRANT/RLS machinery, not the engine's error
    fn, a = c["fn"], c["args"]
    age.csv_base_dir = _REF_REGRESS

    def g_of(name, create=True):
        if name is None:
            raise ValueError("graph name can not be NULL")
        if name not in graphs:
            if not create:
                raise ValueError(f'graph "{name}" does not exist')
            graphs[name] = age.create_graph(f"{graph_prefix}_{name}")
            age.graphs[name] = graphs[name]
        return graphs[name]

    try:
        if fn == "create_graph":
            g_of(a[0])
        elif fn == "drop_graph":
            graphs.pop(a[0], None)
            age.graphs.pop(a[0], None)
            age.ggc.discard(a[0])
        elif fn == "create_vlabel":
            g_of(a[0]).create_vlabel(a[1])
        elif fn == "create_elabel":
            g_of(a[0]).create_elabel(a[1])
        elif fn == "drop_label":
            g_of(a[0], create=False).drop_label(a[1])
        elif fn == "create_complete_graph":
            age.create_complete_graph(
                g_of(a[0]), a[1], a[2], a[3] if len(a) > 3 else None
            )
        elif fn == "age_create_barbell_graph":
            age.create_barbell_graph(g_of(a[0]), a[1], a[2], a[5], a[3])
        elif fn == "load_labels_from_file":
            age.load_labels_from_file(
                g_of(a[0]), a[1], _map_csv_path(a[2]),
                a[3] if len(a) > 3 else True,
                a[4] if len(a) > 4 else False,
                a[5] if len(a) > 5 else ",",
            )
        elif fn == "load_edges_from_file":
            age.load_edges_from_file(
                g_of(a[0]), a[1], _map_csv_path(a[2]),
                a[3] if len(a) > 3 else False,
                a[4] if len(a) > 4 else ",",
            )
        elif fn == "create_subgraph":
            if a[0] is None:
                raise ValueError("new graph name must not be NULL")
            ng = age.create_subgraph_filtered(
                g_of(a[1], create=False), f"{graph_prefix}_{a[0]}", a[2], a[3]
            )
            graphs[a[0]] = ng
            age.graphs[a[0]] = ng
            if expect_err:
                return f"[{idx}] ddl expected error, ran: {fn}"
            if c.get("vals"):
                want = _norm_ref_row(c["vals"][0])
                got = (
                    str(ng.scan_vertices(None).count()),
                    str(ng.scan_edges(None).count()),
                )
                if tuple(want) != got:
                    return f"[{idx}] subgraph counts {got} != {tuple(want)}"
            return None
        else:
            raise ValueError(f"unknown ddl function {fn}")
        if expect_err:
            return f"[{idx}] ddl expected error, ran: {fn}({a})"
    except Exception as ex:
        if not expect_err:
            return f"[{idx}] ddl {fn} raised {type(ex).__name__}: {str(ex)[:90]}"
    return None


def _replay_sp(age, graphs, graph_prefix, c, idx):
    """One age_shortest_path/age_all_shortest_paths SRF block: resolve the
    endpoint id-subqueries through the engine, then drive the CALL
    procedure and compare the path count."""
    expect_err = c.get("expect") == "error"
    gname = c.get("g")
    if gname is None:
        # invalid graph argument: the reference errors in the SRF
        return None if expect_err else f"[{idx}] sp: unknown graph {gname!r}"
    if gname not in graphs:
        if expect_err:
            return None  # unknown-graph error raised by the reference SRF
        # graphs created only via SQL-level create_graph() (sp_empty) are
        # materialized lazily like the main loop does
        graphs[gname] = age.create_graph(f"{graph_prefix}_{gname}")
        age.graphs[gname] = graphs[gname]
    g = graphs[gname]
    fn = "all_shortest_paths" if c["all"] else "shortest_path"
    try:
        ends = []
        for ep in (c["src"], c["dst"]):
            if isinstance(ep, dict) and "q" in ep:
                rows = age.cypher(g, ep["q"]).df.collect()
                ends.append(int(rows[0][0]) if len(rows) == 1 else None)
            elif isinstance(ep, int) or ep is None:
                ends.append(ep)
            else:
                # a non-id endpoint literal ('"not_a_vertex"') — the SRF
                # raises; mirror with an argument error
                raise ValueError(f"{fn}: start and end must be vertex ids")
        if ends[0] is None or ends[1] is None:
            # a NULL endpoint yields zero paths (strict SRF, 0 rows)
            if expect_err:
                return f"[{idx}] sp: expected error, ran: {c['q'][:80]}"
            want = c.get("n")
            if want not in (None, 0):
                return f"[{idx}] sp: paths 0 != {want}: {c['q'][:80]}"
            return None
        args = [_sp_lit(e) for e in ends] + [_sp_lit(x) for x in c.get("extra", [])]
        call = f"CALL {fn}({', '.join(args)}) YIELD src, dst, hops RETURN count(*) AS n"
        got = age.cypher(g, call).df.collect()[0][0]
        if expect_err:
            return f"[{idx}] sp: expected error, ran: {c['q'][:80]}"
        want = c.get("n")
        if want is not None and got != want:
            return f"[{idx}] sp: paths {got} != {want}: {c['q'][:80]}"
    except Exception as ex:
        if not expect_err:
            return f"[{idx}] sp raised {type(ex).__name__}: {str(ex)[:90]} | {c['q'][:70]}"
    return None


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
        if c.get("kind") == "sp":
            if c.get("q") in skip or f"{c.get('q')}#{idx}" in skip:
                continue
            f = _replay_sp(age, graphs, graph_prefix, c, idx)
            if f:
                failures.append(f)
            continue
        if c.get("kind") == "ddl":
            if c["fn"] in skip or f"{c['fn']}#{idx}" in skip:
                continue
            f = _replay_ddl(age, graphs, graph_prefix, c, idx)
            if f:
                failures.append(f)
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
            # ($param cases carry their EXECUTE-time parameter maps from the
            # extractor — a missing-parameter error is only ever correct
            # when the case EXPECTS the error, so no special skip here)
            if not expect_err:
                failures.append(
                    f"[{idx}] raised {type(ex).__name__}: {str(ex)[:100]} | {q[:80]}"
                )
    return failures
