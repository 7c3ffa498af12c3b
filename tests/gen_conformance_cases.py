"""Extract replayable conformance cases from the reference's regression
expected-output files (regress/expected/*.out).

Each psql block becomes one case:
  - `SELECT ... FROM cypher('g', $$ <q> $$)` -> row count, plus the value
    multiset when every output cell is id-free (no graphids embedded)
  - `SELECT count(*) FROM cypher(...)`      -> the outer SQL count
  - blocks followed by ERROR:               -> expected-error case
  - `SET age.enable_containment = on|off`   -> replay directive
Everything else (PREPARE/EXECUTE, catalog calls) is dropped — those are
SQL-level plumbing with dedicated tests.

Usage:  python tests/gen_conformance_cases.py <name.out> [<name2.out> ...]
Writes tests/data/<name>_cases.json. Runner: tests/conformance_replay.py.
"""

import json
import os
import re
import sys

REF = "/root/reference/regress/expected"
OUT_DIR = os.path.join(os.path.dirname(__file__), "data")


def _norm_q(q: str) -> str:
    """Collapse whitespace OUTSIDE string literals only — a naive
    split/join would destroy values like split('a,b,cd  e,f', ' ').
    Comments are stripped FIRST (joining lines would otherwise let a //
    comment swallow the rest of the query)."""
    out: list[str] = []
    i, n = 0, len(q)
    quote = None
    while i < n:
        ch = q[i]
        if quote is None and ch == "/" and i + 1 < n and q[i + 1] == "/":
            while i < n and q[i] != "\n":
                i += 1
            continue
        if quote is None and ch == "/" and i + 1 < n and q[i + 1] == "*":
            j = q.find("*/", i + 2)
            i = n if j < 0 else j + 2
            continue
        if quote:
            out.append(ch)
            if ch == "\\" and i + 1 < n:
                out.append(q[i + 1])
                i += 1
            elif ch == quote:
                quote = None
        elif ch in "'\"":
            quote = ch
            out.append(ch)
        elif ch.isspace():
            if out and out[-1] != " ":
                out.append(" ")
            while i + 1 < n and q[i + 1].isspace():
                i += 1
        else:
            out.append(ch)
        i += 1
    return "".join(out).strip()


def _sql_shaped(stmt_text: str) -> bool:
    """True when the OUTER SQL transforms the cypher() resultset — a
    column definition list with non-agtype types (PG casts the values:
    ints, json, float8...) or a SELECT target list that is not `*` /
    count(*) (the block's output is a SQL expression over the results).
    Such blocks pin PG-rendered values the engine should not reproduce."""
    m = re.search(r"\bAS\s+(?:\w+\s*)?\(([^()]*)\)\s*;?\s*$", stmt_text, re.I | re.S)
    boolcol = False
    if m:
        for coldef in m.group(1).split(","):
            parts = coldef.strip().split()
            if len(parts) >= 2 and parts[-1].lower() not in ("agtype", "bool", "boolean"):
                return True
            if len(parts) >= 2 and parts[-1].lower() in ("bool", "boolean"):
                boolcol = True
    if re.match(r"SELECT\s+count\(\*\)", stmt_text, re.I):
        return False
    if not re.match(r"SELECT\s+\*\s+FROM", stmt_text, re.I):
        return True
    # outer-SQL WHERE filters the resultset — but only OUTSIDE the $$...$$
    # cypher body (a WHERE inside the query is the engine's own clause)
    if re.search(r"\bWHERE\b", stmt_text.rsplit("$$", 1)[-1], re.I):
        return True
    if stmt_text.count("cypher(") > 1:
        return True  # outer-SQL join of several cypher() calls
    # a bool column definition renders t/f and turns agtype cast errors
    # into PG bool-cast errors — weaker reshaping, flagged separately
    return "bool" if boolcol else False


def extract(path: str) -> list[dict]:
    lines = open(path).read().split("\n")
    i = 0
    cases: list[dict] = []
    prepared: dict[str, tuple[str, str]] = {}  # PREPARE name -> (graph, q)
    functions: dict[str, tuple[str, str]] = {}  # plpgsql fn name -> (graph, q)
    while i < len(lines):
        ln = lines[i]
        if ln.startswith("CREATE FUNCTION"):
            # single-cypher-query plpgsql wrappers (e.g. delete_test()):
            # remember the inner query; a later SELECT ... <name>() replays it.
            # The statement ends at a `;` OUTSIDE $BODY$ quoting — a plain
            # SQL-language function (cypher_call.sql add_agtype) has no
            # $BODY$ at all, so scanning for "$BODY$;" alone would swallow
            # the rest of the file.
            mfn = re.match(r"CREATE FUNCTION\s+([\w.]+)\s*\(", ln)
            body = []
            nbody = 0
            while i < len(lines):
                nbody += lines[i].count("$BODY$")
                body.append(lines[i])
                done = lines[i].rstrip().endswith(";") and nbody % 2 == 0
                i += 1
                if done:
                    break
            mcy = re.search(r"cypher\('([^']+)'\s*,\s*\$\$(.*?)\$\$", "\n".join(body), re.S)
            if mfn and mcy:
                functions[mfn.group(1)] = (mcy.group(1), _norm_q(mcy.group(2)))
            continue
        if ln.startswith("EXPLAIN"):
            # EXPLAIN blocks: skip the statement AND its QUERY PLAN output —
            # otherwise the scanner picks up the wrapped SELECT on the next
            # line and pairs it with the plan's row count (expr.out:10128)
            while i < len(lines) and not lines[i].rstrip().endswith(";"):
                i += 1
            i += 1
            while i < len(lines) and not re.match(r"\(\d+ rows?\)", lines[i]):
                i += 1
            i += 1
            continue
        if not ln.startswith(("SELECT", "PREPARE", "EXECUTE", "SET ")):
            i += 1
            continue
        stmt = [ln]
        i += 1
        while not stmt[-1].rstrip().endswith(";") and i < len(lines):
            stmt.append(lines[i])
            i += 1
        stmt_text = "\n".join(stmt)
        res_start = i
        nrows = None
        err = False
        errmsg = ""
        values: list[str] = []
        while i < len(lines):
            l2 = lines[i]
            if l2.startswith("ERROR:"):
                err = True
                errmsg = l2[len("ERROR:"):].strip()
                i += 1
                while i < len(lines) and lines[i].startswith(
                    ("LINE", "HINT", "DETAIL", "CONTEXT", "^", " ")
                ):
                    i += 1
                break
            m = re.match(r"\((\d+) rows?\)", l2)
            if m:
                nrows = int(m.group(1))
                i += 1
                data = lines[res_start : i - 1]
                for k, d in enumerate(data):
                    if set(d.strip()) <= set("-+") and d.strip():
                        values = [x.strip() for x in data[k + 1 :]]
                        break
                break
            if l2.startswith(("SELECT", "PREPARE", "EXECUTE", "SET ")) or l2.startswith("-- "):
                break
            i += 1

        mset = re.match(r"SET\s+age\.enable_containment\s*=\s*(on|off)", stmt_text)
        if mset:
            cases.append({"kind": "containment", "on": mset.group(1) == "on"})
            continue
        mddl = re.search(
            r"\b(?:ag_catalog\.)?(" + "|".join(_DDL_FNS) + r")\s*\(", stmt_text
        )
        if mddl and stmt_text.startswith("SELECT") and "cypher(" not in stmt_text:
            start = stmt_text.index("(", mddl.end() - 1)
            depth, k = 0, start
            while k < len(stmt_text):
                if stmt_text[k] == "(":
                    depth += 1
                elif stmt_text[k] == ")":
                    depth -= 1
                    if depth == 0:
                        break
                k += 1
            c = {
                "kind": "ddl",
                "fn": mddl.group(1),
                "args": [
                    _parse_ddl_arg(a)
                    for a in _split_top_commas(stmt_text[start + 1 : k])
                ],
            }
            if err:
                c["expect"] = "error"
                c["errmsg"] = errmsg
            elif values and mddl.group(1) == "create_subgraph":
                # `SELECT node_count, relationship_count FROM
                # create_subgraph(...)` pins the new graph's sizes
                c["vals"] = values
            cases.append(c)
            continue
        msp = re.search(
            r"FROM\s+(?:ag_catalog\.)?age_(all_)?shortest_paths?\s*\(", stmt_text, re.I
        )
        if msp:
            c = _parse_sp_case(stmt_text, msp)
            if c is not None:
                _finish_case(c, err, errmsg, stmt_text, values, nrows)
                cases.append(c)
            continue
        m = re.search(r"cypher\('([^']+)'\s*,\s*\$\$(.*?)\$\$", stmt_text, re.S)
        params = None
        if m and stmt_text.startswith("PREPARE"):
            mp = re.match(r"PREPARE\s+(\w+)", stmt_text)
            if mp:
                prepared[mp.group(1)] = (m.group(1), _norm_q(m.group(2)))
            # a PREPARE block has no execution result of its own — the
            # EXECUTE blocks replay it below
            continue
        if not m and stmt_text.startswith("EXECUTE"):
            me = re.match(r"EXECUTE\s+(\w+)\s*(?:\(\s*'(.*)'\s*\))?\s*;", stmt_text, re.S)
            if me and me.group(1) in prepared:
                gname, q0 = prepared[me.group(1)]
                m = None
                c = {"g": gname, "q": q0}
                if me.group(2):
                    try:
                        params = json.loads(me.group(2))
                    except ValueError:
                        continue
                    c["params"] = params
                _finish_case(c, err, errmsg, stmt_text, values, nrows)
                cases.append(c)
            continue
        if not m:
            # SELECT [* FROM] fn(); of a remembered single-cypher function
            mf = re.match(r"SELECT\s+(?:\*\s+FROM\s+)?(\w+)\s*\(\s*\)", stmt_text)
            if mf and mf.group(1) in functions:
                gname, q0 = functions[mf.group(1)]
                c = {"g": gname, "q": q0}
                _finish_case(c, err, errmsg, stmt_text, values, nrows)
                cases.append(c)
            continue
        q = _norm_q(m.group(2))
        c: dict = {"g": m.group(1), "q": q}
        shape = _sql_shaped(stmt_text)
        if shape is True:
            c["sqlshape"] = True
        elif shape == "bool":
            c["boolcol"] = True
        _finish_case(c, err, errmsg, stmt_text, values, nrows)
        cases.append(c)
    return cases


# SQL-level DDL/loader functions replayed as directives (the generic path
# only extracts cypher() blocks; these create the graphs those blocks read)
_DDL_FNS = (
    "create_graph",
    "drop_graph",
    "create_vlabel",
    "create_elabel",
    "drop_label",
    "create_complete_graph",
    "age_create_barbell_graph",
    "load_labels_from_file",
    "load_edges_from_file",
    "create_subgraph",
)


def _parse_ddl_arg(a: str):
    """One SQL literal argument: 'str' (with '' escapes), $tag$str$tag$,
    int, bool, NULL; anything else kept raw-marked."""
    a = a.strip().rstrip(";").strip()
    if re.match(r"NULL$", a, re.I):
        return None
    if re.match(r"true$", a, re.I):
        return True
    if re.match(r"false$", a, re.I):
        return False
    m = re.match(r"'(.*)'$", a, re.S)
    if m:
        return m.group(1).replace("''", "'")
    m = re.match(r"(\$\w*\$)(.*)\1$", a, re.S)
    if m:
        return m.group(2)
    m = re.match(r"-?\d+$", a)
    if m:
        return int(a)
    return {"raw": a}


def _split_top_commas(s: str) -> list[str]:
    """Split on commas at paren/bracket depth 0, respecting single quotes."""
    out, depth, quote, cur = [], 0, False, []
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == "'":
                quote = False
            continue
        if ch == "'":
            quote = True
            cur.append(ch)
        elif ch in "([":
            depth += 1
            cur.append(ch)
        elif ch in ")]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


def _parse_sp_arg(a: str):
    """One age_shortest_path argument: an agtype literal or an inner cypher
    id-subquery.  Returns a JSON-able value; {'q': ...} marks a subquery."""
    a = a.strip().rstrip(";").strip()
    if re.match(r"NULL(\s*::\s*agtype)?$", a, re.I):
        return None
    mq = re.search(r"cypher\('([^']+)'\s*,\s*\$\$(.*?)\$\$", a, re.S)
    if mq:
        return {"q": _norm_q(mq.group(2))}
    mlit = re.match(r"'(.*)'\s*::\s*agtype$", a, re.S)
    if mlit:
        body = mlit.group(1).strip()
        try:
            return json.loads(body)
        except ValueError:
            return {"raw": body}
    mint = re.match(r"(-?\d+)\s*::\s*agtype$", a)
    if mint:
        return int(mint.group(1))
    return {"raw": a}


def _parse_sp_case(stmt_text: str, msp) -> "dict | None":
    """age_shortest_path / age_all_shortest_paths SRF block
    (age_vle.c:2807: graph, start, end [, edge_types [, direction
    [, min_hops [, max_hops]]]]).  Endpoints are usually inner cypher
    id-subqueries; the replay resolves them through the engine and drives
    CALL shortest_path/all_shortest_paths."""
    start = stmt_text.index("(", msp.end() - 1)
    depth, i = 0, start
    while i < len(stmt_text):
        if stmt_text[i] == "(":
            depth += 1
        elif stmt_text[i] == ")":
            depth -= 1
            if depth == 0:
                break
        i += 1
    args = _split_top_commas(stmt_text[start + 1 : i])
    if len(args) < 3:
        return None
    parsed = [_parse_sp_arg(a) for a in args]
    g = parsed[0] if isinstance(parsed[0], str) else None
    c: dict = {
        "kind": "sp",
        "all": bool(msp.group(1)),
        "g": g,
        "src": parsed[1],
        "dst": parsed[2],
        "extra": parsed[3:7],
        "q": stmt_text.split("\n", 1)[0][:120],  # display text for messages
    }
    if g is None:
        c["graph_arg"] = parsed[0]
    return c


def _finish_case(c: dict, err, errmsg, stmt_text, values, nrows) -> None:
    if err:
        c["expect"] = "error"
        c["errmsg"] = errmsg
    elif re.match(r"SELECT\s+count\(\*\)", stmt_text, re.I):
        c["n"] = int(values[0]) if values else None
    else:
        c["n"] = nrows
        idfree = values and len(values) == (nrows or -1) and all(
            "::vertex" not in v and "::edge" not in v and "::path" not in v
            and '"id"' not in v
            for v in values
        )
        if idfree and nrows is not None and nrows <= 40:
            c["vals"] = values


def main(names: list[str]) -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for name in names:
        src = os.path.join(REF, name)
        cases = extract(src)
        base = name[: -len(".out")] if name.endswith(".out") else name
        dst = os.path.join(OUT_DIR, f"{base}_cases.json")
        json.dump(cases, open(dst, "w"), indent=0)
        nerr = sum(1 for c in cases if c.get("expect") == "error")
        nval = sum(1 for c in cases if "vals" in c)
        print(f"{base}: {len(cases)} cases ({nerr} errors, {nval} value-pinned) -> {dst}")


if __name__ == "__main__":
    main(sys.argv[1:])
