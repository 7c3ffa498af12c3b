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


def extract(path: str) -> list[dict]:
    lines = open(path).read().split("\n")
    i = 0
    cases: list[dict] = []
    while i < len(lines):
        ln = lines[i]
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
        values: list[str] = []
        while i < len(lines):
            l2 = lines[i]
            if l2.startswith("ERROR:"):
                err = True
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
        m = re.search(r"cypher\('([^']+)'\s*,\s*\$\$(.*?)\$\$", stmt_text, re.S)
        if not m:
            continue
        q = " ".join(m.group(2).split())
        c: dict = {"g": m.group(1), "q": q}
        if err:
            c["expect"] = "error"
        elif re.match(r"SELECT\s+count\(\*\)", stmt_text):
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
        cases.append(c)
    return cases


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
