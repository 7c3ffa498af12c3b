"""Replicates the driver's t2 correctness gate locally: every queries()
entry that has an oracle_sql() twin must match DuckDB on sf0.01 —
row count, column names, and values (order-insensitive)."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def _norm_val(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, (list, tuple)):
        return tuple(_norm_val(x) for x in v)
    return v


def _norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_val(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(x)) for x in t))
    return [cols[i] for i in order], out


ORACLES = entry_mod.oracle_sql()
QUERIES = entry_mod.queries()


# int-vs-float column dtype divergence passes a pure == compare (3 == 3.0)
# but fails the driver's value-hash serialization (DuckDB HUGEINT surfaces
# as float64 there, VERDICT r7 "What's wrong" #1) — so classify numeric
# kinds on both sides and fail the oracle when they disagree.
_DUCK_INT = {"TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"}
_DUCK_FLT = {"FLOAT", "DOUBLE", "HUGEINT"}  # HUGEINT -> float64 in the driver
_SPARK_INT = {"tinyint", "smallint", "int", "bigint"}
_SPARK_FLT = {"float", "double"}


def _num_kind(t, int_set, flt_set):
    t = str(t).lower() if t is not None else ""
    if t.upper() in int_set or t in int_set:
        return "i"
    if t.upper() in flt_set or t in flt_set:
        return "f"
    return None


def _check_oracle(spark, name):
    assert name in QUERIES, f"oracle {name} has no queries() entry"
    sdf = QUERIES[name](spark, SF_DIR)
    s_cols = sdf.columns
    s_kinds = {c: _num_kind(t, _SPARK_INT, _SPARK_FLT) for c, t in sdf.dtypes}
    s_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    rel = con.sql(ORACLES[name])
    d_cols = list(rel.columns)
    d_kinds = {c: _num_kind(t, _DUCK_INT, _DUCK_FLT)
               for c, t in zip(rel.columns, rel.types)}
    d_rows = rel.fetchall()
    con.close()

    kind_bad = [
        c for c in s_cols
        if c in d_kinds and s_kinds.get(c) and d_kinds.get(c)
        and s_kinds[c] != d_kinds[c]
    ]
    assert not kind_bad, (
        f"{name}: int-vs-float column dtype mismatch (would fail the driver "
        f"hash): {[(c, s_kinds[c], d_kinds[c]) for c in kind_bad]}"
    )

    sc, sr = _norm_rows(s_cols, s_rows)
    dc, dr = _norm_rows(d_cols, d_rows)
    assert sc == dc, f"{name}: column mismatch {sc} vs {dc}"
    assert len(sr) == len(dr), f"{name}: row count {len(sr)} vs {len(dr)}"
    mismatches = [(a, b) for a, b in zip(sr, dr) if a != b]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches; first: {mismatches[:3]}"


# each oracle costs py4j/compile LATENCY, not CPU: thread-pool them like
# the conformance batch (SPARK_GRAFT_SERIAL_SUITES=1 for per-name tests)
if os.environ.get("SPARK_GRAFT_SERIAL_SUITES") == "1":

    @pytest.mark.parametrize("name", sorted(ORACLES))
    def test_oracle_match(spark, name):
        _check_oracle(spark, name)

else:

    def test_oracle_match_pooled(spark):
        from concurrent.futures import ThreadPoolExecutor

        def run(name):
            try:
                _check_oracle(spark, name)
                return None
            except Exception as ex:  # noqa: BLE001 — collected and re-raised
                return f"{name}: {ex}"

        with ThreadPoolExecutor(max_workers=8) as ex:
            fails = [f for f in ex.map(run, sorted(ORACLES)) if f]
        assert not fails, f"{len(fails)} oracle mismatches:\n" + "\n".join(fails)


def test_driver_window_contract():
    """The driver's correctness gate reads only the FIRST 50 queries()
    keys: graph entries lead the window, every window slot must carry an
    oracle (a slot without one wastes a rotation round), and any g_*
    rotated out for the round (r10: 20 stable entries displaced so all 31
    never-rechecked oracled pipeline entries fit) must sit immediately
    after the window so they re-enter cheaply next round."""
    keys = list(QUERIES)
    window = keys[:50]
    n_graph = sum(1 for k in window if k.startswith("g_"))
    assert window[:n_graph] == [k for k in window if k.startswith("g_")]
    missing = [k for k in window if k not in ORACLES]
    assert not missing, f"window entries without an oracle: {missing}"
    displaced = [k for k in keys if k.startswith("g_") and k not in set(window)]
    assert keys[50:50 + len(displaced)] == displaced


def test_rows_only_queries_run(spark):
    """Entries without an oracle still must run and return a DataFrame."""
    from concurrent.futures import ThreadPoolExecutor

    names = [n for n in QUERIES if n not in ORACLES]

    def run(name):
        df = QUERIES[name](spark, SF_DIR)
        return None if df.count() >= 0 else name

    with ThreadPoolExecutor(max_workers=8) as ex:
        fails = [f for f in ex.map(run, names) if f]
    assert not fails, fails


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
