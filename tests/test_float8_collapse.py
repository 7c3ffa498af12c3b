"""Reference parity for >2^53 int-vs-float comparison (VERDICT r7 #5).

The reference's compare_agtype_scalar_values (agtype_util.c:333) compares
an int64 against a float8 by casting the int to float8, so
`9223372036854775807 = 9.223372036854776e18` is TRUE there.  That collapse
is non-transitive above 2^53, so it cannot live in a total-order sort key;
the engine applies it per comparison PAIR in the dynamic lanes
(graph.py pair_float8_collapse_string_keys / ladder_keys_float8_collapse /
float8_collapse_eq_pair) while ORDER BY keeps the exact total order
(COVERAGE.md records the residual).
"""

from concurrent.futures import ThreadPoolExecutor

from age_spark import AgeSession

I64MAX = "9223372036854775807"
F8 = "9.223372036854776e18"  # float8 nearest to int64 max

CASES = [
    # tagged-vs-tagged scalar lane (list elements are dynamically tagged)
    (f"WITH [{I64MAX}, {F8}] AS xs RETURN xs[0] = xs[1] AS r", True),
    (f"WITH [{I64MAX}, {F8}] AS xs RETURN xs[1] = xs[0] AS r", True),
    (f"WITH [{I64MAX}, {F8}] AS xs RETURN xs[0] < xs[1] AS r", False),
    (f"WITH [{I64MAX}, {F8}] AS xs RETURN xs[0] <= xs[1] AS r", True),
    (f"WITH [{I64MAX}, {F8}] AS xs RETURN xs[0] <> xs[1] AS r", False),
    # IN membership, both orientations (exists-based collapse OR)
    (f"RETURN {F8} IN [{I64MAX}] AS r", True),
    (f"RETURN {I64MAX} IN [{F8}] AS r", True),
    (f"RETURN {I64MAX} IN [1.5] AS r", False),
    ("RETURN 5 IN [null] AS r", None),
    ("RETURN 2 IN [1, 2.0, 3] AS r", True),
    # plain-vs-tagged ladder lanes (one side statically typed)
    (f"WITH [{F8}] AS xs RETURN {I64MAX} = xs[0] AS r", True),
    (f"WITH [{I64MAX}] AS xs RETURN {F8} = xs[0] AS r", True),
    (f"WITH [{I64MAX}] AS xs RETURN xs[0] = {F8} AS r", True),
    (f"WITH [{I64MAX}] AS xs RETURN xs[0] < {F8} AS r", False),
    # in-lambda (HOF) comparison contexts use the JVM string keys
    (f"RETURN all(x IN [{I64MAX}] WHERE x = {F8}) AS r", True),
    (f"RETURN [x IN [{I64MAX}, 5] WHERE x = {F8}] AS r", [9223372036854775807]),
    # below 2^53 the collapse agrees with the exact keys — unchanged
    ("WITH [1, 1.0] AS xs RETURN xs[0] = xs[1] AS r", True),
    ("WITH [2, 2.5] AS xs RETURN xs[0] < xs[1] AS r", True),
    ("WITH [2, 'a'] AS xs RETURN xs[0] = xs[1] AS r", False),
    # NUMERIC operands never collapse: int-vs-numeric is numeric_cmp
    (f"WITH [{I64MAX}] AS xs RETURN xs[0] = {I64MAX}::numeric AS r", True),
    (f"WITH [{F8}] AS xs RETURN xs[0] = {I64MAX}::numeric AS r", False),
    # float8 specials through the collapse: NaN sorts largest (PG float8
    # comparator), infinities bracket every int, -0.0 equals 0
    ("WITH [5, toFloat('NaN')] AS xs RETURN xs[0] < xs[1] AS r", True),
    ("WITH [5, toFloat('NaN')] AS xs RETURN xs[0] = xs[1] AS r", False),
    ("WITH [5, toFloat('Infinity')] AS xs RETURN xs[0] < xs[1] AS r", True),
    ("WITH [5, toFloat('-Infinity')] AS xs RETURN xs[1] < xs[0] AS r", True),
    ("WITH [0, -0.0] AS xs RETURN xs[0] = xs[1] AS r", True),
]


def test_float8_collapse_parity(spark):
    age = AgeSession(spark)
    g = age.create_graph("f8_collapse")
    g = age.load_vertices(
        g, "N", spark.createDataFrame([(1,)], "id long"), id_col="id"
    )

    def run(case):
        q, want = case
        got = age.cypher(g, q).df.collect()[0].r
        return None if got == want else f"{q}: got {got!r}, want {want!r}"

    with ThreadPoolExecutor(max_workers=8) as ex:
        fails = [f for f in ex.map(run, CASES) if f]
    assert not fails, "\n".join(fails)


def test_order_by_keeps_exact_total_order(spark):
    """The documented residual: ORDER BY cannot adopt a non-transitive
    comparator, so the exact total order ranks the int above the equal
    float8 text (int64max's exact value exceeds 9223372036854775808's
    nearest representation... the float8 rounds UP to 2^63, so exact order
    puts the float LAST)."""
    age = AgeSession(spark)
    g = age.create_graph("f8_order")
    g = age.load_vertices(
        g, "N", spark.createDataFrame([(1,)], "id long"), id_col="id"
    )
    rows = age.cypher(
        g,
        f"UNWIND [{F8}, {I64MAX}] AS x RETURN x ORDER BY x",
    ).df.collect()
    # exact values: float8 9.223372036854776e18 == 2^63 > int64max;
    # UNWIND of a mixed list yields tagged structs (int carries __i)
    assert rows[0].x["__i"] == 9223372036854775807
    assert rows[1].x["__i"] is None and rows[1].x["__n"] == 9.223372036854776e18
