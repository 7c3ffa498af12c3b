"""Exact NUMERIC arithmetic — the runtime Arrow kernel (runtime/pgnumeric.py)
must match PG numeric.c display-scale semantics at ANY precision, beyond
the former DECIMAL(38,18) lane.  Value pins follow numeric.c rules
(add/sub keep max dscale, mul d1+d2, division select_div_scale) verified
against the reference's expected outputs for the foldable shapes
(regress/expected/expr.out numeric blocks) — the runtime kernel must agree
with the fold on every shape the fold covers."""

from decimal import Decimal

import pytest

from age_spark.runtime.pgnumeric import (
    arith_result_text,
    exact_numeric_op,
    select_div_scale,
)


def t(op, ld=None, li=None, ln=None, rd=None, ri=None, rn=None):
    return arith_result_text(op, ld, li, ln, rd, ri, rn)


class TestKernel:
    def test_add_keeps_max_dscale(self):
        assert t("+", ld="1.10", rd="2.20") == "3.30"
        assert t("+", ld="1.1", rd="2") == "3.1"

    def test_mul_adds_dscales(self):
        assert t("*", ld="1.10", rd="2.5") == "2.750"
        assert t("*", ld="2", rd="3") == "6"

    def test_div_select_div_scale(self):
        # 24.45 / 7 — the reference's canonical division shape
        assert t("/", ld="24.45", ri="7") == "3.4928571428571429"
        # int64max/int64max prints 20 zeros after the point
        m = str(2**63 - 1)
        assert t("/", ld=m, rd=m) == "1.00000000000000000000"

    def test_beyond_38_digits_exact(self):
        big = "9" * 40
        want = str(int(big) * int(big))
        assert t("*", ld=big, rd=big) == want
        assert len(want) == 80
        assert t("+", ld=big, rd="1") == "1" + "0" * 40
        assert t("%", ld=big, ri="7") == "3"

    def test_div_by_zero_is_null(self):
        assert t("/", ld="1", rd="0") is None
        assert t("/", ld="1", ri="0") is None

    def test_mod_by_zero_nan_spelling(self):
        assert t("%", ld="5.5", rd="0") == "NaN"

    def test_specials_ride_float8(self):
        assert t("*", ld="NaN", rd="2") == "NaN"
        assert t("+", ld="Infinity", rd="1") == "Infinity"
        assert t("-", ld="Infinity", rd="Infinity") == "NaN"
        assert t("/", ld="1", rd="Infinity") == "0"
        assert t("*", ld="-Infinity", rd="2") == "-Infinity"

    def test_non_numeric_rows_null(self):
        # neither side numeric-kind: the JVM int/float lanes own the row
        assert t("+", li="1", ri="2") is None
        assert t("+") is None
        # one side numeric, other missing (non-numeric kind): NULL row
        assert t("+", ld="1.5") is None

    def test_float_side_converts_via_15g(self):
        # PG float8 -> numeric goes through %.15g (float8_numeric):
        # 0.30000000000000004 collapses to 0.3 before the exact op
        assert t("+", ld="1.0", rn="0.30000000000000004") == "1.3"

    def test_int_side_exact_above_2_53(self):
        big_i = str(2**62 + 1)
        assert t("+", ld="0.5", ri=big_i) == str(Decimal(big_i) + Decimal("0.5"))

    def test_select_div_scale_matches_fold(self):
        # the kernel IS the fold's engine now — spot-pin the rscale rule
        assert select_div_scale(Decimal("24.45"), Decimal("7"), 2, 0) == 16
        assert exact_numeric_op("/", Decimal("24.45"), 2, Decimal("7"), 0)[0] == Decimal(
            "3.4928571428571429"
        )


@pytest.fixture(scope="module")
def numgraph(spark):
    from age_spark import AgeSession

    age = AgeSession(spark)
    g = age.create_graph("pgnum")
    big = "9" * 40
    g = age.cypher(
        g,
        f"CREATE (:N {{v: '{big}'::numeric, w: 1.10::numeric, f: 2.5, i: 7, s: 'x'}})",
    ).graph
    return age, g


def _out(age, g, q):
    from age_spark.runtime.agvalue import agtype_out

    return [tuple(agtype_out(v) for v in row) for row in age.cypher(g, q).df.collect()]


class TestRuntimeColumns:
    """Column (non-foldable) NUMERIC arithmetic through the full engine."""

    def test_big_product_and_scales(self, numgraph):
        age, g = numgraph
        big = int("9" * 40)
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN n.v * n.v AS sq, n.w + 2.20::numeric AS a, "
            "n.w / n.i AS d, n.w * n.f AS m, n.v % n.i AS md",
        )
        assert rows == [
            (
                f"{big * big}::numeric",
                "3.30::numeric",
                "0.15714285714285714286::numeric",
                "2.750::numeric",
                "3::numeric",
            )
        ]

    def test_non_numeric_rows_null_and_int_rows_stay_int(self, numgraph):
        age, g = numgraph
        rows = _out(age, g, "MATCH (n:N) RETURN n.s + 1 AS sc, n.i * 2 AS ii")
        assert rows == [('"x1"', "14")]

    def test_div_by_zero_raises(self, numgraph):
        # the reference errors too ("division by zero", PG numeric_div)
        age, g = numgraph
        with pytest.raises(Exception, match="(?i)divi"):
            age.cypher(g, "MATCH (n:N) RETURN n.v / 0 AS dz").df.collect()

    def test_plain_vs_tagged_numeric_compare_exact(self, numgraph):
        # a plain int/float literal vs a dynamic NUMERIC with >float8
        # precision must compare through numeric_cmp, not a __n float8
        # collapse — and stay pure JVM codegen (no Arrow stage on the
        # WHERE hot path)
        age, g = numgraph
        g2 = age.cypher(
            g, "CREATE (:C {v: '2.0000000000000000001'::numeric}), (:C {v: 2})"
        ).graph
        rows = _out(age, g2, "MATCH (c:C) WHERE c.v = 2 RETURN count(*) AS n")
        assert rows == [("1",)]
        rows = _out(age, g2, "MATCH (c:C) WHERE c.v > 2 RETURN count(*) AS n")
        assert rows == [("1",)]
        plan = age.explain(g2, "MATCH (c:C) WHERE c.v = 2 RETURN count(*) AS n")
        assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan

    def test_jvm_key_matches_python_key(self, spark):
        # the JVM numeric-ladder key must be byte-identical to the Python
        # exact key at every precision/spelling
        from decimal import Decimal

        from pyspark.sql import functions as F

        from age_spark.graph import jvm_numeric_sort_text
        from age_spark.runtime.ordertext import numeric_key

        texts = [
            "123", "-123", "0", "-0.0", "0.5", "-0.5", "0.00120", "2.50",
            "2.5", "2.5E0", "1.0E10", "1.0E-5", "-1.0E-5", "9" * 40,
            "-" + "9" * 40, "NaN", "Infinity", "-Infinity", str(2**63 - 1),
            str(-(2**63)), "3.4928571428571429", "1e100", "-1e-100",
            "0.000000000000000001", "123456789.987654321",
        ]
        df = spark.createDataFrame([(t,) for t in texts], ["t"])
        got = {
            r["t"]: r["k"]
            for r in df.select(
                "t", jvm_numeric_sort_text(F.col("t")).alias("k")
            ).collect()
        }
        for t in texts:
            assert got[t] == numeric_key(Decimal(t)), t

    def test_listcomp_projection_exact(self, numgraph):
        # list-comprehension projections route through the array-level
        # arithmetic-tree Arrow kernel: exact at any precision with PG
        # display scales (the former in-lambda DECIMAL(38,18) bound is
        # gone for projections)
        age, g = numgraph
        rows = _out(age, g, "RETURN [x IN [1, 2.5] | x * 2.00::numeric] AS l")
        assert rows == [("[2.00::numeric, 5.000::numeric]",)]

    def test_listcomp_big_product_exact(self, numgraph):
        age, g = numgraph
        big = int("9" * 40)
        rows = _out(age, g, "MATCH (n:N) RETURN [x IN [n.v] | x * x] AS l")
        assert rows == [(f"[{big * big}::numeric]",)]
        # nested tree: per-node kind rules (int subtree exact, NUMERIC
        # dominates the final node)
        rows = _out(age, g, "MATCH (n:N) RETURN [x IN [n.v] | (x * x) + 0.5] AS l")
        assert rows == [(f"[{big * big}.5::numeric]",)]

    def test_listcomp_int_lane_no_arrow(self, spark):
        # a pure int/float tree adds no Arrow stage (the JVM lanes are
        # already exact); plan-asserted so the gate cannot silently rot
        from age_spark import AgeSession

        age = AgeSession(spark)
        g = age.create_graph("pgnum_lane")
        g = age.cypher(g, "CREATE (:M {i: 3})").graph
        plan = age.explain(g, "MATCH (m:M) RETURN [x IN [1, 2] | x * m.i] AS l")
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan


class TestReduceFold:
    """reduce() folds route through the whole-fold Arrow kernel: exact
    NUMERIC arithmetic step by step (the former in-lambda DECIMAL(38,18)
    bound is gone for tree-shaped fold bodies)."""

    def test_reduce_sum_exact(self, numgraph):
        age, g = numgraph
        big = int("9" * 40)
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN reduce(a = 0, x IN [n.v, n.v, n.v] | a + x) AS s",
        )
        assert rows == [(f"{3 * big}::numeric",)]

    def test_reduce_product_beyond_38_digits(self, numgraph):
        age, g = numgraph
        big = int("9" * 40)
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN reduce(a = 1, x IN [n.v, n.v] | a * x) AS p",
        )
        assert rows == [(f"{big * big}::numeric",)]

    def test_reduce_display_scale_through_fold(self, numgraph):
        # adds keep max(dscale) at every STEP, like the reference's
        # step-by-step numeric_add folding
        age, g = numgraph
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN reduce(a = 0, x IN [n.w, n.w] | a + x) AS s",
        )
        assert rows == [("2.20::numeric",)]

    def test_reduce_int_float_lanes_unchanged(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN reduce(a = 0, x IN [1, 2, 3] | a + x) AS si",
        )
        assert rows == [("6",)]
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN reduce(a = 0.5, x IN [n.i, 2] | a + x * 2) AS m",
        )
        assert rows == [("18.5",)]

    def test_reduce_int_fold_no_arrow(self, numgraph):
        # a fold that cannot see a NUMERIC kind adds no Arrow stage
        age, g = numgraph
        plan = age.explain(g, "RETURN reduce(a = 0, x IN [1, 2, 3] | a + x) AS si")
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan

    def test_reduce_abs_wrapped_acc_int_lane(self, numgraph):
        # abs(acc) over ints: since round 9 tree-expressible (('abs', c)
        # node), int results stay on the exact JVM lanes
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN reduce(a = 0, x IN [1, -2, 3] | abs(a) + x) AS s",
        )
        assert rows == [("4",)]


class TestUnaryNodesExact:
    """Round 9 (VERDICT r8 next-round #7): fold STEP bodies whose root is
    ``abs`` or unary minus — the two numeric functions the reference
    evaluates exactly on NUMERIC (numeric_abs via age_abs agtype.c:10517,
    numeric_uminus) — flatten into the Arrow fold tree as
    ('abs'|'neg', child) nodes, so >38-digit intermediates survive.
    abs() itself is now type-preserving on tagged values everywhere
    (text-domain sign strip: exact at any width, pure JVM so it also
    works inside HOF lambdas).  Residual bounded lane: fold roots that
    are FLOAT-returning wrappers (floor/ceil/round — float in the
    reference too) and nested-inner lambdas (COVERAGE.md)."""

    BIG = int("9" * 40)

    def test_reduce_abs_root_beyond_38_digits(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN reduce(a = 0, x IN [-n.v, -n.v] | abs(a + x)) AS s",
        )
        # step 1: abs(0 + -BIG) = BIG (40 digits, exact); step 2:
        # abs(BIG + -BIG) = 0 — exactness of the 40-digit intermediate is
        # what makes the final 0 exact
        assert rows == [("0::numeric",)]

    def test_reduce_abs_root_accumulates_exact(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN reduce(a = 0, x IN [n.v, n.v] | abs(a + x)) AS s",
        )
        assert rows == [(f"{2 * self.BIG}::numeric",)]

    def test_reduce_abs_acc_leaf_times_elem(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN reduce(a = -n.v, x IN [n.v] | abs(a) * x) AS p",
        )
        assert rows == [(f"{self.BIG * self.BIG}::numeric",)]

    def test_reduce_neg_root_exact(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN reduce(a = 0, x IN [n.v] | -(a - x)) AS s",
        )
        assert rows == [(f"{self.BIG}::numeric",)]

    def test_abs_numeric_dscale_preserved(self, numgraph):
        age, g = numgraph
        rows = _out(age, g, "RETURN abs(-1.250::numeric) AS a")
        assert rows == [("1.250::numeric",)]

    def test_abs_type_preserving(self, numgraph):
        age, g = numgraph
        rows = _out(age, g, "RETURN abs(-7) AS i, abs(-7.5) AS f")
        assert rows == [("7", "7.5")]

    def test_abs_nan_numeric(self, numgraph):
        age, g = numgraph
        rows = _out(age, g, "RETURN abs(toFloat('NaN')::numeric) AS a")
        assert rows == [("NaN::numeric",)]

    def test_ceil_floor_round_numeric_before_float8(self, numgraph):
        """age_ceil/age_floor/age_round apply the numeric_* function
        EXACTLY and only then convert to float8 (agtype.c:10451-10563) —
        the conversion-first double view loses sub-float8 fractions.
        The text-domain lane (_exact_numeric_unary_text) carries the
        arbitrary-precision carry: 129...9.00001 ceils across the 9-run."""
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN ceil(2.0000000000000000001::numeric) AS c, "
            "floor(2.9999999999999999999::numeric) AS f, "
            "round(2.4999999999999999999::numeric) AS r, "
            "round(-2.5::numeric) AS n, "
            "ceil(129999999999999999999.00001::numeric) AS k, "
            "ceil(-0.3::numeric) AS z",
        )
        assert rows == [("3.0", "2.0", "2.0", "-3.0", "1.3e+20", "0.0")]

    def test_ceil_floor_double_domain_safe(self, numgraph):
        """The float8 lane never converts through LONG: huge doubles pass
        through (they are already integral past 2^52) instead of clamping
        to Long.Max, and NaN stays NaN instead of becoming 0."""
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN ceil(1e300) AS h, floor(-1e300) AS l, "
            "ceil(toFloat('NaN')) AS n, ceil(toFloat('Infinity')) AS i",
        )
        assert rows == [("1e+300", "-1e+300", "NaN", "Infinity")]

    def test_sign_numeric_text_domain(self, numgraph):
        """sign() on NUMERIC decides from the text payload: magnitudes
        under the float8 denormal floor must not collapse to 0."""
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN sign(-2.5::numeric) AS a, sign(0.000::numeric) AS z, "
            "sign(0.0000000000000000000001::numeric) AS t",
        )
        assert rows == [("-1", "0", "1")]

    def test_abs_in_lambda_projection_exact(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN [x IN [n.v] | abs(0 - x * x)] AS l",
        )
        assert rows == [(f'[{self.BIG * self.BIG}::numeric]',)]


class TestPredicateExact:
    """Arithmetic inside quantifier predicates and list-comprehension
    filters pre-computes through the array-level Arrow kernel: the
    comparison then reads exact __d payloads via the in-lambda JVM
    keys."""

    BIG = int("9" * 40)

    def test_quantifier_product_exact(self, numgraph):
        # only exact arithmetic distinguishes sq from sq-1 at 80 digits.
        # Two separate pooled queries: each quantifier's pre-pass plan is
        # large, and one combined projection paid superlinear Catalyst
        # time (~25 s vs ~2x7 s overlapped).
        from concurrent.futures import ThreadPoolExecutor

        age, g = numgraph
        sq = self.BIG * self.BIG

        def run(case):
            rhs, want = case
            rows = _out(
                age, g,
                f"MATCH (n:N) RETURN any(x IN [n.v] WHERE x * x = {rhs}) AS r",
            )
            return None if rows == [(want,)] else f"{rhs}: {rows}"

        cases = [(f"'{sq}'::numeric", "true"), (f"'{sq - 1}'::numeric", "false")]
        with ThreadPoolExecutor(max_workers=2) as ex:
            fails = [f for f in ex.map(run, cases) if f]
        assert not fails, fails

    def test_filter_exact_and_projection_splice(self, numgraph):
        age, g = numgraph
        sq = self.BIG * self.BIG
        rows = _out(
            age, g,
            f"MATCH (n:N) RETURN [x IN [n.v, 1] WHERE x * x <> '{sq - 1}'::numeric | x + 0] AS l",
        )
        assert rows == [(f"[{self.BIG}::numeric, 1]",)]

    def test_filter_guards_projection_division(self, numgraph):
        # the WHERE must still guard the projection's ANSI division raise
        # (only the exception-free kernel may run before the filter)
        age, g = numgraph
        rows = _out(age, g, "RETURN [x IN [0, 1, 2] WHERE x <> 0 | 1 / x] AS l")
        assert rows == [("[1, 0]",)]

    def test_int_predicate_no_arrow(self, numgraph):
        age, g = numgraph
        plan = age.explain(g, "RETURN any(x IN [1, 2, 3] WHERE x * 2 = 4) AS t")
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan


class TestProjectionNonTreeExact:
    """Round 8 (VERDICT r7 #4): an arithmetic operand feeding a
    NON-arithmetic function inside a list-comprehension PROJECTION
    (e.g. toString(x*y)) pre-computes through the same array-level Arrow
    kernel the predicates use — the rewritten body reads the exact
    spliced __d payload, so >38-digit results survive the conversion.
    Fold steps (abs(acc+x)) and inner-lambda nesting remain the
    documented bounded lane."""

    BIG = int("9" * 40)

    def test_tostring_of_product_exact(self, numgraph):
        age, g = numgraph
        sq = self.BIG * self.BIG
        rows = _out(
            age, g, "MATCH (n:N) RETURN [x IN [n.v] | toString(x * x)] AS l"
        )
        assert rows == [(f'["{sq}"]',)]

    def test_size_of_tostring_exact(self, numgraph):
        age, g = numgraph
        sq = self.BIG * self.BIG
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN [x IN [n.v] | size(toString(x * x))] AS l",
        )
        assert rows == [(f"[{len(str(sq))}]",)]

    def test_projection_exact_after_filter(self, numgraph):
        age, g = numgraph
        sq = self.BIG * self.BIG
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN "
            "[x IN [n.v, 1] WHERE x > 10 | toString(x * x)] AS l",
        )
        assert rows == [(f'["{sq}"]',)]

    def test_projection_exact_after_arith_filter(self, numgraph):
        # WHERE itself carries arithmetic (the zipped-source path), and
        # the projection still pre-computes over the filtered elements
        age, g = numgraph
        sq = self.BIG * self.BIG
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN "
            "[x IN [n.v, 1] WHERE x * x > 10 | toString(x + 1)] AS l",
        )
        assert rows == [(f'["{self.BIG + 1}"]',)]

    def test_lambda_tostring_kind_dispatch(self, numgraph):
        # the pre-existing gap this lane exposed: toString over a tagged
        # lambda element must kind-dispatch, not stringify the struct
        age, g = numgraph
        rows = _out(age, g, "RETURN [x IN [1, 'a', 2.5] | toString(x)] AS l")
        assert rows == [('["1", "a", "2.5"]',)]

    def test_int_projection_no_arrow(self, numgraph):
        # pure int/float projections add no Arrow stage
        age, g = numgraph
        plan = age.explain(g, "RETURN [x IN [1, 2, 3] | toString(x * 2)] AS l")
        for marker in ("BatchEvalPython", "ArrowEvalPython"):
            assert marker not in plan


class TestNumericPower:
    """`^` with a NUMERIC operand routes through numeric_power
    (agtype_pow, agtype_ops.c:1035 -> PG numeric.c power_var /
    power_var_int display scales); int/float kinds stay float8 pow."""

    def test_power_unit_goldens(self):
        from decimal import Decimal as D

        from age_spark.runtime.pgnumeric import numeric_power_exact

        cases = [
            (D("2.0"), 1, D(3), 0, "8.0000000000000000"),
            (D(2), 0, D(3), 0, "8.0000000000000000"),
            (D(10), 0, D(2), 0, "100.00000000000000"),
            (D("0.0"), 1, D(0), 0, "1.0000000000000000"),   # 0^0 = 1, dscale 16 flat
            (D(2), 0, D(-1), 0, "0.5000000000000000"),
            # exact decimal sqrt(2) to 16 places is ...950 (the float8
            # double is ...951 — numeric computes in decimal, not binary)
            (D(2), 0, D("0.5"), 1, "1.4142135623730950"),
            (D("0.5"), 1, D(10), 0, "0.0009765625000000000"),  # rscale 16-(-3)=19
            (D(-2), 0, D(3), 0, "-8.0000000000000000"),
            (D("2.5"), 1, D(4), 0, "39.062500000000000"),
        ]
        for lv, ld, rv, rd, want in cases:
            out = numeric_power_exact(lv, ld, rv, rd)
            assert out is not None and format(out[0], "f") == want, (lv, rv)
        # SQL-mandated error cases -> None (NULL row)
        assert numeric_power_exact(D(0), 0, D(-2), 0) is None
        assert numeric_power_exact(D(-2), 0, D("0.5"), 1) is None

    def test_power_through_engine(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "MATCH (n:N) RETURN n.i ^ 2 AS ff, 2::numeric ^ n.i AS nn, "
            "n.w ^ 2 AS ww, n.i::numeric ^ -1 AS inv",
        )
        assert rows == [
            (
                "49.0",                          # int ^ int stays FLOAT kind
                "128.00000000000000::numeric",   # f=log10(128)~2.1 -> rscale 14
                "1.2100000000000000::numeric",   # f~0.08 -> rscale 16
                "0.1428571428571429::numeric",   # f~-0.85 -> (int)f=0 -> 16
            )
        ]

    def test_power_error_rows_null(self, numgraph):
        age, g = numgraph
        df = age.cypher(
            g, "MATCH (n:N) RETURN 0::numeric ^ (0 - n.i) AS z"
        ).df
        assert [r["z"] for r in df.collect()] == [None]



class TestWrapperRootedFolds:
    """Step bodies ROOTED at a float-returning wrapper (floor/ceil/
    round/sign — float in the reference too, age_ceil agtype.c:10451):
    since round 10 the PRE-wrapper NUMERIC intermediate evaluates
    EXACTLY in the fold kernel (reference order: numeric op exactly,
    THEN float8), closing the last reduce() bounded-DECIMAL(38,18)
    residual (VERDICT r9 next-round #5)."""

    def test_floor_fold_40_digit_intermediate(self, numgraph):
        # acc + x exceeds DECIMAL(38,18) BEFORE floor: bounded lane
        # would overflow/round; exact lane floors then casts float8
        age, g = numgraph
        big = "1" + "0" * 39  # 40 digits
        rows = _out(
            age, g,
            f"RETURN reduce(s = 0.5::numeric, x IN [{big}.7::numeric] "
            "| floor(s + x)) AS v",
        )
        assert rows == [("1e+39",)]

    def test_ceil_fold_subfloat8_fraction(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN reduce(s = 0::numeric, x IN "
            "[2.0000000000000000001::numeric] | ceil(s + x)) AS v",
        )
        assert rows == [("3.0",)]  # double view would say 2.0

    def test_round_fold_half_away(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN reduce(s = 0.5::numeric, x IN [2::numeric, "
            "-0.0000000000000000001::numeric] | round(s + x)) AS v",
        )
        # step1 round(2.5) = 3.0 half-away (float), step2 round(3.0 - eps)
        # = 3.0 — the eps lives below float8 so step2's sum is exact 3
        assert rows == [("3.0",)]

    def test_sign_fold_subfloat8_magnitude(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN reduce(s = 0::numeric, x IN "
            "[0.0000000000000000000000000000000000000001::numeric] "
            "| sign(s + x)) AS v",
        )
        assert rows == [("1",)]  # double view collapses to 0

    def test_float_contaminates_after_step_one(self, numgraph):
        # reference parity: the wrapper returns float8, so step 2 folds
        # float + numeric (through the 15-digit conversion), not numeric
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN reduce(s = 0::numeric, x IN [2.5::numeric, "
            "0.4::numeric] | floor(s + x)) AS v",
        )
        assert rows == [("2.0",)]

    def test_tagged_init_plain_merge_untag(self, numgraph):
        # the widen hole the wrapper work exposed: a tagged NUMERIC init
        # with a plain-double merge type (any float-rooted body) was an
        # AnalysisException (struct CAST to double)
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN reduce(s = 2.25::numeric, x IN [0.0] | sqrt(s + x)) AS v",
        )
        assert rows == [("1.5",)]
        rows = _out(
            age, g,
            "RETURN reduce(s = 0.5::numeric, x IN [] | floor(s + x)) AS v",
        )
        assert rows == [("0.5",)]  # empty source: init passes through

    def test_dynamic_precision_round_keeps_double_view(self, numgraph):
        # round with a non-static precision stays on the JVM lane (no
        # kernel): documented residual, result is the double view
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN reduce(s = 0::numeric, x IN [2.345::numeric] "
            "| round(s + x, 2)) AS v",
        )
        assert rows == [("2.35",)]


class TestNestedInnerLambdas:
    """NESTED-inner lambdas (a comprehension/quantifier inside another
    lambda): tagged dispatch works there since round 10 (the element
    type threads through the lambda hint map — these were analysis
    ERRORS before), and their NUMERIC arithmetic rides the bounded
    DECIMAL(38,18) lane — THE remaining documented arithmetic bound
    (a pandas kernel cannot run inside a HOF lambda)."""

    def test_nested_comprehension_tagged_arith(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN [x IN [[1.5, '2'::numeric]] | [y IN x | y * 2]] AS v",
        )
        assert rows == [("[[3.0, 4::numeric]]",)]

    def test_nested_quantifier_tagged_compare(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN all(x IN [[1.5, '2'::numeric]] "
            "WHERE any(y IN x WHERE y > 1.9)) AS v",
        )
        assert rows == [("true",)]

    def test_nested_wide_numeric_bounded_residual(self, numgraph):
        # the DISCLOSED bound: >38-digit arithmetic inside a nested-inner
        # lambda falls back to the float8 view (the reference is exact);
        # this pins the residual's exact shape so any drift is visible
        age, g = numgraph
        big = "9" * 40
        rows = _out(
            age, g,
            f"RETURN [x IN [['{big}'::numeric]] | [y IN x | y + 1]] AS v",
        )
        assert rows == [("[[1.00000000000000e+40::numeric]]",)]

    def test_nested_reduce_source_from_outer_lambda(self, numgraph):
        age, g = numgraph
        rows = _out(
            age, g,
            "RETURN [x IN [[1, 2, 3]] | reduce(a = 0, z IN x | a + z)] AS v",
        )
        assert rows == [("[6]",)]
