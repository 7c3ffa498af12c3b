"""Exact PG-numeric arithmetic kernel — shared by the compile-time
constant fold (compiler/exprs.py:_fold_const_numeric) and the runtime
Arrow kernel for NUMERIC-kind column arithmetic.

The reference's NUMERIC kind is PG ``numeric`` — arbitrary precision
(agtype.h:307-323); its operators route through numeric.c: add/sub keep
``max(dscale1, dscale2)`` display digits, multiply keeps ``d1 + d2``,
division computes ``select_div_scale`` digits (numeric.c, the
NUMERIC_MIN_SIG_DIGITS(16) rule), modulo keeps ``max(d1, d2)``.  This
module reimplements those display-scale rules over Python ``Decimal``
so results match ``numeric_out`` byte-for-byte at ANY precision — the
former DECIMAL(38,18) runtime lane overflowed/rounded past 38 digits.

Special values mirror the engine's established float8 routing: a
NaN/Infinity operand (PG numeric accepts the spellings) computes through
float8 and prints the special spelling; ``x % 0`` yields NaN (float8
semantics — the row is mixed-kind in the engine) and ``x / 0`` yields
NULL like the rest of the engine's division-by-zero surface.
"""

from __future__ import annotations

import decimal as _dec
import math
from typing import Optional

import pandas as pd  # module-level: pandas_udf type-hint resolution

_CTX = _dec.Context(prec=300000)  # far beyond PG's ~131k-digit numeric


def pg_weight_firstdigit(v: _dec.Decimal):
    """Base-10000 weight and first NumericDigit of a PG numeric (numeric.c
    set_var_from_str digit packing) — inputs to select_div_scale."""
    if v == 0:
        return 0, 0
    av = abs(v)
    dweight = av.adjusted()  # power of 10 of the first decimal digit
    if dweight >= 0:
        weight = (dweight + 4) // 4 - 1
    else:
        weight = -((-dweight - 1) // 4 + 1)
    first = int(av.scaleb(-4 * weight, context=_CTX))
    return weight, first


def select_div_scale(v1: _dec.Decimal, v2: _dec.Decimal, d1: int, d2: int) -> int:
    """PG's numeric division display scale (select_div_scale, numeric.c):
    NUMERIC_MIN_SIG_DIGITS(16) - qweight*DEC_DIGITS(4), floored by both
    input dscales — int64max/int64max prints 1.00000000000000000000."""
    w1, f1 = pg_weight_firstdigit(v1)
    w2, f2 = pg_weight_firstdigit(v2)
    qweight = w1 - w2
    if f1 <= f2:
        qweight -= 1
    rscale = 16 - qweight * 4
    rscale = max(rscale, d1, d2, 0)
    return min(rscale, 1000)


def exact_numeric_op(
    op: str, lv: _dec.Decimal, ld: int, rv: _dec.Decimal, rd: int
):
    """One exact PG-numeric binary op over FINITE decimals: returns
    (Decimal result, result dscale) or None for division by zero."""
    with _dec.localcontext(_CTX):
        if op == "+":
            res, ds = lv + rv, max(ld, rd)
        elif op == "-":
            res, ds = lv - rv, max(ld, rd)
        elif op == "*":
            res, ds = lv * rv, ld + rd
        elif op == "/":
            if rv == 0:
                return None
            ds = select_div_scale(lv, rv, ld, rd)
            res = (lv / rv).quantize(
                _dec.Decimal(1).scaleb(-ds), rounding=_dec.ROUND_HALF_UP
            )
        elif op == "%":
            if rv == 0:
                return None
            res = lv - (lv / rv).to_integral_value(rounding=_dec.ROUND_DOWN) * rv
            ds = max(ld, rd)
        elif op == "^":
            return numeric_power_exact(lv, ld, rv, rd)
        else:
            raise ValueError(f"unknown numeric op {op}")
        res = res.quantize(
            _dec.Decimal(1).scaleb(-ds), rounding=_dec.ROUND_HALF_UP
        )
    return res, ds


def _dscale_of(d: _dec.Decimal) -> int:
    return max(0, -d.as_tuple()[2])


# PG numeric.c display-scale constants (power path)
_MIN_SIG_DIGITS = 16      # NUMERIC_MIN_SIG_DIGITS
_MAX_DISPLAY_SCALE = 1000  # NUMERIC_MAX_DISPLAY_SCALE
_POWER_OVERFLOW_DIGITS = 131072  # ~ (SHRT_MAX+1) * DEC_DIGITS weight cap


def _log10_estimate(v: _dec.Decimal) -> float:
    """Double-precision log10(|v|) the way power_var/power_var_int estimate
    the result's decimal weight (first ~16 digits as a double + exponent)."""
    av = abs(v)
    if av == 0:
        return float("-inf")
    adj = av.adjusted()
    m = float(av.scaleb(-adj, context=_CTX))
    return math.log10(m) + adj


def numeric_power_exact(lv: _dec.Decimal, ld: int, rv: _dec.Decimal, rd: int):
    """PG ``numeric_power`` over FINITE operands (numeric.c power_var /
    power_var_int): returns (Decimal result, result dscale) or None for the
    SQL-mandated error cases (zero to a negative power; a negative base
    with a non-integer exponent; result-weight overflow), which the engine
    surfaces as a NULL row.  Display scale: exp==0 -> dscale 16 flat;
    otherwise NUMERIC_MIN_SIG_DIGITS - (int)approx_log10(result), floored
    by both input dscales, clamped to [0, 1000]."""
    if lv == 0 and rv < 0:
        return None  # zero raised to a negative power is undefined
    exp_integral = rv == rv.to_integral_value()
    if lv < 0 and not exp_integral:
        return None  # negative ^ non-integer yields a complex result
    with _dec.localcontext(_CTX):
        if exp_integral and -2147483648 <= rv <= 2147483647:
            # power_var_int
            expval = int(rv)
            if expval == 0:
                return _dec.Decimal(1).scaleb(0).quantize(
                    _dec.Decimal(1).scaleb(-_MIN_SIG_DIGITS)
                ), _MIN_SIG_DIGITS
            if lv == 0:
                # exp > 0 here (negative errored above)
                return _dec.Decimal(0).quantize(
                    _dec.Decimal(1).scaleb(-_MIN_SIG_DIGITS)
                ), _MIN_SIG_DIGITS
            f = expval * _log10_estimate(lv)
            if f > _POWER_OVERFLOW_DIGITS:
                return None  # value overflows numeric format
            rscale = _MIN_SIG_DIGITS - int(f)
            rscale = max(rscale, ld, rd, 0)
            rscale = min(rscale, _MAX_DISPLAY_SCALE)
            if f < -(_MAX_DISPLAY_SCALE + 32):
                res = _dec.Decimal(0)  # underflow: rounds to zero anyway
            elif expval >= 0:
                res = lv ** expval
            else:
                res = _dec.Decimal(1) / (lv ** (-expval))
            res = res.quantize(
                _dec.Decimal(1).scaleb(-rscale), rounding=_dec.ROUND_HALF_UP
            )
            return res, rscale
        # non-integer (or non-int32) exponent: exp(rv * ln(|lv|)), sign from
        # the (odd/even) integral exponent when the base is negative
        if lv == 0:
            # 0 ^ positive non-integer
            return _dec.Decimal(0).quantize(
                _dec.Decimal(1).scaleb(-_MIN_SIG_DIGITS)
            ), _MIN_SIG_DIGITS
        sign = -1 if (lv < 0 and int(rv) % 2 != 0) else 1
        f = float(rv) * _log10_estimate(lv)
        if f > _POWER_OVERFLOW_DIGITS:
            return None
        rscale = _MIN_SIG_DIGITS - int(f)
        rscale = max(rscale, ld, rd, 0)
        rscale = min(rscale, _MAX_DISPLAY_SCALE)
        guard = max(40, int(abs(f)) + rscale + 20)
        with _dec.localcontext(_dec.Context(prec=min(guard, 300000))):
            if f < -(_MAX_DISPLAY_SCALE + 32):
                res = _dec.Decimal(0)
            else:
                res = (rv * abs(lv).ln()).exp()
        res = res.quantize(
            _dec.Decimal(1).scaleb(-rscale), rounding=_dec.ROUND_HALF_UP
        )
        return sign * res, rscale


def _operand(d_text, i_text, n_text):
    """(Decimal value, dscale, is_numeric_kind) of one payload-slot trio;
    None when the row contributes no number.  ALL slots arrive as TEXT
    (pre-cast JVM-side): pandas float64 NaN would alias SQL NULL for
    __n, and int64-with-nulls rounds >2^53 for __i.  A float side
    converts the way PG casts float8 -> numeric: through the %.15g text
    (float8_numeric, DBL_DIG)."""
    if d_text is not None:
        v = _dec.Decimal(d_text)
        return v, (_dscale_of(v) if v.is_finite() else 0), True
    if i_text is not None:
        return _dec.Decimal(i_text), 0, False
    if n_text is not None:
        f = float(n_text)  # Java Double.toString spellings incl. Infinity
        if math.isnan(f):
            return _dec.Decimal("NaN"), 0, False
        if math.isinf(f):
            return _dec.Decimal("Infinity" if f > 0 else "-Infinity"), 0, False
        v = _dec.Decimal(format(f, ".15g"))
        return v, _dscale_of(v), False
    return None


def arith_result_text(
    op: str, ld, li, ln, rd, ri, rn
) -> Optional[str]:
    """Exact __d payload text of one tagged-arithmetic row, or None when
    the row is not NUMERIC-kind (neither side carries a __d payload — the
    JVM int/float lanes own it), an operand is missing, or the result is
    NULL (division by zero).  Slots arrive as text (__d), text (__i,
    pre-cast so pandas never rounds >2^53), and float (__n)."""
    if ld is None and rd is None:
        return None  # not a numeric-kind row
    lo = _operand(ld, li, ln)
    ro = _operand(rd, ri, rn)
    if lo is None or ro is None:
        return None  # a non-numeric kind on one side: row nulls out
    lv, lds, _ = lo
    rv, rds, _ = ro
    if not (lv.is_finite() and rv.is_finite()):
        # special operands ride float8 and print the special spelling
        # (engine-wide convention; x % 0.0 -> NaN matches float8 mod)
        lf, rf = float(lv), float(rv)
        try:
            if op == "+":
                f = lf + rf
            elif op == "-":
                f = lf - rf
            elif op == "*":
                f = lf * rf
            elif op == "/":
                if rf == 0.0:
                    return "NaN" if math.isnan(lf) else None
                f = lf / rf
            elif op == "^":
                # numeric_power's NaN rules are POSIX pow's (NaN^0 = 1,
                # 1^NaN = 1), which math.pow reproduces; the SQL error
                # rules still apply with infinite inputs (numeric.c
                # numeric_power) and surface as NULL rows
                if lf == 0.0 and rf < 0:
                    return None  # zero raised to a negative power
                if lf < 0 and not (math.isfinite(rf) and rf == int(rf)):
                    return None  # negative ^ non-integer
                f = math.pow(lf, rf)
            else:
                if rf == 0.0:
                    return "NaN"
                f = math.fmod(lf, rf)
        except (OverflowError, ValueError):
            return "NaN"
        if math.isnan(f):
            return "NaN"
        if math.isinf(f):
            return "Infinity" if f > 0 else "-Infinity"
        d = _dec.Decimal(format(f, ".15g"))
        return format(d, "f")
    if op == "%" and rv == 0:
        return "NaN"  # float8 mod-by-zero spelling (engine convention)
    out = exact_numeric_op(op, lv, lds, rv, rds)
    if out is None:
        return None  # division by zero -> NULL row
    return format(out[0], "f")


def make_numeric_arith_udf(op: str):
    """Vectorized (Arrow) exact-NUMERIC arithmetic UDF: ONE payload-slot
    struct (ld, li, ln, rd, ri, rn — all pre-cast to string JVM-side) ->
    the exact __d result text per row (None for non-numeric rows).  A
    single struct argument keeps the operand expression trees from being
    duplicated per slot — the same discipline as the exact order-text UDF
    (runtime/ordertext.py)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _exact_arith(v: pd.DataFrame, _pad: pd.Series) -> pd.Series:
        # (_pad is an unused literal: PySpark's type-hint inference
        # rejects a lone DataFrame->Series signature)
        out = [
            arith_result_text(op, a, b, c, d, e, f)
            for a, b, c, d, e, f in zip(
                v["ld"], v["li"], v["ln"], v["rd"], v["ri"], v["rn"]
            )
        ]
        return pd.Series(out, dtype="object")

    return _exact_arith


# ---- array-level arithmetic-tree kernel (in-lambda exact NUMERIC) ----
#
# A pandas UDF cannot run inside a higher-order-function lambda, so
# per-element arithmetic there cannot call the row kernel.  Instead the
# list-comprehension compiler pre-projects each element's operand slots
# (a JVM transform), ships the WHOLE array through this kernel once, and
# zips the exact __d texts back into the projected elements.  The
# arithmetic TREE (nested ops) is serialized and evaluated value-level
# per element, tracking the reference's per-node kind rules: int op int
# stays exact int64 (truncating /, C-style %), a float operand promotes
# the node to float8, a NUMERIC operand dominates and computes exactly
# with PG display scales; ^ is float8 unless a NUMERIC operand routes it
# through numeric_power.  Returns the final __d text when the ROOT is
# NUMERIC-kind, else None (the JVM lanes own int/float rows).


def _ev_tree(t, slots, acc_ix=frozenset(), acc_state=None):
    """Evaluate one serialized arithmetic tree node to a kind-tracked
    state tuple ('n'|'i'|'f', value, dscale) or None (error/non-number).
    ``acc_ix`` leaf indexes substitute ``acc_state`` (the reduce() fold
    accumulator) instead of reading payload slots."""

    def ev(t):
        if isinstance(t, int):
            if t in acc_ix:
                return acc_state
            o = _operand(slots[3 * t], slots[3 * t + 1], slots[3 * t + 2])
            if o is None:
                return None
            v, ds, isnum = o
            if isnum:
                return ("n", v, ds)
            if slots[3 * t + 1] is not None:
                return ("i", int(v), 0)
            return ("f", float(v), 0)
        op, lt, rt = t
        if op in ("neg", "abs"):
            # unary numeric nodes (numeric_uminus / numeric_abs): kind-
            # and dscale-preserving, exact in the decimal domain; NaN
            # passes through untouched (copy_negate/copy_abs never signal)
            co = ev(lt)
            if co is None:
                return None
            k, v, ds = co
            if k == "n":
                return ("n", v.copy_abs() if op == "abs" else v.copy_negate(), ds)
            if k == "i":
                return ("i", abs(v) if op == "abs" else -v, 0)
            return ("f", abs(v) if op == "abs" else -v, 0)
        lo, ro = ev(lt), ev(rt)
        if lo is None or ro is None:
            return None
        lk, lv, lds = lo
        rk, rv, rds = ro
        if lk == "n" or rk == "n":
            def as_dec(k, v, ds):
                if k == "n":
                    return v, ds
                if k == "i":
                    return _dec.Decimal(v), 0
                if math.isnan(v):
                    return _dec.Decimal("NaN"), 0
                if math.isinf(v):
                    return _dec.Decimal("Infinity" if v > 0 else "-Infinity"), 0
                d = _dec.Decimal(format(v, ".15g"))
                return d, _dscale_of(d)

            dv1, ds1 = as_dec(lk, lv, lds)
            dv2, ds2 = as_dec(rk, rv, rds)
            if not (dv1.is_finite() and dv2.is_finite()):
                # specials ride float8, result stays NUMERIC-kind spelling
                txt = arith_result_text(
                    op, str(dv1), None, None, str(dv2), None, None
                )
                if txt is None:
                    return None
                d = _dec.Decimal(txt)
                return ("n", d, _dscale_of(d) if d.is_finite() else 0)
            if op == "%" and dv2 == 0:
                return ("n", _dec.Decimal("NaN"), 0)
            out = exact_numeric_op(op, dv1, ds1, dv2, ds2)
            if out is None:
                return None
            return ("n", out[0], out[1])
        if op == "^":
            # float8 pow whatever the int/float mix (agtype_pow)
            try:
                f = math.pow(float(lv), float(rv))
            except (OverflowError, ValueError):
                return None
            return ("f", f, 0)
        if lk == "i" and rk == "i":
            a, b = int(lv), int(rv)
            if op == "+":
                return ("i", a + b, 0)
            if op == "-":
                return ("i", a - b, 0)
            if op == "*":
                return ("i", a * b, 0)
            if op == "/":
                if b == 0:
                    return None
                q = abs(a) // abs(b)
                return ("i", q if (a >= 0) == (b >= 0) else -q, 0)
            if b == 0:
                return None  # int % 0
            m = abs(a) % abs(b)
            return ("i", m if a >= 0 else -m, 0)
        a, b = float(lv), float(rv)
        try:
            if op == "+":
                f = a + b
            elif op == "-":
                f = a - b
            elif op == "*":
                f = a * b
            elif op == "/":
                if b == 0.0:
                    return None
                f = a / b
            else:
                f = float("nan") if b == 0.0 else math.fmod(a, b)
        except (OverflowError, ValueError):
            f = float("nan")
        return ("f", f, 0)

    return ev(t)


def _numeric_state_text(root) -> Optional[str]:
    """Final __d text of a kind-state when the root is NUMERIC-kind, else
    None (the JVM int/float lanes own those rows)."""
    if root is None or root[0] != "n":
        return None
    v = root[1]
    if not v.is_finite():
        return "NaN" if v.is_nan() else ("Infinity" if v > 0 else "-Infinity")
    return format(v, "f")


def eval_arith_tree(tree, slots) -> Optional[str]:
    """tree: int (leaf index) or (op, ltree, rtree); slots: flat list
    [d0, i0, n0, d1, i1, n1, ...] of one element's leaf texts."""
    return _numeric_state_text(_ev_tree(tree, slots))


def make_numeric_tree_udf(tree, nleaves: int):
    """Vectorized kernel over a whole ARRAY column: each element carries
    its leaf slot struct (s{j}d/s{j}i/s{j}n texts, pre-cast JVM-side);
    returns the per-element exact __d texts (None where the element's
    root is not NUMERIC-kind or an operand errors)."""
    from pyspark.sql.functions import pandas_udf

    names = [f"s{j}{c}" for j in range(nleaves) for c in "din"]

    @pandas_udf("array<string>")
    def _tree_arith(arr: pd.Series, _pad: pd.Series) -> pd.Series:
        out = []
        for elems in arr:
            if elems is None:
                out.append(None)
                continue
            res = []
            for el in elems:
                if el is None:
                    res.append(None)
                    continue
                slots = [el[n] for n in names]
                res.append(eval_arith_tree(tree, slots))
            out.append(res)
        return pd.Series(out, dtype="object")

    return _tree_arith


def make_numeric_fold_udf(tree, acc_ix, nleaves: int):
    """Exact reduce() fold kernel: evaluates the WHOLE fold over one
    row's element array value-level (the reference folds through
    agtype-numeric ops one step at a time, age_reduce), substituting the
    running accumulator state at the ``acc_ix`` leaf positions.  Input:
    the init's slot struct (d/i/n texts) and the array of per-element
    leaf-slot structs; output: the final __d text when the fold RESULT
    is NUMERIC-kind, else None (int/float results stay on the exact JVM
    lanes; a non-numeric init or element row nulls out like the JVM
    path)."""
    from pyspark.sql.functions import pandas_udf

    names = [f"s{j}{c}" for j in range(nleaves) for c in "din"]
    aset = frozenset(acc_ix)

    @pandas_udf("string")
    def _fold_arith(init: pd.DataFrame, arr: pd.Series) -> pd.Series:
        out = []
        for d0, i0, n0, elems in zip(init["d"], init["i"], init["n"], arr):
            o = _operand(d0, i0, n0)
            if o is None or elems is None:
                out.append(None)
                continue
            v, ds, isnum = o
            if isnum:
                state = ("n", v, ds)
            elif i0 is not None:
                state = ("i", int(v), 0)
            else:
                state = ("f", float(v), 0)
            for el in elems:
                if el is None:
                    state = None
                    break
                slots = [el[n] for n in names]
                state = _ev_tree(tree, slots, aset, state)
                if state is None:
                    break
            out.append(_numeric_state_text(state))
        return pd.Series(out, dtype="object")

    return _fold_arith


def _apply_wrapper(op: str, state):
    """Apply a FLOAT-returning unary wrapper (age_ceil/floor/round/sign,
    agtype.c:10451-10496 / numeric_sign) to one kind-state: the reference
    computes numeric_ceil/floor/round/sign EXACTLY on NUMERIC and only
    then casts float8 (sign returns INTEGER).  Int/float kinds mirror the
    engine's JVM lanes: _dbl_ceil_floor's NaN/2^52 passthrough, Spark
    Round's shortest-repr HALF_UP, signum-cast-long's NaN -> 0."""
    if state is None:
        return None
    k, v, _ds = state
    if op == "sign":
        if k == "n":
            if v.is_nan():
                return ("i", 0, 0)
            return ("i", 0 if v == 0 else (1 if v > 0 else -1), 0)
        if k == "i":
            return ("i", (v > 0) - (v < 0), 0)
        if math.isnan(v):
            return ("i", 0, 0)
        return ("i", (v > 0) - (v < 0), 0)
    if k == "n":
        if not v.is_finite():
            return ("f", float(v), 0)
        with _dec.localcontext(_CTX):
            if op == "ceil":
                r = v.to_integral_value(rounding=_dec.ROUND_CEILING)
            elif op == "floor":
                r = v.to_integral_value(rounding=_dec.ROUND_FLOOR)
            else:  # round0: half away from zero (numeric_round at scale 0)
                r = v.to_integral_value(rounding=_dec.ROUND_HALF_UP)
        try:
            f = float(r)
        except OverflowError:  # float8 cast of a >308-digit integer
            f = math.inf if r > 0 else -math.inf
        return ("f", f, 0)
    if k == "i":
        return ("f", float(v), 0)
    if math.isnan(v) or math.isinf(v) or abs(v) >= float(1 << 52):
        return ("f", v, 0)  # already integral / special: passthrough
    if op == "ceil":
        return ("f", float(math.ceil(v)), 0)
    if op == "floor":
        return ("f", float(math.floor(v)), 0)
    r = _dec.Decimal(repr(v)).to_integral_value(rounding=_dec.ROUND_HALF_UP)
    return ("f", float(r), 0)


def make_numeric_wrapped_fold_udf(tree, acc_ix, nleaves: int, wrapper: str):
    """Exact reduce() fold kernel for step bodies ROOTED at a
    float-returning wrapper — ``floor(acc + x)`` and friends.  The inner
    arithmetic evaluates EXACTLY per step (the r9 residual bounded only
    this pre-wrapper NUMERIC intermediate), then the wrapper converts the
    step result to float (int for sign) exactly as the reference does, so
    the accumulator rides float8 from step 1 on — reference parity, not a
    bounded DECIMAL detour.  Returns the final double (long for sign), or
    None when no step ran (empty/null array — the JVM fold already passes
    the init through exactly) or an operand errored (the JVM lane nulls
    those rows too); callers coalesce kernel-over-JVM."""
    from pyspark.sql.functions import pandas_udf

    names = [f"s{j}{c}" for j in range(nleaves) for c in "din"]
    aset = frozenset(acc_ix)
    ret = "long" if wrapper == "sign" else "double"

    @pandas_udf(ret)
    def _wrapped_fold(init: pd.DataFrame, arr: pd.Series) -> pd.Series:
        out = []
        for d0, i0, n0, elems in zip(init["d"], init["i"], init["n"], arr):
            o = _operand(d0, i0, n0)
            if o is None or elems is None or len(elems) == 0:
                out.append(None)
                continue
            v, ds, isnum = o
            if isnum:
                state = ("n", v, ds)
            elif i0 is not None:
                state = ("i", int(v), 0)
            else:
                state = ("f", float(v), 0)
            for el in elems:
                if el is None:
                    state = None
                    break
                slots = [el[n] for n in names]
                state = _apply_wrapper(
                    wrapper, _ev_tree(tree, slots, aset, state)
                )
                if state is None:
                    break
            out.append(None if state is None else state[1])
        return pd.Series(out, dtype="object" if ret == "long" else "float64")

    return _wrapped_fold
