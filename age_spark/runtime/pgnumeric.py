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
