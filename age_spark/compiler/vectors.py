"""pgvector parity: vector functions and operators inside Cypher.

The reference integrates the pgvector extension into its Cypher surface
(regress/sql/pgvector.sql, expected/pgvector.out): ``::vector`` casts with
optional dimension checks, distance functions (l2_distance, inner_product,
cosine_distance, l1_distance), utilities (vector_dims, vector_norm,
l2_normalize, subvector, binary_quantize), the distance operators ``<#>``
``<=>`` ``<+>`` (and ``<->`` via the OPERATOR syntax — '-' collides with
pattern arrows in both lexers), plus elementwise ``+ - *`` and concat
``||`` on vector operands.

Spark-first design: a vector IS an ``array<float>`` column — pgvector
stores float4 elements, and the float element type doubles as the static
marker that flips ``+ - *`` from list semantics to elementwise semantics
(the reference makes the same decision statically from the ::vector cast's
type). Every kernel is built from zip_with / aggregate / transform
higher-order functions, so the whole surface stays JVM-side inside
whole-stage codegen — no UDFs, nothing Python in the hot path. Distances
coerce to float4 first (mirroring pgvector storage) and accumulate in
double (its functions return float8).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F, types as T

from .context import CompileError


def is_vector_dt(dt) -> bool:
    return isinstance(dt, T.ArrayType) and isinstance(dt.elementType, T.FloatType)


def _tagged_fields(dt) -> bool:
    return isinstance(dt, T.StructType) and "__k" in dt.fieldNames()


def as_vector(col: Column, dt) -> Column:
    """Coerce a value to a vector (array<float>): vector-text strings parse
    like pgvector's input function ('[1,2,3]' is also valid JSON), numeric
    arrays cast, dynamic (tagged) values unwrap their array/string payload."""
    if dt is None:
        return col.cast("array<float>")
    if isinstance(dt, T.NullType):
        return F.lit(None).cast("array<float>")
    if isinstance(dt, T.StringType):
        return F.from_json(col, "array<float>")
    if isinstance(dt, T.ArrayType):
        et = dt.elementType
        if isinstance(et, T.FloatType):
            return col
        if _tagged_fields(et):
            # dynamic-kind elements: numeric payload is exact-int __i or
            # float __n; non-numeric elements become null (strict per-row
            # errors aren't expressible in a vectorized plan)
            return F.transform(
                col,
                lambda x: F.coalesce(
                    x.getField("__i").cast("double"), x.getField("__n")
                ).cast("float"),
            )
        return col.cast("array<float>")
    if _tagged_fields(dt):
        k = col.getField("__k")
        return F.when(k == 4, F.from_json(col.getField("__j"), "array<float>")).when(
            k == 5, F.from_json(col.getField("__s"), "array<float>")
        )
    raise CompileError("cannot coerce this value to vector")


def _dims_checked(a: Column, b: Column, out: Column) -> Column:
    """pgvector errors on operand dimension mismatch ('different vector
    dimensions N and M') rather than zip-truncating — reproduce that as a
    per-row guard (CaseWhen short-circuits, so the error only fires on a
    mismatched row)."""
    return (
        F.when(a.isNull() | b.isNull(), F.lit(None))
        .when(
            F.size(a) != F.size(b),
            F.raise_error(
                F.format_string(
                    "different vector dimensions %d and %d", F.size(a), F.size(b)
                )
            ),
        )
        .otherwise(out)
    )


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_distance(a: Column, b: Column) -> Column:
    d = F.sqrt(
        F.aggregate(
            F.zip_with(
                a, b, lambda x, y: F.pow(x.cast("double") - y.cast("double"), F.lit(2))
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return _dims_checked(a, b, d)


def inner_product(a: Column, b: Column) -> Column:
    return _dims_checked(a, b, dot(a, b))


def cosine_distance(a: Column, b: Column) -> Column:
    # pgvector clamps the similarity into [-1, 1] before 1-x (vector.c
    # cosine_distance guards accumulated rounding past the legal range)
    sim = dot(a, b) / F.sqrt(dot(a, a) * dot(b, b))
    clamped = F.least(F.greatest(sim, F.lit(-1.0)), F.lit(1.0))
    return _dims_checked(a, b, F.lit(1.0) - clamped)


def l1_distance(a: Column, b: Column) -> Column:
    d = F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x.cast("double") - y.cast("double"))),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return _dims_checked(a, b, d)


def vector_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def l2_normalize(a: Column) -> Column:
    """Scale to unit l2 norm; the zero vector passes through unchanged
    (pgvector returns it as-is rather than dividing by zero)."""
    norm = vector_norm(a)
    return F.when(norm == 0.0, a).otherwise(
        F.transform(a, lambda x: (x.cast("double") / norm).cast("float"))
    )


def subvector(a: Column, start: Column, count: Column) -> Column:
    """1-based start + element count, like pgvector's subvector; an empty
    result is an error there ('vector must have at least 1 dimension')."""
    out = F.slice(a, start, count)
    return F.when(a.isNull(), F.lit(None)).when(
        F.size(out) == 0, F.raise_error(F.lit("vector must have at least 1 dimension"))
    ).otherwise(out)


def binary_quantize(a: Column) -> Column:
    """Sign bit per element, printed as a bit string ('111' for [1,2,4]) —
    the bit(n) output column the reference shows, as a string."""
    return F.array_join(
        F.transform(a, lambda x: F.when(x > 0, F.lit("1")).otherwise(F.lit("0"))), ""
    )


def check_dims(v: Column, n: int) -> Column:
    """::vector(n) — dimension-checked cast ('expected N dimensions, not M')."""
    return (
        F.when(v.isNull(), F.lit(None))
        .when(
            F.size(v) != n,
            F.raise_error(
                F.format_string(
                    f"expected {int(n)} dimensions, not %d", F.size(v)
                )
            ),
        )
        .otherwise(v)
    )


_ELEMENTWISE = {
    "+": lambda x, y: x + y,
    "-": lambda x, y: x - y,
    "*": lambda x, y: x * y,
}


def elementwise(op: str, a: Column, b: Column) -> Column:
    """Elementwise float4 arithmetic ([1,2,3]::vector + [1,2,4]::vector =
    [2,4,7]); float + float stays float, matching pgvector's f32 math."""
    return _dims_checked(a, b, F.zip_with(a, b, _ELEMENTWISE[op]))


DISTANCE_OPS = {
    "<->": l2_distance,
    "<#>": lambda a, b: -inner_product(a, b),  # negative inner product
    "<=>": cosine_distance,
    "<+>": l1_distance,
}


def vector_to_agtype(a: Column) -> Column:
    """``::agtype`` / ``::text`` on a vector. The reference has no direct
    vector→agtype cast: AGE's external-cast path goes through pgvector's
    TEXT form, and agtype_in then reads each element back — so integral
    values become agtype INTEGERs (print bare: subvector(...)::text →
    [2, 3, 4, 5], pgvector.out:170) and the rest become FLOATs carrying
    float4 digits (l2_normalize(...)::agtype, pgvector.out:459). Reproduce
    that as an array of tagged dynamic values: int kind for integral
    elements, float kind otherwise."""
    from ..graph import ORDER_KEY_TYPE

    def elem(x):
        d = x.cast("double")
        is_int = (d == F.floor(d)) & (F.abs(d) < F.lit(9.007199254740992e15))
        return F.when(
            x.isNull(), F.lit(None).cast("struct<__k:byte,__n:double,__i:long,__d:string,__s:string,__b:boolean,__o:" + ORDER_KEY_TYPE.simpleString() + ",__j:string>")
        ).otherwise(
            F.struct(
                F.lit(7).cast("byte").alias("__k"),
                d.alias("__n"),
                F.when(is_int, d.cast("long")).alias("__i"),
                F.lit(None).cast("string").alias("__d"),
                F.lit(None).cast("string").alias("__s"),
                F.lit(None).cast("boolean").alias("__b"),
                F.lit(None).cast(ORDER_KEY_TYPE).alias("__o"),
                F.lit(None).cast("string").alias("__j"),
            )
        )

    return F.transform(a, elem)


def vector_out(value) -> str:
    """pgvector's text output for a vector value ('[1,2,3]', float4
    shortest-roundtrip element repr, no spaces) — the AS (n vector) column
    format in the reference's expected files; used by conformance tests."""
    import numpy as np

    def fmt(x):
        f = np.float32(x)
        if float(f) == int(f):
            return str(int(f))
        return repr(f)

    return "[" + ",".join(fmt(x) for x in value) + "]"
