"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k — a broadcast join of the (small) query
set against the corpus with the dot product computed by JVM higher-order
functions (zip_with/aggregate — no Python, no UDF).

Scale path: LSH bucketing (signed random projections) — queries only join
their own bucket (equi-join on the bucket signature), turning top-k from a
full scan per query into a bucket scan; recall tunable by `planes` and
multi-probe.

An IVF variant (k-means coarse quantizer) would slot in the same shape:
assign centroid id, equi-join on centroid. Not included yet.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact cosine top-k per query. The query side is broadcast (small by
    construction); ranking is a per-query window with deterministic
    tie-break on corpus id."""
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(query_vec_col).alias("qv"))
    c = corpus.select(F.col(id_col).alias("vec_id"), F.col(vec_col).alias("cv"))
    scored = c.join(F.broadcast(q)).withColumn(
        "cosine", cosine(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )


def _hyperplanes(planes: int, dim: int, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random +-1 hyperplanes (md5-seeded) — built
    driver-side once, shipped as literals, reproducible everywhere."""
    import hashlib

    out = []
    for p in range(planes):
        row = []
        for j in range(dim):
            h = hashlib.md5(f"{seed}:{p}:{j}".encode()).digest()[0]
            row.append(1.0 if h & 1 else -1.0)
        out.append(row)
    return out


def _rp_signature(vec: Column, planes: int, dim: int, seed: int = 42) -> Column:
    """Signed-random-projection signature: bit p = sign(<v, h_p>). The plane
    loop unrolls at compile time so all bit shifts are literals; the dot
    products run JVM-side via zip_with/aggregate."""
    from functools import reduce

    hp = _hyperplanes(planes, dim, seed)
    bit_cols = []
    for p in range(planes):
        plane = F.array(*[F.lit(v) for v in hp[p]])
        d = F.aggregate(
            F.zip_with(vec, plane, lambda x, h: x * h),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bit_cols.append(
            F.when(d > 0, F.lit(1 << p).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return reduce(lambda a, b: a.bitwiseOR(b), bit_cols)


def lsh_bucketed_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    planes: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    query_vec_col: str = "query_vec",
) -> DataFrame:
    """Approximate top-k: candidates = corpus vectors whose RP signature
    equals the query's (single-probe). At 100 TB the bucket join replaces
    the full cross join; expected bucket size = n / 2^planes."""
    c = corpus.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("cv"),
    ).withColumn("sig", _rp_signature(F.col("cv").cast("array<double>"), planes, dim))
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(query_vec_col).alias("qv"),
    ).withColumn("sig", _rp_signature(F.col("qv").cast("array<double>"), planes, dim))
    scored = c.join(F.broadcast(q), "sig").withColumn(
        "cosine", cosine(F.col("qv").cast("array<double>"), F.col("cv").cast("array<double>"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", F.round("cosine", 6).alias("cosine"), "rank")
    )
