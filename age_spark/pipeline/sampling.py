"""Stratified sampling for training-data mixture control.

Curating a pre-training mixture means sampling per stratum (language,
source, quality band) with explicit rates or caps. Both operators here are
single-shuffle and deterministic under a seed, so a 100 TB sampling run is
reproducible and re-runnable per partition on task retry.

Beyond-reference operators (no training-pipeline surface in the reference).
"""

from __future__ import annotations

from typing import Mapping, Optional, Union

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# xxhash64 output is a signed int64; map it to a uniform double in [0, 1).
_HASH_SPAN = float(2**64)


def _hash_draw(df: DataFrame, seed: int, id_col: Optional[str]) -> F.Column:
    """Uniform [0,1) draw that is a pure function of (row identity, seed).

    Unlike ``F.rand(seed)`` — which seeds per *partition*, so any
    repartition, AQE replan, or input-split change reshuffles the sample —
    this survives task retry and replanning byte-for-byte. With ``id_col``
    the identity is that column; otherwise the full row content.
    """
    cols = [F.col(id_col)] if id_col else [F.col(c) for c in df.columns]
    h = F.xxhash64(*cols, F.lit(int(seed)))
    return (h.cast("double") / F.lit(_HASH_SPAN)) + F.lit(0.5)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: Union[float, Mapping[str, float]],
    seed: int = 42,
    id_col: Optional[str] = None,
) -> DataFrame:
    """Bernoulli sample per stratum: keep each row of stratum s with
    probability fractions[s] (or a uniform float for every stratum).

    Deterministic per (seed, row): the draw is ``xxhash64(row-identity,
    seed)`` scaled to [0,1) — no shuffle at all, the filter evaluates in
    the scan stage, survives repartition/AQE replan/task retry, and pushes
    work to zero for fraction-0 strata.
    """
    draw = _hash_draw(df, seed, id_col)
    if isinstance(fractions, Mapping):
        rate = None
        for k, v in fractions.items():
            rate = F.when(F.col(strata_col) == k, F.lit(float(v))) if rate is None \
                else rate.when(F.col(strata_col) == k, F.lit(float(v)))
        rate = rate.otherwise(F.lit(0.0)) if rate is not None else F.lit(0.0)
    else:
        rate = F.lit(float(fractions))
    return df.filter(draw < rate)


def temperature_mixture(
    df: DataFrame,
    source_col: str,
    temperature: float = 1.0,
    target_total: int = 1_000,
    order_col: Optional[str] = None,
    seed: int = 42,
    id_col: Optional[str] = None,
) -> DataFrame:
    """Temperature-reweighted mixture sampling — the multilingual /
    multi-source pretraining recipe: source s gets a share of
    ``target_total`` proportional to ``n_s^(1/T)`` (T=1 keeps natural
    proportions; T→∞ approaches uniform over sources, up-weighting small
    sources), floored to an integer and capped at the source's row count.
    Within each source the quota fills top-by-``order_col`` (quality
    ordering, ``id_col`` tie-break — deterministic, SQL-oracle-able) or
    by the seeded hash draw.

    Scale shape: the per-source counts are ONE tiny aggregation collected
    to the driver (bounded by the number of sources, never rows); the
    selection is the same single window shuffle as stratified_cap."""
    import math

    counts = {
        r[source_col]: r["_n"]
        for r in df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n")).collect()
    }
    ws = {k: float(n) ** (1.0 / float(temperature)) for k, n in counts.items()}
    z = sum(ws.values()) or 1.0
    want = {
        k: min(counts[k], int(math.floor(target_total * w / z)))
        for k, w in ws.items()
    }
    quota = None
    for k, q in want.items():
        quota = (
            F.when(F.col(source_col) == k, F.lit(q))
            if quota is None
            else quota.when(F.col(source_col) == k, F.lit(q))
        )
    quota = quota.otherwise(F.lit(0)) if quota is not None else F.lit(0)
    if order_col is not None:
        order = [F.col(order_col).desc()] + ([F.col(id_col)] if id_col else [])
    else:
        order = [_hash_draw(df, seed, id_col).asc()]
    w = Window.partitionBy(source_col).orderBy(*order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= quota)
        .drop("_rk")
    )


def stratified_cap(
    df: DataFrame,
    strata_col: str,
    n_per_stratum: int,
    order_col: str = None,
    seed: int = 42,
    id_col: Optional[str] = None,
) -> DataFrame:
    """At most ``n_per_stratum`` rows per stratum. With ``order_col``,
    keeps the TOP rows by that column (e.g. quality_score); without, a
    seeded hash-random subset (deterministic under repartition, same draw
    as ``stratified_sample``). One shuffle (window partitioned by stratum);
    heavy strata are exactly the skew case AQE's skew-join handling and a
    pre-aggregation cannot fix here — the rank itself is the operator —
    so at extreme skew raise spark.sql.shuffle.partitions for this stage.
    """
    order = F.col(order_col).desc() if order_col else _hash_draw(df, seed, id_col).asc()
    w = Window.partitionBy(strata_col).orderBy(order)
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= n_per_stratum)
        .drop("_rk")
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    train: float = 0.90,
    val: float = 0.05,
    seed: int = 42,
) -> DataFrame:
    """Deterministic train/val/test split + epoch shuffle key.

    Every large-scale training pipeline needs a split that is a pure
    function of document identity — stable across reruns, engines, and
    partitionings — plus a reproducible global shuffle order for epoch
    streaming.  Both derive from md5 over the seeded id text (md5 is
    bit-identical across engines, so the DuckDB oracle reproduces the
    assignment EXACTLY; xxhash64 is Spark-only).  The split compares the
    first 8 hex chars lexically against precomputed hex thresholds —
    lowercase-hex lexical order IS numeric order, no bigint conversion
    needed on either engine.

    Scale shape: map-only projection, no shuffle; ORDER BY shuffle_key
    at write time gives the deterministic epoch order."""
    h_split = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    h_order = F.md5(F.concat(F.lit(f"{seed + 1}:"), F.col(id_col).cast("string")))
    t_train = format(int(train * 16**8), "08x")
    t_val = format(int((train + val) * 16**8), "08x")
    b = F.substring(h_split, 1, 8)
    return df.select(
        F.col(id_col),
        F.when(b < t_train, F.lit("train"))
        .when(b < t_val, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
        h_order.alias("shuffle_key"),
    )


def length_curriculum(
    df: DataFrame,
    text_col: str = "text",
    boundaries: tuple = (8, 32, 128, 512),
) -> DataFrame:
    """Curriculum binning by token count: per-bucket document counts,
    token statistics and corpus share — the report curriculum schedules
    and packing planners key on.

    Scale shape: map-only token count (same whitespace rule as
    quality_features), one small groupBy on the bucket id, corpus total
    via a lazy broadcast 1-row aggregate (no build-time job)."""
    from .text import token_count

    n_tok = token_count(F.col(text_col)).cast("long")
    bucket = F.lit(len(boundaries)).cast("long")
    label = F.lit(f">={boundaries[-1]}")
    for i in reversed(range(len(boundaries))):
        lo = 0 if i == 0 else boundaries[i - 1]
        bucket = F.when(n_tok < boundaries[i], F.lit(i).cast("long")).otherwise(bucket)
        label = F.when(
            n_tok < boundaries[i], F.lit(f"[{lo},{boundaries[i]})")
        ).otherwise(label)
    binned = df.select(bucket.alias("bucket"), label.alias("bucket_label"), n_tok.alias("_n"))
    total = binned.agg(F.count(F.lit(1)).alias("_total"))
    return (
        binned.groupBy("bucket", "bucket_label")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").alias("n_tokens"),
            F.round(F.avg("_n"), 4).alias("avg_tokens"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "bucket",
            "bucket_label",
            "n_docs",
            "n_tokens",
            "avg_tokens",
            F.round(F.col("n_docs") / F.col("_total").cast("double"), 6).alias("share"),
        )
    )


def dsir_importance_weights(
    raw: DataFrame,
    target: DataFrame,
    n_buckets: int = 8192,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): represent each
    document by HASHED word-bigram features, fit add-one-smoothed bucket
    distributions over the target sample and the raw corpus, and weight
    every raw document by its log likelihood ratio

        weight(doc) = sum_b c_b(doc) * ln( p_target(b) / p_raw(b) )

    with p(b) = (count(b) + 1) / (N + n_buckets).  High-weight documents
    look like the target domain; resampling raw by these weights is the
    DSIR recipe.  The bucket hash is md5 (engine-portable, the
    dedup._hash60 rule) so an external SQL engine replays the bucketing
    byte-for-byte.  Documents with fewer than two tokens have no feature
    and drop out (same rule as bigram_logprob).

    Scale shape: bigrams form IN-ARRAY (zip_with of shifted slices — no
    posexplode self-join); both fitted distributions are bounded
    (<= n_buckets rows) and BROADCAST; N_target / N_raw stay LAZY (1-row
    aggregates crossJoined broadcast — building the op runs no job);
    scoring is one map-side explode + broadcast joins + one doc-keyed
    groupBy with partial aggregation — a single data-sized shuffle at
    any corpus size.  Output: (id_col, dsir_weight round 4, n_features).
    """

    def toks_arr(c):
        return F.filter(
            F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " "),
            lambda x: x != "",
        )

    def bigrams(a):
        # let-bound (graph.let_column): the token-array subtree is
        # referenced 5x here and would re-evaluate per mention un-bound
        from ..graph import let_column

        def _bg(arr):
            return F.when(
                F.size(arr) >= 2,
                F.zip_with(
                    F.slice(arr, 1, F.size(arr) - 1),
                    F.slice(arr, 2, F.size(arr) - 1),
                    lambda x, y: F.concat_ws(" ", x, y),
                ),
            ).otherwise(F.array().cast("array<string>"))

        return let_column(a, _bg)

    def bucket(bg):
        # 60-bit md5 prefix (positive, so % == pmod), DuckDB-replayable as
        # ('0x' || substr(md5(bg), 1, 15))::BIGINT % n_buckets
        return (
            F.conv(F.substring(F.md5(bg), 1, 15), 16, 10).cast("long")
            % F.lit(int(n_buckets))
        ).alias("_b")

    def bucket_counts(df):
        return (
            df.select(F.explode(bigrams(toks_arr(F.col(text_col)))).alias("_bg"))
            .select(bucket(F.col("_bg")))
            .groupBy("_b")
            .agg(F.count(F.lit(1)).alias("_c"))
        )

    tc = bucket_counts(target)
    rc = bucket_counts(raw)
    stats = (
        tc.agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("_nt"))
        .crossJoin(rc.agg(F.coalesce(F.sum("_c"), F.lit(0)).alias("_nr")))
    )
    B = F.lit(float(n_buckets))
    # per-bucket log ratio over the RAW-observed buckets: a raw doc's
    # bucket always sits in rc, so target-only buckets are unreachable by
    # scoring — a LEFT join keeps the table broadcastable (a full outer
    # would force a sort-merge; Spark can't broadcast-hash full outer)
    lr = (
        rc.withColumnRenamed("_c", "_cr")
        .join(F.broadcast(tc.withColumnRenamed("_c", "_ct")), "_b", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "_b",
            (
                F.log(
                    (F.coalesce(F.col("_ct"), F.lit(0)) + 1)
                    / (F.col("_nt").cast("double") + B)
                )
                - F.log(
                    (F.coalesce(F.col("_cr"), F.lit(0)) + 1)
                    / (F.col("_nr").cast("double") + B)
                )
            ).alias("_lr"),
        )
    )
    feats = raw.select(
        F.col(id_col), F.explode(bigrams(toks_arr(F.col(text_col)))).alias("_bg")
    ).select(id_col, bucket(F.col("_bg")))
    return (
        feats.join(F.broadcast(lr), "_b")
        .groupBy(id_col)
        .agg(
            F.round(F.sum("_lr"), 4).alias("dsir_weight"),
            F.count(F.lit(1)).alias("n_features"),
        )
    )


def seeded_shuffle(
    df: DataFrame, seed: int = 42, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic global shuffle for training-data serialization:
    every row gets a dense 0-based ``shuffle_pos`` equal to its rank
    under a seeded md5 hash of its id (ties broken by the id) — the
    reproducible "shuffle once, stream in order" recipe a training run
    needs so restarts and re-runs read the corpus in the same order.
    A pure function of (id, seed): stable across partitionings, task
    retries, and cluster sizes, and md5 keeps it engine-portable (the
    dedup._hash60 rule, so an external SQL engine replays the order
    byte-for-byte).  split_assign's ``shuffle_key`` is the sort-at-write
    flavor of the same idea; this materializes the dense RANK for
    pipelines that need explicit positions (sharding, resume offsets).

    Scale shape: ONE range-partitioned sort on the 60-bit key (Spark's
    orderBy = sampled bounds + range exchange + per-partition sort);
    positions come from graph.dense_row_numbers — per-partition offsets
    off a tiny counts action — so there is no global single-partition
    window anywhere."""
    from ..graph import DENSE_ROW_COL, dense_row_numbers

    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    "|", F.lit(str(int(seed))), F.col(id_col).cast("string")
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    ordered = df.orderBy(key.asc(), F.col(id_col).asc())
    numbered, _n = dense_row_numbers(ordered)
    return numbered.withColumnRenamed(DENSE_ROW_COL, "shuffle_pos")
