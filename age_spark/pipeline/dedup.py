"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding-cosine near-dup.

Scale design (100 TB):
  - exact dedup is a single hash-aggregate on a digest column (map-side
    combined, one shuffle on the 128-bit digest — never on raw text).
  - MinHash/LSH turns all-pairs similarity into an equi-join on (band,
    bucket-hash): candidates collide only within buckets, so the shuffle is
    proportional to candidate pairs, not n^2.
  - n-gram Jaccard verification runs only on LSH candidates in the scale
    path; the direct all-pairs variant here exists as the small-data oracle
    twin.
  - every hash is seeded xxhash64 — deterministic across runs/executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def normalized(col: Column) -> Column:
    return F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")


_SPREAD_MEMO: "weakref.WeakKeyDictionary" = None


def _spread(df: DataFrame) -> DataFrame:
    """Ensure the input uses the cluster: a single small parquet file scans
    as ONE partition, serializing the whole shingle/hash pipeline onto one
    core. The round-robin repartition is a shuffle of the raw docs — cheap
    relative to the 50x row blowup the shingle explode adds after it. On a
    real multi-file 100 TB table this is a no-op.

    The ``df.rdd.getNumPartitions()`` probe costs ~0.1 s of driver time, so
    the decision is memoized per DataFrame HANDLE (weak-keyed: entries die
    with the handle; a fresh handle over the same files re-probes).  The
    probe depends only on the handle's plan, which is immutable."""
    global _SPREAD_MEMO
    import weakref

    if _SPREAD_MEMO is None:
        _SPREAD_MEMO = weakref.WeakKeyDictionary()
    try:
        hit = _SPREAD_MEMO[df]
        # the no-repartition decision is stored as None (a sentinel), not
        # as df itself: storing the weak KEY as its own strong VALUE would
        # keep the entry alive forever and defeat the weak keying
        return df if hit is None else hit
    except (KeyError, TypeError):
        pass
    target = df.sparkSession.sparkContext.defaultParallelism
    out = df.repartition(target) if (
        df.rdd.getNumPartitions() < max(2, target // 2)
    ) else df
    try:
        _SPREAD_MEMO[df] = None if out is df else out
    except TypeError:
        pass
    return out


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per identical (normalized) text. One shuffle on
    md5 digest; duplicate groups tracked with a count."""
    d = df.select(F.col(id_col), F.md5(normalized(F.col(text_col))).alias("_digest"))
    return (
        d.groupBy("_digest")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
        .select("keep_id", "n_copies")
    )


def word_shingles(col: Column, k: int = 3) -> Column:
    """Distinct k-word shingles of the normalized text, as strings.

    The token array is LET-BOUND (graph.let_column) so the
    regexp-normalize + split of the whole document evaluates once per row
    instead of once per mention (the un-bound tree mentioned it 4x: size,
    sequence bound, per-shingle slice source, and the short-text
    fallback — HOF subtrees skip codegen, so nothing CSE'd them)."""
    from ..graph import let_column

    def body(toks: Column) -> Column:
        n = F.size(toks)
        idx = F.sequence(F.lit(0), F.greatest(n - k, F.lit(0)))
        sh = F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, k)))
        return F.array_distinct(
            F.when(n >= k, sh).otherwise(F.array(F.concat_ws(" ", toks)))
        )

    return let_column(F.split(normalized(col), " "), body)


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 32,
    hash_fn: str = "xxh",
) -> DataFrame:
    """EXACT n-gram Jaccard >= threshold (id_a < id_b), LSH-driven.

    Candidates come from MinHash banding (shuffle proportional to bucket
    collisions); each candidate is verified with the exact shingle-set
    Jaccard, so precision is 1.0 and recall is the LSH capture rate (32
    bands of 2 hashes: a pair at the 0.8 threshold collides with
    p = 1-(1-0.8^2)^32 ~= 1-1e-13). The previous shingle inverted-index
    self-join was exact but O(n^2) in hot shingles — a scale-killer as a
    declared operator; it survives as ``ngram_jaccard_pairs_exact`` for
    tests."""
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, k, hash_fn)
    sh = df.select(
        F.col(id_col).alias("_jid"), word_shingles(F.col(text_col), k).alias("_sh")
    )
    a = sh.select(F.col("_jid").alias("id_a"), F.col("_sh").alias("_sh_a"))
    b = sh.select(F.col("_jid").alias("id_b"), F.col("_sh").alias("_sh_b"))
    joined = cand.join(a, "id_a").join(b, "id_b")
    inter = F.size(F.array_intersect("_sh_a", "_sh_b"))
    union = F.size("_sh_a") + F.size("_sh_b") - inter
    jac = joined.withColumn("jaccard", inter / union)
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


def ngram_jaccard_pairs_exact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """All-pairs exact twin of ``ngram_jaccard_pairs`` via the shingle
    inverted index — test-only verifier (the hot-shingle self-join is the
    n^2 risk at scale; never the declared operator)."""
    sh = _spread(df).select(F.col(id_col).alias("id"), word_shingles(F.col(text_col), k).alias("sh"))
    sh = sh.withColumn("sz", F.size("sh"))
    inv = sh.select("id", "sz", F.explode("sh").alias("s"))
    a = inv.alias("a")
    b = inv.alias("b")
    common = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("inter"),
            F.first(F.col("a.sz")).alias("sz_a"),
            F.first(F.col("b.sz")).alias("sz_b"),
        )
    )
    jac = common.withColumn(
        "jaccard", F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter"))
    )
    return jac.filter(F.col("jaccard") >= threshold).select(
        "id_a", "id_b", F.round("jaccard", 6).alias("jaccard")
    )


_MERSENNE_P = (1 << 31) - 1  # a*h+b stays < 2^62: no int64 overflow


def _hash60(col: Column) -> Column:
    """Engine-portable 60-bit hash: first 15 hex chars of md5 as a BIGINT.
    DuckDB twin: ``('0x' || substr(md5(x), 1, 15))::BIGINT`` — bit-identical
    across engines, which is what gives the seeded dedup family EXACT
    cross-engine oracles (xxhash64 is Spark-only; the md5 trick is the
    ``split_assign`` precedent, sampling.py).  md5 costs ~2x xxhash64 per
    call, so the default lane stays xxhash64 and ``hash_fn="md5"`` is the
    opt-in for oracle-checked runs."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def _perm_coeffs(num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for the universal-hash permutation
    family sig_i = min((a_i * h + b_i) mod p) — standard MinHash construction
    (one base hash per shingle, cheap multiply-add per permutation)."""
    import random

    rnd = random.Random(0x5EED)
    return [(rnd.randrange(1, _MERSENNE_P), rnd.randrange(0, _MERSENNE_P)) for _ in range(num_hashes)]


def minhash_signatures(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 64, k: int = 3, hash_fn: str = "xxh",
) -> DataFrame:
    """MinHash signature per doc.

    Scale path: explode shingles to rows, hash each ONCE (xxhash64, or md5
    when ``hash_fn="md5"`` for engine-portable signatures — see _hash60),
    then num_hashes min-aggregates over permuted hashes — a single
    codegen'd hash-aggregate with map-side partial combine; the shuffle
    carries one row of num_hashes longs per doc. (A nested
    transform-in-transform formulation computed 64 full hash passes per
    row in interpreted eval.)

    The wide expression trees (shingle explode, base hash, the
    num_hashes-permutation aggregate list) are memoized per parameter set
    (exprcache.memo_cols): they cost hundreds of py4j round trips to
    build — measured ~1.3 s per call, over half the query's wall — and
    depend only on the scalar arguments."""
    from .exprcache import memo_cols

    shingle_c, base_c = memo_cols(
        ("mh_base", text_col, k, hash_fn),
        lambda: [
            F.explode(word_shingles(F.col(text_col), k)).alias("s"),
            (
                (
                    _hash60(F.col("s")) if hash_fn == "md5"
                    else F.abs(F.xxhash64("s"))
                ) % _MERSENNE_P
            ).alias("h"),
        ],
    )
    inv = _spread(df).select(
        F.col(id_col).alias("id"), shingle_c
    ).select("id", base_c)
    aggs = memo_cols(
        ("mh_aggs", num_hashes),
        lambda: [
            F.min((F.col("h") * a + b) % _MERSENNE_P).alias(f"m{i}")
            for i, (a, b) in enumerate(_perm_coeffs(num_hashes))
        ],
    )
    wide = inv.groupBy("id").agg(*aggs)
    sig_c = memo_cols(
        ("mh_sig", num_hashes),
        lambda: [
            F.array(*[F.col(f"m{i}") for i in range(num_hashes)]).alias("sig")
        ],
    )[0]
    return wide.select("id", sig_c)


def _band_buckets(
    sig: DataFrame, num_hashes: int, bands: int, hash_fn: str = "xxh"
) -> DataFrame:
    """Explode a signature table into (id, band, bucket) rows.

    Band boundaries are Python constants, so the bucket hash is unrolled at
    compile time into one flat ``xxhash64(sig[i], ..., band)`` per band —
    plain codegen-friendly expressions (a nested transform-in-transform
    formulation here fell back to interpreted eval and was ~40x slower).
    ``hash_fn="md5"`` buckets on md5 over the '|'-joined band values so
    DuckDB reproduces the buckets exactly (concat_ws renders BIGINTs the
    same decimal way on both engines).  The bands*r-wide explode tree is
    memoized per parameter set (exprcache.memo_cols — py4j build cost)."""
    from .exprcache import memo_cols

    r = num_hashes // bands

    def bucket(b: int) -> Column:
        parts = [F.get(F.col("sig"), b * r + j) for j in range(r)]
        if hash_fn == "md5":
            return _hash60(F.concat_ws("|", *parts, F.lit(b)))
        return F.xxhash64(*parts, F.lit(b))

    explode_c = memo_cols(
        ("mh_bb", num_hashes, bands, hash_fn),
        lambda: [
            F.explode(
                F.array(*[
                    F.struct(F.lit(b).alias("band"), bucket(b).alias("bucket"))
                    for b in range(bands)
                ])
            ).alias("bb")
        ],
    )[0]
    return sig.select("id", explode_c).select(
        "id", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket")
    )


def minhash_lsh_candidates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 64, bands: int = 16, k: int = 3, hash_fn: str = "xxh",
) -> DataFrame:
    """LSH banding: split the signature into `bands` rows of r hashes; docs
    sharing any (band, band-hash) bucket become candidate pairs. The only
    shuffle is the self-join keyed on the band bucket."""
    from .exprcache import memo_cols

    sig = minhash_signatures(df, text_col, id_col, num_hashes, k, hash_fn)
    banded = _band_buckets(sig, num_hashes, bands, hash_fn)
    a = banded.alias("a")
    b = banded.alias("b")
    cond_c = memo_cols(
        ("mh_cand_cond",),
        lambda: [
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id"))
        ],
    )[0]
    return (
        a.join(b, cond_c)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_dedup_pairs(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    num_hashes: int = 64, bands: int = 16, k: int = 3, threshold: float = 0.7,
    materialize: bool = False, hash_fn: str = "xxh",
) -> DataFrame:
    """Scale-path near-dup: LSH candidates verified by signature-estimated
    Jaccard (fraction of agreeing minhashes).

    The signature table feeds three join sides (banding + both verify
    sides); as one subplan its shuffle is deduplicated by Spark's
    ReusedExchange, so the default lazy plan computes signatures once
    without pinning anything — nothing to unpersist, safe in a long-lived
    session.

    ``materialize=True`` additionally persists the signature table during
    an eager evaluation of the pair set and returns the pairs CACHED —
    use when the result is iterated over (``near_dedup``'s component
    loop). The caller owns ``out.unpersist()``; a persisted DataFrame is
    pinned in Spark's CacheManager until then (not released by GC)."""
    from .exprcache import memo_cols

    sig = minhash_signatures(df, text_col, id_col, num_hashes, k, hash_fn)
    if materialize:
        sig = sig.persist()
    try:
        banded = _band_buckets(sig, num_hashes, bands, hash_fn)
        a = banded.alias("a")
        b = banded.alias("b")
        cond_c, est_c = memo_cols(
            ("mh_pair_exprs", num_hashes),
            lambda: [
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
                (
                    F.size(
                        F.filter(
                            F.zip_with("sig_a", "sig_b", lambda x, y: x == y),
                            lambda z: z,
                        )
                    )
                    / F.lit(num_hashes)
                ),
            ],
        )
        cand = (
            a.join(b, cond_c)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
            .distinct()
        )
        sa = sig.select(F.col("id").alias("id_a"), F.col("sig").alias("sig_a"))
        sb = sig.select(F.col("id").alias("id_b"), F.col("sig").alias("sig_b"))
        est = cand.join(sa, "id_a").join(sb, "id_b").withColumn(
            "est_jaccard", est_c
        )
        out = est.filter(F.col("est_jaccard") >= threshold).select(
            "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
        )
        if materialize:
            # Evaluate eagerly so the signature cache (the big allocation)
            # can be released NOW. cache() + count() keeps the SQL/AQE
            # execution path — localCheckpoint would run the non-adaptive
            # RDD plan, measured 5x slower — and pins only the near-dup
            # pairs, a tiny fraction of the corpus.
            out = out.persist()
            out.count()
        return out
    finally:
        if materialize:
            sig.unpersist(blocking=False)


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 64, k: int = 3, hash_fn: str = "xxh") -> DataFrame:
    """64-bit SimHash over word shingles: bit j of the fingerprint is the
    sign of sum over shingles of (+1/-1 from hash bit j).

    Explode shingles to rows and take `bits` sum-aggregates of ±1 — one
    codegen'd hash-aggregate with map-side combine (same shape as MinHash:
    the shuffle carries `bits` longs per doc, never the shingles).

    ``hash_fn="md5"`` draws bit j from hex digit j//4 of the shingle's md5
    (engine-portable: DuckDB computes the identical bit with
    ``(('0x'||substr(md5(s), j/4+1, 1))::INT >> (j%4)) & 1``), giving the
    fingerprints an exact cross-engine oracle.

    The wide trees (shingle explode, hash projection, the `bits`
    sum-aggregates, the fingerprint fold) are memoized per parameter set
    (exprcache.memo_cols — their py4j build cost measured ~1 s per call)."""
    from functools import reduce

    from .exprcache import memo_cols

    shingle_c = memo_cols(
        ("sh_shingles", text_col, k),
        lambda: [F.explode(word_shingles(F.col(text_col), k)).alias("s")],
    )[0]
    inv = _spread(df).select(F.col(id_col).alias("id"), shingle_c)
    if hash_fn == "md5":
        # Parse the 16 hex digits as TWO integers up front (one conv for
        # digits 1-15, one for digit 16) instead of 64 per-bit
        # substring+conv parses: bit j of the per-digit formula — digit
        # j//4+1's bit j%4 — is bit 4*(15-(j//4+1)) + j%4 of the 15-digit
        # value, so the extraction becomes a plain shift.  Values are
        # IDENTICAL to the per-digit formula (the DuckDB twin keeps it).
        def build_h() -> list[Column]:
            h = F.md5("s")
            return [
                F.conv(F.substring(h, 1, 15), 16, 10).cast("long").alias("h60"),
                F.conv(F.substring(h, 16, 1), 16, 10).cast("long").alias("h4"),
            ]

        inv = inv.select("id", *memo_cols(("sh_h", hash_fn), build_h))

        def bit(j: int) -> Column:
            if j < 60:
                shift = 4 * (15 - (j // 4 + 1)) + (j % 4)
                return F.shiftright(F.col("h60"), shift).bitwiseAND(F.lit(1))
            return F.shiftright(F.col("h4"), j % 4).bitwiseAND(F.lit(1))
    else:
        inv = inv.select(
            "id",
            *memo_cols(
                ("sh_h", hash_fn), lambda: [F.xxhash64("s").alias("h")]
            ),
        )

        def bit(j: int) -> Column:
            return F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1))

    aggs = memo_cols(
        ("sh_aggs", bits, hash_fn),
        lambda: [
            F.sum(F.when(bit(j) == 1, 1).otherwise(-1)).alias(f"s{j}")
            for j in range(bits)
        ],
    )
    wide = inv.groupBy("id").agg(*aggs)

    def build_fp() -> list[Column]:
        bit_cols = []
        for j in range(bits):
            weight = (1 << j) if j < 63 else -(1 << 63)
            bit_cols.append(
                F.when(F.col(f"s{j}") > 0, F.lit(weight).cast("long"))
                .otherwise(F.lit(0).cast("long"))
            )
        return [reduce(lambda a, b: a.bitwiseOR(b), bit_cols).alias("simhash")]

    return wide.select("id", memo_cols(("sh_fp", bits), build_fp)[0])


def simhash_near_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                       max_hamming: int = 3, k: int = 3,
                       hash_fn: str = "xxh") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance. Candidate generation by
    16-bit band equality (any of 4 bands equal -> candidate), then exact
    popcount verification."""
    from .exprcache import memo_cols

    fps = simhash(df, text_col, id_col, 64, k, hash_fn)
    explode_c, cond_c = memo_cols(
        ("sh_pair_exprs",),
        lambda: [
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(b).alias("band"),
                            F.shiftright(F.col("simhash"), b * 16)
                            .bitwiseAND(F.lit(0xFFFF))
                            .alias("chunk"),
                        )
                        for b in range(4)
                    ]
                )
            ).alias("bb"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.id") < F.col("b.id")),
        ],
    )
    banded = fps.select("id", "simhash", explode_c).select(
        "id", "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk")
    )
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, cond_c)
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                F.col("a.simhash").alias("h_a"), F.col("b.simhash").alias("h_b"))
        .distinct()
    )
    ham = cand.withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
    return ham.filter(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")


def near_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    threshold: float = 0.7, num_hashes: int = 64, bands: int = 16, k: int = 3,
    hash_fn: str = "xxh",
) -> DataFrame:
    """End-to-end near-dedup: MinHash-LSH pairs -> connected components over
    the duplicate graph -> keep the min-id representative per component.

    This is the operator a training-data pipeline actually runs: pairs alone
    aren't a dedup (A~B, B~C must collapse to one survivor even if A!~C).
    Components come from min-id label propagation (algorithms.py) over the
    pair edges — iterations bounded by duplicate-cluster diameter, which is
    tiny in practice.

    Storage contract: the component labels are the one set of checkpoint
    blocks the returned plan reads from (iterative results have no lineage
    to recompute). Superseded iterations are released inside the loop; when
    the caller is done with the result,
    ``age_spark.runtime.cache.release_plan_checkpoints(result)`` frees the
    final one — nothing else stays pinned."""
    from ..algorithms import connected_components

    pairs = minhash_dedup_pairs(
        df, text_col, id_col, num_hashes, bands, k, threshold,
        materialize=True, hash_fn=hash_fn,
    )
    try:
        ids = df.select(F.col(id_col).alias("id"))
        edges = pairs.select(F.col("id_a").alias("start_id"), F.col("id_b").alias("end_id"))
        comps = connected_components(ids, edges, max_iterations=20)
    finally:
        # connected_components eagerly localCheckpoints its final state, so
        # the cached pair set is no longer reachable from the returned plan
        # — release it here (CacheManager pins persisted plans until an
        # explicit unpersist; GC never frees them).
        pairs.unpersist(blocking=False)
    keep = comps.filter(F.col("id") == F.col("component")).select("id")
    return df.join(keep, df[id_col] == keep["id"], "left_semi")


def embedding_near_pairs(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95, n_bands: int = 24, band_planes: int = 4,
    dim: int = 64,
) -> DataFrame:
    """Embedding-cosine near-dup pairs (id_a < id_b, cosine >= threshold).

    Scale path: banded random-projection LSH candidates + exact cosine
    verify — the cosine analogue of MinHash banding. Two vectors at cosine
    >= 0.8 (angle <= 36.9 deg) collide in one 4-bit band with p ~= 0.40;
    with 24 bands the miss probability is (1-p)^24 ~= 5e-6 per pair. At a
    looser threshold raise n_bands (0.45 -> band p ~= 0.18; 48 bands keep
    the miss probability under 1e-4). The only shuffle is the equi-join on
    (band, band-signature) — candidates, not n^2. Exact verification keeps
    precision at 1.0; recall is tunable via n_bands.
    ``embedding_near_pairs_exact`` is the O(n^2) verifier twin;
    tests/test_similarity.py::test_embedding_near_pairs_lsh_agrees_with_exact
    asserts the two produce the identical pair set at test scale."""
    from .similarity import _rp_band_signatures, cosine

    base = emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    sigs = base.withColumn(
        "sigs", _rp_band_signatures(F.col("v"), n_bands, band_planes, dim)
    )
    banded = sigs.select("id", F.posexplode("sigs").alias("band", "sig"))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.sig") == F.col("b.sig"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    va = base.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    vb = base.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    out = (
        cand.join(va, "id_a").join(vb, "id_b")
        .withColumn("cosine", cosine(F.col("v_a"), F.col("v_b")))
    )
    return out.filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


def embedding_near_pairs_exact(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Brute-force O(n^2) twin of ``embedding_near_pairs`` — the test-only
    verifier (never the declared operator: an all-pairs join is a
    scale-killer at 100 TB)."""
    from .similarity import cosine

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("v_a"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("v_b"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    out = pairs.withColumn("cosine", cosine(F.col("v_a"), F.col("v_b")))
    return out.filter(F.col("cosine") >= threshold).select(
        "id_a", "id_b", F.round("cosine", 6).alias("cosine")
    )


def semantic_dedup(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding",
    threshold: float = 0.45, n_bands: int = 48,
) -> DataFrame:
    """SemDeDup-style embedding-space near-duplicate clustering: RP-LSH
    banded candidate pairs with exact cosine verify (embedding_near_pairs),
    connected components over the duplicate graph, and the min-id member
    of each component as its representative.  Returns one row per input
    vector — (vec_id, rep_id, is_representative) — so callers can either
    filter the corpus (keep representatives) or map members to survivors.

    100 TB shape: the only shuffles are the banded equi-join (candidates,
    not n^2) and the component label propagation (iterations bounded by
    cluster diameter); nothing is collected."""
    from ..algorithms import connected_components

    pairs = embedding_near_pairs(emb, id_col, vec_col, threshold, n_bands)
    ids = emb.select(F.col(id_col).alias("id"))
    edges = pairs.select(
        F.col("id_a").alias("start_id"), F.col("id_b").alias("end_id")
    )
    comps = connected_components(ids, edges, max_iterations=20)
    return comps.select(
        F.col("id").alias(id_col),
        F.col("component").alias("rep_id"),
        (F.col("id") == F.col("component")).alias("is_representative"),
    )


def exact_decontaminate(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    ref_text_col: str = "text",
) -> DataFrame:
    """Drop corpus documents whose normalized-text fingerprint appears in a
    reference set (benchmark/eval decontamination — a training pipeline
    must not train on its test sets).

    Single anti-join on the md5 digest; the reference side reduces to
    DISTINCT digests first (eval sets are small next to a 100 TB corpus, so
    AQE converts the anti-join to a broadcast at runtime — raw text never
    shuffles on either side)."""
    from .text import fingerprint

    ref = reference.select(fingerprint(F.col(ref_text_col)).alias("_fp")).distinct()
    return (
        corpus.withColumn("_fp", fingerprint(F.col(text_col)))
        .join(ref, "_fp", "left_anti")
        .drop("_fp")
    )


def ngram_decontaminate(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    ref_text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Eval-overlap decontamination at the n-gram level (the 13-gram rule
    large-scale pretraining pipelines apply): a corpus document is dropped
    when ANY of its word n-grams appears anywhere in the reference set —
    stricter than whole-text fingerprints, catches eval passages quoted
    inside larger documents.  Documents shorter than n words contribute
    their whole text as one gram (word_shingles' short-input rule).

    Scale shape: both sides explode to n-gram xxhash64 digests map-side
    (rows ∝ tokens, text itself never leaves the scan); the reference
    reduces to DISTINCT digests first (eval sets are small next to a
    100 TB corpus) so the membership probe is a broadcast left-semi join,
    and only the (small) contaminated-id set shuffles for the final
    anti-join."""

    def grams(c: Column) -> Column:
        return F.transform(word_shingles(c, n), lambda g: F.xxhash64(g))

    ref_g = reference.select(F.explode(grams(F.col(ref_text_col))).alias("_g")).distinct()
    doc_g = corpus.select(F.col(id_col), F.explode(grams(F.col(text_col))).alias("_g"))
    bad = (
        doc_g.join(F.broadcast(ref_g), "_g", "left_semi").select(id_col).distinct()
    )
    return corpus.join(bad, id_col, "left_anti")


def minhash_decontaminate(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref_text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    threshold: float = 0.7,
    hash_fn: str = "xxh",
) -> DataFrame:
    """Near-duplicate decontamination: drop corpus docs whose estimated
    Jaccard vs ANY reference doc is >= threshold (catches light rewording
    that exact fingerprints miss).

    Same banded-LSH shape as minhash_dedup_pairs but ACROSS two tables:
    candidates come from the (band, bucket) equi-join of corpus signatures
    against reference signatures — shuffle is proportional to collisions,
    never |corpus| x |reference|."""
    ref_ids = reference.select(
        F.monotonically_increasing_id().alias(id_col), F.col(ref_text_col).alias(text_col)
    )
    sig_c = minhash_signatures(corpus, text_col, id_col, num_hashes, k, hash_fn)
    sig_r = minhash_signatures(ref_ids, text_col, id_col, num_hashes, k, hash_fn)
    bc = _band_buckets(sig_c, num_hashes, bands, hash_fn).alias("c")
    br = _band_buckets(sig_r, num_hashes, bands, hash_fn).alias("r")
    cand = (
        bc.join(
            br,
            (F.col("c.band") == F.col("r.band")) & (F.col("c.bucket") == F.col("r.bucket")),
        )
        .select(F.col("c.id").alias("_cid"), F.col("r.id").alias("_rid"))
        .distinct()
    )
    sc = sig_c.select(F.col("id").alias("_cid"), F.col("sig").alias("_sig_c"))
    sr = sig_r.select(F.col("id").alias("_rid"), F.col("sig").alias("_sig_r"))
    contaminated = (
        cand.join(sc, "_cid").join(sr, "_rid")
        .withColumn(
            "_est",
            F.size(F.filter(F.zip_with("_sig_c", "_sig_r", lambda x, y: x == y), lambda z: z))
            / F.lit(num_hashes),
        )
        .filter(F.col("_est") >= threshold)
        .select(F.col("_cid").alias(id_col))
        .distinct()
    )
    return corpus.join(contaminated, id_col, "left_anti")


def contamination_share(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    ref_text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 13,
) -> DataFrame:
    """Per-document contamination SHARE: the fraction of a document's
    distinct word n-grams that appear anywhere in the reference set — the
    span-coverage report curation pipelines publish next to the binary
    drop rule (``ngram_decontaminate`` is the filter; this is the audit).

    Scale shape: identical to ngram_decontaminate — the reference reduces
    to DISTINCT gram digests (eval sets are small) and broadcasts; the
    corpus explodes to digests map-side and re-aggregates per document
    (one doc-keyed groupBy with partial aggregation).  Text never leaves
    the scan stage."""
    ref_g = (
        reference.select(F.explode(word_shingles(F.col(ref_text_col), n)).alias("_gs"))
        .select(F.xxhash64(F.col("_gs")).alias("_g"))
        .distinct()
    )
    doc_g = corpus.select(
        F.col(id_col), F.explode(word_shingles(F.col(text_col), n)).alias("_gs")
    ).select(F.col(id_col), F.xxhash64(F.col("_gs")).alias("_g"))
    hits = doc_g.join(
        F.broadcast(ref_g.withColumn("_hit", F.lit(1))), "_g", "left"
    )
    return hits.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.coalesce(F.sum("_hit"), F.lit(0)).cast("bigint").alias("n_contaminated"),
        F.round(
            F.coalesce(F.sum("_hit"), F.lit(0)) / F.count(F.lit(1)), 4
        ).alias("contamination_share"),
    )


def char_decontaminate(
    corpus: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    ref_text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 40,
    stride: int = 8,
    broadcast_max_windows: int = 2_000_000,
) -> DataFrame:
    """Character-level exact-substring decontamination: flag a corpus
    document when a ``window``-char run of its normalized text appears
    VERBATIM anywhere in the reference set — the complement of the token
    13-gram rule for eval passages that token boundaries miss (code,
    numbers, partially-tokenized quotes).

    The Rabin-Karp sampling trick keeps the corpus side cheap: corpus
    windows are taken every ``stride`` chars while the reference side
    enumerates EVERY offset, so any shared run of length >=
    window + stride - 1 is guaranteed to align one sampled corpus window
    with a reference window (no false negatives above that length; the
    reference side is the small one by construction).  Digests are md5,
    so the DuckDB oracle reproduces the decision exactly.

    Output: per corpus document, the sampled-window count, the number of
    contaminated sampled windows, and the drop verdict.

    Scale shape: both sides form windows map-side (substring over the
    normalized text — rows ∝ chars/stride, the text itself never leaves
    the scan); the reference reduces to DISTINCT digests; one doc-keyed
    groupBy with partial aggregation.  The reference-side broadcast is
    SIZE-GATED (same capped-probe idiom as vle._pruning_small_enough):
    a LocalLimit row probe plus a bounded char-sum bound the window count
    without ever scanning an oversized reference in full — past
    ``broadcast_max_windows`` the hint is dropped and AQE picks the join
    strategy from runtime sizes (a too-big eval set degrades to a shuffle
    instead of OOMing every executor).

    NOT fully lazy: the size gate runs ONE eager Spark job at call time
    (a single aggregate over ``reference.limit(cap + 1)`` — each doc is
    >= 1 window, so the truncated char-sum only matters when the row
    count already fits, in which case it is exact).  The probe scans at
    most cap+1 rows, so letting the returned plan re-read the reference
    lazily is cheaper than pinning a persist whose lifetime the caller
    would have to manage."""
    norm = lambda c: F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")

    def windows(c: Column, step: int) -> Column:
        t = norm(c)
        n = F.length(t)
        return F.transform(
            F.sequence(
                F.lit(1),
                F.greatest(n - window + 1, F.lit(1)),
                F.lit(step),
            ),
            lambda i: F.md5(F.substring(t, i, window)),
        )

    ref_w = reference.select(
        F.explode(windows(F.col(ref_text_col), 1)).alias("_w")
    ).distinct()
    doc_w = corpus.select(
        F.col(id_col), F.explode(windows(F.col(text_col), stride)).alias("_w")
    )
    # Every-offset windows ~= total reference chars, so bound the window
    # count with ONE capped probe job: LocalLimit stops the scan past
    # cap+1 rows (each doc is >= 1 window, so > cap rows is already too
    # big), and when the count fits the limit kept every row, making the
    # char-sum exact.
    probe = (
        reference.limit(broadcast_max_windows + 1)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.greatest(
                    F.length(norm(F.col(ref_text_col))) - window + 1, F.lit(1)
                )
            ).alias("w"),
        )
        .collect()[0]
    )
    ref_small = (
        probe["n"] <= broadcast_max_windows
        and (probe["w"] or 0) <= broadcast_max_windows
    )
    ref_side = ref_w.select(F.col("_w"), F.lit(True).alias("_hit"))
    if ref_small:
        ref_side = F.broadcast(ref_side)
    return (
        doc_w.join(ref_side, "_w", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            F.coalesce(
                F.sum(F.when(F.col("_hit"), 1).otherwise(0)), F.lit(0)
            ).cast("long").alias("n_contaminated"),
        )
        .withColumn("dropped", F.col("n_contaminated") > 0)
    )
