"""Training-pipeline extras: sequence packing, stratified sampling,
corpus decontamination (beyond-reference operators)."""

import os

import pytest

from pyspark.sql import functions as F

from age_spark.pipeline.dedup import exact_decontaminate, minhash_decontaminate
from age_spark.pipeline.packing import pack_sequences
from age_spark.pipeline.sampling import stratified_cap, stratified_sample

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


def _docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


def test_pack_sequences_partition_of_corpus(spark):
    docs = _docs(spark)
    packs = pack_sequences(docs, max_tokens=512).cache()
    rows = packs.collect()
    # every doc appears in exactly one pack
    packed_ids = [d for r in rows for d in r.doc_ids]
    assert len(packed_ids) == len(set(packed_ids))
    assert len(packed_ids) == docs.count()
    # no pack exceeds the budget unless it is a single oversize doc
    for r in rows:
        assert r.total_tokens <= 512 or r.n_docs == 1
        assert r.n_docs == len(r.doc_ids)
    # packing actually packs: mean fill ratio well above single-doc feeding
    from statistics import mean

    multi = [r.fill_ratio for r in rows if r.total_tokens <= 512]
    assert mean(multi) > 0.5, mean(multi)
    packs.unpersist()


def test_pack_sequences_token_totals(spark):
    from age_spark.pipeline.text import token_count

    docs = _docs(spark)
    total_tokens = docs.select(F.sum(token_count(F.col("text")))).collect()[0][0]
    packs = pack_sequences(docs, max_tokens=512)
    assert packs.select(F.sum("total_tokens")).collect()[0][0] == total_tokens


def test_pack_sequential_deterministic_and_greedy(spark):
    """pack_sequences_sequential is a pure function of (ids, token
    counts): identical across partitionings, packs in id order within
    each bucket, breaks before overflow, over-budget docs pack alone."""
    from age_spark.pipeline.packing import pack_sequences_sequential

    docs = spark.createDataFrame(
        [
            (0, "a b c"),          # 3 tokens
            (1, "d e f g"),        # 4 -> pack 0: [0, 1] (7 <= 8)
            (2, "h i j"),          # 3 -> would make 10 > 8: pack 1
            (3, " ".join("x" * 1 for _ in range(20))),  # 20 oversize: alone
            (4, "k l"),            # 2 -> new pack after oversize
            (64, "m"),             # next bucket (bucket_size=64)
        ],
        "doc_id long, text string",
    )
    out = {
        r.pack_id: (list(r.doc_ids), r.total_tokens)
        for r in pack_sequences_sequential(
            docs, max_tokens=8, bucket_size=64
        ).collect()
    }
    assert out == {
        "b0-0": ([0, 1], 7),
        "b0-1": ([2], 3),
        "b0-2": ([3], 20),
        "b0-3": ([4], 2),
        "b1-0": ([64], 1),
    }
    repart = {
        r.pack_id: (list(r.doc_ids), r.total_tokens)
        for r in pack_sequences_sequential(
            docs.repartition(5), max_tokens=8, bucket_size=64
        ).collect()
    }
    assert repart == out


def test_stratified_sample_rates(spark):
    docs = _docs(spark).withColumn("stratum", F.col("doc_id") % 2)
    out = stratified_sample(docs, "stratum", {"0": 1.0, "1": 0.0}).cache()
    assert out.filter(F.col("stratum") == 1).count() == 0
    assert out.filter(F.col("stratum") == 0).count() == docs.filter(F.col("stratum") == 0).count()
    # uniform 0.5: keep count in loose binomial bounds, deterministic per seed
    half = stratified_sample(docs, "stratum", 0.5, seed=7)
    n, total = half.count(), docs.count()
    assert 0.35 * total < n < 0.65 * total
    assert half.count() == n  # re-evaluation is stable for a given seed
    out.unpersist()


def test_stratified_sample_deterministic_under_repartition(spark):
    # F.rand(seed) seeds per partition, so a repartition would change the
    # sample; the hash draw must not (VERDICT r2 #5).
    docs = _docs(spark).withColumn("stratum", F.col("doc_id") % 2)
    base = {r.doc_id for r in stratified_sample(docs, "stratum", 0.5, seed=7, id_col="doc_id").select("doc_id").collect()}
    rep = {
        r.doc_id
        for r in stratified_sample(
            docs.repartition(7), "stratum", 0.5, seed=7, id_col="doc_id"
        ).select("doc_id").collect()
    }
    assert base == rep and len(base) > 0
    # different seed -> different sample (the seed actually participates)
    other = {r.doc_id for r in stratified_sample(docs, "stratum", 0.5, seed=8, id_col="doc_id").select("doc_id").collect()}
    assert base != other


def test_stratified_cap_random_deterministic_under_repartition(spark):
    docs = _docs(spark).withColumn("stratum", F.col("doc_id") % 5)
    a = {r.doc_id for r in stratified_cap(docs, "stratum", 10, seed=3, id_col="doc_id").select("doc_id").collect()}
    b = {
        r.doc_id
        for r in stratified_cap(docs.repartition(7), "stratum", 10, seed=3, id_col="doc_id").select("doc_id").collect()
    }
    assert a == b and len(a) == 50


def test_stratified_cap(spark):
    docs = _docs(spark).withColumn("stratum", F.col("doc_id") % 5)
    capped = stratified_cap(docs, "stratum", 10, order_col="doc_id")
    counts = {r.stratum: r.n for r in capped.groupBy("stratum").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert all(v == 10 for v in counts.values())
    # order_col picks the TOP rows per stratum (desc)
    top = capped.filter(F.col("stratum") == 0).agg(F.min("doc_id")).collect()[0][0]
    below = docs.filter(F.col("stratum") == 0).agg(F.max("doc_id")).collect()[0][0]
    assert top > below - 5 * 10 * 2  # top ids come from the high end


def test_exact_decontaminate(spark):
    docs = _docs(spark)
    # reference set = 20 docs verbatim + noise that matches nothing
    ref = docs.filter(F.col("doc_id") < 20).select("text").unionByName(
        spark.createDataFrame([("zz unique never-seen text qq",)], "text string")
    )
    clean = exact_decontaminate(docs, ref)
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    assert not (kept & set(range(20))) - _dup_ids_of_first20(spark, docs)
    assert len(kept) <= docs.count() - 20


def _dup_ids_of_first20(spark, docs):
    """doc_ids >= 20 sharing a fingerprint with docs < 20 are ALSO removed —
    compute the full contaminated set for the assertion."""
    from age_spark.pipeline.text import fingerprint

    fp = docs.select("doc_id", fingerprint(F.col("text")).alias("fp"))
    bad = fp.filter(F.col("doc_id") < 20).select("fp").distinct()
    return {
        r.doc_id
        for r in fp.join(bad, "fp").select("doc_id").collect()
    }


def test_minhash_decontaminate(spark):
    docs = _docs(spark)
    ref = docs.filter(F.col("doc_id") < 10).select("text")
    clean = minhash_decontaminate(docs, ref, threshold=0.9)
    kept = {r.doc_id for r in clean.select("doc_id").collect()}
    # every verbatim reference doc is gone (est. Jaccard vs itself = 1.0)
    assert not kept & set(range(10))
    # most of the corpus survives
    assert len(kept) > docs.count() * 0.8


def test_ngram_jaccard_lsh_matches_exact(spark):
    """The declared LSH-driven n-gram Jaccard operator agrees with the
    all-pairs exact twin (precision 1.0 by construction; recall at these
    band settings is ~1-1e-13 at the 0.4 threshold)."""
    from age_spark.pipeline.dedup import ngram_jaccard_pairs, ngram_jaccard_pairs_exact

    docs = _docs(spark)
    lsh = {(r.id_a, r.id_b, r.jaccard) for r in ngram_jaccard_pairs(docs, threshold=0.4).collect()}
    exact = {(r.id_a, r.id_b, r.jaccard) for r in ngram_jaccard_pairs_exact(docs, threshold=0.4).collect()}
    assert lsh == exact


def _events(spark):
    from pyspark.sql.types import TimestampNTZType, TimestampType

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if isinstance(df.schema["ts"].dataType, (TimestampType, TimestampNTZType)):
        df = df.withColumn("ts", F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000))
    return df


def test_asof_join_matches_duckdb(spark):
    """Union-sort as-of join == DuckDB's native ASOF JOIN."""
    import duckdb

    from age_spark.pipeline.events import asof_join

    ev = _events(spark)
    left = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    right = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    got = {
        (r.event_id, None if r.value_right is None else round(r.value_right, 6))
        for r in asof_join(left, right, on="ts", by="user_id").collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF_DIR}/events.parquet')"
    )
    want = {
        (eid, None if v is None else round(v, 6))
        for eid, v in con.execute(
            "SELECT l.event_id, r.value FROM "
            "(SELECT * FROM events WHERE event_type='purchase') l "
            "ASOF LEFT JOIN (SELECT * FROM events WHERE event_type='click') r "
            "ON l.user_id = r.user_id AND l.ts >= r.ts"
        ).fetchall()
    }
    assert got == want


def test_asof_join_tolerance_and_no_match(spark):
    from age_spark.pipeline.events import asof_join

    left = spark.createDataFrame([(1, 100, 1000), (2, 100, 50)], "id long, user_id long, ts long")
    right = spark.createDataFrame([(100, 900, 7.0), (100, 60, 9.0)], "user_id long, ts long, v double")
    out = {r.id: (r.v_right, r.ts_right) for r in asof_join(left, right).collect()}
    assert out[1] == (7.0, 900)   # latest at-or-before 1000
    assert out[2] == (None, None)  # nothing at-or-before 50
    tight = {
        r.id: r.v_right
        for r in asof_join(left, right, tolerance=50).collect()
    }
    assert tight[1] is None  # 1000-900 > 50 -> nulled out


def test_range_join_bucketed_matches_theta(spark):
    from age_spark.pipeline.events import range_join_bucketed

    left = spark.createDataFrame([(i, i * 7 % 100) for i in range(50)], "id long, p long")
    right = spark.createDataFrame(
        [(j, j * 11 % 80, j * 11 % 80 + 15) for j in range(20)], "rid long, lo long, hi long"
    )
    got = {
        (r.id, r.rid)
        for r in range_join_bucketed(left, right, "p", "lo", "hi", bucket_width=8).collect()
    }
    want = {
        (r.id, r.rid)
        for r in left.join(
            right, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
        ).collect()
    }
    assert got == want


def test_range_join_bucketed_wide_intervals(spark):
    """Intervals spanning MORE than max_span_buckets base buckets must
    still match — r8's cap silently TRUNCATED them, dropping every point
    past bucket lo+cap (VERDICT r8 What's-wrong #1).  With cap 4 /
    width 8 / levels=3 the fixtures exercise every lane: level 0
    (narrow), level 1 (12 base buckets, width-32 buckets), level 2
    (~50 base buckets, width-128 buckets), and the broadcast residue
    (500 base buckets — more than cap level-2 buckets)."""
    from age_spark.pipeline.events import range_join_bucketed

    left = spark.createDataFrame(
        [(i, i * 97 % 4000) for i in range(200)], "id long, p long"
    )
    right = spark.createDataFrame(
        [
            (0, 0, 4000),      # 500-bucket span: broadcast residue
            (1, 100, 3900),    # 475-bucket span: broadcast residue
            (2, 10, 20),       # narrow: level 0
            (3, 3500, 3600),   # 12-bucket span: level 1 (width 32)
            (4, 64, 70),       # narrow: level 0
            (5, 1000, 1400),   # ~50-bucket span: level 2 (width 128)
        ],
        "rid long, lo long, hi long",
    )
    got = {
        (r.id, r.rid)
        for r in range_join_bucketed(
            left, right, "p", "lo", "hi",
            bucket_width=8, max_span_buckets=4, levels=3,
        ).collect()
    }
    want = {
        (r.id, r.rid)
        for r in left.join(
            right, (F.col("p") >= F.col("lo")) & (F.col("p") <= F.col("hi"))
        ).collect()
    }
    assert got == want
    # the all-covering interval alone must contribute one pair per left row
    assert sum(1 for _, rid in got if rid == 0) == 200


def test_range_join_count_sum_matches_pairs_agg(spark):
    """The aggregation-pushdown range join must equal
    range_join_bucketed + groupBy bit-for-bit, across bucket widths
    (pure performance knob), including: single-bucket intervals,
    interior-only coverage, empty (hi < lo) intervals, negative points
    (truncation-vs-floor bucketing), duplicate points, and the
    wide-interval broadcast residue."""
    from age_spark.pipeline.events import range_join_bucketed, range_join_count_sum

    left = spark.createDataFrame(
        [(i, (i * 97) % 4000 - 200) for i in range(300)]
        + [(1000 + i, 42) for i in range(5)],  # duplicate points
        "id long, p long",
    )
    right = spark.createDataFrame(
        [
            (0, -100, 4000),   # wide: broadcast residue at cap 4
            (1, 40, 44),       # single bucket (width 8)
            (2, 10, 20),       # narrow
            (3, 3500, 3600),   # spans > cap -> residue at cap 4
            (4, 500, 400),     # empty (hi < lo): matches nothing
            (5, -150, -50),    # negative range
            (6, 0, 31),        # interior + edges
        ],
        "rid long, lo long, hi long",
    )
    want = {
        (r.rid, r.n, r.s)
        for r in range_join_bucketed(
            left, right, "p", "lo", "hi", bucket_width=8, max_span_buckets=4
        )
        .groupBy("rid")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("p").alias("s"))
        .collect()
    }
    for width in (8, 32, 512):
        got = {
            (r.rid, r.n_in_range, r.sum_points)
            for r in range_join_count_sum(
                left, right, "p", "lo", "hi",
                bucket_width=width, right_id="rid", max_span_buckets=4,
            ).collect()
        }
        assert got == want, f"width {width}"


def test_redact_pii(spark):
    """PII scrub (emails / IPv4 / intl phone): tokens replace matches,
    counts come from the original text; patterns are RE2/Java-common so
    the DuckDB oracle twin (p_redact_pii) agrees byte-for-byte."""
    from age_spark.pipeline.text import redact_pii

    df = spark.createDataFrame(
        [
            (1, "mail a.b+x@test.co.uk from 10.0.0.1 call +44 20 7946 0958 done"),
            (2, "no pii here, just 1.5 numbers and an @ sign"),
            (3, "two mails x@y.io y@z.dev and ip 192.168.0.255"),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in redact_pii(df).collect()}
    assert rows[1].redacted == "mail <EMAIL> from <IP> call <PHONE> done"
    assert (rows[1].n_email, rows[1].n_ip, rows[1].n_phone) == (1, 1, 1)
    assert rows[2].redacted == df.collect()[1].text  # untouched
    assert (rows[2].n_email, rows[2].n_ip, rows[2].n_phone) == (0, 0, 0)
    assert rows[3].redacted == "two mails <EMAIL> <EMAIL> and ip <IP>"
    assert rows[3].n_email == 2 and rows[3].n_ip == 1


def test_repetition_signals(spark):
    """Gopher-style repetition filters: duplicate-line ratio and top-
    bigram fraction, computed map-only (sorted-array run-length walk —
    no explode/shuffle); p_repetition_signals is the DuckDB twin."""
    from age_spark.pipeline.text import repetition_signals

    df = spark.createDataFrame(
        [
            (1, "a b\na b\nc d"),            # one duplicated line of three
            (2, "the cat the cat the cat"),  # 'the cat' takes 3 of 5 bigrams
            (3, ""),
            (4, "one"),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in repetition_signals(df).collect()}
    assert rows[1].n_lines == 3 and rows[1].dup_line_ratio == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert rows[1].top_bigram_ratio == pytest.approx(0.4)
    assert rows[2].top_bigram_ratio == pytest.approx(0.6)
    assert rows[3].n_lines == 0 and rows[3].top_bigram_ratio == 0.0
    assert rows[4].n_bigrams == 0 and rows[4].dup_line_ratio == 0.0


def test_trigram_similarity_join_exact(spark):
    """Prefix-filtered similarity join (PPJoin scheme) must equal the
    brute-force cross join EXACTLY — recall 1.0 is the prefix theorem's
    guarantee, precision 1.0 comes from the trigram_similarity verify."""
    from age_spark.compiler.exprs import trigram_similarity
    from age_spark.pipeline.fuzzyjoin import trigram_similarity_join

    L = spark.createDataFrame(
        [(1, "John Smith"), (2, "Jane Doe"), (3, "Robert Brown"),
         (4, "Alice Walker"), (5, "unique zzz")],
        "doc_id int, text string",
    )
    R = spark.createDataFrame(
        [(11, "Jon Smith"), (12, "Jane Doe"), (13, "Roberta Browne"),
         (14, "Bob Marley"), (15, "Alyce Walker")],
        "doc_id int, text string",
    )
    def check(t):
        got = sorted(tuple(r) for r in trigram_similarity_join(L, R, threshold=t).collect())
        brute = (
            L.alias("a").crossJoin(R.alias("b"))
            .select(
                F.col("a.doc_id").alias("id_l"),
                F.col("b.doc_id").alias("id_r"),
                F.round(trigram_similarity(F.col("a.text"), F.col("b.text")), 6).alias("sim"),
            )
            .filter(F.col("sim") >= t)
        )
        want = sorted(tuple(r) for r in brute.collect())
        assert got == want, t
        return got

    # thresholds are independent plans; the wall time is compile latency,
    # so overlap them (same pooling rule as the replay batches)
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=3) as ex:
        results = list(ex.map(check, (0.4, 0.6, 0.8)))
    # identical strings always survive any threshold
    assert any(a == 2 and b == 12 for a, b, _ in results[-1])


def test_ngram_decontaminate_catches_quoted_passage(spark):
    """The n-gram rule drops a doc QUOTING an eval passage inside a larger
    text — the case whole-text fingerprints miss — and keeps clean docs."""
    from age_spark.pipeline.dedup import ngram_decontaminate

    eval_passage = "alpha beta gamma delta epsilon zeta eta theta"
    docs = spark.createDataFrame(
        [
            (1, f"intro words here {eval_passage} trailing content words"),
            (2, "a completely unrelated document about other things entirely"),
            (3, eval_passage),  # verbatim copy
        ],
        ["doc_id", "text"],
    )
    ref = spark.createDataFrame([(eval_passage,)], ["text"])
    kept = sorted(
        r["doc_id"]
        for r in ngram_decontaminate(docs, ref, n=8).select("doc_id").collect()
    )
    assert kept == [2]


def test_ngram_decontaminate_short_doc_whole_text_rule(spark):
    """Docs shorter than n words contribute their whole text as one gram:
    a short doc is dropped only on a whole-text match."""
    from age_spark.pipeline.dedup import ngram_decontaminate

    docs = spark.createDataFrame(
        [(1, "tiny doc"), (2, "other tiny")], ["doc_id", "text"]
    )
    ref = spark.createDataFrame([("tiny doc",)], ["text"])
    kept = [r["doc_id"] for r in ngram_decontaminate(docs, ref, n=13).collect()]
    assert kept == [2]


def test_unigram_logprob_ranks_common_above_rare(spark):
    """A document of corpus-common tokens must outscore one of rare/OOV
    tokens; token counts and determinism hold."""
    from age_spark.pipeline.text import unigram_logprob

    rows = [(i, "common words appear often in this corpus") for i in range(10)]
    rows += [(100, "common words appear often in this corpus"),
             (101, "zzyzx qwfp xyzzy plugh vexing jabberwock unseen tokens")]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in unigram_logprob(docs, vocab_size=7).collect()}
    assert out[100]["logprob"] > out[101]["logprob"]
    assert out[101]["n_tokens"] == 8
    out2 = {r["doc_id"]: r for r in unigram_logprob(docs, vocab_size=7).collect()}
    assert {k: (v["logprob"], v["n_tokens"]) for k, v in out.items()} == \
           {k: (v["logprob"], v["n_tokens"]) for k, v in out2.items()}


def test_temperature_mixture_reweights_small_sources(spark):
    """Temperature > 1 moves the mixture toward uniform: the small
    source's share rises vs its natural proportion; quotas never exceed a
    source's row count; selection is deterministic under repartition."""
    from age_spark.pipeline.sampling import temperature_mixture

    rows = [(i, "a", i) for i in range(80)]
    rows += [(100 + i, "b", i) for i in range(16)]
    rows += [(200 + i, "c", i) for i in range(4)]
    df = spark.createDataFrame(rows, ["doc_id", "source", "q"])

    def shares(t):
        out = temperature_mixture(
            df, "source", temperature=t, target_total=50,
            order_col="q", id_col="doc_id",
        )
        by = {r["source"]: r["n"] for r in out.groupBy("source").count()
              .withColumnRenamed("count", "n").collect()}
        return by

    nat = shares(1.0)      # ∝ 80:16:4  -> 40:8:2
    hot = shares(100.0)    # ~uniform    -> ~16:16:4(capped)
    assert nat == {"a": 40, "b": 8, "c": 2}
    assert hot["c"] == 4 and hot["b"] > nat["b"] and hot["a"] < nat["a"]
    # deterministic under repartition
    out1 = sorted(r["doc_id"] for r in temperature_mixture(
        df, "source", 2.0, 50, order_col="q", id_col="doc_id").collect())
    out2 = sorted(r["doc_id"] for r in temperature_mixture(
        df.repartition(7), "source", 2.0, 50, order_col="q", id_col="doc_id").collect())
    assert out1 == out2


def test_tfidf_topk_hand_values(spark):
    """TF-IDF on a 3-doc corpus, checked against hand-computed values:
    a term present in every document gets idf = ln(4/4)+1 = 1.0 (score =
    tf); a term unique to one document gets idf = ln(4/2)+1; ranking
    breaks score ties by term ASC."""
    import math

    from age_spark.pipeline.text import tfidf_topk

    df = spark.createDataFrame(
        [(1, "apple apple banana common"),
         (2, "banana common"),
         (3, "cherry common common")],
        ["doc_id", "text"],
    )
    out = {(r["doc_id"], r["term"]): (r["tfidf"], r["rank"])
           for r in tfidf_topk(df, k=2).collect()}
    idf_unique = math.log(4.0 / 2.0) + 1.0   # df=1 -> ln((3+1)/(1+1))+1
    idf_two = math.log(4.0 / 3.0) + 1.0      # df=2
    assert out[(1, "apple")] == (round(2 * idf_unique, 4), 1)
    assert out[(1, "banana")] == (round(1 * idf_two, 4), 2)
    # doc 3: common tf=2 * idf 1.0 = 2.0 beats cherry 1*1.693
    assert out[(3, "cherry")] == (round(idf_unique, 4), 2)
    # 'common' in all 3 docs: idf = ln(4/4)+1 = 1.0, score == tf
    assert out[(3, "common")] == (2.0, 1)
    # every doc yields at most k rows
    assert max(
        len([k for k in out if k[0] == d]) for d in (1, 2, 3)
    ) <= 2


def test_bpe_pair_counts_hand_values(spark):
    """Pair counting matches the by-hand merge table; whitespace is
    collapsed, case folded, single-token docs yield nothing."""
    from age_spark.pipeline.text import bpe_pair_counts

    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "A  b\ta"), (3, "solo"), (4, "")],
        ["doc_id", "text"],
    )
    got = {(r["pair"], r["n"]) for r in bpe_pair_counts(df).collect()}
    # doc1: (a b)x2 (b a)x2 ; doc2: (a b) (b a)
    assert got == {("a b", 3), ("b a", 3)}
    # top_n truncates deterministically (count DESC, pair ASC)
    one = bpe_pair_counts(df, top_n=1).collect()
    assert [(one[0]["pair"], one[0]["n"])] == [("a b", 3)]


def test_contamination_share_hand_values(spark):
    """Share = contaminated distinct n-grams / distinct n-grams; a doc
    wholly inside the reference scores 1.0, a disjoint doc 0.0, and a
    half-quoted doc the exact fraction."""
    from age_spark.pipeline.dedup import contamination_share

    ref = spark.createDataFrame([("one two three four",)], ["text"])
    docs = spark.createDataFrame(
        [(1, "one two three four"),          # fully contaminated
         (2, "alpha beta gamma delta"),      # clean
         (3, "zero one two three four")],    # grams: (zero..two? no) see below
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in contamination_share(docs, ref, n=3).collect()}
    # doc1: grams {one two three, two three four} both in ref -> 1.0
    assert (out[1]["n_grams"], out[1]["n_contaminated"]) == (2, 2)
    assert out[1]["contamination_share"] == 1.0
    # doc2: 2 grams, none hit
    assert (out[2]["n_contaminated"], out[2]["contamination_share"]) == (0, 0.0)
    # doc3: grams {zero one two, one two three, two three four} -> 2/3
    assert (out[3]["n_grams"], out[3]["n_contaminated"]) == (3, 2)
    assert out[3]["contamination_share"] == 0.6667


def test_vocab_stats_zipf_profile(spark):
    """Rank order, shares and cumulative shares match the hand-counted
    frequency table; top_n truncates after ranking."""
    from age_spark.pipeline.text import vocab_stats

    df = spark.createDataFrame(
        [(1, "a a a b b c"), (2, "a b x")], ["doc_id", "text"]
    )
    rows = vocab_stats(df, top_n=3).collect()
    got = [(r["rank"], r["token"], r["n"], r["share"], r["cum_share"]) for r in rows]
    # counts: a=4, b=3, c=1, x=1 (ties c/x broken by token asc); total=9
    assert got == [
        (1, "a", 4, round(4 / 9, 6), round(4 / 9, 6)),
        (2, "b", 3, round(3 / 9, 6), round(7 / 9, 6)),
        (3, "c", 1, round(1 / 9, 6), round(8 / 9, 6)),
    ]


def test_char_decontaminate_catches_offset_verbatim_run(spark):
    """A corpus doc embedding a >= window+stride-1 char VERBATIM run of an
    eval doc is flagged at ANY offset (the Rabin-Karp sampling guarantee);
    clean docs keep dropped=false."""
    from age_spark.pipeline.dedup import char_decontaminate

    passage = "the quick brown fox jumps over the lazy dog near the riverbank today"
    ref = spark.createDataFrame([(100, passage)], "doc_id long, text string")
    docs = spark.createDataFrame(
        [
            # guarantee bound: window=20, stride=5 -> any shared run >= 24
            # chars must be caught; embed at awkward offsets
            (1, "xyzab " + passage + " tail"),
            (2, "prefix words then " + passage[10:45] + " suffix"),
            (3, "completely unrelated text with no overlap at all here"),
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.dropped
        for r in char_decontaminate(docs, ref, window=20, stride=5).collect()
    }
    assert out[1] is True
    assert out[2] is True   # 35-char verbatim slice >= 24
    assert out[3] is False


def test_sliding_aggregate(spark):
    """sliding_aggregate vs the window-replication identity computed in
    plain Python: every window start is a multiple of slide with
    ws <= ts < ws + window (exactly window/slide starts per row, negative
    timestamps included), aggregates grouped by (win_start, key)."""
    from collections import defaultdict

    from age_spark.pipeline.events import sliding_aggregate

    W, S = 100, 25
    rows = [(i, i * 37 % 1000 - 200, i % 3) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, ts long, k long")
    got = {
        (r.win_start, r.k): (r.n, r.s)
        for r in sliding_aggregate(
            df, "ts", W, S,
            [F.count(F.lit(1)).alias("n"), F.sum("id").alias("s")],
            keys=("k",),
        ).collect()
    }
    want = defaultdict(lambda: [0, 0])
    for i, ts, k in rows:
        for m in range((ts - W) // S + 1, ts // S + 1):  # ts-W < m*S <= ts
            want[(m * S, k)][0] += 1
            want[(m * S, k)][1] += i
    assert got == {kk: tuple(v) for kk, v in want.items()}

    with pytest.raises(ValueError):
        sliding_aggregate(df, "ts", 100, 33, [F.count(F.lit(1)).alias("n")])


def test_dsir_importance_weights(spark):
    """DSIR weights vs a pure-Python twin (same md5 bucketing, add-one
    smoothing, log-ratio sum); target-like docs must outrank unrelated
    ones, and the result must be identical under repartitioning."""
    import hashlib
    import math
    import re
    from collections import Counter

    from age_spark.pipeline.sampling import dsir_importance_weights

    target_texts = [
        "the model trains on clean data",
        "clean data makes the model better",
    ]
    raw_texts = [
        "the model trains on clean data",        # in-domain
        "clean data makes the model better",     # in-domain
        "zebra quokka visits purple volcanoes",  # out-of-domain
        "one",                                   # < 2 tokens: drops out
        "the model trains on clean data today",  # near-domain
    ]
    NB = 64

    def toks(t):
        return [w for w in re.split(r"\s+", t.strip().lower()) if w]

    def feats(t):
        ws = toks(t)
        return [
            int(hashlib.md5(f"{a} {b}".encode()).hexdigest()[:15], 16) % NB
            for a, b in zip(ws, ws[1:])
        ]

    ct, cr = Counter(), Counter()
    for t in target_texts:
        ct.update(feats(t))
    for t in raw_texts:
        cr.update(feats(t))
    nt, nr = sum(ct.values()), sum(cr.values())
    want = {}
    for i, t in enumerate(raw_texts):
        fs = feats(t)
        if not fs:
            continue
        w = sum(
            math.log((ct[b] + 1) / (nt + NB)) - math.log((cr[b] + 1) / (nr + NB))
            for b in fs
        )
        want[i] = (round(w, 4), len(fs))

    raw = spark.createDataFrame(
        list(enumerate(raw_texts)), "doc_id long, text string"
    )
    target = spark.createDataFrame(
        list(enumerate(target_texts)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.dsir_weight, r.n_features)
        for r in dsir_importance_weights(raw, target, n_buckets=NB).collect()
    }
    assert set(got) == set(want)
    for i in want:
        assert got[i][1] == want[i][1], i
        assert abs(got[i][0] - want[i][0]) < 2e-4, (i, got[i], want[i])
    # in-domain beats out-of-domain
    assert got[0][0] > got[2][0] and got[1][0] > got[2][0]
    # deterministic under repartitioning
    again = {
        r.doc_id: (r.dsir_weight, r.n_features)
        for r in dsir_importance_weights(
            raw.repartition(7), target.repartition(3), n_buckets=NB
        ).collect()
    }
    assert again == got


def test_seeded_shuffle(spark):
    """seeded_shuffle must produce the exact permutation a pure-Python
    md5 sort produces, be a dense 0..n-1 assignment, be stable under
    repartitioning, and change with the seed."""
    import hashlib

    from age_spark.pipeline.sampling import seeded_shuffle

    ids = list(range(37))
    df = spark.createDataFrame([(i, f"t{i}") for i in ids], "doc_id long, text string")

    def py_order(seed):
        keyed = sorted(
            ids,
            key=lambda i: (
                int(hashlib.md5(f"{seed}|{i}".encode()).hexdigest()[:15], 16),
                i,
            ),
        )
        return {i: pos for pos, i in enumerate(keyed)}

    got = {
        r.doc_id: r.shuffle_pos for r in seeded_shuffle(df, seed=42).collect()
    }
    assert got == py_order(42)
    assert sorted(got.values()) == list(range(len(ids)))
    again = {
        r.doc_id: r.shuffle_pos
        for r in seeded_shuffle(df.repartition(7), seed=42).collect()
    }
    assert again == got
    other = {
        r.doc_id: r.shuffle_pos for r in seeded_shuffle(df, seed=43).collect()
    }
    assert other == py_order(43) and other != got
