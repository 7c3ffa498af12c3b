"""Property-based tests (hypothesis) for the round-9 rewritten operators:
random inputs drive the range join against the plain theta join and the
sequential packer against a pure-Python reference.  Spark jobs are slow
per example, so the strategies generate WHOLE datasets per example and
the example counts stay small — the value is in the adversarial shapes
(negative points, empty/inverted/huge intervals, zero-token docs), not
in volume.
"""

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

interval = st.tuples(
    st.integers(min_value=-5000, max_value=5000),  # lo
    st.integers(min_value=-200, max_value=60000),  # span (negative = inverted)
)

_SLOW = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


@settings(**_SLOW)
@given(
    points=st.lists(st.integers(min_value=-6000, max_value=6000), min_size=0, max_size=40),
    intervals=st.lists(interval, min_size=0, max_size=25),
    bucket_width=st.sampled_from([1, 7, 64, 512]),
    cap=st.sampled_from([1, 4, 64]),
    levels=st.sampled_from([1, 2, 3]),
)
def test_range_join_matches_theta(spark, points, intervals, bucket_width, cap, levels):
    """For ANY inputs and bucket geometry, the bucketed join returns
    exactly the theta-join pair set: negative coordinates, inverted
    (hi < lo) intervals, spans past every level's cap, duplicate
    points — nothing is dropped or duplicated."""
    from age_spark.pipeline.events import range_join_bucketed

    left = spark.createDataFrame(
        [(i, p) for i, p in enumerate(points)] or [(0, None)], "id long, p long"
    ).filter(F.col("p").isNotNull())
    right = spark.createDataFrame(
        [(j, lo, lo + span) for j, (lo, span) in enumerate(intervals)]
        or [(0, None, None)],
        "rid long, lo long, hi long",
    ).filter(F.col("lo").isNotNull())
    got = sorted(
        (r.id, r.rid)
        for r in range_join_bucketed(
            left, right, "p", "lo", "hi",
            bucket_width=bucket_width, max_span_buckets=cap, levels=levels,
        ).collect()
    )
    want = sorted(
        (i, j)
        for i, p in enumerate(points)
        for j, (lo, span) in enumerate(intervals)
        if lo <= p <= lo + span
    )
    assert got == want


@settings(**_SLOW)
@given(
    lrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-100, 100)), min_size=0, max_size=25
    ),
    rrows=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-100, 100), st.integers(0, 99)),
        min_size=0,
        max_size=25,
    ),
    tolerance=st.sampled_from([None, 0, 7, 50]),
)
def test_asof_join_matches_reference(spark, lrows, rrows, tolerance):
    """Backward as-of (latest right at-or-before each left row, per key,
    within tolerance) equals a serial reference on any input — timestamp
    ties between sides (<= takes the same-instant right row), keys with
    no right rows, tolerance nulling.  Duplicate (key, ts) RIGHT rows
    are deduped first: with several values at one instant the window's
    pick among peers is undefined (as in any ASOF implementation)."""
    from age_spark.pipeline.events import asof_join

    rrows = list({(k, t): (k, t, v) for (k, t, v) in rrows}.values())
    left = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(lrows)] or [(0, None, None)],
        "id long, user_id int, ts long",
    ).filter(F.col("ts").isNotNull())
    right = spark.createDataFrame(
        [(k, t, v) for (k, t, v) in rrows] or [(None, None, None)],
        "user_id int, ts long, v int",
    ).filter(F.col("ts").isNotNull())
    got = {
        r.id: (r.v_right, r.ts_right)
        for r in asof_join(
            left, right, on="ts", by="user_id", tolerance=tolerance
        ).collect()
    }
    want = {}
    for i, (k, t) in enumerate(lrows):
        cand = [(rt, v) for (rk, rt, v) in rrows if rk == k and rt <= t]
        if not cand:
            want[i] = (None, None)
            continue
        rt, v = max(cand)
        if tolerance is not None and t - rt > tolerance:
            want[i] = (None, None)
        else:
            want[i] = (v, rt)
    assert got == want


@settings(**_SLOW)
@given(
    texts=st.lists(
        st.text(alphabet="ab \t", min_size=0, max_size=30), min_size=0, max_size=25
    ),
    max_tokens=st.sampled_from([1, 3, 8]),
    bucket_size=st.sampled_from([4, 1024]),
)
def test_pack_sequential_matches_python_reference(spark, texts, max_tokens, bucket_size):
    """The distributed bucketed greedy packer equals a serial Python
    replay of the same rule on every input: whitespace-only docs
    (0 tokens), over-budget docs, bucket boundaries."""
    from age_spark.pipeline.packing import pack_sequences_sequential

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows or [(0, None)], "doc_id long, text string").filter(
        F.col("text").isNotNull()
    )
    got = {
        r.pack_id: (list(r.doc_ids), r.total_tokens)
        for r in pack_sequences_sequential(
            df, max_tokens=max_tokens, bucket_size=bucket_size
        ).collect()
    }

    # serial reference: per bucket in id order, break before overflow
    want = {}
    from collections import defaultdict

    buckets = defaultdict(list)
    for i, t in rows:
        n = len(t.split())
        buckets[i // bucket_size].append((i, n))
    for b, docs in buckets.items():
        k, cur, tot = 0, [], 0
        for i, n in docs:
            if cur and tot + n > max_tokens:
                want[f"b{b}-{k}"] = (cur, tot)
                k, cur, tot = k + 1, [], 0
            cur.append(i)
            tot += n
        if cur:
            want[f"b{b}-{k}"] = (cur, tot)
    assert got == want


# ---------------------------------------------------------------- dedup
# The md5 lane (hash_fn="md5") makes the whole seeded-dedup family
# Python-replicable: _hash60 is int(md5(s).hexdigest()[:15], 16), the
# permutation coefficients are a seeded PRNG, and banding buckets hash the
# '|'-joined band values.  These twins recompute the FULL pipeline
# (normalize -> shingle -> sign/signature -> band -> verify) in plain
# Python, so every assertion is exact — no probabilistic recall slack.

import hashlib
import re as _re
from collections import defaultdict

_P = (1 << 31) - 1

# whitespace-noisy texts over a tiny vocab to force shingle collisions
_word = st.sampled_from(["aa", "bb", "cc", "ripe", "Aa"])
_sep = st.sampled_from([" ", "  ", "\t", " \n "])
_text = st.builds(
    lambda ws, seps: "".join(w + s for w, s in zip(ws, seps + [" "])),
    st.lists(_word, min_size=0, max_size=6),
    st.lists(_sep, min_size=6, max_size=6).map(list),
)
_corpus = st.lists(_text, min_size=0, max_size=8)


def _py_norm(t):
    # Spark's trim() strips SPACES only (not \t/\n), so a trailing tab
    # survives as a trailing space after \s+ collapse — mirror exactly
    return _re.sub(r"\s+", " ", t.strip(" ").lower())


def _py_shingles(t, k):
    toks = _py_norm(t).split(" ")
    if len(toks) >= k:
        return list(dict.fromkeys(
            " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
        ))
    return [" ".join(toks)]


def _py_h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_sig(shingles, coeffs):
    hs = [_py_h60(s) % _P for s in shingles]
    return [min((h * a + b) % _P for h in hs) for a, b in coeffs]


def _py_lsh_pairs(sigs, bands, r):
    buckets = defaultdict(list)
    for i, sig in sigs.items():
        for b in range(bands):
            key = "|".join(str(x) for x in sig[b * r:(b + 1) * r] + [b])
            buckets[(b, _py_h60(key))].append(i)
    pairs = set()
    for ids in buckets.values():
        ids = sorted(ids)
        pairs.update((a, b) for ai, a in enumerate(ids) for b in ids[ai + 1:])
    return pairs


def _mk_docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)) or [(0, None)], "doc_id long, text string"
    ).filter(F.col("text").isNotNull())


@settings(**_SLOW)
@given(texts=_corpus, threshold=st.sampled_from([0.25, 0.5, 1.0]))
def test_minhash_pairs_match_python_twin(spark, texts, threshold):
    """minhash_dedup_pairs (md5 lane) equals the full-pipeline Python
    twin: identical signatures, identical LSH candidates, identical
    estimated-Jaccard values — whitespace noise, case, empty texts and
    duplicate docs included."""
    from age_spark.pipeline.dedup import _perm_coeffs, minhash_dedup_pairs

    NH, BANDS, K = 16, 8, 2
    coeffs = _perm_coeffs(NH)
    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_dedup_pairs(
            _mk_docs(spark, texts), num_hashes=NH, bands=BANDS, k=K,
            threshold=threshold, hash_fn="md5",
        ).collect()
    }
    sigs = {i: _py_sig(_py_shingles(t, K), coeffs) for i, t in enumerate(texts)}
    want = {}
    for a, b in _py_lsh_pairs(sigs, BANDS, NH // BANDS):
        est = sum(x == y for x, y in zip(sigs[a], sigs[b])) / NH
        if est >= threshold:
            want[(a, b)] = est
    assert set(got) == set(want)
    for pair, est in want.items():
        assert abs(got[pair] - round(est, 6)) < 2e-6, pair


@settings(**_SLOW)
@given(texts=_corpus, max_hamming=st.sampled_from([0, 3]))
def test_simhash_pairs_match_exact_hamming(spark, texts, max_hamming):
    """simhash_near_pairs (md5 lane) equals exact Hamming over the
    Python-twin fingerprints.  With max_hamming <= 3 and 4 16-bit bands,
    the pigeonhole guarantees EVERY such pair shares a band, so the
    expected set is the full Hamming ball — recall exactly 1, no LSH
    slack — and the fingerprints themselves must match the twin's
    bit-by-bit construction (sign of +/-1 sums per md5 bit)."""
    from age_spark.pipeline.dedup import simhash, simhash_near_pairs

    K = 2
    fps = {
        r.id: r.simhash
        for r in simhash(_mk_docs(spark, texts), k=K, hash_fn="md5").collect()
    }

    def py_fp(t):
        sums = [0] * 64
        for s in _py_shingles(t, K):
            hx = hashlib.md5(s.encode()).hexdigest()
            h60, h4 = int(hx[:15], 16), int(hx[15], 16)
            for j in range(64):
                if j < 60:
                    bit = (h60 >> (4 * (15 - (j // 4 + 1)) + j % 4)) & 1
                else:
                    bit = (h4 >> (j % 4)) & 1
                sums[j] += 1 if bit else -1
        v = sum(1 << j for j in range(63) if sums[j] > 0)
        return v - (1 << 63) if sums[63] > 0 else v

    want_fps = {i: py_fp(t) for i, t in enumerate(texts)}
    assert fps == want_fps

    got = {
        (r.id_a, r.id_b): r.hamming
        for r in simhash_near_pairs(
            _mk_docs(spark, texts), max_hamming=max_hamming, k=K, hash_fn="md5"
        ).collect()
    }
    want = {}
    ids = sorted(want_fps)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1:]:
            ham = bin((want_fps[a] ^ want_fps[b]) & ((1 << 64) - 1)).count("1")
            if ham <= max_hamming:
                want[(a, b)] = ham
    assert got == want


@settings(**_SLOW)
@given(texts=_corpus, threshold=st.sampled_from([0.3, 0.6, 1.0]))
def test_ngram_jaccard_matches_python_twin(spark, texts, threshold):
    """ngram_jaccard_pairs (md5 lane) equals LSH-candidates intersected
    with exact set Jaccard, both recomputed in Python: precision is
    pinned at 1.0 (every returned jaccard is the true one) and the
    operator's actual capture set is deterministic, not sampled."""
    from age_spark.pipeline.dedup import _perm_coeffs, ngram_jaccard_pairs

    NH, BANDS, K = 16, 8, 2
    coeffs = _perm_coeffs(NH)
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(
            _mk_docs(spark, texts), k=K, threshold=threshold,
            num_hashes=NH, bands=BANDS, hash_fn="md5",
        ).collect()
    }
    sh = {i: set(_py_shingles(t, K)) for i, t in enumerate(texts)}
    sigs = {i: _py_sig(sorted(s), coeffs) for i, s in sh.items()}
    want = {}
    for a, b in _py_lsh_pairs(sigs, BANDS, NH // BANDS):
        jac = len(sh[a] & sh[b]) / len(sh[a] | sh[b])
        if jac >= threshold:
            want[(a, b)] = jac
    assert set(got) == set(want)
    for pair, jac in want.items():
        assert abs(got[pair] - round(jac, 6)) < 2e-6, pair


@settings(**_SLOW)
@given(
    ts=st.lists(
        st.integers(min_value=-10_000, max_value=10_000), min_size=0, max_size=40
    ),
    keys=st.lists(st.integers(0, 2), min_size=0, max_size=40),
    slide=st.sampled_from([1, 7, 50]),
    panes=st.sampled_from([1, 2, 4, 8]),
)
def test_sliding_aggregate_matches_pane_membership(spark, ts, keys, slide, panes):
    """For ANY timestamps (negative included), slide, and pane count, the
    map-side pane replication produces exactly the brute-force pane
    membership: every window start is a multiple of slide, a row lands
    in a window iff win_start <= ts < win_start + window, and per-key
    counts match a pure-Python twin."""
    from age_spark.pipeline.events import sliding_aggregate

    window = slide * panes
    n = min(len(ts), len(keys))
    rows = [(i, ts[i], keys[i]) for i in range(n)]
    df = spark.createDataFrame(
        rows or [(0, None, None)], "id long, t long, k long"
    ).filter(F.col("t").isNotNull())
    got = {
        (r.win_start, r.k): r.n
        for r in sliding_aggregate(
            df, "t", window, slide, [F.count(F.lit(1)).alias("n")], keys=("k",)
        ).collect()
    }
    want: dict = {}
    for _i, t, k in rows:
        # brute force: every multiple of slide s with s <= t < s + window
        lo = -(-(t - window + 1) // slide)  # ceil((t - window + 1) / slide)
        for m in range(lo, t // slide + 1):
            want[(m * slide, k)] = want.get((m * slide, k), 0) + 1
    assert got == want
