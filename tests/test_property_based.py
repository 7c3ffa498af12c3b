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
