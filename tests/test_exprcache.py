"""exprcache.memo_cols: Column-expression memoization used by the dedup
kernels (minhash/simhash/banding) to cut driver-side plan-construction
py4j round trips (measured 2,709 -> ~230 per minhash_dedup_pairs call).

Pins the three things that make the memo safe:
  1. a hit returns the SAME Column objects without re-invoking build,
  2. distinct parameter keys never collide,
  3. a changed SparkContext invalidates everything (no stale JVM refs),
and that the kernels produce identical results on memo-cold vs memo-hot
calls (expressions are reused, results are recomputed).
"""

from pyspark.sql import functions as F

from age_spark.pipeline import exprcache
from age_spark.pipeline.exprcache import memo_cols


def _reset():
    exprcache._MEMO.clear()
    exprcache._MEMO_CTX = None


def test_hit_skips_build_and_returns_same_objects(spark):
    _reset()
    calls = []

    def build():
        calls.append(1)
        return [F.lit(1).alias("x"), F.lit(2).alias("y")]

    first = memo_cols(("t_hit",), build)
    second = memo_cols(("t_hit",), build)
    assert len(calls) == 1
    assert first is second
    # the memoized Columns are live: usable in a fresh query
    row = spark.range(1).select(*second).collect()[0]
    assert (row.x, row.y) == (1, 2)


def test_distinct_keys_do_not_collide(spark):
    _reset()
    a = memo_cols(("t_key", 1), lambda: [F.lit("a")])
    b = memo_cols(("t_key", 2), lambda: [F.lit("b")])
    assert a is not b
    assert spark.range(1).select(a[0].alias("v")).collect()[0].v == "a"
    assert spark.range(1).select(b[0].alias("v")).collect()[0].v == "b"


def test_context_change_invalidates(spark):
    _reset()
    memo_cols(("t_ctx",), lambda: [F.lit(1)])
    assert ("t_ctx",) in exprcache._MEMO
    # simulate a JVM restart: a different active context must clear the
    # dict before serving (stale java refs would crash on use)
    exprcache._MEMO_CTX = object()
    calls = []
    memo_cols(("t_ctx",), lambda: (calls.append(1), [F.lit(1)])[1])
    assert calls == [1]


def test_dedup_kernels_identical_cold_vs_hot(spark):
    """Memo-cold and memo-hot invocations of the memoizing kernels build
    the same expressions and recompute the same results from the data."""
    from age_spark.pipeline.dedup import minhash_dedup_pairs, simhash_near_pairs

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog today"),
            (2, "the quick brown fox jumps over the lazy dog tonight"),
            (3, "entirely different text about spark optimization work"),
            (4, "the quick brown fox jumps over the lazy dog today"),
        ],
        ["doc_id", "text"],
    )

    for fn, kw in [
        (minhash_dedup_pairs, dict(threshold=0.5, hash_fn="md5")),
        (simhash_near_pairs, dict(max_hamming=8, hash_fn="md5")),
    ]:
        _reset()
        cold = sorted(map(tuple, fn(docs, **kw).collect()))
        assert exprcache._MEMO, "kernel should have populated the memo"
        hot = sorted(map(tuple, fn(docs, **kw).collect()))
        assert cold == hot
        assert cold, f"{fn.__name__} found no pairs on the duplicate fixture"
