"""Driver-side memoization of immutable Column expression trees.

A ``pyspark.sql.Column`` is a thin wrapper over an UNRESOLVED JVM
expression tree — a pure value with no binding to any DataFrame, plan, or
data, safe to embed in any number of queries.  Building one costs a py4j
round trip per Column method call, and the wide dedup kernels pay
hundreds of them per invocation (the 64-permutation MinHash aggregate
list alone is ~350 calls; a cProfile of ``minhash_dedup_pairs`` showed
2,709 round trips ≈ 100% of its 1.3 s plan-construction time).  The
trees depend only on scalar parameters (num_hashes, bands, k, hash_fn,
column NAMES), so identical calls rebuild identical trees — memoize them.

This caches EXPRESSIONS only — never DataFrames, plans, or results; every
action on a query that embeds a memoized Column still computes from its
inputs.  (Same discipline as the AgeSession plan cache: the reusable
artifact is the compile-time object, the data path is untouched.)

Entries are keyed on the live SparkContext so a restarted JVM can never
see stale java object references: a new context clears the dict.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import Column

_MEMO: dict = {}
_MEMO_CTX = None


def memo_cols(key: tuple, build: Callable[[], Sequence[Column]]) -> Sequence[Column]:
    """Return ``build()``, memoized on ``key`` for the current SparkContext.

    ``key`` must capture EVERY parameter the built expressions depend on
    (column names and scalar knobs); ``build`` must be pure.  Returns the
    same list of Column objects on every hit — callers must not mutate it.
    """
    global _MEMO_CTX
    from pyspark import SparkContext

    sc = SparkContext._active_spark_context
    if sc is None or sc is not _MEMO_CTX:
        _MEMO.clear()
        _MEMO_CTX = sc
    if key not in _MEMO:
        _MEMO[key] = build()
    return _MEMO[key]
