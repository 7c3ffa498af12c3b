"""Checkpoint-block bookkeeping for iterative operators.

Iterative DataFrame loops (WCC label propagation, PageRank, BFS) must cut
lineage each round — Catalyst re-analysis cost otherwise grows with the
iteration count — and ``localCheckpoint`` is the mechanism. Its cost is
that every checkpoint pins its blocks in the block manager until an
explicit release: ``DataFrame.unpersist()`` only covers CacheManager
entries, and the ContextCleaner frees checkpointed RDDs asynchronously at
best. In a long-lived session that is a leak (one pinned RDD per
superseded iteration).

The helpers here release checkpoint blocks deterministically by reaching
the ``LogicalRDD`` leaves of a plan and unpersisting their underlying
RDDs. Releasing a checkpoint a DataFrame still depends on makes that
DataFrame unreadable (lineage was truncated — the blocks ARE the data), so
the two legitimate call sites are:

  - a superseded iteration state, after the next state is materialized;
  - a consumed final result, by the caller, once it is done with it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _logical_rdd_leaves(df: DataFrame):
    """The LogicalRDD leaf nodes of the analyzed plan (py4j objects)."""
    plan = df._jdf.queryExecution().analyzed()
    leaves = plan.collectLeaves()
    out = []
    for i in range(leaves.size()):
        node = leaves.apply(i)
        if node.getClass().getSimpleName() == "LogicalRDD":
            out.append(node)
    return out


def checkpoint_rdd_ids(df: DataFrame) -> list[int]:
    """Ids of the checkpoint RDDs the plan reads from (diagnostics/tests)."""
    return [n.rdd().id() for n in _logical_rdd_leaves(df)]


def release_plan_checkpoints(
    df: DataFrame, blocking: bool = False, protected_ids: set[int] | None = None
) -> int:
    """Unpersist every checkpoint RDD in ``df``'s plan; returns how many.

    After this, ``df`` (and anything derived from it) can no longer be
    evaluated — call it only when the result is fully consumed.
    ``protected_ids``: RDD ids still referenced by live plans (e.g. the
    un-replaced tables of a mutable graph, which may share a checkpoint
    leaf with a superseded table created in the same statement); those
    leaves are left pinned."""
    n = 0
    for node in _logical_rdd_leaves(df):
        rdd = node.rdd()
        if protected_ids and rdd.id() in protected_ids:
            continue
        rdd.unpersist(blocking)
        n += 1
    return n
