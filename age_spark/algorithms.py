"""Whole-graph algorithms as iterative DataFrame computations.

The reference has no graph-analytics surface (no PageRank/components/
centrality — its only traversals are VLE and shortest path). These are the
additive analytics operators, built in the same frontier/fixpoint style as
the VLE runtime: each iteration is an equi-join + aggregate that Catalyst
plans (broadcast/AQE apply), with localCheckpoint lineage cuts. PySpark has
no GraphX binding; this DataFrame formulation is the Python-native
equivalent of GraphX's Pregel loop and scales the same way (state is one
row per vertex, messages are one shuffle per iteration).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degrees(edges: DataFrame) -> DataFrame:
    """(id, out_degree) — helper for PageRank normalization."""
    return edges.groupBy(F.col("start_id").alias("id")).agg(
        F.count(F.lit(1)).alias("out_degree")
    )


def pagerank(
    vertices: DataFrame,
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 10,
) -> DataFrame:
    """PageRank over (id) vertices and (start_id, end_id) directed edges.

    Per iteration: one shuffle (contribution aggregate by destination) +
    one broadcast-able join back to the rank table. Dangling-vertex mass is
    redistributed uniformly, so ranks sum to ~1.0 at every step.
    """
    v = vertices.select("id").distinct()
    n = v.count()
    if n == 0:
        return v.withColumn("rank", F.lit(0.0))
    deg = degrees(edges)
    state = v.withColumn("rank", F.lit(1.0 / n))
    base = (1.0 - damping) / n

    for _ in range(iterations):
        withdeg = state.join(deg, "id", "left")
        linked = withdeg.filter(F.col("out_degree").isNotNull())
        # dangling mass folded in as a broadcast 1-row crossJoin — no
        # driver collect() per iteration, so one job per iteration
        dangling = withdeg.filter(F.col("out_degree").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling_m")
        )
        contribs = (
            linked.join(edges, linked["id"] == edges["start_id"])
            .select(
                F.col("end_id").alias("id"),
                (F.col("rank") / F.col("out_degree")).alias("c"),
            )
            .groupBy("id")
            .agg(F.sum("c").alias("c"))
        )
        state = (
            v.join(contribs, "id", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("c"), F.lit(0.0)) + F.col("_dangling_m") / n)
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return state


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    max_iterations: int = 50,
) -> DataFrame:
    """Weakly-connected components by min-id label propagation: each vertex
    adopts the smallest component id among itself and its neighbors until a
    fixpoint. Hops are bounded by the graph diameter; each is one shuffle
    (neighbor-min aggregate). Returns (id, component) where component =
    min vertex id in the component.

    Driver rounds are HALVED by running TWO hops per round (the BFS
    round-halving trick, OPTIMIZATION_r10 §4): the first hop stays pure
    lineage inside the round's single checkpoint job, so each round costs
    one checkpoint job + one convergence count instead of two of each.
    The two-hop fixpoint test is sound because min-propagation is
    MONOTONE (labels never increase): state_{k} == state_{k+2} pointwise
    forces state_{k+1} equal too.  An odd ``max_iterations`` rounds up to
    the next even hop budget (a bound, not a semantic)."""
    sym = edges.select(
        F.col("start_id").alias("a"), F.col("end_id").alias("b")
    ).unionByName(
        edges.select(F.col("end_id").alias("a"), F.col("start_id").alias("b"))
    )
    from .runtime.cache import release_plan_checkpoints

    state = vertices.select("id").distinct().withColumn("component", F.col("id"))
    prev_checkpointed = None  # the superseded round's pinned blocks

    def hop(s: DataFrame) -> DataFrame:
        neigh = (
            s.join(sym, s["id"] == sym["a"])
            .select(F.col("b").alias("id"), F.col("component"))
            .groupBy("id")
            .agg(F.min("component").alias("n_comp"))
        )
        return s.join(neigh, "id", "left").select(
            "id",
            F.least(
                F.col("component"),
                F.coalesce(F.col("n_comp"), F.col("component")),
            ).alias("component"),
        )

    for _ in range((max_iterations + 1) // 2):
        nxt = hop(hop(state)).localCheckpoint(eager=True)
        # eager: the convergence count below reads it immediately, so eager
        # costs nothing extra and rules out lazy-checkpoint block loss
        # under memory pressure
        changed = (
            nxt.alias("n")
            .join(state.alias("s"), "id")
            .filter(F.col("n.component") != F.col("s.component"))
            .limit(1)
            .count()
        )
        # nxt and the convergence check are both materialized, so the
        # superseded state's checkpoint blocks are dead — release them now
        # (they are NOT auto-freed; a long run would otherwise pin every
        # round's copy of the vertex set for the life of the session)
        if prev_checkpointed is not None:
            release_plan_checkpoints(prev_checkpointed)
        prev_checkpointed = nxt
        state = nxt
        if changed == 0:
            break
    # the final state stays pinned — it IS the result's storage (lineage was
    # truncated). The caller owns releasing it via release_plan_checkpoints
    # once the result is consumed.
    return state


def triangle_count(edges: DataFrame) -> DataFrame:
    """Global triangle count on the undirected simple graph: canonical-order
    edges (a<b) joined twice — the standard two-join formulation; Catalyst
    picks the join strategy, AQE handles skew."""
    e = (
        edges.select(
            F.least("start_id", "end_id").alias("a"),
            F.greatest("start_id", "end_id").alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    wedges = e1.join(e2, F.col("e1.b") == F.col("e2.a")).select(
        F.col("e1.a").alias("x"), F.col("e2.b").alias("z")
    )
    tri = wedges.join(e3, (F.col("x") == F.col("e3.a")) & (F.col("z") == F.col("e3.b")))
    return tri.agg(F.count(F.lit(1)).alias("n_triangles"))
