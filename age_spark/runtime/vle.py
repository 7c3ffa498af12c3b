"""Variable-length edges (VLE) + shortest paths as iterative DataFrame BFS.

The reference implements `-[e*min..max]->` as a C depth-first enumerator over
an in-memory whole-graph adjacency cache (``src/backend/utils/adt/age_vle.c``:
design note at :20-75, DFS at :1045/:1190) — a single-node algorithm that
cannot scale past RAM. Our engine replaces it with **frontier-expansion via
joins**: each hop is one equi-join of the frontier against the edge table, so
Spark distributes the traversal and AQE handles skew. Semantics kept from the
reference (``age_vle.c:27-39``):

  - **edge-isomorphism**: no edge repeats within one path; vertices MAY
    repeat (openCypher-mandated; vertex-visited pruning would be incorrect).
  - zero-hop lower bound (``[*0..]``) yields the start vertex itself with an
    empty edge list (zero container, ``age_vle.c:1699``).
  - undirected traversal unions both edge orientations.
  - unbounded ``[*]`` terminates by edge depletion; we additionally cap depth
    at ``DEFAULT_MAX_HOPS`` (documented deviation — on cycle-rich 100 TB
    graphs unbounded enumeration is factorial, the cap is the scale-safe
    choice; raise it per-query when needed).

Per-hop state is (src, cur, edges ARRAY<edge>, nodes ARRAY<vertex>); the
uniqueness filter is an ARRAY containment check evaluated JVM-side.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

DEFAULT_MAX_HOPS = 30


def _oriented_edges(
    graph, types, direction: str, slim: bool = False, edge_filter=None
) -> DataFrame:
    scan = graph.scan_edges(types)
    if edge_filter is not None:
        # edge property prototype `[e*1..2 {k: v}]`: filter the edge scan
        # BEFORE traversal so the predicate pushes to parquet and the
        # frontier never carries non-matching edges (reference threads the
        # prototype into the DFS context, age_vle.c:1928 edge_prototype).
        scan = scan.filter(edge_filter(scan))
    if slim:
        # traversal-only state: the uniqueness filter needs just the edge id
        e = F.struct(F.col("id")).alias("_e")
    else:
        e = F.struct(
            F.col("id"), F.col("start_id"), F.col("end_id"), F.col("label"), F.col("properties")
        ).alias("_e")
    fwd = scan.select(e, F.col("start_id").alias("_s"), F.col("end_id").alias("_d"))
    if direction == "out":
        return fwd
    rev = scan.select(e, F.col("end_id").alias("_s"), F.col("start_id").alias("_d"))
    if direction == "in":
        return rev
    # undirected: a SELF-LOOP must appear once, not once per orientation —
    # the reference keeps self-loops in their own edges_self list exactly
    # so traversal visits them once (age_global_graph.c:642-657). The
    # filter pushes to the scan; no shuffle.
    rev_noloop = scan.filter(F.col("start_id") != F.col("end_id")).select(
        e, F.col("end_id").alias("_s"), F.col("start_id").alias("_d")
    )
    return fwd.unionByName(rev_noloop)


def vle_pairs(
    graph,
    types: Optional[list[str]],
    direction: str,
    min_hops: int,
    max_hops: Optional[int],
    seeds: Optional[DataFrame] = None,
    slim: bool = False,
    edge_filter=None,
) -> DataFrame:
    """All (src, dst, edges, nodes, hops) paths with hop count in
    [min_hops, max_hops]. ``nodes`` holds the interior vertices (between the
    endpoints), used for path materialization.

    ``edge_filter``: callable DataFrame->Column applied to the edge scan —
    the `[e*1..2 {weight: 5}]` property prototype (``age_vle.c:1928``).

    ``seeds``: DataFrame with a single column ``src`` restricting origins —
    the Spark analogue of the reference's terminal-qual rewrite (#2420):
    seeding from the bound side keeps the frontier proportional to the
    actual match, not the whole graph.

    ``slim``: the caller never reads the edge structs or interior nodes
    (anonymous `[*..]` with no path variable — the common aggregate case):
    carry only edge ids in flight and skip the per-hop interior-vertex join.
    """
    spark = graph.spark
    edges = _oriented_edges(graph, types, direction, slim=slim, edge_filter=edge_filter)
    edge_dt = edges.schema["_e"].dataType

    if seeds is None:
        seeds = graph.scan_vertices(None).select(F.col("id").alias("src"))
    seeds = seeds.distinct()

    vprops = graph.vertex_property_schema(None)
    vertex_dt_ddl = _vertex_ddl(graph)

    frontier = seeds.select(
        F.col("src"),
        F.col("src").alias("cur"),
        F.expr("array()").cast(f"array<{edge_dt.simpleString()}>").alias("edges"),
        F.expr("array()").cast(f"array<{vertex_dt_ddl}>").alias("nodes"),
    )

    hard_max = max_hops if max_hops is not None else DEFAULT_MAX_HOPS
    results: list[DataFrame] = []
    if min_hops <= 0:
        results.append(
            frontier.select(
                "src", F.col("cur").alias("dst"), "edges", "nodes", F.lit(0).alias("hops")
            )
        )

    # interior vertex structs come from joining the vertex table on arrival
    vtable = graph.scan_vertices(None).select(
        F.col("id").alias("_vid"),
        F.struct(F.col("id"), F.col("label"), F.col("properties")).alias("_v"),
    )

    for hop in range(1, hard_max + 1):
        joined = frontier.join(edges, frontier["cur"] == edges["_s"])
        # edge-isomorphism: the new edge must not already be on the path
        joined = joined.filter(
            ~F.exists(F.col("edges"), lambda x: x.getField("id") == F.col("_e").getField("id"))
        )
        # The arrival vertex is appended to the interior-node list only for
        # paths that continue (below, hop < hard_max); for emission at this
        # hop the arrival vertex is the endpoint, not interior, so emit
        # BEFORE appending.
        nxt = joined.select(
            F.col("src"),
            F.col("_d").alias("cur"),
            F.concat(F.col("edges"), F.array(F.col("_e"))).alias("edges"),
            F.col("nodes"),
        )
        if hop >= min_hops:
            results.append(
                nxt.select(
                    "src", F.col("cur").alias("dst"), "edges", "nodes", F.lit(hop).alias("hops")
                )
            )
        if hop < hard_max:
            if not slim:
                nxt = nxt.join(vtable, nxt["cur"] == vtable["_vid"]).select(
                    F.col("src"),
                    F.col("cur"),
                    F.col("edges"),
                    F.concat(F.col("nodes"), F.array(F.col("_v"))).alias("nodes"),
                )
            # cut lineage growth for DEEP traversals: each hop becomes a
            # fresh plan over materialized state instead of a 2^k nested
            # plan. For small bounded ranges ([*1..4] and tighter) skip the
            # checkpoint so Catalyst/AQE optimize the whole traversal as ONE
            # plan (broadcasts, reordering) with no per-hop materialization.
            if max_hops is None or hard_max > 4:
                nxt = nxt.localCheckpoint(eager=False)
            if max_hops is None:
                # unbounded: stop when the frontier drains
                if nxt.isEmpty():
                    frontier = nxt
                    break
        frontier = nxt

    if not results:
        return frontier.select(
            "src", F.col("cur").alias("dst"), "edges", "nodes", F.lit(0).alias("hops")
        ).limit(0)
    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    return out


def _vertex_ddl(graph) -> str:
    vprops = graph.vertex_property_schema(None)
    if vprops:
        inner = ",".join(f"`{n}`:{t.simpleString()}" for n, t in vprops)
    else:
        inner = "`_none`:string"
    return f"struct<id:bigint,label:string,properties:struct<{inner}>>"


def shortest_path_pairs(
    graph,
    start_filter,
    end_filter,
    types: Optional[list[str]] = None,
    direction: str = "out",
    min_hops: int = 0,
    max_hops: Optional[int] = None,
    all_paths: bool = False,
    slim: bool = False,
) -> DataFrame:
    """Unweighted shortest path(s) between vertex sets — BFS with early stop.

    ``slim``: caller only reads (src, dst, hops) — carry edge ids only (for
    the deterministic single-path tie-break) and skip interior-node
    materialization entirely.

    Mirrors ``shortest_path``/``all_shortest_paths``
    (``age_vle.c:3877/3892``, ``sp_compute_paths``): level-synchronous BFS
    from the start set; at the first level where a target is reached, emit
    the path(s) and stop. ``all_paths=False`` keeps one path per (src, dst)
    pair; True keeps all minimal-length paths.

    start_filter/end_filter: functions DataFrame->Column over the unified
    vertex scan, selecting endpoints.
    """
    vscan = graph.scan_vertices(None)
    starts = vscan.filter(start_filter(vscan)).select(F.col("id").alias("src"))
    targets = vscan.filter(end_filter(vscan)).select(F.col("id").alias("_tgt")).distinct()
    edges = _oriented_edges(graph, types, direction, slim=slim)
    edge_dt = edges.schema["_e"].dataType
    vddl = _vertex_ddl(graph)

    hard_max = max_hops if max_hops is not None else DEFAULT_MAX_HOPS

    # Target-closure pruning: every vertex on a path that ENDS at a target
    # can itself reach a target, so the forward BFS never needs edges whose
    # head lies outside the backward closure of the target set. Compute the
    # closure with a cheap set-BFS over reversed edges (vertex SET, no
    # per-source state), then semi-join the edge table down to it. For
    # selective targets this cuts the frontier from whole-graph size to the
    # relevant funnel (the common CALL shape: label-to-label with a small
    # target label); when targets reach most of the graph it degrades to
    # one extra pass over the edges, a constant factor the per-source
    # savings still dominate.
    reach = targets.select(F.col("_tgt").alias("_rv"))
    bfront = reach
    for _ in range(hard_max):
        if bfront.isEmpty():
            break
        step = (
            bfront.join(edges, bfront["_rv"] == edges["_d"])
            .select(F.col("_s").alias("_rv"))
            .distinct()
        )
        bfront = step.join(reach, "_rv", "left_anti").localCheckpoint(eager=False)
        reach = reach.unionByName(bfront).distinct().localCheckpoint(eager=False)
    edges = edges.join(reach, edges["_d"] == reach["_rv"], "left_semi")
    starts = starts.join(reach, starts["src"] == reach["_rv"], "left_semi")

    frontier = starts.distinct().select(
        F.col("src"),
        F.col("src").alias("cur"),
        F.expr("array()").cast(f"array<{edge_dt.simpleString()}>").alias("edges"),
        F.expr("array()").cast(f"array<{vddl}>").alias("nodes"),
    )
    # BFS visited set per source (vertex-level pruning IS correct for
    # shortest paths, unlike VLE): (src, vertex)
    visited = frontier.select("src", F.col("cur").alias("vid"))

    found_parts: list[DataFrame] = []

    # Shortest paths are computed per (src, dst) PAIR: a source must keep
    # expanding after its first hit, or pairs to farther targets are lost
    # (the reference computes a path per endpoint pair, ``age_vle.c:3877``).
    # Which targets a source can still reach is unknowable mid-BFS, so there
    # is NO valid per-source early stop: termination is visited-set frontier
    # drain (each source stops when it runs out of unvisited vertices) —
    # also cheaper than tracking found pairs, which costs extra distinct +
    # aggregate + anti-join shuffles per hop. A (src, dst) pair cannot be
    # re-emitted at a later hop: dst enters the visited set when first hit.

    if min_hops <= 0:
        hit0 = frontier.join(targets, frontier["cur"] == targets["_tgt"]).select(
            "src", F.col("cur").alias("dst"), "edges", "nodes", F.lit(0).alias("hops")
        )
        found_parts.append(hit0)

    for hop in range(1, hard_max + 1):
        if frontier.isEmpty():
            break
        joined = frontier.join(edges, frontier["cur"] == edges["_s"]).select(
            F.col("src"),
            F.col("_d").alias("cur"),
            F.concat(F.col("edges"), F.array(F.col("_e"))).alias("edges"),
            F.col("nodes"),
        )
        joined = joined.join(
            visited,
            (joined["src"] == visited["src"]) & (joined["cur"] == visited["vid"]),
            "left_anti",
        )
        joined = joined.localCheckpoint(eager=False)
        hits = joined.join(targets, joined["cur"] == targets["_tgt"])
        if hop >= min_hops:
            emitted = hits.select(
                "src", F.col("cur").alias("dst"), "edges", "nodes", F.lit(hop).alias("hops")
            )
            if not all_paths:
                emitted = emitted.withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("src", "dst")
                        .orderBy(F.transform(F.col("edges"), lambda x: x.getField("id")))
                    ),
                ).filter(F.col("_rn") == 1).drop("_rn")
            found_parts.append(emitted)
        visited = visited.unionByName(
            joined.select("src", F.col("cur").alias("vid"))
        ).distinct().localCheckpoint(eager=False)
        if slim:
            frontier = joined
        else:
            frontier = joined.join(
                vscan.select(
                    F.col("id").alias("_vid"),
                    F.struct(F.col("id"), F.col("label"), F.col("properties")).alias("_v"),
                ),
                joined["cur"] == F.col("_vid"),
            ).select(
                "src", "cur", "edges",
                F.concat(F.col("nodes"), F.array(F.col("_v"))).alias("nodes"),
            )

    if not found_parts:
        return frontier.select(
            "src", F.col("cur").alias("dst"), "edges", "nodes", F.lit(0).alias("hops")
        ).limit(0)
    out = found_parts[0]
    for p in found_parts[1:]:
        out = out.unionByName(p)
    return out
