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

# BFS sides below this row count broadcast into their joins (ids only, so
# ~4M rows ≈ 32 MB serialized — inside executor memory at any scale); above
# it the joins fall back to shuffle exchanges
_SP_BCAST_ROWS = 4_000_000


def _pruning_small_enough(graph, targets) -> bool:
    """Size gate for the target-closure pruning broadcast, via limit-probes
    and never a full count: the whole-graph capped probe (cached per
    snapshot, invalidated by in-place loads) bounds any target subset, so
    repeated VLE queries on a small graph pay no per-query job; only when
    the graph itself exceeds the bound does the target set get its own
    LocalLimit probe, which stops scanning at _SP_BCAST_ROWS rows — a
    label-sized target set at 100x never pays a full-table count just to
    learn "too big"."""
    return (
        graph.vertex_count_capped(_SP_BCAST_ROWS) < _SP_BCAST_ROWS
        or targets.limit(_SP_BCAST_ROWS).count() < _SP_BCAST_ROWS
    )


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
    targets: Optional[DataFrame] = None,
    seeds_unique: bool = False,
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

    ``targets``: single-column (``_tv``) DataFrame of destination vertex
    ids the pattern's next node can match (its label scan) — a PRUNING
    hint, not a semantic filter: for BOUNDED traversals the expansion
    drops frontier rows whose arrival vertex cannot reach any target
    within the remaining hops (a lazy backward distance closure, the
    forward twin of shortest_path's target pruning).  The destination
    join after the traversal remains the semantic gate.
    """
    spark = graph.spark
    edges_lazy = _oriented_edges(graph, types, direction, slim=slim, edge_filter=edge_filter)
    if slim and edge_filter is None:
        # Slim traversal state is (edge-id, src, dst) — query-independent
        # given types + direction, so materialize it ONCE per snapshot and
        # share across VLE calls (snapshot-pinned like sp_thin; the GGC
        # analogue).  The lazy plan otherwise re-reads the unified
        # per-label union scan once PER HOP; the eager checkpoint is a
        # single pass reused by every hop of every query on the snapshot.
        edges = graph._scan_cached(
            ("vle_thin", tuple(types or ()), direction),
            [graph.scan_edges(types)],
            lambda: edges_lazy.localCheckpoint(eager=True),
        )
    else:
        edges = edges_lazy
    edge_dt = edges.schema["_e"].dataType

    # backward distance-to-target levels, built lazily INSIDE the one-job
    # plan (bounded case only): dist_leq[r] = ids within <= r reverse hops
    # of a target.  hard_max is small (<= 4 here), so the unrolled levels
    # stay a modest plan; each level is distinct()-deduped.  Size gate
    # (same constant shortest_path uses): the un-deduped target count is a
    # shuffle-free upper bound — past _SP_BCAST_ROWS the pruning hint would
    # force a broadcast of a potentially label-sized id set (driver OOM at
    # 100x), so pruning is skipped entirely and the post-traversal
    # destination join stays the (only) semantic gate.  Below it, only
    # dist_leq[0] (bounded by the counted target set) carries a broadcast
    # hint; the grown closure levels r >= 1 are UNBOUNDED (<=3 reverse hops
    # can approach the vertex set), so their semi-joins carry no hint and
    # AQE picks broadcast-vs-shuffle from runtime sizes — a too-big closure
    # degrades to a shuffle instead of killing the query.
    dist_leq: Optional[list[DataFrame]] = None
    if (
        targets is not None
        and max_hops is not None
        and 1 <= max_hops <= 4
        and _pruning_small_enough(graph, targets)
    ):
        rev = edges.select(F.col("_d").alias("_rs"), F.col("_s").alias("_rd"))
        # the base level keeps its distinct even for provably-unique label
        # scans: the Aggregate both dedups AND gives Catalyst a small size
        # estimate for the closure union, which keeps the per-hop continue
        # semi-join broadcast in the initial plan (measured: eliding it
        # flipped that join to SortMergeJoin + a frontier exchange)
        level = targets.select(F.col("_tv").alias("_pv")).distinct()
        dist_leq = [level]
        for _ in range(max_hops - 1):
            nxt_level = (
                level.join(rev, level["_pv"] == rev["_rs"])
                .select(F.col("_rd").alias("_pv"))
                .distinct()
            )
            cum = dist_leq[-1].unionByName(nxt_level).distinct()
            dist_leq.append(cum)
            level = nxt_level

    if seeds is None:
        # a whole-graph vertex scan's ids are unique by construction
        seeds = graph.scan_vertices(None).select(F.col("id").alias("src"))
    elif not seeds_unique:
        # duplicate seed rows would multiply every emitted path (and the
        # caller's join-back) — dedup unless the caller proved uniqueness
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
            emitted = nxt
            if dist_leq is not None:
                # emitted paths must END at a target — semi-join against
                # the target set inside the same job (broadcast is safe:
                # dist_leq[0] is bounded by the counted, gated target set)
                emitted = emitted.join(
                    F.broadcast(dist_leq[0]),
                    emitted["cur"] == dist_leq[0]["_pv"],
                    "left_semi",
                )
            results.append(
                emitted.select(
                    "src", F.col("cur").alias("dst"), "edges", "nodes", F.lit(hop).alias("hops")
                )
            )
        if hop < hard_max:
            if dist_leq is not None:
                # continuing rows must still be able to REACH a target in
                # the remaining hops: prune against the backward closure
                # remaining = hard_max - hop edges left to travel: the
                # arrival must be within that distance of some target.
                # Closure levels are size-unbounded -> no broadcast hint;
                # AQE decides (see the dist_leq comment above).
                allowed = dist_leq[min(hard_max - hop, len(dist_leq) - 1)]
                nxt = nxt.join(
                    allowed,
                    nxt["cur"] == allowed["_pv"],
                    "left_semi",
                )
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
                # Unbounded: stop when the frontier drains, and ALSO probe
                # whether any frontier vertex has an outgoing edge at all —
                # when none does, the next hop's expansion is provably
                # empty BEFORE its isomorphism filter, so its checkpoint
                # plan (a full edge pass at AQE plan time) is never built.
                # Both branches are LocalLimit(1) probes riding the
                # just-materialized checkpoint blocks in ONE job (the BFS
                # drain-probe trick); the edges STREAM against the small
                # frontier hash, so continuing hops short-circuit at the
                # first frontier-sourced edge.  The probe ignores edge
                # isomorphism (a superset test): probe-empty soundly
                # implies the next hop is empty; probe-nonempty just
                # continues, exactly like the old isEmpty loop.
                nonempty = nxt.select(F.lit(1).alias("_h")).limit(1)
                eprobe = (
                    edges.join(nxt, edges["_s"] == nxt["cur"], "left_semi")
                    .select(F.lit(2).alias("_h"))
                    .limit(1)
                )
                flags = {
                    r["_h"]
                    for r in nonempty.unionAll(eprobe).distinct().collect()
                }
                frontier = nxt
                if 1 not in flags or 2 not in flags:
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
    start_filter=None,
    end_filter=None,
    types: Optional[list[str]] = None,
    direction: str = "out",
    min_hops: int = 0,
    max_hops: Optional[int] = None,
    all_paths: bool = False,
    slim: bool = False,
    starts_df: Optional[DataFrame] = None,
    targets_df: Optional[DataFrame] = None,
    _chosen: bool = False,
    _n_starts: Optional[int] = None,
    _starts_unique: bool = False,
    _targets_unique: bool = False,
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

    A ``min_hops`` ABOVE the true shortest distance switches regimes: plain
    BFS cannot enumerate longer paths, so the search falls back to
    edge-distinct path enumeration (vertices MAY repeat, edges may not —
    ``age_vle.c:3600-3612``; ``age_shortest_path.sql`` sp_revisit pins the
    A->B->C->B->D length-4 path at min_hops=4).  Since the first qualifying
    depth of that regime equals the BFS answer whenever min_hops <= the
    shortest distance, any positive min_hops runs the exhaustive regime.

    start_filter/end_filter: functions DataFrame->Column over the unified
    vertex scan, selecting endpoints; starts_df/targets_df give the
    endpoint id sets as DataFrames (col `id`) instead — the shape used by
    the scalar shortest_path(a, b) function, whose endpoints come from the
    enclosing MATCH rows.
    """
    vscan = graph.scan_vertices(None)
    # endpoint sets sourced from the vertex scan are unique by
    # construction (ids ARE the scan's key), so their dedup exchanges are
    # statically elidable — the §2.4 distinct-on-unique-data class the
    # r10 VLE seed elision opened.  Caller-supplied endpoint DataFrames
    # (the scalar shortest_path(a, b) shape: ids from MATCH rows) keep
    # the distinct unless the recursion proved uniqueness (_*_unique).
    starts_unique = _starts_unique or starts_df is None
    targets_unique = _targets_unique or targets_df is None
    if starts_df is not None:
        starts = starts_df.select(F.col("id").alias("src"))
    else:
        starts = vscan.filter(start_filter(vscan)).select(F.col("id").alias("src"))
    if targets_df is not None:
        targets = targets_df.select(F.col("id").alias("_tgt"))
    else:
        targets = vscan.filter(end_filter(vscan)).select(F.col("id").alias("_tgt"))
    if not targets_unique:
        targets = targets.distinct()
    # Direction choice by endpoint cardinality (slim counting shapes only):
    # BFS state is |sources| x reachable-vertices, so traversing FROM the
    # smaller endpoint set over reversed edges and swapping (src, dst) at
    # the end shrinks every frontier, aggregation and anti-join by the
    # cardinality ratio — the lever that matters when a 100 TB call pairs
    # a huge start label with a handful of targets.  Safe in slim mode:
    # hops, the zero-hop (v, v) set, and minimal-path multiplicity are all
    # direction-symmetric, and slim never materializes path content (whose
    # deterministic representative COULD differ under reversal).  Two
    # LocalLimit probes decide; they stop scanning at the cap.
    if slim and not (min_hops and min_hops > 0) and not _chosen:
        # both LocalLimit probes in ONE marker-keyed job (they were two
        # sequential driver round-trips; the fixed start-side cap covers
        # the worst case 4 * probe + 8, so the swap decision is identical).
        # The capped counts are memoized per Graph like _vcount_capped
        # (keyed on the endpoint plans' semanticHash + _mutation_count, so
        # in-place loads/DDL self-invalidate and snapshot() writes start
        # fresh): a metadata gate, not a result — repeated calls over the
        # same snapshot skip the probe job entirely.
        _SWAP_PROBE = 4096
        _memo_key = (
            graph._mutation_count,
            targets.semanticHash(),
            starts.semanticHash(),
        )
        _probe_counts = graph._sp_probe_memo.get(_memo_key)
        if _probe_counts is None:
            _probe_counts = {
                r["_h"]: r["n"]
                for r in targets.limit(_SWAP_PROBE)
                .select(F.lit(0).alias("_h"))
                .unionAll(
                    starts.limit(4 * _SWAP_PROBE + 8).select(F.lit(1).alias("_h"))
                )
                .groupBy("_h")
                .agg(F.count(F.lit(1)).alias("n"))
                .collect()
            }
            graph._sp_probe_memo[_memo_key] = _probe_counts
            while len(graph._sp_probe_memo) > 32:
                graph._sp_probe_memo.pop(next(iter(graph._sp_probe_memo)))
        n_t = _probe_counts.get(0, 0)
        if n_t < _SWAP_PROBE and _probe_counts.get(1, 0) > 4 * n_t:
            rev = {"out": "in", "in": "out"}.get(direction, direction)
            sw = shortest_path_pairs(
                graph, types=types, direction=rev,
                min_hops=min_hops, max_hops=max_hops, all_paths=all_paths,
                slim=True,
                starts_df=targets.select(F.col("_tgt").alias("id")),
                targets_df=starts.select(F.col("src").alias("id")),
                _chosen=True,
                _n_starts=n_t,
                # uniqueness proofs swap with the endpoints
                _starts_unique=targets_unique,
                _targets_unique=starts_unique,
            )
            return sw.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                "edges", "nodes", "hops",
            )

    edges = _oriented_edges(graph, types, direction, slim=slim)
    edge_dt = edges.schema["_e"].dataType
    vddl = _vertex_ddl(graph)

    hard_max = max_hops if max_hops is not None else DEFAULT_MAX_HOPS
    if min_hops and min_hops > 0:
        if hard_max < min_hops:
            # unsatisfiable window (sp_min: min_hops > max_hops -> 0 rows)
            return _empty_sp_result(starts, edge_dt, vddl)
        return _sp_exhaustive(
            graph, starts, targets, edges, edge_dt, vddl, vscan,
            min_hops, hard_max, all_paths, slim,
        )

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
    # Driver-sync budget (VERDICT r3 #4): ONE eager checkpoint job per hop,
    # and the EDGE table is shuffled ONCE — repartitioned by the join key
    # up front (LogicalRDD keeps the partitioning through localCheckpoint),
    # so every hop's join exchanges only the tiny frontier side.  This is
    # the property that matters at 100 TB: the big table never re-shuffles
    # per iteration.  Each hop's new-vertex set is anti-joined against
    # everything reached so far, so the per-hop sets are DISJOINT — `reach`
    # is their plain lazy union of cached pieces (no distinct, no
    # checkpoint of its own), and the drain probe reads the just-cached
    # step for free.
    npart = int(edges.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # The unified edge scan (per-label union + struct build) costs a full
    # pass each time it is read; the iterative loops read it once per hop,
    # so for the slim traversal materialize the thin (src, dst) projection
    # ONCE and let every hop hit the cached rows instead (the path-carrying
    # mode keeps the lazy scan — its per-hop frontier join needs the edge
    # payload anyway).
    # The materialized thin table is query-independent (types + direction
    # only), so memoize it per Graph snapshot — the Spark analogue of the
    # reference's whole-graph GGC adjacency cache (age_global_graph.c):
    # repeated traversal calls over the same snapshot reuse the cached
    # blocks instead of re-scanning the edge tables.  Keyed through
    # _scan_cached, which pins the underlying scan identity, so any label
    # swap/write snapshot self-invalidates.
    thin_lazy = edges.select("_s", "_d")
    if slim:
        edges_thin = graph._scan_cached(
            ("sp_thin", tuple(types or ()), direction),
            [graph.scan_edges(types)],
            lambda: thin_lazy.localCheckpoint(eager=True),
        )
    else:
        edges_thin = thin_lazy
    edges_by_d = None  # pre-partitioned fallback, built only if ever needed
    # lazy checkpoint: the count() right below is the materializing action,
    # so each checkpoint+count pair costs ONE job instead of two — at ~20
    # sequential hops the saved short jobs are a measurable slice of SP
    # wall time
    ep_fused = None
    if _chosen:
        # Swapped run: the closure loop below runs zero rounds, so the
        # targets checkpoint's only consumer is the per-hop hit join, and
        # the starts side would otherwise pay its own frontier checkpoint
        # inside _sp_slim_bfs.  The two endpoint projections are
        # INDEPENDENT (no cross-dependence — unlike the s1/s2 hops, whose
        # fusion re-ran the inner edge pass), so materialize both in ONE
        # plan-time job via a marker-keyed union and read each side back
        # as marker-filtered blocks: one driver-blocking checkpoint
        # planning instead of two, zero recompute (post-checkpoint
        # filters are block scans).  Seed counters are never read in this
        # lane — skip the counting job too.
        ep_fused = (
            starts.select(F.lit(1).alias("_m"), F.col("src").alias("_id"))
            .unionByName(
                targets.select(F.lit(0).alias("_m"), F.col("_tgt").alias("_id"))
            )
            .localCheckpoint(eager=False)
        )
        starts = ep_fused.filter(F.col("_m") == 1).select(F.col("_id").alias("src"))
        reach0 = ep_fused.filter(F.col("_m") == 0).select(F.col("_id").alias("_rv"))
        reach_parts = [reach0]
        bfront = reach0
        n_bfront = n_reach = 0
    else:
        reach0 = targets.select(F.col("_tgt").alias("_rv")).localCheckpoint(eager=False)
        reach_parts = [reach0]
        bfront = reach0
        n_bfront = reach0.count()
        n_reach = n_bfront
    def _expand_back(front, n_front, reach, n_reach):
        """One backward hop: predecessors of `front` not yet in `reach`.
        The frontier/reached sets are usually tiny next to the edge table:
        broadcast them into a join against the RAW edge scan (no edge
        shuffle at all — the scan streams map-side).  The row-count guard
        comes free off the cached checkpoints; past it, fall back to a
        once-shuffled edge table keyed by the join side so the big table
        still never re-exchanges per hop."""
        nonlocal edges_by_d
        if n_front < _SP_BCAST_ROWS:
            joined = F.broadcast(front).join(
                edges_thin, front["_rv"] == edges_thin["_d"]
            )
        else:
            if edges_by_d is None:
                edges_by_d = graph._scan_cached(
                    ("sp_thin_by_d", tuple(types or ()), direction, npart),
                    [graph.scan_edges(types)],
                    lambda: edges_thin.repartition(npart, "_d").localCheckpoint(eager=True),
                )
            joined = front.join(edges_by_d, front["_rv"] == edges_by_d["_d"])
        rc = F.broadcast(reach) if n_reach < _SP_BCAST_ROWS else reach
        return (
            joined.select(F.col("_s").alias("_rv"))
            .distinct()
            .join(rc, "_rv", "left_anti")
        )

    # TWO hops per driver round: the closure only needs the SET, so hop
    # 2k+1 rides as a LAZY checkpoint (its stage runs once inside hop
    # 2k+2's job — still exactly one pass over the edges per hop) and only
    # the round's union materializes eagerly.  Halves the scheduling
    # rounds — the dominant cost of the loop at local scale — without
    # changing the per-hop data movement that matters at 100 TB.
    for _ in range(0 if _chosen else (hard_max + 1) // 2):
        reach = reach_parts[0]
        for p in reach_parts[1:]:
            reach = reach.unionByName(p)
        s1 = _expand_back(bfront, n_bfront, reach, n_reach).localCheckpoint(
            eager=False
        )
        # hop 2: s1's size is unknown pre-action; size the guards with the
        # current frontier as the proxy (a wrong guess costs one hop's
        # plan shape, never correctness)
        s2 = _expand_back(
            s1, n_bfront, reach.unionByName(s1), n_reach + n_bfront
        )
        # s1 and s2 are each distinct and mutually disjoint (s2 anti-joins
        # reach ∪ s1), so the union needs no extra dedup shuffle
        step = s1.unionByName(s2).localCheckpoint(eager=False)
        # count + drain probe in ONE job (the _sp_slim_bfs trick): marker 2
        # is non-empty iff some reached vertex has a predecessor edge — if
        # not, the next round is provably empty and its checkpoint plans
        # (each an edge pass at AQE plan time) are never built.
        # Orientation: STREAM the edges and hash the (small, materialized)
        # step side — step-semi-edges would build a hash table over the
        # whole edge table before LocalLimit could fire (measured ~2x the
        # cost at sf0.1), while edges-semi-step short-circuits at the first
        # matching edge in continuing rounds.  Emptiness is equivalent:
        # an edge into step exists iff a step vertex has a predecessor.
        # No broadcast hint — step's blocks are materialized, so AQE sizes
        # the build side at runtime (an oversized step degrades to a
        # shuffle instead of a driver-killing broadcast).
        cprobe = (
            edges_thin.join(step, edges_thin["_d"] == step["_rv"], "left_semi")
            .select(F.lit(2).alias("_h"))
            .limit(1)
        )
        ccounts = {
            r["_h"]: r["n"]
            for r in step.select(F.lit(1).alias("_h"))
            .unionAll(cprobe)
            .groupBy("_h")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n_bfront = ccounts.get(1, 0)
        if n_bfront == 0:
            break
        n_reach += n_bfront
        reach_parts.append(step)
        bfront = step
        if ccounts.get(2, 0) == 0:
            break
    if _chosen:
        # swapped run: the targets here are the ORIGINAL (large) start
        # set, whose backward closure approaches the whole graph — a
        # closure BFS would cost driver rounds for near-zero selectivity.
        # The cardinality swap already encodes the small-set optimization.
        if slim:
            edges = edges_thin
    else:
        reach = reach_parts[0]
        for p in reach_parts[1:]:
            reach = reach.unionByName(p)
        rc = F.broadcast(reach) if n_reach < _SP_BCAST_ROWS else reach
        if slim:
            # prune the CACHED thin table — the forward hops then never
            # touch the expensive unified scan again
            edges = edges_thin.join(rc, edges_thin["_d"] == reach["_rv"], "left_semi")
        else:
            edges = edges.join(rc, edges["_d"] == reach["_rv"], "left_semi")
        starts = starts.join(rc, starts["src"] == reach["_rv"], "left_semi")

    if slim:
        # the target-id set is already cached as reach0 — reuse it for the
        # per-hop hit joins rather than re-filtering the vertex scan
        targets_cached = reach0.select(F.col("_rv").alias("_tgt"))
        return _sp_slim_bfs(
            starts, targets_cached, edges, edge_dt, vddl, hard_max, all_paths,
            n_starts=_n_starts, starts_unique=starts_unique,
            starts_materialized=ep_fused is not None,
        )

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

    out = found_parts[0]
    for p in found_parts[1:]:
        out = out.unionByName(p)
    return out


def _sp_slim_bfs(
    starts, targets, edges, edge_dt, vddl, hard_max: int, all_paths: bool,
    n_starts: Optional[int] = None, starts_unique: bool = False,
    starts_materialized: bool = False,
) -> DataFrame:
    """Slim BFS: the caller reads only (src, dst, hops), so the state is
    VERTEX-level — (src, cur, path_count) with a sum-aggregated expansion —
    never per-path.  all_paths=True multiplies the emitted (src, dst, hops)
    row by the number of minimal paths (path-counting DP over the BFS DAG,
    the row-multiplicity contract of the reference SRF); single-path mode
    emits one row per pair.  No edge arrays, no window, one aggregation and
    one anti-join shuffle per hop — the shape that scales: frontier size is
    bounded by |V| x |sources|, not by path multiplicity."""
    edges2 = edges.select("_s", "_d")
    # label-scan start sets are unique by construction — the dedup
    # exchange is elided when the caller proved it (§2.4)
    frontier = (starts if starts_unique else starts.distinct()).select(
        F.col("src"), F.col("src").alias("cur"), F.lit(1).cast("long").alias("cnt")
    )
    if not starts_materialized:
        # materialized by the count below; when the caller already fused
        # the starts into an endpoint checkpoint, consumers re-project the
        # marker-filtered blocks instead (a block scan, not a recompute)
        frontier = frontier.localCheckpoint(eager=False)
    # visited = lazy union of the per-hop frontiers: each is per-(src, cur)
    # distinct by construction (groupBy) and anti-joined against everything
    # before it, so the pieces are disjoint — no dedup, no extra
    # materialization job (one eager checkpoint per hop total)
    visited_parts = [frontier.select("src", F.col("cur").alias("vid"))]
    parts = [
        frontier.join(targets, frontier["cur"] == targets["_tgt"]).select(
            "src", F.col("cur").alias("dst"), "cnt", F.lit(0).alias("hops")
        )
    ]
    # the swapped caller already knows the exact (distinct, probe-measured)
    # start count — skip the counting job; the lazy checkpoint then
    # materializes inside the first round's counting job
    n_frontier = frontier.count() if n_starts is None else n_starts
    n_visited = n_frontier
    npart = int(edges2.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    edges_by_s = None  # pre-partitioned fallback, built only if ever needed
    def _expand_fwd(fr, n_fr, visited, n_vis):
        """One forward hop: (src, cur, cnt) successors of `fr` not yet
        visited.  Broadcast the small sides (guarded by counts — for the
        fused second hop, by the round-entry proxies, same rule as the
        closure loop: a wrong guess costs one hop's plan shape, never
        correctness); the (pruned, lazy) edge scan streams map-side.
        Past the guard, shuffle against a once-partitioned edge table."""
        nonlocal edges_by_s
        if n_fr < _SP_BCAST_ROWS:
            expanded = F.broadcast(fr).join(edges2, fr["cur"] == edges2["_s"])
        else:
            if edges_by_s is None:
                edges_by_s = edges2.repartition(npart, "_s").localCheckpoint(eager=True)
            expanded = fr.join(edges_by_s, fr["cur"] == edges_by_s["_s"])
        nxt = expanded.groupBy("src", F.col("_d").alias("cur")).agg(
            F.sum("cnt").alias("cnt")
        )
        vs = F.broadcast(visited) if n_vis < _SP_BCAST_ROWS else visited
        return nxt.join(
            vs,
            (nxt["src"] == visited["src"]) & (nxt["cur"] == visited["vid"]),
            "left_anti",
        )

    def _hits(fr, hop):
        return fr.join(targets, fr["cur"] == targets["_tgt"]).select(
            "src", F.col("cur").alias("dst"), "cnt", F.lit(hop).alias("hops")
        )

    # TWO hops per driver round (the closure-loop trick, VERDICT r9):
    # hop 2k+1 rides as a LAZY checkpoint whose stage runs inside the
    # round's single counting job, so the sequential scheduling rounds —
    # the dominant BFS cost at local scale — halve without changing the
    # per-hop joins that matter at 100 TB.  One marker-keyed aggregate
    # returns both hop sizes in one action.
    hop = 1
    while hop <= hard_max:
        visited = visited_parts[0]
        for p in visited_parts[1:]:
            visited = visited.unionByName(p)
        s1 = _expand_fwd(frontier, n_frontier, visited, n_visited).localCheckpoint(
            eager=False
        )
        # NOTE (measured, negative): fusing s1+s2 into ONE marker-split
        # checkpointed union per round looked like a driver-round saving
        # but was 4-6x SLOWER — without s1's own checkpoint, every
        # broadcast-exchange build over the lazy s1 subtree (s2's frontier
        # side, the vis2 anti-join side, the union branch) re-runs s1's
        # whole expansion INCLUDING its edge-table pass; broadcast builds
        # do not reuse the inner shuffle exchange across branches.  The
        # per-hop checkpoint is load-bearing: it pins each hop's edge pass
        # to exactly one execution.
        if hop == hard_max:  # odd tail: single-hop round
            if s1.isEmpty():
                break
            parts.append(_hits(s1, hop))
            break
        vis2 = visited.unionByName(s1.select("src", F.col("cur").alias("vid")))
        s2 = _expand_fwd(s1, n_frontier, vis2, n_visited + n_frontier).localCheckpoint(
            eager=False
        )
        # Drain probe, fused into the round's one counting job: marker 3
        # is non-empty iff s2's frontier has ANY outgoing edge — when it
        # does not, the next round's expansion is provably empty, so its
        # two checkpoint plans (whose AQE stage materialization costs a
        # full edge pass each, paid at PLAN time) are never built.  The
        # probe is a LocalLimit(1) branch: continuing rounds short-circuit
        # at the first frontier-sourced edge; the drain round pays one
        # bounded pass INSTEAD of the two it used to spend discovering
        # emptiness the slow way.  Orientation: STREAM the edges and hash
        # the (small, materialized) s2 side — s2-semi-edges would build a
        # hash table over the whole edge table before LocalLimit could
        # fire (measured ~2x the cost at sf0.1).  Emptiness is
        # equivalent: an edge out of s2 exists iff s2 can expand.  No
        # broadcast hint — AQE sizes the build side from s2's blocks.
        probe = (
            edges2.join(s2, edges2["_s"] == s2["cur"], "left_semi")
            .select(F.lit(3).alias("_h"))
            .limit(1)
        )
        counts = {
            r["_h"]: r["n"]
            for r in s1.select(F.lit(1).alias("_h"))
            .unionAll(s2.select(F.lit(2).alias("_h")))
            .unionAll(probe)
            .groupBy("_h")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        n1, n2 = counts.get(1, 0), counts.get(2, 0)
        if n1 == 0:
            break
        parts.append(_hits(s1, hop))
        visited_parts.append(s1.select("src", F.col("cur").alias("vid")))
        n_visited += n1
        if n2 == 0:
            break
        parts.append(_hits(s2, hop + 1))
        visited_parts.append(s2.select("src", F.col("cur").alias("vid")))
        n_visited += n2
        frontier, n_frontier = s2, n2
        hop += 2
        if counts.get(3, 0) == 0:
            # no frontier vertex has an outgoing edge: the next round's
            # s1 is empty before its anti-join — stop without planning it
            break
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    if all_paths:
        # one output row per minimal path
        out = out.select(
            "src", "dst", "hops", F.explode(F.sequence(F.lit(1), F.col("cnt"))).alias("_i")
        ).drop("_i")
    else:
        out = out.select("src", "dst", "hops")
    # schema-compat empty path payload (the slim caller never reads these)
    return out.select(
        "src", "dst",
        F.expr("array()").cast(f"array<{edge_dt.simpleString()}>").alias("edges"),
        F.expr("array()").cast(f"array<{vddl}>").alias("nodes"),
        "hops",
    )


def _empty_sp_result(starts, edge_dt, vddl) -> DataFrame:
    return starts.select(
        F.col("src"),
        F.col("src").alias("dst"),
        F.expr("array()").cast(f"array<{edge_dt.simpleString()}>").alias("edges"),
        F.expr("array()").cast(f"array<{vddl}>").alias("nodes"),
        F.lit(0).alias("hops"),
    ).limit(0)


def _sp_exhaustive(
    graph, starts, targets, edges, edge_dt, vddl, vscan,
    min_hops: int, hard_max: int, all_paths: bool, slim: bool,
) -> DataFrame:
    """min_hops regime (``age_vle.c:3600``): enumerate EDGE-distinct paths
    (vertices may repeat) level by level; for each (src, dst) pair the first
    depth >= min_hops with a hit is its answer — later depths for that pair
    are suppressed.  Terminates by frontier drain (edge-distinctness bounds
    path length by the edge count) or hard_max."""
    frontier = starts.distinct().select(
        F.col("src"),
        F.col("src").alias("cur"),
        F.expr("array()").cast(f"array<{edge_dt.simpleString()}>").alias("edges"),
        F.expr("array()").cast(f"array<{vddl}>").alias("nodes"),
    )
    n_expected = frontier.count() * targets.count()
    found_pairs: Optional[DataFrame] = None
    n_found = 0
    parts: list[DataFrame] = []
    for hop in range(1, hard_max + 1):
        joined = frontier.join(edges, frontier["cur"] == edges["_s"])
        joined = joined.filter(
            ~F.exists(F.col("edges"), lambda x: x.getField("id") == F.col("_e").getField("id"))
        ).select(
            F.col("src"),
            F.col("_d").alias("cur"),
            F.concat(F.col("edges"), F.array(F.col("_e"))).alias("edges"),
            F.col("nodes"),
        ).localCheckpoint(eager=False)
        if hop >= min_hops:
            hits = joined.join(targets, joined["cur"] == targets["_tgt"]).select(
                "src", F.col("cur").alias("dst"), "edges", "nodes",
                F.lit(hop).alias("hops"),
            )
            if found_pairs is not None:
                hits = hits.join(found_pairs, ["src", "dst"], "left_anti")
            if not all_paths:
                hits = hits.withColumn(
                    "_rn",
                    F.row_number().over(
                        Window.partitionBy("src", "dst")
                        .orderBy(F.transform(F.col("edges"), lambda x: x.getField("id")))
                    ),
                ).filter(F.col("_rn") == 1).drop("_rn")
            hits = hits.localCheckpoint(eager=False)
            pairs = hits.select("src", "dst").distinct().localCheckpoint(eager=False)
            c = pairs.count()
            if c:
                parts.append(hits)
                found_pairs = (
                    pairs if found_pairs is None
                    else found_pairs.unionByName(pairs).localCheckpoint(eager=False)
                )
                n_found += c
                if n_found >= n_expected:
                    break
        if not slim:
            joined = joined.join(
                vscan.select(
                    F.col("id").alias("_vid"),
                    F.struct(F.col("id"), F.col("label"), F.col("properties")).alias("_v"),
                ),
                joined["cur"] == F.col("_vid"),
            ).select(
                "src", "cur", "edges",
                F.concat(F.col("nodes"), F.array(F.col("_v"))).alias("nodes"),
            )
        frontier = joined
        if frontier.isEmpty():
            break
    if not parts:
        return _empty_sp_result(starts, edge_dt, vddl)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
