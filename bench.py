#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": total_sec, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
# Repetitions per query; the reported number is the MIN across reps so a
# noisy neighbor in a shared sandbox can't turn a win into a regression
# (BENCH_r02 recorded a 3.1x simhash "regression" on unchanged code that a
# same-commit local run contradicted).
REPS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2")))

HEADLINE = [
    # engine: pattern joins, aggregation, optional, VLE, BFS, stats
    "g_join2_agg",
    "g_join3_edgeprops",
    "g_optional_match",
    "g_agg_stats",
    "g_vle_2hop",
    "g_not_exists",
    "g_shortest_path",
    "g_vertex_stats",
    # pipeline: dedup / similarity / text / events
    "p_exact_dedup",
    "p_text_features",
    "p_redact_pii",
    "p_repetition_signals",
    "p_minhash_pairs",
    "p_simhash_pairs",
    "p_fuzzy_join",
    "p_ann_topk",
    "p_ann_ivf",
    "p_tfidf_topk",
    "p_bpe_pair_counts",
    "e_type_agg",
    "e_sessionize",
    "e_tumbling",
    # round 9: the rewritten point-in-interval join (wide-interval
    # broadcast lane) earns a headline slot + a 10x proof below
    "e_range_join",
]


def main() -> int:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", CPUS)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # per-op Python call-site capture costs ~4 py4j round-trips per
        # Column method — 3-4x the compiler's driver-side plan time
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .appName("age_spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # Build the demo graph once, outside the timed region: catalog
    # construction is a one-time cost, not per-query work (the first
    # timed query also absorbs JVM/codegen warm-up otherwise).
    t0 = time.time()
    entry_mod._graph(spark, SF_DIR)
    build_sec = round(time.time() - t0, 3)
    print(f"# graph-build (untimed): {build_sec}s", file=sys.stderr)

    # fixed calibration workload: a constant CPU-bound task whose time
    # depends only on the machine's current speed, never on this repo's
    # code — divides out host noise when comparing rounds (measured on
    # 2026-08-15: the same commit benched 18.9s one day and 29.0s another
    # purely from host contention; min-of-3 1000x1000 float64 matmuls)
    import numpy as _np

    _cal_a = _np.ones((1000, 1000))
    cal = None
    for _ in range(3):
        t0 = time.time()
        (_cal_a @ _cal_a).sum()
        cal = min(cal, time.time() - t0) if cal is not None else time.time() - t0
    calibration_sec = round(cal, 4)
    print(f"# calibration matmul (untimed): {calibration_sec}s", file=sys.stderr)

    import gc

    timings: dict[str, float] = {}
    base_rows: dict[str, int] = {}
    total = 0.0
    for name in HEADLINE:
        fn = queries[name]
        best = None
        n = 0
        for rep in range(REPS):
            t0 = time.time()
            df = fn(spark, SF_DIR)
            n = df.count()
            dt = round(time.time() - t0, 3)
            best = dt if best is None else min(best, dt)
            print(f"# {name} rep{rep}: {dt}s ({n} rows)", file=sys.stderr)
            # drop DataFrame refs so the ContextCleaner can unpersist BFS
            # localCheckpoint blocks before the next rep is timed
            del df
            gc.collect()
        timings[name] = best
        base_rows[name] = n
        total += best
        print(f"# {name}: min {best}s over {REPS} reps", file=sys.stderr)

    scale = None
    if os.environ.get("SPARK_GRAFT_SCALE_PROOF", "1") == "1":
        scale = _scale_proof(spark, entry_mod, timings, base_rows)

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    # The sf1 scale-proof block goes out on its OWN stdout line first: the
    # driver captures only the last ~2 kB of stdout and json-parses the
    # final line, so the final line must stay compact (headline total +
    # per-query dict only).  BENCH_r08 came back "parsed: null" because the
    # sf1 cold+pairs keys pushed the single combined line past that window.
    if scale is not None:
        print(json.dumps({"sf1_scale_proof": scale}))
        sys.stdout.flush()
    out = {
        "metric": "headline-suite wall time (graph + pipeline ops)",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "reps": REPS,
        "build_sec": build_sec,
        "calibration_matmul_sec": calibration_sec,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    line = json.dumps(out)
    if len(line) > 1536:  # belt-and-braces: never outgrow the tail window
        out.pop("calibration_matmul_sec", None)
        out.pop("build_sec", None)
        line = json.dumps(out)
    print(line)
    spark.stop()
    return 0


def _scale_proof(spark, entry_mod, base_timings, base_rows=None):
    """10x scale proof-point: replicate the demo graph's tables ten times
    (entry ids shifted per copy, topology preserved per replica) and run
    the three most join/iteration-heavy graph queries.  The point is the
    SCALING, not the absolute number: with partitioned joins and a
    frontier BFS whose driver overhead is per-hop rather than per-row,
    wall time should grow well under 10x on 10x the edges."""
    from pyspark.sql import functions as F

    from age_spark import AgeSession
    from age_spark.graph import Graph

    base = entry_mod._graph(spark, SF_DIR)
    SHIFT = 1 << 28  # entry-id stride per replica (sf0.1 entries << 2^28)
    vdfs, edfs = {}, {}
    for name, df in base.vertex_dfs.items():
        vdfs[name] = df.crossJoin(
            spark.range(10).select(F.col("id").alias("_rep"))
        ).select(
            (F.col("id") + F.col("_rep") * SHIFT).alias("id"),
            *[c for c in df.columns if c != "id"],
        )
    for name, df in base.edge_dfs.items():
        edfs[name] = df.crossJoin(
            spark.range(10).select(F.col("id").alias("_rep2"))
        ).select(
            (F.col("id") + F.col("_rep2") * SHIFT).alias("id"),
            (F.col("start_id") + F.col("_rep2") * SHIFT).alias("start_id"),
            (F.col("end_id") + F.col("_rep2") * SHIFT).alias("end_id"),
            *[c for c in df.columns if c not in ("id", "start_id", "end_id")],
        )
    g10 = Graph(spark, base.meta.renamed("tpch_x10"), vdfs, edfs)
    age = AgeSession(spark)

    qs = {
        "g_join2_agg": (
            'MATCH (c:Customer)-[:FROM_NATION]->(n:Nation)-[:IN_REGION]->(r:Region) '
            'RETURN r.name AS region, count(*) AS n_customers'
        ),
        "g_agg_stats": (
            'MATCH (c:Customer)-[:FROM_NATION]->(n:Nation) '
            'RETURN n.name AS nation, count(*) AS n, round(sum(c.acctbal), 2) AS sum_bal, '
            'round(avg(c.acctbal), 2) AS avg_bal, round(min(c.acctbal), 2) AS min_bal, '
            'round(max(c.acctbal), 2) AS max_bal'
        ),
        "g_join3_edgeprops": (
            'MATCH (c:Customer)-[:PLACED]->(o:Order)-[l:LINE]->(p:Part) '
            'WHERE l.quantity > 45 '
            'RETURN p.brand AS brand, count(*) AS n_lines, '
            'round(sum(l.quantity), 2) AS sum_qty'
        ),
        "g_vle_2hop": (
            'MATCH (c:Customer)-[*2..2]->(r:Region) '
            'RETURN r.name AS region, count(*) AS n_paths'
        ),
        "g_shortest_path": (
            'CALL shortest_path("Customer", "Region", null, "out") '
            'YIELD src, dst, hops RETURN hops, count(*) AS n'
        ),
        "g_optional_match": (
            'MATCH (c:Customer) OPTIONAL MATCH (c)-[:PLACED]->(o:Order) '
            'RETURN c.name AS name, count(o) AS n_orders'
        ),
        "g_not_exists": (
            'MATCH (c:Customer) WHERE NOT EXISTS '
            '{ MATCH (c)-[:PLACED]->(o:Order) } '
            'RETURN count(*) AS n_no_orders'
        ),
    }
    out = {"edges_x": 10}
    for name, q in qs.items():
        # min-of-2, same methodology as the headline loop: snapshot-scoped
        # caches (thin traversal tables) amortize across queries, so the
        # steady-state number is the comparable one.  The COLD first rep is
        # recorded too (ADVICE r7): it carries the one-off thin-table
        # edge-scan/materialization cost the warm number amortizes away.
        dt = cold = None
        for _ in range(2):
            t0 = time.time()
            n = age.cypher(g10, q).df.count()
            r = round(time.time() - t0, 3)
            if cold is None:
                cold = r
            dt = r if dt is None else min(dt, r)
        out[name] = dt
        out[f"{name}_cold"] = cold
        ratio = round(dt / base_timings[name], 2) if base_timings.get(name) else None
        out[f"{name}_vs_sf0.1"] = ratio
        print(f"# sf1-proof {name}: {dt}s on 10x edges ({n} rows, "
              f"{ratio}x the sf0.1 time)", file=sys.stderr)
    # pipeline scale proof: 10x documents with every word prefixed by the
    # replica id — cross-replica texts share no shingles, so the TRUE
    # near-dup pair set grows exactly 10x (each replica reproduces the
    # base pairs) and the banded-LSH join must not blow up quadratically
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    docs10 = docs.crossJoin(
        spark.range(10).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("doc_id") + F.col("_rep") * SHIFT).alias("doc_id"),
        F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(F.col("_rep").cast("string"), w),
            ),
            " ",
        ).alias("text"),
    ).localCheckpoint(eager=True)  # exclude the replication from the timing
    from age_spark.pipeline.dedup import minhash_dedup_pairs, simhash_near_pairs

    def _fuzzy10():
        # per-replica 40/40 split (the p_fuzzy_join shape).  The replica
        # transform must be TRIGRAM-disjoint (word-prefixing keeps interior
        # trigrams shared, which genuinely multiplies the true pair set
        # ~15x): each replica applies its own alphabet-rotation cipher, so
        # cross-replica similarity collapses below the threshold and the
        # exact pair set grows ~10x
        from age_spark.pipeline.fuzzyjoin import trigram_similarity_join

        alpha = "abcdefghijklmnopqrstuvwxyz"
        ciphered = F.col("text")
        for rep in range(10):
            # modular shift: rep*3 for rep=9 is 27, and alpha[27:]+alpha[:27]
            # would collapse to the identity (colliding with rep=0's cipher,
            # letting cross-replica (0,9) pairs stay similar); shifts
            # 0,3,...,24,1 are pairwise distinct
            k = (rep * 3) % 26
            rot = alpha[k:] + alpha[:k]
            ciphered = F.when(
                F.col("_rep") == rep,
                F.translate(F.lower(F.col("text")), alpha, rot),
            ).otherwise(ciphered)
        docs10f = docs.crossJoin(
            spark.range(10).select(F.col("id").alias("_rep"))
        ).select(
            (F.col("doc_id") + F.col("_rep") * SHIFT).alias("doc_id"),
            ciphered.alias("text"),
        ).localCheckpoint(eager=True)
        base_id = F.pmod(F.col("doc_id"), F.lit(SHIFT))
        left = docs10f.filter(base_id < 40)
        right = docs10f.filter((base_id >= 40) & (base_id < 80))
        return trigram_similarity_join(left, right, threshold=0.6)

    for name, fn in (
        ("p_minhash_pairs", lambda: minhash_dedup_pairs(docs10, threshold=0.5)),
        ("p_simhash_pairs", lambda: simhash_near_pairs(docs10, max_hamming=8)),
        ("p_fuzzy_join", _fuzzy10),
    ):
        t0 = time.time()
        n = fn().count()
        dt = round(time.time() - t0, 3)
        out[name] = dt
        ratio = round(dt / base_timings[name], 2) if base_timings.get(name) else None
        out[f"{name}_vs_sf0.1"] = ratio
        # candidate-pair output grows with data at a fixed threshold, so
        # raw seconds overstate growth; sec-per-1k-pairs normalizes it
        # (VERDICT r7 #7: the p_fuzzy_join 5x was asserted, not measured)
        out[f"{name}_pairs"] = n
        base_n = (base_rows or {}).get(name)
        if base_n:
            out[f"{name}_pairs_sf0.1"] = base_n
            per_k_10x = dt / max(n / 1000.0, 1e-9)
            per_k_base = base_timings[name] / max(base_n / 1000.0, 1e-9)
            out[f"{name}_sec_per_1k_pairs_vs_sf0.1"] = round(
                per_k_10x / per_k_base, 2
            )
        print(f"# sf1-proof {name}: {dt}s on 10x docs ({n} pairs, "
              f"{ratio}x the sf0.1 time)", file=sys.stderr)
    # ANN scale proof: 10x embeddings corpus (vectors reused, fresh ids),
    # the same 5 queries — brute-force grows with the corpus matmul, IVF
    # with nprobe/n_centroids of it (both bounded by scan + broadcast)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    emb10 = emb.crossJoin(
        spark.range(10).select(F.col("id").alias("_rep3"))
    ).select(
        (F.col("vec_id") + F.col("_rep3") * SHIFT).alias("vec_id"),
        "embedding",
    ).localCheckpoint(eager=True)
    qset = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    from age_spark.pipeline.similarity import brute_force_topk, ivf_topk

    for name, fn in (
        ("p_ann_topk", lambda: brute_force_topk(emb10, qset, k=5)),
        ("p_ann_ivf", lambda: ivf_topk(emb10, qset, k=5, n_centroids=8, nprobe=3)),
    ):
        t0 = time.time()
        n = fn().count()
        dt = round(time.time() - t0, 3)
        out[name] = dt
        ratio = round(dt / base_timings[name], 2) if base_timings.get(name) else None
        out[f"{name}_vs_sf0.1"] = ratio
        print(f"# sf1-proof {name}: {dt}s on 10x embeddings ({n} rows, "
              f"{ratio}x the sf0.1 time)", file=sys.stderr)
    # range-join scale proof: 10x events with each replica's point space
    # shifted far past the interval width, so the true match set grows
    # exactly 10x and the bucket equi-join must scale with it
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    ev10 = ev.crossJoin(
        spark.range(10).select(F.col("id").alias("_rep4"))
    ).select(
        (F.col("event_id") + F.col("_rep4") * SHIFT).alias("event_id"),
        "event_type",
        (F.col("value") + F.col("_rep4") * 1_000_000.0).alias("value"),
    ).localCheckpoint(eager=True)

    def _range10():
        # mirrors the r11 e_range_join entry exactly (aggregation-pushdown
        # operator, width 32) so the 10x ratio divides like for like
        from age_spark.pipeline.events import range_join_count_sum

        pt = F.floor(F.col("value") * 100).cast("long")
        left = ev10.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("lid"), pt.alias("p")
        )
        right = ev10.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("rid"), pt.alias("lo"), (pt + 1500).alias("hi")
        )
        return range_join_count_sum(
            left, right, "p", "lo", "hi", bucket_width=32, right_id="rid"
        )

    t0 = time.time()
    n = _range10().count()
    dt = round(time.time() - t0, 3)
    out["e_range_join"] = dt
    ratio = (
        round(dt / base_timings["e_range_join"], 2)
        if base_timings.get("e_range_join")
        else None
    )
    out["e_range_join_vs_sf0.1"] = ratio
    print(f"# sf1-proof e_range_join: {dt}s on 10x events ({n} rows, "
          f"{ratio}x the sf0.1 time)", file=sys.stderr)
    # media-decode scale proof: REAL PPM decode through the Arrow kernel
    # over the full corpus, then 10x — map-only (plan-guarded: one
    # MapInPandas, zero Exchange), so growth should track the kernel's
    # per-doc cost, not a shuffle
    from age_spark.pipeline.multimodal import attach_generated_ppm, extract_features

    t0 = time.time()
    extract_features(attach_generated_ppm(docs), fake=False).count()
    base_dt = round(time.time() - t0, 3)
    out["m_media_decode_sf0.1"] = base_dt
    t0 = time.time()
    n = extract_features(attach_generated_ppm(docs10), fake=False).count()
    dt = round(time.time() - t0, 3)
    out["m_media_decode"] = dt
    ratio = round(dt / base_dt, 2) if base_dt else None
    out["m_media_decode_vs_sf0.1"] = ratio
    print(f"# sf1-proof m_media_decode: {dt}s on 10x docs ({n} rows, "
          f"{ratio}x the in-run sf0.1 decode)", file=sys.stderr)
    out["note"] = (
        "10x replicas of the sf0.1 graph, documents, embeddings, and "
        "events tables: per-query growth factors above; sub-10x growth = "
        "per-hop driver overhead and plan time amortize, joins and "
        "banded-LSH scale with data"
    )
    return out


if __name__ == "__main__":
    sys.exit(main())
