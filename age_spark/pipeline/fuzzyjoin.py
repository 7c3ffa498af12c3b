"""Exact string-similarity join via prefix filtering (the published
SSJoin/PPJoin scheme — Chaudhuri et al. ICDE'06, Xiao et al. WWW'08).

Joins two tables on pg_trgm similarity (trigram-set Jaccard, the same
kernel Cypher's ``similarity()`` uses) with EXACT results: candidate
generation explodes only each row's PREFIX — the ``|T| - ceil(t*|T|) + 1``
rarest trigrams under a global document-frequency order — and the prefix
theorem guarantees every pair with Jaccard >= t shares a prefix trigram.
Rare-first ordering is what makes this scale: the equi-join keys are the
LEAST frequent trigrams, so no stop-trigram ('th ', 'he ') hot keys, and
the candidate set shrinks as t rises.  A final JVM-side
``trigram_similarity`` verify keeps precision exact too.

Shuffle profile at 100 TB: one explode+count for the frequency table
(broadcast to both sides), one groupBy per side to order trigrams, one
equi-join on prefix trigrams, one verify join — all keyed on trigrams or
ids, never on raw text length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _trigrams(col):
    from ..compiler.exprs import _trgm_array

    return _trgm_array(col)


def _prefix_table(df: DataFrame, text_col: str, id_col: str, freq: DataFrame,
                  threshold: float, out_id: str) -> DataFrame:
    """(out_id, trigram) rows for each row's prefix under the global
    rare-first order, plus the full trigram set for the verify step."""
    tg = df.select(
        F.col(id_col).alias(out_id),
        F.col(text_col).alias(f"{out_id}_text"),
        _trigrams(F.col(text_col)).alias("tg"),
    ).filter(F.size("tg") > 0)
    ex = tg.select(out_id, F.explode("tg").alias("t"))
    # the frequency table is trigram-vocabulary-sized (tiny) — broadcast
    ranked = ex.join(F.broadcast(freq), ex.t == freq.tg_key).select(
        out_id, "t", "df_count"
    )
    ordered = ranked.groupBy(out_id).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("df_count", "t"))),
            lambda x: x.getField("t"),
        ).alias("ordered")
    )
    # prefix length for Jaccard >= t: |T| - ceil(t*|T|) + 1
    n = F.size("ordered")
    plen = (n - F.ceil(F.lit(threshold) * n) + 1).cast("int")
    return ordered.select(
        out_id, F.explode(F.slice("ordered", 1, plen)).alias("t")
    )


def trigram_similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float = 0.6,
    left_col: str = "text",
    right_col: str = "text",
    left_id: str = "doc_id",
    right_id: str = "doc_id",
) -> DataFrame:
    """All (id_l, id_r, sim) pairs with trigram Jaccard >= threshold —
    EXACT (recall and precision 1.0 vs the brute-force cross join)."""
    l_tg = left.select(F.explode(_trigrams(F.col(left_col))).alias("t"))
    r_tg = right.select(F.explode(_trigrams(F.col(right_col))).alias("t"))
    freq = (
        l_tg.unionAll(r_tg)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .select(F.col("t").alias("tg_key"), "df_count")
    )
    pl = _prefix_table(left, left_col, left_id, freq, threshold, "id_l")
    pr = _prefix_table(right, right_col, right_id, freq, threshold, "id_r")
    cand = pl.join(pr, "t").select("id_l", "id_r").distinct()
    # verify on PRE-SORTED trigram arrays (one per doc), not raw texts — a
    # doc appears in many candidate pairs and re-deriving its trigram set
    # per pair dominated the verify stage (measured ~0.5 ms/pair)
    lt = left.select(
        F.col(left_id).alias("id_l"),
        _trigrams(F.col(left_col)).alias("_ltg"),
    )
    rt = right.select(
        F.col(right_id).alias("id_r"),
        _trigrams(F.col(right_col)).alias("_rtg"),
    )
    inter = F.size(F.array_intersect(F.col("_ltg"), F.col("_rtg")))
    union = F.size("_ltg") + F.size("_rtg") - inter
    # float4 ratio like pg_trgm cnt_sml_similarity (the trigram_similarity
    # kernel's exact arithmetic, inlined over the cached arrays)
    sim_raw = (
        F.when(union > 0, inter.cast("float") / union.cast("float"))
        .otherwise(F.lit(0.0))
        .cast("float")
        .cast("double")
    )
    return (
        cand.join(lt, "id_l")
        .join(rt, "id_r")
        # filter on the UNROUNDED similarity (a pair 5e-7 below the
        # threshold must not round its way in); round only the REPORTED
        # sim column
        .withColumn("_sim_raw", sim_raw)
        .filter(F.col("_sim_raw") >= threshold)
        .withColumn("sim", F.round(F.col("_sim_raw"), 6))
        .select("id_l", "id_r", "sim")
    )
