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

Shuffle profile at 100 TB: one explode+count for the frequency table,
folded into a single ~1 MB vocabulary map (the trigram alphabet bounds it
at ~50k entries) and broadcast to both sides; rare-first ordering is then
MAP-SIDE per row (element_at + in-row array_sort — no per-side exchange
of exploded trigram occurrences); one equi-join on prefix trigrams, one
verify join on ids — never a shuffle keyed on raw text length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _trigrams(col):
    from ..compiler.exprs import _trgm_array

    return _trgm_array(col)


def _trigrams_of(col_name: str):
    """Memoized trigram tree over a NAMED column (exprcache: the tree is a
    pure function of the column name; rebuilding it costs ~15 py4j round
    trips and this module builds it four times per join call)."""
    from .exprcache import memo_cols

    return memo_cols(
        ("fz_trgm", col_name), lambda: [_trigrams(F.col(col_name))]
    )[0]


def _freq_map(freq: DataFrame) -> DataFrame:
    """The document-frequency table folded into ONE map row.  The trigram
    vocabulary is bounded by construction — pg_trgm trigrams are 3 chars
    over the lowercased [a-z0-9 ] alphabet, ≲50k distinct values — so the
    single-row fold and its broadcast stay ~1 MB at ANY corpus size."""
    return freq.agg(
        F.map_from_entries(
            F.collect_list(F.struct("tg_key", "df_count"))
        ).alias("_fm")
    )


def _ordered_table(df: DataFrame, text_col: str, id_col: str, freq_map: DataFrame,
                   out_id: str) -> DataFrame:
    """(out_id, ordered ARRAY<trigram>) — each row's distinct trigram set
    sorted rare-first under the global document-frequency order.

    MAP-SIDE: the df_count lookup is an ``element_at`` against the
    broadcast vocabulary map and the rare-first order is an in-row
    ``array_sort`` over (df_count, trigram) structs — the same comparator
    the previous explode → broadcast-freq join → groupBy(doc)
    collect_list shape produced, with that per-side exchange of every
    exploded trigram occurrence removed outright (guide §2.4).  Every
    trigram is present in the map (it was built from both sides' distinct
    trigram sets), so the lookup never misses."""
    tg = df.select(
        F.col(id_col).alias(out_id),
        _trigrams_of(text_col).alias("tg"),
    ).filter(F.size("tg") > 0)
    ranked = F.array_sort(
        F.transform(
            "tg",
            lambda x: F.struct(
                F.element_at(F.col("_fm"), x).alias("df_count"),
                x.alias("t"),
            ),
        )
    )
    return tg.crossJoin(F.broadcast(freq_map)).select(
        out_id,
        F.transform(ranked, lambda s: s.getField("t")).alias("ordered"),
    )


def _prefix_rows(ordered: DataFrame, out_id: str, threshold: float) -> DataFrame:
    """(out_id, trigram) rows for each row's prefix under the rare-first
    order: |T| - ceil(t*|T|) + 1 trigrams (the prefix-filter theorem)."""
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
    EXACT (recall and precision 1.0 vs the brute-force cross join).

    Contract: ids must be UNIQUE per side (the standard doc-table shape).
    The map-side ordered-array build intentionally carries one row per
    INPUT row rather than re-aggregating by id — a duplicated id would
    fan out through the prefix/verify joins and emit its pair once per
    copy.  Deduplicating here would reintroduce the per-side exchange of
    every trigram row that the map-side restructure removed (ADVICE r10:
    documented as out of contract rather than re-shuffled)."""
    l_tg = left.select(F.explode(_trigrams_of(left_col)).alias("t"))
    r_tg = right.select(F.explode(_trigrams_of(right_col)).alias("t"))
    freq = (
        l_tg.unionAll(r_tg)
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .select(F.col("t").alias("tg_key"), "df_count")
    )
    fm = _freq_map(freq)
    ol = _ordered_table(left, left_col, left_id, fm, "id_l")
    orr = _ordered_table(right, right_col, right_id, fm, "id_r")
    cand = _prefix_rows(ol, "id_l", threshold).join(
        _prefix_rows(orr, "id_r", threshold), "t"
    ).select("id_l", "id_r").distinct()
    # verify on the SAME per-doc ordered arrays (array_intersect/size are
    # order-insensitive, so the rare-first reorder of the distinct trigram
    # set changes nothing) — one aggregation per side feeds both the
    # prefix explode and the verify join, instead of re-deriving trigram
    # sets from raw text per consumer
    lt = ol.select("id_l", F.col("ordered").alias("_ltg"))
    rt = orr.select("id_r", F.col("ordered").alias("_rtg"))
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
