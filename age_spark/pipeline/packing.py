"""Sequence packing: greedy first-fit of documents into fixed token budgets.

LLM pre-training consumes fixed-length context windows; feeding one short
document per window wastes most of the compute. Packing concatenates
documents up to a token budget per sequence. Optimal bin packing is NP-hard
and inherently sequential, so the distributed shape (the one that holds at
100 TB) is pack-per-partition: hash-distribute documents, run streaming
first-fit inside each partition (Arrow-batched, bounded memory: only OPEN
bins are held, closed bins emit immediately), and make pack ids unique by
prefixing the partition id. Per-partition packing costs a bounded fill-ratio
loss vs global packing (open-bin fragmentation is per partition) — the
standard trade every large-scale packer makes.

Beyond-reference operator: the reference has no training-pipeline surface;
this composes with pipeline.text.token_count (same tokenization contract).
"""

from __future__ import annotations

from typing import Iterator, Optional

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_count

PACK_SCHEMA = (
    "pack_id string, doc_ids array<bigint>, n_docs int, "
    "total_tokens bigint, fill_ratio double"
)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_open_bins: int = 64,
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """Pack documents into sequences of at most ``max_tokens`` tokens.

    Returns (pack_id, doc_ids, n_docs, total_tokens, fill_ratio). Documents
    longer than the budget are emitted as single-doc packs (the caller
    truncates; silently dropping them would skew the corpus).

    First-fit with a bounded open-bin list: a doc joins the first open bin
    it fits; a bin closes (emits) when the list overflows. Token counting
    stays JVM-side; only (id, n_tokens) pairs cross into Arrow — the text
    itself never leaves the JVM.
    """
    toks = docs.select(
        F.col(id_col).cast("bigint").alias("_id"),
        token_count(F.col(text_col)).cast("bigint").alias("_nt"),
    )
    if n_partitions:
        toks = toks.repartition(n_partitions, "_id")
    toks = toks.withColumn("_pid", F.spark_partition_id())

    def pack(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        open_bins: list[list] = []  # [tokens_used, [doc_ids]]
        out_rows: list[tuple] = []
        pid = None
        seq = 0

        def close(b) -> None:
            nonlocal seq
            out_rows.append(
                (
                    f"p{pid}-{seq}",
                    b[1],
                    len(b[1]),
                    b[0],
                    b[0] / max_tokens,
                )
            )
            seq += 1

        for pdf in batches:
            for _id, nt, _pid in zip(pdf["_id"], pdf["_nt"], pdf["_pid"]):
                if pid is None:
                    pid = int(_pid)
                nt = int(nt)
                if nt >= max_tokens:
                    close([nt, [int(_id)]])  # oversize: single-doc pack
                    continue
                placed = False
                for b in open_bins:
                    if b[0] + nt <= max_tokens:
                        b[0] += nt
                        b[1].append(int(_id))
                        placed = True
                        break
                if not placed:
                    open_bins.append([nt, [int(_id)]])
                    if len(open_bins) > max_open_bins:
                        close(open_bins.pop(0))  # oldest bin is the fullest-ish
            if out_rows:
                yield pd.DataFrame(
                    out_rows,
                    columns=["pack_id", "doc_ids", "n_docs", "total_tokens", "fill_ratio"],
                )
                out_rows = []
        for b in open_bins:
            close(b)
        if out_rows:
            yield pd.DataFrame(
                out_rows,
                columns=["pack_id", "doc_ids", "n_docs", "total_tokens", "fill_ratio"],
            )

    return toks.mapInPandas(pack, schema=PACK_SCHEMA)


def pack_sequences_sequential(
    docs: DataFrame,
    max_tokens: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    bucket_size: int = 1024,
) -> DataFrame:
    """DETERMINISTIC greedy packing: documents are bucketed by
    ``id // bucket_size`` and packed WITHIN each bucket in id order — a
    new pack starts whenever the running token total would exceed the
    budget (an over-budget document therefore lands alone in its own
    pack, and the next document starts fresh).  The result is a pure
    function of (ids, token counts): identical across partitionings,
    engines, and reruns — unlike ``pack_sequences``' partition-dependent
    first-fit — so it carries an EXACT DuckDB oracle (a recursive CTE
    replays the same greedy scan).  Fill ratio is slightly worse than
    first-fit (no out-of-order fitting); that is the price of
    reproducible shard manifests, which training pipelines usually want.

    Scale shape: token counting stays JVM-side; ONE shuffle on the
    bucket id; each bucket packs in a bounded Arrow kernel
    (``bucket_size`` rows max), buckets in parallel."""
    toks = docs.select(
        F.col(id_col).cast("bigint").alias("_id"),
        token_count(F.col(text_col)).cast("bigint").alias("_nt"),
        F.floor(F.col(id_col).cast("bigint") / F.lit(bucket_size))
        .cast("bigint")
        .alias("_b"),
    )

    def pack(key, pdf):  # no type hints: applyInPandas infers eval type
        b = int(key[0])
        pdf = pdf.sort_values("_id")
        rows: list[tuple] = []
        cur: list[int] = []
        tot = 0
        k = 0

        def close() -> None:
            rows.append(
                (f"b{b}-{k}", cur, len(cur), tot, tot / max_tokens)
            )

        for _id, nt in zip(pdf["_id"], pdf["_nt"]):
            nt = int(nt)
            if cur and tot + nt > max_tokens:
                close()
                k += 1
                cur, tot = [], 0
            cur.append(int(_id))
            tot += nt
        if cur:
            close()
        return pd.DataFrame(
            rows,
            columns=["pack_id", "doc_ids", "n_docs", "total_tokens", "fill_ratio"],
        )

    return toks.groupBy("_b").applyInPandas(pack, schema=PACK_SCHEMA)
