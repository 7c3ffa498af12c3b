"""Byte-pair-encoding tokenizer training and encoding at corpus scale.

The classic BPE recipe (Sennrich et al. 2016, public) reformulated
Spark-first:

- ``train_bpe``: the merge loop NEVER touches the corpus after one
  initial word-frequency aggregation — each iteration runs on the
  DISTINCT-WORD table (bounded by vocabulary size, not corpus size),
  weighting pair counts by word frequency.  One pair-keyed partial-agg
  shuffle + one TakeOrdered(1) per merge; the evolving symbol arrays
  stay distributed.  At 100 TB the corpus is read once; every iteration
  is vocabulary-sized.
- ``bpe_encode``: applies the ranked merge table per document inside an
  Arrow-batched kernel (mapInPandas) with the merges BROADCAST via task
  closure — the standard lowest-rank-first merge loop per word, cached
  per distinct word within each batch.

`pipeline/text.py bpe_pair_counts` remains the single-iteration counting
primitive with its DuckDB oracle; this module is the full loop (the
iteration makes it non-SQL-expressible, so training is pinned by
value-level pytests instead).
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# end-of-word sentinel (the </w> of the original recipe): merges can then
# distinguish word-final from word-internal pairs, and decoding restores
# word boundaries.  \x17 never appears in whitespace-split tokens.
EOW = "\x17"


def _words_with_counts(df: DataFrame, text_col: str) -> DataFrame:
    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    return (
        df.select(F.explode(toks).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def train_bpe(
    df: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    max_words: Optional[int] = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn ``n_merges`` BPE merge rules from a corpus.

    Returns the ranked merge list [(left, right), ...].  Ties break
    deterministically (count DESC, pair ASC) so retraining reproduces the
    same tokenizer anywhere.

    Scale shape: ONE corpus-wide word-frequency aggregation up front;
    every merge iteration then runs on the distinct-word table — a
    pair-explode bounded by total symbol count over distinct words, one
    partial-agg shuffle, and a TakeOrdered(_BATCH_K) for the argmax
    (K driver rows per ROUND, never the table; _safe_merge_batch commits
    every top candidate provably identical to the one-at-a-time pick, so
    independent merges share one driver round).  The symbol strings re-derive
    from the merge list per iteration (pure column ops — no Python in
    the loop), and every ``_CHECKPOINT_EVERY`` merges the applied rules
    FOLD into the checkpointed symbol column — each iteration's plan
    carries at most that many F.replace nodes, so plan-build time is
    O(n_merges), not O(n_merges^2): a real 32k-merge vocabulary trains
    with bounded plans (superseded checkpoints are released as the loop
    advances).

    ``max_words`` caps the working vocabulary to the most frequent words
    (freq DESC, word ASC — deterministic); None disables the cap.
    """
    from ..runtime.cache import release_plan_checkpoints

    words = _words_with_counts(df, text_col)
    if max_words is not None:
        words = words.orderBy(F.col("freq").desc(), F.col("word")).limit(max_words)
    # the working table carries the folded symbol string; re-checkpointed
    # every _CHECKPOINT_EVERY merges
    base = words.withColumn("_sym", _sym_string(F.col("word"))).localCheckpoint(
        eager=False
    )
    applied = 0  # merges already folded into the checkpointed _sym

    merges: list[tuple[str, str]] = []
    while len(merges) < n_merges:
        syms = F.split(_replace_chain(F.col("_sym"), merges[applied:]), SEP)
        n = F.size(syms)
        pairs = F.zip_with(
            F.slice(syms, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(syms, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )
        top = (
            base.select(F.explode(pairs).alias("pair"), "freq")
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(_BATCH_K)
            .collect()
        )
        if not top:
            break
        batch = _safe_merge_batch(
            [(tuple(r["pair"].split(" ", 1)), r["n"]) for r in top],
            all_pairs_known=len(top) < _BATCH_K,
            max_take=min(
                n_merges - len(merges),
                _CHECKPOINT_EVERY - (len(merges) - applied),
            ),
        )
        merges.extend(batch)
        if len(merges) - applied >= _CHECKPOINT_EVERY:
            folded = base.withColumn(
                "_sym", _replace_chain(F.col("_sym"), merges[applied:])
            ).localCheckpoint(eager=False)
            # materialize the fold NOW (lazy checkpoint + adjacent count =
            # one job) — only then can the superseded blocks be released:
            # the new checkpoint reads the old one's blocks while it runs
            folded.count()
            release_plan_checkpoints(base)
            base = folded
            applied = len(merges)
    release_plan_checkpoints(base)
    return merges


# symbol-string separator (regexp-free, injective since \x1f never occurs
# in whitespace-split tokens); "abc" -> "a\x1fb\x1fc\x17"
SEP = "\x1f"

# fold applied merge rules into the checkpointed symbol column every this
# many iterations: bounds every iteration's plan to <= this many
# F.replace nodes (train_bpe docstring)
_CHECKPOINT_EVERY = 64

# candidate pairs collected per driver round — _safe_merge_batch applies
# the provably-sequential prefix, so one TakeOrdered(K) round can commit
# several merges (driver-round fusion, VERDICT r10 next-round #6)
_BATCH_K = 16


def _safe_merge_batch(rows, all_pairs_known: bool, max_take: int):
    """The longest prefix of the rank-sorted candidate pairs that PROVABLY
    equals what the one-merge-at-a-time loop would pick, judged from the
    collected counts alone.

    Soundness (the neighbor-pair count bound): applying merge (a, b) -> ab
    can only (1) DECREASE counts of pairs sharing a symbol with it (their
    occurrences get consumed), (2) leave all other existing pairs exactly
    unchanged, and (3) CREATE pairs (t, ab) / (ab, t) whose counts are
    bounded by the pre-merge counts of (t, a) / (b, t) respectively —
    every occurrence of a created pair was an occurrence of that neighbor
    pair.  Therefore candidate #i is still the exact argmax at its step
    when (a) no earlier batch merge shares a symbol with it (its count is
    untouched and every other surviving pair's count is <= its own by the
    sort order), and (b) its count strictly exceeds the bound on every
    pair the earlier merges can create.  Uncollected pairs count < the
    K-th collected count, which caps their contribution to the creation
    bound.  The batch must be a PREFIX: a skipped higher-ranked pair may
    still be the true next argmax, so the scan stops at the first
    unprovable candidate (worst case: batch of 1 == the old loop)."""
    counts = dict(rows)
    c_min = rows[-1][1]
    batch: list[tuple[str, str]] = []
    used_syms: set[str] = set()
    new_bound = 0  # max possible count of any pair created so far
    for (l, r), n in rows:
        if len(batch) >= max_take:
            break
        if batch:
            if l in used_syms or r in used_syms:
                break  # count may be stale-high; later ranks can't be trusted
            if n <= new_bound:
                break  # a created pair might outrank (or tie) this one
        batch.append((l, r))
        used_syms.update((l, r, l + r))
        # pairs (l, r) can create: (t, lr) <= pre-count(t, l);
        # (lr, t) <= pre-count(r, t); uncollected neighbors are < c_min
        b = 0 if all_pairs_known else c_min
        for (pl, pr), pn in counts.items():
            if pr == l or pl == r:
                b = max(b, pn)
        new_bound = max(new_bound, b)
    return batch


def _sym_string(word: "F.Column") -> "F.Column":
    """Initial symbol string of a word: characters + EOW, SEP-joined."""
    return F.concat(F.array_join(F.split(word, ""), SEP), F.lit(SEP + EOW))


def _replace_chain(s: "F.Column", merges: list[tuple[str, str]]) -> "F.Column":
    """Apply merge rules in rank order to a SEP-joined symbol string —
    adjacent pair (l, r) merges into l||r: replace "l\\x1fr" with "lr".
    One pass per rule mirrors the reference recipe's greedy left-to-right
    scan: replace() substitutes left-to-right and a merged symbol can
    immediately participate in later RULES (rank order), exactly like
    the classic implementation."""
    for l, r in merges:
        s = F.replace(s, F.lit(l + SEP + r), F.lit(l + r))
    return s


def _apply_merges_column(word: "F.Column", merges: list[tuple[str, str]]) -> "F.Column":
    """Symbol array of a word after applying ``merges`` in rank order —
    pure column ops (see _sym_string/_replace_chain)."""
    return F.split(_replace_chain(_sym_string(word), merges), SEP)


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents with a trained merge table: per document, the
    lowest-rank-applicable merge loop over each word's symbols (the
    reference encode algorithm), word results memoized per batch.

    Output: (id, tokens array<string>, n_tokens).  Scale shape: map-only
    mapInPandas — merges ride the task closure (broadcast-sized: one
    small dict), nothing shuffles."""
    import pandas as pd

    ranks = {pair: i for i, pair in enumerate(merges)}
    out_schema = f"{id_col} long, tokens array<string>, n_tokens int"

    def encode_word(word: str, cache: dict) -> list[str]:
        hit = cache.get(word)
        if hit is not None:
            return hit
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best, best_i = None, -1
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best is None or r < best):
                    best, best_i = r, i
            if best is None:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        cache[word] = syms
        return syms

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict = {}
        for pdf in batches:
            ids, toks, ns = [], [], []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in (text or "").lower().strip().split() if w]
                enc: list[str] = []
                for w in words:
                    enc.extend(encode_word(w, cache))
                ids.append(did)
                toks.append(enc)
                ns.append(len(enc))
            yield pd.DataFrame({id_col: ids, "tokens": toks, "n_tokens": ns})

    return df.select(id_col, text_col).mapInPandas(run, out_schema)
