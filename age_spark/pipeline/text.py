"""Text analysis operators: token counting, quality scoring, language ID,
document fingerprinting.

All pure Column expressions (whole-stage codegen; no Python in the hot
path). Each has an exact ANSI-SQL twin used by the DuckDB oracle — the
semantics are deliberately regex/arithmetic-only so both engines agree
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# word-boundary marker sets for the n-gram/stopword language heuristic
LANG_MARKERS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|mit|ein|eine|zu)\b",
    "fr": r"\b(le|la|les|et|est|une|pour|dans|que|des)\b",
    "es": r"\b(el|la|los|las|y|es|una|por|para|que)\b",
}


def token_count(col: Column) -> Column:
    """Whitespace token count — the count of NON-EMPTY runs, i.e. exactly
    Python's ``str.split()``.  (The previous trim-then-split formula
    counted 2 tokens for a tab-only string: Spark/DuckDB ``trim`` strips
    spaces only, and splitting a leading/trailing-whitespace string on
    ``\\s+`` yields empty edge tokens — hypothesis found it.)"""
    return F.size(F.filter(F.split(col, r"\s+"), lambda x: x != F.lit("")))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate: count of letter-runs, digit-runs and
    punctuation marks (a BPE-flavored regex, no vocab needed)."""
    return F.regexp_count(col, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length/punctuation/stopword-ratio quality signals + a composite score
    in [0,1] (the heuristic-filter family used by large-scale corpus
    curation pipelines)."""
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count(t)
    n_alpha = F.regexp_count(t, F.lit(r"[A-Za-z]"))
    n_punct = F.regexp_count(t, F.lit(r"[.,;:!?]"))
    n_stop = F.regexp_count(F.lower(t), F.lit(LANG_MARKERS["en"]))
    alpha_ratio = F.when(n_chars > 0, n_alpha / n_chars).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_tokens > 0, n_punct / n_tokens).otherwise(F.lit(0.0))
    stop_ratio = F.when(n_tokens > 0, n_stop / n_tokens).otherwise(F.lit(0.0))
    mean_tok_len = F.when(n_tokens > 0, n_chars / n_tokens).otherwise(F.lit(0.0))
    score = (
        F.least(n_tokens / F.lit(100.0), F.lit(1.0)) * 0.25
        + F.least(alpha_ratio * F.lit(1.25), F.lit(1.0)) * 0.35
        + F.least(stop_ratio * F.lit(5.0), F.lit(1.0)) * 0.25
        + F.when((mean_tok_len >= 3) & (mean_tok_len <= 10), F.lit(1.0)).otherwise(F.lit(0.0)) * 0.15
    )
    return df.select(
        "*",
        n_tokens.alias("n_tokens"),
        F.round(alpha_ratio, 6).alias("alpha_ratio"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(score, 6).alias("quality_score"),
    )


def lang_scores(col: Column) -> dict[str, Column]:
    low = F.lower(col)
    return {lang: F.regexp_count(low, F.lit(rx)) for lang, rx in LANG_MARKERS.items()}


def predict_lang(col: Column) -> Column:
    """Marker-count argmax with deterministic tie-break (en>de>fr>es order);
    zero markers -> 'und' (undetermined)."""
    s = lang_scores(col)
    best = F.greatest(*s.values())
    out = F.lit("und")
    # build reversed so earlier languages win ties
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when((s[lang] > 0) & (s[lang] == best), F.lit(lang)).otherwise(out)
    return out


def fingerprint(col: Column) -> Column:
    """Normalized content fingerprint: md5 of lowercased,
    whitespace-collapsed text (stable across engines)."""
    norm = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.md5(norm)


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 10_000,
    ref: DataFrame = None,
) -> DataFrame:
    """Corpus-fit unigram language-model quality score — the classic
    cheap perplexity proxy corpus-curation pipelines rank documents by:
    fit token frequencies on the corpus itself (or ``ref``), keep the
    top ``vocab_size`` tokens (count DESC, token ASC — a deterministic
    tie-break both engines reproduce), add-one smooth over the FULL
    distinct-token count D, and score each document as
    round(mean ln P(token), 4) with OOV mass ln(1/(N+D+1)).

    Scale shape: one groupBy shuffle fits the vocab on the reference
    side (token-keyed, partial aggregation); the top-K is a
    TakeOrderedAndProject bounded by vocab_size; scoring joins the
    exploded tokens against the BROADCAST vocab (map-side) and
    re-aggregates per document — the only full-corpus shuffle is that
    doc-id groupBy, with partial aggregation underneath."""
    toks = lambda c: F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " ")
    ref_toks = (ref if ref is not None else df).select(
        F.explode(toks(F.col(text_col))).alias("_tok")
    ).filter(F.col("_tok") != "")
    counts = ref_toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_c"))
    # N and D stay LAZY (1-row aggregate crossJoined broadcast) so
    # building the op runs no job and the scalars come from the same data
    # the action reads (the tfidf/vocab_stats rule, ADVICE r7)
    stats = counts.agg(
        F.coalesce(F.sum("_c"), F.lit(0)).alias("_n"),
        F.count(F.lit(1)).alias("_d"),
    )
    denom = (F.col("_n") + F.col("_d") + 1).cast("double")
    vocab = (
        counts.orderBy(F.col("_c").desc(), F.col("_tok"))
        .limit(vocab_size)
        .crossJoin(F.broadcast(stats))
        .select("_tok", F.log((F.col("_c") + 1) / denom).alias("_lp"))
    )
    doc_toks = df.select(
        F.col(id_col), F.explode(toks(F.col(text_col))).alias("_tok")
    ).filter(F.col("_tok") != "")
    return (
        doc_toks.join(F.broadcast(vocab), "_tok", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(F.coalesce(F.col("_lp"), F.log(F.lit(1.0) / denom))), 4
            ).alias("logprob"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    t = F.col(text_col)
    return df.select(
        "*",
        token_count(t).alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_subtokens"),
        predict_lang(t).alias("pred_lang"),
        fingerprint(t).alias("fingerprint"),
    )


# PII redaction: the standard pre-training scrub pass (emails, IPv4,
# international phone numbers) as sequential regexp_replace — patterns are
# deliberately RE2/Java-common (no lookaround, no backrefs) so the DuckDB
# oracle twin agrees byte-for-byte. Counts come from the ORIGINAL text so
# they are independent of replacement order.
PII_PATTERNS = [
    ("EMAIL", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("IP", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("PHONE", r"\+\d[\d -]{6,14}\d"),
]


def redact_pii(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Scrub emails / IPv4 addresses / +international phone numbers from a
    text column, replacing each match with an angle-bracket token, and
    report per-kind match counts. One projection, whole-stage codegen —
    at 100 TB this is a map-only pass with no shuffle."""
    out = F.col(text_col)
    counts = []
    for token, pat in PII_PATTERNS:
        counts.append(
            F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{token.lower()}")
        )
        out = F.regexp_replace(out, pat, f"<{token}>")
    return df.select(F.col(id_col), out.alias("redacted"), *counts)


def repetition_signals(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Repetition-based quality signals (the Gopher/MassiveText-style
    filters, public): duplicate-line ratio and the fraction of word
    bigrams taken by the single most frequent bigram.  Pure Column HOFs —
    per-document arrays, no explode, no shuffle: at 100 TB this stays a
    map-only scan.  The top-bigram count walks the SORTED bigram array
    once with an (prev, run, best) aggregate state."""
    from ..graph import let_column

    t = F.col(text_col)
    lines = F.filter(
        F.transform(F.split(t, r"\n"), lambda x: F.trim(x)),
        lambda x: F.length(x) > 0,
    )

    def words_to_bigrams(words: Column) -> Column:
        nw = F.size(words)
        return F.zip_with(
            F.slice(words, 1, F.greatest(nw - 1, F.lit(0))),
            F.when(nw >= 2, F.slice(words, 2, nw - 1)).otherwise(
                F.array().cast("array<string>")
            ),
            lambda a, b: F.concat(a, F.lit(" "), b),
        )

    # LET-bind the shared array subtrees (graph.let_column): the un-bound
    # trees re-evaluated the line split 3x, the word split ~5x, and the
    # bigram zip_with ~4x per row (HOF subtrees skip codegen, so nothing
    # CSE'd them) — values are identical, only the evaluation count drops
    bigrams = let_column(
        F.filter(F.split(F.lower(t), r"[^a-z0-9]+"), lambda w: F.length(w) > 0),
        words_to_bigrams,
    )

    def dup_ratio_of(lines: Column) -> Column:
        n_lines = F.size(lines)
        return F.when(
            n_lines > 0,
            F.round(
                1.0 - F.size(F.array_distinct(lines)).cast("double") / n_lines, 6
            ),
        ).otherwise(F.lit(0.0))

    def top_ratio_of(bigrams: Column) -> Column:
        sorted_b = F.array_sort(bigrams)
        best = F.aggregate(
            sorted_b,
            F.struct(
                F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
            ),
            lambda acc, x: F.struct(
                x.alias("prev"),
                F.when(x == acc.getField("prev"), acc.getField("run") + 1)
                .otherwise(F.lit(1))
                .alias("run"),
                F.greatest(
                    acc.getField("best"),
                    F.when(x == acc.getField("prev"), acc.getField("run") + 1).otherwise(
                        F.lit(1)
                    ),
                ).alias("best"),
            ),
            lambda acc: acc.getField("best"),
        )
        return F.when(
            F.size(bigrams) > 0,
            F.round(best.cast("double") / F.size(bigrams), 6),
        ).otherwise(F.lit(0.0))

    return df.select(
        F.col(id_col),
        F.coalesce(F.size(lines), F.lit(0)).alias("n_lines"),
        let_column(lines, dup_ratio_of).alias("dup_line_ratio"),
        F.coalesce(F.size(bigrams), F.lit(0)).alias("n_bigrams"),
        let_column(bigrams, top_ratio_of).alias("top_bigram_ratio"),
    )


def chunk_documents(
    df: DataFrame,
    max_tokens: int = 64,
    overlap: int = 16,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-size token-window chunking with overlap — the standard
    pre-training document splitter.  Tokens are whitespace words; windows
    start every ``stride = max_tokens - overlap`` tokens, and every
    document yields at least one chunk (``n_chunks = 1 +
    ceil(max(n - max_tokens, 0) / stride)``).  Pure Column ops: split ->
    sequence -> inline explode of (chunk_id, slice) — a map-side explode
    whose output is bounded by ~n/stride rows per document, no shuffle at
    any scale."""
    if overlap >= max_tokens:
        raise ValueError("overlap must be smaller than max_tokens")
    from ..graph import let_column

    stride = max_tokens - overlap

    # LET-bind the token array: the un-bound tree embedded the full-text
    # split inside the per-chunk lambda, re-splitting the document once
    # PER CHUNK (O(chunks x doc length) — HOFs skip codegen, nothing
    # CSE'd it); bound, it evaluates once per row.  Values identical.
    def chunks_of(toks: Column) -> Column:
        n = F.size(toks)
        n_chunks = (
            F.lit(1)
            + F.ceil(F.greatest(n - max_tokens, F.lit(0)) / F.lit(stride)).cast("int")
        )
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.struct(
                i.cast("bigint").alias("chunk_id"),
                F.array_join(
                    F.slice(toks, i * stride + 1, max_tokens), " "
                ).alias("chunk_text"),
                F.least(n - i * stride, F.lit(max_tokens))
                .cast("bigint")
                .alias("n_tokens"),
            ),
        )

    return df.select(
        F.col(id_col), F.inline(let_column(F.split(F.col(text_col), " "), chunks_of))
    )


def tfidf_topk(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document top-k TF-IDF terms — the classic keyword/feature
    extractor corpus-curation pipelines use for topic balancing and
    cheap relevance features.

    TF = raw term count in the document; IDF = ln((N+1)/(df+1)) + 1
    (sklearn's smoothed form); rank = row_number over (tf*idf DESC,
    term ASC) per document, keep rank <= k.

    Scale shape: explode -> (doc, term) groupBy with partial aggregation
    (term-in-doc cardinality bounds the shuffle, not raw token count);
    document frequency is a second groupBy over the already-reduced
    (doc, term) pairs; the per-term IDF table is vocabulary-sized and
    BROADCAST back; the final top-k is one window shuffle keyed by
    doc_id.  N (corpus size) stays LAZY — a broadcast crossJoin with a
    1-row aggregate, so building this op runs no job and the scalar is
    taken from the same data the action reads (ADVICE r7: an eager
    df.count() froze N at build time and double-scanned the corpus)."""
    from pyspark.sql import Window

    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    n_docs = df.agg(F.count(F.lit(1)).alias("_n_docs"))
    tf = (
        df.select(F.col(id_col), F.explode(toks).alias("term"))
        .filter(F.col("term") != "")
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    idf = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("_df"))
        .crossJoin(F.broadcast(n_docs))
        .select(
            "term",
            (
                F.log((F.col("_n_docs") + 1.0) / (F.col("_df") + 1.0)) + 1.0
            ).alias("idf"),
        )
    )
    w = Window.partitionBy(id_col).orderBy(
        (F.col("tf") * F.col("idf")).desc(), F.col("term").asc()
    )
    return (
        tf.join(F.broadcast(idf), "term")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            F.col(id_col),
            F.col("term"),
            F.round(F.col("tf") * F.col("idf"), 4).alias("tfidf"),
            F.col("rank").cast("bigint").alias("rank"),
        )
    )


def bpe_pair_counts(
    df: DataFrame,
    top_n: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Adjacent-token-pair frequencies over the corpus — the counting
    step of one BPE merge iteration, the hot inner loop of tokenizer
    training at corpus scale (the pair with the highest count becomes
    the next merge rule).

    Scale shape: pairs are formed INSIDE the array (zip_with of the two
    shifted slices — map-side, no posexplode self-join), then one
    pair-keyed groupBy with partial aggregation; the top-N is a
    TakeOrderedAndProject bounded by ``top_n``, never a full sort."""
    from ..graph import let_column

    def pairs_of(toks: Column) -> Column:
        n = F.size(toks)
        return F.zip_with(
            F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
            F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
            lambda a, b: F.concat_ws(" ", a, b),
        )

    # let-bound token array: the split evaluated 4x per row un-bound
    pairs = let_column(
        F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
        ),
        pairs_of,
    )
    return (
        df.select(F.explode(pairs).alias("pair"))
        .filter(~F.col("pair").rlike(r"(^ )|( $)|(^$)"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(top_n)
    )


def vocab_stats(
    df: DataFrame,
    top_n: int = 100,
    text_col: str = "text",
) -> DataFrame:
    """Corpus vocabulary profile: the top-N tokens with Zipf rank,
    corpus share, and cumulative share — the standard corpus-composition
    report (tokenizer coverage, stopword mass, Zipf-fit sanity).

    Scale shape: one token-keyed groupBy with partial aggregation
    (shuffle bounded by vocabulary size, not corpus size); the corpus
    total stays LAZY — a broadcast crossJoin with a 1-row aggregate, so
    building this op runs no job (ADVICE r7); the top-N is a
    TakeOrderedAndProject bounded by ``top_n``, and the cumulative-share
    window runs over those N rows only — never a global single-partition
    pass over the full vocabulary."""
    from pyspark.sql import Window

    toks = F.split(
        F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " "), " "
    )
    counts = (
        df.select(F.explode(toks).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = counts.agg(
        F.greatest(F.coalesce(F.sum("n"), F.lit(0)), F.lit(1)).alias("_total")
    )
    top = (
        counts.orderBy(F.col("n").desc(), F.col("token").asc())
        .limit(top_n)
        .crossJoin(F.broadcast(total))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "token",
        "n",
        F.round(F.col("n") / F.col("_total").cast("double"), 6).alias("share"),
        F.round(
            F.sum("n").over(wc) / F.col("_total").cast("double"), 6
        ).alias("cum_share"),
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    vocab_size: int = 10_000,
    bigram_size: int = 50_000,
    ref: DataFrame = None,
) -> DataFrame:
    """Corpus-fit conditional-bigram language-model score — one step up
    the perplexity-proxy ladder from unigram_logprob: each document is
    scored by round(mean ln P(w2 | w1), 4) over its token bigrams, with
    add-one smoothing against the corpus distinct-token count D and
    BACKOFF to the unigram model (same formula as unigram_logprob,
    including its OOV mass) when the bigram is outside the fitted top-K.
    Documents with fewer than two tokens have no bigram and drop out.

    Scale shape: bigrams form IN-ARRAY (zip_with of shifted slices — no
    posexplode self-join); the fitted tables are bounded (top
    ``bigram_size`` bigrams joined with their w1 unigram counts, top
    ``vocab_size`` unigram fallbacks) and BROADCAST; scoring is one
    map-side explode + two broadcast joins + one doc-keyed groupBy with
    partial aggregation — the same single-shuffle shape as the unigram
    scorer at any corpus size."""
    def toks_arr(c):
        return F.filter(
            F.split(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "), " "),
            lambda x: x != "",
        )

    def bigrams(a):
        # let-bound (graph.let_column): the token-array subtree is
        # referenced 5x here and would re-evaluate per mention un-bound
        from ..graph import let_column

        def _bg(arr):
            return F.when(
                F.size(arr) >= 2,
                F.zip_with(
                    F.slice(arr, 1, F.size(arr) - 1),
                    F.slice(arr, 2, F.size(arr) - 1),
                    lambda x, y: F.concat_ws(" ", x, y),
                ),
            ).otherwise(F.array().cast("array<string>"))

        return let_column(a, _bg)

    fit = ref if ref is not None else df
    ref_toks = fit.select(F.explode(toks_arr(F.col(text_col))).alias("_tok"))
    uni = ref_toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_cu"))
    # N and D stay LAZY (1-row aggregate crossJoined broadcast): building
    # the op runs no job, and the scalars come from the data the action
    # reads (the tfidf/vocab_stats rule, ADVICE r7)
    stats = uni.agg(
        F.coalesce(F.sum("_cu"), F.lit(0)).alias("_n"),
        F.count(F.lit(1)).alias("_d"),
    )
    denom_uni = (F.col("_n") + F.col("_d") + 1).cast("double")

    bi = (
        fit.select(F.explode(bigrams(toks_arr(F.col(text_col)))).alias("_bg"))
        .groupBy("_bg")
        .agg(F.count(F.lit(1)).alias("_cb"))
        .orderBy(F.col("_cb").desc(), F.col("_bg"))
        .limit(bigram_size)
    )
    # P(w2|w1) = (c(w1 w2) + 1) / (c(w1) + D): join each kept bigram with
    # its w1 unigram count (bounded table x bounded table)
    w1 = F.split(F.col("_bg"), " ").getItem(0)
    bi_lp = (
        bi.withColumn("_w1", w1)
        .join(uni.select(F.col("_tok").alias("_w1"), "_cu"), "_w1")
        .crossJoin(F.broadcast(stats))
        .select(
            "_bg",
            F.log(
                (F.col("_cb") + 1) / (F.col("_cu") + F.col("_d").cast("double"))
            ).alias("_lpb"),
        )
    )
    uni_lp = (
        uni.orderBy(F.col("_cu").desc(), F.col("_tok"))
        .limit(vocab_size)
        .crossJoin(F.broadcast(stats))
        .select(
            F.col("_tok").alias("_w2"),
            F.log((F.col("_cu") + 1) / denom_uni).alias("_lpu"),
        )
    )

    doc_bi = df.select(
        F.col(id_col), F.explode(bigrams(toks_arr(F.col(text_col)))).alias("_bg")
    ).withColumn("_w2", F.split(F.col("_bg"), " ").getItem(1))
    return (
        doc_bi.join(F.broadcast(bi_lp), "_bg", "left")
        .join(F.broadcast(uni_lp), "_w2", "left")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(
            F.round(
                F.avg(
                    F.coalesce(
                        F.col("_lpb"), F.col("_lpu"), F.log(F.lit(1.0) / denom_uni)
                    )
                ),
                4,
            ).alias("bigram_logprob"),
            F.count(F.lit(1)).alias("n_bigrams"),
        )
    )
