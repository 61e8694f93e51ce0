"""Text analysis for training-data pipelines: tokenization, quality scoring,
language ID, document fingerprinting.

These go beyond the reference's surface (it has no text processing) and are
the driver's mandated LLM-data-pipeline extensions. Everything here is pure
``pyspark.sql.functions`` column algebra — JVM-side, whole-stage-codegen'd,
zero Python UDFs — so the same expressions run unchanged on a 1000-executor
scan of 100 TB of documents: embarrassingly parallel, no shuffle at all for
the per-document stats.

Determinism: counts are integers and ratios are single double divisions of
integers, so results are bit-identical to the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from coin_for_rich_spark.functions.partitioning import ensure_parallelism

# Marker lexicons for the n-gram/stopword language-ID heuristic. Tiny on
# purpose: language ID here is a deterministic scoring operator, not a model.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "on"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "von", "mit", "den", "ein", "zu", "ist"],
}

STOPWORDS = LANG_MARKERS["en"]

# BPE-ish pre-tokenization: letter runs, digit runs, single punctuation.
# Unicode classes, not ASCII: [^A-Za-z0-9] counts every non-Latin letter as
# punctuation — a Cyrillic or accented document would be 100% "punctuation"
# (and bucketed punct_heavy) in the very languages the lang-ID claims to
# handle. On pure-ASCII text the classes are identical.
BPE_REGEX = r"([\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s])"

#: punctuation = non-letter, non-digit, non-space (unicode-aware)
PUNCT_REGEX = r"([^\p{L}\p{N}\s])"

#: strips leading/trailing non-alphanumerics off a token for lexicon
#: matching ('The,' → 'the' after lowercasing)
_EDGE_PUNCT = r"(^[^\p{L}\p{N}]+|[^\p{L}\p{N}]+$)"


def tokenize(text: Column | str) -> Column:
    """Whitespace tokens of the trimmed text. Empty/NULL text is an EMPTY
    array, not [""]: split('') yields a phantom single empty token that
    inflates every count built on it (n_tokens=1 for an empty doc,
    top_token_frac=1.0, a phantom chunk…) — and NULL text otherwise turns
    F.size into -1 under Spark's default config, silently corrupting any
    prefix sum over it."""
    c = F.col(text) if isinstance(text, str) else text
    t = F.trim(c)
    return F.when(
        F.length(t) > 0, F.split(t, r"\s+")
    ).otherwise(F.array().cast("array<string>"))


def match_tokens(tokens: Column) -> Column:
    """Tokens normalized for LEXICON matching: lowercased, edge punctuation
    stripped — 'The,' and 'casa.' must hit their marker/stopword entries;
    case-sensitive glued matching undercounted every sentence-initial or
    punctuation-adjacent marker (the dominant positions in real prose)."""
    return F.transform(
        tokens, lambda t: F.lower(F.regexp_replace(t, _EDGE_PUNCT, ""))
    )


def _count_in(tokens: Column, words: list[str]) -> Column:
    return F.size(F.filter(tokens, lambda t: t.isin(*words)))


def _mean_word_len(toks: Column, n_tokens: Column) -> Column:
    """Mean token length from the TOKENS, not a raw-text arithmetic trick:
    (n_chars - gaps)/n assumed exactly one separator space per gap, so any
    leading/trailing or doubled whitespace inflated the stat on exactly the
    noisy documents a quality scan targets."""
    total = F.aggregate(
        F.transform(toks, F.length), F.lit(0), lambda acc, x: acc + x
    )
    return F.when(
        n_tokens > 0, total.cast("double") / n_tokens
    ).otherwise(F.lit(0.0))


def _lang_scores(toks: Column) -> dict[str, Column]:
    m = match_tokens(toks)
    return {lang: _count_in(m, words) for lang, words in LANG_MARKERS.items()}


def _pred_lang(scores: dict[str, Column]) -> Column:
    return (
        F.when(
            (scores["en"] >= scores["es"]) & (scores["en"] >= scores["de"]),
            "en",
        )
        .when(scores["es"] >= scores["de"], "es")
        .otherwise("de")
    )


def token_ngrams(toks: Column, n: int) -> Column:
    """Token n-gram strings (space-joined), one per window start — built by
    zipping the token array with its own shifted copies, O(n·len) per row.

    The obvious ``transform(sequence(0, len-n), i -> slice(toks, i+1, n))``
    build is quadratic: the lambda body captures the outer ``toks``
    EXPRESSION, so the full tokenization re-evaluates for every window
    index — O(len²) on a long document. ``zip_with``'s array arguments are
    direct children evaluated once per row, so n-1 shifts + zips stay
    linear. Trailing partial windows (null-padded by zip_with, null-skipped
    by concat_ws) are sliced off at the end.
    """
    n_tokens = F.size(toks)
    arr = toks
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, F.greatest(n_tokens - j, F.lit(1)))
        arr = F.zip_with(arr, shifted, lambda a, b: F.concat_ws(" ", a, b))
    return F.when(n_tokens >= n, F.slice(arr, 1, n_tokens - (n - 1))).otherwise(
        F.array().cast("array<string>")
    )


def _max_multiplicity(tokens: Column) -> Column:
    """Occurrences of the most frequent element: sort the array, then ONE
    aggregate pass tracking the longest adjacent-equal run — O(n log n) per
    row, still pure column algebra, still zero shuffle. (The naive
    per-distinct-token `filter` scan is O(distinct × total) per row: ~10⁸
    comparisons for a 10⁴-token document — a scale-killer for exactly the
    long documents a 100 TB curation scan must handle.)"""

    def _step(acc: Column, t: Column) -> Column:
        run = F.when(t.eqNullSafe(acc["prev"]), acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            t.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )

    return F.aggregate(
        F.sort_array(tokens),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best"),
        ),
        _step,
        lambda acc: acc["best"],
    )


def doc_stats(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document quality stats: token count, char count, punctuation
    ratio, stopword ratio, mean word length, and a coarse quality bucket.

    The quality bucket thresholds follow common pretraining heuristics
    (very short docs and punctuation-heavy docs are low quality).
    """
    toks = tokenize(text_col)
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_REGEX), 1)
    )
    n_stop = _count_in(match_tokens(toks), STOPWORDS)
    # guarded ratios: a zero-token/zero-char doc is 0.0, not an ANSI
    # divide-by-zero job failure (tokenize now reports empty docs as 0)
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, n_stop.cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        _mean_word_len(toks, n_tokens).alias("mean_word_len"),
        F.when(n_tokens < 10, "too_short")
        .when(punct_ratio > 0.2, "punct_heavy")
        .when(stop_ratio > 0.05, "fluent")
        .otherwise("ok")
        .alias("quality_bucket"),
    )


def doc_tokens(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Token counting two ways: whitespace tokens and BPE-ish pre-tokens
    (letter runs / digit runs / single punctuation marks)."""
    return docs.select(
        F.col(id_col),
        F.size(tokenize(text_col)).alias("ws_tokens"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 1)).alias("bpe_tokens"),
    )


def doc_langid(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic language ID: count marker-word hits per language, pick
    the max with a fixed priority order (en > es > de) on ties."""
    toks = tokenize(text_col)
    scores = _lang_scores(toks)
    return docs.select(
        F.col(id_col),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        _pred_lang(scores).alias("pred_lang"),
    )


def doc_profile(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The full per-document text-analysis profile — quality stats, token
    counts (whitespace + BPE-ish), language ID, bag fingerprint, and the
    repetition quality filters (dup-n-gram fraction + top-token domination,
    the Gopher/C4-family signals of ``doc_repetition``) — in ONE projection.

    This is the shape a 100 TB curation scan should take: every column is
    independent per-row algebra, so computing them together costs one pass
    over the text with zero joins and zero shuffles, where joining the
    single-purpose operators on doc_id would shuffle the corpus once per
    operator for no semantic gain. The single-purpose operators remain the
    composable API; this is their fused scan.

    Plan shape (r10): the token array and the lexicon-normalized token
    array are STAGED through their own projections — a dozen output
    columns reference each, and inlining the `split`/per-token
    `regexp_replace` trees per consumer re-tokenized every document up to
    12× (higher-order functions sit outside whole-stage codegen's
    subexpression elimination, so nothing deduplicated them at runtime;
    measured ~35% of the scan). CollapseProject keeps the boundaries
    because the aliases are multi-referenced and non-cheap; values are
    bit-identical — same expressions, evaluated once.
    """
    # compute-bound per-row stage over a compact input: widen a narrow scan
    # before the ladder or the whole projection runs at 1/cores of the
    # machine (hash on the id — no round-robin pre-sort; no-op at corpus
    # scale where the scan is naturally wide). Measured r15: full profile
    # 1.80 → 0.67 s at sf0.1.
    narrow = ensure_parallelism(
        docs.select(F.col(id_col), F.col(text_col)), key=id_col
    )
    staged = narrow.select(
        F.col(id_col), F.col(text_col), tokenize(text_col).alias("__dp_toks")
    )
    toks = F.col("__dp_toks")
    staged = staged.select(
        F.col(id_col),
        F.col(text_col),
        toks,
        match_tokens(toks).alias("__dp_mtoks"),
    )
    mtoks = F.col("__dp_mtoks")
    n_chars = F.length(F.col(text_col))
    n_tokens = F.size(toks)
    n_punct = F.size(
        F.regexp_extract_all(F.col(text_col), F.lit(PUNCT_REGEX), 1)
    )
    n_stop = _count_in(mtoks, STOPWORDS)
    # guarded ratios: a zero-token/zero-char doc is 0.0, not an ANSI
    # divide-by-zero job failure (tokenize now reports empty docs as 0)
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    stop_ratio = F.when(
        n_tokens > 0, n_stop.cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    mean_word_len = _mean_word_len(toks, n_tokens)
    scores = {
        lang: _count_in(mtoks, words) for lang, words in LANG_MARKERS.items()
    }
    pred = _pred_lang(scores)
    bag = F.concat_ws(" ", F.sort_array(F.array_distinct(toks)))
    total_ngrams = F.greatest(n_tokens - 2, F.lit(0))
    distinct_ngrams = F.size(F.array_distinct(token_ngrams(toks, 3)))
    dup_frac = F.when(
        total_ngrams > 0,
        1.0 - distinct_ngrams.cast("double") / total_ngrams,
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        n_tokens > 0, _max_multiplicity(toks).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    return staged.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        n_stop.alias("n_stopwords"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        mean_word_len.alias("mean_word_len"),
        F.when(n_tokens < 10, "too_short")
        .when(punct_ratio > 0.2, "punct_heavy")
        .when(stop_ratio > 0.05, "fluent")
        .otherwise("ok")
        .alias("quality_bucket"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(BPE_REGEX), 1)).alias("bpe_tokens"),
        *[scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS],
        pred.alias("pred_lang"),
        F.md5(bag).alias("bag_fingerprint"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        total_ngrams.alias("n_ngrams"),
        distinct_ngrams.alias("n_distinct_ngrams"),
        dup_frac.alias("dup_ngram_frac"),
        top_frac.alias("top_token_frac"),
    )


def doc_repetition(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Within-document repetition signals — the published pretraining quality
    filters (Gopher/C4 family) that catch boilerplate and degenerate text:

    - ``dup_ngram_frac``: 1 − distinct/total n-grams (n-gram repetition);
    - ``top_token_frac``: occurrences of the most frequent token ÷ tokens
      (single-token domination).

    Pure higher-order column algebra (sequence/transform/sort_array/
    aggregate): per-row, no explode, no shuffle. The top-token count is a
    single run-length pass over the sorted token array — O(n log n) per row
    regardless of document length; an explode+groupBy twin would shuffle the
    corpus."""
    toks = tokenize(text_col)
    n_tokens = F.size(toks)
    total_ngrams = F.greatest(n_tokens - (n - 1), F.lit(0))
    distinct_ngrams = F.size(F.array_distinct(token_ngrams(toks, n)))
    dup_frac = F.when(
        total_ngrams > 0,
        1.0 - distinct_ngrams.cast("double") / total_ngrams,
    ).otherwise(F.lit(0.0))
    top_frac = F.when(
        n_tokens > 0, _max_multiplicity(toks).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        total_ngrams.alias("n_ngrams"),
        distinct_ngrams.alias("n_distinct_ngrams"),
        dup_frac.alias("dup_ngram_frac"),
        top_frac.alias("top_token_frac"),
    )


def doc_fingerprint(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Order-insensitive bag fingerprint: md5 over the sorted distinct token
    set. Two documents that are token-permutations of each other collide —
    the cheap first pass before shingle-based near-dup detection."""
    toks = tokenize(text_col)
    bag = F.concat_ws(" ", F.sort_array(F.array_distinct(toks)))
    return docs.select(
        F.col(id_col),
        F.md5(bag).alias("bag_fingerprint"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


def grouped_quantiles(
    docs: DataFrame,
    value: Column | str,
    by: Column | str,
    probs: list[tuple[int, int, str]] = (
        (50, 100, "p50"),
        (90, 100, "p90"),
        (99, 100, "p99"),
    ),
) -> DataFrame:
    """EXACT per-group quantiles of an integer-valued column without a
    global sort — the curation-threshold primitive (published pipelines
    pick length/score cutoffs as corpus percentiles; Gopher's doc-length
    rules are the canonical example).

    Quantile definition (all-integer, so the DuckDB twin is bit-exact with
    zero float routing): the ``num/den`` quantile of n values is the
    smallest value v whose cumulative count reaches ``ceil(n·num/den)`` —
    computed as ``(n·num + den − 1) div den``, never touching a double
    (``ceil(0.9 · n)`` in binary floating point overshoots by 1 whenever
    0.9·n lands on an x.0000…01 representation).

    Scale posture: one groupBy on (group, value) collapses the corpus to
    its value HISTOGRAM — for real integer measures (doc lengths, token
    counts) that is ≤ ~10⁶ rows regardless of corpus size — then one
    window over the histogram per group. The corpus is touched exactly
    once, in the scan; nothing corpus-sized is ever sorted or shuffled
    twice. A t-digest/KLL sketch would APPROXIMATE the same numbers in one
    pass; this tier is exact because the histogram of a bounded integer
    measure is itself small — the sketch family (HLL/Bloom/CMS) covers the
    unbounded cases.
    """
    from pyspark.sql import Window

    v = F.col(value) if isinstance(value, str) else value
    g = F.col(by) if isinstance(by, str) else by
    hist = (
        docs.select(g.alias("grp"), v.cast("long").alias("v"))
        .groupBy("grp", "v")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wcum = Window.partitionBy("grp").orderBy("v")
    wall = Window.partitionBy("grp")
    laid = hist.select(
        "grp",
        "v",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    pstructs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(num).alias("num"),
                    F.lit(den).alias("den"),
                    F.lit(label).alias("label"),
                )
                for num, den, label in probs
            ]
        )
    ).alias("p")
    exp = laid.select("grp", "v", "cum", "n", pstructs).select(
        "grp",
        "v",
        "cum",
        "n",
        F.col("p.num").alias("num"),
        F.col("p.den").alias("den"),
        F.col("p.label").alias("label"),
    )
    # `div` (true integer division) — a double `/` here can land an exact
    # integer quotient on k−ε and floor() it to k−1
    rank = F.expr("(n * num + den - 1) div den")
    return (
        exp.filter(F.col("cum") >= rank)
        .groupBy(F.col("grp"), F.col("label").alias("quantile"))
        .agg(F.min("v").alias("value"), F.min("n").alias("n_rows"))
    )
