"""Gopher-style rule-based quality filter — the curation DECISION tier.

Rae et al. 2021 (Gopher, Table A1) established the standard pre-training
quality gate: a document survives only if it passes every one of a fixed
rule set over cheap scan-stage signals. This module composes the package's
existing signal definitions (the SAME formulas `textstats.doc_profile`
pins hash-exact against DuckDB — tokenization guard, stopword
normalization, 3-gram dup fraction, top-token fraction) into a keep /
reject decision with a PER-RULE audit trail, the thing a curation run
actually ships: not just "kept 61%" but WHICH rule rejected each doc, so
threshold changes can be dry-run from the audit relation alone without
re-scanning the corpus.

Signal adaptations from the paper are deliberate and documented here:
Gopher's "fraction of characters in duplicate 3-grams" is expressed as
the package's token-level ``dup_ngram_frac`` (1 − distinct/total
3-grams), its symbol-to-word ratio as ``punct_ratio`` (non-alnum chars /
chars), and its "≥ 2 stopwords from a fixed list" verbatim over the
package STOPWORDS. Thresholds are parameters with paper defaults; a
caller tightens them to its corpus (the gate row does, so every rule
exercises both branches on the synthetic word-salad corpus).

100 TB posture: one fused select per doc — same single-scan shape as
``doc_profile``, zero exchanges, zero UDFs; the decision column feeds a
``filter`` that Catalyst pushes into the scan of any downstream pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import (
    STOPWORDS,
    _max_multiplicity,
    _mean_word_len,
    match_tokens,
    token_ngrams,
    tokenize,
)

#: (rule name, default threshold) — paper defaults (Rae et al. Table A1),
#: in the fixed order the reject_reasons string reports them.
GOPHER_DEFAULTS = {
    "min_tokens": 50,
    "max_tokens": 100_000,
    "min_mean_word_len": 3.0,
    "max_mean_word_len": 10.0,
    "min_stopwords": 2,
    "max_symbol_ratio": 0.1,
    "min_alpha_word_frac": 0.80,
    "max_dup_ngram_frac": 0.30,
    "max_top_token_frac": 0.20,
}


def gopher_filter(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    **thresholds: float,
) -> DataFrame:
    """Per-document quality decision: ``(id, n_tokens, mean_word_len,
    n_stopwords, symbol_ratio, alpha_word_frac, dup_ngram_frac,
    top_token_frac, reject_reasons, n_rules_failed, keep)``.

    ``reject_reasons`` is a comma-joined string in the fixed
    ``GOPHER_DEFAULTS`` rule order (string, not array, so the DuckDB twin
    compares it byte-for-byte); ``keep`` iff it is empty. Unknown
    threshold names raise — a typo must not silently run paper defaults.
    """
    unknown = set(thresholds) - set(GOPHER_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown gopher thresholds: {sorted(unknown)}")
    th = {**GOPHER_DEFAULTS, **thresholds}

    t = F.col(text_col)
    toks = tokenize(text_col)
    n_tokens = F.size(toks)
    n_chars = F.length(t)
    n_punct = F.size(
        F.regexp_extract_all(t, F.lit(r"([^\p{L}\p{N}\s])"), 1)
    )
    symbol_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars
    ).otherwise(F.lit(0.0))
    mean_word_len = _mean_word_len(toks, n_tokens)
    n_stop = F.size(
        F.filter(match_tokens(toks), lambda x: x.isin(*sorted(STOPWORDS)))
    )
    alpha_frac = F.when(
        n_tokens > 0,
        F.size(F.filter(toks, lambda x: x.rlike(r"\p{L}"))).cast("double")
        / n_tokens,
    ).otherwise(F.lit(0.0))
    grams = token_ngrams(toks, 3)
    n_grams = F.size(grams)
    dup_frac = F.when(
        n_grams > 0,
        F.lit(1.0) - F.size(F.array_distinct(grams)).cast("double") / n_grams,
    ).otherwise(F.lit(0.0))
    # _max_multiplicity, not the naive per-distinct filter scan — that is
    # O(distinct × total) per row, the documented scale-killer for long docs
    top_frac = F.when(
        n_tokens > 0, _max_multiplicity(toks).cast("double") / n_tokens
    ).otherwise(F.lit(0.0))

    def reason(name: str, failed: Column) -> Column:
        return F.when(failed, F.lit(name))

    base = docs.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        n_stop.cast("long").alias("n_stopwords"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_frac.alias("alpha_word_frac"),
        dup_frac.alias("dup_ngram_frac"),
        top_frac.alias("top_token_frac"),
    )
    c = F.col
    reasons = F.array_compact(
        F.array(
            reason(
                "word_count",
                (c("n_tokens") < th["min_tokens"])
                | (c("n_tokens") > th["max_tokens"]),
            ),
            reason(
                "mean_word_len",
                (c("mean_word_len") < th["min_mean_word_len"])
                | (c("mean_word_len") > th["max_mean_word_len"]),
            ),
            reason("stopwords", c("n_stopwords") < th["min_stopwords"]),
            reason("symbol_ratio", c("symbol_ratio") > th["max_symbol_ratio"]),
            reason(
                "alpha_words", c("alpha_word_frac") < th["min_alpha_word_frac"]
            ),
            reason(
                "dup_ngrams", c("dup_ngram_frac") > th["max_dup_ngram_frac"]
            ),
            reason(
                "top_token", c("top_token_frac") > th["max_top_token_frac"]
            ),
        )
    )
    return base.select(
        "*",
        F.concat_ws(",", reasons).alias("reject_reasons"),
        F.size(reasons).cast("long").alias("n_rules_failed"),
        (F.size(reasons) == 0).alias("keep"),
    )
