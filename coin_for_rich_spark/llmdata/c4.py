"""C4-style line-level cleaning — the page-repair tier BELOW the
document-level quality gate.

Raffel et al. 2020 (T5 / C4, §2.2) clean Common Crawl with LINE rules
(keep a line only if it ends in terminal punctuation, has enough words,
and does not mention boilerplate tokens like "javascript") plus PAGE
rules (drop a page with too few surviving lines, a banned phrase like
"lorem ipsum", or a curly brace). This is a different axis from
`gopher.gopher_filter`: Gopher DECIDES keep/reject per document from
global signals; C4 REWRITES the document by dropping bad lines, then
rejects pages the rewrite hollowed out. Pipelines run both — C4-repair
first, Gopher-gate after.

Line structure: physical lines via ``delimiter`` when the corpus has
them, else the package's deterministic ``segment_tokens``-token spans
(same segmentation contract as `dedup.explode_token_segments` — segment
``i`` covers tokens ``[i·k, (i+1)·k)`` of the single-space split, final
span truncated). Unlike the explode→groupBy path, everything here stays
IN-ROW: the line array, the per-rule verdicts, and the reassembled text
are higher-order-function algebra over one projection — zero exchanges,
zero UDFs, scan-stage cost bounded by bytes read; the decision column
feeds a ``filter`` Catalyst pushes into any downstream scan (the same
100 TB posture as `gopher.gopher_filter`).

Rule semantics pinned deliberately (documented, test-pinned):
- a line's word count is the size of the single-space-collapsed split of
  the trimmed line (0 for blank);
- "terminal punctuation" is one of ``. ! ? "`` or the Unicode close
  quote at the trimmed line's end;
- the banned-token rule is SPACE-TOKEN membership after lowercasing
  (C4's "line with the word Javascript"), not substring containment —
  substring would false-positive inside longer words;
- banned page phrases ARE substring containment on the lowercased page
  (C4's "lorem ipsum" check), and the curly-brace rule fires on either
  brace anywhere (C4 drops code-bearing pages);
- per-rule line-drop counts are INDEPENDENT (a line failing two rules
  increments both), so ``n_drop_*`` columns may sum past the number of
  dropped lines; the kept set is lines passing ALL enabled rules.

The token array and the line array are MATERIALIZED as columns before
any lambda touches them: a lambda capturing the split EXPRESSION would
re-tokenize once per line — the quadratic-capture pitfall documented at
`textstats.token_ngrams` and `dedup.explode_token_segments`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: paper-default rules (Raffel et al. 2020 §2.2), in the fixed order the
#: page_reject_reasons string reports the page-level ones.
C4_DEFAULTS = {
    "min_line_words": 3,
    "min_lines": 5,
    "require_terminal_punct": True,
    "banned_line_tokens": ("javascript",),
    "banned_page_phrases": ("lorem ipsum",),
    "ban_curly_brace": True,
}

_TERMINAL = r'[.!?"”]$'


def _line_words(line: Column) -> Column:
    t = F.trim(line)
    return F.when(t == "", F.lit(0)).otherwise(
        F.size(F.split(t, " +", -1))
    )


def c4_clean(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    segment_tokens: int | None = None,
    delimiter: str = "\n",
    out_delimiter: str = "\n",
    **rules,
) -> DataFrame:
    """Per-document line repair + page decision: ``(id, n_lines,
    n_lines_kept, n_drop_short, n_drop_no_punct, n_drop_banned_token,
    clean_text, page_reject_reasons, n_page_rules_failed, keep)``.

    ``clean_text`` is the surviving lines rejoined in original order
    with ``out_delimiter`` ('' when every line dropped).
    ``page_reject_reasons`` is a comma-joined string in fixed rule order
    (``min_lines``, ``banned_phrase``, ``curly_brace``) so the DuckDB
    twin compares it byte-for-byte; ``keep`` iff it is empty. Unknown
    rule names raise — a typo must not silently run paper defaults.
    """
    unknown = set(rules) - set(C4_DEFAULTS)
    if unknown:
        raise ValueError(f"unknown c4 rules: {sorted(unknown)}")
    r = {**C4_DEFAULTS, **rules}
    banned_toks = tuple(str(t).lower() for t in r["banned_line_tokens"])
    banned_phrases = tuple(
        str(p).lower() for p in r["banned_page_phrases"]
    )

    narrow = docs.select(F.col(id_col), F.col(text_col).alias("_text"))
    if segment_tokens is not None:
        k = int(segment_tokens)
        if k < 1:
            raise ValueError(f"segment_tokens must be >= 1, got {k}")
        toked = narrow.select(
            id_col, "_text", F.split(F.col("_text"), " ", -1).alias("_toks")
        )
        nseg = F.ceil(F.size("_toks") / F.lit(float(k))).cast("int")
        lined = toked.select(
            id_col,
            "_text",
            F.transform(
                F.sequence(F.lit(0), F.greatest(nseg - 1, F.lit(0))),
                lambda i: F.array_join(
                    F.slice("_toks", i * k + 1, F.lit(k)), " "
                ),
            ).alias("_lines"),
        )
    else:
        # \Q..\E quotes the delimiter: F.split takes a Java REGEX (same
        # discipline as dedup.explode_lines)
        quoted = "\\Q" + delimiter.replace("\\E", "\\E\\\\E\\Q") + "\\E"
        lined = narrow.select(
            id_col,
            "_text",
            F.split(F.col("_text"), quoted, -1).alias("_lines"),
        )

    short = lambda l: _line_words(l) < r["min_line_words"]  # noqa: E731
    no_punct = lambda l: ~F.trim(l).rlike(_TERMINAL)  # noqa: E731
    if banned_toks:
        banned = lambda l: F.arrays_overlap(  # noqa: E731
            F.split(F.lower(F.trim(l)), " +", -1),
            F.array(*[F.lit(t) for t in banned_toks]),
        )
    else:
        banned = lambda l: F.lit(False)  # noqa: E731

    def drop(line: Column) -> Column:
        d = short(line) | banned(line)
        if r["require_terminal_punct"]:
            d = d | no_punct(line)
        return d

    lines = F.col("_lines")
    counted = lined.select(
        id_col,
        "_text",
        F.size(lines).cast("long").alias("n_lines"),
        F.filter(lines, lambda l: ~drop(l)).alias("_kept"),
        F.size(F.filter(lines, short)).cast("long").alias("n_drop_short"),
        (
            F.size(F.filter(lines, no_punct)).cast("long")
            if r["require_terminal_punct"]
            else F.lit(0).cast("long")
        ).alias("n_drop_no_punct"),
        F.size(F.filter(lines, banned))
        .cast("long")
        .alias("n_drop_banned_token"),
    )

    low = F.lower(F.col("_text"))
    page_rules = [
        F.when(
            F.size("_kept") < r["min_lines"], F.lit("min_lines")
        ),
    ]
    if banned_phrases:
        hit = None
        for p in banned_phrases:
            c = F.contains(low, F.lit(p))
            hit = c if hit is None else (hit | c)
        page_rules.append(F.when(hit, F.lit("banned_phrase")))
    if r["ban_curly_brace"]:
        page_rules.append(
            F.when(
                F.contains(F.col("_text"), F.lit("{"))
                | F.contains(F.col("_text"), F.lit("}")),
                F.lit("curly_brace"),
            )
        )
    reasons = F.array_compact(F.array(*page_rules))

    return counted.select(
        id_col,
        "n_lines",
        F.size("_kept").cast("long").alias("n_lines_kept"),
        "n_drop_short",
        "n_drop_no_punct",
        "n_drop_banned_token",
        F.array_join(F.col("_kept"), out_delimiter).alias("clean_text"),
        F.concat_ws(",", reasons).alias("page_reject_reasons"),
        F.size(reasons).cast("long").alias("n_page_rules_failed"),
        (F.size(reasons) == 0).alias("keep"),
    )
