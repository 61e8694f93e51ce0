"""Deduplication operators for training-data pipelines.

Four tiers, cheapest first — the standard large-corpus dedup ladder:

1. ``exact_dedup``        — hash-groupBy on md5(text). One shuffle on a
                            16-byte key; at 100 TB this is the only pass that
                            touches every byte, and it's a pure hash agg.
2. ``ngram_jaccard_pairs``— exact near-dup pairs via a shingle inverted
                            index. Quadratic in the worst case; used to
                            verify/calibrate the probabilistic tiers at small
                            scale and on candidate subsets.
3. ``minhash_pairs``      — MinHash signatures + LSH banding: candidates are
                            found by an equi-join on (band, band_hash), i.e.
                            a shuffle keyed on tiny band buckets — the scale
                            path (linear in corpus size, no all-pairs).
4. ``simhash_fingerprints``/``simhash_pairs`` — 64-bit SimHash; Hamming-≤k
                            pairs via the chunk-pigeonhole trick (k<4 ⇒ at
                            least one of four 16-bit chunks equal).

Everything is built-in column algebra (xxhash64, explode, groupBy,
array ops) — no Python UDFs; the only shuffles are the inverted-index /
band-bucket joins, which is exactly the access pattern published MinHash-LSH
dedup pipelines use on cluster engines.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_parallelism
from .textstats import token_ngrams, tokenize

# Intermediate relations persisted inside ngram_jaccard_pairs (the inverted
# shingle→doc-list index of the count plan). Persist lifetime can't end
# inside the call — the returned (lazy) DataFrame still reads the cache — so
# callers that loop (bench passes, long sessions) drain this registry via
# :func:`release_intermediate_caches` once the results are materialized.
_INTERMEDIATE_CACHES: list[DataFrame] = []


def release_intermediate_caches() -> None:
    """Unpersist every intermediate relation cached by dedup operators since
    the last call. Safe to call any time AFTER the DataFrames returned by
    those operators have been fully materialized (and before they are
    re-executed)."""
    while _INTERMEDIATE_CACHES:
        df = _INTERMEDIATE_CACHES.pop()
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — best-effort cache drop
            pass


def content_hash(col: Column | str) -> Column:
    """THE content-identity normalization — md5 of lower(trim(text)) —
    shared by exact dedup, line dedup, decontamination, and the dedup
    index (one definition, so a future tweak cannot silently desynchronize
    the tiers that promise "the same normalization")."""
    c = F.col(col) if isinstance(col, str) else col
    return F.md5(F.lower(F.trim(c)))


def exact_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    normalize: bool = True,
) -> DataFrame:
    """Exact duplicate groups: md5 of (optionally lowercased, trimmed) text.

    Returns one row per distinct content hash with the kept (minimum) id and
    the duplicate count — the MERGE/DO-NOTHING analog of the reference's PK
    dedup (`schemas/insert_queries.sql:8-15`) lifted to content identity.
    """
    t = content_hash(text_col) if normalize else F.md5(F.col(text_col))
    return (
        docs.select(t.alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def explode_lines(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
) -> DataFrame:
    """One row per physical line: ``(id_col, pos, line)`` with ``pos`` the
    0-based line index — the input relation :func:`line_dedup` consumes.
    Pure posexplode(split) in the scan stage."""
    narrow = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    # \Q..\E quotes the delimiter: F.split takes a Java REGEX, so a raw
    # '|' or '.' would silently split between every character
    quoted = "\\Q" + delimiter.replace("\\E", "\\E\\\\E\\Q") + "\\E"
    return narrow.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), quoted, -1)).alias(
            "pos", "line"
        ),
    )


def explode_token_segments(
    docs: DataFrame,
    k: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """One row per fixed ``k``-token span: ``(id_col, pos, line)`` — the
    deterministic segmentation used when a corpus has no physical line
    structure (the C4 pass operates on ~sentence-sized spans either way).
    Segment ``i`` covers tokens ``[i·k, (i+1)·k)`` of the single-space
    token split; the final span is truncated.

    The token array is MATERIALIZED as a column before the per-span slice:
    a lambda over ``sequence`` that captured the split EXPRESSION would
    re-tokenize once per span — O(len²/k) on long documents (the same
    quadratic-capture pitfall documented at textstats.token_ngrams).
    """
    narrow = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    toks = narrow.select(
        F.col(id_col), F.split(F.col(text_col), " ", -1).alias("_toks")
    )
    nseg = F.ceil(F.size("_toks") / F.lit(float(k))).cast("int")
    return toks.select(
        F.col(id_col),
        "_toks",
        F.explode(
            F.sequence(F.lit(0), F.greatest(nseg - 1, F.lit(0)))
        ).alias("pos"),
    ).select(
        F.col(id_col),
        "pos",
        F.array_join(F.slice("_toks", F.col("pos") * k + 1, k), " ").alias(
            "line"
        ),
    )


def line_dedup(
    lines: DataFrame,
    min_dup_docs: int = 2,
    id_col: str = "doc_id",
    out_delimiter: str = "\n",
) -> DataFrame:
    """Inter-document line/paragraph-level exact dedup with document
    reassembly — the C4/Gopher boilerplate pass (nav bars, cookie banners,
    license headers) that every pretraining pipeline runs BEFORE document-
    level near-dup: a line appearing in ``min_dup_docs`` or more DISTINCT
    documents is boilerplate and is dropped from all of them; each document
    is then rebuilt from its surviving lines in original order.

    Input is the exploded ``(id_col, pos, line)`` relation from
    :func:`explode_lines` or :func:`explode_token_segments`; output is one
    row per document: ``(id_col, clean_text, n_lines, n_lines_dropped)``
    (documents whose every line was boilerplate rebuild to '').

    Semantics pinned deliberately:
    - line identity is ``lower(trim(line))`` — the same normalization as
      :func:`exact_dedup`'s content hash;
    - the count is DISTINCT documents, so a line repeated only WITHIN one
      document is never dropped (intra-doc repetition is a quality signal,
      handled by textstats.repetition filters, not boilerplate);
    - blank lines (trim = '') are exempt — they carry paragraph structure,
      and dropping them would be a corpus-wide reformat.

    Scale shape (100 TB): two shuffles plus one join — (1) hash-agg of
    distinct-doc counts keyed on the 16-byte md5 of the normalized line,
    (2) the boilerplate-hash relation joined back onto the lines (it holds
    ONLY hashes clearing ``min_dup_docs`` — a tiny fraction of the corpus,
    so AQE broadcasts it and the lines relation is not reshuffled), and
    (3) the per-document rebuild groupBy. No window over the corpus, no
    all-pairs anything; per-document state is bounded by document length.
    """
    # the hash is an INTERNAL exchange/join key, never emitted — carry the
    # 16 raw md5 bytes instead of the 32-char hex string (unhex is a
    # bijection, so boilerplate membership is bit-identical; the
    # count-distinct exchange ships half the key bytes — guide §2.3)
    marked = lines.withColumn(
        "_h", F.when(F.trim(F.col("line")) != "", F.unhex(content_hash("line")))
    )
    boiler = (
        marked.filter(F.col("_h").isNotNull())
        .groupBy("_h")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= int(min_dup_docs))
        .select("_h")
        .withColumn("_drop", F.lit(True))
    )
    flagged = marked.join(boiler, "_h", "left").withColumn(
        "_dropped", F.coalesce(F.col("_drop"), F.lit(False))
    )
    kept = F.when(
        ~F.col("_dropped"), F.struct(F.col("pos"), F.col("line"))
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda s: s["line"]
            ),
            out_delimiter,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_dropped").cast("long")).alias("n_lines_dropped"),
    )


def intra_doc_line_dedup(
    lines: DataFrame,
    id_col: str = "doc_id",
    out_delimiter: str = "\n",
) -> DataFrame:
    """INTRA-document repeated-line removal with reassembly — the
    repetition REWRITE (Rae et al. 2021's "remove duplicated passages
    within a page") that :func:`line_dedup` deliberately does NOT do
    (its count is distinct-documents, exempting intra-doc repeats for
    the quality SIGNALS). Here the first occurrence of each normalized
    line (same :func:`content_hash` identity) survives, every later
    repeat inside the SAME document is dropped, and the document is
    rebuilt from survivors in original order. Blank lines are exempt —
    the same paragraph-structure rule as :func:`line_dedup`.

    Input/output contracts match :func:`line_dedup`: the exploded
    ``(id_col, pos, line)`` relation in, one row per document
    ``(id_col, clean_text, n_lines, n_lines_dropped)`` out.

    Scale shape (100 TB): occurrence numbering is a window over
    ``(document, line-hash)`` — keys at least as fine as the document,
    so partitions are bounded by a single line's repeat count within one
    document, never by corpus hot lines (the skew that forces
    :func:`line_dedup` through its agg+join instead); then the same
    per-document rebuild groupBy. Two shuffles, no corpus-wide window,
    no self-join.
    """
    # internal window key only — raw md5 bytes, not hex (same bijection
    # note as line_dedup's _h; the window exchange ships half the key)
    marked = lines.withColumn(
        "_h", F.when(F.trim(F.col("line")) != "", F.unhex(content_hash("line")))
    )
    occ_w = Window.partitionBy(id_col, "_h").orderBy("pos")
    flagged = marked.withColumn(
        "_dropped",
        F.when(
            F.col("_h").isNotNull(),
            F.row_number().over(occ_w) > 1,
        ).otherwise(F.lit(False)),
    )
    kept = F.when(
        ~F.col("_dropped"), F.struct(F.col("pos"), F.col("line"))
    )
    return flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept)), lambda s: s["line"]
            ),
            out_delimiter,
        ).alias("clean_text"),
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("_dropped").cast("long")).alias("n_lines_dropped"),
    )


def repeated_span_dedup(
    docs: DataFrame,
    window: int = 20,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact repeated-SUBSTRING dedup: every ``window``-token span that
    occurs two or more times anywhere in the corpus (across documents OR
    within one) is removed from every occurrence except one — the
    sequence-level tier of the dedup ladder (doc-level: exact_dedup /
    near-dups; line-level: line_dedup; THIS: verbatim passages shorter
    than a line-structure unit — quoted boilerplate, templated paragraphs,
    lifted text — the 'deduplicating training data' ExactSubstr pass of
    Lee et al. 2022, expressed as token windows instead of a suffix
    array).

    Semantics (pinned by the Python-reference twin in tests):
    - tokens are the whitespace tokens of the trimmed text, empty strings
      dropped (pipeline.token_count's rule);
    - every consecutive ``window``-token span is keyed by its space-joined
      string; a span value occurring >= 2 times corpus-wide is
      'duplicated';
    - the GLOBAL winner per span value — minimum (doc, position) — keeps
      its occurrence; every other occurrence marks its token range
      [pos, pos+window) for removal;
    - per document, marked ranges are merged (overlaps + adjacency) and
      the covered tokens dropped; the cleaned text is the surviving
      tokens joined by single spaces (token-level rebuild is inherently
      whitespace-normalizing, same as the segment tier);
    - documents shorter than ``window`` tokens pass through untouched
      (modulo the same whitespace normalization, so the output column is
      uniformly normalized);
    - removal is GREEDY over the union of marked ranges: a winner span can
      still lose tokens to a DIFFERENT span's removal overlapping it —
      the same artifact the suffix-array formulation has, documented
      rather than hidden.

    Scale shape (100 TB): occurrence rows are linear in corpus tokens
    (one per window start); the only corpus-global statistic is the
    per-span-value (count, min-(doc,pos)) hash aggregate — map-side
    combinable, keyed on a 128-BIT key (two independent 64-bit lanes,
    16 bytes — not the span string, whose shuffle weight is ~10× that),
    so a boilerplate span repeated 10⁹ times is ONE reduced row, not a
    skew cliff.

    Key construction (r15 optimization round): tokens contain no
    whitespace, so the space-join is INJECTIVE and span-string equality
    is exactly token-SEQUENCE equality — the key may therefore be built
    from the token sequence directly. Each token hashes once per lane in
    the JVM (xxhash64, two seeds); each window key is a positional
    polynomial combine of its w token hashes (odd multiplier, mod 2⁶⁴)
    computed VECTORIZED in one Arrow pass — w multiply-adds over flat
    int64 arrays instead of the previous w-deep concat_ws ladder that
    allocated an ~w·token_len string per window before hashing it
    (measured ~90% of this operator's scan stage). Hash-key trade,
    quantified: two DISTINCT token sequences colliding in BOTH lanes
    would merge their duplicate sets (spuriously deleting a
    non-duplicated span); per lane a collision needs the sequences'
    hash-difference polynomial to vanish mod 2⁶⁴ (~2⁻⁶⁴ for
    non-adversarial corpora, the same random-oracle-style argument the
    previous string-hash bound made), so the joint 128-bit birthday
    bound stays ~n²/2¹²⁹ ≈ 1e-13 at the posture's ~1e13 windows. The
    string-keyed semantics the docstring, Python twin, and DuckDB oracle
    pin are therefore exact up to that bound. The join-back carries only
    values that cleared count >= 2 (AQE broadcasts it when small), the
    per-doc merge is bounded by document length, and the interval merge
    + token filter are pure array algebra.
    """
    if window < 2:
        raise ValueError(f"window must be >= 2 tokens, got {window}")
    w = int(window)
    narrow = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    base = narrow.select(
        F.col(id_col),
        F.filter(tokenize(text_col), lambda t: t != "").alias("_toks"),
    )
    # per-token hash lanes in the JVM (one xxhash64 per token per lane),
    # window keys as a vectorized polynomial combine — see the docstring's
    # key-construction paragraph
    c1, c2 = 0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F  # odd multipliers

    _empty64 = np.empty(0, dtype=np.int64)

    @F.pandas_udf("struct<wh:array<bigint>,wh2:array<bigint>>")
    def _win_keys(l1: pd.Series, l2: pd.Series) -> pd.DataFrame:
        m1 = np.uint64(c1)
        m2 = np.uint64(c2)
        o1, o2 = [], []
        for a1, a2 in zip(l1, l2):
            n = len(a1)
            if n < w:
                o1.append(_empty64)
                o2.append(_empty64)
                continue
            u1 = np.asarray(a1, dtype=np.int64).view(np.uint64)
            u2 = np.asarray(a2, dtype=np.int64).view(np.uint64)
            k = n - w + 1
            h1 = np.zeros(k, dtype=np.uint64)
            h2 = np.zeros(k, dtype=np.uint64)
            with np.errstate(over="ignore"):
                for j in range(w):
                    h1 *= m1
                    h1 += u1[j : k + j]
                    h2 *= m2
                    h2 += u2[j : k + j]
            o1.append(h1.view(np.int64))
            o2.append(h2.view(np.int64))
        return pd.DataFrame({"wh": o1, "wh2": o2})

    occ = (
        base.select(
            F.col(id_col),
            _win_keys(
                F.transform(F.col("_toks"), lambda t: F.xxhash64(t)),
                F.transform(
                    F.col("_toks"), lambda t: F.xxhash64(F.lit(0x5EED), t)
                ),
            ).alias("_wk"),
        )
        .select(
            F.col(id_col),
            F.posexplode(
                F.arrays_zip(F.col("_wk.wh"), F.col("_wk.wh2"))
            ).alias("_pos", "_k"),
        )
        .select(
            F.col(id_col),
            "_pos",
            F.col("_k.wh").alias("_wh"),
            F.col("_k.wh2").alias("_wh2"),
        )
        # ONE explicit span-key exchange, shared by both consumers (r13
        # VERDICT ask #4): the duplicate-count aggregate requires this
        # partitioning anyway, and the occurrence side of the join-back
        # reuses the identical exchange (ReusedExchange) instead of
        # re-scanning and re-tokenizing the whole corpus a second time.
        # Halves the corpus-sized work and pins the spill surface to one
        # exchange; no partition count is forced, so AQE still sizes it.
        .repartition(F.col("_wh"), F.col("_wh2"))
    )
    dup = (
        occ.groupBy("_wh", "_wh2")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(F.struct(F.col(id_col).alias("d"), F.col("_pos").alias("p"))).alias("_w0"),
        )
        .filter(F.col("_c") >= 2)
        .select("_wh", "_wh2", "_w0")
    )
    removals = (
        occ.join(dup, ["_wh", "_wh2"])
        .filter(
            ~(
                (F.col(id_col) == F.col("_w0.d"))
                & (F.col("_pos") == F.col("_w0.p"))
            )
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_pos")).alias("_starts"))
    )
    # fold the sorted starts into merged [s, e) ranges — adjacency (p ==
    # last.e) merges too, so the range list is minimal
    empty_ranges = F.array().cast("array<struct<s:int,e:int>>")
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    merged = F.aggregate(
        F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
        empty_ranges,
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= last(acc)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["s"].alias("s"),
                        F.greatest(last(acc)["e"], p + w).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + w).alias("e"))))
        ),
    )
    joined = base.join(removals, id_col, "left").select(
        F.col(id_col), "_toks", merged.alias("_ranges")
    )
    # a token survives iff no merged range covers its 0-based index
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(
            F.col("_ranges"), lambda r: (r["s"] <= i) & (i < r["e"])
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("text"),
        F.size("_toks").alias("n_tokens_before"),
        (F.size("_toks") - F.size(kept)).alias("n_tokens_removed"),
        F.size("_ranges").alias("n_spans_removed"),
    )


def ngram_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct token n-gram shingles of a text column (empty if < n tokens).

    Built via :func:`token_ngrams` (zip_with over shifted token arrays) so
    shingling stays O(n·len) per row even on 10⁴-token documents — see the
    quadratic-capture pitfall documented there.
    """
    return F.array_distinct(token_ngrams(tokenize(text), n))


def _shingle_index(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # widen a tiny scan first: shingling is the CPU-bound stage and inherits
    # the scan's partition count (1 for a small parquet file) otherwise
    narrow = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    return narrow.select(
        F.col(id_col).alias("doc"),
        F.explode(ngram_shingles(text_col, n)).alias("shingle"),
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.2,
    method: str = "auto",
    pair_budget: int = 50_000_000,
    candidate_cap: int = 2_000_000_000,
    on_over_cap: str = "error",
) -> DataFrame:
    """Exact n-gram Jaccard similarity pairs (doc_a < doc_b, sim ≥ threshold).

    Two exact plans with identical result sets, picked by measured corpus
    shape when ``method='auto'`` (default):

    - ``method='count'`` — inverted-index self-join + co-occurrence count:
      |A∩B| falls out of a groupBy, no per-pair array work. Intermediate
      size is Σ_s df(s)², so it is the faster plan only while document
      frequencies are bounded.
    - ``method='prefix'`` — PPJoin-family prefix filtering: each doc indexes
      only its |d| − ⌈t·|d|⌉ + 1 rarest shingles (two sets with Jaccard ≥ t
      must share one), plus a length filter, then exact array-intersect
      verification on candidates. More fixed shuffles, but the plan that
      survives a Zipfian corpus where hot shingles make Σ df(s)² quadratic.
    - ``method='auto'`` — ESTIMATE Σ df(s)² from a deterministic 1/8 doc
      sample (md5-prefix, the same content-free draw as
      ``pipeline.hash_sample``) and take the count plan only when the
      estimate stays under ``pair_budget`` rows. With sampling rate p,
      E[df_sample²] = p²·df² + p(1−p)·df, so the unbiased estimator is
      ``(Σ df_s² − (1−p)·Σ df_s) / p²``; its relative error concentrates
      as 1/√(distinct shingles), and a hot shingle (the case the probe
      exists to catch — df ~ corpus size) appears in the sample at ~p·df,
      impossible to miss. The probe is what makes the fast plan safe: on a
      Zipfian corpus one hot shingle pushes the estimate past any budget
      and the plan flips to prefix before the quadratic explode ever runs.
      The probe pass is deliberately NOT persisted and runs on the sample
      only: caching a corpus-sized shingle index to feed later stages means
      a memory/disk footprint proportional to the corpus (the one thing a
      100 TB run cannot afford), and a planning heuristic does not need to
      tokenize the other 7/8 of the corpus. An empty sample estimates 0 —
      correct behavior, since a corpus with ≲8 documents is benign for
      either plan.

    Over-cap contract (``candidate_cap`` / ``on_over_cap``, auto mode only):
    the exact-pair tier is inherently quadratic in its worst case — on a
    duplicate-heavy corpus even the prefix plan's candidate join approaches
    n²/2 pairs, and no per-shingle budget can bound it. When the sampled
    estimate of the prefix plan's candidate volume
    (:func:`_estimate_prefix_candidates`) exceeds ``candidate_cap``, the
    operator refuses to START the join instead of leaving the cliff to a
    cluster timeout: ``on_over_cap='error'`` (default) raises a loud
    actionable error naming both estimates; ``on_over_cap='lsh'`` degrades
    to the MinHash-LSH tier with THIS function's exact 6-column schema and
    per-pair exact verification (recall over true pairs becomes
    probabilistic — the standard production posture at corpus scale). The
    default cap (2×10⁹ pre-distinct candidates, each a ~32-byte id pair →
    a ~64 GB candidate shuffle before the array-verify join fans in) is
    sized to what a large cluster finishes in minutes, not to the local
    harness; explicit ``method='count'``/``'prefix'`` remain caller
    assertions that bypass all probes, as before.

    Count-plan shape: ONE wide shuffle builds the inverted index
    ``shingle → sorted doc list`` (persisted — it is only materialized
    after the probe has certified ``Σ df² ≤ pair_budget``, so every doc
    list is ≤ √budget elements and the whole relation is distinct-shingle
    sized, tiny next to the corpus); |A∩B| then falls out of a nested
    explode of ordered pairs per doc list + one count agg, and |shingles(d)|
    from a doc-keyed count over the exploded lists — neither re-reads the
    corpus, and the old plan's inverted-index self-join (two more full-index
    shuffles) is gone entirely.
    """
    if method not in ("auto", "count", "prefix"):
        raise ValueError(
            f"unknown method {method!r} (auto | count | prefix) — a typo "
            "must not silently bypass the quadratic-safety probe"
        )
    if on_over_cap not in ("error", "lsh"):
        raise ValueError(
            f"unknown on_over_cap {on_over_cap!r} (error | lsh) — a typo "
            "must not silently disable the over-cap contract"
        )
    if method == "auto":
        from .pipeline import hash_sample

        p = 2.0 / 16.0
        sample_idx = _intern_shingles(
            _shingle_index(
                hash_sample(docs, id_col=id_col, hex_chars=("0", "1")),
                text_col,
                id_col,
                n,
            )
        )
        probe = (
            sample_idx.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("df"))
            .agg(
                F.sum(F.col("df") * F.col("df")).alias("s2"),
                F.sum(F.col("df")).alias("s1"),
            )
            .first()
        )
        est_df2 = ((probe["s2"] or 0) - (1.0 - p) * (probe["s1"] or 0)) / (p * p)
        if est_df2 <= pair_budget:
            method = "count"
        else:
            # the count plan is out; before committing to the prefix plan,
            # bound ITS worst case too. Prefix filtering caps df per indexed
            # shingle only probabilistically — a duplicate-heavy corpus (the
            # exact situation a dedup pass exists for) makes every copy index
            # the SAME rarest prefix shingles and the candidate join goes
            # ~n²/2 no matter the budget. Estimate the pre-distinct candidate
            # volume from the same sample and refuse to build a relation the
            # cluster cannot shuffle. This re-tokenizes the 1/8 sample (the
            # probe index is deliberately never persisted — see the docstring
            # memory posture) but only on this already-over-budget branch.
            method = "prefix"
            est_cand = _estimate_prefix_candidates(sample_idx, threshold, p)
            if est_cand > candidate_cap:
                if on_over_cap == "lsh":
                    import warnings

                    warnings.warn(
                        "ngram_jaccard_pairs: estimated exact-pair "
                        f"candidate volume {est_cand:,.0f} exceeds "
                        f"candidate_cap={candidate_cap:,}; degrading to "
                        "the MinHash-LSH tier (same schema and exact "
                        "per-pair verification, but recall over true "
                        "pairs is probabilistic, not exhaustive)",
                        stacklevel=2,
                    )
                    return _minhash_pairs_wide(
                        docs, text_col, id_col, n, threshold=threshold
                    )
                raise RuntimeError(
                    "ngram_jaccard_pairs: the exact-pair tier would "
                    f"build ~{est_cand:,.0f} candidate pairs "
                    f"(sampled estimate; Σdf² estimate {est_df2:,.0f}), "
                    f"over candidate_cap={candidate_cap:,} — refusing "
                    "to start a join the cluster cannot finish. "
                    "Options: (a) use the scalable near-dup tiers "
                    "(minhash_pairs / simhash_pairs), or pass "
                    "on_over_cap='lsh' to degrade to MinHash-LSH with "
                    "this function's schema; (b) raise candidate_cap "
                    "if the cluster genuinely has the shuffle headroom; "
                    "(c) pass method='prefix' to explicitly assert the "
                    "corpus is benign and bypass the probe."
                )
    if method == "prefix":
        return _jaccard_prefix(docs, text_col, id_col, n, threshold)
    # inverted index, one row per distinct shingle. The doc list is sorted
    # so ordered (doc_a < doc_b) pairs come from index-ordered slices; it is
    # bounded at √pair_budget elements by the probe (or the caller's explicit
    # method='count' assertion that the corpus is benign).
    grouped = (
        _intern_shingles(_shingle_index(docs, text_col, id_col, n))
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc")).alias("docs"))
        .select("docs", F.size("docs").alias("df"))
        .persist()
    )
    _INTERMEDIATE_CACHES.append(grouped)
    # |shingles(d)| derived from the index (shingles are already distinct);
    # docs with no shingles can't appear in any pair, so their absence from
    # `sizes` is harmless. This shuffle carries bare doc ids — no strings.
    sizes = (
        grouped.select(F.explode("docs").alias("doc"))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    # ordered co-occurrence pairs: two chained explodes so no row ever holds
    # the O(df²) pair set — memory per row stays O(df) ≤ O(√budget)
    # suffix length is computed exactly (df - i - 1), NOT passed as an
    # INT_MAX sentinel: Spark's interpreted Slice.eval adds start + length
    # in 32-bit ints, so a huge literal length overflows negative and
    # silently returns [] whenever codegen falls back to interpretation
    inter = (
        grouped.filter(F.col("df") >= 2)
        .select("docs", "df", F.posexplode("docs").alias("i", "doc_a"))
        .select(
            "doc_a",
            F.explode(
                F.slice(
                    "docs", F.col("i") + 2, F.col("df") - F.col("i") - 1
                )
            ).alias("doc_b"),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    sa = sizes.select(F.col("doc").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "sz_a", "sz_b", "jaccard")
    )


def _intern_shingles(idx: DataFrame) -> DataFrame:
    """Intern shingle strings to int64 via xxhash64 BEFORE every exchange
    in the exact-pair tier (r13 VERDICT ask #3): the posting/prefix
    shuffles then move fixed-width longs instead of n-gram strings (8
    bytes vs tens per shingle), and the hot per-candidate verify compares
    LONG arrays, not string arrays. Exactness: a result can change only if
    two DISTINCT shingles collide in 64-bit space inside one document
    (shrinks its set size by 1) or across one verified candidate pair
    (inflates n_inter by 1). With per-doc sets of ~10⁴ shingles, the
    per-pair collision mass is ~10⁸/2⁶⁴ ≈ 5×10⁻¹²; even 10¹⁰ verified
    pairs at 100 TB carry < 0.1 expected collisions — far below the
    corpus-noise floor of any dedup decision. Both exact plans intern with
    the same function, so count/prefix stay result-identical."""
    return idx.select("doc", F.xxhash64("shingle").alias("shingle"))


def _estimate_prefix_candidates(
    sidx: DataFrame, threshold: float, p: float
) -> float:
    """Unbiased estimate of the prefix plan's PRE-distinct candidate-pair
    volume, from the already-sampled shingle index ``sidx`` (sampling rate
    ``p`` over documents).

    Mirrors `_jaccard_prefix`'s candidate construction on the sample: per-doc
    rarest-first prefixes (sample-local dfs — shifts which shingles are
    prefix members, never how many), then Σ_s c_s·(c_s−1)/2 over per-shingle
    prefix counts. A pair of documents survives doc sampling with probability
    p², a single document with p, so E[Σ c(c−1)/2 | sample] ≈ p²·true_pairs
    and the estimator is simply sampled_pairs / p² (the c(c−1)/2 form has no
    linear df term to remove, unlike the Σdf² probe). Relative error
    concentrates over distinct prefix shingles; the duplicate-heavy cliff
    this guard exists for (df ~ corpus size on the shared prefix shingles)
    shows up in the sample at ~p·df — impossible to miss."""
    t_loose = max(0.0, threshold - 1e-9)
    dfreq = sidx.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    sets = (
        sidx.join(dfreq, "shingle")
        .groupBy("doc")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("sh")
        )
        .withColumn("sz", F.size("sh"))
    )
    prefix = sets.select(
        F.explode(
            F.slice(
                "sh", 1, F.col("sz") - F.ceil(F.lit(t_loose) * F.col("sz")) + 1
            )
        ).alias("shingle"),
    )
    row = (
        prefix.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("c"))
        .agg(F.sum(F.col("c") * (F.col("c") - 1) / 2).alias("pairs"))
        .first()
    )
    return float(row["pairs"] or 0) / (p * p)


def _jaccard_prefix(
    docs: DataFrame,
    text_col: str,
    id_col: str,
    n: int,
    threshold: float,
    idx: DataFrame | None = None,
) -> DataFrame:
    if idx is None:
        idx = _intern_shingles(_shingle_index(docs, text_col, id_col, n))
    # candidate-pruning bounds use a hair-loosened threshold: threshold*sz
    # in doubles can exceed the true rational product (0.28*25 =
    # 7.000000000000001), which would drop a pair whose Jaccard is EXACTLY
    # the threshold — a pair the count plan and the final exact filter
    # keep. Loosening only ADMITS candidates; the exact jaccard >=
    # threshold verify below still decides every pair, so the two plans
    # stay result-identical.
    t_loose = max(0.0, threshold - 1e-9)
    # document frequency per shingle — the only corpus-global statistic
    dfreq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    # one pass per doc: shingles sorted rarest-first, size folded in
    # (|shingles(d)| comes from the index itself — shingles are distinct —
    # so the corpus is tokenized exactly once)
    sets = (
        idx.join(dfreq, "shingle")
        .groupBy("doc")
        .agg(
            F.transform(
                F.sort_array(F.collect_list(F.struct("df", "shingle"))),
                lambda s: s["shingle"],
            ).alias("sh")
        )
        .withColumn("sz", F.size("sh"))
    )
    prefix = sets.select(
        "doc",
        "sz",
        F.explode(
            F.slice(
                "sh", 1, F.col("sz") - F.ceil(F.lit(t_loose) * F.col("sz")) + 1
            )
        ).alias("shingle"),
    )
    a, b = prefix.alias("a"), prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc") < F.col("b.doc"))
            & (F.lit(t_loose) * F.col("a.sz") <= F.col("b.sz"))
            & (F.lit(t_loose) * F.col("b.sz") <= F.col("a.sz")),
        )
        .select(F.col("a.doc").alias("doc_a"), F.col("b.doc").alias("doc_b"))
        .distinct()
    )

    sa = sets.select(F.col("doc").alias("doc_a"), F.col("sh").alias("sh_a"))
    sb = sets.select(F.col("doc").alias("doc_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("sz_a", F.size("sh_a"))
        .withColumn("sz_b", F.size("sh_b"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "n_inter", "sz_a", "sz_b", "jaccard")
    )


def _cc_star(edges: DataFrame, max_iter: int) -> DataFrame:
    """Connected components via alternating large-star/small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds regardless of component DIAMETER, where
    min-label propagation needs O(diameter). The operations per round are
    exactly the min-label shapes (per-node min + equi-join + distinct), so
    cost per round is comparable; this is the right method when components
    can be long chains (e.g. transitive near-dup threads).

    ``edges`` is the symmetric (src, dst) relation; returns (id, label)
    with label = component minimum.
    """
    # canonical form: every edge stored (hi, lo) with lo < hi — both star
    # operations only ever emit toward a minimum, so the invariant holds
    e = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.greatest("src", "dst").alias("hi"),
            F.least("src", "dst").alias("lo"),
        )
        .distinct()
        .localCheckpoint()
    )

    def _sym(df: DataFrame) -> DataFrame:
        return df.select(F.col("hi").alias("u"), F.col("lo").alias("v")).unionByName(
            df.select(F.col("lo").alias("u"), F.col("hi").alias("v"))
        )

    converged = False
    n_prev = e.count()
    for _ in range(max_iter):
        # large-star(u): m = min(Γ(u) ∪ {u}); emit (v, m) for v ∈ Γ(u), v > u
        sym = _sym(e)
        m = sym.groupBy("u").agg(F.min("v").alias("mv"))
        m = m.select("u", F.least("u", "mv").alias("m"))
        e1 = (
            sym.join(m, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # small-star(u): N = smaller neighbors; m = min(N);
        # emit (v, m) for v ∈ (N ∪ {u}) \ {m}
        down = _sym(e1).filter(F.col("v") < F.col("u"))
        m2 = down.groupBy("u").agg(F.min("v").alias("m"))
        e2 = (
            down.join(m2, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .unionByName(
                m2.select(F.col("u").alias("hi"), F.col("m").alias("lo"))
            )
            .filter(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()
        )
        # fixed-point test: both relations are distinct, so |e2| = |e| plus
        # e2 ⊆ e implies set equality — one count over checkpointed data
        # (the previous round's count is carried, not recomputed) and one
        # anti-join emptiness probe, instead of three full-relation jobs
        n_cur = e2.count()
        same = n_cur == n_prev and e2.exceptAll(e).isEmpty()
        n_prev = n_cur
        e = e2
        if same:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"_cc_star did not converge within max_iter={max_iter} rounds"
        )
    # fixed point = disjoint stars centered on component minima
    nodes = e.select(F.col("hi").alias("id"), F.col("lo").alias("label"))
    roots = e.select(F.col("lo").alias("id")).distinct().withColumn(
        "label", F.col("id")
    )
    return nodes.unionByName(roots).groupBy("id").agg(
        F.min("label").alias("label")
    )


def _cc_driver(pairs: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Driver union-find over a BOUNDED edge list — the small-graph fast
    path of ``dedup_clusters`` (r15 optimization round). Identical output
    to the distributed methods by construction: connected components with
    label = component minimum, cluster_size = component cardinality.
    Union-find with path compression is O(E·α); the caller has already
    size-gated the collect (same driver/distributed discipline as
    ``bpe.train_bpe``'s vocab limit), so the edge list is a few MB, and
    every per-round shuffle + fixed-point probe job of the iterative
    methods collapses into one collect + one createDataFrame."""
    spark = pairs.sparkSession
    pdf = pairs.select(
        F.col(a_col).cast("long").alias("a"), F.col(b_col).cast("long").alias("b")
    ).toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(pdf["a"].to_numpy(), pdf["b"].to_numpy()):
        a, b = int(a), int(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by MIN root so the final find() is already the label
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
        else:
            parent.setdefault(a, ra)
    nodes = set(map(int, pdf["a"].to_numpy())) | set(map(int, pdf["b"].to_numpy()))
    labels = {n: find(n) for n in nodes}
    sizes: dict[int, int] = {}
    for lbl in labels.values():
        sizes[lbl] = sizes.get(lbl, 0) + 1
    rows = [(n, lbl, sizes[lbl]) for n, lbl in labels.items()]
    return spark.createDataFrame(
        rows, "doc_id long, cluster_id long, cluster_size long"
    )


#: edge budget for the driver union-find fast path: 2M (a, b) int64 pairs
#: collect as ~32 MB — trivially driver-safe at any deployment size, while
#: a corpus whose near-dup PAIR relation exceeds it takes the distributed
#: star/label tier it was designed for.
_CC_DRIVER_EDGE_LIMIT = 2_000_000


def dedup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iter: int = 50,
    method: str = "label",
    driver_edge_limit: int = _CC_DRIVER_EDGE_LIMIT,
) -> DataFrame:
    """Connected components over near-dup pairs → (doc_id, cluster_id,
    cluster_size), cluster_id = the component's minimum doc id.

    This is the step every dedup ladder ends with: pair lists from any tier
    (Jaccard / MinHash / SimHash / embedding) become *groups*, from which one
    canonical copy per cluster is kept. Spark-first as iterative min-label
    propagation: each round every node adopts the minimum label among itself
    and its neighbors — a broadcast-friendly join + min-agg per round,
    converging in O(component diameter) rounds (near-dup components are
    shallow; typical corpora converge in ≤3). Each round is one shuffle keyed
    on node id; no all-pairs work, state is |nodes| rows.

    ``method='star'`` switches to alternating large-star/small-star
    contraction (``_cc_star``) — O(log n) rounds independent of component
    diameter, the right choice when near-dup threads can chain arbitrarily
    deep; equality with label propagation is pinned in tests.

    Iterative-plan hygiene: each round's label relation is
    ``localCheckpoint``ed — the label lineage references itself twice per
    round, so without truncation the logical plan doubles every iteration
    and Catalyst analysis, not the data, becomes the bottleneck (the classic
    iterative-Spark failure mode). On a cluster, swap localCheckpoint for a
    reliable ``checkpoint`` dir; the loop is otherwise unchanged.
    """
    if method not in ("label", "star", "auto"):
        raise ValueError(f"unknown method {method!r} (label | star | auto)")
    if method == "auto":
        # size-gated driver fast path (same discipline as train_bpe's
        # driver_vocab_limit): bounded edge lists union-find on the driver
        # in one collect; past the budget, the distributed star tier runs
        # unchanged. Identity of the three methods is pinned in tests.
        n_edges = pairs.limit(driver_edge_limit + 1).count()
        if n_edges <= driver_edge_limit:
            return _cc_driver(pairs, a_col, b_col)
        method = "star"
    edges = pairs.select(
        F.col(a_col).alias("src"), F.col(b_col).alias("dst")
    ).union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
    edges = edges.localCheckpoint()
    if method == "star":
        labels = _cc_star(edges, max_iter)
        # a node whose ONLY edges are self-pairs never enters the star edge
        # relation (src != dst filter) but label propagation keeps it as a
        # singleton — reattach such nodes so the two pinned-equal methods
        # cannot diverge on degenerate (d, d) input rows
        singletons = (
            edges.select(F.col("src").alias("id"))
            .distinct()
            .join(labels, "id", "left_anti")
            .withColumn("label", F.col("id"))
        )
        labels = labels.unionByName(singletons)
        w = Window.partitionBy("label")
        return labels.select(
            F.col("id").alias("doc_id"),
            F.col("label").alias("cluster_id"),
            F.count(F.lit(1)).over(w).alias("cluster_size"),
        )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    converged = False
    for _ in range(max_iter):
        neighbor_min = (
            edges.join(labels, edges.src == labels.id)
            .groupBy(F.col("dst").alias("id"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(neighbor_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # falling through silently would return split (wrong) clusters for a
        # chain-shaped component whose diameter exceeds max_iter — fail loud;
        # for pathological graphs raise max_iter or switch to large-star/
        # small-star contraction (O(log n) rounds).
        raise RuntimeError(
            f"dedup_clusters did not converge within max_iter={max_iter} "
            "label-propagation rounds (component diameter too large)"
        )
    w = Window.partitionBy("label")
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        F.count(F.lit(1)).over(w).alias("cluster_size"),
    )


def cross_corpus_contamination(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 1,
    exact: bool = True,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Benchmark-decontamination sweep: which TRAIN documents share content
    with an EVAL set — exact duplicates and/or n-gram shingle overlap.

    Returns one row per contaminated (train_id, eval_id) pair with
    ``exact_dup`` (normalized-text hash equality) and ``n_shared_shingles``
    (distinct n-gram overlap ≥ ``min_overlap``). This is the standard
    pre-training hygiene step (remove eval benchmarks from the training
    corpus) expressed as pure relational algebra:

    - shingle overlap is the same inverted-index equi-join as
      ``ngram_jaccard_pairs``, but ACROSS corpora — a genuine eval set is
      tiny relative to training data, so its shingle index broadcasts and
      the 100 TB train scan never shuffles;
    - exact duplication is a broadcast semi-join on md5(normalized text).

    At scale this is one pass over the training corpus with two broadcast
    hash probes — no train-side self-join ever happens.

    ``broadcast_eval`` hard-hints the two eval-side broadcasts; it is the
    right default ONLY because real eval sets are bounded by construction.
    Pass ``False`` when the eval relation's size is corpus-proportional
    (e.g. a hash-sampled holdout) — the joins stay the same and AQE picks
    broadcast at runtime if the side is actually small.
    """
    maybe_bcast = F.broadcast if broadcast_eval else (lambda df: df)
    t_idx = _shingle_index(train, text_col, id_col, n).withColumnRenamed(
        "doc", "train_id"
    )
    e_idx = _shingle_index(evalset, text_col, id_col, n).withColumnRenamed(
        "doc", "eval_id"
    )
    shingle_hits = (
        t_idx.join(maybe_bcast(e_idx), "shingle")
        .groupBy("train_id", "eval_id")
        .agg(F.count(F.lit(1)).alias("n_shared_shingles"))
        .filter(F.col("n_shared_shingles") >= min_overlap)
    )
    if not exact:
        return shingle_hits.withColumn("exact_dup", F.lit(False))
    # internal join key only — raw md5 bytes, not hex (bijective; halves
    # the train-side key bytes when the eval side is too big to broadcast)
    t_hash = train.select(
        F.col(id_col).alias("train_id"), F.unhex(content_hash(text_col)).alias("_h")
    )
    e_hash = evalset.select(
        F.col(id_col).alias("eval_id"), F.unhex(content_hash(text_col)).alias("_h")
    )
    exact_pairs = t_hash.join(maybe_bcast(e_hash), "_h").select(
        "train_id", "eval_id", F.lit(True).alias("exact_dup")
    )
    return (
        shingle_hits.join(exact_pairs, ["train_id", "eval_id"], "full")
        .select(
            "train_id",
            "eval_id",
            F.coalesce(F.col("exact_dup"), F.lit(False)).alias("exact_dup"),
            F.coalesce(F.col("n_shared_shingles"), F.lit(0)).alias(
                "n_shared_shingles"
            ),
        )
    )


def bloom_prefiltered_contamination(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_overlap: int = 1,
    exact: bool = True,
    n_bits: int = 1 << 16,
    k: int = 5,
    broadcast_eval: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """The Bloom-prefilter → exact-verify decontamination cascade — the
    composition ``llmdata/bloom.py`` exists for, wired end-to-end.

    Sketch the eval corpus ONCE into an m-bit Bloom filter (shingles plus,
    when ``exact``, ``'#h:'``-prefixed content hashes — one filter, two
    namespaces), probe every training document SCAN-SIDE, and run the
    exact verifier (:func:`cross_corpus_contamination`) only over the
    Bloom-positive training docs. Because a Bloom filter has no false
    negatives, every training doc with ≥ ``min_overlap`` shared shingles
    (or an exact-dup hash) necessarily probes positive on those very
    items, so the cascade's output is IDENTICAL to running the exact
    verifier over the whole corpus — pinned in
    tests/test_llmdata.py::test_bloom_prefilter_cascade_equals_exact.
    At 100 TB the verifier's shingle
    join touches only the (tiny) positive slice instead of the full
    training scan; the probe itself is per-row column algebra with zero
    joins, and the only shuffle the prefilter adds is the per-doc
    positive-shingle count (one row per train doc, map-side combined).

    Returns ``(pairs, survivors)``: ``pairs`` is the verified
    contamination relation (same schema as
    :func:`cross_corpus_contamination`), ``survivors`` the Bloom-positive
    (id) relation the verifier was scoped to — callers (and the pin)
    can count it to SEE that the exact stage touched only positives.
    """
    from .bloom import bloom_build, bloom_probe

    e_items = _shingle_index(evalset, text_col, id_col, n).select(
        F.col("shingle").alias("item")
    )
    if exact:
        e_items = e_items.union(
            evalset.select(
                F.concat(F.lit("#h:"), content_hash(text_col)).alias("item")
            )
        )
    bloom = bloom_build(e_items, "item", n_bits=n_bits, k=k)
    # per-doc positive-shingle count: shingles are distinct per doc by
    # construction (ngram_shingles array_distincts), so the count of
    # positive rows IS the distinct positive count, and any (train, eval)
    # pair sharing >= min_overlap shingles leaves its train doc with >=
    # min_overlap positives — no pair can be lost at this stage
    sh_pos = (
        bloom_probe(
            _shingle_index(train, text_col, id_col, n),
            bloom, "shingle", n_bits=n_bits, k=k,
        )
        .filter(F.col("member"))
        .groupBy("doc")
        .agg(F.count(F.lit(1)).alias("_n_pos"))
        .filter(F.col("_n_pos") >= min_overlap)
        .select(F.col("doc").alias(id_col))
    )
    survivors = sh_pos
    if exact:
        h_pos = (
            bloom_probe(
                train.select(
                    F.col(id_col),
                    F.concat(F.lit("#h:"), content_hash(text_col)).alias("_i"),
                ),
                bloom, "_i", n_bits=n_bits, k=k,
            )
            .filter(F.col("member"))
            .select(id_col)
        )
        survivors = sh_pos.union(h_pos).distinct()
    pairs = cross_corpus_contamination(
        train.join(survivors, id_col, "semi"),
        evalset,
        text_col=text_col,
        id_col=id_col,
        n=n,
        min_overlap=min_overlap,
        exact=exact,
        broadcast_eval=broadcast_eval,
    )
    return pairs, survivors


def contamination_spans(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    broadcast_eval: bool = True,
) -> DataFrame:
    """Contamination SEVERITY — the span-level refinement of
    :func:`cross_corpus_contamination`: for each (train, eval) pair that
    shares at least one token n-gram, the length in TOKENS of the longest
    contiguous eval passage that appears verbatim in the training doc,
    plus the count of maximal such spans and the total matched n-gram
    positions. "This doc shares 3 shingles" and "this doc contains the
    benchmark's entire 200-token answer verbatim" are different decisions
    (Carlini et al.-style memorization auditing); the presence tier can't
    tell them apart.

    Method — diagonal islands, pure integer algebra: positional (not
    distinct) n-gram shingles on both sides join on the shingle string; a
    contiguous common run of L tokens (L ≥ n) is exactly L−n+1 matches on
    one DIAGONAL d = pos_train − pos_eval with consecutive eval
    positions, so islands per (train, eval, d) fall out of the classic
    gaps-and-islands key ``pos_eval − row_number()`` and
    ``max_span_tokens = longest island + n − 1``. Within a diagonal,
    pos_train is determined by pos_eval, so repeated shingles can never
    double-count a cell. No floats anywhere — the DuckDB twin re-derives
    every value exactly.

    Scale shape: the eval side broadcasts (same bound as the presence
    tier); matches are bounded by actual shared-shingle positions, never
    |train|×|eval|; the islands pass shuffles MATCHES keyed by
    (train, eval, diagonal) — at 100 TB compose this behind
    :func:`bloom_prefiltered_contamination`'s prefilter so only Bloom
    positives reach the positional join."""
    maybe_bcast = F.broadcast if broadcast_eval else (lambda df: df)

    def _pos_idx(docs: DataFrame, out_id: str) -> DataFrame:
        narrow = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
        return narrow.select(
            F.col(id_col).alias(out_id),
            F.posexplode(token_ngrams(tokenize(text_col), n)).alias(
                "pos", "shingle"
            ),
        )

    t_idx = _pos_idx(train, "train_id").withColumnRenamed("pos", "p_t")
    e_idx = _pos_idx(evalset, "eval_id").withColumnRenamed("pos", "p_e")
    matches = t_idx.join(maybe_bcast(e_idx), "shingle").select(
        "train_id", "eval_id", "p_t", "p_e", (F.col("p_t") - F.col("p_e")).alias("d")
    )
    isl = matches.withColumn(
        "_isl",
        F.col("p_e")
        - F.row_number().over(
            Window.partitionBy("train_id", "eval_id", "d").orderBy("p_e")
        ),
    )
    runs = isl.groupBy("train_id", "eval_id", "d", "_isl").agg(
        F.count(F.lit(1)).alias("_len")
    )
    return (
        runs.groupBy("train_id", "eval_id")
        .agg(
            (F.max("_len") + F.lit(n - 1)).alias("max_span_tokens"),
            F.count(F.lit(1)).alias("n_spans"),
            F.sum("_len").alias("n_matched_ngrams"),
        )
    )


def pick_canonical(
    clusters: DataFrame,
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    prefer: str = "longest",
) -> DataFrame:
    """The dedup ladder's last step: one kept document per near-dup cluster.

    ``clusters`` is ``dedup_clusters`` output (doc_id, cluster_id, …);
    returns (cluster_id, keep_id, cluster_size). Policy:

    - ``prefer='longest'`` — keep the longest member (ties → lowest id):
      the standard curation choice (the longest near-dup usually subsumes
      the fragments);
    - ``prefer='min_id'`` — keep the smallest id (pure determinism, no
      content read).

    One ``max_by`` hash aggregation per cluster — partial-combined,
    skew-immune, same plan family as latest_per_key; documents outside any
    cluster are singletons and simply keep themselves (no row needed here).
    """
    joined = clusters.select(F.col(id_col), "cluster_id").join(
        docs.select(F.col(id_col), F.length(text_col).alias("_len")), id_col
    )
    # min_by with an (ordering, id) struct key instead of max_by over a
    # negated id: unary minus on the id column implicitly casts to double —
    # NULL (or an ANSI cast error) for string/UUID ids, while every other
    # operator in this module is id-type-agnostic. Negating LENGTH is fine
    # (always numeric).
    if prefer == "longest":
        keep = F.min_by(
            F.col(id_col), F.struct(-F.col("_len"), F.col(id_col))
        )
    elif prefer == "min_id":
        keep = F.min(F.col(id_col))
    else:
        raise ValueError(f"unknown prefer={prefer!r}")
    return joined.groupBy("cluster_id").agg(
        keep.alias("keep_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )


def minhash_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
) -> DataFrame:
    """MinHash signature per doc: for permutation i, min over shingles of
    xxhash64(shingle ⊕ i). One explode + one hash-agg with ``num_perm`` min
    columns — map-side combinable, shuffles |docs| rows."""
    idx = _shingle_index(docs, text_col, id_col, n)
    mins = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}")
        for i in range(num_perm)
    ]
    sig = idx.groupBy("doc").agg(*mins)
    return sig.select(
        "doc", F.array(*[F.col(f"mh_{i}") for i in range(num_perm)]).alias("signature")
    )


def minhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    See :func:`_minhash_pairs_wide` for the full plan description; this
    public form projects the (doc_a, doc_b, jaccard) contract columns.
    """
    return _minhash_pairs_wide(
        docs, text_col, id_col, n, num_perm, bands, threshold, shingled
    ).select("doc_a", "doc_b", "jaccard")


def _minhash_pairs_wide(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    shingled: DataFrame | None = None,
) -> DataFrame:
    """MinHash+LSH near-dup pairs, verified with exact Jaccard.

    Pipeline: signatures → split into ``bands`` bands of num_perm/bands rows
    → explode (band_idx, band_hash) → equi-join on the band bucket →
    candidate pairs → exact shingle-set Jaccard on candidates only.
    Collision probability per band is s^(rows_per_band), so with 8×4 a pair
    at s=0.5 is caught with P ≈ 1-(1-0.0625)^8 ≈ 0.40 per band set — tune
    bands/rows for the corpus; the exact verify step removes false
    positives entirely.

    ``shingled`` — optional precomputed ``(doc, sh array)`` distinct-shingle
    relation (the ``ngram_shingles`` form). The CPU-bound shingling stage
    otherwise runs twice per call (once inside the signature agg, once for
    the verify sets); a caller that persists a bounded corpus's relation
    halves that — same contract as ``simhash_pairs``' ``fingerprints``
    parameter. At 100 TB you deliberately recompute instead of caching a
    corpus-sized relation; the default does exactly that.
    """
    if num_perm % bands != 0:
        # a bare assert is stripped under python -O, silently banding on a
        # truncated signature; dedup_index raises for the same condition
        raise ValueError(
            f"num_perm={num_perm} must be divisible by bands={bands}"
        )
    rows_per_band = num_perm // bands
    if shingled is None:
        sig = minhash_signatures(docs, text_col, id_col, n, num_perm)
    else:
        idx = shingled.select(
            F.col("doc"), F.explode(F.col("sh")).alias("shingle")
        )
        mins = [
            F.min(F.xxhash64(F.col("shingle"), F.lit(i))).alias(f"mh_{i}")
            for i in range(num_perm)
        ]
        sig = (
            idx.groupBy("doc")
            .agg(*mins)
            .select(
                "doc",
                F.array(
                    *[F.col(f"mh_{i}") for i in range(num_perm)]
                ).alias("signature"),
            )
        )
    band_cols = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    *[F.col("signature")[b * rows_per_band + r] for r in range(rows_per_band)]
                ).alias("bhash"),
            )
            for b in range(bands)
        ]
    )
    buckets = sig.select("doc", F.explode(band_cols).alias("bb")).select(
        "doc", F.col("bb.band").alias("band"), F.col("bb.bhash").alias("bhash")
    )
    x, y = buckets.alias("x"), buckets.alias("y")
    cand = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bhash") == F.col("y.bhash"))
            & (F.col("x.doc") < F.col("y.doc")),
        )
        .select(F.col("x.doc").alias("doc_a"), F.col("y.doc").alias("doc_b"))
        .distinct()
    )
    if shingled is None:
        shingled = ensure_parallelism(
            docs.select(F.col(id_col), F.col(text_col))
        ).select(
            F.col(id_col).alias("doc"), ngram_shingles(text_col, n).alias("sh")
        )
    # ONE verify join, not two (r15 continuation 2): joining the candidate
    # pairs to per-side copies of `shingled` evaluated the corpus-wide
    # shingle projection TWICE, and whenever the planner build-sided the
    # corpus copy the whole shingle relation was broadcast/shuffled for a
    # handful of pairs (the guide §8 anti-pattern). Exploding each pair
    # into its two member docs joins the corpus relation ONCE — the tiny
    # exploded-candidate side is what gets built/broadcast — and the
    # pair-sized regroup carries only candidate docs' shingle arrays.
    # first(ignorenulls) is deterministic here: each pair-group has exactly
    # one row per side (doc_a < doc_b, one shingle row per doc).
    # PRECONDITION (r15 ADVICE): ids must be unique in `docs`/`shingled` —
    # with duplicate ids the regroup would pick one shingle array
    # nondeterministically where the old two-join plan emitted multiplied
    # per-row pairs. Every corpus entrypoint in this package holds unique
    # ids by contract (the gate corpus keys on doc_id); a caller feeding
    # duplicated ids must dedup `shingled` on doc first.
    cand2 = cand.select(
        "doc_a", "doc_b", F.explode(F.array("doc_a", "doc_b")).alias("doc")
    )
    verified = (
        cand2.join(shingled, "doc")
        .groupBy("doc_a", "doc_b")
        .agg(
            F.first(
                F.when(F.col("doc") == F.col("doc_a"), F.col("sh")), True
            ).alias("sh_a"),
            F.first(
                F.when(F.col("doc") == F.col("doc_b"), F.col("sh")), True
            ).alias("sh_b"),
        )
        .withColumn("n_inter", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn("sz_a", F.size("sh_a"))
        .withColumn("sz_b", F.size("sh_b"))
        .withColumn(
            "jaccard",
            F.col("n_inter").cast("double")
            / (F.col("sz_a") + F.col("sz_b") - F.col("n_inter")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    # the wide projection matches ngram_jaccard_pairs' exact schema so the
    # over-cap guard there can degrade to this tier without a schema change
    return verified.select("doc_a", "doc_b", "n_inter", "sz_a", "sz_b", "jaccard")


# packed-lane SimHash accumulator geometry: 3 bit-counters per BIGINT in
# 21-bit lanes → 22 aggregate columns instead of 64. Lane sums are exact as
# long as no document has ≥ 2^21 tokens (guarded loudly below); bit i of the
# fingerprint is set iff strictly more than half the token hashes set it —
# identical to the ±1-sum sign rule (2·ones > n ⇔ Σ(±1) > 0).
_SIMHASH_LANE_BITS = 21
_SIMHASH_BITS_PER_COL = 3
_SIMHASH_N_PACKED = 22  # ceil(64 / 3)


def simhash_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    impl: str = "packed",
) -> DataFrame:
    """64-bit SimHash per document, stored as 4×16-bit chunks (array<int>).

    Per token: xxhash64 → 64 sign contributions (+1 if bit set else −1),
    summed per document; fingerprint bit i = sign of sum. The chunked
    representation avoids BIGINT sign/overflow issues under ANSI mode and is
    what the pigeonhole banding joins on.

    ``impl='packed'`` (default) accumulates 3 per-bit counters per BIGINT in
    21-bit lanes — a 22-column aggregation buffer instead of 64, measurably
    faster through the hash agg's per-row buffer update, with a loud
    ``assert_true`` guard on the 2²¹-tokens-per-doc lane capacity.
    ``impl='wide'`` is the direct 64-column ±1 formulation, kept as the
    reference implementation; equality of the two is pinned in
    tests/test_llmdata.py.
    """
    tok = (
        ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col).alias("doc"), F.explode(tokenize(text_col)).alias("token"))
        .withColumn("h", F.xxhash64("token"))
    )
    if impl == "wide":
        bit_sums = [
            F.sum(
                F.when(F.col("h").bitwiseAND(F.shiftleft(F.lit(1).cast("long"), i)) != 0, 1).otherwise(-1)
            ).alias(f"s_{i}")
            for i in range(64)
        ]
        summed = tok.groupBy("doc").agg(*bit_sums)
        bit_of = {
            i: (F.col(f"s_{i}") > 0) for i in range(64)
        }
    else:
        packed = []
        for g in range(_SIMHASH_N_PACKED):
            bits = range(
                g * _SIMHASH_BITS_PER_COL,
                min((g + 1) * _SIMHASH_BITS_PER_COL, 64),
            )
            lanes = None
            for j, b in enumerate(bits):
                lane = F.shiftleft(
                    F.shiftright("h", b).bitwiseAND(F.lit(1)),
                    _SIMHASH_LANE_BITS * j,
                )
                lanes = lane if lanes is None else lanes + lane
            packed.append(F.sum(lanes).alias(f"p_{g}"))
        summed = tok.groupBy("doc").agg(
            F.count(F.lit(1)).alias("_n"), *packed
        )
        lane_mask = (1 << _SIMHASH_LANE_BITS) - 1

        def _count(i: int):
            g, j = divmod(i, _SIMHASH_BITS_PER_COL)
            return F.shiftright(
                F.col(f"p_{g}"), _SIMHASH_LANE_BITS * j
            ).bitwiseAND(F.lit(lane_mask))

        bit_of = {i: (2 * _count(i) > F.col("_n")) for i in range(64)}
        # the lane-capacity guard must live INSIDE an expression that reaches
        # the output (a free-standing column would be pruned by Catalyst and
        # never evaluated): assert_true yields NULL (or raises), so this adds
        # a non-foldable 0 to chunk_0
        guard = F.coalesce(
            F.assert_true(
                F.col("_n") < F.lit(1 << _SIMHASH_LANE_BITS),
                F.lit(
                    "simhash packed lanes overflow: document exceeds 2^21 "
                    "tokens — use impl='wide'"
                ),
            ).cast("int"),
            F.lit(0),
        )
    if impl == "wide":
        guard = F.lit(0)
    chunks = []
    for c in range(4):
        expr = None
        for j in range(16):
            bcol = F.when(bit_of[c * 16 + j], F.lit(1 << j)).otherwise(0)
            expr = bcol if expr is None else expr + bcol
        if c == 0:
            expr = expr + guard
        chunks.append(expr.cast("int").alias(f"chunk_{c}"))
    fp = summed.select("doc", *chunks)
    return fp.select(
        "doc",
        F.array(*[F.col(f"chunk_{c}") for c in range(4)]).alias("simhash_chunks"),
        F.concat_ws(
            "",
            *[F.lpad(F.hex(F.col(f"chunk_{c}")), 4, "0") for c in range(4)],
        ).alias("simhash_hex"),
    )


def simhash_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    method: str = "banded",
    fingerprints: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs with SimHash Hamming distance ≤ ``max_hamming`` (< 4).

    - ``method='banded'`` (default) — pigeonhole: distance < 4 over 64 bits
      ⇒ at least one of the four 16-bit chunks is identical → candidates
      come from an equi-join on (chunk_idx, chunk_value); exact Hamming
      verification via bit_count(xor) over the chunks. Same candidate-
      generation shape as published SimHash dedup systems: no all-pairs
      comparison ever materializes, and the pigeonhole guarantee makes the
      result *identical* to brute force — a provable-recall banding.
    - ``method='brute'`` — all-pairs Hamming scan: the verification twin
      (quadratic; calibration and the oracle-checked recall property only).

    ``fingerprints`` lets callers running both methods (the recall property)
    share one — ideally persisted — fingerprint relation instead of paying
    the 64-column signature aggregation per method.
    """
    if method not in ("banded", "brute"):
        raise ValueError(f"unknown method {method!r} (banded | brute)")
    fp = (
        fingerprints
        if fingerprints is not None
        else simhash_fingerprints(docs, text_col, id_col)
    )
    if method == "brute":
        x = fp.select(F.col("doc").alias("doc_a"), F.col("simhash_chunks").alias("ch_a"))
        y = fp.select(F.col("doc").alias("doc_b"), F.col("simhash_chunks").alias("ch_b"))
        cand = x.join(y, F.col("doc_a") < F.col("doc_b"))
    else:
        buckets = fp.select(
            "doc",
            "simhash_chunks",
            F.posexplode("simhash_chunks"),
        ).select("doc", "simhash_chunks", F.col("pos").alias("ci"), F.col("col").alias("cv"))
        x, y = buckets.alias("x"), buckets.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.ci") == F.col("y.ci"))
                & (F.col("x.cv") == F.col("y.cv"))
                & (F.col("x.doc") < F.col("y.doc")),
            )
            .select(
                F.col("x.doc").alias("doc_a"),
                F.col("x.simhash_chunks").alias("ch_a"),
                F.col("y.doc").alias("doc_b"),
                F.col("y.simhash_chunks").alias("ch_b"),
            )
            .distinct()
        )
    hamming = (
        F.bit_count(F.col("ch_a")[0].bitwiseXOR(F.col("ch_b")[0]))
        + F.bit_count(F.col("ch_a")[1].bitwiseXOR(F.col("ch_b")[1]))
        + F.bit_count(F.col("ch_a")[2].bitwiseXOR(F.col("ch_b")[2]))
        + F.bit_count(F.col("ch_a")[3].bitwiseXOR(F.col("ch_b")[3]))
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
    )
