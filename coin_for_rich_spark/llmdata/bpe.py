"""Byte-pair encoding: train a real BPE merge table on a corpus and
tokenize with it — the token-counting tier above the whitespace/regex
heuristics in ``textstats`` (sequence packing and token budgeting want the
tokenizer the training run will actually use).

Scale architecture — the classic word-frequency factorization:

- **The corpus is touched exactly once per call.** Training's only
  corpus-scale job is tokenize → explode → word-count; every merge round
  after that operates on the WORD relation (distinct words × symbol
  arrays), which is vocab-sized. Encoding's corpus-scale work is two
  joins; the per-word BPE fold runs once per DISTINCT word (vocab-sized
  Arrow batches), never once per occurrence.
- **Two equivalent training drivers.** ``strategy='driver'`` collects the
  word-count relation and runs the textbook greedy loop in Python — right
  whenever distinct words fit on the driver (they do for every realistic
  corpus below ~10⁷ distinct words). ``strategy='distributed'`` keeps the
  word relation in Spark: each round is one pair-count aggregation +
  ``TakeOrdered(1)`` + a column-algebra fold that applies the merge
  left-to-right inside each symbol array (localCheckpoint per round — the
  same iterative-plan-growth hygiene as ``dedup_clusters``). Both produce
  IDENTICAL merge tables (deterministic tie-break: count desc, pair
  lexicographic asc) — pinned by tests — so ``'auto'`` can pick by vocab
  size without changing results.
- **Determinism.** Greedy BPE is order-sensitive; the explicit tie-break
  makes the merge table a pure function of the corpus, so a re-train on
  re-partitioned data cannot fork the tokenizer.

The end-of-word marker ``</w>`` is appended as a separate final symbol
(classic Sennrich-style), so detokenization boundaries survive merging.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator
from dataclasses import dataclass

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_parallelism
from .dedup import _INTERMEDIATE_CACHES
from .textstats import tokenize

END_WORD = "</w>"


@dataclass
class BPEModel:
    merges: list[tuple[str, str]]

    @property
    def ranks(self) -> dict[tuple[str, str], int]:
        return {pair: i for i, pair in enumerate(self.merges)}


def _word_symbols(word: str) -> list[str]:
    return list(word) + [END_WORD]


def _apply_merge(syms: list[str], a: str, b: str) -> list[str]:
    """One merge type applied left-to-right (the textbook greedy rule)."""
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _train_bpe_py(
    word_counts: dict[str, int], n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """Reference greedy trainer over a word-count dict (the driver path —
    and the ground truth the distributed path must reproduce)."""
    words = {w: _word_symbols(w) for w in word_counts}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            c = word_counts[w]
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # deterministic: count desc, then pair lexicographic asc
        best, cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if cnt < min_pair_count:
            break
        merges.append(best)
        a, b = best
        for w in words:
            words[w] = _apply_merge(words[w], a, b)
    return merges


def encode_word(word: str, model: BPEModel) -> list[str]:
    """Tokenize ONE word with the merge-rank algorithm: repeatedly apply
    the lowest-ranked applicable merge (identical output to replaying the
    training merges in order, the standard equivalence — pinned by test)."""
    ranks = model.ranks
    syms = _word_symbols(word)
    while len(syms) > 1:
        ranked = [ranks[p] for p in zip(syms, syms[1:]) if p in ranks]
        if not ranked:
            break
        a, b = model.merges[min(ranked)]
        syms = _apply_merge(syms, a, b)
    return syms


def _word_counts_df(docs: DataFrame, text_col: str) -> DataFrame:
    narrow = ensure_parallelism(docs.select(F.col(text_col)))
    return (
        narrow.select(F.explode(tokenize(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def train_bpe(
    docs: DataFrame,
    n_merges: int = 200,
    text_col: str = "text",
    min_pair_count: int = 2,
    strategy: str = "auto",
    driver_vocab_limit: int = 1_000_000,
    word_counts: DataFrame | None = None,
) -> BPEModel:
    """Learn ``n_merges`` BPE merges from the corpus (one corpus pass).

    ``word_counts`` lets a caller that ALSO encodes hand in the
    (word, cnt) relation so the corpus-scale tokenize → explode → count
    aggregation runs once for the whole train+encode pipeline (the caller
    owns its persistence and lifetime; it must equal
    ``_word_counts_df(docs, text_col)``, i.e. distinct non-empty
    ``tokenize`` words with occurrence counts)."""
    if strategy not in ("auto", "driver", "distributed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    caller_owned = word_counts is not None
    wc = word_counts if caller_owned else _word_counts_df(docs, text_col)
    if strategy == "auto":
        # persist BEFORE the sizing count, or the corpus-scale word-count
        # aggregation runs twice (limit above a groupBy doesn't
        # short-circuit the scan) — the 'corpus touched once' contract
        if not caller_owned:
            wc = wc.persist()
        strategy = (
            "driver" if wc.limit(driver_vocab_limit + 1).count() <= driver_vocab_limit
            else "distributed"
        )
    try:
        if strategy == "driver":
            counts = {r["word"]: r["cnt"] for r in wc.collect()}
            return BPEModel(_train_bpe_py(counts, n_merges, min_pair_count))
        return BPEModel(_train_bpe_distributed(wc, n_merges, min_pair_count))
    finally:
        if not caller_owned:
            wc.unpersist()


def _train_bpe_distributed(
    wc: DataFrame, n_merges: int, min_pair_count: int
) -> list[tuple[str, str]]:
    """The vocab-relation training loop: per round, one pair-count
    aggregation over the word relation, one TakeOrdered(1) for the winner,
    one fold applying it — never a corpus-scale job after the initial
    word count, and the relation is localCheckpointed per round so the
    iterative plan cannot snowball."""
    words = wc.select(
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_WORD))
        ).alias("syms"),
        F.col("cnt"),
    ).localCheckpoint()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs = (
            words.select(
                F.explode(
                    F.zip_with(
                        F.slice(F.col("syms"), 1, F.size("syms") - 1),
                        F.slice(F.col("syms"), 2, F.size("syms") - 1),
                        lambda a, b: F.struct(a.alias("a"), b.alias("b")),
                    )
                ).alias("p"),
                F.col("cnt"),
            )
            .groupBy("p.a", "p.b")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(F.col("n").desc(), F.col("a"), F.col("b")).take(1)
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        la, lb, lab = F.lit(a), F.lit(b), F.lit(a + b)
        folded = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, x: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == la)
                & (x == lb),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(lab)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
        words = words.select(folded.alias("syms"), "cnt").localCheckpoint()
    return merges


def encode_bpe(
    docs: DataFrame,
    model: BPEModel,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_vocab_bytes: int = 64 << 20,
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Tokenize every document: (id_col, tokens array<string>, n_tokens).

    Corpus-scale plan: tokenize + explode with position, one DISTINCT-word
    relation encoded via an Arrow-batched fold (vocab-sized work), then a
    join back and an ordered per-doc reassembly. Word order is restored by
    the token position, never by shuffle luck.

    **Size-gated join strategy.** For natural text the distinct-word
    relation is vocab-sized and the positions⋈vocab join should broadcast.
    But on a web corpus "distinct words" includes URLs, hex blobs, and
    typos — 10⁸–10⁹ rows × token arrays — and an unconditional
    ``F.broadcast`` hint is a mandatory driver/executor OOM (AQE cannot
    bail out of an explicit hint). So the vocab relation is persisted and
    its broadcast size estimated with one closed-form vocab-sized aggregate
    in UTF-8 BYTES (``octet_length``, not codepoints — a CJK vocab is ~3×
    its character count; the encoded tokens are a partition of the word's
    characters plus the ``</w>`` marker, so their bytes are bounded by the
    word's own), and the hint applied only under ``broadcast_vocab_bytes``;
    over budget the plan falls back to a plain shuffle join on ``word``
    where AQE's skew handling splits the hot-word partitions (``"the"`` is
    exactly the skew shape AQE targets). The estimate never runs the
    Arrow-batched fold — that executes inside the decorate join, once per
    action over the cached word list (the returned DataFrame is lazy, as
    in every operator here; callers that materialize repeatedly persist
    the RESULT, not this internal).

    **Cache contract:** the persisted vocab registers in the shared
    intermediate-cache registry; callers that loop (bench passes, services
    encoding many corpora) drain it with
    :func:`~.dedup.release_intermediate_caches` AFTER materializing the
    returned DataFrame — same lifetime rule as the dedup operators'
    inverted-index caches.
    """
    ranks = model.ranks
    merge_list = model.merges

    def one_factory():
        # replay-in-order encoding (equivalent to rank-based, cheaper here
        # since the full table is at hand) — ONE definition shared by the
        # driver-dict and executor mapInPandas paths, so they cannot fork
        cache: dict[str, list[str]] = {}

        def one(word: str) -> list[str]:
            got = cache.get(word)
            if got is None:
                syms = _word_symbols(word)
                for a, b in merge_list:
                    if len(syms) == 1:
                        break
                    syms = _apply_merge(syms, a, b)
                got = cache[word] = syms
            return got

        return one

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        one = one_factory()
        for pdf in batches:
            yield pd.DataFrame(
                {"word": pdf["word"], "toks": [one(w) for w in pdf["word"]]}
            )

    narrow = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    positions = narrow.select(
        F.col(id_col),
        F.posexplode(F.filter(tokenize(text_col), lambda w: w != "")).alias(
            "pos", "word"
        ),
    )
    if vocab is None:
        vocab = positions.select("word").distinct().persist()
        _INTERMEDIATE_CACHES.append(vocab)
    else:
        # caller-supplied distinct-word relation (e.g. the train pass's
        # word-count aggregation): the corpus-scale tokenize + distinct
        # exchange drops out of this plan entirely; the caller owns the
        # relation's persistence/lifetime and guarantees it equals
        # positions.select("word").distinct()
        vocab = vocab.select("word")
    # one vocab-sized pass over the CACHED word list: UTF-8 bytes of the
    # word + its tokens (tokens partition the word's bytes, + up to 5 B for
    # the </w> marker), ~16 B per array element for offsets/pointers
    # (n_tokens ≤ chars+1), 48 B fixed row overhead — a deliberate upper
    # bound so the gate errs toward shuffling, never toward an OOM
    est_bytes = (
        vocab.select(
            F.sum(
                F.octet_length("word") * 2
                + F.lit(5)
                + (F.length("word") + 1) * 16
                + F.lit(48)
            ).alias("b")
        ).first()["b"]
        or 0
    )
    if est_bytes <= broadcast_vocab_bytes:
        # decide-in-scan regime (r15 optimization round, guide §2.4/§4.2):
        # a vocab under the broadcast budget is by definition collectable —
        # encode it ON THE DRIVER (the same replay fold the executor path
        # runs), broadcast the word→tokens dict, and rebuild every document
        # in ONE Arrow pass over its JVM-tokenized token array. The old
        # broadcast-join plan still paid a posexplode of every occurrence,
        # an occurrence-scale groupBy(doc) shuffle, and a per-doc
        # array_sort; all of that drops out — same tokens, same order (the
        # token array IS the document order), zero exchanges.
        one = one_factory()
        table = {r["word"]: one(r["word"]) for r in vocab.collect()}
        bc = docs.sparkSession.sparkContext.broadcast(table)

        @F.pandas_udf("array<string>")
        def enc_doc(tok_arrs: pd.Series) -> pd.Series:
            t = bc.value
            # t.get-with-skip mirrors the join path's inner-join semantics
            # for a contract-violating vocab (unknown words drop); with the
            # derived-from-docs vocab every word is present
            return tok_arrs.map(
                lambda arr: [
                    p
                    for w in arr
                    for p in (t.get(w) or ())
                ]
            )

        return docs.select(
            F.col(id_col),
            enc_doc(
                F.filter(tokenize(text_col), lambda w: w != "")
            ).alias("tokens"),
        ).withColumn("n_tokens", F.size("tokens"))
    encoded = vocab.mapInPandas(enc, schema="word string, toks array<string>")
    per_doc = (
        positions.join(encoded, "word")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("pos"), F.col("toks")))
                    ),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
        .withColumn("n_tokens", F.size("tokens"))
    )
    base = docs.select(F.col(id_col))
    return base.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("tokens"), F.array().cast("array<string>")).alias(
            "tokens"
        ),
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
    )
