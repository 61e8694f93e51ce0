"""Perplexity-style quality scoring: a character n-gram language model
trained on a reference (clean) corpus scores every document's cross-
entropy — the CCNet/Gopher-family quality signal that ranks boilerplate,
gibberish, and wrong-language text far from in-domain prose.

Spark-first shape (no external LM tooling):

- **Training is one corpus pass**: explode reference docs into character
  n-grams → one count aggregation. Context counts and the alphabet size
  derive from the n-gram relation itself (a grouped sum over the model
  rows — model-sized, not corpus-sized), so the reference corpus is read
  exactly once.
- **The model is a relation, not a file**: (ngram, logp) with add-alpha
  smoothing ``log((c_ngram + a) / (c_ctx + a·V))``, plus a per-context
  unseen penalty ``log(a / (c_ctx + a·V))`` and the global floor
  ``log(1/V)`` for unseen contexts. Model cardinality is bounded by the
  distinct n-grams of the reference (≤ V^order), independent of corpus
  row count — small enough to BROADCAST, which is exactly what scoring
  relies on.
- **Scoring aggregates before it joins**: docs explode to n-grams, but the
  per-(doc, ngram) count aggregation map-side-combines the bulk away
  before any shuffle; the model and context relations then join broadcast
  and one final per-doc aggregation emits cross-entropy. Nothing in the
  plan is proportional to corpus × model.

Char n-grams use the same shifted-``zip_with`` build as
:func:`~.textstats.token_ngrams` (linear per row — the quadratic
capture-the-expression pitfall documented there applies to characters
exactly as to tokens).
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.partitioning import ensure_parallelism
from .textstats import token_ngrams

# characters are modeled after the same normalization scoring applies, so
# train/score keys always agree. Spaces are remapped to a visible
# placeholder BEFORE n-gramming: token_ngrams joins symbols with " ", so a
# literal space symbol would make the separator ambiguous — contexts like
# (' ', 'x') and (' ', ' ') would collapse to one key and corrupt every
# post-space smoothing denominator.
_SPACE_SYM = "▁"  # ▁ — the sentencepiece convention


def _norm_chars(text_col: str) -> Column:
    chars = F.split(F.lower(F.trim(F.col(text_col))), "")
    return F.transform(
        F.filter(chars, lambda c: c != ""),
        lambda c: F.when(c == " ", F.lit(_SPACE_SYM)).otherwise(c),
    )


def _char_ngrams(text_col: str, order: int) -> Column:
    return token_ngrams(_norm_chars(text_col), order)


def _ctx_of(ngram: Column, order: int) -> Column:
    """The n-gram's context key: its first order-1 space-joined chars."""
    return F.substring_index(ngram, " ", order - 1)


# ---------------------------------------------------------------------------
# Packed-codepoint n-gram encoding (r14): a character n-gram is ONE int64,
# 21 bits per character (every Unicode codepoint < 2^21, and `split('')`
# yields single code units, so char → codepoint is injective). The packing
# is a BIJECTION — not a hash — so the encoded plan is exactly the string
# plan with all per-occurrence string construction/hashing removed; the
# corpus-side explode/aggregate/broadcast-probe path moves fixed-width
# longs instead of allocating ~n_chars short strings per document. Fits
# orders 2 and 3 (3·21 = 63 bits, top char < 2^20.1 keeps it positive);
# order ≥ 4 falls back to the string path.
# ---------------------------------------------------------------------------

_CODE_BITS = 21
_CODE_MASK = (1 << _CODE_BITS) - 1
_ENC_MAX_ORDER = 3


def _norm_codes(text_col: str) -> Column:
    chars = F.split(F.lower(F.trim(F.col(text_col))), "")
    return F.transform(
        F.filter(chars, lambda c: c != ""),
        lambda c: F.when(c == " ", F.lit(ord(_SPACE_SYM)))
        .otherwise(F.ascii(c))
        .cast("long"),
    )


def _code_ngrams(text_col: str, order: int) -> Column:
    """Packed int64 n-grams, same shifted-zip_with build (and the same
    trailing-window null handling) as the string path."""
    codes = _norm_codes(text_col)
    n_tokens = F.size(codes)
    arr = codes
    for j in range(1, order):
        shifted = F.slice(codes, j + 1, F.greatest(n_tokens - j, F.lit(1)))
        arr = F.zip_with(
            arr, shifted, lambda a, b: F.shiftleft(a, _CODE_BITS) + b
        )
    return F.when(
        n_tokens >= order, F.slice(arr, 1, n_tokens - (order - 1))
    ).otherwise(F.array().cast("array<bigint>"))


def _code_ngrams_arrow(text_col: str, order: int) -> Column:
    """Vectorized twin of :func:`_code_ngrams` (r15 optimization round,
    guide §4.2): the per-char split + per-char interpreted transform + the
    zip_with packing ladder were the dominant cost of both the training
    and the scoring corpus pass (~n_chars short-string allocations per
    document inside non-codegen higher-order evaluation). Normalization
    stays in the JVM — ``lower(trim(text))`` — so the engine's exact
    space-only trim and Unicode lower semantics are untouched; the UDF
    only maps the normalized string to codepoints (UTF-32 view — one
    codepoint per element, exactly what ``split('')`` + ``ascii()``
    yield, astral plane included), remaps space to the ▁ placeholder,
    and packs the n-gram windows with three vectorized shifts. Bijective
    identity with the JVM path is pinned in tests (ASCII, CJK, emoji,
    combining marks, empty/whitespace edges)."""
    space = ord(_SPACE_SYM)
    empty = np.empty(0, dtype=np.int64)

    @F.pandas_udf("array<bigint>")
    def pack(texts: pd.Series) -> pd.Series:
        out = []
        for s in texts:
            if not s:
                out.append(empty)
                continue
            a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                np.int64
            )
            a[a == 32] = space
            n = a.shape[0]
            if n < order:
                out.append(empty)
                continue
            p = a[: n - order + 1].copy()
            for j in range(1, order):
                p <<= _CODE_BITS
                p += a[j : n - order + 1 + j]
            out.append(p)
        return pd.Series(out)

    return pack(F.lower(F.trim(F.col(text_col))))


def _code_counts_arrow(narrow: DataFrame, text_col: str, order: int) -> DataFrame:
    """Per-task partial (code, c) counts — the training corpus pass with
    the occurrence stream never leaving Arrow (r15 continuation 2).

    The packed-codepoint pass already crosses the Python boundary to build
    each document's code array; the old plan then shipped EVERY occurrence
    back to the JVM (explode → codegen hash agg). Since the aggregate is a
    plain count, the kernel can do the partial aggregation itself and emit
    one model-sized partial per task — the same map-side-combine posture,
    with the occurrence-scale explode and JVM hash agg replaced by a
    C-loop unique. Counts are exact integers either way; the final
    ``groupBy(code).sum`` reduces |distinct × tasks| rows.

    Memory posture (r16, ADVICE fix): the occurrence stream is reduced
    PER ARROW BATCH (np.unique over one batch's occurrences, then a
    sorted-merge into the model-sized accumulator), so the task's peak
    holds one batch's occurrences plus the distinct-code accumulator —
    NOT the whole task's concatenated occurrence stream, which at ~8
    bytes/char peaked at multiple GB per Python worker on a ~128 MB text
    partition (the 100 TB design point's OOM risk)."""
    space = ord(_SPACE_SYM)

    def count_batches(batches):
        acc_codes = acc_counts = None
        for pdf in batches:
            chunks = []
            for s in pdf["_norm"]:
                if not s:
                    continue
                a = np.frombuffer(s.encode("utf-32-le"), dtype=np.uint32).astype(
                    np.int64
                )
                a[a == 32] = space
                n = a.shape[0]
                if n < order:
                    continue
                p = a[: n - order + 1].copy()
                for j in range(1, order):
                    p <<= _CODE_BITS
                    p += a[j : n - order + 1 + j]
                chunks.append(p)
            if not chunks:
                continue
            codes, counts = np.unique(np.concatenate(chunks), return_counts=True)
            if acc_codes is None:
                acc_codes, acc_counts = codes, counts
            else:
                # merge two (sorted-unique, counts) partials: both inputs
                # are sorted, so one stable argsort of the concatenation +
                # reduceat over the group starts is the exact merged count
                merged = np.concatenate((acc_codes, codes))
                weights = np.concatenate((acc_counts, counts))
                order_ = np.argsort(merged, kind="stable")
                merged = merged[order_]
                weights = weights[order_]
                uniq, starts = np.unique(merged, return_index=True)
                acc_codes = uniq
                acc_counts = np.add.reduceat(weights, starts)
        if acc_codes is not None:
            yield pd.DataFrame({"code": acc_codes, "c": acc_counts})

    partials = narrow.select(
        F.lower(F.trim(F.col(text_col))).alias("_norm")
    ).mapInPandas(count_batches, "code bigint, c bigint")
    return partials.groupBy("code").agg(F.sum("c").alias("c"))


def _decode_udf(n_chars: int):
    """Arrow-vectorized decode of packed codes back to the space-joined
    string form — used ONLY to derive the model-sized string views of the
    CharLM relations (hundreds of rows), never on the corpus path."""
    from pyspark.sql.functions import pandas_udf

    def dec(codes):
        def one(code):
            code = int(code)
            return " ".join(
                chr((code >> (_CODE_BITS * (n_chars - 1 - i))) & _CODE_MASK)
                for i in range(n_chars)
            )

        return codes.map(one)

    return pandas_udf(dec, "string")


@dataclass
class CharLM:
    """A trained character n-gram model: three small relations + scalars.

    ``ngrams``:   (ngram, logp)      — smoothed log-probabilities
    ``contexts``: (ctx, logp_unseen) — per-context unseen-char penalty
    ``vocab_size``, ``order``, ``alpha`` — the smoothing geometry
    """

    ngrams: DataFrame
    contexts: DataFrame
    vocab_size: int
    order: int
    alpha: float
    #: packed-int64-keyed twins of ngrams/contexts (r14) — what scoring
    #: actually probes for orders ≤ 3; None on the string fallback path.
    #: The public string relations above are model-sized DECODED views of
    #: these, so the dataclass contract (and every test that inspects it)
    #: is unchanged.
    ngrams_enc: DataFrame | None = None
    contexts_enc: DataFrame | None = None


def train_char_lm(
    ref_docs: DataFrame,
    text_col: str = "text",
    order: int = 3,
    alpha: float = 0.5,
) -> CharLM:
    """Train the model on a reference corpus (one pass, one aggregation).

    ``alpha`` is the add-alpha smoothing mass; ``order`` the n-gram size
    (3 = the classic character trigram model).
    """
    if order < 2:
        raise ValueError("char LM order must be >= 2")
    if alpha <= 0:
        # alpha = 0 makes logp_unseen = log(0) = NULL, which the scorer
        # silently coalesces to the global 1/V floor — the cross-entropy
        # changes semantics with no error anywhere downstream
        raise ValueError("smoothing alpha must be > 0 (add-alpha mass)")
    narrow = ensure_parallelism(ref_docs.select(F.col(text_col)))
    if order <= _ENC_MAX_ORDER:
        # packed-codepoint path (r14): the corpus pass explodes and
        # aggregates fixed-width longs — the per-occurrence string
        # construction was the training constant, not the (tiny) shuffle
        # the whole corpus pass stays in Arrow: per-task partial counts,
        # then a model-sized sum (see _code_counts_arrow — exact integers,
        # identical to the explode + JVM count it replaces)
        counts = _code_counts_arrow(narrow, text_col, order).persist()
        # alphabet = distinct final characters across the model rows
        # (model-sized job); contexts likewise derive from the counts
        vocab_size = (
            counts.select((F.col("code").bitwiseAND(F.lit(_CODE_MASK))).alias("ch"))
            .distinct()
            .count()
        )
        v = max(vocab_size, 1)
        ctx = counts.groupBy(
            F.shiftright("code", _CODE_BITS).alias("ctxc")
        ).agg(F.sum("c").alias("c_ctx"))
        denom_off = F.lit(float(alpha * v))
        ngrams_enc = counts.join(
            ctx, F.shiftright("code", _CODE_BITS) == F.col("ctxc")
        ).select(
            "code",
            F.log(
                (F.col("c") + F.lit(alpha)) / (F.col("c_ctx") + denom_off)
            ).alias("logp"),
        )
        contexts_enc = ctx.select(
            "ctxc",
            F.log(F.lit(alpha) / (F.col("c_ctx") + denom_off)).alias("logp_unseen"),
        )
        lm = CharLM(
            # model-sized decoded string views over the persisted encoded
            # relations — same public schema as always
            ngrams=ngrams_enc.select(
                _decode_udf(order)("code").alias("ngram"), "logp"
            ),
            contexts=contexts_enc.select(
                _decode_udf(order - 1)("ctxc").alias("ctx"), "logp_unseen"
            ),
            vocab_size=v,
            order=order,
            alpha=alpha,
            ngrams_enc=ngrams_enc.persist(),
            contexts_enc=contexts_enc.persist(),
        )
        # materialize BOTH model caches in ONE job before releasing the raw
        # counts (one scheduler round-trip instead of two — the union's
        # subtrees are the two persisted plans, so executing it fills both
        # caches; r15 optimization round)
        lm.ngrams_enc.select(F.lit(1).alias("_x")).unionAll(
            lm.contexts_enc.select(F.lit(1).alias("_x"))
        ).count()
        counts.unpersist()
        return lm
    counts = (
        narrow.select(F.explode(_char_ngrams(text_col, order)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    # alphabet = distinct final characters across the model rows (model-
    # sized job); contexts likewise derive from the counts, not the corpus
    vocab_size = (
        counts.select(F.substring_index("ngram", " ", -1).alias("ch"))
        .distinct()
        .count()
    )
    v = max(vocab_size, 1)
    ctx = counts.groupBy(_ctx_of(F.col("ngram"), order).alias("ctx")).agg(
        F.sum("c").alias("c_ctx")
    )
    denom_off = F.lit(float(alpha * v))
    ngrams = (
        counts.join(ctx, _ctx_of(F.col("ngram"), order) == F.col("ctx"))
        .select(
            "ngram",
            F.log((F.col("c") + F.lit(alpha)) / (F.col("c_ctx") + denom_off)).alias(
                "logp"
            ),
        )
    )
    contexts = ctx.select(
        "ctx",
        F.log(F.lit(alpha) / (F.col("c_ctx") + denom_off)).alias("logp_unseen"),
    )
    lm = CharLM(
        ngrams=ngrams.persist(),
        contexts=contexts.persist(),
        vocab_size=v,
        order=order,
        alpha=alpha,
    )
    lm.ngrams.count()  # materialize before releasing the raw counts
    lm.contexts.count()
    counts.unpersist()
    return lm


def release_char_lm(lm: CharLM) -> None:
    """Unpersist the model relations (pair with train_char_lm)."""
    for df in (lm.ngrams, lm.contexts, lm.ngrams_enc, lm.contexts_enc):
        if df is None:
            continue
        try:
            df.unpersist()
        except Exception:  # noqa: BLE001 — best-effort cache drop
            pass


#: Driver-model budget for the scorer fast path: max rows collected across
#: the (code, logp) + (ctxc, logp_unseen) relations. 2M rows ≈ 50 MB of
#: (int64, Decimal) pairs — the same bounded-collect posture as
#: train_bpe.driver_vocab_limit and dedup_clusters' auto tier. A reference
#: alphabet big enough to blow this (≳2M distinct trigrams) falls back to
#: the broadcast-join relational plan unchanged.
_SCORE_DRIVER_MODEL_LIMIT = 2_000_000


def _collect_model_scaled(lm: CharLM, limit: int):
    """Collect the packed-code model as {code: scaled_logp} dicts, where
    scaled values are the EXACT integers ``cast(logp as decimal(38,18)) ×
    10^18`` — computed by the JVM itself (model-sized projection over the
    persisted relations), so the fast path sums the very same decimals the
    relational plan sums and no double→decimal cast is ever re-implemented
    in Python. Returns None when either relation exceeds ``limit``."""
    floor = -math.log(lm.vocab_size) if lm.vocab_size > 1 else 0.0
    # the floor's JVM decimal cast rides the model collect (every row
    # carries it; we read one) instead of costing its own driver job
    ng = lm.ngrams_enc.select(
        "code",
        F.col("logp").cast("decimal(38,18)").alias("d"),
        F.lit(floor).cast("decimal(38,18)").alias("f"),
    ).take(limit + 1)
    if len(ng) > limit:
        return None
    cx = lm.contexts_enc.select(
        "ctxc", F.col("logp_unseen").cast("decimal(38,18)").alias("d")
    ).take(limit + 1)
    if len(cx) > limit:
        return None
    import decimal as _dec

    # explicit wide context: scaleb under the default 28-digit context
    # would round a full-precision decimal(38,18); logp values carry ~20
    # significant digits so this is belt-and-braces, not a live bug
    c = _dec.Context(prec=60)
    ng_map = {int(r["code"]): int(r["d"].scaleb(18, c)) for r in ng}
    cx_map = {int(r["ctxc"]): int(r["d"].scaleb(18, c)) for r in cx}
    floor_scaled = int(ng[0]["f"].scaleb(18, c)) if ng else None
    return ng_map, cx_map, floor_scaled


def _score_driver_model(
    docs: DataFrame,
    lm: CharLM,
    ng_map: dict,
    cx_map: dict,
    floor_scaled: int,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """One-Arrow-pass scorer over a driver-collected model (guide §4.2 +
    §8: decide with the broadcast proxy, never shuffle occurrences). Per
    document: pack code n-grams exactly as :func:`_code_ngrams_arrow`
    (normalization stays in the JVM), look each occurrence up in the model
    / context / floor ladder, and sum the pre-scaled EXACT decimal
    integers with Python int arithmetic — bit-identical to the relational
    plan's decimal(38,18) sum (decimal addition is order-free and the
    scaled values are the JVM's own cast output). The double division and
    exp stay outside: cross_entropy = −(sum→double)/n with float() being
    the same correctly-rounded decimal→double conversion as Decimal.toDouble,
    and perplexity = JVM exp over that double."""
    import decimal as _dec

    order = lm.order
    space = ord(_SPACE_SYM)
    # sorted model arrays for vectorized lookup; scaled values stay Python
    # ints (|logp|·10^18 can exceed int64)
    ng_codes = np.sort(np.fromiter(ng_map.keys(), dtype=np.int64, count=len(ng_map)))
    ng_scaled = [ng_map[int(c)] for c in ng_codes]
    cx_codes = np.sort(np.fromiter(cx_map.keys(), dtype=np.int64, count=len(cx_map)))
    cx_scaled = [cx_map[int(c)] for c in cx_codes]
    id_type = docs.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, n_ngrams bigint, cross_entropy double"

    def score_batches(batches):
        ctx = _dec.Context(prec=60)
        for pdf in batches:
            ids = pdf[id_col]
            n_out = np.zeros(len(pdf), dtype=np.int64)
            ce_out: list = [None] * len(pdf)
            for i, s in enumerate(pdf["_norm"]):
                if not s:
                    continue
                a = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.int64)
                a[a == 32] = space
                n = a.shape[0]
                if n < order:
                    continue
                p = a[: n - order + 1].copy()
                for j in range(1, order):
                    p <<= _CODE_BITS
                    p += a[j : n - order + 1 + j]
                # model / context / floor ladder, vectorized
                total = 0
                k = np.searchsorted(ng_codes, p)
                k[k == len(ng_codes)] = max(len(ng_codes) - 1, 0)
                hit = (
                    ng_codes[k] == p if len(ng_codes) else np.zeros(len(p), bool)
                )
                hk, hc = np.unique(k[hit], return_counts=True)
                for kk, cc in zip(hk, hc):
                    total += ng_scaled[kk] * int(cc)
                miss = p[~hit] >> _CODE_BITS
                if miss.size:
                    m = np.searchsorted(cx_codes, miss)
                    m[m == len(cx_codes)] = max(len(cx_codes) - 1, 0)
                    chit = (
                        cx_codes[m] == miss
                        if len(cx_codes)
                        else np.zeros(len(miss), bool)
                    )
                    mk, mc = np.unique(m[chit], return_counts=True)
                    for kk, cc in zip(mk, mc):
                        total += cx_scaled[kk] * int(cc)
                    total += floor_scaled * int((~chit).sum())
                n_ng = len(p)
                n_out[i] = n_ng
                # −(decimal sum → double) / n: float(Decimal) is the same
                # correctly-rounded conversion as BigDecimal.doubleValue
                ce_out[i] = -float(
                    ctx.create_decimal(total).scaleb(-18, ctx)
                ) / float(n_ng)
            yield pd.DataFrame(
                {id_col: ids, "n_ngrams": n_out, "cross_entropy": ce_out}
            )

    scored = docs.select(
        F.col(id_col), F.lower(F.trim(F.col(text_col))).alias("_norm")
    ).mapInPandas(score_batches, out_schema)
    return scored.select(
        id_col,
        "n_ngrams",
        "cross_entropy",
        F.exp("cross_entropy").alias("perplexity"),
    )


def score_char_lm(
    docs: DataFrame,
    lm: CharLM,
    text_col: str = "text",
    id_col: str = "doc_id",
    driver_model_limit: int | None = _SCORE_DRIVER_MODEL_LIMIT,
) -> DataFrame:
    """Cross-entropy of every document under the model.

    Returns (id_col, n_ngrams, cross_entropy, perplexity): cross_entropy =
    −mean log p per character n-gram (nats), perplexity = exp of it. Docs
    too short to contain one n-gram score NULL (no evidence either way —
    callers decide their fate explicitly; length filters are a different
    operator).

    ``driver_model_limit`` — when the packed model fits under this row
    budget it is collected once and every document scores in ONE Arrow
    pass (no occurrence explode, no broadcast joins, no doc-keyed
    exchange); past the budget — or with ``None`` — the broadcast-join
    relational plan below runs unchanged. Results are bit-identical: the
    fast path sums the JVM's own decimal(38,18) casts of the same logp
    doubles (see :func:`_score_driver_model`)."""
    narrow = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    if lm.ngrams_enc is not None and driver_model_limit is not None:
        model = _collect_model_scaled(lm, driver_model_limit)
        if model is not None:
            ng_map, cx_map, floor_scaled = model
            if floor_scaled is None:
                # empty model (empty reference corpus): the floor literal
                # could not ride the collect — one 1-row job derives it
                if lm.vocab_size > 1:
                    import decimal as _dec

                    fd = (
                        lm.ngrams_enc.sparkSession.range(1)
                        .select(
                            F.lit(-math.log(lm.vocab_size))
                            .cast("decimal(38,18)")
                            .alias("d")
                        )
                        .first()["d"]
                    )
                    floor_scaled = int(fd.scaleb(18, _dec.Context(prec=60)))
                else:
                    floor_scaled = 0
            return _score_driver_model(
                narrow, lm, ng_map, cx_map, floor_scaled, text_col, id_col
            )
    # PER-OCCURRENCE probe, no (doc, ngram) pre-aggregate (r13 VERDICT ask
    # #5): the model and context relations are bounded (≈ alphabet^order
    # rows) and broadcast, so every occurrence row probes two broadcast
    # hash maps PIPELINED inside the scan stage — zero corpus-sized
    # exchanges. The old plan's groupBy(doc, ngram) + regroup-by-doc cost
    # two shuffles each carrying ~distinct-(doc,trigram) rows; now the
    # only exchange is the final doc-keyed aggregate, whose map-side
    # partial combine shrinks it to |docs-per-partition| rows.
    floor = F.lit(-math.log(lm.vocab_size)) if lm.vocab_size > 1 else F.lit(0.0)
    if lm.ngrams_enc is not None:
        # packed-codepoint probe (bijective encoding — identical results
        # to the string path, minus every per-occurrence string)
        occ = narrow.select(
            F.col(id_col),
            F.explode(_code_ngrams_arrow(text_col, lm.order)).alias("code"),
        )
        probe = (
            occ.join(F.broadcast(lm.ngrams_enc), "code", "left")
            .withColumn("ctxc", F.shiftright("code", _CODE_BITS))
            .join(F.broadcast(lm.contexts_enc), "ctxc", "left")
        )
    else:
        occ = narrow.select(
            F.col(id_col),
            F.explode(_char_ngrams(text_col, lm.order)).alias("ngram"),
        )
        probe = (
            occ.join(F.broadcast(lm.ngrams), "ngram", "left")
            .withColumn("ctx", _ctx_of(F.col("ngram"), lm.order))
            .join(F.broadcast(lm.contexts), "ctx", "left")
        )
    scored = (
        probe.withColumn(
            "lp",
            F.coalesce(F.col("logp"), F.col("logp_unseen"), floor),
        )
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_ngrams"),
            # the per-doc sum routes through DECIMAL: a double sum is
            # partial-aggregation-order-dependent, so two runs (or a
            # 1000-executor run vs a single-threaded oracle) would disagree
            # in the last ulps; the decimal(38,18) cast of each lp is an
            # engine-independent function of the double (verified vs
            # DuckDB) and the decimal sum is exact in any order — summing
            # n occurrences of dec(lp) equals n·dec(lp) exactly, so the
            # per-occurrence plan and a per-(doc,ngram) oracle agree
            # bit-for-bit as long as the oracle multiplies the DECIMAL
            # (not the double product) by n
            (
                -F.sum(F.col("lp").cast("decimal(38,18)"))
                .cast("double")
                / F.count(F.lit(1))
            ).alias("cross_entropy"),
        )
        .withColumn("perplexity", F.exp("cross_entropy"))
    )
    base = docs.select(F.col(id_col))
    return base.join(scored, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_ngrams"), F.lit(0)).alias("n_ngrams"),
        "cross_entropy",
        "perplexity",
    )


def quality_filter(
    docs: DataFrame,
    lm: CharLM,
    max_perplexity: float,
    text_col: str = "text",
    id_col: str = "doc_id",
    keep_unscored: bool = False,
) -> DataFrame:
    """Keep documents whose perplexity under the reference model is at most
    ``max_perplexity`` — the curation filter composed from the scorer.
    ``keep_unscored`` decides the fate of too-short (NULL-scored) docs."""
    scores = score_char_lm(docs, lm, text_col, id_col)
    cond = F.col("perplexity") <= max_perplexity
    if keep_unscored:
        cond = cond | F.col("perplexity").isNull()
    keep = scores.filter(cond).select(id_col)
    return docs.join(keep, id_col, "left_semi")
