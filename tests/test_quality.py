"""Char n-gram LM quality scoring: hand-computed smoothing, in-domain vs
gibberish separation, broadcast plan shape, filter composition."""

from __future__ import annotations

import math

import pytest

from pyspark.sql import functions as F

from coin_for_rich_spark.llmdata import (
    quality_filter,
    release_char_lm,
    score_char_lm,
    train_char_lm,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_code_ngrams_arrow_matches_jvm_path(spark):
    """The r15 vectorized packer must be the JVM zip_with ladder's
    bijective twin on every character class the gates exercise: ASCII,
    accents, CJK, astral-plane emoji, combining marks after İ-lowering,
    NBSP (NOT trimmed — trim is space-only), tabs/newlines inside text,
    and the empty/too-short edges."""
    from coin_for_rich_spark.llmdata.quality import (
        _code_ngrams,
        _code_ngrams_arrow,
    )

    rows = [
        (0, "abc abc xyz"),
        (1, ""),
        (2, "   "),
        (3, "ab"),
        (4, "héllo wörld"),
        (5, "日本語 テスト 123"),
        (6, "emoji 😀🚀 end"),
        (7, "ıİßÅ ẞ mixed"),
        (8, "a\xa0b nbsp"),
        (9, "\t leading tab\nnewline "),
        (10, None),
    ]
    docs = _docs(spark, rows)
    for order in (2, 3):
        got = {
            r.doc_id: list(r.a)
            for r in docs.select(
                "doc_id", _code_ngrams_arrow("text", order).alias("a")
            ).collect()
        }
        want = {
            r.doc_id: list(r.j)
            for r in docs.select(
                "doc_id", _code_ngrams("text", order).alias("j")
            ).collect()
        }
        assert got == want


def test_smoothed_probabilities_hand_computed(spark):
    """Train on 'abab': trigrams {'a b a':1, 'b a b':1}, alphabet {a, b}
    (final chars), contexts {'a b':1, 'b a':1}. With alpha=0.5, V=2:
    p(seen) = (1+0.5)/(1+1) = 0.75; unseen char in seen ctx: 0.25;
    unseen ctx floor: 1/V = 0.5."""
    lm = train_char_lm(_docs(spark, [(0, "abab")]), order=3, alpha=0.5)
    try:
        assert lm.vocab_size == 2
        model = {r.ngram: r.logp for r in lm.ngrams.collect()}
        assert set(model) == {"a b a", "b a b"}
        for lp in model.values():
            assert lp == pytest.approx(math.log(0.75))
        ctxs = {r.ctx: r.logp_unseen for r in lm.contexts.collect()}
        assert ctxs["a b"] == pytest.approx(math.log(0.25))

        # scoring 'aba' = one seen trigram → H = -log 0.75
        out = {r.doc_id: r for r in score_char_lm(
            _docs(spark, [(1, "aba"), (2, "abb"), (3, "zzz"), (4, "a")]), lm
        ).collect()}
        assert out[1].cross_entropy == pytest.approx(-math.log(0.75))
        # 'abb': trigram 'a b b' unseen, ctx 'a b' seen → -log 0.25
        assert out[2].cross_entropy == pytest.approx(-math.log(0.25))
        # 'zzz': unseen ctx → global floor log V
        assert out[3].cross_entropy == pytest.approx(math.log(2))
        # too short: NULL score, zero ngrams
        assert out[4].cross_entropy is None and out[4].n_ngrams == 0
    finally:
        release_char_lm(lm)


def test_in_domain_scores_below_gibberish(spark):
    def prose(seed):
        words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy",
                 "dogs", "and", "runs", "far", "away", "home", "again"]
        return " ".join(words[(seed * 7 + i) % len(words)] for i in range(40))

    def gibberish(seed):
        return " ".join(
            "".join(chr(ord("a") + (seed * 13 + i * 11 + j * 5) % 26) for j in range(6))
            for i in range(40)
        )

    ref = _docs(spark, [(i, prose(i)) for i in range(30)])
    lm = train_char_lm(ref, order=3)
    try:
        scored = {
            r.doc_id: r.perplexity
            for r in score_char_lm(
                _docs(
                    spark,
                    [(100 + i, prose(50 + i)) for i in range(5)]
                    + [(200 + i, gibberish(i)) for i in range(5)],
                ),
                lm,
            ).collect()
        }
        prose_max = max(v for k, v in scored.items() if k < 200)
        gib_min = min(v for k, v in scored.items() if k >= 200)
        assert prose_max < gib_min  # clean separation, not just on average
    finally:
        release_char_lm(lm)


def test_model_joins_are_broadcast_and_deterministic(spark):
    # driver_model_limit=None pins the RELATIONAL plan (the over-budget
    # fallback); the default fast path's shape is pinned separately below
    ref = _docs(spark, [(i, f"sample text number {i} with words") for i in range(10)])
    lm = train_char_lm(ref)
    try:
        batch = _docs(spark, [(i, f"text {i} words sample") for i in range(20)])
        out = score_char_lm(batch, lm, driver_model_limit=None)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2  # ngram + context legs
        assert sorted(out.collect()) == sorted(out.collect())
    finally:
        release_char_lm(lm)


def test_driver_model_fast_path_matches_relational_bit_exact(spark):
    """The r15 driver-model scorer must equal the broadcast-join plan
    BIT-FOR-BIT (cross_entropy/perplexity doubles compared with ==, not
    approx) on a corpus that exercises every ladder rung: seen trigrams,
    unseen trigram in a seen context, unseen context (global floor),
    too-short docs, NULL text, unicode/astral chars, and repeats of the
    same trigram (the n·dec(lp) = Σ dec(lp) exactness claim)."""
    ref = _docs(
        spark,
        [(i, t) for i, t in enumerate(
            ["abab abab", "the quick brown fox", "héllo wörld 😀",
             "日本語 テスト", "spaces   collapse not", "abc " * 20]
        )],
    )
    lm = train_char_lm(ref, order=3, alpha=0.5)
    try:
        batch = _docs(
            spark,
            [
                (1, "aba"), (2, "abb"), (3, "zzz qqq vvv"), (4, "a"),
                (5, ""), (6, None), (7, "the quick brown fox " * 10),
                (8, "héllo 😀 wörld"), (9, "abababababab"),
                (10, "\t tab\nnewline\xa0nbsp "),
            ],
        )
        fast = score_char_lm(batch, lm).collect()
        slow = score_char_lm(batch, lm, driver_model_limit=None).collect()
        # fast plan: one Arrow pass, no joins, no occurrence explode
        plan = score_char_lm(batch, lm)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan and "Generate" not in plan
        f = {r.doc_id: r for r in fast}
        s = {r.doc_id: r for r in slow}
        assert set(f) == set(s)
        for k in f:
            assert f[k].n_ngrams == s[k].n_ngrams
            assert f[k].cross_entropy == s[k].cross_entropy  # bit-exact
            assert f[k].perplexity == s[k].perplexity
    finally:
        release_char_lm(lm)


def test_driver_model_budget_falls_back_to_relational(spark):
    ref = _docs(spark, [(0, "abcdef abcdef")])
    lm = train_char_lm(ref)
    try:
        batch = _docs(spark, [(1, "abcdef"), (2, "zz")])
        out = score_char_lm(batch, lm, driver_model_limit=0)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("BroadcastHashJoin") >= 2  # over budget → joins
        got = {r.doc_id: r.cross_entropy for r in out.collect()}
        want = {r.doc_id: r.cross_entropy for r in score_char_lm(batch, lm).collect()}
        assert got == want
    finally:
        release_char_lm(lm)


def test_quality_filter_composes(spark):
    ref = _docs(spark, [(i, "all good clean text here really " * 3) for i in range(5)])
    lm = train_char_lm(ref)
    try:
        docs = _docs(
            spark,
            [
                (1, "all good clean text here really"),
                (2, "qxzwv jkqpf zzyyx wvvqq"),
                (3, "a"),  # too short to score
            ],
        )
        scored = {r.doc_id: r.perplexity for r in score_char_lm(docs, lm).collect()}
        cut = (scored[1] + scored[2]) / 2
        kept = sorted(r.doc_id for r in quality_filter(docs, lm, cut).collect())
        assert kept == [1]
        kept2 = sorted(
            r.doc_id
            for r in quality_filter(docs, lm, cut, keep_unscored=True).collect()
        )
        assert kept2 == [1, 3]
    finally:
        release_char_lm(lm)


def test_order_validation(spark):
    with pytest.raises(ValueError, match="order"):
        train_char_lm(_docs(spark, [(0, "abc")]), order=1)


def test_space_contexts_stay_distinct(spark):
    """Spaces are remapped to the ▁ placeholder before n-gramming, so
    contexts that differ only in where the space sits cannot collapse
    into one smoothing denominator (the separator-ambiguity hazard)."""
    from coin_for_rich_spark.llmdata import train_char_lm

    lm = train_char_lm(_docs(spark, [(0, "ab a  b")]), order=3)
    try:
        ctxs = {r.ctx for r in lm.contexts.collect()}
        # contexts containing the space symbol are distinct keys, and no
        # raw-space or empty-string symbols leak into the alphabet
        assert any("▁" in c for c in ctxs)
        ngrams = [r.ngram for r in lm.ngrams.collect()]
        assert all(" " in g for g in ngrams)  # separator only
        assert all("  " not in g.replace(" ", "", 1) or True for g in ngrams)
        syms = {s for g in ngrams for s in g.split(" ")}
        assert "" not in syms and " " not in syms
    finally:
        from coin_for_rich_spark.llmdata import release_char_lm

        release_char_lm(lm)


def test_code_counts_per_batch_merge_is_exact(spark):
    """The training counts kernel reduces PER Arrow batch and merges the
    sorted partials (r16 memory fix — the old form concatenated the whole
    task's occurrence stream before one np.unique). With a 2-row Arrow
    batch size the merge path runs many times per task; the counts must
    equal the JVM explode+count of the same packed n-grams exactly."""
    from coin_for_rich_spark.functions.partitioning import scoped_conf
    from coin_for_rich_spark.llmdata.quality import (
        _code_counts_arrow,
        _code_ngrams,
    )

    rows = [
        (i, t)
        for i, t in enumerate(
            [
                "the cat sat on the mat",
                "el perro y el gato",
                "ein Haus aus Holz",
                "naïve café déjà vu",
                "漢字 かな मिश्रित 文",
                "aaa bbb aaa bbb aaa",
                "",
                None,
                "ab",  # shorter than order
                "🚀🌕 astral 🚀🌕 repeat",
            ]
        )
    ] * 5
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    jvm = {
        (r["code"], r["c"])
        for r in docs.select(
            F.explode(_code_ngrams("text", 3)).alias("code")
        )
        .groupBy("code")
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    with scoped_conf(
        spark, **{"spark.sql.execution.arrow.maxRecordsPerBatch": "2"}
    ):
        arrow = {
            (r["code"], r["c"])
            for r in _code_counts_arrow(
                docs.select("doc_id", "text"), "text", 3
            ).collect()
        }
    assert arrow == jvm and len(jvm) > 0
