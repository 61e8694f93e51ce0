"""BPE trainer + tokenizer: textbook-example merges, driver ≡ distributed
training parity, encode parity with the reference fold, plan shape."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from coin_for_rich_spark.llmdata import encode_bpe, encode_word, train_bpe
from coin_for_rich_spark.llmdata.bpe import (
    END_WORD,
    _apply_merge,
    _train_bpe_py,
    _word_symbols,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_textbook_example_merges(spark):
    """The classic Sennrich corpus: low×5, lower×2, newest×6, widest×3 —
    with end-of-word symbols the first merges must assemble 'est</w>'."""
    text = " ".join(["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3)
    docs = _docs(spark, [(0, text)])
    model = train_bpe(docs, n_merges=4, strategy="driver")
    # pair counts: (e,s)=9, (s,t)=9, (t,</w>)=9, … tie-break lexicographic:
    # ('e','s') first, then ('es','t'), then ('est','</w>'), then l-o (7)
    assert model.merges[0] == ("e", "s")
    assert model.merges[1] == ("es", "t")
    assert model.merges[2] == ("est", END_WORD)
    assert model.merges[3] == ("l", "o")
    toks = {r.doc_id: r.tokens for r in encode_bpe(docs, model).collect()}
    # the doc starts with 'low' → lo w </w> under these 4 merges
    assert toks[0][:3] == ["lo", "w", END_WORD]
    assert encode_word("newest", model) == ["n", "e", "w", "est" + END_WORD]
    assert encode_word("low", model) == ["lo", "w", END_WORD]


def test_driver_and_distributed_training_identical(spark):
    text1 = "the cat sat on the mat the cat ran and the dog sat"
    text2 = "a banana and a bandana in the cabana"
    docs = _docs(spark, [(0, text1), (1, text2), (2, text1 + " " + text2)])
    m_driver = train_bpe(docs, n_merges=12, strategy="driver", min_pair_count=2)
    m_dist = train_bpe(docs, n_merges=12, strategy="distributed", min_pair_count=2)
    assert m_driver.merges == m_dist.merges
    assert len(m_driver.merges) > 0


def test_encode_matches_reference_and_rank_equivalence(spark):
    docs = _docs(
        spark,
        [(i, f"repeat repeat repeated repeating token{i % 3} words") for i in range(12)],
    )
    model = train_bpe(docs, n_merges=15, strategy="driver")
    out = {r.doc_id: (r.tokens, r.n_tokens) for r in encode_bpe(docs, model).collect()}
    for i in range(12):
        words = f"repeat repeat repeated repeating token{i % 3} words".split()
        # reference: replay merges in order per word
        expect = []
        for w in words:
            syms = _word_symbols(w)
            for a, b in model.merges:
                syms = _apply_merge(syms, a, b)
            expect.extend(syms)
            # rank-based single-word encoder must agree (the standard
            # equivalence between replay and min-rank application)
            assert encode_word(w, model) == syms
        toks, n = out[i]
        assert toks == expect and n == len(expect)


def test_round_trip_text_reconstruction(spark):
    docs = _docs(spark, [(0, "hello world hello spark")])
    model = train_bpe(docs, n_merges=10, strategy="driver", min_pair_count=1)
    (row,) = encode_bpe(docs, model).collect()
    text = "".join(row.tokens).replace(END_WORD, " ").strip()
    assert text == "hello world hello spark"


def test_empty_and_untrained_edges(spark):
    docs = _docs(spark, [(0, "abc abc"), (1, "")])
    model = train_bpe(docs, n_merges=5, strategy="driver", min_pair_count=1)
    out = {r.doc_id: r for r in encode_bpe(docs, model).collect()}
    assert out[1].tokens == [] and out[1].n_tokens == 0
    # min_pair_count stops training when nothing repeats
    tiny = train_bpe(_docs(spark, [(0, "xyz")]), n_merges=5, strategy="driver")
    assert tiny.merges == []  # every pair occurs once < min_pair_count=2
    with pytest.raises(ValueError, match="strategy"):
        train_bpe(docs, strategy="bogus")


def test_encode_plan_is_broadcast_and_distinct_words_only(spark):
    """Under-budget regime (r15 rewrite): the vocab is driver-encoded and
    broadcast as a dict, and every document rebuilds in ONE Arrow pass —
    the plan must carry NO exchange and no join at all (the old plan's
    posexplode + occurrence-scale groupBy(doc) shuffle are gone)."""
    docs = _docs(spark, [(i, "alpha beta gamma delta " * 5) for i in range(50)])
    model = train_bpe(docs, n_merges=6, strategy="driver", min_pair_count=1)
    out = encode_bpe(docs, model)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" in plan  # the one Arrow rebuild pass
    assert "Exchange" not in plan and "Join" not in plan
    rows = out.collect()
    assert len(rows) == 50 and all(r.n_tokens == rows[0].n_tokens for r in rows)


def test_encode_over_budget_vocab_falls_back_to_shuffle_join(spark):
    """The broadcast hint is size-gated: a vocab over the byte budget must
    NOT be broadcast (at web scale the distinct-'word' relation is
    10⁸–10⁹ rows — an unconditional hint is a mandatory OOM). Over budget
    the plan is a plain shuffle join on word, and results are identical."""
    docs = _docs(spark, [(i, "alpha beta gamma delta " * 5) for i in range(50)])
    model = train_bpe(docs, n_merges=6, strategy="driver", min_pair_count=1)
    small = encode_bpe(docs, model)  # default budget: broadcast regime
    big = encode_bpe(docs, model, broadcast_vocab_bytes=0)  # forced over
    plan = big._jdf.queryExecution().executedPlan().toString()
    # the positions⋈vocab decorate must not be broadcast over budget; the
    # remaining BroadcastHashJoin (if any) is the small base left-join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    got_small = {r.doc_id: r.tokens for r in small.collect()}
    got_big = {r.doc_id: r.tokens for r in big.collect()}
    assert got_small == got_big


def test_gate_oracle_fold_matches_engine_on_adjacent_pair_repeats(spark):
    """ADVICE r8 #1 regression pin: the DuckDB gate oracle's merge fold
    must replay _apply_merge's left-to-right NON-OVERLAPPING scan on words
    with ADJACENT occurrences of the winning pair ('banana' under (a,n) is
    [b,an,an,a,</w>], not [b,an,a,n,a,</w>]). The r8 string-replace fold
    consumed the shared separator and silently skipped the second
    occurrence — green only because the fixture corpus lacked such words.
    Runs the full gate path (engine query + _bpe_oracle_sql re-train) on a
    corpus built to make (a,n) an early winning merge, and also pins the
    \\x1f-as-whitespace guard on both sides (ADVICE r8 #4)."""
    import duckdb

    import __spark_entry__ as entry_mod

    rows = [
        (0, "banana banana bandana sorcerer"),
        (1, "an analyst ran bananas through\x1fthe scanner"),
        (2, "lll lll llama pineapple banana"),
        (3, ""),
    ]
    docs = _docs(spark, rows)
    model = train_bpe(
        docs.withColumn("text", F.regexp_replace("text", "\x1f", " ")),
        n_merges=entry_mod._BPE_GATE_MERGES,
        min_pair_count=entry_mod._BPE_GATE_MIN_PAIR,
    )
    # the corpus must actually exercise the adjacent-repeat path: some
    # learned merge (a, b) must occur twice ADJACENTLY inside some word
    def has_adjacent(word):
        syms = _word_symbols(word)
        for a, b in model.merges:
            n = 0
            i = 0
            while i < len(syms) - 1:
                if (syms[i], syms[i + 1]) == (a, b):
                    n += 1
                    i += 2
                else:
                    n = 0
                    i += 1
                if n >= 2:
                    return True
            syms = _apply_merge(syms, a, b)
        return False

    words = set()
    for _, t in rows:
        words.update(t.replace("\x1f", " ").split())
    assert any(has_adjacent(w) for w in words), "fixture lost its teeth"

    import pandas as pd

    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
    )
    oracle = con.execute(
        entry_mod._bpe_oracle_sql(
            entry_mod._BPE_GATE_MERGES, entry_mod._BPE_GATE_MIN_PAIR
        )
    ).df()
    # run the engine gate body directly on the in-memory docs
    tmp = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    cleaned = tmp.withColumn("text", F.regexp_replace("text", "\x1f", " "))
    enc = encode_bpe(cleaned, model)
    eng = (
        enc.select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.md5(F.array_join("tokens", "\x1f")).alias("toks_md5"),
        )
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    oracle = oracle.sort_values("doc_id").reset_index(drop=True)
    assert list(eng["n_tokens"]) == list(oracle["n_tokens"])
    assert list(eng["toks_md5"]) == list(oracle["toks_md5"])
