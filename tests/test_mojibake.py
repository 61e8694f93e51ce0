"""Mojibake repair (llmdata/web.py fix_mojibake / mojibake_audit):
planted Latin-1-mojibake specimens, the invalid-byte no-touch guard
(Spark 4 decode RAISES on malformed input — the gate is what makes the
operator total), idempotence, and a seeded 300-string fuzz against the
scalar Python reference (encode latin-1 / decode utf-8, unchanged when
either step is impossible — provably the same predicate as the RFC 3629
regex gate)."""

from __future__ import annotations

import random

from coin_for_rich_spark.llmdata.web import mojibake_audit


def _py_fix(s: str) -> str:
    try:
        b = s.encode("latin-1")
    except UnicodeEncodeError:
        return s
    try:
        return b.decode("utf-8")
    except UnicodeDecodeError:
        return s


def _audit(spark, texts):
    df = spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )
    return {
        r["doc_id"]: r for r in mojibake_audit(df).collect()
    }


def test_mojibake_planted_specimens(spark):
    moji = "café".encode("utf-8").decode("latin-1")
    punct = "we’re “quoted”".encode("utf-8").decode("latin-1")
    texts = [
        moji,                 # 0: classic accent mojibake
        "café",               # 1: already-clean accented text, untouched
        punct,                # 2: cp1252-family curly punctuation
        "Ã",                  # 3: lone lead byte — invalid, untouched
        "plain ascii",        # 4: untouched, not flagged
        "",                   # 5: empty
        "mix of ascii and " + moji,  # 6: embedded sequence still gates
    ]
    out = _audit(spark, texts)
    assert out[0]["fixed_text"] == "café" and out[0]["was_mojibake"]
    assert out[0]["n_chars_before"] == 5 and out[0]["n_chars_after"] == 4
    assert out[1]["fixed_text"] == "café" and not out[1]["was_mojibake"]
    assert out[2]["fixed_text"] == "we’re “quoted”"
    assert out[3]["fixed_text"] == "Ã" and not out[3]["was_mojibake"]
    assert not out[4]["was_mojibake"] and not out[5]["was_mojibake"]
    assert out[6]["fixed_text"].endswith("café")


def test_mojibake_repair_is_stable(spark):
    """One repair layer per pass, and a repaired string no longer gates
    — applying the audit to its own output changes nothing."""
    moji = "naïve résumé".encode("utf-8").decode("latin-1")
    once = _audit(spark, [moji])[0]["fixed_text"]
    assert once == "naïve résumé"
    again = _audit(spark, [once])[0]
    assert again["fixed_text"] == once and not again["was_mojibake"]


def test_mojibake_double_encoding_peels_one_layer(spark):
    twice = (
        "é".encode("utf-8").decode("latin-1").encode("utf-8").decode("latin-1")
    )
    once = _audit(spark, [twice])[0]["fixed_text"]
    assert once == "é".encode("utf-8").decode("latin-1")
    assert _audit(spark, [once])[0]["fixed_text"] == "é"


def test_mojibake_fuzz_matches_python_reference(spark):
    """300 seeded random byte strings decoded as Latin-1 (the exact
    input class a mis-decoded crawl produces), plus valid-UTF-8 images
    and their single-byte corruptions: the engine's regex-gated recode
    equals the scalar encode/decode reference on every one — including
    the invalid ones, which MUST pass through unchanged rather than
    raise (the ungated-decode failure mode)."""
    rng = random.Random(0xC0FFEE)
    texts = []
    for _ in range(150):  # raw byte noise, mostly invalid
        n = rng.randint(1, 24)
        texts.append(bytes(rng.randrange(256) for _ in range(n)).decode("latin-1"))
    pool = "héllo wörld ñ 中文 🎉 é"
    for _ in range(100):  # valid utf-8 images — always repairable
        n = rng.randint(1, 12)
        s = "".join(rng.choice(pool) for _ in range(n))
        texts.append(s.encode("utf-8").decode("latin-1"))
    for _ in range(50):  # corrupted images — mostly invalid again
        s = "résumé".encode("utf-8")
        b = bytearray(s)
        b[rng.randrange(len(b))] = rng.randrange(256)
        texts.append(bytes(b).decode("latin-1"))
    out = _audit(spark, texts)
    for i, t in enumerate(texts):
        assert out[i]["fixed_text"] == _py_fix(t), (i, repr(t))
    # the fuzz actually exercised both branches
    flags = [out[i]["was_mojibake"] for i in range(len(texts))]
    assert any(flags) and not all(flags)
