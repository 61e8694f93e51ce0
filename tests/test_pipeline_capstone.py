"""Capstone: the full crawl→training pipeline, every continuation operator
chained end to end — HTML extraction → URL canonicalization → line-level
boilerplate dedup → quality filter → incremental index dedup → BPE
tokenize → epoch shuffle → span corruption. One flowing test proving the
operators compose on each other's actual outputs, not just in isolation."""

from __future__ import annotations

from pyspark.sql import functions as F

from coin_for_rich_spark.llmdata import (
    build_dedup_index,
    canonicalize_urls,
    encode_bpe,
    epoch_shuffle,
    explode_lines,
    extract_html_text,
    incremental_dedup,
    line_dedup,
    quality_filter,
    release_char_lm,
    span_corruption,
    train_bpe,
    train_char_lm,
)

_BOILER = "<p>Subscribe to our newsletter today</p>"


def _page(i: int, body: str) -> str:
    return (
        f"<html><head><script>track({i});</script></head><body>"
        f"{_BOILER}<p>{body}</p>{_BOILER}</body></html>"
    )


def _prose(seed: int) -> str:
    words = ["the", "model", "reads", "clean", "text", "from", "many",
             "pages", "and", "learns", "with", "great", "care", "daily"]
    return " ".join(words[(seed * 5 + i) % len(words)] for i in range(30))


def _gibberish(seed: int) -> str:
    return " ".join(
        "".join(chr(ord("a") + (seed * 7 + i * 3 + j * 11) % 26) for j in range(7))
        for i in range(30)
    )


def test_crawl_to_training_pipeline(spark, tmp_path):
    crawl = spark.createDataFrame(
        [
            # 0-5: clean prose pages
            *[(i, f"https://www.site{i}.com/a/?utm_source=x", _page(i, _prose(i)))
              for i in range(6)],
            # 6: gibberish page (quality filter's target)
            (6, "https://site6.com/a", _page(6, _gibberish(1))),
            # 7: exact dup of page 2's content at a different URL
            (7, "https://mirror.com/copy", _page(2, _prose(2))),
        ],
        "doc_id long, url string, text string",
    )

    # 1. URL canonicalization: tracking params and www stripped
    urls = canonicalize_urls(crawl)
    assert urls.filter(F.col("canonical_url").contains("utm")).count() == 0
    assert {r.domain for r in urls.collect()} >= {"site0.com", "mirror.com"}

    # 2. HTML → text: script content gone, block structure became lines
    texts = extract_html_text(crawl).withColumnRenamed("extracted_text", "text")
    assert texts.filter(F.col("text").contains("track(")).count() == 0
    assert texts.filter(F.col("n_lines") >= 3).count() == 8

    # 3. line-level boilerplate dedup: the newsletter line (present in all
    # docs) disappears; each doc's own prose line survives
    rebuilt = line_dedup(explode_lines(texts), min_dup_docs=3).withColumnRenamed(
        "clean_text", "text"
    )
    assert rebuilt.filter(F.col("text").contains("newsletter")).count() == 0
    body2 = rebuilt.filter("doc_id = 2").first().text
    assert _prose(2) in body2

    # 4. quality filter: train on the clean pages, cut the gibberish
    lm = train_char_lm(rebuilt.filter("doc_id < 6"))
    try:
        from coin_for_rich_spark.llmdata import score_char_lm

        scores = {r.doc_id: r.perplexity
                  for r in score_char_lm(rebuilt, lm).collect()}
        cut = (max(v for k, v in scores.items() if k != 6) + scores[6]) / 2
        quality = quality_filter(rebuilt, lm, max_perplexity=cut)
        kept = sorted(r.doc_id for r in quality.collect())
        assert 6 not in kept and set(kept) >= {0, 1, 2, 3, 4, 5, 7}
    finally:
        release_char_lm(lm)

    # 5. incremental dedup: index the first five docs, probe the rest —
    # the mirror copy of doc 2 is an exact dup; doc 5's prose is a
    # rotation of the same vocabulary, so the MinHash leg catches it as a
    # NEAR dup of the indexed set — both are dropped by the dedup policy
    idx = str(tmp_path / "idx")
    build_dedup_index(quality.filter("doc_id < 5"), idx)
    probe = {
        r.doc_id: r.status
        for r in incremental_dedup(quality.filter("doc_id >= 5"), idx).collect()
    }
    assert probe[7] == "exact_dup" and probe[5] == "near_dup"
    corpus = quality.filter("doc_id < 5")

    # 6. BPE over the surviving corpus; 7. deterministic epoch order;
    # 8. span corruption on the shuffled stream
    model = train_bpe(corpus, n_merges=20, strategy="driver", min_pair_count=1)
    toks = encode_bpe(corpus, model)
    assert toks.filter(F.col("n_tokens") > 0).count() == 5
    ordered = epoch_shuffle(corpus, n_shards=2, seed=9)
    examples = span_corruption(ordered, density=0.2, span_len=3, seed=9)
    rows = examples.collect()
    assert len(rows) == 5
    for r in rows:
        # every example reassembles to its source text
        spans, cur = {}, None
        for t in r.target_tokens[:-1]:
            if t.startswith("<extra_id_"):
                cur = t
                spans[cur] = []
            else:
                spans[cur].append(t)
        rebuilt_toks = []
        for t in r.input_tokens:
            rebuilt_toks.extend(spans[t] if t.startswith("<extra_id_") else [t])
        src = corpus.filter(F.col("doc_id") == r.doc_id).first().text
        assert rebuilt_toks == src.split()
