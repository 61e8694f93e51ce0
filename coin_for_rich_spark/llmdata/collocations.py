"""PMI collocation mining — corpus-level bigram association.

Pointwise mutual information over adjacent token pairs (Church & Hanks
1990) is the standard collocation score: multi-word expressions for
tokenizer vocabulary induction, stop-phrase lists for boilerplate
detection, and corpus drift monitoring all start from "which bigrams
co-occur far above chance". ``PMI(x,y) = ln((c_xy/T2) /
((c_x/T1)·(c_y/T1)))`` with T1/T2 the total unigram/bigram mass.

Scale shape (100 TB): bigrams build IN-ROW (two shifted array slices
zipped — linear per doc, no quadratic lambda capture), then ONE
corpus-sized hash-agg per relation (unigram counts, bigram counts), both
with map-side combine; the ``min_count`` floor cuts the bigram relation
to the frequent tail BEFORE the two vocabulary-keyed count joins (AQE
broadcasts the unigram side when small, shuffle-joins otherwise); the
global top-m is TakeOrdered (per-partition heaps + one m-row merge),
never a full sort. T1/T2 are two bounded scalar collects.

Determinism: every PMI input is an exact integer count (T1/T2 exact
while < 2^53 as doubles); the score is ONE ln per surviving bigram — no
float summation at all, so no DECIMAL routing is needed — emitted at
round-6 (the ~1e-15 ln-ulp vs 1e-6 grid contract), and the total order
(pmi DESC, w1 ASC, w2 ASC) makes the top-m cut reproducible across
engines even on the exact ties a symmetric corpus produces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textstats import match_tokens, tokenize


def pmi_collocations(
    docs: DataFrame,
    top_m: int = 100,
    min_count: int = 5,
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_m`` adjacent-pair collocations by PMI: ``(w1, w2,
    c_pair, c_w1, c_w2, pmi, rank)``. Pairs below ``min_count``
    occurrences never leave the count stage."""
    if top_m < 1:
        raise ValueError(f"top_m must be >= 1, got {top_m}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")

    terms = docs.select(
        F.filter(
            match_tokens(tokenize(F.col(text_col))), lambda t: t != ""
        ).alias("_terms")
    )

    uni = (
        terms.select(F.explode("_terms").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("c_w"))
    )
    # adjacent pairs from two shifted slices zipped in-row (linear; a
    # sequence+slice lambda would re-evaluate the token expression per
    # index — the quadratic-capture pitfall at textstats.token_ngrams)
    n = F.size("_terms")
    pairs = (
        terms.filter(n >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.slice(F.col("_terms"), 1, n - 1).alias("w1"),
                    F.slice(F.col("_terms"), 2, n - 1).alias("w2"),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("long").alias("c_pair"))
    )

    t1 = uni.agg(F.sum("c_w")).first()[0] or 0
    t2 = pairs.agg(F.sum("c_pair")).first()[0] or 0
    if t2 == 0:
        return (
            pairs.select(
                "w1",
                "w2",
                "c_pair",
                F.lit(None).cast("long").alias("c_w1"),
                F.lit(None).cast("long").alias("c_w2"),
                F.lit(None).cast("double").alias("pmi"),
                F.lit(None).cast("long").alias("rank"),
            )
        )

    frequent = pairs.filter(F.col("c_pair") >= min_count)
    joined = (
        frequent.join(
            uni.select(
                F.col("w").alias("w1"), F.col("c_w").alias("c_w1")
            ),
            "w1",
        ).join(
            uni.select(
                F.col("w").alias("w2"), F.col("c_w").alias("c_w2")
            ),
            "w2",
        )
    )
    # pinned association: (c_pair/T2) / ((c_w1/T1) * (c_w2/T1)) — the
    # oracle mirrors this exactly; a product-form rewrite would change
    # the float rounding path AND overflow integer arithmetic at corpus
    # scale
    pmi = F.round(
        F.log(
            (F.col("c_pair").cast("double") / F.lit(float(t2)))
            / (
                (F.col("c_w1").cast("double") / F.lit(float(t1)))
                * (F.col("c_w2").cast("double") / F.lit(float(t1)))
            )
        ),
        6,
    )
    scored = joined.select(
        "w1", "w2", "c_pair", "c_w1", "c_w2", pmi.alias("pmi")
    )
    order = [F.col("pmi").desc(), F.col("w1").asc(), F.col("w2").asc()]
    top = scored.orderBy(*order).limit(top_m)
    # rank over the ≤ top_m survivors only — one bounded partition
    return top.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order)).cast("long")
    )
