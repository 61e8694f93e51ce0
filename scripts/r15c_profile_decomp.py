"""Decompose doc_profile's fused scan: time cumulative column groups with
the noop sink (guide §1.4), min-of-N alternating-free (single-variant
cumulative ladder — each rung adds one column family)."""

from __future__ import annotations

import os
import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from coin_for_rich_spark.llmdata import textstats as ts
from coin_for_rich_spark.session import get_spark
from coin_for_rich_spark.sources import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(os.environ.get("N_PASSES", "4"))


def timed(df, label):
    best = float("inf")
    for _ in range(N):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"{label:28s} {best:6.3f}s")
    return best


def main():
    spark = get_spark("profile_decomp")
    docs = load_table(spark, SF_DIR, "documents")

    staged = docs.select("doc_id", "text", ts.tokenize("text").alias("__t"))
    toks = F.col("__t")
    staged2 = staged.select(
        "doc_id", "text", toks, ts.match_tokens(toks).alias("__m")
    )
    mtoks = F.col("__m")

    timed(docs.select("doc_id", "text"), "bare scan")
    timed(staged.select("doc_id", F.size(toks).alias("n")), "tokenize+size")
    timed(
        staged2.select("doc_id", F.size(mtoks).alias("n")),
        "match_tokens (edge strip)",
    )
    timed(
        staged2.select(
            "doc_id",
            ts._count_in(mtoks, ts.STOPWORDS).alias("s"),
            *[
                ts._count_in(mtoks, w).alias(f"l_{k}")
                for k, w in ts.LANG_MARKERS.items()
            ],
        ),
        "+lexicon counts",
    )
    timed(
        staged.select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(ts.PUNCT_REGEX), 1)
            ).alias("p"),
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(ts.BPE_REGEX), 1)
            ).alias("b"),
        ),
        "regexp_extract_all x2",
    )
    timed(
        staged.select(
            "doc_id",
            F.size(F.array_distinct(ts.token_ngrams(toks, 3))).alias("d"),
        ),
        "token_ngrams(3) distinct",
    )
    timed(
        staged.select("doc_id", ts._max_multiplicity(toks).alias("m")),
        "max_multiplicity",
    )
    timed(
        staged.select(
            "doc_id",
            F.md5(
                F.concat_ws(" ", F.sort_array(F.array_distinct(toks)))
            ).alias("bag"),
        ),
        "bag fingerprint",
    )
    timed(
        staged.select(
            "doc_id", ts._mean_word_len(toks, F.size(toks)).alias("mw")
        ),
        "mean_word_len",
    )
    timed(ts.doc_profile(docs), "FULL doc_profile")
    spark.stop()


if __name__ == "__main__":
    main()
