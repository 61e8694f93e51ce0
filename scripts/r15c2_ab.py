"""Alternating same-session A/Bs for the r15 continuation-2 changes:

  quality  — driver-model scorer fast path vs the broadcast-join plan
  curation — complement-filter training split vs the left_anti join

plus decompositions of minhash_pairs (sig/cand/verify) when asked.
Min-of-N alternating passes, noop sink (guide §1.4)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from pyspark.sql import functions as F
from coin_for_rich_spark.session import get_spark
from coin_for_rich_spark.sources import load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WHICH = set(sys.argv[2:]) or {"quality", "curation"}
N = int(os.environ.get("N_PASSES", "4"))


def run(df):
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(name, build_a, build_b, spark):
    a = b = float("inf")
    for _ in range(N):
        entry._reset_bench_caches()
        a = min(a, run(build_a()))
        entry._reset_bench_caches()
        b = min(b, run(build_b()))
    print(
        f"{name:18s} A(old)={a:6.3f}s  B(new)={b:6.3f}s  "
        f"delta={100 * (b - a) / a:+5.1f}%",
        flush=True,
    )


def main():
    spark = get_spark("r15c2_ab")
    for t in ("documents",):
        load_table(spark, SF_DIR, t).count()

    if "quality" in WHICH:
        from coin_for_rich_spark.llmdata.quality import (
            release_char_lm,
            score_char_lm,
            train_char_lm,
        )

        def q_variant(limit):
            docs = load_table(spark, SF_DIR, "documents")
            ref = docs.filter(F.col("doc_id") % 4 == 1)
            lm = train_char_lm(ref, order=3, alpha=0.1)
            out = score_char_lm(docs, lm, driver_model_limit=limit).select(
                "doc_id", "n_ngrams", F.round("cross_entropy", 6).alias("ce6")
            ).orderBy("doc_id")
            return out, lm

        def a_old():
            out, lm = q_variant(None)
            return out

        def b_new():
            out, lm = q_variant(2_000_000)
            return out

        ab("quality_score", a_old, b_new, spark)
        # identity check: collect both, compare exactly
        oa, la = q_variant(None)
        ob, lb = q_variant(2_000_000)
        ra = oa.collect()
        rb = ob.collect()
        assert len(ra) == len(rb)
        for x, y in zip(ra, rb):
            assert x == y, (x, y)
        print(f"quality identity OK over {len(ra)} rows", flush=True)
        release_char_lm(la)
        release_char_lm(lb)

    if "curation" in WHICH:
        from coin_for_rich_spark.llmdata import (
            cross_corpus_contamination,
            doc_profile,
            exact_dedup,
            hash_sample,
        )

        def curation(anti: bool):
            docs = load_table(spark, SF_DIR, "documents")
            profile = doc_profile(docs).select(
                "doc_id", "n_tokens", "quality_bucket", "pred_lang"
            )
            keep_ids = exact_dedup(docs).select(F.col("keep_id").alias("doc_id"))
            evalset = hash_sample(docs)
            if anti:
                train = docs.join(
                    evalset.select("doc_id"), "doc_id", "left_anti"
                )
            else:
                cond = F.substring(
                    F.md5(F.col("doc_id").cast("string")), 1, 1
                ).isin("0")
                train = docs.filter(~F.coalesce(cond, F.lit(False)))
            contaminated = (
                cross_corpus_contamination(
                    train, evalset, min_overlap=5, broadcast_eval=False
                )
                .filter(F.col("exact_dup") | (F.col("n_shared_shingles") >= 5))
                .select(F.col("train_id").alias("doc_id"))
                .distinct()
                .withColumn("_contam", F.lit(True))
            )
            kept = (
                profile.join(keep_ids, "doc_id", "left_semi")
                .filter(F.col("quality_bucket") != "too_short")
                .join(contaminated, "doc_id", "left")
            )
            return (
                kept.groupBy("pred_lang", "quality_bucket")
                .agg(
                    F.count(F.lit(1)).alias("n_docs"),
                    F.sum("n_tokens").alias("total_tokens"),
                    F.count(F.col("_contam")).alias("n_contaminated"),
                )
                .orderBy("pred_lang", "quality_bucket")
            )

        ab("corpus_curation", lambda: curation(True), lambda: curation(False), spark)
        ra = curation(True).collect()
        rb = curation(False).collect()
        assert ra == rb, "curation identity FAILED"
        print(f"curation identity OK over {len(ra)} rows", flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
