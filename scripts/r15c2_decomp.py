"""Stage decomposition for the remaining heavy bench rows (r15 cont-2):
minhash_pairs (sig / cand / verify), ngram_jaccard (probe / index / fold),
bpe_encode isolated, dedup_index_probe legs. Min-of-N, noop sink."""

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
WHICH = set(sys.argv[2:]) or {"minhash", "jaccard", "bpe", "dedupidx"}
N = int(os.environ.get("N_PASSES", "3"))


def t(label, build, reset=True):
    best = float("inf")
    for _ in range(N):
        if reset:
            entry._reset_bench_caches()
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:28s} {best:6.3f}s", flush=True)
    return best


def main():
    spark = get_spark("r15c2_decomp")
    docs = load_table(spark, SF_DIR, "documents")
    docs.count()

    if "minhash" in WHICH:
        from coin_for_rich_spark.llmdata.dedup import (
            minhash_pairs,
            minhash_signatures,
        )

        print("minhash_pairs:", flush=True)
        t("signatures only", lambda: minhash_signatures(docs))
        t("full pairs", lambda: minhash_pairs(docs, threshold=0.2))
        t("full q_minhash (incl exact)", lambda: entry.q_minhash_pairs(spark, SF_DIR))

    if "jaccard" in WHICH:
        from coin_for_rich_spark.llmdata.dedup import ngram_jaccard_pairs

        print("ngram_jaccard:", flush=True)
        t("count plan (no probe)", lambda: ngram_jaccard_pairs(docs, method="count"))
        t("auto (probe + count)", lambda: ngram_jaccard_pairs(docs, method="auto"))

    if "bpe" in WHICH:
        print("bpe_encode:", flush=True)
        t("q_bpe_encode", lambda: entry.q_bpe_encode(spark, SF_DIR))

    if "dedupidx" in WHICH:
        print("dedup_index_probe:", flush=True)
        gate = entry._dedup_index_gate(spark, SF_DIR)  # amortized infra
        from coin_for_rich_spark.llmdata.dedup_index import (
            _index_rows,
            incremental_dedup,
            load_index_meta,
        )

        meta = load_index_meta(os.path.join(gate, "index"))
        batch = entry._dedup_probe_batch(docs)

        def legs():
            e, b, s = _index_rows(batch, "text", "doc_id", meta)
            return e.select(F.lit(1)).unionAll(
                b.select(F.lit(1))
            ).unionAll(s.select(F.lit(1)))

        t("batch fingerprint legs", legs)
        t(
            "full incremental_dedup",
            lambda: incremental_dedup(
                batch, os.path.join(gate, "index"), threshold=0.5
            ),
        )

    spark.stop()


if __name__ == "__main__":
    main()
