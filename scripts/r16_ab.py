"""Alternating same-session A/Bs for the r15 VERDICT's three contradicted
changes (r16 exonerate-or-revert mandate) plus the global SHJ posture:

  stream    — _STREAM_STATE_PARTITIONS 4 (current) vs 8 (r14), all 6 rows
  minhash   — union+hash-agg stats (current) vs 3-action persisted form (r14)
  spandedup — vectorized polynomial window keys (current) vs concat_ws ladder
  shj       — spark.sql.join.preferSortMergeJoin false (current) vs true

Min-of-N alternating passes, noop sink (guide §1.4). Usage:
    python scripts/r16_ab.py [sf_dir] [subjects...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

import __spark_entry__ as entry
from pyspark.sql import functions as F
from coin_for_rich_spark.session import get_spark
from coin_for_rich_spark.sources import TABLES, load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
WHICH = set(sys.argv[2:]) or {"stream", "minhash", "spandedup", "shj"}
N = int(os.environ.get("N_PASSES", "3"))


def run(build):
    """Time construction + noop write together — the bench's own timed
    region (run_query in bench.py)."""
    t0 = time.perf_counter()
    df = build()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(name, build_a, build_b, n=N):
    """A = current code, B = the r14 form. Alternating, min-of-n."""
    a = b = float("inf")
    rows_a, rows_b = [], []
    for _ in range(n):
        entry._reset_bench_caches()
        t = run(build_a)
        rows_a.append(t)
        a = min(a, t)
        entry._reset_bench_caches()
        t = run(build_b)
        rows_b.append(t)
        b = min(b, t)
    print(
        f"{name:22s} A(current)={a:6.3f}s  B(r14 form)={b:6.3f}s  "
        f"cur-vs-old={100 * (a - b) / b:+5.1f}%  "
        f"[A passes: {' '.join(f'{x:.2f}' for x in rows_a)}]"
        f"[B passes: {' '.join(f'{x:.2f}' for x in rows_b)}]",
        flush=True,
    )
    return a, b


# --------------------------------------------------------------------------
# spandedup: the r14 (pre-8048924) operator — concat_ws ladder window keys.
# Copied from git history; downstream stages identical to the current code.
# --------------------------------------------------------------------------
def repeated_span_dedup_r14(docs, window=20, id_col="doc_id", text_col="text"):
    from coin_for_rich_spark.llmdata.textstats import token_ngrams, tokenize
    from coin_for_rich_spark.functions.partitioning import ensure_parallelism

    w = int(window)
    narrow = ensure_parallelism(docs.select(F.col(id_col), F.col(text_col)))
    base = narrow.select(
        F.col(id_col),
        F.filter(tokenize(text_col), lambda t: t != "").alias("_toks"),
    )
    occ = (
        base.select(
            F.col(id_col),
            F.posexplode(token_ngrams(F.col("_toks"), w)).alias("_pos", "_win"),
        )
        .select(
            F.col(id_col),
            "_pos",
            F.xxhash64("_win").alias("_wh"),
            F.xxhash64(F.lit(0x5EED), "_win").alias("_wh2"),
        )
        .repartition(F.col("_wh"), F.col("_wh2"))
    )
    dup = (
        occ.groupBy("_wh", "_wh2")
        .agg(
            F.count(F.lit(1)).alias("_c"),
            F.min(
                F.struct(F.col(id_col).alias("d"), F.col("_pos").alias("p"))
            ).alias("_w0"),
        )
        .filter(F.col("_c") >= 2)
        .select("_wh", "_wh2", "_w0")
    )
    removals = (
        occ.join(dup, ["_wh", "_wh2"])
        .filter(
            ~(
                (F.col(id_col) == F.col("_w0.d"))
                & (F.col("_pos") == F.col("_w0.p"))
            )
        )
        .groupBy(id_col)
        .agg(F.sort_array(F.collect_list("_pos")).alias("_starts"))
    )
    empty_ranges = F.array().cast("array<struct<s:int,e:int>>")
    last = lambda acc: F.element_at(acc, -1)  # noqa: E731
    merged = F.aggregate(
        F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
        empty_ranges,
        lambda acc, p: F.when(
            (F.size(acc) > 0) & (p <= last(acc)["e"]),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1),
                F.array(
                    F.struct(
                        last(acc)["s"].alias("s"),
                        F.greatest(last(acc)["e"], p + w).alias("e"),
                    )
                ),
            ),
        ).otherwise(
            F.concat(acc, F.array(F.struct(p.alias("s"), (p + w).alias("e"))))
        ),
    )
    joined = base.join(removals, id_col, "left").select(
        F.col(id_col), "_toks", merged.alias("_ranges")
    )
    kept = F.filter(
        F.col("_toks"),
        lambda t, i: ~F.exists(
            F.col("_ranges"), lambda r: (r["s"] <= i) & (i < r["e"])
        ),
    )
    return joined.select(
        F.col(id_col),
        F.array_join(kept, " ").alias("text"),
        F.size("_toks").alias("n_tokens_before"),
        (F.size("_toks") - F.size(kept)).alias("n_tokens_removed"),
        F.size("_ranges").alias("n_spans_removed"),
    )


def q_minhash_pairs_r14(spark, sf_dir):
    """The pre-1df8562 three-action form."""
    from coin_for_rich_spark.llmdata.dedup import minhash_pairs

    docs = load_table(spark, sf_dir, "documents")
    found = (
        minhash_pairs(docs, threshold=0.2).select("doc_a", "doc_b").persist()
    )
    exact = entry._exact_jaccard_pairs(spark, sf_dir).select("doc_a", "doc_b")
    n_exact = exact.count()
    n_hits = exact.join(found, ["doc_a", "doc_b"], "left_semi").count()
    n_extra = found.join(exact, ["doc_a", "doc_b"], "left_anti").count()
    found.unpersist()
    return spark.createDataFrame(
        [(n_exact, n_hits >= 0.8 * n_exact, n_extra == 0)],
        "n_exact_pairs bigint, recall_ok boolean, precision_ok boolean",
    )


def main():
    spark = get_spark("r16_ab")
    for t in TABLES:
        load_table(spark, SF_DIR, t).count()

    if "minhash" in WHICH:
        ab(
            "minhash_pairs",
            lambda: entry.q_minhash_pairs(spark, SF_DIR),
            lambda: q_minhash_pairs_r14(spark, SF_DIR),
            n=max(N, 4),
        )
        ra = entry.q_minhash_pairs(spark, SF_DIR).collect()
        rb = q_minhash_pairs_r14(spark, SF_DIR).collect()
        assert ra == rb, (ra, rb)
        print(f"minhash identity OK: {ra}", flush=True)

    if "spandedup" in WHICH:
        from coin_for_rich_spark.llmdata.dedup import repeated_span_dedup

        def cur():
            docs = load_table(spark, SF_DIR, "documents")
            return repeated_span_dedup(docs, window=20)

        def old():
            docs = load_table(spark, SF_DIR, "documents")
            return repeated_span_dedup_r14(docs, window=20)

        ab("span_dedup", cur, old, n=max(N, 4))
        cols = ["doc_id", "text", "n_tokens_before", "n_tokens_removed",
                "n_spans_removed"]
        ra = sorted(cur().select(cols).collect())
        rb = sorted(old().select(cols).collect())
        assert ra == rb, "span_dedup identity FAILED"
        print(f"span_dedup identity OK over {len(ra)} rows", flush=True)

    if "stream" in WHICH:
        stream_qs = [
            "stream_late_correction",
            "stream_latest_serve",
            "stream_hold_back",
            "stream_rollup_5m",
            "stream_upsert_ingest",
            "stream_rollup_1d",
        ]
        qmap = entry.queries()
        for parts in (4, 8, 4, 8, 4, 8):
            entry._STREAM_STATE_PARTITIONS = parts
            tot = 0.0
            per = {}
            for name in stream_qs:
                entry._reset_bench_caches()
                t = run(lambda: qmap[name](spark, SF_DIR))
                per[name] = round(t, 3)
                tot += t
            print(f"stream parts={parts}: total={tot:6.3f}s {per}", flush=True)
        entry._STREAM_STATE_PARTITIONS = 4

    if "shj" in WHICH:
        join_qs = [
            "top_customers",
            "region_supplier_volume",
            "top20_other",
            "range_join",
            "dedup_index_probe",
            "candles_all",
            "corpus_curation",
            "doc_line_dedup",
        ]
        qmap = entry.queries()
        for pref in ("false", "true", "false", "true", "false", "true"):
            spark.conf.set("spark.sql.join.preferSortMergeJoin", pref)
            tot = 0.0
            per = {}
            for name in join_qs:
                entry._reset_bench_caches()
                t = run(lambda: qmap[name](spark, SF_DIR))
                per[name] = round(t, 3)
                tot += t
            print(
                f"preferSortMergeJoin={pref}: total={tot:6.3f}s {per}",
                flush=True,
            )
        spark.conf.set("spark.sql.join.preferSortMergeJoin", "false")

    spark.stop()


if __name__ == "__main__":
    main()
