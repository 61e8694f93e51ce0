"""Alternating A/B: does widening single-row-group scans (ensure_parallelism
after load_table) speed up the map-heavy declared queries?  Every variant
pair alternates inside ONE session, min-of-N, noop sink (guide §1.4)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entry
from coin_for_rich_spark.functions.partitioning import ensure_parallelism
from coin_for_rich_spark.session import get_spark
from coin_for_rich_spark.sources import load_table as _raw_load_table

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
N = int(os.environ.get("N_PASSES", "4"))

_WIDEN: set[str] = set()
_MODE = "rr"  # rr = round-robin ensure_parallelism; hash = repartition(32, key)
_HASH_KEY = {"lineitem": "l_orderkey", "events": "user_id", "documents": "doc_id"}


def patched_load_table(spark, sf_dir, name):
    df = _raw_load_table(spark, sf_dir, name)
    if name in _WIDEN:
        if _MODE == "hash":
            df = df.repartition(32, _HASH_KEY[name])
        else:
            df = ensure_parallelism(df)
    return df


entry.load_table = patched_load_table


def run_once(qfn, spark):
    entry._reset_bench_caches()
    t0 = time.perf_counter()
    qfn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def ab(qname, widen, spark, mode="rr"):
    global _WIDEN, _MODE
    qfn = getattr(entry, f"q_{qname}")
    a, b = float("inf"), float("inf")
    for _ in range(N):
        _WIDEN, _MODE = set(), mode
        a = min(a, run_once(qfn, spark))
        _WIDEN, _MODE = set(widen), mode
        b = min(b, run_once(qfn, spark))
    print(
        f"{qname:24s} widen={','.join(sorted(widen)):12s} mode={mode:4s} "
        f"A(as-is)={a:6.3f}s  B(widened)={b:6.3f}s  delta={100 * (b - a) / a:+5.1f}%",
        flush=True,
    )


def main():
    spark = get_spark("widen_ab")
    ab("doc_profile", {"documents"}, spark)
    ab("web_preprocess", {"documents"}, spark)
    ab("props_extract", {"events"}, spark)
    ab("pricing_summary", {"lineitem"}, spark)
    ab("pricing_summary", {"lineitem"}, spark, mode="hash")
    ab("top_customers", {"lineitem", "orders"}, spark)
    ab("common_keys_30", {"lineitem"}, spark)
    ab("top20_other", {"lineitem"}, spark)
    ab("region_supplier_volume", {"lineitem", "orders"}, spark)
    spark.stop()


if __name__ == "__main__":
    main()
