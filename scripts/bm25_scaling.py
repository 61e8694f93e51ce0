"""BM25 contract-shape scaling probe: FIXED query batch, growing corpus.

The gate row's query derivation scales query count with the corpus
(every 97th doc) and the saturated synthetic vocabulary makes every
query match nearly every doc — that measures a designed worst case, not
the operator's contract (index a huge corpus, serve a bounded query
batch). This probe holds the query set constant (the 52 sf0.1-resident
queries: doc_id % 97 == 3 AND doc_id < 5000, identical texts in every
scaled dir since replication preserves the first copy) and measures
``bm25_index`` + ``bm25_topk`` walls at sf0.1 / sf1 / sf10 — the number
that should scale with CORPUS size only.

Run: ``python scripts/bm25_scaling.py [--runs N]``.
Artifact: ``.scale/R15_BM25_SCALING.json``.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from coin_for_rich_spark.llmdata.bm25 import bm25_index, bm25_topk  # noqa: E402
from coin_for_rich_spark.llmdata.dedup import (  # noqa: E402
    release_intermediate_caches,
)
from coin_for_rich_spark.session import get_spark  # noqa: E402
from coin_for_rich_spark.sources.tables import load_table  # noqa: E402
from scripts.host_probe import probe  # noqa: E402
from scripts.measure import settle  # noqa: E402

DIRS = {
    "sf0.1": "/root/testdata/sf0.1",
    "sf1": os.path.join(REPO, ".scale", "sf1"),
    "sf10": os.path.join(REPO, ".scale", "sf10"),
}


def _fixed_queries(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    return docs.filter(
        (F.col("doc_id") % 97 == 3) & (F.col("doc_id") < 5000)
    ).select(
        F.col("doc_id").alias("query_id"),
        F.array_join(
            F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 8), " "
        ).alias("text"),
    )


def main() -> int:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    spark = get_spark("bm25-scaling")
    out: dict = {"runs": runs, "probe_pre": probe(spark, tag="bm25_pre")}
    for tag, d in DIRS.items():
        if not os.path.isdir(d):
            print(f"{tag} missing ({d}) — skipped", file=sys.stderr)
            continue
        waited = settle()
        walls, rows, nq = [], None, None
        for _ in range(runs):
            t0 = time.monotonic()
            docs = load_table(spark, d, "documents")
            qs = _fixed_queries(spark, d)
            res = bm25_topk(bm25_index(docs), qs, k=10)
            rows = res.count()
            walls.append(round(time.monotonic() - t0, 3))
            nq = qs.count()
            release_intermediate_caches()
        out[tag] = {
            "n_queries": nq,
            "rows": rows,
            "walls": walls,
            "min_wall": min(walls),
            "settle_waited_s": waited,
            "loadavg": round(os.getloadavg()[0], 2),
        }
        print(json.dumps({tag: out[tag]}), file=sys.stderr)
    out["probe_post"] = probe(spark, tag="bm25_post")
    path = os.path.join(REPO, ".scale", "R15_BM25_SCALING.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"json": path}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
