"""sf1 scale smoke — the 10x datapoint the 100 TB design grade needs.

VERDICT r7 ask #4 / r8 ask #1: every scale claim in COVERAGE.md is argued
from plan shape; this script adds the first measured datapoint above
sf0.1. It (a) GENERATES an sf1 dataset (10x sf0.1) under
``/root/repo/.scale/sf1`` by replicating the driver's sf0.1 tables ten
times along the axis that actually grows at 100 TB — KEY CARDINALITY —
and (b) runs the six most expensive declared plans at sf0.1 and sf1 in
ONE session, reporting per-query wall seconds and the 10x scaling ratio.

Replication design (why this is a fair 10x and not a degenerate one):

- ``events``: replica i offsets ``event_id`` by i*(max+1) and ``user_id``
  by i*(n_users) — 10x rows AND 10x distinct streaming keys (1,500 →
  15,000), the axis that grows streaming state, shuffle key space, and
  merge-target cardinality. Timestamps are untouched: the event-time
  window stays fixed while key density grows, exactly how a bigger
  exchange universe scales the reference's ingest.
- ``documents``: replica i offsets ``doc_id`` and suffixes every token
  with ``_r{i}`` — replicas share NO shingles/words, so the near-dup pair
  structure, BPE word distribution, and cluster layout replicate exactly
  10x instead of collapsing into one giant everything-matches component
  (10 identical copies would measure a pathology, not scale).

Idempotent: generation is skipped when the ident marker matches the
source files. Output: one JSON line per plan + a summary table on stderr,
full JSON to ``.scale/SCALE_SMOKE.json``.

Run: ``python scripts/scale_smoke.py [query ...]`` (default: the top-6).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import __spark_entry__ as entry_mod  # noqa: E402
from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from coin_for_rich_spark.session import get_spark  # noqa: E402
from coin_for_rich_spark.sources import load_table  # noqa: E402

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF1 = os.path.join(REPO, ".scale", "sf1")
REPLICAS = 10
# the six most expensive declared plans (VERDICT r8 ask #1 list + bpe)
TOP = [
    "stream_upsert_ingest",
    "stream_latest_serve",
    "stream_hold_back",
    "ngram_jaccard",
    "dedup_clusters",
    "bpe_encode",
]


def _ident() -> str:
    parts = []
    for name in ("events", "documents"):
        st = os.stat(os.path.join(SF01, f"{name}.parquet"))
        parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    return f"v1|x{REPLICAS}|" + "|".join(parts)


def _replicate_events(spark: SparkSession) -> DataFrame:
    ev = load_table(spark, SF01, "events")
    max_id, n_users = ev.agg(
        F.max("event_id"), F.count_distinct("user_id")
    ).first()
    parts = []
    for i in range(REPLICAS):
        parts.append(
            ev.select(
                (F.col("event_id") + F.lit(i * (max_id + 1))).alias("event_id"),
                "ts",
                (F.col("user_id") + F.lit(i * n_users)).alias("user_id"),
                "event_type",
                "value",
                "props",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _replicate_documents(spark: SparkSession) -> DataFrame:
    docs = load_table(spark, SF01, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    parts = [docs]
    for i in range(1, REPLICAS):
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i * (max_id + 1))).alias("doc_id"),
                # disjoint vocabulary per replica: near-dup/BPE structure
                # replicates 10x instead of collapsing cross-replica
                F.regexp_replace("text", r"(\S+)", f"$1_r{i}").alias("text"),
                "lang",
                "source",
                "n_chars",
            ).withColumn("n_chars", F.length("text").cast("long"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def generate(spark: SparkSession) -> None:
    marker = os.path.join(SF1, "_ident.txt")
    want = _ident()
    if os.path.isfile(marker):
        with open(marker) as fh:
            if fh.read() == want:
                print(f"sf1 data up to date at {SF1}", file=sys.stderr)
                return
    os.makedirs(SF1, exist_ok=True)
    t0 = time.perf_counter()
    _replicate_events(spark).repartition(32).write.mode("overwrite").parquet(
        os.path.join(SF1, "events.parquet")
    )
    _replicate_documents(spark).repartition(16).write.mode(
        "overwrite"
    ).parquet(os.path.join(SF1, "documents.parquet"))
    with open(marker, "w") as fh:
        fh.write(want)
    print(
        f"generated sf1 (x{REPLICAS} sf0.1) in "
        f"{time.perf_counter() - t0:.1f}s at {SF1}",
        file=sys.stderr,
    )


def _settle(max_load: float = 2.0, timeout_s: float = 300.0) -> None:
    """Wait for co-tenant load to drain so the measurement isn't noise —
    the r8 driver bench lost adjudication time to exactly this."""
    deadline = time.monotonic() + timeout_s
    while os.getloadavg()[0] > max_load and time.monotonic() < deadline:
        time.sleep(5)


def run_plan(spark: SparkSession, name: str, sf_dir: str) -> dict:
    fn = entry_mod.queries()[name]
    # pass 0 (untimed): row count — warms fs cache/codegen so the timed
    # passes measure the plan; passes 1..2: noop-writer wall time, MIN
    if hasattr(entry_mod, "_reset_bench_caches"):
        entry_mod._reset_bench_caches()
    rows = fn(spark, sf_dir).count()
    wall = None
    for _ in range(2):
        if hasattr(entry_mod, "_reset_bench_caches"):
            entry_mod._reset_bench_caches()
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        t = time.perf_counter() - t0
        wall = t if wall is None else min(wall, t)
    return {"sec": round(wall, 3), "rows": rows}


def main() -> int:
    names = sys.argv[1:] or TOP
    spark = get_spark("coin_for_rich_spark-scale-smoke")
    generate(spark)
    # warm both dirs so fs-cache effects don't land on the first plan
    for d in (SF01, SF1):
        for t in ("events", "documents"):
            load_table(spark, d, t).count()
    _settle()
    results: dict[str, dict] = {}
    for name in names:
        row: dict = {"loadavg_pre": round(os.getloadavg()[0], 2)}
        for label, d in (("sf0.1", SF01), ("sf1", SF1)):
            try:
                row[label] = run_plan(spark, name, d)
            except Exception as exc:  # noqa: BLE001 — the smoke RECORDS cliffs
                row[label] = {"error": f"{type(exc).__name__}: {exc}"[:500]}
        a, b = row.get("sf0.1", {}).get("sec"), row.get("sf1", {}).get("sec")
        row["ratio_10x"] = round(b / a, 2) if a and b else None
        results[name] = row
        print(json.dumps({name: row}), file=sys.stderr)
    out = {
        "sf0.1_dir": SF01,
        "sf1_dir": SF1,
        "replicas": REPLICAS,
        "cpus": os.cpu_count(),
        "loadavg_end": [round(x, 2) for x in os.getloadavg()],
        "results": results,
    }
    path = os.path.join(REPO, ".scale", "SCALE_SMOKE.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
