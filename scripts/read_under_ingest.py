"""Merge-sink READ latency under concurrent ingest — the r11 ask #5.

`ParquetMergeSink` is merge-on-read: every read re-resolves the per-PK
winner with a window over ALL `batch=N` partitions, so read cost grows with
the batch-log length until `compact()` folds it. `INGEST_THROUGHPUT.json`
measures the write side only; this script measures the READ side in the
three states a serving deployment actually sees:

1. ``during_ingest`` — a 24-micro-batch replay ingests (one file per
   trigger, the updater's drain cadence shape) while a foreground reader
   loop re-resolves the table state after every completed read. Reads and
   writes share the session, so the numbers include real scheduler
   contention — the honest serving-while-ingesting picture.
2. ``post_ingest`` — the stream is done; the log holds 24 batch
   partitions. This is the read-amplification worst case.
3. ``post_compact`` — after ``compact()``: one base partition, read-amp 1.

Output: one JSON line + ``.scale/READ_UNDER_INGEST.json`` with per-phase
read latencies (median-of-N) and the resolved row count (identical across
phases — compaction must never change the resolved state, asserted here).

Run: ``python scripts/read_under_ingest.py [--sf DIR]`` (default sf0.1).
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from coin_for_rich_spark.session import get_spark  # noqa: E402
from coin_for_rich_spark.sources import load_table  # noqa: E402
from coin_for_rich_spark.streaming.sink import ParquetMergeSink, run_ingest  # noqa: E402
from coin_for_rich_spark.streaming.source import (  # noqa: E402
    read_file_stream,
    stage_stream_chunks,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_CHUNKS = 24
N_READS = 10


def _timed_read(spark, sink: ParquetMergeSink) -> tuple[float, int]:
    """One full resolved-state read: winner window + count + a value agg
    (forces every column through the resolve, not just the PK)."""
    t0 = time.perf_counter()
    df = sink.read(spark)
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
    ).first()
    return time.perf_counter() - t0, int(row["n"])


def main() -> int:
    sf_dir = SF_DIR
    if "--sf" in sys.argv:
        sf_dir = os.path.abspath(sys.argv[sys.argv.index("--sf") + 1])
    spark = get_spark("coin_for_rich_spark-read-under-ingest")
    from scripts.host_probe import probe

    probe_pre = probe(spark, tag="read_under_ingest_pre")
    ev = load_table(spark, sf_dir, "events")
    stage = os.path.join(tempfile.mkdtemp(prefix="cfr_rui_stage_"), "events")
    schema = stage_stream_chunks(ev, stage, n_chunks=N_CHUNKS)
    sink = ParquetMergeSink(
        tempfile.mkdtemp(prefix="cfr_rui_sink_") + "/tbl",
        pk=("user_id", "event_type"),
        mode="upsert",
        tiebreak_col="ts",
    )
    ckpt = tempfile.mkdtemp(prefix="cfr_rui_ckpt_")

    ingest_done = threading.Event()
    ingest_err: list[BaseException] = []

    def _ingest() -> None:
        try:
            run_ingest(read_file_stream(spark, stage, schema), sink, ckpt)
        except BaseException as exc:  # noqa: BLE001 — surfaced in artifact
            ingest_err.append(exc)
        finally:
            ingest_done.set()

    th = threading.Thread(target=_ingest, daemon=True)
    th.start()
    # wait until the sink exists so the first read has something to resolve
    while not ingest_done.is_set() and not os.path.exists(sink.path):
        time.sleep(0.05)

    during: list[float] = []
    read_failures = 0
    consecutive_failures = 0
    last_read_error: str | None = None
    while not ingest_done.is_set():
        try:
            sec, _ = _timed_read(spark, sink)
            during.append(round(sec, 3))
            consecutive_failures = 0
        except Exception as exc:  # noqa: BLE001 — counted, surfaced below
            # a read can race the very first batch dir creation — but a
            # SYSTEMATIC reader failure must not silently produce n=0
            # (r12 ADVICE): count every failure, keep the last message,
            # and give up after a bounded streak instead of spinning
            read_failures += 1
            consecutive_failures += 1
            last_read_error = repr(exc)
            if consecutive_failures >= 20:
                break
            time.sleep(0.1)
    th.join()
    if ingest_err:
        raise ingest_err[0]
    if not during:
        print(
            f"WARNING: zero successful reads during ingest "
            f"({read_failures} failures; last: {last_read_error})",
            file=sys.stderr,
        )

    n_batches = len(
        [d for d in os.listdir(sink.path) if d.startswith("batch=")]
    )
    post_ingest, rows_pre = [], None
    for _ in range(N_READS):
        sec, rows_pre = _timed_read(spark, sink)
        post_ingest.append(round(sec, 3))

    t0 = time.perf_counter()
    sink.compact(spark)
    compact_sec = round(time.perf_counter() - t0, 3)

    post_compact, rows_post = [], None
    for _ in range(N_READS):
        sec, rows_post = _timed_read(spark, sink)
        post_compact.append(round(sec, 3))

    assert rows_pre == rows_post, (
        f"compact() changed the resolved state: {rows_pre} -> {rows_post}"
    )
    out = {
        "sf_dir": sf_dir,
        "n_chunks": N_CHUNKS,
        "n_batch_partitions_before_compact": n_batches,
        "resolved_rows": rows_pre,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
        "reads_during_ingest": {
            "n": len(during),
            "median_sec": round(statistics.median(during), 3) if during else None,
            "all_sec": during,
            "read_failures": read_failures,
            "last_read_error": last_read_error,
        },
        "reads_post_ingest_precompact": {
            "n": N_READS,
            "median_sec": round(statistics.median(post_ingest), 3),
            "all_sec": post_ingest,
        },
        "compact_sec": compact_sec,
        "reads_post_compact": {
            "n": N_READS,
            "median_sec": round(statistics.median(post_compact), 3),
            "all_sec": post_compact,
        },
        "probe_pre": probe_pre,
        "probe_post": probe(spark, tag="read_under_ingest_post"),
    }
    path = os.path.join(REPO, ".scale", "READ_UNDER_INGEST.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
