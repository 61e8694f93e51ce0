"""Fixed-workload host probe — separates "the engine changed" from "the box
changed".

This round measured identical bench code+data drifting 70→84 s within one
session while the guest was verifiably idle (zero steal, 120 GiB free,
disk at 247 MB/s) — host-level variance invisible to guest metrics. Every
wall-clock artifact in `.scale/` is only interpretable against the host
speed AT THE TIME IT WAS TAKEN, so this script measures three fixed
reference workloads whose cost cannot depend on any engine code:

- **gemm**: 10× numpy 2000×2000 float64 matmul — CPU FLOPS + memory
  bandwidth (the resource a noisy co-tenant host steals first; BLAS here
  is single-process, so contention shows directly).
- **disk**: 512 MiB O_DIRECT-free sequential write + cold-ish re-read
  through the page cache — the shuffle-spill/scan path's substrate.
- **spark_shuffle**: one fixed Spark job (sum of xxhash64 over a 20M-row
  range, repartitioned 64 ways) — JVM boot excluded, captures codegen +
  shuffle + scheduler throughput end-to-end.

Output: one JSON line + append to ``.scale/HOST_PROBE.jsonl`` (timestamped
history, one row per invocation). Run it immediately before/after a bench
to bracket the host state; compare rows to normalize cross-session
wall-clock artifacts. Protocol: min-of-3 per component, settle-guarded.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

from scripts.measure import settle  # noqa: E402

OUT = os.path.join(REPO, ".scale", "HOST_PROBE.jsonl")


def _min_of(n: int, fn) -> float:
    best = None
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        t = time.perf_counter() - t0
        best = t if best is None else min(best, t)
    return round(best, 3)


def probe_gemm() -> float:
    x = np.random.RandomState(0).rand(2000, 2000)

    def work():
        for _ in range(10):
            x @ x

    return _min_of(3, work)


def probe_disk(tmp_dir: str = "/tmp") -> float:
    path = os.path.join(tmp_dir, f"host_probe_{os.getpid()}.bin")
    blob = np.random.RandomState(1).bytes(512 * 1024 * 1024)

    def work():
        with open(path, "wb") as fh:
            fh.write(blob)
            fh.flush()
            os.fsync(fh.fileno())
        with open(path, "rb") as fh:
            while fh.read(1 << 24):
                pass

    try:
        return _min_of(2, work)
    finally:
        os.unlink(path)


def probe_spark_shuffle(spark) -> float:
    from pyspark.sql import functions as F

    def work():
        (
            spark.range(0, 20_000_000, 1, 32)
            .repartition(64, F.xxhash64("id"))
            .agg(F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000))))
            .collect()
        )

    return _min_of(3, work)


def main() -> int:
    settled_s = settle()
    row = {
        "ts": time.time(),
        "iso": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "settled_s": settled_s,
        "loadavg_pre": round(os.getloadavg()[0], 2),
        "cpus": os.cpu_count(),
        "gemm_s": probe_gemm(),
        "disk_s": probe_disk(),
    }
    if "--no-spark" not in sys.argv:
        from coin_for_rich_spark.session import get_spark

        spark = get_spark("coin_for_rich_spark-host-probe")
        row["spark_shuffle_s"] = probe_spark_shuffle(spark)
        spark.stop()
    row["loadavg_post"] = round(os.getloadavg()[0], 2)
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
