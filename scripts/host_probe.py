"""Fixed-workload host probe — separates "the engine changed" from "the box
changed".

r13 measured identical bench code+data drifting 70→84 s within one session
while the guest was verifiably idle (zero steal, 120 GiB free, disk at
247 MB/s) — host-level variance invisible to guest metrics. Every
wall-clock artifact in `.scale/` is only interpretable against the host
speed AT THE TIME IT WAS TAKEN, so this module measures three fixed
reference workloads whose cost cannot depend on any engine code:

- **gemm**: 10× numpy 2000×2000 float64 matmul — CPU FLOPS + memory
  bandwidth (the resource a noisy co-tenant host steals first; BLAS here
  is single-process, so contention shows directly).
- **disk**: 512 MiB sequential fsync'd write + an immediate cached
  re-read. The write leg exercises the shuffle-spill/scan substrate; the
  re-read is page-cache-warm BY DESIGN (it measures memory-bandwidth copy
  throughput, not device reads — named honestly after the r13 ADVICE).
  The scratch file lives under the repo's ``.scale/`` so it hits the same
  filesystem the engine's spill/scan artifacts use, never a tmpfs /tmp.
- **spark_shuffle**: one fixed Spark job (sum of xxhash64 over a 20M-row
  range, repartitioned 64 ways) — JVM boot excluded, captures codegen +
  shuffle + scheduler throughput end-to-end.

Library use (bench.py / scale scripts bracket their measurements):

    from scripts.host_probe import probe
    pre = probe(spark, tag="bench_pre")    # returns the row dict
    ... measured work ...
    post = probe(spark, tag="bench_post")

Every call appends one timestamped row to ``.scale/HOST_PROBE.jsonl`` so
the history stays queryable across sessions. CLI: ``python
scripts/host_probe.py [--no-spark]`` prints one JSON line. Protocol:
min-of-N per component, settle-guarded only in CLI mode (library callers
own their settle policy — a post-bench probe must measure the box AS THE
BENCH SAW IT, not after a drain).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

OUT = os.path.join(REPO, ".scale", "HOST_PROBE.jsonl")
SCRATCH_DIR = os.path.join(REPO, ".scale", "scratch")


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


def probe_disk(tmp_dir: str | None = None) -> float:
    """512 MiB fsync'd write + cached re-read on the ``.scale/`` filesystem.

    The default scratch dir deliberately shares a filesystem with the
    engine's own spill/scan artifacts (`.scale/`), NOT /tmp — on many
    hosts /tmp is tmpfs and the 'disk' leg would silently measure RAM.
    """
    tmp_dir = tmp_dir or SCRATCH_DIR
    os.makedirs(tmp_dir, exist_ok=True)
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
        # the first write attempt may die before the file exists (ENOSPC):
        # never let the cleanup mask the original exception
        try:
            os.unlink(path)
        except FileNotFoundError:
            pass


def probe_spark_shuffle(spark) -> float:
    from pyspark.sql import functions as F

    def work():
        (
            spark.range(0, 20_000_000, 1, 32)
            .repartition(64, F.xxhash64("id"))
            .agg(F.sum(F.pmod(F.xxhash64("id"), F.lit(1_000_000))))
            .collect()
        )

    # min-of-5 (was 3): HOST_PROBE.jsonl showed 19% same-day CV on this
    # leg at 3 reps — a co-tenant burst spanning all three reps poisons
    # the bench denominator; two extra ~1 s reps are cheap insurance.
    # The workload and units are unchanged, only the estimator tightens.
    return _min_of(5, work)


def probe(spark=None, tag: str | None = None, append: bool = True) -> dict:
    """One full probe row. Pass a live SparkSession to include the shuffle
    leg without paying a JVM boot; ``tag`` labels the row's context in
    HOST_PROBE.jsonl (e.g. ``bench_pre`` / ``bench_post``)."""
    row = {
        "ts": time.time(),
        "iso": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        "loadavg_pre": round(os.getloadavg()[0], 2),
        "cpus": os.cpu_count(),
        "gemm_s": probe_gemm(),
        "disk_s": probe_disk(),
    }
    if tag:
        row["tag"] = tag
    if spark is not None:
        row["spark_shuffle_s"] = probe_spark_shuffle(spark)
    row["loadavg_post"] = round(os.getloadavg()[0], 2)
    if append:
        os.makedirs(os.path.dirname(OUT), exist_ok=True)
        with open(OUT, "a") as fh:
            fh.write(json.dumps(row) + "\n")
    return row


def main() -> int:
    from scripts.measure import settle

    settled_s = settle()
    spark = None
    if "--no-spark" not in sys.argv:
        from coin_for_rich_spark.session import get_spark

        spark = get_spark("coin_for_rich_spark-host-probe")
    row = probe(spark, tag="cli")
    row["settled_s"] = settled_s
    if spark is not None:
        spark.stop()
    print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
