"""Shared measurement controls for bench.py and the scale scripts.

One implementation of the load-settle guard (previously three diverging
copies in bench.py / scale_smoke.py / ingest_throughput.py): the r7/r8
driver benches ran under co-tenant loadavg 4-6 and produced phantom
15-30% drifts that cost two rounds of adjudication — every measured
number now waits (bounded) for the host to drain first, and every
harness honors the same kill switch and reports the same wait metric.
"""

from __future__ import annotations

import os
import time


def settle(max_load: float = 3.0, timeout_s: float = 120.0) -> float:
    """Bounded wait for co-tenant load to drain before measuring.

    Returns seconds waited (0.0 when disabled) so harnesses can record it
    alongside their numbers. Disable with ``SPARK_GRAFT_BENCH_SETTLE=0``.
    """
    if os.environ.get("SPARK_GRAFT_BENCH_SETTLE", "1") == "0":
        return 0.0
    t0 = time.monotonic()
    while os.getloadavg()[0] > max_load and time.monotonic() - t0 < timeout_s:
        time.sleep(5)
    return round(time.monotonic() - t0, 1)
