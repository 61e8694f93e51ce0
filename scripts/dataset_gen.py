"""Shared scaffolding for derived-dataset generators (sf1, skew, ...).

One implementation of the ident-marker / copy-fixed-tables / build-and-
write loop that `scripts/sf1_data.py` and `scripts/skew_data.py` both
use. The ident folds in a fingerprint of the ENTIRE generator module's
source, so editing any transform (or helper it calls) regenerates the
dataset automatically — a hand-bumped version string alone silently
serves stale data to the gates when someone forgets the bump.
"""

from __future__ import annotations

import hashlib
import inspect
import os
import shutil
import sys
import time
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


def _module_fingerprint(fn: Callable) -> str:
    """Fingerprint of the generator's whole module source — any edit to
    the transforms OR their helpers invalidates the marker."""
    mod = sys.modules[fn.__module__]
    return hashlib.sha1(inspect.getsource(mod).encode()).hexdigest()[:12]


def dataset_ident(src_dir: str, version: str, build_fn: Callable) -> str:
    from coin_for_rich_spark.sources import TABLES

    parts = []
    for name in TABLES:
        st = os.stat(os.path.join(src_dir, f"{name}.parquet"))
        parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    return f"{version}|{_module_fingerprint(build_fn)}|" + "|".join(parts)


def ensure_dataset(
    spark: SparkSession,
    *,
    out_dir: str,
    src_dir: str,
    version: str,
    copy_tables: list[str],
    build_fn: Callable[[SparkSession], dict[str, DataFrame]],
    parts: dict[str, int],
    log=print,
) -> str:
    """Generate (or reuse) a derived dataset; returns ``out_dir``.

    ``copy_tables`` pass through byte-identical via filesystem copy;
    ``build_fn`` returns the transformed tables, each written with
    ``parts[name]`` partitions. Idempotent via the ident marker (source
    stats + module fingerprint + version).
    """
    marker = os.path.join(out_dir, "_ident.txt")
    want = dataset_ident(src_dir, version, build_fn)
    if os.path.isfile(marker):
        with open(marker) as fh:
            if fh.read() == want:
                log(f"dataset up to date at {out_dir}", file=sys.stderr)
                return out_dir
    os.makedirs(out_dir, exist_ok=True)
    t0 = time.perf_counter()
    for name in copy_tables:
        dst = os.path.join(out_dir, f"{name}.parquet")
        src = os.path.join(src_dir, f"{name}.parquet")
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        elif os.path.isfile(dst):
            os.remove(dst)
        if os.path.isdir(src):
            shutil.copytree(src, dst)
        else:
            shutil.copyfile(src, dst)
    for name, df in build_fn(spark).items():
        # parts[name] is None when the generator controls its own physical
        # layout (e.g. perm_data's hash-scattered partitioning) — an extra
        # round-robin repartition here would undo exactly what it built.
        n = parts[name]
        if n is not None:
            df = df.repartition(n)
        df.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{name}.parquet")
        )
    with open(marker, "w") as fh:
        fh.write(want)
    log(
        f"generated {version} dataset in {time.perf_counter() - t0:.1f}s "
        f"at {out_dir}",
        file=sys.stderr,
    )
    return out_dir
