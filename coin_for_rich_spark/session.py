"""SparkSession factory.

Local test posture: one JVM, ``local[$SPARK_GRAFT_CPUS]``. Production posture
(the design target): 1000-executor cluster over ~100 TB of time-partitioned
Parquet. Every knob below is chosen to survive that scale-up:

- AQE on: runtime coalescing + skew-join splitting replace hand-tuning of
  ``spark.sql.shuffle.partitions`` per stage.
- UTC session timezone: the reference stores TIMESTAMPTZ and converses in
  epoch milliseconds (`common/helpers/datetimehelpers.py:8-127`); pinning UTC
  makes every bucket boundary deterministic.
- Arrow enabled: any Pandas-UDF fallback (llmdata multimodal path) moves
  columnar batches, not pickled rows.
- ``parquet.nanosAsLong``: the driver's testdata writes nanosecond INT64
  timestamps, which Spark refuses by default; we read them as longs and
  convert with exact integer division (see sources.tables).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "coin_for_rich_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = DEFAULT_SHUFFLE_PARTITIONS
    # SPARK_GRAFT_MASTER overrides the single-JVM default — e.g.
    # ``local-cluster[2,8,4096]`` runs 2 separate worker JVMs (real task
    # closure serialization, broadcast lifecycle, cross-process shuffle),
    # the closest a single host gets to multi-executor topology; the scale
    # gate's CLUSTER axis uses it
    master = os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # let the planner choose shuffled-hash join when its size conditions
        # are met instead of always sorting both sides (guide §3.1/§9
        # posture; join strategy never changes results). Not a local-only
        # knob: at cluster scale SHJ skips two corpus sorts wherever a
        # build-side partition fits, AQE's skew splitting still applies,
        # and the size conditions keep oversized build sides on sort-merge.
        # Measured r15: dedup_index_probe -11%, fact-x-fact joins -2-4%,
        # no row slower (alternating same-session A/B).
        .config("spark.sql.join.preferSortMergeJoin", "false")
        # scan-split granularity sized for LOCAL test data: the sf0.1 fact
        # files are 2-11 MB, so the 128 MB default scans them as ONE
        # partition and serializes every map-side stage onto one core
        # (measured: candles_all 1.54 s → 0.86 s at 8 MB). At cluster scale
        # a 100 TB table splits into ~10⁶ partitions under ANY sane value —
        # this knob only matters when files are smaller than the default
        # split, which is exactly the local case. Deployment overrides via
        # extra_conf.
        .config("spark.sql.files.maxPartitionBytes", str(8 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if not master.startswith("local["):
        _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Ship the repo's Python code to executors via ``addPyFile``.

    In single-JVM ``local[...]`` mode executor Python workers inherit the
    driver's ``sys.path``, which silently hides a real deployment
    requirement: every cloudpickled function defined at module level is
    pickled BY REFERENCE, so multi-JVM executors (``local-cluster``,
    standalone, YARN, k8s) must be able to import
    ``coin_for_rich_spark`` — and ``__spark_entry__`` — themselves. This
    is the canonical ``--py-files`` posture, built in so the same session
    factory works on any topology (found by the r10 local-cluster gate:
    every applyInPandas/mapInPandas query raised ModuleNotFoundError on
    executor 0 until the package shipped).

    The zip is content-addressed (md5 over file paths+bytes) and cached in
    the temp dir, so repeated sessions reuse it and a code edit can never
    serve a stale package.
    """
    import hashlib
    import os as _os
    import tempfile
    import zipfile

    repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
    pkg = _os.path.join(repo, "coin_for_rich_spark")
    entry = _os.path.join(repo, "__spark_entry__.py")
    h = hashlib.md5()
    members: list[tuple[str, str]] = []  # (abs path, arcname)
    for base, _dirs, files in sorted(_os.walk(pkg)):
        if "__pycache__" in base:
            continue
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            p = _os.path.join(base, f)
            arc = _os.path.relpath(p, repo)
            members.append((p, arc))
    if _os.path.isfile(entry):
        members.append((entry, "__spark_entry__.py"))
    for p, arc in members:
        h.update(arc.encode())
        with open(p, "rb") as fh:
            h.update(fh.read())
    zpath = _os.path.join(
        tempfile.gettempdir(), f"cfr_pkg_{h.hexdigest()[:12]}.zip"
    )
    if not _os.path.isfile(zpath):
        tmp = zpath + f".tmp{_os.getpid()}"
        with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
            for p, arc in members:
                zf.write(p, arc)
        _os.replace(tmp, zpath)  # atomic: concurrent sessions can race here
    spark.sparkContext.addPyFile(zpath)
