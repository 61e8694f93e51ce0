"""Partitioned table store: the hypertable analog (§1.2).

Reference parity: `SELECT create_hypertable('ohlcvs', 'time')`
(`scripts/database/init/create.sql:87`) chunk-partitions the fact table on
time; secondary indexes (`create.sql:76-78`) provide (key, time) access
paths. The Spark-native equivalent is columnar Parquet **partitioned by a
derived date column**: partition pruning replaces chunk exclusion, Parquet
min/max row-group statistics replace the b-trees, and column pruning comes
free.

Every time-predicate query on a table written this way scans only the
touched days — at 100 TB, a one-week chart read touches 7 partitions no
matter how many years of history exist. Writers bucket rows into their day
inside the normal shuffle; no driver-side loop, no global sort.

``materialize_rollups`` is the continuous-aggregate sink: each resolution's
candles land in their own partitioned table, which the interval router
(plans.reader) can then serve without rescanning raw ticks — the exact
relationship between the reference's `ohlcvs` and its 8 rollup views.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.candles import rollup_family

PARTITION_COL = "dt"


def write_partitioned(
    df: DataFrame,
    path: str,
    time_col: str = "ts",
    mode: str = "overwrite",
) -> None:
    """Write ``df`` date-partitioned on ``time_col``'s day."""
    (
        df.withColumn(PARTITION_COL, F.to_date(F.col(time_col)))
        .write.mode(mode)
        .partitionBy(PARTITION_COL)
        .parquet(path)
    )


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Read a partitioned table; time predicates prune via ``dt``.

    Callers filter on the *time column* as usual plus (optionally) ``dt`` —
    ``prune_time_range`` derives the partition predicate from a time range
    so callers never have to think about the layout.
    """
    return spark.read.parquet(path)


def prune_time_range(df: DataFrame, time_col: str, start=None, end=None) -> DataFrame:
    """Apply a time-range filter AND its derived partition predicate.

    The redundant ``dt`` bounds are what the scan planner prunes on —
    Catalyst cannot infer them from the ``time_col`` bounds because ``dt``
    is a stored column, not an expression, once the table is on disk.
    """
    if start is not None:
        df = df.filter(
            (F.col(time_col) >= F.lit(start))
            & (F.col(PARTITION_COL) >= F.to_date(F.lit(start)))
        )
    if end is not None:
        df = df.filter(
            (F.col(time_col) <= F.lit(end))
            & (F.col(PARTITION_COL) <= F.to_date(F.lit(end)))
        )
    return df


def materialize_rollups(
    ticks: DataFrame,
    base_path: str,
    intervals: tuple[str, ...] = ("5m", "15m", "30m", "1h", "6h", "12h", "1D", "7D"),
    **rollup_kwargs,
) -> dict[str, str]:
    """Write the rollup family to per-resolution partitioned sink tables
    (the 8 continuous aggregates, `create.sql:105-223`); returns
    interval → path. Batch backfill counterpart of streaming.rollup."""
    paths: dict[str, str] = {}
    for interval, rolled in rollup_family(ticks, list(intervals), **rollup_kwargs).items():
        p = f"{base_path}/candles_{interval}"
        write_partitioned(rolled, p, time_col="bucket")
        paths[interval] = p
    return paths


def load_rollups(spark: SparkSession, paths: dict[str, str]) -> dict[str, DataFrame]:
    """Reload materialized rollups for the interval router (plans.reader)."""
    return {iv: read_partitioned(spark, p).drop(PARTITION_COL) for iv, p in paths.items()}
