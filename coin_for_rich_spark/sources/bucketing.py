"""Bucketed storage layout — pay the shuffle once at ingest, never again.

The 100 TB join/aggregation posture for keys that are queried repeatedly:
writing a fact table bucketed (hash-partitioned into a fixed number of
buckets on the join/group key, persisted in the catalog) makes every
subsequent equi-join between co-bucketed tables and every aggregation on
the bucket key EXCHANGE-FREE — the scan itself reports the hash
distribution, so Catalyst plans a sort-merge join / hash aggregate with no
shuffle on the bucketed side(s). For a daily-refreshed fact table read by
dozens of queries, that converts the single largest recurring cluster cost
(the fact-table shuffle) into a one-time ingest cost.

Reference parity note: the reference leans on PostgreSQL PK b-trees for
the same effect (`scripts/database/init/create.sql:105-223` — every
candles query is an index range scan, never a re-sort). Bucketing is the
Spark-native analog for immutable columnar storage.

Mechanics that matter at scale (all encoded in :func:`write_bucketed`):

- The writer repartitions ON THE BUCKET KEY first. Spark writes one file
  per (writing task × non-empty bucket); without the repartition a
  P-partition dataframe can emit P×B small files — the classic bucketed
  small-file explosion. With it, each bucket's rows are in one task →
  exactly B files.
- ``sortBy`` the probe/range column within buckets when there is one:
  bucket files then serve merge joins and min/max skipping without a sort.
- Bucket counts must MATCH (or divide) across co-bucketed tables for the
  join to stay shuffle-free; expose it as an explicit argument, not a
  default, so the layout decision is visible at the call site.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> DataFrame:
    """Persist ``df`` as a bucketed catalog table and return the re-read
    relation (whose scan carries the bucket distribution). ``path`` makes
    the table external at that location (tests use tmp dirs); omitted, it
    lands in the session warehouse."""
    spark = df.sparkSession
    writer = (
        df.repartition(n_buckets, *[df[c] for c in bucket_cols])
        .write.format("parquet")
        .mode(mode)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def is_bucketed(spark: SparkSession, table: str) -> bool:
    """True if the catalog table carries bucketing metadata (DESCRIBE
    EXTENDED exposes ``Num Buckets``)."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    return any(r["col_name"] == "Num Buckets" for r in rows)


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle Exchange operators in the df's executed plan — the
    quantity bucketing exists to drive to zero. (AQE wraps the plan; the
    initial physical plan is what encodes the exchange decisions.)"""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return sum(
        line.strip().lstrip("+-:* ").startswith("Exchange")
        for line in plan.splitlines()
    )
