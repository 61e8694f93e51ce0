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


def zorder_key(a, b) -> "Column":
    """64-bit Morton (Z-order) key interleaving two NON-NEGATIVE 31-bit
    integer columns — bit i of ``a`` lands at position 2i, of ``b`` at
    2i+1, so sorting by the key clusters rows that are close in BOTH
    dimensions (every 2^k-aligned square tile is one contiguous key range).

    Hash bucketing (above) co-locates exact keys for equi-joins; Z-order
    is the layout for two-dimensional RANGE locality — e.g. (symbol_id,
    time_bucket) scans where queries slice both dimensions. Sorting a
    partition's rows by this key before writing makes parquet row-group
    min/max stats tight on BOTH columns, so either predicate skips
    row groups; a row-major sort gives that for the leading column only.

    Pure column algebra: the classic magic-number bit-spread (5 shift-or-
    mask steps per operand), no UDF. Inputs outside [0, 2^31) FAIL LOUD
    (``raise_error``) rather than silently wrapping — a masked -1 sentinel
    or raw epoch-millis would quietly destroy the tiling the layout exists
    for; quantize/bucket wider dimensions first. The 31-bit bound keeps
    the interleaved key positive in Spark's signed LongType so it orders
    correctly.
    """
    from pyspark.sql import functions as F

    def spread(c) -> "Column":
        x = F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
        # NULL must fail too: a when-condition that is NULL would silently
        # fall to otherwise and emit a NULL key into the NULLs-first range
        # partition, quietly destroying the tiling
        x = F.when(
            x.isNull() | (x < 0) | (x > 0x7FFFFFFF),
            F.raise_error(
                F.concat(
                    F.lit("zorder_key input NULL or out of [0, 2^31): "),
                    F.coalesce(x.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        ).otherwise(x)
        for shift, mask in (
            (16, 0x0000FFFF0000FFFF),
            (8, 0x00FF00FF00FF00FF),
            (4, 0x0F0F0F0F0F0F0F0F),
            (2, 0x3333333333333333),
            (1, 0x5555555555555555),
        ):
            x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
        return x

    return spread(a).bitwiseOR(F.shiftleft(spread(b), 1))


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    max_records_per_file: int | None = None,
) -> None:
    """Write ``df`` as parquet clustered by the Z-order of (col_a, col_b):
    a range-partitioned global sort on the Morton key (one shuffle, the
    same cost class as any repartitionByRange write), key dropped from the
    stored schema. Each output file then covers a compact tile in BOTH
    dimensions — predicate pushdown on either column skips whole files/row
    groups instead of only the leading sort column."""
    if "_zkey" in df.columns:
        raise ValueError(
            "df already has a column named '_zkey' (the writer's internal "
            "sort key) — rename it before write_zordered or its data would "
            "be silently dropped"
        )
    out = df.withColumn("_zkey", zorder_key(col_a, col_b))
    writer = (
        out.repartitionByRange("_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
        .write.mode("overwrite")
    )
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", str(max_records_per_file))
    writer.parquet(path)


def zorder_key_n(cols: list) -> "Column":
    """N-dimensional Morton (Z-order) key: bit i of dimension d lands at
    position ``i·n + d`` — the :func:`zorder_key` tiling generalized to
    ``n`` columns, for layouts sliced on three or more range dimensions
    (e.g. exchange, symbol_id, time_bucket).

    Each dimension gets ``63 // n`` bits (n=2 → 31, n=3 → 21, n=4 → 15);
    inputs outside ``[0, 2^bits)`` FAIL LOUD exactly like the 2-D key —
    quantize wider dimensions first (the bit budget shrinking with n is
    the honest cost of more dimensions, not a limitation to hide). n=2
    delegates to the magic-number ``zorder_key`` (bit-identical, pinned
    by test); higher n builds the interleave as a per-bit shift-OR chain
    — still pure column algebra, one codegen'd expression.
    """
    from functools import reduce

    from pyspark.sql import functions as F

    n = len(cols)
    if n < 2 or n > 8:
        raise ValueError("zorder_key_n takes 2..8 columns")
    if n == 2:
        return zorder_key(cols[0], cols[1])
    bits = 63 // n
    bound = 1 << bits

    terms = []
    for d, c in enumerate(cols):
        x = F.col(c).cast("long") if isinstance(c, str) else c.cast("long")
        x = F.when(
            x.isNull() | (x < 0) | (x >= bound),
            F.raise_error(
                F.concat(
                    F.lit(f"zorder_key_n input NULL or out of [0, 2^{bits}): "),
                    F.coalesce(x.cast("string"), F.lit("NULL")),
                )
            ).cast("long"),
        ).otherwise(x)
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(x, i).bitwiseAND(F.lit(1)), i * n + d
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)
