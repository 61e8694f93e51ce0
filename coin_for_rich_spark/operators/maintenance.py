"""Maintenance / ops operators: latest-per-key, gap detection, liveness
recompute, retention, PK dedup, cardinality probes.

Reference parity (SURVEY §2.3/§2.5/§2.8):
- J3  LATERAL top-1-per-group  (`fetchers/config/queries.py:19-31`)
- W1  LEAD-based gap detection (`fetchers/config/queries.py:54-61`)
- M1  is_trading recompute     (`scripts/database/cron/daily.sql:1-40`)
- J5/M2 retention anti-join    (`schemas/delete_queries.sql:3-10`)
- J6/M3 PK dedup               (`schemas/insert_queries.sql:8-15`)
- A7  count distinct tuple     (`schemas/select_queries.sql:215-218`)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.numbers import money


def latest_per_key(
    df: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    tiebreak_col: str | None = "event_id",
    method: str = "agg",
) -> DataFrame:
    """Most recent row per key.

    Parity: the reference's LATERAL ``ORDER BY time DESC LIMIT 1`` join
    (J3, `queries.py:19-31`) — no lateral needed in Spark.

    Two plans, identical results:
    - ``method='agg'`` (default) — ``max_by(struct(row), struct(order))``:
      a hash aggregation with map-side partial combine, so a hot key reduces
      to ONE candidate row per input partition before the shuffle. Immune to
      key skew; shuffled bytes ≈ |keys| × |partitions|, not |rows|.
    - ``method='window'`` — per-key ``row_number`` window: shuffles and
      sorts every row of a key into one task. Kept for reference/generality
      (top-N per key with N>1 needs it); at 100 TB with a hot key it is the
      skew trap the default avoids.

    For the streaming case, streaming.latest maintains the same aggregate
    incrementally instead of rescanning history.
    """
    has_tb = tiebreak_col and tiebreak_col in df.columns
    if method == "agg":
        order = (
            F.struct(F.col(time_col), F.col(tiebreak_col))
            if has_tb
            else F.col(time_col)
        )
        return (
            df.groupBy(*keys)
            .agg(F.max_by(F.struct(*df.columns), order).alias("_row"))
            .select("_row.*")
        )
    order = [F.col(time_col).desc()]
    if has_tb:
        order.append(F.col(tiebreak_col).desc())
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def detect_gaps(
    df: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    min_gap_seconds: int = 60,
) -> DataFrame:
    """Per-key gaps: consecutive rows more than ``min_gap_seconds`` apart.

    Parity: TS_GAPS — ``LEAD(time) OVER (PARTITION BY key ORDER BY time)``
    with ``EXTRACT(EPOCH FROM (next - time)) > 60`` (W1, `queries.py:54-75`).
    EXTRACT(EPOCH ...) yields FRACTIONAL seconds, so the gap measure is the
    exact µs difference / 1e6 — an earlier whole-second truncation silently
    reclassified gaps like 60.8 s (ref: gap; truncated 60: not a gap), a
    divergence the reference-SQL parity leg surfaced
    (tests/test_reference_sql_parity).
    """
    w = Window.partitionBy(*keys).orderBy(time_col)
    return (
        df.select(*keys, F.col(time_col))
        .withColumn("next_time", F.lead(time_col).over(w))
        .withColumn(
            "gap_seconds",
            (F.unix_micros("next_time") - F.unix_micros(time_col))
            / F.lit(1_000_000.0),
        )
        .filter(F.col("gap_seconds") > min_gap_seconds)
        .select(
            *keys,
            F.col(time_col).alias("gap_start"),
            F.col("next_time").alias("gap_end"),
            "gap_seconds",
        )
    )


def recompute_is_trading(
    df: DataFrame,
    keys: list[str],
    time_col: str = "ts",
    now=None,
    stale_after_days: int = 1,
) -> DataFrame:
    """Key liveness: active iff its latest row is within ``stale_after_days``
    of ``now``.

    Parity: the daily cron's ``UPDATE symbol_exchange SET is_trading``
    (M1, `daily.sql:1-40`): LATERAL latest-candle + CASE diff <= INTERVAL
    '1 day'. ``now`` is parameterized (the reference uses NOW(),
    `daily.sql:22`) for deterministic replay. In Spark the "UPDATE" is a
    dimension recompute: the result overwrites / MERGEs the dim table.
    """
    latest = df.groupBy(*keys).agg(F.max(time_col).alias("latest_time"))
    if now is None:
        # derive now from the tiny per-key aggregate, NOT a second full
        # scan of the fact table (max over maxes is max) — at the 100 TB
        # posture the old df.select(max).first() doubled the input I/O
        row = latest.select(F.max("latest_time")).first()
        now = row[0] if row else None
    now_col = F.lit(now).cast("timestamp")
    return latest.select(
        *keys,
        "latest_time",
        (
            F.to_unix_timestamp(now_col) - F.to_unix_timestamp("latest_time")
            <= stale_after_days * 86400
        ).alias("is_trading"),
    )


def retention_anti_join(df: DataFrame, keep_keys: DataFrame, on: list[str]) -> DataFrame:
    """Rows of ``df`` whose key is NOT in ``keep_keys``.

    Parity: the retention DELETE ``WHERE NOT EXISTS (... common_basequote_30)``
    (J5/M2, `delete_queries.sql:3-10`) — deletion in an immutable store is a
    rewrite keeping the anti-join complement.

    Scale: ``keep_keys`` is an aggregated key list (tiny) → Catalyst
    broadcasts it, so this is a broadcast anti-join with no shuffle of the
    fact side.
    """
    return df.join(F.broadcast(keep_keys.select(*on).distinct()), on=on, how="left_anti")


def dedup_pk(
    df: DataFrame, pk_cols: list[str], tiebreak_col: str | None = None
) -> DataFrame:
    """One row per primary key.

    Parity: ``ON CONFLICT DO NOTHING`` (S6, `queries.py:4`) and the ctid
    dedup delete (J6, `insert_queries.sql:8-15`). With ``tiebreak_col`` the
    kept row is deterministic (lowest tiebreak — the reference keeps lowest
    ctid ≈ earliest insert); without it, ``dropDuplicates`` keeps an
    arbitrary row, which is fine for idempotent ingest but not for oracle
    comparison.
    """
    if tiebreak_col is None:
        return df.dropDuplicates(list(pk_cols))
    w = Window.partitionBy(*pk_cols).orderBy(F.col(tiebreak_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def count_distinct_pairs(df: DataFrame, cols: list[str], group_by: list[str] | None = None) -> DataFrame:
    """COUNT(DISTINCT (a, b)) probe (A7, `select_queries.sql:215-218`),
    optionally per group. Exact — the approximate variant
    (approx_count_distinct, HLL) is the 100 TB fast path and exposed in
    bench, but the parity query is exact.
    """
    # countDistinct over a STRUCT, not bare columns: Spark's multi-column
    # count-distinct drops any row with a NULL component, while Postgres
    # COUNT(DISTINCT (a,b)) counts the row constructor (non-NULL composite)
    # — the parity probe would undercount on nullable columns
    agg = F.countDistinct(F.struct(*cols)).alias("n_distinct")
    if group_by:
        return df.groupBy(*group_by).agg(agg).orderBy(*group_by)
    return df.select(agg)


def skew_report(
    df: DataFrame,
    keys: list[str],
    top_n: int = 10,
) -> DataFrame:
    """Key-skew diagnostic for a prospective join/aggregation key: ONE row
    summarizing the key distribution plus the ``top_n`` heaviest keys.

    Output columns: ``n_rows, n_keys, p50, p99, max_rows, max_key,
    skew_ratio`` (max/p50 — the number AQE's skew-join threshold and manual
    salt factors are sized against) and ``heavy_hitters`` (array of
    ``{key, rows}`` structs, heaviest first).

    Cost: the hash-agg shuffle on ``keys`` (the same shuffle the join being
    diagnosed would pay; map-side combine makes it cheap), then two tiny
    passes over the one-row-per-key relation — a percentile aggregate and
    a TakeOrdered for the hitters (never a collect_list over ALL keys,
    which would put the whole keyspace in one aggregation buffer). Safe to
    run on the full 100 TB relation. The point of making this a
    first-class operator: choosing between a plain shuffle join, AQE skew
    splitting, broadcast, or the salted two-phase plans
    (`windowed.topn_per_key(salted=True)`, `analytics.top_k_other`) is a
    DATA question; this is the one cheap query that answers it.
    """
    per_key = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("rows"))
    key_struct = F.struct(
        F.concat_ws("|", *[F.col(k).cast("string") for k in keys]).alias("key"),
        F.col("rows"),
    )
    summary = per_key.agg(
        F.sum("rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.expr("percentile_approx(rows, 0.5)").alias("p50"),
        F.expr("percentile_approx(rows, 0.99)").alias("p99"),
        F.max("rows").alias("max_rows"),
        F.max_by(key_struct, F.col("rows")).getField("key").alias("max_key"),
        (
            F.max("rows").cast("double")
            / F.expr("percentile_approx(rows, 0.5)")
        ).alias("skew_ratio"),
    )
    # bounded BEFORE the collect: orderBy+limit plans as TakeOrdered, so at
    # most top_n structs ever sit in one buffer
    # sort key = (rows, key) so the array orders by weight; re-project to
    # the friendly (key, rows) field order afterwards
    by_rows = F.struct(F.col("rows"), key_struct.getField("key").alias("key"))
    heavy = (
        per_key.orderBy(F.col("rows").desc(), *keys)
        .limit(int(top_n))
        .agg(
            F.transform(
                F.reverse(F.array_sort(F.collect_list(by_rows))),
                lambda s: F.struct(
                    s["key"].alias("key"), s["rows"].alias("rows")
                ),
            ).alias("heavy_hitters")
        )
    )
    return summary.crossJoin(heavy)
